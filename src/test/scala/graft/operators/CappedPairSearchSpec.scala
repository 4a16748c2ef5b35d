package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Skew-bounded pair search (maxCellSize / maxBucketSize) for
 * Dedup.semDedup / semDedupHierarchical / Similarity.cosinePairs —
 * the round-6 verdict's last scale-killer. Contracts pinned here:
 *
 *  - one-sided error: every capped drop / emitted pair is also an
 *    uncapped drop / pair (no false positives, ever);
 *  - planted EXACT duplicates are always caught (the identical-vector
 *    collapse is salt-independent), so capped == uncapped whenever the
 *    true duplicates are exact copies;
 *  - the identical-vector pathology (one 20k-copy boilerplate cell =
 *    2·10^8 uncapped candidate pairs) finishes as a linear aggregate;
 *  - the salt split actually bounds sub-cell sizes (hash uniformity).
 */
class CappedPairSearchSpec extends SparkSpec {

  import spark.implicits._

  /** 48 random 16-dim int vectors (fixed seed) + exact copies of four of
   * them under fresh ids. With threshold .95 the only true dup pairs are
   * the planted copies (asserted, not assumed). */
  private def plantedDf = {
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(48)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextInt(2000).toLong - 1000)))
    val copies = Seq(100L -> base(5)._2, 101L -> base(17)._2,
      102L -> base(17)._2, 103L -> base(40)._2)
    (base ++ copies.map { case (id, v) => (id, v) }).toDF("id", "qv")
  }
  private val plantedIds = Set(100L, 101L, 102L, 103L)

  test("semDedup capped == uncapped keep-set on planted exact duplicates") {
    val df = plantedDf
    def dropped(cap: Int) =
      Dedup.semDedup(df, "id", "qv", nSeeds = 1, threshold = 0.95, maxCellSize = cap)
        .filter(!col("keep")).select("id").collect().map(_.getLong(0)).toSet
    val uncapped = dropped(0)
    assert(uncapped == plantedIds, "construction: only the copies are true dups")
    // cap of 8 forces the single 52-row cell down the capped path
    assert(dropped(8) == uncapped)
  }

  test("semDedup capped drops are one-sided on near-dup-heavy data") {
    // denser data (dim 4) where random near-dup pairs DO cross the
    // threshold — capped may miss some across salt boundaries but must
    // never drop a row the exact search keeps
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextInt(200).toLong - 100))).toDF("id", "qv")
    def dropped(cap: Int) =
      Dedup.semDedup(df, "id", "qv", nSeeds = 1, threshold = 0.9, maxCellSize = cap)
        .filter(!col("keep")).select("id").collect().map(_.getLong(0)).toSet
    val exact = dropped(0)
    val capped = dropped(16)
    assert(exact.nonEmpty, "construction: dense data has true near-dups")
    assert(capped.subsetOf(exact))
  }

  test("semDedupHierarchical capped catches planted copies in a hot fine cell") {
    val df = plantedDf
    def dropped(cap: Int) =
      Dedup.semDedupHierarchical(df, "id", "qv", nCoarse = 1, nFinePerCell = 1,
          threshold = 0.95, maxCellSize = cap)
        .filter(!col("keep")).select("id").collect().map(_.getLong(0)).toSet
    val uncapped = dropped(0)
    assert(uncapped == plantedIds)
    assert(dropped(8) == uncapped)
  }

  test("semDedup capped: 20k-copy boilerplate cell collapses linearly") {
    // one vector copied 20k times + 10 distinct rows, all in ONE cell:
    // uncapped all-pairs would be ~2·10^8 candidate pairs; the capped
    // path must finish as a hash aggregate + a ≤11-row pair join
    val boiler = Seq.tabulate(20000)(i => (i.toLong + 10, Seq(500L, 300L, -200L, 77L)))
    val rnd = new scala.util.Random(3)
    val distinct = Seq.tabulate(10)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextInt(2000).toLong - 1000)))
    val df = (distinct ++ boiler).toDF("id", "qv").repartition(8)
    val out = Dedup.semDedup(df, "id", "qv", nSeeds = 1, threshold = 0.95,
      maxCellSize = 64)
    val kept = out.filter(col("keep")).select("id").collect().map(_.getLong(0)).toSet
    // every boilerplate copy except the min id (10) is dropped
    assert(kept.contains(10L) && !kept.exists(_ > 10L))
    assert(out.count() == 20010L)
  }

  test("semDedup capped == uncapped at threshold 1.0 (identical-vector drop parity)") {
    // self-dot 2 (non-perfect square): the capped pass-1 predicate must
    // be the exact path's float cosine, not an algebraic shortcut, so
    // both paths make the SAME drop/keep call on identical vectors
    val df = (Seq.tabulate(40)(i =>
        (i.toLong, Seq(1L + i % 7, 1L, i.toLong % 5, 3L))) ++
      Seq((100L, Seq(1L, 1L, 0L, 0L)), (101L, Seq(1L, 1L, 0L, 0L)),
          (102L, Seq(1L, 1L, 0L, 0L)))).toDF("id", "qv")
    def dropped(cap: Int) =
      Dedup.semDedup(df, "id", "qv", nSeeds = 1, threshold = 1.0, maxCellSize = cap)
        .filter(!col("keep")).select("id").collect().map(_.getLong(0)).toSet
    val uncapped = dropped(0)
    val capped = dropped(8)
    assert(capped == uncapped, s"capped $capped vs uncapped $uncapped")
    assert(capped.subsetOf(uncapped)) // the one-sided contract, explicitly
  }

  test("operator salt split bounds sub-cells on a 26.6%-hot-cell corpus (100TB pin)") {
    // the round-7 worst case scaled down: 50k reps, 26.6% in ONE cell.
    // Drive Dedup.vectorSaltSplit — the operator's own formula — and
    // assert every (cell, salt) sub-cell is ≤ 4·cap (hash variance
    // band), so per-sub-cell candidate pairs are ≤ (4·cap)² and total
    // candidates are ~rows·cap instead of the hot cell's 13300² pairs.
    val rnd = new scala.util.Random(29)
    val n = 50000
    val hot = (n * 0.266).toInt
    val cap = 128
    val reps = Seq.tabulate(n) { i =>
      val cell = if (i < hot) 0 else 1 + rnd.nextInt(400)
      (i.toLong, cell, Seq.fill(8)(rnd.nextInt(2000).toLong - 1000))
    }.toDF("id", "cell", "__v").repartition(8)
    val salted = Dedup.vectorSaltSplit(reps, Seq("cell"), cap)
    val sizes = salted.groupBy("cell", "__salt").count()
      .agg(max("count"), sum(col("count") * col("count"))).first()
    val maxSub = sizes.getLong(0)
    assert(maxSub <= 4L * cap, s"max sub-cell $maxSub > ${4 * cap}")
    // Σ g² bounds total candidate pairs; must be linear-ish in rows,
    // nowhere near the uncapped hot cell's 13300² ≈ 1.77e8
    val sumSq = sizes.getLong(1)
    assert(sumSq <= 16L * cap * n, s"sum of squared sub-cells $sumSq")
  }

  test("vector-hash salt split bounds sub-cell sizes on distinct vectors") {
    val rnd = new scala.util.Random(19)
    val n = 20000
    val cap = 128
    val df = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextInt(2000).toLong - 1000))).toDF("id", "qv")
    val splits = math.ceil(n.toDouble / cap).toLong
    val maxSub = df
      .withColumn("salt", pmod(xxhash64(col("qv")), lit(splits)))
      .groupBy("salt").count().agg(max("count")).first().getLong(0)
    // expected cap·(1 + small hash variance); 4x is far below the
    // uncapped 20000-row cell and generous against seed churn
    assert(maxSub <= 4L * cap, s"max sub-cell $maxSub")
  }

  test("cosinePairs capped: subset of exact pairs, same connected components") {
    // cosine() wants float/double embeddings (the q_c5 column type)
    val df = plantedDf.withColumn("v", col("qv").cast("array<double>"))
    def pairs(cap: Int) =
      Similarity.cosinePairs(df, "id", "v", threshold = 0.95, bits = 2,
          maxBucketSize = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(0)
    val capped = pairs(4) // every bucket over 4 rows goes down the capped path
    assert(exact.nonEmpty, "construction: the copies pair up")
    assert(capped.subsetOf(exact))
    // union-find over each pair set: identical duplicate groups
    def components(ps: Set[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      ps.foreach { case (a, b) => parent(find(a)) = find(b) }
      parent.keys.groupBy(find).values.map(_.toSet).toSet
    }
    assert(components(capped) == components(exact))
  }

  test("cosinePairs capped: 20k-copy bucket emits star pairs, not 2e8 rows") {
    val boiler = Seq.tabulate(20000)(i => (i.toLong, Seq(500.0, 300.0, -200.0, 77.0)))
    val df = boiler.toDF("id", "qv").repartition(8)
    val out = Similarity.cosinePairs(df, "id", "qv", threshold = 0.99, bits = 2,
      maxBucketSize = 64)
    // g−1 star pairs against the min id, all cosine 1
    assert(out.count() == 19999L)
    assert(out.filter(col("id_a") =!= 0L).count() == 0L)
  }
}

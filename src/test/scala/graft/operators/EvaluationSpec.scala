package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** C50/C51/C52 specs: exact AUC vs a brute-force pair count,
 * temperature-mixture arithmetic invariants, and the canonical text
 * form's collapse/retain behavior. */
class EvaluationSpec extends SparkSpec {

  import spark.implicits._

  /** Brute-force AUC in ppm: (wins + ties/2) / (n⁺·n⁻), exact via the
   * same 2·numerator trick the operator uses. */
  private def bruteAucPpm(rows: Seq[(Long, Long)]): Long = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    (BigInt(num2) * 1000000 / (BigInt(2) * pos.size * neg.size)).toLong
  }

  test("C51: perfect separation gives AUC 1.0, reversal gives 0.0") {
    val perfect = Seq((10L, 1L), (9L, 1L), (1L, 0L), (2L, 0L))
      .toDF("sc", "y")
    assert(Evaluation.exactAuc(perfect, "sc", "y")
      .select("auc_ppm").head.getLong(0) == 1000000L)
    val reversed = perfect.withColumn("y", lit(1L) - col("y"))
    assert(Evaluation.exactAuc(reversed, "sc", "y")
      .select("auc_ppm").head.getLong(0) == 0L)
  }

  test("C51: all-tied scores give AUC 0.5 exactly") {
    val tied = Seq((7L, 1L), (7L, 0L), (7L, 1L), (7L, 0L)).toDF("sc", "y")
    assert(Evaluation.exactAuc(tied, "sc", "y")
      .select("auc_ppm").head.getLong(0) == 500000L)
  }

  test("C51: tie-aware rank sum matches the brute-force pair count") {
    val rnd = new scala.util.Random(42)
    // small score domain on purpose: dense ties exercise the average-
    // rank arithmetic, not just the sorted path
    val rows = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(2).toLong))
    val got = Evaluation.exactAuc(rows.toDF("sc", "y"), "sc", "y").head
    assert(got.getLong(0) == rows.count(_._2 == 1L))
    assert(got.getLong(1) == rows.count(_._2 == 0L))
    assert(got.getLong(3) == bruteAucPpm(rows))
  }

  test("C51: degenerate labeling returns NULL auc, not a blow-up") {
    val allPos = Seq((1L, 1L), (2L, 1L)).toDF("sc", "y")
    assert(Evaluation.exactAuc(allPos, "sc", "y").head.isNullAt(3))
  }

  test("C50: isqrt weights are exact and budget splits by weight") {
    val docs = Seq.tabulate(300) { i =>
      val src = s"s${i % 3}"
      // s0 docs are ~4x the tokens of s2 → weight ratio ~2x
      val words = (i % 3) match { case 0 => 40; case 1 => 20; case 2 => 10 }
      (src, (1 to words).map(w => s"w$w").mkString(" "))
    }.toDF("source", "text")
    val out = CorpusPipeline.temperatureMixture(docs, budgetTokens = 3000L)
      .orderBy("source").collect()
    val nTok = out.map(r => r.getLong(2))
    val weight = out.map(r => r.getLong(3))
    // exact integer sqrt: w² ≤ n < (w+1)²
    weight.zip(nTok).foreach { case (w, n) =>
      assert(w * w <= n && (w + 1) * (w + 1) > n) }
    // targets partition the budget by weight (up to flooring)
    val wSum = weight.sum
    out.foreach { r =>
      assert(r.getLong(4) == (BigInt(r.getLong(3)) * 3000 / wSum).toLong) }
    // temperature flattens: s0 has 4x s2's tokens but < 4x its target
    val bySrc = out.map(r => r.getString(0) -> r).toMap
    assert(bySrc("s0").getLong(2) == 4 * bySrc("s2").getLong(2))
    // isqrt(4000)=63 vs isqrt(1000)=31 — close to 2x, far from 4x
    assert(bySrc("s0").getLong(4) < 4 * bySrc("s2").getLong(4))
    assert(bySrc("s0").getLong(4) <= 2 * bySrc("s2").getLong(4) + 2 * 3000 / 138)
  }

  test("C50: budget >= corpus admits everything at rate 1e6") {
    val docs = Seq(("a", "one two"), ("a", "three"), ("b", "four five six"))
      .toDF("source", "text")
    val out = CorpusPipeline.temperatureMixture(docs, budgetTokens = 1000000L)
      .collect()
    out.foreach { r =>
      assert(r.getLong(5) == 1000000L)
      assert(r.getLong(6) == r.getLong(1)) // admitted_docs = n_docs
      assert(r.getLong(7) == r.getLong(2)) // admitted_tokens = n_tokens
    }
  }

  test("C54: keepBest keeps the highest-quality member per family, id tiebreak") {
    // families: {1,2,3} (chain), {10,11}; 20 is an isolated node (no edge)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val quality = Seq(
      (1L, 50L), (2L, 90L), (3L, 90L), // tie at 90 → lower id (2) wins
      (10L, 5L), (11L, 7L), (20L, 99L)).toDF("doc_id", "q")
    val out = Dedup.keepBest(edges, quality, "doc_id", "q", loopPartitions = 2)
      .orderBy("component")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 90L), (10L, 2L, 11L, 7L)))
  }

  test("C55: int8 quant stats match a per-element replay incl. negatives") {
    val vecs = Seq(
      Seq(1000L, -500L, 127L, 0L, -1000L),
      Seq(3L, -2L, 1L),
      Seq(0L, 0L), // all-zero: maxabs clamps to 1, codes 0, err 0
      Seq(-7L))
    def replay(v: Seq[Long]): (Long, Long, Long) = {
      val maxabs = math.max(v.map(math.abs).max, 1L)
      val codes = v.map(x => { val m = math.abs(x) * 127 / maxabs; if (x < 0) -m else m })
      (maxabs, codes.map(math.abs).sum,
        v.zip(codes).map { case (x, c) => val e = x * 127 - c * maxabs; e * e }.sum)
    }
    val got = vecs.map(Tuple1(_)).toDF("v")
      .select(graft.functions.Int8QuantStats(col("v")).as("st"))
      .collect().map(_.getSeq[Long](0))
    vecs.zip(got).foreach { case (v, st) =>
      val (ma, l1, err) = replay(v)
      assert((st(0), st(1), st(2)) == ((ma, l1, err)), s"mismatch for $v")
      // codes must be representable in a signed byte
      assert(l1 <= 127L * v.length)
    }
  }

  test("C56: snapshot diff classifies add/remove/change/unchanged") {
    val old = Seq((1L, "a doc"), (2L, "b doc"), (3L, "c doc")).toDF("doc_id", "text")
    val neu = Seq((2L, "b doc"), (3L, "c doc EDITED"), (4L, "d doc")).toDF("doc_id", "text")
    val m = CorpusPipeline.snapshotDiff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // whitespace-reflow is NOT a change (fingerprint normalizes)
    val reflow = Seq((9L, "x  y")).toDF("doc_id", "text")
    val reflow2 = Seq((9L, "x y")).toDF("doc_id", "text")
    assert(CorpusPipeline.snapshotDiff(reflow, reflow2)
      .head.getString(1) == "unchanged")
  }

  test("C102: PAVA pools exactly the violating prefix and leaves the monotone tail") {
    // bins=4 over scores 0..3 (one bin per score): raw rates
    // 1.0, 0.0, 0.5, 1.0 → PAVA pools bins {0,1} to 0.5; bins 2, 3
    // stand alone (the 0.5-vs-0.5 boundary is NOT a strict violation).
    val df = Seq((0, 1), (0, 1), (1, 0), (1, 0), (2, 1), (2, 0), (3, 1), (3, 1))
      .toDF("s", "y")
    val out = Evaluation.isotonicCalibration(df, "s", "y", bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 1000000L, 500000L, 0L),
      (1L, 2L, 0L, 0L, 500000L, 0L),
      (2L, 2L, 1L, 500000L, 500000L, 1L),
      (3L, 2L, 2L, 1000000L, 1000000L, 2L)))
    spark.catalog.clearCache()
  }

  test("C102: monotone input is untouched; fully-reversed input pools to one rate") {
    val mono = Seq((0, 0), (0, 0), (1, 1), (1, 0), (2, 1), (2, 1)).toDF("s", "y")
    val m = Evaluation.isotonicCalibration(mono, "s", "y", bins = 3)
      .orderBy("bin").collect()
    assert(m.forall(r => r.getLong(3) == r.getLong(4))) // iso == raw
    assert(m.map(_.getLong(5)).toSeq == Seq(0L, 1L, 2L))
    spark.catalog.clearCache()
    val rev = Seq((0, 1), (0, 1), (1, 1), (1, 0), (2, 0), (2, 0)).toDF("s", "y")
    val p = Evaluation.isotonicCalibration(rev, "s", "y", bins = 3)
      .orderBy("bin").collect()
    assert(p.map(_.getLong(4)).distinct.toSeq == Seq(500000L)) // 3/6
    assert(p.map(_.getLong(5)).distinct.toSeq == Seq(0L))
    spark.catalog.clearCache()
  }

  test("C52: canonical form collapses case/punct/reflow, keeps content") {
    val df = Seq(
      "Hello,  World!",
      "hello world",
      "  HELLO   WORLD ?? ",
      "hello there world").toDF("t")
      .select(TF.normalizeText(col("t")).as("n"))
    val norms = df.collect().map(_.getString(0))
    assert(norms(0) == "hello world")
    assert(norms.take(3).distinct.length == 1)
    assert(norms(3) == "hello there world") // different content survives
  }
}

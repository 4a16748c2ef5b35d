package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup (C29) and sequence chunking (C30) semantics. */
class SemDedupChunkSpec extends SparkSpec {

  import spark.implicits._

  test("semDedup drops the higher id of every within-cluster near-dup pair") {
    // two well-separated directions; ids 0 and 1 are the seeds/centroids
    val rows = Seq(
      (0L, Seq(1000L, 0L, 0L)),    // seed A
      (1L, Seq(0L, 1000L, 0L)),    // seed B
      (2L, Seq(999L, 10L, 0L)),    // near-dup of 0 (cos ~0.9999)
      (3L, Seq(0L, 998L, 30L)),    // near-dup of 1
      (4L, Seq(700L, 0L, 714L)),   // cluster A but cos(0,4) ~0.7 → kept
      (5L, Seq(999L, 11L, 1L))     // near-dup of 0 AND 2 → dropped once
    ).toDF("id", "qv")
    val out = Dedup.semDedup(rows, "id", "qv", nSeeds = 2, threshold = 0.98)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (0L, 0, true), (1L, 1, true),
      (2L, 0, false), (3L, 1, false),
      (4L, 0, true), (5L, 0, false)))
  }

  test("semDedup threshold bounds: exact copies always drop, orthogonal never") {
    val rows = Seq(
      (0L, Seq(10L, 20L, 30L)),
      (1L, Seq(10L, 20L, 30L)),  // exact copy → cos 1.0
      (2L, Seq(-30L, 0L, 10L))   // far away
    ).toDF("id", "qv")
    val out = Dedup.semDedup(rows, "id", "qv", nSeeds = 1, threshold = 1.0)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq == Seq((0L, true), (1L, false), (2L, true)))
  }

  test("semDedup never drops zero-norm vectors (undefined cosine, NaN-order-portable)") {
    val rows = Seq(
      (0L, Seq(10L, 0L)),
      (1L, Seq(0L, 0L)),  // zero vector — cosine undefined
      (2L, Seq(0L, 0L)),  // second zero vector: must NOT pair with 1
      (3L, Seq(10L, 0L))  // exact copy of 0 → drops
    ).toDF("id", "qv")
    val out = Dedup.semDedup(rows, "id", "qv", nSeeds = 1, threshold = 0.5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq == Seq((0L, true), (1L, true), (2L, true), (3L, false)))
  }

  test("semDedup pair search plans as an equi-join on the cell") {
    val rows = Seq((0L, Seq(1L, 0L)), (1L, Seq(0L, 1L)), (2L, Seq(1L, 1L))).toDF("id", "qv")
    val plan = Dedup.semDedup(rows, "id", "qv", 2, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("chunkSequences splits token streams into exact maxTokens chunks") {
    val docs = Seq(
      (1L, "a b c d e"),   // 5 tokens, max 2 → 3 chunks (2,2,1)
      (2L, "x"),           // 1 token → 1 chunk
      (3L, ""),            // empty → no chunks
      (4L, "  p   q  ")    // ragged whitespace → (p q) as one chunk
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.chunkSequences(docs, "doc_id", "text", maxTokens = 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0, 2, "a b"), (1L, 1, 2, "c d"), (1L, 2, 1, "e"),
      (2L, 0, 1, "x"),
      (4L, 0, 2, "p q")))
  }

  test("semDedupHierarchical routes through two levels and drops planted dups") {
    // ids 0,1 = coarse seeds (x-axis vs y-axis); per coarse cell the
    // first 2 routed ids become fine seeds
    val rows = Seq(
      (0L, Seq(1000L, 0L, 0L)),
      (1L, Seq(0L, 1000L, 0L)),
      (2L, Seq(900L, 0L, 436L)),   // coarse 0, distinct direction → fine seed
      (3L, Seq(0L, 1000L, 1L)),    // coarse 1, near-dup of 1 — but becomes
                                   // a fine seed itself (only 2 members in
                                   // cell 1), assigns to its own fine cell
                                   // and SURVIVES: the hierarchical recall
                                   // tradeoff, pinned here on purpose
      (4L, Seq(1000L, 0L, 0L)),    // exact copy of 0
      (5L, Seq(898L, 2L, 437L))    // near-dup of 2, NOT a fine seed
    ).toDF("id", "qv")
    val out = Dedup.semDedupHierarchical(rows, "id", "qv",
        nCoarse = 2, nFinePerCell = 2, threshold = 0.99)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(out.map(t => (t._1, t._4)).toSeq ==
      Seq((0L, true), (1L, true), (2L, true), (3L, true), (4L, false), (5L, false)))
    // dropped rows land in the same (ccell, fcell) as their survivors
    val cells = out.map(t => (t._1, (t._2, t._3))).toMap
    assert(cells(4L) == cells(0L) && cells(5L) == cells(2L))
    assert(cells(3L) != cells(1L)) // own fine cell — why it survived
  }

  test("semDedupHierarchical agrees with flat semDedup when every vector is its own fine cell") {
    // nFinePerCell large enough that fine seeds = all rows per coarse
    // cell; a pair is then in the same (ccell,fcell) iff both assign to
    // the same nearest row — stricter than flat, but exact copies must
    // drop in both
    val rnd = new scala.util.Random(13)
    val base = Seq.tabulate(40)(i => (i.toLong, Seq.fill(8)(rnd.nextInt(2000).toLong - 1000)))
    val withCopies = base ++ Seq((100L, base(7)._2), (101L, base(23)._2))
    val df = withCopies.toDF("id", "qv")
    val flat = Dedup.semDedup(df, "id", "qv", nSeeds = 4, threshold = 1.0)
      .filter(!col("keep")).select("id").collect().map(_.getLong(0)).toSet
    val hier = Dedup.semDedupHierarchical(df, "id", "qv", 2, 40, 1.0)
      .filter(!col("keep")).select("id").collect().map(_.getLong(0)).toSet
    assert(flat.contains(100L) && flat.contains(101L))
    assert(hier.contains(100L) && hier.contains(101L))
  }

  test("semDedupHierarchical: every ccell-only window ranks a salt-bounded frame (r14 verdict #1)") {
    // The fine-seed selection must NOT funnel the routed corpus through
    // nCoarse sort tasks. topNPerKey's phase-2 window IS keyed on ccell
    // alone, but only over phase-1 survivors (≤ salts·n per key) — so
    // the pin is: any Window partitioned exactly by ccell must sit above
    // a Filter on topNPerKey's phase-1 rank column __r1.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Window => LWindow}
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(6)(rnd.nextInt(2000).toLong - 1000))).toDF("id", "qv")
    val out = Dedup.semDedupHierarchical(df, "id", "qv", 2, 2, 0.99)
    val ccellOnly = out.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.size == 1 &&
          w.partitionSpec.head.references.map(_.name).toSet == Set("ccell") => w
    }
    assert(ccellOnly.nonEmpty, "expected topNPerKey's phase-2 window in the plan")
    val unbounded = ccellOnly.filterNot(w => w.child.collectFirst {
      case f: LFilter if f.condition.references.exists(_.name == "__r1") => f
    }.isDefined)
    assert(unbounded.isEmpty,
      s"corpus-sized window partitioned on ccell alone (the r12–r14 verdict class): $unbounded")
  }

  test("packedSequenceSpans computes exact global offsets across partitions") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(i % 17 + 1)("w").mkString(" "))).toDF("doc_id", "text")
      .repartition(7)
    val out = CorpusPipeline.packedSequenceSpans(docs, seqLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: single-threaded scan in the same md5(seed||id) order
    val order = (0 until 200).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft$i".getBytes("UTF-8")).map("%02x".format(_)).mkString, i))
    var acc = 0L
    val expected = order.map { i =>
      val t = (i % 17 + 1) + 1L // tokens + 1 EOS
      val s = acc; acc += t
      (i.toLong, s, s / 10, (acc - 1) / 10)
    }.sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == expected)
    // total token conservation: last doc's end == sum of all t
    assert(acc == (0 until 200).map(i => (i % 17 + 1) + 1L).sum)
  }

  test("packedSequenceSpans: long docs span multiple sequences, empty text still costs EOS") {
    val docs = Seq((1L, ("x " * 25).trim), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val out = CorpusPipeline.packedSequenceSpans(docs, seqLen = 8, seed = "s2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 25 tokens + EOS = 26 → spans ceil over 8-token seqs wherever it starts
    val (s1, f1, l1) = out(1L)
    assert(l1 - f1 >= 2 && l1 == (s1 + 26 - 1) / 8)
    // DuckDB string_split on '' yields one empty token: t = 1 + 1
    val (s2, f2, l2) = out(2L)
    assert(l2 == (s2 + 2 - 1) / 8 && f2 == s2 / 8)
  }

  test("collocations ranks tightly-bound bigrams above frequent-but-loose ones") {
    // "new york" always co-occurs; "the" pairs with everything (loose)
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the cat sat on the mat in new york w$i the dog ran to new york"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline.collocations(docs, "text", k = 12, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // perfectly-bound rare pairs (cat sat, dog ran, ...) share the top
    // score 40·640·1000/(40·40)=16000; "new york" is perfectly bound but
    // twice as frequent → 8000; "the cat" is loose (the=120) → 5333
    val score = out.map(t => (s"${t._1} ${t._2}", t._4)).toMap
    assert(out.head._4 == 16000L && score("cat sat") == 16000L)
    assert(score("new york") == 8000L)
    assert(score.get("the cat").forall(_ < 8000L))
    assert(score("cat sat") > score("new york"))
    // every returned score is consistent with its own counts
    val tot = docs.select(explode(split(trim(lower(col("text"))), "\\s+"))).count()
    val uni = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (a, b, cab, score) =>
      assert(score == cab * tot * 1000L / (uni(a) * uni(b)), s"$a $b")
    }
  }

  test("dedupWithinDoc keeps first occurrences in order and rejoins") {
    val docs = Seq(
      (1L, "alpha beta. gamma. alpha beta. delta. gamma"),
      (2L, "one. one. one"),
      (3L, "solo sentence")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.dedupWithinDoc(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, "alpha beta. gamma. delta"),
      (2L, 1L, "one"),
      (3L, 1L, "solo sentence")))
  }

  test("chunkSequences conserves tokens and never exceeds the budget") {
    val rnd = new scala.util.Random(5)
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))("t" + rnd.nextInt(9)).mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = CorpusPipeline.chunkSequences(docs, "doc_id", "text", maxTokens = 7)
    val over = chunks.filter(col("chunk_tokens") > 7 || col("chunk_tokens") < 1).count()
    assert(over == 0)
    val got = chunks.agg(sum("chunk_tokens")).first().getLong(0)
    val want = docs.withColumn("n", size(filter(split(col("text"), "\\s+"), t => t =!= lit(""))))
      .agg(sum("n")).first().getLong(0)
    assert(got == want)
  }
}

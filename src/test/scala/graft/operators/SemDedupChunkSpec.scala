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

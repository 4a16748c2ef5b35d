package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C101: interpolated Kneser–Ney bigram scoring
 * (CorpusPipeline.kneserNeyBigramSurprisal), integer-ppm with D = 3/4. */
class KneserNeySpec extends SparkSpec {

  import spark.implicits._

  // Train doc 0: "a b a b c" → bigrams (a b)×2, (b a), (b c).
  // tb: c12("a b")=2, c12("b a")=1, c12("b c")=1; T = 3 types.
  // tc1: a → (c1=2, n1fw=1); b → (c1=2, n1fw=2).
  // tbw: a → 1, b → 1, c → 1.
  private val train = (0L, "a b a b c")

  test("ppm probabilities are exact and the seen-context row sums to one million") {
    // Doc 0 scores itself:
    //  (a b) c12=2: term1 = (4·2−3)·250000 // 2 = 625000,
    //               term2 = ((3·1·250000) // 2)·1 // 3 = 125000 → 750000.
    //  (b a) c12=1: term1 = 250000 // 2 = 125000,
    //               term2 = ((3·2·250000) // 2)·1 // 3 = 250000 → 375000.
    //  (b c) c12=1: same → 375000.
    // Σ_w2 p(w2|a) = 750000 + 125000 + 125000 = 1000000 exactly
    // (the unseen continuations a, c each get term2 = 125000).
    // Doc 1 "a c x b": (a c) seen-ctx continuation 125000 lvl2;
    //  (c x) both unseen → 0 lvl4; (x b) unseen ctx, seen w2 →
    //  1000000 // 3 = 333333 lvl3.
    // Doc 2 "b c b c": (b c)×2 hit 375000; (c b) unseen ctx → 333333.
    val docs = Seq(train, (1L, "a c x b"), (2L, "b c b c"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline
      .kneserNeyBigramSurprisal(docs, col("doc_id") === 0, hashKeys = false)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "n_hit", "n_cont", "n_uctx", "n_oov",
        "p_sum_ppm", "mean_p_ppm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    assert(out == Seq(
      (0L, 4L, 4L, 0L, 0L, 0L, 2250000L, 562500L),
      (1L, 3L, 0L, 1L, 1L, 1L, 458333L, 152777L),
      (2L, 3L, 2L, 0L, 1L, 0L, 1083333L, 361111L)))
    spark.catalog.clearCache() // dtf/tb persist inside the operator
  }

  test("empty train slice degrades to all-OOV with p 0, not null") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = CorpusPipeline
      .kneserNeyBigramSurprisal(docs, lit(false), hashKeys = false)
      .collect().head
    assert(r.getAs[Long]("n_oov") == 2L && r.getAs[Long]("p_sum_ppm") == 0L)
    spark.catalog.clearCache()
  }

  test("hashed and string keys agree") {
    val docs = Seq(train, (1L, "a c x b"), (2L, "b c b c")).toDF("doc_id", "text")
    val a = CorpusPipeline.kneserNeyBigramSurprisal(docs, col("doc_id") === 0, hashKeys = false)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val b = CorpusPipeline.kneserNeyBigramSurprisal(docs, col("doc_id") === 0, hashKeys = true)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(a == b)
  }
}

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

  // ---- C110: trigram interpolated KN ----
  // Train doc 0: "a b c a b c a b d" → trigram types
  //   "a b c"×2, "b c a"×2, "c a b"×2, "a b d"×1 (4 types).
  // tctx: "a b"→(c12 3, n1fw12 2), "b c"→(2, 1), "c a"→(2, 1).
  // tbi (w2,w3 types, nbi = distinct w1): "b c"/"c a"/"a b"/"b d" → 1
  //   each; T = 4.
  // tmid: b→(nmid 2, n1fw2 2), c→(1, 1), a→(1, 1).
  // tbw: a/b/c/d → 1 each.
  private val train3 = (0L, "a b c a b c a b d")

  test("C110: the five-level ladder, every level hand-computed") {
    // "a b c" lvl1: 1250000//3 + (1500000//3)·1//8 + ((500000·6)//8)·1//4
    //   = 416666 + 62500 + 93750 = 572916
    // "b c a" lvl1: 1250000//2 + (750000//2)·1//4 + ((375000·3)//4)·1//4
    //   = 625000 + 93750 + 70312 = 789062 ("c a b" identical by symmetry)
    // "a b d" lvl1: 250000//3 + 62500 + 93750 = 83333+156250 = 239583
    // "a b a" lvl2 (seen ctx, unseen (b,a)): 0 + 0 + 93750
    // "e b c" lvl3 (unseen ctx, seen mid b): 250000//2 + (1500000//2)·1//4
    //   = 125000 + 187500 = 312500
    // "e e c" lvl4 (unseen mid, seen w3): 1000000//4 = 250000
    // "e e e" lvl5: 0
    // Interpolation sanity: Σ_w3 p(w3|"a b") = 572916 + 239583
    //   + 93750(a) + 93750(b) = 999999 ≈ 1e6 (rounding loss 1).
    val docs = Seq(train3, (1L, "a b c"), (2L, "a b a"), (3L, "e b c"),
      (4L, "e e c"), (5L, "e e e"), (6L, "x y")).toDF("doc_id", "text")
    val out = CorpusPipeline
      .kneserNeyTrigramSurprisal(docs, col("doc_id") === 0, hashKeys = false)
      .orderBy("doc_id")
      .select("doc_id", "n_trigrams", "n_hit", "n_cont", "n_umid", "n_ubw",
        "n_oov", "p_sum_ppm", "mean_p_ppm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSeq
    assert(out == Seq(
      (0L, 7L, 7L, 0L, 0L, 0L, 0L, 4541663L, 648809L),
      (1L, 1L, 1L, 0L, 0L, 0L, 0L, 572916L, 572916L),
      (2L, 1L, 0L, 1L, 0L, 0L, 0L, 93750L, 93750L),
      (3L, 1L, 0L, 0L, 1L, 0L, 0L, 312500L, 312500L),
      (4L, 1L, 0L, 0L, 0L, 1L, 0L, 250000L, 250000L),
      (5L, 1L, 0L, 0L, 0L, 0L, 1L, 0L, 0L)))
    // doc 6 has < 3 tokens: no trigram, no row
    assert(!out.exists(_._1 == 6L))
    spark.catalog.clearCache()
  }

  test("C110: empty train degrades to all-OOV p 0; hashed and string keys agree") {
    val solo = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = CorpusPipeline
      .kneserNeyTrigramSurprisal(solo, lit(false), hashKeys = false)
      .collect().head
    assert(r.getAs[Long]("n_oov") == 2L && r.getAs[Long]("p_sum_ppm") == 0L)
    spark.catalog.clearCache()
    val docs = Seq(train3, (1L, "a b c"), (2L, "e b c"), (3L, "q w e r t"))
      .toDF("doc_id", "text")
    val a = CorpusPipeline.kneserNeyTrigramSurprisal(docs, col("doc_id") === 0, hashKeys = false)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val b = CorpusPipeline.kneserNeyTrigramSurprisal(docs, col("doc_id") === 0, hashKeys = true)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(a == b)
  }

  test("C115: generic order-n at n = 3 reproduces the trigram operator bit-for-bit") {
    val docs = Seq(
      (0L, "a b a b c a b d"), (1L, "a b c x"), (2L, "b c d e f"),
      (3L, "x y z"), (4L, "a b a b a b"))
      .toDF("doc_id", "text")
    for (hashed <- Seq(false, true)) {
      val tri = CorpusPipeline
        .kneserNeyTrigramSurprisal(docs, col("doc_id") === 0, hashKeys = hashed)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val gen = CorpusPipeline
        .kneserNeyNgramSurprisal(docs, col("doc_id") === 0, order = 3,
          hashKeys = hashed)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      // same column POSITIONS: (id, n, hit, cont, bo2/umid, unig/ubw,
      // oov, p_sum, mean) — names are generic vs C110-specific
      assert(tri == gen, s"hashKeys=$hashed")
    }
  }

  test("C115: 5-gram ladder, every backoff rung hand-computed") {
    // Train doc 0: "a b c d e a b c d e" → 6 positioned 5-grams,
    // tt: "a b c d e"(cn 2) + 4 rotations (cn 1); every suffix-chain
    // table has 5 singleton types; T = |t2| = 5.
    val docs = Seq(
      (0L, "a b c d e a b c d e"),
      (1L, "a b c d e"),  // lvl 1 hit
      (3L, "z b c d e"),  // top ctx unseen, c4 "b c d" seen → lvl 3
      (4L, "q r s t u"),  // all unseen → lvl 7 OOV, p = 0
      (5L, "q r s t e"))  // only unigram continuation of "e" → lvl 6
      .toDF("doc_id", "text")
    val out = CorpusPipeline
      .kneserNeyNgramSurprisal(docs, col("doc_id") === 0, order = 5,
        hashKeys = false)
      .orderBy("doc_id")
      .select("doc_id", "n_ngrams", "n_hit", "n_cont", "n_bo4", "n_bo3",
        "n_bo2", "n_unig", "n_oov", "p_sum_ppm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
      .toSeq
    spark.catalog.clearCache()
    // doc 1 "a b c d e": cn=2, cden=2, cn1=1; every chain count = 1:
    //  t1 = 625000; W = 375000
    //  t2 = 375000//4 = 93750;   W = 1125000//4 = 281250
    //  t3 = 281250//4 = 70312;   W = 843750//4  = 210937
    //  t4 = 210937//4 = 52734;   W = 632811//4  = 158202
    //  t5 = 158202//5 = 31640  → p = 873436
    // doc 3 "z b c d e": start at order 4 (d4 of "b c d" = 1):
    //  250000 + 187500 + 140625 + 84375 = 662500
    // doc 5: unigram rung: 1000000//5 = 200000
    assert(out.tail == Seq(
      (1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 873436L),
      (3L, 1L, 0L, 0L, 1L, 0L, 0L, 0L, 0L, 662500L),
      (4L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 0L),
      (5L, 1L, 0L, 0L, 0L, 0L, 0L, 1L, 0L, 200000L)))
    // train doc scores itself: all 6 grams are hits and p > 0
    assert(out.head._1 == 0L && out.head._3 == 6L && out.head._10 > 0L)
  }

  test("C115: interpolated 5-gram mass sums to one million over the vocab") {
    // The defining property of INTERPOLATED KN (vs backoff): for a
    // seen context, Σ_w p(w|ctx) = 1 over the closed vocab — every
    // arm of the ladder participates (hit for e, pure unigram-
    // continuation mass for a/b/c/d whose deeper suffixes are
    // unseen). Train as in the ladder test; score "a b c d w" for
    // every vocab w. Hand-derived: p(e)=873436, p(other)=31640 each →
    // 999996 exactly (4 ppm lost to the four floor-divisions).
    val vocab = Seq("a", "b", "c", "d", "e")
    val docs = Seq((0L, "a b c d e a b c d e")) ++
      vocab.zipWithIndex.map { case (w, i) => (10L + i, s"a b c d $w") }
    val out = CorpusPipeline
      .kneserNeyNgramSurprisal(docs.toDF("doc_id", "text"),
        col("doc_id") === 0, order = 5, hashKeys = false)
      .filter(col("doc_id") >= 10)
      .select("p_sum_ppm").collect().map(_.getLong(0))
    spark.catalog.clearCache()
    assert(out.length == 5)
    assert(out.sum == 999996L, s"mass ${out.sum} != 999996 (${out.toSeq})")
  }
}

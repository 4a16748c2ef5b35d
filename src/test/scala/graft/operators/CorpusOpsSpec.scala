package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-wide sentence dedup (C37), per-key caps (C38), hashed linear
 * classifier (C39), inverted index (C40). */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedupAcrossDocs keeps only the globally first occurrence of a sentence") {
    val docs = Seq(
      (1L, "alpha one. shared promo. tail one"),
      (2L, "shared promo. beta two"),
      (3L, "shared promo")                      // fully duplicated doc
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.dedupAcrossDocs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, "alpha one. shared promo. tail one"),
      (2L, 1L, 1L, "beta two"),
      (3L, 0L, 1L, "")))
  }

  test("dedupAcrossDocs: within-doc repeats also collapse to the first position") {
    val docs = Seq((7L, "x y. x y. z")).toDF("doc_id", "text")
    val out = CorpusPipeline.dedupAcrossDocs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((2L, 1L, "x y. z")))
  }

  test("capPerKey keeps at most N per key and is salt-count independent") {
    val rows = (0L until 200L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val a = CorpusPipeline.capPerKey(rows, "key", "id", maxPerKey = 4, salts = 1)
      .select("key", "id", "cap_rank").orderBy("key", "cap_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val b = CorpusPipeline.capPerKey(rows, "key", "id", maxPerKey = 4, salts = 13)
      .select("key", "id", "cap_rank").orderBy("key", "cap_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(a == b)
    assert(a.groupBy(_._1).forall { case (_, g) =>
      g.size == 4 && g.map(_._3).sorted == Seq(1, 2, 3, 4) })
    // survivor choice matches the reference md5 order
    val expectK0 = (0L until 200L).filter(_ % 3 == 0)
      .sortBy(i => (md5Hex(s"cap:$i"), i)).take(4)
    assert(a.filter(_._1 == "k0").map(_._2) == expectK0)
  }

  test("capPerKey with a cap above the key size keeps everything") {
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    val out = CorpusPipeline.capPerKey(rows, "key", "id", maxPerKey = 10, salts = 4)
    assert(out.count() == 3)
  }

  test("scoreLinearHashed: weights are (md5 hex prefix % 19) - 9, summed per doc") {
    def w(tok: String): Long =
      java.lang.Long.parseLong(md5Hex(tok).take(4), 16) % 19 - 9
    val docs = Seq((1L, "hello world hello"), (2L, "zzz")).toDF("doc_id", "text")
    val out = CorpusPipeline.scoreLinearHashed(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val s1 = 2 * w("hello") + w("world")
    val s2 = w("zzz")
    assert(out.toSeq == Seq(
      (1L, s1, 3L, if (s1 > 0) 1 else 0),
      (2L, s2, 1L, if (s2 > 0) 1 else 0)))
  }

  test("sourceDivergence: integer ppm total variation vs the corpus mix") {
    // s1: a:2 b:1 (ts=3), s2: a:1 b:3 (ts=4); corpus a:3 b:4 (t=7)
    // q_ppm: a=428571 b=571428
    // s1: |666666-428571| + |333333-571428| = 476190
    // s2: |250000-428571| + |750000-571428| = 357143
    val docs = Seq(("s1", "a a b"), ("s2", "a b b b")).toDF("source", "text")
    val out = CorpusPipeline.sourceDivergence(docs, "source", "text")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("s1", 3L, 2L, 476190L), ("s2", 4L, 2L, 357143L)))
  }

  test("sourceDivergence: terms absent from a source contribute their corpus mass") {
    val docs = Seq(("s1", "a"), ("s2", "b")).toDF("source", "text")
    val out = CorpusPipeline.sourceDivergence(docs, "source", "text")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("s1", 1L, 1000000L), ("s2", 1L, 1000000L)))
  }

  test("lmBigramSurprisal: inverse conditional probability, context marginal from bigrams") {
    // instances: d1 (a b)(b a)(a b), d2 (a b)(b c)
    // bc: "a b"=3 "b a"=1 "b c"=1; ctx: a=3, b=2
    // sur: "a b" = 3 div 3 = 1, "b a" = 2 div 1 = 2, "b c" = 2 div 1 = 2
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = CorpusPipeline.lmBigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // d3 has one token -> no bigrams -> no row
    assert(out.toSeq == Seq((1L, 3L, 4L, 1L), (2L, 2L, 3L, 1L)))
  }

  test("lmBigramSurprisal: hashed and string keys agree") {
    val docs = Seq((1L, "x y x y z"), (2L, "y z q")).toDF("doc_id", "text")
    val a = CorpusPipeline.lmBigramSurprisal(docs, "doc_id", "text", hashKeys = true)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = CorpusPipeline.lmBigramSurprisal(docs, "doc_id", "text", hashKeys = false)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("duplicatedSpans merges consecutive duplicated gram positions into maximal spans") {
    // shared 4-token run "a b c d" -> with n=3: grams "a b c","b c d"
    // duplicated, consecutive in both docs -> 1 span of 2 grams = 4 tokens
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d q"),
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 3 has no duplicated grams -> no row
    assert(out.toSeq == Seq((1L, 1L, 2L, 4L), (2L, 1L, 2L, 4L)))
  }

  test("duplicatedSpans: two separated repeats stay two spans") {
    // "p q r" (pos 0) and "u v w" (pos 4) both duplicated, gap at 1-3
    val docs = Seq(
      (1L, "p q r m n o u v w"),
      (2L, "p q r z z z"),
      (3L, "k u v w k k")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 3L), (2L, 1L, 1L, 3L), (3L, 1L, 1L, 3L)))
  }

  test("docTopTerms ranks by tf*1e6 div df with term tiebreak") {
    // df: a=2 b=1 c=2; d1 scores: a 2*1e6/2=1e6, b 1e6, c 5e5
    // tie a/b at 1e6 -> a first (term order)
    val docs = Seq((1L, "a a b c"), (2L, "a c c")).toDF("doc_id", "text")
    val out = CorpusPipeline.docTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1, "a", 1000000L), (1L, 2, "b", 1000000L),
      (2L, 1, "c", 1000000L), (2L, 2, "a", 500000L)))
  }

  test("gramNovelty: a gram instance is novel only in its earliest document") {
    // n=3: d1 "a b c d" grams (a b c)(b c d); d2 repeats (a b c) + own (b c x)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c x")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.gramNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 100L), (2L, 2L, 1L, 50L)))
  }

  test("invertedIndex: df, total tf, and doc-ordered posting digest") {
    val docs = Seq(
      (10L, "a b a"),
      (11L, "b c"),
      (12L, "a")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.invertedIndex(docs, "doc_id", "text")
      .orderBy("term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("a", 2L, 3L, md5Hex("10:2 12:1")),
      ("b", 2L, 2L, md5Hex("10:1 11:1")),
      ("c", 1L, 1L, md5Hex("11:1"))))
  }

  test("invertedIndex dfCap: stopword-grade terms keep stats but skip the posting digest") {
    val docs = Seq((10L, "a b a"), (11L, "b c"), (12L, "a")).toDF("doc_id", "text")
    val out = CorpusPipeline.invertedIndex(docs, "doc_id", "text", dfCap = 1L)
      .orderBy("term")
      .collect().map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) null else r.getString(3)))
    // a and b have df=2 > cap -> exact stats, NULL digest; c still digests
    assert(out.toSeq == Seq(
      ("a", 2L, null), ("b", 2L, null), ("c", 1L, md5Hex("11:1"))))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** C100: unigram-LM (SentencePiece-family) tokenizer — Viterbi
 * segmentation + distributed hard-EM trainer. */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  test("Viterbi picks the max-score segmentation with exact micro-nat scores") {
    // total 12: score(x) = round(ln(c/12)·1e6):
    //  a,b,c (2) → −1791759; ab (4) → −1098612; abc (2) → −1791759.
    val m = new UnigramModel(
      Array("a", "b", "c", "ab", "abc"), Array(2L, 2L, 2L, 4L, 2L), 5)
    // [abc] −1791759 beats [ab,c] −2890371 beats [a,b,c] −5375277
    assert(m.encodeWord("abc") == Seq("abc"))
    assert(m.encodeWord("abab") == Seq("ab", "ab"))
    // unknown char takes the fixed single-char penalty, never fails
    assert(m.encodeWord("axb") == Seq("a", "x", "b"))
    assert(m.encodeWord("") == Seq())
    // full-text path pre-tokenizes first (GPT-2 split keeps the
    // leading space on the second pre-token; space is OOV here)
    assert(m.encode("abc abab") == Vector("abc", " ", "ab", "ab"))
  }

  test("distributed trainer matches the independent local path exactly") {
    val texts = Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "a cat and a rat sat", "the mat the cat the rat", null)
    val docsDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = UnigramLm.learnDistributed(docsDf, "text",
      vocabSize = 64, emRounds = 2, seedSize = 256, maxPieceLen = 4)
    val local = UnigramLm.learnLocal(texts,
      vocabSize = 64, emRounds = 2, seedSize = 256, maxPieceLen = 4)
    assert(dist.pieces.toSeq == local.pieces.toSeq)
    assert(dist.counts.toSeq == local.counts.toSeq)
    // codegen count column == driver encode length, doc by doc
    val got = docsDf.select(col("doc_id"),
      UnigramLm.tokenCount(col("text"), dist).cast(LongType).as("n"))
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq
    val want = texts.map(t => if (t == null) -1L else local.encode(t).length.toLong)
    assert(got == want)
  }

  test("property: Viterbi segmentation is OPTIMAL vs brute-force enumeration") {
    // random tiny models over {a,b,c} with random counts; random words
    // ≤ 8 chars (2^7 segmentations, exhaustively enumerable). The
    // returned segmentation must (1) re-concatenate to the word and
    // (2) score exactly the brute-force maximum under the same
    // integer micro-nat formula (unk single char = -30000000).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alpha = "abc"
    def gen[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val pieceGen = for {
      n <- Gen.choose(1, 4)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha.toSeq))
    } yield cs.mkString
    for (trial <- 0 until 60) {
      val multis = gen(Gen.listOfN(5, pieceGen), 900 + trial)
        .filter(_.length > 1).distinct
      val pieces = alpha.map(_.toString) ++ multis
      val counts = pieces.indices
        .map(i => gen(Gen.choose(1L, 50L), 7000 + 31 * trial + i))
      val m = new UnigramModel(pieces.toArray, counts.toArray, 4)
      val total = math.max(counts.sum, 1L)
      val score = pieces.zip(counts).map { case (p, c) =>
        p -> math.round(StrictMath.log(c.toDouble / total.toDouble) * 1e6)
      }.toMap
      def segScore(segs: Seq[String]): Option[Long] = {
        val parts = segs.map { s =>
          score.get(s).orElse(if (s.length == 1) Some(-30000000L) else None)
        }
        if (parts.forall(_.isDefined)) Some(parts.flatten.sum) else None
      }
      def allSegs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Nil)
        else (1 to math.min(4, w.length)).flatMap(k =>
          allSegs(w.drop(k)).map(w.take(k) +: _))
      val word = gen(for {
        n <- Gen.choose(1, 8)
        cs <- Gen.listOfN(n, Gen.oneOf((alpha + "x").toSeq))
      } yield cs.mkString, 5000 + trial)
      val got = m.encodeWord(word)
      assert(got.mkString == word, s"coverage broke on '$word': $got")
      val best = allSegs(word).flatMap(segScore).max
      assert(segScore(got).contains(best),
        s"suboptimal on '$word': got $got (${segScore(got)}) vs best $best")
    }
  }

  test("a frequent short word becomes a single piece; vocab prune holds the cap") {
    val docsDf = (0 until 50).map(i => (i.toLong, "hello world hello"))
      .toDF("doc_id", "text")
    val m = UnigramLm.learnDistributed(docsDf, "text",
      vocabSize = 32, emRounds = 2, seedSize = 128, maxPieceLen = 5)
    assert(m.encodeWord("hello") == Seq("hello"))
    assert(m.pieces.length <= 32 ||
      // chars are never pruned: the cap can only be exceeded by chars
      m.pieces.count(_.codePointCount(0, 1) == 1) == m.pieces.length)
    spark.catalog.clearCache()
  }
}

package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property fuzz for the learned-BPE codec (pure JVM — no Spark):
 * the fast memoized counting path ([[BpeCodec.countTokens]], what the
 * codegen'd expression calls) must agree with the reference
 * segmentation ([[BpeCodec.encode]]) on ANY text under ANY learned
 * merge table, including surrogate pairs, mixed scripts, contractions
 * and whitespace runs. Complements BpeSpec's hand-computed cases and
 * the q_c11b/q_d4 oracle pins.
 */
class BpePropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val wordGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(10)),
    Gen.oneOf("the", "the", "tokenizer", "don't", "it's", "café", "über",
      "東京都", "naïve", "a,b.", "!?;", "12345", "x", "",
      new String(Character.toChars(0x1F600)),              // emoji (surrogate pair)
      new String(Character.toChars(0x1F680)) + "rocket"))
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 25)
    words <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ", "\t", "\n", " \n ")
  } yield words.mkString(sep)

  test("countTokens == encode().length for random codecs x random texts") {
    for (c <- 0 until 8) {
      val trainTexts = (0 until 40).map(i => sample(textGen, 900L * c + i))
      val merges = sample(Gen.oneOf(0, 1, 5, 30, 120), 333L + c)
      val codec = new BpeCodec(Bpe.learn(trainTexts, merges))
      for (i <- 0 until 150) {
        val t = sample(textGen, 5000L * c + i)
        assert(codec.countTokens(UTF8String.fromString(t)) == codec.encode(t).length,
          s"codec $c ($merges merges) text: ${t.take(60)}")
      }
    }
  }

  test("counts are total pre-token splits at zero merges, and never below pre-token count") {
    val codec0 = new BpeCodec(Vector())
    for (i <- 0 until 200) {
      val t = sample(textGen, 42000L + i)
      val pre = Bpe.preTokens(t)
      val n0 = codec0.countTokens(UTF8String.fromString(t))
      // no merges: one token per code point of every pre-token
      assert(n0 == pre.map(w => w.codePointCount(0, w.length)).sum)
      val trained = new BpeCodec(Bpe.learn(Seq(t), 50))
      assert(trained.countTokens(UTF8String.fromString(t)) >= pre.length)
    }
  }

  test("null and empty input count zero") {
    val codec = new BpeCodec(Vector(("a", "b")))
    assert(codec.countTokens(null) == 0)
    assert(codec.countTokens(UTF8String.fromString("")) == 0)
  }
}

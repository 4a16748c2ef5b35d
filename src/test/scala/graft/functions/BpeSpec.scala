package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Learned-merge BPE (C11 real-tokenizer path): merge learning is the
 * classic highest-frequency-pair iteration with deterministic
 * tie-breaks; encoding is the GPT-2 lowest-rank merge loop. The
 * codegen'd BpeTokenCount expression must agree exactly with the
 * reference encoder (`BpeCodec.encode`) on every input.
 */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("learn: hand-computed merges on a tiny corpus, deterministic ties") {
    // pre-tokens of "ab ab ab": "ab", " ab", " ab"
    // round 1: pairs (a,b)=3, (' ',a)=2 → merge (a,b)
    // round 2: words {[' ',ab]:2} → merge (' ',ab); then nothing left
    val merges = Bpe.learn(Seq("ab ab ab"), numMerges = 5)
    assert(merges == Vector(("a", "b"), (" ", "ab")))
  }

  test("learn: count ties break to the lexicographically smallest pair") {
    // separate texts → no leading-space pre-token; (x,y) and (x,z) tie
    val merges = Bpe.learn(Seq("xy", "xz"), numMerges = 1)
    assert(merges == Vector(("x", "y")))
    // within one text the leading space participates: (' ',x) wins the
    // three-way tie because ' ' < 'x'
    val withSpace = Bpe.learn(Seq("xy xz"), numMerges = 1)
    assert(withSpace == Vector((" ", "x")))
  }

  test("encode: merges apply by rank, unmergeable symbols survive") {
    val codec = new BpeCodec(Vector(("a", "b"), (" ", "ab"), ("ab", "c")))
    assert(codec.encode("ab") == Vector("ab"))
    assert(codec.encode("abc") == Vector("abc"))      // (a,b) then (ab,c)
    assert(codec.encode("ab ab") == Vector("ab", " ab"))
    assert(codec.encode("abd") == Vector("ab", "d"))  // d never merges
    assert(codec.encode("") == Vector())
    // "abd" → [ab, d]; " abc" → rank order: (a,b) then (' ',ab) beats
    // (ab,c) → [" ab", c]
    assert(codec.encode(" abc") == Vector(" ab", "c"))
    assert(codec.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString("abd abc")) == 4)
  }

  test("no merges: every code point of every pre-token is a token") {
    val codec = new BpeCodec(Vector())
    assert(codec.encode("hi yo") == Vector("h", "i", " ", "y", "o"))
  }

  test("expression == reference encoder on varied corpus text (codegen parity)") {
    val rnd = new scala.util.Random(23)
    val vocabWords = Seq("the", "tokenizer", "merges", "pairs", "byte", "pair",
      "encoding", "works", "on", "text", "123", "42", "don't", "café,")
    val texts = Seq.tabulate(300)(i =>
      Seq.fill(rnd.nextInt(20) + 1)(vocabWords(rnd.nextInt(vocabWords.length)))
        .mkString(" ") + (if (i % 7 == 0) "  \n extra!" else ""))
    val codec = new BpeCodec(Bpe.learn(texts.take(100), numMerges = 150))
    val got = texts.toDF("text")
      .select(col("text"), Bpe.tokenCount(col("text"), codec).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    got.foreach { case (t, n) =>
      assert(n == codec.encode(t).length, s"mismatch on: $t")
    }
  }

  test("more merges never increase the token count; floor is the pre-token count") {
    val texts = Seq("the cat sat on the mat", "the the the", "a1 b2 c3!")
    val sample = texts ++ texts
    val counts = Seq(0, 5, 50, 500).map { m =>
      val codec = new BpeCodec(Bpe.learn(sample, m))
      texts.map(t => codec.encode(t).length).sum
    }
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
    val full = new BpeCodec(Bpe.learn(sample, 500))
    val preTotal = texts.map(t => Bpe.preTokens(t).length).sum
    assert(texts.map(t => full.encode(t).length).sum >= preTotal)
  }

  test("surrogate pairs never split (code-point symbols)") {
    val codec = new BpeCodec(Vector())
    val emoji = new String(Character.toChars(0x1F600)) // one code point, two chars
    assert(codec.encode(emoji) == Vector(emoji))
  }
}

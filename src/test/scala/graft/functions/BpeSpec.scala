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

  test("encodeIds: cp ids below 0x110000, merge ids above, astral-safe") {
    val codec = new BpeCodec(Vector(("a", "b"), ("ab", "c")))
    import org.apache.spark.unsafe.types.UTF8String
    // "abc" → merges to "ab","c" → "abc"? rank0 (a,b) fires, then (ab,c)
    assert(codec.encodeIds(UTF8String.fromString("abc")).toSeq ==
      Seq(0x110000 + 1)) // the (ab,c) product
    assert(codec.encodeIds(UTF8String.fromString("xy")).toSeq ==
      Seq('x'.toInt, 'y'.toInt))
    val emoji = new String(Character.toChars(0x1F600))
    assert(codec.encodeIds(UTF8String.fromString(emoji)).toSeq == Seq(0x1F600))
    assert(codec.encodeIds(null).isEmpty)
  }

  test("BpeEncodeIds expression matches the driver encode path in-plan") {
    val codec = Bpe.learnFromCorpus(
      Seq((0L, "the cat sat on the mat"), (1L, "the bat and the cat"),
        (2L, "mat bat cat sat")).toDF("doc_id", "text"),
      "doc_id", "text", numMerges = 20, sampleDocs = 3)
    val texts = Seq((0L, "the cat sat"), (1L, "on a mat"), (2L, ""))
    val got = texts.toDF("id", "t")
      .select($"id", Bpe.encodeIdsCol($"t", codec).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == codec.encode(t).map(codec.symbolId), s"id $id")
    }
  }

  test("learnDistributed == learn on the same texts (histogram paths agree)") {
    val texts = Seq(
      "the cat sat on the mat", "the cat ran", "a mat and a cat",
      "cats sit on mats", "the the the cat cat") ++
      (0 until 40).map(i => s"filler${i % 6} words here the cat")
    val viaSeq = Bpe.learn(texts, 30)
    val viaSpark = Bpe.learnDistributed(
      texts.zipWithIndex.map(_.swap).toDF("id", "text"), "text", 30)
    assert(viaSpark.merges == viaSeq)
  }

  test("learnDistributed: maxWordForms truncation is deterministic") {
    val df = (0 until 200).map(i => (i, s"common words w${i % 9} rare$i")).toDF("id", "text")
    val a = Bpe.learnDistributed(df, "text", 20, maxWordForms = 12)
    val b = Bpe.learnDistributed(df, "text", 20, maxWordForms = 12)
    assert(a.merges == b.merges && a.merges.nonEmpty)
    // truncation keeps the head of the Zipf curve: training on the
    // full histogram starts from the same most-frequent pairs
    val full = Bpe.learnDistributed(df, "text", 5)
    assert(a.merges.take(3).toSet.intersect(full.merges.take(5).toSet).nonEmpty)
  }

  test("packTokenIds: blocks, counts, and digests match a serial replay") {
    val codec = new BpeCodec(Bpe.learn(Seq("aa bb aa bb cc"), 10))
    val docs = (0L until 12L).map(i => (i, s"aa bb cc d$i end")).toDF("doc_id", "text")
    val out = graft.operators.CorpusPipeline.packTokenIds(docs, codec, seqLen = 7)
      .orderBy("seq_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val all = (0L until 12L).flatMap(i =>
      codec.encode(s"aa bb cc d$i end").map(codec.symbolId))
    val expect = all.grouped(7).zipWithIndex.map { case (b, i) =>
      (i.toLong, b.length.toLong,
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          b.zipWithIndex.map { case (id, p) => s"$p:$id" }.mkString(" ")))
    }.toSeq
    assert(out.toSeq == expect)
    spark.catalog.clearCache() // packTokenIds persists the id table
  }

  test("C87 fertility audit: expression path equals the driver encode path per language") {
    // the q_c87 contract: per-lang BPE sums from the codegen expression
    // must equal the independent BpeCodec.encode replay the dynamic
    // oracle pins, and the integer ratios must be exact
    val rows = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat"),
      (3L, "zh", "你好世界"),
      (4L, "de", "der hund sitzt auf der matte"))
    val df = rows.toDF("doc_id", "lang", "text")
    val codec = Bpe.learnFromCorpus(df, "doc_id", "text", numMerges = 20, sampleDocs = 10)
    val got = df.groupBy("lang")
      .agg(
        sum(Bpe.tokenCount(col("text"), codec).cast("long")).as("bpe_tokens"),
        sum(octet_length(col("text")).cast("long")).as("utf8_bytes"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = rows.groupBy(_._2).map { case (lang, rs) =>
      lang -> (
        rs.map(r => codec.encode(r._3).length.toLong).sum,
        rs.map(_._3.getBytes("UTF-8").length.toLong).sum)
    }
    assert(got == expect)
    // CJK without merges fragments per byte-ish symbol: fertility per
    // ws token must exceed the latin scripts' (the fairness signal)
    val ws = rows.groupBy(_._2).view.mapValues(_.map(_._3.trim.split("\\s+").length.toLong).sum).toMap
    def fert(l: String) = got(l)._1 * 1000000L / ws(l)
    assert(fert("zh") > fert("en"))
  }
}

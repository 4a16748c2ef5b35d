package graft.operators

import graft.SparkSpec
import graft.functions.{MinHashSig, SimHash64, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property tests for the codegen'd sketch expressions: on ARBITRARY
 * text (any unicode, any whitespace shape, empty strings) the single-
 * pass expressions must agree bit-for-bit with the SQL/HOF
 * formulations they replace. Example-based specs pin the known edge
 * cases; these pin the cases nobody thought of. Generators run with
 * fixed seeds so failures reproduce.
 */
class SketchPropertySpec extends SparkSpec {

  import spark.implicits._

  // text with interesting shapes: unicode, runs of mixed whitespace,
  // empty/blank strings, punctuation-heavy tokens
  private val wordGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("über", "naïve", "東京", "a,b.", "x!?", "", "'s", "--", "the", "a", "in"))
  private val sepGen = Gen.oneOf(" ", "  ", "\t", " \t ", "\n", "")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    words <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    lead <- Gen.oneOf("", " ", "\t", "  ")
    trail <- Gen.oneOf("", " ", "\n")
  } yield lead + words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString + trail

  private def corpus(n: Int, seed: Long): Seq[String] =
    (0 until n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("VectorDotLong == HOF aggregate/zip_with on arbitrary long vectors") {
    import graft.functions.VectorDotLong
    val vecGen = Gen.listOfN(64, Gen.choose(-1000L, 1000L))
    val rows = (0 until 200).flatMap { i =>
      for {
        a <- vecGen.apply(Gen.Parameters.default, Seed(7L + i))
        b <- vecGen.apply(Gen.Parameters.default, Seed(9000L + i))
      } yield (a.toArray, b.toArray)
    }
    val d = rows.toDF("a", "b")
    val both = d.select(
      VectorDotLong($"a", $"b").as("expr"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), _ + _).as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // length mismatch → NULL, matching the reranks' null contract
    val mm = d.select(VectorDotLong(slice($"a", 1, 10), $"b")).head
    assert(mm.isNullAt(0))
  }

  test("WordShingles == HOF transform/slice/concat_ws on 300 arbitrary texts x n=1..5") {
    val d = corpus(300, 41L).toDF("text")
    for (n <- 1 to 5) {
      val t = TF.tokens($"text")
      val hof = when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", slice(t, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", t)))
      val rows = d.select($"text", hof.as("a"), TF.shingles($"text", n).as("b")).collect()
      rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"n=$n text='${r.getString(0)}'"))
    }
  }

  test("MinHashSig == SQL min(xxhash64(shingle,i)) on 200 arbitrary texts") {
    val d = corpus(200, 97L).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val nh = 8
    val sqlSig = d
      .select($"id", explode(TF.shingles($"text", 3)).as("sh"))
      .groupBy("id")
      .agg(array((0 until nh).map(i => min(xxhash64($"sh", lit(i)))): _*).as("sig"))
    val exprSig = d.select($"id", MinHashSig(TF.tokens($"text"), 3, nh).as("sig"))
    val joined = sqlSig.alias("a").join(exprSig.alias("b"), "id")
      .select($"a.sig", $"b.sig").collect()
    assert(joined.length == d.count())
    joined.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("SimHash64 == HOF formulation on 300 arbitrary texts") {
    val d = corpus(300, 7L).toDF("text")
    val rows = d.select($"text",
      Dedup.simhash($"text").as("hof"),
      SimHash64(TF.tokens($"text")).as("expr")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"text='${r.getString(0)}'"))
  }

  test("stopwordCount regex == token-equality lambda on 500 arbitrary texts") {
    val d = corpus(500, 13L).toDF("text")
    val rows = d.select($"text",
      TF.stopwordCount($"text").as("re"),
      size(filter(TF.tokens(lower($"text")),
        tk => tk.isin("the", "a", "and", "is", "of", "to", "in"))).as("tok")).collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2), s"text='${r.getString(0)}'"))
  }

  test("md5Bucket stays in range and is content-deterministic across bucket counts") {
    val d = corpus(200, 23L).toDF("text")
    for (b <- Seq(1, 2, 7, 100, 9973)) {
      val one = d.select(TF.md5Bucket($"text", b).as("v")).collect().map(_.getLong(0))
      assert(one.forall(v => v >= 0 && v < b))
      val two = d.select(TF.md5Bucket($"text", b).as("v")).collect().map(_.getLong(0))
      assert(one.toSeq == two.toSeq)
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * r20: Dedup.splitLeakage / Dedup.attritionFunnel compute their
 * minhash signatures MAP-ONLY via [[Md5MinhashSig]] instead of the
 * shingle explode + per-doc slot-min aggregate chain. That rewrite is
 * sound only if the expression is bit-identical to the aggregate
 * chain on every reachable input — including the edge shapes
 * `tokens()` produces: null text (null tokens → null signature; the
 * explode path emitted no rows), empty/whitespace-only text (ONE ""
 * token → one "" whole-text shingle), and < shingle-size token counts
 * (one whole-text shingle). This spec pins the parity the operators
 * now rely on.
 */
class Md5MinhashSigParitySpec extends SparkSpec {

  import spark.implicits._

  private val shingleN = 3
  private val sigs = 8

  /** The batch aggregate chain, verbatim from the old operator shape:
   * gram hash h = md5₅₂(g), slot j = min md5₅₂(h ∥ "_j"). */
  private def aggChain(df: org.apache.spark.sql.DataFrame) = {
    val h = conv(substring(md5(col("g")), 1, 13), 16, 10).cast(LongType)
    def slotMin(j: Int) =
      min(conv(substring(md5(concat(col("h").cast("string"), lit(s"_$j"))),
        1, 13), 16, 10).cast(LongType)).as(s"s$j")
    df.select(col("id"),
        explode(TextFunctions.shingles(col("text"), shingleN)).as("g"))
      .select(col("id"), h.as("h"))
      .groupBy("id")
      .agg(slotMin(0), (1 until sigs).map(slotMin): _*)
  }

  test("map-only expression == explode+agg chain, incl. edge shapes") {
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact twin
      (3L, ""),                                    // one "" token
      (4L, "   \t  "),                             // whitespace-only -> ""
      (5L, "single"),                              // 1 token < shingle
      (6L, "two tokens"),                          // 2 tokens < shingle
      (7L, "exactly three tokens"),                // == shingle
      (8L, "a  b   c    d"),                       // multi-space runs
      (9L, "dup dup dup dup dup"),                 // duplicate shingles
      (10L, null.asInstanceOf[String]))            // null text
    val df = rows.toDF("id", "text")
    val fast = df.select(col("id"),
      Md5MinhashSig(TextFunctions.tokens(col("text")), shingleN, sigs)
        .as("sig"))
    // null text must yield a null signature (the row the old explode
    // dropped); everything else must match the aggregate chain.
    assert(fast.filter(col("id") === 10L && col("sig").isNotNull).count() == 0)
    val unpacked = fast.filter(col("sig").isNotNull)
      .select(col("id") +: (0 until sigs).map(j =>
        element_at(col("sig"), j + 1).as(s"s$j")): _*)
    val old = aggChain(df)
    assert(old.count() == rows.size - 1) // null-text row absent
    assert(unpacked.count() == rows.size - 1)
    assert(unpacked.except(old).isEmpty && old.except(unpacked).isEmpty)
  }

  test("parity holds on a bulk random corpus") {
    val rng = new scala.util.Random(7)
    val words = Vector("lorem", "ipsum", "dolor", "sit", "amet", "zz", "qq")
    val rows = (0L until 500L).map { i =>
      val n = rng.nextInt(12) // 0..11 tokens — includes < shingle sizes
      (i, (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    val df = rows.toDF("id", "text")
    val unpacked = df.select(col("id"),
        Md5MinhashSig(TextFunctions.tokens(col("text")), shingleN, sigs)
          .as("sig"))
      .select(col("id") +: (0 until sigs).map(j =>
        element_at(col("sig"), j + 1).as(s"s$j")): _*)
    val old = aggChain(df)
    assert(unpacked.except(old).isEmpty && old.except(unpacked).isEmpty)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C58 Count-Min sketch: grid parity with the SQL-composable bucket-sum
 * formulation, estimate domination, mergeability, forced collisions. */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val depth = 4
  private val width = 64

  /** ~600 tokens over a 150-term vocab with a Zipf-ish skew. */
  private def corpus: DataFrame =
    spark.range(600)
      .select(concat(lit("tk"), (col("id") * col("id") % 150).cast("string")).as("w"))

  private def sketchOf(df: DataFrame, d: Int = depth, w: Int = width): Array[Long] =
    df.select(CountMin.sketchAgg(CountMin.buckets(col("w"), d, w), d, w).as("sk"))
      .head().getSeq[Long](0).toArray

  test("C58: aggregate grid equals the explode/groupBy bucket-sum formulation") {
    val viaAgg = sketchOf(corpus)
    val viaSql = corpus
      .select(posexplode(CountMin.buckets(col("w"), depth, width)).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getInt(0) * width + x.getInt(1)) -> x.getLong(2)).toMap
    val expected = Array.tabulate(depth * width)(i => viaSql.getOrElse(i, 0L))
    assert(viaAgg.toSeq == expected.toSeq)
  }

  test("C58: estimate dominates the exact count for every key") {
    val sk = sketchOf(corpus)
    val bad = corpus.groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("est", CountMin.estimate(sk, col("w"), depth, width))
      .filter(col("est") < col("c")).count()
    assert(bad == 0L)
  }

  test("C58: wide grid (no collisions) makes every estimate exact") {
    val w = 4096
    val sk = sketchOf(corpus, depth, w)
    val off = corpus.groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("est", CountMin.estimate(sk, col("w"), depth, w))
      .filter(col("est") =!= col("c")).count()
    assert(off == 0L)
  }

  test("C58: sketches merge by addition — two halves sum to the whole") {
    val a = corpus.filter(col("w").substr(3, 9).cast("long") % 2 === 0)
    val b = corpus.filter(col("w").substr(3, 9).cast("long") % 2 =!= 0)
    val merged = sketchOf(a).zip(sketchOf(b)).map { case (x, y) => x + y }
    assert(merged.toSeq == sketchOf(corpus).toSeq)
  }

  test("C58: depth=1 width=2 degenerates to bucket totals (forced collisions)") {
    val sk = sketchOf(corpus, 1, 2)
    assert(sk.sum == 600L)
    val est = corpus.groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("est", CountMin.estimate(sk, col("w"), 1, 2))
    // every estimate equals its bucket's total mass
    assert(est.filter(col("est") > lit(600L)).count() == 0L)
    assert(est.filter(col("est") < col("c")).count() == 0L)
  }
}

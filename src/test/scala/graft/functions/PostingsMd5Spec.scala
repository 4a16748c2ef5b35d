package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * PostingsMd5 must agree bit-for-bit with the HOF formulation it
 * replaces in [[graft.operators.CorpusPipeline.invertedIndex]]:
 * `md5(array_join(transform(array_sort(collect_list(struct(id, tf))),
 * x -> concat(id, ':', tf)), ' '))`.
 */
class PostingsMd5Spec extends SparkSpec {

  import spark.implicits._

  private def hofDigest = md5(array_join(
    transform(
      array_sort(collect_list(struct($"id", $"tf"))),
      x => concat(x.getField("id").cast("string"), lit(":"),
        x.getField("tf").cast("string"))),
    " "))

  test("parity with the HOF chain, including duplicate ids and extremes") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val term = s"t${i % 97}"
      // duplicate (term, id) pairs exercise the tf tiebreak; extremes
      // exercise Long rendering
      val id = if (i % 211 == 0) Long.MaxValue else rng.nextInt(500).toLong
      val tf = if (i % 307 == 0) Long.MinValue else rng.nextInt(1000).toLong
      (term, id, tf)
    } :+ (("negative", -42L, 7L))
    val df = rows.toDF("term", "id", "tf").groupBy("term")
      .agg(
        PostingsMd5(collect_list(struct($"id", $"tf"))).as("fast"),
        hofDigest.as("hof"))
    assert(df.filter($"fast" =!= $"hof").count() == 0)
    assert(df.count() == 98)
  }

  test("single posting and empty-string md5 shape") {
    val one = Seq(("t", 5L, 3L)).toDF("term", "id", "tf").groupBy("term")
      .agg(PostingsMd5(collect_list(struct($"id", $"tf"))).as("d"))
      .select("d").as[String].head()
    // md5("5:3")
    assert(one == org.apache.commons.codec.digest.DigestUtils.md5Hex("5:3"))
  }
}

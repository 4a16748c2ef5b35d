package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval-containment join: point x matches every [lo, hi) holding it,
 * via bucket-explode equi-join — results must be exact and independent
 * of the chosen bucket width. */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private val intervals = Seq(
    (1, 0.0, 10.0),
    (2, 5.0, 15.0),   // overlaps interval 1 on [5,10)
    (3, 20.0, 21.0),  // narrow
    (4, -10.0, -1.0)  // negative range
  ).toDF("iid", "lo", "hi")

  private val points = Seq(0.0, 5.0, 9.99, 10.0, 14.999, 20.5, -5.0, 100.0)
    .zipWithIndex.map { case (v, i) => (i, v) }.toDF("pid", "x")

  private def pairs(w: Double): Set[(Int, Int)] =
    IntervalJoin.overlap(points, "x", intervals, "lo", "hi", w)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private val expected = Set(
    (0, 1),          // 0.0 in [0,10) only
    (1, 1), (1, 2),  // 5.0 in both overlapping intervals
    (2, 1), (2, 2),  // 9.99 in both
    (3, 2),          // 10.0: excluded from [0,10) (hi exclusive), in [5,15)
    (4, 2),          // 14.999 in [5,15)
    (5, 3),          // 20.5 in [20,21)
    (6, 4))          // -5.0 in [-10,-1)
    // 100.0 matches nothing

  test("lo inclusive, hi exclusive, overlapping and negative intervals") {
    assert(pairs(4.0) == expected)
  }

  test("results do not depend on bucket width") {
    for (w <- Seq(0.5, 1.0, 7.0, 1000.0)) assert(pairs(w) == expected, s"w=$w")
  }

  test("plans as an equi-join, not a cartesian/nested-loop") {
    val plan = IntervalJoin.overlap(points, "x", intervals, "lo", "hi", 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("matches the naive non-equi join on random data") {
    val rnd = new scala.util.Random(3)
    val iv = Seq.tabulate(200) { i =>
      val lo = rnd.nextDouble() * 1000 - 500; (i, lo, lo + rnd.nextDouble() * 60)
    }.toDF("iid", "lo", "hi")
    val pts = Seq.tabulate(500)(i => (i, rnd.nextDouble() * 1200 - 600)).toDF("pid", "x")
    val got = IntervalJoin.overlap(pts, "x", iv, "lo", "hi", 30.0)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val naive = pts.join(iv, col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == naive && got.nonEmpty)
  }
}

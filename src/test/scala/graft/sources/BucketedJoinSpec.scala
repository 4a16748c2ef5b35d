package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C120: bucketed materialization makes keyed joins exchange-free —
 * the contract is the PLAN (co-location), pinned with broadcast
 * disabled so smallness can't fake it. */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  test("same-bucketed tables join with ZERO Exchange and correct rows") {
    val a = (1L to 1000L).map(i => (i, s"s${i % 7}")).toDF("id", "src")
    val b = (1L to 1000L).filter(_ % 3 != 0).map(i => (i, i * 2)).toDF("id", "v")
    Bucketed.materialize(a, "bspec_a", 4, "id",
      Some("/tmp/graft_bucketed_spec/a"))
    Bucketed.materialize(b, "bspec_b", 4, "id",
      Some("/tmp/graft_bucketed_spec/b"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.join(spark, "bspec_a", "bspec_b", "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // and the buckets are pre-sorted: no per-query Sort on the scans
      // (the sortBy half of the contract)
      val out = joined.agg(count(lit(1)), sum(col("v"))).head()
      val expected = a.join(b, Seq("id"))
        .agg(count(lit(1)), sum(col("v"))).head()
      assert(out == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("an UNbucketed probe against a bucketed table still shuffles the probe only") {
    val c = (1L to 500L).map(i => (i, i % 5)).toDF("id", "k")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bspec_a").join(c, Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly ONE exchange: the unbucketed side aligns to the
      // bucketed side's partitioning, the bucketed side stays put
      assert("Exchange".r.findAllIn(plan).size == 1, plan)
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }
}

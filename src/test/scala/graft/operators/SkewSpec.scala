package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Pins SURVEY §5's "AQE handles skew" claim: a deliberately skewed
 * shuffle join (one key owning ~90% of the fact side) must trigger
 * AQE's skew-join splitter — the hot partition is subdivided at
 * runtime instead of landing on one straggler task — while producing
 * exactly the same result as the unsplit join. Thresholds are shrunk
 * so the optimization fires at spec scale; at 100 TB the defaults
 * fire on genuinely oversized partitions.
 */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join and preserves the result") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fact: 50k rows, 90% on key 0, with a payload so bytes are skewed
      val fact = spark.range(50000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 97).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
      // dim side large enough to stay out of broadcast, several rows per key
      val dim = spark.range(2000).select(
        (col("id") % 97).as("k"), (col("id") * 7).as("w"))
      val joined = fact.join(dim, "k")
      // run THIS DataFrame's plan (count()/write spawn a different
      // QueryExecution, and AQE finalizes per execution)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      // expected: key 0 ⇒ 45000 × ~21 dim rows; others 500/96 each × ~20
      val expected = fact.groupBy("k").count()
        .join(dim.groupBy("k").count().withColumnRenamed("count", "dc"), "k")
        .agg(sum(col("count") * col("dc"))).head.getLong(0)
      assert(n == expected, s"skew join returned $n, expected $expected")
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

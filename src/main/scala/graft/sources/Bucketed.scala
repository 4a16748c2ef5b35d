package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * C120: bucketed corpus materialization — the storage-layout half of
 * shuffle avoidance at 100 TB. Every operator in this repo minimizes
 * what a single query shuffles; bucketing removes the shuffle from
 * every FUTURE query: write a table `bucketBy(n, key)` + `sortBy(key)`
 * and any join/aggregate keyed on `key` between same-bucketed tables
 * reads co-located, pre-sorted buckets — Catalyst plans a
 * SortMergeJoin with NO Exchange on either side (and no per-query
 * sort when the buckets are sorted). On a 1000-executor cluster this
 * is the difference between re-shuffling 100 TB on every
 * docs ⋈ embeddings pass and never shuffling either table again: the
 * one-time bucketed write pays the shuffle ONCE.
 *
 * Mechanics (all stock Spark, the point): `bucketBy` requires
 * `saveAsTable` (bucket metadata lives in the catalog, not the
 * files), `spark.sql.sources.bucketing.enabled` (default true) lets
 * the scan expose the bucketing as its output partitioning, and the
 * join keys must cover the bucket keys of BOTH sides with EQUAL
 * bucket counts. BucketedJoinSpec pins the contract: zero
 * ShuffleExchange in the joined plan (broadcast disabled so the test
 * proves co-location, not smallness).
 */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table (overwrite; at
   * `path` when given, else the session warehouse), ready for
   * exchange-free keyed joins. The pre-repartition BY THE BUCKET KEY
   * writes one file per bucket instead of tasks × buckets small files
   * (the layout a 100k-file 100 TB table needs). */
  def materialize(
      df: DataFrame,
      table: String,
      buckets: Int,
      key: String,
      path: Option[String] = None): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = df
      .repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Inner-join two same-bucketed tables on `key` — co-located read,
   * no Exchange on either side. */
  def join(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * C122: atomic versioned snapshot publishing — the exactly-once
 * BATCH-publication contract every curation pipeline needs between
 * "the job wrote parquet" and "consumers may train on it": a version
 * is visible if and only if it is COMPLETE. Spark's output committer
 * makes one write atomic per directory; this layer makes the
 * VERSION SEQUENCE atomic: each publish writes to `v=<n>` (next
 * integer) and then creates a `_PUBLISHED` marker as the LAST
 * operation — readers resolve `latest` by scanning version dirs and
 * taking the highest one WITH the marker, so a crashed/in-flight
 * writer (dir present, marker absent) is invisible and a re-run
 * simply publishes the next version. No compare-and-swap is needed
 * on a filesystem with atomic create; on object stores the marker
 * PUT is the commit point. This is the Delta/Iceberg commit idea
 * reduced to its minimal filesystem form — snapshots are immutable,
 * so consumers get repeatable reads and time travel for free
 * (`read(spark, base, v)`).
 */
object Snapshots {

  private val Marker = "_PUBLISHED"

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Version numbers under `base` (dirs named `v=<n>`), published
   * only when `publishedOnly`. */
  private def versions(
      spark: SparkSession, base: String, publishedOnly: Boolean): Seq[Long] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(p => !publishedOnly || f.exists(new Path(p, Marker)))
      .flatMap(p => scala.util.Try(p.getName.stripPrefix("v=").toLong).toOption)
      .sorted
  }

  /** Write `df` as the next version under `base`; the `_PUBLISHED`
   * marker is created LAST, after the parquet commit. Returns the
   * published version number. */
  def publish(df: DataFrame, base: String): Long = {
    val spark = df.sparkSession
    val next = versions(spark, base, publishedOnly = false)
      .lastOption.map(_ + 1).getOrElse(1L)
    val dir = s"$base/v=$next"
    df.write.mode("error").parquet(dir)
    val f = fs(spark, base)
    f.create(new Path(dir, Marker), false).close()
    next
  }

  /** Highest PUBLISHED version, or -1 if none. */
  def latestVersion(spark: SparkSession, base: String): Long =
    versions(spark, base, publishedOnly = true).lastOption.getOrElse(-1L)

  /** Read a published snapshot: the latest by default, or pinned
   * `version` (time travel). Throws if the version is absent or
   * unpublished — a half-written dir must never be readable. */
  def read(spark: SparkSession, base: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, base)
    require(v >= 0, s"no published snapshot under $base")
    require(versions(spark, base, publishedOnly = true).contains(v),
      s"version $v under $base is absent or unpublished")
    spark.read.parquet(s"$base/v=$v")
  }
}

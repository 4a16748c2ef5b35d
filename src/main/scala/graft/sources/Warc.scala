package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C111: WARC archive reader — `binaryFile` source (one task per
 * archive member, the right parallelism for how WARC ships: ~1 GiB
 * non-splittable gzip members, 100 TB = ~100k files) + the
 * [[graft.functions.WarcRecords]] single-pass framer (which
 * magic-sniffs gzip/zstd per segment, so `.warc`, `.warc.gz`, and
 * `.warc.zst` all read through one call). One row per record:
 * `warc_file` + the record struct's fields, with `response` records
 * carrying their HTTP status/Content-Type/body — the body feeds
 * [[graft.functions.HtmlExtract]] directly (the full crawl front
 * door: WARC → HTML → text).
 */
object Warc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("warc_file"),
        explode(graft.functions.WarcRecords(col("content"))).as("r"))
      .select(col("warc_file"), col("r.*"))
}

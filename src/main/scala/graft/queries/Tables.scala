package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver's testdata parquet. */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
   * reader rejects. Read it as raw nanos (legacy conf, runtime-settable)
   * and truncate to a µs timestamp — the same truncation DuckDB's
   * `epoch_us` applies, so oracle comparisons stay exact.
   */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The driver writes events.parquet as ONE row group, so every
    // downstream pipeline (notably the regex parse in LogQueries) would
    // run as a single task. Real 100 TB inputs arrive pre-split; emulate
    // that here with a cheap (~MBs) round-robin shuffle so the parse
    // stage uses every core.
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .repartition(s.sparkContext.defaultParallelism)
  }
}

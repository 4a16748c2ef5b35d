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
    val raw = t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // The driver writes sf* events.parquet as ONE row group, so every
    // downstream pipeline (notably the regex parse in LogQueries) would
    // run as a single task — worse, Catalyst legally pushes the parse
    // FILTER below a round-robin exchange into that single-split scan,
    // so an unconditional repartition doesn't even parallelize the
    // regex (measured: 10M lines at ×100 parsed in ONE task, 37 s).
    // Real 100 TB inputs arrive pre-split (the ×10/×100 tier dirs ship
    // multi-file events); repartition ONLY when the source genuinely
    // can't parallelize itself, and let the scan-level parse ride the
    // file splits otherwise.
    if (raw.rdd.getNumPartitions > 4) raw
    else raw.repartition(s.sparkContext.defaultParallelism)
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver's testdata parquet. */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * `events.ts` has shipped as parquet TIMESTAMP(NANOS) (rejected by
   * Spark's vectorized reader) and, since r9's testdata refresh, as
   * TIMESTAMP(MICROS). Branch on the READ schema rather than assuming
   * either: with `nanosAsLong` set, a NANOS column surfaces as LongType
   * (truncate to µs — the same truncation DuckDB's `epoch_us` applies,
   * so oracle comparisons stay exact), while MICROS surfaces as a
   * timestamp type we only need to cast to the session-zone timestamp.
   */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = t(s, dir, "events")
    val raw = base.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        base.withColumn("ts", col("ts").cast("timestamp"))
    }
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
    // File count (not rdd.getNumPartitions, which forces physical
    // planning + RDD instantiation per load): the driver writes ONE row
    // group per file, so parquet yields exactly one non-empty split per
    // file and file count IS the parallelism the source can offer.
    if (base.inputFiles.length > 4) raw
    else raw.repartition(s.sparkContext.defaultParallelism)
  }
}

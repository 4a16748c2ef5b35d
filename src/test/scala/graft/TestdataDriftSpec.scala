package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Guards against DRIVER TESTDATA drift, which the synthetic-data specs
  * cannot see: in round 9 the driver's `events.ts` silently moved from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the force-applied
  * nanos workaround in `Tables.events` broke 30/97 queries while
  * `sbt test` stayed green. These specs read the REAL sf0.001 parquet
  * (skipped when /root/testdata is absent, e.g. on a bare checkout) and
  * assert the loader adapts to whatever schema is actually on disk.
  */
class TestdataDriftSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = Files.exists(Paths.get(sfDir))

  test("Tables.events adapts to the on-disk ts physical type") {
    assume(available, s"$sfDir not present")
    val ev = graft.queries.Tables.events(spark, sfDir)
    val tsType = ev.schema("ts").dataType
    assert(tsType == TimestampType || tsType == TimestampNTZType,
      s"ts must surface as a timestamp, got $tsType")
    // Analysis + execution must both succeed on the real file: the r9
    // break was an AnalysisException (TIMESTAMP_NTZ div BIGINT).
    val n = ev.count()
    assert(n > 0, "events must be non-empty")
    // Values must land in the generator's plausible epoch range — a
    // wrong unit (nanos read as micros, or a double div-1000) lands
    // centuries away.
    val yr = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .collect()(0)
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"ts years out of range: $yr — unit mismatch in Tables.events?")
  }

  test("every SparkEntry query analyzes against real sf0.001 schemas") {
    assume(available, s"$sfDir not present")
    // Catch analysis-time schema drift for ALL tables in one cheap pass:
    // build every registered query's plan against the real testdata and
    // force analysis (no execution). Streaming-backed queries execute
    // eagerly on build, so only include batch ones here; the streaming
    // tier is exercised end-to-end by its own specs and Verify.
    val streaming = Set("q_d1_stream_ingest", "q_d2_stream_sessions",
      "q_d3_stream_dedup", "q_d4_stream_annotate", "q_d5_stream_join",
      "q_d6_stream_static", "q_d7_stream_sink", "q_d8_stream_quota",
      "q_d9_stream_neardup", "q_d10_stream_ann")
    val failures =
      try SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => streaming.contains(n) }
        .flatMap { case (name, fn) =>
          try { fn(spark, sfDir).queryExecution.analyzed; None }
          catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
        }
      finally {
        // Some queries persist+pin caches as a side effect of BUILDING
        // the DataFrame (sourceDivergence et al.); suites share one
        // forked JVM, so leaked cache entries would rewrite the plan
        // shapes PlanAuditSpec counts. Drop them all.
        spark.catalog.clearCache()
      }
    assert(failures.isEmpty,
      s"${failures.size} queries failed analysis on real testdata:\n" +
        failures.mkString("\n"))
  }
}

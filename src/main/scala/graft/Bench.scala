package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR.
  * Prints the full per-query JSON map on its own line, writes the same
  * line to a repo-root sidecar (bench_perquery_last.json — the driver's
  * 2000-char tail capture cannot hold a 140-query map; r6 and r10 both
  * lost most per-query numbers), then prints a COMPACT summary JSON
  * line LAST (total/ok/failed + the 10 slowest queries + the sidecar
  * path): the 91-query full line outgrew the driver's tail-capture
  * window and zeroed the machine-readable bench signal in round 6
  * (BENCH_r06 `parsed: null`), so the parseable line must stay short
  * and final.
  * Failed queries report -1 and are excluded from the total so one
  * regression can't silently pollute the headline metric. Both lines
  * carry `calib`: the wall time of a fixed CPU-only probe, the checker's
  * host-load normalizer (BASELINE.md '## Calibration'). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated subset (the x10-tier crossover gate runs
    // five heavy queries against /tmp/sf1 — tools/check_bench_regression.py)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // RocksDB is the streaming state-store DEFAULT (round 11): the
      // HDFS-backed provider writes per-partition-per-micro-batch files
      // — the wrong shape for 100 TB/day keyed state — while RocksDB
      // keeps state native off-heap with incremental checkpoints.
      // LogStreamSpec pins HDFS↔RocksDB bit-parity on the hard state
      // shapes (D2 timeout sessions, D9 LSH near-dup, D12 budget, D13
      // CMS), and the full Verify suite hash-checks all 17 streaming
      // topologies under this default. Batch queries never touch it.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM/codegen once so per-query times measure the plan, not
    // JIT. A filtered run (tier dirs hold only documents/embeddings, so
    // q_b2's lineitem scan would fail silently) warms its own first
    // query instead — otherwise the alphabetically-first timed query
    // absorbs the whole JIT+codegen cost. The compressed-text path
    // (Hadoop codec classloading, text source) is warmed by nothing on
    // the parquet side, so a cold JVM lands it all on
    // q_log_autodetect_glob (observed 3.1 s vs 1.0-1.2 s warm) — warm
    // that query too when it's in the run set.
    // Warm-up failures must be LOUD: a silently-broken warm query has
    // twice contaminated a round's bench artifact (r8 tier dirs lacking
    // lineitem, r9 the broken events table) by dumping all JIT cost on
    // the first timed query. On any failure fall back to a
    // documents-based query (documents.parquet exists in every tier dir)
    // and record warmup_ok in the summary lines.
    val warmNames =
      Set(only.map(_.min).getOrElse("q_b2_status_counts")) ++
        Set("q_log_autodetect_glob").filter(n => only.forall(_.contains(n)))
    var warmupOk = true
    def warmOne(n: String): Boolean =
      try { SparkEntry.queries.get(n).foreach(_(spark, sfDir).count()); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] WARM-UP FAILED for $n: ${e.getMessage}")
        false
      }
    warmNames.foreach { n =>
      if (!warmOne(n)) {
        warmupOk = false
        if (warmOne("q_c10_quality"))
          System.err.println("[bench] warm-up fell back to q_c10_quality")
      }
    }

    // Calibration probe: a FIXED CPU-bound job (range + chained xxhash64,
    // zero I/O) spread over all cores, run once untimed (its own JIT)
    // then once timed. Host load inflates this probe and the suite by
    // the same factor, so tools/check_bench_regression.py can normalize
    // pins by calib/calib-pin — three rounds running, the driver's BENCH
    // artifact tripped the gate purely from a loaded host while an idle
    // re-run passed. A single-query plan regression does NOT move calib,
    // so real regressions still fail the normalized gate.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0, 1L << 30, 1, cpus.toInt)
        .select(xxhash64(xxhash64(xxhash64(xxhash64(col("id"))))).as("h"))
        .agg(sum("h")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // discard: JIT/codegen for the probe plan itself
    val calib = calibrate()

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val good = results.filter(_._2 >= 0)
    val total = good.map(_._2).sum
    val fullLine =
      f"""{"metric":"total_full","value":$total%.3f,"unit":"sec","calib":$calib%.3f,"warmup_ok":$warmupOk%s,"queries":$qs%s,"ok":${good.size}%d,"failed":${results.size - good.size}%d,"sf":"$sfDir%s"}"""
    println(fullLine)
    // Sidecar: the driver's artifact capture keeps only the LAST ~2000
    // stdout chars, which a 140-query map outgrows (r6 and r10 both lost
    // the per-query numbers for everything before ~q_c66). Persist the
    // full line to a stable repo-root file and point at it from the
    // compact summary so regression forensics never depend on tail luck.
    val perqueryPath = sys.env.getOrElse(
      "SPARK_GRAFT_PERQUERY_OUT",
      new java.io.File(sys.props("user.dir"), "bench_perquery_last.json").getPath)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(perqueryPath),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] sidecar write failed: ${e.getMessage}")
    }
    val slow = results.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + f"""":$v%.2f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","calib":$calib%.3f,"warmup_ok":$warmupOk%s,"perquery":"$perqueryPath%s","queries":$slow%s,"ok":${good.size}%d,"failed":${results.size - good.size}%d,"sf":"$sfDir%s"}""")
    spark.stop()
  }
}

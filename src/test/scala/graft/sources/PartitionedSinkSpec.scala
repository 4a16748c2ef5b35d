package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Partitioned-sink specs: directory layout and partition pruning. */
class PartitionedSinkSpec extends SparkSpec {

  import spark.implicits._

  test("writeByDate lays out p_date directories and read-back prunes them") {
    val out = Files.createTempDirectory("graft_sink_spec").toString
    val df = (0 until 240).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-02-${i % 10 + 1}%02d 12:00:00"))
    }.toDF("id", "timestamp")
    PartitionedSink.writeByDate(df, out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length == 10 && dirs.head == "p_date=2024-02-01")

    val pruned = PartitionedSink.read(spark, out)
      .filter($"p_date" === "2024-02-03")
    assert(pruned.count() == 24)
    // pruning happens at planning: the scan's file listing under the
    // partition filter holds exactly one of the ten day-directories —
    // no IO against the other nine days
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PartitionFilters").contains("p_date"))
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.length == 1)
    assert(selected.head.files.nonEmpty)
  }

  test("streamWriterByDate lands batch_id dirs and a retried batch is idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_d7_spec").toString + "/sink"
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("id", "ts")
    val q = PartitionedSink.streamWriterByDate(stream, out, "ts").start()
    try {
      mem.addData((1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
        (2L, java.sql.Timestamp.valueOf("2024-03-02 10:00:00")))
      q.processAllAvailable()
      mem.addData((3L, java.sql.Timestamp.valueOf("2024-03-02 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val back = PartitionedSink.read(spark, out)
    assert(back.columns.contains("batch_id") && back.columns.contains("p_date"))
    assert(back.count() == 3)
    assert(back.filter($"p_date" === "2024-03-02").count() == 2)
    // a replayed micro-batch overwrites its own directory — same rows, no dupes
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
        (2L, java.sql.Timestamp.valueOf("2024-03-02 10:00:00")))
      .toDF("id", "ts")
      .withColumn("p_date", to_date($"ts"))
      .repartition($"p_date", pmod(xxhash64($"ts"), lit(2)))
      .write.partitionBy("p_date").mode("overwrite").parquet(s"$out/batch_id=0")
    assert(PartitionedSink.read(spark, out).count() == 3)
  }
}

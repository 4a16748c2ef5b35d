package graft.logs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A 100 TB log archive IS a hive-partitioned directory tree
 * (`date=2024-01-01/access.log.gz`): the partition column must surface
 * through HttpdLog.read next to log_file, and a filter on it must
 * PRUNE files before the scan — reference parity with the
 * MultiFileReader's hive_partitioning option
 * (httpd_log_multi_file_info.cpp:231). */
class HivePartitionSpec extends SparkSpec {

  private def writeTree(): String = {
    val base = Files.createTempDirectory("graft_hive").toString
    def line(i: Int) =
      s"10.0.0.$i - u$i [05/Feb/2024:10:00:0${i % 10} +0000] " +
        s""""GET /p/$i HTTP/1.1" 200 ${100 + i}"""
    Seq("2024-01-01", "2024-01-02", "2024-01-03").zipWithIndex.foreach {
      case (day, d) =>
        val dir = Paths.get(base, s"date=$day")
        Files.createDirectories(dir)
        val text = (0 until 4).map(i => line(d * 10 + i)).mkString("\n")
        Files.write(dir.resolve("access.log"),
          text.getBytes(StandardCharsets.UTF_8))
    }
    base
  }

  test("partition column surfaces next to log_file and prunes the scan") {
    val base = writeTree()
    val df = HttpdLog.read(spark, base, formatType = "common")
    assert(df.columns.contains("date"), df.columns.mkString(","))
    assert(df.columns.contains("log_file"))
    assert(df.count() == 12L)
    // typed partition value (Spark's native inference) groups correctly
    val byDay = df.groupBy(col("date").cast("string").as("d"))
      .agg(count(lit(1)).as("cnt"), sum("bytes").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byDay.keySet == Set("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(byDay.values.forall(_._1 == 4L))
    // pruning: the filter must reach the file listing as a
    // PartitionFilter, and the executed scan must read ONE partition
    val one = df.filter(col("date") === lit("2024-01-02").cast("date"))
    val planStr = one.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*date".r.findFirstIn(planStr).isDefined,
      s"no partition filter in plan:\n$planStr")
    assert(one.count() == 4L)
    val files = one.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.length == 1 && files(0).contains("date=2024-01-02"))
  }

  test("partition column colliding with a parsed field takes the A2 numbering suffix") {
    val base = Files.createTempDirectory("graft_hive2").toString
    val dir = Paths.get(base, "status=a")
    Files.createDirectories(dir)
    Files.write(dir.resolve("x.log"),
      ("""10.0.0.1 - u1 [05/Feb/2024:10:00:01 +0000] "GET /p HTTP/1.1" 200 7""")
        .getBytes(StandardCharsets.UTF_8))
    val df = HttpdLog.read(spark, base, formatType = "common")
    // parsed `status` keeps the base name; the partition col is status_2
    assert(df.columns.count(_ == "status") == 1)
    assert(df.columns.contains("status_2"), df.columns.mkString(","))
    val r = df.select(col("status"), col("status_2").cast("string")).head
    assert(r.getInt(0) == 200 && r.getString(1) == "a")
  }

  test("recursive ** glob over a partitioned tree keeps the partition column") {
    val base = writeTree()
    val df = HttpdLog.read(spark, s"$base/**/*.log", formatType = "common")
    assert(df.columns.contains("date"), df.columns.mkString(","))
    assert(df.count() == 12L)
    assert(df.select(col("date").cast("string")).distinct().count() == 3L)
  }

  test("'=' in a FILENAME does not trip partition discovery (k=v must be a dir segment)") {
    // the r13 heuristic matched '=' anywhere in the path — a flat tree
    // of files named like query dumps (q=1.log) would get basePath
    // set; the fix requires a k=v DIRECTORY between base and file
    val base = Files.createTempDirectory("graft_hive3").toString
    val dir = Paths.get(base, "plain")
    Files.createDirectories(dir)
    for (i <- 0 until 2)
      Files.write(dir.resolve(s"q=$i.log"),
        (s"""10.0.0.$i - u$i [05/Feb/2024:10:00:0$i +0000] "GET /p/$i HTTP/1.1" 200 ${100 + i}""")
          .getBytes(StandardCharsets.UTF_8))
    val df = HttpdLog.read(spark, s"$base/**/*.log", formatType = "common")
    // no invented partition columns; rows parse normally
    assert(df.columns.toSet ==
      HttpdLog.read(spark, s"$base/plain", formatType = "common").columns.toSet,
      df.columns.mkString(","))
    assert(!df.columns.contains("q"))
    assert(df.count() == 2L)
  }
}

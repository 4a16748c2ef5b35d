package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

/** End-to-end read-path specs (reference: test/sql/core/basic.test,
 * auto_detect.test, parameters/raw_mode.test, compression gzip_files.test,
 * directives tests). */
class HttpdLogSpec extends SparkSpec {

  private val commonLines = Seq(
    """192.168.1.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /index.html HTTP/1.0" 200 2326""",
    """192.168.1.2 - alice [10/Oct/2000:13:56:45 -0700] "POST /api/login?next=%2Fhome HTTP/1.1" 201 150""",
    """192.168.1.3 - - [10/Oct/2000:13:57:12 -0700] "GET /img.png HTTP/1.1" 304 -""")

  private def tmpDir: Path = Files.createTempDirectory("graft_log_spec")

  private def write(p: Path, lines: Seq[String]): Path = {
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8)); p
  }

  test("default and raw schemas match the reference contract (core/schema_validation.test)") {
    import org.apache.spark.sql.types._
    val d = tmpDir
    write(d.resolve("a.log"), commonLines)
    // default (auto-detected common): 11 columns, reference names/types
    val base = HttpdLog.read(spark, d.resolve("a.log").toString)
    assert(base.schema.length == 11, base.schema.fieldNames.mkString(","))
    val names = base.schema.fieldNames.toSet
    assert(Set("client_host", "timestamp", "method", "path", "status", "bytes",
      "log_file").subsetOf(names))
    val types = base.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("timestamp") == TimestampType)
    assert(types("status") == IntegerType)
    assert(types("bytes") == LongType)
    assert(types("log_file") == StringType)
    // raw mode: +3 diagnostic columns with reference types
    val raw = HttpdLog.read(spark, d.resolve("a.log").toString, raw = true)
    assert(raw.schema.length == 14, raw.schema.fieldNames.mkString(","))
    val rawTypes = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(rawTypes("parse_error") == BooleanType)
    assert(rawTypes("raw_line") == StringType)
    assert(rawTypes("line_number") == LongType)
  }

  test("common parse: types, dash→NULL, dash bytes→0, UTC conversion (core/basic.test)") {
    val f = write(tmpDir.resolve("a.log"), commonLines)
    val df = HttpdLog.read(spark, f.toString, formatType = "common").orderBy("client_host")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("client_host") == "192.168.1.1")
    assert(rows(0).getAs[String]("ident") == null) // '-' → NULL
    assert(rows(2).getAs[String]("auth_user") == null)
    assert(rows(0).getAs[Int]("status") == 200)
    assert(rows(2).getAs[Long]("bytes") == 0L) // '-' → 0 for bytes
    // 13:55:36 -0700 → 20:55:36 UTC
    val ts = df.select(date_format(col("timestamp"), "HH:mm:ss")).orderBy("client_host").first().getString(0)
    assert(ts == "20:55:36")
  }

  test("%r decomposition: query_string keeps '?', empty → NULL (query_string.test)") {
    val f = write(tmpDir.resolve("q.log"), commonLines)
    val df = HttpdLog.read(spark, f.toString, formatType = "common").orderBy("client_host")
    val rows = df.select("method", "path", "query_string", "protocol").collect()
    assert(rows(0).toSeq == Seq("GET", "/index.html", null, "HTTP/1.0"))
    assert(rows(1).toSeq == Seq("POST", "/api/login", "?next=%2Fhome", "HTTP/1.1"))
  }

  test("%b %B are value-equivalent, first wins, one bytes column (bytes_directives.test)") {
    // each alone names the column "bytes"
    for (d <- Seq("%b", "%B")) {
      val f = LogFormat.parse(s"""%h %l %u %t "%r" %>s $d""")
      assert(f.outputColumns.count(_._1 == "bytes") == 1, d)
    }
    // both present: one bytes column, first occurrence captured
    val both = write(tmpDir.resolve("bb.log"), Seq(
      """192.168.1.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /i.html HTTP/1.0" 200 2326 99"""))
    val df = HttpdLog.read(spark, both.toString,
      formatStr = """%h %l %u %t "%r" %>s %b %B""")
    assert(df.columns.count(_ == "bytes") == 1)
    assert(df.select("bytes").first().getLong(0) == 2326L)
  }

  test("combined format_type end-to-end rows (read_httpd_log_combined.test)") {
    val lines = Seq(
      """192.168.1.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /index.html HTTP/1.0" 200 2326 "http://www.example.com/" "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"""",
      """192.168.1.3 - - [10/Oct/2000:13:57:12 -0700] "GET /images/logo.png HTTP/1.1" 304 0 "http://www.example.com/index.html" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)"""")
    val f = write(tmpDir.resolve("comb.log"), lines)
    val df = HttpdLog.read(spark, f.toString, formatType = "combined", raw = true)
      .filter(!col("parse_error")).orderBy("timestamp")
    val r = df.select("client_host", "ident", "auth_user", "status", "bytes",
      "referer", "user_agent", "method", "path", "protocol").collect()
    assert(r.length == 2)
    assert(r(0).toSeq == Seq("192.168.1.1", null, "frank", 200, 2326L,
      "http://www.example.com/", "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
      "GET", "/index.html", "HTTP/1.0"))
    assert(r(1).toSeq == Seq("192.168.1.3", null, null, 304, 0L,
      "http://www.example.com/index.html",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)",
      "GET", "/images/logo.png", "HTTP/1.1"))
    // UTC conversion as in the reference expectations (20:55:36)
    assert(df.select(date_format(col("timestamp"), "HH:mm:ss")).first().getString(0) == "20:55:36")
  }

  test("auto-detect picks combined when referer/user-agent present (auto_detect.test)") {
    val lines = commonLines.map(_ + " \"http://ref.example/\" \"Mozilla/5.0\"")
    val f = write(tmpDir.resolve("c.log"), lines)
    val df = HttpdLog.read(spark, f.toString)
    assert(df.columns.contains("referer") && df.columns.contains("user_agent"))
    assert(df.count() == 3)
  }

  test("auto-detect unknown → raw-only schema, all parse errors (auto_detect.test #5)") {
    val f = write(tmpDir.resolve("u.log"), Seq("not a log", "also not a log"))
    val df = HttpdLog.read(spark, f.toString)
    assert(df.columns.toSet == Set("log_file", "line_number", "parse_error", "raw_line"))
    assert(df.filter(col("parse_error")).count() == 2)
  }

  test("raw mode: line_number ordering, parse_error split, raw_line (raw_mode.test)") {
    val lines = commonLines.take(1) ++ Seq("garbage") ++ commonLines.drop(1)
    val f = write(tmpDir.resolve("r.log"), lines)
    val df = HttpdLog.read(spark, f.toString, formatType = "common", raw = true)
    assert(df.count() == 4)
    assert(df.filter(col("parse_error")).select("line_number").first().getLong(0) == 2L)
    assert(df.filter(!col("parse_error")).count() == 3)
    // parse-error rows: string cols empty, int cols NULL
    val err = df.filter(col("parse_error")).first()
    assert(err.getAs[String]("client_host") == "")
    assert(err.getAs[Any]("status") == null)
    assert(err.getAs[String]("raw_line") == "garbage")
    // non-raw drops error rows
    assert(HttpdLog.read(spark, f.toString, formatType = "common").count() == 3)
  }

  test("glob + gzip ingestion with per-file log_file (compression gzip_files.test)") {
    val dir = tmpDir
    write(dir.resolve("p1.log"), commonLines)
    val gz = new GZIPOutputStream(Files.newOutputStream(dir.resolve("p2.log.gz")))
    gz.write(commonLines.mkString("\n").getBytes(StandardCharsets.UTF_8)); gz.close()
    val df = HttpdLog.read(spark, dir.toString + "/*.log*", formatType = "common")
    assert(df.count() == 6)
    assert(df.select("log_file").distinct().count() == 2)
  }

  test("mixed plain+gzip+bzip2 glob: per-codec decode, attribution, auto-detect") {
    // the reference reads compressed logs via DuckDB's FS (gzip tested);
    // Spark's text source additionally ships bzip2/deflate Java codecs —
    // zstd needs the native Hadoop lib and is NOT available here, so the
    // mixed-glob evidence covers plain+gz+bz2. Caveat that matters at
    // scale: gzip/bzip2 text files are ONE input split each (no
    // parallel read within a file) — shard compressed logs upstream.
    val dir = tmpDir
    write(dir.resolve("a.log"), commonLines)
    val gz = new GZIPOutputStream(Files.newOutputStream(dir.resolve("b.log.gz")))
    gz.write(commonLines.mkString("\n").getBytes(StandardCharsets.UTF_8)); gz.close()
    // bzip2 via the Hadoop codec Spark itself uses for .bz2
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val bz = codec.createOutputStream(Files.newOutputStream(dir.resolve("c.log.bz2")))
    bz.write(commonLines.mkString("\n").getBytes(StandardCharsets.UTF_8)); bz.close()

    val df = HttpdLog.read(spark, dir.toString + "/*.log*", formatType = "common")
    assert(df.count() == 9)
    val perFile = df.groupBy("log_file").count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(perFile == Map("a.log" -> 3L, "b.log.gz" -> 3L, "c.log.bz2" -> 3L))
    // values decode identically across codecs
    assert(df.groupBy("client_host").count().collect()
      .forall(_.getLong(1) == 3L))
    // auto-detection samples through the compressed files too
    val auto = HttpdLog.read(spark, dir.toString + "/*.log*")
    assert(auto.columns.contains("client_host") && auto.count() == 9)
  }

  test("%X mapping and %D microsecond durations (connection_status/duration.test)") {
    val lines = Seq(
      """1.1.1.1 "GET /a HTTP/1.1" 1500000 X""",
      """2.2.2.2 "GET /b HTTP/1.1" - +""",
      """3.3.3.3 "GET /c HTTP/1.1" 250 -""")
    val df = HttpdLog.parseLines(
      spark.createDataFrame(lines.map(Tuple1(_))).toDF("value"),
      "%h \"%r\" %D %X").orderBy("client_host")
    val rows = df.select("connection_status", "duration").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("aborted", "keepalive", "close"))
    assert(rows(1).get(1) == null) // '-' duration → NULL
    val us = df.select(col("duration").cast("long")).collect().map(r => Option(r.get(0)))
    assert(us(0).contains(1L)) // cast interval→long yields whole seconds
  }

  test("epoch + fraction %t group combine (timestamp_format.test)") {
    val df = HttpdLog.parseLines(
      spark.createDataFrame(Seq(Tuple1("h 1700000000 123 200"))).toDF("value"),
      "%h %{sec}t %{msec_frac}t %>s")
    val s = df.select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSS")).first().getString(0)
    assert(s == "2023-11-14 22:13:20.123")
  }

  test("strftime %t with embedded spaces parses to timestamp") {
    val df = HttpdLog.parseLines(
      spark.createDataFrame(Seq(Tuple1("h 2024-03-01 10:20:30 200"))).toDF("value"),
      "%h %{%Y-%m-%d %H:%M:%S}t %>s")
    assert(df.select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")).first().getString(0)
      == "2024-03-01 10:20:30")
  }

  test("conf nickname integration (read_httpd_conf_integration.test)") {
    val dir = tmpDir
    Files.write(dir.resolve("httpd.conf"),
      "LogFormat \"%h %t \\\"%r\\\" %>s %b\" mini\n".getBytes(StandardCharsets.UTF_8))
    write(dir.resolve("m.log"), Seq("""9.9.9.9 [01/Jan/2024:00:00:00 +0000] "GET /z HTTP/1.1" 200 42"""))
    val df = HttpdLog.read(spark, dir.resolve("m.log").toString,
      formatType = "mini", conf = dir.resolve("httpd.conf").toString)
    assert(df.select("bytes").first().getLong(0) == 42L)
    // unknown nickname → error
    val e = intercept[IllegalArgumentException] {
      HttpdLog.read(spark, dir.resolve("m.log").toString,
        formatType = "nope", conf = dir.resolve("httpd.conf").toString)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("conf without format_type auto-selects the first fitting format (reference docs)") {
    val dir = tmpDir
    // two named formats; only the second matches the log lines
    Files.write(dir.resolve("auto.conf"),
      ("LogFormat \"%h %l %u %t \\\"%r\\\" %>s %b \\\"%{Referer}i\\\" \\\"%{User-agent}i\\\"\" combined\n" +
        "LogFormat \"%h %t \\\"%r\\\" %>s %b\" mini\n").getBytes(StandardCharsets.UTF_8))
    write(dir.resolve("auto.log"), Seq(
      """7.7.7.7 [02/Jan/2024:00:00:00 +0000] "GET /a HTTP/1.1" 200 5""",
      """8.8.8.8 [02/Jan/2024:00:01:00 +0000] "GET /b HTTP/1.1" 404 7"""))
    val df = HttpdLog.read(spark, dir.resolve("auto.log").toString,
      conf = dir.resolve("auto.conf").toString)
    assert(df.columns.contains("bytes") && !df.columns.contains("referer"))
    assert(df.count() == 2)
    // conf whose formats all mismatch → error (reference parity)
    Files.write(dir.resolve("bad.conf"),
      "LogFormat \"%h %l %u %t \\\"%r\\\" %>s %b\" common\n".getBytes(StandardCharsets.UTF_8))
    write(dir.resolve("bad.log"), Seq("not an apache log line at all"))
    val e = intercept[IllegalArgumentException] {
      HttpdLog.read(spark, dir.resolve("bad.log").toString,
        conf = dir.resolve("bad.conf").toString)
    }
    assert(e.getMessage.toLowerCase.contains("no matching format"))
  }

  test("begin/end %t groups → timestamp_original + timestamp at runtime") {
    val df = HttpdLog.parseLines(
      spark.createDataFrame(Seq(Tuple1("h 100 200 201"))).toDF("value"),
      "%h %{begin:sec}t %{end:sec}t %>s")
    val r = df.select(
      date_format(col("timestamp_original"), "HH:mm:ss"),
      date_format(col("timestamp"), "HH:mm:ss"),
      col("status")).first()
    assert(r.toSeq == Seq("00:01:40", "00:03:20", 201))
  }

  test("%s alone keeps base column name 'status' (duplicate_directives.test)") {
    val df = HttpdLog.parseLines(
      spark.createDataFrame(Seq(Tuple1("h 404"))).toDF("value"), "%h %s")
    assert(df.columns.contains("status"))
    assert(df.select("status").first().getInt(0) == 404)
  }

  test("empty file → unknown format, zero rows (DetectFormat empty sample)") {
    val f = write(tmpDir.resolve("empty.log"), Seq(""))
    val df = HttpdLog.read(spark, f.toString)
    assert(df.columns.toSet == Set("log_file", "line_number", "parse_error", "raw_line"))
    assert(df.count() == 0) // the lone empty line is skipped
  }

  test("multi-file auto-detect samples past an empty first file (auto_detect.test #8)") {
    val dir = tmpDir
    write(dir.resolve("a_empty.log"), Seq(""))
    write(dir.resolve("b_data.log"), commonLines)
    val df = HttpdLog.read(spark, dir.toString + "/*.log")
    assert(df.columns.contains("client_host")) // detected common, not unknown
    assert(df.count() == 3)
  }

  test("? single-char glob and nonexistent-path error (multi_file glob_patterns.test)") {
    val dir = tmpDir
    write(dir.resolve("server1.log"), commonLines.take(1))
    write(dir.resolve("server2.log"), commonLines.take(2))
    write(dir.resolve("server10.log"), commonLines)
    val df = HttpdLog.read(spark, dir.toString + "/server?.log", formatType = "common")
    assert(df.count() == 3) // server1 + server2, not server10
    intercept[Exception] {
      HttpdLog.read(spark, dir.toString + "/nope*.log", formatType = "common").count()
    }
  }

  test("** recursive glob descends subdirectories (glob_patterns.test)") {
    val dir = tmpDir
    Files.createDirectories(dir.resolve("a/b"))
    write(dir.resolve("a/top.log"), commonLines.take(1))
    write(dir.resolve("a/b/deep.log"), commonLines.take(2))
    write(dir.resolve("a/b/skip.txt"), commonLines)
    val df = HttpdLog.read(spark, dir.toString + "/**/*.log", formatType = "common")
    assert(df.count() == 3) // 1 + 2; .txt excluded
    assert(df.select("log_file").distinct().count() == 2)
    // raw mode takes the same recursive path
    val raw = HttpdLog.read(spark, dir.toString + "/**/*.log", formatType = "common", raw = true)
    assert(raw.count() == 3)
  }

  test("** glob keeps directory components after the ** (multi-level patterns)") {
    val dir = tmpDir
    Files.createDirectories(dir.resolve("a/sub"))
    Files.createDirectories(dir.resolve("b/sub"))
    Files.createDirectories(dir.resolve("c/other"))
    write(dir.resolve("a/sub/x.log"), commonLines.take(1))
    write(dir.resolve("b/sub/x.log"), commonLines.take(2))
    write(dir.resolve("c/other/x.log"), commonLines) // dir component differs → excluded
    write(dir.resolve("x.log"), commonLines)         // no sub/ component → excluded
    val df = HttpdLog.read(spark, dir.toString + "/**/sub/*.log", formatType = "common")
    assert(df.count() == 3, "only */sub/*.log files")
    assert(df.select("log_file").distinct().count() == 2)
    // ** matches zero directories too (DuckDB glob semantics)
    val all = HttpdLog.read(spark, dir.toString + "/**/x.log", formatType = "common")
    assert(all.select("log_file").distinct().count() == 4)
  }

  test("typed header conversion: Content-Length BIGINT, '-' → NULL (typed_headers.test)") {
    val df = HttpdLog.parseLines(
      spark.createDataFrame(Seq(
        Tuple1("""1.1.1.1 "1024" 200"""),
        Tuple1("""2.2.2.2 "-" 200"""))).toDF("value"),
      "%h \"%{Content-Length}i\" %>s").orderBy("client_host")
    val rows = df.select("content_length").collect()
    assert(rows(0).getLong(0) == 1024L)
    assert(rows(1).get(0) == null)
  }

  test("status-condition directives end-to-end (directives/status_condition.test)") {
    // the reference's status_condition.log verbatim: Apache wrote "-"
    // where the %400,501{...}i condition suppressed the value, so the
    // conditional column parses like any header with dash→NULL
    val lines = Seq(
      "192.168.1.1 [10/Oct/2000:13:55:36 -0700] 200 Mozilla/5.0 http://example.com/",
      "192.168.1.2 [10/Oct/2000:13:56:00 -0700] 404 - -",
      "192.168.1.3 [10/Oct/2000:13:57:00 -0700] 500 curl/7.68.0 -")
    def parse(fmt: String) = HttpdLog.parseLines(
      spark.createDataFrame(lines.map(Tuple1(_))).toDF("value"), fmt)
    // column naming: conditions (incl. negated / multi-code) are skipped
    for (fmt <- Seq(
        "%h %t %>s %400,501{User-Agent}i %{Referer}i",
        "%h %t %>s %{User-Agent}i %!200,304{Referer}i",
        "%h %t %>s %200{User-Agent}i %{Referer}i",
        "%h %t %>s %!500{User-Agent}i %{Referer}i")) {
      val cols = parse(fmt).columns
      assert(cols.contains("user_agent") && cols.contains("referer"), fmt)
    }
    // data extraction: "-" → NULL (reference tests 5-7)
    val df = parse("%h %t %>s %{User-Agent}i %{Referer}i").orderBy("client_host")
    val got = df.select("user_agent", "referer").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(
      ("Mozilla/5.0", "http://example.com/"), (null, null), ("curl/7.68.0", null)))
    assert(df.filter(col("referer").isNull).count() == 2)
  }
}

package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ErrorLogSpec extends SparkSpec {
  import spark.implicits._

  private val fullFmt = "[%t] [%m:%l] [pid %P:tid %T] [client %a] %M"

  test("full directive line parses with typed columns") {
    val line = "[Thu May 12 08:28:57.652118 2011] [core:error] [pid 8777:tid 42] [client 10.0.0.7] AH00124: Request exceeded limits"
    val df = ErrorLog.parseLines(Seq(line).toDF("value"), fullFmt)
    assert(df.schema.map(f => f.name -> f.dataType) == Seq(
      "ts" -> TimestampType, "module" -> StringType, "loglevel" -> StringType,
      "pid" -> LongType, "tid" -> LongType, "client" -> StringType,
      "message" -> StringType))
    val r = df.collect()(0)
    assert(r.getAs[String]("module") == "core")
    assert(r.getAs[String]("loglevel") == "error")
    assert(r.getAs[Long]("pid") == 8777L)
    assert(r.getAs[Long]("tid") == 42L)
    assert(r.getAs[String]("client") == "10.0.0.7")
    assert(r.getAs[String]("message") == "AH00124: Request exceeded limits")
    val ts = df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].collect()(0)
    assert(ts == "2011-05-12 08:28:57.652118")
  }

  test("timestamp without fraction and with space-padded day") {
    val lines = Seq(
      "[Thu May 12 08:28:57 2011] [warn] plain seconds",
      "[Fri Jun  3 01:02:03 2011] [info] space padded day")
    val df = ErrorLog.parseLines(lines.toDF("value"), "[%t] [%l] %M")
    val got = df.select($"loglevel", date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[(String, String)].collect().toMap
    assert(got("warn") == "2011-05-12 08:28:57.000000")
    assert(got("info") == "2011-06-03 01:02:03.000000")
  }

  test("compact ISO %{cu}t parses directly") {
    val df = ErrorLog.parseLines(
      Seq("2011-05-12 08:28:57.123456 [notice] compact").toDF("value"),
      "%{cu}t [%l] %M")
    val ts = df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].collect()(0)
    assert(ts == "2011-05-12 08:28:57.123456")
  }

  test("non-raw drops garbage; raw keeps it with parse_error") {
    val lines = Seq(
      "[Thu May 12 08:28:57 2011] [error] real line",
      "total garbage")
    assert(ErrorLog.parseLines(lines.toDF("value"), "[%t] [%l] %M").count() == 1)
    val raw = ErrorLog.parseLines(lines.toDF("value"), "[%t] [%l] %M", raw = true)
    assert(raw.count() == 2)
    val bad = raw.filter($"parse_error").collect()(0)
    assert(bad.getAs[String]("raw_line") == "total garbage")
    assert(bad.isNullAt(bad.fieldIndex("loglevel")))
  }

  test("repeated directives get collision suffixes") {
    val df = ErrorLog.parseLines(
      Seq("a.example.com b.example.com msg").toDF("value"), "%v %V %M")
    assert(df.columns.toSeq == Seq("server_name", "server_name_2", "message"))
    val r = df.collect()(0)
    assert(r.getAs[String]("server_name") == "a.example.com")
    assert(r.getAs[String]("server_name_2") == "b.example.com")
  }

  test("formatFromConf picks the first error directive; read() uses it") {
    val tmp = java.nio.file.Files.createTempDirectory("errlog")
    val conf = tmp.resolve("httpd.conf")
    java.nio.file.Files.write(conf,
      ("LogFormat \"%h %l %u %t \\\"%r\\\" %>s %b\" common\n" +
        "ErrorLogFormat \"[%t] [%l] %M\"\n").getBytes("UTF-8"))
    assert(ErrorLog.formatFromConf(spark, conf.toString).contains("[%t] [%l] %M"))
    val log = tmp.resolve("error.log")
    java.nio.file.Files.write(log,
      ("[Thu May 12 08:28:57 2011] [error] boom\n" +
        "[Thu May 12 08:28:58 2011] [warn] careful\n").getBytes("UTF-8"))
    val df = ErrorLog.read(spark, log.toString, conf = conf.toString)
    assert(df.orderBy("ts").select("loglevel").as[String].collect().toSeq ==
      Seq("error", "warn"))
  }

  test("unsupported directive throws") {
    intercept[IllegalArgumentException] {
      ErrorLog.compile("%q")
    }
  }
}

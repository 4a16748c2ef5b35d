package graft.sql

import graft.SparkSpec

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** SQL-surface parity specs: the reference's `read_httpd_log` /
 * `read_httpd_conf` SQL calls work verbatim (reference:
 * test/sql/read_httpd_log.test, read_httpd_conf.test). */
class GraftSqlSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_sql_spec")
    Files.write(d.resolve("a.log"),
      ("""1.1.1.1 - u1 [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 10""" + "\n" +
        """2.2.2.2 - u2 [10/Oct/2000:13:56:00 -0700] "GET /y HTTP/1.0" 404 20""")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("httpd.conf"),
      "LogFormat \"%h %l %u %t \\\"%r\\\" %>s %b\" common\n".getBytes(StandardCharsets.UTF_8))
    GraftSql.register(spark)
    d
  }

  test("SELECT FROM read_httpd_log with format_type") {
    val rows = spark.sql(
      s"SELECT client_host, status, bytes FROM read_httpd_log('${dir.resolve("a.log")}', 'common') ORDER BY client_host")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).toSeq == Seq("1.1.1.1", 200, 10L))
  }

  test("read_httpd_log auto-detect and aggregation in SQL") {
    val n = spark.sql(
      s"SELECT count(*) FROM read_httpd_log('${dir.resolve("a.log")}') WHERE status = 404")
      .first().getLong(0)
    assert(n == 1L)
  }

  test("read_httpd_log raw mode via 4th argument") {
    val cols = spark.sql(
      s"SELECT * FROM read_httpd_log('${dir.resolve("a.log")}', 'common', '', true)").columns
    assert(cols.contains("parse_error") && cols.contains("raw_line"))
  }

  test("read_httpd_log named arguments: raw => true, format_type => 'common'") {
    val cols = spark.sql(
      s"SELECT * FROM read_httpd_log('${dir.resolve("a.log")}', raw => true, format_type => 'common')").columns
    assert(cols.contains("parse_error") && cols.contains("line_number"))
    val n = spark.sql(
      s"SELECT count(*) FROM read_httpd_log('${dir.resolve("a.log")}', format_type => 'common')")
      .first().getLong(0)
    assert(n == 2L)
  }

  test("read_httpd_log named argument conf => with nickname format_type") {
    val n = spark.sql(
      s"SELECT count(*) FROM read_httpd_log('${dir.resolve("a.log")}', " +
        s"conf => '${dir.resolve("httpd.conf")}', format_type => 'common') WHERE bytes > 0")
      .first().getLong(0)
    assert(n == 2L)
  }

  test("read_httpd_log rejects unknown named arguments") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM read_httpd_log('${dir.resolve("a.log")}', bogus => 1)").collect()
    }
    assert(e.getMessage.contains("unknown argument") || e.getMessage.contains("bogus"))
  }

  test("read_error_log in SQL: positional, named conf, and raw mode") {
    Files.write(dir.resolve("error.log"),
      ("[Thu May 12 08:28:57.652118 2011] [core:error] [pid 8777:tid 1] [client 10.0.0.7] AH00124: boom\n" +
        "[Thu May 12 08:28:58 2011] [mpm_event:notice] [pid 12:tid 2] [client 10.0.0.8] AH00489: up\n" +
        "garbage\n").getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("err.conf"),
      "ErrorLogFormat \"[%t] [%m:%l] [pid %P:tid %T] [client %a] %M\"\n"
        .getBytes(StandardCharsets.UTF_8))
    val fmt = "[%t] [%m:%l] [pid %P:tid %T] [client %a] %M"
    val rows = spark.sql(
      s"SELECT module, loglevel, pid FROM read_error_log('${dir.resolve("error.log")}', '$fmt') ORDER BY pid")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).toSeq == Seq("mpm_event", "notice", 12L))
    val viaConf = spark.sql(
      s"SELECT count(*) FROM read_error_log('${dir.resolve("error.log")}', conf => '${dir.resolve("err.conf")}')")
      .first().getLong(0)
    assert(viaConf == 2L)
    val raw = spark.sql(
      s"SELECT count(*) FROM read_error_log('${dir.resolve("error.log")}', conf => '${dir.resolve("err.conf")}', raw => true) WHERE parse_error")
      .first().getLong(0)
    assert(raw == 1L)
  }

  test("read_httpd_conf extraction in SQL") {
    val r = spark.sql(
      s"SELECT format_type, nickname FROM read_httpd_conf('${dir.resolve("httpd.conf")}')")
      .first()
    assert(r.getString(0) == "named" && r.getString(1) == "common")
  }

  test("snapshot_read TVF: latest, pinned version, logical chain, verify") {
    import spark.implicits._
    dir // force registration
    val base = Files.createTempDirectory("graft_sql_snap").toString + "/s"
    graft.sources.Snapshots.publish(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), base)
    graft.sources.Snapshots.publishDelta(Seq((3L, "c")).toDF("id", "s"), base)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_read('$base')")
      .head().getLong(0) == 1L) // latest version alone = the delta
    assert(spark.sql(s"SELECT count(*) FROM snapshot_read('$base', 1)")
      .head().getLong(0) == 2L) // time travel
    val chain = spark.sql(
      s"SELECT id FROM snapshot_read('$base', logical => true, " +
        "verify => true) ORDER BY id").collect().map(_.getLong(0))
    assert(chain.toSeq == Seq(1L, 2L, 3L))
    // absent/unpublished version fails loudly through SQL too
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_read('$base', 9)").collect()
    }
    assert(e.getMessage.contains("absent or unpublished"))
  }

  test("warc_read TVF: members read back with the framer's schema") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    dir // force registration
    val out = Files.createTempDirectory("graft_sql_warc").toString
    val wet = Seq(("http://x/1", "alpha"), ("http://x/2", "beta"))
      .toDF("uri", "text")
      .select(graft.sources.Warc.wetRecord(col("uri"),
        lit(null).cast("string"), lit("2026-01-01T00:00:00Z"),
        col("text")).as("rec"))
    graft.sources.Warc.writeMembers(wet, "rec", out, "wet")
    val rows = spark.sql(
      s"SELECT target_uri, payload FROM warc_read('$out') " +
        "WHERE warc_type = 'conversion' ORDER BY target_uri").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("http://x/1", "alpha"), ("http://x/2", "beta")))
  }

  test("warc_read(hydrate => true) restores revisit payloads in pure SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    dir // force registration
    val out = Files.createTempDirectory("graft_sql_hyd").toString
    val fetches = Seq(
      ("http://x/1", "<urn:uuid:a>", "shared bytes", 1L),
      ("http://x/1b", "<urn:uuid:b>", "shared bytes", 2L))
      .toDF("url", "rid", "t", "ord")
      .select(col("url"), col("rid"), lit("2026-01-01T00:00:00Z").as("dt"),
        lit(200).as("st"), lit("text/plain").as("mi"),
        col("t").cast("binary").as("pl"), col("ord"))
    val recs = graft.sources.Warc.dedupArchive(fetches, "url", "rid", "dt",
      "st", "mi", "pl", "ord")
    graft.sources.Warc.writeMembers(recs.select(col("rec")), "rec", out, "arc")
    // without hydrate the revisit payload is empty; with it, restored
    val bare = spark.sql(s"SELECT payload FROM warc_read('$out') " +
      "WHERE warc_type = 'revisit'").collect()
    assert(bare.head.getString(0) == "")
    val hyd = spark.sql(
      s"SELECT target_uri, payload, hydrated, digest_ok " +
        s"FROM warc_read('$out', hydrate => true) ORDER BY target_uri")
      .collect()
    assert(hyd.length == 2)
    assert(hyd.forall(_.getString(1) == "shared bytes"))
    val rv = hyd.find(_.getString(0) == "http://x/1b").get
    assert(rv.getBoolean(2) && rv.getBoolean(3))
  }

  test("warc_read(version => N) reads a published archive tree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    dir // force registration
    val base = Files.createTempDirectory("graft_sql_warcv").toString + "/arc"
    val wet = Seq(("http://x/1", "alpha")).toDF("uri", "text")
      .select(graft.sources.Warc.wetRecord(col("uri"),
        lit(null).cast("string"), lit("2026-01-01T00:00:00Z"),
        col("text")).as("rec"))
    val v1 = graft.sources.Warc.publishArchive(wet, "rec", base, "wet", 1L)
    assert(v1 == 1L)
    // latest (-1) and pinned both read; an absent version fails loudly
    assert(spark.sql(s"SELECT * FROM warc_read('$base', version => -1)")
      .count() == 1)
    assert(spark.sql(s"SELECT * FROM warc_read('$base', version => 1)")
      .count() == 1)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM warc_read('$base', version => 7)").collect()
    }
    assert(e.getMessage.contains("absent or unpublished"))
  }

  test("non-literal path argument is rejected") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM read_httpd_log(concat(rand(), 'x'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") || e.getMessage.contains("foldable"))
  }

  test("scalar SQL functions match the Column API bit-for-bit") {
    import graft.functions.{MinHashSig, SimHash64, TextFunctions => TF}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq(
      "the quick brown fox jumps over the lazy dog",
      "der hund und die katze sind nicht da",
      "contact me at a@b.com or 10.0.0.1").toDF("text")
    d.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT lang_id(text) AS l, token_count(text) AS tc,
        |  fingerprint_md5(text) AS fp, hash_split(text) AS sp,
        |  redact_pii(text) AS red, simhash64(split(trim(text), '\\s+')) AS sh,
        |  minhash_sig(split(trim(text), '\\s+'), 3, 8) AS mh,
        |  word_shingles(split(trim(text), '\\s+'), 3) AS ws
        |FROM sqlfn_docs""".stripMargin).collect()
    val viaCol = d.select(
      TF.langId($"text").as("l"), TF.tokenCount($"text").as("tc"),
      TF.fingerprintMd5($"text").as("fp"), TF.hashSplit($"text").as("sp"),
      TF.redactPii($"text").as("red"), SimHash64(TF.tokens($"text")).as("sh"),
      MinHashSig(TF.tokens($"text"), 3, 8).as("mh"),
      TF.shingles($"text", 3).as("ws")).collect()
    viaSql.zip(viaCol).foreach { case (a, b) => assert(a == b) }
  }

  test("fix_mojibake SQL name matches the Column API and repairs in pure SQL") {
    import graft.functions.EncodingQa
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq("clean ascii", "bad " + EncodingQa.MojiSample,
      "tombstone � stays").toDF("text")
    d.createOrReplaceTempView("moji_docs")
    val viaSql = spark.sql("SELECT fix_mojibake(text) AS f FROM moji_docs")
      .collect().map(_.getString(0)).toSeq
    val viaCol = d.select(EncodingQa.fixMojibake($"text").as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol)
    assert(viaSql(1) == "bad " + EncodingQa.CleanSample)
    assert(viaSql(0) == "clean ascii" && viaSql(2) == "tombstone � stays")
  }

  test("html_extract SQL name matches the Column API and extracts in pure SQL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq(
      "<body><nav><a href='/'>x</a></nav><p>body &amp; the soul</p></body>",
      "<p>plain</p>").toDF("html")
    d.createOrReplaceTempView("html_docs")
    val viaSql = spark.sql(
      "SELECT html_extract(html).text AS t, html_extract(html).main_text AS m FROM html_docs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val viaCol = d.select(
        graft.functions.HtmlExtract($"html").as("e"))
      .select($"e.text", $"e.main_text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(viaSql == viaCol)
    // the stopword-density gate drops short stopword-free "plain";
    // "body & the soul" passes on 1-in-4 stopwords
    assert(viaSql == Seq(("x\nbody & the soul", "body & the soul"), ("plain", "")))
  }

  test("warc_records and robots_eval SQL names work in pure SQL") {
    import spark.implicits._
    val seg = "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n"
    Seq(Tuple1(seg.getBytes("UTF-8"))).toDF("w").createOrReplaceTempView("warc_docs")
    val r = spark.sql(
      "SELECT warc_records(w)[0].warc_type AS t, warc_records(w)[0].payload AS p FROM warc_docs")
      .head()
    assert(r.getString(0) == "metadata" && r.getString(1) == "body")
    val a = spark.sql(
      "SELECT robots_eval('User-agent: *\nDisallow: /x\n', '/x/1', 'bot').allowed AS ok")
      .head().getBoolean(0)
    assert(!a)
    val err = intercept[Exception](spark.sql(
      "SELECT robots_eval('x', '/p', NULL) FROM warc_docs").collect())
    assert(err.getMessage.contains("agent"))
  }

  test("decode_payload SQL name matches the Column API (C111d)") {
    import spark.implicits._
    Seq(Tuple1("café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
      .toDF("b").createOrReplaceTempView("payload_docs")
    val r = spark.sql(
      """SELECT decode_payload(b, 'text/html; charset=iso-8859-1') AS ok,
        |  decode_payload(b, 'text/html') AS bad FROM payload_docs""".stripMargin)
      .head()
    assert(r.getString(0) == "café" && r.getString(1) == "caf�")
  }

  test("cdc_chunks and int8_quant_stats SQL names match the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq((1 to 60).map(i => s"t${i % 11}v$i").mkString(" ")).toDF("text")
    d.createOrReplaceTempView("sqlfn_cdc")
    val viaSql = spark.sql(
      """SELECT cdc_chunks(split(trim(text), '\\s+'), 4, 8) AS ch,
        |  int8_quant_stats(array(1000L, -500L, 7L)) AS st
        |FROM sqlfn_cdc""".stripMargin).collect()
    val viaCol = d.select(
      graft.functions.CdcChunks(
        graft.functions.TextFunctions.tokens($"text"), 4, 8).as("ch"),
      graft.functions.Int8QuantStats(
        array(lit(1000L), lit(-500L), lit(7L))).as("st")).collect()
    viaSql.zip(viaCol).foreach { case (a, b) => assert(a == b) }
    assert(viaSql.head.getSeq[String](0).nonEmpty)
  }

  test("scalar SQL functions validate arity and literal arguments") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT minhash_sig(split('a b', ' '))").collect()
    }
    assert(e1.getMessage.contains("minhash_sig"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT word_shingles(split('a b', ' '), cast(rand()*3 AS INT))").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }
}

package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-line-per-directive runtime round trips for the long tail of the
 * reference's directive tests (reference: test/sql/directives —
 * cookie_env_note.test, logio.test, ip_address_directives.test,
 * port.test, process_thread.test, filename_logid.test, handler.test). */
class DirectiveZooSpec extends SparkSpec {

  private def one(line: String, fmt: String) =
    HttpdLog.parseLines(spark.createDataFrame(Seq(Tuple1(line))).toDF("value"), fmt)

  test("cookies, env vars, notes, trailers (cookie_env_note.test)") {
    val df = one(
      "SESS42 /home/u dev note-x tin tout",
      "%{SESSION}C %{HOME}e %{ENV}e %{outcome}n %{X-T}^ti %{X-T}^to")
    val r = df.first()
    // collision: first colliding directive keeps the base name
    // (column_collision.test Test 6 semantics), second gets its suffix
    assert(df.columns.take(6).toSeq ==
      Seq("session", "home", "env", "outcome", "x_t", "x_t_trail_out"))
    assert(r.getString(0) == "SESS42" && r.getString(3) == "note-x")
    assert(r.getString(4) == "tin" && r.getString(5) == "tout")
  }

  test("log IO bytes: %I %O %S with dash→0 (logio.test)") {
    val df = one("1024 - 4096", "%I %O %S")
    val r = df.select("bytes_received", "bytes_sent", "bytes_transferred").first()
    assert(r.toSeq == Seq(1024L, 0L, 4096L))
  }

  test("ip directives: %a %{c}a %A and %h %{c}h (ip_address_directives.test)") {
    val df = one("9.9.9.9 8.8.8.8 127.0.0.1 host.example peer.example",
      "%a %{c}a %A %h %{c}h")
    assert(df.columns.take(5).toSeq ==
      Seq("remote_ip", "peer_ip", "local_ip", "client_host", "peer_host"))
    assert(df.first().getString(1) == "8.8.8.8")
  }

  test("ports and process/thread ids (port.test, process_thread.test)") {
    val df = one("443 8443 50123 314 99 feed",
      "%p %{local}p %{remote}p %P %{tid}P %{hextid}P")
    val r = df.select("server_port", "local_port", "remote_port",
      "process_id", "thread_id", "thread_id_hex").first()
    assert(r.toSeq == Seq(443, 8443, 50123, 314, 99L, "feed"))
  }

  test("filename, handler, log id, keepalive, vhost (filename_logid.test, handler.test)") {
    val df = one("/srv/www/x.html proxy-server abc123 5 vhost.example canonical.example",
      "%f %R %L %k %v %V")
    val r = df.select("filename", "handler", "request_log_id", "keepalive_count",
      "server_name", "server_name_used").first()
    assert(r.toSeq == Seq("/srv/www/x.html", "proxy-server", "abc123", 5,
      "vhost.example", "canonical.example"))
  }

  test("quoted dynamic headers with spaces in values") {
    val df = one("\"Mozilla/5.0 (X11; Linux)\" \"gzip, deflate\" 200",
      "\"%{User-agent}i\" \"%{Accept-Encoding}i\" %>s")
    val r = df.select("user_agent", "accept_encoding", "status").first()
    assert(r.toSeq == Seq("Mozilla/5.0 (X11; Linux)", "gzip, deflate", 200))
  }
}

package graft.logs

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Format-model specs mirroring the reference's parser tests
 * (reference: test/sql/directives tests, column_collision.test). */
class LogFormatSpec extends AnyFunSuite {

  test("common format: fields, schema, %r decomposition (core/basic.test)") {
    val f = LogFormat.parse(LogFormat.Common)
    assert(f.outputColumns.map(_._1) == Vector(
      "client_host", "ident", "auth_user", "timestamp",
      "method", "path", "query_string", "protocol", "status", "bytes"))
    assert(f.outputColumns.toMap.apply("status") == IntegerType)
    assert(f.outputColumns.toMap.apply("bytes") == LongType)
    assert(f.outputColumns.toMap.apply("timestamp") == TimestampType)
  }

  test("combined format adds lowercased, dash-mangled header columns") {
    val f = LogFormat.parse(LogFormat.Combined)
    assert(f.outputColumns.map(_._1).takeRight(2) == Vector("referer", "user_agent"))
  }

  test("%m/%U/%q/%H override %r sub-columns (directives/original_final.test)") {
    val f = LogFormat.parse("%r %m %U")
    val names = f.outputColumns.map(_._1)
    // %r keeps only the sub-columns not individually present
    assert(names == Vector("query_string", "protocol", "method", "path"))
  }

  test("status collision: %s gets _original, %>s keeps base (column_collision.test)") {
    val f = LogFormat.parse("%s %>s")
    assert(f.fields.map(_.columnName) == Vector("status_original", "status"))
  }

  test("duplicate headers number from _2 (column_collision.test)") {
    // first %i keeps the base name (column_collision.test Test 6)
    val f = LogFormat.parse("%{X-Test}i %{X-Test}i %{X-Test}o")
    assert(f.fields.map(_.columnName) == Vector("x_test", "x_test_in", "x_test_out"))
    val dup = LogFormat.parse("%{X-C}i %{X-C}i %{X-C}i")
    assert(dup.fields.map(_.columnName) == Vector("x_c", "x_c_2", "x_c_3"))
  }

  test("header vs env vs note collision suffixes (column_collision.test)") {
    val f = LogFormat.parse("%{foo}i %{foo}o %{foo}e %{foo}n")
    assert(f.fields.map(_.columnName) == Vector("foo", "foo_out", "foo_env", "foo_note"))
  }

  test("duration precision: %D beats %{ms}T beats %T (format_parser.cpp:194)") {
    val f = LogFormat.parse("%T %{ms}T %D")
    val kept = f.fields.filter(!_.skip)
    assert(kept.map(_.directive) == Vector("%D"))
    val f2 = LogFormat.parse("%{s}T %T")
    assert(f2.fields.filter(!_.skip).map(_.directive) == Vector("%T"))
  }

  test("typed headers: Content-Length BIGINT on %i (typed_headers.test)") {
    val f = LogFormat.parse("%{Content-Length}i %{Age}o %{Content-Length}o")
    assert(f.fields(0).dataType == LongType)
    assert(f.fields(1).dataType == IntegerType)
    assert(f.fields(2).dataType == LongType)
  }

  test("consecutive %t group into a single timestamp column (timestamp_format.test)") {
    val f = LogFormat.parse("%h %{sec}t %{msec_frac}t %>s")
    assert(f.tsGroups.size == 1)
    assert(f.tsGroups.head.fieldIdx.size == 2)
    assert(f.outputColumns.count(_._1 == "timestamp") == 1)
  }

  test("begin/end %t split into timestamp_original + timestamp") {
    val f = LogFormat.parse("%{begin:sec}t %{end:sec}t")
    assert(f.outputColumns.map(_._1) == Vector("timestamp_original", "timestamp"))
  }

  test("%% is a literal percent, not a field (format_parser.cpp escape)") {
    val f = LogFormat.parse("%h %% %>s")
    assert(f.fields.map(_.directive) == Vector("%h", "%>s"))
    assert(f.lineRegex == "^(\\S+)\\s+%\\s+(\\S+)")
  }

  test("status-code conditions are skipped: %400,501{User-agent}i parses to header") {
    val f = LogFormat.parse("%400,501{Referer}i %!200U")
    assert(f.fields.map(_.columnName) == Vector("referer", "path"))
  }

  test("%p port variants and %P pid variants") {
    assert(LogFormat.parse("%p %{local}p %{remote}p").fields.map(_.columnName) ==
      Vector("server_port", "local_port", "remote_port"))
    assert(LogFormat.parse("%P %{tid}P").fields.map(_.columnName) ==
      Vector("process_id", "thread_id"))
  }

  test("raw schema appends line_number/parse_error/raw_line (raw_mode.test)") {
    val f = LogFormat.parse(LogFormat.Common)
    val raw = f.schema(raw = true).fieldNames.toVector
    assert(raw.takeRight(4) == Vector("log_file", "line_number", "parse_error", "raw_line"))
    assert(f.schema(raw = false).fieldNames.last == "log_file")
  }
}

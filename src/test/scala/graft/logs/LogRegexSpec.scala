package graft.logs

import org.scalatest.funsuite.AnyFunSuite

/** Regex-generation specs (reference: src/httpd_log_format_parser.cpp:104-210,
 * test/sql/directives/timestamp_strftime.test). */
class LogRegexSpec extends AnyFunSuite {

  test("strftime fragments: %Y-%m-%d %H:%M:%S") {
    assert(LogRegex.strftimeToRegex("%Y-%m-%d %H:%M:%S") ==
      "\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}")
  }

  test("strftime literal brackets are escaped (StrftimeToRegex escapes [ ])") {
    assert(LogRegex.strftimeToRegex("[%d/%b/%Y]") == "\\[\\d{2}/[A-Za-z]{3}/\\d{4}\\]")
  }

  test("strftime %z timezone and %e day-of-month") {
    assert(LogRegex.strftimeToRegex("%e %z") == "[\\s\\d]\\d [+-]\\d{4}")
  }

  test("line pattern: common format full shape") {
    val f = LogFormat.parse(LogFormat.Common)
    assert(f.lineRegex ==
      "^(\\S+)\\s+(\\S+)\\s+(\\S+)\\s+\\[([^\\]]+)\\]\\s+\"([^\"]*)\"\\s+(\\S+)\\s+(\\S+)")
    val m = java.util.regex.Pattern.compile(f.lineRegex)
      .matcher("""1.2.3.4 - bob [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 200 -""")
    assert(m.matches() && m.groupCount() == 7)
  }

  test("quoted fields match [^\"]* (quotes in format_parser.cpp:575)") {
    val f = LogFormat.parse("\"%{User-agent}i\" %>s")
    assert(f.lineRegex == "^\"([^\"]*)\"\\s+(\\S+)")
  }

  test("skipped fields become non-capturing groups") {
    val f = LogFormat.parse("%T %D") // %T loses the duration collision
    assert(f.lineRegex == "^(?:\\S+)\\s+(\\S+)")
    assert(f.captureGroupOf == Vector(-1, 1))
  }

  test("strftime → Java pattern for to_timestamp") {
    assert(LogRegex.strftimeToJavaPattern("%Y-%m-%d %H:%M:%S").contains("yyyy-MM-dd HH:mm:ss"))
    assert(LogRegex.strftimeToJavaPattern("%d/%b/%Y").contains("dd/MMM/yyyy"))
    // unmappable specifier → None → caller yields NULL timestamp
    assert(LogRegex.strftimeToJavaPattern("%j").isEmpty)
  }

  test("Java pattern quotes literal letters") {
    assert(LogRegex.strftimeToJavaPattern("%Hh%Mm").contains("HH'h'mm'm'"))
  }

  test("quoted %t matches [^\"]* and converts to NULL (quoted-timestamp parity)") {
    // reference checks is_quoted before the %t branch (format_parser.cpp:575)
    val f = LogFormat.parse("%h \"%t\" %>s")
    assert(f.lineRegex == "^(\\S+)\\s+\"([^\"]*)\"\\s+(\\S+)")
  }

  test("epoch and fraction capture shapes (timestamp_format.test)") {
    val f = LogFormat.parse("%{sec}t %{msec_frac}t")
    assert(f.lineRegex == "^(\\d+)\\s+(\\d{3})")
  }
}

package graft.logs

import org.scalatest.funsuite.AnyFunSuite

/** Conf-extraction specs (reference: test/sql/read_httpd_conf.test,
 * src/httpd_conf_reader.cpp:62-134). */
class HttpdConfSpec extends AnyFunSuite {

  private def parse(lines: String*): Vector[HttpdConf.Entry] =
    HttpdConf.parseLines(lines.iterator, "test.conf")

  test("named LogFormat") {
    val e = parse("""LogFormat "%h %l %u %t \"%r\" %>s %b" common""")
    assert(e.size == 1)
    assert(e.head.formatType == "named")
    assert(e.head.nickname.contains("common"))
    assert(e.head.formatString == """%h %l %u %t "%r" %>s %b""")
  }

  test("default LogFormat without nickname") {
    val e = parse("""LogFormat "%h %t"""")
    assert(e.head.formatType == "default" && e.head.nickname.isEmpty)
  }

  test("CustomLog inline quoted format defines; nickname reference does not") {
    val e = parse(
      """CustomLog "logs/access" "%h %t %>s"""",
      """CustomLog "logs/other" combined""")
    assert(e.size == 1)
    assert(e.head.formatType == "inline" && e.head.formatString == "%h %t %>s")
  }

  test("ErrorLogFormat yields error log_type") {
    val e = parse("""ErrorLogFormat "[%t] [%l] %M"""")
    assert(e.head.logType == "error" && e.head.formatString == "[%t] [%l] %M")
  }

  test("comments and blanks skipped; continuation keeps first line number") {
    val e = parse(
      "# comment",
      "",
      """LogFormat "%h %l %u %t \"%r\" %>s %b \""" ,
      """  \"%{Referer}i\"" combined""")
    assert(e.size == 1)
    assert(e.head.lineNumber == 3)
    assert(e.head.nickname.contains("combined"))
  }

  test("directive match is case-insensitive prefix with whitespace") {
    val e = parse("""logformat "%h" mini""")
    assert(e.size == 1 && e.head.nickname.contains("mini"))
  }
}

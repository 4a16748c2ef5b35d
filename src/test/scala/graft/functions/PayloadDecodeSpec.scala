package graft.functions

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** C111d: charset-aware payload decoding (PayloadDecode) — the step
 * between WARC framing and HTML extraction. */
class PayloadDecodeSpec extends SparkSpec {

  private def dec(bytes: Array[Byte], ct: String): String =
    PayloadDecode.decode(bytes,
      if (ct == null) null else UTF8String.fromString(ct)).toString

  test("HTTP charset param decodes latin-1 and cp1252 byte-exactly") {
    val latin = "café être".getBytes(StandardCharsets.ISO_8859_1)
    assert(dec(latin, "text/html; charset=iso-8859-1") == "café être")
    // the same bytes read as UTF-8 would tombstone (0xE9 is malformed)
    assert(dec(latin, "text/html; charset=utf-8").contains('�'))
    val cp = "’smart“ ™".getBytes("windows-1252")
    assert(dec(cp, "text/html; charset=windows-1252") == "’smart“ ™")
    // param parsing tolerates quotes, spaces, and trailing params
    assert(dec(latin, "text/html; charset=\"ISO-8859-1\"; boundary=x")
      == "café être")
  }

  test("meta sniff fires when the header has no charset, in both meta forms") {
    for (decl <- Seq("<meta charset=\"windows-1252\">",
        "<meta http-equiv=\"Content-Type\" " +
          "content=\"text/html; charset=windows-1252\">")) {
      val html = s"<html><head>$decl</head><body>café ’</body>"
      val bytes = html.getBytes("windows-1252")
      assert(dec(bytes, "text/html") == html, decl)
      assert(dec(bytes, null) == html, decl)
    }
  }

  test("header param BEATS the meta declaration (WHATWG order)") {
    val html = "<head><meta charset=\"utf-8\"></head>café"
    val bytes = html.getBytes(StandardCharsets.ISO_8859_1)
    // header says latin-1; meta lies utf-8 — header wins, é survives
    assert(dec(bytes, "text/html; charset=iso-8859-1") == html)
  }

  test("meta sniff only scans the first 1 KiB") {
    val bytes = ("x" * 1100 + "<meta charset=\"iso-8859-1\">")
      .getBytes(StandardCharsets.US_ASCII) ++ Array(0xE9.toByte)
    // declaration beyond the window is ignored -> UTF-8 fallback ->
    // the lone 0xE9 is malformed and tombstones
    assert(dec(bytes, "text/html").endsWith("�"))
  }

  test("accept-charset and prose 'charset' never hijack or suppress the real declaration (r16 advice)") {
    // a form's accept-charset BEFORE the genuine meta declaration: the
    // first-match-only scan read its token and mis-decoded cp1252
    // pages whose forms advertised utf-8
    val html = "<form accept-charset=\"utf-8\"></form>" +
      "<meta charset=\"windows-1252\">café ’"
    val bytes = html.getBytes("windows-1252")
    assert(dec(bytes, "text/html") == html)
    // prose containing 'charset' with no '=' must not suppress the
    // later genuine declaration
    val prose = "<p>what charset should I use?</p>" +
      "<meta charset=\"iso-8859-1\">café"
    assert(dec(prose.getBytes(StandardCharsets.ISO_8859_1), null) == prose)
    // an accept-charset with NO later declaration still falls back to
    // UTF-8 (it is not a declaration)
    val formOnly = "<form accept-charset=\"iso-8859-1\"></form>café"
    assert(dec(formOnly.getBytes(StandardCharsets.UTF_8), "text/html")
      == formOnly)
    // same rule on the HEADER side: a media-type param list whose
    // only 'charset' is embedded in a longer token is not a param
    assert(dec("café".getBytes(StandardCharsets.UTF_8),
      "text/html; x-accept-charset=iso-8859-1") == "café")
  }

  test("unknown charset names and absent declarations fall back to UTF-8") {
    val utf = "日本語 café".getBytes(StandardCharsets.UTF_8)
    assert(dec(utf, "text/html; charset=x-not-a-charset") == "日本語 café")
    assert(dec(utf, "text/html") == "日本語 café")
    assert(dec(utf, null) == "日本語 café")
    assert(dec(utf, "") == "日本語 café")
  }

  test("undecodable bytes tombstone to U+FFFD, never guessed (C103 rule)") {
    // cp1252's undefined slot 0x81
    val cp = Array('a'.toByte, 0x81.toByte, 'b'.toByte)
    assert(dec(cp, "text/html; charset=windows-1252") == "a�b")
    // truncated UTF-8 sequence under the fallback
    val bad = Array('a'.toByte, 0xC3.toByte)
    assert(dec(bad, null) == "a�")
  }

  test("column surface: codegen'd, null bytes -> null, null ct -> sniff") {
    import spark.implicits._
    val latin = "café".getBytes(StandardCharsets.ISO_8859_1)
    val df = Seq(
      (1L, latin, "text/html; charset=iso-8859-1"),
      (2L, latin, null: String),
      (3L, null: Array[Byte], "text/html")).toDF("id", "b", "ct")
    val out = df.select(col("id"),
        PayloadDecode(col("b"), col("ct")).as("t"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "café")
    assert(out(1).getString(1) == "caf�") // no declaration -> utf-8
    assert(out(2).isNullAt(1))
  }
}

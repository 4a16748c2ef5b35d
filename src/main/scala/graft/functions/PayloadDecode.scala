package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * C111d: charset-aware payload decoding — the honest step between
 * WARC framing (C111, [[WarcRecords]] `payload_bytes`) and HTML
 * extraction (C109, [[HtmlExtract]]): 10–20% of a real crawl declares
 * cp1252/latin-1/shift-jis, and reading the bytes as UTF-8 manufactures
 * exactly the damage C103's mojibake repair then has to guess at.
 *
 * Charset resolution order (the WHATWG/browser order, which is what
 * crawled pages are authored against):
 *  1. the `charset=` parameter of the HTTP `Content-Type` header;
 *  2. a `charset=` declaration inside the first 1 KiB of the body —
 *     covers both `<meta charset="x">` and
 *     `<meta http-equiv="Content-Type" content="text/html; charset=x">`
 *     (scanned byte-wise as latin-1, the way browsers pre-scan);
 *  3. UTF-8.
 * An unknown/garbled charset name falls back to UTF-8 rather than
 * failing the row — a crawl decoder that throws is useless at 100 TB.
 *
 * Decode strictness follows C103's tombstone rule
 * ([[EncodingQa]]): malformed or unmappable bytes become U+FFFD —
 * Java's cp1252 decoder already tombstones the five undefined slots
 * (0x81/8D/8F/90/9D), and lost bytes are NEVER guessed at. Downstream,
 * C103 counts the tombstones and D26 gates on them.
 *
 * Plan shape: one codegen'd static call per row, map-only — rides the
 * archive scan for free at any scale (the C9/C79/WordShingles class).
 */
case class PayloadDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_payload"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary payload, string content_type), got $other")
    }

  override protected def nullSafeEval(bytes: Any, ct: Any): Any =
    PayloadDecode.decode(bytes.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = graft.functions.PayloadDecode.decode($b, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PayloadDecode =
    copy(left = newLeft, right = newRight)
}

object PayloadDecode {

  /** Column builder. A NULL content type means "no HTTP charset" (the
   * coalesce keeps the expression's null contract on the BYTES only —
   * non-response records carry a null http_content_type). */
  def apply(payloadBytes: Column, httpContentType: Column): Column =
    Shim.column(PayloadDecode(Shim.expression(payloadBytes),
      Shim.expression(coalesce(httpContentType, lit("")))))

  /** Body-sniff window: 1 KiB, the browser pre-scan convention. */
  private val SniffLimit = 1024

  private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '_' || c == '.' || c == ':'

  /** First GENUINE charset declaration in `s` (already lowercased):
   * scans successive `charset` occurrences until one (a) is not
   * embedded in a longer identifier — the char before must be
   * non-alphanumeric, which skips `accept-charset` — and (b) is
   * followed by '=' and a non-empty token, tolerating spaces around
   * '=' and single/double quotes. A first-match-only scan let a
   * form's accept-charset or prose containing "charset" hijack or
   * suppress the real <meta charset> declaration (r16 advice); null
   * if no genuine declaration exists. */
  private[functions] def charsetAfterMarker(s: String): String = {
    var i = s.indexOf("charset")
    while (i >= 0) {
      val prev = if (i == 0) ' ' else s.charAt(i - 1)
      val embedded = (prev >= 'a' && prev <= 'z') ||
        (prev >= 'A' && prev <= 'Z') || (prev >= '0' && prev <= '9') ||
        prev == '-' || prev == '_'
      if (!embedded) {
        var j = i + 7
        while (j < s.length && (s.charAt(j) == ' ' || s.charAt(j) == '\t')) j += 1
        if (j < s.length && s.charAt(j) == '=') {
          j += 1
          while (j < s.length && (s.charAt(j) == ' ' || s.charAt(j) == '\t' ||
            s.charAt(j) == '"' || s.charAt(j) == '\'')) j += 1
          val start = j
          while (j < s.length && isTokenChar(s.charAt(j))) j += 1
          if (j > start) return s.substring(start, j)
        }
      }
      i = s.indexOf("charset", i + 7)
    }
    null
  }

  /** Resolved charset for (bytes, contentType): header param, body
   * sniff, UTF-8 — unknown names fall back to UTF-8. */
  private[functions] def resolve(bytes: Array[Byte], ct: String): Charset = {
    var name: String = null
    if (ct != null && ct.nonEmpty)
      name = charsetAfterMarker(ct.toLowerCase(Locale.ROOT))
    if (name == null) {
      val n = math.min(bytes.length, SniffLimit)
      // latin-1 read = byte-transparent for the ASCII markup the
      // declaration lives in
      val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
        .toLowerCase(Locale.ROOT)
      name = charsetAfterMarker(head)
    }
    if (name == null) StandardCharsets.UTF_8
    else try Charset.forName(name)
    catch { case _: IllegalArgumentException => StandardCharsets.UTF_8 }
  }

  /** Codegen static target: decode by declared charset with U+FFFD
   * tombstones for malformed/unmappable bytes. */
  def decode(bytes: Array[Byte], ct: UTF8String): UTF8String = {
    val cs = resolve(bytes, if (ct == null) null else ct.toString)
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
  }
}

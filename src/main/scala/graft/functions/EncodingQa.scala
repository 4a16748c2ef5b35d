package graft.functions

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * C103: encoding QA — the ftfy-class ingest gate: detect and repair
 * "mojibake" (UTF-8 bytes mis-decoded as Windows-1252, the dominant
 * web-crawl corruption: é → Ã©, ' → â€™) and count replacement
 * characters (U+FFFD, a decoder's tombstone for already-lost bytes).
 *
 * Repair semantics (deterministic, single-pass): if EVERY char of the
 * string maps back to a cp1252 byte (ASCII, Latin-1 range, the 27
 * cp1252 specials, plus the C1 control chars an ISO-8859-1-style
 * mis-decoder emits for cp1252's five undefined slots) AND those bytes
 * are STRICT valid UTF-8 AND the re-decode differs, return the
 * re-decode; otherwise return the input unchanged. Pure-ASCII text
 * short-circuits; genuine Latin-1 text (e.g. a real "café") is NOT
 * valid UTF-8 byte-wise and passes through untouched — the reversal
 * only fires when the UTF-8 structure is actually there, which is what
 * makes it safe to run corpus-wide. Note Java's cp1252 decoder
 * tombstones the five undefined bytes (0x81/8D/8F/90/9D) to U+FFFD:
 * corruption that hit them (e.g. a ” anywhere in the text) is
 * genuinely unrecoverable and stays untouched rather than guessed at.
 *
 * Plan shape: one codegen'd static call per row, map-only — rides
 * ingest for free at any scale (the C9/C79 class).
 */
object EncodingQa {

  private val Cp1252 = Charset.forName("windows-1252")

  /** char → the cp1252 byte that decodes to it, or -1 if none. */
  private[functions] def inverseCp1252(c: Char): Int = {
    if (c < 0x80) c
    else if (c >= 0xA0 && c <= 0xFF) c
    else c match {
      case 0x20AC => 0x80; case 0x201A => 0x82; case 0x0192 => 0x83
      case 0x201E => 0x84; case 0x2026 => 0x85; case 0x2020 => 0x86
      case 0x2021 => 0x87; case 0x02C6 => 0x88; case 0x2030 => 0x89
      case 0x0160 => 0x8A; case 0x2039 => 0x8B; case 0x0152 => 0x8C
      case 0x017D => 0x8E; case 0x2018 => 0x91; case 0x2019 => 0x92
      case 0x201C => 0x93; case 0x201D => 0x94; case 0x2022 => 0x95
      case 0x2013 => 0x96; case 0x2014 => 0x97; case 0x02DC => 0x98
      case 0x2122 => 0x99; case 0x0161 => 0x9A; case 0x203A => 0x9B
      case 0x0153 => 0x9C; case 0x017E => 0x9E; case 0x0178 => 0x9F
      // cp1252's five undefined slots decode (in Java) to the control
      // chars of the same value — invert them likewise
      case ctl if ctl >= 0x80 && ctl <= 0x9F => ctl
      case _ => -1
    }
  }

  /** Single-pass mojibake reversal (codegen static target). */
  def fixJava(text: UTF8String): UTF8String = {
    val s = text.toString
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return text
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val b = inverseCp1252(s.charAt(i))
      if (b < 0) return text
      bytes(i) = b.toByte
      i += 1
    }
    try {
      val out = StandardCharsets.UTF_8.newDecoder() // strict: REPORTs
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) text else UTF8String.fromString(out)
    } catch {
      case _: java.nio.charset.CharacterCodingException => text
    }
  }

  /** What `s` looks like after UTF-8 bytes are mis-read as cp1252 —
   * the corruption generator (specs + the q_c103 plant). */
  def mojibakeOf(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), Cp1252)

  /** Canonical plant vector: " café ['s] ["]quoted" with curly
   * punctuation, and its mojibake form. */
  val CleanSample: String = " café ’s “quoted"
  val MojiSample: String = mojibakeOf(CleanSample)

  /** Marker alternation for the common corruptions (literal regex —
   * identical semantics in Spark and DuckDB): Ã©, â€™, â€œ. */
  val MarkerRe: String =
    Seq("é", "’", "“").map(mojibakeOf).mkString("|")

  /** Mojibake repair column (codegen'd, map-only). */
  def fixMojibake(text: Column): Column =
    Shim.column(FixMojibake(Shim.expression(text)))
}

/** Mojibake reversal of a string column — one codegen'd static call
 * per row; returns the input unchanged unless the full cp1252→UTF-8
 * reversal validates (see [[EncodingQa]] semantics). */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    EncodingQa.fixJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.EncodingQa.fixJava($str);")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

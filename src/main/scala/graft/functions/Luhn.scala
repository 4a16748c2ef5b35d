package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C80: Luhn-validated payment-card detection — the precision upgrade
 * real PII pipelines apply to card-number scrubbing: a bare
 * 13-19-digit regex flags order ids, timestamps and phone digits as
 * "cards", while the Luhn mod-10 check (ISO/IEC 7812, the checksum
 * every real PAN carries) rejects ~90% of random digit runs, so only
 * checksum-valid candidates are counted/redacted.
 *
 * Candidate rule — deliberately minimal and engine-portable: MAXIMAL
 * contiguous digit runs of length 13-19 (runs outside that range are
 * never cards; no separator stitching, whose greedy/lookaround regex
 * semantics differ across regex engines — RE2 in DuckDB has no
 * lookarounds, so the contract is chosen to replay exactly as
 * `regexp_extract_all(text, '\d+')` + length filter + a list-
 * comprehension Luhn in SQL). One codegen static call per row, no
 * regex machinery at all on the Spark side: a single byte scan finds
 * the runs and folds the checksum in place.
 *
 * [[LuhnCardCount]] returns the count of valid candidates;
 * [[LuhnRedact]] returns the text with each valid candidate replaced
 * by `[CARD]` (invalid runs are left alone — they are evidence, not
 * PII). Registered in the SQL surface as `luhn_card_count` /
 * `luhn_redact`.
 */
object Luhn {

  /** Luhn mod-10 over digits[start, start+len). */
  def valid(s: String, start: Int, len: Int): Boolean = {
    var sum = 0
    var alt = false
    var i = start + len - 1
    while (i >= start) {
      var d = s.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  // ASCII-only digit test: Character.isDigit accepts Unicode digit
  // classes (fullwidth, Arabic-Indic) that the RE2 '\d+' oracle
  // contract does NOT extract, and whose charAt − '0' values would
  // poison the checksum fold (r11 review finding).
  @inline private def ascii(c: Char): Boolean = c >= '0' && c <= '9'

  def count(u: UTF8String): Int = {
    val s = u.toString
    var cnt = 0
    var i = 0
    val n = s.length
    while (i < n) {
      if (ascii(s.charAt(i))) {
        var j = i
        while (j < n && ascii(s.charAt(j))) j += 1
        val len = j - i
        if (len >= 13 && len <= 19 && valid(s, i, len)) cnt += 1
        i = j
      } else i += 1
    }
    cnt
  }

  def redact(u: UTF8String): UTF8String = {
    val s = u.toString
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      if (ascii(s.charAt(i))) {
        var j = i
        while (j < n && ascii(s.charAt(j))) j += 1
        val len = j - i
        if (len >= 13 && len <= 19 && valid(s, i, len)) out.append("[CARD]")
        else out.append(s, i, j)
        i = j
      } else { out.append(s.charAt(i)); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}

case class LuhnCardCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "luhn_card_count"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Luhn.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Luhn.count($s)")
  override protected def withNewChildInternal(newChild: Expression): LuhnCardCount =
    copy(child = newChild)
}

object LuhnCardCount {
  def apply(text: Column): Column =
    Shim.column(LuhnCardCount(Shim.expression(text)))
}

case class LuhnRedact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "luhn_redact"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Luhn.redact(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Luhn.redact($s)")
  override protected def withNewChildInternal(newChild: Expression): LuhnRedact =
    copy(child = newChild)
}

object LuhnRedact {
  def apply(text: Column): Column =
    Shim.column(LuhnRedact(Shim.expression(text)))
}

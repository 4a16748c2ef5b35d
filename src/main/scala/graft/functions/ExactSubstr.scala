package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C114: the removal kernel of exact-substring dedup (Lee et al. 2022,
 * "Deduplicating Training Data Makes Language Models Better" —
 * ExactSubstr). Given a document's token array and the SORTED start
 * positions of its corpus-duplicated n-grams (minus the canonical
 * occurrences the owner keeps), drop every token covered by the union
 * of [start, start+n-1] intervals and re-join the survivors with
 * single spaces.
 *
 * One static codegen call per row (the [[WordShingles]] pattern — a
 * HOF formulation would run interpreted per token), walking tokens
 * and starts with two pointers: O(tokens + starts) per document, no
 * per-position explode. Returns struct(kept_text, kept_tokens,
 * removed_tokens, n_spans) where n_spans counts the MAXIMAL removed
 * runs (the merged-interval count, the C43 span grain).
 */
case class ScrubSpans(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n > 0, "span length must be positive")

  override def dataType: DataType = ScrubSpans.schema
  override def prettyName: String = "scrub_spans"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string> tokens, array<int> starts), got $other")
    }

  override protected def nullSafeEval(tokens: Any, starts: Any): Any =
    ScrubSpans.compute(tokens.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.ScrubSpans.compute($t, $s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubSpans =
    copy(left = newLeft, right = newRight)
}

object ScrubSpans {

  def apply(tokens: Column, starts: Column, n: Int): Column =
    Shim.column(ScrubSpans(Shim.expression(tokens), Shim.expression(starts), n))

  val schema: StructType = StructType(Seq(
    StructField("kept_text", StringType, nullable = false),
    StructField("kept_tokens", IntegerType, nullable = false),
    StructField("removed_tokens", IntegerType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false)))

  /** `starts` MUST be ascending (the operator sorts); values past the
   * token count only extend coverage harmlessly. */
  def compute(tokens: ArrayData, starts: ArrayData, n: Int): GenericInternalRow = {
    val nTok = tokens.numElements()
    val nSt = starts.numElements()
    val sb = new java.lang.StringBuilder()
    var si = 0
    var coverEnd = -1 // highest covered position so far
    var kept = 0
    var removed = 0
    var spans = 0
    var prevCovered = false
    var p = 0
    while (p < nTok) {
      while (si < nSt && starts.getInt(si) <= p) {
        val e = starts.getInt(si) + n - 1
        if (e > coverEnd) coverEnd = e
        si += 1
      }
      val covered = p <= coverEnd
      if (covered) {
        removed += 1
        if (!prevCovered) spans += 1
      } else {
        if (kept > 0) sb.append(' ')
        val t = tokens.getUTF8String(p)
        if (t != null) sb.append(t.toString)
        kept += 1
      }
      prevCovered = covered
      p += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), kept, removed, spans))
  }
}

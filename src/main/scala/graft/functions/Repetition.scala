package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document n-gram repetition statistics in ONE map-only pass —
 * the doc-LOCAL heart of the Gopher repetition gates
 * (`CorpusPipeline.repetitionProfile`): all the gates need per (doc,
 * n) is the top n-gram's character mass and the duplicated-gram
 * character mass, and both are functions of one document alone, so
 * shuffling every gram instance to a (doc, n, gram) aggregate (the
 * first-cut plan) moves |corpus tokens|·|ns| rows through an exchange
 * to compute what a per-row hash map answers in place. This
 * expression IS that hash map: codegen emits one static call per row
 * (the WordShingles escalation pattern — no interpreted lambda, no
 * Generate, no shuffle), returning
 *
 *   struct(top_gram, top_count, top_char_mass, dup_char_mass,
 *          gram_instances)
 *
 * with the same contracts the aggregate plan had: ties on count break
 * to the BINARY-smallest gram (Spark's UTF8String ordering == the
 * oracle's default collation on this ASCII surface), char masses use
 * the space-joined gram's character length, and a document with fewer
 * than `n` tokens returns NULL (the whole-doc degenerate shingle is
 * not a real n-gram — q_c22's WordShingles contract, inverted).
 */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, arr => s"""
      ${ev.value} = graft.functions.RepetitionStats.compute($arr, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)
    res
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("top_gram", StringType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("top_char_mass", LongType, nullable = false),
    StructField("dup_char_mass", LongType, nullable = false),
    StructField("gram_instances", LongType, nullable = false)))

  def apply(tokens: Column, n: Int): Column =
    Shim.column(RepetitionStats(Shim.expression(tokens), n))

  private val Space = UTF8String.fromString(" ")

  /**
   * Null when the doc has fewer than n tokens (no true n-gram). A
   * window containing a NULL token is skipped entirely (it is not a
   * real n-gram either) — UTF8String.concatWs would silently drop the
   * null and count a SHORTER gram, corrupting the masses without any
   * visible failure; `gram_instances` counts only the windows that
   * were actually hashed, and a doc whose every window is null-bearing
   * returns null like the too-short case.
   */
  def compute(tokens: ArrayData, n: Int): InternalRow = {
    val m = tokens.numElements()
    if (m < n) return null
    val counts = new java.util.HashMap[UTF8String, Long](math.min(m, 1024))
    val window = new Array[UTF8String](n)
    var instances = 0L
    var i = 0
    while (i < m - n + 1) {
      var j = 0
      var hasNull = false
      while (j < n) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else window(j) = tokens.getUTF8String(i + j)
        j += 1
      }
      if (!hasNull) {
        val g = UTF8String.concatWs(Space, window: _*)
        counts.merge(g, 1L, (a, b) => a + b)
        instances += 1L
      }
      i += 1
    }
    if (instances == 0L) return null
    var topGram: UTF8String = null
    var topCount = 0L
    var dupMass = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val c = e.getValue
      if (c > topCount || (c == topCount && (topGram == null || g.compareTo(topGram) < 0))) {
        topGram = g; topCount = c
      }
      if (c >= 2) dupMass += c * g.numChars()
    }
    new GenericInternalRow(Array[Any](
      topGram, topCount, topCount * topGram.numChars(), dupMass, instances))
  }
}

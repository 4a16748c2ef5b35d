package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/**
 * C55: symmetric int8 scalar quantization of an integer-quantized
 * embedding — the production byte-budget layout for big vector stores
 * (4x smaller than f32 / 8x smaller than the long-quantized form
 * here), the scalar sibling of the PQ codes in
 * [[PqExpressions]]. Per vector, one codegen pass computes
 *
 *   maxabs = max(|xᵢ|, 1)               (the per-vector scale)
 *   codeᵢ  = sign(xᵢ) · (|xᵢ|·127 div maxabs)   ∈ [−127, 127]
 *   err    = Σᵢ (xᵢ·127 − codeᵢ·maxabs)²        (exact, in the ×127 scale)
 *
 * and returns [maxabs, Σ|codeᵢ|, err] as three longs. The magnitude
 * form keeps every division non-negative, so Spark's `div` and
 * DuckDB's `//` agree bit-for-bit and the whole computation — codes,
 * L1 mass, reconstruction error — replays as an oracle SQL with
 * list_transform. All integer, all map-only; the stats are the QA step
 * (how much cosine mass does int8 lose on THIS corpus) before
 * switching the ANN fleet to byte vectors.
 */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quant_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Int8QuantStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.Int8QuantStats.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {

  def apply(vec: Column): Column =
    Shim.column(Int8QuantStats(Shim.expression(vec)))

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var maxabs = 1L
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getLong(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    var l1 = 0L
    var err = 0L
    i = 0
    while (i < n) {
      val x = arr.getLong(i)
      val mag = (math.abs(x) * 127L) / maxabs
      val code = if (x < 0) -mag else mag
      l1 += mag
      val e = x * 127L - code * maxabs
      err += e * e
      i += 1
    }
    new GenericArrayData(Array[Any](maxabs, l1, err))
  }
}

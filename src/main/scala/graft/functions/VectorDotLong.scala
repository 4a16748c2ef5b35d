package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Codegen'd dense dot product over integer-quantized vectors
 * (`array<long>` / `array<int>`): Σ aᵢ·bᵢ accumulated in long — the
 * exact-arithmetic sibling of [[VectorDot]]. Oracle-checked ANN reranks
 * depend on the dot being a true integer (bit-identical across
 * engines), and the built-in `aggregate(zip_with(...))` route that
 * guarantees this runs its lambda interpreted per element — measured
 * 8x the total scan time at 1M×64 dims. Same tight unsafe-array loop
 * as VectorDot, long accumulator. Null vectors or length mismatch →
 * NULL.
 */
case class VectorDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot_long"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == LongType || lt == IntegerType) && lt == rt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<long> or two array<int> columns, " +
            s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  private def elemIsInt: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var sum = 0L
      var i = 0
      if (elemIsInt) {
        while (i < n) { sum += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
      } else {
        while (i < n) { sum += x.getLong(i) * y.getLong(i); i += 1 }
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val sum = ctx.freshName("sum")
    val get = if (elemIsInt) "getInt" else "getLong"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += (long) $a.$get($i) * (long) $b.$get($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}

object VectorDotLong {
  def apply(a: Column, b: Column): Column =
    Shim.column(VectorDotLong(Shim.expression(a), Shim.expression(b)))
}

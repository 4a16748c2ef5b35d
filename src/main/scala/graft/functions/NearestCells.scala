package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/**
 * IVF cell affinity: the `probes` nearest centroids of a vector by the
 * ‖v−c‖²-equivalent score (v·c − ‖c‖²/2), as an `array<int>` of cell
 * ids, best first.
 *
 * The composable formulation (`greatest` over one struct per centroid,
 * or `array_sort` of score structs) pays per-row struct allocation and
 * interpreted struct comparisons — measured 300+ s for 1M×64 cells.
 * This expression embeds the centroid matrix (driver-computed, KBs,
 * shipped with the task closure) and runs one tight dot-product /
 * partial-selection loop per row: ~4096 multiplies for 64 cells × 64
 * dims, whole-stage-codegen'd.
 */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], probes: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty && probes > 0 && probes <= centroids.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // flattened row-major centroid matrix + per-cell half squared norms,
  // referenced from generated code via ctx.addReferenceObj
  @transient private lazy val flat: Array[Double] = centroids.flatten
  @transient private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum / 2)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(NearestCells.compute(
      input.asInstanceOf[ArrayData], elemIsFloat, flat, halfNorms, probes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cellFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("cellNorms", halfNorms, "double[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.NearestCells.compute($arr, $elemIsFloat, $flatRef, $normRef, $probes));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  def apply(v: Column, centroids: Array[Array[Double]], probes: Int): Column =
    Shim.column(NearestCells(Shim.expression(v), centroids, probes))

  /** Top-`probes` cells by (v·c − ‖c‖²/2), insertion-selected (probes is
   * small). Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, isFloat: Boolean, flat: Array[Double],
      halfNorms: Array[Double], probes: Int): Array[Int] = {
    val nCells = halfNorms.length
    val dim = flat.length / nCells
    val n = math.min(arr.numElements(), dim)
    val topCell = new Array[Int](probes)
    val topScore = new Array[Double](probes)
    java.util.Arrays.fill(topScore, Double.NegativeInfinity)
    var c = 0
    while (c < nCells) {
      var dot = 0d
      val base = c * dim
      var i = 0
      if (isFloat) while (i < n) { dot += flat(base + i) * arr.getFloat(i); i += 1 }
      else while (i < n) { dot += flat(base + i) * arr.getDouble(i); i += 1 }
      val score = dot - halfNorms(c)
      if (score > topScore(probes - 1)) {
        // insertion into the small sorted top list
        var j = probes - 1
        while (j > 0 && topScore(j - 1) < score) {
          topScore(j) = topScore(j - 1); topCell(j) = topCell(j - 1); j -= 1
        }
        topScore(j) = score
        topCell(j) = c
      }
      c += 1
    }
    java.util.Arrays.copyOf(topCell, probes)
  }
}

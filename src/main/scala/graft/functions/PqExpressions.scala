package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/**
 * Product-quantization primitives for IVF-PQ ANN
 * ([[graft.operators.Similarity.ivfPqTopKSeeded]]), over integer-
 * quantized (`array<bigint>`) vectors so every distance is an exact
 * long and the full pipeline is reproducible in any SQL engine.
 *
 * The codebook is a driver-side constant `[m][ks][subDim_j]` (KBs —
 * seeded from corpus rows the same way [[NearestCells]] centroids are),
 * flattened and shipped via `addReferenceObj`; each expression is one
 * static call inside whole-stage codegen. Subspace `j` covers vector
 * dims `[j·ceil(D/m), min((j+1)·ceil(D/m), D))` — ragged last block
 * allowed.
 *
 * Asymmetric-distance (ADC) shape: candidates store `m` small codes
 * ([[PqCodes]], the only O(D·ks) pass, map-only at index build);
 * each query precomputes a `m·ks` table of exact subspace L2²
 * distances ONCE ([[PqAdcTable]]); every (query, candidate) pair then
 * costs `m` table lookups ([[PqTableDist]]) instead of a D-dim dot —
 * the lookup:exact ratio (m adds vs D mult-adds) is the PQ speedup
 * that makes scanning a big IVF cell cheap at 100 TB.
 */
private[graft] object Pq {

  /** Flattened codebook constants shared by the expressions. */
  final case class Flat(
      flat: Array[Long],     // cb[j][c][d] row-major, j-major then c
      jOff: Array[Int],      // offset of subspace j's block in `flat`
      subOff: Array[Int],    // first vector dim of subspace j
      subLen: Array[Int],    // dims in subspace j
      ks: Int)

  def flatten(cb: Array[Array[Array[Long]]]): Flat = {
    val m = cb.length
    require(m > 0 && cb.forall(_.length == cb(0).length),
      "codebook must have the same ks per subspace")
    val ks = cb(0).length
    val subLen = cb.map(_(0).length)
    cb.foreach(s => require(s.forall(_.length == s(0).length),
      "codebook centroids within a subspace must share a length"))
    val subOff = subLen.scanLeft(0)(_ + _).init
    val jOff = new Array[Int](m)
    var acc = 0
    var j = 0
    while (j < m) { jOff(j) = acc; acc += ks * subLen(j); j += 1 }
    val flat = new Array[Long](acc)
    j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        System.arraycopy(cb(j)(c), 0, flat, jOff(j) + c * subLen(j), subLen(j))
        c += 1
      }
      j += 1
    }
    Flat(flat, jOff, subOff, subLen, ks)
  }

  /** Exact L2² between vector dims [off, off+len) and codebook block.
   * Clamped to the vector's actual length (NearestCells contract): a
   * ragged/short row scores only its available dims instead of
   * crashing the job — at corpus scale one malformed vector must not
   * kill a stage. */
  @inline private def l2(arr: ArrayData, off: Int, flat: Array[Long],
      base: Int, len: Int): Long = {
    val n = math.min(len, math.max(arr.numElements() - off, 0))
    var d = 0L
    var i = 0
    while (i < n) {
      val diff = arr.getLong(off + i) - flat(base + i)
      d += diff * diff
      i += 1
    }
    d
  }

  def codes(arr: ArrayData, flat: Array[Long], jOff: Array[Int],
      subOff: Array[Int], subLen: Array[Int], ks: Int): Array[Int] = {
    val m = jOff.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < ks) {
        val d = l2(arr, subOff(j), flat, jOff(j) + c * subLen(j), subLen(j))
        if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest c
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }

  def adcTable(arr: ArrayData, flat: Array[Long], jOff: Array[Int],
      subOff: Array[Int], subLen: Array[Int], ks: Int): Array[Long] = {
    val m = jOff.length
    val out = new Array[Long](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        out(j * ks + c) = l2(arr, subOff(j), flat, jOff(j) + c * subLen(j), subLen(j))
        c += 1
      }
      j += 1
    }
    out
  }

  def tableDist(table: ArrayData, codes: ArrayData, ks: Int): Long = {
    val m = codes.numElements()
    var s = 0L
    var j = 0
    while (j < m) { s += table.getLong(j * ks + codes.getInt(j)); j += 1 }
    s
  }
}

private[graft] trait PqCodebookExpr extends UnaryExpression {
  def codebook: Array[Array[Array[Long]]]
  @transient protected lazy val fcb: Pq.Flat = Pq.flatten(codebook)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (quantized vector), got ${other.simpleString}")
  }

  /** addReferenceObj the flattened constants; returns their codegen names. */
  protected def refs(ctx: CodegenContext): (String, String, String, String) = (
    ctx.addReferenceObj("pqFlat", fcb.flat, "long[]"),
    ctx.addReferenceObj("pqJOff", fcb.jOff, "int[]"),
    ctx.addReferenceObj("pqSubOff", fcb.subOff, "int[]"),
    ctx.addReferenceObj("pqSubLen", fcb.subLen, "int[]"))
}

/** Candidate-side PQ encoding: vector → `m` nearest-centroid codes. */
case class PqCodes(child: Expression, codebook: Array[Array[Array[Long]]])
    extends PqCodebookExpr {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Pq.codes(input.asInstanceOf[ArrayData],
      fcb.flat, fcb.jOff, fcb.subOff, fcb.subLen, fcb.ks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (f, jo, so, sl) = refs(ctx)
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Pq.codes($arr, $f, $jo, $so, $sl, ${fcb.ks}));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def apply(v: Column, cb: Array[Array[Array[Long]]]): Column =
    Shim.column(PqCodes(Shim.expression(v), cb))
}

/** Query-side ADC table: vector → `m·ks` exact subspace L2² distances. */
case class PqAdcTable(child: Expression, codebook: Array[Array[Array[Long]]])
    extends PqCodebookExpr {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Pq.adcTable(input.asInstanceOf[ArrayData],
      fcb.flat, fcb.jOff, fcb.subOff, fcb.subLen, fcb.ks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (f, jo, so, sl) = refs(ctx)
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Pq.adcTable($arr, $f, $jo, $so, $sl, ${fcb.ks}));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

object PqAdcTable {
  def apply(v: Column, cb: Array[Array[Array[Long]]]): Column =
    Shim.column(PqAdcTable(Shim.expression(v), cb))
}

/** Per-pair ADC distance: `m` table lookups, Σⱼ table[j·ks + codes[j]]. */
case class PqTableDist(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_table_dist"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint> table, array<int> codes), got $other")
  }

  override protected def nullSafeEval(table: Any, codes: Any): Any =
    Pq.tableDist(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.Pq.tableDist($t, $c, $ks);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqTableDist =
    copy(left = newLeft, right = newRight)
}

object PqTableDist {
  def apply(table: Column, codes: Column, ks: Int): Column =
    Shim.column(PqTableDist(Shim.expression(table), Shim.expression(codes), ks))
}

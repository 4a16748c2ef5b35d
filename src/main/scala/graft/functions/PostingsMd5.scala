package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Posting-list digest for inverted-index builds: given the collected
 * `array<struct<id: bigint, tf: bigint>>` for one term, returns
 * `md5("id:tf id:tf …")` with postings in (id, tf) order — bit-for-bit
 * the HOF formulation
 * `md5(array_join(transform(array_sort(collect_list(struct(id, tf))),
 * x -> concat(id, ':', tf)), ' '))`, but in ONE static Java call per
 * term instead of three interpreted per-element passes (Spark executes
 * `transform` lambdas interpreted, one closure call and Row boxing per
 * posting) plus two intermediate arrays. On the 100 TB shape the digest
 * aggregate is the inverted-index build's only non-map-side work, so
 * its per-term constant is the build's throughput ceiling.
 */
case class PostingsMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<bigint,bigint>>, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "postings_md5"

  override protected def nullSafeEval(input: Any): Any =
    PostingsMd5.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PostingsMd5.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): PostingsMd5 =
    copy(child = newChild)
}

object PostingsMd5 {

  def apply(postings: Column): Column =
    Shim.column(PostingsMd5(Shim.expression(postings)))

  /** Sort parallel (id, tf) arrays by (id, then tf) — ids are unique per
   * term in an inverted index, the tf tiebreak only pins down the
   * degenerate duplicate-posting case to array_sort's struct order. */
  private def sort(ids: Array[Long], tfs: Array[Long], lo: Int, hi: Int): Unit = {
    if (lo >= hi) return
    val pi = ids(lo + (hi - lo) / 2)
    val pt = tfs(lo + (hi - lo) / 2)
    var i = lo
    var j = hi
    while (i <= j) {
      while (ids(i) < pi || (ids(i) == pi && tfs(i) < pt)) i += 1
      while (ids(j) > pi || (ids(j) == pi && tfs(j) > pt)) j -= 1
      if (i <= j) {
        val ti = ids(i); ids(i) = ids(j); ids(j) = ti
        val tt = tfs(i); tfs(i) = tfs(j); tfs(j) = tt
        i += 1; j -= 1
      }
    }
    sort(ids, tfs, lo, j)
    sort(ids, tfs, i, hi)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val tfs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      tfs(i) = row.getLong(1)
      i += 1
    }
    sort(ids, tfs, 0, n - 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.lang.StringBuilder(24)
    i = 0
    while (i < n) {
      buf.setLength(0)
      if (i > 0) buf.append(' ')
      buf.append(ids(i)).append(':').append(tfs(i))
      // digits and ':'/' ' are single-byte in UTF-8: charAt IS the byte
      var k = 0
      val len = buf.length()
      while (k < len) { md.update(buf.charAt(k).toByte); k += 1 }
      i += 1
    }
    val dig = md.digest()
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((dig(i) >> 4) & 0xf).toByte
      hex(2 * i + 1) = HexDigits(dig(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(hex)
  }
}

package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern literal scan (C88) — the blocklist
 * primitive every large-corpus safety filter needs: ONE pass over each
 * document's bytes counts every pattern of an arbitrary phrase list,
 * where the per-pattern alternative (|patterns| regex/`contains`
 * passes) rescans the corpus once per phrase. The automaton is built
 * once on the driver, embedded in the codegen'd plan via
 * `addReferenceObj` (the [[BpeCodec]] device), and each row costs
 * O(bytes + matches) regardless of list size — the right shape for a
 * 10k-phrase blocklist over 100 TB.
 *
 * Matching contract: per-pattern occurrence counts over the UTF-8
 * bytes, ALL match positions counted independently per pattern
 * (patterns may overlap each other and nest — "stream" inside
 * "data stream" counts for both). Patterns must be BORDER-FREE (no
 * proper prefix that is also a suffix, checked at build): a border-free
 * pattern cannot overlap itself, so the all-positions count equals the
 * greedy non-overlapping count and the result is replayable in any SQL
 * engine as `(length(t) - length(replace(t, p, ''))) / length(p)` —
 * the determinism contract the q_c88 oracle uses.
 */
final class AcAutomaton private (
    val patterns: Array[String],
    goTo: Array[Array[Int]],
    outs: Array[Array[Int]]) extends Serializable {

  def numPatterns: Int = patterns.length

  /** Per-pattern occurrence counts over the UTF-8 bytes of `text`. */
  def countAll(text: UTF8String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = text.numBytes()
    while (i < n) {
      state = goTo(state)(text.getByte(i) & 0xFF)
      val o = outs(state)
      var k = 0
      while (k < o.length) { counts(o(k)) += 1L; k += 1 }
      i += 1
    }
    counts
  }

  /** Earliest byte offset of any match end (-1 if clean) — the cheap
   * short-circuit for admission firewalls that only need a verdict. */
  def firstMatchEnd(text: UTF8String): Int = {
    var state = 0
    var i = 0
    val n = text.numBytes()
    while (i < n) {
      state = goTo(state)(text.getByte(i) & 0xFF)
      if (outs(state).length > 0) return i
      i += 1
    }
    -1
  }

  override def equals(other: Any): Boolean = other match {
    case a: AcAutomaton => java.util.Arrays.equals(
      patterns.asInstanceOf[Array[AnyRef]], a.patterns.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(patterns.asInstanceOf[Array[AnyRef]])
}

object AcAutomaton {

  /** KMP failure of the full pattern > 0 ⇔ a proper border exists. */
  private def hasProperBorder(p: Array[Byte]): Boolean = {
    val f = new Array[Int](p.length)
    var k = 0
    var i = 1
    while (i < p.length) {
      while (k > 0 && p(i) != p(k)) k = f(k - 1)
      if (p(i) == p(k)) k += 1
      f(i) = k
      i += 1
    }
    f(p.length - 1) > 0
  }

  def build(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty, "blocklist must be non-empty")
    require(patterns.distinct.size == patterns.size,
      "blocklist patterns must be distinct")
    val pbytes = patterns.map(_.getBytes(StandardCharsets.UTF_8)).toArray
    pbytes.zipWithIndex.foreach { case (b, i) =>
      require(b.nonEmpty, s"pattern ${i} is empty")
      require(!hasProperBorder(b),
        s"pattern '${patterns(i)}' has a proper border (prefix == suffix): " +
          "self-overlapping patterns break the non-overlapping-count replay contract")
    }
    // Byte trie.
    val children = ArrayBuffer(Array.fill(256)(-1))
    val owned = ArrayBuffer(List.empty[Int])
    pbytes.zipWithIndex.foreach { case (b, pi) =>
      var node = 0
      b.foreach { byte =>
        val c = byte & 0xFF
        if (children(node)(c) == -1) {
          children += Array.fill(256)(-1)
          owned += Nil
          children(node)(c) = children.length - 1
        }
        node = children(node)(c)
      }
      owned(node) = pi :: owned(node)
    }
    // BFS: fail links, merged outputs, goto-DFA conversion in place.
    val n = children.length
    val fail = new Array[Int](n)
    val outs = new Array[Array[Int]](n)
    outs(0) = owned(0).toArray
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val v = children(0)(c)
      if (v == -1) children(0)(c) = 0
      else { fail(v) = 0; outs(v) = (owned(v) ++ outs(0)).sorted.toArray; queue.add(v) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      var c = 0
      while (c < 256) {
        val v = children(u)(c)
        if (v == -1) children(u)(c) = children(fail(u))(c)
        else {
          fail(v) = children(fail(u))(c)
          outs(v) = (owned(v) ++ outs(fail(v))).sorted.toArray
          queue.add(v)
        }
        c += 1
      }
    }
    new AcAutomaton(patterns.toArray, children.toArray, outs)
  }
}

/** `array<bigint>` of per-pattern occurrence counts — codegen'd single
 * call per row against the embedded [[AcAutomaton]]. */
case class BlocklistCounts(child: Expression, ac: AcAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.countAll(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac, "graft.functions.AcAutomaton")
    nullSafeCodeGen(ctx, ev, str =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $ref.countAll($str));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistCounts =
    copy(child = newChild)
}

object BlocklistCounts {
  def apply(text: Column, patterns: Seq[String]): Column =
    Shim.column(BlocklistCounts(Shim.expression(text), AcAutomaton.build(patterns)))
}

/** Byte offset (0-based, inclusive end position) of the FIRST blocklist
 * match, -1 when clean — the admission-firewall verdict column. */
case class BlocklistFirstHit(child: Expression, ac: AcAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "blocklist_first_hit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ac.firstMatchEnd(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac, "graft.functions.AcAutomaton")
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.firstMatchEnd($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistFirstHit =
    copy(child = newChild)
}

object BlocklistFirstHit {
  def apply(text: Column, patterns: Seq[String]): Column =
    Shim.column(BlocklistFirstHit(Shim.expression(text), AcAutomaton.build(patterns)))
}

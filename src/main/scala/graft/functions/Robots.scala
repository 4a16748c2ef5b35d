package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C112: robots.txt evaluation (RFC 9309 Robots Exclusion Protocol) —
 * the crawl-admission gate that sits beside the C111 front door: a
 * polite 100 TB crawl evaluates EVERY candidate URL against its
 * host's robots.txt before fetch, so the evaluator must be a map-only
 * per-row expression, not a driver-side library call.
 *
 * Contract (spec-pinned):
 *  - Lines parse as `key: value` with `#` comments stripped; keys
 *    match case-insensitively. Consecutive `User-agent` lines open a
 *    group (a UA line AFTER rules starts a new group); `Allow`/
 *    `Disallow` lines attach to the open group(s). An empty
 *    `Disallow:` value is a no-op (classic allow-all idiom).
 *  - Group selection: a group applies when its UA value is `*` or a
 *    case-insensitive substring of the supplied agent token. The
 *    most SPECIFIC match wins (longest UA value; all groups at that
 *    length merge); when any non-`*` group matches, `*` groups are
 *    ignored (RFC 9309 §2.2.1).
 *  - Rule matching: a pattern matches as a PREFIX of the path; `*`
 *    matches any byte run; a trailing `$` anchors the match to the
 *    path end. Among matching rules the LONGEST pattern (raw length,
 *    `$` excluded) wins; a tie goes to Allow; no matching rule (or
 *    no applicable group) → allowed (RFC 9309 §2.2.2).
 *
 * Per-row cost: the parsed rule set is cached thread-locally keyed by
 * the robots text (the Multimodal thread-local-reader pattern) — a
 * partition of URLs from one host parses its robots.txt once, not
 * per row. Returns struct(allowed, rule) — the matched pattern is
 * the audit evidence a crawl log keeps.
 */
case class RobotsEval(left: Expression, right: Expression, agent: String)
    extends BinaryExpression {

  override def dataType: DataType = RobotsEval.schema
  override def prettyName: String = "robots_eval"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string robots, string path), got $other")
    }

  override protected def nullSafeEval(robots: Any, path: Any): Any =
    RobotsEval.compute(robots.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (r, p) =>
      s"${ev.value} = graft.functions.RobotsEval.compute($r, $p, $agentRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsEval =
    copy(left = newLeft, right = newRight)
}

object RobotsEval {

  def apply(robots: Column, path: Column, agent: String): Column =
    Shim.column(RobotsEval(Shim.expression(robots), Shim.expression(path), agent))

  val schema: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("rule", StringType, nullable = false)))

  private final case class Rule(allow: Boolean, pattern: String) {
    val anchored: Boolean = pattern.endsWith("$")
    val pat: String = if (anchored) pattern.dropRight(1) else pattern
    val len: Int = pat.length
  }

  private final class Parsed(text: String, agentLower: String) {
    val rules: Array[Rule] = {
      // (uaValuesLower, rules) groups
      val groups = scala.collection.mutable.ArrayBuffer
        .empty[(scala.collection.mutable.ArrayBuffer[String],
          scala.collection.mutable.ArrayBuffer[Rule])]
      var openUa = true
      for (raw <- text.split("\n")) {
        val noComment = {
          val h = raw.indexOf('#')
          if (h >= 0) raw.substring(0, h) else raw
        }
        val line = noComment.trim
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (!openUa || groups.isEmpty) {
                groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                  scala.collection.mutable.ArrayBuffer.empty[Rule]))
                openUa = true
              }
              groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" if groups.nonEmpty =>
              openUa = false
              // empty value = no-op (the classic "Disallow:" allow-all)
              if (value.nonEmpty)
                groups.last._2 += Rule(key == "allow", value)
            case _ => ()
          }
        }
      }
      // most specific matching UA value; non-* beats *
      def matchLen(ua: String): Int =
        if (ua == "*") 0
        else if (ua.nonEmpty && agentLower.contains(ua)) ua.length
        else -1
      val scored = groups.map { case (uas, rs) =>
        (uas.map(matchLen).max, rs)
      }.filter(_._1 >= 0)
      if (scored.isEmpty) Array.empty[Rule]
      else {
        val best = scored.map(_._1).max
        scored.filter(_._1 == best).flatMap(_._2).toArray
      }
    }
  }

  /** One cached parse: key = defensive UTF8String copy of the robots
   * text (the input may be backed by reused unsafe-row memory) + the
   * agent reference-object. */
  private final class CacheEntry(
      val key: UTF8String, val agent: String, val parsed: Parsed)

  // Small bounded per-thread cache keyed by (robots text, agent): a
  // multi-agent projection (q_c112 evaluates two agents per row) must
  // parse each robots.txt once per partition, not alternately evict
  // itself per row. 8 slots, insert-at-front on miss. The hit test is
  // agent identity + UTF8String.equals (O(1) length precheck, memcmp
  // only on equal length) — no per-row toString/toLowerCase.
  private val cache = new ThreadLocal[Array[CacheEntry]] {
    override def initialValue(): Array[CacheEntry] = new Array[CacheEntry](8)
  }

  /** Parsed-constructor count — spec hook for cache behavior. */
  private[functions] val parseCount = new java.util.concurrent.atomic.AtomicLong

  /** Greedy glob-prefix match: does `pat` (with '*' wildcards) match
   * a prefix of `path` (the whole path when `anchored`)? Linear
   * two-pointer form (remember the LAST '*' and re-extend only it —
   * exact for '*'-only patterns, the classic wildcard algorithm):
   * O(|pat|·|path|) worst case, so a hostile many-star pattern
   * (slash-star-a repeated) in a crawled robots.txt cannot go
   * exponential on the admission gate. */
  private[functions] def globMatch(
      pat: String, path: String, anchored: Boolean): Boolean = {
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (true) {
      if (pi == pat.length) {
        if (!anchored || si == path.length) return true
        // anchored miss: absorb one more path char into the last star
        if (starPi < 0) return false
        starSi += 1
        if (starSi > path.length) return false
        pi = starPi + 1
        si = starSi
      } else if (pat.charAt(pi) == '*') {
        starPi = pi
        starSi = si
        pi += 1
      } else if (si < path.length && path.charAt(si) == pat.charAt(pi)) {
        pi += 1
        si += 1
      } else {
        if (starPi < 0) return false
        starSi += 1
        if (starSi > path.length) return false
        pi = starPi + 1
        si = starSi
      }
    }
    false
  }

  private def lookup(robots: UTF8String, agent: String): Parsed = {
    val entries = cache.get()
    var i = 0
    while (i < entries.length) {
      val e = entries(i)
      if (e != null && (e.agent eq agent) && e.key.equals(robots)) return e.parsed
      i += 1
    }
    parseCount.incrementAndGet()
    val parsed = new Parsed(robots.toString,
      agent.toLowerCase(java.util.Locale.ROOT))
    i = entries.length - 1
    while (i > 0) {
      entries(i) = entries(i - 1)
      i -= 1
    }
    entries(0) = new CacheEntry(robots.clone(), agent, parsed)
    parsed
  }

  def compute(robots: UTF8String, path: UTF8String, agent: String): GenericInternalRow = {
    val parsed = lookup(robots, agent)
    val p = path.toString
    var bestRule: Rule = null
    for (r <- parsed.rules) {
      if (globMatch(r.pat, p, r.anchored)) {
        if (bestRule == null || r.len > bestRule.len ||
            (r.len == bestRule.len && r.allow && !bestRule.allow))
          bestRule = r
      }
    }
    if (bestRule == null)
      new GenericInternalRow(Array[Any](true, UTF8String.fromString("")))
    else
      new GenericInternalRow(Array[Any](
        bestRule.allow, UTF8String.fromString(bestRule.pattern)))
  }
}

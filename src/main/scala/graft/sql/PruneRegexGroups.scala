package graft.sql

import graft.functions.{RegexGroups, SingletonArray}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Parse-side column pruning for the log scan: Catalyst's own
 * ColumnPruning removes unused CONVERSION expressions, but the per-line
 * [[RegexGroups]] regex still captures every directive's group — on a
 * two-column projection of a ten-directive format the scan pays eight
 * useless capture registers and UTF8String materializations per line
 * (the reference doesn't prune either: no projection_pushdown in
 * httpd_log_table_function.cpp — this is beyond-parity).
 *
 * The rule runs AFTER the main optimizer batches (installed into
 * `spark.experimental.extraOptimizations`, or pre-CBO via
 * [[GraftExtensions]]), when the surviving consumers of each groups
 * array are known exactly. Producers it recognizes:
 *
 *  - `Alias(RegexGroups)` in a Project (the raw-mode parse shape);
 *  - `Generate(Explode(SingletonArray(rg)))` and the alias-fed variant
 *    `Generate(Explode(SingletonArray(attr)))` over such an Alias —
 *    the non-raw parse shape (single-evaluation row drop).
 *
 * If EVERY consumer of the produced array is `element_at(attr, <pos
 * int literal>)`, `GetArrayItem(attr, <int literal>)`, or
 * `IsNull/IsNotNull(attr)` (validation only), the pattern is rewritten
 * so unread groups become NON-capturing `(?:` and the surviving
 * indices are remapped. The regex still matches exactly the same lines
 * — validation, and therefore parse_error/row-drop semantics, are
 * untouched; only capture bookkeeping and array width shrink. An
 * array nobody reads at all (count-only scans) drops EVERY capture.
 * The collapsed single-consumer shape `element_at(RegexGroups(..), i)`
 * and bare `IsNotNull(RegexGroups)` prune the same way.
 *
 * Any other reference to the array (whole-array output, non-literal
 * index, size(), subquery use, ...) blocks pruning for that producer —
 * correctness first. Patterns carrying constructs a blind renumbering
 * could break (named groups `(?<`, backreferences `\N`) are left
 * alone; the [[graft.logs.LogRegex]] builder never emits them.
 *
 * Note a filter CANNOT carry the single-evaluation contract: both
 * PushDownPredicates (logical) and PhysicalOperation (scan planning)
 * inline the producing alias into filter conditions, duplicating the
 * match — hence the Generate shape in HttpdLog.parse, which both
 * planners treat as a barrier.
 */
object PruneRegexGroups extends Rule[LogicalPlan] {

  /** Append to the session's experimental optimizations once. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(PruneRegexGroups))
      spark.experimental.extraOptimizations = cur :+ PruneRegexGroups
  }

  private val backref = java.util.regex.Pattern.compile("\\\\[1-9]")

  private def rewritable(pattern: String): Boolean =
    !pattern.contains("(?<") && !backref.matcher(pattern).find()

  /** Rewrite `pattern` keeping only the capturing groups `keep` allows;
   * returns (new pattern, old 1-based index → new 1-based index).
   *
   * The ONE scanner both entry points share. It understands the three
   * Java-regex constructs that change what '(' and '[' mean:
   *  - `\Q...\E` quote spans (Pattern.quote output — ErrorLog compiles
   *    its literals this way): copied verbatim, NOTHING inside counts
   *    (a quoted '[' once flipped the class state and miscounted every
   *    later group — a renumbering that silently returned the wrong
   *    column);
   *  - character classes with Java's NESTED-class syntax `[a[b]]`:
   *    tracked as a depth, not a boolean;
   *  - escapes `\x`: copied as two chars.
   */
  private[sql] def pruneCaptures(
      pattern: String, keep: Int => Boolean): (String, Map[Int, Int]) = {
    val sb = new StringBuilder(pattern.length)
    val remap = Map.newBuilder[Int, Int]
    var i = 0
    var grp = 0
    var kept = 0
    var classDepth = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length && pattern.charAt(i + 1) == 'Q') {
        val end = pattern.indexOf("\\E", i + 2)
        val stop = if (end < 0) pattern.length else end + 2
        sb.append(pattern.substring(i, stop)); i = stop
      } else if (c == '\\' && i + 1 < pattern.length) {
        sb.append(c).append(pattern.charAt(i + 1)); i += 2
      } else if (classDepth > 0) {
        if (c == '[') classDepth += 1
        else if (c == ']') classDepth -= 1
        sb.append(c); i += 1
      } else c match {
        case '[' => classDepth = 1; sb.append(c); i += 1
        case '(' if i + 1 < pattern.length && pattern.charAt(i + 1) == '?' =>
          sb.append(c); i += 1 // already non-capturing / lookaround
        case '(' =>
          grp += 1
          if (keep(grp)) { kept += 1; remap += grp -> kept; sb.append('(') }
          else sb.append("(?:")
          i += 1
        case _ => sb.append(c); i += 1
      }
    }
    (sb.toString, remap.result())
  }

  /** Number of capturing groups in `pattern` — the SAME scanner as the
   * rewrite (a keep-everything pass), so the two can never disagree. */
  private[sql] def totalCaptures(pattern: String): Int =
    pruneCaptures(pattern, _ => true)._2.size

  override def apply(plan: LogicalPlan): LogicalPlan = {
    import scala.collection.mutable

    // -------- producers --------------------------------------------------
    // aliasRg: Alias exprId -> its RegexGroups (rewrite site: the Alias)
    // genDirect: Generate-output exprId -> RegexGroups (rewrite site: the
    //   Generate's Explode(SingletonArray(rg)))
    // forward: Generate-output exprId -> feeding Alias exprId (rewrite
    //   site: the Alias; the Generate just re-exposes the same arrays)
    val aliasRg = mutable.Map[ExprId, RegexGroups]()
    val genDirect = mutable.Map[ExprId, RegexGroups]()
    val forward = mutable.Map[ExprId, ExprId]()
    plan.foreach {
      case p: Project => p.projectList.foreach {
        case a @ Alias(rg: RegexGroups, _) if rewritable(rg.pattern) =>
          aliasRg(a.exprId) = rg
        case _ =>
      }
      case _ =>
    }
    plan.foreach {
      case g: Generate if g.generatorOutput.size == 1 => g.generator match {
        case Explode(SingletonArray(rg: RegexGroups)) if rewritable(rg.pattern) =>
          genDirect(g.generatorOutput.head.exprId) = rg
        case Explode(SingletonArray(a: AttributeReference))
            if aliasRg.contains(a.exprId) =>
          forward(g.generatorOutput.head.exprId) = a.exprId
        case _ =>
      }
      case _ =>
    }
    if (aliasRg.isEmpty && genDirect.isEmpty) return collapsedShapes(plan)

    // every exprId that exposes a producer's arrays, mapped to its root
    def root(id: ExprId): ExprId = forward.getOrElse(id, id)
    def isFace(id: ExprId): Boolean =
      aliasRg.contains(id) || genDirect.contains(id) || forward.contains(id)
    def rgOf(rootId: ExprId): RegexGroups =
      aliasRg.getOrElse(rootId, genDirect(rootId))

    // -------- usage scan across the whole plan ---------------------------
    val used = mutable.Map[ExprId, mutable.Set[Int]]()
    val blocked = mutable.Set[ExprId]()
    def mark(id: ExprId, idx: Int): Unit =
      used.getOrElseUpdate(root(id), mutable.Set.empty) += idx

    def visit(e: Expression): Unit = e match {
      case ea: ElementAt => (ea.left, ea.right) match {
        case (a: AttributeReference, Literal(i: Int, IntegerType)) if isFace(a.exprId) =>
          if (i > 0) mark(a.exprId, i) else blocked += root(a.exprId)
        case _ => e.children.foreach(visit)
      }
      case ga: GetArrayItem => (ga.child, ga.ordinal) match {
        case (a: AttributeReference, Literal(i: Int, IntegerType)) if isFace(a.exprId) =>
          if (i >= 0) mark(a.exprId, i + 1) else blocked += root(a.exprId)
        case _ => e.children.foreach(visit)
      }
      case IsNull(a: AttributeReference) if isFace(a.exprId) =>
        used.getOrElseUpdate(root(a.exprId), mutable.Set.empty)
      case IsNotNull(a: AttributeReference) if isFace(a.exprId) =>
        used.getOrElseUpdate(root(a.exprId), mutable.Set.empty)
      case a: AttributeReference if isFace(a.exprId) =>
        blocked += root(a.exprId) // any other use: pass-through, size(), ...
      case _ => e.children.foreach(visit)
    }
    plan.foreach {
      // a recognized Generate is a production site, not a use — its
      // `expressions` include both the generator AND its own
      // generatorOutput attribute, neither of which consumes the arrays
      case g: Generate if g.generatorOutput.size == 1 &&
          (genDirect.contains(g.generatorOutput.head.exprId) ||
            forward.contains(g.generatorOutput.head.exprId)) => ()
      case p: Project =>
        p.projectList.foreach {
          // the producing Alias itself is not a use...
          case a: Alias if aliasRg.contains(a.exprId) => a.child.children.foreach(visit)
          // ...nor is a bare pass-through projection (same ExprId flows on)
          case _: AttributeReference => ()
          case e => visit(e)
        }
      case node => node.expressions.foreach(visit)
    }
    plan.output.foreach(a => if (isFace(a.exprId)) blocked += root(a.exprId))
    // a face referenced from inside a subquery plan is consumed by
    // expressions the scan above never walks — block it outright
    plan.subqueriesAll.foreach(_.foreach(_.expressions.foreach(_.foreach {
      case a: AttributeReference if isFace(a.exprId) => blocked += root(a.exprId)
      case _ =>
    })))

    // -------- prunable producers and their index remaps -------------------
    val plans = mutable.Map[ExprId, (String, Map[Int, Int])]()
    (aliasRg.keys ++ genDirect.keys).foreach { id =>
      if (!blocked(id)) {
        val rg = rgOf(id)
        // no recorded use at all (and unblocked) = validation-only:
        // the Generate still drops rows, nobody reads the arrays
        val keep = used.getOrElse(id, mutable.Set.empty[Int])
        val (pat, remap) = pruneCaptures(rg.pattern, keep.contains)
        if (remap.size < totalCaptures(rg.pattern) && keep.forall(remap.contains))
          plans(id) = (pat, remap)
      }
    }

    val rewritten =
      if (plans.isEmpty) plan
      else plan.transform {
        case p: Project => p.copy(projectList = p.projectList.map {
          case a @ Alias(rg: RegexGroups, name) if plans.contains(a.exprId) =>
            Alias(rg.copy(pattern = plans(a.exprId)._1), name)(
              exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = a.explicitMetadata)
          case other => other
        })
        case g: Generate if g.generatorOutput.size == 1 &&
            plans.contains(g.generatorOutput.head.exprId) =>
          g.generator match {
            case Explode(SingletonArray(rg: RegexGroups)) =>
              g.copy(generator = Explode(SingletonArray(
                rg.copy(pattern = plans(g.generatorOutput.head.exprId)._1))))
            case _ => g
          }
      }.transformAllExpressions {
        case ea: ElementAt => (ea.left, ea.right) match {
          case (a: AttributeReference, Literal(i: Int, IntegerType))
              if isFace(a.exprId) && plans.contains(root(a.exprId)) =>
            ea.copy(right = Literal(plans(root(a.exprId))._2(i)))
          case _ => ea
        }
        case ga: GetArrayItem => (ga.child, ga.ordinal) match {
          case (a: AttributeReference, Literal(i: Int, IntegerType))
              if isFace(a.exprId) && plans.contains(root(a.exprId)) =>
            ga.copy(ordinal = Literal(plans(root(a.exprId))._2(i + 1) - 1))
          case _ => ga
        }
      }

    collapsedShapes(rewritten)
  }

  /** CollapseProject-inlined single-consumer shapes. */
  private def collapsedShapes(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ea: ElementAt => (ea.left, ea.right) match {
        case (rg: RegexGroups, Literal(i: Int, IntegerType))
            if i > 0 && rewritable(rg.pattern) && totalCaptures(rg.pattern) > 1 =>
          val (pat, remap) = pruneCaptures(rg.pattern, _ == i)
          if (remap.contains(i)) ea.copy(left = rg.copy(pattern = pat),
            right = Literal(remap(i)))
          else ea
        case _ => ea
      }
      case IsNotNull(rg: RegexGroups)
          if rewritable(rg.pattern) && totalCaptures(rg.pattern) > 0 =>
        IsNotNull(rg.copy(pattern = pruneCaptures(rg.pattern, _ => false)._1))
      case IsNull(rg: RegexGroups)
          if rewritable(rg.pattern) && totalCaptures(rg.pattern) > 0 =>
        IsNull(rg.copy(pattern = pruneCaptures(rg.pattern, _ => false)._1))
    }
}

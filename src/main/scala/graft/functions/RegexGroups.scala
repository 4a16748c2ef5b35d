package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fully-anchored regex match returning all capturing groups as
 * `array<string>`, or NULL when the line does not match.
 *
 * This is the single non-builtin expression in the log-parse hot path:
 * one compiled-regex execution per line yields every field value; all
 * downstream typing is built-in codegen'd expressions. Mirrors the
 * behavior of the reference's per-line RE2 FullMatch
 * (reference: src/httpd_log_format_parser.cpp:791-827) as a Catalyst
 * `Expression` with `doGenCode` so it stays inside whole-stage codegen.
 *
 * The pattern is a plan-time constant: compiled once on the driver,
 * shipped to executors via the expression's reference objects.
 */
case class RegexGroups(child: Expression, pattern: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regex_groups"

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  @transient private lazy val groupCount: Int =
    compiled.matcher("").groupCount()

  override protected def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.matches()) null
    else {
      val n = groupCount
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("pattern", compiled, classOf[java.util.regex.Pattern].getName)
    // one Matcher per task, reset per row — avoids a per-row allocation
    // of the Matcher's internal group arrays in the hot loop
    val m = ctx.addMutableState(
      classOf[java.util.regex.Matcher].getName, "regexGroupsMatcher",
      v => s"$v = $patternRef.matcher(\"\");")
    val nGroups = ctx.freshName("nGroups")
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val g = ctx.freshName("g")
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |$m.reset($input.toString());
         |if ($m.matches()) {
         |  int $nGroups = $m.groupCount();
         |  Object[] $arr = new Object[$nGroups];
         |  for (int $i = 0; $i < $nGroups; $i++) {
         |    String $g = $m.group($i + 1);
         |    $arr[$i] = ($g == null) ? null
         |      : org.apache.spark.unsafe.types.UTF8String.fromString($g);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroups =
    copy(child = newChild)
}

object RegexGroups {
  /** Column API: `regexGroups($"value", "^(\\S+) ...")`. */
  def apply(line: Column, pattern: String): Column =
    Shim.column(RegexGroups(Shim.expression(line), pattern))
}

/**
 * Non-null child → single-element array; null child → null. Feeding
 * `explode(SingletonArray(x))` drops null-x rows while emitting x
 * EXACTLY ONCE per row — the single-evaluation row filter.
 *
 * Why not `filter(isnotnull(x))`: both PushDownPredicates (logical)
 * and PhysicalOperation/ScanOperation (physical planning) inline the
 * producing alias straight into the filter condition, so an expensive
 * x — the per-line [[RegexGroups]] match — runs TWICE per row (once to
 * validate, once to extract; measured 1.49 s vs the 1.0 s single-match
 * floor on 10M log lines). A Generate is a barrier for both, and
 * `when(isnotnull(x), array(x))` would re-evaluate x anyway (codegen
 * CSE skips conditional branches).
 */
case class SingletonArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "singleton_array"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Array(input))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[] { $c })")
  override protected def withNewChildInternal(newChild: Expression): SingletonArray =
    copy(child = newChild)
}

object SingletonArray {
  def apply(c: Column): Column = Shim.column(SingletonArray(Shim.expression(c)))
}

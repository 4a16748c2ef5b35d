package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to `private[sql]` Column<->Expression converters in Spark 4.x.
 * Declared inside the `org.apache.spark.sql` package namespace so the
 * `private[sql]` members of `org.apache.spark.sql.classic.ExpressionUtils`
 * are visible; this is the standard extension-library pattern for building
 * `Column`s from custom Catalyst `Expression`s.
 */
object Shim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Eagerly converts a Column's node tree to a Catalyst expression
   * tree (builtins become UnresolvedFunction nodes the analyzer then
   * resolves). `ExpressionUtils.expression` instead wraps lazily in a
   * `ColumnNodeExpression`, which never resolves when returned from a
   * FunctionRegistry builder — use this for SQL function registration
   * of Column-composed functions. */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Runtime registration of a SQL table-valued function (the config-free
   * sibling of `SparkSessionExtensions.injectTableFunction`). */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Runtime registration of a scalar SQL function backed by a Catalyst
   * Expression builder. */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** The analyzed logical plan of a DataFrame (for TVF plan builders). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].queryExecution.analyzed

  /** Whether the session's CacheManager holds no cached plans — the
   * `graft.operators.Scoped` leak assertion (sharedState is
   * private[sql]). */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}

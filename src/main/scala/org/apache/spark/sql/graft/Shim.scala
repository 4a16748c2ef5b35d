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
}

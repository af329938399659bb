package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin public bridge over Spark's `private[sql]` Column <-> Expression
  * conversions, for building Catalyst expression trees (e.g. binding the
  * conversion-program symbol `x`) from engine code outside the
  * org.apache.spark.sql package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression conversions —
  * the supported pattern for libraries registering native expressions
  * (same access path SparkSessionExtensions-registered functions use
  * internally). Lives under org.apache.spark.sql to satisfy the
  * package-private qualifier. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

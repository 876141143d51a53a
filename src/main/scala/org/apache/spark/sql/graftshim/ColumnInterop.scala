package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the engine's custom Catalyst expressions and the
  * Spark 4 Column API. Since Spark 4, `Column` wraps a `ColumnNode`
  * and the Expression accessors live in `private[sql]`
  * `org.apache.spark.sql.classic.ExpressionUtils` — this shim sits in
  * the sql package tree solely to re-export those two conversions.
  */
object ColumnInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

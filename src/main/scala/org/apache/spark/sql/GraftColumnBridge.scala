package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column<->Expression converters — the
  * standard shim every Spark-extension library ships so custom Catalyst
  * `Expression`s compose with the public Column API (Spark 4 moved the
  * old `new Column(expr)` constructor behind classic.ExpressionUtils).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

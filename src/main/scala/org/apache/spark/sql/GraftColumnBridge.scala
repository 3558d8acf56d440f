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

/** Bridge into `private[sql] SparkSession.cloneSession()` — an isolated
  * session sharing the SparkContext and cached data but with its OWN
  * copy of the runtime SQLConf and temp-view catalog. This is exactly
  * what Structured Streaming does internally at query start; exposing
  * it lets a caller scope a conf override (state-store partition
  * sizing) to one stream WITHOUT mutating the shared session — the
  * mutate-then-restore alternative races with concurrent starts and
  * leaks the scoped value to unrelated queries started in the window. */
object GraftSessionBridge {
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}

/** Bridge into the `private[sql]` SQL status store — the data behind the
  * UI's SQL tab (per-execution physical-plan graphs with per-operator
  * metrics). The headless sandbox has no UI; this is how the profiling
  * harness (graft.tools.SqlProf) attributes wall time to OPERATORS
  * instead of anonymous broadcast-thread stages. */
object GraftSqlStatusBridge {
  def statusStore(spark: SparkSession)
      : org.apache.spark.sql.execution.ui.SQLAppStatusStore =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.statusStore
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single latest right
  * row with the same key and right time <= left time. The standard
  * event-stream / feature-store lookup ("what was the last known state of
  * X when this event happened"); Spark has no native operator for it.
  *
  * Implementation is the merge-sorted union, NOT a range join: both sides
  * are tagged and unioned, then one window pass per key (ordered by time,
  * right rows sorting before left rows at equal timestamps — inclusive
  * `<=` semantics, matching DuckDB/kdb ASOF) carries the most recent
  * right-side payload forward into each left row.
  *
  * Scale shape: ONE co-partitioned shuffle per side on the join key and a
  * linear in-partition sort — no per-row range probe, no interval
  * cross-product, no broadcast requirement. Skewed keys are ordinary
  * window skew (salt or split upstream if one key dominates). This is the
  * plan a 100TB event/feature backfill wants: cost is sort-merge, output
  * cardinality is exactly |left|.
  *
  * Right-side rows must be unique per (key, time) — pre-aggregate
  * otherwise (equal-timestamp duplicates have no defined "latest").
  */
object AsofJoin {

  /** Left as-of join. `rightCols` are the right-side payload columns to
    * carry (nulled when no right row is at-or-before the left time).
    * Output: every left column, then `rightCols`; exactly one row per
    * left row. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val leftOut = left.columns.toSeq
    require(!leftOut.exists(rightCols.contains),
      s"right payload columns ${rightCols.intersect(leftOut)} collide with left columns")
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"),
      struct(rightCols.map(col): _*).as("__rv"))
    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +:
        lit(1).as("__side") +: leftOut.map(col)): _*)
    // right rows order BEFORE left rows at the same timestamp, so an
    // exactly-simultaneous right row is visible to the left row (<=)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftOut.map(col) ++
        rightCols.map(c => col("__asof").getField(c).as(c)): _*)
  }
}

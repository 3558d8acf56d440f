package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over a BATCH table — the batch twin of
  * [[graft.streaming.Incremental.sessionize]] (flatMapGroupsWithState):
  * same session semantics (a session closes when the next event for the
  * key is more than `gap` after the previous one), expressed as two
  * Catalyst window passes instead of custom state, so a backfill over
  * historical events produces the sessions the live stream would have.
  *
  * Scale shape: ONE shuffle on the session key — both windows and the
  * final group-by share the (key, time) partitioning/sort, so Catalyst
  * plans a single exchange + sort and the session assignment and rollup
  * run within it. No state store, no driver involvement; per-key event
  * counts bound window memory (a hot key's events sort within one
  * partition — salt upstream if one key carries a visible fraction of
  * 100 TB).
  *
  * Determinism under timestamp ties: equal-time events see a 0 gap in
  * whichever order the sort breaks the tie, and the cumulative session
  * counter uses the default RANGE frame (peers share a value), so session
  * boundaries — and the rollup — are tie-order-independent.
  */
object Sessionize {

  /** Per-event session assignment: input plus a `session_seq` column
    * (1-based, per key, in time order). `tsCol` must be a numeric
    * time column (epoch micros/millis — same unit as `gap`). */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    // withColumn REPLACES an existing column — reject rather than
    // silently overwrite user data (same reserved-name discipline as
    // RangeJoin's __bin check)
    require(!df.columns.contains("session_seq"),
      "input already has a 'session_seq' column; rename it before assign()")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val isNew: Column = {
      val prev = lag(col(tsCol), 1).over(w)
      when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    }
    // RANGE-framed running sum (the orderBy default): peers at one
    // timestamp share the counter value, keeping ties deterministic
    df.withColumn("session_seq", sum(isNew).over(w))
  }

  /** Closed sessions: one row per (key, session) with start/end/count —
    * the shape the streaming sessionize emits. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    val reserved = Seq("start_ts", "end_ts", "n_events").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has reserved column(s) ${reserved.mkString(", ")}; " +
        "rename before sessions()")
    assign(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
  }
}

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

  /** Hot-key-safe twin of [[sessions]]: identical output (for non-null
    * timestamps — null-time rows DROP here, see localSessions), but no
    * single partition ever sorts one key's full event history. [[sessions]]
    * partitions the window by key alone, so a key carrying a visible
    * fraction of the corpus (one bot account in 100 TB of events) sorts
    * on one partition. Here events first split into gap-safe TIME
    * sub-ranges of `rangeWidth` — the salting m10's salted-count uses,
    * keyed by time so boundary reconciliation stays exact — and
    * sessionize within (key, range); then the per-range session stubs
    * (one row per local session, ~events/range_width + sessions rows per
    * key, not events) merge across boundaries with the same gap rule and
    * renumber. Two window passes, both bounded: (key, range) for events,
    * key for stubs.
    *
    * Exactness: ranges partition time, so per key the local session
    * intervals are disjoint and ordered; merging adjacent stubs when
    * `start - prev_end <= gap` reconstructs exactly the sessions the
    * unsalted pass finds (sessions crossing several ranges merge down
    * the chain). Pick `rangeWidth >> gap` (e.g. a day for a 30-min gap)
    * so few sessions straddle boundaries; correctness holds for any
    * positive width. */
  def sessionsSalted(df: DataFrame, keyCol: String, tsCol: String, gap: Long,
                     rangeWidth: Long): DataFrame =
    mergedStubs(localSessions(df, keyCol, tsCol, gap, rangeWidth),
        keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col("__s")).as("start_ts"), max(col("__e")).as("end_ts"),
        sum(col("__n")).as("n_events"))

  /** Hot-key-safe twin of [[assign]]: the per-event `session_seq`, with
    * the same two-phase split as [[sessionsSalted]] — events sessionize
    * within (key, time-range), stub sessions merge/renumber globally,
    * and the merged numbering joins back to events on the
    * (key, range, local-session) triple. One equi-join more than the
    * unsalted form, but the only key-global pass runs over session
    * stubs, never the hot key's event history. */
  def assignSalted(df: DataFrame, keyCol: String, tsCol: String, gap: Long,
                   rangeWidth: Long): DataFrame = {
    // The event-level window runs ONCE (inside the stub build); events
    // then re-join the merged stubs by (key, range) with an interval
    // containment filter — within one (key, range) the stub intervals
    // are disjoint and cover their own events, so each event matches
    // exactly one stub. This keeps the operator cache-free (no persisted
    // frame outlives the call) at the cost of one equi-join, whose key
    // the range salt keeps hot-key-safe.
    val stubs = mergedStubs(
        localSessions(df, keyCol, tsCol, gap, rangeWidth), keyCol, tsCol, gap)
      .select(col(keyCol), col("__rng"), col("__s"), col("__e"),
        col("session_seq"))
    df.where(col(tsCol).isNotNull) // same null-drop rule as the stub side
      .withColumn("__rng", RangeJoin.floorDiv(col(tsCol), rangeWidth))
      .join(stubs, Seq(keyCol, "__rng"))
      .where(col(tsCol) >= col("__s") && col(tsCol) <= col("__e"))
      .drop("__rng", "__s", "__e")
  }

  /** Phase 1 of the salted pass: per-event (key, time-range) local
    * session ids — the hot key's events spread over ranges, so no
    * partition sees its full history. */
  private def localSessions(df: DataFrame, keyCol: String, tsCol: String,
                            gap: Long, rangeWidth: Long): DataFrame = {
    require(rangeWidth > 0, s"rangeWidth must be positive: $rangeWidth")
    val reserved =
      Seq("session_seq", "start_ts", "end_ts", "n_events",
        "__rng", "__ls", "__s", "__e", "__n")
        .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has reserved column(s) ${reserved.mkString(", ")}; " +
        "rename before the salted sessionize")
    // null timestamps DROP (SQL comparison semantics, like RangeJoin's
    // null bounds): a null time has no range and no gap relation. The
    // unsalted assign() instead sorts nulls first within the key —
    // filter or impute upstream if null-time events must be kept.
    val ranged = df.where(col(tsCol).isNotNull).withColumn("__rng",
      RangeJoin.floorDiv(col(tsCol), rangeWidth))
    val w1 = Window.partitionBy(col(keyCol), col("__rng")).orderBy(col(tsCol))
    val isNewLocal: Column = {
      val prev = lag(col(tsCol), 1).over(w1)
      when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    }
    ranged.withColumn("__ls", sum(isNewLocal).over(w1))
  }

  /** Phase 2 over the phase-1 frame: one row per LOCAL session carrying
    * its merged global `session_seq` — the classic sorted-disjoint
    * interval merge (ranges partition time, so per key the local session
    * intervals are disjoint and ordered by start). */
  private def mergedStubs(local: DataFrame, keyCol: String, tsCol: String,
                          gap: Long): DataFrame = {
    val stubs = local
      .groupBy(col(keyCol), col("__rng"), col("__ls"))
      .agg(min(col(tsCol)).as("__s"), max(col(tsCol)).as("__e"),
        count(lit(1)).as("__n"))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("__s"))
    val isNewMerged: Column = {
      val prevEnd = lag(col("__e"), 1).over(w2)
      when(prevEnd.isNull || col("__s") - prevEnd > gap, 1L).otherwise(0L)
    }
    stubs.withColumn("session_seq", sum(isNewMerged).over(w2))
  }
}

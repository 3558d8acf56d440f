package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized grouped-aggregate state —
  * the generic statement of what the reference's incremental ingestion
  * model does per run (process only the new work unit, never rescan
  * history: `common/sources/hive/HiveSource.java` reads the partitions
  * past the checkpoint and downstream state absorbs them), and the
  * closed-form-merge pattern graft already uses for BM25 df/N/Σdl
  * ([[graft.llm.Ingest.appendBm25Snapshot]]) generalized to ANY
  * count/sum/min/max dashboard or feature table.
  *
  * The state shape is the canonical decomposable-aggregate layout:
  * group keys + `n` (count) + `sum_<c>` / `min_<c>` / `max_<c>` per
  * tracked measure. [[aggState]] builds it from raw facts; [[mergeAggState]]
  * folds a DELTA state (the same layout over just the new batch) into
  * it: counts and sums add, mins/maxes take least/greatest. The merge
  * invariant — `mergeAggState(aggState(a), aggState(b)) ==
  * aggState(a ∪ b)` — holds exactly for these aggregates (they are
  * commutative monoids; averages derive as sum/n downstream). DELETIONS
  * are deliberately out of scope: min/max are not decrement-safe — a
  * retraction path must re-aggregate the affected groups (the
  * [[graft.llm.Takedown]] family's rebuild discipline).
  *
  * Scale shape: the merge is ONE full-outer join on the group keys —
  * the delta side is batch-sized and broadcasts (Spark supports
  * broadcast full-outer with the small side built); the state side
  * never reshuffles when it is stored bucketed/partitioned by the
  * keys. A 100 TB fact history never rescans: per-batch cost is
  * agg(delta) + |state| map-through.
  */
object AggMaintenance {

  private def stateCols(sumCols: Seq[String], minCols: Seq[String],
                        maxCols: Seq[String]): Seq[String] =
    sumCols.map("sum_" + _) ++ minCols.map("min_" + _) ++
      maxCols.map("max_" + _)

  /** The canonical aggregate state of `facts`: one row per key with
    * `n` + the requested per-measure sums/mins/maxes. */
  def aggState(facts: DataFrame, keyCols: Seq[String],
               sumCols: Seq[String] = Seq.empty,
               minCols: Seq[String] = Seq.empty,
               maxCols: Seq[String] = Seq.empty): DataFrame = {
    require(keyCols.nonEmpty, "aggState needs at least one key column")
    val aggs: Seq[Column] =
      sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c"))
    facts.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Fold `delta` (an [[aggState]] over just the new facts) into
    * `state`: groups in both merge element-wise, groups in one side
    * pass through. The result is exactly `aggState(old facts ∪ new
    * facts)` — the invariant the m57 oracle states. */
  def mergeAggState(state: DataFrame, delta: DataFrame,
                    keyCols: Seq[String],
                    sumCols: Seq[String] = Seq.empty,
                    minCols: Seq[String] = Seq.empty,
                    maxCols: Seq[String] = Seq.empty): DataFrame = {
    val cols = stateCols(sumCols, minCols, maxCols)
    val expect = (keyCols ++ ("n" +: cols)).toSet
    for (side <- Seq(state, delta))
      require(side.columns.toSet == expect,
        s"state layout mismatch: got [${side.columns.mkString(", ")}], " +
          s"expected [${expect.mkString(", ")}]")
    // null-safe element-wise merge: a one-sided group keeps its own
    // value (never a fabricated zero — min/max have no identity element
    // representable here, and sums must keep their exact input type)
    def merged(c: String, combine: (Column, Column) => Column): Column = {
      val (a, b) = (col(s"s.$c"), col(s"d.$c"))
      when(a.isNull, b).when(b.isNull, a).otherwise(combine(a, b)).as(c)
    }
    val outCols: Seq[Column] =
      keyCols.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k)) ++
        Seq(merged("n", _ + _)) ++
        sumCols.map(c => merged(s"sum_$c", _ + _)) ++
        minCols.map(c => merged(s"min_$c", least(_, _))) ++
        maxCols.map(c => merged(s"max_$c", greatest(_, _)))
    state.as("s").join(delta.as("d"),
        keyCols.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _),
        "full_outer")
      .select(outCols: _*)
  }
}

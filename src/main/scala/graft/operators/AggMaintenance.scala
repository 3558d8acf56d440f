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

  /** RETRACTION-AWARE maintenance: fold a CDC batch of fact-level
    * inserts AND deletes into the state — the case [[mergeAggState]]
    * documents out of scope (min/max are not decrement-safe) and the
    * one a changelog-fed pipeline hits on day one (the engine's own
    * upsert family makes `D` events first-class,
    * [[Upsert.applyChangelog]]).
    *
    * `changes` carries the key + measure columns plus `opCol` ∈
    * {"I", "D"} (plus "U" when `beforeImage` is given — native update
    * events, see the param doc); a `D` row must state the FULL deleted row image
    * (key + exact measure values) — the standard CDC before-image
    * contract, and what makes count/sum decrements closed-form.
    * `facts` is the POST-APPLY fact table (base after the changelog
    * landed) and is read ONLY to rebuild min/max for delete-touched
    * keys; it is call-by-name, so a count/sum-only state (no
    * min/max columns) folds deletes with ZERO fact reads.
    *
    * The standard split, per aggregate class:
    *  - count/sum: exact closed form for every key — inserts add,
    *    deletes subtract — in ONE aggregate over the change batch
    *    (min/max fold inserts in the same pass via null-skipping
    *    `min(when(op='I', v))`). Keys whose count reaches 0 drop
    *    from the state (the fully-deleted key vanishes, exactly as
    *    a from-scratch aggregate would omit it).
    *  - min/max: decrements don't invert, so the keys touched by a
    *    DELETE — and only those — rebuild their min/max from `facts`
    *    via a broadcast left-semi join (cost ∝ the touched keys'
    *    fact rows, the closed-form-repair discipline of the takedown
    *    family; a delete-free batch skips the rebuild plan entirely,
    *    and AQE's empty-relation propagation collapses the fact scan
    *    when the batch turns out delete-free at runtime). Untouched
    *    keys never rejoin facts and pass through BYTE-IDENTICAL.
    *
    * Invariant (the m60 oracle states it): the result ==
    * `aggState(facts)` whenever `state == aggState(pre-apply facts)`
    * and `changes` is consistent (deletes state rows that existed,
    * inserts rows that landed). An inconsistent log — a delete whose
    * image never existed — is NOT detectable in closed form and
    * corrupts sums silently; the guard here drops keys whose count
    * goes non-positive, and the full-image contract is the caller's
    * (the same trust [[Upsert.applyChangelog]] places in its log).
    *
    * Scale shape: one map-side-combined aggregate over the (small)
    * change batch, one full-outer merge riding the state's key
    * partitioning, and a fact scan FILTERED to delete-touched keys
    * (on a key-partitioned/bucketed fact layout that scan prunes to
    * the touched partitions). A 100 TB history is never rescanned. */
  /** @param deletesPresent caller's knowledge of whether `changes`
    *        carries any `D` (or, with `beforeImage`, `U`) row. `None`
    *        (default) = unknown: the
    *        min/max repair plan is built and AQE's empty-relation
    *        propagation collapses the fact scan at runtime if the batch
    *        turns out delete-free. `Some(false)` = the caller KNOWS the
    *        batch is insert-only (e.g. it already collected the batch's
    *        op set): the repair branch is skipped entirely and `facts`
    *        is NEVER forced — the plan provably cannot touch the fact
    *        table (spec-pinned with a throwing thunk). `Some(true)`
    *        behaves like `None` but documents intent.
    * @param beforeImage when Some(f), op `U` (update) is accepted as a
    *        FIRST-CLASS event carrying both images in ONE row: the
    *        normal measure columns hold the AFTER image and `f(c)`
    *        names the BEFORE image of sum column `c` (e.g.
    *        `c => col(c + "_before")`). Decomposition is internal and
    *        closed-form — n is untouched (U moves no row in or out),
    *        each sum shifts by `after − before` in the same single
    *        aggregate, the after image folds into the delta min/max,
    *        and the before image's possible min/max ownership is
    *        repaired from `facts` exactly like a delete (U keys join
    *        the repair set) — so an update-heavy changelog (the m55
    *        world) never doubles into D+I rows upstream. A `U` must
    *        NOT move the row across `keyCols` (a key-moving update is
    *        two changes — D at the old key + I at the new — and only
    *        the caller can know both keys); before images are only
    *        needed for `sumCols` (min/max repair reads facts, never
    *        the before image). When None (default), `U` fails fast
    *        like any unknown op. */
  def applyChangesToAggState(state: DataFrame, changes: DataFrame,
                             facts: => DataFrame,
                             keyCols: Seq[String],
                             sumCols: Seq[String] = Seq.empty,
                             minCols: Seq[String] = Seq.empty,
                             maxCols: Seq[String] = Seq.empty,
                             opCol: String = "op",
                             deletesPresent: Option[Boolean] = None,
                             beforeImage: Option[String => Column] = None)
      : DataFrame = {
    require(keyCols.nonEmpty, "applyChangesToAggState needs key columns")
    // fail fast on an unknown op — a silent 0-signed row would
    // corrupt counts; raise_error rides the row pipeline, so a clean
    // batch pays nothing. A LYING deletesPresent=Some(false) fails the
    // same way when min/max columns are tracked: the repair branch is
    // skipped on the caller's word, so a D row sneaking through would
    // apply the count/sum decrements but serve STALE min/max with no
    // detectable error — make the D branch itself raise instead
    // (zero cost for a truly delete-free batch: the branch never takes).
    val lying = deletesPresent.contains(false) &&
      (minCols.nonEmpty || maxCols.nonEmpty)
    def lieError(op: String): Column = raise_error(lit(
      s"applyChangesToAggState: deletesPresent=Some(false) but a '$op' " +
        "row is present while min/max columns are tracked — the " +
        "skipped repair would serve stale min/max; pass None/Some(true)"))
      .cast("long")
    val dBranch: Column = if (lying) lieError("D") else lit(-1L)
    val okOps = if (beforeImage.isDefined) "'I', 'D' or 'U'" else "'I' or 'D'"
    val sgnBase = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", dBranch)
    // U: a row moves neither in nor out — n contribution 0 (and the
    // same lying-caller guard: its before image may own the min/max)
    val sgn = beforeImage.fold(sgnBase)(_ => sgnBase.when(
        col(opCol) === "U", if (lying) lieError("U") else lit(0L)))
      .otherwise(raise_error(concat(
        lit(s"applyChangesToAggState: $opCol must be $okOps, got '"),
        col(opCol).cast("string"), lit("'"))))
    // ONE aggregate builds the whole delta: signed n/sums (exact
    // closed form over I and D; U shifts each sum by after − before),
    // after-image min/max (null-skipping conditional aggregates — a D
    // row contributes nothing here, a U contributes its after image)
    def sumContrib(c: String): Column = beforeImage match {
      case Some(f) =>
        // a NULL before image on a U row would make the shift NULL and
        // the sum silently skip it — fail loudly instead (rides the
        // row pipeline; a well-formed batch pays nothing)
        val before = when(f(c).isNull, raise_error(lit(
          s"applyChangesToAggState: before image of '$c' is NULL on a " +
            "'U' row — updates must carry the full before image")))
          .otherwise(f(c))
        when(col(opCol) === "U", col(c) - before)
          .otherwise(col(c) * col("__sgn"))
      case None => col(c) * col("__sgn")
    }
    val aggs: Seq[Column] =
      sumCols.map(c => sum(sumContrib(c)).as(s"sum_$c")) ++
        minCols.map(c =>
          min(when(col("__sgn") =!= -1L, col(c))).as(s"min_$c")) ++
        maxCols.map(c =>
          max(when(col("__sgn") =!= -1L, col(c))).as(s"max_$c"))
    val delta = changes.withColumn("__sgn", sgn)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sgn")).as("n"), aggs: _*)
    val merged = mergeAggState(state, delta, keyCols,
      sumCols, minCols, maxCols)
      // a key folded to zero rows is GONE, exactly as aggState over
      // the post-apply facts would omit it (n < 0 = inconsistent log;
      // dropping is the least-wrong recovery and keeps the invariant
      // for every consistent key)
      .where(col("n") > 0L)
    if ((minCols.isEmpty && maxCols.isEmpty) ||
        deletesPresent.contains(false)) merged
    else {
      // min/max repair: ONLY delete/update-touched keys rebuild from
      // facts (a U's before image may have owned the min/max)
      val repairOps = if (beforeImage.isDefined) Seq("D", "U") else Seq("D")
      val delKeys = changes.where(col(opCol).isin(repairOps: _*))
        .select(keyCols.map(col): _*).distinct()
      val rebuiltAggs: Seq[Column] =
        minCols.map(c => min(col(c)).as(s"__rb_min_$c")) ++
          maxCols.map(c => max(col(c)).as(s"__rb_max_$c"))
      val rebuilt = facts
        .join(broadcast(delKeys), keyCols, "left_semi")
        .groupBy(keyCols.map(col): _*)
        .agg(lit(true).as("__rb"), rebuiltAggs: _*)
      val spliced: Seq[Column] =
        (keyCols ++ Seq("n") ++ sumCols.map("sum_" + _)).map(col) ++
          minCols.map(c => when(col("__rb"), col(s"__rb_min_$c"))
            .otherwise(col(s"min_$c")).as(s"min_$c")) ++
          maxCols.map(c => when(col("__rb"), col(s"__rb_max_$c"))
            .otherwise(col(s"max_$c")).as(s"max_$c"))
      merged.join(broadcast(rebuilt), keyCols, "left")
        .withColumn("__rb", coalesce(col("__rb"), lit(false)))
        .select(spliced: _*)
    }
  }
}

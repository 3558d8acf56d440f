package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch upsert/merge semantics — the table-maintenance family the
  * reference drives through its Hudi sink op modes (INSERT / UPSERT /
  * DEDUP_INSERT, `common/sinks/hoodie/HoodieSink.java:299-311,420-437,
  * 533-545`), re-expressed as engine-level DataFrame transforms so the
  * semantics are queryable and testable without a table-format jar:
  *
  *  - [[applyChangelog]]: latest-wins CDC apply — fold a change log
  *    (insert/update/delete events with a per-key sequence) into a base
  *    snapshot. This is the batch statement of merge-on-read
  *    compaction: the log is Hudi's delta files, the base the columnar
  *    snapshot, and "row_number() = 1 per key by sequence desc" exactly
  *    the payload-combine the reference's upsert path delegates to its
  *    record payload class.
  *  - [[scd2Merge]]: slowly-changing-dimension type-2 maintenance —
  *    close the current row of every key whose tracked attributes
  *    actually changed and insert the new version, keeping full
  *    history. The no-op-update filter matters at scale: a daily full
  *    dimension re-extract re-states every row, and versioning
  *    unchanged rows would grow the dimension by |dim| per day.
  *
  * Scale shape (both): the mutation side (changelog / update batch) is
  * small next to the base table by construction — every join against it
  * broadcasts under AQE's threshold, the only window runs over the
  * mutation side (never the base), and the base table itself is touched
  * by exactly one scan feeding an anti-join/union (no base-side shuffle
  * when the mutation side broadcasts). A 100 TB base with a 10 GB daily
  * log costs one pass over the base plus log-sized work.
  */
object Upsert {

  /** Fold a changelog into `base`, latest event per key winning.
    *
    * `log` carries `base`'s columns plus `opCol` (`"U"` upsert /
    * `"D"` delete) and `seqCol` (monotone per key: commit time, LSN…).
    * For each key, only the highest-sequence event applies: `U` lands
    * the event's row image, `D` removes the key. Keys untouched by the
    * log copy through. Ties on (key, seq) break by op descending
    * (`U` over `D`) then deterministically by the row image — but a
    * well-formed log never ties: sequence is unique per key.
    */
  def applyChangelog(base: DataFrame, log: DataFrame, keyCols: Seq[String],
                     seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val dataCols = base.columns.toSeq
    require(!dataCols.contains(seqCol) && !dataCols.contains(opCol),
      s"base must not carry the log's control columns ($seqCol, $opCol)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    // anti-join on the touched keys (broadcasts when the log is small),
    // then append the surviving latest row images
    base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(latest.where(col(opCol) =!= "D")
        .select(dataCols.map(col): _*))
  }

  /** SCD type-2 merge: apply an update batch to a versioned dimension.
    *
    * `dim` carries the key, the tracked attribute columns, and the
    * versioning triple (`validFromCol`, `validToCol`, `currentCol`);
    * `updates` carries the key and the NEW tracked attribute values
    * (one row per key — a batch re-stating a key twice is ill-formed
    * and fails fast). A key whose update differs from its current row
    * on ANY tracked column (null-safe compare) closes the current row
    * at `effectiveDate` and inserts the new version open-ended; a key
    * with no current row inserts fresh (first sight or re-activation);
    * an update identical to the current row is a NO-OP — history rows
    * and unchanged keys copy through byte-identical.
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame,
                keyCols: Seq[String], trackedCols: Seq[String],
                effectiveDate: Long,
                validFromCol: String = "valid_from",
                validToCol: String = "valid_to",
                currentCol: String = "is_current",
                openEnd: Long = 99999999L): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty,
      "scd2Merge needs key and tracked columns")
    require(effectiveDate < openEnd,
      s"effectiveDate $effectiveDate must precede the open-end sentinel $openEnd")
    val u = updates.select((keyCols ++ trackedCols).map(col): _*)
    // an ill-formed batch re-stating a key would insert TWO open rows —
    // the one corruption SCD2 can't repair later; the batch is small,
    // so the guard is one cheap job over it
    require(u.groupBy(keyCols.map(col): _*).count()
      .where(col("count") > 1).limit(1).count() == 0L,
      "scd2Merge: update batch states a key more than once")
    val cur = dim.where(col(currentCol))
    val joined = u.as("u").join(cur.as("c"),
      keyCols.map(k => col(s"u.$k") === col(s"c.$k")).reduce(_ && _), "left")
    val differs: Column = trackedCols
      .map(t => !(col(s"u.$t") <=> col(s"c.$t"))).reduce(_ || _)
    // the update rows that actually take effect: new keys or real changes
    val effective = joined
      .where(col(s"c.${keyCols.head}").isNull || differs)
      .select((keyCols ++ trackedCols).map(n => col(s"u.$n").as(n)): _*)
    val changedKeys = effective.select(keyCols.map(col): _*)
      .withColumn("__chg", lit(true))
    val marked = dim.join(changedKeys, keyCols, "left")
    val carry = marked.where(!col(currentCol) || col("__chg").isNull)
      .drop("__chg")
    val closed = marked.where(col(currentCol) && col("__chg").isNotNull)
      .drop("__chg")
      .withColumn(validToCol, lit(effectiveDate))
      .withColumn(currentCol, lit(false))
    val inserts = effective
      .withColumn(validFromCol, lit(effectiveDate))
      .withColumn(validToCol, lit(openEnd))
      .withColumn(currentCol, lit(true))
    carry.unionByName(closed)
      .unionByName(inserts.select(dim.columns.map(col).toSeq: _*))
  }
}

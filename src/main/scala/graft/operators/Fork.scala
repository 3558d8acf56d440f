package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-way split ("fork") — the reference's signature operator
  * (reference: common/forkoperator/ForkOperator.java:71-123 and
  * ForkFunction.java:45-93): tag every record with >=0 integer keys,
  * materialize ONCE, then serve per-key filtered views plus per-key counts.
  *
  * Spark-first design: the tag set is an `array<int>` column; the input is
  * persisted (DISK_ONLY by default, matching the reference's
  * `marmaray.fork.persist_level`) and forced, then each stream is a
  * `array_contains` filter over the persisted plan. A record may carry
  * several keys (overlapping splits), so this is NOT randomSplit/partition.
  *
  * At scale: one source materialization feeds N output streams — the
  * alternative (N separate scans) re-reads the source N times, which at
  * 100TB is the difference between one pass and N passes. Counts come from
  * the same materializing action (no extra job per stream).
  */
final class Fork private (tagged: DataFrame, keys: Seq[Int],
                          counts: Map[Int, Long], total: Long) {
  /** Records tagged with `key`. Unregistered key => error, matching
    * ForkFunction.java:76-84. */
  def stream(key: Int): DataFrame = {
    require(keys.contains(key), s"fork key $key was never registered (have $keys)")
    tagged.filter(array_contains(col(Fork.TagCol), key)).drop(Fork.TagCol)
  }
  /** Per-key record count, computed during the single materialization. */
  def count(key: Int): Long = counts.getOrElse(key, 0L)
  /** Total input records (reference ForkOperator.java:79 forced count). */
  def inputCount: Long = total
  def close(): Unit = tagged.unpersist(blocking = true)
}

object Fork {
  val TagCol = "__graft_fork_keys"

  /** Build a fork from (condition -> key) taggers. Each record gets every
    * key whose condition matches. */
  def apply(df: DataFrame, taggers: Seq[(Column, Int)],
            level: StorageLevel = StorageLevel.DISK_ONLY): Fork = {
    val keys = taggers.map(_._2)
    require(keys.distinct.size == keys.size, s"duplicate fork keys: $keys")
    val tagArr = array_compact(array(taggers.map { case (cond, k) =>
      when(cond, lit(k))
    }: _*))
    val tagged = df.withColumn(TagCol, tagArr).persist(level)
    // One aggregate action materializes the persisted plan AND produces all
    // per-key counts (replaces the reference's count() + accumulators).
    val aggs = count(lit(1)).as("__total") +:
      keys.map(k => sum(when(array_contains(col(TagCol), k), 1L).otherwise(0L)).as(s"__k$k"))
    val row = tagged.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getLong(0)
    val counts = keys.zipWithIndex.map { case (k, i) =>
      k -> (if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
    }.toMap
    new Fork(tagged, keys, counts, total)
  }

  /** The canonical valid(0)/error(1) split used by every converter in the
    * reference (AbstractDataConverter.java:64-65,130-171): records with a
    * null `errorCol` are valid. */
  def validErrorSplit(df: DataFrame, errorCol: String,
                      level: StorageLevel = StorageLevel.DISK_ONLY): Fork =
    apply(df, Seq(col(errorCol).isNull -> 0, col(errorCol).isNotNull -> 1), level)
}

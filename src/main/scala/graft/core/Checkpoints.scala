package graft.core

import org.apache.spark.sql.{Dataset, DataFrame}
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-manager storage behind a `localCheckpoint()`ed
  * frame. `Dataset.unpersist()` only reaches the SQL cache manager —
  * a local checkpoint's data lives at the RDD level (the checkpoint
  * materializes `queryExecution.toRdd` with MEMORY_AND_DISK), so an
  * iterative operator that checkpoints a new frame per round and only
  * drops the reference pins N rounds of state until the driver GC +
  * ContextCleaner get around to it. For a loop whose state is
  * meant to be ∝ one round (BPE's word-frequency table, a fixpoint's
  * label frame), that silently turns O(state) into O(rounds × state).
  *
  * [[release]] walks the frame's analyzed plan for the `LogicalRDD`
  * nodes a checkpoint leaves behind and unpersists their backing RDDs
  * directly — a no-op on frames that were never checkpointed. */
object Checkpoints {

  /** Unpersist the RDD blocks behind `df`'s local checkpoint(s).
    * Safe on any never-checkpointed frame (only `LogicalRDD` leaves
    * are touched), but the released frame itself is DEAD afterwards:
    * a local checkpoint truncates lineage, so its data cannot be
    * recomputed once the blocks drop — call this only when every
    * consumer of `df` has run (the PageRank `prev` discipline). */
  def release(df: Dataset[_], blocking: Boolean = true): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking)
      case _ => ()
    }
}

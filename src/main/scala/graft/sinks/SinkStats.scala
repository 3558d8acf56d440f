package graft.sinks

import graft.core.RunState
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Cross-run sink statistics + auto-tuned write parallelism — the
  * reference's SinkStatManager (common/sinks/SinkStatManager.java:
  * MAX_HISTORY_SIZE=8 rolling window of per-run avg record sizes persisted
  * via the metadata manager) and HoodieSink's parallelism calculation
  * (HoodieSink.java:240-250: ceil(numRecords * avgRecordSize /
  * targetFileSize)).
  *
  * At scale this is what keeps output files near the 1GB target as record
  * width drifts: the record size is LEARNED from what previous runs
  * actually wrote (file bytes / rows), not sampled from this run's data.
  */
final class SinkStats(rs: RunState, tableName: String, maxHistory: Int = 8) {
  private val key = s"sink-stat:$tableName"

  /** Avg record sizes (bytes) of the last <= maxHistory runs, oldest first. */
  def history: Seq[Long] =
    rs.get(key).map(_.split(",").toIndexedSeq.flatMap(_.toLongOption)).getOrElse(Nil)

  def isStatHistoryAvailable: Boolean = history.nonEmpty

  /** Mean of the recorded per-run averages (SinkStatManager.getAvgRecordSize). */
  def avgRecordSize: Long = {
    val h = history
    if (h.isEmpty) 0L else h.sum / h.size
  }

  /** Stage this run's observed avg record size (caller commits RunState
    * after sink success, like every other checkpoint). */
  def recordRun(avgRecordSizeBytes: Long): Unit = {
    val h = (history :+ avgRecordSizeBytes).takeRight(maxHistory)
    rs.set(key, h.mkString(","))
  }

  /** Observe bytes-written/record from a finished output directory:
    * driver-side file-status listing only (O(#files) names, no data read). */
  def recordRunFromPath(path: String, numRecords: Long,
                        hadoopConf: Configuration = new Configuration()): Unit = {
    if (numRecords > 0) {
      val p = new Path(path)
      val fs = p.getFileSystem(hadoopConf)
      val bytes = fs.listStatus(p).filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_"))
        .map(_.getLen).sum
      if (bytes > 0) recordRun(bytes / numRecords)
    }
  }
}

object SinkStats {
  /** Parallelism so each task writes ~targetFileSize bytes
    * (HoodieSink.calculateNewBulkInsertParallelism). Returns `fallback`
    * when no history exists (first run). */
  def writeParallelism(numRecords: Long, avgRecordSize: Long,
                       targetFileSize: Long, fallback: Int = 200): Int =
    if (avgRecordSize <= 0) fallback
    else math.max(1,
      math.ceil(numRecords.toDouble * avgRecordSize / math.max(1L, targetFileSize)).toInt)
}

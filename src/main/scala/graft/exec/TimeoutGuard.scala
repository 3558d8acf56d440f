package graft.exec

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Stage-stall watchdog — the reference's TimeoutManager
  * (utilities/listener/TimeoutManager.java:53-54,107-114): a listener
  * tracks per-job-group task progress; a monitor thread cancels any group
  * whose running jobs have made no task progress for `stallTimeoutMs`
  * (hung executor, dead external system) — same `cancelJobGroup` kill the
  * reference uses, scoped to the stuck pipeline only.
  */
final class TimeoutGuard(spark: SparkSession, stallTimeoutMs: Long,
                         checkIntervalMs: Long = 1000L) {

  private val lastProgress = TrieMap.empty[String, Long] // group -> last activity
  private val activeJobs = TrieMap.empty[Int, String]    // jobId -> group
  private val stageGroup = TrieMap.empty[Int, String]    // stageId -> group
  private val cancelledGroups = TrieMap.empty[String, Long]
  @volatile private var running = false

  private val listener = new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val group = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
      if (group.nonEmpty) {
        activeJobs.put(e.jobId, group)
        e.stageIds.foreach(sid => stageGroup.put(sid, group))
        lastProgress.put(group, System.nanoTime())
      }
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      stageGroup.get(e.stageId).foreach(g => lastProgress.put(g, System.nanoTime()))
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      activeJobs.remove(e.jobId).foreach { g =>
        if (!activeJobs.values.exists(_ == g)) lastProgress.remove(g)
      }
    }
  }

  private val monitor = new Thread("graft-timeout-guard") {
    setDaemon(true)
    override def run(): Unit = while (running) {
      val now = System.nanoTime()
      lastProgress.foreach { case (group, last) =>
        if ((now - last) / 1000000 > stallTimeoutMs) {
          cancelledGroups.put(group, System.currentTimeMillis())
          lastProgress.remove(group)
          spark.sparkContext.cancelJobGroup(group)
        }
      }
      Thread.sleep(checkIntervalMs)
    }
  }

  def start(): this.type = {
    spark.sparkContext.addSparkListener(listener)
    running = true
    monitor.start()
    this
  }

  def stop(): Unit = {
    running = false
    spark.sparkContext.removeSparkListener(listener)
  }

  /** Groups this guard killed (for telemetry/post-actions). */
  def cancelled: Map[String, Long] = cancelledGroups.toMap
}

package graft.exec

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.Try

/** Pipeline orchestration — the JobManager/JobDag/ThreadPoolService layer
  * (reference common/job/JobManager.java:190-255, ThreadPoolService.java:52-121,
  * utilities/listener/TimeoutManager.java) reduced to Scala Futures + Spark
  * job groups. Concurrent pipelines share one SparkSession; FAIR scheduling
  * keeps one long pipeline from starving the rest; per-pipeline job groups
  * give targeted cancellation (the reference's watchdog kill).
  */
object Runner {

  final case class PipelineResult(name: String, result: Try[Unit], millis: Long)

  /** Run named pipelines concurrently. Each runs in its own Spark job group
    * and FAIR pool; a timeout cancels just that pipeline's jobs
    * (cancelJobGroup — same API the reference's TimeoutManager uses). */
  def runAll(spark: SparkSession, pipelines: Seq[(String, SparkSession => Unit)],
             parallelism: Int = 6, timeout: Duration = Duration.Inf): Seq[PipelineResult] = {
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // pooled threads don't inherit the caller's driver-event scope —
    // capture it here and re-establish it inside each pipeline task so a
    // scoped caller's drain sees events its pipelines recorded
    val callerScope = graft.core.Metrics.currentScope
    val futures = pipelines.map { case (name, body) =>
      Future {
        val t0 = System.nanoTime()
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        spark.sparkContext.setJobGroup(name, s"graft pipeline $name", interruptOnCancel = true)
        val r = Try {
          try graft.core.Metrics.withScope(callerScope)(body(spark))
          finally spark.sparkContext.clearJobGroup()
        }
        PipelineResult(name, r, (System.nanoTime() - t0) / 1000000)
      }
    }
    // One shared deadline: awaiting sequentially must not grant pipeline N
    // up to N x timeout (each Await's budget is what remains of the global
    // window, never negative).
    val deadline = if (timeout.isFinite) Some(System.nanoTime() + timeout.toNanos) else None
    val guarded = futures.zip(pipelines).map { case (f, (name, _)) =>
      val remaining = deadline.fold(Duration.Inf: Duration) { d =>
        Duration(math.max(0L, d - System.nanoTime()), TimeUnit.NANOSECONDS)
      }
      Try(Await.result(f, remaining)).recover { case e =>
        spark.sparkContext.cancelJobGroup(name)
        PipelineResult(name, scala.util.Failure(e), -1)
      }.get
    }
    pool.shutdown()
    pool.awaitTermination(10, TimeUnit.SECONDS)
    guarded
  }

  /** Post-job actions (reference JobDagActions.java:45,104-117): run after
    * pipelines complete, receiving each pipeline's result. Best-effort —
    * an action failure is reported in the returned seq but never fails the
    * job (the reference logs and continues). */
  def runPostActions(results: Seq[PipelineResult],
                     actions: Seq[PipelineResult => Unit]): Seq[(String, Try[Unit])] =
    for (r <- results; a <- actions) yield r.name -> Try(a(r))

  /** Order pipelines longest-running-first from prior run times — the
    * ExecutionTimeJobExecutionStrategy (reference
    * common/job/ExecutionTimeJobExecutionStrategy.java:65-105). */
  def orderByHistory(pipelines: Seq[(String, SparkSession => Unit)],
                     historyMillis: Map[String, Long]): Seq[(String, SparkSession => Unit)] =
    pipelines.sortBy { case (name, _) => -historyMillis.getOrElse(name, Long.MaxValue) }

  // Execution-history persistence (the JobManagerMetadataTracker role —
  // reference common/metadata/JobManagerMetadataTracker): run times live in
  // RunState alongside the data checkpoints.
  private val HistoryPrefix = "runner:millis:"

  /** Stage successful pipelines' run times (caller commits the RunState). */
  def saveHistory(rs: graft.core.RunState, results: Seq[PipelineResult]): Unit =
    results.filter(r => r.result.isSuccess && r.millis >= 0)
      .foreach(r => rs.set(s"$HistoryPrefix${r.name}", r.millis.toString))

  def loadHistory(rs: graft.core.RunState): Map[String, Long] =
    rs.all.collect {
      case (k, v) if k.startsWith(HistoryPrefix) =>
        k.stripPrefix(HistoryPrefix) -> v.toLong
    }
}

package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job/per-stage time attribution for one declared query — the
  * round-17 "measure first" harness (guide §1): runs the query through
  * the same noop sink the bench times, with a listener that prints every
  * job's wall time, stage task-time totals, and shuffle bytes, so the
  * expensive stage is identifiable without the UI (headless sandbox).
  *
  * Usage: JobProf <sfDir> <query> [repeats]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
    // A/B config hypotheses, same syntax as Bench: ';'-separated k=v
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
        case _ =>
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class JobRec(id: Int, desc: String, t0: Long,
                      var wallMs: Long = -1, var stages: Seq[Int] = Nil)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    case class StageRec(id: Int, name: String, var taskMs: Long = 0,
                        var shufR: Long = 0, var shufW: Long = 0,
                        var inBytes: Long = 0, var tasks: Int = 0,
                        var wallMs: Long = -1, var sub: Long = -1)
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collect) {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, d, e.time,
            stages = e.stageInfos.map(_.stageId))
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collect) {
        jobs.synchronized {
          jobs.get(e.jobId).foreach(j => j.wallMs = e.time - j.t0)
        }
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (collect) stages.synchronized {
          // name from the DETAILS call-site (first user frame) when the
          // short name is an executor-thread frame (broadcast builds all
          // read "withThreadLocalCaptured at CompletableFuture")
          val det = e.stageInfo.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("tools."))
            .getOrElse("").trim
          val nm = e.stageInfo.name.take(50) +
            (if (det.nonEmpty) s" | $det" else "")
          val s = stages.getOrElseUpdate(e.stageInfo.stageId,
            StageRec(e.stageInfo.stageId, nm))
          s.sub = System.currentTimeMillis()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collect) stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId,
            StageRec(e.stageInfo.stageId, e.stageInfo.name))
          if (s.sub > 0) s.wallMs = System.currentTimeMillis() - s.sub
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (collect) {
        val m = e.taskMetrics
        if (m != null) stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageId, StageRec(e.stageId, ""))
          s.taskMs += m.executorRunTime
          s.shufR += m.shuffleReadMetrics.totalBytesRead
          s.shufW += m.shuffleWriteMetrics.bytesWritten
          s.inBytes += m.inputMetrics.bytesRead
          s.tasks += 1
        }
      }
    })

    // warmup run (JIT/codegen, untimed, not collected)
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    val w = run(); reset()
    println(f"warmup: $w%.2fs")
    var best = Double.MaxValue
    for (r <- 1 to repeats) {
      jobs.clear(); stages.clear()
      collect = true
      val dt = run()
      collect = false
      reset()
      println(f"== run $r: $dt%.2fs, ${jobs.size} jobs ==")
      if (dt < best) best = dt
      if (r == repeats) {
        // print jobs over 50ms with their stages
        jobs.values.toSeq.sortBy(-_.wallMs).take(30).foreach { j =>
          println(f"  job ${j.id}%4d ${j.wallMs}%6dms  ${j.desc.take(80)}")
          j.stages.flatMap(stages.get).filter(_.tasks > 0)
            .sortBy(-_.taskMs).take(4).foreach { s =>
              println(f"      stage ${s.id}%5d wall=${s.wallMs}%6dms taskSum=${s.taskMs}%7dms tasks=${s.tasks}%4d " +
                f"in=${s.inBytes / 1024}%7dK shR=${s.shufR / 1024}%7dK shW=${s.shufW / 1024}%7dK  ${s.name.take(140)}")
            }
        }
        val totalTask = stages.values.map(_.taskMs).sum
        val jw = jobs.values.filter(_.wallMs >= 0).map(_.wallMs).sum
        // driver gaps: time between one job's end and the next's start
        // (sequential actions only — concurrent jobs make this negative)
        val sorted = jobs.values.toSeq.sortBy(_.t0)
        val gaps = sorted.sliding(2).collect {
          case Seq(a, b) if a.wallMs >= 0 => b.t0 - (a.t0 + a.wallMs)
        }.filter(_ > 0).sum
        println(f"total task-ms=$totalTask  job-wall-ms=$jw  gap-ms=$gaps  jobs=${jobs.size}  stages-with-tasks=${stages.values.count(_.tasks > 0)}")
      }
    }
    println(f"best: $best%.2fs")
    spark.stop()
  }
}

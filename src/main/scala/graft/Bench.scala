package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Prints ONE JSON line to stdout (raw — build.sbt sets
  * `run / outputStrategy := StdoutOutput` so sbt doesn't prefix it) and
  * also writes it to BENCH_local.json in the cwd (NOT BENCH.json — round
  * 7's ledger collision: the driver's post-round run overwrote the
  * builder's cited local artifact; the local file name plus the
  * provenance stamp keep every run's numbers attributable).
  *
  * Measurement: each query is executed to completion through a `noop`
  * datasource write — unlike `.count()`, which lets Catalyst prune every
  * projection that doesn't affect the row count, a noop write evaluates
  * all output columns (the round-1 harness accidentally benchmarked
  * "scan+count" for projection-only queries). A full warmup pass runs
  * first so JVM/codegen warmup isn't charged to whichever query happens
  * to run first. Failures are recorded per-query and fail the process.
  *
  * Self-defense against ambient load (round 7: a single-shot driver pass
  * showed 2-6x phantom regressions on two contiguous alphabetical blocks
  * that a rerun 20 minutes later fully erased): every query is timed
  * `SPARK_GRAFT_REPEATS` times (default 3) and the headline per-query
  * number is the MEDIAN. Repeats are organized as whole-suite passes —
  * pass 1 runs all queries, then pass 2, then pass 3 — so one query's
  * repeats land many minutes apart and a transient load spike degrades
  * at most one repeat of each query it overlaps, which the median then
  * discards. (Back-to-back repeats of the same query would all fit
  * inside one spike — exactly the failure mode being defended against.)
  * Within each timed pass the suite order is a deterministically-seeded
  * shuffle (seed = pass number): a fixed alphabetical order ran the
  * s-tier last in EVERY pass, so end-of-pass drift survived the median
  * as a phantom band on one tier (round 16's open finding).
  * The JSON keeps `"queries"` = medians for backward compatibility and
  * adds `"min"` + `"repeats"` (all per-pass times, in pass order), plus
  * `"gc_ms_repeats"`/`"pass_wall_secs"` so positional effects are
  * measurable from the artifact itself.
  *
  * JVM hygiene across passes (round 15's one real finding: suite task-GC
  * tripled over three rounds — 153s→294s→604s — with a uniform 1.3-2.5x
  * drift band on small queries in EVERY repeat and pass-3 rows inflating
  * 2-3x, the signature of state accumulating in the one bench JVM over
  * 227 queries x 4 whole-suite passes):
  *  - Each whole-suite pass runs in a FRESH SparkSession (stop + rebuild,
  *    ~2-4s per pass, outside every timed window). That resets the app
  *    status store, listener bus, block manager and file-index caches,
  *    so pass 3 starts from the same driver state as pass 1. The two
  *    JVM-static caches that make warmup worth paying — JIT-compiled
  *    code and Janino's generated-class cache — survive the restart, so
  *    the warmup pass still covers every later pass.
  *  - The app status store is capped tightly (below): even with the UI
  *    off, AppStatusListener + SQLAppStatusListener retain up to 1000
  *    SQL executions BY DEFAULT, each holding the full physical plan
  *    graph — and this suite's iterative operators emit dozens of
  *    executions per query, so within one pass the default retention
  *    pins hundreds of MB of plan strings in old-gen.
  *  - `"pass_gc_ms"` records the suite's summed task GC per pass, so a
  *    recurrence of cross-pass heap creep is readable straight from the
  *    committed artifact (healthy = roughly flat across passes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // Per-query spill/GC telemetry: round-11's one open finding was a
    // bimodal whole-suite mode (d74 at 52s in the driver's gate run vs
    // 4.4-6.3s solo, same HEAD) that the timing artifact alone couldn't
    // explain. Summing executor task metrics per timed query makes the
    // mechanism readable from the committed artifact itself: a slow
    // repeat with spill_bytes exploding is memory-pool pressure; one
    // with gc_ms exploding is heap garbage; neither means ambient load.
    // (Listener delivery is async; attribution may lag by a few tasks —
    // fine for an order-of-magnitude diagnostic.) Counters live outside
    // the session so they span the per-pass session restarts.
    val spillCtr = new java.util.concurrent.atomic.AtomicLong
    val gcCtr = new java.util.concurrent.atomic.AtomicLong

    def newSession(): SparkSession = {
      val builder = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        // bucketed-table queries (m28) saveAsTable into a throwaway warehouse
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
        .config("spark.ui.enabled", "false")
        // status-store retention: the UI is off but the listeners aren't —
        // default retention (1000 SQL executions, each with its full plan
        // graph; 1000 jobs/stages) is the dominant WITHIN-pass heap
        // accumulation for a 227-query suite of multi-execution operators
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "2000")
      // local-iteration conf overrides, ';'-separated (conf VALUES may
      // legitimately contain commas — extraJavaOptions, extensions lists):
      // SPARK_GRAFT_CONF="graft.cc.algorithm=minlabel;spark.sql.shuffle.partitions=64"
      sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
          case _ =>
        }
      })
      val spark = builder.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) {
              spillCtr.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
              gcCtr.addAndGet(m.jvmGCTime)
            }
          }
        })
      spark
    }

    def execute(spark: SparkSession, name: String): Either[String, Unit] =
      try Right(SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

    // Query isolation: operators persist intermediates (LSH band frames,
    // shingle sets, fork tags) whose lifetime is the returned plan — over
    // 2 passes x ~50 queries the leaked blocks overflow the storage pool,
    // and eviction/GC pressure from query A lands in query B's wall time
    // (round 4: untouched queries regressed 3x from exactly this). Between
    // queries, drop every cached plan and persisted/localCheckpointed RDD
    // so each timed query pays its own materializations and nothing else.
    def resetStorage(spark: SparkSession): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // Shuffle files and broadcast blocks are reclaimed by Spark's
      // ContextCleaner only when the driver-side references are GC'd —
      // an explicit GC between queries costs ~0.1s each (outside the
      // timed window) and makes every timed query start from the same
      // reclaimed state. SPARK_GRAFT_GC=0 disables it for A/B runs.
      if (sys.env.getOrElse("SPARK_GRAFT_GC", "1") != "0") System.gc()
    }

    // optional local-iteration subset (driver always benches everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    val times = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> Vector.empty[Double]): _*)
    val spills = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> 0L): _*)
    val gcs = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> 0L): _*)
    val gcReps = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> Vector.empty[Long]): _*)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val passGc = scala.collection.mutable.ArrayBuffer.empty[Long]
    val passWall = scala.collection.mutable.ArrayBuffer.empty[Double]
    // pass 0 = warmup (JIT, codegen, FS metadata); untimed
    for (pass <- 0 to repeats) {
      // POSITION-FAIR ordering (round 16's open bench finding): a fixed
      // alphabetical order runs the s-tier LAST in every pass, so any
      // end-of-pass drift (driver-heap tail, ambient end-of-run load)
      // lands on the same band in every repeat and survives the median.
      // Each timed pass runs a deterministically-seeded shuffle of the
      // suite — same orders on every bench invocation (A/B-comparable),
      // different positions across passes, so a positional effect hits
      // each query in at most one repeat and the median discards it.
      // The warmup pass stays sorted (untimed; order is irrelevant).
      val passNames =
        if (pass == 0) names
        else new scala.util.Random(6151L * pass).shuffle(names)
      val spark = newSession()
      // warm the fresh session's file index + parquet footers for the
      // corpus tables (untimed): the old single-session harness
      // amortized this listing invisibly across passes — without it,
      // every pass's queries are charged a per-table re-list, a
      // uniform ~0.05-0.1s tax that reads as drift on sub-second rows.
      // `.inputFiles` FORCES the InMemoryFileIndex listing into the
      // shared FileStatusCache — a bare `read.parquet(p)` only reads
      // one footer for schema inference and leaves the listing cold
      Option(new java.io.File(sfDir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
        .foreach(p => spark.read.parquet(p).inputFiles)
      val passG0 = gcCtr.get()
      val passT0 = System.nanoTime()
      try {
        for (name <- passNames) {
          val (s0, g0) = (spillCtr.get(), gcCtr.get())
          val t0 = System.nanoTime()
          val r = execute(spark, name)
          val dt = (System.nanoTime() - t0) / 1e9
          resetStorage(spark)
          if (pass > 0) {
            times(name) = times(name) :+ dt
            spills(name) += spillCtr.get() - s0
            gcs(name) += gcCtr.get() - g0
            gcReps(name) = gcReps(name) :+ (gcCtr.get() - g0)
            r.left.foreach(e => if (!errors.contains(name)) errors(name) = e)
          }
        }
      } finally spark.stop()
      if (pass > 0) {
        passGc += gcCtr.get() - passG0
        passWall += (System.nanoTime() - passT0) / 1e9
      }
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val qs = names.map(n => s""""$n":${median(times(n))}""").mkString("{", ",", "}")
    val mins = names.map(n => s""""$n":${times(n).min}""").mkString("{", ",", "}")
    val reps = names.map(n => times(n).mkString(s""""$n":[""", ",", "]"))
      .mkString("{", ",", "}")
    // summed over all repeats (a per-pass split would triple the size;
    // the diagnostic question is "did THIS query spill/GC", not when)
    val spillJson = names.map(n => s""""$n":${spills(n)}""")
      .mkString("{", ",", "}")
    val gcJson = names.map(n => s""""$n":${gcs(n)}""").mkString("{", ",", "}")
    // per-pass GC per query (pass order, like "repeats"): a drift band
    // readable as "which pass, and was it heap" straight from the artifact
    val gcRepJson = names.map(n => gcReps(n).mkString(s""""$n":[""", ",", "]"))
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"").replaceAll("[\\n\\r\\t]", " ")}""""
    }.mkString("{", ",", "}")
    val total = names.map(n => median(times(n))).sum
    val host = try java.net.InetAddress.getLocalHost.getHostName catch { case _: Throwable => "unknown" }
    val prov = s"""{"host":"${host.replace("\\", "\\\\").replace("\"", "\\\"")}",""" +
      s""""cpus":"$cpus","repeats":$repeats,"order":"shuffled-per-pass",""" +
      s""""ts":"${java.time.Instant.now()}"}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min":$mins,""" +
      s""""repeats":$reps,"spill_bytes":$spillJson,"gc_ms":$gcJson,""" +
      s""""gc_ms_repeats":$gcRepJson,""" +
      s""""pass_gc_ms":${passGc.mkString("[", ",", "]")},""" +
      s""""pass_wall_secs":${passWall.map(w => f"$w%.1f").mkString("[", ",", "]")},""" +
      s""""errors":$errJson,"sf":"$sfDir","provenance":$prov}"""
    println(line)
    Files.writeString(Paths.get("BENCH_local.json"), line + "\n")
    if (errors.nonEmpty) sys.exit(1)
  }
}

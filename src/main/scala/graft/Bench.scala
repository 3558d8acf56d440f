package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Prints ONE JSON line to stdout (raw — build.sbt sets
  * `run / outputStrategy := StdoutOutput` so sbt doesn't prefix it) and
  * also writes it to BENCH.json in the cwd.
  *
  * Measurement: each query is executed to completion through a `noop`
  * datasource write — unlike `.count()`, which lets Catalyst prune every
  * projection that doesn't affect the row count, a noop write evaluates
  * all output columns (the round-1 harness accidentally benchmarked
  * "scan+count" for projection-only queries). A full warmup pass runs
  * first so JVM/codegen warmup isn't charged to whichever query happens
  * to run first. Failures are recorded per-query and fail the process.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
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

    def execute(name: String): Either[String, Unit] =
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
    def resetStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // optional local-iteration subset (driver always benches everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n => execute(n); resetStorage() } // warmup (JIT, codegen, FS metadata)

    val results = names.map { name =>
      val t0 = System.nanoTime()
      val r = execute(name)
      val dt = (System.nanoTime() - t0) / 1e9
      resetStorage()
      (name, dt, r)
    }
    val errors = results.collect { case (n, _, Left(e)) => n -> e }
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"").replaceAll("[\\n\\r\\t]", " ")}""""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("BENCH.json"), line + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

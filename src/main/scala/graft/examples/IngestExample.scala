package graft.examples

import graft.convert.Validator
import graft.core.{Config, GraftSession, Metrics, Pipeline, RunLock, RunState, Telemetry}
import graft.exec.{Runner, TimeoutGuard}
import graft.sinks.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.LocalDate

/** End-to-end assembly of the engine — the role of the reference's example
  * jobs (examples/job/ParquetToCassandraJob.java:103-285): config with a
  * per-table scope, single-run lock, two concurrent pipelines (orders
  * validation with error split; events enrichment), checkpointed run
  * state, stall watchdog, observed metrics, telemetry tables, post-job
  * actions, and history-ordered scheduling.
  *
  * Run: sbt "runMain graft.examples.IngestExample [sfDir] [outDir]"
  */
object IngestExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ingest").toString)

    val cfg = Config.fromMap(Map(
      "orders.min_totalprice" -> "1000",
      "sink.max_records_per_file" -> "100000",
      "scopes.small_run.sink.max_records_per_file" -> "5000"))
      .withScope(Some("small_run"))

    val spark = GraftSession.builder("graft-ingest-example").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = Metrics.register(spark)
    val guard = new TimeoutGuard(spark, stallTimeoutMs = 10 * 60 * 1000L).start()

    val lock = new RunLock(s"$outDir/_locks")
    require(lock.tryAcquire("ingest-example"), "another run holds the lock")
    try {
      val state = new RunState(s"$outDir/_state")

      val orders = Pipeline(
        name = "orders_ingest",
        source = s => s.read.parquet(s"$sfDir/orders.parquet"),
        transform = df => Metrics.observed(df, "orders_in", "rows" -> count(lit(1))),
        rules = Validator.requiredKeys(Seq("o_totalprice")) :+
          Validator.Rule("totalprice_below_min",
            col("o_totalprice") < cfg.getLong("orders.min_totalprice").getOrElse(0L)),
        validSink = df => Sinks.writeFile(df, s"$outDir/orders",
          Sinks.FileSinkConfig(maxRecordsPerFile =
            cfg.getLong("sink.max_records_per_file"))),
        errorSink = Some(df =>
          Sinks.writeErrorTable(df, s"$outDir/orders_errors",
            appId = "ingest-example", rowKeyCol = "o_orderkey")),
        checkpoint = Some((state, Map("orders.last_run" -> "done"))))

      val events = Pipeline(
        name = "events_enrich",
        source = s => s.read.parquet(s"$sfDir/events.parquet"),
        transform = df => df
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .withColumn("is_error", col("event_type") === "error"),
        validSink = df => Sinks.writeFile(df, s"$outDir/events",
          Sinks.FileSinkConfig(partitionBy = Seq("event_type"))),
        checkpoint = Some((state, Map("events.last_run" -> "done"))))

      val history = Runner.loadHistory(state)
      val pipelines = Runner.orderByHistory(Seq[(String, SparkSession => Unit)](
        "orders_ingest" -> (s => { orders.run(s); () }),
        "events_enrich" -> (s => { events.run(s); () })), history)

      val results = Runner.runAll(spark, pipelines)
      Runner.saveHistory(state, results)
      state.commit()

      Runner.runPostActions(results, Seq(
        r => println(s"[post] ${r.name}: ${if (r.result.isSuccess) "ok" else "FAILED"} in ${r.millis}ms")))

      val now = new Timestamp(System.currentTimeMillis())
      Telemetry.appendMetrics(spark,
        Telemetry.fromCollector("ingest-example", metrics, now),
        s"$outDir/_telemetry/metrics", LocalDate.now())

      val written = spark.read.parquet(s"$outDir/orders").count()
      // an all-valid run writes no error files at all
      val errs = scala.util.Try(spark.read.parquet(s"$outDir/orders_errors").count())
        .getOrElse(0L)
      println(s"[ingest-example] orders valid=$written errors=$errs " +
        s"events=${spark.read.parquet(s"$outDir/events").count()} out=$outDir")
      require(results.forall(_.result.isSuccess), "a pipeline failed")
    } finally {
      lock.release("ingest-example")
      guard.stop()
      spark.stop()
    }
  }
}

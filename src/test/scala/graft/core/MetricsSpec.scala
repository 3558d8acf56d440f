package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.LocalDate

class MetricsSpec extends SparkTestBase {

  test("observed metrics arrive via the collector without an extra job") {
    val collector = Metrics.register(spark)
    try {
      val df = Metrics.observed(spark.range(1000).toDF("id"), "ingest",
        "rows" -> count(lit(1)), "max_id" -> max(col("id")))
      df.write.format("noop").mode("overwrite").save()
      // listener delivery is async
      var tries = 0
      while (collector.get("ingest").isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(collector.getLong("ingest", "rows").contains(1000L))
      assert(collector.getLong("ingest", "max_id").contains(999L))
      assert(collector.durationNs("ingest").exists(_ > 0))
    } finally spark.listenerManager.unregister(collector)
  }

  test("telemetry tables: date-partitioned append with typed schemas") {
    val dest = tmpDir("telemetry")
    val at = Timestamp.valueOf("2024-06-01 00:00:00")
    Telemetry.appendMetrics(spark, Seq(
      Telemetry.MetricRecord("job1", "rows_in", 100L, "", at),
      Telemetry.MetricRecord("job1", "rows_out", 90L, "", at)),
      dest, LocalDate.of(2024, 6, 1))
    Telemetry.appendMetrics(spark, Seq(
      Telemetry.MetricRecord("job1", "rows_in", 50L, "", at)),
      dest, LocalDate.of(2024, 6, 2))
    val back = spark.read.parquet(dest)
    assert(back.count() == 3)
    assert(back.where("date = '2024-06-01'").count() == 2)
    assert(back.columns.toSet == Set("job", "metric", "value", "tags", "created_at", "date"))
  }

  test("error/exception telemetry round-trips") {
    val dest = tmpDir("errtel")
    val at = Timestamp.valueOf("2024-06-01 00:00:00")
    Telemetry.appendErrors(spark,
      Seq(Telemetry.ErrorRecord("j", "row-9", "missing field", at)),
      dest, LocalDate.of(2024, 6, 1))
    assert(spark.read.parquet(dest).where("row_key = 'row-9'").count() == 1)
    val dest2 = tmpDir("exctel")
    Telemetry.appendExceptions(spark,
      Seq(Telemetry.ExceptionRecord("j", "IOException", "at ...", is_driver = true, at)),
      dest2, LocalDate.of(2024, 6, 1))
    assert(spark.read.parquet(dest2).where("is_driver").count() == 1)
  }

  test("driver events: record/drain in order, window-scoped, telemetry mapping") {
    Metrics.drainDriverEvents() // isolate from other suites
    Metrics.recordDriver("graft.cc", "rounds", 6L, tags = "star")
    Metrics.recordDriver("graft.cc", "rounds", 11L, tags = "minlabel")
    val events = Metrics.drainDriverEvents()
    assert(events.map(e => (e.point, e.metric, e.value, e.tags)) ==
      Seq(("graft.cc", "rounds", 6L, "star"), ("graft.cc", "rounds", 11L, "minlabel")))
    assert(Metrics.drainDriverEvents().isEmpty, "drain empties the queue")
    val recs = Telemetry.fromDriverEvents("jobX", events)
    assert(recs.map(r => (r.job, r.metric, r.value, r.tags)) ==
      Seq(("jobX", "graft.cc.rounds", 6L, "star"),
        ("jobX", "graft.cc.rounds", 11L, "minlabel")))
  }

  test("concurrent CC runs: per-thread round read-back never clobbers, " +
    "both calls emit driver events") {
    val s = spark; import s.implicits._
    Metrics.drainDriverEvents()
    // a 12-node chain vs a 2-node pair: different round counts by design
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id1", "id2")
    val pair = Seq((100L, 101L)).toDF("id1", "id2")
    @volatile var chainRounds = -1
    @volatile var pairRounds = -1
    val t1 = new Thread(() => {
      graft.llm.Dedup.connectedComponents(chain).count()
      chainRounds = graft.llm.Dedup.lastCcRounds
    })
    val t2 = new Thread(() => {
      graft.llm.Dedup.connectedComponents(pair).count()
      pairRounds = graft.llm.Dedup.lastCcRounds
    })
    t1.start(); t2.start(); t1.join(60000); t2.join(60000)
    assert(pairRounds >= 1 && chainRounds > pairRounds,
      s"thread-local read-back clobbered: chain=$chainRounds pair=$pairRounds")
    val events = Metrics.drainDriverEvents()
      .filter(e => e.point == "graft.cc" && e.metric == "rounds")
    assert(events.size == 2, s"expected one event per CC call, got $events")
    assert(events.map(_.value).toSet == Set(chainRounds.toLong, pairRounds.toLong))
  }

  test("scoped driver-event windows: concurrent scopes drain exactly their " +
    "own events; unscoped drain keeps the rest") {
    Metrics.drainDriverEvents() // isolate from other suites
    // interleave two scoped recorders on separate threads plus an
    // unscoped event — each scope's drain must recover exactly its own
    val t1 = new Thread(() => Metrics.withScope("runA") {
      Metrics.recordDriver("graft.cc", "rounds", 3L)
      Thread.sleep(20)
      Metrics.recordDriver("graft.cc", "rounds", 4L)
    })
    val t2 = new Thread(() => Metrics.withScope("runB") {
      Thread.sleep(10)
      Metrics.recordDriver("graft.cc", "rounds", 9L)
    })
    Metrics.recordDriver("graft.other", "n", 1L) // unscoped
    t1.start(); t2.start(); t1.join(10000); t2.join(10000)
    val a = Metrics.drainDriverEvents("runA")
    assert(a.map(_.value) == Seq(3L, 4L) && a.forall(_.scope == "runA"))
    val b = Metrics.drainDriverEvents("runB")
    assert(b.map(_.value) == Seq(9L))
    assert(Metrics.drainDriverEvents("runA").isEmpty, "scoped drain empties its scope")
    val rest = Metrics.drainDriverEvents()
    assert(rest.map(e => (e.point, e.value, e.scope)) == Seq(("graft.other", 1L, "")),
      s"unscoped event must survive scoped drains: $rest")
  }

  test("withScope nests and restores; Runner propagates the caller scope " +
    "to its pool threads") {
    assert(Metrics.currentScope == "")
    Metrics.withScope("outer") {
      assert(Metrics.currentScope == "outer")
      Metrics.withScope("inner")(assert(Metrics.currentScope == "inner"))
      assert(Metrics.currentScope == "outer")
      // Runner runs pipelines on pooled threads that predate this scope;
      // runAll must re-establish it there
      val results = graft.exec.Runner.runAll(spark, Seq(
        "p1" -> ((_: org.apache.spark.sql.SparkSession) =>
          Metrics.recordDriver("graft.cc", "rounds", 7L))))
      assert(results.forall(_.result.isSuccess))
    }
    assert(Metrics.currentScope == "")
    val ev = Metrics.drainDriverEvents("outer")
    assert(ev.map(_.value) == Seq(7L), s"pool-thread event must carry caller scope: $ev")
  }

  test("fromCollector snapshots long-valued observed metrics") {
    val c = new Metrics.Collector
    // simulate a delivery via the public surface: use a real observation
    val df = Metrics.observed(spark.range(10).toDF("id"), "pt", "n" -> count(lit(1)))
    spark.listenerManager.register(c)
    try {
      df.write.format("noop").mode("overwrite").save()
      var tries = 0
      while (c.get("pt").isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val recs = Telemetry.fromCollector("job", c, Timestamp.valueOf("2024-06-01 00:00:00"))
      assert(recs.exists(r => r.metric == "pt.n" && r.value == 10L))
    } finally spark.listenerManager.unregister(c)
  }
}

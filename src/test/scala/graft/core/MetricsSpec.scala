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

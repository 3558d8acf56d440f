package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Incremental-batch semantics via Trigger.AvailableNow: each invocation
  * processes exactly what accumulated since the checkpoint then stops —
  * the reference's work-unit-calculator model (SURVEY §2.12).
  */
class IncrementalSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("runAvailableNow processes new files only, across invocations") {
    val src = tmpDir("inc-src")
    val sink = tmpDir("inc-sink")
    val ckpt = tmpDir("inc-ckpt")

    Files.write(Paths.get(src, "batch1.json"),
      """{"id": 1, "v": "a"}
        |{"id": 2, "v": "b"}
        |""".stripMargin.getBytes)
    val q1 = Incremental.runAvailableNow(spark, src, schema, "json",
      df => df.withColumn("v_up", upper(col("v"))), sink, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(sink).count() == 2)

    // second invocation with no new data: no duplicates
    val q2 = Incremental.runAvailableNow(spark, src, schema, "json",
      df => df.withColumn("v_up", upper(col("v"))), sink, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(sink).count() == 2)

    // new file arrives; only it is processed
    Files.write(Paths.get(src, "batch2.json"),
      """{"id": 3, "v": "c"}
        |""".stripMargin.getBytes)
    val q3 = Incremental.runAvailableNow(spark, src, schema, "json",
      df => df.withColumn("v_up", upper(col("v"))), sink, ckpt)
    q3.awaitTermination()
    val out = spark.read.parquet(sink)
    assert(out.count() == 3)
    assert(out.where("v_up = 'C'").count() == 1)
  }

  test("windowedCounts groups into tumbling windows with watermark") {
    val s = spark; import s.implicits._
    // batch DataFrame exercises the same expression surface
    val df = Seq(
      ("2024-01-01 00:00:10", "u1"), ("2024-01-01 00:00:50", "u1"),
      ("2024-01-01 00:01:10", "u2")).toDF("ts_s", "user")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Incremental.windowedCounts(df, "ts", "10 seconds", "1 minute", Seq("user"))
      .select(col("window.start").cast("string").as("w"), col("user"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2024-01-01 00:00:00", "u1", 2L),
      ("2024-01-01 00:01:00", "u2", 1L)))
  }
}

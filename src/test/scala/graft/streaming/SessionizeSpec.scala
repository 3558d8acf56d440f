package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class SessionizeSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions close after the gap and carry start/end/count") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = Incremental.sessionize(
      input.toDF().toDF("user", "ts"), "user", "ts",
      gapMs = 60000, watermark = "10 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      // u1: two events 30s apart (one session); u2: one event
      input.addData(
        ("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-01 10:00:30")),
        ("u2", ts("2024-01-01 10:00:05")))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0, "sessions closed too early")

      // watermark jumps far past both sessions' gap windows -> both close
      input.addData(("u3", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // one more batch so timed-out state is flushed
      input.addData(("u3", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()

      val out = spark.table("sessions_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(out.length >= 2, s"expected u1+u2 sessions, got ${out.mkString(",")}")
      val u1 = out.find(_._1 == "u1").get
      assert(u1._2 == ts("2024-01-01 10:00:00").getTime)
      assert(u1._3 == ts("2024-01-01 10:00:30").getTime)
      assert(u1._4 == 2L)
      val u2 = out.find(_._1 == "u2").get
      assert(u2._4 == 1L)
    } finally q.stop()
  }

  /** session_window streaming twin: a session is HELD until the
    * watermark passes its end; an event at EXACTLY prev+gap MERGES
    * (touching windows coalesce — same boundary as the batch lag
    * rule's strict `> gap`). */
  test("sessionWindowAvailableNow: sessions watermark-held then flush; " +
    "exact-gap boundary MERGES like the batch rule") {
    val s = spark; import s.implicits._
    val srcDir = new java.io.File(tmpDir("sw-src"))
    srcDir.mkdirs()
    val t0 = 86400000L // day 1, ms
    def land(name: String, rows: Seq[(Long, java.sql.Timestamp)],
             mtime: Long): Unit = {
      val tmp = tmpDir(s"sw-part-$name")
      rows.toDF("user_id", "ets").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, s"$name.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    val schema = Seq((0L, new java.sql.Timestamp(0L)))
      .toDF("user_id", "ets").schema
    val out = tmpDir("sw-sink"); val ckpt = tmpDir("sw-ckpt")
    def run(): Unit = {
      val q = Incremental.sessionWindowAvailableNow(spark,
        srcDir.toString, schema, "parquet", identity, "ets", "user_id",
        gap = "30 minutes", watermark = "10 minutes", out, ckpt)
      try q.awaitTermination(120000) finally q.stop()
    }
    def sink() = spark.read.parquet(out).where(col("user_id") < 90)
      .select(col("user_id"), col("w_start").cast("long"),
        col("w_end").cast("long"), col("n_events"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    land("b1", Seq(
      (1L, new java.sql.Timestamp(t0)),
      (1L, new java.sql.Timestamp(t0 + 600000L)),   // +10min: merges
      (2L, new java.sql.Timestamp(t0)),
      (2L, new java.sql.Timestamp(t0 + 1800000L))), // EXACTLY +gap: merges
      mtime = 1000000L)
    run()
    assert(sink().isEmpty,
      s"open sessions must be watermark-held: ${sink()}")
    land("flush", Seq((99L, new java.sql.Timestamp(t0 + 86400000L))),
      mtime = 2000000L)
    run()
    val t0s = t0 / 1000L; val gapS = 1800L
    assert(sink() == Set(
      (1L, t0s, t0s + 600L + gapS, 2L),
      (2L, t0s, t0s + 2 * gapS, 2L)),
      s"flushed sessions must match the batch-rule derivation: ${sink()}")
  }
}

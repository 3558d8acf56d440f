package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}

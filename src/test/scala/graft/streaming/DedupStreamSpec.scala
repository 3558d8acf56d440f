package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class DedupStreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupWithinWatermark drops in-horizon repeats, state stays bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val out = Incremental.dedupWithinWatermark(
      input.toDF().toDF("fp", "ts"), "ts", "10 seconds", Seq("fp"))
    val q = out.writeStream.format("memory").queryName("dedup_out").start()
    try {
      // doc A twice in one batch + doc B -> A emitted once
      input.addData(
        ("docA", ts("2024-01-01 10:00:00")),
        ("docA", ts("2024-01-01 10:00:01")),
        ("docB", ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      // A again within the horizon -> still suppressed
      input.addData(("docA", ts("2024-01-01 10:00:05")))
      q.processAllAvailable()
      val firstCounts = spark.table("dedup_out").groupBy("fp").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(firstCounts == Map("docA" -> 1L, "docB" -> 1L))

      // advance the watermark far past A's entry (evicting its state),
      // then A re-arrives as a late new doc -> emitted again: horizon
      // semantics, not dedup-forever
      input.addData(("docC", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(("docA", ts("2024-01-01 11:00:01")))
      q.processAllAvailable()
      val counts = spark.table("dedup_out").groupBy("fp").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("docA") == 2L,
        s"state not evicted past the watermark: $counts")
    } finally q.stop()
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {

  test("sessions: gap strictly-greater splits; boundary events merge; ties share a session") {
    val s = spark
    import s.implicits._
    // key u: events at 0, 100 (gap 100 = limit, merges), 101..201 (within),
    // 502 (gap 301 > 300, new session), 502 duplicate tie, 900 (new)
    val ev = Seq(
      ("u", 0L), ("u", 100L), ("u", 201L), ("u", 502L), ("u", 502L), ("u", 900L),
      ("v", 50L)).toDF("k", "t")
    val out = Sessionize.sessions(ev, "k", "t", gap = 300L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("u", 1L)) == ((0L, 201L, 3L)), s"got $out")   // 0,100,201 merge
    assert(out(("u", 2L)) == ((502L, 502L, 2L)), s"got $out") // tie shares
    assert(out(("u", 3L)) == ((900L, 900L, 1L)), s"got $out")
    assert(out(("v", 1L)) == ((50L, 50L, 1L)), s"got $out")
    assert(out.size == 4)
  }

  test("sessionsSalted == sessions with a key holding 50% of events; " +
    "hot key never sorts on one partition") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // "hot" carries half the corpus; timestamps cluster so sessions both
    // straddle and avoid range boundaries (width 1000, gap 100)
    val hot = Seq.tabulate(2000)(i =>
      ("hot", i.toLong * 37 + rnd.nextInt(20)))
    val cold = Seq.tabulate(2000)(i =>
      (s"u${i % 200}", rnd.nextInt(74000).toLong))
    val ev = (hot ++ cold).toDF("k", "t")
    val plain = Sessionize.sessions(ev, "k", "t", gap = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Sessionize.sessionsSalted(ev, "k", "t", gap = 100L,
      rangeWidth = 1000L)
    val saltedMap = salted.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(saltedMap == plain)
    // the event-level window must PARTITION by (key, range) — check the
    // window spec itself, not mere presence of the column: a regression
    // to key-only partitioning still mentions __rng in projections
    val plan = salted.queryExecution.executedPlan.toString
    val eventWindowSpecs =
      """windowspecdefinition\(k#\d+, __rng#\d+L?,""".r.findAllIn(plan).toList
    assert(eventWindowSpecs.nonEmpty,
      s"expected an event window partitioned by (k, __rng):\n$plan")
  }

  test("assignSalted == assign per event (hot-key event-level numbering)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val ev = (Seq.tabulate(800)(i => ("hot", i.toLong * 53 + rnd.nextInt(30))) ++
      Seq.tabulate(400)(i => (s"u${i % 40}", rnd.nextInt(42000).toLong)))
      .toDF("k", "t")
    val plain = Sessionize.assign(ev, "k", "t", gap = 120L)
      .groupBy("k", "t").agg(max("session_seq").as("ss")) // dedupe tie rows
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val salted = Sessionize.assignSalted(ev, "k", "t", gap = 120L,
      rangeWidth = 1000L)
      .groupBy("k", "t").agg(max("session_seq").as("ss"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }

  test("sessionsSalted: negative timestamps (pre-1970) range correctly") {
    val s = spark
    import s.implicits._
    val ev = Seq(("u", -2500L), ("u", -2450L), ("u", -100L), ("u", 50L))
      .toDF("k", "t")
    val plain = Sessionize.sessions(ev, "k", "t", gap = 200L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Sessionize.sessionsSalted(ev, "k", "t", gap = 200L,
      rangeWidth = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("reserved output columns in input are rejected, not overwritten") {
    val s = spark
    import s.implicits._
    val withSeq = Seq(("u", 1L, 9L)).toDF("k", "t", "session_seq")
    intercept[IllegalArgumentException](Sessionize.assign(withSeq, "k", "t", 10L))
    intercept[IllegalArgumentException](Sessionize.sessions(withSeq, "k", "t", 10L))
    val withStart = Seq(("u", 1L, 9L)).toDF("k", "t", "n_events")
    intercept[IllegalArgumentException](Sessionize.sessions(withStart, "k", "t", 10L))
  }

  test("assign: per-event session_seq is 1-based per key in time order") {
    val s = spark
    import s.implicits._
    val ev = Seq(("u", 10L), ("u", 1000L), ("w", 5L)).toDF("k", "t")
    val seqs = Sessionize.assign(ev, "k", "t", gap = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(seqs == Map(("u", 10L) -> 1L, ("u", 1000L) -> 2L, ("w", 5L) -> 1L))
  }

  test("batch sessions == streaming sessionize on the same events (the twins agree)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(1704103200000L + ms) // 2024-01-01 10:00 UTC
    val gapMs = 120000L // 2 minutes
    // u: two sessions (10s apart, then a 10-min gap); v: one session
    val events = Seq(
      ("u", 0L), ("u", 10000L), ("u", 610000L), ("u", 615000L), ("v", 5000L))

    // streaming: watermark 0s; a far-future sentinel key advances the
    // watermark past every real session's end+gap so they all emit
    val input = MemoryStream[(String, Timestamp)]
    input.addData(events.map { case (k, ms) => (k, ts(ms)) }: _*)
    input.addData(("__sentinel", ts(86400000L)))
    val q = graft.streaming.Incremental.sessionize(
      input.toDF().toDF("k", "ts"), "k", "ts", gapMs, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_twin").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_twin")
      .where(col("key") =!= "__sentinel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch twin over epoch millis, sessions keyed back to (key, start, end, n)
    val batch = Sessionize.sessions(
      events.map { case (k, ms) => (k, ts(ms).getTime) }.toDF("k", "t"),
      "k", "t", gap = gapMs)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch.size == 3)
  }

  test("sessions plans ONE exchange: windows and rollup share the key partitioning") {
    val s = spark
    import s.implicits._
    val ev = Seq(("u", 0L), ("u", 10L)).toDF("k", "t")
    val plan = Sessionize.sessions(ev, "k", "t", gap = 300L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected one shuffle, got $shuffles:\n$plan")
  }
}

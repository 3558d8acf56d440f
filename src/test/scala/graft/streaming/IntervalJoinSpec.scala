package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {

  /** Four daily files of view/click pairs, fed one file per micro-batch:
    * matches stay within a day, watermarks are minutes — so by the last
    * batch the state store must have EVICTED the early days' rows. This
    * is the scale claim of the operator made observable: without the
    * watermark + time-range condition the join state grows with the
    * stream forever. */
  test("intervalJoinAvailableNow: multi-batch run joins exactly the " +
    "batch result and evicts out-of-horizon state") {
    val s = spark; import s.implicits._
    val srcDir = new java.io.File(tmpDir("ij-src"))
    val dayUs = 86400000000L
    def mkDay(d: Int): DataFrame = {
      // per day: 20 users, a view at +0 and a click at +10min (match),
      // plus a click at +3h (outside the 30min gap — no match)
      // NOTE day base starts at d+1, not d: day 0's user 0 would otherwise
      // sit at event time epoch 0 == the stream's INITIAL watermark, and
      // Spark's late-row filter (eventTime <= watermark) drops exactly
      // that row — the boundary pinned by the dedicated test below.
      val rows = (0 until 20).flatMap { u =>
        val base = (d + 1).toLong * dayUs + u * 60000000L
        Seq((u.toLong, d * 1000L + u, new java.sql.Timestamp(base / 1000), "view"),
          (u.toLong, d * 1000L + 500 + u,
            new java.sql.Timestamp((base + 600000000L) / 1000), "click"),
          (u.toLong, d * 1000L + 900 + u,
            new java.sql.Timestamp((base + 3L * 3600000000L) / 1000), "click"))
      }
      rows.toDF("user_id", "event_id", "ts", "event_type")
    }
    val all = (0 until 4).map(mkDay).reduce(_.unionByName(_))
    (0 until 4).foreach { d =>
      val tmp = tmpDir(s"ij-part-$d")
      mkDay(d).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, s"day$d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000L + d * 60000L) // strict arrival order
    }
    val out = tmpDir("ij-sink")
    val ckpt = tmpDir("ij-ckpt")
    def side(tp: String, pre: String)(df: DataFrame) =
      df.where(col("event_type") === tp)
        .select(col("user_id").as(s"${pre}_user"),
          col("event_id").as(s"${pre}_id"), col("ts").as(s"${pre}_ts"))
    val q = Incremental.intervalJoinAvailableNow(spark, srcDir.toString,
      all.schema, "parquet", side("view", "v"), side("click", "c"),
      "v_user", "c_user", "v_ts", "c_ts",
      maxGap = "30 minutes", watermark = "10 minutes", out, ckpt,
      maxFilesPerTrigger = Some(1))
    try q.awaitTermination(120000) finally q.stop()
    // result == the batch interval join (20 matches/day, late clicks out)
    val got = spark.read.parquet(out)
      .select(col("v_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 4).flatMap(d => (0 until 20).map(u =>
      (d * 1000L + u, d * 1000L + 500 + u))).toSet
    assert(got == expected)
    // state eviction: the final batch's state must be far below the
    // cumulative row count (days 0-2 evicted once the watermark passed)
    val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progress.length >= 3, "expected one micro-batch per file")
    val lastState = progress.last.stateOperators.map(_.numRowsTotal).sum
    val totalSideRows = 4 * 20 * 3L
    assert(lastState < totalSideRows / 2,
      s"state not evicting: $lastState rows retained of $totalSideRows fed")
  }

  /** Pins the epoch-origin boundary the operator scaladoc caveats: the
    * initial watermark is 0 and Spark's late-row predicate is
    * `eventTime <= watermark`, so a row at EXACTLY epoch 0 is dropped
    * as late in the first micro-batch while a row 1 ms later survives.
    * (Found round 10: the multi-batch fixture's day-0/user-0 view sat
    * at epoch 0 and its pair silently vanished.) */
  test("intervalJoinAvailableNow: row at event-time epoch 0 is dropped " +
    "by the initial watermark; 1ms later survives") {
    val s = spark; import s.implicits._
    val srcDir = tmpDir("ijb-src")
    val rows = Seq(
      // pair A: view at the epoch origin — view dropped as late, no match
      (0L, 1L, new java.sql.Timestamp(0L), "view"),
      (0L, 2L, new java.sql.Timestamp(600000L), "click"),
      // pair B: view 1 ms past the origin — survives, matches
      (1L, 3L, new java.sql.Timestamp(1L), "view"),
      (1L, 4L, new java.sql.Timestamp(600001L), "click"))
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    df.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val out = tmpDir("ijb-sink")
    val ckpt = tmpDir("ijb-ckpt")
    def side(tp: String, pre: String)(d: org.apache.spark.sql.DataFrame) =
      d.where(col("event_type") === tp)
        .select(col("user_id").as(s"${pre}_user"),
          col("event_id").as(s"${pre}_id"), col("ts").as(s"${pre}_ts"))
    val q = Incremental.intervalJoinAvailableNow(spark, srcDir,
      df.schema, "parquet", side("view", "v"), side("click", "c"),
      "v_user", "c_user", "v_ts", "c_ts",
      maxGap = "30 minutes", watermark = "10 minutes", out, ckpt)
    try q.awaitTermination(120000) finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("v_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 4L)),
      s"epoch-0 boundary drifted from the documented semantics: $got")
  }

  /** Left-outer: null extensions are WATERMARK-HELD. Two AvailableNow
    * runs over one checkpoint pin the emission timing: run 1 ingests a
    * matched pair and an unmatched view — the inner match emits, the
    * null extension does NOT (the watermark hasn't passed
    * viewTs + maxGap; a click could still arrive). Run 2 feeds only a
    * far-future flush pair; the advanced watermark evicts the held
    * view and (v, null) emits. Closed flushed input == batch left
    * join. */
  test("intervalJoinAvailableNow leftOuter: unmatched view held until " +
    "the watermark passes its eviction time, then emits (v, null)") {
    val s = spark; import s.implicits._
    val srcDir = new java.io.File(tmpDir("ijl-src"))
    srcDir.mkdirs()
    val t0 = 86400000L // day 1 in ms — off the epoch-0 boundary
    def land(name: String, rows: Seq[(Long, Long, java.sql.Timestamp, String)],
             mtime: Long): Unit = {
      val tmp = tmpDir(s"ijl-part-$name")
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, s"$name.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    land("batch1", Seq(
      (0L, 1L, new java.sql.Timestamp(t0), "view"),
      (0L, 2L, new java.sql.Timestamp(t0 + 600000L), "click"), // +10min
      (1L, 3L, new java.sql.Timestamp(t0 + 60000L), "view")),  // no click
      mtime = 1000000L)
    val out = tmpDir("ijl-sink")
    val ckpt = tmpDir("ijl-ckpt")
    def side(tp: String, pre: String)(d: org.apache.spark.sql.DataFrame) =
      d.where(col("event_type") === tp)
        .select(col("user_id").as(s"${pre}_user"),
          col("event_id").as(s"${pre}_id"), col("ts").as(s"${pre}_ts"))
    val schema = Seq((0L, 0L, new java.sql.Timestamp(0L), ""))
      .toDF("user_id", "event_id", "ts", "event_type").schema
    def run(): Unit = {
      val q = Incremental.intervalJoinAvailableNow(spark, srcDir.toString,
        schema, "parquet", side("view", "v"), side("click", "c"),
        "v_user", "c_user", "v_ts", "c_ts",
        maxGap = "30 minutes", watermark = "10 minutes", out, ckpt,
        joinType = "leftOuter")
      try q.awaitTermination(120000) finally q.stop()
    }
    run()
    def sink() = spark.read.parquet(out).where(col("v_user") < 90)
      .select(col("v_id"),
        when(col("c_id").isNull, -1L).otherwise(col("c_id")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // run 1: max event t0+10min, watermark delay 10min -> final
    // watermark t0; eviction needs watermark > t0+1min+30min -> HELD
    assert(sink() == Set((1L, 2L)),
      s"null extension must be watermark-held in run 1: ${sink()}")
    // run 2: flush pair a day later pushes the watermark past every
    // real row's eviction time; the held view emits (v, null)
    land("flush", Seq(
      (99L, 100L, new java.sql.Timestamp(t0 + 86400000L), "view"),
      (99L, 101L, new java.sql.Timestamp(t0 + 86400000L), "click")),
      mtime = 2000000L)
    run()
    assert(sink() == Set((1L, 2L), (3L, -1L)),
      s"held (v, null) must emit once the watermark passes: ${sink()}")
  }

  /** Full-outer: BOTH sides null-extend — the symmetric case is the
    * ORPHAN CLICK (no view within the gap), watermark-held exactly like
    * the left side's null extension. */
  test("intervalJoinAvailableNow fullOuter: orphan click held, then " +
    "emits (null, c) once the watermark passes its eviction time") {
    val s = spark; import s.implicits._
    val srcDir = new java.io.File(tmpDir("ijf-src"))
    srcDir.mkdirs()
    val t0 = 86400000L
    def land(name: String, rows: Seq[(Long, Long, java.sql.Timestamp, String)],
             mtime: Long): Unit = {
      val tmp = tmpDir(s"ijf-part-$name")
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, s"$name.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    land("batch1", Seq(
      (0L, 1L, new java.sql.Timestamp(t0), "view"),
      (0L, 2L, new java.sql.Timestamp(t0 + 600000L), "click"),  // match
      (2L, 5L, new java.sql.Timestamp(t0 + 60000L), "click")),  // orphan
      mtime = 1000000L)
    val out = tmpDir("ijf-sink")
    val ckpt = tmpDir("ijf-ckpt")
    def side(tp: String, pre: String)(d: org.apache.spark.sql.DataFrame) =
      d.where(col("event_type") === tp)
        .select(col("user_id").as(s"${pre}_user"),
          col("event_id").as(s"${pre}_id"), col("ts").as(s"${pre}_ts"))
    val schema = Seq((0L, 0L, new java.sql.Timestamp(0L), ""))
      .toDF("user_id", "event_id", "ts", "event_type").schema
    def run(): Unit = {
      val q = Incremental.intervalJoinAvailableNow(spark, srcDir.toString,
        schema, "parquet", side("view", "v"), side("click", "c"),
        "v_user", "c_user", "v_ts", "c_ts",
        maxGap = "30 minutes", watermark = "10 minutes", out, ckpt,
        joinType = "fullOuter")
      try q.awaitTermination(120000) finally q.stop()
    }
    run()
    def sink() = spark.read.parquet(out)
      .where(coalesce(col("v_user"), lit(0L)) < 90 &&
        coalesce(col("c_user"), lit(0L)) < 90)
      .select(when(col("v_id").isNull, -1L).otherwise(col("v_id")).as("v"),
        when(col("c_id").isNull, -1L).otherwise(col("c_id")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // run 1: the orphan click's state can't evict yet (a view at
    // clickTs - gap could still arrive) -> only the inner match emits
    assert(sink() == Set((1L, 2L)),
      s"orphan click must be watermark-held in run 1: ${sink()}")
    land("flush", Seq(
      (99L, 100L, new java.sql.Timestamp(t0 + 86400000L), "view"),
      (99L, 101L, new java.sql.Timestamp(t0 + 86400000L), "click")),
      mtime = 2000000L)
    run()
    assert(sink() == Set((1L, 2L), (-1L, 5L)),
      s"held (null, c) must emit once the watermark passes: ${sink()}")
  }
}

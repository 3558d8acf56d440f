package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkTestBase {

  test("gapFillLocf: holes carry the last observation forward, observed " +
    "flags the real buckets, per-bucket last is (ts, value)-max") {
    val s = spark; import s.implicits._
    val b = 10L // bucket width in "micros"
    val events = Seq(
      // key A: obs in buckets 0 and 3; bucket 0 has two obs — later ts wins
      ("a", 1L, 1.0), ("a", 7L, 5.0), ("a", 31L, 2.0),
      // equal-ts tie inside one bucket: larger value wins (total order)
      ("a", 32L, 9.0), ("a", 32L, 3.0),
      // key B: single bucket, no gaps
      ("b", 100L, 7.0)).toDF("k", "tus", "v")
    val out = GapFill.gapFillLocf(events, "k", col("tus"), "v", b)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      ("a", 0L) -> ((5.0, true)),   // last of bucket 0 (ts 7 beats ts 1)
      ("a", 1L) -> ((5.0, false)),  // carried
      ("a", 2L) -> ((5.0, false)),  // carried
      ("a", 3L) -> ((9.0, true)),   // ts tie at 32 -> larger value
      ("b", 10L) -> ((7.0, true))))
  }

  test("gapFillLocf: bucket index is exact floor division (negative " +
    "epochs land in the floor bucket, not the truncated one)") {
    val s = spark; import s.implicits._
    val events = Seq(("a", -1L, 1.0), ("a", 9L, 2.0)).toDF("k", "tus", "v")
    val out = GapFill.gapFillLocf(events, "k", col("tus"), "v", 10L)
      .select(col("k"), col("bucket"), col("v")).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSet
    // -1 // 10 = -1 (floor), not 0 (truncate)
    assert(out == Set((-1L, 1.0), (0L, 2.0)))
  }
}

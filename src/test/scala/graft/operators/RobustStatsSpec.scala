package graft.operators

import graft.SparkTestBase

class RobustStatsSpec extends SparkTestBase {

  test("robustOutlierStats: hand-checked median/MAD/Hampel counts; a " +
    "constant stratum has MAD 0 and no outliers") {
    val s = spark; import s.implicits._
    val df = ((1L to 9L).map(("a", _)) :+ (("a", 1000L))) ++
      Seq(("b", 7L), ("b", 7L), ("b", 7L))
    val out = RobustStats.robustOutlierStats(df.toDF("src", "v"), "src", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    // a: med of {1..9,1000} = 5.5; devs sorted {0.5,0.5,1.5,1.5,2.5,2.5,
    // 3.5,3.5,4.5,994.5} -> mad 2.5; 3.5*2.5 = 8.75 -> only 994.5 beyond
    assert(out("a") == ((5.5, 2.5, 10L, 1L)), s"got ${out("a")}")
    assert(out("b") == ((7.0, 0.0, 3L, 0L)), s"got ${out("b")}")
  }

  test("robustOutlierStats: one heavy artifact does NOT move the robust " +
    "stats (the anti-mean property), and partitioning independence holds") {
    val s = spark; import s.implicits._
    val clean = (1L to 101L).map(("x", _))
    val noisy = clean :+ (("x", 1000000L))
    def run(rows: Seq[(String, Long)], parts: Int) =
      RobustStats.robustOutlierStats(
        rows.toDF("src", "v").repartition(parts), "src", "v")
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).head
    // median 51 -> 51.5, MAD 25 -> 25.5: bounded drift, not the
    // ~10000x a mean/stddev would take
    assert(run(clean, 1) == ((51.0, 25.0)), s"got ${run(clean, 1)}")
    assert(run(noisy, 1) == ((51.5, 25.5)), s"got ${run(noisy, 1)}")
    assert(run(noisy, 7) == ((51.5, 25.5)), "partitioning independence")
  }

  test("winsorizedMean: IQR clamp gives the hand-computed exact mean; the " +
    "artifact's pull is bounded by the band") {
    val s = spark; import s.implicits._
    val df = ((1L to 10L) :+ 1000L).map(("a", _)).toDF("src", "v")
    val r = RobustStats.winsorizedMean(df, "src", "v").head()
    // sorted {1..10, 1000}: p25 = 3.5, p75 = 8.5; clamped sum =
    // 3*3.5 + (4+...+8) + 3*8.5 = 66 -> mean 6.0 exactly
    assert((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      == ((3.5, 8.5, 11L, 6.0)), r)
  }
}

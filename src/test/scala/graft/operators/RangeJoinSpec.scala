package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  test("pointInInterval: inclusive bounds, overlapping intervals, no dup matches") {
    val s = spark
    import s.implicits._
    val points = Seq(("p1", 5L), ("p2", 10L), ("p3", 99L), ("p4", 100L))
      .toDF("pid", "t")
    // i1 and i2 overlap; i3 empty-range valid (lo == hi); i4 inverted (dropped)
    val ivs = Seq(("i1", 0L, 10L), ("i2", 10L, 50L), ("i3", 99L, 99L),
      ("i4", 80L, 20L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", binWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == out.distinct.length, s"duplicate matches: ${out.toSeq}")
    assert(out.toSet == Set(("p1", "i1"), ("p2", "i1"), ("p2", "i2"), ("p3", "i3")),
      s"got ${out.toSeq}")
  }

  test("pointInInterval: matches the naive inequality join on random data, any binWidth") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("pid", "t")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextInt(950).toLong; (i.toLong, lo, lo + rnd.nextInt(120).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 13L, 120L, 5000L)) {
      val binned = RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.distinct.length, s"w=$w dup matches")
      assert(binned.toSet == naive, s"w=$w diverged from the inequality join")
    }
  }

  test("negative domains bin correctly (floor, not truncate-toward-zero)") {
    val s = spark
    import s.implicits._
    val points = Seq(("a", -1L), ("b", 1L)).toDF("pid", "t")
    val ivs = Seq(("neg", -5L, -1L), ("pos", 1L, 5L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", binWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "neg"), ("b", "pos")))
  }

  test("null points/bounds drop (SQL comparison semantics); name clashes rejected") {
    val s = spark
    import s.implicits._
    val points = Seq((Some(1L), "p"), (None, "q")).toDF("t", "pid")
    val ivs = Seq((Some(0L), Some(5L), "i"), (None, Some(9L), "j"))
      .toDF("lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", 10L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("p", "i")))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points, ivs.withColumnRenamed("iid", "pid"),
        "t", "lo", "hi", 10L))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", 0L))
  }

  test("intervalOverlap: inclusive endpoints, exactly-once attribution, " +
    "matches naive overlap join on random data across bin widths") {
    val s = spark
    import s.implicits._
    // touching endpoints overlap; disjoint do not; long-vs-short spanning
    val a = Seq(("a1", 0L, 10L), ("a2", 20L, 100L)).toDF("ak", "alo", "ahi")
    val b = Seq(("b1", 10L, 15L), ("b2", 16L, 19L), ("b3", 0L, 200L))
      .toDF("bk", "blo", "bhi")
    val out = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 7L)
      .select("ak", "bk").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == out.distinct.length, s"dup matches: ${out.toSeq}")
    assert(out.toSet == Set(("a1", "b1"), ("a1", "b3"), ("a2", "b3")), s"${out.toSeq}")

    val rnd = new scala.util.Random(11)
    val la = (1 to 120).map { i =>
      val lo = rnd.nextInt(900).toLong; (i.toLong, lo, lo + rnd.nextInt(150).toLong)
    }.toDF("ak", "alo", "ahi")
    val rb = (1 to 120).map { i =>
      val lo = rnd.nextInt(900).toLong; (i.toLong, lo, lo + rnd.nextInt(150).toLong)
    }.toDF("bk", "blo", "bhi")
    val naive = la.join(rb, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("ak", "bk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 37L, 150L, 9000L)) {
      val binned = RangeJoin.intervalOverlap(la, rb, "alo", "ahi", "blo", "bhi", w)
        .select("ak", "bk").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.distinct.length, s"w=$w dup matches")
      assert(binned.toSet == naive, s"w=$w diverged from the overlap join")
    }
  }

  test("plans a hash equi-join on the bin key — never a nested loop / cartesian") {
    val s = spark
    import s.implicits._
    val points = (1 to 100).map(i => (i.toLong, i.toLong * 3)).toDF("pid", "t")
    val ivs = (1 to 30).map(i => (i.toLong, i * 10L, i * 10L + 25L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("bins exactly beyond 2^53 (epoch-nanos domain)") {
    val s = spark
    import s.implicits._
    // double division would round these quotients and mis-bin; integral
    // `div` is exact over the full long range
    val base = 1700000000000000000L // ~1.7e18 epoch nanos, > 2^53
    val points = Seq(("p1", base + 5L), ("p2", base + 11L)).toDF("pid", "t")
    val ivs = Seq(("i1", base, base + 10L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "t", "lo", "hi", binWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("p1", "i1")), s"got $got")
  }

  test("suggestedBinWidth: empty interval table defaults to 1") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("lo", "hi")
    assert(RangeJoin.suggestedBinWidth(empty, "lo", "hi") == 1L)
  }

  test("suggestedBinWidth: mean interval length, floor 1") {
    val s = spark
    import s.implicits._
    val ivs = Seq((0L, 10L), (0L, 30L)).toDF("lo", "hi")
    assert(RangeJoin.suggestedBinWidth(ivs, "lo", "hi") == 20L)
    assert(RangeJoin.suggestedBinWidth(Seq((5L, 5L)).toDF("lo", "hi"), "lo", "hi") == 1L)
  }
}

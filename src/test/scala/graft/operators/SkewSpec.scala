package graft.operators

import graft.SparkTestBase
import graft.sinks.Sinks
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  private def skewed = {
    val s = spark; import s.implicits._
    // 90% of rows share key 1 (the hot key)
    (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i")).toDF("k", "v")
  }

  private def dim = {
    val s = spark; import s.implicits._
    (1L to 1000L).map(k => (k, s"dim$k")).toDF("k", "d")
  }

  test("saltedJoin produces exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "d")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .select("k", "v", "d")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key across salt values") {
    val s = spark; import s.implicits._
    val salts = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
      .where(col("k") === 1).select("__salt").distinct().count()
    assert(salts > 4, s"hot key landed on only $salts salt values")
  }

  test("saltedCount matches plain counts") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(skewed, Seq("k"), saltFactor = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("topKeyCounts surfaces the hot key first") {
    val top = Skew.topKeyCounts(skewed, Seq("k"), k = 3).collect()
    assert(top.head.getLong(0) == 1L && top.head.getLong(1) == 900L)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val s = spark; import s.implicits._
    val left = (1 to 500).map(i => (i.toLong % 50, s"l$i")).toDF("k", "lv")
    val right = (1 to 300).map(i => (i.toLong % 50, s"r$i")).toDF("k", "rv")
    Sinks.writeBucketed(left, "bkt_left", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    Sinks.writeBucketed(right, "bkt_right", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(joined.count() == left.join(right, Seq("k")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("keyProfile: hand-checked distribution stats and the integer-exact " +
    "salt suggestion") {
    val s = spark; import s.implicits._
    // counts per key: a=6, b=2, c=2, d=2 -> 12 rows over 4 keys
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(2)("d")).map(Tuple1(_)).toDF("k")
    val r = Skew.keyProfile(df, Seq("k"), partitions = 4).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 12L && r.getLong(2) == 6L)
    // sorted counts [2,2,2,6]: q25 = 2, q50 = 2, q75 = 2 + 0.25*(6-2) = 3
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 2.0 && r.getDouble(5) == 3.0)
    assert(r.getDouble(6) == 3.0, "mean = 12/4")
    assert(r.getDouble(7) == 2.0, "skew ratio = max/mean = 6/3")
    // hot key holds 6 rows; an average reducer at 4 partitions holds 3 ->
    // salt 2; at 1 partition the key underfills the single reducer -> 1
    assert(r.getLong(8) == 2L)
    val r1 = Skew.keyProfile(df, Seq("k"), partitions = 1).head()
    assert(r1.getLong(8) == 1L)
    intercept[IllegalArgumentException](Skew.keyProfile(df, Seq("k"), 0))
  }
}

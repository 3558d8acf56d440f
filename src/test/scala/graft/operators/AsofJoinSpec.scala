package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {

  test("asofJoin: latest right row at-or-before each left time, per key") {
    val s = spark; import s.implicits._
    val quotes = Seq( // (sym, qt, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq( // (sym, tt, qty)
      ("A", 9L, 1L),   // before any quote -> null
      ("A", 10L, 2L),  // exactly at a quote -> inclusive <=
      ("A", 25L, 3L),  // between quotes -> latest earlier (20, 2.0)
      ("A", 99L, 4L),  // after all -> last (30, 3.0)
      ("B", 15L, 5L),  // simultaneous on another key
      ("C", 50L, 6L)   // key with no right rows -> null
    ).toDF("sym", "tt", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "sym", "tt", "qt",
        Seq("px"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size == 6) // exactly one output row per left row
    assert(out(("A", 9L)).isEmpty)
    assert(out(("A", 10L)).contains(1.0))
    assert(out(("A", 25L)).contains(2.0))
    assert(out(("A", 99L)).contains(3.0))
    assert(out(("B", 15L)).contains(9.0))
    assert(out(("C", 50L)).isEmpty)
  }

  test("asofJoin carries multiple right columns atomically") {
    val s = spark; import s.implicits._
    val state = Seq((1L, 100L, "v1", 10), (1L, 200L, "v2", 20))
      .toDF("k", "t", "ver", "num")
    val probes = Seq((1L, 150L), (1L, 250L)).toDF("k", "pt")
    val out = AsofJoin.asofJoin(probes, state, "k", "k", "pt", "t",
        Seq("ver", "num"))
      .collect().map(r => r.getLong(1) -> (r.getString(2), r.getInt(3))).toMap
    // ver and num always come from the SAME right row (struct carry)
    assert(out(150L) == ("v1", 10))
    assert(out(250L) == ("v2", 20))
  }

  test("asofJoin rejects payload/left column collisions") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException](
      AsofJoin.asofJoin(l, r, "k", "k", "t", "t", Seq("v")))
  }

  test("asofJoin rejects columns colliding with the internal __ prefix") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "__asof")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException](
      AsofJoin.asofJoin(l, r, "k", "k", "t", "t", Seq("v")))
    val l2 = Seq((1L, 1L)).toDF("k", "t")
    val r2 = Seq((1L, 1L, "y")).toDF("k", "t", "__rv")
    intercept[IllegalArgumentException](
      AsofJoin.asofJoin(l2, r2, "k", "k", "t", "t", Seq("__rv")))
  }

  test("asofJoin strict mode hides exactly-simultaneous right rows") {
    val s = spark; import s.implicits._
    val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0)).toDF("sym", "qt", "px")
    val trades = Seq(("A", 10L, 1L), ("A", 20L, 2L), ("A", 25L, 3L))
      .toDF("sym", "tt", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "sym", "tt", "qt",
        Seq("px"), strict = true)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(10L).isEmpty)       // < semantics: simultaneous quote hidden
    assert(out(20L).contains(1.0)) // latest strictly-earlier quote
    assert(out(25L).contains(2.0))
  }

  test("asofJoin tolerance discards matches older than the lookback") {
    val s = spark; import s.implicits._
    val quotes = Seq(("A", 10L, 1.0), ("A", 100L, 2.0)).toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", 15L, 1L),   // 5 back, within 10 -> 1.0
      ("A", 20L, 2L),   // exactly 10 back (inclusive bound) -> 1.0
      ("A", 50L, 3L),   // 40 back, beyond 10 -> null
      ("A", 105L, 4L)   // 5 back from the later quote -> 2.0
    ).toDF("sym", "tt", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "sym", "tt", "qt",
        Seq("px"), tolerance = Some(lit(10L)))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(15L).contains(1.0))
    assert(out(20L).contains(1.0))
    assert(out(50L).isEmpty)
    assert(out(105L).contains(2.0))
  }

  test("asofJoin strict + tolerance combined: bound applies to the " +
    "strictly-earlier carry; mismatched types and case-variant " +
    "collisions rejected") {
    val s = spark; import s.implicits._
    val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0)).toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", 10L, 1L),  // strict hides the simultaneous quote; nothing earlier -> null
      ("A", 20L, 2L),  // strict -> quote@10, 10 back, within tolerance -> 1.0
      ("A", 35L, 3L),  // quote@20, 15 back, beyond 12 -> null
      ("A", 25L, 4L)   // quote@20, 5 back -> 2.0
    ).toDF("sym", "tt", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "sym", "tt", "qt",
        Seq("px"), strict = true, tolerance = Some(lit(12L)))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(10L -> None, 20L -> Some(1.0), 35L -> None,
      25L -> Some(2.0)), s"got $out")
    // long left time vs string right time would sort lexicographically
    // after the union widens — rejected up front instead
    val strQuotes = quotes.withColumn("qt", col("qt").cast("string"))
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades, strQuotes, "sym", "sym", "tt", "qt", Seq("px")))
    // case-variant payload collision (resolution is case-insensitive)
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades.withColumn("PX", lit(1)), quotes, "sym", "sym", "tt", "qt",
      Seq("px")))
    // ...but under spark.sql.caseSensitive=true a left PX and right px
    // are distinct legal columns — the guard must not reject them
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      val out2 = AsofJoin.asofJoin(
        trades.withColumn("PX", lit(1)), quotes, "sym", "sym", "tt", "qt",
        Seq("px"))
      assert(out2.columns.count(_.equalsIgnoreCase("px")) == 2)
      out2.collect() // resolves and executes unambiguously
    } finally spark.conf.unset("spark.sql.caseSensitive")
  }

  test("asofJoin null keys/times: right rows dropped, left rows unmatched") {
    val s = spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rSchema = StructType(Seq(StructField("k", StringType),
      StructField("t", LongType), StructField("px", DoubleType)))
    val quotes = s.createDataFrame(java.util.Arrays.asList(
      Row("A", 10L, 1.0),
      Row(null, 5L, 66.0),   // null key: matches nothing (SQL `=`)
      Row("A", null, 77.0)), // null time: matches nothing (SQL `<=`)
      rSchema)
    val lSchema = StructType(Seq(StructField("k", StringType),
      StructField("t", LongType), StructField("n", LongType)))
    val trades = s.createDataFrame(java.util.Arrays.asList(
      Row("A", 20L, 1L),    // normal match
      Row(null, 20L, 2L),   // null left key -> kept, payload null
      Row("A", null, 3L)),  // null left time -> kept, payload null
      lSchema)
    val out = AsofJoin.asofJoin(trades, quotes, "k", "k", "t", "t", Seq("px"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size == 3) // every left row survives
    assert(out(1L).contains(1.0)) // not 77.0: the null-time right row is dropped
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
  }

  test("asofJoin plans one window over the unioned sides, no range probe") {
    val s = spark; import s.implicits._
    val l = (1 to 100).map(i => (i % 5L, i.toLong)).toDF("k", "t")
    val r = (1 to 50).map(i => (i % 5L, i.toLong, i * 1.0)).toDF("k", "t", "px")
    val plan = AsofJoin.asofJoin(l, r, "k", "k", "t", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    // no join operator at all: the as-of is the union + window carry
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }
}

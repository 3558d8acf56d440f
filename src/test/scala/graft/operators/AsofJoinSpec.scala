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

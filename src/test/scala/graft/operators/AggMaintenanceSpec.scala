package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental grouped-aggregate state: the merge invariant
  * (merge(agg(a), agg(b)) == agg(a ∪ b)), one-sided groups, null
  * measures, and the layout guard. */
class AggMaintenanceSpec extends SparkTestBase {

  test("mergeAggState(aggState(a), aggState(b)) == aggState(a ∪ b) — " +
    "including groups present on only one side and null measures") {
    val s = spark; import s.implicits._
    val a = Seq[(String, java.lang.Double)](
      ("x", 1.0), ("x", 3.0), ("y", 5.0), ("n", null))
      .toDF("k", "v")
    val b = Seq[(String, java.lang.Double)](
      ("x", 2.0), ("z", 7.0), ("n", null)) // z only in the delta
      .toDF("k", "v")
    val merged = AggMaintenance.mergeAggState(
      AggMaintenance.aggState(a, Seq("k"), sumCols = Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v")),
      AggMaintenance.aggState(b, Seq("k"), sumCols = Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v")),
      Seq("k"), sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    val scratch = AggMaintenance.aggState(a.unionByName(b), Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(merged) == rows(scratch),
      s"merged=${rows(merged)} scratch=${rows(scratch)}")
    // spot the semantics: y only in a, z only in b, n counts null rows
    val m = merged.collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m("y") == Seq(1L, 5.0, 5.0, 5.0))
    assert(m("z") == Seq(1L, 7.0, 7.0, 7.0))
    assert(m("n") == Seq(2L, null, null, null),
      "all-null measures must stay null, never fabricate a zero")
  }

  test("mergeAggState fails fast on a layout mismatch (a state built " +
    "with different measures cannot silently merge)") {
    val s = spark; import s.implicits._
    val a = Seq(("x", 1.0)).toDF("k", "v")
    val good = AggMaintenance.aggState(a, Seq("k"), sumCols = Seq("v"))
    val bad = AggMaintenance.aggState(a, Seq("k"), minCols = Seq("v"))
    intercept[IllegalArgumentException](
      AggMaintenance.mergeAggState(good, bad, Seq("k"),
        sumCols = Seq("v")))
  }

  test("applyChangesToAggState == aggState(post-apply facts): deletes " +
    "decrement counts/sums in closed form, a delete-touched key's " +
    "min/max rebuild from facts, a fully-deleted key vanishes, and an " +
    "UNTOUCHED key's state row passes through byte-identical") {
    val s = spark; import s.implicits._
    val pre = Seq(
      ("x", 1.0), ("x", 3.0), ("x", 9.0), // x: delete the 9.0 (its max)
      ("y", 5.0), ("y", 2.0),             // y: fully deleted
      ("u", 4.0), ("u", 6.0))             // u: untouched
      .toDF("k", "v")
    val changes = Seq(
      ("x", 9.0, "D"), ("y", 5.0, "D"), ("y", 2.0, "D"),
      ("x", 0.5, "I"), ("z", 7.0, "I")) // z: brand-new key
      .toDF("k", "v", "op")
    val post = Seq( // pre − deletes ∪ inserts
      ("x", 1.0), ("x", 3.0), ("x", 0.5),
      ("u", 4.0), ("u", 6.0), ("z", 7.0)).toDF("k", "v")
    val state0 = AggMaintenance.aggState(pre, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    val got = AggMaintenance.applyChangesToAggState(state0, changes,
      post, Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
      maxCols = Seq("v"))
    val scratch = AggMaintenance.aggState(post, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(got) == rows(scratch),
      s"got=${rows(got)} scratch=${rows(scratch)}")
    val m = got.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(!m.contains("y"), "a fully-deleted key must vanish")
    assert(m("x") == Seq(3L, 4.5, 0.5, 3.0),
      s"x must lose its deleted max (9.0 -> 3.0): ${m("x")}")
    assert(m("z") == Seq(1L, 7.0, 7.0, 7.0))
    // the untouched key's row is the STATE's row, bit for bit
    val before = state0.where(col("k") === "u").collect().head.toSeq
    assert(m("u") == before.drop(1), "untouched key must pass through")
  }

  test("applyChangesToAggState: a count/sum-only state folds deletes " +
    "with ZERO fact reads (facts is call-by-name and must never be " +
    "evaluated), and the min/max rebuild is a broadcast semi-join on " +
    "facts — never a full-state rejoin") {
    val s = spark; import s.implicits._
    val pre = Seq(("x", 1.0), ("x", 3.0), ("y", 5.0)).toDF("k", "v")
    val changes = Seq(("x", 3.0, "D"), ("y", 2.0, "I")).toDF("k", "v", "op")
    val state0 = AggMaintenance.aggState(pre, Seq("k"), sumCols = Seq("v"))
    val got = AggMaintenance.applyChangesToAggState(state0, changes,
      sys.error("count/sum-only maintenance must not read facts"),
      Seq("k"), sumCols = Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == Map("x" -> ((1L, 1.0)), "y" -> ((2L, 7.0))), s"$got")
    // with min/max, the plan reads facts ONLY under a left-semi join
    // against the (broadcast) delete-touched keys
    val post = Seq(("x", 1.0), ("y", 5.0), ("y", 2.0)).toDF("k", "v")
    val state1 = AggMaintenance.aggState(pre, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"))
    val df = AggMaintenance.applyChangesToAggState(state1, changes, post,
      Seq("k"), sumCols = Seq("v"), minCols = Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"fact rebuild must be a semi-join on touched keys:\n$plan")
  }

  test("applyChangesToAggState: deletesPresent=Some(false) skips the " +
    "min/max repair branch entirely — facts is NEVER forced even when " +
    "min/max columns are tracked (the delete-free streaming batch)") {
    val s = spark; import s.implicits._
    val pre = Seq(("x", 1.0), ("x", 3.0), ("y", 5.0)).toDF("k", "v")
    val changes = Seq(("x", 7.0, "I"), ("z", 2.0, "I")).toDF("k", "v", "op")
    val state0 = AggMaintenance.aggState(pre, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    val got = AggMaintenance.applyChangesToAggState(state0, changes,
      sys.error("a delete-free batch must not read facts"),
      Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
      maxCols = Seq("v"), deletesPresent = Some(false))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == Map(
      "x" -> ((3L, 11.0, 1.0, 7.0)),
      "y" -> ((1L, 5.0, 5.0, 5.0)),
      "z" -> ((1L, 2.0, 2.0, 2.0))), s"$got")
  }

  test("applyChangesToAggState: a LYING deletesPresent=Some(false) with " +
    "a D row actually present fails loudly when min/max are tracked — " +
    "never stale min/max; sum-only states still fold (no repair exists " +
    "to skip)") {
    val s = spark; import s.implicits._
    val pre = Seq(("x", 1.0), ("x", 3.0)).toDF("k", "v")
    val changes = Seq(("x", 7.0, "I"), ("x", 3.0, "D")).toDF("k", "v", "op")
    val state0 = AggMaintenance.aggState(pre, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"))
    val e = intercept[Exception](
      AggMaintenance.applyChangesToAggState(state0, changes,
        sys.error("the lying branch must fail before facts is forced"),
        Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
        deletesPresent = Some(false)).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("deletesPresent"), s"${e.getClass}: $chain")
    // sum-only: decrements are closed-form, nothing is skipped — the
    // existing allowance stands
    val sumOnly = AggMaintenance.aggState(pre, Seq("k"), sumCols = Seq("v"))
    val got = AggMaintenance.applyChangesToAggState(sumOnly, changes,
      sys.error("sum-only must never read facts"),
      Seq("k"), sumCols = Seq("v"), deletesPresent = Some(false))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == Map("x" -> ((2L, 8.0))), s"$got")
  }

  test("applyChangesToAggState: native 'U' events (beforeImage) shift " +
    "sums by after−before with n untouched, fold the after image into " +
    "min/max, and repair U-touched keys from facts — equal to the " +
    "from-scratch aggregate of the post-apply facts") {
    val s = spark; import s.implicits._
    val pre = Seq(("x", 1.0), ("x", 3.0), ("y", 5.0), ("z", 9.0))
      .toDF("k", "v")
    // I(x,7); U(y, 5→6); D(z,9)
    val changes = Seq(
      ("x", 7.0, null.asInstanceOf[java.lang.Double], "I"),
      ("y", 6.0, java.lang.Double.valueOf(5.0), "U"),
      ("z", 9.0, null.asInstanceOf[java.lang.Double], "D"))
      .toDF("k", "v", "v_before", "op")
    val post = Seq(("x", 1.0), ("x", 3.0), ("x", 7.0), ("y", 6.0))
      .toDF("k", "v")
    val state0 = AggMaintenance.aggState(pre, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    val got = AggMaintenance.applyChangesToAggState(state0, changes, post,
      Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
      maxCols = Seq("v"),
      beforeImage = Some(c => col(c + "_before")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val want = AggMaintenance.aggState(post, Seq("k"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == want, s"$got vs $want")
    assert(got("y") == ((1L, 6.0, 6.0, 6.0)),
      "U must not change n; min/max must serve the after image")
  }

  test("applyChangesToAggState: a NULL before image on a 'U' row fails " +
    "loudly — a silent NULL shift would corrupt the sum") {
    val s = spark; import s.implicits._
    val state0 = AggMaintenance.aggState(
      Seq(("y", 5.0)).toDF("k", "v"), Seq("k"), sumCols = Seq("v"))
    val changes = Seq(("y", 6.0, null.asInstanceOf[java.lang.Double], "U"))
      .toDF("k", "v", "v_before", "op")
    val e = intercept[Exception](
      AggMaintenance.applyChangesToAggState(state0, changes,
        sys.error("sum-only U never reads facts"), Seq("k"),
        sumCols = Seq("v"),
        beforeImage = Some(c => col(c + "_before"))).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("before image"), s"${e.getClass}: $chain")
  }

  test("applyChangesToAggState: without beforeImage, 'U' stays an " +
    "unknown op — the I/D contract is unchanged") {
    val s = spark; import s.implicits._
    val state0 = AggMaintenance.aggState(
      Seq(("y", 5.0)).toDF("k", "v"), Seq("k"), sumCols = Seq("v"))
    val changes = Seq(("y", 6.0, "U")).toDF("k", "v", "op")
    intercept[Exception](
      AggMaintenance.applyChangesToAggState(state0, changes,
        sys.error("unreached"), Seq("k"), sumCols = Seq("v")).collect())
  }

  test("applyChangesToAggState fails fast on an unknown op value") {
    val s = spark; import s.implicits._
    val state0 = AggMaintenance.aggState(
      Seq(("x", 1.0)).toDF("k", "v"), Seq("k"), sumCols = Seq("v"))
    val changes = Seq(("x", 1.0, "UPSERT")).toDF("k", "v", "op")
    val e = intercept[Exception](
      AggMaintenance.applyChangesToAggState(state0, changes,
        sys.error("unreached"), Seq("k"), sumCols = Seq("v")).collect())
    assert(e.getMessage != null)
  }
}

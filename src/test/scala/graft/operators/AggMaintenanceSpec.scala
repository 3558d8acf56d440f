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
}

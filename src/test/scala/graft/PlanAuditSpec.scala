package graft

/** Physical-plan regression guards: the 100TB properties (pushdown,
  * pruning, broadcast choice, top-k short-circuit, partial aggregation)
  * asserted on the actual planned queries, so a refactor that silently
  * drops one fails the suite rather than only showing up at scale.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter pushed to parquet + map-side partial aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
    assert(p.contains("partial_sum"))
  }

  test("q02: column-pruned scan (no unused columns read)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity"))
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q05: dimension tables broadcast, no cartesian product") {
    val p = plan("q05_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "supplier/nation/region should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q07: anti-join with the date filter pushed down") {
    val p = plan("q07_anti_join")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("q10: global sort+limit plans as TakeOrderedAndProject") {
    val p = plan("q10_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort ["), "full sort materialization instead of top-k")
  }

  test("d01: single scan with partial aggregation (map-side md5+combine)") {
    val p = plan("d01_exact_dedup")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(p.contains("partial_"))
  }

  test("s01: query side broadcast (corpus never shuffles for scoring)") {
    val p = plan("s01_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }
}

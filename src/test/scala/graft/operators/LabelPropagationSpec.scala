package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Seeded label propagation: hop-by-hop spread, clamped seeds,
  * deterministic tie-breaks, weighted votes, and partitioning
  * invariance. */
class LabelPropagationSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
                  iters: Int): Map[Long, String] = {
    val s = spark; import s.implicits._
    LabelPropagation.propagateLabels(edges.toDF("id1", "id2"),
        seeds.toDF("id", "label"), iters)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
  }

  test("labels spread one hop per round; unreached nodes stay null; " +
    "seeds clamp against their neighbors") {
    // chain 1(seed x) - 2 - 3 - 4, plus seed 9 labeled y adjacent to
    // three x-labeled nodes after round 2 — 9 must keep y (clamped)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 9L))
    val seeds = Seq(1L -> "x", 9L -> "y")
    val r1 = run(edges, seeds, 1)
    // round 1: 2 sees {x (from 1), y (from 9)} -> tie -> smaller label x
    assert(r1 == Map(1L -> "x", 2L -> "x", 3L -> null, 4L -> null,
      9L -> "y"), s"got $r1")
    val r2 = run(edges, seeds, 2)
    assert(r2(3L) == "x" && r2(4L) == null && r2(9L) == "y", s"got $r2")
    val r3 = run(edges, seeds, 3)
    assert(r3(4L) == "x" && r3(9L) == "y", s"got $r3")
  }

  test("majority wins with exact counts; duplicate edges weight the " +
    "vote; a seed outside the graph keeps its label; results are " +
    "partitioning-invariant") {
    val s = spark; import s.implicits._
    // node 10: neighbors labeled z twice (parallel edges to 20) and
    // w once -> z wins despite w < z alphabetically
    val edges = Seq((10L, 20L), (10L, 20L), (10L, 30L))
    val seeds = Seq(20L -> "z", 30L -> "w", 99L -> "q") // 99 isolated
    val r = run(edges, seeds, 1)
    assert(r == Map(10L -> "z", 20L -> "z", 30L -> "w", 99L -> "q"),
      s"got $r")
    // equal counts -> smallest label
    val rTie = run(Seq((10L, 20L), (10L, 30L)), seeds, 1)
    assert(rTie(10L) == "w", s"tie must break to the smaller label: $rTie")
    // invariance under a different input partitioning
    val big = (1L to 60L).map(i => (i, (i % 20) + 100L))
    val bigSeeds = Seq(101L -> "a", 105L -> "b", 110L -> "c")
    val base = LabelPropagation.propagateLabels(
        big.toDF("id1", "id2"), bigSeeds.toDF("id", "label"), 3)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val shuffled = LabelPropagation.propagateLabels(
        big.toDF("id1", "id2").repartition(7),
        bigSeeds.toDF("id", "label"), 3)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(base == shuffled)
    intercept[IllegalArgumentException](
      LabelPropagation.propagateLabels(big.toDF("id1", "id2"),
        bigSeeds.toDF("id", "label"), 0))
  }
}

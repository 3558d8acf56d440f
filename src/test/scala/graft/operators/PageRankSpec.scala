package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: hand-computed rounds, dangling redistribution,
  * mass accounting, and determinism across partitionings. */
class PageRankSpec extends SparkTestBase {

  test("one hand-computed round: A->B, A->C, B->C at d=1/2, scale=300 — " +
    "integer truncation and the dangling correction land exactly") {
    val s = spark; import s.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    // r0 = 100 each; teleport = 50; dangling = r(c) = 100, /n = 33
    // r(a) = 50 + (0   + 33) div 2 = 66
    // r(b) = 50 + (50  + 33) div 2 = 91
    // r(c) = 50 + (150 + 33) div 2 = 141
    val got = PageRank.pageRankFixedPoint(edges, iters = 1,
      dampNum = 1L, dampDen = 2L, scale = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 66L, "b" -> 91L, "c" -> 141L), s"got $got")
  }

  test("mass is conserved up to truncation leak and the authority node " +
    "ranks first; the result is identical under a different partitioning") {
    val s = spark; import s.implicits._
    // a small hub graph: everyone links to 0, plus a ring
    val edges = ((1L to 20L).map(i => (i, 0L)) ++
      (1L to 20L).map(i => (i, i % 20 + 1))).toDF("src", "dst")
    val r = PageRank.pageRankFixedPoint(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 990000000000L,
      s"mass must only leak at the truncated digit: $total")
    assert(r(0L) == r.values.max, "the hub must carry the top rank")
    val r2 = PageRank.pageRankFixedPoint(edges.repartition(7), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == r, "fixed-point ranks must not depend on partitioning")
  }

  test("overflow guard: an equivalent-but-larger damping fraction " +
    "gcd-normalizes (identical ranks); an irreducible numerator over " +
    "Long.MaxValue/(2*scale) fails fast instead of silently overflowing") {
    val s = spark; import s.implicits._
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val base = PageRank.pageRankFixedPoint(e, iters = 1,
      dampNum = 1L, dampDen = 2L, scale = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eq = PageRank.pageRankFixedPoint(e, iters = 1,
      dampNum = 500L, dampDen = 1000L, scale = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eq == base, "500/1000 must compute bit-identical to 1/2")
    // at scale 1e15 the bound is Long.MaxValue/(2e15) ~ 4611:
    // 17000/20000 normalizes to 17/20 and runs (the ADVICE scenario) —
    PageRank.pageRankFixedPoint(e, iters = 1,
      dampNum = 17000L, dampDen = 20000L, scale = 1000000000000000L)
    // — while an IRREDUCIBLE over-bound numerator fails fast
    intercept[IllegalArgumentException](
      PageRank.pageRankFixedPoint(e, iters = 1,
        dampNum = 4999L, dampDen = 5000L, scale = 1000000000000000L))
  }

  test("guards: empty graph, bad damping, bad scale") {
    val s = spark; import s.implicits._
    intercept[IllegalArgumentException](
      PageRank.pageRankFixedPoint(
        Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 1))
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](
      PageRank.pageRankFixedPoint(e, iters = 0))
    intercept[IllegalArgumentException](
      PageRank.pageRankFixedPoint(e, iters = 1, dampNum = 21L))
    intercept[IllegalArgumentException](
      PageRank.pageRankFixedPoint(e, iters = 1,
        scale = 10000000000000000L))
  }

  test("personalized: hand-computed rounds — teleport and dangling mass " +
    "return to the seeds, an unlinked spam cycle holds zero mass, a seed " +
    "outside the graph keeps its mass; partitioning-invariant; empty " +
    "seed set rejected") {
    val s = spark; import s.implicits._
    // a->b, a->c, b->c (c dangling) plus a seedless 2-cycle {x, y}
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("x", "y"), ("y", "x")).toDF("src", "dst")
    val seeds = Seq("a").toDF("seed")
    // d=1/2, scale=300, seeds={a}: r0 = (a 300, rest 0); teleport(a)=150
    // round 1: dang = r(c) = 0; b <- 300 div 2 = 150; c <- 150 + 0
    //   a = 150 + (0 + 0) div 2 = 150; b = (150) div 2 = 75; c = 75
    // round 2: dang = r(c) = 75; b <- 150 div 2 = 75; c <- 75 + 75
    //   a = 150 + (0 + 75 div 1) div 2 = 187; b = 37; c = 75
    // x, y: no seed, no inbound mass ever -> 0 despite the dense cycle
    val got = PageRank.personalizedPageRankFixedPoint(edges, seeds,
      iters = 2, dampNum = 1L, dampDen = 2L, scale = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 187L, "b" -> 37L, "c" -> 75L,
      "x" -> 0L, "y" -> 0L), s"got $got")
    // a trusted seed OUTSIDE the crawl graph is a node by fiat: it is
    // dangling, so its whole mass returns to itself each round
    val z = PageRank.personalizedPageRankFixedPoint(
      Seq(("a", "b")).toDF("src", "dst"), Seq("z").toDF("seed"),
      iters = 1, dampNum = 1L, dampDen = 2L, scale = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(z == Map("z" -> 300L, "a" -> 0L, "b" -> 0L), s"got $z")
    // determinism across partitionings (the fixed-point claim)
    val r1 = PageRank.personalizedPageRankFixedPoint(edges, seeds, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = PageRank.personalizedPageRankFixedPoint(
      edges.repartition(7), seeds, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    intercept[IllegalArgumentException](
      PageRank.personalizedPageRankFixedPoint(edges,
        Seq.empty[String].toDF("seed"), iters = 1))
  }

  test("HITS: two hand-computed rounds on a bipartite graph — div " +
    "normalization, opposite-side scores decay to 0, partitioning " +
    "invariance, guards") {
    val s = spark; import s.implicits._
    // s1 -> {c1, c2}, s2 -> c1 at scale 100:
    // round 1: rawAuth c1=200 c2=100, max 200 -> div 2: c1=100 c2=50
    //   rawHub s1=150 s2=100, max 150 -> div 1: s1=150 s2=100
    // round 2: rawAuth c1=250 c2=150, max 250 -> div 2: c1=125 c2=75
    //   rawHub s1=200 s2=125, max 200 -> div 2: s1=100 s2=62
    val edges = Seq(("s1", "c1"), ("s1", "c2"), ("s2", "c1"))
      .toDF("src", "dst")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = asMap(PageRank.hitsFixedPoint(edges, iters = 2, scale = 100L))
    assert(got == Map(
      "s1" -> ((100L, 0L)), "s2" -> ((62L, 0L)),
      "c1" -> ((0L, 125L)), "c2" -> ((0L, 75L))), s"got $got")
    assert(asMap(PageRank.hitsFixedPoint(edges.repartition(5), iters = 2,
      scale = 100L)) == got, "HITS must not depend on partitioning")
    intercept[IllegalArgumentException](
      PageRank.hitsFixedPoint(edges, iters = 0))
    intercept[IllegalArgumentException](
      PageRank.hitsFixedPoint(
        Seq.empty[(String, String)].toDF("src", "dst"), iters = 1))
  }
}

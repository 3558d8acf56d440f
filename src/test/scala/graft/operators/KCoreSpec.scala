package graft.operators

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {

  private def coreR(edges: Seq[(Long, Long)], k: Int,
                    maxIterations: Int = 30): (Map[Long, Long], Int) = {
    import spark.implicits._
    val r = KCore.kCoreWithRounds(edges.toDF("id1", "id2"), k,
      maxIterations = maxIterations)
    (r.nodes.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap,
      r.rounds)
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
                   maxIterations: Int = 30): Map[Long, Long] =
    coreR(edges, k, maxIterations)._1

  test("K4 with a pendant chain: the 3-core is exactly the K4") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    // chain 4-5-6 hangs off the clique
    val g = k4 ++ Seq((4L, 5L), (5L, 6L))
    val (got, rounds) = coreR(g, 3)
    assert(got == (1L to 4L).map(_ -> 3L).toMap)
    assert(rounds >= 2, "peeling 6 then 5 must take more than one round")
  }

  test("triangle with a tail: the 2-core is the triangle; the 3-core " +
    "is empty; duplicates/reversed edges collapse first") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 1L),
      (3L, 4L), (4L, 5L))
    assert(core(g, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(g, 3) == Map.empty)
  }

  test("an already-k-core graph converges in one no-op round") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val (got, rounds) = coreR(k4, 3)
    assert(got == (1L to 4L).map(_ -> 3L).toMap)
    assert(rounds == 1)
  }

  test("round counts are per-call, not cross-readable: two interleaved " +
    "results each carry their own rounds") {
    import spark.implicits._
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val chained = k4 ++ Seq((4L, 5L), (5L, 6L)) // 2+ peeling rounds
    // interleave: build both results BEFORE consuming either — a
    // ThreadLocal would have clobbered the first call's count
    val r1 = KCore.kCoreWithRounds(chained.toDF("id1", "id2"), 3)
    val r2 = KCore.kCoreWithRounds(k4.toDF("id1", "id2"), 3)
    assert(r1.rounds >= 2 && r2.rounds == 1,
      s"per-call rounds must not cross-read: ${r1.rounds}, ${r2.rounds}")
    assert(r1.nodes.count() == 4 && r2.nodes.count() == 4)
  }

  test("non-convergence within maxIterations fails loudly, never " +
    "returns a half-peeled set") {
    // a long path at k=2 peels two endpoints per round — needs many
    // rounds, so a budget of 1 must throw
    val path = (1L until 12L).map(i => (i, i + 1L))
    intercept[IllegalStateException](core(path, 2, maxIterations = 1))
  }
}

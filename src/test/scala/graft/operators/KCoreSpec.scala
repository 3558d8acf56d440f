package graft.operators

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {

  private def core(edges: Seq[(Long, Long)], k: Int,
                   maxIterations: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    KCore.kCore(edges.toDF("id1", "id2"), k, maxIterations = maxIterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4 with a pendant chain: the 3-core is exactly the K4") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    // chain 4-5-6 hangs off the clique
    val g = k4 ++ Seq((4L, 5L), (5L, 6L))
    assert(core(g, 3) == (1L to 4L).map(_ -> 3L).toMap)
    assert(KCore.lastRounds >= 2,
      "peeling 6 then 5 must take more than one round")
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
    assert(core(k4, 3) == (1L to 4L).map(_ -> 3L).toMap)
    assert(KCore.lastRounds == 1)
  }

  test("non-convergence within maxIterations fails loudly, never " +
    "returns a half-peeled set") {
    // a long path at k=2 peels two endpoints per round — needs many
    // rounds, so a budget of 1 must throw
    val path = (1L until 12L).map(i => (i, i + 1L))
    intercept[IllegalStateException](core(path, 2, maxIterations = 1))
  }
}

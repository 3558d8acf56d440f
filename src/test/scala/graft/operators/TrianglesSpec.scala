package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class TrianglesSpec extends SparkTestBase {

  private def counts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    Triangles.triangleCounts(edges.toDF("id1", "id2"))
      .collect()
      .map { case Row(id: Long, d: Long, t: Long, l: Double) => id -> (d, t, l) }
      .toMap
  }

  test("hand-computed graph: triangle + pendant + bridge") {
    // K3 {1,2,3}, pendant 4 off 3, and a second triangle {3,4,5}
    // sharing node 3 via edges (3,4),(4,5),(5,3)
    val r = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 3L)))
    assert(r(1L) == ((2L, 1L, 1.0)))
    assert(r(2L) == ((2L, 1L, 1.0)))
    // node 3: degree 4, in both triangles, lcc = 2*2/(4*3) = 1/3
    assert(r(3L)._1 == 4L && r(3L)._2 == 2L)
    assert(math.abs(r(3L)._3 - 1.0 / 3.0) < 1e-15)
    assert(r(4L) == ((2L, 1L, 1.0)))
    assert(r(5L) == ((2L, 1L, 1.0)))
  }

  test("triangle-free graph (star) counts zero with lcc 0") {
    val r = counts(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(r(1L) == ((3L, 0L, 0.0)))
    assert(r(2L) == ((1L, 0L, 0.0)))
  }

  test("self-loops and duplicate/reversed edges collapse to the simple graph") {
    val r = counts(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)))
    assert(r(1L) == ((2L, 1L, 1.0)))
    assert(r(2L) == ((2L, 1L, 1.0)))
    assert(r(3L) == ((2L, 1L, 1.0)))
  }

  test("K4: every node in 3 triangles, lcc 1") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val r = counts(k4)
    (1L to 4L).foreach { n => assert(r(n) == ((3L, 3L, 1.0))) }
  }

  test("degreeAssortativity: a star is exactly -1 (hand-computed: " +
    "m2=6, sx=12, sxy=18, sx2=30 -> -36/36); a regular graph is NULL " +
    "(0 denominator, never a fabricated value)") {
    import spark.implicits._
    val star = Triangles.degreeAssortativity(
      Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")).head()
    assert(star.getLong(0) == 3L && star.getDouble(1) == -1.0)
    val k3 = Triangles.degreeAssortativity(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id1", "id2")).head()
    assert(k3.getLong(0) == 3L && k3.isNullAt(1))
  }

  test("two disconnected components count independently") {
    val r = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)))
    assert(r(1L)._2 == 1L && r(10L) == ((1L, 0L, 0.0)))
  }
}

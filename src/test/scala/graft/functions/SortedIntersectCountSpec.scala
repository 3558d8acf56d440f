package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The zero-allocation verify kernel must count exactly what
  * size(array_intersect) counts on distinct inputs. */
class SortedIntersectCountSpec extends SparkTestBase {

  private def kernel(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftColumnBridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  test("matches size(array_intersect) on 200 random distinct sets in one " +
    "pass — empty, disjoint and extreme-value edges included") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val cases = (0 until 200).map { i =>
      def set() = Array.fill(rnd.nextInt(30))(rnd.nextLong() % 40).distinct
      (i, set(), set())
    } ++ Seq(
      (200, Array.empty[Long], Array(1L, 2L)),
      (201, Array(1L, 2L), Array.empty[Long]),
      (202, Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (203, Array(Long.MinValue, 0L, Long.MaxValue),
        Array(Long.MinValue, Long.MaxValue)))
    val df = cases.toDF("i", "a", "b")
      .withColumn("fast", kernel(array_sort(col("a")), array_sort(col("b"))))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.where(col("fast") =!= col("ref")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("duplicates count min-multiplicity (the documented contract)") {
    val s = spark; import s.implicits._
    val df = Seq((Array(1L, 1L, 2L), Array(1L, 2L, 2L))).toDF("a", "b")
    assert(df.select(kernel(col("a"), col("b"))).head().getLong(0) == 2L)
  }
}

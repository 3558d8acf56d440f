package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fork semantics, mirroring the reference's TestForkOperator
  * (marmaray/src/test/java/.../forkoperator/TestForkOperator.java:109-212):
  * overlapping keys, per-key counts, empty streams, unregistered-key
  * failure, valid/error split.
  */
class ForkSpec extends SparkTestBase {

  private lazy val df = {
    val s = spark; import s.implicits._
    (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "kind")
  }

  test("overlapping keys: records may carry several keys; counts from one action") {
    val fork = Fork(df, Seq((lit(true): Column) -> 0, (col("id") > 50) -> 1))
    try {
      assert(fork.inputCount == 100)
      assert(fork.count(0) == 100)
      assert(fork.count(1) == 50)
      assert(fork.stream(0).count() == 100)
      assert(fork.stream(1).count() == 50)
      // the tag column never leaks to consumers
      assert(fork.stream(0).columns.toSeq == Seq("id", "kind"))
    } finally fork.close()
  }

  test("key matching nothing: count 0 and empty stream (not missing)") {
    val fork = Fork(df, Seq((col("id") > 1000) -> 3, (lit(true): Column) -> 7))
    try {
      assert(fork.count(3) == 0)
      assert(fork.stream(3).count() == 0)
      assert(fork.count(7) == 100)
    } finally fork.close()
  }

  test("unregistered key rejected (reference ForkFunction.java:76-84)") {
    val fork = Fork(df, Seq((lit(true): Column) -> 0))
    try intercept[IllegalArgumentException](fork.stream(9))
    finally fork.close()
  }

  test("duplicate fork keys rejected at construction") {
    intercept[IllegalArgumentException](
      Fork(df, Seq((lit(true): Column) -> 0, (col("id") > 5) -> 0)))
  }

  test("validErrorSplit: null error column = valid(0), else error(1)") {
    val withErr = df.withColumn("err",
      when(col("id") % 10 === 0, lit("bad")).otherwise(lit(null)))
    val fork = Fork.validErrorSplit(withErr, "err")
    try {
      assert(fork.count(0) == 90)
      assert(fork.count(1) == 10)
      assert(fork.stream(1).agg(min(col("id"))).head().getLong(0) == 10L)
    } finally fork.close()
  }

  test("post-close recompute: streams stay correct after unpersist") {
    // m06 certifies the persisted path; this covers the other lifecycle —
    // a consumer holding a stream past close() gets the same rows back
    // (the plan recomputes from source, it doesn't dangle).
    val fork = Fork(df, Seq((col("id") > 50) -> 1))
    val s1 = fork.stream(1)
    fork.close()
    assert(s1.count() == 50)
    assert(fork.count(1) == 50) // counts were captured at materialization
  }

  test("a record matching no condition appears in no stream but counts as input") {
    val fork = Fork(df, Seq((col("kind") === "even") -> 0))
    try {
      assert(fork.inputCount == 100)
      assert(fork.count(0) == 50)
      assert(fork.stream(0).count() == 50)
    } finally fork.close()
  }
}

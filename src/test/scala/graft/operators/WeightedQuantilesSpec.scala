package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WeightedQuantilesSpec extends SparkTestBase {

  test("weightedQuantiles: hand-checked multiset semantics, ties, " +
    "integer p*W boundary, zero weights dropped") {
    val s = spark; import s.implicits._
    val df = Seq(
      // stratum a: multiset {1,2,3,4} (unit weights) -> 1 / 2 / 3
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L), ("a", 4L, 1L),
      // stratum b: {1 x3, 9 x1} -> wq75 at rank ceil(3)=3 -> 1
      ("b", 1L, 3L), ("b", 9L, 1L),
      // stratum c: tied VALUES share their full mass (RANGE frame):
      // {5 x2 (two rows), 7 x2} -> W=4, wq25 rank 1 -> 5, wq50 rank 2 -> 5
      ("c", 5L, 1L), ("c", 5L, 1L), ("c", 7L, 2L),
      // stratum d: zero-weight row must NOT be selectable
      ("d", 1L, 0L), ("d", 2L, 5L)
    ).toDF("src", "v", "w")
    val out = WeightedQuantiles.weightedQuantiles(df, "src", "v", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((1L, 2L, 3L, 4L)), s"got ${out("a")}")
    assert(out("b") == ((1L, 1L, 1L, 4L)), s"got ${out("b")}")
    assert(out("c") == ((5L, 5L, 7L, 4L)), s"got ${out("c")}")
    assert(out("d") == ((2L, 2L, 2L, 5L)), s"got ${out("d")}")
  }

  test("weightedQuantiles: equals the expanded-multiset quantile on a " +
    "seeded random frame; partitioning independence") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (st <- Seq("x", "y", "z"); _ <- 1 to 40)
      yield (st, rnd.nextInt(20).toLong, rnd.nextInt(4).toLong) // w in 0..3
    val df = rows.toDF("src", "v", "w")
    // brute force: explode each row into w copies, then pick the value at
    // rank ceil(p*W) per stratum — the multiset definition itself
    val exp = df.where(col("w") > 0)
      .select(col("src"), col("v"),
        explode(sequence(lit(1L), col("w"))).as("__i")).drop("__i")
    val n = exp.groupBy("src").count()
    val ranked = exp
      .withColumn("__r", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("src").orderBy("v")))
      .join(n, "src")
    def atP(p: Double) = min(when(col("__r") >= ceil(lit(p) * col("count")),
      col("v")))
    val naive = ranked.groupBy("src")
      .agg(atP(0.25).as("wq25"), atP(0.5).as("wq50"), atP(0.75).as("wq75"),
        max(col("count")).as("total_weight"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def run(d: org.apache.spark.sql.DataFrame) =
      WeightedQuantiles.weightedQuantiles(d, "src", "v", "w")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(run(df) == naive, s"got ${run(df)} want $naive")
    assert(run(df.repartition(7)) == naive, "partitioning independence")
  }

  test("weightedQuantiles: ONE exchange — both windows and the final agg " +
    "ride the same stratum hash partitioning") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L, 2L), ("b", 3L, 1L)).toDF("src", "v", "w")
    val out = WeightedQuantiles.weightedQuantiles(df, "src", "v", "w")
    val plan = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles:\n$plan")
  }
}

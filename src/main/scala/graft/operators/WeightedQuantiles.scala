package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact WEIGHTED grouped quantiles — the inverse-CDF (type-1) quantile of
  * the multiset where each row counts `weight` times: the smallest value v
  * whose cumulative weight reaches p x total. The curation shape: "median
  * doc length by TOKEN MASS, per source" weighs a 10k-token doc 10k times
  * — the unweighted median (q19's percentile) answers a different question
  * the moment doc sizes skew, which at 100TB they always do.
  *
  * One exchange: both windows (the running RANGE-frame cumulative weight,
  * whose default frame makes ties share their full tied mass — exactly the
  * multiset semantics — and the partition-total) hash-partition by the
  * stratum, and the final groupBy reuses that partitioning. Nothing but
  * (stratum, value, weight) triples ever shuffle.
  *
  * Exactness contract: weights are summed as LONGs and `ps` must be dyadic
  * rationals (0.25/0.5/0.75...), so `cum >= p * tot` compares exactly-
  * representable doubles — bit-identical to an engine that materializes
  * the expanded multiset and indexes rank ceil(p*W) (DuckDB quantile_disc;
  * the oracle does exactly that). Zero-weight rows are dropped first (a
  * row that appears 0 times in the multiset), matching the expansion;
  * negative weights are the caller's bug. ps must lie in (0, 1].
  *
  * Output: (strataCol, <one col per ps name>, total_weight). */
object WeightedQuantiles {

  def weightedQuantiles(df: DataFrame, strataCol: String, valueCol: String,
                        weightCol: String,
                        ps: Seq[(String, Double)] =
                          Seq(("wq25", 0.25), ("wq50", 0.5), ("wq75", 0.75)))
      : DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"ps must lie in (0, 1]: $ps")
    val byValue = Window.partitionBy(col(strataCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(strataCol))
    val staged = df
      .select(col(strataCol), col(valueCol),
        col(weightCol).cast("long").as("__w"))
      .where(col("__w") > 0)
      .withColumn("__cum", sum(col("__w")).over(byValue))
      .withColumn("__tot", sum(col("__w")).over(whole))
    val qs = ps.map { case (name, p) =>
      min(when(col("__cum") >= lit(p) * col("__tot"), col(valueCol))).as(name)
    }
    staged.groupBy(col(strataCol))
      .agg(qs.head, (qs.tail :+ max(col("__tot")).as("total_weight")): _*)
  }
}

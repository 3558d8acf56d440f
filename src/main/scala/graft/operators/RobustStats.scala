package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stratum ROBUST location/scale and outlier counts: median, MAD
  * (median absolute deviation) and the count of rows beyond `cutoff` MADs
  * (the Hampel rule, cutoff 3.5 by convention). Mean/stddev-based z-scores
  * are exactly what a scraped corpus breaks — one 10MB artifact drags the
  * mean of its whole source — while median/MAD stay put; this is the
  * per-source "is this doc length/score plausible for its source" gate.
  *
  * Exactness contract (the q19 house convention): values are
  * integer-valued, so the interpolating median lands on halves, absolute
  * deviations on halves, the MAD on quarters, and `cutoff` must be a small
  * dyadic rational (3.5 = 7/2) — every comparison is then between
  * exactly-representable doubles and the result is bit-identical to
  * DuckDB's native `median` on the same data.
  *
  * Scale shape: two grouped exact percentiles over (stratum, value) pairs
  * — two exchanges of a 2-column projection, text never shuffles. The
  * per-stratum medians/MADs are tiny aggregate frames and join back
  * broadcast. Exact medians hold to millions of rows PER STRATUM (the
  * agg buffers the group's values); at a 100TB corpus with billions per
  * stratum, swap the inner percentile for the d54 histogram-windowed
  * form — the outer counting logic is unchanged.
  *
  * Output: (strataCol, med, mad, n, n_outliers). */
object RobustStats {

  /** Winsorized per-stratum mean: clamp every value into the stratum's
    * [pLo, pHi] percentile band, then average — the robust location
    * estimate that keeps the MASS information the median throws away
    * while still bounding any single artifact's pull. Exactness needs
    * DYADIC percentiles (default the IQR, 1/4 and 3/4): the interpolated
    * quantile of integer values then lands on exact quarters under any
    * evaluation order (a non-dyadic p like 0.05 is formula-order-
    * dependent at the last ulp across engines), clamped values stay
    * dyadic, their sum is exact, and the mean is ONE division.
    * Output: (strataCol, lo, hi, n, wmean). */
  def winsorizedMean(df: DataFrame, strataCol: String, valueCol: String,
                     pLo: Double = 0.25, pHi: Double = 0.75): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi, s"bad band [$pLo, $pHi]")
    val vals = df.select(col(strataCol), col(valueCol).cast("double").as("__v"))
    val qs = vals.groupBy(col(strataCol))
      .agg(expr(s"percentile(__v, $pLo)").as("lo"),
        expr(s"percentile(__v, $pHi)").as("hi"))
    vals.join(broadcast(qs), Seq(strataCol))
      .withColumn("__w", least(greatest(col("__v"), col("lo")), col("hi")))
      .groupBy(col(strataCol))
      .agg(max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        count(lit(1)).as("n"),
        (sum(col("__w")) / count(lit(1))).as("wmean"))
  }

  def robustOutlierStats(df: DataFrame, strataCol: String, valueCol: String,
                         cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, s"cutoff must be positive: $cutoff")
    val vals = df.select(col(strataCol), col(valueCol).cast("double").as("__v"))
    val med = vals.groupBy(col(strataCol))
      .agg(expr("percentile(__v, 0.5)").as("med"))
    val dev = vals.join(broadcast(med), Seq(strataCol))
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = dev.groupBy(col(strataCol))
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq(strataCol))
      .groupBy(col(strataCol))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(cutoff) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill / resample with last-observation-carried-forward
  * — the regularization pass upstream of any per-entity time model
  * (feature windows, rate limiting, forecasting): irregular event
  * streams become one row per (key, bucket) on a regular grid, holes
  * filled with the most recent observed value.
  *
  * Reference behavior context: the reference pipelines emit
  * per-partition time-bucketed metrics and rely on downstream
  * consumers to densify; here the densify is the operator.
  *
  * Scale shape: one (key, bucket) exchange for the per-bucket last
  * observation (a partial-aggregating `max(struct(ts, value))` — no
  * window over raw events), one tiny per-key span aggregate, a
  * `sequence`-explode for the grid (rows = span/bucket per key — pick
  * `bucketMicros` so that stays bounded; a year of hourly buckets is
  * 8.8k rows/key), then the LOCF window per key over GRID rows, never
  * raw events. Raw event payloads never enter the grid join — only
  * (key, bucket, value).
  *
  * Determinism: "last in bucket" is the max of (ts, value) — a total
  * order even under equal timestamps — and carried values are copied,
  * never recomputed, so doubles survive bit-exactly. Bucket indices
  * are exact FLOOR division of epoch-micros (pmod-subtract before the
  * divide), so they agree with an engine's integer `//` even for
  * pre-epoch timestamps. */
object GapFill {

  /** One row per (key, bucket) from each key's first observed bucket to
    * its last: `value` = the bucket's last observation, carried forward
    * across empty buckets; `observed` = whether the bucket had one.
    * `tsMicros` must be an epoch-microseconds LONG expression over the
    * input (callers with native timestamps pass `unix_micros(col)`). */
  def gapFillLocf(df: DataFrame, keyCol: String, tsMicros: Column,
                  valueCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be >= 1: $bucketMicros")
    // exact floor division: subtract the floor-mod first so the double
    // divide sees an exact multiple (a raw long/long quotient is a
    // DOUBLE whose truncation can disagree with integer floor division
    // at bucket boundaries)
    val tl = tsMicros.cast("long")
    val bucketIdx =
      ((tl - pmod(tl, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    val lastInBucket = df
      .select(col(keyCol), bucketIdx.as("bucket"),
        struct(tsMicros.cast("long").as("t"),
          col(valueCol).as("v")).as("__tv"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max(col("__tv")).getField("v").as("__obs"))
    val grid = lastInBucket.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastInBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("__obs"), ignoreNulls = true).over(w).as(valueCol),
        col("__obs").isNotNull.as("observed"))
  }
}

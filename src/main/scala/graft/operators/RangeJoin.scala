package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the non-equi join Spark plans as a
  * BroadcastNestedLoopJoin (or refuses outright as a cartesian product)
  * when written as `ON lo <= p AND p <= hi`. The standard fix is to
  * manufacture an equi key: intervals explode to the fixed-width bins
  * they cover, points map to their single containing bin, and the join
  * becomes a hash equi-join on the bin id with the exact bound check as
  * a post-filter. Each point lives in exactly ONE bin, so a (point,
  * interval) match is found exactly once — no dedup pass.
  *
  * Scale shape: shuffle (or broadcast, when the interval side is small —
  * Catalyst/AQE decides) on the bin key only; an interval of length L
  * explodes to ceil(L/binWidth)+1 rows, so `binWidth` near the typical
  * interval length keeps the blow-up at ~2x ([[suggestedBinWidth]]).
  * Hot bins (many intervals over one time window) are plain equi-join
  * skew — AQE's skew-join splitting applies, unlike the BNLJ the naive
  * form plans. Rows with null point/bounds are dropped, matching SQL
  * comparison semantics (NULL never satisfies the bound check).
  *
  * Time columns: convert to epoch micros first (`unix_micros`) — the
  * operator is deliberately numeric-only so the binning arithmetic is
  * exact integer work.
  */
object RangeJoin {

  /** Join `points` to every interval in `intervals` with
    * `lo <= point <= hi` (inclusive both ends). Output columns = point
    * columns ++ interval columns. `binWidth` > 0; see [[suggestedBinWidth]]. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val reserved = Seq("__bin")
    val clash = (points.columns ++ intervals.columns).filter(reserved.contains)
    require(clash.isEmpty, s"reserved column name in input: ${clash.mkString(",")}")
    require(!points.columns.exists(intervals.columns.contains),
      "point/interval column names must be disjoint: " +
        points.columns.toSet.intersect(intervals.columns.toSet).mkString(","))
    val p = points.where(col(pointCol).isNotNull)
      .withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val iv = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(floorDiv(col(loCol), binWidth),
          floorDiv(col(hiCol), binWidth))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: every (left, right) pair with
    * `lLo <= rHi AND rLo <= lHi` (inclusive overlap — touching endpoints
    * match). Same bin-key manufacture as [[pointInInterval]], with one
    * extra rule because a pair can now share SEVERAL bins: the match is
    * attributed to the single bin containing the overlap's START
    * (`max(lLo, rLo)`) — both intervals cover that bin by definition, so
    * the equi-join finds the pair there, and the post-filter keeps it
    * ONLY there, making each overlapping pair emitted exactly once with
    * no dedup pass. Output columns = left columns ++ right columns;
    * null/inverted intervals drop on both sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val clash = (left.columns ++ right.columns).filter(_ == "__bin")
    require(clash.isEmpty, "reserved column name in input: __bin")
    require(!left.columns.exists(right.columns.contains),
      "left/right column names must be disjoint: " +
        left.columns.toSet.intersect(right.columns.toSet).mkString(","))
    def explodeBins(df: DataFrame, lo: String, hi: String) = df
      .where(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin",
        explode(sequence(floorDiv(col(lo), binWidth), floorDiv(col(hi), binWidth))))
    explodeBins(left, lLo, lHi)
      .join(explodeBins(right, rLo, rHi), Seq("__bin"))
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === floorDiv(greatest(col(lLo), col(rLo)), binWidth))
      .drop("__bin")
  }

  /** Floor division in exact integer arithmetic, correct for negative
    * values (epoch times before 1970): SQL integer division truncates
    * toward zero, which would put -1 and +1 in the same bin, and a
    * double-division floor can round up at 2^50-scale micros. pmod is
    * always non-negative, so (c - pmod(c, w)) is the exact floor multiple. */
  private[graft] def floorDiv(c: org.apache.spark.sql.Column, w: Long) = {
    val exact = c.cast("long") - pmod(c.cast("long"), lit(w))
    // `exact` is the floor multiple of w; divide it with SQL `div`
    // (IntegralDivide) — exact over the FULL long range. Column `/` is
    // double division, which silently rounds the quotient for
    // |values| >= 2^53 (epoch nanos ~1.7e18) and mis-bins.
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.expression(exact),
        GraftColumnBridge.expression(lit(w)))).cast("long")
  }

  /** Bin width ≈ the mean interval length (one aggregate over the
    * interval table): each interval then covers ~2 bins — the blow-up /
    * bin-selectivity balance point for non-pathological length
    * distributions. Heavy-tailed interval lengths deserve a hand-picked
    * width (or an interval split upstream). */
  def suggestedBinWidth(intervals: DataFrame, loCol: String, hiCol: String): Long = {
    val row = intervals.select(
      org.apache.spark.sql.functions.avg(col(hiCol) - col(loCol)).cast("long"))
      .head()
    // avg() over zero rows is null — default to 1 rather than NPE
    if (row.isNullAt(0)) 1L else math.max(row.getLong(0), 1L)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single latest right
  * row with the same key and right time <= left time (or strictly <, see
  * `strict`). The standard event-stream / feature-store lookup ("what was
  * the last known state of X when this event happened"); Spark has no
  * native operator for it.
  *
  * Implementation is the merge-sorted union, NOT a range join: both sides
  * are tagged and unioned, then one window pass per key (ordered by time,
  * right rows sorting before left rows at equal timestamps — inclusive
  * `<=` semantics, matching DuckDB/kdb ASOF) carries the most recent
  * right-side payload forward into each left row.
  *
  * Scale shape: ONE co-partitioned shuffle per side on the join key and a
  * linear in-partition sort — no per-row range probe, no interval
  * cross-product, no broadcast requirement. Skewed keys are ordinary
  * window skew: the carry is a running `last` over a sort the window
  * already does, so a hot key costs one big sorted partition, not a
  * quadratic probe — if one key dominates, split it upstream (e.g. by
  * time range, carrying the boundary state) exactly as for any windowed
  * aggregation.
  *
  * Semantics at the edges (matching SQL comparison semantics):
  *   - right rows with a NULL key or NULL time are dropped (SQL `=` / `<=`
  *     on NULL match nothing — without the filter a null-time right row
  *     would sort first and leak its payload into unmatched left rows);
  *   - left rows with a NULL key or NULL time get a NULL payload (never
  *     dropped: output is exactly one row per left row);
  *   - right-side rows must be unique per (key, time) — pre-aggregate
  *     otherwise (equal-timestamp duplicates have no defined "latest").
  */
object AsofJoin {

  private val Reserved = "__"

  /** Left as-of join. `rightCols` are the right-side payload columns to
    * carry (nulled when no right row qualifies). Output: every left
    * column, then `rightCols`; exactly one row per left row.
    *
    * `strict`: require right time strictly < left time (a feature lookup
    * that must not see state written in the same instant).
    * `tolerance`: maximum lookback — a match older than
    * `leftTime - tolerance` is discarded (payload null). Pass an interval
    * for timestamp times (`expr("INTERVAL 30 DAYS")`) or a numeric for
    * numeric times; the bound is inclusive (rightTime >= leftTime -
    * tolerance), matching pandas `merge_asof(tolerance=...)`. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               strict: Boolean = false,
               tolerance: Option[Column] = None): DataFrame = {
    val leftOut = left.columns.toSeq
    require(rightCols.nonEmpty, "at least one right payload column required")
    // collision check honoring the session's resolution mode: Spark
    // resolution is case-insensitive by default, so a left "PX" and
    // payload "px" would pass a case-sensitive guard and yield an
    // ambiguous output — but under spark.sql.caseSensitive=true those
    // are distinct, legal columns, so compare exactly there
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val norm: String => String = if (caseSensitive) identity else _.toLowerCase
    val lowerOut = leftOut.map(norm).toSet
    val collide = rightCols.filter(c => lowerOut.contains(norm(c)))
    require(collide.isEmpty,
      s"right payload columns $collide collide with left columns")
    val reserved = (leftOut ++ rightCols).filter(_.startsWith(Reserved))
    require(reserved.isEmpty,
      s"column names $reserved collide with AsofJoin's internal '$Reserved' prefix — rename them")
    // the union would silently WIDEN mismatched key/time types (long vs
    // string times then sort lexicographically: '9' > '10') — fail loudly
    val (lk, rk) = (left.schema(leftKey).dataType, right.schema(rightKey).dataType)
    require(lk == rk, s"key types disagree: $leftKey is ${lk.simpleString}, " +
      s"$rightKey is ${rk.simpleString} — cast one side first")
    val (lt, rt) = (left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    require(lt == rt, s"time types disagree: $leftTime is ${lt.simpleString}, " +
      s"$rightTime is ${rt.simpleString} — cast one side first")
    // SQL comparison semantics: a NULL right key/time can never satisfy
    // `key = AND time <=`, so such rows must not enter the carry
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"),
        // the matched right TIME rides with the payload ONLY when a
        // tolerance bound needs to test it after the carry — without one
        // it would be a dead 8-bytes-per-right-row through the exchange,
        // sort, and carry
        struct((if (tolerance.isDefined) Seq(col(rightTime).as("__rt"))
          else Nil) ++ rightCols.map(col): _*).as("__rv"))
    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +:
        lit(if (strict) -1 else 1).as("__side") +: leftOut.map(col)): _*)
    // inclusive (<=): right rows (side 0) order BEFORE left rows (side 1)
    // at the same timestamp, so an exactly-simultaneous right row is
    // visible to the left row; strict (<): left rows take side -1 and
    // order before simultaneous right rows, hiding them. NULL left times
    // sort first (nulls-first ascending) — before every right row — so
    // they correctly carry nothing.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") =!= 0)
    val bounded = tolerance match {
      case Some(tol) => carried.withColumn("__asof",
        when(col("__asof").getField("__rt") >= col("__t") - tol, col("__asof")))
      case None => carried
    }
    bounded.select(leftOut.map(col) ++
      rightCols.map(c => col("__asof").getField(c).as(c)): _*)
  }
}

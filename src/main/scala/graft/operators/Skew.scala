package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling for 100TB joins/aggregations.
  *
  * AQE's skew-join split (enabled in GraftSession) fixes sort-merge joins
  * after a shuffle materializes; salting fixes the cases AQE can't: hot
  * keys in shuffle joins against a non-broadcastable side, and skewed
  * groupBy keys. The salt spreads one hot key over `saltFactor` reducers
  * at the cost of replicating the small side `saltFactor` times — the
  * classic space-for-balance trade.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join with the LARGE (skewed) side salted and the small side
    * replicated saltFactor times. Row-position-based salt (not a hash of
    * the row: identical hot rows must land on different reducers). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    val salted = large.withColumn(SaltCol,
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Two-stage salted count: partial counts on (keys, salt) — spreading a
    * hot key across reducers — then the final roll-up on keys alone. The
    * second shuffle carries one row per (key, salt), not per record. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    df.withColumn(SaltCol, pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Per-key frequencies of the top `k` heaviest keys — the reconnaissance
    * step before choosing a salt factor (or a broadcast threshold). */
  def topKeyCounts(df: DataFrame, keys: Seq[String], k: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(k)

  /** One-row skew report card for a prospective join/groupBy key — the
    * diagnostic a pipeline runs BEFORE committing a 100 TB shuffle to
    * that key (and the evidence behind a [[saltedJoin]] factor): the
    * per-key count distribution (exact quartiles — Spark `percentile`
    * and DuckDB `quantile_cont` share the p·(n−1) interpolation, and
    * integer counts interpolate to exactly-representable quarters, the
    * q19 contract), the max/mean skew ratio, and a suggested salt
    * factor = ceil(max_n · partitions / n_rows) computed in EXACT
    * integer arithmetic — 1 means the hottest key underfills one
    * average reducer (no salting needed); k means it would occupy k
    * reducers' worth of rows.
    *
    * Scale shape: one (keys) aggregate with map-side combine — rows
    * never shuffle, one count per distinct key does — then a 1-row
    * roll-up. A key column so hot that even ITS count aggregate skews
    * is exactly what [[saltedCount]] is for; this profile is the thing
    * that tells you. */
  def keyProfile(df: DataFrame, keys: Seq[String],
                 partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        expr("percentile(n, 0.25)").as("q25"),
        expr("percentile(n, 0.5)").as("q50"),
        expr("percentile(n, 0.75)").as("q75"))
      .withColumn("mean_n",
        col("n_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("skew_ratio",
        col("max_n").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"))
      // integral `div` (Spark `/` on longs is double division)
      .withColumn("salt_suggest",
        expr(s"(max_n * ${partitions}L + n_rows - 1L) div n_rows"))
  }
}

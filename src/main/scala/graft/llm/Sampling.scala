package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible subset selector a
  * training-data pipeline needs where `df.sample` cannot serve: membership
  * is a pure function of (salt, key), so the same doc lands in the sample
  * on every run, on any engine, at any partitioning/parallelism, and a
  * re-run over a GROWN corpus keeps every previously-selected doc (the
  * property that makes incremental corpus refreshes diff-friendly).
  * `df.sample`'s seeded RNG guarantees none of that: its draw depends on
  * partition layout, so a repartition or a second engine silently changes
  * the subset.
  *
  * Mechanism: keep a row iff the first 8 hex chars of md5(salt|key) fall
  * below the rate's threshold in the 32-bit hash space. The comparison is
  * LEXICOGRAPHIC on the lowercase hex — identical in any engine with md5,
  * no integer parsing — and the filter is map-side codegen'd: at 100 TB a
  * sample is one scan, no shuffle, with the filter pushed into the scan
  * where the source supports it. Rate resolution is 1/2^32 (~2.3e-10).
  *
  * Changing `salt` draws an independent sample; nested rates with one salt
  * NEST (rate 0.1 ⊂ rate 0.5 — useful for dataset-size ablations).
  */
object Sampling {

  /** Lowercase-hex threshold for `rate` in the 32-bit hash space. */
  private[graft] def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    f"${math.min((rate * 4294967296d).toLong, 4294967295L)}%08x"
  }

  /** The sampling hash: first 8 hex chars of md5(salt|key). */
  def sampleKey(key: Column, salt: String): Column =
    substring(md5(concat_ws("|", lit(salt), key.cast("string"))), 1, 8)


  /** Keep each row with probability `rate`, deterministically in `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "graft"): DataFrame =
    if (rate >= 1.0) df
    else df.where(sampleKey(col(keyCol), salt) < lit(rateThreshold(rate)))

  /** Per-stratum rates (e.g. per-language corpus rebalancing): rows in a
    * stratum listed in `rates` sample at that rate, others at
    * `defaultRate`. One scan, one codegen'd CASE — strata are enum-like
    * (languages, sources), so the literal chain stays small. */
  /** Take EXACTLY `n` rows per stratum (fewer if the stratum is smaller),
    * deterministically: rows rank by the sampling hash within their
    * stratum (key as tie-break for hash collisions), so the selection is
    * reproducible across runs/engines/partitionings — the balanced-subset
    * builder (n docs per language/source) `df.sample` can't give you.
    * Rates compose: the n-take of a stratum is a prefix of its m-take for
    * n <= m under one salt.
    *
    * Scale shape: one window per stratum, but the rank<=n filter pushes
    * map-side (Spark's WindowGroupLimit keeps a per-partition top-n heap
    * before the shuffle), so a billion-row stratum never sorts fully. */
  def stratifiedTake(df: DataFrame, keyCol: String, strataCol: String,
                     n: Int, salt: String = "graft"): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(!df.columns.contains("__rk"),
      "input already has a '__rk' column; rename it before stratifiedTake()")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(sampleKey(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n).drop("__rk")
  }

  /** Embedding-diversity take (the SemDeDup-adjacent curation step):
    * partition the embedding space into Voronoi cells over frozen
    * centroids (Similarity.assignCells — map-side argmin over centroid
    * literals, zero exchange) and take `nPerCell` docs per cell in the
    * salted-hash order of [[stratifiedTake]]. A plain hash sample
    * preserves the corpus's density skew (dominant semantic clusters
    * stay dominant); the per-cell take flattens it — dense regions
    * downsample hard, sparse regions survive (near-)whole.
    *
    * Scale shape: cell assignment rides the scan; nPerCell is small by
    * construction so stratifiedTake's map-side WindowGroupLimit heap
    * applies and each task forwards at most nlist·nPerCell rows into
    * the one exchange. Output is (id, cell) only — embeddings never
    * shuffle; join survivors back by id (mixTake's documented at-scale
    * shape). */
  def diversityTake(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Double]], nPerCell: Int,
                    salt: String = "graft"): DataFrame =
    stratifiedTake(
      Similarity.assignCells(emb, centroids, vecCol)
        .select(col(idCol), col("cell")),
      idCol, "cell", nPerCell, salt)

  /** Deterministic corpus-MIX sampling — downsample to a target
    * composition (the data-mixing step of a training pipeline: e.g. 50%
    * web / 30% code / 20% academic). `targets` are relative weights
    * (normalized internally); strata absent from `targets` are dropped.
    * The output is the LARGEST corpus satisfying the mix: with
    * normalized weights p_g and stratum counts n_g,
    * N = floor(min_g n_g / p_g) (the bottleneck stratum is kept ~whole)
    * and each stratum contributes c_g = min(floor(p_g * N), n_g) rows,
    * chosen by the same salted-hash order as [[stratifiedTake]] —
    * deterministic, partitioning-independent, engine-portable.
    *
    * Scale shape: one count aggregate (O(#strata) rows to the driver —
    * composition math is driver-side by design, like Fork's counts) plus
    * ONE windowed-take exchange (measured: mix_exchanges=1 in
    * SCALE_BENCH.json). The rank filter pushes map-side (a
    * WindowGroupLimit top-k heap before the shuffle) only when the
    * largest cutoff is within spark.sql.window.group.limit.threshold
    * (default 1000) — Spark rightly refuses a map-side top-200k heap,
    * so corpus-scale mixes run the per-stratum sort instead. That sort
    * is over whatever columns `df` carries: at real scale pass the
    * (key, strata) PROJECTION and semi-join the survivors back, so the
    * exchange and sort move ids, never text/embeddings — the shape
    * SCALE_BENCH's mix_* rows measure. */
  def mixTake(df: DataFrame, keyCol: String, strataCol: String,
              targets: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    targets.foreach { case (s, w) =>
      require(w > 0, s"weight for stratum '$s' must be > 0: $w") }
    val wsum = targets.values.sum
    val probs = targets.map { case (s, w) => s -> w / wsum }
    val inMix = df.where(col(strataCol).isin(targets.keys.toSeq: _*))
    // cast to string for the driver-side count map: a non-string strata
    // column (e.g. an int source id) otherwise throws an opaque
    // ClassCastException at getString, even though isin()/=== coerce fine
    val counts = inMix
      .groupBy(col(strataCol).cast("string").as("__stratum"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probs.keys.foreach { s =>
      require(counts.getOrElse(s, 0L) > 0L,
        s"stratum '$s' has no rows — the mix cannot be satisfied") }
    val total = probs.map { case (s, p) => math.floor(counts(s) / p) }.min.toLong
    val cuts = probs.map { case (s, p) =>
      s -> math.min(math.floor(p * total).toLong, counts(s)) }
    require(!df.columns.contains("__rk"),
      "input already has a '__rk' column; rename it before mixTake()")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(sampleKey(col(keyCol), salt).asc, col(keyCol).asc)
    val cutoff = cuts.foldLeft(lit(0L): Column) { case (acc, (s, c)) =>
      when(col(strataCol) === s, lit(c)).otherwise(acc)
    }
    // the per-stratum cutoff is a CASE expression, which Spark's
    // InferWindowGroupLimit cannot use — the extra LITERAL max-cutoff
    // conjunct restores the map-side top-k heap (WindowGroupLimit,
    // plan-asserted), then the exact per-stratum CASE filters the rest
    val maxCut = cuts.values.max
    inMix.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= lit(maxCut) && col("__rk") <= cutoff).drop("__rk")
  }

  /** Temperature-smoothed corpus mixing (the T5/multilingual sampling
    * rule, Raffel et al. JMLR'20 §3.4.3 / Conneau & Lample '19): sample
    * stratum i with probability ∝ n_i^alpha so the head is flattened
    * and the tail upsampled relative to proportional sampling. This
    * implementation fixes alpha = 0.5 (temperature 2, the common
    * operating point) because n^0.5 has a CROSS-ENGINE-EXACT form:
    * weights are floor(sqrt(n)) — IEEE sqrt is correctly rounded
    * everywhere — so weight sums and the T·w / (W·n) rate products stay
    * in INTEGER space until one final IEEE division, and a DuckDB/any-
    * engine twin derives bit-identical rates from the data alone
    * (general alpha needs pow(), which drifts across libms; for other
    * temperatures compute rates upstream and call stratifiedHashSample
    * directly).
    *
    * `totalTarget` is the expected output size; per-stratum rate_i =
    * min(1, totalTarget·w_i / (W·n_i)) with w_i = floor(sqrt(n_i)),
    * W = Σw. Rows keep/drop by the same salted-hash order as the rest
    * of the sampling family — deterministic, partitioning-independent,
    * engine-portable.
    *
    * Scale shape: one count aggregate (O(#strata) rows to the driver,
    * composition math driver-side by design like mixTake) plus one
    * map-side filter — no shuffle of data rows, no sort. */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        totalTarget: Long, salt: String = "graft"): DataFrame = {
    require(totalTarget >= 1, s"totalTarget must be >= 1: $totalTarget")
    val counts = df
      .groupBy(col(strataCol).cast("string").as("__stratum"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "input has no rows")
    val weights = counts.map { case (s, n) => s -> math.sqrt(n.toDouble).toLong }
    val wSum = weights.values.sum
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, (totalTarget * weights(s)).toDouble / (wSum * n).toDouble)
    }
    stratifiedHashSample(df, keyCol, strataCol, rates, defaultRate = 0.0, salt)
  }

  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double], defaultRate: Double,
                           salt: String = "graft"): DataFrame = {
    val sk = sampleKey(col(keyCol), salt)
    // rate >= 1.0 must keep EVERYTHING (matching hashSample's
    // short-circuit): a strict `< "ffffffff"` would drop keys whose
    // 32-bit hash is exactly 0xffffffff. Branch to a literal true;
    // codegen subexpression elimination keeps the md5 at one per row.
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true) else sk < lit(rateThreshold(rate))
    val cond = rates.foldLeft(keep(defaultRate)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, keep(rate)).otherwise(acc)
    }
    df.where(cond)
  }
}

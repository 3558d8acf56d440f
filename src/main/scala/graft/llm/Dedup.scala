package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. All hashing is md5-based so signatures are bit-identical
  * across engines, runs, and cluster layouts — at 100TB a dedup pass is
  * incremental (new shard vs. historical signatures), which only works if
  * the signature function is stable forever.
  *
  * Scale shape: signatures are map-side column expressions (no shuffle);
  * the only shuffles are the groupBy on band buckets (LSH) or fingerprints
  * (exact), each shuffling a few dozen bytes per doc, not the text.
  */
object Dedup {

  /** Exact dedup key (normalized md5 — see TextAnalysis.fingerprint). */
  def exactKey(text: Column): Column = TextAnalysis.fingerprint(text)

  /** Operator-cache hygiene: eagerly materialize `result` (lineage
    * truncated — reliable `checkpoint()` when the session has a
    * checkpoint dir, `localCheckpoint()` otherwise) and THEN release the
    * operator-scoped caches that fed it, with a blocking unpersist.
    *
    * Every pair-producing operator here persists an intermediate (band /
    * shingle / fingerprint frame) that two plan branches share. Before
    * round 6 those persists lived until session teardown — fine for a
    * one-query job, a storage leak in a long-lived session running many
    * pipelines (the bench had to drop ALL cached blocks between queries
    * to survive its own suite). The contract now: the operator's returned
    * frame is already materialized (its results are small — pairs and
    * decisions, never text), and nothing it persisted outlives the call.
    * connectedComponents has managed its own cache lifetime this way
    * since round 4; this extends the same persist → compute → unpersist
    * discipline to the producers. */
  private[graft] def materializeAndRelease(result: DataFrame,
                                           caches: DataFrame*): DataFrame = {
    val out = truncateFrame(result)
    caches.foreach(_.unpersist(blocking = true))
    out
  }

  /** Free the storage behind [[truncateFrame]]d INTERMEDIATES once every
    * consumer has materialized: a local checkpoint persists its RDD, and
    * those blocks otherwise outlive the operator call until ContextCleaner
    * GC — violating the "nothing an operator persisted outlives the call"
    * discipline above (ADVICE r17, the recall gauges' pair frames).
    * Reliable-checkpoint files are left to the checkpoint-dir lifecycle
    * (deleting files under a frame someone may still hold is not safe in
    * general); the block-level unpersist is a no-op there. Never call
    * this on a frame that is RETURNED to the caller. */
  private[graft] def releaseTruncated(frames: DataFrame*): Unit =
    frames.foreach { f =>
      f.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ =>
      }
    }

  /** Keep one doc per exact key: min id wins (deterministic). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__key", exactKey(col(textCol)))
    val keep = keyed.groupBy(col("__key")).agg(min(col(idCol)).as(idCol))
    // Self-join back on (key, id) to recover full rows; broadcast-ineligible
    // at scale but the join is on a pruned 2-column projection.
    keyed.join(keep, Seq("__key", idCol), "left_semi").drop("__key")
  }

  /** [[exactDedup]]'s decision view on the NORMALIZED fingerprint
    * ([[TextAnalysis.normalizedFingerprint]] — accent-folded,
    * case/punctuation/whitespace-insensitive): every row flagged, min id
    * per group keeps. Sits between the exact tier (d01) and the
    * similarity tiers (LSH/SimHash): it still groups on one hash — one
    * shuffle on a 3-column projection, no pair generation — but the key
    * survives the re-encodes that defeat a raw-text hash. */
  def normalizedDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("id"),
      TextAnalysis.normalizedFingerprint(col(textCol)).as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("id").asc)
    keyed.withColumn("keep", row_number().over(w) === 1)
  }

  /** Word k-shingles from a MATERIALIZED token-array column (stage
    * `tokens(lower(text))` in its own select first — the window lambda
    * references the token expression once per shingle, so an inline
    * tokenizer goes quadratic per document). */
  def shinglesFromTokens(toks: Column, k: Int = 3): Column = {
    val n = size(toks)
    when(n < k, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), n - k), i =>
        concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Convenience fused form for small inputs (see shinglesFromTokens). */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(TextAnalysis.tokens(lower(text)), k)

  /** MinHash signature (array<long>): one md5 per shingle expanded into
    * `numHashes` Kirsch–Mitzenmacher families (h1 + i*h2 over the two
    * unsigned 32-bit digest halves), minima taken in ONE codegen'd loop —
    * see graft.functions.MinhashMinima. Engine-portable: any engine with
    * md5 + 64-bit integers reproduces the signature bit-exactly (no
    * overflow: components < 2^36), which is what incremental cross-run
    * dedup state requires. Replaces the salted-md5-string construction
    * (numHashes digests per shingle through interpreted lambdas — the
    * dominant cost of the whole LSH tier). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MinhashMinima(
        org.apache.spark.sql.GraftColumnBridge.expression(shingleArr), numHashes))

  /** The composable (interpreted) form `minhashSignature` replaces — kept
    * as the semantic reference for the parity regression test. */
  private[graft] def minhashSignatureHof(shingleArr: Column, numHashes: Int): Column = {
    val hp = transform(shingleArr, s => struct(
      conv(substring(md5(s), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(s), 9, 8), 16, 10).cast("long").as("h2")))
    array((0 until numHashes).map { i =>
      array_min(transform(hp, p => p("h1") + lit(i.toLong) * p("h2")))
    }: _*)
  }

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`,
    * each band hashed to one bucket key. Docs sharing any band key are
    * candidate pairs. (Signature components render as decimal strings —
    * the same `array_to_string` form the DuckDB oracle produces.) */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", lit(b.toString),
        concat_ws("|", slice(signature, b * rowsPerBand + 1, rowsPerBand)
          .cast("array<string>"))))
    }: _*)

  /** Candidate near-dup pairs via LSH: explode band keys, self-join per
    * bucket (id1 < id2), distinct. The shuffle key is the 32-char band
    * bucket; bucket sizes are bounded by band selectivity, and AQE's skew
    * join handles hot buckets.
    *
    * `maxBucketSize` is the adversarial-corpus guard: a bucket of B docs
    * emits O(B^2) candidate pairs, so one boilerplate mega-cluster (every
    * replica sharing every band key) turns the pair list quadratic no
    * matter how well the bands select. Capped buckets are DROPPED from
    * pairing — at scale such buckets are near-identical duplicate groups
    * that exact dedup / keep-min-per-bucket handles in O(B), which is the
    * standard large-scale LSH practice. DedupScaleSpec asserts the bound. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 12, bands: Int = 4,
                        maxBucketSize: Option[Int] = None): DataFrame = {
    val (pairs, sig) =
      lshCandidatePairsLazy(df, idCol, textCol, k, numHashes, bands, maxBucketSize)
    // pairs materialize NOW (they're ids only — tiny), so the band cache
    // can be dropped before returning instead of leaking for the session
    materializeAndRelease(pairs, sig)
  }

  /** Lazy form of [[lshCandidatePairs]]: returns the UN-materialized pair
    * plan plus the persisted (band, id) frame it depends on. The caller
    * owns the cache lifetime (unpersist after the consuming action). Used
    * by plan-audit tests that must inspect the live join plan (the public
    * wrapper checkpoints, which replaces the plan with an RDD scan). */
  private[graft] def lshCandidatePairsLazy(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 12, bands: Int = 4,
      maxBucketSize: Option[Int] = None): (DataFrame, DataFrame) = {
    // Fail fast on misconfiguration: silent integer division would ignore
    // trailing signature components, and bands > numHashes would make every
    // band key a constant (all docs collide into one bucket = cross join).
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    // Staged projections, not one fused expression: minhashSignature
    // references the shingle array numHashes times and lshBandKeys the
    // signature `bands` times — staging keeps CollapseProject from
    // inlining the expensive producer into every consumer (the fused form
    // re-tokenized + re-hashed each doc 12x; at sf0.1 that was ~10x the
    // runtime of the staged plan).
    // (band, id) is persisted before the self-join: without it Spark plans
    // TWO full scan->shingle->minhash subtrees (no exchange reuse across
    // the differently-aliased branches), doubling the dominant md5 cost.
    // Cache payload is ~(bands x 40B)/doc — tiny next to the text. The
    // bucket cap (windowed count, see capBuckets) is applied BEFORE the
    // persist so it runs once, not once per join side.
    // spreadForCompute: tokenize + shingles + numHashes md5 rounds are
    // the dominant per-doc compute; a single-small-file scan would run
    // them on ONE core (r17 profile — see spreadForCompute's doc)
    val produced = spreadForCompute(
        df.select(col(idCol).as("id"), col(textCol).as("__sftxt")))
      .select(col("id"),
        TextAnalysis.tokens(lower(col("__sftxt"))).as("__toks"))
      .select(col("id"), shinglesFromTokens(col("__toks"), k).as("__sh"))
      .select(col("id"), minhashSignature(col("__sh"), numHashes).as("sig"))
      .select(col("id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val sig = capBuckets(produced, "band", maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only (band, id) travels through the self-join and the distinct —
    // signatures would multiply the shuffle by numHashes x 32 bytes per row
    // (callers re-join signatures by id if they need them).
    val a = sig.select(col("band"), col("id").as("id1"))
    val b = sig.select(col("band"), col("id").as("id2"))
    val pairs = a.join(b, Seq("band")).where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    (pairs, sig)
  }

  /** Bucket-size cap DERIVED from corpus size — the operating point for
    * `maxBucketSize` in lshCandidatePairs / winnowingOverlapPairs /
    * incrementalDedup. The floor (64) is the hand-off point to exact
    * dedup: a bucket that large is a mega-cluster of near-identical docs
    * whose O(B²) pair listing adds nothing over the O(B) exact/keep-min
    * path. Growth is logarithmic in corpus size: legitimate near-dup
    * clusters do NOT grow with the corpus (a doc has a bounded set of
    * true near-dups), but collision/ubiquitous-gram noise in a bucket
    * creeps up with scale — a slowly rising cap absorbs that without
    * re-admitting quadratic pair cost (per-doc candidate work stays
    * O(n_fp × cap), scale-free). */
  def suggestedBucketCap(corpusSize: Long): Int = {
    require(corpusSize > 0, s"corpusSize must be positive: $corpusSize")
    math.max(64, math.ceil(8.0 * math.log(corpusSize.toDouble)).toInt)
  }

  /** Keep only rows whose `keyCol` bucket holds <= cap rows — the shared
    * adversarial guard of lshCandidatePairs and winnowingOverlapPairs
    * (a B-row bucket emits O(B^2) pair rows downstream).
    *
    * One windowed count per bucket, NOT groupBy + join-back: the join form
    * re-shuffles the full frame AND re-derives the count frame in every
    * consumer of the result (round-6 profile: the cap was the dominant
    * non-producer cost of d10 — three consumers x two shuffles each). The
    * window is one shuffle+sort by the bucket key, and it leaves the
    * output partitioned by that key, which the downstream self-join on
    * the same key reuses. */
  private def capBuckets(df: DataFrame, keyCol: String,
                         maxBucketSize: Option[Int]): DataFrame =
    maxBucketSize match {
      case Some(cap) =>
        require(cap >= 2, s"maxBucketSize must be >= 2: $cap")
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
        df.withColumn("__bn", count(lit(1)).over(w))
          .where(col("__bn") <= cap).drop("__bn")
      case None => df
    }

  // ------------------------------------------------------- incremental state

  /** Signature STATE for cross-run incremental dedup: one row per document
    * carrying everything a later run needs to dedup a NEW shard against
    * history without re-reading historical text:
    *   - `fp`  — the exact-dedup fingerprint (md5 of normalized text);
    *   - `sig` — the MinHash signature (`numHashes` md5-min components).
    * Band keys are NOT stored: they derive from `sig` map-side at read
    * time (`bands` md5s per doc), so the state stays minimal and the band
    * count can be retuned later without rewriting history. All hashes are
    * engine-portable md5 (see the object doc) — state written by one
    * engine/version is readable by any other, which is the property that
    * makes a years-long 100TB signature table possible. */
  def signatureState(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, numHashes: Int = 12): DataFrame =
    // staged producers (see lshCandidatePairs): tokens -> shingles -> sig,
    // each materialized once, never inlined numHashes times
    df.select(col(idCol).as("id"), exactKey(col(textCol)).as("fp"),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), col("fp"), shinglesFromTokens(col("__toks"), k).as("__sh"))
      .select(col("id"), col("fp"), minhashSignature(col("__sh"), numHashes).as("sig"))

  /** Signature format version stamped into the state table. Version 2 is
    * the Kirsch–Mitzenmacher array<long> construction (round 5); version
    * 1 was the retired salted-md5 array<string> form. Bumped whenever the
    * signature function changes — see requireSignatureFormat. */
  val SigFormat = 2

  /** Append a batch's signature state to the persisted parquet state table
    * (the cross-run contract: one row per already-ingested doc; each run
    * appends its survivors). Stamps `sig_format` so a later engine version
    * can detect — rather than silently mis-join — state written under a
    * different signature construction. */
  def writeSignatureState(state: DataFrame, path: String,
                          mode: String = "append"): Unit =
    state.withColumn("sig_format", lit(SigFormat)).write.mode(mode).parquet(path)

  def readSignatureState(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame = {
    val df = spark.read.parquet(path)
    requireSignatureFormat(df)
    df
  }

  /** Fail fast on a state table written under a different signature
    * construction. Band keys derive from the signature VALUES, so
    * mismatched formats don't error downstream — old-format band keys
    * simply never collide with new ones and every doc silently reports
    * near_dup=false against history, which is exactly the corruption the
    * "stable forever" contract exists to prevent. Two guards: the sig
    * column type must be the K-M array<long>, and an explicit
    * `sig_format` column (absent = pre-versioning table, still checked
    * by type) must match [[SigFormat]]. */
  private[graft] def requireSignatureFormat(state: DataFrame): Unit = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val sigType = state.schema.find(_.name == "sig").map(_.dataType)
    require(sigType.contains(ArrayType(LongType)) ||
        sigType.contains(ArrayType(LongType, containsNull = false)),
      s"signature state 'sig' must be array<bigint> (K-M format v$SigFormat); " +
        s"got ${sigType.map(_.simpleString).getOrElse("<missing>")} — " +
        "state written by an older signature construction must be rebuilt")
    if (state.schema.exists(_.name == "sig_format")) {
      // pushed-down `!= SigFormat` filter: parquet row-group stats
      // (min = max = format) prune every group of a healthy table, so the
      // check is metadata-cheap even on a years-long 100TB state table
      val bad = state.where(col("sig_format") =!= SigFormat)
        .select(col("sig_format")).limit(1).collect()
      require(bad.isEmpty,
        s"signature state contains format ${bad.headOption.map(_.get(0))} != " +
          s"engine format $SigFormat — rebuild the state table before cross-run dedup")
    }
  }

  /** Incremental dedup decision for a NEW batch against persisted history —
    * the mode a 100TB pipeline actually runs (a daily shard is deduped
    * against the accumulated signature table, never against the corpus):
    *   - `exact_dup`: the batch doc's fingerprint exists in history (the
    *     DEDUP_INSERT anti-join semantics — the reference's only join,
    *     HoodieSink.java:426-449 — here as a semi-join flag);
    *   - `near_dup`: some historical doc shares an LSH band key AND the
    *     signature-estimated Jaccard >= `threshold`. Verification needs no
    *     historical text: the stored signatures ARE the verify data.
    *   - `keep` = neither.
    * Cost ∝ new-shard size: history participates only through two hash
    * equi-joins (fp, band) on its slim state projection; the historical
    * corpus is never read. `maxBucketSize` caps HISTORY band buckets (a
    * ubiquitous-band history bucket × every matching batch doc is the
    * incremental form of the quadratic mega-bucket; exact dedup owns
    * those, as in lshCandidatePairs). Within-batch duplicates are out of
    * scope by design — compose: within-batch dedup (nearDupClusters) ->
    * incrementalDedup vs history -> append survivors' state. */
  def incrementalDedup(batch: DataFrame, history: DataFrame,
                       idCol: String, textCol: String, threshold: Double,
                       k: Int = 3, numHashes: Int = 12, bands: Int = 4,
                       maxBucketSize: Option[Int] = None): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    // the history side may come from any source, not just
    // readSignatureState — re-check the signature construction here (a
    // format mismatch would silently report near_dup=false for everything)
    requireSignatureFormat(history)
    val rowsPerBand = numHashes / bands
    // three consumers (exact join, band join, output spine) — one pass
    // over the batch text
    val st = signatureState(batch, idCol, textCol, k, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = st.select(col("id"), col("fp"))
      .join(history.select(col("fp")), Seq("fp"), "left_semi")
      .select(col("id")).distinct().withColumn("exact_dup", lit(true))
    val batchBands = st.select(col("id"),
      explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val histBands = capBuckets(
      history.select(col("id").as("hist_id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band")),
      "band", maxBucketSize)
    // candidates carry only (band, id, hist_id); signatures re-join by id
    // so the wide sig arrays never ride the band shuffle
    val cands = batchBands.join(histBands, Seq("band"))
      .select(col("id"), col("hist_id")).distinct()
    val near = cands
      .join(st.select(col("id"), col("sig")), Seq("id"))
      .join(history.select(col("id").as("hist_id"), col("sig").as("hsig")),
        Seq("hist_id"))
      .where(signatureSimilarity(col("sig"), col("hsig")) >= threshold)
      .select(col("id")).distinct().withColumn("near_dup", lit(true))
    val decisions = st.select(col("id"))
      .join(exact, Seq("id"), "left")
      .join(near, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"))
      .withColumn("keep", !col("exact_dup") && !col("near_dup"))
    materializeAndRelease(decisions, st)
  }

  /** Estimated Jaccard from two minhash signatures (fraction of agreeing
    * components). */
  def signatureSimilarity(sig1: Column, sig2: Column): Column =
    size(filter(zip_with(sig1, sig2, (x, y) => x === y), b => b))
      .cast("double") / size(sig1).cast("double")

  /** Exact n-gram Jaccard between two shingle arrays. */
  def jaccard(sh1: Column, sh2: Column): Column = {
    val i = size(array_intersect(sh1, sh2)).cast("double")
    val u = size(array_union(sh1, sh2)).cast("double")
    when(u === 0d, lit(0d)).otherwise(i / u)
  }

  /** Full MinHash-LSH near-dup pipeline: candidates -> exact Jaccard verify
    * (re-joining the shingle sets for the candidate ids only) -> pairs over
    * threshold. Verification joins only candidate ids, so the expensive
    * exact comparison runs on the (tiny) candidate set, not all pairs. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 3,
                   numHashes: Int = 12, bands: Int = 4,
                   maxBucketSize: Option[Int] = None): DataFrame = {
    val (verified, caches) = nearDupPairsLazy(df, idCol, textCol, threshold,
      k, numHashes, bands, maxBucketSize)
    materializeAndRelease(verified, caches: _*)
  }

  /** Lazy form of [[nearDupPairs]]: the un-materialized verified-pair plan
    * plus the persisted frames it reads (band frame + shingle sets). The
    * candidate pairs stay LAZY inside the plan — materializing them
    * separately (as the eager wrapper's first cut did) costs an extra
    * job + checkpoint barrier per call for a frame that is consumed
    * exactly once, right here (round-6 bench: d04 1.8s -> 2.4s from that
    * alone). Callers own the cache lifetime: release `caches` after the
    * consuming action. */
  private[graft] def nearDupPairsLazy(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3, numHashes: Int = 12, bands: Int = 4,
      maxBucketSize: Option[Int] = None): (DataFrame, Seq[DataFrame]) = {
    val (cands, sig) =
      lshCandidatePairsLazy(df, idCol, textCol, k, numHashes, bands, maxBucketSize)
    // persisted for the same reason as the band frame: joined twice (id1
    // and id2 sides) and Spark won't reuse the shingling subtree across
    // the two aliased branches
    val sh = spreadForCompute(
        df.select(col(idCol).as("__id"), col(textCol).as("__sftxt")))
      .select(col("__id"),
        TextAnalysis.tokens(lower(col("__sftxt"))).as("__toks"))
      .select(col("__id"), shinglesFromTokens(col("__toks"), k).as("__raw"))
      .select(col("__id"), array_distinct(col("__raw")).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verified = cands
      .join(sh.withColumnRenamed("__id", "id1").withColumnRenamed("__sh", "sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("__id", "id2").withColumnRenamed("__sh", "sh2"), Seq("id2"))
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
    (verified, Seq(sig, sh))
  }

  /** SimHash near-dup pairs: docs whose 64-bit SimHash signatures differ
    * in at most `maxHamming` bit positions — the Hamming-space detector
    * (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
    * Crawling", WWW'07; the reference has no equivalent). Complements
    * MinHash: SimHash weighs token FREQUENCY (a majority vote per bit),
    * so it catches docs that share vocabulary distribution where shingle
    * Jaccard is diluted by reordering.
    *
    * Blocking is the pigeonhole scheme from the paper: the signature
    * splits into `bands` contiguous chunks; two signatures within
    * `maxHamming` must agree EXACTLY on at least one chunk whenever
    * `bands > maxHamming`, so candidates come from `bands` equi-joins
    * (here one join on the exploded (chunk-index, chunk-bits) key) and
    * the exact Hamming check runs on candidates only — never all pairs.
    * Recall is exact (the pigeonhole bound is a guarantee, not an
    * estimate); precision comes from the verify step.
    *
    * Scale shape: only (16-byte band key, id) shuffles; signatures re-join
    * by id for the verify. A chunk key has just 2^(64/bands) possible
    * values, so at billion-doc scale buckets WILL grow with the corpus —
    * `maxBucketSize` hands mega-buckets to exact dedup like the LSH cap.
    * At web scale use [[simhashNearDupPairsCombined]] (the paper's
    * chunk-combination keys, 2^33 key values); this 4-band form is the
    * cheaper default below that tier. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, bands: Int = 4,
                          maxBucketSize: Option[Int] = None): DataFrame = {
    require(bands > maxHamming && 64 % bands == 0,
      s"bands ($bands) must exceed maxHamming ($maxHamming) for the " +
        "pigeonhole guarantee and divide 64 evenly")
    simhashDetect(df, idCol, textCol, maxHamming, maxBucketSize,
      simhashBandKeys(bands))
  }

  /** The 64/bands equal-width chunk keys of [[simhashNearDupPairs]]. */
  private def simhashBandKeys(bands: Int): Column => Column = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    sig =>
      array((0 until bands).map { b =>
        // chunk b = string positions [b*width+1, (b+1)*width] of the bit
        // string = bits [63-b*width .. 64-(b+1)*width] of the packed long
        struct(lit(b.toByte).as("b"),
          shiftrightunsigned(sig, width * (bands - 1 - b))
            .bitwiseAND(lit(mask)).as("chunk"))
      }: _*)
  }

  /** Web-scale SimHash blocking (Manku'07 §3's chunk-COMBINATION scheme):
    * the signature splits into `chunks` near-equal pieces; two signatures
    * within `maxHamming` agree on at least `chunks - maxHamming` pieces,
    * so each doc emits one key per (chunks choose chunks-maxHamming)
    * combination — (combination-id, the selected chunks' bits
    * concatenated) — and candidates come from the equi-join on those
    * keys. Key cardinality per combination with the default 6-choose-3
    * split is 2^33 vs 2^16 for a 16-bit band: at billion-doc scale the
    * 4-band tier's every bucket is a mega-bucket (only 65k distinct
    * values exist) and the cap routes EVERYTHING to exact dedup, while
    * combination keys keep buckets near-singleton. The price is C(6,3) =
    * 20 exploded (int, long, id) rows per doc vs 4 — the right trade
    * exactly when the corpus is big enough to saturate narrow chunks.
    * Recall is exact (pigeonhole is a guarantee); output is identical to
    * [[simhashNearDupPairs]] at the same `maxHamming` (modulo bucket-cap
    * drops, which act on different bucket spaces — and that difference
    * is the point: ScaleBench's 544k-doc corpus already saturates the
    * 16-bit chunks, where the capped 4-band tier silently drops ~44% of
    * the true pairs this scheme keeps, at ~1.6x the time for ~1.8x the
    * verified pairs). */
  def simhashNearDupPairsCombined(df: DataFrame, idCol: String, textCol: String,
                                  maxHamming: Int = 3, chunks: Int = 6,
                                  maxBucketSize: Option[Int] = None): DataFrame = {
    require(chunks > maxHamming,
      s"chunks ($chunks) must exceed maxHamming ($maxHamming) for the " +
        "pigeonhole guarantee")
    require(chunks <= 16, s"chunks ($chunks) > 16 explodes combinatorially " +
      "(C(chunks, chunks-maxHamming) keys per doc)")
    simhashDetect(df, idCol, textCol, maxHamming, maxBucketSize,
      simhashComboKeys(chunks, maxHamming))
  }

  /** The Manku chunk-combination keys of [[simhashNearDupPairsCombined]]. */
  private def simhashComboKeys(chunks: Int, maxHamming: Int): Column => Column = {
    val agree = chunks - maxHamming
    // near-equal split of the 64 bits: the first (64 mod chunks) chunks
    // are one bit wider
    val widths = (0 until chunks).map(i => 64 / chunks + (if (i < 64 % chunks) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    def chunkCol(sig: Column, i: Int): Column = {
      val w = widths(i)
      val m = if (w == 64) -1L else (1L << w) - 1L
      shiftrightunsigned(sig, 64 - starts(i) - w).bitwiseAND(lit(m))
    }
    // selected chunks concatenated MSB-first; total bits <= 64, one long
    def comboKey(sig: Column, combo: Seq[Int]): Column =
      combo.foldLeft(lit(0L): Column) { (acc, i) =>
        shiftleft(acc, widths(i)).bitwiseOR(chunkCol(sig, i))
      }
    val combos = (0 until chunks).combinations(agree).toSeq
    sig =>
      array(combos.zipWithIndex.map { case (combo, ci) =>
        struct(lit(ci).as("c"), comboKey(sig, combo).as("bits"))
      }: _*)
  }

  /** Shared SimHash detector core: signatures once, exploded blocking
    * keys (scheme supplied by the caller), capped equi-join for
    * candidates, exact Hamming verify.
    *
    * Two-step simhash (token hashes staged once, see md5TokenHashes),
    * PACKED: the signature is one long (simhashPackedFromHashes — bit 63
    * = the string form's first char), so the detector's hottest frames
    * shuffle 8-byte longs + a small key struct instead of 64-char bit
    * strings (~8x fewer shuffle bytes at any scale), and the verify is a
    * single bit_count(xor) with no string parsing. */
  private def simhashDetect(df: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int, maxBucketSize: Option[Int],
                            blockingKeys: Column => Column): DataFrame = {
    // persisted: feeds the exploded band frame AND both verify joins
    val sigs = simhashSigs(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (verified, bandFrame) =
      simhashDetectFromSigs(sigs, maxHamming, maxBucketSize, blockingKeys)
    materializeAndRelease(verified, sigs, bandFrame)
  }

  /** (id, packed-64-bit sig) for every doc — the shared producer of the
    * detector tiers and the recall gauge. */
  private def simhashSigs(df: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    // spread carries the RAW text; the md5 token hashing runs after the
    // exchange (r17 re-measure: hashing before the spread kept the
    // compute serial in the scan stage AND shuffled the fat hash
    // arrays — d14 regressed 1.8x until the expression moved here)
    spreadForCompute(
        df.select(col(idCol).as("id"), col(textCol).as("__sftxt")))
      .select(col("id"), md5TokenHashes(col("__sftxt")).as("__h"))
      .select(col("id"), simhashPackedFromHashes(col("__h")).as("sig"))

  /** Detector core over a PRE-BUILT (id, sig) frame (persist it — three
    * consumers); returns (verified pairs, the internally-persisted band
    * frame for the caller to release after materialization). */
  private def simhashDetectFromSigs(sigs: DataFrame, maxHamming: Int,
                                    maxBucketSize: Option[Int],
                                    blockingKeys: Column => Column)
      : (DataFrame, DataFrame) = {
    val bandFrame = capBuckets(
      sigs.select(col("id"), explode(blockingKeys(col("sig"))).as("band")),
      "band", maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = bandFrame.select(col("band"), col("id").as("id1"))
      .join(bandFrame.select(col("band"), col("id").as("id2")), Seq("band"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val verified = cands
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), Seq("id1"))
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), Seq("id2"))
      .withColumn("hamming", hamming64(col("sig1"), col("sig2")).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
    (verified, bandFrame)
  }

  /** Benchmark DECONTAMINATION — the n-gram contamination check a
    * training pipeline runs before training: flag every training doc
    * sharing at least `minHits` distinct word `k`-shingle hashes with an
    * eval/benchmark set, so contaminated docs can be dropped (or the
    * eval question invalidated). Returns one row per training doc:
    * (id, n_hits = distinct shared shingle hashes, contaminated).
    *
    * Scale shape: the benchmark side reduces to DISTINCT md5 shingle
    * keys — eval sets are thousands of docs, so the key set is small and
    * broadcast (hinted under a plan-stats size guard; an oversized bench
    * set degrades to a shuffled join rather than an OOM). The training
    * side shuffles only (id, 32-char hash) pairs for the per-doc hit
    * count — never text — and docs with zero hits skip the aggregate
    * entirely (inner join) and rejoin as n_hits=0 via the left join on
    * ids. md5 shingles are the house portability contract: any engine
    * reproduces the keys bit-exactly, so bench-key sets can be persisted
    * and reused across runs like signature state. */
  def contaminationFlags(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 8, minHits: Long = 1,
                         broadcastBenchMaxBytes: Long = 512L << 20): DataFrame =
    contaminationFlagsAgainstKeys(train,
      contaminationShingles(bench, None, textCol, k).select(col("__sh")).distinct(),
      idCol, textCol, k, minHits, broadcastBenchMaxBytes)

  private def contaminationShingles(df: DataFrame, id: Option[String],
                                    textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"shingle width must be >= 1: $k")
    val keepFirst = id.toSeq.map(c => col(c).as("__id"))
    val keep = id.toSeq.map(_ => col("__id"))
    df.select(keepFirst :+ TextAnalysis.tokens(lower(col(textCol))).as("__toks"): _*)
      .select(keep :+ shinglesFromTokens(col("__toks"), k).as("__raw"): _*)
      .select(keep :+ explode(array_distinct(transform(col("__raw"), s => md5(s))))
        .as("__sh"): _*)
  }

  /** [[contaminationFlags]] against an already-derived bench-key frame
    * (one `__sh` string column) — the cross-run shape: eval sets change
    * rarely, so derive their keys once with [[writeBenchKeys]] and run
    * each ingest shard against [[readBenchKeys]] without ever re-reading
    * the benchmark text. */
  def contaminationFlagsAgainstKeys(train: DataFrame, benchKeys: DataFrame,
                                    idCol: String, textCol: String,
                                    k: Int = 8, minHits: Long = 1,
                                    broadcastBenchMaxBytes: Long = 512L << 20): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1: $minHits")
    val keys = benchKeys.select(col("__sh"))
    val benchHinted =
      if (keys.queryExecution.optimizedPlan.stats.sizeInBytes
            <= broadcastBenchMaxBytes) broadcast(keys)
      else keys
    val hits = contaminationShingles(train, Some(idCol), textCol, k)
      .join(benchHinted, Seq("__sh"))
      .groupBy(col("__id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol))
      .join(hits.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** Persist a benchmark's distinct shingle keys for cross-run reuse.
    * Stamps the shingle width `k`: keys from mismatched k never collide,
    * so every shard would silently report clean — exactly the corruption
    * the signature-state `sig_format` guard exists for; [[readBenchKeys]]
    * fails fast instead. */
  def writeBenchKeys(bench: DataFrame, textCol: String, path: String,
                     k: Int = 8, mode: String = "overwrite"): Unit =
    contaminationShingles(bench, None, textCol, k)
      .select(col("__sh")).distinct()
      .withColumn("shingle_k", lit(k))
      .write.mode(mode).parquet(path)

  /** Read persisted bench keys, failing fast on a shingle-width mismatch
    * (see [[writeBenchKeys]]). */
  def readBenchKeys(spark: org.apache.spark.sql.SparkSession, path: String,
                    k: Int = 8): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.schema.exists(_.name == "shingle_k"),
      s"bench-key table at $path has no shingle_k column — not written by writeBenchKeys")
    val bad = df.where(col("shingle_k") =!= k).limit(1).collect()
    require(bad.isEmpty,
      s"bench-key table at $path was written with shingle_k=${bad.head.getAs[Int]("shingle_k")}, " +
        s"reader expects k=$k — mismatched widths silently report every shard clean")
    df.select(col("__sh"))
  }

  // ---- versioned bench-key store --------------------------------------
  //
  // writeBenchKeys alone grows a mutable flat table: refreshing an eval
  // set either overwrites history or (append mode) accumulates stale keys
  // forever — retired benchmark questions keep flagging clean training
  // docs. The versioned store mirrors RunState's checkpoint contract at
  // dataset granularity: each refresh is an immutable snapshot directory
  // `version=N` (written to a dot-temp dir, then atomically renamed, so a
  // crashed writer never leaves a readable half-snapshot), readers pin
  // the newest version (keys absent from it are retired by construction),
  // and prune deletes all but the newest `retain` snapshots exactly like
  // RunState.commit's checkpoint pruning.
  //
  // The Hive-style `version=N` directory name makes the store a plain
  // partitioned parquet table: the versioned reader goes through
  // partition discovery, so pinning a version prunes at the FILE LISTING
  // — a 100 TB-pipeline store with years of snapshots reads exactly one.

  /** List snapshot versions at `path`, oldest→newest. FS-only (no Spark
    * session) so CLI tooling can call it like RunState. */
  def benchKeyVersions(conf: org.apache.hadoop.conf.Configuration,
                       path: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("version="))
      .map(_.getPath.getName.stripPrefix("version=").toLong).sorted
  }

  /** Write the next immutable bench-key snapshot (distinct shingle keys of
    * `bench`, shingle-width-stamped like [[writeBenchKeys]]) and return
    * its version number. Temp-write + atomic rename: a concurrent reader
    * sees either the previous latest or the complete new snapshot. */
  def writeBenchKeysSnapshot(bench: DataFrame, textCol: String, path: String,
                             k: Int = 8): Long = {
    val conf = bench.sparkSession.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    val next = benchKeyVersions(conf, path).lastOption.getOrElse(0L) + 1L
    val tmp = new org.apache.hadoop.fs.Path(base, s".tmp-version-$next")
    contaminationShingles(bench, None, textCol, k)
      .select(col("__sh")).distinct()
      .withColumn("shingle_k", lit(k))
      .write.mode("overwrite").parquet(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(base, s"version=$next")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(
        s"bench-key snapshot rename failed: $tmp -> $dest (concurrent writer?)")
    next
  }

  /** Read one pinned snapshot (default: the newest — the only one whose
    * keys are live; anything older is retired). Same shingle-width
    * fail-fast as [[readBenchKeys]]. The version filter is a partition
    * filter: only that snapshot's files are listed or read. */
  def readBenchKeysLatest(spark: org.apache.spark.sql.SparkSession,
                          path: String, k: Int = 8,
                          version: Option[Long] = None): DataFrame = {
    val vs = benchKeyVersions(spark.sparkContext.hadoopConfiguration, path)
    require(vs.nonEmpty, s"no bench-key snapshots at $path — write one with " +
      "writeBenchKeysSnapshot before decontaminating against the store")
    val pin = version.getOrElse(vs.last)
    require(vs.contains(pin),
      s"bench-key version $pin not present at $path (have: ${vs.mkString(",")})")
    val df = spark.read.parquet(path).where(col("version") === pin)
    require(df.schema.exists(_.name == "shingle_k"),
      s"bench-key store at $path has no shingle_k column — not written by " +
        "writeBenchKeysSnapshot")
    val bad = df.where(col("shingle_k") =!= k).limit(1).collect()
    require(bad.isEmpty,
      s"bench-key snapshot version=$pin at $path was written with " +
        s"shingle_k=${bad.head.getAs[Int]("shingle_k")}, reader expects k=$k — " +
        "mismatched widths silently report every shard clean")
    df.select(col("__sh"))
  }

  /** Delete all but the newest `retain` snapshots; returns the versions
    * removed (oldest→newest). FS-only, mirroring RunState's prune. */
  def pruneBenchKeys(conf: org.apache.hadoop.conf.Configuration,
                     path: String, retain: Int): Seq[Long] = {
    require(retain >= 1, s"retain must be >= 1: $retain")
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    val doomed = benchKeyVersions(conf, path).dropRight(retain)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"version=$v"), true)
    }
    doomed
  }

  /** Winnowing-overlap near-dup pairs — the plagiarism-detector join the
    * winnowing fingerprints (TextAnalysis.winnowingMinima) exist for:
    * docs sharing fingerprints are candidate pairs, scored by fingerprint
    * Jaccard (shared / union of the two distinct-fp sets) and kept at
    * `minSim`. Catches heavy local edits that break shingle MinHash
    * (fingerprints survive anywhere outside the edited windows).
    *
    * Scale shape: only (fp, id) pairs shuffle (32-char md5 + id — never
    * text or gram arrays); the per-doc fp frame persists across its three
    * consumers (both join sides + the size frame). `maxBucketSize` drops
    * ubiquitous-gram buckets (common English 8-grams land in most docs —
    * a B-doc bucket emits O(B^2) pair rows) exactly like the LSH cap;
    * uncapped matches the simple quadratic-free-threshold oracle. */
  def winnowingOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                            minSim: Double, k: Int = 8, w: Int = 4,
                            maxBucketSize: Option[Int] = None): DataFrame = {
    val (scored, f0) =
      winnowingOverlapPairsLazy(df, idCol, textCol, minSim, k, w, maxBucketSize)
    materializeAndRelease(scored, f0)
  }

  /** Lazy form of [[winnowingOverlapPairs]]: un-materialized pair plan +
    * the persisted fp frame it depends on (caller owns the cache
    * lifetime). Exists so plan-audit tests can inspect the live join plan
    * — the public wrapper checkpoints, which replaces it with an RDD
    * scan. */
  private[graft] def winnowingOverlapPairsLazy(
      df: DataFrame, idCol: String, textCol: String,
      minSim: Double, k: Int = 8, w: Int = 4,
      maxBucketSize: Option[Int] = None,
      containment: Boolean = false): (DataFrame, DataFrame) = {
    // one persist, of the POST-cap frame: the windowed cap (capBuckets)
    // runs once into the cache instead of once per consumer, and the
    // cache is partitioned by fp — which the self-join below reuses.
    // spreadForCompute: the gram-hash + winnowing explode multiplies
    // each doc into ~|text| rows — serialized on one core when the scan
    // is a single small file (r17 profile: d10/d25 spent 2.6-2.9s in a
    // single-task fingerprint stage)
    val produced = spreadForCompute(
        df.select(col(idCol).as("id"), lower(col(textCol)).as("__t")))
      .select(col("id"), TextAnalysis.charGramHashes(col("__t"), k).as("__g"))
      .select(col("id"), TextAnalysis.winnowingMinima(col("__g"), w).as("fps"))
      .select(col("id"), explode(col("fps")).as("fp"))
    val f = capBuckets(produced, "fp", maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Jaccard is over the SURVIVING fp sets (capped grams leave both the
    // numerator and the denominator — dropping ubiquitous grams from the
    // similarity, which sharpens it rather than skewing it)
    val sizes = f.groupBy(col("id")).agg(count(lit(1)).as("nf"))
    val shared = f.select(col("fp"), col("id").as("id1"))
      .join(f.select(col("fp"), col("id").as("id2")), Seq("fp"))
      .where(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
    // symmetric Jaccard by default; containment (shared over the SMALLER
    // fp set) for the quote/subset detector — a short doc embedded in a
    // long one keeps nearly all of its own fingerprints while Jaccard is
    // diluted by the long doc's size
    val (scoreName, scoreCol) =
      if (containment)
        ("containment",
          col("n_shared").cast("double") / least(col("nf1"), col("nf2")))
      else
        ("sim", col("n_shared").cast("double") /
          (col("nf1") + col("nf2") - col("n_shared")))
    val scored = shared
      .join(sizes.select(col("id").as("id1"), col("nf").as("nf1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("nf").as("nf2")), Seq("id2"))
      .select(col("id1"), col("id2"), scoreCol.as(scoreName))
      .where(col(scoreName) >= minSim)
    (scored, f)
  }

  /** Containment-scored overlap pairs — the QUOTE/SUBSET detector the
    * symmetric family (d04 Jaccard, d05 Hamming, d10 fp-Jaccard) misses:
    * score = shared fps / min(|A|, |B|), so a short doc embedded
    * verbatim in a much longer one scores ~1 where Jaccard reports
    * shared/(|A|+|B|-shared) ~ |A|/|B| ~ 0. Same winnowing machinery,
    * bucket cap, and scale shape as [[winnowingOverlapPairs]] (only
    * (fp, id) pairs shuffle). Output: (id1, id2, containment). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       minContainment: Double, k: Int = 8, w: Int = 4,
                       maxBucketSize: Option[Int] = None): DataFrame = {
    val (scored, f0) = winnowingOverlapPairsLazy(df, idCol, textCol,
      minContainment, k, w, maxBucketSize, containment = true)
    materializeAndRelease(scored, f0)
  }

  /** Edit-distance near-dup pairs: every unordered doc pair within
    * Levenshtein distance `k`, EXACTLY — the character-level detector the
    * token-set family can't express (MinHash/SimHash/winnowing all see
    * token multisets; two docs differing by a handful of character typos
    * per word look dissimilar to shingles but are trivially close in edit
    * space — the classic record-linkage / OCR-noise shape).
    *
    * Blocking is PassJoin-style segment pigeonhole (Li, Deng & Feng,
    * "PassJoin: A Partition-based Method for Similarity Joins", SIGMOD'11;
    * the reference engine has no equivalent): each string partitions into
    * k+1 even segments; k edits can fall strictly inside at most k of
    * them, so any pair within distance k shares at least one indexed
    * segment VERBATIM, at a start position bounded by three sound
    * windows — (a) alignment arithmetic: |s-pi| + |s-(pi+Δ)| <= k, (b)
    * leftmost-preserved pigeonhole: segments before the leftmost intact
    * one each hold an edit, so the suffix budget is k-i, (c) substring
    * bounds. The blocking is LOSSLESS (a superset of the true pair set);
    * the exact verify owns precision, so the result is identical to the
    * naive quadratic join — which is exactly how the oracle states it.
    *
    * Scale shape: probes/index rows are O(k^2)-ish per doc (segments x
    * in-window starts, windows shrink with both i and the length gap) and
    * only 16-byte (xxhash64(i, len, segment), id) tuples shuffle — never
    * the text, never even the segment characters (a hash collision just
    * adds a candidate the verify rejects, so losslessness is untouched).
    * Candidates dedup to unordered id pairs BEFORE texts re-join,
    * and the verify is Spark's threshold form `levenshtein(a, b, k)`
    * (banded O(k·n), -1 above k) — never the full O(n^2) DP. Probe
    * target lengths semi-join against the lengths actually present, so
    * a sparse length histogram pays nothing. Docs shorter than k+1
    * chars can't host k+1 non-empty segments; they pair via a broadcast
    * length-window join instead (sound: a partner must be <= 2k chars) —
    * route a degenerate shorter-than-k corpus through [[exactDedup]]
    * first, the broadcast side is assumed small. `maxBucketSize` caps
    * adversarial (position, length, segment) mega-buckets like the LSH
    * cap — opt-in, because a cap trades the lossless guarantee for
    * bounded work.
    *
    * Output: (id_a, id_b, dist), id_a < id_b, dist <= k. */
  def editNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int, maxBucketSize: Option[Int] = None): DataFrame = {
    val (verified, base) = editNearDupPairsLazy(df, idCol, textCol, k,
      maxBucketSize)
    materializeAndRelease(verified, base)
  }

  /** Lazy form of [[editNearDupPairs]] (un-materialized plan + the
    * persisted base it reads) for plan-audit tests — the public wrapper
    * checkpoints, which replaces the plan with an RDD scan. */
  private[graft] def editNearDupPairsLazy(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, maxBucketSize: Option[Int] = None): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1: $k")
    // spread before the segment/probe explodes: they multiply each doc
    // into O(k²) substring-hash rows, so partitioning sized to input
    // BYTES (one small unsplittable file = ONE partition) serializes
    // the whole operator — r17 profile: d58's index build ran as a
    // single 2s task inside the candidate join's broadcast build
    val base = spreadForCompute(
        df.select(col(idCol).as("__id"), col(textCol).as("__t"),
          length(col(textCol)).cast("int").as("__l")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val longs = base.where(col("__l") > k)
    val idxCapped = capEditSegments(editSegments(longs, k), maxBucketSize)
    val lens = longs.select(col("__l").as("__cl")).distinct()
    // probing DOWNWARD only (targets no longer than the probe) meets each
    // unordered pair exactly once, with equal lengths met from both ends
    // and folded by the distinct below
    val probes = editProbes(longs, k, lens, upward = false)
    val mainCands = probes.join(idxCapped, Seq("__key"))
      .where(col("__prbId") =!= col("__idxId"))
      .select(least(col("__prbId"), col("__idxId")).as("id_a"),
        greatest(col("__prbId"), col("__idxId")).as("id_b"))
    // strings of <= k chars: no k+1 non-empty segments exist, but any
    // within-k partner is <= 2k chars — a broadcast length-window join
    // over two tiny slices
    val shorts = base.where(col("__l") <= k)
      .select(col("__id").as("__sid"), col("__l").as("__sl"))
    val shortCands = broadcast(shorts)
      .join(base.select(col("__id").as("__oid"), col("__l").as("__ol"))
          .where(col("__ol") <= 2 * k),
        col("__ol") <= col("__sl") + k && col("__ol") >= col("__sl") - k &&
          (col("__ol") > lit(k) || col("__sid") < col("__oid")) &&
          col("__sid") =!= col("__oid"))
      .select(least(col("__sid"), col("__oid")).as("id_a"),
        greatest(col("__sid"), col("__oid")).as("id_b"))
    val verified = mainCands.unionByName(shortCands).distinct()
      .join(base.select(col("__id").as("id_a"), col("__t").as("__ta")), Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__t").as("__tb")), Seq("id_b"))
      .withColumn("dist",
        levenshteinWithin(col("__ta"), col("__tb"), k).cast("long"))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
    (verified, base)
  }

  // ---- PassJoin machinery shared by the pair and incremental forms ------

  /** Codegen'd thresholded Levenshtein (native expression,
    * [[graft.functions.LevenshteinWithin]]): same contract as Spark's
    * `levenshtein(a, b, k)` (distance if <= k, else -1) but with common
    * prefix/suffix stripping and a true (2k+1)-band DP — the verify loop
    * where candidates share almost all of their text collapses from a
    * full n x m table to a few banded cells. */
  def levenshteinWithin(a: Column, b: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.LevenshteinWithin(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b), k))

  /** Even partition of a length-l string into m = k+1 segments: the first
    * (m - l%m) get floor(l/m) chars, the last l%m one more. */
  private def editSegLen(l: Column, i: Column, m: Int): Column =
    floor(l / m).cast("int") +
      when(i >= lit(m) - pmod(l, lit(m)), 1).otherwise(0)

  private def editSegStart(l: Column, i: Column, m: Int): Column =
    (i * floor(l / m).cast("int") +
      greatest(lit(0), i - (lit(m) - pmod(l, lit(m)).cast("int")))).cast("int")

  /** Segment-index rows (__idxId, __key) of a (__id, __t, __l) frame,
    * where __key = xxhash64(segment index, string length, segment text) —
    * ONE 8-byte join key instead of a (i, len, ~len/(k+1)-char substring)
    * triple. A hash collision only ADDS a candidate pair that the exact
    * verify rejects, so the lossless-superset guarantee is untouched,
    * while the blocking shuffle carries 16 bytes/row instead of the
    * segment characters (the r9 ScaleBench re-measure: 327s -> see
    * edit_secs — the raw-substring join was the whole cost). Callers
    * pre-filter to `__l > k` (shorter strings can't host k+1 non-empty
    * segments and take the length-window path instead). */
  private def editSegments(base: DataFrame, k: Int): DataFrame =
    base
      .select(col("__id").as("__idxId"), col("__l").as("__idxL"), col("__t"),
        explode(sequence(lit(0), lit(k))).as("__i"))
      .select(col("__idxId"),
        xxhash64(col("__i"), col("__idxL"),
          col("__t").substr(editSegStart(col("__idxL"), col("__i"), k + 1) + 1,
            editSegLen(col("__idxL"), col("__i"), k + 1))).as("__key"))

  private def capEditSegments(idx: DataFrame,
                              maxBucketSize: Option[Int]): DataFrame =
    capBuckets(idx, "__key", maxBucketSize)

  /** Probe substrings (__prbId, __cl, __i, __seg): for each (__id, __t,
    * __l) row, every substring that could equal segment __i of an indexed
    * length-__cl string within distance k. Start windows are the
    * intersection of three SOUND bounds (Δ = probe len − target len, any
    * sign): alignment arithmetic |s−pi| + |s−(pi+Δ)| <= k, the
    * leftmost-preserved suffix budget |s−(pi+Δ)| <= k−i, and substring
    * range. `upward = true` extends target lengths ABOVE the probe's own
    * (the two-frame incremental form, where the indexed side may be
    * longer); the self-join pair form probes downward only and meets each
    * pair once. Target lengths semi-join against the lengths actually
    * indexed, so a sparse length histogram pays nothing. */
  private def editProbes(base: DataFrame, k: Int, lens: DataFrame,
                         upward: Boolean): DataFrame = {
    val m = k + 1
    val hiLen = if (upward) col("__l") + k else col("__l")
    base
      .select(col("__id").as("__prbId"), col("__t"), col("__l"),
        explode(sequence(greatest(lit(m), col("__l") - k), hiLen)).as("__cl"))
      .join(broadcast(lens), Seq("__cl"), "left_semi")
      .select(col("__prbId"), col("__t"), col("__l"), col("__cl"),
        explode(sequence(lit(0), lit(k))).as("__i"))
      .withColumn("__li", editSegLen(col("__cl"), col("__i"), m))
      .withColumn("__pi", editSegStart(col("__cl"), col("__i"), m))
      .withColumn("__d", col("__l") - col("__cl"))
      .withColumn("__half", floor((lit(k) - abs(col("__d"))) / 2).cast("int"))
      .withColumn("__lo", greatest(lit(0),
        col("__pi") + least(col("__d"), lit(0)) - col("__half"),
        col("__pi") + col("__d") - (lit(k) - col("__i"))))
      .withColumn("__hi", least(col("__l") - col("__li"),
        col("__pi") + greatest(col("__d"), lit(0)) + col("__half"),
        col("__pi") + col("__d") + (lit(k) - col("__i"))))
      .where(col("__lo") <= col("__hi"))
      .select(col("__prbId"), col("__cl"), col("__i"), col("__li"), col("__t"),
        explode(sequence(col("__lo"), col("__hi"))).as("__s"))
      .select(col("__prbId"),
        xxhash64(col("__i"), col("__cl"),
          col("__t").substr(col("__s") + 1, col("__li"))).as("__key"))
  }

  /** Persist an edit-dedup SEGMENT INDEX snapshot of a reference corpus
    * through the versioned [[LayoutStore]] (atomic rename, newest-pin —
    * the same lifecycle as the signature/profile stores): `segs` holds
    * the (i, l, segment, id) PassJoin index for docs longer than k,
    * `texts` the (id, text, l) verify data (an edit-distance verify needs
    * the actual characters — unlike MinHash, where the signature IS the
    * verify data), `meta` pins k (a probe with a different k would be
    * silently unsound; [[editDupFlags]] reads k from the snapshot).
    * Returns the written version. */
  def writeEditIndexSnapshot(df: DataFrame, idCol: String, textCol: String,
                             k: Int, path: String): Long = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__t"),
      length(col(textCol)).cast("int").as("__l"))
    LayoutStore.writeSnapshot(
      spark.sparkContext.hadoopConfiguration, path) { tmp =>
      // texts is a straight copy — no multiplier, no spread; ONLY the
      // segment build (k+1 substring-hash rows per doc) spreads, so the
      // text shuffles exactly once and only for the job that needs the
      // parallelism (r17 re-measure: spreading the shared base re-ran
      // the exchange in BOTH write jobs — m35/m36 regressed ~1.6x)
      base.select(col("__id").as("id"), col("__t").as("text"),
          col("__l").as("l"))
        .write.mode("overwrite").parquet(s"$tmp/texts")
      editSegments(spreadForCompute(base.where(col("__l") > k)), k)
        .select(col("__idxId").as("id"), col("__key").as("key"))
        .write.mode("overwrite").parquet(s"$tmp/segs")
      spark.range(1).select(lit(k).as("k"))
        .write.mode("overwrite").parquet(s"$tmp/meta")
    }
  }

  /** Incremental edit-distance dedup: flag each batch doc within
    * Levenshtein k of ANY doc in a [[writeEditIndexSnapshot]] reference —
    * the mode a 100TB pipeline actually runs (a daily shard probes the
    * accumulated index; the historical corpus is never re-segmented, and
    * history text is read only for the candidate verify joins). Cost is
    * ∝ batch: O(k²)-ish probe substrings per BATCH doc equi-join the
    * stored segments; probing runs UPWARD AND downward in length (the
    * history match may be longer or shorter — the self-join's
    * one-direction trick doesn't apply across frames). History docs of
    * <= k chars can't be segmented and join by length window instead
    * (broadcast; degenerate short-heavy references belong in exact dedup).
    * Blocking stays LOSSLESS, so `edit_dup`/`min_dist` are exactly the
    * naive batch × reference answer; `maxBucketSize` caps reference
    * mega-buckets at the usual precision-for-boundedness trade. Within-
    * batch duplicates are out of scope by design — compose with
    * [[editNearDupPairs]] (the [[incrementalDedup]] contract).
    *
    * Output: (idCol, edit_dup, min_dist) — min_dist is the true minimum
    * distance when <= k, else -1. */
  def editDupFlags(spark: org.apache.spark.sql.SparkSession,
                   batch: DataFrame, idCol: String, textCol: String,
                   path: String, version: Option[Long] = None,
                   maxBucketSize: Option[Int] = None): DataFrame = {
    val k = LayoutStore.readSnapshotTable(spark, path, "meta", version)
      .head().getInt(0)
    val histTexts = LayoutStore.readSnapshotTable(spark, path, "texts",
      version)
    val segs = capEditSegments(
      LayoutStore.readSnapshotTable(spark, path, "segs", version)
        .select(col("id").as("__idxId"), col("key").as("__key")),
      maxBucketSize)
    // NOT spread: this is the per-batch probe path (called once per
    // micro-batch on a small frame) — the r17 A/B showed the extra
    // planning + exchange per call costs more than the parallelism
    // gains (m35 4.2→5.0s with a spread here); the corpus-shaped index
    // build (writeEditIndexSnapshot) is where the spread pays
    val b = batch.select(col(idCol).as("__id"), col(textCol).as("__t"),
        length(col(textCol)).cast("int").as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lens = histTexts.where(col("l") > k)
      .select(col("l").as("__cl")).distinct()
    // candidate join strategy pinned to SHUFFLED-HASH with the
    // batch-bounded probe side as build: the stored segment index is
    // the BIG side (|history| · (k+1) rows), but its parquet-size
    // estimate undersells the in-memory rows, so the planner was
    // broadcasting it — r18 profile on m36: a 128 MiB, 1.38M-row
    // broadcast built PER MICRO-BATCH (2.6s of the 4.4s batch).
    // Shuffling instead moves the compressed index bytes once per
    // batch and builds only the probe hash per partition — the shape
    // that stays bounded when history is 100 TB and the batch is a
    // daily shard.
    val candsA = editProbes(b, k, lens, upward = true).hint("shuffle_hash")
      .join(segs, Seq("__key"))
      .select(col("__prbId").as("__bid"), col("__idxId").as("__hid"))
    val histShorts = histTexts.where(col("l") <= k)
      .select(col("id").as("__hid"), col("l").as("__hl"))
    val candsB = b.select(col("__id").as("__bid"), col("__l").as("__bl"))
      .join(broadcast(histShorts), abs(col("__bl") - col("__hl")) <= k)
      .select(col("__bid"), col("__hid"))
    val hits = candsA.unionByName(candsB).distinct()
      .join(b.select(col("__id").as("__bid"), col("__t").as("__bt")),
        Seq("__bid"))
      .join(histTexts.select(col("id").as("__hid"), col("text").as("__ht")),
        Seq("__hid"))
      .withColumn("__dist",
        levenshteinWithin(col("__bt"), col("__ht"), k).cast("long"))
      .where(col("__dist") >= 0)
      .groupBy(col("__bid")).agg(min(col("__dist")).as("__md"))
    val out = b.select(col("__id").as("__bid"))
      .join(hits, Seq("__bid"), "left_outer")
      .select(col("__bid").as(idCol),
        col("__md").isNotNull.as("edit_dup"),
        coalesce(col("__md"), lit(-1L)).as("min_dist"))
    materializeAndRelease(out, b)
  }

  /** Span-level boilerplate removal — exact-substring dedup INSIDE
    * documents, the step document-level detectors can't do (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL'22:
    * repeated substrings, not just repeated documents, drive memorization;
    * RefinedWeb/CCNet run the same line/passage-level pass). A `width`-
    * token span (case-normalized, md5-keyed) whose corpus DOCUMENT
    * frequency exceeds `maxDocFreq` is boilerplate; every token position
    * it covers is cut from the doc, and the surviving tokens (original
    * case) re-join as `cleaned_text`.
    *
    * Deterministic and partitioning-independent: flagged-start sets are
    * collected as sorted distinct positions and the keep-filter is a pure
    * predicate over positions, so the output is a function of the corpus
    * alone.
    *
    * Scale shape: one corpus tokenize; only (16-byte gram md5, id, pos)
    * triples shuffle — text never enters an exchange (same contract as
    * the LSH/winnowing family). The hot-gram set (corpus-frequency >
    * maxDocFreq) is tiny by construction and broadcast-hinted under a
    * plan-stats guard; at real scale AQE's runtime sizes convert the
    * join when the static estimate is too coarse (same mechanism as
    * keywordScores, TextAnalysisSpec pins it there). The per-doc
    * reconstruction is map-side HOFs — no shuffle after the flagged-
    * start aggregation.
    *
    * Output: (idCol, n_tokens, n_removed, cleaned_text). */
  def removeBoilerplateSpans(df: DataFrame, idCol: String, textCol: String,
                             width: Int = 4, maxDocFreq: Long = 2,
                             hotBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1: $maxDocFreq")
    val toks = spanToks(df, idCol, textCol)
    val grams = spanGrams(toks, width)
    val hot = grams.groupBy(col("__gram"))
      .agg(countDistinct(col("__id")).as("__df"))
      .where(col("__df") > maxDocFreq).select(col("__gram"))
    val hotHinted =
      if (hot.queryExecution.optimizedPlan.stats.sizeInBytes <= hotBroadcastMaxBytes)
        broadcast(hot)
      else hot
    cutFlaggedSpans(toks, grams, hotHinted, width, idCol)
  }

  /** Surgical span-level DECONTAMINATION — the composition of the d27
    * span machinery with the bench-key state: instead of dropping a
    * contaminated document wholesale ([[contaminationFlags]] /
    * [[contaminationFlagsAgainstKeys]]), cut ONLY the spans that match a
    * benchmark shingle and keep the rest of the document (the pass a
    * pipeline runs when contaminated docs are too valuable to discard —
    * a long article quoting one eval question loses the quote, not the
    * article). `benchKeys` is a frame of md5 shingle keys in `__sh` —
    * [[readBenchKeys]] / [[readBenchKeysLatest]] output — and `width`
    * MUST equal the shingle width the keys were written with (the
    * readers fail fast on a mismatch, so read with `k = width`). The
    * gram construction here is bit-identical to the bench shingles
    * (case-normalized, space-joined, md5), which is what makes the
    * composition sound. Docs shorter than `width` tokens emit no grams
    * and pass through uncut — screen those with the doc-level flags.
    *
    * Scale shape: identical to [[removeBoilerplateSpans]] except the
    * flag set arrives pre-built (no corpus frequency pass): one
    * tokenize, (16-byte md5, id, pos) triples are the only shuffle,
    * bench keys broadcast under a plan-stats guard, rebuild is
    * map-side. Output: (idCol, n_tokens, n_removed, cleaned_text). */
  def decontaminateSpans(df: DataFrame, idCol: String, textCol: String,
                         benchKeys: DataFrame, width: Int = 8,
                         benchBroadcastMaxBytes: Long = 512L << 20): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    val toks = spanToks(df, idCol, textCol)
    val grams = spanGrams(toks, width)
    val keys = benchKeys.select(col("__sh").as("__gram"))
    val keysHinted =
      if (keys.queryExecution.optimizedPlan.stats.sizeInBytes <= benchBroadcastMaxBytes)
        broadcast(keys)
      else keys
    cutFlaggedSpans(toks, grams, keysHinted, width, idCol)
  }

  private def spanToks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))

  /** (__id, __pos, __gram) triples: case-normalized md5 keys of `width`-
    * token spans. Docs shorter than `width` emit no grams (sequence(0,
    * negative) would count DOWN — guard it). The lower() sits INSIDE the
    * md5 over the space-joined span, which distributes over the join —
    * exactly [[shinglesFromTokens]] over lowercased tokens, so these keys
    * are interchangeable with the bench-shingle keys at equal width. */
  private def spanGrams(toks: DataFrame, width: Int): DataFrame = {
    val gramArr = when(size(col("__toks")) < width,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(col("__toks")) - width),
        i => md5(lower(concat_ws(" ", slice(col("__toks"), i + lit(1), lit(width)))))))
    toks.select(col("__id"), posexplode(gramArr).as(Seq("__pos", "__gram")))
  }

  /** Shared cut path: positions covered by any flagged span start are
    * removed, survivors (original case) re-join. Deterministic and
    * partitioning-independent — flagged starts are sorted distinct
    * positions and the keep-filter is a pure predicate over them. */
  private def cutFlaggedSpans(toks: DataFrame, grams: DataFrame,
                              flagged: DataFrame, width: Int,
                              idCol: String): DataFrame = {
    val starts = grams.join(flagged, Seq("__gram"))
      .groupBy(col("__id"))
      .agg(array_sort(collect_set(col("__pos"))).as("__starts"))
    val covered: Column => Column = p =>
      exists(col("__starts"), s => p >= s && p <= s + width - 1)
    val kept = transform(
      filter(when(size(col("__toks")) === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0), size(col("__toks")) - 1)),
        p => !covered(p)),
      p => element_at(col("__toks"), p + 1))
    toks.join(starts, Seq("__id"), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__kept", kept)
      .select(col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("__kept")).as("cleaned_text"))
  }

  /** Connected components over an undirected pair list — the step that
    * turns near-dup PAIRS into dedup DECISIONS: every doc in a component
    * gets the component's minimum id as its cluster label (the canonical
    * "keeper"), so `keep = (id == cluster)` collapses each near-dup
    * cluster to one representative.
    *
    * Algorithm: min-label propagation to fixpoint — each round every node
    * takes the min of its own label and its neighbors' labels. Rounds =
    * graph diameter (near-dup clusters are dense, so typically 2-3); each
    * round is one co-partitioned join + aggregate on (id, label) pairs
    * only. Labels persist per round and the loop's driver-side work is a
    * single changed-count per iteration — at 100TB this is the standard
    * alternative to collecting edges (which doesn't fit anywhere).
    * Nodes not present in `pairs` are implicit singletons (their cluster
    * is themselves); callers left-anti/left-join against this output. */
  def connectedComponents(pairs: DataFrame, idCol1: String = "id1",
                          idCol2: String = "id2",
                          maxIterations: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val dt1 = pairs.schema(idCol1).dataType
    val dt2 = pairs.schema(idCol2).dataType
    require(dt1 == dt2,
      s"pair id columns disagree: $idCol1 is ${dt1.simpleString}, $idCol2 is ${dt2.simpleString}")
    if (dt1.isInstanceOf[NumericType])
      return ccNumeric(pairs, idCol1, idCol2, maxIterations)
    // The pair list is typically the OUTPUT of the expensive LSH/winnowing
    // pipeline, and this path consumes it three times (node-set sort +
    // two surrogate joins) before the loop's own edge build — persist it
    // once so the producer pipeline runs once, not per consumer. (Skipped
    // when the caller already persisted it.)
    val ownPairs = pairs.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE
    if (ownPairs)
      pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Small graphs skip the surrogate translation entirely: min-label's
    // operators (min/least/coalesce and the hash checksum) are
    // type-agnostic, and below the threshold the translation's ~6 extra
    // shuffles (node sort + two joins in, two joins out) cost more than
    // slightly pricier string comparisons over a handful of rounds. At
    // scale the per-round string shuffle dominates and the
    // order-preserving numeric surrogate pays for itself.
    val surrogateThreshold = pairs.sparkSession.conf
      .get("graft.cc.surrogateEdgeThreshold", "2000000").toLong
    if (pairs.count() < surrogateThreshold) {
      // honor a forced graft.cc.algorithm even on the direct string path
      // (both loops' operators — min/least/greatest/xxhash64 — are
      // type-agnostic); auto means min-label here, the small-graph choice
      val direct =
        if (pairs.sparkSession.conf.get("graft.cc.algorithm", "auto") == "star")
          ccStar(pairs, idCol1, idCol2, maxIterations)
        else ccMinLabel(pairs, idCol1, idCol2, maxIterations)
      if (ownPairs) pairs.unpersist(blocking = true)
      return direct
    }
    // Non-numeric ids (strings/UUIDs/URLs — the real-world document key):
    // map them to ORDER-PRESERVING numeric surrogates, run the numeric
    // loop, map back. Order preservation is the only property the loop
    // needs (min-surrogate == min-original-id, so the "cluster keeper =
    // MIN id" contract survives translation — lexicographic min for
    // strings, what an engine's MIN() gives); density is not required.
    // Construction: range-partition the distinct node set by id, sort
    // within partitions, then monotonically_increasing_id — the id is
    // (rangePartitionIndex << 33) + rowOffset, increasing within each
    // sorted partition AND across the ordered ranges, so it preserves
    // the global sort order without the RDD zipWithIndex detour round 5
    // used (which left Tungsten for a row re-encode and scheduled an
    // extra count job). Entirely distributed — no driver collect, no
    // single-partition window; holds for up to 2^33 (~8.6B) nodes per
    // range partition, far past any sane partitioning of a node set.
    // Nodes ≪ corpus (only docs appearing in pairs), so the sort is a
    // small fraction of the pairing cost at any scale.
    val sur = pairs.select(col(idCol1).as("orig"))
      .union(pairs.select(col(idCol2).as("orig"))).distinct()
      .repartitionByRange(col("orig"))
      .sortWithinPartitions("orig")
      .withColumn("sid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spairs = pairs
      .join(sur.select(col("orig").as(idCol1), col("sid").as("__s1")), Seq(idCol1))
      .join(sur.select(col("orig").as(idCol2), col("sid").as("__s2")), Seq(idCol2))
      .select("__s1", "__s2")
    val mapped = ccNumeric(spairs, "__s1", "__s2", maxIterations)
      .join(sur.select(col("sid").as("id"), col("orig").as("__oid")), Seq("id"))
      .join(sur.select(col("sid").as("cluster"), col("orig").as("__oclu")), Seq("cluster"))
      .select(col("__oid").as("id"), col("__oclu").as("cluster"))
    // Truncate the back-mapping (one small row per node) so the surrogate
    // table and the pair cache can be freed NOW instead of leaking until
    // session teardown — the loop inside ccNumeric is already eager, so
    // this materializes only the two mapping joins.
    val res = truncateFrame(mapped)
    sur.unpersist(blocking = true)
    if (ownPairs) pairs.unpersist(blocking = true)
    res
  }

  /** Eager lineage truncation: reliable `checkpoint()` when the session
    * has a checkpoint dir (executor-churn-safe — blocks survive on the
    * FS), `localCheckpoint()` otherwise. Opt out of the reliable path
    * with graft.cc.reliableCheckpoint=false.
    *
    * A reliable checkpoint on an UNPERSISTED frame computes the plan
    * twice: once for the eager action and again when the checkpoint
    * write re-runs the RDD (Spark's classic checkpoint double-compute).
    * So persist around the checkpoint — the write then replays cache
    * blocks instead of the plan — and free the blocks immediately: the
    * returned frame is backed by the checkpoint files, not the cache. */
  /** Spread a low-parallelism input across the session's cores before a
    * compute MULTIPLIER (explodes that emit O(k²) rows per input row):
    * scan parallelism is sized to input BYTES (guide §2.5 — one small
    * unsplittable file is ONE partition, and a single parquet row group
    * cannot split), which serializes every downstream pipeline stage on
    * a single core however expensive the per-row work is. No-op when
    * the plan already carries >= defaultParallelism partitions — any
    * real corpus at scale — so the round-robin exchange is paid exactly
    * when the input is small enough for it not to matter.
    *
    * Only SCAN-ROOTED plans (a narrow Project/Filter chain over one
    * leaf) are probed: with AQE on, `.rdd` on a plan containing
    * exchanges materializes every upstream query stage eagerly in a
    * separate QueryExecution, so a shuffle-bearing input would execute
    * those stages for the probe and AGAIN for the consumer — no
    * exchange reuse spans the two executions (ADVICE r17). Such a frame
    * already carries shuffle-sized partitioning anyway (and an
    * AQE-coalesced one must not be re-exploded into a full extra
    * shuffle of raw text), so it falls through untouched. */
  private[graft] def spreadForCompute(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf
        .get("graft.spreadForCompute", "true") == "false") return df
    if (!scanRooted(df.queryExecution.analyzed)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Narrow chain over exactly one leaf — the plans whose `.rdd` is free
    * to construct (no exchanges, hence no AQE query-stage
    * materialization during the partition probe). */
  private def scanRooted(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical
    plan match {
      case p: logical.Project => scanRooted(p.child)
      case f: logical.Filter => scanRooted(f.child)
      case s: logical.SubqueryAlias => scanRooted(s.child)
      case _: logical.LeafNode => true
      case _ => false
    }
  }

  private[graft] def truncateFrame(df: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined &&
      df.sparkSession.conf.get("graft.cc.reliableCheckpoint", "true") != "false"
    val own = df.storageLevel == StorageLevel.NONE
    if (own) df.persist(StorageLevel.MEMORY_AND_DISK)
    val out = if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    if (own) df.unpersist(blocking = true)
    out
  }

  /** Rounds the last connectedComponents call ON THIS THREAD took —
    * bench/test read-back (thread-local, so concurrent pipelines never
    * clobber each other's value; a CC call and its read-back share the
    * caller's thread). The durable, pipeline-visible channel is the
    * Metrics driver event ("graft.cc"/"rounds", tagged with the
    * algorithm) emitted per call — see recordCcRounds. */
  private val ccRoundsLocal = new ThreadLocal[Int] {
    override def initialValue(): Int = 0
  }
  private[graft] def lastCcRounds: Int = ccRoundsLocal.get()

  private def recordCcRounds(algorithm: String, iters: Int): Unit = {
    ccRoundsLocal.set(iters)
    graft.core.Metrics.recordDriver("graft.cc", "rounds", iters.toLong,
      tags = algorithm)
  }

  /** Algorithm dispatch. "auto" (default) picks min-label for small edge
    * sets and large-star/small-star above `graft.cc.starEdgeThreshold`
    * (default 2M edges): a star round costs ~2x a min-label round (two
    * groupBy+join steps vs one), so on the small-diameter graphs small
    * corpora produce it loses on constant factors, while at scale the
    * O(log^2 n)-vs-O(diameter) round count dominates — chain-heavy
    * near-dup graphs are exactly where min-label degenerates. The count
    * materializes the (persisted) pair frame the loop needs anyway. */
  private def ccNumeric(pairs: DataFrame, idCol1: String, idCol2: String,
                        maxIterations: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val conf = pairs.sparkSession.conf
    conf.get("graft.cc.algorithm", "auto") match {
      case "minlabel" => ccMinLabel(pairs, idCol1, idCol2, maxIterations)
      case "star" => ccStar(pairs, idCol1, idCol2, maxIterations)
      case _ =>
        val own = pairs.storageLevel == StorageLevel.NONE
        if (own) pairs.persist(StorageLevel.MEMORY_AND_DISK)
        val threshold =
          conf.get("graft.cc.starEdgeThreshold", "2000000").toLong
        val res =
          if (pairs.count() >= threshold)
            ccStar(pairs, idCol1, idCol2, maxIterations)
          else ccMinLabel(pairs, idCol1, idCol2, maxIterations)
        if (own) pairs.unpersist(blocking = true)
        res
    }
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round rewrites the edge set so nodes point at ever-smaller ids —
    * large-star hangs every neighbor larger than u onto u's minimum,
    * small-star flattens the rest — converging to a star forest whose
    * roots are the component minima in O(log^2 n) rounds. Min-label
    * propagation (ccMinLabel) needs O(diameter) rounds, which on the
    * chain-heavy graphs near-dup corpora produce (A~B~C~... shingle
    * drift) is the dominant cost; the star form halves-or-better the
    * round count there. Both converge to identical (id, cluster=min)
    * output; graft.cc.algorithm=minlabel restores the old loop.
    *
    * Scale shape per round: one groupBy + one equi-join per star step
    * over the (u, v) edge frame — ids only, never payloads — with the
    * same per-round eager lineage truncation as ccMinLabel (plan growth,
    * not data volume, is the iterative-loop killer; see that comment). */
  private def ccStar(pairs: DataFrame, idCol1: String, idCol2: String,
                     maxIterations: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val ownPairs = pairs.storageLevel == StorageLevel.NONE
    if (ownPairs) pairs.persist(StorageLevel.MEMORY_AND_DISK)
    // all nodes EVER seen — edges shrink as stars collapse, but every
    // node still owes an output row (roots map to themselves)
    val nodes = pairs.select(col(idCol1).as("id"))
      .union(pairs.select(col(idCol2).as("id"))).distinct()
    // canonical (big, small) orientation; both star steps preserve it
    var edges = truncateFrame(
      pairs.select(greatest(col(idCol1), col(idCol2)).as("u"),
          least(col(idCol1), col(idCol2)).as("v"))
        .where(col("u") =!= col("v")).distinct())

    // large-star: for every node u (over the SYMMETRIC neighbor view),
    // connect each strictly-larger neighbor to m = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val withMin = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // no distinct: each directed sym edge emits at most one row, so
      // output stays <= |sym|; small-star's round-final distinct dedups
      sym.join(withMin, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    // small-star: for every u (edges already point big -> small),
    // connect u and all its smaller neighbors to m = min(N(u) ∪ {u})
    def smallStar(e: DataFrame): DataFrame = {
      val withMin = e.groupBy(col("u")).agg(min(col("v")).as("mv"))
      e.join(withMin, Seq("u"))
        .select(explode(array(
          struct(col("v").as("u"), col("mv").as("v")),
          struct(col("u"), col("mv").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    // Convergence via (count, hash-sum) fingerprint of the edge SET: both
    // steps are the identity exactly on a star forest, so an unchanged
    // round means done. One cheap aggregate replaces a per-round except()
    // (a full extra shuffle). TWO independent hash-sums (the second
    // salt-seeded) guard the correctness-critical fixpoint test: a false
    // positive now needs simultaneous 64-bit collisions in both families
    // at equal cardinality (~2^-128), vs ~2^-64 for one.
    def fingerprint(e: DataFrame): (Long, BigDecimal, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        sum(xxhash64(lit("graft-cc-b"), col("u"), col("v")).cast("decimal(38,0)"))).head()
      def d(i: Int) = if (r.isNullAt(i)) BigDecimal(0) else BigDecimal(r.getDecimal(i))
      (r.getLong(0), d(1), d(2))
    }
    var prevFp = fingerprint(edges)
    var converged = prevFp._1 == 0 // no non-loop edges: all singletons
    var iters = 0
    while (!converged && iters < maxIterations) {
      val prev = edges
      // the large-star result feeds small-star's groupBy AND join —
      // persist for the round so the two-shuffle step runs once
      val ls = largeStar(edges).persist(StorageLevel.MEMORY_AND_DISK)
      val next = truncateFrame(smallStar(ls))
      ls.unpersist(blocking = true)
      val fp = fingerprint(next)
      converged = fp == prevFp
      prevFp = fp
      edges = next
      iters += 1
      prev.unpersist(blocking = true)
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents (star) did not converge in $maxIterations rounds")
    recordCcRounds("star", iters)
    // star forest -> labels: every non-root points straight at its
    // component min; roots (nodes never on the u side) label themselves
    val labels = edges.select(col("u").as("id"), col("v").as("cluster"))
      .unionByName(
        nodes.join(edges.select(col("u").as("id")), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("cluster")))
    val res = truncateFrame(labels)
    edges.unpersist(blocking = true)
    if (ownPairs) pairs.unpersist(blocking = true)
    res
  }

  private def ccMinLabel(pairs: DataFrame, idCol1: String, idCol2: String,
                         maxIterations: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Lineage truncation per round is mandatory (see below), and HOW is a
    // deployment choice: localCheckpoint blocks live in executor memory
    // and die with executor churn/preemption — fine single-JVM, fatal on
    // a busy 100TB cluster. When the session has a checkpoint dir
    // configured, truncate through the reliable FS-backed checkpoint()
    // instead (opt out with graft.cc.reliableCheckpoint=false).
    def truncate(df: DataFrame): DataFrame = truncateFrame(df)
    // `pairs` feeds both union branches of the edge frame; without its own
    // persist the (expensive) pair producer evaluates twice when the edge
    // cache materializes.
    val ownPairs = pairs.storageLevel == StorageLevel.NONE
    if (ownPairs) pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = pairs.select(col(idCol1).as("a"), col(idCol2).as("b"))
      .union(pairs.select(col(idCol2).as("a"), col(idCol1).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // truncate (checkpoint), not persist: each round references `labels`
    // twice, so the LOGICAL plan quadruples per round — by round 6 on a
    // 9.5M-edge graph the driver was re-optimizing a 200k-node tree per
    // action (executors idle, 100% driver CPU; measured 395s where
    // execution is ~25s). Caching fixes execution reuse but not plan
    // growth; an eager checkpoint truncates the lineage to an O(1)
    // LogicalRDD per round — the standard iterative-algorithm hygiene
    // (GraphX does the same).
    var labels = truncate(edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")))
    // Convergence via checksum, not a per-round comparison join: labels
    // only ever DECREASE, so sum(label) strictly decreases until the
    // fixpoint — one cheap aggregate over the checkpointed frame replaces
    // a full join+filter+count per round. Numeric labels: exact decimal
    // sum, overflow-free at any id range. Non-numeric labels (the direct
    // string path): decimal sum of xxhash64(label) — equal sums mean an
    // unchanged label MULTISET, and strictly-decreasing moves can never
    // preserve the multiset (the largest changed label would need an
    // increase to refill), so unchanged checksum = fixpoint. The string
    // path folds in a SECOND, salt-seeded hash-sum: a false fixpoint now
    // needs simultaneous collisions in both 64-bit families at equal
    // cardinality (~2^-128). The numeric path needs none of this — its
    // sum is exact and strictly decreasing, so equality IS the fixpoint.
    val numericLabels = pairs.schema(idCol1).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def checksum(df: DataFrame): (BigDecimal, BigDecimal) = {
      val (c1, c2) =
        if (numericLabels)
          (sum(col("label").cast("decimal(38,0)")),
            sum(lit(0)).cast("decimal(38,0)"))
        else
          (sum(xxhash64(col("label")).cast("decimal(38,0)")),
            sum(xxhash64(lit("graft-cc-b"), col("label")).cast("decimal(38,0)")))
      val r = df.agg(c1, c2).head()
      def d(i: Int) = // null = empty graph
        if (r.isNullAt(i)) BigDecimal(0) else BigDecimal(r.getDecimal(i))
      (d(0), d(1))
    }
    var prevSum = checksum(labels)
    var converged = labels.isEmpty // no pairs -> nothing to propagate
    var iters = 0
    while (!converged && iters < maxIterations) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("label").as("blab")), Seq("b"))
        .groupBy(col("a")).agg(min(col("blab")).as("nlab"))
        .select(col("a").as("id"), col("nlab"))
      val prev = labels
      val next = truncate(labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlab"), col("label"))).as("label")))
      val nextSum = checksum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iters += 1
      // `truncate` is eager, so `next`'s blocks no longer reference the
      // previous round — drop its checkpoint blocks now instead of letting
      // a deep loop accumulate every round's storage until GC
      prev.unpersist(blocking = true)
    }
    // a partially-propagated labeling is silently WRONG (one component
    // reported as several "keepers") — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIterations rounds " +
        "(component diameter exceeds maxIterations — raise it)")
    recordCcRounds("minlabel", iters)
    edges.unpersist(blocking = true)
    if (ownPairs) pairs.unpersist(blocking = true)
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Incremental connected components: fold a batch of NEW edges into a
    * prior labeling WITHOUT recomputing over the historical edge set —
    * the maintenance twin every other versioned artifact here already
    * has (d11 signatures, m43 BM25, m44 IVF) and CC lacked: at the 988k
    * ScaleBench corpus a from-scratch CC costs ~27s per snapshot even
    * when the appended batch is a few thousand pairs.
    *
    * `prior` is an (id, cluster) labeling as produced by
    * [[connectedComponents]] — cluster = MIN id of the component, the
    * canonical form this operator both REQUIRES and PRESERVES, so it
    * composes with itself across successive batches. Returns the
    * labeling of the UNION graph, bit-identical to
    * `connectedComponents(historicalPairs ∪ newEdges)` (d80's oracle
    * states that invariant as a from-scratch transitive closure).
    *
    * Soundness: contracting an already-connected component to a single
    * vertex preserves connectivity, and prior labels ARE that
    * contraction. Each new edge maps its endpoints to their prior
    * labels (a node history never saw is its own label); CC over the
    * contracted frontier graph then yields, per merged component, the
    * MIN over {prior labels, new node ids} — and because every prior
    * label is itself the min id of its old component, that value IS
    * the min id of the merged component: the output stays canonical.
    *
    * Scale shape — every stage is bounded by the BATCH, never history:
    *  - frontier (distinct batch endpoints) broadcast-SEMI-prunes
    *    `prior` for the label lookup, so the full labeling is scanned
    *    map-side but never shuffled (the m60 touched-keys discipline);
    *  - the CC loop runs on the contracted graph: ≤ 2·|batch| nodes
    *    regardless of history size ([[lastCcRounds]] reads its rounds);
    *  - the relabel applies the remap (only labels that actually
    *    merged — frontier-bounded by construction) as a BROADCAST join
    *    over `prior`: untouched rows pass through byte-identical with
    *    no shuffle. With `changedOnly = true` only the rows a persisted
    *    labeling store must rewrite are returned (new nodes + relabeled
    *    rows) — the bucketed-rewrite contract of the m58 state sink; a
    *    label store partitioned by cluster bucket would partition-prune
    *    this to the merged clusters' buckets.
    *
    * Premise: |newEdges| ≪ |prior| (the append regime — the frontier
    * and remap broadcasts are batch-bounded). For batch ≈ history,
    * run [[connectedComponents]] from scratch instead. */
  def incrementalConnectedComponents(prior: DataFrame, newEdges: DataFrame,
      idCol1: String = "id1", idCol2: String = "id2",
      maxIterations: Int = 50, changedOnly: Boolean = false): DataFrame = {
    val (remap, newNodes, _) =
      incrementalCcParts(prior, newEdges, idCol1, idCol2, maxIterations)
    val relabeledPrior = prior.select(col("id"), col("cluster"))
      .join(broadcast(remap), col("cluster") === col("__from"), "left")
      .select(col("id"), coalesce(col("__to"), col("cluster")).as("cluster"),
        col("__to").isNotNull.as("__changed"))
    val full = relabeledPrior.unionByName(newNodes)
    (if (changedOnly) full.where(col("__changed")) else full)
      .select(col("id"), col("cluster"))
  }

  /** The two batch-bounded, lineage-truncated frames an incremental CC
    * fold reduces to — shared by [[incrementalConnectedComponents]]
    * (which applies them over the full prior labeling) and the
    * label-store fold ([[appendCcEdgesToLabelStore]], which needs the
    * parts THEMSELVES to know which cluster buckets to rewrite):
    *
    *  - `remap` (__from, __to): old label → new label, ONLY for labels
    *    the batch actually merged;
    *  - `newNodes` (id, cluster, __changed=true): nodes history never
    *    saw, already canonically labeled;
    *  - `endpointLabels` (id, cluster): every batch endpoint's FINAL
    *    (post-fold) label — what the edge sidecar needs to bucket the
    *    batch's edges, including an edge INSIDE an existing cluster
    *    (no merge, so absent from `remap`, yet its bucket is touched).
    *
    * All three are truncated (self-contained), so callers may compose
    * them into lazy plans without re-running the batch's producer
    * pipeline. */
  private[graft] def incrementalCcParts(prior: DataFrame,
      newEdges: DataFrame, idCol1: String, idCol2: String,
      maxIterations: Int): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val dt1 = newEdges.schema(idCol1).dataType
    val dt2 = newEdges.schema(idCol2).dataType
    require(dt1 == dt2,
      s"pair id columns disagree: $idCol1 is ${dt1.simpleString}, " +
        s"$idCol2 is ${dt2.simpleString}")
    require(prior.schema("id").dataType == dt1 &&
      prior.schema("cluster").dataType == dt1,
      s"prior labeling type ${prior.schema("id").dataType.simpleString} " +
        s"does not match edge id type ${dt1.simpleString}")
    val e = newEdges.select(col(idCol1).as("__a"), col(idCol2).as("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val frontier = e.select(col("__a").as("id"))
      .union(e.select(col("__b").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // prior rows the batch can SEE: broadcast semi-prune — history is
    // scanned (2-column projection), never shuffled
    val touched = prior.select(col("id"), col("cluster"))
      .join(broadcast(frontier), Seq("id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // canonical-form guard: the fold REQUIRES cluster = min member id
    // (scaladoc contract) and a non-canonical prior mis-merges SILENTLY
    // — so the labels this fold actually consumes (the batch-bounded
    // touched rows, already cached) are checked for the one violation
    // that is locally detectable: a label larger than its member's id
    require(touched.where(col("cluster") > col("id")).isEmpty,
      "incrementalConnectedComponents: prior labeling is not canonical " +
        "(found a row with cluster > id; cluster must be the MIN member " +
        "id, as connectedComponents produces) — rebuild from scratch")
    // endpoint -> contracted vertex (its prior label, or itself if new)
    val lab = frontier.join(broadcast(touched), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("__lab"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val contracted = e
      .join(lab.select(col("id").as("__a"), col("__lab").as("__la")), Seq("__a"))
      .join(lab.select(col("id").as("__b"), col("__lab").as("__lb")), Seq("__b"))
      .select(col("__la").as("id1"), col("__lb").as("id2"))
    val merged = connectedComponents(contracted, "id1", "id2", maxIterations)
    // labels that actually move (min only ever decreases); everything
    // else — including every untouched historical cluster — is absent.
    // Truncated (they're batch-bounded) so the caches below can release
    // without re-running the batch's producer pipeline on materialization;
    // the FULL output is deliberately NOT truncated — that would copy all
    // of history through a checkpoint, an O(history) write the ∝-batch
    // contract forbids. The returned plan is a map-side broadcast join
    // over `prior` plus these self-contained frames.
    val remap = truncateFrame(merged.where(col("id") =!= col("cluster"))
      .select(col("id").as("__from"), col("cluster").as("__to")))
    // nodes history never saw: contracted vertex is the id itself, so
    // the remap applies directly (an unmapped new node is its own root)
    val newNodes = truncateFrame(frontier
      .join(broadcast(touched.select(col("id"))), Seq("id"), "left_anti")
      .join(broadcast(remap), col("id") === col("__from"), "left")
      .select(col("id"), coalesce(col("__to"), col("id")).as("cluster"),
        lit(true).as("__changed")))
    // every endpoint's post-fold label: its contracted vertex remapped
    // if that label merged (new nodes' contracted vertex is their own
    // id, which the remap covers too) — batch-bounded like the others
    val endpointLabels = truncateFrame(lab
      .join(broadcast(remap), col("__lab") === col("__from"), "left")
      .select(col("id"),
        coalesce(col("__to"), col("__lab")).as("cluster")))
    Seq(lab, touched, frontier, e).foreach(_.unpersist(blocking = true))
    (remap, newNodes, endpointLabels)
  }

  /** The hash bucket a cluster's label rows live in. */
  private def ccClusterBucket(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  /** Marker naming a label-store version's cluster-bucket count —
    * read before the row stamp (`cluster_buckets`, kept for
    * self-description) so the fold never has to touch data to learn
    * the bucket space. */
  private[graft] val ClusterBucketsMarker = "_cluster_buckets"

  /** Bootstrap a PERSISTED (id, cluster) labeling store: a
    * [[LayoutStore]]-versioned table partitioned by
    * `cb = pmod(xxhash64(cluster), clusterBuckets)`, the bucket count
    * stamped on every row (the positional-index convention). Partitioning
    * by CLUSTER — not id — is the load-bearing choice: a merge relabels
    * whole clusters, so the rows a fold must rewrite live in exactly the
    * buckets of the merged labels (old and new, both in the touched set
    * by construction — moved rows never land in a cold bucket), and
    * every other bucket inherits by manifest reference. Returns the
    * version (1 for a fresh store). */
  def writeCcLabelStore(labels: DataFrame, path: String,
                        clusterBuckets: Int = 64,
                        markers: Map[String, String] = Map.empty): Long = {
    require(clusterBuckets >= 1,
      s"clusterBuckets must be >= 1: $clusterBuckets")
    val conf = labels.sparkSession.sparkContext.hadoopConfiguration
    LayoutStore.writeSnapshot(conf, path) { tmp =>
      labels.select(col("id"), col("cluster"))
        .withColumn("cluster_buckets", lit(clusterBuckets))
        .withColumn("cb", ccClusterBucket(col("cluster"), clusterBuckets))
        .repartition(col("cb"))
        .write.mode("overwrite").partitionBy("cb").parquet(tmp)
      (markers + (ClusterBucketsMarker -> clusterBuckets.toString))
        .foreach { case (n, v) =>
          LayoutStore.writeTextMarker(conf, tmp, n, v) }
    }
  }

  /** The labeling a store snapshot serves (latest version by default). */
  def readCcLabelStore(spark: org.apache.spark.sql.SparkSession,
                       path: String,
                       version: Option[Long] = None): DataFrame =
    LayoutStore.readSnapshotTable(spark, path, "", version)
      .select(col("id"), col("cluster"))

  /** Bootstrap the PAIR-GRAPH SIDECAR of a labeling store: the edge set
    * persisted as its own [[LayoutStore]], rows (id1, id2, cluster)
    * with id1 < id2 canonical and `cluster` = the component both
    * endpoints belong to, partitioned by the SAME cluster-hash
    * bucketing as the labels. The sidecar is what makes RTBF exact
    * forever ([[takedownCcLabelStore]]'s r14 gap): without the edges, a
    * takedown cannot tell whether removing a bridge doc splits its
    * cluster and must serve a stated over-grouping upper bound; with
    * them, the affected clusters' edges are one PARTITION-PRUNED read
    * away (cluster-bucketed, so pruning is at the file listing).
    *
    * `labels` must be the labeling of exactly `pairs`' graph (the
    * [[connectedComponents]] output the label store was built from) —
    * each edge takes its id1 endpoint's cluster, and after CC both
    * endpoints share it by definition. Returns the version. */
  def writeCcEdgeStore(labels: DataFrame, pairs: DataFrame, path: String,
                       clusterBuckets: Int = 64,
                       idCol1: String = "id1", idCol2: String = "id2",
                       markers: Map[String, String] = Map.empty): Long = {
    require(clusterBuckets >= 1,
      s"clusterBuckets must be >= 1: $clusterBuckets")
    val conf = labels.sparkSession.sparkContext.hadoopConfiguration
    val canon = pairs
      .select(least(col(idCol1), col(idCol2)).as("id1"),
        greatest(col(idCol1), col(idCol2)).as("id2"))
      .where(col("id1") =!= col("id2"))
      .distinct()
    val labeled = canon
      .join(labels.select(col("id").as("id1"), col("cluster")), Seq("id1"))
    LayoutStore.writeSnapshot(conf, path) { tmp =>
      labeled
        .withColumn("cluster_buckets", lit(clusterBuckets))
        .withColumn("cb", ccClusterBucket(col("cluster"), clusterBuckets))
        .repartition(col("cb"))
        .write.mode("overwrite").partitionBy("cb").parquet(tmp)
      (markers + (ClusterBucketsMarker -> clusterBuckets.toString))
        .foreach { case (n, v) =>
          LayoutStore.writeTextMarker(conf, tmp, n, v) }
    }
  }

  /** The pair graph an edge-sidecar snapshot serves. */
  def readCcEdgeStore(spark: org.apache.spark.sql.SparkSession,
                      path: String,
                      version: Option[Long] = None): DataFrame =
    LayoutStore.readSnapshotTable(spark, path, "", version)
      .select(col("id1"), col("id2"), col("cluster"))

  /** Fold a batch of new edges into a persisted labeling store
    * ([[writeCcLabelStore]]) as a new snapshot version — the
    * maintenance loop a production dedup graph runs per ingest batch.
    *
    * Physical cost:
    *  - the label LOOKUP for the batch's endpoints scans the store
    *    map-side (2-column projection, broadcast semi-prune — never a
    *    shuffle of history; an id-keyed secondary index would make this
    *    pruned too, not built here);
    *  - the REWRITE reads only the touched cluster-bucket directories
    *    (partition-pruned at the file listing) and writes only them:
    *    files and bytes written are ∝ the clusters the batch merged,
    *    never ∝ the store — cold buckets carry by manifest reference
    *    (the appendBm25Snapshot discipline). An empty or no-op batch
    *    lands an all-carried version (zero files written).
    *
    * Correctness rides [[incrementalCcParts]]: the served labeling is
    * bit-identical to a from-scratch CC over (historical ∪ new) edges —
    * m63 gates exactly that through this store. Returns the new version.
    *
    * With `edgesPath` set, the same fold maintains the PAIR-GRAPH
    * SIDECAR ([[writeCcEdgeStore]]): the batch's canonical edges land
    * labeled by their post-fold cluster (deduplicated against the
    * touched buckets — a duplicate's bucket is touched by
    * construction), merged clusters' existing edges relabel, and cold
    * buckets carry by manifest. The sidecar writes FIRST (it is
    * naturally idempotent — a crash between the two writes replays
    * into a no-op edge fold, while the reverse order would strand the
    * sidecar a batch behind a token-skipped label fold forever). */
  def appendCcEdgesToLabelStore(spark: org.apache.spark.sql.SparkSession,
      path: String, newEdges: DataFrame,
      idCol1: String = "id1", idCol2: String = "id2",
      maxIterations: Int = 50, version: Option[Long] = None,
      markers: Map[String, String] = Map.empty,
      edgesPath: Option[String] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcVersion = version.getOrElse {
      val vs = LayoutStore.versions(conf, path)
      require(vs.nonEmpty,
        s"no label-store versions at $path — bootstrap with " +
          "writeCcLabelStore before folding edges")
      vs.last
    }
    val old = LayoutStore.readSnapshotTable(spark, path, "", Some(srcVersion))
    val buckets = LayoutStore.readTextMarker(conf,
        s"$path/version=$srcVersion", ClusterBucketsMarker)
      .map(_.toInt)
      .orElse(old.select(col("cluster_buckets")).limit(1).collect()
        .headOption.map(_.getInt(0)))
      .getOrElse(throw new IllegalArgumentException(
        s"label store at $path version=$srcVersion carries neither a " +
          s"$ClusterBucketsMarker marker nor rows to read the bucket " +
          "count from"))
    val (remap, newNodes, endpointLabels) = incrementalCcParts(
      old.select(col("id"), col("cluster")), newEdges, idCol1, idCol2,
      maxIterations)
    // ---- pair-graph sidecar fold (before the label write — see doc) --
    edgesPath.foreach { ep =>
      val vsE = LayoutStore.versions(conf, ep)
      require(vsE.nonEmpty,
        s"no edge-store versions at $ep — bootstrap with writeCcEdgeStore")
      val srcE = vsE.last
      val eBuckets = LayoutStore.readTextMarker(conf,
          s"$ep/version=$srcE", ClusterBucketsMarker).map(_.toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"edge store at $ep version=$srcE carries no bucket count"))
      val oldE = LayoutStore.readSnapshotTable(spark, ep, "", Some(srcE))
      val labeledNew = newEdges
        .select(least(col(idCol1), col(idCol2)).as("id1"),
          greatest(col(idCol1), col(idCol2)).as("id2"))
        .where(col("id1") =!= col("id2"))
        .distinct()
        .join(broadcast(endpointLabels.select(col("id").as("id1"),
          col("cluster"))), Seq("id1"))
      // touched: merged labels (old+new) ∪ every batch edge's final
      // cluster (an intra-cluster edge merges nothing yet must land)
      val touchedE = remap.select(col("__from").as("c"))
        .unionByName(remap.select(col("__to").as("c")))
        .unionByName(labeledNew.select(col("cluster").as("c")))
        .select(ccClusterBucket(col("c"), eBuckets).as("cb")).distinct()
        .collect().map(_.getInt(0)).sorted
      LayoutStore.writeSnapshotManifested(conf, ep) { (tmp, _) =>
        if (touchedE.nonEmpty) {
          val oldTouched = oldE
            .where(col("cb").isin(touchedE.map(Integer.valueOf): _*))
          val relabeled = oldTouched.select(col("id1"), col("id2"),
              col("cluster"))
            .join(broadcast(remap), col("cluster") === col("__from"), "left")
            .select(col("id1"), col("id2"),
              coalesce(col("__to"), col("cluster")).as("cluster"))
          // a replayed/duplicate edge already lives in a touched bucket
          // (its final cluster's — in the labeledNew union above), so
          // this anti-join is a COMPLETE dedup with no cold-bucket scan
          val fresh = labeledNew
            .join(oldTouched.select(col("id1"), col("id2")),
              Seq("id1", "id2"), "left_anti")
          relabeled.unionByName(fresh)
            .withColumn("cluster_buckets", lit(eBuckets))
            .withColumn("cb", ccClusterBucket(col("cluster"), eBuckets))
            .repartition(col("cb"))
            .write.mode("overwrite").partitionBy("cb").parquet(tmp)
        }
        LayoutStore.writeTextMarker(conf, tmp, ClusterBucketsMarker,
          eBuckets.toString)
        val touchedDirs = touchedE.map(v => s"cb=$v").toSet
        LayoutStore.effectiveEntries(conf, ep, srcE)
          .filter { case (k, _) =>
            k.startsWith("cb=") && !touchedDirs.contains(k) }
      }
    }
    // touched buckets: old and new labels of every merged cluster plus
    // the new nodes' labels — driver-bounded by the bucket count
    val touched = remap.select(col("__from").as("c"))
      .unionByName(remap.select(col("__to").as("c")))
      .unionByName(newNodes.select(col("cluster").as("c")))
      .select(ccClusterBucket(col("c"), buckets).as("cb")).distinct()
      .collect().map(_.getInt(0)).sorted
    LayoutStore.writeSnapshotManifested(conf, path) { (tmp, _) =>
      if (touched.nonEmpty) {
        // partition-pruned read: only the touched bucket dirs list
        val oldTouched = old
          .where(col("cb").isin(touched.map(Integer.valueOf): _*))
        oldTouched.select(col("id"), col("cluster"))
          .join(broadcast(remap), col("cluster") === col("__from"), "left")
          .select(col("id"),
            coalesce(col("__to"), col("cluster")).as("cluster"))
          .unionByName(newNodes.select(col("id"), col("cluster")))
          .withColumn("cluster_buckets", lit(buckets))
          .withColumn("cb", ccClusterBucket(col("cluster"), buckets))
          .repartition(col("cb"))
          .write.mode("overwrite").partitionBy("cb").parquet(tmp)
      }
      (markers + (ClusterBucketsMarker -> buckets.toString))
        .foreach { case (n, v) =>
          LayoutStore.writeTextMarker(conf, tmp, n, v) }
      val touchedDirs = touched.map(v => s"cb=$v").toSet
      LayoutStore.effectiveEntries(conf, path, srcVersion)
        .filter { case (k, _) =>
          k.startsWith("cb=") && !touchedDirs.contains(k) }
    }
  }

  /** Takedown/RTBF propagation through a persisted labeling store
    * ([[writeCcLabelStore]]): every revoked id's row drops, and the
    * clusters the revocation touched restore a canonical labeling —
    * landing as a new version that physically rewrites ONLY the touched
    * clusters' buckets (the [[graft.llm.Takedown]] ∝-affected
    * discipline; cold buckets carry by manifest reference).
    *
    * Two tiers, chosen by whether the PAIR GRAPH is available:
    *
    *  - EXACT (`pairs` given — the historical pair set, e.g. a
    *    persisted detector output): the affected clusters REBUILD from
    *    the graph restricted to their surviving members. This is the
    *    only correct answer in general — connectivity may genuinely
    *    SPLIT when the revoked doc was the bridge between two
    *    otherwise-disconnected groups, and only the edges can tell.
    *    Cost ∝ the affected clusters' edges, never the corpus.
    *    With `edgesPath` set (the [[writeCcEdgeStore]] sidecar), the
    *    exact tier is ALWAYS available — the affected clusters' edges
    *    read partition-pruned from the sidecar, no caller graph needed
    *    — and the same fold maintains the sidecar itself (revoked-
    *    incident edges drop, surviving affected edges relabel).
    *  - CONSERVATIVE (`pairs` = None, no sidecar): affected clusters
    *    relabel to
    *    their minimum SURVIVING id. Clusters that the revoked doc alone
    *    bridged stay merged — the result is an UPPER BOUND on the true
    *    clustering (an over-grouping never under-deduplicates), stated
    *    here rather than hidden. Labels stay canonical (min surviving
    *    id), so later [[appendCcEdgesToLabelStore]] folds compose.
    *
    * Isolated survivors (nodes whose every pair partner was revoked)
    * REMAIN in the store as their own singleton cluster — they are
    * still corpus documents; only revoked ids vanish. Returns the new
    * version. */
  def takedownCcLabelStore(spark: org.apache.spark.sql.SparkSession,
      path: String, revoked: DataFrame, revokedIdCol: String,
      pairs: Option[DataFrame] = None,
      idCol1: String = "id1", idCol2: String = "id2",
      maxIterations: Int = 50, version: Option[Long] = None,
      edgesPath: Option[String] = None): Long = {
    import org.apache.spark.storage.StorageLevel
    val conf = spark.sparkContext.hadoopConfiguration
    val srcVersion = version.getOrElse {
      val vs = LayoutStore.versions(conf, path)
      require(vs.nonEmpty,
        s"no label-store versions at $path — nothing to take down")
      vs.last
    }
    val old = LayoutStore.readSnapshotTable(spark, path, "", Some(srcVersion))
    val buckets = LayoutStore.readTextMarker(conf,
        s"$path/version=$srcVersion", ClusterBucketsMarker)
      .map(_.toInt)
      .orElse(old.select(col("cluster_buckets")).limit(1).collect()
        .headOption.map(_.getInt(0)))
      .getOrElse(throw new IllegalArgumentException(
        s"label store at $path version=$srcVersion carries no bucket count"))
    val rev = revoked.select(col(revokedIdCol).as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // clusters holding a revoked member: map-side scan of the store
    // against the broadcast revocation list (takedown batches are small
    // — the standing premise of the takedown family)
    val affected = truncateFrame(old
      .join(broadcast(rev), Seq("id"), "left_semi")
      .select(col("cluster")).distinct())
    // surviving members of the affected clusters — frontier-bounded
    val affRows = truncateFrame(old
      .join(broadcast(affected), Seq("cluster"), "left_semi")
      .join(broadcast(rev), Seq("id"), "left_anti")
      .select(col("id"), col("cluster")))
    // the edge sidecar's own version + bucket space (may differ from
    // the label store's) — resolved once, shared by the read and fold
    lazy val edgeStore: Option[(String, Long, Int)] = edgesPath.map { ep =>
      val vsE = LayoutStore.versions(conf, ep)
      require(vsE.nonEmpty,
        s"no edge-store versions at $ep — bootstrap with writeCcEdgeStore")
      val eBuckets = LayoutStore.readTextMarker(conf,
          s"$ep/version=${vsE.last}", ClusterBucketsMarker).map(_.toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"edge store at $ep version=${vsE.last} carries no bucket count"))
      (ep, vsE.last, eBuckets)
    }
    // pair source: the caller's graph, else the persisted sidecar —
    // PARTITION-PRUNED, so the exact tier is always available and
    // never scans the whole edge set. Edges are selected by SURVIVING
    // ENDPOINT, not by old cluster label: a crash between the sidecar
    // fold below and the label write replays against a sidecar that
    // already carries REPLACEMENT labels for the affected clusters, so
    // an old-label semi-join would silently drop exactly the clusters
    // whose label changed (revoked min, or a split) and the rebuilt CC
    // would over-split. id1 of every intra-cluster edge among
    // survivors IS a surviving member (edges never cross cluster
    // boundaries), a label-independent predicate that reads the same
    // edge set from either sidecar state. Bucket pruning widens to
    // old labels ∪ candidate replacement labels — every replacement
    // label is some surviving member's id (the rebuilt component min,
    // or the isolated survivor itself), so the union covers both the
    // pre-fold and the post-fold bucket placement. Still driver-
    // bounded: ≤ eBuckets distinct ints collect.
    val effectivePairs: Option[DataFrame] = pairs.orElse(edgeStore.map {
      case (ep, srcE, eBuckets) =>
        val candBuckets = affected.select(col("cluster").as("__k"))
          .unionByName(affRows.select(col("id").as("__k")))
          .select(ccClusterBucket(col("__k"), eBuckets).as("cb")).distinct()
          .collect().map(r => Integer.valueOf(r.getInt(0)))
        LayoutStore.readSnapshotTable(spark, ep, "", Some(srcE))
          .where(col("cb").isin(candBuckets: _*))
          .join(broadcast(affRows.select(col("id").as("id1"))),
            Seq("id1"), "left_semi")
          .select(col("id1").as(idCol1), col("id2").as(idCol2))
    })
    // replacement labeling for the affected clusters
    val replacement = effectivePairs match {
      case None =>
        // conservative: min surviving id per old cluster
        val newLab = affRows.groupBy(col("cluster"))
          .agg(min(col("id")).as("__nl"))
        affRows.join(newLab, Seq("cluster"))
          .select(col("id"), col("__nl").as("cluster"))
      case Some(pg) =>
        // exact: CC over the pair graph restricted to surviving members
        // of affected clusters (edges never cross correct cluster
        // boundaries, so this restriction loses nothing)
        val affIds = affRows.select(col("id"))
        val scrubbed = pg
          .join(broadcast(affIds.withColumnRenamed("id", idCol1)), Seq(idCol1), "left_semi")
          .join(broadcast(affIds.withColumnRenamed("id", idCol2)), Seq(idCol2), "left_semi")
        val rebuilt = connectedComponents(scrubbed, idCol1, idCol2,
          maxIterations)
        // isolated survivors: every partner revoked -> singleton
        affRows.select(col("id"))
          .join(rebuilt.withColumnRenamed("cluster", "__nl"), Seq("id"), "left")
          .select(col("id"), coalesce(col("__nl"), col("id")).as("cluster"))
    }
    val replacementT = truncateFrame(replacement)
    // ---- pair-graph sidecar fold (edges first — the idempotent side:
    // a crash between the two writes replays against an already-folded
    // sidecar, whose endpoint-selected read above yields the same
    // replacement — and re-folding is a fixpoint: relabeled clusters'
    // rows fall to the cohab branch untouched, unchanged-label rows
    // relabel identically) —
    // revoked-incident edges DROP, surviving affected edges relabel to
    // their rebuilt cluster, cold buckets carry by manifest
    edgeStore.foreach { case (ep, srcE, eBuckets) =>
      val oldE = LayoutStore.readSnapshotTable(spark, ep, "", Some(srcE))
      val touchedE = affected.select(col("cluster").as("c"))
        .unionByName(replacementT.select(col("cluster").as("c")))
        .select(ccClusterBucket(col("c"), eBuckets).as("cb")).distinct()
        .collect().map(_.getInt(0)).sorted
      LayoutStore.writeSnapshotManifested(conf, ep) { (tmp, _) =>
        if (touchedE.nonEmpty) {
          val oldTouched = oldE
            .where(col("cb").isin(touchedE.map(Integer.valueOf): _*))
          val cohab = oldTouched
            .join(broadcast(affected), Seq("cluster"), "left_anti")
            .select(col("id1"), col("id2"), col("cluster"))
          val surviving = oldTouched
            .join(broadcast(affected), Seq("cluster"), "left_semi")
            .join(broadcast(rev.withColumnRenamed("id", "id1")),
              Seq("id1"), "left_anti")
            .join(broadcast(rev.withColumnRenamed("id", "id2")),
              Seq("id2"), "left_anti")
            .select(col("id1"), col("id2"))
            .join(broadcast(replacementT.select(col("id").as("id1"),
              col("cluster"))), Seq("id1"))
            .select(col("id1"), col("id2"), col("cluster"))
          cohab.unionByName(surviving)
            .withColumn("cluster_buckets", lit(eBuckets))
            .withColumn("cb", ccClusterBucket(col("cluster"), eBuckets))
            .repartition(col("cb"))
            .write.mode("overwrite").partitionBy("cb").parquet(tmp)
        }
        LayoutStore.writeTextMarker(conf, tmp, ClusterBucketsMarker,
          eBuckets.toString)
        val touchedDirs = touchedE.map(v => s"cb=$v").toSet
        LayoutStore.effectiveEntries(conf, ep, srcE)
          .filter { case (k, _) =>
            k.startsWith("cb=") && !touchedDirs.contains(k) }
      }
    }
    // touched buckets: the affected clusters' OLD labels plus every
    // replacement label (a rebuilt sub-component's min id may hash
    // elsewhere) — driver-bounded by the bucket count
    val touched = affected.select(col("cluster").as("c"))
      .unionByName(replacementT.select(col("cluster").as("c")))
      .select(ccClusterBucket(col("c"), buckets).as("cb")).distinct()
      .collect().map(_.getInt(0)).sorted
    val out = LayoutStore.writeSnapshotManifested(conf, path) { (tmp, _) =>
      if (touched.nonEmpty) {
        old.where(col("cb").isin(touched.map(Integer.valueOf): _*))
          .join(broadcast(affected), Seq("cluster"), "left_anti")
          .select(col("id"), col("cluster"))
          .unionByName(replacementT)
          .withColumn("cluster_buckets", lit(buckets))
          .withColumn("cb", ccClusterBucket(col("cluster"), buckets))
          .repartition(col("cb"))
          .write.mode("overwrite").partitionBy("cb").parquet(tmp)
      }
      LayoutStore.writeTextMarker(conf, tmp, ClusterBucketsMarker,
        buckets.toString)
      val touchedDirs = touched.map(v => s"cb=$v").toSet
      LayoutStore.effectiveEntries(conf, path, srcVersion)
        .filter { case (k, _) =>
          k.startsWith("cb=") && !touchedDirs.contains(k) }
    }
    rev.unpersist(blocking = true)
    out
  }

  /** Full near-dup DEDUP decision: LSH pairs over `threshold` -> connected
    * components -> (id, cluster, keep). */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, k: Int = 3,
                      numHashes: Int = 12, bands: Int = 4,
                      maxBucketSize: Option[Int] = None): DataFrame = {
    // lazy pairs: connectedComponents persists its pair input itself
    // (ownPairs) before the edge union, so a pre-materialized checkpoint
    // of the same tiny frame would only add a job + barrier; the producer
    // caches release once the (already-truncated) labels are out
    val (pairs, caches) = nearDupPairsLazy(df, idCol, textCol, threshold,
      k, numHashes, bands, maxBucketSize)
    val cc = connectedComponents(pairs)
    caches.foreach(_.unpersist(blocking = true))
    cc.withColumn("keep", col("id") === col("cluster"))
  }

  /** Quality-aware canonical selection: [[nearDupClusters]] keeps the MIN
    * id per component — deterministic but arbitrary. A production dedup
    * keeps the BEST copy (longest text, highest quality score, freshest
    * crawl): canonical = argmax of `quality` within the cluster, ties
    * broken by min id. `quality` is any deterministic Column over `df`'s
    * rows (length(text), a d02 feature, a model score column…).
    *
    * Scale shape: identical to nearDupClusters through CC; then one
    * (id ⋈ id) hash join against the 2-column (id, quality) projection
    * of the corpus (column-pruned scan — text never joins) and one
    * window over `cluster` carrying ~24-byte rows (every row is kept
    * and FLAGGED, like nearDupClusters, so the window computes fully —
    * no top-k prune applies; the shuffled payload is ids+scores only). */
  def canonicalByQuality(df: DataFrame, idCol: String, textCol: String,
                         quality: Column,
                         threshold: Double, k: Int = 3,
                         numHashes: Int = 12, bands: Int = 4,
                         maxBucketSize: Option[Int] = None): DataFrame = {
    val (pairs, caches) = nearDupPairsLazy(df, idCol, textCol, threshold,
      k, numHashes, bands, maxBucketSize)
    val cc = connectedComponents(pairs)
    caches.foreach(_.unpersist(blocking = true))
    val scored = df.select(col(idCol).as("id"), quality.as("__q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("__q").desc, col("id").asc)
    cc.join(scored, Seq("id"))
      .withColumn("keep", row_number().over(w) === 1)
      .drop("__q")
  }

  /** Recall/precision gauge for the LSH near-dup detector — s17's role
    * for the dedup stack: exact ground truth (every unordered pair with
    * true shingle-Jaccard >= threshold; candidates come from a
    * shared-shingle equi-join, a LOSSLESS generator since J >= t > 0
    * implies at least one shared shingle) versus the banded LSH+verify
    * pipeline at its production config. Because LSH's verify step uses
    * the same exact Jaccard, precision is 1.0 by construction (reported,
    * not assumed) and recall isolates exactly the BAND MISS RATE — the
    * probability a true pair never collides in any band — plus whatever
    * the bucket cap dropped. Run it on a sample at scale: the
    * ground-truth generator is quadratic-prone by design (that is what
    * LSH exists to avoid); the gauge tells you what the (numHashes,
    * bands) choice is giving up before you commit it to a 100TB pass.
    * The per-doc size frame joins back twice; it broadcasts ONLY while
    * its plan-stats bound fits `sizesBroadcastMaxBytes` (the d18/d29
    * guard pattern) — a caller who ignores the sample contract and
    * passes the full corpus gets a shuffle join instead of a driver OOM.
    * Output: ONE row (n_true, n_found, n_hit, recall, precision). */
  def lshRecallGauge(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, k: Int = 3, numHashes: Int = 12,
                     bands: Int = 4,
                     maxBucketSize: Option[Int] = None,
                     sizesBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    val sh = spreadForCompute(
        df.select(col(idCol).as("__id"), col(textCol).as("__sftxt")))
      .select(col("__id"),
        TextAnalysis.tokens(lower(col("__sftxt"))).as("__toks"))
      .select(col("__id"), shinglesFromTokens(col("__toks"), k).as("__raw"))
      .select(col("__id"), array_distinct(col("__raw")).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the intersection size |A∩B| IS the per-pair match count of the
    // distinct-shingle equi-join — no per-pair array intersection ever
    // evaluates (the interpreted list-lambda verify was 5x the cost of
    // the join at bench scale): count matches per pair, then Jaccard =
    // c / (|A| + |B| - c) is one arithmetic comparison per pair
    val ex = sh.select(col("__id"), explode(col("__sh")).as("__s"))
    val sizes = sh.select(col("__id"), size(col("__sh")).as("__n"))
    val hintSizes = sizes.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(sizesBroadcastMaxBytes)
    def sized(as1: String, as2: String): DataFrame = {
      val s = sizes.select(col("__id").as(as1), col("__n").as(as2))
      if (hintSizes) broadcast(s) else s
    }
    // Both pair lists feed TWO of the three scalar aggregates below
    // (truth → n_true and n_hit, found → n_found and n_hit), and each
    // aggregate builds as its own broadcast — unmaterialized, the
    // expensive generator pipelines re-ran once per consumer, serially,
    // inside single-threaded broadcast-build jobs (r17 profile: d63's
    // wall was four such builds, the truth and found subtrees each
    // computed twice). Materialize the tiny id-pair projections eagerly
    // (truncateFrame) so each pipeline runs exactly once, in a regular
    // parallel job, before the scalar folds read them.
    val truth = ex.select(col("__id").as("id1"), col("__s"))
      .join(ex.select(col("__id").as("id2"), col("__s")), Seq("__s"))
      .where(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("__c"))
      .join(sized("id1", "__n1"), Seq("id1"))
      .join(sized("id2", "__n2"), Seq("id2"))
      .where(col("__c").cast("double") /
        (col("__n1") + col("__n2") - col("__c")) >= threshold)
      .select(col("id1"), col("id2"))
    val truthM = truncateFrame(truth)
    val found = nearDupPairs(df, idCol, textCol, threshold, k, numHashes,
      bands, maxBucketSize).select(col("id1"), col("id2"))
    val foundM = truncateFrame(found)
    val out = truthM.agg(count(lit(1)).as("n_true"))
      .crossJoin(foundM.agg(count(lit(1)).as("n_found")))
      .crossJoin(truthM.join(foundM, Seq("id1", "id2"), "left_semi")
        .agg(count(lit(1)).as("n_hit")))
      .withColumn("recall", when(col("n_true") === 0, 1.0)
        .otherwise(col("n_hit").cast("double") / col("n_true")))
      .withColumn("precision", when(col("n_found") === 0, 1.0)
        .otherwise(col("n_hit").cast("double") / col("n_found")))
    val res = materializeAndRelease(out, sh)
    releaseTruncated(truthM, foundM)
    res
  }

  /** [[lshRecallGauge]]'s twin for the SIMHASH detector family — one row
    * per blocking tier, so the documented band-tier recall drop at scale
    * (the 4×16-bit chunks saturate: only 2^16 bucket values exist, the
    * cap routes mega-buckets away, pairs silently drop) becomes a
    * first-class measured number next to the combination-key tier that
    * avoids it.
    *
    * Ground truth needs NO quadratic pass here (unlike Jaccard's): the
    * chunk-combination detector run UNCAPPED is pigeonhole-EXACT — two
    * signatures within `maxHamming` must agree on ≥ `chunks −
    * maxHamming` pieces, so the uncapped key join provably generates
    * every true pair, with C(6,3)-style key cardinality (2^33) keeping
    * truth generation itself scalable. Each gauged tier then runs at its
    * PRODUCTION `maxBucketSize`; recall isolates exactly what the cap
    * (on that tier's bucket space) dropped. Precision is 1.0 by
    * construction (every tier exact-Hamming-verifies its candidates) —
    * reported, not assumed. Signatures are computed ONCE and shared by
    * all three pipelines (truth + both tiers) — the gauge is an offline
    * audit, run it before committing a (bands vs combination, cap)
    * choice to a 100TB pass.
    * Output: one row per tier — (tier, n_true, n_found, n_hit, recall,
    * precision); tiers are 'band' and 'combined'. */
  def simhashRecallGauge(df: DataFrame, idCol: String, textCol: String,
                         maxHamming: Int = 3, bands: Int = 4,
                         chunks: Int = 6,
                         maxBucketSize: Option[Int] = None): DataFrame = {
    // same preconditions the public tiers enforce — the gauge calls the
    // key generators directly, and a chunks <= maxHamming config would
    // emit ZERO truth keys: n_true = 0, recall "1.0", a silently
    // vacuous audit from exactly the tool meant to catch recall loss
    require(bands > maxHamming && 64 % bands == 0,
      s"bands ($bands) must exceed maxHamming ($maxHamming) for the " +
        "pigeonhole guarantee and divide 64 evenly")
    require(chunks > maxHamming,
      s"chunks ($chunks) must exceed maxHamming ($maxHamming) for the " +
        "pigeonhole guarantee")
    require(chunks <= 16, s"chunks ($chunks) > 16 explodes combinatorially " +
      "(C(chunks, chunks-maxHamming) keys per doc)")
    val sigs = simhashSigs(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (truthPairs, truthBands) = simhashDetectFromSigs(sigs, maxHamming,
      maxBucketSize = None, simhashComboKeys(chunks, maxHamming))
    // eager-materialized, not persisted: truth feeds n_true + n_hit of
    // BOTH tiers, and a lazy cache would fill inside the first serial
    // broadcast build (the d63 finding)
    val truth = truncateFrame(truthPairs.select(col("id1"), col("id2")))
    val tiers = Seq(
      "band" -> simhashDetectFromSigs(sigs, maxHamming, maxBucketSize,
        simhashBandKeys(bands)),
      "combined" -> simhashDetectFromSigs(sigs, maxHamming, maxBucketSize,
        simhashComboKeys(chunks, maxHamming)))
    // each tier's found pairs feed TWO aggregates (n_found and n_hit),
    // each built as a broadcast — materialize the tiny id-pair
    // projection eagerly so the tier's detect+verify pipeline runs once
    // in a parallel job, not twice inside serial broadcast builds (the
    // d63 finding applied here)
    val founds = tiers.map { case (name, (foundDf, _)) =>
      name -> truncateFrame(foundDf.select(col("id1"), col("id2")))
    }
    val out = founds.map { case (name, found) =>
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .crossJoin(truth.join(found, Seq("id1", "id2"), "left_semi")
          .agg(count(lit(1)).as("n_hit")))
        .select(lit(name).as("tier"), col("n_true"), col("n_found"),
          col("n_hit"))
    }.reduce(_.unionAll(_))
      .withColumn("recall", when(col("n_true") === 0, 1.0)
        .otherwise(col("n_hit").cast("double") / col("n_true")))
      .withColumn("precision", when(col("n_found") === 0, 1.0)
        .otherwise(col("n_hit").cast("double") / col("n_found")))
    val res = materializeAndRelease(out, truthBands, sigs,
      tiers.head._2._2, tiers.last._2._2)
    releaseTruncated(truth +: founds.map(_._2): _*)
    res
  }

  /** Quality-aware canonical selection over EDIT-distance components —
    * the typo/OCR-variant dedup flow end-to-end: [[editNearDupPairs]]
    * pairs (lazy, the cache discipline of [[canonicalByQuality]]) →
    * connected components → keep the BEST copy per component (argmax
    * `quality`, ties min id). The same flow as [[canonicalByQuality]]
    * with the character-level detector underneath: token-set detectors
    * cluster rewordings; this clusters the copies that differ by a few
    * characters. Output: (id, cluster, keep) for every doc in the pair
    * graph. */
  def editCanonical(df: DataFrame, idCol: String, textCol: String,
                    quality: Column, k: Int,
                    maxBucketSize: Option[Int] = None): DataFrame = {
    val (pairs, base) = editNearDupPairsLazy(df, idCol, textCol, k,
      maxBucketSize)
    val cc = connectedComponents(pairs, "id_a", "id_b")
    base.unpersist(blocking = true)
    val scored = df.select(col(idCol).as("id"), quality.as("__q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("__q").desc, col("id").asc)
    cc.join(scored, Seq("id"))
      .withColumn("keep", row_number().over(w) === 1)
      .drop("__q")
  }

  /** Leakage-free train/heldout split — eval hygiene for the split
    * itself: a plain per-doc hash split leaks whenever two NEAR-DUP
    * docs land on opposite sides (the heldout copy is effectively in
    * the training set), so the split key here is the near-dup CLUSTER
    * representative, not the doc: every member of a component shares
    * its rep and therefore its side, and singletons are their own rep.
    * The side decision is the deterministic [[Sampling.sampleKey]] <
    * threshold rule — reproducible across runs, engines, partitionings.
    *
    * Scale shape: LSH + connected components exactly as
    * [[nearDupClusters]] (only ids ride the CC iterations), then ONE
    * (id ⋈ id) left join of the id-projected corpus against the
    * cluster labels (docs outside the pair graph — the vast majority —
    * coalesce to themselves) and a map-side hash comparison for the
    * side. Output: (id, rep, side ∈ {train, heldout}). */
  def leakFreeSplit(df: DataFrame, idCol: String, textCol: String,
                    heldoutRate: Double, salt: String,
                    threshold: Double, k: Int = 3,
                    numHashes: Int = 12, bands: Int = 4,
                    maxBucketSize: Option[Int] = None): DataFrame = {
    require(heldoutRate >= 0 && heldoutRate <= 1,
      s"heldoutRate must be in [0,1]: $heldoutRate")
    val (pairs, caches) = nearDupPairsLazy(df, idCol, textCol, threshold,
      k, numHashes, bands, maxBucketSize)
    val cc = connectedComponents(pairs).select(col("id"), col("cluster"))
    caches.foreach(_.unpersist(blocking = true))
    val cut = Sampling.rateThreshold(heldoutRate)
    df.select(col(idCol))
      .join(cc, df(idCol) === cc("id"), "left")
      .select(col(idCol),
        coalesce(col("cluster"), col(idCol)).as("rep"))
      .withColumn("side",
        when(Sampling.sampleKey(col("rep"), salt) < lit(cut), lit("heldout"))
          .otherwise(lit("train")))
  }

  /** Portable 64-bit token hash: the first 16 hex chars of md5 assembled
    * from two 32-bit halves (hex-parse of the full 16 would overflow a
    * signed long). Bit-identical in any engine with md5 — the property an
    * incremental 100TB dedup needs (see simhash64 for the faster
    * Spark-internal xxhash64 variant). */
  def md5Hash64(t: Column): Column =
    shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))

  /** Portable per-token 64-bit hash array (stage this in its own select —
    * simhashBitsFromHashes reads it 64 times, and staging keeps the md5
    * evaluation at once per token instead of once per token per bit). */
  def md5TokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(lower(text)), t => md5Hash64(t))

  /** Engine-portable SimHash over lowercased whitespace tokens, rendered as
    * a 64-char '0'/'1' string (MSB first — avoids signed-64 representation
    * mismatches between engines). Majority vote per bit position across
    * token hashes, duplicates counted. Computed by the codegen'd
    * graft.functions.SimhashBits expression (one loop over the hashes; the
    * composable form was 64 interpreted aggregate passes). */
  def simhashBitsFromHashes(hashes: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SimhashBits(
        org.apache.spark.sql.GraftColumnBridge.expression(hashes)))

  /** Convenience fused form — prefer the two-step
    * `select(md5TokenHashes)` -> `select(simhashBitsFromHashes)` on large
    * corpora (see md5TokenHashes). */
  def simhashBits(text: Column): Column = simhashBitsFromHashes(md5TokenHashes(text))

  /** Packed-long twin of simhashBitsFromHashes: same md5-token majority
    * vote, one 64-bit long (bit 63 = the string form's first char —
    * `lpad(bin(x), 64, '0')` equals the string form exactly). The
    * detector's shuffle/XOR representation; the string form remains the
    * engine-portable surface (d05, signature state). */
  def simhashPackedFromHashes(hashes: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SimhashPacked(
        org.apache.spark.sql.GraftColumnBridge.expression(hashes)))

  /** SimHash (64-bit) over tokens: per bit position, majority vote of token
    * hash bits, weighted by token frequency. Uses xxhash64 (stable within
    * Spark); for cross-engine-stable signatures use the md5 path above. */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { bit =>
      val mask = lit(1L << bit)
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0L, 1L).otherwise(-1L))
      when(votes > 0, mask).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Cross-stratum contamination matrix: for every unordered pair of
    * strata (source, language, crawl snapshot, train-vs-eval split …),
    * the count of distinct case-normalized `width`-token shingles
    * present in BOTH, with set-Jaccard — the corpus-level view of what
    * [[decontaminate]] decides per document. A high off-diagonal cell
    * is how "split A leaked into split B" shows up BEFORE any training
    * run; the diagonal-free full matrix (zero-overlap pairs included)
    * is the audit artifact.
    *
    * Keys are the d27/d35 span keys (md5 over the lowercased space-
    * joined window) so a suspicious cell drills straight down to the
    * span-level operators over the same vocabulary of shapes. Docs
    * shorter than `width` tokens contribute nothing (d37's contract).
    *
    * Scale shape: ONE corpus tokenize; (stratum, gram) pairs dedup via
    * groupBy (map-side combine — only 16-byte-keyed hash rows shuffle,
    * never text); per-stratum totals and the shared-gram equi-join both
    * consume that frame; a ubiquitous gram contributes at most
    * |strata|² join rows, so no key can straggle; the final matrix
    * assembly crosses two ≤|strata|-row aggregates (broadcast by
    * construction). Jaccard is one division of exact integer counts —
    * bit-stable cross-engine.
    *
    * Output: (stratum_a, stratum_b, n_a, n_b, n_shared, jaccard),
    * stratum_a < stratum_b. */
  def stratumOverlap(df: DataFrame, textCol: String, strataCol: String,
                     width: Int = 8): DataFrame = {
    val (out, sg) = stratumOverlapLazy(df, textCol, strataCol, width)
    materializeAndRelease(out, sg)
  }

  /** [[stratumOverlap]] before materialization: (matrix, the persisted
    * (stratum, gram) frame the caller must release) — plan-introspection
    * seam, same contract as [[winnowingOverlapPairsLazy]]. */
  private[graft] def stratumOverlapLazy(
      df: DataFrame, textCol: String, strataCol: String,
      width: Int): (DataFrame, DataFrame) = {
    require(width >= 1, s"width must be >= 1: $width")
    val toks = df.select(col(strataCol).cast("string").as("__stratum"),
      TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))).as("__toks"))
    val gramArr = when(size(col("__toks")) < width,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(col("__toks")) - width),
        i => md5(concat_ws(" ", slice(col("__toks"), i + lit(1), lit(width))))))
    // persist the distinct (stratum, gram) frame: hash keys only (never
    // text), consumed FOUR times below (totals twice via the cross,
    // both sides of the shared-gram join) — without it the corpus would
    // tokenize four times (plan-guarded in PlanAuditSpec)
    val sg = toks.select(col("__stratum"), explode(gramArr).as("__gram"))
      .groupBy(col("__stratum"), col("__gram")).agg(count(lit(1)).as("__c"))
      .select(col("__stratum"), col("__gram"),
        when(col("__c") >= 1, lit(1)).as("__one"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = sg.groupBy(col("__stratum"))
      .agg(sum(col("__one")).as("n"))
    val shared = sg.as("a")
      .join(sg.select(col("__stratum").as("__sb"), col("__gram")).as("b"),
        Seq("__gram"))
      .where(col("__stratum") < col("__sb"))
      .groupBy(col("__stratum"), col("__sb"))
      .agg(count(lit(1)).as("n_shared"))
    val pairs = totals.select(col("__stratum").as("stratum_a"), col("n").as("n_a"))
      .crossJoin(totals.select(col("__stratum").as("stratum_b"), col("n").as("n_b")))
      .where(col("stratum_a") < col("stratum_b"))
    val out = pairs
      .join(shared.select(col("__stratum").as("stratum_a"),
        col("__sb").as("stratum_b"), col("n_shared")),
        Seq("stratum_a", "stratum_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
    (out, sg)
  }

  /** EXACT token-set Jaccard-threshold pair join via prefix filtering —
    * the exact complement of the MinHash-LSH tier: LSH trades recall
    * for bucketed candidates; this finds EVERY pair with
    * J(A, B) >= num/den, provably, with the candidate explosion tamed
    * by the AllPairs/PPJoin prefix principle (Bayardo et al., WWW'07;
    * Xiao et al., WWW'08): order each doc's distinct tokens by a global
    * (ascending document-frequency, token) rank — rarest first — and
    * only the first `n - ceil(t*n) + 1` tokens of a doc can START a
    * qualifying pair, so ONLY those rows enter the pair-generating
    * equi-join; frequent tokens (the quadratic killers) sit at the back
    * of every prefix and never generate a candidate. Candidates then
    * verify by exact intersection count, and the threshold compare is
    * pure integer arithmetic — J >= num/den iff
    * (den+num)*inter >= num*(na+nb) — no float ever.
    *
    * Beyond the prefix, two more PPJoin filters bound the work:
    *
    *   - POSITIONAL (Xiao et al. §3.2): a shared prefix token at
    *     positions (pa, pb) of the two df-sorted token lists caps the
    *     whole intersection — tokens shared beyond it sit at positions
    *     > pa AND > pb, so inter <= 1 + min(na-pa, nb-pb). Pairs whose
    *     cap already misses the threshold are pruned INSIDE the
    *     pair-generating join. Complete because a qualifying pair's
    *     FIRST shared token (no shared tokens before it on either
    *     side) always lies in both prefixes and always passes its own
    *     cap (inter <= its bound by the same argument).
    *   - The candidate dedup is FOLDED into one aggregation (a pair
    *     surfaces once per shared prefix token); no separate
    *     `.distinct()` exchange.
    *
    * Scale shape: one per-doc token-ARRAY frame (persisted — one row
    * per doc, never re-tokenized), one term-keyed df join, one per-doc
    * window for the rank, the prefix equi-join (rows = prefix tokens
    * only, positional filter applied in the join predicate), ONE
    * candidate-keyed aggregation, and a verify that joins the packed
    * token arrays — each doc's set ships as ONE row per candidate side
    * and the intersection is a per-row `array_intersect`, instead of
    * re-exploding the full (id, term) table twice and aggregating
    * candidates × tokens rows. Completeness holds ONLY cap-free, so
    * there is deliberately no bucket cap here; the production
    * composition is [[exactDedup]] FIRST (verbatim mega-clusters
    * collapse in O(B)), then this on the deduped corpus — the d66
    * contract. A corpus whose near-dup structure is itself quadratic
    * (millions of true pairs) pays that cost in any exact scheme.
    *
    * Output: (id_a, id_b, inter, na, nb) with id_a < id_b — integer
    * columns only, so the oracle compare is hash-exact. */
  /** Per-doc distinct-token frame + df-ranked prefix rows, shared by
    * [[setSimilarityJoin]] and [[setSimilarityJoinCost]] — `docs` must
    * be the `(__id, __terms, __n)` frame both build (persisted by the
    * caller when it feeds more than one pass). */
  private def setSimPrefix(docs: DataFrame, num: Long, den: Long)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("__id"), col("__n"),
      explode(col("__terms")).as("__term"))
    val dfreq = tok.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    // ceil(t*n) in exact integers: (num*n + den - 1) div den, all > 0
    def ceilT(n: Column): Column = {
      val x = n * num + lit(den - 1)
      ((x - pmod(x, lit(den))) / lit(den)).cast("long")
    }
    tok.join(dfreq, Seq("__term"))
      .withColumn("__idx", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__df").asc, col("__term").asc)).cast("long"))
      .where(col("__idx") <= col("__n") - ceilT(col("__n")) + 1)
      .select(col("__id"), col("__term"), col("__n"), col("__idx"))
  }

  private def setSimDocs(df: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        array_distinct(TextAnalysis.tokens(lower(col(textCol))))
          .as("__terms"))
      .withColumn("__n", size(col("__terms")).cast("long"))

  def setSimilarityJoin(df: DataFrame, idCol: String, textCol: String,
                        thresholdNum: Int, thresholdDen: Int,
                        docsBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    require(thresholdNum >= 1 && thresholdDen >= thresholdNum,
      s"threshold $thresholdNum/$thresholdDen not in (0, 1]")
    val (num, den) = (thresholdNum.toLong, thresholdDen.toLong)
    val docs = setSimDocs(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The prefix frame feeds BOTH sides of the self-join: unpersisted,
    // the tokenize + df-join + per-doc window chain computes twice and
    // AQE plans the join from scan-stat guesses; persisted, it computes
    // once and the join starts from exact cached sizes. The round-11
    // driver gate caught a bimodal whole-suite mode on exactly this
    // query (52s vs 6s at the same HEAD) — a deterministic single
    // materialization shrinks both the work and the planner's freedom
    // to flip under memory pressure.
    // The join key and the verify arrays ride xxhash64 LONGS, not token
    // strings: the pair-generating hash relation and the per-candidate
    // intersection are the two allocation hotspots of this operator, and
    // the driver's round-12 gate artifact showed d74 GC-BOUND under
    // whole-suite memory pressure (76.8s of GC over three repeats, zero
    // spill) — 8-byte primitives cut both the persisted footprint and
    // the per-row garbage several-fold. The prefix ORDER stays on the
    // contractual (df, term-string) key, so the selected prefixes are
    // unchanged; a 64-bit collision can only ADD a candidate (verify
    // stays exact) or perturb one intersection count with probability
    // ~|pairs|·n̄/2^64 — the same trade simhash64 already pins.
    val pref = setSimPrefix(docs, num, den)
      .select(col("__id"), xxhash64(col("__term")).as("__h"),
        col("__n"), col("__idx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candRows = pref.as("a").join(pref.as("b"),
        col("a.__h") === col("b.__h") &&
          col("a.__id") < col("b.__id") &&
          // length filter: t*max(na,nb) <= min(na,nb) (both directions,
          // since id order says nothing about size order)
          col("a.__n") * num <= col("b.__n") * den &&
          col("b.__n") * num <= col("a.__n") * den &&
          // positional filter: the overlap cap this shared token allows
          // must still reach the threshold, in exact integers —
          // (den+num) * (1 + min(na-pa, nb-pb)) >= num * (na+nb)
          (least(col("a.__n") - col("a.__idx"),
            col("b.__n") - col("b.__idx")) + 1) * (den + num) >=
            (col("a.__n") + col("b.__n")) * num)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__n").as("na"), col("b.__n").as("nb"))
    // one aggregation both dedups (pair emitted once per shared prefix
    // token) and carries the sizes — na/nb are functions of the ids
    val cands = candRows.groupBy(col("id_a"), col("id_b"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"))
    // sorted ONCE per doc; the per-candidate verify is then a
    // zero-allocation codegen'd merge walk (SortedIntersectCount) —
    // size(array_intersect(...)) builds a hash set + output array per
    // PAIR, the dominant garbage at millions of candidates
    val docsH = docs.select(col("__id"),
      array_sort(transform(col("__terms"), t => xxhash64(t))).as("__th"))
    // the verify attaches ONE doc row per candidate SIDE: candidates
    // outnumber docs by the pair fan-out (r18 profile on the d87 graph:
    // 3.9M candidates vs 2k docs, and the un-hinted plan sort-merged —
    // two full sorts OF THE CANDIDATE FRAME). Broadcast the per-doc
    // token-array frame while its plan-stats bound fits (docs is
    // persisted, so the bound is the cache's REAL size — the d18/d29
    // guard pattern); a corpus too big to broadcast falls back to the
    // shuffle join, never a driver OOM.
    val hintDocs = docsH.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(docsBroadcastMaxBytes)
    def docSide(as1: String, as2: String): DataFrame = {
      val s = docsH.select(col("__id").as(as1), col("__th").as(as2))
      if (hintDocs) broadcast(s) else s
    }
    def interCount(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.SortedIntersectCount(
          org.apache.spark.sql.GraftColumnBridge.expression(a),
          org.apache.spark.sql.GraftColumnBridge.expression(b)))
    val out = cands
      .join(docSide("id_a", "__ta"), Seq("id_a"))
      .join(docSide("id_b", "__tb"), Seq("id_b"))
      .withColumn("inter", interCount(col("__ta"), col("__tb")))
      .where(col("inter") * (den + num) >= (col("na") + col("nb")) * num)
      .select(col("id_a"), col("id_b"), col("inter"), col("na"), col("nb"))
    materializeAndRelease(out, docs, pref)
  }

  /** Pre-flight COST GAUGE for [[setSimilarityJoin]] — run this BEFORE
    * the join at scale. The pair-generating equi-join emits one row per
    * shared prefix token, so its output is bounded by
    * Σ_t C(prefixdf(t), 2) over the prefix token frequencies — a number
    * the prefix derivation alone prices (one tokenize + df join +
    * per-doc window; NO pair is ever generated). One row:
    * (prefix_rows, max_prefix_df, candidates_bound).
    *
    * This is the d52 skew-profile discipline applied to the exact
    * set-sim pass: the join's cost is a pure function of the corpus's
    * prefix-df profile, and that profile is CHEAP to measure. A bound
    * in the billions (measured on the 544k adversarial ScaleBench
    * corpus: low-cardinality docs over a small vocabulary put
    * thousands-deep tokens inside prefixes, and the full-corpus
    * attempt died at >70 GB of shuffle spill) means the corpus needs
    * [[exactDedup]] + near-dup clustering first, a higher threshold,
    * or the capped LSH tier — decided from one cheap aggregate instead
    * of a dead 100 TB job. */
  def setSimilarityJoinCost(df: DataFrame, idCol: String, textCol: String,
                            thresholdNum: Int, thresholdDen: Int)
      : DataFrame = {
    require(thresholdNum >= 1 && thresholdDen >= thresholdNum,
      s"threshold $thresholdNum/$thresholdDen not in (0, 1]")
    val (num, den) = (thresholdNum.toLong, thresholdDen.toLong)
    val docs = setSimDocs(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = setSimPrefix(docs, num, den)
      .groupBy(col("__term")).agg(count(lit(1)).as("__pdf"))
      .agg(sum(col("__pdf")).as("prefix_rows"),
        max(col("__pdf")).as("max_prefix_df"),
        sum(((col("__pdf") * (col("__pdf") - 1)) / 2).cast("long"))
          .as("candidates_bound"))
    materializeAndRelease(out, docs)
  }

  /** EXACT substring-span dedup across documents (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * exact-substring discipline, token-granular): find every maximal
    * span of >= k consecutive tokens that appears VERBATIM in at least
    * `minDocs` distinct documents, and emit it as a per-document CUT
    * LIST — (id, span_start, span_end, span_len) in token positions —
    * the input a span-removal pass consumes. Completes the kit's
    * fingerprint tiers (winnowing d07/d10, containment d25, span
    * decontamination d27/d32): those DETECT overlap; this one emits
    * the exact character of it.
    *
    * Algorithm — sorted k-gram chains, no suffix array: a token
    * position is DUPLICATED iff its k-gram occurs in >= minDocs
    * distinct docs; the union of duplicated k-gram extents
    * [pos, pos+k-1] is exactly the duplicated text, and consecutive
    * duplicated starts with gap <= k union into one maximal span (gap
    * > k means the extents are disjoint). One aggregate over grams,
    * one semi-join back, one per-doc window — every step
    * shuffle-bounded by the gram key; nothing is pairwise in the
    * number of sharing documents (the classic failure mode: a
    * boilerplate header in 1M docs is ONE gram group here, never
    * 10^12 doc pairs).
    *
    * Scale note: the shuffle key is the k-token gram — by default the
    * gram STRING (exactly derivable, cross-engine gated — d89); with
    * `fingerprintGrams` a 128-BIT FINGERPRINT (xxhash64 of the token
    * slice twice, the second salted — independent seeds), accepting
    * the 2^-128 collision odds for a ~10x smaller shuffle payload —
    * the 100 TB tier (gated by d92: identical cut lists on the same
    * corpus, against d89's own string-tier oracle). Cut lists must not
    * cut text that never duplicated, so a 64-bit key (birthday-bound
    * collisions at 10^12 grams) is NOT acceptable here, unlike the
    * candidate-generation tiers where verification follows.
    *
    * Cache discipline: the gram frame feeds BOTH the duplicated-gram
    * aggregate and the semi-join probe, so an unpersisted plan pays
    * the corpus tokenize + gram explode twice (Spark does not reuse
    * the exchange across the two consumers — r16 finding). The
    * tokenized corpus (∼input-sized, far smaller than the exploded
    * grams) persists for the call, the small cut-list result
    * materializes eagerly, and the cache releases before return (the
    * [[materializeAndRelease]] contract). */
  def exactSpanCutLists(df: DataFrame, idCol: String, textCol: String,
                        k: Int, minDocs: Int = 2,
                        fingerprintGrams: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(minDocs >= 2,
      s"minDocs must be >= 2 (cross-document): $minDocs")
    // spread before the k-gram explode (~|tokens| gram rows per doc)
    // — see spreadForCompute's doc; no-op at real scan parallelism
    val toks = spreadForCompute(
        df.select(col(idCol).as("id"), col(textCol).as("__sftxt")))
      .select(col("id"), WhitespaceTokens.tokens(col("__sftxt")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    materializeAndRelease(
      exactSpanPlan(toks, k, minDocs, fingerprintGrams), toks)
  }

  /** [[exactSpanCutLists]]' plan over a pre-tokenized (id, t) frame —
    * split out so the plan shape stays auditable (the public operator
    * returns a materialized frame whose executed plan is a scan). */
  private[graft] def exactSpanPlan(toks: DataFrame, k: Int, minDocs: Int,
                                   fingerprintGrams: Boolean): DataFrame = {
    val grams = spanGrams(toks, k, spanGramKey(fingerprintGrams))
    val dup = grams.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("gram"))
    spansFromMarkedGrams(grams.join(dup, Seq("gram"), "left_semi"), k)
  }

  /** 128-bit key: two xxhash64 passes over the token slice, the second
    * salted by a leading literal (xxhash64 folds columns sequentially,
    * so a distinct first column is a distinct seed); string tier joins
    * the gram verbatim (exactly derivable, cross-engine gated). */
  private def spanGramKey(fingerprintGrams: Boolean): Column => Column =
    if (fingerprintGrams)
      s => struct(xxhash64(s).as("h1"),
        xxhash64(lit(0x9E3779B97F4A7C15L), s).as("h2"))
    else s => array_join(s, " ")

  /** Every k-gram start of a tokenized (id, t) frame: (id, pos, gram). */
  private def spanGrams(toks: DataFrame, k: Int,
                        gramKey: Column => Column): DataFrame =
    toks.where(size(col("t")) >= k)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("t")) - k),
        i => struct(i.as("pos"),
          gramKey(slice(col("t"), i + 1, lit(k))).as("gram"))))
        .as("pg"))
      .select(col("id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))

  /** Union marked k-gram extents [pos, pos+k-1] into maximal spans:
    * consecutive marked starts with gap <= k merge (gap > k means the
    * extents are disjoint). One per-doc window + one group. */
  private def spansFromMarkedGrams(marked: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    marked
      .withColumn("__gap", col("pos") - lag(col("pos"), 1).over(w))
      .withColumn("__run",
        sum(when(col("__gap").isNull || col("__gap") > k, 1)
          .otherwise(0)).over(w))
      .groupBy(col("id"), col("__run"))
      .agg(min(col("pos")).as("__s"), max(col("pos")).as("__e"))
      .select(col("id"),
        col("__s").cast("long").as("span_start"),
        (col("__e") + (k - 1)).cast("long").as("span_end"),
        (col("__e") + k - col("__s")).cast("long").as("span_len"))
  }

  /** EXACT contamination-span extraction — [[exactSpanCutLists]]'
    * machinery pointed at a HELD-OUT benchmark set (the d23/d32/d35
    * decontamination family at span granularity): a corpus token
    * position is contaminated iff its k-gram appears verbatim in ANY
    * benchmark document (cross-set only — corpus-internal duplication
    * is d89's job, not contamination), and contaminated extents union
    * into maximal per-corpus-doc cut lists ready for [[removeSpans]].
    * Until now the kit detected benchmark contamination at doc /
    * fingerprint granularity; this emits the exact extent of it, so
    * removal can keep the clean remainder of a touched document
    * instead of dropping the document.
    *
    * Scale shape: the benchmark gram set is derived once (distinct
    * keys, no positions) and is typically FAR smaller than the corpus
    * side — eval suites are thousands of documents against a corpus of
    * billions — so the left-semi probe broadcasts in practice (AQE
    * decides; nothing forces a shuffle join). The corpus side pays the
    * same single gram pass as d89, and nothing is ever pairwise in the
    * number of contaminated documents. `fingerprintGrams` is the same
    * 128-bit tier with the same cut-list-safety argument. */
  def contaminationSpanCutLists(corpus: DataFrame, idCol: String,
                                textCol: String, benchmark: DataFrame,
                                benchTextCol: String, k: Int,
                                fingerprintGrams: Boolean = false)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // spread before the k-gram explode (see spreadForCompute's doc)
    val toks = spreadForCompute(
        corpus.select(col(idCol).as("id"), col(textCol).as("__sftxt")))
      .select(col("id"), WhitespaceTokens.tokens(col("__sftxt")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = benchmark.select(lit(0L).as("id"),
      WhitespaceTokens.tokens(col(benchTextCol)).as("t"))
    materializeAndRelease(
      contaminationSpanPlan(toks, bench, k, fingerprintGrams), toks)
  }

  /** [[contaminationSpanCutLists]]' plan over pre-tokenized (id, t)
    * frames — split out so the plan shape stays auditable (the public
    * operator returns a materialized frame). */
  private[graft] def contaminationSpanPlan(toks: DataFrame,
                                           benchToks: DataFrame, k: Int,
                                           fingerprintGrams: Boolean)
      : DataFrame = {
    val key = spanGramKey(fingerprintGrams)
    val benchGrams = spanGrams(benchToks, k, key)
      .select(col("gram")).distinct()
    val marked = spanGrams(toks, k, key)
      .join(benchGrams, Seq("gram"), "left_semi")
    spansFromMarkedGrams(marked, k)
  }

  /** Apply [[exactSpanCutLists]] cut lists to a corpus: drop every
    * token whose position falls inside a cut span and re-join the
    * survivors single-spaced — the REMOVAL half of the Lee-et-al
    * exact-substring loop (detection emits positions; this consumes
    * them). Documents with no cuts pass through re-tokenized (the
    * whitespace normalization is the same one the detector saw, so
    * positions always refer to the same token stream).
    *
    * Scale shape: cuts aggregate to one small array per cut document
    * (spans per doc are few by construction — they merged to maximal),
    * ONE equi-join on the doc id, and a per-row positional filter via
    * native array HOFs — no explode of the corpus tokens, no window,
    * no second shuffle. */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
                  cuts: DataFrame,
                  cutIdCol: String = "id",
                  startCol: String = "span_start",
                  endCol: String = "span_end"): DataFrame = {
    val sp = cuts.groupBy(col(cutIdCol).as(idCol))
      .agg(collect_list(struct(col(startCol).as("s"),
        col(endCol).as("e"))).as("__sp"))
    val toks = WhitespaceTokens.tokens(col(textCol))
    df.join(sp, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          filter(toks, (t, i) => col("__sp").isNull ||
            !exists(col("__sp"),
              s => i.cast("long") >= s.getField("s") &&
                i.cast("long") <= s.getField("e"))),
          " ").as(textCol))
  }

}

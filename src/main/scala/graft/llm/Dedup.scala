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

  /** Keep one doc per exact key: min id wins (deterministic). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__key", exactKey(col(textCol)))
    val keep = keyed.groupBy(col("__key")).agg(min(col(idCol)).as(idCol))
    // Self-join back on (key, id) to recover full rows; broadcast-ineligible
    // at scale but the join is on a pruned 2-column projection.
    keyed.join(keep, Seq("__key", idCol), "left_semi").drop("__key")
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

  /** MinHash signature: for each of `numHashes` salted hash families, the
    * lexicographic minimum of md5(salt || shingle). Using the hex string
    * itself as the hash value keeps the whole construction portable (any
    * engine with md5 + min reproduces it exactly). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => md5(concat(lit(s"graft$i|"), s))))
    }: _*)

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`,
    * each band hashed to one bucket key. Docs sharing any band key are
    * candidate pairs. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", lit(b.toString),
        concat_ws("|", slice(signature, b * rowsPerBand + 1, rowsPerBand))))
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
    // Cache payload is ~(bands x 40B)/doc — tiny next to the text.
    val sig = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), shinglesFromTokens(col("__toks"), k).as("__sh"))
      .select(col("id"), minhashSignature(col("__sh"), numHashes).as("sig"))
      .select(col("id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Bucket-size cap: count per band key (a tiny aggregate over the
    // persisted (band, id) frame) and keep only rows in buckets <= cap.
    val pruned = capBuckets(sig, "band", maxBucketSize)
    // Only (band, id) travels through the self-join and the distinct —
    // signatures would multiply the shuffle by numHashes x 32 bytes per row
    // (callers re-join signatures by id if they need them).
    val a = pruned.select(col("band"), col("id").as("id1"))
    val b = pruned.select(col("band"), col("id").as("id2"))
    a.join(b, Seq("band")).where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Keep only rows whose `keyCol` bucket holds <= cap rows — the shared
    * adversarial guard of lshCandidatePairs and winnowingOverlapPairs
    * (a B-row bucket emits O(B^2) pair rows downstream). */
  private def capBuckets(df: DataFrame, keyCol: String,
                         maxBucketSize: Option[Int]): DataFrame =
    maxBucketSize match {
      case Some(cap) =>
        require(cap >= 2, s"maxBucketSize must be >= 2: $cap")
        val small = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
          .where(col("__n") <= cap).select(keyCol)
        df.join(small, Seq(keyCol))
      case None => df
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
                   numHashes: Int = 12, bands: Int = 4): DataFrame = {
    val cands = lshCandidatePairs(df, idCol, textCol, k, numHashes, bands)
    // persisted for the same reason as the band frame: joined twice (id1
    // and id2 sides) and Spark won't reuse the shingling subtree across
    // the two aliased branches
    val sh = df.select(col(idCol).as("__id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("__id"), shinglesFromTokens(col("__toks"), k).as("__raw"))
      .select(col("__id"), array_distinct(col("__raw")).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands
      .join(sh.withColumnRenamed("__id", "id1").withColumnRenamed("__sh", "sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("__id", "id2").withColumnRenamed("__sh", "sh2"), Seq("id2"))
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
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
    // one persist: the capped frame recomputes from this cache via a
    // cheap semi-join (caching both would hold ~2x the fp data)
    val f0 = df.select(col(idCol).as("id"), lower(col(textCol)).as("__t"))
      .select(col("id"), TextAnalysis.charGramHashes(col("__t"), k).as("__g"))
      .select(col("id"), TextAnalysis.winnowingMinima(col("__g"), w).as("fps"))
      .select(col("id"), explode(col("fps")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = capBuckets(f0, "fp", maxBucketSize)
    // Jaccard is over the SURVIVING fp sets (capped grams leave both the
    // numerator and the denominator — dropping ubiquitous grams from the
    // similarity, which sharpens it rather than skewing it)
    val sizes = f.groupBy(col("id")).agg(count(lit(1)).as("nf"))
    val shared = f.select(col("fp"), col("id").as("id1"))
      .join(f.select(col("fp"), col("id").as("id2")), Seq("fp"))
      .where(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("id").as("id1"), col("nf").as("nf1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("nf").as("nf2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (col("n_shared").cast("double") /
          (col("nf1") + col("nf2") - col("n_shared"))).as("sim"))
      .where(col("sim") >= minSim)
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
    import org.apache.spark.storage.StorageLevel
    // the checksum convergence test relies on numeric ordering: labels
    // decrease numerically, so a decreasing exact decimal sum == progress.
    // String ids would cast to null (and lexicographic least() wouldn't
    // match the sum's ordering anyway) — fail fast instead.
    Seq(idCol1, idCol2).foreach { c =>
      require(pairs.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"connectedComponents needs numeric ids; '$c' is ${pairs.schema(c).dataType.simpleString}" +
          " (map string keys to a numeric surrogate first)")
    }
    val edges = pairs.select(col(idCol1).as("a"), col(idCol2).as("b"))
      .union(pairs.select(col(idCol2).as("a"), col(idCol1).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint, not persist: each round references `labels` twice,
    // so the LOGICAL plan quadruples per round — by round 6 on a 9.5M-edge
    // graph the driver was re-optimizing a 200k-node tree per action
    // (executors idle, 100% driver CPU; measured 395s where execution is
    // ~25s). Caching fixes execution reuse but not plan growth;
    // localCheckpoint(eager) truncates the lineage to an O(1) LogicalRDD
    // per round — the standard iterative-algorithm hygiene (GraphX does
    // the same). On a long-lived cluster with executor churn, swap for
    // reliable `checkpoint()` against the checkpoint dir.
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // Convergence via checksum, not a per-round comparison join: labels
    // only ever DECREASE, so sum(label) strictly decreases until the
    // fixpoint — one cheap aggregate over the checkpointed frame replaces
    // a full join+filter+count per round. Decimal sum: exact and
    // overflow-free at any id range/corpus size.
    def checksum(df: DataFrame): BigDecimal = {
      val d = df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) BigDecimal(0) else BigDecimal(d) // null = empty graph
    }
    var prevSum = checksum(labels)
    var converged = labels.isEmpty // no pairs -> nothing to propagate
    var iters = 0
    while (!converged && iters < maxIterations) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("label").as("blab")), Seq("b"))
        .groupBy(col("a")).agg(min(col("blab")).as("nlab"))
        .select(col("a").as("id"), col("nlab"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlab"), col("label"))).as("label"))
        .localCheckpoint(true)
      val nextSum = checksum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iters += 1
    }
    // a partially-propagated labeling is silently WRONG (one component
    // reported as several "keepers") — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIterations rounds " +
        "(component diameter exceeds maxIterations — raise it)")
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Full near-dup DEDUP decision: LSH pairs over `threshold` -> connected
    * components -> (id, cluster, keep). */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, k: Int = 3,
                      numHashes: Int = 12, bands: Int = 4): DataFrame =
    connectedComponents(
      nearDupPairs(df, idCol, textCol, threshold, k, numHashes, bands))
      .withColumn("keep", col("id") === col("cluster"))

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
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: the concat-and-chunk step every LLM data
  * pipeline runs between curation and tokenization — shuffle the corpus
  * deterministically, lay documents end to end on a global token axis,
  * and cut that axis into fixed `budget`-token sequences (GPT-style
  * packing; see Brown et al., "Language Models are Few-Shot Learners",
  * §2.2 — documents are concatenated and chunked into fixed-length
  * contexts). The output maps every document to its position: which
  * sequence it starts in, at which offset, and how many sequences it
  * spans, so a downstream tokenizer can materialize sequence shards
  * independently per `seq` range.
  *
  * Determinism is the whole point: the order is a salted hash of the id
  * (the same `sampleKey` used by the sampling family), so the packing is
  * reproducible across runs, engines and partitioning — an epoch's
  * global shuffle without a `rand()` anywhere.
  *
  * Scale shape: the naive formulation is ONE global window (cumulative
  * sum over the whole corpus ordered by shuffle key) — a single-task
  * sort at 100TB. This implementation is the classic two-phase
  * distributed prefix sum, all declarative:
  *
  *   1. bucket by the first `prefixChars` hex chars of the shuffle key —
  *      a PREFIX of the sort key, so bucket order is sort order and
  *      buckets partition the axis contiguously;
  *   2. per-bucket token totals (a tiny O(16^prefixChars)-row aggregate)
  *      get exclusive prefix offsets via a window over that tiny frame
  *      (the plan's only unpartitioned window — 256 rows at the default,
  *      65k at prefixChars=4 for a 1000-executor corpus);
  *   3. the within-bucket exclusive cumulative sum runs under
  *      `Window.partitionBy(bucket)` — every bucket sorts only its own
  *      ~1/16^prefixChars slice, in parallel — and the bucket offset
  *      broadcast-joins back on the bucket id.
  *
  * The result is BIT-IDENTICAL to the global-window formulation (the
  * unit test pins it) at any partitioning.
  */
object Packing {

  /** Assign every row a position on the packed token axis.
    *
    * Output: `idCol`, `n_tokens` (long), `start_tok` (exclusive global
    * running total of tokens before this doc), `seq` (= start_tok div
    * budget — the sequence this doc starts in), `seq_off` (offset inside
    * that sequence), `spans` (how many sequences the doc touches; a doc
    * longer than `budget` straddles several). Zero-token docs occupy no
    * space but still get a position (spans = 1).
    *
    * `nTokens` is any non-negative long expression over the input row —
    * pass `TextAnalysis.tokenCount(col("text")).cast("long")` for
    * whitespace tokens, or a learned tokens-per-char estimate. */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
                    budget: Long, salt: String = "graft",
                    prefixChars: Int = 2): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars must be in [1,8]: $prefixChars")
    val reserved = Seq("__sk", "__b", "__bt", "__boff")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column; rename it before packSequences()"))
    val sk = Sampling.sampleKey(col(idCol), salt)
    // lowercase-hex lexicographic order == numeric order, so the bucket
    // (a key PREFIX) partitions the global sort order contiguously
    val base = df.select(col(idCol), nTokens.cast("long").as("n_tokens"),
      sk.as("__sk"), conv(substring(sk, 1, prefixChars), 16, 10)
        .cast("long").as("__b"))
      // ONE corpus scan: both consumers (the per-bucket totals and the
      // within-bucket window) need hashpartitioning(__b) — make that
      // requirement explicit here so the two subtrees share the literal
      // same exchange (ReuseExchange, plan-asserted) instead of each
      // re-scanning and re-tokenizing the corpus
      .repartition(col("__b"))
    // the totals aggregate references __sk and the id through semantic
    // no-ops (length(md5-hex) >= 0 and a cast-to-string comparison are
    // always true): without them column pruning strips both from THIS
    // branch's copy of the exchange subtree, the subtrees stop being
    // identical, and ReuseExchange falls apart into a second corpus
    // scan+tokenize (same trap, same fix as keywordScores — the plan
    // test pins it)
    val bucketOffsets = base.groupBy(col("__b"))
      .agg(sum(when(length(col("__sk")) >= 0 &&
          coalesce(col(idCol).cast("string"), lit("")) >= "",
        col("n_tokens"))).as("__bt"))
      .withColumn("__boff", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__boff"))
    val wb = Window.partitionBy(col("__b"))
      .orderBy(col("__sk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), Seq("__b"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(wb), lit(0L)) + col("__boff"))
      // integral `div`, not floor(double /): exact past 2^53 tokens
      .withColumn("seq", expr(s"start_tok div ${budget}L"))
      .withColumn("seq_off", col("start_tok") % budget)
      .withColumn("spans",
        expr(s"(start_tok + greatest(n_tokens - 1, 0L)) div ${budget}L")
          - col("seq") + 1)
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        col("seq"), col("seq_off"), col("spans"))
  }

  /** Deterministic training-shard assignment — the step that turns a
    * curated corpus into N reproducible shard files (the WebDataset /
    * TFRecord-shard layout every trainer streams): each doc gets a
    * `shard` in [0, nShards) and a dense 0-based `pos` inside that
    * shard, both pure functions of (salt, id), so a re-run on different
    * partitioning — or a different engine — produces byte-identical
    * shard contents in byte-identical order.
    *
    * Mechanism: `v` = the first 8 hex chars of the sampling hash
    * ([[Sampling.sampleKey]]) as an integer uniform in [0, 2^32);
    * `shard` = (v * nShards) div 2^32 — the exact integer form of
    * floor(v / 2^32 * nShards), no doubles anywhere. `pos` orders by
    * (full hash, id) within the shard.
    *
    * Scale shape: the shard id is MAP-SIDE (a codegen'd expression in
    * the scan stage); the only exchange is hashpartitioning(shard) for
    * the within-shard row_number, and every shard sorts only its own
    * 1/nShards slice in parallel — uniform hash means no hot shard, so
    * no salting needed. To materialize, `repartition(col("shard"))` +
    * `sortWithinPartitions("__sk")` and write one file per shard (the
    * Sinks.sortedBulkLoad pattern). */
  def shardAssign(df: DataFrame, idCol: String, nTokens: Column,
                  nShards: Int, salt: String = "graft"): DataFrame = {
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards must be in [1, 2^20]: $nShards")
    val reserved = Seq("__sk", "__v")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column; rename it before shardAssign()"))
    val base = df.select(col(idCol), nTokens.cast("long").as("n_tokens"),
        Sampling.sampleKey(col(idCol), salt).as("__sk"))
      // sampleKey IS the first 8 hex chars — one conv covers it all
      .withColumn("__v", conv(col("__sk"), 16, 10).cast("long"))
      .withColumn("shard",
        expr(s"CAST((__v * $nShards) div 4294967296 AS INT)"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__sk").asc, col(idCol).asc)
    base.withColumn("pos", row_number().over(w) - 1)
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"))
  }

  /** Mix-preserving shard assignment: every shard receives an EXACTLY
    * equal (±1) slice of every stratum — the property a trainer needs
    * when it streams shards sequentially (a shard must be a microcosm
    * of the corpus mix, or the early training steps see a skewed
    * distribution). [[shardAssign]]'s uniform hash gives this only in
    * expectation; here the stratum-wide position in deterministic
    * (sampleKey, id) order is taken mod nShards — round-robin within
    * stratum, so counts per (stratum, shard) differ by at most 1 BY
    * CONSTRUCTION, not by luck.
    *
    * Scale shape: the naive form is one window over each full stratum
    * (a single-task sort of a mega-stratum at 100 TB). This is the
    * [[packSequences]] banded two-phase prefix count instead: band =
    * first `prefixChars` hex chars of the hash key (a PREFIX of the
    * sort key, so band order is sort order), per-(stratum, band)
    * counts take a window over the tiny O(|strata|·16^prefixChars)
    * frame, and each doc's stratum position is its within-band
    * row_number plus the band offset — the only per-doc window sees
    * one (stratum, band) slice (uniform hash ⇒ bounded), and the
    * offset frame joins back by broadcast. Bit-identical to the naive
    * single-window form (unit-pinned). Output: (id, strata, pos_s,
    * shard). */
  def shardAssignBalanced(df: DataFrame, idCol: String, strataCol: String,
                          nShards: Int, salt: String = "graft",
                          prefixChars: Int = 2): DataFrame = {
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards must be in [1, 2^20]: $nShards")
    require(prefixChars >= 1 && prefixChars <= 4,
      s"prefixChars must be in [1, 4]: $prefixChars")
    val reserved = Seq("__sk", "__band", "__bn", "__off")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column; rename it before shardAssignBalanced()"))
    val base = df.select(col(idCol).as("id"),
        col(strataCol).cast("string").as("strata"),
        Sampling.sampleKey(col(idCol), salt).as("__sk"))
      .withColumn("__band", substring(col("__sk"), 1, prefixChars))
    val offsets = base.groupBy(col("strata"), col("__band"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off",
        sum(col("__bn")).over(Window.partitionBy(col("strata"))
          .orderBy(col("__band"))) - col("__bn"))
      .drop("__bn")
    val wIn = Window.partitionBy(col("strata"), col("__band"))
      .orderBy(col("__sk").asc, col("id").asc)
    base.withColumn("__rn", row_number().over(wIn) - 1)
      .join(broadcast(offsets), Seq("strata", "__band"))
      .withColumn("pos_s", col("__rn") + col("__off"))
      .withColumn("shard", (col("pos_s") % nShards).cast("int"))
      .select(col("id"), col("strata"), col("pos_s"), col("shard"))
  }

  /** Materialize a [[shardAssignBalanced]] result with MIX-LOCAL
    * in-shard order: within each shard dir, rows sort by (turn =
    * pos_s div nShards, strata) — one round-robin "turn" holds at most
    * one doc of each stratum, so ANY contiguous read window of width
    * k·|strata| contains each stratum's share ±1. A trainer that
    * streams a shard front-to-back (or restarts mid-shard) therefore
    * sees the corpus mix at window granularity, not just at
    * whole-shard granularity — the property that makes mid-epoch
    * checkpoint resume unbiased. Same one-file-per-shard write shape
    * as [[writeShardLayout]]. */
  def writeBalancedShardLayout(assigned: DataFrame, nShards: Int,
                               path: String): Unit = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    // shard leads the sort so the partitioned write's required ordering
    // is already satisfied and V1Writes inserts no re-sort of its own
    // (a writer-inserted sort keys only on the partition column and
    // would clobber the (turn, strata) order)
    assigned.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), expr(s"pos_s div $nShards"),
        col("strata"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Per-shard balance report over a [[shardAssign]] result: (shard,
    * n_docs, n_tokens) — the sanity check a shard-writing job runs
    * before committing (a skewed report means the hash column was fed
    * a non-unique id). One tiny aggregate, map-side combined. */
  def shardStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Epoch repetition schedule — the data-constrained-scaling repeat
    * plan (Muennighoff et al. 2023: under a token budget, repeating
    * good data up to ~4 epochs beats adding bad data): each doc emits
    * one row per epoch it participates in, with a fresh deterministic
    * ORDER KEY per (epoch, doc) — md5(salt|epoch|id) — so every epoch
    * replays a DIFFERENT shuffle order without a rand() anywhere (the
    * same-order-every-epoch trap), and downstream [[shardAssign]] /
    * [[packSequences]] compose per epoch off the key. `epochs` is any
    * non-negative int expression over the row (a quality-tier CASE, a
    * per-source policy); rows with 0 epochs drop out of training by
    * construction. Pure map-side explode. Output: (id, epoch,
    * order_key). */
  def repeatSchedule(df: DataFrame, idCol: String, epochs: Column,
                     salt: String = "graft"): DataFrame =
    df.select(col(idCol), epochs.cast("int").as("__ne"))
      .where(col("__ne") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), col("__ne") - 1)).as("epoch"))
      .withColumn("order_key",
        substring(md5(concat_ws("|", lit(salt),
          col("epoch").cast("string"), col(idCol).cast("string"))), 1, 8))

  /** Materialize a [[shardAssign]] result as the on-disk shard layout a
    * trainer streams: one directory per shard, rows inside each file in
    * `pos` order (repartition by shard + sortWithinPartitions — the
    * Sinks.sortedBulkLoad shape), so a reader consumes shard k in the
    * deterministic order without sorting. One file per shard at this
    * scale; at 100 TB salt the repartition key and cut `pos` ranges per
    * salt for bounded file sizes (the writeIvfLayout note). */
  def writeShardLayout(assigned: DataFrame, path: String): Unit =
    assigned.repartition(col("shard"))
      .sortWithinPartitions(col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** DuckDB twin of [[shardAssign]], generated with the same literals
    * (the Pii.scrubOracleSql pattern). DuckDB has no base-16 `conv`, so
    * the hex value is assembled digit-by-digit with strpos over the hex
    * alphabet — integer arithmetic end to end, bit-identical to the
    * Spark side. `corpusSql` must yield (id, n_tokens). */
  def shardAssignOracleSql(corpusSql: String, idCol: String,
                           nShards: Int, salt: String): String = {
    val hexVal = (1 to 8).map { i =>
      val scale = 1L << (4 * (8 - i))
      s"(strpos('0123456789abcdef', substr(sk, $i, 1)) - 1) * CAST($scale AS BIGINT)"
    }.mkString(" + ")
    s"""WITH hashed AS (SELECT $idCol, n_tokens,
       |    substr(md5('$salt' || '|' || CAST($idCol AS VARCHAR)), 1, 8)
       |      AS sk
       |  FROM ($corpusSql)),
       |sharded AS (SELECT $idCol, n_tokens, sk,
       |    CAST(($hexVal) * $nShards // 4294967296 AS INTEGER) AS shard
       |  FROM hashed)
       |SELECT $idCol, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY sk, $idCol)
       |    - 1 AS INTEGER) AS pos,
       |  n_tokens
       |FROM sharded""".stripMargin
  }

  /** Token-budget data selection — "take the best documents until the
    * budget is spent", the selection rule of budgeted pretraining runs
    * (rank by a quality signal, cut at N tokens): every doc gets its
    * exclusive running token total `cum_before` in (score desc, id asc)
    * order and `selected` = whether the WHOLE doc fits inside `budget`.
    * All cut arithmetic is integer, so the decision is engine-exact;
    * `score` must be a NUMERIC expression (band edges come from
    * approxQuantile, which only accepts numeric columns — enforced
    * up front instead of throwing mid-job; an integer signal keeps the
    * ordering itself engine-exact too — the d51 oracle uses one).
    * Null-score rows are EXCLUDED from the output: a null can neither
    * be banded (approxQuantile ignores it) nor deterministically ranked
    * against real scores, so "unscored" explicitly means "not a
    * selection candidate" — pre-coalesce a default if they should
    * compete.
    *
    * Scale shape: the global running sum is the [[packSequences]]
    * two-phase prefix sum, re-keyed by SCORE instead of shuffle hash:
    * score bands come from distributed approximate quantiles of the
    * score column (driver holds only `bands` doubles, frozen as an
    * array literal; band = #edges above the score, a map-side HOF).
    * Bands partition the (score desc, id) order contiguously — equal
    * scores share a band by construction — so per-band totals (a tiny
    * aggregate) take exclusive offsets over a `bands`-row window, the
    * within-band cumsum runs under Window.partitionBy(band), and the
    * two consumers share ONE corpus exchange (the keywordScores
    * ReuseExchange contract). Band EDGES need not be reproducible
    * across runs for the OUTPUT to be: any contiguous banding yields
    * the same global cumsum — only band ids shift, and they are not
    * in the output.
    *
    * Output: (`idCol`, score, n_tokens, cum_before, selected). */
  def budgetSelect(df: DataFrame, idCol: String, nTokens: Column,
                   score: Column, budget: Long, bands: Int = 64,
                   quantileRelErr: Double = 0.01): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(bands >= 1 && bands <= 4096, s"bands must be in [1, 4096]: $bands")
    val reserved = Seq("__band", "__bt", "__boff", "__score")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column; rename it before budgetSelect()"))
    val scored1 = df.select(col(idCol), nTokens.cast("long").as("n_tokens"),
      score.as("score"))
    scored1.schema("score").dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
      case other => throw new IllegalArgumentException(
        s"budgetSelect score must be numeric (approxQuantile band edges), " +
          s"got ${other.simpleString} — cast or rank-encode it first")
    }
    // null scores are not selection candidates (see scaladoc)
    val scored0 = scored1.where(col("score").isNotNull)
    val edges: Array[Double] =
      if (bands == 1) Array.empty
      else scored0.stat.approxQuantile("score",
        (1 until bands).map(_.toDouble / bands).toArray, quantileRelErr)
    // band = how many edges sit ABOVE this score — 0 is the best band,
    // and equal scores always land in the same band (a pure function of
    // score), so bands slice the (score desc, id) order contiguously
    val edgeArr = array(edges.map(e => lit(e)): _*)
    val band =
      if (edges.isEmpty) lit(0)
      else size(filter(edgeArr, e => e > col("score").cast("double")))
    val base = scored0.withColumn("__band", band)
      .repartition(col("__band"))
    // semantic no-op references keep this branch's exchange subtree
    // identical to the window's (the packSequences ReuseExchange note)
    val bandTotals = base.groupBy(col("__band"))
      .agg(sum(when(col("n_tokens") >= 0L &&
          coalesce(col(idCol).cast("string"), lit("")) >= "" &&
          coalesce(col("score").cast("string"), lit("")) >= "",
        col("n_tokens"))).as("__bt"))
      .withColumn("__boff", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__band"), col("__boff"))
    val w = Window.partitionBy(col("__band"))
      .orderBy(col("score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bandTotals), Seq("__band"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("__boff"))
      .withColumn("selected", col("cum_before") + col("n_tokens") <= budget)
      .select(col(idCol), col("score"), col("n_tokens"), col("cum_before"),
        col("selected"))
  }

  /** The one-global-window reference twin of [[budgetSelect]] — the
    * semantic spec for the parity test, never for production. */
  private[graft] def budgetSelectGlobal(df: DataFrame, idCol: String,
      nTokens: Column, score: Column, budget: Long): DataFrame = {
    val w = Window.orderBy(col("score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), nTokens.cast("long").as("n_tokens"),
        score.as("score"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("selected", col("cum_before") + col("n_tokens") <= budget)
      .select(col(idCol), col("score"), col("n_tokens"), col("cum_before"),
        col("selected"))
  }

  /** Length-bucketed batch assignment — the dynamic-batching step an
    * inference/eval pipeline runs so a batch's padded cost tracks its
    * real token mass: pad-to-longest wastes `Σ(max_len − len)` per
    * batch, so batching SIMILAR lengths together (band by length, fill
    * fixed-size batches longest-first within the band) is the standard
    * mitigation. Every assignment is a pure function of (salt, id,
    * n_tokens): `bucket` = n_tokens div `bandWidth`; within a bucket,
    * docs order by (n_tokens desc, id) and fill batches of `batchSize`
    * — reproducible across runs, engines and partitioning, no rand().
    *
    * Scale shape: bucket and shard ids are MAP-SIDE codegen'd
    * expressions in the scan stage; the one exchange is
    * hashpartitioning(bucket, shard) for the within-bucket row_number.
    * A popular length band (real corpora concentrate mass in a few
    * bands) would make that window's partition a straggler, so
    * `saltShards` > 1 splits each band into deterministic sub-shards
    * via the [[shardAssign]] hash — batch identity becomes (bucket,
    * shard, batch_idx) and each shard sorts only its own slice (the
    * salted-sessionize trade: more, smaller batches at the shard
    * boundaries in exchange for no hot partition). The downstream
    * [[batchStats]] aggregate needs no second exchange — clustering by
    * (bucket, shard) already satisfies the (bucket, shard, batch_idx)
    * grouping.
    *
    * Output: (`idCol`, n_tokens, bucket, shard, batch_idx). */
  def lengthBucketBatches(df: DataFrame, idCol: String, nTokens: Column,
                          batchSize: Int, bandWidth: Long,
                          saltShards: Int = 1,
                          salt: String = "graft"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    require(bandWidth >= 1, s"bandWidth must be >= 1: $bandWidth")
    require(saltShards >= 1 && saltShards <= (1 << 20),
      s"saltShards must be in [1, 2^20]: $saltShards")
    val reserved = Seq("__sk", "__v", "__rn")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column; rename it before lengthBucketBatches()"))
    val base = df.select(col(idCol), nTokens.cast("long").as("n_tokens"),
        Sampling.sampleKey(col(idCol), salt).as("__sk"))
      .withColumn("bucket", expr(s"n_tokens div ${bandWidth}L"))
      .withColumn("shard",
        if (saltShards == 1) lit(0)
        else expr(s"CAST((CAST(conv(__sk, 16, 10) AS BIGINT) * $saltShards)" +
          " div 4294967296 AS INT)"))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("n_tokens").desc, col(idCol).asc)
    base.withColumn("__rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"CAST((__rn - 1) div $batchSize AS INT)"))
      .select(col(idCol), col("n_tokens"), col("bucket"), col("shard"),
        col("batch_idx"))
  }

  /** Per-batch padding report over a [[lengthBucketBatches]] result:
    * pad-to-longest cost per batch — `pad_waste` = n_docs·max_tokens −
    * sum_tokens, all integer, the number every batching dashboard
    * tracks. Rides the assignment's (bucket, shard) clustering — no
    * extra exchange. */
  def batchStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("bucket"), col("shard"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))

  /** DuckDB twin of [[lengthBucketBatches]] + [[batchStats]], generated
    * with the same literals ([[shardAssignOracleSql]]'s pattern,
    * including its digit-assembled base-16 hash). `corpusSql` must
    * yield (id, n_tokens). */
  def lengthBucketOracleSql(corpusSql: String, idCol: String,
                            batchSize: Int, bandWidth: Long,
                            saltShards: Int, salt: String): String = {
    val hexVal = (1 to 8).map { i =>
      val scale = 1L << (4 * (8 - i))
      s"(strpos('0123456789abcdef', substr(sk, $i, 1)) - 1) * CAST($scale AS BIGINT)"
    }.mkString(" + ")
    val shardSql =
      if (saltShards == 1) "0"
      else s"CAST(($hexVal) * $saltShards // 4294967296 AS INTEGER)"
    s"""WITH hashed AS (SELECT $idCol, n_tokens,
       |    substr(md5('$salt' || '|' || CAST($idCol AS VARCHAR)), 1, 8)
       |      AS sk
       |  FROM ($corpusSql)),
       |assigned AS (SELECT $idCol, n_tokens,
       |    n_tokens // $bandWidth AS bucket,
       |    $shardSql AS shard
       |  FROM hashed),
       |batched AS (SELECT *,
       |    CAST((row_number() OVER (PARTITION BY bucket, shard
       |      ORDER BY n_tokens DESC, $idCol ASC) - 1) // $batchSize
       |      AS INTEGER) AS batch_idx
       |  FROM assigned)
       |SELECT bucket, shard, batch_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
       |    AS pad_waste
       |FROM batched GROUP BY 1, 2, 3""".stripMargin
  }

  /** The one-global-window reference formulation — O(corpus) through a
    * single task's sort; kept as the semantic spec for the parity test,
    * never for production. */
  private[graft] def packSequencesGlobal(df: DataFrame, idCol: String,
      nTokens: Column, budget: Long, salt: String = "graft"): DataFrame = {
    val sk = Sampling.sampleKey(col(idCol), salt)
    val w = Window.orderBy(col("__sk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), nTokens.cast("long").as("n_tokens"), sk.as("__sk"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq", expr(s"start_tok div ${budget}L"))
      .withColumn("seq_off", col("start_tok") % budget)
      .withColumn("spans",
        expr(s"(start_tok + greatest(n_tokens - 1, 0L)) div ${budget}L")
          - col("seq") + 1)
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        col("seq"), col("seq_off"), col("spans"))
  }
}

package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus growth — the append half of the corpus lifecycle
  * ([[Takedown]] is the shrink half): a new document batch arrives and
  * every derived versioned artifact re-lands as a NEW [[LayoutStore]]
  * snapshot that INCLUDES the batch, without re-reading, re-tokenizing
  * or re-embedding a byte of the existing corpus. At 100 TB the
  * difference is the whole game: a from-scratch index rebuild pays the
  * corpus-width tokenize/embed every refresh, while the append pays
  * (a) the batch's own feature extraction and (b) one filtered rewrite
  * of the index rows — the same cost-∝-index discipline every
  * [[Takedown]] propagator holds, applied in the growth direction.
  *
  * Rebuild-equality contract (what the m43/m44 oracles gate): after an
  * append, a probe of the new snapshot returns results hash-identical
  * to the same probe of a from-scratch build on the unioned corpus —
  * derived statistics (BM25 df/N/Σdl) are merged in CLOSED FORM from
  * the old snapshot plus batch-local aggregates, and surviving old rows
  * are inherited by manifest reference, untouched.
  *
  * Id discipline: appended ids must be DISJOINT from the snapshot's ids
  * — that disjointness is exactly what makes the df/N/Σdl merge
  * closed-form (a re-submitted id would need the old rows' retraction
  * first, i.e. a [[Takedown.propagateBm25Snapshot]] then an append, or
  * a rebuild). Both appenders fail fast on collision rather than
  * silently double-counting.
  */
object Ingest {

  private def maybeBroadcast(df: DataFrame, maxBytes: Long): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes
        <= BigInt(maxBytes)) broadcast(df)
    else df

  /** Append a document batch to a [[TextAnalysis.writeBm25Snapshot]]
    * store in closed form: the batch tokenizes ONCE; existing postings
    * take a map-side `df += batch-term increment` (the batch's per-term
    * distinct-doc counts, broadcast under a plan-stats guard — the
    * [[Takedown.propagateBm25Snapshot]] `dec` pattern in reverse);
    * batch postings take `df = old df + increment` where the old df for
    * batch terms comes off ONE pruned, partially-aggregated pass over
    * the postings (broadcast semi-join on the batch vocabulary — only
    * batch-term rows reach the aggregate); stats merge by addition
    * (N += batch docs, Σdl += batch token mass, term_buckets copies
    * through so the probe's fail-fast stamp survives). No old text is
    * ever touched, and the postings rewrite prunes to the BATCH
    * VOCABULARY'S term buckets (a term's postings live in one tbucket,
    * so every df bump and batch row is confined to those directories);
    * each untouched `tbucket=` directory is INHERITED by manifest
    * reference ([[LayoutStore.writeSnapshotManifested]] — zero bytes
    * move for it) — version cost ∝ touched
    * buckets + batch, never ∝ index, with rewritten rows landing
    * re-clustered by tbucket exactly as [[TextAnalysis.writeBm25Layout]]
    * lands them. (A broad-vocabulary batch touches most buckets —
    * common terms hash everywhere — so the inheritance win regime is
    * narrow-vocabulary batches against a high-`termBuckets` index; the
    * bench records the touched fraction.) Returns the new version. */
  def appendBm25Snapshot(spark: SparkSession, path: String,
                         newDocs: DataFrame,
                         docIdCol: String = "doc_id",
                         textCol: String = "text",
                         batchBroadcastMaxBytes: Long = 64L << 20,
                         version: Option[Long] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcVersion = version.getOrElse(LayoutStore.versions(conf, path).last)
    val postings = LayoutStore.readSnapshotTable(spark, path, "postings",
      Some(srcVersion))
    val st = LayoutStore.readSnapshotTable(spark, path, "stats",
      Some(srcVersion)).head()
    val termBuckets = st.getAs[Int]("term_buckets")

    // NOT spread: this is the per-batch append path (small frames,
    // possibly once per micro-batch) — the r17 A/B showed the extra
    // planning + exchange per call costs more than the parallelism
    // gains (m43 6.9→7.8s with a spread here); the corpus-shaped
    // builder (writeBm25Layout) is where the spread pays
    val newToks = newDocs.select(col(docIdCol).as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchIds = maybeBroadcast(
      newToks.select(col("doc_id")).distinct(), batchBroadcastMaxBytes)
    val collisions = postings.join(batchIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id")).limit(1).count()
    if (collisions != 0L) newToks.unpersist(blocking = true)
    require(collisions == 0L,
      "appendBm25Snapshot: batch contains doc ids already present in the " +
        "snapshot — retract them first (propagateBm25Snapshot) or rebuild")

    // batch-local postings and per-term doc-count increments (the df
    // delta disjointness makes exact)
    val btf = newToks
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inc = maybeBroadcast(
      btf.groupBy(col("term")).agg(count(lit(1)).as("__add")),
      batchBroadcastMaxBytes)

    // touched term buckets: a term's postings all live in ONE tbucket
    // (pure hash of the term), so every df bump and every batch row
    // lands in the buckets of the batch's own vocabulary — every other
    // bucket directory is byte-identical in the new version and is
    // inherited by manifest reference below. The rewrite scan prunes to touched
    // directories at file-listing time (partition filter), so the
    // version cost is ∝ touched buckets, never ∝ index.
    val touched = inc.select(TextAnalysis.bm25TermBucket(col("term"),
        termBuckets).as("__tb")).distinct().collect().map(_.getInt(0))
    val touchedPostings =
      postings.where(col("tbucket").isin(touched.toSeq: _*))

    // old df for exactly the batch's terms: pruned map-side semi-join,
    // partial agg — batch-vocabulary-sized result, never |vocabulary|
    val oldDfBatchTerms = maybeBroadcast(
      touchedPostings.join(inc.select(col("term")), Seq("term"), "left_semi")
        .groupBy(col("term")).agg(max(col("df")).as("__olddf")),
      batchBroadcastMaxBytes)

    val updatedOld = touchedPostings.join(inc, Seq("term"), "left")
      .withColumn("df", col("df") + coalesce(col("__add"), lit(0L)))
      .drop("__add")
    val batchRows = btf.join(inc, Seq("term"))
      .join(oldDfBatchTerms, Seq("term"), "left")
      .withColumn("df", coalesce(col("__olddf"), lit(0L)) + col("__add"))
      .withColumn("tbucket",
        TextAnalysis.bm25TermBucket(col("term"), termBuckets))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("df"), col("tbucket"))

    val batchStats = newToks.agg(count(lit(1)).as("n"),
      coalesce(sum(size(col("__t")).cast("long")), lit(0L)).as("tot")).head()
    val cols = updatedOld.columns.map(col).toSeq
    val out = LayoutStore.writeSnapshotManifested(conf, path) { (tmp, _) =>
      // an empty-vocabulary batch (every doc tokenless) touches NO
      // bucket: writing the empty frame would land a hollow postings
      // dir (markers only) instead of a table — skip the write and
      // carry every postings entry; stats still merge below (N grows
      // by the tokenless docs, Σdl by zero)
      if (touched.nonEmpty)
        updatedOld.unionByName(batchRows.select(cols: _*))
          .repartition(col("tbucket"))
          .write.mode("overwrite").partitionBy("tbucket")
          .parquet(s"$tmp/postings")
      spark.range(1)
        .select(lit(st.getAs[Long]("n") + batchStats.getLong(0)).as("n"),
          lit(st.getAs[Long]("tot") + batchStats.getLong(1)).as("tot"),
          lit(termBuckets).as("term_buckets"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
      // untouched tbucket dirs are byte-identical in the new snapshot:
      // inherit them by manifest reference instead of copying
      val touchedDirs = touched.map(v => s"postings/tbucket=$v").toSet
      LayoutStore.effectiveEntries(conf, path, srcVersion)
        .filter { case (k, _) =>
          k.startsWith("postings/") && !touchedDirs.contains(k) }
    }
    btf.unpersist(blocking = true)
    newToks.unpersist(blocking = true)
    out
  }

  /** Generic row append into a partition-column layout snapshot: union
    * PRE-ASSIGNED batch rows with the pinned snapshot's rows and
    * re-land re-clustered by `partitionCol` as a new version. This is
    * the growth twin of [[Takedown.propagateLayoutSnapshot]]'s filtered
    * walk, for any layout whose partition key is a pure function of the
    * row (IVF cells from frozen centroids, SRP buckets from
    * (plane, dim)-derived weights, BM25 term buckets): old rows copy
    * through with their persisted key untouched — nothing is
    * recomputed for a single existing row — and batch rows land in
    * exactly the directory a from-scratch build would put them in.
    * Fails fast if the batch reuses an existing id. Returns the new
    * version.
    *
    * Version cost is ∝ TOUCHED partitions, not ∝ table: only the
    * `col=value` directories the batch lands in are rewritten through
    * Spark (partition-pruned scan of exactly those old rows, union with
    * the batch); every untouched directory is INHERITED by manifest
    * reference ([[LayoutStore.writeSnapshotManifested]] — byte-identical
    * by construction, no decode, no shuffle, no copy). A daily batch
    * against a 1000-partition layout writes one directory and
    * references 999 — at a 100k-partition 100 TB layout the version
    * cost stays ∝ batch in FILES as well as bytes (the round-11
    * copy-through walk was ∝ total partitions even when bytes were ∝
    * batch; [[LayoutStore.compactSnapshot]] is the physical
    * re-materialization path). The fast path requires every
    * partition value to be escaping-free
    * ([[LayoutStore.plainPartitionValue]]); any exotic value falls back
    * to the full union-rewrite, so correctness never depends on the
    * directory-name comparison. */
  def appendRowsSnapshot(spark: SparkSession, path: String,
                         newRows: DataFrame, partitionCol: String,
                         idCol: String,
                         batchBroadcastMaxBytes: Long = 64L << 20,
                         version: Option[Long] = None,
                         markers: Map[String, String] = Map.empty): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcVersion = version.getOrElse(LayoutStore.versions(conf, path).last)
    // inference pinned off across read AND re-land, like the compact /
    // propagate walks: a string-valued partition key (strata=01) must
    // not come back as int 1 and re-land under a renamed directory
    LayoutStore.withPartitionInferenceOff(spark) {
      val old = LayoutStore.readSnapshotTable(spark, path, "",
        Some(srcVersion))
      val batchIds = maybeBroadcast(
        newRows.select(col(idCol)).distinct(), batchBroadcastMaxBytes)
      val collisions = old.join(batchIds, Seq(idCol), "left_semi")
        .select(col(idCol)).limit(1).count()
      require(collisions == 0L,
        "appendRowsSnapshot: batch contains ids already present in the " +
          "snapshot — retract them first (propagateLayoutSnapshot) or rebuild")
      val cols = old.columns.map(col).toSeq
      // touched partitions = the batch's distinct partition values
      // (bounded by the layout's partition count, driver-small); dir
      // suffixes must all be plain for name-vs-value comparison to be
      // sound, else full rewrite
      val touched = newRows.select(col(partitionCol).cast("string"))
        .distinct().collect().map(_.getString(0))
      val prevEntries = LayoutStore.effectiveEntries(conf, path, srcVersion)
      val dirNames = prevEntries.keys
        .filter(_.startsWith(s"$partitionCol=")).toSeq
      val fast = dirNames.nonEmpty &&
        touched.forall(LayoutStore.plainPartitionValue) &&
        dirNames.forall(n =>
          LayoutStore.plainPartitionValue(n.split("=", 2)(1)))
      LayoutStore.writeSnapshotManifested(conf, path) { (tmp, _) =>
        val carried: Map[String, Long] = if (fast) {
          old.where(col(partitionCol).isin(touched.toSeq: _*))
            .unionByName(newRows.select(cols: _*))
            .repartition(col(partitionCol))
            .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
          // untouched directories are INHERITED by manifest reference —
          // zero bytes move for them; physical re-materialization is
          // compactSnapshot's job
          val touchedDirs = touched.map(v => s"$partitionCol=$v").toSet
          prevEntries.filterNot { case (k, _) => touchedDirs.contains(k) }
        } else {
          old.unionByName(newRows.select(cols: _*))
            .repartition(col(partitionCol))
            .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
          Map.empty
        }
        // after the data write — parquet overwrite clears the tmp dir
        markers.foreach { case (n, v) =>
          LayoutStore.writeTextMarker(conf, tmp, n, v) }
        carried
      }
    }
  }

  /** Append a vector batch to an IVF layout held in a [[LayoutStore]]
    * ([[Similarity.writeIvfLayout]] per snapshot): the batch assigns
    * cells MAP-SIDE against the same frozen centroid literals the
    * layout was built with (cell assignment is a pure function of
    * (vector, centroids)), then [[appendRowsSnapshot]] lands the
    * union. Returns the new version. */
  def appendIvfSnapshot(spark: SparkSession, path: String,
                        newVecs: DataFrame,
                        centroids: Array[Array[Double]],
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        batchBroadcastMaxBytes: Long = 64L << 20,
                        version: Option[Long] = None): Long =
    appendRowsSnapshot(spark, path,
      Similarity.assignCells(newVecs, centroids, vecCol), "cell", idCol,
      batchBroadcastMaxBytes, version)

  /** Append a vector batch to a TRAINED-int8 IVF layout
    * ([[Similarity.writeIvfInt8TrainedLayout]]): the codebook comes
    * FROM THE SNAPSHOT — frozen at build time, re-stamped on the new
    * version — so there are no caller-supplied literals to get wrong
    * (the m44 invariant, enforced by construction). The batch
    * quantizes and assigns cells map-side against the frozen integer
    * centroids, then [[appendRowsSnapshot]] lands only the touched
    * cell directories. Returns the new version. */
  def appendIvfInt8TrainedSnapshot(spark: SparkSession, path: String,
      newVecs: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      batchBroadcastMaxBytes: Long = 64L << 20,
      version: Option[Long] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cents = Similarity.readIvfInt8Codebook(conf, path, version)
    val batch = Similarity.assignKmeansCellsInt8(
      Similarity.quantizeForStorage(newVecs, idCol, vecCol), cents)
      .withColumnRenamed("__cell", "cell")
    appendRowsSnapshot(spark, path, batch, "cell", idCol,
      batchBroadcastMaxBytes, version,
      markers = Map(Similarity.CodebookMarker ->
        Similarity.codebookJson(cents)))
  }

  /** Append a vector batch to an SRP layout
    * ([[Similarity.writeSrpLayout]] per snapshot): buckets derive
    * purely from (plane, dim) weights, so the batch buckets map-side
    * and [[appendRowsSnapshot]] lands the union. Returns the new
    * version. */
  def appendSrpSnapshot(spark: SparkSession, path: String,
                        newVecs: DataFrame, dim: Int, planes: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        batchBroadcastMaxBytes: Long = 64L << 20,
                        version: Option[Long] = None): Long =
    appendRowsSnapshot(spark, path,
      newVecs.withColumn("bucket",
        Similarity.srpBucket(col(vecCol), dim, planes)),
      "bucket", idCol, batchBroadcastMaxBytes, version)

  /** Append a batch to a shard layout ([[Packing.shardAssign]] +
    * [[Packing.writeShardLayout]] in a [[LayoutStore]]): the layout IS
    * its own assignment metadata — (id, shard, pos, n_tokens) — and
    * shard identity is a pure hash of (salt, id), so growth re-derives
    * the full assignment from layout-rows ∪ batch-metadata WITHOUT
    * touching any text: old ids re-hash to their stored shard, new ids
    * hash in, and `pos` re-ranks per shard in the same (sampleKey, id)
    * order a from-scratch [[Packing.shardAssign]] on the union derives
    * — bit-identically, which the m46 oracle gates. Cost ∝ index +
    * batch; the batch's `nTokens` expression is the only corpus-side
    * computation.
    *
    * (nShards, salt) must be the ORIGINAL build's values — a mismatch
    * would silently reshuffle every doc, so the appender re-derives the
    * stored shard of existing rows and fails fast on the first
    * disagreement instead. */
  def appendShardSnapshot(spark: SparkSession, path: String,
                          newDocs: DataFrame, idCol: String,
                          nTokens: org.apache.spark.sql.Column,
                          nShards: Int, salt: String,
                          batchBroadcastMaxBytes: Long = 64L << 20,
                          version: Option[Long] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val old = LayoutStore.readSnapshotTable(spark, path, "", version)
      .select(col(idCol), col("n_tokens"), col("shard").as("__oldShard"))
    val batchIds = maybeBroadcast(
      newDocs.select(col(idCol)).distinct(), batchBroadcastMaxBytes)
    val collisions = old.join(batchIds, Seq(idCol), "left_semi")
      .select(col(idCol)).limit(1).count()
    require(collisions == 0L,
      "appendShardSnapshot: batch contains ids already present in the " +
        "snapshot — retract them first (propagateShardSnapshot) or rebuild")
    val union = old.select(col(idCol), col("n_tokens"),
        col("__oldShard").cast("int").as("__oldShard"))
      .unionByName(newDocs
        .select(col(idCol), nTokens.cast("long").as("n_tokens"),
          lit(null).cast("int").as("__oldShard")))
    val assigned = Packing.shardAssign(union, idCol, col("n_tokens"),
        nShards, salt)
      .join(union.select(col(idCol), col("__oldShard")), Seq(idCol))
    val drift = assigned
      .where(col("__oldShard").isNotNull &&
        col("__oldShard") =!= col("shard"))
      .limit(1).count()
    require(drift == 0L,
      s"appendShardSnapshot: recomputed shard disagrees with the stored " +
        s"layout — (nShards=$nShards, salt=$salt) do not match the " +
        "original build")
    LayoutStore.writeSnapshot(conf, path)(tmp =>
      Packing.writeShardLayout(
        assigned.select(col(idCol), col("shard"), col("pos"),
          col("n_tokens")), tmp))
  }

  /** The complete incremental refresh cycle — [[corpusDiff]]'s decisions
    * executed against a BM25 snapshot store: removed ids RETRACT
    * ([[Takedown.propagateBm25Snapshot]]'s closed-form df/N/Σdl
    * repair), changed ids retract their OLD rows and re-enter with
    * their new text, added ids append — one retraction snapshot, one
    * append snapshot, and the pinned-newest result is provably the
    * index a from-scratch build of the new corpus produces (the m48
    * oracle gate). This is the production refresh loop: cost =
    * index rewrites + tokenize of (added ∪ changed) only; unchanged
    * docs — the overwhelming mass of any real refresh — are never
    * re-read.
    *
    * `diff` is row-level change intelligence: (id, status) with status
    * in {added, removed, changed, unchanged} (compute it upstream with
    * the [[corpusDiff]] projections, or from pipeline bookkeeping);
    * `newCorpus` supplies the text for added/changed ids. Returns the
    * final version. */
  def refreshBm25Snapshot(spark: SparkSession, path: String,
                          diff: DataFrame, newCorpus: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text"): Long = {
    val retract = diff
      .where(col("status") === "removed" || col("status") === "changed")
      .select(col(idCol))
    val enter = diff
      .where(col("status") === "added" || col("status") === "changed")
      .select(col(idCol))
    Takedown.propagateBm25Snapshot(spark, path, retract, idCol)
    appendBm25Snapshot(spark, path,
      newCorpus.join(enter, Seq(idCol), "left_semi")
        .select(col(idCol), col(textCol)),
      idCol, textCol)
  }

  /** Corpus snapshot diff — the change report that DRIVES the
    * incremental passes above: given the previous and current corpus
    * versions, one row per status in {added, removed, changed,
    * unchanged} with the doc count and the signed token-mass delta
    * (added docs contribute their full mass, removed docs their
    * negation, changed docs the difference — the number an
    * [[appendBm25Snapshot]] Σdl merge or a capacity plan consumes).
    *
    * Scale shape: each side projects to (id, 32-char content
    * fingerprint, token count) BEFORE anything joins — text never
    * enters the shuffle — then ONE id-keyed full-outer join and an
    * O(4)-row aggregate. Content identity is the exact-dedup key
    * ([[Dedup.exactKey]]: md5 over whitespace-normalized lowered text),
    * so a formatting-only rewrite counts as changed exactly when the
    * exact-dedup pass would stop collapsing the two versions. */
  /** Row-level form of [[corpusDiff]]: one row per id with its status
    * and both token counts — the frame [[refreshBm25Snapshot]]
    * consumes. Same scale shape: project-then-join, text never in the
    * shuffle. */
  def corpusDiffRows(oldCorpus: DataFrame, newCorpus: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    def sig(df: DataFrame, fp: String, ntok: String): DataFrame =
      df.select(col(idCol),
        Dedup.exactKey(col(textCol)).as(fp),
        size(TextAnalysis.tokens(lower(col(textCol)))).cast("long").as(ntok))
    val o = sig(oldCorpus, "__ofp", "__ontok")
    val n = sig(newCorpus, "__nfp", "__nntok")
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__ofp").isNull, lit("added"))
          .when(col("__nfp").isNull, lit("removed"))
          .when(col("__ofp") === col("__nfp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  def corpusDiff(oldCorpus: DataFrame, newCorpus: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    corpusDiffRows(oldCorpus, newCorpus, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__nntok"), lit(0L))
          - coalesce(col("__ontok"), lit(0L))).as("tok_delta"))
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Takedown / right-to-be-forgotten propagation — the production
  * deletion pass: given a revocation set (ids; URLs or fingerprints
  * resolve to ids upstream via [[Web.normalizeUrl]] / exact keys), the
  * corpus is scrubbed AND every derived versioned artifact re-lands as
  * a NEW snapshot with the revoked content gone — because deleting from
  * the corpus alone is not deletion: the content keeps serving from
  * BM25 postings, ANN layouts, dedup signature state and shard layouts
  * until each is re-snapshotted. Every propagator here writes
  * `version=N+1` through the [[LayoutStore]] dot-temp + atomic-rename
  * contract, so probes pin either the old complete snapshot or the new
  * scrubbed one, never a half-write, and the retired version stays
  * until [[LayoutStore.prune]] (auditable, then gone).
  *
  * Cost discipline: every propagator is cost-∝-INDEX (one filtered
  * rewrite of the artifact), never cost-∝-corpus — the corpus text is
  * never re-read, never re-tokenized, never re-embedded. The one
  * deliberate exception is [[propagateBenchKeys]]: the bench-key store
  * holds content HASHES with no doc provenance (by design — it must not
  * leak eval text), so removal cannot be attributed per-key without the
  * bench sheet; since that sheet is eval-sized, propagation IS a
  * rebuild on the scrubbed sheet.
  *
  * Rebuild-equality contract (what the d65 oracle gates): after
  * propagation, a probe of the new snapshot returns results
  * hash-identical to the same probe of a from-scratch rebuild on the
  * scrubbed input — surviving rows are byte-identical, derived stats
  * (BM25 df/N/Σdl, shard `pos`) are adjusted in closed form, and no
  * revoked id can appear in any probed result because its rows are
  * simply not in the snapshot.
  */
object Takedown {

  private def idsFrame(revoked: DataFrame, revokedIdCol: String): DataFrame =
    revoked.select(col(revokedIdCol).as("__rid")).where(col("__rid").isNotNull)
      .distinct()

  /** The corpus-side scrub: drop every revoked id (left-anti — null ids
    * and ids not present are no-ops). This is the frame all downstream
    * REBUILDS would consume; the propagators below make those rebuilds
    * unnecessary. */
  def scrubCorpus(df: DataFrame, idCol: String, revoked: DataFrame,
                  revokedIdCol: String): DataFrame =
    df.join(idsFrame(revoked, revokedIdCol)
      .select(col("__rid").as(idCol)), Seq(idCol), "left_anti")

  /** Resolve a mixed revocation sheet to corpus ids — real takedown
    * requests arrive as URLs and content hashes at least as often as
    * ids: `byUrls` matches on CANONICAL form ([[Web.normalizeUrl]] both
    * sides, so a request for `HTTP://ex.com/p?b=2&a=1#x` hits the doc
    * stored under `http://ex.com/p?a=1&b=2`), `byFingerprints` on the
    * exact-dedup content key ([[Dedup.exactKey]] of the submitted text —
    * which catches EVERY verbatim copy under any id/url, the reason
    * fingerprint takedown exists). Each sheet is request-sized, so the
    * matches are semi-join probes of the corpus projection; the output
    * is one distinct id frame to feed [[scrubCorpus]] and the
    * propagators. Near-duplicate EXPANSION (revoke the whole near-dup
    * cluster, not just verbatim copies) is [[expandRevocations]]. */
  def resolveRevocations(corpus: DataFrame, idCol: String,
                         byIds: Option[DataFrame] = None,
                         byUrls: Option[(DataFrame, String, String)] = None,
                         byFingerprints: Option[(DataFrame, String, String)] = None)
      : DataFrame = {
    // (the option-heavy signature keeps each modality independent)
    val parts = Seq(
      byIds.map { ids =>
        // the other modalities name their column explicitly; ids would
        // otherwise silently take the sheet's FIRST column — and for a
        // takedown path a wrong resolution means the requested content
        // keeps serving. Demand an unambiguous single-column sheet.
        require(ids.columns.length == 1,
          s"byIds sheet must have exactly one column (the id); got " +
            s"(${ids.columns.mkString(", ")}) — select the id column first")
        ids.select(ids.columns.head).toDF("__rid")
      },
      byUrls.map { case (sheet, sheetUrlCol, corpusUrlCol) =>
        corpus.select(col(idCol).as("__rid"),
            Web.normalizeUrl(col(corpusUrlCol)).as("__cu"))
          .join(sheet.select(Web.normalizeUrl(col(sheetUrlCol)).as("__cu"))
            .distinct(), Seq("__cu"), "left_semi")
          .select(col("__rid"))
      },
      byFingerprints.map { case (sheet, sheetTextCol, corpusTextCol) =>
        corpus.select(col(idCol).as("__rid"),
            Dedup.exactKey(col(corpusTextCol)).as("__fp"))
          .join(sheet.select(Dedup.exactKey(col(sheetTextCol)).as("__fp"))
            .distinct(), Seq("__fp"), "left_semi")
          .select(col("__rid"))
      }).flatten
    require(parts.nonEmpty,
      "resolveRevocations needs at least one of byIds/byUrls/byFingerprints")
    parts.reduce(_.unionByName(_)).where(col("__rid").isNotNull)
      .distinct().select(col("__rid").as(idCol))
  }

  /** Near-duplicate EXPANSION of a revocation set — the policy question
    * behind every real takedown: deleting the named doc while keeping
    * its near-copies is not deletion. Expansion = the revoked ids'
    * whole near-dup CLUSTERS ([[Dedup.nearDupClusters]] membership at
    * the production LSH config): every doc sharing a cluster with any
    * revoked doc joins the set (verbatim copies are a special case —
    * exact-dup pairs are Jaccard-1 pairs). Cost is the standard LSH+CC
    * pass over the corpus; ids not in any cluster expand to themselves.
    * Returns the expanded distinct id frame. */
  def expandRevocations(corpus: DataFrame, idCol: String, textCol: String,
                        revokedIds: DataFrame, revokedIdCol: String,
                        threshold: Double, k: Int = 3,
                        numHashes: Int = 12, bands: Int = 4,
                        maxBucketSize: Option[Int] = None): DataFrame = {
    val ids = idsFrame(revokedIds, revokedIdCol)
    val clusters = Dedup.nearDupClusters(corpus, idCol, textCol, threshold,
      k, numHashes, bands, maxBucketSize) // (id, cluster)
    val revokedClusters = clusters
      .join(ids.select(col("__rid").as("id")), Seq("id"), "left_semi")
      .select(col("cluster")).distinct()
    val viaClusters = clusters
      .join(revokedClusters, Seq("cluster"), "left_semi")
      .select(col("id").as("__rid"))
    viaClusters.unionByName(ids).distinct().select(col("__rid").as(idCol))
  }

  /** Generic row-keyed layout propagation — IVF / SRP / quantized /
    * PQ-codes layouts and any [[LayoutStore]] snapshot whose rows are
    * self-contained per id: walk the pinned snapshot's sub-tables (or
    * the root table, when the snapshot root itself is the partitioned
    * table — the writeIvfLayout-in-store shape), left-anti each table
    * that carries one of `idCols`, inherit tables that don't by
    * manifest reference (centroid/meta sheets — no row can change, so
    * no byte moves), and land the result as the next version. Partition `col=value`
    * chains round-trip byte-for-byte (inference pinned off, the
    * compactSnapshot fix). Row-level filtering is EXACTLY
    * rebuild-identical for these layouts because cell/bucket assignment
    * is a pure per-row function of frozen centroids/planes.
    *
    * Version cost is ∝ TOUCHED partitions: for a single-level
    * partitioned table, only the `col=value` directories that contain a
    * revoked row are rewritten (partition-pruned scan); every other
    * directory is inherited by manifest reference
    * ([[LayoutStore.writeSnapshotManifested]]); meta sheets (no id
    * column) are inherited whole. Finding the touch set costs one
    * column-pruned (id, partition) scan — ids, never payload. Values
    * that don't survive plain directory-name comparison
    * ([[LayoutStore.plainPartitionValue]]) fall back to the full
    * rewrite, so correctness never depends on the fast path.
    *
    * NOT for artifacts with cross-row derived stats — BM25's df/N/Σdl
    * ([[propagateBm25Snapshot]]) and shard `pos` ranks
    * ([[propagateShardSnapshot]]) have dedicated closed-form
    * propagators; a plain row filter would leave their derived numbers
    * stale. Returns the new version. */
  def propagateLayoutSnapshot(spark: SparkSession, path: String,
                              revoked: DataFrame, revokedIdCol: String,
                              idCols: Seq[String] =
                                Seq("vec_id", "doc_id", "id"),
                              version: Option[Long] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcVersion = version.getOrElse(LayoutStore.versions(conf, path).last)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val ids = idsFrame(revoked, revokedIdCol)
    val entries = LayoutStore.effectiveEntries(conf, path, srcVersion)
    val rootTable = entries.keySet.exists(k =>
      k == "." || (!k.contains("/") && k.contains("=")))
    val tables: Seq[String] =
      if (rootTable) Seq("")
      else entries.keys.map(_.split("/")(0)).toSeq.distinct.sorted
    LayoutStore.withPartitionInferenceOff(spark) {
      LayoutStore.writeSnapshotManifested(conf, path) { (tmp, _) =>
      var carried = Map.empty[String, Long]
      def subEntries(sub: String): Map[String, Long] =
        if (sub.isEmpty) entries.filter { case (k, _) =>
          k == "." || (!k.contains("/") && k.contains("=")) }
        else entries.filter { case (k, _) =>
          k == sub || k.startsWith(s"$sub/") }
      def ownerDir(sub: String, o: Long): String =
        if (sub.isEmpty) s"$path/version=$o" else s"$path/version=$o/$sub"
      tables.foreach { sub =>
        val dest = if (sub.isEmpty) tmp else s"$tmp/$sub"
        val se = subEntries(sub)
        val df = LayoutStore.readSnapshotTable(spark, path, sub,
          Some(srcVersion))
        val parts = LayoutStore.partitionCols(fs,
          new org.apache.hadoop.fs.Path(ownerDir(sub, se.head._2)))
        def fullRewrite(filtered: DataFrame): Unit = {
          val w = (if (parts.isEmpty) filtered
                   else filtered.repartition(parts.map(col): _*))
            .write.mode("overwrite")
          (if (parts.isEmpty) w else w.partitionBy(parts: _*)).parquet(dest)
        }
        idCols.find(df.columns.contains) match {
          case None =>
            // no id column (centroid/plane/meta sheets): nothing to
            // filter — the whole table is byte-identical in the new
            // version, so INHERIT it by manifest reference (not even a
            // file copy moves now)
            carried ++= se
          case Some(c) =>
            val filtered =
              df.join(ids.select(col("__rid").as(c)), Seq(c), "left_anti")
            // single-level partitioned table: rewrite ONLY the
            // partitions that contain a revoked row (partition-pruned
            // scan), inherit the rest by manifest reference — the
            // deletion pass costs ∝ touched partitions. Inference is
            // pinned off in this scope, so partition values are raw
            // strings and compare directly against `col=value`
            // directory suffixes; any escaping-prone value falls back
            // to the full rewrite.
            val dirNames = se.keys.filter(_.contains("=")).map(k =>
              if (sub.isEmpty) k else k.stripPrefix(s"$sub/")).toSeq
            val fastable = parts.size == 1 && dirNames.nonEmpty &&
              dirNames.map(_.split("=", 2)(1))
                .forall(LayoutStore.plainPartitionValue)
            if (fastable) {
              val p = parts.head
              val touched = df
                .join(ids.select(col("__rid").as(c)), Seq(c), "left_semi")
                .select(col(p)).distinct().collect().map(_.getString(0))
              if (touched.forall(LayoutStore.plainPartitionValue)) {
                filtered.where(col(p).isin(touched.toSeq: _*))
                  .repartition(col(p))
                  .write.mode("overwrite").partitionBy(p).parquet(dest)
                val touchedKeys = touched.map(v =>
                  if (sub.isEmpty) s"$p=$v" else s"$sub/$p=$v").toSet
                carried ++= se.filterNot { case (k, _) =>
                  touchedKeys.contains(k) }
              } else fullRewrite(filtered)
            } else fullRewrite(filtered)
        }
      }
      carried
      }
    }
  }

  /** BM25 index propagation with closed-form stat repair — the artifact
    * where a naive row filter is WRONG: scores read df (denormalized on
    * every posting) and the corpus-frozen N/Σdl, all of which change
    * when docs leave. From the index alone: removed postings give each
    * term's df decrement and each removed doc's dl; survivors keep
    * their tf/dl (per-doc quantities don't depend on other docs); the
    * stats row adjusts by the removed doc count and token mass. The
    * result is bit-identical to `writeBm25Snapshot` on the scrubbed
    * corpus — without re-tokenizing a single byte of text. (One
    * documented edge: a revoked doc with ZERO tokens never entered the
    * postings, so its removal can't be seen from the index — its `n`
    * contribution survives and every score shifts slightly through
    * avgdl. Exact for any revoked doc with >= 1 token; a caller whose
    * corpus may contain tokenless docs restores rebuild identity by
    * either (a) passing `corpusDocIds` — a one-column frame of EVERY
    * doc id in the indexed corpus (tokenless included) — and the N
    * decrement is derived here by semi-joining the revocation set
    * against it, or (b) passing `removedDocCount` = the number of
    * revoked docs PRESENT in the indexed corpus. NOT the revocation
    * sheet's row count: a real sheet routinely lists ids that were
    * already removed or never ingested, and counting those would
    * silently over-decrement N and skew every IDF/avgdl in the
    * opposite direction. When both are given, the derived count wins
    * and a mismatching `removedDocCount` fails fast.)
    *
    * The per-term decrement frame is revoked-vocabulary-sized; it
    * broadcasts only under `decBroadcastMaxBytes` (plan-stats guard,
    * the d18/d29 pattern), else the join shuffles. The survivor rewrite
    * prunes to the REVOKED VOCABULARY'S term buckets (removed rows and
    * df decrements share the removed terms' tbuckets); untouched
    * `tbucket=` directories are inherited by manifest reference
    * ([[LayoutStore.writeSnapshotManifested]]), so the deletion pass writes
    * ∝ touched buckets, never ∝ index. Returns the new version. */
  def propagateBm25Snapshot(spark: SparkSession, path: String,
                            revoked: DataFrame, revokedIdCol: String,
                            decBroadcastMaxBytes: Long = 64L << 20,
                            version: Option[Long] = None,
                            removedDocCount: Option[Long] = None,
                            corpusDocIds: Option[DataFrame] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcVersion = version.getOrElse(LayoutStore.versions(conf, path).last)
    val ids = idsFrame(revoked, revokedIdCol).select(col("__rid").as("doc_id"))
    val postings = LayoutStore.readSnapshotTable(spark, path, "postings",
      Some(srcVersion))
    val st = LayoutStore.readSnapshotTable(spark, path, "stats",
      Some(srcVersion)).head()
    val removed = postings.join(ids, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val remStats = removed.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("tot"))
      .head()
    // N decrement, resolved BEFORE any write begins (remStats is already
    // materialized — an invalid argument must not cost a postings rewrite
    // or leave an abandoned dot-temp): the semi-join-derived count of
    // revoked ids actually present in the corpus when a doc-id source is
    // given (the only way to SEE revoked tokenless docs), else the
    // caller-supplied present-doc count, else the postings-derived count.
    val derivedRemoved = corpusDocIds.map { docIds =>
      require(docIds.columns.length == 1,
        s"corpusDocIds must be a single-column doc-id frame, got " +
          s"[${docIds.columns.mkString(", ")}]")
      val cids = docIds.select(col(docIds.columns(0)).as("doc_id"))
      ids.join(cids, Seq("doc_id"), "left_semi").count()
    }
    derivedRemoved.zip(removedDocCount).foreach { case (derived, claimed) =>
      require(derived == claimed,
        s"removedDocCount ($claimed) disagrees with the $derived revoked " +
          "docs present in corpusDocIds — the sheet likely lists ids " +
          "that were already removed or never ingested")
    }
    val nRemoved = derivedRemoved.orElse(removedDocCount)
      .getOrElse(remStats.getLong(0))
    require(nRemoved >= remStats.getLong(0),
      s"removedDocCount ($nRemoved) is smaller than the ${remStats.getLong(0)} " +
        "revoked docs observed in the postings — it must count every " +
        "revoked doc present in the indexed corpus")
    require(nRemoved <= st.getAs[Long]("n"),
      s"removedDocCount ($nRemoved) exceeds the ${st.getAs[Long]("n")} docs " +
        "in the snapshot — pass the count of revoked docs PRESENT in the " +
        "indexed corpus, not the revocation sheet's row count")
    val dec0 = removed.groupBy(col("term")).agg(count(lit(1)).as("__rm"))
    val dec =
      if (dec0.queryExecution.optimizedPlan.stats.sizeInBytes
          <= BigInt(decBroadcastMaxBytes)) broadcast(dec0)
      else dec0
    // touched term buckets: every removed posting row AND every df
    // decrement (other postings of the same term) live in the buckets
    // of the REVOKED DOCS' vocabulary — a term's postings share one
    // tbucket. The survivor rewrite prunes to those directories at
    // file-listing time; untouched `tbucket=` directories are
    // byte-identical and inherited by manifest reference below, so the
    // deletion pass costs ∝ touched buckets, never ∝ index.
    val touched = removed.select(col("tbucket")).distinct()
      .collect().map(_.getInt(0))
    val survivors = postings.where(col("tbucket").isin(touched.toSeq: _*))
      .join(ids, Seq("doc_id"), "left_anti")
      .join(dec, Seq("term"), "left")
      .withColumn("df", col("df") - coalesce(col("__rm"), lit(0L)))
      .drop("__rm")
    val out = LayoutStore.writeSnapshotManifested(conf, path) { (tmp, _) =>
      // a zero-hit revocation (ids already removed / never ingested —
      // routine input for a real sheet) touches NO bucket: writing the
      // empty survivors frame would land a hollow postings dir
      // (markers only) instead of a table — skip the write and carry
      // every postings entry; stats still rewrite below (N may shrink
      // by revoked TOKENLESS docs resolved via corpusDocIds)
      if (touched.nonEmpty)
        survivors.repartition(col("tbucket"))
          .write.mode("overwrite").partitionBy("tbucket")
          .parquet(s"$tmp/postings")
      // tot is exact from the postings alone — a tokenless doc
      // contributes 0 to Σdl; only the N decrement needed the resolved
      // nRemoved above.
      spark.range(1)
        .select(lit(st.getAs[Long]("n") - nRemoved).as("n"),
          lit(st.getAs[Long]("tot") - remStats.getLong(1)).as("tot"),
          lit(st.getAs[Int]("term_buckets")).as("term_buckets"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
      // untouched tbucket dirs carry zero revoked rows and zero df
      // decrements — inherit them by manifest reference
      val touchedDirs = touched.map(v => s"postings/tbucket=$v").toSet
      LayoutStore.effectiveEntries(conf, path, srcVersion)
        .filter { case (k, _) =>
          k.startsWith("postings/") && !touchedDirs.contains(k) }
    }
    removed.unpersist(blocking = true)
    out
  }

  /** Shard-layout propagation ([[Packing.writeShardLayout]] inside a
    * [[LayoutStore]] store): drop revoked docs, then densely re-rank
    * `pos` WITHIN each shard by the retired snapshot's pos order.
    * Because pos order is the (sk, id) order and sk is a pure function
    * of (salt, id), surviving docs keep their relative order — the
    * re-rank reproduces exactly the pos a from-scratch
    * [[Packing.shardAssign]] on the scrubbed corpus would emit, without
    * recomputing a single hash. Returns the new version.
    *
    * NOT for mix-preserving layouts ([[Packing.shardAssignBalanced]]'s
    * d55/m34 family): their shard identity balances per-stratum counts
    * ±1-exactly, so removing docs CHANGES which shard a from-scratch
    * rebuild assigns — a row filter can't reproduce that. Those layouts
    * REBUILD on takedown (still cheap: the assignment consumes only
    * (id, stratum, tokens) metadata, never text), landing as the next
    * snapshot the same way. */
  def propagateShardSnapshot(spark: SparkSession, path: String,
                             revoked: DataFrame, revokedIdCol: String,
                             idCol: String = "doc_id",
                             version: Option[Long] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ids = idsFrame(revoked, revokedIdCol).select(col("__rid").as(idCol))
    val t = LayoutStore.readSnapshotTable(spark, path, "", version)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
    val reranked = t.join(ids, Seq(idCol), "left_anti")
      .withColumn("pos", (row_number().over(w) - 1).cast("int"))
    LayoutStore.writeSnapshot(conf, path)(tmp =>
      Packing.writeShardLayout(reranked, tmp))
  }

  /** Signature-state scrub (the cross-run dedup memory,
    * [[Dedup.writeSignatureState]]'s flat append table): every revoked
    * doc's (fp, sig) row leaves, so no future batch can ever be flagged
    * a duplicate OF revoked content — which is itself a leak (the state
    * would keep "remembering" the revoked text through its hashes).
    * The state table is append-mode flat, not versioned, so the scrub
    * lands at `outPath` (typically a fresh dir the caller then swaps in
    * via the RunState/publishRename primitive — in-place overwrite of a
    * table being read is not atomic on any FS). Format stamp and
    * column layout pass through untouched (readSignatureState
    * re-validates on the way in). */
  def scrubSignatureState(spark: SparkSession, statePath: String,
                          revoked: DataFrame, revokedIdCol: String,
                          outPath: String): Unit =
    Dedup.readSignatureState(spark, statePath)
      .join(idsFrame(revoked, revokedIdCol).select(col("__rid").as("id")),
        Seq("id"), "left_anti")
      .write.mode("overwrite").parquet(outPath)

  /** Compliance audit — the verification pass AFTER a takedown: walk
    * EVERY version of a [[LayoutStore]] store and count rows still
    * carrying a revoked id, per (version, sub-table). The expected
    * picture post-propagation is exactly what the snapshot contract
    * promises: the newest version reads 0 everywhere, retired versions
    * still show their counts (auditable until [[LayoutStore.prune]] —
    * which this report is the input to). Driver-side loop over
    * versions × sub-tables (file-listing scale; each cell is one
    * semi-join count job) — an audit tool, not a data path.
    * Output: (version, table, n_revoked) — one row per cell, including
    * the zeros. */
  def auditRevocations(spark: SparkSession, path: String,
                       revoked: DataFrame, revokedIdCol: String,
                       idCols: Seq[String] = Seq("vec_id", "doc_id", "id"))
      : DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ids = idsFrame(revoked, revokedIdCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = LayoutStore.versions(conf, path).flatMap { v =>
      // manifest-resolved: a version's LOGICAL content includes every
      // entry it inherits by reference, which is exactly what an
      // auditor must scan (a manifested snapshot physically holding
      // only its touched dirs still SERVES the inherited rows)
      val entries = LayoutStore.effectiveEntries(conf, path, v)
      val rootTable = entries.keySet.exists(k =>
        k == "." || (!k.contains("/") && k.contains("=")))
      val tables: Seq[String] =
        if (rootTable || entries.isEmpty) Seq(".")
        else entries.keys.map(_.split("/")(0)).toSeq.distinct.sorted
      tables.map { name =>
        val df = LayoutStore.readSnapshotTable(spark, path,
          if (name == ".") "" else name, Some(v))
        val n = idCols.find(df.columns.contains) match {
          case Some(c) =>
            df.join(ids.select(col("__rid").as(c)), Seq(c), "left_semi")
              .count()
          case None => 0L // no id column — nothing attributable
        }
        (v, name, n)
      }
    }
    ids.unpersist(blocking = true)
    import spark.implicits._
    rows.toDF("version", "table", "n_revoked")
  }

  /** Bench-key propagation — the documented rebuild case: the store
    * holds distinct hashed shingles with NO doc provenance (deliberate:
    * the store must not leak eval text), so a revoked doc's keys cannot
    * be surgically removed without over-removing shingles that
    * SURVIVING bench docs also contain. The bench sheet is eval-sized,
    * so the correct propagation is simply the next snapshot built from
    * the scrubbed sheet ([[scrubCorpus]] upstream): replaced keys
    * retire by the readBenchKeysLatest pin, identically to a normal
    * eval-set refresh (d32). Returns the new version. */
  def propagateBenchKeys(scrubbedBench: DataFrame, textCol: String,
                         path: String, k: Int = 8): Long =
    Dedup.writeBenchKeysSnapshot(scrubbedBench, textCol, path, k)
}

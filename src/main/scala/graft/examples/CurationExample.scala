package graft.examples

import graft.llm.{Dedup, Pii, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation on the documents + embeddings
  * tables — the LLM-ops counterpart of IngestExample (same flow the
  * oracle-gated m14 query verifies, here in user-facing form):
  *
  *   0. rule-based filter funnel (C4/Gopher gate chain) with per-rule
  *      attrition counts — the first stage of every real pipeline;
  *   0.5 URL-level curation: canonical-URL dedup (refetch collapse,
  *      keep-longest) + per-domain contribution cap (keepOnly →
  *      WindowGroupLimit) — the crawl-side gates before any content
  *      analysis;
  *   1. quality gate (per-source CALIBRATED percentile cut on the
  *      uniqueness score — comparable across heterogeneous sources —
  *      plus absolute floors and repetition signals);
  *   2. benchmark decontamination (VERSIONED bench-key snapshots — an
  *      eval-set refresh retires the old keys by construction);
  *   3. exact dedup (normalized-md5 fingerprint, min-id keeper);
  *   4. MinHash-LSH near-dup clustering with the PRODUCTION keeper:
  *      canonical = longest copy, not min id (canonicalByQuality);
  *   5. deterministic mix sampling to a target language composition;
  *   6. PII scrub — redaction counts kept as quality telemetry;
  *   7. leakage-free train/heldout split (near-dup cluster reps decide
  *      the side — a heldout doc can never have a near-copy in train);
  *   8. sequence packing into fixed token budgets (training-ready);
  *   9. reproducible shard layout (one pos-ordered file per shard);
  *  10. learned quality audit (surface-feature LR and hashed
  *      bag-of-words LR, both fit distributed and scored as frozen-
  *      literal map-side margins);
  *  11. winnowing-overlap cross-check (independent signal);
  *  12. embedding near-dup clusters + per-cell diversity take on the
  *      vector side;
  *  13. curated + packed + sharded corpora written with stats;
  *  14. monitoring references published for the NEXT run (term-profile
  *      + centroid snapshots, m31/m33) and the curation-shift TVD
  *      reported for THIS run (how far curation moved the corpus
  *      distribution from raw);
  *  15. takedown: a post-publication revocation set scrubs the curated
  *      corpus AND re-snapshots the derived artifacts (shard layout
  *      pos re-rank, bench-key rebuild) — versioned retire-by-pin,
  *      nothing corpus-sized rebuilds (d65/m38-m40).
  *
  * Run: sbt "runMain graft.examples.CurationExample [sfDir] [outDir]"
  */
object CurationExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-curation").toString)
    val spark = graft.core.GraftSession.local("graft-curation-example")

    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    // stage 0: the rule funnel — keep survivors, log the attrition by
    // first failing gate (the funnel dashboard every crawl batch gets).
    // Gates are corpus-tuned, as in real use: the synthetic corpus has
    // no punctuation or case, so the library defaults would attribute
    // every doc to the terminal-punctuation gate
    val verdicts = graft.llm.Filters.funnel(raw, "doc_id", "text",
      gates = Seq(
        graft.llm.Filters.Gate("too_short", "n_tokens < 12"),
        graft.llm.Filters.Gate("stubby", "max_tok_len < 8")))
    verdicts.groupBy(col("verdict")).agg(count(lit(1)).as("n"))
      .collect().sortBy(r => -r.getLong(1))
      .foreach(r => println(s"[funnel] ${r.getString(0)}: ${r.getLong(1)}"))
    val funneled = raw.join(
      verdicts.where(col("verdict") === "kept").select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")

    // stage 0.5: URL-level curation — the crawl-side gates that run
    // BEFORE any content analysis (this corpus has no URL column, so
    // the messy URL is synthesized for the demo — the d68/d70
    // convention): refetches collapse by CANONICAL URL keeping the
    // longest copy, then no registrable domain may contribute more than
    // 200 docs (keepOnly → the WindowGroupLimit plan, so a mega-domain
    // never materializes its window)
    val withUrls = funneled.withColumn("url", concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("http")),
      lit("://WWW.ex"), (col("doc_id") % 7).cast("string"),
      lit(".com/doc/"), (col("doc_id") % 25).cast("string"),
      when(col("doc_id") % 2 === 0, lit("?b=2&a=1&utm_source=crawl"))
        .otherwise(lit("?a=1&b=2"))))
    val docs = graft.llm.Web.domainCap(
        graft.llm.Web.urlDedup(withUrls, "doc_id", "url",
            quality = col("n_chars"))
          .where(col("keep")).drop("canonical_url", "keep"),
        "doc_id", "url", maxPerDomain = 40, salt = "crawl0",
        keepOnly = true)
      .drop("url", "domain", "domain_rank", "kept")
    println(s"[url-curation] ${funneled.count()} funneled -> " +
      s"${docs.count()} after canonical-URL dedup + domain cap")
    val toks = TextAnalysis.tokens(lower(col("text")))
    // per-source CALIBRATED quality cut: a raw uniqueness score means
    // different things on different sources, so the keep-threshold is a
    // within-source percentile (drop each source's bottom quintile) —
    // exact percent_rank, computed from the score histogram, no per-doc
    // sort anywhere
    val calKeep = graft.llm.Filters.calibrateScores(
      docs.select(col("doc_id"), col("source"),
          size(toks).cast("long").as("__nt"),
          size(array_distinct(toks)).cast("long").as("__nu"))
        .select(col("doc_id"), col("source"),
          when(col("__nt") === 0L, lit(0L))
            .otherwise(expr("(1000 * __nu) div __nt")).as("score")),
      "doc_id", "source", "score")
      .where(col("pct") >= 0.2).select(col("id").as("doc_id"))
    val qual = docs
      .join(calKeep, Seq("doc_id"), "left_semi")
      .withColumn("__nt", size(toks).cast("long"))
      .withColumn("__ur",
        size(array_distinct(toks)).cast("double") / col("__nt").cast("double"))
      .where(col("__nt") >= 10 && col("__ur") > 0.3)
      .drop("__nt", "__ur")
      // repetition gate (Gopher-rule family): drop docs whose most
      // frequent 2-gram carries more than half the 2-gram mass
      .join(TextAnalysis.repetitionReport(docs, "doc_id", "text", Seq(2))
          .where(col("top_2gram_ratio") > 0.5).select(col("doc_id")),
        Seq("doc_id"), "left_anti")

    // decontamination against the VERSIONED bench-key store: snapshot 1
    // is the live eval set; a later refresh writes snapshot 2 and this
    // same reader silently retires the replaced keys (readers always pin
    // the newest version)
    Dedup.writeBenchKeysSnapshot(docs.where(col("doc_id") % 97 === 0),
      "text", s"$outDir/bench_keys")
    val clean = qual.join(
      Dedup.contaminationFlagsAgainstKeys(qual,
          Dedup.readBenchKeysLatest(spark, s"$outDir/bench_keys"),
          "doc_id", "text")
        .where(col("contaminated")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

    val exact = Dedup.exactDedup(clean, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // production keeper: keep the LONGEST copy of each near-dup cluster
    // (canonicalByQuality), not the arbitrary min id
    val nearDrop = Dedup.canonicalByQuality(exact, "doc_id", "text",
        quality = length(col("text")).cast("long"), threshold = 0.5)
      .where(!col("keep")).select(col("id").as("doc_id"))
    val deduped = exact.join(nearDrop, Seq("doc_id"), "left_anti")
    // deterministic mix: largest corpus at 50% en / 25% zh / 25% de
    val mixed = graft.llm.Sampling.mixTake(deduped, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25))
    // PII scrub: redacted text replaces raw; per-category counts stay
    // as quality telemetry columns
    val scrubbed = Pii.scrub(mixed, "doc_id", "text")
    val curated = mixed.drop("text")
      .join(scrubbed.withColumnRenamed("redacted_text", "text"), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    curated.write.mode("overwrite").parquet(s"$outDir/curated")

    // leakage-free train/heldout split: near-dup cluster reps decide
    // the side, so a heldout doc can never have a near-copy in train
    val split = Dedup.leakFreeSplit(curated, "doc_id", "text",
      heldoutRate = 0.1, salt = "epoch0", threshold = 0.5)
    val train = curated.join(
      split.where(col("side") === "train").select(col("doc_id")),
      Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val heldoutN = split.where(col("side") === "heldout").count()

    // training-ready packing: fixed 2048-token sequences over the TRAIN
    // side in deterministic salted order
    graft.llm.Packing.packSequences(
        train.select(col("doc_id"), col("text")), "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"), budget = 2048)
      .write.mode("overwrite").parquet(s"$outDir/packed")

    // reproducible shard layout: one pos-ordered file per shard dir —
    // the form a trainer streams without sorting. Written through the
    // versioned store so a refresh (or a takedown, below) retires the
    // old layout by the newest-pin instead of mutating it in place
    graft.llm.LayoutStore.writeSnapshot(
      spark.sparkContext.hadoopConfiguration, s"$outDir/shards")(tmp =>
      graft.llm.Packing.writeShardLayout(
        graft.llm.Packing.shardAssign(train, "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("long"),
          nShards = 8, salt = "epoch0"),
        tmp))

    // learned quality audit: LR over the funnel features (weak label =
    // corpus-majority language), frozen coefficients, map-side margins
    val (qw, qb) = graft.llm.Filters.fitQualityModel(docs, "text",
      col("lang") === "en")
    val qualityPos = graft.llm.Filters.qualityMargin(train, "doc_id",
      "text", qw, qb).where(col("pred")).count()
    // the term-level sibling: hashed bag-of-words LR (fixed 64-bucket
    // feature space, no vocabulary dict), scored as one map-side fold
    val (bw, bb) = graft.llm.Filters.fitHashedBowModel(docs, "text",
      col("lang") === "en")
    val bowPos = graft.llm.Filters.hashedBowMargin(train, "doc_id",
      "text", bw, bb).where(col("pred")).count()

    // publish this run's MONITORING REFERENCES: the curated corpus's
    // term profile and per-language centroids become the pinned-newest
    // snapshots the NEXT run drifts against (m31/m33) — and this run
    // reports its own drift vs the RAW corpus as the curation-shift
    // audit (how much did curation move the distribution?)
    TextAnalysis.writeTermProfileSnapshot(raw, "text",
      s"$outDir/term_profile")
    val curationShift = TextAnalysis.driftAgainstProfile(spark, curated,
      "text", s"$outDir/term_profile", topK = 5)
      .agg(max(col("tvd"))).head().getDouble(0)
    TextAnalysis.writeTermProfileSnapshot(curated, "text",
      s"$outDir/term_profile")

    // independent overlap signal on the curated set (audit, not a filter)
    val overlap = Dedup.winnowingOverlapPairs(curated, "doc_id", "text",
      minSim = 0.3, maxBucketSize = Some(64)).count()

    // embedding-side near-dup clusters + diversity take: dense semantic
    // regions downsample to 32 per Voronoi cell, sparse ones survive
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embClusters = Dedup.connectedComponents(
      Similarity.embeddingNearDups(emb, threshold = 0.40, dim = 64))
      .count()
    val diverse = graft.llm.Sampling.diversityTake(emb, "vec_id",
      "embedding", Similarity.fitCentroids(emb, nlist = 8), nPerCell = 32)
      .count()
    // vector-side monitoring reference for the next run (m33): the
    // per-label rational centroids of this run's embedding corpus
    Similarity.writeCentroidSnapshot(emb,
      emb.select(col("vec_id"), col("label")), "vec_id", "vec_id",
      "label", s"$outDir/centroids")

    // right-to-be-forgotten: a revocation set arrives AFTER publication.
    // The curated corpus scrubs by left-anti, and every derived
    // versioned artifact re-lands as a NEW snapshot with the revoked
    // rows gone — nothing corpus-sized rebuilds: the shard layout
    // filters + re-ranks pos in place (provably rebuild-identical), the
    // bench-key store rebuilds from its eval-sized scrubbed sheet, and
    // readers retire the old versions by the newest-pin
    val revoked = curated.where(col("doc_id") % 151 === 3)
      .select(col("doc_id"))
    graft.llm.Takedown.scrubCorpus(curated, "doc_id", revoked, "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/curated_scrubbed")
    val shardV = graft.llm.Takedown.propagateShardSnapshot(spark,
      s"$outDir/shards", revoked, "doc_id")
    val benchV = graft.llm.Takedown.propagateBenchKeys(
      graft.llm.Takedown.scrubCorpus(
        docs.where(col("doc_id") % 97 === 0), "doc_id", revoked, "doc_id"),
      "text", s"$outDir/bench_keys")
    println(s"[takedown] revoked=${revoked.count()} -> shards version=" +
      s"$shardV, bench-keys version=$benchV (v1s retained until prune)")

    val total = docs.count(); val kept = curated.count()
    val trainN = train.count()
    val redactions = curated.agg(sum(col("n_redacted"))).head().getLong(0)
    println(s"[curation-example] input=$total quality+deduped=$kept " +
      s"train=$trainN heldout=$heldoutN quality_margin_pos=$qualityPos " +
      s"bow_margin_pos=$bowPos curation_shift_tvd=$curationShift " +
      s"pii_redactions=$redactions residual_overlap_pairs=$overlap " +
      s"embedding_cluster_members=$embClusters diversity_kept=$diverse out=$outDir")
    spark.stop()
  }
}

package graft

import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The ~988k-doc near-linearity confirmation run — [[ScaleBench]]'s
  * corpus recipe at ~2x the default replication (cold 110x / hot 4500x vs
  * 60x / 2500x), restricted to the detector surfaces whose scaling is the
  * claim under test: exact dedup, capped LSH pairing, connected
  * components, winnowing, both SimHash tiers, and the PassJoin edit
  * family (previously only measured at 544k) — plus, from round 11, the
  * LIFECYCLE operators (BM25 takedown propagate vs rebuild, closed-form
  * append, day-partitioned copy-through append) whose ∝-index / ∝-batch
  * claims were previously pinned only at 544k. A near-linear read: each
  * stage's seconds and output cardinalities land at ~1.8-2.2x their
  * SCALE_BENCH.json 544k rows. Writes SCALE_BENCH_988.json (one JSON
  * line, same key names as the 544k artifact where the stages overlap).
  *
  * Run: sbt "runMain graft.ScaleBench988" — a timing artifact; do not
  * run other Spark jobs or sbt test concurrently.
  */
object ScaleBench988 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val coldReps = sys.env.getOrElse("GRAFT_SCALE_COLD", "110").toInt
    val hotReps = sys.env.getOrElse("GRAFT_SCALE_HOT", "4500").toInt
    val spark = graft.core.GraftSession.local("graft-scale-bench-988")
    val t0 = System.nanoTime()
    def secs(since: Long): Double = (System.nanoTime() - since) / 1e9

    // corpus: identical recipe to ScaleBench (same skew shape, same
    // mega-cluster/near-clique mix) at the doubled replication factors
    val gen = System.nanoTime()
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(64)
    val replicated = base
      .withColumn("__hot", col("doc_id") % 50 === 0)
      .withColumn("__reps",
        when(col("__hot"), lit(hotReps)).otherwise(lit(coldReps)))
      .select(col("doc_id"), col("text"), col("__hot"),
        explode(sequence(lit(0), col("__reps") - 1)).as("rep"))
      .select((col("doc_id") * 100000 + col("rep")).as("doc_id"),
        when(col("__hot"), col("text"))
          .otherwise(concat(col("text"), lit(" rev "), col("rep").cast("string")))
          .as("text"))
    val corpusPath = java.nio.file.Files
      .createTempDirectory("graft-scale-988").toString + "/corpus"
    replicated.write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val nDocs = corpus.count()
    val genSecs = secs(gen)

    val tExact = System.nanoTime()
    val nExactGroups = corpus
      .select(Dedup.exactKey(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"),
        count(lit(1)).as("n"))
      .count()
    val exactSecs = secs(tExact)

    val cap = 256
    val tLsh = System.nanoTime()
    val cands = Dedup.lshCandidatePairs(corpus, "doc_id", "text",
      maxBucketSize = Some(cap))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    val lshSecs = secs(tLsh)

    val tCc = System.nanoTime()
    val cc = Dedup.connectedComponents(cands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClusters = cc.select(col("cluster")).distinct().count()
    val nClustered = cc.count()
    val ccSecs = secs(tCc)
    val ccRounds = Dedup.lastCcRounds
    cc.unpersist()

    // incremental CC at 2x (ScaleBench's recipe: history = every pair
    // not touching a held-out base-doc slice labels once, then each
    // slice folds in via label contraction — the "new shard lands"
    // shape, with real merges and new nodes; fold cost must track the
    // BATCH, never cc_secs)
    val baseSlice1 = pmod(xxhash64((col("id1") / 100000).cast("long")),
      lit(400L))
    val baseSlice2 = pmod(xxhash64((col("id2") / 100000).cast("long")),
      lit(400L))
    val histPairs = cands.where(baseSlice1 >= 4 && baseSlice2 >= 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tIncPrior = System.nanoTime()
    val priorLabels = Dedup.connectedComponents(histPairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    priorLabels.count()
    val incPriorSecs = secs(tIncPrior)
    def ccFoldRun(k: Int): (Double, Long, Long, Int) = {
      val batch = cands.where(baseSlice1 < k || baseSlice2 < k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nb = batch.count()
      val t = System.nanoTime()
      val changed = Dedup.incrementalConnectedComponents(priorLabels, batch,
        changedOnly = true).count()
      val s = secs(t)
      batch.unpersist(blocking = true)
      (s, nb, changed, Dedup.lastCcRounds)
    }
    val (incFold1Secs, incBatch1, incChanged1, incRounds1) = ccFoldRun(1)
    val (incFold4Secs, incBatch4, incChanged4, incRounds4) = ccFoldRun(4)
    histPairs.unpersist(blocking = true)
    priorLabels.unpersist(blocking = true)

    // fixed-point PageRank at 2x over the directed candidate graph, with
    // the partitioning-invariance assertion (exact rank-multiset checksum)
    val prIters = 3
    def prChecksum(ranks: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      ranks.agg(sum(xxhash64(col("node"), col("rank")).cast("decimal(38,0)")))
        .head().getDecimal(0)
    val prEdges = cands.select(col("id1").as("src"), col("id2").as("dst"))
    val tPr = System.nanoTime()
    val pr = graft.operators.PageRank.pageRankFixedPoint(prEdges, prIters)
    val prNodes = pr.count()
    val prSecs = secs(tPr)
    val prHash = prChecksum(pr)
    val tPr2 = System.nanoTime()
    val pr2 = graft.operators.PageRank.pageRankFixedPoint(
      prEdges.repartition(13), prIters)
    val prHash2 = prChecksum(pr2)
    val prSecs2 = secs(tPr2)
    require(prHash == prHash2 && pr2.count() == prNodes,
      s"fixed-point PageRank diverged across partitionings: " +
        s"$prHash vs $prHash2")

    // label propagation / HITS / triangles over the same graph, with the
    // partitioning-invariance assertions (shared with the 544k bench)
    val graphJson = ScaleBench.graphSectionsJson(cands)
    cands.unpersist()

    val tWin = System.nanoTime()
    val nFps = corpus
      .select(col("doc_id"), lower(col("text")).as("__t"))
      .select(col("doc_id"),
        TextAnalysis.charGramHashes(col("__t"), k = 8).as("__g"))
      .select(col("doc_id"),
        explode(TextAnalysis.winnowingMinima(col("__g"), w = 4)).as("fp"))
      .count()
    val winSecs = secs(tWin)

    val tSim = System.nanoTime()
    val nSimPairs = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
      maxHamming = 3, maxBucketSize = Some(cap)).count()
    val simSecs = secs(tSim)
    val tSimC = System.nanoTime()
    val nSimCPairs = Dedup.simhashNearDupPairsCombined(corpus, "doc_id",
      "text", maxHamming = 3, chunks = 6, maxBucketSize = Some(cap)).count()
    val simCSecs = secs(tSimC)

    // the round-9 edit family at 988k — the VERDICT r9 ask: PassJoin was
    // only measured at 544k; near-linearity of segment blocking + the
    // native banded verify is the claim
    val tEdit = System.nanoTime()
    val editK = 4
    val nEditPairs = Dedup.editNearDupPairs(corpus, "doc_id", "text",
      k = editK, maxBucketSize = Some(cap)).count()
    val editSecs = secs(tEdit)

    // exact substring-span dedup (d89/d92) at 2x — the r16 verdict ask:
    // the 988k artifact carried no exspan section. The string tier pins
    // the semantics; the fingerprint tier (two salted xxhash64s over the
    // token slice — the 100 TB shuffle payload) must produce the
    // IDENTICAL cut lists, asserted by checksum at this scale too.
    def exSpanChecksum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(xxhash64(col("id"), col("span_start"), col("span_end"))
        .cast("decimal(38,0)"))).head().getDecimal(0)
    val tExSpan = System.nanoTime()
    val exSpans = Dedup.exactSpanCutLists(corpus, "doc_id", "text", k = 8)
    val exSpanRows = exSpans.count()
    val exSpanSecs = secs(tExSpan)
    val exSpanHash = exSpanChecksum(exSpans)
    val tExFp = System.nanoTime()
    val exSpansFp = Dedup.exactSpanCutLists(corpus, "doc_id", "text",
      k = 8, fingerprintGrams = true)
    val exSpanFpRows = exSpansFp.count()
    val exSpanFpSecs = secs(tExFp)
    require(exSpanChecksum(exSpansFp) == exSpanHash &&
        exSpanFpRows == exSpanRows,
      "988k: fingerprint-tier cut lists diverged from the string tier")

    // BPE trainer at 2x — distributed rounds (12) for the cross-scale
    // per-round cost, then the driver tier at a real merge count (256):
    // the vocab is replication-invariant (cold replicas add only " rev
    // N" suffix words), so both tiers' cost should read near-flat vs
    // the 544k artifact — state ∝ vocab is the claim.
    val tBpeW = System.nanoTime()
    val bpeWords = graft.llm.Bpe.wordCorpus(corpus.select(col("text")),
        "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bpeVocab = bpeWords.count()
    val bpeWordsSecs = secs(tBpeW)
    val tBpeT = System.nanoTime()
    val bpeMerges = graft.llm.Bpe.trainMerges(bpeWords, numMerges = 12)
    val bpeTrainSecs = secs(tBpeT)
    val tBpeA = System.nanoTime()
    val bpeMergesAuto = graft.llm.Bpe.trainMergesAuto(bpeWords,
      numMerges = 256)
    val bpeAutoSecs = secs(tBpeA)
    require(bpeMergesAuto.take(12) == bpeMerges,
      s"988k: driver-tier BPE diverged from the distributed tier: " +
        s"${bpeMergesAuto.take(12)} vs $bpeMerges")
    bpeWords.unpersist(blocking = true)

    // the round-11 exact set-sim family at 2x — gauge-then-join, the
    // ScaleBench recipe: the d75 cost gauge prices the cap-free pass on
    // the exact-deduped corpus (the full bound is in the hundreds of
    // billions here — the pass the gauge exists to refuse), then the
    // largest doc_id-block subset the gauge prices under ~300M
    // candidates is timed. Pairs/second is the claim; 988k vs 544k
    // pins the family's scaling like every other detector.
    val tSsGauge = System.nanoTime()
    val ssCorpusAll = Dedup.exactDedup(corpus, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ssCorpusAll.count()
    val ssCostFull = Dedup.setSimilarityJoinCost(ssCorpusAll, "doc_id",
      "text", thresholdNum = 7, thresholdDen = 10).head()
    val ssGaugeSecs = secs(tSsGauge)
    val ssBoundFull = ssCostFull.getLong(2)
    val ssMod = Seq(1L, 2L, 4L, 8L, 16L, 32L)
      .find(k => ssBoundFull / (k * k) <= 300000000L).getOrElse(64L)
    val ssCorpus = (if (ssMod == 1L) ssCorpusAll
      else ssCorpusAll.where(
        pmod((col("doc_id") / 100000).cast("long"), lit(ssMod)) === 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ssDocs = ssCorpus.count()
    val ssCostSub = Dedup.setSimilarityJoinCost(ssCorpus, "doc_id",
      "text", thresholdNum = 7, thresholdDen = 10).head()
    if (ssCostSub.getLong(2) > 300000000L)
      println(s"setsim subset bound OVERSHOOT: mod=$ssMod measured " +
        s"${ssCostSub.getLong(2)} candidates > 300000000 budget")
    val tSetSim = System.nanoTime()
    val setSimPairs = Dedup.setSimilarityJoin(ssCorpus, "doc_id",
      "text", thresholdNum = 7, thresholdDen = 10).count()
    val setSimSecs = secs(tSetSim)
    ssCorpus.unpersist(blocking = true)
    ssCorpusAll.unpersist(blocking = true)

    // lifecycle operators at 2x — the r10 verdict ask: the ∝-index
    // (takedown propagate vs rebuild) and ∝-batch (closed-form append)
    // claims were only measured at 544k. Same recipe as ScaleBench's
    // td/ap sections: BM25 snapshot at termBuckets=64, revoke 1%,
    // propagate vs re-index; build on 90%, append the 10% batch. The
    // copy-through file accounting (versionDiff) rides along.
    val tdStore = java.nio.file.Files
      .createTempDirectory("graft-td-988").toString + "/bm25"
    val tTdBuild = System.nanoTime()
    TextAnalysis.writeBm25Snapshot(corpus, tdStore, termBuckets = 64)
    val tdBuildSecs = secs(tTdBuild)
    val tdRevoked = corpus.where(col("doc_id") % 100 === 7)
      .select(col("doc_id"))
    val tdRevokedN = tdRevoked.count()
    val tTdProp = System.nanoTime()
    graft.llm.Takedown.propagateBm25Snapshot(spark, tdStore, tdRevoked,
      "doc_id")
    val tdPropSecs = secs(tTdProp)
    val tdRebuildStore = java.nio.file.Files
      .createTempDirectory("graft-td-988-rb").toString + "/bm25"
    val tTdRebuild = System.nanoTime()
    TextAnalysis.writeBm25Snapshot(
      graft.llm.Takedown.scrubCorpus(corpus, "doc_id", tdRevoked, "doc_id"),
      tdRebuildStore, termBuckets = 64)
    val tdRebuildSecs = secs(tTdRebuild)
    val (tdFc, tdBc, tdFw, tdBw) =
      ScaleBench.versionDiff(s"$tdStore/version=1", s"$tdStore/version=2")
    // manifest accounting: dirs the new version serves WITHOUT any
    // physical write or copy (files_copied reads ~0 by construction now;
    // inherited_dirs is where the untouched mass went)
    def inheritedDirs(store: String, v: Long): Int =
      graft.llm.LayoutStore.readManifest(
        spark.sparkContext.hadoopConfiguration, store, v)
        .map(_.count(_._2 < v)).getOrElse(0)
    val tdInherited = inheritedDirs(tdStore, 2L)

    val apStore = java.nio.file.Files
      .createTempDirectory("graft-ap-988").toString + "/bm25"
    val apBatch = corpus.where(col("doc_id") % 10 === 3)
    val apBatchN = apBatch.count()
    val tApBuild = System.nanoTime()
    TextAnalysis.writeBm25Snapshot(corpus.where(col("doc_id") % 10 =!= 3),
      apStore, termBuckets = 64)
    val apBuildSecs = secs(tApBuild)
    val tApMerge = System.nanoTime()
    graft.llm.Ingest.appendBm25Snapshot(spark, apStore, apBatch)
    val apMergeSecs = secs(tApMerge)
    val (apFc, apBc, apFw, apBw) =
      ScaleBench.versionDiff(s"$apStore/version=1", s"$apStore/version=2")
    val apInherited = inheritedDirs(apStore, 2L)

    // the ∝-batch day-partitioned append at 2x (one day into 64)
    val hconf = spark.sparkContext.hadoopConfiguration
    val apdStore = java.nio.file.Files
      .createTempDirectory("graft-apd-988").toString + "/store"
    val apdRows = corpus.select(col("doc_id").as("id"),
      (col("doc_id") % 64).cast("int").as("day"),
      length(col("text")).cast("long").as("nbytes"))
    graft.llm.LayoutStore.writeSnapshot(hconf, apdStore)(tmp =>
      apdRows.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    val apdBatchRows = (nDocs / 64).toInt
    val apdBatch = spark.range(apdBatchRows.toLong).select(
      (col("id") + lit(900000000L)).as("id"),
      lit(17).cast("int").as("day"),
      (col("id") * 37L % 997L).as("nbytes"))
    val tApd = System.nanoTime()
    graft.llm.Ingest.appendRowsSnapshot(spark, apdStore, apdBatch,
      "day", "id")
    val apdAppendSecs = secs(tApd)
    val (apdFc, apdBc, apdFw, apdBw) =
      ScaleBench.versionDiff(s"$apdStore/version=1", s"$apdStore/version=2")
    val apdInherited = inheritedDirs(apdStore, 2L)
    val apdRebuildStore = java.nio.file.Files
      .createTempDirectory("graft-apd-988-rb").toString + "/store"
    val tApdRb = System.nanoTime()
    graft.llm.LayoutStore.writeSnapshot(hconf, apdRebuildStore)(tmp =>
      apdRows.unionByName(apdBatch)
        .repartition(col("day")).write.partitionBy("day").parquet(tmp))
    val apdRebuildSecs = secs(tApdRb)

    val line =
      s"""{"metric":"scale_dedup_988","unit":"sec","sf":"$sfDir",""" +
      s""""docs":$nDocs,"gen_secs":$genSecs,""" +
      s""""exact_secs":$exactSecs,"exact_groups":$nExactGroups,""" +
      s""""lsh_secs":$lshSecs,"lsh_cands":$nCands,"bucket_cap":$cap,""" +
      s""""cc_secs":$ccSecs,"cc_clusters":$nClusters,"cc_nodes":$nClustered,""" +
      s""""cc_rounds":$ccRounds,""" +
      s""""inc_cc_prior_secs":$incPriorSecs,""" +
      s""""inc_cc_batch1_edges":$incBatch1,"inc_cc_fold1_secs":$incFold1Secs,""" +
      s""""inc_cc_changed1":$incChanged1,"inc_cc_rounds1":$incRounds1,""" +
      s""""inc_cc_batch4_edges":$incBatch4,"inc_cc_fold4_secs":$incFold4Secs,""" +
      s""""inc_cc_changed4":$incChanged4,"inc_cc_rounds4":$incRounds4,""" +
      s""""pagerank_secs":$prSecs,"pagerank_repart_secs":$prSecs2,""" +
      s""""pagerank_nodes":$prNodes,"pagerank_edges":$nCands,""" +
      s""""pagerank_iters":$prIters,""" +
      s""""pagerank_secs_per_round":${prSecs / prIters},""" +
      s""""pagerank_rank_hash":"$prHash",""" +
      graphJson +
      s""""winnow_secs":$winSecs,"winnow_fps":$nFps,""" +
      s""""simhash_secs":$simSecs,"simhash_pairs":$nSimPairs,""" +
      s""""simhash_comb_secs":$simCSecs,"simhash_comb_pairs":$nSimCPairs,""" +
      s""""edit_secs":$editSecs,"edit_pairs":$nEditPairs,"edit_k":$editK,""" +
      s""""exspan_secs":$exSpanSecs,"exspan_fp_secs":$exSpanFpSecs,""" +
      s""""exspan_rows":$exSpanRows,"exspan_hash":"$exSpanHash",""" +
      s""""bpe_vocab":$bpeVocab,"bpe_wordcount_secs":$bpeWordsSecs,""" +
      s""""bpe_train_secs":$bpeTrainSecs,"bpe_merges":${bpeMerges.size},""" +
      s""""bpe_auto_merges":${bpeMergesAuto.size},""" +
      s""""bpe_auto_secs":$bpeAutoSecs,""" +
      s""""bpe_auto_sec_per_merge":${bpeAutoSecs / math.max(1, bpeMergesAuto.size)},""" +
      s""""setsim_gauge_secs":$ssGaugeSecs,""" +
      s""""setsim_cand_bound_full":$ssBoundFull,"setsim_mod":$ssMod,""" +
      s""""setsim_docs":$ssDocs,""" +
      s""""setsim_cand_bound_sub":${ssCostSub.getLong(2)},""" +
      s""""setsim_secs":$setSimSecs,"setsim_pairs":$setSimPairs,""" +
      s""""td_build_secs":$tdBuildSecs,"td_prop_secs":$tdPropSecs,""" +
      s""""td_rebuild_secs":$tdRebuildSecs,"td_revoked_docs":$tdRevokedN,""" +
      s""""td_files_copied":$tdFc,"td_bytes_copied":$tdBc,""" +
      s""""td_inherited_dirs":$tdInherited,""" +
      s""""td_files_written":$tdFw,"td_bytes_written":$tdBw,""" +
      s""""ap_build90_secs":$apBuildSecs,"ap_merge_secs":$apMergeSecs,""" +
      s""""ap_batch_docs":$apBatchN,""" +
      s""""ap_files_copied":$apFc,"ap_bytes_copied":$apBc,""" +
      s""""ap_inherited_dirs":$apInherited,""" +
      s""""ap_files_written":$apFw,"ap_bytes_written":$apBw,""" +
      s""""apd_append_secs":$apdAppendSecs,"apd_rebuild_secs":$apdRebuildSecs,""" +
      s""""apd_batch_rows":$apdBatchRows,"apd_days":64,""" +
      s""""apd_files_copied":$apdFc,"apd_bytes_copied":$apdBc,""" +
      s""""apd_inherited_dirs":$apdInherited,""" +
      s""""apd_files_written":$apdFw,"apd_bytes_written":$apdBw,""" +
      s""""total_secs":${secs(t0)},""" +
      s""""provenance":${ScaleBench.provenanceJson()}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_BENCH_988.json"), line + "\n")
    spark.stop()
  }
}

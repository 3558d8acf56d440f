package graft

import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Adversarial-scale dedup bench — the closest local proxy for the 100TB
  * claim. Builds a duplicate-heavy corpus >=100x the sf0.1 documents table
  * with SKEWED near-dup clusters (every base doc replicated with a small
  * trailing edit; a few "boilerplate" docs replicated thousands of times —
  * the mega-cluster that turns naive LSH pairing quadratic), writes it as
  * parquet, then measures the production dedup surfaces over real scans:
  *
  *   - exact dedup (fingerprint groupBy) over the full corpus;
  *   - LSH candidate pairing WITH the bucket-size cap (hot boilerplate
  *     buckets are dropped from pairing — they're duplicate GROUPS, found
  *     in O(B) by the exact/keep-min path, not O(B^2) pair listing);
  *   - winnowing fingerprints (the chargram-md5 + codegen'd minima path).
  *
  * Emits one JSON line (and SCALE_BENCH.json) with corpus size, per-stage
  * seconds, and result cardinalities. Run:
  *   sbt "runMain graft.ScaleBench" (env: SPARK_GRAFT_SF_DIR, GRAFT_SCALE_COLD,
  *   GRAFT_SCALE_HOT to shrink for smoke runs)
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val coldReps = sys.env.getOrElse("GRAFT_SCALE_COLD", "60").toInt   // per ordinary doc
    val hotReps = sys.env.getOrElse("GRAFT_SCALE_HOT", "2500").toInt   // per boilerplate doc
    val spark = graft.core.GraftSession.local("graft-scale-bench")
    val t0 = System.nanoTime()
    def secs(since: Long): Double = (System.nanoTime() - since) / 1e9

    // ---- corpus build: one parquet table, skewed near-dup clusters ------
    val gen = System.nanoTime()
    // repartition the (small, single-file) base BEFORE the explode: the
    // 100x replication and everything downstream parallelizes over all
    // cores, and the corpus lands as enough files for parallel scans
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(64)
    // doc_id % 50 == 0 -> boilerplate: hotReps EXACT copies (the verbatim
    // mega-cluster exact dedup collapses in O(B) and the LSH cap keeps out
    // of O(B^2) pairing); other docs -> coldReps NEAR-dup replicas (a
    // trailing revision token differs, so replicas share all but the last
    // few shingles — jaccard ~0.9+, LSH's job)
    val replicated = base
      .withColumn("__hot", col("doc_id") % 50 === 0)
      .withColumn("__reps", when(col("__hot"), lit(hotReps)).otherwise(lit(coldReps)))
      .select(col("doc_id"), col("text"), col("__hot"),
        explode(sequence(lit(0), col("__reps") - 1)).as("rep"))
      .select((col("doc_id") * 100000 + col("rep")).as("doc_id"),
        when(col("__hot"), col("text"))
          .otherwise(concat(col("text"), lit(" rev "), col("rep").cast("string")))
          .as("text"))
    val corpusPath = java.nio.file.Files.createTempDirectory("graft-scale").toString + "/corpus"
    replicated.write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val nDocs = corpus.count()
    val genSecs = secs(gen)

    // ---- exact dedup: the O(B) path that owns the mega-clusters ---------
    val tExact = System.nanoTime()
    val nExactGroups = corpus
      .select(Dedup.exactKey(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .count()
    val exactSecs = secs(tExact)

    // ---- LSH candidates with the bucket cap -----------------------------
    val cap = 256
    val tLsh = System.nanoTime()
    val cands = Dedup.lshCandidatePairs(corpus, "doc_id", "text",
      maxBucketSize = Some(cap))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    val lshSecs = secs(tLsh)

    // ---- connected components over the multi-million-edge pair graph ----
    val tCc = System.nanoTime()
    val cc = Dedup.connectedComponents(cands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClusters = cc.select(col("cluster")).distinct().count()
    val nClustered = cc.count()
    val ccSecs = secs(tCc)
    cands.unpersist(); cc.unpersist()

    // ---- winnowing fingerprints (codegen'd chargram + minima) -----------
    val tWin = System.nanoTime()
    val nFps = corpus
      .select(col("doc_id"), lower(col("text")).as("__t"))
      .select(col("doc_id"), TextAnalysis.charGramHashes(col("__t"), k = 8).as("__g"))
      .select(col("doc_id"),
        explode(TextAnalysis.winnowingMinima(col("__g"), w = 4)).as("fp"))
      .count()
    val winSecs = secs(tWin)

    // ---- SimHash Hamming-band near-dups ----------------------------------
    // The pigeonhole detector over the same skewed corpus. Chunk keys have
    // only 2^16 values, so at this scale buckets FILL (the operator doc's
    // stated limit) — the cap is doing real work here, and the interesting
    // number is that the banded join stays bounded instead of quadratic.
    val tSim = System.nanoTime()
    val nSimPairs = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
      maxHamming = 3, maxBucketSize = Some(cap)).count()
    val simSecs = secs(tSim)

    // ---- incremental dedup: cost ∝ NEW-SHARD size, not corpus size ------
    // The cross-run mode: the full corpus's signature state is persisted
    // once (the amortized cost every run AVOIDS re-paying), then two new
    // shards — 1k and 4k docs, trailing-edited so they near-dup history —
    // are deduped against it. The shard-time ratio should track the shard
    // size ratio: the only O(history) work left is the slim band/fp hash
    // join (40-byte rows, no text), which at 100TB a state table bucketed
    // by band key turns into a co-located join.
    val tState = System.nanoTime()
    val statePath = corpusPath + "_sigstate"
    Dedup.writeSignatureState(
      Dedup.signatureState(corpus, "doc_id", "text"), statePath,
      mode = "overwrite")
    val stateSecs = secs(tState)
    val history = Dedup.readSignatureState(spark, statePath)
    def newShard(maxId: Int) = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < maxId)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" incr")).as("text"))
    def incRun(maxId: Int): (Double, Long) = {
      val t = System.nanoTime()
      val kept = Dedup.incrementalDedup(newShard(maxId), history,
        "doc_id", "text", threshold = 0.5, maxBucketSize = Some(cap))
        .where(col("keep")).count()
      (secs(t), kept)
    }
    val (incSecs1k, kept1k) = incRun(1000)
    val (incSecs4k, kept4k) = incRun(4000)

    val line =
      s"""{"metric":"scale_dedup","unit":"sec","sf":"$sfDir","docs":$nDocs,""" +
      s""""gen_secs":$genSecs,"exact_secs":$exactSecs,"exact_groups":$nExactGroups,""" +
      s""""lsh_secs":$lshSecs,"lsh_cands":$nCands,"bucket_cap":$cap,""" +
      s""""cc_secs":$ccSecs,"cc_clusters":$nClusters,"cc_nodes":$nClustered,""" +
      s""""winnow_secs":$winSecs,"winnow_fps":$nFps,""" +
      s""""simhash_secs":$simSecs,"simhash_pairs":$nSimPairs,""" +
      s""""sigstate_secs":$stateSecs,"inc_1k_secs":$incSecs1k,"inc_1k_kept":$kept1k,""" +
      s""""inc_4k_secs":$incSecs4k,"inc_4k_kept":$kept4k,"total_secs":${secs(t0)}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_BENCH.json"), line + "\n")
    spark.stop()
  }
}

package graft.examples

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation on the documents + embeddings
  * tables — the LLM-ops counterpart of IngestExample (same flow the
  * oracle-gated m14 query verifies, here in user-facing form):
  *
  *   1. quality gate (token count, uniqueness ratio, repetition
  *      signals) — all map-side;
  *   2. benchmark decontamination (persisted bench-key state);
  *   3. exact dedup (normalized-md5 fingerprint, min-id keeper);
  *   4. MinHash-LSH near-dup clustering, non-keepers dropped;
  *   5. deterministic mix sampling to a target language composition;
  *   6. winnowing-overlap cross-check (independent signal);
  *   7. embedding near-dup clusters (multi-probe SRP) on the vector side;
  *   8. curated corpus written with stats.
  *
  * Run: sbt "runMain graft.examples.CurationExample [sfDir] [outDir]"
  */
object CurationExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-curation").toString)
    val spark = graft.core.GraftSession.local("graft-curation-example")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = TextAnalysis.tokens(lower(col("text")))
    val qual = docs
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

    // decontamination: every ~97th doc plays the eval set; its shingle
    // keys persist once (cross-run state) and the corpus is screened
    Dedup.writeBenchKeys(docs.where(col("doc_id") % 97 === 0), "text",
      s"$outDir/bench_keys")
    val clean = qual.join(
      Dedup.contaminationFlagsAgainstKeys(qual,
          Dedup.readBenchKeys(spark, s"$outDir/bench_keys"), "doc_id", "text")
        .where(col("contaminated")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

    val exact = Dedup.exactDedup(clean, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearDrop = Dedup.nearDupClusters(exact, "doc_id", "text", threshold = 0.5)
      .where(!col("keep")).select(col("id").as("doc_id"))
    val deduped = exact.join(nearDrop, Seq("doc_id"), "left_anti")
    // deterministic mix: largest corpus at 50% en / 25% zh / 25% de
    val curated = graft.llm.Sampling.mixTake(deduped, "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    curated.write.mode("overwrite").parquet(s"$outDir/curated")

    // independent overlap signal on the curated set (audit, not a filter)
    val overlap = Dedup.winnowingOverlapPairs(curated, "doc_id", "text",
      minSim = 0.3, maxBucketSize = Some(64)).count()

    // embedding-side near-dup clusters
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embClusters = Dedup.connectedComponents(
      Similarity.embeddingNearDups(emb, threshold = 0.40, dim = 64))
      .count()

    val total = docs.count(); val kept = curated.count()
    println(s"[curation-example] input=$total quality+deduped=$kept " +
      s"residual_overlap_pairs=$overlap embedding_cluster_members=$embClusters out=$outDir")
    spark.stop()
  }
}

package graft.examples

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation on the documents + embeddings
  * tables — the LLM-ops counterpart of IngestExample (same flow the
  * oracle-gated m14 query verifies, here in user-facing form):
  *
  *   1. quality gate (token count, uniqueness ratio) — map-side;
  *   2. exact dedup (normalized-md5 fingerprint, min-id keeper);
  *   3. MinHash-LSH near-dup clustering, non-keepers dropped;
  *   4. winnowing-overlap cross-check (independent signal);
  *   5. embedding near-dup clusters (multi-probe SRP) on the vector side;
  *   6. curated corpus written with stats.
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
    val exact = Dedup.exactDedup(qual, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearDrop = Dedup.nearDupClusters(exact, "doc_id", "text", threshold = 0.5)
      .where(!col("keep")).select(col("id").as("doc_id"))
    val curated = exact.join(nearDrop, Seq("doc_id"), "left_anti")
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

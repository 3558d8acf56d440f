package graft.llm

import graft.{SparkEntry, SparkTestBase}

/** Session-hygiene contract for the dedup/similarity operators: every
  * operator-scoped persist (band / shingle / fingerprint / hashed-vector
  * frames, fork tags, signature-state spines) is released before the
  * operator returns — a long-lived session running many pipelines must
  * not accumulate storage blocks (round-5 verdict's top item: the bench
  * had to reset ALL storage between queries to survive its own suite).
  *
  * The chain below runs every query whose operators persist intermediates,
  * on one shared session, and asserts no persistent RDDs remain. A
  * checkpoint dir is set so `Dedup.truncateFrame`'s eager materialization
  * goes through the reliable FS-backed checkpoint (no storage-pool
  * blocks); without one, localCheckpoint blocks of the small RESULT
  * frames linger until GC (ContextCleaner) — intermediates are released
  * either way.
  */
class CacheHygieneSpec extends SparkTestBase {

  test("dedup/similarity/fork query chain leaves no persisted blocks") {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(tmpDir("hygiene-ckpt"))
    // pin the reliable path explicitly: DedupSpec's checkpoint test leaves
    // the opt-out set on the shared session, and suite order is arbitrary
    spark.conf.set("graft.cc.reliableCheckpoint", "true")
    // tolerate blocks leaked by OTHER suites sharing this session: only
    // RDDs persisted DURING the chain may not survive it
    val before = sc.getPersistentRDDs.keySet
    val dir = "/root/testdata/sf0.001"
    val chain = Seq(
      "d04_lsh_neardups", "d06_ngram_jaccard", "d08_minhash_estimate",
      "d09_dedup_clusters", "d10_winnow_overlap", "d11_incremental_dedup",
      "d12_string_clusters", "d14_simhash_neardups", "m14_curation_pipeline",
      "s05_embedding_neardups", "s06_embedding_clusters", "m06_fork_streams")
    val counts = chain.map { q =>
      q -> SparkEntry.queries(q)(spark, dir).count()
    }.toMap
    // sanity: the chain did real work (hash-level parity is the oracle
    // gate's job; this guards against a silently-empty eager pipeline)
    assert(counts("d04_lsh_neardups") > 0, s"d04 empty: $counts")
    assert(counts("m14_curation_pipeline") > 0, s"m14 empty: $counts")
    assert(counts("m06_fork_streams") == 3, s"m06: $counts")
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"operators leaked persisted RDDs: ${leaked.toSeq.sorted.map(id =>
        sc.getPersistentRDDs(id).toString)}")
  }

  test("nearDupPairs alone releases its caches (unit-level, no query harness)") {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(tmpDir("hygiene-ckpt"))
    spark.conf.set("graft.cc.reliableCheckpoint", "true")
    val before = sc.getPersistentRDDs.keySet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
    assert(pairs.count() > 0)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"nearDupPairs leaked: $leaked")
  }

  test("recall gauges release their truncated pair intermediates (local-checkpoint path)") {
    val sc = spark.sparkContext
    // force the LOCAL checkpoint path: truncateFrame then persists each
    // frame's RDD, which is exactly the storage releaseTruncated must
    // free (the reliable path holds files, not blocks)
    spark.conf.set("graft.cc.reliableCheckpoint", "false")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val before = sc.getPersistentRDDs.keySet
      val r1 = Dedup.lshRecallGauge(docs, "doc_id", "text", threshold = 0.5)
      assert(r1.count() == 1)
      // only the RETURNED result frame's checkpoint blocks may survive;
      // the truth/found intermediates must not (pre-fix: 3 survivors)
      val leak1 = sc.getPersistentRDDs.keySet -- before
      assert(leak1.size <= 1, s"lshRecallGauge left intermediates: $leak1")
      val before2 = sc.getPersistentRDDs.keySet
      val r2 = Dedup.simhashRecallGauge(docs, "doc_id", "text")
      assert(r2.count() == 2)
      val leak2 = sc.getPersistentRDDs.keySet -- before2
      assert(leak2.size <= 1, s"simhashRecallGauge left intermediates: $leak2")
    } finally spark.conf.set("graft.cc.reliableCheckpoint", "true")
  }

  test("spreadForCompute probes only scan-rooted plans; shuffle-bearing frames fall through") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // scan-rooted narrow chain over one small file: 1 partition < cores,
    // so the spread fires
    val spreadScan = Dedup.spreadForCompute(
      docs.select(col("doc_id"), col("text")).where(col("doc_id").isNotNull))
    assert(spreadScan.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // shuffle-bearing plan (aggregate): returned UNCHANGED — probing it
    // would materialize the upstream query stages under AQE (ADVICE r17)
    val agg = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    assert(Dedup.spreadForCompute(agg) eq agg)
    // a join is likewise not scan-rooted
    val joined = docs.join(agg, Seq("source"))
    assert(Dedup.spreadForCompute(joined) eq joined)
  }
}

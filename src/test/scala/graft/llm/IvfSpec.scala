package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ivfTopK structure: k per query, no self-pairs, ranks 1..k") {
    val queries = emb.filter(col("vec_id") < 5)
    val out = Similarity.ivfTopK(emb, queries, k = 3, nlist = 8, nprobe = 2).cache()
    assert(out.where(col("query_id") === col("corpus_id")).count() == 0)
    val perQ = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQ.forall(_ <= 3))
    assert(out.where(col("rank") < 1 || col("rank") > 3).count() == 0)
    out.unpersist()
  }

  test("writeIvfLayout: probe read prunes cell partitions at the source") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = tmpDir("ivf-layout") + "/corpus"
    val cents = Similarity.fitCentroids(emb, nlist = 8)
    Similarity.writeIvfLayout(emb, cents, path)
    val cellDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.length > 2, s"expected multiple cell partitions, got ${cellDirs.toSeq}")
    // layout parity: partition-derived cells re-aggregate to the same
    // assignment the in-memory path computes
    val full = spark.read.parquet(path)
    assert(full.count() == emb.count())
    val probe = Similarity.readIvfCells(spark, path, Seq(0, 1))
    val scan = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // the cell filter must prune at the FILE LISTING level: only the two
    // probed partition directories are selected, everything else is
    // never read (nprobe/nlist of the corpus touched — the 100TB win)
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned partitions, scanned ${scan.selectedPartitions.partitionCount}")
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("cell"),
      "cell filter did not register as a partition filter")
  }

  test("IVF-PQ layout: codes-only schema on disk (no vectors), probe read " +
    "prunes cell partitions, ADC over pruned codes == ADC over the same " +
    "cells in memory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = tmpDir("ivfpq-layout") + "/corpus"
    val cents = Similarity.fitCentroids(emb, nlist = 8)
    val cbs = Similarity.fitPqCodebooks(emb, m = 4, ksub = 8, dim = 64)
    val coded = Similarity.withPqCodes(
      emb.select(col("vec_id"), col("embedding")), cbs, "embedding")
    Similarity.assignCells(coded, cents, "embedding").drop("embedding")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // codes-only on disk: id + m code columns + the cell partition key
    val full = spark.read.parquet(path)
    assert(full.columns.toSet ==
      Set("vec_id", "__c0", "__c1", "__c2", "__c3", "cell"),
      s"raw vectors must not persist: ${full.columns.toSeq}")
    assert(full.count() == emb.count())
    val probe = Similarity.readIvfCells(spark, path, Seq(0, 1))
    val scan = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned partitions, scanned ${scan.selectedPartitions.partitionCount}")
    // ADC over the pruned read == ADC over the equivalent in-memory slice
    val queries = emb.filter(col("vec_id") === 0)
    val inMem = Similarity.assignCells(coded, cents, "embedding")
      .where(col("cell").isin(0, 1))
    def res(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopKOnCodes(d, queries, k = 5, cbs)
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(res(probe) == res(inMem))
  }

  test("trained-int8 IVF layout: codebook JSON roundtrips; the snapshot " +
    "probe equals the in-flight probe bit-for-bit; the frozen-codebook " +
    "append lands only touched cells and equals a from-scratch layout " +
    "over the union") {
    val cb = Array(Array(1L, -2L, 3L), Array(-128L, 0L, 127L))
    assert(Similarity.parseCodebook(Similarity.codebookJson(cb))
      .map(_.toSeq).toSeq == cb.map(_.toSeq).toSeq)
    val conf = spark.sparkContext.hadoopConfiguration
    val path = tmpDir("ivf8-trained") + "/layout"
    val even = emb.where(col("vec_id") % 2 === 0)
    val odd = emb.where(col("vec_id") % 2 === 1)
    val cents = Similarity.fitKmeansInt8(even, k = 4, iters = 2)
    Similarity.writeIvfInt8TrainedLayout(even, cents, path)
    assert(Similarity.readIvfInt8Codebook(conf, path)
      .map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq,
      "the store must serve back the exact frozen codebook")
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // snapshot probe == in-flight probe over the same corpus/codebook
    assert(rows(Similarity.ivfTopKQuantizedSnapshot(spark, path, queries,
        k = 5, nprobe = 2)) ==
      rows(Similarity.ivfTopKQuantizedTrained(even, queries, k = 5,
        cents, nprobe = 2)))
    // single-vector append: codebook comes from the STORE; exactly ONE
    // cell lands physically, every other cell carries by manifest
    Ingest.appendIvfInt8TrainedSnapshot(spark, path,
      odd.where(col("vec_id") === 1))
    assert(Similarity.readIvfInt8Codebook(conf, path)
      .map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq,
      "append must re-stamp the SAME codebook, never retrain")
    val manifest = LayoutStore.readManifest(conf, path, 2L).get
    val v2Dirs = new java.io.File(s"$path/version=2").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(v2Dirs.length == 1,
      s"a one-vector append must land exactly one cell: ${v2Dirs.toSeq}")
    val v1Dirs = new java.io.File(s"$path/version=1").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(manifest.collect { case (k, 1L) if k.startsWith("cell=") => k }
      .toSet == (v1Dirs.toSet -- v2Dirs.toSet),
      s"untouched cells must carry by manifest: $manifest")
    // grow to the full corpus, then: snapshot probe == the in-flight
    // probe over the union with the SAME frozen codebook
    Ingest.appendIvfInt8TrainedSnapshot(spark, path,
      odd.where(col("vec_id") =!= 1))
    assert(rows(Similarity.ivfTopKQuantizedSnapshot(spark, path, queries,
        k = 5, nprobe = 2)) ==
      rows(Similarity.ivfTopKQuantizedTrained(emb, queries, k = 5,
        cents, nprobe = 2)))
    // the probe's corpus read partition-prunes to the probed cells —
    // the same pruned read ivfTopKQuantizedSnapshot constructs
    import org.apache.spark.sql.execution.FileSourceScanExec
    val pruned = LayoutStore.readSnapshotTable(spark, path)
      .where(col("cell").isin(0, 1))
    val scanned = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount
    }.sum
    assert(scanned <= 2,
      s"cell IN must prune at the file listing, scanned $scanned partitions")
    // a non-trained layout fails descriptively
    val plain = tmpDir("ivf8-plain") + "/layout"
    LayoutStore.writeSnapshot(conf, plain) { tmp =>
      even.limit(2).write.parquet(tmp)
    }
    val e = intercept[IllegalArgumentException](
      Similarity.readIvfInt8Codebook(conf, plain))
    assert(e.getMessage.contains("_codebook"))
  }

  test("ivfTopK recall vs brute force improves with nprobe") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val approx = Similarity.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = nprobe)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val r2 = recall(2)
    val rFull = recall(16)
    assert(rFull > 0.99, s"nprobe=nlist must be exhaustive (recall $rFull)")
    assert(r2 <= rFull)
    assert(r2 > 0.2, s"nprobe=2 recall unreasonably low: $r2")
  }
}

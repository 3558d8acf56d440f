package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Sinks. Everything is `df.write` with scale-aware options; no per-record
  * driver code anywhere (the reference's sample-100-rows-then-repartition
  * sizing — FileSink.java:209-280 — is replaced by maxRecordsPerFile /
  * AQE, which sizes output files without collecting data to the driver).
  */
object Sinks {

  /** File sink (csv/json/parquet) — reference common/sinks/file/FileSink.java.
    * Header-per-file comes from the datasource (`option("header")`), not a
    * mapPartitions trick; target file size via maxRecordsPerFile instead of
    * driver-side sampling. Writing to s3a:// paths subsumes AwsFileSink's
    * manual TransferManager upload (AwsFileSink.java:105-173).
    */
  final case class FileSinkConfig(
      format: String = "parquet",           // parquet | csv | json
      mode: SaveMode = SaveMode.Overwrite,
      header: Boolean = true,               // csv only
      compression: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Option[Long] = None,
      separator: Option[String] = None)

  def writeFile(df: DataFrame, path: String, cfg: FileSinkConfig = FileSinkConfig()): Unit = {
    var w = df.write.mode(cfg.mode)
    if (cfg.format == "csv") w = w.option("header", cfg.header.toString)
    cfg.compression.foreach(c => w = w.option("compression", c))
    cfg.separator.foreach(s => w = w.option("sep", s))
    cfg.maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    w.format(cfg.format).save(path)
  }

  /** Sequence-file sink (key/value Text pairs, optional compression) —
    * reference FileSink.java:155-181 (`saveAsNewAPIHadoopFile` with
    * SequenceFileOutputFormat + LZ4). Distributed write, no driver data
    * path; keys default to a configurable column rendered as text.
    */
  def writeSequenceFile(df: DataFrame, path: String, keyCol: String, valueCol: String,
                        compressionCodec: Option[String] = Some("org.apache.hadoop.io.compress.Lz4Codec")): Unit = {
    import org.apache.hadoop.io.Text
    import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    compressionCodec.foreach { c =>
      conf.set("mapreduce.output.fileoutputformat.compress", "true")
      conf.set("mapreduce.output.fileoutputformat.compress.type", "BLOCK")
      conf.set("mapreduce.output.fileoutputformat.compress.codec", c)
    }
    val ki = df.schema.fieldIndex(keyCol)
    val vi = df.schema.fieldIndex(valueCol)
    df.rdd
      .map(r => (new Text(String.valueOf(r.get(ki))), new Text(String.valueOf(r.get(vi)))))
      .saveAsNewAPIHadoopFile(path, classOf[Text], classOf[Text],
        classOf[SequenceFileOutputFormat[Text, Text]], conf)
  }

  /** Error-table sink preserving the reference's public error schema
    * (utilities/ErrorTableUtil.java:93-190): row_key, source_data, exception,
    * changelog_columns, app_id — written date-partitioned for retention. */
  def writeErrorTable(errors: DataFrame, path: String, appId: String,
                      rowKeyCol: String, errorCol: String = "error_message"): Unit = {
    val shaped = errors.select(
      col(rowKeyCol).cast("string").as("row_key"),
      to_json(struct(errors.columns.filter(_ != errorCol).map(col).toIndexedSeq: _*)).as("source_data"),
      col(errorCol).as("exception"),
      lit("").as("changelog_columns"),
      lit(appId).as("app_id"),
      current_date().as("error_date"))
    shaped.write.mode(SaveMode.Append).partitionBy("error_date").parquet(path)
  }

  /** Hudi sink option mapping — reference HoodieSink op modes
    * (common/sinks/hoodie/HoodieSink.java:409-444,533-546). The engine maps
    * each mode onto the Hudi Spark datasource; DEDUP_* become either Hudi's
    * own insert-dedup or an explicit left_anti against existing keys
    * (HoodieSink.java:426-449). Format-string based: compiles and runs
    * wherever the Hudi bundle is on the classpath.
    */
  sealed trait HudiOp { def value: String; def dropDupes: Boolean = false }
  case object Insert extends HudiOp { val value = "insert" }
  case object BulkInsert extends HudiOp { val value = "bulk_insert" }
  case object Upsert extends HudiOp { val value = "upsert" }
  case object DedupInsert extends HudiOp { val value = "insert"; override val dropDupes = true }
  case object DedupBulkInsert extends HudiOp { val value = "bulk_insert"; override val dropDupes = true }

  def hudiOptions(table: String, recordKey: String, partitionPath: String,
                  op: HudiOp, extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "hoodie.table.name" -> table,
      "hoodie.datasource.write.recordkey.field" -> recordKey,
      "hoodie.datasource.write.partitionpath.field" -> partitionPath,
      "hoodie.datasource.write.operation" -> op.value,
      "hoodie.datasource.write.insert.drop.duplicates" -> op.dropDupes.toString,
    ) ++ extra

  def writeHudi(df: DataFrame, path: String, opts: Map[String, String]): Unit =
    df.write.format("hudi").options(opts).mode(SaveMode.Append).save(path)

  /** Two-phase-commit publish: atomically rename a staged output directory
    * to its published path through the Hadoop FileSystem API — atomic on
    * HDFS and correct on any HCFS, where java.io.File.renameTo silently
    * fails (same primitive RunState's checkpoint commit uses). Fails loudly
    * if the destination exists or the rename is refused. */
  def publishRename(spark: org.apache.spark.sql.SparkSession,
                    stagingPath: String, publishPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(publishPath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(dst), s"publish target already exists: $publishPath")
    require(fs.rename(new Path(stagingPath), dst),
      s"publish rename failed: $stagingPath -> $publishPath")
  }

  /** Explicit anti-join dedup against an existing dataset's keys — the
    * DEDUP_INSERT semantics (HoodieSink.java:426-433) expressed as a Spark
    * plan. `existingKeys` is typically a key-only projection of the target
    * table (column-pruned scan); Catalyst broadcast-joins it when small. */
  def dedupAgainstExisting(incoming: DataFrame, existingKeys: DataFrame,
                           keyCols: Seq[String]): DataFrame =
    incoming.join(existingKeys.select(keyCols.map(col).toIndexedSeq: _*).distinct(),
      keyCols, "left_anti")

  /** Estimated serialized size of a Bloom filter sized for `n` keys at
    * `fpp` — the textbook optimal bit count m = -n*ln(p)/ln(2)^2, in
    * bytes. ~1.2 bytes/key at 1% fpp: 10^8 keys ≈ 120 MB, 10^9 ≈ 1.2 GB. */
  def bloomFilterBytes(n: Long, fpp: Double): Long =
    (-n * math.log(fpp) / (math.log(2) * math.log(2)) / 8).toLong

  /** Bloom-prefiltered [[dedupAgainstExisting]] — the 100TB shape of
    * dedup-against-target: a Bloom filter of the existing keys (built
    * once, `expectedItems`/`fpp` sized, shipped as a BROADCAST variable
    * probed by the codegen'd [[graft.functions.BloomContains]]) splits
    * the batch MAP-SIDE into definitely-new rows (bloom-negative — no
    * false negatives, they bypass the join entirely) and candidates
    * (bloom-positive), and only the candidates — true duplicates plus an
    * `fpp` sliver of false positives — pay the exact anti-join. Against
    * a multi-TB target where the incoming batch is mostly new, the
    * anti-join's batch-side input shrinks from |batch| to ~|duplicates|.
    * Result is EXACTLY dedupAgainstExisting's (false positives are
    * re-verified by the join; null keys keep anti-join semantics: never
    * equal, so kept).
    *
    * Size bound: the filter costs `bloomFilterBytes(expectedItems, fpp)`
    * ≈ -n*ln(fpp)/ln(2)^2/8 on the driver (once, transiently at build)
    * and per executor (once, torrent-fetched) — NOT per task and NOT in
    * the plan. The `maxFilterBytes` guard (default 256 MB ≈ 2*10^8 keys
    * at 1% fpp) fails fast instead of silently OOMing; raise it
    * deliberately on drivers/executors sized for it, or shard the key
    * space upstream.
    *
    * `pruneExistingByCandidates` is the scan-side win regime: when the
    * batch is known MOSTLY NEW (candidates ≈ dupes + fpp*|batch|, small),
    * the distinct candidate keys are broadcast to semi-prune the huge
    * existing side map-side — existing never shuffles (only rows whose
    * key is in the tiny candidate set survive the scan), and the residual
    * anti-join broadcasts those survivors back. Total shuffle: the
    * candidate-key distinct, O(|candidates|) — vs BOTH full sides for
    * the plain anti-join. Do NOT enable when a large batch may be mostly
    * duplicates: the candidate broadcast would then be O(|batch|). The
    * `maxCandidateBroadcastBytes` guard (symmetric to `maxFilterBytes`)
    * backstops exactly that misuse: when the candidate-key frame's
    * Catalyst plan-stats bound exceeds it, the call FALLS BACK to the
    * plain anti-join (identical result, shuffle instead of broadcast)
    * and logs a warning — a mis-predicted batch degrades to the safe
    * plan instead of OOMing the driver/executors. Without CBO the bound
    * is the filtered batch's size (an overestimate of the distinct
    * keys), so the fallback errs conservative; raise the threshold
    * deliberately when the batch side is known small.
    *
    * `incoming` is consumed by both branches of the split (three times
    * with the prune on) — persist it first if it is an expensive
    * derivation rather than a cheap scan (the trade is deliberate:
    * map-side re-scans of the batch cost far less at scale than
    * shuffling the whole batch through the anti-join, which a
    * single-pass join-condition formulation would). */
  def bloomDedupAgainstExisting(incoming: DataFrame, existingKeys: DataFrame,
                                keyCol: String, expectedItems: Long,
                                fpp: Double = 0.01,
                                pruneExistingByCandidates: Boolean = false,
                                maxFilterBytes: Long = 256L << 20,
                                maxCandidateBroadcastBytes: Long = 64L << 20): DataFrame = {
    val estBytes = bloomFilterBytes(expectedItems, fpp)
    require(estBytes <= maxFilterBytes,
      s"bloom filter for expectedItems=$expectedItems at fpp=$fpp is ~$estBytes " +
        s"bytes > maxFilterBytes=$maxFilterBytes (driver + per-executor " +
        "allocation) — raise maxFilterBytes deliberately or shard the key space")
    // empty (or all-null) existing keys: bloom_filter_agg yields a null
    // filter and stat.bloomFilter NPEs — the answer is just "everything
    // is new", matching dedupAgainstExisting on an empty right side
    if (existingKeys.where(col(keyCol).isNotNull).limit(1).isEmpty)
      return incoming
    val bf = existingKeys.stat.bloomFilter(keyCol, expectedItems, fpp)
    bloomDedupAgainstExisting(incoming, existingKeys, keyCol, bf,
      pruneExistingByCandidates, maxCandidateBroadcastBytes)
  }

  /** Pre-built-filter form of [[bloomDedupAgainstExisting]] — the
    * STEADY-STATE ingestion shape: the target table's filter is built
    * once (or maintained incrementally as batches commit) and reused
    * across every incoming batch, so the per-batch cost is just the
    * map-side probe plus the residual join. CORRECTNESS CONTRACT: the
    * filter must cover a SUPERSET of `existingKeys`' non-null keys — a
    * bloom-negative row skips the exact join entirely, so a key the
    * filter has never seen but the table holds would wrongly pass as
    * new. Covering extra keys is always safe (false positives are
    * re-verified by the join). In incremental ingestion, `putString`
    * each committed batch's keys into the filter (Spark's sketch
    * supports incremental put + mergeInPlace) BEFORE the next batch, or
    * rebuild on a schedule and pass the matching table snapshot. The
    * sibling overload builds the filter per call — the one-shot shape;
    * at N batches per target it pays the O(|existing|) build N times
    * for no reason. */
  def bloomDedupAgainstExisting(incoming: DataFrame, existingKeys: DataFrame,
                                keyCol: String,
                                filter: org.apache.spark.util.sketch.BloomFilter,
                                pruneExistingByCandidates: Boolean,
                                maxCandidateBroadcastBytes: Long): DataFrame = {
    val bc = incoming.sparkSession.sparkContext.broadcast(filter)
    val contains = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.BloomContains(
        org.apache.spark.sql.GraftColumnBridge.expression(col(keyCol)), bc))
    // null keys: contains is null; coalesce routes them to the fast path,
    // matching left_anti (null never equals an existing key -> row kept)
    val definitelyNew = incoming.where(!coalesce(contains, lit(false)))
    val candidates = incoming.where(coalesce(contains, lit(false)))
    // candidates are non-null by construction (nulls took the fast
    // path), so equality semantics need no null handling here
    val candKeys = candidates.select(col(keyCol)).distinct()
    val candBytes = candKeys.queryExecution.optimizedPlan.stats.sizeInBytes
    val pruneSafe = candBytes <= BigInt(maxCandidateBroadcastBytes)
    if (pruneExistingByCandidates && !pruneSafe)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"bloomDedupAgainstExisting: candidate-key plan-stats bound $candBytes B " +
          s"exceeds maxCandidateBroadcastBytes=$maxCandidateBroadcastBytes — " +
          "falling back to the plain anti-join (identical result); the batch " +
          "is too large/duplicate-heavy for the candidate-broadcast prune")
    val residual =
      if (!pruneExistingByCandidates || !pruneSafe)
        dedupAgainstExisting(candidates, existingKeys, Seq(keyCol))
      else {
        val survivors = existingKeys.select(col(keyCol))
          .join(broadcast(candKeys), Seq(keyCol), "left_semi").distinct()
        candidates.join(broadcast(survivors), Seq(keyCol), "left_anti")
      }
    definitelyNew.unionByName(residual)
  }

  /** Bucketed table write: pre-shuffles once at write time so every later
    * equi-join/aggregation on the bucket keys is SHUFFLE-FREE (bucket
    * co-location — what the reference approximated with hand-balanced
    * partitioning). At 100TB, paying one shuffle at ingest instead of one
    * per downstream join is the single biggest join optimization
    * available; pick numBuckets ~ cluster cores at target scale. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    format: String = "parquet",
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "at least one bucket column required")
    var w = df.write.format(format).mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Cassandra sink option mapping (reference CassandraClientSink /
    * CassandraSSTableSink) for the spark-cassandra-connector datasource.
    * Batching/sorting knobs map to connector output options; the bespoke
    * SSTable streaming path is intentionally not reproduced (see SURVEY §7.4).
    */
  def cassandraOptions(keyspace: String, table: String,
                       ttlSeconds: Option[Long] = None,
                       writeTimestampMicros: Option[Long] = None): Map[String, String] =
    Map("keyspace" -> keyspace, "table" -> table) ++
      ttlSeconds.map("spark.cassandra.output.ttl" -> _.toString) ++
      writeTimestampMicros.map("spark.cassandra.output.timestamp" -> _.toString)

  def writeCassandra(df: DataFrame, opts: Map[String, String]): Unit =
    df.write.format("org.apache.spark.sql.cassandra").options(opts)
      .mode(SaveMode.Append).save()

  /** Batched, rate-paced writes — the reference's Cassandra batch mode
    * (CassandraSSTableSink.java:155-205): slice the dataset into
    * ceil(n / recordsPerBatch) chunks by global row index, write chunks
    * sequentially, and sleep so each batch takes at least
    * `minBatchMillis` (protects a receiving store from sustained
    * full-throughput streaming). The input materializes once (DISK_ONLY,
    * like the reference's fork) so N batch filters don't re-run the
    * upstream plan. Returns the number of batches written. */
  def writeInBatches(df: DataFrame, recordsPerBatch: Long, minBatchMillis: Long = 0L)
                    (writeBatch: (DataFrame, Long) => Unit): Long = {
    require(recordsPerBatch > 0, s"recordsPerBatch must be positive: $recordsPerBatch")
    // Global contiguous index WITHOUT an RDD detour: persist once with a
    // monotonic id (partitionId << 33 | rowInPartition), aggregate tiny
    // per-partition counts, and turn the id into a contiguous index via a
    // literal offset lookup — everything stays columnar/Tungsten, and the
    // only extra job is the O(#partitions)-row count (zipWithIndex spent a
    // full pass over unpersisted data AND exited whole-stage codegen).
    val withId = df.withColumn("__graft_mid", monotonically_increasing_id())
      .persist(StorageLevel.DISK_ONLY)
    try {
      val pid = shiftright(col("__graft_mid"), 33)
      val rowInPart = col("__graft_mid").bitwiseAND(lit((1L << 33) - 1))
      val partCounts = withId.groupBy(pid.as("__pid"))
        .agg(count(lit(1)).as("__n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val total = partCounts.values.sum
      val nBatches = (total + recordsPerBatch - 1) / recordsPerBatch
      // offsets(p) = rows in partitions before p (absent partitions = 0)
      val maxPid = if (partCounts.isEmpty) 0L else partCounts.keys.max
      val offsets = new Array[Long](maxPid.toInt + 1)
      var acc = 0L
      for (p <- 0 to maxPid.toInt) {
        offsets(p) = acc; acc += partCounts.getOrElse(p.toLong, 0L)
      }
      // floor+cast: Column./ is double division (exact below 2^53 rows,
      // made integral explicitly)
      val batchCol = floor((element_at(typedLit(offsets.toSeq), (pid + 1).cast("int"))
        + rowInPart) / recordsPerBatch).cast("long")
      var b = 0L
      while (b < nBatches) {
        val t0 = System.nanoTime()
        writeBatch(withId.filter(batchCol === b).drop("__graft_mid"), b)
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        if (b < nBatches - 1 && elapsedMs < minBatchMillis)
          Thread.sleep(minBatchMillis - elapsedMs)
        b += 1
      }
      nBatches
    } finally { withId.unpersist(); () }
  }

  /** Sorted bulk write: range-partition + sort within partitions by the
    * composite (partition keys ++ clustering keys) — the Spark equivalent of
    * the SSTable global sort (CassandraSSTableSink.java:262-318) and the Hudi
    * bulk-insert sort partitioner (DefaultHoodieDataPartitioner.java:34-38).
    * repartitionByRange samples the keys (distributed) and produces
    * non-overlapping sorted partitions — exactly what sorted bulk loaders
    * want, with no driver-side work. */
  def sortedForBulkLoad(df: DataFrame, sortCols: Seq[String],
                        numPartitions: Option[Int] = None): DataFrame = {
    val cols = sortCols.map(col)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, cols: _*)
      case None    => df.repartitionByRange(cols: _*)
    }
    ranged.sortWithinPartitions(cols: _*)
  }
}

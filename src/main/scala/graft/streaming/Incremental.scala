package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming surface. The reference's incremental-batch model (work-unit
  * calculator + checkpointed offsets, SURVEY §2.12) is exactly Structured
  * Streaming with Trigger.AvailableNow: each invocation processes what
  * accumulated since the checkpoint, then stops; offsets live in the
  * checkpoint dir with the same "advance only on success" semantics as the
  * reference's metadata managers.
  */
object Incremental {

  /** Run `startQuery` against a session whose
    * `spark.sql.shuffle.partitions` is scoped to `n` — the
    * STATE-PARTITION sizing knob for stateful streams. Every stateful
    * operator materializes one state-store instance per shuffle
    * partition PER MICRO-BATCH (a stream-stream join keeps four), so
    * the partition count must track STATE VOLUME, not the box's core
    * count: a 100 TB keyspace sizes UP (state per store must fit an
    * executor), a small-keyspace stream sizes DOWN (at the session
    * default of one-per-core, store open/commit overhead dominates —
    * the m47/m50 fixtures ran 3x slower at 32 than at 8).
    *
    * The override lives on a CLONED session (cloneSession copies the
    * runtime conf; the stream builds and starts entirely on the
    * clone, which pins the value into the checkpoint's offset
    * metadata) — the caller's session is never touched, so a query
    * started concurrently on it cannot inherit the scoped value and
    * two concurrent scoped starts cannot race on a restore. */
  private def withStatePartitions[T](spark: SparkSession, n: Option[Int])
                                    (startQuery: SparkSession => T): T =
    n match {
      case None => startQuery(spark)
      case Some(p) =>
        require(p >= 1, s"stateShufflePartitions must be >= 1: $p")
        val scoped = org.apache.spark.sql.GraftSessionBridge.cloneSession(spark)
        scoped.conf.set("spark.sql.shuffle.partitions", p.toString)
        startQuery(scoped)
    }

  /** Incremental file-source pipeline: process-available-then-stop. */
  def runAvailableNow(spark: SparkSession, sourceDir: String, schema: StructType,
                      format: String, transform: DataFrame => DataFrame,
                      sinkPath: String, checkpointDir: String,
                      maxFilesPerTrigger: Option[Int] = None,
                      stateShufflePartitions: Option[Int] = None)
      : StreamingQuery = {
    withStatePartitions(spark, stateShufflePartitions) { s =>
      val r = s.readStream.schema(schema).format(format)
      val src = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n.toString))
        .load(sourceDir)
      transform(src).writeStream
        .format("parquet")
        .option("path", sinkPath)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** Kafka incremental ingest — the KafkaSource/WorkUnitCalculator replacement:
    * maxOffsetsPerTrigger is the reference's fair `max_messages` budget
    * (KafkaWorkUnitCalculator.java:224-255), failOnDataLoss its data-loss
    * detection (:342-362), startingOffsets=latest its bootstrap policy
    * (KafkaBootstrapOffsetSelector.java:33-46). */
  def kafkaAvailableNow(spark: SparkSession, bootstrap: String, topic: String,
                        transform: DataFrame => DataFrame,
                        sinkPath: String, checkpointDir: String,
                        maxOffsetsPerTrigger: Long = 1000000L,
                        startingOffsets: String = "latest",
                        failOnDataLoss: Boolean = true): StreamingQuery = {
    val src = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
    transform(src).writeStream
      .format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-stream event-time INTERVAL JOIN, process-available-then-stop:
    * both sides read the same incremental file source, the right side
    * joins within `[leftTs, leftTs + maxGap]` of a matching key, and the
    * result appends to parquet. The attribution join every event
    * pipeline runs (view→click, impression→conversion, request→error)
    * expressed as Structured Streaming's watermarked stream-stream join:
    * the time-range condition plus BOTH watermarks is what lets the
    * state store evict a row once no future match can exist — without
    * them the join state grows with the stream forever. Inner-join
    * matches emit as soon as both sides arrive (no watermark holdback —
    * unlike m18's append-mode windows), so over a closed input the
    * result equals the batch join, which is exactly what the m47 oracle
    * gates — with ONE boundary caveat: Spark's late-row filter drops
    * input rows whose event time is `<=` the CURRENT watermark
    * (WatermarkSupport builds a LessThanOrEqual predicate), and the
    * watermark of the very first micro-batch is 0 — so a row at exactly
    * epoch 0 (1970-01-01T00:00:00.000000) is dropped as late before it
    * ever reaches join state, while a row one microsecond later
    * survives. IntervalJoinSpec pins this observed boundary; real event
    * time never sits at the epoch origin, so the closed-input == batch
    * equivalence holds for any data with positive event times.
    *
    * `joinType = "leftOuter"` is the other half of every attribution
    * question — views with NO click within the gap emit (v, null).
    * Unlike inner matches, a null extension is WATERMARK-HELD: the row
    * emits only once the global watermark passes leftTs + maxGap (state
    * eviction time — before that a matching click could still arrive),
    * in a LATER micro-batch (Spark emits the no-longer-matchable state
    * on eviction, including a trailing no-data batch once the final
    * watermark lands). Consequence for closed inputs: left rows within
    * `watermark + maxGap` of the stream's LAST event time keep their
    * state un-evicted when the stream stops, and their null extensions
    * never emit — equality with the batch left join needs a flush row
    * per side past maxEventTime + watermark + maxGap (the m49 query
    * shows the pattern; m18's append-mode windows have the same
    * contract).
    *
    * `joinType = "fullOuter"` completes the family: BOTH unmatched
    * sides null-extend — views with no click AND orphan clicks with no
    * view (attribution loss: the click whose view fell outside the gap
    * or never landed). Same holdback semantics on each side
    * independently; the same flush-row pattern closes both.
    * `prepareLeft`/`prepareRight` must project DISTINCT
    * column names (the join keeps both sides' columns). */
  def intervalJoinAvailableNow(spark: SparkSession, sourceDir: String,
                               schema: StructType, format: String,
                               prepareLeft: DataFrame => DataFrame,
                               prepareRight: DataFrame => DataFrame,
                               leftKeyCol: String, rightKeyCol: String,
                               leftTsCol: String, rightTsCol: String,
                               maxGap: String, watermark: String,
                               sinkPath: String, checkpointDir: String,
                               maxFilesPerTrigger: Option[Int] = None,
                               joinType: String = "inner",
                               stateShufflePartitions: Option[Int] = None)
      : StreamingQuery = {
    require(Set("inner", "leftOuter", "fullOuter").contains(joinType),
      s"joinType must be inner, leftOuter or fullOuter: $joinType")
    withStatePartitions(spark, stateShufflePartitions) { s =>
      def src = {
        val r = s.readStream.schema(schema).format(format)
        maxFilesPerTrigger.fold(r)(n =>
          r.option("maxFilesPerTrigger", n.toString)).load(sourceDir)
      }
      val l = prepareLeft(src).withWatermark(leftTsCol, watermark)
      val r = prepareRight(src).withWatermark(rightTsCol, watermark)
      val joined = l.join(r,
        col(leftKeyCol) === col(rightKeyCol) &&
          col(rightTsCol) >= col(leftTsCol) &&
          col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL $maxGap"),
        joinType)
      joined.writeStream
        .format("parquet")
        .option("path", sinkPath)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** Bounded-state streaming EXACT dedup —
    * `dropDuplicatesWithinWatermark` over derived key columns: the
    * ingest-side dedupe (at-least-once delivery makes duplicates a
    * guarantee, not an accident). State holds one entry per key only
    * within the watermark horizon: a duplicate arriving while its
    * key's state lives is dropped; one arriving after the state
    * evicted (watermark passed firstSeenTs + delay) is re-emitted —
    * the honest bounded-state contract: streaming exact dedup trades
    * unbounded state for a horizon, and the unit test pins BOTH sides
    * of that trade. Over a closed input whose event times all sit
    * inside one horizon, the emitted keys equal the batch DISTINCT
    * keys — WHICH row of a duplicate set survives is arrival-order
    * dependent, so the deterministic (oracle-safe) projection is the
    * key columns only; `prepare` derives them plus the event-time
    * column (which must sit ABOVE epoch 0 — the intervalJoin boundary
    * caveat applies to this state store too). */
  def dedupWithinWatermarkAvailableNow(spark: SparkSession,
      sourceDir: String, schema: StructType, format: String,
      prepare: DataFrame => DataFrame, tsCol: String,
      keyCols: Seq[String], watermark: String,
      sinkPath: String, checkpointDir: String,
      stateShufflePartitions: Option[Int] = None): StreamingQuery = {
    withStatePartitions(spark, stateShufflePartitions) { s =>
      val src = s.readStream.schema(schema).format(format).load(sourceDir)
      val deduped = prepare(src)
        .withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
        .select(keyCols.map(col): _*)
      deduped.writeStream
        .format("parquet")
        .option("path", sinkPath)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** One micro-batch of the streaming DEDUP-INSERT sink: broadcast
    * stream-static enrichment, then only keys absent from BOTH the
    * batch-so-far (`dropDuplicates`) and the existing sink
    * (`existingKeys` left-anti) survive. Factored out of
    * [[dedupInsertAvailableNow]]'s foreachBatch so the physical plan
    * is directly auditable: the static dimension BROADCASTS (the
    * stream side never shuffles for the enrichment), and the sink-key
    * anti-join sees only the key projection of the sink table. */
  private[graft] def dedupInsertBatch(batch: DataFrame, keyCol: String,
                                      dim: DataFrame, dimKeyCol: String,
                                      existingKeys: Option[DataFrame])
      : DataFrame = {
    val enriched = batch.join(broadcast(dim), Seq(dimKeyCol))
    val fresh = enriched.dropDuplicates(keyCol)
    existingKeys.fold(fresh)(ks =>
      fresh.join(ks.select(col(keyCol)), Seq(keyCol), "left_anti"))
  }

  /** Streaming DEDUP-INSERT sink with stream-static enrichment — the
    * most common production ingest pattern: each micro-batch (a)
    * enriches against a BROADCAST static dimension (no stream-side
    * shuffle — the dimension ships to the stream, never the reverse),
    * (b) drops keys already present in the SINK TABLE (left-anti
    * against the sink's key projection — a duplicate arriving in a
    * LATER micro-batch, or in a later invocation against the same
    * sink, inserts nothing), and (c) appends only the fresh rows.
    * This is the reference's Hudi DEDUP_INSERT write mode
    * (HoodieSink.java:426-433,446-449 — filter records whose key
    * exists in the table, then insert) re-expressed as
    * foreachBatch over Structured Streaming, where it composes with
    * any source the stream reads.
    *
    * Unlike [[dedupWithinWatermarkAvailableNow]]'s watermark-bounded
    * state, the dedup memory here is the SINK ITSELF — unbounded
    * horizon, priced as one key-projection scan of the sink per
    * micro-batch (at scale: a bucketed/partitioned sink prunes that
    * scan; the reference prices the same lookup against Hudi's key
    * index). Delivery is at-least-once on micro-batch RETRY (the
    * append and the checkpoint commit are not atomic — same trade the
    * reference documents for non-transactional sinks); across
    * DISTINCT batches the anti-join makes inserts exactly-once. */
  def dedupInsertAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, format: String,
      prepare: DataFrame => DataFrame, keyCol: String,
      dim: DataFrame, dimKeyCol: String,
      sinkPath: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val r = spark.readStream.schema(schema).format(format)
    val src = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toString)).load(sourceDir)
    prepare(src).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s2 = batch.sparkSession
        val sinkDir = new org.apache.hadoop.fs.Path(sinkPath)
        val fs = sinkDir.getFileSystem(
          s2.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(sinkDir) && fs.listStatus(sinkDir).exists(st =>
              !st.getPath.getName.startsWith("_")))
            Some(s2.read.parquet(sinkPath))
          else None
        dedupInsertBatch(batch, keyCol, dim, dimKeyCol, existing)
          .write.mode("append").parquet(sinkPath)
        ()
      }
      .start()
  }

  /** Streaming MATERIALIZED-VIEW maintenance — the streaming twin of
    * [[graft.operators.AggMaintenance]]: each micro-batch aggregates
    * alone (count/sum/min/max state layout) and folds into the served
    * state via ONE full-outer merge; the fact stream is never rescanned
    * and no Spark state store is involved (the state IS the serving
    * table). Each fold lands as a new [[graft.llm.LayoutStore]] version
    * — dot-temp + atomic rename, so a reader pins either the previous
    * state or the complete new one, never a torn overwrite (the
    * classic self-overwrite hazard: parquet can't re-write a path it's
    * lazily reading). The state lands KEY-BUCKETED (`kb =
    * pmod(xxhash64(keys), stateBuckets)`): each fold physically
    * rewrites only the buckets its keys touch and inherits cold
    * buckets by manifest reference, so a wide keyspace never
    * serializes through one writer per batch — see
    * [[aggMaintenanceBatch]]. Deletions: fold them with the batch
    * operator [[graft.operators.AggMaintenance.applyChangesToAggState]]
    * (retraction-aware); this streaming twin is insert-only.
    *
    * Versus [[runAggregateAvailableNow]]'s complete-mode aggregation:
    * that replays the store's state through the sink every batch and
    * serves from session memory; this serves from DURABLE versioned
    * parquet that any other session (or engine) reads, survives
    * restarts via the checkpoint, and prunes with the store's GC.
    *
    * Replay safety: foreachBatch is at-least-once — a crash between
    * landing the state version and the checkpoint's offset commit
    * replays the batch on restart, and a second fold of the same delta
    * would permanently corrupt counts/sums. Each state version
    * therefore records the batch token it applied (an
    * [[AppliedBatchMarker]] file inside the version dir — landed by
    * the same atomic rename as the data), and a batch whose token the
    * LATEST version already carries is skipped. The token pairs the
    * checkpoint's persisted query id with the batchId
    * ([[checkpointQueryToken]] — batchId alone restarts at 0 when a
    * checkpoint is recreated, which must fold, not skip). Only the
    * latest version needs checking: AvailableNow replays at most the
    * one uncommitted batch, and it was the last writer. */
  def aggMaintenanceAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, format: String,
      prepare: DataFrame => DataFrame,
      keyCols: Seq[String], sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String], statePath: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      stateBuckets: Int = 16,
      compaction: graft.llm.LayoutStore.CompactionPolicy =
        graft.llm.LayoutStore.CompactionPolicy()): StreamingQuery = {
    val r = spark.readStream.schema(schema).format(format)
    val src = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toString)).load(sourceDir)
    lazy val ckToken = checkpointQueryToken(spark, checkpointDir)
    prepare(src).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        aggMaintenanceBatch(batch, s"$ckToken-$batchId", keyCols,
          sumCols, minCols, maxCols, statePath, stateBuckets, compaction)
      }
      .start()
  }

  /** Marker file a maintained-agg state version carries naming the
    * batch token it folded — underscore-prefixed so the store's
    * physical walk and parquet readers both ignore it. */
  private[graft] val AppliedBatchMarker = "_applied_batch"

  /** The batch token the state version `v` at `statePath` recorded,
    * if any (pre-idempotence versions carry no marker — they fold). */
  private[graft] def appliedBatchToken(
      conf: org.apache.hadoop.conf.Configuration,
      statePath: String, v: Long): Option[String] = {
    val f = new org.apache.hadoop.fs.Path(
      s"$statePath/version=$v/$AppliedBatchMarker")
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Marker file naming the key-bucket count a maintained-agg state
    * was built with — the bucketing is only sound if every version
    * hashes keys into the SAME bucket space, so a fold with a
    * different count fails fast instead of silently stranding keys
    * in unmerged buckets. */
  private[graft] val StateBucketsMarker = "_state_buckets"

  private[graft] def stateBucketCount(
      conf: org.apache.hadoop.conf.Configuration,
      statePath: String, v: Long): Option[Int] = {
    val f = new org.apache.hadoop.fs.Path(
      s"$statePath/version=$v/$StateBucketsMarker")
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  private def writeTextMarker(conf: org.apache.hadoop.conf.Configuration,
                              dir: String, name: String,
                              value: String): Unit = {
    val mk = new org.apache.hadoop.fs.Path(dir, name)
    val out = mk.getFileSystem(conf).create(mk, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  /** One micro-batch of [[aggMaintenanceAvailableNow]], factored out so
    * the replay and write-shape contracts are directly testable:
    *
    *  - REPLAY: calling this twice with the same `batchToken` folds
    *    the delta exactly ONCE (the second call sees the token on the
    *    latest state version and returns without writing).
    *  - WRITE SHAPE: the state lands partitioned by a key bucket
    *    (`kb = pmod(xxhash64(keys), stateBuckets)`), and each fold
    *    physically rewrites ONLY the buckets the micro-batch touched —
    *    cold buckets are inherited by manifest reference
    *    ([[graft.llm.LayoutStore.writeSnapshotManifested]], the
    *    appendBm25Snapshot discipline). A wide keyspace (per-user
    *    counters — the honest 100 TB case) no longer serializes the
    *    whole state through one writer per batch: write cost is
    *    ∝ touched buckets, and bucket count sizes to state volume.
    *    The state read for the merge partition-prunes to the touched
    *    buckets, so read cost is ∝ touched state too.
    *
    * A pre-bucketing state (no [[StateBucketsMarker]] on its latest
    * version) migrates transparently: the first fold reads the whole
    * legacy state, merges, and lands it fully bucketed. */
  private[graft] def aggMaintenanceBatch(batch: DataFrame,
      batchToken: String, keyCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      statePath: String, stateBuckets: Int = 16,
      compaction: graft.llm.LayoutStore.CompactionPolicy =
        graft.llm.LayoutStore.CompactionPolicy()): Unit = {
    import graft.operators.AggMaintenance
    import graft.llm.LayoutStore
    require(stateBuckets >= 1, s"stateBuckets must be >= 1: $stateBuckets")
    val s2 = batch.sparkSession
    val conf = s2.sparkContext.hadoopConfiguration
    val last = LayoutStore.versions(conf, statePath).lastOption
    val replayed = last.exists(v =>
      appliedBatchToken(conf, statePath, v).contains(batchToken))
    if (replayed) return // crash-after-land replay: already folded
    val storedBuckets = last.flatMap(v => stateBucketCount(conf, statePath, v))
    storedBuckets.foreach(b => require(b == stateBuckets,
      s"state at $statePath was bucketed with $b key buckets; " +
        s"refusing to fold with $stateBuckets — keys would strand in " +
        "unmerged buckets (rebuild or keep the original count)"))
    def kbOf = pmod(xxhash64(keyCols.map(col): _*),
      lit(stateBuckets.toLong)).cast("int")
    val delta = AggMaintenance.aggState(batch, keyCols,
      sumCols, minCols, maxCols)
      .withColumn("kb", kbOf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded driver read: at most `stateBuckets` values
      val touched = delta.select(col("kb")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty && last.isEmpty) return // empty bootstrap batch
      // a legacy (unbucketed) state cannot prune: one-time full merge
      val legacy = last.isDefined && storedBuckets.isEmpty
      val fullRewrite = last.isEmpty || legacy
      val merged =
        if (last.isEmpty) delta.drop("kb")
        else {
          val st = LayoutStore.readSnapshotTable(s2, statePath)
          val pruned =
            if (legacy) st
            else st.where(col("kb").isin(touched.map(Integer.valueOf): _*))
              .drop("kb")
          AggMaintenance.mergeAggState(pruned, delta.drop("kb"),
            keyCols, sumCols, minCols, maxCols)
        }
      LayoutStore.writeSnapshotManifested(conf, statePath) { (tmp, _) =>
        // an empty batch writes nothing (no hollow dirs) and carries
        // every bucket; a real batch lands only its touched buckets
        if (touched.nonEmpty || legacy)
          merged.withColumn("kb", kbOf).repartition(col("kb"))
            .write.mode("overwrite").partitionBy("kb").parquet(tmp)
        writeTextMarker(conf, tmp, AppliedBatchMarker, batchToken)
        writeTextMarker(conf, tmp, StateBucketsMarker, stateBuckets.toString)
        if (fullRewrite) Map.empty[String, Long]
        else {
          val touchedDirs = touched.map(v => s"kb=$v").toSet
          LayoutStore.effectiveEntries(conf, statePath, last.get)
            .filter { case (k, _) =>
              k.startsWith("kb=") && !touchedDirs.contains(k) }
        }
      }
      // same policy hook as the CDC fold: checked after the fold
      // lands, off by default, replay-skipped via the early return
      if (compaction.enabled) {
        LayoutStore.maybeCompact(s2, statePath, compaction)
        ()
      }
    } finally delta.unpersist()
  }

  /** CDC-aware streaming agg maintenance — [[aggMaintenanceAvailableNow]]
    * for a CHANGELOG stream: each micro-batch carries fact-level inserts
    * AND deletes (`opCol` ∈ {"I","D"}, a `D` row stating the full
    * before-image — the m55/m60 CDC contract) plus, when `beforeSuffix`
    * is given, NATIVE UPDATE events (`op` = "U", one row holding the
    * after image in the measure columns and the before image of each
    * sum column `c` in `c + suffix` — an update-heavy changelog never
    * doubles into D+I rows upstream: the facts fold treats a U as
    * pk-replace, the agg fold shifts sums by after−before in closed
    * form and repairs U-touched keys' min/max like deletes; a U must
    * not move the row across `pkCols`/`keyCols`), and the fold is
    * [[graft.operators.AggMaintenance.applyChangesToAggState]] wired
    * into the bucketed foreachBatch path: counts/sums decrement in
    * exact closed form, delete-touched keys' min/max rebuild from the
    * SERVED post-apply fact table, untouched keys carry byte-identical,
    * and a delete-free batch's plan provably never touches facts
    * (the op profile is collected per batch — bounded by the bucket
    * count — and passed as `deletesPresent`).
    *
    * The fact table is maintained HERE too, as a second bucketed
    * LayoutStore at `factsPath` sharing the state's key-bucket space:
    * per batch, inserts append and delete pks drop — each fold rewrites
    * only the touched buckets (cold carry by manifest), and the min/max
    * repair reads exactly the delete-touched buckets of the version the
    * same batch just landed (facts fold first, then the agg fold — a
    * crash between them replays with the facts fold token-skipping and
    * the agg fold completing). `pkCols` identify a fact row for the
    * delete anti-join (before-image equality alone would erase every
    * duplicate of a multiset row).
    *
    * Replay safety: both stores carry the [[AppliedBatchMarker]] token
    * independently, so an at-least-once redelivery folds each store at
    * most once. Bucket-count changes fail fast on both stores. */
  def cdcAggMaintenanceAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, format: String,
      prepare: DataFrame => DataFrame,
      pkCols: Seq[String], keyCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      statePath: String, factsPath: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      stateBuckets: Int = 16, opCol: String = "op",
      beforeSuffix: Option[String] = None,
      compaction: graft.llm.LayoutStore.CompactionPolicy =
        graft.llm.LayoutStore.CompactionPolicy()): StreamingQuery = {
    val r = spark.readStream.schema(schema).format(format)
    val src = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toString)).load(sourceDir)
    lazy val ckToken = checkpointQueryToken(spark, checkpointDir)
    prepare(src).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cdcAggMaintenanceBatch(batch, s"$ckToken-$batchId", pkCols,
          keyCols, sumCols, minCols, maxCols, statePath, factsPath,
          stateBuckets, opCol, beforeSuffix, compaction)
      }
      .start()
  }

  /** One micro-batch of [[cdcAggMaintenanceAvailableNow]], factored out
    * so the replay / never-touches-facts / write-shape contracts are
    * directly testable. */
  private[graft] def cdcAggMaintenanceBatch(batch: DataFrame,
      batchToken: String, pkCols: Seq[String], keyCols: Seq[String],
      sumCols: Seq[String], minCols: Seq[String], maxCols: Seq[String],
      statePath: String, factsPath: String,
      stateBuckets: Int = 16, opCol: String = "op",
      beforeSuffix: Option[String] = None,
      compaction: graft.llm.LayoutStore.CompactionPolicy =
        graft.llm.LayoutStore.CompactionPolicy()): Unit = {
    import graft.operators.AggMaintenance
    import graft.llm.LayoutStore
    require(stateBuckets >= 1, s"stateBuckets must be >= 1: $stateBuckets")
    require(pkCols.nonEmpty, "cdcAggMaintenanceBatch needs pk columns")
    val okOps = if (beforeSuffix.isDefined) Seq("I", "D", "U")
                else Seq("I", "D")
    val beforeCols = beforeSuffix.toSeq.flatMap(sfx => sumCols.map(_ + sfx))
    beforeCols.foreach(c => require(batch.columns.contains(c),
      s"cdcAggMaintenanceBatch: beforeSuffix is set but the batch has " +
        s"no '$c' column — every sum column needs its before image"))
    val s2 = batch.sparkSession
    val conf = s2.sparkContext.hadoopConfiguration
    def kbOf = pmod(xxhash64(keyCols.map(col): _*),
      lit(stateBuckets.toLong)).cast("int")
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE bounded collect profiles the batch: which key buckets it
      // touches, which of those need a min/max repair (a delete or a
      // native update), and whether any op is
      // malformed (≤ stateBuckets rows) — an unknown op must fail HERE,
      // before the facts store lands, or a crash-corrected replay
      // would token-skip a half-applied facts version
      // NULL ops flag EXPLICITLY: `!isin` is NULL for a NULL op, so a
      // bare negation would let the row slip past the profile, land in
      // the facts fold with the batch token (silently dropped — neither
      // I nor D), then abort in the agg fold's raise_error; a corrected
      // replay would token-skip the facts fold, leaving the two stores
      // permanently divergent — the half-applied state this pre-flight
      // exists to prevent
      // two-level: per-pk first (event count + bucket span), then per
      // bucket — the fold applies AT MOST ONE change event per pk per
      // batch (an I and a U, or two U's, for one pk would anti-join the
      // old row once but append both images — duplicate pks in facts
      // that skew every later repair), and a pk whose events straddle
      // key buckets means the batch changed a row's GROUP KEY without a
      // key before-image; both are off-contract and must fail pre-write
      val prof = b
        .groupBy(pkCols.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          min(kbOf).as("__kbMin"), max(kbOf).as("__kbMax"),
          max(col(opCol).isin("D", "U")).as("__r"),
          max(when(col(opCol).isNull || !col(opCol).isin(okOps: _*),
            coalesce(col(opCol), lit("<null>")))).as("__b"))
        .groupBy(col("__kbMin").as("kb"))
        .agg(max(col("__r")).as("__needsRepair"),
          max(col("__b")).as("__badOp"),
          max(col("__n")).as("__maxPerPk"),
          max(col("__kbMin") =!= col("__kbMax")).as("__kbSplit"))
        .collect()
      prof.flatMap(r => Option(r.getString(2))).headOption.foreach(op =>
        throw new IllegalArgumentException(
          s"cdcAggMaintenanceBatch: $opCol must be one of " +
            s"${okOps.mkString("'", "'/'", "'")}, got '$op'"))
      prof.find(_.getBoolean(4)).foreach(r =>
        throw new IllegalArgumentException(
          "cdcAggMaintenanceBatch: a pk's change events fall in different " +
            "key buckets — the batch moves a row across group keys, which " +
            "needs a key before-image the contract doesn't carry; emit a " +
            "D under the old key and an I under the new one instead"))
      prof.find(_.getLong(3) > 1).foreach(r =>
        throw new IllegalArgumentException(
          s"cdcAggMaintenanceBatch: ${r.getLong(3)} change events for one " +
            s"pk in a single batch (key bucket ${r.getInt(0)}) — the fold " +
            "applies at most one event per pk per batch; coalesce events " +
            "upstream or split the batch"))
      val touched = prof.map(_.getInt(0)).sorted
      val repairBuckets = prof.filter(_.getBoolean(1)).map(_.getInt(0)).sorted
      val needsRepair = repairBuckets.nonEmpty

      // ---- facts fold FIRST: the agg repair reads post-apply facts ----
      val lastF = LayoutStore.versions(conf, factsPath).lastOption
      val factsReplayed = lastF.exists(v =>
        appliedBatchToken(conf, factsPath, v).contains(batchToken))
      if (!factsReplayed) {
        lastF.flatMap(v => stateBucketCount(conf, factsPath, v))
          .foreach(n => require(n == stateBuckets,
            s"fact store at $factsPath was bucketed with $n key buckets; " +
              s"refusing to fold with $stateBuckets"))
        // a U is a pk-replace on the fact store: its pk anti-joins out
        // with the deletes, its after image appends with the inserts
        // (before-image columns never land in facts)
        val inserts = b.where(col(opCol).isin("I", "U")).drop(opCol)
          .drop(beforeCols: _*)
        if (!(touched.isEmpty && lastF.isEmpty)) {
          LayoutStore.writeSnapshotManifested(conf, factsPath) { (tmp, _) =>
            if (touched.nonEmpty) {
              val base =
                if (lastF.isEmpty) inserts
                else {
                  val st = LayoutStore.readSnapshotTable(s2, factsPath)
                    .where(col("kb").isin(touched.map(Integer.valueOf): _*))
                    .drop("kb")
                    .select(inserts.columns.map(col): _*)
                  val delPks = b.where(col(opCol).isin("D", "U"))
                    .select(pkCols.map(col): _*).distinct()
                  st.join(broadcast(delPks), pkCols, "left_anti")
                    .unionByName(inserts)
                }
              base.withColumn("kb", kbOf).repartition(col("kb"))
                .write.mode("overwrite").partitionBy("kb").parquet(tmp)
            }
            writeTextMarker(conf, tmp, AppliedBatchMarker, batchToken)
            writeTextMarker(conf, tmp, StateBucketsMarker,
              stateBuckets.toString)
            lastF.fold(Map.empty[String, Long]) { v =>
              val touchedDirs = touched.map(x => s"kb=$x").toSet
              LayoutStore.effectiveEntries(conf, factsPath, v)
                .filter { case (k, _) =>
                  k.startsWith("kb=") && !touchedDirs.contains(k) }
            }
          }
          ()
        }
      }

      // ---- agg fold against the just-landed post-apply facts ----
      val lastS = LayoutStore.versions(conf, statePath).lastOption
      val stateReplayed = lastS.exists(v =>
        appliedBatchToken(conf, statePath, v).contains(batchToken))
      if (stateReplayed || (touched.isEmpty && lastS.isEmpty)) return
      lastS.flatMap(v => stateBucketCount(conf, statePath, v))
        .foreach(n => require(n == stateBuckets,
          s"state at $statePath was bucketed with $n key buckets; " +
            s"refusing to fold with $stateBuckets"))
      // bootstrap folds against an EMPTY state of the exact layout
      val pruned = lastS match {
        case None => AggMaintenance.aggState(b.where(lit(false)),
          keyCols, sumCols, minCols, maxCols)
        case Some(_) => LayoutStore.readSnapshotTable(s2, statePath)
          .where(col("kb").isin(touched.map(Integer.valueOf): _*))
          .drop("kb")
      }
      // call-by-name: forced ONLY when the batch carries deletes or
      // native updates — prunes to exactly the repair-touched buckets
      // of the fact version this same batch just landed
      def postFacts = LayoutStore.readSnapshotTable(s2, factsPath)
        .where(col("kb").isin(repairBuckets.map(Integer.valueOf): _*))
        .drop("kb")
      val merged = AggMaintenance.applyChangesToAggState(pruned, b,
        postFacts, keyCols, sumCols, minCols, maxCols, opCol,
        deletesPresent = Some(needsRepair),
        beforeImage = beforeSuffix.map(sfx => (c: String) => col(c + sfx)))
      LayoutStore.writeSnapshotManifested(conf, statePath) { (tmp, _) =>
        if (touched.nonEmpty)
          merged.withColumn("kb", kbOf).repartition(col("kb"))
            .write.mode("overwrite").partitionBy("kb").parquet(tmp)
        writeTextMarker(conf, tmp, AppliedBatchMarker, batchToken)
        writeTextMarker(conf, tmp, StateBucketsMarker, stateBuckets.toString)
        lastS.fold(Map.empty[String, Long]) { v =>
          val touchedDirs = touched.map(x => s"kb=$x").toSet
          LayoutStore.effectiveEntries(conf, statePath, v)
            .filter { case (k, _) =>
              k.startsWith("kb=") && !touchedDirs.contains(k) }
        }
      }
      // maintenance AFTER both folds land (the just-landed versions
      // count toward the chain depth): policy-gated, off by default —
      // a disabled policy leaves the fold byte-identical. Skipped on
      // replayed batches (the early returns above): opportunistic, the
      // next live batch re-checks. Compaction carries the replay token
      // + bucket-count markers (the m71 guarantee), so a fold landing
      // on a policy-compacted version keeps both protections
      if (compaction.enabled) {
        LayoutStore.maybeCompact(s2, factsPath, compaction)
        LayoutStore.maybeCompact(s2, statePath, compaction)
        ()
      }
    } finally b.unpersist()
  }

  /** Streaming dedup-GRAPH maintenance: an AvailableNow edge stream
    * folds each micro-batch of (id1, id2) pairs into a persisted CC
    * labeling store ([[graft.llm.Dedup.writeCcLabelStore]]) — the
    * label-store twin of [[aggMaintenanceAvailableNow]], closing the
    * loop for a production near-dup graph: the pair detectors emit
    * edges continuously, and the served cluster labeling stays current
    * without ever re-running CC over history (each fold is the
    * contraction of [[graft.llm.Dedup.incrementalConnectedComponents]],
    * rewriting only merged clusters' buckets).
    *
    * A cold store bootstraps from the first batch (CC of the batch
    * alone). Replay: the same [[AppliedBatchMarker]] token skip as the
    * agg fold — but unlike counts/sums, a label fold is NATURALLY
    * idempotent (re-folding already-applied edges merges nothing: the
    * remap comes out empty and the version is all-carried), so the
    * token only saves the wasted version + fold cost; correctness
    * never depends on it. */
  def ccLabelMaintenanceAvailableNow(spark: SparkSession,
      sourceDir: String, schema: StructType, format: String,
      prepare: DataFrame => DataFrame, idCol1: String, idCol2: String,
      statePath: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      clusterBuckets: Int = 64,
      edgesPath: Option[String] = None,
      compaction: graft.llm.LayoutStore.CompactionPolicy =
        graft.llm.LayoutStore.CompactionPolicy()): StreamingQuery = {
    val r = spark.readStream.schema(schema).format(format)
    val src = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toString)).load(sourceDir)
    lazy val ckToken = checkpointQueryToken(spark, checkpointDir)
    prepare(src).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ccLabelMaintenanceBatch(batch, s"$ckToken-$batchId",
          idCol1, idCol2, statePath, clusterBuckets, edgesPath,
          compaction)
      }
      .start()
  }

  /** One micro-batch of [[ccLabelMaintenanceAvailableNow]], factored
    * out so the bootstrap/replay contracts are directly testable.
    * With `edgesPath`, the pair-graph sidecar bootstraps and folds in
    * lockstep (edges write before labels — the sidecar fold is
    * naturally idempotent, so a crash between the two writes replays
    * into a no-op on the sidecar and a normal fold on the labels). */
  private[graft] def ccLabelMaintenanceBatch(batch: DataFrame,
      batchToken: String, idCol1: String, idCol2: String,
      statePath: String, clusterBuckets: Int = 64,
      edgesPath: Option[String] = None,
      compaction: graft.llm.LayoutStore.CompactionPolicy =
        graft.llm.LayoutStore.CompactionPolicy()): Unit = {
    import graft.llm.{Dedup, LayoutStore}
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val last = LayoutStore.versions(conf, statePath).lastOption
    if (last.exists(v =>
        appliedBatchToken(conf, statePath, v).contains(batchToken)))
      return // crash-after-land replay: already folded (see scaladoc)
    if (last.isEmpty) {
      // cold bootstrap: the first NON-EMPTY batch is the graph. An
      // empty first batch creates no version at all — a partitioned
      // write of zero rows lands no parquet footers, and a hollow v1
      // would be unreadable; replaying an empty batch is trivially
      // idempotent, so skipping the token record here is safe.
      if (batch.isEmpty) return
      val labels = Dedup.connectedComponents(batch, idCol1, idCol2)
        .localCheckpoint()
      edgesPath.foreach { ep =>
        // a label-crash replay may find the sidecar already bootstrapped
        // — land a fresh full snapshot (same content) rather than fold
        Dedup.writeCcEdgeStore(labels, batch, ep, clusterBuckets,
          idCol1, idCol2, markers = Map(AppliedBatchMarker -> batchToken))
      }
      Dedup.writeCcLabelStore(labels, statePath,
        clusterBuckets, markers = Map(AppliedBatchMarker -> batchToken))
    } else
      Dedup.appendCcEdgesToLabelStore(batch.sparkSession, statePath,
        batch, idCol1, idCol2,
        markers = Map(AppliedBatchMarker -> batchToken),
        edgesPath = edgesPath)
    // the same policy hook as the agg/CDC folds, on the label store
    // AND the pair-graph sidecar (both accrete a version per batch)
    if (compaction.enabled) {
      LayoutStore.maybeCompact(batch.sparkSession, statePath, compaction)
      edgesPath.foreach(ep =>
        LayoutStore.maybeCompact(batch.sparkSession, ep, compaction))
      ()
    }
  }

  /** Gap-based SESSION aggregation as a streaming `session_window` —
    * the Structured Streaming twin of the batch window-pass
    * sessionizer ([[graft.operators.Sessionize.sessions]]), with
    * custom state fully delegated to Spark's session-window state
    * store (merge-on-overlap-or-touch, evict once the watermark passes
    * a session's end). Boundary semantics pinned by the spec: an event
    * at EXACTLY prevTs + gap MERGES (touching `[ts, ts+gap)` windows
    * coalesce) — identical to the batch lag rule's `delta > gap`
    * starts-new test, so the m52 oracle is the d15 derivation with
    * end = lastTs + gap. Sessions emit once
    * the watermark passes their end, so closed-input equality with the
    * batch derivation needs the usual flush row past
    * maxEventTime + watermark + gap. Output: (key,
    * session_window.start, session_window.end = lastTs + gap,
    * n_events). */
  def sessionWindowAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, format: String,
      prepare: DataFrame => DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String,
      sinkPath: String, checkpointDir: String,
      stateShufflePartitions: Option[Int] = None): StreamingQuery = {
    withStatePartitions(spark, stateShufflePartitions) { s =>
      val src = s.readStream.schema(schema).format(format).load(sourceDir)
      val sessions = prepare(src)
        .withWatermark(tsCol, watermark)
        .groupBy(col(keyCol), session_window(col(tsCol), gap))
        .agg(count(lit(1)).as("n_events"))
        .select(col(keyCol),
          col("session_window.start").as("w_start"),
          col("session_window.end").as("w_end"),
          col("n_events"))
      sessions.writeStream
        .format("parquet")
        .option("path", sinkPath)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** Incremental file-source AGGREGATION: process-available-then-stop
    * with a complete-mode memory sink — the "refresh a serving snapshot
    * from whatever landed" shape (a stats table, a top-terms board).
    * Unlike [[runAvailableNow]]'s stateless append, the aggregation
    * carries STATE across micro-batches through the state store — which
    * is what makes a custom [[org.apache.spark.sql.catalyst.expressions
    * .aggregate.TypedImperativeAggregate]] (the d50 Misra–Gries sketch)
    * streaming-capable: its serialize/merge are exactly what the store
    * replays (m29 gates the streamed sketch under d50's batch oracle).
    * Returns the final in-memory table; `queryName` must be unique per
    * concurrent run (it names the sink table). */
  def runAggregateAvailableNow(spark: SparkSession, sourceDir: String,
                               schema: StructType, format: String,
                               agg: DataFrame => DataFrame,
                               queryName: String,
                               stateShufflePartitions: Option[Int] = None)
      : DataFrame = {
    // the memory sink registers its table in the STARTING session's
    // temp-view catalog — with a scoped clone, the result must be read
    // back from the clone, so the whole read-aggregate-start-read path
    // runs inside the closure
    withStatePartitions(spark, stateShufflePartitions) { s =>
      val src = s.readStream.schema(schema).format(format).load(sourceDir)
      agg(src).writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.table(queryName)
    }
  }

  /** Watermarked tumbling-window aggregation — capability the reference
    * lacks (SURVEY §2.12); exposed as a standard transform. */
  def windowedCounts(df: DataFrame, tsCol: String, watermark: String,
                     windowLen: String, keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup with BOUNDED state: drop rows whose key
    * already appeared within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). State evicts keys once the
    * watermark passes them — the property that lets a continuous ingest
    * dedup forever without unbounded key state (plain dropDuplicates
    * keeps every key ever seen). Combine with
    * `Dedup.exactKey(text)` as the key column for streaming document
    * dedup: the md5 fingerprint is 32 bytes of state per in-horizon doc,
    * not the text. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
                           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Continuous cross-run dedup: each micro-batch is deduped against the
    * persisted signature state ([[graft.llm.Dedup.incrementalDedup]] — the
    * new-shard-vs-history exact/near decision), decisions land in
    * `outPath`, and the SURVIVORS' signatures append to the state table so
    * later batches — and later runs, the state is the same parquet
    * contract the batch operators use — dedup against everything ingested
    * so far. `foreachBatch` puts the state read, decision join, and both
    * writes inside the transactional batch function: offsets advance only
    * after it returns, so a crash re-runs the whole batch.
    *
    * Both writes are IDEMPOTENT under that replay: each batch owns a
    * `batch_key=<md5(checkpointDir)>-<batchId>` partition subdir written
    * with overwrite, so a re-run replaces its own crashed half-write
    * instead of appending duplicate rows (batchId restarts per checkpoint,
    * hence the checkpoint hash in the key; it is stable across restarts of
    * the SAME checkpoint, which is what replay means). The history read
    * excludes the current batch_key — a replayed batch must never see its
    * own crashed attempt's state, which would flag every doc as an exact
    * dup of itself. Pre-seeding history at `statePath` must use the same
    * keyed layout (write to `.../batch_key=<seed>`): parquet partition
    * discovery rejects a mix of flat files and partition dirs. Years of
    * per-batch subdirs are cheap to list (one dir per COMMITTED batch) and
    * can be compacted by rewriting into fresh batch_key dirs offline.
    * Within-batch duplicates follow incrementalDedup's contract (out of
    * scope — compose with dedupWithinWatermark upstream). */
  def incrementalDedupStream(stream: DataFrame, idCol: String, textCol: String,
                             statePath: String, outPath: String,
                             checkpointDir: String, threshold: Double,
                             k: Int = 3, numHashes: Int = 12, bands: Int = 4,
                             maxBucketSize: Option[Int] = None): StreamingQuery = {
    // fail fast at the call site: deferred to the first micro-batch these
    // requires surface asynchronously as a StreamingQueryException
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    require(threshold >= 0 && threshold <= 1, s"threshold not in [0,1]: $threshold")
    // Token from the checkpoint's persisted StreamingQuery id, NOT a hash
    // of the path: batchId restarts at 0 when a checkpoint dir is deleted
    // and recreated (a common recovery move), so a path-derived token
    // would reuse the old run's batch keys — silently excluding the old
    // batch-0 state from history AND overwriting its partition. The query
    // id is regenerated with the checkpoint, so recreated checkpoints get
    // fresh batch keys and the old state stays in history. Resolved
    // lazily inside foreachBatch — the metadata file exists by the time
    // the first batch runs.
    // MIGRATION: streams whose state predates the query-id token used
    // md5(path)-<batchId> keys. A stream that crashed MID-BATCH under the
    // old format replays under a new key after upgrading, so the crashed
    // half-write's partition is not overwritten — delete the highest
    // legacy batch_key partition from decisions/state before restarting
    // such a stream (committed batches are unaffected: their offsets
    // advanced, so their keys are never re-written).
    lazy val ckToken = {
      val t = checkpointQueryToken(stream.sparkSession, checkpointDir)
      warnLegacyBatchKeys(stream.sparkSession, statePath, checkpointDir, t)
      t
    }
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processIncrementalBatch(batch, s"$ckToken-$batchId", idCol, textCol,
          statePath, outPath, threshold, k, numHashes, bands, maxBucketSize)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stable per-checkpoint token for batch keys: the StreamingQuery id
    * Spark persists at `<checkpointDir>/metadata` (stable across restarts
    * of the same checkpoint, regenerated when it's recreated — the
    * property batch-key idempotence needs). Falls back to an md5 of the
    * path only if the metadata file is missing (pre-start call). */
  private[graft] def checkpointQueryToken(
      spark: org.apache.spark.sql.SparkSession, checkpointDir: String): String = {
    val meta = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seed =
      if (fs.exists(meta)) {
        val in = fs.open(meta)
        try {
          val raw = new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          """"id"\s*:\s*"([0-9a-fA-F-]+)"""".r.findFirstMatchIn(raw)
            .map(_.group(1)).getOrElse(raw)
        } finally in.close()
      } else checkpointDir
    tokenDigest(seed)
  }

  private def tokenDigest(seed: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  /** Detect state written under the LEGACY batch-key token (an md5 of the
    * checkpoint path, the pre-query-id format): legacy and current keys
    * share the same 12-hex shape, so the probe computes what the legacy
    * token for this checkpoint path WOULD be and lists its partitions.
    * One prominent warning, because the failure is silent otherwise: a
    * stream that crashed MID-BATCH under the old format replays under a
    * new key after upgrading, leaving the crashed half-write's partition
    * in state/decisions — the operator must delete the HIGHEST legacy
    * batch_key partition before trusting the state (committed batches
    * are unaffected: their offsets advanced, their keys never re-write).
    * Returns the legacy partition names so tests (and operators) can
    * assert/inspect. */
  private[graft] def warnLegacyBatchKeys(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      checkpointDir: String, currentToken: String): Seq[String] = {
    val legacy = tokenDigest(checkpointDir)
    if (legacy == currentToken) return Nil // pre-start fallback: same token
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val hits = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(s"batch_key=$legacy-")).toSeq.sorted
    if (hits.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"LEGACY batch-key state detected at $statePath (${hits.size} " +
          s"partition(s) under the old md5(path) token '$legacy', e.g. " +
          s"${hits.head}). If the stream crashed mid-batch before the " +
          "upgrade, DELETE the highest legacy batch_key partition from " +
          "state AND decisions before trusting this state — the replay " +
          "now runs under a new key and will not overwrite the crashed " +
          "half-write. Committed batches are unaffected.")
    hits
  }

  /** One micro-batch of [[incrementalDedupStream]], factored out so the
    * replay contract is directly testable: calling this twice with the
    * same `batchKey` (a crash after the writes but before the offset
    * commit, then the replay) leaves exactly one decision row and one
    * state row per doc, with decisions identical to a clean run. */
  /** Streaming DECONTAMINATION — screen each ingest micro-batch against a
    * persisted bench-key table ([[graft.llm.Dedup.writeBenchKeys]]) and
    * write per-doc (id, n_hits, contaminated) flags, one overwrite-keyed
    * partition per batch: the same idempotent-replay discipline as
    * [[incrementalDedupStream]] (a crashed batch replays under ITS key
    * and replaces its own half-write; batch keys derive from the
    * checkpoint's persisted query id). The bench keys re-read per batch
    * is deliberate: the table is small (eval sets), the read is one
    * pruned scan, and a refreshed bench set takes effect on the next
    * batch without restarting the stream. Both bench-key layouts work:
    * a flat [[graft.llm.Dedup.writeBenchKeys]] table, or the VERSIONED
    * snapshot store ([[graft.llm.Dedup.writeBenchKeysSnapshot]]) — in
    * which case each batch pins the newest snapshot, so an eval-set
    * refresh RETIRES the replaced keys at the next batch, not just
    * adds to them. */
  def decontaminateStream(stream: DataFrame, idCol: String, textCol: String,
                          benchKeysPath: String, outPath: String,
                          checkpointDir: String, k: Int = 8,
                          minHits: Long = 1): StreamingQuery = {
    require(minHits >= 1, s"minHits must be >= 1: $minHits")
    lazy val ckToken = checkpointQueryToken(stream.sparkSession, checkpointDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val versioned = graft.llm.Dedup.benchKeyVersions(
          sp.sparkContext.hadoopConfiguration, benchKeysPath).nonEmpty
        val keys =
          if (versioned) graft.llm.Dedup.readBenchKeysLatest(sp, benchKeysPath, k)
          else graft.llm.Dedup.readBenchKeys(sp, benchKeysPath, k)
        graft.llm.Dedup.contaminationFlagsAgainstKeys(batch, keys,
            idCol, textCol, k, minHits)
          .write.mode("overwrite")
          .parquet(s"$outPath/batch_key=$ckToken-$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming DRIFT MONITORING — per micro-batch, drift the batch's
    * term distribution against the pinned-newest persisted term-profile
    * snapshot ([[graft.llm.TextAnalysis.writeTermProfileSnapshot]]) and
    * write the batch's top-k movers + corpus TVD, one overwrite-keyed
    * partition per batch (the [[decontaminateStream]] idempotent-replay
    * discipline: a crashed batch replays under ITS key and replaces its
    * own half-write). The snapshot re-pin per batch is deliberate and
    * cheap — the profile is vocabulary-sized, its read is one pruned
    * scan — and it means a profile REFRESH (this month's crawl becomes
    * the new reference) takes effect on the next batch without
    * restarting the stream, retiring the old reference by construction.
    * The per-batch TVD against a stable reference is the alert signal
    * ("this ingest hour looks nothing like the corpus"); per-term
    * movers say why. */
  def profileDriftStream(stream: DataFrame, textCol: String,
                         profilePath: String, outPath: String,
                         checkpointDir: String, topK: Int = 20)
      : StreamingQuery = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    lazy val ckToken = checkpointQueryToken(stream.sparkSession, checkpointDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.TextAnalysis.driftAgainstProfile(batch.sparkSession,
            batch, textCol, profilePath, topK)
          .write.mode("overwrite")
          .parquet(s"$outPath/batch_key=$ckToken-$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming INGEST-TIME edit-dedup — per micro-batch, flag each doc
    * within Levenshtein k of the pinned-newest
    * [[graft.llm.Dedup.writeEditIndexSnapshot]] reference index and write
    * the (id, edit_dup, min_dist) decisions, one overwrite-keyed
    * partition per batch (the [[decontaminateStream]] idempotent-replay
    * discipline). The snapshot re-pins PER BATCH, so an index refresh
    * takes effect on the next micro-batch without a stream restart — and
    * since k travels inside the snapshot's meta, a refresh may even
    * retune k with the same zero-restart contract. This is the filter a
    * 100TB ingest actually runs: the reference index is built once per
    * refresh cycle; each arriving shard pays only its own probe cost. */
  def editDedupStream(stream: DataFrame, idCol: String, textCol: String,
                      indexPath: String, outPath: String,
                      checkpointDir: String,
                      maxBucketSize: Option[Int] = None): StreamingQuery = {
    lazy val ckToken = checkpointQueryToken(stream.sparkSession, checkpointDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Dedup.editDupFlags(batch.sparkSession, batch, idCol,
            textCol, indexPath, maxBucketSize = maxBucketSize)
          .write.mode("overwrite")
          .parquet(s"$outPath/batch_key=$ckToken-$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private[graft] def processIncrementalBatch(
      batch: DataFrame, batchKey: String, idCol: String, textCol: String,
      statePath: String, outPath: String, threshold: Double,
      k: Int, numHashes: Int, bands: Int,
      maxBucketSize: Option[Int]): Unit = {
    import graft.llm.Dedup
    val spark = batch.sparkSession
    val stateFs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statePathObj = new org.apache.hadoop.fs.Path(statePath)
    // exists AND non-empty: a pre-created empty dir (ACL setup on managed
    // storage) must bootstrap like a missing one, not crash schema
    // inference on batch 0
    val hasState = stateFs.exists(statePathObj) &&
      stateFs.listStatus(statePathObj).nonEmpty
    val history =
      if (hasState) {
        val st = Dedup.readSignatureState(spark, statePath)
        // partition-pruned: only the current batch's own dir is excluded.
        // cast: partition type INFERENCE types batch_key from its values —
        // a seed-only table whose one dir is numeric/date-like
        // (batch_key=20240101) infers non-string, and comparing that to a
        // string token nulls the predicate and silently drops ALL history
        if (st.columns.contains("batch_key"))
          st.where(col("batch_key").cast("string") =!= lit(batchKey))
            .drop("batch_key")
        else st
      } else // bootstrap: empty state with the right schema/id type
        Dedup.signatureState(batch.limit(0), idCol, textCol, k, numHashes)
    val decisions = Dedup.incrementalDedup(batch, history, idCol, textCol,
      threshold, k, numHashes, bands, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      batch.join(decisions, Seq(idCol)).write.mode("overwrite")
        .parquet(s"$outPath/batch_key=$batchKey")
      val survivors = batch.join(
        decisions.where(col("keep")).select(col(idCol)), Seq(idCol))
      Dedup.writeSignatureState(
        Dedup.signatureState(survivors, idCol, textCol, k, numHashes),
        s"$statePath/batch_key=$batchKey", mode = "overwrite")
    } finally decisions.unpersist()
  }

  /** A closed user session: [start_ms, end_ms] of activity with no gap
    * longer than the configured timeout. */
  final case class Session(key: String, start_ms: Long, end_ms: Long, n_events: Long)

  /** One not-yet-final session fragment (public: Catalyst codegen
    * instantiates it). */
  final case class SessionFrag(start: Long, end: Long, n: Long)

  /** Internal per-key state: gap-separated fragments, sorted by start. */
  final case class SessionState(frags: Seq[SessionFrag])

  /** Gap-based sessionization with custom keyed state
    * (flatMapGroupsWithState + event-time timeout) — the "custom state"
    * streaming surface (SURVEY §2.12's greenfield capability). A session
    * closes, and is emitted, once the event-time watermark passes its
    * last event + gapMs.
    *
    * State per key is the list of OPEN session fragments — runs of events
    * separated by more than the gap that the watermark has not yet sealed.
    * Fragments (not one [min,max] span) are what make the operator correct
    * under replay/backfill: one micro-batch can carry many sessions' worth
    * of a key's history (the first cut collapsed a whole batch into a
    * single session — caught by the batch-twin equivalence test), and a
    * late event inside the watermark may bridge two fragments into one
    * session. An emitted session can never be bridged: it is emitted only
    * when watermark >= end + gap, and an event that could join it would be
    * older than the watermark — already dropped. Open fragments per key
    * are bounded by lateness/gap, so the state store still scales with
    * ACTIVE keys, not history — the property that matters at 100TB/day. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapMs: Long, watermark: String): Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    // fold sorted fragments: adjacent-within-gap merge (counts add)
    def mergeFrags(fs: Seq[SessionFrag]): Seq[SessionFrag] =
      fs.sortBy(f => (f.start, f.end)).foldLeft(Vector.empty[SessionFrag]) {
        (acc, f) =>
          acc.lastOption match {
            case Some(l) if f.start <= l.end + gapMs =>
              acc.init :+ SessionFrag(l.start, math.max(l.end, f.end), l.n + f.n)
            case _ => acc :+ f
          }
      }
    events
      .select(col(keyCol).cast("string").as("k"), col(tsCol).cast("timestamp").as("ts"))
      // cast("timestamp") silently NULLS malformed values, the late-row
      // predicate does not drop null event times, and getTime would then
      // NPE on the executor and kill the query — drop them here
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermark) // after the projection: a select on a
      // watermarked column would strip the event-time tag
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val arrived = rows.map(r => SessionFrag(r._2.getTime, r._2.getTime, 1L)).toVector
          val frags = mergeFrags(
            state.getOption.map(_.frags).getOrElse(Seq.empty) ++ arrived)
          // a fragment is final once no in-watermark event can extend it
          val (closed, open) = frags.partition(_.end + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionState(open))
            // earliest possible close; open fragments have end+gap > wm,
            // satisfying Spark's timeout-after-watermark requirement
            state.setTimeoutTimestamp(open.map(_.end).min + gapMs)
          }
          closed.iterator.map(f => Session(key, f.start, f.end, f.n))
      }
  }
}

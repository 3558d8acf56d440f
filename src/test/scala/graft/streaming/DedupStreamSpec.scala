package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class DedupStreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("checkpointQueryToken: follows the persisted query id, so a recreated " +
    "checkpoint dir gets fresh batch keys instead of clobbering old state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").toFile
    try {
      val ck = dir.getAbsolutePath
      // no metadata yet -> path-hash fallback, deterministic
      val pre = Incremental.checkpointQueryToken(spark, ck)
      assert(pre == Incremental.checkpointQueryToken(spark, ck))
      // first run writes its query id
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(ck, "metadata"),
        """{"id":"11111111-2222-3333-4444-555555555555"}""")
      val run1 = Incremental.checkpointQueryToken(spark, ck)
      assert(run1 != pre)
      assert(run1 == Incremental.checkpointQueryToken(spark, ck),
        "token must be stable across restarts of the SAME checkpoint")
      // delete + recreate the checkpoint: Spark writes a NEW query id;
      // the token must change so old batch_key partitions survive
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(ck, "metadata"),
        """{"id":"aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"}""")
      val run2 = Incremental.checkpointQueryToken(spark, ck)
      assert(run2 != run1, "recreated checkpoint must not reuse batch keys")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("warnLegacyBatchKeys flags state written under the old md5(path) " +
    "token, and only that state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-legacy").toFile
    try {
      val ck = dir.getAbsolutePath + "/ck"
      val statePath = dir.getAbsolutePath + "/state"
      // legacy token = the pre-query-id path hash (today's pre-start
      // fallback computes exactly it)
      val legacy = Incremental.checkpointQueryToken(spark, ck)
      // no state dir at all -> nothing to warn about
      assert(Incremental.warnLegacyBatchKeys(spark, statePath, ck, "ffffffffffff").isEmpty)
      new java.io.File(s"$statePath/batch_key=$legacy-0").mkdirs()
      new java.io.File(s"$statePath/batch_key=$legacy-1").mkdirs()
      new java.io.File(s"$statePath/batch_key=ffffffffffff-0").mkdirs()
      // current token == legacy (stream never upgraded): no warning
      assert(Incremental.warnLegacyBatchKeys(spark, statePath, ck, legacy).isEmpty)
      // upgraded stream (query-id token differs): exactly the two legacy
      // partitions are flagged, the new-format one is not
      val hits = Incremental.warnLegacyBatchKeys(spark, statePath, ck, "ffffffffffff")
      assert(hits == Seq(s"batch_key=$legacy-0", s"batch_key=$legacy-1"), hits)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("dedupWithinWatermark drops in-horizon repeats, state stays bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val out = Incremental.dedupWithinWatermark(
      input.toDF().toDF("fp", "ts"), "ts", "10 seconds", Seq("fp"))
    val q = out.writeStream.format("memory").queryName("dedup_out").start()
    try {
      // doc A twice in one batch + doc B -> A emitted once
      input.addData(
        ("docA", ts("2024-01-01 10:00:00")),
        ("docA", ts("2024-01-01 10:00:01")),
        ("docB", ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      // A again within the horizon -> still suppressed
      input.addData(("docA", ts("2024-01-01 10:00:05")))
      q.processAllAvailable()
      val firstCounts = spark.table("dedup_out").groupBy("fp").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(firstCounts == Map("docA" -> 1L, "docB" -> 1L))

      // advance the watermark far past A's entry (evicting its state),
      // then A re-arrives as a late new doc -> emitted again: horizon
      // semantics, not dedup-forever
      input.addData(("docC", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(("docA", ts("2024-01-01 11:00:01")))
      q.processAllAvailable()
      val counts = spark.table("dedup_out").groupBy("fp").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("docA") == 2L,
        s"state not evicted past the watermark: $counts")
    } finally q.stop()
  }

  test("dedupWithinWatermark composes upstream of incrementalDedupStream: " +
    "within-batch duplicates never reach the state table") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("compose-stream").toString
    val (statePath, outPath) = (s"$base/state", s"$base/out")
    val common = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"

    def runOnce(ck: String, docs: (String, String, Timestamp)*): Unit = {
      val input = MemoryStream[(String, String, Timestamp)]
      input.addData(docs: _*)
      // the documented composition (Incremental.scala): stage 1 collapses
      // in-horizon repeats on the exact fingerprint; stage 2 dedups the
      // survivors against the persisted cross-run state
      val staged = Incremental.dedupWithinWatermark(
        input.toDF().toDF("doc_id", "text", "ts")
          .withColumn("fp", graft.llm.Dedup.exactKey(col("text"))),
        "ts", "10 seconds", Seq("fp"))
      val q = Incremental.incrementalDedupStream(staged, "doc_id", "text",
        statePath, outPath, s"$base/$ck", threshold = 0.5)
      try q.awaitTermination(60000) finally q.stop()
    }

    // run 1: two exact copies in ONE batch + one distinct doc
    runOnce("ck1",
      ("a1", common, ts("2024-01-01 10:00:00")),
      ("a1b", common, ts("2024-01-01 10:00:01")), // within-batch exact dup
      ("b1", "totally different text sharing nothing with the other doc",
        ts("2024-01-01 10:00:02")))
    val out1 = spark.read.parquet(outPath)
      .select("doc_id").collect().map(_.getString(0)).toSet
    // stage 1 swallowed one of the two copies BEFORE the decision join —
    // without it both would reach incrementalDedup (within-batch dups are
    // out of its contract) and both would land in output AND state
    assert(out1.count(id => id == "a1" || id == "a1b") == 1,
      s"expected exactly one of the within-batch copies, got $out1")
    assert(out1.contains("b1"))
    val state1 = graft.llm.Dedup.readSignatureState(spark, statePath)
    assert(state1.count() == 2, "state must hold one row per DISTINCT doc")
    assert(state1.groupBy("fp").count().where(col("count") > 1).isEmpty,
      "duplicate fingerprint leaked into the signature state")

    // run 2: the same text arrives again -> exact dup vs HISTORY now
    // (stage 1's state died with run 1's query; stage 2's parquet state
    // is the cross-run memory)
    runOnce("ck2", ("a2", common, ts("2024-01-01 11:00:00")))
    val out2 = spark.read.parquet(outPath)
      .select("doc_id", "exact_dup", "keep").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(out2("a2") == ((true, false)), s"cross-run exact dup missed: $out2")
    assert(graft.llm.Dedup.readSignatureState(spark, statePath).count() == 2,
      "non-keeper must not append state")
  }

  test("incrementalDedupStream batch replay is idempotent: re-running a " +
    "failed batch leaves one state row per doc, decisions as a clean run") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("replay-stream").toString
    val (statePath, outPath) = (s"$base/state", s"$base/out")
    val run = (docs: Seq[(String, String)], key: String) =>
      Incremental.processIncrementalBatch(docs.toDF("doc_id", "text"), key,
        "doc_id", "text", statePath, outPath, threshold = 0.5,
        k = 3, numHashes = 12, bands = 4, maxBucketSize = None)

    val batch0 = Seq(
      "a1" -> "alpha bravo charlie delta echo foxtrot golf hotel india juliett",
      "b1" -> "totally different words sharing nothing with the other document here")
    run(batch0, "ck0-0")
    // crash after the writes, before the offset commit -> the SAME batch
    // replays with the SAME key. The replay must (a) not see its own
    // crashed attempt's state as history (else every doc flags exact_dup
    // of itself) and (b) overwrite, not duplicate, both outputs.
    run(batch0, "ck0-0")

    val out = spark.read.parquet(outPath)
      .select("doc_id", "exact_dup", "near_dup", "keep").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(out.length == 2, s"replay duplicated decision rows: ${out.toSeq}")
    assert(out.toMap == Map("a1" -> ((false, false, true)),
      "b1" -> ((false, false, true))),
      s"replay saw its own crashed state as history: ${out.toSeq}")
    val state = graft.llm.Dedup.readSignatureState(spark, statePath)
    assert(state.count() == 2, "replay duplicated signature-state rows")
    assert(state.groupBy("id").count().where(col("count") > 1).isEmpty)

    // a LATER batch (different key) still sees batch 0 as history
    run(Seq("a2" -> batch0.head._2), "ck0-1")
    val out1 = spark.read.parquet(outPath)
      .where(col("doc_id") === "a2").select("exact_dup").collect()
    assert(out1.head.getBoolean(0), "later batch lost the replayed history")
    assert(graft.llm.Dedup.readSignatureState(spark, statePath).count() == 2,
      "non-keeper appended state")
  }

  test("decontaminateStream: per-batch flags against persisted bench keys, " +
    "batch-keyed output, refreshed keys picked up next run") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("decon-stream").toString
    val (keysPath, outPath) = (s"$base/keys", s"$base/out")
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    graft.llm.Dedup.writeBenchKeys(
      Seq((0L, evalText)).toDF("doc_id", "text"), "text", keysPath, k = 3)

    def runOnce(ck: String, docs: (String, String)*): Unit = {
      val input = MemoryStream[(String, String)]
      input.addData(docs: _*)
      val q = Incremental.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        keysPath, outPath, s"$base/$ck", k = 3)
      try q.awaitTermination(60000) finally q.stop()
    }
    runOnce("ck1",
      ("t1", evalText),                              // full containment
      ("t2", "xx alpha beta gamma yy unrelated"),    // one shared shingle
      ("t3", "totally clean document content here")) // clean
    val out = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("t1")._2 && out("t1")._1 >= 5L, s"got $out")
    assert(out("t2") == ((1L, true)) && out("t3") == ((0L, false)), s"got $out")
    // a refreshed bench set takes effect on the NEXT run without code
    // changes: overwrite keys with a different eval doc
    graft.llm.Dedup.writeBenchKeys(
      Seq((1L, "totally clean document content here")).toDF("doc_id", "text"),
      "text", keysPath, k = 3)
    runOnce("ck2", ("t4", evalText), ("t5", "totally clean document content here"))
    val out2 = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!out2("t4") && out2("t5"), s"got $out2")
    // batch-keyed layout: one partition dir per committed batch
    val dirs = new java.io.File(outPath).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch_key=")).toSet
    assert(dirs.size == 2, s"got $dirs")
  }

  test("decontaminateStream over the VERSIONED store: each batch pins the " +
    "newest snapshot, so a refresh RETIRES replaced keys mid-stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("decon-ver").toString
    val (keysPath, outPath) = (s"$base/keys", s"$base/out")
    val evalA = "alpha beta gamma delta epsilon zeta eta theta"
    val evalB = "totally clean document content here"
    graft.llm.Dedup.writeBenchKeysSnapshot(
      Seq((0L, evalA)).toDF("doc_id", "text"), "text", keysPath, k = 3)

    def runOnce(ck: String, docs: (String, String)*): Unit = {
      val input = MemoryStream[(String, String)]
      input.addData(docs: _*)
      val q = Incremental.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        keysPath, outPath, s"$base/$ck", k = 3)
      try q.awaitTermination(60000) finally q.stop()
    }
    runOnce("ck1", ("t1", evalA), ("t2", evalB))
    val out1 = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out1 == Map("t1" -> true, "t2" -> false), s"got $out1")
    // snapshot 2 REPLACES the eval set: A's keys must retire, not union
    graft.llm.Dedup.writeBenchKeysSnapshot(
      Seq((1L, evalB)).toDF("doc_id", "text"), "text", keysPath, k = 3)
    runOnce("ck2", ("t3", evalA), ("t4", evalB))
    val out2 = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!out2("t3"), s"retired v1 keys still flagging: $out2")
    assert(out2("t4"), s"refreshed keys not live: $out2")
  }

  test("profileDriftStream: per-batch drift against the pinned profile; " +
    "a mid-stream refresh re-pins on the NEXT batch without restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("drift-stream").toString
    val (profPath, outPath) = (s"$base/profile", s"$base/out")
    graft.llm.TextAnalysis.writeTermProfileSnapshot(
      Seq("a a b").toDF("text"), "text", profPath) // v1: {a:2, b:1}

    def runOnce(ck: String, docs: String*): Unit = {
      val input = MemoryStream[String]
      input.addData(docs: _*)
      val q = Incremental.profileDriftStream(input.toDF().toDF("text"),
        "text", profPath, outPath, s"$base/$ck", topK = 10)
      try q.awaitTermination(60000) finally q.stop()
    }
    // batch vs v1: {a:1, b:1, c:2} (na=4) vs {a:2, b:1} (nb=3):
    // a |1*3-2*4|=5, b |3-4|=1, c |6-0|=6 -> tvd 12/(2*4*3) = 0.5
    runOnce("ck1", "a b c", "c")
    val out1 = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> ((r.getLong(5), r.getDouble(6))))
      .toMap
    assert(out1 == Map("c" -> ((6L, 0.5)), "a" -> ((5L, 0.5)),
      "b" -> ((1L, 0.5))), s"got $out1")
    // refresh the reference mid-deployment: the next batch pins v2
    // without a stream restart, retiring v1 (c stops being novel, a
    // becomes novel). Run-2 rows are the na=2 ones (batch {a:1, c:1}).
    graft.llm.TextAnalysis.writeTermProfileSnapshot(
      Seq("c c b").toDF("text"), "text", profPath) // v2: {c:2, b:1}
    runOnce("ck2", "a c")
    // vs v2 (nb=3): a |1*3-0|=3, c |1*3-2*2|=1, b |0-1*2|=2
    val v2rows = spark.read.parquet(outPath)
      .where(org.apache.spark.sql.functions.col("na") === 2L).collect()
    assert(v2rows.forall(_.getLong(4) == 3L),
      s"run-2 batch must drift against v2: ${v2rows.mkString(",")}")
    val byTerm = v2rows.map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(byTerm == Map("a" -> 3L, "c" -> 1L, "b" -> 2L), s"got $byTerm")
    // batch-keyed layout: one partition per committed batch, two runs
    val dirs = new java.io.File(outPath).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch_key=")).toSet
    assert(dirs.size == 2, s"got $dirs")
  }

  test("incrementalDedupStream dedups micro-batches against persisted state across runs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("inc-stream").toString
    val (statePath, outPath) = (s"$base/state", s"$base/out")
    // long shared text: a single trailing-token edit perturbs only 3 of ~38
    // k=3 shingles, so the (deterministic md5) MinHash signatures stay close
    // enough for a band collision and estimated Jaccard >= 0.5
    val common = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu one two three four " +
      "five six seven eight nine ten eleven twelve today")

    def runOnce(ck: String, docs: (String, String)*): Unit = {
      val input = MemoryStream[(String, String)]
      input.addData(docs: _*)
      val q = Incremental.incrementalDedupStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        statePath, outPath, s"$base/$ck", threshold = 0.5)
      try q.awaitTermination(60000) finally q.stop()
    }

    // run 1: two distinct docs -> both keep, state bootstraps
    runOnce("ck1", ("a1", common), ("b1", "completely different words here nothing shared at all zero"))
    // run 2 (separate query, same state): exact copy of a1, near-dup of a1
    // (one token changed), and a brand-new doc
    runOnce("ck2",
      ("a2", common),
      ("a3", common.replace("today", "tonight")),
      ("c1", "unrelated fresh content that matches nothing in the history table"))

    val out = spark.read.parquet(outPath)
      .select("doc_id", "exact_dup", "near_dup", "keep")
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out("a1") == ((false, false, true)) && out("b1") == ((false, false, true)))
    assert(out("a2")._1, s"exact copy not flagged: $out")         // exact dup of a1
    assert(out("a3")._2 && !out("a3")._1, s"near dup not flagged: $out")
    assert(out("c1") == ((false, false, true)), s"fresh doc not kept: $out")
    // state holds exactly the survivors: a1, b1, c1
    val stateIds = graft.llm.Dedup.readSignatureState(spark, statePath)
      .select("id").collect().map(_.getString(0)).toSet
    assert(stateIds == Set("a1", "b1", "c1"))
  }

  test("editDedupStream: per-batch flags against the pinned edit index; a " +
    "mid-stream refresh re-pins — and retunes k — without restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("edit-stream").toString
    val (idxPath, outPath) = (s"$base/index", s"$base/out")
    graft.llm.Dedup.writeEditIndexSnapshot(
      Seq((1L, "aaaa bbbb cccc")).toDF("id", "t"), "id", "t",
      k = 2, path = idxPath)

    def runOnce(ck: String, docs: (Long, String)*): Unit = {
      val input = MemoryStream[(Long, String)]
      input.addData(docs: _*)
      val q = Incremental.editDedupStream(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", idxPath, outPath, s"$base/$ck")
      try q.awaitTermination(60000) finally q.stop()
    }
    runOnce("ck1",
      (10L, "aaaa bbbb cccd"),   // dist 1 <= 2 -> dup
      (11L, "aaaa xxxx cccc"))   // dist 4 > 2  -> keep
    val out1 = spark.read.parquet(outPath)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out1 == Map(10L -> ((true, 1L)), 11L -> ((false, -1L))),
      s"got $out1")
    // refresh mid-deployment: new reference AND a wider k=4 — the next
    // batch must pin BOTH (under the retired v1, doc 13 would read dist 0)
    graft.llm.Dedup.writeEditIndexSnapshot(
      Seq((2L, "aaaa xxxx cccc")).toDF("id", "t"), "id", "t",
      k = 4, path = idxPath)
    runOnce("ck2",
      (12L, "aaaa xxxx cccz"),   // dist 1 to the v2 reference
      (13L, "aaaa bbbb cccc"))   // dist 4 to v2 (0 to the RETIRED v1)
    val out2 = spark.read.parquet(outPath)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out2(12L) == ((true, 1L)) && out2(13L) == ((true, 4L)),
      s"got $out2")
  }

  /** dropDuplicatesWithinWatermark bounded-state contract, BOTH sides:
    * a duplicate inside the horizon drops; after the key's state
    * evicts (watermark past firstSeenTs + delay), the key RE-EMITS. */
  test("dedupWithinWatermarkAvailableNow: in-horizon duplicate dropped; " +
    "post-eviction re-appearance re-emits") {
    val s = spark; import s.implicits._
    val srcDir = new java.io.File(tmpDir("ddw-src"))
    srcDir.mkdirs()
    val t0 = 86400000L // day 1 — off the epoch-0 boundary
    def land(name: String, rows: Seq[(String, Timestamp)],
             mtime: Long): Unit = {
      val tmp = tmpDir(s"ddw-part-$name")
      rows.toDF("k", "ets").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(srcDir, s"$name.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    val schema = Seq(("", new Timestamp(0L))).toDF("k", "ets").schema
    val out = tmpDir("ddw-sink"); val ckpt = tmpDir("ddw-ckpt")
    def run(): Unit = {
      val q = Incremental.dedupWithinWatermarkAvailableNow(spark,
        srcDir.toString, schema, "parquet", identity, "ets", Seq("k"),
        watermark = "10 minutes", out, ckpt)
      try q.awaitTermination(120000) finally q.stop()
    }
    def sink() = spark.read.parquet(out).collect()
      .map(_.getString(0)).groupBy(identity).map { case (k, v) => k -> v.length }
    land("b1", Seq(("a", new Timestamp(t0)), ("b", new Timestamp(t0 + 60000L))),
      mtime = 1000000L)
    run()
    assert(sink() == Map("a" -> 1, "b" -> 1), s"got ${sink()}")
    // in-horizon duplicate: a's state still lives -> dropped
    land("b2", Seq(("a", new Timestamp(t0 + 120000L))), mtime = 2000000L)
    run()
    assert(sink() == Map("a" -> 1, "b" -> 1),
      s"in-horizon duplicate must drop: ${sink()}")
    // far-future key advances the watermark past a's eviction time
    land("b3", Seq(("z", new Timestamp(t0 + 86400000L))), mtime = 3000000L)
    run()
    // post-eviction re-appearance: a re-emits (the bounded-state trade)
    land("b4", Seq(("a", new Timestamp(t0 + 86400000L + 60000L))),
      mtime = 4000000L)
    run()
    assert(sink() == Map("a" -> 2, "b" -> 1, "z" -> 1),
      s"post-eviction key must re-emit: ${sink()}")
  }
}

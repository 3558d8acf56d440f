package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Incremental-batch semantics via Trigger.AvailableNow: each invocation
  * processes exactly what accumulated since the checkpoint then stops —
  * the reference's work-unit-calculator model (SURVEY §2.12).
  */
class IncrementalSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("runAvailableNow processes new files only, across invocations") {
    val src = tmpDir("inc-src")
    val sink = tmpDir("inc-sink")
    val ckpt = tmpDir("inc-ckpt")

    Files.write(Paths.get(src, "batch1.json"),
      """{"id": 1, "v": "a"}
        |{"id": 2, "v": "b"}
        |""".stripMargin.getBytes)
    val q1 = Incremental.runAvailableNow(spark, src, schema, "json",
      df => df.withColumn("v_up", upper(col("v"))), sink, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(sink).count() == 2)

    // second invocation with no new data: no duplicates
    val q2 = Incremental.runAvailableNow(spark, src, schema, "json",
      df => df.withColumn("v_up", upper(col("v"))), sink, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(sink).count() == 2)

    // new file arrives; only it is processed
    Files.write(Paths.get(src, "batch2.json"),
      """{"id": 3, "v": "c"}
        |""".stripMargin.getBytes)
    val q3 = Incremental.runAvailableNow(spark, src, schema, "json",
      df => df.withColumn("v_up", upper(col("v"))), sink, ckpt)
    q3.awaitTermination()
    val out = spark.read.parquet(sink)
    assert(out.count() == 3)
    assert(out.where("v_up = 'C'").count() == 1)
  }

  test("windowedCounts groups into tumbling windows with watermark") {
    val s = spark; import s.implicits._
    // batch DataFrame exercises the same expression surface
    val df = Seq(
      ("2024-01-01 00:00:10", "u1"), ("2024-01-01 00:00:50", "u1"),
      ("2024-01-01 00:01:10", "u2")).toDF("ts_s", "user")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Incremental.windowedCounts(df, "ts", "10 seconds", "1 minute", Seq("user"))
      .select(col("window.start").cast("string").as("w"), col("user"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2024-01-01 00:00:00", "u1", 2L),
      ("2024-01-01 00:01:00", "u2", 1L)))
  }

  test("dedupInsertAvailableNow: cross-batch AND cross-invocation " +
    "duplicates insert nothing (the sink is the dedup memory); fresh " +
    "keys append enriched; within-batch duplicates collapse") {
    val s = spark; import s.implicits._
    val src = tmpDir("di-src")
    val sink = tmpDir("di-sink") + "/table"
    val ckpt = tmpDir("di-ckpt")
    val dim = Seq(("a", "LA"), ("b", "LB"), ("c", "LC")).toDF("grp", "lbl")
    def run(ck: String) = Incremental.dedupInsertAvailableNow(
      s, src, schema, "json",
      df => df.select(col("id"), col("v").as("fp"),
        substring(col("v"), 1, 1).as("grp")),
      "fp", dim, "grp", sink, ck,
      maxFilesPerTrigger = Some(1)).awaitTermination()
    // batch 1: two keys, one within-batch duplicate
    Files.write(Paths.get(src, "b1.json"),
      """{"id": 1, "v": "aa"}
        |{"id": 2, "v": "aa"}
        |{"id": 3, "v": "bb"}
        |""".stripMargin.getBytes)
    // batch 2 (separate micro-batch): one cross-batch dup + one fresh
    Files.write(Paths.get(src, "b2.json"),
      """{"id": 4, "v": "aa"}
        |{"id": 5, "v": "cc"}
        |""".stripMargin.getBytes)
    run(tmpDir("di-ckpt1"))
    val after1 = spark.read.parquet(sink)
      .select(col("fp"), col("lbl")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(after1.length == 3, s"got ${after1.toSeq}")
    assert(after1.toSet == Set(("aa", "LA"), ("bb", "LB"), ("cc", "LC")))
    // a LATER INVOCATION against the same sink (fresh checkpoint, so
    // the old files replay): still nothing re-inserts, one new key lands
    Files.write(Paths.get(src, "b3.json"),
      """{"id": 6, "v": "bb"}
        |{"id": 7, "v": "ab"}
        |""".stripMargin.getBytes)
    run(tmpDir("di-ckpt2"))
    val after2 = spark.read.parquet(sink)
      .select(col("fp")).collect().map(_.getString(0))
    assert(after2.length == 4, s"replayed duplicates re-inserted: " +
      s"${after2.toSeq.sorted}")
    assert(after2.toSet == Set("aa", "bb", "cc", "ab"))
  }

  test("aggMaintenanceAvailableNow: a SECOND invocation against the same " +
    "checkpoint folds only the files that arrived since — the state " +
    "lands one more version and equals the from-scratch aggregate") {
    val s = spark; import s.implicits._
    val src0 = tmpDir("aggm-src")
    val state = tmpDir("aggm") + "/state"
    val ckpt = tmpDir("aggm-ckpt")
    val conf = spark.sparkContext.hadoopConfiguration
    def run(): Unit = Incremental.aggMaintenanceAvailableNow(spark, src0,
      Seq((0L, "x", 1.0)).toDF("id", "k", "v").schema, "parquet",
      df => df.select(col("k"), col("v")),
      keyCols = Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
      maxCols = Seq("v"), statePath = state, checkpointDir = ckpt)
      .awaitTermination()
    Seq((1L, "x", 1.0), (2L, "y", 5.0)).toDF("id", "k", "v")
      .coalesce(1).write.mode("append").parquet(src0)
    run()
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L))
    // late files arrive; the SAME checkpoint resumes past batch 0
    Seq((3L, "x", 3.0), (4L, "z", 2.0)).toDF("id", "k", "v")
      .coalesce(1).write.mode("append").parquet(src0)
    run()
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L))
    val got = graft.llm.LayoutStore.readSnapshotTable(spark, state)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == Map(
      "x" -> ((2L, 4.0, 1.0, 3.0)),
      "y" -> ((1L, 5.0, 5.0, 5.0)),
      "z" -> ((1L, 2.0, 2.0, 2.0))), s"got $got")
  }

  test("aggMaintenanceBatch: replaying the same batch token folds ONCE " +
    "— foreachBatch is at-least-once, and a crash between the state " +
    "land and the offset commit must not double-count on restart") {
    val s = spark; import s.implicits._
    val state = tmpDir("aggm-replay") + "/state"
    val conf = spark.sparkContext.hadoopConfiguration
    def fold(rows: Seq[(String, Double)], token: String): Unit =
      Incremental.aggMaintenanceBatch(rows.toDF("k", "v"), token,
        keyCols = Seq("k"), sumCols = Seq("v"), minCols = Nil,
        maxCols = Nil, statePath = state)
    def read() = graft.llm.LayoutStore.readSnapshotTable(spark, state)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    fold(Seq("x" -> 1.0, "y" -> 5.0), "ck-0")
    fold(Seq("x" -> 3.0), "ck-1")
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L))
    assert(read() == Map("x" -> ((2L, 4.0)), "y" -> ((1L, 5.0))))
    // the crash replay: SAME token, same delta — no new version, no
    // double fold
    fold(Seq("x" -> 3.0), "ck-1")
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L),
      "a replayed batch must not land a new state version")
    assert(read() == Map("x" -> ((2L, 4.0)), "y" -> ((1L, 5.0))),
      "a replayed batch must not fold twice")
    // a DIFFERENT token with identical content is a genuinely new
    // batch (e.g. a recreated checkpoint restarting at batchId 0 —
    // the query-id half of the token keeps it distinct) and folds
    fold(Seq("x" -> 3.0), "ck2-0")
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L, 3L))
    assert(read() == Map("x" -> ((3L, 7.0)), "y" -> ((1L, 5.0))))
    assert(Incremental.appliedBatchToken(conf, state, 3L)
      .contains("ck2-0"))
  }

  test("aggMaintenanceBatch: the state is KEY-BUCKETED and a fold " +
    "physically rewrites only the buckets its keys touch — cold " +
    "buckets carry by manifest reference (files written ∝ touched " +
    "buckets, never ∝ state); a bucket-count change fails fast") {
    val s = spark; import s.implicits._
    val state = tmpDir("aggm-bucketed") + "/state"
    val conf = spark.sparkContext.hadoopConfiguration
    def fold(rows: Seq[(String, Double)], token: String,
             buckets: Int = 4): Unit =
      Incremental.aggMaintenanceBatch(rows.toDF("k", "v"), token,
        keyCols = Seq("k"), sumCols = Seq("v"), minCols = Nil,
        maxCols = Nil, statePath = state, stateBuckets = buckets)
    // batch 1: enough keys to populate all 4 buckets
    val keys1 = (0 until 40).map(i => (s"k$i", i.toDouble))
    fold(keys1, "b-0")
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    def kbDirs(v: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$state/version=$v"))
      .map(_.getPath.getName).filter(_.startsWith("kb=")).toSeq.sorted
    assert(kbDirs(1L).size == 4, s"40 keys must fill 4 buckets: ${kbDirs(1L)}")
    // batch 2 touches ONE key -> exactly one bucket lands physically
    val kb1 = spark.range(1)
      .select(pmod(xxhash64(lit("k1")), lit(4L)).cast("int"))
      .head.getInt(0)
    fold(Seq(("k1", 100.0)), "b-1")
    assert(kbDirs(2L) == Seq(s"kb=$kb1"),
      s"only the touched bucket may land physically: ${kbDirs(2L)}")
    // the manifest inherits the three cold buckets from version 1
    val manifest = graft.llm.LayoutStore.readManifest(conf, state, 2L).get
    assert(manifest.count { case (k, owner) =>
      k.startsWith("kb=") && owner == 1L } == 3,
      s"cold buckets must carry by reference: $manifest")
    // the served state equals the from-scratch aggregate
    val got = graft.llm.LayoutStore.readSnapshotTable(spark, state)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val expect = keys1.map { case (k, v) =>
      k -> ((if (k == "k1") 2L else 1L, if (k == "k1") 101.0 else v)) }.toMap
    assert(got == expect, s"got $got")
    // folding with a different bucket count must fail fast, not strand
    intercept[IllegalArgumentException](
      fold(Seq(("k2", 1.0)), "b-2", buckets = 8))
  }

  test("aggMaintenanceBatch: per-version write cost is batch-count-FLAT " +
    "— the 7th single-key fold writes exactly as many files as the 2nd " +
    "(nothing compounds per version; the r14 m58 watch item)") {
    val s = spark; import s.implicits._
    val state = tmpDir("aggm-flat") + "/state"
    val conf = spark.sparkContext.hadoopConfiguration
    def fold(rows: Seq[(String, Double)], token: String): Unit =
      Incremental.aggMaintenanceBatch(rows.toDF("k", "v"), token,
        keyCols = Seq("k"), sumCols = Seq("v"), minCols = Nil,
        maxCols = Nil, statePath = state, stateBuckets = 4)
    fold((0 until 40).map(i => (s"k$i", i.toDouble)), "f-0")
    for (i <- 1 to 6) fold(Seq(("k1", i.toDouble)), s"f-$i")
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    def dataFiles(v: Long): Int = {
      def walk(p: org.apache.hadoop.fs.Path): Int =
        fs.listStatus(p).map { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.startsWith("_") ||
            st.getPath.getName.startsWith(".")) 0
          else 1
        }.sum
      walk(new org.apache.hadoop.fs.Path(s"$state/version=$v"))
    }
    val perVersion = (2L to 7L).map(dataFiles)
    assert(perVersion.toSet.size == 1,
      s"single-key fold cost must not grow with version count: $perVersion")
  }

  test("cdcAggMaintenanceBatch: I/D micro-batches fold into the bucketed " +
    "state AND fact store — closed-form count/sum decrements, " +
    "delete-touched min/max rebuilt from the served facts, " +
    "fully-deleted keys vanish, replay skips both stores") {
    val s = spark; import s.implicits._
    val root = tmpDir("cdc-agg")
    val state = root + "/state"
    val facts = root + "/facts"
    val conf = spark.sparkContext.hadoopConfiguration
    def fold(rows: Seq[(Long, String, Double, String)],
             token: String): Unit =
      Incremental.cdcAggMaintenanceBatch(
        rows.toDF("pk", "k", "v", "op"), token,
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v"),
        statePath = state, factsPath = facts)
    def readState() = graft.llm.LayoutStore.readSnapshotTable(spark, state)
      .select("k", "n", "sum_v", "min_v", "max_v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // batch 1: inserts only (bootstraps both stores)
    fold(Seq((1L, "x", 1.0, "I"), (2L, "x", 9.0, "I"),
      (3L, "y", 5.0, "I")), "t0")
    assert(readState() == Map(
      "x" -> ((2L, 10.0, 1.0, 9.0)), "y" -> ((1L, 5.0, 5.0, 5.0))))
    // batch 2 deletes x's MAX: the closed form fixes n/sum, the repair
    // must rebuild min/max from the fact store (not carry stale 9.0)
    fold(Seq((2L, "x", 9.0, "D"), (4L, "y", 2.0, "I")), "t1")
    assert(readState() == Map(
      "x" -> ((1L, 1.0, 1.0, 1.0)), "y" -> ((2L, 7.0, 2.0, 5.0))))
    val vs = graft.llm.LayoutStore.versions(conf, state)
    val vf = graft.llm.LayoutStore.versions(conf, facts)
    // replaying t1 (crash between land and offset commit) must change
    // nothing on EITHER store
    fold(Seq((2L, "x", 9.0, "D"), (4L, "y", 2.0, "I")), "t1")
    assert(graft.llm.LayoutStore.versions(conf, state) == vs &&
      graft.llm.LayoutStore.versions(conf, facts) == vf,
      "a replayed batch must not land new versions")
    assert(readState() == Map(
      "x" -> ((1L, 1.0, 1.0, 1.0)), "y" -> ((2L, 7.0, 2.0, 5.0))))
    // batch 3 deletes every y row: the key must VANISH from the state
    // exactly as a from-scratch aggregate over post-apply facts would
    fold(Seq((3L, "y", 5.0, "D"), (4L, "y", 2.0, "D")), "t2")
    assert(readState() == Map("x" -> ((1L, 1.0, 1.0, 1.0))))
    // the served fact store is the post-apply multiset
    val factRows = graft.llm.LayoutStore.readSnapshotTable(spark, facts)
      .select("pk").collect().map(_.getLong(0)).sorted.toSeq
    assert(factRows == Seq(1L), s"fact store must hold only pk=1: $factRows")
  }

  test("cdcAggMaintenanceBatch auto-compaction: disabled and non-firing " +
    "policies land the identical version/manifest/marker surface; a " +
    "firing policy flattens the chain mid-stream with zero logical " +
    "change and the markers carried") {
    val s = spark; import s.implicits._
    import graft.llm.LayoutStore
    val conf = spark.sparkContext.hadoopConfiguration
    // one key bucket per batch (click/view/purchase hash to distinct
    // buckets at 16) → the manifest chain grows one owner per fold
    def run(root: String, pol: LayoutStore.CompactionPolicy)
        : (String, String) = {
      val state = root + "/state"; val facts = root + "/facts"
      def fold(rows: Seq[(Long, String, Double, String)], token: String) =
        Incremental.cdcAggMaintenanceBatch(
          rows.toDF("pk", "k", "v", "op"), token,
          pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
          minCols = Seq("v"), maxCols = Seq("v"),
          statePath = state, factsPath = facts, compaction = pol)
      fold(Seq((1L, "click", 1.0, "I"), (2L, "click", 9.0, "I")), "t0")
      fold(Seq((3L, "view", 5.0, "I")), "t1")
      fold(Seq((4L, "purchase", 2.0, "I")), "t2")
      (state, facts)
    }
    def surface(p: String) = {
      val vs = LayoutStore.versions(conf, p)
      (vs,
        vs.map(v => LayoutStore.effectiveEntries(conf, p, v)),
        vs.map(v => LayoutStore.readTextMarker(conf, s"$p/version=$v",
          Incremental.AppliedBatchMarker)))
    }
    def content(p: String) = LayoutStore.readSnapshotTable(spark, p)
      .select("k", "n", "sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val (sA, fA) = run(tmpDir("acp-off"), LayoutStore.CompactionPolicy())
    val (sB, fB) = run(tmpDir("acp-quiet"),
      LayoutStore.CompactionPolicy(maxManifestChain = Some(99)))
    assert(surface(sA) == surface(sB) && surface(fA) == surface(fB),
      "a policy that never fires must land the exact surface a " +
        "disabled policy does")
    assert(surface(sA)._1 == Seq(1L, 2L, 3L),
      s"three folds, three versions: ${surface(sA)._1}")
    val (sC, fC) = run(tmpDir("acp-fire"),
      LayoutStore.CompactionPolicy(maxManifestChain = Some(3)))
    for (p <- Seq(sC, fC)) {
      val vs = LayoutStore.versions(conf, p)
      assert(vs == Seq(1L, 2L, 3L, 4L),
        s"the third fold reaches chain depth 3 → one compaction: $vs")
      assert(LayoutStore.effectiveEntries(conf, p, 4L).values.toSet ==
        Set(4L), "the policy compaction must be full-physical")
      assert(LayoutStore.readTextMarker(conf, s"$p/version=4",
        Incremental.AppliedBatchMarker).contains("t2"),
        "auto-compaction must carry the replay token")
      assert(LayoutStore.readTextMarker(conf, s"$p/version=4",
        Incremental.StateBucketsMarker).contains("16"),
        "auto-compaction must carry the bucket-count marker")
    }
    def factRows(p: String) = LayoutStore.readSnapshotTable(spark, p)
      .select("pk", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(content(sC) == content(sA) && factRows(fC) == factRows(fA),
      "an auto-fired compaction changes nothing logical")
    // and a replayed batch still token-skips against the compacted head
    val vsBefore = LayoutStore.versions(conf, sC)
    Incremental.cdcAggMaintenanceBatch(
      Seq((4L, "purchase", 2.0, "I")).toDF("pk", "k", "v", "op"), "t2",
      pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
      minCols = Seq("v"), maxCols = Seq("v"),
      statePath = sC, factsPath = fC,
      compaction = LayoutStore.CompactionPolicy(maxManifestChain = Some(3)))
    assert(LayoutStore.versions(conf, sC) == vsBefore,
      "a replayed batch must not land versions even under a policy")
  }

  test("auto-compaction generalizes to the plain agg fold and the CC " +
    "label fold: the chain policy fires on both store kinds with zero " +
    "logical change, markers carried, sidecar included") {
    val s = spark; import s.implicits._
    import graft.llm.{Dedup, LayoutStore}
    val conf = spark.sparkContext.hadoopConfiguration
    val pol = LayoutStore.CompactionPolicy(maxManifestChain = Some(3))
    // plain agg fold: three single-key batches grow the chain to 3
    val aggState = tmpDir("acp-agg") + "/state"
    def aggFold(rows: Seq[(Long, String, Double)], token: String) =
      Incremental.aggMaintenanceBatch(rows.toDF("id", "k", "v"), token,
        keyCols = Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
        maxCols = Seq("v"), statePath = aggState, compaction = pol)
    aggFold(Seq((1L, "click", 1.0), (2L, "click", 3.0)), "a0")
    aggFold(Seq((3L, "view", 5.0)), "a1")
    aggFold(Seq((4L, "purchase", 2.0)), "a2")
    val aggVs = LayoutStore.versions(conf, aggState)
    assert(aggVs == Seq(1L, 2L, 3L, 4L) &&
      LayoutStore.effectiveEntries(conf, aggState, 4L).values.toSet ==
        Set(4L),
      s"the agg fold must auto-compact at chain depth 3: $aggVs")
    assert(LayoutStore.readTextMarker(conf, s"$aggState/version=4",
      Incremental.AppliedBatchMarker).contains("a2"))
    val aggRows = LayoutStore.readSnapshotTable(spark, aggState)
      .select("k", "n", "sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(aggRows == Set(("click", 2L, 4.0), ("view", 1L, 5.0),
      ("purchase", 1L, 2.0)), s"$aggRows")

    // CC label fold + pair-graph sidecar: disjoint edge batches touch
    // disjoint cluster buckets → the chain grows; both stores compact
    val ccState = tmpDir("acp-cc") + "/labels"
    val ccEdges = tmpDir("acp-cc") + "/edges"
    def ccFold(pairs: Seq[(Long, Long)], token: String) =
      Incremental.ccLabelMaintenanceBatch(pairs.toDF("id1", "id2"),
        token, "id1", "id2", ccState, clusterBuckets = 16,
        edgesPath = Some(ccEdges), compaction = pol)
    ccFold(Seq((1L, 2L)), "c0")
    ccFold(Seq((10L, 11L)), "c1")
    ccFold(Seq((20L, 21L)), "c2")
    for (p <- Seq(ccState, ccEdges)) {
      val vs = LayoutStore.versions(conf, p)
      val full = vs.filter(v =>
        LayoutStore.effectiveEntries(conf, p, v).values.toSet == Set(v))
      assert(full.exists(_ >= 3),
        s"the CC fold must auto-compact $p once the chain reaches 3: " +
          s"$vs full=$full")
    }
    val labels = LayoutStore.readSnapshotTable(spark, ccState)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L), s"$labels")
  }

  test("CompactionPolicy.retainVersions: retention prunes behind the " +
    "fold, the newest snapshot still serves the full state, and the " +
    "replay token survives on the retained head") {
    val s = spark; import s.implicits._
    import graft.llm.LayoutStore
    val conf = spark.sparkContext.hadoopConfiguration
    val state = tmpDir("acp-retain") + "/state"
    val pol = LayoutStore.CompactionPolicy(maxManifestChain = Some(3),
      retainVersions = Some(2))
    def fold(rows: Seq[(Long, String, Double)], token: String) =
      Incremental.aggMaintenanceBatch(rows.toDF("id", "k", "v"), token,
        keyCols = Seq("k"), sumCols = Seq("v"), minCols = Seq("v"),
        maxCols = Seq("v"), statePath = state, compaction = pol)
    fold(Seq((1L, "click", 1.0)), "r0")
    fold(Seq((2L, "view", 5.0)), "r1")
    fold(Seq((3L, "purchase", 2.0)), "r2") // chain 3 → compact → prune
    val vs = LayoutStore.versions(conf, state)
    assert(vs.length == 2 && vs.last == 4L,
      s"retention must keep the newest 2 serveable versions: $vs")
    // the retained head is the compacted full snapshot — content whole
    val rows = LayoutStore.readSnapshotTable(spark, state)
      .select("k", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("click" -> 1L, "view" -> 1L, "purchase" -> 1L),
      s"$rows")
    assert(LayoutStore.readTextMarker(conf, s"$state/version=4",
      Incremental.AppliedBatchMarker).contains("r2"),
      "the replay token must survive retention")
    // replaying r2 against the pruned+compacted head still skips
    fold(Seq((3L, "purchase", 2.0)), "r2")
    assert(LayoutStore.versions(conf, state) == vs,
      "replay must token-skip on the retained head")
  }

  test("maybeCompact: the fragmentation trigger fires a PARTIAL " +
    "compaction only when an entry exceeds the file bound; quiet " +
    "thresholds return None") {
    import graft.llm.LayoutStore
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val store = tmpDir("acp-frag") + "/layout"
    LayoutStore.writeSnapshot(conf, store) { tmp =>
      (1L to 64L).map(i => (i, (i % 4).toInt)).toDF("id", "day")
        .repartition(12)
        .write.partitionBy("day").parquet(tmp)
    }
    assert(LayoutStore.maybeCompact(spark, store,
      LayoutStore.CompactionPolicy(maxFilesPerEntry = Some(64))).isEmpty,
      "under-threshold fragmentation must not fire")
    assert(LayoutStore.maybeCompact(spark, store,
      LayoutStore.CompactionPolicy()).isEmpty,
      "a disabled policy must never fire")
    val v = LayoutStore.maybeCompact(spark, store,
      LayoutStore.CompactionPolicy(maxFilesPerEntry = Some(4)))
    assert(v.contains(2L), s"fragmented entries must fire a partial: $v")
    assert(LayoutStore.fragmentedEntries(conf, store, 2L, 4).isEmpty,
      "the fired partial must de-fragment the flagged entries")
  }

  test("cdcAggMaintenanceBatch: native 'U' events (beforeSuffix) are a " +
    "pk-replace on the fact store and a closed-form sum shift + min/max " +
    "repair on the state; without beforeSuffix, 'U' fails the pre-flight") {
    val s = spark; import s.implicits._
    val root = tmpDir("cdc-updates")
    val state = root + "/state"
    val facts = root + "/facts"
    def fold(rows: Seq[(Long, String, Double, java.lang.Double, String)],
             token: String): Unit =
      Incremental.cdcAggMaintenanceBatch(
        rows.toDF("pk", "k", "v", "v_before", "op"), token,
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v"),
        statePath = state, factsPath = facts,
        beforeSuffix = Some("_before"))
    def readState() = graft.llm.LayoutStore.readSnapshotTable(spark, state)
      .select("k", "n", "sum_v", "min_v", "max_v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val nb = null.asInstanceOf[java.lang.Double]
    fold(Seq((1L, "x", 1.0, nb, "I"), (2L, "x", 9.0, nb, "I"),
      (3L, "y", 5.0, nb, "I")), "u0")
    // update x's MAX down (9→4): n unchanged, sum shifts −5, and the
    // repair must rebuild max from the post-apply facts (not keep 9)
    fold(Seq((2L, "x", 4.0, java.lang.Double.valueOf(9.0), "U"),
      (4L, "y", 2.0, nb, "I")), "u1")
    assert(readState() == Map(
      "x" -> ((2L, 5.0, 1.0, 4.0)), "y" -> ((2L, 7.0, 2.0, 5.0))),
      s"${readState()}")
    // the fact store serves the after image exactly once, no before col
    val fdf = graft.llm.LayoutStore.readSnapshotTable(spark, facts)
    assert(!fdf.columns.contains("v_before"),
      "before images must never land in facts")
    val fRows = fdf.select("pk", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fRows == Map(1L -> 1.0, 2L -> 4.0, 3L -> 5.0, 4L -> 2.0),
      s"U must pk-replace in the fact store: $fRows")
    // without beforeSuffix the contract is unchanged: U is malformed
    // and fails BEFORE anything lands
    val root2 = tmpDir("cdc-updates-off")
    val conf = spark.sparkContext.hadoopConfiguration
    val e = intercept[IllegalArgumentException](
      Incremental.cdcAggMaintenanceBatch(
        Seq((9L, "x", 1.0, "U")).toDF("pk", "k", "v", "op"), "u2",
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Nil, maxCols = Nil,
        statePath = root2 + "/state", factsPath = root2 + "/facts"))
    assert(e.getMessage.contains("'U'"), e.getMessage)
    assert(graft.llm.LayoutStore.versions(conf, root2 + "/facts").isEmpty,
      "a U batch without beforeSuffix must not land anything")
  }

  test("cdcAggMaintenanceBatch: a malformed op fails fast BEFORE any " +
    "store version lands — no half-applied facts to token-skip later") {
    val s = spark; import s.implicits._
    val root = tmpDir("cdc-badop")
    val state = root + "/state"
    val facts = root + "/facts"
    val conf = spark.sparkContext.hadoopConfiguration
    val e = intercept[IllegalArgumentException](
      Incremental.cdcAggMaintenanceBatch(
        Seq((1L, "x", 1.0, "I"), (2L, "x", 2.0, "UPSERT"))
          .toDF("pk", "k", "v", "op"), "bad-0",
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Nil, maxCols = Nil,
        statePath = state, factsPath = facts))
    assert(e.getMessage.contains("UPSERT"))
    assert(graft.llm.LayoutStore.versions(conf, facts).isEmpty &&
      graft.llm.LayoutStore.versions(conf, state).isEmpty,
      "a malformed batch must not land anything on either store")
  }

  test("cdcAggMaintenanceBatch: a NULL op fails the pre-flight exactly " +
    "like an unknown op — it must never land a facts version that a " +
    "corrected replay would token-skip") {
    val s = spark; import s.implicits._
    val root = tmpDir("cdc-nullop")
    val state = root + "/state"
    val facts = root + "/facts"
    val conf = spark.sparkContext.hadoopConfiguration
    val e = intercept[IllegalArgumentException](
      Incremental.cdcAggMaintenanceBatch(
        Seq((1L, "x", 1.0, "I"), (2L, "x", 2.0, null: String))
          .toDF("pk", "k", "v", "op"), "null-0",
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Nil, maxCols = Nil,
        statePath = state, factsPath = facts))
    assert(e.getMessage.contains("<null>"), e.getMessage)
    assert(graft.llm.LayoutStore.versions(conf, facts).isEmpty &&
      graft.llm.LayoutStore.versions(conf, state).isEmpty,
      "a NULL-op batch must not land anything on either store")
  }

  test("cdcAggMaintenanceBatch: both stores are key-bucketed — a fold " +
    "physically rewrites only touched buckets, cold buckets carry by " +
    "manifest on the state AND fact store") {
    val s = spark; import s.implicits._
    val root = tmpDir("cdc-buckets")
    val state = root + "/state"
    val facts = root + "/facts"
    val conf = spark.sparkContext.hadoopConfiguration
    def fold(rows: Seq[(Long, String, Double, String)],
             token: String): Unit =
      Incremental.cdcAggMaintenanceBatch(
        rows.toDF("pk", "k", "v", "op"), token,
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Nil, maxCols = Nil,
        statePath = state, factsPath = facts, stateBuckets = 4)
    val batch1 = (0 until 40).map(i => (i.toLong, s"k$i", i.toDouble, "I"))
    fold(batch1, "c0")
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    def kbDirs(path: String, v: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/version=$v"))
      .map(_.getPath.getName).filter(_.startsWith("kb=")).toSeq.sorted
    assert(kbDirs(state, 1L).size == 4 && kbDirs(facts, 1L).size == 4)
    // one key touched -> exactly one bucket lands on each store
    val kb1 = spark.range(1)
      .select(pmod(xxhash64(lit("k1")), lit(4L)).cast("int")).head.getInt(0)
    fold(Seq((100L, "k1", 5.0, "I")), "c1")
    assert(kbDirs(state, 2L) == Seq(s"kb=$kb1"))
    assert(kbDirs(facts, 2L) == Seq(s"kb=$kb1"))
    for (path <- Seq(state, facts)) {
      val m = graft.llm.LayoutStore.readManifest(conf, path, 2L).get
      assert(m.count { case (k, owner) =>
        k.startsWith("kb=") && owner == 1L } == 3,
        s"cold buckets must carry by reference on $path: $m")
    }
    // a bucket-count change fails fast on the fact store too
    intercept[IllegalArgumentException](
      Incremental.cdcAggMaintenanceBatch(
        Seq((101L, "k2", 1.0, "I")).toDF("pk", "k", "v", "op"), "c2",
        pkCols = Seq("pk"), keyCols = Seq("k"), sumCols = Seq("v"),
        minCols = Nil, maxCols = Nil,
        statePath = state, factsPath = facts, stateBuckets = 8))
  }

  test("ccLabelMaintenanceBatch: cold bootstrap, per-batch folds, " +
    "replay token skip, and natural idempotency of a label fold") {
    val s = spark; import s.implicits._
    val state = tmpDir("cc-stream") + "/labels"
    val conf = spark.sparkContext.hadoopConfiguration
    def fold(edges: Seq[(Long, Long)], token: String): Unit =
      Incremental.ccLabelMaintenanceBatch(edges.toDF("id1", "id2"),
        token, "id1", "id2", state, clusterBuckets = 4)
    def read() = graft.llm.Dedup.readCcLabelStore(s, state).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch 0 bootstraps: CC of the batch alone
    fold(Seq((5L, 1L), (40L, 41L)), "ck-0")
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L))
    assert(read() == Map(1L -> 1L, 5L -> 1L, 40L -> 40L, 41L -> 40L))
    // batch 1 merges the two clusters and adds a new one
    fold(Seq((5L, 41L), (90L, 100L)), "ck-1")
    val expect = Map(1L -> 1L, 5L -> 1L, 40L -> 1L, 41L -> 1L,
      90L -> 90L, 100L -> 90L)
    assert(read() == expect)
    // replay of the SAME token: no new version, no refold
    fold(Seq((5L, 41L), (90L, 100L)), "ck-1")
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L),
      "a replayed batch must not land a new state version")
    // a DIFFERENT token with already-applied edges is a genuinely new
    // batch — it folds, and the fold is NATURALLY idempotent: nothing
    // merges, the version is all-carried, labels unchanged
    fold(Seq((5L, 41L)), "ck2-0")
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L, 3L))
    assert(read() == expect, "refolding applied edges must change nothing")
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/version=3"))
      .map(_.getPath.getName).count(_.startsWith("cb=")) == 0,
      "an idempotent refold must carry every bucket, write none")
    // an EMPTY first batch creates NO version (a hollow partitioned
    // write would be unreadable); the first real batch bootstraps
    val state2 = tmpDir("cc-stream-empty") + "/labels"
    Incremental.ccLabelMaintenanceBatch(
      Seq.empty[(Long, Long)].toDF("id1", "id2"), "e-0", "id1", "id2",
      state2, clusterBuckets = 4)
    assert(graft.llm.LayoutStore.versions(conf, state2).isEmpty,
      "an empty cold batch must not land a hollow version")
    Incremental.ccLabelMaintenanceBatch(
      Seq((7L, 3L)).toDF("id1", "id2"), "e-1", "id1", "id2", state2)
    assert(graft.llm.Dedup.readCcLabelStore(s, state2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(3L -> 3L, 7L -> 3L))
  }

  test("aggMaintenanceBatch: a pre-bucketing (single-file) state " +
    "migrates to the bucketed layout transparently on its first fold") {
    val s = spark; import s.implicits._
    val state = tmpDir("aggm-legacy") + "/state"
    val conf = spark.sparkContext.hadoopConfiguration
    // the old write shape: one flat parquet dir, no markers
    graft.llm.LayoutStore.writeSnapshot(conf, state)(tmp =>
      Seq(("x", 2L, 4.0), ("y", 1L, 5.0)).toDF("k", "n", "sum_v")
        .coalesce(1).write.mode("overwrite").parquet(tmp))
    Incremental.aggMaintenanceBatch(
      Seq(("x", 3.0)).toDF("k", "v"), "mig-0",
      keyCols = Seq("k"), sumCols = Seq("v"), minCols = Nil,
      maxCols = Nil, statePath = state, stateBuckets = 4)
    assert(graft.llm.LayoutStore.versions(conf, state) == Seq(1L, 2L))
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/version=2"))
      .map(_.getPath.getName).exists(_.startsWith("kb=")),
      "the migrated state must land bucketed")
    assert(Incremental.stateBucketCount(conf, state, 2L).contains(4))
    val got = graft.llm.LayoutStore.readSnapshotTable(spark, state)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("x" -> ((3L, 7.0)), "y" -> ((1L, 5.0))), s"$got")
  }
}

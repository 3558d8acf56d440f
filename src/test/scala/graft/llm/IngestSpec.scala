package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IngestSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("appendBm25Snapshot: merged snapshot is bit-identical to a " +
    "from-scratch index of the union; retired v1 still pins; collision " +
    "fails fast") {
    val s = spark; import s.implicits._
    val base = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "data stages and more data"),
      (3L, "an unrelated note")).toDF("doc_id", "text")
    val batch = Seq(
      (4L, "spark data arrives in a batch"),   // overlaps base vocab
      (5L, "entirely novel vocabulary here"),  // unseen terms: olddf = 0
      (6L, "")).toDF("doc_id", "text")         // tokenless doc: counts in N
    val store = tmpDir("ingest-bm25") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(base, store, termBuckets = 8) == 1L)
    assert(Ingest.appendBm25Snapshot(spark, store, batch) == 2L)
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
    // v1 pinned must NOT know the batch
    val q = Seq((100L, "spark data")).toDF("query_id", "qtext")
    val v1 = TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
      "query_id", "qtext", k = 10, version = Some(1L))
    assert(v1.where(col("doc_id") >= 4L).count() == 0)
    // rebuild-identity: postings AND stats, row for row
    val rebuilt = tmpDir("ingest-bm25-rebuilt") + "/store"
    TextAnalysis.writeBm25Snapshot(base.unionByName(batch), rebuilt,
      termBuckets = 8)
    def postings(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "postings")
        .select("term", "doc_id", "tf", "dl", "df")
        .collect().map(_.toSeq).toSet
    def stats(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "stats")
        .select("n", "tot", "term_buckets").head().toSeq
    assert(postings(store) == postings(rebuilt))
    assert(stats(store) == stats(rebuilt))
    // id collision: the closed-form merge would double-count — fail fast
    val dup = Seq((2L, "resubmitted")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Ingest.appendBm25Snapshot(spark, store, dup))
    assert(e.getMessage.contains("already present"))
    // and the failed append left no new version behind
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
  }

  test("appendIvfSnapshot: appended rows land in exactly the cells a " +
    "from-scratch assignment derives; old rows copy through; collision " +
    "fails fast") {
    val s = spark; import s.implicits._
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val base = Seq(
      (1L, Seq(0.1, 0.2)), (2L, Seq(9.0, 9.5))).toDF("vec_id", "embedding")
    val batch = Seq(
      (3L, Seq(0.3, -0.1)), (4L, Seq(11.0, 10.0))).toDF("vec_id", "embedding")
    val store = tmpDir("ingest-ivf") + "/store"
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      Similarity.writeIvfLayout(base, cents, tmp))
    assert(Ingest.appendIvfSnapshot(spark, store, batch, cents) == 2L)
    def rows(path: String) = spark.read.parquet(path)
      .select(col("vec_id"), col("cell").cast("int"))
      .collect().map(_.toSeq).toSet
    val fromScratch = tmpDir("ingest-ivf-rebuilt")
    Similarity.writeIvfLayout(base.unionByName(batch), cents, fromScratch)
    assert(rows(LayoutStore.snapshotPath(conf, store)) == rows(fromScratch))
    // v1 pinned: only the base rows
    assert(rows(LayoutStore.snapshotPath(conf, store, Some(1L)))
      .map(_.head) == Set(1L, 2L))
    val dup = Seq((1L, Seq(5.0, 5.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Ingest.appendIvfSnapshot(spark, store, dup, cents))
    assert(e.getMessage.contains("already present"))
  }

  test("appendSrpSnapshot: deterministic buckets land appended vectors " +
    "exactly where a from-scratch layout puts them") {
    val s = spark; import s.implicits._
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8.0 + j))))
      .toDF("vec_id", "embedding")
    val base = mk(0L until 30L)
    val batch = mk(100L until 120L)
    val store = tmpDir("ingest-srp") + "/store"
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      Similarity.writeSrpLayout(base, dim = 8, planes = 4, path = tmp))
    assert(Ingest.appendSrpSnapshot(spark, store, batch, dim = 8,
      planes = 4) == 2L)
    def rows(path: String) = spark.read.parquet(path)
      .select(col("vec_id"), col("bucket").cast("long"))
      .collect().map(_.toSeq).toSet
    val scratch = tmpDir("ingest-srp-scratch")
    Similarity.writeSrpLayout(base.unionByName(batch), dim = 8,
      planes = 4, path = scratch)
    val resolved = LayoutStore.readSnapshotTable(spark, store)
      .select(col("vec_id"), col("bucket").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(resolved == rows(scratch))
  }

  test("appendRowsSnapshot third instance: a z-order layout snapshot " +
    "grows in place, appended rows land in the from-scratch buckets") {
    val s = spark; import s.implicits._
    import graft.sinks.ZOrder
    val dims = Seq(ZOrder.Dim("x", 0L, 99L), ZOrder.Dim("y", 0L, 99L))
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, i * 31 % 100, i * 17 % 100)).toDF("id", "x", "y")
    val store = tmpDir("ingest-zorder") + "/store"
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      ZOrder.writeZOrderLayout(mk(0L until 300L), tmp, dims, 5, 16))
    val batch = mk(1000L until 1100L)
      .withColumn("zbucket", ZOrder.zbucketColumn(dims, 5, 16))
    assert(Ingest.appendRowsSnapshot(spark, store, batch, "zbucket",
      "id") == 2L)
    def rows(path: String) = spark.read.parquet(path)
      .select(col("id"), col("zbucket").cast("int"))
      .collect().map(_.toSeq).toSet
    val scratch = tmpDir("ingest-zorder-scratch")
    ZOrder.writeZOrderLayout(mk((0L until 300L) ++ (1000L until 1100L)),
      scratch, dims, 5, 16)
    assert(rows(LayoutStore.snapshotPath(conf, store)) == rows(scratch))
  }

  test("appendRowsSnapshot preserves string partition directories " +
    "byte-for-byte (inference pinned off: strata=01 must not re-land " +
    "as strata=1)") {
    val s = spark; import s.implicits._
    val store = tmpDir("ingest-string-part") + "/store"
    val base = Seq((1L, "01", 1.0), (2L, "10", 2.0)).toDF("id", "strata", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("strata")).write.partitionBy("strata").parquet(tmp))
    val batch = Seq((3L, "01", 3.0)).toDF("id", "strata", "v")
    assert(Ingest.appendRowsSnapshot(spark, store, batch, "strata", "id") == 2L)
    // the touched dir is physically rewritten with its string name
    // intact; the untouched one is a manifest reference — the NAME must
    // round-trip in the manifest key, not just on disk
    val v2 = LayoutStore.snapshotPath(conf, store)
    val fs = new org.apache.hadoop.fs.Path(v2).getFileSystem(conf)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(v2))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("strata=01"), s"got $dirs")
    assert(LayoutStore.readManifest(conf, store, 2L).get ==
      Map("strata=01" -> 2L, "strata=10" -> 1L))
    // read-back must pin inference off too (the layout readers do) —
    // with it on, the preserved strata=01 directory reads as int 1
    val rows = LayoutStore.withPartitionInferenceOff(spark) {
      LayoutStore.readSnapshotTable(spark, store)
        .select(col("id"), col("strata"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(rows == Set((1L, "01"), (2L, "10"), (3L, "01")))
  }

  test("appendShardSnapshot: metadata-only merge equals a from-scratch " +
    "assignment of the union; wrong salt trips the drift guard") {
    val s = spark; import s.implicits._
    val base = Seq.tabulate(40)(i => (i.toLong, 10L + i))
      .toDF("doc_id", "n_tokens")
    val batch = Seq.tabulate(20)(i => (100L + i, 5L + i))
      .toDF("doc_id", "n_tokens")
    val store = tmpDir("ingest-shards") + "/store"
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      Packing.writeShardLayout(
        Packing.shardAssign(base, "doc_id", col("n_tokens"), 4, "sA"), tmp))
    assert(Ingest.appendShardSnapshot(spark, store, batch, "doc_id",
      col("n_tokens"), 4, "sA") == 2L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("shard").cast("int"), col("pos"),
        col("n_tokens"))
      .collect().map(_.toSeq).toSet
    val merged = rows(spark.read.parquet(
      LayoutStore.snapshotPath(conf, store)))
    val scratch = rows(Packing.shardAssign(base.unionByName(batch),
      "doc_id", col("n_tokens"), 4, "sA"))
    assert(merged == scratch)
    // wrong salt: recomputed shards disagree with the stored layout
    val more = Seq((999L, 3L)).toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException](
      Ingest.appendShardSnapshot(spark, store, more, "doc_id",
        col("n_tokens"), 4, "WRONG"))
    assert(e.getMessage.contains("drift") ||
      e.getMessage.contains("disagrees"))
  }


  test("appendRowsSnapshot manifest version: untouched partition dirs " +
    "are inherited by reference (version cost ∝ touched dirs); only the " +
    "batch's partitions are physically written") {
    val s = spark; import s.implicits._
    val store = tmpDir("ingest-ct") + "/store"
    val base = (0L until 200L).map(i => (i, (i % 8).toInt, i * 1.5))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    val batch = Seq((1000L, 3, 10.0), (1001L, 3, 20.0)).toDF("id", "day", "v")
    assert(Ingest.appendRowsSnapshot(spark, store, batch, "day", "id") == 2L)
    // version cost ∝ touched dirs: v2 physically holds ONLY day=3; the
    // other 7 directories are inherited by manifest reference
    val v2dirs = new java.io.File(s"$store/version=2")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(v2dirs == Set("day=3"),
      s"untouched days must not be copied, got $v2dirs")
    val manifest = LayoutStore.readManifest(conf, store, 2L).get
    assert(manifest("day=3") == 2L)
    for (d <- 0 until 8 if d != 3)
      assert(manifest(s"day=$d") == 1L,
        s"day=$d carries no batch row — must be inherited from v1")
    val resolved = LayoutStore.readSnapshotTable(spark, store)
    assert(resolved.count() == 202L)
    assert(resolved.where(col("day") === 3)
      .select(col("id")).collect().map(_.getLong(0)).toSet ==
      ((0L until 200L).filter(_ % 8 == 3).toSet ++ Set(1000L, 1001L)))
  }

  test("appendRowsSnapshot falls back to the full rewrite on " +
    "escaping-prone partition values — no loss, no duplication") {
    val s = spark; import s.implicits._
    val store = tmpDir("ingest-ct-fallback") + "/store"
    val base = Seq((1L, "a b", 1.0), (2L, "c", 2.0)).toDF("id", "k", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("k")).write.partitionBy("k").parquet(tmp))
    val batch = Seq((3L, "a b", 3.0)).toDF("id", "k", "v")
    assert(Ingest.appendRowsSnapshot(spark, store, batch, "k", "id") == 2L)
    val rows = LayoutStore.withPartitionInferenceOff(spark) {
      spark.read.parquet(LayoutStore.snapshotPath(conf, store))
        .select(col("id"), col("k")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(rows == Set((1L, "a b"), (2L, "c"), (3L, "a b")))
  }

  test("appendRowsSnapshot: a value literally equal to the Hive null " +
    "sentinel never takes the fast path — on it, the directory name " +
    "collides with the null partition (the isin filter skips null rows " +
    "AND copy-through skips their dir: SILENT row loss). The fallback " +
    "full rewrite fails LOUDLY instead (Spark's own partitioned writer " +
    "cannot express null + literal sentinel side by side), and the " +
    "failed attempt leaves v1 intact with no abandoned dot-temp") {
    val s = spark; import s.implicits._
    val store = tmpDir("ingest-ct-sentinel") + "/store"
    // row 1's null value lands under the k=__HIVE_DEFAULT_PARTITION__ dir
    val base = Seq((1L, null: String, 1.0), (2L, "x", 2.0))
      .toDF("id", "k", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("k")).write.partitionBy("k").parquet(tmp))
    val batch = Seq((3L, "__HIVE_DEFAULT_PARTITION__", 3.0))
      .toDF("id", "k", "v")
    intercept[Exception](
      Ingest.appendRowsSnapshot(spark, store, batch, "k", "id"))
    // no v2 landed, the dot-temp was reclaimed, and every v1 row still
    // reads back — loud failure, zero loss
    assert(LayoutStore.versions(conf, store) == Seq(1L))
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).filter(_.startsWith("."))
    assert(leftovers.isEmpty, s"abandoned temp dirs: ${leftovers.toSeq}")
    val ids = spark.read.parquet(LayoutStore.snapshotPath(conf, store))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("appendBm25Snapshot manifest version: only the batch vocabulary's " +
    "tbucket dirs are physically written; the rest are manifest " +
    "references — and rebuild identity still holds") {
    val s = spark; import s.implicits._
    val base = (0L until 60L).map(i => (i, s"word$i shared${i % 6}"))
      .toDF("doc_id", "text")
    val store = tmpDir("ingest-bm25-ct") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(base, store, termBuckets = 16) == 1L)
    val batch = Seq((100L, "zzzuniq zzzuniq")).toDF("doc_id", "text")
    assert(Ingest.appendBm25Snapshot(spark, store, batch) == 2L)
    val touched = Seq("zzzuniq").toDF("term")
      .select(TextAnalysis.bm25TermBucket(col("term"), 16)).head().getInt(0)
    // v2 physically holds only the batch vocabulary's bucket; the rest
    // are manifest references into v1 — zero bytes moved for them
    val v2post = new java.io.File(s"$store/version=2/postings")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(v2post == Set(s"tbucket=$touched"),
      s"untouched buckets must not be copied, got $v2post")
    val manifest = LayoutStore.readManifest(conf, store, 2L).get
    val inherited = manifest.count { case (k, o) =>
      k.startsWith("postings/") && o == 1L }
    assert(inherited > 0, "fixture must leave untouched buckets to inherit")
    val rebuilt = tmpDir("ingest-bm25-ct-rb") + "/store"
    TextAnalysis.writeBm25Snapshot(base.unionByName(batch), rebuilt,
      termBuckets = 16)
    def postings(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "postings")
        .select("term", "doc_id", "tf", "dl", "df")
        .collect().map(_.toSeq).toSet
    assert(postings(store) == postings(rebuilt))
  }

  test("corpusDiff: all four statuses with exact counts and signed " +
    "token-mass deltas; a whitespace-only rewrite is unchanged") {
    val s = spark; import s.implicits._
    val prev = Seq(
      (1L, "alpha beta"),          // unchanged
      (2L, "gamma  delta"),        // whitespace-only rewrite -> unchanged
      (3L, "three word doc"),      // changed to one word: delta -2
      (4L, "going away now")).toDF("doc_id", "text") // removed: delta -3
    val cur = Seq(
      (1L, "alpha beta"),
      (2L, "gamma delta"),
      (3L, "shrunk"),
      (5L, "brand new doc here")).toDF("doc_id", "text") // added: delta +4
    val out = Ingest.corpusDiff(prev, cur)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "unchanged" -> ((2L, 0L)),
      "changed" -> ((1L, -2L)),
      "removed" -> ((1L, -3L)),
      "added" -> ((1L, 4L))))
  }

  test("appendBm25Snapshot: an EMPTY-VOCABULARY batch (tokenless docs) " +
    "lands a readable version — postings all carried, N grows, Σdl holds") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "data stages and more data")).toDF("doc_id", "text")
    val store = tmpDir("ingest-emptyvocab") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 8) == 1L)
    assert(Ingest.appendBm25Snapshot(spark, store,
      Seq((10L, ""), (11L, "   ")).toDF("doc_id", "text")) == 2L)
    val conf = spark.sparkContext.hadoopConfiguration
    val m = LayoutStore.readManifest(conf, store, 2L).get
    assert(m.filter(_._1.startsWith("postings")).values.toSet == Set(1L),
      s"no bucket touched — every postings entry must carry: $m")
    def postings(v: Long) =
      LayoutStore.readSnapshotTable(spark, store, "postings", Some(v))
        .select("term", "doc_id", "tf", "dl", "df")
        .collect().map(_.toSeq).toSet
    assert(postings(2L) == postings(1L))
    // N counts the tokenless docs (they shift avgdl); token mass doesn't
    assert(LayoutStore.readSnapshotTable(spark, store, "stats")
      .select("n", "tot").head().toSeq == Seq(4L, 10L))
  }
}

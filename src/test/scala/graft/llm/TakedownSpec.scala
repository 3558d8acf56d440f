package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TakedownSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("propagateBm25Snapshot: v2 is bit-identical to a from-scratch index " +
    "of the scrubbed corpus; the retired v1 still serves the revoked doc") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "revoked secret document about spark"),
      (3L, "data stages and more data"),
      (4L, "an unrelated note")).toDF("doc_id", "text")
    val revoked = Seq(2L).toDF("doc_id")
    val store = tmpDir("takedown-bm25") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 8) == 1L)
    assert(Takedown.propagateBm25Snapshot(spark, store, revoked, "doc_id") == 2L)
    // versioned retirement: both snapshots live until prune
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
    val q = Seq((100L, "spark data")).toDF("query_id", "qtext")
    val v1 = TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
      "query_id", "qtext", k = 10, version = Some(1L))
    assert(v1.where(col("doc_id") === 2L).count() == 1,
      "pinned v1 must still serve the revoked doc (auditable until prune)")
    val v2 = TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
      "query_id", "qtext", k = 10)
    assert(v2.where(col("doc_id") === 2L).count() == 0)
    // rebuild-identity: the propagated index == writeBm25Snapshot on the
    // scrubbed corpus, row for row (postings AND stats, not just top-k)
    val rebuilt = tmpDir("takedown-bm25-rebuilt") + "/store"
    TextAnalysis.writeBm25Snapshot(
      Takedown.scrubCorpus(docs, "doc_id", revoked, "doc_id"),
      rebuilt, termBuckets = 8)
    def postings(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "postings")
        .select("term", "doc_id", "tf", "dl", "df")
        .collect().map(_.toSeq).toSet
    def stats(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "stats")
        .select("n", "tot", "term_buckets").head().toSeq
    assert(postings(store) == postings(rebuilt))
    assert(stats(store) == stats(rebuilt))
  }

  test("propagateLayoutSnapshot: generic walk filters id-keyed sub-tables, " +
    "inherits meta sheets by reference, preserves string partition dirs, " +
    "lands version=2") {
    val s = spark; import s.implicits._
    val store = tmpDir("takedown-generic") + "/store"
    val rows = Seq((1L, "01", 1.0), (2L, "01", 2.0), (3L, "10", 3.0))
      .toDF("vec_id", "strata", "v")
    assert(LayoutStore.writeSnapshot(conf, store) { tmp =>
      rows.repartition(2).write.partitionBy("strata").parquet(s"$tmp/cells")
      Seq(("model", 7L)).toDF("name", "n").write.parquet(s"$tmp/meta")
    } == 1L)
    assert(Takedown.propagateLayoutSnapshot(spark,
      store, Seq(2L).toDF("vec_id"), "vec_id") == 2L)
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
    // only strata=01 (holding revoked id 2) is physically rewritten;
    // strata=10 and the whole meta sheet are manifest references
    val dirs = new java.io.File(s"$store/version=2/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("strata=01"), s"got $dirs")
    val manifest = LayoutStore.readManifest(conf, store, 2L).get
    assert(manifest == Map("cells/strata=01" -> 2L,
      "cells/strata=10" -> 1L, "meta" -> 1L))
    assert(LayoutStore.readSnapshotTable(spark, store, "cells")
      .select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // the meta sheet (no id column) is served untouched from v1
    assert(LayoutStore.readSnapshotTable(spark, store, "meta")
      .collect().map(_.toSeq).toSet == Set(Seq("model", 7L)))
    // v1 retains the revoked row until prune
    assert(LayoutStore.readSnapshotTable(spark, store, "cells", Some(1L))
      .select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
  }

  test("propagateLayoutSnapshot: a snapshot whose ROOT is the partitioned " +
    "table (writeIvfLayout-in-store shape) filters in place") {
    val s = spark; import s.implicits._
    val store = tmpDir("takedown-root") + "/store"
    val emb = (0L until 20L).map(i =>
      (i, Array.fill(4)((i % 5).toFloat + 1f))).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 1.0, 1.0, 1.0), Array(4.0, 4.0, 4.0, 4.0))
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      Similarity.writeIvfLayout(emb, cents, tmp))
    Takedown.propagateLayoutSnapshot(spark, store,
      Seq(3L, 7L).toDF("vec_id"), "vec_id")
    val ids = LayoutStore.readSnapshotTable(spark, store).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 20L).toSet -- Set(3L, 7L), s"got $ids")
    // cell= partition dirs survive for pruned probes (touched ones
    // physically, untouched ones through their owning version)
    assert(new java.io.File(LayoutStore.snapshotPath(conf, store))
      .listFiles().exists(f => f.isDirectory && f.getName.startsWith("cell=")))
  }

  private def fileSigs(dir: String): Set[(String, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(f => (f.getName, f.length)).toSet
  }

  test("propagateLayoutSnapshot manifest version: only partitions " +
    "containing a revoked row are physically written; every other dir " +
    "is INHERITED by manifest reference (zero bytes move) and the " +
    "resolver serves the full logical snapshot") {
    val s = spark; import s.implicits._
    val store = tmpDir("takedown-ct") + "/store"
    val rows = (0L until 160L).map(i => (i, (i % 8).toInt, i * 2.0))
      .toDF("vec_id", "cell", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      rows.repartition(col("cell")).write.partitionBy("cell").parquet(tmp))
    // revoked ids all live in cell=2 (ids ≡ 2 mod 8)
    val revoked = Seq(2L, 10L, 18L).toDF("vec_id")
    assert(Takedown.propagateLayoutSnapshot(spark, store, revoked,
      "vec_id") == 2L)
    val (v1, v2) = (s"$store/version=1", s"$store/version=2")
    // version cost ∝ touched dirs: cell=2 is the ONLY data dir under v2
    val v2dirs = new java.io.File(v2).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(v2dirs == Set("cell=2"),
      s"untouched cells must not be copied, got $v2dirs")
    val manifest = LayoutStore.readManifest(conf, store, 2L).get
    assert(manifest("cell=2") == 2L)
    for (c <- 0 until 8 if c != 2)
      assert(manifest(s"cell=$c") == 1L,
        s"cell=$c holds no revoked row — must be inherited from v1")
    // v1 still byte-intact, and the resolver serves the full snapshot
    assert(fileSigs(s"$v1/cell=3").nonEmpty)
    val ids = LayoutStore.readSnapshotTable(spark, store).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 160L).toSet -- Set(2L, 10L, 18L))
    // the survivors keep their partition values through the resolver
    val cells = LayoutStore.readSnapshotTable(spark, store)
      .groupBy(col("cell")).count().collect()
      .map(r => (r.get(0).toString.toInt, r.getLong(1))).toMap
    assert(cells == (0 until 8).map(c =>
      c -> (if (c == 2) 17L else 20L)).toMap)
  }

  test("propagateBm25Snapshot manifest version: only the revoked docs' " +
    "vocabulary buckets are physically written; untouched tbucket dirs " +
    "are inherited by manifest reference — and the closed-form repair " +
    "still matches the rebuild through the resolver") {
    val s = spark; import s.implicits._
    // doc 7's vocabulary is one unique term: its removal touches exactly
    // that term's bucket
    val docs = (0L until 40L).map(i =>
      (i, if (i == 7L) "qqqonly" else s"w$i base${i % 4}"))
      .toDF("doc_id", "text")
    val store = tmpDir("takedown-bm25-ct") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 16) == 1L)
    assert(Takedown.propagateBm25Snapshot(spark, store,
      Seq(7L).toDF("doc_id"), "doc_id") == 2L)
    val touched = Seq("qqqonly").toDF("term")
      .select(TextAnalysis.bm25TermBucket(col("term"), 16)).head().getInt(0)
    // v2 physically holds ONLY the touched bucket (+ fresh stats)
    val v2post = new java.io.File(s"$store/version=2/postings")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(v2post == Set(s"tbucket=$touched"),
      s"untouched buckets must not be copied, got $v2post")
    val manifest = LayoutStore.readManifest(conf, store, 2L).get
    assert(manifest(s"postings/tbucket=$touched") == 2L)
    assert(manifest("stats") == 2L)
    val inherited = manifest.count { case (k, o) =>
      k.startsWith("postings/") && o == 1L }
    assert(inherited > 0, "fixture must leave untouched buckets to inherit")
    val rebuilt = tmpDir("takedown-bm25-ct-rb") + "/store"
    TextAnalysis.writeBm25Snapshot(docs.where(col("doc_id") =!= 7L),
      rebuilt, termBuckets = 16)
    def postings(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "postings")
        .select("term", "doc_id", "tf", "dl", "df")
        .collect().map(_.toSeq).toSet
    def stats(path: String) =
      LayoutStore.readSnapshotTable(spark, path, "stats")
        .select("n", "tot", "term_buckets").head().toSeq
    assert(postings(store) == postings(rebuilt))
    assert(stats(store) == stats(rebuilt))
  }

  test("propagateShardSnapshot: filtered + re-ranked pos equals a " +
    "from-scratch shardAssign on the scrubbed corpus") {
    val s = spark; import s.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i word" * (i % 7 + 1).toInt))
      .toDF("doc_id", "text")
    val nTok = TextAnalysis.tokenCount(col("text")).cast("long")
    val assigned = Packing.shardAssign(docs, "doc_id", nTok,
      nShards = 4, salt = "tk")
    val store = tmpDir("takedown-shards") + "/store"
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      Packing.writeShardLayout(assigned, tmp))
    val revoked = docs.where(col("doc_id") % 6 === 1).select("doc_id")
    assert(Takedown.propagateShardSnapshot(spark, store, revoked,
      "doc_id") == 2L)
    val got = spark.read
      .parquet(LayoutStore.snapshotPath(conf, store))
      .select("doc_id", "shard", "pos", "n_tokens")
      .collect().map(_.toSeq).toSet
    val want = Packing.shardAssign(
      Takedown.scrubCorpus(docs, "doc_id", revoked, "doc_id"),
      "doc_id", nTok, nShards = 4, salt = "tk")
      .select("doc_id", "shard", "pos", "n_tokens")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("scrubSignatureState: revoked rows leave, format stamp survives, " +
    "and a copy of revoked content flags keep=true against the scrub") {
    val s = spark; import s.implicits._
    val hist = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "revoked text that must be forgotten by the state"))
      .toDF("doc_id", "text")
    val base = tmpDir("takedown-state")
    Dedup.writeSignatureState(
      Dedup.signatureState(hist, "doc_id", "text"), s"$base/sigs",
      mode = "overwrite")
    Takedown.scrubSignatureState(spark, s"$base/sigs",
      Seq(2L).toDF("doc_id"), "doc_id", s"$base/scrubbed")
    val st = Dedup.readSignatureState(spark, s"$base/scrubbed")
    assert(st.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(st.columns.contains("sig_format"))
    // a re-ingest of the revoked text is NEW to the scrubbed state...
    val batch = Seq((10L, "revoked text that must be forgotten by the state"),
      (11L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val dec = Dedup.incrementalDedup(batch, st, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(dec == Map(10L -> true, 11L -> false), s"got $dec")
  }

  test("auditRevocations: newest version reads 0 everywhere, the retired " +
    "version still shows its counts (the prune report)") {
    val s = spark; import s.implicits._
    val store = tmpDir("takedown-audit") + "/store"
    val rows = (1L to 10L).map(i => (i, s"row $i")).toDF("doc_id", "payload")
    LayoutStore.writeSnapshot(conf, store) { tmp =>
      rows.write.parquet(s"$tmp/data")
      Seq(("meta", 1L)).toDF("name", "v").write.parquet(s"$tmp/meta")
    }
    val revoked = Seq(3L, 7L).toDF("doc_id")
    Takedown.propagateLayoutSnapshot(spark, store, revoked, "doc_id")
    val audit = Takedown.auditRevocations(spark, store, revoked, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(audit == Map((1L, "data") -> 2L, (1L, "meta") -> 0L,
      (2L, "data") -> 0L, (2L, "meta") -> 0L), s"got $audit")
  }

  test("propagateLayoutSnapshot on the EDIT INDEX (which stores reference " +
    "TEXT): revoked rows leave texts AND segs, meta's k survives, the " +
    "probe stops flagging copies of revoked content") {
    val s = spark; import s.implicits._
    val store = tmpDir("takedown-editidx") + "/store"
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "revoked reference text that must leave the index fully"))
      .toDF("doc_id", "text")
    assert(Dedup.writeEditIndexSnapshot(ref, "doc_id", "text", k = 3,
      store) == 1L)
    val batch = Seq(
      (10L, "revoked reference text that must leave the index full"), // d1 of 2
      (11L, "the quick brown fox jumps over the lazy dog tonite")) // d2 of 1
      .toDF("doc_id", "text")
    val before = Dedup.editDupFlags(spark, batch, "doc_id", "text", store)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(before == Map(10L -> true, 11L -> true), s"got $before")
    assert(Takedown.propagateLayoutSnapshot(spark, store,
      Seq(2L).toDF("doc_id"), "doc_id", idCols = Seq("id")) == 2L)
    assert(LayoutStore.readSnapshotTable(spark, store, "texts")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(LayoutStore.readSnapshotTable(spark, store, "segs")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    // the k stamp is inherited — a k-mismatch probe must still fail fast
    assert(LayoutStore.readSnapshotTable(spark, store, "meta")
      .head().getInt(0) == 3)
    val after = Dedup.editDupFlags(spark, batch, "doc_id", "text", store)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(after == Map(10L -> false, 11L -> true),
      s"index still remembers revoked text: $after")
  }

  test("resolveRevocations: URL requests match by CANONICAL form, " +
    "fingerprint requests catch every verbatim copy, ids pass through") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "http://ex.com/a?x=1&y=2", "doc one text"),
      (2L, "http://ex.com/b", "Shared   Revoked Text"),
      (3L, "http://other.org/c", "shared revoked text"), // verbatim copy of 2
      (4L, "http://ex.com/d", "doc four text"),
      (5L, "http://ex.com/e", "doc five text"))
      .toDF("doc_id", "url", "text")
    // the request URL is differently-messy: case, param order, fragment
    val urlSheet = Seq("HTTP://EX.com/a?y=2&x=1#frag").toDF("req_url")
    // the fingerprint request submits the text with different whitespace
    val fpSheet = Seq("  shared revoked  TEXT ").toDF("req_text")
    val ids = Takedown.resolveRevocations(corpus, "doc_id",
      byIds = Some(Seq(5L).toDF("doc_id")),
      byUrls = Some((urlSheet, "req_url", "url")),
      byFingerprints = Some((fpSheet, "req_text", "text")))
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 5L), s"got $ids")
    intercept[IllegalArgumentException](
      Takedown.resolveRevocations(corpus, "doc_id"))
    // a multi-column id sheet is ambiguous — silently taking the first
    // column could resolve the WRONG ids (and the requested content
    // keeps serving); demand a single-column sheet
    intercept[IllegalArgumentException](
      Takedown.resolveRevocations(corpus, "doc_id",
        byIds = Some(Seq(("note", 5L)).toDF("reason", "doc_id"))))
  }

  test("propagateBm25Snapshot: removedDocCount restores rebuild identity " +
    "when a TOKENLESS doc is revoked (the postings can't see it); an " +
    "undercount trips the guard") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "revoked secret document about spark"),
      (3L, "data stages and more data"),
      (5L, "")).toDF("doc_id", "text") // doc 5: zero tokens
    val revoked = Seq(2L, 5L).toDF("doc_id")
    val store = tmpDir("takedown-bm25-tokenless") + "/store"
    TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 8)
    assert(Takedown.propagateBm25Snapshot(spark, store, revoked, "doc_id",
      removedDocCount = Some(2L)) == 2L)
    val rebuilt = tmpDir("takedown-bm25-tokenless-rb") + "/store"
    TextAnalysis.writeBm25Snapshot(
      Takedown.scrubCorpus(docs, "doc_id", revoked, "doc_id"),
      rebuilt, termBuckets = 8)
    def stats(path: String) = spark.read
      .parquet(s"${LayoutStore.snapshotPath(conf, path)}/stats")
      .select("n", "tot", "term_buckets").head().toSeq
    assert(stats(store) == stats(rebuilt),
      "caller-supplied removedDocCount must make N/avgdl match the " +
        "from-scratch index of the scrubbed corpus exactly")
    // undercount: doc 1 visibly leaves the postings but the caller
    // claims zero removed docs — fail fast rather than land stale stats
    intercept[IllegalArgumentException](
      Takedown.propagateBm25Snapshot(spark, store, Seq(1L).toDF("doc_id"),
        "doc_id", removedDocCount = Some(0L)))
  }

  test("propagateBm25Snapshot: corpusDocIds derives the present-doc count " +
    "via semi-join — a revocation sheet listing never-ingested ids no " +
    "longer over-decrements N; invalid counts fail BEFORE any write") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "revoked secret document about spark"),
      (3L, "data stages and more data"),
      (5L, "")).toDF("doc_id", "text") // doc 5: zero tokens
    // the realistic sheet shape: two present docs (one tokenless) plus
    // two ids the corpus never contained / already removed
    val revoked = Seq(2L, 5L, 77L, 99L).toDF("doc_id")
    val store = tmpDir("takedown-bm25-sheet") + "/store"
    TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 8)
    assert(Takedown.propagateBm25Snapshot(spark, store, revoked, "doc_id",
      corpusDocIds = Some(docs.select("doc_id"))) == 2L)
    val rebuilt = tmpDir("takedown-bm25-sheet-rb") + "/store"
    TextAnalysis.writeBm25Snapshot(
      Takedown.scrubCorpus(docs, "doc_id", revoked, "doc_id"),
      rebuilt, termBuckets = 8)
    def stats(path: String) = spark.read
      .parquet(s"${LayoutStore.snapshotPath(conf, path)}/stats")
      .select("n", "tot", "term_buckets").head().toSeq
    assert(stats(store) == stats(rebuilt),
      "semi-join-derived count must make N/avgdl match the from-scratch " +
        "index of the scrubbed corpus exactly")
    // the raw sheet size (4) disagrees with the 2 present docs — the
    // mismatch fails fast when both are given
    intercept[IllegalArgumentException](
      Takedown.propagateBm25Snapshot(spark, store, revoked, "doc_id",
        version = Some(1L), removedDocCount = Some(4L),
        corpusDocIds = Some(docs.select("doc_id"))))
    // a claimed count beyond the snapshot's own doc count is impossible —
    // the upper guard catches sheet-size over-decrements even without a
    // doc-id source
    intercept[IllegalArgumentException](
      Takedown.propagateBm25Snapshot(spark, store, revoked, "doc_id",
        version = Some(1L), removedDocCount = Some(5L)))
    // every rejected call failed BEFORE writing: no v3 landed, and no
    // abandoned dot-temp remains under the store
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).filter(_.startsWith("."))
    assert(leftovers.isEmpty, s"abandoned temp dirs: ${leftovers.toSeq}")
  }

  test("expandRevocations: the seed's whole near-dup cluster joins the " +
    "set; unclustered seeds expand to themselves") {
    val s = spark; import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base), (2L, base + " rev"), (3L, base + " rev two"),
      (4L, "completely different content about other things entirely"),
      (5L, "another standalone document with its own words"))
      .toDF("doc_id", "text")
    val expanded = Takedown.expandRevocations(corpus, "doc_id", "text",
      Seq(2L, 5L).toDF("doc_id"), "doc_id", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    // 2's cluster {1,2,3} joins; 5 is a singleton -> itself; 4 untouched
    assert(expanded == Set(1L, 2L, 3L, 5L), s"got $expanded")
  }

  test("takedown takes effect MID-STREAM: propagateBenchKeys lands while " +
    "a decontamination stream is deployed; the next batch stops flagging " +
    "the revoked eval doc — zero restart") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("takedown-stream")
    val (keysPath, outPath) = (s"$base/keys", s"$base/out")
    val evalA = "alpha beta gamma delta epsilon zeta eta theta"
    val evalB = "totally clean reference answer sheet content here"
    val bench = Seq((1L, evalA), (2L, evalB)).toDF("doc_id", "text")
    Dedup.writeBenchKeysSnapshot(bench, "text", keysPath, k = 3)

    def runOnce(ck: String, docs: (String, String)*): Unit = {
      val input = MemoryStream[(String, String)]
      input.addData(docs: _*)
      val q = graft.streaming.Incremental.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        keysPath, outPath, s"$base/$ck", k = 3)
      try q.awaitTermination(60000) finally q.stop()
    }
    runOnce("ck1", ("t1", evalA), ("t2", evalB))
    val out1 = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out1 == Map("t1" -> true, "t2" -> true), s"got $out1")
    // doc 1's takedown lands as the next snapshot (scrub + rebuild);
    // the deployed stream re-pins on its NEXT batch — no restart
    assert(Takedown.propagateBenchKeys(
      Takedown.scrubCorpus(bench, "doc_id", Seq(1L).toDF("doc_id"),
        "doc_id"), "text", keysPath, k = 3) == 2L)
    runOnce("ck2", ("t3", evalA), ("t4", evalB))
    val out2 = spark.read.parquet(outPath)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!out2("t3"), s"revoked doc's keys still flagging: $out2")
    assert(out2("t4"), s"surviving eval doc's keys must stay live: $out2")
  }

  test("propagateBenchKeys: the rebuild case — next version carries only " +
    "the scrubbed sheet's shingles; readers pin it; v1 retains") {
    val s = spark; import s.implicits._
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "revoked eval prompt one two three four five"))
      .toDF("doc_id", "text")
    val store = tmpDir("takedown-bench") + "/keys"
    assert(Dedup.writeBenchKeysSnapshot(bench, "text", store, k = 8) == 1L)
    assert(Takedown.propagateBenchKeys(
      Takedown.scrubCorpus(bench, "doc_id", Seq(2L).toDF("doc_id"), "doc_id"),
      "text", store, k = 8) == 2L)
    val flags = Dedup.contaminationFlagsAgainstKeys(bench,
      Dedup.readBenchKeysLatest(spark, store, k = 8), "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags == Map(1L -> true, 2L -> false),
      s"revoked doc's keys must be retired from the live set: $flags")
    assert(Dedup.benchKeyVersions(conf, store) == Seq(1L, 2L))
  }

  test("propagateBm25Snapshot: a ZERO-HIT revocation (ids never ingested) " +
    "lands a readable all-carried version — no hollow postings dir") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "data stages and more data"),
      (3L, "an unrelated note")).toDF("doc_id", "text")
    val store = tmpDir("takedown-zerohit") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 8) == 1L)
    // routine real-sheet input: ids already removed / never ingested
    assert(Takedown.propagateBm25Snapshot(spark, store,
      Seq(100L, 101L).toDF("doc_id"), "doc_id") == 2L)
    val m = LayoutStore.readManifest(conf, store, 2L).get
    assert(m.filter(_._1.startsWith("postings")).values.toSet == Set(1L),
      s"every postings entry must carry by reference: $m")
    assert(m("stats") == 2L, s"stats rewrite is owned by the new version: $m")
    // the LATEST version is fully readable and identical to v1
    def postings(v: Long) =
      LayoutStore.readSnapshotTable(spark, store, "postings", Some(v))
        .select("term", "doc_id", "tf", "dl", "df")
        .collect().map(_.toSeq).toSet
    assert(postings(2L) == postings(1L))
    assert(LayoutStore.readSnapshotTable(spark, store, "stats")
      .select("n", "tot").head().toSeq == Seq(3L, 13L))
    val q = Seq((100L, "spark data")).toDF("query_id", "qtext")
    assert(TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
      "query_id", "qtext", k = 10).count() > 0)
  }
}

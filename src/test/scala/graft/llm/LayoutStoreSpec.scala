package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Manifest-referenced snapshot versions: version cost ∝ touched dirs
  * (untouched entries are inherited by reference, zero bytes move),
  * retired versions stay readable until pruned, and prune's GC deletes
  * exactly the dirs no surviving manifest references. */
class LayoutStoreSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def dataDirs(path: String): Set[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet

  test("manifest round-trip and resolver equivalence: a chain of " +
    "manifested appends serves exactly what a physical snapshot would; " +
    "owners always point at the PHYSICAL owner (one hop)") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-chain") + "/store"
    val base = (0L until 80L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    // v2 touches day=1; v3 touches day=2 — day=0/day=3 stay owned by v1
    assert(Ingest.appendRowsSnapshot(spark, store,
      Seq((100L, 1, 9.0)).toDF("id", "day", "v"), "day", "id") == 2L)
    assert(Ingest.appendRowsSnapshot(spark, store,
      Seq((101L, 2, 9.0)).toDF("id", "day", "v"), "day", "id") == 3L)
    val m3 = LayoutStore.readManifest(conf, store, 3L).get
    assert(m3 == Map("day=0" -> 1L, "day=1" -> 2L, "day=2" -> 3L,
      "day=3" -> 1L), s"chained owners must stay physical: $m3")
    // every version stays independently readable (retire-by-pin)
    assert(LayoutStore.readSnapshotTable(spark, store, "", Some(1L))
      .count() == 80L)
    assert(LayoutStore.readSnapshotTable(spark, store, "", Some(2L))
      .count() == 81L)
    val v3 = LayoutStore.readSnapshotTable(spark, store)
    assert(v3.count() == 82L)
    // resolver output == a from-scratch physical write of the same rows
    val scratch = tmpDir("ls-chain-scratch")
    base.unionByName(Seq((100L, 1, 9.0), (101L, 2, 9.0))
        .toDF("id", "day", "v"))
      .repartition(col("day")).write.mode("overwrite")
      .partitionBy("day").parquet(scratch)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("day").cast("int"), col("v"))
        .collect().map(_.toSeq).toSet
    assert(rows(v3) == rows(spark.read.parquet(scratch)))
  }

  test("resolver keeps partition pruning: a day filter over a manifested " +
    "snapshot scans only the matching partition dirs of each owner") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val store = tmpDir("ls-prune-scan") + "/store"
    val base = (0L until 80L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    Ingest.appendRowsSnapshot(spark, store,
      Seq((100L, 1, 9.0)).toDF("id", "day", "v"), "day", "id")
    val probe = LayoutStore.readSnapshotTable(spark, store)
      .where(col("day") === 3)
    val scanned = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount
    }.sum
    assert(scanned == 1,
      s"day=3 lives in ONE owner partition dir, scanned $scanned")
    assert(probe.count() == 20L)
  }

  test("prune GC: an exclusively-owned version deletes wholesale; a " +
    "referenced one retires in place keeping ONLY referenced dirs; once " +
    "the last referencing snapshot is pruned the leftovers disappear") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-gc") + "/store"
    val base = (0L until 80L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    Ingest.appendRowsSnapshot(spark, store,
      Seq((100L, 1, 9.0)).toDF("id", "day", "v"), "day", "id") // v2
    Ingest.appendRowsSnapshot(spark, store,
      Seq((101L, 1, 8.0)).toDF("id", "day", "v"), "day", "id") // v3
    // retain v3 only. v2's day=1 is superseded (v3 rewrote it) → v2 is
    // exclusively-owned → deletes wholesale. v1's day=0/2/3 are still
    // referenced by v3 → v1 retires in place, day=1 (superseded) gone.
    assert(LayoutStore.prune(conf, store, retain = 1) == Seq(1L, 2L))
    assert(LayoutStore.versions(conf, store) == Seq(3L))
    assert(!new java.io.File(s"$store/version=2").exists(),
      "v2 owned nothing any survivor references — must delete wholesale")
    assert(dataDirs(s"$store/version=1") == Set("day=0", "day=2", "day=3"),
      "v1 must keep exactly the dirs v3 references")
    assert(new java.io.File(s"$store/version=1/_retired").exists())
    // retired dirs are NOT serveable, but v3 still reads through them
    intercept[IllegalArgumentException](
      LayoutStore.readSnapshotTable(spark, store, "", Some(1L)))
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 82L)
    // a compaction re-materializes v4 physically; pruning to it sweeps
    // the retired v1 leftovers AND v3
    assert(LayoutStore.compactSnapshot(spark, store) == 4L)
    assert(LayoutStore.prune(conf, store, retain = 1) == Seq(3L))
    assert(!new java.io.File(s"$store/version=1").exists(),
      "nothing references v1 anymore — the retired leftovers must delete")
    assert(!new java.io.File(s"$store/version=3").exists())
    assert(LayoutStore.versions(conf, store) == Seq(4L))
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 82L)
  }

  test("compactSnapshotPartial: only entries over the file threshold " +
    "rewrite (cost ∝ fragmentation); the cold dirs carry by reference; " +
    "rows and partition values survive exactly") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-partial") + "/store"
    val rows = (0L until 320L).map(i => (i, (i % 8).toInt, i * 1.0))
      .toDF("id", "day", "v")
    // day=3 lands as 8 files (fragmented); every other day as 1
    LayoutStore.writeSnapshot(conf, store) { tmp =>
      rows.where(col("day") =!= 3).repartition(col("day"))
        .write.partitionBy("day").parquet(tmp)
      rows.where(col("day") === 3).repartition(8)
        .write.mode("append").partitionBy("day").parquet(tmp)
    }
    val frag = LayoutStore.fragmentedEntries(conf, store, 1L,
      maxFilesPerEntry = 4)
    assert(frag.keySet == Set("day=3") && frag("day=3") == 8, s"$frag")
    assert(LayoutStore.compactSnapshotPartial(spark, store,
      maxFilesPerEntry = 4) == 2L)
    // v2 physically holds ONLY the compacted day=3 (now few files)
    val v2dirs = dataDirs(s"$store/version=2")
    assert(v2dirs == Set("day=3"), s"got $v2dirs")
    assert(LayoutStore.fragmentedEntries(conf, store, 2L, 4).isEmpty)
    val manifest = LayoutStore.readManifest(conf, store, 2L).get
    assert(manifest("day=3") == 2L)
    for (d <- 0 until 8 if d != 3)
      assert(manifest(s"day=$d") == 1L, s"day=$d must carry by reference")
    // exact row multiset + partition values survive
    val got = LayoutStore.readSnapshotTable(spark, store)
      .select(col("id"), col("day").cast("int"), col("v"))
      .collect().map(_.toSeq).toSet
    assert(got == rows.collect().map(_.toSeq).toSet)
  }

  test("the full lifecycle chains: physical build → manifested append → " +
    "partial compact → another append → prune; owners stay one-hop and " +
    "the logical content is exact at every step") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-chain-full") + "/store"
    val base = (0L until 160L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store) { tmp =>
      base.where(col("day") =!= 3).repartition(col("day"))
        .write.partitionBy("day").parquet(tmp)
      base.where(col("day") === 3).repartition(8)
        .write.mode("append").partitionBy("day").parquet(tmp)
    }
    Ingest.appendRowsSnapshot(spark, store,
      Seq((200L, 1, 9.0)).toDF("id", "day", "v"), "day", "id") // v2
    LayoutStore.compactSnapshotPartial(spark, store,
      maxFilesPerEntry = 4) // v3: rewrites day=3 only
    Ingest.appendRowsSnapshot(spark, store,
      Seq((201L, 0, 8.0)).toDF("id", "day", "v"), "day", "id") // v4
    val m4 = LayoutStore.readManifest(conf, store, 4L).get
    assert(m4 == Map("day=0" -> 4L, "day=1" -> 2L, "day=2" -> 1L,
      "day=3" -> 3L), s"owners must stay one-hop physical: $m4")
    val ids = LayoutStore.readSnapshotTable(spark, store).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 160L).toSet ++ Set(200L, 201L))
    // prune to the newest: v1 retires keeping only day=2 (day=0/1/3 are
    // superseded by 4/2/3), v2 keeps day=1, v3 keeps day=3
    assert(LayoutStore.prune(conf, store, retain = 1) == Seq(1L, 2L, 3L))
    assert(dataDirs(s"$store/version=1") == Set("day=2"))
    assert(dataDirs(s"$store/version=2") == Set("day=1"))
    assert(dataDirs(s"$store/version=3") == Set("day=3"))
    assert(LayoutStore.readSnapshotTable(spark, store).select("id")
      .collect().map(_.getLong(0)).toSet ==
      (0L until 160L).toSet ++ Set(200L, 201L))
  }

  test("an all-carried build lands a readable version: partial compaction " +
    "of an UNFRAGMENTED store writes nothing yet still versions (the " +
    "documented no-op contract)") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-allcarried") + "/store"
    val rows = (0L until 40L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      rows.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    assert(LayoutStore.fragmentedEntries(conf, store, 1L, 8).isEmpty)
    assert(LayoutStore.compactSnapshotPartial(spark, store,
      maxFilesPerEntry = 8) == 2L)
    val m = LayoutStore.readManifest(conf, store, 2L).get
    assert(m.values.toSet == Set(1L), s"every entry must carry: $m")
    assert(dataDirs(s"$store/version=2").isEmpty,
      "an all-carried version owns no data dirs")
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 40L)
  }

  test("prune crash-safety: the retired marker lands BEFORE any delete — " +
    "a crash mid-GC leaves a loudly-unpinnable version (never a silent " +
    "partial read) and a re-run converges to the uncrashed end state") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-crash") + "/store"
    val base = (0L until 80L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    Ingest.appendRowsSnapshot(spark, store,
      Seq((100L, 1, 9.0)).toDF("id", "day", "v"), "day", "id") // v2
    // simulate the state the marker-first ordering guarantees a crash
    // leaves behind: marker present, manifest and data still intact
    new java.io.File(s"$store/version=1/_retired").createNewFile()
    assert(LayoutStore.versions(conf, store) == Seq(2L),
      "a marked version must be hidden from the serveable list")
    intercept[IllegalArgumentException](
      LayoutStore.readSnapshotTable(spark, store, "", Some(1L)))
    // the newest snapshot still resolves THROUGH the marked version's
    // dirs (path-level reads ignore the marker)
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 81L)
    // re-running the GC completes it: v1 keeps exactly what v2 references
    assert(LayoutStore.prune(conf, store, retain = 1).isEmpty,
      "v1 is already retired — nothing NEW leaves the serveable list")
    assert(dataDirs(s"$store/version=1") == Set("day=0", "day=2", "day=3"))
    assert(!new java.io.File(s"$store/version=1/_manifest.json").exists())
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 81L)
  }

  test("compactSnapshotPartial preserves MULTI-LEVEL partition chains: " +
    "the inner column re-lands as a partition directory, not a string " +
    "data column") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-multilevel") + "/store"
    val rows = (0 until 320).map(i =>
      (i.toLong, i / 160, i % 4, i * 1.0)).toDF("id", "day", "hour", "v")
    // day=1 lands fragmented (8-way repartition scatters every hour dir)
    LayoutStore.writeSnapshot(conf, store) { tmp =>
      rows.where(col("day") === 0)
        .repartition(col("day"), col("hour"))
        .write.partitionBy("day", "hour").parquet(tmp)
      rows.where(col("day") === 1).repartition(8)
        .write.mode("append").partitionBy("day", "hour").parquet(tmp)
    }
    val frag = LayoutStore.fragmentedEntries(conf, store, 1L,
      maxFilesPerEntry = 8)
    assert(frag.keySet == Set("day=1"), s"$frag")
    assert(LayoutStore.compactSnapshotPartial(spark, store,
      maxFilesPerEntry = 8) == 2L)
    // the rewritten entry keeps the full day=/hour= chain physically
    val hours = dataDirs(s"$store/version=2/day=1")
    assert(hours == Set("hour=0", "hour=1", "hour=2", "hour=3"), s"$hours")
    // the inner column is a PARTITION column: a leaf-dir read must see
    // only the data columns (hour re-landing as a string data column is
    // exactly the silent flattening this guards against)
    assert(spark.read.parquet(s"$store/version=2/day=1/hour=2")
      .columns.toSet == Set("id", "v"))
    val got = LayoutStore.readSnapshotTable(spark, store)
      .select(col("id"), col("day").cast("int"), col("hour").cast("int"),
        col("v")).collect().map(_.toSeq).toSet
    assert(got == rows.collect().map(_.toSeq).toSet)
  }

  test("compactSnapshot re-materializes a manifested snapshot as ONE " +
    "physical version (the copy path) — manifest-free, same rows") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-compact") + "/store"
    val base = (0L until 40L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store)(tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    Ingest.appendRowsSnapshot(spark, store,
      Seq((100L, 1, 9.0)).toDF("id", "day", "v"), "day", "id")
    assert(LayoutStore.compactSnapshot(spark, store) == 3L)
    assert(LayoutStore.readManifest(conf, store, 3L).isEmpty,
      "compaction output is fully physical")
    assert(dataDirs(s"$store/version=3") ==
      Set("day=0", "day=1", "day=2", "day=3"))
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 41L)
  }

  test("compaction carries text markers (replay tokens, bucket counts, " +
    "codebooks) — they describe the LOGICAL snapshot — but never the " +
    "manifest or _SUCCESS, which are version-local bookkeeping") {
    val s = spark; import s.implicits._
    val store = tmpDir("ls-markers") + "/store"
    val base = (0L until 40L).map(i => (i, (i % 4).toInt, i * 1.0))
      .toDF("id", "day", "v")
    LayoutStore.writeSnapshot(conf, store) { tmp =>
      base.repartition(col("day")).write.partitionBy("day").parquet(tmp)
      LayoutStore.writeTextMarker(conf, tmp, "_applied_batch", "tok-7")
      LayoutStore.writeTextMarker(conf, tmp, "_state_buckets", "4")
    }
    // full compaction
    val v2 = LayoutStore.compactSnapshot(spark, store)
    assert(LayoutStore.readTextMarker(conf, s"$store/version=$v2",
      "_applied_batch").contains("tok-7"))
    assert(LayoutStore.readTextMarker(conf, s"$store/version=$v2",
      "_state_buckets").contains("4"))
    // partial compaction (all-carried here — markers still land)
    val v3 = LayoutStore.compactSnapshotPartial(spark, store,
      maxFilesPerEntry = 64)
    assert(LayoutStore.readTextMarker(conf, s"$store/version=$v3",
      "_applied_batch").contains("tok-7"))
    assert(LayoutStore.readTextMarker(conf, s"$store/version=$v3",
      "_state_buckets").contains("4"))
    // the partial version's own manifest must be ITS entry map, not a
    // copied-in stale one (manifest is excluded from the carry)
    assert(LayoutStore.readManifest(conf, store, v3).exists(
      _.values.forall(_ == v2)),
      "the manifest must be the version's own, referencing v2 owners")
    assert(LayoutStore.readSnapshotTable(spark, store).count() == 40L)
  }
}

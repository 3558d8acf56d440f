package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.io.File

class SinksSpec extends SparkTestBase {

  private def df100 = {
    val s = spark; import s.implicits._
    (1 to 100).map(i => (i.toLong, s"name$i", i % 7)).toDF("id", "name", "grp")
  }

  test("bloomDedupAgainstExisting == plain anti-join; bloom prunes the join " +
    "input; null keys kept") {
    val s = spark; import s.implicits._
    val existing = (0L until 300L).map(i => s"key-$i").toDF("k")
    val batch = ((100L until 1100L).map(i => Some(s"key-$i")) :+ None)
      .toDF("k").withColumn("payload", col("k"))
    val plain = Sinks.dedupAgainstExisting(batch, existing, Seq("k"))
      .collect().map(_.getString(1)).toSet
    val bloom = Sinks.bloomDedupAgainstExisting(batch, existing, "k",
      expectedItems = 300)
    val bloomed = bloom.collect().map(_.getString(1)).toSet
    assert(bloomed == plain, "bloom pre-filter must not change the result")
    assert(plain.contains(null), "null keys never equal an existing key")
    // the probe guards both branches (the executed plan constant-folds it
    // into the LocalTableScan here; d20 over parquet runs the codegen)
    val analyzed = bloom.queryExecution.analyzed.toString
    assert(analyzed.contains("bloom_contains"),
      s"expected the bloom probe in the plan:\n$analyzed")
    // empty / all-null existing keys: everything is new (the plain
    // anti-join's answer), not an NPE from a null bloom aggregate
    val empty = Seq.empty[String].toDF("k")
    assert(Sinks.bloomDedupAgainstExisting(batch, empty, "k", 10).count()
      == batch.count())
    val allNull = Seq(Option.empty[String]).toDF("k")
    assert(Sinks.bloomDedupAgainstExisting(batch, allNull, "k", 10).count()
      == batch.count())
  }

  test("bloomDedup candidate-prune path: == plain anti-join; the existing " +
    "side joins by broadcast only (never a shuffle join) even with " +
    "auto-broadcast disabled") {
    val s = spark; import s.implicits._
    val existing = (0L until 300L).map(i => s"key-$i").toDF("k")
    val batch = ((100L until 1100L).map(i => Some(s"key-$i")) :+ None)
      .toDF("k").withColumn("payload", col("k"))
    val plain = Sinks.dedupAgainstExisting(batch, existing, Seq("k"))
      .collect().map(_.getString(1)).toSet
    // simulate the un-broadcastable multi-TB existing table: the prune
    // path's EXPLICIT small-side broadcasts must carry the whole plan
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    confs.foreach(spark.conf.set(_, "-1"))
    try {
      val pruned = Sinks.bloomDedupAgainstExisting(batch, existing, "k",
        expectedItems = 300, pruneExistingByCandidates = true)
      assert(pruned.collect().map(_.getString(1)).toSet == plain,
        "candidate prune must not change the result")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast semi/anti joins in:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"existing side must never reach a shuffle join:\n$plan")
    } finally confs.foreach(spark.conf.unset)
  }

  test("bloomDedup candidate-prune guard: an oversized candidate set falls " +
    "back to the plain anti-join (identical result, no candidate broadcast)") {
    val s = spark; import s.implicits._
    val existing = (0L until 300L).map(i => s"key-$i").toDF("k")
    val batch = ((100L until 1100L).map(i => Some(s"key-$i")) :+ None)
      .toDF("k").withColumn("payload", col("k"))
    val plain = Sinks.dedupAgainstExisting(batch, existing, Seq("k"))
      .collect().map(_.getString(1)).toSet
    // a 1-byte threshold trips the guard for any non-empty batch
    val guarded = Sinks.bloomDedupAgainstExisting(batch, existing, "k",
      expectedItems = 300, pruneExistingByCandidates = true,
      maxCandidateBroadcastBytes = 1L)
    assert(guarded.collect().map(_.getString(1)).toSet == plain,
      "fallback must preserve the anti-join result")
    // the fallback plan is the plain residual anti-join: no left-semi
    // prune of the existing side (the candidate broadcast never happens)
    val analyzed = guarded.queryExecution.analyzed.toString
    assert(!analyzed.contains("LeftSemi"),
      s"guard tripped but the prune semi-join is still in the plan:\n$analyzed")
  }

  test("bloomDedup pre-built-filter overload: == plain anti-join; a " +
    "superset filter stays correct (extra keys are just candidates)") {
    val s = spark; import s.implicits._
    val existing = (0L until 300L).map(i => s"key-$i").toDF("k")
    val batch = ((100L until 1100L).map(i => Some(s"key-$i")) :+ None)
      .toDF("k").withColumn("payload", col("k"))
    val plain = Sinks.dedupAgainstExisting(batch, existing, Seq("k"))
      .collect().map(_.getString(1)).toSet
    // exact filter
    val bf = existing.stat.bloomFilter("k", 300, 0.01)
    val got = Sinks.bloomDedupAgainstExisting(batch, existing, "k", bf,
      pruneExistingByCandidates = false, maxCandidateBroadcastBytes = 64L << 20)
      .collect().map(_.getString(1)).toSet
    assert(got == plain)
    // superset filter (covers keys the table does NOT hold): those rows
    // become candidates, the exact join re-verifies, result unchanged
    val superset = existing.unionByName(
      (5000L until 5500L).map(i => s"key-$i").toDF("k"))
    val bfSuper = superset.stat.bloomFilter("k", 800, 0.01)
    val gotSuper = Sinks.bloomDedupAgainstExisting(batch, existing, "k", bfSuper,
      pruneExistingByCandidates = true, maxCandidateBroadcastBytes = 64L << 20)
      .collect().map(_.getString(1)).toSet
    assert(gotSuper == plain, "superset filter must not change the result")
  }

  test("bloomDedup fails fast when the filter would exceed maxFilterBytes") {
    val s = spark; import s.implicits._
    val existing = Seq("a", "b").toDF("k")
    // 10^10 keys at 1% fpp ~ 12 GB >> the 256 MB default guard
    val e = intercept[IllegalArgumentException] {
      Sinks.bloomDedupAgainstExisting(existing, existing, "k",
        expectedItems = 10000000000L)
    }
    assert(e.getMessage.contains("maxFilterBytes"))
    // the guard formula itself: ~1.2 bytes/key at 1% fpp
    val est = Sinks.bloomFilterBytes(1000000000L, 0.01)
    assert(est > 1100000000L && est < 1300000000L, s"estimate off: $est")
  }

  test("csv round-trip with header") {
    val out = tmpDir("csv-out")
    Sinks.writeFile(df100, out, Sinks.FileSinkConfig(format = "csv", header = true))
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == 100)
    assert(back.columns.toSeq == Seq("id", "name", "grp"))
  }

  test("maxRecordsPerFile bounds output file size (reference target-file-size)") {
    val out = tmpDir("maxrec")
    Sinks.writeFile(df100.repartition(1), out,
      Sinks.FileSinkConfig(format = "parquet", maxRecordsPerFile = Some(10L)))
    val parts = new File(out).listFiles().count(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts >= 10, s"expected >=10 part files, got $parts")
    assert(spark.read.parquet(out).count() == 100)
  }

  test("partitionBy produces hive-style directories") {
    val out = tmpDir("partby")
    Sinks.writeFile(df100, out, Sinks.FileSinkConfig(partitionBy = Seq("grp")))
    val dirs = new File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("grp=")) == 7)
    assert(spark.read.parquet(out).count() == 100)
  }

  test("error table preserves the reference's public error schema") {
    val out = tmpDir("errors")
    val errs = df100.withColumn("error_message", lit("boom"))
    Sinks.writeErrorTable(errs, out, appId = "test-app", rowKeyCol = "id")
    val back = spark.read.parquet(out)
    // ErrorTableUtil.java:93-190 contract
    assert(back.columns.toSet ==
      Set("row_key", "source_data", "exception", "changelog_columns", "app_id", "error_date"))
    assert(back.where("app_id = 'test-app'").count() == 100)
    assert(back.select("exception").distinct().head().getString(0) == "boom")
    // source_data JSON round-trips the original row minus the error column
    val sd = back.where("row_key = '1'").select("source_data").head().getString(0)
    assert(sd.contains(""""name":"name1""""))
    assert(!sd.contains("error_message"))
  }

  test("dedupAgainstExisting = left-anti on keys (HoodieSink DEDUP_INSERT)") {
    val s = spark; import s.implicits._
    val incoming = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("key", "v")
    val existing = (1 to 5).map(i => (i.toLong, "old")).toDF("key", "w")
    val out = Sinks.dedupAgainstExisting(incoming, existing, Seq("key"))
    assert(out.select("key").as[Long].collect().sorted.toSeq == (6L to 10L))
    // incoming columns preserved
    assert(out.columns.toSeq == Seq("key", "v"))
  }

  test("sortedForBulkLoad: partitions internally sorted and range-disjoint") {
    val s = spark; import s.implicits._
    val shuffled = scala.util.Random.shuffle((1 to 1000).toList)
      .map(i => (i.toLong, i % 3)).toDF("k", "v")
    val sorted = Sinks.sortedForBulkLoad(shuffled, Seq("k"), numPartitions = Some(4))
    val perPart = sorted.select("k").rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val ks = it.map(_.getLong(0)).toVector
        if (ks.isEmpty) Iterator.empty
        else Iterator((pid, ks.min, ks.max, ks == ks.sorted))
      }.collect().sortBy(_._1)
    assert(perPart.forall(_._4), "a partition was not internally sorted")
    perPart.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) =>
        assert(max1 <= min2, "partition ranges overlap")
      case _ =>
    }
  }

  test("hudi option mapping encodes op modes and dedup flags") {
    val opts = Sinks.hudiOptions("t", "id", "ds", Sinks.DedupInsert)
    assert(opts("hoodie.datasource.write.operation") == "insert")
    assert(opts("hoodie.datasource.write.insert.drop.duplicates") == "true")
    val bulk = Sinks.hudiOptions("t", "id", "ds", Sinks.BulkInsert)
    assert(bulk("hoodie.datasource.write.operation") == "bulk_insert")
    assert(bulk("hoodie.datasource.write.insert.drop.duplicates") == "false")
  }
}

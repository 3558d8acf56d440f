package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {

  private def docs = {
    val s = spark; import s.implicits._
    // token counts 0..40, including zero-token and longer-than-budget docs
    (1L to 200L).map(i => (i, ("w " * ((i % 41).toInt)).trim))
      .toDF("doc_id", "text")
  }

  private val nTok = TextAnalysis.tokenCount(col("text")).cast("long")

  test("packSequences == the single-global-window formulation, bit-identical, " +
    "at any partitioning and prefix width") {
    val ref = Packing.packSequencesGlobal(docs, "doc_id", nTok, budget = 64)
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 7); pc <- Seq(1, 2, 3)) {
      val got = Packing.packSequences(docs.repartition(parts), "doc_id", nTok,
        budget = 64, prefixChars = pc).collect().map(_.toSeq).toSet
      assert(got == ref, s"two-phase diverged at parts=$parts prefixChars=$pc")
    }
  }

  test("packing invariants: contiguous axis, spans math, zero-token docs") {
    val out = Packing.packSequences(docs, "doc_id", nTok, budget = 64)
      .orderBy("start_tok").collect()
    // the axis is contiguous: each start is the previous start + n_tokens
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
        s"gap on the token axis at ${b.getLong(0)}")
      case _ => ()
    }
    out.foreach { r =>
      val (n, start, seq, off, spans) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(seq == start / 64 && off == start % 64)
      val expSpans = if (n == 0) 1L else (start + n - 1) / 64 - seq + 1
      assert(spans == expSpans, s"spans wrong for doc ${r.getLong(0)}")
    }
    // a doc longer than the budget must span > 1 sequence somewhere
    val long = Packing.packSequences(docs, "doc_id", nTok, budget = 16)
      .where(col("n_tokens") > 16).collect()
    assert(long.nonEmpty && long.forall(_.getLong(5) > 1))
  }

  test("the corpus-sized window is bucket-partitioned (no global sort of " +
    "the input); bucket totals ride the SAME exchange (one scan+tokenize); " +
    "only the tiny bucket-offset frame sees a global window") {
    val out = Packing.packSequences(docs, "doc_id", nTok, budget = 64)
    val opt = out.queryExecution.optimizedPlan.toString
    assert(opt.contains("windowspecdefinition(__b"),
      s"main cumulative sum must partition by bucket:\n$opt")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange"),
      s"bucket totals must reuse the repartition(__b) exchange:\n$plan")
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    // determinism guard: same output twice
    assert(out.collect().map(_.toSeq).toSet ==
      Packing.packSequences(docs, "doc_id", nTok, budget = 64)
        .collect().map(_.toSeq).toSet)
  }

  test("shardAssign: shard ids in range and balanced, pos dense 0..n-1 per " +
    "shard, deterministic across partitioning, stats reconcile") {
    val nShards = 8
    val ref = Packing.shardAssign(docs, "doc_id", nTok, nShards, salt = "t")
      .collect().map(_.toSeq).toSet
    val re = Packing.shardAssign(docs.repartition(7), "doc_id", nTok,
      nShards, salt = "t")
    assert(re.collect().map(_.toSeq).toSet == ref,
      "shard layout changed under repartitioning")
    val rows = ref.toSeq.map(r => (r(1).asInstanceOf[Int],
      r(2).asInstanceOf[Int], r(3).asInstanceOf[Long]))
    assert(rows.size == 200)
    assert(rows.forall { case (sh, _, _) => sh >= 0 && sh < nShards })
    // dense in-shard positions: each shard's pos set is exactly 0..n-1
    rows.groupBy(_._1).foreach { case (sh, g) =>
      assert(g.map(_._2).sorted == (0 until g.size),
        s"shard $sh positions not dense")
    }
    // uniform hash balance: with 200 docs over 8 shards no shard should
    // be empty or hold more than 3x the fair share
    val sizes = rows.groupBy(_._1).map(_._2.size)
    assert(sizes.size == nShards && sizes.max <= 75, s"skewed: $sizes")
    // stats reconcile with the assignment
    val stats = Packing.shardStats(
        Packing.shardAssign(docs, "doc_id", nTok, nShards, salt = "t"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (sh, g) =>
      assert(stats(sh) == (g.size.toLong, g.map(_._3).sum))
    }
    // different salt -> different layout (the epoch lever)
    val other = Packing.shardAssign(docs, "doc_id", nTok, nShards, salt = "u")
      .collect().map(_.toSeq).toSet
    assert(other != ref)
  }

  test("shardAssignBalanced: every (stratum, shard) count within 1 BY " +
    "CONSTRUCTION on a skewed mix; banded == naive single window; " +
    "prefixChars invariant; reserved columns rejected") {
    val s = spark; import s.implicits._
    // heavily skewed mix: 160 'web', 30 'wiki', 10 'code'
    val mixed = (0 until 200).map { i =>
      (i.toLong, if (i < 160) "web" else if (i < 190) "wiki" else "code")
    }.toDF("doc_id", "src")
    val out = Packing.shardAssignBalanced(mixed, "doc_id", "src",
      nShards = 8, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    assert(out.length == 200)
    // exact mix preservation: per (stratum, shard) counts differ <= 1
    out.groupBy(_._2).foreach { case (st, g) =>
      val byShard = g.groupBy(_._4).map(_._2.size)
      assert(byShard.max - byShard.min <= 1,
        s"stratum $st skewed across shards: $byShard")
    }
    // 10 'code' docs round-robin over 8 shards: two shards get 2, the
    // rest 1 — no shard ever holds 3
    assert(out.filter(_._2 == "code").groupBy(_._4).forall(_._2.size <= 2))
    // banded two-phase == the naive one-window-per-stratum formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("__k"), col("doc_id"))
    val naive = mixed
      .withColumn("__k", Sampling.sampleKey(col("doc_id"), "t"))
      .withColumn("pos_s", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("src"), col("pos_s"),
        (col("pos_s") % 8).cast("int").as("shard"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(out.toSet == naive, "banded form diverged from the naive window")
    // band width cannot change the answer (prefix of the sort key)
    val p1 = Packing.shardAssignBalanced(mixed, "doc_id", "src",
      nShards = 8, salt = "t", prefixChars = 1)
      .collect().map(_.toSeq).toSet
    assert(p1 == out.map(t => Seq(t._1, t._2, t._3, t._4)).toSet)
    val e = intercept[IllegalArgumentException](
      Packing.shardAssignBalanced(mixed.withColumn("__sk", lit("x")),
        "doc_id", "src", 8))
    assert(e.getMessage.contains("__sk"))
  }

  test("shardAssign: nShards=1 puts everything in shard 0 in global hash " +
    "order; bad nShards rejected") {
    val one = Packing.shardAssign(docs, "doc_id", nTok, 1, salt = "t").collect()
    assert(one.forall(_.getInt(1) == 0))
    assert(one.map(_.getInt(2)).sorted.toSeq == (0 until 200))
    intercept[IllegalArgumentException](
      Packing.shardAssign(docs, "doc_id", nTok, 0))
    intercept[IllegalArgumentException](
      Packing.shardAssign(docs.withColumn("__v", lit(1)), "doc_id", nTok, 4))
  }

  test("writeShardLayout: one file per shard dir, rows inside each file " +
    "already in pos order, round-trip preserves the assignment") {
    val nShards = 4
    val assigned = Packing.shardAssign(docs, "doc_id", nTok, nShards, salt = "t")
    val path = tmpDir("shard-layout") + "/layout"
    Packing.writeShardLayout(assigned, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length == nShards, s"expected $nShards shard dirs")
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: expected one file per shard")
      // in-file order IS pos order: a trainer streams the file as-is
      val pos = spark.read.parquet(files.head.getPath)
        .select(col("pos")).collect().map(_.getInt(0)).toSeq
      assert(pos == (0 until pos.size), s"${d.getName} not pos-ordered: $pos")
    }
    val back = spark.read.parquet(path)
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"))
      .collect().map(_.toSeq).toSet
    assert(back == assigned.collect().map(_.toSeq).toSet)
  }

  test("writeBalancedShardLayout: in-file order is (turn, strata) — any " +
    "contiguous window carries the mix — and the round-trip preserves " +
    "the assignment") {
    val s = spark; import s.implicits._
    val nShards = 4
    val mixed = (0 until 120).map { i =>
      (i.toLong, if (i < 80) "web" else if (i < 110) "wiki" else "code")
    }.toDF("doc_id", "src")
    val assigned = Packing.shardAssignBalanced(mixed, "doc_id", "src",
      nShards, salt = "t")
    val path = tmpDir("bal-layout") + "/layout"
    Packing.writeBalancedShardLayout(assigned, nShards, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length == nShards)
    dirs.foreach { d =>
      val rows = spark.read.parquet(d.getPath)
        .select(col("pos_s"), col("strata")).collect()
        .map(r => (r.getLong(0) / nShards, r.getString(1))).toSeq
      assert(rows == rows.sorted,
        s"${d.getName} not in (turn, strata) order: $rows")
      // mix-local: within one turn, at most one doc per stratum
      rows.groupBy(identity).foreach { case (k, g) =>
        assert(g.size == 1, s"${d.getName}: duplicate $k in a turn")
      }
    }
    val back = spark.read.parquet(path)
      .select(col("id"), col("strata"), col("pos_s"), col("shard"))
      .collect().map(_.toSeq).toSet
    assert(back == assigned.collect().map(_.toSeq).toSet)
  }

  test("repeatSchedule: per-doc epoch counts honored, 0-epoch docs drop, " +
    "each epoch's order is a distinct deterministic permutation") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 2), (2L, 1), (3L, 0)).toDF("doc_id", "ne")
    val out = Packing.repeatSchedule(df, "doc_id", col("ne"), salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.map(t => (t._1, t._2)).toSet ==
      Set((1L, 0), (1L, 1), (2L, 0)), s"got ${out.toSeq}")
    // epoch 0 and epoch 1 give doc 1 different order keys (fresh
    // shuffle per epoch), and keys are stable across invocations
    val k = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(k(0) != k(1))
    val again = Packing.repeatSchedule(df, "doc_id", col("ne"), salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(again == out.toSet)
  }

  test("bad specs rejected; reserved columns rejected") {
    intercept[IllegalArgumentException](
      Packing.packSequences(docs, "doc_id", nTok, budget = 0))
    intercept[IllegalArgumentException](
      Packing.packSequences(docs, "doc_id", nTok, budget = 64, prefixChars = 0))
    intercept[IllegalArgumentException](
      Packing.packSequences(docs.withColumn("__b", lit(1)), "doc_id", nTok, 64))
  }

  test("budgetSelect == the single-global-window formulation at any " +
    "partitioning and band count") {
    val score = nTok * 7 % 13 // an integer signal with heavy ties
    val ref = Packing.budgetSelectGlobal(docs, "doc_id", nTok, score,
      budget = 2000).collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 7); bands <- Seq(1, 4, 64)) {
      val got = Packing.budgetSelect(docs.repartition(parts), "doc_id",
        nTok, score, budget = 2000, bands = bands)
        .collect().map(_.toSeq).toSet
      assert(got == ref, s"banded prefix sum diverged at parts=$parts bands=$bands")
    }
  }

  test("budgetSelect: whole-doc-fits rule at the budget boundary; zero " +
    "budget selects only zero-token docs; guards") {
    val s = spark; import s.implicits._
    val tiny = Seq((1L, 10L, 100L), (2L, 10L, 60L), (3L, 9L, 50L),
      (4L, 0L, 8L)).toDF("doc_id", "n", "sc")
    // order: sc desc -> 1 (cum 0), 2 (cum 10), 3 (cum 20), 4 (cum 29)
    val out = Packing.budgetSelect(tiny, "doc_id", col("n"), col("sc"),
      budget = 25, bands = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(out == Map(1L -> (0L, true), 2L -> (10L, true),
      3L -> (20L, false), 4L -> (29L, false)), s"got $out")
    // doc 3 does NOT fit (20+9 > 25) even though 5 tokens of budget
    // remain — the whole-doc rule, no partial docs
    val zero = Packing.budgetSelect(tiny, "doc_id", col("n"), col("sc"),
      budget = 0).collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(zero == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false),
      "budget 0 admits nothing here (doc 4 is zero-token but 30 tokens " +
        "of better-scored docs precede it)")
    intercept[IllegalArgumentException](
      Packing.budgetSelect(tiny, "doc_id", col("n"), col("sc"), -1))
    intercept[IllegalArgumentException](
      Packing.budgetSelect(tiny, "doc_id", col("n"), col("sc"), 5, bands = 0))
    intercept[IllegalArgumentException](
      Packing.budgetSelect(tiny.withColumn("__band", lit(1)), "doc_id",
        col("n"), col("sc"), 5))
  }

  test("budgetSelect: non-numeric score fails fast with a clear message; " +
    "null-score rows are excluded, not null-propagated") {
    val s = spark; import s.implicits._
    val tiny = Seq((1L, 10L, "high"), (2L, 10L, "low"))
      .toDF("doc_id", "n", "sc")
    val e = intercept[IllegalArgumentException](
      Packing.budgetSelect(tiny, "doc_id", col("n"), col("sc"), budget = 25))
    assert(e.getMessage.contains("numeric"), e.getMessage)
    // a null score is "unscored" -> not a candidate; the ranked rows'
    // cumsum is unaffected by the excluded row's tokens
    val withNull = Seq((1L, 10L, Some(100L)), (2L, 999L, None),
      (3L, 10L, Some(50L))).toDF("doc_id", "n", "sc")
    val out = Packing.budgetSelect(withNull, "doc_id", col("n"), col("sc"),
      budget = 25).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out == Map(1L -> ((0L, true)), 3L -> ((10L, true))), s"got $out")
  }

  test("lengthBucketBatches: bands honored, batches fill longest-first and " +
    "cap at batchSize, waste matches the hand formula") {
    val assigned = Packing.lengthBucketBatches(docs, "doc_id", nTok,
      batchSize = 4, bandWidth = 10)
    val rows = assigned.collect()
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) / 10, s"bucket mismatch: $r")
      assert(r.getInt(3) == 0, "saltShards=1 must put everything in shard 0")
    }
    // within a (bucket, batch): no doc is longer than any doc of the
    // PREVIOUS batch (longest-first fill)
    val byBucket = rows.groupBy(_.getLong(2))
    byBucket.foreach { case (_, rs) =>
      val batches = rs.groupBy(_.getInt(4)).toSeq.sortBy(_._1)
      batches.foreach { case (_, b) => assert(b.length <= 4) }
      batches.sliding(2).foreach {
        case Seq((_, prev), (_, next)) =>
          assert(next.map(_.getLong(1)).max <= prev.map(_.getLong(1)).min,
            "later batch holds a longer doc than an earlier one")
        case _ => ()
      }
      // only the LAST batch of a bucket may be partial
      batches.dropRight(1).foreach { case (_, b) => assert(b.length == 4) }
    }
    val stats = Packing.batchStats(assigned).collect()
    val statKey = stats.map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    byBucket.foreach { case (bucket, rs) =>
      rs.groupBy(_.getInt(4)).foreach { case (batch, b) =>
        val lens = b.map(_.getLong(1))
        val got = statKey((bucket, 0, batch))
        assert(got == ((lens.length.toLong, lens.max, lens.sum,
          lens.length * lens.max - lens.sum)), s"stats mismatch at $bucket/$batch")
      }
    }
    // deterministic under partitioning
    val b = Packing.lengthBucketBatches(docs.repartition(7), "doc_id", nTok,
      batchSize = 4, bandWidth = 10).collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == b)
  }

  test("lengthBucketBatches: saltShards splits bands deterministically and " +
    "the stats aggregate adds no second exchange") {
    val sharded = Packing.lengthBucketBatches(docs, "doc_id", nTok,
      batchSize = 4, bandWidth = 10, saltShards = 4)
    val rows = sharded.collect()
    assert(rows.map(_.getInt(3)).distinct.length > 1,
      "expected docs spread over multiple shards")
    assert(rows.forall(r => r.getInt(3) >= 0 && r.getInt(3) < 4))
    // same doc -> same shard regardless of partitioning (pure hash fn)
    val again = Packing.lengthBucketBatches(docs.repartition(5), "doc_id",
      nTok, batchSize = 4, bandWidth = 10, saltShards = 4)
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == again)
    // ONE exchange total: batchStats' (bucket, shard, batch_idx) grouping
    // is satisfied by the window's (bucket, shard) clustering
    val stats = Packing.batchStats(sharded)
    stats.collect()
    val plan = stats.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles in:\n$plan")
    intercept[IllegalArgumentException](
      Packing.lengthBucketBatches(docs, "doc_id", nTok, 0, 10))
    intercept[IllegalArgumentException](
      Packing.lengthBucketBatches(docs, "doc_id", nTok, 4, 0))
    intercept[IllegalArgumentException](
      Packing.lengthBucketBatches(docs.withColumn("__rn", lit(1)),
        "doc_id", nTok, 4, 10))
  }
}

package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  private def one(text: String) = {
    val s = spark; import s.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("bm25TopK ranks by term rarity, tf saturation and length " +
    "normalization; non-matching docs absent; k respected") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "spark query engine"),                 // both query terms, short
      (2L, "spark spark spark query filler words padding here now"), // tf-saturated + long
      (3L, "spark only here"),                    // one common term
      (4L, "query only text"),                    // one rarer term? (equal df here)
      (5L, "nothing relevant at all")             // no overlap -> absent
    ).toDF("doc_id", "text")
    val queries = Seq((10L, "spark query")).toDF("query_id", "qtext")
    val out = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
        "query_id", "qtext", k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toList.sortBy(_._2)
    // doc 1 has both terms in a 3-token doc: best; doc 5 never appears;
    // only k=3 rows come back
    assert(out.size == 3, s"got $out")
    assert(out.head == (1L, 1), s"got $out")
    assert(!out.exists(_._1 == 5L))
    // determinism across partitioning (the sorted fold, not sum order)
    val a = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    val b = TextAnalysis.bm25TopK(corpus.repartition(7), queries,
      "doc_id", "text", "query_id", "qtext", k = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("bm25TopKIndexed over writeBm25Layout: bit-exact vs the corpus-scan " +
    "path on real docs; probe scan is partition-pruned to query-term buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = spark; import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = docs.where(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4), " ")
          .as("qtext"))
    val path = tmpDir("bm25-layout")
    TextAnalysis.writeBm25Layout(docs, path, "doc_id", "text", termBuckets = 16)
    val indexed = TextAnalysis.bm25TopKIndexed(spark, path, queries,
      "query_id", "qtext", k = 5)
    val scan = TextAnalysis.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "qtext", k = 5)
    // bit-exact: same rows INCLUDING the float score (same expression
    // tree, same term-sorted fold, same integer inputs)
    assert(indexed.collect().map(_.toSeq).toSet == scan.collect().map(_.toSeq).toSet)
    // the probe reads only the buckets the query terms hash into (the
    // broadcast join makes the plan adaptive — AQE wraps subtrees in
    // QueryStageExec leaves, so descend through them to the scans)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }.toSeq
    val fileScan = allScans(indexed.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("term")).head
    val qbuckets = queries
      .select(explode(array_distinct(TextAnalysis.tokens(lower(col("qtext"))))).as("t"))
      .select(TextAnalysis.bm25TermBucket(col("t"), 16)).distinct().count()
    assert(fileScan.selectedPartitions.partitionCount <= qbuckets,
      s"probe scanned ${fileScan.selectedPartitions.partitionCount} partitions, " +
        s"expected <= $qbuckets query-term buckets")
    val scanStr = fileScan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("tbucket"),
      "tbucket filter did not register as a partition filter")
  }

  test("versioned BM25 store: snapshots increment, latest probe retires " +
    "the stale index, pinned probe still reads it, prune keeps newest, " +
    "failed build leaves no readable version") {
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val half = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val full = half.union(Seq((3L, "beta delta"), (4L, "alpha beta gamma"))
      .toDF("doc_id", "text"))
    val store = tmpDir("bm25-store") + "/store"
    assert(TextAnalysis.writeBm25Snapshot(half, store, termBuckets = 4) == 1L)
    assert(TextAnalysis.writeBm25Snapshot(full, store, termBuckets = 4) == 2L)
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
    val q = Seq((9L, "beta")).toDF("query_id", "qtext")
    val latest = TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
      "query_id", "qtext", k = 10)
    // the newest snapshot knows all four docs; the stale one only two
    assert(latest.select(col("doc_id")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L))
    val pinned = TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
      "query_id", "qtext", k = 10, version = Some(1L))
    assert(pinned.select(col("doc_id")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
    // a crashing build leaves only a dot-temp — no new readable version
    intercept[RuntimeException](LayoutStore.writeSnapshot(conf, store)(
      _ => throw new RuntimeException("boom")))
    assert(LayoutStore.versions(conf, store) == Seq(1L, 2L))
    assert(LayoutStore.prune(conf, store, retain = 1) == Seq(1L))
    assert(LayoutStore.versions(conf, store) == Seq(2L))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25TopKIndexedLatest(spark, store, q,
        "query_id", "qtext", k = 10, version = Some(1L)))
  }

  test("LayoutStore.compactSnapshot: generic sub-table walk rewrites to one " +
    "file per partition dir, preserves rows/schema/pruning, lands as a new " +
    "version") {
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val store = tmpDir("layout-compact") + "/store"
    // a fragmented layout: partitioned sub-table written with random
    // parallelism (many files per k= dir) + an unpartitioned stats table
    val data = (1L to 400L).map(i => (i, (i % 4).toInt, s"row$i"))
      .toDF("id", "k", "payload")
    assert(LayoutStore.writeSnapshot(conf, store) { tmp =>
      data.repartition(8).write.partitionBy("k").parquet(s"$tmp/data")
      Seq((400L, "v1")).toDF("n", "tag")
        .repartition(3).write.parquet(s"$tmp/stats")
    } == 1L)
    def parquetFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
        case d if d.isDirectory => parquetFiles(d)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Seq.empty
      }
    val fragmented = parquetFiles(new java.io.File(s"$store/version=1/data"))
    assert(fragmented.length > 4,
      s"expected a fragmented layout, got ${fragmented.length} files")
    assert(LayoutStore.compactSnapshot(spark, store) == 2L)
    val v2 = s"$store/version=2"
    // one file per k= dir, one for the unpartitioned stats table
    val kDirs = new java.io.File(s"$v2/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("k="))
    assert(kDirs.length == 4)
    kDirs.foreach(d => assert(parquetFiles(d).length == 1,
      s"${d.getName} not compacted: ${parquetFiles(d).length} files"))
    assert(parquetFiles(new java.io.File(s"$v2/stats")).length == 1)
    // exact row multisets and schema survive (partition col reads back
    // at the end of the schema — normalize by name)
    assert(spark.read.parquet(s"$v2/data").select("id", "k", "payload")
      .collect().map(_.toSeq).toSet ==
      data.collect().map(_.toSeq).toSet)
    assert(spark.read.parquet(s"$v2/stats").collect().map(_.toSeq).toSet ==
      Set(Seq(400L, "v1")))
    // partition pruning still engages on the compacted layout
    val probe = spark.read.parquet(s"$v2/data").where(col("k") === 2)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.partitionCount == 1,
      "compacted layout lost partition pruning")
  }

  test("LayoutStore.compactSnapshot: string partition values like strata=01 " +
    "round-trip byte-for-byte (no int/date re-inference renaming dirs)") {
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val store = tmpDir("layout-compact-str") + "/store"
    // zero-padded strata and a date-like shard value: default partition
    // discovery would re-infer these as int 1 / DATE and rewrite the
    // directory chain as strata=1 — exactly the corruption under test
    val data = Seq((1L, "01", "2024-01-02"), (2L, "01", "2024-01-02"),
      (3L, "10", "2024-01-02")).toDF("id", "strata", "shard")
    assert(LayoutStore.writeSnapshot(conf, store) { tmp =>
      data.repartition(4).write.partitionBy("strata", "shard")
        .parquet(s"$tmp/data")
    } == 1L)
    assert(LayoutStore.compactSnapshot(spark, store) == 2L)
    val dirs = new java.io.File(s"$store/version=2/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("strata=01", "strata=10"), s"got $dirs")
    new java.io.File(s"$store/version=2/data").listFiles()
      .filter(_.isDirectory).foreach { d =>
        assert(d.listFiles().filter(_.isDirectory).map(_.getName).toSet ==
          Set("shard=2024-01-02"), s"got ${d.listFiles().toSeq}")
      }
    // the conf tweak did not leak: the session-level inference flag is
    // back to its pre-call value
    assert(spark.conf.getOption(
      "spark.sql.sources.partitionColumnTypeInference.enabled")
      .forall(_ == "true"), "compactSnapshot leaked the inference conf")
    // read-back rows identical (reader disables inference the same way
    // a layout consumer of string partitions would)
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    spark.conf.set(inferKey, "false")
    val back = try spark.read.parquet(s"$store/version=2/data")
      .select("id", "strata", "shard").collect().map(_.toSeq).toSet
    finally spark.conf.unset(inferKey)
    assert(back == data.collect().map(_.toSeq).toSet, s"got $back")
  }

  test("writeBm25Layout stamps term_buckets; empty-overlap query returns " +
    "zero rows from a pruned scan") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val path = tmpDir("bm25-empty")
    TextAnalysis.writeBm25Layout(corpus, path, termBuckets = 4)
    val st = spark.read.parquet(s"$path/stats").head()
    assert(st.getAs[Int]("term_buckets") == 4)
    assert(st.getAs[Long]("n") == 2L && st.getAs[Long]("tot") == 4L)
    val noHit = Seq((9L, "zeta omicron")).toDF("query_id", "qtext")
    assert(TextAnalysis.bm25TopKIndexed(spark, path, noHit,
      "query_id", "qtext", k = 3).count() == 0L)
  }

  test("tokens drops empty splits (multiple spaces)") {
    val r = one("a  b   c").select(TextAnalysis.tokens(col("text"))).head().getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("countOccurrences counts exact substrings") {
    val df = one("the cat and the hat and the bat")
    assert(df.select(TextAnalysis.countOccurrences(col("text"), "the "))
      .head().getLong(0) == 3L)
    assert(df.select(TextAnalysis.countOccurrences(col("text"), "zebra"))
      .head().getLong(0) == 0L)
  }

  test("qualityFeatures on a known string") {
    val feats = TextAnalysis.qualityFeatures(col("text")).toMap
    val row = one("the cat. the cat!").select(
      feats("n_chars"), feats("n_tokens"), feats("n_unique_tokens"), feats("n_punct")).head()
    assert(row.getLong(0) == 17L)
    assert(row.getLong(1) == 4L)
    assert(row.getLong(2) == 3L)  // "the", "cat.", "cat!" -> distinct forms
    assert(row.getLong(3) == 2L)  // one '.', one '!'
  }

  test("langScores favor the marker language") {
    val scores = TextAnalysis.langScores(col("text")).toMap
    val en = one("the cat and the dog is here")
      .select(scores("score_en"), scores("score_de")).head()
    assert(en.getLong(0) > 0)
    assert(en.getLong(1) == 0)
  }

  test("fingerprint normalizes case and whitespace") {
    val s = spark; import s.implicits._
    val df = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("t1", "t2")
    val rows = df.select(
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2"))).as("eq"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(rows == Seq(true, false))
  }

  test("WinnowingMinima expression matches the composable least/element_at form") {
    val s = spark; import s.implicits._
    // real corpus + handcrafted edges: shorter than w, exactly w, ties,
    // repeated minima, single element
    // CACHED barrier: without it, PushDownPredicate substitutes the minima
    // expressions into a filter below this project, inlining the gram
    // producer into the HOF lambda -> O(n^2) md5 per doc (the
    // spark-hof-staging trap, in test form). Compare driver-side instead
    // of via a filter for the same reason.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(lower(col("text")).as("__t"))
      .select(TextAnalysis.charGramHashes(col("__t"), 8).as("g"))
      .cache()
    val edges = Seq(
      Seq("b", "a", "c", "a", "d", "a"), Seq("z"), Seq("b", "a"),
      Seq("a", "a", "a", "a", "a"), Seq("d", "c", "b", "a")).toDF("g")
    // w=1 excluded: least() needs >=2 args, so the HOF reference form
    // can't express it (the codegen form handles it as identity+distinct)
    for (df <- Seq(docs, edges); w <- Seq(2, 4, 7)) {
      val rows = df.select(
        TextAnalysis.winnowingMinima(col("g"), w).as("fast"),
        TextAnalysis.winnowingMinimaHof(col("g"), w).as("slow")).collect()
      val diffs = rows.count(r => r.getSeq[String](0) != r.getSeq[String](1))
      assert(diffs == 0, s"w=$w diverged between codegen and HOF minima")
    }
    docs.unpersist()
    // empty array: one all-null window -> [null] (both forms)
    val empty = Seq(Seq.empty[String]).toDF("g")
      .select(TextAnalysis.winnowingMinima(col("g"), 4).as("fast"),
        TextAnalysis.winnowingMinimaHof(col("g"), 4).as("slow"))
      .head()
    assert(empty.getSeq[String](0) == Seq(null) && empty.getSeq[String](1) == Seq(null))
  }


  test("keywordScores: rational tf-idf ranks rare repeated terms first, topK per doc") {
    val s = spark; import s.implicits._
    // "whale" is unique to doc 1 and repeated -> top keyword; "the" is in
    // every doc -> score tf*N/df = tf, ranks below the rare repeats
    val docs = Seq(
      (1L, "the whale the whale whale swims"),
      (2L, "the cat sits on the mat"),
      (3L, "the dog runs")).toDF("doc_id", "text")
    val out = TextAnalysis.keywordScores(docs, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, 1))._1 == "whale", s"got $out")
    assert(out((1L, 1)) == (("whale", 3L, 1L, 9.0)), s"got $out") // 3 * 3 / 1
    // every doc emits at most topK rows, ranks are 1-based contiguous
    assert(out.keys.groupBy(_._1).values.forall(ks => ks.map(_._2).toSeq.sorted == (1 to ks.size)))
    assert(out.keys.count(_._1 == 2L) == 2)
    // ties rank lexicographically: doc 3 terms all distinct, "dog" df=1 and
    // "runs" df=1 tie at 3.0 -> dog before runs
    assert(out((3L, 1))._1 == "dog" && out((3L, 2))._1 == "runs", s"got $out")
  }
  test("keywordScores plan: one corpus scan (tf exchange reused by df and " +
    "N branches), df side joins by broadcast") {
    val s = spark; import s.implicits._
    val docs = (1L to 50L).map(i => (i, s"alpha beta gamma-$i delta word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.keywordScores(docs, "doc_id", "text", topK = 2)
    out.collect()
    // AQE's toString appends an "== Initial Plan ==" section (pre-reuse);
    // assert over the final plan only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"expected the (id, term) exchange to be reused in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the df side broadcast into the score join in:\n$plan")
  }

  test("keywordScores: when the static hint cannot engage (plan-stats over " +
    "threshold), AQE converts the df join to broadcast from runtime sizes") {
    val s = spark; import s.implicits._
    val docs = (1L to 50L).map(i => (i, s"alpha beta gamma-$i delta word$i"))
      .toDF("doc_id", "text")
    // the scale shape: static estimates too big to hint or auto-broadcast
    // (threshold -1 kills the static path; broadcastDfMaxBytes=1 kills
    // our hint), adaptive threshold live — AQE must rescue the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    try {
      val out = TextAnalysis.keywordScores(docs, "doc_id", "text", topK = 2,
        broadcastDfMaxBytes = 1L)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE must convert the df join to broadcast at runtime:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("keywordScores: tokenless docs count toward N (the sentinel term " +
    "keeps them in the doc-count branch, excluded from tf)") {
    val s = spark; import s.implicits._
    // 4 docs, one tokenless: N=4, so "whale" (tf=2, df=1) scores 2*4/1=8
    val docs = Seq((1L, "whale whale swims"), (2L, "cat"), (3L, "dog"),
      (4L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.keywordScores(docs, "doc_id", "text", topK = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(out(1L) == (("whale", 8.0)), s"got $out")
    assert(!out.contains(4L), "tokenless doc emits no keyword rows")
  }

  test("repetitionSignals: hand-computed dup/mode n-gram ratios, short-doc " +
    "and empty-doc edges") {
    val s = spark; import s.implicits._
    // "spam spam spam ham": 4 tokens (mode spam=3, distinct 2);
    // 2-grams: [spam spam, spam spam, spam ham] (3 total, 2 distinct,
    // mode 2); 3-grams: [spam spam spam, spam spam ham] (2, 2, mode 1)
    val row = Seq("spam spam spam ham").toDF("text")
      .select(TextAnalysis.repetitionSignals(col("text"))
        .map { case (n, c) => c.as(n) }: _*).head()
    assert(row.getLong(0) == 4L)                       // n_1grams
    assert(row.getDouble(1) == 0.5)                    // dup_1gram_ratio (4-2)/4
    assert(row.getLong(2) == 3L)                       // top_1gram_count
    assert(row.getDouble(3) == 0.75)                   // top_1gram_ratio
    assert(row.getLong(4) == 3L && row.getLong(6) == 2L) // 2-grams: total, mode
    assert(row.getDouble(5) == 1.0 / 3)                // dup_2gram_ratio
    assert(row.getLong(8) == 2L && row.getLong(10) == 1L) // 3-grams
    assert(row.getDouble(9) == 0.0 && row.getDouble(11) == 0.5)
    // doc shorter than n: one whole-doc gram, ratio 1
    val short = Seq("ab cd").toDF("text")
      .select(TextAnalysis.repetitionSignals(col("text"), Seq(3))
        .map { case (n, c) => c.as(n) }: _*).head()
    assert(short.getLong(0) == 1L && short.getDouble(3) == 1.0)
    // empty doc: zero grams, null ratios
    val empty = Seq("").toDF("text")
      .select(TextAnalysis.repetitionSignals(col("text"), Seq(1))
        .map { case (n, c) => c.as(n) }: _*).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(3))
  }

  test("ModeCount kernel equals the interpreted sorted-run fold on " +
    "random gram arrays") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      Tuple1((0 until rnd.nextInt(30)).map(_ => s"g${rnd.nextInt(8)}"))
    }
    val out = rows.toDF("g").select(
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.ModeCount(
          org.apache.spark.sql.GraftColumnBridge.expression(col("g")))).as("fast"),
      TextAnalysis.maxRunLengthHof(array_sort(col("g"))).as("slow")).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)),
      out.filter(r => r.getLong(0) != r.getLong(1)).take(3).mkString(","))
  }

  test("repetitionReport (staged) equals the fused column form") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the cat the cat sat"), (2L, "a b c"), (3L, ""),
      (4L, "x x x x x x")).toDF("doc_id", "text")
    val fused = docs.select(col("doc_id") +:
      TextAnalysis.repetitionSignals(lower(col("text")))
        .map { case (n, c) => c.as(n) }: _*)
    val staged = TextAnalysis.repetitionReport(docs, "doc_id", "text")
    assert(staged.columns.toSeq == fused.columns.toSeq)
    assert(staged.collect().toSeq.sortBy(_.getLong(0)) ==
      fused.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("regexTokens splits words, numbers and symbols") {
    val r = one("ab12 cd, ef!").select(TextAnalysis.regexTokens(col("text")))
      .head().getSeq[String](0)
    assert(r.contains("ab12") && r.contains(",") && r.contains("!"))
    // contractions hold together; punctuation runs split per symbol
    val r2 = one("it's 3.14 done!!").select(TextAnalysis.regexTokens(col("text")))
      .head().getSeq[String](0)
    assert(r2 == Seq("it's", "3", ".", "14", "done", "!", "!"), s"got $r2")
  }

  test("regexTokenStats: hand-computed class counts and chars-per-token; " +
    "empty doc yields null ratio") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "it's 3.14 done!!"), (2L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.regexTokenStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    // tokens: it's, 3, ., 14, done, !, ! -> 7; words: it's, done -> 2;
    // nums: 3, 14 -> 2; other 3; chars 4+1+1+2+4+1+1 = 14
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4),
      r1.getLong(5)) == ((7L, 2L, 2L, 14L, 3L)))
    assert(r1.getDouble(6) == 14.0 / 7.0)
    val r2 = out(2L)
    assert(r2.getLong(1) == 0L && r2.isNullAt(6))
  }

  test("unigramFamiliarity plan: one corpus scan — scoring join, vocab and " +
    "total all ride the reused (id, term) exchange") {
    val s = spark; import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"alpha beta word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramFamiliarity(docs, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"expected the (id, term) exchange to be reused in:\n$plan")
  }

  test("unigramFamiliarity: hand-computed integer sums and ratios") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // vocab: a=3, b=1, c=1; total=5; rareDenom=2 -> rare iff cnt*2 < 5
    val out = TextAnalysis.unigramFamiliarity(df, "doc_id", "text", rareDenom = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out(1L) == ((3L, 7L, 1L, 7.0 / 3.0, 1.0 / 3.0)), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 4L, 1L, 2.0, 0.5)), s"got ${out(2L)}")
  }

  test("chunkWindows: overlap math on a known doc; short docs one chunk; " +
    "empty docs none; full token coverage; bad specs rejected") {
    val s = spark; import s.implicits._
    // 7 tokens, width 4 stride 3 -> starts 0, 3, 6
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(df, "doc_id", "text", width = 4,
        stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getString(4))).sortBy(t => (t._1, t._2)).toList
    assert(out == List(
      (1L, 0, 0, 4L, "t0 t1 t2 t3"),
      (1L, 1, 3, 4L, "t3 t4 t5 t6"),
      (1L, 2, 6, 1L, "t6"),
      (2L, 0, 0, 2L, "a b")), s"got $out")
    // every token index is covered by at least one chunk
    val covered = out.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4.toInt)).toSet
    assert(covered == (0 until 7).toSet)
    intercept[IllegalArgumentException](
      TextAnalysis.chunkWindows(df, "doc_id", "text", width = 0, stride = 1))
    intercept[IllegalArgumentException](
      TextAnalysis.chunkWindows(df, "doc_id", "text", width = 4, stride = 5))
  }

  test("bigramCoherence: hand-computed masses; <2-token docs emit no row") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    // vocab: "a b"=3, "b a"=1, "b c"=1; lead: a->3, b->2
    val out = TextAnalysis.bigramCoherence(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 7L, 8L, 7.0 / 8.0)), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 4L, 5L, 0.8)), s"got ${out(2L)}")
  }

  test("bigramCoherence: common words in scrambled order score lower than " +
    "the same words in corpus order") {
    val s = spark; import s.implicits._
    val df = ((1L to 10L).map(i => (i, "u v w")) :+ (11L, "w v u"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramCoherence(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(11L) < out(1L) / 2,
      s"scrambled ${out(11L)} should be well below in-order ${out(1L)}")
  }

  test("bigramCoherence plan: one corpus scan — scoring join and bigram " +
    "vocab ride the reused (id, bigram) exchange; lead table derives from " +
    "the vocab, not the corpus") {
    val s = spark; import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"alpha beta word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramCoherence(docs, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"expected the (id, bigram) exchange to be reused in:\n$plan")
  }

  test("importanceScores: hand-computed masses and ratio; target doc " +
    "outranks off-target") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a a b", true), (2L, "a c", false))
      .toDF("doc_id", "text", "tgt")
    // tf: d1 {a:2,b:1} target, d2 {a:1,c:1}; vocab: a(cnt 3,tcnt 2),
    // b(1,1), c(1,0); total=5, target=3
    // d1: tmass 2*2+1*1=5, rmass 2*3+1*1=7, ratio (5*5)/(7*3)=25/21
    // d2: tmass 1*2+1*0=2, rmass 1*3+1*1=4, ratio (2*5)/(4*3)=5/6
    val out = TextAnalysis.importanceScores(df, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((3L, 5L, 7L, 25.0 / 21.0)), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 2L, 4L, 5.0 / 6.0)), s"got ${out(2L)}")
    assert(out(1L)._4 > out(2L)._4)
  }

  test("importanceScores plan: one corpus scan — vocab with target masses, " +
    "totals and scoring join all ride the reused (id, is_target, term) exchange") {
    val s = spark; import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"alpha beta word$i", i <= 10L))
      .toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.importanceScores(docs, "doc_id", "text", col("tgt"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"expected the tokenized exchange to be reused in:\n$plan")
  }

  test("noveltyScores: distinct grams per doc, df=1 uniqueness; " +
    "short docs emit no row") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a b c"),     // grams: "a b", "b c"
      (2L, "a b x"),     // grams: "a b", "b x"
      (3L, "a b a b"),   // grams: "a b", "b a", "a b" -> distinct {a b, b a}
      (4L, "solo")       // 1 token < width -> no grams, no row
    ).toDF("doc_id", "text")
    // df("a b")=3, df("b c")=df("b x")=df("b a")=1
    val out = TextAnalysis.noveltyScores(df, "doc_id", "text", width = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"got ${out.keySet}")
    assert(out(1L) == ((2L, 1L, 0.5)), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 0.5)), s"got ${out(2L)}")
    assert(out(3L) == ((2L, 1L, 0.5)), s"got ${out(3L)}")
    // an all-boilerplate doc scores 0
    val bp = Seq((1L, "x y z"), (2L, "x y z w")).toDF("doc_id", "text")
    val o2 = TextAnalysis.noveltyScores(bp, "doc_id", "text", width = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(o2(1L) == 0.0, s"got ${o2(1L)}")  // both grams shared with doc 2
  }

  test("noveltyScores plan: one corpus scan — doc-frequency aggregate and " +
    "scoring join ride the reused (id, gram) exchange") {
    val s = spark; import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"alpha beta gamma word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(docs, "doc_id", "text", width = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"expected the (id, gram) exchange to be reused in:\n$plan")
  }

  test("vocabOovRates: deterministic top-V cut (count desc, term asc) and " +
    "hand-computed OOV mass") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a a b z"), (2L, "a c")).toDF("doc_id", "text")
    // counts: a=3, b=1, c=1, z=1; V=2 -> vocab {a, b} (ties lexicographic)
    val out = TextAnalysis.vocabOovRates(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)), s"got ${out(1L)}")  // z OOV
    assert(out(2L) == ((2L, 1L, 0.5)), s"got ${out(2L)}")   // c OOV
    // partitioning independence of the cut (TakeOrdered merge is global)
    val o2 = TextAnalysis.vocabOovRates(df.repartition(7), "doc_id", "text",
        vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(o2 == out)
    // growing V can only shrink OOV mass
    val o3 = TextAnalysis.vocabOovRates(df, "doc_id", "text", vocabSize = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(o3(1L) == 0L && o3(2L) == 0L, s"got $o3")
  }

  test("bpePairStats: frequency-weighted adjacent pairs over the vocab, " +
    "repeats inside a word count, single-char words contribute nothing, " +
    "deterministic tie order") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "ab ab ccc a"), (2L, "AB x")).toDF("doc_id", "text")
    // word counts (lowered): ab=3, ccc=1, a=1, x=1
    // pairs: ab -> "ab" x3; ccc -> "cc","cc" -> 2*1; a, x -> none
    val out = TextAnalysis.bpePairStats(df, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out == List(("ab", 3L), ("cc", 2L)), s"got $out")
    // topK truncates on (n desc, pair asc)
    val top1 = TextAnalysis.bpePairStats(df, "text", topK = 1)
      .collect().map(r => r.getString(0)).toList
    assert(top1 == List("ab"))
    // the cut plans as TakeOrderedAndProject (no global sort)
    val q = TextAnalysis.bpePairStats(df, "text", topK = 5)
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("vocabOovRates plan: vocabulary cut is TakeOrderedAndProject (no " +
    "global sort) and joins by broadcast") {
    val s = spark; import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"alpha beta word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabOovRates(docs, "doc_id", "text", vocabSize = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected the vocab cut to plan as TakeOrderedAndProject in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the <=V-row vocab to join by broadcast in:\n$plan")
  }

  test("driftAgainstProfile: newest snapshot pins, stale retires, both " +
    "sides zero-fill") {
    val s = spark; import s.implicits._
    val store = tmpDir("profile-store") + "/store"
    assert(TextAnalysis.writeTermProfileSnapshot(
      Seq("a a b").toDF("text"), "text", store) == 1L)
    assert(TextAnalysis.writeTermProfileSnapshot(
      Seq("a b b c").toDF("text"), "text", store) == 2L)
    val cur = Seq("a a b d").toDF("text") // a:2 b:1 d:1, na=4
    // vs v2 {a:1,b:2,c:1} (nb=4): every term drifts |.|=4; c zero-fills
    // side A, d zero-fills side B; tvd = 16/(2*4*4) = 0.5
    val v2 = TextAnalysis.driftAgainstProfile(s, cur, "text", store, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getDouble(6)))
    assert(v2.map(t => (t._1, t._4)).toSeq ==
      Seq(("a", 4L), ("b", 4L), ("c", 4L), ("d", 4L)), s"got ${v2.toSeq}")
    assert(v2.find(_._1 == "c").get._2 == 0L, "c absent from current -> cnt_a 0")
    assert(v2.find(_._1 == "d").get._3 == 0L, "d absent from profile -> cnt_b 0")
    assert(v2.forall(_._5 == 0.5))
    // pinning the RETIRED v1 {a:2,b:1} (nb=3) gives different rows —
    // proof the default probe really read the newest snapshot
    val v1 = TextAnalysis.driftAgainstProfile(s, cur, "text", store, 10,
      version = Some(1L))
      .collect().map(r => (r.getString(0), r.getLong(5), r.getDouble(6)))
    assert(v1.map(t => (t._1, t._2)).toSeq ==
      Seq(("d", 3L), ("a", 2L), ("b", 1L)), s"got ${v1.toSeq}")
    assert(v1.forall(_._3 == 0.25))
  }

  test("familiarityAgainstProfile: hand-checked novel/rare mass vs the " +
    "pinned snapshot; retired v1 probe; tokenless docs emit no row") {
    val s = spark; import s.implicits._
    val store = tmpDir("fam-store") + "/store"
    TextAnalysis.writeTermProfileSnapshot(
      Seq("a a b").toDF("text"), "text", store)   // v1 {a:2,b:1} tot 3
    TextAnalysis.writeTermProfileSnapshot(
      Seq("a b b c").toDF("text"), "text", store) // v2 {a:1,b:2,c:1} tot 4
    val cur = Seq((1L, "a a d b"), (2L, "c c"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.familiarityAgainstProfile(s, cur, "doc_id",
      "text", store)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(6)))).toMap
    // doc1 vs v2: n=4, mass 2*1+0+1*2=4, novel {d}=1, rare {d}=1
    // (a,b have cnt*100 >= tot=4), novel_rate 0.25
    assert(out(1L) == ((4L, 4L, 1L, 1L, 0.25)), s"got ${out(1L)}")
    // doc2: c is IN v2 (cnt 1): mass 2, nothing novel
    assert(out(2L) == ((2L, 2L, 0L, 0L, 0.0)), s"got ${out(2L)}")
    assert(!out.contains(3L), "tokenless doc must emit no row")
    // pinned RETIRED v1: c is absent there -> all of doc2 is novel
    val v1 = TextAnalysis.familiarityAgainstProfile(s, cur, "doc_id",
      "text", store, version = Some(1L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(v1(2L) == ((0L, 2L)), s"got ${v1(2L)}")
  }

  test("driftBySource: per-stratum TVD vs the pinned profile; a disjoint " +
    "source reads exactly 1.0; closed-form reference-only mass") {
    val s = spark; import s.implicits._
    val store = tmpDir("dbs-store") + "/store"
    TextAnalysis.writeTermProfileSnapshot(
      Seq("a b b c").toDF("text"), "text", store) // {a:1,b:2,c:1} nb=4
    val cur = Seq(("X", "a a b"), ("Y", "d")).toDF("src", "text")
    val out = TextAnalysis.driftBySource(s, cur, "src", "text", store)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    // X {a:2,b:1} na=3: |2*4-1*3|+|1*4-2*3| = 7, ref-only c: 3*(4-3)=3
    assert(out("X") == ((3L, 4L, 10L, 10.0 / 24.0)), s"got ${out("X")}")
    // Y {d:1} na=1 is DISJOINT from the reference: TVD must be exactly 1
    assert(out("Y") == ((1L, 4L, 8L, 1.0)), s"got ${out("Y")}")
  }

  test("distributionDrift: exact cross-multiplied movers and a hand-checked TVD") {
    val s = spark; import s.implicits._
    // side A: {a:2, b:1} (na=3); side B: {a:1, b:2, c:1} (nb=4)
    val df = Seq(("A", "a a b"), ("B", "a b b c")).toDF("side", "text")
    val out = TextAnalysis.distributionDrift(df, "text",
      col("side") === "A", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // drift_num: a = |2*4-1*3| = 5, c = |0*4-1*3| = 3, b = |1*4-2*3| = 2
    assert(out.map(t => (t._1, t._6)).toSeq ==
      Seq(("a", 5L), ("c", 3L), ("b", 2L)), s"got ${out.toSeq}")
    assert(out.forall(t => t._4 == 3L && t._5 == 4L))
    // TVD = sum/(2*na*nb) = 10/24, equal to the direct 0.5*sum|p-q| = 5/12
    assert(math.abs(out(0)._7 - 5.0 / 12) < 1e-15)
    // topK truncates below the vocab size deterministically
    val top1 = TextAnalysis.distributionDrift(df, "text",
      col("side") === "A", topK = 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "a")
  }

  test("vocabGrowth: cumulative first-seen-bucket vocabulary equals the " +
    "hand-checked naive sub-corpus distinct counts; tokenless docs drop") {
    val s = spark; import s.implicits._
    val df = Seq(
      (0L, "a b a"),     // bucket 0 (0%3): vocab {a,b}, 3 toks
      (10L, ""),          // bucket 1 (10%3): tokenless -> not in n_docs
      (1L, "b c"),       // bucket 1: adds {c}
      (11L, "a c"),      // bucket 2 (11%3): adds nothing
      (2L, "d")          // bucket 2: adds {d}
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(df, "doc_id", "text", buckets = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((1L, 3L, 2L)),   // docs {0}, 3 tokens, vocab {a,b}
      2L -> ((2L, 5L, 3L)),   // + doc {1}, + 2 tokens, + {c}
      3L -> ((4L, 8L, 4L))    // + docs {11,2}, + 3 tokens, + {d}
    ), s"got $out")
    // partitioning independence
    val o7 = TextAnalysis.vocabGrowth(df.repartition(7), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(o7 == out)
  }

  test("cardinalityMonitor: exact regime matches hand counts incl. " +
    "tokenless docs and the __all__ rollup; HLL regime is exact at tiny " +
    "cardinalities and STREAMING-capable (complete-mode rollup == batch)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a b a", "s1"), (2L, "", "s1"), // tokenless: counts in docs
      (3L, "b c", "s2"), (4L, "c d e", "s2"))
      .toDF("doc_id", "text", "src")
    def asMap(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exact = asMap(TextAnalysis.cardinalityMonitor(df, "doc_id",
      "text", "src"))
    assert(exact == Map(
      "s1" -> ((0, 2L, 3L, 2L)),      // docs {1,2}, 3 tokens, {a,b}
      "s2" -> ((0, 2L, 5L, 4L)),      // docs {3,4}, 5 tokens, {b,c,d,e}
      "__all__" -> ((1, 4L, 8L, 5L))  // global distinct != per-source sum
    ), s"got $exact")
    // HLL++ is exact at cardinalities far below 1/rsd² — same rows here
    val hll = asMap(TextAnalysis.cardinalityMonitor(df, "doc_id",
      "text", "src", approximate = true))
    assert(hll == exact, s"got $hll")
    // streaming twin: the HLL regime's partials merge through the state
    // store (countDistinct can't — Spark rejects streaming DISTINCT),
    // so the complete-mode streamed rollup must equal the batch rollup
    val srcDir = tmpDir("card-stream")
    df.write.mode("overwrite").parquet(srcDir)
    val streamed = asMap(graft.streaming.Incremental
      .runAggregateAvailableNow(spark, srcDir, df.schema, "parquet",
        b => TextAnalysis.cardinalityMonitor(b, "doc_id", "text", "src",
          approximate = true),
        queryName = "card_stream_test"))
    assert(streamed == hll, s"got $streamed")
  }

  test("vocabGrowth: a tenth whose prefix buckets are all empty still " +
    "reports a zero row — the curve always has `buckets` rows") {
    val s = spark; import s.implicits._
    // every id ≡ 2 (mod 3): buckets 0 and 1 are EMPTY, so tenths 1 and 2
    // cover no docs at all and must report (0, 0, 0), not vanish
    val df = Seq((2L, "a b"), (5L, "b c"), (8L, "d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(df, "doc_id", "text", buckets = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((0L, 0L, 0L)),
      2L -> ((0L, 0L, 0L)),
      3L -> ((3L, 5L, 4L))
    ), s"got $out")
    // fully empty corpus: still `buckets` rows of zeros
    val empty = TextAnalysis.vocabGrowth(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(empty == Set((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L)), s"got $empty")
  }

  test("phraseSearch: overlapping occurrences count individually, " +
    "boundary matches hold, a missing word yields no rows, 3-word " +
    "phrases chain") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a a a b"),           // "a a": overlapping at pos 0 and 1
      (2L, "x fast table"),      // match at the very end
      (3L, "fast table fast table"), // two disjoint occurrences
      (4L, "table fast"),        // reversed: no match
      (5L, "fast x table"))      // gap: no match
      .toDF("doc_id", "text")
    def run(phrase: String*) =
      TextAnalysis.phraseSearch(docs, "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("a", "a") == Map(1L -> 2L))
    assert(run("fast", "table") == Map(2L -> 1L, 3L -> 2L))
    assert(run("fast", "table", "fast") == Map(3L -> 1L))
    assert(run("zz", "table").isEmpty)
    intercept[IllegalArgumentException](run("fast"))
    intercept[IllegalArgumentException](run("Fast", "table"))
  }

  test("positional index: the persisted-postings probe equals the " +
    "query-time derivation (3-word chain incl. overlaps), the probe " +
    "scan partition-prunes to the phrase's term buckets, and append + " +
    "takedown through the generic manifest walkers keep the " +
    "equivalence") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b a b a"),        // overlapping "a b" twice, "a b a" twice
      (2L, "b a b"), (3L, "c c c"), (4L, "a b a")).toDF("doc_id", "text")
    val phrase = Seq("a", "b", "a")
    val store = tmpDir("posidx") + "/layout"
    TextAnalysis.writePositionalSnapshot(docs, store, termBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val probe = TextAnalysis.phraseSearchIndexed(spark, store, phrase)
    assert(rows(probe) ==
      rows(TextAnalysis.phraseSearch(docs, "doc_id", "text", phrase)))
    assert(rows(probe) == Set(Seq(1L, 2L), Seq(4L, 1L)), s"${rows(probe)}")
    // partition pruning: the scan reads only the phrase's buckets
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }.toSeq
    val scan = allScans(probe.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("term")).head
    val pbuckets = Seq("a", "b").toDF("term")
      .select(TextAnalysis.bm25TermBucket(col("term"), 8)).distinct().count()
    assert(scan.selectedPartitions.partitionCount <= pbuckets,
      s"probe scanned ${scan.selectedPartitions.partitionCount} " +
        s"partitions, expected <= $pbuckets phrase buckets")
    assert(scan.toString.contains("PartitionFilters") &&
      scan.toString.contains("tbucket"),
      "tbucket filter did not register as a partition filter")
    // append: probe == from-scratch over the union
    TextAnalysis.appendPositionalSnapshot(spark, store,
      Seq((5L, "x a b a y")).toDF("doc_id", "text"))
    val all = docs.unionByName(Seq((5L, "x a b a y")).toDF("doc_id", "text"))
    assert(rows(TextAnalysis.phraseSearchIndexed(spark, store, phrase)) ==
      rows(TextAnalysis.phraseSearch(all, "doc_id", "text", phrase)))
    // takedown: the revoked doc vanishes from every posting slice
    Takedown.propagateLayoutSnapshot(spark, store,
      Seq(1L).toDF("doc_id"), "doc_id")
    assert(rows(TextAnalysis.phraseSearchIndexed(spark, store, phrase)) ==
      Set(Seq(4L, 1L), Seq(5L, 1L)))
    // a probe planned against a foreign bucket count cannot happen:
    // the count rides the stamped rows, not a caller argument
    intercept[IllegalArgumentException](
      TextAnalysis.phraseSearchIndexed(spark, store, Seq("a")))
  }

  test("strataOverlapMatrix: the matrix is complete over the DOCUMENT " +
    "frame's strata — a stratum whose documents are all tokenless " +
    "still emits (n = 0), and an all-empty pair's jaccard is 0.0, " +
    "never NaN") {
    val s = spark; import s.implicits._
    // b's only doc is empty, c's is whitespace — both tokenless strata
    val df = Seq(("a", "x y"), ("a", "y z"), ("b", ""), ("c", "   "))
      .toDF("lang", "text")
    val got = TextAnalysis.strataOverlapMatrix(df, "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      s"tokenless strata must not vanish from the matrix: ${got.keySet}")
    assert(got(("a", "b")) == ((0L, 3L, 0L, 0.0)), s"got ${got(("a", "b"))}")
    assert(got(("a", "c")) == ((0L, 3L, 0L, 0.0)))
    val bc = got(("b", "c"))
    assert(bc == ((0L, 0L, 0L, 0.0)),
      s"an all-empty pair must emit jaccard 0.0 (0/0 guard): $bc")
    assert(!bc._4.isNaN)
  }
}

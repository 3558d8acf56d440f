package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"),  // near dup of 1
      (4L, "completely different text about spark engines and data"),
      (5L, "THE QUICK  BROWN fox jumps over the lazy dog")   // dup modulo case/ws
    ).toDF("doc_id", "text")
  }

  test("exactDedup keeps the minimum id per normalized fingerprint") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 1,2,5 share a fingerprint (case/whitespace-normalized) -> keep 1
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("shingles: n >= k sliding windows; n < k single shingle") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val sh = df.select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L) == Seq("a b"))
  }

  test("minhash signatures are deterministic and component-wise portable") {
    val sig = docs.select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 12).as("sig"))
      .where(length(col("text")) > 0).collect().map(_.getSeq[Long](0))
    assert(sig.forall(_.length == 12))
    // K-M components are h1 + i*h2 with h1,h2 < 2^32: always in [0, 2^36)
    assert(sig.forall(_.forall(v => v >= 0L && v < (1L << 36))))
    // identical docs -> identical signatures
    val byDoc = docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 12).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L) != byDoc(4L))
  }

  test("MinhashMinima matches the composable md5 double-hash reference") {
    // the codegen'd one-digest-per-shingle loop must be bit-identical to
    // the transform/conv/array_min composition it replaces (which is also
    // the shape the DuckDB oracle mirrors)
    val both = docs.select(
      Dedup.shingles(col("text"), 3).as("sh"))
      .select(Dedup.minhashSignature(col("sh"), 12).as("fast"),
        Dedup.minhashSignatureHof(col("sh"), 12).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fast=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
    }
  }

  test("lshCandidatePairs surfaces planted near-dups, rejects bad band config") {
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    intercept[IllegalArgumentException](
      Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 12, bands = 5))
  }

  test("nearDupPairs verifies candidates with exact Jaccard") {
    val out = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = out.map(t => (t._1, t._2)).toSet
    // exact dups (1,2,5 normalize to the same text) always collide in
    // every band; near-dups like (1,3) collide per-band with P<1, so only
    // the guaranteed pairs are asserted (d04's oracle covers the rest)
    assert(Set((1L, 2L), (1L, 5L), (2L, 5L)).subsetOf(ids), s"got $ids")
    out.filter(t => Set((1L, 2L), (1L, 5L)).contains((t._1, t._2)))
      .foreach(t => assert(t._3 == 1.0))
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("contaminationFlags: distinct shared shingles counted, clean docs " +
    "kept at zero, minHits threshold, broadcast plan under the guard") {
    val s = spark; import s.implicits._
    // k=3 shingles; doc 1 shares its full text with the bench doc (3
    // shingles of 5 tokens = 3 hits), doc 2 shares one window, doc 3 none
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "xx alpha beta gamma yy"),
      (3L, "totally clean document here")).toDF("doc_id", "text")
    val out = Dedup.contaminationFlags(train, bench, "doc_id", "text", k = 3)
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(m == Map(1L -> ((3L, true)), 2L -> ((1L, true)), 3L -> ((0L, false))), m)
    // minHits raises the bar: doc 2's single hit no longer flags
    val strict = Dedup.contaminationFlags(train, bench, "doc_id", "text",
        k = 3, minHits = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(strict == Map(1L -> true, 2L -> false, 3L -> false), strict)
    // the bench-key side rides a broadcast (the guard admits a tiny set)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // duplicated shingles within one doc count ONCE
    val dup = Dedup.contaminationFlags(
      Seq((7L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text"),
      bench, "doc_id", "text", k = 3).head()
    // doc 7 shingles: [alpha beta gamma, beta gamma alpha, gamma alpha
    // beta, alpha beta gamma] -> distinct 3; shared with bench = only
    // "alpha beta gamma", and only ONCE despite appearing twice
    assert(dup.getLong(1) == 1L, s"got $dup")
  }

  test("containmentPairs: embedded quote scores ~1 where Jaccard dilutes") {
    val s = spark; import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog near the river bank"
    val filler = (1 to 30).map(i => s"unrelated filler sentence number $i").mkString(" ")
    val docs = Seq(
      (1L, quote),                    // the short doc
      (2L, s"$filler $quote $filler"), // contains it verbatim
      (3L, "completely different content about astronomy and planets")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.contains((1L, 2L)) && cont((1L, 2L)) >= 0.9, s"got $cont")
    assert(!cont.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // the symmetric detector misses the same pair at the same bar
    val jac = Dedup.winnowingOverlapPairs(docs, "doc_id", "text", minSim = 0.8)
      .collect()
    assert(jac.isEmpty, s"Jaccard should dilute the embedded quote: ${jac.toSeq}")
  }

  test("bench-key state round-trip: persisted keys give identical flags, " +
    "shingle-width mismatch fails fast") {
    val s = spark; import s.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "xx alpha beta gamma yy"),
      (3L, "totally clean document here")).toDF("doc_id", "text")
    val path = tmpDir("benchkeys") + "/keys"
    Dedup.writeBenchKeys(bench, "text", path, k = 3)
    val fromState = Dedup.contaminationFlagsAgainstKeys(
        train, Dedup.readBenchKeys(spark, path, k = 3), "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val direct = Dedup.contaminationFlags(train, bench, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(fromState == direct, s"state=$fromState direct=$direct")
    val e = intercept[IllegalArgumentException](
      Dedup.readBenchKeys(spark, path, k = 8))
    assert(e.getMessage.contains("shingle_k"))
  }

  test("decontaminateSpans cuts only bench-matching spans (case-normalized " +
    "match, original case kept); clean and short docs untouched") {
    val s = spark; import s.implicits._
    val bench = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val keysPath = tmpDir("despan") + "/keys"
    Dedup.writeBenchKeys(bench, "text", keysPath, k = 3)
    val train = Seq(
      // the eval quote sits at positions 3-6; matching is case-normalized
      (1L, "Intro Words here ALPHA beta GAMMA delta Closing remark"),
      (2L, "totally unrelated clean content right here"),
      (3L, "al be")                                   // < width: passes through
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateSpans(train, "doc_id", "text",
        Dedup.readBenchKeys(spark, keysPath, k = 3), width = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((9L, 4L, "Intro Words here Closing remark")), s"got $out")
    assert(out(2L)._2 == 0L && out(2L)._3 == "totally unrelated clean content right here")
    assert(out(3L) == ((2L, 0L, "al be")))
  }

  test("leakFreeSplit: every near-dup cluster member shares a side; " +
    "singletons are their own rep; extreme rates degenerate; bad rate rejected") {
    val out = Dedup.leakFreeSplit(docs, "doc_id", "text",
        heldoutRate = 0.5, salt = "t", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 5)
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // 1, 2, 5 are dups (exact modulo case/ws): one rep, one side
    assert(Set(byId(1L), byId(2L), byId(5L)).size == 1,
      s"cluster split across sides: $byId")
    // 4 is a singleton: its own rep
    assert(byId(4L)._1 == 4L)
    // rate 0 -> all train; rate 1 -> all heldout
    assert(Dedup.leakFreeSplit(docs, "doc_id", "text", 0.0, "t", 0.5)
      .collect().forall(_.getString(2) == "train"))
    assert(Dedup.leakFreeSplit(docs, "doc_id", "text", 1.0, "t", 0.5)
      .collect().forall(_.getString(2) == "heldout"))
    intercept[IllegalArgumentException](
      Dedup.leakFreeSplit(docs, "doc_id", "text", 1.5, "t", 0.5))
  }

  test("canonicalByQuality keeps the best copy (argmax quality), " +
    "not the min id; ties fall back to min id") {
    val s = spark; import s.implicits._
    val near = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog indeed it does"),
      (3L, "completely unrelated text about oceans and tides entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.canonicalByQuality(near, "doc_id", "text",
        quality = length(col("text")).cast("long"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // cluster label is still the min id; the KEEPER is the longer doc 2
    assert(out == Set((1L, 1L, false), (2L, 1L, true)), s"got $out")
    // min-id semantics as the tie-break: identical lengths keep doc 1
    val tied = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val t2 = Dedup.canonicalByQuality(tied, "doc_id", "text",
        quality = length(col("text")).cast("long"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(t2 == Set((1L, true), (2L, false)), s"got $t2")
  }

  test("bench-key snapshots: versions increment, latest read retires " +
    "replaced keys, pinned read prunes partitions") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val v1set = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val v2set = Seq((2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val store = tmpDir("benchkeys-ver") + "/keys"
    val conf = spark.sparkContext.hadoopConfiguration
    assert(Dedup.writeBenchKeysSnapshot(v1set, "text", store, k = 3) == 1L)
    assert(Dedup.writeBenchKeysSnapshot(v2set, "text", store, k = 3) == 2L)
    assert(Dedup.benchKeyVersions(conf, store) == Seq(1L, 2L))
    // latest == v2's keys alone (v1's retired); pinning v1 still works
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getString(0)).toSet
    val latest = Dedup.readBenchKeysLatest(spark, store, k = 3)
    val flat = tmpDir("bk-flat") + "/f"
    Dedup.writeBenchKeys(v2set, "text", flat, k = 3)
    assert(keys(latest) == keys(Dedup.readBenchKeys(spark, flat, k = 3)))
    assert(keys(latest).intersect(keys(
      Dedup.readBenchKeysLatest(spark, store, k = 3, version = Some(1L)))).isEmpty)
    // the pinned read lists exactly one snapshot's partitions
    val scans = latest.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }
    assert(scans.nonEmpty &&
      scans.head.selectedPartitions.partitionCount == 1,
      "version pin must prune at the file listing")
  }

  test("bench-key snapshots: prune retains newest, missing/mismatched " +
    "reads fail fast") {
    val s = spark; import s.implicits._
    val store = tmpDir("benchkeys-prune") + "/keys"
    val conf = spark.sparkContext.hadoopConfiguration
    (1 to 3).foreach { i =>
      Dedup.writeBenchKeysSnapshot(
        Seq((i.toLong, s"doc number $i words")).toDF("doc_id", "text"),
        "text", store, k = 3)
    }
    assert(Dedup.pruneBenchKeys(conf, store, retain = 1) == Seq(1L, 2L))
    assert(Dedup.benchKeyVersions(conf, store) == Seq(3L))
    // reading a pruned version is an explicit error, not an empty frame
    val gone = intercept[IllegalArgumentException](
      Dedup.readBenchKeysLatest(spark, store, k = 3, version = Some(1L)))
    assert(gone.getMessage.contains("not present"))
    // empty store and shingle-width mismatch both fail fast
    val none = intercept[IllegalArgumentException](
      Dedup.readBenchKeysLatest(spark, tmpDir("bk-empty") + "/nope", k = 3))
    assert(none.getMessage.contains("no bench-key snapshots"))
    val badK = intercept[IllegalArgumentException](
      Dedup.readBenchKeysLatest(spark, store, k = 8))
    assert(badK.getMessage.contains("shingle_k"))
  }

  test("simhashBits: identical docs equal; near docs close; different docs far") {
    val sigs = docs.select(col("doc_id"), Dedup.simhashBits(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(sigs(1L) == sigs(2L))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("simhashPackedFromHashes: lpad(bin(packed)) equals the string form") {
    val both = docs
      .select(col("doc_id"), Dedup.md5TokenHashes(col("text")).as("__h"))
      .select(col("doc_id"),
        Dedup.simhashBitsFromHashes(col("__h")).as("s"),
        lpad(bin(Dedup.simhashPackedFromHashes(col("__h"))), 64, "0").as("p"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: string=${r.getString(1)} packed=${r.getString(2)}"))
  }

  test("simhashNearDupPairs: exact dups at hamming 0, near docs within " +
    "radius, pigeonhole recall vs brute force, bad band config rejected") {
    val out = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact dups (1,2,5 normalize identically) => hamming 0
    assert(out((1L, 2L)) == 0L && out((1L, 5L)) == 0L && out((2L, 5L)) == 0L,
      s"got $out")
    assert(out.values.forall(_ <= 3L))
    // pigeonhole blocking is a GUARANTEE, not an estimate: the banded
    // result must equal the brute-force hamming<=3 pair set exactly
    val sigs = docs.select(col("doc_id"), Dedup.simhashBits(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs if i < j && ham(si, sj) <= 3
    } yield (i, j) -> ham(si, sj).toLong).toMap
    assert(out == brute, s"banded=$out brute=$brute")
    // bands must exceed maxHamming (else no pigeonhole guarantee) and
    // divide 64
    intercept[IllegalArgumentException](
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 4, bands = 4))
    intercept[IllegalArgumentException](
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3, bands = 5))
    // the web-scale 6C3 chunk-combination keys find EXACTLY the same
    // brute-force pair set (recall is a pigeonhole guarantee there too)
    val combined = Dedup.simhashNearDupPairsCombined(docs, "doc_id", "text",
        maxHamming = 3, chunks = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(combined == brute, s"combined=$combined brute=$brute")
    // uneven split (64 = 5*12 + 4): widths 13,13,13,13,12 — still exact
    val c5 = Dedup.simhashNearDupPairsCombined(docs, "doc_id", "text",
        maxHamming = 2, chunks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute2 = brute.filter(_._2 <= 2L)
    assert(c5 == brute2, s"c5=$c5 brute2=$brute2")
    intercept[IllegalArgumentException](
      Dedup.simhashNearDupPairsCombined(docs, "doc_id", "text",
        maxHamming = 6, chunks = 6))
  }

  test("simhashRecallGauge enforces the public tiers' preconditions — a " +
    "chunks <= maxHamming config would emit ZERO truth keys and report " +
    "a vacuous recall 1.0") {
    intercept[IllegalArgumentException](Dedup.simhashRecallGauge(
      docs, "doc_id", "text", maxHamming = 6, bands = 4, chunks = 8))
    intercept[IllegalArgumentException](Dedup.simhashRecallGauge(
      docs, "doc_id", "text", maxHamming = 3, bands = 4, chunks = 3))
    intercept[IllegalArgumentException](Dedup.simhashRecallGauge(
      docs, "doc_id", "text", maxHamming = 3, bands = 4, chunks = 17))
  }

  test("simhash64/hamming64 (xxhash64 fast path)") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
    val joined = sigs.as("a").crossJoin(sigs.as("b"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        Dedup.hamming64(col("a.sh"), col("b.sh")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(joined((1L, 2L)) == 0)
    assert(joined((1L, 3L)) < joined((1L, 4L)))
  }

  test("signatureSimilarity estimates Jaccard from signature agreement") {
    val s = spark; import s.implicits._
    val df = Seq((Seq("a", "b", "c", "d"), Seq("a", "b", "x", "y"))).toDF("s1", "s2")
    assert(df.select(Dedup.signatureSimilarity(col("s1"), col("s2")))
      .head().getDouble(0) == 0.5)
  }

  test("incrementalDedup flags a new shard against persisted signature state") {
    val s = spark; import s.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"
    val history = Seq(
      (1L, base),
      (2L, "completely different text about spark engines and data"),
      (3L, "an unrelated historical document about weather patterns")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                                            // exact dup of 1
      // trailing one-token edit: 15 of 21 shingles shared (jaccard ~0.71)
      (11L, base.replace("tango", "uniform")),                // near dup of 1
      (12L, "a brand new document never seen in any prior run")
    ).toDF("doc_id", "text")
    // state round-trips through parquet — the cross-run contract
    val statePath = tmpDir("sigstate") + "/sigs"
    Dedup.writeSignatureState(
      Dedup.signatureState(history, "doc_id", "text"), statePath)
    val out = Dedup.incrementalDedup(batch,
      Dedup.readSignatureState(s, statePath), "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(10L) == ((true, true, false)),  // exact (and trivially near)
      s"exact re-ingest misflagged: ${out(10L)}")
    assert(out(11L)._1 == false && out(11L)._3 == false,
      s"near dup misflagged: ${out(11L)}")    // near-dup: dropped, not exact
    assert(out(11L)._2, "one-token edit should match history by signature")
    assert(out(12L) == ((false, false, true)), s"novel doc dropped: ${out(12L)}")
    // appending a second batch's state accumulates (mode=append default)
    Dedup.writeSignatureState(
      Dedup.signatureState(batch.where(col("doc_id") === 12L), "doc_id", "text"),
      statePath)
    assert(Dedup.readSignatureState(s, statePath).count() == 4)
  }

  test("signature-state format guard fails fast on pre-K-M or mismatched state") {
    val s = spark; import s.implicits._
    val batch = Seq((1L, "some document text here")).toDF("doc_id", "text")
    // the retired v1 shape: array<string> salted-md5 signature — its band
    // keys can never collide with v2's, so without the guard every doc
    // silently reported near_dup=false against such history
    val v1 = Seq((1L, "fp1", Seq("aa", "bb"))).toDF("id", "fp", "sig")
    val e1 = intercept[IllegalArgumentException](
      Dedup.incrementalDedup(batch, v1, "doc_id", "text", threshold = 0.5))
    assert(e1.getMessage.contains("array<bigint>"))
    // right sig type but a foreign sig_format stamp → equally rejected
    val wrongVer = Seq((1L, "fp1", Seq(1L, 2L), 99)).toDF("id", "fp", "sig", "sig_format")
    val e2 = intercept[IllegalArgumentException](
      Dedup.incrementalDedup(batch, wrongVer, "doc_id", "text", threshold = 0.5))
    assert(e2.getMessage.contains("rebuild"))
    // a v1 table written to parquet is rejected at READ time too
    val p = tmpDir("sigstate-v1") + "/sigs"
    v1.write.parquet(p)
    intercept[IllegalArgumentException](Dedup.readSignatureState(s, p))
    // current-format state round-trips with the version stamp
    val p2 = tmpDir("sigstate-v2") + "/sigs"
    Dedup.writeSignatureState(Dedup.signatureState(batch, "doc_id", "text"), p2)
    val rd = Dedup.readSignatureState(s, p2)
    assert(rd.schema.exists(_.name == "sig_format"))
    assert(rd.select("sig_format").head().getInt(0) == Dedup.SigFormat)
  }

  test("suggestedBucketCap: floor at the exact-dedup hand-off, grows with corpus") {
    assert(Dedup.suggestedBucketCap(500) == 64)     // the sf0.01 gate point
    assert(Dedup.suggestedBucketCap(50) == 64)      // floor
    val caps = Seq(5000L, 1000000L, 1000000000L).map(Dedup.suggestedBucketCap)
    assert(caps == caps.sorted && caps.distinct == caps,
      s"cap must grow strictly with corpus size past the floor: $caps")
    assert(caps.head > 64 && caps.last < 200,
      s"log growth keeps per-doc candidate cost bounded at 1e9 docs: $caps")
    intercept[IllegalArgumentException](Dedup.suggestedBucketCap(0))
  }

  test("connectedComponents: empty pair list yields an empty frame; mixed id types rejected") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.connectedComponents(empty).count() == 0)
    val mixed = Seq((1L, "b")).toDF("id1", "id2")
    intercept[IllegalArgumentException](Dedup.connectedComponents(mixed))
  }

  test("connectedComponents: string ids cluster via surrogates; keeper is lexicographic min") {
    val s = spark; import s.implicits._
    // same chain/triangle/pair topology as the numeric test, string-keyed
    // (URLs): the surrogate mapping must preserve ordering so the cluster
    // label is the lexicographic MIN id — what DuckDB's MIN(varchar) gives
    val pairs = Seq(
      ("u/e", "u/a"), ("u/e", "u/i"), ("u/i", "u/l"), ("u/l", "u/g"), ("u/g", "u/t"),
      ("x/b", "x/c"), ("x/c", "x/d"), ("x/b", "x/d"),
      ("z/9", "z/3")).toDF("id1", "id2")
    def check(cc: Map[String, String]): Unit = {
      assert(Seq("u/a", "u/e", "u/i", "u/l", "u/g", "u/t").forall(cc(_) == "u/a"))
      assert(Seq("x/b", "x/c", "x/d").forall(cc(_) == "x/b"))
      assert(cc("z/9") == "z/3" && cc("z/3") == "z/3")
      assert(cc.size == 11)
    }
    // default: small graph runs min-label DIRECTLY on the string ids
    // (multi-round chain — would catch a string-blind convergence check)
    check(Dedup.connectedComponents(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap)
    // forced surrogate path (threshold 0): identical labels
    s.conf.set("graft.cc.surrogateEdgeThreshold", "0")
    try check(Dedup.connectedComponents(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap)
    finally s.conf.unset("graft.cc.surrogateEdgeThreshold")
  }

  test("connectedComponents: reliable checkpoint path yields identical labels") {
    val s = spark; import s.implicits._
    val ckptDir = tmpDir("cc-ckpt")
    val pairs = Seq((5L, 1L), (5L, 9L), (9L, 12L), (40L, 41L)).toDF("id1", "id2")
    val local = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    s.sparkContext.setCheckpointDir(ckptDir)
    try {
      val reliable = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
    } finally
      // the checkpoint dir is sticky on the shared context: disable the
      // gate so later suites keep the (faster) localCheckpoint path
      s.conf.set("graft.cc.reliableCheckpoint", "false")
  }

  test("connectedComponents: star and min-label agree on random graphs; " +
    "star needs far fewer rounds on a long chain") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // random sparse graph: 120 nodes, 90 edges — mixed chains + clumps —
    // plus adversarial noise: self-loops, duplicates, reversed copies
    val base = Seq.fill(90)(
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val randomPairs = (base ++ base.take(20) ++ base.take(15).map(_.swap) ++
      Seq((7L, 7L), (200L, 200L)))
      .toDF("id1", "id2")
    def run(algo: String, pairs: org.apache.spark.sql.DataFrame) = {
      s.conf.set("graft.cc.algorithm", algo)
      try Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally s.conf.unset("graft.cc.algorithm")
    }
    assert(run("star", randomPairs) == run("minlabel", randomPairs))
    // 40-node chain (diameter 39): min-label pays ~diameter rounds,
    // the star alternation collapses it logarithmically
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("id1", "id2")
    val starLabels = run("star", chain)
    val starRounds = Dedup.lastCcRounds
    val mlLabels = run("minlabel", chain)
    val mlRounds = Dedup.lastCcRounds
    assert(starLabels == mlLabels)
    assert((0L to 39L).forall(starLabels(_) == 0L))
    assert(starRounds * 2 <= mlRounds,
      s"star took $starRounds rounds vs min-label $mlRounds — expected <= half")
  }

  test("incrementalConnectedComponents: fold == from-scratch on the union; " +
    "untouched clusters byte-identical; changedOnly is exactly the delta") {
    val s = spark; import s.implicits._
    // history: chain {1,5,9}, triangle {40,41,42}, pair {90,100},
    // isolated-ish pair {7,20} — four components
    val hist = Seq((5L, 1L), (5L, 9L), (40L, 41L), (41L, 42L), (40L, 42L),
      (100L, 90L), (7L, 20L)).toDF("id1", "id2")
    val prior = Dedup.connectedComponents(hist)
    // batch: merges {1,5,9} with {7,20} (via 9-7), attaches a NEW node
    // 300 to the triangle, adds a brand-new component {200,201}, and a
    // redundant edge inside an existing cluster (41-42: must change nothing)
    val batch = Seq((9L, 7L), (300L, 41L), (200L, 201L), (41L, 42L))
      .toDF("id1", "id2")
    val inc = Dedup.incrementalConnectedComponents(prior, batch).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Dedup.connectedComponents(hist.unionByName(batch)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == scratch)
    assert(Seq(1L, 5L, 9L, 7L, 20L).forall(inc(_) == 1L)) // merged to min
    assert(inc(300L) == 40L && inc(200L) == 200L && inc(201L) == 200L)
    assert(inc(90L) == 90L && inc(100L) == 90L) // untouched cluster
    // the delta: exactly the rows whose label changed plus new nodes —
    // what a persisted labeling store rewrites
    val delta = Dedup.incrementalConnectedComponents(prior, batch,
      changedOnly = true).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(delta == Map(7L -> 1L, 20L -> 1L, 300L -> 40L,
      200L -> 200L, 201L -> 200L),
      s"delta must be {7,20 relabel; 300,200,201 new}: $delta")
    // empty batch: identity labeling, empty delta
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.incrementalConnectedComponents(prior, empty).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      prior.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(Dedup.incrementalConnectedComponents(prior, empty,
      changedOnly = true).count() == 0)
  }

  test("incrementalConnectedComponents: composes across batches and over " +
    "random graphs; string ids; type mismatch rejected") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(41)
    val all = Seq.fill(140)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
    // three successive folds over a random split — output of fold k is
    // the prior of fold k+1 (the canonical-form-preserved claim)
    val parts = all.grouped(47).toSeq
    var labels = Dedup.connectedComponents(parts.head.toDF("id1", "id2"))
    parts.tail.foreach { p =>
      labels = Dedup.incrementalConnectedComponents(labels, p.toDF("id1", "id2"))
    }
    val scratch = Dedup.connectedComponents(all.toDF("id1", "id2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == scratch)
    // string ids ride the same path (contracted CC dispatches as usual)
    val sPrior = Dedup.connectedComponents(
      Seq(("u/e", "u/a"), ("x/b", "x/c")).toDF("id1", "id2"))
    val sInc = Dedup.incrementalConnectedComponents(sPrior,
      Seq(("u/a", "x/c"), ("z/9", "z/3")).toDF("id1", "id2")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("u/a", "u/e", "x/b", "x/c").forall(sInc(_) == "u/a"))
    assert(sInc("z/9") == "z/3" && sInc("z/3") == "z/3")
    intercept[IllegalArgumentException](
      Dedup.incrementalConnectedComponents(sPrior,
        Seq((1L, 2L)).toDF("id1", "id2")))
  }

  test("ccLabelStore: fold == from-scratch labels through the persisted " +
    "store; a fold physically rewrites only the merged clusters' buckets " +
    "(cold buckets carry by manifest); a no-op batch lands all-carried") {
    val s = spark; import s.implicits._
    val store = tmpDir("cc-store") + "/labels"
    val conf = spark.sparkContext.hadoopConfiguration
    val buckets = 8
    // history: 40 two-node clusters {0,1},{2,3},...,{78,79} — enough
    // labels that all 8 cluster buckets are populated
    val hist = (0L until 80L by 2L).map(i => (i, i + 1L)).toDF("id1", "id2")
    Dedup.writeCcLabelStore(Dedup.connectedComponents(hist), store,
      clusterBuckets = buckets)
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    def cbDirs(v: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$store/version=$v"))
      .map(_.getPath.getName).filter(_.startsWith("cb=")).toSeq.sorted
    assert(cbDirs(1L).size == buckets,
      s"40 clusters must fill all $buckets buckets: ${cbDirs(1L)}")
    // batch: merges clusters 0 and 2 (edge 1-2), hangs NEW node 1000
    // onto cluster 40, adds a brand-new component {500, 501}
    val batch = Seq((1L, 2L), (1000L, 40L), (500L, 501L)).toDF("id1", "id2")
    Dedup.appendCcEdgesToLabelStore(s, store, batch)
    val got = Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Dedup.connectedComponents(hist.unionByName(batch))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scratch, "store must serve the from-scratch union labels")
    // physically landed dirs == the buckets of the touched labels
    // ({2->0 remap, 1000 contracted onto 40, new clusters 40/500}),
    // computed with the same hash the store uses
    val expectTouched = Seq(2L, 0L, 1000L, 40L, 500L)
      .map(c => spark.range(1)
        .select(pmod(xxhash64(lit(c)), lit(buckets.toLong)).cast("int"))
        .head.getInt(0)).distinct.sorted
    assert(cbDirs(2L) == expectTouched.map(b => s"cb=$b"),
      s"v2 must land only touched buckets: ${cbDirs(2L)} vs $expectTouched")
    val manifest = graft.llm.LayoutStore.readManifest(conf, store, 2L).get
    assert(manifest.count { case (k, o) => k.startsWith("cb=") && o == 1L }
      == buckets - expectTouched.size,
      s"cold buckets must carry by reference: $manifest")
    // a no-op batch (edge inside one existing cluster) merges nothing:
    // the new version carries EVERY bucket, writes none
    Dedup.appendCcEdgesToLabelStore(s, store,
      Seq((4L, 5L)).toDF("id1", "id2"))
    assert(cbDirs(3L).isEmpty, s"no-op fold must write nothing: ${cbDirs(3L)}")
    assert(Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == scratch,
      "no-op fold must serve the same labeling")
  }

  test("takedownCcLabelStore: exact tier re-splits bridged clusters from " +
    "the pair graph; conservative tier over-groups (stated upper bound); " +
    "fully-revoked clusters vanish; isolated survivors stay as singletons") {
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // pair graph: 2 bridges 1-3 (chain), {40,41} a pair, {90,91} a pair
    // that will be FULLY revoked, 70-71 where 71's only partner is
    // revoked (isolated-survivor case)
    val pairs = (Seq((1L, 2L), (2L, 3L), (40L, 41L), (90L, 91L),
      (70L, 71L)) ++ (200L until 280L by 10L).map(i => (i, i + 1L)))
      .toDF("id1", "id2")
    def freshStore(tag: String): String = {
      val p = tmpDir(s"cc-td-$tag") + "/labels"
      Dedup.writeCcLabelStore(Dedup.connectedComponents(pairs), p,
        clusterBuckets = 4)
      p
    }
    // the 200-series filler clusters exist only to populate every
    // bucket (cold-carry must have something to carry) — assertions
    // look at the ids the revocation story is about
    def read(p: String) = Dedup.readCcLabelStore(s, p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._1 < 200L).toMap
    val revoked = Seq(2L, 90L, 91L, 70L).toDF("rid")
    // EXACT: the 1-3 bridge (doc 2) splits {1,2,3} into singletons;
    // {90,91} vanishes entirely; 71 survives alone; {40,41} untouched
    val exact = freshStore("exact")
    Dedup.takedownCcLabelStore(s, exact, revoked, "rid", pairs = Some(pairs))
    assert(read(exact) == Map(1L -> 1L, 3L -> 3L, 40L -> 40L, 41L -> 40L,
      71L -> 71L))
    // CONSERVATIVE: {1,3} stays merged (upper bound), labeled min
    // surviving id
    val cons = freshStore("cons")
    Dedup.takedownCcLabelStore(s, cons, revoked, "rid")
    assert(read(cons) == Map(1L -> 1L, 3L -> 1L, 40L -> 40L, 41L -> 40L,
      71L -> 71L))
    // revoking a cluster's LABEL id relabels to the min survivor, and
    // only the touched buckets land physically (cold carry by manifest)
    val lab = freshStore("label")
    Dedup.takedownCcLabelStore(s, lab, Seq(1L).toDF("rid"), "rid",
      pairs = Some(pairs))
    val got = read(lab)
    assert(got(2L) == 2L && got(3L) == 2L && got(40L) == 40L)
    val fs = new org.apache.hadoop.fs.Path(lab).getFileSystem(conf)
    def dirsOf(v: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$lab/version=$v"))
      .map(_.getPath.getName).filter(_.startsWith("cb=")).toSeq.sorted
    val expectTouched = Seq(1L, 2L).map(c => spark.range(1)
        .select(pmod(xxhash64(lit(c)), lit(4L)).cast("int"))
        .head.getInt(0)).distinct.sorted.map(b => s"cb=$b")
    assert(dirsOf(2L) == expectTouched,
      s"only touched buckets may land: ${dirsOf(2L)} vs $expectTouched")
    val carried = graft.llm.LayoutStore.readManifest(conf, lab, 2L).get
      .collect { case (k, 1L) if k.startsWith("cb=") => k }.toSeq.sorted
    assert(carried == (dirsOf(1L) diff expectTouched),
      s"cold buckets must carry by reference: $carried")
    assert(carried.nonEmpty,
      "the filler clusters must leave at least one cold bucket")
    // empty revocation: all-carried version, labels unchanged
    val before = read(lab)
    Dedup.takedownCcLabelStore(s, lab,
      Seq.empty[Long].toDF("rid"), "rid")
    assert(read(lab) == before)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$lab/version=3"))
      .map(_.getPath.getName).count(_.startsWith("cb=")) == 0,
      "an empty revocation must write nothing")
  }

  test("ccEdgeStore sidecar: append keeps the sidecar in lockstep with " +
    "the labels (canonical deduped edges labeled by the served " +
    "clustering, touched-bucket writes); takedown with pairs = None " +
    "sources the EXACT tier from the sidecar — bridges split, " +
    "revoked-incident edges drop, survivors relabel") {
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = tmpDir("cc-sidecar")
    val store = root + "/labels"
    val edges = root + "/edges"
    val buckets = 4
    // history: chain 1-2-3 (bridge at 2), pair {40,41}, filler pairs
    // to populate every bucket
    val fillers = (200L until 280L by 10L).map(i => (i, i + 1L))
    val hist = (Seq((1L, 2L), (2L, 3L), (40L, 41L)) ++ fillers)
      .toDF("id1", "id2")
    val labels0 = Dedup.connectedComponents(hist).localCheckpoint()
    Dedup.writeCcLabelStore(labels0, store, clusterBuckets = buckets)
    Dedup.writeCcEdgeStore(labels0, hist, edges, clusterBuckets = buckets)
    def servedLabels() = Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def sidecar() = Dedup.readCcEdgeStore(s, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch: 3-40 merges the chain with {40,41}; {500,501} is new; the
    // REVERSED duplicate (3,2) must collapse into the existing edge
    val batch = Seq((3L, 40L), (500L, 501L), (3L, 2L)).toDF("id1", "id2")
    Dedup.appendCcEdgesToLabelStore(s, store, batch,
      edgesPath = Some(edges))
    val lab1 = servedLabels()
    assert(lab1(40L) == 1L && lab1(500L) == 500L, s"merge failed: $lab1")
    val unionEdges = (Seq((1L, 2L), (2L, 3L), (40L, 41L), (3L, 40L),
      (500L, 501L)) ++ fillers).toSet
    assert(sidecar() == unionEdges.map { case (a, b) => (a, b, lab1(a)) },
      "sidecar must hold exactly the canonical union edges labeled by " +
        "the served clustering (no duplicate from the reversed edge)")
    // write discipline: the append landed only the touched buckets on
    // the sidecar (merged labels 40→1, the new node's 501→500 remap —
    // both sides of every remap entry — plus the batch edges' final
    // clusters 1/500)
    val fs = new org.apache.hadoop.fs.Path(edges).getFileSystem(conf)
    def ebDirs(v: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$edges/version=$v"))
      .map(_.getPath.getName).filter(_.startsWith("cb=")).toSeq.sorted
    val expectTouched = Seq(1L, 40L, 500L, 501L).map(c => spark.range(1)
        .select(pmod(xxhash64(lit(c)), lit(buckets.toLong)).cast("int"))
        .head.getInt(0)).distinct.sorted.map(b => s"cb=$b")
    assert(ebDirs(2L) == expectTouched,
      s"sidecar append must land only touched buckets: ${ebDirs(2L)}")
    // takedown with NO caller graph: revoking bridge 2 must split
    // {1,2,3,40,41} exactly — 1 isolates, {3,40,41} survives connected
    Dedup.takedownCcLabelStore(s, store, Seq(2L).toDF("rid"), "rid",
      pairs = None, edgesPath = Some(edges))
    val lab2 = servedLabels()
    assert(lab2.get(2L).isEmpty && lab2(1L) == 1L && lab2(3L) == 3L &&
      lab2(40L) == 3L && lab2(41L) == 3L,
      s"sidecar-sourced exact tier must split the bridge: $lab2")
    // the sidecar itself folded: revoked-incident edges gone, surviving
    // affected edges relabeled to the rebuilt cluster
    val expectAfter = (Seq((40L, 41L), (3L, 40L)).map(e => (e._1, e._2, 3L))
      ++ Seq((500L, 501L, 500L)) ++ fillers.map { case (a, b) => (a, b, a) })
      .toSet
    assert(sidecar() == expectAfter,
      s"sidecar must drop revoked-incident edges and relabel: ${sidecar()}")
  }

  test("exactSpanCutLists: duplicated k-gram extents union into maximal " +
    "spans; adjacent extents (gap == k) merge, disjoint (gap > k) " +
    "don't; within-doc repeats never mark; unique docs emit nothing") {
    val s = spark; import s.implicits._
    val fixture = Seq(
      (1L, "a b c d e f"),        // shares 'a b c','b c d' with doc 2
      (2L, "z z a b c d q"),
      (3L, "p q r"),              // unique
      (4L, "m n o m n o"),        // 'm n o' repeats WITHIN one doc only
      (7L, "u v w x y z"),        // duplicated at pos {0,3}: gap 3 == k → ONE span
      (8L, "u v w m x y z")       // duplicated at pos {0,4}: gap 4 > k → TWO spans
    ).toDF("doc_id", "text")
    val got = Dedup.exactSpanCutLists(fixture, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 3L, 4L),   // "a b c d"
      (2L, 2L, 5L, 4L),   // "a b c d"
      (7L, 0L, 5L, 6L),   // extents [0,2]+[3,5] adjacent → whole doc
      (8L, 0L, 2L, 3L), (8L, 4L, 6L, 3L)), s"$got")
    // the 128-bit fingerprint tier (the 100 TB shuffle payload) must
    // produce the IDENTICAL cut lists — the key is internal, only a
    // 2^-128 collision could diverge
    val gotFp = Dedup.exactSpanCutLists(fixture, "doc_id", "text", k = 3,
        fingerprintGrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(gotFp == got, s"fingerprint tier diverged: $gotFp vs $got")
  }

  test("contaminationSpanCutLists: marks exactly the corpus extents " +
    "shared with the benchmark side — cross-set only (corpus-internal " +
    "duplication never marks, benchmark-internal duplication is " +
    "irrelevant), extents union per the same gap rule") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),   // 'a b c','b c d' in bench → span [0,3]
      (2L, "a b c d e f"),   // corpus-internal dup of doc 1 — same marks,
                             // and the duplication itself must NOT widen them
      (3L, "p q r s"),       // nothing shared with bench
      (4L, "u v w x u v w")  // 'u v w' at pos {0,4}: gap 4 > k → two spans
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "z a b c d z"),
      (101L, "u v w"),
      (102L, "u v w")        // bench-internal dup: no effect on marks
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationSpanCutLists(corpus, "doc_id", "text",
        bench, "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 3L, 4L), (2L, 0L, 3L, 4L),
      (4L, 0L, 2L, 3L), (4L, 4L, 6L, 3L)), s"$got")
    val gotFp = Dedup.contaminationSpanCutLists(corpus, "doc_id", "text",
        bench, "text", k = 3, fingerprintGrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(gotFp == got, s"fingerprint tier diverged: $gotFp vs $got")
  }

  test("removeSpans: cut tokens drop, survivors re-join in order, " +
    "cut-free and fully-cut docs both survive") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "z z a b c d q"),
      (3L, "p  q r"),        // no cuts — re-tokenized (ws normalized)
      (9L, "x y z")          // fully cut below
    ).toDF("doc_id", "text")
    val cuts = Seq(
      (1L, 0L, 3L),          // "a b c d" out
      (2L, 2L, 5L),
      (9L, 0L, 2L)           // whole doc out
    ).toDF("id", "span_start", "span_end")
    val got = Dedup.removeSpans(docs, "doc_id", "text", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "e f", 2L -> "z z q", 3L -> "p q r", 9L -> ""), s"$got")
  }

  test("takedownCcLabelStore crash-replay: a crash AFTER the sidecar " +
    "fold but BEFORE the label write replays into the identical " +
    "labeling — the endpoint-selected sidecar read is insensitive to " +
    "whether the sidecar already carries replacement labels") {
    val s = spark; import s.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = tmpDir("cc-sidecar-replay")
    val store = root + "/labels"
    val edges = root + "/edges"
    // chain 1-2-3 (bridge at 2, so the takedown SPLITS the cluster and
    // every replacement label differs from the old one — the exact
    // case an old-label sidecar read would lose) + {10,11} where the
    // cluster MIN is revoked (label changes without a split) + fillers
    val fillers = (200L until 260L by 10L).map(i => (i, i + 1L))
    val hist = (Seq((1L, 2L), (2L, 3L), (10L, 11L)) ++ fillers)
      .toDF("id1", "id2")
    val labels0 = Dedup.connectedComponents(hist).localCheckpoint()
    Dedup.writeCcLabelStore(labels0, store, clusterBuckets = 4)
    Dedup.writeCcEdgeStore(labels0, hist, edges, clusterBuckets = 4)
    val revoked = Seq(2L, 10L).toDF("rid")
    def labels() = Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def sidecar() = Dedup.readCcEdgeStore(s, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // uncrashed run, for the expected end state
    Dedup.takedownCcLabelStore(s, store, revoked, "rid",
      pairs = None, edgesPath = Some(edges))
    val wantLabels = labels()
    val wantSidecar = sidecar()
    assert(wantLabels(1L) == 1L && wantLabels(3L) == 3L &&
      wantLabels(11L) == 11L && !wantLabels.contains(2L),
      s"fixture must split the bridge and relabel the revoked min: $wantLabels")
    // reconstruct the crash state EXACTLY: sidecar fold landed (v2),
    // label write did not (drop the label store's new version)
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$store/version=2"),
      true), "fixture must roll the label store back to v1")
    assert(LayoutStore.versions(conf, store) == Seq(1L) &&
      LayoutStore.versions(conf, edges) == Seq(1L, 2L),
      "crash state: labels at v1, sidecar already folded at v2")
    // replay: the at-least-once redelivery of the same takedown
    Dedup.takedownCcLabelStore(s, store, revoked, "rid",
      pairs = None, edgesPath = Some(edges))
    assert(labels() == wantLabels,
      s"replay must land the identical labeling: ${labels()} vs $wantLabels")
    // and the sidecar re-fold is a fixpoint (content unchanged at v3)
    assert(sidecar() == wantSidecar,
      s"sidecar re-fold must be a no-op on content: ${sidecar()}")
  }

  test("ccLabelStore: generic snapshot compaction composes with the " +
    "cluster-bucket layout — labels unchanged, manifest references " +
    "collapse to one physical version") {
    val s = spark; import s.implicits._
    val store = tmpDir("cc-compact") + "/labels"
    val conf = spark.sparkContext.hadoopConfiguration
    val hist = (0L until 40L by 2L).map(i => (i, i + 1L)).toDF("id1", "id2")
    Dedup.writeCcLabelStore(Dedup.connectedComponents(hist), store,
      clusterBuckets = 4)
    // three folds leave a version chain whose entries scatter across
    // owners (the fragmentation a long maintenance run accumulates)
    Seq(Seq((1L, 2L)), Seq((100L, 101L)), Seq((5L, 100L))).zipWithIndex
      .foreach { case (b, _) =>
        Dedup.appendCcEdgesToLabelStore(s, store, b.toDF("id1", "id2")) }
    val before = Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = graft.llm.LayoutStore.compactSnapshot(s, store)
    assert(graft.llm.LayoutStore.readManifest(conf, store, v)
      .forall(_.values.forall(_ == v)),
      "a compacted version must own every entry physically")
    val after = Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "compaction must be row-invisible")
    // and the compacted store still FOLDS (bucket marker survives)
    Dedup.appendCcEdgesToLabelStore(s, store,
      Seq((200L, 201L)).toDF("id1", "id2"))
    assert(Dedup.readCcLabelStore(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      == before ++ Map(200L -> 200L, 201L -> 200L))
  }

  test("connectedComponents: chains converge to min id; components stay disjoint") {
    val s = spark; import s.implicits._
    // component A is a 6-node CHAIN (5-1-9-12-7-20: diameter 5, forces
    // several propagation rounds); component B a triangle; C a lone pair
    val pairs = Seq(
      (5L, 1L), (5L, 9L), (9L, 12L), (12L, 7L), (7L, 20L), // A, min=1
      (40L, 41L), (41L, 42L), (40L, 42L),                  // B, min=40
      (100L, 90L)).toDF("id1", "id2")                      // C, min=90
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 5L, 9L, 12L, 7L, 20L).forall(cc(_) == 1L))
    assert(Seq(40L, 41L, 42L).forall(cc(_) == 40L))
    assert(cc(90L) == 90L && cc(100L) == 90L)
    assert(cc.size == 11)
  }

  test("removeBoilerplateSpans: covered positions cut (case-insensitive " +
    "match, original case kept), short/clean docs untouched, overlapping " +
    "spans union, partitioning-independent") {
    val s = spark; import s.implicits._
    // "click here to subscribe" appears in docs 1-3 (df=3 > 2, hot; doc 2
    // uppercased — the key is case-normalized but output keeps case);
    // doc 4 shares it truncated (3 tokens, no hot 4-gram); doc 5 clean;
    // doc 6 shorter than width; doc 7 has the span twice, overlapping
    // unique words between -> union of covered positions
    val docs = Seq(
      (1L, "alpha click here to subscribe beta"),
      (2L, "CLICK HERE TO SUBSCRIBE gamma delta"),
      (3L, "x y click here to subscribe"),
      (4L, "click here to nothing else at all"),
      (5L, "totally unique words nowhere repeated ever"),
      (6L, "tiny doc"),
      (7L, "click here to subscribe click here to subscribe tail")
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.removeBoilerplateSpans(d, "doc_id", "text", width = 4, maxDocFreq = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val out = run(docs)
    assert(out(1L) == ((6L, 4L, "alpha beta")))
    assert(out(2L) == ((6L, 4L, "gamma delta")), "original case preserved in survivors")
    assert(out(3L) == ((6L, 4L, "x y")))
    assert(out(4L) == ((7L, 0L, "click here to nothing else at all")))
    assert(out(5L)._2 == 0L && out(6L)._2 == 0L)
    // doc 7: hot starts 0..4 (all 4-grams of the doubled span are hot or
    // the span itself repeats) — at minimum both full-span starts 0 and 4
    // are hot, covering positions 0..7; "tail" survives
    assert(out(7L)._3 == "tail", s"got ${out(7L)}")
    assert(run(docs.repartition(5)) == out, "partitioning independence")
  }

  test("stratumOverlap: hand-computed full matrix — distinct shingles per " +
    "stratum, zero-overlap pairs kept, short docs contribute nothing") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c", "sx"),   // sx grams: {a b, b c}
      (2L, "a b", "sx"),     // adds nothing new ({a b} already in sx)
      (3L, "b c d", "sy"),   // sy grams: {b c, c d}
      (4L, "q r", "sz"),     // sz grams: {q r}
      (5L, "solo", "sz")     // 1 token < width -> no grams
    ).toDF("doc_id", "text", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.stratumOverlap(d, "text", "lang", width = 2)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val out = run(docs)
    assert(out.keySet == Set(("sx", "sy"), ("sx", "sz"), ("sy", "sz")),
      s"got ${out.keySet}")
    assert(out(("sx", "sy")) == ((2L, 2L, 1L, 1.0 / 3.0)), // share {b c}
      s"got ${out(("sx", "sy"))}")
    assert(out(("sx", "sz")) == ((2L, 1L, 0L, 0.0)), s"got ${out(("sx", "sz"))}")
    assert(out(("sy", "sz")) == ((2L, 1L, 0L, 0.0)), s"got ${out(("sy", "sz"))}")
    assert(run(docs.repartition(7)) == out, "partitioning independence")
    // case-normalized keys: "A B C" shares everything with "a b c"
    val cased = Seq((1L, "A B c", "u"), (2L, "a b C", "v"))
      .toDF("doc_id", "text", "lang")
    val o2 = run(cased)
    assert(o2(("u", "v")) == ((2L, 2L, 2L, 1.0)), s"got ${o2(("u", "v"))}")
  }

  test("editNearDupPairs: hand-checked pairs, threshold boundary, short-" +
    "string path") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),  // dist 0 to 1
      (3L, "the quick brown fox jumps over the lazy catt"), // dist 4 to 1
      (4L, "a completely different sentence about engines"),
      (5L, "ab"),                                           // short path
      (6L, "abcd"),                                         // dist 2 to 5
      (7L, "xxxxyyyyzzzz")                                  // dist > 4 to all
    ).toDF("doc_id", "text")
    val out = Dedup.editNearDupPairs(df, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 0L, (1L, 3L) -> 4L, (2L, 3L) -> 4L,
      (5L, 6L) -> 2L), s"got $out")
  }

  test("editNearDupPairs: equals the naive quadratic join on a seeded " +
    "random corpus (lossless blocking)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "ab "
    val rows = (1L to 80L).map { i =>
      val n = rnd.nextInt(41) // includes lengths 0..k (short path)
      (i, (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val df = rows.toDF("doc_id", "text")
    val k = 3
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toSet
    val a = df.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = df.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val naive = pairSet(a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .where(col("dist") <= k).select("id_a", "id_b", "dist"))
    val got = pairSet(Dedup.editNearDupPairs(df, "doc_id", "text", k))
    assert(naive.nonEmpty, "degenerate fixture: no close pairs")
    assert(got == naive,
      s"missed=${naive -- got} extra=${got -- naive}")
    // partitioning independence
    val got7 = pairSet(Dedup.editNearDupPairs(df.repartition(7),
      "doc_id", "text", k))
    assert(got7 == naive)
  }

  test("editDupFlags: newest snapshot pins the reference, k comes from " +
    "the snapshot meta, short history docs take the length-window path") {
    val s = spark; import s.implicits._
    val store = tmpDir("editidx") + "/store"
    // v1 reference would match batch doc 20; the v2 REFRESH retires it
    Dedup.writeEditIndexSnapshot(
      Seq((1L, "an utterly unrelated reference document")).toDF("id", "t"),
      "id", "t", k = 4, path = store)
    Dedup.writeEditIndexSnapshot(Seq(
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, "abc")  // l <= k: the broadcast length-window path
      ).toDF("id", "t"), "id", "t", k = 4, path = store)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dogs"), // dist 1 to 2
      (11L, "abcde"),                                        // dist 2 to 3
      (12L, "something else entirely different here"),       // no match
      (20L, "an utterly unrelated reference document")       // only in v1
    ).toDF("doc_id", "text")
    val out = Dedup.editDupFlags(s, batch, "doc_id", "text", store)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out == Map(10L -> ((true, 1L)), 11L -> ((true, 2L)),
      12L -> ((false, -1L)), 20L -> ((false, -1L))), s"got $out")
    // the retired v1 stays addressable by explicit pin
    val v1 = Dedup.editDupFlags(s, batch, "doc_id", "text", store,
      version = Some(1L)).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v1 == Map(10L -> false, 11L -> false, 12L -> false, 20L -> true),
      s"got $v1")
  }

  test("editDupFlags: equals the naive batch x reference join on a " +
    "seeded random corpus (bidirectional windows are lossless)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(1234)
    val alpha = "ab "
    def mk(n: Int, idBase: Long) = (1 to n).map { i =>
      val len = rnd.nextInt(41)
      (idBase + i,
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val hist = mk(60, 1000L).toDF("doc_id", "text")
    val batch = mk(40, 2000L).toDF("doc_id", "text")
    val k = 3
    val store = tmpDir("editidx-rand") + "/store"
    Dedup.writeEditIndexSnapshot(hist, "doc_id", "text", k, store)
    val got = Dedup.editDupFlags(s, batch, "doc_id", "text", store)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2)))).toMap
    val naive = batch.as("b").crossJoin(hist.as("h"))
      .withColumn("d", levenshtein(col("b.text"), col("h.text")).cast("long"))
      .groupBy(col("b.doc_id"))
      .agg(min(when(col("d") <= k, col("d"))).as("md"))
      .collect().map(r => r.getLong(0) ->
        ((!r.isNullAt(1), if (r.isNullAt(1)) -1L else r.getLong(1)))).toMap
    assert(got.exists(_._2._1), "degenerate fixture: no dup flagged")
    assert(got == naive,
      s"diff=${(got.toSet -- naive.toSet) ++ (naive.toSet -- got.toSet)}")
  }

  test("editCanonical: keep the longest copy per edit component, ties min " +
    "id; docs outside the pair graph don't appear") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "aaaa bbbb cccc"),
      (2L, "aaaa bbbb cccc dd"),   // longest in cluster {1,2,3}
      (3L, "aaaa bbbb cccx"),
      (7L, "aaaa bbbb cccc dd"),   // exact dup of 2: tie -> min id (2)
      (9L, "totally unrelated text here")  // singleton: absent
    ).toDF("doc_id", "text")
    val out = Dedup.editCanonical(df, "doc_id", "text",
        quality = org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")), k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(1L -> ((1L, false)), 2L -> ((1L, true)),
      3L -> ((1L, false)), 7L -> ((1L, false))), s"got $out")
  }

  test("lshRecallGauge: exact dups give recall 1.0; precision is 1.0 by " +
    "construction (found is always a subset of truth)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "totally different text about something else entirely")
    ).toDF("doc_id", "text")
    val r = Dedup.lshRecallGauge(df, "doc_id", "text", threshold = 0.5).head()
    // exact dups collide in EVERY band: all 3 true pairs found
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 3L)), r)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, r)
    // the production-config gauge on the mixed fixture: found ⊆ truth
    val m = Dedup.lshRecallGauge(docs, "doc_id", "text", threshold = 0.5).head()
    assert(m.getLong(2) == m.getLong(1), s"precision must be 1: $m")
    assert(m.getLong(2) <= m.getLong(0), m)
  }

  test("lshRecallGauge: the size-frame broadcast hint is plan-stats " +
    "guarded — over the bound it degrades to a shuffle join, same result") {
    val r = Dedup.lshRecallGauge(docs, "doc_id", "text", threshold = 0.5)
      .head()
    // sizesBroadcastMaxBytes=0 trips the guard for ANY input: the static
    // hint is dropped and the join planning is left to AQE — the result
    // must be identical (the hint is a perf choice, never semantics)
    val guarded = Dedup.lshRecallGauge(docs, "doc_id", "text",
      threshold = 0.5, sizesBroadcastMaxBytes = 0L).head()
    assert(guarded.toSeq == r.toSeq, s"guarded=$guarded unguarded=$r")
  }
}

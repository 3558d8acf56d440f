package graft

import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Adversarial-scale dedup bench — the closest local proxy for the 100TB
  * claim. Builds a duplicate-heavy corpus >=100x the sf0.1 documents table
  * with SKEWED near-dup clusters (every base doc replicated with a small
  * trailing edit; a few "boilerplate" docs replicated thousands of times —
  * the mega-cluster that turns naive LSH pairing quadratic), writes it as
  * parquet, then measures the production dedup surfaces over real scans:
  *
  *   - exact dedup (fingerprint groupBy) over the full corpus;
  *   - LSH candidate pairing WITH the bucket-size cap (hot boilerplate
  *     buckets are dropped from pairing — they're duplicate GROUPS, found
  *     in O(B) by the exact/keep-min path, not O(B^2) pair listing);
  *   - winnowing fingerprints (the chargram-md5 + codegen'd minima path).
  *
  * Emits one JSON line (and SCALE_BENCH.json) with corpus size, per-stage
  * seconds, and result cardinalities. Run:
  *   sbt "runMain graft.ScaleBench" (env: SPARK_GRAFT_SF_DIR, GRAFT_SCALE_COLD,
  *   GRAFT_SCALE_HOT to shrink for smoke runs)
  */
object ScaleBench {

  /** Physical accounting between two snapshot versions:
    * (filesCopied, bytesCopied, filesWritten, bytesWritten). A file
    * counts as COPIED when the new version holds the same relative
    * path with the same name and size; everything else was written
    * through Spark. Under the manifest-referenced version model the
    * copied numbers read ~0 by construction — untouched dirs are not
    * present in the new version dir at all (inherited_dirs in the
    * artifact counts them), which IS the claim. */
  private[graft] def versionDiff(v1: String, v2: String)
      : (Long, Long, Long, Long) = {
    def walk(root: java.io.File, prefix: String): Map[String, Long] = {
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
        .flatMap { f =>
          if (f.isDirectory) walk(f, s"$prefix${f.getName}/")
          else if (f.getName.startsWith("_") || f.getName.startsWith("."))
            Nil
          else Seq(s"$prefix${f.getName}" -> f.length)
        }.toMap
    }
    val a = walk(new java.io.File(v1), "")
    val b = walk(new java.io.File(v2), "")
    val (copied, written) =
      b.partition { case (p, len) => a.get(p).contains(len) }
    (copied.size.toLong, copied.values.sum,
      written.size.toLong, written.values.sum)
  }

  /** Attribution stamp for the artifact line: host/cpus/ts plus the git
    * HEAD the run was built from (read from .git directly — no process
    * fork), so every committed number is traceable to the code state
    * that produced it. */
  private[graft] def provenanceJson(): String = {
    def jsonEscape(s: String): String =
      s.flatMap {
        case '"'           => "\\\""
        case '\\'          => "\\\\"
        case c if c < ' '  => f"\\u${c.toInt}%04x"
        case c             => c.toString
      }
    val host = jsonEscape(
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown" })
    // resolve .git by walking up from GRAFT_REPO_ROOT (if set) or the
    // CWD, so a run launched from a subdirectory still stamps its HEAD
    val head = try {
      val start = java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_REPO_ROOT", ".")).toAbsolutePath
      val gitDir = Iterator.iterate(start)(_.getParent)
        .takeWhile(_ != null).map(_.resolve(".git"))
        .find(java.nio.file.Files.exists(_))
      gitDir.map { g =>
        val h = java.nio.file.Files.readString(g.resolve("HEAD")).trim
        if (h.startsWith("ref: "))
          java.nio.file.Files.readString(g.resolve(h.drop(5))).trim.take(12)
        else h.take(12)
      }.getOrElse("unknown")
    } catch { case _: Exception => "unknown" }
    s"""{"host":"$host","cpus":${Runtime.getRuntime.availableProcessors()},""" +
      s""""head":"$head","ts":"${java.time.Instant.now()}"}"""
  }

  /** Label-propagation, HITS, triangle/LCC, personalized-PageRank,
    * assortativity and k-core sections over the
    * candidate pair graph — shared by the 544k and 988k mains. Each
    * operator runs once, re-runs over a repartitioned edge frame, and
    * ASSERTS the exact result checksum is partitioning-invariant (the
    * d79 discipline: bit-exactness is enforced by the bench itself,
    * not claimed). Returns a JSON fragment ending in a comma.
    *
    * The input edge frame is localCheckpoint-MATERIALIZED first (cost
    * stamped as `graph_input_secs`): the r15 artifact's 318s-vs-131s
    * triangle spread was the candidate frame's cache partially evicted
    * by the preceding sections — the first run re-paid LSH candidate
    * generation, the rerun read it warm, and the committed number was
    * unreadable as an operator cost. A checkpointed input makes every
    * first-run/rerun pair measure the OPERATOR. */
  private[graft] def graphSectionsJson(
      candsIn: org.apache.spark.sql.DataFrame): String = {
    def secs(since: Long): Double = (System.nanoTime() - since) / 1e9
    def checksum(df: org.apache.spark.sql.DataFrame,
                 cols: Seq[String]): java.math.BigDecimal =
      df.agg(sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)")))
        .head().getDecimal(0)
    val tIn = System.nanoTime()
    val cands = candsIn.select(col("id1"), col("id2")).localCheckpoint()
    val inputSecs = secs(tIn)

    // ---- seeded label propagation (2 hops) ------------------------------
    // seeds: every 4th node labeled by a 5-way id-derived class — pure
    // function of the graph, like d82's trusted slice
    val seeds = cands.select(col("id1").as("id"))
      .unionByName(cands.select(col("id2").as("id"))).distinct()
      .where(col("id") % 4 === 0)
      .select(col("id"), (col("id") % 5).cast("string").as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tLp = System.nanoTime()
    val lp = graft.operators.LabelPropagation.propagateLabels(cands,
      seeds, iters = 2)
    val lpNodes = lp.count()
    val lpSecs = secs(tLp)
    val lpLabeled = lp.where(col("label").isNotNull)
    val lpHash = checksum(lpLabeled, Seq("node", "label"))
    val tLp2 = System.nanoTime()
    val lp2 = graft.operators.LabelPropagation.propagateLabels(
      cands.repartition(13), seeds, iters = 2)
    val lpSecs2 = secs(tLp2)
    require(checksum(lp2.where(col("label").isNotNull),
        Seq("node", "label")) == lpHash && lp2.count() == lpNodes,
      "label propagation diverged across partitionings")
    seeds.unpersist(blocking = true)

    // ---- HITS hubs/authorities (2 rounds) --------------------------------
    val hEdges = cands.select(col("id1").as("src"), col("id2").as("dst"))
    val tH = System.nanoTime()
    val hits = graft.operators.PageRank.hitsFixedPoint(hEdges, iters = 2)
    val hitsNodes = hits.count()
    val hitsSecs = secs(tH)
    val hitsHash = checksum(hits, Seq("node", "hub", "auth"))
    val tH2 = System.nanoTime()
    val hits2 = graft.operators.PageRank.hitsFixedPoint(
      hEdges.repartition(13), iters = 2)
    val hitsSecs2 = secs(tH2)
    require(checksum(hits2, Seq("node", "hub", "auth")) == hitsHash &&
      hits2.count() == hitsNodes,
      "HITS diverged across partitionings")

    // ---- triangle counts / local clustering coefficient ------------------
    // the curation density signal at corpus scale: the near-dup graph's
    // verbatim mega-clusters are (capped) cliques — high LCC — while
    // organic cold replicas sit on sparse chains. Degree-ordered
    // orientation keeps the wedge fan-out O(sqrt m) per node, so the
    // hot clusters cannot go quadratic.
    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val tT = System.nanoTime()
    val tri = graft.operators.Triangles.triangleCounts(cands,
      stageSecs = Some((k, v) => stages(k) = v))
    val triNodes = tri.count()
    val triSecs = secs(tT)
    val triTotal = tri.agg(sum(col("triangles")).cast("decimal(38,0)"))
      .head().getDecimal(0).longValueExact() / 3
    val triHash = checksum(tri, Seq("id", "degree", "triangles", "lcc"))
    val tT2 = System.nanoTime()
    val tri2 = graft.operators.Triangles.triangleCounts(
      cands.repartition(13))
    val triSecs2 = secs(tT2)
    require(checksum(tri2, Seq("id", "degree", "triangles", "lcc"))
        == triHash && tri2.count() == triNodes,
      "triangle counting diverged across partitionings")

    // ---- personalized (seed-teleport) PageRank — d81 at corpus scale ----
    // the TrustRank-shaped signal: teleport + dangling mass return to a
    // trusted slice (every 10th node); 3 rounds of exact-integer mass
    val pprSeeds = cands.select(col("id1").as("id"))
      .unionByName(cands.select(col("id2").as("id"))).distinct()
      .where(col("id") % 10 === 0)
    val pprEdges = cands.select(col("id1").as("src"), col("id2").as("dst"))
    val tPpr = System.nanoTime()
    val ppr = graft.operators.PageRank.personalizedPageRankFixedPoint(
      pprEdges, pprSeeds, iters = 3)
    val pprNodes = ppr.count()
    val pprSecs = secs(tPpr)
    val pprHash = checksum(ppr, Seq("node", "rank"))
    val tPpr2 = System.nanoTime()
    val ppr2 = graft.operators.PageRank.personalizedPageRankFixedPoint(
      pprEdges.repartition(13), pprSeeds, iters = 3)
    val pprSecs2 = secs(tPpr2)
    require(checksum(ppr2, Seq("node", "rank")) == pprHash &&
      ppr2.count() == pprNodes,
      "personalized PageRank diverged across partitionings")

    // ---- degree assortativity — d85 at corpus scale ----------------------
    // one global 4-sum aggregate in exact decimals, one double division;
    // the single result row must be IDENTICAL across partitionings
    def assortRow(e: org.apache.spark.sql.DataFrame): (Long, Option[Double]) = {
      val r = graft.operators.Triangles.degreeAssortativity(e).head()
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    val tAs = System.nanoTime()
    val (asEdges, asR) = assortRow(cands)
    val asSecs = secs(tAs)
    val tAs2 = System.nanoTime()
    val asAgain = assortRow(cands.repartition(13))
    val asSecs2 = secs(tAs2)
    require(asAgain == ((asEdges, asR)),
      s"assortativity diverged across partitionings: $asAgain vs $asR")

    // ---- k-core decomposition — d86 at corpus scale -----------------------
    // iterative peeling to the fixpoint; the capped near-dup cliques
    // survive deep cores while chain/bridge structure peels out
    val coreK = 8
    val tKc = System.nanoTime()
    val kc = graft.operators.KCore.kCoreWithRounds(cands, k = coreK,
      maxIterations = 60)
    val kcNodes = kc.nodes.count()
    val kcSecs = secs(tKc)
    val kcHash = checksum(kc.nodes, Seq("id", "core_degree"))
    val tKc2 = System.nanoTime()
    val kc2 = graft.operators.KCore.kCoreWithRounds(
      cands.repartition(13), k = coreK, maxIterations = 60)
    val kcSecs2 = secs(tKc2)
    require(checksum(kc2.nodes, Seq("id", "core_degree")) == kcHash &&
      kc2.nodes.count() == kcNodes && kc2.rounds == kc.rounds,
      "k-core diverged across partitionings")

    // every section has run: drop the checkpointed edge frame's blocks
    // (Dataset.unpersist can't reach RDD-level checkpoint storage)
    graft.core.Checkpoints.release(cands)

    s""""graph_input_secs":$inputSecs,""" +
      s""""labelprop_secs":$lpSecs,"labelprop_repart_secs":$lpSecs2,""" +
      s""""labelprop_nodes":$lpNodes,"labelprop_hash":"$lpHash",""" +
      s""""hits_secs":$hitsSecs,"hits_repart_secs":$hitsSecs2,""" +
      s""""hits_nodes":$hitsNodes,"hits_hash":"$hitsHash",""" +
      s""""triangles_secs":$triSecs,"triangles_repart_secs":$triSecs2,""" +
      s""""triangles_orient_secs":${stages.getOrElse("orient", -1.0)},""" +
      s""""triangles_wedge_secs":${stages.getOrElse("wedge", -1.0)},""" +
      s""""triangles_nodes":$triNodes,"triangles_total":$triTotal,""" +
      s""""triangles_hash":"$triHash",""" +
      s""""ppr_secs":$pprSecs,"ppr_repart_secs":$pprSecs2,""" +
      s""""ppr_nodes":$pprNodes,"ppr_hash":"$pprHash",""" +
      s""""assort_secs":$asSecs,"assort_repart_secs":$asSecs2,""" +
      s""""assort_edges":$asEdges,""" +
      s""""assort_r":${asR.map(_.toString).getOrElse("null")},""" +
      s""""kcore_secs":$kcSecs,"kcore_repart_secs":$kcSecs2,""" +
      s""""kcore_k":$coreK,"kcore_nodes":$kcNodes,""" +
      s""""kcore_rounds":${kc.rounds},"kcore_hash":"$kcHash","""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val coldReps = sys.env.getOrElse("GRAFT_SCALE_COLD", "60").toInt   // per ordinary doc
    val hotReps = sys.env.getOrElse("GRAFT_SCALE_HOT", "2500").toInt   // per boilerplate doc
    val spark = graft.core.GraftSession.local("graft-scale-bench")
    val t0 = System.nanoTime()
    def secs(since: Long): Double = (System.nanoTime() - since) / 1e9

    // ---- corpus build: one parquet table, skewed near-dup clusters ------
    val gen = System.nanoTime()
    // repartition the (small, single-file) base BEFORE the explode: the
    // 100x replication and everything downstream parallelizes over all
    // cores, and the corpus lands as enough files for parallel scans
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(64)
    // doc_id % 50 == 0 -> boilerplate: hotReps EXACT copies (the verbatim
    // mega-cluster exact dedup collapses in O(B) and the LSH cap keeps out
    // of O(B^2) pairing); other docs -> coldReps NEAR-dup replicas (a
    // trailing revision token differs, so replicas share all but the last
    // few shingles — jaccard ~0.9+, LSH's job)
    val replicated = base
      .withColumn("__hot", col("doc_id") % 50 === 0)
      .withColumn("__reps", when(col("__hot"), lit(hotReps)).otherwise(lit(coldReps)))
      .select(col("doc_id"), col("text"), col("__hot"),
        explode(sequence(lit(0), col("__reps") - 1)).as("rep"))
      .select((col("doc_id") * 100000 + col("rep")).as("doc_id"),
        when(col("__hot"), col("text"))
          .otherwise(concat(col("text"), lit(" rev "), col("rep").cast("string")))
          .as("text"))
    val corpusPath = java.nio.file.Files.createTempDirectory("graft-scale").toString + "/corpus"
    replicated.write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val nDocs = corpus.count()
    val genSecs = secs(gen)

    // ---- exact dedup: the O(B) path that owns the mega-clusters ---------
    val tExact = System.nanoTime()
    val nExactGroups = corpus
      .select(Dedup.exactKey(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .count()
    val exactSecs = secs(tExact)

    // ---- LSH candidates with the bucket cap -----------------------------
    val cap = 256
    val tLsh = System.nanoTime()
    val cands = Dedup.lshCandidatePairs(corpus, "doc_id", "text",
      maxBucketSize = Some(cap))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    val lshSecs = secs(tLsh)

    // ---- connected components over the multi-million-edge pair graph ----
    val tCc = System.nanoTime()
    val cc = Dedup.connectedComponents(cands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClusters = cc.select(col("cluster")).distinct().count()
    val nClustered = cc.count()
    val ccSecs = secs(tCc)
    // the multi-million-edge graph is over graft.cc.starEdgeThreshold, so
    // auto dispatch runs the large-star/small-star alternation — rounds
    // here vs min-label's O(diameter) is the claim this bench checks
    val ccRounds = Dedup.lastCcRounds
    cc.unpersist()

    // ---- incremental CC: fold cost ∝ the appended batch ------------------
    // The maintenance twin (d80) under the PRODUCTION append shape: a
    // held-out slice of BASE documents (all their replicas' pair edges)
    // arrives after history labeled — the "new shard lands" case, so
    // the batch brings genuinely new nodes and real merges (an
    // edge-hash split would mostly re-state edges inside dense cliques
    // and fold as a no-op). History labels ONCE (the amortized
    // per-snapshot cost the fold avoids re-paying — it reads
    // ~cc_secs); each batch folds in via label contraction. Numbers to
    // watch: fold seconds track the BATCH (the 4x slice costs
    // ~linearly more, never ~cc_secs), changed counts ≈ the slice's
    // replica population, and the contracted loop stays frontier-sized.
    val baseSlice1 = pmod(xxhash64((col("id1") / 100000).cast("long")),
      lit(400L))
    val baseSlice2 = pmod(xxhash64((col("id2") / 100000).cast("long")),
      lit(400L))
    val histPairs = cands.where(baseSlice1 >= 4 && baseSlice2 >= 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tIncPrior = System.nanoTime()
    val priorLabels = Dedup.connectedComponents(histPairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    priorLabels.count()
    val incPriorSecs = secs(tIncPrior)
    def ccFoldRun(k: Int): (Double, Long, Long, Int) = {
      val batch = cands.where(baseSlice1 < k || baseSlice2 < k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nb = batch.count()
      val t = System.nanoTime()
      val changed = Dedup.incrementalConnectedComponents(priorLabels, batch,
        changedOnly = true).count()
      val s = secs(t)
      batch.unpersist(blocking = true)
      (s, nb, changed, Dedup.lastCcRounds)
    }
    val (incFold1Secs, incBatch1, incChanged1, incRounds1) = ccFoldRun(1)
    val (incFold4Secs, incBatch4, incChanged4, incRounds4) = ccFoldRun(4)
    histPairs.unpersist(blocking = true)
    priorLabels.unpersist(blocking = true)

    // ---- fixed-point PageRank over the dedup-candidate graph -------------
    // The iterative-graph family at corpus scale (d79 gates at sf0.1):
    // 3 power-iteration rounds over the DIRECTED (id1 -> id2) candidate
    // graph — ids appearing only as dst are dangling, so the
    // dangling-mass redistribution runs at millions of nodes. The
    // bit-exactness contract is ASSERTED, not assumed: a second run over
    // a differently-partitioned edge frame must produce the same rank
    // multiset (exact decimal checksum — xxhash64 of every (node, rank)
    // row, summed without overflow).
    val prIters = 3
    def prChecksum(ranks: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      ranks.agg(sum(xxhash64(col("node"), col("rank")).cast("decimal(38,0)")))
        .head().getDecimal(0)
    val prEdges = cands.select(col("id1").as("src"), col("id2").as("dst"))
    val tPr = System.nanoTime()
    val pr = graft.operators.PageRank.pageRankFixedPoint(prEdges, prIters)
    val prNodes = pr.count()
    val prSecs = secs(tPr)
    val prHash = prChecksum(pr)
    val tPr2 = System.nanoTime()
    val pr2 = graft.operators.PageRank.pageRankFixedPoint(
      prEdges.repartition(13), prIters)
    val prHash2 = prChecksum(pr2)
    val prSecs2 = secs(tPr2)
    require(prHash == prHash2 && pr2.count() == prNodes,
      s"fixed-point PageRank diverged across partitionings: " +
        s"$prHash vs $prHash2")

    // ---- label propagation / HITS / triangles over the same graph --------
    val graphJson = graphSectionsJson(cands)
    cands.unpersist()

    // ---- winnowing fingerprints (codegen'd chargram + minima) -----------
    val tWin = System.nanoTime()
    val nFps = corpus
      .select(col("doc_id"), lower(col("text")).as("__t"))
      .select(col("doc_id"), TextAnalysis.charGramHashes(col("__t"), k = 8).as("__g"))
      .select(col("doc_id"),
        explode(TextAnalysis.winnowingMinima(col("__g"), w = 4)).as("fp"))
      .count()
    val winSecs = secs(tWin)

    // ---- SimHash Hamming-band near-dups ----------------------------------
    // The pigeonhole detector over the same skewed corpus. Chunk keys have
    // only 2^16 values, so at this scale buckets FILL (the operator doc's
    // stated limit) — the cap is doing real work here, and the interesting
    // number is that the banded join stays bounded instead of quadratic.
    val tSim = System.nanoTime()
    val nSimPairs = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
      maxHamming = 3, maxBucketSize = Some(cap)).count()
    val simSecs = secs(tSim)
    // The web-scale tier (Manku'07 6C3 chunk-combination keys, 2^33-value
    // key space): 20 exploded rows/doc instead of 4, but buckets stay
    // near-singleton where the 16-bit chunks above saturate — the claim
    // is that the wider blocking costs only a constant factor here while
    // being the ONLY scheme that still works at 10^9 docs.
    val tSimC = System.nanoTime()
    val nSimCPairs = Dedup.simhashNearDupPairsCombined(corpus, "doc_id",
      "text", maxHamming = 3, chunks = 6, maxBucketSize = Some(cap)).count()
    val simCSecs = secs(tSimC)

    // ---- edit-distance near-dups (PassJoin segment blocking) -------------
    // The character-level detector on the same skewed corpus, k=4 (the
    // typo/OCR regime): cold replicas differ only in the trailing " rev N"
    // token, so within-base pairs sit at distance <= ~3 and the verify
    // keeps almost all of them; the verbatim mega-clusters hit identical
    // (i, len, segment) keys 2500 deep and the bucket cap hands them to
    // exact dedup — the same contract as the LSH/SimHash caps. Numbers to
    // watch: pair count stays within-base-bounded (no quadratic bleed
    // across bases) and the runtime is probe-explode + banded verify, not
    // any O(n^2) term.
    val tEdit = System.nanoTime()
    val editK = 4
    val nEditPairs = Dedup.editNearDupPairs(corpus, "doc_id", "text",
      k = editK, maxBucketSize = Some(cap)).count()
    val editSecs = secs(tEdit)

    // ---- non-equi joins at scale: range, interval overlap, as-of --------
    // Heavy-tailed interval lengths (log-uniform 2^0..2^27 over a 4e10
    // span — mean >> median, the hazard RangeJoin's doc calls out): the
    // mean-derived bin width leaves most intervals in ~1 bin while the
    // tail explodes into many. Numbers to watch: the interval-side bin
    // blow-up factor stays small (~2 by design), match cardinalities stay
    // linear-ish, and the plans remain hash equi-joins on the bin key
    // (AQE owns hot bins) — never a nested loop.
    import graft.operators.{AsofJoin, RangeJoin}
    val span = 40000000000L // 4e10: past 2^32, exercises full-long binning
    def hcol(seed: Int, of: org.apache.spark.sql.Column) =
      pmod(xxhash64(of, lit(seed)), lit(span))
    val points = spark.range(600000)
      .select(col("id").as("pid"), hcol(11, col("id")).as("p"))
    def intervalTable(n: Long, seed: Int, iid: String, lo: String, hi: String) =
      spark.range(n)
        .select(col("id").as(iid), hcol(seed, col("id")).as(lo),
          pow(lit(2.0), pmod(col("id"), lit(28)).cast("double"))
            .cast("long").as("__len"))
        .select(col(iid), col(lo),
          least(col(lo) + col("__len"), lit(span - 1)).as(hi))
    val ivs = intervalTable(100000, 12, "iid", "lo", "hi")
    val binW = RangeJoin.suggestedBinWidth(ivs, "lo", "hi")
    val blowup = ivs.select(avg(
      expr(s"cast(hi div $binW as bigint) - cast(lo div $binW as bigint) + 1")))
      .head().getDouble(0)
    val tRj = System.nanoTime()
    val rjMatches = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", binW).count()
    val rjSecs = secs(tRj)
    val ivs2 = intervalTable(100000, 13, "iid2", "lo2", "hi2")
    val tOv = System.nanoTime()
    val ovMatches = RangeJoin.intervalOverlap(ivs, ivs2,
      "lo", "hi", "lo2", "hi2", binW).count()
    val ovSecs = secs(tOv)
    // as-of: 1M left events over 1k keys against 200k right states, with
    // a lookback tolerance — one (key, time) sort-merge pass, no explode
    val trades = spark.range(1000000).select(col("id").as("tid"),
      pmod(col("id"), lit(1000)).as("sym"), hcol(14, col("id")).as("tts"))
    val quotes = spark.range(200000).select(
      pmod(col("id"), lit(1000)).as("qsym"), hcol(15, col("id")).as("qts"),
      pmod(xxhash64(col("id"), lit(16)), lit(10000)).as("px"))
    val tAsof = System.nanoTime()
    val asofRows = AsofJoin.asofJoin(trades, quotes, "sym", "qsym", "tts", "qts",
      Seq("px"), tolerance = Some(lit(span / 100))).count()
    val asofSecs = secs(tAsof)

    // ---- incremental dedup: cost ∝ NEW-SHARD size, not corpus size ------
    // The cross-run mode: the full corpus's signature state is persisted
    // once (the amortized cost every run AVOIDS re-paying), then two new
    // shards — 1k and 4k docs, trailing-edited so they near-dup history —
    // are deduped against it. The shard-time ratio should track the shard
    // size ratio: the only O(history) work left is the slim band/fp hash
    // join (40-byte rows, no text), which at 100TB a state table bucketed
    // by band key turns into a co-located join.
    val tState = System.nanoTime()
    val statePath = corpusPath + "_sigstate"
    Dedup.writeSignatureState(
      Dedup.signatureState(corpus, "doc_id", "text"), statePath,
      mode = "overwrite")
    val stateSecs = secs(tState)
    val history = Dedup.readSignatureState(spark, statePath)
    def newShard(maxId: Int) = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < maxId)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" incr")).as("text"))
    def incRun(maxId: Int): (Double, Long) = {
      val t = System.nanoTime()
      val kept = Dedup.incrementalDedup(newShard(maxId), history,
        "doc_id", "text", threshold = 0.5, maxBucketSize = Some(cap))
        .where(col("keep")).count()
      (secs(t), kept)
    }
    val (incSecs1k, kept1k) = incRun(1000)
    val (incSecs4k, kept4k) = incRun(4000)

    // ---- incremental EDIT dedup: the same cost-∝-batch contract ---------
    // The 544k corpus's PassJoin segment index persists once (the
    // amortized refresh-cycle cost), then a 1k trailing-edited shard
    // probes it: only the batch explodes into O(k²) probe substrings; the
    // history side contributes its stored 16-byte (key, id) rows to one
    // equi-join plus text for the candidate verify. The shard's " rev 1z"
    // suffix sits ONE edit from each cold source's " rev 1" replica (and
    // ~7 from the suffixless hot docs), so cold probes flag dup at dist 1
    // and hot probes exercise the reject path at k=4.
    val tEIdx = System.nanoTime()
    val editIdxPath = corpusPath + "_editidx"
    Dedup.writeEditIndexSnapshot(corpus, "doc_id", "text", editK, editIdxPath)
    val editIdxSecs = secs(tEIdx)
    val editShard = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 1000)
      .select((col("doc_id") + 910000000L).as("doc_id"),
        concat(col("text"), lit(" rev 1z")).as("text"))
    val tEProbe = System.nanoTime()
    val editProbeDups = Dedup.editDupFlags(spark, editShard, "doc_id",
        "text", editIdxPath, maxBucketSize = Some(cap))
      .where(col("edit_dup")).count()
    val editProbeSecs = secs(tEProbe)

    // ---- bloom anti-join vs plain anti-join against the big target ------
    // The dedup-against-existing shape the bloom path exists for: the
    // existing-keys side too big to broadcast, so the plain anti-join
    // shuffles BOTH sides. At this corpus the 544k fingerprints would
    // still broadcast (~26MB), which hides the shuffle the 100TB regime
    // pays — disable broadcast for all variants to simulate the real
    // operating point (a multi-TB key table), clearly labeled as such.
    // Three variants over the same mostly-new batch (546k rows, ~2k dups):
    //   plain    — full anti-join, both sides shuffle;
    //   bloom    — broadcast-filter split, candidates pay the anti-join
    //              (existing still shuffles in full for the residual);
    //   bloom+prune — the WIN REGIME: distinct candidate keys (small by
    //              the mostly-new premise) broadcast-semi-prune the huge
    //              existing side map-side, so existing NEVER shuffles and
    //              the residual join broadcasts the ~|dups| survivors.
    //              The explicit small-side broadcasts are legitimate at
    //              any existing-side scale — only auto-broadcast of the
    //              big table is being simulated away.
    // Each variant timing includes its full per-batch cost (for the bloom
    // variants: filter build + probe + residual join); the standalone
    // build time is also reported since a persisted target state amortizes
    // it across batches.
    val targetFps = corpus.select(graft.llm.Dedup.exactKey(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshBatch = corpus
      .select((col("doc_id") + 800000000L).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
      .unionByName(corpus.limit(2000))
      .select(col("doc_id"), graft.llm.Dedup.exactKey(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    freshBatch.count() // materialize BOTH caches so the variants time
    targetFps.count()  // only joins, not scan+md5 warm-up
    val tBloomBuild = System.nanoTime()
    val prebuiltBf = targetFps.stat.bloomFilter("fp", nDocs, 0.01)
    val bloomBuildSecs = secs(tBloomBuild)
    val noBroadcast = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    noBroadcast.foreach(spark.conf.set(_, "-1"))
    // The SMALL-batch shape is the prune path's actual operating point
    // (its scaladoc's win regime): a ~18k-row mostly-new incremental
    // batch against the same big target, probed through the PRE-BUILT
    // filter (the steady-state ingestion contract: build/maintain the
    // target's filter once, reuse per batch) — the shape where the
    // candidate broadcast is O(dups) and the existing side never
    // shuffles. The batch≈target shape above stays as the stress case
    // (it measures the overheads when the premise DOESN'T hold, filter
    // build included per call).
    val smallBatch = corpus
      .where(pmod(xxhash64(col("doc_id")), lit(1000L)) < 33) // hash-uniform ~3.3%
      .select((col("doc_id") + 700000000L).as("doc_id"),
        concat(col("text"), lit(" small")).as("text"))
      .unionByName(corpus.limit(2000))
      .select(col("doc_id"), graft.llm.Dedup.exactKey(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSmallBatch = smallBatch.count()
    val (plainAntiSecs, bloomAntiSecs, bloomPruneSecs, nPlainAnti, nBloomAnti,
         smallPlainSecs, smallBloomSecs, smallPruneSecs) =
      try {
        val tPlainAnti = System.nanoTime()
        val nPlain = graft.sinks.Sinks.dedupAgainstExisting(
          freshBatch, targetFps, Seq("fp")).count()
        val pSecs = secs(tPlainAnti)
        val tBloomAnti = System.nanoTime()
        val nBloom = graft.sinks.Sinks.bloomDedupAgainstExisting(
          freshBatch, targetFps, "fp", expectedItems = nDocs).count()
        val bSecs = secs(tBloomAnti)
        val tPrune = System.nanoTime()
        val nPrune = graft.sinks.Sinks.bloomDedupAgainstExisting(
          freshBatch, targetFps, "fp", expectedItems = nDocs,
          pruneExistingByCandidates = true).count()
        require(nPrune == nPlain,
          s"bloom+prune anti-join diverged: $nPrune vs $nPlain")
        val prSecs = secs(tPrune)
        val tSp = System.nanoTime()
        val nSp = graft.sinks.Sinks.dedupAgainstExisting(
          smallBatch, targetFps, Seq("fp")).count()
        val spSecs = secs(tSp)
        val tSb = System.nanoTime()
        val nSb = graft.sinks.Sinks.bloomDedupAgainstExisting(
          smallBatch, targetFps, "fp", prebuiltBf,
          pruneExistingByCandidates = false,
          maxCandidateBroadcastBytes = 64L << 20).count()
        val sbSecs = secs(tSb)
        val tSpr = System.nanoTime()
        val nSpr = graft.sinks.Sinks.bloomDedupAgainstExisting(
          smallBatch, targetFps, "fp", prebuiltBf,
          pruneExistingByCandidates = true,
          maxCandidateBroadcastBytes = 64L << 20).count()
        require(nSb == nSp && nSpr == nSp,
          s"small-batch variants diverged: plain=$nSp bloom=$nSb prune=$nSpr")
        (pSecs, bSecs, prSecs, nPlain, nBloom, spSecs, sbSecs, secs(tSpr))
      } finally noBroadcast.foreach(spark.conf.unset)
    require(nPlainAnti == nBloomAnti,
      s"bloom anti-join diverged: $nBloomAnti vs $nPlainAnti")
    targetFps.unpersist(); freshBatch.unpersist(); smallBatch.unpersist()

    // ---- sessionization under a deliberately hot key --------------------
    // 6M events, ONE key holding 40% of them (the fandom/bot account every
    // real event stream has): the unsalted window must sort that key's
    // full 2.4M-event history through one partition — the single-task
    // straggler that stalls a 1000-executor job — while the salted
    // two-phase split caps any partition at one (key, day) slice. Both
    // must produce identical sessions (d17's oracle proves exact equality;
    // here the cardinality+mass check guards the 6M-row run cheaply).
    val spanSecs = 2592000L // 30 days
    val sessGap = 1800L     // 30 min
    val dayWidth = 86400L
    val nEv = sys.env.getOrElse("GRAFT_SCALE_EVENTS", "6000000").toLong
    val hotN = (nEv * 2) / 5
    val evPath = java.nio.file.Files.createTempDirectory("graft-sess").toString + "/events"
    spark.range(nEv).select(
        when(col("id") < hotN, lit(0L)).otherwise(col("id") % 100000 + 1).as("uid"),
        when(col("id") < hotN, (col("id") * 37) % spanSecs)
          .otherwise((col("id") * 7919) % spanSecs).as("ts"))
      .write.mode("overwrite").parquet(evPath)
    val evts = spark.read.parquet(evPath)
    // the observable the salt deletes: max rows any one window partition
    // must sort — unsalted it is the hot key's whole history, salted the
    // biggest (key, day) slice
    val maxSaltedGroup = evts
      .groupBy(col("uid"), graft.operators.RangeJoin.floorDiv(col("ts"), dayWidth))
      .count().agg(max(col("count"))).head().getLong(0)
    val tSessU = System.nanoTime()
    val unsalted = graft.operators.Sessionize.sessions(evts, "uid", "ts", sessGap)
      .agg(count(lit(1)), sum(col("n_events"))).head()
    val sessUSecs = secs(tSessU)
    val tSessS = System.nanoTime()
    val salted = graft.operators.Sessionize.sessionsSalted(
        evts, "uid", "ts", sessGap, rangeWidth = dayWidth)
      .agg(count(lit(1)), sum(col("n_events"))).head()
    val sessSSecs = secs(tSessS)
    require(unsalted == salted,
      s"salted sessionize diverged: $salted vs $unsalted")
    val nSessions = unsalted.getLong(0)

    // ---- keyword extraction over the 544k-doc corpus --------------------
    // One corpus scan by construction (the reused tf exchange); the
    // interesting runtime fact is which strategy AQE picks for the
    // df-side join once it sees the real aggregate size.
    val tKw = System.nanoTime()
    val kwQe = TextAnalysis.keywordScores(corpus, "doc_id", "text", topK = 5)
      .queryExecution
    val nKw = kwQe.executedPlan.execute().count()
    val kwSecs = secs(tKw)
    val kwPlan = kwQe.executedPlan.toString.split("== Initial Plan ==").head
    val kwJoin =
      if (kwPlan.contains("BroadcastHashJoin")) "broadcast"
      else if (kwPlan.contains("SortMergeJoin")) "smj"
      else "other"

    // ---- repetition signals + mix sampling at the 544k corpus ----------
    // Repetition (d22) is pure map-side — exchanges recorded from the
    // executed plan, not assumed — so cost is the per-row n-gram kernel
    // and halving the rows should roughly halve the time (the near-
    // linear proof; both runs pay the same full-file scan, so the ratio
    // sits slightly under 2). Mix sampling (d24): composition math is
    // driver-side O(#strata) by design; the DATA pass must be exactly
    // one exchange (the per-stratum WindowGroupLimit rank shuffle).
    // exchanges are counted from the FINAL plan string after execution:
    // under AQE the physical tree is an AdaptiveSparkPlanExec wrapper
    // whose children a plan-tree collect does not descend into, so a
    // node-collect silently reports 0 (same reason the kw section above
    // splits on "== Initial Plan ==")
    def shuffleCount(qe: org.apache.spark.sql.execution.QueryExecution): Int =
      "Exchange (hash|range|single)".r
        .findAllIn(qe.executedPlan.toString.split("== Initial Plan ==").head)
        .size
    val tRep = System.nanoTime()
    val repQe = TextAnalysis.repetitionReport(corpus, "doc_id", "text")
      .queryExecution
    val nRep = repQe.executedPlan.execute().count()
    val repSecs = secs(tRep)
    val repExchanges = shuffleCount(repQe)
    val tRepH = System.nanoTime()
    val nRepH = TextAnalysis.repetitionReport(
        corpus.where(col("doc_id") % 2 === 0), "doc_id", "text")
      .queryExecution.executedPlan.execute().count()
    val repHalfSecs = secs(tRepH)

    // skewed lang assignment from doc_id (en-dominant, the d24/d30
    // shape), taken over the documented at-scale projection — (key,
    // strata) only, survivors semi-join back by id — so the one
    // exchange and the per-stratum sort move ids, never text (the
    // cutoffs here are ~200k per stratum, far past
    // spark.sql.window.group.limit.threshold=1000, so there is no
    // map-side WindowGroupLimit heap at this shape by design —
    // recorded, not hidden)
    val langed = corpus.select(col("doc_id")).withColumn("lang",
      element_at(array(Seq("en", "en", "en", "en", "en", "en",
          "zh", "zh", "de", "fr").map(lit): _*),
        (pmod(col("doc_id"), lit(10)) + 1).cast("int")))
    val tMix = System.nanoTime()
    val mixed = graft.llm.Sampling.mixTake(langed, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.15, "fr" -> 0.1),
      salt = "scale9")
    val mixQe = mixed.queryExecution
    val nMix = mixQe.executedPlan.execute().count()
    val mixSecs = secs(tMix)
    val mixExchanges = shuffleCount(mixQe)
    val mixGroupLimit =
      if (mixQe.executedPlan.toString.split("== Initial Plan ==").head
            .contains("WindowGroupLimit")) 1 else 0
    // …and the join-back leg: survivors (ids only) semi-join the wide
    // corpus — AQE should see ~360k ids and broadcast them, so the text
    // column never enters an exchange at all
    val tMixJ = System.nanoTime()
    val mixJoined = corpus.join(mixed.select("doc_id"), Seq("doc_id"), "left_semi")
    val nMixJ = mixJoined.count()
    val mixJoinSecs = secs(tMixJ)
    require(nMixJ == nMix, s"semi-join-back lost rows: $nMixJ vs $nMix")
    val mixJoinKind = {
      val p = mixJoined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      if (p.contains("BroadcastHashJoin")) "broadcast"
      else if (p.contains("SortMergeJoin")) "smj" else "other"
    }

    // ---- round-9 text surfaces at the 544k corpus ----------------------
    // PII scrub: a negative-heavy workload by construction (the corpus
    // has no PII shapes) — which is the realistic regime: redaction cost
    // at scale is regex SCAN cost, matches are rare. Zero exchanges
    // recorded like d22.
    val tPii = System.nanoTime()
    val piiQe = graft.llm.Pii.scrub(corpus, "doc_id", "text").queryExecution
    val nPii = piiQe.executedPlan.execute().count()
    val piiSecs = secs(tPii)
    val piiExchanges = shuffleCount(piiQe)

    // span-level boilerplate removal over the dup-heavy corpus: the
    // replicated clusters make most 4-gram spans corpus-frequent, so
    // this measures the machinery at its worst shape (nearly every doc
    // gets cut) — 60M-gram flagging, windowed merge, map-side rebuild
    val tSpan = System.nanoTime()
    val spanOut = graft.llm.Dedup.removeBoilerplateSpans(
      corpus, "doc_id", "text", width = 4, maxDocFreq = 2)
      .agg(count(lit(1)).as("docs"),
        sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("cut"),
        sum(col("n_removed")).as("toks_removed"))
      .head()
    val spanRmSecs = secs(tSpan)
    val (spanDocs, spanCut, spanToks) =
      (spanOut.getLong(0), spanOut.getLong(1), spanOut.getLong(2))

    // BM25 retrieval with a 20-probe query sheet: only query-term rows
    // survive the explode (broadcast semi-join), so the exchange carries
    // a fraction of the corpus even at this width
    val tBm = System.nanoTime()
    val bmQueries = corpus.where(col("doc_id") % 100000 === 0)
      .limit(20)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.llm.TextAnalysis.tokens(lower(col("text"))),
          1, 4), " ").as("qtext"))
    val nBm = graft.llm.TextAnalysis.bm25TopK(corpus, bmQueries,
      "doc_id", "text", "query_id", "qtext", k = 10).count()
    val bmSecs = secs(tBm)

    // the persisted inverted-index path: tokenize the corpus ONCE into
    // the term-bucketed postings layout (build cost amortizes over every
    // later query batch). Two probe shapes, win/lose regimes stated
    // honestly (the d20 bloom lesson):
    //   - WIDE: the same 20-query sheet (~80 distinct terms) — terms
    //     hash into most of the 256 buckets, pruning is weak, and the
    //     postings table has more rows than the corpus has docs; this
    //     shape can LOSE to the scan path and the numbers say so;
    //   - NARROW (the serving shape): ONE 4-term query probes <=4 of
    //     256 partition dirs — the regime the layout exists for.
    //     bm25_scan1_secs re-runs the corpus-scan path on the same
    //     single query for the apples comparison.
    val idxPath = java.nio.file.Files.createTempDirectory("graft-bm25").toString + "/layout"
    val tIdxBuild = System.nanoTime()
    graft.llm.TextAnalysis.writeBm25Layout(corpus, idxPath,
      "doc_id", "text", termBuckets = 256)
    val bmIdxBuildSecs = secs(tIdxBuild)
    val tIdxProbe = System.nanoTime()
    val nBmIdx = graft.llm.TextAnalysis.bm25TopKIndexed(spark, idxPath,
      bmQueries, "query_id", "qtext", k = 10).count()
    val bmIdxProbeSecs = secs(tIdxProbe)
    val oneQuery = bmQueries.limit(1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    oneQuery.count()
    val tScan1 = System.nanoTime()
    val nBmScan1 = graft.llm.TextAnalysis.bm25TopK(corpus, oneQuery,
      "doc_id", "text", "query_id", "qtext", k = 10).count()
    val bmScan1Secs = secs(tScan1)
    val tIdx1 = System.nanoTime()
    val nBmIdx1 = graft.llm.TextAnalysis.bm25TopKIndexed(spark, idxPath,
      oneQuery, "query_id", "qtext", k = 10).count()
    val bmIdx1Secs = secs(tIdx1)

    // d42 shard assignment at 128 shards: shard id is map-side, the
    // only exchange is hashpartitioning(shard) for the in-shard
    // row_number — wall-clock should track a plain count of the corpus
    val tShard = System.nanoTime()
    val shardStats = graft.llm.Packing.shardStats(
      graft.llm.Packing.shardAssign(corpus, "doc_id",
        graft.llm.TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 128))
      .agg(count(lit(1)).as("n"), max(col("n_docs")).as("mx"),
        min(col("n_docs")).as("mn")).head()
    val shardSecs = secs(tShard)
    val (shardN, shardMax, shardMin) =
      (shardStats.getLong(0), shardStats.getLong(1), shardStats.getLong(2))

    // d44 chunking: pure map-side explode — the count aggregates the
    // chunks without materializing text, so this measures the
    // tokenize+slice arithmetic itself
    val tChunk = System.nanoTime()
    val nChunks = graft.llm.TextAnalysis.chunkWindows(corpus,
      "doc_id", "text", width = 64, stride = 48).count()
    val chunkSecs = secs(tChunk)

    // d43 bigram coherence: the one corpus pass carries (id, bigram)
    // pairs — heavier keys than d29's unigrams but the same single
    // reused exchange; replication keeps the bigram vocabulary small
    // relative to the pair stream, the 10^9-doc regime
    val tBig = System.nanoTime()
    val bigAgg = graft.llm.TextAnalysis.bigramCoherence(corpus,
        "doc_id", "text")
      .agg(count(lit(1)).as("n"), avg(col("cond_score")).as("avg")).head()
    val bigSecs = secs(tBig)
    val (bigRows, bigAvg) = (bigAgg.getLong(0), bigAgg.getDouble(1))

    // d37 novelty at the dup-heavy shape: replication makes nearly every
    // 4-gram corpus-shared, so the doc-frequency aggregate is dominated
    // by high-df keys — all map-side combined (no window), the regime a
    // ubiquitous-boilerplate corpus produces at 10^9 docs
    val tNov = System.nanoTime()
    val novAgg = graft.llm.TextAnalysis.noveltyScores(
        corpus, "doc_id", "text", width = 4)
      .agg(count(lit(1)).as("n"), avg(col("novelty")).as("avg")).head()
    val novSecs = secs(tNov)
    val (novRows, novAvg) = (novAgg.getLong(0), novAgg.getDouble(1))

    // d36 importance selection: full-corpus scoring, top-200 cut — the
    // selection must plan as TakeOrderedAndProject (per-partition top-n
    // + driver merge), never a global sort of 544k scored docs
    val tImp = System.nanoTime()
    val impDf = graft.llm.TextAnalysis.importanceScores(
        corpus, "doc_id", "text", isTarget = col("doc_id") % 7 === 0)
      .orderBy(col("ratio").desc, col("id").asc).limit(200)
    val nImp = impDf.count()
    val impSecs = secs(tImp)
    val impTakeOrdered = impDf.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject")
    // d33 canonical-by-quality is NOT re-run here: its dominant cost IS
    // the LSH+CC already measured above (lsh_secs + cc_secs); the keeper
    // adds one id-join on a 2-column projection and one ~24-byte-row
    // window — noted instead of burning another full CC pass.

    // ---- float vs int8 brute-force similarity -------------------------
    // The base embeddings replicated with a small per-copy perturbation
    // (copies aren't bit-identical), 20 queries, k=10, BOTH layouts
    // persisted first — the 100TB shape is quantize-once-at-ingest, so
    // the comparison is (float parquet -> float scorer) vs (int8 parquet
    // -> integer scorer): bytes on disk are the headline (the same
    // factor every downstream exchange pays), scoring wall-clock the
    // sanity check.
    val vecDir = java.nio.file.Files.createTempDirectory("graft-vec").toString
    val baseVecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecReps = 40
    baseVecs.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(vecReps - 1))).as("rep"))
      .select((col("vec_id") * 1000 + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => x + col("rep").cast("float") / lit(1000.0f)).as("embedding"))
      .write.mode("overwrite").parquet(s"$vecDir/float")
    val vecs = spark.read.parquet(s"$vecDir/float")
    val nVecs = vecs.count()
    graft.llm.Similarity.quantizeForStorage(vecs)
      .write.mode("overwrite").parquet(s"$vecDir/int8")
    val vecsQ = spark.read.parquet(s"$vecDir/int8")
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(path).getLength
    }
    val (floatBytes, int8Bytes) = (dirBytes(s"$vecDir/float"), dirBytes(s"$vecDir/int8"))
    val isQuery = col("vec_id") % 1000 === 0 && col("vec_id") < 20000
    val tSimF = System.nanoTime()
    val nSimF = graft.llm.Similarity
      .bruteForceTopK(vecs, vecs.where(isQuery), k = 10).count()
    val simFSecs = secs(tSimF)
    val tSimQ = System.nanoTime()
    val nSimQ = graft.llm.Similarity
      .bruteForceTopKOnQuantized(vecsQ, vecsQ.where(isQuery), k = 10).count()
    val simQSecs = secs(tSimQ)
    require(nSimF == nSimQ, s"top-k cardinality diverged: $nSimQ vs $nSimF")

    // s10 SemDeDup over the replicated vectors: nlist scales with the
    // corpus (128 cells over ~80k vectors keeps |cell| in the hundreds,
    // the paper's within-cell O(|cell|^2) contract); the 40-replica
    // families sit nearly on top of each other (perturbation 1e-3), so
    // at cos>=0.95 each family collapses to its farthest-from-centroid
    // exemplar — dropped ~ corpus minus one keeper per family per cell
    val tSemFit = System.nanoTime()
    val semCents = graft.llm.Similarity.fitCentroids(vecs, nlist = 128)
    val semFitSecs = secs(tSemFit)
    val tSem = System.nanoTime()
    val semAgg = graft.llm.Similarity.semdedupPrune(vecs, semCents,
        threshold = 0.95)
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("dropped")).head()
    val semSecs = secs(tSem)
    val (semRows, semDropped) = (semAgg.getLong(0), semAgg.getLong(1))

    // d39 filter funnel: pure map-side gate chain — should track the
    // scan near-linearly (the d22 shape) even at the 544k corpus; the
    // d39 corpus-tuned gates (the defaults' no-punctuation gate would
    // attribute all of this synthetic corpus to one bucket)
    val tFun = System.nanoTime()
    val funAgg = graft.llm.Filters.funnel(corpus, "doc_id", "text",
        gates = Seq(
          graft.llm.Filters.Gate("too_short", "n_tokens < 24"),
          graft.llm.Filters.Gate("thin", "n_chars < 180"),
          graft.llm.Filters.Gate("stubby", "max_tok_len < 8")))
      .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val funSecs = secs(tFun)
    val funKept = funAgg.getOrElse("kept", 0L)
    val funDocs = funAgg.values.sum

    // d41 BPE pair stats: the corpus pass is one word-count aggregate;
    // the pair explode rides the (replication-invariant) vocabulary —
    // near-flat in corpus size is the claim to verify
    val tBpe = System.nanoTime()
    val bpeRows = graft.llm.TextAnalysis.bpePairStats(corpus, "text", 50)
      .count()
    val bpeSecs = secs(tBpe)

    // ---- exact substring-span dedup (d89) at corpus scale -----------------
    // the Lee-et-al cut-list extraction over the replicated corpus: the
    // hot mega-clusters are verbatim copies (every gram duplicated ->
    // one whole-doc span each) and the cold replicas share all but the
    // trailing revision tokens — so nearly every position marks and the
    // run exercises the gram aggregate + semi-join + per-doc window at
    // its heaviest. The claim: cost rides the GRAM GROUPS (one shuffle
    // on the gram key), never the sharing-doc count — 2500-deep
    // verbatim clusters are one group per gram, not 3M doc pairs.
    val tExSpan = System.nanoTime()
    val exSpans = graft.llm.Dedup.exactSpanCutLists(corpus, "doc_id",
      "text", k = 8)
    val exSpanRows = exSpans.count()
    val exSpanSecs = secs(tExSpan)
    val exSpanHash = exSpans.agg(sum(xxhash64(col("id"),
        col("span_start"), col("span_end")).cast("decimal(38,0)")))
      .head().getDecimal(0)
    val tExSpan2 = System.nanoTime()
    val exSpans2 = graft.llm.Dedup.exactSpanCutLists(
      corpus.repartition(13), "doc_id", "text", k = 8)
    val exSpanHash2 = exSpans2.agg(sum(xxhash64(col("id"),
        col("span_start"), col("span_end")).cast("decimal(38,0)")))
      .head().getDecimal(0)
    // the timer must close AFTER the checksum forces the recompute —
    // the first committed artifact timed plan construction only
    // (moot at r17 HEAD: the operator materializes internally, so the
    // call itself pays the compute — but the ordering stays defensive)
    val exSpanSecs2 = secs(tExSpan2)
    require(exSpanHash2 == exSpanHash && exSpans2.count() == exSpanRows,
      "exact-span extraction diverged across partitionings")
    // the 128-bit fingerprint tier (d92): same cut lists, gram key is
    // two salted xxhash64s over the token slice instead of the joined
    // string — the 100 TB shuffle payload, equality ASSERTED at scale
    val tExFp = System.nanoTime()
    val exSpansFp = graft.llm.Dedup.exactSpanCutLists(corpus, "doc_id",
      "text", k = 8, fingerprintGrams = true)
    val exSpanFpRows = exSpansFp.count()
    val exSpanFpSecs = secs(tExFp)
    val exSpanFpHash = exSpansFp.agg(sum(xxhash64(col("id"),
        col("span_start"), col("span_end")).cast("decimal(38,0)")))
      .head().getDecimal(0)
    require(exSpanFpHash == exSpanHash && exSpanFpRows == exSpanRows,
      "fingerprint-tier cut lists diverged from the string tier")

    // ---- BPE merge TRAINER (d88) at corpus scale --------------------------
    // the claim: training cost = ONE corpus-wide word count (the only
    // pass over corpus bytes) + rounds ∝ the VOCAB (distinct words —
    // orders of magnitude smaller), each round one map-side-combined
    // pair aggregate + a 1-row argmax. The merge table is a pure
    // function of the corpus: retraining over a repartitioned vocab
    // must produce the IDENTICAL table (asserted, the d79 discipline).
    val tBpeW = System.nanoTime()
    val bpeWords = graft.llm.Bpe.wordCorpus(corpus.select(col("text")),
        "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bpeVocab = bpeWords.count()
    val bpeWordsSecs = secs(tBpeW)
    val tBpeT = System.nanoTime()
    val bpeMerges = graft.llm.Bpe.trainMerges(bpeWords, numMerges = 12)
    val bpeTrainSecs = secs(tBpeT)
    val tBpeT2 = System.nanoTime()
    val bpeMerges2 = graft.llm.Bpe.trainMerges(bpeWords.repartition(13),
      numMerges = 12)
    val bpeTrainSecs2 = secs(tBpeT2)
    require(bpeMerges2 == bpeMerges,
      s"BPE training diverged across partitionings: $bpeMerges2 vs $bpeMerges")

    // driver tier at a REAL merge count: collect the vocab once, fold
    // 256 rounds driver-side (the distributed loop pays a Spark job +
    // a collect per round — latency-bound long before a production
    // 32k-merge run). Bit-identity with the distributed tier asserted
    // on the shared 12-round prefix.
    val tBpeA = System.nanoTime()
    val bpeMergesAuto = graft.llm.Bpe.trainMergesAuto(bpeWords,
      numMerges = 256)
    val bpeAutoSecs = secs(tBpeA)
    require(bpeMergesAuto.take(12) == bpeMerges,
      s"driver-tier BPE diverged from the distributed tier on the " +
        s"first 12 merges: ${bpeMergesAuto.take(12)} vs $bpeMerges")
    bpeWords.unpersist(blocking = true)

    // the replicated corpus's vocabulary is TINY (≈92 words: 31 base
    // words + the " rev N" suffixes), so training EXHAUSTS at ~140
    // merges — the correct fixed point, but it can't exercise a real
    // vocab run. A dense-vocab corpus derives deterministically from
    // the doc ids (544k distinct 16-hex-char words, weight 1): enough
    // pair diversity to sustain 256+ merges, the production shape the
    // driver tier exists for. The distributed tier re-anchors the
    // first 12 rounds on THIS corpus too.
    val denseWords = corpus.select(
        lower(hex(xxhash64(col("doc_id")))).as("word"),
        lit(1L).as("freq"))
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val denseVocab = denseWords.count()
    val tBpeD = System.nanoTime()
    val denseMerges = graft.llm.Bpe.trainMergesAuto(denseWords,
      numMerges = 256)
    val bpeDenseSecs = secs(tBpeD)
    require(denseMerges.size == 256,
      s"the dense-vocab corpus must sustain 256 merges: ${denseMerges.size}")
    val tBpeD12 = System.nanoTime()
    val denseMerges12 = graft.llm.Bpe.trainMerges(denseWords, numMerges = 12)
    val bpeDense12Secs = secs(tBpeD12)
    require(denseMerges.take(12) == denseMerges12,
      s"driver-tier BPE diverged from the distributed tier on the " +
        s"dense corpus: ${denseMerges.take(12)} vs $denseMerges12")
    denseWords.unpersist(blocking = true)

    // d40 stratum overlap at 8 synthetic strata: replicas of every base
    // doc land in all strata (doc_id % 8), so the shared-gram join runs
    // at its heaviest (near-total overlap, jaccard ~ 1)
    val tSo = System.nanoTime()
    val soRows = graft.llm.Dedup.stratumOverlap(
      corpus.withColumn("stratum", (col("doc_id") % 8).cast("string")),
      "text", "stratum", width = 8).count()
    val soSecs = secs(tSo)

    // s11 centroid matrix over the 80k replicated vectors, 8 strata:
    // one embeddings pass, exchange carries |strata| x 64 longs
    val tCent = System.nanoTime()
    val centRows = graft.llm.Similarity.stratumCentroidMatrix(
      vecs, vecs.select(col("vec_id"),
        (col("vec_id") % 8).cast("string").as("stratum")),
      "vec_id", "vec_id", "stratum").count()
    val centSecs = secs(tCent)

    // ---- wave-4/5 surfaces at the 544k corpus / 80k vectors ------------

    // d48 drift between the even/odd corpus halves: ONE tokenize with
    // map-side combine — only distinct terms shuffle, so the op should
    // track the scan
    val tDrift = System.nanoTime()
    val driftTop = TextAnalysis.distributionDrift(corpus, "text",
      col("doc_id") % 2 === 0, topK = 20).collect()
    val driftSecs = secs(tDrift)
    val driftTvd = driftTop.head.getDouble(6)

    // d49 length batching: hot bands (synthetic lengths concentrate)
    // split over 16 deterministic shards; ONE exchange end to end
    val tBatch = System.nanoTime()
    val batchStatsDf = graft.llm.Packing.batchStats(
      graft.llm.Packing.lengthBucketBatches(corpus, "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        batchSize = 32, bandWidth = 32, saltShards = 16))
    val nBatches = batchStatsDf.count()
    val batchSecs = secs(tBatch)
    val batchExchanges = shuffleCount(batchStatsDf.queryExecution)

    // d50 heavy hitters where the sketch actually earns its keep: top
    // 8-char-gram fingerprints over ~80M gram instances with a
    // HIGH-cardinality key space — the exact path shuffles every
    // distinct gram into a full groupBy + top-k, the sketch shuffles
    // one 64-counter map per partition
    val grams = corpus.select(
      explode(TextAnalysis.charGramHashes(lower(col("text")), 8)).as("g"))
    val tHhSketch = System.nanoTime()
    val hhSketch = grams.agg(graft.functions.FrequentItems
      .frequentItems(col("g"), capacity = 64).as("it")).head()
      .getSeq[org.apache.spark.sql.Row](0)
    val hhSketchSecs = secs(tHhSketch)
    val tHhExact = System.nanoTime()
    val hhExact = grams.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("g").asc).limit(50).collect()
    val hhExactSecs = secs(tHhExact)
    // MG guarantees presence above N/(cap+1) and bounded undercount —
    // NOT rank order among near-ties (this corpus replicates whole docs,
    // so hundreds of grams tie near the top); record the overlap between
    // the sketch's survivors and the exact top-50 as the fidelity metric
    val hhExactSet = hhExact.map(_.getString(0)).toSet
    val hhOverlap = hhSketch.count(r => hhExactSet.contains(r.getString(0)))

    // s16 truncated rerank vs the full-dim brute force above (same
    // 80k corpus, same 20 queries): stage 1 pays 16/64ths of the
    // multiplies, stage 2 re-scores 40 rows per query
    val tTr = System.nanoTime()
    val nTr = graft.llm.Similarity.truncatedRerankTopK(vecs,
      vecs.where(isQuery), k = 10, prefixDims = 16, candidates = 40).count()
    val trSecs = secs(tTr)
    require(nTr == nSimF, s"truncated top-k cardinality diverged: $nTr vs $nSimF")

    // m27 compaction: a fragmented BM25 snapshot (32 files per bucket
    // dir — the accretion shape) vs its compacted successor, same probe
    val hconf = spark.sparkContext.hadoopConfiguration
    val compStore = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/store"
    graft.llm.LayoutStore.writeSnapshot(hconf, compStore) { tmp =>
      TextAnalysis.writeBm25Layout(corpus, tmp, termBuckets = 64)
      val frag = spark.read.parquet(s"$tmp/postings").repartition(32)
      frag.write.mode("overwrite").partitionBy("tbucket")
        .parquet(s"$tmp/postings_frag")
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(hconf)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/postings"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/postings_frag"),
        new org.apache.hadoop.fs.Path(s"$tmp/postings"))
    }
    def countParquetFiles(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(hconf)
      val it = fs.listFiles(path, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val fragFiles = countParquetFiles(s"$compStore/version=1/postings")
    val probeQ = Seq(("table value part hash", 1L))
    val probeDf = spark.createDataFrame(probeQ).toDF("qtext", "query_id")
    val tProbeFrag = System.nanoTime()
    val nProbeFrag = TextAnalysis.bm25TopKIndexedLatest(spark, compStore,
      probeDf, "query_id", "qtext", k = 10).count()
    val probeFragSecs = secs(tProbeFrag)
    val tCompact = System.nanoTime()
    graft.llm.LayoutStore.compactSnapshot(spark, compStore)
    val compactSecs = secs(tCompact)
    val compFiles = countParquetFiles(s"$compStore/version=2/postings")
    val tProbeComp = System.nanoTime()
    val nProbeComp = TextAnalysis.bm25TopKIndexedLatest(spark, compStore,
      probeDf, "query_id", "qtext", k = 10).count()
    val probeCompSecs = secs(tProbeComp)
    require(nProbeFrag == nProbeComp,
      s"compaction changed probe cardinality: $nProbeComp vs $nProbeFrag")

    // d51 budget select over the 544k corpus: banded prefix sum, no
    // single-task global sort; budget = ~half the corpus token mass
    val tBud = System.nanoTime()
    val budAgg = graft.llm.Packing.budgetSelect(corpus, "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        size(array_distinct(TextAnalysis.tokens(lower(col("text")))))
          .cast("long"),
        budget = 20000000L)
      .agg(count(lit(1)).as("n"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("sel")).head()
    val budSecs = secs(tBud)
    val (budRows, budSelected) = (budAgg.getLong(0), budAgg.getLong(1))

    // m28 bucketed vs plain co-located join at corpus scale (broadcast
    // and AQE off so the measured delta is the layout's): the recurring
    // fact-x-dim join with 32 matching buckets runs with ZERO exchange
    val facts = corpus.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
    val dims = corpus.select(col("doc_id"), (col("doc_id") % 7).as("label"))
    val tBktBuild = System.nanoTime()
    graft.sinks.Sinks.writeBucketed(facts, "sb_facts", Seq("doc_id"),
      numBuckets = 32, sortCols = Seq("doc_id"))
    graft.sinks.Sinks.writeBucketed(dims, "sb_dims", Seq("doc_id"),
      numBuckets = 32, sortCols = Seq("doc_id"))
    val bktBuildSecs = secs(tBktBuild)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val (bktJoinSecs, plainJoinSecs, bktExchanges, nJoin) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val bj = spark.table("sb_facts")
          .join(spark.table("sb_dims"), "doc_id")
          .groupBy(col("label")).agg(sum(col("n_toks")).as("t"))
        val tBkt = System.nanoTime()
        val nB = bj.count()
        val bktS = secs(tBkt)
        val pj = facts.join(dims, "doc_id")
          .groupBy(col("label")).agg(sum(col("n_toks")).as("t"))
        val tPlain = System.nanoTime()
        val nP = pj.count()
        val plainS = secs(tPlain)
        require(nB == nP, s"bucketed join row count diverged: $nB vs $nP")
        (bktS, plainS, shuffleCount(bj.queryExecution), nB)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }

    // ---- wave-6 surfaces at the 544k corpus ----------------------------
    // m31 cross-run profile drift: persist the even half's term profile
    // (a vocabulary-sized snapshot), then drift the FULL corpus against
    // the pinned version — probe cost is one corpus tokenize plus a
    // vocab-x-vocab full-outer join; the previous corpus never rescans
    val profStore = java.nio.file.Files
      .createTempDirectory("graft-prof").toString + "/store"
    val tProfW = System.nanoTime()
    TextAnalysis.writeTermProfileSnapshot(
      corpus.where(col("doc_id") % 2 === 0), "text", profStore)
    val profWriteSecs = secs(tProfW)
    val tProfD = System.nanoTime()
    val profTop = TextAnalysis.driftAgainstProfile(spark, corpus, "text",
      profStore, topK = 20).collect()
    val profDriftSecs = secs(tProfD)
    val profTvd = profTop.head.getDouble(6)

    // d54 calibration at 32 strata: the histogram (<=1001 rows/stratum)
    // takes the only window, docs re-join by broadcast — the per-doc
    // path is scan -> partial agg -> broadcast join, so wall-clock
    // should track the tokenize
    val tCal = System.nanoTime()
    val calToksC = TextAnalysis.tokens(lower(coalesce(col("text"), lit(""))))
    val calQe = graft.llm.Filters.calibrateScores(
      corpus.select(col("doc_id"),
          concat(lit("src"), (col("doc_id") % 32).cast("string")).as("src"),
          size(calToksC).cast("long").as("n_toks"),
          size(array_distinct(calToksC)).cast("long").as("n_uniq"))
        .select(col("doc_id"), col("src"),
          when(col("n_toks") === 0L, lit(0L))
            .otherwise(expr("(1000 * n_uniq) div n_toks")).as("score")),
      "doc_id", "src", "score").queryExecution
    val nCal = calQe.executedPlan.execute().count()
    val calSecs = secs(tCal)

    // s19 hashed-BoW classifier: fit on a 10% sample (the 100TB
    // contract), score the full corpus — scoring is the map-side
    // aggregate-HOF fold, zero exchanges recorded like d22
    val tBowFit = System.nanoTime()
    val (bwW, bwB) = graft.llm.Filters.fitHashedBowModel(
      corpus.where(col("doc_id") % 10 === 0), "text",
      length(col("text")) > 800, dim = 64)
    val bowFitSecs = secs(tBowFit)
    val tBowScore = System.nanoTime()
    val bowQe = graft.llm.Filters.hashedBowMargin(corpus, "doc_id",
      "text", bwW, bwB).queryExecution
    val nBow = bowQe.executedPlan.execute().count()
    val bowScoreSecs = secs(tBowScore)
    val bowExchanges = shuffleCount(bowQe)

    // ---- round-10 surfaces at the 544k corpus --------------------------
    // d66 SimHash-tier recall gauge, on the EXACT-DEDUPED corpus (the
    // gauge's contract at scale: verbatim mega-clusters belong to exact
    // dedup — left in, even the uncapped truth generator would go
    // quadratic inside the 2500-deep identical-signature buckets). The
    // number this makes first-class: what the capped 4x16-bit band tier
    // drops when its 2^16-value buckets saturate, vs the combination-key
    // tier at the same cap.
    val tSimRec = System.nanoTime()
    val gaugeCorpus = Dedup.exactDedup(corpus, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gaugeCorpus.count()
    val simRec = Dedup.simhashRecallGauge(gaugeCorpus, "doc_id", "text",
      maxHamming = 3, bands = 4, chunks = 6, maxBucketSize = Some(cap))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(4)))).toMap
    val simRecSecs = secs(tSimRec)
    val (simRecTrue, simRecBand) = simRec("band")
    val simRecComb = simRec("combined")._2

    // d74 exact set-similarity join on the exact-deduped corpus — run
    // the d75 COST GAUGE first, because the full 544k adversarial
    // corpus prices the cap-free pass OUT on this box: docs here carry
    // ~23 distinct tokens over a small vocabulary, so thousands-deep
    // tokens land inside prefixes and sum C(prefixdf, 2) reaches the
    // billions (the full-corpus attempt died at >70 GB of shuffle
    // spill — the measured finding the gauge exists to prevent). The
    // timed join takes the largest deterministic clique subset the
    // gauge prices under ~300M candidates (candidates scale ~1/k^2 in
    // the base-doc modulus k); both bounds land in the artifact so the
    // subset justifies itself. Pairs are the cost claim: every clique
    // qualifies wholesale, so count-per-second is the scheme's number.
    val tSetSimCost = System.nanoTime()
    val ssCostFull = Dedup.setSimilarityJoinCost(gaugeCorpus, "doc_id",
      "text", thresholdNum = 7, thresholdDen = 10).head()
    val setSimCostSecs = secs(tSetSimCost)
    val ssCandBoundFull = ssCostFull.getLong(2)
    val ssMod = Seq(1L, 2L, 4L, 8L, 16L, 32L)
      .find(k => ssCandBoundFull / (k * k) <= 300000000L).getOrElse(64L)
    val ssCorpus = (if (ssMod == 1L) gaugeCorpus
      else gaugeCorpus.where(
        pmod((col("doc_id") / 100000).cast("long"), lit(ssMod)) === 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ssDocs = ssCorpus.count()
    val ssCostSub = Dedup.setSimilarityJoinCost(ssCorpus, "doc_id",
      "text", thresholdNum = 7, thresholdDen = 10).head()
    // the 1/k^2 scaling of the bound under the doc_id-block subset is an
    // assumption until measured — surface any overshoot of the budget the
    // selection promised rather than letting the artifact imply it held
    if (ssCostSub.getLong(2) > 300000000L)
      println(s"setsim subset bound OVERSHOOT: mod=$ssMod measured " +
        s"${ssCostSub.getLong(2)} candidates > 300000000 budget")
    val tSetSim = System.nanoTime()
    val setSimPairs = Dedup.setSimilarityJoin(ssCorpus, "doc_id",
      "text", thresholdNum = 7, thresholdDen = 10).count()
    val setSimSecs = secs(tSetSim)
    ssCorpus.unpersist(blocking = true)
    gaugeCorpus.unpersist(blocking = true)

    // d67 distinct-cardinality monitor: exact count(DISTINCT) rollup vs
    // the HLL regime over the same 32-source split. At 100TB the exact
    // distinct-term pass IS the bottleneck this row exists to avoid —
    // locally the gap is modest (both pay the tokenize+explode); the
    // claim worth committing is the sketch's error at its ±5% rsd.
    val cardSrc = corpus.withColumn("src",
      concat(lit("s"), (col("doc_id") % 32).cast("string")))
    val tCardEx = System.nanoTime()
    val cardExact = TextAnalysis.cardinalityMonitor(cardSrc, "doc_id",
      "text", "src").where(col("is_total") === 1).head()
    val cardExactSecs = secs(tCardEx)
    val tCardHll = System.nanoTime()
    val cardHll = TextAnalysis.cardinalityMonitor(cardSrc, "doc_id",
      "text", "src", approximate = true, rsd = 0.05)
      .where(col("is_total") === 1).head()
    val cardHllSecs = secs(tCardHll)
    val (cardExactTerms, cardHllTerms) =
      (cardExact.getLong(4), cardHll.getLong(4))
    val cardHllErr =
      math.abs(cardHllTerms - cardExactTerms).toDouble / cardExactTerms

    // d65 takedown propagation vs from-scratch rebuild on the BM25
    // index: revoke 1% of docs, then (a) propagate with closed-form
    // df/N/Σdl repair — reads only the index — vs (b) re-index the
    // scrubbed corpus — pays the full tokenize+explode+aggs again. The
    // gap is the production deletion-pass win and grows with text width
    // (the index rows are a fraction of the corpus bytes).
    val tdStore = java.nio.file.Files
      .createTempDirectory("graft-td").toString + "/bm25"
    val tTdBuild = System.nanoTime()
    TextAnalysis.writeBm25Snapshot(corpus, tdStore, termBuckets = 64)
    val tdBuildSecs = secs(tTdBuild)
    val tdRevoked = corpus.where(col("doc_id") % 100 === 7)
      .select(col("doc_id"))
    val tdRevokedN = tdRevoked.count()
    val tTdProp = System.nanoTime()
    graft.llm.Takedown.propagateBm25Snapshot(spark, tdStore, tdRevoked,
      "doc_id")
    val tdPropSecs = secs(tTdProp)
    val tdRebuildStore = java.nio.file.Files
      .createTempDirectory("graft-td-rb").toString + "/bm25"
    val tTdRebuild = System.nanoTime()
    TextAnalysis.writeBm25Snapshot(
      graft.llm.Takedown.scrubCorpus(corpus, "doc_id", tdRevoked, "doc_id"),
      tdRebuildStore, termBuckets = 64)
    val tdRebuildSecs = secs(tTdRebuild)

    // m43 append vs from-scratch re-index: index the 90% slice, then
    // merge the 10% batch in CLOSED FORM (batch tokenizes, old postings
    // take a map-side df bump, stats add). The from-scratch comparison
    // is td_build_secs above — the SAME writeBm25Snapshot on the full
    // corpus within this suite. The structural claim: append cost =
    // batch tokenize + one index rewrite, never the corpus tokenize.
    val apStore = java.nio.file.Files
      .createTempDirectory("graft-ap").toString + "/bm25"
    val apBatch = corpus.where(col("doc_id") % 10 === 3)
    val apBatchN = apBatch.count()
    val tApBuild = System.nanoTime()
    TextAnalysis.writeBm25Snapshot(corpus.where(col("doc_id") % 10 =!= 3),
      apStore, termBuckets = 64)
    val apBuildSecs = secs(tApBuild)
    val tApMerge = System.nanoTime()
    graft.llm.Ingest.appendBm25Snapshot(spark, apStore, apBatch)
    val apMergeSecs = secs(tApMerge)

    // partition-level copy-through accounting: a file counts as COPIED
    // under the round-12 manifest model files_copied reads ~0 BY
    // CONSTRUCTION (untouched dirs are inherited by reference, not
    // copied) — inherited_dirs below is where the untouched mass went;
    // files_written remains the ∝-touched claim. The honest caveat for
    // the BM25 pair: a broad-vocabulary batch/revocation touches most
    // term buckets (common words hash everywhere), so their inherited
    // fraction is structural, not dramatic — the ∝-batch headline is
    // the day-partitioned layout below.
    val (tdFilesCopied, tdBytesCopied, tdFilesWritten, tdBytesWritten) =
      versionDiff(s"$tdStore/version=1", s"$tdStore/version=2")
    val (apFilesCopied, apBytesCopied, apFilesWritten, apBytesWritten) =
      versionDiff(s"$apStore/version=1", s"$apStore/version=2")
    def inheritedDirs(store: String, v: Long): Int =
      graft.llm.LayoutStore.readManifest(hconf, store, v)
        .map(_.count(_._2 < v)).getOrElse(0)
    val tdInherited = inheritedDirs(tdStore, 2L)
    val apInherited = inheritedDirs(apStore, 2L)

    // the ∝-batch case manifest versions exist for: a TIME-PARTITIONED
    // metadata layout (64 days of history), appending ONE day's batch.
    // The append must write one directory and INHERIT 63 by reference;
    // the rebuild comparison pays the full union re-land — the cost the
    // version would otherwise pay at every growth step.
    val apdStore = java.nio.file.Files
      .createTempDirectory("graft-apd").toString + "/store"
    val apdRows = corpus.select(col("doc_id").as("id"),
      (col("doc_id") % 64).cast("int").as("day"),
      length(col("text")).cast("long").as("nbytes"))
    graft.llm.LayoutStore.writeSnapshot(hconf, apdStore)(tmp =>
      apdRows.repartition(col("day")).write.partitionBy("day").parquet(tmp))
    val apdBatchRows = (nDocs / 64).toInt
    val apdBatch = spark.range(apdBatchRows.toLong).select(
      (col("id") + lit(1000000000L)).as("id"), // past every corpus id
      lit(17).cast("int").as("day"),
      (col("id") * 37L % 997L).as("nbytes"))
    val tApd = System.nanoTime()
    graft.llm.Ingest.appendRowsSnapshot(spark, apdStore, apdBatch,
      "day", "id")
    val apdAppendSecs = secs(tApd)
    val (apdFilesCopied, apdBytesCopied, apdFilesWritten, apdBytesWritten) =
      versionDiff(s"$apdStore/version=1", s"$apdStore/version=2")
    val apdInherited = inheritedDirs(apdStore, 2L)
    val apdRebuildStore = java.nio.file.Files
      .createTempDirectory("graft-apd-rb").toString + "/store"
    val tApdRb = System.nanoTime()
    graft.llm.LayoutStore.writeSnapshot(hconf, apdRebuildStore)(tmp =>
      apdRows.unionByName(apdBatch)
        .repartition(col("day")).write.partitionBy("day").parquet(tmp))
    val apdRebuildSecs = secs(tApdRb)

    // m45 z-order layout: lineitem clustered by Morton (l_partkey,
    // l_suppkey) buckets; a both-dim rectangle reads only the admitted
    // bucket directories vs the plain scan of the flat parquet (which
    // still gets row-group pushdown — the honest local comparison; the
    // structural win is the file-listing-level subset, zo_buckets_read
    // of zo_buckets).
    val liPath = s"$sfDir/lineitem.parquet"
    val li = spark.read.parquet(liPath)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
    val lb = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val zDims = Seq(
      graft.sinks.ZOrder.Dim("l_partkey", lb.getLong(0), lb.getLong(1)),
      graft.sinks.ZOrder.Dim("l_suppkey", lb.getLong(2), lb.getLong(3)))
    val zPath = java.nio.file.Files
      .createTempDirectory("graft-zo").toString + "/layout"
    val zBuckets = 64
    val tZoWrite = System.nanoTime()
    graft.sinks.ZOrder.writeZOrderLayout(li, zPath, zDims, bits = 5,
      zBuckets = zBuckets)
    val zoWriteSecs = secs(tZoWrite)
    val zRect = Seq(
      (lb.getLong(0), lb.getLong(0) + (lb.getLong(1) - lb.getLong(0)) / 8),
      (lb.getLong(2), lb.getLong(2) + (lb.getLong(3) - lb.getLong(2)) / 4))
    val zoBucketsRead = graft.sinks.ZOrder
      .bucketsForRect(zDims, zRect, bits = 5, zBuckets = zBuckets).length
    val tZoPruned = System.nanoTime()
    val zoRows = graft.sinks.ZOrder
      .readRect(spark, zPath, zDims, zRect, bits = 5, zBuckets = zBuckets)
      .count()
    val zoPrunedSecs = secs(tZoPruned)
    val tZoPlain = System.nanoTime()
    val zoPlainRows = li
      .where(col("l_partkey").between(zRect(0)._1, zRect(0)._2) &&
        col("l_suppkey").between(zRect(1)._1, zRect(1)._2))
      .count()
    val zoPlainSecs = secs(tZoPlain)
    require(zoRows == zoPlainRows,
      s"z-order pruned read dropped rows: $zoRows != $zoPlainRows")

    val line =
      s"""{"metric":"scale_dedup","unit":"sec","sf":"$sfDir","docs":$nDocs,""" +
      s""""gen_secs":$genSecs,"exact_secs":$exactSecs,"exact_groups":$nExactGroups,""" +
      s""""lsh_secs":$lshSecs,"lsh_cands":$nCands,"bucket_cap":$cap,""" +
      s""""cc_secs":$ccSecs,"cc_clusters":$nClusters,"cc_nodes":$nClustered,""" +
      s""""cc_rounds":$ccRounds,""" +
      s""""inc_cc_prior_secs":$incPriorSecs,""" +
      s""""inc_cc_batch1_edges":$incBatch1,"inc_cc_fold1_secs":$incFold1Secs,""" +
      s""""inc_cc_changed1":$incChanged1,"inc_cc_rounds1":$incRounds1,""" +
      s""""inc_cc_batch4_edges":$incBatch4,"inc_cc_fold4_secs":$incFold4Secs,""" +
      s""""inc_cc_changed4":$incChanged4,"inc_cc_rounds4":$incRounds4,""" +
      s""""pagerank_secs":$prSecs,"pagerank_repart_secs":$prSecs2,""" +
      s""""pagerank_nodes":$prNodes,"pagerank_edges":$nCands,""" +
      s""""pagerank_iters":$prIters,""" +
      s""""pagerank_secs_per_round":${prSecs / prIters},""" +
      s""""pagerank_rank_hash":"$prHash",""" +
      graphJson +
      s""""winnow_secs":$winSecs,"winnow_fps":$nFps,""" +
      s""""simhash_secs":$simSecs,"simhash_pairs":$nSimPairs,""" +
      s""""simhash_comb_secs":$simCSecs,"simhash_comb_pairs":$nSimCPairs,""" +
      s""""edit_secs":$editSecs,"edit_pairs":$nEditPairs,"edit_k":$editK,""" +
      s""""edit_idx_secs":$editIdxSecs,"edit_probe_secs":$editProbeSecs,""" +
      s""""edit_probe_dups":$editProbeDups,""" +
      s""""rj_secs":$rjSecs,"rj_matches":$rjMatches,"rj_bin_width":$binW,""" +
      s""""rj_blowup":$blowup,"ov_secs":$ovSecs,"ov_matches":$ovMatches,""" +
      s""""asof_secs":$asofSecs,"asof_rows":$asofRows,""" +
      s""""anti_plain_secs":$plainAntiSecs,"anti_bloom_secs":$bloomAntiSecs,""" +
      s""""anti_bloom_prune_secs":$bloomPruneSecs,""" +
      s""""anti_bloom_build_secs":$bloomBuildSecs,"anti_new_rows":$nBloomAnti,""" +
      s""""anti_small_batch_rows":$nSmallBatch,""" +
      s""""anti_small_plain_secs":$smallPlainSecs,""" +
      s""""anti_small_bloom_secs":$smallBloomSecs,""" +
      s""""anti_small_bloom_prune_secs":$smallPruneSecs,""" +
      s""""sigstate_secs":$stateSecs,"inc_1k_secs":$incSecs1k,"inc_1k_kept":$kept1k,""" +
      s""""inc_4k_secs":$incSecs4k,"inc_4k_kept":$kept4k,""" +
      s""""sess_events":$nEv,"sess_hot_events":$hotN,""" +
      s""""sess_hot_ratio":${hotN.toDouble / nEv},"sess_gap":$sessGap,""" +
      s""""sess_range_width":$dayWidth,"sess_max_salted_group":$maxSaltedGroup,""" +
      s""""sess_unsalted_secs":$sessUSecs,"sess_salted_secs":$sessSSecs,""" +
      s""""sess_sessions":$nSessions,""" +
      s""""kw_secs":$kwSecs,"kw_rows":$nKw,"kw_df_join":"$kwJoin",""" +
      s""""rep_secs":$repSecs,"rep_rows":$nRep,"rep_exchanges":$repExchanges,""" +
      s""""rep_half_secs":$repHalfSecs,"rep_half_rows":$nRepH,""" +
      s""""mix_secs":$mixSecs,"mix_rows":$nMix,"mix_exchanges":$mixExchanges,""" +
      s""""mix_window_group_limit":$mixGroupLimit,""" +
      s""""mix_join_secs":$mixJoinSecs,"mix_join":"$mixJoinKind",""" +
      s""""pii_secs":$piiSecs,"pii_rows":$nPii,"pii_exchanges":$piiExchanges,""" +
      s""""span_secs":$spanRmSecs,"span_docs":$spanDocs,"span_cut":$spanCut,""" +
      s""""span_toks_removed":$spanToks,""" +
      s""""bm25_secs":$bmSecs,"bm25_rows":$nBm,""" +
      s""""bm25_idx_build_secs":$bmIdxBuildSecs,""" +
      s""""bm25_idx_probe_secs":$bmIdxProbeSecs,"bm25_idx_rows":$nBmIdx,""" +
      s""""bm25_scan1_secs":$bmScan1Secs,"bm25_scan1_rows":$nBmScan1,""" +
      s""""bm25_idx1_secs":$bmIdx1Secs,"bm25_idx1_rows":$nBmIdx1,""" +
      s""""shard_secs":$shardSecs,"shard_n":$shardN,""" +
      s""""shard_max_docs":$shardMax,"shard_min_docs":$shardMin,""" +
      s""""chunk_secs":$chunkSecs,"chunk_rows":$nChunks,""" +
      s""""bigram_secs":$bigSecs,"bigram_rows":$bigRows,"bigram_avg":$bigAvg,""" +
      s""""nov_secs":$novSecs,"nov_rows":$novRows,"nov_avg":$novAvg,""" +
      s""""imp_secs":$impSecs,"imp_rows":$nImp,""" +
      s""""imp_take_ordered":$impTakeOrdered,""" +
      s""""sem_fit_secs":$semFitSecs,"sem_secs":$semSecs,""" +
      s""""sem_rows":$semRows,"sem_dropped":$semDropped,""" +
      s""""funnel_secs":$funSecs,"funnel_docs":$funDocs,""" +
      s""""funnel_kept":$funKept,""" +
      s""""bpe_secs":$bpeSecs,"bpe_rows":$bpeRows,""" +
      s""""exspan_secs":$exSpanSecs,"exspan_repart_secs":$exSpanSecs2,""" +
      s""""exspan_fp_secs":$exSpanFpSecs,""" +
      s""""exspan_rows":$exSpanRows,"exspan_hash":"$exSpanHash",""" +
      s""""bpe_vocab":$bpeVocab,"bpe_wordcount_secs":$bpeWordsSecs,""" +
      s""""bpe_train_secs":$bpeTrainSecs,""" +
      s""""bpe_train_repart_secs":$bpeTrainSecs2,""" +
      s""""bpe_merges":${bpeMerges.size},""" +
      s""""bpe_auto_merges":${bpeMergesAuto.size},""" +
      s""""bpe_auto_secs":$bpeAutoSecs,""" +
      s""""bpe_auto_sec_per_merge":${bpeAutoSecs / math.max(1, bpeMergesAuto.size)},""" +
      s""""bpe_dense_vocab":$denseVocab,""" +
      s""""bpe_dense_merges":${denseMerges.size},""" +
      s""""bpe_dense_secs":$bpeDenseSecs,""" +
      s""""bpe_dense_sec_per_merge":${bpeDenseSecs / math.max(1, denseMerges.size)},""" +
      s""""bpe_dense_dist12_secs":$bpeDense12Secs,""" +
      s""""so_secs":$soSecs,"so_pairs":$soRows,""" +
      s""""cent_secs":$centSecs,"cent_pairs":$centRows,""" +
      s""""vec_corpus":$nVecs,"vec_float_secs":$simFSecs,""" +
      s""""vec_int8_secs":$simQSecs,"vec_topk_rows":$nSimF,""" +
      s""""vec_float_bytes":$floatBytes,"vec_int8_bytes":$int8Bytes,""" +
      s""""drift_secs":$driftSecs,"drift_tvd":$driftTvd,""" +
      s""""lb_secs":$batchSecs,"lb_batches":$nBatches,""" +
      s""""lb_exchanges":$batchExchanges,""" +
      s""""hh_sketch_secs":$hhSketchSecs,"hh_exact_secs":$hhExactSecs,""" +
      s""""hh_sketch_size":${hhSketch.length},"hh_overlap_50":$hhOverlap,""" +
      s""""tr_secs":$trSecs,"tr_rows":$nTr,""" +
      s""""compact_frag_files":$fragFiles,"compact_files":$compFiles,""" +
      s""""compact_secs":$compactSecs,""" +
      s""""compact_probe_frag_secs":$probeFragSecs,""" +
      s""""compact_probe_secs":$probeCompSecs,""" +
      s""""bud_secs":$budSecs,"bud_rows":$budRows,"bud_selected":$budSelected,""" +
      s""""bjoin_build_secs":$bktBuildSecs,"bjoin_bucketed_secs":$bktJoinSecs,""" +
      s""""bjoin_plain_secs":$plainJoinSecs,"bjoin_exchanges":$bktExchanges,""" +
      s""""bjoin_rows":$nJoin,""" +
      s""""prof_write_secs":$profWriteSecs,"prof_drift_secs":$profDriftSecs,""" +
      s""""prof_tvd":$profTvd,""" +
      s""""cal_secs":$calSecs,"cal_rows":$nCal,""" +
      s""""bow_fit_secs":$bowFitSecs,"bow_score_secs":$bowScoreSecs,""" +
      s""""bow_rows":$nBow,"bow_exchanges":$bowExchanges,""" +
      s""""simrec_secs":$simRecSecs,"simrec_true":$simRecTrue,""" +
      s""""simrec_band_recall":$simRecBand,""" +
      s""""simrec_comb_recall":$simRecComb,""" +
      s""""setsim_cost_secs":$setSimCostSecs,""" +
      s""""setsim_prefix_rows":${ssCostFull.getLong(0)},""" +
      s""""setsim_max_prefix_df":${ssCostFull.getLong(1)},""" +
      s""""setsim_cand_bound":$ssCandBoundFull,""" +
      s""""setsim_sub_mod":$ssMod,"setsim_docs":$ssDocs,""" +
      s""""setsim_sub_cand_bound":${ssCostSub.getLong(2)},""" +
      s""""setsim_secs":$setSimSecs,"setsim_pairs":$setSimPairs,""" +
      s""""card_exact_secs":$cardExactSecs,"card_hll_secs":$cardHllSecs,""" +
      s""""card_exact_terms":$cardExactTerms,"card_hll_terms":$cardHllTerms,""" +
      s""""card_hll_err":$cardHllErr,""" +
      s""""td_build_secs":$tdBuildSecs,"td_prop_secs":$tdPropSecs,""" +
      s""""td_rebuild_secs":$tdRebuildSecs,"td_revoked_docs":$tdRevokedN,""" +
      s""""ap_build90_secs":$apBuildSecs,"ap_merge_secs":$apMergeSecs,""" +
      s""""ap_batch_docs":$apBatchN,""" +
      s""""td_files_copied":$tdFilesCopied,"td_bytes_copied":$tdBytesCopied,""" +
      s""""td_inherited_dirs":$tdInherited,""" +
      s""""td_files_written":$tdFilesWritten,"td_bytes_written":$tdBytesWritten,""" +
      s""""ap_files_copied":$apFilesCopied,"ap_bytes_copied":$apBytesCopied,""" +
      s""""ap_inherited_dirs":$apInherited,""" +
      s""""ap_files_written":$apFilesWritten,"ap_bytes_written":$apBytesWritten,""" +
      s""""apd_append_secs":$apdAppendSecs,"apd_rebuild_secs":$apdRebuildSecs,""" +
      s""""apd_batch_rows":$apdBatchRows,"apd_days":64,""" +
      s""""apd_files_copied":$apdFilesCopied,"apd_bytes_copied":$apdBytesCopied,""" +
      s""""apd_inherited_dirs":$apdInherited,""" +
      s""""apd_files_written":$apdFilesWritten,"apd_bytes_written":$apdBytesWritten,""" +
      s""""zo_write_secs":$zoWriteSecs,"zo_pruned_secs":$zoPrunedSecs,""" +
      s""""zo_plain_secs":$zoPlainSecs,"zo_rows":$zoRows,""" +
      s""""zo_buckets_read":$zoBucketsRead,"zo_buckets":$zBuckets,""" +
      s""""total_secs":${secs(t0)},"provenance":${provenanceJson()}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_BENCH.json"), line + "\n")
    spark.stop()
  }
}

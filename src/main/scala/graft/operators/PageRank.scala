package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration in FIXED-POINT integer arithmetic — the
  * canonical Pregel-style iterative graph workload (the family
  * connected components already covers for reachability), stated so the
  * result is BIT-EXACT across engines, partitionings and runs:
  *
  * Floating-point PageRank is order-dependent (a node's inbound sum
  * changes with shuffle order), which makes it un-gateable against an
  * independent engine and non-reproducible across cluster sizes — a
  * real problem when rank feeds a deterministic curation decision
  * (keep the top-k authoritative pages per domain). Here every rank is
  * a scaled long (`scale` = 1 unit of probability mass), every
  * division is integer division, and every sum is a sum of longs —
  * associative and commutative EXACTLY, so the result is a pure
  * function of the graph. The cost is truncation toward zero at each
  * division (mass leaks at the last scaled digit instead of
  * renormalizing); rank ORDERING — the thing curation consumes — is
  * unaffected at `scale` = 10^12 for graphs up to ~10^9 nodes.
  *
  * Dangling nodes (no out-edges) redistribute their mass uniformly,
  * the standard correction. With damping d = dampNum/dampDen:
  *
  *   r'(v) = (scale/N)·(dampDen−dampNum)/dampDen
  *         + dampNum·(Σ_{u→v} r(u) div deg(u) + D div N) / dampDen
  *
  * where D = Σ ranks of dangling nodes. All terms stay < 2^63 for
  * scale ≤ 10^15 — enforced: the damping fraction is gcd-normalized
  * and the numerator is REQUIRED under Long.MaxValue/(2·scale), so an
  * equivalent-but-larger fraction either normalizes into range or
  * fails fast instead of silently overflowing.
  *
  * Scale shape: one shuffle per iteration (the inbound-contribution
  * groupBy on dst); the node frame re-joins by key each round — at
  * cluster scale both sides pre-partition by node id so the join and
  * the aggregate reuse one exchange, and iterations are a fixed small
  * count (power iteration converges geometrically; curation uses 3-10).
  * The per-iteration dangling scalar is a single tiny aggregate. */
object PageRank {

  /** @param edges DIRECTED edges with columns `src`, `dst` (any integral
    *              or string key type; duplicates allowed — they weight
    *              the edge). Nodes are the distinct union of both sides.
    * @return (node, rank) — ranks scaled longs summing to ≈ `scale`. */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
                         dampNum: Long = 17L, dampDen: Long = 20L,
                         scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen not in [0,1]")
    require(scale >= 1 && scale <= 1000000000000000L,
      s"scale out of the overflow-safe range: $scale")
    // Normalize the fraction, then ENFORCE the documented overflow
    // bound: the per-round term dn*(inbound + dang div N) can reach
    // dn*2*scale (inbound and dang are each bounded by the total mass
    // ≈ scale), so dn must keep that product under 2^63. Reducing by
    // the gcd first means an equivalent-but-larger statement of the
    // same damping (17000/20000) normalizes to 17/20 instead of
    // tripping the guard; truncated division by a common factor is
    // exact on non-negatives (floor(a*g/(b*g)) = floor(a/b)), so the
    // normalized fraction computes bit-identical ranks.
    val g = BigInt(dampNum).gcd(BigInt(dampDen)).toLong
    val (dn, dd) = (dampNum / g, dampDen / g)
    require(dn <= Long.MaxValue / (2 * scale),
      s"damping numerator $dampNum/$dampDen (normalized $dn/$dd) would " +
        s"overflow Long at scale $scale: need dn <= ${Long.MaxValue / (2 * scale)}")
    // the graph frames feed every round AND the per-round scalar
    // actions — unpersisted, an upstream edge derivation (typically a
    // join + distinct) would recompute ~3x per iteration
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    // each round materializes eagerly with truncated lineage (the
    // connectedComponents discipline): the dangling-mass scalar is an
    // action per round, and an uncached chain would recompute every
    // prior round on each of them — quadratic recompute
    var ranks = nodes.withColumn("rank", lit(scale / n)).localCheckpoint()
    val teleport = (scale / n) * (dd - dn) / dd
    for (_ <- 0 until iters) {
      // withDeg feeds BOTH the dangling-mass scalar and the contribs
      // shuffle — unpersisted, the ranks-outdeg join runs twice per
      // round (r17 profile); persist for the round, release after the
      // checkpoint lands
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // dangling mass: a 1-row aggregate folded into the round's plan
      // via broadcast (never a driver action — one job per round total)
      val dang = withDeg.where(col("__deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
      // `div`, not `/`: Spark's Divide on longs is DOUBLE division —
      // one float would forfeit the whole bit-exactness contract
      val contribs = withDeg.where(col("__deg").isNotNull)
        .withColumn("__c", expr("rank div __deg"))
        .select(col("node"), col("__c"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      val prev = ranks
      ranks = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(teleport) + expr(
            s"($dn * (coalesce(__in, CAST(0 AS BIGINT)) + " +
              s"(__dang div $n))) div $dd")).as("rank"))
        .localCheckpoint()
      withDeg.unpersist(blocking = true)
      prev.unpersist(blocking = true)
    }
    // the returned frame is the last round's localCheckpoint —
    // self-contained, so the graph caches release here
    e.unpersist(blocking = true)
    outdeg.unpersist(blocking = true)
    nodes.unpersist(blocking = true)
    ranks
  }

  /** PERSONALIZED fixed-point PageRank: teleport and dangling mass
    * return to a SEED set instead of uniformly to every node, so rank
    * measures authority RELATIVE to the seeds (trusted domains, curated
    * gold documents — the TrustRank-shaped curation signal: spam farms
    * that only cite each other receive no mass no matter how densely
    * they interlink). Same bit-exactness contract and scale shape as
    * [[pageRankFixedPoint]] — every term a long, one shuffle per round:
    *
    *   r'(v) = [v∈S]·((scale div |S|)·(dd−dn) div dd)
    *         + dn·(Σ_{u→v} r(u) div deg(u) + [v∈S]·(D div |S|)) div dd
    *
    * with r0 = scale div |S| on seeds, 0 elsewhere (the standard
    * personalized start). The node universe is the edge endpoints ∪ the
    * seeds — a trusted seed outside the crawl graph still holds its
    * teleport mass. Non-negative throughout, so truncated and floor
    * division coincide and the DuckDB oracle's `//` matches `div`.
    * `seeds` must be non-empty; duplicate seed rows are deduplicated. */
  def personalizedPageRankFixedPoint(edges: DataFrame, seeds: DataFrame,
      iters: Int, dampNum: Long = 17L, dampDen: Long = 20L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen not in [0,1]")
    require(scale >= 1 && scale <= 1000000000000000L,
      s"scale out of the overflow-safe range: $scale")
    val g = BigInt(dampNum).gcd(BigInt(dampDen)).toLong
    val (dn, dd) = (dampNum / g, dampDen / g)
    require(dn <= Long.MaxValue / (2 * scale),
      s"damping numerator $dampNum/$dampDen (normalized $dn/$dd) would " +
        s"overflow Long at scale $scale: need dn <= ${Long.MaxValue / (2 * scale)}")
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nS = seedSet.count()
    require(nS > 0, "personalized PageRank needs a non-empty seed set")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .unionByName(seedSet.select(col("node"))).distinct()
      .join(seedSet.withColumn("__seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(false)).as("__seed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedRank = scale / nS
    val teleportSeed = seedRank * (dd - dn) / dd
    var ranks = nodes
      .withColumn("rank",
        when(col("__seed"), lit(seedRank)).otherwise(lit(0L)))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      // persisted for the round — dang + contribs both read it (the
      // uniform variant's comment applies verbatim)
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dang = withDeg.where(col("__deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
      val contribs = withDeg.where(col("__deg").isNotNull)
        .withColumn("__c", expr("rank div __deg"))
        .select(col("node"), col("__c"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      val prev = ranks
      ranks = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("__seed"),
          (when(col("__seed"), lit(teleportSeed)).otherwise(lit(0L)) +
            expr(s"($dn * (coalesce(__in, CAST(0 AS BIGINT)) + " +
              s"(CASE WHEN __seed THEN __dang div $nS " +
              s"ELSE CAST(0 AS BIGINT) END))) div $dd")).as("rank"))
        .localCheckpoint()
      withDeg.unpersist(blocking = true)
      prev.unpersist(blocking = true)
    }
    e.unpersist(blocking = true)
    outdeg.unpersist(blocking = true)
    seedSet.unpersist(blocking = true)
    nodes.unpersist(blocking = true)
    ranks.select(col("node"), col("rank"))
  }

  /** HITS hubs-and-authorities (Kleinberg) in FIXED POINT — the third
    * member of the link-analysis family (uniform PageRank d79,
    * personalized d81): authority(v) = Σ hub over in-neighbors,
    * hub(u) = Σ authority over out-neighbors, re-normalized each round.
    * Float HITS normalizes by an L2 norm — order-dependent and
    * un-gateable; here both scores stay longs and each round
    * DIV-normalizes by `max div scale` so the maximum lands at ≈ scale
    * (exactly: x div (max div scale), ≤ ~2·scale from divisor
    * truncation — deterministic, and what the d83 oracle's `//`
    * replays). Ranking — the thing curation consumes — is preserved:
    * div by a positive constant is monotone.
    *
    * Overflow bound (documented, like PageRank's): after
    * normalization every score is ≤ 2·scale, so a round's sum needs
    * maxDegree · 2·scale < 2^63 — at the default scale 10^9 that is
    * ~4.6·10^9 in/out-degree, beyond any real graph's hottest node.
    * Dangling/sourceless nodes simply contribute and receive nothing
    * (their opposite score decays to 0 — the HITS contract).
    *
    * Scale shape: two shuffles per round (the in-sum and the out-sum
    * group-bys) + two broadcast 1-row max aggregates folded into the
    * plan; per-round localCheckpoint as the family discipline.
    * Returns (node, hub, auth). */
  def hitsFixedPoint(edges: DataFrame, iters: Int,
                     scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(scale >= 1 && scale <= 1000000000000L,
      s"scale out of the overflow-safe range: $scale")
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    require(nodes.count() > 0, "empty graph")
    var scores = nodes.select(col("node"), lit(scale).as("hub"),
      lit(scale).as("auth")).localCheckpoint()
    for (_ <- 0 until iters) {
      // auth(v) = sum of hubs over in-neighbors, then div-normalize.
      // rawAuth feeds THREE consumers (the __am max broadcast, the hub
      // half's join, the round-final scores join) and rawHub two (the
      // __hm broadcast, the scores join) — unpersisted, the round's
      // expensive join+aggregate subtrees re-computed per consumer (r17
      // profile: d83's round plan ran the rawAuth shuffle 3x), so each
      // persists for the round and releases after the checkpoint lands
      val rawAuth = e
        .join(scores.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("__ra"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val am = rawAuth.agg(greatest(max(col("__ra")), lit(1L)).as("__am"))
      val auth = rawAuth.crossJoin(broadcast(am))
        .select(col("node"),
          expr(s"__ra div (CASE WHEN __am div $scale < 1 THEN 1 " +
            s"ELSE __am div $scale END)").as("auth"))
      // hub(u) = sum of NEW authorities over out-neighbors, normalized
      val rawHub = e
        .join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("__rh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hm = rawHub.agg(greatest(max(col("__rh")), lit(1L)).as("__hm"))
      val hub = rawHub.crossJoin(broadcast(hm))
        .select(col("node"),
          expr(s"__rh div (CASE WHEN __hm div $scale < 1 THEN 1 " +
            s"ELSE __hm div $scale END)").as("hub"))
      val prev = scores
      scores = nodes
        .join(hub, Seq("node"), "left")
        .join(auth, Seq("node"), "left")
        .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
          coalesce(col("auth"), lit(0L)).as("auth"))
        .localCheckpoint()
      rawAuth.unpersist(blocking = true)
      rawHub.unpersist(blocking = true)
      prev.unpersist(blocking = true)
    }
    e.unpersist(blocking = true)
    nodes.unpersist(blocking = true)
    scores
  }
}

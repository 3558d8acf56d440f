package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Adversarial-scale guards for the LSH dedup path (the PlanAuditSpec of
  * the skew story): a boilerplate mega-cluster must not turn candidate
  * pairing quadratic (bucket cap), and when a hot band bucket IS paired,
  * AQE's skew-join must split it instead of leaving one straggler
  * partition. ScaleBench runs the same shapes at >=100x sf0.1.
  */
class DedupScaleSpec extends SparkTestBase {

  /** nHot identical boilerplate docs + nCold distinct docs (unique texts,
    * near-unique band keys). */
  private def skewedCorpus(nHot: Int, nCold: Int) = {
    val s = spark; import s.implicits._
    val hot = (0 until nHot).map(i =>
      (i.toLong, "shared boilerplate header terms of service apply to all"))
    val cold = (0 until nCold).map(i =>
      (100000L + i, s"unique document body $i with distinct content token${i % 97} tail$i"))
    (hot ++ cold).toDF("doc_id", "text")
  }

  test("maxBucketSize cap: mega-cluster is excluded from pairing, small clusters kept") {
    val s = spark; import s.implicits._
    // hot: 500 identical docs (every band bucket holds all 500);
    // cold: 40 clusters of 5 near-dups (trailing token differs)
    val hot = (0 until 500).map(i =>
      (i.toLong, "shared boilerplate header terms of service apply to all"))
    // per-cluster tokens carry the cluster id so shingles are disjoint
    // ACROSS clusters (shared only within a cluster, bar the rev token)
    val cold = for (c <- 0 until 40; r <- 0 until 5)
      yield (10000L + c * 10 + r,
        s"cluster$c alpha$c beta$c gamma$c delta$c epsilon$c zeta$c rev$r")
    val df = (hot ++ cold).toDF("doc_id", "text")
    val capped = Dedup.lshCandidatePairs(df, "doc_id", "text",
      maxBucketSize = Some(64)).cache()
    try {
      // no pair touches the hot cluster (ids < 10000)
      assert(capped.where(col("id1") < 10000L || col("id2") < 10000L).count() == 0,
        "mega-cluster leaked into pairing despite the cap")
      // small near-dup clusters still pair (each 5-clique <= cap)
      val coldPairs = capped.count()
      assert(coldPairs > 0, "cap dropped legitimate small buckets")
      // hard bound: B docs in <= cap buckets can emit at most C(cap,2)
      // pairs per bucket; the uncapped corpus would exceed this by the
      // hot cluster's C(500,2) = 124750 alone
      assert(coldPairs <= 40L * 10, s"unexpected pair blowup: $coldPairs")
    } finally { capped.unpersist(); () }
  }

  test("winnowingOverlapPairs: cap drops ubiquitous grams, still pairs near-dups") {
    val s = spark; import s.implicits._
    // every doc shares one boilerplate sentence (ubiquitous grams); only
    // docs within a near-dup cluster share most of their body
    val boiler = "all rights reserved terms of service apply everywhere"
    val docs = (for (c <- 0 until 12; r <- 0 until 3) yield
      (c * 10L + r, s"$boiler body$c alpha$c beta$c gamma$c delta$c " +
        s"epsilon$c zeta$c eta$c theta$c rev$r")).toDF("doc_id", "text")
    val pairs = Dedup.winnowingOverlapPairs(docs, "doc_id", "text",
      minSim = 0.3, maxBucketSize = Some(8)).cache()
    try {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // within-cluster pairs found, no cross-cluster pairs (boilerplate
      // grams land in all 36 docs -> capped out of both sides of the sim)
      assert(got.nonEmpty, "cap destroyed legitimate near-dup pairs")
      assert(got.forall { case (a, b) => a / 10 == b / 10 },
        s"boilerplate grams leaked cross-cluster pairs: $got")
    } finally { pairs.unpersist(); () }
  }

  test("AQE skew-join engages on a hot band bucket (uncapped pairing)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force sort-merge (no broadcast) and lower the skew thresholds to
      // test scale — the same detection a 100TB hot bucket trips at the
      // 256MB defaults
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // enough partitions that the hot bucket's partition stands out from
      // the median (at 4, the 4 hot band keys hash-balance and hide)
      conf.set("spark.sql.shuffle.partitions", "32")
      val df = skewedCorpus(nHot = 3000, nCold = 800)
      // the lazy form: the public wrapper eagerly checkpoints (cache
      // hygiene), which replaces the returned plan with an RDD scan —
      // the adaptive join plan must be inspected before materialization
      val (cands, sig) = Dedup.lshCandidatePairsLazy(df, "doc_id", "text")
      try {
        val qe = cands.queryExecution
        qe.toRdd.count() // execute the adaptive plan to its final form
        val plan = qe.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"skew-join did not engage; final plan:\n$plan")
      } finally { sig.unpersist(blocking = true); () }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

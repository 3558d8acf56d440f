package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample: deterministic, partitioning-independent, ~rate sized") {
    val a = Sampling.hashSample(docs, "doc_id", 0.4, "t1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.4, "t1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    val n = docs.count().toDouble
    assert(a.size > n * 0.2 && a.size < n * 0.6, s"rate off: ${a.size}/$n")
    // rate 1.0 keeps everything; rate 0.0 keeps nothing
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n.toLong)
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0L)
  }

  test("nested rates with one salt: the 0.1 sample is a subset of the 0.5 sample") {
    val small = Sampling.hashSample(docs, "doc_id", 0.1, "t2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, "doc_id", 0.5, "t2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "samples under one salt must nest")
    // a different salt draws an (almost surely) different sample
    val other = Sampling.hashSample(docs, "doc_id", 0.5, "t3")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != big)
  }

  test("stratifiedHashSample applies per-stratum rates; filter stays map-side") {
    val out = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 0.0), defaultRate = 1.0, salt = "t4")
    assert(out.where(col("lang") === "en").count() == 0L)
    assert(out.count() == docs.where(col("lang") =!= "en").count())
    // no exchange: sampling is one scan + filter at any scale
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("stratifiedHashSample: rate 1.0 keeps a stratum EXACTLY (no strict-< edge)") {
    // rate >= 1.0 must short-circuit to true like hashSample does — a
    // strict < 'ffffffff' compare drops hash-0xffffffff keys
    val out = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0, salt = "t5")
    assert(out.count() == docs.where(col("lang") === "en").count())
    val all = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 1.0, salt = "t5")
    assert(all.count() == docs.count())
  }

  test("stratifiedTake: exactly n per stratum, deterministic, nested, " +
    "rank filter pushed map-side") {
    val out = Sampling.stratifiedTake(docs, "doc_id", "lang", n = 5, salt = "t6")
    val perLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 5L))
    val bigStrata = docs.groupBy("lang").count()
      .collect().filter(_.getLong(1) >= 5).map(_.getString(0))
    bigStrata.foreach(l => assert(perLang(l) == 5L, s"stratum $l: $perLang"))
    // partitioning-independent + nested: 3-take is a prefix of the 5-take
    val ids5 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids5b = Sampling.stratifiedTake(docs.repartition(7), "doc_id", "lang",
      n = 5, salt = "t6").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids5 == ids5b)
    val ids3 = Sampling.stratifiedTake(docs, "doc_id", "lang", n = 3,
      salt = "t6").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids3.subsetOf(ids5))
    // the rank<=n filter must reach the map side (per-partition top-n
    // before the shuffle), or a billion-row stratum would sort fully
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side WindowGroupLimit:\n$plan")
  }

  test("diversityTake flattens density skew: dense cell capped at n, " +
    "sparse cell kept whole; deterministic across partitioning") {
    val s = spark; import s.implicits._
    // 50 points near the origin, 3 near (10,10): a plain 16% sample
    // would keep ~8 dense / ~0.5 sparse; the per-cell take keeps 5 + 3
    val dense = (1L to 50L).map(i =>
      (i, Array(0.1f * (i % 5), 0.1f * (i % 7))))
    val sparse = (101L to 103L).map(i => (i, Array(10f, 10f)))
    val emb = (dense ++ sparse).toDF("vec_id", "embedding")
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val out = Sampling.diversityTake(emb, "vec_id", "embedding", cents,
      nPerCell = 5, salt = "d")
    val perCell = out.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCell == Map(0 -> 5L, 1 -> 3L), s"got $perCell")
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.diversityTake(emb.repartition(7), "vec_id",
        "embedding", cents, nPerCell = 5, salt = "d")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2, "must be partitioning-independent")
    assert(sparse.map(_._1).toSet.subsetOf(ids), "sparse cell kept whole")
  }

  test("mixTake: exact target composition, bottleneck stratum kept whole, " +
    "deterministic, absent strata dropped, bad specs rejected") {
    val s = spark; import s.implicits._
    // a: 100 rows, b: 30, c: 50, d: 10 (d not in targets -> dropped)
    val rows = (1L to 100L).map(i => (i, "a")) ++
      (101L to 130L).map(i => (i, "b")) ++ (131L to 180L).map(i => (i, "c")) ++
      (181L to 190L).map(i => (i, "d"))
    val df = rows.toDF("id", "g")
    // weights 2/1/1 -> p = 0.5/0.25/0.25; N = min(100/.5, 30/.25, 50/.25)
    //   = min(200, 120, 200) = 120 -> cuts a=60, b=30 (whole), c=30
    val out = Sampling.mixTake(df, "id", "g",
      Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
    val byG = out.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1).toSet }
    assert(byG.view.mapValues(_.size).toMap == Map("a" -> 60, "b" -> 30, "c" -> 30))
    assert(byG("b") == (101L to 130L).toSet, "bottleneck stratum kept whole")
    // deterministic and partitioning-independent
    val again = Sampling.mixTake(df.repartition(7), "id", "g",
        Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // the literal max-cutoff conjunct keeps the rank filter map-side
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a map-side WindowGroupLimit in:\n$plan")
    intercept[IllegalArgumentException](
      Sampling.mixTake(df, "id", "g", Map.empty[String, Double]))
    intercept[IllegalArgumentException](
      Sampling.mixTake(df, "id", "g", Map("a" -> -1.0)))
    intercept[IllegalArgumentException]( // stratum with zero rows
      Sampling.mixTake(df, "id", "g", Map("a" -> 1.0, "zz" -> 1.0)))
  }

  test("mixTake: non-string strata column (int source id) works — counts " +
    "cast instead of ClassCastException") {
    val s = spark; import s.implicits._
    // source ids as INTs; targets keyed by their string forms
    val rows = (1L to 40L).map(i => (i, 1)) ++ (41L to 60L).map(i => (i, 2))
    val df = rows.toDF("id", "src")
    val out = Sampling.mixTake(df, "id", "src", Map("1" -> 1.0, "2" -> 1.0))
    val byG = out.collect().groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    // p = 0.5/0.5; N = min(40/.5, 20/.5) = 40 -> 20 per stratum
    assert(byG == Map(1 -> 20, 2 -> 20), s"got $byG")
  }

  test("temperatureSample: sqrt smoothing upsamples the tail relative to " +
    "the head; rates match the integer-exact formula; deterministic") {
    val s = spark; import s.implicits._
    // head stratum 400 rows, tail 25: proportional rates would be equal;
    // sqrt weights w=20/5, W=25 -> rate_head = min(1, 100*20/(25*400)) = 0.2,
    // rate_tail = min(1, 100*5/(25*25)) = 0.8 -> tail KEEP RATE 4x head
    val rows = (1L to 400L).map(i => (i, "head")) ++
      (401L to 425L).map(i => (i, "tail"))
    val df = rows.toDF("id", "g")
    val out = Sampling.temperatureSample(df, "id", "g", totalTarget = 100,
      salt = "t")
    val byG = out.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val headRate = byG.getOrElse("head", 0).toDouble / 400
    val tailRate = byG.getOrElse("tail", 0).toDouble / 25
    assert(tailRate > 2 * headRate,
      s"sqrt smoothing must upsample the tail: head=$headRate tail=$tailRate")
    // exact-rate replay: the kept sets are exactly the hash-threshold sets
    val expHead = Sampling.hashSample(df.where($"g" === "head"), "id", 0.2, "t")
      .collect().map(_.getLong(0)).toSet
    val expTail = Sampling.hashSample(df.where($"g" === "tail"), "id", 0.8, "t")
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet == expHead ++ expTail)
    // deterministic + partitioning-independent
    assert(Sampling.temperatureSample(df.repartition(7), "id", "g", 100, "t")
      .collect().map(_.getLong(0)).toSet == expHead ++ expTail)
    intercept[IllegalArgumentException](
      Sampling.temperatureSample(df, "id", "g", totalTarget = 0))
  }

  test("rateThreshold: hex space endpoints and monotonicity") {
    assert(Sampling.rateThreshold(0.0) == "00000000")
    assert(Sampling.rateThreshold(1.0) == "ffffffff")
    assert(Sampling.rateThreshold(0.5) == "80000000")
    intercept[IllegalArgumentException](Sampling.rateThreshold(1.5))
    val ts = Seq(0.1, 0.25, 0.5, 0.9).map(Sampling.rateThreshold)
    assert(ts == ts.sorted)
  }
}

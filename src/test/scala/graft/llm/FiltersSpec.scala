package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkTestBase {

  private def verdicts(docs: Seq[(Long, String)]): Map[Long, String] = {
    val s = spark; import s.implicits._
    Filters.funnel(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("id"), col("verdict"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("each default gate catches its own shape; clean docs keep") {
    val out = verdicts(Seq(
      (1L, "too few words."),                                        // 3 toks
      (2L, "a doc with one gigantic " +
        "pneumonoultramicroscopicsilicovolcanoconiosisword in it."), // 45-char token
      (3L, "@@@ ### $$$ %%% ^^^ &&& !!! ??? ((( ))) mostly symbols aaaaaaaa" +
        "aaaaaaaaaaaaaaa here."),                                    // sym ratio
      (4L, "THIS ENTIRE DOCUMENT IS SHOUTING AT THE READER VERY LOUDLY."),
      (5L, "this one just trails off with no terminal punctuation at all"),
      (6L, "This document is a perfectly ordinary paragraph of prose. " +
        "It ends like a sentence should end.")))
    assert(out(1L) == "too_short", s"got ${out(1L)}")
    assert(out(2L) == "long_token", s"got ${out(2L)}")
    assert(out(3L) == "symbolic", s"got ${out(3L)}")
    assert(out(4L) == "shouting", s"got ${out(4L)}")
    assert(out(5L) == "no_terminal_punct", s"got ${out(5L)}")
    assert(out(6L) == "kept", s"got ${out(6L)}")
  }

  test("verdict is the FIRST failing gate: a doc failing several gates " +
    "attributes to the earliest, so funnel counts sum to corpus size") {
    // 2 tokens AND all-caps AND no terminal punct -> too_short wins
    val out = verdicts(Seq((1L, "HELLO THERE")))
    assert(out(1L) == "too_short", s"got ${out(1L)}")
    // long token AND shouting -> long_token (earlier) wins
    val out2 = verdicts(Seq(
      (2L, "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAA LOUD BROKEN TOKEN DOC HERE.")))
    assert(out2(2L) == "long_token", s"got ${out2(2L)}")
  }

  test("feature vector is hand-exact; empty doc: null max_tok_len gates " +
    "skip under three-valued logic and too_short catches it") {
    val s = spark; import s.implicits._
    val r = Filters.funnel(Seq((1L, "Ab c3 d!")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    // toks: Ab, c3, d! -> 3; max len 2; chars 8; sym: ! -> 1;
    // upper: A -> 1; alpha: A,b,c,d -> 4; ends with ! -> true
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("max_tok_len") == 2L)
    assert(r.getAs[Long]("n_chars") == 8L)
    assert(r.getAs[Long]("n_sym") == 1L)
    assert(r.getAs[Long]("n_upper") == 1L)
    assert(r.getAs[Long]("n_alpha") == 4L)
    assert(r.getAs[Boolean]("ends_sentence"))
    assert(r.getAs[String]("verdict") == "too_short")
    val e = Filters.funnel(Seq((2L, "")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(e.isNullAt(e.fieldIndex("max_tok_len")))
    assert(e.getAs[String]("verdict") == "too_short")
  }

  test("funnel plan: one projection over the scan — zero exchanges") {
    val s = spark; import s.implicits._
    val docs = (1L to 50L).map(i => (i, s"doc number $i with text."))
      .toDF("doc_id", "text")
    val out = Filters.funnel(docs, "doc_id", "text")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"funnel must be map-side:\n$p")
  }

  test("qualityMargin: hand-computed left-to-right fold for fixed weights; " +
    "map-side plan; weight arity enforced") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "Hi there."), (2L, "")).toDF("doc_id", "text")
    // features doc1: n_tokens=2, max_tok_len=6, n_chars=9, n_sym=1
    // (the '.'), n_upper=1, n_alpha=7; doc2: all 0
    val w = Array(0.5, -0.25, 0.125, 1.0, -1.0, 0.0625)
    val out = Filters.qualityMargin(df, "doc_id", "text", w, intercept = 2.0)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getDouble(7), r.getBoolean(8)))).toMap
    val m1 = ((((((2.0 + 0.5 * 2) + -0.25 * 6) + 0.125 * 9) + 1.0 * 1)
      + -1.0 * 1) + 0.0625 * 7)
    assert(rows(1L) == ((m1, m1 > 0)), s"got ${rows(1L)} want $m1")
    assert(rows(2L) == ((2.0, true)))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"qualityMargin must be map-side:\n$p")
    intercept[IllegalArgumentException] {
      Filters.qualityMargin(df, "doc_id", "text", Array(1.0), 0.0)
    }
  }

  test("fitQualityModel separates an obviously separable weak label and " +
    "the frozen scorer agrees with the model's sign") {
    val s = spark; import s.implicits._
    // long clean docs labeled true, short ones false — linearly separable
    // on n_tokens alone
    val docs = ((1L to 30L).map(i => (i, ("word " * 40).trim, true)) ++
      (31L to 60L).map(i => (i, "a b", false))).toDF("doc_id", "text", "good")
    val (w, b) = Filters.fitQualityModel(docs, "text", col("good"))
    assert(w.length == 6)
    val scored = Filters.qualityMargin(docs, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    (1L to 30L).foreach(i => assert(scored(i), s"doc $i should score positive"))
    (31L to 60L).foreach(i => assert(!scored(i), s"doc $i should score negative"))
  }

  test("hashedBowMargin: margin equals a JVM-side replay of the bucket " +
    "hash and left fold; empty doc scores exactly the intercept") {
    val s = spark; import s.implicits._
    val w = Array.tabulate(8)(i => (i + 1) * 0.125)
    val b = -0.5
    def bucket(term: String, dim: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bow1|$term".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    val docs = Seq((1L, "Alpha beta beta gamma"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val out = Filters.hashedBowMargin(docs, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val expect1 = Seq("alpha", "beta", "beta", "gamma")
      .foldLeft(b)((acc, t) => acc + w(bucket(t, 8)))
    assert(out(1L) == ((4L, expect1)), s"got ${out(1L)} want $expect1")
    assert(out(2L) == ((0L, b)) && out(3L) == ((0L, b)),
      "tokenless docs fold nothing: margin is the bare intercept")
  }

  test("hashedBowMargin plan is map-side (zero exchanges); " +
    "fitHashedBowModel separates a separable label and the frozen " +
    "scorer agrees in sign") {
    val s = spark; import s.implicits._
    val plan = Filters.hashedBowMargin(
      Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text",
      Array(0.1, 0.2), 0.0).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    // two disjoint vocabularies => linearly separable bucket counts
    val good = (0 until 40).map(i => (i.toLong, "solid prose words here", 1))
    val bad = (40 until 80).map(i => (i.toLong, "zz9 qqq7 xxx8 kkk3", 0))
    val df = (good ++ bad).toDF("doc_id", "text", "y")
    val (w, b) = Filters.fitHashedBowModel(df, "text", col("y") === 1,
      dim = 16)
    assert(w.length == 16)
    val scored = Filters.hashedBowMargin(df, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert((0 until 40).forall(i => scored(i.toLong)) &&
      (40 until 80).forall(i => !scored(i.toLong)),
      "frozen margins must separate the two vocabularies")
  }

  test("calibrateScores: hand-checked percent_rank with ties and a " +
    "singleton stratum; matches Spark's own window percent_rank") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "a", 30L), (5L, "b", 5L)).toDF("id", "src", "q")
    val out = Filters.calibrateScores(df, "id", "src", "q")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // a: ties at 10 share n_below=0; 20 has 2 below of n-1=3; 30 is max
    assert(out(1L) == ((0L, 4L, 0.0)) && out(2L) == ((0L, 4L, 0.0)))
    assert(out(3L) == ((2L, 4L, 2.0 / 3.0)), s"got ${out(3L)}")
    assert(out(4L) == ((3L, 4L, 1.0)))
    assert(out(5L) == ((0L, 1L, 0.0)), "singleton stratum pins pct 0.0")
    // bit-identical to the engine's own sorting formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("q"))
    val direct = df.select(col("id"), percent_rank().over(w).as("pr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.forall { case (id, (_, _, pct)) => pct == direct(id) })
  }

  test("calibrateScores plan: docs join the histogram by BROADCAST and " +
    "no window touches the per-doc frame; float scores rejected") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("id", "src", "q")
    val plan = Filters.calibrateScores(df, "id", "src", "q")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected the histogram side broadcast in:\n$plan")
    // the only Window sits below the join's broadcast (histogram) side:
    // its child chain must contain the hash aggregate, never the raw scan
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("BroadcastExchange") < winIdx,
      s"window must be on the broadcast (histogram) branch:\n$plan")
    val bad = Seq((1L, "a", 1.5)).toDF("id", "src", "q")
    val e = intercept[IllegalArgumentException](
      Filters.calibrateScores(bad, "id", "src", "q"))
    assert(e.getMessage.contains("integral"))
  }

  test("gate table is validated: empty, duplicate names, reserved 'kept'") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Filters.funnel(df, "doc_id", "text", gates = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Filters.funnel(df, "doc_id", "text", gates = Seq(
        Filters.Gate("a", "n_tokens < 1"), Filters.Gate("a", "n_chars < 1")))
    }
    intercept[IllegalArgumentException] {
      Filters.funnel(df, "doc_id", "text", gates = Seq(
        Filters.Gate("kept", "n_tokens < 1")))
    }
  }
}

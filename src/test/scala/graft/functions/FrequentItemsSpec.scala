package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkTestBase {

  private def termRows(counts: Map[String, Int]) = {
    val s = spark; import s.implicits._
    // interleave terms deterministically so no term arrives in one run
    counts.toSeq.sortBy(_._1)
      .flatMap { case (t, n) => Seq.tabulate(n)(i => (i, t)) }
      .sortBy(_._1).map(_._2).toDF("term")
  }

  test("exact regime: capacity >= distinct terms reproduces GROUP BY counts " +
    "at any partitioning") {
    val counts = Map("a" -> 50, "b" -> 30, "c" -> 12, "d" -> 5, "e" -> 3)
    for (parts <- Seq(1, 7)) {
      val got = termRows(counts).repartition(parts)
        .agg(FrequentItems.frequentItems(col("term"), capacity = 8).as("it"))
        .select(explode(col("it")).as("x"))
        .select(col("x.term"), col("x.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(got.toMap == counts.map { case (k, v) => k -> v.toLong },
        s"at parts=$parts")
      // output order is (count desc, term asc)
      assert(got.map(_._1).toSeq == Seq("a", "b", "c", "d", "e"))
    }
  }

  test("sketch regime: undercount bounded by N/(capacity+1), every " +
    "above-threshold term present, sketch never exceeds capacity") {
    // 1000 elements: two genuinely heavy terms + 100 singletons of noise
    val counts = Map("heavy1" -> 500, "heavy2" -> 400) ++
      (1 to 100).map(i => s"noise$i" -> 1).toMap
    val n = counts.values.sum
    val cap = 4
    val bound = n / (cap + 1)
    for (parts <- Seq(1, 7)) {
      val got = termRows(counts).repartition(parts)
        .agg(FrequentItems.frequentItems(col("term"), capacity = cap).as("it"))
        .select(explode(col("it")).as("x"))
        .select(col("x.term"), col("x.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size < 2 * cap, s"sketch overflow: ${got.size} >= ${2 * cap}")
      // guarantee 1: any term with true freq > N/(cap+1) is present
      counts.filter(_._2 > bound).keys.foreach(t =>
        assert(got.contains(t), s"missing guaranteed heavy hitter $t ($got)"))
      // guarantee 2: reported counts never overcount and undercount by
      // at most the bound
      got.foreach { case (t, c) =>
        val truth = counts(t).toLong
        assert(c <= truth, s"$t overcounted: $c > $truth")
        assert(c >= truth - bound, s"$t undercounted past the bound")
      }
    }
  }

  test("SQL surface graft_frequent_items matches the Column API") {
    val s = spark; import s.implicits._
    termRows(Map("x" -> 9, "y" -> 4, "z" -> 2))
      .createOrReplaceTempView("fi_terms")
    val viaSql = spark.sql(
      """SELECT x.term, x.count
        |FROM (SELECT graft_frequent_items(term, 8) AS it FROM fi_terms)
        |LATERAL VIEW explode(it) AS x""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(viaSql == Seq("x" -> 9L, "y" -> 4L, "z" -> 2L))
    // literal-capacity contract: a non-literal capacity is rejected
    val err = intercept[Exception](spark.sql(
      "SELECT graft_frequent_items(term, length(term)) FROM fi_terms").collect())
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.toLowerCase.contains("capacity"))
  }

  test("grouped sketches stay per-group; null terms are skipped") {
    val s = spark; import s.implicits._
    val df = Seq(("g1", Some("a")), ("g1", Some("a")), ("g1", None),
      ("g2", Some("b"))).toDF("g", "term")
    val got = df.groupBy(col("g"))
      .agg(FrequentItems.frequentItems(col("term"), 4).as("it"))
      .select(col("g"), explode(col("it")).as("x"))
      .select(col("g"), col("x.term"), col("x.count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("g1", "a", 2L), ("g2", "b", 1L)))
  }

  test("bad capacity rejected") {
    intercept[IllegalArgumentException](
      FrequentItems.frequentItems(col("term"), 0))
  }

  test("streaming: sketch state accumulates across micro-batches through " +
    "the state store (complete mode)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("term")
      .groupBy().agg(FrequentItems.frequentItems(col("term"), 8).as("it"))
      .select(explode(col("it")).as("x"))
      .select(col("x.term"), col("x.count"))
    val q = agg.writeStream.format("memory").queryName("fi_stream_out")
      .outputMode("complete").start()
    try {
      input.addData("a", "a", "b")
      q.processAllAvailable()
      val b1 = spark.table("fi_stream_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(b1 == Map("a" -> 2L, "b" -> 1L), s"batch 1: $b1")
      // second micro-batch MERGES into the stored sketch (serialize/
      // deserialize round-trip through the state store), not a restart
      input.addData("a", "c", "c", "c")
      q.processAllAvailable()
      val b2 = spark.table("fi_stream_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(b2 == Map("a" -> 3L, "c" -> 3L, "b" -> 1L), s"batch 2: $b2")
    } finally q.stop()
  }
}

package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SetSimSpec extends SparkTestBase {

  /** Seeded random docs over a small vocab — enough collisions that the
    * prefix filter actually prunes, enough variety that losing a
    * candidate would show. */
  private def corpus(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    Seq.tabulate(n) { i =>
      val len = 3 + rnd.nextInt(10)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("setSimilarityJoin is lossless: exactly the naive quadratic " +
    "pair set at several thresholds, intersection counts included") {
    val s = spark; import s.implicits._
    val docs = corpus(60, seed = 7L).toDF("doc_id", "text")
    def naive(num: Int, den: Int): Set[Seq[Any]] = {
      val sets = docs.collect()
        .map(r => r.getLong(0) ->
          r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSet)
        .toMap
      (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size
        if (den + num) * inter >= num * (sets(a).size + sets(b).size)
      } yield Seq(a, b, inter.toLong, sets(a).size.toLong,
        sets(b).size.toLong)).toSet
    }
    for ((num, den) <- Seq((7, 10), (1, 2), (9, 10))) {
      val got = Dedup.setSimilarityJoin(docs, "doc_id", "text", num, den)
        .collect().map(_.toSeq).toSet
      assert(got == naive(num, den), s"threshold $num/$den")
    }
  }

  test("setSimilarityJoinCost: prefix_rows matches the hand-derived " +
    "per-doc prefix lengths; the candidate bound dominates the " +
    "qualifying pair count") {
    val s = spark; import s.implicits._
    val docs = corpus(60, seed = 7L).toDF("doc_id", "text")
    val cost = Dedup.setSimilarityJoinCost(docs, "doc_id", "text", 7, 10)
      .head()
    // independent derivation of the prefix mass: per doc,
    // n - ceil(0.7 n) + 1 rows enter the prefix
    val expectedPrefixRows = docs.collect().map { r =>
      val n = r.getString(1).toLowerCase.split(" ")
        .filter(_.nonEmpty).toSet.size.toLong
      n - ((7 * n + 9) / 10) + 1
    }.sum
    assert(cost.getLong(0) == expectedPrefixRows)
    assert(cost.getLong(1) <= cost.getLong(0)) // max pdf <= total rows
    val pairs = Dedup.setSimilarityJoin(docs, "doc_id", "text", 7, 10)
      .count()
    assert(cost.getLong(2) >= pairs,
      s"bound ${cost.getLong(2)} must dominate the $pairs qualifying pairs")
  }

  test("setSimilarityJoin: t=1 degenerates to identical token sets only") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "c b a a"),   // same SET, different multiset
      (3L, "a b"), (4L, "x y z")).toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(docs, "doc_id", "text", 1, 1)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}

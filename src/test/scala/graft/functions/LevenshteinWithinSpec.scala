package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LevenshteinWithinSpec extends SparkTestBase {

  test("levenshteinWithin: parity with Spark's built-in levenshtein(a,b,k) " +
    "on a seeded random corpus incl. empties, ties at k, and k=0") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(99)
    val alpha = "abcde"
    def str() = {
      val n = rnd.nextInt(25)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val rows = (1 to 400).map(_ => (str(), str())) ++ Seq(
      ("", ""), ("", "abc"), ("abc", ""),
      ("same same same", "same same same"),
      // shared prefix+suffix, small middle edit (the strip path)
      ("prefix MIDDLE suffix", "prefix MUDDLE suffix"))
    for (k <- Seq(0, 1, 3, 7)) {
      val df = rows.toDF("a", "b")
        .withColumn("builtin", levenshtein(col("a"), col("b"), k))
        .withColumn("ours",
          graft.llm.Dedup.levenshteinWithin(col("a"), col("b"), k))
      val bad = df.where(col("builtin") =!= col("ours")).collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.take(5).mkString(";")}")
    }
  }

  test("levenshteinWithin: unicode code points and nulls behave like the " +
    "built-in") {
    val s = spark; import s.implicits._
    val rows = Seq(("héllo wörld", "hello world"), ("日本語テキスト", "日本語テキスト"),
      ("日本語テキスト", "日本語テクスト"), (null, "x"), ("x", null))
    val df = rows.toDF("a", "b")
      .withColumn("builtin", levenshtein(col("a"), col("b"), 4))
      .withColumn("ours",
        graft.llm.Dedup.levenshteinWithin(col("a"), col("b"), 4))
    val got = df.collect().map(r =>
      (if (r.isNullAt(2)) null else r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3)))
    assert(got.forall(p => p._1 == p._2), s"got ${got.mkString(";")}")
  }
}

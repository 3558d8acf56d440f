package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  private def one(text: String) = {
    val s = spark; import s.implicits._
    Seq(Tuple1(text)).toDF("text")
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

  test("regexTokens splits words, numbers and symbols") {
    val r = one("ab12 cd, ef!").select(TextAnalysis.regexTokens(col("text")))
      .head().getSeq[String](0)
    assert(r.contains("ab12") && r.contains(",") && r.contains("!"))
  }
}

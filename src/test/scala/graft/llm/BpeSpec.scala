package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {

  private def train(words: Seq[(String, Long)], n: Int) = {
    import spark.implicits._
    Bpe.trainMerges(words.toDF("word", "freq"), n)
  }

  test("hand-computed fixture: counts weight by freq, merges chain " +
    "through rounds, training stops when pairs run out") {
    // r1: (a,b) = 2*3 + 2 = 8 beats (b,a) = 3+1 = 4
    // r2: (ab,ab) = 3; r3: (b,a) = 1; r4: exhausted
    val got = train(Seq(("abab", 3L), ("ab", 2L), ("ba", 1L),
      ("x", 5L)), 5)
    assert(got == Seq(Bpe.Merge(1, "a", "b", 8L),
      Bpe.Merge(2, "ab", "ab", 3L), Bpe.Merge(3, "b", "a", 1L)),
      s"$got")
  }

  test("greedy left-to-right non-overlap: 'aaa' under (a,a) becomes " +
    "[aa, a] — the fresh merge never re-matches as the left symbol") {
    val got = train(Seq(("aaa", 1L)), 3)
    assert(got == Seq(Bpe.Merge(1, "a", "a", 2L),
      Bpe.Merge(2, "aa", "a", 1L)), s"$got")
  }

  test("count ties break to the lexicographically smallest (l, r)") {
    val got = train(Seq(("cd", 2L), ("ab", 2L)), 1)
    assert(got == Seq(Bpe.Merge(1, "a", "b", 2L)), s"$got")
  }

  test("applyMerges tokenizes with the trained table — reproduces the " +
    "trainer's own final symbol state on the training corpus") {
    val s = spark; import s.implicits._
    val corpus = Seq(("abab", 3L), ("ab", 2L), ("ba", 1L), ("x", 5L))
    val merges = train(corpus, 5)
    val toks = corpus.toDF("word", "freq")
      .select(col("word"), Bpe.applyMerges("word", merges).as("sym"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(toks == Map("abab" -> List("abab"), "ab" -> List("ab"),
      "ba" -> List("ba"), "x" -> List("x")), s"$toks")
  }

  test("wordCorpus: whitespace split, empties dropped, exact freqs") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the cat  the hat"), (2L, " the ")).toDF("id", "text")
    val got = Bpe.wordCorpus(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 3L, "cat" -> 1L, "hat" -> 1L), s"$got")
  }
}

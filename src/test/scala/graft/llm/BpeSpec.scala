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

  test("driver tier == distributed tier: identical merge tables on a " +
    "fixture with ties, chained merges, repeats, and early exhaustion") {
    val s = spark; import s.implicits._
    val corpus = Seq(("abab", 3L), ("ab", 2L), ("ba", 1L), ("x", 5L),
      ("aaa", 4L), ("cd", 2L), ("banana", 2L), ("bandana", 1L))
    val df = corpus.toDF("word", "freq")
    val dist = Bpe.trainMerges(df, 12)
    val local = Bpe.trainMergesAuto(df, 12) // vocab of 8 → driver tier
    assert(local == dist, s"driver tier diverged:\n$local\nvs\n$dist")
    // and above the bound the auto tier falls back to the distributed
    // loop — same table either way
    assert(Bpe.trainMergesAuto(df, 12, vocabRowBound = 2L) == dist)
  }

  test("driver tier tie-break is UTF-8 binary order (Spark's), not " +
    "Java UTF-16 order — supplementary vs U+FFFD disagree between them") {
    // U+10000 (surrogate pair, UTF-16 first unit 0xD800) sorts BEFORE
    // U+FFFD under Java compareTo but AFTER under UTF-8 bytes
    val supp = new String(Character.toChars(0x10000))
    assert(Bpe.utf8Less("\uFFFD", supp) && !Bpe.utf8Less(supp, "\uFFFD"))
    assert(supp.compareTo("\uFFFD") < 0) // the JVM default disagrees
    val s = spark; import s.implicits._
    // two pairs with equal counts whose left symbols are exactly those
    // code points: both tiers must pick the UTF-8-smaller one
    val df = Seq(supp + "a", "\uFFFDb").toDF("word")
      .withColumn("freq", lit(1L))
    val dist = Bpe.trainMerges(df, 1)
    val local = Bpe.trainMergesAuto(df, 1)
    assert(dist == local && dist.head.lhs == "\uFFFD", s"$dist vs $local")
  }

  test("vocab snapshot: freeze → reload round-trips the merge table " +
    "bit-identically, a retrain lands a new version with the pinned " +
    "read unchanged, an empty table is refused") {
    val s = spark; import s.implicits._
    val merges = train(Seq(("abab", 3L), ("ab", 2L), ("ba", 1L)), 3)
    val store = tmpDir("bpe-vocab") + "/vocab"
    assert(Bpe.writeVocabSnapshot(spark, store, merges) == 1L)
    assert(Bpe.readVocabSnapshot(spark, store) == merges)
    val retrained = train(Seq(("xyxy", 9L)), 3)
    assert(Bpe.writeVocabSnapshot(spark, store, retrained) == 2L)
    assert(Bpe.readVocabSnapshot(spark, store, Some(1L)) == merges,
      "the pinned version must keep serving the original table")
    assert(Bpe.readVocabSnapshot(spark, store) == retrained)
    intercept[IllegalArgumentException] {
      Bpe.writeVocabSnapshot(spark, store, Seq.empty)
    }
  }

  test("wordCorpus: whitespace split, empties dropped, exact freqs") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the cat  the hat"), (2L, " the ")).toDF("id", "text")
    val got = Bpe.wordCorpus(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 3L, "cat" -> 1L, "hat" -> 1L), s"$got")
  }
}

package graft.core

import graft.SparkTestBase

class RetrySpec extends SparkTestBase {

  test("succeeds after transient failures, reporting each retry") {
    var calls = 0
    val retries = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = Retry(attempts = 4, backoffMs = 1,
      onRetry = (i, _) => retries += i) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"flake $calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(retries.toSeq == Seq(1, 2))
  }

  test("exhausted attempts rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException](Retry(attempts = 3, backoffMs = 1) {
      calls += 1; throw new RuntimeException(s"fail $calls")
    })
    assert(e.getMessage == "fail 3" && calls == 3)
  }

  test("CharGramMd5 expression matches the composable transform form exactly") {
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val df = Seq("hello world, this is a test", "short", "ü-nicode ßtring here", "")
      .toDF("t")
    val k = 8
    val composable = {
      val t = col("t")
      transform(sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
        i => md5(t.substr(i, lit(k))))
    }
    val diffs = df.select(
      graft.llm.TextAnalysis.charGramHashes(col("t"), k).as("fast"),
      composable.as("slow"))
      .where(col("fast") =!= col("slow")).count()
    assert(diffs == 0)
  }

  test("winnowing fingerprints overlap for locally-edited docs") {
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox leaps over the lazy dog tonight"), // one word edit
      (3L, "completely unrelated content about data engines")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      graft.llm.TextAnalysis.winnowingFingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val j12 = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).union(fps(2L)).size
    val j13 = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).union(fps(3L)).size
    assert(j12 > 0.3, s"local edit destroyed fingerprints (overlap $j12)")
    assert(j13 < 0.1, s"unrelated docs share fingerprints ($j13)")
    // deterministic: recompute equals
    val again = df.where("doc_id = 1").select(
      graft.llm.TextAnalysis.winnowingFingerprints(col("text")))
      .head().getSeq[String](0).toSet
    assert(again == fps(1L))
  }
}

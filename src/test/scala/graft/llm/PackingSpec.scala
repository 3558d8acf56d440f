package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {

  private def docs = {
    val s = spark; import s.implicits._
    // token counts 0..40, including zero-token and longer-than-budget docs
    (1L to 200L).map(i => (i, ("w " * ((i % 41).toInt)).trim))
      .toDF("doc_id", "text")
  }

  private val nTok = TextAnalysis.tokenCount(col("text")).cast("long")

  test("packSequences == the single-global-window formulation, bit-identical, " +
    "at any partitioning and prefix width") {
    val ref = Packing.packSequencesGlobal(docs, "doc_id", nTok, budget = 64)
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 7); pc <- Seq(1, 2, 3)) {
      val got = Packing.packSequences(docs.repartition(parts), "doc_id", nTok,
        budget = 64, prefixChars = pc).collect().map(_.toSeq).toSet
      assert(got == ref, s"two-phase diverged at parts=$parts prefixChars=$pc")
    }
  }

  test("packing invariants: contiguous axis, spans math, zero-token docs") {
    val out = Packing.packSequences(docs, "doc_id", nTok, budget = 64)
      .orderBy("start_tok").collect()
    // the axis is contiguous: each start is the previous start + n_tokens
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
        s"gap on the token axis at ${b.getLong(0)}")
      case _ => ()
    }
    out.foreach { r =>
      val (n, start, seq, off, spans) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(seq == start / 64 && off == start % 64)
      val expSpans = if (n == 0) 1L else (start + n - 1) / 64 - seq + 1
      assert(spans == expSpans, s"spans wrong for doc ${r.getLong(0)}")
    }
    // a doc longer than the budget must span > 1 sequence somewhere
    val long = Packing.packSequences(docs, "doc_id", nTok, budget = 16)
      .where(col("n_tokens") > 16).collect()
    assert(long.nonEmpty && long.forall(_.getLong(5) > 1))
  }

  test("the corpus-sized window is bucket-partitioned (no global sort of " +
    "the input); bucket totals ride the SAME exchange (one scan+tokenize); " +
    "only the tiny bucket-offset frame sees a global window") {
    val out = Packing.packSequences(docs, "doc_id", nTok, budget = 64)
    val opt = out.queryExecution.optimizedPlan.toString
    assert(opt.contains("windowspecdefinition(__b"),
      s"main cumulative sum must partition by bucket:\n$opt")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange"),
      s"bucket totals must reuse the repartition(__b) exchange:\n$plan")
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one corpus scan, got $scans in:\n$plan")
    // determinism guard: same output twice
    assert(out.collect().map(_.toSeq).toSet ==
      Packing.packSequences(docs, "doc_id", nTok, budget = 64)
        .collect().map(_.toSeq).toSet)
  }

  test("bad specs rejected; reserved columns rejected") {
    intercept[IllegalArgumentException](
      Packing.packSequences(docs, "doc_id", nTok, budget = 0))
    intercept[IllegalArgumentException](
      Packing.packSequences(docs, "doc_id", nTok, budget = 64, prefixChars = 0))
    intercept[IllegalArgumentException](
      Packing.packSequences(docs.withColumn("__b", lit(1)), "doc_id", nTok, 64))
  }
}

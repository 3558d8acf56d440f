package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: the concat-and-chunk step every LLM data
  * pipeline runs between curation and tokenization — shuffle the corpus
  * deterministically, lay documents end to end on a global token axis,
  * and cut that axis into fixed `budget`-token sequences (GPT-style
  * packing; see Brown et al., "Language Models are Few-Shot Learners",
  * §2.2 — documents are concatenated and chunked into fixed-length
  * contexts). The output maps every document to its position: which
  * sequence it starts in, at which offset, and how many sequences it
  * spans, so a downstream tokenizer can materialize sequence shards
  * independently per `seq` range.
  *
  * Determinism is the whole point: the order is a salted hash of the id
  * (the same `sampleKey` used by the sampling family), so the packing is
  * reproducible across runs, engines and partitioning — an epoch's
  * global shuffle without a `rand()` anywhere.
  *
  * Scale shape: the naive formulation is ONE global window (cumulative
  * sum over the whole corpus ordered by shuffle key) — a single-task
  * sort at 100TB. This implementation is the classic two-phase
  * distributed prefix sum, all declarative:
  *
  *   1. bucket by the first `prefixChars` hex chars of the shuffle key —
  *      a PREFIX of the sort key, so bucket order is sort order and
  *      buckets partition the axis contiguously;
  *   2. per-bucket token totals (a tiny O(16^prefixChars)-row aggregate)
  *      get exclusive prefix offsets via a window over that tiny frame
  *      (the plan's only unpartitioned window — 256 rows at the default,
  *      65k at prefixChars=4 for a 1000-executor corpus);
  *   3. the within-bucket exclusive cumulative sum runs under
  *      `Window.partitionBy(bucket)` — every bucket sorts only its own
  *      ~1/16^prefixChars slice, in parallel — and the bucket offset
  *      broadcast-joins back on the bucket id.
  *
  * The result is BIT-IDENTICAL to the global-window formulation (the
  * unit test pins it) at any partitioning.
  */
object Packing {

  /** Assign every row a position on the packed token axis.
    *
    * Output: `idCol`, `n_tokens` (long), `start_tok` (exclusive global
    * running total of tokens before this doc), `seq` (= start_tok div
    * budget — the sequence this doc starts in), `seq_off` (offset inside
    * that sequence), `spans` (how many sequences the doc touches; a doc
    * longer than `budget` straddles several). Zero-token docs occupy no
    * space but still get a position (spans = 1).
    *
    * `nTokens` is any non-negative long expression over the input row —
    * pass `TextAnalysis.tokenCount(col("text")).cast("long")` for
    * whitespace tokens, or a learned tokens-per-char estimate. */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
                    budget: Long, salt: String = "graft",
                    prefixChars: Int = 2): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars must be in [1,8]: $prefixChars")
    val reserved = Seq("__sk", "__b", "__bt", "__boff")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column; rename it before packSequences()"))
    val sk = Sampling.sampleKey(col(idCol), salt)
    // lowercase-hex lexicographic order == numeric order, so the bucket
    // (a key PREFIX) partitions the global sort order contiguously
    val base = df.select(col(idCol), nTokens.cast("long").as("n_tokens"),
      sk.as("__sk"), conv(substring(sk, 1, prefixChars), 16, 10)
        .cast("long").as("__b"))
      // ONE corpus scan: both consumers (the per-bucket totals and the
      // within-bucket window) need hashpartitioning(__b) — make that
      // requirement explicit here so the two subtrees share the literal
      // same exchange (ReuseExchange, plan-asserted) instead of each
      // re-scanning and re-tokenizing the corpus
      .repartition(col("__b"))
    // the totals aggregate references __sk and the id through semantic
    // no-ops (length(md5-hex) >= 0 and a cast-to-string comparison are
    // always true): without them column pruning strips both from THIS
    // branch's copy of the exchange subtree, the subtrees stop being
    // identical, and ReuseExchange falls apart into a second corpus
    // scan+tokenize (same trap, same fix as keywordScores — the plan
    // test pins it)
    val bucketOffsets = base.groupBy(col("__b"))
      .agg(sum(when(length(col("__sk")) >= 0 &&
          coalesce(col(idCol).cast("string"), lit("")) >= "",
        col("n_tokens"))).as("__bt"))
      .withColumn("__boff", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__boff"))
    val wb = Window.partitionBy(col("__b"))
      .orderBy(col("__sk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), Seq("__b"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(wb), lit(0L)) + col("__boff"))
      // integral `div`, not floor(double /): exact past 2^53 tokens
      .withColumn("seq", expr(s"start_tok div ${budget}L"))
      .withColumn("seq_off", col("start_tok") % budget)
      .withColumn("spans",
        expr(s"(start_tok + greatest(n_tokens - 1, 0L)) div ${budget}L")
          - col("seq") + 1)
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        col("seq"), col("seq_off"), col("spans"))
  }

  /** The one-global-window reference formulation — O(corpus) through a
    * single task's sort; kept as the semantic spec for the parity test,
    * never for production. */
  private[graft] def packSequencesGlobal(df: DataFrame, idCol: String,
      nTokens: Column, budget: Long, salt: String = "graft"): DataFrame = {
    val sk = Sampling.sampleKey(col(idCol), salt)
    val w = Window.orderBy(col("__sk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), nTokens.cast("long").as("n_tokens"), sk.as("__sk"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq", expr(s"start_tok div ${budget}L"))
      .withColumn("seq_off", col("start_tok") % budget)
      .withColumn("spans",
        expr(s"(start_tok + greatest(n_tokens - 1, 0L)) div ${budget}L")
          - col("seq") + 1)
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        col("seq"), col("seq_off"), col("spans"))
  }
}

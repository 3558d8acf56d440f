package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic BPE merge TRAINER — the vocabulary-induction operator
  * an LLM data pipeline actually runs (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"), extending
  * the kit's d41 adjacent-pair statistics from ONE round of counts to
  * the full fixed-point training loop. The reference has no
  * counterpart — its nearest extension point is the per-record UDF
  * chain (SURVEY §2.13, `common/converters/data/` UDF classes), which could
  * apply a trained vocab but never induce one.
  *
  * Training is a PURE FUNCTION of the corpus (the s29/d79 exact-integer
  * discipline): each round counts adjacent symbol pairs weighted by
  * word frequency, takes the max-count pair with ties broken by the
  * lexicographically smallest (left, right), merges it corpus-wide in
  * one left-to-right greedy pass per word, and recounts. A SQL oracle
  * that unrolls the same N rounds computes the identical merge table —
  * no RNG, no float, no iteration-order dependence anywhere.
  *
  * Scale shape: the training state is the WORD-FREQUENCY table — ∝
  * distinct words, not corpus bytes (the classic BPE trick: a 100 TB
  * corpus has a vocabulary orders of magnitude smaller, and
  * [[wordCorpus]] reduces to it with one map-side-combined aggregate).
  * Each round is one aggregate over the vocab (pairs explode ~word
  * length, combine map-side to ≤ |alphabet²| partial rows per task)
  * plus ONE collected row (the argmax — `limit(1)`, driver-bounded by
  * construction), and one narrow merge pass re-materialized via
  * localCheckpoint so the plan never accretes N rounds of lineage.
  * Symbols ride native array HOFs (`zip_with`/`aggregate`/`slice`) —
  * no UDF anywhere.
  *
  * Char/word conventions (mirrored verbatim by the oracle): words are
  * whitespace-split non-empty tokens and initial symbols are single
  * code points, both via [[WhitespaceTokens]]' pinned explicit
  * character class (Java-regex/RE2-identical — `\s`/`.` are NOT). No
  * `</w>` end-of-word marker: merges never cross word boundaries
  * here, which the whitespace pre-split already enforces. */
object Bpe {

  /** One trained merge: rank (1-based round), the pair, and its
    * corpus-wide weighted count at selection time. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long)

  /** Word-frequency table of a document corpus: whitespace-split
    * ([[WhitespaceTokens]] — the pinned cross-engine class), empty
    * tokens dropped — the vocab-sized frame training runs on. */
  def wordCorpus(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(WhitespaceTokens.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** One greedy left-to-right merge pass of pair (l, r) over a symbol
    * array: standard BPE non-overlapping semantics — "aaa" under (a,a)
    * becomes ["aa","a"], never ["aa","aa"] (the fold's fresh "aa" can't
    * re-match as `l`: equality is against the ORIGINAL left symbol). */
  private[graft] def mergePair(s: Column, l: String, r: String): Column =
    when(size(s) < 2, s).otherwise(
      aggregate(
        slice(s, lit(2), size(s) - 1),
        array(element_at(s, 1)),
        (acc, x) => when(element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x)))))

  /** Adjacent symbol pairs of each word, weighted by freq, summed
    * corpus-wide. */
  private def pairCounts(w: DataFrame): DataFrame =
    w.select(explode(zip_with(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `numMerges` BPE merges over a (word, freq) corpus. Returns
    * the merge table in rank order — fewer than `numMerges` entries
    * only if the corpus runs out of adjacent pairs (every word fully
    * merged to one symbol). */
  def trainMerges(words: DataFrame, numMerges: Int,
                  wordCol: String = "word", freqCol: String = "freq")
      : Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var w = words
      .where(col(wordCol).isNotNull && length(col(wordCol)) > 0)
      .select(regexp_extract_all(col(wordCol),
          lit(WhitespaceTokens.symbolRegex), lit(0)).as("sym"),
        col(freqCol).cast("long").as("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      k += 1
      val best = pairCounts(w)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      best.headOption match {
        case None => exhausted = true
        case Some(row) =>
          val (l, r, c) = (row.getString(0), row.getString(1),
            row.getLong(2))
          out += Merge(k, l, r, c)
          val prev = w
          w = w.select(mergePair(col("sym"), l, r).as("sym"), col("freq"))
            .localCheckpoint()
          // release the prior round's checkpoint blocks NOW — dropping
          // the reference alone pins N rounds of the word table in the
          // block manager until driver GC, contradicting the
          // state-∝-distinct-words scale claim for large numMerges
          graft.core.Checkpoints.release(prev)
      }
    }
    // the result is the merge TABLE — the last round's symbol state has
    // no consumer after the final pair count, so release it too
    graft.core.Checkpoints.release(w)
    out.result()
  }

  /** Tiered trainer for REAL vocab runs (10³–10⁵ merges): the
    * distributed loop pays one Spark job + one `limit(1)` collect per
    * round, so driver round-trip latency dominates long before a
    * production merge count. But the operator's own scale argument
    * says the training STATE is the word-frequency table — vocab-sized,
    * not corpus-sized — so once that table fits a driver bound we
    * collect it ONCE and fold every remaining round driver-side.
    * Bit-identical by construction: same exact-integer counts (driver
    * addition is the same commutative monoid the map-side combine
    * computes), same greedy merge fold, and the tie-break compares
    * strings in UTF-8 BINARY order — Spark's `asc` on StringType is
    * UTF8String byte order, which disagrees with Java
    * `String.compareTo` (UTF-16 code units) for supplementary code
    * points, so the driver tier must NOT use the JVM's default
    * ordering.
    *
    * `vocabRowBound` gates on distinct-word rows (payload ≈ rows ×
    * avg word bytes; the 2M default is ~100 MB driver heap — small
    * against any executor). A 100 TB corpus's vocab typically passes
    * this gate after [[wordCorpus]]'s one corpus-wide aggregate;
    * corpora whose vocab genuinely exceeds it run the distributed
    * loop unchanged. */
  def trainMergesAuto(words: DataFrame, numMerges: Int,
                      wordCol: String = "word", freqCol: String = "freq",
                      vocabRowBound: Long = 2000000L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val filtered = words
      .where(col(wordCol).isNotNull && length(col(wordCol)) > 0)
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"))
    if (filtered.count() > vocabRowBound)
      trainMerges(words, numMerges, wordCol, freqCol)
    else {
      val vocab = filtered.collect().map { r =>
        (splitSymbols(r.getString(0)), r.getLong(1))
      }
      trainMergesLocal(vocab, numMerges)
    }
  }

  /** Driver-side mirror of the engine's symbol split: one entry per
    * code point, the [[WhitespaceTokens.symbolRegex]] negated-class
    * semantics (split chars dropped, everything else survives —
    * including non-ASCII separators Java `.` would silently eat). */
  private[graft] def splitSymbols(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      val isSplit = cp == ' ' || cp == '\t' || cp == '\n' ||
        cp == 0x0B || cp == '\f' || cp == '\r'
      if (!isSplit) out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** UTF-8 binary string order — Spark's StringType sort order. */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-side mirror of [[mergePair]]'s greedy fold — string
    * equality against the pair values, the fresh `l+r` can never
    * re-match as `l` within the pass (l+r ≠ l for non-empty r). */
  private[graft] def mergePairLocal(syms: Array[String], l: String,
                                    r: String): Array[String] = {
    if (syms.length < 2) return syms
    val acc = scala.collection.mutable.ArrayBuffer[String](syms(0))
    var i = 1
    while (i < syms.length) {
      val x = syms(i)
      if (acc(acc.length - 1) == l && x == r)
        acc(acc.length - 1) = l + r
      else acc += x
      i += 1
    }
    acc.toArray
  }

  /** The driver-tier training loop over a collected vocab. Incremental
    * in the classic BPE way: pair counts and a pair→words index update
    * only for words CONTAINING the merged pair, so a round costs ∝
    * affected words, not the whole vocab — integer arithmetic is
    * commutative, so the incremental counts equal a full recount and
    * the result is bit-identical to [[trainMerges]]. */
  private[graft] def trainMergesLocal(vocab: Array[(Array[String], Long)],
                                      numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms = vocab.map(_._1)
    val freqs = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(w: Int, sign: Long): Unit = {
      val s = syms(w)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(w)
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0)
          where.getOrElseUpdate(p, mutable.Set.empty) += w
        i += 1
      }
      if (sign < 0) {
        // drop the index entries for pairs this word no longer has —
        // recomputed from the NEW symbols by the caller's re-add
        i = 0
        while (i < s.length - 1) {
          where.get((s(i), s(i + 1))).foreach(_ -= w)
          i += 1
        }
      }
    }
    var w = 0
    while (w < syms.length) { addWord(w, 1L); w += 1 }
    val out = Seq.newBuilder[Merge]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      k += 1
      if (counts.isEmpty) exhausted = true
      else {
        var bestP: (String, String) = null
        var bestC = Long.MinValue
        counts.foreach { case (p, c) =>
          if (c > bestC || (c == bestC &&
              (utf8Less(p._1, bestP._1) ||
                (p._1 == bestP._1 && utf8Less(p._2, bestP._2))))) {
            bestP = p; bestC = c
          }
        }
        out += Merge(k, bestP._1, bestP._2, bestC)
        val touched = where.getOrElse(bestP, mutable.Set.empty).toArray
        java.util.Arrays.sort(touched)
        touched.foreach { w =>
          addWord(w, -1L)
          syms(w) = mergePairLocal(syms(w), bestP._1, bestP._2)
          addWord(w, 1L)
        }
      }
    }
    out.result()
  }

  /** Persist a trained merge table as a [[LayoutStore]] snapshot — the
    * FROZEN-TOKENIZER artifact a real pipeline ships (the IVF family's
    * frozen-codebook discipline applied to the vocab): training runs
    * once, every later tokenization job loads the snapshot, and
    * retraining lands as a NEW version so in-flight readers keep the
    * table they pinned. The table is tiny (one row per merge), so the
    * snapshot is a single file; the version machinery, not the bytes,
    * is the point. */
  def writeVocabSnapshot(spark: org.apache.spark.sql.SparkSession,
                         path: String, merges: Seq[Merge]): Long = {
    require(merges.nonEmpty,
      "writeVocabSnapshot: refusing to freeze an empty merge table")
    val conf = spark.sparkContext.hadoopConfiguration
    LayoutStore.writeSnapshot(conf, path) { tmp =>
      spark.createDataFrame(merges.sortBy(_.rank))
        .coalesce(1).write.parquet(tmp)
    }
  }

  /** Load a frozen merge table (newest version by default; pin one to
    * keep serving through a retrain) — rank order restored, so
    * [[applyMerges]] over the loaded table reproduces the trainer's
    * own passes exactly. */
  def readVocabSnapshot(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        version: Option[Long] = None): Seq[Merge] =
    LayoutStore.readSnapshotTable(spark, path, "", version)
      .orderBy(col("rank"))
      .collect()
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt")))
      .toSeq

  /** Tokenize a word column with a trained merge table: the initial
    * char split followed by each merge in rank order — exactly the
    * trainer's own passes, so tokenizing the training corpus with its
    * own table reproduces the trainer's final symbol state.
    *
    * The merge table rides as DATA (one literal array of (l, r)
    * structs) through a single outer `aggregate`, NOT as N nested
    * [[mergePair]] columns: each nesting level would copy its input
    * subtree ~5x, so a 50-merge vocab would explode the expression
    * tree ~5^50 and OOM the analyzer — as a lambda VARIABLE the
    * accumulator is referenced by name, constant size at any vocab. */
  def applyMerges(wordCol: String, merges: Seq[Merge]): Column = {
    val init: Column = regexp_extract_all(col(wordCol),
      lit(WhitespaceTokens.symbolRegex), lit(0))
    if (merges.isEmpty) init
    else {
      val table = array(merges.sortBy(_.rank).map(m =>
        struct(lit(m.lhs).as("l"), lit(m.rhs).as("r"))): _*)
      aggregate(table, init, (syms, m) =>
        when(size(syms) < 2, syms).otherwise(
          aggregate(
            slice(syms, lit(2), size(syms) - 1),
            array(element_at(syms, 1)),
            (acc, x) => when(
                element_at(acc, -1) === m.getField("l") &&
                  x === m.getField("r"),
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(concat(m.getField("l"), m.getField("r")))))
              .otherwise(concat(acc, array(x))))))
    }
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: tokenization, quality
  * features, language scoring, fingerprinting. Everything is a codegen'd
  * Column expression over the `text` column — no UDFs, no shuffles; these
  * run map-side inside the parquet scan stage at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens, empty-safe: split on single spaces, drop empties.
    * (Deliberately defined without regex so the definition is portable and
    * cheap; a BPE-ish regex tokenizer is `regexTokens`.) */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** BPE-ish regex tokenization: alphanumeric runs (apostrophes glued,
    * so contractions hold together) or single non-space symbols — the
    * GPT-2-style pre-tokenization split, reduced to an alternation of
    * character classes so the SAME pattern runs under Java regex (Spark
    * codegen) and RE2 (DuckDB/engines without lookaround — the previous
    * lookbehind-based formulation could not cross engines). */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9']+|[^A-Za-z0-9' ]"), lit(0))

  /** Per-doc stats over [[regexTokens]] — the token-shape profile a
    * tokenizer-budget model feeds on: counts by class (word/number/other),
    * summed token chars, chars-per-token. All counts are integers and the
    * single ratio is one per-row IEEE division, so every engine
    * reproduces the output bit-exactly. */
  def regexTokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = regexTokens(col(textCol))
    val staged = df.select(col(idCol), toks.as("__t"))
    staged.select(col(idCol),
      size(col("__t")).cast("long").as("n_tokens"),
      size(filter(col("__t"), t => t.rlike("^[A-Za-z']+$"))).cast("long").as("n_word"),
      size(filter(col("__t"), t => t.rlike("^[0-9]+$"))).cast("long").as("n_num"),
      aggregate(transform(col("__t"), t => length(t)), lit(0L),
        (acc, x) => acc + x).as("tok_chars"))
    .withColumn("n_other", col("n_tokens") - col("n_word") - col("n_num"))
    .withColumn("chars_per_token",
      when(col("n_tokens") === 0, lit(null).cast("double"))
        .otherwise(col("tok_chars").cast("double") / col("n_tokens").cast("double")))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Occurrences of `needle` in `text` via length difference — exact,
    * regex-free, portable. */
  def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length).cast("long")

  /** Quality features (length / punctuation / stopword / uniqueness ratios). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "n_unique_tokens" -> size(array_distinct(toks)).cast("long"),
      "unique_ratio" -> size(array_distinct(toks)).cast("double") / nTok.cast("double"),
      "mean_token_len" -> (aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / nTok.cast("double")),
      "n_punct" -> (countOccurrences(text, ".") + countOccurrences(text, ",") +
        countOccurrences(text, "!") + countOccurrences(text, "?")),
      "stopword_count" -> (countOccurrences(text, " the ") + countOccurrences(text, " a ") +
        countOccurrences(text, " and ") + countOccurrences(text, " of ")),
    )
  }

  /** Repetition signals (the Gopher-rule family from the large-LM
    * curation literature): per-doc duplicate-n-gram and mode-frequency
    * ratios over word n-grams — the signals that catch boilerplate, spam
    * and template text that length/stopword features miss. All MAP-SIDE
    * array expressions (sort + linear fold, no shuffle, no UDF, no
    * explode): at any corpus scale these run inside the scan stage like
    * `qualityFeatures`. Integer counts + one IEEE division per ratio —
    * bit-exact cross-engine (house style). Per n:
    *   n_{n}grams          total n-gram occurrences
    *   dup_{n}gram_ratio   (total - distinct) / total — repeated mass
    *   top_{n}gram_count   occurrences of the most frequent n-gram
    *   top_{n}gram_ratio   that count / total
    * Ratios are null when the doc has no n-grams. */
  def repetitionSignals(text: Column, ns: Seq[Int] = Seq(1, 2, 3)): Seq[(String, Column)] = {
    val toks = tokens(text)
    ns.flatMap { n =>
      require(n >= 1, s"n-gram order must be >= 1: $n")
      val grams = if (n == 1) toks else graft.llm.Dedup.shinglesFromTokens(toks, n)
      val total = size(grams).cast("long")
      val uniq = size(array_distinct(grams)).cast("long")
      val mode = modeCount(grams)
      def ratio(num: Column) =
        when(total > 0, num.cast("double") / total.cast("double"))
      Seq(
        s"n_${n}grams" -> total,
        s"dup_${n}gram_ratio" -> ratio(total - uniq),
        s"top_${n}gram_count" -> mode,
        s"top_${n}gram_ratio" -> ratio(mode))
    }
  }

  /** Staged DataFrame form of [[repetitionSignals]]: tokens, the per-n
    * gram arrays, and the expensive per-n counts (distinct size,
    * sorted-run mode) each materialize in their OWN projection, so every
    * sort/distinct/shingle runs ONCE per doc instead of once per output
    * column that references it (higher-order functions evaluate
    * interpreted — re-evaluation is the dominant cost; same staging
    * discipline as the minhash/chargram producers). ~4x faster than the
    * fused column form; use this at corpus scale. */
  def repetitionReport(df: DataFrame, idCol: String, textCol: String,
                       ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    val toks = df.select(col(idCol), tokens(lower(col(textCol))).as("__toks"))
    val grams = toks.select(col(idCol) +: ns.map { n =>
      require(n >= 1, s"n-gram order must be >= 1: $n")
      (if (n == 1) col("__toks")
       else graft.llm.Dedup.shinglesFromTokens(col("__toks"), n)).as(s"__g$n")
    }: _*)
    val counts = grams.select(col(idCol) +: ns.flatMap { n =>
      val g = col(s"__g$n")
      Seq(size(g).cast("long").as(s"n_${n}grams"),
        size(array_distinct(g)).cast("long").as(s"__u$n"),
        modeCount(g).as(s"top_${n}gram_count"))
    }: _*)
    counts.select(col(idCol) +: ns.flatMap { n =>
      val total = col(s"n_${n}grams")
      def ratio(num: Column) =
        when(total > 0, num.cast("double") / total.cast("double"))
      Seq(total,
        ratio(total - col(s"__u$n")).as(s"dup_${n}gram_ratio"),
        col(s"top_${n}gram_count"),
        ratio(col(s"top_${n}gram_count")).as(s"top_${n}gram_ratio"))
    }: _*)
  }

  /** Most-frequent-element count via the fused native kernel
    * (graft.functions.ModeCount: one copy+sort+run-scan per row inside
    * whole-stage codegen — no per-element lambda, no explode, no
    * shuffle). */
  private def modeCount(grams: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ModeCount(
        org.apache.spark.sql.GraftColumnBridge.expression(grams)))

  /** The composable (interpreted) form `modeCount` replaces — longest
    * run of equal elements in a SORTED array; kept as the semantic
    * reference for the parity regression test. */
  private[graft] def maxRunLengthHof(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Language-ID by stopword evidence: count marker-word hits per language.
    * N-gram heuristic in the classic Cavnar-Trenkle spirit, reduced to
    * portable substring counts. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "es" -> Seq(" el ", " la ", " de ", " que "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "de" -> Seq(" der ", " die ", " und ", " das "),
    "it" -> Seq(" il ", " che ", " di ", " per "),
    "pt" -> Seq(" o ", " não ", " uma ", " com "),
    "nl" -> Seq(" de ", " het ", " een ", " niet "),
    "ru" -> Seq(" и ", " не ", " что ", " это "),
    "zh" -> Seq("的", "了", "是", "我"),
    "ja" -> Seq("の", "に", "は", "です"),
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      s"score_$lang" -> markers.map(m => countOccurrences(padded, m))
        .reduce(_ + _)
    }
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercased text.
    * md5 is bit-identical everywhere, so fingerprints computed by different
    * engines/runs agree — the property a 100TB dedup pass needs. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Latin-1 accent fold for [[normalizedFingerprint]] — a fixed
    * character map (not locale/ICU collation), so any engine with a
    * codepoint-wise `translate` reproduces it bit-exactly. */
  private[graft] val AccentFrom = "àáâãäåèéêëìíîïòóôõöùúûüçñýÿ"
  private[graft] val AccentTo = "aaaaaaeeeeiiiiooooouuuucnyy"

  /** Normalization-aware fingerprint: accent-fold (fixed Latin-1 map),
    * lowercase, strip punctuation/symbols to spaces, collapse runs of
    * whitespace — then md5. Catches the re-encodes exact dedup
    * ([[fingerprint]]) misses: quoting/punctuation variants, casing,
    * accent-stripped mirrors of the same text. Everything is built from
    * engine-portable primitives (translate / regexp_replace / md5), so
    * cross-run dedup state keyed on it survives an engine migration —
    * the same property [[fingerprint]] pins for the exact tier. */
  def normalizedFingerprint(text: Column): Column = {
    val folded = translate(lower(coalesce(text, lit(""))),
      AccentFrom, AccentTo)
    val stripped = regexp_replace(folded, "[^a-z0-9\\s]", " ")
    md5(trim(regexp_replace(stripped, "\\s+", " ")))
  }

  /** Positional PHRASE search — exact consecutive-token match, the
    * capability a bag-of-words index (BM25, s09/s12) structurally
    * cannot answer: "fast table" as a phrase, not two terms. This is
    * the positional-postings formulation every IR engine uses: derive
    * (doc, position, term) postings, PRUNE to the phrase's vocabulary
    * at the scan (the filter rides the token explode — the corpus's
    * other terms never leave the map side), anchor on the first word's
    * positions and equi-join each later word at `anchor + i`. Overlapping
    * occurrences count individually. Returns (idCol, n_matches) for
    * docs with >= 1 occurrence.
    *
    * Scale shape: postings for a k-word phrase are k tiny term slices
    * of the corpus; the k-1 adjacency joins hash on (doc, position) —
    * no window, no per-doc array rebuild, and a phrase vocabulary that
    * misses the corpus costs one pruned scan. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    requirePhrase(phrase)
    val tok = df.select(col(idCol).as("__pid"),
        posexplode(tokens(lower(col(textCol)))).as(Seq("__pos", "__term")))
      .where(col("__term").isin(phrase.distinct: _*))
    phrasePostingsMatch(tok, idCol, phrase)
  }

  private def requirePhrase(phrase: Seq[String]): Unit = {
    require(phrase.size >= 2, "phrase must have at least two words " +
      "(single-term lookup is a plain filter)")
    require(phrase.forall(w => w.nonEmpty && w == w.toLowerCase),
      s"phrase words must be lowercase non-empty tokens: $phrase")
  }

  /** The adjacency-join core shared by [[phraseSearch]] (postings
    * derived at query time) and [[phraseSearchIndexed]] (postings read
    * from the persisted layout): anchor on the first word's positions,
    * equi-join each later word at `anchor + i`, count occurrences.
    * `tok` carries (__pid, __pos, __term) already pruned to the phrase
    * vocabulary. */
  private def phrasePostingsMatch(tok: DataFrame, idCol: String,
                                  phrase: Seq[String]): DataFrame = {
    val anchors = tok.where(col("__term") === phrase.head)
      .select(col("__pid"), col("__pos").as("__p0"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchors) {
      case (acc, (w, i)) =>
        acc.join(tok.where(col("__term") === w)
            .select(col("__pid"), (col("__pos") - i).as("__p0")),
          Seq("__pid", "__p0"))
    }
    matched.groupBy(col("__pid").as(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Persisted POSITIONAL postings index — the serving path for
    * [[phraseSearch]], which re-tokenizes the whole corpus per
    * invocation (fine once, wrong as a serving path — the
    * [[writeBm25Layout]] argument, with positions kept). The corpus
    * tokenizes ONCE into (term, doc_id, pos) rows landed as a
    * [[LayoutStore]] snapshot whose ROOT is the table, partitioned by
    * `tbucket = pmod(xxhash64(term), termBuckets)` — a phrase probe
    * reads only the directories its words hash into.
    *
    * The single-root-table shape is deliberate: positional postings
    * carry NO corpus-derived statistics (no df/N/Σdl to repair), so
    * the whole lifecycle composes from the generic manifest-store
    * walkers with zero new code — incremental append is
    * [[Ingest.appendRowsSnapshot]] (via [[appendPositionalSnapshot]],
    * which re-derives batch rows under the snapshot's own bucket
    * count), takedown propagation is
    * [[Takedown.propagateLayoutSnapshot]] (doc_id is in its default id
    * columns; only directories with hits rewrite), and physical
    * defragmentation is [[LayoutStore.compactSnapshotPartial]]. The
    * bucket count is stamped on every row (`term_buckets` — parquet
    * dictionary-encodes the repetition away) so it survives all three
    * walkers and a probe planned against a foreign layout fails fast
    * rather than scanning wrong partitions. Returns the version. */
  def writePositionalSnapshot(corpus: DataFrame, path: String,
                              docIdCol: String = "doc_id",
                              textCol: String = "text",
                              termBuckets: Int = 64): Long = {
    require(termBuckets >= 1, s"termBuckets must be >= 1: $termBuckets")
    LayoutStore.writeSnapshot(
      corpus.sparkSession.sparkContext.hadoopConfiguration, path)(tmp =>
      positionalRows(corpus, docIdCol, textCol, termBuckets)
        .repartition(col("tbucket"))
        .write.mode("overwrite").partitionBy("tbucket").parquet(tmp))
  }

  private def positionalRows(corpus: DataFrame, docIdCol: String,
                             textCol: String,
                             termBuckets: Int): DataFrame =
    corpus.select(col(docIdCol).as("doc_id"),
        posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "term")))
      .withColumn("term_buckets", lit(termBuckets))
      .withColumn("tbucket", bm25TermBucket(col("term"), termBuckets))

  /** Phrase search over a [[writePositionalSnapshot]] store — the same
    * (idCol, n_matches) rows as [[phraseSearch]] over the corpus the
    * snapshot froze (same adjacency-join core), but the corpus is
    * never re-tokenized: the probe reads ONLY the partition
    * directories the phrase's words hash into (`tbucket IN` is a
    * partition filter — plan-guarded in TextAnalysisSpec), computed
    * with the SAME [[bm25TermBucket]] expression that bucketed the
    * build (no hand-rolled hash twin to drift). */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
                          path: String, phrase: Seq[String],
                          idCol: String = "doc_id",
                          version: Option[Long] = None): DataFrame = {
    requirePhrase(phrase)
    val postingsAll = LayoutStore.readSnapshotTable(spark, path, "", version)
    val termBuckets = postingsAll.select(col("term_buckets"))
      .limit(1).head().getInt(0)
    val words = phrase.distinct
    val buckets = spark.createDataset(words)(
        org.apache.spark.sql.Encoders.STRING).toDF("term")
      .select(bm25TermBucket(col("term"), termBuckets).as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val tok = postingsAll
      .where(col("tbucket").isin(buckets: _*) &&
        col("term").isin(words: _*))
      .select(col("doc_id").as("__pid"), col("pos").as("__pos"),
        col("term").as("__term"))
    phrasePostingsMatch(tok, idCol, phrase)
  }

  /** Append a document batch to a [[writePositionalSnapshot]] store:
    * the batch tokenizes alone under the snapshot's OWN bucket count
    * (read off the stamped rows — a caller cannot desynchronize the
    * hash space), then [[Ingest.appendRowsSnapshot]] rewrites only the
    * term buckets the batch's vocabulary touches and inherits every
    * cold directory by manifest reference. Disjoint-id discipline and
    * fail-fast collision check are the appender's. Returns the new
    * version. */
  def appendPositionalSnapshot(spark: org.apache.spark.sql.SparkSession,
                               path: String, newDocs: DataFrame,
                               docIdCol: String = "doc_id",
                               textCol: String = "text",
                               version: Option[Long] = None): Long = {
    val termBuckets = LayoutStore.readSnapshotTable(spark, path, "", version)
      .select(col("term_buckets")).limit(1).head().getInt(0)
    Ingest.appendRowsSnapshot(spark, path,
      positionalRows(newDocs, docIdCol, textCol, termBuckets),
      partitionCol = "tbucket", idCol = "doc_id", version = version)
  }

  /** Pairwise vocabulary overlap between strata (languages, sources,
    * corpus snapshots): for every unordered stratum pair, the distinct
    * shared-token count and Jaccard over the strata's distinct
    * vocabularies. The cross-subset contamination / similarity gauge a
    * mixture designer reads before setting sampling weights: a pair with
    * high vocabulary Jaccard is re-stating the same material. The matrix
    * is COMPLETE over the document frame's strata: zero-overlap pairs
    * emit overlap = 0, and a stratum whose documents are all tokenless
    * still appears (n = 0; an all-empty pair's Jaccard is 0.0 by
    * definition, never NaN). Null strata are excluded (a null never
    * orders against another stratum).
    *
    * Scale shape: explode → ONE distinct over (stratum, token) — the
    * only big shuffle, map-side-combined; per-stratum sizes are a tiny
    * aggregate of that frame, and the pair join runs over
    * (token → strata) postings whose width is the stratum count (small
    * by definition), never over documents. Counts are integers and the
    * single division happens once at the end — bit-exact cross-engine. */
  def strataOverlapMatrix(df: DataFrame, strataCol: String,
                          textCol: String = "text"): DataFrame = {
    val vocab = df.select(col(strataCol).as("stratum"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .distinct()
    // sizes derive from the DOCUMENT frame's stratum list, not the
    // vocabulary frame: a stratum whose documents are all tokenless has
    // no vocab rows but still belongs to the complete matrix (n = 0,
    // overlap = 0); deriving from vocab silently dropped it
    val sizes = df.select(col(strataCol).as("stratum")).distinct()
      .join(vocab.groupBy(col("stratum")).agg(count(lit(1)).as("n")),
        Seq("stratum"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val inter = vocab.as("a").join(vocab.as("b"),
        col("a.term") === col("b.term") &&
          col("a.stratum") < col("b.stratum"))
      .groupBy(col("a.stratum").as("stratum_a"),
        col("b.stratum").as("stratum_b"))
      .agg(count(lit(1)).as("overlap"))
    // complete matrix: stratum pairs with zero shared terms still emit
    val pairs = sizes.as("x").join(sizes.as("y"),
        col("x.stratum") < col("y.stratum"))
      .select(col("x.stratum").as("stratum_a"),
        col("y.stratum").as("stratum_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
    pairs.join(inter, Seq("stratum_a", "stratum_b"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      // 0/0 guard: a pair of two tokenless strata has an empty union —
      // jaccard is defined as 0.0 (no shared vocabulary), never NaN
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("overlap") === 0, lit(0.0))
          .otherwise(col("overlap").cast("double") /
            (col("n_a") + col("n_b") - col("overlap")).cast("double")))
      .select("stratum_a", "stratum_b", "overlap", "n_a", "n_b", "jaccard")
  }

  /** Character k-gram hashes of the lowercased text (the rolling-hash
    * role, realized as md5 for cross-engine stability). MUST be staged in
    * its own select before `winnowingMinima` reads it: a window lambda
    * referencing this expression inline re-evaluates the WHOLE gram
    * transform per window — O(n^2) lower+md5 per document (a 40x stall at
    * sf0.1 before staging). */
  def charGramHashes(normalizedText: Column, k: Int = 8): Column =
    // expects ALREADY-normalized text (e.g. a staged lower(text) column);
    // codegen'd expression — one loop, no per-gram lambda interpretation
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CharGramMd5(
        org.apache.spark.sql.GraftColumnBridge.expression(normalizedText), k))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) from a
    * MATERIALIZED gram-hash array column: the minimum hash of each window
    * of w consecutive k-gram hashes, distinct. Local edits perturb only
    * nearby windows, so overlapping fingerprints survive — the
    * plagiarism/near-dup detector that exact fingerprints can't be. */
  def winnowingMinima(gramHashes: Column, w: Int = 4): Column =
    // codegen'd expression (graft.functions.WinnowingMinima): one fused
    // loop per document instead of w boxed element_at + least lambda
    // evaluations per window — this was the last interpreted hot loop on
    // the bench (d07, 14% of round-2 total)
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.WinnowingMinima(
        org.apache.spark.sql.GraftColumnBridge.expression(gramHashes), w))

  /** The composable (interpreted) form `winnowingMinima` replaces —
    * kept as the semantic reference for the parity regression test. */
  private[graft] def winnowingMinimaHof(gramHashes: Column, w: Int = 4): Column = {
    val numWindows = greatest(size(gramHashes) - (w - 1), lit(1))
    // least(g[j..j+w-1]) via direct indexed lookups — a per-window slice()
    // would allocate a w-element array per window; try_element_at beyond
    // the array end yields null (ANSI element_at throws), which least()
    // ignores (short trailing docs)
    array_distinct(transform(sequence(lit(1), numWindows),
      j => least((0 until w).map(s => try_element_at(gramHashes, j + lit(s))): _*)))
  }

  /** Convenience fused form for SMALL inputs — on a corpus, stage:
    * `select(lower(text))` -> `select(charGramHashes(col))` ->
    * `select(winnowingMinima(col))` (see charGramHashes for why). */
  /** Per-document keyword extraction: top-`topK` terms by a RATIONAL
    * tf-idf variant, score = tf * N / df (term frequency x inverse
    * document-frequency ratio, no logarithm). The log-free form is
    * deliberate: tf, N, df are integers, so the score is one IEEE double
    * multiply+divide that any engine reproduces bit-exactly — same
    * ranking behavior as classic tf-idf (monotone in tf and 1/df), none
    * of the cross-libm drift of ln(). Ties rank lexicographically.
    *
    * Scale shape: ONE pass over the corpus. A per-doc sentinel term
    * keeps tokenless docs in the grouped frame, so the exact document
    * count N is an aggregate of that same frame rather than a separate
    * `df.count()` scan of a possibly-expensive upstream pipeline; the
    * (id, term) exchange is the plan's only shuffle of corpus bytes and
    * is REUSED by all three consumers (tf join-left, df, N). The tiny df
    * aggregate (distinct terms ≪ (id, term) pairs in any natural corpus)
    * joins by BROADCAST, but the static hint is best-effort only: the
    * plan-stats guard reads the Aggregate's estimate, which without CBO
    * derives from its CHILD (the full (id, term) exchange), so at real
    * corpus scale the estimate exceeds the threshold and the hint does
    * NOT engage. The mechanism that actually delivers the broadcast at
    * scale is AQE: the exchange's RUNTIME size of the df aggregate is
    * accurate, and adaptive join selection converts the sort-merge join
    * to a broadcast join when it fits
    * `spark.sql.adaptive.autoBroadcastJoinThreshold` (asserted on the
    * adaptive final plan in TextAnalysisSpec). The static hint stays for
    * the CBO-on / tiny-input cases where the estimate is honest; either
    * way a pathological billion-term corpus degrades to a sort-merge
    * join instead of a broadcast OOM. The per-doc top-k window's
    * rank<=k filter Spark pushes map-side (WindowGroupLimit) so full
    * per-doc term lists never sort through one partition.
    *
    * N counts distinct `idCol` values (== row count when ids are unique,
    * the sane corpus shape). Output: (id, term, tf, df, score, rank). */
  def keywordScores(df: DataFrame, idCol: String, textCol: String,
                    topK: Int, broadcastDfMaxBytes: Long = 64L << 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    // Each doc emits a sentinel `""` term (impossible as a real token —
    // tokens() drops empties) ahead of its tokens, so tokenless docs
    // still ride the shared (id, term) exchange for the N count, and
    // `term` stays NON-nullable by schema — the inner join on term below
    // infers an isnotnull(term) which then constant-folds away instead
    // of materializing below the exchange in some branches but not
    // others (which would split the subtrees and defeat ReuseExchange).
    val tf0 = df
      .select(col(idCol).as("id"),
        explode(concat(array(lit("")),
          tokens(lower(coalesce(col(textCol), lit("")))))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    // Every consumer references tf0's columns through a semantic no-op
    // on `tf` (tf >= 1 holds for every grouped row): without it, column
    // pruning and predicate pushdown rewrite each branch's copy of the
    // exchange subtree differently, the subtrees stop being identical,
    // and ReuseExchange falls apart into extra corpus scans. The plan
    // test pins all of this (one scan + ReusedExchange).
    val tf = tf0.where(when(col("tf") >= 1, length(col("term")) > 0))
    val nDocs = tf0.agg(
      countDistinct(when(col("tf") >= 1, col("id"))).as("n_docs"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(when(col("tf") >= 1, lit(1))).as("df"))
    val dfreqHinted =
      if (dfreq.queryExecution.optimizedPlan.stats.sizeInBytes <= broadcastDfMaxBytes)
        broadcast(dfreq)
      else dfreq
    val scored = tf.join(dfreqHinted, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * col("n_docs").cast("double") / col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** BM25 top-k retrieval — the "mine docs relevant to a probe query"
    * curation step (targeted-domain harvesting, more-like-this
    * expansion). Okapi BM25 with the house log-free idf surrogate:
    * idf_r(t) = (N − df + 0.5)/(df + 0.5) — the same rational ratio
    * inside classic BM25's ln(), dropped because ln() drifts across
    * libms ([[keywordScores]]' reasoning); it is monotone in 1/df so
    * per-term ordering is preserved, and the tf saturation / length
    * normalization (k1, b) are untouched. All inputs to the score are
    * integers (tf, df, dl, N, Σdl); the score is a fixed IEEE
    * expression tree both engines evaluate identically, and the
    * per-(query,doc) SUM over terms — float addition is not
    * associative, so a plain SUM would be partition-order-dependent —
    * is a left-to-right fold over the term-sorted score array,
    * mirrored by DuckDB's list(s ORDER BY term) + list_reduce.
    *
    * Scale shape: the corpus tokenizes in two pruned scans (a map-side
    * 1-row stats aggregate for N/avgdl, and the term explode); only
    * rows whose term appears in a QUERY survive past the explode (a
    * broadcast semi-join directly on the scan output), so the (doc,
    * term) exchange carries query-term rows only — at 100 TB with a
    * 100-term query sheet that is a vanishing fraction of the corpus.
    * df/stats/query frames are all broadcast; the one wide exchange is
    * the per-query top-k window, map-side-pruned (WindowGroupLimit,
    * k small). Docs sharing no term with a query are simply not
    * retrieved (standard BM25 behavior). Output: (query_id, doc_id,
    * score, rank). */
  def bm25TopK(corpus: DataFrame, queries: DataFrame,
               docIdCol: String, textCol: String,
               queryIdCol: String, queryTextCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(tokens(lower(col(queryTextCol))))).as("term"))
    val corpusToks = corpus.select(col(docIdCol).as("doc_id"),
      tokens(lower(col(textCol))).as("__t"))
    val stats = corpusToks.agg(count(lit(1)).as("n"),
      sum(size(col("__t")).cast("long")).as("tot"))
    val tf = corpusToks
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()),
        Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__s", bm25TermScore(col("tf"), col("df"), col("dl"),
        col("n"), col("tot"), k1, b))
    bm25RankTopK(scored, k)
  }

  /** The BM25 per-(doc, term) score as ONE fixed expression tree, shared
    * by [[bm25TopK]] (n/tot ride the broadcast stats frame) and
    * [[bm25TopKIndexed]] (n/tot are literals frozen at layout-build
    * time) so the two paths cannot drift by even a rounding: same
    * inputs → bit-identical IEEE result. */
  private def bm25TermScore(tf: Column, df: Column, dl: Column,
                            n: Column, tot: Column,
                            k1: Double, b: Double): Column =
    ((n.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))) *
    ((tf.cast("double") * (lit(k1) + lit(1.0))) /
      (tf.cast("double") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * dl.cast("double") /
          (tot.cast("double") / n.cast("double")))))

  /** Shared tail of both BM25 paths: fold per-(query, doc) term scores
    * in TERM-SORTED left-to-right order (float addition is not
    * associative — a plain SUM would be partition-order-dependent) and
    * keep the per-query top k by (score desc, doc_id asc). */
  private def bm25RankTopK(scored: DataFrame, k: Int): DataFrame = {
    val folded = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("term"), col("__s").as("s")))),
          x => x.getField("s")),
        lit(0.0), (acc, x) => acc + x).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    folded.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** The hash bucket a term's postings live in — pmod(xxhash64) so the
    * SAME Catalyst expression plans probes (no hand-rolled driver twin
    * to drift out of sync with codegen). */
  def bm25TermBucket(term: Column, termBuckets: Int): Column =
    pmod(xxhash64(term), lit(termBuckets.toLong)).cast("int")

  /** Persisted inverted-index layout for BM25 — the retrieval twin of
    * the SRP/IVF ANN layouts ([[graft.llm.Similarity.writeSrpLayout]]):
    * [[bm25TopK]] re-tokenizes and re-explodes the WHOLE corpus on every
    * query batch (SCALE_BENCH.json at the 544k-doc corpus: 26.4s per
    * 20-query batch, 8.0s even for a single 4-term query — fine once,
    * wrong as a serving path), while a 100 TB corpus tokenizes ONCE
    * here (10.4s build at 544k) and every later query batch reads only
    * the partition directories its terms hash into (2.4s for the
    * single-query probe — the narrow shape is the win regime; a
    * many-query sheet whose terms cover most buckets degrades toward a
    * full postings scan, measured 22.6s for 20 queries/80 terms).
    *
    * Layout under `path`:
    *   - `postings/` — (term, doc_id, tf, dl, df) partitioned by
    *     `tbucket` = pmod(xxhash64(term), termBuckets). df is
    *     denormalized onto every posting row (parquet dictionary-encodes
    *     the repetition away) so a probe is ONE pruned scan with zero
    *     corpus-side joins. Bucketing by term hash — not raw `term` —
    *     keeps the directory count fixed at termBuckets instead of
    *     |vocabulary| (a 100 TB corpus has 10^8+ distinct terms; 10^8
    *     dirs would melt the file listing).
    *   - `stats/` — one row (n, tot, term_buckets): the corpus-frozen
    *     N / Σdl the score needs, plus the bucket count stamped so a
    *     probe planned with a different termBuckets fails fast instead
    *     of silently scanning wrong partitions (the sig_format guard
    *     pattern from incremental dedup).
    *
    * Scale shape: one corpus tokenize + explode, one (doc_id, term)
    * exchange for tf, one (term) exchange for df, then a repartition by
    * tbucket so each bucket directory gets one file per owning task
    * (the writeIvfLayout small-file-storm note — salt the repartition
    * key at 100 TB for more files/bucket). The df join is term-to-term
    * and both sides come off the same tf frame. */
  def writeBm25Layout(corpus: DataFrame, path: String,
                      docIdCol: String = "doc_id",
                      textCol: String = "text",
                      termBuckets: Int = 64): Unit = {
    require(termBuckets >= 1, s"termBuckets must be >= 1: $termBuckets")
    // spread the RAW text before the tokenize + per-term explode (the
    // multiplier) — see Dedup.spreadForCompute; and PERSIST the
    // tokenized frame: it feeds two separate WRITE JOBS (postings and
    // stats), which otherwise each re-run the scan+tokenize pipeline
    // (and, spread, its exchange) — r17 re-measure: the unpersisted
    // spread regressed m42/m43 ~1.35x
    val corpusToks = Dedup.spreadForCompute(
        corpus.select(col(docIdCol).as("doc_id"), col(textCol).as("__sftxt")))
      .select(col("doc_id"), tokens(lower(col("__sftxt"))).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = corpusToks
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
      .withColumn("tbucket", bm25TermBucket(col("term"), termBuckets))
      .repartition(col("tbucket"))
      .write.mode("overwrite").partitionBy("tbucket")
      .parquet(s"$path/postings")
    corpusToks.agg(count(lit(1)).as("n"),
        sum(size(col("__t")).cast("long")).as("tot"))
      .withColumn("term_buckets", lit(termBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    corpusToks.unpersist(blocking = true)
    ()
  }

  /** BM25 top-k over a [[writeBm25Layout]] index: bit-exact the same
    * (query_id, doc_id, score, rank) rows as [[bm25TopK]] over the
    * corpus the layout froze (same score expression via
    * [[bm25TermScore]], same term-sorted fold via [[bm25RankTopK]]; df
    * and N/Σdl are the layout's snapshot — an index is a snapshot), but
    * the corpus is never re-tokenized: the probe reads ONLY the
    * partition directories the query terms hash into (`tbucket IN`
    * is a partition filter — plan-guarded in TextAnalysisSpec), then a
    * broadcast join on the exact terms trims bucket co-residents.
    *
    * Probe planning collects the query-term bucket set driver-side —
    * query sheets are small by construction (a retrieval batch, not a
    * corpus), and the buckets are computed with the SAME
    * [[bm25TermBucket]] Catalyst expression that bucketed the build, so
    * there is no hand-rolled hash twin to drift. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
                      path: String, queries: DataFrame,
                      queryIdCol: String, queryTextCol: String, k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFrames(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/stats").head(), queries,
      queryIdCol, queryTextCol, k, k1, b)

  /** Frame-level core of [[bm25TopKIndexed]] — the probe against an
    * already-resolved postings frame + stats row, shared by the raw
    * path form and the manifest-resolving store form
    * ([[bm25TopKIndexedLatest]]). The `tbucket IN` filter remains a
    * partition filter on every underlying parquet branch. */
  private[llm] def bm25TopKFrames(postingsAll: DataFrame,
                                  st: org.apache.spark.sql.Row,
                                  queries: DataFrame,
                                  queryIdCol: String, queryTextCol: String,
                                  k: Int, k1: Double = 1.2,
                                  b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val (n, tot, termBuckets) =
      (st.getAs[Long]("n"), st.getAs[Long]("tot"), st.getAs[Int]("term_buckets"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(tokens(lower(col(queryTextCol))))).as("term"))
    val buckets = qterms
      .select(bm25TermBucket(col("term"), termBuckets).as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val postings = postingsAll.where(col("tbucket").isin(buckets: _*))
    val scored = postings.join(broadcast(qterms), Seq("term"))
      .withColumn("__s", bm25TermScore(col("tf"), col("df"), col("dl"),
        lit(n), lit(tot), k1, b))
    bm25RankTopK(scored, k)
  }

  /** [[writeBm25Layout]] through the versioned [[LayoutStore]]: each
    * index rebuild lands as an immutable `version=N` snapshot (dot-temp
    * + atomic rename — no torn probe ever sees new postings with old
    * stats), and [[bm25TopKIndexedLatest]] pins the newest, so a
    * refreshed corpus RETIRES the stale index by construction (the
    * bench-key snapshot contract applied to a layout). Returns the new
    * version. */
  def writeBm25Snapshot(corpus: DataFrame, path: String,
                        docIdCol: String = "doc_id",
                        textCol: String = "text",
                        termBuckets: Int = 64): Long =
    LayoutStore.writeSnapshot(
      corpus.sparkSession.sparkContext.hadoopConfiguration, path)(
      tmp => writeBm25Layout(corpus, tmp, docIdCol, textCol, termBuckets))

  /** Probe a [[writeBm25Snapshot]] store: resolves the pinned version's
    * path (default newest) and runs [[bm25TopKIndexed]] against it. */
  def bm25TopKIndexedLatest(spark: org.apache.spark.sql.SparkSession,
                            path: String, queries: DataFrame,
                            queryIdCol: String, queryTextCol: String,
                            k: Int, k1: Double = 1.2, b: Double = 0.75,
                            version: Option[Long] = None): DataFrame =
    bm25TopKFrames(
      LayoutStore.readSnapshotTable(spark, path, "postings", version),
      LayoutStore.readSnapshotTable(spark, path, "stats", version).head(),
      queries, queryIdCol, queryTextCol, k, k1, b)

  /** The DuckDB twin of [[bm25TopK]], generated with the SAME k1/b
    * literals and the SAME expression tree so the two engines cannot
    * drift (the Pii.scrubOracleSql pattern). `corpusSql` yields
    * (doc_id, text); `queriesSql` yields (query_id, qtext). */
  def bm25OracleSql(corpusSql: String, queriesSql: String, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
    val qtoks = "list_filter(string_split(lower(qtext), ' '), x -> x != '')"
    s"""WITH dt AS (SELECT doc_id, $toks AS g FROM ($corpusSql)),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(len(g)) AS BIGINT) AS tot FROM dt),
       |qt AS (SELECT query_id, unnest(list_distinct($qtoks)) AS term
       |       FROM ($queriesSql)),
       |ex AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS dl, unnest(g) AS term
       |       FROM dt),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
       |         MAX(dl) AS dl
       |       FROM ex WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |pt AS (SELECT q.query_id, t.doc_id, t.term,
       |         ((CAST(st.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) /
       |           (CAST(d.df AS DOUBLE) + 0.5)) *
       |         ((CAST(t.tf AS DOUBLE) * ($k1 + 1.0)) /
       |           (CAST(t.tf AS DOUBLE) + $k1 *
       |             (1.0 - $b + $b * CAST(t.dl AS DOUBLE) /
       |               (CAST(st.tot AS DOUBLE) / CAST(st.n AS DOUBLE))))) AS s
       |       FROM tf t JOIN dfq d USING (term) JOIN qt q USING (term), st),
       |fold AS (SELECT query_id, doc_id,
       |           list_reduce(list(s ORDER BY term), (x, y) -> x + y) AS score
       |         FROM pt GROUP BY 1, 2)
       |SELECT query_id, doc_id, score, CAST(rk AS INTEGER) AS rank FROM (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rk
       |  FROM fold) WHERE rk <= $k""".stripMargin
  }

  /** Unigram-LM familiarity scoring — the corpus-frequency quality
    * filter (the CCNet/Gopher "does this look like the corpus" signal)
    * expressed WITHOUT logarithms so it is bit-exact across engines: a
    * doc's score is the mean corpus frequency of its tokens
    * (`mean_freq`, high = common-vocabulary text) plus its rare-token
    * mass (`oov_rate`, the fraction of tokens whose term holds less
    * than a 1/`rareDenom` share of the corpus). Log-probability LM
    * scoring would rank identically per token (log is monotone) but
    * ln() drifts across libms; here every aggregate is an INTEGER sum
    * and the two ratios are one per-row IEEE division each.
    *
    * Scale shape: one corpus tokenize; the (id, term) exchange feeds
    * both the vocabulary aggregate and the scoring join (same reuse
    * shape as keywordScores); the vocab (distinct terms ≪ corpus) is
    * broadcast-hinted under a plan-stats guard with AQE as the
    * at-scale mechanism; the total-token count rides a 1-row broadcast
    * cross join. Docs with zero tokens have no rows. `sum_freq` is a
    * sum of tf·count(term) longs — bounded by n_tokens(doc) ·
    * n_tokens(corpus), overflow-safe below ~10^18 (a 25T-token corpus
    * and 40k-token docs sit at ~10^17).
    *
    * Output: (id, n_tokens, sum_freq, oov_tokens, mean_freq, oov_rate). */
  def unigramFamiliarity(df: DataFrame, idCol: String, textCol: String,
                         rareDenom: Long = 100,
                         vocabBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    require(rareDenom >= 1, s"rareDenom must be >= 1: $rareDenom")
    // Same ONE-corpus-pass construction as keywordScores (see the long
    // comment there): the sentinel `""` term keeps every branch's copy
    // of the (id, term) exchange subtree IDENTICAL (no branch-local
    // isnotnull inference or pruning), and every consumer references the
    // grouped columns through semantic no-ops, so the scoring join's
    // left side, the vocabulary aggregate and the total-token count all
    // ride ONE exchange (ReusedExchange, plan-asserted in the spec)
    // instead of three scans+tokenizes of the corpus.
    val tf0 = df
      .select(col(idCol).as("id"),
        explode(concat(array(lit("")),
          tokens(lower(coalesce(col(textCol), lit("")))))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val tf = tf0.where(when(col("tf") >= 1, length(col("term")) > 0))
    val vocab = tf.groupBy(col("term"))
      .agg(sum(when(col("tf") >= 1, col("tf"))).as("cnt"))
    val total = tf.agg(sum(when(col("tf") >= 1, col("tf"))).as("total_toks"))
    val vocabHinted =
      if (vocab.queryExecution.optimizedPlan.stats.sizeInBytes <= vocabBroadcastMaxBytes)
        broadcast(vocab)
      else vocab
    tf.join(vocabHinted, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("cnt")).as("sum_freq"),
        sum(when(col("cnt") * rareDenom < col("total_toks"), col("tf"))
          .otherwise(lit(0L))).as("oov_tokens"))
      .withColumn("mean_freq",
        col("sum_freq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("oov_rate",
        col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Overlapping token-window chunking — the doc→passage step in front
    * of every retrieval/embedding index (RAG corpora, passage-level
    * BM25/ANN): each doc yields chunks of up to `width` tokens starting
    * every `stride` tokens, so consecutive chunks overlap by
    * width − stride tokens and no token is lost. Chunk identity is
    * (id, chunk_idx) with chunk_idx = start/stride — deterministic, so
    * re-chunking after an upstream change touches only changed docs.
    *
    * Pure map-side: tokenize, generate starts, explode, slice — a
    * codegen'd expression chain inside the scan stage, no exchange at
    * any scale (chunking 100 TB is exactly as parallel as reading it).
    * Zero-token docs emit no chunk; a doc shorter than `width` emits
    * one chunk with all its tokens. Output: (id, chunk_idx, start_tok,
    * n_tokens, chunk_text). */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   width: Int, stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width=$width]: $stride")
    val toks = tokens(lower(coalesce(col(textCol), lit(""))))
    df.select(col(idCol).as("id"), toks.as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("id"), col("__t"),
        explode(sequence(lit(0), size(col("__t")) - 1, lit(stride)))
          .as("start_tok"))
      .select(col("id"),
        (col("start_tok") / stride).cast("int").as("chunk_idx"),
        col("start_tok"),
        least(lit(width), size(col("__t")) - col("start_tok"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__t"), col("start_tok") + 1, lit(width)), " ")
          .as("chunk_text"))
  }

  /** Bigram-LM familiarity — the second-order twin of
    * [[unigramFamiliarity]] (the CCNet-style "does this read like the
    * corpus" filter, one Markov order up): a doc of common WORDS in
    * nonsense ORDER scores high on unigram familiarity but low here,
    * because its adjacent pairs are corpus-rare. Per doc-bigram the
    * conditional familiarity is c(w1 w2)/c(w1 ·) — how often the corpus
    * continues w1 with w2, against everything it continues w1 with —
    * and the doc score folds those into the mass ratio
    *
    *   cond_score = (Σ tf·cnt) / (Σ tf·lcnt)   ∈ (0, 1]
    *
    * (cnt = corpus count of the bigram, lcnt = corpus count of bigrams
    * sharing its first token). Integer masses, ONE double division —
    * the log-free house arithmetic (per-bigram float sums would be
    * partition-order-dependent and ln() drifts across libms).
    *
    * Scale shape: the d29 one-corpus-pass construction verbatim — the
    * sentinel `""` bigram keeps the (id, bigram) exchange subtree
    * identical across consumers, so the scoring join's left side AND
    * the bigram vocabulary ride ONE exchange (plan-asserted); the
    * lead-token table derives from the already-tiny vocabulary, never
    * from the corpus; both side tables broadcast under a plan-stats
    * guard with AQE as the at-scale mechanism. Mass overflow headroom:
    * tf·lcnt ≤ n_bigrams(doc)·n_bigrams(corpus) — the
    * unigramFamiliarity BIGINT note applies unchanged.
    *
    * Docs with fewer than two tokens have no bigrams and emit no row
    * (mirrored by the oracle). Output: (id, n_bigrams, bigram_mass,
    * lead_mass, cond_score). */
  def bigramCoherence(df: DataFrame, idCol: String, textCol: String,
                      vocabBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    val toks = tokens(lower(coalesce(col(textCol), lit(""))))
    val nPairs = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), nPairs), slice(toks, lit(2), nPairs),
      (a, b) => concat_ws(" ", a, b))
    val tf0 = df
      .select(col(idCol).as("id"),
        explode(concat(array(lit("")), bigrams)).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("tf"))
    val tf = tf0.where(when(col("tf") >= 1, length(col("bg")) > 0))
    val vocab = tf.groupBy(col("bg"))
      .agg(sum(when(col("tf") >= 1, col("tf"))).as("cnt"))
    val lead = vocab.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("cnt")).as("lcnt"))
    val hintOk =
      vocab.queryExecution.optimizedPlan.stats.sizeInBytes <= vocabBroadcastMaxBytes
    val vocabHinted = if (hintOk) broadcast(vocab) else vocab
    val leadHinted = if (hintOk) broadcast(lead) else lead
    tf.join(vocabHinted, Seq("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(leadHinted, Seq("w1"))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("cnt")).as("bigram_mass"),
        sum(col("tf") * col("lcnt")).as("lead_mass"))
      .withColumn("cond_score",
        col("bigram_mass").cast("double") / col("lead_mass").cast("double"))
  }

  /** DSIR-style targeted-data selection scores (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling")
    * without logarithms: rank raw-corpus documents by how much they look
    * like a TARGET sub-corpus (the rows where `isTarget` holds — a
    * curated domain, a language, a quality tier). The unigram importance
    * weight p_target(doc)/p_raw(doc) is replaced by its rational
    * mean-frequency surrogate
    *
    *   ratio = (Σ tf·tcnt / target_toks) / (Σ tf·cnt / total_toks)
    *
    * (mean target-corpus frequency over mean raw-corpus frequency of the
    * doc's tokens) — a monotone stand-in for the likelihood ratio that
    * both engines compute bit-identically: integer masses, two exact
    * double casts, one product each side, one division. ln()-based
    * per-token log-likelihoods would drift across libms (the d29/d18
    * lesson). Selection = ORDER BY ratio DESC, id LIMIT n, which Spark
    * plans as TakeOrderedAndProject — no global sort at any scale.
    *
    * Scale shape: identical to [[unigramFamiliarity]] — ONE corpus
    * tokenize; vocabulary (with its conditional target counts riding the
    * same aggregate), the totals row and the scoring join's left side
    * all consume one reused (id, is_target, term) exchange; vocab is
    * broadcast-hinted under a plan-stats guard with AQE as the at-scale
    * mechanism. `target_mass` ≤ n_tokens(doc)·n_tokens(target): the
    * BIGINT headroom note on unigramFamiliarity applies unchanged.
    *
    * The target predicate must select a non-empty sub-corpus — with
    * target_toks = 0 every ratio is 0/0 (NaN, no rows selected).
    * Output: (id, n_tokens, target_mass, raw_mass, ratio). */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       isTarget: Column,
                       vocabBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    val tf0 = df
      .select(col(idCol).as("id"),
        coalesce(isTarget.cast("boolean"), lit(false)).as("is_target"),
        explode(concat(array(lit("")),
          tokens(lower(coalesce(col(textCol), lit("")))))).as("term"))
      .groupBy(col("id"), col("is_target"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tf = tf0.where(when(col("tf") >= 1, length(col("term")) > 0))
    val vocab = tf.groupBy(col("term"))
      .agg(sum(when(col("tf") >= 1, col("tf"))).as("cnt"),
        sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("tcnt"))
    val totals = tf.agg(
      sum(when(col("tf") >= 1, col("tf"))).as("total_toks"),
      sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("target_toks"))
    val vocabHinted =
      if (vocab.queryExecution.optimizedPlan.stats.sizeInBytes <= vocabBroadcastMaxBytes)
        broadcast(vocab)
      else vocab
    tf.join(vocabHinted, Seq("term"))
      .crossJoin(broadcast(totals))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("tcnt")).as("target_mass"),
        sum(col("tf") * col("cnt")).as("raw_mass"),
        max(col("total_toks")).as("__total"),
        max(col("target_toks")).as("__target"))
      .withColumn("ratio",
        (col("target_mass").cast("double") * col("__total").cast("double")) /
          (col("raw_mass").cast("double") * col("__target").cast("double")))
      .select(col("id"), col("n_tokens"), col("target_mass"),
        col("raw_mass"), col("ratio"))
  }

  /** Corpus-novelty scores: for each document, the fraction of its
    * DISTINCT `width`-token grams that appear in NO other document.
    * The inter-document complement of [[repetitionSignals]] (which is
    * intra-doc): a doc full of corpus-wide boilerplate scores near 0, a
    * doc of fresh text near 1 — the "originality" axis used to
    * up-weight novel data and as a cheap memorization-risk proxy
    * (low-novelty docs are the ones models reproduce verbatim).
    * Gram keys are the d27 span keys (case-normalized, space-joined,
    * md5) at the same width, so a novelty threshold composes with the
    * span-removal pass over one shared vocabulary of shapes.
    *
    * Scale shape: ONE corpus tokenize; the distinct-(id, gram) frame is
    * built by groupBy so the (id, gram) exchange is the only shuffle of
    * gram bytes, REUSED by both the doc-frequency aggregate and the
    * scoring join's left side ([[keywordScores]]' sentinel-guard
    * construction, plan-asserted); doc frequency aggregates with
    * map-side combine (no window — a ubiquitous gram would make a
    * single-partition window straggle at 10⁹ docs); the df frame is
    * broadcast-hinted under a plan-stats guard with AQE as the at-scale
    * mechanism. Docs shorter than `width` tokens emit no grams and no
    * row (same contract as d27).
    *
    * Output: (id, n_grams, unique_grams, novelty). */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
                    width: Int = 4,
                    dfBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    // alias the text column (a caller whose text column is literally
    // named "id" would otherwise produce two "id" columns after the
    // projection below — the other spread call sites rename for the
    // same reason; ADVICE r17)
    val toks = tokens(lower(coalesce(col("__sftxt"), lit(""))))
    val gramArr = when(size(toks) < width, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - width),
        i => md5(concat_ws(" ", slice(toks, i + lit(1), lit(width))))))
    // spread before the gram explode: ~|tokens| md5 rows per doc would
    // otherwise generate on ONE core off a single-small-file scan (r17
    // profile: d37 spent 3.1s in a single-task gram stage)
    val g0 = Dedup.spreadForCompute(df.select(col(idCol).as("id"),
        col(textCol).as("__sftxt")))
      .select(col("id"), explode(gramArr).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val g = g0.where(when(col("cnt") >= 1, length(col("gram")) > 0))
    val dfreq = g.groupBy(col("gram"))
      .agg(count(when(col("cnt") >= 1, lit(1))).as("df"))
    val dfreqHinted =
      if (dfreq.queryExecution.optimizedPlan.stats.sizeInBytes <= dfBroadcastMaxBytes)
        broadcast(dfreq)
      else dfreq
    g.join(dfreqHinted, Seq("gram"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("unique_grams"))
      .withColumn("novelty",
        col("unique_grams").cast("double") / col("n_grams").cast("double"))
  }

  /** Tokenizer-prep vocabulary induction + per-document OOV rates: build
    * the top-`vocabSize` term vocabulary (by corpus count, ties broken
    * lexicographically — fully deterministic, no sampling) and report
    * each document's out-of-vocabulary token mass against it. This is
    * the coverage study run before committing to a tokenizer vocab
    * size: sweep `vocabSize`, watch the corpus-level OOV mass fall.
    * Differs from [[unigramFamiliarity]]'s rare-token mass (a relative
    * frequency bar) in that the vocabulary is an explicit SIZE-bounded
    * artifact — the thing a tokenizer trainer actually ships.
    *
    * Scale shape: ONE corpus tokenize; the (id, term) exchange feeds
    * both the vocabulary aggregate and the scoring join (sentinel-guard
    * reuse, plan-asserted). The vocabulary cut is orderBy+limit, which
    * Spark plans as TakeOrderedAndProject — per-partition top-V then a
    * V-row driver merge, no global sort — and the resulting ≤V-row
    * frame joins by explicit broadcast (it is small by construction).
    * Output: (id, n_tokens, oov_tokens, oov_rate). */
  def vocabOovRates(df: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    val tf0 = df
      .select(col(idCol).as("id"),
        explode(concat(array(lit("")),
          tokens(lower(coalesce(col(textCol), lit(""))))))
          .as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val tf = tf0.where(when(col("tf") >= 1, length(col("term")) > 0))
    val vocab = tf.groupBy(col("term"))
      .agg(sum(when(col("tf") >= 1, col("tf"))).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(lit(0L)))
          .as("oov_tokens"))
      .withColumn("oov_rate",
        col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    winnowingMinima(charGramHashes(lower(text), k), w)

  /** Distributed BPE pair statistics: corpus-weighted counts of adjacent
    * character pairs — the inner-loop statistic of BPE vocabulary
    * induction (Sennrich et al. 2016), whose most frequent pair is the
    * next merge. The classic scaling trick is structural here: the
    * corpus contributes ONE word-count aggregate (map-side combined;
    * only distinct words shuffle), and the quadratic-ish pair explode
    * runs over the VOCABULARY weighted by word frequency — at 100 TB
    * the vocab is millions of rows where the corpus is trillions, so
    * the expensive stage rides the small frame. The cut is
    * (count desc, pair asc) via orderBy+limit — TakeOrderedAndProject,
    * never a global sort.
    *
    * Single-character words contribute no pairs (the sequence guard —
    * Spark's sequence(1, 0) would count DOWN). A word of n chars
    * contributes n-1 pairs including repeats ("aaa" counts "aa" twice),
    * the exact multiset BPE training uses.
    * Output: (pair, n), the top-`topK` merge candidates. */
  def bpePairStats(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val wc = df
      .select(explode(tokens(lower(coalesce(col(textCol), lit("")))))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    val pairArr = when(length(col("w")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2))))
    wc.select(col("wf"), explode(pairArr).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topK)
  }

  /** Term-distribution drift between two corpus slices — the monitoring
    * view a pipeline publishes when a crawl refresh, a new source, or a
    * filter change lands: which terms moved, and by how much in total
    * (total-variation distance). `sideA` is any boolean expression over
    * the input (source = 'x', a snapshot-date predicate, lang = 'en').
    *
    * All drift arithmetic is EXACT integer cross-multiplication —
    * |cnt_a·nb − cnt_b·na| avoids per-term divisions whose rounding
    * differs nowhere but whose SUM would be partition-order-dependent;
    * the bigint sum is order-free, and TVD = Σ/(2·na·nb) is computed in
    * ONE final division. Overflow bound: cnt·n < 2^63 holds through
    * ~3×10^9 tokens per side; beyond that (a 100 TB corpus is ~10^13
    * tokens) drift-monitor on per-source/per-shard slices or a d16
    * deterministic sample — the statistic is an estimate of the same
    * TVD and the integer exactness is preserved within the slice.
    *
    * Scale shape: one corpus tokenize with map-side combine into a
    * vocabulary-sized (term, cnt_a, cnt_b) frame — the corpus never
    * shuffles, only distinct terms do; totals and the global TVD
    * numerator are 1-row aggregates over that tiny frame riding
    * broadcast cross joins; the top-`topK` movers cut is
    * (drift_num desc, term asc) orderBy+limit — TakeOrderedAndProject,
    * never a global sort.
    *
    * Output: (term, cnt_a, cnt_b, na, nb, drift_num, tvd) — the topK
    * movers, each carrying the corpus-level scalars. */
  def distributionDrift(df: DataFrame, textCol: String, sideA: Column,
                        topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = df
      .select(col(textCol).as("__text"), sideA.as("__a"))
      .select(explode(tokens(lower(coalesce(col("__text"), lit("")))))
        .as("term"), col("__a"))
      .groupBy(col("term"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("cnt_b"))
    driftCore(counts, topK)
  }

  /** Shared tail of [[distributionDrift]] and [[driftAgainstProfile]]:
    * from a (term, cnt_a, cnt_b) frame, the exact cross-multiplied
    * movers + corpus TVD. The counts frame persists (three consumers:
    * totals, TVD numerator, the movers cut). */
  private def driftCore(counts0: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = counts0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(sum(col("cnt_a")).as("na"),
      sum(col("cnt_b")).as("nb"))
    val withNum = counts.crossJoin(broadcast(totals))
      .withColumn("drift_num",
        abs(col("cnt_a") * col("nb") - col("cnt_b") * col("na")))
    val tvdNum = withNum.agg(sum(col("drift_num")).as("__tvd_num"))
    val out = withNum.crossJoin(broadcast(tvdNum))
      .withColumn("tvd", col("__tvd_num").cast("double") /
        (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
      .select(col("term"), col("cnt_a"), col("cnt_b"), col("na"), col("nb"),
        col("drift_num"), col("tvd"))
      .orderBy(col("drift_num").desc, col("term").asc)
      .limit(topK)
    graft.llm.Dedup.materializeAndRelease(out, counts)
  }

  /** The vocabulary-sized (term, cnt) profile [[driftAgainstProfile]]
    * compares against — one tokenize with map-side combine. */
  def termProfile(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(lower(coalesce(col(textCol), lit("")))))
        .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Persist a [[termProfile]] as the next immutable snapshot of a
    * [[LayoutStore]] — the cross-RUN form of [[distributionDrift]]: a
    * scheduled pipeline writes its corpus's term profile each run and
    * the next run drifts against the pinned-newest snapshot, so "did
    * this crawl move" needs no access to last month's corpus, only to
    * its vocabulary-sized profile. Returns the new version. */
  def writeTermProfileSnapshot(df: DataFrame, textCol: String,
                               path: String): Long =
    LayoutStore.writeSnapshot(
      df.sparkSession.sparkContext.hadoopConfiguration, path) { tmp =>
      termProfile(df, textCol).write.mode("overwrite")
        .parquet(s"$tmp/terms")
    }

  /** Drift of `df`'s term distribution against the newest persisted
    * profile snapshot (side A = current corpus, side B = the snapshot):
    * same exact integer cross-multiplication and single-division TVD as
    * [[distributionDrift]], with terms absent from one side counting 0
    * there (full-outer join of two vocabulary-sized frames — the corpus
    * itself never joins). A refreshed profile RETIRES the old one by
    * construction: the probe pins the newest version, and the m31
    * oracle (built from the refresh slice alone) fails on any stale-
    * version leakage. */
  def driftAgainstProfile(spark: org.apache.spark.sql.SparkSession,
                          df: DataFrame, textCol: String, path: String,
                          topK: Int,
                          version: Option[Long] = None): DataFrame = {
    val current = termProfile(df, textCol)
      .select(col("term"), col("cnt").as("cnt_a"))
    val profile = LayoutStore.readSnapshotTable(spark, path, "terms", version)
      .select(col("term"), col("cnt").as("cnt_b"))
    driftCore(current.join(profile, Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b")), topK)
  }

  /** Cross-run familiarity: score INCOMING docs against the FROZEN
    * reference vocabulary of a persisted [[writeTermProfileSnapshot]]
    * (pinned-newest, or an explicit `version`) — the serving-time form
    * of [[unigramFamiliarity]], whose vocabulary is the batch itself.
    * The distinction matters operationally: an ingest filter must judge
    * a document by what the CORPUS looks like, not by what this hour's
    * batch looks like (a batch of spam is perfectly familiar to
    * itself), and against a frozen reference a term can be absent —
    * `novel_tokens` counts that mass (novel ⊆ rare: an absent term has
    * cnt 0 < ref_total). All integer sums off one (id, term) exchange,
    * profile broadcast under the same plan-stats guard as
    * [[unigramFamiliarity]] (best-effort; AQE is the at-scale
    * mechanism), two per-doc IEEE divisions. Tokenless docs emit no
    * row (no terms to score — same contract as unigramFamiliarity).
    * Output: (id, n_tokens, ref_mass, novel_tokens, rare_tokens,
    * mean_ref_freq, novel_rate). */
  /** Per-stratum drift ATTRIBUTION against a pinned profile snapshot —
    * the actionable form of [[driftAgainstProfile]]'s corpus-level TVD:
    * when the alarm fires, this says WHICH source moved (one crawl
    * domain turning over its vocabulary reads as mild corpus drift but
    * extreme single-source drift). Per stratum s: TVD_s between the
    * stratum's term distribution and the reference, via the same exact
    * integer cross-multiplication — with the reference-only mass folded
    * in CLOSED FORM (Σ_{t∉cur_s} cb = nb − Σ_{t∈cur_s} cb), so the join
    * is only (stratum-terms LEFT profile): no stratum × vocabulary
    * expansion ever materializes. One (stratum, term) exchange; profile
    * broadcast under the d56 plan-stats guard; ONE double division per
    * stratum. Output: (stratum, na, nb, drift_num, tvd). */
  def driftBySource(spark: org.apache.spark.sql.SparkSession,
                    df: DataFrame, strataCol: String, textCol: String,
                    path: String, version: Option[Long] = None,
                    vocabBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    val profile = LayoutStore.readSnapshotTable(spark, path, "terms", version)
      .select(col("term"), col("cnt").as("cb"))
    val nbDf = profile.agg(sum(col("cb")).as("nb"))
    val cur = df.select(col(strataCol).cast("string").as("stratum"),
        explode(tokens(lower(coalesce(col(textCol), lit(""))))).as("term"))
      .groupBy(col("stratum"), col("term")).agg(count(lit(1)).as("ca"))
    val nas = cur.groupBy(col("stratum")).agg(sum(col("ca")).as("na"))
    val profHinted =
      if (profile.queryExecution.optimizedPlan.stats.sizeInBytes
          <= vocabBroadcastMaxBytes) broadcast(profile)
      else profile
    val cb0 = coalesce(col("cb"), lit(0L))
    cur.join(profHinted, Seq("term"), "left_outer")
      .join(broadcast(nas), Seq("stratum"))
      .crossJoin(broadcast(nbDf))
      .groupBy(col("stratum"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        (sum(abs(col("ca") * col("nb") - cb0 * col("na"))) +
          max(col("na")) * (max(col("nb")) - sum(cb0))).as("drift_num"))
      .withColumn("tvd", col("drift_num").cast("double") /
        (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
  }

  def familiarityAgainstProfile(spark: org.apache.spark.sql.SparkSession,
                                df: DataFrame, idCol: String,
                                textCol: String, path: String,
                                rareDenom: Long = 100,
                                version: Option[Long] = None,
                                vocabBroadcastMaxBytes: Long = 64L << 20)
      : DataFrame = {
    require(rareDenom >= 1, s"rareDenom must be >= 1: $rareDenom")
    val profile = LayoutStore.readSnapshotTable(spark, path, "terms", version)
      .select(col("term"), col("cnt"))
    val total = profile.agg(sum(col("cnt")).as("ref_total"))
    val tf = df.select(col(idCol).as("id"),
        explode(tokens(lower(coalesce(col(textCol), lit(""))))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val profHinted =
      if (profile.queryExecution.optimizedPlan.stats.sizeInBytes
          <= vocabBroadcastMaxBytes) broadcast(profile)
      else profile
    tf.join(profHinted, Seq("term"), "left_outer")
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * coalesce(col("cnt"), lit(0L))).as("ref_mass"),
        sum(when(col("cnt").isNull, col("tf")).otherwise(lit(0L)))
          .as("novel_tokens"),
        sum(when(coalesce(col("cnt"), lit(0L)) * rareDenom < col("ref_total"),
          col("tf")).otherwise(lit(0L))).as("rare_tokens"))
      .withColumn("mean_ref_freq",
        col("ref_mass").cast("double") / col("n_tokens").cast("double"))
      .withColumn("novel_rate",
        col("novel_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Heaps'-law vocabulary growth curve: exact distinct-vocabulary size,
    * token and doc counts of the first 1/B, 2/B, ..., B/B of the corpus
    * (deterministic id-mod buckets) — the "is new data still adding new
    * language?" gauge that decides whether the next crawl is worth
    * ingesting. The obvious formulation expands every (doc, term) pair
    * into all the tenths containing it (a B-fold blow-up of the token
    * exchange); this one never expands: vocabulary growth is the
    * cumulative histogram of each term's FIRST-SEEN bucket (a term is in
    * tenth i's vocabulary iff min-bucket < i), so the corpus pays ONE
    * (term) exchange for the min-bucket aggregate plus one tiny
    * per-bucket count frame, and the cumulation runs over B rows.
    * Docs with zero tokens don't count toward n_docs (they contribute
    * no language). Output: (tenth, n_docs, n_tokens, vocab), B rows. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val tok = df.select(
      pmod(col(idCol), lit(buckets)).cast("int").as("__b"),
      col(idCol).as("__id"),
      explode(tokens(lower(coalesce(col(textCol), lit(""))))).as("__term"))
    val newVocab = tok.groupBy(col("__term")).agg(min(col("__b")).as("__fb"))
      .groupBy(col("__fb")).agg(count(lit(1)).as("__nv"))
    val perBucket = tok.groupBy(col("__b")).agg(count(lit(1)).as("__nt"),
      countDistinct(col("__id")).as("__nd"))
    val tenths = df.sparkSession.range(1, buckets + 1)
      .select(col("id").as("tenth"))
    // LEFT joins onto the tenths frame: a tenth whose prefix buckets are
    // all empty (sparse/clustered id space, tokenless leading slice)
    // must still report a 0-row, not vanish — the curve's contract is
    // exactly `buckets` rows.
    val vocab = tenths.join(newVocab, col("__fb") < col("tenth"), "left")
      .groupBy(col("tenth"))
      .agg(coalesce(sum(col("__nv")), lit(0L)).as("vocab"))
    tenths.join(perBucket, col("__b") < col("tenth"), "left")
      .groupBy(col("tenth"))
      .agg(coalesce(sum(col("__nd")), lit(0L)).as("n_docs"),
        coalesce(sum(col("__nt")), lit(0L)).as("n_tokens"))
      .join(vocab, Seq("tenth"))
      .select(col("tenth"), col("n_docs"), col("n_tokens"), col("vocab"))
  }

  /** Distinct-cardinality monitor — the one sketch family the monitor
    * stack was missing: per-source AND whole-run distinct-doc /
    * distinct-term cardinality in ONE rollup pass (the "did this crawl
    * batch collapse to near-duplicate ids / is the vocabulary still
    * growing" gauge next to d48's distribution drift).
    *
    * Two regimes behind one schema (the d50 sketch contract):
    * `approximate = false` uses exact count(DISTINCT) — engine-exact,
    * what the oracle gates bit-for-bit; `approximate = true` swaps in
    * HyperLogLog++ (`approx_count_distinct`, relative error `rsd`) —
    * the 100 TB configuration, because the exact distinct-term count
    * plans as an Expand + full (term) exchange whose shuffle IS the
    * bottleneck at corpus scale, while the HLL sketch merges as
    * fixed-size partial aggregates through the same rollup (map-side
    * partials, kilobytes per group, no term ever shuffles). Error is
    * DOCUMENTED (±rsd), not gated — swap regimes, not schemas, when a
    * run outgrows exact.
    *
    * Tokenless docs still count toward distinct_docs (explode_outer —
    * their token row is null, which count/distinct-term ignore).
    * Output: (source, is_total, distinct_docs, n_tokens,
    * distinct_terms); per-source rows plus ONE `__all__` total row
    * (is_total = 1) — the global distinct-term cardinality is NOT the
    * sum of the per-source rows, which is why the rollup computes it
    * in the same pass. */
  def cardinalityMonitor(df: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, approximate: Boolean = false,
                         rsd: Double = 0.05): DataFrame = {
    val ex = df.select(col(sourceCol).as("__src"), col(idCol).as("__id"),
      explode_outer(tokens(lower(coalesce(col(textCol), lit("")))))
        .as("__t"))
    def distinct(c: Column): Column =
      if (approximate) approx_count_distinct(c, rsd) else countDistinct(c)
    ex.rollup(col("__src"))
      .agg(grouping(col("__src")).cast("int").as("is_total"),
        distinct(col("__id")).as("distinct_docs"),
        count(col("__t")).as("n_tokens"),
        distinct(col("__t")).as("distinct_terms"))
      .select(coalesce(col("__src"), lit("__all__")).as("source"),
        col("is_total"), col("distinct_docs"), col("n_tokens"),
        col("distinct_terms"))
  }
}

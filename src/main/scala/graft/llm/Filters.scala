package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4/Gopher-style rule-based document filtering with per-rule attrition
  * accounting — the gate chain every pretraining pipeline runs FIRST
  * (before dedup and model-based scoring), and whose per-rule drop
  * counts are the funnel dashboard operators watch when a crawl batch
  * goes bad.
  *
  * Drift-proofing follows the [[Pii]] pattern, taken one step further:
  * the gates are predicate STRINGS over a fixed feature vector, written
  * in the comparison/boolean subset that Spark SQL and DuckDB parse
  * identically — the same string compiles in both engines
  * (`expr(predicate)` here, spliced verbatim into the oracle CTE there),
  * so a gate cannot mean two things. The features themselves are
  * integer counts over explicit ASCII regex classes (the portability
  * contract documented on [[Pii]]: no `\d`/`\w`/`\s` shorthands, no
  * lookaround) plus the house whitespace tokenizer — each audited once,
  * here and in the generated SQL twin.
  *
  * Ratio gates are integer cross-multiplications (`n_sym * 10 >
  * n_chars * 3`, i.e. symbol ratio > 0.3) — never a division, so empty
  * docs produce exact 0>0 comparisons instead of engine-dependent
  * NaN/null orderings.
  *
  * The verdict is the FIRST failing gate (gates apply in order, like
  * [[Pii.defaultRules]]): attrition attributes each doc to exactly one
  * rule, which is what makes the funnel counts sum to the corpus size.
  *
  * Scale shape: one projection over the scan — zero exchanges, zero
  * joins; at 100 TB this runs entirely inside the parquet scan stage
  * (plan-guarded in the spec). Funnel counts are a ~|gates|-row
  * aggregate over the verdict column.
  */
object Filters {

  /** One ordered gate: `predicate` is a boolean SQL expression over the
    * feature columns (`n_tokens`, `max_tok_len`, `n_chars`, `n_sym`,
    * `n_upper`, `n_alpha`, `ends_sentence`), restricted to the
    * Spark/DuckDB-common subset: comparisons, integer arithmetic,
    * AND/OR/NOT. A doc is dropped by the first gate whose predicate
    * holds. */
  final case class Gate(name: String, predicate: String)

  /** The default gate chain, in application order. Thresholds are the
    * common public-pipeline ballpark (C4 drops <5-word pages; Gopher
    * bounds symbol ratios and word lengths); the POINT is the ordered
    * attribution machinery, not the exact constants. */
  val defaultGates: Seq[Gate] = Seq(
    Gate("too_short", "n_tokens < 5"),
    Gate("long_token", "max_tok_len > 25"),
    Gate("symbolic", "n_sym * 10 > n_chars * 3"),
    Gate("shouting", "n_upper * 2 > n_alpha"),
    Gate("no_terminal_punct", "NOT ends_sentence"))

  /** Feature columns both engines compute from `text` identically.
    * `max_tok_len` is null for tokenless docs (list_max of an empty
    * list) — every default gate referencing it is then non-true in both
    * engines (SQL three-valued logic), which `too_short` makes moot by
    * catching tokenless docs first. */
  private def features(textCol: Column): Seq[(String, Column)] = {
    val toks = TextAnalysis.tokens(textCol)
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "max_tok_len" -> array_max(transform(toks, t => length(t))).cast("long"),
      "n_chars" -> length(textCol).cast("long"),
      "n_sym" -> regexp_count(textCol, lit("[^A-Za-z0-9 ]")).cast("long"),
      "n_upper" -> regexp_count(textCol, lit("[A-Z]")).cast("long"),
      "n_alpha" -> regexp_count(textCol, lit("[A-Za-z]")).cast("long"),
      "ends_sentence" -> (regexp_count(rtrim(textCol), lit("[.!?]$")) > 0))
  }

  /** Per-doc gate outcomes: the feature vector plus `verdict` = name of
    * the first failing gate, or 'kept'. One map-side projection. */
  def funnel(df: DataFrame, idCol: String, textCol: String,
             gates: Seq[Gate] = defaultGates): DataFrame = {
    require(gates.nonEmpty, "at least one gate required")
    require(gates.map(_.name).distinct.size == gates.size,
      s"duplicate gate names: ${gates.map(_.name)}")
    require(!gates.exists(_.name == "kept"), "'kept' is the pass verdict")
    val feats = features(col(textCol))
    val featured = df.select(col(idCol).as("id") +:
      feats.map { case (n, c) => c.as(n) }: _*)
    val verdict = coalesce(
      gates.map(g => when(expr(g.predicate), lit(g.name))) :+ lit("kept"): _*)
    featured.withColumn("verdict", verdict)
  }

  /** The numeric slice of [[features]] used by the learned classifier,
    * with `max_tok_len` nulls (tokenless docs) coalesced to 0 so the
    * feature vector is total. Shared by fit and scoring so the model
    * can never see a different feature definition than the scorer. */
  private def numericFeatures(textCol: Column): Seq[(String, Column)] =
    features(textCol).collect {
      case (n @ "max_tok_len", c) => n -> coalesce(c, lit(0L))
      case (n, c) if n != "ends_sentence" => n -> c
    }

  /** Fit a logistic-regression quality classifier over the funnel's
    * numeric features — the learned stand-in for hand-tuned gate
    * thresholds (the fastText-classifier role in public pipelines:
    * GPT-3's quality LR, RedPajama's fasttext filter — here over
    * interpretable surface features instead of bag-of-words). The fit
    * is distributed (Spark ML L-BFGS); the result is a frozen
    * (coefficients, intercept) pair to ship as literals, exactly the
    * [[Similarity.fitCentroids]] freeze pattern — at 100 TB you fit on
    * a sample and score the corpus map-side with [[qualityMargin]].
    * `label` is any boolean weak-label expression (a curated subset
    * flag, a source-level prior). */
  def fitQualityModel(df: DataFrame, textCol: String, label: Column,
                      maxIter: Int = 50, regParam: Double = 0.01)
      : (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val feats = numericFeatures(col(textCol))
    val data = df.select(
      coalesce(label.cast("double"), lit(0.0)).as("__label"),
      array_to_vector(array(feats.map(_._2.cast("double")): _*)).as("__feat"))
    val m = new LogisticRegression().setFeaturesCol("__feat")
      .setLabelCol("__label").setMaxIter(maxIter).setRegParam(regParam)
      .fit(data)
    (m.coefficients.toArray, m.intercept)
  }

  /** Score every doc with a frozen [[fitQualityModel]] result: margin =
    * intercept + w·features as ONE left-to-right literal fold (no
    * sigmoid — exp() drifts across libms, and the margin is monotone in
    * the probability, so thresholding is equivalent), `pred` = margin >
    * 0. Pure map-side codegen'd arithmetic in the scan stage. Output:
    * (id, the feature columns, margin, pred). */
  def qualityMargin(df: DataFrame, idCol: String, textCol: String,
                    weights: Array[Double], intercept: Double): DataFrame = {
    val feats = numericFeatures(col(textCol))
    require(weights.length == feats.size,
      s"expected ${feats.size} weights (one per numeric feature), got ${weights.length}")
    val featured = df.select(col(idCol).as("id") +:
      feats.map { case (n, c) => c.as(n) }: _*)
    val margin = feats.map(_._1).zip(weights).foldLeft(lit(intercept)) {
      case (acc, (name, w)) => acc + lit(w) * col(name).cast("double")
    }
    featured.withColumn("margin", margin).withColumn("pred", col("margin") > 0.0)
  }

  /** DuckDB twin of [[qualityMargin]], generated from the SAME frozen
    * literals (Double.toString round-trips through strtod) and the same
    * left-to-right fold, so both engines emit bit-identical margins. */
  def qualityMarginOracleSql(fromSql: String, idCol: String,
                             weights: Array[Double], intercept: Double): String = {
    val featSql = Seq(
      "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens",
      "CAST(COALESCE(list_max(list_transform(list_filter(string_split(text, ' '), " +
        "x -> x <> ''), x -> len(x))), 0) AS BIGINT) AS max_tok_len",
      "CAST(length(text) AS BIGINT) AS n_chars",
      "CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_sym",
      "CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper",
      "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha")
    val names = Seq("n_tokens", "max_tok_len", "n_chars", "n_sym",
      "n_upper", "n_alpha")
    require(weights.length == names.size)
    // Exponent-suffixed double literals: a bare decimal literal is typed
    // DECIMAL in DuckDB, whose cast to DOUBLE can land 1 ulp off the
    // Java double for 17-significant-digit coefficients (observed on a
    // sf0.001 fit: -0.0019617645090045086 parsed to ...4508). The
    // exponent suffix makes the parser produce a correctly-rounded
    // DOUBLE directly — the literal IS the Java double, bit for bit.
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('E') || s.contains('e')) s else s + "e0"
    }
    val margin = names.zip(weights).foldLeft(s"CAST(${dlit(intercept)} AS DOUBLE)") {
      case (acc, (n, w)) =>
        s"($acc + CAST(${dlit(w)} AS DOUBLE) * CAST($n AS DOUBLE))"
    }
    s"""WITH f AS (SELECT $idCol AS id,
       |    ${featSql.mkString(",\n    ")}
       |  FROM ($fromSql))
       |SELECT id, n_tokens, max_tok_len, n_chars, n_sym, n_upper, n_alpha,
       |  $margin AS margin, ($margin > 0.0) AS pred
       |FROM f""".stripMargin
  }

  /** Term → feature bucket for the hashed bag-of-words classifier:
    * first 8 md5 hex digits of (salt|term) → 32-bit int → mod dim.
    * The [[graft.llm.Sampling.sampleKey]] hash recipe applied to TERMS,
    * so the DuckDB twin replays it with the same strpos hex assembly as
    * shardAssignOracleSql. */
  private def bowBucket(term: Column, dim: Int, salt: String): Column =
    (conv(substring(md5(concat_ws("|", lit(salt), term)), 1, 8), 16, 10)
      .cast("long") % dim).cast("int")

  /** Fit a logistic regression over HASHED bag-of-words features — the
    * actual fastText/CCNet-classifier shape (term-level evidence, not
    * surface counts like [[fitQualityModel]]): each token hashes into
    * one of `dim` buckets ([[bowBucket]]) and the feature vector is the
    * per-doc bucket count. Feature hashing is what makes this work at
    * corpus scale — the feature space is FIXED at `dim` regardless of
    * vocabulary size, there is no vocabulary dict to build, broadcast,
    * or version, and an unseen term at scoring time lands in a trained
    * bucket instead of out-of-vocabulary. Fit is distributed (Spark ML
    * L-BFGS); per-doc vectors are built map-side by HOFs (no explode,
    * no exchange — O(dim · n_tokens) per doc, fine for a fit SAMPLE;
    * at 100 TB fit on a sample and score the corpus with
    * [[hashedBowMargin]]). Returns frozen (weights[dim], intercept). */
  def fitHashedBowModel(df: DataFrame, textCol: String, label: Column,
                        dim: Int = 64, salt: String = "bow1",
                        maxIter: Int = 50, regParam: Double = 0.01)
      : (Array[Double], Double) = {
    require(dim >= 2 && dim <= 4096, s"dim must be in [2, 4096]: $dim")
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val toks = TextAnalysis.tokens(lower(coalesce(col(textCol), lit(""))))
    val bkts = transform(toks, t => bowBucket(t, dim, salt))
    val counts = transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(bkts, b => b === i)).cast("double"))
    val data = df.select(
      coalesce(label.cast("double"), lit(0.0)).as("__label"),
      array_to_vector(counts).as("__feat"))
    val m = new LogisticRegression().setFeaturesCol("__feat")
      .setLabelCol("__label").setMaxIter(maxIter).setRegParam(regParam)
      .fit(data)
    (m.coefficients.toArray, m.intercept)
  }

  /** Score every doc with a frozen [[fitHashedBowModel]]: margin =
    * intercept + Σ_tokens weights[bucket(token)], folded LEFT-TO-RIGHT
    * over the token list (margin is linear in bucket counts, so the
    * count vector never materializes — one codegen'd `aggregate` HOF
    * per doc in the scan stage, zero exchanges, and the weight array
    * rides the plan as a dim-sized literal). No sigmoid (exp() drifts
    * across libms; the margin is monotone in the probability). Output:
    * (id, n_tokens, margin, pred). */
  def hashedBowMargin(df: DataFrame, idCol: String, textCol: String,
                      weights: Array[Double], intercept: Double,
                      salt: String = "bow1"): DataFrame = {
    val dim = weights.length
    require(dim >= 2, s"need at least 2 weights, got $dim")
    val wLit = array(weights.map(lit): _*)
    val toks = TextAnalysis.tokens(lower(coalesce(col(textCol), lit(""))))
    val margin = aggregate(toks, lit(intercept),
      (acc, t) => acc + element_at(wLit, bowBucket(t, dim, salt) + 1))
    df.select(col(idCol).as("id"), size(toks).cast("long").as("n_tokens"),
        margin.as("margin"))
      .withColumn("pred", col("margin") > 0.0)
  }

  /** DuckDB twin of [[hashedBowMargin]], generated from the SAME frozen
    * literals: tokens → 8-hex md5 keys → strpos hex assembly mod dim →
    * weight list lookups, left-folded from the intercept via
    * list_reduce(list_prepend(b, ...)) in the SAME order as Spark's
    * `aggregate`. Weight literals are exponent-suffixed ([[dlit]]'s
    * correctly-rounded-DOUBLE contract). */
  def hashedBowMarginOracleSql(fromSql: String, idCol: String,
                               weights: Array[Double], intercept: Double,
                               salt: String = "bow1"): String = {
    val dim = weights.length
    require(dim >= 2, s"need at least 2 weights, got $dim")
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('E') || s.contains('e')) s else s + "e0"
    }
    val hexVal = (1 to 8).map { i =>
      val scale = 1L << (4 * (8 - i))
      s"(strpos('0123456789abcdef', substr(sk, $i, 1)) - 1) * CAST($scale AS BIGINT)"
    }.mkString(" + ")
    val wList = weights.map(w => s"CAST(${dlit(w)} AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""WITH f AS (SELECT $idCol AS id,
       |    list_filter(string_split(lower(coalesce(text, '')), ' '),
       |      x -> x != '') AS toks
       |  FROM ($fromSql)),
       |m AS (SELECT id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(${dlit(intercept)} AS DOUBLE),
       |      list_transform(
       |        list_transform(toks,
       |          t -> substr(md5('$salt' || '|' || t), 1, 8)),
       |        sk -> ($wList)[CAST(($hexVal) % $dim AS INTEGER) + 1])),
       |      (a, x) -> a + x) AS margin
       |  FROM f)
       |SELECT id, n_tokens, margin, (margin > 0.0) AS pred FROM m""".stripMargin
  }

  /** Per-stratum percentile calibration of an integer quality score —
    * the normalization step before a single global keep-threshold can
    * be applied across heterogeneous sources (a raw score of 700 means
    * different things on Wikipedia vs a web crawl; its within-source
    * percentile is comparable). Emits SQL-standard `percent_rank`
    * ((rank−1)/(n−1), 0.0 for a singleton stratum) without ever
    * sorting the documents: the score HISTOGRAM (one hash aggregate,
    * ≤ |strata|·|score domain| rows — ~10³ per source for a permille
    * score) takes the only window, and docs join the calibrated rows
    * back by (stratum, score) via broadcast. At 100 TB the per-doc
    * path is scan → map-side partial agg → one broadcast-hash join;
    * a 90%-of-corpus mega-source costs the same as a tiny one because
    * only its ≤1001 histogram rows ever sit in a window frame — the
    * d26 bucketed-prefix-sum insight applied to ranks. `scoreCol`
    * must be integral (exact tie semantics; float scores tie only
    * bit-exactly, which is a lie at calibration granularity).
    * Output: (id, strata, score, n_below, n_stratum, pct). */
  def calibrateScores(df: DataFrame, idCol: String, strataCol: String,
                      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val integral = Set("byte", "short", "int", "integer", "long", "bigint")
    val dt = df.schema(scoreCol).dataType.typeName
    require(integral.contains(dt.toLowerCase),
      s"calibrateScores needs an integral score column, got $scoreCol: $dt")
    val hist = df.groupBy(col(strataCol).as("strata"),
        col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("__cnt"))
    // distinct (strata, score) rows: the RANGE-default cumulative frame
    // is tie-free here by construction
    val wCum = Window.partitionBy(col("strata")).orderBy(col("score"))
    val wAll = Window.partitionBy(col("strata"))
    val ranked = hist
      .withColumn("n_below", sum(col("__cnt")).over(wCum) - col("__cnt"))
      .withColumn("n_stratum", sum(col("__cnt")).over(wAll))
      .withColumn("pct", when(col("n_stratum") === 1L, lit(0.0))
        .otherwise(col("n_below").cast("double") /
          (col("n_stratum") - lit(1L)).cast("double")))
      .drop("__cnt")
    df.select(col(idCol).as("id"), col(strataCol).as("strata"),
        col(scoreCol).cast("long").as("score"))
      .join(broadcast(ranked), Seq("strata", "score"))
      .select(col("id"), col("strata"), col("score"), col("n_below"),
        col("n_stratum"), col("pct"))
  }

  /** DuckDB twin of [[funnel]], generated from the SAME gate table and
    * the same feature definitions so the engines cannot drift.
    * `fromSql` supplies the input relation with `idCol` and `text`. */
  def funnelOracleSql(fromSql: String, idCol: String,
                      gates: Seq[Gate] = defaultGates): String = {
    val featSql = Seq(
      "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens",
      "CAST(list_max(list_transform(list_filter(string_split(text, ' '), " +
        "x -> x <> ''), x -> len(x))) AS BIGINT) AS max_tok_len",
      "CAST(length(text) AS BIGINT) AS n_chars",
      "CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_sym",
      "CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper",
      "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha",
      "(len(regexp_extract_all(rtrim(text), '[.!?]$')) > 0) AS ends_sentence")
    val cases = gates.map(g => s"WHEN ${g.predicate} THEN '${g.name}'")
    s"""WITH f AS (SELECT $idCol AS id,
       |    ${featSql.mkString(",\n    ")}
       |  FROM ($fromSql))
       |SELECT id, n_tokens, max_tok_len, n_chars, n_sym, n_upper, n_alpha,
       |  ends_sentence,
       |  CASE ${cases.mkString(" ")} ELSE 'kept' END AS verdict
       |FROM f""".stripMargin
  }
}

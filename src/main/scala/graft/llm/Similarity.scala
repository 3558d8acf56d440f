package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, score
  * map-side, per-query top-k via window). Scale path: LSH bucketing via
  * random hyperplane signs (SRP) so each query only scores its bucket.
  * All arithmetic is double-precision with a fixed left-to-right fold, so
  * scores are deterministic.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd cosine (native Catalyst expression,
    * graft.functions.CosineSimilarity): bit-identical to `cosine` but the
    * scoring loop compiles into whole-stage codegen instead of running
    * interpreted higher-order-function lambdas per element — the hot inner
    * loop of every similarity scan at scale. */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Codegen'd dot product (graft.functions.DotProduct). */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.DotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** L2 norm via the codegen'd self-dot — STAGE this once per row; then
    * pair scoring is `dotFast(q, c) / (qnorm * cnorm)`, bit-identical to
    * `cosineFast(q, c)` (same fold order; sqrt of the same double is the
    * same double) at a third of the per-pair arithmetic. At 100TB the
    * norm column is dim-fold work paid once per VECTOR instead of once
    * per CANDIDATE PAIR (~bucket-size times more often).
    *
    * Contract: all vectors share one dimensionality (the embedding-table
    * invariant every scorer here assumes). On MIXED dims the fused form
    * norms only the shared prefix while this norms the full vector — any
    * "cosine" over mismatched dims is ill-defined; validate dims upstream
    * rather than relying on either behavior. */
  def normFast(v: Column): Column = sqrt(dotFast(v, v))

  /** INT8 symmetric quantization of an embedding vector — the 100TB
    * storage/shuffle tier for similarity: ~4x fewer bytes per vector
    * than float32 in every exchange, cache, and persisted layout. Per
    * vector: scale = max|x| / 127 (double), q_i = floor(x_i / scale +
    * 0.5) — the half-up rounding written out as floor() because round()
    * halves differ across engines; q ∈ [-127, 127] (tinyint). A zero
    * vector quantizes to all zeros (its cosine is null downstream, the
    * same hygiene as the float path). Returns struct(scale, q).
    *
    * Cosine over SYMMETRIC per-vector quantization is scale-free — the
    * scales cancel — so scoring needs only the q arrays: integer dot
    * and integer self-dots (exact in any engine), one sqrt, one divide.
    * That also makes quantized scores bit-exact cross-engine, which the
    * float path needs fold-order discipline for.
    *
    * This fused column form re-derives `scale` inside the per-element
    * lambda — fine for small frames and the oracle; at corpus scale use
    * [[bruteForceTopKQuantized]]'s staged projections (scale lands in
    * its own column first, the house HOF-staging discipline). */
  def quantizeInt8(vec: Column): Column = {
    val absd = transform(vec, x => abs(x.cast("double")))
    val scale = array_max(absd) / lit(127.0)
    val q = when(scale > 0,
        transform(vec, x => floor(x.cast("double") / scale + lit(0.5)).cast("byte")))
      .otherwise(transform(vec, _ => lit(0).cast("byte")))
    struct(scale.as("scale"), q.as("q"))
  }

  /** Integer dot product of two quantized (tinyint) vectors, as a long —
    * codegen'd (graft.functions.DotProductInt); exact, so fold order is
    * irrelevant. */
  def dotInt(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.DotProductInt(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** The composable (interpreted) form `dotInt` replaces — kept as the
    * semantic reference for the parity regression test. */
  private[graft] def dotIntHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Brute-force top-k over INT8-quantized vectors: same shape as
    * [[bruteForceTopK]] (broadcast queries, map-side scoring, per-query
    * windowed top-k) but every shuffled/broadcast vector is a tinyint
    * array — the regime where the corpus no longer fits the float
    * budget. Scores are the scale-free quantized cosine (integer sums ÷
    * sqrt of integer product): an approximation of the float cosine
    * (~1e-3 at dim 64) but bit-exact cross-engine in itself. Ties (more
    * common with integer dots) break by corpus_id. */
  def bruteForceTopKQuantized(corpus: DataFrame, queries: DataFrame, k: Int,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame =
    bruteForceTopKOnQuantized(
      quantizeForStorage(corpus, idCol, vecCol),
      quantizeForStorage(queries, idCol, vecCol), k, idCol)

  /** The persistable int8 layout: (id, q: array<tinyint>, n2: long) —
    * quantize ONCE at ingest, write THIS (4x smaller than float32 in
    * parquet and in every downstream exchange), and score query batches
    * with [[bruteForceTopKOnQuantized]] without ever touching the float
    * vectors again. Staged projections per the HOF-staging discipline
    * (scale lands in its own column before the per-element lambda). */
  def quantizeForStorage(df: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         carryCols: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: carryCols).map(col)
    df.select(keep :+ col(vecCol).as("__v"): _*)
      .select(keep :+ col("__v") :+
        (array_max(transform(col("__v"), x => abs(x.cast("double")))) / lit(127.0))
          .as("__s"): _*)
      .select(keep :+
        when(col("__s") > 0, transform(col("__v"),
            x => floor(x.cast("double") / col("__s") + lit(0.5)).cast("byte")))
          .otherwise(transform(col("__v"), _ => lit(0).cast("byte"))).as("q"): _*)
      .select(keep :+ col("q") :+ dotInt(col("q"), col("q")).as("n2"): _*)
  }

  /** MMR (maximal marginal relevance) diversified rerank over the int8
    * layout — the standard retrieval answer to "the top-k are 10 copies
    * of the same document": greedily select `take` results from the
    * top-`pool` relevance candidates, each step maximizing
    * 2·rel(c) − max over already-selected s of sim(c, s) — the λ=2/3
    * (relevance-leaning) MMR objective λ·rel − (1−λ)·sim cleared of its
    * denominator so EVERYTHING STAYS INTEGER — rel and sim are
    * the exact int8 dot products, so selection and every tie-break
    * (by id) are bit-exact across engines; rank 1 has no diversity term).
    *
    * Scale shape: the relevance scan and top-`pool` cut are distributed
    * (map-side integer dots + TakeOrderedAndProject over the corpus; the
    * single query broadcasts). The greedy loop itself runs on the
    * COLLECTED pool — `pool` is a query-time constant (tens), the same
    * query-sheet boundedness as bm25TopKIndexed's probe planning, and
    * the pool×pool similarity matrix is computed in-process from the
    * collected codes (pool² integer dots — thousands of ops, cheaper
    * than planning a 50-row distributed self-join).
    *
    * Output: (rank, idCol, rel, mmr). */
  def mmrRerankQuantized(corpus: DataFrame, query: DataFrame,
                         pool: Int, take: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(take >= 1 && pool >= take,
      s"need pool >= take >= 1, got pool=$pool take=$take")
    val spark = corpus.sparkSession
    val c = quantizeForStorage(corpus, idCol, vecCol)
    val q = quantizeForStorage(query, idCol, vecCol)
      .where(col("n2") > 0)
      .select(col(idCol).as("__qid"), col("q").as("__qq"))
    // The greedy loop below pools rel scores into ONE top-`pool` cut, so a
    // multi-row query frame would silently mix relevance scales (and
    // duplicate candidate ids) across queries — enforce the documented
    // single-query contract instead of mis-ranking. The frame is the
    // query sheet (broadcast side), so the count is a trivial job.
    val qRows = q.count()
    require(qRows == 1,
      s"mmrRerankQuantized expects exactly 1 non-zero query row, got $qRows" +
        " (run one invocation per query, or use rrfFuse to combine queries)")
    val cand = c.where(col("n2") > 0)
      .crossJoin(broadcast(q))
      .where(col(idCol) =!= col("__qid"))
      .select(col(idCol), col("q"), dotInt(col("q"), col("__qq")).as("rel"))
      .orderBy(col("rel").desc, col(idCol)).limit(pool)
      .collect() // bounded by pool — a query-time constant
    val n = cand.length
    val ids = cand.map(_.getLong(0))
    val codes = cand.map(_.getSeq[Byte](1).toArray)
    val rel = cand.map(_.getLong(2))
    def dot(i: Int, j: Int): Long = {
      var s = 0L; var d = 0
      val a = codes(i); val b = codes(j)
      while (d < a.length) { s += a(d).toLong * b(d).toLong; d += 1 }
      s
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var r = 1
    while (r <= math.min(take, n)) {
      var best = -1; var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!selected.contains(i)) {
          val div = if (selected.isEmpty) 0L else selected.map(dot(i, _)).max
          val score = 2L * rel(i) - div
          // `best < 0` seeds the argmax with the first unselected
          // candidate even when its score equals Long.MinValue (the
          // score > bestScore test alone would leave best = -1).
          if (best < 0 || score > bestScore ||
            (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      picked += ((r, ids(best), rel(best), bestScore))
      selected += best
      r += 1
    }
    import spark.implicits._
    picked.toSeq.toDF("rank", idCol, "rel", "mmr")
  }

  /** The int8 form of [[writeSrpLayout]] — the two 100TB levers fused:
    * rows bucket from the FLOAT vector (bucketing precision and storage
    * precision are independent choices; the weights fold is bit-identical
    * to srpBucket), but the layout stores only the quantized codes —
    * partition-PRUNABLE at the file listing AND ~4-6x smaller on disk
    * than the float layout, which is the factor every probe read and
    * downstream exchange then pays. Probe reads score with the
    * codegen'd integer cosine ([[bruteForceTopKOnQuantized]]). */
  def writeSrpQuantizedLayout(corpus: DataFrame, dim: Int, planes: Int,
                              path: String, idCol: String = "vec_id",
                              vecCol: String = "embedding"): Unit =
    quantizeForStorage(
        corpus.withColumn("bucket", srpBucket(col(vecCol), dim, planes)),
        idCol, vecCol, carryCols = Seq("bucket"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Probe read over a [[writeSrpQuantizedLayout]] table: same partition
    * pruning as [[readSrpProbes]] (bucket IN (...) is a partition
    * filter), returning (id, q, n2) rows ready for
    * [[bruteForceTopKOnQuantized]]. The query still buckets from its
    * FLOAT vector — quantize it separately for scoring. */
  def readSrpQuantizedProbes(spark: org.apache.spark.sql.SparkSession,
                             path: String, queryVec: Array[Double],
                             planes: Int, probeRadius: Int = 1,
                             dim: Int = -1): DataFrame = {
    require(dim < 0 || queryVec.length == dim,
      s"query vector length ${queryVec.length} != layout dim $dim")
    val probes = probeBucketValues(srpBucketLocal(queryVec, planes), planes, probeRadius)
    spark.read.parquet(path).where(col("bucket").isin(probes: _*))
  }

  /** Top-k over PRE-quantized (id, q, n2) frames — the scoring half of
    * the int8 tier (see [[quantizeForStorage]]). */
  def bruteForceTopKOnQuantized(corpusQ: DataFrame, queriesQ: DataFrame,
                                k: Int, idCol: String = "vec_id"): DataFrame = {
    val c = corpusQ.select(col(idCol).as("corpus_id"), col("q").as("cq"),
      col("n2").as("cn2"))
    val q = queriesQ.select(col(idCol).as("query_id"), col("q").as("qq"),
      col("n2").as("qn2"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("score", nanvl(try_divide(
        dotInt(col("qq"), col("cq")).cast("double"),
        sqrt((col("qn2") * col("cn2")).cast("double"))), lit(null).cast("double")))
      .where(col("score").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  /** Brute-force top-k: for each row of `queries`, the k nearest rows of
    * `corpus` by cosine. The query side is broadcast (it's the small side
    * by construction); scoring is a map-side nested loop over corpus
    * partitions — no shuffle of the corpus; only (queryId, corpusId, score)
    * triples shuffle into the per-query top-k, and the window's rank
    * predicate is applied partially map-side by Spark's TopK optimization
    * when a limit is present. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      normFast(col(vecCol)).as("cnorm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      normFast(col(vecCol)).as("qnorm"))
    perQueryTopK(c.crossJoin(broadcast(q)), k)
  }

  /** k-NN label assignment over the embedding space — the
    * classifier-bootstrap / weak-labeling step of a curation pipeline
    * (label a small seed set, propagate to the corpus by nearest
    * labeled neighbors): for each query vector, the majority label
    * among its k nearest labeled corpus vectors by cosine, ties broken
    * by the smaller label (deterministic). Built on [[bruteForceTopK]],
    * so the exact tier; swap the candidate generator for [[annTopK]] /
    * [[ivfTopK]] when the labeled pool is large.
    *
    * Scale shape: inherits the generator's (queries broadcast, corpus
    * map-side scored, per-query top-k partially map-side); the vote is
    * a (queries×k)-row aggregate — negligible. The label join hits the
    * corpus's 2-column (id, label) projection, broadcast under AQE. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
                  labelCol: String = "label",
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    majorityVote(bruteForceTopK(corpus, queries, k, idCol, vecCol),
      corpus, labelCol, idCol)

  /** ANN-tier k-NN labeling — [[knnClassify]]'s vote over IVF-generated
    * candidates ([[ivfTopKLiteral]]: frozen centroid literals, nprobe
    * nearest cells per query), for the labeled pool too large to scan
    * per query. Same majority/tie rule; the recall knob is
    * (nlist, nprobe) and is priced against the exact tier with
    * [[annRecallAtK]] over the generators (the s28 gauge pattern). */
  def knnClassifyIvf(corpus: DataFrame, queries: DataFrame, k: Int,
                     centroids: Array[Array[Double]], nprobe: Int,
                     labelCol: String = "label",
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    majorityVote(
      ivfTopKLiteral(corpus, queries, k, centroids, nprobe, idCol, vecCol),
      corpus, labelCol, idCol)

  /** Shared vote tail of the two k-NN classify tiers: majority label
    * among the generator's top-k, count ties to the smaller label. */
  private def majorityVote(tk: DataFrame, corpus: DataFrame,
                           labelCol: String, idCol: String): DataFrame = {
    val labels = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("__lbl"))
    val votes = tk.join(labels, Seq("corpus_id"))
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("__lbl").asc)
    votes.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("query_id"), col("__lbl").as("predicted_label"),
        col("votes"))
  }

  /** Hard-negative mining — for each query, the k nearest corpus
    * vectors with a DIFFERENT label: the pairs that teach a contrastive
    * / retrieval model the most (near in embedding space, apart in
    * truth). The filter is PER-QUERY (it compares against the query
    * row's own label), which is the shape [[filteredAnnTopK]]'s static
    * metadata predicate cannot express — it rides the join condition,
    * so excluded pairs never score. Same cosine arithmetic, self-id
    * exclusion and zero-norm/NaN hygiene as [[bruteForceTopK]] (shared
    * perQueryTopK tail), same broadcast-queries scale shape. A
    * null-labeled row never pairs (null-safe SQL semantics — an
    * unknown label cannot be a KNOWN negative). */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        labelCol: String = "label",
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      normFast(col(vecCol)).as("cnorm"), col(labelCol).as("__cl"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      normFast(col(vecCol)).as("qnorm"), col(labelCol).as("__ql"))
    perQueryTopK(c.join(broadcast(q),
      col("__cl") =!= col("__ql")), k)
  }

  /** ANN-tier hard-negative mining — [[hardNegativesTopK]]'s per-query
    * cross-label exclusion over the IVF candidate generator: corpus
    * rows cell-assign map-side against the frozen centroid literals,
    * queries probe their nprobe nearest cells, and the label exclusion
    * STILL rides the join condition (cell match AND label mismatch —
    * excluded pairs never score), so the dynamic-filter shape survives
    * the tier switch. For the labeled pool too large to scan per query;
    * recall vs the exact tier is priced with [[annRecallAtK]] at the
    * chosen (nlist, nprobe) — the s28 gauge. */
  def hardNegativesTopKIvf(corpus: DataFrame, queries: DataFrame, k: Int,
                           centroids: Array[Array[Double]], nprobe: Int,
                           labelCol: String = "label",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val assigned = assignCells(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        normFast(col(vecCol)).as("cnorm"), col(labelCol).as("__cl")),
      centroids, "cvec")
    val probes = ivfProbes(queries, centroids, nprobe, idCol, vecCol,
      carry = Seq(labelCol -> "__ql"))
    perQueryTopK(assigned.as("c").join(broadcast(probes.as("q")),
      col("c.cell") === col("q.cell") &&
        col("c.__cl") =!= col("q.__ql")), k)
  }

  /** Shared tail of the three top-k surfaces (brute force / SRP / IVF):
    * same-id self-exclusion (queries are drawn from the corpus in every
    * surface here — callers with DISTINCT tables whose id spaces overlap
    * must disambiguate ids first), cosine score, per-query rank.
    *
    * NaN/null hygiene: an all-zero vector has norm 0, so its cosine is
    * 0/0 — a DIVIDE_BY_ZERO runtime error under ANSI mode (Spark 4's
    * default), and NaN otherwise, which Spark's sort puts ABOVE every
    * real double: one padding row either kills the job or ranks as
    * everyone's nearest neighbor. try_divide turns the zero-norm case
    * into null, nanvl nulls any NaN (NaN vector elements), and null
    * scores drop — such rows simply never rank. */
  private def perQueryTopK(joined: DataFrame, k: Int): DataFrame = {
    val raw = try_divide(dotFast(col("qvec"), col("cvec")),
      col("qnorm") * col("cnorm"))
    val scored = joined
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("score", nanvl(raw, lit(null).cast("double")))
      .where(col("score").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  /** Second-stage re-rank over an EXPLICIT candidate list — the tail of
    * the classic two-stage retrieval (cheap lexical recall → exact
    * vector precision): `cands` is (query_id, corpus_id) from any
    * first-stage retriever (BM25 top-n, an ANN probe, a rules engine),
    * and this scores each surviving pair by exact cosine and keeps the
    * per-query top k. Same score arithmetic, self-exclusion and
    * NaN/zero-norm hygiene as [[bruteForceTopK]] (shared perQueryTopK
    * tail), so a candidate list covering the whole corpus degenerates
    * to brute force exactly.
    *
    * Scale shape: candidates are (queries × n) rows — tiny next to the
    * corpus — so the corpus-side join hashes on corpus_id with the
    * candidate side broadcast (AQE sizes it), the query-vector join is
    * an explicit broadcast, and no crossJoin ever forms. */
  def rerankTopK(cands: DataFrame, corpus: DataFrame, queries: DataFrame,
                 k: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      normFast(col(vecCol)).as("cnorm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      normFast(col(vecCol)).as("qnorm"))
    perQueryTopK(cands.select(col("query_id"), col("corpus_id"))
      .join(c, Seq("corpus_id")).join(broadcast(q), Seq("query_id")), k)
  }

  /** Recall@k evaluation of an approximate retrieval list against exact
    * ground truth — the acceptance gauge every ANN deployment runs
    * before (and periodically after) switching a probe path on: per
    * query, what fraction of the TRUE top-k did the approximate list
    * surface. Inputs are any two (query_id, corpus_id) frames —
    * typically [[annTopK]]/[[ivfTopK]]/a layout probe vs
    * [[bruteForceTopK]] on a query SAMPLE (ground truth is O(corpus)
    * per query, so at 100 TB it's computed for a few hundred held-out
    * queries, not the live sheet — the standard practice).
    *
    * Counts are integers off one equi-join; `recall` is ONE division.
    * Queries absent from `approx` score 0; queries absent from `exact`
    * (no ground truth) don't appear. Output: (query_id, n_exact,
    * n_hit, recall). */
  def annRecallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("corpus_id"),
      lit(1L).as("__hit"))
    exact.select(col("query_id"), col("corpus_id"))
      .join(a, Seq("query_id", "corpus_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
  }

  /** Truncated-dimension two-stage retrieval — the Matryoshka pattern
    * (Kusupati et al. 2022: embeddings trained so a PREFIX of the
    * dimensions is itself a usable embedding): stage 1 scores the
    * corpus on only the first `prefixDims` dimensions (per-pair cost
    * drops by dims/prefixDims — the arrays in flight are 4× smaller at
    * 16-of-64) and keeps `candidates` per query; stage 2 re-scores just
    * those by exact full-dimension cosine via [[rerankTopK]]. With
    * `prefixDims` = the full dimension and `candidates` ≥ the corpus,
    * this degenerates to [[bruteForceTopK]] BIT-EXACTLY (same shared
    * scoring tail) — the recall knob is explicit, not hidden.
    *
    * Scale shape: stage 1 is the same broadcast-queries map-side scan
    * as brute force, just on narrower arrays (at 10⁹ vectors swap it
    * for an IVF/SRP probe over the truncated column — the layouts
    * compose); stage 2 touches `queries × candidates` rows only. */
  def truncatedRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                          prefixDims: Int, candidates: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    require(prefixDims >= 1, s"prefixDims must be >= 1: $prefixDims")
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k) — stage 2 only re-orders")
    val tc = corpus.select(col(idCol),
      slice(col(vecCol), 1, prefixDims).as(vecCol))
    val tq = queries.select(col(idCol),
      slice(col(vecCol), 1, prefixDims).as(vecCol))
    val cands = bruteForceTopK(tc, tq, candidates, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"))
    rerankTopK(cands, corpus, queries, k, idCol, vecCol)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two ranked
    * retrieval lists — the standard hybrid-search combiner: a document's
    * fused score is Σ 1/(k0 + rank) over the lists that retrieved it, so
    * agreement between retrievers dominates any single retriever's raw
    * score scale (BM25 floats and cosine floats are not comparable;
    * ranks are). k0=60 is the paper's constant. Inputs are any two
    * (query_id, corpus_id, rank) frames — BM25 top-n, an ANN probe, a
    * rules engine; a doc missing from one list contributes 0 from it.
    *
    * Determinism: rank is an integer, so 1.0/(k0+rank) is one IEEE
    * division of exact operands and the two-term sum has a fixed
    * left-to-right order (lexical + semantic) — bit-identical across
    * engines, no float-sum associativity hazard. Ties (same fused score)
    * break by corpus_id.
    *
    * Scale shape: both inputs are (queries × n) rows — the corpus never
    * enters this operator; cost is independent of corpus size, the
    * upstream retrievers carry the scale. The join is per-(query, doc)
    * equi; the top-k window partitions by query over ≤ 2n rows and
    * map-side-prunes (WindowGroupLimit). */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, k: Int,
              k0: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    val l = lexical.select(col("query_id"), col("corpus_id"),
      col("rank").cast("int").as("rank_lex"))
    val r = semantic.select(col("query_id"), col("corpus_id"),
      col("rank").cast("int").as("rank_sem"))
    def part(rank: Column) =
      coalesce(lit(1.0) / (lit(k0).cast("double") + rank.cast("double")), lit(0.0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("corpus_id").asc)
    l.join(r, Seq("query_id", "corpus_id"), "full_outer")
      .withColumn("rrf", part(col("rank_lex")) + part(col("rank_sem")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "rank_lex", "rank_sem", "rrf", "rank")
  }

  /** Auto-size the SRP plane count from corpus size: enough planes that
    * the EXPECTED bucket occupancy is ~targetBucketSize (corpus/2^planes),
    * clamped to [4, 30]. Per-query candidate cost at Hamming-radius-1
    * multi-probe is then ~(planes+1) * targetBucketSize — pick the target
    * from the k you need and the recall you can afford, re-derive planes
    * as the corpus grows, and re-bucket incrementally (srpBucket is
    * deterministic, so only the plane count changes the keys). */
  def suggestedPlanes(corpusSize: Long, targetBucketSize: Int = 64): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val p = math.ceil(math.log(corpusSize.toDouble / targetBucketSize) / math.log(2)).toInt
    math.min(30, math.max(4, p))
  }

  /** Deterministic ±1 hyperplane weights: murmur3-fmix32 avalanche of the
    * (plane, dimension) pair, so weights vary independently across both
    * axes (a weak linear mix here degenerates every plane to a constant —
    * sign(sum(vec)) — and collapses the bucketing; see round-1 advice). */
  private[graft] def planeWeights(dim: Int, planes: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, i) =>
      var h = p * 0x9E3779B9 + i * 0x85EBCA6B + 0x27D4EB2F
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
      if ((h & 1) == 0) 1.0 else -1.0
    }

  /** Signed-random-projection bucket key: sign bits of dot products with
    * `planes` fixed hyperplanes. Vectors in the same bucket are likely
    * neighbors; search cost drops from O(N) to ~O(N/2^planes) per query at
    * some recall cost. The whole key is ONE codegen'd pipeline: the
    * planes x dim dot products via VectorLiteralFold, the sign/bit
    * packing via SignBits (round 6 — the planes-length packing fold was
    * the last interpreted HOF on this path, and pure-Catalyst composition
    * is also what lets graft_srp_bucket register as a SQL function).
    * Values are bit-identical to the composable form (srpBucketHof, kept
    * as the parity reference), so the DuckDB oracle mirror is unchanged;
    * a null/mismatched vector still maps to bucket 0 (null folds -> 0
    * bits, as before). */
  def srpBucket(vec: Column, dim: Int, planes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      srpBucketExpr(org.apache.spark.sql.GraftColumnBridge.expression(vec),
        dim, planes))

  /** Resolved-Catalyst form of [[srpBucket]] — shared with the SQL
    * function registration (GraftExtensions), which cannot return
    * unresolved Column compositions. */
  private[graft] def srpBucketExpr(
      vec: org.apache.spark.sql.catalyst.expressions.Expression,
      dim: Int, planes: Int): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, Literal}
    val ws = planeWeights(dim, planes)
    Coalesce(Seq(
      graft.functions.SignBits(
        graft.functions.VectorLiteralFold(vec, ws.map(_.toSeq).toSeq, squared = false)),
      Literal(0L)))
  }

  /** The composable (interpreted) form `srpBucket` replaces — the
    * semantic reference for the parity regression test. */
  private[graft] def srpBucketHof(vec: Column, dim: Int, planes: Int): Column = {
    val ws = planeWeights(dim, planes)
    val dots = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.VectorLiteralFold(
        org.apache.spark.sql.GraftColumnBridge.expression(vec),
        ws.map(_.toSeq).toSeq, squared = false))
    val bits = typedLit((0 until planes).map(p => 1L << p).toArray)
    coalesce(
      aggregate(zip_with(dots, bits, (d, bit) =>
          // !isnan: Spark SQL's NaN >= 0 is TRUE, Java's (SignBits,
          // srpBucketLocal) is false — pin the Java rule so all three
          // bucket forms stay bit-identical even on NaN elements
          when(d >= 0 && !isnan(d), bit).otherwise(lit(0L))),
        lit(0L), (a, v) => a + v),
      lit(0L))
  }

  /** All buckets within Hamming distance `radius` of `bucket` (multi-probe
    * SRP): radius 0 = the bucket itself (1 probe), radius 1 adds every
    * single-bit flip (+planes probes), radius 2 every two-bit flip
    * (+planes*(planes-1)/2). A corpus vector's bucket is fixed, and probe
    * values are pairwise-distinct, so a (query, corpus) pair can match at
    * most ONE probe — no dedup pass is needed after the join. */
  private[graft] def srpProbeBuckets(bucket: Column, planes: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 2, s"probe radius $radius not in [0, 2]")
    val r1 = if (radius >= 1) (0 until planes).map(p =>
      bucket.bitwiseXOR(lit(1L << p))) else Nil
    val r2 = if (radius >= 2) (for { p <- 0 until planes; q <- (p + 1) until planes }
      yield bucket.bitwiseXOR(lit((1L << p) | (1L << q)))) else Nil
    array(bucket +: (r1 ++ r2): _*)
  }

  /** Bucketed ANN top-k: join corpus and queries on SRP bucket, then
    * per-query top-k within the bucket.
    *
    * `probeRadius` is the recall knob (multi-probe LSH, Lv et al.
    * VLDB'07): each query also probes buckets within that Hamming
    * distance of its own. At radius 1 a query scans ~(planes+1)/2^planes
    * of the corpus (~3.5% at 8 planes) — still sublinear, ~9x the
    * single-probe candidate set, and recall moves from "often can't even
    * fill k" to the 0.8+ regime (measured against bruteForceTopK in
    * SimilaritySpec). Only the probe side fans out; the corpus is hashed
    * exactly once per vector. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 8, probeRadius: Int = 1, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      normFast(col(vecCol)).as("cnorm"),
      srpBucket(col(vecCol), dim, planes).as("bucket"))
    // bucket staged in its own select: the probe array references it
    // planes+1 times, and inlining would recompute the planes-fold per
    // reference (spark-hof-staging trap)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        normFast(col(vecCol)).as("qnorm"),
        srpBucket(col(vecCol), dim, planes).as("bucket"))
      .select(col("query_id"), col("qvec"), col("qnorm"),
        explode(srpProbeBuckets(col("bucket"), planes, probeRadius)).as("bucket"))
    perQueryTopK(c.join(broadcast(q), Seq("bucket")), k)
  }

  /** Fit the IVF coarse quantizer: `nlist` k-means centroids. Fit once,
    * then pass the centers to `ivfTopKLiteral` — at 100TB the centers are
    * fit on a sample, frozen, and shipped as literals with the job (the
    * corpus itself is written bucketed by cell so probes prune files). */
  def fitCentroids(corpus: DataFrame, nlist: Int, vecCol: String = "embedding",
                   seed: Long = 42L): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = corpus.withColumn("__v",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("__v")
      .setPredictionCol("__cell").fit(withVec)
    model.clusterCenters.map(_.toArray)
  }

  /** Deterministic FIXED-POINT k-means over int8-quantized vectors —
    * the reproducibility [[fitCentroids]]'s float/seeded MLlib path
    * cannot give: every distance is a sum of longs
    * ([[graft.functions.IntVectorLiteralFold]]), every centroid update
    * a floor division of integer sums, and the init is the k vectors
    * with the smallest md5(id) — a pure function of the data. The
    * trained centroids (and s29's gated assignment) are therefore
    * bit-identical across engines, partitionings and cluster sizes —
    * the d79 fixed-point discipline applied to clustering, closing the
    * ANN loop (quantize → TRAIN → bucketed layout → probe) with every
    * stage cross-engine-gateable.
    *
    * Per round: ONE map-side assignment pass (codegen'd literal fold —
    * no join, no N×k row blowup) + ONE partial-aggregated shuffle of
    * (cell, dim) sums (≤ k·dim rows per map partition, regardless of
    * corpus size), then a k·dim driver read to form the next round's
    * literals — the same collect-the-config shape [[fitCentroids]]
    * already has; no per-round lineage growth (each round's plan
    * depends only on the cached quantized frame and fresh literals).
    * Empty clusters keep their previous centroid (mirrored in the
    * oracle). The update division is Math.floorDiv, mirrored in SQL as
    * floor(sum/count) over doubles — exact while |per-dim sum| < 2^53
    * (int8 data: ~7·10^13 rows per cell). */
  def fitKmeansInt8(df: DataFrame, k: Int, iters: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[Array[Long]] = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 0, s"iters must be >= 0: $iters")
    val q = quantizeForStorage(df, idCol, vecCol)
      .select(col(idCol).as("__id"), col("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic, hash-spread init: the k rows with the smallest
      // md5(id) — both engines share md5, so the oracle re-derives the
      // same seeds (TakeOrderedAndProject, never a global sort)
      val initRows = q
        .orderBy(md5(col("__id").cast("string")), col("__id"))
        .limit(k).collect()
      require(initRows.length == k,
        s"need at least $k vectors to fit $k centroids: got ${initRows.length}")
      var cents: Array[Array[Long]] = initRows.map(
        _.getSeq[Byte](1).map(_.toLong).toArray)
      for (_ <- 0 until iters) {
        val sums = assignKmeansCells(q, cents, "q")
          .select(col("__cell"), posexplode(col("q")))
          .groupBy(col("__cell"), col("pos"))
          .agg(sum(col("col").cast("long")).as("__s"),
            count(lit(1)).as("__n"))
          .collect()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) =
            Math.floorDiv(r.getLong(2), r.getLong(3))
        }
        cents = next
      }
      cents
    } finally q.unpersist(blocking = true)
  }

  /** The s29 surface: [[fitKmeansInt8]] for `iters` rounds, then every
    * vector assigned its final cell — (id, cell), bit-exact. */
  def kmeansAssignInt8(df: DataFrame, k: Int, iters: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val cents = fitKmeansInt8(df, k, iters, idCol, vecCol)
    assignKmeansCells(
      quantizeForStorage(df, idCol, vecCol).select(col(idCol), col("q")),
      cents, "q")
      .select(col(idCol), col("__cell").as("cell"))
  }

  /** IVF top-k over the int8 tier with a TRAINED integer codebook
    * ([[fitKmeansInt8]]): cell assignment AND probe ranking ride exact
    * long distances, scoring is the s07 scale-free quantized cosine —
    * so the whole train → assign → probe chain is deterministic and
    * cross-engine-gated end to end (s30's oracle re-derives the
    * TRAINER in SQL and probes with its own centroids; no literal is
    * smuggled from the engine). Scale shape mirrors [[ivfTopKLiteral]]:
    * map-side assignment from centroid literals (the layout a bucketed
    * 100 TB corpus persists — [[graft.llm.Ingest.appendIvfSnapshot]]'s
    * frozen-codebook discipline applies unchanged), probe fan-out on
    * the QUERY side only (nprobe rows per query), one equi-join on
    * cell, per-query windowed top-k. Zero-norm vectors drop from
    * scoring (the s07 convention). */
  def ivfTopKQuantizedTrained(corpus: DataFrame, queries: DataFrame,
      k: Int, centroids: Array[Array[Long]], nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ac = assignKmeansCells(
      quantizeForStorage(corpus, idCol, vecCol), centroids, "q")
      .select(col(idCol).as("corpus_id"), col("q").as("cq"),
        col("n2").as("cn2"), col("__cell").as("cell"))
    scoreQuantizedProbes(ac,
      quantizedProbeSide(queries, centroids, nprobe, idCol, vecCol), k)
  }

  /** The query side of a trained-int8 IVF probe: each query quantized,
    * its cells ranked by exact long distance to every centroid literal,
    * fanned out to its `nprobe` nearest — (query_id, qq, qn2, cell).
    * Shared by the in-flight probe ([[ivfTopKQuantizedTrained]]) and
    * the persisted-layout probe ([[ivfTopKQuantizedSnapshot]]) so the
    * two can never desynchronize. */
  private def quantizedProbeSide(queries: DataFrame,
      centroids: Array[Array[Long]], nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe $nprobe out of range 1..${centroids.length}")
    val dists = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.IntVectorLiteralFold(
        org.apache.spark.sql.GraftColumnBridge.expression(col("q")),
        centroids.map(_.toSeq).toSeq))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("col").asc, col("pos").asc)
    quantizeForStorage(queries, idCol, vecCol)
      .withColumn("__dl", dists)
      .select(col(idCol).as("query_id"), col("q").as("qq"),
        col("n2").as("qn2"), posexplode(col("__dl")))
      .withColumn("__rn", row_number().over(pw))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("qq"), col("qn2"), col("pos").as("cell"))
  }

  /** One equi-join on cell + the s07 scale-free quantized-cosine
    * top-k — the scoring tail shared by both trained-IVF probes. */
  private def scoreQuantizedProbes(ac: DataFrame, probes: DataFrame,
                                   k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    ac.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id") &&
        col("qn2") > 0 && col("cn2") > 0)
      .withColumn("score", dotInt(col("qq"), col("cq")).cast("double") /
        sqrt((col("qn2") * col("cn2")).cast("double")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rank"))
  }

  /** Marker file naming a trained-int8 IVF layout's FROZEN integer
    * codebook (JSON array of per-centroid long arrays) — the layout is
    * self-describing, so appends and probes read the codebook from the
    * store instead of trusting a caller to resupply the same literals
    * (the m44 frozen-centroid discipline, now enforced by construction:
    * there is nothing to resupply). */
  private[graft] val CodebookMarker = "_codebook"

  private[graft] def codebookJson(cents: Array[Array[Long]]): String =
    cents.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  private[graft] def parseCodebook(s: String): Array[Array[Long]] = {
    val t = s.trim
    require(t.startsWith("[[") && t.endsWith("]]"),
      s"malformed codebook marker: $t")
    t.stripPrefix("[").stripSuffix("]")
      .split("\\]\\s*,\\s*\\[").map(_.replaceAll("[\\[\\]]", ""))
      .map(_.split(",").map(_.trim.toLong))
  }

  /** The persisted 100TB layout for the TRAINED integer tier: the
    * corpus quantized to int8 ([[quantizeForStorage]]) and written
    * partitioned by its [[fitKmeansInt8]] cell, with the codebook
    * frozen INSIDE the snapshot as a [[CodebookMarker]] — closing the
    * last ungateable stage of the persisted ANN lifecycle (m20/m26/m44
    * ride float MLlib centroids, which no oracle can re-derive; this
    * layout's every stage — train, assign, store, probe — is a pure
    * function of the data). Rows: (idCol, q, n2, cell). Returns the
    * snapshot version. */
  def writeIvfInt8TrainedLayout(corpus: DataFrame,
      centroids: Array[Array[Long]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val conf = corpus.sparkSession.sparkContext.hadoopConfiguration
    val assigned = assignKmeansCells(
      quantizeForStorage(corpus, idCol, vecCol), centroids, "q")
      .withColumnRenamed("__cell", "cell")
    LayoutStore.writeSnapshot(conf, path) { tmp =>
      assigned.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
      LayoutStore.writeTextMarker(conf, tmp, CodebookMarker,
        codebookJson(centroids))
    }
  }

  /** The frozen codebook a trained-int8 IVF snapshot carries. Reads
    * the newest version at or below `version` that has the marker —
    * manifest-versioned appends re-stamp it, but a reader must survive
    * a version landed by a generic maintenance walk that didn't. */
  def readIvfInt8Codebook(conf: org.apache.hadoop.conf.Configuration,
      path: String,
      version: Option[Long] = None): Array[Array[Long]] = {
    val vs = LayoutStore.versions(conf, path)
    require(vs.nonEmpty, s"no layout versions at $path")
    val pin = version.getOrElse(vs.last)
    vs.filter(_ <= pin).reverse.iterator
      .flatMap(v => LayoutStore.readTextMarker(conf, s"$path/version=$v",
        CodebookMarker))
      .take(1).toList.headOption.map(parseCodebook)
      .getOrElse(throw new IllegalArgumentException(
        s"no $CodebookMarker on any version <= $pin at $path — not a " +
          "trained-int8 IVF layout"))
  }

  /** Probe a persisted trained-int8 IVF layout
    * ([[writeIvfInt8TrainedLayout]]): the codebook comes from the
    * SNAPSHOT, the query side fans out to its nprobe nearest cells,
    * and the corpus read PARTITION-PRUNES to the union of probed cells
    * (driver-bounded by nlist) before one equi-join on cell — at scale
    * a small query sheet touches only its cells' files. Scoring is the
    * s07 quantized cosine; identical math to
    * [[ivfTopKQuantizedTrained]] by shared construction. */
  def ivfTopKQuantizedSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      version: Option[Long] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cents = readIvfInt8Codebook(conf, path, version)
    val probes = quantizedProbeSide(queries, cents, nprobe, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded driver read: at most nlist distinct probed cells
      val cells = probes.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).sorted
      val ac = LayoutStore.readSnapshotTable(spark, path, "", version)
        .where(col("cell").isin(cells.map(Integer.valueOf): _*))
        .select(col(idCol).as("corpus_id"), col("q").as("cq"),
          col("n2").as("cn2"), col("cell"))
      scoreQuantizedProbes(ac, probes, k).localCheckpoint()
    } finally probes.unpersist(blocking = true)
  }

  /** [[assignKmeansCells]] over an already-quantized frame (`q`
    * column) — the package door [[Ingest.appendIvfInt8TrainedSnapshot]]
    * assigns through, so the append and the layout writer share one
    * assignment. */
  private[llm] def assignKmeansCellsInt8(df: DataFrame,
      cents: Array[Array[Long]]): DataFrame =
    assignKmeansCells(df, cents, "q")

  /** Map-side nearest-centroid assignment against LITERAL long
    * centroids: one codegen'd integer squared-L2 fold per row,
    * first-match argmin (ties -> smaller centroid index — DuckDB
    * list_position parity). */
  private def assignKmeansCells(df: DataFrame, cents: Array[Array[Long]],
                                qCol: String): DataFrame = {
    val dists = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.IntVectorLiteralFold(
        org.apache.spark.sql.GraftColumnBridge.expression(col(qCol)),
        cents.map(_.toSeq).toSeq))
    df.withColumn("__dl", dists)
      .withColumn("__cell",
        (array_position(col("__dl"), array_min(col("__dl"))) - 1).cast("int"))
      .drop("__dl")
  }

  /** Squared-L2 distances to every centroid as one codegen'd literal
    * fold — the single construction shared by cell ASSIGNMENT
    * (assignCells, the bucketed-layout writer) and query-side cell
    * RANKING (ivfTopKLiteral): one site, so the two can never
    * desynchronize. */
  private def centroidDistances(vec: Column,
                                centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.VectorLiteralFold(
        org.apache.spark.sql.GraftColumnBridge.expression(vec),
        centroids.map(_.toSeq).toSeq, squared = true))

  /** Map-side IVF cell assignment: each row gains its nearest-centroid
    * `cell` (one codegen'd literal squared-L2 fold over all nlist
    * centroids, first-match argmin tie-break — no join, no shuffle, no
    * N×nlist row blowup). This IS the assignment a 100TB bucketed layout
    * persists; ivfTopKLiteral shares it. */
  def assignCells(df: DataFrame, centroids: Array[Array[Double]],
                  vecCol: String = "embedding"): DataFrame = {
    // distance array staged in its own projection (argmin reads it twice)
    df.withColumn("__dl", centroidDistances(col(vecCol), centroids))
      .withColumn("cell",
        (array_position(col("__dl"), array_min(col("__dl"))) - 1).cast("int"))
      .drop("__dl")
  }

  /** The 100TB IVF storage layout: the corpus written PARTITIONED BY CELL,
    * so a probe query prunes to its nprobe cells at the file-listing
    * level — files outside the probed cells are never read (plan-guarded
    * in IvfSpec). Centroids are fit once (fitCentroids, on a sample at
    * scale), frozen, and shipped with every reader as literals; appends
    * assign cells map-side and land in the right partition directories. */
  def writeIvfLayout(corpus: DataFrame, centroids: Array[Array[Double]],
                     path: String, vecCol: String = "embedding"): Unit =
    assignCells(corpus, centroids, vecCol)
      // cluster rows by cell before the partitioned write: without this,
      // every task writes a sliver into every cell dir — nlist x tasks
      // tiny files (the classic partitionBy small-file storm); with it,
      // one file per cell per owning task. At 100TB raise parallelism by
      // also salting the repartition key, keeping files/cell = salt count.
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Read only the probed cells from an IVF layout (partition pruning —
    * the `cell` IN filter is a partition filter, not a data filter). */
  def readIvfCells(spark: org.apache.spark.sql.SparkSession, path: String,
                   cells: Seq[Int]): DataFrame =
    spark.read.parquet(path).where(col("cell").isin(cells: _*))

  /** [[readIvfCells]] against a versioned [[LayoutStore]] snapshot —
    * resolves manifest-referenced versions (an incremental append's
    * snapshot physically holds only its touched cells; the inherited
    * ones are served from their owning versions), keeping the `cell`
    * IN filter a partition filter on every branch. */
  def readIvfCellsSnapshot(spark: org.apache.spark.sql.SparkSession,
                           path: String, cells: Seq[Int],
                           version: Option[Long] = None): DataFrame =
    LayoutStore.readSnapshotTable(spark, path, "", version)
      .where(col("cell").isin(cells: _*))

  /** The 100TB SRP storage layout — the persisted-ANN twin of
    * writeIvfLayout: the corpus written PARTITIONED BY SRP BUCKET, so a
    * probe query prunes to its (planes+1 at radius 1) probe buckets at
    * the file-listing level; files outside the probed buckets are never
    * read. srpBucket is deterministic (weights derive from (plane, dim)),
    * so appends land in the right partition directories and a re-derived
    * plane count is the only thing that ever forces a re-bucket. */
  def writeSrpLayout(corpus: DataFrame, dim: Int, planes: Int, path: String,
                     vecCol: String = "embedding"): Unit =
    corpus.withColumn("bucket", srpBucket(col(vecCol), dim, planes))
      // cluster rows by bucket before the partitioned write (see
      // writeIvfLayout): one file per bucket instead of 2^planes x tasks
      // slivers. At 100TB salt the repartition key for more files/bucket.
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Driver-side twin of srpBucket for probe planning: the bucket of one
    * vector, computed without a Spark job (same weights, same
    * left-to-right fold, same >= 0 sign rule — bit-identical to the
    * column form; parity-asserted in SimilaritySpec). */
  def srpBucketLocal(vec: Array[Double], planes: Int): Long = {
    val ws = planeWeights(vec.length, planes)
    var bits = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      while (i < vec.length) { acc += vec(i) * ws(p)(i); i += 1 }
      if (acc >= 0.0) bits |= 1L << p
      p += 1
    }
    bits
  }

  /** Driver-side twin of srpProbeBuckets: all buckets within Hamming
    * `radius` of `bucket` (pairwise distinct, bucket first). */
  def probeBucketValues(bucket: Long, planes: Int, radius: Int): Seq[Long] = {
    require(radius >= 0 && radius <= 2, s"probe radius $radius not in [0, 2]")
    val r1 = if (radius >= 1) (0 until planes).map(p => bucket ^ (1L << p)) else Nil
    val r2 = if (radius >= 2) (for { p <- 0 until planes; q <- (p + 1) until planes }
      yield bucket ^ ((1L << p) | (1L << q))) else Nil
    bucket +: (r1 ++ r2)
  }

  /** Read only the probed buckets of an SRP layout for one query vector:
    * the `bucket IN (...)` filter is a PARTITION filter (plan-guarded in
    * SimilaritySpec), so a radius-1 probe lists (planes+1) of the
    * 2^planes partition directories and reads nothing else — the
    * persisted form of annTopK's candidate pruning. */
  def readSrpProbes(spark: org.apache.spark.sql.SparkSession, path: String,
                    queryVec: Array[Double], planes: Int,
                    probeRadius: Int = 1, dim: Int = -1): DataFrame = {
    // a wrong-length query silently buckets from prefix dots (the plane
    // weights depend only on (plane, index)) and probes garbage — pass
    // the layout's dim to fail loudly instead
    require(dim < 0 || queryVec.length == dim,
      s"query vector length ${queryVec.length} != layout dim $dim")
    val probes = probeBucketValues(srpBucketLocal(queryVec, planes), planes, probeRadius)
    spark.read.parquet(path).where(col("bucket").isin(probes: _*))
  }

  /** IVF (inverted-file) ANN with explicit centroids: the corpus's cell
    * assignment is a MAP-SIDE argmin over literal-centroid distance folds
    * (no join, no shuffle, no N*nlist row blowup — the assignment a
    * 100TB bucketed-write layout would persist); queries rank cells and
    * probe the `nprobe` nearest, so search cost is ~O(N * nprobe / nlist)
    * with recall controlled by nprobe. Every arithmetic step is a
    * deterministic left-to-right fold with first-match argmin tie-break,
    * so a DuckDB oracle given the same centroid literals reproduces cell
    * assignment, probe ranking, and scores bit-exactly (s04). */
  def ivfTopKLiteral(corpus: DataFrame, queries: DataFrame, k: Int,
                     centroids: Array[Array[Double]], nprobe: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // cell assignment shared with the bucketed-layout writer (assignCells)
    val assigned = assignCells(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        normFast(col(vecCol)).as("cnorm")), centroids, "cvec")
    val probes = ivfProbes(queries, centroids, nprobe, idCol, vecCol)
    perQueryTopK(assigned.join(broadcast(probes), Seq("cell")), k)
  }

  /** Query-side IVF probe frame (query_id, qvec, qnorm, cell [+carry]):
    * each query ranks every centroid by the SAME distance fold
    * assignCells uses (shared construction — query-side cell ranking
    * must never desynchronize from corpus-side cell assignment) and
    * keeps its nprobe nearest cells. `carry` names extra query columns
    * to ride along (src -> out), e.g. the query's own label for the
    * hard-negative exclusion. */
  private def ivfProbes(queries: DataFrame,
                        centroids: Array[Array[Double]], nprobe: Int,
                        idCol: String, vecCol: String,
                        carry: Seq[(String, String)] = Nil): DataFrame = {
    val nlist = centroids.length
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe $nprobe not in [1, $nlist]")
    val carryOut = carry.map { case (_, out) => col(out) }
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("cell").asc)
    queries
      .select(Seq(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        normFast(col(vecCol)).as("qnorm"),
        centroidDistances(col(vecCol), centroids).as("__dl")) ++
        carry.map { case (src, out) => col(src).as(out) }: _*)
      .select(Seq(col("query_id"), col("qvec"), col("qnorm")) ++ carryOut :+
        posexplode(col("__dl")).as(Seq("cell", "cdist")): _*)
      .withColumn("prank", row_number().over(wCell))
      .where(col("prank") <= nprobe)
      .select(Seq(col("query_id"), col("qvec"), col("qnorm"),
        col("cell").cast("int").as("cell")) ++ carryOut: _*)
  }

  /** Convenience fused fit+search form (unit-level entry; the oracle-gated
    * path is fitCentroids + ivfTopKLiteral so the centroids can be
    * mirrored into the DuckDB SQL as literals). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int, nprobe: Int, idCol: String = "vec_id",
              vecCol: String = "embedding", seed: Long = 42L): DataFrame =
    ivfTopKLiteral(corpus, queries, k,
      fitCentroids(corpus, nlist, vecCol, seed), nprobe, idCol, vecCol)

  // ---- Product quantization (Jégou, Douze & Schmid, "Product
  // Quantization for Nearest Neighbor Search", TPAMI'11) ----------------

  /** Fit PQ codebooks: the vector splits into `m` contiguous subspaces
    * of dim/m dims; each subspace gets its own `ksub`-centroid KMeans
    * codebook (distributed fit via Spark ML, like fitCentroids — run on
    * a sample at 100TB scale, frozen as literals afterward). Returns
    * codebooks(j)(c) = centroid c of subspace j. */
  def fitPqCodebooks(corpus: DataFrame, m: Int, ksub: Int, dim: Int,
                     vecCol: String = "embedding",
                     seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    (0 until m).toArray.map { j =>
      fitCentroids(
        corpus.select(slice(col(vecCol), j * sub + 1, sub).as(vecCol)),
        ksub, vecCol, seed + j)
    }
  }

  /** Map-side PQ encoding: each row gains `__c0..__c{m-1}` — the index
    * of its nearest codebook centroid per subspace (the same literal
    * squared-L2 fold + first-match argmin as assignCells, per slice).
    * An m-byte code replaces dim·4 bytes of floats — at m=4 over a
    * 64-dim float vector that is a 64× compression of the scan payload,
    * which is the whole point: ADC scans codes, not vectors. */
  private[graft] def withPqCodes(df: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      vecCol: String): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val staged = codebooks.zipWithIndex.foldLeft(df) { case (d, (cb, j)) =>
      d.withColumn(s"__dl$j", org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.VectorLiteralFold(
          org.apache.spark.sql.GraftColumnBridge.expression(
            slice(col(vecCol), j * sub + 1, sub)),
          cb.map(_.toSeq).toSeq, squared = true)))
    }
    val coded = codebooks.indices.foldLeft(staged) { case (d, j) =>
      d.withColumn(s"__c$j",
        (array_position(col(s"__dl$j"), array_min(col(s"__dl$j"))) - 1)
          .cast("int"))
    }
    codebooks.indices.foldLeft(coded)((d, j) => d.drop(s"__dl$j"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: queries stay full-
    * precision; each query precomputes per-subspace distance TABLES to
    * every codebook centroid (m·ksub literal folds, map-side, once per
    * query), and a corpus row's approximate squared L2 is m table
    * LOOKUPS summed — no per-pair vector arithmetic at all. This is the
    * memory-bandwidth regime of billion-scale ANN: the scan touches
    * m-byte codes instead of dim·4-byte vectors, queries broadcast.
    * Compose with the IVF layout (writeIvfLayout over an encoded corpus)
    * for IVF-PQ: partition pruning cuts WHICH codes scan, PQ cuts the
    * bytes per code. Output: (query_id, corpus_id, adist, rank) —
    * adist ASC (it is a distance), ties by corpus_id. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             codebooks: Array[Array[Array[Double]]],
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    pqTopKOnCodes(
      withPqCodes(corpus.select(col(idCol), col(vecCol)), codebooks, vecCol)
        .drop(vecCol),
      queries, k, codebooks, idCol, vecCol)

  /** ADC scoring over an ALREADY-ENCODED corpus (`__c0..__c{m-1}` from
    * withPqCodes — e.g. a persisted codes-only layout where the raw
    * vectors were never written): the billion-scale read path scans m
    * small ints per row and nothing else. */
  def pqTopKOnCodes(codedCorpus: DataFrame, queries: DataFrame, k: Int,
                    codebooks: Array[Array[Array[Double]]],
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val sub = codebooks(0)(0).length
    val coded = codedCorpus.select(
      (col(idCol).as("corpus_id") +:
        codebooks.indices.map(j => col(s"__c$j"))): _*)
    val tabled = codebooks.zipWithIndex.foldLeft(
      queries.select(col(idCol).as("query_id"), col(vecCol))) {
      case (d, (cb, j)) =>
        d.withColumn(s"__tl$j", org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.VectorLiteralFold(
            org.apache.spark.sql.GraftColumnBridge.expression(
              slice(col(vecCol), j * sub + 1, sub)),
            cb.map(_.toSeq).toSeq, squared = true)))
    }.drop(vecCol)
    // left-to-right j-ascending sum — the order the oracle mirrors
    val adist = codebooks.indices
      .map(j => element_at(col(s"__tl$j"), col(s"__c$j") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id").asc)
    coded.crossJoin(broadcast(tabled))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("adist"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (id1 < id2) pairs with cosine >=
    * threshold, bucketed by SRP so only near-bucket pairs are compared.
    * One side fans out to its multi-probe buckets (Hamming <= probeRadius),
    * so pairs whose buckets differ by up to `probeRadius` bits are still
    * found; each qualifying pair matches exactly one probe (no dedup
    * needed). The persisted hashed frame feeds both sides of the
    * self-join (one hashing pass, not two plan subtrees). */
  def embeddingNearDups(df: DataFrame, threshold: Double, dim: Int,
                        planes: Int = 8, probeRadius: Int = 1,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        normFast(col(vecCol)).as("nrm"),
        srpBucket(col(vecCol), dim, planes).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = v.select(col("id").as("id1"), col("vec").as("vec1"),
        col("nrm").as("nrm1"),
        explode(srpProbeBuckets(col("bucket"), planes, probeRadius)).as("bucket"))
    val b = v.select(col("bucket"), col("id").as("id2"), col("vec").as("vec2"),
        col("nrm").as("nrm2"))
    val pairs = a.join(b, Seq("bucket")).where(col("id1") < col("id2"))
      // an all-zero vector's cosine is 0/0: DIVIDE_BY_ZERO under ANSI
      // (Spark 4 default), NaN otherwise — and NaN >= threshold is TRUE,
      // so a padding row would pair with every bucket-mate. try_divide
      // nulls the zero-norm case, nanvl nulls NaN, null fails the
      // threshold: such rows never pair.
      .withColumn("score", nanvl(
        try_divide(dotFast(col("vec1"), col("vec2")),
          col("nrm1") * col("nrm2")),
        lit(null).cast("double")))
      .where(col("score") >= threshold)
      .select("id1", "id2", "score")
    // pairs materialize eagerly so the hashed-frame cache is released
    // before returning (session hygiene — see Dedup.materializeAndRelease)
    Dedup.materializeAndRelease(pairs, v)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication scoped to K-means cells. Embeddings are assigned to
    * their nearest frozen centroid map-side ([[assignCells]]'
    * construction); within each cell, rows whose pairwise cosine
    * reaches `threshold` form semantic-duplicate neighborhoods, and
    * each neighborhood keeps the example FARTHEST from the cell
    * centroid (the paper's keeper — lowest centroid similarity retains
    * the "hardest" exemplar), ties broken by min id. The decision is
    * the deterministic dominated rule: drop x iff some same-cell y has
    * cos(x,y) ≥ threshold and (y.cdist, y.id) beats (x.cdist, x.id) —
    * no iteration, no RNG, reproducible under any partitioning.
    *
    * This differs from [[embeddingNearDups]] (SRP-bucketed pair
    * SURFACE) in both scope and output: cells are semantic regions, not
    * hash buckets, and the output is a per-row keep DECISION — the
    * frame a curation pipeline left-semi-joins against.
    *
    * Scale shape: cell assignment and centroid distance are one
    * codegen'd literal fold per row (no join, no shuffle); the only
    * shuffle is the within-cell self-join, O(Σ|cell|²) pairs — nlist
    * MUST scale with the corpus (the paper runs ~100k clusters at 10⁸
    * docs; target |cell| ≈ corpus/nlist in the low thousands). Vectors
    * enter that one equi-join and nothing else; the dominated set is
    * ids only. Output: (id, cell, keep). */
  def semdedupPrune(df: DataFrame, centroids: Array[Array[Double]],
                    threshold: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val assigned = df
      .withColumn("__dl", centroidDistances(col(vecCol), centroids))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        (array_position(col("__dl"), array_min(col("__dl"))) - 1)
          .cast("int").as("cell"),
        array_min(col("__dl")).as("cdist"),
        normFast(col(vecCol)).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cell"), col("id"), col("vec"),
      col("nrm"), col("cdist"))
    val b = assigned.select(col("cell"), col("id").as("id2"),
      col("vec").as("vec2"), col("nrm").as("nrm2"),
      col("cdist").as("cdist2"))
    val dominated = a.join(b, Seq("cell"))
      .where(col("id") =!= col("id2"))
      // zero-norm guard: same construction as embeddingNearDups (null
      // never dominates)
      .withColumn("score", nanvl(
        try_divide(dotFast(col("vec"), col("vec2")),
          col("nrm") * col("nrm2")),
        lit(null).cast("double")))
      .where(col("score") >= threshold &&
        (col("cdist2") > col("cdist") ||
          (col("cdist2") === col("cdist") && col("id2") < col("id"))))
      .select(col("id")).distinct()
    val out = assigned.select(col("id"), col("cell"))
      .join(dominated.withColumn("__dom", lit(1)), Seq("id"), "left")
      .withColumn("keep", col("__dom").isNull)
      .select(col("id"), col("cell"), col("keep"))
    Dedup.materializeAndRelease(out, assigned)
  }

  /** Per-stratum semantic centroid similarity matrix: the embedding-space
    * complement of the lexical [[Dedup.stratumOverlap]] — how close two
    * sub-corpora (languages, sources, crawl snapshots) sit in embedding
    * space, the drift dashboard for "did this month's crawl move".
    *
    * Exactness is the design constraint (the oracle hash-compares the
    * doubles): a naive mean-of-floats depends on partition summation
    * order, so dimensions are first quantized to integers — floor(x·2^
    * `scaleBits` + 0.5), the [[quantizeInt8]] half-up rounding written
    * out — and SUMMED exactly as BIGINTs. Cosine is scale-invariant, so
    * the centroid cosine equals the cosine of the raw SUM vectors: the
    * count divisions never happen and the only floating-point work is
    * one deterministic ordered fold per stratum pair over |dim|
    * products (the s09 sorted-fold contract; both engines fold the same
    * 64 doubles left-to-right).
    *
    * Scale shape: ONE pass over the embeddings — the per-(stratum, dim)
    * integer sums AND the stratum counts ride a single map-side-combined
    * aggregate of |strata|·dim rows; the matrix assembly crosses a
    * ≤|strata|-row frame with itself (broadcast by construction). At
    * 544k-doc scale the exchange carries |strata|·64 longs per
    * partition, nothing else.
    *
    * Output: (stratum_a, stratum_b, n_a, n_b, cos), stratum_a <
    * stratum_b. A stratum of all-zero vectors yields NaN cosines
    * (0/0) — pair it with the zero-norm guards upstream if the corpus
    * can contain failed embeds. */
  def stratumCentroidMatrix(embs: DataFrame, strata: DataFrame,
                            vecIdCol: String, strataIdCol: String,
                            strataCol: String, vecCol: String = "embedding",
                            scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 40,
      s"scaleBits out of range: $scaleBits")
    val scale = java.lang.Math.scalb(1.0, scaleBits) // exact power of two
    val joined = embs.select(col(vecIdCol).as("__id"), col(vecCol).as("__v"))
      .join(strata.select(col(strataIdCol).as("__id"),
        col(strataCol).cast("string").as("__stratum")), Seq("__id"))
    val q = joined.select(col("__stratum"),
      posexplode(transform(col("__v"),
        x => floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long")))
        .as(Seq("__pos", "__q")))
    // one aggregate carries both the dim sums and (via any fixed dim's
    // row count) the stratum sizes — embeddings are scanned exactly once
    val sums = q.groupBy(col("__stratum"), col("__pos"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__c"))
    // both cross sides read this <=|strata|-row frame: persist it so the
    // embeddings scan+aggregate runs once (the d40 lesson)
    val vecs = sums.groupBy(col("__stratum"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__s")))),
          s => s.getField("__s").cast("double")).as("__vec"),
        max(col("__c")).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val aa = vecs.select(col("__stratum").as("stratum_a"),
      col("__vec").as("__va"), col("__n").as("n_a"))
    val bb = vecs.select(col("__stratum").as("stratum_b"),
      col("__vec").as("__vb"), col("__n").as("n_b"))
    val out = aa.crossJoin(bb).where(col("stratum_a") < col("stratum_b"))
      .withColumn("cos", dot(col("__va"), col("__vb")) /
        (sqrt(dot(col("__va"), col("__va"))) *
          sqrt(dot(col("__vb"), col("__vb")))))
      .select(col("stratum_a"), col("stratum_b"), col("n_a"), col("n_b"),
        col("cos"))
    Dedup.materializeAndRelease(out, vecs)
  }

  /** Per-stratum semantic dispersion — the collapse monitor for an
    * embedding corpus: mean squared distance from the stratum centroid,
    * E|x|² − |x̄|², per source/language/snapshot. A source whose
    * dispersion drifts toward 0 is collapsing onto one template (SEO
    * farms, boilerplate mirrors); one drifting up is losing topical
    * focus. Same exact-integer construction as
    * [[stratumCentroidMatrix]]: dimensions quantize to
    * floor(x·2^scaleBits + 0.5) longs, ONE embeddings pass aggregates
    * per-(stratum, dim) sums + per-stratum sums of squares (map-side
    * combined; only |strata|·dims longs shuffle), and the dispersion is
    * (n·Σ|x_q|² − |Σx_q|²) / (n²·2^(2·scaleBits)) — exact integers into
    * ONE double division, partition-order independent by construction.
    *
    * Overflow bound: |Σx_q| per dim < n·2^scaleBits·max|x|, and its
    * square times dims must stay below 2^63 — at the default 20 bits
    * and unit-normalized embeddings that is n ≲ 10⁵ per stratum per
    * dim-square; larger strata drop scaleBits (dispersion is scale-free
    * in the limit) or shard the stratum and pool n·disp + counts.
    *
    * Output: (stratum, n, sum_sq, cent_sq, dispersion). */
  /** Exact per-(stratum, dim) quantized coordinate sums — the rational
    * centroid (s/n per dim) both [[writeCentroidSnapshot]] and
    * [[centroidDriftAgainstSnapshot]] are built from. Same
    * floor(x·2^scaleBits + 0.5) integer write-out as
    * [[semanticDispersion]]: one embeddings pass, |strata|·dims longs
    * on the exchange. */
  private def stratumCoordSums(embs: DataFrame, strata: DataFrame,
                               vecIdCol: String, strataIdCol: String,
                               strataCol: String, vecCol: String,
                               scaleBits: Int): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 40,
      s"scaleBits out of range: $scaleBits")
    val scale = java.lang.Math.scalb(1.0, scaleBits)
    embs.select(col(vecIdCol).as("__id"), col(vecCol).as("__v"))
      .join(strata.select(col(strataIdCol).as("__id"),
        col(strataCol).cast("string").as("stratum")), Seq("__id"))
      .select(col("stratum"),
        posexplode(transform(col("__v"),
          x => floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long")))
          .as(Seq("pos", "__q")))
      .groupBy(col("stratum"), col("pos"))
      .agg(sum(col("__q")).as("s"), count(lit(1)).as("n"))
  }

  /** Persist the per-stratum rational centroids (quantized coordinate
    * sums + counts, NOT divided — exactness survives storage) as the
    * next immutable [[LayoutStore]] snapshot: the vector-side twin of
    * [[TextAnalysis.writeTermProfileSnapshot]]. A scheduled embedding
    * pipeline snapshots its centroids each run; the next run measures
    * semantic drift against the pinned version without touching last
    * run's vectors. Returns the new version. */
  def writeCentroidSnapshot(embs: DataFrame, strata: DataFrame,
                            vecIdCol: String, strataIdCol: String,
                            strataCol: String, path: String,
                            vecCol: String = "embedding",
                            scaleBits: Int = 12): Long =
    LayoutStore.writeSnapshot(
      embs.sparkSession.sparkContext.hadoopConfiguration, path) { tmp =>
      stratumCoordSums(embs, strata, vecIdCol, strataIdCol, strataCol,
          vecCol, scaleBits)
        .write.mode("overwrite").parquet(s"$tmp/centroids")
    }

  /** Semantic drift of the CURRENT corpus's per-stratum centroids
    * against a persisted [[writeCentroidSnapshot]] (pinned-newest, or
    * an explicit `version`): per stratum, the squared L2 distance
    * between the two centroids — a stratum whose centroid walks is
    * changing meaning (a crawl source turning into spam, an embedding
    * model regression), the alarm [[semanticDispersion]]'s collapse
    * signal doesn't ring. Exact to the last bit: per-dim difference
    * numerator sa·nb − sb·na is BIGINT-exact cross-multiplication, its
    * squares sum in DECIMAL(38,0)/HUGEINT, and ONE double division by
    * the exactly-representable (na·nb)²·2^(2·scaleBits) lands both
    * engines on the identical double ((na·nb)² stays under 2^53 and the
    * scale factor is a power of two, so the denominator is exact).
    * Strata must appear on BOTH sides (inner join; a born/dead stratum
    * has no drift to measure — report presence via the d46 scorecard
    * instead). Only snapshot rows and |strata|·dims sums move; the
    * previous corpus never rescans. Output: (stratum, n_a, n_b,
    * shift_sq). */
  def centroidDriftAgainstSnapshot(spark: org.apache.spark.sql.SparkSession,
                                   embs: DataFrame, strata: DataFrame,
                                   vecIdCol: String, strataIdCol: String,
                                   strataCol: String, path: String,
                                   vecCol: String = "embedding",
                                   scaleBits: Int = 12,
                                   version: Option[Long] = None): DataFrame = {
    val scaleSq = java.lang.Math.scalb(1.0, 2 * scaleBits)
    val cur = stratumCoordSums(embs, strata, vecIdCol, strataIdCol,
      strataCol, vecCol, scaleBits)
      .select(col("stratum"), col("pos"), col("s").as("sa"), col("n").as("na"))
    val ref = LayoutStore.readSnapshotTable(spark, path, "centroids",
        version)
      .select(col("stratum"), col("pos"), col("s").as("sb"), col("n").as("nb"))
    cur.join(ref, Seq("stratum", "pos"))
      .select(col("stratum"), col("na"), col("nb"),
        (col("sa") * col("nb") - col("sb") * col("na")).as("__d"))
      .groupBy(col("stratum"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum((col("__d").cast("decimal(19,0)") *
          col("__d").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__num"))
      .select(col("stratum"), col("n_a"), col("n_b"),
        (col("__num").cast("double") /
          ((col("n_a") * col("n_b") * col("n_a") * col("n_b"))
            .cast("double") * lit(scaleSq))).as("shift_sq"))
  }

  def semanticDispersion(embs: DataFrame, strata: DataFrame,
                         vecIdCol: String, strataIdCol: String,
                         strataCol: String, vecCol: String = "embedding",
                         scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 40,
      s"scaleBits out of range: $scaleBits")
    val scale = java.lang.Math.scalb(1.0, scaleBits)
    val joined = embs.select(col(vecIdCol).as("__id"), col(vecCol).as("__v"))
      .join(strata.select(col(strataIdCol).as("__id"),
        col(strataCol).cast("string").as("stratum")), Seq("__id"))
    val q = joined.select(col("stratum"),
      posexplode(transform(col("__v"),
        x => floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long")))
        .as(Seq("__pos", "__q")))
    val perDim = q.groupBy(col("stratum"), col("__pos"))
      .agg(sum(col("__q")).as("__s"),
        sum(col("__q") * col("__q")).as("__sq"),
        count(lit(1)).as("__c"))
    perDim.groupBy(col("stratum"))
      .agg(max(col("__c")).as("n"),
        sum(col("__sq")).as("sum_sq"),
        sum(col("__s") * col("__s")).as("cent_sq"))
      .withColumn("dispersion",
        (col("n") * col("sum_sq") - col("cent_sq")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            lit(scale) * lit(scale)))
  }
}

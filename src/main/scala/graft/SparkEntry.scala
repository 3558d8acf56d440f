package graft

import graft.convert.Validator
import graft.functions.Functions._
import graft.llm.{Dedup, MediaFixtures, Multimodal, Similarity, TextAnalysis, Web}
import graft.model.SchemaBridge
import graft.operators.{Fork, RobustStats, WeightedQuantiles}
import graft.streaming.Incremental
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query has a DuckDB oracle; cross-engine hash-parity rules:
  *   - money/metric sums go through DECIMAL(27,s) (exact, order-independent)
  *     then cast to double — see Functions.decimalSum;
  *   - hashing is md5 (bit-identical in Spark and DuckDB);
  *   - timestamps leave results as strings/bigints/dates, never raw;
  *   - DuckDB SUM(int) returns HUGEINT, so oracles CAST(... AS BIGINT).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** d39's corpus-tuned gate chain (shared by the query and its
    * generated oracle): the synthetic corpus is lowercase punctuation-
    * free word-salad, so the library defaults would attribute every doc
    * to one gate — tuning the chain to the corpus IS the operator's
    * normal usage. `stubby` (no 8-char word) proxies lexical richness
    * here. */
  private val d39Gates = Seq(
    graft.llm.Filters.Gate("too_short", "n_tokens < 24"),
    graft.llm.Filters.Gate("thin", "n_chars < 180"),
    graft.llm.Filters.Gate("stubby", "max_tok_len < 8"))

  /** events.ts as epoch-MICROS bigint, robust to both parquet encodings
    * the test generator has shipped: TIMESTAMP(NANOS), which the session's
    * legacy nanosAsLong flag surfaces as bigint nanos (exact integer div),
    * and TIMESTAMP(MICROS), which arrives as an (NTZ) timestamp — under
    * the UTC session zone its unix_micros equals DuckDB's epoch_us over
    * the same naive values, so the oracles hold for either encoding. */
  private def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000")
    case _ => unix_micros(col("ts").cast("timestamp"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  /** DuckDB twin of `TextAnalysis.tokens(lower(text))`. */
  private val dTokens = "list_filter(string_split(lower(text), ' '), x -> x != '')"

  /** IVF centroids, fit ONCE per (dir, nlist) within this JVM. The s04
    * oracle embeds the SAME doubles as SQL literals (Double.toString
    * round-trips through DuckDB's strtod), so query and oracle share one
    * quantizer even though a k-means fit is not bit-reproducible across
    * runs — Verify runs the query (which populates this cache) before it
    * dumps oracle_sql.json, which is the ordering that matters. */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]
  @volatile private var lastIvfCentroids: Array[Array[Double]] = _
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Array[Double]]]]
  @volatile private var lastPqCodebooks: Array[Array[Array[Double]]] = _
  private def pqCodebooks(s: SparkSession, dir: String, m: Int,
                          ksub: Int): Array[Array[Array[Double]]] = {
    val cbs = pqCache.getOrElseUpdate(s"$dir|$m|$ksub",
      Similarity.fitPqCodebooks(t(s, dir, "embeddings"), m, ksub, dim = 64))
    lastPqCodebooks = cbs
    cbs
  }
  private def ivfCentroids(s: SparkSession, dir: String, nlist: Int): Array[Array[Double]] = {
    val cs = ivfCache.getOrElseUpdate(s"$dir|$nlist",
      Similarity.fitCentroids(t(s, dir, "embeddings"), nlist))
    lastIvfCentroids = cs
    cs
  }
  private val qmCache =
    scala.collection.concurrent.TrieMap.empty[String, (Array[Double], Double)]
  @volatile private var lastQualityModel: (Array[Double], Double) = _
  private def qualityModel(s: SparkSession, dir: String): (Array[Double], Double) = {
    val m = qmCache.getOrElseUpdate(dir,
      graft.llm.Filters.fitQualityModel(t(s, dir, "documents"), "text",
        col("lang") === "en"))
    lastQualityModel = m
    m
  }
  /** Shared by the m31 (batch) and m32 (streaming) drift probes: side A
    * = the full corpus, side B = the REFRESHED (%4 != 0) profile slice
    * alone — correct only if the probe pinned version 2; the d48
    * arithmetic with full-outer zero-fill. */
  private val profileDriftOracleSql: String =
    """WITH ca AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt_a FROM (
      |    SELECT unnest(list_filter(string_split(lower(coalesce(text, '')),
      |      ' '), x -> x != '')) AS term FROM documents)
      |  GROUP BY 1),
      |cb AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM (
      |    SELECT unnest(list_filter(string_split(lower(coalesce(text, '')),
      |      ' '), x -> x != '')) AS term FROM documents
      |    WHERE doc_id % 4 != 0)
      |  GROUP BY 1),
      |j AS (SELECT coalesce(ca.term, cb.term) AS term,
      |    coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
      |  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
      |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS na,
      |    CAST(SUM(cnt_b) AS BIGINT) AS nb FROM j),
      |w AS (SELECT term, cnt_a, cnt_b, na, nb,
      |    abs(cnt_a * nb - cnt_b * na) AS drift_num FROM j, t),
      |s AS (SELECT CAST(SUM(drift_num) AS BIGINT) AS tvd_num FROM w)
      |SELECT term, cnt_a, cnt_b, na, nb, drift_num,
      |  CAST(tvd_num AS DOUBLE) /
      |    (CAST(2 AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS tvd
      |FROM w, s
      |ORDER BY drift_num DESC, term ASC
      |LIMIT 20""".stripMargin

  /** Shared by d55 (assignment) and m34 (materialized layout): the
    * naive one-window-per-stratum formulation the banded two-phase
    * prefix count must equal bit-for-bit. */
  private val mixShardsOracleSql: String =
    """WITH f AS (SELECT doc_id AS id, source AS strata,
      |    substr(md5('mix1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS sk
      |  FROM documents)
      |SELECT id, strata,
      |  CAST(row_number() OVER w - 1 AS BIGINT) AS pos_s,
      |  CAST((row_number() OVER w - 1) % 16 AS INTEGER) AS shard
      |FROM f
      |WINDOW w AS (PARTITION BY strata ORDER BY sk, id)""".stripMargin

  private val bowCache =
    scala.collection.concurrent.TrieMap.empty[String, (Array[Double], Double)]
  @volatile private var lastBowModel: (Array[Double], Double) = _
  private def bowModel(s: SparkSession, dir: String): (Array[Double], Double) = {
    val m = bowCache.getOrElseUpdate(dir,
      graft.llm.Filters.fitHashedBowModel(t(s, dir, "documents"), "text",
        col("lang") === "en", dim = 64))
    lastBowModel = m
    m
  }

  /** Operating points DERIVED from corpus stats, not hardcoded: a fixed
    * bucket cap drops progressively more legitimate pairs at 100× corpus,
    * and a fixed SRP plane count inflates bucket occupancy linearly with
    * growth — both must track the table they run over. The parquet
    * row-count is metadata-only (no scan), cached per dir; the last
    * derived values feed the matching oracle SQL (same populate-then-dump
    * ordering contract as ivfCentroids). */
  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def tableCount(s: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate(s"$dir|$name", t(s, dir, name).count())
  @volatile private var lastBucketCap: Int = 64
  private def docBucketCap(s: SparkSession, dir: String): Int = {
    val c = Dedup.suggestedBucketCap(tableCount(s, dir, "documents"))
    lastBucketCap = c; c
  }
  // target occupancy 2: near-dup pairing wants near-empty buckets (each
  // vector is compared to ~(planes+1)×occupancy candidates at radius 1);
  // ANN recall is then bought with probe radius, not bucket size. At the
  // sf0.01 gate (500 vectors) this derives the measured 0.8-recall point
  // (8 planes); at 100× corpus it adds ~7 planes instead of letting
  // occupancy grow 100×.
  @volatile private var lastSrpPlanes: Int = 8
  @volatile private var lastSrpLayoutPlanes: Int = 3
  /** Shared by d15 (unsalted) and d17 (salted) — identical lag +
    * RANGE-framed cumulative-sum formulation; DuckDB's SUM(INT) OVER
    * returns HUGEINT, hence the BIGINT cast. */
  private val sessionsOracle: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
      |f AS (SELECT user_id, tus,
      |        CASE WHEN lag(tus) OVER w IS NULL
      |               OR tus - lag(tus) OVER w > 1800000000 THEN 1
      |             ELSE 0 END AS nw
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      |sess AS (SELECT user_id, tus,
      |           CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY tus)
      |                AS BIGINT) AS session_seq
      |         FROM f)
      |SELECT user_id, session_seq, MIN(tus) AS start_us, MAX(tus) AS end_us,
      |       COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, session_seq""".stripMargin

  private def srpPlanes(s: SparkSession, dir: String): Int = {
    val p = Similarity.suggestedPlanes(tableCount(s, dir, "embeddings"),
      targetBucketSize = 2)
    lastSrpPlanes = p; p
  }

  /** Plane count for the PERSISTED layout (m19): partition-dir count
    * targets file sizes, not probe precision — a layout wants buckets of
    * ~hundreds of rows locally (hundreds of MB at scale), where the
    * in-flight ANN queries (s02/s05) want ~2-row buckets for precision.
    * At 100TB the two derivations converge (billions of vectors support
    * thousands of dirs either way); locally this keeps the layout write
    * at ~2^3 dirs instead of 2^10. */
  private def srpLayoutPlanes(s: SparkSession, dir: String): Int = {
    val p = Similarity.suggestedPlanes(tableCount(s, dir, "embeddings"),
      targetBucketSize = 256)
    lastSrpLayoutPlanes = p; p
  }

  /** Scratch dirs for the harness queries that need local paths (m09/m18
    * stream source+sink+checkpoint, d11 state, m12 pipeline outputs): all
    * under ONE per-JVM root deleted by a shutdown hook, so repeated
    * bench/verify runs (each query runs twice per bench pass) don't
    * accumulate events.parquet copies and checkpoint data in /tmp. The
    * production APIs (Incremental.runAvailableNow, writeSignatureState,
    * Runner) take caller-owned paths — on a cluster those must be
    * shared-FS; this is oracle-harness scaffolding only. */
  private lazy val tmpRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-queries-")
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del))
        f.delete(); ()
      }
      del(root.toFile)
    }
    root
  }
  private def tmpQueryDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(tmpRoot, prefix)

  /** The verified near-dup pair graph at the standard gate config
    * (threshold 0.5, k=3, 12 hashes, 4 bands, suggested bucket cap),
    * derived ONCE per (JVM, sf dir) and served from a persisted parquet
    * fixture. m63/m64/m65/m67 and d82 all consume exactly this frame,
    * so their bench rows charge the LIFECYCLE OPERATOR under test
    * instead of re-deriving 13s of LSH fixture per query (r14 finding
    * #2 — the fold regression signal was drowning in fixture cost).
    * Determinism: nearDupPairs is a pure function of the corpus, so
    * first-caller materialization cannot change any query's result. */
  private val ndPairsCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def ndPairsFixture(s: SparkSession, dir: String): DataFrame = {
    val path = ndPairsCache.getOrElseUpdate(dir, {
      val p = tmpQueryDir("ndpairs-fixture").toString + "/pairs"
      Dedup.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, k = 3, numHashes = 12, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))
        .write.parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** d68/d69 messy-URL synthesis (the d31 planted-input convention): the
    * corpus has no URL column, so both engines construct the SAME
    * doc_id/source-derived URL covering every normalization axis —
    * scheme/host case, default vs real ports, trailing slash, param
    * order, tracking params, fragments. */
  private def messyUrl: Column = concat(
    when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("http")),
    lit("://"),
    when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("www.")),
    col("source"), lit(".ex"), (col("doc_id") % 7).cast("string"),
    lit(".COM"),
    when(col("doc_id") % 3 === 0, lit(":443"))
      .otherwise(when(col("doc_id") % 5 === 0, lit(":80"))
        .otherwise(lit(""))),
    lit("/Docs/"), (col("doc_id") % 50).cast("string"),
    when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0, lit("?b=2&a=1&utm_source=feed"))
      .otherwise(lit("?a=1&b=2")),
    when(col("doc_id") % 6 === 0, lit("#frag")).otherwise(lit("")))

  /** DuckDB twin of [[messyUrl]], same literals operator-for-operator. */
  private val messyUrlSql: String =
    """(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END)
      |    || '://'
      |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END)
      |    || source || '.ex' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
      |    || (CASE WHEN doc_id % 3 = 0 THEN ':443'
      |             WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END)
      |    || '/Docs/' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=feed'
      |             ELSE '?a=1&b=2' END)
      |    || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  /** BPE-ish tokenizer regex (d13): alphanumeric/apostrophe runs or single
    * non-space symbols. Deliberately RE2-compatible (no lookarounds) so
    * the DuckDB oracle evaluates the IDENTICAL pattern. */
  private val bpePattern = "[a-z0-9']+|[^a-z0-9'\\s]"
  private def bpePatternSqlLit: String = s"'${bpePattern.replace("'", "''")}'"

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core -------------------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decimalSum(col("l_quantity"), 2).as("sum_qty"),
          decimalSum(col("l_extendedprice"), 2).as("sum_base_price"),
          decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          decimalAvg(col("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),
    "q02_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),
    "q03_join_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          decimalSum(col("o_totalprice"), 2).as("total_price"))
    }),
    "q05_region_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
    }),
    "q06_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_orderkey").as("o_orderkey"))
      o.join(li, Seq("o_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    }),
    "q07_anti_join" -> ((s, dir) => {
      // Customers with no order since the cutoff — dedup-against-existing
      // shape (non-empty at every sf, unlike an all-time anti-join).
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti").select("c_custkey", "c_name")
    }),
    "q08_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_total",
          sum(col("o_totalprice").cast("decimal(27,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select("o_custkey", "o_orderkey", "rn", "run_total")
    }),
    "q09_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    }),
    "q10_sort_limit" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),
    "q11_set_intersect" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),
    "q12_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), decimalSum(col("l_quantity"), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))),
    "q13_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))),
    "q15_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))),
    "q14_except_all" -> ((s, dir) => {
      // multiset difference (deep record equality surface, SURVEY §2.2/2.9)
      val a = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val b = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      a.exceptAll(b).groupBy(col("custkey")).agg(count(lit(1)).as("n"))
    }),

    // ---- marmaray dataflow surface --------------------------------------
    "m01_validate_split" -> ((s, dir) => {
      val rules = Seq(
        Validator.Rule("missing_required_field:o_totalprice", col("o_totalprice").isNull),
        Validator.Rule("totalprice_below_min", col("o_totalprice") < 1000),
        Validator.Rule("bad_status", !col("o_orderstatus").isin("O", "F", "P")))
      Validator.withErrors(t(s, dir, "orders"), rules)
        .select(col("o_orderkey"), col("error_message"),
          col("error_message").isNull.as("is_valid"))
    }),
    "m02_fork_counts" -> ((s, dir) => {
      val tags = array_compact(array(
        when(lit(true), lit(0)),
        when(col("value") > 100, lit(1)),
        when(col("event_type") === "error", lit(2))))
      val grouped = t(s, dir, "events")
        .select(explode(tags).as("fork_key"))
        .groupBy(col("fork_key"))
        .agg(count(lit(1)).as("cnt"))
      // Left-join the static key list so a fork key that never fires still
      // reports n=0 (Fork.count semantics; the oracle always emits 3 rows).
      val keys = s.range(3).select(col("id").cast("int").as("fork_key"))
      keys.join(grouped, Seq("fork_key"), "left")
        .select(col("fork_key"), coalesce(col("cnt"), lit(0L)).as("n"))
    }),
    "m03_ts_convert" -> ((s, dir) =>
      // o_orderdate arrives as TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
      // with a UTC session the cast to TIMESTAMP preserves the wall clock,
      // matching DuckDB's naive-as-UTC epoch_ms.
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"),
          timestampToMillis(col("o_orderdate").cast("timestamp")).as("ts_ms"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))),
    "m04_csv_lines" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          csvLine(Seq(col("c_custkey").cast("string"), col("c_name"),
            col("c_mktsegment"))).as("line"))),
    "m05_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))),
    "m11_json_lines" -> ((s, dir) =>
      // Avro->JSON line converter surface (FileSinkDataJSONConverter)
      t(s, dir, "customer")
        .select(col("c_custkey"),
          jsonObject(col("c_custkey"), col("c_name")).as("line"))),
    "m10_salted_count" -> ((s, dir) =>
      // two-stage skew-spread aggregation must equal the plain GROUP BY
      graft.operators.Skew.saltedCount(t(s, dir, "events"), Seq("event_type"), 8)),
    "m07_avro_roundtrip" -> ((s, dir) => {
      // rows -> Avro binary -> rows through the avro-core codec; the
      // aggregate matching the plain-table oracle certifies the round-trip
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      val avroJson = SchemaBridge.structToAvro(docs.schema).toString
      SchemaBridge.decode(SchemaBridge.encode(docs), avroJson)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
    }),
    "m13_avro_rdd_roundtrip" -> ((s, dir) => {
      // the RDD-codec twin of m07: same semantics, kept verified so the
      // bench exposes the expression-vs-RDD codec delta on a like basis
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      val avroJson = SchemaBridge.structToAvro(docs.schema).toString
      SchemaBridge.decodeViaRdd(SchemaBridge.encodeViaRdd(docs), avroJson)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
    }),
    "m08_conform" -> ((s, dir) => {
      val target = StructType(Seq(
        StructField("event_id", LongType),
        StructField("value", DoubleType),
        StructField("user_id", StringType),    // long -> string coercion
        StructField("added_col", StringType))) // absent -> null
      Validator.conformTo(t(s, dir, "events"), target)
    }),
    "m09_stream_available_now" -> ((s, dir) => {
      // incremental-batch semantics end-to-end: checkpointed AvailableNow
      // stream over the events parquet into a sink dir, then aggregate
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the file stream source needs a DIRECTORY to watch
      val src = tmpQueryDir("m09-src")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("events.parquet"))
      val out = tmpQueryDir("m09-sink").toString
      val ckpt = tmpQueryDir("m09-ckpt").toString
      Incremental.runAvailableNow(s, src.toString, schema, "parquet",
        identity, out, ckpt).awaitTermination()
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), decimalSum(col("value"), 2).as("sum_value"))
    }),

    "m24_stream_funnel" -> ((s, dir) => {
      // the d39 gate chain as a STREAMING stage: stateless curation
      // transforms drop into a checkpointed AvailableNow file stream
      // unchanged (one micro-batch = one map-side projection), so the
      // batch oracle gates the streaming path's output verbatim
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = tmpQueryDir("m24-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val out = tmpQueryDir("m24-sink").toString
      val ckpt = tmpQueryDir("m24-ckpt").toString
      Incremental.runAvailableNow(s, src.toString, schema, "parquet",
        df => graft.llm.Filters.funnel(df, "doc_id", "text",
          gates = d39Gates),
        out, ckpt).awaitTermination()
      s.read.parquet(out)
    }),

    "m29_stream_heavy_hitters" -> ((s, dir) => {
      // d50's Misra-Gries sketch as a STREAMING aggregation: the
      // TypedImperativeAggregate's serialize/merge ride the state store
      // across micro-batches (complete-mode memory sink), and the batch
      // oracle gates the streamed result verbatim — exact regime, so
      // arrival order across micro-batches cannot matter
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = tmpQueryDir("m29-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val name = "m29_hh_" + src.getFileName.toString.replaceAll("[^A-Za-z0-9]", "")
      Incremental.runAggregateAvailableNow(s, src.toString, schema,
        "parquet",
        df => df.select(col("lang"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
          .groupBy(col("lang"))
          .agg(graft.functions.FrequentItems
            .frequentItems(col("term"), capacity = 64).as("items")),
        name, stateShufflePartitions = Some(8))
        .select(col("lang"), explode(col("items")).as("it"))
        .select(col("lang"), col("it.term").as("term"),
          col("it.count").as("cnt"))
    }),

    // ---- training-data ops ----------------------------------------------
    "d01_exact_dedup" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(Dedup.exactKey(col("text")).as("fp"), col("doc_id"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))),
    "d02_quality" -> ((s, dir) => {
      // Features computed over lower(text) on BOTH sides (the oracle's
      // tokens are lowercased; mixed-case docs would otherwise diverge).
      val feats = TextAnalysis.qualityFeatures(lower(col("text")))
        .map { case (name, c) => c.as(name) }
      t(s, dir, "documents").select(col("doc_id") +: feats: _*)
    }),
    "d22_repetition" -> ((s, dir) =>
      // Gopher-family repetition ratios (dup/mode n-gram mass, n=1..3):
      // map-side sort+fold per doc, no shuffle, staged so each expensive
      // array op runs once — the oracle recomputes the mode count by a
      // deliberately different (quadratic list) formulation, so the
      // integers cross-check the fold
      TextAnalysis.repetitionReport(t(s, dir, "documents"), "doc_id", "text")),
    "d24_mix_take" -> ((s, dir) =>
      // data mixing: largest corpus at a 50/25/25 en/zh/de composition,
      // rows picked by the deterministic salted-hash order (d16/d19's
      // portability contract); bottleneck stratum kept ~whole
      graft.llm.Sampling.mixTake(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25), salt = "mix8")),
    "d23_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: every ~97th doc plays the eval set;
      // training docs are flagged by distinct shared 8-shingle md5 keys
      val docs = t(s, dir, "documents")
      Dedup.contaminationFlags(docs, docs.where(col("doc_id") % 97 === 0),
        "doc_id", "text", k = 8)
    }),
    "d26_pack_sequences" -> ((s, dir) =>
      // training-sequence packing (concat-and-chunk): deterministic
      // salted-hash shuffle order, two-phase distributed prefix sum
      // (tiny bucket-offset window + bucket-partitioned cumsum) ==
      // the one-global-window formulation bit-exactly — which is what
      // the oracle runs
      graft.llm.Packing.packSequences(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokenCount(col("text")).cast("long"),
        budget = 2048)),
    "d44_chunk_windows" -> ((s, dir) =>
      // retrieval chunking: overlapping 32-token windows every 24
      // tokens, deterministic (id, chunk_idx) identity — pure map-side
      // explode inside the scan stage, no exchange at any scale
      TextAnalysis.chunkWindows(t(s, dir, "documents"),
        "doc_id", "text", width = 32, stride = 24)),
    "d43_bigram_coherence" -> ((s, dir) =>
      // second-order familiarity: common words in corpus-rare ORDER
      // score low; integer bigram/lead masses off ONE corpus pass, one
      // double division
      TextAnalysis.bigramCoherence(t(s, dir, "documents"),
        "doc_id", "text")),
    "m34_balanced_shard_layout" -> ((s, dir) => {
      // d55's mix-preserving assignment MATERIALIZED with mix-LOCAL
      // in-shard order (sorted by round-robin turn, then stratum — any
      // contiguous read window carries the corpus mix) and read back;
      // same oracle as d55 because the layout IS the assignment
      val assigned = graft.llm.Packing.shardAssignBalanced(
        t(s, dir, "documents"), "doc_id", "source", nShards = 16,
        salt = "mix1")
      val path = tmpQueryDir("m34-shards").toString + "/layout"
      graft.llm.Packing.writeBalancedShardLayout(assigned, 16, path)
      s.read.parquet(path)
        .select(col("id"), col("strata"), col("pos_s"), col("shard"))
    }),
    "m23_shard_layout" -> ((s, dir) => {
      // d42's assignment MATERIALIZED as the trainer-facing layout (one
      // dir per shard, pos-ordered files) and read back — proves the
      // write path round-trips; same oracle as d42 because the layout
      // is exactly the assignment
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val assigned = graft.llm.Packing.shardAssign(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 8, salt = "s42")
      val path = tmpQueryDir("m23-shards").toString + "/layout"
      graft.llm.Packing.writeShardLayout(assigned, path)
      s.read.parquet(path)
        .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"))
    }),
    "d42_shard_assign" -> ((s, dir) =>
      // deterministic training-shard assignment: shard + in-shard pos
      // are pure functions of (salt, doc_id) — map-side shard id, one
      // exchange for the within-shard row_number; re-runs and the
      // DuckDB twin produce byte-identical shard layouts
      graft.llm.Packing.shardAssign(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 8, salt = "s42")),
    "d27_boilerplate_spans" -> ((s, dir) =>
      // exact-substring (span) dedup inside docs: 4-token spans seen in
      // > 2 docs are boilerplate; covered positions are cut and the
      // survivors re-join — the Lee et al. ACL'22 pass the document-
      // level detectors (d01/d04/d05) can't express
      Dedup.removeBoilerplateSpans(t(s, dir, "documents"), "doc_id", "text",
        width = 4, maxDocFreq = 2)),
    "d28_regex_tokens" -> ((s, dir) =>
      // BPE-ish pre-tokenization profile: the RE2-compatible alternation
      // pattern (no lookaround) runs IDENTICALLY under Java regex here
      // and RE2 in the oracle; counts are integers, the one ratio is a
      // per-row division
      TextAnalysis.regexTokenStats(t(s, dir, "documents"), "doc_id", "text")),
    "d29_unigram_familiarity" -> ((s, dir) =>
      // log-free unigram-LM quality scoring: mean corpus frequency +
      // rare-token mass, all integer sums (ln() would drift across
      // libms; monotone surrogate keeps the ranking)
      TextAnalysis.unigramFamiliarity(t(s, dir, "documents"), "doc_id", "text")),
    "d30_temperature_mix" -> ((s, dir) =>
      // T5-style temperature-smoothed mixing at alpha=0.5: floor(sqrt(n))
      // integer weights keep the rate math engine-exact; the skewed lang
      // column (en dominates) is the realistic multilingual shape
      graft.llm.Sampling.temperatureSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", totalTarget = 300, salt = "temp9")),
    "d31_pii_scrub" -> ((s, dir) => {
      // PII scrub (emails/creds/IPs/phones/SSNs) as a portable
      // regexp_count/replace chain (llm.Pii). The synthetic corpus has
      // no PII shapes, so the demo input plants deterministic
      // doc_id-derived PII fields — the SAME expressions in both
      // engines — and the scrub itself is the thing under test
      // (non-zero per-category counts + hash-matched redacted text)
      val pii = t(s, dir, "documents").select(col("doc_id"), concat_ws(" ",
        col("text"),
        concat(lit("contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com")),
        when(col("doc_id") % 3 === 0, concat(lit("call 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))),
        when(col("doc_id") % 5 === 0, concat(lit("host 10.0."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") % 100).cast("string"))),
        when(col("doc_id") % 7 === 0, concat(lit("api_key=sk_"),
          col("doc_id").cast("string"), lit("x9"))),
        when(col("doc_id") % 11 === 0, concat(lit("ssn 123-45-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))).as("text"))
      graft.llm.Pii.scrub(pii, "doc_id", "text")
    }),
    "d32_decontam_refresh" -> ((s, dir) => {
      // bench-key snapshot lifecycle: v1 = stale eval set (doc_id%7),
      // v2 = refreshed (doc_id%5). The reader pins the LATEST snapshot,
      // so v1-only keys are retired by construction — the oracle flags
      // against the %5 eval set ALONE; any leakage of v1 keys into the
      // live set would change n_hits and fail the hash compare
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("d32-benchkeys").toString + "/keys"
      Dedup.writeBenchKeysSnapshot(docs.where(col("doc_id") % 7 === 0),
        "text", store, k = 8)
      Dedup.writeBenchKeysSnapshot(docs.where(col("doc_id") % 5 === 0),
        "text", store, k = 8)
      Dedup.contaminationFlagsAgainstKeys(docs,
        Dedup.readBenchKeysLatest(s, store, k = 8), "doc_id", "text", k = 8)
    }),
    "d34_diversity_take" -> ((s, dir) =>
      // embedding-diversity sampling: Voronoi cells over the SAME frozen
      // 16-centroid set the IVF family uses, nPerCell=20 by salted-hash
      // order — flattens semantic density skew instead of preserving it
      // like a plain hash sample
      graft.llm.Sampling.diversityTake(t(s, dir, "embeddings"), "vec_id",
        "embedding", ivfCentroids(s, dir, 16), nPerCell = 20, salt = "div9")),
    "d35_decontam_spans" -> ((s, dir) => {
      // surgical decontamination: cut the SPANS matching the eval set's
      // 8-shingles (same %97 eval set as d23) instead of dropping whole
      // docs — the d27 machinery with the bench-key store as the flag set
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("d35-benchkeys").toString + "/keys"
      Dedup.writeBenchKeysSnapshot(docs.where(col("doc_id") % 97 === 0),
        "text", store, k = 8)
      Dedup.decontaminateSpans(docs,
        "doc_id", "text", Dedup.readBenchKeysLatest(s, store, k = 8),
        width = 8)
    }),
    "d33_canonical_quality" -> ((s, dir) =>
      // d09's clusters with a production keeper rule: canonical = the
      // LONGEST doc in the cluster (ties -> min id), not the min id —
      // same LSH/CC machinery, different argmax, so the oracle
      // cross-checks the decision layer in isolation
      Dedup.canonicalByQuality(t(s, dir, "documents"), "doc_id", "text",
        quality = length(col("text")).cast("long"),
        threshold = 0.5, k = 3, numHashes = 12, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))),
    "d36_importance_select" -> ((s, dir) =>
      // DSIR-style targeted selection: rank the raw corpus by the
      // rational mean-frequency surrogate of p_target/p_raw (target =
      // the 'en' sub-corpus), take the top 200 — the selection plans as
      // TakeOrderedAndProject, not a global sort
      TextAnalysis.importanceScores(t(s, dir, "documents"), "doc_id",
          "text", isTarget = col("lang") === "en")
        .orderBy(col("ratio").desc, col("id").asc).limit(200)),
    "d37_novelty" -> ((s, dir) =>
      // inter-doc originality: fraction of a doc's distinct 4-token
      // grams that no other doc contains (d27's gram keys, so a novelty
      // bar composes with span removal); df aggregates map-side — no
      // ubiquitous-gram window straggler
      TextAnalysis.noveltyScores(t(s, dir, "documents"), "doc_id", "text",
        width = 4)),
    "d38_vocab_oov" -> ((s, dir) =>
      // tokenizer-prep coverage study: top-20 vocabulary by corpus count
      // (ties lexicographic; 20 of the corpus's 31 distinct terms, so
      // OOV mass is non-trivial), per-doc OOV rate against it; the
      // vocab cut is TakeOrdered + broadcast, never a global sort
      TextAnalysis.vocabOovRates(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 20)),
    "d41_bpe_pairs" -> ((s, dir) =>
      // distributed BPE merge statistics: the corpus contributes ONE
      // word-count aggregate; the pair explode rides the vocabulary
      // weighted by word frequency; cut = TakeOrdered(50) on
      // (count desc, pair asc)
      TextAnalysis.bpePairStats(t(s, dir, "documents"), "text", topK = 50)),
    "s11_stratum_centroids" -> ((s, dir) =>
      // semantic drift matrix: per-lang centroid cosine from EXACT
      // integer dimension sums (floor(x*2^20+0.5) quantization), one
      // embeddings pass; cosine of sum vectors == cosine of means
      Similarity.stratumCentroidMatrix(t(s, dir, "embeddings"),
        t(s, dir, "documents"), "vec_id", "doc_id", "lang")),
    "d39_filter_funnel" -> ((s, dir) =>
      // C4/Gopher-style gate chain with first-failing-rule attribution:
      // predicates are SHARED SQL strings over a portable feature
      // vector (the oracle is generated from the same gate table), the
      // whole thing one map-side projection — zero exchanges. The chain
      // here is corpus-TUNED (the operator's normal usage — the
      // synthetic word-salad has no punctuation/case, so the default
      // chain would drop everything at one gate): 66/65/43 docs fall at
      // the three gates, 326 keep (sf0.01)
      graft.llm.Filters.funnel(t(s, dir, "documents"), "doc_id", "text",
        gates = d39Gates)),
    "d40_stratum_overlap" -> ((s, dir) =>
      // cross-stratum contamination matrix over the d27/d35 span keys:
      // distinct 8-shingle overlap + Jaccard for every lang pair,
      // zero-overlap pairs included — the corpus-level audit the
      // per-doc decontamination operators drill into
      graft.llm.Dedup.stratumOverlap(t(s, dir, "documents"), "text",
        "lang", width = 8)),
    "d03_lang_scores" -> ((s, dir) => {
      val scores = TextAnalysis.langScores(col("text"))
        .map { case (name, c) => c.as(name) }
      t(s, dir, "documents").select(col("doc_id") +: scores: _*)
    }),
    "d04_lsh_neardups" -> ((s, dir) =>
      // MinHash(12) -> LSH(4 bands) candidates -> exact-Jaccard verify;
      // band-bucket cap derived from corpus size (mega-buckets belong to
      // exact dedup, and the cap must grow with collision noise at scale)
      Dedup.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, k = 3, numHashes = 12, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))),
    "d05_simhash" -> ((s, dir) =>
      // two-step: token hashes materialize once, then 64 bit-votes read them
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.md5TokenHashes(col("text")).as("__h"))
        .select(col("doc_id"), Dedup.simhashBitsFromHashes(col("__h")).as("simhash"))),
    "d14_simhash_neardups" -> ((s, dir) =>
      // Hamming-space near-dups: pigeonhole-banded candidate join (one of
      // 4 16-bit chunks must match exactly when hamming <= 3), exact
      // Hamming verify on candidates only — the Manku'07 detector that
      // complements shingle-Jaccard LSH (d04)
      Dedup.simhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))),
    "d21_simhash_combined" -> ((s, dir) =>
      // the WEB-SCALE blocking tier (Manku'07 chunk-combination keys,
      // 6C3 -> 2^33-value keys): recall is still a pigeonhole guarantee,
      // so the oracle is the scheme-INDEPENDENT brute-force hamming<=3
      // pair set — the strongest statement the detector can make
      Dedup.simhashNearDupPairsCombined(t(s, dir, "documents"), "doc_id",
        "text", maxHamming = 3, chunks = 6)),

    "d15_sessions" -> ((s, dir) =>
      // gap-based batch sessionization (30-min gap): the batch twin of the
      // streaming flatMapGroupsWithState sessionize — one shuffle on the
      // key serves both window passes and the rollup
      graft.operators.Sessionize.sessions(
        { val ev = t(s, dir, "events")
          ev.select(col("user_id"), tsMicros(ev).as("tus")) },
        "user_id", "tus", gap = 1800000000L)
        .select(col("user_id"), col("session_seq"),
          col("start_ts").as("start_us"), col("end_ts").as("end_us"),
          col("n_events"))),

    "d17_salted_sessions" -> ((s, dir) =>
      // d15's sessionization through the HOT-KEY-SAFE salted path
      // (events sessionize within (user, day) ranges, stubs merge across
      // boundaries): identical output to the unsalted pass, under the
      // same independent DuckDB oracle — no partition ever sorts one
      // user's full history
      graft.operators.Sessionize.sessionsSalted(
        { val ev = t(s, dir, "events")
          ev.select(col("user_id"), tsMicros(ev).as("tus")) },
        "user_id", "tus", gap = 1800000000L, rangeWidth = 86400000000L)
        .select(col("user_id"), col("session_seq"),
          col("start_ts").as("start_us"), col("end_ts").as("end_us"),
          col("n_events"))),

    "d20_bloom_dedup" -> ((s, dir) => {
      // dedup-against-existing with the Bloom pre-filter: only
      // bloom-positive rows (true dups + fpp sliver) reach the exact
      // anti-join; result identical to the plain anti-join by
      // construction (no false negatives, positives re-verified)
      val docs = t(s, dir, "documents")
      val existing = docs.where(col("doc_id") < 250)
        .select(Dedup.exactKey(col("text")).as("fp"))
      val batch = docs.select(col("doc_id"), Dedup.exactKey(col("text")).as("fp"))
      graft.sinks.Sinks.bloomDedupAgainstExisting(batch, existing, "fp",
        expectedItems = 1000)
        .select(col("doc_id"), col("fp"))
    }),

    "d18_keywords" -> ((s, dir) =>
      // per-doc keyword extraction: top-3 terms by the rational tf-idf
      // variant (tf * N / df — integer inputs, one IEEE multiply+divide,
      // bit-exact in any engine; see TextAnalysis.keywordScores)
      TextAnalysis.keywordScores(t(s, dir, "documents"), "doc_id", "text",
        topK = 3)
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rank"))),

    "d19_stratified_take" -> ((s, dir) =>
      // exactly-20-docs-per-language balanced subset, deterministic in
      // (salt, doc_id) — reproducible across engines and partitionings
      graft.llm.Sampling.stratifiedTake(t(s, dir, "documents"),
        "doc_id", "lang", n = 20, salt = "s7")
        .select(col("doc_id"), col("lang"))),

    "d16_hash_sample" -> ((s, dir) =>
      // deterministic stratified sampling: membership = pure function of
      // (salt, doc_id), so the subset is reproducible across runs/engines/
      // partitionings (df.sample is not); per-lang rates rebalance the
      // corpus in ONE map-side codegen'd filter, no shuffle at any scale
      graft.llm.Sampling.stratifiedHashSample(t(s, dir, "documents"),
        "doc_id", "lang", Map("en" -> 0.3, "zh" -> 0.8),
        defaultRate = 0.5, salt = "s42")
        .select(col("doc_id"), col("lang"))),

    "d08_minhash_estimate" -> ((s, dir) => {
      // estimated Jaccard from signature agreement on the LSH candidates
      // (the cheap pre-filter a verify pass would rank by at scale)
      val docs = t(s, dir, "documents")
      val sigs = docs
        .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("__toks"))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("__sh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("__sh"), 12).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // lazy candidates: the pair plan fuses into the estimate join (an
      // eager lshCandidatePairs would checkpoint a frame consumed once)
      val (cands, bandSig) = Dedup.lshCandidatePairsLazy(docs, "doc_id", "text")
      val est = cands
        .join(sigs.select(col("doc_id").as("id1"), col("sig").as("sig1")), Seq("id1"))
        .join(sigs.select(col("doc_id").as("id2"), col("sig").as("sig2")), Seq("id2"))
        .select(col("id1"), col("id2"),
          Dedup.signatureSimilarity(col("sig1"), col("sig2")).as("est_jaccard"))
      Dedup.materializeAndRelease(est, sigs, bandSig)
    }),
    "m14_curation_pipeline" -> ((s, dir) => {
      // The full training-data curation flow as ONE oracle-gated query:
      // quality gate (token count + uniqueness over lower(text)) ->
      // exact dedup (min-id keeper per normalized fingerprint) ->
      // near-dup clustering on the survivors (drop non-keepers) ->
      // per-language curated-corpus stats. Every stage is map-side or
      // key-shuffled only; text never shuffles except into the quality
      // projection.
      val docs = t(s, dir, "documents")
      val toks = TextAnalysis.tokens(lower(col("text")))
      val qual = docs
        .withColumn("__nt", size(toks).cast("long"))
        .withColumn("__ur",
          size(array_distinct(toks)).cast("double") / col("__nt").cast("double"))
        .where(col("__nt") >= 10 && col("__ur") > 0.3)
        .drop("__nt", "__ur")
      val exact = Dedup.exactDedup(qual, "text", "doc_id")
        // feeds the near-dup pipeline (two scans) and the final join:
        // materialize the dedup once, not three times
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // scoped event window: only THIS run's driver events drain below,
      // even if another pipeline records concurrently
      val evScope = s"m14-${java.util.UUID.randomUUID()}"
      val dropIds = graft.core.Metrics.withScope(evScope) {
        Dedup.nearDupClusters(exact, "doc_id", "text", threshold = 0.5,
          maxBucketSize = Some(docBucketCap(s, dir)))
      }.where(!col("keep")).select(col("id").as("doc_id"))
      // the CC loop inside nearDupClusters just ran eagerly — publish its
      // round count (a driver-loop counter no action computes) to the
      // telemetry metrics table; side output, not the returned frame
      graft.core.Telemetry.appendMetrics(s,
        graft.core.Telemetry.fromDriverEvents("m14",
          graft.core.Metrics.drainDriverEvents(evScope)),
        tmpQueryDir("m14-telemetry").toString + "/metrics",
        java.time.LocalDate.now())
      val curated = exact.join(dropIds, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
      Dedup.materializeAndRelease(curated, exact)
    }),
    "d10_winnow_overlap" -> ((s, dir) =>
      // fingerprint-overlap near-dups (the winnowing detector's purpose):
      // pairs by shared-fp Jaccard over the capped fp sets — finds the
      // same planted near-dup pairs as d04 through a completely different
      // signal. The cap is NOT optional at scale: ubiquitous-gram buckets
      // grow with the corpus, and the uncapped self-join went quadratic
      // at sf0.1 (31s of a 21s bench)
      Dedup.winnowingOverlapPairs(t(s, dir, "documents"), "doc_id", "text",
        minSim = 0.3, maxBucketSize = Some(docBucketCap(s, dir)))),
    "d25_containment" -> ((s, dir) =>
      // quote/subset detection: shared winnowing fps over the SMALLER fp
      // set — catches short-doc-inside-long-doc pairs Jaccard dilutes
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        minContainment = 0.6, maxBucketSize = Some(docBucketCap(s, dir)))),
    "d09_dedup_clusters" -> ((s, dir) =>
      // pairs -> connected components -> keeper decision: the step that
      // turns near-dup pairs into an actual dedup (keep = id == cluster)
      Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, k = 3, numHashes = 12, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))),
    "d80_incremental_cc" -> ((s, dir) => {
      // incremental CC maintenance: the verified near-dup pairs split by
      // a deterministic pair hash into a ~2/3 historical graph and a
      // ~1/3 appended batch; history labels once (the persisted-state
      // cost every refresh AVOIDS re-paying), the batch folds in via
      // label contraction — frontier-sized CC, broadcast remap, history
      // never shuffles. The oracle is the from-scratch transitive
      // closure over ALL pairs: the maintenance invariant (fold ==
      // rebuild on the union) is stated, not assumed
      val pairs = Dedup.nearDupPairs(t(s, dir, "documents"), "doc_id",
        "text", threshold = 0.5, k = 3, numHashes = 12, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val isNew = pmod(xxhash64(col("id1"), col("id2")), lit(3)) === 0
      val prior = Dedup.connectedComponents(pairs.where(!isNew))
      val out = Dedup.incrementalConnectedComponents(prior,
        pairs.where(isNew))
      Dedup.materializeAndRelease(out, pairs)
    }),
    "d47_repeat_schedule" -> ((s, dir) =>
      // data-constrained repeat plan: 40+-token docs train 2 epochs,
      // the rest 1; each (epoch, doc) gets a fresh deterministic order
      // key so no epoch replays another's shuffle — map-side explode
      graft.llm.Packing.repeatSchedule(t(s, dir, "documents"),
        "doc_id",
        when(TextAnalysis.tokenCount(col("text")) >= 40, 2).otherwise(1),
        salt = "rep1")),
    "d48_distribution_drift" -> ((s, dir) =>
      // term-distribution drift between two corpus slices (en vs rest):
      // top movers by exact integer cross-multiplied |cnt_a·nb − cnt_b·na|
      // plus the corpus-level TVD in one final division — only distinct
      // terms ever shuffle, the cut is TakeOrderedAndProject
      TextAnalysis.distributionDrift(t(s, dir, "documents"), "text",
        col("lang") === "en", topK = 20)),
    "d49_length_batches" -> ((s, dir) => {
      // inference-time dynamic batching: band by token length, fill
      // 8-doc batches longest-first within each (band, shard) — 2
      // deterministic shards per band exercise the hot-band salting the
      // operator ships for real length distributions; report per-batch
      // pad-to-longest waste (all integer)
      val docs = t(s, dir, "documents")
      graft.llm.Packing.batchStats(
        graft.llm.Packing.lengthBucketBatches(docs, "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("long"),
          batchSize = 8, bandWidth = 32, saltShards = 2, salt = "lb1"))
    }),
    "m31_profile_drift" -> ((s, dir) => {
      // cross-run drift monitoring through the versioned store: run 1
      // profiles the even half, run 2 REFRESHES with the %4!=0 slice,
      // and the current full corpus drifts against the pinned-newest —
      // any v1 leakage shifts cnt_b/nb and fails the oracle hash (the
      // m25/m26 retirement contract on a statistics snapshot)
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m31-profile").toString + "/store"
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 2 === 0), "text", store)
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 4 =!= 0), "text", store)
      TextAnalysis.driftAgainstProfile(s, docs, "text", store, topK = 20)
    }),
    "m32_stream_drift" -> ((s, dir) => {
      // m31's cross-run drift monitor as a STREAMING stage: each ingest
      // micro-batch drifts against the pinned-newest profile snapshot,
      // re-pinned per batch so a profile refresh takes effect without a
      // stream restart. One AvailableNow batch over the full table here,
      // so the batch oracle gates the streamed output verbatim (the m24
      // contract); same two-version store as m31 proves v2 pinning
      // through the foreachBatch path
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m32-prof").toString + "/store"
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 2 === 0), "text", store)
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 4 =!= 0), "text", store)
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = tmpQueryDir("m32-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val out = tmpQueryDir("m32-sink").toString
      val ckpt = tmpQueryDir("m32-ckpt").toString
      Incremental.profileDriftStream(
        s.readStream.schema(schema).parquet(src.toString),
        "text", store, out, ckpt, topK = 20).awaitTermination()
      s.read.parquet(out)
        .select("term", "cnt_a", "cnt_b", "na", "nb", "drift_num", "tvd")
    }),
    "m33_centroid_drift" -> ((s, dir) => {
      // semantic drift across runs — the vector-side twin of m31: run 1
      // snapshots the even half's per-label rational centroids, run 2
      // REFRESHES with the %4!=0 slice, and the full corpus drifts
      // against the pinned-newest — per-label squared centroid shift,
      // integer-exact cross-multiplication into ONE double division
      // (the d53 quantization contract); stale-version leakage shifts
      // n_b and fails the hash
      val emb = t(s, dir, "embeddings")
      val strata = emb.select(col("vec_id"), col("label"))
      val store = tmpQueryDir("m33-cent").toString + "/store"
      Similarity.writeCentroidSnapshot(
        emb.where(col("vec_id") % 2 === 0),
        strata, "vec_id", "vec_id", "label", store, scaleBits = 12)
      Similarity.writeCentroidSnapshot(
        emb.where(col("vec_id") % 4 =!= 0),
        strata, "vec_id", "vec_id", "label", store, scaleBits = 12)
      Similarity.centroidDriftAgainstSnapshot(s, emb, strata,
        "vec_id", "vec_id", "label", store, scaleBits = 12)
    }),
    "m36_stream_edit_dedup" -> ((s, dir) => {
      // m35's ingest-time filter as a STREAMING stage: each micro-batch
      // probes the pinned-newest edit index (re-pinned per batch — an
      // index refresh, even a k retune, needs no stream restart). One
      // AvailableNow batch over the %3==0 slice here, so the m35 batch
      // oracle gates the streamed output verbatim (the m24/m32 contract)
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m36-editidx").toString + "/store"
      Dedup.writeEditIndexSnapshot(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text", 8, store)
      Dedup.writeEditIndexSnapshot(
        docs.where(col("doc_id") % 3 =!= 0), "doc_id", "text", 8, store)
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = tmpQueryDir("m36-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val out = tmpQueryDir("m36-sink").toString
      val ckpt = tmpQueryDir("m36-ckpt").toString
      Incremental.editDedupStream(
        s.readStream.schema(schema).parquet(src.toString)
          .where(col("doc_id") % 3 === 0),
        "doc_id", "text", store, out, ckpt).awaitTermination()
      s.read.parquet(out).select("doc_id", "edit_dup", "min_dist")
    }),
    "m35_edit_incremental" -> ((s, dir) => {
      // daily-shard edit-dedup against the versioned segment index: v2
      // (the %3!=0 slice) retires v1 — the probe pins newest, the oracle
      // re-derives from the refresh slice alone, so stale-version leakage
      // fails the hash (the m31/d56 pinning contract)
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m35-editidx").toString + "/store"
      Dedup.writeEditIndexSnapshot(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text", 8, store)
      Dedup.writeEditIndexSnapshot(
        docs.where(col("doc_id") % 3 =!= 0), "doc_id", "text", 8, store)
      Dedup.editDupFlags(s, docs.where(col("doc_id") % 3 === 0),
        "doc_id", "text", store)
    }),
    "d63_lsh_recall" -> ((s, dir) =>
      // the band-miss-rate gauge: exact ground truth (lossless shared-
      // shingle generator + exact Jaccard) vs the production LSH config;
      // precision reads 1.0 by construction (the verify IS exact
      // Jaccard). Run on the deterministic 1/3 sample — the ground-truth
      // generator is quadratic-prone BY DESIGN (the gauge's own scaladoc
      // contract), and a sample estimates the band miss rate just as well
      Dedup.lshRecallGauge(
        t(s, dir, "documents").where(col("doc_id") % 3 === 0),
        "doc_id", "text",
        threshold = 0.5, maxBucketSize = Some(docBucketCap(s, dir)))),
    "d62_edit_canonical" -> ((s, dir) =>
      // typo-variant dedup end-to-end: edit pairs -> connected
      // components -> keep the LONGEST copy per cluster (ties min id) —
      // canonicalByQuality's flow with the character-level detector
      Dedup.editCanonical(t(s, dir, "documents"), "doc_id", "text",
        quality = length(col("text")), k = 8)),
    "d68_url_curation" -> ((s, dir) => {
      // C4/RefinedWeb-style URL/domain curation upstream of every text
      // gate. The corpus carries no URL column, so the demo input plants
      // a messy doc_id/source-derived URL — the SAME expression in both
      // engines (the d31 convention) covering every normalization axis:
      // scheme/host case, default vs real ports, trailing slash, param
      // order, tracking params, fragments. Normalization + registrable
      // domain + per-domain rollup + blocklist gate are the operators
      // under test, implemented independently on each side.
      Web.domainRollup(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars")).withColumn("url", messyUrl),
        "url", col("n_chars"), blocklist = Seq("ex2.com", "ex5.com"))
    }),
    "d69_domain_cap" -> ((s, dir) =>
      // C4/RefinedWeb's anti-domination rule over the same messy URLs:
      // at most 40 docs per registrable domain, survivors chosen by the
      // deterministic salted-hash order (never rand()) — the oracle
      // re-ranks with DuckDB's own window over the same md5 key
      Web.domainCap(
        t(s, dir, "documents").select(col("doc_id"), col("source"))
          .withColumn("url", messyUrl),
        "doc_id", "url", maxPerDomain = 40, salt = "dc10")
        .select(col("doc_id"), col("domain"), col("domain_rank"),
          col("kept"))),
    "d70_url_dedup" -> ((s, dir) =>
      // the FIRST dedup pass of a crawl pipeline: refetches under
      // trivially-different URLs collapse by canonical form BEFORE any
      // content hashing. The planted URLs collide on purpose: dropping
      // the %50 path discriminator makes ~10 docs share each canonical
      // URL; keep the longest copy (ties min id)
      Web.urlDedup(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
            col("n_chars"))
          .withColumn("url", concat(
            when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("http")),
            lit("://www."), col("source"), lit(".ex"),
            (col("doc_id") % 7).cast("string"), lit(".COM/item"),
            when(col("doc_id") % 2 === 0, lit("?b=2&a=1&utm_source=x"))
              .otherwise(lit("?a=1&b=2")))),
        "doc_id", "url", quality = col("n_chars"))
        .select(col("doc_id"), col("canonical_url"), col("keep"))),
    "m41_stream_url" -> ((s, dir) => {
      // the streaming ingest twin of d68's normalization: messy URLs
      // normalize + domain-attribute INSIDE an AvailableNow file-source
      // stream (pure map-side — no state store), proving the Web chain
      // is stream-safe; the oracle is the batch normalization verbatim
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = tmpQueryDir("m41-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val out = tmpQueryDir("m41-sink").toString
      val ckpt = tmpQueryDir("m41-ckpt").toString
      val transform = (df: DataFrame) => {
        val norm = Web.normalizeUrl(messyUrl)
        df.select(col("doc_id"), col("source"))
          .select(col("doc_id"), norm.as("url"),
            Web.registrableDomain(norm).as("domain"))
      }
      Incremental.runAvailableNow(s, src.toString, schema, "parquet",
        transform, out, ckpt).awaitTermination()
      s.read.parquet(out)
    }),
    "m42_takedown_audit" -> ((s, dir) => {
      // the compliance capstone: build v1, propagate the takedown into
      // v2, then AUDIT every (version, sub-table) cell for surviving
      // revoked rows. The oracle computes the expected picture from
      // first principles: v1/postings holds exactly the revoked docs'
      // distinct-term posting rows, v1/stats carries nothing
      // id-attributable, and the v2 cells read 0 — the snapshot
      // contract as an oracle-gated table
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m42-audit").toString + "/store"
      TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 32)
      val revoked = docs.where(col("doc_id") % 17 === 3)
        .select(col("doc_id"))
      graft.llm.Takedown.propagateBm25Snapshot(s, store, revoked, "doc_id")
      graft.llm.Takedown.auditRevocations(s, store, revoked, "doc_id")
    }),
    "m43_bm25_append" -> ((s, dir) => {
      // growth twin of m25 (and inverse of d65): v1 indexes the even
      // half, the odd half arrives as a BATCH and merges in closed form
      // — df takes batch-local per-term increments, N/Σdl add, old
      // postings never re-tokenize — and the probe pins the newest. Any
      // merge error (a double-counted df, a missed unseen term, a stale
      // Σdl) shifts scores and fails the full-corpus oracle hash
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      val store = tmpQueryDir("m43-append").toString + "/store"
      TextAnalysis.writeBm25Snapshot(docs.where(col("doc_id") % 2 === 0),
        store, termBuckets = 32)
      graft.llm.Ingest.appendBm25Snapshot(s, store,
        docs.where(col("doc_id") % 2 =!= 0))
      TextAnalysis.bm25TopKIndexedLatest(s, store, queries,
        "query_id", "qtext", k = 5)
    }),
    "m44_ivf_append" -> ((s, dir) => {
      // growth twin of m26: v1 lays out the even half, the odd half
      // appends with cells assigned map-side against the SAME frozen
      // centroid literals — appended rows land exactly where a
      // from-scratch build would put them, old rows copy through with
      // their persisted cell. The m20 probe over the pinned-newest
      // must equal the full-corpus formulation
      val emb = t(s, dir, "embeddings")
      val cents = ivfCentroids(s, dir, 16)
      val store = tmpQueryDir("m44-ivf").toString + "/store"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store)(tmp =>
        Similarity.writeIvfLayout(emb.where(col("vec_id") % 2 === 0),
          cents, tmp))
      graft.llm.Ingest.appendIvfSnapshot(s, store,
        emb.where(col("vec_id") % 2 =!= 0), cents)
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val cells = cents.zipWithIndex.map { case (c, i) =>
        var acc = 0.0
        var j = 0
        while (j < qVec.length) {
          val d = qVec(j) - c(j); acc += d * d; j += 1
        }
        (acc, i)
      }.sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSeq
      val probed = Similarity.readIvfCellsSnapshot(s, store, cells)
      Similarity.bruteForceTopK(probed, emb.where(col("vec_id") === 0), k = 5)
    }),
    "d72_corpus_diff" -> ((s, dir) => {
      // the change report that drives the incremental passes: previous
      // vs current corpus version, one row per status with doc count
      // and signed token-mass delta. Both sides project to (id, md5
      // fingerprint, token count) BEFORE the one id-keyed full-outer
      // join — text never enters the shuffle. The synthetic versions
      // make all four statuses non-empty: %5 ids are new, %7 ids were
      // dropped, %11 ids rewrote (an ' rev2' suffix — a CONTENT change
      // under the exact-dedup key), the rest carried over verbatim
      val docs = t(s, dir, "documents")
      val prev = docs.where(col("doc_id") % 5 =!= 0)
      val cur = docs.where(col("doc_id") % 7 =!= 3)
        .withColumn("text",
          when(col("doc_id") % 11 === 2, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      graft.llm.Ingest.corpusDiff(prev, cur)
    }),
    "q29_large_orders" -> ((s, dir) => {
      // TPC-H Q18's plan shape: a grouped-HAVING key set joined BACK to
      // the detail side — big orders (total quantity > 180) recover
      // their order/customer rows. The exact decimal sum makes the
      // HAVING cut engine-exact; the key set joins orders first (the
      // selective side), customer broadcast-joins last
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(27,2)")).as("__q"))
        .where(col("__q") > 180)
        .select(col("l_orderkey").as("o_orderkey"),
          col("__q").cast("double").as("qty"))
      o.join(big, Seq("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("qty"))
    }),
    "q30_order_histogram" -> ((s, dir) => {
      // TPC-H Q13's plan shape — the classic LEFT-OUTER aggregate: how
      // many customers placed 0, 1, 2… qualifying orders. The NOT-LIKE
      // predicate belongs to the JOIN side (an outer join's ON-clause
      // right-side filter == pre-filtering the right input), so it
      // lands below the join and customers with only filtered-out
      // orders still surface with count 0 via the null extension.
      // count(o_orderkey) skips the null-extended rows exactly. Scale
      // shape: the custkey shuffle of the outer join already
      // co-partitions the per-customer count (no second exchange);
      // the histogram re-aggregation exchanges only (c_count, partial
      // count) rows
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val o = t(s, dir, "orders")
        .where(!col("o_orderpriority").like("%URGENT%"))
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),
    "q31_late_ship_priority" -> ((s, dir) => {
      // TPC-H Q4's plan shape: EXISTS with a CROSS-TABLE correlated
      // predicate (the lineitem must ship >60 days after ITS order's
      // date — not a constant bound, so the semi-join carries a
      // non-equi conjunct alongside the key). Decorrelation = one
      // left-semi join; the date window prunes orders at the scan and
      // the priority histogram partially aggregates after the join's
      // orderkey shuffle. The oracle states the EXISTS form itself.
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),
    "q32_priority_class_mix" -> ((s, dir) => {
      // TPC-H Q12's plan shape: a two-way CASE split counted per group
      // over a join — both predicates pushed to their own scans (the
      // shipdate window and returnflag filter never cross the join),
      // the orders side projected to (key, priority) before the
      // shuffle, both conditional sums partially aggregated map-side.
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem")
        .where(col("l_returnflag") =!= "N" &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    }),
    "q33_returned_revenue_topk" -> ((s, dir) => {
      // TPC-H Q10's plan shape: the top-k revenue ranking over a
      // fact-fact-dim join — returned lineitems join their orders and
      // customers, the nation dim broadcasts, revenue is the exact
      // decimal sum, and the global top-20 plans as
      // TakeOrderedAndProject (per-partition heap, never a full sort).
      // Ties at the cut break deterministically on c_custkey.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
    "q37_market_share" -> ((s, dir) => {
      // TPC-H Q8's plan shape: a two-level conditional-aggregation RATIO
      // over the widest join tree in the classic set — lineitem joins
      // part, supplier, orders, customer, both nation roles and region.
      // Only orders is a second fact: its join shuffles on l_orderkey;
      // every dimension (part filtered to one type, supplier, customer's
      // nation→region chain, the supplier-nation lookup) broadcasts, so
      // the tree runs as ONE shuffle plus broadcast hash joins — no
      // cartesian anywhere. The share is the q28 convention: numerator
      // and denominator are exact decimal sums off the same scan, the
      // ratio is ONE double division on identical exact inputs.
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").where(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val r = t(s, dir, "region").where(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(27,4)")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n2), sup("s_nationkey") === col("s_nkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), c("c_nationkey") === col("c_nkey"))
        .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_7", vol)
            .otherwise(lit(0).cast("decimal(27,4)"))).cast("double")
            .as("nation_vol"),
          sum(vol).cast("double").as("total_vol"))
        .select(col("o_year"),
          (col("nation_vol") / col("total_vol")).as("mkt_share"),
          col("total_vol"))
        .orderBy(col("o_year"))
    }),
    "q38_nation_profit" -> ((s, dir) => {
      // TPC-H Q9's plan shape: profit by supplier nation and year over
      // lineitem × part × supplier × orders (the testdata schema carries
      // no partsupp, so p_retailprice * l_quantity stands in for
      // ps_supplycost * l_quantity — same expression shape, same join
      // tree minus one dim). part filters on a name LIKE before the
      // join, so the broadcast ships only matching keys; orders joins
      // only for the year. The per-row profit is one double expression
      // (identical IEEE ops both engines) cast to exact decimal at the
      // aggregation boundary.
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").where(col("p_name").like("%rod%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("supp_nation"), col("o_year"))
        .agg(decimalSum(profit, 4).as("profit"))
        .orderBy(col("supp_nation"), col("o_year").desc)
    }),
    "q39_cheapest_supplier" -> ((s, dir) => {
      // TPC-H Q2's plan shape: a correlated scalar-subquery MINIMUM —
      // for each small part, the ASIA supplier(s) offering it at the
      // minimum unit price (ties kept, like Q2). Hand-decorrelated as
      // an equality-to-aggregate retention: ONE shuffle on p_partkey
      // carries both the per-part window MIN and the filter (no
      // second scan, no self-join); the dims (filtered part, supplier,
      // nation→region chain) all broadcast into the lineitem scan.
      // unit_price is one double division on identical inputs both
      // engines; equality-to-min compares bit-identical doubles. The
      // oracle states the CORRELATED subquery form — two engines, two
      // decorrelation paths (the q21–q27 discipline).
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val p = t(s, dir, "part").where(col("p_size") <= 3)
        .select(col("p_partkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val r = t(s, dir, "region").where(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val offers = li
        .join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("unit_price"))
      val w = Window.partitionBy(col("p_partkey"))
      offers.withColumn("__min", min(col("unit_price")).over(w))
        .where(col("unit_price") === col("__min"))
        .select(col("p_partkey"), col("s_suppkey"), col("unit_price"))
        .distinct()
        .orderBy(col("p_partkey"), col("s_suppkey"))
    }),
    "q40_shipping_volume" -> ((s, dir) => {
      // TPC-H Q7's plan shape: bilateral shipping volume between two
      // nations by year — the cross-side OR over TWO dimension roles
      // ((supp=2 AND cust=7) OR (supp=7 AND cust=2)). Catalyst derives
      // each side's implied IN-list and pushes it into that nation
      // scan (the q34 extraction over join roles instead of columns);
      // the exact pair predicate rides above the broadcast joins.
      // Exact decimal volume; shipdate window pushed to the lineitem
      // scan.
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"),
          col("n_name").as("supp_nation"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"),
          col("n_name").as("cust_nation"))
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === col("s_nkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nkey"))
        .where((col("supp_nation") === "NATION_18" &&
            col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" &&
            col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(decimalSum(vol, 4).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),
    "q43_shipping_priority" -> ((s, dir) => {
      // TPC-H Q3's plan shape verbatim: unshipped-order revenue top-10
      // — the date CROSSOVER predicate (ordered BEFORE the cutoff,
      // shipped AFTER it) pushed to each side's own scan, the segment
      // filter riding the broadcast customer dim, revenue as the exact
      // decimal sum per order, and the global top-10 as
      // TakeOrderedAndProject with a deterministic orderkey tiebreak.
      val cut = lit("1998-06-01").cast("timestamp")
      val c = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, dir, "orders").where(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = t(s, dir, "lineitem").where(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q41_large_volume_orders" -> ((s, dir) => {
      // TPC-H Q18's plan shape: the IN-subquery-with-HAVING — orders
      // whose TOTAL line quantity clears a threshold, listed with
      // customer and re-aggregated. The subquery decorrelates to ONE
      // lineitem aggregate whose HAVING filter feeds a LEFT SEMI join
      // back into the fact (the aggregate's orderkey partitioning is
      // reused — no extra exchange for the semi-join side); customer
      // broadcasts; the global top-100 plans as TakeOrderedAndProject.
      // Quantity sums are exact decimal; ties break on o_orderkey.
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(27,2)")).as("__q"))
        .where(col("__q") > 250).select(col("l_orderkey"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      li.join(big, Seq("l_orderkey"), "left_semi")
        .join(o, col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_totalprice"))
        .agg(decimalSum(col("l_quantity"), 2).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),
    "q42_supplier_part_counts" -> ((s, dir) => {
      // TPC-H Q16's plan shape: NOT IN + COUNT(DISTINCT) — distinct
      // suppliers per surviving (brand, type, size) cell, excluding a
      // complained-about supplier list (the testdata schema carries no
      // partsupp/s_comment, so lineitem's (l_partkey, l_suppkey) is
      // the part-supplier relation and a low-balance filter stands in
      // for the complaints LIKE). NOT IN over a non-null key plans as
      // a LEFT ANTI join (broadcast — the excluded list is tiny); the
      // brand/type/size filters all reach the part scan; the distinct
      // count runs as the standard two-level partial aggregate.
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      val p = t(s, dir, "part")
        .where(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      val bad = t(s, dir, "supplier").where(col("s_acctbal") < 1000)
        .select(col("s_suppkey"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(bad), li("l_suppkey") === bad("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),
    "q28_promo_share" -> ((s, dir) => {
      // TPC-H Q14's plan shape: a conditional-aggregation RATIO — the
      // promo share of monthly revenue. Numerator and denominator are
      // exact decimal sums off ONE broadcast-joined scan (part is the
      // small dim; the CASE rides the same projection), and the percent
      // is ONE double division on identical exact inputs (the
      // decimalAvg contract), so the ratio is engine-exact
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(27,4)")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(
          (sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(27,4)"))) * 100)
            .cast("double").as("promo100"),
          sum(rev).cast("double").as("revenue"))
        .select(col("month"),
          (col("promo100") / col("revenue")).as("promo_share"),
          col("revenue"))
    }),
    "q27_qualified_suppliers" -> ((s, dir) => {
      // TPC-H Q20's plan shape — the last classic decorrelation pattern:
      // a semi-join chain whose inner member passes a CORRELATED
      // scalar-aggregate threshold (supplier qualifies if, for some red
      // part, its share of that part's total shipped quantity exceeds
      // 20%). Hand-decorrelated: per-(part,supp) and per-part exact
      // DECIMAL sums off ONE broadcast-semi-filtered scan,
      // cross-multiplied compare (5*share > total — no fraction ever
      // leaves decimal), distinct winners semi-join the dimension
      val li = t(s, dir, "lineitem")
      val red = t(s, dir, "part").where(col("p_name").like("%red%"))
        .select(col("p_partkey"))
      val flt = li
        .join(broadcast(red), li("l_partkey") === red("p_partkey"),
          "left_semi")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("decimal(27,2)").as("q"))
      val perPS = flt.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("q")).as("ps_qty"))
      val perP = flt.groupBy(col("l_partkey"))
        .agg(sum(col("q")).as("p_qty"))
      val winners = perPS.join(perP, Seq("l_partkey"))
        .where(col("ps_qty") * 5 > col("p_qty"))
        .select(col("l_suppkey")).distinct()
      val sup = t(s, dir, "supplier")
      sup.join(winners, sup("s_suppkey") === winners("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),
    "d74_setsim_join" -> ((s, dir) =>
      // EXACT Jaccard>=0.7 pair join — the lossless complement of the
      // LSH tier: prefix filtering (rarest-first token rank) bounds the
      // pair-generating join to each doc's first n-ceil(t*n)+1 tokens,
      // then exact intersection counts verify; the threshold compare is
      // integer-only. The oracle is the scheme-independent quadratic
      // formulation (all shared-token pairs, counted), so recall=1.0
      // is hash-checked, not claimed
      graft.llm.Dedup.setSimilarityJoin(t(s, dir, "documents"),
        "doc_id", "text", thresholdNum = 7, thresholdDen = 10)),
    "d75_setsim_cost" -> ((s, dir) =>
      // the pre-flight gauge for d74 at 100 TB: the pair-generating
      // join's output is bounded by sum C(prefixdf, 2) over prefix
      // token frequencies, and that bound is priced by the prefix
      // derivation ALONE (tokenize + df join + per-doc window — no
      // pair generated). Measure BEFORE joining: a bound in the
      // billions (the 544k adversarial ScaleBench corpus) means
      // exactDedup/cluster first or take the LSH tier. The oracle
      // re-derives the same integers from the prefix definition
      graft.llm.Dedup.setSimilarityJoinCost(t(s, dir, "documents"),
        "doc_id", "text", thresholdNum = 7, thresholdDen = 10)),
    "d77_norm_dedup" -> ((s, dir) =>
      // normalization-aware exact tier: accent-fold + case/punctuation/
      // whitespace-insensitive fingerprint, min id per group keeps —
      // catches the re-encodes the raw-text hash (d01) misses, still
      // ONE shuffle on a 3-column projection (no pair generation)
      graft.llm.Dedup.normalizedDedup(t(s, dir, "documents"),
        "doc_id", "text")),
    "d78_lang_overlap" -> ((s, dir) =>
      // pairwise vocabulary overlap between language strata: shared
      // distinct-token counts + Jaccard per unordered pair — the
      // cross-subset redundancy gauge a mixture designer reads before
      // setting sampling weights; integer counts, ONE terminal division
      graft.llm.TextAnalysis.strataOverlapMatrix(
        t(s, dir, "documents"), "lang")),
    "d84_triangles" -> ((s, dir) => {
      // exact triangle counts + local clustering coefficient over the
      // co-purchase graph (parts sharing an order form real cliques —
      // the density signal the link-analysis trio doesn't measure:
      // spam cliques cluster high, organic bridges low). Edges orient
      // low→high under (degree, id), so every triangle is found ONCE
      // at its lowest-order corner and no stage is quadratic in a hot
      // node's raw degree; counts are exact integers, LCC one final
      // division — cross-engine bit-exact
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("id1"), col("b.l_partkey").as("id2"))
      graft.operators.Triangles.triangleCounts(e)
    }),
    "d85_assortativity" -> ((s, dir) => {
      // degree assortativity (Newman's r) of the same co-purchase
      // graph — d84's global companion: spam link farms are strongly
      // assortative, organic graphs mildly disassortative, so ONE
      // number flags a manipulated slice. Exact decimal sums, one
      // double division at the end — cross-engine bit-exact
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("id1"), col("b.l_partkey").as("id2"))
      graft.operators.Triangles.degreeAssortativity(e)
    }),
    "d86_kcore" -> ((s, dir) => {
      // k-core of the co-purchase graph: iterative peeling to the
      // FIXPOINT (fails loudly if unconverged — never a half-peeled
      // set). Peeling is idempotent once stable, so the oracle's
      // 8-round unroll computes the identical core provided the engine
      // converged within 8 — which the require pins, making the gate
      // sound rather than lucky
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("id1"), col("b.l_partkey").as("id2"))
      val out = graft.operators.KCore.kCoreWithRounds(e, k = 6)
      require(out.rounds <= 8,
        "the d86 oracle unrolls 8 peeling rounds; the corpus needed " +
          s"${out.rounds} — raise both")
      out.nodes
    }),
    "d87_neighbor_setsim" -> ((s, dir) => {
      // STRUCTURAL-ROLE near-dups: nodes whose NEIGHBORHOODS overlap —
      // two suppliers serving near-identical customer sets (exact
      // Jaccard >= 11/50 on the bipartite adjacency), the collusion/
      // Sybil signature no per-document detector sees. Pure
      // composition: adjacency sets serialize as token docs into the
      // d74 EXACT set-similarity join — prefix filtering is the hub
      // mitigation for free (a hub neighbor is a high-df token, ranked
      // last and excluded from prefixes), verification rides the same
      // zero-allocation sorted-merge kernel
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"))
      val adj = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("l_suppkey").as("id"), col("o_custkey").as("nb"))
        .distinct()
        .groupBy(col("id"))
        .agg(concat_ws(" ",
          sort_array(collect_set(col("nb").cast("string")))).as("nbrs"))
      graft.llm.Dedup.setSimilarityJoin(adj, "id", "nbrs",
        thresholdNum = 11, thresholdDen = 50)
    }),
    "d88_bpe_merges" -> ((s, dir) => {
      // deterministic BPE vocabulary induction over the document
      // corpus (extends d41's one-round pair stats to the full trainer
      // a real pipeline runs): 8 merge rounds, each the exact-integer
      // argmax of freq-weighted adjacent-pair counts (ties to the
      // lexicographically smallest pair) followed by one corpus-wide
      // greedy left-to-right merge. A pure function of the corpus —
      // the oracle unrolls the IDENTICAL 8 rounds in SQL (list_reduce
      // mirrors the engine's aggregate fold element-for-element), so
      // the merge tables must agree row-for-row including counts
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val merges = graft.llm.Bpe.trainMerges(
        graft.llm.Bpe.wordCorpus(docs.select(col("text")), "text"),
        numMerges = 8)
      s.createDataFrame(merges)
    }),
    "d89_exact_spans" -> ((s, dir) => {
      // exact cross-document substring-span dedup (the Lee-et-al
      // exact-substring discipline): every maximal run of >= 8
      // consecutive tokens appearing verbatim in >= 2 distinct docs,
      // emitted as per-doc cut lists. One gram aggregate + one
      // semi-join + one per-doc window — never pairwise in the number
      // of sharing documents
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.llm.Dedup.exactSpanCutLists(docs, "doc_id", "text", k = 8)
        .withColumnRenamed("id", "doc_id")
    }),
    "d92_exact_spans_fp" -> ((s, dir) => {
      // the 100 TB tier of d89: grams keyed by a 128-bit fingerprint
      // (two salted xxhash64 passes over the token slice) instead of
      // the gram string — same plan shape, ~10x smaller shuffle
      // payload. Gated against d89's OWN string-tier oracle: the cut
      // lists must be identical row-for-row, proving the fingerprint
      // key changes the payload and nothing else
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.llm.Dedup.exactSpanCutLists(docs, "doc_id", "text", k = 8,
          fingerprintGrams = true)
        .withColumnRenamed("id", "doc_id")
    }),
    "d90_span_removal" -> ((s, dir) => {
      // the REMOVAL half of the Lee-et-al exact-substring loop: d89's
      // cut lists applied back to the corpus — every token inside a
      // duplicated span drops, survivors re-join single-spaced, un-cut
      // docs pass through re-tokenized. One equi-join + a positional
      // array filter; the corpus token stream never explodes
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val cuts = graft.llm.Dedup.exactSpanCutLists(docs, "doc_id",
        "text", k = 8)
      graft.llm.Dedup.removeSpans(docs, "doc_id", "text", cuts)
    }),
    "d93_decontam_spans" -> ((s, dir) => {
      // exact-span DECONTAMINATION (composes d89's machinery with the
      // d23/d32/d35 family): every maximal run of >= 8 corpus tokens
      // appearing verbatim in a held-out benchmark set (docs with
      // doc_id % 10 == 0), emitted as per-corpus-doc cut lists —
      // cross-set only, corpus-internal duplication does not mark.
      // The benchmark gram set is small → the semi-join broadcasts
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.llm.Dedup.contaminationSpanCutLists(
          docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text",
          docs.where(col("doc_id") % 10 === 0), "text", k = 8)
        .withColumnRenamed("id", "doc_id")
    }),
    "d95_decontam_spans_fp" -> ((s, dir) => {
      // the 100 TB tier of d93 (the d92 pattern): contamination grams
      // keyed by the 128-bit fingerprint instead of the gram string —
      // same plan shape, smaller shuffle/broadcast payload. Gated
      // against d93's OWN string-tier oracle: byte-identical cut lists
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.llm.Dedup.contaminationSpanCutLists(
          docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text",
          docs.where(col("doc_id") % 10 === 0), "text", k = 8,
          fingerprintGrams = true)
        .withColumnRenamed("id", "doc_id")
    }),
    "d94_decontam_removal" -> ((s, dir) => {
      // d93's cut lists applied back to the corpus side — the
      // decontamination loop closed end-to-end: contaminated extents
      // drop, the CLEAN REMAINDER of a touched document survives
      // (doc-granular decontamination would discard it whole)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("text"))
      val cuts = graft.llm.Dedup.contaminationSpanCutLists(corpus,
        "doc_id", "text", docs.where(col("doc_id") % 10 === 0), "text",
        k = 8)
      graft.llm.Dedup.removeSpans(corpus, "doc_id", "text", cuts)
    }),
    "d91_bpe_token_stats" -> ((s, dir) => {
      // token counting with the LEARNED vocab (composes d88): train 8
      // merges, tokenize the word corpus with its own table, count
      // token occurrences freq-weighted — the top-30 slice both
      // engines derive from the identical trained state
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val words = graft.llm.Bpe.wordCorpus(docs.select(col("text")),
        "text")
      val merges = graft.llm.Bpe.trainMerges(words, numMerges = 8)
      words.select(explode(graft.llm.Bpe.applyMerges("word", merges))
          .as("token"), col("freq"))
        .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc).limit(30)
    }),
    "m73_bpe_frozen_vocab" -> ((s, dir) => {
      // the trained tokenizer as a SHIPPED ARTIFACT (the frozen-
      // codebook discipline applied to the vocab): train once, freeze
      // the merge table as a LayoutStore snapshot, tokenize from the
      // RELOADED table; a retrain on a drifted corpus lands as a NEW
      // version while the pinned version keeps serving the original
      // table — in-flight tokenization never shifts under a retrain.
      // The oracle is d91's from-scratch derivation: the round-trip
      // must serve the IDENTICAL trained state
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val words = graft.llm.Bpe.wordCorpus(docs.select(col("text")),
        "text")
      val merges = graft.llm.Bpe.trainMerges(words, numMerges = 8)
      val store = tmpQueryDir("m73-vocab").toString + "/vocab"
      graft.llm.Bpe.writeVocabSnapshot(s, store, merges)
      // drifted retrain lands v2; the pinned v1 read must still serve
      // the ORIGINAL table
      val drifted = graft.llm.Bpe.trainMerges(
        words.unionByName(words.limit(5)
          .withColumn("word", concat(col("word"), lit("zq")))),
        numMerges = 8)
      graft.llm.Bpe.writeVocabSnapshot(s, store, drifted)
      val conf = s.sparkContext.hadoopConfiguration
      require(graft.llm.LayoutStore.versions(conf, store) == Seq(1L, 2L),
        "each freeze must land its own snapshot version")
      val pinned = graft.llm.Bpe.readVocabSnapshot(s, store,
        version = Some(1L))
      require(pinned == merges,
        s"the pinned vocab must round-trip bit-identically: $pinned")
      require(graft.llm.Bpe.readVocabSnapshot(s, store) == drifted,
        "the newest version must serve the retrained table")
      // tokenize with the RELOADED pinned table — d91's formulation
      words.select(explode(graft.llm.Bpe.applyMerges("word", pinned))
          .as("token"), col("freq"))
        .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc).limit(30)
    }),
    "d79_pagerank" -> ((s, dir) => {
      // fixed-point PageRank (3 power iterations, d=17/20, scale 1e12)
      // over the supplier→customer fulfillment graph — the canonical
      // Pregel-style iterative workload, in INTEGER arithmetic so the
      // result is a pure function of the graph (float PageRank is
      // shuffle-order-dependent and can't be gated cross-engine);
      // every customer is dangling, exercising the mass redistribution
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"))
      val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("l_suppkey").as("src"),
          (col("o_custkey") + 1000000L).as("dst"))
        .distinct()
      graft.operators.PageRank.pageRankFixedPoint(edges, iters = 3)
    }),
    "d83_hits" -> ((s, dir) => {
      // HITS hubs/authorities over the fulfillment graph (bipartite:
      // suppliers are pure hubs, customers pure authorities — each
      // side's opposite score decays to 0, exercised by the oracle's
      // COALESCE): fixed-point integer scores with per-round
      // div-normalization, so ranking is exact and cross-engine
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"))
      val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("l_suppkey").as("src"),
          (col("o_custkey") + 1000000L).as("dst"))
        .distinct()
      graft.operators.PageRank.hitsFixedPoint(edges, iters = 2)
    }),
    "d82_label_propagation" -> ((s, dir) => {
      // semi-supervised label propagation: trusted lang labels
      // (doc_id % 4 = 0 — most of them outside the pair graph, nodes
      // by fiat) spread 2 hops across the verified near-dup graph;
      // seeds clamp, majority-of-labeled-neighbors with exact counts
      // and ties to the smallest label, no-labeled-neighbor keeps the
      // current (possibly null) label — deterministic, so the oracle
      // can unroll both rounds
      val pairs = ndPairsFixture(s, dir)
      val seeds = t(s, dir, "documents").where(col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("lang"))
      graft.operators.LabelPropagation.propagateLabels(pairs,
        seeds, iters = 2, seedIdCol = "doc_id", seedLabelCol = "lang")
    }),
    "d81_personalized_pagerank" -> ((s, dir) => {
      // seed-teleport (personalized) PageRank over d79's fulfillment
      // graph: teleport AND dangling mass return to the trusted
      // supplier slice (s_suppkey % 10 = 0) instead of uniformly —
      // authority RELATIVE to the seeds, the TrustRank-shaped curation
      // signal (a cluster that only cites itself gets no mass however
      // densely it interlinks). Seeds come from the supplier TABLE, so
      // suppliers with no shipped lineitem are nodes by fiat and hold
      // their teleport mass; same bit-exact integer contract as d79
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"))
      val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("l_suppkey").as("src"),
          (col("o_custkey") + 1000000L).as("dst"))
        .distinct()
      val seeds = t(s, dir, "supplier")
        .where(col("s_suppkey") % 10 === 0).select(col("s_suppkey"))
      graft.operators.PageRank.personalizedPageRankFixedPoint(edges,
        seeds, iters = 3)
    }),
    "d73_gap_fill" -> ((s, dir) => {
      // time-series regularization: irregular per-user events resample
      // onto an hourly grid, holes carried forward (LOCF). The operator
      // never windows over raw events — per-bucket last via one
      // partial-aggregating max(struct), grid via sequence-explode,
      // LOCF over grid rows only
      val ev = t(s, dir, "events").where(col("user_id") < 40)
      graft.operators.GapFill.gapFillLocf(ev, "user_id", tsMicros(ev),
        "value", bucketMicros = 3600000000L)
    }),
    "m54_partial_compaction" -> ((s, dir) => {
      // the ∝-fragmentation maintenance pass over a manifest-versioned
      // layout: v1 lands with ONE hot day fragmented into 8 files (the
      // shape frequent appends leave behind), v2 appends a batch into
      // a different day (manifest version — only that day written),
      // then compactSnapshotPartial rewrites ONLY the entries over the
      // file threshold (the fragmented hot day) and carries the cold
      // dirs by reference. The oracle states the logical content
      // directly — three versions of physical layout churn must be
      // row-invisible.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val rows = docs.select(col("doc_id").as("id"),
        (col("doc_id") % 16).cast("int").as("day"),
        col("n_chars"))
      val store = tmpQueryDir("m54-store").toString + "/layout"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store) { tmp =>
        rows.where(col("day") =!= 3).repartition(col("day"))
          .write.partitionBy("day").parquet(tmp)
        rows.where(col("day") === 3).repartition(8)
          .write.mode("append").partitionBy("day").parquet(tmp)
      }
      val batch = docs.where(col("doc_id") % 16 === 5)
        .select((col("doc_id") + 1000000L).as("id"),
          lit(5).cast("int").as("day"), col("n_chars"))
      graft.llm.Ingest.appendRowsSnapshot(s, store, batch, "day", "id")
      graft.llm.LayoutStore.compactSnapshotPartial(s, store,
        maxFilesPerEntry = 4)
      require(graft.llm.LayoutStore.fragmentedEntries(conf, store, 3L,
        4).isEmpty, "the hot day must be defragmented")
      graft.llm.LayoutStore.readSnapshotTable(s, store)
        .select(col("id"), col("day").cast("int").as("day"),
          col("n_chars"))
    }),
    "m55_cdc_apply" -> ((s, dir) => {
      // latest-wins changelog apply — the reference's Hudi UPSERT op
      // mode (HoodieSink.java:309,434,543) as an engine transform: an
      // update bumps the price on keys %5, a LATER delete wins over the
      // update on keys %35 (both events, delete has the higher seq),
      // inserts land new keys; untouched keys copy through
      val base = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val log = base.where(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
          .withColumn("op", lit("U")).withColumn("seq", lit(1L))
        .unionByName(base.where(col("o_orderkey") % 7 === 0)
          .withColumn("op", lit("D")).withColumn("seq", lit(2L)))
        .unionByName(base.where(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
          .withColumn("op", lit("U")).withColumn("seq", lit(1L)))
      graft.operators.Upsert.applyChangelog(base, log, Seq("o_orderkey"))
    }),
    "m56_scd2_merge" -> ((s, dir) => {
      // SCD type-2 dimension maintenance: changed keys (%6, acctbal
      // bump) close at the effective date and re-insert open-ended;
      // no-op re-statements (%9 minus %6, identical values) must NOT
      // version; brand-new keys (%10, shifted id space) insert fresh
      val sup = t(s, dir, "supplier")
      val dim = sup.select(col("s_suppkey"), col("s_acctbal"),
        col("s_nationkey"), lit(0L).as("valid_from"),
        lit(99999999L).as("valid_to"), lit(true).as("is_current"))
      val updates = sup.where(col("s_suppkey") % 6 === 0)
          .select(col("s_suppkey"),
            (col("s_acctbal") + lit(100.0)).as("s_acctbal"),
            col("s_nationkey"))
        .unionByName(sup.where(col("s_suppkey") % 9 === 0 &&
            col("s_suppkey") % 6 =!= 0)
          .select(col("s_suppkey"), col("s_acctbal"), col("s_nationkey")))
        .unionByName(sup.where(col("s_suppkey") % 10 === 0)
          .select((col("s_suppkey") + lit(100000L)).as("s_suppkey"),
            col("s_acctbal"), col("s_nationkey")))
      graft.operators.Upsert.scd2Merge(dim, updates, Seq("s_suppkey"),
        Seq("s_acctbal", "s_nationkey"), effectiveDate = 20260101L)
    }),
    "m58_stream_agg_maintenance" -> ((s, dir) => {
      // m57's streaming twin: three source files -> three micro-batches
      // (maxFilesPerTrigger=1); each batch folds into the SERVED state
      // via the full-outer merge and lands as a LayoutStore version
      // (atomic swap — no torn self-overwrite); the fact stream is
      // never rescanned. The oracle aggregates all events from scratch
      val ev = s.read.parquet(s"$dir/events.parquet")
      val src = tmpQueryDir("m58-src")
      for (b <- 0 until 3)
        ev.where(pmod(col("event_id"), lit(3)) === b)
          .coalesce(1).write.mode("append").parquet(src.toString)
      val state = tmpQueryDir("m58-state").toString + "/state"
      val ckpt = tmpQueryDir("m58-ckpt").toString
      Incremental.aggMaintenanceAvailableNow(s, src.toString, ev.schema,
          "parquet",
          df => df.select(col("event_type"),
            col("value").cast("decimal(27,2)").as("v"),
            col("value").as("vd")),
          keyCols = Seq("event_type"), sumCols = Seq("v"),
          minCols = Seq("vd"), maxCols = Seq("vd"),
          statePath = state, checkpointDir = ckpt,
          maxFilesPerTrigger = Some(1),
          // a 5-key state sizes its bucket space down (the r14 watch:
          // 16 buckets of partitioned-write overhead for 5 keys) —
          // bucket count tracks state volume, the operator's contract
          stateBuckets = 4)
        .awaitTermination()
      val conf = s.sparkContext.hadoopConfiguration
      require(graft.llm.LayoutStore.versions(conf, state).size >= 3,
        "the maintenance fold must have run once per micro-batch")
      graft.llm.LayoutStore.readSnapshotTable(s, state)
        .select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_value"),
          col("min_vd").as("min_value"), col("max_vd").as("max_value"))
    }),
    "m66_stream_cdc_agg" -> ((s, dir) => {
      // the CDC twin of m58: three micro-batches carry INSERTS AND
      // DELETES (full before-images — the m55/m60 changelog contract);
      // each fold decrements counts/sums in exact closed form, rebuilds
      // delete-touched keys' min/max from the SERVED fact store the
      // same batch just landed, and rewrites only the touched buckets
      // of both stores. The oracle aggregates the post-apply facts
      // from scratch: arriving through the changelog must equal never
      // having inserted the deleted rows at all
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"),
          col("value").cast("decimal(27,2)").as("v"),
          col("value").as("vd"))
      val m3 = pmod(col("event_id"), lit(3))
      val del1 = m3 === 0 && pmod(col("event_id"), lit(7)) === 3
      val del2 = m3 =!= 2 && pmod(col("event_id"), lit(5)) === 2 && !del1
      val batches = Seq(
        ev.where(m3 === 0).withColumn("op", lit("I")),
        ev.where(m3 === 1).withColumn("op", lit("I"))
          .unionByName(ev.where(del1).withColumn("op", lit("D"))),
        ev.where(m3 === 2).withColumn("op", lit("I"))
          .unionByName(ev.where(del2).withColumn("op", lit("D"))))
      val src = tmpQueryDir("m66-src")
      // deletes must stream AFTER the inserts they retract: pin
      // strictly increasing mtimes so the file source's oldest-first
      // order IS the write order, independent of fs timestamp
      // granularity
      val seen = scala.collection.mutable.Set[String]()
      val base = 1600000000000L
      batches.zipWithIndex.foreach { case (bdf, i) =>
        bdf.coalesce(1).write.mode("append").parquet(src.toString)
        new java.io.File(src.toString).listFiles()
          .filter(f => f.getName.startsWith("part-") && seen.add(f.getName))
          .foreach(_.setLastModified(base + i * 60000L))
      }
      val state = tmpQueryDir("m66-state").toString + "/state"
      val facts = tmpQueryDir("m66-facts").toString + "/facts"
      val ckpt = tmpQueryDir("m66-ckpt").toString
      Incremental.cdcAggMaintenanceAvailableNow(s, src.toString,
          batches.head.schema, "parquet", df => df,
          pkCols = Seq("event_id"), keyCols = Seq("event_type"),
          sumCols = Seq("v"), minCols = Seq("vd"), maxCols = Seq("vd"),
          statePath = state, factsPath = facts, checkpointDir = ckpt,
          maxFilesPerTrigger = Some(1),
          stateBuckets = 4) // 5-key state — bucket space tracks volume
        .awaitTermination()
      val conf = s.sparkContext.hadoopConfiguration
      require(graft.llm.LayoutStore.versions(conf, state).size >= 3,
        "the CDC fold must have run once per micro-batch")
      graft.llm.LayoutStore.readSnapshotTable(s, state)
        .select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_value"),
          col("min_vd").as("min_value"), col("max_vd").as("max_value"))
    }),
    "m70_cdc_update_stream" -> ((s, dir) => {
      // NATIVE UPDATE events in the CDC contract (the m55 changelog
      // world emits updates; forcing upstream D+I decomposition doubles
      // the stream): op 'U' carries BOTH images in one row — after in
      // the measure columns, before of each sum column under
      // '_before'. Three micro-batches: inserts; then updates (+1000 on
      // a slice of batch 1's rows); then inserts + deletes (including
      // deleting previously-UPDATED rows, whose D states the
      // post-update image — the full-image contract) + more updates
      // (−500 on an untouched slice). Counts never move for U, sums
      // shift by after−before in closed form, and U-touched keys'
      // min/max repair from the served fact store exactly like deletes.
      // The oracle aggregates the post-apply facts from scratch.
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"),
          col("value").cast("decimal(27,2)").as("v"),
          col("value").as("vd"))
      val m3 = pmod(col("event_id"), lit(3))
      val upd1 = m3 === 0 && pmod(col("event_id"), lit(7)) === 3
      val del2 = m3 =!= 2 && pmod(col("event_id"), lit(5)) === 2
      val upd3 = m3 === 1 && pmod(col("event_id"), lit(7)) === 1 && !del2
      val noB = lit(null).cast("decimal(27,2)")
      def ins(f: org.apache.spark.sql.Column) = ev.where(f)
        .withColumn("v_before", noB).withColumn("op", lit("I"))
      val plus1000 = ev.where(upd1).select(col("event_id"),
        col("event_type"),
        (col("v") + lit(1000).cast("decimal(27,2)"))
          .cast("decimal(27,2)").as("v"),
        (col("vd") + lit(1000.0)).as("vd"),
        col("v").as("v_before"), lit("U").as("op"))
      val minus500 = ev.where(upd3).select(col("event_id"),
        col("event_type"),
        (col("v") - lit(500).cast("decimal(27,2)"))
          .cast("decimal(27,2)").as("v"),
        (col("vd") - lit(500.0)).as("vd"),
        col("v").as("v_before"), lit("U").as("op"))
      // deletes state the CURRENT (post-update) image
      val dels = ev.where(del2).select(col("event_id"), col("event_type"),
        when(upd1, (col("v") + lit(1000).cast("decimal(27,2)"))
          .cast("decimal(27,2)")).otherwise(col("v")).as("v"),
        when(upd1, col("vd") + lit(1000.0)).otherwise(col("vd")).as("vd"),
        noB.as("v_before"), lit("D").as("op"))
      val batches = Seq(
        ins(m3 === 0),
        ins(m3 === 1).unionByName(plus1000),
        ins(m3 === 2).unionByName(dels).unionByName(minus500))
      val src = tmpQueryDir("m70-src")
      val seen = scala.collection.mutable.Set[String]()
      val base = 1600000000000L
      batches.zipWithIndex.foreach { case (bdf, i) =>
        bdf.coalesce(1).write.mode("append").parquet(src.toString)
        new java.io.File(src.toString).listFiles()
          .filter(f => f.getName.startsWith("part-") && seen.add(f.getName))
          .foreach(_.setLastModified(base + i * 60000L))
      }
      val state = tmpQueryDir("m70-state").toString + "/state"
      val facts = tmpQueryDir("m70-facts").toString + "/facts"
      val ckpt = tmpQueryDir("m70-ckpt").toString
      Incremental.cdcAggMaintenanceAvailableNow(s, src.toString,
          batches.head.schema, "parquet", df => df,
          pkCols = Seq("event_id"), keyCols = Seq("event_type"),
          sumCols = Seq("v"), minCols = Seq("vd"), maxCols = Seq("vd"),
          statePath = state, factsPath = facts, checkpointDir = ckpt,
          maxFilesPerTrigger = Some(1),
          stateBuckets = 4, beforeSuffix = Some("_before"))
        .awaitTermination()
      val conf = s.sparkContext.hadoopConfiguration
      require(graft.llm.LayoutStore.versions(conf, state).size >= 3,
        "the CDC fold must have run once per micro-batch")
      // the served facts carry the after images, never a before column
      val fcols = graft.llm.LayoutStore.readSnapshotTable(s, facts)
        .columns.toSet
      require(!fcols.contains("v_before"),
        s"before images must never land in the fact store: $fcols")
      graft.llm.LayoutStore.readSnapshotTable(s, state)
        .select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_value"),
          col("min_vd").as("min_value"), col("max_vd").as("max_value"))
    }),
    "m71_cdc_compacted_facts" -> ((s, dir) => {
      // the generic snapshot COMPACTOR composes with the CDC fold
      // lifecycle: fold two batches, compact BOTH stores mid-stream
      // (small-file maintenance a long-lived layout needs), then fold a
      // delete batch whose min/max repair reads the COMPACTED fact
      // store. Compaction must carry the text markers — the replay
      // token and the bucket count — or the next fold would silently
      // lose replay protection and the bucket-layout fail-fast; and the
      // post-compaction fold must still write ∝ touched buckets (cold
      // buckets carry by manifest reference to the compacted version).
      // The oracle aggregates the post-apply facts from scratch —
      // compaction is physical churn with zero logical change.
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"),
          col("value").cast("decimal(27,2)").as("v"),
          col("value").as("vd"))
      val m3 = pmod(col("event_id"), lit(3))
      val del1 = m3 === 0 && pmod(col("event_id"), lit(7)) === 3
      val del2 = m3 =!= 2 && pmod(col("event_id"), lit(5)) === 2 && !del1 &&
        col("event_type") === "click" // ONE key → provably cold buckets
      val state = tmpQueryDir("m71-state").toString + "/state"
      val facts = tmpQueryDir("m71-facts").toString + "/facts"
      val conf = s.sparkContext.hadoopConfiguration
      def fold(bdf: org.apache.spark.sql.DataFrame, token: String): Unit =
        Incremental.cdcAggMaintenanceBatch(bdf, token,
          pkCols = Seq("event_id"), keyCols = Seq("event_type"),
          sumCols = Seq("v"), minCols = Seq("vd"), maxCols = Seq("vd"),
          statePath = state, factsPath = facts, stateBuckets = 16)
      fold(ev.where(m3 =!= 1).withColumn("op", lit("I")), "m71-b1")
      fold(ev.where(m3 === 1).withColumn("op", lit("I"))
        .unionByName(ev.where(del1).withColumn("op", lit("D"))), "m71-b2")
      val fv = graft.llm.LayoutStore.compactSnapshot(s, facts)
      val sv = graft.llm.LayoutStore.compactSnapshot(s, state)
      for ((p, v) <- Seq((facts, fv), (state, sv))) {
        require(graft.llm.LayoutStore.readTextMarker(conf,
            s"$p/version=$v", Incremental.StateBucketsMarker)
          .contains("16"),
          s"compaction must carry the bucket-count marker at $p")
        require(graft.llm.LayoutStore.readTextMarker(conf,
            s"$p/version=$v", Incremental.AppliedBatchMarker)
          .contains("m71-b2"),
          s"compaction must carry the replay token at $p")
      }
      // delete-only batch on ONE key: its min/max repair reads the
      // compacted fact store; every other key's bucket stays cold
      fold(ev.where(del2).withColumn("op", lit("D")), "m71-b3")
      // write discipline survives compaction: the post-compaction fold
      // carries its cold buckets by manifest reference to the compacted
      // version instead of rewriting them
      val lastS = graft.llm.LayoutStore.versions(conf, state).last
      val entries = graft.llm.LayoutStore.effectiveEntries(conf, state,
        lastS)
      require(entries.values.exists(_ == sv),
        s"post-compaction fold must carry cold buckets from the " +
          s"compacted version $sv: $entries")
      graft.llm.LayoutStore.readSnapshotTable(s, state)
        .select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_value"),
          col("min_vd").as("min_value"), col("max_vd").as("max_value"))
    }),
    "m72_cdc_auto_compaction" -> ((s, dir) => {
      // the AUTO-compaction policy in the maintenance loop: m71 proved
      // compaction COMPOSES with the CDC fold; nothing previously
      // TRIGGERED it — a long-lived store accreted a version per batch
      // until an operator intervened. Here the stream folds one event
      // type per micro-batch (each touches ONE key bucket, so the
      // manifest chain grows one owner per batch) under
      // maxManifestChain=3: the policy must fire a full compaction
      // MID-STREAM, the compacted version must carry the replay-token
      // and bucket-count markers, and the next fold must carry its
      // cold buckets by reference to the policy-compacted version —
      // the files-∝-touched discipline surviving an automatic rewrite.
      // The oracle aggregates post-apply facts from scratch: an
      // auto-fired compaction is physical churn with zero logical
      // change.
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"),
          col("value").cast("decimal(27,2)").as("v"),
          col("value").as("vd"))
      val del = pmod(col("event_id"), lit(5)) === 2 &&
        col("event_type") === "click"
      def ins(t: String*) = ev.where(col("event_type").isin(t: _*))
        .withColumn("op", lit("I"))
      val batches = Seq(
        ins("click"), ins("view"), ins("purchase"),
        ins("signup", "error"),
        ev.where(del).withColumn("op", lit("D")))
      val src = tmpQueryDir("m72-src")
      val seen = scala.collection.mutable.Set[String]()
      val base = 1600000000000L
      batches.zipWithIndex.foreach { case (bdf, i) =>
        bdf.coalesce(1).write.mode("append").parquet(src.toString)
        new java.io.File(src.toString).listFiles()
          .filter(f => f.getName.startsWith("part-") && seen.add(f.getName))
          .foreach(_.setLastModified(base + i * 60000L))
      }
      val state = tmpQueryDir("m72-state").toString + "/state"
      val facts = tmpQueryDir("m72-facts").toString + "/facts"
      val ckpt = tmpQueryDir("m72-ckpt").toString
      Incremental.cdcAggMaintenanceAvailableNow(s, src.toString,
          batches.head.schema, "parquet", df => df,
          pkCols = Seq("event_id"), keyCols = Seq("event_type"),
          sumCols = Seq("v"), minCols = Seq("vd"), maxCols = Seq("vd"),
          statePath = state, factsPath = facts, checkpointDir = ckpt,
          maxFilesPerTrigger = Some(1), stateBuckets = 16,
          compaction = graft.llm.LayoutStore.CompactionPolicy(
            maxManifestChain = Some(3), retainVersions = Some(4)))
        .awaitTermination()
      val conf = s.sparkContext.hadoopConfiguration
      for (p <- Seq(facts, state)) {
        val vs = graft.llm.LayoutStore.versions(conf, p)
        // retention's half of the policy: the serveable chain stays
        // bounded even though five folds + compactions landed
        require(vs.length <= 4,
          s"retention must bound the serveable versions at $p: $vs")
        // a full-physical version beyond the bootstrap = the policy
        // fired (fold versions are manifested, owners span the chain)
        val full = vs.filter(v => graft.llm.LayoutStore
          .effectiveEntries(conf, p, v).values.toSet == Set(v))
        require(full.exists(_ >= 3),
          s"the chain policy must fire a full compaction mid-stream " +
            s"at $p: full-physical versions $full of $vs")
        val cv = full.filter(_ >= 3).min
        // fold-after-compaction: cold buckets carry by reference to
        // the policy-compacted version, never rewritten
        vs.find(_ > cv).foreach { next =>
          require(graft.llm.LayoutStore.effectiveEntries(conf, p, next)
            .values.toSet.contains(cv),
            s"the fold after auto-compaction must reference version " +
              s"$cv at $p")
        }
        // the m71 marker guarantee, now under the automatic trigger
        require(graft.llm.LayoutStore.readTextMarker(conf,
            s"$p/version=${vs.last}", Incremental.StateBucketsMarker)
          .contains("16"),
          s"auto-compaction must preserve the bucket-count marker at $p")
        require(graft.llm.LayoutStore.readTextMarker(conf,
            s"$p/version=${vs.last}", Incremental.AppliedBatchMarker)
          .isDefined,
          s"auto-compaction must preserve the replay token at $p")
      }
      graft.llm.LayoutStore.readSnapshotTable(s, state)
        .select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_value"),
          col("min_vd").as("min_value"), col("max_vd").as("max_value"))
    }),
    "m59_multilevel_compaction" -> ((s, dir) => {
      // partial compaction over a MULTI-LEVEL (day/hour) partitioned
      // layout: only the fragmented day rewrites, and its hour
      // sub-directories must re-land as partition DIRECTORIES (the
      // ADVICE r12 flattening hazard: inner partition columns silently
      // becoming string data columns). The oracle states the logical
      // content; the leaf-read require pins the physical chain
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val rows = docs.select(col("doc_id").as("id"),
        (col("doc_id") % 4).cast("int").as("day"),
        (col("doc_id") % 3).cast("int").as("hour"),
        col("n_chars"))
      val store = tmpQueryDir("m59-store").toString + "/layout"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store) { tmp =>
        rows.where(col("day") =!= 1).repartition(col("day"), col("hour"))
          .write.partitionBy("day", "hour").parquet(tmp)
        rows.where(col("day") === 1).repartition(8)
          .write.mode("append").partitionBy("day", "hour").parquet(tmp)
      }
      graft.llm.LayoutStore.compactSnapshotPartial(s, store,
        maxFilesPerEntry = 8)
      require(graft.llm.LayoutStore.fragmentedEntries(conf, store, 2L,
        8).isEmpty, "the fragmented day must be compacted")
      require(s.read.parquet(s"$store/version=2/day=1/hour=2")
        .columns.toSet == Set("id", "n_chars"),
        "hour must re-land as a partition directory, not a data column")
      graft.llm.LayoutStore.readSnapshotTable(s, store)
        .select(col("id"), col("day").cast("int").as("day"),
          col("hour").cast("int").as("hour"), col("n_chars"))
    }),
    "m57_agg_maintenance" -> ((s, dir) => {
      // closed-form maintenance of a materialized per-supplier aggregate
      // state: old facts aggregate once (the stored state), the new
      // batch aggregates alone, and ONE full-outer merge folds them —
      // history never rescans. The oracle aggregates the union from
      // scratch: the merge invariant is stated, not assumed. Sums ride
      // exact decimals and cast to double only at the end (bit-exact
      // across engines regardless of add order)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"),
        col("l_quantity").cast("decimal(27,2)").as("qty"),
        col("l_quantity").as("qd"),
        col("l_extendedprice").cast("decimal(27,2)").as("price"))
      val am = graft.operators.AggMaintenance
      def st(f: org.apache.spark.sql.DataFrame) =
        am.aggState(f, Seq("l_suppkey"), sumCols = Seq("qty", "price"),
          minCols = Seq("qd"), maxCols = Seq("qd"))
      val state0 = st(li.where(col("l_orderkey") % 4 =!= 1))
      val delta = st(li.where(col("l_orderkey") % 4 === 1))
      am.mergeAggState(state0, delta, Seq("l_suppkey"),
          sumCols = Seq("qty", "price"), minCols = Seq("qd"),
          maxCols = Seq("qd"))
        .select(col("l_suppkey"), col("n"),
          col("sum_qty").cast("double").as("sum_qty"),
          col("sum_price").cast("double").as("sum_price"),
          col("min_qd").as("min_qty"), col("max_qd").as("max_qty"))
    }),
    "m60_retraction_maintenance" -> ((s, dir) => {
      // RETRACTION-AWARE maintenance: the per-supplier state absorbs a
      // CDC batch of fact inserts AND deletes — counts/sums decrement
      // in exact closed form, delete-touched keys' min/max rebuild
      // from the post-apply facts (broadcast semi-join: cost ∝ the
      // touched keys' fact rows, never a history rescan), untouched
      // keys pass through byte-identical. The oracle aggregates the
      // post-apply facts (pre − deletes ∪ inserts) from scratch: the
      // invariant is stated, not assumed
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"),
        col("l_quantity").cast("decimal(27,2)").as("qty"),
        col("l_quantity").as("qd"),
        col("l_extendedprice").cast("decimal(27,2)").as("price"))
      val am = graft.operators.AggMaintenance
      val pre = li.where(col("l_orderkey") % 4 =!= 1)
      val state0 = am.aggState(pre, Seq("l_suppkey"),
        sumCols = Seq("qty", "price"), minCols = Seq("qd"),
        maxCols = Seq("qd"))
      val changes = li.where(col("l_orderkey") % 4 === 1)
          .withColumn("op", lit("I"))
        .unionByName(pre.where(col("l_orderkey") % 5 === 2)
          .withColumn("op", lit("D"))) // full before-images: CDC contract
      val post = li.where(col("l_orderkey") % 4 === 1 ||
        col("l_orderkey") % 5 =!= 2)
      am.applyChangesToAggState(state0, changes, post, Seq("l_suppkey"),
          sumCols = Seq("qty", "price"), minCols = Seq("qd"),
          maxCols = Seq("qd"))
        .select(col("l_suppkey"), col("n"),
          col("sum_qty").cast("double").as("sum_qty"),
          col("sum_price").cast("double").as("sum_price"),
          col("min_qd").as("min_qty"), col("max_qd").as("max_qty"))
    }),
    "m45_zorder_layout" -> ((s, dir) => {
      // Morton-curve clustered layout: lineitem written partitioned by
      // interleaved (l_partkey, l_suppkey) bit-buckets, then a rectangle
      // on BOTH keys reads only the bucket directories the driver-side
      // cell enumeration admits (partition-pruned; plan-guarded in
      // ZOrderSpec). The oracle is the plain rectangle scan — an
      // unsound bucket set drops rows and fails the hash
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
      val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head()
      val dims = Seq(
        graft.sinks.ZOrder.Dim("l_partkey", b.getLong(0), b.getLong(1)),
        graft.sinks.ZOrder.Dim("l_suppkey", b.getLong(2), b.getLong(3)))
      val path = tmpQueryDir("m45-zorder").toString + "/layout"
      graft.sinks.ZOrder.writeZOrderLayout(li, path, dims, bits = 5,
        zBuckets = 64)
      val rect = Seq(
        (b.getLong(0), b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 8),
        (b.getLong(2), b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 4))
      graft.sinks.ZOrder.readRect(s, path, dims, rect, bits = 5,
          zBuckets = 64)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
    }),
    "m46_shard_append" -> ((s, dir) => {
      // growth on the training-shard layout (m40's inverse): v1 holds
      // the even half; the odd half appends from METADATA only — old
      // ids re-hash to their stored shard (drift fails fast), new ids
      // hash in, pos re-ranks per shard. The oracle is d42's
      // formulation over the FULL corpus: the merged layout must be
      // bit-identical to a from-scratch assignment of the union
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val assigned = graft.llm.Packing.shardAssign(
        docs.where(col("doc_id") % 2 === 0), "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 8, salt = "m46")
      val store = tmpQueryDir("m46-shards").toString + "/store"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store)(tmp =>
        graft.llm.Packing.writeShardLayout(assigned, tmp))
      graft.llm.Ingest.appendShardSnapshot(s, store,
        docs.where(col("doc_id") % 2 =!= 0), "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 8, salt = "m46")
      graft.llm.LayoutStore.readSnapshotTable(s, store)
        .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"))
    }),
    "m48_incremental_refresh" -> ((s, dir) => {
      // the COMPLETE production refresh loop under one oracle: v1
      // indexes the old corpus version; corpusDiffRows decides per id;
      // refresh retracts (removed ∪ changed) in closed form and
      // re-enters (added ∪ changed) as a batch append — unchanged docs
      // (the mass of a real refresh) are never re-read — and the
      // pinned-newest probe must hash-equal s09's from-scratch
      // formulation over the NEW corpus version
      val docs = t(s, dir, "documents")
      val prev = docs.where(col("doc_id") % 5 =!= 0)
      val cur = docs.where(col("doc_id") % 7 =!= 3)
        .withColumn("text",
          when(col("doc_id") % 11 === 2, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      val store = tmpQueryDir("m48-refresh").toString + "/store"
      TextAnalysis.writeBm25Snapshot(prev, store, termBuckets = 32)
      graft.llm.Ingest.refreshBm25Snapshot(s, store,
        graft.llm.Ingest.corpusDiffRows(prev, cur), cur)
      val queries = cur.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      TextAnalysis.bm25TopKIndexedLatest(s, store, queries,
        "query_id", "qtext", k = 5)
    }),
    "m47_stream_interval_join" -> ((s, dir) => {
      // stream-stream attribution join END-TO-END under the oracle:
      // views and clicks stream off the same file source, clicks join
      // within 2 hours of a same-user view, watermarks bound the join
      // state on both sides. Inner matches emit as both sides arrive —
      // no watermark holdback — so over the closed input the result is
      // the batch interval join, which the oracle states directly
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val src = tmpQueryDir("m47-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("events.parquet"))
      val out = tmpQueryDir("m47-sink").toString
      val ckpt = tmpQueryDir("m47-ckpt").toString
      def side(tp: String, pre: String)(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === tp)
          .select(col("user_id").as(s"${pre}_user"),
            col("event_id").as(s"${pre}_id"),
            timestamp_micros(tsMicros(df)).as(s"${pre}_ets"))
      Incremental.intervalJoinAvailableNow(s, src.toString, schema,
        "parquet", side("view", "v"), side("click", "c"),
        "v_user", "c_user", "v_ets", "c_ets",
        maxGap = "2 hours", watermark = "4 hours", out, ckpt,
        stateShufflePartitions = Some(8))
        .awaitTermination()
      s.read.parquet(out)
        .select(col("v_user").as("user_id"), col("v_id").as("view_id"),
          col("c_id").as("click_id"),
          unix_micros(col("v_ets")).as("vts"),
          unix_micros(col("c_ets")).as("cts"))
    }),
    "m49_stream_interval_left_join" -> ((s, dir) => {
      // the OTHER half of attribution: views with no click within the
      // gap emit (v, null). Null extensions are watermark-held (a
      // matching click could still arrive until the watermark passes
      // viewTs + gap), so closed-input == batch LEFT join needs the
      // watermark pushed past every real row's eviction time: one
      // sentinel view + click pair (user -1) lands 8h after the last
      // real event — beyond watermark 4h + gap 2h — and the trailing
      // no-data batch flushes every held null row. The sentinels are
      // filtered from the result; the oracle states the batch left
      // join over the real events directly
      val ev = s.read.parquet(s"$dir/events.parquet")
      val schema = ev.schema
      val src = tmpQueryDir("m49-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("events.parquet"))
      val maxUs = ev.agg(max(tsMicros(ev))).head().getLong(0)
      val flushUs = maxUs + 8L * 3600000000L
      val flushTs: Column = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => lit(flushUs * 1000L)
        case _ => timestamp_micros(lit(flushUs))
      }
      ev.where(col("event_type") === "view").limit(1)
        .unionByName(ev.where(col("event_type") === "click").limit(1))
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", flushTs)
        .coalesce(1).write.mode("append").parquet(src.toString)
      val out = tmpQueryDir("m49-sink").toString
      val ckpt = tmpQueryDir("m49-ckpt").toString
      def side(tp: String, pre: String)(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === tp)
          .select(col("user_id").as(s"${pre}_user"),
            col("event_id").as(s"${pre}_id"),
            timestamp_micros(tsMicros(df)).as(s"${pre}_ets"))
      Incremental.intervalJoinAvailableNow(s, src.toString, schema,
        "parquet", side("view", "v"), side("click", "c"),
        "v_user", "c_user", "v_ets", "c_ets",
        maxGap = "2 hours", watermark = "4 hours", out, ckpt,
        joinType = "leftOuter", stateShufflePartitions = Some(8))
        .awaitTermination()
      s.read.parquet(out).where(col("v_user") >= 0)
        .select(col("v_user").as("user_id"), col("v_id").as("view_id"),
          col("c_id").as("click_id"),
          unix_micros(col("v_ets")).as("vts"),
          unix_micros(col("c_ets")).as("cts"))
    }),
    "m50_stream_interval_full_join" -> ((s, dir) => {
      // the COMPLETE attribution picture: matched pairs, views with no
      // click, AND orphan clicks with no qualifying view (attribution
      // loss — the click whose view fell outside the gap or never
      // landed). Both sides' null extensions are watermark-held; the
      // same per-side flush sentinels close both, and closed-input ==
      // batch FULL join is the oracle's statement. Sentinels filter on
      // BOTH sides (an unmatched real row null-extends the other side,
      // so the filter must be null-safe).
      val ev = s.read.parquet(s"$dir/events.parquet")
      val schema = ev.schema
      val src = tmpQueryDir("m50-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("events.parquet"))
      val maxUs = ev.agg(max(tsMicros(ev))).head().getLong(0)
      val flushUs = maxUs + 8L * 3600000000L
      val flushTs: Column = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => lit(flushUs * 1000L)
        case _ => timestamp_micros(lit(flushUs))
      }
      ev.where(col("event_type") === "view").limit(1)
        .unionByName(ev.where(col("event_type") === "click").limit(1))
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", flushTs)
        .coalesce(1).write.mode("append").parquet(src.toString)
      val out = tmpQueryDir("m50-sink").toString
      val ckpt = tmpQueryDir("m50-ckpt").toString
      def side(tp: String, pre: String)(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === tp)
          .select(col("user_id").as(s"${pre}_user"),
            col("event_id").as(s"${pre}_id"),
            timestamp_micros(tsMicros(df)).as(s"${pre}_ets"))
      Incremental.intervalJoinAvailableNow(s, src.toString, schema,
        "parquet", side("view", "v"), side("click", "c"),
        "v_user", "c_user", "v_ets", "c_ets",
        maxGap = "2 hours", watermark = "4 hours", out, ckpt,
        joinType = "fullOuter", stateShufflePartitions = Some(8))
        .awaitTermination()
      s.read.parquet(out)
        .where(coalesce(col("v_user"), lit(0L)) >= 0 &&
          coalesce(col("c_user"), lit(0L)) >= 0)
        .select(coalesce(col("v_user"), col("c_user")).as("user_id"),
          col("v_id").as("view_id"), col("c_id").as("click_id"),
          unix_micros(col("v_ets")).as("vts"),
          unix_micros(col("c_ets")).as("cts"))
    }),
    "m51_stream_exact_dedup" -> ((s, dir) => {
      // ingest-side streaming exact dedup with BOUNDED state
      // (dropDuplicatesWithinWatermark): one state entry per
      // fingerprint, held only within the watermark horizon. Closed
      // input inside one horizon == batch DISTINCT fingerprints —
      // which copy survives is arrival-dependent, so the deterministic
      // projection is the key alone (the d01 fingerprint). Event time
      // derives off doc_id (+1: the epoch-0 boundary drops a row AT
      // the initial watermark, the pinned intervalJoin semantics).
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val schema = docs.schema
      val src = tmpQueryDir("m51-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val out = tmpQueryDir("m51-sink").toString
      val ckpt = tmpQueryDir("m51-ckpt").toString
      Incremental.dedupWithinWatermarkAvailableNow(s, src.toString,
        schema, "parquet",
        df => df.select(graft.llm.Dedup.exactKey(col("text")).as("fp"),
          timestamp_micros((col("doc_id") + 1) * 1000000L).as("ets")),
        "ets", Seq("fp"), watermark = "30 days", out, ckpt,
        stateShufflePartitions = Some(8))
        .awaitTermination()
      s.read.parquet(out).select(col("fp"))
    }),
    "m53_stream_dedup_insert" -> ((s, dir) => {
      // the streaming DEDUP-INSERT ingest (the reference's most common
      // production write mode, HoodieSink DEDUP_INSERT) with
      // stream-static enrichment: micro-batches append ONLY keys the
      // sink has never seen (left-anti against the sink's key
      // projection), each enriched against a broadcast 16-row static
      // dimension keyed on the fingerprint's first hex digit (a pure
      // function of the key, so the surviving-copy arbitrariness of
      // dedup never reaches the output). The source lands as TWO
      // files processed one per micro-batch (maxFilesPerTrigger=1):
      // the corpus, then a planted batch of verbatim copies (%10==3,
      // re-keyed ids — same fingerprint, must insert NOTHING) plus
      // genuinely fresh texts (%10==4 with a suffix — must insert).
      // Closed input == the batch dedup-insert: DISTINCT fingerprints
      // of the union, enriched.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val schema = docs.schema
      val src = tmpQueryDir("m53-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        src.resolve("documents.parquet"))
      val planted = docs.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"))
        .unionByName(docs.where(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" fresh rev")).as("text"),
            col("lang"), col("source"), col("n_chars")))
      planted.coalesce(1).write.mode("append").parquet(src.toString)
      val dim = s.range(16).select(
        lower(hex(col("id"))).as("grp"),
        concat(lit("grp_"), lower(hex(col("id")))).as("lbl"))
      val out = tmpQueryDir("m53-sink").toString
      val ckpt = tmpQueryDir("m53-ckpt").toString
      Incremental.dedupInsertAvailableNow(s, src.toString, schema,
        "parquet",
        df => df.select(graft.llm.Dedup.exactKey(col("text")).as("fp"))
          .withColumn("grp", substring(col("fp"), 1, 1)),
        "fp", dim, "grp", out, ckpt, maxFilesPerTrigger = Some(1))
        .awaitTermination()
      s.read.parquet(out).select(col("fp"), col("lbl"))
    }),
    "m52_stream_sessions" -> ((s, dir) => {
      // d15's gap sessionization as a STREAMING session_window — state
      // lives in Spark's session-window store (merge on overlapping OR
      // touching windows, evict past watermark), no custom state code.
      // Boundary spec-pinned: an event at EXACTLY prev+gap MERGES,
      // identical to the batch lag rule, so the oracle is the d15
      // derivation with end = last event + gap. A session emits once
      // the watermark passes its end, so one sentinel user far past
      // maxEvent + watermark + gap flushes every real session.
      val ev = s.read.parquet(s"$dir/events.parquet")
      val schema = ev.schema
      val src = tmpQueryDir("m52-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("events.parquet"))
      val maxUs = ev.agg(max(tsMicros(ev))).head().getLong(0)
      val flushUs = maxUs + 8L * 3600000000L
      val flushTs: Column = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => lit(flushUs * 1000L)
        case _ => timestamp_micros(lit(flushUs))
      }
      ev.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", flushTs)
        .coalesce(1).write.mode("append").parquet(src.toString)
      val out = tmpQueryDir("m52-sink").toString
      val ckpt = tmpQueryDir("m52-ckpt").toString
      Incremental.sessionWindowAvailableNow(s, src.toString, schema,
        "parquet",
        df => df.select(col("user_id"),
          timestamp_micros(tsMicros(df)).as("ets")),
        "ets", "user_id", gap = "30 minutes", watermark = "1 hour",
        out, ckpt, stateShufflePartitions = Some(8))
        .awaitTermination()
      s.read.parquet(out).where(col("user_id") >= 0)
        .select(col("user_id"),
          unix_micros(col("w_start")).as("start_us"),
          unix_micros(col("w_end")).as("end_us"),
          col("n_events"))
    }),
    "q35_moving_revenue" -> ((s, dir) => {
      // the RANGE-frame window shape (sliding 7-day revenue): daily
      // exact-decimal totals, then a moving sum over RANGE BETWEEN 6
      // PRECEDING AND CURRENT ROW on the epoch-day key — a VALUE-based
      // frame (absent days shrink it), not a row count. The decimal
      // rides the frame un-cast; one double cast at the end. Scale
      // shape: the window runs over the |days|-sized aggregate, never
      // the orders table.
      val day = datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      val daily = t(s, dir, "orders")
        .groupBy(day.as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(27,2)")).as("__rev"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
      daily.select(col("day"), col("n_orders"),
        col("__rev").cast("double").as("day_rev"),
        sum(col("__rev")).over(w).cast("double").as("rev_7d"))
    }),
    "q36_priority_pivot" -> ((s, dir) => {
      // the PIVOT shape: per-year order totals cross-tabbed by
      // priority class. Explicit value list (no discovery pass — at
      // 100 TB the values-scan is a full extra aggregation; the listed
      // form plans as ONE groupBy with conditional partial aggs, the
      // q32 CASE-split underneath the API). Exact decimal sums; column
      // names fixed by the value list on both engines.
      val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")
      t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderpriority"),
          col("o_totalprice").cast("decimal(27,2)").as("__p"))
        .groupBy(col("yr"))
        .pivot("o_orderpriority", pr)
        .agg(sum(col("__p")).cast("double"))
        .select(col("yr") +: pr.map(p =>
          col(s"`$p`").as(p.toLowerCase.replaceAll("[^a-z0-9]+", "_"))): _*)
    }),
    "q34_disjunctive_revenue" -> ((s, dir) => {
      // TPC-H Q19's plan shape: an OR-of-ANDs predicate SPANNING the
      // join — brand/size conditions live on part, quantity bands on
      // lineitem, and each disjunct pairs them. Catalyst extracts each
      // side's implied disjunction and pushes it to that side's scan
      // (part prunes to the three brands, lineitem to the union of
      // quantity bands) while the exact cross-side predicate evaluates
      // above the join; revenue is the exact decimal sum.
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .where(
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 20) &&
            col("l_quantity").between(20, 30)))
        .agg(decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),
    "d71_expanded_takedown" -> ((s, dir) => {
      // the policy behind every real takedown: deleting the named doc
      // while its near-copies keep serving is not deletion. The seed
      // revocations (doc_id % 250 = 8) expand to their WHOLE near-dup
      // clusters at the production LSH config; output is the per-doc
      // revocation decision. Oracle = the d09 transitive closure with
      // its own cluster-membership expansion
      val docs = t(s, dir, "documents")
      val expanded = graft.llm.Takedown.expandRevocations(docs, "doc_id",
        "text", docs.where(col("doc_id") % 250 === 8).select(col("doc_id")),
        "doc_id", threshold = 0.5,
        maxBucketSize = Some(docBucketCap(s, dir)))
      docs.select(col("doc_id"))
        .join(expanded.withColumn("revoked", lit(true)), Seq("doc_id"),
          "left")
        .select(col("doc_id"), coalesce(col("revoked"), lit(false))
          .as("revoked"))
    }),
    "q26_top_supplier" -> ((s, dir) => {
      // TPC-H Q15's plan shape: an aggregate VIEW (quarterly revenue per
      // supplier) consumed twice — once for the global MAX scalar, once
      // for the equality filter — then the dimension join. Revenue is
      // the exact decimal sum, so the max-equality is engine-exact (ties
      // all surface, deterministically). Spark side: the view computes
      // once per consumer off one scan shape; the 1-row max broadcasts
      val revenue = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(27,4)")).as("__rev"))
      val maxRev = revenue.agg(max(col("__rev")).as("__max"))
      revenue.crossJoin(broadcast(maxRev))
        .where(col("__rev") === col("__max"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("__rev").cast("double").as("total_revenue"))
    }),
    "q25_national_balance_share" -> ((s, dir) => {
      // TPC-H Q11's plan shape: GROUP BY + HAVING against a GLOBAL
      // scalar aggregate. Cross-multiplied (sum*25 > total) so the
      // comparison stays in exact DECIMAL on both engines — no
      // fraction literal ever rounds. Spark side decorrelates by hand:
      // the 1-row global broadcasts, the HAVING becomes a filter
      val sup = t(s, dir, "supplier")
      val global = sup
        .agg(sum(col("s_acctbal").cast("decimal(27,2)")).as("__g"))
      sup.join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("s_acctbal").cast("decimal(27,2)")).as("__s"),
          count(lit(1)).as("n_suppliers"))
        .crossJoin(broadcast(global))
        .where(col("__s") * 25 > col("__g"))
        .select(col("n_name"), col("__s").cast("double").as("total_bal"),
          col("n_suppliers"))
    }),
    "q24_inactive_high_balance" -> ((s, dir) => {
      // TPC-H Q22's plan shape: an UNCORRELATED scalar-aggregate
      // threshold (exact decimal avg — the q01 convention) + a
      // correlated NOT EXISTS anti-join against orders + final rollup.
      // The oracle states the subquery form itself; Spark's side is the
      // hand-decorrelated plan (broadcast 1-row threshold, left-anti on
      // the distinct big-order custkeys)
      val c = t(s, dir, "customer")
      val thresh = c.where(col("c_acctbal") > 0)
        .agg(decimalAvg(col("c_acctbal"), 2).as("__thr"))
      c.crossJoin(broadcast(thresh))
        .where(col("c_acctbal") > col("__thr"))
        .join(t(s, dir, "orders").where(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          decimalSum(col("c_acctbal"), 2).as("total_bal"))
    }),
    "d67_cardinality_monitor" -> ((s, dir) =>
      // per-source + whole-run distinct-doc/distinct-term cardinality in
      // one rollup pass. The oracle gates the EXACT regime bit-for-bit;
      // the approximate=true HLL regime shares this schema and is
      // ScaleBench's sketch-vs-exact row — its ±rsd error is documented,
      // not gated (the d50 sketch contract)
      TextAnalysis.cardinalityMonitor(t(s, dir, "documents"), "doc_id",
        "text", "source")),
    "d66_simhash_recall" -> ((s, dir) =>
      // d63's role for the SIMHASH family, one row per blocking tier:
      // truth is the UNCAPPED combination-key detector (pigeonhole-exact,
      // no quadratic pass); each tier then runs at the production cap, so
      // recall isolates exactly what the cap dropped on that tier's
      // bucket space. The oracle's truth is scheme-INDEPENDENT brute
      // force (the d21 statement), its tiers re-derive both blocking
      // pipelines in SQL
      Dedup.simhashRecallGauge(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, bands = 4, chunks = 6,
        maxBucketSize = Some(docBucketCap(s, dir)))),

    // ---- takedown / right-to-be-forgotten propagation (d65 family) ----
    "d65_takedown_bm25" -> ((s, dir) => {
      // deletion end-to-end on the BM25 serving index: v1 indexes the
      // FULL corpus, the takedown pass propagates the revocation set
      // (doc_id % 17 = 3) into v2 with closed-form df/N/Σdl repair — the
      // corpus text is never re-tokenized — and the probe pins latest.
      // The oracle is an INDEPENDENT from-scratch index of the scrubbed
      // corpus: any surviving revoked posting or stale stat in v2 shifts
      // scores/ranks and fails the hash — zero revoked content AND
      // rebuild-identity in one gate
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("d65-bm25").toString + "/store"
      TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 32)
      graft.llm.Takedown.propagateBm25Snapshot(s, store,
        docs.where(col("doc_id") % 17 === 3).select(col("doc_id")), "doc_id")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      TextAnalysis.bm25TopKIndexedLatest(s, store, queries,
        "query_id", "qtext", k = 5)
    }),
    "m38_takedown_ivf" -> ((s, dir) => {
      // deletion on the ANN serving layout: v1 = full-corpus IVF store
      // (m26's shape), then the GENERIC row-keyed propagation drops the
      // revoked vec_ids (vec_id % 9 = 4) into v2 — cell assignment is a
      // pure per-row function of the frozen centroids, so the filter is
      // rebuild-identical by construction; the probe pins latest. The
      // oracle rebuilds from the scrubbed embeddings — a revoked vector
      // surviving in any probed cell would enter top-k and fail the hash
      val emb = t(s, dir, "embeddings")
      val cents = ivfCentroids(s, dir, 16)
      val store = tmpQueryDir("m38-ivf").toString + "/store"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store)(tmp =>
        Similarity.writeIvfLayout(emb, cents, tmp))
      // %5 bites: it revokes vectors that sit in the probe's top-k (the
      // takedown must VISIBLY change the retrieved set, not just pass a
      // vacuous filter); the query vector itself (vec_id 0) is exempted
      graft.llm.Takedown.propagateLayoutSnapshot(s, store,
        emb.where(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
          .select(col("vec_id")), "vec_id")
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val cells = cents.zipWithIndex.map { case (c, i) =>
        var acc = 0.0
        var j = 0
        while (j < qVec.length) {
          val d = qVec(j) - c(j); acc += d * d; j += 1
        }
        (acc, i)
      }.sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSeq
      val probed = Similarity.readIvfCellsSnapshot(s, store, cells)
      Similarity.bruteForceTopK(probed, emb.where(col("vec_id") === 0), k = 5)
    }),
    "m39_takedown_state" -> ((s, dir) => {
      // deletion on the cross-run dedup MEMORY: d11's flow, but the
      // persisted history state is scrubbed of the revocation set
      // (doc_id % 11 = 2) before the new shard is flagged against it.
      // Batch doc 10002 is an exact copy of revoked history doc 2 — it
      // must now flag keep=true (the state no longer remembers the
      // revoked text through its hashes); an unscrubbed fp/sig row
      // would flip it to exact_dup and fail the oracle, which rebuilds
      // history from the scrubbed ingest directly
      val docs = t(s, dir, "documents")
      val base = tmpQueryDir("m39-state").toString
      val statePath = base + "/sigs"
      Dedup.writeSignatureState(
        Dedup.signatureState(docs.where(col("doc_id") < 250), "doc_id", "text"),
        statePath, mode = "overwrite")
      val scrubbed = base + "/sigs-scrubbed"
      graft.llm.Takedown.scrubSignatureState(s, statePath,
        docs.where(col("doc_id") % 11 === 2).select(col("doc_id")), "doc_id",
        scrubbed)
      val batch = docs.where(col("doc_id") >= 250)
        .unionByName(docs.where(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.incrementalDedup(batch, Dedup.readSignatureState(s, scrubbed),
        "doc_id", "text", threshold = 0.5)
    }),
    "m40_takedown_shards" -> ((s, dir) => {
      // deletion on the training-shard layout: v1 = m23's layout in a
      // versioned store; propagation drops revoked docs (doc_id % 13 =
      // 5) and densely re-ranks pos by the retired snapshot's order —
      // provably the same (sk, id) order shardAssign derives, so the
      // oracle is simply d42's formulation over the scrubbed corpus
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val assigned = graft.llm.Packing.shardAssign(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 8, salt = "s42")
      val store = tmpQueryDir("m40-shards").toString + "/store"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store)(tmp =>
        graft.llm.Packing.writeShardLayout(assigned, tmp))
      graft.llm.Takedown.propagateShardSnapshot(s, store,
        docs.where(col("doc_id") % 13 === 5).select(col("doc_id")), "doc_id")
      graft.llm.LayoutStore.readSnapshotTable(s, store)
        .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"))
    }),
    "d61_vocab_growth" -> ((s, dir) =>
      // Heaps'-law gauge: exact vocabulary size of the first 1..10 tenths
      // (id-mod buckets). Never expands the corpus B-fold: vocabulary
      // growth is the cumulative histogram of each term's FIRST-SEEN
      // bucket — one (term) exchange; the oracle states the naive
      // per-tenth distinct-count form
      TextAnalysis.vocabGrowth(t(s, dir, "documents"), "doc_id", "text")),
    "d64_winsorized_mean" -> ((s, dir) =>
      // the robust location gauge that keeps mass information: clamp to
      // the per-source IQR then average — dyadic percentiles keep every
      // intermediate exactly representable (the d60/q19 convention)
      RobustStats.winsorizedMean(
        t(s, dir, "documents"), "source", "n_chars")),
    "d60_robust_outliers" -> ((s, dir) =>
      // per-source median/MAD + Hampel-rule outlier counts: the robust
      // "is this doc length plausible for its source" gate a mean/stddev
      // z-score can't be (one scrape artifact drags its source's mean).
      // Integer values -> halves/quarters -> every comparison exact; the
      // oracle uses DuckDB's NATIVE median
      RobustStats.robustOutlierStats(
        t(s, dir, "documents"), "source", "n_chars")),
    "d59_weighted_quantiles" -> ((s, dir) =>
      // doc-length quantiles by TOKEN MASS per source: where the token
      // budget actually sits in length space (the unweighted median lies
      // once sizes skew). Type-1 multiset quantile, one exchange, exact
      // by the dyadic-p contract — the oracle materializes the expanded
      // multiset and asks DuckDB's native quantile_disc
      WeightedQuantiles.weightedQuantiles(
        t(s, dir, "documents").select(col("source"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("w")),
        "source", "n_chars", "w")),
    "d58_edit_neardups" -> ((s, dir) =>
      // character-level near-dups: PassJoin segment blocking is LOSSLESS
      // (pigeonhole + sound start windows), the banded threshold verify
      // owns precision — so the result is identical to the naive
      // quadratic join the oracle states (plus its own lossless
      // char-frequency prunes)
      Dedup.editNearDupPairs(t(s, dir, "documents"), "doc_id", "text", k = 8)),
    "d57_drift_by_source" -> ((s, dir) => {
      // drift attribution: per-source TVD against the pinned reference
      // (v2 = %4!=0 slice) — reference-only mass folded in closed form,
      // so the join is only (source-terms LEFT profile)
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("d57-prof").toString + "/store"
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 2 === 0), "text", store)
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 4 =!= 0), "text", store)
      TextAnalysis.driftBySource(s, docs, "source", "text", store)
    }),
    "d56_profile_familiarity" -> ((s, dir) => {
      // serving-time familiarity: the full corpus scored against the
      // PINNED frozen reference vocabulary (v2 = the %4!=0 slice — the
      // m31 retirement contract), not against itself; novel/rare mass
      // per doc, integers off one (id, term) exchange
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("d56-prof").toString + "/store"
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 2 === 0), "text", store)
      TextAnalysis.writeTermProfileSnapshot(
        docs.where(col("doc_id") % 4 =!= 0), "text", store)
      TextAnalysis.familiarityAgainstProfile(s, docs, "doc_id", "text",
        store)
    }),
    "d55_mix_shards" -> ((s, dir) =>
      // mix-preserving shards: every shard gets an exactly-equal (±1)
      // slice of every source — round-robin on the banded per-stratum
      // position, never a stratum-wide sort; the oracle is the naive
      // single-window formulation the banded form must equal bit-for-bit
      graft.llm.Packing.shardAssignBalanced(t(s, dir, "documents"),
        "doc_id", "source", nShards = 16, salt = "mix1")),
    "d54_calibrated_quality" -> ((s, dir) => {
      // per-source percentile calibration of an integer quality score
      // (permille unique-token ratio): the histogram takes the only
      // window (<=1001 rows per source), docs join the calibrated rows
      // back by (source, score) broadcast — exact percent_rank with no
      // per-doc sort; oracle is DuckDB's NATIVE percent_rank() window,
      // an independent formulation
      val docs = t(s, dir, "documents")
      val toks = TextAnalysis.tokens(lower(coalesce(col("text"), lit(""))))
      val scored = docs
        .select(col("doc_id"), col("source"),
          size(toks).cast("long").as("n_toks"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
        .select(col("doc_id"), col("source"),
          when(col("n_toks") === 0L, lit(0L))
            .otherwise(expr("(1000 * n_uniq) div n_toks")).as("score"))
      graft.llm.Filters.calibrateScores(scored, "doc_id", "source", "score")
    }),
    "d53_semantic_dispersion" -> ((s, dir) => {
      // embedding-collapse monitor: per-label mean squared distance from
      // the stratum centroid, exact integers (floor(x*2^12+0.5) — 12
      // bits keeps n*sum_sq inside BIGINT at bench scale) into ONE
      // double division; one embeddings pass, |strata|x64 longs shuffle
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDispersion(emb,
        emb.select(col("vec_id"), col("label")),
        "vec_id", "vec_id", "label", scaleBits = 12)
    }),
    "d52_skew_profile" -> ((s, dir) =>
      // the pre-shuffle skew card for events.user_id at 32 reducers:
      // exact per-key count quartiles (the q19 percentile contract),
      // max/mean ratio, and the integer-exact suggested salt factor
      graft.operators.Skew.keyProfile(t(s, dir, "events"),
        Seq("user_id"), partitions = 32)),
    "d51_budget_select" -> ((s, dir) =>
      // budgeted data selection: rank by an integer quality signal
      // (distinct-token count — lexical richness), cut at a 15k-token
      // budget; the global running total is the two-phase banded prefix
      // sum (approx-quantile bands, map-side band assignment), never a
      // single-task global sort
      graft.llm.Packing.budgetSelect(t(s, dir, "documents"), "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        size(array_distinct(TextAnalysis.tokens(lower(col("text")))))
          .cast("long"),
        budget = 15000L)),
    "d50_heavy_hitters" -> ((s, dir) => {
      // per-language top terms through the Misra-Gries sketch aggregate:
      // bounded memory per group (64 counters), partial-merged map-side,
      // only sketches shuffle. capacity > the synthetic vocab, so the
      // sketch is in its EXACT regime and the oracle gates it bit-for-bit
      val docs = t(s, dir, "documents")
      docs.select(col("lang"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .groupBy(col("lang"))
        .agg(graft.functions.FrequentItems
          .frequentItems(col("term"), capacity = 64).as("items"))
        .select(col("lang"), explode(col("items")).as("it"))
        .select(col("lang"), col("it.term").as("term"),
          col("it.count").as("cnt"))
    }),
    "d46_source_scorecard" -> ((s, dir) => {
      // per-source operational report (the "data card" every curation
      // run publishes): doc/token volume, corpus-wide exact-dup share,
      // PII incidence — one scan, one fp window (dup keeper), one
      // source aggregate; pii-any is the rule table's patterns OR'd,
      // cheap relative to the full sequential scrub
      val docs = t(s, dir, "documents")
      val piiAny = graft.llm.Pii.defaultRules
        .map(r => regexp_count(col("text"), lit(r.pattern)) > 0)
        .reduce(_ || _)
      val base = docs.select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
        Dedup.exactKey(col("text")).as("fp"),
        piiAny.cast("long").as("has_pii"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      base
        .withColumn("is_dup",
          (col("doc_id") =!= min(col("doc_id")).over(w)).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          (sum(col("n_toks")).cast("double") /
            count(lit(1)).cast("double")).as("mean_tokens"),
          sum(col("is_dup")).as("dup_docs"),
          sum(col("has_pii")).as("pii_docs"))
    }),
    "d45_leak_split" -> ((s, dir) =>
      // eval hygiene for the split itself: near-dup CLUSTER reps decide
      // the train/heldout side, so a heldout doc can never have a
      // near-copy in train; singletons (the vast majority) coalesce to
      // themselves and the side rule is the deterministic hash cut
      Dedup.leakFreeSplit(t(s, dir, "documents"), "doc_id", "text",
        heldoutRate = 0.25, salt = "split7", threshold = 0.5, k = 3,
        numHashes = 12, bands = 4,
        maxBucketSize = Some(docBucketCap(s, dir)))),
    "d12_string_clusters" -> ((s, dir) =>
      // d09's clustering with STRING document keys (the real-world id
      // shape: UUIDs/URLs) — ids map to dense numeric surrogates inside
      // connectedComponents (order-preserving global-sort rank), so the
      // keeper is still the MIN id, lexicographic for strings
      Dedup.nearDupClusters(
        t(s, dir, "documents").withColumn("doc_key",
          concat(lit("doc-"), lpad(col("doc_id").cast("string"), 6, "0"))),
        "doc_key", "text", threshold = 0.5,
        maxBucketSize = Some(docBucketCap(s, dir)))),
    "d07_winnowing" -> ((s, dir) =>
      // rolling-hash (winnowing) fingerprints, one row per distinct minimum;
      // gram hashes staged so window minima don't re-hash per window
      t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("__t"))
        .select(col("doc_id"), TextAnalysis.charGramHashes(col("__t"), k = 8).as("__g"))
        .select(col("doc_id"),
          explode(TextAnalysis.winnowingMinima(col("__g"), w = 4)).as("fp"))),
    "d11_incremental_dedup" -> ((s, dir) => {
      // Cross-RUN dedup — the mode a 100TB pipeline actually runs: the
      // signature state of an earlier ingest (docs < 250) is persisted to
      // parquet and read back (the cross-run contract); a new shard (the
      // remaining docs plus 10 re-ingested exact copies under fresh ids)
      // is then flagged exact/near/keep against the STATE ONLY — the
      // historical text is never re-read.
      val docs = t(s, dir, "documents")
      val statePath =
        tmpQueryDir("d11-state").toString + "/sigs"
      Dedup.writeSignatureState(
        Dedup.signatureState(docs.where(col("doc_id") < 250), "doc_id", "text"),
        statePath, mode = "overwrite")
      val history = Dedup.readSignatureState(s, statePath)
      val batch = docs.where(col("doc_id") >= 250)
        .unionByName(docs.where(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.incrementalDedup(batch, history, "doc_id", "text", threshold = 0.5)
    }),
    "d06_ngram_jaccard" -> ((s, dir) => {
      // direct exact-Jaccard surface (not LSH-filtered): compare each doc
      // to the doc 250 ids later
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("__toks"))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("__raw"))
        .select(col("doc_id"), array_distinct(col("__raw")).as("sh"))
        // persisted: joined from both sides; without it the shingling
        // subtree runs twice (same reasoning as Dedup.nearDupPairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      val b = sh.select((col("doc_id") - 250).as("id1"), col("doc_id").as("id2"),
        col("sh").as("sh2"))
      val jac = a.join(b, Seq("id1"))
        .select(col("id1"), col("id2"), Dedup.jaccard(col("sh1"), col("sh2")).as("jaccard"))
      Dedup.materializeAndRelease(jac, sh)
    }),

    // ---- similarity search (embeddings table) ---------------------------
    "s01_brute_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),
    "s24_hard_negatives" -> ((s, dir) => {
      // contrastive-training data mining: the 5 nearest OTHER-label
      // vectors per query — near in embedding space, apart in truth.
      // The label exclusion is PER-QUERY (rides the join condition),
      // the dynamic-filter shape s21's static predicate can't express
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegativesTopK(emb.where(col("vec_id") >= 10),
        emb.where(col("vec_id") < 10), k = 5)
    }),
    "s22_knn_classify" -> ((s, dir) => {
      // k-NN weak labeling: majority label among the 5 nearest labeled
      // corpus vectors per query (exact cosine tier), count ties broken
      // by the smaller label — the classifier-bootstrap step that turns
      // a labeled seed pool into corpus-wide labels
      val emb = t(s, dir, "embeddings")
      Similarity.knnClassify(emb.where(col("vec_id") >= 10),
        emb.where(col("vec_id") < 10), k = 5)
    }),
    "s26_hard_negatives_ivf" -> ((s, dir) => {
      // s24's mining at the ANN tier: IVF candidate generation (frozen
      // centroid literals, 4-of-16 cells per query) with the cross-label
      // exclusion STILL riding the join condition — the dynamic-filter
      // shape survives the tier switch; for labeled pools too large to
      // scan per query. Recall vs the exact tier is s28's gauge
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegativesTopKIvf(emb.where(col("vec_id") >= 10),
        emb.where(col("vec_id") < 10), k = 5,
        ivfCentroids(s, dir, 16), nprobe = 4)
    }),
    "s27_knn_classify_ivf" -> ((s, dir) => {
      // s22's weak labeling at the ANN tier: the same majority/tie vote
      // over IVF-generated candidates instead of the exact scan
      val emb = t(s, dir, "embeddings")
      Similarity.knnClassifyIvf(emb.where(col("vec_id") >= 10),
        emb.where(col("vec_id") < 10), k = 5,
        ivfCentroids(s, dir, 16), nprobe = 4)
    }),
    "s28_hard_negatives_recall" -> ((s, dir) => {
      // the ANN-tier acceptance gauge (the d63/s17 discipline): per-query
      // recall of the IVF hard-negative miner against the exact tier at
      // the chosen (nlist=16, nprobe=4) operating point — integer hit
      // counts off one equi-join, ONE division per query
      val emb = t(s, dir, "embeddings")
      val pool = emb.where(col("vec_id") >= 10)
      val q = emb.where(col("vec_id") < 10)
      Similarity.annRecallAtK(
        Similarity.hardNegativesTopKIvf(pool, q, k = 5,
          ivfCentroids(s, dir, 16), nprobe = 4),
        Similarity.hardNegativesTopK(pool, q, k = 5))
    }),
    "s23_phrase_search" -> ((s, dir) =>
      // exact consecutive-token phrase match — what a bag-of-words
      // index structurally can't answer: positional postings pruned to
      // the phrase vocabulary at the scan, one adjacency equi-join per
      // later word, overlapping occurrences counted individually
      TextAnalysis.phraseSearch(t(s, dir, "documents"), "doc_id", "text",
        Seq("fast", "table"))),
    "s25_phrase_indexed" -> ((s, dir) => {
      // s23's serving path: the corpus tokenizes ONCE into a persisted
      // positional-postings snapshot (root table partitioned by term
      // bucket) and the phrase probe reads only the directories its
      // words hash into — same adjacency-join core, so the oracle is
      // s23's formulation verbatim
      val store = tmpQueryDir("s25-posidx").toString + "/layout"
      graft.llm.TextAnalysis.writePositionalSnapshot(
        t(s, dir, "documents"), store, termBuckets = 16)
      graft.llm.TextAnalysis.phraseSearchIndexed(s, store,
        Seq("fast", "table"))
    }),
    "m61_positional_append" -> ((s, dir) => {
      // incremental growth of the positional index: build over 2/3 of
      // the corpus, append the remaining third through the generic
      // manifest appender (only the batch vocabulary's term buckets
      // rewrite; cold directories inherit by reference), then probe —
      // the oracle is the phrase search over the FULL corpus: the
      // append must reproduce exactly what a from-scratch build serves
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m61-posidx").toString + "/layout"
      graft.llm.TextAnalysis.writePositionalSnapshot(
        docs.where(col("doc_id") % 3 =!= 1), store, termBuckets = 16)
      graft.llm.TextAnalysis.appendPositionalSnapshot(s, store,
        docs.where(col("doc_id") % 3 === 1))
      graft.llm.TextAnalysis.phraseSearchIndexed(s, store,
        Seq("fast", "table"))
    }),
    "m62_positional_takedown" -> ((s, dir) => {
      // the shrink half: revoke a doc slice from the positional index
      // through the generic layout walk (only directories with hits
      // rewrite; doc_id resolves via the walker's default id columns),
      // then probe — the oracle is the phrase search over the surviving
      // corpus: revoked docs must vanish from every posting slice
      val docs = t(s, dir, "documents")
      val store = tmpQueryDir("m62-posidx").toString + "/layout"
      graft.llm.TextAnalysis.writePositionalSnapshot(docs, store,
        termBuckets = 16)
      graft.llm.Takedown.propagateLayoutSnapshot(s, store,
        docs.where(col("doc_id") % 5 === 3).select(col("doc_id")),
        "doc_id")
      graft.llm.TextAnalysis.phraseSearchIndexed(s, store,
        Seq("fast", "table"))
    }),
    "m65_cc_label_takedown" -> ((s, dir) => {
      // RTBF through the labeling store: a doc slice is revoked and the
      // affected clusters REBUILD from the surviving pair graph (the
      // exact tier — a revoked bridge doc genuinely splits its cluster,
      // which only the edges can tell); untouched clusters' buckets
      // carry by manifest reference. The oracle labels the surviving
      // nodes by the closure over pairs with no revoked endpoint —
      // isolated survivors stay as singletons, revoked ids vanish
      val pairs = ndPairsFixture(s, dir)
      val store = tmpQueryDir("m65-ccstore").toString + "/labels"
      Dedup.writeCcLabelStore(Dedup.connectedComponents(pairs), store,
        clusterBuckets = 16)
      val revoked = t(s, dir, "documents")
        .where(col("doc_id") % 7 === 3).select(col("doc_id"))
      Dedup.takedownCcLabelStore(s, store, revoked, "doc_id",
        pairs = Some(pairs))
      Dedup.readCcLabelStore(s, store)
    }),
    "m67_cc_edge_sidecar" -> ((s, dir) => {
      // RTBF with NO caller-supplied pair graph: the persisted edge
      // SIDECAR makes the exact tier self-sufficient (r14 finding #3 —
      // without it, a store whose detector output wasn't kept silently
      // serves the conservative over-grouping forever). Bootstrap from
      // 2/3 of the pairs, fold the remaining 1/3 through the SAME
      // append (labels + sidecar in lockstep), then take down a doc
      // slice passing pairs = None: the affected clusters' edges read
      // partition-pruned from the sidecar and clusters genuinely SPLIT
      // where a revoked bridge doc was the only link. The oracle is
      // m65's formulation — caller-graph and sidecar tiers must be
      // indistinguishable in the served labels
      val pairs = ndPairsFixture(s, dir)
      val isNew = pmod(xxhash64(col("id1"), col("id2")), lit(3)) === 0
      val root = tmpQueryDir("m67-ccstore").toString
      val store = root + "/labels"
      val edges = root + "/edges"
      val hist = pairs.where(!isNew)
      val labels0 = Dedup.connectedComponents(hist).localCheckpoint()
      Dedup.writeCcLabelStore(labels0, store, clusterBuckets = 16)
      Dedup.writeCcEdgeStore(labels0, hist, edges, clusterBuckets = 16)
      Dedup.appendCcEdgesToLabelStore(s, store, pairs.where(isNew),
        edgesPath = Some(edges))
      val revoked = t(s, dir, "documents")
        .where(col("doc_id") % 7 === 3).select(col("doc_id"))
      Dedup.takedownCcLabelStore(s, store, revoked, "doc_id",
        pairs = None, edgesPath = Some(edges))
      Dedup.readCcLabelStore(s, store)
    }),
    "m64_stream_cc_maintenance" -> ((s, dir) => {
      // m63's STREAMING twin: the verified near-dup pair stream folds
      // into the persisted labeling store one micro-batch at a time
      // (maxFilesPerTrigger=1) — batch 1 bootstraps the store (CC of
      // the batch alone), later batches fold by label contraction, each
      // landing as a LayoutStore version that rewrites only merged
      // clusters' buckets. The oracle is the from-scratch closure over
      // ALL pairs: arrival order must not matter
      val pairs = ndPairsFixture(s, dir)
      val src = tmpQueryDir("m64-src")
      // an empty slice would stream an empty micro-batch, which the
      // fold deliberately skips (no hollow versions) — write only the
      // non-empty slices and gate on THAT count (ADVICE r14: the fixed
      // `>= 3` was a data-dependent flake)
      val nonEmpty = (0 until 3).count { b =>
        val slice = pairs
          .where(pmod(xxhash64(col("id1"), col("id2")), lit(3)) === b)
        val any = !slice.isEmpty
        if (any)
          slice.coalesce(1).write.mode("append").parquet(src.toString)
        any
      }
      require(nonEmpty >= 1, "the pair graph must be non-empty")
      val state = tmpQueryDir("m64-state").toString + "/labels"
      val ckpt = tmpQueryDir("m64-ckpt").toString
      Incremental.ccLabelMaintenanceAvailableNow(s, src.toString,
          pairs.schema, "parquet",
          df => df.select(col("id1"), col("id2")),
          idCol1 = "id1", idCol2 = "id2",
          statePath = state, checkpointDir = ckpt,
          maxFilesPerTrigger = Some(1), clusterBuckets = 16)
        .awaitTermination()
      val conf = s.sparkContext.hadoopConfiguration
      require(graft.llm.LayoutStore.versions(conf, state).size >= nonEmpty,
        "the label fold must have run once per non-empty micro-batch")
      Dedup.readCcLabelStore(s, state)
    }),
    "m63_cc_label_store" -> ((s, dir) => {
      // d80's incremental fold through the PERSISTED labeling store: the
      // historical 2/3 of the near-dup pair graph labels once into a
      // cluster-bucketed LayoutStore snapshot, the 1/3 batch folds in as
      // a new version that physically rewrites only the merged clusters'
      // buckets (cold buckets carry by manifest reference). The oracle is
      // the from-scratch closure over ALL pairs — served-store equality
      // with a rebuild is the maintenance invariant, stated through the
      // real read path
      val pairs = ndPairsFixture(s, dir)
      val isNew = pmod(xxhash64(col("id1"), col("id2")), lit(3)) === 0
      val store = tmpQueryDir("m63-ccstore").toString + "/labels"
      Dedup.writeCcLabelStore(
        Dedup.connectedComponents(pairs.where(!isNew)), store,
        clusterBuckets = 16)
      Dedup.appendCcEdgesToLabelStore(s, store, pairs.where(isNew))
      Dedup.readCcLabelStore(s, store)
    }),
    "s20_mmr_rerank" -> ((s, dir) => {
      // MMR diversified rerank: greedy λ=2/3 selection from the top-50
      // integer-dot candidates of query vec 0 — everything integer
      // (2·rel − max selected-sim), so selection and tie-breaks are
      // bit-exact; the oracle replays the greedy loop as chained CTEs
      val emb = t(s, dir, "embeddings")
      Similarity.mmrRerankQuantized(emb, emb.where(col("vec_id") === 0),
        pool = 50, take = 8)
    }),
    "s30_ivf_trained" -> ((s, dir) => {
      // the composition gate: s29's trained integer codebook feeds an
      // all-integer IVF probe over the int8 tier — cell assignment and
      // probe ranking on exact long distances, s07's quantized cosine
      // for scoring. The oracle re-derives the TRAINER itself in SQL
      // (no centroid literal crosses from the engine), so train →
      // assign → probe is cross-engine-gated end to end
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.fitKmeansInt8(emb, k = 4, iters = 2)
      Similarity.ivfTopKQuantizedTrained(emb,
        emb.filter(col("vec_id") < 10), k = 5, cents, nprobe = 2)
    }),
    "m68_ivf_trained_store" -> ((s, dir) => {
      // the PERSISTED trained-int8 tier (r14 gap: m20/m26/m44 ride
      // float MLlib centroids no oracle can re-derive): s29's codebook
      // freezes INSIDE the snapshot as a marker, the corpus lands
      // quantized + partitioned by trained cell, and the probe reads
      // the codebook back from the store and partition-prunes to its
      // probed cells. The oracle re-derives the trainer in SQL —
      // nothing crosses from the engine
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.fitKmeansInt8(emb, k = 4, iters = 2)
      val store = tmpQueryDir("m68-ivf8").toString + "/layout"
      Similarity.writeIvfInt8TrainedLayout(emb, cents, store)
      Similarity.ivfTopKQuantizedSnapshot(s, store,
        emb.filter(col("vec_id") < 10), k = 5, nprobe = 2)
    }),
    "m69_ivf_trained_append" -> ((s, dir) => {
      // frozen-codebook growth on the gateable tier (m44's invariant):
      // v1 trains on and lays out the EVEN half; the odd half appends
      // with the codebook read from the SNAPSHOT — no caller literals
      // exist to get wrong — landing only its touched cells. The
      // oracle re-derives the trainer over the even half alone and
      // probes the full corpus with it
      val emb = t(s, dir, "embeddings")
      val even = emb.where(col("vec_id") % 2 === 0)
      val cents = Similarity.fitKmeansInt8(even, k = 4, iters = 2)
      val store = tmpQueryDir("m69-ivf8").toString + "/layout"
      Similarity.writeIvfInt8TrainedLayout(even, cents, store)
      graft.llm.Ingest.appendIvfInt8TrainedSnapshot(s, store,
        emb.where(col("vec_id") % 2 === 1))
      Similarity.ivfTopKQuantizedSnapshot(s, store,
        emb.filter(col("vec_id") < 10), k = 5, nprobe = 2)
    }),
    "s29_kmeans_train" -> ((s, dir) =>
      // deterministic FIXED-POINT k-means over int8-quantized vectors:
      // k=4 centroids seeded by the smallest md5(id) — a pure function
      // of the data, no RNG — then 2 Lloyd rounds in exact integer
      // arithmetic (long squared-L2 distances, floor-div means, ties to
      // the smaller centroid index), final assignment gated. Float
      // k-means is shuffle-order-dependent and can't be cross-engine
      // gated; this oracle UNROLLS both rounds as CTEs and must match
      // bit-for-bit — the d79 discipline applied to the ANN trainer
      Similarity.kmeansAssignInt8(t(s, dir, "embeddings"), k = 4,
        iters = 2)),
    "s07_quantized_topk" -> ((s, dir) => {
      // the int8 tier: same brute-force shape as s01 but every vector in
      // flight is a tinyint array (4x fewer bytes); scores are the
      // scale-free quantized cosine — integer sums, bit-exact in SQL
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopKQuantized(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),
    "s02_ann_topk" -> ((s, dir) => {
      // multi-probe SRP (Hamming <= 1): ~(planes+1)/2^planes of the
      // corpus per query; planes DERIVED from corpus size (see srpPlanes)
      // so occupancy stays at target as the corpus grows
      val emb = t(s, dir, "embeddings")
      Similarity.annTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        dim = 64, planes = srpPlanes(s, dir), probeRadius = 1)
    }),
    "s21_filtered_ann" -> ((s, dir) => {
      // FILTERED vector search — ANN under a metadata predicate (the
      // "English docs only" / "this tenant only" serving shape): the
      // filter applies BEFORE cell assignment, so against the m20
      // persisted layout it rides the same pruned scan as the partition
      // filter instead of post-filtering a top-k that may come back empty
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKLiteral(emb.where(col("label") % 4 === 3),
        emb.filter(col("vec_id") < 10), k = 5,
        ivfCentroids(s, dir, 16), nprobe = 4)
    }),
    "s04_ivf_topk" -> ((s, dir) => {
      // IVF ANN: map-side argmin cell assignment over the fitted literal
      // centroids; queries probe their 4 nearest of 16 cells (~25% of the
      // corpus scanned per query at this operating point)
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKLiteral(emb, emb.filter(col("vec_id") < 10), k = 5,
        ivfCentroids(s, dir, 16), nprobe = 4)
    }),
    "s08_pq_adc_topk" -> ((s, dir) => {
      // product quantization + asymmetric distance: 4 subspaces x 8
      // centroids over dim 64 — corpus rows become 4 small codes, a
      // query's distance is 4 table lookups summed (no per-pair vector
      // math); codebooks fit here, frozen, mirrored into the oracle as
      // literals (the s04 pattern)
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        pqCodebooks(s, dir, m = 4, ksub = 8))
    }),
    "s09_bm25_topk" -> ((s, dir) => {
      // BM25 retrieval with the house log-free rational idf: 3 probe
      // queries derived from the corpus itself (first 4 tokens of docs
      // 0-2 — a more-like-this harvest); the float term-sum is a
      // term-sorted left fold, so both engines add in the same order
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      TextAnalysis.bm25TopK(docs, queries, "doc_id", "text",
        "query_id", "qtext", k = 5)
    }),
    "s14_rerank_retrieval" -> ((s, dir) => {
      // two-stage retrieval: BM25 top-20 lexical candidates (recall),
      // exact-cosine re-rank to top-5 (precision) — the candidate
      // frame is tiny so no crossJoin forms and the corpus joins once
      // on corpus_id; vec_id aligns with doc_id in the testdata
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      val cands = TextAnalysis.bm25TopK(docs, queries, "doc_id", "text",
          "query_id", "qtext", k = 20)
        .select(col("query_id"), col("doc_id").as("corpus_id"))
      Similarity.rerankTopK(cands, emb,
        emb.where(col("vec_id") < 3), k = 5)
    }),
    "s19_bow_classifier" -> ((s, dir) => {
      // the fastText/CCNet-shaped quality classifier: LR over HASHED
      // bag-of-words (64 feature-hash buckets — fixed feature space, no
      // vocabulary dict) fit distributed on the lang=en weak label,
      // coefficients frozen as literals; scoring is ONE aggregate-HOF
      // fold per doc in the scan stage (margin is linear in bucket
      // counts, so the count vector never materializes)
      val (w, b) = bowModel(s, dir)
      graft.llm.Filters.hashedBowMargin(t(s, dir, "documents"),
        "doc_id", "text", w, b)
    }),
    "s18_ivf_tuning" -> ((s, dir) => {
      // the recall-vs-cost tuning curve an IVF deployment reads before
      // picking nprobe: mean recall@10 against exact ground truth at
      // nprobe 1, 2 and 4 of 16 cells — each point is the s17 gauge
      // over an s04-family probe; integer hit totals, ONE division per
      // point. Recall must rise with nprobe (more cells scanned)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      val cents = ivfCentroids(s, dir, 16)
      Seq(1, 2, 4).map { np =>
        Similarity.annRecallAtK(
            Similarity.ivfTopKLiteral(emb, q, k = 10, cents, nprobe = np),
            exact)
          .agg(sum(col("n_hit")).as("hits"),
            sum(col("n_exact")).as("truths"))
          .select(lit(np).as("nprobe"), col("hits"), col("truths"),
            (col("hits").cast("double") / col("truths").cast("double"))
              .as("recall"))
      }.reduce(_.unionByName(_))
    }),
    "s17_ann_recall" -> ((s, dir) => {
      // the ANN acceptance gauge: per-query recall@10 of the SRP
      // multi-probe path against exact brute-force ground truth —
      // integer hit counts off one equi-join, ONE division per query
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      val approx = Similarity.annTopK(emb, q, k = 10,
        dim = 64, planes = srpPlanes(s, dir), probeRadius = 1)
      Similarity.annRecallAtK(approx, exact)
    }),
    "s16_truncated_rerank" -> ((s, dir) => {
      // Matryoshka two-stage: 16-of-64-dim cosine recalls 20 candidates
      // per query (4x narrower arrays in the scan), exact full-dim
      // cosine re-ranks to top-5 over queries x 20 rows only
      val emb = t(s, dir, "embeddings")
      Similarity.truncatedRerankTopK(emb, emb.filter(col("vec_id") < 10),
        k = 5, prefixDims = 16, candidates = 20)
    }),
    "s15_rrf_fusion" -> ((s, dir) => {
      // hybrid retrieval: BM25 top-10 lexical list + exact-cosine top-10
      // dense list, combined by reciprocal-rank fusion (1/(60+rank) —
      // ranks fuse where raw score scales can't). Corpus-independent:
      // both inputs are (queries x 10) rows; the fused window is tiny
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      val lex = TextAnalysis.bm25TopK(docs, queries, "doc_id", "text",
          "query_id", "qtext", k = 10)
        .select(col("query_id"), col("doc_id").as("corpus_id"), col("rank"))
      val sem = Similarity.bruteForceTopK(emb,
        emb.where(col("vec_id") < 3), k = 10)
      Similarity.rrfFuse(lex, sem, k = 5)
    }),
    "m25_bm25_versioned" -> ((s, dir) => {
      // index refresh retires the stale snapshot BY CONSTRUCTION: v1 is
      // built from half the corpus, v2 from all of it, and the probe
      // pins the newest — any v1 leakage (wrong df/N/Σdl) would shift
      // scores and fail the full-corpus oracle hash
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      val store = tmpQueryDir("m25-bm25").toString + "/store"
      TextAnalysis.writeBm25Snapshot(docs.where(col("doc_id") % 2 === 0),
        store, termBuckets = 32)
      TextAnalysis.writeBm25Snapshot(docs, store, termBuckets = 32)
      TextAnalysis.bm25TopKIndexedLatest(s, store, queries,
        "query_id", "qtext", k = 5)
    }),
    "m28_bucketed_join" -> ((s, dir) => {
      // the co-located-join layout: both sides bucketed by the join key
      // (16 matching buckets, key-sorted files), so the recurring
      // fact-x-dim join runs SHUFFLE-FREE — zero Exchange with broadcast
      // off, plan-pinned in the spec; the q03 aggregation on top proves
      // the layout content-preserving under q03's own oracle shape
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      graft.sinks.Sinks.writeBucketed(
        o.select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")),
        "m28_orders_b", Seq("o_custkey"), numBuckets = 16,
        sortCols = Seq("o_custkey"))
      graft.sinks.Sinks.writeBucketed(
        c.select(col("c_custkey"), col("c_mktsegment")),
        "m28_customer_b", Seq("c_custkey"), numBuckets = 16,
        sortCols = Seq("c_custkey"))
      val bo = s.table("m28_orders_b")
      val bc = s.table("m28_customer_b")
      bo.join(bc, bo("o_custkey") === bc("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          decimalSum(col("o_totalprice"), 2).as("total_price"))
    }),
    "m27_layout_compacted" -> ((s, dir) => {
      // small-file maintenance proven content-preserving: build the BM25
      // snapshot FRAGMENTED (a salted repartition writes many files per
      // tbucket dir — the accretion shape a long-lived index reaches),
      // compact through the generic LayoutStore walk (one file per
      // partition dir, new immutable version), probe the pinned-newest —
      // any row lost/duplicated in the rewrite fails the s09 oracle hash
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      val store = tmpQueryDir("m27-compact").toString + "/store"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store) { tmp =>
        TextAnalysis.writeBm25Layout(docs, tmp, termBuckets = 32)
        // fragment the postings in place: rewrite with random
        // parallelism so every bucket dir holds several small files
        val frag = s.read.parquet(s"$tmp/postings").repartition(8)
        frag.write.mode("overwrite").partitionBy("tbucket")
          .parquet(s"$tmp/postings_frag")
        val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/postings"), true)
        fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/postings_frag"),
          new org.apache.hadoop.fs.Path(s"$tmp/postings"))
      }
      graft.llm.LayoutStore.compactSnapshot(s, store)
      TextAnalysis.bm25TopKIndexedLatest(s, store, queries,
        "query_id", "qtext", k = 5)
    }),
    "s13_quality_classifier" -> ((s, dir) => {
      // learned quality filter: LR fit distributed over the funnel's
      // numeric features (weak label: lang=en), coefficients FROZEN as
      // literals (the fitCentroids contract), scoring a pure map-side
      // margin fold — no sigmoid, margins are monotone in probability
      val (w, b) = qualityModel(s, dir)
      graft.llm.Filters.qualityMargin(t(s, dir, "documents"),
        "doc_id", "text", w, b)
    }),
    "s12_bm25_indexed" -> ((s, dir) => {
      // s09's retrieval through the PERSISTED inverted-index layout:
      // build writeBm25Layout once (the 100TB corpus tokenizes once),
      // then probe reads only the partition dirs the query terms hash
      // into — same oracle as s09 because the two paths are bit-exact
      // by construction (shared score tree + term-sorted fold)
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(lower(col("text"))), 1, 4),
            " ").as("qtext"))
      val path = tmpQueryDir("s12-bm25").toString + "/layout"
      TextAnalysis.writeBm25Layout(docs, path, "doc_id", "text",
        termBuckets = 32)
      TextAnalysis.bm25TopKIndexed(s, path, queries, "query_id", "qtext",
        k = 5)
    }),
    "s05_embedding_neardups" -> ((s, dir) =>
      // near-dup pair surface under the oracle: multi-probe bucketed
      // self-join, pairs within Hamming<=1 buckets scored by cosine;
      // plane count derived from corpus size (srpPlanes)
      Similarity.embeddingNearDups(t(s, dir, "embeddings"),
        threshold = 0.40, dim = 64, planes = srpPlanes(s, dir), probeRadius = 1)),
    "s06_embedding_clusters" -> ((s, dir) =>
      // pairs -> connected components -> keeper decision over embeddings:
      // the same dedup-decision step as d09, on the vector signal
      Dedup.connectedComponents(
        Similarity.embeddingNearDups(t(s, dir, "embeddings"),
          threshold = 0.40, dim = 64, planes = srpPlanes(s, dir), probeRadius = 1))
        .withColumn("keep", col("id") === col("cluster"))),
    "s10_semdedup" -> ((s, dir) =>
      // SemDeDup: semantic dedup scoped to the SAME frozen 16-centroid
      // cells the IVF family uses — within-cell cos>=0.40 neighborhoods
      // keep the example farthest from the centroid (ties min id), via
      // the deterministic dominated rule (no iteration, no RNG)
      Similarity.semdedupPrune(t(s, dir, "embeddings"),
        ivfCentroids(s, dir, 16), threshold = 0.40)),
    "s03_srp_buckets" -> ((s, dir) =>
      // LSH bucket histogram — certifies srpBucket itself (and would catch
      // a degenerate-weights regression as a 2-bucket histogram)
      t(s, dir, "embeddings")
        .select(Similarity.srpBucket(col("embedding"), 64, 8).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))),
    "m19_srp_layout" -> ((s, dir) => {
      // persisted-ANN round-trip under the oracle: the corpus is WRITTEN
      // partitioned by SRP bucket (writeSrpLayout), then ONE query's
      // radius-1 probe read prunes to planes+1 of the 2^planes partition
      // dirs at the file-listing level (readSrpProbes) and brute-force
      // scoring over that slice reproduces bucketed ANN for the query —
      // the persisted twin of s02's in-flight pruning
      val emb = t(s, dir, "embeddings")
      val planes = srpLayoutPlanes(s, dir)
      val path = tmpQueryDir("m19-srp").toString + "/layout"
      Similarity.writeSrpLayout(emb, dim = 64, planes = planes, path)
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val probed = Similarity.readSrpProbes(s, path, qVec, planes,
        probeRadius = 1, dim = 64)
      Similarity.bruteForceTopK(probed, emb.where(col("vec_id") === 0), k = 5)
    }),
    "m21_srp_quantized_layout" -> ((s, dir) => {
      // m19's layout round-trip at int8 storage: bucket from the float
      // vectors, persist only quantized codes partitioned by bucket,
      // probe-read query 0's radius-1 buckets, score with the integer
      // cosine — the fused partition-pruning + 4x-bytes 100TB layout
      val emb = t(s, dir, "embeddings")
      val planes = srpLayoutPlanes(s, dir)
      val path = tmpQueryDir("m21-srpq").toString + "/layout"
      Similarity.writeSrpQuantizedLayout(emb, dim = 64, planes = planes, path)
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val probed = Similarity.readSrpQuantizedProbes(s, path, qVec, planes,
        probeRadius = 1, dim = 64)
      Similarity.bruteForceTopKOnQuantized(probed,
        Similarity.quantizeForStorage(emb.where(col("vec_id") === 0)), k = 5)
    }),
    "m22_ivfpq_layout" -> ((s, dir) => {
      // IVF-PQ: the composed billion-scale layout — the corpus persists
      // as (id, cell, 4 code ints), NO raw vectors on disk; IVF
      // partition pruning picks WHICH cell dirs scan, PQ codes cut the
      // BYTES per scanned row, ADC scores the survivors from query-side
      // lookup tables
      val emb = t(s, dir, "embeddings")
      val cents = ivfCentroids(s, dir, 16)
      val cbs = pqCodebooks(s, dir, m = 4, ksub = 8)
      val path = tmpQueryDir("m22-ivfpq").toString + "/layout"
      val coded = Similarity.withPqCodes(emb.select(col("vec_id"),
        col("embedding")), cbs, "embedding")
      Similarity.assignCells(coded, cents, "embedding").drop("embedding")
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val cells = cents.zipWithIndex.map { case (c, i) =>
        var acc = 0.0
        var j = 0
        while (j < qVec.length) {
          val d = qVec(j) - c(j); acc += d * d; j += 1
        }
        (acc, i)
      }.sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSeq
      val probed = Similarity.readIvfCells(s, path, cells)
      Similarity.pqTopKOnCodes(probed, emb.where(col("vec_id") === 0),
        k = 5, cbs)
    }),
    "m26_ivf_versioned" -> ((s, dir) => {
      // m20 through the generic LayoutStore: v1 holds only half the
      // vectors, v2 all of them; the probe pins the newest — a stale
      // read would be missing half of every probed cell's rows
      val emb = t(s, dir, "embeddings")
      val cents = ivfCentroids(s, dir, 16)
      val store = tmpQueryDir("m26-ivf").toString + "/store"
      val conf = s.sparkContext.hadoopConfiguration
      graft.llm.LayoutStore.writeSnapshot(conf, store)(tmp =>
        Similarity.writeIvfLayout(emb.where(col("vec_id") % 2 === 0),
          cents, tmp))
      graft.llm.LayoutStore.writeSnapshot(conf, store)(tmp =>
        Similarity.writeIvfLayout(emb, cents, tmp))
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val cells = cents.zipWithIndex.map { case (c, i) =>
        var acc = 0.0
        var j = 0
        while (j < qVec.length) {
          val d = qVec(j) - c(j); acc += d * d; j += 1
        }
        (acc, i)
      }.sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSeq
      val probed = Similarity.readIvfCellsSnapshot(s, store, cells)
      Similarity.bruteForceTopK(probed, emb.where(col("vec_id") === 0), k = 5)
    }),
    "m20_ivf_layout" -> ((s, dir) => {
      // IVF twin of m19: corpus written PARTITIONED BY CELL
      // (writeIvfLayout), query 0's 4 nearest of 16 cells ranked
      // driver-side from the same frozen centroid literals (squared-L2,
      // first-match argmin tie-break asc cell — s04's ordering), probe
      // cells read partition-pruned (readIvfCells), brute-force scored
      val emb = t(s, dir, "embeddings")
      val cents = ivfCentroids(s, dir, 16)
      val path = tmpQueryDir("m20-ivf").toString + "/layout"
      Similarity.writeIvfLayout(emb, cents, path)
      val qVec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val cells = cents.zipWithIndex.map { case (c, i) =>
        var acc = 0.0
        var j = 0
        while (j < qVec.length) {
          val d = qVec(j) - c(j); acc += d * d; j += 1
        }
        (acc, i)
      }.sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSeq
      val probed = Similarity.readIvfCells(s, path, cells)
      Similarity.bruteForceTopK(probed, emb.where(col("vec_id") === 0), k = 5)
    }),

    // ---- multimodal kernels under the oracle ----------------------------
    "m15_image_features" -> ((s, dir) =>
      // REAL image decode gated by the oracle: deterministic fixture PNGs
      // -> javax.imageio decode -> dims / mean luma / 8x8 average-hash;
      // the oracle carries the hand-computed features as literals (the
      // kernels are deterministic, so this is a true cross-check, not an
      // echo). mean_luma rounds to 3dp so fp accumulation order can't
      // perturb the value hash.
      Multimodal.extractImageFeatures(s,
          MediaFixtures.media(s).where(col("media_type") === "image"))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_luma"), 3).as("mean_luma"), col("phash"))),
    "m30_phash_neardups" -> ((s, dir) =>
      // perceptual image dedup: decode -> 8x8 average-hash -> Hamming-
      // band pairing (the d05 machinery on the image fingerprint). The
      // fixture set carries a hand-constructed near-dup of image 1 (one
      // 8x8 cell flipped -> Hamming EXACTLY 1); every other pair is
      // >= 32 bits apart, so the oracle is the single derived pair
      Multimodal.phashNearDupPairs(
        Multimodal.extractImageFeatures(s,
          MediaFixtures.mediaWithVariants(s)
            .where(col("media_type") === "image")).toDF(),
        maxHamming = 4)),
    "m16_audio_features" -> ((s, dir) =>
      // REAL audio decode gated by the oracle: constant-tone WAV ->
      // javax.sound decode -> frame-count duration, exact 0.5 mean
      // amplitude (power-of-two samples: no fp error), PCM md5.
      Multimodal.extractAudioFeatures(s, MediaFixtures.media(s))
        .toDF()
        .select(col("media_id"), col("duration_ms"), col("sample_rate"),
          col("channels"), col("mean_amplitude"), col("fingerprint"))),
    "m37_video_scenes" -> ((s, dir) =>
      // shot-cut detection over the m17 frames: boundary where the
      // consecutive-frame phash Hamming distance exceeds 8 — the fixture
      // AVI's four frames all cut (three 32-bit flips), so four
      // single-frame scenes; the oracle replays the window/cumsum
      // algorithm in DuckDB over the same hand-derived frame literals
      Multimodal.sceneSegments(
        Multimodal.extractVideoFrames(s, MediaFixtures.media(s),
          everyMs = 100L).toDF().where(col("error").isNull),
        maxHamming = 8)),
    "m17_video_frames" -> ((s, dir) =>
      // REAL video decode gated by the oracle: a deterministic uncompressed
      // AVI (4 DIB frames at 10 fps) -> container parse -> per-sampled-frame
      // decode -> the image kernel's luma/average-hash. Cell-exact frames
      // make every feature hand-computable; integer-rational timestamps are
      // exact. (MJPEG decode is unit-tested — JPEG is lossy, so its values
      // aren't literal-stable across JVMs; DIB's are.)
      Multimodal.extractVideoFrames(s, MediaFixtures.media(s), everyMs = 100L)
        .toDF()
        .select(col("media_id"), col("frame_index"), col("frame_ts_ms"),
          col("width"), col("height"),
          round(col("mean_luma"), 3).as("mean_luma"), col("phash"))),

    "q16_asof_join" -> ((s, dir) => {
      // As-of join — the point-in-time lookup Spark lacks as an operator
      // (graft.operators.AsofJoin: tagged union + carry-forward window,
      // one co-partitioned shuffle per side, |left| output rows). Each
      // event is joined to the user's latest order at-or-before the event
      // time; the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so the
      // semantics (inclusive <=, latest-wins, null when no prior order)
      // are certified against an independent implementation.
      val ev0 = t(s, dir, "events")
      val ev = ev0.select(col("event_id"), col("user_id"),
        timestamp_micros(tsMicros(ev0)).as("ets"))
      // one right row per (key, time): equal-timestamp duplicates have no
      // defined "latest" (mirrored in the oracle's pre-aggregate)
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("asof_orderkey"))
        .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ots"),
          col("asof_orderkey"))
      graft.operators.AsofJoin.asofJoin(ev, ord, "user_id", "o_custkey",
          "ets", "ots", Seq("asof_orderkey"))
        .select(col("event_id"), col("user_id"), col("asof_orderkey"))
    }),

    "q17_asof_tolerance" -> ((s, dir) => {
      // The two as-of knobs users reach for first, under the oracle:
      // `tolerance` (match discarded when older than the lookback — pandas
      // merge_asof semantics, inclusive bound) and `strict` (right time
      // strictly < left time). Both run the same merge-union plan as q16;
      // the oracle recomputes each via DuckDB scalar subqueries (an
      // independent latest-within-bound formulation).
      val ev0 = t(s, dir, "events")
      val ev = ev0.select(col("event_id"), col("user_id"),
        timestamp_micros(tsMicros(ev0)).as("ets"))
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("asof_tol"))
        .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ots"),
          col("asof_tol"))
      val withTol = graft.operators.AsofJoin.asofJoin(ev, ord,
        "user_id", "o_custkey", "ets", "ots", Seq("asof_tol"),
        tolerance = Some(expr("INTERVAL 30 DAYS")))
      graft.operators.AsofJoin.asofJoin(withTol,
          ord.withColumnRenamed("asof_tol", "asof_strict"),
          "user_id", "o_custkey", "ets", "ots", Seq("asof_strict"),
          strict = true)
        .select(col("event_id"), col("user_id"),
          col("asof_tol"), col("asof_strict"))
    }),

    "q18_range_join" -> ((s, dir) => {
      // Point-in-interval range join via bin-key manufacture: lineitems
      // shipped within 7 days of a top-value order's date. The naive
      // `ON lo <= p AND p <= hi` plans a nested-loop; the operator turns
      // it into a hash equi-join on the covering bin (AQE-skew-safe at
      // scale) with the exact bound check as a post-filter.
      val week = 7L * 24 * 3600 * 1000000
      val intervals = t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey").as("interval_key"),
          // NTZ -> timestamp under the UTC session zone: epoch micros
          // match DuckDB's epoch_us over the same naive values
          unix_micros(col("o_orderdate").cast("timestamp")).as("lo"))
        .withColumn("hi", col("lo") + week)
      val points = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      graft.operators.RangeJoin.pointInInterval(points, intervals,
          "ship_us", "lo", "hi", binWidth = week)
        .select(col("interval_key"), col("l_orderkey"),
          col("l_linenumber"), col("ship_us"))
    }),

    "q23_small_quantity" -> ((s, dir) => {
      // the TPC-H Q17 plan shape: a correlated SCALAR AGGREGATE subquery
      // (per-part average) filtering the fact table, decorrelated into a
      // grouped aggregate + equi-join — the third classic decorrelation
      // pattern after q21's EXISTS pair. Exactness: avg = exact integer
      // sum / exact count, then ONE division and ONE multiply — the same
      // two IEEE ops in both engines on identical inputs
      val l = t(s, dir, "lineitem")
      val avgs = l.groupBy(col("l_partkey").as("pk"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      l.join(avgs, col("l_partkey") === col("pk"))
        .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_small"), sum(col("l_quantity")).as("qty"))
    }),
    "q22_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS with grouping_id — the aggregation shape
      // rollup (q12) and cube (q15) can't express: an arbitrary,
      // non-hierarchical set list ((rf, ls), (ls), ()) skipping the (rf)
      // level. SQL surface (the DataFrame API exposes only rollup/cube);
      // Catalyst plans it as the same Expand + partial aggregate
      val v = s"q22_lineitem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      t(s, dir, "lineitem").createOrReplaceTempView(v)
      s.sql(
        s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
           |  coalesce(l_linestatus, 'ALL') AS ls,
           |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           |  count(*) AS n, sum(l_quantity) AS qty
           |FROM $v
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           |  (l_linestatus), ())""".stripMargin)
    }),
    "q21_blame_supplier" -> ((s, dir) => {
      // the TPC-H Q21 plan shape: correlated EXISTS + NOT EXISTS over the
      // same fact table, decorrelated into one equi-key left-semi and one
      // left-anti self-join (both with the != residual) — the classic
      // optimizer stressor. "Late" = shipped > 60 days after the order
      // date; blame suppliers who were the ONLY late supplier in a
      // multi-supplier order
      val l = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") >
            expr("o_orderdate + INTERVAL 60 DAYS")).as("late"))
      val others = l.select(col("l_orderkey").as("o_key"),
        col("l_suppkey").as("o_supp"), col("late").as("o_late"))
      l.where(col("late"))
        .join(others,
          col("l_orderkey") === col("o_key") &&
            col("l_suppkey") =!= col("o_supp"), "left_semi")
        .join(others.where(col("o_late")),
          col("l_orderkey") === col("o_key") &&
            col("l_suppkey") =!= col("o_supp"), "left_anti")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey")).limit(25)
    }),
    "q20_interval_overlap" -> ((s, dir) => {
      // interval x interval overlap join (60-day windows around the top-30
      // order dates, split into two rank bands): same binned equi-join as
      // q18, each overlapping pair found exactly once in the bin holding
      // the overlap's start. Top-30 via TakeOrderedAndProject (scalable);
      // the rank window runs over those 30 rows only.
      val D = 60L * 24 * 3600 * 1000000
      val ranked = t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(30)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .select(col("o_orderkey"), col("rk"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("lo"))
      val a = ranked.where(col("rk") <= 15)
        .select(col("o_orderkey").as("a_key"), col("lo").as("a_lo"),
          (col("lo") + D).as("a_hi"))
      val b = ranked.where(col("rk") > 15 && col("rk") <= 30)
        .select(col("o_orderkey").as("b_key"), col("lo").as("b_lo"),
          (col("lo") + D).as("b_hi"))
      graft.operators.RangeJoin.intervalOverlap(a, b,
          "a_lo", "a_hi", "b_lo", "b_hi", binWidth = D)
        .select(col("a_key"), col("b_key"),
          (least(col("a_hi"), col("b_hi")) -
            greatest(col("a_lo"), col("b_lo"))).as("overlap_us"))
    }),

    "q19_quantiles" -> ((s, dir) =>
      // exact grouped quantiles (linear interpolation at p*(n-1), the
      // definition Spark's percentile and DuckDB's quantile_cont share);
      // integer-valued doubles interpolate to exactly-representable
      // quarters, so the oracle compare is bit-exact
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          count(lit(1)).as("n"))),

    "d13_token_stats" -> ((s, dir) =>
      // BPE-ish token accounting: alnum runs or single symbols via
      // regexp_extract_all (RE2-compatible pattern — no lookarounds — so
      // the DuckDB oracle runs the IDENTICAL regex). The per-doc stats a
      // tokenizer-budget pass computes before real BPE runs; map-side
      // only, no shuffle at any scale.
      t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("__lt"))
        .select(col("doc_id"), col("__lt"),
          regexp_extract_all(col("__lt"), lit(bpePattern), lit(0)).as("__bpe"))
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("__lt"))).cast("long").as("n_ws_tokens"),
          size(col("__bpe")).cast("long").as("n_bpe_tokens"),
          size(array_distinct(col("__bpe"))).cast("long").as("n_unique_bpe"),
          when(size(col("__bpe")) === 0, lit(null).cast("double"))
            .otherwise(length(col("__lt")).cast("double") /
              size(col("__bpe")).cast("double")).as("chars_per_token"))),

    "m18_stream_windowed" -> ((s, dir) => {
      // Watermarked event-time windowing END-TO-END under the oracle: the
      // events table streams through a file source (AvailableNow), a 1-day
      // tumbling count per event_type with a 2-day watermark lands in a
      // parquet sink in APPEND mode — so only windows the watermark has
      // closed (window_end <= max(ts) - 2 days) are emitted. That emission
      // rule IS the assertion: the DuckDB oracle recomputes the windows
      // with the same cutoff, so a watermark/no-data-batch regression
      // (e.g. final windows never flushed, or late windows leaking) breaks
      // the row set, not just a unit expectation.
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val src = tmpQueryDir("m18-src")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("events.parquet"))
      val out = tmpQueryDir("m18-sink").toString
      val ckpt = tmpQueryDir("m18-ckpt").toString
      val windowed = (df: org.apache.spark.sql.DataFrame) =>
        Incremental.windowedCounts(
          // exact integer micros under either ts encoding (tsMicros)
          df.withColumn("ets", timestamp_micros(tsMicros(df))),
          "ets", "2 days", "1 day", Seq("event_type"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"))
      Incremental.runAvailableNow(s, src.toString, schema, "parquet",
        windowed, out, ckpt,
        stateShufflePartitions = Some(8)).awaitTermination()
      s.read.parquet(out)
    }),

    // ---- orchestration spine end-to-end (Runner + SubDag + Fork) --------
    "m12_multi_pipeline" -> ((s, dir) => {
      // Two concurrent pipelines through the production spine: (1) events
      // validate -> Fork valid/error split -> SubDag two-phase commit
      // (valid parquet published by rename AFTER all executes succeed;
      // errors to the reference-schema error table), (2) orders summary.
      // Runner runs them in parallel FAIR pools; RunState records history.
      // The returned aggregates read back BOTH sinks' published outputs.
      import graft.core.RunState
      import graft.exec.{Runner, SubDag}
      import graft.sinks.Sinks
      val out = tmpQueryDir("m12").toString
      val rules = Seq(
        Validator.Rule("value_out_of_range", col("value") < 1),
        Validator.Rule("error_event", col("event_type") === "error"))
      val eventsSplit: SparkSession => Unit = sp => {
        val withErr = Validator.withErrors(
          sp.read.parquet(s"$dir/events.parquet"), rules)
        val fork = Fork.validErrorSplit(withErr, Validator.ErrorCol)
        try {
          val staging = s"$out/_staging_events_valid"
          val dag = SubDag("events_root", children = Seq(
            SubDag("valid", priority = 0,
              execute = df => Sinks.writeFile(df, staging),
              // publish through the Hadoop FileSystem API (same primitive
              // RunState uses): atomic on HDFS, correct on any HCFS —
              // java.io.File.renameTo is local-FS-only
              commit = () => Sinks.publishRename(sp, staging, s"$out/events_valid")),
            SubDag("errors", priority = 1,
              execute = df => Sinks.writeErrorTable(df, s"$out/events_errors",
                appId = "m12", rowKeyCol = "event_id"))))
          SubDag.run(dag, withErr, routeForChild = (child, _) =>
            if (child.name == "valid") fork.stream(0).drop(Validator.ErrorCol)
            else fork.stream(1))
        } finally fork.close()
      }
      val ordersSummary: SparkSession => Unit = sp =>
        Sinks.writeFile(
          sp.read.parquet(s"$dir/orders.parquet")
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_orders"),
              decimalSum(col("o_totalprice"), 2).as("total_price")),
          s"$out/orders_summary")
      val state = new RunState(s"$out/_state")
      // scoped event window: Runner re-establishes the scope on its pool
      // threads, so events recorded inside the pipelines drain here and
      // nowhere else, even under concurrent runs
      val evScope = s"m12-${java.util.UUID.randomUUID()}"
      val results = graft.core.Metrics.withScope(evScope) {
        Runner.runAll(s, Seq(
          "events_split" -> eventsSplit, "orders_summary" -> ordersSummary))
      }
      Runner.saveHistory(state, results)
      state.commit()
      require(results.forall(_.result.isSuccess),
        s"pipeline failed: ${results.filter(_.result.isFailure)}")
      // telemetry metrics table (reference MetricRecord family): per-
      // pipeline durations plus any driver-loop events (cc rounds etc.)
      // recorded during the window — side output, not the returned frame
      val nowTs = new java.sql.Timestamp(System.currentTimeMillis())
      graft.core.Telemetry.appendMetrics(s,
        results.map(r => graft.core.Telemetry.MetricRecord("m12",
          s"${r.name}.duration_ms", r.millis, "", nowTs)) ++
          graft.core.Telemetry.fromDriverEvents("m12",
            graft.core.Metrics.drainDriverEvents(evScope)),
        s"$out/telemetry_metrics", java.time.LocalDate.now())
      // aggregates over the PUBLISHED outputs (post-commit paths)
      val valid = s.read.parquet(s"$out/events_valid")
        .agg(count(lit(1)).as("n"), decimalSum(col("value"), 2).as("metric"))
        .select(lit("events_valid").as("part"), col("n"), col("metric"))
      val errTbl = s.read.parquet(s"$out/events_errors")
      val errParts = Seq("value_out_of_range", "error_event").map { rule =>
        errTbl.filter(col("exception") === rule)
          .agg(count(lit(1)).as("n"))
          .select(lit(rule).as("part"), col("n"),
            lit(null).cast("double").as("metric"))
      }
      val summary = s.read.parquet(s"$out/orders_summary")
        .agg(count(lit(1)).as("n"),
          sum(col("total_price").cast("decimal(27,2)")).cast("double").as("metric"))
        .select(lit("orders_summary").as("part"), col("n"), col("metric"))
      (valid +: errParts :+ summary).reduce(_ union _)
    }),

    // ---- fork operator end-to-end (through the Fork class) --------------
    "m06_fork_streams" -> ((s, dir) => {
      // Exercises Fork.apply (persist + single-action counts), stream()
      // filtering, and count() agreement with per-stream aggregation —
      // round 1's m02 certified only an inline expression, not the class.
      val fork = Fork(t(s, dir, "events"), Seq(
        (lit(true): Column) -> 0,
        (col("value") > 100) -> 1,
        (col("event_type") === "error") -> 2))
      val streams = Seq(0, 1, 2).map { k =>
        fork.stream(k)
          .agg(count(lit(1)).as("n_stream"), decimalSum(col("value"), 2).as("sum_value"))
          .select(lit(k).as("fork_key"), lit(fork.count(k)).as("n"),
            col("n_stream"), col("sum_value"))
      }
      // Materialize the union THROUGH the persisted fork frame (the
      // production path — executing after close() would certify the
      // recompute path instead), then close so the fork's cache doesn't
      // outlive the query. Post-close recompute semantics are covered by
      // ForkSpec.
      val out = Dedup.materializeAndRelease(streams.reduce(_ union _))
      fork.close()
      out
    }),
  )

  // ----------------------------------------------------------------- oracle

  private val dec = "DECIMAL(27,%d)"
  private def dsum(expr: String, scale: Int, as: String) =
    s"CAST(SUM(CAST($expr AS DECIMAL(27,$scale))) AS DOUBLE) AS $as"

  // DuckDB mirrors of Similarity's left-to-right double folds: list_reduce
  // folds sequentially, and (0.0 + x) == x bit-exactly, so dot/norm/cosine
  // are bit-identical to Spark's `aggregate` (verified numerically).
  private def duckDot(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x,y) -> x+y)"
  /** Shared by m20 and m26 (the versioned-store twin probes the same
    * full-corpus layout): s04's formulation restricted to query 0 — the
    * layout round-trip must surface exactly the corpus rows assigned to
    * the query's 4 nearest cells (same centroid literals, same
    * argmin/probe ordering), scored by the same cosine. */
  /** The s23 phrase formulation ("fast table") parameterized on the
    * corpus source — the positional-index lifecycle oracles (s25 probe,
    * m61 append, m62 takedown) pass the corpus the index should be
    * serving, making each an independent from-scratch derivation. */
  /** d88's oracle: the identical N BPE merge rounds unrolled as chained
    * CTEs — pair counts via list_zip over each word's symbol list, the
    * per-round argmax with the (cnt DESC, l, r) tie-break, the greedy
    * left-to-right merge via list_reduce over single-symbol lists (the
    * element-for-element mirror of the engine's `aggregate` fold). An
    * exhausted corpus (empty b_k) CARRIES the prior symbol state
    * through every later w_k (LEFT JOIN + NULL guard) so the final
    * state matches the engine's early stop — b_k still contributes no
    * merge row. Tokenization class pinned cross-engine (see
    * WhitespaceTokens): explicit `[ \t\n\x0B\f\r]` split set and its
    * negation for symbols, never `\s`/`.`. */
  /** d89's oracle, shared verbatim by d92 (the fingerprint tier must
    * produce byte-identical cut lists): duplicated = k-gram in >= 2
    * distinct docs; union of extents via the same gap > k run split;
    * spans are exact integers end to end. */
  private val exactSpanOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
      |    x -> x <> '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, i - 1 AS pos,
      |    array_to_string(t[i:i+7], ' ') AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
      |        FROM toks WHERE len(t) >= 8)),
      |dup AS (SELECT gram FROM g GROUP BY gram
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
      |r AS (
      |  SELECT doc_id, pos,
      |    SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS run
      |  FROM (SELECT doc_id, pos,
      |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |        FROM m))
      |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |  CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
      |  CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
      |FROM r GROUP BY doc_id, run""".stripMargin

  /** d93/d94's shared oracle chain: corpus = doc_id % 10 <> 0, bench =
    * the held-out tenth; marked = corpus positions whose 8-gram appears
    * in ANY bench doc (cross-set only); runs split at gap > 8 — the
    * d89 derivation with the dup set swapped for the bench gram set. */
  private val decontamSpanOracleCte: String =
    """WITH ctoks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
      |    x -> x <> '') AS t
      |  FROM documents WHERE doc_id % 10 <> 0),
      |btoks AS (
      |  SELECT list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
      |    x -> x <> '') AS t
      |  FROM documents WHERE doc_id % 10 = 0),
      |cg AS (
      |  SELECT doc_id, i - 1 AS pos,
      |    array_to_string(t[i:i+7], ' ') AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
      |        FROM ctoks WHERE len(t) >= 8)),
      |bg AS (
      |  SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS gram
      |  FROM (SELECT t, unnest(range(1, len(t) - 6)) AS i
      |        FROM btoks WHERE len(t) >= 8)),
      |m AS (SELECT cg.doc_id, cg.pos FROM cg JOIN bg USING (gram)),
      |r AS (
      |  SELECT doc_id, pos,
      |    SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS run
      |  FROM (SELECT doc_id, pos,
      |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |        FROM m))""".stripMargin

  private def bpeOracleSql(n: Int, tail: Option[String] = None): String = {
    val rounds = (1 to n).map { k =>
      s""",
         |c$k AS (
         |  SELECT p.p['l'] AS l, p.p['r'] AS r, SUM(freq) AS cnt FROM (
         |    SELECT unnest(list_transform(list_zip(sym[1:-2], sym[2:-1]),
         |      z -> struct_pack(l := z[1], r := z[2]))) AS p, freq
         |    FROM w${k - 1}) p
         |  GROUP BY 1, 2),
         |b$k AS (SELECT l, r, cnt FROM c$k ORDER BY cnt DESC, l, r LIMIT 1),
         |w$k AS (
         |  SELECT CASE WHEN b.l IS NULL OR len(sym) < 2 THEN sym
         |    ELSE list_reduce(
         |      list_transform(sym, s -> [s]),
         |      (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
         |                  THEN list_concat(acc[1:-2], [b.l || b.r])
         |                  ELSE list_concat(acc, x) END) END AS sym, freq
         |  FROM w${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin
    }.mkString
    val sel = tail.getOrElse((1 to n).map(k =>
      s"SELECT $k AS rank, l AS lhs, r AS rhs, CAST(cnt AS BIGINT) AS cnt " +
        s"FROM b$k").mkString("\nUNION ALL\n"))
    s"""WITH wf AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(
       |      regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
       |      t -> t <> '')) AS word FROM documents) GROUP BY 1),
       |w0 AS (SELECT regexp_extract_all(word, '[^ \\t\\n\\x0B\\f\\r]')
       |  AS sym, freq FROM wf)
       |$rounds
       |$sel""".stripMargin
  }

  private def phraseOracleSql(corpusSql: String): String =
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> x != '') AS tk
       |  FROM ($corpusSql))
       |SELECT doc_id, n_matches FROM (
       |  SELECT doc_id, CAST(len(list_filter(range(1, len(tk)),
       |    i -> tk[i] = 'fast' AND tk[i+1] = 'table')) AS BIGINT)
       |    AS n_matches
       |  FROM t)
       |WHERE n_matches > 0""".stripMargin

  private val emptyTopKOracle: String =
    """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
      |CAST(NULL AS DOUBLE) AS score, CAST(NULL AS INTEGER) AS rank WHERE FALSE""".stripMargin

  /** The IVF hard-negative formulation (s26) as a reusable CTE chain
    * ending in `ivfneg` — s28's recall gauge composes it against the
    * exact-tier ground truth. Same centroid literals as s04's probe
    * (populate-then-dump via lastIvfCentroids), pool = vec_id >= 10,
    * queries = vec_id < 10, nprobe 4, k 5. */
  private def ivfHardNegOracleCte(cents: Array[Array[Double]]): String = {
    val nlist = cents.length
    val dl = cents.map(c => duckSqDist("embedding", duckDoubleList(c)))
      .mkString("[", ",\n", "]")
    val cos = duckCos("p.embedding", "a.embedding")
    s"""al AS (SELECT vec_id, label, embedding, $dl AS dl FROM embeddings),
       |a AS (SELECT vec_id, label, embedding,
       |        (list_position(dl, list_min(dl)) - 1) AS cell
       |      FROM al WHERE vec_id >= 10),
       |p AS (SELECT vec_id, label, embedding, cell FROM (
       |  SELECT vec_id, label, embedding, r.cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
       |  FROM (SELECT * FROM al WHERE vec_id < 10) ql
       |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
       |  WHERE rn <= 4),
       |ivfneg AS (SELECT query_id, corpus_id, score,
       |    CAST(rnk AS INTEGER) AS rank FROM (
       |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id, $cos AS score,
       |    row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY $cos DESC, a.vec_id) AS rnk
       |  FROM a JOIN p ON a.cell = p.cell AND p.vec_id != a.vec_id
       |    AND a.label <> p.label)
       |  WHERE rnk <= 5)""".stripMargin
  }

  private def ivfLayoutOracleSql: String =
    ivfLayoutOracleSqlFor("SELECT vec_id, embedding FROM embeddings")

  /** The m20/m26 formulation parameterized on the corpus source — the
    * m38 takedown oracle passes the SCRUBBED corpus here, making the
    * oracle an independent from-scratch rebuild of the probed layout. */
  private def ivfLayoutOracleSqlFor(corpusSql: String): String = {
    val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
    if (cents.isEmpty)
      """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
        |CAST(NULL AS DOUBLE) AS score, CAST(NULL AS INTEGER) AS rank WHERE FALSE""".stripMargin
    else {
      val nlist = cents.length
      val dl = cents.map { c =>
        duckSqDist("embedding", duckDoubleList(c))
      }.mkString("[", ",\n", "]")
      val cos = duckCos("p.embedding", "a.embedding")
      s"""WITH al AS (SELECT vec_id, embedding, $dl AS dl FROM ($corpusSql)),
         |a AS (SELECT vec_id, embedding,
         |        (list_position(dl, list_min(dl)) - 1) AS cell FROM al),
         |p AS (SELECT vec_id, embedding, cell FROM (
         |  SELECT vec_id, embedding, r.cell,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
         |  FROM (SELECT * FROM al WHERE vec_id = 0) ql
         |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
         |  WHERE rn <= 4)
         |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id, $cos AS score,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, a.vec_id) AS rnk
         |  FROM a JOIN p ON a.cell = p.cell AND p.vec_id != a.vec_id)
         |WHERE rnk <= 5""".stripMargin
    }
  }

  private def duckCos(q: String, c: String) =
    s"${duckDot(q, c)} / (sqrt(${duckDot(q, q)}) * sqrt(${duckDot(c, c)}))"
  private def duckSrpBucket(vec: String, dim: Int, planes: Int): String = {
    val ws = Similarity.planeWeights(dim, planes)
    (0 until planes).map { p =>
      val wlist = ws(p).map(w => if (w > 0) "1.0" else "-1.0")
        .mkString("([", ",", "]::DOUBLE[])")
      val dot = s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $vec[i]::DOUBLE * $wlist[i]), (x,y) -> x+y)"
      s"(CASE WHEN $dot >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
  }
  /** DuckDB twin of `Similarity.srpProbeBuckets(bucket, planes, 1)`:
    * the bucket itself plus every single-bit flip. */
  private def duckProbes(bucket: String, planes: Int): String =
    s"([$bucket::BIGINT] || list_transform(range(0, $planes), p -> xor($bucket::BIGINT, (1::BIGINT << p))))"
  /** DuckDB twin of Similarity's squared-L2 fold against a literal
    * centroid (same left-to-right accumulation; (x-c)*(x-c) evaluated
    * twice on both sides). */
  /** Exact DOUBLE literals for DuckDB: a bare decimal literal is typed
    * DECIMAL, and the list-literal common-type unification + cast to
    * DOUBLE[] can land 1 ulp off the Java double the Spark side computes
    * with (observed on fitted-codebook components). An exponent suffix
    * makes the parser produce a DOUBLE directly — correctly-rounded, so
    * the literal IS the Java double, bit for bit. */
  private def duckDoubleLit(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }
  private def duckDoubleList(c: Array[Double]): String =
    c.map(duckDoubleLit).mkString("([", ",", "]::DOUBLE[])")
  private def duckSqDist(v: String, c: String) =
    s"list_reduce(list_transform(range(1, len($v)+1), i -> ($v[i]::DOUBLE - $c[i]) * ($v[i]::DOUBLE - $c[i])), (x,y) -> x+y)"

  /** Shared CTE body for the multi-probe embedding near-dup pairs (s05
    * and s06 oracles): SRP buckets -> radius-1 probe expansion ->
    * same-bucket pairs -> cosine >= 0.40 as `epairs`. Plane count mirrors
    * the query side's derived value (lastSrpPlanes). */
  private def duckEmbPairsCte(): String = {
    val planes = lastSrpPlanes
    val bucket = duckSrpBucket("embedding", 64, planes)
    val cos = duckCos("a.embedding", "b.embedding")
    s"""v AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
       |pr AS (SELECT vec_id, embedding,
       |         unnest(${duckProbes("bucket", planes)}) AS bucket FROM v),
       |epairs AS (
       |  SELECT id1, id2, score FROM (
       |    SELECT a.vec_id AS id1, b.vec_id AS id2, $cos AS score
       |    FROM pr a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |  WHERE score >= 0.40)""".stripMargin
  }

  /** DuckDB re-derivation of the whole trained-int8 IVF probe — shared
    * by s30 (in-flight composition), m68 (persisted layout) and m69
    * (frozen-codebook append): the k-means TRAINER unrolls its two
    * Lloyd rounds over `trainSrc` (s07 quantization, smallest-md5
    * init, integer squared-L2 with ties to the smaller cell,
    * floor(sum/count) means, empty cells carry), then the probe
    * assigns + scores over `corpusSrc` with those centroids — cell
    * assignment and nprobe=2 ranking on exact long distances, s07
    * quantized-cosine scoring with the n2 > 0 drop. No centroid
    * literal ever crosses from the engine. */
  private def duckIvfTrainedSql(trainSrc: String,
                                corpusSrc: String): String = {
    val dist = (v: String, c: String) =>
      s"""list_sum(list_transform(range(1, len($v.q) + 1),
         |  i -> ($v.q[i] - $c.q[i]) * ($v.q[i] - $c.q[i])))""".stripMargin
    def quant(sName: String, qName: String, src: String) =
      s"""$sName AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |    / CAST(127 AS DOUBLE) AS scale FROM $src),
         |$qName AS (SELECT vec_id,
         |  CASE WHEN scale > 0
         |    THEN list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
         |  FROM $sName)""".stripMargin
    def assign(name: String, cents: String) =
      s"""$name AS (SELECT vec_id, cell FROM (
         |  SELECT v.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${dist("v", "c")}, c.cell) AS rn
         |  FROM qv v CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    def update(ex: String, u: String, cNew: String, a: String,
               cPrev: String) =
      s"""$ex AS (SELECT $a.cell, unnest(range(1, len(v.q) + 1)) AS dim,
         |  unnest(v.q) AS val FROM $a JOIN qv v USING (vec_id)),
         |$u AS (SELECT cell, dim,
         |  CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
         |  FROM $ex GROUP BY cell, dim),
         |$cNew AS (SELECT cell, list(cm ORDER BY dim) AS q FROM $u GROUP BY cell
         |  UNION ALL SELECT cell, q FROM $cPrev
         |  WHERE cell NOT IN (SELECT cell FROM $u))""".stripMargin
    val qdot =
      """CAST(list_sum(list_transform(range(1, len(p.q) + 1),
        |  i -> p.q[i] * a.q[i])) AS DOUBLE)
        |  / sqrt(CAST(p.n2 * a.n2 AS DOUBLE))""".stripMargin
    s"""WITH ${quant("ts", "qv", trainSrc)},
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY
       |    md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INTEGER) AS cell, q
       |  FROM qv QUALIFY row_number() OVER (ORDER BY
       |    md5(CAST(vec_id AS VARCHAR)), vec_id) <= 4),
       |${assign("a1", "c0")},
       |${update("ex1", "u1", "c1", "a1", "c0")},
       |${assign("a2", "c1")},
       |${update("ex2", "u2", "c2", "a2", "c1")},
       |${quant("cs", "cv", corpusSrc)},
       |nn AS (SELECT vec_id, q,
       |  CAST(list_sum(list_transform(range(1, len(q) + 1),
       |    i -> q[i] * q[i])) AS BIGINT) AS n2 FROM cv),
       |dlt AS (SELECT vec_id, list(d ORDER BY cell) AS dl FROM (
       |  SELECT v.vec_id AS vec_id, c.cell AS cell,
       |    ${dist("v", "c")} AS d
       |  FROM cv v CROSS JOIN c2 c) GROUP BY vec_id),
       |a AS (SELECT nn.vec_id, nn.q, nn.n2,
       |    (list_position(dl, list_min(dl)) - 1) AS cell
       |  FROM dlt JOIN nn ON nn.vec_id = dlt.vec_id),
       |p AS (SELECT vec_id, q, n2, cell FROM (
       |  SELECT q0.vec_id, q0.q, q0.n2, r.cell,
       |    row_number() OVER (PARTITION BY q0.vec_id
       |      ORDER BY dlt.dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
       |  FROM (SELECT * FROM nn WHERE vec_id < 10) q0
       |  JOIN dlt ON dlt.vec_id = q0.vec_id
       |  CROSS JOIN (SELECT unnest(range(0, 4)) AS cell) r)
       |  WHERE rn <= 2)
       |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank
       |FROM (
       |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id,
       |    $qdot AS score,
       |    row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY $qdot DESC, a.vec_id) AS rnk
       |  FROM a JOIN p ON a.cell = p.cell AND p.vec_id != a.vec_id
       |  WHERE p.n2 > 0 AND a.n2 > 0)
       |WHERE rnk <= 5""".stripMargin
  }

  /** Shared CTE body for the MinHash-LSH near-dup pipeline (d04, d09 and
    * m14 oracles): shingle -> minhash(12) -> 4 band buckets -> candidate
    * pairs -> exact-Jaccard >= 0.5 as `ndpairs`, over any relation with
    * (doc_id, text). */
  /** DuckDB twin of graft.functions.MinhashMinima over a staged
    * hash-pair-list column `hp` (one md5 per shingle, split into its two
    * unsigned 32-bit halves): component i = min over shingles of
    * h1 + i*h2 — exact BIGINT arithmetic, < 2^36, same values the
    * codegen'd expression produces. */
  private val duckHashPairs =
    "list_transform(sh, s -> [('0x' || substr(md5(s), 1, 8))::BIGINT, " +
      "('0x' || substr(md5(s), 9, 8))::BIGINT])"
  private def duckMinhash(nh: Int): String = (0 until nh)
    .map(i => s"list_min(list_transform(hp, p -> p[1] + $i * p[2]))")
    .mkString(", ")

  private def duckLshPairsCte(src: String = "documents"): String = {
    val K = 3; val NH = 12; val BANDS = 4; val RPB = NH / BANDS
    val cap = lastBucketCap // mirrors the query side's derived bucket cap
    val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
    val sh =
      s"""CASE WHEN len($toks) < $K THEN [array_to_string($toks, ' ')]
         | ELSE list_transform(range(0, len($toks) - $K + 1),
         |   i -> array_to_string(list_slice($toks, i+1, i+$K), ' ')) END""".stripMargin
    val bandkeys = (0 until BANDS)
      .map(b => s"md5('$b' || '|' || array_to_string(list_slice(sig, ${b * RPB + 1}, ${b * RPB + RPB}), '|'))")
      .mkString(", ")
    val jacc =
      """CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)""".stripMargin
    s"""shingled AS (SELECT doc_id, $sh AS sh FROM $src),
       |hashed AS (SELECT doc_id, $duckHashPairs AS hp FROM shingled),
       |sigs AS (SELECT doc_id, [${duckMinhash(NH)}] AS sig FROM hashed),
       |bands0 AS (SELECT doc_id, unnest([$bandkeys]) AS band FROM sigs),
       |bandsok AS (SELECT band FROM bands0 GROUP BY band HAVING COUNT(*) <= $cap),
       |bands AS (SELECT bands0.* FROM bands0 JOIN bandsok USING (band)),
       |cands AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |          FROM bands a JOIN bands b USING (band) WHERE a.doc_id < b.doc_id),
       |dsh AS (SELECT doc_id, list_distinct(sh) AS s FROM shingled),
       |ndpairs AS (
       |  SELECT id1, id2, $jacc AS jaccard
       |  FROM cands JOIN dsh x ON x.doc_id = id1 JOIN dsh y ON y.doc_id = id2
       |  WHERE $jacc >= 0.5)""".stripMargin
  }

  /** DuckDB twin of `Dedup.signatureState` over an inline relation `src`
    * (columns doc_id, text): doc_id, fp (normalized md5), sig (12 minhash
    * components, same salted-md5 construction as the Spark side). */
  private def duckSigState(src: String): String = {
    val K = 3; val NH = 12
    val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
    val sh =
      s"""CASE WHEN len($toks) < $K THEN [array_to_string($toks, ' ')]
         | ELSE list_transform(range(0, len($toks) - $K + 1),
         |   i -> array_to_string(list_slice($toks, i+1, i+$K), ' ')) END""".stripMargin
    s"""SELECT doc_id, fp, [${duckMinhash(NH)}] AS sig FROM (
       |  SELECT doc_id, fp, $duckHashPairs AS hp FROM (
       |    SELECT doc_id,
       |      md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       |      $sh AS sh
       |    FROM ($src)))""".stripMargin
  }

  /** The d11 incremental-dedup formulation parameterized on the HISTORY
    * ingest source — m39's takedown oracle passes the scrubbed ingest,
    * making the oracle an independent rebuild of the scrubbed state. */
  private def incrementalDedupOracleSql(histSql: String): String = {
    val bandkeys = (0 until 4)
      .map(b => s"md5('$b' || '|' || array_to_string(list_slice(sig, ${b * 3 + 1}, ${b * 3 + 3}), '|'))")
      .mkString(", ")
    s"""WITH
       |h AS (${duckSigState(histSql)}),
       |b AS (${duckSigState(
           """SELECT doc_id, text FROM documents WHERE doc_id >= 250
             |UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10""".stripMargin)}),
       |hb AS (SELECT doc_id AS hist_id, unnest([$bandkeys]) AS band FROM h),
       |bb AS (SELECT doc_id, unnest([$bandkeys]) AS band FROM b),
       |cands AS (SELECT DISTINCT bb.doc_id, hb.hist_id FROM bb JOIN hb USING (band)),
       |nearids AS (SELECT DISTINCT c.doc_id FROM cands c
       |  JOIN b x ON x.doc_id = c.doc_id
       |  JOIN h y ON y.doc_id = c.hist_id
       |  WHERE CAST(len(list_filter(range(1, 13), i -> x.sig[i] = y.sig[i])) AS DOUBLE)
       |    / CAST(len(x.sig) AS DOUBLE) >= 0.5),
       |exactids AS (SELECT DISTINCT b.doc_id FROM b
       |  JOIN (SELECT DISTINCT fp FROM h) hf USING (fp))
       |SELECT b.doc_id,
       |  b.doc_id IN (SELECT doc_id FROM exactids) AS exact_dup,
       |  b.doc_id IN (SELECT doc_id FROM nearids) AS near_dup,
       |  b.doc_id NOT IN (SELECT doc_id FROM exactids)
       |    AND b.doc_id NOT IN (SELECT doc_id FROM nearids) AS keep
       |FROM b""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "d11_incremental_dedup" ->
      incrementalDedupOracleSql(
        "SELECT doc_id, text FROM documents WHERE doc_id < 250"),
    "m39_takedown_state" ->
      // the d11 formulation with history rebuilt DIRECTLY from the
      // scrubbed ingest — if the Spark-side state scrub left any revoked
      // (fp, sig) row behind, batch copies of revoked docs would flag
      // dup and fail the hash
      incrementalDedupOracleSql(
        """SELECT doc_id, text FROM documents
          |WHERE doc_id < 250 AND NOT (doc_id % 11 = 2)""".stripMargin),
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsum("l_quantity", 2, "sum_qty")},
         |${dsum("l_extendedprice", 2, "sum_base_price")},
         |${dsum("l_extendedprice * (1 - l_discount)", 4, "sum_disc_price")},
         |CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         |COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 49""".stripMargin,
    "q03_join_agg" ->
      s"""SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
         |${dsum("o_totalprice", 2, "total_price")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,
    "q05_region_revenue" ->
      s"""SELECT r_name, n_name,
         |${dsum("l_extendedprice * (1 - l_discount)", 4, "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "q06_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(row_number() OVER w AS INTEGER) AS rn,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER
        |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q09_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q10_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q11_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q12_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
         |COUNT(*) AS n, ${dsum("l_quantity", 2, "qty")}
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q13_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "m01_validate_split" ->
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice IS NULL THEN 'missing_required_field:o_totalprice'
        |     WHEN o_totalprice < 1000 THEN 'totalprice_below_min'
        |     WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status'
        |     ELSE NULL END AS error_message,
        |(CASE WHEN o_totalprice IS NULL THEN 'x'
        |     WHEN o_totalprice < 1000 THEN 'x'
        |     WHEN o_orderstatus NOT IN ('O','F','P') THEN 'x'
        |     ELSE NULL END) IS NULL AS is_valid
        |FROM orders""".stripMargin,
    "m02_fork_counts" ->
      """SELECT 0 AS fork_key, COUNT(*) AS n FROM events
        |UNION ALL SELECT 1, COUNT(*) FROM events WHERE value > 100
        |UNION ALL SELECT 2, COUNT(*) FROM events WHERE event_type = 'error'""".stripMargin,
    "m03_ts_convert" ->
      """SELECT o_orderkey, epoch_ms(o_orderdate) AS ts_ms,
        |strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin,
    "m04_csv_lines" ->
      """SELECT c_custkey,
        |concat_ws(',', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment) AS line
        |FROM customer""".stripMargin,
    "m05_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d22_repetition" -> {
      // Repetition ratios over t = lower(text). The mode count here is a
      // quadratic count-per-distinct-gram list expression — deliberately
      // NOT the Spark side's sorted-run fold, so the integer cross-checks
      // the fold rather than echoing it (oracle-scale only; the Spark
      // form is the O(L log L) one that runs at corpus scale).
      val toks = "list_filter(string_split(t, ' '), x -> x != '')"
      def grams(n: Int) =
        if (n == 1) "g"
        // i ranges 1..len-n+1 (range is end-exclusive: len-n+2)
        else s"""(CASE WHEN len(g) < $n THEN [array_to_string(g, ' ')]
                 | ELSE list_transform(range(1, len(g) - ${n - 2}),
                 |        i -> array_to_string(g[i:i+${n - 1}], ' ')) END)""".stripMargin
      val cols = Seq(1, 2, 3).map { n =>
        s"""CAST(len(gr$n) AS BIGINT) AS n_${n}grams,
           |CASE WHEN len(gr$n) > 0 THEN CAST(len(gr$n) - len(list_distinct(gr$n)) AS DOUBLE)
           |  / CAST(len(gr$n) AS DOUBLE) END AS dup_${n}gram_ratio,
           |CAST(coalesce(list_max(list_transform(list_distinct(gr$n),
           |  x -> len(list_filter(gr$n, y -> y = x)))), 0) AS BIGINT) AS top_${n}gram_count,
           |CASE WHEN len(gr$n) > 0 THEN CAST(list_max(list_transform(list_distinct(gr$n),
           |  x -> len(list_filter(gr$n, y -> y = x)))) AS DOUBLE)
           |  / CAST(len(gr$n) AS DOUBLE) END AS top_${n}gram_ratio""".stripMargin
      }.mkString(",\n")
      s"""SELECT doc_id,
         |$cols
         |FROM (SELECT doc_id, ${grams(1)} AS gr1,
         |        ${grams(2)} AS gr2, ${grams(3)} AS gr3
         |      FROM (SELECT doc_id, $toks AS g
         |            FROM (SELECT doc_id, lower(text) AS t FROM documents)))""".stripMargin
    },
    "d24_mix_take" -> {
      // identical composition math in SQL: N = floor(min n_g/p_g), cut_g
      // = least(floor(p_g*N), n_g), same hash order — every division and
      // multiply CAST to DOUBLE so both engines run the same IEEE ops
      // (bare 0.25 literals are DECIMAL in DuckDB)
      val p = "CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE) " +
        "WHEN 'zh' THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END"
      s"""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents
         |           WHERE lang IN ('en', 'zh', 'de') GROUP BY 1),
         |t AS (SELECT CAST(min(floor(CAST(n AS DOUBLE) / $p)) AS BIGINT) AS total
         |      FROM c),
         |cuts AS (SELECT lang,
         |           least(CAST(floor($p * CAST(total AS DOUBLE)) AS BIGINT), n) AS cut
         |         FROM c, t),
         |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |        ORDER BY substr(md5('mix8|' || CAST(doc_id AS VARCHAR)), 1, 8) ASC,
         |                 doc_id ASC) AS rk
         |      FROM documents WHERE lang IN ('en', 'zh', 'de'))
         |SELECT doc_id, lang FROM r JOIN cuts USING (lang) WHERE rk <= cut""".stripMargin
    },
    "d23_decontaminate" ->
      // same 8-shingle md5 keys on both sides; per-doc DISTINCT shared
      // count (the Spark side array_distincts before exploding)
      """WITH toks AS (SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x != '') AS g
        |       FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(g) < 8 THEN [md5(array_to_string(g, ' '))]
        |              ELSE list_transform(range(1, len(g) - 6),
        |                     i -> md5(array_to_string(g[i:i+7], ' '))) END)) AS h
        |       FROM toks),
        |bk AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
        |hits AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        |         FROM sh s JOIN bk USING (h) GROUP BY 1)
        |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        |       coalesce(h.n_hits, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)""".stripMargin,
    "d26_pack_sequences" ->
      // the packing spec IS the one-global-window prefix sum: same
      // salted-hash order (sampleKey), same integral div/mod — the
      // Spark side's two-phase bucket decomposition must reproduce it
      // bit-exactly
      """WITH toks AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tokens,
        |    substr(md5('graft' || '|' || CAST(doc_id AS VARCHAR)), 1, 8) AS sk
        |  FROM documents),
        |cum AS (SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY sk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_tok
        |  FROM toks)
        |SELECT doc_id, n_tokens, start_tok,
        |  start_tok // 2048 AS seq,
        |  start_tok % 2048 AS seq_off,
        |  (start_tok + GREATEST(n_tokens - 1, 0)) // 2048
        |    - (start_tok // 2048) + 1 AS spans
        |FROM cum""".stripMargin,
    "d44_chunk_windows" ->
      // same tokenization, same starts (range is end-exclusive like
      // sequence(0, size-1) is end-inclusive: both stop below len),
      // same clamped slice; list_slice bounds are inclusive 1-based
      """WITH dt AS (SELECT doc_id AS id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS g
        |  FROM documents),
        |st AS (SELECT id, g, unnest(range(0, len(g), 24)) AS s
        |  FROM dt WHERE len(g) > 0)
        |SELECT id, CAST(s // 24 AS INTEGER) AS chunk_idx,
        |  CAST(s AS INTEGER) AS start_tok,
        |  CAST(LEAST(32, len(g) - s) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(g, s + 1, s + 32), ' ') AS chunk_text
        |FROM st""".stripMargin,
    "d43_bigram_coherence" ->
      // identical integer arithmetic: per-(doc,bigram) tf, corpus bigram
      // counts, lead-token masses derived FROM the bigram vocabulary;
      // one IEEE division at the end
      """WITH dt AS (SELECT doc_id AS id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS g
        |  FROM documents),
        |bgl AS (SELECT id,
        |    unnest(list_transform(range(1, len(g)),
        |      i -> g[i] || ' ' || g[i + 1])) AS bg
        |  FROM dt),
        |tf AS (SELECT id, bg, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM bgl GROUP BY 1, 2),
        |vocab AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS cnt
        |  FROM tf GROUP BY 1),
        |ld AS (SELECT split_part(bg, ' ', 1) AS w1,
        |    CAST(SUM(cnt) AS BIGINT) AS lcnt
        |  FROM vocab GROUP BY 1)
        |SELECT tf.id,
        |  CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(tf * cnt) AS BIGINT) AS bigram_mass,
        |  CAST(SUM(tf * lcnt) AS BIGINT) AS lead_mass,
        |  CAST(SUM(tf * cnt) AS DOUBLE) / CAST(SUM(tf * lcnt) AS DOUBLE)
        |    AS cond_score
        |FROM tf JOIN vocab USING (bg)
        |  JOIN ld ON split_part(tf.bg, ' ', 1) = ld.w1
        |GROUP BY 1""".stripMargin,
    "m23_shard_layout" ->
      // the layout IS the d42 assignment — one oracle serves both
      graft.llm.Packing.shardAssignOracleSql(
        """SELECT doc_id,
          |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
          |    AS BIGINT) AS n_tokens
          |FROM documents""".stripMargin,
        "doc_id", nShards = 8, salt = "s42"),
    "d42_shard_assign" ->
      // generated with the same (nShards, salt) literals; DuckDB builds
      // the 32-bit hash value digit-by-digit (no base-16 conv there)
      graft.llm.Packing.shardAssignOracleSql(
        """SELECT doc_id,
          |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
          |    AS BIGINT) AS n_tokens
          |FROM documents""".stripMargin,
        "doc_id", nShards = 8, salt = "s42"),
    "d27_boilerplate_spans" ->
      // same gram keys (case-normalized md5 over 4-token joins), same
      // df > 2 bar, same position-predicate reconstruction
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(tk) - 4 + 1, 0)),
        |      i -> {'pos': i,
        |            'gram': md5(lower(array_to_string(tk[i+1:i+4], ' ')))})) AS u
        |  FROM toks),
        |gp AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0),
        |hot AS (SELECT gram FROM (
        |    SELECT gram, COUNT(DISTINCT doc_id) AS df FROM gp GROUP BY 1)
        |  WHERE df > 2),
        |st AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS starts
        |  FROM gp JOIN hot USING (gram) GROUP BY 1),
        |j AS (SELECT t.doc_id, tk,
        |    COALESCE(starts, CAST([] AS BIGINT[])) AS starts
        |  FROM toks t LEFT JOIN st USING (doc_id)),
        |k AS (SELECT doc_id, tk,
        |    list_transform(list_filter(range(0, len(tk)),
        |      p -> len(list_filter(starts, s -> p >= s AND p <= s + 3)) = 0),
        |      p -> tk[p+1]) AS kept
        |  FROM j)
        |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
        |  -- DuckDB: array_to_string([]) is NULL; Spark concat_ws is ''
        |  COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
        |FROM k""".stripMargin,
    "d28_regex_tokens" ->
      // same alternation pattern under RE2; list_sum of an empty list is
      // NULL in DuckDB where Spark's aggregate(0L, +) is 0 — COALESCE
      """WITH tk AS (SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z0-9'']+|[^A-Za-z0-9'' ]') AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(t, x -> regexp_full_match(x, '[A-Za-z'']+')))
        |      AS BIGINT) AS n_word,
        |    CAST(len(list_filter(t, x -> regexp_full_match(x, '[0-9]+')))
        |      AS BIGINT) AS n_num,
        |    CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0)
        |      AS BIGINT) AS tok_chars
        |  FROM tk)
        |SELECT doc_id, n_tokens, n_word, n_num, tok_chars,
        |  n_tokens - n_word - n_num AS n_other,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |       ELSE CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |  END AS chars_per_token
        |FROM c""".stripMargin,
    "d29_unigram_familiarity" ->
      // identical integer arithmetic: per-(doc,term) tf, corpus counts,
      // total token mass; rare = cnt*100 < total; ratios are single
      // IEEE divisions of the BIGINT sums
      """WITH tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(lower(text), ' '),
        |            x -> x <> '')) AS term
        |        FROM documents) GROUP BY 1, 2),
        |vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt
        |  FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_toks FROM vocab)
        |SELECT tf.doc_id AS id,
        |  CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tf * cnt) AS BIGINT) AS sum_freq,
        |  CAST(SUM(CASE WHEN cnt * 100 < total_toks THEN tf ELSE 0 END)
        |    AS BIGINT) AS oov_tokens,
        |  CAST(SUM(tf * cnt) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS mean_freq,
        |  CAST(SUM(CASE WHEN cnt * 100 < total_toks THEN tf ELSE 0 END)
        |    AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS oov_rate
        |FROM tf JOIN vocab USING (term), tot
        |GROUP BY 1, total_toks""".stripMargin,
    "d30_temperature_mix" ->
      // rates derived FROM THE DATA in SQL by the same integer-exact
      // path: w = floor(sqrt(n)) (IEEE sqrt is correctly rounded), exact
      // BIGINT products, ONE final double division, same rateThreshold
      // floor(rate * 2^32) clamp, same salted md5 order
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt FROM c),
        |tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS W FROM w),
        |r AS (SELECT lang, n, least(CAST(1.0 AS DOUBLE),
        |    CAST(300 * wt AS DOUBLE) / CAST(W * n AS DOUBLE)) AS rate
        |  FROM w, tot)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE rate >= 1.0
        |   OR substr(md5('temp9|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |      < printf('%08x',
        |          least(CAST(floor(rate * 4294967296.0) AS BIGINT),
        |                4294967295))""".stripMargin,
    "d34_diversity_take" -> {
      // same centroid literals + argmin as the s04/m20 family, then the
      // d19 windowed take per cell in the same salted md5 order
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS vec_id,
          |CAST(NULL AS INTEGER) AS cell WHERE FALSE""".stripMargin
      else {
        val dl = cents.map(c => duckSqDist("embedding", duckDoubleList(c)))
          .mkString("[", ",\n", "]")
        s"""WITH al AS (SELECT vec_id, $dl AS dl FROM embeddings),
           |a AS (SELECT vec_id,
           |  CAST(list_position(dl, list_min(dl)) - 1 AS INTEGER) AS cell
           |  FROM al)
           |SELECT vec_id, cell FROM (
           |  SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
           |    ORDER BY substr(md5('div9' || '|' || CAST(vec_id AS VARCHAR)), 1, 8) ASC,
           |             vec_id ASC) AS rk
           |  FROM a) WHERE rk <= 20""".stripMargin
      }
    },
    "d35_decontam_spans" ->
      // d27's reconstruction with the flag set = the %97 eval set's
      // 8-shingle keys (d23's bk CTE) instead of corpus-frequent grams
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        |bk AS (SELECT DISTINCT h FROM (
        |  SELECT unnest(list_distinct(
        |    CASE WHEN len(g) < 8 THEN [md5(array_to_string(g, ' '))]
        |         ELSE list_transform(range(1, len(g) - 6),
        |                i -> md5(array_to_string(g[i:i+7], ' '))) END)) AS h
        |  FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS g
        |        FROM documents WHERE doc_id % 97 = 0))),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(tk) - 8 + 1, 0)),
        |      i -> {'pos': i,
        |            'gram': md5(lower(array_to_string(tk[i+1:i+8], ' ')))})) AS u
        |  FROM toks),
        |gp AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0),
        |st AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS starts
        |  FROM gp JOIN bk ON gp.gram = bk.h GROUP BY 1),
        |j AS (SELECT t.doc_id, tk,
        |    COALESCE(starts, CAST([] AS BIGINT[])) AS starts
        |  FROM toks t LEFT JOIN st USING (doc_id)),
        |k AS (SELECT doc_id, tk,
        |    list_transform(list_filter(range(0, len(tk)),
        |      p -> len(list_filter(starts, s -> p >= s AND p <= s + 7)) = 0),
        |      p -> tk[p+1]) AS kept
        |  FROM j)
        |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
        |  COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
        |FROM k""".stripMargin,
    "d36_importance_select" ->
      // same one-exchange arithmetic as d29 plus the conditional target
      // masses: integer tf/cnt/tcnt sums, ratio = two exact double
      // casts, one product each side, one division; selection = ORDER BY
      // ratio DESC, id LIMIT — ties break on id in both engines
      """WITH tf AS (SELECT doc_id, (lang = 'en') AS is_target, term,
        |    CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, lang,
        |          unnest(list_filter(string_split(lower(text), ' '),
        |            x -> x <> '')) AS term
        |        FROM documents) GROUP BY 1, 2, 3),
        |vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt,
        |    CAST(SUM(CASE WHEN is_target THEN tf ELSE 0 END) AS BIGINT) AS tcnt
        |  FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_toks,
        |    CAST(SUM(tcnt) AS BIGINT) AS target_toks FROM vocab)
        |SELECT doc_id AS id, n_tokens, target_mass, raw_mass, ratio FROM (
        |  SELECT tf.doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(tf * tcnt) AS BIGINT) AS target_mass,
        |    CAST(SUM(tf * cnt) AS BIGINT) AS raw_mass,
        |    (CAST(SUM(tf * tcnt) AS DOUBLE) * CAST(total_toks AS DOUBLE)) /
        |    (CAST(SUM(tf * cnt) AS DOUBLE) * CAST(target_toks AS DOUBLE)) AS ratio
        |  FROM tf JOIN vocab USING (term), tot
        |  GROUP BY 1, total_toks, target_toks)
        |ORDER BY ratio DESC, id LIMIT 200""".stripMargin,
    "d37_novelty" ->
      // d27's gram keys (text lowered before the split here, so no inner
      // lower() — same bytes under md5), distinct per doc via DISTINCT,
      // df = 1 marks corpus-unique grams; one ratio, one division
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(tk) - 4 + 1, 0)),
        |      i -> md5(array_to_string(tk[i+1:i+4], ' ')))) AS gram
        |  FROM toks),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |dfreq AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM g GROUP BY 1)
        |SELECT g.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS unique_grams,
        |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS novelty
        |FROM g JOIN dfreq USING (gram) GROUP BY 1""".stripMargin,
    "d38_vocab_oov" ->
      // vocabulary = top-20 terms by (cnt DESC, term ASC) — the same
      // deterministic cut TakeOrdered makes; OOV mass via the same
      // left join + null test
      """WITH tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(lower(text), ' '),
        |            x -> x <> '')) AS term
        |        FROM documents) GROUP BY 1, 2),
        |vc AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt
        |  FROM tf GROUP BY 1),
        |vocab AS (SELECT term FROM vc ORDER BY cnt DESC, term LIMIT 20)
        |SELECT tf.doc_id AS id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END) AS BIGINT)
        |    AS oov_tokens,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(tf) AS DOUBLE) AS oov_rate
        |FROM tf LEFT JOIN vocab v ON tf.term = v.term
        |GROUP BY 1""".stripMargin,
    "d41_bpe_pairs" ->
      // same two-stage shape: word counts once, pairs over the vocab;
      // range(1, length(w)) is empty for single-char words (matching the
      // Spark sequence guard); substr(w, i, 2) == Column.substr(i, 2)
      """WITH wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
        |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |          x -> x <> '')) AS w
        |        FROM documents) GROUP BY 1),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, wf
        |  FROM wc, unnest(range(1, length(w))) AS t(i))
        |SELECT pair, CAST(SUM(wf) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "s11_stratum_centroids" -> {
      // exact integer dim sums under the same floor(x*2^20 + 0.5)
      // write-out, centroid list rebuilt in ordinal order, cosine via
      // the shared ordered-fold duckCos — doubles hash-match
      val cos = duckCos("a.vec", "b.vec")
      s"""WITH j AS (SELECT d.lang AS stratum, e.embedding
         |    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |q AS (SELECT stratum, i AS pos,
         |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
         |      * 1048576.0 + 0.5) AS BIGINT) AS qv
         |  FROM j, unnest(range(1, len(embedding) + 1)) AS t(i)),
         |s AS (SELECT stratum, pos, CAST(SUM(qv) AS BIGINT) AS sv,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
         |v AS (SELECT stratum, list(CAST(sv AS DOUBLE) ORDER BY pos) AS vec,
         |    MAX(c) AS n FROM s GROUP BY 1)
         |SELECT a.stratum AS stratum_a, b.stratum AS stratum_b,
         |  a.n AS n_a, b.n AS n_b, $cos AS cos
         |FROM v a JOIN v b ON a.stratum < b.stratum""".stripMargin
    },
    "d39_filter_funnel" ->
      // GENERATED from the same gate table as the Spark side (the Pii
      // pattern): gate predicates are spliced verbatim, features are the
      // audited DuckDB twins of the Spark feature columns
      graft.llm.Filters.funnelOracleSql(
        "SELECT doc_id, text FROM documents", "doc_id", gates = d39Gates),
    "m24_stream_funnel" ->
      // the streaming path must equal the batch funnel row-for-row —
      // d39's generated oracle gates it unchanged
      graft.llm.Filters.funnelOracleSql(
        "SELECT doc_id, text FROM documents", "doc_id", gates = d39Gates),
    "d40_stratum_overlap" ->
      // d37's gram construction carrying lang instead of doc_id; full
      // matrix via a totals self-cross, zero-overlap pairs kept; one
      // integer division for jaccard
      """WITH toks AS (SELECT lang AS stratum,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |g0 AS (SELECT stratum,
        |    unnest(list_transform(range(0, greatest(len(tk) - 8 + 1, 0)),
        |      i -> md5(array_to_string(tk[i+1:i+8], ' ')))) AS gram
        |  FROM toks),
        |g AS (SELECT DISTINCT stratum, gram FROM g0),
        |tot AS (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM g GROUP BY 1),
        |sh AS (SELECT a.stratum AS sa, b.stratum AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM g a JOIN g b USING (gram)
        |  WHERE a.stratum < b.stratum GROUP BY 1, 2)
        |SELECT ta.stratum AS stratum_a, tb.stratum AS stratum_b,
        |  ta.n AS n_a, tb.n AS n_b,
        |  CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(sh.n_shared, 0) AS DOUBLE) /
        |    CAST(ta.n + tb.n - COALESCE(sh.n_shared, 0) AS DOUBLE) AS jaccard
        |FROM tot ta JOIN tot tb ON ta.stratum < tb.stratum
        |LEFT JOIN sh ON sh.sa = ta.stratum AND sh.sb = tb.stratum""".stripMargin,
    "d33_canonical_quality" ->
      // d09's recursive-closure clusters, but the keeper is the argmax of
      // len(text) (ties -> min id) — a DELIBERATELY different decision
      // rule than d09's MIN(id), cross-checking the canonical-selection
      // layer against the same component structure
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
         |cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
         |SELECT id, cluster,
         |  (row_number() OVER (PARTITION BY cluster
         |     ORDER BY len(d.text) DESC, id ASC) = 1) AS keep
         |FROM cl JOIN documents d ON cl.id = d.doc_id""".stripMargin,
    "d32_decontam_refresh" ->
      // d23's formulation with the bench side = the REFRESHED eval set
      // only (doc_id % 5): proves the versioned reader retired the v1
      // (doc_id % 7) keys — a union of both snapshots would inflate
      // n_hits on every %7-overlapping doc
      """WITH toks AS (SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x != '') AS g
        |       FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(g) < 8 THEN [md5(array_to_string(g, ' '))]
        |              ELSE list_transform(range(1, len(g) - 6),
        |                     i -> md5(array_to_string(g[i:i+7], ' '))) END)) AS h
        |       FROM toks),
        |bk AS (SELECT DISTINCT h FROM sh WHERE doc_id % 5 = 0),
        |hits AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        |         FROM sh s JOIN bk USING (h) GROUP BY 1)
        |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        |       coalesce(h.n_hits, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)""".stripMargin,
    "d31_pii_scrub" ->
      // staged CTE chain generated from the SAME Pii rule table the
      // Spark side runs (patterns cannot drift); input synthesis
      // mirrors the Spark expressions operator-for-operator
      graft.llm.Pii.scrubOracleSql(
        """SELECT doc_id, concat_ws(' ', text,
          |  'contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com',
          |  CASE WHEN doc_id % 3 = 0 THEN 'call 415-555-' ||
          |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END,
          |  CASE WHEN doc_id % 5 = 0 THEN 'host 10.0.' ||
          |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
          |    CAST(doc_id % 100 AS VARCHAR) END,
          |  CASE WHEN doc_id % 7 = 0 THEN 'api_key=sk_' ||
          |    CAST(doc_id AS VARCHAR) || 'x9' END,
          |  CASE WHEN doc_id % 11 = 0 THEN 'ssn 123-45-' ||
          |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
          |) AS text FROM documents""".stripMargin, "doc_id"),
    "d02_quality" -> {
      // All features over t = lower(text), matching the Spark side exactly.
      val toks = "list_filter(string_split(t, ' '), x -> x != '')"
      s"""SELECT doc_id,
         |CAST(length(t) AS BIGINT) AS n_chars,
         |CAST(len($toks) AS BIGINT) AS n_tokens,
         |CAST(len(list_distinct($toks)) AS BIGINT) AS n_unique_tokens,
         |CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE) AS unique_ratio,
         |CAST(list_sum(list_transform($toks, x -> CAST(len(x) AS BIGINT))) AS DOUBLE)
         |  / CAST(len($toks) AS DOUBLE) AS mean_token_len,
         |CAST((length(t) - length(replace(t, '.', ''))) / 1
         |  + (length(t) - length(replace(t, ',', ''))) / 1
         |  + (length(t) - length(replace(t, '!', ''))) / 1
         |  + (length(t) - length(replace(t, '?', ''))) / 1 AS BIGINT) AS n_punct,
         |CAST((length(t) - length(replace(t, ' the ', ''))) / 5
         |  + (length(t) - length(replace(t, ' a ', ''))) / 3
         |  + (length(t) - length(replace(t, ' and ', ''))) / 5
         |  + (length(t) - length(replace(t, ' of ', ''))) / 4 AS BIGINT) AS stopword_count
         |FROM (SELECT doc_id, lower(text) AS t FROM documents)""".stripMargin
    },
    "d03_lang_scores" -> {
      def cnt(m: String) =
        s"(length(p) - length(replace(p, '$m', ''))) / ${m.length}"
      val scores = TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
        s"CAST(${ms.map(cnt).mkString(" + ")} AS BIGINT) AS score_$lang"
      }.mkString(",\n")
      s"""SELECT doc_id, $scores
         |FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)""".stripMargin
    },
    "d04_lsh_neardups" ->
      s"""WITH ${duckLshPairsCte()}
         |SELECT id1, id2, jaccard FROM ndpairs""".stripMargin,
    "d63_lsh_recall" -> {
      // ground truth = naive all-pairs exact Jaccard (the quadratic form
      // the detector exists to avoid); found = the d04 LSH CTE verbatim
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val shExpr =
        s"""CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')]
           | ELSE list_transform(range(0, len($toks) - 2),
           |   i -> array_to_string(list_slice($toks, i+1, i+3), ' ')) END""".stripMargin
      s"""WITH ${duckLshPairsCte("(SELECT * FROM documents WHERE doc_id % 3 = 0)")},
         |d AS (SELECT doc_id, list_distinct($shExpr) AS sh FROM documents
         |  WHERE doc_id % 3 = 0),
         |truth AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id
         |  WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0
         |      THEN 0.0
         |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(a.sh, b.sh)))
         |            AS DOUBLE) END >= 0.5),
         |hit AS (SELECT * FROM truth SEMI JOIN ndpairs USING (id1, id2))
         |SELECT n_true, n_found, n_hit,
         |  CASE WHEN n_true = 0 THEN 1.0
         |       ELSE CAST(n_hit AS DOUBLE) / n_true END AS recall,
         |  CASE WHEN n_found = 0 THEN 1.0
         |       ELSE CAST(n_hit AS DOUBLE) / n_found END AS precision
         |FROM (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ndpairs) AS n_found,
         |  (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit)""".stripMargin
    },
    "m14_curation_pipeline" ->
      // quality gate -> min-id exact dedup -> near-dup clusters over the
      // survivors (same pair CTE as d04/d09, parameterized on `ex`) ->
      // drop non-keepers -> per-lang stats
      s"""WITH RECURSIVE
         |qd AS (SELECT doc_id, text, lang, n_chars,
         |         len($dTokens) AS nt,
         |         CAST(len(list_distinct($dTokens)) AS DOUBLE)
         |           / CAST(len($dTokens) AS DOUBLE) AS ur
         |       FROM documents),
         |qual AS (SELECT doc_id, text, lang, n_chars FROM qd
         |         WHERE nt >= 10 AND ur > 0.3),
         |exf AS (SELECT *,
         |          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |        FROM qual),
         |ex AS (SELECT e.doc_id, e.text, e.lang, e.n_chars FROM exf e
         |       JOIN (SELECT fp, MIN(doc_id) AS kid FROM exf GROUP BY fp) k
         |         ON e.fp = k.fp AND e.doc_id = k.kid),
         |${duckLshPairsCte("ex")},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
         |drops AS (SELECT id FROM (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
         |          WHERE id != cluster)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM ex WHERE doc_id NOT IN (SELECT id FROM drops)
         |GROUP BY lang""".stripMargin,
    "d09_dedup_clusters" ->
      // connected components over the verified near-dup pairs via a
      // recursive transitive-closure CTE: min reachable id = cluster
      // (UNION, not UNION ALL, so the recursion converges)
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster, (id = MIN(r)) AS keep
         |FROM reach GROUP BY id""".stripMargin,
    "d80_incremental_cc" ->
      // the from-scratch closure over ALL near-dup pairs — the query
      // side computes the same labeling INCREMENTALLY (historical 2/3
      // labeled first, the 1/3 batch folded by contraction), so a hash
      // match here IS the maintenance invariant
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin,
    "m65_cc_label_takedown" ->
      // surviving nodes labeled by the closure over SCRUBBED pairs (no
      // revoked endpoint); the base case ranges over the surviving node
      // set so isolated survivors emit as singletons, and revoked ids
      // are absent entirely
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |rv AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3),
         |sp AS (SELECT id1, id2 FROM ndpairs
         |       WHERE id1 NOT IN (SELECT doc_id FROM rv)
         |         AND id2 NOT IN (SELECT doc_id FROM rv)),
         |nodes AS (SELECT DISTINCT id FROM (
         |    SELECT id1 AS id FROM ndpairs
         |    UNION ALL SELECT id2 FROM ndpairs)
         |  WHERE id NOT IN (SELECT doc_id FROM rv)),
         |sedges AS (SELECT id1 AS a, id2 AS b FROM sp
         |           UNION ALL SELECT id2, id1 FROM sp),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.a, r.r FROM sedges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin,
    "m67_cc_edge_sidecar" ->
      // m65's formulation verbatim: the takedown ran with pairs = None,
      // sourcing the affected clusters' edges from the persisted
      // sidecar — the served labels must be indistinguishable from the
      // caller-supplied-graph exact tier
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |rv AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3),
         |sp AS (SELECT id1, id2 FROM ndpairs
         |       WHERE id1 NOT IN (SELECT doc_id FROM rv)
         |         AND id2 NOT IN (SELECT doc_id FROM rv)),
         |nodes AS (SELECT DISTINCT id FROM (
         |    SELECT id1 AS id FROM ndpairs
         |    UNION ALL SELECT id2 FROM ndpairs)
         |  WHERE id NOT IN (SELECT doc_id FROM rv)),
         |sedges AS (SELECT id1 AS a, id2 AS b FROM sp
         |           UNION ALL SELECT id2, id1 FROM sp),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.a, r.r FROM sedges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin,
    "m64_stream_cc_maintenance" ->
      // the same from-scratch closure as d80/m63 — the query side built
      // the labeling through three STREAMED folds, so a hash match here
      // pins arrival-order independence of the maintained labels
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin,
    "m63_cc_label_store" ->
      // identical formulation to d80 — the query side differs only in
      // WHERE the labels come from (the persisted store's served read
      // path after a bucketed fold, vs an in-plan fold)
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin,
    "d47_repeat_schedule" ->
      // same tier CASE, same unnest(range(0, ne)) epochs, same
      // md5(salt|epoch|id) order key
      """WITH base AS (SELECT doc_id,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |      x -> x <> '')) >= 40 THEN 2 ELSE 1 END AS ne
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(range(0, ne)) AS epoch
        |  FROM base WHERE ne > 0)
        |SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
        |  substr(md5('rep1' || '|' || CAST(epoch AS VARCHAR) || '|'
        |    || CAST(doc_id AS VARCHAR)), 1, 8) AS order_key
        |FROM e""".stripMargin,
    "d48_distribution_drift" ->
      // same tokenize, same CASE counts, same integer cross-multiplied
      // drift numerator, ONE double division for TVD at the end (sum
      // casts to BIGINT — DuckDB sums integers into HUGEINT)
      """WITH ex AS (SELECT
        |    unnest(list_filter(string_split(lower(coalesce(text, '')), ' '),
        |      x -> x != '')) AS term,
        |    (lang = 'en') AS a
        |  FROM documents),
        |c AS (SELECT term,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
        |  FROM ex GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS na,
        |    CAST(SUM(cnt_b) AS BIGINT) AS nb FROM c),
        |w AS (SELECT term, cnt_a, cnt_b, na, nb,
        |    abs(cnt_a * nb - cnt_b * na) AS drift_num FROM c, t),
        |s AS (SELECT CAST(SUM(drift_num) AS BIGINT) AS tvd_num FROM w)
        |SELECT term, cnt_a, cnt_b, na, nb, drift_num,
        |  CAST(tvd_num AS DOUBLE) /
        |    (CAST(2 AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS tvd
        |FROM w, s
        |ORDER BY drift_num DESC, term ASC
        |LIMIT 20""".stripMargin,
    "d49_length_batches" ->
      // generated from the SAME literals (batchSize/bandWidth/shards/
      // salt) — the shardAssign digit-assembled hash, the same
      // (n_tokens desc, id) fill order, the same integer waste formula
      graft.llm.Packing.lengthBucketOracleSql(
        """SELECT doc_id,
          |CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
          |  AS BIGINT) AS n_tokens
          |FROM documents""".stripMargin,
        "doc_id", batchSize = 8, bandWidth = 32, saltShards = 2,
        salt = "lb1"),
    "m31_profile_drift" -> profileDriftOracleSql,
    "m32_stream_drift" ->
      // the streaming path writes the SAME rows as m31's batch path
      // (one AvailableNow micro-batch over the full table, pinned v2
      // profile), so the batch oracle gates it verbatim — the m24
      // contract
      profileDriftOracleSql,
    "m33_centroid_drift" ->
      // both centroids re-derived from embeddings slices (side B = the
      // refreshed %4!=0 slice alone — v2 pinning is the tested
      // contract); the d53 quantization (floor(x*2^12+0.5)), BIGINT
      // cross-multiplied per-dim diffs, HUGEINT square sums mirroring
      // Spark's DECIMAL(38,0), one double division by the exact
      // (na*nb)^2 * 2^24 denominator
      """WITH q AS (SELECT CAST(label AS VARCHAR) AS stratum, vec_id,
        |    i AS pos,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
        |      * 4096.0 + 0.5) AS BIGINT) AS qv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |a AS (SELECT stratum, pos, CAST(SUM(qv) AS BIGINT) AS sa,
        |    CAST(COUNT(*) AS BIGINT) AS na
        |  FROM q GROUP BY 1, 2),
        |b AS (SELECT stratum, pos, CAST(SUM(qv) AS BIGINT) AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM q WHERE vec_id % 4 != 0 GROUP BY 1, 2),
        |d AS (SELECT a.stratum, na, nb, (sa * nb - sb * na) AS dd
        |  FROM a JOIN b ON a.stratum = b.stratum AND a.pos = b.pos),
        |g AS (SELECT stratum, MAX(na) AS n_a, MAX(nb) AS n_b,
        |    SUM(CAST(dd AS HUGEINT) * CAST(dd AS HUGEINT)) AS num
        |  FROM d GROUP BY 1)
        |SELECT stratum, n_a, n_b,
        |  CAST(num AS DOUBLE) /
        |    (CAST(n_a * n_b * n_a * n_b AS DOUBLE) * 16777216.0) AS shift_sq
        |FROM g""".stripMargin,
    "m36_stream_edit_dedup" ->
      // the streaming path writes the SAME rows as m35's batch path
      // (one AvailableNow batch over the slice) — gated by the identical
      // independent formulation
      """WITH h AS (SELECT text, length(text) AS l,
        |    length(text) - length(replace(text, ' ', '')) AS sp,
        |    length(text) - length(replace(text, 'e', '')) AS ec
        |  FROM documents WHERE doc_id % 3 != 0),
        |b AS (SELECT doc_id, text, length(text) AS l,
        |    length(text) - length(replace(text, ' ', '')) AS sp,
        |    length(text) - length(replace(text, 'e', '')) AS ec
        |  FROM documents WHERE doc_id % 3 = 0),
        |hits AS (SELECT b.doc_id,
        |    CAST(MIN(levenshtein(b.text, h.text)) AS BIGINT) AS md
        |  FROM b JOIN h ON abs(b.l - h.l) <= 8 AND abs(b.sp - h.sp) <= 8
        |    AND abs(b.ec - h.ec) <= 8
        |  WHERE levenshtein(b.text, h.text) <= 8
        |  GROUP BY 1)
        |SELECT b.doc_id, md IS NOT NULL AS edit_dup,
        |  coalesce(md, -1) AS min_dist
        |FROM b LEFT JOIN hits USING (doc_id)""".stripMargin,
    "m35_edit_incremental" ->
      // reference re-derived from the REFRESH slice alone (%3 != 0) —
      // the v2-pinning contract; naive batch x reference minimum with
      // the d58 lossless char-frequency prunes
      """WITH h AS (SELECT text, length(text) AS l,
        |    length(text) - length(replace(text, ' ', '')) AS sp,
        |    length(text) - length(replace(text, 'e', '')) AS ec
        |  FROM documents WHERE doc_id % 3 != 0),
        |b AS (SELECT doc_id, text, length(text) AS l,
        |    length(text) - length(replace(text, ' ', '')) AS sp,
        |    length(text) - length(replace(text, 'e', '')) AS ec
        |  FROM documents WHERE doc_id % 3 = 0),
        |hits AS (SELECT b.doc_id,
        |    CAST(MIN(levenshtein(b.text, h.text)) AS BIGINT) AS md
        |  FROM b JOIN h ON abs(b.l - h.l) <= 8 AND abs(b.sp - h.sp) <= 8
        |    AND abs(b.ec - h.ec) <= 8
        |  WHERE levenshtein(b.text, h.text) <= 8
        |  GROUP BY 1)
        |SELECT b.doc_id, md IS NOT NULL AS edit_dup,
        |  coalesce(md, -1) AS min_dist
        |FROM b LEFT JOIN hits USING (doc_id)""".stripMargin,
    "d68_url_curation" ->
      // independent formulation: the same messy-URL synthesis (the d31
      // convention), then DuckDB's own regexp/list toolchain re-derives
      // canonical form and registrable domain stage by stage
      ("WITH u AS (SELECT doc_id, n_chars,\n" + messyUrlSql +
        " AS url\n  FROM documents),\n" +
      """n AS (SELECT doc_id, n_chars,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    regexp_replace(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        |  FROM u),
        |p AS (SELECT doc_id, n_chars, scheme,
        |    regexp_extract(rest, '^([^/?]*)', 1) AS auth,
        |    regexp_replace(rest, '^[^/?]*', '') AS aft
        |  FROM n),
        |h AS (SELECT doc_id, n_chars, scheme, aft,
        |    lower(regexp_replace(auth, ':[0-9]+$', '')) AS host,
        |    regexp_extract(auth, ':([0-9]+)$', 1) AS port
        |  FROM p),
        |pq AS (SELECT doc_id, n_chars, scheme, host,
        |    CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
        |        OR (scheme = 'https' AND port = '443'))
        |      THEN ':' || port ELSE '' END AS portpart,
        |    CASE WHEN length(regexp_extract(aft, '^([^?]*)', 1)) > 1
        |      THEN regexp_replace(regexp_extract(aft, '^([^?]*)', 1), '/$', '')
        |      ELSE regexp_extract(aft, '^([^?]*)', 1) END AS path1,
        |    regexp_extract(aft, '\?(.*)$', 1) AS q0
        |  FROM h),
        |qq AS (SELECT doc_id, n_chars, scheme, host, portpart,
        |    CASE WHEN path1 = '' THEN '/' ELSE path1 END AS path,
        |    array_to_string(list_sort(list_filter(string_split(q0, '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_')
        |        AND NOT starts_with(x, 'fbclid=')
        |        AND NOT starts_with(x, 'gclid='))), '&') AS q
        |  FROM pq),
        |c AS (SELECT doc_id, n_chars,
        |    scheme || '://' || host || portpart || path ||
        |      (CASE WHEN q <> '' THEN '?' || q ELSE '' END) AS norm,
        |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM qq)
        |SELECT domain,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT norm) AS BIGINT) AS n_urls,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_weight,
        |  min(norm) AS min_url,
        |  max(norm) AS max_url,
        |  domain IN ('ex2.com', 'ex5.com') AS blocked
        |FROM c GROUP BY domain""".stripMargin),
    "d69_domain_cap" ->
      // DuckDB's own window re-ranks over the same md5 sample key; the
      // domain chain is the host-only slice of the d68 normalization
      ("WITH u AS (SELECT doc_id,\n" + messyUrlSql +
        " AS url\n  FROM documents),\n" +
      """d AS (SELECT doc_id,
        |    regexp_extract(
        |      lower(regexp_replace(
        |        regexp_extract(
        |          regexp_replace(regexp_replace(url, '#.*$', ''),
        |            '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
        |          '^([^/?]*)', 1),
        |        ':[0-9]+$', '')),
        |      '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM u),
        |r AS (SELECT doc_id, domain,
        |    row_number() OVER (PARTITION BY domain
        |      ORDER BY substr(md5('dc10' || '|' || CAST(doc_id AS VARCHAR)),
        |        1, 8), doc_id) AS rnk
        |  FROM d)
        |SELECT doc_id, domain, CAST(rnk AS INTEGER) AS domain_rank,
        |  rnk <= 40 AS kept
        |FROM r""".stripMargin),
    "d70_url_dedup" ->
      // canonicalization re-derived compactly (this URL family has no
      // ports/fragments/trailing slashes), then DuckDB's own keeper
      // window over the canonical key
      """WITH u AS (SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END)
        |    || '://www.' || source || '.ex' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.COM/item'
        |    || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=x'
        |             ELSE '?a=1&b=2' END) AS url
        |  FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    regexp_replace(url, '^[A-Za-z]+://', '') AS rest
        |  FROM u),
        |c AS (SELECT doc_id, n_chars,
        |    scheme || '://' || lower(regexp_extract(rest, '^([^/?]*)', 1))
        |    || regexp_extract(rest, '^[^/?]*([^?]*)', 1)
        |    || '?' || array_to_string(list_sort(list_filter(
        |         string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |         x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&')
        |      AS canonical_url
        |  FROM r)
        |SELECT doc_id, canonical_url,
        |  row_number() OVER (PARTITION BY canonical_url
        |    ORDER BY n_chars DESC, doc_id) = 1 AS keep
        |FROM c""".stripMargin,
    "m41_stream_url" ->
      // the d68 normalization chain verbatim, per doc (the streamed
      // transform must equal the batch transform row-for-row)
      ("WITH u AS (SELECT doc_id,\n" + messyUrlSql +
        " AS url\n  FROM documents),\n" +
      """n AS (SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    regexp_replace(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        |  FROM u),
        |p AS (SELECT doc_id, scheme,
        |    regexp_extract(rest, '^([^/?]*)', 1) AS auth,
        |    regexp_replace(rest, '^[^/?]*', '') AS aft
        |  FROM n),
        |h AS (SELECT doc_id, scheme, aft,
        |    lower(regexp_replace(auth, ':[0-9]+$', '')) AS host,
        |    regexp_extract(auth, ':([0-9]+)$', 1) AS port
        |  FROM p),
        |pq AS (SELECT doc_id, scheme, host,
        |    CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
        |        OR (scheme = 'https' AND port = '443'))
        |      THEN ':' || port ELSE '' END AS portpart,
        |    CASE WHEN length(regexp_extract(aft, '^([^?]*)', 1)) > 1
        |      THEN regexp_replace(regexp_extract(aft, '^([^?]*)', 1), '/$', '')
        |      ELSE regexp_extract(aft, '^([^?]*)', 1) END AS path1,
        |    regexp_extract(aft, '\?(.*)$', 1) AS q0
        |  FROM h),
        |qq AS (SELECT doc_id, scheme, host, portpart,
        |    CASE WHEN path1 = '' THEN '/' ELSE path1 END AS path,
        |    array_to_string(list_sort(list_filter(string_split(q0, '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_')
        |        AND NOT starts_with(x, 'fbclid=')
        |        AND NOT starts_with(x, 'gclid='))), '&') AS q
        |  FROM pq)
        |SELECT doc_id,
        |  scheme || '://' || host || portpart || path ||
        |    (CASE WHEN q <> '' THEN '?' || q ELSE '' END) AS url,
        |  regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |FROM qq""".stripMargin),
    "m42_takedown_audit" ->
      // first-principles expected audit: v1/postings = the revoked
      // docs' distinct-term posting-row count; every other cell 0
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_distinct(list_filter(
        |      string_split(lower(coalesce(text, '')), ' '),
        |      x -> x != ''))) AS term
        |  FROM documents),
        |rp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok
        |  WHERE doc_id % 17 = 3)
        |SELECT CAST(v AS BIGINT) AS version, tbl AS "table",
        |  CAST(n AS BIGINT) AS n_revoked
        |FROM (VALUES
        |  (1, 'postings', (SELECT n FROM rp)),
        |  (1, 'stats', 0),
        |  (2, 'postings', 0),
        |  (2, 'stats', 0)) t(v, tbl, n)""".stripMargin,
    "m43_bm25_append" ->
      // m25's full-corpus formulation verbatim: correct only if the
      // closed-form merge produced exactly the df/N/Σdl a from-scratch
      // build over the whole corpus carries
      TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 5),
    "m44_ivf_append" ->
      // m20/m26's full-corpus formulation: correct only if appended
      // rows landed in exactly the cells a from-scratch assignment
      // derives and no old row was lost or re-assigned in the rewrite
      ivfLayoutOracleSql,
    "d72_corpus_diff" ->
      // the same two synthetic versions re-derived, DuckDB's own
      // full-outer join + d01's fingerprint twin deciding the status
      """WITH o AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x != '')) AS BIGINT) AS ntok
        |  FROM documents WHERE doc_id % 5 != 0),
        |c0 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 2 THEN text || ' rev2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 7 != 3),
        |c AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x != '')) AS BIGINT) AS ntok
        |  FROM c0),
        |j AS (SELECT
        |    CASE WHEN o.fp IS NULL THEN 'added'
        |         WHEN c.fp IS NULL THEN 'removed'
        |         WHEN o.fp = c.fp THEN 'unchanged'
        |         ELSE 'changed' END AS status,
        |    coalesce(c.ntok, 0) - coalesce(o.ntok, 0) AS d
        |  FROM o FULL OUTER JOIN c ON o.doc_id = c.doc_id)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(d) AS BIGINT) AS tok_delta
        |FROM j GROUP BY status""".stripMargin,
    "q29_large_orders" ->
      // the grouped-HAVING IN form itself; exact decimal sum both sides
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        |  CAST(big.q AS DOUBLE) AS qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN (SELECT l_orderkey,
        |    SUM(CAST(l_quantity AS DECIMAL(27,2))) AS q
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(27,2))) > 180) big
        |  ON o_orderkey = big.l_orderkey""".stripMargin,
    "q30_order_histogram" ->
      // the ON-clause form itself: the NOT-LIKE rides the outer join's
      // condition, so zero-qualifying customers count 0, never drop
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey,
        |    CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority NOT LIKE '%URGENT%'
        |  GROUP BY c_custkey) pc
        |GROUP BY c_count""".stripMargin,
    "q31_late_ship_priority" ->
      // the EXISTS form itself — a cross-table correlated predicate
      // (shipdate vs the outer order's own date), two engines, two
      // independent decorrelation paths
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q32_priority_class_mix" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag <> 'N'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    "q33_returned_revenue_topk" ->
      s"""SELECT c_custkey, c_name, n_name,
         |${dsum("l_extendedprice * (1 - l_discount)", 4, "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1999-01-01'
         |  AND o_orderdate < TIMESTAMP '2000-01-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "q37_market_share" ->
      // the q28 ratio convention: exact decimal numerator/denominator,
      // one double division; o_year cast to INT to match Spark's year()
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
        |      THEN CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(27,4))
        |      ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(27,4))) AS DOUBLE) AS mkt_share,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(27,4))) AS DOUBLE) AS total_vol
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q38_nation_profit" ->
      s"""SELECT n_name AS supp_nation,
         |  CAST(year(o_orderdate) AS INT) AS o_year,
         |${dsum("l_extendedprice * (1 - l_discount) " +
            "- p_retailprice * l_quantity", 4, "profit")}
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%rod%'
         |GROUP BY 1, 2
         |ORDER BY 1, 2 DESC""".stripMargin,
    "q43_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |${dsum("l_extendedprice * (1 - l_discount)", 4, "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q41_large_volume_orders" ->
      // the IN-subquery-with-HAVING form stated directly
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(27,2))) > 250)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q42_supplier_part_counts" ->
      // the NOT IN + COUNT(DISTINCT) form stated directly
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q39_cheapest_supplier" ->
      // the correlated Q2 form — DuckDB decorrelates it its own way
      """SELECT DISTINCT p_partkey, s_suppkey,
        |  l_extendedprice / l_quantity AS unit_price
        |FROM lineitem l
        |JOIN part ON l.l_partkey = p_partkey
        |JOIN supplier ON l.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 3 AND r_name = 'ASIA'
        |  AND l_extendedprice / l_quantity = (
        |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        |    FROM lineitem l2
        |    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = l.l_partkey AND r2.r_name = 'ASIA')
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q40_shipping_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |${dsum("l_extendedprice * (1 - l_discount)", 4, "revenue")}
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
         |  AND l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '2001-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "q28_promo_share" ->
      // same exact-decimal sums, same single double division
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  CAST(100 * SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(27,4))
        |      ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(27,4))) AS DOUBLE) AS promo_share,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    "q27_qualified_suppliers" ->
      // the CORRELATED form itself: scalar-aggregate threshold inside
      // the HAVING of an IN-subquery — DuckDB decorrelates its own way,
      // so two engines cross two independent decorrelation paths
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l3
        |  WHERE l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING 5 * SUM(CAST(l_quantity AS DECIMAL(27,2))) >
        |    (SELECT SUM(CAST(l_quantity AS DECIMAL(27,2)))
        |     FROM lineitem l2 WHERE l2.l_partkey = l3.l_partkey))""".stripMargin,
    "d74_setsim_join" ->
      // scheme-independent exact truth: every shared-distinct-token
      // pair counted, integer threshold — 17*inter >= 7*(na+nb) is
      // J >= 0.7 exactly
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_distinct(list_filter(
        |      string_split(lower(text), ' '), x -> x != ''))) AS term
        |  FROM documents),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |  FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM tok a JOIN tok b
        |    ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ai AS id_a, bi AS id_b, inter, na.n AS na, nb.n AS nb
        |FROM pair JOIN n na ON na.doc_id = ai JOIN n nb ON nb.doc_id = bi
        |WHERE 17 * inter >= 7 * (na.n + nb.n)""".stripMargin,
    "d75_setsim_cost" ->
      // the same prefix definition re-derived: rarest-first
      // (df, term) rank per doc, prefix = first n - ceil(0.7n) + 1
      // rows (ceil in exact integers: (7n+9)//10), then
      // sum C(prefixdf, 2)
      """WITH docs AS (SELECT doc_id,
        |    list_distinct(list_filter(
        |      string_split(lower(text), ' '), x -> x != '')) AS terms
        |  FROM documents),
        |tok AS (SELECT doc_id, CAST(len(terms) AS BIGINT) AS n,
        |    unnest(terms) AS term FROM docs),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM tok GROUP BY term),
        |pref AS (SELECT doc_id, term FROM (
        |    SELECT t.doc_id, t.term, t.n,
        |      row_number() OVER (PARTITION BY t.doc_id
        |        ORDER BY d.df ASC, t.term ASC) AS idx
        |    FROM tok t JOIN dfreq d USING (term))
        |  WHERE idx <= n - ((7 * n + 9) // 10) + 1),
        |pdf AS (SELECT term, CAST(count(*) AS BIGINT) AS pdf
        |  FROM pref GROUP BY term)
        |SELECT CAST(SUM(pdf) AS BIGINT) AS prefix_rows,
        |  CAST(MAX(pdf) AS BIGINT) AS max_prefix_df,
        |  CAST(SUM(pdf * (pdf - 1) // 2) AS BIGINT) AS candidates_bound
        |FROM pdf""".stripMargin,
    "d77_norm_dedup" ->
      // same accent map, same punctuation strip, same whitespace
      // collapse, same md5 — then min id per fingerprint keeps
      s"""SELECT id, fp,
         |  (row_number() OVER (PARTITION BY fp ORDER BY id) = 1) AS keep
         |FROM (SELECT doc_id AS id,
         |    md5(trim(regexp_replace(regexp_replace(
         |      translate(lower(coalesce(text, '')),
         |        '${graft.llm.TextAnalysis.AccentFrom}',
         |        '${graft.llm.TextAnalysis.AccentTo}'),
         |      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents)""".stripMargin,
    "d78_lang_overlap" ->
      // same distinct (lang, token) vocabulary, integer intersection
      // counts, complete a<b matrix with zero-overlap pairs kept, ONE
      // double division at the end
      """WITH vocab AS (SELECT DISTINCT stratum, term FROM (
        |    SELECT lang AS stratum,
        |      unnest(list_filter(string_split(lower(text), ' '),
        |        x -> x != '')) AS term
        |    FROM documents)),
        |sizes AS (SELECT s.stratum, CAST(COALESCE(v.n, 0) AS BIGINT) AS n
        |  FROM (SELECT DISTINCT lang AS stratum FROM documents) s
        |  LEFT JOIN (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM vocab GROUP BY 1) v ON v.stratum = s.stratum),
        |inter AS (SELECT a.stratum AS stratum_a, b.stratum AS stratum_b,
        |    CAST(COUNT(*) AS BIGINT) AS overlap
        |  FROM vocab a JOIN vocab b
        |    ON a.term = b.term AND a.stratum < b.stratum
        |  GROUP BY 1, 2)
        |SELECT x.stratum AS stratum_a, y.stratum AS stratum_b,
        |  COALESCE(i.overlap, 0) AS overlap, x.n AS n_a, y.n AS n_b,
        |  CASE WHEN x.n + y.n - COALESCE(i.overlap, 0) = 0 THEN 0.0
        |    ELSE CAST(COALESCE(i.overlap, 0) AS DOUBLE)
        |      / CAST(x.n + y.n - COALESCE(i.overlap, 0) AS DOUBLE)
        |  END AS jaccard
        |FROM sizes x JOIN sizes y ON x.stratum < y.stratum
        |LEFT JOIN inter i
        |  ON i.stratum_a = x.stratum AND i.stratum_b = y.stratum""".stripMargin,
    "d84_triangles" -> {
      // the same degree-ordered orientation re-derived in SQL: canonical
      // pair set, endpoint degrees, low→high orientation under
      // (degree, id), wedges at the lowest-order corner closed by an
      // EXISTS on the oriented set, three corner credits per triangle
      val ord = (du: String, u: String, dv: String, v: String) =>
        s"($du < $dv OR ($du = $dv AND $u < $v))"
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u,
         |    b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey),
         |deg AS MATERIALIZED (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
         |  FROM (SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e)
         |  GROUP BY 1),
         |o AS MATERIALIZED (SELECT
         |    CASE WHEN ${ord("du.degree", "e.u", "dv.degree", "e.v")}
         |      THEN e.u ELSE e.v END AS src,
         |    CASE WHEN ${ord("du.degree", "e.u", "dv.degree", "e.v")}
         |      THEN e.v ELSE e.u END AS dst,
         |    CASE WHEN ${ord("du.degree", "e.u", "dv.degree", "e.v")}
         |      THEN dv.degree ELSE du.degree END AS dd
         |  FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
         |tri AS MATERIALIZED (SELECT o1.src, o1.dst AS x, o2.dst AS y
         |  FROM o o1 JOIN o o2 ON o1.src = o2.src
         |  WHERE ${ord("o1.dd", "o1.dst", "o2.dd", "o2.dst")}
         |    AND EXISTS (SELECT 1 FROM o
         |      WHERE o.src = o1.dst AND o.dst = o2.dst)),
         |corners AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles
         |  FROM (SELECT src AS id FROM tri UNION ALL SELECT x AS id FROM tri
         |    UNION ALL SELECT y AS id FROM tri) GROUP BY 1)
         |SELECT deg.id, deg.degree,
         |  COALESCE(c.triangles, 0) AS triangles,
         |  CASE WHEN deg.degree >= 2
         |    THEN (2.0 * CAST(COALESCE(c.triangles, 0) AS DOUBLE))
         |      / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
         |    ELSE 0.0 END AS lcc
         |FROM deg LEFT JOIN corners c ON c.id = deg.id""".stripMargin
    },
    "d88_bpe_merges" ->
      // the identical 8 training rounds unrolled: exact-integer pair
      // counts, shared tie-break, list_reduce = the engine's fold
      bpeOracleSql(8),
    "d89_exact_spans" ->
      // independently derived: duplicated = k-gram in >= 2 distinct
      // docs; union of extents via the same gap > k run split; spans
      // are exact integers end to end
      exactSpanOracleSql,
    "d92_exact_spans_fp" ->
      // the STRING-tier oracle verbatim: the fingerprint tier must
      // produce byte-identical cut lists (the key is internal — only
      // a collision could diverge, and that's the failure to catch)
      exactSpanOracleSql,
    "d90_span_removal" ->
      // d89's derivation chained into removal: tokens anti-joined
      // against span coverage, re-joined in position order; fully-cut
      // and cut-free docs both survive via the outer join
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(t[i:i+7], ' ') AS gram
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        |        FROM toks WHERE len(t) >= 8)),
        |dup AS (SELECT gram FROM g GROUP BY gram
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
        |r AS (
        |  SELECT doc_id, pos,
        |    SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS run
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM m)),
        |spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
        |          FROM r GROUP BY doc_id, run),
        |ex AS (SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS pos
        |       FROM toks),
        |kept AS (
        |  SELECT e.doc_id, e.tok, e.pos FROM ex e
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = e.doc_id AND e.pos BETWEEN s.s AND s.e))
        |SELECT toks.doc_id, COALESCE(k.text, '') AS text
        |FROM toks LEFT JOIN (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin,
    "d93_decontam_spans" ->
      // independently derived: contaminated = corpus 8-gram present in
      // the held-out bench side; same gap > 8 run split; exact integers
      (decontamSpanOracleCte + "\n" +
        """SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
          |  CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
          |  CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
          |FROM r GROUP BY doc_id, run""".stripMargin),
    "d95_decontam_spans_fp" ->
      // the STRING-tier oracle verbatim (the d92 discipline): the
      // fingerprint tier must produce byte-identical cut lists
      (decontamSpanOracleCte + "\n" +
        """SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
          |  CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
          |  CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
          |FROM r GROUP BY doc_id, run""".stripMargin),
    "d94_decontam_removal" ->
      // the decontamination chain into removal: corpus tokens
      // anti-joined against contaminated span coverage, re-joined in
      // position order; untouched and fully-cut docs survive via the
      // outer join
      (decontamSpanOracleCte + ",\n" +
        """spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
          |          FROM r GROUP BY doc_id, run),
          |ex AS (SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS pos
          |       FROM ctoks),
          |kept AS (
          |  SELECT e.doc_id, e.tok, e.pos FROM ex e
          |  WHERE NOT EXISTS (SELECT 1 FROM spans s
          |    WHERE s.doc_id = e.doc_id AND e.pos BETWEEN s.s AND s.e))
          |SELECT ctoks.doc_id, COALESCE(k.text, '') AS text
          |FROM ctoks LEFT JOIN (
          |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
          |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin),
    "m73_bpe_frozen_vocab" ->
      // d91's independent derivation verbatim: the freeze → retrain →
      // pinned-reload round trip must serve the IDENTICAL trained
      // state, so the same from-scratch oracle gates it
      bpeOracleSql(8, tail = Some(
        """SELECT token, cnt FROM (
          |  SELECT u.tok AS token, CAST(SUM(freq) AS BIGINT) AS cnt
          |  FROM (SELECT unnest(sym) AS tok, freq FROM w8) u GROUP BY 1)
          |ORDER BY cnt DESC, token LIMIT 30""".stripMargin)),
    "d91_bpe_token_stats" ->
      // the identical 8 trained rounds, then the final symbol state
      // unnested and freq-weighted — gates applyMerges cross-engine
      bpeOracleSql(8, tail = Some(
        """SELECT token, cnt FROM (
          |  SELECT u.tok AS token, CAST(SUM(freq) AS BIGINT) AS cnt
          |  FROM (SELECT unnest(sym) AS tok, freq FROM w8) u GROUP BY 1)
          |ORDER BY cnt DESC, token LIMIT 30""".stripMargin)),
    "d85_assortativity" ->
      // same canonical pairs + degrees; DuckDB's SUM(BIGINT) is exact
      // HUGEINT, mirroring the engine's exact decimal(38,0) sums; the
      // single double division (and the 0-denominator NULL guard) are
      // shared, so the float is bit-identical
      """WITH e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u,
        |    b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |deg AS MATERIALIZED (SELECT id, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM (SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e)
        |  GROUP BY 1),
        |dd AS (SELECT du.d AS x, dv.d AS y
        |    FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v
        |  UNION ALL
        |  SELECT dv.d, du.d
        |    FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
        |sums AS (SELECT COUNT(*) AS m2, SUM(x) AS sx, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sx2 FROM dd)
        |SELECT CAST(m2 // 2 AS BIGINT) AS m_edges,
        |  CASE WHEN m2 * sx2 - sx * sx = 0 THEN NULL
        |    ELSE CAST(m2 * sxy - sx * sx AS DOUBLE)
        |      / CAST(m2 * sx2 - sx * sx AS DOUBLE) END AS assortativity
        |FROM sums""".stripMargin,
    "d86_kcore" -> {
      // 8 peeling rounds unrolled (idempotent once stable, and the
      // query side REQUIRES convergence within 8): each round keeps
      // the nodes of current degree >= 6 and restricts the edge set
      val rounds = (1 to 8).map { i =>
        s"""n$i AS MATERIALIZED (SELECT id FROM (
           |    SELECT u AS id FROM e${i - 1}
           |    UNION ALL SELECT v AS id FROM e${i - 1})
           |  GROUP BY id HAVING COUNT(*) >= 6),
           |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
           |  WHERE u IN (SELECT id FROM n$i)
           |    AND v IN (SELECT id FROM n$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u,
         |    b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey),
         |$rounds
         |SELECT id, CAST(COUNT(*) AS BIGINT) AS core_degree
         |FROM (SELECT u AS id FROM e8 UNION ALL SELECT v AS id FROM e8)
         |GROUP BY id""".stripMargin
    },
    "d87_neighbor_setsim" ->
      // scheme-independent exact truth over the adjacency sets: every
      // shared-neighbor pair counted, integer threshold — 61*inter >=
      // 11*(na+nb) is inter*(den+num) >= num*(na+nb), i.e.
      // neighborhood-Jaccard >= 11/50 exactly (the d74 formulation
      // with customer ids as the token universe)
      """WITH nbr AS (SELECT DISTINCT l_suppkey AS id, o_custkey AS nb
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |n AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM nbr GROUP BY 1),
        |pair AS (SELECT a.id AS ai, b.id AS bi,
        |    CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM nbr a JOIN nbr b ON a.nb = b.nb AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT ai AS id_a, bi AS id_b, inter, na.n AS na, nb.n AS nb
        |FROM pair JOIN n na ON na.id = ai JOIN n nb ON nb.id = bi
        |WHERE 61 * inter >= 11 * (na.n + nb.n)""".stripMargin,
    "d79_pagerank" -> {
      // the same three rounds unrolled as chained CTEs, all integer
      // (// is floor division — equal to Spark's `div` truncation on
      // these all-positive values); dangling mass is a per-round scalar
      val iters = (0 until 3).map { k =>
        s"""d$k AS MATERIALIZED (SELECT
           |    CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
           |  FROM r$k r LEFT JOIN deg ON deg.node = r.node
           |  WHERE deg.node IS NULL),
           |i$k AS MATERIALIZED (SELECT e.dst AS node,
           |    CAST(SUM(r.rank // deg.deg) AS BIGINT) AS inb
           |  FROM r$k r JOIN deg ON deg.node = r.node
           |  JOIN e ON e.src = r.node
           |  GROUP BY 1),
           |r${k + 1} AS MATERIALIZED (SELECT nodes.node,
           |    ((1000000000000 // c.n) * 3) // 20
           |      + (17 * (COALESCE(i$k.inb, 0) + d$k.dang // c.n)) // 20
           |      AS rank
           |  FROM nodes LEFT JOIN i$k ON i$k.node = nodes.node,
           |    d$k, c),""".stripMargin
      }.mkString("\n")
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS src,
         |    o_custkey + 1000000 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e
         |  UNION SELECT dst FROM e),
         |deg AS MATERIALIZED (SELECT src AS node,
         |    CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         |c AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n
         |  FROM nodes),
         |r0 AS MATERIALIZED (SELECT node, 1000000000000 // c.n AS rank
         |  FROM nodes, c),
         |$iters
         |fin AS (SELECT node, CAST(rank AS BIGINT) AS rank FROM r3)
         |SELECT node, rank FROM fin""".stripMargin
    },
    "d83_hits" -> {
      // both rounds unrolled; // equals `div` on these non-negative
      // values, and the normalize divisor clamps at 1 exactly like the
      // engine's CASE
      val norm = (v: String, m: String) =>
        s"$v // (CASE WHEN $m // 1000000000 < 1 THEN 1 " +
          s"ELSE $m // 1000000000 END)"
      def round(k: Int) =
        s"""ra$k AS MATERIALIZED (SELECT e.dst AS node,
           |    CAST(SUM(s.hub) AS BIGINT) AS ra
           |  FROM e JOIN s${k - 1} s ON s.node = e.src GROUP BY 1),
           |am$k AS MATERIALIZED (SELECT GREATEST(MAX(ra), 1) AS am
           |  FROM ra$k),
           |a$k AS MATERIALIZED (SELECT node,
           |    ${norm("ra", "am")} AS auth FROM ra$k, am$k),
           |rh$k AS MATERIALIZED (SELECT e.src AS node,
           |    CAST(SUM(a.auth) AS BIGINT) AS rh
           |  FROM e JOIN a$k a ON a.node = e.dst GROUP BY 1),
           |hm$k AS MATERIALIZED (SELECT GREATEST(MAX(rh), 1) AS hm
           |  FROM rh$k),
           |h$k AS MATERIALIZED (SELECT node,
           |    ${norm("rh", "hm")} AS hub FROM rh$k, hm$k),
           |s$k AS MATERIALIZED (SELECT n.node,
           |    COALESCE(h$k.hub, 0) AS hub, COALESCE(a$k.auth, 0) AS auth
           |  FROM nodes n LEFT JOIN h$k ON h$k.node = n.node
           |  LEFT JOIN a$k ON a$k.node = n.node)""".stripMargin
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS src,
         |    o_custkey + 1000000 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e
         |  UNION SELECT dst FROM e),
         |s0 AS MATERIALIZED (SELECT node, 1000000000 AS hub,
         |    1000000000 AS auth FROM nodes),
         |${round(1)},
         |${round(2)}
         |SELECT node, CAST(hub AS BIGINT) AS hub,
         |  CAST(auth AS BIGINT) AS auth FROM s2""".stripMargin
    },
    "d82_label_propagation" -> {
      // both rounds unrolled: per round one labeled-neighbor vote count
      // + one (count DESC, label ASC) top-1 per node, seeds clamped via
      // the same 3-way COALESCE as the engine
      def round(k: Int) =
        s"""v$k AS (SELECT e.a AS node, l.label, COUNT(*) AS c
           |  FROM e JOIN l${k - 1} l ON l.node = e.b
           |  WHERE l.label IS NOT NULL GROUP BY 1, 2),
           |p$k AS (SELECT node, label FROM (
           |  SELECT node, label, row_number() OVER (PARTITION BY node
           |    ORDER BY c DESC, label) AS rn FROM v$k) WHERE rn = 1),
           |l$k AS (SELECT n.node,
           |    COALESCE(sd.label, p$k.label, l${k - 1}.label) AS label
           |  FROM nodes n LEFT JOIN sd ON sd.node = n.node
           |  LEFT JOIN p$k ON p$k.node = n.node
           |  LEFT JOIN l${k - 1} ON l${k - 1}.node = n.node)""".stripMargin
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |sd AS (SELECT doc_id AS node, lang AS label FROM documents
         |  WHERE doc_id % 4 = 0),
         |e AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |  UNION ALL SELECT id2, id1 FROM ndpairs),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT a AS node FROM e UNION ALL SELECT node FROM sd)),
         |l0 AS (SELECT n.node, sd.label FROM nodes n
         |  LEFT JOIN sd ON sd.node = n.node),
         |${round(1)},
         |${round(2)}
         |SELECT node, label FROM l2""".stripMargin
    },
    "d81_personalized_pagerank" -> {
      // d79's unrolled-round formulation with the seed-gated teleport
      // and seed-returned dangling mass; all values non-negative so //
      // equals Spark's `div` truncation
      val iters = (0 until 3).map { k =>
        s"""d$k AS MATERIALIZED (SELECT
           |    CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
           |  FROM r$k r LEFT JOIN deg ON deg.node = r.node
           |  WHERE deg.node IS NULL),
           |i$k AS MATERIALIZED (SELECT e.dst AS node,
           |    CAST(SUM(r.rank // deg.deg) AS BIGINT) AS inb
           |  FROM r$k r JOIN deg ON deg.node = r.node
           |  JOIN e ON e.src = r.node
           |  GROUP BY 1),
           |r${k + 1} AS MATERIALIZED (SELECT nodes.node,
           |    CASE WHEN sd.node IS NOT NULL
           |      THEN ((1000000000000 // ns.n) * 3) // 20 ELSE 0 END
           |      + (17 * (COALESCE(i$k.inb, 0)
           |          + CASE WHEN sd.node IS NOT NULL
           |              THEN d$k.dang // ns.n ELSE 0 END)) // 20
           |      AS rank
           |  FROM nodes LEFT JOIN i$k ON i$k.node = nodes.node
           |    LEFT JOIN sd ON sd.node = nodes.node, d$k, ns),""".stripMargin
      }.mkString("\n")
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS src,
         |    o_custkey + 1000000 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |sd AS MATERIALIZED (SELECT s_suppkey AS node FROM supplier
         |  WHERE s_suppkey % 10 = 0),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e
         |  UNION SELECT dst FROM e UNION SELECT node FROM sd),
         |deg AS MATERIALIZED (SELECT src AS node,
         |    CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         |ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sd),
         |r0 AS MATERIALIZED (SELECT nodes.node,
         |    CASE WHEN sd.node IS NOT NULL
         |      THEN 1000000000000 // ns.n ELSE 0 END AS rank
         |  FROM nodes LEFT JOIN sd ON sd.node = nodes.node, ns),
         |$iters
         |fin AS (SELECT node, CAST(rank AS BIGINT) AS rank FROM r3)
         |SELECT node, rank FROM fin""".stripMargin
    },
    "d73_gap_fill" ->
      // the same grid re-derived: per-(user, hour-bucket) last
      // observation by (tus, value) DESC row_number, generate_series
      // grid per user, LOCF via IGNORE NULLS last_value
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE user_id < 40),
        |b AS (SELECT user_id, tus // 3600000000 AS bucket, value,
        |    row_number() OVER (PARTITION BY user_id, tus // 3600000000
        |      ORDER BY tus DESC, value DESC) AS rn
        |  FROM e),
        |lv AS (SELECT user_id, bucket, value FROM b WHERE rn = 1),
        |sp AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |  FROM lv GROUP BY user_id),
        |g AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket
        |  FROM sp),
        |j AS (SELECT g.user_id, g.bucket, lv.value AS obs
        |  FROM g LEFT JOIN lv ON g.user_id = lv.user_id
        |    AND g.bucket = lv.bucket)
        |SELECT user_id, bucket,
        |  last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  obs IS NOT NULL AS observed
        |FROM j""".stripMargin,
    "m45_zorder_layout" ->
      // the plain rectangle scan: correct only if the z-bucket
      // enumeration admitted every directory holding a matching row
      """WITH b AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
        |    min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem, b
        |WHERE l_partkey BETWEEN pmin AND pmin + (pmax - pmin) // 8
        |  AND l_suppkey BETWEEN smin AND smin + (smax - smin) // 4""".stripMargin,
    "m46_shard_append" ->
      // d42's full-corpus formulation with m46's literals: correct only
      // if the metadata-only merge reproduced the from-scratch
      // assignment of the union exactly — shard AND pos
      graft.llm.Packing.shardAssignOracleSql(
        """SELECT doc_id,
          |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
          |    AS BIGINT) AS n_tokens
          |FROM documents""".stripMargin,
        "doc_id", nShards = 8, salt = "m46"),
    "m54_partial_compaction" ->
      // three versions of physical churn, zero logical change
      """SELECT doc_id AS id, CAST(doc_id % 16 AS INT) AS day, n_chars
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000 AS id, 5 AS day, n_chars
        |FROM documents WHERE doc_id % 16 = 5""".stripMargin,
    "m55_cdc_apply" ->
      // the same log re-stated, latest seq per key wins (ties by op
      // desc — a well-formed log never ties), deletes drop the key,
      // untouched keys copy through
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |    o_orderstatus FROM orders),
        |log AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000 AS o_totalprice,
        |    o_orderstatus, 'U' AS op, 1 AS seq
        |  FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 'D', 2
        |  FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, o_totalprice,
        |    o_orderstatus, 'U', 1
        |  FROM base WHERE o_orderkey % 11 = 0),
        |latest AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC, op DESC) AS rn FROM log)
        |  WHERE rn = 1)
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM latest WHERE op <> 'D'""".stripMargin,
    "m56_scd2_merge" ->
      // the same effective-update derivation (null-safe attribute
      // compare; no-op re-statements drop out), closed rows + inserts
      """WITH dim AS (SELECT s_suppkey, s_acctbal, s_nationkey,
        |    CAST(0 AS BIGINT) AS valid_from,
        |    CAST(99999999 AS BIGINT) AS valid_to, true AS is_current
        |  FROM supplier),
        |upd AS (
        |  SELECT s_suppkey, s_acctbal + 100 AS s_acctbal, s_nationkey
        |  FROM supplier WHERE s_suppkey % 6 = 0
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal, s_nationkey
        |  FROM supplier WHERE s_suppkey % 9 = 0 AND s_suppkey % 6 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 100000, s_acctbal, s_nationkey
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |eff AS (SELECT u.* FROM upd u
        |  LEFT JOIN dim c ON c.s_suppkey = u.s_suppkey AND c.is_current
        |  WHERE c.s_suppkey IS NULL
        |    OR u.s_acctbal IS DISTINCT FROM c.s_acctbal
        |    OR u.s_nationkey IS DISTINCT FROM c.s_nationkey)
        |SELECT d.s_suppkey, d.s_acctbal, d.s_nationkey, d.valid_from,
        |  CASE WHEN e.s_suppkey IS NOT NULL AND d.is_current
        |    THEN CAST(20260101 AS BIGINT) ELSE d.valid_to END AS valid_to,
        |  CASE WHEN e.s_suppkey IS NOT NULL AND d.is_current
        |    THEN false ELSE d.is_current END AS is_current
        |FROM dim d LEFT JOIN eff e ON e.s_suppkey = d.s_suppkey
        |UNION ALL
        |SELECT s_suppkey, s_acctbal, s_nationkey,
        |  CAST(20260101 AS BIGINT), CAST(99999999 AS BIGINT), true
        |FROM eff""".stripMargin,
    "m58_stream_agg_maintenance" ->
      // all three micro-batches' facts aggregated from scratch — the
      // per-batch folds must reproduce it exactly
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY 1""".stripMargin,
    "m66_stream_cdc_agg" ->
      // the post-apply facts aggregated from scratch: every row whose
      // changelog life ends in a delete is simply absent — the CDC
      // folds (closed-form count/sum decrements + fact-store min/max
      // rebuilds) must reproduce this exactly
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |WHERE NOT ((event_id % 3 = 0 AND event_id % 7 = 3)
        |        OR (event_id % 3 != 2 AND event_id % 5 = 2))
        |GROUP BY 1""".stripMargin,
    "m70_cdc_update_stream" ->
      // the post-apply facts from scratch: surviving rows carry their
      // LATEST image (the +1000 batch-2 update, the −500 batch-3
      // update), deleted rows are absent — native U events must land
      // exactly as if the updated values had been inserted originally.
      // Decimal arithmetic mirrors the engine branch-for-branch (one
      // exact add/sub per updated row, cast back to DECIMAL(27,2));
      // vd stays a single IEEE double add/sub per branch
      """WITH eff AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 3 = 0 AND event_id % 7 = 3
        |         THEN CAST(CAST(value AS DECIMAL(27,2))
        |              + CAST(1000 AS DECIMAL(27,2)) AS DECIMAL(27,2))
        |         WHEN event_id % 3 = 1 AND event_id % 7 = 1
        |         THEN CAST(CAST(value AS DECIMAL(27,2))
        |              - CAST(500 AS DECIMAL(27,2)) AS DECIMAL(27,2))
        |         ELSE CAST(value AS DECIMAL(27,2)) END AS v,
        |    CASE WHEN event_id % 3 = 0 AND event_id % 7 = 3
        |         THEN value + 1000.0
        |         WHEN event_id % 3 = 1 AND event_id % 7 = 1
        |         THEN value - 500.0
        |         ELSE value END AS vd
        |  FROM events
        |  WHERE NOT (event_id % 3 != 2 AND event_id % 5 = 2))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(v) AS DOUBLE) AS sum_value,
        |  MIN(vd) AS min_value, MAX(vd) AS max_value
        |FROM eff GROUP BY 1""".stripMargin,
    "m71_cdc_compacted_facts" ->
      // compaction is physical churn with zero logical change: the
      // post-apply facts aggregated from scratch, exactly as m66 —
      // batch-2 deletes (del1) plus the batch-3 single-key delete
      // slice (del2 ∧ click) are simply absent
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |WHERE NOT (event_id % 3 = 0 AND event_id % 7 = 3)
        |  AND NOT (event_id % 3 != 2 AND event_id % 5 = 2
        |           AND NOT (event_id % 3 = 0 AND event_id % 7 = 3)
        |           AND event_type = 'click')
        |GROUP BY 1""".stripMargin,
    "s23_phrase_search" ->
      // the token stream re-derived; adjacency checked positionally
      // (tk[i], tk[i+1]) — overlapping occurrences count individually
      phraseOracleSql("SELECT doc_id, text FROM documents"),
    "s25_phrase_indexed" ->
      // an index is a snapshot: the persisted-postings probe must equal
      // the from-scratch phrase derivation over the frozen corpus
      phraseOracleSql("SELECT doc_id, text FROM documents"),
    "m61_positional_append" ->
      // rebuild-equality: after the append, the probe must serve
      // exactly what a from-scratch build over the unioned corpus would
      phraseOracleSql("SELECT doc_id, text FROM documents"),
    "m62_positional_takedown" ->
      // the surviving corpus only — revoked docs must vanish from
      // every posting slice the probe reads
      phraseOracleSql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 5 != 3"),
    "m72_cdc_auto_compaction" ->
      // an auto-fired compaction is physical churn with zero logical
      // change: the post-apply facts aggregated from scratch — the
      // deleted click slice is simply absent
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |WHERE NOT (event_id % 5 = 2 AND event_type = 'click')
        |GROUP BY 1""".stripMargin,
    "m59_multilevel_compaction" ->
      // two versions of physical churn over a two-level layout, zero
      // logical change
      """SELECT doc_id AS id, CAST(doc_id % 4 AS INT) AS day,
        |  CAST(doc_id % 3 AS INT) AS hour, n_chars
        |FROM documents""".stripMargin,
    "m57_agg_maintenance" ->
      // the merge invariant stated directly: a from-scratch aggregation
      // of ALL facts — the incremental state ∪ delta fold must equal it
      // bit-for-bit (sums via exact decimals, double cast at the end)
      """SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)
        |    AS sum_price,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "m60_retraction_maintenance" ->
      // the retraction invariant stated directly: a from-scratch
      // aggregation of the POST-APPLY facts (pre − deletes ∪ inserts;
      // inserts are %4=1, deletes the %5=2 slice of the pre facts) —
      // the closed-form decrements plus touched-key min/max rebuild
      // must equal it bit-for-bit
      """SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)
        |    AS sum_price,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem
        |WHERE l_orderkey % 4 = 1 OR l_orderkey % 5 != 2
        |GROUP BY 1""".stripMargin,
    "m48_incremental_refresh" ->
      // s09's formulation over the NEW corpus version: correct only if
      // the retract+append pair reproduced exactly the df/N/Σdl and
      // postings a from-scratch index of the new version carries
      TextAnalysis.bm25OracleSql(
        """SELECT doc_id,
          |  CASE WHEN doc_id % 11 = 2 THEN text || ' rev2' ELSE text END
          |    AS text
          |FROM documents WHERE doc_id % 7 != 3""".stripMargin,
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(
          |  CASE WHEN doc_id % 11 = 2 THEN text || ' rev2' ELSE text END
          |), ' '), x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id % 7 != 3 AND doc_id < 3""".stripMargin,
        k = 5),
    "m47_stream_interval_join" ->
      // the batch interval join the closed-input stream must equal
      """SELECT v.user_id AS user_id, v.event_id AS view_id,
        |  c.event_id AS click_id,
        |  epoch_us(v.ts) AS vts, epoch_us(c.ts) AS cts
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id
        |  AND v.event_type = 'view' AND c.event_type = 'click'
        |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR""".stripMargin,
    "m49_stream_interval_left_join" ->
      // the batch LEFT join the flushed closed-input stream must equal
      """SELECT v.user_id AS user_id, v.event_id AS view_id,
        |  c.event_id AS click_id,
        |  epoch_us(v.ts) AS vts, epoch_us(c.ts) AS cts
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR""".stripMargin,
    "m50_stream_interval_full_join" ->
      // the batch FULL join the flushed closed-input stream must equal
      """SELECT coalesce(v.user_id, c.user_id) AS user_id,
        |  v.event_id AS view_id, c.event_id AS click_id,
        |  epoch_us(v.ts) AS vts, epoch_us(c.ts) AS cts
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR""".stripMargin,
    "m51_stream_exact_dedup" ->
      // closed input within one horizon == the batch DISTINCT keys
      """SELECT DISTINCT
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "m53_stream_dedup_insert" ->
      // closed input == batch dedup-insert: distinct fingerprints of
      // corpus ∪ planted copies (add nothing) ∪ fresh texts, enriched
      // by the same key-derived 16-row dimension
      """WITH stream AS (
        |  SELECT text FROM documents
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 3
        |  UNION ALL SELECT text || ' fresh rev' FROM documents
        |    WHERE doc_id % 10 = 4
        |), keyed AS (
        |  SELECT DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM stream
        |)
        |SELECT fp, 'grp_' || substr(fp, 1, 1) AS lbl FROM keyed""".stripMargin,
    "m52_stream_sessions" ->
      // the d15 gap derivation (strict > gap starts a new session —
      // session_window merges TOUCHING windows, spec-pinned) with
      // end = last event + gap
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |f AS (SELECT user_id, tus,
        |        CASE WHEN lag(tus) OVER w IS NULL
        |               OR tus - lag(tus) OVER w > 1800000000 THEN 1
        |             ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |sess AS (SELECT user_id, tus,
        |           CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY tus)
        |                AS BIGINT) AS session_seq
        |         FROM f)
        |SELECT user_id, MIN(tus) AS start_us,
        |       MAX(tus) + 1800000000 AS end_us, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,
    "q35_moving_revenue" ->
      // same epoch-day key, same VALUE-based frame, decimal un-cast
      // inside the frame
      """WITH daily AS (SELECT
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS rev,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT day, n_orders, CAST(rev AS DOUBLE) AS day_rev,
        |  CAST(SUM(rev) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rev_7d
        |FROM daily""".stripMargin,
    "q36_priority_pivot" ->
      // the CASE-split q32 pattern IS the pivot's semantics — stated
      // directly, column per listed value
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE)
        |    AS "1_urgent",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE)
        |    AS "2_high",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE)
        |    AS "3_medium",
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |    THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE)
        |    AS "4_not_specified",
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
        |    THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE)
        |    AS "5_low"
        |FROM orders GROUP BY 1""".stripMargin,
    "q34_disjunctive_revenue" ->
      s"""SELECT
         |${dsum("l_extendedprice * (1 - l_discount)", 4, "revenue")}
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 20
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "d71_expanded_takedown" ->
      // the d09 recursive transitive closure, then DuckDB's own
      // cluster-membership expansion of the seed set
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
         |clusters AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
         |seeds AS (SELECT doc_id AS id FROM documents WHERE doc_id % 250 = 8),
         |rc AS (SELECT DISTINCT cluster FROM clusters
         |       SEMI JOIN seeds USING (id)),
         |rv AS (SELECT id FROM clusters SEMI JOIN rc USING (cluster)
         |       UNION SELECT id FROM seeds)
         |SELECT d.doc_id, d.doc_id IN (SELECT id FROM rv) AS revoked
         |FROM documents d""".stripMargin,
    "q26_top_supplier" ->
      // the CTE-view + scalar-max statement itself (Q15's WITH form)
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
        |      AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT MAX(rev) FROM revenue)""".stripMargin,
    "q25_national_balance_share" ->
      // the HAVING-with-scalar-subquery statement itself; DuckDB plans
      // it its own way, the Spark side is the broadcast-global filter
      """SELECT n_name,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(27,2))) AS DOUBLE)
        |    AS total_bal,
        |  COUNT(*) AS n_suppliers
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n_name
        |HAVING SUM(CAST(s_acctbal AS DECIMAL(27,2))) * 25 >
        |  (SELECT SUM(CAST(s_acctbal AS DECIMAL(27,2))) FROM supplier)""".stripMargin,
    "q24_inactive_high_balance" ->
      // the CORRELATED/subquery statement itself — uncorrelated scalar
      // avg threshold (exact decimal avg, the q01 convention) + NOT
      // EXISTS; DuckDB decorrelates its way, the Spark side is the
      // hand-decorrelated broadcast-threshold + left-anti plan
      s"""SELECT c_mktsegment,
         |  COUNT(*) AS n_cust,
         |  ${dsum("c_acctbal", 2, "total_bal")}
         |FROM customer c
         |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2)))
         |      AS DOUBLE) / COUNT(c_acctbal)
         |    FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
         |GROUP BY c_mktsegment""".stripMargin,
    "d67_cardinality_monitor" ->
      // independent formulation: DuckDB's own ROLLUP + count(DISTINCT);
      // the [NULL] unnest arm mirrors explode_outer so tokenless docs
      // still count toward distinct_docs
      """WITH tok AS (SELECT source, doc_id,
        |    unnest(CASE WHEN len(toks) = 0 THEN [CAST(NULL AS VARCHAR)]
        |           ELSE toks END) AS term
        |  FROM (SELECT source, doc_id,
        |      list_filter(string_split(lower(coalesce(text, '')), ' '),
        |        x -> x != '') AS toks
        |    FROM documents))
        |SELECT coalesce(source, '__all__') AS source,
        |  CAST(GROUPING(source) AS INT) AS is_total,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS distinct_docs,
        |  CAST(count(term) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT term) AS BIGINT) AS distinct_terms
        |FROM tok GROUP BY ROLLUP(source)""".stripMargin,
    "d62_edit_canonical" ->
      // naive edit pairs (the d58 formulation) -> recursive transitive
      // closure (the d09 pattern) -> DuckDB's own window for the keep rule
      """WITH RECURSIVE d AS (SELECT doc_id, text, length(text) AS l,
        |    length(text) - length(replace(text, ' ', '')) AS sp,
        |    length(text) - length(replace(text, 'e', '')) AS ec
        |  FROM documents),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |    AND abs(a.l - b.l) <= 8 AND abs(a.sp - b.sp) <= 8
        |    AND abs(a.ec - b.ec) <= 8
        |  WHERE levenshtein(a.text, b.text) <= 8),
        |edges AS (SELECT id1 AS a, id2 AS b FROM p
        |          UNION ALL SELECT id2, id1 FROM p),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
        |cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
        |SELECT cl.id, cl.cluster,
        |  row_number() OVER (PARTITION BY cl.cluster
        |    ORDER BY length(dd.text) DESC, cl.id) = 1 AS keep
        |FROM cl JOIN documents dd ON dd.doc_id = cl.id""".stripMargin,
    "d61_vocab_growth" ->
      // independent formulation: the naive per-tenth distinct counts over
      // the exploded sub-corpora (the B-fold expansion the Spark side's
      // first-seen-bucket histogram avoids)
      """WITH tok AS (SELECT doc_id, doc_id % 10 AS b,
        |    unnest(list_filter(string_split(lower(coalesce(text, '')),
        |      ' '), x -> x != '')) AS term
        |  FROM documents),
        |t AS (SELECT unnest(range(1, 11)) AS tenth)
        |SELECT tenth,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT term) AS BIGINT) AS vocab
        |FROM t JOIN tok ON tok.b < t.tenth
        |GROUP BY 1""".stripMargin,
    "d64_winsorized_mean" ->
      // independent formulation: DuckDB's NATIVE quantile_cont for the
      // band, its own LEAST/GREATEST clamp, SUM/COUNT mean
      """WITH q AS (SELECT source,
        |    CAST(quantile_cont(n_chars, 0.25) AS DOUBLE) AS lo,
        |    CAST(quantile_cont(n_chars, 0.75) AS DOUBLE) AS hi
        |  FROM documents GROUP BY 1)
        |SELECT d.source, MAX(lo) AS lo, MAX(hi) AS hi,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(LEAST(GREATEST(d.n_chars, lo), hi)) / COUNT(*) AS wmean
        |FROM documents d JOIN q USING (source)
        |GROUP BY d.source""".stripMargin,
    "d60_robust_outliers" ->
      // independent formulation: DuckDB's native median at both levels
      """WITH med AS (SELECT source, CAST(median(n_chars) AS DOUBLE) AS med
        |  FROM documents GROUP BY 1),
        |dev AS (SELECT d.source, abs(d.n_chars - m.med) AS dv, m.med
        |  FROM documents d JOIN med m USING (source)),
        |mad AS (SELECT source, CAST(median(dv) AS DOUBLE) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.source, MAX(dev.med) AS med, MAX(a.mad) AS mad,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) FILTER (WHERE dv > 3.5 * a.mad) AS BIGINT)
        |    AS n_outliers
        |FROM dev JOIN mad a USING (source)
        |GROUP BY dev.source""".stripMargin,
    "d59_weighted_quantiles" ->
      // independent formulation: brute-force expansion (each row unnested
      // weight times) + DuckDB's NATIVE quantile_disc — no shared
      // cumulative-window code path with the Spark side
      """WITH w AS (SELECT source, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS BIGINT) AS wt
        |  FROM documents),
        |e AS (SELECT source, n_chars FROM w, UNNEST(range(wt)))
        |SELECT source,
        |  quantile_disc(n_chars, 0.25) AS wq25,
        |  quantile_disc(n_chars, 0.5) AS wq50,
        |  quantile_disc(n_chars, 0.75) AS wq75,
        |  CAST(COUNT(*) AS BIGINT) AS total_weight
        |FROM e GROUP BY source""".stripMargin,
    "d58_edit_neardups" ->
      // independent formulation: naive pairwise join with three LOSSLESS
      // prunes (|Δlen|, |Δspaces|, |Δ'e'-count| — each edit moves any
      // single-char frequency by at most 1, so all are <= the distance)
      // and DuckDB's own full-DP levenshtein
      """WITH d AS (SELECT doc_id, text, length(text) AS l,
        |    length(text) - length(replace(text, ' ', '')) AS sp,
        |    length(text) - length(replace(text, 'e', '')) AS ec
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  AND abs(a.l - b.l) <= 8 AND abs(a.sp - b.sp) <= 8
        |  AND abs(a.ec - b.ec) <= 8
        |WHERE levenshtein(a.text, b.text) <= 8""".stripMargin,
    "d57_drift_by_source" ->
      // per-stratum TVD vs the refresh-slice reference; the
      // reference-only mass enters via nb - sum(matched cb), never a
      // stratum x vocabulary expansion
      """WITH prof AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cb FROM (
        |    SELECT unnest(list_filter(string_split(lower(coalesce(text, '')),
        |      ' '), x -> x != '')) AS term FROM documents
        |    WHERE doc_id % 4 != 0)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb FROM prof),
        |cur AS (SELECT stratum, term, CAST(COUNT(*) AS BIGINT) AS ca FROM (
        |    SELECT source AS stratum, unnest(list_filter(string_split(
        |      lower(coalesce(text, '')), ' '), x -> x != '')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |nas AS (SELECT stratum, CAST(SUM(ca) AS BIGINT) AS na FROM cur
        |  GROUP BY 1),
        |j AS (SELECT c.stratum, c.ca, coalesce(p.cb, 0) AS cb, na, nb
        |  FROM cur c JOIN nas USING (stratum) LEFT JOIN prof p
        |    USING (term), tot),
        |g AS (SELECT stratum, MAX(na) AS na, MAX(nb) AS nb,
        |    CAST(SUM(abs(ca * nb - cb * na)) AS BIGINT)
        |      + MAX(na) * (MAX(nb) - CAST(SUM(cb) AS BIGINT)) AS drift_num
        |  FROM j GROUP BY 1)
        |SELECT stratum, na, nb, drift_num,
        |  CAST(drift_num AS DOUBLE) /
        |    (CAST(2.0 AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |    AS tvd
        |FROM g""".stripMargin,
    "d56_profile_familiarity" ->
      // reference vocabulary re-derived from the refresh slice alone
      // (v2 pinning is the tested contract); LEFT join so absent terms
      // carry cnt NULL -> novel mass; novel ⊆ rare by 0 < ref_total
      """WITH prof AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(list_filter(string_split(lower(coalesce(text, '')),
        |      ' '), x -> x != '')) AS term FROM documents
        |    WHERE doc_id % 4 != 0)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ref_total FROM prof),
        |tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id AS id, unnest(list_filter(string_split(
        |      lower(coalesce(text, '')), ' '), x -> x != '')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |j AS (SELECT id, tf.tf, prof.cnt, ref_total
        |  FROM tf LEFT JOIN prof USING (term), tot),
        |g AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(tf * coalesce(cnt, 0)) AS BIGINT) AS ref_mass,
        |    CAST(SUM(CASE WHEN cnt IS NULL THEN tf ELSE 0 END) AS BIGINT)
        |      AS novel_tokens,
        |    CAST(SUM(CASE WHEN coalesce(cnt, 0) * 100 < ref_total
        |      THEN tf ELSE 0 END) AS BIGINT) AS rare_tokens
        |  FROM j GROUP BY 1)
        |SELECT id, n_tokens, ref_mass, novel_tokens, rare_tokens,
        |  CAST(ref_mass AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS mean_ref_freq,
        |  CAST(novel_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS novel_rate
        |FROM g""".stripMargin,
    "d55_mix_shards" -> mixShardsOracleSql,
    "m34_balanced_shard_layout" ->
      // the materialized layout round-trips the d55 assignment exactly
      // (in-shard sort order is invisible to the order-insensitive
      // compare) — one oracle serves both
      mixShardsOracleSql,
    "d54_calibrated_quality" ->
      // the INDEPENDENT formulation: DuckDB's native percent_rank()
      // window over the raw docs — the Spark side never sorts docs
      // (histogram + broadcast join-back); (rank-1)/(n-1) is one
      // integer-to-double division on both engines, bit-identical
      """WITH f AS (SELECT doc_id AS id, source AS strata,
        |    CASE WHEN n_toks = 0 THEN CAST(0 AS BIGINT)
        |      ELSE (1000 * n_uniq) // n_toks END AS score
        |  FROM (SELECT doc_id, source,
        |      CAST(len(list_filter(string_split(lower(coalesce(text, '')),
        |        ' '), x -> x != '')) AS BIGINT) AS n_toks,
        |      CAST(len(list_distinct(list_filter(string_split(
        |        lower(coalesce(text, '')), ' '), x -> x != ''))) AS BIGINT)
        |        AS n_uniq
        |    FROM documents))
        |SELECT id, strata, score,
        |  CAST(rank() OVER w - 1 AS BIGINT) AS n_below,
        |  CAST(count(*) OVER (PARTITION BY strata) AS BIGINT) AS n_stratum,
        |  percent_rank() OVER w AS pct
        |FROM f
        |WINDOW w AS (PARTITION BY strata ORDER BY score)""".stripMargin,
    "d53_semantic_dispersion" ->
      // same floor(x*2^12 + 0.5) write-out as the s11 family, same
      // one-aggregate shape; HUGEINT sums cast to BIGINT, one double
      // division in the same left-to-right order
      """WITH q AS (SELECT CAST(label AS VARCHAR) AS stratum, i AS pos,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
        |      * 4096.0 + 0.5) AS BIGINT) AS qv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |s AS (SELECT stratum, pos, CAST(SUM(qv) AS BIGINT) AS sv,
        |    CAST(SUM(qv * qv) AS BIGINT) AS sq,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM q GROUP BY 1, 2),
        |f AS (SELECT stratum, MAX(c) AS n,
        |    CAST(SUM(sq) AS BIGINT) AS sum_sq,
        |    CAST(SUM(sv * sv) AS BIGINT) AS cent_sq
        |  FROM s GROUP BY 1)
        |SELECT stratum, n, sum_sq, cent_sq,
        |  CAST(n * sum_sq - cent_sq AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 4096.0 * 4096.0)
        |    AS dispersion
        |FROM f""".stripMargin,
    "d52_skew_profile" ->
      // same quantile_cont quartiles, same double mean/ratio expression
      // order, same integer-ceil salt formula (// is DuckDB's integral
      // division)
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(n) AS BIGINT) AS n_rows,
        |    CAST(MAX(n) AS BIGINT) AS max_n,
        |    quantile_cont(n, 0.25) AS q25,
        |    quantile_cont(n, 0.5) AS q50,
        |    quantile_cont(n, 0.75) AS q75
        |  FROM c)
        |SELECT n_keys, n_rows, max_n, q25, q50, q75,
        |  CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS mean_n,
        |  CAST(max_n AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) AS skew_ratio,
        |  (max_n * 32 + n_rows - 1) // n_rows AS salt_suggest
        |FROM s""".stripMargin,
    "d51_budget_select" ->
      // the one-global-window formulation: exclusive running token sum
      // in (score desc, id) order, whole-doc-fits selection rule —
      // integer end to end
      """WITH f AS (SELECT doc_id,
        |    CAST(len(list_distinct(list_filter(string_split(lower(text), ' '),
        |      x -> x != ''))) AS BIGINT) AS score,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, score, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cum_before,
        |  (COALESCE(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + n_tokens <= 15000) AS selected
        |FROM f""".stripMargin,
    "m29_stream_heavy_hitters" ->
      // d50's exact-regime oracle verbatim: capacity exceeds the vocab,
      // so the streamed sketch must reproduce the exact multiset counts
      // regardless of micro-batch boundaries
      """SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT lang,
        |        unnest(list_filter(string_split(lower(text), ' '),
        |          x -> x != '')) AS term
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    "d50_heavy_hitters" ->
      // exact-regime oracle: capacity (64) exceeds the distinct-term
      // count, so the sketch IS the exact multiset count — plain
      // lang x term GROUP BY
      """SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT lang,
        |        unnest(list_filter(string_split(lower(text), ' '),
        |          x -> x != '')) AS term
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    "d46_source_scorecard" -> {
      // same fingerprint (d01's normalized md5), same OR of the rule
      // table's patterns (regexp_matches ≡ regexp_count > 0), same
      // window-min dup rule, one double division per source
      val piiAny = graft.llm.Pii.defaultRules
        .map(r => s"regexp_matches(text, '${r.pattern.replace("'", "''")}')")
        .mkString(" OR ")
      s"""WITH base AS (SELECT source, doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS BIGINT) AS n_toks,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    CASE WHEN $piiAny THEN 1 ELSE 0 END AS has_pii
         |  FROM documents),
         |dup AS (SELECT *, CASE WHEN doc_id != MIN(doc_id) OVER (PARTITION BY fp)
         |    THEN 1 ELSE 0 END AS is_dup FROM base)
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS mean_tokens,
         |  CAST(SUM(is_dup) AS BIGINT) AS dup_docs,
         |  CAST(SUM(has_pii) AS BIGINT) AS pii_docs
         |FROM dup GROUP BY 1""".stripMargin
    },
    "d45_leak_split" ->
      // d09's recursive transitive closure for the cluster reps, then
      // the corpus LEFT JOINs the labels (singletons coalesce to their
      // own id) and the side is the same salted-md5 threshold cut the
      // sampling family uses — thresholds generated by rateThreshold
      s"""WITH RECURSIVE ${duckLshPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
         |cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
         |SELECT d.doc_id,
         |  COALESCE(cl.cluster, d.doc_id) AS rep,
         |  CASE WHEN substr(md5('split7|'
         |      || CAST(COALESCE(cl.cluster, d.doc_id) AS VARCHAR)), 1, 8)
         |    < '${graft.llm.Sampling.rateThreshold(0.25)}' THEN 'heldout'
         |    ELSE 'train' END AS side
         |FROM documents d LEFT JOIN cl ON cl.id = d.doc_id""".stripMargin,
    "d12_string_clusters" ->
      // d09's recursive-closure oracle over string keys: MIN(varchar) is
      // lexicographic, matching the surrogate translation's keeper choice
      s"""WITH RECURSIVE
         |skeys AS (SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_id, text
         |          FROM documents),
         |${duckLshPairsCte("skeys")},
         |edges AS (SELECT id1 AS a, id2 AS b FROM ndpairs
         |          UNION ALL SELECT id2, id1 FROM ndpairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster, (id = MIN(r)) AS keep
         |FROM reach GROUP BY id""".stripMargin,
    "d05_simhash" -> {
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val hs = s"list_transform($toks, t -> ('0x' || substr(md5(t),1,8))::BIGINT::HUGEINT * 4294967296" +
        s" + ('0x' || substr(md5(t),9,8))::BIGINT)"
      val bits = (63 to 0 by -1).map { j =>
        val p = BigInt(1) << j
        s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"SELECT doc_id, $bits AS simhash FROM (SELECT doc_id, $hs AS hs FROM documents)"
    },
    "d14_simhash_neardups" -> {
      // d05's simhash construction, then the SAME pigeonhole banding the
      // Spark plan uses (4 x 16-bit chunks, bucket cap mirrored) and a
      // char-compare Hamming verify — an independent formulation of the
      // distance (the Spark side parses chunks to longs and bit_counts
      // the xor)
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val hs = s"list_transform($toks, t -> ('0x' || substr(md5(t),1,8))::BIGINT::HUGEINT * 4294967296" +
        s" + ('0x' || substr(md5(t),9,8))::BIGINT)"
      val bits = (63 to 0 by -1).map { j =>
        val p = BigInt(1) << j
        s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"""WITH sh AS (SELECT doc_id, $bits AS sig
         |            FROM (SELECT doc_id, $hs AS hs FROM documents)),
         |b0 AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |         b -> CAST(b AS VARCHAR) || '|' || substr(sig, CAST(b*16+1 AS BIGINT), 16))) AS band
         |       FROM sh),
         |bok AS (SELECT band FROM b0 GROUP BY band HAVING COUNT(*) <= CAPLIT),
         |bf AS (SELECT b0.* FROM b0 JOIN bok USING (band)),
         |cands AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |          FROM bf a JOIN bf b USING (band) WHERE a.doc_id < b.doc_id),
         |p AS (SELECT id1, id2,
         |        CAST(len(list_filter(range(1, 65),
         |          i -> substr(x.sig, i, 1) != substr(y.sig, i, 1))) AS BIGINT) AS hamming
         |      FROM cands JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2)
         |SELECT id1, id2, hamming FROM p WHERE hamming <= 3""".stripMargin
        .replace("CAPLIT", lastBucketCap.toString)
    },
    "d66_simhash_recall" -> {
      // truth: scheme-independent brute-force all-pairs hamming (the d21
      // statement). Tiers: the d14 4x16-bit band pipeline and the d21
      // 6C3 combination-key pipeline, both capped — re-derived in SQL
      // from the STRING signature (substr-concat keys; bit-string
      // equality == the Spark side's packed-long equality at fixed
      // widths). Heavy CTEs MATERIALIZED (DuckDB inlines by default and
      // sh/tr/bp/cp are each read 2-3x).
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val hs = s"list_transform($toks, t -> ('0x' || substr(md5(t),1,8))::BIGINT::HUGEINT * 4294967296" +
        s" + ('0x' || substr(md5(t),9,8))::BIGINT)"
      val bits = (63 to 0 by -1).map { j =>
        val p = BigInt(1) << j
        s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      // same near-equal 64-bit split + combination enumeration as
      // Dedup.simhashNearDupPairsCombined (chunks=6, agree=3)
      val widths = (0 until 6).map(i => 64 / 6 + (if (i < 64 % 6) 1 else 0))
      val starts = widths.scanLeft(0)(_ + _)
      val comboKeys = (0 until 6).combinations(3).toSeq.zipWithIndex
        .map { case (combo, ci) =>
          val parts = combo
            .map(i => s"substr(sig, ${starts(i) + 1}, ${widths(i)})")
            .mkString(" || ")
          s"'$ci|' || $parts"
        }.mkString(", ")
      s"""WITH sh AS MATERIALIZED (SELECT doc_id, $bits AS sig
         |            FROM (SELECT doc_id, $hs AS hs FROM documents)),
         |tr AS MATERIALIZED (SELECT a.doc_id AS id1, b.doc_id AS id2
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(1, 65),
         |    i -> substr(a.sig, i, 1) != substr(b.sig, i, 1))) <= 3),
         |b0 AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |         b -> CAST(b AS VARCHAR) || '|' || substr(sig, CAST(b*16+1 AS BIGINT), 16))) AS band
         |       FROM sh),
         |bok AS (SELECT band FROM b0 GROUP BY band HAVING COUNT(*) <= CAPLIT),
         |bf AS (SELECT b0.* FROM b0 JOIN bok USING (band)),
         |bc AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |       FROM bf a JOIN bf b USING (band) WHERE a.doc_id < b.doc_id),
         |bp AS MATERIALIZED (SELECT id1, id2 FROM bc
         |  JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2
         |  WHERE len(list_filter(range(1, 65),
         |    i -> substr(x.sig, i, 1) != substr(y.sig, i, 1))) <= 3),
         |c0 AS (SELECT doc_id, unnest([$comboKeys]) AS band FROM sh),
         |cok AS (SELECT band FROM c0 GROUP BY band HAVING COUNT(*) <= CAPLIT),
         |cf AS (SELECT c0.* FROM c0 JOIN cok USING (band)),
         |cc AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |       FROM cf a JOIN cf b USING (band) WHERE a.doc_id < b.doc_id),
         |cp AS MATERIALIZED (SELECT id1, id2 FROM cc
         |  JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2
         |  WHERE len(list_filter(range(1, 65),
         |    i -> substr(x.sig, i, 1) != substr(y.sig, i, 1))) <= 3),
         |sel AS (
         |  SELECT 'band' AS tier,
         |    (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_true,
         |    (SELECT CAST(count(*) AS BIGINT) FROM bp) AS n_found,
         |    (SELECT CAST(count(*) AS BIGINT) FROM bp SEMI JOIN tr
         |       USING (id1, id2)) AS n_hit
         |  UNION ALL
         |  SELECT 'combined',
         |    (SELECT CAST(count(*) AS BIGINT) FROM tr),
         |    (SELECT CAST(count(*) AS BIGINT) FROM cp),
         |    (SELECT CAST(count(*) AS BIGINT) FROM cp SEMI JOIN tr
         |       USING (id1, id2)))
         |SELECT tier, n_true, n_found, n_hit,
         |  CASE WHEN n_true = 0 THEN 1.0
         |       ELSE CAST(n_hit AS DOUBLE) / n_true END AS recall,
         |  CASE WHEN n_found = 0 THEN 1.0
         |       ELSE CAST(n_hit AS DOUBLE) / n_found END AS precision
         |FROM sel""".stripMargin
        .replace("CAPLIT", lastBucketCap.toString)
    },
    "d21_simhash_combined" -> {
      // brute-force all-pairs hamming over d05's simhash construction —
      // deliberately INDEPENDENT of the chunk-combination blocking under
      // test (exact recall means blocked == brute force)
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val hs = s"list_transform($toks, t -> ('0x' || substr(md5(t),1,8))::BIGINT::HUGEINT * 4294967296" +
        s" + ('0x' || substr(md5(t),9,8))::BIGINT)"
      val bits = (63 to 0 by -1).map { j =>
        val p = BigInt(1) << j
        s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"""WITH sh AS (SELECT doc_id, $bits AS sig
         |            FROM (SELECT doc_id, $hs AS hs FROM documents)),
         |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
         |        CAST(len(list_filter(range(1, 65),
         |          i -> substr(a.sig, i, 1) != substr(b.sig, i, 1))) AS BIGINT) AS hamming
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id1, id2, hamming FROM p WHERE hamming <= 3""".stripMargin
    },
    "d15_sessions" -> sessionsOracle,
    "d17_salted_sessions" ->
      // the salted path must produce EXACTLY the unsalted sessions —
      // same oracle, independent of the range split
      sessionsOracle,
    "d16_hash_sample" ->
      // same md5 hash, same thresholds (built by the same rateThreshold),
      // same lexicographic hex compare — the portability claim IS the test
      s"""SELECT doc_id, lang FROM documents
         |WHERE substr(md5('s42|' || CAST(doc_id AS VARCHAR)), 1, 8) <
         |  CASE WHEN lang = 'en' THEN '${graft.llm.Sampling.rateThreshold(0.3)}'
         |       WHEN lang = 'zh' THEN '${graft.llm.Sampling.rateThreshold(0.8)}'
         |       ELSE '${graft.llm.Sampling.rateThreshold(0.5)}' END""".stripMargin,
    "d20_bloom_dedup" ->
      // the bloom pre-filter is an optimization, not a semantics change:
      // the oracle is the PLAIN anti-join on the same fingerprints.
      // NOT EXISTS, not NOT IN: left_anti keeps null-key rows, and NOT IN
      // collapses to no-rows if the subquery ever contains a null
      """WITH fp AS (SELECT doc_id,
        |              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |            FROM documents),
        |ex AS (SELECT DISTINCT fp FROM fp WHERE doc_id < 250)
        |SELECT f.doc_id, f.fp FROM fp f
        |WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.fp = f.fp)""".stripMargin,
    "d18_keywords" ->
      // identical rational tf-idf: integer tf/N/df, score = (tf * N) / df
      // as one double multiply+divide (left-assoc on both sides)
      """WITH t AS (SELECT doc_id,
        |             unnest(list_filter(string_split(lower(text), ' '),
        |                                x -> x != '')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT doc_id, term, tf, df,
        |        tf * (SELECT COUNT(*) FROM documents)::DOUBLE / df AS score
        |      FROM tf JOIN d USING (term))
        |SELECT doc_id, term, tf, df, score, CAST(rk AS INTEGER) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, term ASC) AS rk FROM s)
        |WHERE rk <= 3""".stripMargin,
    "d19_stratified_take" ->
      // same sampling hash, same (hash, key) ordering, same per-stratum
      // cutoff — the deterministic balanced subset reproduced in SQL
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY substr(md5('s7|' || CAST(doc_id AS VARCHAR)), 1, 8) ASC,
        |             doc_id ASC) AS rk
        |  FROM documents) WHERE rk <= 20""".stripMargin,
    "d08_minhash_estimate" -> {
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val sh =
        s"""CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')]
           | ELSE list_transform(range(0, len($toks) - 2),
           |   i -> array_to_string(list_slice($toks, i+1, i+3), ' ')) END""".stripMargin
      val bandkeys = (0 until 4)
        .map(b => s"md5('$b' || '|' || array_to_string(list_slice(sig, ${b * 3 + 1}, ${b * 3 + 3}), '|'))")
        .mkString(", ")
      s"""WITH shingled AS (SELECT doc_id, $sh AS sh FROM documents),
         |hashed AS (SELECT doc_id, $duckHashPairs AS hp FROM shingled),
         |sigs AS (SELECT doc_id, [${duckMinhash(12)}] AS sig FROM hashed),
         |bands AS (SELECT doc_id, unnest([$bandkeys]) AS band FROM sigs),
         |cands AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |          FROM bands a JOIN bands b USING (band) WHERE a.doc_id < b.doc_id)
         |SELECT id1, id2,
         |  CAST(len(list_filter(range(1, 13), i -> x.sig[i] = y.sig[i])) AS DOUBLE)
         |    / CAST(len(x.sig) AS DOUBLE) AS est_jaccard
         |FROM cands JOIN sigs x ON x.doc_id = id1 JOIN sigs y ON y.doc_id = id2""".stripMargin
    },
    "d07_winnowing" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
        |      i -> md5(substr(lower(text), i, 8))) AS grams
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(grams) - 3, 1) + 1),
        |    j -> list_min(list_slice(grams, j, j + 3)))) AS fps
        |  FROM g)
        |SELECT doc_id, unnest(fps) AS fp FROM w""".stripMargin,
    "d10_winnow_overlap" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
        |      i -> md5(substr(lower(text), i, 8))) AS grams
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(grams) - 3, 1) + 1),
        |    j -> list_min(list_slice(grams, j, j + 3)))) AS fps
        |  FROM g),
        |f0 AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        |ok AS (SELECT fp FROM f0 GROUP BY fp HAVING COUNT(*) <= CAPLIT),
        |f AS (SELECT f0.* FROM f0 JOIN ok USING (fp)),
        |n AS (SELECT doc_id, COUNT(*) AS nf FROM f GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
        |      FROM f a JOIN f b USING (fp) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id1, id2, sim FROM (
        |  SELECT id1, id2,
        |    CAST(n_shared AS DOUBLE) / (x.nf + y.nf - n_shared) AS sim
        |  FROM p JOIN n x ON x.doc_id = id1 JOIN n y ON y.doc_id = id2)
        |WHERE sim >= 0.3""".stripMargin
        // mirror the query side's derived fp-bucket cap
        .replace("CAPLIT", lastBucketCap.toString),
    "d25_containment" ->
      // d10's fp machinery with the containment denominator: shared over
      // the smaller surviving fp set
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
        |      i -> md5(substr(lower(text), i, 8))) AS grams
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(grams) - 3, 1) + 1),
        |    j -> list_min(list_slice(grams, j, j + 3)))) AS fps
        |  FROM g),
        |f0 AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        |ok AS (SELECT fp FROM f0 GROUP BY fp HAVING COUNT(*) <= CAPLIT),
        |f AS (SELECT f0.* FROM f0 JOIN ok USING (fp)),
        |n AS (SELECT doc_id, COUNT(*) AS nf FROM f GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
        |      FROM f a JOIN f b USING (fp) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id1, id2, containment FROM (
        |  SELECT id1, id2,
        |    CAST(n_shared AS DOUBLE) / least(x.nf, y.nf) AS containment
        |  FROM p JOIN n x ON x.doc_id = id1 JOIN n y ON y.doc_id = id2)
        |WHERE containment >= 0.6""".stripMargin
        .replace("CAPLIT", lastBucketCap.toString),
    "d06_ngram_jaccard" -> {
      val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
      val sh =
        s"""CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')]
           | ELSE list_transform(range(0, len($toks) - 2),
           |   i -> array_to_string(list_slice($toks, i+1, i+3), ' ')) END""".stripMargin
      s"""WITH d AS (SELECT doc_id, list_distinct($sh) AS sh FROM documents)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |       ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |         / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) END AS jaccard
         |FROM d a JOIN d b ON b.doc_id = a.doc_id + 250""".stripMargin
    },
    "s01_brute_topk" -> {
      val cos = duckCos("q.embedding", "c.embedding")
      s"""SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS score,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
         |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
         |  WHERE q.vec_id != c.vec_id)
         |WHERE rnk <= 5""".stripMargin
    },
    "s24_hard_negatives" -> {
      // the s01 formulation plus the cross-label exclusion riding the
      // same predicate position
      val cos = duckCos("q.embedding", "c.embedding")
      s"""SELECT query_id, corpus_id, score,
         |  CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    $cos AS score,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cos DESC, c.vec_id) AS rnk
         |  FROM (SELECT * FROM embeddings WHERE vec_id >= 10) c
         |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
         |  WHERE q.vec_id != c.vec_id AND c.label <> q.label)
         |WHERE rnk <= 5""".stripMargin
    },
    "s22_knn_classify" -> {
      // the s01 top-k formulation over the labeled pool (vec_id >= 10),
      // then the same (votes DESC, label ASC) argmax
      val cos = duckCos("q.embedding", "c.embedding")
      s"""WITH tk AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY $cos DESC, c.vec_id) AS rnk
         |    FROM (SELECT * FROM embeddings WHERE vec_id >= 10) c
         |    CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
         |    WHERE q.vec_id != c.vec_id)
         |  WHERE rnk <= 5),
         |votes AS (SELECT t.query_id, e.label,
         |    CAST(COUNT(*) AS BIGINT) AS votes
         |  FROM tk t JOIN embeddings e ON e.vec_id = t.corpus_id
         |  GROUP BY 1, 2)
         |SELECT query_id, label AS predicted_label, votes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY votes DESC, label ASC) AS rk FROM votes)
         |WHERE rk = 1""".stripMargin
    },
    "s26_hard_negatives_ivf" -> {
      // the s04 IVF formulation (same centroid literals -> same argmin
      // cells, same probe ranking) with s24's cross-label exclusion in
      // the same predicate position
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty) emptyTopKOracle
      else s"""WITH ${ivfHardNegOracleCte(cents)}
              |SELECT query_id, corpus_id, score, rank FROM ivfneg""".stripMargin
    },
    "s27_knn_classify_ivf" -> {
      // s04's cell-joined top-k as the generator, s22's (votes DESC,
      // label ASC) argmax as the vote
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS query_id,
          |CAST(NULL AS BIGINT) AS predicted_label,
          |CAST(NULL AS BIGINT) AS votes WHERE FALSE""".stripMargin
      else {
        val nlist = cents.length
        val dl = cents.map(c => duckSqDist("embedding", duckDoubleList(c)))
          .mkString("[", ",\n", "]")
        val cos = duckCos("p.embedding", "a.embedding")
        s"""WITH al AS (SELECT vec_id, label, embedding, $dl AS dl FROM embeddings),
           |a AS (SELECT vec_id, embedding,
           |        (list_position(dl, list_min(dl)) - 1) AS cell
           |      FROM al WHERE vec_id >= 10),
           |p AS (SELECT vec_id, embedding, cell FROM (
           |  SELECT vec_id, embedding, r.cell,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
           |  FROM (SELECT * FROM al WHERE vec_id < 10) ql
           |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
           |  WHERE rn <= 4),
           |tk AS (SELECT query_id, corpus_id FROM (
           |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id,
           |    row_number() OVER (PARTITION BY p.vec_id
           |      ORDER BY $cos DESC, a.vec_id) AS rnk
           |  FROM a JOIN p ON a.cell = p.cell AND p.vec_id != a.vec_id)
           |  WHERE rnk <= 5),
           |votes AS (SELECT t.query_id, e.label,
           |    CAST(COUNT(*) AS BIGINT) AS votes
           |  FROM tk t JOIN embeddings e ON e.vec_id = t.corpus_id
           |  GROUP BY 1, 2)
           |SELECT query_id, label AS predicted_label, votes FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY votes DESC, label ASC) AS rk FROM votes)
           |WHERE rk = 1""".stripMargin
      }
    },
    "s28_hard_negatives_recall" -> {
      // exact tier (the s24 formulation) as ground truth, IVF tier (the
      // s26 formulation) as the probe: integer hit counts off one
      // equi-join, ONE division per query — recall at (nlist=16,
      // nprobe=4), committed per round as the ANN-tier acceptance gauge
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS query_id,
          |CAST(NULL AS BIGINT) AS n_exact, CAST(NULL AS BIGINT) AS n_hit,
          |CAST(NULL AS DOUBLE) AS recall WHERE FALSE""".stripMargin
      else {
        val cosx = duckCos("q.embedding", "c.embedding")
        s"""WITH ${ivfHardNegOracleCte(cents)},
           |exact AS (SELECT query_id, corpus_id FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY $cosx DESC, c.vec_id) AS rnk
           |  FROM (SELECT * FROM embeddings WHERE vec_id >= 10) c
           |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
           |  WHERE q.vec_id != c.vec_id AND c.label <> q.label)
           |  WHERE rnk <= 5)
           |SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN i.corpus_id IS NOT NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |  CAST(SUM(CASE WHEN i.corpus_id IS NOT NULL
           |      THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(COUNT(*) AS DOUBLE) AS recall
           |FROM exact e LEFT JOIN ivfneg i
           |  ON i.query_id = e.query_id AND i.corpus_id = e.corpus_id
           |GROUP BY 1""".stripMargin
      }
    },
    "s20_mmr_rerank" -> {
      // the greedy MMR loop unrolled as chained CTEs (one per rank, all
      // integer arithmetic): selN picks the argmax of 2*rel - max
      // selected-sim among the not-yet-selected, ties by id — the exact
      // procedural definition, replayed declaratively
      def ld(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, len($a.q) + 1), " +
          s"i -> $a.q[i] * $b.q[i])) AS BIGINT)"
      val take = 8
      val steps = (2 to take).map { r =>
        s"""sel$r AS MATERIALIZED (SELECT $r AS rank, c.id, c.rel,
           |    2 * c.rel - (SELECT MAX(s.d) FROM sims s
           |      WHERE s.ia = c.id
           |        AND s.ib IN (SELECT id FROM selall${r - 1})) AS mmr
           |  FROM cand c WHERE c.id NOT IN (SELECT id FROM selall${r - 1})
           |  ORDER BY mmr DESC, c.id LIMIT 1),
           |selall$r AS MATERIALIZED (SELECT id FROM selall${r - 1}
           |  UNION ALL SELECT id FROM sel$r),""".stripMargin
      }.mkString("\n")
      s"""WITH s AS MATERIALIZED (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |    / CAST(127 AS DOUBLE) AS scale FROM embeddings),
         |qv AS MATERIALIZED (SELECT vec_id,
         |  CASE WHEN scale > 0
         |    THEN list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
         |  FROM s),
         |n AS MATERIALIZED (SELECT vec_id, q,
         |  CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i]))
         |    AS BIGINT) AS n2 FROM qv),
         |cand AS MATERIALIZED (SELECT c.vec_id AS id, c.q AS q, ${ld("qq", "c")} AS rel
         |  FROM n c CROSS JOIN (SELECT * FROM n WHERE vec_id = 0 AND n2 > 0) qq
         |  WHERE c.vec_id != 0 AND c.n2 > 0
         |  ORDER BY rel DESC, c.vec_id LIMIT 50),
         |sims AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib, ${ld("a", "b")} AS d
         |  FROM cand a JOIN cand b ON a.id != b.id),
         |sel1 AS MATERIALIZED (SELECT 1 AS rank, id, rel, 2 * rel AS mmr FROM cand
         |  ORDER BY mmr DESC, id LIMIT 1),
         |selall1 AS MATERIALIZED (SELECT id FROM sel1),
         |$steps
         |final AS MATERIALIZED (${(1 to take).map(r => s"SELECT * FROM sel$r")
            .mkString(" UNION ALL ")})
         |SELECT rank, id AS vec_id, rel, mmr FROM final""".stripMargin
    },
    "s30_ivf_trained" ->
      // the shared trainer-and-probe re-derivation (duckIvfTrainedSql):
      // trainer and corpus both over the full embeddings table
      duckIvfTrainedSql("embeddings", "embeddings"),
    "m68_ivf_trained_store" ->
      // identical semantics to s30 — the query side differs only in
      // WHERE the codebook and corpus come from (the persisted
      // snapshot's frozen marker + partition-pruned cell reads, vs
      // in-flight literals)
      duckIvfTrainedSql("embeddings", "embeddings"),
    "m69_ivf_trained_append" ->
      // the trainer re-derives over the EVEN half alone (v1's build
      // set — the frozen codebook never retrains on append); cell
      // assignment and the probe run over the FULL corpus with it
      duckIvfTrainedSql("(SELECT * FROM embeddings WHERE vec_id % 2 = 0)",
        "embeddings"),
    "s29_kmeans_train" -> {
      // the two Lloyd rounds unrolled: same s07 quantization, same
      // smallest-md5 init, integer squared-L2 with ties to the smaller
      // centroid index, floor(sum/count) centroid means (exact under
      // 2^53 — the operator's documented bound), empty cells carry
      val dist = (v: String, c: String) =>
        s"""list_sum(list_transform(range(1, len($v.q) + 1),
           |  i -> ($v.q[i] - $c.q[i]) * ($v.q[i] - $c.q[i])))""".stripMargin
      def assign(name: String, cents: String) =
        s"""$name AS (SELECT vec_id, cell FROM (
           |  SELECT v.vec_id, c.cell,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY ${dist("v", "c")}, c.cell) AS rn
           |  FROM qv v CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
      def update(ex: String, u: String, cNew: String, a: String,
                 cPrev: String) =
        s"""$ex AS (SELECT $a.cell, unnest(range(1, len(v.q) + 1)) AS dim,
           |  unnest(v.q) AS val FROM $a JOIN qv v USING (vec_id)),
           |$u AS (SELECT cell, dim,
           |  CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
           |  FROM $ex GROUP BY cell, dim),
           |$cNew AS (SELECT cell, list(cm ORDER BY dim) AS q FROM $u GROUP BY cell
           |  UNION ALL SELECT cell, q FROM $cPrev
           |  WHERE cell NOT IN (SELECT cell FROM $u))""".stripMargin
      s"""WITH s AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |    / CAST(127 AS DOUBLE) AS scale FROM embeddings),
         |qv AS (SELECT vec_id,
         |  CASE WHEN scale > 0
         |    THEN list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
         |  FROM s),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY
         |    md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INTEGER) AS cell, q
         |  FROM qv QUALIFY row_number() OVER (ORDER BY
         |    md5(CAST(vec_id AS VARCHAR)), vec_id) <= 4),
         |${assign("a1", "c0")},
         |${update("ex1", "u1", "c1", "a1", "c0")},
         |${assign("a2", "c1")},
         |${update("ex2", "u2", "c2", "a2", "c1")},
         |${assign("a3", "c2")}
         |SELECT vec_id, CAST(cell AS INTEGER) AS cell FROM a3""".stripMargin
    },
    "s07_quantized_topk" -> {
      // int8 symmetric quantization replayed in SQL: same per-vector
      // scale (max|x|/127, double), same floor(x/s + 0.5) half-up
      // (round() halves differ across engines — floor does not),
      // integer dot/self-dots, scale-free cosine. The n2 > 0 filters
      // mirror the Spark side's null-score drop.
      s"""WITH s AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |    / CAST(127 AS DOUBLE) AS scale FROM embeddings),
         |qv AS (SELECT vec_id,
         |  CASE WHEN scale > 0
         |    THEN list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
         |  FROM s),
         |n AS (SELECT vec_id, q,
         |  CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i]))
         |    AS BIGINT) AS n2 FROM qv)
         |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT qq.vec_id AS query_id, c.vec_id AS corpus_id,
         |    CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
         |      i -> qq.q[i] * c.q[i])) AS DOUBLE)
         |      / sqrt(CAST(qq.n2 * c.n2 AS DOUBLE)) AS score,
         |    row_number() OVER (PARTITION BY qq.vec_id ORDER BY
         |      CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
         |        i -> qq.q[i] * c.q[i])) AS DOUBLE)
         |        / sqrt(CAST(qq.n2 * c.n2 AS DOUBLE)) DESC, c.vec_id) AS rnk
         |  FROM n c CROSS JOIN (SELECT * FROM n WHERE vec_id < 10) qq
         |  WHERE qq.vec_id != c.vec_id AND qq.n2 > 0 AND c.n2 > 0)
         |WHERE rnk <= 5""".stripMargin
    },
    "s02_ann_topk" -> {
      val planes = lastSrpPlanes
      val bucket = duckSrpBucket("embedding", 64, planes)
      val cos = duckCos("q.embedding", "c.embedding")
      s"""WITH v AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
         |q AS (SELECT vec_id, embedding,
         |        unnest(${duckProbes("bucket", planes)}) AS bucket
         |      FROM v WHERE vec_id < 10)
         |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS score,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
         |  FROM v c JOIN q
         |    ON q.bucket = c.bucket AND q.vec_id != c.vec_id)
         |WHERE rnk <= 5""".stripMargin
    },
    "m19_srp_layout" -> {
      // s02's probe-join formulation restricted to query 0: the layout
      // round-trip must surface exactly the corpus rows whose bucket is
      // within Hamming 1 of the query's, scored by the same cosine
      // (layout-sized plane count, see srpLayoutPlanes)
      val planes = lastSrpLayoutPlanes
      val bucket = duckSrpBucket("embedding", 64, planes)
      val cos = duckCos("q.embedding", "c.embedding")
      s"""WITH v AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
         |q AS (SELECT vec_id, embedding,
         |        unnest(${duckProbes("bucket", planes)}) AS bucket
         |      FROM v WHERE vec_id = 0)
         |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS score,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
         |  FROM v c JOIN q
         |    ON q.bucket = c.bucket AND q.vec_id != c.vec_id)
         |WHERE rnk <= 5""".stripMargin
    },
    "m21_srp_quantized_layout" -> {
      // m19's probe-join formulation with s07's quantized scoring: float
      // buckets select the candidates, integer arithmetic scores them
      val planes = lastSrpLayoutPlanes
      val bucket = duckSrpBucket("embedding", 64, planes)
      s"""WITH s AS (SELECT vec_id, embedding, $bucket AS bucket,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |    / CAST(127 AS DOUBLE) AS scale FROM embeddings),
         |qv AS (SELECT vec_id, bucket,
         |  CASE WHEN scale > 0
         |    THEN list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
         |  FROM s),
         |n AS (SELECT vec_id, bucket, q,
         |  CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i]))
         |    AS BIGINT) AS n2 FROM qv),
         |qq AS (SELECT vec_id, q, n2, unnest(${duckProbes("bucket", planes)}) AS bucket
         |       FROM n WHERE vec_id = 0)
         |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT qq.vec_id AS query_id, c.vec_id AS corpus_id,
         |    CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
         |      i -> qq.q[i] * c.q[i])) AS DOUBLE)
         |      / sqrt(CAST(qq.n2 * c.n2 AS DOUBLE)) AS score,
         |    row_number() OVER (PARTITION BY qq.vec_id ORDER BY
         |      CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
         |        i -> qq.q[i] * c.q[i])) AS DOUBLE)
         |        / sqrt(CAST(qq.n2 * c.n2 AS DOUBLE)) DESC, c.vec_id) AS rnk
         |  FROM n c JOIN qq
         |    ON qq.bucket = c.bucket AND qq.vec_id != c.vec_id
         |  WHERE qq.n2 > 0 AND c.n2 > 0)
         |WHERE rnk <= 5""".stripMargin
    },
    "m22_ivfpq_layout" -> {
      // m20's probe formulation composed with s08's code/table lists:
      // cell assignment + probe ranking from the IVF centroid literals,
      // ADC distance from the PQ codebook literals, both restricted to
      // query 0 and its 4 probed cells
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      val cbs = Option(lastPqCodebooks).getOrElse(
        Array.empty[Array[Array[Double]]])
      if (cents.isEmpty || cbs.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
          |CAST(NULL AS DOUBLE) AS adist, CAST(NULL AS INTEGER) AS rank WHERE FALSE""".stripMargin
      else {
        val nlist = cents.length
        val m = cbs.length
        val sub = cbs(0)(0).length
        val dl = cents.map(c => duckSqDist("embedding", duckDoubleList(c)))
          .mkString("[", ",\n", "]")
        def sliceStr(j: Int) = s"list_slice(embedding, ${j * sub + 1}, ${(j + 1) * sub})"
        val dlCols = cbs.zipWithIndex.map { case (cb, j) =>
          val l = cb.map(c => duckSqDist(sliceStr(j), duckDoubleList(c)))
            .mkString("[", ",\n", "]")
          s"$l AS dl$j"
        }.mkString(",\n")
        val codeCols = (0 until m)
          .map(j => s"(list_position(dl$j, list_min(dl$j)) - 1) AS c$j")
          .mkString(", ")
        val adist = (0 until m)
          .map(j => s"q.dl$j[a.c$j + 1]")
          .reduce((x, y) => s"($x + $y)")
        val qDls = (0 until m).map(j => s"dl$j").mkString(", ")
        s"""WITH al AS (SELECT vec_id, embedding, $dl AS dl, $dlCols FROM embeddings),
           |a AS (SELECT vec_id, (list_position(dl, list_min(dl)) - 1) AS cell,
           |        $codeCols FROM al),
           |p AS (SELECT vec_id, cell FROM (
           |  SELECT vec_id, r.cell,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
           |  FROM (SELECT * FROM al WHERE vec_id = 0) ql
           |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
           |  WHERE rn <= 4),
           |q AS (SELECT vec_id, $qDls FROM al WHERE vec_id = 0)
           |SELECT query_id, corpus_id, adist, CAST(rnk AS INTEGER) AS rank FROM (
           |  SELECT q.vec_id AS query_id, a.vec_id AS corpus_id, $adist AS adist,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY $adist ASC, a.vec_id ASC) AS rnk
           |  FROM a JOIN p ON a.cell = p.cell
           |  JOIN q ON q.vec_id = p.vec_id AND a.vec_id != q.vec_id)
           |WHERE rnk <= 5""".stripMargin
      }
    },
    "m20_ivf_layout" -> ivfLayoutOracleSql,
    "m26_ivf_versioned" ->
      // m20's full-corpus formulation: correct only if the probe read
      // the v2 snapshot alone — the v1 half-corpus layout is missing
      // half the cells' rows, which would drop retrieved neighbors
      ivfLayoutOracleSql,
    "d65_takedown_bm25" ->
      // independent FROM-SCRATCH index of the scrubbed corpus (s09's
      // generated formulation over the post-takedown doc set): any
      // revoked posting or stale df/N/Σdl surviving the propagation
      // shifts scores and fails the hash
      TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents WHERE NOT (doc_id % 17 = 3)",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 5),
    "m38_takedown_ivf" ->
      // m20/m26's formulation rebuilt over the scrubbed embeddings — a
      // revoked vector surviving in any probed cell would enter top-k
      ivfLayoutOracleSqlFor(
        """SELECT vec_id, embedding FROM embeddings
          |WHERE NOT (vec_id % 5 = 0 AND vec_id != 0)""".stripMargin),
    "m40_takedown_shards" ->
      // d42's formulation over the scrubbed corpus: the re-ranked pos
      // must equal the from-scratch row_number per shard
      graft.llm.Packing.shardAssignOracleSql(
        """SELECT doc_id,
          |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
          |    AS BIGINT) AS n_tokens
          |FROM documents WHERE NOT (doc_id % 13 = 5)""".stripMargin,
        "doc_id", nShards = 8, salt = "s42"),
    "s09_bm25_topk" ->
      // generated from the SAME k1/b literals and expression tree as the
      // Spark side (TextAnalysis.bm25OracleSql); queries mirror the
      // first-4-token derivation
      TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 5),
    "s14_rerank_retrieval" -> {
      // the s09 BM25 formulation at k=20 embedded as a subquery-CTE,
      // then the s01 cosine construction over the surviving pairs —
      // self-pairs excluded like perQueryTopK
      val bm = TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 20)
      val cos = duckCos("q.embedding", "c.embedding")
      s"""SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT b.query_id, b.doc_id AS corpus_id, $cos AS score,
         |    row_number() OVER (PARTITION BY b.query_id
         |      ORDER BY $cos DESC, b.doc_id) AS rnk
         |  FROM ($bm) b
         |  JOIN embeddings c ON c.vec_id = b.doc_id
         |  JOIN embeddings q ON q.vec_id = b.query_id
         |  WHERE b.query_id != b.doc_id)
         |WHERE rnk <= 5""".stripMargin
    },
    "s18_ivf_tuning" -> {
      // the s04 probe construction instantiated at nprobe 1/2/4 over
      // shared cell-assignment CTEs, each gauged against the shared s01
      // exact top-10, UNION ALL'd — same centroid literals as s04
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS INTEGER) AS nprobe, CAST(NULL AS BIGINT) AS hits,
          |CAST(NULL AS BIGINT) AS truths, CAST(NULL AS DOUBLE) AS recall
          |WHERE FALSE""".stripMargin
      else {
        val nlist = cents.length
        val dl = cents.map(c => duckSqDist("embedding", duckDoubleList(c)))
          .mkString("[", ",\n", "]")
        val cos = duckCos("p.embedding", "a.embedding")
        val cosEx = duckCos("q.embedding", "c.embedding")
        val perNp = Seq(1, 2, 4).map { np =>
          s"""p$np AS (SELECT vec_id, embedding, cell FROM (
             |  SELECT vec_id, embedding, r.cell,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
             |  FROM (SELECT * FROM al WHERE vec_id < 10) ql
             |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
             |  WHERE rn <= $np),
             |ap$np AS (SELECT query_id, corpus_id FROM (
             |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id,
             |    row_number() OVER (PARTITION BY p.vec_id
             |      ORDER BY $cos DESC, a.vec_id) AS rnk
             |  FROM a JOIN p$np p ON a.cell = p.cell AND p.vec_id != a.vec_id)
             |  WHERE rnk <= 10),
             |r$np AS (SELECT
             |    CAST(SUM(CASE WHEN ap$np.corpus_id IS NULL THEN 0 ELSE 1 END)
             |      AS BIGINT) AS hits,
             |    CAST(COUNT(*) AS BIGINT) AS truths
             |  FROM ex LEFT JOIN ap$np
             |    ON ap$np.query_id = ex.query_id
             |   AND ap$np.corpus_id = ex.corpus_id)""".stripMargin
        }.mkString(",\n")
        val selects = Seq(1, 2, 4).map { np =>
          s"""SELECT $np::INTEGER AS nprobe, hits, truths,
             |  CAST(hits AS DOUBLE) / CAST(truths AS DOUBLE) AS recall
             |FROM r$np""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH al AS (SELECT vec_id, embedding, $dl AS dl FROM embeddings),
           |a AS (SELECT vec_id, embedding,
           |        (list_position(dl, list_min(dl)) - 1) AS cell FROM al),
           |ex AS (SELECT query_id, corpus_id FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY $cosEx DESC, c.vec_id) AS rnk
           |  FROM embeddings c CROSS JOIN
           |    (SELECT * FROM embeddings WHERE vec_id < 10) q
           |  WHERE q.vec_id != c.vec_id)
           |  WHERE rnk <= 10),
           |$perNp
           |$selects""".stripMargin
      }
    },
    "s17_ann_recall" -> {
      // the s01 exact construction at k=10 left-joined by the s02 probe
      // construction at k=10 (same lastSrpPlanes), counted per query
      val planes = lastSrpPlanes
      val bucket = duckSrpBucket("embedding", 64, planes)
      val cos = duckCos("q.embedding", "c.embedding")
      s"""WITH v AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
         |pq AS (SELECT vec_id, embedding,
         |        unnest(${duckProbes("bucket", planes)}) AS bucket
         |      FROM v WHERE vec_id < 10),
         |ap AS (SELECT query_id, corpus_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
         |  FROM v c JOIN pq q
         |    ON q.bucket = c.bucket AND q.vec_id != c.vec_id)
         |  WHERE rnk <= 10),
         |ex AS (SELECT query_id, corpus_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
         |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
         |  WHERE q.vec_id != c.vec_id)
         |  WHERE rnk <= 10)
         |SELECT ex.query_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(SUM(CASE WHEN ap.corpus_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN ap.corpus_id IS NULL THEN 0 ELSE 1 END)
         |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
         |FROM ex LEFT JOIN ap
         |  ON ap.query_id = ex.query_id AND ap.corpus_id = ex.corpus_id
         |GROUP BY 1""".stripMargin
    },
    "s16_truncated_rerank" -> {
      // stage 1 is the s01 construction over embedding[1:16] at k=20,
      // stage 2 the s14 rerank shape: full-dim cosine over the
      // surviving pairs, self-pairs excluded like perQueryTopK
      val cosT = duckCos("q.embedding", "c.embedding")
      val cos = duckCos("q.embedding", "c.embedding")
      s"""WITH tv AS (SELECT vec_id, embedding[1:16] AS embedding
         |  FROM embeddings),
         |cand AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY $cosT DESC, c.vec_id) AS rnk
         |    FROM tv c CROSS JOIN (SELECT * FROM tv WHERE vec_id < 10) q
         |    WHERE q.vec_id != c.vec_id)
         |  WHERE rnk <= 20)
         |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT b.query_id, b.corpus_id, $cos AS score,
         |    row_number() OVER (PARTITION BY b.query_id
         |      ORDER BY $cos DESC, b.corpus_id) AS rnk
         |  FROM cand b
         |  JOIN embeddings c ON c.vec_id = b.corpus_id
         |  JOIN embeddings q ON q.vec_id = b.query_id
         |  WHERE b.query_id != b.corpus_id)
         |WHERE rnk <= 5""".stripMargin
    },
    "s15_rrf_fusion" -> {
      // the s09 BM25 formulation at k=10 and the s01 cosine construction
      // at k=10 (vec_id < 3), full-outer-joined per (query, doc); the
      // fused score is CAST(1 AS DOUBLE)/(60+rank) per list summed in
      // fixed lexical+semantic order — integer ranks in, one IEEE
      // division each, bit-identical across engines
      val bm = TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 10)
      val cos = duckCos("q.embedding", "c.embedding")
      val part = (r: String) =>
        s"coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST($r AS DOUBLE)), CAST(0 AS DOUBLE))"
      s"""WITH lex AS ($bm),
         |sem AS (
         |  SELECT query_id, corpus_id, CAST(rnk AS INTEGER) AS rank FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
         |    FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
         |    WHERE q.vec_id != c.vec_id)
         |  WHERE rnk <= 10)
         |SELECT query_id, corpus_id, rank_lex, rank_sem, rrf,
         |       CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT query_id, corpus_id, rank_lex, rank_sem, rrf,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, corpus_id ASC) AS rnk
         |  FROM (
         |    SELECT coalesce(l.query_id, s.query_id) AS query_id,
         |           coalesce(l.doc_id, s.corpus_id) AS corpus_id,
         |           CAST(l.rank AS INTEGER) AS rank_lex,
         |           CAST(s.rank AS INTEGER) AS rank_sem,
         |           ${part("l.rank")} + ${part("s.rank")} AS rrf
         |    FROM lex l FULL OUTER JOIN sem s
         |      ON s.query_id = l.query_id AND s.corpus_id = l.doc_id))
         |WHERE rnk <= 5""".stripMargin
    },
    "m25_bm25_versioned" ->
      // the FULL-corpus s09 formulation: correct only if the probe read
      // the v2 snapshot alone — v1's half-corpus df/N/Σdl would produce
      // different scores
      TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 5),
    "m28_bucketed_join" ->
      // q03's formulation verbatim: the bucketed layout must reproduce
      // the exact join+aggregate a plain scan yields
      s"""SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
         |${dsum("o_totalprice", 2, "total_price")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,
    "m27_layout_compacted" ->
      // the FULL-corpus s09 formulation: correct only if the compacted
      // rewrite preserved the exact posting multiset and stats — a
      // dropped/duplicated posting row shifts tf/df and fails the hash
      TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 5),
    "s13_quality_classifier" -> {
      // generated from the SAME frozen coefficients the query fit
      // (populate-then-dump ordering: Verify runs queries first); same
      // left-to-right margin fold, bit-identical doubles
      val (w, b) = Option(lastQualityModel)
        .getOrElse((Array.fill(6)(0.0), 0.0))
      graft.llm.Filters.qualityMarginOracleSql(
        "SELECT doc_id, text FROM documents", "doc_id", w, b)
    },
    "s19_bow_classifier" -> {
      // same populate-then-dump contract over the 64 hashed-BoW
      // coefficients: strpos hex assembly replays the term hash,
      // list_reduce(list_prepend(...)) replays the left fold
      val (w, b) = Option(lastBowModel)
        .getOrElse((Array.fill(64)(0.0), 0.0))
      graft.llm.Filters.hashedBowMarginOracleSql(
        "SELECT doc_id, text FROM documents", "doc_id", w, b)
    },
    "s12_bm25_indexed" ->
      // identical formulation to s09: the indexed path is bit-exact vs
      // the corpus-scan path (shared score expression + sorted fold;
      // the layout's df/N/Σdl snapshot IS this corpus), so one oracle
      // serves both
      TextAnalysis.bm25OracleSql(
        "SELECT doc_id, text FROM documents",
        """SELECT doc_id AS query_id,
          |array_to_string(list_filter(string_split(lower(text), ' '),
          |  x -> x != '')[1:4], ' ') AS qtext
          |FROM documents WHERE doc_id < 3""".stripMargin,
        k = 5),
    "s08_pq_adc_topk" -> {
      // Mirrors pqTopK with the codebooks the s08 query fit: same
      // per-subspace literal squared-L2 lists (the dl lists double as
      // the corpus-side code assignment AND the query-side ADC tables),
      // same first-match argmin, same left-to-right j-ascending sum.
      val cbs = Option(lastPqCodebooks).getOrElse(
        Array.empty[Array[Array[Double]]])
      if (cbs.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
          |CAST(NULL AS DOUBLE) AS adist, CAST(NULL AS INTEGER) AS rank WHERE FALSE""".stripMargin
      else {
        val m = cbs.length
        val sub = cbs(0)(0).length
        def sliceStr(j: Int) = s"list_slice(embedding, ${j * sub + 1}, ${(j + 1) * sub})"
        val dlCols = cbs.zipWithIndex.map { case (cb, j) =>
          val dl = cb.map(c =>
            duckSqDist(sliceStr(j), duckDoubleList(c)))
            .mkString("[", ",\n", "]")
          s"$dl AS dl$j"
        }.mkString(",\n")
        val codeCols = (0 until m)
          .map(j => s"(list_position(dl$j, list_min(dl$j)) - 1) AS c$j")
          .mkString(", ")
        val adist = (0 until m)
          .map(j => s"q.dl$j[e.c$j + 1]")
          .reduce((a, b) => s"($a + $b)")
        s"""WITH al AS (SELECT vec_id, $dlCols FROM embeddings),
           |e AS (SELECT vec_id, $codeCols FROM al),
           |q AS (SELECT * FROM al WHERE vec_id < 10)
           |SELECT query_id, corpus_id, adist, CAST(rnk AS INTEGER) AS rank FROM (
           |  SELECT q.vec_id AS query_id, e.vec_id AS corpus_id,
           |    $adist AS adist,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY $adist ASC, e.vec_id ASC) AS rnk
           |  FROM e JOIN q ON e.vec_id != q.vec_id)
           |WHERE rnk <= 5""".stripMargin
      }
    },
    "s21_filtered_ann" -> {
      // s04's formulation with the metadata predicate on the corpus side
      // of the probe join (pre-assignment, as the operator applies it)
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
          |CAST(NULL AS DOUBLE) AS score, CAST(NULL AS INTEGER) AS rank WHERE FALSE""".stripMargin
      else {
        val nlist = cents.length
        val dl = cents.map { c =>
          duckSqDist("embedding", duckDoubleList(c))
        }.mkString("[", ",\n", "]")
        val cos = duckCos("p.embedding", "a.embedding")
        s"""WITH al AS (SELECT vec_id, label, embedding, $dl AS dl FROM embeddings),
           |a AS (SELECT vec_id, embedding,
           |        (list_position(dl, list_min(dl)) - 1) AS cell FROM al
           |      WHERE label % 4 = 3),
           |p AS (SELECT vec_id, embedding, cell FROM (
           |  SELECT vec_id, embedding, r.cell,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
           |  FROM (SELECT * FROM al WHERE vec_id < 10) ql
           |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
           |  WHERE rn <= 4)
           |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
           |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id, $cos AS score,
           |    row_number() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, a.vec_id) AS rnk
           |  FROM a JOIN p ON a.cell = p.cell AND p.vec_id != a.vec_id)
           |WHERE rnk <= 5""".stripMargin
      }
    },
    "s04_ivf_topk" -> {
      // Mirrors ivfTopKLiteral with the centroids the s04 query fit (see
      // ivfCentroids): same distance-list literals -> same argmin cell
      // assignment (list_position = first-match, like array_position),
      // same (dist, cell) probe ranking, same cosine scoring.
      val cents = Option(lastIvfCentroids).getOrElse(
        // defensive: s04's query didn't run first — emit a row-less
        // probe so only s04's row (not the whole JSON) goes red
        Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS corpus_id,
          |CAST(NULL AS DOUBLE) AS score, CAST(NULL AS INTEGER) AS rank WHERE FALSE""".stripMargin
      else {
        val nlist = cents.length
        val dl = cents.map { c =>
          duckSqDist("embedding", duckDoubleList(c))
        }.mkString("[", ",\n", "]")
        val cos = duckCos("p.embedding", "a.embedding")
        s"""WITH al AS (SELECT vec_id, embedding, $dl AS dl FROM embeddings),
           |a AS (SELECT vec_id, embedding,
           |        (list_position(dl, list_min(dl)) - 1) AS cell FROM al),
           |p AS (SELECT vec_id, embedding, cell FROM (
           |  SELECT vec_id, embedding, r.cell,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dl[(r.cell)::INT + 1] ASC, r.cell ASC) AS rn
           |  FROM (SELECT * FROM al WHERE vec_id < 10) ql
           |  CROSS JOIN (SELECT unnest(range(0, $nlist)) AS cell) r)
           |  WHERE rn <= 4)
           |SELECT query_id, corpus_id, score, CAST(rnk AS INTEGER) AS rank FROM (
           |  SELECT p.vec_id AS query_id, a.vec_id AS corpus_id, $cos AS score,
           |    row_number() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, a.vec_id) AS rnk
           |  FROM a JOIN p ON a.cell = p.cell AND p.vec_id != a.vec_id)
           |WHERE rnk <= 5""".stripMargin
      }
    },
    "s05_embedding_neardups" -> {
      s"""WITH ${duckEmbPairsCte()}
         |SELECT id1, id2, score FROM epairs""".stripMargin
    },
    "s06_embedding_clusters" ->
      // d09's closure pattern on the embedding pair signal
      s"""WITH RECURSIVE ${duckEmbPairsCte()},
         |edges AS (SELECT id1 AS a, id2 AS b FROM epairs
         |          UNION ALL SELECT id2, id1 FROM epairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
         |SELECT id, MIN(r) AS cluster, (id = MIN(r)) AS keep
         |FROM reach GROUP BY id""".stripMargin,
    "s10_semdedup" -> {
      // s04's literal-centroid cell assignment (same distance lists ->
      // same argmin), then the dominated rule verbatim: a row is dropped
      // iff a same-cell neighbor at cos >= 0.40 is farther from the
      // centroid (ties: smaller id). Populated by the s10 query run
      // (ivfCentroids populate-then-dump contract).
      val cents = Option(lastIvfCentroids).getOrElse(Array.empty[Array[Double]])
      if (cents.isEmpty)
        """SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS INTEGER) AS cell,
          |CAST(NULL AS BOOLEAN) AS keep WHERE FALSE""".stripMargin
      else {
        val dl = cents.map(c => duckSqDist("embedding", duckDoubleList(c)))
          .mkString("[", ",\n", "]")
        val cos = duckCos("x.embedding", "y.embedding")
        s"""WITH al AS (SELECT vec_id, embedding, $dl AS dl FROM embeddings),
           |a AS (SELECT vec_id, embedding,
           |        CAST(list_position(dl, list_min(dl)) - 1 AS INTEGER) AS cell,
           |        list_min(dl) AS cdist FROM al),
           |dom AS (SELECT x.vec_id AS id FROM a x JOIN a y
           |    ON x.cell = y.cell AND x.vec_id <> y.vec_id
           |  WHERE $cos >= 0.40
           |    AND (y.cdist > x.cdist OR
           |         (y.cdist = x.cdist AND y.vec_id < x.vec_id))
           |  GROUP BY 1)
           |SELECT a.vec_id AS id, a.cell, (dom.id IS NULL) AS keep
           |FROM a LEFT JOIN dom ON a.vec_id = dom.id""".stripMargin
      }
    },
    "q15_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |COUNT(*) AS n FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "m10_salted_count" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type""".stripMargin,
    "m11_json_lines" ->
      """SELECT c_custkey,
        |to_json(struct_pack(c_custkey := c_custkey, c_name := c_name)) AS line
        |FROM customer""".stripMargin,
    "q14_except_all" ->
      """SELECT custkey, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS custkey FROM customer)
        |GROUP BY custkey""".stripMargin,
    "m07_avro_roundtrip" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "m13_avro_rdd_roundtrip" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "m08_conform" ->
      """SELECT event_id, value, CAST(user_id AS VARCHAR) AS user_id,
        |CAST(NULL AS VARCHAR) AS added_col FROM events""".stripMargin,
    "m09_stream_available_now" ->
      s"""SELECT event_type, COUNT(*) AS n, ${dsum("value", 2, "sum_value")}
         |FROM events GROUP BY event_type""".stripMargin,
    "s03_srp_buckets" -> {
      val bucket = duckSrpBucket("embedding", 64, 8)
      s"""SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n
         |FROM (SELECT $bucket AS bucket FROM embeddings) GROUP BY 1""".stripMargin
    },
    "m12_multi_pipeline" ->
      // Mirrors the two published sinks from raw tables: valid = no rule
      // fired (rule conditions are null-safe CASE arms, so NULL = not
      // fired); error parts keyed by FIRST failing rule (CASE order);
      // orders_summary re-aggregated through the same decimal path.
      s"""SELECT 'events_valid' AS part, COUNT(*) AS n,
         |${dsum("value", 2, "metric")} FROM events
         |WHERE NOT COALESCE(value < 1, FALSE) AND NOT COALESCE(event_type = 'error', FALSE)
         |UNION ALL SELECT 'value_out_of_range', COUNT(*), CAST(NULL AS DOUBLE)
         |FROM events WHERE COALESCE(value < 1, FALSE)
         |UNION ALL SELECT 'error_event', COUNT(*), CAST(NULL AS DOUBLE)
         |FROM events WHERE NOT COALESCE(value < 1, FALSE) AND COALESCE(event_type = 'error', FALSE)
         |UNION ALL SELECT 'orders_summary', COUNT(*),
         |CAST(SUM(CAST(total_price AS DECIMAL(27,2))) AS DOUBLE) FROM (
         |  SELECT o_orderpriority,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_price
         |  FROM orders GROUP BY 1)""".stripMargin,
    "m15_image_features" ->
      // Hand-derived from the fixture construction (MediaFixtures.media):
      // every 8x8 cell pools to exactly 0 or 255, so bit c = cy*8+cx is
      // set iff the cell is on the white side: vertical split -> cx>=4 ->
      // 0xf0 per row-byte; horizontal split -> cy>=4 -> high 32 bits;
      // quarter split -> cx<2 -> 0x03 per row-byte (mean 63.75). Mean
      // luma = white fraction * 255.
      """SELECT * FROM (VALUES
        |  (1::BIGINT, 16::INTEGER, 16::INTEGER, 127.5::DOUBLE,  'f0f0f0f0f0f0f0f0'),
        |  (2::BIGINT, 16::INTEGER, 16::INTEGER, 127.5::DOUBLE,  'ffffffff00000000'),
        |  (3::BIGINT, 32::INTEGER,  8::INTEGER, 63.75::DOUBLE,  '0303030303030303')
        |) AS t(media_id, width, height, mean_luma, phash)""".stripMargin,
    "m30_phash_neardups" ->
      // hand-derived from the fixture construction: image 6 is image 1
      // with cell (0,0) flipped -> phash f0f0f0f0f0f0f0f1 vs
      // f0f0f0f0f0f0f0f0, Hamming 1; images 2 (ffffffff00000000) and 3
      // (0303030303030303) sit >= 32 bits from everything else
      """SELECT * FROM (VALUES (1::BIGINT, 6::BIGINT, 1::INTEGER))
        |AS t(id1, id2, hamming)""".stripMargin,
    "m16_audio_features" ->
      // 4000 frames @ 8000 Hz = 500 ms; constant 16384/32768 = 0.5 mean
      // amplitude; fingerprint = md5 prefix of the (00 40)*4000 PCM bytes
      """SELECT 4::BIGINT AS media_id, 500::BIGINT AS duration_ms,
        |8000::INTEGER AS sample_rate, 1::INTEGER AS channels,
        |0.5::DOUBLE AS mean_amplitude, '8eea12095947b2e5' AS fingerprint""".stripMargin,
    "m37_video_scenes" ->
      // same hand-derived frame phashes as m17 (as signed 64-bit
      // literals), scene algorithm replayed independently: lag ->
      // boundary (bit_count(xor) > 8) -> running boundary count -> group
      """WITH f(media_id, frame_index, frame_ts_ms, ph) AS (VALUES
        |  (5::BIGINT, 0::INTEGER,   0::BIGINT, 0::BIGINT),
        |  (5::BIGINT, 1::INTEGER, 100::BIGINT,
        |     CAST(-1085102592571150096 AS BIGINT)),
        |  (5::BIGINT, 2::INTEGER, 200::BIGINT,
        |     CAST(-4294967296 AS BIGINT)),
        |  (5::BIGINT, 3::INTEGER, 300::BIGINT, 0::BIGINT)),
        |lagged AS (SELECT *, lag(ph) OVER
        |    (PARTITION BY media_id ORDER BY frame_index) AS prev FROM f),
        |b AS (SELECT *, CASE WHEN prev IS NULL
        |    OR bit_count(xor(ph, prev)) > 8 THEN 1 ELSE 0 END AS nb
        |  FROM lagged),
        |sc AS (SELECT *, SUM(nb) OVER (PARTITION BY media_id
        |    ORDER BY frame_index) - 1 AS scene_idx FROM b)
        |SELECT media_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        |  MIN(frame_index) AS start_frame, MAX(frame_index) AS end_frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  MIN(frame_ts_ms) AS start_ts_ms, MAX(frame_ts_ms) AS end_ts_ms
        |FROM sc GROUP BY 1, 2""".stripMargin,
    "m17_video_frames" ->
      // Hand-derived from the fixture AVI (MediaFixtures.media id 5):
      // 10 fps -> ts = 100*i exactly; frames black / vertical split /
      // horizontal split / white. Split frames pool each 8x8 cell to
      // exactly 0 or 255 (mean 127.5): vertical -> cx>=4 -> 0xf0 per row
      // byte, horizontal -> cy>=4 -> high 32 bits. Uniform frames have
      // every cell == mean, so no `> mean` bit sets: phash 0.
      """SELECT * FROM (VALUES
        |  (5::BIGINT, 0::INTEGER,   0::BIGINT, 16::INTEGER, 16::INTEGER,   0.0::DOUBLE, '0000000000000000'),
        |  (5::BIGINT, 1::INTEGER, 100::BIGINT, 16::INTEGER, 16::INTEGER, 127.5::DOUBLE, 'f0f0f0f0f0f0f0f0'),
        |  (5::BIGINT, 2::INTEGER, 200::BIGINT, 16::INTEGER, 16::INTEGER, 127.5::DOUBLE, 'ffffffff00000000'),
        |  (5::BIGINT, 3::INTEGER, 300::BIGINT, 16::INTEGER, 16::INTEGER, 255.0::DOUBLE, '0000000000000000')
        |) AS t(media_id, frame_index, frame_ts_ms, width, height, mean_luma, phash)""".stripMargin,
    "m06_fork_streams" -> {
      def one(k: Int, where: String) =
        s"""SELECT $k AS fork_key, COUNT(*) AS n, COUNT(*) AS n_stream,
           |${dsum("value", 2, "sum_value")} FROM events $where""".stripMargin
      s"""${one(0, "")}
         |UNION ALL ${one(1, "WHERE value > 100")}
         |UNION ALL ${one(2, "WHERE event_type = 'error'")}""".stripMargin
    },
    "d13_token_stats" ->
      s"""WITH d AS (SELECT doc_id, lower(text) AS lt FROM documents),
         |b AS (SELECT doc_id, lt,
         |        regexp_extract_all(lt, $bpePatternSqlLit) AS bpe FROM d)
         |SELECT doc_id,
         |  CAST(len(list_filter(string_split(lt, ' '), x -> x != '')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(bpe) AS BIGINT) AS n_bpe_tokens,
         |  CAST(len(list_distinct(bpe)) AS BIGINT) AS n_unique_bpe,
         |  CASE WHEN len(bpe) = 0 THEN NULL
         |       ELSE CAST(length(lt) AS DOUBLE) / CAST(len(bpe) AS DOUBLE)
         |  END AS chars_per_token
         |FROM b""".stripMargin,
    "m18_stream_windowed" ->
      // append-mode emission contract: only watermark-closed windows
      // (window_end <= max(ts) - 2 days) appear in the sink
      """WITH cutoff AS (SELECT max(ts) - INTERVAL 2 DAY AS wm FROM events)
        |SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
        |  event_type, COUNT(*) AS n
        |FROM events, cutoff
        |WHERE time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY <= wm
        |GROUP BY 1, 2""".stripMargin,
    "q16_asof_join" ->
      // DuckDB's native ASOF JOIN — an INDEPENDENT implementation of the
      // point-in-time semantics (inclusive <=, latest right row wins)
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.asof_orderkey
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts""".stripMargin,
    "q17_asof_tolerance" ->
      // independent formulation of tolerance/strict as-of: latest-within-
      // bound scalar subqueries over the pre-aggregated right side
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  (SELECT o.ok FROM ord o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
        |   ORDER BY o.o_orderdate DESC LIMIT 1) AS asof_tol,
        |  (SELECT o.ok FROM ord o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate < e.ts
        |   ORDER BY o.o_orderdate DESC LIMIT 1) AS asof_strict
        |FROM events e""".stripMargin,
    "q23_small_quantity" ->
      // independent formulation: the CORRELATED scalar subquery itself —
      // DuckDB decorrelates on its own (the q21 contract)
      """SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_small,
        |  SUM(l_quantity) AS qty
        |FROM lineitem a
        |WHERE l_quantity < 0.5 * (SELECT AVG(b.l_quantity) FROM lineitem b
        |  WHERE b.l_partkey = a.l_partkey)
        |GROUP BY 1""".stripMargin,
    "q22_grouping_sets" ->
      // same set list; DuckDB's GROUPING() builds the same 2-bit id
      // (left column = high bit, the shared SQL-standard convention)
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_linestatus), ())""".stripMargin,
    "q21_blame_supplier" ->
      // independent formulation: the correlated EXISTS / NOT EXISTS form
      // itself — DuckDB decorrelates on its own
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
        |  SELECT DISTINCT a.l_orderkey, a.l_suppkey FROM l a
        |  WHERE a.late
        |    AND EXISTS (SELECT 1 FROM l b
        |      WHERE b.l_orderkey = a.l_orderkey
        |        AND b.l_suppkey != a.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM l c
        |      WHERE c.l_orderkey = a.l_orderkey
        |        AND c.l_suppkey != a.l_suppkey AND c.late))
        |GROUP BY 1 ORDER BY numwait DESC, l_suppkey LIMIT 25""".stripMargin,
    "q20_interval_overlap" ->
      // the naive inequality-overlap formulation the binned operator must
      // reproduce exactly
      """WITH ranked AS (
        |  SELECT o_orderkey, epoch_us(o_orderdate) AS lo,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders),
        |a AS (SELECT o_orderkey AS a_key, lo AS a_lo, lo + 5184000000000 AS a_hi
        |      FROM ranked WHERE rk <= 15),
        |b AS (SELECT o_orderkey AS b_key, lo AS b_lo, lo + 5184000000000 AS b_hi
        |      FROM ranked WHERE rk > 15 AND rk <= 30)
        |SELECT a_key, b_key,
        |       least(a_hi, b_hi) - greatest(a_lo, b_lo) AS overlap_us
        |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi""".stripMargin,
    "q19_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q18_range_join" ->
      // the naive inequality-join formulation the operator replaces —
      // DuckDB plans it fine at oracle scale, and it is the semantic
      // definition the binned equi-join must reproduce exactly
      """WITH topo AS (
        |  SELECT o_orderkey AS interval_key, epoch_us(o_orderdate) AS lo
        |  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
        |SELECT t.interval_key, l.l_orderkey, l.l_linenumber,
        |       epoch_us(l.l_shipdate) AS ship_us
        |FROM topo t JOIN lineitem l
        |  ON epoch_us(l.l_shipdate) >= t.lo
        | AND epoch_us(l.l_shipdate) <= t.lo + 604800000000""".stripMargin,
  )
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain/URL-level curation — the C4/RefinedWeb step UPSTREAM of every
  * text gate: a web corpus arrives keyed by messy URLs (scheme/host case
  * noise, default ports, tracking params, unordered query strings,
  * trailing slashes, fragments), and both dedup and policy decisions
  * (blocklists, per-domain caps) are made at the CANONICAL-URL and
  * registrable-domain level. Everything here is a pure Catalyst column
  * expression chain (regexp/split/filter/sort — all codegen'd builtins),
  * so normalization rides the scan stage map-side at any scale and the
  * only exchange in [[domainRollup]] is the per-domain aggregate itself.
  *
  * The reference pipeline has no web-curation layer (its sources are
  * Kafka/Hive — marmaray `KafkaSource.java`/`HiveSource.java`); this is
  * part of the training-data surface the engine adds on top.
  */
object Web {

  /** Query parameters dropped during normalization: pure click-tracking
    * keys that never change content identity (the C4-style cleanup). A
    * prefix entry like `utm_` drops every `utm_*=...` param. */
  val TrackingParamPrefixes: Seq[String] = Seq("utm_", "fbclid=", "gclid=")

  /** Canonical form of a URL, as one codegen'd column expression:
    *
    *  1. fragment dropped (`#...` never reaches the server);
    *  2. scheme and host lowercased (case-insensitive per RFC 3986);
    *  3. default ports stripped (`http://h:80`, `https://h:443`);
    *  4. one trailing slash stripped from a non-root path, empty path
    *     canonicalized to `/` (so `http://h`, `http://h/` collide);
    *  5. tracking params ([[TrackingParamPrefixes]]) and empty params
    *     dropped, the rest SORTED bytewise (param order never changes
    *     the resource, so `?b=2&a=1` ≡ `?a=1&b=2`);
    *  6. an emptied query string drops its `?`.
    *
    * Path SEGMENT case is preserved (paths are case-sensitive). The
    * expression never throws on malformed input — regexp misses yield
    * empty captures, so garbage normalizes to garbage deterministically.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    val after = regexp_replace(rest, "^[^/?]*", "")
    val host = lower(regexp_replace(auth, ":[0-9]+$", ""))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_extract(after, "^([^?]*)", 1)
    val path1 = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val path = when(path1 === "", lit("/")).otherwise(path1)
    val q0 = regexp_extract(after, "\\?(.*)$", 1)
    val params = filter(split(q0, "&"), p =>
      p =!= "" && TrackingParamPrefixes
        .map(pre => !p.startsWith(pre)).reduce(_ && _))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registrable domain of a NORMALIZED url: the last two host labels
    * (`www.a.ex3.com` → `ex3.com`) — the eTLD+1 approximation that
    * needs no suffix table, which keeps it a portable one-regexp
    * map-side expression (the full public-suffix list is a broadcast
    * join in a production deployment, same plan shape). Empty when the
    * host has fewer than two labels. */
  def registrableDomain(normUrl: Column): Column = {
    val host = regexp_extract(normUrl, "^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** Per-domain curation rollup + blocklist gate over a messy-URL corpus:
    * normalize ([[normalizeUrl]]) → registrable domain → ONE aggregate of
    * (docs, DISTINCT canonical urls, weight mass) per domain, with the
    * lexicographic min/max canonical URL carried as normalization
    * witnesses and `blocked` = membership in the literal blocklist
    * (blocklists are policy sheets — thousands of rows at most — so the
    * membership test is a map-side `isin`, never a join; swap in a
    * broadcast join if a list outgrows literal form).
    *
    * Scale shape: normalize + domain are scan-stage expressions; the one
    * exchange is hashpartitioning(domain) for the aggregate, with
    * partial_count/partial_sum map-side. The DISTINCT-url count rides
    * the same exchange (Spark plans count(distinct) per group as a
    * two-phase expand over the already-domain-keyed rows). Domain skew
    * (one giant domain) is the d52 skew-card's job to surface.
    *
    * Output: (domain, n_docs, n_urls, sum_weight, min_url, max_url,
    * blocked). */
  def domainRollup(df: DataFrame, urlCol: String, weight: Column,
                   blocklist: Seq[String]): DataFrame = {
    val norm = normalizeUrl(col(urlCol))
    val withKeys = df.select(norm.as("__u"),
      registrableDomain(norm).as("domain"), weight.as("__w"))
    withKeys.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__u")).as("n_urls"),
        sum(col("__w")).as("sum_weight"),
        min(col("__u")).as("min_url"),
        max(col("__u")).as("max_url"))
      .withColumn("blocked",
        if (blocklist.isEmpty) lit(false)
        else col("domain").isin(blocklist: _*))
  }

  /** Per-domain document cap — C4/RefinedWeb's anti-domination rule: no
    * registrable domain may contribute more than `maxPerDomain` docs, so
    * one crawl-happy host can't dominate the training mix. Survivors are
    * chosen by deterministic salted-hash order ([[Sampling.sampleKey]],
    * ties by id) — a stable pseudo-random per-domain sample, reproducible
    * across runs/engines/partitionings, never `rand()`.
    *
    * Scale shape: domain is a scan-stage expression; the one exchange is
    * hashpartitioning(domain) for the per-domain row_number window. With
    * `keepOnly = true` the rank filter is applied INSIDE the operator,
    * which Catalyst plans as WindowGroupLimit (per-partition top-k
    * short-circuit, map-side pre-limit before the exchange — a
    * mega-domain never materializes its full window; plan-guarded in
    * PlanAuditSpec). The default emits audit columns instead — every row
    * with (domain_rank, kept) — which costs the full window but is the
    * shape attrition reporting wants. A domain hot enough to skew even
    * the grouped limit is the d52 skew card's job.
    *
    * Output: input columns + (domain, domain_rank, kept); with
    * `keepOnly` the kept column is constant true and rows over the cap
    * are gone. */
  def domainCap(df: DataFrame, idCol: String, urlCol: String,
                maxPerDomain: Int, salt: String,
                keepOnly: Boolean = false): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1: $maxPerDomain")
    val norm = normalizeUrl(col(urlCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(Sampling.sampleKey(col(idCol), salt), col(idCol))
    val ranked = df.withColumn("domain", registrableDomain(norm))
      .withColumn("domain_rank", row_number().over(w))
    if (keepOnly) ranked.where(col("domain_rank") <= maxPerDomain)
      .withColumn("kept", lit(true))
    else ranked.withColumn("kept", col("domain_rank") <= maxPerDomain)
  }

  /** Canonical-URL dedup — the FIRST dedup pass a crawl pipeline runs,
    * before any content hashing: refetches of the same resource arrive
    * under trivially-different URLs (case, params, fragments), and
    * collapsing them by [[normalizeUrl]] is orders cheaper than
    * content-level dedup (a short-string key, no tokenize/shingle).
    * Keeps the BEST copy per canonical URL (argmax `quality`, ties min
    * id — the canonicalByQuality rule on the URL key). One exchange:
    * hashpartitioning(canonical_url) for the keeper window.
    * Output: input columns + (canonical_url, keep). */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String,
               quality: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_url"))
      .orderBy(quality.desc, col(idCol).asc)
    df.withColumn("canonical_url", normalizeUrl(col(urlCol)))
      .withColumn("keep", row_number().over(w) === 1)
  }
}

package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WebSpec extends SparkTestBase {

  private def norm(urls: String*): Seq[String] = {
    val s = spark; import s.implicits._
    urls.toDF("u").select(Web.normalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("normalizeUrl: case, default ports, fragments, tracking params, " +
    "param order and trailing slashes all collapse to one canonical form") {
    val variants = Seq(
      "HTTPS://WWW.Ex.COM:443/Docs/1/?b=2&a=1&utm_source=feed#frag",
      "https://www.ex.com/Docs/1?a=1&b=2",
      "https://www.ex.com:443/Docs/1/?utm_campaign=x&b=2&a=1",
      "https://WWW.EX.com/Docs/1?b=2&a=1&fbclid=abc123")
    val got = norm(variants: _*)
    assert(got.distinct == Seq("https://www.ex.com/Docs/1?a=1&b=2"), got)
  }

  test("normalizeUrl: path case preserved; non-default port kept; empty " +
    "path becomes /; emptied query drops its ?; root slash survives") {
    assert(norm("http://H.com:8080/A/B") == Seq("http://h.com:8080/A/B"))
    assert(norm("http://h.com:80") == Seq("http://h.com/"))
    assert(norm("https://h.com:80/x") == Seq("https://h.com:80/x"),
      ":80 is NOT https' default port — must be kept")
    assert(norm("http://h.com/p?utm_source=only") == Seq("http://h.com/p"))
    assert(norm("http://h.com/") == Seq("http://h.com/"))
    assert(norm("http://h.com/p?") == Seq("http://h.com/p"))
    // malformed input: deterministic garbage-out, never a throw
    assert(norm("not a url").head == "://not a url/")
  }

  test("registrableDomain: last two host labels of the normalized form; " +
    "short hosts yield empty") {
    val s = spark; import s.implicits._
    val got = Seq("https://www.a.ex3.com/x", "http://ex5.org/", "http://localhost/")
      .toDF("u").select(Web.registrableDomain(col("u"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("ex3.com", "ex5.org", ""), got)
  }

  test("domainCap: at most N kept per domain; rank order is the salted " +
    "hash (not id); deterministic across partitionings") {
    val s = spark; import s.implicits._
    val df = (0L until 30L).map(i =>
      (i, s"http://h${i % 2}.ex.org/p$i")).toDF("doc_id", "url") // one domain
    val out = Web.domainCap(df, "doc_id", "url", maxPerDomain = 10,
      salt = "t1")
    assert(out.where(col("kept")).count() == 10)
    assert(out.select("domain").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("ex.org"))
    // deterministic: identical decisions under different partitioning
    val a = out.select("doc_id", "domain_rank", "kept")
      .collect().map(_.toSeq).toSet
    val b = Web.domainCap(df.repartition(7), "doc_id", "url", 10, "t1")
      .select("doc_id", "domain_rank", "kept")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // hash order, not id order: the kept set under a different salt differs
    val c = Web.domainCap(df, "doc_id", "url", 10, "t2")
      .where(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val aKept = out.where(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(aKept != (0L until 10L).toSet || c != aKept,
      "cap order must depend on the salted hash, not plain id order")
  }

  test("domainRollup: distinct canonical urls collapse messy variants; " +
    "blocklist gates by registrable domain; weights sum") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "HTTP://A.ex.com/p?b=2&a=1", 10L),
      (2L, "http://a.EX.com:80/p/?a=1&b=2&utm_source=z", 20L), // same canonical
      (3L, "http://a.ex.com/q", 5L),
      (4L, "https://bad.evil.net/x#f", 7L)
    ).toDF("doc_id", "url", "w")
    val out = Web.domainRollup(df, "url", col("w"), Seq("evil.net"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getBoolean(6)))).toMap
    assert(out == Map(
      "ex.com" -> ((3L, 2L, 35L, "http://a.ex.com/p?a=1&b=2", false)),
      "evil.net" -> ((1L, 1L, 7L, "https://bad.evil.net/x", true))
    ), s"got $out")
  }
}

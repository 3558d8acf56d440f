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

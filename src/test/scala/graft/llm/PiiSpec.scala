package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row

class PiiSpec extends SparkTestBase {

  private def scrubOne(text: String): Row = {
    val s = spark; import s.implicits._
    Pii.scrub(Seq((1L, text)).toDF("id", "text"), "id", "text").head()
  }
  private def counts(r: Row): Map[String, Long] =
    Pii.defaultRules.map(rl => rl.name -> r.getAs[Long](s"n_${rl.name}")).toMap
  private def redacted(r: Row): String = r.getAs[String]("redacted_text")

  test("each default rule redacts its own shape") {
    val r = scrubOne(
      "mail a.b+c@sub.example.org ip 10.0.3.200 call 415-555-0042 " +
        "ssn 123-45-6789 password: hunter2")
    assert(counts(r) == Map("email" -> 1L, "cred" -> 1L, "ipv4" -> 1L,
      "phone" -> 1L, "ssn" -> 1L))
    assert(redacted(r) ==
      "mail <EMAIL> ip <IP> call <PHONE> ssn <SSN> <CRED>")
    assert(r.getAs[Long]("n_redacted") == 5L)
  }

  test("order contract: email inside a credential counts as both " +
    "(email first, then cred swallows the pair)") {
    val r = scrubOne("password: bob@x.com rest")
    assert(counts(r)("email") == 1L && counts(r)("cred") == 1L)
    assert(redacted(r) == "<CRED> rest")
  }

  test("dotted-quad edges: a well-formed quad is an IP; a 4-digit-tail " +
    "quad is NOT an IP and its 3-3-4 tail redacts as phone") {
    val r = scrubOne("at 192.168.100.123 end")
    assert(counts(r)("ipv4") == 1L && counts(r)("phone") == 0L)
    assert(redacted(r) == "at <IP> end")
    // malformed: last octet 4 digits → \b fails inside the digit run, so
    // no IP; the phone rule then legitimately matches "168.100.1234"
    val m = scrubOne("at 192.168.100.1234 end")
    assert(counts(m)("ipv4") == 0L && counts(m)("phone") == 1L)
    assert(redacted(m) == "at 192.<PHONE> end")
  }

  test("adjacency: email glued to a phone redacts both " +
    "(tag boundary is a word boundary)") {
    val r = scrubOne("x a@b.com415-555-1234 y")
    assert(counts(r)("email") == 1L && counts(r)("phone") == 1L)
    assert(redacted(r) == "x <EMAIL><PHONE> y")
  }

  test("ssn vs phone shapes are disjoint (3-2-4 vs 3-3-4)") {
    val r = scrubOne("a 123-45-6789 b 123-456-7890 c")
    assert(counts(r)("ssn") == 1L && counts(r)("phone") == 1L)
    assert(redacted(r) == "a <SSN> b <PHONE> c")
  }

  test("digits-only user@host stays un-redacted by email (needs letter TLD) " +
    "but its embedded IP is caught") {
    val r = scrubOne("login user@192.168.0.1 now")
    assert(counts(r)("email") == 0L && counts(r)("ipv4") == 1L)
    assert(redacted(r) == "login user@<IP> now")
  }

  test("credential keyword without separator does not trigger; " +
    "case-insensitive with separator does") {
    val r0 = scrubOne("the token bucket rate")
    assert(counts(r0)("cred") == 0L)
    val r1 = scrubOne("API-KEY = demo_value_abc123")
    assert(counts(r1)("cred") == 1L)
    assert(redacted(r1) == "<CRED>")
  }

  test("multiple matches of one rule all redact (global replace)") {
    val r = scrubOne("a@b.co c@d.co e@f.co")
    assert(counts(r)("email") == 3L)
    assert(redacted(r) == "<EMAIL> <EMAIL> <EMAIL>")
  }

  test("null text propagates null counts and text") {
    val s = spark; import s.implicits._
    val r = Pii.scrub(Seq((1L, null: String)).toDF("id", "text"),
      "id", "text").head()
    assert(r.isNullAt(r.fieldIndex("n_email")))
    assert(r.isNullAt(r.fieldIndex("redacted_text")))
  }

  test("empty text yields zero counts and empty text") {
    val r = scrubOne("")
    assert(r.getAs[Long]("n_redacted") == 0L)
    assert(redacted(r) == "")
  }

  test("scrub plan is a single projection over the scan — no exchange") {
    val s = spark; import s.implicits._
    val df = Pii.scrub(Seq((1L, "a@b.co")).toDF("id", "text"), "id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("duplicate rule names rejected") {
    val s = spark; import s.implicits._
    val bad = Seq(Pii.Rule("x", "a", "<A>"), Pii.Rule("x", "b", "<B>"))
    intercept[IllegalArgumentException] {
      Pii.scrub(Seq((1L, "t")).toDF("id", "text"), "id", "text", bad)
    }
  }
}

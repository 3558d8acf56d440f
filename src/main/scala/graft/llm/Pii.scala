package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / sensitive-text scrubbing for training corpora: every production
  * pipeline redacts emails, phones, IPs and credential-shaped strings
  * before training (and keeps the per-doc redaction counts as quality
  * signals — a doc that is mostly PII is usually a scrape artifact).
  *
  * Everything here is a chain of codegen'd `regexp_count` /
  * `regexp_replace` columns — no UDFs, no shuffle; the scrub runs
  * map-side inside the parquet scan stage at any corpus scale, exactly
  * like [[TextAnalysis.qualityFeatures]].
  *
  * Pattern portability is a hard design constraint (the same property
  * [[TextAnalysis.regexTokens]] establishes for tokenization): each
  * pattern must mean the SAME thing under Java regex (Spark codegen)
  * and RE2 (DuckDB, Go/Rust engines). So: no lookaround, no
  * backreferences, no `\s`/`\S`/`\d`/`\w` shorthands (their class
  * definitions differ at the edges — Java's `\s` includes `\x0B`,
  * RE2's does not) — only explicit ASCII classes, `(?:…)` groups,
  * `(?i)` flags and `\b` word boundaries, all of which the two engines
  * define identically over ASCII.
  *
  * Rules apply IN ORDER, and each rule's count is taken over the text
  * AFTER the earlier rules' replacements. That makes overlap semantics
  * deterministic and engine-independent: `password: bob@x.com` redacts
  * as email first (`password: <EMAIL>`) and THEN the credential rule
  * swallows the pair (`<CRED>`), counting one of each — rather than
  * depending on which pattern the scanner happens to try first.
  */
object Pii {

  /** One scrub rule. `pattern` must hold to the portability contract
    * above; `tag` is the replacement token (chosen with no digits or
    * `@`/`.`/`:`/`=` so a tag can never re-trigger a later rule). */
  final case class Rule(name: String, pattern: String, tag: String)

  /** The default redaction table, in application order. Order matters
    * and is part of the contract:
    *  - email before cred, so `password: a@b.com` yields one email and
    *    one cred redaction (counts stay fine-grained);
    *  - ipv4 before phone, so a dotted quad is always an IP and never a
    *    phone-shaped digit run;
    *  - phone before ssn (disjoint shapes, 3-3-4 vs 3-2-4, but the
    *    order pins it for readers).
    */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("cred",
      "(?i)\\b(?:api[_-]?key|secret|token|passwd|password)" +
        "[ \\t\\r\\n]*[:=][ \\t\\r\\n]*[^ \\t\\r\\n]+",
      "<CRED>"),
    Rule("ipv4", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    Rule("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    Rule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"))

  /** Scrub `textCol`: returns `idCol`, one `n_<rule>` BIGINT count per
    * rule (matches redacted by THAT rule, i.e. counted after earlier
    * rules applied), `n_redacted` (their sum) and `redacted_text`.
    * Null text propagates as null text with null counts (same as every
    * Spark/DuckDB regexp builtin). One projection, zero exchanges. */
  def scrub(df: DataFrame, idCol: String, textCol: String,
            rules: Seq[Rule] = defaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one scrub rule required")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name)}")
    val staged = rules.zipWithIndex.foldLeft(
      df.select(col(idCol), col(textCol).as("__s0"))) {
      case (d, (r, i)) =>
        d.withColumn(s"n_${r.name}",
            regexp_count(col(s"__s$i"), lit(r.pattern)).cast("long"))
          .withColumn(s"__s${i + 1}",
            regexp_replace(col(s"__s$i"), r.pattern, r.tag))
    }
    val counts = rules.map(r => col(s"n_${r.name}"))
    staged.select(col(idCol) +: counts :+
      counts.reduce(_ + _).as("n_redacted") :+
      col(s"__s${rules.length}").as("redacted_text"): _*)
  }

  /** The staged DuckDB formulation of [[scrub]], generated from the SAME
    * rule table so the two engines cannot drift: one CTE per rule, each
    * counting with `regexp_extract_all` and replacing with the `'g'`
    * flag (DuckDB's regexp_replace is first-match-only without it).
    * `fromSql` supplies the input relation as `(id, text)`. */
  def scrubOracleSql(fromSql: String, idCol: String,
                     rules: Seq[Rule] = defaultRules): String = {
    def esc(s: String) = s.replace("'", "''")
    val stages = rules.zipWithIndex.map { case (r, i) =>
      s"""s${i + 1} AS (SELECT $idCol${(0 until i).map(j => s", n_${rules(j).name}").mkString},
         |    CAST(len(regexp_extract_all(t$i, '${esc(r.pattern)}')) AS BIGINT) AS n_${r.name},
         |    regexp_replace(t$i, '${esc(r.pattern)}', '${esc(r.tag)}', 'g') AS t${i + 1}
         |  FROM s$i)""".stripMargin
    }
    val names = rules.map(r => s"n_${r.name}")
    s"""WITH s0 AS (SELECT $idCol, text AS t0 FROM ($fromSql)),
       |${stages.mkString(",\n")}
       |SELECT $idCol, ${names.mkString(", ")},
       |  ${names.mkString(" + ")} AS n_redacted,
       |  t${rules.length} AS redacted_text
       |FROM s${rules.length}""".stripMargin
  }
}

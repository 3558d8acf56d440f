package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{filter, split}

/** The PINNED whitespace-tokenization character class shared by the
  * cross-engine-gated token families (BPE training d88/d91, exact
  * span dedup d89/d90) and their DuckDB oracles.
  *
  * Why not `\s` / `.`: the engine runs Java regex, the oracle runs
  * RE2, and the two disagree OUTSIDE ASCII — Java `\s` includes
  * U+000B where RE2's does not, and Java `.` excludes U+0085/U+2028/
  * U+2029 which RE2 `.` matches, so a corpus word carrying a Unicode
  * line separator would tokenize differently per engine (and Java `.`
  * would silently DROP the separator from a symbol list — data loss,
  * not just divergence). An explicit class of named code points means
  * both engines compile the identical automaton: split on exactly
  * Java's ASCII `\s` set { space, \t, \n, \x0B, \f, \r } (so ASCII
  * behavior is bit-identical to the historical `\s+`), and take
  * symbols as the NEGATION of that set — every non-split code point
  * survives as a symbol, including U+2028 and friends. */
object WhitespaceTokens {

  /** Word-split regex — identical under Java regex and RE2; equals
    * Java `\s+` on all inputs that contain no code point above 0x7F
    * whitespace (and is deliberately stable where `\s` is not). */
  val splitRegex: String = "[ \\t\\n\\x0B\\f\\r]+"

  /** One-code-point symbol regex: the negated split class. Lossless —
    * a word (already free of split characters) yields exactly one
    * match per code point. */
  val symbolRegex: String = "[^ \\t\\n\\x0B\\f\\r]"

  /** Whitespace-split non-empty tokens of a text column. */
  def tokens(text: Column): Column =
    filter(split(text, splitRegex), t => t =!= "")
}

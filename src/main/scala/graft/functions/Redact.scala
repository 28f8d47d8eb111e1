package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction — the standard curation pass (C4/Dolma/FineWeb
  * all run one) between quality filtering and shard writing. Spec-checked
  * on crafted fixtures (RedactSpec) rather than oracle-gated: the
  * synthetic corpus contains no PII-shaped text, so an oracle row would be
  * vacuously all-zero.
  *
  * Everything is built-in regexp expressions (codegen'd, no UDF), so the
  * pass composes into any pipeline as a per-row projection — map-only,
  * no shuffle, embarrassingly parallel at any scale. Patterns are
  * deliberately lookaround-free so they run identically on Java regex and
  * RE2-family engines.
  */
object Redact {
  /** (tag, pattern, replacement) — applied in order; EMAIL before PHONE
    * so digits inside an address are consumed as one email hit. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ip", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    // no leading \b: the match may start at '(' or '+' (both non-word, so
    // a word boundary there can never hold); the paren pair travels as one
    // alternative so "(415) ..." redacts whole
    ("phone", "(?:\\+?1[-. ])?(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\\b",
      "<PHONE>"))

  /** Redacted text: every rule applied in order. Idempotent — the
    * replacement tokens match no rule. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (_, pat, rep)) => regexp_replace(c, pat, rep) }

  /** Per-rule hit counts as one struct column (email, ssn, ip, phone).
    * Counts are taken rule-by-rule ON THE PARTIALLY-REDACTED text, so a
    * span consumed by an earlier rule is not double-counted by a later
    * one (an SSN inside an email address counts as email only). */
  def piiCounts(text: Column): Column = {
    val (_, cols) = rules.foldLeft((text, Seq.empty[Column])) {
      case ((c, acc), (tag, pat, rep)) =>
        (regexp_replace(c, pat, rep), acc :+ regexp_count(c, lit(pat)).as(tag))
    }
    struct(cols: _*)
  }

  /** Total hits across all rules. */
  def piiTotal(text: Column): Column = {
    val s = piiCounts(text)
    rules.map { case (tag, _, _) => s.getField(tag) }.reduce(_ + _)
  }
}

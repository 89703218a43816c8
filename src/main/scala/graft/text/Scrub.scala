package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact emails, IPv4
  * addresses and international phone numbers — the C4-style cleanup
  * stage before text ships to a tokenizer. (Extension beyond the
  * reference surface.)
  *
  * Pure codegen'd expressions (`regexp_count`/`regexp_replace`) — no
  * UDFs, map-only plan, scales with the scan. The patterns avoid
  * lookarounds and backreferences on purpose: they mean the same thing
  * in Java regex, RE2, and PCRE, so an external engine (the DuckDB
  * oracle, a downstream auditor) reproduces the counts exactly.
  *
  * Counts are computed INDEPENDENTLY on the original text; redaction
  * is sequential (email → IP → phone). A token inside an
  * already-redacted span (an IPv4-shaped domain in an email) counts
  * for both patterns but is redacted once with the outer token.
  */
object Scrub {

  /** Conservative email shape: local@domain.tld, tld ≥ 2 letters. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; no range check — scrubbing
    * over-matches rather than leaks). */
  val ipv4Re = "\\b(?:[0-9]{1,3}\\.)(?:[0-9]{1,3}\\.)(?:[0-9]{1,3}\\.)[0-9]{1,3}\\b"

  /** International phone: '+' then 7–15 digits (E.164). Deliberately
    * strict — free-form national formats false-positive too often. */
  val phoneRe = "\\+[0-9]{7,15}"

  private val steps: Seq[(String, String, String)] = Seq(
    ("n_emails", emailRe, "<EMAIL>"),
    ("n_ips", ipv4Re, "<IP>"),
    ("n_phones", phoneRe, "<PHONE>"))

  /** Append per-pattern counts (`n_emails`, `n_ips`, `n_phones`) and a
    * fully-redacted `text_redacted` column. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val counted = steps.foldLeft(df) { case (acc, (name, re, _)) =>
      acc.withColumn(name, regexp_count(col(textCol), lit(re)).cast("long"))
    }
    val redacted = steps.foldLeft(col(textCol)) { case (c, (_, re, token)) =>
      regexp_replace(c, lit(re), lit(token))
    }
    counted.withColumn("text_redacted", redacted)
  }

  /** True where the text contains any of the scrubbed PII shapes —
    * the filter-side companion to [[redactPii]]. */
  def hasPii(text: Column): Column =
    steps.map { case (_, re, _) => regexp_like(text, lit(re)) }
      .reduce(_ || _)
}

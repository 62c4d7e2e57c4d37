package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus curation: replace email
  * addresses, phone numbers and IPv4 addresses with typed placeholder
  * tokens, and report per-row match counts so a pipeline can both
  * clean and audit (rate of PII per source is a standard data-quality
  * signal).
  *
  * Patterns are deliberately RE2-compatible (no lookaround, no
  * backreferences): they run unchanged on Spark's Java regex, on
  * RE2-based engines (DuckDB, Go), and inside codegen'd
  * `regexp_replace`/`regexp_count` — pure per-row projections, zero
  * shuffle, so scrubbing composes into any scan at 100 TB.
  *
  * Redaction order is fixed (email → phone → IPv4): an email's
  * host part can contain digit runs a naive phone/IP pattern would
  * match, so emails must be collapsed first; the placeholder tokens
  * themselves match none of the patterns, making the pipeline
  * idempotent.
  */
object PiiScrub {
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def countEmails(c: Column): Column = regexp_count(c, lit(emailPattern))
  def countPhones(c: Column): Column = regexp_count(c, lit(phonePattern))
  def countIps(c: Column): Column = regexp_count(c, lit(ipv4Pattern))

  /** Text with all three PII classes replaced by placeholders. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")
}

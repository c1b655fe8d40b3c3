package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation — the scrub
  * pass every corpus runs before text reaches a trainer.
  *
  * All patterns are native `regexp_count`/`regexp_replace` expressions
  * (codegen'd, per-row, shuffle-free), so the pass scales linearly and
  * fuses into whatever projection precedes the write. The regexes stay
  * inside the portable subset shared by Java regex and RE2 (no
  * lookaround, no backreferences), so a DuckDB oracle can restate the
  * exact same scrub and hash-match the output.
  *
  * Redaction order matters and is fixed: emails first (their local part
  * can contain digit runs a later pass would mangle), then IPv4 (dotted
  * digit runs that the phone pattern must never see), then phones.
  */
object Privacy {

  /** Portable (Java ∩ RE2) patterns, exposed so the correctness oracle
    * injects the IDENTICAL strings into its SQL.
    */
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(emailRe))
  def countIpv4(text: Column): Column   = regexp_count(text, lit(ipv4Re))
  def countPhones(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Scrub all three categories, in the documented order. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, emailRe, "[EMAIL]")
    val noIp    = regexp_replace(noEmail, ipv4Re, "[IP]")
    regexp_replace(noIp, phoneRe, "[PHONE]")
  }

  /** True when the text contains any detectable PII (cheap pre-filter:
    * lets the expensive redact projection run only on the hit subset).
    */
  def hasPii(text: Column): Column =
    countEmails(text) + countIpv4(text) + countPhones(text) > 0
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of emails, IPv4
  * addresses and phone-shaped numbers, plus per-category match counts
  * for corpus auditing. Pure codegen'd regexp expressions — no UDFs, no
  * shuffle; the projection composes with column pruning like any narrow
  * map, so at 100 TB this is a scan-speed pass. Patterns live in the
  * Java-regex ∩ RE2 common subset (no backrefs, no lookaround) so the
  * DuckDB oracle replays the same strings verbatim (with the 'g' flag —
  * Spark's regexp_replace is replace-all by default, DuckDB's is not).
  *
  * Deliberately pattern-based (the public-pipeline staple): entity-model
  * PII (names, addresses) is out of scope for a regex pass and would be
  * a model-scored column upstream of this operator.
  */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  /** text with emails → [EMAIL], IPv4 → [IP], phones → [PHONE].
    * Order matters and is part of the contract: emails first (an email
    * is never left half-redacted by the IP pass — an IP-shaped local
    * part or domain is consumed as part of the email match), IPs second,
    * phones last. The replacement tokens contain no digits, so a pass
    * can never manufacture a match for a later pass. */
  def redact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]").as("text_redacted"))

  /** Per-doc PII counts over the ORIGINAL text (corpus audit surface):
    * how many matches of each category each document carries. */
  def piiCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def n(re: String): Column =
      size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("bigint")
    docs.select(col(idCol).as("id"),
      n(EmailRe).as("n_email"), n(Ipv4Re).as("n_ip"),
      n(PhoneRe).as("n_phone"))
  }
}

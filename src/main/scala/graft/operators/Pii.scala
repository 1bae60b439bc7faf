package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation
  * (beyond-reference, builder brief): emails, North-American phone
  * numbers, IPv4 addresses.
  *
  * Everything is scan-stage `Column` expressions over Spark's codegen'd
  * regexp functions — no UDFs, no shuffle; detection adds three int
  * columns, redaction rewrites the text in place. The patterns use only
  * syntax shared by Java regex and RE2, so an external engine (the
  * DuckDB oracle) can replay them byte-for-byte.
  *
  * 100 TB notes: pure map-side work that pipelines into whatever scan
  * is already running; the usual deployment fuses [[redact]] into the
  * curation pipeline's first projection so PII never crosses a shuffle
  * or lands in an intermediate table.
  */
object Pii {

  /** Shared Java/RE2 patterns (no lookbehind, no backrefs). */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  // NULL text counts as zero findings: detect/scrub must agree with
  // redact (which passes NULL through) instead of silently dropping
  // NULL-text rows via a NULL filter condition
  private def count(c: Column, re: String): Column =
    coalesce(size(regexp_extract_all(c, lit(re), lit(0))), lit(0))

  /** Per-document PII counts + flag: (.., n_emails, n_phones, n_ips,
    * has_pii). Detection only — no text rewrite.
    */
  def detect(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", count(t, emailRe))
      .withColumn("n_phones", count(t, phoneRe))
      .withColumn("n_ips", count(t, ipv4Re))
      .withColumn("has_pii",
        (col("n_emails") + col("n_phones") + col("n_ips")) > 0)
  }

  /** Redact in place: emails → `<EMAIL>`, phones → `<PHONE>`, IPv4 →
    * `<IP>`. Order matters — emails first, so an address's host part
    * can't be half-eaten by the IP pattern.
    */
  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** [[redactText]] applied to a document frame's text column. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, redactText(col(textCol)))

  /** Drop documents whose PII finding count exceeds `maxFindings`
    * (redaction handles the rest) — the "too dirty to salvage" cut.
    */
  def scrub(docs: DataFrame, maxFindings: Int = 0,
            textCol: String = "text"): DataFrame =
    detect(docs, textCol)
      .filter(col("n_emails") + col("n_phones") + col("n_ips") <= maxFindings)
      .drop("n_emails", "n_phones", "n_ips", "has_pii")
}

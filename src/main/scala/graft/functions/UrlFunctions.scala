package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain column functions for web-corpus curation — the step
  * between WARC ingestion ([[graft.sources.Warc]]) and per-domain
  * policy (caps, stats, blocklists). All plain Column programs over
  * the built-in `parse_url` — scan-stage, no UDFs.
  */
object UrlFunctions {

  /** The URL's host (null for unparseable input) — `try_parse_url
    * HOST`, not `parse_url`: under ANSI mode (the Spark 4 default)
    * the plain form ERRORS on an invalid URL, and one garbage URL in
    * a 100 TB crawl must degrade to null, never kill the job.
    */
  def host(url: Column): Column =
    call_function("try_parse_url", url, lit("HOST"))

  /** Common multi-part public suffixes (country-code second-level
    * domains): under these, the registrable domain keeps THREE labels
    * (bbc.co.uk), not two (co.uk is not a registrable site). A
    * deliberately small, well-known subset of the public-suffix list —
    * the full PSL is a versioned external artifact; this heuristic
    * covers the dominant crawl domains and is pinned here so results
    * replay.
    */
  private val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.kr",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tw",
    "co.in", "co.nz", "com.sg", "com.tr")

  /** The registrable (pay-level) domain of a host: the last two
    * labels, or three when the last two form a known multi-part
    * suffix ([[multiPartSuffixes]]). Single-label hosts (localhost)
    * and IPv4 literals pass through unchanged — truncating an IP to
    * its last octets would merge unrelated servers.
    */
  def registrableDomainOfHost(h: Column): Column = {
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val isIpv4 = h.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$")
    when(h.isNull, lit(null).cast("string"))
      .when(isIpv4 || n <= 2, h)
      .when(last2.isin(multiPartSuffixes: _*),
        concat_ws(".", element_at(parts, -3), last2))
      .otherwise(last2)
  }

  /** [[registrableDomainOfHost]] of the URL's host. */
  def registrableDomain(url: Column): Column = registrableDomainOfHost(host(url))
}

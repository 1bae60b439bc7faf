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

  /** Canonical URL form for crawl-frontier / recrawl dedup — the same
    * page fetched as `HTTP://Host/p?utm_source=feed&b=2&a=1#top` and
    * `http://host/p?a=1&b=2` must compare equal:
    *   - fragment dropped (never sent to the server),
    *   - scheme+host lowercased (case-insensitive by RFC 3986),
    *   - default ports stripped (`:80` http, `:443` https),
    *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `ref` — the attribution noise that makes every social share a
    *     "different" URL),
    *   - remaining query parameters sorted (order is almost never
    *     semantic; sorting collapses permutations).
    * Path case and trailing slashes are PRESERVED — both can be
    * semantic, and a canonicalizer that merges distinct pages is worse
    * than one that misses a duplicate. Pure regex + array Column
    * algebra (RE2-shared syntax), mirrored verbatim by the DuckDB
    * oracle; idempotent (spec-pinned).
    */
  def canonicalize(url: Column): Column = {
    val schemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val noFrag = regexp_replace(url, "#.*$", "")
    val head = regexp_extract(noFrag, schemeHost, 0)
    val tail = regexp_replace(noFrag, schemeHost, "")
    val headNoPort = regexp_replace(
      regexp_replace(lower(head), "^(http://[^:/]*):80$", "$1"),
      "^(https://[^:/]*):443$", "$1")
    val path = regexp_replace(tail, "\\?.*$", "")
    val qs = regexp_extract(tail, "\\?(.*)$", 1)
    val params = filter(split(qs, "&"), p =>
      length(p) > 0 && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)"))
    val sorted = array_sort(params)
    concat(headNoPort,
      when(size(sorted) > 0, concat(path, lit("?"), array_join(sorted, "&")))
        .otherwise(path))
  }
}

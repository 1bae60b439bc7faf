package graft

import graft.functions.UrlFunctions
import graft.operators.Domains
import org.apache.spark.sql.functions.col

/** The per-domain curation operators and the registrable-domain
  * heuristic's edges — the cases the synthesized-URL oracle can't
  * reach (IPs, single labels, unparseable URLs, null passthrough).
  */
class DomainsSpec extends SparkSpec {
  import spark.implicits._

  test("registrableDomain: two-label, multi-part-suffix, single-label, IP, garbage") {
    val got = Seq(
      "http://www.example.com/a",          // subdomain → example.com
      "http://news.bbc.co.uk/story",       // ccSLD → bbc.co.uk
      "http://example.org",                // bare two-label host
      "http://localhost:8080/x",           // single label passes through
      "http://192.168.10.1/admin",         // IPv4 passes through whole
      "http://a.b.c.d.com.au/x",           // deep subdomains → d.com.au
      "not a url at all")                  // unparseable → null
      .toDF("url")
      .select(UrlFunctions.registrableDomain(col("url")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("example.com"), Some("bbc.co.uk"),
      Some("example.org"), Some("localhost"), Some("192.168.10.1"),
      Some("d.com.au"), None))
  }

  test("domainStats groups hosts under their registrable domain") {
    val docs = Seq(
      (1L, "http://a.site.com/1"), (2L, "http://b.site.com/2"),
      (3L, "http://a.site.com/3"), (4L, "http://only.other.org/4"))
      .toDF("doc_id", "url")
    val rows = Domains.domainStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("other.org", 1L, 1L), ("site.com", 3L, 2L)))
  }

  test("capPerDomain keeps at most cap per domain, deterministically; unattributable docs pass through") {
    val docs = (1L to 40L).map(i => (i, s"http://h$i.big.com/$i"))
      .toDF("doc_id", "url")
      .union(Seq((100L, "no scheme no host")).toDF("doc_id", "url"))
    val kept = Domains.capPerDomain(docs, cap = 7)
    assert(kept.count() == 8L) // 7 capped + 1 passthrough
    assert(kept.filter(col("doc_id") === 100L).count() == 1L)
    // deterministic: the same cut every run
    val ids1 = kept.collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Domains.capPerDomain(docs, cap = 7).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // a domain under the cap is untouched
    val small = Seq((1L, "http://x.small.net/a"), (2L, "http://y.small.net/b"))
      .toDF("doc_id", "url")
    assert(Domains.capPerDomain(small, cap = 7).count() == 2L)
    intercept[IllegalArgumentException](Domains.capPerDomain(small, cap = 0))
  }

  test("canonicalize: case/port/tracking/fragment/param-order all normalize; path case survives") {
    import graft.functions.UrlFunctions
    val urls = Seq(
      (0L, "HTTP://Example.COM:80/Path/One?utm_source=x&b=2&a=1#frag"),
      (1L, "http://example.com/Path/One?a=1&b=2"),
      (2L, "https://Example.com:443/p?ref=tw&fbclid=z&gclid=q"),
      (3L, "https://example.com/p"),
      (4L, "http://example.com/path/one"), // path CASE differs from 0/1 — distinct
      (5L, "http://example.com/q?a=1&a=0") // duplicate keys keep both, sorted
    ).toDF("doc_id", "url")
    val got = urls.select($"doc_id", UrlFunctions.canonicalize($"url").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "http://example.com/Path/One?a=1&b=2")
    assert(got(0L) == got(1L))
    assert(got(2L) == got(3L))
    assert(got(4L) != got(0L))
    assert(got(5L) == "http://example.com/q?a=0&a=1")
    // idempotence: canonical of canonical is a fixed point
    val twice = urls.select(UrlFunctions.canonicalize(
        UrlFunctions.canonicalize($"url")).as("c2"),
      UrlFunctions.canonicalize($"url").as("c1")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}

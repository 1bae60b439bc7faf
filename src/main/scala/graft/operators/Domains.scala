package graft.operators

import graft.functions.UrlFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain curation over a URL-carrying corpus — the policy step
  * between WARC ingestion and training-set assembly: a handful of
  * boilerplate-heavy domains otherwise dominate a crawl snapshot (the
  * reason web-curation pipelines cap documents per registrable
  * domain). Everything is one aggregation or one window over the
  * registrable-domain key ([[UrlFunctions]] — scan-stage Column
  * programs, no UDFs); at 100 TB each operator is a single shuffle on
  * a low-cardinality key with map-side partial aggregation absorbing
  * the head.
  */
object Domains {

  /** Per registrable domain: document count and distinct-host count,
    * ordered by domain. Docs with an unparseable host are excluded
    * (they have no domain to attribute to — count them via the
    * corpus-level quality reports instead).
    */
  def domainStats(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.select(UrlFunctions.host(col(urlCol)).as("__host"))
      .filter(col("__host").isNotNull)
      .select(UrlFunctions.registrableDomainOfHost(col("__host")).as("domain"),
        col("__host"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__host")).as("n_hosts"))
      .orderBy(col("domain"))

  /** Keep at most `cap` documents per registrable domain, chosen in
    * [[Sampling.pseudoOrder]] — deterministic, replayable cross-engine
    * (modular integer arithmetic, no RNG), and stable under
    * re-partitioning. One shuffle (the per-domain window). Docs whose
    * URL yields no domain pass through UNCAPPED — they cannot be
    * attributed, and silently grouping them as one pseudo-domain
    * would cap unrelated documents against each other.
    */
  def capPerDomain(docs: DataFrame, cap: Int, urlCol: String = "url",
                   idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"capPerDomain: cap=$cap must be > 0")
    val dd = docs.withColumn("__domain",
      UrlFunctions.registrableDomain(col(urlCol)))
    val w = Window.partitionBy(col("__domain"))
      .orderBy(Sampling.pseudoOrder(col(idCol)), col(idCol))
    dd.filter(col("__domain").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn", "__domain")
      .unionByName(dd.filter(col("__domain").isNull).drop("__domain"))
  }
}

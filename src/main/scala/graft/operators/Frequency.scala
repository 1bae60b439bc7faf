package graft.operators

import graft.functions.FreqFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-scale frequent-token analytics.
  *
  * Exact top-k term frequency is the canonical "looks trivial, dies at
  * scale" query: `groupBy(token).count()` shuffles the FULL token
  * universe, which for web text (URLs, hex ids, typos, code) grows
  * with the corpus. The scalable exact shape is candidates-then-verify:
  *
  *  1. ONE pass folds every partition into a `capacity`-bounded
  *     Misra-Gries summary ([[graft.functions.MisraGries]]); partial
  *     aggregation merges summaries map-side, so the shuffle carries a
  *     few KB per partition, never the token universe. Any token with
  *     true count > N/(capacity+1) is guaranteed present.
  *  2. The ≤ capacity candidates broadcast back as an `isin` filter on
  *     a second scan; only candidate tokens reach the exact recount
  *     groupBy — a shuffle over ≤ capacity distinct keys.
  *
  * The result is EXACT whenever the k-th true count exceeds
  * N/(capacity+1) (the MG retention bound) — size capacity ≥ k/ε for
  * the tail you care about. At fixture vocabulary sizes capacity
  * exceeds the whole vocabulary, so the summary itself is exact.
  */
object Frequency {

  /** Exact top-k whitespace tokens by corpus frequency, via the
    * MG-candidates + exact-recount plan above. Total order: count
    * desc, token asc.
    */
  def heavyHitterTopK(docs: DataFrame, k: Int = 20,
                      capacity: Int = 256): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"heavyHitterTopK: need capacity >= k >= 1, got k=$k capacity=$capacity")
    val spark = docs.sparkSession
    FreqFunctions.register(spark)
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    // pass 1: bounded summary; the driver receives ONE row holding
    // <= capacity (item, est) structs
    val summary = toks.agg(
      FreqFunctions.misraGries(col("token"), capacity).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.item")).collect().map(_.getString(0)).toSeq
    // pass 2: exact recount restricted to the candidate set (empty
    // corpus => empty candidates => empty result, not an isin() error)
    val candidates =
      if (summary.isEmpty) toks.limit(0)
      else toks.filter(col("token").isin(summary: _*))
    candidates
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
  }
}

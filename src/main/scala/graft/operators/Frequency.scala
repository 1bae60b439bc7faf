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
    // pass 1: bounded summary + stream length; the driver receives ONE
    // row holding <= capacity (item, est) structs and N
    val row = toks.agg(
      FreqFunctions.misraGries(col("token"), capacity).as("mg"),
      count(lit(1)).as("n")).head()
    val mg = row.getSeq[org.apache.spark.sql.Row](0)
    val summary = mg.map(_.getString(0))
    // exactness precondition (MG retention bound): the result is the
    // true top-k if the k-th count clears N/(capacity+1). Checked from
    // pass-1 data alone (no extra corpus scan): sum(est) == N proves
    // the summary never decremented (every token retained, all counts
    // exact); otherwise est <= true, so est_k above the bar still
    // PROVES retention — only a lossy summary with est_k at or under
    // the bar may have missed the true k-th, and that degradation is
    // said out loud instead of silently shipping a wrong top-k.
    val n = row.getLong(1)
    val bar = n.toDouble / (capacity + 1)
    val lossy = mg.map(_.getLong(1)).sum < n
    if (lossy && (mg.size < k || mg(k - 1).getLong(1) <= bar))
      System.err.println(s"[graft] heavyHitterTopK: capacity=$capacity may be " +
        f"undersized for exact top-$k (k-th estimate ${if (mg.size < k) 0L else mg(k - 1).getLong(1)} " +
        f"<= N/(capacity+1) = $bar%.1f) — counts of RETAINED tokens stay exact, " +
        "but a tail token above the true k-th may be missing; raise capacity")
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

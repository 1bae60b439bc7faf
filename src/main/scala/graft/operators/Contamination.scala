package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-gram shingles with an evaluation set, the standard "remove eval
  * overlap from the training corpus" pipeline step (beyond-reference,
  * builder brief; n is the usual 8-13-gram knob, smaller here so the
  * fixture exercises it).
  *
  * Scale shape: the eval set is tiny next to the corpus, so its
  * distinct shingles BROADCAST and hit-marking runs inside the corpus
  * scan stage — the 100 TB corpus is read once and never shuffled on
  * shingles. The per-doc aggregation does shuffle one partial row per
  * document (overlap and total counted together in a single pass); the
  * contaminated-only filter then shrinks the OUTPUT to the small
  * flagged set.
  */
object Contamination {

  /** One row per contaminated corpus doc: distinct overlapping-shingle
    * count, the doc's distinct-shingle count, and the overlap fraction.
    * Clean docs are absent — at scale the output is the (small)
    * contaminated set, not the corpus.
    */
  def flag(corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // ONE pass over the corpus shingles: a broadcast left join marks
    // eval hits in the scan stage, and a single groupBy counts totals
    // and overlaps together — no second shingle evaluation, no extra
    // shuffle for a separate sizes aggregate
    val c = Dedup.shingles(corpus, n, textCol, idCol)
    val e = Dedup.shingles(evalSet, n, textCol, idCol)
      .select(col("shingle")).distinct().withColumn("__hit", lit(1))
    c.join(broadcast(e), Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(col("__hit")).as("n_overlap"),
        count(lit(1)).as("n_shingles"))
      .filter(col("n_overlap") > 0)
      .select(col("id").as(idCol), col("n_overlap"), col("n_shingles"),
        round(col("n_overlap").cast("double") / col("n_shingles"), 4)
          .as("overlap_frac"))
      .orderBy(col(idCol))
  }

  /** Scale variant of [[flag]]: shingle identity is the 64-bit
    * composite hash ([[Dedup.shingleHashes]]) — no shingle strings are
    * materialized or broadcast, the eval side ships 8-byte longs. Same
    * output modulo negligible 64-bit collisions (spec asserts equality
    * with [[flag]] on the fixture). Use this at corpus scale; [[flag]]
    * stays for the string-level oracle.
    */
  def flagHashed(corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val c = Dedup.shingleHashes(corpus, n, textCol, idCol)
    val e = Dedup.shingleHashes(evalSet, n, textCol, idCol)
      .select(col("h")).distinct().withColumn("__hit", lit(1))
    c.join(broadcast(e), Seq("h"), "left")
      .groupBy(col("id"))
      .agg(count(col("__hit")).as("n_overlap"),
        count(lit(1)).as("n_shingles"))
      .filter(col("n_overlap") > 0)
      .select(col("id").as(idCol), col("n_overlap"), col("n_shingles"),
        round(col("n_overlap").cast("double") / col("n_shingles"), 4)
          .as("overlap_frac"))
      .orderBy(col(idCol))
  }

  /** The corpus with contaminated docs removed (overlap fraction above
    * `maxOverlap`): the apply-side of [[flag]]. The cut uses the EXACT
    * ratio, not [[flag]]'s display-rounded `overlap_frac` — with the
    * rounded value a >20000-shingle doc with one eval hit rounds to
    * 0.0000 and would silently survive a zero-tolerance scrub.
    */
  def scrub(corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
            maxOverlap: Double = 0.0,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bad = flag(corpus, evalSet, n, textCol, idCol)
      .filter(col("n_overlap").cast("double") / col("n_shingles") > maxOverlap)
      .select(col(idCol))
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }
}

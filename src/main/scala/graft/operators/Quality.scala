package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level quality signals that need the token array bound as a
  * column (the scalar per-character signals live in
  * [[graft.functions.TextFunctions]] as pure Column expressions).
  */
object Quality {

  /** Intra-document duplicate n-gram stats — the Gopher-style
    * repetition filter signal (a doc that keeps repeating the same
    * phrases has dup_ratio near 1): (doc_id, n_ngrams, n_distinct,
    * dup_ratio = 1 − distinct/total). Shuffle-free scan-stage
    * expressions; the token array is BOUND as a column before the
    * windowing lambda (an unbound split re-evaluates per element —
    * O(len²) per doc).
    */
  def dupNgramStats(docs: DataFrame, n: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tokenized = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val grams = transform(
      sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
      i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))
    tokenized.select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_ngrams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 4))
      .orderBy(col("doc_id"))
  }
}

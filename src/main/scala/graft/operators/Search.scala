package graft.operators

import graft.Materialize.MaterializeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical full-text search over the corpus — the keyword-side
  * complement of [[Similarity]]'s embedding search (beyond-reference,
  * builder brief: a training-data pipeline inspects its corpus by
  * keyword at least as often as by vector).
  */
object Search {

  /** BM25 top-k documents for a bag-of-words query (Lucene's variant:
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf saturation k1, length
    * normalization b against the corpus mean length).
    *
    * Plan shape — the inverted-index PROBE expressed relationally: the
    * query's distinct terms become an `isin` literal filter that lands
    * in the token scan, so everything past the scan (tf, df, scoring)
    * is sized by documents-containing-a-query-term, never the corpus
    * vocabulary. Doc lengths are one corpus-wide count aggregate (the
    * only full-width stage, and it's a count, not text); N and avgdl
    * ride a 1-row broadcast. Top-k is TakeOrderedAndProject (per-
    * partition heaps, k×partitions rows at the driver) — no global
    * sort. Scores are rounded to 4 decimals BEFORE the k-cut with
    * doc_id as tiebreak, so the cut is replayable cross-engine.
    *
    * At 100 TB the production shape persists `toks`/`doclen` once
    * (they're query-independent — exactly the postings/norms split of
    * a Lucene segment); per-query cost is then the pruned postings
    * scan. Here they derive inline, which benchmarks the worst case.
    */
  def bm25TopK(docs: DataFrame, query: String, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val terms = query.trim.split("\\s+").distinct.toSeq
    require(terms.nonEmpty && terms.head.nonEmpty, "bm25TopK: empty query")
    val toks = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val doclen = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
      .graftCheckpoint() // read twice: corpus stats + per-doc norm join
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl")) // 1 row — broadcast
    val tf = toks.filter(col("tok").isin(terms: _*)) // lands in the scan
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      .graftCheckpoint() // read twice: df fold + scoring
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(df, "tok")
      .join(doclen, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id").as(idCol))
      .agg(round(sum(col("w")), 4).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Hybrid retrieval: BM25 lexical top-kEach fused with exact-cosine
    * vector top-kEach by reciprocal-rank fusion
    * (Cormack/Clarke/Buettcher, SIGIR'09: score(d) = Σ_lists 1/(c +
    * rank_list(d)); c=60 is the published default). The standard
    * first-stage retriever of a curation/RAG pipeline — lexical recall
    * catches exact terms, the embedding side catches paraphrases, and
    * RRF needs no score calibration between the two (ranks only).
    *
    * `queryVec` carries the information need's embedding (one row of
    * the embeddings table here; in production, the encoded query) and
    * `docs.doc_id` must share the embedding table's id space.
    *
    * Plan shape: each side is its own top-kEach pipeline (BM25's
    * pruned-postings probe; brute cosine's broadcast-query scan — at
    * 100 TB the ANN-index probe slots in with the same (id, rank)
    * output contract). The fusion then touches ≤ 2·kEach rows: a
    * full-outer join on doc id (a doc may appear in either list),
    * 1/(c+rank) folds with a missing side contributing 0, round-
    * before-cut, TakeOrdered k. The corpus never reaches the fusion
    * stage, so fusing more rankers adds joins over k-row lists, not
    * scans. The tiny single-partition windows rank ≤ kEach rows that
    * already passed a limit — not a corpus sort.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, query: String,
                queryVec: DataFrame, k: Int = 10, kEach: Int = 20,
                c: Int = 60, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLex = Window.orderBy(col("score").desc, col(idCol))
    val lex = bm25TopK(docs, query, kEach, textCol = textCol, idCol = idCol)
      .withColumn("lex_rank", row_number().over(wLex))
      .select(col(idCol), col("lex_rank"))
    val vec = Similarity.bruteForceTopK(emb, queryVec, kEach)
      .select(col("vec_id").as(idCol), col("rank").as("vec_rank"))
    lex.join(vec, Seq(idCol), "full_outer")
      // 1/(c+rank) is an exact IEEE double both engines compute
      // identically; rounding is belt-and-braces for the cut order
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("vec_rank")), lit(0.0)), 6))
      .select(col(idCol), col("rrf"),
        col("lex_rank").cast("long").as("lex_rank"),
        col("vec_rank").cast("long").as("vec_rank"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG/embedding prep step: a
  * long document becomes overlapping fixed-size token windows (stride
  * < size ⇒ the overlap keeps context that a hard cut would sever at
  * every boundary). Beyond-reference, builder brief: the similarity
  * stack ([[Similarity]]/[[AnnIndexStore]]) embeds CHUNKS in practice,
  * not whole documents.
  *
  * Scan-stage only: tokens bind to a real column once (`withColumn`),
  * chunk boundaries are integer arithmetic over plan literals, and the
  * explode emits ~n/stride rows per doc — no shuffle, no UDF. The
  * whole operator is engine-portable arithmetic + slicing, so the
  * DuckDB oracle replays it exactly (x_text_chunks).
  */
object Chunker {

  /** Explode `docs` into chunks of `chunkTokens` whitespace tokens
    * every `strideTokens` (1-based `tok_start`; `chunk_id` from 0;
    * the final chunk may be short, empty docs emit nothing). Output:
    * (idCol, chunk_id, tok_start, n_toks, chunk).
    */
  def chunk(docs: DataFrame, chunkTokens: Int, strideTokens: Int,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens >= 1, s"chunk: chunkTokens=$chunkTokens must be >= 1")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"chunk: strideTokens=$strideTokens must be in [1, $chunkTokens] " +
        "(stride > size would silently DROP the tokens between windows)")
    val nChunks = (lit(1) +
      ceil(greatest(col("__n") - chunkTokens, lit(0)).cast("double") /
        strideTokens).cast("int"))
    docs
      .withColumn("__toks", filter(split(col(textCol), " "), t => length(t) > 0))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol),
        explode(transform(sequence(lit(0), nChunks - 1), c => struct(
          c.cast("long").as("chunk_id"),
          (c * strideTokens + 1).cast("long").as("tok_start"),
          least(lit(chunkTokens), col("__n") - c * strideTokens)
            .cast("long").as("n_toks"),
          concat_ws(" ", slice(col("__toks"), c * strideTokens + lit(1),
            lit(chunkTokens))).as("chunk")))).as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.tok_start"),
        col("c.n_toks"), col("c.chunk"))
  }
}

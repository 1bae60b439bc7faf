package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring (beyond-reference, builder
  * brief): the classic perplexity-style quality signal — documents
  * whose tokens are improbable under the corpus's own unigram
  * distribution score high (gibberish, boilerplate, wrong-language
  * contamination), and a percentile cut drops them.
  *
  * Plan shape: ONE token explode feeds both the frequency table (hash
  * aggregate) and the scoring join; the per-document score is a second
  * hash aggregate keyed on doc id. The frequency join is a plain
  * shuffle equi-join on the token — at 100 TB the vocabulary is
  * millions of rows (too big to assume broadcastable, fine to shuffle);
  * both sides partition by token, and AQE broadcasts it when it does
  * fit. No driver-side model state: the "model" is a DataFrame.
  */
object LangModel {

  /** Per-document mean negative log-likelihood under the corpus unigram
    * distribution: (id, n_tokens, nll). Lower = more typical of the
    * corpus. Every token exists in the vocabulary by construction (the
    * corpus scores itself), so p > 0 without smoothing; score a FOREIGN
    * document set against this corpus by unioning it in or adding
    * add-one smoothing at the join.
    */
  def unigramNll(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    // the explode is the expensive stage — materialize it ONCE (narrow
    // (id, tok) rows) so the vocabulary aggregate and the scoring join
    // read the checkpoint, not two more corpus scans; the grand total
    // folds out of the vocabulary (sum of cnt), costing no extra pass
    val toks = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .localCheckpoint()
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // read twice: total + scoring join
    val total = vocab.agg(sum(col("cnt")).as("n_total")) // 1 row — broadcast
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") / col("n_total"))), 4).as("nll"))
      .orderBy(col("id"))
  }

  /** Top-k terms per group by tf-idf: tf = the term's count within the
    * group, idf = ln(n_groups / n_groups containing the term). The
    * corpus-mixing diagnostic ("what characterizes each language /
    * source slice"). One explode feeds both frequency tables; the
    * tf↔df join shuffles on the term (the vocabulary — fine to
    * shuffle at 100 TB, AQE broadcasts when it fits); scores are
    * rounded BEFORE ranking so the k-cut is reproducible cross-engine.
    */
  def tfIdfTopTerms(docs: DataFrame, groupCol: String = "lang", k: Int = 5,
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(groupCol).as("grp"),
      explode(split(col(textCol), " ")).as("term"))
      .localCheckpoint() // feeds tf, df and n_groups — one corpus scan
    val tf = toks.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // read by df + the scoring join
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nGroups = tf.select(col("grp")).distinct()
      .agg(count(lit(1)).as("n_groups")) // 1 row — broadcast
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nGroups))
      .withColumn("score",
        round(col("tf") * log(col("n_groups").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp"), col("rank").cast("long").as("rank"),
        col("term"), col("score"))
      .orderBy(col("grp"), col("rank"))
  }

  /** Keep documents below the `pct` percentile of [[unigramNll]] — the
    * "drop the most improbable tail" curation cut. The threshold is an
    * exact interpolated percentile computed distributed (one extra
    * aggregate), then applied as a broadcast scalar filter. The cut is
    * rounded to 4 decimals — the same precision the nll scores carry —
    * so the keep/drop boundary is replayable in an external engine
    * whose interpolation may differ in the last ulp.
    */
  def filterByNll(docs: DataFrame, pct: Double = 95.0,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(pct > 0 && pct <= 100, s"pct=$pct out of (0,100]")
    // scores materialized once (narrow): the percentile aggregate and
    // the keep-filter both read the checkpoint, not the scoring plan
    val scored = unigramNll(docs, textCol, idCol).localCheckpoint()
    val cut = scored.agg(expr(s"round(percentile(nll, ${pct / 100.0}), 4)").as("cut"))
    docs.join(
      scored.crossJoin(broadcast(cut)).filter(col("nll") <= col("cut"))
        .select(col("id").as(idCol)),
      idCol, "left_semi")
  }
}

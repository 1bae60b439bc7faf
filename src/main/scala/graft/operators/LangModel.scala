package graft.operators

import graft.Materialize.MaterializeOps
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
      .graftCheckpoint()
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .graftCheckpoint() // read twice: total + scoring join
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
      .graftCheckpoint() // feeds tf, df and n_groups — one corpus scan
    val tf = toks.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("tf"))
      .graftCheckpoint() // read by df + the scoring join
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

  /** Per-document mean negative log-likelihood under an interpolated
    * bigram model of the corpus itself: for each in-document position
    * i >= 2, p = lambda * c(prev,cur)/c(prev,·) + (1-lambda) *
    * c(cur)/N, where c(prev,·) is the bigram-CONTEXT count (bigrams
    * starting with prev — not the unigram count, which over-counts
    * doc-final tokens that start no bigram). The unigram back-off term
    * keeps p > 0 without smoothing (the corpus scores itself, so every
    * cur exists in the vocabulary); lambda in (0,1] weighs how much
    * local word order matters vs bare token frequency. The bigram score
    * separates shuffled/templated token soup from fluent text where
    * [[unigramNll]] can't (same bag of words, same unigram score).
    *
    * Plan shape: the tokenized corpus is checkpointed ONCE (narrow
    * (id, toks) rows); the unigram and bigram streams both read it, so
    * the text is split a single time. Count tables shuffle on token
    * keys (vocabulary-sized — too big to assume broadcastable at
    * 100 TB, AQE broadcasts when they fit); the context count folds out
    * of the bigram table, costing no extra corpus pass. Documents with
    * fewer than 2 tokens have no bigram positions and do not appear.
    * Returns (id, n_bigrams, nll) ordered by id.
    */
  def bigramNll(docs: DataFrame, lambda: Double = 0.7,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda=$lambda out of (0,1]")
    val tokenized = docs.select(col(idCol).as("id"),
      split(col(textCol), " ").as("toks"))
      .graftCheckpoint() // one text split feeds unigrams AND bigrams
    val toks = tokenized.select(col("id"), explode(col("toks")).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      .graftCheckpoint() // read twice: total + scoring join
    val total = uni.agg(sum(col("cu")).as("n_total")) // 1 row — broadcast
    // guard: sequence(1, size-1) on a 1-token doc would DESCEND [1, 0]
    val biIdx = when(size(col("toks")) >= 2,
      sequence(lit(1), size(col("toks")) - 1)).otherwise(array())
    val bi = tokenized.select(col("id"), explode(
      transform(biIdx, i => struct(
        element_at(col("toks"), i).as("prev"),
        element_at(col("toks"), i + 1).as("cur")))).as("b"))
      .select(col("id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
      .graftCheckpoint() // feeds bigram counts, context counts, scoring
    val big = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
      .graftCheckpoint() // read twice: context fold + scoring join
    val ctx = big.groupBy(col("prev")).agg(sum(col("cb")).as("cc"))
    bi.join(big, Seq("prev", "cur"))
      .join(ctx, "prev")
      .join(uni.select(col("tok").as("cur"), col("cu")), "cur")
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(
          lit(lambda) * col("cb").cast("double") / col("cc") +
            lit(1 - lambda) * col("cu").cast("double") / col("n_total"))), 4).as("nll"))
      .orderBy(col("id"))
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
    val scored = unigramNll(docs, textCol, idCol).graftCheckpoint()
    val cut = scored.agg(expr(s"round(percentile(nll, ${pct / 100.0}), 4)").as("cut"))
    docs.join(
      scored.crossJoin(broadcast(cut)).filter(col("nll") <= col("cut"))
        .select(col("id").as(idCol)),
      idCol, "left_semi")
  }
}

package graft.operators

import graft.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — logistic regression over hashed
  * bag-of-words features (the fastText/CCNet curation-filter shape:
  * cheap labels in, a learned scan-stage scorer out). Beyond-reference,
  * builder brief: heuristic quality rules ([[graft.functions
  * .TextFunctions.qualityScore]]) bootstrap labels; the classifier
  * GENERALIZES them (and in production, LLM-graded labels slot into
  * the same trainer unchanged).
  *
  * Scale shape:
  *   - featurization is scan-stage Column algebra (hashing trick:
  *     token → xxhash64 mod D, L1-normalized term frequencies) — one
  *     corpus pass, checkpointed once per training run;
  *   - each gradient iteration is ONE distributed aggregate: per-doc
  *     margin/error from a BROADCAST weight literal (D doubles in the
  *     plan), then an explode + groupBy(feature) summing error·tf —
  *     exactly D rows cross to the driver per iteration (D=1024
  *     default), never per-doc state;
  *   - the learned model is O(D) and scores as a scan-stage
  *     expression — no shuffle, no model server.
  *
  * At 100 TB a full-batch pass per iteration is the honest cost of
  * batch GD; the standard production moves (deterministic hash-sampled
  * mini-batches via `pmod(xxhash64(id), k) = iter % k`, or one-pass
  * averaged SGD) reuse this featurization unchanged — batch GD is
  * implemented because its convergence is reproducible enough to gate
  * in specs.
  *
  * Determinism: feature hashing and labels are integer-exact;
  * gradient sums are double adds whose partition order Spark does not
  * pin, so weights carry ~1-ulp run-to-run jitter — outputs that feed
  * hash gates therefore round (scores to 4 decimals) or are integers
  * (confusion counts), and the specs gate against the sequential
  * reference within tolerance, not bit equality.
  */
object QualityModel {

  /** Learned model: `weights(D)` + bias, with the config needed to
    * featurize identically at score time. */
  final case class Model(dim: Int, weights: Array[Double], bias: Double,
                         lr: Double, l2: Double, iters: Int) {
    require(weights.length == dim, s"weights length ${weights.length} != dim $dim")
  }

  /** Features of `text` as an array of (idx, tf) structs:
    *   - hashed bag-of-words in [0, dim−3): idx = xxhash64(token) mod
    *     (dim−3), tf = count/len (L1-normalized so long docs don't
    *     dominate the gradient);
    *   - three DENSE engineered slots at the top of the index space —
    *     length factor, punctuation ratio, stopword ratio (the
    *     fastText-filter practice of mixing cheap global signals with
    *     BOW: normalized tf alone is length-blind, and quality labels
    *     rarely are).
    * Scan-stage Column algebra only. */
  private def hashIdx(tok: Column, hashDim: Int): Column =
    pmod(xxhash64(tok), lit(hashDim.toLong)).cast("int")

  /** The three dense engineered slots at the top of the index space. */
  private def denseFeats(text: Column, dim: Int): Column = {
    import graft.functions.TextFunctions
    val nTok = greatest(TextFunctions.wsTokenCount(text), lit(1L)).cast("double")
    array(
      struct(lit(dim - 3).as("idx"),
        least(lit(1.0), nTok / 100.0).as("tf")),
      struct(lit(dim - 2).as("idx"),
        (TextFunctions.punctCount(text).cast("double") /
          greatest(length(text), lit(1)).cast("double")).as("tf")),
      struct(lit(dim - 1).as("idx"),
        (TextFunctions.stopwordHits(text, TextFunctions.EN_STOP).cast("double") /
          nTok).as("tf")))
  }

  /** Attach a `feats` column (array of (idx, tf) structs) to `df`:
    * RAW per-occurrence BOW entries with tf = 1/len (the margin and
    * the gradient are LINEAR in features, so duplicate-index entries
    * fold for free in the gradient's groupBy — deduping per doc would
    * buy nothing and costs O(len²) in nested HOFs), plus the dense
    * slots. The token count binds to a REAL column first (`withColumn`)
    * so the per-element divisor is an O(1) attribute read, not a
    * re-evaluated subtree — the documented unbound-lambda trap. */
  private def featurizeDf(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    require(dim >= 8, s"dim $dim too small for 3 dense slots + hashed BOW")
    val hashDim = dim - 3
    df.withColumn("__toks", filter(split(col(textCol), " "), t => length(t) > 0))
      .withColumn("__len", greatest(size(col("__toks")), lit(1)).cast("double"))
      .withColumn("feats", concat(
        transform(col("__toks"), t =>
          struct(hashIdx(t, hashDim).as("idx"),
            (lit(1.0) / col("__len")).as("tf"))),
        denseFeats(col(textCol), dim)))
      .drop("__toks", "__len")
  }

  /** Margin w·x + b for a featurized doc against a weight literal. */
  private def margin(feats: Column, wLit: Column, bias: Double): Column =
    aggregate(feats, lit(bias),
      (acc, f) => acc + element_at(wLit, f.getField("idx") + 1) * f.getField("tf"))

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Train on `docs` with a 0/1 `labelCol` (any integer/boolean-ish
    * column). Gradient descent: `iters` passes, step `lr`, L2 strength
    * `l2`. Featurization runs once (checkpointed).
    *
    * `batches = 1` (default) is full-batch GD — every iteration scans
    * the corpus. `batches = k > 1` is the 100 TB move: iteration `i`
    * scans only the deterministic hash-sampled mini-batch
    * `pmod(xxhash64(idCol), k) = i mod k` — the per-iteration cost
    * drops k×, the sampling is replayable (no RNG), and the scan
    * filter is a plan literal so partition/row-group pruning applies
    * where the id is layout-correlated. */
  def train(docs: DataFrame, labelCol: String, dim: Int = 1024,
            iters: Int = 20, lr: Double = 2.0, l2: Double = 1e-4,
            textCol: String = "text", batches: Int = 1,
            idCol: String = "doc_id"): Model = {
    require(batches >= 1, s"batches $batches must be >= 1")
    val feats = featurizeDf(docs, textCol, dim)
      .select(col("feats"), col(labelCol).cast("double").as("y"),
        (if (batches > 1) pmod(xxhash64(col(idCol)), lit(batches.toLong)).cast("int")
         else lit(0)).as("bkt"))
      .graftCheckpoint() // featurize once, scan per iteration
    // per-bucket doc counts (≤ batches rows), so each mini-batch
    // gradient normalizes by ITS size, not the corpus's
    val bktCounts: Map[Int, Double] = feats.groupBy(col("bkt")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    require(bktCounts.values.sum > 0, "QualityModel.train: empty corpus")
    var w = Array.fill(dim)(0.0)
    var b = 0.0
    for (it <- 0 until iters) {
      val bkt = it % batches
      val n = bktCounts.getOrElse(bkt, 0.0)
      val batchFeats =
        if (batches > 1) feats.filter(col("bkt") === bkt) else feats
      val wLit = typedLit(w.toSeq)
      // ONE scan per iteration: per-doc error, then a sentinel
      // (idx = -1, tf = 1) rides the feature explode so the bias
      // gradient folds into the SAME groupBy — ≤ dim+1 rows to the
      // driver, O(D) driver state, never per-doc
      if (n > 0) {
        val gRows = batchFeats
          .withColumn("e", sigmoid(margin(col("feats"), wLit, b)) - col("y"))
          .select(col("e"), explode(concat(col("feats"),
            array(struct(lit(-1).as("idx"), lit(1.0).as("tf"))))).as("f"))
          .groupBy(col("f.idx").as("idx"))
          .agg(sum(col("e") * col("f.tf")).as("g"))
          .collect()
        val g = Array.fill(dim)(0.0)
        var bGrad = 0.0
        gRows.foreach { r =>
          if (r.getInt(0) < 0) bGrad = r.getDouble(1) / n
          else g(r.getInt(0)) = r.getDouble(1) / n
        }
        var i = 0
        while (i < dim) {
          w(i) -= lr * (g(i) + l2 * w(i))
          i += 1
        }
        b -= lr * bGrad
      }
    }
    Model(dim, w, b, lr, l2, iters)
  }

  /** Scan-stage score column (P[label=1]) for `text` under `model` —
    * the weights ride the plan as a D-element literal; no join, no
    * shuffle, no UDF. One O(len) fold: the accumulator carries
    * (Σ w[hash(tok)], token count) and the FINISH lambda normalizes,
    * so nothing re-evaluates per element. */
  def score(text: Column, model: Model): Column = {
    val hashDim = model.dim - 3
    val wLit = typedLit(model.weights.toSeq)
    val toks = filter(split(text, " "), t => length(t) > 0)
    val bow = aggregate(toks,
      struct(lit(0.0).as("s"), lit(0).as("n")),
      (acc, t) => struct(
        (acc.getField("s") + element_at(wLit, hashIdx(t, hashDim) + 1)).as("s"),
        (acc.getField("n") + 1).as("n")),
      acc => acc.getField("s") /
        greatest(acc.getField("n"), lit(1)).cast("double"))
    sigmoid(bow + margin(denseFeats(text, model.dim), wLit, model.bias))
  }

  /** Mean log-loss of `model` on labeled docs (the train-time metric,
    * for convergence gates). */
  def logLoss(docs: DataFrame, labelCol: String, model: Model,
              textCol: String = "text"): Double = {
    val eps = 1e-12
    val p = score(col(textCol), model)
    docs.select(col(labelCol).cast("double").as("y"), p.as("p"))
      .agg(avg(-(col("y") * log(greatest(col("p"), lit(eps))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(eps))))))
      .head().getDouble(0)
  }

  /** Confusion counts of the 0.5-threshold classifier vs the labels —
    * integer outputs, the hash-stable evaluation form. */
  def confusion(docs: DataFrame, labelCol: String, model: Model,
                textCol: String = "text"): DataFrame = {
    val pred = (score(col(textCol), model) >= 0.5).cast("int")
    val y = col(labelCol).cast("int")
    docs.select(pred.as("pred"), y.as("y"))
      .agg(
        sum(when(col("pred") === 1 && col("y") === 1, 1).otherwise(0)).as("tp"),
        sum(when(col("pred") === 1 && col("y") === 0, 1).otherwise(0)).as("fp"),
        sum(when(col("pred") === 0 && col("y") === 0, 1).otherwise(0)).as("tn"),
        sum(when(col("pred") === 0 && col("y") === 1, 1).otherwise(0)).as("fn"))
  }

  /** Sequential reference trainer (driver-side, for specs): identical
    * featurization/updates over an in-memory corpus, so the
    * distributed gradient fold is pinned against an executable spec
    * (tolerance-gated — double sums are order-sensitive). Feature
    * hashing must match Spark's xxhash64 (seed 42), so the caller
    * passes pre-hashed (idx, tf) docs obtained via [[featurizeDump]].
    */
  def referenceTrain(featDocs: Seq[(Seq[(Int, Double)], Double)], dim: Int,
                     iters: Int, lr: Double, l2: Double): Model = {
    val n = featDocs.length.toDouble
    require(n > 0)
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    for (_ <- 0 until iters) {
      val g = Array.fill(dim)(0.0)
      var bg = 0.0
      featDocs.foreach { case (fs, y) =>
        val m = b + fs.map { case (i, tf) => w(i) * tf }.sum
        val e = 1.0 / (1.0 + math.exp(-m)) - y
        bg += e
        fs.foreach { case (i, tf) => g(i) += e * tf }
      }
      var i = 0
      while (i < dim) {
        w(i) -= lr * (g(i) / n + l2 * w(i))
        i += 1
      }
      b -= lr * (bg / n)
    }
    Model(dim, w, b, lr, l2, iters)
  }

  /** Featurized dump for the reference trainer (specs): one row per
    * doc, (feats, y) with Spark's own hashing. */
  def featurizeDump(docs: DataFrame, labelCol: String, dim: Int,
                    textCol: String = "text"): Seq[(Seq[(Int, Double)], Double)] =
    featurizeDf(docs, textCol, dim)
      .select(col("feats"), col(labelCol).cast("double").as("y"))
      .collect()
      .map { r =>
        val fs = r.getSeq[org.apache.spark.sql.Row](0)
          .map(f => (f.getInt(0), f.getDouble(1)))
        (fs, r.getDouble(1))
      }.toSeq
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing (beyond-reference,
  * builder brief): per-group quotas ("N docs per language/source") and
  * hash-mod fractions, both reproducible across runs, partitionings and
  * engines — no RNG state, no seed drift.
  */
object Sampling {

  /** Deterministic pseudo-random order key:
    * `((id % 1e9+7) * 2654435761) % 1e9+7` (Knuth's multiplicative
    * constant, prime modulus). Plain integer arithmetic so an external
    * SQL engine can replay the exact sample. Reducing `id` mod M BEFORE
    * the multiply keeps the product under `(M-1) * 2654435761 ≈ 2.7e18
    * < 2^63` for EVERY long id — no ANSI overflow ceiling — and by
    * modular congruence yields bit-identical keys to the historical
    * unreduced form wherever that one didn't overflow (ids ≤ ~3.4e9),
    * so existing samples/splits are unchanged.
    */
  def pseudoOrder(id: Column): Column =
    ((id % lit(1000000007L)) * lit(2654435761L)) % lit(1000000007L)

  /** Deterministic per-epoch training order: a different replayable
    * permutation of the corpus for every epoch — what a trainer needs
    * so run N and its restart see the SAME epoch-k order, with no
    * shuffle-seed state to persist. Same overflow-free shape as
    * [[pseudoOrder]]: reduce mod M first, then the products stay under
    * `(M-1)·2654435761 + (M-1)·40503 < 2^63` for every (id, epoch).
    */
  def epochOrder(id: Column, epoch: Column): Column =
    ((id % lit(1000000007L)) * lit(2654435761L) +
      (epoch % lit(1000000007L)) * lit(40503L)) % lit(1000000007L)

  /** Dataloader sharding for one epoch: shard = permutation key mod
    * `nShards`, position = rank within the shard under that same key —
    * so N dataloader workers each read a disjoint slice in a stable
    * order, a restarted run replays epoch k EXACTLY, and (epoch, id) →
    * (shard, pos) is pure arithmetic with no stored state (the
    * [[epochOrder]] contract extended to the sharded reader). One
    * shuffle: the per-shard window; the key is the only extra column
    * shipped. The key is non-negative by construction, so `%` == pmod
    * and the DuckDB oracle mirrors it verbatim.
    */
  def epochShards(df: DataFrame, idCol: String, epoch: Column,
                  nShards: Int): DataFrame = {
    require(nShards >= 1, s"epochShards: nShards=$nShards must be >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    df.withColumn("__k", epochOrder(col(idCol), epoch))
      .withColumn("shard", (col("__k") % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__k")
  }

  /** Keep (up to) `quota` rows per group, chosen in [[pseudoOrder]] —
    * the mixture-weighting primitive. One shuffle (the window on the
    * group key); groups smaller than the quota pass through whole.
    */
  def quotaPerGroup(df: DataFrame, groupCol: String, idCol: String,
                    quota: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(pseudoOrder(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota).drop("__rn")
  }

  /** Deterministic ~`pct`-percent sample: keep rows whose pseudo-order
    * key falls below the cut. Shuffle-free — evaluated inside the scan
    * stage.
    */
  def fraction(df: DataFrame, idCol: String, pct: Double): DataFrame = {
    require(pct >= 0.0 && pct <= 100.0, s"pct=$pct out of [0,100]")
    df.filter(pseudoOrder(col(idCol)) < lit((1000000007L * pct / 100.0).toLong))
  }

  /** Token-budget mixture sampling — how a pretraining mix is actually
    * specified: "budget B tokens total, source s gets weight w_s".
    * Each weighted source contributes documents in [[pseudoOrder]]
    * until its token share `floor(B · w_s / Σw)` is reached; the doc
    * that CROSSES the share is kept (cut on the EXCLUSIVE running sum),
    * so every source with a positive share contributes at least one
    * document and the overshoot is bounded by one document per source.
    * Sources absent from `weights` contribute nothing (the mix spec is
    * the contract). Deterministic and engine-replayable: the order key
    * is integer arithmetic, token counts are exact, and the running
    * sum is frame-defined — no RNG, no floats in the cut.
    *
    * One shuffle (the per-source window); weights/quotas ride a
    * broadcast. Returns (group, id, n_tokens) ordered by (group, id).
    */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long,
                        weights: Seq[(String, Double)],
                        groupCol: String = "source", idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be > 0")
    require(weights.nonEmpty && weights.forall(_._2 >= 0) && weights.exists(_._2 > 0),
      s"weights must be non-negative with at least one positive: $weights")
    // a duplicated key would fan out the quota join and silently emit
    // duplicate rows past the budget — reject loudly
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate group keys in weights: ${weights.map(_._1)}")
    val wsum = weights.map(_._2).sum
    budgetCut(docs, weights.map { case (g, w) =>
      (g, math.floor(budgetTokens * w / wsum).toLong)
    }, groupCol, idCol, textCol)
  }

  /** Temperature-reweighted token-budget mixture: the weights are the
    * corpus's OWN per-source token shares raised to `alpha` —
    * `w_s = (c_s / Σc)^α` — the standard rebalancing for multilingual
    * and multi-domain pretraining (α = 1 keeps natural proportions,
    * α = 0 is uniform, values between flatten the head toward the
    * tail). Shares come from one exact per-source count aggregate
    * (|sources| rows to the driver — the quota path's bounded collect),
    * then the [[tokenBudgetSample]] cut applies. Engine-replayable by
    * the same discipline as [[weightedSample]]: weights AND their sum
    * round to 10 decimals (HALF_UP, both engines) before the quota
    * arithmetic, so the only non-replayable step — a float sum's
    * term order — is quantized away; the remaining multiply/divide/
    * floor are single correctly-rounded IEEE ops.
    */
  def temperatureMix(docs: DataFrame, budgetTokens: Long, alpha: Double,
                     groupCol: String = "source", idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be > 0")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha out of [0,1]")
    def round10(x: Double): Double =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    // null group keys can't carry a share (and would NPE the driver
    // sort); an all-null-text source sums to null — count it as 0
    // tokens rather than crash (the repo's degrade-never-crash edge
    // contract). The group key reads as STRING (cast in the aggregate,
    // not getString — a non-string source column would
    // ClassCastException the driver map); [[budgetCut]] joins on the
    // same cast, so any group type works end to end.
    val counts = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(sum(graft.functions.TextFunctions.wsTokenCount(col(textCol))).as("c"))
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toSeq.sortBy(_._1)
    require(counts.nonEmpty, "temperatureMix: empty corpus")
    require(counts.exists(_._2 > 0), "temperatureMix: corpus has no tokens")
    val total = counts.map(_._2).sum.toDouble
    // zero-token sources drop BEFORE weighting: they contribute no
    // share at alpha > 0 anyway (0^α = 0), but at alpha = 0 the IEEE
    // convention pow(0,0) = 1 would grant a token-less source a full
    // uniform quota — and its zero-token docs would then ALL pass the
    // exclusive-cumsum cut
    val w = counts.filter(_._2 > 0)
      .map { case (g, c) => (g, round10(math.pow(c / total, alpha))) }
    val wsum = round10(w.map(_._2).sum)
    budgetCut(docs, w.map { case (g, wv) =>
      (g, math.floor(budgetTokens * wv / wsum).toLong)
    }, groupCol, idCol, textCol)
  }

  /** The shared budget cut: per-source documents in [[pseudoOrder]]
    * until the EXCLUSIVE running token sum reaches the source's quota
    * (the crossing doc is kept). One shuffle (the per-source window);
    * quotas ride a broadcast.
    */
  private def budgetCut(docs: DataFrame, quotas: Seq[(String, Long)],
                        groupCol: String, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = quotas.toDF(groupCol, "__quota")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(pseudoOrder(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // quota keys are strings by construction — cast a NON-string group
    // column to its canonical string form so the join never relies on
    // implicit cross-type coercion. Conditional: a redundant cast on an
    // already-string column is not free — it changes the join/window
    // key expression, so Catalyst can no longer reuse an upstream
    // exchange already partitioned on the raw column (measured as an
    // extra corpus shuffle in the curation pipeline)
    val gkey =
      if (docs.schema(groupCol).dataType == org.apache.spark.sql.types.StringType)
        col(groupCol)
      else col(groupCol).cast("string").as(groupCol)
    docs.select(gkey, col(idCol),
        graft.functions.TextFunctions.wsTokenCount(col(textCol)).as("n_tokens"))
      .join(broadcast(q), groupCol)
      .withColumn("__cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("__cum_before") < col("__quota"))
      .select(col(groupCol), col(idCol), col("n_tokens"))
      .orderBy(col(groupCol), col(idCol))
  }

  private def assignByCuts(bucket: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 100 &&
      cuts.map(_._2) == cuts.map(_._2).sorted,
      s"cuts must be ascending cumulative percentages ending at 100: $cuts")
    cuts.foldRight(lit(cuts.last._1): Column) { case ((name, hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic train/val/test assignment by hash bucket: a `split`
    * column from the row's [[pseudoOrder]] bucket mod 100 — `cuts` are
    * cumulative percentage upper bounds, e.g. `Seq(("train", 80),
    * ("val", 90), ("test", 100))`. Shuffle-free (scan-stage
    * expression), stable across runs/partitionings/engines, and PER-ID:
    * re-running the pipeline or adding rows never reassigns an existing
    * id (the leakage guarantee random splits can't give). Proportions
    * are approximate — a small stratum can land lopsided; use
    * [[stratifiedSplit]] when per-group proportions must be exact.
    */
  def hashSplit(df: DataFrame, idCol: String,
                cuts: Seq[(String, Int)] = Seq(("train", 80), ("val", 90), ("test", 100))): DataFrame =
    // pmod, not %: Spark's % follows the dividend's sign, so a negative
    // id (snowflake-style signed hashes) would bucket negative and land
    // 100% in the first cut — silently voiding the split proportions
    df.withColumn("split", assignByCuts(pmod(pseudoOrder(col(idCol)), lit(100)), cuts))

  /** Deterministic TRUE stratified split: within each `strataCol`
    * group, rows are ranked in [[pseudoOrder]] and cut by exact rank
    * percentile, so every stratum lands within one row of the target
    * proportions (a 12-doc language still gets ~80/10/10). One shuffle
    * (the per-stratum window). Trade-off vs [[hashSplit]]: exact
    * proportions, but adding rows to a stratum can reassign its
    * existing ids — pick per the leakage/balance need.
    */
  def stratifiedSplit(df: DataFrame, strataCol: String, idCol: String,
                      cuts: Seq[(String, Int)] = Seq(("train", 80), ("val", 90), ("test", 100))): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(pseudoOrder(col(idCol)), col(idCol))
    val cw = Window.partitionBy(col(strataCol))
    // cast before the *100: row_number is IntegerType and a >21M-row
    // stratum would overflow int under ANSI
    val bucket = expr("((cast(__rn AS bigint) - 1) * 100) div __cnt")
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
      .withColumn("split", assignByCuts(bucket, cuts))
      .drop("__rn", "__cnt")
  }

  /** Deterministic weighted sampling without replacement (A-Res,
    * Efraimidis-Spirakis): each row gets key `u^(1/w)` where
    * `u ∈ (0,1)` derives from [[pseudoOrder]] instead of an RNG, and
    * the sample is the top-k by key — heavier rows win proportionally
    * more often, yet the draw replays bit-identically across runs,
    * partitionings and engines.
    *
    * Ranked in the LOG domain: `ln(u)/w` orders identically to
    * `u^(1/w)` (exp is monotone) but does not compress toward 1.0 for
    * large weights — the power form at w ≈ 10³ collapses most keys
    * into a handful of rounded buckets, silently degrading the draw to
    * an id-order pick. Keys round to 10 decimals (libm `ln` is not
    * correctly rounded everywhere; at key magnitudes ≤ ~21 the cross-
    * engine ulp gap is ≤ 1e-14, far under the quantum, and the id
    * tiebreak makes the order total). Non-positive weights or negative
    * ids would mint winning keys (u ≤ 0, 1/w ≤ 0) — they raise
    * scan-stage instead of corrupting the sample. Top-k plans as
    * TakeOrderedAndProject — per-partition heaps, no global sort.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"weightedSample: k=$k must be >= 1")
    val u = (pseudoOrder(col(idCol)).cast("double") + 1.0) / 1000000008.0
    val bad = col(weightCol).isNull || col(weightCol) <= 0 ||
      col(idCol).isNull || col(idCol) < 0
    df.withColumn("wkey",
        when(bad, raise_error(lit(
          "weightedSample: weights must be > 0 and ids >= 0")).cast("double"))
          .otherwise(round(log(u) / col(weightCol).cast("double"), 10)))
      .orderBy(col("wkey").desc, col(idCol))
      .limit(k)
  }
}

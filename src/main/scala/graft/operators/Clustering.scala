package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space corpus organization (beyond-reference, builder
  * brief): k-means cluster assignment and the two things a pipeline
  * owner does with it — profile the corpus's regions, and sample
  * evenly across them (diversity sampling — the antidote to a crawl
  * that is 40% one template).
  *
  * The clustering itself is [[Similarity.buildIvfIndex]]'s machinery
  * (hash-sampled seeds + Lloyd refinement, per-dimension codegen'd
  * averages in one groupBy) — an IVF index IS k-means with inverted
  * lists attached, so the engine keeps ONE implementation of the
  * iteration and both callers stay in sync.
  */
object Clustering {

  /** (id, cluster) assignment after `iters` Lloyd steps over `k`
    * cosine k-means centroids. Deterministic: seeds are the k smallest
    * xxhash64(id) rows, refinement is fixed-count (no RNG, no
    * convergence race), ties broken by centroid id. Cluster labels are
    * the SEED ids (stable across runs, not 0..k-1 — callers wanting
    * dense labels re-key the tiny distinct set). Cost per step: one
    * broadcast of k centroids against the corpus + one dim-wide
    * groupBy — linear in the corpus, never quadratic.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                   dim: Int = 64, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame =
    // materialize = false: single-consumer callers — each build stage
    // still executes once inside the one consuming plan, without the
    // per-pass checkpoint round-trips (Similarity.buildIvfIndex doc)
    Similarity.buildIvfIndex(embeddings, nlist = k, refineIters = iters,
        dim = dim, vecCol = vecCol, idCol = idCol, materialize = false)
      .assigned.select(col("vec_id").as(idCol), col("cent_id").as("cluster"))

  /** Per-cluster corpus profile: size and mean vector L2 norm —
    * (cluster, n_vecs, avg_norm) ordered by size desc. One extra
    * aggregate over the assignment — directly over the vector the
    * assignment already carries (`v` = the float embedding widened to
    * double, so the norm is bit-identical to the old embeddings join,
    * which re-shuffled the corpus on id just to re-attach it).
    */
  def clusterProfile(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                     dim: Int = 64, vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val norm = sqrt(aggregate(col("v"),
      lit(0.0), (acc, x) => acc + x * x))
    Similarity.buildIvfIndex(embeddings, nlist = k, refineIters = iters,
        dim = dim, vecCol = vecCol, idCol = idCol, materialize = false)
      .assigned.select(col("cent_id").as("cluster"), norm.as("nrm"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("nrm")), 4).as("avg_norm"))
      // k rows — the single-partition total order (TsAnalytics.
      // orderedSmall rule: orderBy's range sampling re-executed the
      // whole kmeans chain, now un-checkpointed, a second time)
      .repartition(1)
      .sortWithinPartitions(col("n_vecs").desc, col("cluster"))
  }

  /** Up to `perCluster` rows from EACH k-means cluster, chosen in
    * [[Sampling.pseudoOrder]] — deterministic diversity sampling:
    * a dominant region contributes the same quota as a rare one.
    * Returns the sampled (id, cluster) rows.
    */
  def balancedSample(embeddings: DataFrame, k: Int = 8, perCluster: Int = 10,
                     iters: Int = 2, dim: Int = 64,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    Sampling.quotaPerGroup(
      kmeansAssign(embeddings, k, iters, dim, vecCol, idCol),
      "cluster", idCol, perCluster)
      // ≤ k·perCluster rows — same bounded-output total-order rule
      .repartition(1).sortWithinPartitions(col("cluster"), col(idCol))
}

/** Greedy maximal-marginal-relevance selection (Carbonell/Goldstein,
  * SIGIR'98) over the embedding space — diverse exemplar mining: pick
  * k rows maximizing `λ·relevance − (1−λ)·max-cosine-to-selected`,
  * the data-selection move that stops a dominant crawl template from
  * filling the whole sample even when it also scores highest.
  *
  * Plan shape: k greedy rounds; each is ONE corpus scan computing the
  * marginal score against the ≤k already-selected vectors (a plan
  * LITERAL — selections are k·dim doubles, driver state O(k·dim)),
  * then a 1-row argmax collect. Never pairwise: cost is k scans, not
  * n². At 100 TB the scan narrows the same way balancedSample does —
  * run per cluster/partition of a k-means organization and merge the
  * per-region exemplars.
  *
  * Determinism: scores round to 6 decimals BEFORE the argmax with
  * vec_id tie-break; the driver reference replays bit-equal
  * (MmrSpec).
  */
object Mmr {
  import graft.functions.VectorFunctions
  import org.apache.spark.sql.Column

  /** Select k rows; `rel` is the relevance column (default 1.0 —
    * pure diversity / max-min-style selection). Returns
    * (rank, vec_id, score) in selection order. */
  def mmrSelect(emb: DataFrame, k: Int, lambda: Double = 0.5,
                rel: Column = lit(1.0), dim: Int = 64,
                vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    import graft.Materialize.MaterializeOps
    require(k >= 1, s"mmrSelect: k=$k must be >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"mmrSelect: lambda=$lambda")
    val spark = emb.sparkSession
    VectorFunctions.register(spark)
    val base = emb.select(col(idCol).cast("long").as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("v"),
        round(rel.cast("double"), 6).as("rel"))
      .graftCheckpoint() // scanned k times — truncate upstream lineage
    var selected = Vector.empty[(Long, Seq[Double], Double)] // (id, vec, score)
    var exhausted = false
    while (selected.length < k && !exhausted) {
      val selIds = selected.map(_._1)
      val marginal =
        if (selected.isEmpty) round(lit(lambda) * col("rel"), 6)
        else {
          val selLit = typedlit(selected.map(_._2))
          val maxSim = aggregate(selLit, lit(-1.0),
            (acc, s) => greatest(acc, VectorFunctions.cosineSim(col("v"), s)))
          round(lit(lambda) * col("rel") - lit(1.0 - lambda) * maxSim, 6)
        }
      val top = base.filter(if (selIds.isEmpty) lit(true)
          else !col("vec_id").isin(selIds: _*))
        .select(col("vec_id"), col("v"), marginal.as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1).collect() // ONE row per round
      if (top.isEmpty) exhausted = true
      else selected :+= ((top(0).getLong(0), top(0).getSeq[Double](1),
        top(0).getDouble(2)))
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, s), r) => (r.toLong, id, s) }
      .toDF("rank", "vec_id", "score")
  }
}

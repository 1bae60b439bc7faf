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
    Similarity.buildIvfIndex(embeddings, nlist = k, refineIters = iters,
        dim = dim, vecCol = vecCol, idCol = idCol)
      .assigned.select(col("vec_id").as(idCol), col("cent_id").as("cluster"))

  /** Per-cluster corpus profile: size and mean vector L2 norm —
    * (cluster, n_vecs, avg_norm) ordered by size desc. One extra
    * aggregate over the assignment.
    */
  def clusterProfile(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                     dim: Int = 64, vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val norm = sqrt(aggregate(col(vecCol),
      lit(0.0), (acc, x) => acc + x * x))
    kmeansAssign(embeddings, k, iters, dim, vecCol, idCol)
      .join(embeddings.select(col(idCol), norm.as("nrm")), idCol)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("nrm")), 4).as("avg_norm"))
      .orderBy(col("n_vecs").desc, col("cluster"))
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
      .orderBy(col("cluster"), col(idCol))
}

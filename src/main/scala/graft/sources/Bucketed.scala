package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: the storage-side answer to the biggest
  * shuffle in the workload. A fact-fact join (lineitem ⋈ orders) at
  * 100 TB shuffles BOTH sides on the join key every query; writing the
  * tables bucketed (hash-partitioned into a fixed bucket count, sorted
  * within buckets) makes the join key the storage layout, so Spark
  * plans the join with ZERO Exchange — each task zips bucket i of both
  * sides. The shuffle is paid ONCE at write time and amortized over
  * every subsequent join, the same trade as the reference's insert-time
  * index maintenance (reference server/src/Repository/Handlers.hs
  * builds its timestamp/tag indexes on insert so queries don't).
  *
  * Bucket counts must match (or divide) across co-joined tables; pick
  * them so one bucket of the big side fits an executor core's working
  * set (at 100 TB lineitem and 32 MB targets that is O(100k) buckets —
  * file count scales with buckets × writing tasks, so write with
  * key-repartitioning first, one file per bucket).
  */
object Bucketed {

  /** Persist `df` bucketed+sorted by `keyCol` as table `name` rooted at
    * `path` (external — no warehouse state beyond the catalog entry).
    * Repartitions into exactly `buckets` partitions by the key first —
    * Spark's repartition and its bucket assignment use the SAME
    * `pmod(murmur3(key), n)`, so each write task holds exactly one
    * bucket and each bucket becomes ONE file (the invariant that keeps
    * file counts flat and — under the legacy outputOrdering flag,
    * see SPARK-28595 — lets the scan trust the written sort order).
    * What bucketing removes unconditionally is the join's Exchange:
    * the network cost, the part that scales with the corpus.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    keyCol: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(name)

  /** The co-located join: both sides read as bucketed tables on the
    * same key/bucket-count, joined WITHOUT an Exchange on either side
    * (assert via `.explain` / BucketedSpec). AQE keeps the sort-merge
    * join since neither side needs movement.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}

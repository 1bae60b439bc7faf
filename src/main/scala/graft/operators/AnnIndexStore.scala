package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Durable, versioned ANN index store: the on-disk form of
  * [[Similarity.buildLshIndex]] / [[Similarity.buildIvfIndex]], probed
  * across sessions and restarts without re-hashing the corpus.
  *
  * Layout (same CURRENT-pointer commit protocol as
  * [[graft.engine.TimeSeriesStore]] manifests — immutable version
  * directories, atomic pointer swap, put-if-absent version dirs):
  *
  * ```
  * path/
  *   v<N>/vectors/        (vec_id, v)           sorted by vec_id
  *   v<N>/lsh/tbl=<t>/    (bucket, vec_id)      sorted by bucket
  *   v<N>/ivf_centroids/  (cent_id, cv)         tiny (nlist rows)
  *   v<N>/ivf/            (cent_id, vec_id)     sorted by cent_id
  *   v<N>/params.json     LSH/IVF parameters the index was built with
  *   CURRENT              live version name (atomic swap)
  * ```
  *
  * Scale notes (100 TB): postings are NARROW — the LSH table stores
  * (bucket, vec_id) under hive partitions `tbl=<t>`, NOT the vectors
  * (which a per-table copy would duplicate `tables`×); vectors live
  * once, sorted by vec_id. A probe (a) buckets only the query batch,
  * (b) collects its tiny (tbl, bucket) set and pushes it into the
  * postings scan — directory pruning on `tbl`, row-group min/max
  * skipping on the sorted `bucket` — and (c) joins the surviving
  * candidates (broadcast) against the vectors table. Per-probe cost is
  * proportional to the buckets touched, never the corpus. Rebuilding
  * the index is [[write]] — a new version, readers undisturbed.
  */
final class AnnIndexStore(spark: SparkSession, pathStr: String) {
  import AnnIndexStore._

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  private def currentPtr: Path = root.resolve("CURRENT")

  /** Committed versions present on disk, ascending. */
  def versions: Seq[Long] = {
    val s = Files.list(root)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
    finally s.close()
  }

  def currentVersion: Option[Long] =
    if (!Files.exists(currentPtr)) None
    else Some(Files.readString(currentPtr).trim.stripPrefix("v").toLong)

  /** Resolve CURRENT exactly once per probe and thread the pinned
    * version directory through every read — re-reading the pointer
    * mid-probe could mix one version's hyperplane params with another
    * version's postings if a concurrent [[write]] swaps it.
    */
  private def pinVersion(): Path = {
    val v = currentVersion.getOrElse(
      throw new IllegalStateException(s"no ANN index committed at $root"))
    root.resolve(s"v$v")
  }

  /** Build BOTH index structures over `corpus` and commit them as one
    * new version. Returns the committed version number.
    */
  def write(corpus: DataFrame, lsh: LshParams = LshParams(),
            ivf: IvfParams = IvfParams(),
            vecCol: String = "embedding", idCol: String = "vec_id"): Long = synchronized {
    val version = versions.lastOption.getOrElse(-1L) + 1L
    val dir = root.resolve(s"v$version")
    Files.createDirectory(dir) // put-if-absent: a racing writer fails loudly
    val vectors = corpus.select(col(idCol).as("vec_id"),
      Similarity.asDouble(col(vecCol)).as("v"))

    // vectors once, sorted by vec_id => row-group skipping on id joins
    vectors.sortWithinPartitions(col("vec_id"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("vectors").toString)

    // LSH postings: narrow (bucket, vec_id) under tbl=<t> partitions,
    // bucket-sorted within files for min/max skipping
    Similarity.withBuckets(vectors, lsh.tables, lsh.planes, lsh.dim, "v")
      .select(col("tbl"), col("bucket"), col("vec_id"))
      .repartition(col("tbl"))
      .sortWithinPartitions(col("tbl"), col("bucket"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("tbl")
      .parquet(dir.resolve("lsh").toString)

    // IVF: tiny refined centroids + narrow inverted lists
    val built = Similarity.buildIvfIndex(corpus, ivf.nlist, ivf.refineIters,
      ivf.dim, vecCol, idCol)
    built.centroids.coalesce(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("ivf_centroids").toString)
    built.assigned.select(col("cent_id"), col("vec_id"))
      .repartition(col("cent_id"))
      .sortWithinPartitions(col("cent_id"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("ivf").toString)

    Files.writeString(dir.resolve("params.json"),
      s"""{"tables":${lsh.tables},"planes":${lsh.planes},"lsh_dim":${lsh.dim},""" +
        s""""nlist":${ivf.nlist},"refine_iters":${ivf.refineIters},"ivf_dim":${ivf.dim}}""")

    val tmpPtr = Files.createTempFile(root, ".tmp-current", "")
    Files.writeString(tmpPtr, s"v$version")
    Files.move(tmpPtr, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** Parameters the CURRENT version was built with (probes must bucket
    * queries with the SAME hyperplanes/centroid count as the build —
    * reading them from the committed version makes a mismatch
    * impossible).
    */
  private def params(verDir: Path): (LshParams, IvfParams) = {
    val txt = Files.readString(verDir.resolve("params.json"))
    def num(key: String): Int =
      s""""$key":(\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"params.json missing $key"))
        .group(1).toInt
    (LshParams(num("tables"), num("planes"), num("lsh_dim")),
      IvfParams(num("nlist"), num("refine_iters"), num("ivf_dim")))
  }

  private def vectors(verDir: Path): DataFrame =
    spark.read.parquet(verDir.resolve("vectors").toString)

  /** Approximate top-k by LSH against the persisted index. Only the
    * query batch is hashed; the postings scan is pruned to the buckets
    * the queries land in.
    */
  def probeLsh(queries: DataFrame, k: Int = 5,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val verDir = pinVersion()
    val (lsh, _) = params(verDir)
    val q = Similarity.withBuckets(
      queries.select(col(idCol).as("query_id"), Similarity.asDouble(col(vecCol)).as("qv")),
      lsh.tables, lsh.planes, lsh.dim, "qv")
      .localCheckpoint() // tiny; read 3× below (pair collect + join)
    // the query batch's bucket footprint, collected and pushed into the
    // scan: tbl => hive-partition pruning, bucket => row-group skipping.
    // (tbl IN ..) AND (bucket IN ..) is a superset of the exact pair
    // set — the join below keeps it exact.
    val pairs = q.select(col("tbl"), col("bucket")).distinct().collect()
    val tbls = pairs.map(_.getInt(0)).distinct.toSeq
    val buckets = pairs.map(_.getLong(1)).distinct.toSeq
    val postings = spark.read.parquet(verDir.resolve("lsh").toString)
      .filter(col("tbl").isin(tbls: _*) && col("bucket").isin(buckets: _*))
    val cand = postings.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("qv"), col("vec_id"))
    // candidates are small (bucket-bounded) => broadcast them against
    // the vectors table; the scan streams, nothing shuffles
    val withVec = vectors(verDir).join(broadcast(cand), Seq("vec_id"))
    Similarity.rankTopK(withVec, k)
  }

  /** Approximate top-k by IVF against the persisted index: read the
    * (tiny) centroids, pick nprobe lists per query, scan only those
    * inverted lists.
    */
  def probeIvf(queries: DataFrame, k: Int = 5, nprobe: Int = 4,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val verDir = pinVersion()
    val cents = spark.read.parquet(verDir.resolve("ivf_centroids").toString)
    val probes = Similarity.nearestCentroids(
      queries.select(col(idCol).as("query_id"), Similarity.asDouble(col(vecCol)).as("qv")),
      cents, "query_id", "qv", nprobe)
      .localCheckpoint() // tiny; collected for pruning + joined below
    val centIds = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(verDir.resolve("ivf").toString)
      .filter(col("cent_id").isin(centIds: _*)) // row-group skipping
    val cand = lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("qv"), col("vec_id"))
    val withVec = vectors(verDir).join(broadcast(cand), Seq("vec_id"))
    Similarity.rankTopK(withVec, k)
  }

  /** Delete index versions superseded for longer than `retentionMs`
    * (same grace-period contract as the table store's vacuum).
    */
  def vacuum(retentionMs: Long = 3600000L): Int = synchronized {
    require(retentionMs >= 0, s"vacuum: retentionMs=$retentionMs must be >= 0")
    val cutoff = System.currentTimeMillis() - retentionMs
    val cur = currentVersion.getOrElse(-1L)
    var removed = 0
    versions.filter(_ < cur).foreach { v =>
      val dir = root.resolve(s"v$v")
      if (Files.getLastModifiedTime(dir).toMillis < cutoff) {
        val walk = Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Files.delete(f); () })
        finally walk.close()
        removed += 1
      }
    }
    removed
  }
}

object AnnIndexStore {
  /** Random-hyperplane LSH build parameters (see [[Similarity]]). */
  final case class LshParams(tables: Int = 32, planes: Int = 6, dim: Int = 64)
  /** IVF build parameters (see [[Similarity.buildIvfIndex]]). */
  final case class IvfParams(nlist: Int = 32, refineIters: Int = 1, dim: Int = 64)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Durable exact-dedup index: the persisted content-digest set that
  * lets a NEW corpus snapshot dedupe against EVERYTHING ingested before
  * at batch cost — the cross-snapshot companion to [[Dedup.exact]]
  * (one corpus at a time) and
  * [[graft.streaming.StreamingIngest.dedupeDocsByDigest]] (exact only
  * inside the watermark horizon; this index is the forever-exact path
  * that doc refers to).
  *
  * Same commit protocol as [[AnnIndexStore]]/the table store: immutable
  * version directories under a CURRENT pointer, manifests listing the
  * directories composing a version. [[append]] stores ONLY digests not
  * already indexed (delta-sized files; manifest reuses every prior
  * directory), so daily ingest pays batch-scale writes against
  * corpus-scale history. Rows are 32-byte sha-256 digests — text never
  * enters the index.
  */
final class DigestIndex(spark: SparkSession, pathStr: String) {

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  private def currentPtr: Path = root.resolve("CURRENT")

  def versions: Seq[Long] = {
    val s = Files.list(root)
    // length bounds: a bare "v" passes forall vacuously, and >18 digits
    // overflows Long — both are stray artifacts to ignore, not crashes
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
      .filter(n => n.length > 1 && n.length <= 19 &&
        n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
    finally s.close()
  }

  def currentVersion: Option[Long] =
    if (!Files.exists(currentPtr)) None
    else Some(Files.readString(currentPtr).trim.stripPrefix("v").toLong)

  private def digestsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(sha2(col(textCol), 256).as("digest")).distinct()

  /** Index `docs`' content digests as version 0 (or a full rebuild). */
  def write(docs: DataFrame, textCol: String = "text"): Long = synchronized {
    val version = versions.lastOption.getOrElse(-1L) + 1L
    val dir = root.resolve(s"v$version")
    Files.createDirectory(dir) // put-if-absent: racing writers fail loudly
    digestsOf(docs, textCol)
      .repartition(col("digest")).sortWithinPartitions(col("digest"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("digests").toString)
    Files.writeString(dir.resolve("manifest.txt"), s"v$version/digests\n")
    commitCurrent(version)
    version
  }

  /** Index a new batch incrementally: store ONLY digests absent from
    * the current index (left_anti against it), commit a version whose
    * manifest = previous directories + the delta directory.
    */
  def append(docs: DataFrame, textCol: String = "text"): Long = synchronized {
    val base = currentVersion.getOrElse(
      throw new IllegalStateException(s"no digest index committed at $root"))
    val prev = manifestDirs(base)
    val version = versions.lastOption.getOrElse(-1L) + 1L
    val dir = root.resolve(s"v$version")
    Files.createDirectory(dir)
    digestsOf(docs, textCol)
      .join(digests(Some(base)), Seq("digest"), "left_anti")
      .repartition(col("digest")).sortWithinPartitions(col("digest"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("digests").toString)
    Files.writeString(dir.resolve("manifest.txt"),
      (prev :+ s"v$version/digests").mkString("", "\n", "\n"))
    commitCurrent(version)
    version
  }

  /** All indexed digests (the union of the version's directories). */
  def digests(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no digest index committed at $root"))
    manifestDirs(v).map(d => spark.read.parquet(root.resolve(d).toString))
      .reduce(_ unionByName _)
  }

  /** Rows of `batch` whose content digest is NOT in the index —
    * duplicates of anything ever indexed drop; duplicates WITHIN the
    * batch are [[Dedup.exact]]'s job, not this one's. The anti-join
    * shuffles 32-byte digests, never text.
    */
  def dedupe(batch: DataFrame, textCol: String = "text"): DataFrame = {
    require(!batch.columns.contains("__digest"),
      "dedupe: batch already has a __digest column — rename it first " +
        "(withColumn would silently clobber and drop it)")
    batch.withColumn("__digest", sha2(col(textCol), 256))
      .join(digests().withColumnRenamed("digest", "__digest"),
        Seq("__digest"), "left_anti")
      .drop("__digest")
  }

  /** Fold the append chain into ONE directory (I/O-only, same motive
    * as [[AnnIndexStore.compact]]): a long chain accumulates small
    * files and per-directory scan overhead. Old versions stay
    * probeable until [[vacuum]]. Returns the committed version.
    */
  def compact(): Long = synchronized {
    val base = currentVersion.getOrElse(
      throw new IllegalStateException(s"no digest index committed at $root"))
    val version = versions.lastOption.getOrElse(-1L) + 1L
    val dir = root.resolve(s"v$version")
    Files.createDirectory(dir)
    digests(Some(base))
      .repartition(col("digest")).sortWithinPartitions(col("digest"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("digests").toString)
    Files.writeString(dir.resolve("manifest.txt"), s"v$version/digests\n")
    commitCurrent(version)
    version
  }

  /** Reclaim superseded versions older than `retentionMs` — but never
    * a directory the CURRENT manifest still references (append chains
    * share their base's files). Returns versions made unprobeable.
    */
  def vacuum(retentionMs: Long = 3600000L): Int = synchronized {
    require(retentionMs >= 0, s"vacuum: retentionMs=$retentionMs must be >= 0")
    val cutoff = System.currentTimeMillis() - retentionMs
    val cur = currentVersion.getOrElse(-1L)
    val live: Set[String] = if (cur < 0) Set.empty else manifestDirs(cur).toSet
    var removed = 0
    versions.filter(_ < cur).foreach { v =>
      val dir = root.resolve(s"v$v")
      if (Files.getLastModifiedTime(dir).toMillis < cutoff) {
        val probeable = Files.exists(dir.resolve("manifest.txt"))
        if (!live.contains(s"v$v/digests"))
          graft.Fs.deleteTree(dir.resolve("digests"))
        Files.deleteIfExists(dir.resolve("manifest.txt"))
        val children = Files.list(dir)
        val empty = try !children.iterator().hasNext finally children.close()
        if (empty) Files.delete(dir)
        if (probeable) removed += 1
      }
    }
    removed
  }

  private def manifestDirs(version: Long): Seq[String] =
    Files.readString(root.resolve(s"v$version").resolve("manifest.txt"))
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)

  private def commitCurrent(version: Long): Unit = {
    val tmpPtr = Files.createTempFile(root, ".tmp-current", "")
    Files.writeString(tmpPtr, s"v$version")
    Files.move(tmpPtr, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

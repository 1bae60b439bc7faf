package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Durable exact-dedup index: the persisted content-digest set that
  * lets a NEW corpus snapshot dedupe against EVERYTHING ingested before
  * at batch cost — the cross-snapshot companion to [[Dedup.exact]]
  * (one corpus at a time) and
  * [[graft.streaming.StreamingIngest.dedupeDocsByDigest]] (exact only
  * inside the watermark horizon; this index is the forever-exact path
  * that doc refers to).
  *
  * Commit protocol: [[Versioned]] — each version is staged COMPLETE
  * (digests + manifest) and committed with one atomic rename into its
  * slot, so racing cross-process writers collide loudly on the slot
  * and rebase-retry instead of either delta being silently dropped;
  * torn version dirs cannot exist. [[append]] stores ONLY
  * digests not already indexed (delta-sized files; manifest reuses
  * every prior directory), so daily ingest pays batch-scale writes
  * against corpus-scale history; [[delete]] appends batch-scale
  * tombstones (the takedown path — removed content re-admits on
  * re-crawl) that [[compact]] folds away physically. Rows are 32-byte
  * sha-256 digests — text never enters the index.
  */
final class DigestIndex(spark: SparkSession, pathStr: String) {

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  def versions: Seq[Long] = Versioned.listVersions(root)

  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.txt")

  private def digestsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(sha2(col(textCol), 256).as("digest")).distinct()

  /** Index `docs`' content digests as version 0 (or a full rebuild). */
  def write(docs: DataFrame, textCol: String = "text"): Long = synchronized {
    Versioned.commitWithRetry(root, "manifest.txt") { (_, slot, staging) =>
      digestsOf(docs, textCol)
        .repartition(col("digest")).sortWithinPartitions(col("digest"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("digests").toString)
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/digests\n")
    }
  }

  /** Index a new batch incrementally: store ONLY digests absent from
    * the pinned base version (left_anti against it), commit a version
    * whose manifest = the base's directories + the delta directory. On
    * a lost slot race the delta is RECOMPUTED against the winner's
    * published state ([[Versioned.commitWithRetry]]'s rebase-retry),
    * so concurrent appends compose — neither writer's delta is dropped.
    */
  def append(docs: DataFrame, textCol: String = "text"): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no digest index committed at $root"))
      digestsOf(docs, textCol)
        .join(digests(Some(base)), Seq("digest"), "left_anti")
        .repartition(col("digest")).sortWithinPartitions(col("digest"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("digests").toString)
      Files.writeString(staging.resolve("manifest.txt"),
        (manifestDirs(base) :+ s"v$slot/digests").mkString("", "\n", "\n"))
    }
  }

  /** The effective indexed digest set. Manifest order is event order:
    * add directories fold as unions, tombstone directories
    * ([[delete]]) as subtractions, so a delete-then-reingest chain
    * replays correctly — a single global subtract would wrongly drop
    * the re-add that came AFTER the tombstone.
    */
  def digests(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no digest index committed at $root"))
    Versioned.replayChain(root, manifestDirs(v), "digest")(
      d => spark.read.parquet(root.resolve(d).toString))
  }

  /** Remove `docs`' content digests from the index — the takedown
    * path: a re-crawl of removed content is ADMITTED by [[dedupe]]
    * again. Commits a version whose manifest = the base's chain + a
    * batch-scale tombstone directory (only digests actually present
    * are stored — the semi-join keeps the delta tight); nothing is
    * rewritten until [[compact]], which folds the chain through the
    * tombstones and drops them physically. Returns the committed
    * version.
    */
  def delete(docs: DataFrame, textCol: String = "text"): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no digest index committed at $root"))
      digestsOf(docs, textCol)
        .join(digests(Some(base)), Seq("digest"), "left_semi")
        .repartition(col("digest")).sortWithinPartitions(col("digest"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("tombstones").toString)
      Files.writeString(staging.resolve("manifest.txt"),
        (manifestDirs(base) :+ s"v$slot/tombstones").mkString("", "\n", "\n"))
    }
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
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no digest index committed at $root"))
      digests(Some(base))
        .repartition(col("digest")).sortWithinPartitions(col("digest"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("digests").toString)
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/digests\n")
    }
  }

  private def requireCommitted(): Unit =
    if (currentVersion.isEmpty)
      throw new IllegalStateException(s"no digest index committed at $root")

  /** Reclaim superseded versions older than `retentionMs` — but never
    * a directory the live version's manifest still references (append
    * chains share their base's files) — plus crash residue: stale
    * staging dirs ([[Versioned.reapStaleStaging]]). Returns versions
    * made unprobeable.
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
        Seq("digests", "tombstones")
          .filterNot(c => live.contains(s"v$v/$c"))
          .foreach(c => graft.Fs.deleteTree(dir.resolve(c)))
        Files.deleteIfExists(dir.resolve("manifest.txt"))
        val children = Files.list(dir)
        val empty = try !children.iterator().hasNext finally children.close()
        if (empty) Files.delete(dir)
        if (probeable) removed += 1
      }
    }
    Versioned.reapStaleStaging(root, cutoff)
    removed
  }

  private def manifestDirs(version: Long): Seq[String] = {
    val mf = root.resolve(s"v$version").resolve("manifest.txt")
    // a v<N> without a manifest is a vacuumed data-holder, foreign
    // garbage, or absent — name it rather than NoSuchFileException
    // deep in a parquet read
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"v$version at $root has no manifest.txt — not a probeable version " +
          "(vacuumed, foreign, or never committed)")
    Files.readString(mf).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

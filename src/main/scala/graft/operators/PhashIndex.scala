package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Durable perceptual-hash index: the persisted banded postings that
  * let a NEW media batch near-dedupe against EVERY image/audio
  * fingerprint ever ingested at batch cost — the multimodal member of
  * the incremental index family ([[DigestIndex]] exact text,
  * [[MinHashIndex]] near-dup text, [[AnnIndexStore]] embeddings,
  * [[ClusterIndex]] duplicate clusters). Rows are (media_id, 64-bit
  * hash) split into four 16-bit chunk bands — 8 bytes per item, media
  * bytes never enter the index.
  *
  * Probe contract = [[Multimodal.phashNearDup]]'s: candidates from a
  * (band, v) equi-join against the stored postings (pigeonhole —
  * guaranteed recall at Hamming ≤ 3), `bit_count(xor)` verify before
  * the pair dedup. The postings live repartitioned/sorted by
  * (band, v), so a probe's collected band footprint prunes row groups
  * the way the ANN store's bucket footprint does.
  *
  * Commit protocol: [[Versioned]] (staged-complete + atomic slot
  * rename, rebase-retry on racing writers). [[append]] stores only
  * ids not already indexed — an at-least-once redelivered batch
  * re-appends nothing (idempotent), and the manifest reuses every
  * prior posting directory (batch-scale writes vs corpus-scale
  * history).
  */
final class PhashIndex(spark: SparkSession, pathStr: String) {

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  def versions: Seq[Long] = Versioned.listVersions(root)
  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.txt")

  /** (media_id, phash) → exploded (band, v, media_id, phash). */
  private def postingsOf(hashes: DataFrame): DataFrame = {
    val bands = (0 until 4).map(b => struct(lit(b).as("band"),
      shiftright(col("phash"), b * 16).bitwiseAND(lit(0xffffL)).as("v")))
    hashes.select(col("media_id").cast("long").as("media_id"),
        col("phash").cast("long").as("phash"),
        explode(array(bands: _*)).as("c"))
      .select(col("c.band"), col("c.v"), col("media_id"), col("phash"))
  }

  private def writePostings(df: DataFrame, dir: Path): Unit =
    df.repartition(col("band"), col("v"))
      .sortWithinPartitions(col("band"), col("v"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)

  /** Index `hashes` (media_id, phash) as version 0 / full rebuild. */
  def write(hashes: DataFrame): Long = synchronized {
    Versioned.commitWithRetry(root, "manifest.txt") { (_, slot, staging) =>
      writePostings(postingsOf(hashes), staging.resolve("postings"))
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/postings\n")
    }
  }

  /** Incremental append: only ids NOT already indexed are stored
    * (id-keyed anti-join against the pinned base — a redelivered batch
    * is a no-op re-commit of nothing; [[Versioned.SkipCommit]] keeps
    * even the empty version off the chain). */
  def append(hashes: DataFrame): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no phash index committed at $root"))
      val fresh = hashes.select(col("media_id").cast("long").as("media_id"),
          col("phash").cast("long").as("phash"))
        .join(postings(Some(base)).select(col("media_id")).distinct(),
          Seq("media_id"), "left_anti")
      if (fresh.isEmpty) throw Versioned.SkipCommit("empty delta: every id already indexed")
      writePostings(postingsOf(fresh), staging.resolve("postings"))
      Files.writeString(staging.resolve("manifest.txt"),
        (manifestDirs(base) :+ s"v$slot/postings").mkString("", "\n", "\n"))
    }
  }

  /** The effective postings of `version` (default: current). */
  def postings(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no phash index committed at $root"))
    manifestDirs(v).map(d => spark.read.parquet(root.resolve(d).toString))
      .reduce(_ unionByName _)
  }

  /** Near-dup hits of a probe batch against the index:
    * (batch_id, index_id, hamming) for every stored item within
    * `maxHamming` of a batch hash. Batch-vs-batch pairs are
    * [[Multimodal.phashNearDup]]'s job. */
  def probe(hashes: DataFrame, maxHamming: Int = 3,
            version: Option[Long] = None): DataFrame = {
    val batch = postingsOf(hashes)
    batch.as("b").join(postings(version).as("i"),
        col("b.band") === col("i.band") && col("b.v") === col("i.v"))
      .select(col("b.media_id").as("batch_id"),
        col("i.media_id").as("index_id"),
        bit_count(col("b.phash").bitwiseXOR(col("i.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming &&
        col("batch_id") =!= col("index_id"))
      .distinct()
  }

  /** Rows of a hashed batch with NO near-dup in the index. */
  def dedupe(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    hashes.join(probe(hashes, maxHamming)
        .select(col("batch_id").as("media_id")).distinct(),
      Seq("media_id"), "left_anti")

  /** Fold the append chain into one sorted postings run (I/O-only). */
  def compact(): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no phash index committed at $root"))
      writePostings(postings(Some(base)), staging.resolve("postings"))
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/postings\n")
    }
  }

  private def requireCommitted(): Unit =
    if (currentVersion.isEmpty)
      throw new IllegalStateException(s"no phash index committed at $root")

  /** Reclaim superseded versions past `retentionMs` (never directories
    * the live manifest still references) + stale staging dirs. */
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
        Seq("postings").filterNot(c => live.contains(s"v$v/$c"))
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
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"v$version at $root has no manifest.txt — not a probeable version " +
          "(vacuumed, foreign, or never committed)")
    Files.readString(mf).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

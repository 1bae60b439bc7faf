package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Durable reference snapshot for the quality-drift monitor
  * ([[Quality.drift]]): the reference corpus's per-band score counts,
  * persisted once, PSI'd against every incoming batch — so the
  * monitor's per-trigger cost is the BATCH's one banding scan plus a
  * bins-row frame, and the reference corpus is scanned exactly once
  * per snapshot, not once per trigger. At 100 TB that's the difference
  * between a drift check that costs a corpus scan per micro-batch and
  * one that costs nothing beyond the batch itself.
  *
  * Commit protocol: [[Versioned]] (staged-complete version dirs, the
  * atomic slot rename is the commit — the [[StatsIndex]] shape).
  * Layout:
  *
  * ```
  * path/
  *   v<N>/bands/        (band, n_ref)   ≤ bins rows
  *   v<N>/bins.txt      the band count, pinned at write
  *   v<N>/manifest.txt
  * ```
  *
  * A snapshot is immutable — refreshing the reference is a new
  * [[write]] (full rewrite of ≤ bins rows; there is nothing
  * incremental about a distribution snapshot), and old versions stay
  * comparable until [[vacuum]] — drift-vs-last-month is just
  * `psi(batch, version = Some(v))`.
  */
final class DriftRef(spark: SparkSession, pathStr: String) {

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  def versions: Seq[Long] = Versioned.listVersions(root)

  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.txt")

  /** Band the reference corpus (ONE partial-agg scan —
    * [[Quality.bandCounts]], the exact banding the one-shot monitor
    * uses) and commit the ≤ bins count rows as a new snapshot version.
    * Returns the committed version.
    */
  def write(reference: DataFrame, bins: Int = 10,
            textCol: String = "text"): Long = synchronized {
    require(bins >= 2, s"DriftRef.write: bins=$bins must be >= 2")
    Versioned.commitWithRetry(root, "manifest.txt") { (_, slot, staging) =>
      Quality.bandCounts(reference, bins, textCol, "n_ref")
        .coalesce(1) // ≤ bins rows
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("bands").toString)
      Files.writeString(staging.resolve("bins.txt"), s"$bins\n")
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/bands\n")
    }
  }

  /** The stored (band, n_ref) rows of a snapshot. */
  def bands(version: Option[Long] = None): DataFrame =
    spark.read.parquet(root.resolve(s"v${pin(version)}").resolve("bands").toString)

  /** The pinned band count of a snapshot. */
  def bins(version: Option[Long] = None): Int = {
    val f = root.resolve(s"v${pin(version)}").resolve("bins.txt")
    if (!Files.exists(f))
      throw new IllegalStateException(s"$f missing — not a probeable snapshot")
    Files.readString(f).trim.toInt
  }

  /** PSI of `batch` against the stored reference: identical output to
    * `Quality.drift(reference, batch)` — both paths band with
    * [[Quality.bandCounts]] and compute the frame with
    * [[Quality.driftFromCounts]], under the snapshot's pinned bins.
    * Cost: one banding scan over the BATCH; the reference contributes
    * its ≤ bins stored rows.
    */
  def psi(batch: DataFrame, textCol: String = "text",
          version: Option[Long] = None): DataFrame = {
    val v = pin(version)
    Quality.driftFromCounts(bands(Some(v)),
      Quality.bandCounts(batch, bins(Some(v)), textCol, "n_new"), bins(Some(v)))
  }

  /** Reclaim superseded snapshots older than `retentionMs` plus stale
    * staging dirs — the [[StatsIndex.vacuum]] contract. Returns
    * versions made unprobeable.
    */
  def vacuum(retentionMs: Long = 3600000L): Int = synchronized {
    require(retentionMs >= 0, s"vacuum: retentionMs=$retentionMs must be >= 0")
    val cutoff = System.currentTimeMillis() - retentionMs
    val cur = currentVersion.getOrElse(-1L)
    var removed = 0
    versions.filter(_ < cur).foreach { v =>
      val dir = root.resolve(s"v$v")
      if (Files.getLastModifiedTime(dir).toMillis < cutoff) {
        val probeable = Files.exists(dir.resolve("manifest.txt"))
        graft.Fs.deleteTree(dir, swallow = true)
        if (probeable) removed += 1
      }
    }
    Versioned.reapStaleStaging(root, cutoff)
    removed
  }

  private def pin(version: Option[Long]): Long =
    version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no drift reference committed at $root"))
}

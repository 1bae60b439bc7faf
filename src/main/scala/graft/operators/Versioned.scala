package graft.operators

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Cross-process commit protocol shared by the versioned index stores
  * ([[DigestIndex]], [[AnnIndexStore]], [[MinHashIndex]]) — the index
  * analogue of [[graft.engine.TimeSeriesStore]]'s manifest CAS.
  *
  * The unit of publication is a COMPLETE version directory: a writer
  * stages every component (data files AND the manifest) in a hidden
  * `.staging-*` directory, then claims the `v<N>` slot with ONE atomic
  * rename. **That rename IS the commit point.** The committed version
  * is simply the highest `v<N>` directory that contains the store's
  * manifest file — there is no separate CURRENT pointer, so there is
  * no commit window: a version is either invisible (still staging) or
  * durably committed, atomically. The slot claim is a true
  * compare-and-swap — a rival that already renamed into the slot makes
  * the move fail loudly (`FileAlreadyExistsException` from the
  * existence check, or `DirectoryNotEmptyException` from rename(2)
  * when both writers pass the check together; either way nobody
  * overwrites a committed version) and the loser rebase-retries
  * against the winner's published state, so concurrent appends
  * compose instead of one writer's delta being dropped.
  *
  * Contrast the two shapes this replaces. The pre-protocol shape
  * (version = `versions.last + 1` plus a REPLACE_EXISTING CURRENT
  * swap) let two writers on different slots both "succeed" while the
  * later swap silently dropped the earlier writer's delta. The
  * interim shape (slot CAS + separate CURRENT swap) closed that race
  * between live writers but reopened it for STALLED ones: a writer
  * paused longer than a grace period between its slot claim and its
  * pointer swap was indistinguishable from a crashed one, so rivals
  * had to guess (timeout heuristics) and a late-waking writer could
  * still swap the pointer over a rival's rebased commit. Making the
  * rename the commit point removes the guess: a stalled writer's
  * rename either lands first (its delta is committed and every later
  * pin includes it) or collides and rebases. No interleaving drops a
  * committed delta, with no clocks involved.
  *
  * The only crash residue is a stale `.staging-*` directory (writer
  * died mid-stage), reaped by the stores' vacuum via
  * [[reapStaleStaging]]. A bare `v<N>` without a manifest can only be
  * foreign garbage (this protocol can't create one); commits step
  * past it and reads name it loudly.
  */
private[graft] object Versioned {

  /** Version numbers of the `v<N>` directories under `root`, ascending.
    * Presence on disk only — includes foreign/torn dirs and (after a
    * vacuum) data-holder dirs whose manifest is stripped.
    */
  def listVersions(root: Path): Seq[Long] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    // length bounds: a bare "v" passes forall vacuously, and >18 digits
    // overflows Long — both are stray artifacts to ignore, not crashes
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
      .filter(n => n.length > 1 && n.length <= 19 &&
        n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
    finally s.close()
  }

  /** The committed version: the highest `v<N>` containing
    * `manifestName`. Versions below it keep their manifests until
    * vacuum strips them (older probeable versions = time travel), so
    * the maximum is always the live one.
    */
  def currentVersion(root: Path, manifestName: String): Option[Long] =
    listVersions(root)
      .filter(v => Files.exists(root.resolve(s"v$v").resolve(manifestName)))
      .lastOption

  /** Run `stage` to fill a staging directory with the COMPLETE content
    * of the next version (data + manifest), then commit it with one
    * atomic rename into the next free slot. `stage(base, slot,
    * staging)` receives the pinned base version (the committed version
    * at pin time — compute deltas and chained manifests against
    * exactly this), the slot the content will commit as (manifest
    * entries are `v<slot>/...`-relative), and the staging dir to write
    * into. On a lost slot race the staged content is discarded and
    * `stage` runs AGAIN against the winner's published state — the
    * rebase-retry that makes concurrent appends compose instead of
    * silently dropping one writer's delta. Returns the committed
    * version.
    */
  /** Thrown by a `stage` callback to abandon its commit cleanly (e.g.
    * an incremental append whose delta turned out empty — committing
    * it would at best grow the chain with empty dirs and at worst
    * write component layouts that can't be re-read, like a
    * zero-row dynamic-partition parquet dir). [[commitWithRetry]]
    * catches it, discards the staging dir and returns the pinned base
    * version as if the no-op had committed.
    */
  final case class SkipCommit(reason: String) extends RuntimeException(reason)

  def commitWithRetry(root: Path, manifestName: String, maxAttempts: Int = 5)
                     (stage: (Option[Long], Long, Path) => Unit): Long = {
    var attempt = 0
    while (true) {
      // base and slot MUST come from ONE directory snapshot: listing
      // twice lets a rival commit land between the reads, yielding
      // base=v0 but slot=v2 — the stage then chains off v0, publishes
      // into the FREE v2 slot with no collision, and silently drops
      // the rival's v1 delta. One snapshot forces the loser onto the
      // collision/rebase path. (A listed v<N> is complete — the rename
      // that made it visible carried its manifest — so the per-version
      // manifest check is consistent with the snapshot.)
      val versions = listVersions(root)
      val base = versions
        .filter(v => Files.exists(root.resolve(s"v$v").resolve(manifestName)))
        .lastOption
      // step past foreign manifest-less dirs too — never write into one
      val slot = versions.lastOption.getOrElse(-1L) + 1L
      val staging = Files.createTempDirectory(root, ".staging-")
      val published =
        try {
          stage(base, slot, staging)
          publish(root, staging, slot)
        } catch {
          case SkipCommit(_) =>
            return base.getOrElse(throw new IllegalStateException(
              s"stage at $root skipped its commit but no base version exists"))
        } finally graft.Fs.deleteTree(staging, swallow = true)
      if (published) return slot
      attempt += 1
      if (attempt >= maxAttempts)
        throw new IllegalStateException(
          s"commit at $root kept losing the version race under $maxAttempts attempts")
    }
    -1L // unreachable
  }

  /** Atomically claim slot `version` by renaming the staged dir into
    * place — the commit point. True on success; false when a rival
    * holds the slot.
    */
  private def publish(root: Path, staging: Path, version: Long): Boolean =
    try {
      Files.move(staging, root.resolve(s"v$version"))
      true
    } catch {
      // FileAlreadyExists: the pre-move existence check saw the rival.
      // DirectoryNotEmpty: both writers passed the check and rename(2)
      // hit the rival's non-empty dir. Same meaning — slot taken.
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.nio.file.DirectoryNotEmptyException => false
    }

  /** Reap stale `.staging-*` dirs (writer died mid-stage), called from
    * the stores' vacuum. Staleness is judged by the NEWEST mtime in
    * the staging TREE, not the root dir's own mtime — a live
    * corpus-scale parquet write touches the root only when its
    * top-level children appear, but it creates part files continuously,
    * so the deep-walk maximum stays fresh for as long as the writer is
    * alive. On top of the caller's cutoff a quiescence floor of
    * [[StagingQuiescenceMs]] always applies, so an aggressive
    * `vacuum(0)` cannot reap a writer that is merely between two
    * filesystem operations.
    */
  def reapStaleStaging(root: Path, cutoffMs: Long): Unit = {
    val floor = System.currentTimeMillis() - StagingQuiescenceMs
    val cutoff = math.min(cutoffMs, floor)
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith(".staging-"))
      .filter(p => newestMtime(p) < cutoff)
      .foreach(p => graft.Fs.deleteTree(p, swallow = true))
    finally s.close()
  }

  /** A staging dir is only reaped once NOTHING in it has been written
    * for this long, whatever retention the caller asked for.
    */
  val StagingQuiescenceMs: Long = 600000L

  private def newestMtime(p: Path): Long =
    // the tree is mutating under a LIVE writer (task-commit renames,
    // the publish rename, the writer's own cleanup) — any walk/stat
    // failure means activity, i.e. FRESH, never a crash to surface
    try {
      val s = Files.walk(p)
      try s.iterator().asScala
        .map(f => Files.getLastModifiedTime(f).toMillis)
        .foldLeft(Long.MinValue)(math.max)
      finally s.close()
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
        Long.MaxValue
    }

  /** Replay one manifest chain in order: data directories union,
    * `…/tombstones` entries ([[DigestIndex.delete]] & friends)
    * subtract their key sets from everything EARLIER — positional, so
    * delete-then-reingest resolves to exactly one live copy. The
    * tombstone side is takedown-sized by contract and explicitly
    * broadcast (auto-broadcast can miss when size stats are absent,
    * which would shuffle the corpus-scale chain against a tiny set).
    * `read` maps a chain entry to its DataFrame; `key` is the id
    * column shared by data and tombstone rows.
    */
  def replayChain(root: Path, chain: Seq[String], key: String)
                 (read: String => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    chain.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) { (acc, d) =>
      acc match {
        case None => Some(read(d)) // first entry is always a data dir (write)
        case Some(a) if d.endsWith("/tombstones") =>
          Some(a.join(broadcast(read(d).select(col(key))), Seq(key), "left_anti"))
        case Some(a) => Some(a.unionByName(read(d)))
      }
    }.getOrElse(throw new IllegalStateException(
      s"manifest chain at $root lists no data directories"))
  }
}

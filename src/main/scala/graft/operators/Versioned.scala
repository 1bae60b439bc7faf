package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Cross-process commit protocol shared by the versioned index stores
  * ([[DigestIndex]], [[AnnIndexStore]], [[MinHashIndex]]) — the index
  * analogue of [[graft.engine.TimeSeriesStore]]'s manifest CAS.
  *
  * The unit of publication is a COMPLETE version directory: a writer
  * stages every component (data files AND the manifest) in a hidden
  * `.staging-*` directory, then claims the `v<N>` slot with ONE atomic
  * rename. That makes the slot claim a true compare-and-swap — a rival
  * that already renamed into the slot makes the move fail loudly
  * (`FileAlreadyExistsException` from the existence check, or
  * `DirectoryNotEmptyException` from rename(2) when both writers pass
  * the check together; either way nobody overwrites a committed
  * version) — and it makes torn version directories impossible: a
  * `v<N>` either doesn't exist or is complete, so the only crash
  * residue is a stale staging directory (reaped by the stores'
  * vacuum). Contrast the pre-protocol shape this replaces: version =
  * `versions.last + 1` plus a REPLACE_EXISTING CURRENT swap let two
  * writers on different slots both "succeed" while the later swap
  * silently dropped the earlier writer's delta from the live manifest.
  *
  * Commit point is the CURRENT pointer swap (last-wins across racers —
  * version numbers are totally ordered and each published dir is
  * durable — but [[commitCurrent]] refuses to move CURRENT backwards,
  * so a stalled writer resurrecting after a rival committed a higher
  * version fails loudly instead of rolling the store back). A version
  * directory present WITHOUT a CURRENT swap is an uncommitted crash
  * orphan: fresh ones are awaited (the writer is in its ms-scale
  * commit window), stale ones are skipped — never adopted, never
  * rebased on — mirroring the table store's orphan-manifest contract.
  */
private[operators] object Versioned {

  /** Version numbers of the `v<N>` directories under `root`, ascending.
    * Presence on disk only — includes uncommitted orphans and (after a
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

  def currentVersion(root: Path): Option[Long] = {
    val ptr = root.resolve("CURRENT")
    if (!Files.exists(ptr)) None
    else Some(Files.readString(ptr).trim.stripPrefix("v").toLong)
  }

  /** Run `stage` to fill a staging directory with the COMPLETE content
    * of the next version (data + manifest), then publish it at the next
    * free slot and swap CURRENT. `stage(base, slot, staging)` receives
    * the pinned base version (CURRENT at pin time — compute deltas and
    * chained manifests against exactly this), the slot the content will
    * commit as (manifest entries are `v<slot>/...`-relative), and the
    * staging dir to write into. On a lost slot race the staged content
    * is discarded and `stage` runs AGAIN against the winner's published
    * state — the rebase-retry that makes concurrent appends compose
    * instead of silently dropping one writer's delta. Returns the
    * committed version.
    */
  def commitWithRetry(root: Path, manifestName: String, maxAttempts: Int = 5)
                     (stage: (Option[Long], Long, Path) => Unit): Long = {
    var attempt = 0
    while (true) {
      // a COMPLETE dir above CURRENT is a rival inside its ms-scale
      // commit window (await its swap — pinning a base under it would
      // drop its delta) or a crashed writer's uncommitted orphan
      // (stale => skipped, never adopted: its client never saw success)
      awaitFreshRivals(root, manifestName)
      val base = currentVersion(root)
      val slot = math.max(listVersions(root).lastOption.getOrElse(-1L),
        base.getOrElse(-1L)) + 1L
      val staging = Files.createTempDirectory(root, ".staging-")
      val published =
        try {
          stage(base, slot, staging)
          publish(root, staging, slot)
        } finally graft.Fs.deleteTree(staging, swallow = true)
      if (published) { commitCurrent(root, slot); return slot }
      attempt += 1
      if (attempt >= maxAttempts)
        throw new IllegalStateException(
          s"commit at $root kept losing the version race under $maxAttempts attempts")
    }
    -1L // unreachable
  }

  /** Atomically claim slot `version` by renaming the staged dir into
    * place. True on success; false when a rival holds the slot.
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

  /** Swap CURRENT to `version` — atomic, and refuses to regress: a
    * writer that stalled past a rival's commit fails loudly here
    * instead of rolling the live version back (its published dir stays
    * on disk as an uncommitted orphan for vacuum).
    */
  def commitCurrent(root: Path, version: Long): Unit = {
    currentVersion(root).filter(_ > version).foreach { cur =>
      throw new IllegalStateException(
        s"CURRENT at $root advanced to v$cur during this commit of v$version — " +
          "a rival committed first; rerun against the new state")
    }
    val tmpPtr = Files.createTempFile(root, ".tmp-current", "")
    Files.writeString(tmpPtr, s"v$version")
    Files.move(tmpPtr, root.resolve("CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Wait (bounded) for CURRENT to reach any FRESH complete version dir
    * above it — a rival between its slot claim and pointer swap. Stale
    * ones (older than `graceMs`) are crashed uncommitted writers:
    * skipped immediately, no wait. Throws if a fresh rival never swaps
    * (crashed inside the window) — loud, like the table store's
    * "writer crashed mid-commit" path — rather than dropping a commit
    * a client may have been told succeeded.
    */
  private def awaitFreshRivals(root: Path, manifestName: String,
                               timeoutMs: Long = 5000L, graceMs: Long = 60000L): Unit = {
    val now = System.currentTimeMillis()
    val cur = currentVersion(root).getOrElse(-1L)
    val fresh = listVersions(root).filter { v =>
      val dir = root.resolve(s"v$v")
      v > cur && Files.exists(dir.resolve(manifestName)) &&
        now - Files.getLastModifiedTime(dir).toMillis < graceMs
    }
    if (fresh.isEmpty) return
    val top = fresh.max
    val deadline = now + timeoutMs
    while (currentVersion(root).getOrElse(-1L) < top) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"v$top at $root is published but CURRENT never advanced " +
            "(writer crashed mid-commit?); retry after its grace period — " +
            "vacuum reaps it once stale")
      Thread.sleep(25)
    }
  }

  /** Crash residue reaping, called from the stores' vacuum: stale
    * `.staging-*` dirs (writer died mid-stage) and stale UNCOMMITTED
    * version dirs above CURRENT (writer died between slot claim and
    * pointer swap — complete on disk but never committed, so their
    * client never saw success and no later manifest can reference
    * them). Returns how many version dirs were reaped.
    */
  def reapCrashResidue(root: Path, manifestName: String, cutoffMs: Long): Int = {
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith(".staging-"))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoffMs)
      .foreach(p => graft.Fs.deleteTree(p, swallow = true))
    finally s.close()
    val cur = currentVersion(root).getOrElse(-1L)
    val orphans = listVersions(root).filter { v =>
      v > cur && Files.getLastModifiedTime(root.resolve(s"v$v")).toMillis < cutoffMs
    }
    orphans.foreach(v => graft.Fs.deleteTree(root.resolve(s"v$v"), swallow = true))
    orphans.size
  }
}

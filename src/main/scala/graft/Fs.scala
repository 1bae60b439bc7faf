package graft

import java.nio.file.{Files, Path}

/** Tiny shared filesystem helpers (one definition of the recursive
  * delete instead of per-module copies that drift).
  */
private[graft] object Fs {

  /** Delete `p` and everything under it (no-op if absent). With
    * `swallow`, non-fatal failures are ignored — for best-effort
    * cleanup paths like shutdown hooks.
    */
  def deleteTree(p: Path, swallow: Boolean = false): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach { f =>
          if (swallow) { Files.deleteIfExists(f); () }
          else { Files.delete(f); () }
        }
      catch { case scala.util.control.NonFatal(e) => if (!swallow) throw e }
      finally walk.close()
    }
}

package graft

import graft.operators.{DriftRef, Quality}
import java.nio.file.Files

/** The persisted drift reference: PSI against a stored snapshot must
  * be bit-identical to the one-shot oracle-checked operator — the
  * whole point of sharing the banding + frame code — and snapshots
  * must version/vacuum like the other tiny stores.
  */
class DriftRefSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range, text: Long => String) =
    ids.map(i => (i.toLong, text(i.toLong))).toDF("doc_id", "text")

  private val ref = corpus(0 until 40,
    i => s"document $i with some reasonably varied words count ${"x " * (i % 7).toInt}")
  private val batch = corpus(100 until 130,
    i => s"another batch doc $i slightly different mix ${"y " * (i % 5).toInt}")

  test("psi against the stored snapshot == one-shot Quality.drift, from a fresh session") {
    val p = Files.createTempDirectory("graft-drift1").toString
    val store = new DriftRef(spark, p)
    assert(store.write(ref) == 0L)
    val oneShot = Quality.drift(ref, batch).collect().toSeq
    assert(store.psi(batch).collect().toSeq == oneShot)
    // fresh session: bands + bins read from disk, same frame
    assert(new DriftRef(spark.newSession(), p).psi(batch).collect().toSeq == oneShot)
    // identical distributions PSI to exactly zero through the store too
    assert(store.psi(ref).collect().forall(_.getDouble(3) == 0.0))
  }

  test("snapshots version: refresh commits anew, old versions stay comparable, vacuum reaps") {
    val p = Files.createTempDirectory("graft-drift2").toString
    val store = new DriftRef(spark, p)
    store.write(ref, bins = 5)
    val ref2 = corpus(0 until 40, i => s"shifted corpus $i ${"z " * (i % 3).toInt}")
    val v1 = store.write(ref2, bins = 5)
    assert(v1 == 1L && store.currentVersion.contains(1L))
    // pinned-bins plumbing: psi under the old version uses ITS snapshot
    val oldPsi = store.psi(batch, version = Some(0L)).collect().toSeq
    assert(oldPsi == Quality.drift(ref, batch, bins = 5).collect().toSeq)
    assert(store.psi(batch).collect().toSeq ==
      Quality.drift(ref2, batch, bins = 5).collect().toSeq)
    store.vacuum(0)
    assert(store.versions == Seq(1L))
    intercept[Exception](store.psi(batch, version = Some(0L)).collect())
  }

  test("pinned reader survives refresh + retention vacuum; 0-retention vacuum fails it loudly") {
    // same vacuum contract as the other Versioned stores (round-7
    // verdict #8): a refresh deletes nothing, a retention-window
    // vacuum spares the superseded-but-recent snapshot (the concurrent
    // reader's grace window), and only a 0-retention reap makes it
    // unprobeable — loudly, never as silently-wrong PSI.
    val p = Files.createTempDirectory("graft-drift4").toString
    val store = new DriftRef(spark, p)
    store.write(ref, bins = 5)
    val pinned = store.psi(batch, version = Some(0L)).collect().toSeq
    val ref2 = corpus(0 until 40, i => s"refreshed corpus $i ${"w " * (i % 4).toInt}")
    assert(store.write(ref2, bins = 5) == 1L)
    // refresh deleted nothing — the pinned snapshot answers identically
    assert(store.psi(batch, version = Some(0L)).collect().toSeq == pinned)
    assert(store.vacuum(retentionMs = 3600000L) == 0)
    assert(store.psi(batch, version = Some(0L)).collect().toSeq == pinned)
    assert(store.vacuum(0) == 1)
    intercept[Exception](store.psi(batch, version = Some(0L)).collect())
    // the current snapshot is untouched
    assert(store.psi(batch).collect().toSeq ==
      Quality.drift(ref2, batch, bins = 5).collect().toSeq)
  }

  test("psi before any snapshot fails loudly; degenerate bins rejected") {
    val p = Files.createTempDirectory("graft-drift3").toString
    val store = new DriftRef(spark, p)
    intercept[IllegalStateException](store.psi(batch))
    intercept[IllegalArgumentException](store.write(ref, bins = 1))
  }
}

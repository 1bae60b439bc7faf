package graft

import graft.operators.{Multimodal, PhashIndex}
import graft.operators.Multimodal.ImageHash
import org.apache.spark.sql.functions._

/** Persisted perceptual-hash index ([[graft.operators.PhashIndex]]):
  * the family laws — probe == one-shot, redelivery idempotence,
  * randomized split-equivalence, chain compaction, vacuum.
  */
class PhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("phash-idx-spec").toString

  private def hashes(rows: (Long, Long)*) =
    rows.map { case (id, h) => ImageHash(id, h) }.toDS().toDF()

  private val base = 0x0123456789abcdefL

  test("probe == the one-shot pair operator restricted to batch-vs-history") {
    val history = hashes((0L, base), (1L, base ^ 0x3L), (2L, ~base))
    val batch = hashes((10L, base ^ 0x1L), (11L, ~base), (12L, 0x5555555555555555L))
    val ix = new PhashIndex(spark, tmp())
    ix.write(history)
    val got = ix.probe(batch, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // one-shot over the union, keep only (batch, history) pairs
    val oneShot = Multimodal.phashNearDup(history.unionByName(batch), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .filter { case (a, b, _) => (a < 10) != (b < 10) }
      .map { case (a, b, h) => if (a >= 10) (a, b, h) else (b, a, h) }.toSet
    assert(got == oneShot)
    assert(got.map(t => (t._1, t._2)) == Set((10L, 0L), (10L, 1L), (11L, 2L)))
  }

  test("append is redelivery-idempotent (SkipCommit) and split == one-shot (randomized)") {
    val rnd = new scala.util.Random(0x9e11a5)
    for (trial <- 0 until 3) {
      val all = (0L until 40L).map(i => (i, rnd.nextLong()))
      val (p1, p2) = all.splitAt(10 + rnd.nextInt(20))
      val oneDir = tmp(); val incDir = tmp()
      val one = new PhashIndex(spark, oneDir)
      one.write(hashes(all: _*))
      val inc = new PhashIndex(spark, incDir)
      inc.write(hashes(p1: _*))
      inc.append(hashes(p2: _*))
      val vAfter = inc.currentVersion.get
      // redelivery: re-appending p2 commits nothing
      inc.append(hashes(p2: _*))
      assert(inc.currentVersion.get == vAfter, s"trial $trial: replay committed")
      val probeBatch = hashes((1000L, all(rnd.nextInt(all.length))._2),
        (1001L, rnd.nextLong()))
      def hits(ix: PhashIndex) = ix.probe(probeBatch, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      assert(hits(one) == hits(inc), s"trial $trial: split != one-shot")
    }
  }

  test("dedupe drops near-dup batch rows, keeps fresh ones") {
    val ix = new PhashIndex(spark, tmp())
    ix.write(hashes((0L, base)))
    val batch = hashes((10L, base ^ 0x1L), (11L, ~base))
    val kept = ix.dedupe(batch).collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
  }

  test("compact folds the chain; vacuum reclaims old versions, pinned reads fail loudly") {
    val ix = new PhashIndex(spark, tmp())
    ix.write(hashes((0L, base)))
    ix.append(hashes((1L, ~base)))
    val before = ix.probe(hashes((10L, base ^ 0x2L)), maxHamming = 3).collect().toSeq
    val vOld = ix.currentVersion.get
    ix.compact()
    assert(ix.probe(hashes((10L, base ^ 0x2L)), maxHamming = 3).collect().toSeq == before)
    assert(ix.vacuum(retentionMs = 0L) > 0)
    val e = intercept[IllegalStateException] { ix.postings(Some(vOld)).collect() }
    assert(e.getMessage.contains("manifest"))
    // current version survives
    assert(ix.probe(hashes((10L, base ^ 0x2L)), maxHamming = 3).collect().toSeq == before)
  }
}

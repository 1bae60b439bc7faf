package graft

import graft.operators.DigestIndex
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The persisted exact-dedup index: batch-cost appends against
  * corpus-scale history, probed across sessions.
  */
class DigestIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("dedupe drops anything ever indexed; append stores only the delta") {
    val path = Files.createTempDirectory("graft-digest").toString
    val idx = new DigestIndex(spark, path)
    assert(idx.write(docs(0L -> "aa", 1L -> "bb")) == 0L)
    // delta: "bb" already indexed, "cc"+"dd" new
    assert(idx.append(docs(2L -> "bb", 3L -> "cc", 4L -> "dd")) == 1L)
    // v1 holds ONLY the 2 new digests (batch-scale, not corpus-scale)
    assert(spark.read.parquet(s"$path/v1/digests").count() == 2L)

    val batch = docs(10L -> "aa", 11L -> "cc", 12L -> "zz", 13L -> "zz")
    val kept = idx.dedupe(batch).collect().map(_.getLong(0)).sorted.toSeq
    // aa (v0) and cc (v1) drop; zz unseen — BOTH zz rows stay
    // (in-batch dups are Dedup.exact's job)
    assert(kept == Seq(12L, 13L))

    // a fresh session reads the committed chain purely from disk
    val fresh = new DigestIndex(spark.newSession(), path)
    assert(fresh.dedupe(batch).count() == 2L)

    // appending the batch then deduping it again drops everything
    idx.append(batch)
    assert(idx.dedupe(batch).count() == 0L)
    assert(idx.versions == Seq(0L, 1L, 2L))
  }

  test("randomized: arbitrary corpora split across arbitrary appends dedupe-equal to a one-shot build (seeded)") {
    // random short texts over a tiny alphabet (dense duplicate rate —
    // dups within a batch, across batches, and against history all
    // occur) split across 1-4 appends: the dedupe DECISION for any
    // probe batch must equal a one-shot build's, and the stored digest
    // set must be exactly the corpus's distinct texts
    val rnd = new scala.util.Random(20260814L)
    def text(): String = Seq.fill(2 + rnd.nextInt(3))(('a' + rnd.nextInt(4)).toChar)
      .mkString(" ")
    (1 to 3).foreach { trial =>
      val corpus = (0 until 30 + rnd.nextInt(30)).map(i => (i.toLong, text()))
      val batches = corpus.grouped(math.max(1, corpus.size / (1 + rnd.nextInt(4)))).toSeq
      val inc = new DigestIndex(spark,
        Files.createTempDirectory(s"graft-dg-rand$trial").toString)
      inc.write(docs(batches.head: _*))
      batches.tail.foreach(b => inc.append(docs(b: _*)))
      val full = new DigestIndex(spark,
        Files.createTempDirectory(s"graft-dg-rand-full$trial").toString)
      full.write(docs(corpus: _*))
      assert(inc.digests().collect().map(_.getString(0)).sorted.toSeq ==
        full.digests().collect().map(_.getString(0)).sorted.toSeq,
        s"trial $trial: stored digest sets diverged")
      val probe = docs((0 until 10).map(j => (500L + j, text())): _*)
      assert(inc.dedupe(probe).collect().map(_.getLong(0)).sorted.toSeq ==
        full.dedupe(probe).collect().map(_.getLong(0)).sorted.toSeq,
        s"trial $trial: dedupe decisions diverged")
    }
  }

  test("compact folds the chain into one dir; vacuum spares referenced dirs, reaps after compact") {
    val path = Files.createTempDirectory("graft-digest3").toString
    val idx = new DigestIndex(spark, path)
    idx.write(docs(0L -> "aa"))
    idx.append(docs(1L -> "bb"))
    // superseded v0's data is still referenced by v1's manifest —
    // vacuum strips its probeability but keeps the digests dir
    assert(idx.vacuum(0) == 1)
    assert(Files.exists(Paths.get(path, "v0", "digests")))
    assert(idx.dedupe(docs(9L -> "aa")).count() == 0L)

    assert(idx.compact() == 2L)
    val probe = docs(10L -> "aa", 11L -> "bb", 12L -> "new")
    assert(idx.dedupe(probe).collect().map(_.getLong(0)).toSeq == Seq(12L))
    // nothing references v0/v1 anymore — vacuum reclaims them fully
    idx.vacuum(0)
    assert(idx.versions == Seq(2L))
    // a fresh session probes the compacted index
    val fresh = new DigestIndex(spark.newSession(), path)
    assert(fresh.dedupe(probe).count() == 1L)
  }

  test("racing appends from independent instances both land (slot CAS + rebase-retry)") {
    // the round-4 advisory race: two writers on the same base, neither
    // serialized by instance-level synchronized. Under last-write-wins
    // the later CURRENT swap silently dropped the earlier delta; under
    // the slot CAS the loser collides, rebases on the winner's
    // published manifest and recomputes its delta — both batches land.
    val path = Files.createTempDirectory("graft-digest-race").toString
    new DigestIndex(spark, path).write(docs(0L -> "aa"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("bb" -> 1L, "cc" -> 2L).map { case (text, id) =>
      new Thread(() =>
        try { new DigestIndex(spark, path).append(docs(id -> text)); () }
        catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"racing append failed: ${errs.asScala.map(_.getMessage)}")
    val probe = docs(10L -> "aa", 11L -> "bb", 12L -> "cc", 13L -> "zz")
    val fresh = new DigestIndex(spark.newSession(), path)
    // every indexed text drops — NEITHER racer's delta was lost
    assert(fresh.dedupe(probe).collect().map(_.getLong(0)).toSeq == Seq(13L))
  }

  test("a version dir without a manifest is named loudly, not NoSuchFileException") {
    val path = Files.createTempDirectory("graft-digest-torn").toString
    val idx = new DigestIndex(spark, path)
    idx.write(docs(0L -> "aa"))
    val e = intercept[IllegalStateException](idx.digests(Some(99L)))
    assert(e.getMessage.contains("v99") && e.getMessage.contains("manifest"))
  }

  test("delete tombstones digests: re-crawls admit again; the chain replays in order; compact folds physically") {
    val path = Files.createTempDirectory("graft-digest-del").toString
    val idx = new DigestIndex(spark, path)
    idx.write(docs(0L -> "aa", 1L -> "bb"))
    assert(idx.dedupe(docs(10L -> "aa")).count() == 0L)
    // takedown "aa": its re-crawl is admitted again, "bb" still drops
    idx.delete(docs(100L -> "aa"))
    assert(idx.dedupe(docs(10L -> "aa", 11L -> "bb"))
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
    // deleting never-indexed content stores nothing (semi-join delta)
    val vz = idx.delete(docs(101L -> "zz"))
    assert(spark.read.parquet(s"$path/v$vz/tombstones").count() == 0L)
    // re-ingest AFTER the delete: manifest order replays, "aa" drops
    // again (a global subtract would wrongly keep admitting it)
    idx.append(docs(20L -> "aa"))
    assert(idx.dedupe(docs(12L -> "aa")).count() == 0L)
    // compact folds the tombstones away physically; effective set is
    // exactly {aa, bb}; a fresh session agrees
    val v = idx.compact()
    idx.vacuum(0)
    assert(idx.versions == Seq(v))
    assert(spark.read.parquet(s"$path/v$v/digests").count() == 2L)
    val fresh = new DigestIndex(spark.newSession(), path)
    assert(fresh.dedupe(docs(13L -> "aa", 14L -> "cc"))
      .collect().map(_.getLong(0)).toSeq == Seq(14L))
  }

  test("a leftover staging dir is invisible to readers and spared by vacuum until quiescent") {
    val path = Files.createTempDirectory("graft-digest-stag")
    val idx = new DigestIndex(spark, path.toString)
    idx.write(docs(0L -> "aa"))
    // crash residue: a writer died mid-stage (or is still writing)
    val staging = Files.createTempDirectory(path, ".staging-")
    Files.writeString(staging.resolve("part-0"), "half-written")
    // invisible to reads and version listings
    assert(idx.currentVersion.contains(0L))
    assert(idx.versions == Seq(0L))
    assert(idx.dedupe(docs(1L -> "aa")).count() == 0L)
    // an aggressive vacuum(0) must NOT reap it — the writer may be
    // live between two filesystem ops (quiescence floor)
    idx.vacuum(0)
    assert(Files.exists(staging))
    // once every file in the tree has been quiet past the floor, it goes
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - graft.operators.Versioned.StagingQuiescenceMs - 60000)
    Seq(staging, staging.resolve("part-0"))
      .foreach(p => Files.setLastModifiedTime(p, old))
    idx.vacuum(0)
    assert(Files.notExists(staging))
  }

  test("append before write fails loudly; rival version dirs are stepped past, not clobbered") {
    val path = Files.createTempDirectory("graft-digest2").toString
    val idx = new DigestIndex(spark, path)
    intercept[IllegalStateException](idx.append(docs(0L -> "aa")))
    idx.write(docs(0L -> "aa"))
    // a rival writer's (or crashed) v1 dir: the next commit must not
    // write into it — it allocates v2 and leaves v1 untouched
    Files.createDirectory(Paths.get(path, "v1"))
    assert(idx.append(docs(1L -> "bb")) == 2L)
    assert(Files.notExists(Paths.get(path, "v1", "digests")))
    assert(idx.dedupe(docs(5L -> "bb")).count() == 0L)
  }
}

package graft

import graft.engine.{QueryEngine, TimeSeriesStore}
import graft.model._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Mutation-surface semantics (SURVEY.md §2.1 S1-S4): all-or-nothing
  * batches, ≤10 error messages, query-after-mutation correctness.
  */
class TimeSeriesStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TimeSeriesStore =
    new TimeSeriesStore(spark, Files.createTempDirectory("graft-store").toString)

  private val base = Seq(
    TS(1L, "a", 1.0), TS(2L, "a", 2.0), TS(1L, "b", 3.0), TS(3L, "c", 4.0))

  test("S1 insert: append then read back") {
    val st = freshStore()
    assert(st.insert(base.toDS()).isRight)
    assert(st.current().count() == 4)
    assert(st.insert(Seq(TS(9L, "a", 5.0)).toDS()).isRight)
    assert(st.current().count() == 5)
  }

  test("S1 insert: whole batch rejected on any existing key (all-or-nothing)") {
    val st = freshStore()
    st.insert(base.toDS())
    val r = st.insert(Seq(TS(5L, "z", 0.0), TS(1L, "a", 9.9)).toDS())
    assert(r.isLeft)
    assert(r.left.toOption.get.messages.contains("Timestamp = 1 and tag = \"a\" already exists."))
    assert(st.current().count() == 4) // nothing applied
  }

  test("S1 insert: within-batch duplicate keys rejected") {
    val st = freshStore()
    val r = st.insert(Seq(TS(7L, "x", 1.0), TS(7L, "x", 2.0)).toDS())
    assert(r.isLeft)
    assert(st.current().count() == 0)
  }

  test("S1 insert: negative timestamps rejected (day-math contract)") {
    // every day-math convention in the store (g_day = div at write,
    // floorDiv point probes, MetaStats' [d·D,(d+1)·D) coverage) agrees
    // only on nonnegative epoch ms — a row at ts=−1000 would land in
    // g_day=0 while currentForTs probes day −1, silently missing it
    // from the pruned read. Rejected at the only row-creating seam,
    // all-or-nothing like every other batch error.
    val st = freshStore()
    val r = st.insert(Seq(TS(-1000L, "n", 1.0), TS(5L, "ok", 2.0)).toDS())
    assert(r.isLeft)
    assert(r.left.toOption.get.messages
      .contains("Negative timestamp not supported: (-1000, n)."))
    assert(st.current().count() == 0) // nothing applied
    // and the boundary itself is fine
    assert(st.insert(Seq(TS(0L, "ok", 2.0)).toDS()).isRight)
    assert(QueryEngine.execute(st, QueryModel(tsEq = Some(0L)),
      Seq.empty).isRight)
  }

  test("S1 insert: error messages capped at 10") {
    val st = freshStore()
    st.insert((1L to 30L).map(i => TS(i, "t", i.toDouble)).toDS())
    val r = st.insert((1L to 30L).map(i => TS(i, "t", 0.0)).toDS())
    assert(r.isLeft && r.left.toOption.get.messages.size == 10)
  }

  test("S1 insert: two racing writer processes both land (CAS retry)") {
    // two INSTANCES on one path = the cross-process shape (per-instance
    // locks don't serialize them); the loser of the manifest
    // put-if-absent must rebase on the winner's published state and
    // re-commit, so BOTH batches are visible afterwards
    val path = Files.createTempDirectory("graft-store-race").toString
    val a = new TimeSeriesStore(spark, path)
    val b = new TimeSeriesStore(spark, path)
    a.insert(base.toDS())
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a.insert(Seq(TS(100L, "ra", 1.0), TS(101L, "ra", 2.0)).toDS()))
    val fb = Future(b.insert(Seq(TS(200L, "rb", 3.0), TS(201L, "rb", 4.0)).toDS()))
    assert(Await.result(fa, 120.seconds).isRight)
    assert(Await.result(fb, 120.seconds).isRight)
    // a FRESH reader sees base + both racing batches
    val seen = new TimeSeriesStore(spark, path).current()
      .select("timestamp").as[Long].collect().toSet
    assert(seen == Set(1L, 2L, 3L, 100L, 101L, 200L, 201L))

    // and a racing insert that conflicts with the winner's keys is
    // REJECTED on retry, not blindly committed
    val c = new TimeSeriesStore(spark, path)
    val r = c.insert(Seq(TS(100L, "ra", 9.9)).toDS())
    assert(r.isLeft)
    assert(r.left.toOption.get.messages
      .contains("Timestamp = 100 and tag = \"ra\" already exists."))
  }

  test("S2 update: values change, keys unchanged; missing key rejects batch") {
    val st = freshStore()
    st.insert(base.toDS())
    assert(st.update(Seq(TS(1L, "a", 100.0)).toDS()).isRight)
    val rows = st.current().filter($"timestamp" === 1L && $"tag" === "a").collect()
    assert(rows.head.getDouble(2) == 100.0)
    assert(st.current().count() == 4)
    val bad = st.update(Seq(TS(2L, "a", 5.0), TS(99L, "q", 5.0)).toDS())
    assert(bad.isLeft)
    // and the valid part of the rejected batch was NOT applied:
    assert(st.current().filter($"timestamp" === 2L).head().getDouble(2) == 2.0)
  }

  test("S3 delete: rows removed, rest queryable; missing key rejects batch") {
    val st = freshStore()
    st.insert(base.toDS())
    assert(st.delete(Seq(TSKey(1L, "a")).toDS()).isRight)
    assert(st.current().count() == 3)
    assert(st.current().filter($"timestamp" === 1L && $"tag" === "a").isEmpty)
    // query-after-delete through the engine (reference's intended semantics)
    val q = QueryEngine.compile(st.current(), QueryModel(aggFunc = Some(Agg.Sum)))
    assert(q.collect().head.getDouble(0) == 9.0)
    assert(st.delete(Seq(TSKey(1L, "a")).toDS()).isLeft) // already gone
  }

  test("S4 truncate resets to empty; store remains usable") {
    val st = freshStore()
    st.insert(base.toDS())
    st.truncate()
    assert(st.current().count() == 0)
    assert(st.insert(Seq(TS(1L, "a", 1.0)).toDS()).isRight)
    assert(st.current().count() == 1)
  }

  test("S7 durability: reopening the same path sees committed data") {
    val dir = Files.createTempDirectory("graft-durable").toString
    val st = new TimeSeriesStore(spark, dir)
    st.insert(base.toDS())
    st.delete(Seq(TSKey(3L, "c")).toDS())
    val reopened = new TimeSeriesStore(spark, dir)
    assert(reopened.current().count() == 3)
  }

  test("S6 export: query result round-trips through JSON files") {
    val st = freshStore()
    st.insert(base.toDS())
    val out = Files.createTempDirectory("graft-export").toString + "/result"
    QueryEngine.compile(st.current(), QueryModel()).write.json(out)
    val back = spark.read.json(out)
    assert(back.count() == 4)
    assert(back.columns.sorted.toSeq == Seq("tag", "timestamp", "value"))
  }

  test("time-range queries prune day partitions (directory-level skipping)") {
    val st = freshStore()
    val twoDays = Seq(TS(1000L, "a", 1.0), TS(86400000L + 1000L, "a", 2.0),
      TS(3 * 86400000L, "b", 3.0))
    st.insert(twoDays.toDS())
    val qm = QueryModel(ge = Some(86400000L), lt = Some(2 * 86400000L))
    val df = QueryEngine.compile(st.current(), qm)
    assert(df.collect().map(_.getDouble(2)).toSeq == Seq(2.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("g_day"),
      s"expected g_day partition filters in plan:\n$plan")
  }

  test("compaction merges segments without changing data; old readers unaffected") {
    val st = freshStore()
    st.insert(Seq(TS(1L, "a", 1.0)).toDS())
    st.insert(Seq(TS(2L, "a", 2.0)).toDS())
    st.insert(Seq(TS(3L, "a", 3.0)).toDS())
    assert(st.segmentCount == 3)
    val before = st.current()
    st.compact()
    assert(st.segmentCount == 1)
    assert(st.current().select("timestamp").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(before.count() == 3) // pre-compaction snapshot still reads
  }

  test("append pressure: 50 batches, compact() bounds the segment fan-in, data intact") {
    val st = freshStore()
    (1 to 50).foreach { i =>
      assert(st.insert(Seq(TS(i * 1000L, "p", i.toDouble)).toDS()).isRight)
    }
    assert(st.segmentCount == 50)
    def timedCount(): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = st.current().count()
      (n, (System.nanoTime() - t0) / 1e6)
    }
    val (nBefore, msBefore) = timedCount()
    st.compact()
    assert(st.segmentCount == 1) // fan-in bound restored
    val (nAfter, msAfter) = timedCount()
    assert(nBefore == 50 && nAfter == 50)
    assert(st.current().agg(org.apache.spark.sql.functions.sum($"value"))
      .head().getDouble(0) == (1 to 50).sum.toDouble)
    info(f"read latency over 50 segments: $msBefore%.0f ms; after compact: $msAfter%.0f ms")
    // further mutation on the compacted store still works
    assert(st.update(Seq(TS(1000L, "p", 0.0)).toDS()).isRight)
    assert(st.segmentCount == 1)
  }

  test("partition-scoped mutation: update touching one day leaves other days' files byte-identical") {
    val dir = Files.createTempDirectory("graft-partscope")
    val st = new TimeSeriesStore(spark, dir.toString)
    val D = 86400000L
    // three days across two insert batches (two segments)
    st.insert(Seq(TS(10L, "a", 1.0), TS(D + 10L, "a", 2.0)).toDS())
    st.insert(Seq(TS(2 * D + 10L, "b", 3.0)).toDS())

    def dayFiles(day: Long): Map[String, (Long, Array[Byte])] = {
      val glob = Files.walk(dir).iterator().asScala
        .filter(p => p.toString.contains(s"g_day=$day") && p.toString.endsWith(".parquet"))
        .toSeq
      glob.map(p => p.toString -> ((Files.getLastModifiedTime(p).toMillis, Files.readAllBytes(p)))).toMap
    }
    val day0Before = dayFiles(0L)
    val day2Before = dayFiles(2L)
    assert(day0Before.nonEmpty && day2Before.nonEmpty)

    // update a key in day 1 only
    assert(st.update(Seq(TS(D + 10L, "a", 99.0)).toDS()).isRight)

    // days 0 and 2: same files, same mtimes, same bytes — not rewritten
    assert(dayFiles(0L).keySet == day0Before.keySet)
    assert(dayFiles(2L).keySet == day2Before.keySet)
    for ((p, (mt, bytes)) <- day0Before ++ day2Before) {
      assert(Files.getLastModifiedTime(Paths.get(p)).toMillis == mt, s"$p was rewritten")
      assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(p)), bytes))
    }
    // and the data is correct: updated row changed, others intact
    val rows = st.current().orderBy($"timestamp").collect()
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.0, 99.0, 3.0))

    // delete in day 0 leaves days 1 and 2 untouched, day 0 entry gone
    val day1After = dayFiles(1L)
    assert(st.delete(Seq(TSKey(10L, "a")).toDS()).isRight)
    assert(dayFiles(1L).keySet == day1After.keySet)
    assert(st.current().count() == 2)
  }

  test("time travel: versionAsOf reads historical snapshots until vacuumed") {
    val st = freshStore()
    st.insert(Seq(TS(1L, "a", 1.0)).toDS())                      // v0
    st.insert(Seq(TS(2L, "b", 2.0)).toDS())                      // v1
    assert(st.update(Seq(TS(1L, "a", 9.0)).toDS()).isRight)      // v2
    assert(st.versions == Seq(0L, 1L, 2L))
    assert(st.versionAsOf(0).collect().map(_.getDouble(2)).toSeq == Seq(1.0))
    assert(st.versionAsOf(1).count() == 2)
    assert(st.versionAsOf(1).filter($"timestamp" === 1L).head().getDouble(2) == 1.0)
    assert(st.current().filter($"timestamp" === 1L).head().getDouble(2) == 9.0)
    st.vacuum(0)
    assert(st.versions == Seq(2L)) // history reaped
    val err = intercept[IllegalArgumentException](st.versionAsOf(0))
    assert(err.getMessage.contains("vacuum"))
  }

  test("vacuum reaps unreachable segments, orphan day dirs and old manifests") {
    val dir = Files.createTempDirectory("graft-vacuum")
    val st = new TimeSeriesStore(spark, dir.toString)
    val D = 86400000L
    st.insert(Seq(TS(10L, "a", 1.0), TS(D + 10L, "a", 2.0)).toDS())
    st.insert(Seq(TS(20L, "b", 3.0)).toDS())
    // update day 1 => old seg keeps day 0 live, its day 1 dir is orphaned
    assert(st.update(Seq(TS(D + 10L, "a", 99.0)).toDS()).isRight)
    st.compact() // both pre-compaction segments now fully unreachable
    // File#list, not Files.list: no stream to close, no leaked dir fd
    def segDirs = dir.toFile.list().toSeq.filter(_.startsWith("seg-"))
    def manifests = dir.toFile.list().toSeq.filter(_.endsWith(".manifest"))
    assert(segDirs.size == 4 && manifests.size == 4) // garbage accumulated
    val removed = st.vacuum(0)
    assert(removed > 0)
    assert(segDirs.size == 1 && manifests.size == 1) // only live state left
    // data unharmed, store still mutable
    assert(st.current().orderBy($"timestamp").collect().map(_.getDouble(2)).toSeq
      == Seq(1.0, 3.0, 99.0))
    assert(st.insert(Seq(TS(5L, "z", 7.0)).toDS()).isRight)
    assert(st.current().count() == 4)
    assert(st.vacuum(0) == 1) // just the manifest the insert superseded
    assert(st.vacuum(0) == 0) // nothing unreachable => no-op
  }

  test("commit skips a foreign/orphan manifest (never deletes it); vacuum reaps it later") {
    val dir = Files.createTempDirectory("graft-orphan")
    val st = new TimeSeriesStore(spark, dir.toString)
    st.insert(Seq(TS(1L, "a", 1.0)).toDS()) // v0, CURRENT=v0
    // simulate the cross-process race window: another writer (or a
    // crashed commit) moved v1.manifest into place but never swapped
    // CURRENT — the next commit must step past it, not destroy it
    val foreign = dir.resolve("v1.manifest")
    Files.writeString(foreign, "seg-foreign/g_day=0")
    // FRESH orphan: indistinguishable from a live writer mid-swap, so
    // insert refuses to rebase over it (loud, not a silent drop)
    val stuck = intercept[IllegalStateException](
      st.insert(Seq(TS(2L, "b", 2.0)).toDS()))
    assert(stuck.getMessage.contains("CURRENT never advanced"))
    // STALE orphan (past the grace window): a crashed commit — skipped
    Files.setLastModifiedTime(foreign,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 600000L))
    assert(st.insert(Seq(TS(2L, "b", 2.0)).toDS()).isRight)
    assert(Files.readString(foreign) == "seg-foreign/g_day=0") // untouched
    assert(Files.readString(dir.resolve("CURRENT")).trim == "v2.manifest")
    assert(st.current().count() == 2)
    // a manifest whose segment is gone fails with the documented
    // message, not an opaque path error
    val err = intercept[IllegalArgumentException](st.versionAsOf(1))
    assert(err.getMessage.contains("vacuum"))
    // once superseded, the unreachable orphan is vacuum's to reap
    st.vacuum(0)
    assert(!Files.exists(foreign))
    assert(st.current().count() == 2)
  }

  test("versionAsOf fails loudly when a referenced DAY partition was reaped") {
    // vacuum reaps single orphaned day dirs inside live segments; a
    // historical manifest that references such a day must error with
    // the documented message, never silently return partial data
    val dir = Files.createTempDirectory("graft-partial-history")
    val st = new TimeSeriesStore(spark, dir.toString)
    val D = 86400000L
    st.insert(Seq(TS(10L, "a", 1.0), TS(D + 10L, "a", 2.0)).toDS()) // v0: days 0,1
    assert(st.update(Seq(TS(D + 10L, "a", 9.0)).toDS()).isRight)    // v1 rewrites day 1
    // reap ONLY the now-orphaned day-1 dir of the original segment
    // (simulating a vacuum whose retention spared the v0 manifest)
    val orphan = Files.walk(dir).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString == "g_day=1")
      .toSeq.minBy(p => Files.getLastModifiedTime(p).toMillis)
    val walk = Files.walk(orphan)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { Files.delete(f); () })
    finally walk.close()
    val err = intercept[IllegalArgumentException](st.versionAsOf(0))
    assert(err.getMessage.contains("vacuum"))
    assert(st.current().count() == 2) // the live snapshot is unaffected
  }

  test("vacuum retention: a fresh in-flight commit survives, aged garbage is reaped") {
    val dir = Files.createTempDirectory("graft-retention")
    val st = new TimeSeriesStore(spark, dir.toString)
    st.insert(Seq(TS(1L, "a", 1.0)).toDS())
    st.insert(Seq(TS(2L, "b", 2.0)).toDS())
    st.compact() // leaves two unreferenced segments + superseded manifests
    // simulate a concurrent writer mid-commit: segment written, manifest
    // moved, CURRENT not yet swapped — everything seconds old
    val inflightSeg = dir.resolve("seg-inflight")
    Files.createDirectories(inflightSeg.resolve("g_day=0"))
    Files.writeString(inflightSeg.resolve("g_day=0").resolve("part-0.parquet"), "x")
    val inflightManifest = dir.resolve("v99.manifest")
    Files.writeString(inflightManifest, "seg-inflight/g_day=0")
    // age only the legitimate garbage past the retention window
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 7200000L)
    dir.toFile.list().filter(_ != "CURRENT").foreach { n =>
      if (n != "seg-inflight" && n != "v99.manifest")
        Files.setLastModifiedTime(dir.resolve(n), old)
    }
    val removed = st.vacuum(3600000L)
    assert(removed > 0) // aged unreferenced segments + manifests reaped
    assert(Files.exists(inflightSeg.resolve("g_day=0").resolve("part-0.parquet")),
      "in-flight segment was reaped inside the retention window")
    assert(Files.exists(inflightManifest),
      "in-flight manifest was reaped inside the retention window")
    assert(st.current().count() == 2) // live data untouched
    // the in-flight writer could still swap CURRENT and be fully intact;
    // and a later zero-retention pass is what reaps abandoned leftovers
    assert(st.vacuum(0) > 0)
    assert(!Files.exists(inflightSeg))
  }

  test("snapshot isolation: a pre-mutation DataFrame keeps its manifest") {
    val st = freshStore()
    st.insert(base.toDS())
    val before = st.current()
    st.insert(Seq(TS(50L, "z", 0.0)).toDS())
    assert(before.count() == 4)
    assert(st.current().count() == 5)
  }
}

package graft

import graft.engine.{ContinuousAggregate, QueryEngine, TagBloom, TimeSeriesStore}
import graft.model._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.util.Random

/** Partition-level tag index (TagBloom sidecars +
  * [[TimeSeriesStore.currentForTag]]) — the physical rebuild of the
  * reference's `_sIx` tag index (Model.hs:92) at 100 TB granularity.
  *
  * The load-bearing law: pruning is INVISIBLE — `currentForTag(t)` is
  * row-identical to `current().filter(tag === t)` for every tag,
  * present or absent, under the full mutation walk (insert / update /
  * delete / compact / dropDaysBefore), because blooms have no false
  * negatives. Effectiveness (fewer partitions opened) is asserted
  * separately so a silent prune-nothing regression fails loudly.
  */
class TagPruneSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L

  private def freshStore(): TimeSeriesStore =
    new TimeSeriesStore(spark, Files.createTempDirectory("graft-tagprune").toString)

  /** Episodic corpus: each tag lives in its own narrow day window —
    * the shape tag pruning exists for (metrics that come and go). */
  private def episodic(tags: Seq[String], daysPerTag: Int, rowsPerDay: Int): Seq[TS] =
    tags.zipWithIndex.flatMap { case (t, i) =>
      for {
        d <- i * daysPerTag until (i + 1) * daysPerTag
        r <- 0 until rowsPerDay
      } yield TS(d * DAY + r * 1000L + 1, t, (d + r).toDouble)
    }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select("timestamp", "tag", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  /** Files ACTUALLY opened by executing `df` — from scan metrics, after
    * partition pruning (DataFrame.inputFiles ignores partition filters,
    * so it can't witness pruning). */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // executes THIS queryExecution (count() would build a new one)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan) // AQE leaves wrap stages
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  // ---- pure bloom unit laws -------------------------------------------

  test("bloom: no false negatives ever; false positives rare at spec'd load") {
    val rnd = new Random(7)
    val present = (0 until 4000).map(i => s"tag-${rnd.nextLong()}-$i")
    val bloom = new Array[Byte](TagBloom.BYTES)
    present.foreach(t =>
      TagBloom.add(bloom, t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    present.foreach(t => assert(TagBloom.mightContain(bloom, t),
      s"false negative for present tag $t"))
    val absent = (0 until 4000).map(i => s"other-${rnd.nextLong()}-$i")
    val fp = absent.count(TagBloom.mightContain(bloom, _))
    // 4k items in 2^16 bits, k=5 → theoretical fpp ~0.1%; allow 1%
    assert(fp <= 40, s"false-positive rate too high: $fp/4000")
  }

  test("bloom: wrong-size / null sidecar means cannot-prune, never wrong") {
    assert(TagBloom.mightContain(null, "x"))
    assert(TagBloom.mightContain(Array[Byte](1, 2, 3), "x"))
  }

  // ---- pruning invisibility (the law) ---------------------------------

  test("law: currentForTag == current().filter under the full mutation walk") {
    val st = freshStore()
    val tags = Seq("alpha", "beta", "gamma", "delta")
    assert(st.insert(episodic(tags, daysPerTag = 3, rowsPerDay = 5).toDS()).isRight)
    // mutation walk: cross-tag update, delete, a same-day second insert,
    // compact (rewrites every partition), retention drop
    assert(st.update(Seq(TS(0 * DAY + 1, "alpha", 99.0)).toDS()).isRight)
    assert(st.delete(Seq(TSKey(3 * DAY + 1001, "beta")).toDS()).isRight)
    assert(st.insert(Seq(TS(1 * DAY + 777, "late", 7.0)).toDS()).isRight)
    st.compact()
    assert(st.dropDaysBefore(1 * DAY) == 1) // day 0 gone
    for (t <- tags ++ Seq("late", "absent")) {
      // currentForTag is a pruned SNAPSHOT (surviving partitions still
      // hold other tags' rows) — the engine always conjoins the tagEq
      // filter; the law is about the filtered results matching
      val pruned = rowsOf(st.currentForTag(t).filter(col("tag") === t))
      val full = rowsOf(st.current().filter(col("tag") === t))
      assert(pruned == full, s"pruned read diverged for tag $t")
    }
  }

  test("effectiveness: episodic tag opens only its own partitions") {
    val st = freshStore()
    val tags = (0 until 8).map(i => s"t$i")
    assert(st.insert(episodic(tags, daysPerTag = 2, rowsPerDay = 3).toDS()).isRight)
    val (hit, total) = st.partitionCountForTag("t3")
    assert(total == 16, s"expected 16 live partitions, got $total")
    // t3 lives in exactly 2 days; bloom fps could add a couple more
    assert(hit <= 4, s"tag t3 should open ~2 of 16 partitions, opened $hit")
    assert(hit >= 2)
    // the EXECUTED plan opens fewer files, not just the count probe
    // (manifest-level pruning stacks on the g_day isin partition filter)
    val prunedFiles = filesRead(st.currentForTag("t3"))
    val fullFiles = filesRead(st.current())
    assert(prunedFiles < fullFiles,
      s"pruned scan opened $prunedFiles files vs full $fullFiles")
    assert(prunedFiles <= 4, s"episodic tag opened $prunedFiles files")
    // an absent tag prunes everything (modulo fps) and returns empty
    val (absentHit, _) = st.partitionCountForTag("nope")
    assert(absentHit <= 1)
    assert(st.currentForTag("nope").isEmpty)
  }

  test("compaction rewrites sidecars; pruning still effective and exact") {
    val st = freshStore()
    val tags = (0 until 6).map(i => s"c$i")
    assert(st.insert(episodic(tags, daysPerTag = 2, rowsPerDay = 3).toDS()).isRight)
    st.compact()
    assert(st.segmentCount == 1)
    val (hit, total) = st.partitionCountForTag("c2")
    assert(total == 12 && hit <= 4, s"post-compact pruning lost: $hit/$total")
    assert(rowsOf(st.currentForTag("c2").filter(col("tag") === "c2")) ==
      rowsOf(st.current().filter(col("tag") === "c2")))
  }

  test("legacy store (no sidecars): pruning disabled, reads stay exact") {
    val dir = Files.createTempDirectory("graft-tagprune-legacy")
    val st = new TimeSeriesStore(spark, dir.toString)
    assert(st.insert(episodic(Seq("x", "y"), 2, 3).toDS()).isRight)
    // simulate a pre-sidecar store: remove every .tags file on disk
    val walker = Files.walk(dir)
    try {
      val it = walker.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName != null && p.getFileName.toString == ".tags")
          Files.delete(p)
      }
    } finally walker.close()
    // a FRESH instance (no warm bloom cache) must fall back to full scan
    val st2 = new TimeSeriesStore(spark, dir.toString)
    val (hit, total) = st2.partitionCountForTag("x")
    assert(hit == total, "missing sidecars must disable pruning, not break it")
    assert(rowsOf(st2.currentForTag("x").filter(col("tag") === "x")) ==
      rowsOf(st2.current().filter(col("tag") === "x")))
  }

  test("sidecars ride versioned reads: time travel ignores them safely") {
    val st = freshStore()
    assert(st.insert(episodic(Seq("a", "b"), 2, 2).toDS()).isRight)
    val v = st.version
    assert(st.insert(Seq(TS(100 * DAY, "zz", 1.0)).toDS()).isRight)
    // versionAsOf is an unpruned read; sidecar files must not confuse it
    assert(st.versionAsOf(v).count() == 8)
  }

  // ---- engine integration ---------------------------------------------

  test("engine route: tagEq raw fallback goes through the pruned read") {
    val st = freshStore()
    val tags = (0 until 5).map(i => s"e$i")
    assert(st.insert(episodic(tags, 2, 4).toDS()).isRight)
    // collect shape never routes to a rollup → raw fallback with pruning
    val qm = QueryModel(tagEq = Some("e2"))
    val viaEngine = QueryEngine.execute(st, qm, Seq.empty)
      .getOrElse(fail("engine route failed"))
    val viaFull = QueryEngine.execute(st.current(), qm)
      .getOrElse(fail("raw route failed"))
    assert(viaEngine.collect().toSeq == viaFull.collect().toSeq)
    // grouped-by-tag singleton shape too (tagEq guard exercises counts)
    val qmAgg = QueryModel(tagEq = Some("e2"), groupBy = Some(GroupBy.Tag),
      aggFunc = Some(Agg.Sum))
    val aggEngine = QueryEngine.execute(st, qmAgg, Seq.empty)
      .getOrElse(fail("agg engine route failed"))
    val aggFull = QueryEngine.execute(st.current(), qmAgg)
      .getOrElse(fail("agg raw route failed"))
    assert(aggEngine.collect().toSeq == aggFull.collect().toSeq)
  }

  test("engine route: NoData for an absent tag survives total pruning") {
    val st = freshStore()
    assert(st.insert(episodic(Seq("only"), 2, 3).toDS()).isRight)
    val r = QueryEngine.execute(st, QueryModel(tagEq = Some("ghost")), Seq.empty)
    assert(r == Left(QueryError.NoData("No data for tag \"ghost\".")))
  }

  // ---- tsEq point-probe pruning (the _tIx leg) -------------------------

  test("point probe: tsEq opens only same-day partitions whose ts range holds it") {
    val st = freshStore()
    // two same-day segments with DISJOINT intra-day time ranges
    assert(st.insert(Seq(TS(2 * DAY + 1000L, "a", 1.0),
      TS(2 * DAY + 2000L, "b", 2.0)).toDS()).isRight)
    assert(st.insert(Seq(TS(2 * DAY + 9000000L, "a", 3.0)).toDS()).isRight)
    assert(st.insert(Seq(TS(5 * DAY, "a", 4.0)).toDS()).isRight) // other day
    val (hit, total) = st.partitionCountForTs(2 * DAY + 1000L)
    assert(total == 3 && hit == 1, s"point probe opened $hit/$total")
    // exactness: pruned read filtered == full read filtered
    val ts = 2 * DAY + 1000L
    assert(rowsOf(st.currentForTs(ts).filter(col("timestamp") === ts)) ==
      rowsOf(st.current().filter(col("timestamp") === ts)))
    // a within-day MISS (between the two ranges) prunes to nothing
    val (missHit, _) = st.partitionCountForTs(2 * DAY + 500000L)
    assert(missHit == 0)
    assert(st.currentForTs(2 * DAY + 500000L).isEmpty)
  }

  test("engine route: tsEq point lookup and its NoData miss through the pruned read") {
    val st = freshStore()
    assert(st.insert(Seq(TS(DAY + 42L, "x", 7.0), TS(3 * DAY, "y", 8.0)).toDS()).isRight)
    val hitQ = QueryModel(tsEq = Some(DAY + 42L))
    val viaEngine = QueryEngine.execute(st, hitQ, Seq.empty)
      .getOrElse(fail("point route failed"))
    assert(viaEngine.collect().map(_.toSeq).toSeq ==
      Seq(Seq(DAY + 42L, "x", 7.0)))
    // miss inside an existing day → "No data for timestamp" (not tag)
    val r = QueryEngine.execute(st, QueryModel(tsEq = Some(DAY + 43L)), Seq.empty)
    assert(r == Left(graft.model.QueryError.NoData(
      s"No data for timestamp ${DAY + 43L}.")))
    // tagEq+tsEq keeps the TAG-pruned read: a tag that exists elsewhere
    // must yield the timestamp message, not a spurious tag message
    val r2 = QueryEngine.execute(st,
      QueryModel(tsEq = Some(DAY + 43L), tagEq = Some("y")), Seq.empty)
    assert(r2 == Left(graft.model.QueryError.NoData(
      s"No data for timestamp ${DAY + 43L}.")))
  }

  test("engine route: rollup-eligible tagEq shapes still route (pruning only on fallback)") {
    val st = freshStore()
    assert(st.insert(episodic(Seq("r1", "r2"), 2, 4).toDS()).isRight)
    val aggDir = Files.createTempDirectory("graft-tagprune-cagg").toString
    val cagg = new ContinuousAggregate(spark, st, aggDir, DAY)
    cagg.refresh()
    val qm = QueryModel(tagEq = Some("r1"), groupBy = Some(GroupBy.Tag),
      aggFunc = Some(Agg.Sum))
    val routed = QueryEngine.execute(st, qm, Seq(cagg))
      .getOrElse(fail("routed query failed"))
    val raw = QueryEngine.execute(st.current(), qm)
      .getOrElse(fail("raw query failed"))
    assert(routed.collect().toSeq == raw.collect().toSeq)
  }
}

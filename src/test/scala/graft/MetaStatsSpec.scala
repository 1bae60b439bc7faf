package graft

import graft.engine.{MetaStats, QueryEngine, TimeSeriesStore}
import graft.model._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.util.Random

/** Metadata-only scalar aggregates ([[graft.engine.MetaStats]]): the
  * A1 fast path answered from 48-byte per-partition `.stats` sidecars.
  *
  * Laws:
  *  - engine-routed scalar answers == raw-compile answers for every
  *    agg × bound shape (exact for count/min/max; 1e-9 relative for
  *    the reassociated sum/avg) under the full mutation walk;
  *  - a fully day-aligned query executes ZERO file scans;
  *  - unaligned bounds scan ONLY the boundary days;
  *  - missing sidecars demote days to the scan set, never to wrong
  *    answers; the avg-over-nothing error survives the fast path.
  */
class MetaStatsSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L

  private def freshStore(): TimeSeriesStore =
    new TimeSeriesStore(spark, Files.createTempDirectory("graft-metastats").toString)

  private def seeded(days: Int, tags: Seq[String], rowsPerDay: Int,
                     seed: Int = 42): Seq[TS] = {
    val rnd = new Random(seed)
    for {
      d <- 0 until days
      t <- tags
      r <- 0 until rowsPerDay
    } yield TS(d * DAY + rnd.nextInt(86400000).toLong, t,
      math.rint(rnd.nextDouble() * 1000) / 10)
  }

  private val allAggs = Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min, Agg.Max)

  /** Engine answer vs raw-compile answer for one qm, with the
    * documented sum/avg reassociation tolerance. */
  private def checkAgainstRaw(st: TimeSeriesStore, qm: QueryModel): Unit = {
    val viaEngine = QueryEngine.execute(st, qm, Seq.empty)
    val viaRaw = QueryEngine.execute(st.current(), qm)
    (viaEngine, viaRaw) match {
      case (Left(a), Left(b)) => assert(a == b, s"error mismatch for $qm")
      case (Right(a), Right(b)) =>
        val x = a.head().getDouble(0)
        val y = b.head().getDouble(0)
        val ok =
          if (x.isInfinite || y.isInfinite) x == y
          else if (qm.aggFunc.contains(Agg.Sum) || qm.aggFunc.contains(Agg.Avg))
            math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
          else x == y
        assert(ok, s"$qm: engine=$x raw=$y")
      case (a, b) => fail(s"$qm: one path errored: engine=$a raw=$b")
    }
  }

  test("law: metadata answers == raw answers across aggs × bound shapes × mutations") {
    val st = freshStore()
    assert(st.insert(seeded(6, Seq("a", "b", "c"), 20).toDS()).isRight)
    // mutation walk: same-day second insert, update, delete, compact
    assert(st.insert(Seq(TS(2 * DAY + 1, "zz", -5.0)).toDS()).isRight)
    assert(st.update(Seq(TS(2 * DAY + 1, "zz", 77.0)).toDS()).isRight)
    assert(st.delete(Seq(TSKey(2 * DAY + 1, "zz")).toDS()).isRight)
    st.compact()
    val bounds = Seq(
      QueryModel(),                                    // unbounded
      QueryModel(ge = Some(1 * DAY), lt = Some(4 * DAY)),  // aligned
      QueryModel(ge = Some(1 * DAY + 3600000L), lt = Some(4 * DAY)), // left-ragged
      QueryModel(ge = Some(1 * DAY), lt = Some(4 * DAY - 60000L)),   // right-ragged
      QueryModel(gt = Some(2 * DAY - 1), le = Some(5 * DAY - 1)),    // gt/le aligned-ish
      QueryModel(ge = Some(100 * DAY), lt = Some(101 * DAY)),        // empty range
      QueryModel(ge = Some(5 * DAY + 1000L), lt = Some(5 * DAY + 2000L))) // sub-day
    for (b <- bounds; agg <- allAggs)
      checkAgainstRaw(st, b.copy(aggFunc = Some(agg)))
  }

  test("aligned query folds sidecars only: zero file scans, literal plan") {
    val st = freshStore()
    assert(st.insert(seeded(4, Seq("x", "y"), 10).toDS()).isRight)
    val qm = QueryModel(ge = Some(DAY), lt = Some(3 * DAY), aggFunc = Some(Agg.Sum))
    val (acc, scan) = MetaStats.coverage(st, qm).get
    assert(scan.isEmpty, s"aligned bounds must not scan, got $scan")
    assert(acc.rows == 2 * 2 * 10)
    val df = QueryEngine.execute(st, qm, Seq.empty).getOrElse(fail("route failed"))
    assert(df.queryExecution.optimizedPlan.collectLeaves().forall(l =>
      !l.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]),
      "metadata answer must not carry a file relation")
  }

  test("unaligned bounds scan exactly the boundary days") {
    val st = freshStore()
    assert(st.insert(seeded(10, Seq("x"), 8).toDS()).isRight)
    val qm = QueryModel(ge = Some(2 * DAY + 5000L), lt = Some(7 * DAY - 5000L),
      aggFunc = Some(Agg.Count))
    val (_, scan) = MetaStats.coverage(st, qm).get
    assert(scan == Set(2L, 6L), s"expected boundary days {2, 6}, got $scan")
    checkAgainstRaw(st, qm)
  }

  test("ineligible shapes return None: tagEq, tsEq, grouped, collect") {
    val st = freshStore()
    assert(st.insert(seeded(2, Seq("x"), 3).toDS()).isRight)
    assert(MetaStats.coverage(st,
      QueryModel(tagEq = Some("x"), aggFunc = Some(Agg.Sum))).isEmpty)
    assert(MetaStats.coverage(st,
      QueryModel(tsEq = Some(DAY), aggFunc = Some(Agg.Sum))).isEmpty)
    assert(MetaStats.coverage(st, QueryModel(aggFunc = Some(Agg.Sum),
      groupBy = Some(GroupBy.Tag))).isEmpty)
    assert(MetaStats.coverage(st, QueryModel()).isEmpty) // collect
  }

  test("avg over an empty aligned range errors without any scan") {
    val st = freshStore()
    assert(st.insert(seeded(2, Seq("x"), 3).toDS()).isRight)
    val qm = QueryModel(ge = Some(50 * DAY), lt = Some(51 * DAY),
      aggFunc = Some(Agg.Avg))
    val (_, scan) = MetaStats.coverage(st, qm).get
    assert(scan.isEmpty)
    assert(QueryEngine.execute(st, qm, Seq.empty) == Left(QueryError.EmptyAverage))
    // and the non-avg empty-range identities match compile's coalesces
    checkAgainstRaw(st, qm.copy(aggFunc = Some(Agg.Count))) // 0.0
    checkAgainstRaw(st, qm.copy(aggFunc = Some(Agg.Min)))   // +Inf
    checkAgainstRaw(st, qm.copy(aggFunc = Some(Agg.Max)))   // -Inf
    checkAgainstRaw(st, qm.copy(aggFunc = Some(Agg.Sum)))   // 0.0
  }

  test("missing .stats sidecar demotes its day to the scan set, stays exact") {
    val dir = Files.createTempDirectory("graft-metastats-legacy")
    val st = new TimeSeriesStore(spark, dir.toString)
    assert(st.insert(seeded(4, Seq("x"), 5).toDS()).isRight)
    // strip day 1's sidecar on disk (a pre-sidecar segment's shape)
    val walker = Files.walk(dir)
    try {
      val it = walker.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName != null && p.getFileName.toString == ".stats" &&
            p.getParent.getFileName.toString == "g_day=1")
          Files.delete(p)
      }
    } finally walker.close()
    val st2 = new TimeSeriesStore(spark, dir.toString) // cold caches
    val qm = QueryModel(ge = Some(0L), lt = Some(4 * DAY), aggFunc = Some(Agg.Sum))
    val (_, scan) = MetaStats.coverage(st2, qm).get
    assert(scan == Set(1L), s"statless day must be scanned, got $scan")
    checkAgainstRaw(st2, qm)
  }

  test("same-day split entries: one statless entry scans the WHOLE day once") {
    val dir = Files.createTempDirectory("graft-metastats-split")
    val st = new TimeSeriesStore(spark, dir.toString)
    assert(st.insert(Seq(TS(DAY + 1, "x", 1.0), TS(DAY + 2, "x", 2.0)).toDS()).isRight)
    assert(st.insert(Seq(TS(DAY + 3, "y", 10.0)).toDS()).isRight) // second entry, same day
    // remove ONE of the day's two sidecars
    val walker = Files.walk(dir)
    var removedOne = false
    try {
      val it = walker.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (!removedOne && p.getFileName != null &&
            p.getFileName.toString == ".stats") {
          Files.delete(p); removedOne = true
        }
      }
    } finally walker.close()
    assert(removedOne)
    val st2 = new TimeSeriesStore(spark, dir.toString)
    val qm = QueryModel(aggFunc = Some(Agg.Sum))
    val (acc, scan) = MetaStats.coverage(st2, qm).get
    // the day must be ENTIRELY in the scan set — folding the surviving
    // sidecar AND scanning the day would double-count it
    assert(scan == Set(1L) && acc.rows == 0L,
      s"split day must scan whole: acc=$acc scan=$scan")
    val sum = QueryEngine.execute(st2, qm, Seq.empty)
      .getOrElse(fail("route failed")).head().getDouble(0)
    assert(math.abs(sum - 13.0) < 1e-12, s"double-counted? sum=$sum")
  }

  test("Long.MaxValue edges never wrap: gt MAX is empty, le MAX is unbounded") {
    val st = freshStore()
    assert(st.insert(seeded(2, Seq("x"), 3).toDS()).isRight)
    val (accG, scanG) = MetaStats.coverage(st,
      QueryModel(gt = Some(Long.MaxValue), aggFunc = Some(Agg.Count))).get
    assert(accG.rows == 0L && scanG.isEmpty)
    val (accL, scanL) = MetaStats.coverage(st,
      QueryModel(le = Some(Long.MaxValue), aggFunc = Some(Agg.Count))).get
    assert(scanL.isEmpty && accL.rows == 6L)
  }
}

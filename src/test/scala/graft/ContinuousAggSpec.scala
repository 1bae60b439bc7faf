package graft

import graft.engine.{ContinuousAggregate, TimeSeriesStore}
import graft.model._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Continuous aggregate + retention-policy laws: the rollup always
  * equals a from-scratch recompute of the store's current state, and
  * the incremental refresh recomputes ONLY manifest-diff-changed days.
  */
class ContinuousAggSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L

  private def fresh(): (TimeSeriesStore, ContinuousAggregate) = {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg").toString)
    (st, agg)
  }

  /** Ground truth: the same rollup shape computed from scratch. */
  private def recompute(st: TimeSeriesStore) =
    st.current().groupBy(col("g_day"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))

  private def shape(df: org.apache.spark.sql.DataFrame) = df
    .select("g_day", "tag", "cnt", "sum_val", "min_val", "max_val")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5)))
    .sortBy(t => (t._1, t._2)).toSeq

  private def day(d: Long, offs: Long = 0L): Long = d * DAY + offs

  test("cagg: first refresh is full; rollup == from-scratch recompute") {
    val (st, agg) = fresh()
    st.insert(Seq(TS(day(0), "a", 1.0), TS(day(0, 5), "a", 3.0),
      TS(day(1), "b", 2.0), TS(day(2), "a", 7.0)).toDS())
    val s = agg.refresh()
    assert(s.full && s.recomputedDays == 3 && s.carriedDays == 0)
    assert(shape(agg.read()) == shape(recompute(st)))
  }

  test("cagg: incremental refresh recomputes only the changed days, carries the rest") {
    val (st, agg) = fresh()
    st.insert((0L until 5L).map(d => TS(day(d), "a", d.toDouble)).toDS())
    agg.refresh()
    // touch day 1 (update) and day 5 (insert); days 0, 2, 3, 4 untouched
    assert(st.update(Seq(TS(day(1), "a", 99.0)).toDS()).isRight)
    assert(st.insert(Seq(TS(day(5), "z", 5.0)).toDS()).isRight)
    val s = agg.refresh()
    assert(!s.full, "manifest diff must not degrade to full recompute")
    assert(s.recomputedDays == 2, s"expected 2 recomputed days, got $s")
    assert(s.carriedDays == 4)
    assert(shape(agg.read()) == shape(recompute(st)))
    // an unchanged store version is a no-op
    val s2 = agg.refresh()
    assert(s2.recomputedDays == 0 && s2.carriedDays == 6)
  }

  test("cagg: a fully-deleted day drops out of the rollup") {
    val (st, agg) = fresh()
    st.insert(Seq(TS(day(0), "a", 1.0), TS(day(1), "b", 2.0)).toDS())
    agg.refresh()
    assert(st.delete(Seq(TSKey(day(1), "b")).toDS()).isRight)
    agg.refresh()
    assert(shape(agg.read()) == shape(recompute(st)))
    assert(agg.read().select("g_day").as[Long].collect().toSet == Set(0L))
  }

  test("cagg: store compact carries content ids => refresh recomputes NOTHING, still exact") {
    val (st, agg) = fresh()
    st.insert(Seq(TS(day(0), "a", 1.0), TS(day(0, 9), "a", 4.0)).toDS())
    st.insert(Seq(TS(day(0, 5), "c", 3.0), TS(day(1), "b", 2.0)).toDS())
    agg.refresh()
    // compaction moves bytes without changing them; the content tokens
    // carried in the manifest let the diff tell MOVED from CHANGED
    st.compact()
    val s = agg.refresh()
    assert(!s.full && s.recomputedDays == 0 && s.carriedDays == 2,
      s"compact must be diff-invisible, got $s")
    assert(shape(agg.read()) == shape(recompute(st)))
    // a REAL mutation after the compact is still day-scoped
    assert(st.insert(Seq(TS(day(1, 7), "b", 9.0)).toDS()).isRight)
    val s2 = agg.refresh()
    assert(!s2.full && s2.recomputedDays == 1 && s2.carriedDays == 1)
    assert(shape(agg.read()) == shape(recompute(st)))
    // and a second compact (re-combining combined tokens) stays
    // canonical: refresh after it again recomputes nothing
    st.compact()
    val s3 = agg.refresh()
    assert(s3.recomputedDays == 0 && s3.carriedDays == 2, s"got $s3")
  }

  test("rollup rewrite: every eligible QueryModel answers identically to the raw compile") {
    import graft.engine.QueryEngine
    import graft.model._
    val (st, agg) = fresh()
    // integer values => per-day partial sums refold exactly, so the
    // rollup answer must equal the raw answer bit-for-bit
    st.insert((for (d <- 0L until 4L; i <- 0L until 3L; t <- Seq("a", "b"))
      yield TS(day(d, i * 1000 + t.hashCode.abs % 7), t, (d * 10 + i).toDouble))
      .distinct.toDS())
    agg.refresh()
    val aggs = Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min, Agg.Max)
    val models =
      aggs.map(a => QueryModel(aggFunc = Some(a))) ++                       // scalar, full
      aggs.map(a => QueryModel(ge = Some(day(1)), lt = Some(day(3)),
        aggFunc = Some(a))) ++                                              // scalar, day range
      aggs.map(a => QueryModel(tagEq = Some("a"), aggFunc = Some(a))) ++    // scalar, tag slice
      aggs.map(a => QueryModel(aggFunc = Some(a),
        groupBy = Some(GroupBy.Tag))) ++                                    // grouped
      aggs.map(a => QueryModel(ge = Some(day(2)), aggFunc = Some(a),
        groupBy = Some(GroupBy.Tag), limit = Some(1))) ++                   // grouped + limit
      // tagEq singleton over an EMPTY day range: the mempty-fold law
      aggs.map(a => QueryModel(ge = Some(day(9)), lt = Some(day(10)),
        tagEq = Some("a"), aggFunc = Some(a), groupBy = Some(GroupBy.Tag)))
    models.foreach { qm =>
      val viaRollup = agg.answer(qm)
      assert(viaRollup.isDefined, s"expected rollup-answerable: $qm")
      val got = viaRollup.get.collect().map(_.toSeq).toSeq
      val want = QueryEngine.compile(st.current(), qm).collect().map(_.toSeq).toSeq
      assert(got == want, s"rollup answer diverged for $qm: got=$got want=$want")
    }
    // ineligible shapes fall through to the raw path
    assert(agg.answer(QueryModel(tsEq = Some(day(1)),
      aggFunc = Some(Agg.Count))).isEmpty)               // point lookup
    assert(agg.answer(QueryModel(ge = Some(day(1) + 1),
      aggFunc = Some(Agg.Count))).isEmpty)               // unaligned bound
    assert(agg.answer(QueryModel(gt = Some(day(1)),
      aggFunc = Some(Agg.Count))).isEmpty)               // gt (exclusive ms bound)
    assert(agg.answer(QueryModel(aggFunc = Some(Agg.Count),
      groupBy = Some(GroupBy.Timestamp))).isEmpty)       // ms-granular grouping
    assert(agg.answer(QueryModel()).isEmpty)             // collect shape
  }

  test("hourly cagg: bucket grain below the day refresh unit, same incremental cost model") {
    import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
    import graft.model._
    val HOUR = 3600000L
    val st = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-cagg-store-h").toString)
    val agg = new ContinuousAggregate(spark, st,
      java.nio.file.Files.createTempDirectory("graft-cagg-h").toString,
      bucketMs = HOUR)
    // integer values spread over hours 0, 5, 23 of 3 days => refolds exact
    st.insert((for (d <- 0L until 3L; h <- Seq(0L, 5L, 23L); t <- Seq("a", "b"))
      yield TS(day(d, h * HOUR + t.hashCode.abs % 97), t, (d * 24 + h).toDouble))
      .distinct.toDS())
    val s0 = agg.refresh()
    assert(s0.full && s0.recomputedDays == 3)
    // rollup content: one row per (hour bucket, tag)
    assert(agg.read().count() == 3 * 3 * 2)
    // hour-aligned SUB-DAY windows are eligible and equal the raw
    // compile — the resolution the daily rollup cannot answer
    val aggsL = Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min, Agg.Max)
    val models =
      aggsL.map(a => QueryModel(ge = Some(day(0, 5 * HOUR)),
        lt = Some(day(1, 6 * HOUR)), aggFunc = Some(a))) ++
      aggsL.map(a => QueryModel(ge = Some(day(1, 23 * HOUR)),
        aggFunc = Some(a), groupBy = Some(GroupBy.Tag))) ++
      aggsL.map(a => QueryModel(lt = Some(day(2)), tagEq = Some("b"),
        aggFunc = Some(a), groupBy = Some(GroupBy.Tag)))
    models.foreach { qm =>
      val viaRollup = agg.answer(qm)
      assert(viaRollup.isDefined, s"expected hourly-rollup-answerable: $qm")
      val got = viaRollup.get.collect().map(_.toSeq).toSeq
      val want = QueryEngine.compile(st.current(), qm).collect().map(_.toSeq).toSeq
      assert(got == want, s"hourly rollup diverged for $qm: got=$got want=$want")
    }
    // sub-hour bound: ineligible at this grain
    assert(agg.answer(QueryModel(ge = Some(day(0, HOUR / 2)),
      aggFunc = Some(Agg.Count))).isEmpty)
    // incremental refresh is still DAY-scoped: touching one hour
    // recomputes that day only, carries the others
    assert(st.insert(Seq(TS(day(1, 11 * HOUR), "c", 1.0)).toDS()).isRight)
    val s1 = agg.refresh()
    assert(!s1.full && s1.recomputedDays == 1 && s1.carriedDays == 2)
    val want = st.current()
      .groupBy((col("timestamp") / HOUR).cast("long") * HOUR, col("tag"))
      .count().count()
    assert(agg.read().count() == want)
    // a bucket that straddles the day refresh unit is rejected loudly
    intercept[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        java.nio.file.Files.createTempDirectory("graft-cagg-bad").toString,
        bucketMs = 7 * HOUR)
    }
    // window refold: any multiple of the bucket grain is answerable
    // from the rollup and equals the raw windowed aggregate
    val W = 6 * HOUR
    val viaRollup = agg.answerWindow(W).get
      .collect().map(_.toSeq).toSeq
    val raw = st.current()
      .groupBy((expr(s"timestamp div $W") * W).as("window_start"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
      .orderBy(col("window_start"), col("tag"))
      .collect().map(_.toSeq).toSeq
    assert(viaRollup == raw, s"window refold diverged: got=$viaRollup want=$raw")
    // a window that straddles buckets falls through to the raw path
    assert(agg.answerWindow(90 * 60000L).isEmpty)
    assert(agg.answerWindow(0L).isEmpty)
  }

  test("randomized law: refresh tracks arbitrary insert/update/delete/compact interleavings") {
    // the house split-equivalence style: a deterministic random walk
    // over the store's whole mutation surface, asserting after EVERY
    // step that the incrementally-maintained rollup equals a
    // from-scratch recompute — and that a compact-only step (data
    // moved, content ids carried) recomputes zero days
    val rnd = new scala.util.Random(20260814L)
    val (st, agg) = fresh()
    var nextId = 0L
    (0 until 18).foreach { i =>
      val op = rnd.nextInt(5)
      op match {
        case 0 =>
          val rows = (0 to rnd.nextInt(3)).map { _ =>
            nextId += 1
            TS(day(rnd.nextInt(5).toLong, nextId), s"t${rnd.nextInt(3)}",
              rnd.nextInt(100).toDouble)
          }
          assert(st.insert(rows.toDS()).isRight)
        case 1 =>
          val keys = st.current().select("timestamp", "tag").collect()
          if (keys.nonEmpty) {
            val k = keys(rnd.nextInt(keys.length))
            assert(st.update(
              Seq(TS(k.getLong(0), k.getString(1), 999.0)).toDS()).isRight)
          }
        case 2 =>
          val keys = st.current().select("timestamp", "tag").collect()
          if (keys.nonEmpty) {
            val k = keys(rnd.nextInt(keys.length))
            assert(st.delete(
              Seq(TSKey(k.getLong(0), k.getString(1))).toDS()).isRight)
          }
        case 3 =>
          // the rollup is current here (refreshed after every step), so
          // a compaction that actually committed must refresh for free
          val v = st.version
          st.compact()
          if (st.version != v)
            assert(agg.refresh().recomputedDays == 0,
              s"compact-only refresh recomputed days at step $i")
        case 4 =>
          // retention interleaves with everything else: a dropped day
          // must surface in the next refresh's diff as a changed day
          // (whose data vanished), never recompute anything, and the
          // rollup must keep matching the RETAINED store
          val v = st.version
          val cutoff = day(rnd.nextInt(4).toLong)
          st.dropDaysBefore(cutoff)
          if (st.version != v)
            assert(agg.refresh().recomputedDays == 0,
              s"drop-only refresh recomputed days at step $i")
      }
      agg.refresh()
      assert(shape(agg.read()) == shape(recompute(st)),
        s"rollup diverged from recompute at step $i (op $op)")
    }
  }

  test("randomized hierarchical law: a daily→3-day pyramid tracks arbitrary mutation walks on the child fast path") {
    // the same walk as the flat law, over a PYRAMID: after every step
    // the child refreshes, then the parent — which must (a) refold the
    // CHILD (fromChild whenever anything recomputed; raw fallback would
    // be silently correct, so it must be loudly absent), and (b) equal
    // a from-scratch recompute of the store at the parent grain.
    // Integer values keep the refolded sums bit-exact.
    val BUCKET = 3 * DAY
    val rnd = new scala.util.Random(20260815L)
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-hierwalk-store").toString)
    val child = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hierwalk-daily").toString)
    val parent = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hierwalk-3d").toString,
      bucketMs = BUCKET, source = Some(child))
    def precompute() = st.current()
      .groupBy((expr(s"timestamp div $BUCKET") * BUCKET).as("bucket_start"),
        col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
    def pshape(df: org.apache.spark.sql.DataFrame) = df
      .select("bucket_start", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    var nextId = 0L
    (0 until 14).foreach { i =>
      val op = rnd.nextInt(4)
      op match {
        case 0 =>
          val rows = (0 to rnd.nextInt(3)).map { _ =>
            nextId += 1
            TS(day(rnd.nextInt(6).toLong, nextId), s"t${rnd.nextInt(3)}",
              rnd.nextInt(100).toDouble)
          }
          assert(st.insert(rows.toDS()).isRight)
        case 1 =>
          val keys = st.current().select("timestamp", "tag").collect()
          if (keys.nonEmpty) {
            val k = keys(rnd.nextInt(keys.length))
            assert(st.update(
              Seq(TS(k.getLong(0), k.getString(1), 999.0)).toDS()).isRight)
          }
        case 2 =>
          val keys = st.current().select("timestamp", "tag").collect()
          if (keys.nonEmpty) {
            val k = keys(rnd.nextInt(keys.length))
            assert(st.delete(
              Seq(TSKey(k.getLong(0), k.getString(1))).toDS()).isRight)
          }
        case 3 =>
          st.compact()
      }
      child.refresh()
      val s = parent.refresh()
      assert(s.recomputedDays == 0 || s.fromChild,
        s"parent fell back to raw with a CURRENT child at step $i (op $op): $s")
      assert(pshape(parent.read()) == pshape(precompute()),
        s"hierarchical parent diverged from recompute at step $i (op $op)")
    }
  }

  test("cagg rollup maintenance: compact bounds read fan-in; vacuum is age-guarded") {
    val (st, agg) = fresh()
    // one refresh per ingest => one delta segment per refresh, the
    // fan-in growth a long-running per-trigger streaming refresh has
    (0L until 4L).foreach { d =>
      st.insert(Seq(TS(day(d), "a", d.toDouble)).toDS()); agg.refresh()
    }
    assert(agg.segmentCount == 4)
    val before = shape(agg.read())
    val pinned = agg.read()
    agg.compact()
    assert(agg.segmentCount == 1)
    assert(shape(agg.read()) == before)
    // compact kept the reflected store version: refresh is a no-op
    assert(agg.refresh().recomputedDays == 0)
    // age-guarded vacuum removes nothing fresh; a reader pinned to the
    // pre-compact snapshot survives (segments are immutable)
    assert(agg.vacuum() == 0)
    assert(pinned.count() == before.size)
    // zero-retention reaps superseded manifests and the old segments:
    // the pinned pre-compact reader now fails loudly, never silently
    // returning partial data; the current reader is unaffected
    assert(agg.vacuum(0L) > 0)
    intercept[Exception] { pinned.count() }
    assert(shape(agg.read()) == before)
  }

  test("retention: dropDaysBefore is manifest-only, day-granular, time-travel-safe") {
    val (st, agg) = fresh()
    st.insert((0L until 4L).map(d => TS(day(d, 7), "a", d.toDouble)).toDS())
    val vBefore = st.version
    val segsBefore = st.segmentCount
    // cutoff inside day 2: days 0 and 1 drop, day 2's partial day survives
    val dropped = st.dropDaysBefore(day(2, 999))
    assert(dropped == 2)
    assert(st.segmentCount <= segsBefore) // no new segments written
    assert(st.current().select("timestamp").as[Long].collect().toSet ==
      Set(day(2, 7), day(3, 7)))
    // dropped data stays readable at the old version until vacuum
    assert(st.versionAsOf(vBefore).count() == 4)
    // an aligned cutoff keeps its own day
    assert(st.dropDaysBefore(day(3)) == 1)
    assert(st.current().select("timestamp").as[Long].collect().toSet ==
      Set(day(3, 7)))
    // nothing to drop => no new version
    val v = st.version
    assert(st.dropDaysBefore(day(3)) == 0 && st.version == v)
    // the cagg refresh sees the drops as changed days and converges
    agg.refresh()
    assert(shape(agg.read()) == shape(recompute(st)))
  }

  test("weekly cagg: coarser-than-day grain — refresh unit is the bucket, incremental == recompute") {
    import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
    import graft.model._
    val WEEK = 7 * DAY
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-store-w").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-w").toString, bucketMs = WEEK)
    def wshape() = agg.read()
      .select("bucket_start", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).sortBy(t => (t._1, t._2)).toSeq
    def wrecompute() = st.current()
      .groupBy((expr(s"timestamp div $WEEK") * WEEK).as("bucket_start"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).sortBy(t => (t._1, t._2)).toSeq
    // three weeks of data, several days per week, integer values
    st.insert((for (d <- Seq(0L, 2L, 6L, 7L, 9L, 13L, 14L, 20L); t <- Seq("a", "b"))
      yield TS(day(d, t.hashCode.abs % 97), t, (d * 2).toDouble)).toDS())
    val s0 = agg.refresh()
    assert(s0.full && s0.recomputedDays == 3, s"3 week buckets expected: $s0")
    assert(wshape() == wrecompute())
    // stored resolution IS the week: one row per (week, tag)
    assert(agg.read().count() == 3 * 2)
    // the rollup partition label is the bucket's START day
    assert(agg.read().select("g_day").distinct().as[Long].collect().sorted
      .toSeq == Seq(0L, 7L, 14L))
    // touching ONE day recomputes ONE bucket (its week), carries the rest
    assert(st.update(Seq(TS(day(9, "b".hashCode.abs % 97), "b", 999.0)).toDS()).isRight)
    val s1 = agg.refresh()
    assert(!s1.full && s1.recomputedDays == 1 && s1.carriedDays == 2,
      s"one changed day must dirty exactly its week: $s1")
    assert(wshape() == wrecompute())
    // store compact carries content ids across the coarse grain too
    st.compact()
    val s2 = agg.refresh()
    assert(!s2.full && s2.recomputedDays == 0,
      s"compact must recompute nothing at weekly grain: $s2")
    // dropping a PARTIAL week dirties its bucket; the bucket recomputes
    // from its surviving days only
    st.dropDaysBefore(day(2))
    val s3 = agg.refresh()
    assert(!s3.full && s3.recomputedDays == 1,
      s"partial-week drop must recompute that week from surviving days: $s3")
    assert(wshape() == wrecompute())
    // week-aligned queries answer from the rollup and equal raw compile
    val aggsL = Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min, Agg.Max)
    val models =
      aggsL.map(a => QueryModel(ge = Some(WEEK), lt = Some(3 * WEEK),
        aggFunc = Some(a))) ++
      aggsL.map(a => QueryModel(aggFunc = Some(a), groupBy = Some(GroupBy.Tag)))
    models.foreach { qm =>
      val viaRollup = agg.answer(qm)
      assert(viaRollup.isDefined, s"expected weekly-rollup-answerable: $qm")
      assert(viaRollup.get.collect().map(_.toSeq).toSeq ==
        QueryEngine.compile(st.current(), qm).collect().map(_.toSeq).toSeq,
        s"weekly rollup diverged for $qm")
    }
    // day-aligned but not week-aligned: ineligible at this grain
    assert(agg.answer(QueryModel(ge = Some(day(1)),
      aggFunc = Some(Agg.Count))).isEmpty)
    // a 2-week tumbling window refolds; a 10-day one straddles buckets
    assert(agg.answerWindow(2 * WEEK).isDefined)
    assert(agg.answerWindow(10 * DAY).isEmpty)
    // only day divisors/multiples nest with the refresh unit
    intercept[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-cagg-bad-w").toString,
        bucketMs = DAY + DAY / 2)
    }
  }

  test("hierarchical cagg: weekly refreshes FROM the daily rollup — same content as from-raw") {
    val WEEK = 7 * DAY
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-hier-store").toString)
    val child = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hier-daily").toString, bucketMs = DAY)
    val parent = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hier-weekly").toString,
      bucketMs = WEEK, source = Some(child))
    val control = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hier-control").toString, bucketMs = WEEK)
    // every column incl. the first/last witnesses; integer values keep
    // even the sum refold bit-exact
    def all(agg: ContinuousAggregate) = agg.read()
      .select("bucket_start", "tag", "cnt", "sum_val", "min_val", "max_val",
        "first_ts", "first_val", "last_ts", "last_val")
      .collect().map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long],
        r(1).asInstanceOf[String].hashCode)).toSeq
    // three weeks, several points per day so in-day first/last matter
    st.insert((for (d <- Seq(0L, 2L, 6L, 7L, 9L, 13L, 14L, 20L); t <- Seq("a", "b");
                    o <- Seq(0L, 3600000L))
      yield TS(day(d, o + t.hashCode.abs % 97), t, (d * 2 + o / 3600000L).toDouble)).toDS())
    child.refresh()
    val s0 = parent.refresh()
    assert(s0.full && s0.fromChild, s"first refresh should refold the child: $s0")
    control.refresh()
    assert(all(parent) == all(control),
      "child-refolded weekly rollup must equal the from-raw one")
    // touching ONE day: child recomputes that day, parent refolds ONE
    // week from child buckets — never raw events
    assert(st.update(Seq(TS(day(9, 3600000L + "b".hashCode.abs % 97), "b", 999.0)).toDS()).isRight)
    child.refresh()
    val s1 = parent.refresh()
    assert(!s1.full && s1.fromChild && s1.recomputedDays == 1 && s1.carriedDays == 2,
      s"one changed day must refold exactly its week from the child: $s1")
    control.refresh()
    assert(all(parent) == all(control))
    // week-aligned queries through the hierarchical parent == raw compile
    Seq(Agg.Count, Agg.Sum, Agg.Min, Agg.Max).foreach { a =>
      val qm = QueryModel(aggFunc = Some(a), groupBy = Some(GroupBy.Tag))
      assert(parent.answer(qm).get.collect().map(_.toSeq).toSeq ==
        graft.engine.QueryEngine.compile(st.current(), qm).collect().map(_.toSeq).toSeq)
    }
    // STALE child (store moved, child not refreshed): loud raw
    // fallback — fromChild false, content still exact
    assert(st.insert(Seq(TS(day(1), "z", 5.0)).toDS()).isRight)
    val s2 = parent.refresh()
    assert(!s2.fromChild, "a stale child must fall back to raw, not refold stale buckets")
    control.refresh()
    assert(all(parent) == all(control))
    // guards: non-dividing/equal grain, foreign store, frozen child
    intercept[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-hier-bad1").toString,
        bucketMs = WEEK, source = Some(control)) // same grain
    }
    intercept[IllegalArgumentException] {
      val other = new TimeSeriesStore(spark,
        Files.createTempDirectory("graft-hier-other").toString)
      new ContinuousAggregate(spark, other,
        Files.createTempDirectory("graft-hier-bad2").toString,
        bucketMs = WEEK, source = Some(child)) // child of a DIFFERENT store
    }
    intercept[IllegalArgumentException] {
      val frozenChild = new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-hier-frz").toString,
        bucketMs = DAY, freezeBeforeDay = Some(7L))
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-hier-bad3").toString,
        bucketMs = WEEK, source = Some(frozenChild))
    }
  }

  test("statsMode rollup: slope/intercept/r from additive moments == exact integer reference") {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-stats-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-stats-rollup").toString,
      statsMode = true)
    // "lin": exact line in t — v = 1 + 0.5·i at half-day spacing, so it
    // spans five daily buckets; "flat": constant; "one": single instant
    val lin = (0 until 10).map(i =>
      TS(day(0) + i * (DAY / 2), "lin", 1.0 + 0.5 * i))
    val rows = lin ++ Seq(TS(day(0), "flat", 7.0), TS(day(1), "flat", 7.0),
      TS(day(0, 42), "one", 3.5))
    st.insert(rows.toDS()).left.foreach(e =>
      throw new IllegalStateException(e.messages.mkString(",")))
    agg.refresh()

    // exact BigInt reference mirroring the operator's arithmetic
    // (C = 0 for unbounded answers), down to the double casts
    def ref(pts: Seq[(Long, Double)]): (Double, Double, Double) = {
      val n = BigInt(pts.size)
      val t = pts.map(p => BigInt(p._1))
      val v = pts.map(p => BigInt(math.round(p._2 * 100)))
      val stm = t.sum; val sv = v.sum
      val stv = t.zip(v).map { case (a, b) => a * b }.sum
      val st2 = t.map(x => x * x).sum
      val sv2 = v.map(x => x * x).sum
      val num = n * stv - stm * sv
      val denT = n * st2 - stm * stm
      val denV = n * sv2 - sv * sv
      val slopeMs = num.toDouble / denT.toDouble / 100.0
      (slopeMs * 86400000.0,
        sv.toDouble / 100.0 / n.toDouble - slopeMs * (stm.toDouble / n.toDouble),
        num.toDouble / math.sqrt(denT.toDouble * denV.toDouble))
    }
    val got = agg.answerRegression().get.collect()
      .map(r => r.getString(0) -> r).toMap
    val (eSlope, eInt, eR) = ref(lin.map(p => (p.timestamp, p.value)))
    assert(got("lin").getDouble(1) == eSlope && got("lin").getDouble(2) == eInt
      && got("lin").getDouble(3) == eR,
      s"lin: ${got("lin")} vs ($eSlope, $eInt, $eR)")
    assert(math.abs(got("lin").getDouble(3) - 1.0) < 1e-9, "perfect line: r ≈ 1")
    // flat: slope exactly 0, intercept the constant, r NULL (zero v-var)
    assert(got("flat").getDouble(1) == 0.0 && got("flat").getDouble(2) == 7.0
      && got("flat").isNullAt(3))
    // one point: time variance zero => all NULL
    assert(got("one").isNullAt(1) && got("one").isNullAt(2) && got("one").isNullAt(3))

    // window slicing centers on ge: day-1-only window over "lin" (the
    // last 5 points) matches the reference computed over those points
    val sliced = agg.answerRegression(ge = Some(day(1)), lt = Some(day(2)),
      tagEq = Some("lin")).get.collect().head
    val linD1 = lin.filter(_.timestamp >= day(1)).map(p => (p.timestamp, p.value))
    // reference with centering C = ge (shift-invariant slope/r; the
    // intercept is AT the window start by the operator's contract)
    val shifted = linD1.map { case (t, v) => (t - day(1), v) }
    val (s1, i1, r1) = ref(shifted)
    assert(sliced.getDouble(1) == s1 && sliced.getDouble(2) == i1
      && sliced.getDouble(3) == r1)

    // incremental refresh keeps moments exact; hierarchical parent sums
    // them losslessly
    assert(st.insert(Seq(TS(day(6), "lin", 9.0)).toDS()).isRight)
    agg.refresh()
    val got2 = agg.answerRegression().get.collect()
      .map(r => r.getString(0) -> r).toMap
    val withNew = lin.map(p => (p.timestamp, p.value)) :+ (day(6), 9.0)
    val (s2, _, _) = ref(withNew)
    assert(got2("lin").getDouble(1) == s2)
    val weekly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-stats-weekly").toString,
      bucketMs = 7 * DAY, statsMode = true, source = Some(agg))
    assert(weekly.refresh().fromChild)
    val viaWeekly = weekly.answerRegression().get.collect()
      .map(r => r.getString(0) -> r).toMap
    assert(viaWeekly("lin").getDouble(1) == s2,
      "weekly-refolded moments must answer identically")
    // guards: plain rollup declines; unaligned bounds decline; a stats
    // parent over a plain child is rejected
    val plain = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-stats-plain").toString)
    plain.refresh()
    assert(plain.answerRegression().isEmpty)
    assert(agg.answerRegression(ge = Some(5L)).isEmpty)
    intercept[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-stats-bad").toString,
        bucketMs = 7 * DAY, statsMode = true, source = Some(plain))
    }
  }

  test("three-level pyramid: hour → day → week, each level refolds the one below") {
    val HOUR = 3600000L
    val WEEK = 7 * DAY
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-pyr-store").toString)
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-pyr-h").toString, bucketMs = HOUR)
    val daily = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-pyr-d").toString, source = Some(hourly))
    val weekly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-pyr-w").toString,
      bucketMs = WEEK, source = Some(daily))
    st.insert((for (d <- Seq(0L, 3L, 8L); h <- Seq(1L, 5L); t <- Seq("a", "b"))
      yield TS(day(d, h * HOUR + t.hashCode.abs % 50), t, (d + h).toDouble)).toDS())
    hourly.refresh()
    assert(daily.refresh().fromChild)
    assert(weekly.refresh().fromChild)
    val control = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-pyr-ctl").toString, bucketMs = WEEK)
    control.refresh()
    def all(agg: ContinuousAggregate) = agg.read()
      .select("bucket_start", "tag", "cnt", "sum_val", "min_val", "max_val",
        "first_ts", "first_val", "last_ts", "last_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(all(weekly) == all(control),
      "twice-chained refold must equal the from-raw weekly rollup")
    // a mid-level mutation propagates through both links incrementally
    assert(st.update(Seq(TS(day(3, 5 * HOUR + "a".hashCode.abs % 50), "a", 777.0)).toDS()).isRight)
    hourly.refresh()
    assert(daily.refresh().fromChild)
    val sw = weekly.refresh()
    assert(sw.fromChild && sw.recomputedDays == 1)
    control.refresh()
    assert(all(weekly) == all(control))
  }

  test("hierarchical counter cagg: child-boundary pairs re-derive from witnesses — exact") {
    val WEEK = 7 * DAY
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-hierc-store").toString)
    val child = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hierc-daily").toString,
      bucketMs = DAY, counterMode = true)
    val parent = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hierc-weekly").toString,
      bucketMs = WEEK, counterMode = true, source = Some(child))
    val control = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-hierc-control").toString,
      bucketMs = WEEK, counterMode = true)
    // counters with resets INSIDE a day, ACROSS days in one week, and
    // ACROSS a missing day (day 3 absent; the day-2 → day-4 pair must
    // re-derive at the week level exactly once)
    st.insert(Seq(
      TS(day(0), "c", 10.0), TS(day(0, 7), "c", 4.0),  // in-day reset
      TS(day(1), "c", 8.0),                            // cross-day rise
      TS(day(2), "c", 2.0),                            // cross-day reset
      TS(day(4), "c", 6.0),                            // across missing day 3
      TS(day(8), "c", 9.0),                            // week 2
      TS(day(0), "g", 1.0), TS(day(9), "g", 3.0)).toDS())
    child.refresh()
    val s0 = parent.refresh()
    assert(s0.fromChild, s"counter parent should refold the child: $s0")
    control.refresh()
    def cshape(agg: ContinuousAggregate) = agg.read()
      .select("bucket_start", "tag", "cnt", "incr", "n_resets", "twsum",
        "first_ts", "first_val", "last_ts", "last_val")
      .collect().map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long],
        r(1).asInstanceOf[String].hashCode)).toSeq
    assert(cshape(parent) == cshape(control),
      "hierarchical counter refold must be bit-exact incl. incr/resets/twsum")
    // the query surfaces agree with the raw operators through the
    // hierarchical parent too
    val viaParent = parent.answerCounterIncrease().get.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    val viaControl = control.answerCounterIncrease().get.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    assert(viaParent == viaControl)
    val twaP = parent.answerTimeWeighted().get.collect().map(_.toSeq).toSeq
    val twaC = control.answerTimeWeighted().get.collect().map(_.toSeq).toSeq
    assert(twaP == twaC)
  }

  test("retention × rewrite law: answer() over a window straddling the cutoff == raw compile over the retained store") {
    import graft.engine.QueryEngine
    import graft.model._
    val (st, agg) = fresh()
    st.insert((0L until 6L).map(d => TS(day(d, 3), "a", d.toDouble * 2))
      .toDS())
    agg.refresh()
    st.dropDaysBefore(day(2))
    agg.refresh()
    // [day 0, day 4) straddles the retention cutoff at day 2: both
    // paths must see ONLY the retained days (2, 3)
    Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min, Agg.Max).foreach { a =>
      val qm = QueryModel(ge = Some(day(0)), lt = Some(day(4)), aggFunc = Some(a))
      val viaRollup = agg.answer(qm)
      assert(viaRollup.isDefined)
      assert(viaRollup.get.collect().map(_.toSeq).toSeq ==
        QueryEngine.compile(st.current(), qm).collect().map(_.toSeq).toSeq,
        s"straddling-window answer diverged for $a")
    }
  }

  test("engine routing: QueryEngine.execute(store, qm, rollups) serves eligible shapes from the rollup") {
    import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
    import graft.model._
    val stPath = Files.createTempDirectory("graft-route-store").toString
    val dailyPath = Files.createTempDirectory("graft-route-daily").toString
    val hourlyPath = Files.createTempDirectory("graft-route-hourly").toString
    val st = new TimeSeriesStore(spark, stPath)
    st.insert((for (d <- 0L until 3L; h <- Seq(0L, 6L); t <- Seq("a", "b"))
      yield TS(day(d, h * 3600000L + t.hashCode.abs % 13), t, (d * 7 + h).toDouble))
      .distinct.toDS())
    val daily = new ContinuousAggregate(spark, st, dailyPath)
    val hourly = new ContinuousAggregate(spark, st, hourlyPath, bucketMs = 3600000L)
    daily.refresh(); hourly.refresh()
    val rollups = Seq(hourly, daily) // registration order must not matter
    def plans(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString

    // eligible + day-aligned: routed, answers == raw path, and the
    // plan reads ONLY rollup segments — specifically the COARSEST
    // eligible grain (daily), which scans 6× fewer rows than hourly
    val dayQm = QueryModel(ge = Some(day(1)), aggFunc = Some(Agg.Sum),
      groupBy = Some(GroupBy.Tag))
    val routed = QueryEngine.execute(st, dayQm, rollups)
    assert(routed.isRight)
    val p = plans(routed.toOption.get)
    assert(p.contains("graft-route-daily"),
      "day-aligned query must route to the coarsest eligible rollup")
    assert(!p.contains("graft-route-store") && !p.contains("graft-route-hourly"),
      s"routed plan must read only the winning rollup's segments")
    assert(routed.toOption.get.collect().map(_.toSeq).toSeq ==
      QueryEngine.execute(st.current(), dayQm).toOption.get
        .collect().map(_.toSeq).toSeq)

    // hour-aligned sub-day window: daily ineligible, hourly wins
    val hourQm = QueryModel(ge = Some(day(0, 6 * 3600000L)),
      lt = Some(day(2)), aggFunc = Some(Agg.Count))
    val routedH = QueryEngine.execute(st, hourQm, rollups)
    val pH = plans(routedH.toOption.get)
    assert(pH.contains("graft-route-hourly") && !pH.contains("graft-route-store"))
    assert(routedH.toOption.get.collect().map(_.toSeq).toSeq ==
      QueryEngine.execute(st.current(), hourQm).toOption.get
        .collect().map(_.toSeq).toSeq)

    // ineligible shape (collect): bit-identical fallthrough to raw
    val collectQm = QueryModel(tagEq = Some("a"), limit = Some(5))
    val viaRoute = QueryEngine.execute(st, collectQm, rollups)
    val viaRaw = QueryEngine.execute(st.current(), collectQm)
    assert(viaRoute.toOption.get.collect().map(_.toSeq).toSeq ==
      viaRaw.toOption.get.collect().map(_.toSeq).toSeq)
    assert(plans(viaRoute.toOption.get).contains("graft-route-store"))

    // error guards run FROM THE ROLLUP on the routed path and match
    // the raw path's semantics exactly
    assert(QueryEngine.execute(st, QueryModel(tagEq = Some("zzz"),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)), rollups) ==
      Left(QueryError.NoData("""No data for tag "zzz".""")))
    assert(QueryEngine.execute(st, QueryModel(ge = Some(day(9)),
      lt = Some(day(10)), aggFunc = Some(Agg.Avg)), rollups) ==
      Left(QueryError.EmptyAverage))
    // tagEq singleton law survives routing: grouped count over an
    // EXISTING tag but empty range yields the mempty row, not NoData
    val singleton = QueryEngine.execute(st, QueryModel(ge = Some(day(9)),
      lt = Some(day(10)), tagEq = Some("a"), aggFunc = Some(Agg.Count),
      groupBy = Some(GroupBy.Tag)), rollups)
    assert(singleton.toOption.get.collect().map(_.toSeq).toSeq ==
      Seq(Seq("a", 0.0)))
    // validation still rejects illegal models before any routing
    assert(QueryEngine.execute(st, QueryModel(gt = Some(1L), ge = Some(2L),
      aggFunc = Some(Agg.Count)), rollups).isLeft)

    // a STALE rollup (store moved past it) serves the REAL-TIME
    // hybrid: carried buckets from the rollup, ONLY the changed day's
    // raw partitions re-aggregated — exact, never a stale answer
    assert(st.insert(Seq(TS(day(2, 999), "c", 42.0)).toDS()).isRight)
    val afterMutation = QueryEngine.execute(st, dayQm, rollups)
    val pM = plans(afterMutation.toOption.get)
    assert(pM.contains("graft-route-daily") && pM.contains("graft-route-store"),
      "stale rollup must serve the hybrid (rollup segments + raw tail)")
    assert(afterMutation.toOption.get.collect().map(_.toSeq).toSeq ==
      QueryEngine.execute(st.current(), dayQm).toOption.get
        .collect().map(_.toSeq).toSeq,
      "real-time hybrid answer must equal the raw path")
    // the raw side of the hybrid touches ONLY the changed day: every
    // store-side FileScan carries a g_day=2 partition filter (inputFiles
    // can't show this — it lists pre-pruning; PartitionFilters is what
    // the scan actually reads)
    val storeScanLines = pM.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft-route-store"))
      .toSeq
    assert(storeScanLines.nonEmpty &&
      storeScanLines.forall(l => l.contains("PartitionFilters") &&
        l.contains("g_day") && l.contains("= 2)")),
      s"hybrid raw scans must be partition-pruned to the changed day:\n${storeScanLines.mkString("\n")}")
    // refresh restores the pure-rollup plan
    daily.refresh()
    val pF = plans(QueryEngine.execute(st, dayQm, rollups).toOption.get)
    assert(pF.contains("graft-route-daily") && !pF.contains("graft-route-store"))
  }

  test("real-time aggregate law: answer()/answerWindow() are exact at ANY rollup staleness") {
    import graft.engine.QueryEngine
    import graft.model._
    val (st, agg) = fresh()
    // before any refresh: no base => None (caller goes raw)
    st.insert((0L until 3L).map(d => TS(day(d, 3), "a", d.toDouble)).toDS())
    assert(agg.answer(QueryModel(aggFunc = Some(Agg.Sum))).isEmpty)
    assert(agg.answerWindow(DAY).isEmpty)
    agg.refresh()
    // a deterministic mutation walk WITHOUT any further refresh: after
    // every step the stale rollup's answers must equal the raw compile
    val aggsL = Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min, Agg.Max)
    def checkAll(label: String): Unit = {
      val models =
        aggsL.map(a => QueryModel(aggFunc = Some(a))) ++
        aggsL.map(a => QueryModel(ge = Some(day(1)), lt = Some(day(4)),
          aggFunc = Some(a), groupBy = Some(GroupBy.Tag))) ++
        Seq(QueryModel(tagEq = Some("a"), aggFunc = Some(Agg.Sum),
          groupBy = Some(GroupBy.Tag)))
      models.foreach { qm =>
        val viaRollup = agg.answer(qm)
        assert(viaRollup.isDefined, s"[$label] expected answerable: $qm")
        assert(viaRollup.get.collect().map(_.toSeq).toSeq ==
          QueryEngine.compile(st.current(), qm).collect().map(_.toSeq).toSeq,
          s"[$label] real-time answer diverged for $qm")
      }
      val win = agg.answerWindow(2 * DAY).get.collect().map(_.toSeq).toSeq
      val raw = st.current()
        .groupBy((expr(s"timestamp div ${2 * DAY}") * 2 * DAY).as("window_start"),
          col("tag"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
          min(col("value")).as("min_val"), max(col("value")).as("max_val"))
        .orderBy(col("window_start"), col("tag"))
        .collect().map(_.toSeq).toSeq
      assert(win == raw, s"[$label] real-time window refold diverged")
    }
    assert(st.insert(Seq(TS(day(3, 9), "b", 30.0), TS(day(0, 99), "a", 7.0))
      .toDS()).isRight)
    checkAll("insert new day + old day")
    assert(st.update(Seq(TS(day(1, 3), "a", 111.0)).toDS()).isRight)
    checkAll("update")
    assert(st.delete(Seq(TSKey(day(2, 3), "a")).toDS()).isRight)
    checkAll("delete")
    st.compact()
    checkAll("compact")
    st.dropDaysBefore(day(1))
    checkAll("dropDaysBefore")
    // the diff base manifest reaped => loud None, never a wrong answer
    st.vacuum(0L)
    assert(agg.answer(QueryModel(aggFunc = Some(Agg.Sum))).isEmpty,
      "vacuumed diff base must disable the rewrite, not mis-answer")
    // a refresh rebuilds the base and re-enables the rewrite
    agg.refresh()
    checkAll("post-vacuum refresh")
  }

  test("frozen history: dropDaysBefore + freezeBeforeDay = downsampling retention") {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-frz-store").toString)
    val rows = for (d <- 0L until 6L; i <- 0 until (d + 1).toInt)
      yield TS(day(d, i * 1000L), if (i % 2 == 0) "a" else "b", d * 10.0 + i)
    assert(st.insert(rows.toDS()).isRight)
    val frozen = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-frz").toString,
      freezeBeforeDay = Some(3L))
    frozen.refresh() // first refresh: frozen units compute (raw present)
    val before = shape(frozen.read())
    // IGNORED MUTATION below the horizon (documented caveat): the
    // frozen rollup is the source of truth there
    assert(st.update(Seq(TS(day(1), "a", 999.0)).toDS()).isRight)
    val sIgn = frozen.refresh()
    assert(sIgn.recomputedDays == 0 && shape(frozen.read()) == before,
      "a frozen-day mutation must not propagate")
    // raw drop below the horizon: history SURVIVES in the rollup
    assert(st.dropDaysBefore(day(3)) == 3)
    val sDrop = frozen.refresh()
    assert(sDrop.recomputedDays == 0 && !sDrop.full)
    assert(shape(frozen.read()) == before,
      "dropped raw days must stay in the frozen rollup")
    // answer() over the full range sees downsampled history + live raw
    val total = frozen.answer(QueryModel(aggFunc = Some(Agg.Count)))
      .get.head().getDouble(0)
    assert(total == rows.size.toDouble,
      s"frozen answer must cover dropped history: $total vs ${rows.size}")
    // an UNfrozen rollup over the same store drops the history (the
    // pre-existing retention law — freeze is what changes it)
    val thawed = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-thaw").toString)
    thawed.refresh()
    val thawedTotal = thawed.answer(QueryModel(aggFunc = Some(Agg.Count)))
      .get.head().getDouble(0)
    assert(thawedTotal == rows.count(_.timestamp >= day(3)).toDouble)
    // REAL-TIME: hot tail above the horizon + frozen history, no refresh
    assert(st.insert(Seq(TS(day(6), "a", 77.0)).toDS()).isRight)
    assert(!frozen.reflectedStoreVersion.contains(st.version))
    val rt = frozen.answer(QueryModel(aggFunc = Some(Agg.Count)))
      .get.head().getDouble(0)
    assert(rt == rows.size.toDouble + 1,
      "hybrid base must union frozen history with the hot tail")
    // FULL-recompute path (reaped diff base): frozen entries still
    // carried — a full recompute can never trust raw for history
    frozen.refresh()
    assert(st.insert(Seq(TS(day(6, 5L), "b", 78.0)).toDS()).isRight)
    st.vacuum(0L) // reaps the reflected manifest — diff base gone
    val sFull = frozen.refresh()
    assert(sFull.full, "reaped diff base must degrade to full")
    val afterFull = frozen.answer(QueryModel(aggFunc = Some(Agg.Count)))
      .get.head().getDouble(0)
    assert(afterFull == rows.size.toDouble + 2,
      "full recompute must carry frozen history, not lose it")
    // a store COMPACT after the drop moves retained bytes but carries
    // content ids — the frozen rollup recomputes nothing and keeps
    // its history through it
    st.compact()
    val sCpt = frozen.refresh()
    assert(sCpt.recomputedDays == 0 && !sCpt.full,
      s"compact must stay diff-invisible to a frozen rollup: $sCpt")
    assert(frozen.answer(QueryModel(aggFunc = Some(Agg.Count)))
      .get.head().getDouble(0) == rows.size.toDouble + 2)
    // coarse grains require an aligned horizon (a straddling bucket
    // would silently lose its below-horizon days on a raw drop)
    assertThrows[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-cagg-frz-bad").toString,
        bucketMs = 7 * DAY, freezeBeforeDay = Some(3L))
    }
    new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-frz-ok").toString,
      bucketMs = 7 * DAY, freezeBeforeDay = Some(7L)) // aligned: fine
  }

  test("randomized frozen-parent pyramid law: frozen weekly over live daily, mutation walk + dropDaysBefore") {
    // Construction forbids a frozen CHILD (the parent's refresh
    // equation would silently change when raw history drops), but a
    // frozen PARENT over a live child is the intended downsampling
    // pyramid: day-grain recent detail, week-grain history that
    // survives retention. The law, held through a randomized mutation
    // walk with a mid-walk dropDaysBefore at the freeze horizon:
    //   (a) parent BELOW the horizon == its first-refresh truth,
    //       forever (frozen units never recompute — mutations there
    //       are documented-ignored, the drop is invisible);
    //   (b) parent ABOVE the horizon == the live child's refold ==
    //       a from-raw recompute at the parent grain (the pyramid
    //       stays exact while its base churns);
    //   (c) whenever the parent recomputes anything it does so from
    //       the CHILD (raw fallback would be silently correct, so it
    //       must be loudly absent).
    val WEEK = 7 * DAY
    val HORIZON_DAY = 7L
    val rnd = new scala.util.Random(20260815L + 10)
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-frzpyr-store").toString)
    val child = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-frzpyr-daily").toString)
    val parent = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-frzpyr-weekly").toString,
      bucketMs = WEEK, source = Some(child),
      freezeBeforeDay = Some(HORIZON_DAY))
    val seed = for (d <- 0L until 14L; i <- 0 until 4)
      yield TS(day(d, i * 1000L), s"t${i % 2}", (d * 10 + i).toDouble)
    assert(st.insert(seed.toDS()).isRight)
    child.refresh()
    assert(parent.refresh().fromChild, "pyramid refresh must use the child")

    def weekShape(df: org.apache.spark.sql.DataFrame,
                  below: Boolean): Seq[Seq[Any]] = df
      .filter(if (below) col("bucket_start") < HORIZON_DAY * DAY
              else col("bucket_start") >= HORIZON_DAY * DAY)
      .select("bucket_start", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val frozenTruth = weekShape(parent.read(), below = true)
    assert(frozenTruth.nonEmpty, "fixture must populate the frozen week")
    def rawAbove() = st.current()
      .filter(col("timestamp") >= HORIZON_DAY * DAY)
      .groupBy((expr(s"timestamp div $WEEK") * WEEK).as("bucket_start"),
        col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
    def childRefoldAbove() = child.read()
      .filter(col("bucket_start") >= HORIZON_DAY * DAY)
      .groupBy((expr(s"bucket_start div $WEEK") * WEEK).as("bucket_start"),
        col("tag"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_val")).as("sum_val"),
        min(col("min_val")).as("min_val"), max(col("max_val")).as("max_val"))

    var nextId = 100L
    val dropAtStep = 5 + rnd.nextInt(4)
    (0 until 12).foreach { i =>
      if (i == dropAtStep) {
        assert(st.dropDaysBefore(day(HORIZON_DAY)) > 0,
          "the drop step must actually drop the frozen week's raw days")
      } else rnd.nextInt(4) match {
        case 0 =>
          // inserts mostly above the horizon; occasionally below, to
          // stress the ignored-mutation path (and post-drop, the
          // recreated-day path) — the frozen week must not move
          val rows = (0 to rnd.nextInt(3)).map { _ =>
            nextId += 1
            val d = if (rnd.nextInt(5) == 0) rnd.nextInt(7).toLong
                    else 7L + rnd.nextInt(9).toLong
            TS(day(d, nextId), s"t${rnd.nextInt(2)}", rnd.nextInt(100).toDouble)
          }
          assert(st.insert(rows.toDS()).isRight)
        case 1 =>
          val keys = st.current().select("timestamp", "tag").collect()
          if (keys.nonEmpty) {
            val k = keys(rnd.nextInt(keys.length))
            assert(st.update(
              Seq(TS(k.getLong(0), k.getString(1), 777.0)).toDS()).isRight)
          }
        case 2 =>
          val keys = st.current().select("timestamp", "tag").collect()
          if (keys.nonEmpty) {
            val k = keys(rnd.nextInt(keys.length))
            assert(st.delete(
              Seq(TSKey(k.getLong(0), k.getString(1))).toDS()).isRight)
          }
        case 3 =>
          st.compact()
      }
      child.refresh()
      val s = parent.refresh()
      assert(s.recomputedDays == 0 || s.fromChild,
        s"frozen parent fell back to raw with a CURRENT child at step $i: $s")
      assert(weekShape(parent.read(), below = true) == frozenTruth,
        s"frozen week moved at step $i (drop was step $dropAtStep)")
      val above = weekShape(parent.read(), below = false)
      assert(above == weekShape(childRefoldAbove(), below = false),
        s"parent != child refold above the horizon at step $i")
      assert(above == weekShape(rawAbove(), below = false),
        s"parent != raw recompute above the horizon at step $i")
    }
    // and the explicit-surface answer() covers dropped history + live:
    // count == frozen week's rows + current above-horizon rows
    val frozenCnt = frozenTruth.map(_(2).asInstanceOf[Long]).sum
    val liveCnt = st.current()
      .filter(col("timestamp") >= HORIZON_DAY * DAY).count()
    val belowRecreated = st.current()
      .filter(col("timestamp") < HORIZON_DAY * DAY).count()
    val total = parent.answer(QueryModel(aggFunc = Some(Agg.Count)))
      .get.head().getDouble(0)
    assert(total == (frozenCnt + liveCnt).toDouble,
      s"frozen-parent answer must be frozen history + live tail: $total " +
        s"vs $frozenCnt + $liveCnt (recreated-below raw rows " +
        s"$belowRecreated are rollup-invisible by design)")
  }

  test("answerCounterIncrease: within-bucket incr + boundary pairs == raw counterRate") {
    val HOUR = 3600000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-ctr-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-ctr").toString, bucketMs = HOUR,
      counterMode = true)
    def h(k: Long, offs: Long): Long = k * HOUR + offs
    // a counter with resets INSIDE buckets and AT bucket boundaries,
    // plus a second tag with a gap (missing bucket) between samples
    val rows = Seq(
      TS(1000L, "a", 10.0), TS(2000L, "a", 25.0),      // h0: +15
      TS(3000L, "a", 5.0),                             // h0: reset -> +5
      TS(h(1, 0), "a", 50.0),                          // boundary: +45
      TS(h(1, 500), "a", 60.0),                        // h1: +10
      TS(h(2, 0), "a", 3.0),                           // boundary reset -> +3
      TS(h(0, 100), "b", 100.0),
      TS(h(3, 0), "b", 40.0))                          // gap + reset -> +40
    assert(st.insert(rows.toDS()).isRight)
    agg.refresh()
    def grab(ge: Option[Long] = None, lt: Option[Long] = None) =
      agg.answerCounterIncrease(ge, lt).get.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    // hand-computed: a: 15+5+45+10+3 = 78, 2 resets, 6 points
    //                b: 40 (reset), 1 reset, 2 points
    assert(grab() == Seq(("a", 78.0, 2L, 6L), ("b", 40.0, 1L, 2L)))
    // law vs the raw operator: counterRate counts identical pairs
    // (its /100 scale and n_points=count+1 shape are fixture-specific;
    // compare increase*100 and resets via its output)
    val raw = graft.operators.TsAnalytics.counterRate(
      st.current().select(col("tag"), col("timestamp"),
        col("value").cast("long").as("counter")))
      .collect().map(r => (r.getString(0), r.getDouble(1) * 100.0, r.getLong(2))).toSeq
    val mine = grab().map(t => (t._1, t._2, t._3))
    assert(mine.map(_._1) == raw.map(_._1) &&
      mine.map(_._3) == raw.map(_._3) &&
      mine.zip(raw).forall { case ((_, m, _), (_, r, _)) =>
        math.abs(m - r) < 1e-9 }, // counterRate's /100 scale round-trips
      s"refold drifted from raw counterRate: $mine vs $raw")
    // slicing drops out-of-window pairs (h1 onward: a's boundary pair
    // into h1 is NOT in the [h1, h3) window — only in-window pairs count)
    assert(grab(ge = Some(h(1, 0)), lt = Some(h(3, 0))) ==
      Seq(("a", 13.0, 1L, 3L))) // +10 within h1, boundary reset +3
    // STALENESS: hot tail without refresh
    assert(st.insert(Seq(TS(h(3, 900), "a", 9.0)).toDS()).isRight)
    assert(!agg.reflectedStoreVersion.contains(st.version))
    assert(grab().head == ("a", 84.0, 2L, 7L), // boundary +6 (3 -> 9)
      s"hybrid counter refold wrong: ${grab().head}")
    // unaligned bounds / non-counter rollup decline
    assert(agg.answerCounterIncrease(ge = Some(5L)).isEmpty)
    val plain = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-ctr-plain").toString)
    plain.refresh()
    assert(plain.answerCounterIncrease().isEmpty)
  }

  test("answerCounterRate: increase/span + reset-blind delta from witnesses — exact") {
    val HOUR = 3600000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-rate-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-rate").toString, bucketMs = HOUR,
      counterMode = true)
    def h(k: Long, offs: Long): Long = k * HOUR + offs
    // same fixture shape as the increase battery: resets inside
    // buckets, at boundaries, and across a missing-bucket gap
    val rows = Seq(
      TS(1000L, "a", 10.0), TS(2000L, "a", 25.0), TS(3000L, "a", 5.0),
      TS(h(1, 0), "a", 50.0), TS(h(1, 500), "a", 60.0), TS(h(2, 0), "a", 3.0),
      TS(h(0, 100), "b", 100.0), TS(h(3, 0), "b", 40.0))
    assert(st.insert(rows.toDS()).isRight)
    agg.refresh()
    def grab(ge: Option[Long] = None, lt: Option[Long] = None) =
      agg.answerCounterRate(ge, lt).get.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3), r.getLong(4))).toSeq
    // hand-computed; rate = increase / span-seconds as ONE IEEE
    // division (the literals below share it bit-for-bit), delta is
    // reset-BLIND last − first, so it goes negative through resets
    assert(grab() == Seq(
      ("a", 78.0 / 7199.0, -7.0, 7199000L, 6L),
      ("b", 40.0 / 10799.9, -60.0, 10799900L, 2L)))
    // window slicing: only in-window pairs and witnesses count
    assert(grab(ge = Some(h(1, 0)), lt = Some(h(3, 0))) ==
      Seq(("a", 13.0 / 3600.0, -47.0, 3600000L, 3L)))
    // single-sample tags are omitted (b has one sample in [0, h1))
    assert(grab(lt = Some(h(1, 0))) == Seq(("a", 20.0 / 2.0, -5.0, 2000L, 3L)))
    // staleness: the hot tail reflects without a refresh (hybrid base)
    assert(st.insert(Seq(TS(h(3, 900), "a", 9.0)).toDS()).isRight)
    assert(!agg.reflectedStoreVersion.contains(st.version))
    assert(grab().head == ("a", 84.0 / 10799.9, -1.0, 10799900L, 7L))
    // declines: unaligned bounds; non-counter rollup
    assert(agg.answerCounterRate(ge = Some(5L)).isEmpty)
    val plain = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-rate-plain").toString)
    plain.refresh()
    assert(plain.answerCounterRate().isEmpty)
  }

  test("answerTimeWeighted: in-bucket areas + boundary areas == raw timeWeightedAvg") {
    val HOUR = 3600000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-twa-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-twa").toString, bucketMs = HOUR,
      counterMode = true)
    // irregular sampling across bucket boundaries + a single-sample
    // tag (must be omitted, like the raw operator) + a bucket gap
    val rows = Seq(
      TS(1000L, "a", 2.5), TS(600000L, "a", 7.25),
      TS(HOUR + 5000L, "a", 1.0),                   // boundary area from 7.25
      TS(3 * HOUR, "a", 4.5),                       // gap: h2 empty
      TS(3 * HOUR + 9000L, "a", 0.75),
      TS(2000L, "b", 10.0), TS(7000L, "b", 30.0),
      TS(500L, "solo", 99.0))
    assert(st.insert(rows.toDS()).isRight)
    agg.refresh()
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    val mine = norm(agg.answerTimeWeighted().get)
    val raw = norm(graft.operators.TsAnalytics.timeWeightedAvg(st.current()
      .select(col("tag"), col("timestamp"), col("value"))))
    assert(mine == raw, s"TWA refold drifted: $mine vs $raw")
    assert(!mine.exists(_._1 == "solo"), "single-sample tag must be omitted")
    // window slicing: only in-window pairs count
    val sliceMine = norm(agg.answerTimeWeighted(ge = Some(0L),
      lt = Some(HOUR)).get)
    val sliceRaw = norm(graft.operators.TsAnalytics.timeWeightedAvg(st.current()
      .filter(col("timestamp") < HOUR)
      .select(col("tag"), col("timestamp"), col("value"))))
    assert(sliceMine == sliceRaw, s"sliced TWA drifted: $sliceMine vs $sliceRaw")
    // staleness: hot tail changes the answer without a refresh
    assert(st.insert(Seq(TS(4 * HOUR, "a", 100.0)).toDS()).isRight)
    assert(!agg.reflectedStoreVersion.contains(st.version))
    val hotMine = norm(agg.answerTimeWeighted().get)
    val hotRaw = norm(graft.operators.TsAnalytics.timeWeightedAvg(st.current()
      .select(col("tag"), col("timestamp"), col("value"))))
    assert(hotMine == hotRaw, s"hybrid TWA drifted: $hotMine vs $hotRaw")
    assert(agg.answerTimeWeighted(ge = Some(7L)).isEmpty)
  }

  test("answerOhlc: open/close refold across buckets via stored first/last (exact)") {
    val HOUR = 3600000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-ohlc-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-ohlc").toString, bucketMs = HOUR)
    // values chosen so open/high/low/close are all DIFFERENT rows, and
    // the daily open/close live in different HOURS than the daily
    // high/low — a per-bucket concatenation or a min/max confusion
    // cannot pass
    val rows = Seq(
      TS(day(0, 2 * HOUR + 7), "a", 50.0),  // day-0 open (earliest)
      TS(day(0, 5 * HOUR), "a", 99.0),      // day-0 high
      TS(day(0, 5 * HOUR + 1), "a", 1.0),   // day-0 low (same hour as high)
      TS(day(0, 21 * HOUR), "a", 60.0),     // day-0 close (latest)
      TS(day(1, 0), "a", 70.0),
      TS(day(1, 23 * HOUR + 5), "a", 80.0),
      TS(day(0, 3 * HOUR), "b", 5.0))
    assert(st.insert(rows.toDS()).isRight)
    agg.refresh()
    def bars(width: Long): Seq[(Long, String, Double, Double, Double, Double)] =
      agg.answerOhlc(width).get.collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // daily bars refold 24 hourly buckets
    assert(bars(DAY) == Seq(
      (day(0), "a", 50.0, 99.0, 1.0, 60.0),
      (day(0), "b", 5.0, 5.0, 5.0, 5.0),
      (day(1), "a", 70.0, 80.0, 70.0, 80.0)))
    // law vs raw at every nesting width: refold == direct OHLC over events
    Seq(HOUR, 6 * HOUR, DAY, 2 * DAY).foreach { w =>
      val raw = st.current()
        .withColumn("window_start", expr(s"timestamp div $w") * w)
        .groupBy(col("window_start"), col("tag"))
        .agg(min_by(col("value"), col("timestamp")).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), col("timestamp")).as("close"))
        .orderBy(col("window_start"), col("tag"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
      assert(bars(w) == raw, s"OHLC refold drifted from raw at width $w")
    }
    // bounds slice + tagEq
    val sliced = agg.answerOhlc(DAY, ge = Some(day(1)), lt = Some(day(2)),
      tagEq = Some("a")).get.collect()
    assert(sliced.length == 1 && sliced.head.getDouble(2) == 70.0 &&
      sliced.head.getDouble(5) == 80.0)
    // STALENESS: a later event moves day-1's close without a refresh
    assert(st.insert(Seq(TS(day(1, 23 * HOUR + 9), "a", 75.5)).toDS()).isRight)
    assert(!agg.reflectedStoreVersion.contains(st.version))
    assert(bars(DAY).last == (day(1), "a", 70.0, 80.0, 70.0, 75.5),
      "hot-tail close must flow through the hybrid base")
    // non-nesting width / unaligned bounds decline
    assert(agg.answerOhlc(90 * 60000L).isEmpty)
    assert(agg.answerOhlc(DAY, ge = Some(5L)).isEmpty)
  }

  test("gapfill: dense grid from the rollup with None/Zero/Locf/Interp fills") {
    import ContinuousAggregate.Fill
    val HOUR = 3600000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cagg-gf-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-cagg-gf").toString, bucketMs = HOUR)
    def h(k: Long, offs: Long = 0L): Long = k * HOUR + offs
    // a: observed hours 0 (x2), 2, 7; b: hours 3, 4 — gaps on both
    // sides and in the middle
    assert(st.insert(Seq(
      TS(h(0), "a", 1.0), TS(h(0, 5), "a", 3.0), TS(h(2), "a", 5.0),
      TS(h(7), "a", 9.0), TS(h(3), "b", 10.0), TS(h(4), "b", 20.0)
    ).toDS()).isRight)
    agg.refresh()

    def grab(fill: Fill, a: Agg, tagEq: Option[String] = None)
        : Map[(String, Long), Option[Double]] =
      agg.answerGapFill(0L, h(12), a, fill, tagEq).get.collect()
        .map(r => (r.getString(0), r.getLong(1) / HOUR) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    // dense shape: 2 tags × 12 buckets, every bucket present
    val none = grab(Fill.None, Agg.Count)
    assert(none.size == 24)
    assert(none(("a", 0L)).contains(2.0) && none(("a", 2L)).contains(1.0))
    assert(none(("a", 1L)).isEmpty && none(("a", 11L)).isEmpty)
    assert(none(("b", 3L)).contains(1.0) && none(("b", 0L)).isEmpty)
    // zero fill
    val zero = grab(Fill.Zero, Agg.Count)
    assert(zero(("a", 1L)).contains(0.0) && zero(("b", 11L)).contains(0.0))
    assert(zero(("a", 7L)).contains(1.0))
    // locf on sum: a h1 carries h0's sum 4; b before first obs stays
    // NULL; b h5..h11 carry h4's 20
    val locf = grab(Fill.Locf, Agg.Sum)
    assert(locf(("a", 1L)).contains(4.0) && locf(("a", 11L)).contains(9.0))
    assert(locf(("b", 0L)).isEmpty && locf(("b", 2L)).isEmpty)
    assert(locf(("b", 5L)).contains(20.0) && locf(("b", 11L)).contains(20.0))
    // interp on avg: a h1 = (2+5)/2 = 3.5; h3..h6 step 0.8 from 5 to
    // 9; right edge (h8+) one-sided => NULL; observed pass through
    val interp = grab(Fill.Interp, Agg.Avg)
    assert(interp(("a", 0L)).contains(2.0) && interp(("a", 2L)).contains(5.0))
    assert(interp(("a", 1L)).exists(v => math.abs(v - 3.5) < 1e-12))
    assert(interp(("a", 4L)).exists(v => math.abs(v - 6.6) < 1e-12))
    assert(interp(("a", 6L)).exists(v => math.abs(v - 8.2) < 1e-12))
    assert(interp(("a", 8L)).isEmpty && interp(("a", 11L)).isEmpty)
    assert(interp(("b", 2L)).isEmpty && interp(("b", 5L)).isEmpty)
    // min/max refold spot-checks
    assert(grab(Fill.None, Agg.Min)(("a", 0L)).contains(1.0))
    assert(grab(Fill.None, Agg.Max)(("a", 0L)).contains(3.0))
    // tagEq on a tag with no data in-window: dense all-NULL / all-zero
    val ghost = grab(Fill.Zero, Agg.Count, tagEq = Some("zzz"))
    assert(ghost.size == 12 && ghost.values.forall(_.contains(0.0)))
    // unaligned or empty bounds decline
    assert(agg.answerGapFill(5L, h(12), Agg.Count, Fill.Zero).isEmpty)
    assert(agg.answerGapFill(h(3), h(3), Agg.Count, Fill.Zero).isEmpty)
    // STALENESS: a hot-tail insert is reflected without a refresh
    assert(st.insert(Seq(TS(h(11), "b", 30.0)).toDS()).isRight)
    assert(!agg.reflectedStoreVersion.contains(st.version))
    val hot = grab(Fill.Locf, Agg.Sum)
    assert(hot(("b", 11L)).contains(30.0),
      "gapfill must build on the real-time hybrid base")
    assert(hot(("b", 10L)).contains(20.0))
  }
}

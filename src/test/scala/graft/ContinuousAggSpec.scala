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

  test("cagg: store compact rewrites every entry => conservative full recompute, still exact") {
    val (st, agg) = fresh()
    st.insert(Seq(TS(day(0), "a", 1.0)).toDS())
    st.insert(Seq(TS(day(1), "b", 2.0)).toDS())
    agg.refresh()
    st.compact()
    val s = agg.refresh()
    assert(s.recomputedDays == 2 && s.carriedDays == 0)
    assert(shape(agg.read()) == shape(recompute(st)))
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
}

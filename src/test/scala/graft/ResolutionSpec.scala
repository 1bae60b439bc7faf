package graft

import graft.engine.{ContinuousAggregate, TimeSeriesStore}
import graft.model.TS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Resolution-aware auto-downsampling over a rollup pyramid
  * ([[ContinuousAggregate.answerAtResolution]]): width selection
  * (max resolution within the point budget), source selection (the
  * coarsest rollup that divides the width), exactness vs raw
  * aggregation — including the trailing partial window — and the
  * eligibility fences (frozen, unaligned, never-refreshed).
  */
class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L
  private val HOUR = 3600000L

  private def fixture(): (TimeSeriesStore, ContinuousAggregate, ContinuousAggregate) = {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("res-store").toString)
    val rows = for {
      d <- 0L until 10L; h <- Seq(1L, 7L, 16L); t <- Seq("a", "b")
    } yield TS(d * DAY + h * HOUR + d, t, (d * 13 + h * 3 + t.length).toDouble)
    assert(st.insert(rows.toDS()).isRight)
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("res-hourly").toString, bucketMs = HOUR)
    val daily = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("res-daily").toString)
    hourly.refresh(); daily.refresh()
    (st, hourly, daily)
  }

  /** Raw reference: aggregate events at the chosen width, anchored at
    * ge, clipped to [ge, lt). */
  private def rawSeries(st: TimeSeriesStore, ge: Long, lt: Long,
                        width: Long): Seq[(Long, String, Long, Double, Double, Double)] =
    st.current()
      .filter(col("timestamp") >= ge && col("timestamp") < lt)
      .groupBy((expr(s"(timestamp - $ge) div $width") * width + ge).as("window_start"),
        col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
      .orderBy(asc("window_start"), asc("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  private def gotSeries(df: DataFrame): Seq[(Long, String, Long, Double, Double, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  test("width = smallest finest-grain multiple within the budget; series exact") {
    val (st, hourly, daily) = fixture()
    // 10 days, budget 4 → raw width 2.5d → 60h from the hourly child
    val Some((w, df)) = ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), 0L, 10 * DAY, maxPoints = 4): @unchecked
    assert(w == 60 * HOUR, s"expected 60h width, got ${w / HOUR}h")
    assert(df.select("window_start").distinct().count() == 4)
    assert(gotSeries(df) == rawSeries(st, 0L, 10 * DAY, w))
  }

  test("source = coarsest rollup dividing the width (day-multiple width reads daily)") {
    val (st, hourly, daily) = fixture()
    // budget 5 over 10 days → width exactly 2d → the DAILY rollup serves
    val Some((w, df)) = ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), 0L, 10 * DAY, maxPoints = 5): @unchecked
    assert(w == 2 * DAY)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("res-daily") && !plan.contains("res-hourly"),
      s"day-multiple width must refold the daily rollup:\n$plan")
    assert(gotSeries(df) == rawSeries(st, 0L, 10 * DAY, w))
  }

  test("trailing partial window covers the remainder exactly") {
    val (st, hourly, daily) = fixture()
    // 10 days, budget 3 → raw width ~3.33d → 80h; 10d = 3 windows of
    // 80h covering 240h: actually exact. Force a partial: budget 4 over
    // 9 days → 54h windows, last covers [162h, 216h) = full, hmm — use
    // budget 7: width ceil(9d/7)=ceil(30.857h)=31h → last window
    // [186h, 216h) is 30h wide (partial), still exact vs raw
    val Some((w, df)) = ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), 0L, 9 * DAY, maxPoints = 7): @unchecked
    assert((9 * DAY) % w != 0, "fixture must produce a partial tail window")
    assert(gotSeries(df) == rawSeries(st, 0L, 9 * DAY, w))
  }

  test("budget beyond the finest grain caps at full child resolution") {
    val (st, hourly, daily) = fixture()
    val Some((w, df)) = ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), DAY, 2 * DAY, maxPoints = 10000): @unchecked
    assert(w == HOUR)
    assert(gotSeries(df) == rawSeries(st, DAY, 2 * DAY, w))
  }

  test("eligibility fences: unaligned bounds drop a rollup; frozen and unrefreshed never serve") {
    val (st, hourly, daily) = fixture()
    // hour-aligned but not day-aligned bounds: only the hourly child
    // qualifies, even when the width is a day multiple
    val Some((w, df)) = ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), 5 * HOUR, 5 * HOUR + 4 * DAY, maxPoints = 2): @unchecked
    assert(w == 2 * DAY)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("res-hourly") && !plan.contains("res-daily"),
      "day rollup must be ineligible for day-unaligned bounds")
    assert(gotSeries(df) == rawSeries(st, 5 * HOUR, 5 * HOUR + 4 * DAY, w))
    // completely unaligned bounds → None (caller falls back to raw)
    assert(ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), 7L, DAY + 7L, 10).isEmpty)
    // a never-refreshed rollup alone → None
    val cold = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("res-cold").toString)
    assert(ContinuousAggregate.answerAtResolution(
      Seq(cold), 0L, DAY, 10).isEmpty)
    // a frozen rollup is excluded (it answers over dropped raw history)
    val frozen = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("res-frozen").toString,
      freezeBeforeDay = Some(1L))
    frozen.refresh()
    assert(ContinuousAggregate.answerAtResolution(
      Seq(frozen), 0L, DAY, 10).isEmpty)
  }

  test("stale pyramid answers exactly (real-time hybrid under the hood)") {
    val (st, hourly, daily) = fixture()
    // hot tail after the refresh — neither rollup sees it
    assert(st.insert(Seq(TS(3 * DAY + 30 * 60000L, "a", 999.0)).toDS()).isRight)
    val Some((w, df)) = ContinuousAggregate.answerAtResolution(
      Seq(hourly, daily), 0L, 10 * DAY, maxPoints = 5): @unchecked
    assert(gotSeries(df) == rawSeries(st, 0L, 10 * DAY, w),
      "stale rollups must still answer exactly via the hybrid base")
  }
}

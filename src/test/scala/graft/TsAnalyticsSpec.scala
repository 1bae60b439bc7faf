package graft

import graft.operators.TsAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed oracles for the classic-TSDB analytics pack
  * ([[graft.operators.TsAnalytics]]): time-weighted average, OHLC bars,
  * cross-series correlation, counter rate with resets, and linear
  * interpolation. Each fixture is small enough to verify on paper; the
  * sf-fixture cross-engine laws are the DuckDB oracles in SparkEntry.
  */
class TsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("timestamp", "tag", "value")

  private def tsDs(rows: (Long, String, Double)*) =
    rows.map(r => graft.model.TS(r._1, r._2, r._3)).toDS()

  test("holtWinters: a pure seasonal signal is a fixed point — forecasts replay the pattern") {
    // pattern [2,5,8] × 4 at spacing 10: level = mean = 5, trend = 0,
    // seasonals (−3, 0, 3) never move, so every forecast step lands
    // exactly on the next pattern value
    val pts = (0 until 12).map(i =>
      (i * 10L, "p", Seq(2.0, 5.0, 8.0)(i % 3)))
    val rows = graft.operators.Forecast.holtWinters(tsDs(pts: _*),
        alpha = 0.5, beta = 0.25, gamma = 0.25, period = 3, horizon = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1L, 120L, 2.0), (2L, 130L, 5.0), (3L, 140L, 8.0)))
  }

  test("holtWinters: series shorter than two seasons emit nothing") {
    val pts = (0 until 5).map(i => (i * 10L, "s", 1.0))
    assert(graft.operators.Forecast.holtWinters(tsDs(pts: _*),
      period = 3, horizon = 2).count() == 0)
  }

  test("lttb: short series pass through; long series keep endpoints and threshold size") {
    import graft.operators.Downsample
    val short = (0 until 5).map(i => (i * 10L, "a", i.toDouble))
    assert(Downsample.lttb(tsDs(short: _*), threshold = 10).count() == 5)

    // deterministic pseudo-noisy series, 200 points
    val long = (0 until 200).map(i =>
      (i * 10L, "b", ((i * 37) % 101).toDouble))
    val kept = Downsample.lttb(tsDs(long: _*), threshold = 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(kept.length == 20)
    assert(kept.head == (0L, 0.0) && kept.last == (1990L, (199 * 37 % 101).toDouble))
    // kept points are a time-ordered subsequence of the input
    val input = long.map(p => (p._1, p._3)).toSet
    assert(kept.forall(input.contains))
    assert(kept.map(_._1).sorted.toSeq == kept.map(_._1).toSeq)
  }

  test("lttb: distributed result equals the sequential kernel; spike survives") {
    import graft.operators.Downsample
    val series = (0 until 100).map(i =>
      (i * 10L, "k", if (i == 50) 500.0 else (i % 7).toDouble))
    val dist = Downsample.lttb(tsDs(series: _*), threshold = 12)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val ref = Downsample.lttbKernel(
      series.map(p => (p._1, p._3)).toArray, 12).toSeq
    assert(dist == ref)
    assert(dist.contains((500L, 500.0)), "the spike point must survive LTTB")
  }

  test("lttb: hand-computed 5-point case picks the high-area interior point") {
    import graft.operators.Downsample
    val out = Downsample.lttbKernel(
      Array((0L, 0.0), (1L, 10.0), (2L, 0.0), (3L, 0.0), (4L, 0.0)), 3)
    assert(out.toSeq == Seq((0L, 0.0), (1L, 10.0), (4L, 0.0)))
  }

  test("timeWeightedAvg: LOCF weighting, last point weightless, <2-point tags dropped") {
    // a: 1.0 held for 10ms, then 3.0 for 30ms => (10 + 90) / 40 = 2.5
    // b: single point => dropped
    val df = TsAnalytics.timeWeightedAvg(ts(
      (0L, "a", 1.0), (10L, "a", 3.0), (40L, "a", 7.0),
      (5L, "b", 99.0)))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 2.5, 3L, 40L)))
  }

  test("timeWeightedAvg: equals plain avg under uniform spacing") {
    val even = (0 until 10).map(i => (i * 100L, "u", (i + 1).toDouble))
    val twa = TsAnalytics.timeWeightedAvg(ts(even: _*))
      .select("twa").as[Double].head()
    // uniform spacing weights the first 9 values equally: avg(1..9) = 5
    assert(twa == 5.0)
  }

  test("ohlc: open/close pick by timestamp, high/low by value") {
    val df = TsAnalytics.ohlc(ts(
      (10L, "a", 5.0), (20L, "a", 9.0), (30L, "a", 1.0), (40L, "a", 4.0),
      (110L, "a", 2.0), (10L, "b", 7.0)), bucketMs = 100L)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      ("a", 0L, 5.0, 9.0, 1.0, 4.0, 4L),
      ("a", 100L, 2.0, 2.0, 2.0, 2.0, 1L),
      ("b", 0L, 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("corrPairs: perfectly correlated and anti-correlated series") {
    val dense = Seq(
      ("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0),
      ("b", 0L, 2.0), ("b", 1L, 4.0), ("b", 2L, 6.0),
      ("c", 0L, 3.0), ("c", 1L, 2.0), ("c", 2L, 1.0)
    ).toDF("tag", "bucket_start", "cnt")
    val rows = TsAnalytics.corrPairs(dense).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("a", "b", 1.0, 3L), ("a", "c", -1.0, 3L), ("b", "c", -1.0, 3L)))
  }

  test("corrPairs: constant series yields null r, not NaN") {
    val dense = Seq(
      ("a", 0L, 1.0), ("a", 1L, 2.0),
      ("k", 0L, 5.0), ("k", 1L, 5.0)
    ).toDF("tag", "bucket_start", "cnt")
    val r = TsAnalytics.corrPairs(dense).collect()
    assert(r.length == 1 && r(0).isNullAt(2))
  }

  test("counterRate: increases sum across resets the PromQL way") {
    // counter: 10 -> 40 (inc 30) -> 5 (reset, inc 5) -> 25 (inc 20)
    val counter = Seq(
      ("a", 0L, 1000L), ("a", 1L, 4000L), ("a", 2L, 500L), ("a", 3L, 2500L)
    ).toDF("tag", "timestamp", "counter")
    val rows = TsAnalytics.counterRate(counter).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 55.0, 1L, 4L)))
  }

  test("syntheticCounter wraps exactly at the modulus and counterRate sees each wrap as a reset") {
    // scaled running sum: 600, 1200, 1800 with wrap 1000 =>
    // counters 600, 200, 800 => one reset; increases 200 + 600 = 800
    val df = TsAnalytics.counterRate(TsAnalytics.syntheticCounter(
      ts((0L, "a", 6.0), (1L, "a", 6.0), (2L, "a", 6.0)), wrap = 1000L))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 8.0, 1L, 3L)))
  }

  test("interpolateLinear: fills interior gaps on the line, leaves edges sentinel") {
    // tag a observed at buckets 1 (v=2) and 4 (v=8); grid bounds from
    // the input are buckets 0..4 (tag b observed at 0 and 4).
    // a: bucket 0 edge (-1), 1 obs 2.0, 2 interp 4.0, 3 interp 6.0, 4 obs 8.0
    val df = TsAnalytics.interpolateLinear(ts(
      (10L, "a", 2.0), (40L, "a", 8.0),
      (0L, "b", 1.0), (45L, "b", 3.0)), bucketMs = 10L)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.filter(_._1 == "a").toSeq == Seq(
      ("a", 0L, "edge", -1.0), ("a", 10L, "obs", 2.0),
      ("a", 20L, "interp", 4.0), ("a", 30L, "interp", 6.0),
      ("a", 40L, "obs", 8.0)))
    // b: linear between bucket 0 (1.0) and bucket 4 (3.0)
    assert(rows.filter(_._1 == "b").toSeq == Seq(
      ("b", 0L, "obs", 1.0), ("b", 10L, "interp", 1.5),
      ("b", 20L, "interp", 2.0), ("b", 30L, "interp", 2.5),
      ("b", 40L, "obs", 3.0)))
  }

  test("seasonalDecompose: alternating series splits into flat residuals") {
    // period 2, halfWin 1 over cnt [1,3,1,3,1,3]: every full-window
    // trend is 5/3 or 7/3, the phase means absorb ALL the deviation,
    // so residuals are exactly 0 (same doubles subtracted)
    val dense = Seq(
      ("a", 0L, 1.0), ("a", 10L, 3.0), ("a", 20L, 1.0),
      ("a", 30L, 3.0), ("a", 40L, 1.0), ("a", 50L, 3.0)
    ).toDF("tag", "bucket_start", "cnt")
    val rows = TsAnalytics.seasonalDecompose(dense, bucketMs = 10L,
      period = 2, halfWin = 1).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (10L, 3.0, 1.6667, 1.3333, 0.0),
      (20L, 1.0, 2.3333, -1.3333, 0.0),
      (30L, 3.0, 1.6667, 1.3333, 0.0),
      (40L, 1.0, 2.3333, -1.3333, 0.0)))
  }

  test("seasonalDecompose: edges without a full centered window are dropped") {
    val dense = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0))
      .toDF("tag", "bucket_start", "cnt")
    val rows = TsAnalytics.seasonalDecompose(dense, bucketMs = 10L,
      period = 2, halfWin = 1).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L))
    assert(rows(0).getDouble(3) == 2.0) // trend = (1+2+3)/3
  }

  test("cusumChange: peak |S| locates the level shift, segment means bracket it") {
    // cnt [1,1,5,5]: mean 3, S = [-2,-4,-2,0] => change closes at
    // bucket 1, left mean 1, right mean 5
    val dense = Seq(
      ("a", 0L, 1.0), ("a", 10L, 1.0), ("a", 20L, 5.0), ("a", 30L, 5.0)
    ).toDF("tag", "bucket_start", "cnt")
    val rows = TsAnalytics.cusumChange(dense, bucketMs = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(rows.toSeq == Seq(("a", 10L, -4.0, 4.0, 3.0, 1.0, 5.0, 4L)))
  }

  test("cusumChange: ties break to the earliest bucket; empty right segment is sentinel") {
    // two tags: "t" has |S| tied (peak 1 at buckets 0) — earliest wins;
    // "one" is a single point, so the right segment is empty => -1
    val dense = Seq(
      ("t", 0L, 2.0), ("t", 10L, 4.0),
      ("one", 0L, 7.0)
    ).toDF("tag", "bucket_start", "cnt")
    val rows = TsAnalytics.cusumChange(dense, bucketMs = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(rows.toSeq == Seq(
      ("one", 0L, 0.0, 7.0, -1.0, 1L),
      ("t", 0L, -1.0, 2.0, 4.0, 2L)))
  }

  test("stateAgg: LOCF durations, entries count re-entries, last event weightless") {
    // user 1: A@0 B@10 A@30 A@60 B@100 — A holds 10+30+40=80 over 3
    // intervals with 2 entries (start, re-entry after B; the A→A row
    // is NOT an entry); B holds 20 with 2 entries (the final B enters
    // but has no forward interval). user 2: lone C => zero duration,
    // one entry.
    val ev = Seq(
      (1L, 0L, "A"), (1L, 10L, "B"), (1L, 30L, "A"),
      (1L, 60L, "A"), (1L, 100L, "B"),
      (2L, 5L, "C")
    ).toDF("user_id", "t", "event_type")
    val rows = TsAnalytics.stateAgg(ev, "user_id", "event_type", "t")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, "A", 80L, 3L, 2L),
      (1L, "B", 20L, 1L, 2L),
      (2L, "C", 0L, 0L, 1L)))
  }

  test("heartbeatAgg: ranges split beyond tolerance, exact-tolerance gap stays merged") {
    // tol 10. user 1: beats 0,5,12,40 — gaps 5,7,28; the 28 splits =>
    // 2 ranges; uptime 5+7+10(capped)+10(trailing)=32; span 50.
    // user 2: lone beat => 1 range, uptime = tol. user 3: gap exactly
    // 10 is NOT a split (strict >), uptime 10+10.
    val beats = Seq(
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 40L),
      (2L, 100L),
      (3L, 0L), (3L, 10L)
    ).toDF("user_id", "t")
    val rows = TsAnalytics.heartbeatAgg(beats, "user_id", "t", tolMs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (1L, 4L, 2L, 32L, 50L, 18L),
      (2L, 1L, 1L, 10L, 10L, 0L),
      (3L, 2L, 1L, 20L, 20L, 0L)))
  }

  test("stateTransitions: per-key consecutive pairs, row-stochastic probabilities") {
    // user 1: A→B→A→A; user 2: B→A. pairs: A→B 1, B→A 2, A→A 1 =>
    // out of A: p = .5/.5; out of B: p = 1
    val ev = Seq(
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "A"), (1L, 3L, "A"),
      (2L, 0L, "B"), (2L, 5L, "A")
    ).toDF("user_id", "t", "event_type")
    val rows = TsAnalytics.stateTransitions(ev, "user_id", "event_type", "t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5), ("B", "A", 2L, 1.0)))
  }

  test("liveRanges: beats within tolerance merge, ranges end at last beat + tol") {
    // tol 10. user 1: 0,5,12,40 => [0,22) with 3 beats, [40,50) with 1;
    // user 2: lone 100 => [100,110)
    val beats = Seq(
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 40L), (2L, 100L)
    ).toDF("user_id", "t")
    val rows = TsAnalytics.liveRanges(beats, "user_id", "t", tolMs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 22L, 3L), (1L, 40L, 50L, 1L), (2L, 100L, 110L, 1L)))
  }

  test("peakConcurrency: exclusive ends free their slot before a tieing start") {
    // A[0,50) B[10,30) C[30,40) D[100,120): at t=30 B's end applies
    // before C's start, so concurrency never reads 3 — running
    // 1,2,1,2,1,0,1,0 peaks at 2 over 8 change points, all in day 0
    val iv = Seq((0L, 50L), (10L, 30L), (30L, 40L), (100L, 120L))
      .toDF("s", "e")
    val rows = TsAnalytics.peakConcurrency(iv, "s", "e", bucketMs = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 2L, 8L)))
  }

  test("peakConcurrency: a day whose events only close intervals peaks at its carry-in") {
    // A spans midnight, B lives inside day 0: day 0 peaks at 2; day 1
    // holds only A's end, so its peak is the carry-in concurrency 1,
    // NOT the post-event running value 0
    val day = 86400000L
    val iv = Seq((0L, day + 10L), (5L, 15L)).toDF("s", "e")
    val rows = TsAnalytics.peakConcurrency(iv, "s", "e", bucketMs = day / 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 2L, 3L), (day, 1L, 1L)))
  }

  test("interpolateLinear: multi-row buckets average exactly before interpolation") {
    // bucket 0 holds 1.0 and 2.0 => obs mean 1.5; bucket 2 holds 3.5
    val df = TsAnalytics.interpolateLinear(ts(
      (0L, "a", 1.0), (5L, "a", 2.0), (25L, "a", 3.5)), bucketMs = 10L)
    val rows = df.collect().map(r =>
      (r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0L, "obs", 1.5), (10L, "interp", 2.5), (20L, "obs", 3.5)))
  }
}

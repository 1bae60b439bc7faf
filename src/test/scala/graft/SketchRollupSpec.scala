package graft

import graft.engine.{ContinuousAggregate, TimeSeriesStore}
import graft.functions.QuantileFunctions
import graft.model._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sketch-bearing continuous aggregates: the per-bucket GK quantile
  * summaries and HLL sketches merge across buckets into percentile /
  * count-distinct answers whose error is within the sketches' published
  * bounds — at any rollup staleness, through the full mutation walk.
  * Correctness gates for the rows-only driver queries
  * ts3_cagg_p95_by_tag / ts3_cagg_distinct_values (COVERAGE.md).
  */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L
  private val EPS = 0.01 // GK relative rank error the rollups use

  private def fresh(bucketMs: Long = DAY): (TimeSeriesStore, ContinuousAggregate) = {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-skagg-store").toString)
    val agg = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skagg").toString, bucketMs,
      sketchRelErr = Some(EPS))
    (st, agg)
  }

  private def day(d: Long, offs: Long = 0L): Long = d * DAY + offs

  /** GK bound check: `got` must be a value whose RANK in the exact
    * sorted multiset is within ±(eps + slack)·n of q·n.
    */
  private def assertWithinRank(got: Double, exact: Seq[Double], q: Double,
                               eps: Double = EPS, slack: Double = 0.011): Unit = {
    val sorted = exact.sorted
    val n = sorted.size
    val lo = math.max(0, math.floor((q - eps - slack) * n).toInt - 1)
    val hi = math.min(n - 1, math.ceil((q + eps + slack) * n).toInt)
    assert(got >= sorted(lo) && got <= sorted(hi),
      s"quantile($q) = $got outside rank band [${sorted(lo)}, ${sorted(hi)}] (n=$n)")
  }

  // deterministic multi-day, multi-tag series with repeated values (so
  // distinct < count and cross-bucket duplicates exist)
  private def seed(st: TimeSeriesStore, days: Long = 6L, perDay: Int = 200): Unit = {
    val rows = for {
      d <- 0L until days
      i <- 0 until perDay
    } yield TS(day(d, i * 1000L), if (i % 3 == 0) "a" else "b",
      ((i * 37 + d * 11) % 97).toDouble)
    st.insert(rows.toDS()).left.foreach(e =>
      throw new IllegalStateException(e.messages.mkString(",")))
  }

  test("qsketch functions: build/merge/query laws on plain DataFrames") {
    QuantileFunctions.register(spark)
    val vals = (1 to 5000).map(i => ((i * 7919) % 4999).toDouble)
    val df = vals.toDF("v")
    // split in two, sketch each half, merge — vs exact over the union
    val halves = df.withColumn("half", (col("v") < 2500).cast("int"))
      .groupBy(col("half"))
      .agg(QuantileFunctions.qsketch(col("v"), 0.01).as("sk"))
    val merged = halves.agg(
      QuantileFunctions.qsketchQuantile(
        QuantileFunctions.qsketchMerge(col("sk")), 0.5).as("p50"),
      QuantileFunctions.qsketchQuantile(
        QuantileFunctions.qsketchMerge(col("sk")), 0.95).as("p95")).head()
    assertWithinRank(merged.getDouble(0), vals, 0.5)
    assertWithinRank(merged.getDouble(1), vals, 0.95)
    // empty merge → NULL quantile (two aggregation levels — Spark
    // rejects nested aggregates in one agg, as it should)
    val emptySk = df.filter(col("v") < -1)
      .agg(QuantileFunctions.qsketch(col("v"), 0.01).as("sk"))
    val empty = emptySk.agg(QuantileFunctions.qsketchQuantile(
      QuantileFunctions.qsketchMerge(col("sk")), 0.5).as("r")).head()
    assert(empty.isNullAt(0), "empty sketch must query to NULL")
  }

  test("answerPercentile: scalar + byTag within GK rank bound of exact; slicing + tagEq") {
    val (st, agg) = fresh()
    seed(st)
    agg.refresh()
    val raw = st.current().select("tag", "timestamp", "value")
      .as[(String, Long, Double)].collect()

    // scalar over everything
    val all = agg.answerPercentile(0.95).get.head().getDouble(0)
    assertWithinRank(all, raw.map(_._3).toSeq, 0.95)

    // byTag
    val byTag = agg.answerPercentile(0.5, byTag = true).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (t <- Seq("a", "b"))
      assertWithinRank(byTag(t), raw.filter(_._1 == t).map(_._3).toSeq, 0.5)

    // bucket-aligned window + tagEq
    val win = agg.answerPercentile(0.5, ge = Some(day(1)), lt = Some(day(4)),
      tagEq = Some("a")).get.head().getDouble(0)
    val exactWin = raw.filter(r => r._1 == "a" && r._2 >= day(1) && r._2 < day(4))
      .map(_._3).toSeq
    assertWithinRank(win, exactWin, 0.5)

    // unaligned bounds are ineligible; non-sketched rollup is ineligible
    assert(agg.answerPercentile(0.5, ge = Some(day(1) + 7L)).isEmpty)
    val plain = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skagg-plain").toString)
    plain.refresh()
    assert(plain.answerPercentile(0.5).isEmpty,
      "a rollup without sketches must decline percentile queries")
  }

  test("answerDistinct: HLL union across buckets tracks exact count(distinct) within 5%") {
    val (st, agg) = fresh()
    seed(st)
    agg.refresh()
    val raw = st.current().select("tag", "timestamp", "value")
      .as[(String, Long, Double)].collect()

    def exactDistinct(f: ((String, Long, Double)) => Boolean): Long =
      raw.filter(f).map(_._3).distinct.size.toLong

    val all = agg.answerDistinct().get.head().getDouble(0)
    val exact = exactDistinct(_ => true)
    assert(math.abs(all - exact) <= math.max(2.0, 0.05 * exact),
      s"distinct estimate $all vs exact $exact")

    val byTag = agg.answerDistinct(byTag = true).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (t <- Seq("a", "b")) {
      val e = exactDistinct(_._1 == t)
      assert(math.abs(byTag(t) - e) <= math.max(2.0, 0.05 * e),
        s"tag $t: ${byTag(t)} vs $e")
    }

    // windowed: cross-bucket duplicates must NOT double-count (the
    // whole point of the sketch union vs summing per-bucket distincts)
    val win = agg.answerDistinct(ge = Some(day(0)), lt = Some(day(3)))
      .get.head().getDouble(0)
    val eWin = exactDistinct(r => r._2 >= day(0) && r._2 < day(3))
    val perBucketSum = (0L until 3L).map(d =>
      exactDistinct(r => r._2 >= day(d) && r._2 < day(d + 1))).sum
    assert(perBucketSum > eWin, "fixture must have cross-bucket duplicates")
    assert(math.abs(win - eWin) <= math.max(2.0, 0.05 * eWin),
      s"windowed distinct $win vs exact $eWin (naive per-bucket sum $perBucketSum)")
  }

  test("sketches stay within bound through the mutation walk; incremental == recompute-grade") {
    val (st, agg) = fresh()
    seed(st, days = 4L)
    agg.refresh()
    // mutate: new day, update a day, delete some keys, compact
    st.insert((0 until 50).map(i =>
      TS(day(9, i * 1000L), "c", (i % 7).toDouble)).toDS())
    assert(st.update(Seq(TS(day(1, 1000L), "b", 1234.5)).toDS()).isRight)
    assert(st.delete(Seq(TSKey(day(2, 3000L), "a")).toDS()).isRight)
    st.compact()
    val stats = agg.refresh()
    assert(!stats.full, "content-id diff must survive the walk")

    // a from-scratch sketched rollup over the same store state
    val fresh2 = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skagg-fresh").toString, DAY,
      sketchRelErr = Some(EPS))
    fresh2.refresh()

    val exact = st.current().select("value").as[Double].collect().toSeq
    for (r <- Seq(agg, fresh2); q <- Seq(0.1, 0.5, 0.9)) {
      assertWithinRank(r.answerPercentile(q).get.head().getDouble(0), exact, q)
    }
    val eD = exact.distinct.size
    for (r <- Seq(agg, fresh2)) {
      val d = r.answerDistinct().get.head().getDouble(0)
      assert(math.abs(d - eD) <= math.max(2.0, 0.05 * eD), s"$d vs $eD")
    }
  }

  test("real-time staleness: percentile/distinct exact-grade over a never-refreshed hot tail") {
    val (st, agg) = fresh()
    seed(st, days = 3L)
    agg.refresh()
    // hot tail: two more days land, NO refresh
    st.insert((0 until 300).map(i =>
      TS(day(5, i * 500L), "a", ((i * 13) % 211).toDouble)).toDS())
    assert(agg.reflectedStoreVersion.exists(_ != st.version), "fixture must be stale")

    val exact = st.current().select("value").as[Double].collect().toSeq
    assertWithinRank(agg.answerPercentile(0.9).get.head().getDouble(0), exact, 0.9)
    val eD = exact.distinct.size
    val d = agg.answerDistinct().get.head().getDouble(0)
    assert(math.abs(d - eD) <= math.max(2.0, 0.05 * eD),
      s"stale-rollup distinct $d vs exact $eD")
  }

  test("hourly sketched grain: percentile over an hour-aligned sub-day window") {
    val HOUR = 3600000L
    val (st, agg) = fresh(bucketMs = HOUR)
    st.insert((0 until 500).map(i =>
      TS(i * 60000L, "a", ((i * 29) % 83).toDouble)).toDS()) // ~8.3 hours
    agg.refresh()
    val exact = st.current().filter(col("timestamp") >= 2 * HOUR &&
        col("timestamp") < 6 * HOUR)
      .select("value").as[Double].collect().toSeq
    val got = agg.answerPercentile(0.5, ge = Some(2 * HOUR), lt = Some(6 * HOUR))
      .get.head().getDouble(0)
    assertWithinRank(got, exact, 0.5)
  }

  test("answerTopValues: MG merge across buckets — exact under capacity, heavy hitters above") {
    val (st, agg) = fresh()
    seed(st) // 97 distinct values << capacity 256 => exact everywhere
    agg.refresh()
    val raw = st.current().collect()
      .map(r => (r.getAs[Long]("timestamp"), r.getAs[String]("tag"),
        r.getAs[Double]("value")))
    def exactTop(k: Int, ge: Long, lt: Long, tag: Option[String])
        : Seq[(String, Long)] =
      raw.filter(t => t._1 >= ge && t._1 < lt && tag.forall(_ == t._2))
        .groupBy(_._3).map { case (v, xs) =>
          // the engine's canonical rendering: Spark's double→string cast
          (if (v == v.floor && !v.isInfinite) s"${v.toLong}.0" else v.toString,
            xs.length.toLong)
        }.toSeq.sortBy { case (item, n) => (-n, item) }.take(k)
    // scalar window: exact equality (cross-bucket duplicate values
    // MUST sum — per-bucket top-k concatenation would get this wrong)
    val top5 = agg.answerTopValues(5, ge = Some(day(0)), lt = Some(day(4)))
      .get.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want5 = exactTop(5, day(0), day(4), None)
    assert(top5.map(t => (t._2, t._3.toLong)).toSeq == want5,
      s"merged top-5 ${top5.toSeq} != exact $want5")
    assert(top5.map(_._1).toSeq == (1L to 5L), "ranks must be 1..k")
    // byTag
    val byTag = agg.answerTopValues(3, ge = Some(day(0)), lt = Some(day(6)),
      byTag = true).get.collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.sortBy(_.getLong(1)).map(r => (r.getString(2), r.getDouble(3).toLong)).toSeq
      }
    Seq("a", "b").foreach { t =>
      assert(byTag(t) == exactTop(3, day(0), day(6), Some(t)),
        s"byTag($t) drifted")
    }
    // STALENESS: hot tail shifts the ranking without a refresh
    val hot = (0 until 300).map(i => TS(day(6, i * 1000L), "a", 42.0))
    st.insert(hot.toDS()).left.foreach(e =>
      throw new IllegalStateException(e.messages.mkString(",")))
    assert(!agg.reflectedStoreVersion.contains(st.version))
    val afterHot = agg.answerTopValues(1).get.head()
    assert(afterHot.getString(1) == "42.0" && afterHot.getDouble(2) == 300.0 +
      raw.count(_._3 == 42.0),
      s"hot-tail heavy value must lead: $afterHot")
    // OVER capacity: 4000 distinct values + one dominant; the dominant
    // must surface with est within N/(cap+1) of truth
    val (st2, agg2) = fresh()
    val many = (0 until 4000).map(i => TS(day(0, i * 1000L), "x", i + 0.5)) ++
      (0 until 500).map(i => TS(day(1, i * 1000L), "x", 7777.0))
    st2.insert(many.toDS()).left.foreach(e =>
      throw new IllegalStateException(e.messages.mkString(",")))
    agg2.refresh()
    val n = 4500.0
    val lead = agg2.answerTopValues(1).get.head()
    assert(lead.getString(1) == "7777.0",
      s"dominant value missing from MG summary: $lead")
    assert(math.abs(lead.getDouble(2) - 500.0) <= n / 257.0 + 1e-9,
      s"estimate ${lead.getDouble(2)} outside MG bound of true 500")
    // unaligned bounds / plain rollup decline
    assert(agg.answerTopValues(3, ge = Some(5L)).isEmpty)
    val plain = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skagg-plain").toString)
    plain.refresh()
    assert(plain.answerTopValues(3).isEmpty,
      "plain rollup must decline top-values")
  }

  test("hierarchical sketched rollup: the weekly parent MERGES the daily sketches — bounds hold") {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-skhier-store").toString)
    val child = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skhier-daily").toString, DAY,
      sketchRelErr = Some(EPS))
    val parent = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skhier-weekly").toString, 7 * DAY,
      sketchRelErr = Some(EPS), source = Some(child))
    seed(st, days = 10L) // spans two weekly buckets
    child.refresh()
    val s = parent.refresh()
    assert(s.fromChild, s"sketched parent should refold+merge the child: $s")
    val raw = st.current().select("value").as[Double].collect().toSeq
    // GK: twice-merged summaries (child build → parent refresh merge →
    // query-time merge) stay within the child's rank bound
    Seq(0.1, 0.5, 0.95).foreach { q =>
      assertWithinRank(
        parent.answerPercentile(q).get.head().getDouble(0), raw, q)
    }
    // HLL: unions are associative — the two-level union tracks exact
    val exactDistinct = raw.distinct.size
    val gotDistinct = parent.answerDistinct().get.head().getDouble(0)
    assert(math.abs(gotDistinct - exactDistinct) <= 0.05 * exactDistinct + 1,
      s"distinct $gotDistinct vs exact $exactDistinct")
    // MG: 97 distinct values < capacity => merged counts are EXACT; the
    // returned (item, est) pairs must match the true count map and the
    // ests must be the true top-k multiset (tie order may differ)
    val exactCounts = raw.groupBy(identity).map { case (v, xs) =>
      (v.toString, xs.size.toDouble) }
    val top = parent.answerTopValues(3).get.collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    assert(top.forall { case (item, est) => exactCounts(item) == est })
    assert(top.map(_._2).sorted.toSeq ==
      exactCounts.values.toSeq.sorted.takeRight(3).toSeq)
    // guards: a sketched parent over a PLAIN child, and a parent
    // claiming a TIGHTER bound than its child, are both rejected
    val plainChild = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-skhier-plainchild").toString, DAY)
    intercept[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-skhier-bad1").toString, 7 * DAY,
        sketchRelErr = Some(EPS), source = Some(plainChild))
    }
    intercept[IllegalArgumentException] {
      new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-skhier-bad2").toString, 7 * DAY,
        sketchRelErr = Some(EPS / 2), source = Some(child))
    }
  }
}

package graft

import graft.engine.{ContinuousAggregate, RollupSqlRewrite, TimeSeriesStore}
import graft.model.{Agg, TS}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** SQL gap-filling laws ([[graft.functions.GapFillFunctions]] +
  * RollupSqlRewrite.gapfillRewrite — the TimescaleDB
  * `time_bucket_gapfill` / `locf()` / `interpolate()` spelling):
  *
  *  - routed SQL == the engine's `answerGapFill` (same store, same
  *    rollup, all three fills) — the SQL surface is a spelling of the
  *    same operator, value-identical;
  *  - the raw fallback (store registered, no grain-compatible rollup)
  *    is value-identical to the routed answer;
  *  - ineligible shapes fail LOUDLY at plan time with the specific
  *    reason — gap-filling has no raw execution semantics, so a shape
  *    the rewrite declines must never silently return sparse rows;
  *  - an unregistered source fails at execution with the marker's
  *    actionable message.
  *
  * Integer-valued series throughout, so refolded sums are bit-exact.
  */
class GapFillSqlSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L
  private val HOUR = 3600000L

  /** Store with deliberate GAPS: tag a observed in hours {0, 3, 4} of
    * day 0 and hour 1 of day 1; tag b in hours {2, 5} of day 0 only —
    * locf, interp edge-NULLs, and absent-tag rules all genuinely fire
    * on a 2-day hourly spine. */
  private def fresh(): (TimeSeriesStore, ContinuousAggregate) = {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("gf-store").toString)
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("gf-hourly").toString, bucketMs = HOUR)
    val rows = Seq(
      TS(0L * HOUR + 10, "a", 4.0), TS(0L * HOUR + 20, "a", 6.0),
      TS(3L * HOUR + 5, "a", 10.0),
      TS(4L * HOUR + 1, "a", 2.0),
      TS(DAY + HOUR + 7, "a", 8.0),
      TS(2L * HOUR + 3, "b", 5.0),
      TS(5L * HOUR + 9, "b", 11.0))
    assert(st.insert(rows.toDS()).isRight)
    hourly.refresh()
    (st, hourly)
  }

  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  private def view(st: TimeSeriesStore, n: String): String = {
    val v = s"gf_${n}_${System.nanoTime()}"
    st.current().createOrReplaceTempView(v)
    v
  }

  test("routed SQL locf/interpolate/bare == the engine's answerGapFill, and the plan reads only the rollup") {
    val (st, hourly) = fresh()
    RollupSqlRewrite.register(spark, st, Seq(hourly))
    try {
      val v = view(st, "rt")
      val cases: Seq[(String, ContinuousAggregate.Fill)] = Seq(
        ("locf(CAST(count(*) AS DOUBLE))", ContinuousAggregate.Fill.Locf),
        ("interpolate(CAST(count(*) AS DOUBLE))", ContinuousAggregate.Fill.Interp),
        // bare count is NON-nullable — the analyzed schema could not
        // carry NULL gap rows, so the nullable marker is required
        ("gapfill_null(CAST(count(*) AS DOUBLE))", ContinuousAggregate.Fill.None),
        ("coalesce(gapfill_null(CAST(count(*) AS DOUBLE)), 0.0)", ContinuousAggregate.Fill.Zero))
      cases.foreach { case (sel, fill) =>
        val df = spark.sql(
          s"SELECT tag AS grp, time_bucket_gapfill($HOUR, timestamp) AS bucket_start, " +
            s"$sel AS result FROM $v WHERE timestamp >= 0 AND timestamp < ${2 * DAY} " +
            "GROUP BY tag, time_bucket_gapfill(" + HOUR + ", timestamp) " +
            "ORDER BY grp, bucket_start")
        assert(planStr(df).contains("gf-hourly"),
          s"gapfill SQL did not route to the rollup for $sel:\n${planStr(df)}")
        assert(!planStr(df).contains("gf-store"),
          s"routed gapfill still scans raw segments for $sel")
        val engine = hourly.answerGapFill(0L, 2 * DAY, Agg.Count, fill)
          .getOrElse(fail("engine declined an eligible gapfill"))
        assert(rows(df) == rows(engine), s"SQL != engine for $sel")
        assert(rows(df).size == 2 * 48, s"dense grid size wrong for $sel")
      }
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("raw fallback (no compatible rollup) is value-identical to the routed answer") {
    val (st, hourly) = fresh()
    val q = (v: String) =>
      s"SELECT tag AS grp, time_bucket_gapfill($HOUR, timestamp) AS bucket_start, " +
        s"locf(round(sum(value), 4)) AS result, interpolate(CAST(count(*) AS DOUBLE)) AS c " +
        s"FROM $v WHERE timestamp >= 0 AND timestamp < ${2 * DAY} " +
        s"GROUP BY tag, time_bucket_gapfill($HOUR, timestamp) ORDER BY grp, bucket_start"
    RollupSqlRewrite.register(spark, st, Seq(hourly))
    val routed = try {
      val df = spark.sql(q(view(st, "routed")))
      assert(planStr(df).contains("gf-hourly"))
      rows(df)
    } finally RollupSqlRewrite.unregister(spark, st)
    // registered store, NO rollups: the observed stage stays raw
    RollupSqlRewrite.register(spark, st, Seq.empty)
    try {
      val df = spark.sql(q(view(st, "raw")))
      assert(planStr(df).contains("gf-store"),
        s"raw fallback should scan the store:\n${planStr(df)}")
      assert(rows(df) == routed, "raw fallback != routed answer")
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("global gapfill (no tag key) densifies the full spine even over a pinned tag") {
    val (st, hourly) = fresh()
    RollupSqlRewrite.register(spark, st, Seq(hourly))
    try {
      val v = view(st, "gl")
      val df = spark.sql(
        s"SELECT time_bucket_gapfill($HOUR, timestamp) AS bucket_start, " +
          s"locf(round(sum(value), 4)) AS result FROM $v " +
          s"WHERE timestamp >= 0 AND timestamp < $DAY AND tag = 'b' " +
          s"GROUP BY time_bucket_gapfill($HOUR, timestamp) ORDER BY bucket_start")
      val got = rows(df)
      assert(got.size == 24, s"global spine must be dense: ${got.size}")
      // b observed at hours 2 (5.0) and 5 (11.0): locf carries forward,
      // leading hours NULL
      val expected: Seq[Option[Double]] =
        Seq(None, None, Some(5.0), Some(5.0), Some(5.0)) ++
          Seq.fill(19)(Some(11.0))
      assert(got.map(_(1)) == expected.map(_.map(x => x: Any).orNull),
        s"locf values wrong: ${got.map(_(1))}")
      assert(got.map(_(0)) == (0L until 24L).map(_ * HOUR),
        "bucket spine wrong")
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("ineligible shapes fail loudly at plan time with the specific reason") {
    val (st, hourly) = fresh()
    RollupSqlRewrite.register(spark, st, Seq(hourly))
    try {
      val v = view(st, "err")
      def err(sql: String): String =
        intercept[Exception](spark.sql(sql).collect()).getMessage
      val g = s"time_bucket_gapfill($HOUR, timestamp)"
      assert(err(s"SELECT $g AS b, locf(sum(value)) AS s FROM $v GROUP BY 1")
        .contains("lower bound"))
      assert(err(s"SELECT $g AS b, locf(sum(value)) AS s FROM $v " +
        s"WHERE timestamp >= 0 GROUP BY 1").contains("upper bound"))
      assert(err(s"SELECT $g AS b, locf(sum(value)) AS s FROM $v " +
        s"WHERE timestamp >= 1 AND timestamp < $DAY GROUP BY 1")
        .contains("aligned"))
      assert(err(s"SELECT g_day, $g AS b, locf(sum(value)) AS s FROM $v " +
        s"WHERE timestamp >= 0 AND timestamp < $DAY GROUP BY 1, 2")
        .contains("grouping key"))
      assert(err(s"SELECT $g AS b, interpolate(count(*)) AS c FROM $v " +
        s"WHERE timestamp >= 0 AND timestamp < $DAY GROUP BY 1")
        .contains("DOUBLE"))
      assert(err(s"SELECT $g AS b, locf(locf(sum(value))) AS s FROM $v " +
        s"WHERE timestamp >= 0 AND timestamp < $DAY GROUP BY 1")
        .contains("nested"))
      assert(err(s"SELECT $g AS b, locf(value) AS s FROM $v " +
        s"WHERE timestamp >= 0 AND timestamp < $DAY GROUP BY 1, value")
        .toLowerCase.contains("grouping key"))
      // spine cap: 1ms buckets over > 4M ms
      assert(err(s"SELECT time_bucket_gapfill(1, timestamp) AS b, " +
        s"locf(sum(value)) AS s FROM $v WHERE timestamp >= 0 AND " +
        s"timestamp < ${5 * 1000 * 1000} GROUP BY 1").contains("spine"))
      // a bare NON-nullable aggregate cannot carry NULL gap rows
      // through the analyzed schema — must name a fill
      assert(err(s"SELECT $g AS b, count(*) AS c FROM $v " +
        s"WHERE timestamp >= 0 AND timestamp < $DAY GROUP BY 1")
        .contains("gapfill_null"))
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("randomized matrix: SQL gapfill == a pure-Scala pair-walk model across grains, fills, grouping and bounds") {
    val rnd = new scala.util.Random(0x6f0513)
    val tags = Seq("a", "b", "c")
    val events: Seq[(Long, String, Double)] = (0 until 90).map { _ =>
      (rnd.nextLong(4 * DAY), tags(rnd.nextInt(3)), (rnd.nextInt(50) + 1).toDouble)
    }.distinctBy(e => (e._1, e._2))
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("gfm-store").toString)
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("gfm-hourly").toString, bucketMs = HOUR)
    assert(st.insert(events.map(e => TS(e._1, e._2, e._3)).toDS()).isRight)
    hourly.refresh()
    RollupSqlRewrite.register(spark, st, Seq(hourly))
    try {
      val v = view(st, "mx")

      /** Exact model: bucket the filtered events, walk the spine. */
      def model(ge: Long, lt: Long, grain: Long, perTag: Boolean,
                tagPin: Option[String], fill: String, useCount: Boolean)
          : Seq[(String, Long, Any)] = {
        val filtered = events.filter(e =>
          e._1 >= ge && e._1 < lt && tagPin.forall(_ == e._2))
        val spine = ge until lt by grain
        def series(obs: Map[Long, Double]): Seq[(Long, Any)] = fill match {
          case "null" => spine.map(b => b -> obs.get(b).map(x => x: Any).orNull)
          case "locf" => spine.map { b =>
            b -> obs.keys.filter(_ <= b).maxOption.map(obs).map(x => x: Any).orNull
          }
          case "interp" => spine.map { b =>
            b -> (obs.get(b) match {
              case Some(x) => x: Any
              case None =>
                val pb = obs.keys.filter(_ < b).maxOption
                val nb = obs.keys.filter(_ > b).minOption
                (pb, nb) match {
                  case (Some(p), Some(n)) =>
                    (obs(p) * (n - b).toDouble + obs(n) * (b - p).toDouble) /
                      (n - p).toDouble: Any
                  case _ => null
                }
            })
          }
        }
        def bucketed(rs: Seq[(Long, String, Double)]): Map[Long, Double] =
          rs.groupBy(e => (e._1 / grain) * grain).map { case (b, g) =>
            b -> (if (useCount) g.size.toDouble else g.map(_._3).sum)
          }
        if (perTag)
          filtered.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (t, rs) =>
            series(bucketed(rs)).map { case (b, x) => (t, b, x) }
          }
        else series(bucketed(filtered)).map { case (b, x) => ("", b, x) }
      }

      val grains = Seq(HOUR, 3 * HOUR, 1800000L) // 30min: raw fallback
      for (i <- 0 until 14) {
        val grain = grains(rnd.nextInt(grains.size))
        val fill = Seq("null", "locf", "interp")(rnd.nextInt(3))
        val perTag = rnd.nextBoolean()
        val tagPin = if (!perTag && rnd.nextBoolean()) Some(tags(rnd.nextInt(3))) else None
        val useCount = rnd.nextBoolean()
        val loB = rnd.nextLong(2 * DAY / grain)
        val hiB = loB + 1 + rnd.nextLong(2 * DAY / grain)
        val (ge, lt) = (loB * grain, hiB * grain)
        val inner =
          if (useCount) "CAST(count(*) AS DOUBLE)" else "CAST(sum(value) AS DOUBLE)"
        val wrapped = fill match {
          case "null" => s"gapfill_null($inner)"
          case "locf" => s"locf($inner)"
          case "interp" => s"interpolate($inner)"
        }
        val sql =
          if (perTag)
            s"SELECT tag AS grp, time_bucket_gapfill($grain, timestamp) AS b, " +
              s"$wrapped AS r FROM $v WHERE timestamp >= $ge AND timestamp < $lt " +
              s"GROUP BY tag, time_bucket_gapfill($grain, timestamp) ORDER BY grp, b"
          else
            s"SELECT time_bucket_gapfill($grain, timestamp) AS b, $wrapped AS r " +
              s"FROM $v WHERE timestamp >= $ge AND timestamp < $lt" +
              tagPin.fold("")(t => s" AND tag = '$t'") +
              s" GROUP BY time_bucket_gapfill($grain, timestamp) ORDER BY b"
        val got = spark.sql(sql).collect().map(_.toSeq).toSeq
        val want = model(ge, lt, grain, perTag, tagPin, fill, useCount).map {
          case (t, b, x) => if (perTag) Seq[Any](t, b, x) else Seq[Any](b, x)
        }
        assert(got == want,
          s"case $i mismatch (grain=$grain fill=$fill perTag=$perTag " +
            s"pin=$tagPin count=$useCount ge=$ge lt=$lt):\n got=$got\nwant=$want")
      }
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("a stale snapshot view fails loudly instead of silently upgrading to current data") {
    val (st, hourly) = fresh()
    RollupSqlRewrite.register(spark, st, Seq(hourly))
    try {
      val v = view(st, "stale")
      assert(st.insert(Seq(TS(7 * HOUR + 11, "a", 3.0)).toDS()).isRight)
      val e = intercept[Exception](spark.sql(
        s"SELECT tag AS grp, time_bucket_gapfill($HOUR, timestamp) AS b, " +
          s"locf(sum(value)) AS s FROM $v WHERE timestamp >= 0 AND " +
          s"timestamp < $DAY GROUP BY 1, 2").collect())
      assert(e.getMessage.contains("CURRENT snapshot"),
        s"stale view must fail loudly, got: ${e.getMessage}")
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("counter folds compose inside gapfill: locf(counter_increase) per bucket == pair-walk model") {
    val (st, _) = fresh()
    // no counter rollup: the observed stage falls to the window-lag
    // counter fallback — gapfill composes with the counter vocabulary
    RollupSqlRewrite.register(spark, st, Seq.empty)
    try {
      val v = view(st, "ctr")
      val df = spark.sql(
        s"SELECT tag AS grp, time_bucket_gapfill($HOUR, timestamp) AS b, " +
          s"locf(counter_increase(timestamp, value)) AS inc FROM $v " +
          s"WHERE timestamp >= 0 AND timestamp < ${6 * HOUR} " +
          s"GROUP BY 1, 2 ORDER BY grp, b")
      // per-(tag, bucket) reset-aware increase over the fixture rows,
      // then LOCF over each tag's 6-hour spine
      val fixture = Seq(
        ("a", 0L, Seq(4.0, 6.0)), ("a", 3L, Seq(10.0)), ("a", 4L, Seq(2.0)),
        ("b", 2L, Seq(5.0)), ("b", 5L, Seq(11.0)))
      def increase(vs: Seq[Double]): Double =
        vs.zip(vs.drop(1)).map { case (p, x) => if (x >= p) x - p else x }.sum
      val obs = fixture.map { case (t, h, vs) => (t, h * HOUR) -> increase(vs) }.toMap
      val want = Seq("a", "b").flatMap { t =>
        (0L until 6L).map(_ * HOUR).map { b =>
          val carried = obs.keys.filter(k => k._1 == t && k._2 <= b)
            .map(_._2).maxOption.map(pb => obs((t, pb)))
          Seq[Any](t, b, carried.map(x => x: Any).orNull)
        }
      }
      assert(df.collect().map(_.toSeq).toSeq == want,
        "locf(counter_increase) inside gapfill diverged from the model")
    } finally RollupSqlRewrite.unregister(spark, st)
  }

  test("markers over an unregistered source fail at execution with the actionable message") {
    val (st, _) = fresh()
    // functions registered on the session (by earlier register calls in
    // this suite) but THIS store is not — the marker must surface the
    // unrouted error, never sparse rows
    graft.functions.GapFillFunctions.register(spark)
    val v = view(st, "unreg")
    val e = intercept[Exception] {
      spark.sql(s"SELECT time_bucket_gapfill($HOUR, timestamp) AS b, " +
        s"locf(sum(value)) AS s FROM $v WHERE timestamp >= 0 AND " +
        s"timestamp < $DAY GROUP BY 1").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null &&
      (m.contains("did not rewrite") || m.contains("no TimeSeriesStore"))),
      s"expected the unrouted/unregistered gapfill error, got: ${chain(e)}")
  }
}

package graft

import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
import graft.model._
import java.nio.file.Files
import scala.util.Random

/** The routed-engine catch-all law: for ANY QueryModel,
  * `execute(store, qm, rollups)` — which may answer from a rollup, the
  * metadata-stats fold, a tag-bloom-pruned scan, a ts-range-pruned
  * point probe, or the raw scan — must be indistinguishable from the
  * unrouted `execute(store.current(), qm)`: identical errors
  * (IllegalQuery / NoData with exact messages / EmptyAverage) or
  * identical rows (1e-9 relative tolerance on the reassociated
  * sum/avg doubles). 150 seeded-random shapes over a mutation-walked
  * store with an hourly+daily pyramid registered, spanning aligned /
  * ragged / empty / inverted bounds, present / absent tags and
  * timestamps, every groupBy × agg × sort × limit combination, and
  * deliberately invalid models.
  */
class EngineRouteFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L
  private val HOUR = 3600000L

  /** Shared mutation-walked fixture: store + hourly/daily pyramid with
    * a hot tail the rollups don't reflect (both tests fuzz over it). */
  private lazy val (st, rollups) = {
    val rnd = new Random(20260815L)
    val tags = Seq("alpha", "beta", "gamma")
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("fuzz-store").toString)
    val rows = for {
      d <- 0L until 6L; t <- tags; r <- 0 until 8
    } yield TS(d * DAY + rnd.nextInt(86400000).toLong, t,
      math.rint(rnd.nextDouble() * 200 - 100) / 10)
    assert(st.insert(rows.distinctBy(r => (r.timestamp, r.tag)).toDS()).isRight)
    // mutation walk so sidecars/rollups cover rewritten partitions too
    val anyKey = rows.head
    assert(st.update(Seq(anyKey.copy(value = 42.0)).toDS()).isRight)
    assert(st.insert(Seq(TS(2 * DAY + 123L, "late", 7.5)).toDS()).isRight)
    st.compact()
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("fuzz-hourly").toString, bucketMs = HOUR)
    val daily = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("fuzz-daily").toString)
    hourly.refresh(); daily.refresh()
    // …and a hot tail the rollups don't reflect (hybrid path in play)
    assert(st.insert(Seq(TS(5 * DAY + 999L, "alpha", -3.25)).toDS()).isRight)
    (st, Seq(hourly, daily))
  }

  private lazy val fixtureRows: Seq[TS] = {
    val rnd = new Random(20260815L)
    val tags = Seq("alpha", "beta", "gamma")
    (for {
      d <- 0L until 6L; t <- tags; r <- 0 until 8
    } yield TS(d * DAY + rnd.nextInt(86400000).toLong, t,
      math.rint(rnd.nextDouble() * 200 - 100) / 10)).toSeq
  }

  test("randomized law: routed engine ≡ raw engine across the full shape space") {
    val rnd = new Random(20260815L + 1)
    val tags = Seq("alpha", "beta", "gamma")
    val rows = fixtureRows

    def someTs(): Long = rnd.nextInt(4) match {
      case 0 => rows(rnd.nextInt(rows.size)).timestamp // present
      case 1 => rnd.nextInt(6).toLong * DAY            // aligned
      case 2 => rnd.nextInt(6 * 24).toLong * HOUR      // hour-aligned
      case _ => rnd.nextLong(7 * DAY)                  // arbitrary
    }
    def genQm(): QueryModel = {
      def opt[A](p: Double)(a: => A): Option[A] =
        if (rnd.nextDouble() < p) Some(a) else None
      val tsEq = opt(0.15)(someTs())
      val (gt, ge, lt, le) =
        if (tsEq.isDefined && rnd.nextDouble() < 0.9) (None, None, None, None)
        else {
          val lo = opt(0.5)(someTs())
          val hi = opt(0.5)(someTs())
          (if (rnd.nextBoolean()) lo else None,
            if (lo.isDefined && rnd.nextBoolean()) lo else None,
            if (rnd.nextBoolean()) hi else None,
            if (hi.isDefined && rnd.nextBoolean()) hi else None)
        }
      QueryModel(
        gt = gt, ge = ge, lt = lt, le = le, tsEq = tsEq,
        tagEq = opt(0.3)(if (rnd.nextBoolean()) tags(rnd.nextInt(3)) else "ghost"),
        aggFunc = opt(0.7)(Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min,
          Agg.Max)(rnd.nextInt(5))),
        groupBy = opt(0.4)(if (rnd.nextBoolean()) GroupBy.Tag else GroupBy.Timestamp),
        sort = if (rnd.nextBoolean()) SortDir.Asc else SortDir.Desc,
        limit = opt(0.3)(rnd.nextInt(10) + 1))
    }

    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    def closeEnough(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Double, y: Double) =>
        (x.isNaN && y.isNaN) || x == y ||
          math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
      case (x, y) => x == y
    }

    var routedSomething = 0
    (1 to 150).foreach { i =>
      val qm = genQm()
      val routed = QueryEngine.execute(st, qm, rollups)
      val raw = QueryEngine.execute(st.current(), qm)
      (routed, raw) match {
        case (Left(a), Left(b)) =>
          assert(a == b, s"[case $i] error mismatch for $qm: $a vs $b")
        case (Right(a), Right(b)) =>
          val (ra, rb) = (canon(a), canon(b))
          assert(ra.size == rb.size &&
            ra.zip(rb).forall { case (x, y) =>
              x.size == y.size && x.zip(y).forall((closeEnough _).tupled)
            },
            s"[case $i] rows diverged for $qm:\n routed=$ra\n raw=$rb")
          routedSomething += 1
        case (a, b) =>
          fail(s"[case $i] one path errored for $qm: routed=$a raw=$b")
      }
    }
    assert(routedSomething >= 50,
      s"only $routedSomething/150 cases executed both paths — generator too narrow")
  }

  test("gt/le bounds route identically to their ge/lt-normalized twins") {
    // round-9 residual #1: `gt v ≡ ge v+1` and `le v ≡ lt v+1` at ms
    // granularity, so a QueryModel written in gt/le form must get the
    // SAME plan as its normalized twin — not silently fall off the
    // rollup/MetaStats fast paths onto the O(events) raw scan. The law
    // is plan-equality (sameResult on the optimized plans) AND
    // result-equality, over random bound shapes including exactly the
    // trap case the verdict named (gt = bucketStart − 1). At least one
    // case must prove a gt-form query ROUTES (rollup/metadata plan,
    // i.e. no raw store segment in the scan).
    val rnd = new Random(424242L)
    val tags = Seq("alpha", "beta", "gamma")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    var routedGtForm = 0
    (1 to 60).foreach { i =>
      // bounds biased to bucket edges ± 1 so both the aligned-via-
      // normalization and genuinely-ragged cases occur
      def edge(): Long = {
        val b = rnd.nextInt(6 * 24).toLong * HOUR
        rnd.nextInt(3) match {
          case 0 => b - 1
          case 1 => b
          case _ => b + rnd.nextInt(1000).toLong
        }
      }
      val useGt = rnd.nextBoolean()
      val useLe = rnd.nextBoolean()
      val lo = edge(); val hi = edge()
      val qm = QueryModel(
        gt = if (useGt) Some(lo) else None,
        ge = if (!useGt) Some(lo) else None,
        lt = if (!useLe) Some(hi) else None,
        le = if (useLe) Some(hi) else None,
        tagEq = if (rnd.nextBoolean()) Some(tags(rnd.nextInt(3))) else None,
        aggFunc = Some(Seq(Agg.Count, Agg.Sum, Agg.Avg, Agg.Min,
          Agg.Max)(rnd.nextInt(5))),
        groupBy = if (rnd.nextBoolean()) Some(GroupBy.Tag) else None)
      val twin = QueryModel.canonicalTsBounds(qm)
      val a = QueryEngine.execute(st, qm, rollups)
      val b = QueryEngine.execute(st, twin, rollups)
      (a, b) match {
        case (Left(x), Left(y)) => assert(x == y, s"[case $i] $qm errors diverged")
        case (Right(x), Right(y)) =>
          assert(x.queryExecution.optimizedPlan
              .sameResult(y.queryExecution.optimizedPlan),
            s"[case $i] $qm plan diverged from normalized twin:\n" +
              s"${x.queryExecution.optimizedPlan}\nvs\n${y.queryExecution.optimizedPlan}")
          assert(canon(x) == canon(y), s"[case $i] $qm rows diverged")
          // "routed" = the plan reads rollup segments, or no store
          // files at all (the MetaStats literal plan). A hybrid routed
          // plan still names raw partitions for the hot-tail days, so
          // the raw path is detected by rollup-segment ABSENCE.
          val p = x.queryExecution.optimizedPlan.toString
          val routed = p.contains("fuzz-hourly") || p.contains("fuzz-daily") ||
            !p.contains("fuzz-store")
          if ((qm.gt.isDefined || qm.le.isDefined) && routed) routedGtForm += 1
        case (x, y) => fail(s"[case $i] $qm one side errored: $x vs $y")
      }
    }
    assert(routedGtForm >= 3,
      s"only $routedGtForm gt/le-form queries actually routed off the raw " +
        "scan — the normalization is not reaching the rollup gate")
  }
}

package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.api.Server
import graft.engine.{ContinuousAggregate, TimeSeriesStore}
import graft.model._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import scala.util.Random

/** Randomized wire-parity law for the WHOLE HTTP surface — the
  * reference's only user surface (server/src/Api.hs:31-38).
  *
  * For every seeded-random QueryModel (rendered as a wire JSON body
  * with shuffled field order), the live server's response must be
  * BYTE-identical to a pure-Scala reference model evaluated over the
  * driver-side row list: same status code, same JSON bytes on 200,
  * same error text on 400. The reference model re-types the validation
  * messages, the three QueryR shapes (including the tagEq+tsEq
  * scalar short-circuit, Queries/Tag.hs:67), the guard order
  * (tag miss → tsEq miss → "Average failed."), the mempty folds
  * (sum 0, min +∞, max −∞ → JSON null), and the tagEq singleton
  * group — all independent of the engine/encoder code, so the law covers JSON
  * parse, validation, rollup routing, sidecar fast paths, refolds,
  * result encoding and HTTP transport in one composition.
  *
  * Byte-exactness is deliberate, not hopeful: every fixture value is
  * an exact quarter (k/4, |k| ≤ 200), so ANY fold association — raw
  * scan, hourly/daily rollup refold, window refold, sequential
  * driver-side fold — produces bit-identical doubles, and Jackson
  * formats both sides. A sum that differed in the last ulp would be a
  * real association-visible result change, and the law would rightly
  * fail.
  *
  * The series routes (`?points=`, `?window=`) get the same treatment
  * with a driver-side window fold as the oracle, plus the routing
  * tripwire that hour-aligned `points` bounds MUST be served at a
  * rollup-grain width (the O(buckets) path, not the raw scan).
  */
class ApiFuzzSpec extends SparkSpec {

  private val DAY = 86400000L
  private val HOUR = 3600000L
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()
  private val fixTags = Vector("alpha", "beta", "gamma")

  /** Fixture store + hourly/daily rollups behind a LIVE server; all
    * mutations go through the wire (insert ×2, update, late insert) so
    * the fixture itself exercises S1/S2 and the post-mutation rollup
    * refresh. `rows` is the driver-side truth the reference model
    * evaluates over.
    */
  private lazy val (server, base, rows) = {
    val rnd = new Random(20260816L)
    def v(): Double = math.rint(rnd.nextDouble() * 400 - 200) / 4.0
    def mk(d0: Int, d1: Int): Vector[TS] =
      (for { d <- d0 until d1; t <- fixTags; _ <- 0 until 6 }
        yield TS(d * DAY + rnd.nextInt(86400000).toLong, t, v()))
        .toVector.distinctBy(r => (r.timestamp, r.tag))
    val batch1 = mk(0, 2)
    val batch2 = mk(2, 4)
    val late = TS(3 * DAY + 999L, "late", -3.25)

    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("apifuzz-store").toString)
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("apifuzz-hourly").toString, bucketMs = HOUR)
    val daily = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("apifuzz-daily").toString)
    val srv = new Server(spark, st, 0, Seq(hourly, daily)).start()
    val b = s"http://127.0.0.1:${srv.boundPort}"

    def tsJson(rs: Seq[TS]): String = rs.map(r =>
      s"""{"timestamp":${r.timestamp},"tag":"${r.tag}","value":${r.value}}""")
      .mkString("[", ",", "]")
    def call(method: String, path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(URI.create(b + path))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    assert(call("POST", "/timeseries", tsJson(batch1)) == (200, "[]"))
    assert(call("POST", "/timeseries", tsJson(batch2)) == (200, "[]"))
    val updated = batch1.head.copy(value = 42.0)
    assert(call("PUT", "/timeseries", tsJson(Seq(updated))) == (200, "[]"))
    assert(call("POST", "/timeseries", tsJson(Seq(late))) == (200, "[]"))

    val truth = (updated +: batch1.tail) ++ batch2 :+ late
    (srv, b, truth)
  }

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def call(method: String, path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def putD(o: ObjectNode, name: String, v: Double): Unit =
    if (java.lang.Double.isFinite(v)) { o.put(name, v); () } else { o.putNull(name); () }

  // ---------------------------------------------------------------
  // the pure-Scala reference model: QueryModel → (status, body)
  // ---------------------------------------------------------------

  private def fold(agg: Agg, vs: Seq[Double]): Double = agg match {
    case Agg.Count => vs.size.toDouble
    case Agg.Sum   => vs.sum
    case Agg.Avg   => vs.sum / vs.size
    case Agg.Min   => if (vs.isEmpty) Double.PositiveInfinity else vs.min
    case Agg.Max   => if (vs.isEmpty) Double.NegativeInfinity else vs.max
  }

  private def refAnswer(all: Vector[TS], qm: QueryModel): (Int, String) = {
    // 1. validation — messages re-typed from the reference's illegalQM
    //    (Model.hs:126-134), not imported from graft.model.Validation
    if (qm.groupBy.isDefined && qm.aggFunc.isEmpty)
      return (400, "You must provie 'aggFunc' with 'groupBy'.")
    if (qm.gt.isDefined && qm.ge.isDefined)
      return (400, "Can't query 'gt' and 'ge' at the same time.")
    if (qm.lt.isDefined && qm.le.isDefined)
      return (400, "Can't query 'lt' and 'le' at the same time.")
    if (qm.tsEq.isDefined && (qm.gt.isDefined || qm.ge.isDefined ||
        qm.lt.isDefined || qm.le.isDefined))
      return (400, "Can't query 'tsEq' with any other timestamp condition.")

    def keep(r: TS): Boolean =
      qm.gt.forall(r.timestamp > _) && qm.ge.forall(r.timestamp >= _) &&
        qm.lt.forall(r.timestamp < _) && qm.le.forall(r.timestamp <= _) &&
        qm.tsEq.forall(r.timestamp == _) && qm.tagEq.forall(r.tag == _)
    val hits = all.filter(keep)

    // 2. result shape, tagEq+tsEq scalar short-circuit included
    sealed trait Shape
    case object Collect extends Shape
    case class Grouped(by: GroupBy) extends Shape
    case object Scalar extends Shape
    val shape: Shape = (qm.aggFunc, qm.groupBy) match {
      case (None, _) => Collect
      case (Some(_), Some(_)) if qm.tagEq.isDefined && qm.tsEq.isDefined => Scalar
      case (Some(_), Some(gb)) => Grouped(gb)
      case (Some(_), None) => Scalar
    }

    // 3. guards, in engine order: tag miss, tsEq miss, empty scalar avg
    for (t <- qm.tagEq)
      if (!all.exists(_.tag == t)) return (400, s"""No data for tag "$t".""")
    val tsEqErrors = qm.tsEq.isDefined &&
      (qm.tagEq.isDefined || !qm.groupBy.contains(GroupBy.Tag))
    for (t <- qm.tsEq)
      if (tsEqErrors && hits.isEmpty) return (400, s"No data for timestamp $t.")
    if (qm.aggFunc.contains(Agg.Avg) && shape == Scalar && hits.isEmpty)
      return (400, "Average failed.")

    // 4. evaluate + encode
    val body = shape match {
      case Collect =>
        val ordered = qm.sort match {
          case SortDir.Asc => hits.sortBy(r => (r.timestamp, r.tag))
          case SortDir.Desc => hits.sortBy(r => (r.timestamp, r.tag))(
            Ordering.Tuple2(Ordering.Long.reverse, Ordering.String))
        }
        val arr = mapper.createArrayNode()
        qm.limit.fold(ordered)(ordered.take).foreach { r =>
          val o = arr.addObject()
          o.put("timestamp", r.timestamp); o.put("tag", r.tag)
          putD(o, "value", r.value)
        }
        mapper.writeValueAsString(arr)
      case Grouped(GroupBy.Tag) =>
        val agg = qm.aggFunc.get
        val groups = hits.groupBy(_.tag).view
          .mapValues(g => fold(agg, g.map(_.value))).toMap
        // tagEq always yields its singleton group, mempty-folded over
        // an empty range (queryTag', Tag.hs:27-29); the grouped avg is
        // `fromMaybe 0` there (Queries.hs:151), NOT NaN → null
        def memptyVal: Double = agg match {
          case Agg.Count | Agg.Sum | Agg.Avg => 0.0
          case Agg.Min => Double.PositiveInfinity
          case Agg.Max => Double.NegativeInfinity
        }
        val withSingleton = qm.tagEq.filterNot(groups.contains)
          .fold(groups)(t => groups + (t -> memptyVal))
        val arr = mapper.createArrayNode()
        qm.limit.fold(withSingleton.toSeq.sortBy(_._1))(
          withSingleton.toSeq.sortBy(_._1).take(_)).foreach { case (t, v) =>
          val o = arr.addObject(); o.put("group", t); putD(o, "result", v)
        }
        mapper.writeValueAsString(arr)
      case Grouped(GroupBy.Timestamp) =>
        val agg = qm.aggFunc.get
        val groups = hits.groupBy(_.timestamp).view
          .mapValues(g => fold(agg, g.map(_.value))).toSeq
        val ordered = qm.sort match {
          case SortDir.Asc  => groups.sortBy(_._1)
          case SortDir.Desc => groups.sortBy(_._1)(Ordering.Long.reverse)
        }
        val arr = mapper.createArrayNode()
        qm.limit.fold(ordered)(ordered.take).foreach { case (ts, v) =>
          val o = arr.addObject(); o.put("group", ts); putD(o, "result", v)
        }
        mapper.writeValueAsString(arr)
      case Scalar =>
        val o = mapper.createObjectNode()
        putD(o, "result", fold(qm.aggFunc.get, hits.map(_.value)))
        mapper.writeValueAsString(o)
    }
    (200, body)
  }

  // ---------------------------------------------------------------
  // wire rendering: shuffled field order, optional explicit nulls
  // ---------------------------------------------------------------

  private def renderBody(qm: QueryModel, rnd: Random): String = {
    val fs = scala.collection.mutable.ArrayBuffer.empty[String]
    qm.gt.foreach(x => fs += s""""gt":$x""")
    qm.ge.foreach(x => fs += s""""ge":$x""")
    qm.lt.foreach(x => fs += s""""lt":$x""")
    qm.le.foreach(x => fs += s""""le":$x""")
    qm.tsEq.foreach(x => fs += s""""tsEq":$x""")
    qm.tagEq.foreach(t => fs += s""""tagEq":"$t"""")
    qm.aggFunc.foreach(a => fs += s""""aggFunc":"${a.name}"""")
    qm.groupBy.foreach(g => fs += s""""groupBy":"${g.name}"""")
    if (qm.sort == SortDir.Desc || rnd.nextBoolean())
      fs += s""""sort":"${qm.sort.name}""""
    qm.limit.foreach(l => fs += s""""limit":$l""")
    // aeson parity: explicit null decodes as absent
    if (qm.tagEq.isEmpty && rnd.nextDouble() < 0.15) fs += """"tagEq":null"""
    rnd.shuffle(fs).mkString("{", ",", "}")
  }

  private def someTs(rnd: Random): Long = rnd.nextInt(5) match {
    case 0 => rows(rnd.nextInt(rows.size)).timestamp // present
    case 1 => rnd.nextInt(5).toLong * DAY            // day-aligned
    case 2 => rnd.nextInt(5 * 24).toLong * HOUR      // hour-aligned
    case 3 if rnd.nextBoolean() => 0L                // edges
    case 3 => Long.MaxValue
    case _ => rnd.nextLong(5 * DAY)                  // arbitrary
  }

  private def genQm(rnd: Random): QueryModel = {
    def opt[A](p: Double)(a: => A): Option[A] =
      if (rnd.nextDouble() < p) Some(a) else None
    val tsEq = opt(0.15)(someTs(rnd))
    val (gt, ge, lt, le) =
      if (tsEq.isDefined && rnd.nextDouble() < 0.85) (None, None, None, None)
      else {
        val lo = opt(0.5)(someTs(rnd))
        val hi = opt(0.5)(someTs(rnd))
        (if (rnd.nextBoolean()) lo else None,
          if (lo.isDefined && rnd.nextBoolean()) lo else None,
          if (rnd.nextBoolean()) hi else None,
          if (hi.isDefined && rnd.nextBoolean()) hi else None)
      }
    QueryModel(
      gt = gt, ge = ge, lt = lt, le = le, tsEq = tsEq,
      tagEq = opt(0.3)(if (rnd.nextBoolean()) fixTags(rnd.nextInt(3)) else "ghost"),
      aggFunc = opt(0.7)(Agg.all(rnd.nextInt(Agg.all.size))),
      groupBy = opt(0.4)(if (rnd.nextBoolean()) GroupBy.Tag else GroupBy.Timestamp),
      sort = if (rnd.nextBoolean()) SortDir.Asc else SortDir.Desc,
      limit = opt(0.3)(if (rnd.nextDouble() < 0.1) 0 else rnd.nextInt(10) + 1))
  }

  /** Handcrafted models pinning the paths a 60-case random draw can
    * miss (verified by mutation: dropping the reference model's
    * singleton-group rule survived the random sweep alone). Each runs
    * through the same wire-parity assert as the random cases.
    */
  private def directedCases: Seq[QueryModel] = {
    val present = rows.head
    Seq(
      // tagEq singleton group over an EMPTY range: the reference emits
      // the mempty-folded group, not [] (queryTag', Tag.hs:27-29) —
      // one per agg so every mempty value crosses the wire
      QueryModel(ge = Some(20 * DAY), tagEq = Some("alpha"),
        aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)),
      QueryModel(ge = Some(20 * DAY), tagEq = Some("alpha"),
        aggFunc = Some(Agg.Min), groupBy = Some(GroupBy.Tag)),
      QueryModel(ge = Some(20 * DAY), tagEq = Some("alpha"),
        aggFunc = Some(Agg.Max), groupBy = Some(GroupBy.Tag)),
      QueryModel(ge = Some(20 * DAY), tagEq = Some("alpha"),
        aggFunc = Some(Agg.Avg), groupBy = Some(GroupBy.Tag)),
      QueryModel(ge = Some(20 * DAY), tagEq = Some("alpha"),
        aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)),
      // groupBy=tag + tsEq WITHOUT tagEq: a tsEq miss returns [] here,
      // not NoData (Tag.hs:49-53)
      QueryModel(tsEq = Some(13L), aggFunc = Some(Agg.Sum),
        groupBy = Some(GroupBy.Tag)),
      // ...but WITH tagEq the scalar short-circuit + NoData applies
      QueryModel(tsEq = Some(13L), tagEq = Some("alpha"),
        aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)),
      // tsEq hit through the short-circuit: scalar, not grouped
      QueryModel(tsEq = Some(present.timestamp), tagEq = Some(present.tag),
        aggFunc = Some(Agg.Max), groupBy = Some(GroupBy.Timestamp)),
      // scalar avg over an empty range: "Average failed."
      QueryModel(ge = Some(20 * DAY), aggFunc = Some(Agg.Avg)),
      // scalar min/max over an empty range: ±∞ → JSON null
      QueryModel(ge = Some(20 * DAY), aggFunc = Some(Agg.Min)),
      QueryModel(ge = Some(20 * DAY), aggFunc = Some(Agg.Max)),
      // limit 0 (Haskell take 0) and limit on groups
      QueryModel(limit = Some(0)),
      QueryModel(aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag),
        limit = Some(2)),
      // desc collect: ties on timestamp break by tag asc
      QueryModel(sort = SortDir.Desc),
      // canonicalization edges: gt/le MaxValue, gt 0, le of a present ts
      QueryModel(gt = Some(Long.MaxValue)),
      QueryModel(le = Some(Long.MaxValue), aggFunc = Some(Agg.Count)),
      QueryModel(gt = Some(0L), le = Some(present.timestamp),
        aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Timestamp),
        sort = SortDir.Desc, limit = Some(3)))
  }

  test("randomized wire parity: live HTTP ≡ pure-Scala reference model, byte-exact") {
    val rnd = new Random(20260816L + 1)
    var oks = 0; var errs = 0; var exports = 0
    val cases = directedCases.map(qm => (qm, renderBody(qm, rnd))) ++
      (1 to 60).map { _ => val qm = genQm(rnd); (qm, renderBody(qm, rnd)) }
    cases.zipWithIndex.foreach { case ((qm, body), i) =>
      val expected = refAnswer(rows, qm)
      val got = call("POST", "/timeseries/query", body)
      assert(got == expected,
        s"[case $i] wire mismatch for $qm\n body=$body\n got=$got\n expected=$expected")
      if (expected._1 == 200) {
        oks += 1
        // the export download must stream the SAME bytes the plain
        // route encodes (streamResult ≡ encodeResult over the full
        // shape space, not just the fixed QueryJsonSpec cases)
        if (exports < 15) {
          exports += 1
          assert(call("POST", "/timeseries/query?export=true", body) == expected,
            s"[case $i] export body diverged from query body for $qm")
        }
      } else errs += 1
    }
    assert(oks >= 20, s"generator too narrow: only $oks/${cases.size} cases answered 200")
    assert(errs >= 10, s"generator too narrow: only $errs/${cases.size} cases answered 400")
  }

  test("malformed and ill-typed bodies: exact 400 texts through the wire") {
    assert(call("POST", "/timeseries/query", """{"gt":"x"}""")
      == (400, "Field 'gt' must be an integer."))
    assert(call("POST", "/timeseries/query", """{"limit":1.5}""")
      == (400, "Field 'limit' must be an integer."))
    assert(call("POST", "/timeseries/query", """{"tagEq":7}""")
      == (400, "Field 'tagEq' must be a string."))
    assert(call("POST", "/timeseries/query", """{"aggFunc":"median"}""")
      == (400, "Invalid value for 'aggFunc': median"))
    assert(call("POST", "/timeseries/query", """{"bogus":1}""")
      == (400, "Unknown field: bogus"))
    assert(call("POST", "/timeseries/query", """[1,2]""")
      == (400, "Expected a JSON object."))
    val (code, msg) = call("POST", "/timeseries/query", "{{{")
    assert(code == 400 && msg.startsWith("Malformed JSON:"))
  }

  // ---------------------------------------------------------------
  // series routes: driver-side window folds as the oracle
  // ---------------------------------------------------------------

  private def seriesJson(width: Long, slide: Long,
                         cells: Seq[(Long, String, Seq[Double])]): String = {
    val root = mapper.createObjectNode()
    root.put("width", width); root.put("slide", slide)
    val arr = root.putArray("series")
    cells.sortBy(c => (c._1, c._2)).foreach { case (ws, tag, vs) =>
      val o = arr.addObject()
      o.put("window_start", ws); o.put("tag", tag)
      o.put("cnt", vs.size.toLong)
      putD(o, "sum_val", vs.sum); putD(o, "min_val", vs.min)
      putD(o, "max_val", vs.max)
    }
    mapper.writeValueAsString(root)
  }

  /** Driver-side truth for the `?window` route: every row lands in
    * width/slide hopping windows anchored on the slide grid; tagEq and
    * canonicalized window_start bounds post-filter (both group keys).
    */
  private def windowCells(width: Long, slide: Long, qm: QueryModel)
      : Seq[(Long, String, Seq[Double])] = {
    val n = (width / slide).toInt
    val qmC = QueryModel.canonicalTsBounds(qm)
    rows.flatMap(r => (0 until n).map(i =>
        ((Math.floorDiv(r.timestamp, slide) - i) * slide, r.tag, r.value)))
      .groupBy(c => (c._1, c._2)).toSeq
      .map { case ((ws, t), cs) => (ws, t, cs.map(_._3)) }
      .filter { case (ws, t, _) =>
        qm.tagEq.forall(t == _) && qmC.ge.forall(ws >= _) &&
          qmC.lt.forall(ws < _) && qmC.gt.forall(ws > _)
      }
  }

  /** Driver-side truth for the `?points` route at the width the server
    * chose: `ge`-anchored tumbling windows over rows in [ge, lt). */
  private def pointsCells(ge: Long, lt: Long, width: Long, qm: QueryModel)
      : Seq[(Long, String, Seq[Double])] =
    rows.filter(r => r.timestamp >= ge && r.timestamp < lt)
      .map(r => (Math.floorDiv(r.timestamp - ge, width) * width + ge, r.tag, r.value))
      .groupBy(c => (c._1, c._2)).toSeq
      .map { case ((ws, t), cs) => (ws, t, cs.map(_._3)) }
      .filter { case (_, t, _) => qm.tagEq.forall(t == _) }

  private def renderSeriesBody(qm: QueryModel, rnd: Random): String = {
    val fs = scala.collection.mutable.ArrayBuffer.empty[String]
    qm.gt.foreach(x => fs += s""""gt":$x""")
    qm.ge.foreach(x => fs += s""""ge":$x""")
    qm.lt.foreach(x => fs += s""""lt":$x""")
    qm.le.foreach(x => fs += s""""le":$x""")
    qm.tagEq.foreach(t => fs += s""""tagEq":"$t"""")
    if (fs.isEmpty && rnd.nextBoolean()) "" // empty body = no filters
    else rnd.shuffle(fs).mkString("{", ",", "}")
  }

  test("randomized series parity: ?window and ?points ≡ driver-side window folds") {
    val rnd = new Random(20260816L + 2)
    val slides = Vector(15 * 60000L, HOUR, 2 * HOUR, DAY)
    var nonEmpty = 0
    (1 to 25).foreach { i =>
      val slide = slides(rnd.nextInt(slides.size))
      val width = slide * (rnd.nextInt(4) + 1)
      def opt[A](p: Double)(a: => A): Option[A] =
        if (rnd.nextDouble() < p) Some(a) else None
      val lo = opt(0.4)(someTs(rnd)); val hi = opt(0.4)(someTs(rnd))
      val qm = QueryModel(
        gt = if (rnd.nextBoolean()) lo else None,
        ge = if (rnd.nextBoolean()) lo else None,
        lt = if (rnd.nextBoolean()) hi else None,
        le = if (rnd.nextBoolean()) hi else None,
        tagEq = opt(0.3)(if (rnd.nextBoolean()) fixTags(rnd.nextInt(3)) else "late"))
      val qmOk = if (qm.gt.isDefined && qm.ge.isDefined) qm.copy(gt = None)
        else if (qm.lt.isDefined && qm.le.isDefined) qm.copy(le = None) else qm
      val body = renderSeriesBody(qmOk, rnd)
      val slideParam = if (slide == width && rnd.nextBoolean()) ""
        else s"&slide=$slide"
      val got = call("POST", s"/timeseries/query?window=$width$slideParam", body)
      val cells = windowCells(width, slide, qmOk)
      assert(got == (200, seriesJson(width, slide, cells)),
        s"[case $i] window series mismatch for width=$width slide=$slide $qmOk\n got=$got")
      if (cells.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 8, s"generator too narrow: only $nonEmpty/25 window cases non-empty")

    var routedPts = 0
    (1 to 25).foreach { i =>
      // bounds: half the cases rollup-aligned so the refold path serves
      val aligned = rnd.nextBoolean()
      val (ge, lt) =
        if (aligned) {
          val a = rnd.nextInt(4 * 24).toLong * HOUR
          (a, a + (rnd.nextInt(48) + 1).toLong * HOUR)
        } else {
          val a = rnd.nextLong(4 * DAY)
          (a, a + rnd.nextLong(2 * DAY) + 1)
        }
      val points = rnd.nextInt(50) + 1
      val qm = QueryModel(ge = Some(ge), lt = Some(lt),
        tagEq = if (rnd.nextDouble() < 0.3) Some(fixTags(rnd.nextInt(3))) else None)
      val got = call("POST", s"/timeseries/query?points=$points",
        renderSeriesBody(qm, rnd))
      assert(got._1 == 200, s"[case $i] points route failed: $got")
      val node = mapper.readTree(got._2)
      val width = node.get("width").asLong()
      assert(node.get("slide").asLong() == width)
      // the resolution contract: ≤ points windows cover [ge, lt)
      assert(width >= ((lt - ge) + points - 1) / points,
        s"[case $i] width $width yields more than $points windows over [$ge, $lt)")
      // routing tripwire: hour-aligned bounds MUST be served off a
      // rollup (grain-multiple width), never the raw resolution scan
      if (aligned) {
        assert(width % HOUR == 0,
          s"[case $i] aligned bounds [$ge, $lt) answered at raw width $width")
        routedPts += 1
      }
      assert(got == (200, seriesJson(width, width, pointsCells(ge, lt, width, qm))),
        s"[case $i] points series mismatch at width=$width for [$ge,$lt) $qm\n got=$got")
    }
    assert(routedPts >= 6, s"only $routedPts/25 points cases exercised the rollup path")
  }

  // ---------------------------------------------------------------
  // gapfill route: pure-Scala LOCF/interp/zero model as the oracle
  // ---------------------------------------------------------------

  /** Driver-side truth for `?gapfill=`: dense (tag, bucket) grid over
    * [ge, lt) at `grain`, per-bucket fold from raw rows, then the fill
    * policy replayed sequentially. Interp uses the engine's exact
    * linear form `(pv·(nb−b) + nv·(b−pb)) / (nb−pb)` so the IEEE ops
    * match bit-for-bit.
    */
  private def refGapFill(grain: Long, ge: Long, lt: Long, agg: Agg,
                         fill: String, tagEq: Option[String])
      : Seq[(String, Long, Option[Double])] = {
    val inWin = rows.filter(r => r.timestamp >= ge && r.timestamp < lt &&
      tagEq.forall(r.tag == _))
    val obs: Map[(String, Long), Double] = inWin
      .groupBy(r => (r.tag, Math.floorDiv(r.timestamp, grain) * grain))
      .view.mapValues(g => fold(agg, g.map(_.value))).toMap
    // tags = observed in the window, or exactly tagEq (dense all-null
    // series even for a tag with no data — the singleton stance)
    val seriesTags: Seq[String] =
      tagEq.fold[Seq[String]](inWin.map(_.tag).distinct.sorted)(Seq(_))
    val buckets = (ge until lt by grain).toVector
    seriesTags.flatMap { t =>
      val series = buckets.map(b => (b, obs.get((t, b))))
      val filled: Seq[(Long, Option[Double])] = fill match {
        case "none" => series
        case "zero" => series.map { case (b, v) => (b, Some(v.getOrElse(0.0))) }
        case "locf" =>
          var last: Option[Double] = None
          series.map { case (b, v) =>
            if (v.isDefined) { last = v; (b, v) } else (b, last) }
        case "interp" =>
          series.map { case (b, v) =>
            if (v.isDefined) (b, v)
            else {
              val prev = series.filter(s => s._1 < b && s._2.isDefined).lastOption
              val next = series.find(s => s._1 > b && s._2.isDefined)
              val interp = for { (pb, pvO) <- prev; (nb, nvO) <- next }
                yield (pvO.get * (nb - b) + nvO.get * (b - pb)) / (nb - pb)
              (b, interp)
            }
          }
      }
      filled.map { case (b, v) => (t, b, v) }
    }
  }

  private def gapFillJson(grain: Long,
                          cells: Seq[(String, Long, Option[Double])]): String = {
    val root = mapper.createObjectNode()
    root.put("grain", grain)
    val arr = root.putArray("series")
    cells.sortBy(c => (c._1, c._2)).foreach { case (tag, b, v) =>
      val o = arr.addObject()
      o.put("tag", tag); o.put("bucket_start", b)
      v.fold[Unit] { o.putNull("value"); () } (putD(o, "value", _))
    }
    mapper.writeValueAsString(root)
  }

  test("randomized gapfill parity: ?gapfill ≡ pure-Scala grid model, byte-exact") {
    val rnd = new Random(20260816L + 3)
    val fills = Vector("none", "zero", "locf", "interp")
    var interped = 0
    (1 to 30).foreach { i =>
      // bounds hour-aligned (the finest registered rollup) or
      // day-aligned — the route must pick the FINEST aligned grain,
      // which is the hourly rollup in both cases (DAY % HOUR == 0)
      val unit = if (rnd.nextBoolean()) HOUR else DAY
      val a = rnd.nextInt(if (unit == HOUR) 4 * 24 else 4).toLong * unit
      val (ge, lt) = (a, a + (rnd.nextInt(if (unit == HOUR) 48 else 2) + 1) * unit)
      val fill = fills(rnd.nextInt(fills.size))
      val agg = Agg.all(rnd.nextInt(Agg.all.size))
      val tagEq = if (rnd.nextDouble() < 0.35)
        Some(if (rnd.nextBoolean()) fixTags(rnd.nextInt(3)) else "ghost")
      else None
      val body = tagEq.fold(s"""{"ge":$ge,"lt":$lt}""")(t =>
        s"""{"ge":$ge,"lt":$lt,"tagEq":"$t"}""")
      val aggParam = if (agg == Agg.Count && rnd.nextBoolean()) ""
        else s"&agg=${agg.name}"
      val got = call("POST", s"/timeseries/query?gapfill=$fill$aggParam", body)
      val expected = gapFillJson(HOUR, refGapFill(HOUR, ge, lt, agg, fill, tagEq))
      assert(got == (200, expected),
        s"[case $i] gapfill mismatch for fill=$fill agg=$agg [$ge,$lt) tagEq=$tagEq\n got=$got")
      if (fill == "interp" &&
          refGapFill(HOUR, ge, lt, agg, fill, tagEq).exists(_._3.isEmpty))
        interped += 1 // saw a one-sided interp edge staying null
    }
    assert(interped >= 1, "no interp case exercised a one-sided null edge")
  }

  test("gapfill route: exact 400 texts") {
    assert(call("POST", "/timeseries/query?gapfill=cubic", """{"ge":0,"lt":3600000}""")
      == (400, "'gapfill' must be one of locf, interp, zero, none."))
    assert(call("POST", "/timeseries/query?gapfill=locf&agg=median",
      """{"ge":0,"lt":3600000}""")
      == (400, "unknown 'agg': median."))
    assert(call("POST", "/timeseries/query?gapfill=locf", """{"ge":0}""")
      == (400, "'gapfill' requires both a lower and an upper timestamp bound."))
    assert(call("POST", "/timeseries/query?gapfill=locf", """{"ge":100,"lt":100}""")
      == (400, "'gapfill' requires both a lower and an upper timestamp bound."))
    // unaligned bounds: no rollup aligns — loud 400, never a raw scan
    assert(call("POST", "/timeseries/query?gapfill=locf", """{"ge":7,"lt":3600007}""")
      == (400, "no registered rollup aligns with the requested bounds."))
  }

  /** The sketch routes are approximate by design, so no byte oracle —
    * the law here is dispatch correctness: group support equals the
    * exact tags in the slice, estimates land inside the slice's exact
    * [min, max] (percentile) or within the spec-gated 10% HLL band
    * (distinct), and the empty slice encodes as null, not an error.
    */
  test("sketch routes: support + bounds laws over the wire") {
    val rnd = new Random(20260816L + 4)
    (1 to 12).foreach { i =>
      val aligned = rnd.nextBoolean() // rollup-routed half the time
      val (ge, lt) =
        if (aligned) { val a = rnd.nextInt(3 * 24).toLong * HOUR
          (a, a + (rnd.nextInt(24) + 1) * HOUR) }
        else { val a = rnd.nextLong(3 * DAY); (a, a + rnd.nextLong(DAY) + 1) }
      val slice = rows.filter(r => r.timestamp >= ge && r.timestamp < lt)
      val body = s"""{"ge":$ge,"lt":$lt}"""
      val q = math.rint(rnd.nextDouble() * 100) / 100.0
      val (pc, pBody) = call("POST", s"/timeseries/query?percentile=$q", body)
      assert(pc == 200, s"[case $i] percentile route failed: $pBody")
      val pNode = mapper.readTree(pBody)
      if (slice.isEmpty) assert(pNode.get("result").isNull)
      else {
        val est = pNode.get("result").asDouble()
        assert(est >= slice.map(_.value).min && est <= slice.map(_.value).max,
          s"[case $i] p$q=$est outside exact [min,max] of the slice")
      }
      val (dc, dBody) = call("POST", "/timeseries/query?distinct=true&by=tag", body)
      assert(dc == 200, s"[case $i] distinct route failed: $dBody")
      val arr = mapper.readTree(dBody)
      val gotTags = (0 until arr.size).map(arr.get(_).get("group").asText())
      assert(gotTags == slice.map(_.tag).distinct.sorted,
        s"[case $i] distinct-by-tag support diverged: $gotTags")
      (0 until arr.size).foreach { j =>
        val t = arr.get(j).get("group").asText()
        val exact = slice.filter(_.tag == t).map(_.value).distinct.size
        val est = arr.get(j).get("result").asDouble()
        assert(math.abs(est - exact) <= math.max(1.0, 0.1 * exact),
          s"[case $i] distinct($t)=$est vs exact $exact beyond 10%")
      }
    }
  }

  // ---------------------------------------------------------------
  // OHLC route: driver-side candlestick folds as the oracle
  // ---------------------------------------------------------------

  /** Driver-side truth for `?ohlc=W`: per (window, tag), open = value
    * at the earliest event, close at the latest (timestamps unique per
    * tag by the primary key), high/low = max/min. Bounds filter events;
    * the grid anchors at 0 (`ts div W · W`).
    */
  private def ohlcJson(width: Long, qm: QueryModel): String = {
    val qmC = QueryModel.canonicalTsBounds(qm)
    val inWin = rows.filter(r =>
      qmC.ge.forall(r.timestamp >= _) && qmC.lt.forall(r.timestamp < _) &&
        qmC.gt.forall(r.timestamp > _) && qm.tagEq.forall(r.tag == _))
    val root = mapper.createObjectNode()
    root.put("width", width)
    val arr = root.putArray("series")
    inWin.groupBy(r => (Math.floorDiv(r.timestamp, width) * width, r.tag))
      .toSeq.sortBy(_._1).foreach { case ((ws, tag), g) =>
        val o = arr.addObject()
        o.put("window_start", ws); o.put("tag", tag)
        putD(o, "open", g.minBy(_.timestamp).value)
        putD(o, "high", g.map(_.value).max)
        putD(o, "low", g.map(_.value).min)
        putD(o, "close", g.maxBy(_.timestamp).value)
      }
    mapper.writeValueAsString(root)
  }

  test("randomized OHLC parity: ?ohlc ≡ driver-side candlestick folds") {
    val rnd = new Random(20260816L + 5)
    val widths = Vector(30 * 60000L, HOUR, 6 * HOUR, DAY, 2 * DAY)
    var nonEmpty = 0
    (1 to 25).foreach { i =>
      val width = widths(rnd.nextInt(widths.size))
      def opt[A](p: Double)(a: => A): Option[A] =
        if (rnd.nextDouble() < p) Some(a) else None
      val lo = opt(0.4)(someTs(rnd)); val hi = opt(0.4)(someTs(rnd))
      val qm0 = QueryModel(
        gt = if (rnd.nextBoolean()) lo else None,
        ge = if (rnd.nextBoolean()) lo else None,
        lt = if (rnd.nextBoolean()) hi else None,
        le = if (rnd.nextBoolean()) hi else None,
        tagEq = opt(0.3)(if (rnd.nextBoolean()) fixTags(rnd.nextInt(3)) else "late"))
      val qm = if (qm0.gt.isDefined && qm0.ge.isDefined) qm0.copy(gt = None)
        else if (qm0.lt.isDefined && qm0.le.isDefined) qm0.copy(le = None) else qm0
      val got = call("POST", s"/timeseries/query?ohlc=$width",
        renderSeriesBody(qm, rnd))
      val exp = ohlcJson(width, qm)
      assert(got == (200, exp),
        s"[case $i] OHLC mismatch for width=$width $qm\n got=$got\n exp=$exp")
      if (exp.contains("window_start")) nonEmpty += 1
    }
    assert(nonEmpty >= 10, s"generator too narrow: only $nonEmpty/25 OHLC cases non-empty")
    // exact 400s
    assert(call("POST", "/timeseries/query?ohlc=0", "")
      == (400, "'ohlc' must be a positive window width."))
    assert(call("POST", "/timeseries/query?ohlc=x", "")
      == (400, "'ohlc' must be an integer."))
    assert(call("POST", s"/timeseries/query?ohlc=$HOUR", """{"limit":3}""")
      == (400, "Series routes take only timestamp bounds and 'tagEq' in the body."))
  }

  /** The fixture rollups carry no sketches, so `?top=k` always takes
    * the EXACT raw fallback — byte-comparable against a driver-side
    * count/rank model with the route's (count desc, item asc)
    * tie-break. (The sketch-routed estimates are SketchRollupSpec's
    * domain.)
    */
  test("randomized top-k parity: ?top ≡ driver-side exact counts") {
    val rnd = new Random(20260816L + 6)
    (1 to 15).foreach { i =>
      def opt[A](p: Double)(a: => A): Option[A] =
        if (rnd.nextDouble() < p) Some(a) else None
      val lo = opt(0.5)(someTs(rnd)); val hi = opt(0.5)(someTs(rnd))
      val qm = QueryModel(ge = lo, lt = hi,
        tagEq = opt(0.3)(fixTags(rnd.nextInt(3))))
      val k = rnd.nextInt(8) + 1
      val byTag = rnd.nextBoolean()
      val by = if (byTag) "&by=tag" else ""
      val got = call("POST", s"/timeseries/query?top=$k$by",
        renderSeriesBody(qm, rnd))
      val inWin = rows.filter(r =>
        qm.ge.forall(r.timestamp >= _) && qm.lt.forall(r.timestamp < _) &&
          qm.tagEq.forall(r.tag == _))
      val arr = mapper.createArrayNode()
      // items are the sketch vocabulary: value.cast(string), so the
      // tie-break is LEXICOGRAPHIC on the rendered double
      def ranked(g: Seq[TS]): Seq[(String, Long, Double)] =
        g.groupBy(_.value.toString).view.mapValues(_.size).toSeq
          .sortBy { case (item, cnt) => (-cnt, item) }.take(k)
          .zipWithIndex.map { case ((item, cnt), j) =>
            (item, (j + 1).toLong, cnt.toDouble) }
      if (byTag)
        inWin.map(_.tag).distinct.sorted.foreach { t =>
          ranked(inWin.filter(_.tag == t)).foreach { case (item, rank, est) =>
            val o = arr.addObject()
            o.put("group", t); o.put("rank", rank)
            o.put("item", item); putD(o, "est", est)
          }
        }
      else
        ranked(inWin).foreach { case (item, rank, est) =>
          val o = arr.addObject()
          o.put("rank", rank); o.put("item", item); putD(o, "est", est)
        }
      val exp = mapper.writeValueAsString(arr)
      assert(got == (200, exp),
        s"[case $i] top-$k mismatch (byTag=$byTag) for $qm\n got=$got\n exp=$exp")
    }
    assert(call("POST", "/timeseries/query?top=0", "")
      == (400, "'top' must be in [1, 1000]."))
    assert(call("POST", "/timeseries/query?top=x", "")
      == (400, "'top' must be an integer."))
  }

  /** The fixture rollups are not counter-mode, so `?increase` / `?twa`
    * take the exact raw twins — byte-comparable against driver-side
    * pair replays (quarter values keep the difference sums exact; the
    * TWA area is integer arithmetic by construction).
    */
  test("randomized counter-route parity: ?increase and ?twa ≡ driver-side pair folds") {
    val rnd = new Random(20260816L + 7)
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    (1 to 15).foreach { i =>
      def opt[A](p: Double)(a: => A): Option[A] =
        if (rnd.nextDouble() < p) Some(a) else None
      val lo = opt(0.5)(someTs(rnd)); val hi = opt(0.5)(someTs(rnd))
      val qm = QueryModel(ge = lo, lt = hi,
        tagEq = opt(0.3)(if (rnd.nextBoolean()) fixTags(rnd.nextInt(3)) else "ghost"))
      val inWin = rows.filter(r =>
        qm.ge.forall(r.timestamp >= _) && qm.lt.forall(r.timestamp < _) &&
          qm.tagEq.forall(r.tag == _))
      val byTag = inWin.groupBy(_.tag).view
        .mapValues(_.sortBy(_.timestamp)).toSeq.sortBy(_._1)

      val incArr = mapper.createArrayNode()
      byTag.foreach { case (t, g) =>
        var total = 0.0; var resets = 0L
        g.sliding(2).foreach {
          case Seq(a, b) =>
            if (b.value >= a.value) total += b.value - a.value
            else { total += b.value; resets += 1 }
          case _ => ()
        }
        val o = incArr.addObject()
        o.put("grp", t); putD(o, "total_increase", total)
        o.put("n_resets", resets); o.put("n_points", g.size.toLong)
      }
      val gotInc = call("POST", "/timeseries/query?increase=true",
        renderSeriesBody(qm, rnd))
      assert(gotInc == (200, mapper.writeValueAsString(incArr)),
        s"[case $i] increase mismatch for $qm\n got=$gotInc")

      val twaArr = mapper.createArrayNode()
      byTag.filter(_._2.size >= 2).foreach { case (t, g) =>
        val area = g.sliding(2).collect { case Seq(a, b) =>
          BigInt(math.round(a.value * 100)) * BigInt(b.timestamp - a.timestamp)
        }.sum
        val span = g.last.timestamp - g.head.timestamp
        val o = twaArr.addObject()
        o.put("grp", t)
        putD(o, "twa", round4(area.toDouble / 100.0 / span.toDouble))
        o.put("n_points", g.size.toLong); o.put("span_ms", span)
      }
      val gotTwa = call("POST", "/timeseries/query?twa=true",
        renderSeriesBody(qm, rnd))
      assert(gotTwa == (200, mapper.writeValueAsString(twaArr)),
        s"[case $i] twa mismatch for $qm\n got=$gotTwa")

      // ?rate=true — the increase fold over the span in seconds, plus
      // the reset-blind delta; single-sample tags omitted like twa.
      // Quarter values sum exactly, so the replay is byte-faithful.
      val rateArr = mapper.createArrayNode()
      byTag.filter(_._2.size >= 2).foreach { case (t, g) =>
        var total = 0.0
        g.sliding(2).foreach {
          case Seq(a, b) =>
            total += (if (b.value >= a.value) b.value - a.value else b.value)
          case _ => ()
        }
        val span = g.last.timestamp - g.head.timestamp
        val o = rateArr.addObject()
        o.put("grp", t)
        putD(o, "rate_per_s", total / (span.toDouble / 1000.0))
        putD(o, "delta", g.last.value - g.head.value)
        o.put("span_ms", span); o.put("n_points", g.size.toLong)
      }
      val gotRate = call("POST", "/timeseries/query?rate=true",
        renderSeriesBody(qm, rnd))
      assert(gotRate == (200, mapper.writeValueAsString(rateArr)),
        s"[case $i] rate mismatch for $qm\n got=$gotRate")
    }
  }

  /** `?regression` raw twin: the route computes decimal(38,0) moments
    * over sliced events and applies the refold's centered closed form
    * — a BigInt replay of those exact integers followed by the same
    * IEEE ops reproduces the bytes.
    */
  test("randomized regression parity: ?regression ≡ driver-side exact moments") {
    val rnd = new Random(20260816L + 8)
    (1 to 12).foreach { i =>
      def opt[A](p: Double)(a: => A): Option[A] =
        if (rnd.nextDouble() < p) Some(a) else None
      val lo = opt(0.5)(someTs(rnd)); val hi = opt(0.5)(someTs(rnd))
      val qm = QueryModel(ge = lo, lt = hi,
        tagEq = opt(0.3)(fixTags(rnd.nextInt(3))))
      val byTag = rnd.nextBoolean()
      val inWin = rows.filter(r =>
        qm.ge.forall(r.timestamp >= _) && qm.lt.forall(r.timestamp < _) &&
          qm.tagEq.forall(r.tag == _))
      // anchor mirrors the route: ge when given, else the SLICE's
      // (not the group's) minimum timestamp — computed once, shared by
      // every by-tag group; 0 only on an empty slice
      val c0 = BigInt(qm.ge.getOrElse(
        if (inWin.isEmpty) 0L else inWin.map(_.timestamp).min))
      def fit(o: ObjectNode, g: Seq[TS]): Unit = {
        val n = BigInt(g.size)
        val st0 = g.map(r => BigInt(r.timestamp)).sum
        val sv = g.map(r => BigInt(math.round(r.value * 100))).sum
        val stv = g.map(r => BigInt(r.timestamp) * BigInt(math.round(r.value * 100))).sum
        val st2 = g.map(r => BigInt(r.timestamp) * BigInt(r.timestamp)).sum
        val sv2 = g.map(r => { val v = BigInt(math.round(r.value * 100)); v * v }).sum
        val st = st0 - n * c0
        val stvC = stv - c0 * sv
        val st2C = st2 - 2 * c0 * st0 + n * c0 * c0
        val num = n * stvC - st * sv
        val denT = n * st2C - st * st
        val denV = n * sv2 - sv * sv
        val slopeMs = num.toDouble / denT.toDouble / 100.0
        if (denT > 0) putD(o, "slope_per_day", slopeMs * 86400000.0)
        else { o.putNull("slope_per_day"); () }
        if (denT > 0)
          putD(o, "intercept",
            sv.toDouble / 100.0 / n.toDouble - slopeMs * (st.toDouble / n.toDouble))
        else { o.putNull("intercept"); () }
        if (denT > 0 && denV > 0)
          putD(o, "r", num.toDouble / math.sqrt(denT.toDouble * denV.toDouble))
        else { o.putNull("r"); () }
        o.put("n_points", g.size.toLong); ()
      }
      val arr = mapper.createArrayNode()
      if (byTag)
        inWin.map(_.tag).distinct.sorted.foreach { t =>
          val o = arr.addObject(); o.put("grp", t)
          fit(o, inWin.filter(_.tag == t))
        }
      else fit(arr.addObject(), inWin)
      val by = if (byTag) "&by=tag" else ""
      val got = call("POST", s"/timeseries/query?regression=true$by",
        renderSeriesBody(qm, rnd))
      assert(got == (200, mapper.writeValueAsString(arr)),
        s"[case $i] regression mismatch (byTag=$byTag) for $qm\n got=$got")
    }
  }

  /** `?asof=V` time travel: the fixture's four wire mutations left a
    * committed version trail, and the spec KNOWS the row-set at each
    * stage — so every historical version gets the full reference-model
    * treatment: a random QueryModel evaluated over that version's
    * truth must byte-match the live route, exactly like the current-
    * version sweep. Also pins the route's own 400 vocabulary and the
    * `?asof&export` composition.
    */
  test("randomized time-travel parity: ?asof=V ≡ reference model over that version's rows") {
    val rnd = new Random(20260816L + 9)
    // per-version truth is reconstructed FROM THE WIRE's own full
    // collect (the PUT overwrote batch1.head's value, so pre-update
    // states are unknowable from `rows` alone); the dump itself is
    // then cross-checked against the truths the spec KNOWS — the
    // latest version must equal `rows` byte-for-byte, and every
    // earlier version must be key-monotone toward it — before random
    // query shapes are held to byte-parity against a model fed that
    // dump
    val (vc, vBody) = call("GET", "/timeseries/versions", "")
    assert(vc == 200, s"versions route failed: $vBody")
    val versions = mapper.readTree(vBody).elements()
    val vs = { val b = Vector.newBuilder[Long]
      while (versions.hasNext) b += versions.next().asLong; b.result() }
    assert(vs == vs.sorted && vs.distinct == vs, s"versions not ascending: $vs")
    assert(vs.size >= 4, s"fixture must have committed >= 4 versions, got $vs")
    def truthAt(v: Long): Vector[TS] = {
      val (c, body) = call("POST", s"/timeseries/query?asof=$v", "{}")
      assert(c == 200, s"asof=$v full collect failed: $body")
      val it = mapper.readTree(body).elements()
      val b = Vector.newBuilder[TS]
      while (it.hasNext) {
        val o = it.next()
        b += TS(o.get("timestamp").asLong, o.get("tag").asText,
          o.get("value").asDouble)
      }
      b.result()
    }
    // anchor: the LATEST version's dump must equal the known truth
    val latestTruth = truthAt(vs.last)
    assert(latestTruth.sortBy(r => (r.timestamp, r.tag)) ==
      rows.sortBy(r => (r.timestamp, r.tag)),
      "latest version's asof dump diverged from the fixture truth")
    // and the trail must be MONOTONE in the fixture's mutation order:
    // each earlier version's rows are a subset of the final truth
    // except the one updated key (whose pre-update value may differ)
    vs.foreach { v =>
      val t = truthAt(v)
      val finalKeys = rows.map(r => (r.timestamp, r.tag)).toSet
      assert(t.forall(r => finalKeys.contains((r.timestamp, r.tag))),
        s"asof=$v returned a key absent from the final truth")
      assert(t.size <= rows.size)
    }
    // full wire-parity sweep per version: random models against the
    // reference model over that version's truth
    (1 to 24).foreach { i =>
      val v = vs(rnd.nextInt(vs.size))
      val truth = truthAt(v)
      val qm = genQm(rnd)
      val body = renderBody(qm, rnd)
      val expected = refAnswer(truth, qm)
      val got = call("POST", s"/timeseries/query?asof=$v", body)
      assert(got == expected,
        s"[case $i] asof=$v wire mismatch for $qm\n body=$body\n got=$got\n expected=$expected")
      // export composes with asof: same bytes
      if (expected._1 == 200 && i % 6 == 0)
        assert(call("POST", s"/timeseries/query?asof=$v&export=true", body)
          == expected, s"[case $i] asof export diverged")
    }
    // route-local 400 vocabulary, exact texts
    assert(call("POST", s"/timeseries/query?asof=${vs.last}&window=$HOUR", "")
      ._2 == "'asof' applies only to the plain query route.")
    assert(call("POST", "/timeseries/query?asof=xyz", "")
      == (400, "'asof' must be an integer version."))
    val ghost = vs.max + 1000
    assert(call("POST", s"/timeseries/query?asof=$ghost", "")
      == (400, s"version $ghost not found (never committed, or removed by vacuum)."))
  }

  test("series routes: exact 400 texts") {
    assert(call("POST", "/timeseries/query?window=100&slide=7", "")
      == (400, "'window' must be a positive multiple of 'slide'."))
    assert(call("POST", "/timeseries/query?window=0", "")
      == (400, "'window' must be a positive multiple of 'slide'."))
    assert(call("POST", s"/timeseries/query?window=${4097L * HOUR}&slide=$HOUR", "")
      == (400, "'window'/'slide' ratio above 4096."))
    assert(call("POST", "/timeseries/query?window=x", "")
      == (400, "'window' must be an integer."))
    assert(call("POST", "/timeseries/query?points=0", """{"ge":0,"lt":100}""")
      == (400, "'points' must be in [1, 100000]."))
    assert(call("POST", "/timeseries/query?points=5", "")
      == (400, "'points' requires both a lower and an upper timestamp bound."))
    assert(call("POST", "/timeseries/query?points=5", """{"ge":100,"lt":100}""")
      == (400, "empty range [100, 100)."))
    assert(call("POST", s"/timeseries/query?window=$HOUR",
      """{"aggFunc":"sum"}""")
      == (400, "Series routes take only timestamp bounds and 'tagEq' in the body."))
    assert(call("POST", s"/timeseries/query?window=$HOUR&points=3", "")._2
      .startsWith("Use exactly one of"))
  }
}

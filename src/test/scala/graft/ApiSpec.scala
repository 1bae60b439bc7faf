package graft

import graft.api.Server
import graft.engine.TimeSeriesStore
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** End-to-end HTTP lifecycle against a live server — the reference's
  * README example flow (insert → query → update → delete → truncate)
  * plus its 400-semantics.
  */
class ApiSpec extends SparkSpec {
  private lazy val server = new Server(spark,
    new TimeSeriesStore(spark, Files.createTempDirectory("graft-api").toString),
    0).start()
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def call(method: String, path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("full lifecycle: insert, query shapes, update, delete, truncate") {
    // S1 insert
    val rows = """[{"timestamp":1000,"tag":"foo","value":10.0},
                   {"timestamp":2000,"tag":"foo","value":20.0},
                   {"timestamp":1000,"tag":"bar","value":5.0}]"""
    assert(call("POST", "/timeseries", rows) == (200, "[]")) // aeson ()
    // S1 conflict => 400, nothing applied
    val (c409, conflictBody) = call("POST", "/timeseries",
      """[{"timestamp":1000,"tag":"foo","value":1.0}]""")
    assert(c409 == 400 && conflictBody.contains("1000"))
    // scalar agg (AggR shape)
    val (200, sumBody) = call("POST", "/timeseries/query", """{"aggFunc":"sum"}""")
    assert(sumBody == """{"result":35.0}""")
    // grouped agg ([GroupAggR] shape, canonical tag order)
    val (200, grpBody) = call("POST", "/timeseries/query",
      """{"aggFunc":"sum","groupBy":"tag"}""")
    assert(grpBody == """[{"group":"bar","result":5.0},{"group":"foo","result":30.0}]""")
    // collect (CollectR shape) desc with limit
    val (200, collBody) = call("POST", "/timeseries/query",
      """{"sort":"desc","limit":1}""")
    assert(collBody == """[{"timestamp":2000,"tag":"foo","value":20.0}]""")
    // group by timestamp: Long group keys in JSON, desc order honored
    val (200, tsGrpBody) = call("POST", "/timeseries/query",
      """{"aggFunc":"count","groupBy":"timestamp","sort":"desc"}""")
    assert(tsGrpBody == """[{"group":2000,"result":1.0},{"group":1000,"result":2.0}]""")
    // S2 update
    assert(call("PUT", "/timeseries",
      """[{"timestamp":1000,"tag":"foo","value":99.0}]""")._1 == 200)
    val (200, afterUpd) = call("POST", "/timeseries/query",
      """{"tsEq":1000,"tagEq":"foo","aggFunc":"max"}""")
    assert(afterUpd == """{"result":99.0}""")
    // S2 missing key => 400
    assert(call("PUT", "/timeseries",
      """[{"timestamp":7777,"tag":"nope","value":0.0}]""")._1 == 400)
    // S3 delete
    assert(call("DELETE", "/timeseries",
      """[{"timestamp":1000,"tag":"bar"}]""")._1 == 200)
    val (200, afterDel) = call("POST", "/timeseries/query", """{"aggFunc":"count"}""")
    assert(afterDel == """{"result":2.0}""")
    // S4 truncate via empty body
    assert(call("DELETE", "/timeseries", "[]")._1 == 200)
    val (200, afterTrunc) = call("POST", "/timeseries/query", """{"aggFunc":"count"}""")
    assert(afterTrunc == """{"result":0.0}""")
  }

  test("rollup-registered server: same wire responses, rollup-served aggregates, exact across mutations") {
    import graft.engine.ContinuousAggregate
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-api-ro-store").toString)
    val rollup = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-api-ro-cagg").toString)
    val srv = new Server(spark, st, 0, Seq(rollup)).start()
    val b2 = s"http://127.0.0.1:${srv.boundPort}"
    def call2(method: String, path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(URI.create(b2 + path))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      val D = 86400000L
      val rows = s"""[{"timestamp":0,"tag":"foo","value":10.0},
                     {"timestamp":${D + 5},"tag":"foo","value":20.0},
                     {"timestamp":3,"tag":"bar","value":5.0}]"""
      assert(call2("POST", "/timeseries", rows) == (200, "[]"))
      // the mutation refreshed the rollup; eligible aggregates now
      // route through it with byte-identical wire output
      assert(rollup.reflectedStoreVersion.contains(st.version))
      assert(call2("POST", "/timeseries/query", """{"aggFunc":"sum"}""")
        == (200, """{"result":35.0}"""))
      assert(call2("POST", "/timeseries/query",
        """{"aggFunc":"sum","groupBy":"tag"}""")
        == (200, """[{"group":"bar","result":5.0},{"group":"foo","result":30.0}]"""))
      assert(call2("POST", "/timeseries/query",
        s"""{"ge":$D,"aggFunc":"count","groupBy":"tag"}""")
        == (200, """[{"group":"foo","result":1.0}]"""))
      // ineligible shapes (collect, tsEq) fall through, same semantics
      assert(call2("POST", "/timeseries/query", """{"sort":"desc","limit":1}""")
        == (200, s"""[{"timestamp":${D + 5},"tag":"foo","value":20.0}]"""))
      assert(call2("POST", "/timeseries/query",
        """{"tsEq":3,"tagEq":"bar","aggFunc":"max"}""")
        == (200, """{"result":5.0}"""))
      // 400 semantics survive routing: NoData / empty scalar avg
      assert(call2("POST", "/timeseries/query",
        """{"tagEq":"zzz","aggFunc":"count","groupBy":"tag"}""")._1 == 400)
      assert(call2("POST", "/timeseries/query",
        s"""{"ge":${9 * D},"lt":${10 * D},"aggFunc":"avg"}""")._1 == 400)
      // update + delete keep the routed answers exact
      assert(call2("PUT", "/timeseries",
        """[{"timestamp":0,"tag":"foo","value":99.0}]""")._1 == 200)
      assert(call2("POST", "/timeseries/query", """{"aggFunc":"sum"}""")
        == (200, """{"result":124.0}"""))
      assert(call2("DELETE", "/timeseries",
        """[{"timestamp":3,"tag":"bar"}]""")._1 == 200)
      assert(call2("POST", "/timeseries/query",
        """{"aggFunc":"sum","groupBy":"tag"}""")
        == (200, """[{"group":"foo","result":119.0}]"""))
      // truncate empties the rollup-backed answers too
      assert(call2("DELETE", "/timeseries", "")._1 == 200)
      assert(call2("POST", "/timeseries/query", """{"aggFunc":"count"}""")
        == (200, """{"result":0.0}"""))
    } finally srv.stop()
  }

  test("S5+ series routes: downsampled + windowed series over HTTP, rollup-routed == raw") {
    import graft.engine.ContinuousAggregate
    val D = 86400000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-api-ser-store").toString)
    val rollup = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-api-ser-cagg").toString)
    val srv = new Server(spark, st, 0, Seq(rollup)).start()     // rollup-routed
    val srvRaw = new Server(spark, st, 0).start()               // raw fallback
    def on(s: Server)(path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${s.boundPort}" + path))
        .method("POST", HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      val rows = s"""[{"timestamp":0,"tag":"foo","value":10.0},
                     {"timestamp":5,"tag":"foo","value":20.0},
                     {"timestamp":${D + 3},"tag":"foo","value":30.0},
                     {"timestamp":${D + 7},"tag":"bar","value":5.0}]"""
      assert(on(srv)("/timeseries", rows) == (200, "[]"))
      // ?points: span [0, 2D) at a 2-point budget → day-wide windows,
      // served by the DAILY rollup (eligibility asserted below), exact
      val expectPoints = s"""{"width":$D,"slide":$D,"series":[""" +
        s"""{"window_start":0,"tag":"foo","cnt":2,"sum_val":30.0,"min_val":10.0,"max_val":20.0},""" +
        s"""{"window_start":$D,"tag":"bar","cnt":1,"sum_val":5.0,"min_val":5.0,"max_val":5.0},""" +
        s"""{"window_start":$D,"tag":"foo","cnt":1,"sum_val":30.0,"min_val":30.0,"max_val":30.0}]}"""
      val body = s"""{"ge":0,"lt":${2 * D}}"""
      assert(on(srv)("/timeseries/query?points=2", body) == (200, expectPoints))
      // routed-source law: the rollup IS eligible for this shape (so
      // the equality below compares genuinely different plans), and the
      // rollup-less server answers byte-identically from raw events
      assert(ContinuousAggregate.answerAtResolution(Seq(rollup), 0, 2 * D, 2)
        .exists(_._1 == D), "daily rollup must serve the ?points shape")
      assert(on(srvRaw)("/timeseries/query?points=2", body) == (200, expectPoints))
      // ?window with slide: sliding 2D/D windows, each row in 2 windows
      val expectWin = s"""{"width":${2 * D},"slide":$D,"series":[""" +
        s"""{"window_start":${-D},"tag":"foo","cnt":2,"sum_val":30.0,"min_val":10.0,"max_val":20.0},""" +
        s"""{"window_start":0,"tag":"bar","cnt":1,"sum_val":5.0,"min_val":5.0,"max_val":5.0},""" +
        s"""{"window_start":0,"tag":"foo","cnt":3,"sum_val":60.0,"min_val":10.0,"max_val":30.0},""" +
        s"""{"window_start":$D,"tag":"bar","cnt":1,"sum_val":5.0,"min_val":5.0,"max_val":5.0},""" +
        s"""{"window_start":$D,"tag":"foo","cnt":1,"sum_val":30.0,"min_val":30.0,"max_val":30.0}]}"""
      assert(on(srv)(s"/timeseries/query?window=${2 * D}&slide=$D", "")
        == (200, expectWin))
      assert(rollup.answerWindow(2 * D, D).isDefined,
        "daily rollup must serve the ?window shape")
      assert(on(srvRaw)(s"/timeseries/query?window=${2 * D}&slide=$D", "")
        == (200, expectWin))
      // body bounds post-filter the window grid; tagEq filters tags —
      // both exact (group keys)
      val (200, winGe) = on(srv)(s"/timeseries/query?window=${2 * D}&slide=$D",
        """{"ge":0}""")
      assert(!winGe.contains(s""""window_start":${-D}""") &&
        winGe.contains(""""window_start":0"""))
      val (200, winTag) = on(srv)(s"/timeseries/query?window=${2 * D}&slide=$D",
        """{"tagEq":"bar"}""")
      assert(!winTag.contains("foo") && winTag.contains("bar"))
      // gt/le canonicalize like every other path: gt D-1 ≡ ge D
      val (200, winGt) = on(srv)(s"/timeseries/query?window=${2 * D}&slide=$D",
        s"""{"gt":${-D - 1}}""")
      assert(winGt.contains(s""""window_start":${-D}"""))
      // an empty slice is an empty series, not an error
      assert(on(srv)("/timeseries/query?points=5",
        s"""{"ge":${10 * D},"lt":${12 * D}}""")._2.contains(""""series":[]"""))
      // validation: 400s with reasons, same wire shape as the parity path
      assert(on(srv)("/timeseries/query?points=2", "{}")._1 == 400)       // no bounds
      assert(on(srv)("/timeseries/query?points=0", body)._1 == 400)       // bad budget
      assert(on(srv)("/timeseries/query?points=x", body)._1 == 400)       // non-integer
      assert(on(srv)(s"/timeseries/query?points=2&window=$D", body)._1 == 400)
      assert(on(srv)(s"/timeseries/query?window=$D&slide=${2 * D}", "")._1 == 400)
      assert(on(srv)(s"/timeseries/query?window=${D * 4096 * 2}&slide=1", "")._1 == 400)
      assert(on(srv)(s"/timeseries/query?window=$D",
        """{"aggFunc":"sum"}""")._1 == 400)                               // body beyond bounds/tagEq
    } finally { srv.stop(); srvRaw.stop() }
  }

  test("S5+ sketch + gapfill routes: percentile/distinct route to sketch rollups, gapfill densifies") {
    import graft.api.QueryJson
    import graft.engine.ContinuousAggregate
    val D = 86400000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-api-sk-store").toString)
    val plain = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-api-sk-plain").toString)
    val sketch = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-api-sk-sk").toString,
      sketchRelErr = Some(0.01))
    val srv = new Server(spark, st, 0, Seq(plain, sketch)).start()
    val srvRaw = new Server(spark, st, 0).start()
    def on(s: Server)(path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${s.boundPort}" + path))
        .method("POST", HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      // day 0 and day 2 populated, day 1 EMPTY (the gapfill target)
      val rows = (0 until 5).map(i =>
        s"""{"timestamp":${i.toLong},"tag":"foo","value":${i + 1}.0}""") ++
        Seq(s"""{"timestamp":${2 * D + 1},"tag":"foo","value":11.0}""",
          s"""{"timestamp":${2 * D + 2},"tag":"foo","value":12.0}""",
          s"""{"timestamp":${2 * D + 3},"tag":"bar","value":7.0}""")
      assert(on(srv)("/timeseries", rows.mkString("[", ",", "]")) == (200, "[]"))
      // percentile: routed answer == the sketch rollup's own refold,
      // wire-encoded identically (eligibility asserted so the equality
      // is between the HTTP layer and a real sketch-merge plan)
      assert(sketch.answerPercentile(0.5).isDefined,
        "sketch rollup must serve the scalar percentile")
      val expP = QueryJson.encodeAggRows(sketch.answerPercentile(0.5).get,
        grouped = false)
      assert(on(srv)("/timeseries/query?percentile=0.5", "") == (200, expP))
      val expPT = QueryJson.encodeAggRows(
        sketch.answerPercentile(0.5, byTag = true).get, grouped = true)
      val (200, pByTag) = on(srv)("/timeseries/query?percentile=0.5&by=tag", "")
      assert(pByTag == expPT && pByTag.contains("\"group\":\"bar\""))
      // distinct: HLL-union-routed == engine answerDistinct
      val expD = QueryJson.encodeAggRows(sketch.answerDistinct().get,
        grouped = false)
      assert(on(srv)("/timeseries/query?distinct=true", "") == (200, expD))
      // top-k: Misra-Gries-routed == engine answerTopValues, wire-
      // encoded identically; byTag grouped shape included
      assert(sketch.answerTopValues(2).isDefined,
        "sketch rollup must serve top-k")
      val expT = QueryJson.encodeTop(sketch.answerTopValues(2).get,
        grouped = false)
      assert(on(srv)("/timeseries/query?top=2", "") == (200, expT))
      val expTT = QueryJson.encodeTop(
        sketch.answerTopValues(2, byTag = true).get, grouped = true)
      val (200, tByTag) = on(srv)("/timeseries/query?top=2&by=tag", "")
      assert(tByTag == expTT && tByTag.contains("\"group\":\"bar\""))
      // rollup-less server: the exact raw top-k (this fixture is under
      // MG capacity, so values AND counts agree with the sketch route)
      assert(on(srvRaw)("/timeseries/query?top=2", "")
        == on(srv)("/timeseries/query?top=2", ""))
      // raw fallback: a rollup-less server answers the same routes from
      // percentile_approx / approx_count_distinct over the snapshot
      val (200, rawP) = on(srvRaw)("/timeseries/query?percentile=0.5", "")
      assert(rawP.startsWith("""{"result":"""))
      // unaligned bounds decline the sketch path on BOTH servers — the
      // two raw fallbacks must agree byte-for-byte
      val unaligned = s"""{"ge":1,"lt":${3 * D}}"""
      assert(on(srv)("/timeseries/query?percentile=0.5", unaligned)
        == on(srvRaw)("/timeseries/query?percentile=0.5", unaligned))
      // gapfill: locf fills the empty day 1 from day 0; wire output ==
      // the engine's own answerGapFill encoding at the serving grain
      val bounds = s"""{"ge":0,"lt":${3 * D}}"""
      val expG = QueryJson.encodeGapFill(D,
        plain.answerGapFill(0, 3 * D, graft.model.Agg.Count,
          ContinuousAggregate.Fill.Locf).get)
      val (200, gBody) = on(srv)("/timeseries/query?gapfill=locf&agg=count", bounds)
      assert(gBody == expG)
      // day 1 present in the grid with foo's carried count (5 rows day 0)
      assert(gBody.contains(s""""bucket_start":$D""") && gBody.contains("5.0"))
      // interp + tagEq body: engine equality again
      val expGI = QueryJson.encodeGapFill(D,
        plain.answerGapFill(0, 3 * D, graft.model.Agg.Avg,
          ContinuousAggregate.Fill.Interp, tagEq = Some("foo")).get)
      assert(on(srv)("/timeseries/query?gapfill=interp&agg=avg",
        s"""{"ge":0,"lt":${3 * D},"tagEq":"foo"}""") == (200, expGI))
      // 400 semantics
      assert(on(srv)("/timeseries/query?percentile=1.5", "")._1 == 400)
      assert(on(srv)("/timeseries/query?percentile=x", "")._1 == 400)
      assert(on(srv)("/timeseries/query?gapfill=bogus&agg=count", bounds)._1 == 400)
      assert(on(srv)("/timeseries/query?gapfill=locf&agg=median", bounds)._1 == 400)
      assert(on(srv)("/timeseries/query?gapfill=locf&agg=count", "")._1 == 400)
      assert(on(srv)("/timeseries/query?points=3&percentile=0.5", bounds)._1 == 400)
      assert(on(srvRaw)("/timeseries/query?gapfill=locf&agg=count", bounds)._1 == 400,
        "gapfill without any registered rollup must 400, not full-scan")
    } finally { srv.stop(); srvRaw.stop() }
  }

  test("S5+ counter routes: increase/twa route to counter-mode rollups, raw twins agree") {
    import graft.api.QueryJson
    import graft.engine.ContinuousAggregate
    val D = 86400000L
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-api-ctr-store").toString)
    val counter = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("graft-api-ctr-cagg").toString,
      counterMode = true)
    val srv = new Server(spark, st, 0, Seq(counter)).start()
    val srvRaw = new Server(spark, st, 0).start()
    def on(s: Server)(path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${s.boundPort}" + path))
        .method("POST", HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      // an integer counter rising across two days with ONE reset —
      // integer-valued so the refold and the raw twin are BOTH exact
      val rows = Seq(
        (0L, 10.0), (3600000L, 25.0), (7200000L, 40.0),  // +15 +15
        (D, 55.0), (D + 3600000L, 5.0),                  // +15, reset +5
        (D + 7200000L, 30.0))                            // +25
        .map { case (t, v) => s"""{"timestamp":$t,"tag":"c","value":$v}""" }
      assert(on(srv)("/timeseries", rows.mkString("[", ",", "]")) == (200, "[]"))
      assert(counter.answerCounterIncrease().isDefined,
        "counter rollup must serve the increase")
      val expI = QueryJson.encodeRows(counter.answerCounterIncrease().get)
      assert(on(srv)("/timeseries/query?increase=true", "") == (200, expI))
      // the numbers themselves: 15+15+15+5+25 = 75, one reset, 6 points
      assert(expI ==
        """[{"grp":"c","total_increase":75.0,"n_resets":1,"n_points":6}]""")
      // raw twin (rollup-less server): exact equality on integer counters
      assert(on(srvRaw)("/timeseries/query?increase=true", "")
        == on(srv)("/timeseries/query?increase=true", ""))
      // twa: routed == engine refold == raw twin (bit-matching
      // scaled-integer areas), including a bounds body
      val expT = QueryJson.encodeRows(counter.answerTimeWeighted().get)
      assert(on(srv)("/timeseries/query?twa=true", "") == (200, expT))
      assert(on(srvRaw)("/timeseries/query?twa=true", "")
        == on(srv)("/timeseries/query?twa=true", ""))
      val bounds = s"""{"ge":$D,"lt":${2 * D}}"""
      assert(on(srv)("/timeseries/query?twa=true", bounds)
        == on(srvRaw)("/timeseries/query?twa=true", bounds))
      // rate: routed == engine refold == raw twin. 75 of increase over
      // the 93,600 s span; delta is reset-BLIND last − first = 30 − 10.
      val expR = QueryJson.encodeRows(counter.answerCounterRate().get)
      assert(on(srv)("/timeseries/query?rate=true", "") == (200, expR))
      locally {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(expR)
        assert(n.size == 1)
        val o = n.get(0)
        assert(o.get("grp").asText == "c")
        assert(math.abs(o.get("rate_per_s").asDouble - 75.0 / 93600.0) < 1e-15)
        assert(o.get("delta").asDouble == 20.0)
        assert(o.get("span_ms").asLong == 93600000L)
        assert(o.get("n_points").asLong == 6L)
      }
      assert(on(srvRaw)("/timeseries/query?rate=true", "")
        == on(srv)("/timeseries/query?rate=true", ""))
      // bounded slice D..2D: pairs (55→5 reset, 5→30) ⇒ increase 30
      // over 7,200 s, delta −25 — identical bytes on both paths
      assert(on(srv)("/timeseries/query?rate=true", bounds)
        == on(srvRaw)("/timeseries/query?rate=true", bounds))
      // 400: series-body discipline holds on the counter routes too
      assert(on(srv)("/timeseries/query?increase=true",
        """{"aggFunc":"sum"}""")._1 == 400)
      // regression: a stats-mode rollup routes ?regression=true, and
      // the raw twin's identical decimal moments give identical bytes
      val stats = new ContinuousAggregate(spark, st,
        Files.createTempDirectory("graft-api-ctr-stats").toString,
        statsMode = true)
      stats.refresh()
      val srvStats = new Server(spark, st, 0, Seq(stats)).start()
      try {
        assert(stats.answerRegression().isDefined,
          "stats rollup must serve the regression")
        val expR = QueryJson.encodeRows(stats.answerRegression().get)
        assert(on(srvStats)("/timeseries/query?regression=true&by=tag", "")
          == (200, expR))
        assert(on(srvRaw)("/timeseries/query?regression=true&by=tag", "")
          == (200, expR))
        // round-11 ADVICE #1: a non-grouped fit over an EMPTY aligned
        // window must encode n_points 0 (not null) on the ROUTED path
        // too — answerRegression's n refolds through coalesce, so the
        // stats-routed and raw twins stay byte-identical on emptiness
        val emptyWin = s"""{"ge":${100 * D},"lt":${101 * D}}"""
        val gotEmpty = on(srvStats)("/timeseries/query?regression=true", emptyWin)
        assert(gotEmpty == on(srvRaw)("/timeseries/query?regression=true", emptyWin),
          s"routed vs raw empty-window regression bytes diverge: $gotEmpty")
        assert(gotEmpty._1 == 200 && gotEmpty._2.contains("\"n_points\":0"),
          s"empty-window regression must carry n_points 0: $gotEmpty")
      } finally srvStats.stop()
    } finally { srv.stop(); srvRaw.stop() }
  }

  test("wire protocol: null fields, typed batch fields, JSON-valid error bodies") {
    // explicit null == absent (aeson Maybe parity)
    val (nc, _) = call("POST", "/timeseries/query", """{"gt":null,"aggFunc":"count"}""")
    assert(nc == 200)
    // wrong-typed batch fields are rejected, never coerced to 0
    val (tc, tMsg) = call("POST", "/timeseries",
      """[{"timestamp":"abc","tag":"x","value":1.0}]""")
    assert(tc == 400 && tMsg.contains("timestamp"))
    val (vc, _) = call("POST", "/timeseries",
      """[{"timestamp":1,"tag":"x","value":"oops"}]""")
    assert(vc == 400)
    // mutation-error bodies parse as JSON despite embedded quotes
    call("POST", "/timeseries", """[{"timestamp":777,"tag":"q","value":1.0}]""")
    // huge/negative limits clamp like Haskell take (store now non-empty,
    // so "huge => everything" is actually exercised)
    val (hc, hBody) = call("POST", "/timeseries/query", """{"limit":4294967296}""")
    assert(hc == 200 && hBody.contains("777"))
    // out-of-long-range integers are a 400, never a silent wrap
    assert(call("POST", "/timeseries/query", """{"limit":9223372036854775808}""")._1 == 400)
    assert(call("POST", "/timeseries/query", """{"gt":9223372036854775808}""")._1 == 400)
    val (lc, lBody) = call("POST", "/timeseries/query", """{"limit":-1}""")
    assert(lc == 200 && lBody == "[]")
    // aeson numeric parity: integral-valued floats are integers
    assert(call("POST", "/timeseries/query", """{"tsEq":777.0,"aggFunc":"count"}""")._1 == 200)
    val (mc, mBody) = call("PUT", "/timeseries",
      """[{"timestamp":778,"tag":"q","value":2.0}]""")
    assert(mc == 400)
    // raw text, newline-terminated like Haskell unlines (Api.hs:61)
    assert(mBody == "Timestamp = 778 and tag = \"q\" not found.\n")
    // bodyless DELETE truncates (reference's bare Delete route)
    assert(call("DELETE", "/timeseries", "") == (200, "[]"))
    assert(call("DELETE", "/timeseries", "[]")._1 == 200) // leave store empty
  }

  test("concurrent inserts lose no batches (single-writer store lock)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (0 until 8).map { w =>
      Future {
        val rows = (0 until 5).map(i =>
          s"""{"timestamp":${900000 + w * 100 + i},"tag":"c$w","value":1.0}""")
          .mkString("[", ",", "]")
        call("POST", "/timeseries", rows)._1
      }
    }
    val codes = Await.result(Future.sequence(writers), 120.seconds)
    assert(codes.forall(_ == 200))
    val (200, cnt) = call("POST", "/timeseries/query",
      """{"ge":900000,"le":999999,"aggFunc":"count"}""")
    assert(cnt == """{"result":40.0}""") // 8 writers x 5 rows, none lost
    assert(call("DELETE", "/timeseries", "")._1 == 200)
  }

  test("CORS: cross-origin responses carry allow-origin; preflight advertises methods") {
    // simple cross-origin request: every response carries allow-origin *
    val req = HttpRequest.newBuilder(URI.create(base + "/timeseries/query"))
      .header("Origin", "http://localhost:8080")
      .method("POST", HttpRequest.BodyPublishers.ofString("""{"limit":1}"""))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Access-Control-Allow-Origin").orElse("") == "*")
    // preflight (reference policy Api.hs:95-103: GET/POST/PUT/DELETE,
    // Content-Type)
    val pre = HttpRequest.newBuilder(URI.create(base + "/timeseries"))
      .header("Origin", "http://localhost:8080")
      .header("Access-Control-Request-Method", "PUT")
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build()
    val preResp = client.send(pre, HttpResponse.BodyHandlers.ofString())
    assert(preResp.statusCode() == 200)
    assert(preResp.headers().firstValue("Access-Control-Allow-Origin").orElse("") == "*")
    assert(preResp.headers().firstValue("Access-Control-Allow-Methods").orElse("")
      == "GET, POST, PUT, DELETE")
    assert(preResp.headers().firstValue("Access-Control-Allow-Headers").orElse("")
      == "Content-Type")
  }

  test("S6 export: query?export=true streams the same JSON as the query, as a download") {
    assert(call("POST", "/timeseries",
      """[{"timestamp":100,"tag":"ex","value":1.5},
         {"timestamp":200,"tag":"ex","value":2.5}]""")._1 == 200)
    val (qc, queryBody) = call("POST", "/timeseries/query", """{"tagEq":"ex"}""")
    assert(qc == 200)
    val req = HttpRequest.newBuilder(URI.create(base + "/timeseries/query?export=true"))
      .method("POST", HttpRequest.BodyPublishers.ofString("""{"tagEq":"ex"}""")).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Content-Disposition").orElse("")
      .startsWith("attachment"))
    assert(resp.body() == queryBody) // byte-identical to the query response
    // grouped + scalar shapes stream identically too
    for (q <- Seq("""{"aggFunc":"sum","groupBy":"tag"}""", """{"aggFunc":"sum"}""")) {
      val exp = call("POST", "/timeseries/query", q)._2
      val r = HttpRequest.newBuilder(URI.create(base + "/timeseries/query?export=true"))
        .method("POST", HttpRequest.BodyPublishers.ofString(q)).build()
      assert(client.send(r, HttpResponse.BodyHandlers.ofString()).body() == exp)
    }
    // export of an invalid query is still a 400 with the raw-text body
    val bad = HttpRequest.newBuilder(URI.create(base + "/timeseries/query?export=true"))
      .method("POST", HttpRequest.BodyPublishers.ofString("""{"groupBy":"tag"}""")).build()
    assert(client.send(bad, HttpResponse.BodyHandlers.ofString()).statusCode() == 400)
    assert(call("DELETE", "/timeseries", "")._1 == 200) // leave store empty
  }

  test("400 semantics: illegal query, unknown field, no-data, empty avg") {
    assert(call("POST", "/timeseries/query", """{"groupBy":"tag"}""")._1 == 400)
    assert(call("POST", "/timeseries/query", """{"gt":1,"ge":2}""")._1 == 400)
    val (code, msg) = call("POST", "/timeseries/query", """{"bogus":1}""")
    assert(code == 400 && msg.contains("bogus"))
    assert(call("POST", "/timeseries", """[{"timestamp":1,"tag":"x","value":1,"extra":2}]""")._1 == 400)
    // empty store: avg errors (reference "Average failed."), min = +inf ok
    val (avgCode, avgMsg) = call("POST", "/timeseries/query", """{"aggFunc":"avg"}""")
    assert(avgCode == 400 && avgMsg.contains("Average failed"))
    assert(call("POST", "/timeseries/query", """{"tagEq":"ghost"}""")._1 == 400)
  }
}

package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.api.Server
import graft.engine.{ContinuousAggregate, TimeSeriesStore}
import graft.model.TS
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Snapshot-isolation laws for the live HTTP server under concurrent
  * wire mutations — the property the store's atomic manifest swap and
  * the engine's pinned snapshots exist to provide (the reference gets
  * it from acid-state + warp; we get it from versioned manifests, the
  * rollup snapshot-signature guard and the MetaStats pinned-stats
  * re-verify, so it deserves its own adversarial test).
  *
  * A mutator thread walks the store through a known script of commits
  * S1..S5 (insert, insert, update, delete, insert) over the wire while
  * reader threads hammer the query endpoint. Laws:
  *
  *  1. EVERY response byte-equals the pure-Scala evaluation of SOME
  *     committed state S0..S5 — a response mixing two states (a torn
  *     read: guards from one manifest, results from another, or a
  *     rollup refold stitched to the wrong raw tail) matches no S_j
  *     and fails loudly;
  *  2. per reader, the state a full-collect response reflects is
  *     MONOTONE — the manifest version never travels backwards within
  *     one client's request sequence;
  *  3. two concurrent inserts of the SAME new key commit exactly once
  *     (one 200, one conflict 400) — writer atomicity over the wire.
  *
  * Values are exact quarters so every fold is bit-stable (same stance
  * as ApiFuzzSpec) and the byte comparison is meaningful.
  */
class ApiConcurrencySpec extends SparkSpec {

  private val DAY = 86400000L
  private val HOUR = 3600000L
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private def putD(o: ObjectNode, name: String, v: Double): Unit =
    if (java.lang.Double.isFinite(v)) { o.put(name, v); () } else { o.putNull(name); () }

  // ---- the mutation script, computed up front so every state is known
  private val fixTags = Vector("alpha", "beta", "gamma")
  private val script: Vector[Vector[TS]] = { // cumulative states S0..S5
    val rnd = new Random(20260817L)
    def v(): Double = math.rint(rnd.nextDouble() * 400 - 200) / 4.0
    def mk(day: Int, n: Int): Vector[TS] =
      Vector.tabulate(n)(i => TS(day * DAY + i * HOUR + rnd.nextInt(60000),
        fixTags(rnd.nextInt(3)), v())).distinctBy(r => (r.timestamp, r.tag))
    val s0 = Vector.empty[TS]
    val ins1 = mk(0, 15) ++ mk(1, 15)
    val s1 = ins1
    val ins2 = mk(2, 20)
    val s2 = s1 ++ ins2
    val upd = s1.take(5).map(_.copy(value = 42.0))
    val s3 = s2.map(r => upd.find(u =>
      u.timestamp == r.timestamp && u.tag == r.tag).getOrElse(r))
    val dels = s3.slice(8, 15)
    val s4 = s3.filterNot(r => dels.exists(d =>
      d.timestamp == r.timestamp && d.tag == r.tag))
    val ins3 = mk(3, 10)
    val s5 = s4 ++ ins3
    val states = Vector(s0, s1, s2, s3, s4, s5)
    // every adjacent pair must differ, or state inference degenerates
    states.sliding(2).foreach { case Seq(a, b) => require(a != b) }
    states
  }

  private def tsJson(rs: Seq[TS]): String = rs.map(r =>
    s"""{"timestamp":${r.timestamp},"tag":"${r.tag}","value":${r.value}}""")
    .mkString("[", ",", "]")
  private def keyJson(rs: Seq[TS]): String = rs.map(r =>
    s"""{"timestamp":${r.timestamp},"tag":"${r.tag}"}""").mkString("[", ",", "]")

  // ---- pure-Scala expected wire bodies per (state, query)
  private val queries = Vector(
    "collect"  -> "{}",
    "count"    -> """{"aggFunc":"count"}""",
    "sumByTag" -> """{"aggFunc":"sum","groupBy":"tag"}""",
    "max"      -> """{"aggFunc":"max"}""",
    "desc5"    -> """{"sort":"desc","limit":5}""")

  private def expected(state: Vector[TS], qname: String): String = qname match {
    case "collect" | "desc5" =>
      // desc order: timestamp desc, ties break by tag ASC
      val rows =
        if (qname == "desc5") state.sortBy(r => (r.timestamp, r.tag))(
          Ordering.Tuple2(Ordering.Long.reverse, Ordering.String)).take(5)
        else state.sortBy(r => (r.timestamp, r.tag))
      val arr = mapper.createArrayNode()
      rows.foreach { r =>
        val o = arr.addObject()
        o.put("timestamp", r.timestamp); o.put("tag", r.tag)
        putD(o, "value", r.value)
      }
      mapper.writeValueAsString(arr)
    case "count" =>
      val o = mapper.createObjectNode()
      putD(o, "result", state.size.toDouble)
      mapper.writeValueAsString(o)
    case "sumByTag" =>
      val arr = mapper.createArrayNode()
      state.groupBy(_.tag).toSeq.sortBy(_._1).foreach { case (t, g) =>
        val o = arr.addObject()
        o.put("group", t); putD(o, "result", g.map(_.value).sum)
      }
      mapper.writeValueAsString(arr)
    case "max" =>
      val o = mapper.createObjectNode()
      putD(o, "result",
        if (state.isEmpty) Double.NegativeInfinity else state.map(_.value).max)
      mapper.writeValueAsString(o)
  }

  test("reads under concurrent wire mutations: every response is SOME committed state, monotone per reader") {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("apiconc-store").toString)
    val hourly = new ContinuousAggregate(spark, st,
      Files.createTempDirectory("apiconc-hourly").toString, bucketMs = HOUR)
    val server = new Server(spark, st, 0, Seq(hourly)).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    def call(method: String, path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(URI.create(base + path))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      // expected wire bodies for every (state, query); a torn response
      // matches none of them
      val valid: Map[String, IndexedSeq[String]] =
        queries.map { case (qn, _) => qn -> script.map(expected(_, qn)) }.toMap

      val results =
        new ConcurrentLinkedQueue[(Int, String, Int, String)]() // (reader, qname, code, body)
      val failures = new ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val started = new CountDownLatch(4)
      val readers = (0 until 4).map { rid =>
        new Thread(() => {
          try {
            started.countDown()
            var i = rid // stagger the query mix across readers
            while (!stop.get()) {
              val (qn, body) = queries(i % queries.size)
              val (code, resp) = call("POST", "/timeseries/query", body)
              results.add((rid, qn, code, resp))
              i += 1
            }
            // one final round AFTER the last commit: must all be S5
            queries.foreach { case (qn, body) =>
              val (code, resp) = call("POST", "/timeseries/query", body)
              results.add((rid, "final:" + qn, code, resp))
            }
          } catch { case t: Throwable => failures.add(t); () }
        })
      }
      readers.foreach(_.start())
      started.await()

      // the mutator walks S1..S5 over the wire while readers run;
      // before the LAST commit, wait for some in-flight reads so the
      // pre-final race window is guaranteed non-empty
      val s = script
      assert(call("POST", "/timeseries", tsJson(s(1))) == (200, "[]"))
      Thread.sleep(400)
      assert(call("POST", "/timeseries", tsJson(s(2).drop(s(1).size))) == (200, "[]"))
      Thread.sleep(400)
      assert(call("PUT", "/timeseries",
        tsJson(s(1).take(5).map(_.copy(value = 42.0)))) == (200, "[]"))
      Thread.sleep(400)
      val dels = s(3).filterNot(r => s(4).exists(k =>
        k.timestamp == r.timestamp && k.tag == r.tag))
      assert(call("DELETE", "/timeseries", keyJson(dels)) == (200, "[]"))
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (results.size < 8 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(results.size >= 8, "no concurrent reads landed before the last commit")
      assert(call("POST", "/timeseries",
        tsJson(s(5).drop(s(4).size))) == (200, "[]"))
      Thread.sleep(400)
      stop.set(true)
      readers.foreach(_.join(120000))
      assert(readers.forall(!_.isAlive), "reader threads failed to finish")
      assert(failures.isEmpty,
        s"reader thread threw: ${failures.asScala.headOption}")

      // Law 1: every in-flight response equals SOME committed state
      val all = results.asScala.toVector
      assert(all.size >= 20, s"only ${all.size} concurrent reads recorded")
      val perReaderCollect = Array.fill(4)(Vector.empty[Int])
      all.foreach { case (rid, qn0, code, resp) =>
        val isFinal = qn0.startsWith("final:")
        val qn = qn0.stripPrefix("final:")
        assert(code == 200, s"reader $rid $qn0 got $code: $resp")
        val j = valid(qn).indexOf(resp)
        assert(j >= 0,
          s"reader $rid $qn0 response matches NO committed state (torn read?): $resp")
        // compare bodies, not state indexes: an aggregate's S5 value
        // may coincide with an earlier state's (e.g. an unchanged max)
        if (isFinal) assert(resp == valid(qn).last,
          s"reader $rid post-commit $qn reflects a stale state: $resp")
        else if (qn == "collect")
          perReaderCollect(rid) = perReaderCollect(rid) :+ j
      }
      // Law 2: collect responses identify the state uniquely; per
      // reader the sequence must be monotone (versions never regress)
      perReaderCollect.zipWithIndex.foreach { case (seq, rid) =>
        assert(seq == seq.sorted,
          s"reader $rid observed manifest versions out of order: $seq")
      }
      // the run must actually have raced: some reader saw a pre-final
      // state while mutations were in flight
      assert(all.exists { case (_, qn, _, resp) =>
        valid(qn).indexOf(resp) < script.size - 1 },
        "no read landed before the last commit — race window too narrow")

      // Law 4 — time travel reconciles the race: after the dust
      // settles, the committed history is REPLAYABLE over the wire.
      // Every version's asof-collect must equal a scripted state, the
      // states must appear in version order, and all five commits must
      // be covered — the same immutable manifests that made the
      // concurrent reads consistent make the past queryable.
      val (vc, vBody) = call("GET", "/timeseries/versions", "")
      assert(vc == 200, s"versions endpoint failed: $vBody")
      val vNode = mapper.readTree(vBody)
      val versions = (0 until vNode.size).map(vNode.get(_).asLong()).toVector
      assert(versions == versions.sorted && versions.nonEmpty,
        s"versions endpoint not ascending: $versions")
      val stateIdx = versions.map { v =>
        val (c, resp) = call("POST", s"/timeseries/query?asof=$v", "{}")
        assert(c == 200, s"asof=$v failed: $resp")
        val j = valid("collect").indexOf(resp)
        assert(j >= 0, s"asof=$v matches no committed state: $resp")
        j
      }
      assert(stateIdx == stateIdx.sorted,
        s"asof states out of version order: $stateIdx")
      assert(stateIdx.last == script.size - 1 &&
        stateIdx.toSet.size >= script.size - 1,
        s"history not fully replayable: $stateIdx")
      // asof composes with export: identical bytes
      assert(call("POST", s"/timeseries/query?asof=${versions.head}&export=true", "{}")
        == call("POST", s"/timeseries/query?asof=${versions.head}", "{}"))
      // loud 400s: unknown version, non-integer, asof on a series route
      val badV = versions.max + 999
      assert(call("POST", s"/timeseries/query?asof=$badV", "{}")
        == (400, s"version $badV not found (never committed, or removed by vacuum)."))
      assert(call("POST", "/timeseries/query?asof=x", "{}")
        == (400, "'asof' must be an integer version."))
      assert(call("POST", s"/timeseries/query?asof=${versions.max}&window=$HOUR", "")
        == (400, "'asof' applies only to the plain query route."))

      // vacuum ends the replayable window LOUDLY: superseded manifests
      // reap, the versions endpoint shrinks to the current version,
      // every reaped asof is an exact 400, and the CURRENT state keeps
      // serving (the registered rollup may lose its diff base to the
      // vacuum — the engine then falls back to raw, still exact)
      val reaped = versions.dropRight(1)
      st.vacuum(retentionMs = 0L)
      val (vc2, vBody2) = call("GET", "/timeseries/versions", "")
      val vNode2 = mapper.readTree(vBody2)
      val after = (0 until vNode2.size).map(vNode2.get(_).asLong()).toVector
      assert(vc2 == 200 && after == Vector(versions.max),
        s"vacuum left versions $after, expected only ${versions.max}")
      reaped.foreach { v =>
        assert(call("POST", s"/timeseries/query?asof=$v", "{}")
          == (400, s"version $v not found (never committed, or removed by vacuum)."))
      }
      assert(call("POST", "/timeseries/query", """{"aggFunc":"count"}""")
        == (200, valid("count").last))
      assert(call("POST", s"/timeseries/query?asof=${versions.max}", "{}")
        == (200, valid("collect").last))
    } finally server.stop()
  }

  test("vacuum racing ?asof readers: snapshots stay whole, reaped versions 400 loudly, never silently") {
    // the wire-level twin of TimeSeriesStoreSpec's vacuum laws
    // (round-11 verdict #7): handleAsOf has NO check-then-act window
    // (it calls versionAsOf directly and maps its require to the
    // documented 400 — round-11 ADVICE #2), so a vacuum landing
    // between request parse and manifest read must produce the exact
    // 400 text, not a generic 500. Laws:
    //  1. every 200 is BYTE-exact some committed state (no torn
    //     snapshot assembled from a half-reaped manifest);
    //  2. every 400 is the exact reaped-version text;
    //  3. anything else (a mid-read segment reap aborting an already-
    //     planned scan) may only happen while vacuum() is actually
    //     in flight — never before, never after;
    //  4. after vacuum returns: reaped versions 400 always, the
    //     surviving version serves its exact bytes always.
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("apiconc3-store").toString)
    val server = new Server(spark, st, 0).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    def call(method: String, path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(URI.create(base + path))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      // three wire commits => four known states (S0 is pre-history and
      // carries no manifest of its own here: version trail starts at
      // the first commit)
      val s = script
      assert(call("POST", "/timeseries", tsJson(s(1))) == (200, "[]"))
      assert(call("POST", "/timeseries", tsJson(s(2).drop(s(1).size))) == (200, "[]"))
      assert(call("POST", "/timeseries",
        tsJson(s(5).drop(s(4).size))) == (200, "[]"))
      val states = Vector(s(1), s(2), s(2) ++ s(5).drop(s(4).size))
      val bodies = states.map(expected(_, "collect"))
      val vNode = mapper.readTree(call("GET", "/timeseries/versions", "")._2)
      val versions = (0 until vNode.size).map(vNode.get(_).asLong()).toVector
      // tolerate an initial empty-store manifest: map each version to
      // its expected body by aligning the TAIL of the version list
      assert(versions.size >= states.size, s"too few versions: $versions")
      val bodyOf: Map[Long, String] =
        versions.takeRight(states.size).zip(bodies).toMap ++
          versions.dropRight(states.size).map(_ -> expected(Vector.empty, "collect"))
      def reapedText(v: Long) =
        s"version $v not found (never committed, or removed by vacuum)."

      val results = new ConcurrentLinkedQueue[(Long, Long, Int, String)]()
      val failures = new ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val started = new CountDownLatch(3)
      val readers = (0 until 3).map { rid =>
        new Thread(() => {
          try {
            started.countDown()
            var i = rid
            while (!stop.get()) {
              val v = versions(i % versions.size)
              val t = System.nanoTime()
              val (code, resp) = call("POST", s"/timeseries/query?asof=$v", "{}")
              results.add((t, v, code, resp))
              i += 1
            }
          } catch { case t: Throwable => failures.add(t); () }
        })
      }
      readers.foreach(_.start())
      started.await()
      // let some pre-vacuum snapshot reads land, then reap mid-flight
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (results.size < 6 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(results.size >= 6, "no asof reads landed before the vacuum")
      val vacStart = System.nanoTime()
      st.vacuum(retentionMs = 0L)
      val vacEnd = System.nanoTime()
      Thread.sleep(300) // post-vacuum reads must observe the reap
      stop.set(true)
      readers.foreach(_.join(120000))
      assert(readers.forall(!_.isAlive), "asof reader threads hung")
      assert(failures.isEmpty, s"reader threw: ${failures.asScala.headOption}")

      val all = results.asScala.toVector.sortBy(_._1)
      var sawPre200 = false; var sawPost400 = false
      all.foreach { case (t, v, code, resp) =>
        code match {
          case 200 =>
            assert(resp == bodyOf(v),
              s"asof=$v 200 body is not that version's snapshot (torn?): $resp")
            assert(v == versions.max || t < vacEnd,
              s"asof=$v served a REAPED version after vacuum returned")
            if (t < vacStart && v != versions.max) sawPre200 = true
          case 400 =>
            // (no lower time bound: a request STARTED before the
            // vacuum may be processed after the reap — client-side
            // start stamps only bound the upper edge reliably)
            assert(resp == reapedText(v), s"asof=$v unexpected 400: $resp")
            assert(v != versions.max,
              "the surviving current version must never 400")
            if (t > vacEnd) sawPost400 = true
          case other =>
            // a scan planned against a manifest whose segments reap
            // mid-execution may abort — but only for requests that
            // OVERLAP the vacuum (started before it returned); a
            // request issued after the reap settled must get the
            // clean 400, never this
            assert(t <= vacEnd,
              s"asof=$v returned $other AFTER the vacuum window: $resp")
        }
      }
      assert(sawPre200, "race too narrow: no historical 200 before vacuum")
      assert(sawPost400, "race too narrow: no reaped 400 after vacuum")
      // settled state: reaped => exact 400, survivor => exact bytes
      versions.dropRight(1).foreach { v =>
        assert(call("POST", s"/timeseries/query?asof=$v", "{}")
          == (400, reapedText(v)))
      }
      assert(call("POST", s"/timeseries/query?asof=${versions.max}", "{}")
        == (200, bodyOf(versions.max)))
    } finally server.stop()
  }

  test("concurrent conflicting inserts of one new key: exactly one commits") {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory("apiconc2-store").toString)
    val server = new Server(spark, st, 0).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    def call(method: String, path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder(URI.create(base + path))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      assert(call("POST", "/timeseries",
        """[{"timestamp":1000,"tag":"seed","value":1.0}]""") == (200, "[]"))
      val body = """[{"timestamp":7777,"tag":"dup","value":2.5}]"""
      val codes = new ConcurrentLinkedQueue[Int]()
      val gate = new CountDownLatch(1)
      val ts = (0 until 2).map(_ => new Thread(() => {
        gate.await()
        codes.add(call("POST", "/timeseries", body)._1)
      }))
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join(60000))
      assert(codes.asScala.toSeq.sorted == Seq(200, 400),
        s"expected exactly one commit, got ${codes.asScala.toSeq}")
      assert(call("POST", "/timeseries/query", """{"aggFunc":"count"}""")
        == (200, """{"result":2.0}"""))
    } finally server.stop()
  }
}

package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
import graft.model.{QueryError, QueryModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Drop-in HTTP facade over the engine, mirroring the reference's
  * servant API (/root/reference/server/src/Api.hs:31-91):
  *
  *   POST   /timeseries        insert `[TS]`        (S1)
  *   PUT    /timeseries        update `[TS]`        (S2)
  *   DELETE /timeseries        delete `[TS']`; `[]` truncates (S3/S4)
  *   POST   /timeseries/query  QueryModel → QueryR  (S5)
  *   POST   /timeseries/query?points=N            downsampled series (S5+)
  *   POST   /timeseries/query?window=W[&slide=S]  windowed series    (S5+)
  *   POST   /timeseries/query?percentile=q[&by=tag]  sketch quantile (S5+)
  *   POST   /timeseries/query?distinct=true[&by=tag] distinct values (S5+)
  *   POST   /timeseries/query?gapfill=locf&agg=count gap-filled grid (S5+)
  *   POST   /timeseries/query?ohlc=W  open/high/low/close bars       (S5+)
  *   POST   /timeseries/query?top=k[&by=tag] top-k frequent values    (S5+)
  *   POST   /timeseries/query?increase=true  reset-aware counter inc. (S5+)
  *   POST   /timeseries/query?twa=true  LOCF time-weighted average    (S5+)
  *   POST   /timeseries/query?rate=true  counter rate + delta          (S5+)
  *   POST   /timeseries/query?regression=true[&by=tag]  slope/r fits  (S5+)
  *   POST   /timeseries/query?asof=V  time-travel query at version V (S7+)
  *   GET    /timeseries/versions      committed versions, ascending  (S7+)
  *
  * Success → 200 with JSON; validation/data errors → 400 with the
  * message, like the reference's Handler (Api.hs:78-84). Built on the
  * JDK's HttpServer — zero added dependencies; the engine does the
  * real work, this is ~150 lines of routing and codecs.
  *
  * `rollups` registers continuous aggregates with the query planner:
  * every query route then goes through
  * [[QueryEngine.execute(store,qm,rollups)*]], so eligible aggregates
  * are served from the rollup (real-time hybrid when stale — exact at
  * any staleness) with NO client-visible change. Mutations refresh the
  * registered rollups afterwards (O(changed days) each via the
  * content-id manifest diff); correctness never depends on that
  * refresh, only the served plan's cost does.
  */
final class Server(spark: SparkSession, store: TimeSeriesStore, port: Int,
                   rollups: Seq[ContinuousAggregate] = Nil) {
  import spark.implicits._

  /** One query path: always the store-routed engine, so every request
    * gets the full plan ladder — registered rollups first, then the
    * metadata-stats fold for day-aligned scalar aggregates, then the
    * tag-bloom-pruned scan for tagEq, then the plain pruned scan. (The
    * old rollup-less shortcut to `execute(store.current(), qm)` saved
    * one manifest read per request but cost the sidecar fast paths —
    * a scan of the whole range to answer a count the manifest already
    * knows.)
    */
  private def runQuery(qm: graft.model.QueryModel) =
    QueryEngine.execute(store, qm, rollups)

  /** Post-mutation freshness ride-along, same policy as the streaming
    * ingest path. Never load-bearing for correctness (stale rollups
    * answer via the hybrid), so failures must not fail the mutation
    * the client already committed.
    */
  private def refreshRollups(): Unit =
    // finest grain first: a hierarchical parent refolds its child only
    // when the child already reflects the new store version (same
    // ordering rule as StreamingIngest.ingestToStore)
    rollups.sortBy(_.grainMs).foreach { r =>
      try { r.refresh(); () }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] rollup refresh failed (hybrid still exact): $e")
      }
    }

  private val http = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = http.getAddress.getPort

  /** The reference's CORS policy (Api.hs:95-103, wai-cors
    * simpleCorsResourcePolicy): any origin, methods GET/POST/PUT/DELETE,
    * allowed request header Content-Type — it serves a browser client.
    */
  private def corsHeaders(ex: HttpExchange): Unit = {
    ex.getResponseHeaders.add("Access-Control-Allow-Origin", "*")
    ()
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", contentType)
    corsHeaders(ex)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** CORS preflight: 200 with the allow headers, empty body. */
  private def preflight(ex: HttpExchange): Unit = {
    corsHeaders(ex)
    ex.getResponseHeaders.add("Access-Control-Allow-Methods", "GET, POST, PUT, DELETE")
    ex.getResponseHeaders.add("Access-Control-Allow-Headers", "Content-Type")
    ex.sendResponseHeaders(200, -1)
    ex.getResponseBody.close()
  }

  /** S6 — query-and-export: same query semantics, but the result
    * streams to the client as a JSON file download
    * (`POST /timeseries/query?export=true`), chunked so driver memory
    * stays bounded for large collects. The reference client's
    * "Query and Export" button does this download client-side
    * (client/src/Api.elm:281-311); serving it here closes the surface
    * without a browser.
    */
  private def handleExport(ex: HttpExchange, body: String,
                           run: graft.model.QueryModel => Either[QueryError, DataFrame]
                             = runQuery): Unit = {
    val parsed = for {
      qm <- QueryJson.parseQueryModel(body)
      df <- run(qm)
    } yield (qm, df)
    parsed match {
      case Right((qm, df)) =>
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.getResponseHeaders.add("Content-Disposition",
          """attachment; filename="timeseries-export.json"""")
        corsHeaders(ex)
        ex.sendResponseHeaders(200, 0) // length 0 => chunked streaming
        val os = ex.getResponseBody
        // a NON-FATAL failure mid-stream cannot un-send the 200: log the
        // root cause and stop writing — the truncated body is NEVER
        // valid JSON (the closing bracket is written last), so clients
        // detect it. Rethrowing would reach handle()'s respond(500) on a
        // committed exchange, masking this error with
        // IllegalStateException. Fatal JVM errors (OOM, VM errors,
        // interrupts) propagate — swallowing those would hide a dying
        // server behind a quiet truncated download.
        try QueryJson.streamResult(qm, df, os)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft] export failed mid-stream (body truncated): $e")
        } finally os.close()
      case Left(e) => respond(ex, 400, QueryJson.encodeError(e), "text/plain")
    }
  }

  // ---- S5+ — the dashboard series surface (beyond-reference): the
  // auto-downsampling and sliding-window operators reach HTTP, so a
  // dashboard client gets the downsampled/windowed series built for it
  // instead of raw collects.
  //
  //   POST /timeseries/query?points=N           resolution-aware series
  //   POST /timeseries/query?window=W[&slide=S]  tumbling/sliding series
  //
  // The body is an OPTIONAL QueryModel carrying only timestamp bounds
  // and `tagEq` (gt/le canonicalize exactly like the parity path);
  // aggFunc/groupBy/tsEq/limit are 400s here — the series shape is
  // fixed at (window_start, tag, cnt, sum_val, min_val, max_val).
  // Rollup-routed when a registered rollup is eligible
  // (ContinuousAggregate.answerAtResolution / answerWindow — O(buckets)
  // refolds); EXACT raw fallback otherwise, so the route answers with
  // or without rollups and never silently changes results. tagEq (both
  // routes) and window_start bounds (window route — `points` consumes
  // its bounds as the span) post-filter the series, exact because both
  // are group keys. An empty slice is `"series": []`, not an error — a
  // grid with no data is an empty grid (same stance as answerGapFill).

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).toSeq.flatMap(_.split("&"))
      .flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }).toMap

  /** Parse + validate the series-route body: bounds/tagEq only. */
  private def seriesBody(body: String): Either[QueryError, QueryModel] =
    (if (body.trim.isEmpty) Right(QueryModel())
     else QueryJson.parseQueryModel(body)).flatMap { qm =>
      if (qm.aggFunc.isDefined || qm.groupBy.isDefined ||
          qm.tsEq.isDefined || qm.limit.isDefined)
        Left(QueryError.IllegalQuery(
          "Series routes take only timestamp bounds and 'tagEq' in the body."))
      else Right(QueryModel.canonicalTsBounds(qm))
    }

  /** tagEq on both routes; window_start bounds on the window route
    * (exact: both are group keys of the already-aggregated series). */
  private def postFilter(df: DataFrame, qm: QueryModel,
                         bounds: Boolean): DataFrame =
    Seq(
      qm.tagEq.map(col("tag") === _),
      if (bounds) qm.ge.map(col("window_start") >= _) else None,
      if (bounds) qm.lt.map(col("window_start") < _) else None,
      // canonicalTsBounds leaves only the Long.MaxValue edge as gt
      if (bounds) qm.gt.map(col("window_start") > _) else None
    ).flatten.foldLeft(df)(_ filter _)

  /** Exact raw-events twin of answerAtResolution's refold: `ge`-anchored
    * `width`-ms windows over the CURRENT snapshot. */
  private def rawResolutionSeries(ge: Long, lt: Long, width: Long): DataFrame =
    store.current()
      .filter(col("timestamp") >= ge && col("timestamp") < lt)
      .groupBy((expr(s"(timestamp - $ge) div $width") * width + ge)
          .as("window_start"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
      .orderBy(asc("window_start"), asc("tag"))

  /** Exact raw-events twin of answerWindow's refold: width/slide hop
    * via the same explode-of-starts plan over raw rows. */
  private def rawWindowSeries(width: Long, slide: Long): DataFrame = {
    val n = (width / slide).toInt
    val starts = (0 until n).map(i =>
      expr(s"timestamp div $slide") * slide - lit(i.toLong * slide))
    store.current()
      .select(col("tag"), col("value"), explode(array(starts: _*)).as("window_start"))
      .groupBy(col("window_start"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
      .orderBy(asc("window_start"), asc("tag"))
  }

  private def resolutionSeries(qm: QueryModel, points: Long)
      : Either[QueryError, String] = {
    if (points < 1 || points > 100000)
      return Left(QueryError.IllegalQuery("'points' must be in [1, 100000]."))
    (qm.ge, qm.lt) match {
      case (Some(ge), Some(lt)) if ge < lt =>
        val (width, df) = ContinuousAggregate
          .answerAtResolution(rollups, ge, lt, points.toInt)
          .getOrElse {
            val w = math.max(1L, ((lt - ge) + points - 1) / points)
            (w, rawResolutionSeries(ge, lt, w))
          }
        Right(QueryJson.encodeSeries(width, width,
          postFilter(df, qm, bounds = false)))
      case (Some(ge), Some(lt)) =>
        Left(QueryError.IllegalQuery(s"empty range [$ge, $lt)."))
      case _ =>
        Left(QueryError.IllegalQuery(
          "'points' requires both a lower and an upper timestamp bound."))
    }
  }

  private def windowSeries(qm: QueryModel, width: Long, slide: Long)
      : Either[QueryError, String] =
    if (width <= 0 || slide <= 0 || width % slide != 0)
      Left(QueryError.IllegalQuery(
        "'window' must be a positive multiple of 'slide'."))
    else if (width / slide > 4096)
      // each raw row / rollup bucket explodes width/slide times — cap
      // the fan-out so one request can't demand a quadratic plan
      Left(QueryError.IllegalQuery("'window'/'slide' ratio above 4096."))
    else {
      // coarsest eligible rollup first (fewest refolded rows); frozen
      // rollups never serve (they answer over dropped raw history —
      // same policy as the SQL rewrite); exact raw twin otherwise
      val routed = rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
        .flatMap(_.answerWindow(width, slide)).nextOption()
      val df = routed.getOrElse(rawWindowSeries(width, slide))
      Right(QueryJson.encodeSeries(width, slide,
        postFilter(df, qm, bounds = true)))
    }

  // ---- the SKETCH + GAP-FILL dashboard routes (same opt-in body) ----
  //
  //   POST /timeseries/query?percentile=q[&by=tag]   p-quantile (AggR shape)
  //   POST /timeseries/query?distinct=true[&by=tag]  count-distinct value
  //   POST /timeseries/query?gapfill=locf|interp|zero|none&agg=count|…
  //
  // percentile/distinct route to a registered SKETCH-BEARING rollup
  // when one serves the slice (O(buckets) GK/HLL merges — the
  // TimescaleDB approx_percentile-over-percentile_agg two-step), and
  // fall back to `percentile_approx`/`approx_count_distinct` over the
  // raw snapshot otherwise — both answers live inside the functions'
  // approximate contract; the ERROR BOUND is the serving path's own.
  // gapfill densifies [ge, lt) at the finest aligned rollup's grain
  // with TimescaleDB's locf()/interpolate() semantics; it has no raw
  // fallback (the grid IS the rollup grain), so no aligned rollup is a
  // 400, not a silent full scan.

  /** Bounds+tagEq filters over the raw snapshot for the sketch
    * fallbacks (includes the canonical-leftover gt MaxValue edge). */
  private def rawSlice(qm: QueryModel) = Seq(
    qm.ge.map(col("timestamp") >= _),
    qm.lt.map(col("timestamp") < _),
    qm.gt.map(col("timestamp") > _),
    qm.tagEq.map(col("tag") === _)
  ).flatten.foldLeft(store.current())(_ filter _)

  private def aggRows(df: DataFrame, aggCol: org.apache.spark.sql.Column,
                      byTag: Boolean): DataFrame =
    if (byTag) df.groupBy(col("tag").as("grp")).agg(aggCol.as("result"))
      .orderBy(asc("grp"))
    else df.agg(aggCol.as("result"))

  private def percentileRoute(qm: QueryModel, q: Double, byTag: Boolean)
      : Either[QueryError, String] =
    if (q < 0 || q > 1)
      Left(QueryError.IllegalQuery("'percentile' must be in [0, 1]."))
    else {
      val routed =
        if (qm.gt.isDefined) None // MaxValue edge: only raw expresses it
        else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
          .flatMap(_.answerPercentile(q, qm.ge, qm.lt, qm.tagEq, byTag))
          .nextOption()
      val df = routed.getOrElse(
        aggRows(rawSlice(qm), expr(s"percentile_approx(value, $q)"), byTag))
      Right(QueryJson.encodeAggRows(df, byTag))
    }

  private def distinctRoute(qm: QueryModel, byTag: Boolean)
      : Either[QueryError, String] = {
    val routed =
      if (qm.gt.isDefined) None
      else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
        .flatMap(_.answerDistinct(qm.ge, qm.lt, qm.tagEq, byTag)).nextOption()
    val df = routed.getOrElse(
      aggRows(rawSlice(qm),
        expr("approx_count_distinct(value)").cast("double"), byTag))
    Right(QueryJson.encodeAggRows(df, byTag))
  }

  /** Top-k frequent values (`?top=k[&by=tag]`): Misra-Gries-routed
    * when a sketch-bearing rollup serves the slice (O(buckets) summary
    * merges, estimates within N/(capacity+1), exact under capacity);
    * EXACT raw top-k otherwise — counts per value, (count desc, item
    * asc) tie-break. The global raw rank windows only the k rows a
    * TakeOrdered already bounded; the byTag rank partitions by tag.
    */
  private def topValuesRoute(qm: QueryModel, k: Long, byTag: Boolean)
      : Either[QueryError, String] =
    if (k < 1 || k > 1000)
      Left(QueryError.IllegalQuery("'top' must be in [1, 1000]."))
    else {
      import org.apache.spark.sql.expressions.Window
      val routed =
        if (qm.gt.isDefined) None // MaxValue edge: only raw expresses it
        else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
          .flatMap(_.answerTopValues(k.toInt, qm.ge, qm.lt, qm.tagEq, byTag))
          .nextOption()
      val df = routed.getOrElse {
        // items stringify exactly like the sketch build does
        // (value.cast(string)), so the two paths share a vocabulary
        // AND the (cnt desc, item asc) tie-break is the same
        // lexicographic order the Misra-Gries top-k uses
        if (byTag) {
          val w = Window.partitionBy(col("grp"))
            .orderBy(desc("cnt"), asc("item"))
          rawSlice(qm).groupBy(col("tag").as("grp"),
              col("value").cast("string").as("item"))
            .agg(count(lit(1)).as("cnt"))
            .withColumn("rank", row_number().over(w).cast("long"))
            .filter(col("rank") <= k)
            .select(col("grp"), col("rank"), col("item"),
              col("cnt").cast("double").as("est"))
            .orderBy(asc("grp"), asc("rank"))
        } else {
          val topK = rawSlice(qm)
            .groupBy(col("value").cast("string").as("item"))
            .agg(count(lit(1)).as("cnt"))
            .orderBy(desc("cnt"), asc("item")).limit(k.toInt)
          // the global rank windows ONLY these ≤k rows
          topK.withColumn("rank",
              row_number().over(Window.orderBy(desc("cnt"), asc("item")))
                .cast("long"))
            .select(col("rank"), col("item"),
              col("cnt").cast("double").as("est"))
            .orderBy(asc("rank"))
        }
      }
      Right(QueryJson.encodeTop(df, byTag))
    }

  // ---- the COUNTER-family routes (`?increase=true`, `?twa=true`):
  // PromQL counter_agg / TimescaleDB time_weight('LOCF') over HTTP.
  // Counter-mode rollups refold at O(buckets) from stored pairwise
  // witnesses; the raw twins re-derive the identical pair set over the
  // sliced events (exact — for `twa`, bit-matching scaled-integer
  // arithmetic; for `increase`, exact on integer-valued counters).

  /** Reset-aware counter increase per tag:
    * `[{grp, total_increase, n_resets, n_points}]`. */
  private def increaseRoute(qm: QueryModel): Either[QueryError, String] = {
    import org.apache.spark.sql.expressions.Window
    val routed =
      if (qm.gt.isDefined) None
      else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
        .flatMap(_.answerCounterIncrease(qm.ge, qm.lt, qm.tagEq)).nextOption()
    val df = routed.getOrElse {
      val w = Window.partitionBy(col("tag")).orderBy(col("timestamp"))
      rawSlice(qm)
        .withColumn("prev", lag(col("value"), 1).over(w))
        .withColumn("inc", when(col("prev").isNull, lit(0.0))
          .when(col("value") >= col("prev"), col("value") - col("prev"))
          .otherwise(col("value")))
        .withColumn("rst", when(col("prev").isNotNull &&
          col("value") < col("prev"), 1L).otherwise(0L))
        .groupBy(col("tag").as("grp"))
        .agg(sum(col("inc")).as("total_increase"),
          sum(col("rst")).as("n_resets"),
          count(lit(1)).as("n_points"))
        .orderBy(asc("grp"))
    }
    Right(QueryJson.encodeRows(df))
  }

  /** LOCF time-weighted average per tag:
    * `[{grp, twa, n_points, span_ms}]` — single-sample tags omitted
    * (no time span), same as the refold and the raw operator. */
  private def twaRoute(qm: QueryModel): Either[QueryError, String] = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.NumericFunctions.register(spark)
    val routed =
      if (qm.gt.isDefined) None
      else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
        .flatMap(_.answerTimeWeighted(qm.ge, qm.lt, qm.tagEq)).nextOption()
    val df = routed.getOrElse {
      val w = Window.partitionBy(col("tag")).orderBy(col("timestamp"))
      rawSlice(qm)
        .withColumn("dt", lead(col("timestamp"), 1).over(w) - col("timestamp"))
        .filter(col("dt").isNotNull)
        .groupBy(col("tag").as("grp"))
        .agg(
          round(graft.functions.NumericFunctions
              .sum128(round(col("value") * 100).cast("long") * col("dt"))
              .cast("double") / lit(100.0) / sum(col("dt")).cast("double"), 4)
            .as("twa"),
          (count(lit(1)) + 1).as("n_points"),
          sum(col("dt")).as("span_ms"))
        .orderBy(asc("grp"))
    }
    Right(QueryJson.encodeRows(df))
  }

  /** PromQL `rate` + TimescaleDB `delta` per tag (`?rate=true`):
    * `[{grp, rate_per_s, delta, span_ms, n_points}]` — reset-aware
    * increase divided by the slice's own span in seconds, plus the
    * reset-blind last−first delta; single-sample tags omitted (no
    * span), like `?twa` and the `counter_rate` SQL NULL. Counter-
    * rollup-routed (O(buckets) refold from stored witnesses); the raw
    * twin re-derives the identical pair set window-lag style —
    * increase/span/delta are exact integers on integer-valued counters
    * and the rate is the same single IEEE division, so routing never
    * changes wire bytes. */
  private def rateRoute(qm: QueryModel): Either[QueryError, String] = {
    import org.apache.spark.sql.expressions.Window
    val routed =
      if (qm.gt.isDefined) None
      else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
        .flatMap(_.answerCounterRate(qm.ge, qm.lt, qm.tagEq)).nextOption()
    val df = routed.getOrElse {
      val w = Window.partitionBy(col("tag")).orderBy(col("timestamp"))
      rawSlice(qm)
        .withColumn("prev", lag(col("value"), 1).over(w))
        .withColumn("inc", when(col("prev").isNull, lit(0.0))
          .when(col("value") >= col("prev"), col("value") - col("prev"))
          .otherwise(col("value")))
        .groupBy(col("tag").as("grp"))
        .agg(sum(col("inc")).as("total_increase"),
          (max(col("timestamp")) - min(col("timestamp"))).as("span_ms"),
          (max_by(col("value"), col("timestamp"))
            - min_by(col("value"), col("timestamp"))).as("delta"),
          count(lit(1)).as("n_points"))
        .filter(col("span_ms") > 0) // single-sample tags: no time span
        .select(col("grp"),
          (col("total_increase")
            / (col("span_ms").cast("double") / lit(1000.0))).as("rate_per_s"),
          col("delta"), col("span_ms"), col("n_points"))
        .orderBy(asc("grp"))
    }
    Right(QueryJson.encodeRows(df))
  }

  /** Linear regression of value over time (`?regression=true[&by=tag]`):
    * slope per day / intercept / Pearson r — stats-rollup-routed
    * (O(buckets) moment refolds) with a raw twin that computes the
    * IDENTICAL decimal(38,0) moments over the sliced events and then
    * applies the same centered closed form, so the two paths produce
    * identical integers and therefore identical bytes.
    */
  private def regressionRoute(qm: QueryModel, byTag: Boolean)
      : Either[QueryError, String] = {
    val routed =
      if (qm.gt.isDefined) None
      else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
        .flatMap(_.answerRegression(qm.ge, qm.lt, qm.tagEq, byTag)).nextOption()
    val df = routed.getOrElse {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val sliced = rawSlice(qm)
      val e = sliced
        .withColumn("t", col("timestamp").cast(dec))
        .withColumn("v", round(col("value") * 100).cast(dec))
      val moments = Seq(count(lit(1)).as("n"),
        sum(col("t")).cast(dec).as("r_sum_t"),
        sum(col("v")).cast(dec).as("r_sum_v"),
        sum(col("t") * col("v")).cast(dec).as("r_sum_tv"),
        sum(col("t") * col("t")).cast(dec).as("r_sum_t2"),
        sum(col("v") * col("v")).cast(dec).as("r_sum_v2"))
      val grouped =
        if (byTag) e.groupBy(col("tag").as("grp")).agg(moments.head, moments.tail: _*)
        else e.agg(moments.head, moments.tail: _*)
      // the centered closed form, expression-for-expression the refold's
      // (ContinuousAggregate.answerRegression) so doubles bit-match
      val n = col("n").cast(dec)
      // anchor mirrors the refold (ContinuousAggregate.answerRegression,
      // round-11 ADVICE #4): ge when given, else the slice's minimum
      // timestamp computed once — min over the identical slice, so the
      // routed and raw intercepts stay byte-identical while the decimal
      // cross products stay far from the (38,0) ceiling at any depth
      val c0v: Long = qm.ge.getOrElse {
        val r = sliced.agg(min(col("timestamp"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      val c0 = lit(c0v).cast(dec)
      val st = (col("r_sum_t") - n * c0).cast(dec)
      val stv = (col("r_sum_tv") - c0 * col("r_sum_v")).cast(dec)
      val st2 = (col("r_sum_t2") - lit(2L).cast(dec) * c0 * col("r_sum_t")
        + n * c0 * c0).cast(dec)
      val num = (n * stv - st * col("r_sum_v")).cast(dec)
      val denT = (n * st2 - st * st).cast(dec)
      val denV = (n * col("r_sum_v2")
        - col("r_sum_v") * col("r_sum_v")).cast(dec)
      val slopeMs = num.cast("double") / denT.cast("double") / lit(100.0)
      val out = grouped.select(
        (if (byTag) Seq(col("grp")) else Seq.empty[org.apache.spark.sql.Column]) ++ Seq(
          when(denT > 0, slopeMs * lit(86400000.0)).as("slope_per_day"),
          when(denT > 0,
            col("r_sum_v").cast("double") / lit(100.0) / col("n").cast("double")
              - slopeMs * (st.cast("double") / col("n").cast("double")))
            .as("intercept"),
          when(denT > 0 && denV > 0,
            num.cast("double")
              / sqrt(denT.cast("double") * denV.cast("double"))).as("r"),
          col("n").as("n_points")): _*)
      if (byTag) out.orderBy(asc("grp")) else out
    }
    Right(QueryJson.encodeRows(df))
  }

  private def gapFillRoute(qm: QueryModel, fillName: String, aggName: String)
      : Either[QueryError, String] = {
    import graft.engine.ContinuousAggregate.Fill
    val fill = fillName match {
      case "locf"   => Some(Fill.Locf)
      case "interp" => Some(Fill.Interp)
      case "zero"   => Some(Fill.Zero)
      case "none"   => Some(Fill.None)
      case _        => scala.None
    }
    (fill, graft.model.Agg.parse(aggName), qm.ge, qm.lt) match {
      case (None, _, _, _) => Left(QueryError.IllegalQuery(
        "'gapfill' must be one of locf, interp, zero, none."))
      case (_, None, _, _) => Left(QueryError.IllegalQuery(
        s"unknown 'agg': $aggName."))
      case (Some(f), Some(a), Some(ge), Some(lt)) if ge < lt =>
        rollups.filterNot(_.isFrozen).sortBy(_.grainMs).iterator
          .flatMap(r => r.answerGapFill(ge, lt, a, f, qm.tagEq)
            .map(df => (r.grainMs, df)))
          .nextOption() match {
          case Some((grain, df)) => Right(QueryJson.encodeGapFill(grain, df))
          case None => Left(QueryError.IllegalQuery(
            "no registered rollup aligns with the requested bounds."))
        }
      case _ => Left(QueryError.IllegalQuery(
        "'gapfill' requires both a lower and an upper timestamp bound."))
    }
  }

  /** OHLC bars (`?ohlc=W`): open/high/low/close per `W`-ms window per
    * tag — the candlestick dashboard query. Rollup-routed when a
    * registered rollup's grain divides `W` and the body bounds are
    * bucket-aligned (the buckets carry (first_ts, first_val, last_ts,
    * last_val) precisely so open/close REFOLD — O(buckets)); EXACT
    * raw-events twin otherwise: same window grid (`ts div W · W` —
    * bucket contraction preserves it since grain | W), open/close by
    * min_by/max_by over the event timestamps, which are unique per
    * (window, tag) by the primary key.
    */
  private def ohlcSeries(qm: QueryModel, width: Long)
      : Either[QueryError, String] =
    if (width <= 0)
      Left(QueryError.IllegalQuery("'ohlc' must be a positive window width."))
    else {
      val routed =
        if (qm.gt.isDefined) None // canonical-leftover gt MaxValue: raw only
        else rollups.filterNot(_.isFrozen).sortBy(-_.grainMs).iterator
          .flatMap(_.answerOhlc(width, qm.ge, qm.lt, qm.tagEq)).nextOption()
      val df = routed.getOrElse {
        rawSlice(qm)
          .withColumn("window_start", expr(s"timestamp div $width") * width)
          .groupBy(col("window_start"), col("tag"))
          .agg(min_by(col("value"), col("timestamp")).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), col("timestamp")).as("close"))
          .orderBy(asc("window_start"), asc("tag"))
      }
      Right(QueryJson.encodeOhlc(width, df))
    }

  private val seriesParams =
    Set("points", "window", "percentile", "distinct", "gapfill", "ohlc",
      "top", "increase", "twa", "rate", "regression")

  // ---- S7+ — time travel over the wire: the store's immutable
  // versioned manifests make every committed state queryable, so the
  // capability reaches users instead of staying an engine method.
  //
  //   POST /timeseries/query?asof=V   the parity QueryModel evaluated
  //                                   against versionAsOf(V) — same
  //                                   shapes, same 400 semantics;
  //                                   composes with ?export=true
  //   GET  /timeseries/versions       `[v0,v1,…]` ascending
  //
  // Deliberately RAW: rollups and sidecar fast paths reflect the
  // CURRENT version, so a historical read pays the pruned scan — time
  // travel is an audit tool, not the serving path. A version vacuum
  // already reaped is a loud 400, mirroring versionAsOf's require.
  private def handleAsOf(ex: HttpExchange, body: String,
                         params: Map[String, String]): Unit = {
    val snap: Either[QueryError, DataFrame] = for {
      _ <- if (params.keySet.intersect(seriesParams).isEmpty) Right(())
           else Left(QueryError.IllegalQuery(
             "'asof' applies only to the plain query route."))
      v <- params("asof").toLongOption.toRight(
        QueryError.IllegalQuery("'asof' must be an integer version."))
      // NO contains() pre-check (round-11 ADVICE #2): a concurrent
      // vacuum reaping the manifest between the check and the read
      // would turn versionAsOf's require into a generic 500. Calling
      // directly and mapping the require failure keeps the documented
      // loud 400 under any interleaving — and saves a directory
      // listing per request. NARROW catch (round-12 ADVICE #1):
      // versionAsOf also raises IAE from read(verifyExists=true) when
      // the manifest EXISTS but a day partition is gone — an integrity
      // failure (mid-vacuum tear or corruption), not a client error.
      // Only the manifest-missing require maps to the 400; anything
      // else rethrows to handle()'s 500.
      df <- try Right(store.versionAsOf(v))
            catch {
              case e: IllegalArgumentException
                  if String.valueOf(e.getMessage)
                    .contains(s"version $v not found") =>
                Left(QueryError.IllegalQuery(
                  s"version $v not found (never committed, or removed by vacuum)."))
            }
    } yield df
    snap match {
      case Left(e) => respond(ex, 400, QueryJson.encodeError(e), "text/plain")
      case Right(df) =>
        val run = (qm: QueryModel) => QueryEngine.execute(df, qm)
        if (params.get("export").contains("true")) handleExport(ex, body, run)
        else {
          val result = for {
            qm <- QueryJson.parseQueryModel(body)
            out <- run(qm)
          } yield QueryJson.encodeResult(qm, out)
          result match {
            case Right(json) => respond(ex, 200, json)
            case Left(e) => respond(ex, 400, QueryJson.encodeError(e), "text/plain")
          }
        }
    }
  }

  private def handleSeries(ex: HttpExchange, body: String,
                           params: Map[String, String]): Unit = {
    def longParam(k: String): Either[QueryError, Option[Long]] =
      params.get(k) match {
        case None => Right(None)
        case Some(v) => v.toLongOption.map(x => Right(Some(x))).getOrElse(
          Left(QueryError.IllegalQuery(s"'$k' must be an integer.")))
      }
    val byTag = params.get("by").contains("tag")
    val result: Either[QueryError, String] = for {
      qm <- seriesBody(body)
      points <- longParam("points")
      window <- longParam("window")
      slide <- longParam("slide")
      modes = params.keySet.intersect(seriesParams)
      json <- modes.toList match {
        case _ :: _ :: _ => Left(QueryError.IllegalQuery(
          s"Use exactly one of ${seriesParams.mkString("'", "'/'", "'")}."))
        case List("points") => points.fold[Either[QueryError, String]](
          Left(QueryError.IllegalQuery("'points' must be an integer.")))(
          resolutionSeries(qm, _))
        case List("window") => window.fold[Either[QueryError, String]](
          Left(QueryError.IllegalQuery("'window' must be an integer.")))(
          w => windowSeries(qm, w, slide.getOrElse(w)))
        case List("percentile") =>
          params("percentile").toDoubleOption.fold[Either[QueryError, String]](
            Left(QueryError.IllegalQuery("'percentile' must be a number.")))(
            percentileRoute(qm, _, byTag))
        case List("distinct") => distinctRoute(qm, byTag)
        case List("gapfill") => gapFillRoute(qm, params("gapfill"),
          params.getOrElse("agg", "count"))
        case List("ohlc") =>
          params("ohlc").toLongOption.fold[Either[QueryError, String]](
            Left(QueryError.IllegalQuery("'ohlc' must be an integer.")))(
            ohlcSeries(qm, _))
        case List("top") =>
          params("top").toLongOption.fold[Either[QueryError, String]](
            Left(QueryError.IllegalQuery("'top' must be an integer.")))(
            topValuesRoute(qm, _, byTag))
        case List("increase") => increaseRoute(qm)
        case List("twa") => twaRoute(qm)
        case List("rate") => rateRoute(qm)
        case List("regression") => regressionRoute(qm, byTag)
        case _ => Left(QueryError.IllegalQuery(
          "series route needs 'points' or 'window'"))
      }
    } yield json
    result match {
      case Right(json) => respond(ex, 200, json)
      case Left(e)     => respond(ex, 400, QueryJson.encodeError(e), "text/plain")
    }
  }

  private def handle(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val route = (ex.getRequestMethod, ex.getRequestURI.getPath)
    val isExport = Option(ex.getRequestURI.getQuery)
      .exists(_.split("&").contains("export=true"))
    try {
      if (route._1 == "OPTIONS") { preflight(ex); return }
      val params = queryParams(ex)
      if (route == ("POST", "/timeseries/query") && params.contains("asof")) {
        handleAsOf(ex, body, params); return
      }
      if (route == ("POST", "/timeseries/query") &&
          params.keySet.exists(seriesParams.contains)) {
        handleSeries(ex, body, params); return
      }
      if (route == ("POST", "/timeseries/query") && isExport) {
        handleExport(ex, body); return
      }
      val result: Either[QueryError, String] = route match {
        case ("POST", "/timeseries/query") =>
          for {
            qm <- QueryJson.parseQueryModel(body)
            df <- runQuery(qm)
          } yield QueryJson.encodeResult(qm, df)
        // mutation success bodies are `[]` — aeson's encoding of the
        // reference handlers' `return ()` (Api.hs:50,60,70)
        case ("POST", "/timeseries") =>
          QueryJson.parseTsBatch(body)
            .flatMap(b => store.insert(b.toDS()))
            .map { _ => refreshRollups(); "[]" }
        case ("PUT", "/timeseries") =>
          QueryJson.parseTsBatch(body)
            .flatMap(b => store.update(b.toDS()))
            .map { _ => refreshRollups(); "[]" }
        case ("DELETE", "/timeseries") if body.trim.isEmpty =>
          // bodyless DELETE = truncate (reference's bare Delete route,
          // Api.hs:91)
          store.truncate(); refreshRollups(); Right("[]")
        case ("GET", "/timeseries/versions") =>
          Right(store.versions.mkString("[", ",", "]"))
        case ("DELETE", "/timeseries") =>
          QueryJson.parseKeyBatch(body).flatMap {
            case keys if keys.isEmpty =>
              store.truncate(); refreshRollups(); Right("[]")
            case keys => store.delete(keys.toDS())
              .map { _ => refreshRollups(); "[]" }
          }
        case _ =>
          Left(QueryError.IllegalQuery(s"No route: ${route._1} ${route._2}"))
      }
      result match {
        case Right(json) => respond(ex, 200, json)
        // error bodies are raw text, like servant's errBody (Api.hs:79)
        case Left(e) => respond(ex, 400, QueryJson.encodeError(e), "text/plain")
      }
    } catch {
      case e: Throwable =>
        // respond() throws if the response is already committed (e.g. a
        // failure after a streaming route sent headers) — never let that
        // IllegalStateException replace the original error
        try respond(ex, 500, String.valueOf(e.getMessage), "text/plain")
        catch { case _: Throwable => () }
        // a fatal VM error (OOM, stack overflow) must still propagate
        // after the best-effort 500 — only NonFatal errors are the
        // server loop's to absorb
        if (!scala.util.control.NonFatal(e)) throw e
    }
  }

  // concurrent reads like warp/acid-state: queries run in parallel,
  // writes already serialize on the store's own lock. The pool is a
  // field so stop() can shut it down — its threads are NON-DAEMON, so
  // a leaked pool keeps the whole JVM alive after stop() (a driver
  // main that boots a Server would hang at exit instead of finishing)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)

  def start(): Server = {
    http.createContext("/", handle(_))
    http.setExecutor(pool)
    http.start()
    this
  }

  def stop(): Unit = { http.stop(0); pool.shutdown() }
}

/** `sbt "runMain graft.api.ServerMain [port] [storePath] [rollupPath]"` —
  * a third argument registers a daily continuous aggregate at that
  * path (refreshed at startup and after every mutation): eligible
  * aggregate queries are then served from the rollup automatically.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8081)
    val path = args.lift(1).getOrElse("/tmp/graft-store")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new TimeSeriesStore(spark, path)
    val rollups = args.lift(2).map { rp =>
      val r = new ContinuousAggregate(spark, store, rp)
      if (store.version >= 0) r.refresh()
      r
    }.toSeq
    val server = new Server(spark, store, port, rollups).start()
    println(s"[graft] serving on port ${server.boundPort}, store at $path" +
      rollups.headOption.map(_ => s", daily rollup registered").getOrElse(""))
    Thread.currentThread().join()
  }
}

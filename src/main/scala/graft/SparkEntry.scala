package graft

import graft.Materialize.MaterializeOps
import graft.engine.QueryEngine
import graft.functions.TextFunctions
import graft.model._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator row from SURVEY.md §2,
  * compiled through [[graft.engine.QueryEngine]] over the canonical TS
  * view (events → (timestamp, tag, value), FIXTURES.md §4), with a
  * DuckDB-equivalent SQL in [[oracleSql]].
  *
  * Determinism rules (SURVEY.md §7.4): every query ends in a total-order
  * sort; reassociation-sensitive Double aggregates (sum/avg) are rounded
  * to 4 decimals on BOTH sides so distributed vs sequential fold
  * differences cannot flip the driver's hash compare.
  */
object SparkEntry {

  // Time range present at every SF (data spans 2024-01-01..2024-01-30):
  // 2024-01-08T00:00Z .. 2024-01-22T00:00Z epoch millis.
  private val T1 = 1704672000000L
  private val T2 = 1705881600000L
  // A (timestamp, tag) that exists at sf0.01 (verify's SF).
  private val POINT_TS = 1704067207179L
  // 90 days in millis — shifts a batch's keys past the data's range.
  private val SHIFT = 7776000000L

  /** On-disk ANN index per sf dir ([[graft.operators.AnnIndexStore]]):
    * built and COMMITTED once per JVM (to a temp path here; in a
    * deployment it lives beside the table store), then every probe —
    * from any session, surviving session restarts — reads the
    * versioned parquet index. The corpus is never re-hashed per query.
    */
  private val annIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  // the demo indexes live in temp dirs — reap them when the JVM exits
  // (a deployment points AnnIndexStore at a durable path instead)
  sys.addShutdownHook {
    annIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  // one store HANDLE per (session, sf dir): the handle caches the
  // pinned version's probe state (params, centroids, DataFrame
  // handles), so repeated probes skip the per-call params/footer
  // re-reads — a fresh handle per query would pay them every time.
  // WEAK session keys: a strong (session, dir) key would pin every
  // short-lived session (and its cached plans) for the JVM's life
  private val annStores = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, graft.operators.AnnIndexStore]]()

  private def annStore(s: SparkSession, dir: String): graft.operators.AnnIndexStore = {
    import graft.operators.AnnIndexStore.{IvfParams, LshParams}
    // synchronized: TrieMap.getOrElseUpdate may run a racing thunk
    // twice, which would build (and orphan) a second full index
    annIndexPaths.synchronized {
      val path = annIndexPaths.getOrElseUpdate(dir, {
        val p = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
        new graft.operators.AnnIndexStore(s, p).write(Tables.embeddings(s, dir),
          LshParams(32, 6, 64), IvfParams(nlist = 32, refineIters = 2, dim = 64))
        p
      })
      val bySession = annStores.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty)
      bySession.getOrElseUpdate(dir, new graft.operators.AnnIndexStore(s, path))
    }
  }

  /** Bucketed lineitem/orders pair per (session, sf dir): written ONCE
    * per JVM ([[graft.sources.Bucketed.writeBucketed]], narrow
    * projections only), then every co-located join reads the bucketed
    * layout — the write-once/join-many trade the operator exists for.
    */
  /** Digest index per sf dir (x_dedup_incremental's history side):
    * built ONCE per JVM over doc_id < 250, probed by every pass — the
    * amortization the operator exists for (a per-pass rebuild would
    * make Bench time index construction, not the incremental probe).
    */
  private val digestIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    digestIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  /** Learned BPE merge table per sf dir: trained ONCE per JVM — the
    * tokenizer train-once/apply-many amortization (x_bpe_merges dumps
    * the table; x_bpe_encode_stats applies it scan-stage; a per-pass
    * retrain would make Bench time training, not the apply path).
    */
  private val bpeMergesByDir =
    scala.collection.concurrent.TrieMap.empty[String, Seq[graft.operators.Bpe.Merge]]

  private def bpeMergesFor(s: SparkSession, dir: String): Seq[graft.operators.Bpe.Merge] =
    bpeMergesByDir.synchronized {
      bpeMergesByDir.getOrElseUpdate(dir,
        graft.operators.Bpe.learnMerges(Tables.documents(s, dir), numMerges = 16))
    }

  /** Perceptual-hash index per sf dir (x_dedup_incremental_phash's
    * history side): media hashes of doc_id < 250 indexed ONCE per JVM,
    * probed by every pass — the amortization the incremental index
    * exists for.
    */
  private val phashIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    phashIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def phashIndexFor(s: SparkSession, dir: String): graft.operators.PhashIndex =
    phashIndexPaths.synchronized {
      val p = phashIndexPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-phash-idx").toString
        new graft.operators.PhashIndex(s, tmp).write(
          graft.operators.Multimodal.imageHashes(graft.operators.Multimodal
            .syntheticMedia(Tables.documents(s, dir).filter(col("doc_id") < 250))).toDF())
        tmp
      })
      new graft.operators.PhashIndex(s, p)
    }

  /** Trained quality-classifier model per sf dir (train-once/apply-many
    * like the tokenizer): labels distill the heuristic qualityScore at
    * its 0.4 cut — the production pattern (cheap heuristic/LLM labels
    * bootstrap a learnable filter that then scores scan-stage).
    */
  private val qualityModels = scala.collection.concurrent.TrieMap
    .empty[String, graft.operators.QualityModel.Model]

  private def qualityModelFor(s: SparkSession, dir: String): graft.operators.QualityModel.Model =
    qualityModels.synchronized {
      qualityModels.getOrElseUpdate(dir, {
        val docs = Tables.documents(s, dir).withColumn("label",
          (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.4).cast("int"))
        graft.operators.QualityModel.train(docs, "label")
      })
    }

  /** Continuous-aggregate fixture per sf dir: a real
    * [[graft.engine.TimeSeriesStore]] loaded ONCE per JVM from the
    * events fixture (temp dir; a deployment's store is durable), with
    * its day×tag rollup ([[graft.engine.ContinuousAggregate]])
    * refreshed to the store head. Every ts3_cagg_* query is answered
    * FROM THE ROLLUP via the materialized-view rewrite
    * (`ContinuousAggregate.answer`) — O(days × tags) rows scanned
    * instead of O(events), the reason a TSDB maintains continuous
    * aggregates. The DuckDB oracles aggregate the raw events directly,
    * so a hash match proves rewrite == direct aggregation.
    */
  private val caggStorePaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val caggRollupPaths =
    scala.collection.concurrent.TrieMap.empty[(String, Long), String]

  sys.addShutdownHook {
    (caggStorePaths.values ++ caggRollupPaths.values).foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  /** The fixture store backing every cagg query for one sf dir. */
  private def caggStoreFor(s: SparkSession, dir: String): graft.engine.TimeSeriesStore =
    caggStorePaths.synchronized {
      val stPath = caggStorePaths.getOrElseUpdate(dir, {
        import s.implicits._
        val stTmp = java.nio.file.Files.createTempDirectory("graft-cagg-store").toString
        val st = new graft.engine.TimeSeriesStore(s, stTmp)
        st.insert(Tables.ts(s, dir).as[TS]).left.foreach(errs =>
          throw new IllegalStateException(
            s"cagg fixture load failed: ${errs.messages.headOption.getOrElse("")}"))
        stTmp
      })
      new graft.engine.TimeSeriesStore(s, stPath)
    }

  /** One store per sf dir; one rollup per (sf dir, bucket grain) —
    * the daily, hourly and weekly caggs hang off the SAME store, like
    * multiple materialized views over one hypertable. */
  private def caggFor(s: SparkSession, dir: String,
                      bucketMs: Long = 86400000L): graft.engine.ContinuousAggregate =
    caggStorePaths.synchronized {
      val st = caggStoreFor(s, dir)
      val aggPath = caggRollupPaths.getOrElseUpdate((dir, bucketMs), {
        val aggTmp = java.nio.file.Files.createTempDirectory("graft-cagg-rollup").toString
        new graft.engine.ContinuousAggregate(s, st, aggTmp, bucketMs).refresh()
        aggTmp
      })
      new graft.engine.ContinuousAggregate(s, st, aggPath, bucketMs)
    }

  /** SKETCH-BEARING daily rollup over the same fixture store: each
    * (bucket, tag) row carries a mergeable GK quantile summary and an
    * HLL sketch, so percentile / count-distinct queries — aggregates
    * with NO additive refold — are answered in O(buckets) too
    * ([[graft.engine.ContinuousAggregate.answerPercentile]] /
    * `answerDistinct`). Its own path map: sketch mode is fixed at
    * construction and its segments must not mix with the plain ones.
    */
  private val caggSketchPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    caggSketchPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def caggSketchFor(s: SparkSession, dir: String): graft.engine.ContinuousAggregate =
    caggStorePaths.synchronized {
      val st = caggStoreFor(s, dir)
      val aggPath = caggSketchPaths.getOrElseUpdate(dir, {
        val aggTmp = java.nio.file.Files.createTempDirectory("graft-cagg-sketch").toString
        new graft.engine.ContinuousAggregate(s, st, aggTmp,
          sketchRelErr = Some(0.01)).refresh()
        aggTmp
      })
      new graft.engine.ContinuousAggregate(s, st, aggPath,
        sketchRelErr = Some(0.01))
    }

  /** DOWNSAMPLING-RETENTION fixture: a separate store loaded from the
    * same events, rolled up daily with `freezeBeforeDay` at T1+3d,
    * then `dropDaysBefore` REMOVES the raw events below that horizon.
    * The frozen rollup keeps answering over the dropped history — and
    * because the events FIXTURE still has every row, the DuckDB oracle
    * can verify the downsampled answer exactly ("raw for N days,
    * rollup forever", TimescaleDB retention + cagg).
    */
  private val caggFrozenPaths =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  sys.addShutdownHook {
    caggFrozenPaths.values.foreach { case (a, b) =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(a), swallow = true)
      graft.Fs.deleteTree(java.nio.file.Paths.get(b), swallow = true)
    }
  }

  private def caggFrozenFor(s: SparkSession, dir: String): graft.engine.ContinuousAggregate =
    caggFrozenPaths.synchronized {
      val horizon = (T1 + 3 * 86400000L) / 86400000L
      val (stPath, aggPath) = caggFrozenPaths.getOrElseUpdate(dir, {
        import s.implicits._
        val stTmp = java.nio.file.Files.createTempDirectory("graft-cagg-frz-store").toString
        val aggTmp = java.nio.file.Files.createTempDirectory("graft-cagg-frz-rollup").toString
        val st = new graft.engine.TimeSeriesStore(s, stTmp)
        st.insert(Tables.ts(s, dir).as[TS]).left.foreach(errs =>
          throw new IllegalStateException(
            s"frozen fixture load failed: ${errs.messages.headOption.getOrElse("")}"))
        val r = new graft.engine.ContinuousAggregate(s, st, aggTmp,
          freezeBeforeDay = Some(horizon))
        r.refresh()
        require(st.dropDaysBefore(horizon * 86400000L) > 0,
          "frozen fixture must actually drop raw history")
        r.refresh() // sees the drop, carries the frozen buckets
        (stTmp, aggTmp)
      })
      new graft.engine.ContinuousAggregate(s,
        new graft.engine.TimeSeriesStore(s, stPath), aggPath,
        freezeBeforeDay = Some(horizon))
    }

  /** counterMode rollup over the SAME fixture store as [[caggFor]] —
    * another materialized view off one hypertable; its stored pairwise
    * witnesses (twsum + first/last) answer the time-weighted average.
    */
  private val caggTwPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    caggTwPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  /** STATS-MODE fixture: a daily rollup storing additive regression
    * moments (Σt, Σv, Σtv, Σt², Σv² in exact decimal) over the shared
    * cagg store — slope/intercept/corr answered in O(buckets). */
  private val caggStatsPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    caggStatsPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def caggStatsFor(s: SparkSession, dir: String): graft.engine.ContinuousAggregate =
    caggStorePaths.synchronized {
      val st = caggStoreFor(s, dir)
      val aggPath = caggStatsPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-cagg-stats-rollup").toString
        new graft.engine.ContinuousAggregate(s, st, tmp,
          statsMode = true).refresh()
        tmp
      })
      new graft.engine.ContinuousAggregate(s, st, aggPath, statsMode = true)
    }

  private def caggTwFor(s: SparkSession, dir: String): graft.engine.ContinuousAggregate =
    caggStorePaths.synchronized {
      val st = caggStoreFor(s, dir)
      val aggPath = caggTwPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-cagg-tw-rollup").toString
        new graft.engine.ContinuousAggregate(s, st, tmp,
          counterMode = true).refresh()
        tmp
      })
      new graft.engine.ContinuousAggregate(s, st, aggPath, counterMode = true)
    }

  /** COUNTER-MODE fixture: the synthetic cumulative counter (same
    * derivation as x_counter_rate) loaded as a store of its own, with
    * a daily `counterMode` rollup — each bucket stores its internal
    * reset-aware increase, boundary pairs re-derive from first/last.
    */
  private val caggCounterPaths =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  sys.addShutdownHook {
    caggCounterPaths.values.foreach { case (a, b) =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(a), swallow = true)
      graft.Fs.deleteTree(java.nio.file.Paths.get(b), swallow = true)
    }
  }

  private def caggCounterFor(s: SparkSession, dir: String): graft.engine.ContinuousAggregate =
    caggCounterPaths.synchronized {
      val (stPath, aggPath) = caggCounterPaths.getOrElseUpdate(dir, {
        import s.implicits._
        val stTmp = java.nio.file.Files.createTempDirectory("graft-cagg-ctr-store").toString
        val aggTmp = java.nio.file.Files.createTempDirectory("graft-cagg-ctr-rollup").toString
        val st = new graft.engine.TimeSeriesStore(s, stTmp)
        val counter = graft.operators.TsAnalytics
          .syntheticCounter(Tables.ts(s, dir), wrap = 1000000L)
          .select(col("timestamp"), col("tag"),
            col("counter").cast("double").as("value")).as[TS]
        st.insert(counter).left.foreach(errs =>
          throw new IllegalStateException(
            s"counter fixture load failed: ${errs.messages.headOption.getOrElse("")}"))
        new graft.engine.ContinuousAggregate(s, st, aggTmp,
          counterMode = true).refresh()
        (stTmp, aggTmp)
      })
      new graft.engine.ContinuousAggregate(s,
        new graft.engine.TimeSeriesStore(s, stPath), aggPath,
        counterMode = true)
    }

  /** ts3 queries go through the PUBLIC engine entry point with the
    * rollup registered — [[graft.engine.QueryEngine.execute]] routes
    * eligible shapes to the rollup automatically (PlanAuditSpec pins
    * that the routed plan reads only rollup segments). The explicit
    * `answer` probe stays as the eligibility tripwire: if the rewrite
    * gate ever regresses, these queries fail loudly instead of
    * silently passing their oracles via the raw-store fallthrough.
    */
  /** HIERARCHICAL rollup fixture: a weekly aggregate whose refresh
    * REFOLDS the daily rollup's buckets (TimescaleDB 2.x hierarchical
    * continuous aggregates) — O(child buckets), never raw events. The
    * build asserts the fast path actually ran: a silent raw fallback
    * would still be hash-green, which is exactly why it must fail
    * loudly here instead.
    */
  private val caggHierPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    caggHierPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def caggHierFor(s: SparkSession, dir: String): graft.engine.ContinuousAggregate =
    caggStorePaths.synchronized {
      val st = caggStoreFor(s, dir)
      val daily = caggFor(s, dir)
      val aggPath = caggHierPaths.getOrElseUpdate(dir, {
        val aggTmp = java.nio.file.Files.createTempDirectory("graft-cagg-hier").toString
        daily.refresh() // child must reflect the current store version
        val stats = new graft.engine.ContinuousAggregate(s, st, aggTmp,
          bucketMs = 604800000L, source = Some(daily)).refresh()
        require(stats.fromChild,
          s"hierarchical fixture fell back to raw events: $stats")
        aggTmp
      })
      new graft.engine.ContinuousAggregate(s, st, aggPath,
        bucketMs = 604800000L, source = Some(daily))
    }

  private def caggAnswer(s: SparkSession, dir: String, qm: QueryModel,
                         bucketMs: Long = 86400000L): DataFrame = {
    val r = caggFor(s, dir, bucketMs)
    require(r.answer(qm).isDefined,
      s"ts3 query no longer rollup-eligible — the rewrite gate regressed: $qm")
    graft.engine.QueryEngine.execute(caggStoreFor(s, dir), qm, Seq(r)).fold(
      e => throw new IllegalStateException(s"ts3 engine-routed query failed: ${e.message}"),
      identity)
  }

  /** REAL-TIME aggregate fixture: events before T2 are rolled up, then
    * the post-T2 tail (~9 days) is committed WITHOUT a refresh — the
    * always-there hot tail of a live ingest. The ts3_cagg_realtime_*
    * queries route through the engine against this deliberately-stale
    * rollup, so their DuckDB oracles (raw aggregation over ALL events)
    * prove the hybrid carried-buckets + raw-tail path is exact.
    */
  private val caggRtPaths =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  sys.addShutdownHook {
    caggRtPaths.values.foreach { case (a, b) =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(a), swallow = true)
      graft.Fs.deleteTree(java.nio.file.Paths.get(b), swallow = true)
    }
  }

  private def caggRtFor(s: SparkSession, dir: String)
      : (graft.engine.TimeSeriesStore, graft.engine.ContinuousAggregate) =
    caggRtPaths.synchronized {
      val (stP, agP) = caggRtPaths.getOrElseUpdate(dir, {
        import s.implicits._
        val stTmp = java.nio.file.Files.createTempDirectory("graft-cagg-rt-store").toString
        val agTmp = java.nio.file.Files.createTempDirectory("graft-cagg-rt-rollup").toString
        val st = new graft.engine.TimeSeriesStore(s, stTmp)
        val all = Tables.ts(s, dir)
        def load(cond: org.apache.spark.sql.Column): Unit =
          st.insert(all.filter(cond).as[TS]).left.foreach(errs =>
            throw new IllegalStateException(
              s"cagg rt fixture load failed: ${errs.messages.headOption.getOrElse("")}"))
        load(col("timestamp") < T2)
        new graft.engine.ContinuousAggregate(s, st, agTmp).refresh()
        load(col("timestamp") >= T2) // the hot tail: never refreshed in
        (stTmp, agTmp)
      })
      val st = new graft.engine.TimeSeriesStore(s, stP)
      (st, new graft.engine.ContinuousAggregate(s, st, agP))
    }

  private def caggRtAnswer(s: SparkSession, dir: String, qm: QueryModel): DataFrame = {
    val (st, r) = caggRtFor(s, dir)
    require(r.reflectedStoreVersion.exists(_ != st.version),
      "realtime fixture must be STALE — the hybrid path is the point")
    graft.engine.QueryEngine.execute(st, qm, Seq(r)).fold(
      e => throw new IllegalStateException(s"ts3 realtime query failed: ${e.message}"),
      identity)
  }

  /** SQL-level rollup routing ([[graft.engine.RollupSqlRewrite]]):
    * ts3_cagg_sql_* run PLAIN Spark SQL over a temp view of the
    * fixture store; the Catalyst optimizer rule (installed through the
    * public `spark.experimental.extraOptimizations` hook) rewrites the
    * aggregates to refold rollup segments — the TimescaleDB "planner
    * uses the cagg automatically" story extended past the QueryModel
    * API to any SQL user. The `require` is a tripwire: these queries
    * must ACTUALLY route (their oracles would also pass via a silent
    * raw fallthrough, which would make them non-evidence).
    */
  private def caggSqlAnswer(s: SparkSession, dir: String, stale: Boolean,
                            sql: String => String,
                            sketch: Boolean = false): DataFrame = {
    val (st, rollups, marker) =
      if (stale) { val (st0, r0) = caggRtFor(s, dir); (st0, Seq(r0), "graft-cagg-rt-rollup") }
      else if (sketch)
        // plain daily AND the sketch-bearing rollup registered — the
        // approx aggregates must land on the SKETCHED one (the plain
        // rollup lacks the vocabulary and is passed over)
        (caggStoreFor(s, dir), Seq(caggFor(s, dir), caggSketchFor(s, dir)),
          "graft-cagg-sketch")
      else (caggStoreFor(s, dir), Seq(caggFor(s, dir)), "graft-cagg-rollup")
    graft.engine.RollupSqlRewrite.register(s, st, rollups)
    val v = s"graft_ts_${if (stale) "rt" else "fr"}_${math.abs(dir.hashCode)}"
    st.current().createOrReplaceTempView(v)
    val df = s.sql(sql(v))
    require(df.queryExecution.executedPlan.toString.contains(marker),
      s"ts3 SQL query did not route to the rollup — the Catalyst rewrite regressed")
    df
  }

  /** PLAIN SQL answered by the METADATA-STATS fold: the rewrite rule
    * turns a global day-aligned aggregate over the registered store
    * view into a literal one-row plan — the tripwire requires the
    * executed plan to read NEITHER raw segments NOR rollup segments
    * (nothing at all). Raw-events DuckDB oracles prove the fold exact.
    */
  private def metaSqlAnswer(s: SparkSession, dir: String,
                            sql: String => String): DataFrame = {
    val st = caggStoreFor(s, dir)
    graft.engine.RollupSqlRewrite.register(s, st, Seq(caggFor(s, dir)))
    val v = s"graft_ts_fr_${math.abs(dir.hashCode)}"
    st.current().createOrReplaceTempView(v)
    val df = s.sql(sql(v))
    val plan = df.queryExecution.executedPlan.toString
    require(!plan.contains("parquet"),
      s"metadata SQL query still scans files — the MetaStats rewrite regressed:\n$plan")
    df
  }

  /** PLAIN SQL over the COUNTER fixture store (counter_increase /
    * counter_resets — [[graft.functions.CounterFunctions]]): the
    * Catalyst rule swaps the ordered-fold expansions for O(buckets)
    * refolds over the counter-mode rollup's stored incr/n_resets +
    * first/last boundary witnesses. Tripwired like [[caggSqlAnswer]]:
    * the raw fold would pass the oracle too, so the plan must prove
    * it reads rollup segments.
    */
  private def ctrSqlAnswer(s: SparkSession, dir: String,
                           sql: String => String): DataFrame = {
    val r = caggCounterFor(s, dir)
    val st = new graft.engine.TimeSeriesStore(s, caggCounterPaths(dir)._1)
    graft.engine.RollupSqlRewrite.register(s, st, Seq(r))
    val v = s"graft_ts_ctr_${math.abs(dir.hashCode)}"
    st.current().createOrReplaceTempView(v)
    val df = s.sql(sql(v))
    require(df.queryExecution.executedPlan.toString.contains("graft-cagg-ctr-rollup"),
      "counter SQL query did not route to the rollup — the Catalyst rewrite regressed")
    df
  }

  /** PLAIN SQL `time_weight_locf` over the SHARED cagg store, with
    * BOTH the plain daily rollup and the counter-mode one registered —
    * the counter vocabulary must land on the COUNTER rollup (the plain
    * one lacks twsum and is passed over), mirroring the sketch-routing
    * pass-over proof. */
  private def twSqlAnswer(s: SparkSession, dir: String,
                          sql: String => String): DataFrame = {
    val st = caggStoreFor(s, dir)
    graft.engine.RollupSqlRewrite.register(s, st,
      Seq(caggFor(s, dir), caggTwFor(s, dir)))
    val v = s"graft_ts_tw_${math.abs(dir.hashCode)}"
    st.current().createOrReplaceTempView(v)
    val df = s.sql(sql(v))
    require(df.queryExecution.executedPlan.toString.contains("graft-cagg-tw-rollup"),
      "time-weight SQL query did not route to the counter rollup — the Catalyst rewrite regressed")
    df
  }

  /** PLAIN SQL `time_bucket_gapfill` + `locf()`/`interpolate()`
    * ([[graft.functions.GapFillFunctions]]) over the shared cagg
    * store, with the daily AND hourly rollups registered — the hourly
    * gapfill must land on the HOURLY rollup (the daily grain cannot
    * align) and must never scan raw segments: gap-filling is the one
    * SQL shape with NO raw execution (the markers throw unrouted), so
    * the tripwire proves the densify-and-fill plan refolds buckets.
    */
  private def gapfillSqlAnswer(s: SparkSession, dir: String,
                               sql: String => String): DataFrame = {
    val st = caggStoreFor(s, dir)
    graft.engine.RollupSqlRewrite.register(s, st,
      Seq(caggFor(s, dir), caggFor(s, dir, 3600000L)))
    val v = s"graft_ts_gf_${math.abs(dir.hashCode)}"
    st.current().createOrReplaceTempView(v)
    val df = s.sql(sql(v))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("graft-cagg-rollup"),
      "gapfill SQL query did not route to the rollup — the Catalyst rewrite regressed")
    require(!plan.contains("graft-cagg-store"),
      "gapfill SQL query still scans raw segments — the rollup routing regressed")
    df
  }

  private def digestIndexFor(s: SparkSession, dir: String): graft.operators.DigestIndex =
    digestIndexPaths.synchronized {
      val p = digestIndexPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-digest-idx").toString
        new graft.operators.DigestIndex(s, tmp).write(
          Tables.documents(s, dir).filter(col("doc_id") < 250))
        tmp
      })
      new graft.operators.DigestIndex(s, p)
    }

  /** Digest index WITH a takedown (x_dedup_delete's history side):
    * doc_id < 250 indexed, then doc_id < 50 tombstoned — separate from
    * [[digestIndexFor]]'s index so the delete never leaks into
    * x_dedup_incremental's oracle.
    */
  private val digestDeleteIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    digestDeleteIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def digestDeleteIndexFor(s: SparkSession, dir: String): graft.operators.DigestIndex =
    digestDeleteIndexPaths.synchronized {
      val p = digestDeleteIndexPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-digest-del-idx").toString
        val idx = new graft.operators.DigestIndex(s, tmp)
        idx.write(Tables.documents(s, dir).filter(col("doc_id") < 250))
        idx.delete(Tables.documents(s, dir).filter(col("doc_id") < 50))
        tmp
      })
      new graft.operators.DigestIndex(s, p)
    }

  /** Stats index per sf dir (x_corpus_stats_* history side): doc_id <
    * 250 aggregated once per JVM, the rest appended — the report
    * merges batch partials, never re-scanning the corpus.
    */
  private val statsIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    statsIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def statsIndexFor(s: SparkSession, dir: String): graft.operators.StatsIndex =
    statsIndexPaths.synchronized {
      val p = statsIndexPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-stats-idx").toString
        val idx = new graft.operators.StatsIndex(s, tmp)
        idx.write(Tables.documents(s, dir).filter(col("doc_id") < 250))
        idx.append(Tables.documents(s, dir).filter(col("doc_id") >= 250))
        tmp
      })
      new graft.operators.StatsIndex(s, p)
    }

  /** MinHash index per sf dir (x_dedup_incremental_neardup's history
    * side): built ONCE per JVM over doc_id < 250, probed by every pass
    * — history is signed once; each probe signs only its batch.
    */
  private val minhashIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    minhashIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def minhashIndexFor(s: SparkSession, dir: String): graft.operators.MinHashIndex =
    minhashIndexPaths.synchronized {
      val p = minhashIndexPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-minhash-idx").toString
        new graft.operators.MinHashIndex(s, tmp).write(
          Tables.documents(s, dir).filter(col("doc_id") < 250))
        tmp
      })
      new graft.operators.MinHashIndex(s, p)
    }

  /** Cluster index per sf dir (x_dedup_clusters_incremental's history
    * side): the doc_id < 250 corpus's near-dup pairs clustered ONCE
    * per JVM; each pass appends the batch's edges — idempotently (a
    * replayed append changes no assignments and SkipCommits), so
    * repeated bench passes measure the incremental merge, not
    * compounding state.
    */
  private val clusterIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    clusterIndexPaths.values.foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def clusterIndexFor(s: SparkSession, dir: String): graft.operators.ClusterIndex =
    clusterIndexPaths.synchronized {
      val p = clusterIndexPaths.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-cluster-idx").toString
        new graft.operators.ClusterIndex(s, tmp).write(
          Dedup.minhashPairs(Tables.documents(s, dir).filter(col("doc_id") < 250),
            n = 3, k = 64, bands = 16, minEstJaccard = 0.5)
            .select(col("id_a"), col("id_b")))
        tmp
      })
      new graft.operators.ClusterIndex(s, p)
    }

  /** Deterministic URL column over the documents table (the
    * x_domain_* inputs): host = w{doc_id%23}.{source}.{tld} with the
    * tld cycling through single- and multi-part suffixes, so the
    * registrable domain is {source}.{tld} by construction — an
    * SQL-derivable ground truth for the Spark-side parse+PSL
    * heuristic.
    */
  private def synthUrl: org.apache.spark.sql.Column = synthUrlFor(col("doc_id"))

  private def synthUrlFor(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("http://w"), pmod(id, lit(23)).cast("string"),
      lit("."), col("source"), lit("."),
      element_at(typedlit(Seq("com", "co.uk", "org", "com.au", "net")),
        (pmod(id, lit(5)) + 1).cast("int")),
      lit("/p/"), id.cast("string"))

  /** Deterministic WARC fixture (x_source_warc's input): one plain
    * `.warc` with 26 well-formed records — one of whose payloads
    * embeds a fake record boundary, which Content-Length framing must
    * carry straight through — a garbage run spliced between records
    * (exercising resync-and-quarantine), and a byte-identical `.gz`
    * twin (the Common-Crawl transport). Written ONCE per JVM; all
    * content is literal, so every pass and every engine sees the same
    * bytes.
    */
  private val warcFixturePath =
    new java.util.concurrent.atomic.AtomicReference[String]()

  sys.addShutdownHook {
    Option(warcFixturePath.get()).foreach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def warcFixtureFor(): String = warcFixturePath.synchronized {
    Option(warcFixturePath.get()).getOrElse {
      val dir = java.nio.file.Files.createTempDirectory("graft-warc-fixture")
      val iso = java.nio.charset.StandardCharsets.ISO_8859_1
      def rec(i: Int, wtype: String, body: String) =
        (wtype, s"http://example.org/page/$i", f"2024-01-${i % 28 + 1}%02dT00:00:00Z",
          if (wtype == "response") "text/html" else "application/warc-fields",
          body.getBytes(iso))
      val head = (0 until 20).map(i =>
        rec(i, "response", s"<html>doc $i ${"lorem ipsum " * (i + 1)}</html>")) :+
        // a payload embedding a fake boundary: framing is by
        // Content-Length, so this must stay ONE record
        rec(20, "response", "binary-ish\r\n\r\nWARC/1.0\r\nnot a header") :+
        rec(21, "request", "GET / HTTP/1.1")
      val tail = (22 until 26).map(i => rec(i, "metadata", s"fetch-ms: $i"))
      val h = dir.resolve("head.tmp"); val t = dir.resolve("tail.tmp")
      graft.sources.Warc.writeFixture(h, head)
      graft.sources.Warc.writeFixture(t, tail)
      val plain = dir.resolve("sample.warc")
      java.nio.file.Files.write(plain,
        java.nio.file.Files.readAllBytes(h) ++
          "this is not a warc record\r\njust noise\r\n".getBytes(iso) ++
          java.nio.file.Files.readAllBytes(t))
      java.nio.file.Files.delete(h); java.nio.file.Files.delete(t)
      graft.sources.Warc.gzipFixture(plain, dir.resolve("sample.warc.gz"))
      warcFixturePath.set(dir.toString)
      dir.toString
    }
  }

  // WEAK session keys (same rationale as annStores): a strong key would
  // pin every short-lived session for the JVM's life. Catalog entries
  // are per-name (session-scoped names below) and die with the catalog.
  private val bucketedPairs = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, (String, String)]]()
  private val bucketedDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  sys.addShutdownHook {
    bucketedDirs.forEach(p =>
      graft.Fs.deleteTree(java.nio.file.Paths.get(p), swallow = true))
  }

  private def bucketedPair(s: SparkSession, dir: String): (String, String) =
    bucketedPairs.synchronized {
      val byDir = bucketedPairs.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty)
      byDir.getOrElseUpdate(dir, {
        // name scoped by session identity too: sibling sessions share
        // ONE catalog, so a dir-only name would let a second session
        // silently repoint the first session's tables
        val id = java.lang.Integer.toHexString(dir.hashCode) + "_" +
          java.lang.Integer.toHexString(System.identityHashCode(s))
        val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
        bucketedDirs.add(tmp)
        graft.sources.Bucketed.writeBucketed(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_extendedprice")),
          s"b_li_$id", s"$tmp/li", "l_orderkey", 16)
        graft.sources.Bucketed.writeBucketed(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
          s"b_ord_$id", s"$tmp/ord", "o_orderkey", 16)
        (s"b_li_$id", s"b_ord_$id")
      })
    }

  /** The shared as-of fixture: clicks (left) and the users' error events
    * (right) on epoch-millis time — used by both asof queries so the
    * projection can't diverge between them.
    */
  private def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev0 = Tables.events(s, dir)
    val e = ev0.select(col("event_id"), col("user_id"),
      Tables.tsMillis(ev0).as("t"), col("event_type"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("t"), col("value"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("t"), col("value").as("err_value"))
    (clicks, errors)
  }

  /** The shared dense-grid input for the gap-filled TS analytics
    * queries: minute buckets over one day of click/error events, every
    * bucket present ([[graft.operators.GapFill.bucketCounts]]).
    */
  private def denseGrid(s: SparkSession, dir: String): DataFrame =
    // unsorted: every consumer either window-partitions by tag (its own
    // shuffle) or is x_gapfill_minutes, which sorts explicitly
    graft.operators.GapFill.bucketCounts(
      Tables.ts(s, dir)
        .filter(col("timestamp") >= T1 && col("timestamp") < T1 + 86400000L)
        .filter(col("tag") === "click" || col("tag") === "error"),
      bucketMs = 60000L, sorted = false)

  /** Shared shaping of an as-of result for the oracle compare (sentinel
    * values instead of engine-specific null encodings).
    */
  private def asofShaped(joined: DataFrame): DataFrame =
    joined.select(col("event_id"), col("user_id"), col("t"),
      coalesce(col("asof_time"), lit(-1L)).as("asof_time"),
      coalesce(col("asof_err_value"), lit(-1.0)).as("asof_err_value"))
      .orderBy(col("event_id"))

  /** Exact monetary sum via scaled integers, accumulated in a 128-bit
    * integer ([[graft.functions.Sum128]]): `round(x*scale)` is the exact
    * integer for fixed 2/4-decimal columns, and the int128 accumulator
    * keeps long-speed primitive aggregation where a LongType sum hits
    * ANSI ARITHMETIC_OVERFLOW past ~9.2e18 (≈9e9 rows of 1e9-magnitude
    * scaled values in one group, reachable in a true 100 TB
    * single-group sum) and a decimal(38,0) accumulator is exact but ~2×
    * slower (per-update BigDecimal allocation). The decimal division of
    * the final sum (scale 6 ≥ the 2/4 digits carried) is exact, so the
    * cast to double rounds ONCE — same semantics as the DuckDB oracle's
    * `CAST(decimal_sum AS DOUBLE)` at any magnitude, where
    * `double(long_sum)/scale` could differ in the last ulp past 2^53.
    *
    * Effective ceiling: the DIVISION's decimal(38,6) result caps the
    * un-divided sum at ~1e32 scaled units per group (the accumulator
    * itself holds 2^127) — ANSI-loud, and ~1e13× past the long ceiling;
    * a group would need more scaled units than 1e18 exabytes of
    * max-value rows to reach it. Callers must
    * `NumericFunctions.register(s)`.
    */
  private[graft] def scaledSum(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    (graft.functions.NumericFunctions.sum128(round(c * scale).cast("long")) / lit(scale))
      .cast("double")

  /** The int128 scaled accumulator itself (undivided decimal(38,0)) —
    * for the avg-of-scaled shape where the oracle divides the decimal
    * sum before other arithmetic.
    */
  private def scaledSumRaw(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.NumericFunctions.sum128(round(c * scale).cast("long"))

  /** Documents with deterministic synthetic PII appended (the fixture
    * text is clean word salad) — shared by both PII queries; the oracle
    * mirrors the same injection.
    */
  private def piiInjected(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact u"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(" call 555-867-5309")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(" from 192.168.1.77")).otherwise(lit("")))
      .as("text"))

  private def ts(qm: QueryModel): (SparkSession, String) => DataFrame =
    (s, dir) => QueryEngine.compile(Tables.ts(s, dir), qm)

  /** Same, with the Double `result` column rounded (sum/avg queries). */
  private def tsR(qm: QueryModel): (SparkSession, String) => DataFrame =
    (s, dir) => QueryEngine.compile(Tables.ts(s, dir), qm)
      .withColumn("result", round(col("result"), 4))

  private val FROM = Tables.tsOracleFrom
  private def range = s""""timestamp" >= $T1 AND "timestamp" < $T2"""

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * F1+F3(Gx): per-tag average over a two-week window, canonical order —
    * the M2 end-to-end slice of SURVEY.md §7.2.
    */
  def entry(spark: SparkSession): DataFrame =
    tsR(QueryModel(ge = Some(T1), lt = Some(T2),
      aggFunc = Some(Agg.Avg), groupBy = Some(GroupBy.Tag)))(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1: agg-only full-scan fast path (G1-G5 scalar over all rows)
    "a1_count_all" -> ts(QueryModel(aggFunc = Some(Agg.Count))),
    "a1_sum_all" -> tsR(QueryModel(aggFunc = Some(Agg.Sum))),
    "a1_avg_all" -> tsR(QueryModel(aggFunc = Some(Agg.Avg))),
    "a1_min_all" -> ts(QueryModel(aggFunc = Some(Agg.Min))),
    "a1_max_all" -> ts(QueryModel(aggFunc = Some(Agg.Max))),
    // ---- A2/F1/O1: timestamp-range collect, asc (default sort)
    "a2_range_collect" -> ts(QueryModel(ge = Some(T1), lt = Some(T2))),
    // ---- F1 exclusive/inclusive bound variants (+ single-bound form)
    "f1_gt_le_collect" -> ts(QueryModel(gt = Some(T1), le = Some(T2))),
    "f1_lt_only_collect" -> ts(QueryModel(lt = Some(1704240000000L))), // first 2 days
    // ---- A4 variant: point lookup with tagEq
    "a4_point_tag_lookup" -> ts(QueryModel(tsEq = Some(POINT_TS),
      tagEq = Some("error"))),
    // ---- A3/F3: tag-index scan (tagEq + range)
    "a3_tag_collect" -> ts(QueryModel(tagEq = Some("click"),
      ge = Some(T1), lt = Some(T2))),
    // ---- A3 through the ENGINE path over a real TimeSeriesStore: the
    // collect shape never routes to a rollup, so the raw fallback reads
    // through the partition-level tag bloom index
    // (TimeSeriesStore.currentForTag — the reference's _sIx made
    // physical); the raw-events oracle proves the pruned read is
    // row-identical to the unpruned scan
    "a3_tag_pruned_collect" -> ((s, dir) => {
      val st = caggStoreFor(s, dir)
      graft.engine.QueryEngine.execute(st,
        QueryModel(tagEq = Some("click"), ge = Some(T1), lt = Some(T2)),
        Seq(caggFor(s, dir))).fold(
        e => throw new IllegalStateException(s"a3_tag_pruned_collect: $e"),
        identity)
    }),
    // ---- A1 through the METADATA path: scalar aggregates with
    // day-aligned (or absent) bounds fold the store's 48-byte per-
    // partition .stats sidecars — zero data files opened (the require
    // pins it); unaligned bounds scan ONLY the two boundary days. The
    // raw-events oracles prove the fold exact.
    "a1_meta_count_all" -> ((s, dir) => {
      val df = graft.engine.QueryEngine.execute(caggStoreFor(s, dir),
        QueryModel(aggFunc = Some(Agg.Count)), Seq.empty).fold(
        e => throw new IllegalStateException(s"a1_meta_count_all: $e"), identity)
      require(df.inputFiles.isEmpty, "metadata count must not carry a file scan")
      df
    }),
    "a1_meta_sum_window" -> ((s, dir) => {
      val df = graft.engine.QueryEngine.execute(caggStoreFor(s, dir),
        QueryModel(ge = Some(T1), lt = Some(T2), aggFunc = Some(Agg.Sum)),
        Seq.empty).fold(
        e => throw new IllegalStateException(s"a1_meta_sum_window: $e"), identity)
      require(df.inputFiles.isEmpty, "metadata sum must not carry a file scan")
      df.withColumn("result", round(col("result"), 4))
    }),
    "a1_meta_avg_boundary" -> ((s, dir) =>
      // unaligned lower bound: T1 + 1h — day T1/86400000 is a boundary
      // day (scanned), everything after folds from sidecars
      graft.engine.QueryEngine.execute(caggStoreFor(s, dir),
        QueryModel(ge = Some(T1 + 3600000L), lt = Some(T2), aggFunc = Some(Agg.Avg)),
        Seq.empty).fold(
        e => throw new IllegalStateException(s"a1_meta_avg_boundary: $e"),
        _.withColumn("result", round(col("result"), 4)))),
    // ---- A4/F2: point lookup on timestamp
    "a4_point_lookup" -> ts(QueryModel(tsEq = Some(POINT_TS))),
    // ---- A4 through the ENGINE path: the tsEq point probe reads
    // through the sidecar ts ranges (TimeSeriesStore.currentForTs —
    // the reference's _tIx point probe at partition granularity). The
    // probed key is the store's own MIN timestamp — POINT_TS exists
    // only in the sf0.01 fixture, and unlike the guard-less compile
    // path the engine correctly raises NoData on a miss — read for
    // free from the .stats sidecars (no scan); the oracle derives the
    // same key with a scalar subquery.
    "a4_point_pruned_lookup" -> ((s, dir) => {
      val st = caggStoreFor(s, dir)
      val pt = st.liveDayStats().flatMap(_._2).map(_.tsMin).min
      graft.engine.QueryEngine.execute(st,
        QueryModel(tsEq = Some(pt)), Seq(caggFor(s, dir))).fold(
        e => throw new IllegalStateException(s"a4_point_pruned_lookup: $e"),
        identity)
    }),
    // ---- F4: empty-group elimination — tags with no rows in a narrow
    // range simply don't appear (no zero-count groups)
    "f4_empty_group_elim" -> ts(QueryModel(ge = Some(T1), lt = Some(T1 + 600000L),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag))),
    // ---- G6: group by tag (sort ignored, canonical group order)
    "g6_group_tag_avg" -> tsR(QueryModel(ge = Some(T1), lt = Some(T2),
      aggFunc = Some(Agg.Avg), groupBy = Some(GroupBy.Tag))),
    "g6_group_tag_count" -> ts(QueryModel(ge = Some(T1), lt = Some(T2),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag))),
    "g6_group_tag_min" -> ts(QueryModel(
      aggFunc = Some(Agg.Min), groupBy = Some(GroupBy.Tag))),
    "g6_group_tag_max" -> ts(QueryModel(ge = Some(T1),
      aggFunc = Some(Agg.Max), groupBy = Some(GroupBy.Tag))),
    // ---- G7: group by tag at one timestamp
    "g7_group_tag_tseq" -> tsR(QueryModel(tsEq = Some(POINT_TS),
      aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag))),
    // ---- G8 + O1 + L2: group by timestamp, desc, limit
    "g8_group_ts_sum_desc" -> tsR(QueryModel(ge = Some(T1), lt = Some(T2),
      aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Timestamp),
      sort = SortDir.Desc, limit = Some(500))),
    // ---- G8 variant: min per timestamp, asc (closes the agg matrix)
    "g8_group_ts_min" -> ts(QueryModel(ge = Some(T1), lt = Some(T2),
      aggFunc = Some(Agg.Min), groupBy = Some(GroupBy.Timestamp),
      limit = Some(500))),
    // ---- G9: group by timestamp within one tag
    "g9_group_ts_tag" -> tsR(QueryModel(tagEq = Some("purchase"),
      ge = Some(T1), lt = Some(T2), aggFunc = Some(Agg.Avg),
      groupBy = Some(GroupBy.Timestamp), limit = Some(500))),
    // ---- G10: group by timestamp at one timestamp
    "g10_group_ts_tseq" -> ts(QueryModel(tsEq = Some(POINT_TS),
      aggFunc = Some(Agg.Max), groupBy = Some(GroupBy.Timestamp))),
    // ---- G11: scalar aggregate over filtered data
    "g11_scalar_filtered_sum" -> tsR(QueryModel(tagEq = Some("view"),
      ge = Some(T1), lt = Some(T2), aggFunc = Some(Agg.Sum))),
    // ---- O1 + L1: top-k most recent (desc collect + limit)
    "o1_l1_topk_recent" -> ts(QueryModel(sort = SortDir.Desc,
      limit = Some(1000))),
    // ---- L2: limit on grouped results (asc)
    "l2_group_limit" -> ts(QueryModel(aggFunc = Some(Agg.Count),
      groupBy = Some(GroupBy.Timestamp), limit = Some(100))),
    // ---- P2: key projection (timestamp, tag)
    "p2_key_projection" -> ((s, dir) =>
      Tables.ts(s, dir).filter(col("timestamp") >= T1 && col("timestamp") < T2)
        .select(col("timestamp"), col("tag"))
        .orderBy(asc("timestamp"), asc("tag"))),
    // ---- S1: insert = all-or-nothing append; the two join legs of it,
    // expressed as queries: conflict detection (left_semi) + apply (union)
    "s1_insert_conflict_check" -> ((s, dir) => {
      val store = Tables.ts(s, dir)
      val batch = store.filter(col("tag") === "signup") // keys that DO exist
      store.join(batch, Seq("timestamp", "tag"), "left_semi")
        .agg(count(lit(1)).cast("double").as("result"))
    }),
    "s1_insert_apply_union" -> ((s, dir) => {
      val store = Tables.ts(s, dir)
      val batch = store.select((col("timestamp") + SHIFT).as("timestamp"),
        col("tag"), col("value")) // shifted => disjoint keys
      store.unionAll(batch).groupBy(col("tag").as("grp"))
        .agg(count(lit(1)).cast("double").as("result")).orderBy(asc("grp"))
    }),
    // ---- S2: update apply = left join + coalesce of new values
    "s2_update_apply" -> ((s, dir) => {
      val store = Tables.ts(s, dir)
      val updates = store.filter(col("tag") === "click")
        .select(col("timestamp"), col("tag"), (col("value") * 2).as("new_value"))
      store.join(updates, Seq("timestamp", "tag"), "left")
        .select(col("timestamp"), col("tag"),
          coalesce(col("new_value"), col("value")).as("value"))
        .groupBy(col("tag").as("grp"))
        .agg(round(sum(col("value")), 4).as("result")).orderBy(asc("grp"))
    }),
    // ---- S3: delete apply = left_anti join against the key batch
    "s3_delete_apply" -> ((s, dir) => {
      val store = Tables.ts(s, dir)
      val deletes = store.filter(col("tag") === "error" &&
        col("timestamp") >= T1 && col("timestamp") < T2)
        .select(col("timestamp"), col("tag"))
      store.join(deletes, Seq("timestamp", "tag"), "left_anti")
        .groupBy(col("tag").as("grp"))
        .agg(count(lit(1)).cast("double").as("result")).orderBy(asc("grp"))
    }),
    // ---- semi-structured columns: JSON property extraction inside the
    // scan stage (events.props is a JSON object)
    "x_json_extract_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type").as("grp"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("grp"))
        .agg(sum(col("k")).cast("double").as("sum_k"),
          count(col("k")).cast("double").as("n_k"))
        .orderBy(col("grp"))),
    // ---- distinct aggregation (absent in the reference; standard here)
    // exact distinct is the oracle; approx_count_distinct (HLL) is the
    // scale path, checked rows-only since sketch impls differ by engine
    "d1_distinct_exact" -> ((s, dir) =>
      Tables.ts(s, dir).agg(
        countDistinct(col("tag")).cast("double").as("n_tags"),
        countDistinct(col("value")).cast("double").as("n_values"))),
    "d2_distinct_approx" -> ((s, dir) =>
      Tables.ts(s, dir).agg(
        approx_count_distinct(col("value")).cast("double").as("approx_values"))),
    // ---- percentiles: exact interpolated (both engines define the
    // same linear interpolation)
    "d3_percentiles" -> ((s, dir) =>
      Tables.ts(s, dir).agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))),
    // ---- TS2: same engine over the 6×-larger lineitem TS view
    // (shipdate × returnflag × extendedprice; multi-row timestamp groups)
    // decimal sum: order-independent exactness at 1e9 magnitudes where
    // round(double-sum) could still straddle a boundary
    "ts2_li_group_tag_sum" -> ((s, dir) => {
      graft.functions.NumericFunctions.register(s)
      Tables.tsLineitem(s, dir)
        .groupBy(col("tag").as("grp"))
        .agg(scaledSum(col("value"), 100).as("result"))
        .orderBy(asc("grp"))
    }),
    // (timestamp, tag) is not unique on this view, so the top-k cut
    // must order on ALL columns before limiting — boundary rows that
    // tie on the full triple are value-identical, so the cut is stable
    "ts2_li_range_topk" -> ((s, dir) =>
      Tables.tsLineitem(s, dir)
        .filter(col("timestamp") >= 820454400000L && col("timestamp") < 883612800000L)
        .orderBy(desc("timestamp"), asc("tag"), asc("value"))
        .limit(1000)),
    "ts2_li_group_ts_count" -> ((s, dir) =>
      QueryEngine.compile(Tables.tsLineitem(s, dir),
        QueryModel(ge = Some(820454400000L), lt = Some(883612800000L),
          aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Timestamp),
          limit = Some(500)))),
    // ---- TS3: continuous-aggregate rewrite (beyond-reference): the
    // SAME QueryModel shapes as G6/A1, answered from the persisted
    // day×tag rollup instead of the raw store. The oracles aggregate
    // raw events — hash match proves rewrite == direct aggregation.
    "ts3_cagg_group_tag_count" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(ge = Some(T1), lt = Some(T2),
        aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))),
    "ts3_cagg_group_tag_min" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(aggFunc = Some(Agg.Min), groupBy = Some(GroupBy.Tag)))),
    // gt/le-form bounds (`gt = T1−1 ≡ ge T1`, `le = T2−1 ≡ lt T2` at ms
    // granularity): canonicalTsBounds normalizes BEFORE the rollup
    // alignment gate, so this routes identically to the ge/lt twin —
    // caggAnswer's require() is the tripwire proving it (round-9
    // residual #1: these shapes used to silently pay the raw scan)
    "ts3_cagg_gt_bound_routed" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(gt = Some(T1 - 1), le = Some(T2 - 1),
        aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))),
    "ts3_cagg_scalar_sum" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(ge = Some(T1), lt = Some(T2), aggFunc = Some(Agg.Sum)))
      .withColumn("result", round(col("result"), 4))),
    // hourly-grain rollup over the SAME store: hour-aligned sub-day
    // windows (T1+6h .. T1+30h) that the daily rollup cannot answer
    "ts3_cagg_hourly_group_tag_count" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(ge = Some(T1 + 21600000L), lt = Some(T1 + 108000000L),
        aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)),
      bucketMs = 3600000L)),
    "ts3_cagg_hourly_scalar_sum" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(ge = Some(T1 + 21600000L), lt = Some(T1 + 108000000L),
        aggFunc = Some(Agg.Sum)), bucketMs = 3600000L)
      .withColumn("result", round(col("result"), 4))),
    // window refold: a 6-hour tumbling window answered from the hourly
    // rollup (w1's shape at a grain the daily rollup cannot reach)
    "ts3_cagg_window_6h" -> ((s, dir) =>
      caggFor(s, dir, bucketMs = 3600000L).answerWindow(21600000L)
        .getOrElse(throw new IllegalStateException(
          "6h window no longer refoldable from the hourly rollup"))
        .select(col("window_start"), col("tag"),
          col("cnt").cast("double").as("cnt"),
          round(col("sum_val"), 4).as("sum_val"))),
    // sliding refold: w2's exact shape (1d window, 12h slide) answered
    // from the hourly rollup — each bucket contributes to width/slide=2
    // windows, O(buckets) scanned instead of O(events)
    "ts3_cagg_window_sliding" -> ((s, dir) =>
      caggFor(s, dir, bucketMs = 3600000L).answerWindow(86400000L, 43200000L)
        .getOrElse(throw new IllegalStateException(
          "1d/12h sliding window no longer refoldable from the hourly rollup"))
        .select(col("window_start"), col("tag"),
          col("cnt").cast("double").as("cnt"),
          round(col("sum_val"), 4).as("sum_val"))),
    // coarser-than-day grain: a WEEKLY rollup (bucket = 7 days, the
    // refresh unit becomes the bucket) answering week-aligned windows —
    // the year-scale-dashboard resolution step
    "ts3_cagg_weekly_scalar_sum" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(ge = Some(1704931200000L), lt = Some(1706140800000L),
        aggFunc = Some(Agg.Sum)), bucketMs = 604800000L)
      .withColumn("result", round(col("result"), 4))),
    "ts3_cagg_weekly_group_tag_count" -> ((s, dir) => caggAnswer(s, dir,
      QueryModel(aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)),
      bucketMs = 604800000L)),
    // STATS MODE: per-tag linear regression (slope/intercept/Pearson r)
    // over the whole range from the rollup's ADDITIVE moments — the
    // TimescaleDB stats_agg two-step; all moment arithmetic is exact
    // decimal, the oracle mirrors the final float ops bit-for-bit
    // slope/intercept/r are ratios of >2^53 exact integers, so the
    // final integer→double casts can land one ulp apart across engines
    // at some SFs (observed at sf0.001) — both sides round to 10
    // decimals, far above the 1e-16 ulp noise, far below the signal
    "ts3_cagg_regression_by_tag" -> ((s, dir) =>
      caggStatsFor(s, dir).answerRegression()
        .getOrElse(throw new IllegalStateException("stats rollup ineligible"))
        .select(col("grp"), round(col("slope_per_day"), 10).as("slope_per_day"),
          round(col("intercept"), 10).as("intercept"),
          round(col("r"), 10).as("r"), col("n_points"))),
    // HIERARCHICAL: this weekly rollup was refreshed by REFOLDING the
    // daily rollup's buckets (fixture asserts fromChild — a silent raw
    // fallback fails the build); the raw-events oracles prove the
    // twice-refolded content answers exactly
    "ts3_cagg_hier_group_tag_count" -> ((s, dir) =>
      caggHierFor(s, dir)
        .answer(QueryModel(aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))
        .getOrElse(throw new IllegalStateException("hier rollup ineligible"))),
    "ts3_cagg_hier_weekly_min" -> ((s, dir) =>
      caggHierFor(s, dir)
        .answer(QueryModel(ge = Some(1704931200000L), lt = Some(1706140800000L),
          aggFunc = Some(Agg.Min), groupBy = Some(GroupBy.Tag)))
        .getOrElse(throw new IllegalStateException("hier rollup ineligible"))),
    // DOWNSAMPLING RETENTION: the fixture store DROPPED its raw events
    // below T1+3d, but the frozen rollup still answers the full range
    // — the oracle counts over the COMPLETE events fixture, so a hash
    // match proves the downsampled history is bit-exact, not
    // approximately retained
    "ts3_cagg_frozen_history_count" -> ((s, dir) =>
      caggFrozenFor(s, dir)
        .answer(QueryModel(aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))
        .getOrElse(throw new IllegalStateException(
          "frozen rollup declined an eligible query"))),
    "ts3_cagg_frozen_history_sum" -> ((s, dir) =>
      caggFrozenFor(s, dir)
        .answer(QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)))
        .getOrElse(throw new IllegalStateException(
          "frozen rollup declined an eligible query"))
        .withColumn("result", round(col("result"), 4))),
    // COUNTER ROLLUP (TimescaleDB counter_agg): PromQL reset-aware
    // total increase refolded from per-bucket stored increases +
    // first/last boundary pairs — O(buckets), exact for the
    // integer-valued counter; the oracle re-derives the counter and
    // walks every consecutive pair over raw events
    "ts3_cagg_counter_increase" -> ((s, dir) =>
      caggCounterFor(s, dir).answerCounterIncrease()
        .getOrElse(throw new IllegalStateException(
          "counter rollup declined an eligible query"))
        .withColumn("total_increase", col("total_increase") / 100.0)),
    // TIME-WEIGHTED AVERAGE from the rollup (TimescaleDB
    // time_weight('LOCF') as a cagg): per-bucket exact scaled-integer
    // areas + boundary areas from stored witnesses — O(buckets),
    // bit-matching the raw x_time_weighted_avg arithmetic
    "ts3_cagg_time_weighted" -> ((s, dir) =>
      caggTwFor(s, dir).answerTimeWeighted()
        .getOrElse(throw new IllegalStateException(
          "counterMode rollup declined an eligible time-weight query"))),
    // OHLC bars refolded ENTIRELY from the hourly rollup: each bucket
    // stores (first_ts, first_val, last_ts, last_val), so a daily
    // bar's open is min_by(first_val, first_ts) over its 24 buckets —
    // the TimescaleDB first()/last() cagg story, O(buckets) and EXACT
    // (individual stored values, no float refolds); the oracle
    // computes arg_min/arg_max over raw events
    "ts3_cagg_ohlc_1d" -> ((s, dir) =>
      caggFor(s, dir, 3600000L).answerOhlc(86400000L)
        .getOrElse(throw new IllegalStateException(
          "rollup declined an eligible OHLC query"))),
    // GAP-FILL from the rollup (TimescaleDB time_bucket_gapfill +
    // locf()/interpolate()): dense hourly grid over a 7-day window,
    // count per (tag, hour) refolded from rollup buckets — O(buckets),
    // never O(events) — with last-observation-carried-forward / linear
    // interpolation over the empty hours (the sf0.01 fixture has ~50
    // empty tag-hours in this window, so both fills genuinely fire;
    // DuckDB oracles rebuild the same grid from raw events)
    "ts3_cagg_gapfill_locf" -> ((s, dir) =>
      caggFor(s, dir, 3600000L)
        .answerGapFill(T1, T1 + 7 * 86400000L, Agg.Count,
          graft.engine.ContinuousAggregate.Fill.Locf)
        .getOrElse(throw new IllegalStateException(
          "rollup declined an eligible gapfill query"))),
    "ts3_cagg_gapfill_interp" -> ((s, dir) =>
      caggFor(s, dir, 3600000L)
        .answerGapFill(T1, T1 + 7 * 86400000L, Agg.Count,
          graft.engine.ContinuousAggregate.Fill.Interp)
        .getOrElse(throw new IllegalStateException(
          "rollup declined an eligible gapfill query"))),
    // SKETCH-BEARING rollup: percentile / count-distinct answered by
    // MERGING the per-bucket GK + HLL sketches — aggregates with no
    // additive refold, O(buckets) instead of the O(events) they
    // otherwise always cost. Approximate by design => no SQL oracle;
    // SketchRollupSpec gates both against exact answers within the
    // sketches' published error bounds (COVERAGE.md)
    "ts3_cagg_p95_by_tag" -> ((s, dir) =>
      caggSketchFor(s, dir).answerPercentile(0.95, byTag = true)
        .getOrElse(throw new IllegalStateException(
          "sketch rollup declined an eligible percentile query"))),
    "ts3_cagg_distinct_values" -> ((s, dir) =>
      caggSketchFor(s, dir)
        .answerDistinct(ge = Some(T1), lt = Some(T1 + 7 * 86400000L))
        .getOrElse(throw new IllegalStateException(
          "sketch rollup declined an eligible distinct query"))),
    // heavy hitters: top-10 most frequent values per tag by MERGING
    // per-bucket Misra-Gries summaries — cross-bucket duplicate values
    // sum (per-bucket top-k concatenation would get this wrong);
    // estimates exact while a window's distinct values fit in the MG
    // capacity, SketchRollupSpec-gated above it
    "ts3_cagg_top_values" -> ((s, dir) =>
      caggSketchFor(s, dir)
        .answerTopValues(10, ge = Some(T1), lt = Some(T1 + 7 * 86400000L),
          byTag = true)
        .getOrElse(throw new IllegalStateException(
          "sketch rollup declined an eligible top-values query"))),
    // REAL-TIME hybrid: a deliberately-stale rollup (post-T2 tail never
    // refreshed in) answers via carried buckets + raw-tail
    // re-aggregation; the oracle aggregates ALL raw events
    "ts3_cagg_realtime_scalar_sum" -> ((s, dir) => caggRtAnswer(s, dir,
      QueryModel(ge = Some(T1), lt = Some(1706054400000L),
        aggFunc = Some(Agg.Sum)))
      .withColumn("result", round(col("result"), 4))),
    "ts3_cagg_realtime_group_tag_count" -> ((s, dir) => caggRtAnswer(s, dir,
      QueryModel(aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))),
    // ---- S7 time travel as an ORACLED query: the realtime fixture's
    // two commits are (events < T2, all events); versionAsOf(first)
    // must reproduce the pre-tail state EXACTLY — the oracle aggregates
    // raw events under `timestamp < T2`, so a hash match proves the
    // versioned manifest replays the past, not an approximation of it.
    // (The HTTP twin — `?asof=V` — replays a full mutation walk in
    // ApiConcurrencySpec; this pins the engine surface cross-engine.)
    "s7_asof_pre_tail" -> ((s, dir) => {
      val (st, _) = caggRtFor(s, dir)
      val vs = st.versions
      require(vs.size == 2,
        s"asof fixture expects exactly the 2 scripted commits, got $vs")
      st.versionAsOf(vs.head)
        .groupBy(col("tag").as("grp"))
        .agg(count(lit(1)).cast("double").as("n"),
          round(sum(col("value")), 4).as("sum_v"))
        .orderBy(asc("grp"))
    }),
    // SQL-LEVEL routing: PLAIN Spark SQL over a temp view of the
    // store, rewritten by the Catalyst rule (RollupSqlRewrite) to
    // refold rollup segments — no QueryModel anywhere. The multi-agg
    // scalar exercises one Aggregate carrying count+sum+avg+min+max;
    // the realtime variant proves the hybrid through the SQL path too
    "ts3_cagg_sql_group_tag_sum" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        s"SELECT tag AS grp, round(sum(value), 4) AS result FROM $v " +
        s"WHERE timestamp >= $T1 AND timestamp < ${T1 + 3 * 86400000L} " +
        "GROUP BY tag ORDER BY grp")),
    "ts3_cagg_sql_scalar_stats" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT CAST(count(*) AS DOUBLE) AS cnt_r, round(sum(value), 4) AS sum_r, " +
        "round(avg(value), 4) AS avg_r, min(value) AS min_r, max(value) AS max_r " +
        s"FROM $v WHERE tag <> 'error'")),
    "ts3_cagg_sql_realtime_group_tag_sum" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = true, v =>
        s"SELECT tag AS grp, round(sum(value), 4) AS result FROM $v " +
        "GROUP BY tag ORDER BY grp")),
    // tumbling-window grouping in PLAIN SQL (w1's shape) — the rule
    // recognizes `(timestamp DIV w) * w` keys and refolds buckets
    "ts3_cagg_sql_window_1d" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT (timestamp DIV 86400000) * 86400000 AS window_start, tag, " +
        "CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val " +
        s"FROM $v GROUP BY 1, 2 ORDER BY window_start, tag")),
    // the TimescaleDB-spelled tumbling key: time_bucket(w, ts) is a
    // registered parse-time expansion to `(ts DIV w) * w`, so SQL
    // written the Timescale way routes with no idiom knowledge — same
    // oracle family as ts3_cagg_sql_window_1d, tripwire-proved routed
    "ts3_cagg_sql_time_bucket" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT time_bucket(86400000, timestamp) AS window_start, tag, " +
        "CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val " +
        s"FROM $v GROUP BY 1, 2 ORDER BY window_start, tag")),
    // WHERE on the window key itself — how TimescaleDB users actually
    // bound a bucketed query. classify converts `time_bucket(w, ts)`
    // comparisons to exact ts bounds (tumble ≥ X ⟺ ts ≥ ⌈X/w⌉·w), so
    // the shape routes; the hi bound is deliberately UNALIGNED to
    // exercise the ceil
    "ts3_cagg_sql_time_bucket_where" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT time_bucket(86400000, timestamp) AS window_start, tag, " +
        "CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val " +
        s"FROM $v WHERE time_bucket(86400000, timestamp) >= $T1 " +
        s"AND time_bucket(86400000, timestamp) < ${T2 - 1} " +
        "GROUP BY 1, 2 ORDER BY window_start, tag")),
    // SLIDING windows in PLAIN SQL: hop_starts(ts, slide, width)
    // explodes each row into its width/slide window starts; the
    // rewrite recognizes the Generate and refolds rollup buckets
    // through the SAME explode (O(buckets × width/slide) rows, never
    // raw events) — sliding windows reach SQL, not just answerWindow
    "ts3_cagg_sql_hop" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT w AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, " +
        "round(sum(value), 4) AS sum_val FROM " +
        s"$v LATERAL VIEW explode(hop_starts(timestamp, 86400000, 172800000)) h AS w " +
        "GROUP BY w, tag ORDER BY window_start, tag")),
    // the same sliding shape against the DELIBERATELY-STALE rollup:
    // the hop explode rebuilds over currentBase, so carried buckets +
    // the re-aggregated raw hot tail refold into windows — sliding
    // windows stay exact at any staleness through plain SQL
    "ts3_cagg_sql_hop_realtime" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = true, v =>
        "SELECT w AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, " +
        "round(sum(value), 4) AS sum_val FROM " +
        s"$v LATERAL VIEW explode(hop_starts(timestamp, 86400000, 172800000)) h AS w " +
        "GROUP BY w, tag ORDER BY window_start, tag")),
    // COUNTER FAMILY in PLAIN SQL (the TimescaleDB counter_agg /
    // time_weight('LOCF') vocabulary as registered SQL functions —
    // CounterFunctions): the expansions are exact raw ordered folds on
    // their own, and the rewrite swaps them for O(buckets) refolds
    // over the counter-mode rollup (stored incr/n_resets/twsum +
    // boundary pairs from the first/last witnesses). Tripwire-proved
    // routed; the oracles are the SAME raw-events pair walks that pin
    // answerCounterIncrease / answerTimeWeighted.
    "ts3_cagg_sql_counter_increase" -> ((s, dir) => ctrSqlAnswer(s, dir, v =>
      "SELECT tag AS grp, " +
      "counter_increase(timestamp, value) / 100.0 AS total_increase, " +
      "counter_resets(timestamp, value) AS n_resets, " +
      "CAST(count(*) AS BIGINT) AS n_points " +
      s"FROM $v GROUP BY tag ORDER BY grp")),
    // counter_rate (increase / span-in-seconds — PromQL's other
    // household name) and counter_delta (last − first, NOT reset-aware
    // — TimescaleDB's `delta`): both are round-12-verdict additions,
    // pure COMPOSITIONS over already-recognized pieces (the increase
    // fold + min/max-timestamp refolds; the first/last witnesses), so
    // they route through ctrSqlAnswer's tripwire like the rest of the
    // family. The /100.0 unscales the synthetic counter; round(…, 6)
    // pins the identical IEEE division order on both sides.
    "ts3_cagg_sql_rate" -> ((s, dir) => ctrSqlAnswer(s, dir, v =>
      "SELECT tag AS grp, " +
      "round(counter_rate(timestamp, value) / 100.0, 6) AS rate_per_s, " +
      "counter_delta(timestamp, value) / 100.0 AS delta " +
      s"FROM $v GROUP BY tag ORDER BY grp")),
    // GAP-FILL in PLAIN SQL (TimescaleDB's time_bucket_gapfill +
    // locf()/interpolate() spelling — GapFillFunctions markers +
    // the gapfillRewrite densify-and-fill plan): same 7-day hourly
    // grid as ts3_cagg_gapfill_locf, same raw-events DuckDB oracle —
    // a hash match proves the third surface (engine, HTTP, now SQL)
    // bit-identical. Tripwire-proved routed to the hourly rollup.
    "ts3_cagg_sql_gapfill_locf" -> ((s, dir) => gapfillSqlAnswer(s, dir, v =>
      "SELECT tag AS grp, time_bucket_gapfill(3600000, timestamp) AS bucket_start, " +
      "locf(CAST(count(*) AS DOUBLE)) AS result " +
      s"FROM $v WHERE timestamp >= $T1 AND timestamp < ${T1 + 7 * 86400000L} " +
      "GROUP BY tag, time_bucket_gapfill(3600000, timestamp) " +
      "ORDER BY grp, bucket_start")),
    "ts3_cagg_sql_gapfill_interp" -> ((s, dir) => gapfillSqlAnswer(s, dir, v =>
      "SELECT tag AS grp, time_bucket_gapfill(3600000, timestamp) AS bucket_start, " +
      "interpolate(CAST(count(*) AS DOUBLE)) AS result " +
      s"FROM $v WHERE timestamp >= $T1 AND timestamp < ${T1 + 7 * 86400000L} " +
      "GROUP BY tag, time_bucket_gapfill(3600000, timestamp) " +
      "ORDER BY grp, bucket_start")),
    "ts3_cagg_sql_twa" -> ((s, dir) => twSqlAnswer(s, dir, v =>
      "SELECT tag AS grp, " +
      "time_weight_locf(timestamp, value) AS twa, " +
      "CAST(count(*) AS BIGINT) AS n_points, " +
      "max(timestamp) - min(timestamp) AS span_ms " +
      s"FROM $v GROUP BY tag " +
      "HAVING max(timestamp) - min(timestamp) > 0 ORDER BY grp")),
    // S5+ over LIVE HTTP: boot a Server on the fixture store, POST the
    // ?window=2d&slide=1d series route with ge/lt body bounds, parse
    // the wire JSON back into rows. The daily rollup serves the shape
    // (answerWindow — O(buckets) refold, tripwired below); the oracle
    // re-derives the same sliding windows from raw events, so a hash
    // match proves the whole path — HTTP routing, rollup refold, wire
    // encoding, window_start bound post-filter — exact end to end.
    "s5_http_window_series" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val st = caggStoreFor(s, dir)
      val rollup = caggFor(s, dir)
      require(rollup.answerWindow(2 * 86400000L, 86400000L).isDefined,
        "s5_http_window_series: daily rollup no longer serves the window shape")
      val srv = new graft.api.Server(s, st, 0, Seq(rollup)).start()
      try {
        val uri = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}" +
          s"/timeseries/query?window=${2 * 86400000L}&slide=86400000")
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(uri).POST(
            java.net.http.HttpRequest.BodyPublishers.ofString(
              s"""{"ge":$T1,"lt":$T2}""")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"series route: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        require(node.get("width").asLong == 2 * 86400000L,
          "series route echoed a drifted width")
        val rows = node.get("series").elements().asScala.map { o =>
          (o.get("window_start").asLong, o.get("tag").asText,
            o.get("cnt").asLong.toDouble, o.get("sum_val").asDouble)
        }.toSeq
        import s.implicits._
        rows.toDF("window_start", "tag", "cnt", "sum_val")
          .withColumn("sum_val", round(col("sum_val"), 4))
          .orderBy(col("window_start"), col("tag"))
      } finally srv.stop()
    }),
    // the HTTP OHLC route end-to-end: ?ohlc=2d over a server registered
    // with the DAILY rollup — day-aligned bounds so the refold path
    // serves (open/close from the buckets' (first_ts, first_val,
    // last_ts, last_val) columns); the raw-events DuckDB oracle checks
    // routing, refold, and wire encoding in one hash
    "s5_http_ohlc" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val st = caggStoreFor(s, dir)
      val rollup = caggFor(s, dir)
      require(rollup.answerOhlc(2 * 86400000L, Some(T1), Some(T2)).isDefined,
        "s5_http_ohlc: daily rollup no longer serves the OHLC shape")
      val srv = new graft.api.Server(s, st, 0, Seq(rollup)).start()
      try {
        val uri = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}" +
          s"/timeseries/query?ohlc=${2 * 86400000L}")
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(uri).POST(
            java.net.http.HttpRequest.BodyPublishers.ofString(
              s"""{"ge":$T1,"lt":$T2}""")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"ohlc route: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        require(node.get("width").asLong == 2 * 86400000L,
          "ohlc route echoed a drifted width")
        val rows = node.get("series").elements().asScala.map { o =>
          (o.get("window_start").asLong, o.get("tag").asText,
            o.get("open").asDouble, o.get("high").asDouble,
            o.get("low").asDouble, o.get("close").asDouble)
        }.toSeq
        import s.implicits._
        rows.toDF("window_start", "tag", "open", "high", "low", "close")
          .orderBy(col("window_start"), col("tag"))
      } finally srv.stop()
    }),
    // the HTTP gapfill route end-to-end: ?gapfill=locf&agg=count over
    // a server registered with the HOURLY rollup densifies the same
    // 7-day hour grid as ts3_cagg_gapfill_locf — the raw-events DuckDB
    // oracle (window-function LOCF re-derivation) checks the whole
    // path: routing, rollup grid refold, fill, wire encoding
    "s5_http_gapfill_locf" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val st = caggStoreFor(s, dir)
      val hourly = caggFor(s, dir, 3600000L)
      val srv = new graft.api.Server(s, st, 0, Seq(hourly)).start()
      try {
        val uri = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}" +
          "/timeseries/query?gapfill=locf&agg=count")
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(uri).POST(
            java.net.http.HttpRequest.BodyPublishers.ofString(
              s"""{"ge":$T1,"lt":${T1 + 7 * 86400000L}}""")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"gapfill route: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        require(node.get("grain").asLong == 3600000L,
          "gapfill route served a drifted grain")
        val rows = node.get("series").elements().asScala.map { o =>
          (o.get("tag").asText, o.get("bucket_start").asLong,
            if (o.get("value").isNull) null
            else java.lang.Double.valueOf(o.get("value").asDouble))
        }.toSeq
        import s.implicits._
        rows.toDF("grp", "bucket_start", "result")
          .orderBy(col("grp"), col("bucket_start"))
      } finally srv.stop()
    }),
    // the COUNTER routes end-to-end over LIVE HTTP: ?increase=true on
    // a server registered with the counter-mode rollup (engine refold
    // tripwired — the route's raw twin would be hash-green too), wire
    // JSON parsed back, checked by the same raw-events pair-walk
    // oracle as the SQL/engine paths — routing + refold + encoding in
    // one hash
    "s5_http_increase" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val rollup = caggCounterFor(s, dir)
      val st = new graft.engine.TimeSeriesStore(s, caggCounterPaths(dir)._1)
      require(rollup.answerCounterIncrease().isDefined,
        "s5_http_increase: counter rollup no longer serves the increase shape")
      val srv = new graft.api.Server(s, st, 0, Seq(rollup)).start()
      try {
        val uri = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}" +
          "/timeseries/query?increase=true")
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(uri).POST(
            java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"increase route: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        val rows = node.elements().asScala.map { o =>
          (o.get("grp").asText, o.get("total_increase").asDouble / 100.0,
            o.get("n_resets").asLong, o.get("n_points").asLong)
        }.toSeq
        import s.implicits._
        rows.toDF("grp", "total_increase", "n_resets", "n_points")
          .orderBy(col("grp"))
      } finally srv.stop()
    }),
    // ...and ?twa=true (LOCF time-weighted average) on the shared
    // store with the counter-mode rollup — same oracle family as
    // ts3_cagg_sql_twa
    "s5_http_twa" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val st = caggStoreFor(s, dir)
      val rollup = caggTwFor(s, dir)
      require(rollup.answerTimeWeighted().isDefined,
        "s5_http_twa: counter rollup no longer serves the time-weight shape")
      val srv = new graft.api.Server(s, st, 0, Seq(rollup)).start()
      try {
        val uri = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}" +
          "/timeseries/query?twa=true")
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(uri).POST(
            java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"twa route: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        val rows = node.elements().asScala.map { o =>
          (o.get("grp").asText, o.get("twa").asDouble,
            o.get("n_points").asLong, o.get("span_ms").asLong)
        }.toSeq
        import s.implicits._
        rows.toDF("grp", "twa", "n_points", "span_ms")
          .withColumn("twa", round(col("twa"), 4))
          .orderBy(col("grp"))
      } finally srv.stop()
    }),
    // ...and ?rate=true (reset-aware increase over the slice's own
    // span in seconds + the reset-blind delta) on the counter fixture
    // — the wire twin of ts3_cagg_sql_rate, rollup-routed
    // (answerCounterRate — O(buckets) refold, tripwired below); the
    // /100.0 unscales the synthetic counter AFTER the wire's own
    // division so the parse mirrors the oracle's operand order.
    "s5_http_rate" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val rollup = caggCounterFor(s, dir)
      val st = new graft.engine.TimeSeriesStore(s, caggCounterPaths(dir)._1)
      require(rollup.answerCounterRate().isDefined,
        "s5_http_rate: counter rollup no longer serves the rate shape")
      val srv = new graft.api.Server(s, st, 0, Seq(rollup)).start()
      try {
        val uri = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}" +
          "/timeseries/query?rate=true")
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(uri).POST(
            java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"rate route: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        val rows = node.elements().asScala.map { o =>
          (o.get("grp").asText, o.get("rate_per_s").asDouble,
            o.get("delta").asDouble / 100.0,
            o.get("span_ms").asLong, o.get("n_points").asLong)
        }.toSeq
        import s.implicits._
        rows.toDF("grp", "rate_per_s", "delta", "span_ms", "n_points")
          .withColumn("rate_per_s", round(col("rate_per_s") / 100.0, 6))
          .orderBy(col("grp"))
      } finally srv.stop()
    }),
    // g_day (the store's partition column) as a grouping key, plus a
    // HAVING clause — exprId preservation keeps the post-aggregate
    // Filter resolving against the rewritten node
    "ts3_cagg_sql_by_day_having" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT g_day, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val " +
        s"FROM $v GROUP BY g_day HAVING count(*) > 10 ORDER BY g_day")),
    // APPROX aggregates in PLAIN SQL, routed to the SKETCH-BEARING
    // rollup: percentile_approx merges per-bucket GK summaries,
    // approx_count_distinct unions per-bucket HLL sketches — O(buckets)
    // for the two textbook non-additive aggregates, straight from SQL.
    // Approximate by design => rows-only (RollupSqlRewriteSpec gates
    // both against exact answers within the sketches' bounds); the
    // caggSqlAnswer tripwire proves they actually route
    // resolution-aware auto-downsampling over the rollup pyramid
    // (ContinuousAggregate.answerAtResolution): 14 days at a 5-point
    // budget picks a 68h width from the HOURLY child (68h is no day
    // multiple, so the daily rollup can't serve it) with a partial
    // trailing window; the raw-events oracle re-derives the same
    // 68h-anchored windows, proving selection + refold exact
    "ts3_resolution_series" -> ((s, dir) => {
      val (w, df) = graft.engine.ContinuousAggregate.answerAtResolution(
        Seq(caggFor(s, dir, 3600000L), caggFor(s, dir)), T1, T2, maxPoints = 5)
        .getOrElse(throw new IllegalStateException(
          "ts3_resolution_series: resolution routing regressed"))
      require(w == 68L * 3600000L, s"ts3_resolution_series: width drifted to $w")
      df.select(col("window_start"), col("tag"),
        col("cnt").cast("double").as("cnt"),
        round(col("sum_val"), 4).as("sum_val"))
    }),
    // the FULL Gopher first-pass filter end to end: both signal
    // families stacked (two scan-stage mappers), both paper-threshold
    // keep-rules, then a per-source survivors report — the whole
    // pipeline re-derived in the DuckDB oracle, thresholds included
    "x_pipeline_gopher" -> ((s, dir) =>
      // doc_id < 1000 bounds the bench slice (covers the whole sf0.01
      // oracle corpus; the per-doc signal costs are benched by the
      // x_text_* queries — the pipeline query proves composition)
      graft.operators.GopherQuality.qualitySignals(
        graft.operators.Repetition.repetitionSignals(
          Tables.documents(s, dir).filter(col("doc_id") < 1000)))
        // thresholds are corpus knobs: the synthetic fixture's vocab
        // contains few of the 8 English stop words, so the paper's
        // stops>=2 keeps NOTHING here — one required stop word makes
        // the filter discriminating (~half the corpus survives) while
        // every other threshold stays at the paper default.
        // filterOnSignals: keep predicate pushdown from re-inlining
        // every signal fold below the projection (4× the pipeline)
        .transform(df => graft.operators.GopherQuality.filterOnSignals(df,
          graft.operators.Repetition.gopherRepetitionKeep() &&
            graft.operators.GopherQuality.gopherQualityKeep(minStopWordHits = 1L)))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("double").as("n_docs"),
          sum(col("n_words")).as("n_words_kept"))
        .orderBy(col("source"))),
    // non-repetition Gopher quality rules (Rae et al. A1.1): seven
    // shape/symbol/lexicon signals as ONE scan-stage projection, fully
    // SQL-oracled (the repetition half is x_text_repetition_gopher)
    "x_text_gopher_quality" -> ((s, dir) =>
      graft.operators.GopherQuality.qualitySignals(
        Tables.documents(s, dir).filter(col("doc_id") < 200))
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("symbol_word_ratio"), col("bullet_line_frac"),
          col("ellipsis_line_frac"), col("alpha_word_frac"),
          col("stop_word_hits"))
        .orderBy(col("doc_id"))),
    // metadata-stats SQL routing: global day-aligned aggregates over
    // the store view become literal plans (ZERO scan — the tripwire in
    // metaSqlAnswer requires a parquet-free executed plan)
    "ts3_meta_sql_scalar_stats" -> ((s, dir) => metaSqlAnswer(s, dir, v =>
      "SELECT CAST(count(*) AS DOUBLE) AS cnt_r, round(sum(value), 4) AS sum_r, " +
      "round(avg(value), 4) AS avg_r, min(value) AS min_r, max(value) AS max_r " +
      s"FROM $v")),
    "ts3_meta_sql_window_sum" -> ((s, dir) => metaSqlAnswer(s, dir, v =>
      s"SELECT round(sum(value), 4) AS result FROM $v " +
      s"WHERE timestamp >= $T1 AND timestamp < $T2")),
    "ts3_cagg_sql_percentile" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT tag AS grp, percentile_approx(value, 0.95) AS result " +
        s"FROM $v WHERE timestamp >= $T1 AND timestamp < ${T1 + 7 * 86400000L} " +
        "GROUP BY tag ORDER BY grp", sketch = true)),
    "ts3_cagg_sql_approx_distinct" -> ((s, dir) => caggSqlAnswer(s, dir,
      stale = false, v =>
        "SELECT CAST(approx_count_distinct(value) AS DOUBLE) AS result " +
        s"FROM $v WHERE tag <> 'error'", sketch = true)),
    // ---- W1: tumbling time window (batch form of the streaming agg —
    // the natural generalization of G8 "group by timestamp")
    "w1_tumbling_window_1d" -> ((s, dir) =>
      Tables.ts(s, dir)
        .groupBy((expr("timestamp div 86400000") * 86400000L).as("window_start"),
          col("tag"))
        .agg(count(lit(1)).cast("double").as("cnt"),
          round(sum(col("value")), 4).as("sum_val"))
        .orderBy(col("window_start"), col("tag"))),

    // ---- W2: sliding window (1d window, 12h slide), batch form: each
    // row contributes to size/slide = 2 windows via explode
    "w2_sliding_window" -> ((s, dir) =>
      Tables.ts(s, dir)
        .select(col("tag"), col("value"), explode(array(
          (expr("timestamp div 43200000") * 43200000L),
          (expr("timestamp div 43200000") * 43200000L - 43200000L)))
          .as("window_start"))
        .groupBy(col("window_start"), col("tag"))
        .agg(count(lit(1)).cast("double").as("cnt"),
          round(sum(col("value")), 4).as("sum_val"))
        .orderBy(col("window_start"), col("tag"))),

    // ==== training-data pipeline extensions (builder brief) ====
    // ---- text analysis: token counts, punctuation, quality score
    "x_text_stats" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
        TextFunctions.punctCount(col("text")).as("punct"),
        TextFunctions.repetitionRatio(col("text")).as("rep_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),
    // ---- text analysis: heuristic language ID vs labeled lang
    "x_text_langid" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.langId(col("text")).as("pred_lang"),
        col("lang"))
        .orderBy(col("doc_id"))),
    // ---- text analysis: rolling-hash fingerprint (custom codegen'd
    // Catalyst Expression; no oracle — engine-specific hash)
    "x_text_fingerprint" -> ((s, dir) => {
      TextFunctions.register(s)
      Tables.documents(s, dir).select(
        col("doc_id"), TextFunctions.rollingHash(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),
    // ---- dedup: exact (hash-groupBy on content)
    "x_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    // ---- dedup: exact via content digest (scale path — shuffles
    // 32-byte sha256 digests, not documents)
    "x_dedup_exact_digest" -> ((s, dir) => Dedup.exactByDigest(Tables.documents(s, dir))),
    // ---- dedup keeping the BEST duplicate (longest version wins, tie
    // to smallest id) over case/punct-normalized text — the curation
    // keep rule, not the min-id bookkeeping rule
    "x_dedup_keep_best" -> ((s, dir) =>
      Dedup.exactKeepBest(Tables.documents(s, dir), "text", "doc_id",
        length(col("text")).cast("long"))),
    // ---- dedup: exact n-gram Jaccard pairs on a bounded subset
    // (ground truth for the MinHash path)
    "x_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 200),
        n = 3, minJaccard = 0.5)),
    // ---- dedup: per-doc CROSS-doc duplicated 5-gram occurrence
    // fraction (exact-substring-dedup signal; md5 digests shuffle, not
    // gram text, which is also what makes it oracle-checkable)
    "x_dedup_ngram_frac" -> ((s, dir) =>
      Dedup.dupNgramFraction(Tables.documents(s, dir), n = 5)),
    // ---- dedup: maximal duplicated token SPANS (which ranges to TRIM,
    // not just which docs to drop) via gaps-and-islands
    "x_dedup_ngram_spans" -> ((s, dir) =>
      Dedup.dupNgramSpans(Tables.documents(s, dir), n = 5, minRun = 2)),
    // ---- dedup apply-side: rewrite docs with duplicated spans removed
    // (nested positional-filter × span-exists, scan-stage)
    "x_dedup_span_trim" -> ((s, dir) =>
      Dedup.trimDupSpans(Tables.documents(s, dir), n = 5, minRun = 2)),
    // ---- dedup: INCREMENTAL — new batch (doc_id >= 250) deduped
    // against a persisted digest index of everything ingested before
    // (doc_id < 250); the cross-snapshot path where history is indexed
    // once and each new batch pays batch cost
    "x_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // the new snapshot PLUS 50 re-crawled docs (indexed text under
      // fresh ids): the fixture has no natural cross-boundary
      // duplicates, so without the injection the oracle would pass
      // even against a dedupe that drops nothing
      val batch = docs.filter(col("doc_id") >= 250)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 100000L))
      digestIndexFor(s, dir).dedupe(batch)
        .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
        .orderBy(col("doc_id"))
    }),
    // ---- dedup: TAKEDOWN — the index of doc_id < 250 with doc_id < 50
    // tombstoned ([[graft.operators.DigestIndex.delete]]); re-crawls of
    // the deleted docs are ADMITTED again while re-crawls of the
    // still-indexed docs keep dropping — the right-to-be-forgotten path
    // a training-data pipeline needs next to ingest dedup
    "x_dedup_delete" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val batch = docs.filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + 300000L)
      digestDeleteIndexFor(s, dir).dedupe(batch)
        .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
        .orderBy(col("doc_id"))
    }),
    // ---- dedup: INCREMENTAL NEAR-dup — new batch probed against a
    // persisted MinHash band-posting index of everything ingested
    // before (doc_id < 250, signed ONCE per JVM); only the batch is
    // signed per probe. Injected re-crawls (indexed text + one appended
    // token, fresh ids) guarantee cross-boundary near-dups exist —
    // the fixture has none naturally. Rows-only (xxhash64 signatures
    // are engine-specific); the regression gate is ExtensionSpec's
    // equality check vs minhashPairs on the union.
    "x_dedup_incremental_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val batch = docs.filter(col("doc_id") >= 250)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 200000L)
          .withColumn("text", concat(col("text"), lit(" recrawl"))))
      minhashIndexFor(s, dir).neardupe(batch, minEstJaccard = 0.5)
    }),
    // ---- heavy hitters PER GROUP: the MG aggregate composes with
    // groupBy — top-5 tokens per source straight off each group's
    // summary (exact here: capacity exceeds the fixture vocabulary)
    "x_heavy_hitters_by_source" -> ((s, dir) => {
      graft.functions.FreqFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("source"))
        .agg(slice(graft.functions.FreqFunctions.misraGries(col("token"), 256),
          1, 5).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).as("rank"),
          col("col.item").as("token"), col("col.est").as("cnt"))
        .orderBy(col("source"), col("rank"))
    }),
    // ---- dedup: MinHash + LSH banding over the full table (scale path;
    // no oracle — xxhash64 signatures are engine-specific)
    "x_dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir),
        n = 3, k = 64, bands = 16, minEstJaccard = 0.5)),
    // ---- dedup: near-dup pairs clustered into components, one
    // survivor per cluster — over the EXACT n-gram Jaccard pairs (same
    // bounded subset as x_dedup_jaccard), so the connected-components
    // machinery (star-contraction CC + min-id survivor pick) gets an
    // INDEPENDENT DuckDB oracle: recursive-CTE transitive closure →
    // min-label components → survivors. The minhash-edged composition
    // stays covered by x_dedup_clusters_incremental (rows-only —
    // xxhash64 signatures) and ClusterIndexSpec's equivalence laws.
    "x_dedup_clusters" -> ((s, dir) =>
      Dedup.clusterSurvivors(Dedup.jaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 200),
        n = 3, minJaccard = 0.5))),
    // ---- dedup: SimHash near-dup pairs (no oracle)
    "x_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxHamming = 3)),
    // ---- embedding near-dup: exact cosine pairs on a bounded subset
    "x_neardup_embed_brute" -> ((s, dir) =>
      Similarity.cosineNearDupBrute(
        Tables.embeddings(s, dir).filter(col("vec_id") < 200), minCosine = 0.35)),
    // ---- embedding near-dup: LSH-bucketed, same subset as the brute
    // query so recall is directly measurable from the dumps (no oracle;
    // the operator itself is the full-table scale path)
    "x_neardup_embed_lsh" -> ((s, dir) =>
      Similarity.cosineNearDupLsh(
        Tables.embeddings(s, dir).filter(col("vec_id") < 200), minCosine = 0.35)),
    // ---- SemDeDup-style semantic dedup (arXiv:2303.09540): k-means-
    // bucketed within-cluster near-dup pairs → connected components →
    // one survivor per semantic family. Rows-only (k-means has no SQL
    // oracle); precision-1-by-construction + recall gated vs brute in
    // ExtensionSpec
    "x_dedup_semantic" -> ((s, dir) =>
      Dedup.clusterSurvivors(
        Similarity.cosineNearDupSemantic(
          Tables.embeddings(s, dir).filter(col("vec_id") < 200),
          minCosine = 0.35, k = 8))),
    // ---- sequence packing: concat-and-chunk the corpus token stream
    // into 512-token training sequences (distributed two-phase prefix
    // sum — no single-partition global window)
    "x_pack_sequences" -> ((s, dir) =>
      graft.operators.Pack.packSequences(Tables.documents(s, dir),
        capacity = 512)),
    // ---- packing apply-side: the materialized training sequences
    // themselves (md5 witness per 512-token sequence text)
    "x_pack_apply" -> ((s, dir) =>
      graft.operators.Pack.packApply(Tables.documents(s, dir),
        capacity = 512)),
    // ---- curate-then-pack pipeline: quality percentile cut
    // (broadcast-crossJoin of the 1-row aggregate — the filterByNll
    // shape, no driver hop) feeds the distributed packer — ONE
    // oracle-checked plan from raw corpus to the sequence stream a
    // trainer consumes
    "x_pipeline_pack" -> ((s, dir) => {
      // scores materialized once (the filterByNll shape): the cut
      // aggregate, the keep-filter and the packer's window passes all
      // read the checkpoint, not the scoring plan
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("text"),
        TextFunctions.qualityScore(col("text")).as("q")).graftCheckpoint()
      val cut = scored.agg(round(expr("percentile(q, 0.2)"), 4).as("cut"))
      graft.operators.Pack.packSequences(
        scored.crossJoin(broadcast(cut)).filter(col("q") > col("cut"))
          .drop("cut"), capacity = 512)
    }),
    // ---- heavy hitters: exact top-20 tokens via Misra-Gries
    // candidates + exact recount (the bounded-summary plan that never
    // shuffles the token universe)
    "x_heavy_hitters" -> ((s, dir) =>
      graft.operators.Frequency.heavyHitterTopK(Tables.documents(s, dir),
        k = 20, capacity = 256)),
    // ---- quality-score distribution in decile bands (percentile-cut
    // shape — cut points collect to the driver, banding is scan-stage;
    // NOT a single-task global ntile)
    "x_quality_deciles" -> ((s, dir) =>
      graft.operators.Quality.scoreDeciles(Tables.documents(s, dir))),
    // ---- same report off the approx_percentile sketch — the 100 TB
    // default (bounded sketch memory, no exact global percentile).
    // Rows-only: sketch cuts are engine-specific; the tolerance gate
    // vs the exact report lives in PackFreqSpec.
    "x_quality_deciles_approx" -> ((s, dir) =>
      graft.operators.Quality.scoreDeciles(Tables.documents(s, dir),
        approx = true)),
    // ---- token-budget mixture sampling: weighted per-source doc
    // contributions to a 2000-token budget (exclusive-cumsum cut)
    "x_sample_token_budget" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetSample(Tables.documents(s, dir),
        budgetTokens = mixBudget, weights = mixWeights)),
    // ---- quality-distribution drift (PSI) between the ingested
    // history (doc_id < 250) and a new snapshot — the admit-or-
    // investigate monitor a pipeline runs per crawl; add-one-smoothed
    // band proportions, one ln, everything else exact integers
    "x_quality_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Quality.drift(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
    }),
    // ---- temperature-reweighted mixture: weights derived from the
    // corpus's OWN token shares, w = share^0.5 — the multilingual-
    // pretraining rebalancing (flattens the head toward the tail).
    // Counts are exact, weights + weight-sum round to 10 decimals in
    // both engines, quotas are single IEEE multiply/divide/floor —
    // fully hash-checkable despite the derived (non-literal) weights
    "x_sample_temperature" -> ((s, dir) =>
      graft.operators.Sampling.temperatureMix(Tables.documents(s, dir),
        budgetTokens = mixBudget, alpha = mixAlpha)),
    // ---- Holt linear forecast per tag over DAILY bucketed counts
    // (the operator's own advice: forecast aggregated series, not raw
    // ticks — and the bucketing is what makes the feedback recurrence
    // oracle-checkable: ~30 points/tag replay through a DuckDB
    // recursive CTE). Count is integer-exact in both engines and
    // alpha/beta are binary-exact doubles, so the fold replays
    // bit-for-bit; only the final yhat rounds.
    "x_forecast_holt" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.ts(s, dir)
        .groupBy(col("tag"),
          (expr("timestamp div 86400000") * 86400000L).as("timestamp"))
        .agg(count(lit(1)).cast("double").as("value"))
      graft.operators.Forecast.holtLinear(daily.as[graft.model.TS],
        alpha = 0.5, beta = 0.25, horizon = 5)
    }),
    // ---- additive Holt-Winters (level+trend+weekly seasonal) over
    // the same daily series: binary-exact weights + integer counts =>
    // the fold replays bit-for-bit in the recursive-CTE oracle
    "x_forecast_hw" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.ts(s, dir)
        .groupBy(col("tag"),
          (expr("timestamp div 86400000") * 86400000L).as("timestamp"))
        .agg(count(lit(1)).cast("double").as("value"))
      graft.operators.Forecast.holtWinters(daily.as[graft.model.TS],
        alpha = 0.5, beta = 0.25, gamma = 0.25, period = 7, horizon = 7)
    }),
    // ---- LTTB downsample of the dense minute grid (visualization
    // shape preservation). Fully oracled: the per-bucket argmax
    // feedback recurrence replays in a DuckDB recursive CTE — bucket
    // boundaries and next-bucket averages precompute outside the
    // recursion, the working rows (one per tag) carry the previous
    // pick, and the per-step argmax is a correlated subquery ordered
    // (area desc, position) = the kernel's ties-earliest rule. Area
    // inputs are deterministic doubles (integer-valued counts, one
    // rounded mean), so the argmax agrees across engines. Also
    // spec-gated against an independent sequential reference.
    "x_downsample_lttb" -> ((s, dir) => {
      import s.implicits._
      val grid = denseGrid(s, dir).select(col("bucket_start").as("timestamp"),
        col("tag"), col("cnt").as("value"))
      graft.operators.Downsample.lttb(grid.as[graft.model.TS], threshold = 100)
    }),
    // ---- k-means corpus profile: sizes + mean norm per embedding
    // cluster (no oracle — iterative float averages are engine-specific)
    "x_cluster_profile" -> ((s, dir) =>
      graft.operators.Clustering.clusterProfile(Tables.embeddings(s, dir), k = 8)),
    // ---- diversity sampling: equal quota from each embedding cluster
    // (no oracle — cluster labels are engine-specific)
    "x_cluster_balanced_sample" -> ((s, dir) =>
      graft.operators.Clustering.balancedSample(Tables.embeddings(s, dir),
        k = 8, perCluster = 10)),
    // ---- URL canonicalization dedup: even/odd doc pairs carry the
    // SAME page as messy variants (uppercased scheme, tracking params,
    // permuted query, fragment) — canonical forms must collide and
    // keep the min id (full SQL oracle mirrors the canonicalizer)
    "x_url_canonical_dedup" -> ((s, dir) => {
      import graft.functions.UrlFunctions
      val baseId = col("doc_id") - pmod(col("doc_id"), lit(2))
      // the whole URL derives from baseId (NOT per-row source — the
      // odd twin must land on the SAME page as its even base)
      val url0 = concat(lit("http://w"), pmod(baseId, lit(23)).cast("string"),
        lit(".s"), pmod(baseId, lit(17)).cast("string"),
        element_at(typedlit(Seq(".com", ".co.uk", ".org", ".com.au", ".net")),
          (pmod(baseId, lit(5)) + 1).cast("int")),
        lit("/p/"), baseId.cast("string"))
      val url = when(pmod(col("doc_id"), lit(2)) === 0,
        concat(url0, lit("?a=1&b=2")))
        .otherwise(concat(
          regexp_replace(url0, "^http://w", "HTTP://W"),
          lit("?utm_source=feed&b=2&a=1#frag")))
      Tables.documents(s, dir)
        .select(col("doc_id"), UrlFunctions.canonicalize(url).as("curl"))
        .groupBy(col("curl"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_variants"))
        .orderBy(col("keep_id"))
    }),
    // ---- line-level boilerplate removal (CCNet paragraph dedup):
    // drop lines appearing in >= 2 distinct docs, rebuild the text in
    // order; md5 witness per rewritten doc
    "x_text_line_dedup" -> ((s, dir) =>
      graft.operators.Dedup.dropBoilerplateLines(Tables.documents(s, dir))
        .select(col("doc_id"), md5(col("text")).as("h"),
          col("n_lines_kept"), col("n_lines_dropped"))
        .orderBy(col("doc_id"))),
    // ---- sliding-window chunking (RAG/embedding prep): 64-token
    // windows every 48 tokens, md5 witness per chunk keeps the dump
    // small while pinning the exact text
    "x_text_chunks" -> ((s, dir) =>
      graft.operators.Chunker.chunk(
        Tables.documents(s, dir).filter(col("doc_id") < 50),
        chunkTokens = 64, strideTokens = 48)
        .select(col("doc_id"), col("chunk_id"), col("tok_start"),
          col("n_toks"), md5(col("chunk")).as("h"))
        .orderBy(col("doc_id"), col("chunk_id"))),
    // Gopher repetition signals (Rae et al. 2021 A1.1): five
    // per-document repetition fractions as ONE scan-stage projection
    // (sorted-array run-length folds — no explode, no shuffle), fully
    // SQL-oracled in DuckDB via unnest+group-by re-derivation
    "x_text_repetition_gopher" -> ((s, dir) =>
      graft.operators.Repetition.repetitionSignals(
        Tables.documents(s, dir).filter(col("doc_id") < 200))
        .select(col("doc_id"), col("dup_line_frac"), col("dup_line_char_frac"),
          col("top_2gram_char_frac"), col("top_3gram_char_frac"),
          col("dup_5gram_char_frac"))
        .orderBy(col("doc_id"))),
    // ---- dataloader sharding: epoch-1 corpus split into 4 disjoint
    // worker shards, each in its replayable permutation order
    "x_epoch_shards" -> ((s, dir) =>
      graft.operators.Sampling.epochShards(
        Tables.documents(s, dir).select(col("doc_id")).filter(col("doc_id") < 100),
        "doc_id", lit(1L), nShards = 4)
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos"))),
    // ---- MMR diverse exemplar selection: greedy k=12 maximizing
    // λ·rel − (1−λ)·max-cos-to-selected. Fully oracled: the operator
    // rounds every marginal score to 6 decimals BEFORE each argmax
    // (with vec_id tie-break), so the greedy recursion replays in a
    // DuckDB recursive CTE — one working row carrying the selected
    // list, correlated argmax subquery per step (exact-vs-reference
    // and diversity laws stay in MmrSpec)
    "x_sample_mmr" -> ((s, dir) =>
      graft.operators.Mmr.mmrSelect(Tables.embeddings(s, dir), k = 12)),
    // ---- similarity search: exact cosine top-5 for 10 query vectors
    "x_ann_topk_brute" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- similarity search over int8-quantized vectors (4× smaller
    // candidate I/O). Fully oracled: the per-vector quantization is
    // round(127·x/max|x|) — integer-exact in both engines — and the
    // int8 cosine's dot/norms are sums of small exact integers, so
    // the round-4 scores hash-match like the float brute's do
    // (recall vs the float path stays gated in the spec)
    "x_ann_topk_int8" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopKInt8(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- similarity search: LSH-bucketed approximate top-5 against the
    // PERSISTED on-disk index (no oracle); only the 10-query probe is
    // per-call — bucket pruning + row-group skipping on the postings
    "x_ann_topk_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      annStore(s, dir).probeLsh(emb.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- as-of join: for each click, the user's most recent prior
    // error (the canonical time-series join; DuckDB ASOF JOIN oracle)
    "x_asof_join" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val (clicks, errors) = asofSides(s, dir)
      asofShaped(AsOfJoin.asOf(clicks, errors, "t", "t",
        Seq("user_id"), Seq("err_value")))
    }),
    // ---- as-of join with tolerance: same shape, but a match older than
    // 1 hour is discarded (sentinel) — exercises the tolerance branch
    // the plain x_asof_join can't
    "x_asof_join_tol" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val (clicks, errors) = asofSides(s, dir)
      asofShaped(AsOfJoin.asOf(clicks, errors, "t", "t",
        Seq("user_id"), Seq("err_value"), tolerance = Some(3600000L)))
    }),
    // ---- similarity search: IVF inverted-list approximate top-5 from
    // the persisted index (rows-only; recall measurable against
    // x_ann_topk_brute's dump)
    "x_ann_topk_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      annStore(s, dir).probeIvf(emb.filter(col("vec_id") < 10), k = 5, nprobe = 8)
    }),
    // ---- JL random projection as a candidate generator: coarse
    // top-100 in the 32-dim projected space (the scan reads half the
    // floats), exact full-dim rescore of candidates only, top-5
    // (rows-only; recall ≥0.6 vs brute gated in ProjectionSpec)
    "x_ann_topk_projected" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.projectedTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- similarity search: IVF-PQ — same pruned lists, candidates
    // scored off m one-byte codes via a per-query ADC table (~32× less
    // candidate I/O; rows-only; recall-gated vs brute in AnnIndexSpec)
    "x_ann_topk_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      annStore(s, dir).probePq(emb.filter(col("vec_id") < 10), k = 5, nprobe = 8)
    }),
    // ---- pricing summary (TPC-H Q1 shape): the canonical columnar-agg
    // workload. Exact sums via SCALED INTEGERS ([[scaledSum]]): the
    // monetary columns carry fixed 2/4-decimal precision, so
    // round(x*scale) is the exact integer; accumulating it in
    // decimal(38,0) keeps integer exactness (no BigDecimal
    // multiplication — the expensive part of decimal aggregation) with
    // no overflow ceiling
    "x_pricing_summary" -> ((s, dir) => {
      graft.functions.NumericFunctions.register(s)
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          scaledSum(col("l_quantity"), 100).as("sum_qty"),
          scaledSum(col("l_extendedprice"), 100).as("sum_base"),
          scaledSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
            .as("sum_disc_price"),
          ((scaledSumRaw(col("l_discount"), 10000) / lit(10000)).cast("double")
            / count(lit(1))).as("avg_disc"),
          count(lit(1)).cast("double").as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // ---- relational analytics at scale: star join with broadcast dims
    // (int128 scaled sums => order-independent, exact cross-engine compare)
    "x_join_revenue_by_nation" -> ((s, dir) => {
      graft.functions.NumericFunctions.register(s)
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(scaledSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("revenue"),
          count(lit(1)).cast("double").as("n_items"))
        .orderBy(col("n_name"))
    }),
    // ---- window function: per-supplier running revenue in ship order
    "x_window_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.NumericFunctions.register(s)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          ((graft.functions.NumericFunctions.sum128(
            round(col("l_extendedprice") * 100).cast("long"))
            .over(w) / lit(100)).cast("double")).as("running"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),
    // ---- composite pipeline: quality-filter → exact-dedup survivors →
    // per-language stats (the operators composing end-to-end, all
    // inside one oracle-checked plan)
    "x_pipeline_quality_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = docs.select(col("doc_id"), col("lang"), col("text"),
        TextFunctions.qualityScore(col("text")).as("q"))
      val kept = scored.filter(col("q") >= 0.3)
      // min_by, not first()/independent min()s: first() is pick-any and
      // independent mins would stitch the survivor's lang from a
      // DIFFERENT duplicate than its id (q is text-determined here)
      val deduped = kept.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(col("q"), col("doc_id")).as("q"))
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).cast("double").as("n_docs"),
          round(avg(col("q")), 4).as("avg_q"))
        .orderBy(col("lang"))
    }),
    // ---- sessionization (batch form of StreamingIngest.sessionAgg):
    // per-user sessions with a 1h inactivity gap over the events table;
    // session end = last event + gap (Spark session_window semantics,
    // mirrored in SQL by a lag-based session id)
    "x_sessions" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"),
          timestamp_millis(Tables.tsMillis(Tables.events(s, dir))).as("event_time"),
          col("value"))
        .groupBy(col("user_id"), session_window(col("event_time"), "1 hour"))
        .agg(count(lit(1)).cast("double").as("cnt"),
          round(sum(col("value")), 4).as("sum_val"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start"),
          unix_millis(col("session_window.end")).as("session_end"),
          col("cnt"), col("sum_val"))
        .orderBy(col("user_id"), col("session_start"))),
    // ---- gap-fill: per-tag minute-bucket counts over one day, EVERY
    // bucket present (zeros where no events landed) — the classic TS
    // densification the reference lacks
    "x_gapfill_minutes" -> ((s, dir) =>
      denseGrid(s, dir).orderBy(col("tag"), col("bucket_start"))),
    // ---- moving average + delta over the dense grid: gap filling is
    // what makes "last 7 buckets" mean "last 7 minutes"
    "x_moving_avg" -> ((s, dir) =>
      graft.operators.GapFill.movingAvg(denseGrid(s, dir), window = 7)),
    // ---- EWMA smoothing over a bounded 16-row trailing frame: the
    // recurrence folds a window-collected array, so it stays a pure
    // scan-stage expression (alpha = 0.25 is binary-exact, making the
    // fold bit-replayable in any IEEE-754 engine)
    "x_ewma_smooth" -> ((s, dir) =>
      graft.operators.Forecast.ewmaBounded(denseGrid(s, dir), Seq("tag"),
        "bucket_start", "cnt", alpha = 0.25, frameRows = 16)),
    "x_bucket_delta" -> ((s, dir) =>
      graft.operators.GapFill.delta(denseGrid(s, dir))),
    // ---- anomaly detection: buckets deviating >= 2 trailing-window
    // standard deviations (stats rounded before the division so the
    // score is cross-engine exact)
    "x_anomaly_zscore" -> ((s, dir) =>
      graft.operators.GapFill.anomalies(denseGrid(s, dir), window = 30, threshold = 2.0)),
    // ---- time-weighted average per tag (LOCF weighting over the
    // irregular sample spacing — the TimescaleDB time_weight shape);
    // int128 scaled-integer numerator => hash-exact at any row count
    "x_time_weighted_avg" -> ((s, dir) =>
      graft.operators.TsAnalytics.timeWeightedAvg(Tables.ts(s, dir))),
    // ---- OHLC daily bars per tag (market-data downsample): pure
    // min/max/arg-min/arg-max selections, unrounded exact compare
    "x_ohlc_daily" -> ((s, dir) =>
      graft.operators.TsAnalytics.ohlc(Tables.ts(s, dir), bucketMs = 86400000L)),
    // ---- pairwise cross-tag correlation of hourly activity, aligned
    // on a dense hourly grid over the full range (all 5 tags => 10
    // pairs; equi-join on bucket, NOT a cartesian)
    "x_corr_pairs" -> ((s, dir) =>
      graft.operators.TsAnalytics.corrPairs(
        graft.operators.GapFill.bucketCounts(Tables.ts(s, dir),
          bucketMs = 3600000L, sorted = false))),
    // ---- PromQL-style counter rate with reset detection over a
    // deterministic synthetic counter (per-tag running scaled sum mod
    // 1e6 => every wrap exercises the reset arithmetic); all-integer
    // until the final /100 => hash-exact
    "x_counter_rate" -> ((s, dir) =>
      graft.operators.TsAnalytics.counterRate(
        graft.operators.TsAnalytics.syntheticCounter(Tables.ts(s, dir),
          wrap = 1000000L))),
    // ---- linear-interpolation gap fill (TimescaleDB interpolate())
    // over one day of minute buckets: empty buckets get the line
    // between the nearest observed neighbors; edges stay sentinel −1
    "x_interp_linear" -> ((s, dir) =>
      graft.operators.TsAnalytics.interpolateLinear(
        Tables.ts(s, dir)
          .filter(col("timestamp") >= T1 && col("timestamp") < T1 + 86400000L),
        bucketMs = 60000L)),
    // ---- STL-lite seasonal decomposition of DAILY activity per tag:
    // centered 7-day trend, day-of-week seasonal, residual — scaled-
    // integer trend, single mirrored IEEE divisions elsewhere
    "x_seasonal_decompose" -> ((s, dir) =>
      graft.operators.TsAnalytics.seasonalDecompose(
        graft.operators.GapFill.bucketCounts(Tables.ts(s, dir),
          bucketMs = 86400000L, sorted = false),
        bucketMs = 86400000L, period = 7, halfWin = 3)),
    // ---- CUSUM changepoint (first-split): per tag the |prefix-sum of
    // deviations| peak over daily counts, with the two segment means
    "x_cusum_change" -> ((s, dir) =>
      graft.operators.TsAnalytics.cusumChange(
        graft.operators.GapFill.bucketCounts(Tables.ts(s, dir),
          bucketMs = 86400000L, sorted = false),
        bucketMs = 86400000L)),
    // ---- funnel: strictly-ordered view→click→purchase progression
    // (conditional-min chain per user — no per-user event lists)
    "x_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"),
        Tables.tsMillis(Tables.events(s, dir)).as("t"), col("event_type"))
      graft.operators.Funnel.funnel(e, Seq("view", "click", "purchase"))
    }),
    // ---- cohort retention: weekly cohorts by first event, distinct
    // active users per (cohort, week offset)
    "x_retention_cohorts" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"),
        Tables.tsMillis(Tables.events(s, dir)).as("t"))
      graft.operators.Funnel.retentionCohorts(e)
    }),
    // ---- time-in-state per user (TimescaleDB state_agg): each event
    // asserts its event_type until the user's next event (LOCF); all
    // integer millis => hash-exact
    "x_state_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.TsAnalytics.stateAgg(
        ev.select(col("user_id"), Tables.tsMillis(ev).as("t"),
          col("event_type")),
        "user_id", "event_type", "t")
    }),
    // ---- heartbeat liveness (TimescaleDB heartbeat_agg): 12h
    // tolerance over each user's month of events — the measured gap
    // distribution (median ~7h, p90 ~25h) exercises both the merge and
    // the split path; integer millis => hash-exact
    "x_heartbeat_uptime" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.TsAnalytics.heartbeatAgg(
        ev.select(col("user_id"), Tables.tsMillis(ev).as("t")),
        "user_id", "t", tolMs = 43200000L)
    }),
    // ---- first-order Markov transition matrix over each user's
    // event-type sequence (next-event baseline); counts exact, one
    // rounded row-normalizing division
    "x_state_transitions" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.TsAnalytics.stateTransitions(
        ev.select(col("user_id"), Tables.tsMillis(ev).as("t"),
          col("event_type")),
        "user_id", "event_type", "t")
    }),
    // ---- merged liveness intervals (TimescaleDB live_ranges): the
    // interval accessor behind x_heartbeat_uptime, same 12h tolerance
    "x_live_ranges" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.TsAnalytics.liveRanges(
        ev.select(col("user_id"), Tables.tsMillis(ev).as("t")),
        "user_id", "t", tolMs = 43200000L)
    }),
    // ---- peak concurrent live users per day: the live ranges swept
    // by a bucketed two-phase prefix sum (hourly phase-1 buckets —
    // never a global running sum over the raw event stream)
    "x_peak_concurrency" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.TsAnalytics.peakConcurrency(
        graft.operators.TsAnalytics.liveRanges(
          ev.select(col("user_id"), Tables.tsMillis(ev).as("t")),
          "user_id", "t", tolMs = 43200000L),
        "range_start", "range_end", bucketMs = 3600000L)
    }),
    // ---- autocorrelation at lags 1..5 per series (seasonality /
    // burst-persistence diagnostic; ONE window shuffle feeds all lags)
    "x_acf" -> ((s, dir) =>
      graft.operators.GapFill.autocorrelation(denseGrid(s, dir), maxLag = 5)),
    // ---- rollup: hierarchical subtotal grid over the pricing keys
    // (grouping-set analytics; sentinel 'ALL' keeps null ordering out
    // of the compare)
    "x_rollup_pricing" -> ((s, dir) => {
      graft.functions.NumericFunctions.register(s)
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(scaledSum(col("l_quantity"), 100).as("sum_qty"),
          count(lit(1)).cast("double").as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n_rows"))
        .orderBy(col("rf"), col("ls"))
    }),
    // ---- cube: full marginal grid over the pricing keys (rollup's
    // column-hierarchy PLUS the per-linestatus marginals; same 'ALL'
    // sentinel discipline)
    "x_cube_pricing" -> ((s, dir) => {
      graft.functions.NumericFunctions.register(s)
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(scaledSum(col("l_quantity"), 100).as("sum_qty"),
          count(lit(1)).cast("double").as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n_rows"))
        .orderBy(col("rf"), col("ls"))
    }),
    // ---- co-located fact-fact join over bucketed layout: both sides
    // read pre-bucketed on the join key, so the join has ZERO Exchange
    // (BucketedSpec pins the plan) — the write-once/join-many trade
    "x_bucketed_join" -> ((s, dir) => {
      graft.functions.NumericFunctions.register(s)
      val (liTbl, ordTbl) = bucketedPair(s, dir)
      graft.sources.Bucketed.colocatedJoin(s, liTbl, ordTbl,
          "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(scaledSum(col("l_extendedprice"), 100).as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
        .orderBy(col("priority"))
    }),
    // ---- pivot: order counts per priority, statuses as columns (the
    // relational RESHAPE — fixed pivot values keep the schema static,
    // which is also the 100 TB rule: pivot on an unbounded value set is
    // a schema explosion, not a query)
    "x_pivot_order_status" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("priority"),
          coalesce(col("O"), lit(0L)).as("cnt_o"),
          coalesce(col("F"), lit(0L)).as("cnt_f"),
          coalesce(col("P"), lit(0L)).as("cnt_p"))
        .orderBy(col("priority"))),
    // ---- vocabulary: global top-100 tokens by frequency (the vocab-
    // building sweep; deterministic tie order by token)
    "x_token_vocab" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100)),
    // ---- vocabulary coverage / OOV-rate curve: share of corpus
    // tokens a top-k vocab covers, per candidate k — the tokenizer
    // budget diagnostic. Each k is a TakeOrdered over the VOCAB (never
    // a global sort), the token count aggregate runs once
    "x_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val counts = graft.Materialize.ephemeral(
        graft.operators.Bpe.wordVocab(Tables.documents(s, dir)))
      val total = counts.agg(sum(col("freq"))).head().getLong(0)
      val rows = Seq(5, 10, 20, 40).map { k =>
        val covered = counts.orderBy(col("freq").desc, col("word"))
          .limit(k).agg(sum(col("freq"))).head().getLong(0)
        (k.toLong, covered, total,
          BigDecimal(covered.toDouble / total)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      rows.toDF("k", "covered_tokens", "total_tokens", "coverage")
        .orderBy(col("k"))
    }),
    // ---- per-group percentiles: the grouped form of d3. One row per
    // tag: the single-partition sort replaces orderBy's range exchange,
    // whose bounds sampling re-executed the percentile merge stage (the
    // TsAnalytics.orderedSmall rule — identical total order, unique key)
    "x_group_percentiles" -> ((s, dir) =>
      Tables.ts(s, dir)
        .groupBy(col("tag").as("grp"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .repartition(1).sortWithinPartitions(col("grp"))),
    // ---- per-group percentiles, sketch path: approx_percentile is
    // the quantile that scales (bounded-memory KLL-style sketch vs
    // exact percentile's full sort); rows-only — sketch interpolation
    // is engine-specific — with a tolerance gate vs exact in the spec.
    // ONE sketch per group queried at both quantiles (the array form):
    // two scalar calls built two identical sketches per group, and the
    // single-task merge of their 32 map-side partials dominated the
    // query (profiled 0.18 + 0.29 s — the second a re-execution under
    // the old orderBy's range sampling). Same values by construction:
    // the sketch is deterministic for a given partition layout.
    "x_group_percentiles_approx" -> ((s, dir) =>
      Tables.ts(s, dir)
        .groupBy(col("tag").as("grp"))
        .agg(expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("ps"))
        .select(col("grp"), round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p95"))
        .repartition(1).sortWithinPartitions(col("grp"))),
    // ---- fixed-width value histogram (bin = floor(value/5))
    "x_value_histogram" -> ((s, dir) =>
      Tables.ts(s, dir)
        .groupBy(floor(col("value") / 5).cast("long").as("bin"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .orderBy(col("bin"))),
    // ---- decontamination: flag corpus docs sharing 3-gram shingles
    // with the "evaluation set" (doc_id < 20) — the eval side broadcasts
    "x_decontaminate" -> ((s, dir) => {
      import graft.operators.Contamination
      val docs = Tables.documents(s, dir)
      Contamination.flag(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), n = 3)
    }),
    // ---- contamination PROFILE: which sources leak eval data, and how
    // badly — the triage view over the flag() output. The rate is
    // POOLED (Σoverlap/Σshingles): integer sums are exact in any
    // engine, so one division + one round is tie-free — avg of
    // per-doc ROUNDED fracs lands exactly on .00005 summation-order
    // ties (demonstrated on the fixture) and would flap the compare
    "x_decontaminate_by_source" -> ((s, dir) => {
      import graft.operators.Contamination
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") >= 20)
      Contamination.flag(corpus, docs.filter(col("doc_id") < 20), n = 3)
        .join(corpus.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_contaminated"),
          round(sum(col("n_overlap")).cast("double") /
            sum(col("n_shingles")), 4).as("overlap_rate"))
        .orderBy(col("source"))
    }),
    // ---- deterministic mixture sampling: 50 docs per language in
    // engine-mirrorable pseudo-random order
    "x_sample_quota" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.quotaPerGroup(Tables.documents(s, dir), "lang", "doc_id", quota = 50)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),
    // ---- corpus data card: the per-source summary a dataset owner
    // reads first — ONE scan, partial-aggregated counters
    "x_corpus_report" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.wsTokenCount(col("text")).cast("long")).as("sum_tokens"),
          round(avg(TextFunctions.qualityScore(col("text"))), 4).as("avg_quality"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))),
    // ---- incremental corpus stats: the data card maintained at BATCH
    // cost — per-source partials committed per ingest
    // ([[graft.operators.StatsIndex]]), merged at report time. The
    // oracle full-scans the same corpus: incremental == one-shot is
    // exactly the law being checked. Exact columns only here; the HLL
    // distinct estimates ride the rows-only card below
    "x_corpus_stats_incremental" -> ((s, dir) =>
      statsIndexFor(s, dir).report()
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("avg_doc_tokens"))
        .orderBy(col("source"))),
    // the full card incl. HLL distinct-digest/vocabulary estimates
    // (sketch estimates are engine-specific => rows-only; the
    // write+append == one-shot estimate law is StatsIndexSpec's)
    "x_corpus_stats_card" -> ((s, dir) => statsIndexFor(s, dir).report()),
    // ---- deterministic epoch shuffling: the first 20 docs of each of
    // 3 training epochs — a different replayable permutation per epoch
    // (restart-safe training order, no shuffle-seed state). Per-epoch
    // TakeOrderedAndProject branches, NOT a row_number window: a
    // partitionBy(epoch) window funnels the whole corpus through one
    // task per epoch, while each TakeOrdered is a per-partition heap.
    // The trailing rank window then orders 20-row groups — trivial.
    "x_epoch_shuffle" -> ((s, dir) => {
      import graft.operators.Sampling
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val heads = (0L to 2L).map { ep =>
        docs.select(lit(ep).as("epoch"), col("doc_id"),
          Sampling.epochOrder(col("doc_id"), lit(ep)).as("k"))
          .orderBy(col("k"), col("doc_id")).limit(20)
      }.reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("epoch")).orderBy(col("k"), col("doc_id"))
      heads.withColumn("rank", row_number().over(w).cast("long"))
        .select(col("epoch"), col("rank"), col("doc_id"))
        .orderBy(col("epoch"), col("rank"))
    }),
    // ---- deterministic weighted sampling (A-Res): longer docs win
    // proportionally more often, draw replays in any engine
    "x_sample_weighted" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "doc_id", "n_chars", k = 50)),
    // ---- full curation pipeline: decontaminate → quality-filter →
    // exact-dedup → per-language quota sample → stats, all ONE
    // oracle-checked plan (the end-to-end story the operators exist for)
    // ---- pipeline v2 (round-4 operators end to end, ONE oracle-checked
    // plan): decontaminate → span-TRIM the surviving docs → drop the
    // now-too-short → token-budget mixture over sources → mix stats
    "x_pipeline_curation_v2" -> ((s, dir) => {
      import graft.operators.{Contamination, Sampling}
      val docs = Tables.documents(s, dir)
      // clean feeds the span derivation, the trim-side doc join AND the
      // source join — checkpoint so the scrub runs once, not three times
      val clean = Contamination.scrub(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), n = 3).graftCheckpoint()
      val trimmed = Dedup.trimDupSpans(clean, n = 5, minRun = 2)
        .join(clean.select(col("doc_id"), col("source")), "doc_id")
      val sized = trimmed.filter(
        TextFunctions.wsTokenCount(col("trimmed_text")) >= 30)
      Sampling.tokenBudgetSample(sized, budgetTokens = mixBudget,
          weights = mixWeights, groupCol = "source", idCol = "doc_id",
          textCol = "trimmed_text")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy(col("source"))
    }),
    "x_pipeline_curation" -> ((s, dir) => {
      import graft.operators.{Contamination, Sampling}
      val docs = Tables.documents(s, dir)
      val clean = Contamination.scrub(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), n = 3)
      val kept = clean.select(col("doc_id"), col("lang"), col("text"),
        TextFunctions.qualityScore(col("text")).as("q"))
        .filter(col("q") >= 0.3)
      val deduped = kept.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(col("q"), col("doc_id")).as("q"))
      Sampling.quotaPerGroup(deduped, "lang", "doc_id", quota = 30)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("double").as("n_docs"),
          round(avg(col("q")), 4).as("avg_q"))
        .orderBy(col("lang"))
    }),
    // ---- PII: the fixture text is clean word salad, so both sides
    // inject the same deterministic emails/phones/IPs first; detection
    // counts + the redacted text's md5 are then exact cross-engine
    "x_pii_detect" -> ((s, dir) => {
      import graft.operators.Pii
      Pii.detect(piiInjected(s, dir))
        .select(col("doc_id"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          col("n_ips").cast("long").as("n_ips"),
          col("has_pii"))
        .orderBy(col("doc_id"))
    }),
    "x_pii_redact" -> ((s, dir) => {
      import graft.operators.Pii
      Pii.redact(piiInjected(s, dir))
        .select(col("doc_id"), md5(col("text")).as("h"))
        .orderBy(col("doc_id"))
    }),
    // ---- canonical text normalization (dedup-key prep): md5 of the
    // normalized text is the compact cross-engine witness
    "x_text_normalize" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), md5(TextFunctions.normalize(col("text"))).as("h"))
        .orderBy(col("doc_id"))),
    // ---- deterministic TRUE stratified train/val/test split: exact
    // per-language proportions via rank-percentile cut (the hash-bucket
    // per-id-stable variant is exercised inside x_pipeline_pretrain)
    "x_split_stratified" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.stratifiedSplit(Tables.documents(s, dir), "lang", "doc_id")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).cast("double").as("n_docs"))
        .orderBy(col("lang"), col("split"))
    }),
    // ---- the FULL pretraining prep pipeline in ONE oracle-checked
    // plan: decontaminate → PII-redact → quality-filter → dedup on the
    // NORMALIZED text → stratified split → per-(lang, split) stats.
    // This is the end-to-end story all the round-3 operators exist for.
    "x_pipeline_pretrain" -> ((s, dir) => {
      import graft.operators.{Contamination, Pii, Sampling}
      val docs = Tables.documents(s, dir)
      val clean = Contamination.scrub(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), n = 3)
      val redacted = Pii.redact(clean)
      val kept = redacted.select(col("doc_id"), col("lang"), col("text"),
        TextFunctions.qualityScore(col("text")).as("q"))
        .filter(col("q") >= 0.3)
      // min_by, not independent min()s: the survivor keeps ITS OWN
      // lang/q, not fields stitched from different duplicates
      val deduped = kept
        .groupBy(TextFunctions.normalize(col("text")).as("norm"))
        .agg(min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(col("q"), col("doc_id")).as("q"))
      Sampling.hashSplit(deduped, "doc_id")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).cast("double").as("n_docs"),
          round(avg(col("q")), 4).as("avg_q"))
        .orderBy(col("lang"), col("split"))
    }),
    // ---- tf-idf: top-5 characteristic terms per language — the
    // corpus-mixing diagnostic (scores rounded before the rank cut)
    "x_tfidf_top_terms" -> ((s, dir) =>
      graft.operators.LangModel.tfIdfTopTerms(Tables.documents(s, dir), "lang", k = 5)),
    // ---- embeddings ⋈ documents: per-language L2-norm stats — the
    // vector column flowing through a relational join + aggregate
    "x_embed_norm_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val emb = Tables.embeddings(s, dir).select(col("vec_id").as("doc_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      docs.join(emb, "doc_id")
        // empty-list parity with the oracle: DuckDB's list_sum([]) is
        // NULL (skipped by avg/min/max); Spark's aggregate seed would
        // yield 0.0 and skew min_norm if an empty vector ever appears
        .select(col("lang"), when(size(col("v")) > 0,
          round(sqrt(aggregate(
            transform(col("v"), x => x * x), lit(0.0), (a, b) => a + b)), 4)).as("nrm"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("double").as("n"),
          round(avg(col("nrm")), 4).as("avg_norm"),
          min(col("nrm")).as("min_norm"),
          max(col("nrm")).as("max_norm"))
        .orderBy(col("lang"))
    }),
    // ---- unigram LM scoring: mean -ln p(token) under the corpus's own
    // unigram distribution — the perplexity-style quality signal
    "x_lm_unigram_nll" -> ((s, dir) =>
      graft.operators.LangModel.unigramNll(Tables.documents(s, dir))),
    // ---- LM percentile cut: drop the most-improbable tail (keep docs
    // at or below the 90th-percentile nll) — the curation filter form
    "x_lm_filter_nll" -> ((s, dir) =>
      graft.operators.LangModel.filterByNll(Tables.documents(s, dir), pct = 90.0)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),
    // ---- lexical search: BM25 top-k — the inverted-index probe as a
    // relational plan (query terms land in the token scan as literals)
    "x_search_bm25" -> ((s, dir) =>
      graft.operators.Search.bm25TopK(Tables.documents(s, dir),
        query = "spark hash join", k = 20)),
    // ---- hybrid retrieval: BM25 top-20 ⊕ exact-cosine top-20 fused by
    // reciprocal-rank fusion (1/(60+rank), the SIGIR'09 constant).
    // Fusion touches ≤ 40 rows — the corpus never reaches it.
    "x_search_hybrid_rrf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Search.hybridRrf(
        Tables.documents(s, dir), emb, query = "spark hash join",
        queryVec = emb.filter(col("vec_id") === 7), k = 10)
    }),
    // ---- tokenizer induction, round 0: weighted adjacent-symbol pair
    // counts over the char-split word vocabulary — BPE training's one
    // corpus-scale stage (every later round iterates over the
    // distinct-word vocab only); top-30 pairs, count-desc
    "x_bpe_pair_counts" -> ((s, dir) => {
      import graft.operators.Bpe
      Bpe.pairCounts(Bpe.initialVocab(Tables.documents(s, dir)))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(30)
    }),
    // ---- learned BPE merge table (16 rounds). Fully oracled: pair
    // counts are exact integers and the argmax tie-break is
    // (cnt desc, lhs, rhs), so the whole training loop replays in a
    // DuckDB recursive CTE — the working set carries the evolving
    // (syms, freq) vocabulary, each round re-aggregates pair counts
    // (DuckDB allows aggregates over the recursive reference) and
    // applies the greedy leftmost non-overlapping merge positionally
    // (odd-run-length parity — provably equal to the engine's fold).
    // Also pinned EXACTLY against the sequential learner in BpeSpec.
    "x_bpe_merges" -> ((s, dir) =>
      graft.operators.Bpe.mergesDf(s, bpeMergesFor(s, dir))),
    // ---- apply the learned tokenizer: per-source BPE-vs-whitespace
    // token totals via the codegen'd scan-stage encoder (no oracle —
    // encode is the iterative codec; distributed == reference encoder
    // law in BpeSpec, plus the compression-direction gate)
    // ---- trained quality filter, evaluation: confusion counts of the
    // learned logistic classifier vs its own training labels (integer
    // outputs; rows-only — 20 GD iterations aren't SQL; accuracy and
    // reference-parity gates live in QualityModelSpec)
    "x_quality_classifier_eval" -> ((s, dir) => {
      val model = qualityModelFor(s, dir)
      val docs = Tables.documents(s, dir).withColumn("label",
        (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.4).cast("int"))
      graft.operators.QualityModel.confusion(docs, "label", model)
    }),
    // ---- trained quality filter, apply side: per-source admit counts
    // under the scan-stage scorer (weights ride the plan as a literal —
    // no join, no shuffle, no model server)
    "x_quality_classifier_score" -> ((s, dir) => {
      val model = qualityModelFor(s, dir)
      Tables.documents(s, dir)
        .select(col("source"),
          graft.operators.QualityModel.score(col("text"), model).as("p"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("p") >= 0.5).cast("long")).as("n_admitted"),
          round(avg(col("p")), 3).as("avg_score"))
        .orderBy(col("source"))
    }),
    "x_bpe_encode_stats" -> ((s, dir) => {
      import graft.operators.Bpe
      Bpe.register(s)
      val merges = bpeMergesFor(s, dir)
      Tables.documents(s, dir)
        .select(col("source"),
          size(Bpe.encode(col("text"), merges)).cast("long").as("n_bpe"),
          graft.functions.TextFunctions.wsTokenCount(col("text")).as("n_ws"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe")).as("bpe_tokens"),
          sum(col("n_ws")).as("ws_tokens"))
        .orderBy(col("source"))
    }),
    // ---- tokenizer → packer integration: pack the corpus into
    // fixed-capacity training sequences by the LEARNED BPE tokenizer's
    // counts — the packer's prefix sum is token-definition-agnostic,
    // so the real tokenizer slots in where the oracle-checkable
    // whitespace count sat (rows-only; conservation law in BpeSpec)
    "x_pipeline_tokenize_pack" -> ((s, dir) => {
      import graft.operators.{Bpe, Pack}
      Bpe.register(s)
      val merges = bpeMergesFor(s, dir)
      Pack.packSequencesBy(Tables.documents(s, dir),
        size(Bpe.encode(col("text"), merges)).cast("long"), capacity = 2048)
    }),
    // ---- interpolated bigram LM: word-order-aware fluency signal
    // (separates shuffled token soup from fluent text — same unigram
    // score, different bigram score)
    "x_lm_bigram_nll" -> ((s, dir) =>
      graft.operators.LangModel.bigramNll(Tables.documents(s, dir), lambda = lmLambda)),
    // ---- intra-doc repetition: duplicate 3-gram fraction per document
    // (the Gopher-style "keeps repeating itself" curation signal)
    "x_text_repetition" -> ((s, dir) =>
      graft.operators.Quality.dupNgramStats(Tables.documents(s, dir))),
    // ---- composite curation ruleset report: per-rule flag counts +
    // survivors ("what would this ruleset drop?") in ONE corpus scan
    "x_quality_filter_report" -> ((s, dir) =>
      graft.operators.Quality.filterReport(Tables.documents(s, dir))),
    // ---- grouped top-k: best-quality docs per source (window rank,
    // score rounded before the cut)
    "x_quality_topk_per_source" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("q").desc, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("source"), col("rank"), col("doc_id"), col("q"))
        .orderBy(col("source"), col("rank"))
    }),
    // ---- range join: events inside each user's first-2h window —
    // point-in-interval via chunk-bucketed equi-join (a naive theta
    // join would be broadcast-nested-loop)
    "x_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        Tables.tsMillis(Tables.events(s, dir)).as("t"), col("value"))
      val intervals = ev.groupBy(col("user_id"))
        .agg(min(col("t")).as("w_start"))
        .withColumn("w_end", col("w_start") + lit(7200000L))
      graft.operators.RangeJoin.pointInInterval(ev, "t", intervals,
          "w_start", "w_end", Seq("user_id"), bucketMs = 3600000L)
        .groupBy(col("user_id"), col("w_start"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("user_id"))
    }),
    // ---- skew-salted join: events' 5-value event_type is the
    // pathological join key (a plain shuffle join lands ~20% of the
    // fact table on each of 5 reducers); the salted path spreads each
    // hot key over 16 (key, salt) buckets. Salting must not change
    // results, so the oracle is the PLAIN join
    "x_skew_join_salted" -> ((s, dir) => {
      import s.implicits._
      val rates = Seq(("click", 0.1), ("view", 0.05), ("purchase", 1.0),
        ("signup", 0.5), ("error", 0.0)).toDF("event_type", "rate")
      graft.operators.SkewJoin.saltedJoin(
          Tables.events(s, dir), rates, Seq("event_type"), saltOn = "event_id", salts = 16)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value") * col("rate")), 4).as("weighted_value"))
        .orderBy(col("event_type"))
    }),
    // ---- multimodal: binary payload column → batched (stub) decode →
    // typed features (no oracle — mapPartitions codec plumbing)
    // fully oracled: synthetic payloads are the docs' UTF-8 bytes (the
    // fixture is all-ASCII, so DuckDB's ord() sees the same byte
    // values), and the stub decode is plain byte arithmetic — width/
    // height from the first two bytes, brightness = mean byte value
    // (integer-valued sums => exact in both engines)
    "x_multimodal_decode" -> ((s, dir) => {
      import graft.operators.Multimodal
      val media = Multimodal.syntheticMedia(Tables.documents(s, dir))
      Multimodal.decodeImages(media)
        .select(col("media_id"), col("width"), col("height"),
          round(col("brightness"), 4).as("brightness"))
        .orderBy(col("media_id"))
    }),
    // ---- multimodal near-dup: perceptual-hash (aHash) the media
    // column (real decode where payloads are images, deterministic
    // stub fold otherwise), then Hamming-banded pair detection — a
    // recrawl batch duplicating 50 payloads under new ids must pair
    // with the originals (rows-only; hash laws + real-PNG invariance
    // in PhashSpec)
    "x_multimodal_phash_dups" -> ((s, dir) => {
      import graft.operators.Multimodal
      val docs = Tables.documents(s, dir)
      val media = Multimodal.syntheticMedia(docs)
      val recrawl = Multimodal.syntheticMedia(docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 300000L))
      Multimodal.phashNearDup(
          Multimodal.imageHashes(media.unionByName(recrawl)).toDF(),
          maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // ---- incremental multimodal dedup: a media batch (new docs + 50
    // recrawled payloads) probed against the PERSISTED perceptual-hash
    // index at batch cost — every recrawl must hit its original
    // (rows-only; family laws in PhashIndexSpec + StreamingChaosSpec)
    "x_dedup_incremental_phash" -> ((s, dir) => {
      import graft.operators.Multimodal
      val docs = Tables.documents(s, dir)
      val batch = docs.filter(col("doc_id") >= 250)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 300000L))
      phashIndexFor(s, dir)
        .probe(Multimodal.imageHashes(Multimodal.syntheticMedia(batch)).toDF(),
          maxHamming = 3)
        .orderBy(col("batch_id"), col("index_id"))
    }),
    // ---- audio near-dup off REAL decoded WAVs: 8 synthesized tones
    // each re-ingested at half gain under a new id — the gain-invariant
    // energy-envelope fingerprint must pair every copy with its
    // original and nothing else (rows-only; invariance laws and the
    // WAV synthesis are spec'd in PhashSpec)
    "x_multimodal_audio_dups" -> ((s, _) => {
      import graft.operators.Multimodal
      import graft.operators.Multimodal.MediaFile
      import s.implicits._
      val seeds = Seq(0x5a5a5a5a5a5a5a5aL, 0x0f0f0f0f0f0f0f0fL,
        0x3c3c3c3c3c3c3c3cL, 0x66aa66aa66aa66aaL, 0x1248124812481248L,
        0xf00ff00ff00ff00fL, 0x5555aaaa5555aaaaL, 0x7e7e7e7e7e7e7e7eL)
      val media = seeds.zipWithIndex.flatMap { case (seed, i) =>
        Seq(MediaFile(i.toLong, "audio", Multimodal.synthWav(seed), "orig"),
          MediaFile(i.toLong + 1000L, "audio",
            Multimodal.synthWav(seed, gainShift = 1), "recrawl"))
      } ++ Seq(0xdeadbeefcafeL, 0x123456789abcL).zipWithIndex.map { case (seed, i) =>
        MediaFile(i.toLong + 2000L, "audio", Multimodal.synthWav(seed), "single")
      }
      Multimodal.phashNearDup(
          Multimodal.audioHashes(media.toDS()).toDF()
            .withColumnRenamed("fp", "phash"), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // ---- incremental duplicate-cluster maintenance: the batch's
    // near-dup edges (in-batch pairs + batch-vs-history hits off the
    // persisted MinHash index) merge into the STORED assignment at
    // batch cost — CC runs over the batch's contracted edges, never
    // history's. Rows-only (minhash-derived); the exactness law
    // (incremental == one-shot CC over the union) is ClusterIndexSpec's
    "x_dedup_clusters_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val batch = docs.filter(col("doc_id") >= 250)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 200000L)
          .withColumn("text", concat(col("text"), lit(" recrawl"))))
      // ONE signing feeds both edge sources, under the INDEX's pinned
      // params (hard-coded literals would silently band under the
      // wrong parameters if the fixture build ever changed — the
      // exact mismatch the params accessor exists to prevent)
      val idx = minhashIndexFor(s, dir)
      val prm = idx.params
      val sigs = graft.Materialize.ephemeral(
        Dedup.minhashSignatures(batch, prm.n, prm.k))
      val cross = idx.neardupeSigned(sigs, minEstJaccard = 0.5)
        .select(col("batch_id").as("id_a"), col("index_id").as("id_b"))
      val inBatch = Dedup.minhashPairsFromSignatures(sigs,
          k = prm.k, bands = prm.bands, minEstJaccard = 0.5)
        .select(col("id_a"), col("id_b"))
      val ix = clusterIndexFor(s, dir)
      ix.append(cross.unionByName(inBatch))
      ix.survivors()
    }),
    // ---- per-domain curation: registrable-domain extraction over a
    // deterministic URL column synthesized from the documents table —
    // chosen so the suffix-heuristic OUTPUT is independently derivable
    // in SQL (domain == source.tld by construction), making both
    // queries hash-checked oracles of the parse+PSL logic rather than
    // rows-only demos
    "x_domain_stats" -> ((s, dir) =>
      graft.operators.Domains.domainStats(
        Tables.documents(s, dir).withColumn("url", synthUrl))),
    // per-domain cap (the RefinedWeb-style anti-boilerplate quota):
    // kept ids replay cross-engine because the per-domain order is
    // pseudoOrder's modular arithmetic, not RNG
    "x_domain_caps" -> ((s, dir) =>
      graft.operators.Domains.capPerDomain(
          Tables.documents(s, dir).withColumn("url", synthUrl), cap = 10)
        .select(col("doc_id")).orderBy(col("doc_id"))),
    // ---- WARC ingestion (ISO 28500, the Common-Crawl container):
    // per-type record counts + payload volume off the deterministic
    // fixture (plain + gzip twin — both transports through one read),
    // with the quarantine tally as its own row. Rows-only: a binary
    // record splitter has no DuckDB-expressible oracle; WarcSpec holds
    // the byte-exact contract.
    "x_source_warc" -> ((s, _) => {
      val (recs, quar) = graft.sources.Warc.readWithQuarantine(
        s, warcFixtureFor() + "/sample.warc*")
      recs.groupBy(col("warc_type"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("content_length")).as("payload_bytes"),
          countDistinct(col("url")).as("n_urls"))
        .unionByName(quar.agg(count(lit(1)).as("n_records"))
          .select(lit("__quarantined").as("warc_type"), col("n_records"),
            lit(0L).as("payload_bytes"), lit(0L).as("n_urls")))
        .orderBy(col("warc_type"))
    }),
    // ---- WARC → curation pipeline: the real entry point of a
    // Common-Crawl-style corpus — container split, payload decode,
    // tag-strip text extraction, exact dedup (collapses the gz twin's
    // byte-identical records), then the token/quality/langid stats of
    // the curation report. HASH-CHECKED: the fixture payloads are
    // literal, so the oracle reconstructs the post-extraction texts in
    // pure SQL (generate_series + repeat) and recomputes the same
    // report — fully independent of the Spark run.
    "x_pipeline_warc" -> ((s, _) => {
      val recs = graft.sources.Warc.read(s, warcFixtureFor() + "/sample.warc*")
      recs.filter(col("warc_type") === "response")
        .select(regexp_replace(decode(col("payload"), "ISO-8859-1"),
          "<[^>]*>", "").as("text"))
        .dropDuplicates("text")
        .agg(
          count(lit(1)).cast("double").as("n_docs"),
          sum(TextFunctions.wsTokenCount(col("text"))).cast("double").as("total_tokens"),
          sum(length(col("text"))).cast("double").as("total_chars"),
          sum(TextFunctions.punctCount(col("text"))).cast("double").as("total_punct"),
          round(avg(TextFunctions.qualityScore(col("text"))), 4).as("avg_quality"),
          countDistinct(TextFunctions.langId(col("text"))).cast("double").as("n_langs"))
    }),
  )

  /** Shared dense-grid CTE chain (DuckDB) mirroring [[denseGrid]] — the
    * four TS-analytics oracles extend it so the grid definition lives
    * in ONE place on each side.
    */
  private def denseGridSql: String =
    s"""WITH t AS (SELECT tag, "timestamp" // 60000 AS bucket FROM $FROM f
      |           WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 86400000L}
      |             AND tag IN ('click', 'error')),
      |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM t),
      |tags AS (SELECT DISTINCT tag FROM t),
      |grid AS (SELECT tag, unnest(range(lo, hi + 1)) AS bucket FROM tags, b),
      |c AS (SELECT tag, bucket, count(*) AS cnt FROM t GROUP BY 1, 2),
      |dense AS (SELECT g.tag, g.bucket * 60000 AS bucket_start,
      |                 CAST(coalesce(c.cnt, 0) AS DOUBLE) AS cnt
      |          FROM grid g LEFT JOIN c ON g.tag = c.tag AND g.bucket = c.bucket)""".stripMargin

  /** Daily twin of [[denseGridSql]]: the full-range all-tag dense
    * DAILY count grid (c as BIGINT — the seasonal/CUSUM oracles do
    * integer arithmetic on it).
    */
  private def dailyDenseSql: String =
    s"""WITH t AS (SELECT tag, "timestamp" // 86400000 AS bucket FROM $FROM f),
      |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM t),
      |tags AS (SELECT DISTINCT tag FROM t),
      |grid AS (SELECT tag, unnest(range(lo, hi + 1)) AS bucket FROM tags, b),
      |c AS (SELECT tag, bucket, count(*) AS cnt FROM t GROUP BY 1, 2),
      |dense AS (SELECT g.tag, g.bucket,
      |                 CAST(coalesce(c.cnt, 0) AS BIGINT) AS c
      |          FROM grid g LEFT JOIN c ON g.tag = c.tag AND g.bucket = c.bucket)""".stripMargin

  /** The Holt-Winters oracle: a recursive CTE folding (level, trend,
    * seas LIST) per tag over the daily series, with the new level
    * inlined wherever it is consumed (recursive terms cannot name
    * intermediates) via the [[hwLvl]] fragment.
    */
  private def hwOracleSql: String = {
    val D = "CAST(0.5 AS DOUBLE)"
    val Q = "CAST(0.25 AS DOUBLE)"
    val TQ = "CAST(0.75 AS DOUBLE)"
    val ph = "((i - 1) % 7) + 1" // 1-based seasonal slot of element i
    val sOld = s"seas[$ph]"
    // level' = alpha*(y_i - sOld) + (1-alpha)*(level + trend)
    val lvl = s"($D * (ys[i] - $sOld) + $D * (level + trend))"
    s"""WITH RECURSIVE base AS (
      |  SELECT tag, ("timestamp" // 86400000) * 86400000 AS day_ts,
      |         CAST(count(*) AS DOUBLE) AS value
      |  FROM $FROM t GROUP BY 1, 2
      |),
      |series AS (
      |  SELECT tag, list(value ORDER BY day_ts) AS ys
      |  FROM base GROUP BY tag HAVING count(*) >= 14
      |),
      |init AS (
      |  SELECT tag, ys,
      |    (ys[1] + ys[2] + ys[3] + ys[4] + ys[5] + ys[6] + ys[7]) / 7 AS mean1,
      |    (ys[8] + ys[9] + ys[10] + ys[11] + ys[12] + ys[13] + ys[14]) / 7 AS mean2
      |  FROM series
      |),
      |fold AS (
      |  SELECT tag, ys, 8 AS i, mean1 AS level, (mean2 - mean1) / 7 AS trend,
      |         [ys[1] - mean1, ys[2] - mean1, ys[3] - mean1, ys[4] - mean1,
      |          ys[5] - mean1, ys[6] - mean1, ys[7] - mean1] AS seas
      |  FROM init
      |  UNION ALL
      |  SELECT tag, ys, i + 1,
      |    $lvl,
      |    $Q * ($lvl - level) + $TQ * trend,
      |    list_concat(list_concat(
      |      list_slice(seas, 1, ($ph) - 1),
      |      [$Q * (ys[i] - $lvl) + $TQ * $sOld]),
      |      list_slice(seas, ($ph) + 1, 7))
      |  FROM fold WHERE i <= len(ys)
      |),
      |final AS (SELECT tag, ys, level, trend, seas FROM fold WHERE i = len(ys) + 1),
      |gapt AS (SELECT tag, day_ts - lag(day_ts) OVER (PARTITION BY tag ORDER BY day_ts) AS gap FROM base),
      |gaps AS (SELECT tag, list_sort(list(gap)) AS gs FROM gapt WHERE gap IS NOT NULL GROUP BY tag),
      |step AS (SELECT tag, CASE WHEN len(gs) % 2 = 1 THEN gs[len(gs)//2 + 1]
      |                          ELSE (gs[len(gs)//2] + gs[len(gs)//2 + 1]) // 2 END AS step_ms FROM gaps),
      |lastt AS (SELECT tag, max(day_ts) AS last_ts FROM base GROUP BY tag)
      |SELECT f.tag, CAST(h.h AS BIGINT) AS step, l.last_ts + h.h * s.step_ms AS ts,
      |       round(f.level + h.h * f.trend
      |             + f.seas[((len(f.ys) + h.h - 1) % 7) + 1], 4) AS yhat
      |FROM final f
      |JOIN step s USING (tag) JOIN lastt l USING (tag)
      |CROSS JOIN (SELECT range AS h FROM range(1, 8)) h
      |ORDER BY tag, step""".stripMargin
  }

  /** Shared oracle fragments for the PII/normalization queries — ONE
    * definition each (mirroring the factored Scala side), and the regex
    * patterns interpolate straight from [[graft.operators.Pii]] so the
    * two engines can never drift.
    */
  // NOTE: no line may BEGIN with "||" — this fragment is interpolated
  // into stripMargin'd strings, which would eat the first pipe
  private def piiInjSqlCte: String =
    """WITH inj AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 3 = 0 THEN ' contact u' || doc_id || '@example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309' ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.1.77' ELSE '' END AS text
      |  FROM documents)""".stripMargin

  private def piiCountSql(c: String, re: String): String =
    s"len(regexp_extract_all($c, '$re'))"

  private def redactSqlExpr(c: String): String = {
    import graft.operators.Pii
    s"""regexp_replace(
       |    regexp_replace(
       |      regexp_replace($c, '${Pii.emailRe}', '<EMAIL>', 'g'),
       |      '${Pii.phoneRe}', '<PHONE>', 'g'),
       |    '${Pii.ipv4Re}', '<IP>', 'g')""".stripMargin
  }

  private def normalizeSqlExpr(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[.,!?;:]', '', 'g'), ' +', ' ', 'g'))"

  /** The quality-score formula, ONE definition (no line starts with
    * "|" or "||" — safe to interpolate into stripMargin'd strings).
    */
  /** Shared pack-sequences oracle body over a doc source CTE/table
    * `src` (must expose doc_id, text) — used verbatim by
    * `x_pack_sequences` and composed by `x_pipeline_pack`, so the
    * packing SQL cannot drift between them.
    */
  private def packSeqSql(src: String, capacity: Int): String =
    s"""pk_d AS (SELECT doc_id, CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS toks FROM $src),
      |pk_c AS (SELECT doc_id, toks,
      |        CAST(sum(toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off FROM pk_d),
      |pk_s AS (SELECT doc_id, toks, end_off - toks AS start_off, end_off,
      |        unnest(generate_series((end_off - toks) // $capacity, (end_off - 1) // $capacity)) AS seq_id FROM pk_c)
      |SELECT CAST(seq_id AS BIGINT) AS seq_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(*) FILTER (WHERE start_off < seq_id * $capacity OR end_off > (seq_id + 1) * $capacity) AS BIGINT) AS n_split_docs,
      |       CAST(sum(least(end_off, (seq_id + 1) * $capacity) - greatest(start_off, seq_id * $capacity)) AS BIGINT) AS n_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM pk_s GROUP BY seq_id ORDER BY seq_id""".stripMargin

  private def qualitySqlExpr(c: String): String =
    s"round(least(1.0, (length($c) - length(replace($c, ' ', '')) + 1) / 100.0) " +
      s"* (1.0 - (length($c) - length(translate($c, '.,!?;:', ''))) / CAST(length($c) AS DOUBLE)) " +
      s"* (CASE WHEN (CAST(${stopHitsSql(c, graft.functions.TextFunctions.EN_STOP)} AS DOUBLE) " +
      s"/ (length($c) - length(replace($c, ' ', '')) + 1)) BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.5 END), 4)"

  /** Stopword-hit count and language-ID SQL forms ([[graft.functions
    * .TextFunctions.stopwordHits]]/[[graft.functions.TextFunctions
    * .langId]]) — the stopword lists interpolate from the Scala
    * constants so the engines can't drift.
    */
  private def stopHitsSql(c: String, words: Seq[String]): String =
    s"len(list_filter(string_split($c, ' '), w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))"

  private def langIdSqlExpr(c: String): String = {
    import graft.functions.TextFunctions.{EN_STOP, ES_STOP, FR_STOP}
    val (en, es, fr) = (stopHitsSql(c, EN_STOP), stopHitsSql(c, ES_STOP), stopHitsSql(c, FR_STOP))
    s"(CASE WHEN $en >= $es AND $en >= $fr THEN 'en' WHEN $es >= $fr THEN 'es' ELSE 'fr' END)"
  }

  /** Span-trim CTE chain over relation `src` (needs doc_id, text):
    * yields `tr(doc_id, text, toks, spans, kept)` — kept is the token
    * list with every qualifying duplicated span removed. ONE definition
    * ([[graft.operators.Dedup.trimDupSpans]]'s SQL form), shared by the
    * standalone trim oracle and pipeline v2 so the rewrite can't drift.
    */
  private def spanTrimSqlCtes(src: String): String =
    s"""t9 AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM $src),
       |g9 AS (SELECT doc_id,
       |        unnest(range(0, greatest(len(toks) - 5, 0) + 1)) AS pos,
       |        unnest(list_transform(range(0, greatest(len(toks) - 5, 0) + 1),
       |          i -> md5(array_to_string(toks[i+1:i+5], ' ')))) AS h FROM t9),
       |f9 AS (SELECT h, min(doc_id) <> max(doc_id) AS is_shared FROM g9 GROUP BY 1),
       |dp9 AS (SELECT g9.doc_id, g9.pos FROM g9 JOIN f9 USING (h) WHERE f9.is_shared),
       |i9 AS (SELECT doc_id, pos,
       |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dp9),
       |sp9 AS (SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
       |        FROM i9 GROUP BY doc_id, grp HAVING count(*) >= 2),
       |spl9 AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans FROM sp9 GROUP BY 1),
       |tr AS (SELECT t9.doc_id, t9.text, t9.toks, spl9.spans,
       |        CASE WHEN spl9.spans IS NULL THEN t9.toks
       |             ELSE list_filter(t9.toks, (tok, ix) ->
       |               len(list_filter(spl9.spans, sp2 -> ix - 1 >= sp2.s AND ix - 1 <= sp2.e)) = 0)
       |        END AS kept
       |       FROM t9 LEFT JOIN spl9 USING (doc_id))""".stripMargin

  /** The decontamination CTE chain (corpus/eval shingles → clean set),
    * shared by both pipeline oracles.
    */
  private def decontamSqlCtes: String =
    """WITH corpus AS (SELECT * FROM documents WHERE doc_id >= 20),
      |ev AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20),
      |ctoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
      |cs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
      |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM ctoks),
      |es AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
      |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM ev),
      |contaminated AS (SELECT DISTINCT doc_id FROM cs WHERE shingle IN (SELECT shingle FROM es)),
      |clean AS (SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))""".stripMargin

  /** The unigram-nll scoring CTEs ([[graft.operators.LangModel
    * .unigramNll]]'s SQL form), shared by both LM oracles so the score
    * definition can't drift between them.
    */
  private val lmNllSqlCtes: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
      |tot AS (SELECT count(*) AS n_total FROM t),
      |nll AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |               round(avg(-ln(CAST(v.cnt AS DOUBLE) / tot.n_total)), 4) AS nll
      |        FROM t JOIN v USING (tok), tot GROUP BY t.doc_id)""".stripMargin

  /** [[graft.operators.Sampling.pseudoOrder]]'s SQL form (same
    * reduce-before-multiply shape: overflow-free for every bigint id).
    */
  private def pseudoOrderSql(c: String): String =
    s"(($c % 1000000007) * 2654435761) % 1000000007"

  /** The x_sample_token_budget mix spec, defined ONCE; the oracle gets
    * the driver-computed integer quotas interpolated as literals (the
    * cut under test is the exclusive cumsum, not double floor()
    * associativity).
    */
  /** x_lm_bigram_nll's interpolation weight, defined ONCE: the oracle
    * interpolates BOTH constants from it (`1 - lmLambda` stringifies to
    * the exact double Spark computes — hardcoding "0.3" in SQL would be
    * one ULP off 1 - 0.7 and can flip a round(,4) at a tie).
    */
  private val lmLambda: Double = 0.7

  private val mixBudget: Long = 2000L
  /** x_sample_temperature's flattening exponent — interpolated into
    * BOTH the Spark call and the DuckDB oracle so the spec is defined
    * once (the mixQuotaValues discipline).
    */
  private val mixAlpha: Double = 0.5
  private val mixWeights: Seq[(String, Double)] =
    Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
  private def mixQuotaValues: String = {
    val wsum = mixWeights.map(_._2).sum
    mixWeights.map { case (g, w) =>
      s"('$g', ${math.floor(mixBudget * w / wsum).toLong})"
    }.mkString(", ")
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "a1_count_all" ->
      s"""SELECT CAST(count(*) AS DOUBLE) AS result FROM $FROM t""",
    "a1_sum_all" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t""",
    "a1_avg_all" ->
      s"""SELECT round(avg(value), 4) AS result FROM $FROM t""",
    "a1_min_all" ->
      s"""SELECT min(value) AS result FROM $FROM t""",
    "a1_max_all" ->
      s"""SELECT max(value) AS result FROM $FROM t""",
    "a2_range_collect" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE $range ORDER BY "timestamp", tag""",
    "f1_gt_le_collect" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE "timestamp" > $T1 AND "timestamp" <= $T2 ORDER BY "timestamp", tag""",
    "a3_tag_collect" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE tag = 'click' AND $range ORDER BY "timestamp", tag""",
    "a3_tag_pruned_collect" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE tag = 'click' AND $range ORDER BY "timestamp", tag""",
    "a1_meta_count_all" ->
      s"""SELECT CAST(count(*) AS DOUBLE) AS result FROM $FROM t""",
    "a1_meta_sum_window" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE $range""",
    "a1_meta_avg_boundary" ->
      s"""SELECT round(avg(value), 4) AS result FROM $FROM t WHERE "timestamp" >= ${T1 + 3600000L} AND "timestamp" < $T2""",
    "f1_lt_only_collect" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE "timestamp" < 1704240000000 ORDER BY "timestamp", tag""",
    "a4_point_tag_lookup" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE "timestamp" = $POINT_TS AND tag = 'error' ORDER BY "timestamp", tag""",
    "a4_point_lookup" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE "timestamp" = $POINT_TS ORDER BY "timestamp", tag""",
    "a4_point_pruned_lookup" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t WHERE "timestamp" = (SELECT min("timestamp") FROM $FROM t2) ORDER BY "timestamp", tag""",
    "f4_empty_group_elim" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 600000L} GROUP BY tag ORDER BY grp""",
    "g6_group_tag_avg" ->
      s"""SELECT tag AS grp, round(avg(value), 4) AS result FROM $FROM t WHERE $range GROUP BY tag ORDER BY grp""",
    "g6_group_tag_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE $range GROUP BY tag ORDER BY grp""",
    "g6_group_tag_min" ->
      s"""SELECT tag AS grp, min(value) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "g6_group_tag_max" ->
      s"""SELECT tag AS grp, max(value) AS result FROM $FROM t WHERE "timestamp" >= $T1 GROUP BY tag ORDER BY grp""",
    "g8_group_ts_min" ->
      s"""SELECT "timestamp" AS grp, min(value) AS result FROM $FROM t WHERE $range GROUP BY 1 ORDER BY grp LIMIT 500""",
    "g7_group_tag_tseq" ->
      s"""SELECT tag AS grp, round(sum(value), 4) AS result FROM $FROM t WHERE "timestamp" = $POINT_TS GROUP BY tag ORDER BY grp""",
    "g8_group_ts_sum_desc" ->
      s"""SELECT "timestamp" AS grp, round(sum(value), 4) AS result FROM $FROM t WHERE $range GROUP BY "timestamp" ORDER BY grp DESC LIMIT 500""",
    "g9_group_ts_tag" ->
      s"""SELECT "timestamp" AS grp, round(avg(value), 4) AS result FROM $FROM t WHERE tag = 'purchase' AND $range GROUP BY "timestamp" ORDER BY grp LIMIT 500""",
    "g10_group_ts_tseq" ->
      s"""SELECT "timestamp" AS grp, max(value) AS result FROM $FROM t WHERE "timestamp" = $POINT_TS GROUP BY "timestamp" ORDER BY grp""",
    "g11_scalar_filtered_sum" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE tag = 'view' AND $range""",
    "o1_l1_topk_recent" ->
      s"""SELECT "timestamp", tag, value FROM $FROM t ORDER BY "timestamp" DESC, tag LIMIT 1000""",
    "l2_group_limit" ->
      s"""SELECT "timestamp" AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t GROUP BY "timestamp" ORDER BY grp LIMIT 100""",
    "p2_key_projection" ->
      s"""SELECT "timestamp", tag FROM $FROM t WHERE $range ORDER BY "timestamp", tag""",
    "s1_insert_conflict_check" ->
      s"""SELECT CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE EXISTS (SELECT 1 FROM $FROM b WHERE b.tag = 'signup' AND b."timestamp" = t."timestamp" AND b.tag = t.tag)""",
    "s1_insert_apply_union" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM (SELECT * FROM $FROM t UNION ALL SELECT "timestamp" + $SHIFT, tag, value FROM $FROM t2) u GROUP BY tag ORDER BY grp""",
    "s2_update_apply" ->
      s"""SELECT tag AS grp, round(sum(CASE WHEN tag = 'click' THEN value * 2 ELSE value END), 4) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "s3_delete_apply" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE NOT (tag = 'error' AND $range) GROUP BY tag ORDER BY grp""",
    "x_json_extract_agg" ->
      """SELECT event_type AS grp,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) AS sum_k,
        |  CAST(count(props->>'$.k') AS DOUBLE) AS n_k
        |FROM events GROUP BY event_type ORDER BY grp""".stripMargin,
    "d1_distinct_exact" ->
      s"""SELECT CAST(count(DISTINCT tag) AS DOUBLE) AS n_tags, CAST(count(DISTINCT value) AS DOUBLE) AS n_values FROM $FROM t""",
    "d3_percentiles" ->
      s"""SELECT round(quantile_cont(value, 0.5), 4) AS p50, round(quantile_cont(value, 0.95), 4) AS p95 FROM $FROM t""",
    "ts2_li_group_tag_sum" ->
      s"""SELECT tag AS grp, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS result FROM ${Tables.tsLineitemOracleFrom} t GROUP BY tag ORDER BY grp""",
    "ts2_li_range_topk" ->
      s"""SELECT "timestamp", tag, value FROM ${Tables.tsLineitemOracleFrom} t WHERE "timestamp" >= 820454400000 AND "timestamp" < 883612800000 ORDER BY "timestamp" DESC, tag, value LIMIT 1000""",
    "ts2_li_group_ts_count" ->
      s"""SELECT "timestamp" AS grp, CAST(count(*) AS DOUBLE) AS result FROM ${Tables.tsLineitemOracleFrom} t WHERE "timestamp" >= 820454400000 AND "timestamp" < 883612800000 GROUP BY 1 ORDER BY grp LIMIT 500""",
    "ts3_cagg_group_tag_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE $range GROUP BY tag ORDER BY grp""",
    "ts3_cagg_group_tag_min" ->
      s"""SELECT tag AS grp, min(value) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "ts3_cagg_gt_bound_routed" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE "timestamp" > ${T1 - 1} AND "timestamp" <= ${T2 - 1} GROUP BY tag ORDER BY grp""",
    "ts3_cagg_scalar_sum" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE $range""",
    "ts3_cagg_hourly_group_tag_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t WHERE "timestamp" >= ${T1 + 21600000L} AND "timestamp" < ${T1 + 108000000L} GROUP BY tag ORDER BY grp""",
    "ts3_cagg_hourly_scalar_sum" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE "timestamp" >= ${T1 + 21600000L} AND "timestamp" < ${T1 + 108000000L}""",
    "ts3_cagg_window_6h" ->
      s"""SELECT ("timestamp" // 21600000) * 21600000 AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t GROUP BY 1, 2 ORDER BY window_start, tag""",
    "ts3_cagg_window_sliding" ->
      s"""SELECT window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM (
         |  SELECT tag, value, ("timestamp" // 43200000) * 43200000 AS window_start FROM $FROM t
         |  UNION ALL
         |  SELECT tag, value, ("timestamp" // 43200000) * 43200000 - 43200000 AS window_start FROM $FROM t2
         |) u GROUP BY 1, 2 ORDER BY window_start, tag""".stripMargin,
    "ts3_cagg_weekly_scalar_sum" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE "timestamp" >= 1704931200000 AND "timestamp" < 1706140800000""",
    "ts3_cagg_weekly_group_tag_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    // regression from raw events with the SAME integer moments and the
    // SAME float op order as answerRegression (C = 0: no ge bound)
    "ts3_cagg_regression_by_tag" ->
      // the engine anchors the fit on the SLICE minimum timestamp when
      // no lower bound is given (decimal-ceiling headroom, round-11
      // ADVICE #4): slope and r are exact integer identities in the
      // anchor (the centered num/denT cancel it), so only the
      // intercept term mirrors the centered st = Σt − n·c0 — c0 is
      // the GLOBAL slice min, shared by every tag group
      s"""WITH t AS (SELECT tag, CAST("timestamp" AS HUGEINT) AS t,
        |             CAST(round(value * 100) AS HUGEINT) AS v FROM $FROM f),
        |c AS (SELECT min(t) AS c0 FROM t),
        |m AS (SELECT tag, count(*) AS n, sum(t) AS st, sum(v) AS sv,
        |        sum(t * v) AS stv, sum(t * t) AS st2, sum(v * v) AS sv2
        |      FROM t GROUP BY tag)
        |SELECT tag AS grp,
        |  round(CASE WHEN n*st2 - st*st > 0
        |       THEN CAST(n*stv - st*sv AS DOUBLE) / CAST(n*st2 - st*st AS DOUBLE)
        |            / 100.0 * 86400000.0 END, 10) AS slope_per_day,
        |  round(CASE WHEN n*st2 - st*st > 0
        |       THEN CAST(sv AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)
        |            - (CAST(n*stv - st*sv AS DOUBLE) / CAST(n*st2 - st*st AS DOUBLE) / 100.0)
        |              * (CAST(st - n*c.c0 AS DOUBLE) / CAST(n AS DOUBLE)) END, 10) AS intercept,
        |  round(CASE WHEN n*st2 - st*st > 0 AND n*sv2 - sv*sv > 0
        |       THEN CAST(n*stv - st*sv AS DOUBLE)
        |            / sqrt(CAST(n*st2 - st*st AS DOUBLE) * CAST(n*sv2 - sv*sv AS DOUBLE))
        |       END, 10) AS r,
        |  n AS n_points
        |FROM m, c ORDER BY grp""".stripMargin,
    "ts3_cagg_hier_group_tag_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "ts3_cagg_hier_weekly_min" ->
      s"""SELECT tag AS grp, min(value) AS result FROM $FROM t WHERE "timestamp" >= 1704931200000 AND "timestamp" < 1706140800000 GROUP BY tag ORDER BY grp""",
    "ts3_cagg_realtime_scalar_sum" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < 1706054400000""",
    "ts3_cagg_realtime_group_tag_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "s7_asof_pre_tail" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS n, round(sum(value), 4) AS sum_v FROM $FROM t WHERE "timestamp" < $T2 GROUP BY tag ORDER BY grp""",
    "ts3_cagg_sql_group_tag_sum" ->
      s"""SELECT tag AS grp, round(sum(value), 4) AS result FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 3 * 86400000L} GROUP BY tag ORDER BY grp""",
    "ts3_cagg_sql_scalar_stats" ->
      s"""SELECT CAST(count(*) AS DOUBLE) AS cnt_r, round(sum(value), 4) AS sum_r, round(avg(value), 4) AS avg_r, min(value) AS min_r, max(value) AS max_r FROM $FROM t WHERE tag <> 'error'""",
    "ts3_cagg_sql_realtime_group_tag_sum" ->
      s"""SELECT tag AS grp, round(sum(value), 4) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "ts3_resolution_series" ->
      s"""SELECT $T1 + (("timestamp" - $T1) // ${68L * 3600000L}) * ${68L * 3600000L} AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t WHERE $range GROUP BY 1, 2 ORDER BY window_start, tag""",
    "ts3_meta_sql_scalar_stats" ->
      s"""SELECT CAST(count(*) AS DOUBLE) AS cnt_r, round(sum(value), 4) AS sum_r, round(avg(value), 4) AS avg_r, min(value) AS min_r, max(value) AS max_r FROM $FROM t""",
    "ts3_meta_sql_window_sum" ->
      s"""SELECT round(sum(value), 4) AS result FROM $FROM t WHERE $range""",
    "ts3_cagg_sql_window_1d" ->
      s"""SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t GROUP BY 1, 2 ORDER BY window_start, tag""",
    "ts3_cagg_sql_by_day_having" ->
      s"""SELECT ("timestamp" // 86400000) AS g_day, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t GROUP BY 1 HAVING count(*) > 10 ORDER BY g_day""",
    "ts3_cagg_sql_time_bucket" ->
      s"""SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t GROUP BY 1, 2 ORDER BY window_start, tag""",
    "ts3_cagg_sql_time_bucket_where" ->
      s"""SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t WHERE ("timestamp" // 86400000) * 86400000 >= $T1 AND ("timestamp" // 86400000) * 86400000 < ${T2 - 1} GROUP BY 1, 2 ORDER BY window_start, tag""",
    "ts3_cagg_sql_hop" ->
      s"""SELECT window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM (
        |  SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, value FROM $FROM t
        |  UNION ALL
        |  SELECT ("timestamp" // 86400000) * 86400000 - 86400000 AS window_start, tag, value FROM $FROM t
        |) GROUP BY window_start, tag ORDER BY window_start, tag""".stripMargin,
    "ts3_cagg_sql_hop_realtime" ->
      s"""SELECT window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM (
        |  SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, value FROM $FROM t
        |  UNION ALL
        |  SELECT ("timestamp" // 86400000) * 86400000 - 86400000 AS window_start, tag, value FROM $FROM t
        |) GROUP BY window_start, tag ORDER BY window_start, tag""".stripMargin,
    // the HTTP series route: sliding 2d/1d windows (each event in two
    // windows), body bounds post-filter WINDOW_START (the grid), not
    // event timestamps — the oracle mirrors that placement exactly
    "s5_http_ohlc" ->
      s"""SELECT ("timestamp" // ${2 * 86400000L}) * ${2 * 86400000L} AS window_start, tag,
         |  arg_min(value, "timestamp") AS open, max(value) AS high,
         |  min(value) AS low, arg_max(value, "timestamp") AS close
         |FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < $T2
         |GROUP BY 1, 2 ORDER BY window_start, tag""".stripMargin,
    "s5_http_window_series" ->
      s"""SELECT window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM (
        |  SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, value FROM $FROM t
        |  UNION ALL
        |  SELECT ("timestamp" // 86400000) * 86400000 - 86400000 AS window_start, tag, value FROM $FROM t
        |) WHERE window_start >= $T1 AND window_start < $T2
        |GROUP BY window_start, tag ORDER BY window_start, tag""".stripMargin,
    "ts3_cagg_time_weighted" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |s AS (SELECT tag, value,
        |        lead(t) OVER (PARTITION BY tag ORDER BY t) - t AS dt FROM t)
        |SELECT tag AS grp,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT) * dt) AS DOUBLE)
        |        / 100.0 / CAST(sum(dt) AS DOUBLE), 4) AS twa,
        |  count(*) + 1 AS n_points,
        |  CAST(sum(dt) AS BIGINT) AS span_ms
        |FROM s WHERE dt IS NOT NULL GROUP BY tag ORDER BY grp""".stripMargin,
    "ts3_cagg_counter_increase" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |c AS (SELECT tag, t,
        |        sum(CAST(round(value * 100) AS BIGINT))
        |          OVER (PARTITION BY tag ORDER BY t ROWS UNBOUNDED PRECEDING)
        |          % 1000000 AS counter FROM t),
        |d AS (SELECT tag, counter,
        |        lag(counter) OVER (PARTITION BY tag ORDER BY t) AS prev FROM c)
        |SELECT tag AS grp,
        |  CAST(sum(CASE WHEN counter >= prev THEN counter - prev
        |                ELSE counter END) AS DOUBLE) / 100.0 AS total_increase,
        |  CAST(sum(CASE WHEN counter < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |  count(*) + 1 AS n_points
        |FROM d WHERE prev IS NOT NULL GROUP BY tag ORDER BY grp""".stripMargin,
    // the SQL-spelled counter family shares the engine queries' raw
    // pair-walk oracles: same derivation, same column names, with
    // n_points spelled as the full per-tag event count (count(*) on
    // the Spark side ≡ pairs + 1 here)
    "ts3_cagg_sql_counter_increase" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |c AS (SELECT tag, t,
        |        sum(CAST(round(value * 100) AS BIGINT))
        |          OVER (PARTITION BY tag ORDER BY t ROWS UNBOUNDED PRECEDING)
        |          % 1000000 AS counter FROM t),
        |d AS (SELECT tag, counter,
        |        lag(counter) OVER (PARTITION BY tag ORDER BY t) AS prev FROM c)
        |SELECT tag AS grp,
        |  CAST(sum(CASE WHEN counter >= prev THEN counter - prev
        |                ELSE counter END) AS DOUBLE) / 100.0 AS total_increase,
        |  CAST(sum(CASE WHEN counter < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |  count(*) + 1 AS n_points
        |FROM d WHERE prev IS NOT NULL GROUP BY tag ORDER BY grp""".stripMargin,
    // rate = increase / span-seconds (identical division order to the
    // Spark side: inc / (span/1000) / 100, then round 6); delta =
    // last counter − first counter, reset-blind, via arg_max/arg_min
    "ts3_cagg_sql_rate" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |c AS (SELECT tag, t,
        |        sum(CAST(round(value * 100) AS BIGINT))
        |          OVER (PARTITION BY tag ORDER BY t ROWS UNBOUNDED PRECEDING)
        |          % 1000000 AS counter FROM t),
        |d AS (SELECT tag, t, counter,
        |        lag(counter) OVER (PARTITION BY tag ORDER BY t) AS prev FROM c)
        |SELECT tag AS grp,
        |  round(CAST(sum(CASE WHEN prev IS NULL THEN 0
        |                      WHEN counter >= prev THEN counter - prev
        |                      ELSE counter END) AS DOUBLE)
        |        / (CAST(max(t) - min(t) AS DOUBLE) / 1000.0) / 100.0, 6)
        |    AS rate_per_s,
        |  (CAST(arg_max(counter, t) AS DOUBLE)
        |   - CAST(arg_min(counter, t) AS DOUBLE)) / 100.0 AS delta
        |FROM d GROUP BY tag ORDER BY grp""".stripMargin,
    "ts3_cagg_sql_twa" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |s AS (SELECT tag, value,
        |        lead(t) OVER (PARTITION BY tag ORDER BY t) - t AS dt FROM t)
        |SELECT tag AS grp,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT) * dt) AS DOUBLE)
        |        / 100.0 / CAST(sum(dt) AS DOUBLE), 4) AS twa,
        |  count(*) + 1 AS n_points,
        |  CAST(sum(dt) AS BIGINT) AS span_ms
        |FROM s WHERE dt IS NOT NULL GROUP BY tag ORDER BY grp""".stripMargin,
    // the live-HTTP counter routes share the same pair-walk oracles
    "s5_http_increase" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |c AS (SELECT tag, t,
        |        sum(CAST(round(value * 100) AS BIGINT))
        |          OVER (PARTITION BY tag ORDER BY t ROWS UNBOUNDED PRECEDING)
        |          % 1000000 AS counter FROM t),
        |d AS (SELECT tag, counter,
        |        lag(counter) OVER (PARTITION BY tag ORDER BY t) AS prev FROM c)
        |SELECT tag AS grp,
        |  CAST(sum(CASE WHEN counter >= prev THEN counter - prev
        |                ELSE counter END) AS DOUBLE) / 100.0 AS total_increase,
        |  CAST(sum(CASE WHEN counter < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |  count(*) + 1 AS n_points
        |FROM d WHERE prev IS NOT NULL GROUP BY tag ORDER BY grp""".stripMargin,
    "s5_http_twa" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |s AS (SELECT tag, value,
        |        lead(t) OVER (PARTITION BY tag ORDER BY t) - t AS dt FROM t)
        |SELECT tag AS grp,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT) * dt) AS DOUBLE)
        |        / 100.0 / CAST(sum(dt) AS DOUBLE), 4) AS twa,
        |  count(*) + 1 AS n_points,
        |  CAST(sum(dt) AS BIGINT) AS span_ms
        |FROM s WHERE dt IS NOT NULL GROUP BY tag ORDER BY grp""".stripMargin,
    // the wire rate: same pair walk as ts3_cagg_sql_rate plus the
    // span/count columns the route reports; single-sample tags (span
    // 0) are omitted on the wire, hence the HAVING
    "s5_http_rate" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |c AS (SELECT tag, t,
        |        sum(CAST(round(value * 100) AS BIGINT))
        |          OVER (PARTITION BY tag ORDER BY t ROWS UNBOUNDED PRECEDING)
        |          % 1000000 AS counter FROM t),
        |d AS (SELECT tag, t, counter,
        |        lag(counter) OVER (PARTITION BY tag ORDER BY t) AS prev FROM c)
        |SELECT tag AS grp,
        |  round(CAST(sum(CASE WHEN prev IS NULL THEN 0
        |                      WHEN counter >= prev THEN counter - prev
        |                      ELSE counter END) AS DOUBLE)
        |        / (CAST(max(t) - min(t) AS DOUBLE) / 1000.0) / 100.0, 6)
        |    AS rate_per_s,
        |  (CAST(arg_max(counter, t) AS DOUBLE)
        |   - CAST(arg_min(counter, t) AS DOUBLE)) / 100.0 AS delta,
        |  CAST(max(t) - min(t) AS BIGINT) AS span_ms,
        |  count(*) AS n_points
        |FROM d GROUP BY tag HAVING max(t) > min(t) ORDER BY grp""".stripMargin,
    "ts3_cagg_frozen_history_count" ->
      s"""SELECT tag AS grp, CAST(count(*) AS DOUBLE) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "ts3_cagg_frozen_history_sum" ->
      s"""SELECT tag AS grp, round(sum(value), 4) AS result FROM $FROM t GROUP BY tag ORDER BY grp""",
    "ts3_cagg_ohlc_1d" ->
      s"""SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag,
         |  arg_min(value, "timestamp") AS open, max(value) AS high,
         |  min(value) AS low, arg_max(value, "timestamp") AS close
         |FROM $FROM t GROUP BY 1, 2 ORDER BY window_start, tag""".stripMargin,
    // gapfill oracles: rebuild the dense hourly grid from raw events.
    // locf = marked-window carry-forward; interp = the same exact
    // linear form the engine computes — integer counts make the
    // products exact, and (a·c)/(b·c) is the correctly-rounded result
    // of the same real ratio at any scaling, so hour-unit arithmetic
    // here bit-matches the engine's millisecond-unit arithmetic
    "ts3_cagg_gapfill_locf" ->
      s"""WITH obs AS (
         |  SELECT tag, "timestamp" // 3600000 AS b, CAST(count(*) AS DOUBLE) AS v
         |  FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 7 * 86400000L} GROUP BY 1, 2),
         |grid AS (
         |  SELECT t.tag, g.b FROM (SELECT DISTINCT tag FROM obs) t
         |  CROSS JOIN (SELECT unnest(generate_series(${T1 / 3600000L}, ${(T1 + 7 * 86400000L) / 3600000L - 1})) AS b) g),
         |dense AS (SELECT grid.tag, grid.b, obs.v FROM grid LEFT JOIN obs ON obs.tag = grid.tag AND obs.b = grid.b)
         |SELECT tag AS grp, b * 3600000 AS bucket_start,
         |  max(v) OVER (PARTITION BY tag, pb) AS result
         |FROM (SELECT tag, b, v,
         |        max(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb
         |      FROM dense) m
         |ORDER BY grp, bucket_start""".stripMargin,
    // the HTTP gapfill route densifies the same 7-day hour grid —
    // identical raw-events LOCF re-derivation
    "s5_http_gapfill_locf" ->
      s"""WITH obs AS (
         |  SELECT tag, "timestamp" // 3600000 AS b, CAST(count(*) AS DOUBLE) AS v
         |  FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 7 * 86400000L} GROUP BY 1, 2),
         |grid AS (
         |  SELECT t.tag, g.b FROM (SELECT DISTINCT tag FROM obs) t
         |  CROSS JOIN (SELECT unnest(generate_series(${T1 / 3600000L}, ${(T1 + 7 * 86400000L) / 3600000L - 1})) AS b) g),
         |dense AS (SELECT grid.tag, grid.b, obs.v FROM grid LEFT JOIN obs ON obs.tag = grid.tag AND obs.b = grid.b)
         |SELECT tag AS grp, b * 3600000 AS bucket_start,
         |  max(v) OVER (PARTITION BY tag, pb) AS result
         |FROM (SELECT tag, b, v,
         |        max(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb
         |      FROM dense) m
         |ORDER BY grp, bucket_start""".stripMargin,
    // the SQL gapfill spelling densifies the same 7-day hour grid —
    // identical raw-events LOCF / interpolation re-derivations
    "ts3_cagg_sql_gapfill_locf" ->
      s"""WITH obs AS (
         |  SELECT tag, "timestamp" // 3600000 AS b, CAST(count(*) AS DOUBLE) AS v
         |  FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 7 * 86400000L} GROUP BY 1, 2),
         |grid AS (
         |  SELECT t.tag, g.b FROM (SELECT DISTINCT tag FROM obs) t
         |  CROSS JOIN (SELECT unnest(generate_series(${T1 / 3600000L}, ${(T1 + 7 * 86400000L) / 3600000L - 1})) AS b) g),
         |dense AS (SELECT grid.tag, grid.b, obs.v FROM grid LEFT JOIN obs ON obs.tag = grid.tag AND obs.b = grid.b)
         |SELECT tag AS grp, b * 3600000 AS bucket_start,
         |  max(v) OVER (PARTITION BY tag, pb) AS result
         |FROM (SELECT tag, b, v,
         |        max(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb
         |      FROM dense) m
         |ORDER BY grp, bucket_start""".stripMargin,
    "ts3_cagg_sql_gapfill_interp" ->
      s"""WITH obs AS (
         |  SELECT tag, "timestamp" // 3600000 AS b, CAST(count(*) AS DOUBLE) AS v
         |  FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 7 * 86400000L} GROUP BY 1, 2),
         |grid AS (
         |  SELECT t.tag, g.b FROM (SELECT DISTINCT tag FROM obs) t
         |  CROSS JOIN (SELECT unnest(generate_series(${T1 / 3600000L}, ${(T1 + 7 * 86400000L) / 3600000L - 1})) AS b) g),
         |dense AS (SELECT grid.tag, grid.b, obs.v FROM grid LEFT JOIN obs ON obs.tag = grid.tag AND obs.b = grid.b),
         |marked AS (
         |  SELECT tag, b, v,
         |    max(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
         |    min(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
         |  FROM dense)
         |SELECT m.tag AS grp, m.b * 3600000 AS bucket_start,
         |  COALESCE(m.v, CASE WHEN m.pb IS NOT NULL AND m.nb IS NOT NULL THEN
         |    (p.v * (m.nb - m.b) + n.v * (m.b - m.pb)) / (m.nb - m.pb) END) AS result
         |FROM marked m
         |LEFT JOIN obs p ON p.tag = m.tag AND p.b = m.pb
         |LEFT JOIN obs n ON n.tag = m.tag AND n.b = m.nb
         |ORDER BY grp, bucket_start""".stripMargin,
    "ts3_cagg_gapfill_interp" ->
      s"""WITH obs AS (
         |  SELECT tag, "timestamp" // 3600000 AS b, CAST(count(*) AS DOUBLE) AS v
         |  FROM $FROM t WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 7 * 86400000L} GROUP BY 1, 2),
         |grid AS (
         |  SELECT t.tag, g.b FROM (SELECT DISTINCT tag FROM obs) t
         |  CROSS JOIN (SELECT unnest(generate_series(${T1 / 3600000L}, ${(T1 + 7 * 86400000L) / 3600000L - 1})) AS b) g),
         |dense AS (SELECT grid.tag, grid.b, obs.v FROM grid LEFT JOIN obs ON obs.tag = grid.tag AND obs.b = grid.b),
         |marked AS (
         |  SELECT tag, b, v,
         |    max(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
         |    min(CASE WHEN v IS NOT NULL THEN b END) OVER (PARTITION BY tag ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
         |  FROM dense)
         |SELECT m.tag AS grp, m.b * 3600000 AS bucket_start,
         |  COALESCE(m.v, CASE WHEN m.pb IS NOT NULL AND m.nb IS NOT NULL THEN
         |    (p.v * (m.nb - m.b) + n.v * (m.b - m.pb)) / (m.nb - m.pb) END) AS result
         |FROM marked m
         |LEFT JOIN obs p ON p.tag = m.tag AND p.b = m.pb
         |LEFT JOIN obs n ON n.tag = m.tag AND n.b = m.nb
         |ORDER BY grp, bucket_start""".stripMargin,
    "w1_tumbling_window_1d" ->
      s"""SELECT ("timestamp" // 86400000) * 86400000 AS window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM $FROM t GROUP BY 1, 2 ORDER BY window_start, tag""",
    "w2_sliding_window" ->
      s"""SELECT window_start, tag, CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val FROM (
         |  SELECT tag, value, ("timestamp" // 43200000) * 43200000 AS window_start FROM $FROM t
         |  UNION ALL
         |  SELECT tag, value, ("timestamp" // 43200000) * 43200000 - 43200000 AS window_start FROM $FROM t2
         |) u GROUP BY 1, 2 ORDER BY window_start, tag""".stripMargin,
    "x_domain_stats" ->
      """SELECT source || '.' || list_extract(['com','co.uk','org','com.au','net'], CAST(doc_id % 5 AS INT) + 1) AS domain,
        |  count(*) AS n_docs,
        |  count(DISTINCT doc_id % 23) AS n_hosts
        |FROM documents GROUP BY 1 ORDER BY domain""".stripMargin,
    "x_domain_caps" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY source || '.' || list_extract(['com','co.uk','org','com.au','net'], CAST(doc_id % 5 AS INT) + 1)
        |    ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id) AS rn
        |  FROM documents) t WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "x_text_stats" ->
      s"""SELECT doc_id,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
        |  length(text) - length(translate(text, '.,!?;:', '')) AS punct,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS rep_ratio,
        |  ${qualitySqlExpr("text")} AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_text_langid" ->
      """SELECT doc_id,
        |  CASE WHEN en >= es AND en >= fr THEN 'en' WHEN es >= fr THEN 'es' ELSE 'fr' END AS pred_lang,
        |  lang
        |FROM (SELECT doc_id, lang,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in','is','that'))) AS en,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que','y','en','los','se'))) AS es,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','et','les','des','un','une'))) AS fr
        |  FROM documents) s ORDER BY doc_id""".stripMargin,
    // replicates RollingHash's UTF-8-byte fold; valid because the
    // fixture text is pure ASCII (max codepoint 121 — codepoint == byte)
    "x_text_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(text)+1), i -> CAST(unicode(text[i]) AS BIGINT))),
        |  (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS DOUBLE) AS dup_count
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    // keep-best: DuckDB's arg_max takes only scalar orderings, so the
    // (rank, -id) lexicographic pair is encoded as rank·2^32 − id —
    // identical ordering to Spark's max_by(id, struct(rank, -id)) while
    // 0 ≤ id < 2^32 (fixture ids are small); longest wins, tie → min id
    "x_dedup_keep_best" ->
      s"""SELECT arg_max(doc_id, CAST(length(text) AS BIGINT) * 4294967296 - doc_id) AS keep_id,
        |  max(CAST(length(text) AS BIGINT)) AS keep_rank,
        |  CAST(count(*) AS DOUBLE) AS dup_count
        |FROM documents GROUP BY ${normalizeSqlExpr("text")}
        |ORDER BY keep_id""".stripMargin,
    "x_pipeline_quality_dedup" ->
      s"""WITH scored AS (SELECT doc_id, lang, text,
        |  ${qualitySqlExpr("text")} AS q
        |  FROM documents),
        |kept AS (SELECT * FROM scored WHERE q >= 0.3),
        |deduped AS (SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, arg_min(q, doc_id) AS q FROM kept GROUP BY text)
        |SELECT lang, CAST(count(*) AS DOUBLE) AS n_docs, round(avg(q), 4) AS avg_q
        |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin,
    // full reconstruction of the WARC fixture's record inventory
    // (literal content — SparkEntry.warcFixtureFor): per-type record
    // counts, payload byte volume (= Content-Length framing) and
    // distinct urls, doubled by the byte-identical .gz twin transport
    // (which doubles records but not the url set), plus the
    // one-torn-garbage-run-per-file quarantine tally — all recomputed
    // independently in SQL from the same literal spec
    "x_source_warc" ->
      """WITH recs AS (
        |  SELECT 'response' AS warc_type, i,
        |    length('<html>doc ' || i || ' ' || repeat('lorem ipsum ', CAST(i + 1 AS INT)) || '</html>') AS len
        |  FROM generate_series(0, 19) t(i)
        |  UNION ALL
        |  SELECT 'response', 20, length('binary-ish' || chr(13) || chr(10) || chr(13) || chr(10) || 'WARC/1.0' || chr(13) || chr(10) || 'not a header')
        |  UNION ALL
        |  SELECT 'request', 21, length('GET / HTTP/1.1')
        |  UNION ALL
        |  SELECT 'metadata', i, length('fetch-ms: ' || i) FROM generate_series(22, 25) t(i)
        |), both_files AS (
        |  SELECT * FROM recs UNION ALL SELECT * FROM recs
        |)
        |SELECT warc_type, CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(sum(len) AS BIGINT) AS payload_bytes,
        |  CAST(count(DISTINCT i) AS BIGINT) AS n_urls
        |FROM both_files GROUP BY warc_type
        |UNION ALL
        |SELECT '__quarantined', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |ORDER BY warc_type""".stripMargin,
    // full reconstruction of the WARC fixture's response payloads
    // (literal content — SparkEntry.warcFixtureFor): 20 generated
    // lorem docs + the fake-boundary record, tag-stripped and deduped
    // (the gz twin contributes only byte-identical duplicates), then
    // the same curation stats recomputed in pure SQL
    "x_pipeline_warc" ->
      s"""WITH resp AS (
        |  SELECT '<html>doc ' || i || ' ' || repeat('lorem ipsum ', CAST(i + 1 AS INT)) || '</html>' AS raw
        |  FROM generate_series(0, 19) t(i)
        |  UNION ALL
        |  SELECT 'binary-ish' || chr(13) || chr(10) || chr(13) || chr(10) || 'WARC/1.0' || chr(13) || chr(10) || 'not a header'
        |), docs AS (
        |  SELECT DISTINCT regexp_replace(raw, '<[^>]*>', '', 'g') AS text FROM resp
        |)
        |SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS DOUBLE) AS total_tokens,
        |  CAST(sum(length(text)) AS DOUBLE) AS total_chars,
        |  CAST(sum(length(text) - length(translate(text, '.,!?;:', ''))) AS DOUBLE) AS total_punct,
        |  round(avg(${qualitySqlExpr("text")}), 4) AS avg_quality,
        |  CAST(count(DISTINCT (CASE
        |    WHEN ${stopHitsSql("text", graft.functions.TextFunctions.EN_STOP)} >= ${stopHitsSql("text", graft.functions.TextFunctions.ES_STOP)}
        |     AND ${stopHitsSql("text", graft.functions.TextFunctions.EN_STOP)} >= ${stopHitsSql("text", graft.functions.TextFunctions.FR_STOP)} THEN 'en'
        |    WHEN ${stopHitsSql("text", graft.functions.TextFunctions.ES_STOP)} >= ${stopHitsSql("text", graft.functions.TextFunctions.FR_STOP)} THEN 'es'
        |    ELSE 'fr' END)) AS DOUBLE) AS n_langs
        |FROM docs""".stripMargin,
    "x_dedup_exact_digest" ->
      """SELECT sha256(text) AS digest, min(doc_id) AS keep_id,
        |  CAST(count(*) AS DOUBLE) AS dup_count
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin,
    "x_dedup_jaccard" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 200),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM d),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
        |          FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
        |FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    // clusters: the same exact-Jaccard pair derivation as
    // x_dedup_jaccard, then connected components as a recursive-CTE
    // transitive closure (UNION dedups the working set, so it
    // terminates) → min-label per node → min-id survivor + size per
    // component — an INDEPENDENT replay of the star-contraction CC
    "x_dedup_clusters" ->
      """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 200),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM d),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
        |          FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b
        |          FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (SELECT src AS id, src AS r FROM edges
        |          UNION
        |          SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT min(id) AS keep_id, CAST(count(*) AS DOUBLE) AS cluster_size
        |FROM comp GROUP BY component ORDER BY keep_id""".stripMargin,
    "x_dedup_ngram_frac" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(0, greatest(len(toks) - 5, 0) + 1),
        |         i -> md5(array_to_string(toks[i+1:i+5], ' ')))) AS h FROM d),
        |f AS (SELECT h, min(doc_id) <> max(doc_id) AS is_shared FROM g GROUP BY 1)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(*) FILTER (WHERE f.is_shared) AS BIGINT) AS n_dup,
        |       round(CAST(count(*) FILTER (WHERE f.is_shared) AS DOUBLE) / count(*), 4) AS dup_frac
        |FROM g JOIN f USING (h) GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_ngram_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(range(0, greatest(len(toks) - 5, 0) + 1)) AS pos,
        |        unnest(list_transform(range(0, greatest(len(toks) - 5, 0) + 1),
        |          i -> md5(array_to_string(toks[i+1:i+5], ' ')))) AS h FROM d),
        |f AS (SELECT h, min(doc_id) <> max(doc_id) AS is_shared FROM g GROUP BY 1),
        |dp AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (h) WHERE f.is_shared),
        |i AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dp)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
        |       CAST(max(pos) + 4 AS BIGINT) AS end_tok,
        |       CAST(count(*) AS BIGINT) AS n_shared_grams
        |FROM i GROUP BY doc_id, grp HAVING count(*) >= 2
        |ORDER BY doc_id, start_tok""".stripMargin,
    "x_dedup_span_trim" ->
      s"""WITH ${spanTrimSqlCtes("documents")}
        |SELECT doc_id,
        |       CASE WHEN spans IS NULL THEN text
        |            ELSE coalesce(array_to_string(kept, ' '), '') END AS trimmed_text,
        |       CASE WHEN spans IS NULL THEN 0 ELSE len(toks) - len(kept) END::BIGINT AS n_removed_tokens
        |FROM tr ORDER BY doc_id""".stripMargin,
    "x_neardup_embed_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM e a, e b WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(a.v, b.v), 4) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    "x_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  CAST(count(*) AS DOUBLE) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "x_join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS DOUBLE) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "x_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "x_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS t, event_type, value FROM events)
        |SELECT l.event_id, l.user_id, l.t, coalesce(r.t, -1) AS asof_time,
        |       coalesce(r.value, -1.0) AS asof_err_value
        |FROM (SELECT * FROM e WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id AND l.t >= r.t
        |ORDER BY l.event_id""".stripMargin,
    "x_pipeline_curation_v2" ->
      s"""$decontamSqlCtes,
        |${spanTrimSqlCtes("clean")},
        |tt AS (SELECT tr.doc_id, clean.source,
        |        CASE WHEN tr.spans IS NULL THEN tr.text
        |             ELSE coalesce(array_to_string(tr.kept, ' '), '') END AS trimmed_text
        |       FROM tr JOIN clean USING (doc_id)),
        |sized AS (SELECT doc_id, source, trimmed_text,
        |        CAST(length(trimmed_text) - length(translate(trimmed_text, ' ', '')) + 1 AS BIGINT) AS nt
        |       FROM tt
        |       WHERE length(trimmed_text) - length(translate(trimmed_text, ' ', '')) + 1 >= 30),
        |qv(source, quota) AS (VALUES $mixQuotaValues),
        |cm AS (SELECT sized.source, sized.doc_id, sized.nt, qv.quota,
        |        coalesce(sum(sized.nt) OVER (PARTITION BY sized.source
        |          ORDER BY ${pseudoOrderSql("sized.doc_id")}, sized.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |       FROM sized JOIN qv USING (source))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nt) AS BIGINT) AS sum_tokens
        |FROM cm WHERE cb < quota GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_pipeline_curation" ->
      s"""$decontamSqlCtes,
        |scored AS (SELECT doc_id, lang, text,
        |  ${qualitySqlExpr("text")} AS q
        |  FROM clean),
        |kept AS (SELECT * FROM scored WHERE q >= 0.3),
        |deduped AS (SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, arg_min(q, doc_id) AS q FROM kept GROUP BY text),
        |sampled AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY ${pseudoOrderSql("doc_id")}, doc_id) AS rn
        |  FROM deduped) t WHERE rn <= 30)
        |SELECT lang, CAST(count(*) AS DOUBLE) AS n_docs, round(avg(q), 4) AS avg_q
        |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin,
    "x_pipeline_pretrain" ->
      s"""$decontamSqlCtes,
        |red AS (SELECT doc_id, lang, ${redactSqlExpr("text")} AS text
        |  FROM clean),
        |scored AS (SELECT doc_id, lang, text,
        |  ${qualitySqlExpr("text")} AS q
        |  FROM red),
        |kept AS (SELECT * FROM scored WHERE q >= 0.3),
        |deduped AS (SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, arg_min(q, doc_id) AS q FROM kept
        |            GROUP BY ${normalizeSqlExpr("text")}),
        |assigned AS (SELECT lang, q,
        |  CASE WHEN ${pseudoOrderSql("doc_id")} % 100 < 80 THEN 'train'
        |       WHEN ${pseudoOrderSql("doc_id")} % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM deduped)
        |SELECT lang, split, CAST(count(*) AS DOUBLE) AS n_docs, round(avg(q), 4) AS avg_q
        |FROM assigned GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "x_tfidf_top_terms" ->
      """WITH t AS (SELECT lang AS grp, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT grp, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |ng AS (SELECT count(DISTINCT grp) AS n_groups FROM tf),
        |scored AS (SELECT grp, term,
        |             round(tf * ln(CAST(n_groups AS DOUBLE) / df), 4) AS score
        |           FROM tf JOIN dfq USING (term), ng),
        |ranked AS (SELECT grp, term, score,
        |             row_number() OVER (PARTITION BY grp ORDER BY score DESC, term) AS rank
        |           FROM scored)
        |SELECT grp, CAST(rank AS BIGINT) AS rank, term, score
        |FROM ranked WHERE rank <= 5 ORDER BY grp, rank""".stripMargin,
    "x_embed_norm_stats" ->
      """WITH j AS (SELECT d.lang,
        |  round(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x))), 4) AS nrm
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
        |SELECT lang, CAST(count(*) AS DOUBLE) AS n, round(avg(nrm), 4) AS avg_norm,
        |       min(nrm) AS min_norm, max(nrm) AS max_norm
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    "x_lm_unigram_nll" ->
      s"""$lmNllSqlCtes
        |SELECT doc_id AS id, n_tokens, nll FROM nll ORDER BY id""".stripMargin,
    "x_lm_filter_nll" ->
      s"""$lmNllSqlCtes,
        |cut AS (SELECT round(quantile_cont(nll, 0.90), 4) AS cut FROM nll)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN nll USING (doc_id), cut
        |WHERE nll.nll <= cut.cut ORDER BY d.doc_id""".stripMargin,
    "x_quality_filter_report" ->
      s"""WITH s AS (SELECT
        |  (length(text) - length(translate(text, ' ', '')) + 1 < 30) AS f_short,
        |  (${qualitySqlExpr("text")} < 0.3) AS f_qual,
        |  (round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |     / len(string_split(text, ' ')), 4) < 0.35) AS f_rep,
        |  (${langIdSqlExpr("text")} <> lang) AS f_lang
        |  FROM documents),
        |a AS (SELECT
        |  CAST(coalesce(sum(CASE WHEN f_short THEN 1 ELSE 0 END), 0) AS BIGINT) AS too_short,
        |  CAST(coalesce(sum(CASE WHEN f_qual THEN 1 ELSE 0 END), 0) AS BIGINT) AS low_quality,
        |  CAST(coalesce(sum(CASE WHEN f_rep THEN 1 ELSE 0 END), 0) AS BIGINT) AS repetitive,
        |  CAST(coalesce(sum(CASE WHEN f_lang THEN 1 ELSE 0 END), 0) AS BIGINT) AS lang_mismatch,
        |  CAST(coalesce(sum(CASE WHEN NOT (f_short OR f_qual OR f_rep OR f_lang) THEN 1 ELSE 0 END), 0) AS BIGINT) AS kept
        |  FROM s)
        |SELECT 'kept' AS rule, kept AS n_docs FROM a
        |UNION ALL SELECT 'lang_mismatch', lang_mismatch FROM a
        |UNION ALL SELECT 'low_quality', low_quality FROM a
        |UNION ALL SELECT 'repetitive', repetitive FROM a
        |UNION ALL SELECT 'too_short', too_short FROM a
        |ORDER BY rule""".stripMargin,
    "x_sample_token_budget" ->
      s"""WITH q(source, quota) AS (VALUES $mixQuotaValues),
        |d AS (SELECT source, doc_id,
        |        length(text) - length(translate(text, ' ', '')) + 1 AS nt FROM documents),
        |c AS (SELECT d.source, d.doc_id, d.nt, q.quota,
        |        coalesce(sum(d.nt) OVER (PARTITION BY d.source
        |          ORDER BY ${pseudoOrderSql("d.doc_id")}, d.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM d JOIN q USING (source))
        |SELECT source, doc_id, CAST(nt AS BIGINT) AS n_tokens FROM c
        |WHERE cb < quota ORDER BY source, doc_id""".stripMargin,
    "x_quality_drift" ->
      s"""WITH refq AS (SELECT ${qualitySqlExpr("text")} AS q FROM documents
        |      WHERE doc_id < 250 AND length(text) > 0),
        |newq AS (SELECT ${qualitySqlExpr("text")} AS q FROM documents
        |      WHERE doc_id >= 250 AND length(text) > 0),
        |refd AS (SELECT least(CAST(floor(q * 10) AS BIGINT), 9) AS band
        |      FROM refq WHERE q IS NOT NULL),
        |newd AS (SELECT least(CAST(floor(q * 10) AS BIGINT), 9) AS band
        |      FROM newq WHERE q IS NOT NULL),
        |refc AS (SELECT band, count(*) AS nr FROM refd GROUP BY band),
        |newc AS (SELECT band, count(*) AS nn FROM newd GROUP BY band),
        |spine AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS band),
        |j AS (SELECT s.band, coalesce(rc.nr, 0) AS n_ref, coalesce(nc.nn, 0) AS n_new
        |      FROM spine s LEFT JOIN refc rc USING (band) LEFT JOIN newc nc USING (band)),
        |p AS (SELECT band, n_ref, n_new,
        |        (CAST(n_ref AS DOUBLE) + 1) / (CAST(sum(n_ref) OVER () AS DOUBLE) + 10) AS pr,
        |        (CAST(n_new AS DOUBLE) + 1) / (CAST(sum(n_new) OVER () AS DOUBLE) + 10) AS pn
        |      FROM j)
        |SELECT band, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_new AS BIGINT) AS n_new,
        |  round((pn - pr) * ln(pn / pr), 4) AS psi
        |FROM p ORDER BY band""".stripMargin,
    // derived-weight mixture: counts exact; weights and their sum round
    // to 10 decimals in BOTH engines (DuckDB round = half away from
    // zero = HALF_UP for positives), so the quota arithmetic replays
    "x_sample_temperature" ->
      s"""WITH cnt AS (SELECT source,
        |        CAST(sum(length(text) - length(translate(text, ' ', '')) + 1) AS BIGINT) AS c
        |      FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt),
        |w AS (SELECT source, round(pow(CAST(c AS DOUBLE) / t, $mixAlpha), 10) AS w FROM cnt, tot),
        |ws AS (SELECT round(sum(w), 10) AS wsum FROM w),
        |q AS (SELECT source, CAST(floor($mixBudget * w / wsum) AS BIGINT) AS quota FROM w, ws),
        |d AS (SELECT source, doc_id,
        |        length(text) - length(translate(text, ' ', '')) + 1 AS nt FROM documents),
        |c2 AS (SELECT d.source, d.doc_id, d.nt, q.quota,
        |        coalesce(sum(d.nt) OVER (PARTITION BY d.source
        |          ORDER BY ${pseudoOrderSql("d.doc_id")}, d.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM d JOIN q USING (source))
        |SELECT source, doc_id, CAST(nt AS BIGINT) AS n_tokens FROM c2
        |WHERE cb < quota ORDER BY source, doc_id""".stripMargin,
    "x_quality_topk_per_source" ->
      s"""WITH s AS (SELECT source, doc_id, ${qualitySqlExpr("text")} AS q FROM documents),
        |r AS (SELECT source, doc_id, q,
        |        row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rank
        |      FROM s)
        |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, q
        |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    "x_search_bm25" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
        |       WHERE tok IN ('spark', 'hash', 'join') GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id,
        |       round(sum(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
        |                 * tf.tf * (1.2 + 1.0)
        |                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))), 4) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), st
        |GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "x_search_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
        |       WHERE tok IN ('spark', 'hash', 'join') GROUP BY 1, 2),
        |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |bm AS (SELECT tf.doc_id,
        |         round(sum(ln(1.0 + (st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
        |                   * tf.tf * (1.2 + 1.0)
        |                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))), 4) AS score
        |       FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id), st GROUP BY 1),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
        |        FROM bm ORDER BY score DESC, doc_id LIMIT 20),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |sc AS (SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 4) AS score
        |       FROM e, q WHERE e.vec_id <> 7),
        |vec AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY score DESC, vec_id) AS vec_rank
        |        FROM sc ORDER BY score DESC, vec_id LIMIT 20),
        |f AS (SELECT CAST(coalesce(lex.doc_id, vec.doc_id) AS BIGINT) AS doc_id,
        |        round(coalesce(CAST(1 AS DOUBLE) / (60 + lex.lex_rank), 0)
        |              + coalesce(CAST(1 AS DOUBLE) / (60 + vec.vec_rank), 0), 6) AS rrf,
        |        CAST(lex.lex_rank AS BIGINT) AS lex_rank,
        |        CAST(vec.vec_rank AS BIGINT) AS vec_rank
        |      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        |SELECT doc_id, rrf, lex_rank, vec_rank FROM f
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "x_bpe_pair_counts" ->
      """WITH w AS (SELECT tok AS word, count(*) AS freq
        |           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |           WHERE len(tok) > 0 GROUP BY 1),
        |s AS (SELECT list_concat(string_split(word, ''), ['</w>']) AS syms, freq FROM w),
        |p AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs, freq
        |      FROM s, unnest(range(1, len(syms))) AS t(i))
        |SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY 1, 2 ORDER BY cnt DESC, lhs, rhs LIMIT 30""".stripMargin,
    // BPE training replayed: the recursive working set is the evolving
    // (syms, freq) vocabulary; each round re-aggregates weighted pair
    // counts over it, picks argmax (cnt desc, lhs, rhs), and applies
    // the merge POSITIONALLY — position p contracts iff its pair
    // matches and the consecutive-match run ending at p has odd length
    // (equal to the engine's leftmost-non-overlapping fold; the merged
    // symbol can never re-pair with itself in the same round since
    // lhs||rhs ≠ lhs). Terminates early when the best count < 2, like
    // learnMerges' minPairFreq.
    "x_bpe_merges" ->
      """WITH RECURSIVE words AS (
        |  SELECT tok AS word, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE len(tok) > 0 GROUP BY 1),
        |init AS (SELECT list_concat(string_split(word, ''), ['</w>']) AS syms, freq FROM words),
        |step AS (
        |  SELECT 0 AS it, CAST(NULL AS VARCHAR) AS lhs, CAST(NULL AS VARCHAR) AS rhs,
        |         CAST(NULL AS BIGINT) AS cnt, syms, freq FROM init
        |  UNION ALL
        |  SELECT v.it + 1, m.lhs, m.rhs, m.cnt,
        |    (SELECT list_filter(list_transform(range(1, len(v.syms) + 1), p -> CASE
        |        WHEN p < len(v.syms) AND v.syms[p] = m.lhs AND v.syms[p+1] = m.rhs
        |             AND (p - coalesce(list_max(list_filter(range(1, p),
        |                   j -> NOT (j < len(v.syms) AND v.syms[j] = m.lhs AND v.syms[j+1] = m.rhs))), 0)) % 2 = 1
        |          THEN m.lhs || m.rhs
        |        WHEN p > 1 AND v.syms[p-1] = m.lhs AND v.syms[p] = m.rhs
        |             AND (p - 1 - coalesce(list_max(list_filter(range(1, p - 1),
        |                   j -> NOT (j < len(v.syms) AND v.syms[j] = m.lhs AND v.syms[j+1] = m.rhs))), 0)) % 2 = 1
        |          THEN NULL
        |        ELSE v.syms[p] END), s -> s IS NOT NULL)),
        |    v.freq
        |  FROM step v,
        |    (SELECT lhs, rhs, cnt FROM (
        |       SELECT p.pair[1] AS lhs, p.pair[2] AS rhs, CAST(sum(p.freq) AS BIGINT) AS cnt FROM (
        |         SELECT unnest(list_transform(range(1, len(syms)), i -> [syms[i], syms[i+1]])) AS pair, freq
        |         FROM step WHERE len(syms) >= 2) p
        |       GROUP BY 1, 2) c
        |     WHERE cnt >= 2 ORDER BY cnt DESC, lhs, rhs LIMIT 1) m
        |  WHERE v.it < 16
        |)
        |SELECT DISTINCT CAST(it - 1 AS BIGINT) AS rank, lhs, rhs, lhs || rhs AS merged, cnt
        |FROM step WHERE it >= 1 ORDER BY rank""".stripMargin,
    "x_url_canonical_dedup" ->
      """WITH u0 AS (SELECT doc_id,
        |        'http://w' || CAST((doc_id - doc_id % 2) % 23 AS VARCHAR)
        |          || '.s' || CAST((doc_id - doc_id % 2) % 17 AS VARCHAR)
        |          || list_extract(['.com','.co.uk','.org','.com.au','.net'],
        |               CAST((doc_id - doc_id % 2) % 5 AS INT) + 1)
        |          || '/p/' || CAST(doc_id - doc_id % 2 AS VARCHAR) AS url0
        |      FROM documents),
        |u AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN url0 || '?a=1&b=2'
        |        ELSE regexp_replace(url0, '^http://w', 'HTTP://W') || '?utm_source=feed&b=2&a=1#frag'
        |      END AS url FROM u0),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        |c2 AS (SELECT doc_id,
        |        regexp_extract(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS head,
        |        regexp_replace(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS tail
        |      FROM c1),
        |c3 AS (SELECT doc_id,
        |        regexp_replace(regexp_replace(lower(head), '^(http://[^:/]*):80$', '\1'),
        |          '^(https://[^:/]*):443$', '\1') AS headnp,
        |        regexp_replace(tail, '\?.*$', '') AS path,
        |        list_sort(list_filter(string_split(regexp_extract(tail, '\?(.*)$', 1), '&'),
        |          p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))) AS ps
        |      FROM c2),
        |c AS (SELECT doc_id, headnp || CASE WHEN len(ps) > 0
        |        THEN path || '?' || array_to_string(ps, '&') ELSE path END AS curl
        |      FROM c3)
        |SELECT curl, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_variants
        |FROM c GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "x_pipeline_gopher" ->
      """WITH d AS (SELECT doc_id, source, text FROM documents WHERE doc_id < 1000),
        |l0 AS (SELECT doc_id, ln FROM d, unnest(string_split(text, chr(10))) AS t(ln)
        |       WHERE ln <> ''),
        |lc AS (SELECT doc_id, ln, count(*) AS c FROM l0 GROUP BY 1, 2),
        |lf AS (SELECT doc_id, sum(c) AS n, sum(c * len(ln)) AS m,
        |         sum(c - 1) AS dups, sum((c - 1) * len(ln)) AS dupm
        |       FROM lc GROUP BY 1),
        |w0 AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS wsa FROM d),
        |wu AS (SELECT doc_id, i, wsa[i] AS word
        |       FROM w0, unnest(range(1, len(wsa) + 1)) AS t(i) WHERE wsa[i] <> ''),
        |wo AS (SELECT doc_id, word,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p FROM wu),
        |ws AS (SELECT doc_id, count(*) AS n_words, sum(len(word)) AS mass,
        |         sum(CASE WHEN regexp_matches(word, '[A-Za-z]') THEN 1 ELSE 0 END) AS alpha,
        |         count(DISTINCT CASE WHEN lower(word) IN
        |           ('the','be','to','of','and','that','have','with')
        |           THEN lower(word) END) AS stops
        |       FROM wo GROUP BY 1),
        |g2m AS (SELECT doc_id, max(c * gl) AS mass FROM
        |         (SELECT a.doc_id, a.word || ' ' || b.word AS g,
        |            len(a.word) + len(b.word) AS gl, count(*) AS c
        |          FROM wo a JOIN wo b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |          GROUP BY 1, 2, 3) GROUP BY 1),
        |g3m AS (SELECT doc_id, max(c * gl) AS mass FROM
        |         (SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c3.word AS g,
        |            len(a.word) + len(b.word) + len(c3.word) AS gl, count(*) AS c
        |          FROM wo a JOIN wo b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |                    JOIN wo c3 ON a.doc_id = c3.doc_id AND c3.p = a.p + 2
        |          GROUP BY 1, 2, 3) GROUP BY 1),
        |g5m AS (SELECT doc_id, sum(c * gl) AS mass FROM
        |         (SELECT a.doc_id,
        |            a.word || ' ' || b.word || ' ' || c3.word || ' ' || d4.word || ' ' || e5.word AS g,
        |            len(a.word) + len(b.word) + len(c3.word) + len(d4.word) + len(e5.word) AS gl,
        |            count(*) AS c
        |          FROM wo a JOIN wo b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |                    JOIN wo c3 ON a.doc_id = c3.doc_id AND c3.p = a.p + 2
        |                    JOIN wo d4 ON a.doc_id = d4.doc_id AND d4.p = a.p + 3
        |                    JOIN wo e5 ON a.doc_id = e5.doc_id AND e5.p = a.p + 4
        |          GROUP BY 1, 2, 3) WHERE c > 1 GROUP BY 1),
        |lt AS (SELECT doc_id, trim(ln) AS ln FROM (
        |   SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM d)
        |   WHERE trim(ln) <> ''),
        |ls AS (SELECT doc_id, count(*) AS n_lines,
        |         sum(CASE WHEN substr(ln, 1, 1) IN ('•', '-', '*') THEN 1 ELSE 0 END) AS bullets,
        |         sum(CASE WHEN ln LIKE '%…' OR ln LIKE '%...' THEN 1 ELSE 0 END) AS ell
        |       FROM lt GROUP BY 1),
        |sy AS (SELECT doc_id,
        |         (len(text) - len(replace(text, '#', '')))
        |         + (len(text) - len(replace(text, '…', '')))
        |         + (len(text) - len(replace(text, '...', ''))) // 3 AS syms FROM d),
        |sig AS (SELECT d.doc_id, d.source,
        |  coalesce(ws.n_words, 0) AS n_words,
        |  round(coalesce(CAST(lf.dups AS DOUBLE) / nullif(lf.n, 0), 0), 4) AS dup_line_frac,
        |  round(coalesce(CAST(lf.dupm AS DOUBLE) / nullif(lf.m, 0), 0), 4) AS dup_line_char_frac,
        |  round(coalesce(CAST(g2m.mass AS DOUBLE) / nullif(ws.mass, 0), 0), 4) AS top2,
        |  round(coalesce(CAST(g3m.mass AS DOUBLE) / nullif(ws.mass, 0), 0), 4) AS top3,
        |  round(least(1.0, coalesce(CAST(g5m.mass AS DOUBLE) / nullif(ws.mass, 0), 0)), 4) AS dup5,
        |  round(coalesce(CAST(ws.mass AS DOUBLE) / nullif(ws.n_words, 0), 0), 4) AS mwl,
        |  round(coalesce(CAST(sy.syms AS DOUBLE) / nullif(ws.n_words, 0), 0), 4) AS symr,
        |  round(coalesce(CAST(ls.bullets AS DOUBLE) / nullif(ls.n_lines, 0), 0), 4) AS bullf,
        |  round(coalesce(CAST(ls.ell AS DOUBLE) / nullif(ls.n_lines, 0), 0), 4) AS ellf,
        |  round(coalesce(CAST(ws.alpha AS DOUBLE) / nullif(ws.n_words, 0), 0), 4) AS alphaf,
        |  coalesce(ws.stops, 0) AS stops
        |FROM d LEFT JOIN lf USING (doc_id) LEFT JOIN ws USING (doc_id)
        |       LEFT JOIN g2m USING (doc_id) LEFT JOIN g3m USING (doc_id)
        |       LEFT JOIN g5m USING (doc_id) LEFT JOIN ls USING (doc_id)
        |       LEFT JOIN sy USING (doc_id))
        |SELECT source, CAST(count(*) AS DOUBLE) AS n_docs,
        |       CAST(sum(n_words) AS BIGINT) AS n_words_kept
        |FROM sig
        |WHERE dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
        |  AND top2 <= 0.20 AND top3 <= 0.18 AND dup5 <= 0.15
        |  AND n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
        |  AND symr <= 0.1 AND bullf <= 0.9 AND ellf <= 0.3
        |  AND alphaf >= 0.8 AND stops >= 1
        |GROUP BY source ORDER BY source""".stripMargin,
    "x_text_gopher_quality" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |w AS (SELECT doc_id, word FROM (
        |   SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word FROM d)
        |   WHERE word <> ''),
        |ws AS (SELECT doc_id, count(*) AS n_words, sum(len(word)) AS mass,
        |         sum(CASE WHEN regexp_matches(word, '[A-Za-z]') THEN 1 ELSE 0 END) AS alpha,
        |         count(DISTINCT CASE WHEN lower(word) IN
        |           ('the','be','to','of','and','that','have','with')
        |           THEN lower(word) END) AS stops
        |       FROM w GROUP BY 1),
        |l AS (SELECT doc_id, trim(ln) AS ln FROM (
        |   SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM d)
        |   WHERE trim(ln) <> ''),
        |ls AS (SELECT doc_id, count(*) AS n_lines,
        |         sum(CASE WHEN substr(ln, 1, 1) IN ('•', '-', '*') THEN 1 ELSE 0 END) AS bullets,
        |         sum(CASE WHEN ln LIKE '%…' OR ln LIKE '%...' THEN 1 ELSE 0 END) AS ell
        |       FROM l GROUP BY 1),
        |sy AS (SELECT doc_id,
        |         (len(text) - len(replace(text, '#', '')))
        |         + (len(text) - len(replace(text, '…', '')))
        |         + (len(text) - len(replace(text, '...', ''))) // 3 AS syms FROM d)
        |SELECT d.doc_id,
        |  coalesce(ws.n_words, 0) AS n_words,
        |  round(coalesce(CAST(ws.mass AS DOUBLE) / nullif(ws.n_words, 0), 0), 4) AS mean_word_len,
        |  round(coalesce(CAST(sy.syms AS DOUBLE) / nullif(ws.n_words, 0), 0), 4) AS symbol_word_ratio,
        |  round(coalesce(CAST(ls.bullets AS DOUBLE) / nullif(ls.n_lines, 0), 0), 4) AS bullet_line_frac,
        |  round(coalesce(CAST(ls.ell AS DOUBLE) / nullif(ls.n_lines, 0), 0), 4) AS ellipsis_line_frac,
        |  round(coalesce(CAST(ws.alpha AS DOUBLE) / nullif(ws.n_words, 0), 0), 4) AS alpha_word_frac,
        |  coalesce(ws.stops, 0) AS stop_word_hits
        |FROM d LEFT JOIN ws USING (doc_id) LEFT JOIN ls USING (doc_id)
        |       LEFT JOIN sy USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "x_text_repetition_gopher" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |l AS (SELECT doc_id, ln FROM d, unnest(string_split(text, chr(10))) AS t(ln)
        |      WHERE ln <> ''),
        |lc AS (SELECT doc_id, ln, count(*) AS c FROM l GROUP BY 1, 2),
        |lf AS (SELECT doc_id, sum(c) AS n, sum(c * len(ln)) AS m,
        |         sum(c - 1) AS dups, sum((c - 1) * len(ln)) AS dupm
        |       FROM lc GROUP BY 1),
        |w0 AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM d),
        |wu AS (SELECT doc_id, i, ws[i] AS word
        |       FROM w0, unnest(range(1, len(ws) + 1)) AS t(i) WHERE ws[i] <> ''),
        |wo AS (SELECT doc_id, word,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p FROM wu),
        |wm AS (SELECT doc_id, sum(len(word)) AS w_mass FROM wo GROUP BY 1),
        |g2 AS (SELECT a.doc_id, a.word || ' ' || b.word AS g,
        |         len(a.word) + len(b.word) AS gl
        |       FROM wo a JOIN wo b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
        |g2m AS (SELECT doc_id, max(c * gl) AS mass FROM
        |         (SELECT doc_id, g, gl, count(*) AS c FROM g2 GROUP BY 1, 2, 3)
        |        GROUP BY 1),
        |g3 AS (SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS g,
        |         len(a.word) + len(b.word) + len(c.word) AS gl
        |       FROM wo a JOIN wo b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |                 JOIN wo c ON a.doc_id = c.doc_id AND c.p = a.p + 2),
        |g3m AS (SELECT doc_id, max(c * gl) AS mass FROM
        |         (SELECT doc_id, g, gl, count(*) AS c FROM g3 GROUP BY 1, 2, 3)
        |        GROUP BY 1),
        |g5 AS (SELECT a.doc_id,
        |         a.word || ' ' || b.word || ' ' || c.word || ' ' || dd.word || ' ' || e.word AS g,
        |         len(a.word) + len(b.word) + len(c.word) + len(dd.word) + len(e.word) AS gl
        |       FROM wo a JOIN wo b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |                 JOIN wo c ON a.doc_id = c.doc_id AND c.p = a.p + 2
        |                 JOIN wo dd ON a.doc_id = dd.doc_id AND dd.p = a.p + 3
        |                 JOIN wo e ON a.doc_id = e.doc_id AND e.p = a.p + 4),
        |g5m AS (SELECT doc_id, sum(c * gl) AS mass FROM
        |         (SELECT doc_id, g, gl, count(*) AS c FROM g5 GROUP BY 1, 2, 3)
        |        WHERE c > 1 GROUP BY 1)
        |SELECT d.doc_id,
        |  round(coalesce(CAST(lf.dups AS DOUBLE) / nullif(lf.n, 0), 0), 4) AS dup_line_frac,
        |  round(coalesce(CAST(lf.dupm AS DOUBLE) / nullif(lf.m, 0), 0), 4) AS dup_line_char_frac,
        |  round(coalesce(CAST(g2m.mass AS DOUBLE) / nullif(wm.w_mass, 0), 0), 4) AS top_2gram_char_frac,
        |  round(coalesce(CAST(g3m.mass AS DOUBLE) / nullif(wm.w_mass, 0), 0), 4) AS top_3gram_char_frac,
        |  round(least(1.0, coalesce(CAST(g5m.mass AS DOUBLE) / nullif(wm.w_mass, 0), 0)), 4) AS dup_5gram_char_frac
        |FROM d LEFT JOIN lf USING (doc_id) LEFT JOIN wm USING (doc_id)
        |       LEFT JOIN g2m USING (doc_id) LEFT JOIN g3m USING (doc_id)
        |       LEFT JOIN g5m USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "x_text_line_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |l AS (SELECT doc_id, i AS pos, ls[i] AS line
        |      FROM d, unnest(range(1, len(ls) + 1)) AS t(i)),
        |b AS (SELECT md5(line) AS h FROM l WHERE len(line) > 0
        |      GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
        |k AS (SELECT doc_id, pos, line FROM l
        |      WHERE md5(line) NOT IN (SELECT h FROM b)),
        |r AS (SELECT doc_id, count(*) AS n_lines_kept,
        |        string_agg(line, chr(10) ORDER BY pos) AS text
        |      FROM k GROUP BY 1),
        |n AS (SELECT doc_id, len(ls) AS n_lines FROM d)
        |SELECT n.doc_id, md5(coalesce(r.text, '')) AS h,
        |       CAST(coalesce(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
        |       CAST(n.n_lines - coalesce(r.n_lines_kept, 0) AS BIGINT) AS n_lines_dropped
        |FROM n LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,
    "x_text_chunks" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
        |           FROM documents WHERE doc_id < 50),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n,
        |        unnest(range(0, 1 + CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS chunk_id
        |      FROM n)
        |SELECT doc_id, chunk_id, chunk_id * 48 + 1 AS tok_start,
        |       least(64, n - chunk_id * 48) AS n_toks,
        |       md5(array_to_string(list_slice(toks, chunk_id * 48 + 1,
        |           least(chunk_id * 48 + 64, n)), ' ')) AS h
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "x_epoch_shards" ->
      """WITH k AS (SELECT doc_id,
        |        ((doc_id % 1000000007) * 2654435761 + (1 % 1000000007) * 40503) % 1000000007 AS kk
        |      FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, kk, kk % 4 AS shard FROM k)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY kk, doc_id) AS BIGINT) AS pos,
        |       doc_id
        |FROM s ORDER BY shard, pos""".stripMargin,
    "x_lm_bigram_nll" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |u AS (SELECT tok, count(*) AS cu FROM t GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM t),
        |bp AS (SELECT doc_id,
        |         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS prev,
        |         unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS cur
        |       FROM d WHERE len(toks) >= 2),
        |bc AS (SELECT prev, cur, count(*) AS cb FROM bp GROUP BY 1, 2),
        |cx AS (SELECT prev, sum(cb) AS cc FROM bc GROUP BY 1)
        |SELECT bp.doc_id AS id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(-ln($lmLambda * CAST(bc.cb AS DOUBLE) / cx.cc
        |                     + ${1 - lmLambda} * CAST(u.cu AS DOUBLE) / tot.n_total)), 4) AS nll
        |FROM bp JOIN bc USING (prev, cur) JOIN cx USING (prev)
        |       JOIN u ON u.tok = bp.cur, tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, list_transform(range(0, greatest(len(t) - 3, 0) + 1),
        |         i -> array_to_string(t[i+1:i+3], ' ')) AS grams FROM toks)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_ngrams,
        |       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 4) AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "x_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS t, value FROM events),
        |iv AS (SELECT user_id, min(t) AS w_start, min(t) + 7200000 AS w_end
        |       FROM e GROUP BY user_id)
        |SELECT e.user_id, iv.w_start, count(*) AS n_events,
        |       round(sum(e.value), 4) AS sum_value
        |FROM e JOIN iv ON e.user_id = iv.user_id
        |               AND e.t >= iv.w_start AND e.t < iv.w_end
        |GROUP BY e.user_id, iv.w_start ORDER BY e.user_id""".stripMargin,
    "x_skew_join_salted" ->
      """WITH rates(event_type, rate) AS (VALUES
        |  ('click', 0.1), ('view', 0.05), ('purchase', 1.0),
        |  ('signup', 0.5), ('error', 0.0))
        |SELECT e.event_type, count(*) AS n,
        |       round(sum(e.value * r.rate), 4) AS weighted_value
        |FROM events e JOIN rates r USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "x_pii_detect" -> {
      import graft.operators.Pii
      s"""$piiInjSqlCte
        |SELECT doc_id,
        |  CAST(${piiCountSql("text", Pii.emailRe)} AS BIGINT) AS n_emails,
        |  CAST(${piiCountSql("text", Pii.phoneRe)} AS BIGINT) AS n_phones,
        |  CAST(${piiCountSql("text", Pii.ipv4Re)} AS BIGINT) AS n_ips,
        |  (${piiCountSql("text", Pii.emailRe)}
        |   + ${piiCountSql("text", Pii.phoneRe)}
        |   + ${piiCountSql("text", Pii.ipv4Re)}) > 0 AS has_pii
        |FROM inj ORDER BY doc_id""".stripMargin
    },
    "x_pii_redact" ->
      s"""$piiInjSqlCte
        |SELECT doc_id, md5(${redactSqlExpr("text")}) AS h
        |FROM inj ORDER BY doc_id""".stripMargin,
    "x_text_normalize" ->
      s"""SELECT doc_id, md5(${normalizeSqlExpr("text")}) AS h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_split_stratified" ->
      s"""WITH ranked AS (SELECT lang,
        |  ((row_number() OVER (PARTITION BY lang
        |      ORDER BY ${pseudoOrderSql("doc_id")}, doc_id) - 1) * 100)
        |    // count(*) OVER (PARTITION BY lang) AS bucket
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS DOUBLE) AS n_docs
        |FROM ranked GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    "x_token_vocab" ->
      """SELECT token, CAST(count(*) AS DOUBLE) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    "x_vocab_coverage" ->
      """WITH w AS (SELECT tok AS word, count(*) AS freq
        |           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |           WHERE len(tok) > 0 GROUP BY 1),
        |r AS (SELECT word, freq,
        |        row_number() OVER (ORDER BY freq DESC, word) AS rnk FROM w),
        |t AS (SELECT sum(freq) AS total FROM w),
        |ks AS (SELECT unnest([5, 10, 20, 40]) AS k)
        |SELECT CAST(k AS BIGINT) AS k,
        |       CAST((SELECT sum(freq) FROM r WHERE rnk <= k) AS BIGINT) AS covered_tokens,
        |       CAST(t.total AS BIGINT) AS total_tokens,
        |       round((SELECT sum(freq) FROM r WHERE rnk <= k) / CAST(t.total AS DOUBLE), 6) AS coverage
        |FROM ks, t ORDER BY k""".stripMargin,
    // exact top-k is the oracle; the Spark side reaches it through the
    // MG-candidates + recount plan, which is exact while the k-th count
    // clears the N/(capacity+1) retention bound (trivially true here:
    // capacity exceeds the fixture vocabulary)
    "x_heavy_hitters" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    // MG summaries are exact below capacity, and eval() sorts
    // (est desc, item asc) — the same total order as the row_number
    "x_heavy_hitters_by_source" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT source, token, count(*) AS cnt FROM t GROUP BY 1, 2),
        |r AS (SELECT source, token, cnt, row_number() OVER
        |        (PARTITION BY source ORDER BY cnt DESC, token) AS rank FROM c)
        |SELECT source, CAST(rank AS INT) AS rank, token, CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "x_dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50)
        |SELECT b.doc_id, sha256(b.text) AS digest
        |FROM batch b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents p
        |  WHERE p.doc_id < 250 AND sha256(p.text) = sha256(b.text))
        |ORDER BY b.doc_id""".stripMargin,
    // takedown semantics are a true set-minus (indexed MINUS tombstoned),
    // not a doc_id-range complement — robust even if a deleted text also
    // appeared under a still-indexed doc_id
    "x_dedup_delete" ->
      """WITH indexed AS (
        |  SELECT DISTINCT sha256(text) AS digest FROM documents WHERE doc_id < 250),
        |tomb AS (
        |  SELECT DISTINCT sha256(text) AS digest FROM documents WHERE doc_id < 50),
        |eff AS (
        |  SELECT digest FROM indexed WHERE digest NOT IN (SELECT digest FROM tomb)),
        |batch AS (
        |  SELECT doc_id + 300000 AS doc_id, text FROM documents WHERE doc_id < 100)
        |SELECT b.doc_id, sha256(b.text) AS digest
        |FROM batch b
        |WHERE sha256(b.text) NOT IN (SELECT digest FROM eff)
        |ORDER BY b.doc_id""".stripMargin,
    // concat-and-chunk packing: global token offsets via a window
    // cumsum (the oracle's corpus is small; the Spark side computes the
    // SAME prefix sum distributed — bucketed carry, no global window)
    "x_pack_sequences" ->
      s"""WITH ${packSeqSql("documents", 512)}""".stripMargin,
    // curate-then-pack: quality cut at the 20th percentile, survivors
    // packed — the pipeline that hands a trainer its sequence stream
    "x_pipeline_pack" ->
      s"""WITH scored AS (SELECT doc_id, text, ${qualitySqlExpr("text")} AS q FROM documents),
        |cutv AS (SELECT round(quantile_cont(q, 0.2), 4) AS c FROM scored),
        |kept AS (SELECT doc_id, text FROM scored, cutv WHERE q > c),
        |${packSeqSql("kept", 512)}""".stripMargin,
    // the materialized form: each sequence's text is its docs' token
    // slices joined in doc_id order (md5 witness; validated against an
    // independent whole-corpus chunk reconstruction)
    "x_pack_apply" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, toks, n,
        |        CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off FROM d),
        |s AS (SELECT doc_id, toks, end_off - n AS start_off, end_off,
        |        unnest(generate_series((end_off - n) // 512, (end_off - 1) // 512)) AS seq_id FROM c),
        |p AS (SELECT seq_id, doc_id, greatest(start_off, seq_id * 512) AS lo,
        |        least(end_off, (seq_id + 1) * 512) AS hi, start_off, toks FROM s)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, CAST(sum(hi - lo) AS BIGINT) AS n_tokens,
        |       md5(string_agg(array_to_string(toks[(lo - start_off + 1):(hi - start_off)], ' '), ' ' ORDER BY doc_id)) AS h
        |FROM p GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    "x_corpus_report" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS sum_tokens,
        |  round(avg(${qualitySqlExpr("text")}), 4) AS avg_quality,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "x_corpus_stats_incremental" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  round(CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS DOUBLE)
        |        / count(*), 4) AS avg_doc_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "x_epoch_shuffle" ->
      """WITH e AS (SELECT doc_id, unnest(range(0, 3)) AS epoch FROM documents),
        |k AS (SELECT epoch, doc_id,
        |        ((doc_id % 1000000007) * 2654435761 + (epoch % 1000000007) * 40503) % 1000000007 AS kk
        |      FROM e),
        |r AS (SELECT epoch, doc_id,
        |        row_number() OVER (PARTITION BY epoch ORDER BY kk, doc_id) AS rank FROM k)
        |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rank AS BIGINT) AS rank, doc_id
        |FROM r WHERE rank <= 20 ORDER BY epoch, rank""".stripMargin,
    "x_sample_weighted" ->
      s"""SELECT doc_id, source, n_chars,
        |  round(ln((CAST(${pseudoOrderSql("doc_id")} AS DOUBLE) + 1.0) / 1000000008.0)
        |        / CAST(n_chars AS DOUBLE), 10) AS wkey
        |FROM documents ORDER BY wkey DESC, doc_id LIMIT 50""".stripMargin,
    "x_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events),
        |s1 AS (SELECT user_id, min(t) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > s2.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage, 'view' AS stage_name, (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |) u ORDER BY stage""".stripMargin,
    // state_agg: LOCF time-in-state; lead/lag spelled identically;
    // count(dt) skips the null last-interval on both engines
    "x_state_agg" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events),
        |s AS (SELECT user_id, event_type, t,
        |        lead(t) OVER (PARTITION BY user_id ORDER BY t) - t AS dt,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY t) AS prev
        |      FROM e)
        |SELECT user_id, event_type AS state,
        |  CAST(coalesce(sum(dt), 0) AS BIGINT) AS duration_ms,
        |  count(dt) AS n_intervals,
        |  CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_entries
        |FROM s GROUP BY 1, 2 ORDER BY user_id, state""".stripMargin,
    // state transitions: lead() per user, (from,to) counts, one
    // row-normalizing division in the same operand order
    "x_state_transitions" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events),
        |s AS (SELECT event_type AS f,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY t) AS nxt
        |      FROM e),
        |g AS (SELECT f AS from_state, nxt AS to_state, count(*) AS n
        |      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_state), 4) AS p
        |FROM g ORDER BY from_state, to_state""".stripMargin,
    // live_ranges: the same break/running-range-id construction; range
    // ends are start-exclusive at +tol so adjacent ranges never touch
    "x_live_ranges" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
        |b AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 43200000
        |             THEN 1 ELSE 0 END AS brk FROM e),
        |r AS (SELECT user_id, t,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                       ROWS UNBOUNDED PRECEDING) AS range_id FROM b)
        |SELECT user_id, min(t) AS range_start,
        |       max(t) + 43200000 AS range_end, count(*) AS n_beats
        |FROM r GROUP BY user_id, range_id
        |ORDER BY user_id, range_start""".stripMargin,
    // peak concurrency: the oracle sweeps with ONE global running sum
    // (fine at oracle scale); the Spark side's bucketed two-phase form
    // is algebraically identical — day peak = max(day's running values,
    // carry-in at day start), ends (−1) sort before starts (+1) at ties
    "x_peak_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
        |b AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 43200000
        |             THEN 1 ELSE 0 END AS brk FROM e),
        |r AS (SELECT user_id, t,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                       ROWS UNBOUNDED PRECEDING) AS range_id FROM b),
        |iv AS (SELECT min(t) AS s, max(t) + 43200000 AS e2
        |       FROM r GROUP BY user_id, range_id),
        |ev AS (SELECT s AS t, 1 AS d FROM iv
        |       UNION ALL SELECT e2, -1 FROM iv),
        |run AS (SELECT t, d,
        |          sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS rsum
        |        FROM ev),
        |byday AS (SELECT t // 86400000 AS g_day, max(rsum) AS mx,
        |                 sum(d) AS sd, count(*) AS n FROM run GROUP BY 1),
        |c AS (SELECT g_day, mx, n,
        |        sum(sd) OVER (ORDER BY g_day ROWS UNBOUNDED PRECEDING) - sd AS carry
        |      FROM byday)
        |SELECT g_day * 86400000 AS day_start,
        |       CAST(greatest(mx, carry) AS BIGINT) AS peak,
        |       CAST(n AS BIGINT) AS n_changes
        |FROM c ORDER BY day_start""".stripMargin,
    // heartbeat_agg: the CASE (not least()) keeps the last beat's null
    // gap out of the sum on both engines — see TsAnalytics.heartbeatAgg
    "x_heartbeat_uptime" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
        |g AS (SELECT user_id, t,
        |        lead(t) OVER (PARTITION BY user_id ORDER BY t) - t AS gap FROM e),
        |a AS (SELECT user_id, count(*) AS n_beats,
        |        CAST(coalesce(sum(CASE WHEN gap > 43200000 THEN 1 ELSE 0 END), 0) + 1 AS BIGINT) AS n_ranges,
        |        CAST(coalesce(sum(CASE WHEN gap > 43200000 THEN 43200000 ELSE gap END), 0) + 43200000 AS BIGINT) AS uptime_ms,
        |        CAST(max(t) - min(t) + 43200000 AS BIGINT) AS span_ms
        |      FROM g GROUP BY user_id)
        |SELECT user_id, n_beats, n_ranges, uptime_ms, span_ms,
        |       span_ms - uptime_ms AS downtime_ms
        |FROM a ORDER BY user_id""".stripMargin,
    "x_retention_cohorts" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
        |c AS (SELECT user_id, min(t // 604800000) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, t // 604800000 AS bkt FROM e)
        |SELECT c.cohort * 604800000 AS cohort_start, a.bkt - c.cohort AS week_offset,
        |       count(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_start, week_offset""".stripMargin,
    "x_acf" -> (
      denseGridSql + """,
        |l AS (SELECT tag, cnt,
        |        lag(cnt, 1) OVER w AS lag_1, lag(cnt, 2) OVER w AS lag_2,
        |        lag(cnt, 3) OVER w AS lag_3, lag(cnt, 4) OVER w AS lag_4,
        |        lag(cnt, 5) OVER w AS lag_5
        |      FROM dense WINDOW w AS (PARTITION BY tag ORDER BY bucket_start))
        |SELECT tag, round(corr(cnt, lag_1), 4) AS acf_1, round(corr(cnt, lag_2), 4) AS acf_2,
        |       round(corr(cnt, lag_3), 4) AS acf_3, round(corr(cnt, lag_4), 4) AS acf_4,
        |       round(corr(cnt, lag_5), 4) AS acf_5
        |FROM l GROUP BY tag ORDER BY tag""".stripMargin),
    // band edges = rounded exact percentiles (Spark `percentile` and
    // DuckDB `quantile_cont` are the same linear interpolation — the d3
    // pairing); banding compares 4-decimal values on both sides
    "x_quality_deciles" -> {
      val cutDefs = (1 to 9)
        .map(i => s"round(quantile_cont(q, 0.$i), 4) AS c$i").mkString(", ")
      val bandExpr = (1 to 9)
        .map(i => s"(CASE WHEN q > c$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH scored AS (SELECT ${qualitySqlExpr("text")} AS q FROM documents),
        |cuts AS (SELECT $cutDefs FROM scored)
        |SELECT CAST($bandExpr AS BIGINT) AS decile,
        |       CAST(count(*) AS BIGINT) AS n_docs, round(avg(q), 4) AS avg_q,
        |       min(q) AS min_q, max(q) AS max_q
        |FROM scored, cuts GROUP BY 1 ORDER BY decile""".stripMargin
    },
    "x_group_percentiles" ->
      s"""SELECT tag AS grp, round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.95), 4) AS p95
        |FROM $FROM t GROUP BY tag ORDER BY grp""".stripMargin,
    "x_value_histogram" ->
      s"""SELECT CAST(floor(value / 5) AS BIGINT) AS bin,
        |       CAST(count(*) AS DOUBLE) AS cnt
        |FROM $FROM t GROUP BY 1 ORDER BY bin""".stripMargin,
    // new session when the inactivity gap REACHES 1h (Spark's session
    // range is [start, last+gap), end-exclusive)
    "x_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, value FROM events),
        |m AS (SELECT user_id, t, value,
        |        CASE WHEN lag(t) OVER w IS NULL
        |               OR t - lag(t) OVER w >= 3600000 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT user_id, t, value,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(t) AS session_start, max(t) + 3600000 AS session_end,
        |       CAST(count(*) AS DOUBLE) AS cnt, round(sum(value), 4) AS sum_val
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "x_gapfill_minutes" -> (
      denseGridSql + """
        |SELECT tag, bucket_start, cnt FROM dense
        |ORDER BY tag, bucket_start""".stripMargin),
    "x_moving_avg" -> (
      denseGridSql + """
        |SELECT tag, bucket_start, cnt,
        |       round(avg(cnt) OVER (PARTITION BY tag ORDER BY bucket_start
        |                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mavg
        |FROM dense ORDER BY tag, bucket_start""".stripMargin),
    // the same left fold over the same frame array: DuckDB list_reduce
    // inits at the first element, mirroring ewmaBounded's aggregate()
    // over the frame tail — weights are binary-exact doubles, so the
    // IEEE fold replays bit-for-bit
    "x_ewma_smooth" -> (
      denseGridSql + """
        |SELECT tag, bucket_start, cnt,
        |       round(list_reduce(l, (acc, x) -> acc * CAST(0.75 AS DOUBLE)
        |                                        + CAST(0.25 AS DOUBLE) * x), 4) AS ewma
        |FROM (SELECT tag, bucket_start, cnt,
        |        list(cnt) OVER (PARTITION BY tag ORDER BY bucket_start
        |                        ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
        |      FROM dense) f ORDER BY tag, bucket_start""".stripMargin),
    "x_bucket_delta" -> (
      denseGridSql + """
        |SELECT tag, bucket_start, cnt,
        |       cnt - coalesce(lag(cnt, 1) OVER (PARTITION BY tag ORDER BY bucket_start), 0) AS delta
        |FROM dense ORDER BY tag, bucket_start""".stripMargin),
    // LOCF time-weighted average: lead() spacing per tag, exact
    // HUGEINT numerator (mirrors the int128 sum), one double division
    // in the same operand order as the Spark side
    "x_time_weighted_avg" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |s AS (SELECT tag, value,
        |        lead(t) OVER (PARTITION BY tag ORDER BY t) - t AS dt FROM t)
        |SELECT tag,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT) * dt) AS DOUBLE)
        |        / 100.0 / CAST(sum(dt) AS DOUBLE), 4) AS twa,
        |  count(*) + 1 AS n_points,
        |  CAST(sum(dt) AS BIGINT) AS span_ms
        |FROM s WHERE dt IS NOT NULL GROUP BY tag ORDER BY tag""".stripMargin,
    // OHLC: arg_min/arg_max mirror min_by/max_by (per-tag timestamps
    // are unique, so the selection is well-defined); no rounding —
    // pure selections and exact min/max on the raw doubles
    "x_ohlc_daily" ->
      s"""SELECT tag, ("timestamp" // 86400000) * 86400000 AS bucket_start,
        |  arg_min(value, "timestamp") AS open, max(value) AS high,
        |  min(value) AS low, arg_max(value, "timestamp") AS close,
        |  count(*) AS n_ticks
        |FROM $FROM f GROUP BY 1, 2 ORDER BY tag, bucket_start""".stripMargin,
    // cross-tag correlation on the dense HOURLY grid over the full
    // range (same grid construction as denseGridSql, hourly + no tag
    // filter); Pearson r spelled covar/(sd*sd) to mirror the Spark
    // side's ANSI-safe form exactly; rounds to 4 like every co-moment
    // fold here
    "x_corr_pairs" ->
      s"""WITH t AS (SELECT tag, "timestamp" // 3600000 AS bucket FROM $FROM f),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM t),
        |tags AS (SELECT DISTINCT tag FROM t),
        |grid AS (SELECT tag, unnest(range(lo, hi + 1)) AS bucket FROM tags, b),
        |c AS (SELECT tag, bucket, count(*) AS cnt FROM t GROUP BY 1, 2),
        |dense AS (SELECT g.tag, g.bucket * 3600000 AS bucket_start,
        |                 CAST(coalesce(c.cnt, 0) AS DOUBLE) AS cnt
        |          FROM grid g LEFT JOIN c ON g.tag = c.tag AND g.bucket = c.bucket)
        |SELECT a.tag AS tag_a, b2.tag AS tag_b,
        |  round(covar_samp(a.cnt, b2.cnt)
        |        / NULLIF(stddev_samp(a.cnt) * stddev_samp(b2.cnt), 0), 4) AS r,
        |  count(*) AS n_buckets
        |FROM dense a JOIN dense b2 ON a.bucket_start = b2.bucket_start
        |                          AND a.tag < b2.tag
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // synthetic counter (running scaled sum mod 1e6) + PromQL reset
    // arithmetic, all integer until the final /100 — the window frames
    // are spelled ROWS UNBOUNDED PRECEDING to match Spark's exactly
    "x_counter_rate" ->
      s"""WITH t AS (SELECT tag, "timestamp" AS t, value FROM $FROM f),
        |c AS (SELECT tag, t,
        |        sum(CAST(round(value * 100) AS BIGINT))
        |          OVER (PARTITION BY tag ORDER BY t ROWS UNBOUNDED PRECEDING)
        |          % 1000000 AS counter FROM t),
        |d AS (SELECT tag, counter,
        |        lag(counter) OVER (PARTITION BY tag ORDER BY t) AS prev FROM c)
        |SELECT tag,
        |  CAST(sum(CASE WHEN counter >= prev THEN counter - prev
        |                ELSE counter END) AS DOUBLE) / 100.0 AS total_increase,
        |  CAST(sum(CASE WHEN counter < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |  count(*) + 1 AS n_points
        |FROM d WHERE prev IS NOT NULL GROUP BY tag ORDER BY tag""".stripMargin,
    // linear interpolation: same marked-window (pb/nb) + join-back
    // formulation as the Spark side; ALL value arithmetic in scaled
    // integers (1e-4 units, half-up = floor((2·num+den)/(2·den)) on
    // the positive fixture) because float round(x,4) is not
    // cross-engine stable within an ulp of a .00005 boundary — the
    // only doubles are the final exact /10000 casts => bit-identical
    "x_interp_linear" ->
      s"""WITH t AS (SELECT tag, "timestamp" // 60000 AS bucket, value FROM $FROM f
        |           WHERE "timestamp" >= $T1 AND "timestamp" < ${T1 + 86400000L}),
        |obs AS (SELECT tag, bucket,
        |          (2 * CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) * 100
        |           + count(*)) // (2 * count(*)) AS v
        |        FROM t GROUP BY 1, 2),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM t),
        |tags AS (SELECT DISTINCT tag FROM t),
        |grid AS (SELECT tag, unnest(range(lo, hi + 1)) AS bucket FROM tags, b),
        |dense AS (SELECT g.tag, g.bucket, obs.v
        |          FROM grid g LEFT JOIN obs ON g.tag = obs.tag AND g.bucket = obs.bucket),
        |m AS (SELECT tag, bucket, v,
        |        max(CASE WHEN v IS NOT NULL THEN bucket END)
        |          OVER (PARTITION BY tag ORDER BY bucket
        |                ROWS UNBOUNDED PRECEDING) AS pb,
        |        min(CASE WHEN v IS NOT NULL THEN bucket END)
        |          OVER (PARTITION BY tag ORDER BY bucket
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |      FROM dense)
        |SELECT m.tag, m.bucket * 60000 AS bucket_start,
        |  CASE WHEN m.v IS NOT NULL THEN 'obs'
        |       WHEN m.pb IS NULL OR m.nb IS NULL THEN 'edge'
        |       ELSE 'interp' END AS src,
        |  CAST(coalesce(m.v,
        |    CASE WHEN m.pb IS NOT NULL AND m.nb IS NOT NULL THEN
        |      (2 * (p.v * (m.nb - m.bucket) + n.v * (m.bucket - m.pb))
        |       + (m.nb - m.pb)) // (2 * (m.nb - m.pb))
        |    END, -10000) AS DOUBLE) / 10000.0 AS val
        |FROM m LEFT JOIN obs p ON m.tag = p.tag AND m.pb = p.bucket
        |       LEFT JOIN obs n ON m.tag = n.tag AND m.nb = n.bucket
        |ORDER BY m.tag, bucket_start""".stripMargin,
    // STL-lite decomposition on the dense DAILY grid: trend rounds
    // half-up in integer space (positive, so // == Spark div); the
    // detrended values go negative, so seasonal/residual stay single
    // IEEE divisions of exact integers in mirrored operand order
    "x_seasonal_decompose" -> (
      dailyDenseSql + s""",
        |trended AS (SELECT tag, bucket, c, c * 10000 AS c4,
        |    sum(c * 10000) OVER w7 AS s_win, count(*) OVER w7 AS n_win
        |  FROM dense
        |  WINDOW w7 AS (PARTITION BY tag ORDER BY bucket
        |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dd AS (SELECT tag, bucket, c, c4,
        |    (2 * s_win + 7) // (2 * 7) AS t4,
        |    c4 - ((2 * s_win + 7) // (2 * 7)) AS det4,
        |    bucket % 7 AS phase
        |  FROM trended WHERE n_win = 7),
        |seas AS (SELECT tag, phase,
        |    CAST(sum(det4) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 10000.0 AS seasonal
        |  FROM dd GROUP BY 1, 2)
        |SELECT dd.tag, dd.bucket * 86400000 AS bucket_start,
        |  CAST(dd.c AS DOUBLE) AS cnt,
        |  CAST(dd.t4 AS DOUBLE) / 10000.0 AS trend,
        |  seas.seasonal,
        |  CAST(dd.det4 AS DOUBLE) / 10000.0 - seas.seasonal AS residual
        |FROM dd JOIN seas ON dd.tag = seas.tag AND dd.phase = seas.phase
        |ORDER BY dd.tag, bucket_start""".stripMargin),
    // CUSUM first-split: integer prefix sums of deviations from the
    // half-up integer mean; peak row by min-bucket tie-break; empty
    // segments coalesce to the same -1 sentinel as the Spark side
    "x_cusum_change" -> (
      dailyDenseSql + s""",
        |wm AS (SELECT tag, bucket, c,
        |    (2 * sum(c * 10000) OVER (PARTITION BY tag)
        |     + count(*) OVER (PARTITION BY tag))
        |    // (2 * count(*) OVER (PARTITION BY tag)) AS mean4
        |  FROM dense),
        |s AS (SELECT tag, bucket, c, mean4,
        |    sum(c * 10000 - mean4) OVER (PARTITION BY tag ORDER BY bucket
        |                                 ROWS UNBOUNDED PRECEDING) AS s4
        |  FROM wm),
        |peak AS (SELECT tag, max(abs(s4)) AS peak4 FROM s GROUP BY 1),
        |change AS (SELECT s.tag, min(bucket) AS cb, min(mean4) AS mean4,
        |    min(peak.peak4) AS peak4
        |  FROM s JOIN peak ON s.tag = peak.tag AND abs(s.s4) = peak.peak4
        |  GROUP BY 1),
        |seg AS (SELECT s.tag,
        |    sum(CASE WHEN s.bucket <= change.cb THEN s.c END) AS lsum,
        |    sum(CASE WHEN s.bucket <= change.cb THEN 1 END) AS ln,
        |    sum(CASE WHEN s.bucket > change.cb THEN s.c END) AS rsum,
        |    sum(CASE WHEN s.bucket > change.cb THEN 1 END) AS rn,
        |    count(*) AS n_points
        |  FROM s JOIN change ON s.tag = change.tag GROUP BY 1)
        |SELECT change.tag, change.cb * 86400000 AS change_bucket_start,
        |  CAST(sc.s4 AS DOUBLE) / 10000.0 AS s_at_change,
        |  CAST(change.peak4 AS DOUBLE) / 10000.0 AS peak_abs_s,
        |  CAST(change.mean4 AS DOUBLE) / 10000.0 AS mean,
        |  coalesce(CAST(seg.lsum AS DOUBLE) / CAST(seg.ln AS DOUBLE), -1.0) AS left_mean,
        |  coalesce(CAST(seg.rsum AS DOUBLE) / CAST(seg.rn AS DOUBLE), -1.0) AS right_mean,
        |  seg.n_points
        |FROM change JOIN seg ON change.tag = seg.tag
        |JOIN s sc ON sc.tag = change.tag AND sc.bucket = change.cb
        |ORDER BY change.tag""".stripMargin),
    // the Holt (level, trend) feedback recurrence replayed as a DuckDB
    // RECURSIVE CTE — one iteration per daily bucket (~30/tag), every
    // input integer-exact and every weight a binary-exact double, so
    // the IEEE fold matches Spark's flatMapGroups fold bit-for-bit.
    // (list_reduce can't carry the pair: DuckDB 1.0 struct accumulators
    // alias updated fields across iterations — measured, not guessed.)
    // Init mirrors holtLinear: level=y1, trend=y2-y1, first update
    // consumes y2; median gap uses the same integer even-count rule.
    "x_forecast_holt" ->
      s"""WITH RECURSIVE base AS (
        |  SELECT tag, ("timestamp" // 86400000) * 86400000 AS day_ts,
        |         CAST(count(*) AS DOUBLE) AS value
        |  FROM $FROM t GROUP BY 1, 2
        |),
        |series AS (
        |  SELECT tag, list(value ORDER BY day_ts) AS ys
        |  FROM base GROUP BY tag HAVING count(*) >= 2
        |),
        |fold AS (
        |  SELECT tag, ys, 2 AS i, CAST(ys[1] AS DOUBLE) AS level,
        |         CAST(ys[2] - ys[1] AS DOUBLE) AS trend
        |  FROM series
        |  UNION ALL
        |  SELECT tag, ys, i + 1,
        |         CAST(0.5 AS DOUBLE) * ys[i] + CAST(0.5 AS DOUBLE) * (level + trend),
        |         CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * ys[i]
        |           + CAST(0.5 AS DOUBLE) * (level + trend)) - level)
        |           + CAST(0.75 AS DOUBLE) * trend
        |  FROM fold WHERE i <= len(ys)
        |),
        |final AS (SELECT tag, level, trend FROM fold WHERE i = len(ys) + 1),
        |gapt AS (SELECT tag, day_ts - lag(day_ts) OVER (PARTITION BY tag ORDER BY day_ts) AS gap FROM base),
        |gaps AS (SELECT tag, list_sort(list(gap)) AS gs FROM gapt WHERE gap IS NOT NULL GROUP BY tag),
        |step AS (SELECT tag, CASE WHEN len(gs) % 2 = 1 THEN gs[len(gs)//2 + 1]
        |                          ELSE (gs[len(gs)//2] + gs[len(gs)//2 + 1]) // 2 END AS step_ms FROM gaps),
        |lastt AS (SELECT tag, max(day_ts) AS last_ts FROM base GROUP BY tag)
        |SELECT f.tag, CAST(h.h AS BIGINT) AS step, l.last_ts + h.h * s.step_ms AS ts,
        |       round(f.level + h.h * f.trend, 4) AS yhat
        |FROM final f
        |JOIN step s USING (tag) JOIN lastt l USING (tag)
        |CROSS JOIN (SELECT range AS h FROM range(1, 6)) h
        |ORDER BY tag, step""".stripMargin,
    // additive Holt-Winters: the same recursive-CTE replay as
    // x_forecast_holt, with the 7-slot seasonal state carried as a
    // LIST column (rebuilt by slicing around the active phase each
    // iteration). level' appears inlined in trend'/seas' — a recursive
    // term cannot name intermediates. Every weight is a binary-exact
    // double and the op order mirrors Forecast.holtWinters exactly.
    "x_forecast_hw" -> hwOracleSql,
    // LTTB replayed: bucket index ranges and next-bucket averages
    // precompute OUTSIDE the recursion (integer boundary arithmetic +
    // one rounded mean — deterministic doubles); the recursion carries
    // one row per tag holding the previous pick and selects each
    // bucket's point by a correlated argmax ordered (area desc,
    // position) = the kernel's strict-> ties-earliest rule. threshold
    // 100 ⇒ 98 interior buckets; first/last points pass through.
    "x_downsample_lttb" -> (
      denseGridSql.replace("WITH t AS", "WITH RECURSIVE t AS") + """,
        |pts AS (SELECT tag, CAST(bucket_start AS DOUBLE) AS x, cnt AS y,
        |        row_number() OVER (PARTITION BY tag ORDER BY bucket_start) - 1 AS i,
        |        count(*) OVER (PARTITION BY tag) AS n
        |        FROM dense),
        |buckets AS (
        |  SELECT p.tag, b.b, 1 + b.b*(p.n-2)//98 AS lo, 1 + (b.b+1)*(p.n-2)//98 AS hi,
        |         CASE WHEN b.b+1 < 98 THEN 1 + (b.b+1)*(p.n-2)//98 ELSE p.n-1 END AS nlo,
        |         CASE WHEN b.b+1 < 98 THEN 1 + (b.b+2)*(p.n-2)//98 ELSE p.n END AS nhi
        |  FROM (SELECT tag, max(n) AS n FROM pts GROUP BY tag) p,
        |       (SELECT unnest(range(0, 98)) AS b) b),
        |navg AS (SELECT b.tag, b.b, b.lo, b.hi, sum(p.x)/(b.nhi-b.nlo) AS ax, sum(p.y)/(b.nhi-b.nlo) AS ay
        |         FROM buckets b JOIN pts p ON p.tag = b.tag AND p.i >= b.nlo AND p.i < b.nhi
        |         GROUP BY b.tag, b.b, b.lo, b.hi, b.nhi, b.nlo),
        |sel AS (
        |  SELECT tag, CAST(-1 AS BIGINT) AS b, x AS px, y AS py FROM pts WHERE i = 0
        |  UNION ALL
        |  SELECT u.tag, u.b, u.pick.x AS px, u.pick.y AS py FROM (
        |    SELECT s.tag, s.b + 1 AS b,
        |      (SELECT struct_pack(x := p.x, y := p.y) FROM pts p, navg a
        |        WHERE p.tag = s.tag AND a.tag = s.tag AND a.b = s.b + 1
        |          AND p.i >= a.lo AND p.i < a.hi
        |        ORDER BY abs((s.px - a.ax)*(p.y - s.py) - (s.px - p.x)*(a.ay - s.py)) DESC, p.i
        |        LIMIT 1) AS pick
        |    FROM sel s WHERE s.b + 1 < 98
        |  ) u),
        |lastp AS (SELECT tag, x, y FROM pts WHERE i = n - 1),
        |allout AS (SELECT tag, px AS x, py AS y FROM sel
        |           UNION ALL
        |           SELECT tag, x, y FROM lastp)
        |SELECT tag, CAST(x AS BIGINT) AS "timestamp", y AS value
        |FROM allout ORDER BY tag, 2""".stripMargin),
    "x_anomaly_zscore" -> (
      denseGridSql + """,
        |stats AS (SELECT tag, bucket_start, cnt,
        |            round(avg(cnt) OVER w, 4) AS mavg,
        |            round(stddev_samp(cnt) OVER w, 4) AS sd
        |          FROM dense
        |          WINDOW w AS (PARTITION BY tag ORDER BY bucket_start
        |                       ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
        |SELECT tag, bucket_start, cnt, mavg, sd,
        |       round((cnt - mavg) / sd, 4) AS z
        |FROM stats
        |WHERE sd IS NOT NULL AND sd > 0 AND abs(round((cnt - mavg) / sd, 4)) >= 2.0
        |ORDER BY tag, bucket_start""".stripMargin),
    "x_rollup_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(count(*) AS DOUBLE) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "x_cube_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(count(*) AS DOUBLE) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    // layout changes results not at all — a plain join IS the oracle
    "x_bucketed_join" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(count(*) AS DOUBLE) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY priority""".stripMargin,
    "x_pivot_order_status" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_o,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_f,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_p
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin,
    "x_decontaminate" ->
      """WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id >= 20),
        |ev AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20),
        |cs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM corpus),
        |es AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM ev),
        |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY 1),
        |hits AS (SELECT doc_id, count(*) AS n_overlap FROM cs
        |         WHERE shingle IN (SELECT shingle FROM es) GROUP BY 1)
        |SELECT h.doc_id, h.n_overlap, s.n_shingles,
        |       round(CAST(h.n_overlap AS DOUBLE) / s.n_shingles, 4) AS overlap_frac
        |FROM hits h JOIN sizes s USING (doc_id) ORDER BY doc_id""".stripMargin,
    "x_decontaminate_by_source" ->
      """WITH corpus AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents WHERE doc_id >= 20),
        |ev AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20),
        |cs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM corpus),
        |es AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle FROM ev),
        |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY 1),
        |hits AS (SELECT doc_id, count(*) AS n_overlap FROM cs
        |         WHERE shingle IN (SELECT shingle FROM es) GROUP BY 1),
        |fl AS (SELECT h.doc_id, h.n_overlap, s.n_shingles
        |       FROM hits h JOIN sizes s USING (doc_id))
        |SELECT c.source, CAST(count(*) AS BIGINT) AS n_contaminated,
        |       round(CAST(sum(fl.n_overlap) AS DOUBLE) / sum(fl.n_shingles), 4) AS overlap_rate
        |FROM fl JOIN corpus c USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_sample_quota" ->
      s"""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY ${pseudoOrderSql("doc_id")}, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 50 ORDER BY doc_id""".stripMargin,
    // tolerance mirror: latest-prior is also latest-within-tolerance
    // (older rows are farther), so rn=1 over the tolerance-bounded join
    // matches the engine's "match, then null if out of tolerance"
    "x_asof_join_tol" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS t, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id, t, value FROM e WHERE event_type = 'error'),
        |m AS (SELECT l.event_id, r.t AS rt, r.value AS rv,
        |        row_number() OVER (PARTITION BY l.event_id
        |                           ORDER BY r.t DESC, r.value DESC) AS rn
        |      FROM l JOIN r ON l.user_id = r.user_id
        |        AND l.t >= r.t AND l.t - r.t <= 3600000)
        |SELECT l.event_id, l.user_id, l.t,
        |       coalesce(m.rt, -1) AS asof_time,
        |       coalesce(m.rv, -1.0) AS asof_err_value
        |FROM l LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
        |ORDER BY l.event_id""".stripMargin,
    "x_ann_topk_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (SELECT q.query_id, e.vec_id, round(list_cosine_similarity(e.v, q.qv), 4) AS score
        |           FROM e, q WHERE e.vec_id <> q.query_id),
        |ranked AS (SELECT query_id, vec_id, score,
        |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        |           FROM scored)
        |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // int8 path: replay the symmetric quantization — q_i =
    // round(127·x/max|x|), widened back to DOUBLE — then the same
    // cosine/rank/round-4 pipeline as the float brute. All dot/norm
    // inputs are small exact integers, so the scores agree bit-for-bit
    // before the round.
    "x_ann_topk_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
        |q8 AS (SELECT e.vec_id,
        |         CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS DOUBLE))
        |              ELSE list_transform(v, x -> CAST(CAST(round(x * 127.0 / m) AS TINYINT) AS DOUBLE)) END AS qv
        |       FROM e JOIN mx USING (vec_id)),
        |qq AS (SELECT vec_id AS query_id, qv AS qqv FROM q8 WHERE vec_id < 10),
        |scored AS (SELECT qq.query_id, c.vec_id, round(list_cosine_similarity(c.qv, qq.qqv), 4) AS score
        |           FROM q8 c, qq WHERE c.vec_id <> qq.query_id),
        |ranked AS (SELECT query_id, vec_id, score,
        |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        |           FROM scored)
        |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // MMR greedy replay: the operator rounds every marginal score to 6
    // decimals BEFORE each (score desc, vec_id) argmax, so the greedy
    // recursion is engine-independent — one recursive working row
    // carries the selected list; the correlated argmax subquery appears
    // three times (vec_id / score / append) because a recursive term
    // cannot name intermediates. rel ≡ 1.0 ⇒ first pick = min vec_id
    // at score λ·1 = 0.5.
    "x_sample_mmr" ->
      """WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib, list_cosine_similarity(a.v, b.v) AS sim
        |         FROM e a, e b WHERE a.vec_id <> b.vec_id),
        |sel AS (
        |  SELECT CAST(0 AS BIGINT) AS rank, (SELECT min(vec_id) FROM e) AS vec_id,
        |         CAST(0.5 AS DOUBLE) AS score, [(SELECT min(vec_id) FROM e)] AS chosen
        |  UNION ALL
        |  SELECT s.rank + 1,
        |    (SELECT c.vec_id FROM e c WHERE NOT list_contains(s.chosen, c.vec_id)
        |     ORDER BY round(0.5 - 0.5 * (SELECT max(sim) FROM sims WHERE ia = c.vec_id AND list_contains(s.chosen, ib)), 6) DESC, c.vec_id
        |     LIMIT 1),
        |    (SELECT round(0.5 - 0.5 * (SELECT max(sim) FROM sims WHERE ia = c.vec_id AND list_contains(s.chosen, ib)), 6)
        |     FROM e c WHERE NOT list_contains(s.chosen, c.vec_id)
        |     ORDER BY 1 DESC, c.vec_id LIMIT 1),
        |    list_append(s.chosen,
        |      (SELECT c.vec_id FROM e c WHERE NOT list_contains(s.chosen, c.vec_id)
        |       ORDER BY round(0.5 - 0.5 * (SELECT max(sim) FROM sims WHERE ia = c.vec_id AND list_contains(s.chosen, ib)), 6) DESC, c.vec_id
        |       LIMIT 1))
        |  FROM sel s WHERE s.rank < 11
        |)
        |SELECT rank, vec_id, score FROM sel ORDER BY rank""".stripMargin,
    // stub decode replay: payload = UTF-8 bytes of the (all-ASCII)
    // fixture text, so ord() per char IS the byte; width/height from
    // the first two bytes, brightness = mean byte value (integer-
    // valued double sums — exact in both engines)
    "x_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(64 + (ord(substr(text, 1, 1)) % 128) AS INT) AS width,
        |  CAST(64 + (ord(substr(text, 2, 1)) % 128) AS INT) AS height,
        |  round(list_aggregate(list_transform(range(1, len(text) + 1),
        |          i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS DOUBLE)), 'sum')
        |        / len(text), 4) AS brightness
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}

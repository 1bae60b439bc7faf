package graft

import org.apache.spark.sql.execution.ExplainMode
import scala.collection.concurrent.TrieMap

/** The `graft.Explain` plan checklist as a mechanical gate: the bench's
  * run-to-run noise floor (±30% under ambient load) can hide a plan
  * regression for rounds, but the plan TEXT doesn't flap — so the
  * properties the manual audit checks are asserted here on every
  * `sbt test`:
  *
  *   - no `CartesianProduct` anywhere in the audited list except the
  *     two LABELED brute-force recall baselines,
  *   - filtered scans reach parquet with non-empty `PushedFilters`,
  *   - top-k paths use `TakeOrderedAndProject` (k rows per partition),
  *     never a global `Sort` + `Limit` (whole-corpus sort).
  *
  * Plans are compiled with table caching OFF — the plan shape a real
  * cluster runs against parquet — at sf0.001 (plan text is
  * scale-invariant; query CONSTRUCTION may build driver-side state
  * like index fixtures, so the small fixture keeps the suite fast).
  */
class PlanAuditSpec extends SparkSpec {

  /** A PRIVATE COPY of the fixture dir: Spark's CacheManager is
    * SparkContext-wide and substitutes an InMemoryRelation for ANY
    * later plan over a path some other suite already cached (hiding
    * the scan node and its PushedFilters — this spec would then flap
    * with suite order). A distinct path means distinct relations, so
    * the plans audited here are genuine parquet scans regardless of
    * what ran before.
    */
  private lazy val sfDir = {
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    val dst = java.nio.file.Files.createTempDirectory("graft-planaudit-sf")
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    dst.toString
  }

  private lazy val uncached = {
    val s = spark.newSession()
    s.conf.set("graft.cacheTables", "false")
    s
  }

  private val planCache = TrieMap.empty[String, String]
  private def planOf(name: String): String =
    planCache.getOrElseUpdate(name,
      SparkEntry.queries(name)(uncached, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))

  /** Queries whose correctness DEPENDS on an all-pairs comparison —
    * the ground-truth baselines the approximate paths are recall-gated
    * against. Everything else in the audited list must be join- or
    * aggregation-shaped.
    */
  private val bruteForceBaselines = Set("x_ann_topk_brute", "x_neardup_embed_brute")

  test("no CartesianProduct in ANY query outside the labeled brute-force baselines") {
    // EVERY driver-contract query compiles here (plan text only, no
    // execution): a cartesian anywhere outside the two ground-truth
    // baselines is a scale bug regardless of which audit list it is on
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(bruteForceBaselines)
      .filter(n => planOf(n).contains("CartesianProduct"))
    assert(offenders.isEmpty,
      s"cartesian product leaked into: ${offenders.mkString(", ")}")
  }

  test("filtered scans push their predicates into the parquet scan") {
    // each of these filters a base table; the scan node must carry a
    // non-empty PushedFilters list (empty => the filter runs as a
    // post-scan Filter over every row group — at 100 TB that is the
    // difference between reading a slice and reading the table)
    val filtered = Seq("a3_tag_collect", "a2_range_collect",
      "f1_gt_le_collect", "ts2_li_range_topk", "g11_scalar_filtered_sum",
      // as-of sides are event_type slices; the EqualTo must reach parquet
      "x_asof_join")
    // (x_dedup_semantic's vec_id slice also pushes, but its pipeline
    // materializes mid-construction — graftCheckpoint truncates the
    // lineage, so the FINAL plan has no parquet scan to assert on)
    filtered.foreach { n =>
      assert("""PushedFilters: \[[A-Z]""".r.findFirstIn(planOf(n)).nonEmpty,
        s"$n: no non-empty PushedFilters in plan")
    }
  }

  test("window/session/asof plans stay keyed-parallel with one output sort") {
    // session windows, sliding windows and the as-of join are exactly
    // where state explosion hides: an empty window partition spec or a
    // lost clustering compiles to Exchange SinglePartition (the whole
    // corpus through one task), and a misplaced orderBy adds a second
    // global range-sort. Pin the shape:
    //   - exactly ONE hashpartitioning exchange (the keyed shuffle; the
    //     as-of join's two Window ops must REUSE it, not re-exchange),
    //   - exactly ONE rangepartitioning exchange (the deterministic
    //     output sort the oracle hash-compare requires),
    //   - no SinglePartition anywhere.
    val windowed = Seq("w1_tumbling_window_1d", "w2_sliding_window",
      "x_sessions", "x_asof_join")
    windowed.foreach { n =>
      val p = planOf(n)
      assert(!p.contains("SinglePartition"),
        s"$n: single-partition exchange — a window/session stage collapsed to one task")
      val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
      assert(hashEx == 1, s"$n: $hashEx hash exchanges (expected 1 keyed shuffle)")
      val rangeEx = "rangepartitioning\\(".r.findAllIn(p).size
      assert(rangeEx == 1,
        s"$n: $rangeEx range exchanges (expected only the output sort)")
    }
    // the grouped-window aggregations must combine map-side: a missing
    // partial aggregate ships every raw row through the shuffle
    Seq("w1_tumbling_window_1d", "w2_sliding_window", "x_sessions").foreach { n =>
      assert(planOf(n).contains("partial_count"),
        s"$n: no partial aggregation before the shuffle")
    }
  }

  test("Gopher filter queries are pure mappers: no hash exchange, no explode") {
    // both signal families are single scan-stage projections built from
    // sorted-array run-length folds — a hashpartitioning exchange or a
    // Generate (explode) here means the per-document computation leaked
    // into a per-line/per-gram shuffle, which at 100 TB turns a mapper
    // into a corpus-wide aggregation
    Seq("x_text_repetition_gopher", "x_text_gopher_quality").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("hashpartitioning"),
        s"$n: repetition/quality signals must not shuffle")
      assert(!p.contains("Generate"), s"$n: signals must not explode")
      val rangeEx = "rangepartitioning\\(".r.findAllIn(p).size
      assert(rangeEx == 1, s"$n: $rangeEx range exchanges (expected only the output sort)")
    }
  }

  test("TS analytics pack stays keyed-parallel (one tag shuffle, one output sort)") {
    // Two SinglePartition populations, distinguishable in plan text by
    // the exchange's shuffle origin:
    //   - `SinglePartition, REPARTITION_BY_NUM` — the DELIBERATE
    //     bounded-output total order (TsAnalytics.orderedSmall: a
    //     repartition(1) + local sort over the ≤|tags|-row rollup,
    //     replacing orderBy's range exchange whose bounds sampling
    //     re-executed the window stage),
    //   - `SinglePartition, ENSURE_REQUIREMENTS` — planner-inserted;
    //     legitimate ONLY above a 1-row-class aggregate (the dense
    //     grid's global-bounds min/max). Anywhere else it means a keyed
    //     corpus stage collapsed to one task — the regression this
    //     tripwire exists for.
    def spKinds(p: String): (Int, Int) = (
      "SinglePartition, REPARTITION_BY_NUM".r.findAllIn(p).size,
      "SinglePartition, ENSURE_REQUIREMENTS".r.findAllIn(p).size)

    // time-weighted avg and counter rate are window-then-aggregate on
    // the same tag key: the groupBy must REUSE the window's hash
    // exchange (a second exchange would re-shuffle the corpus); the
    // output rollup is ≤|tags| rows, sorted via the single-partition
    // move — so NO range exchange and no planner-inserted collapse
    Seq("x_time_weighted_avg", "x_counter_rate").foreach { n =>
      val p = planOf(n)
      val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
      assert(hashEx == 1, s"$n: $hashEx hash exchanges (expected 1 keyed shuffle)")
      assert("rangepartitioning\\(".r.findAllIn(p).isEmpty,
        s"$n: range exchange present (bounded output should single-partition sort)")
      val (rep, ensure) = spKinds(p)
      assert(rep == 1 && ensure == 0,
        s"$n: SinglePartition kinds (repartition=$rep, planner=$ensure) — " +
          "expected exactly the deliberate bounded output sort")
      assert(p.contains("partial_"),
        s"$n: no partial aggregation before the shuffle")
    }
    // OHLC / state_agg / heartbeat / live_ranges produce
    // corpus-proportional outputs: they keep the scale-correct global
    // range sort and must not collapse anywhere. Their groupBy keys
    // start with the window's partition key, so the window's exchange
    // must satisfy the aggregate's distribution too
    Seq("x_ohlc_daily", "x_state_agg", "x_heartbeat_uptime",
        "x_live_ranges").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("SinglePartition"),
        s"$n: single-partition exchange — a keyed stage collapsed to one task")
      val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
      assert(hashEx == 1, s"$n: $hashEx hash exchanges (expected 1 keyed shuffle)")
      val rangeEx = "rangepartitioning\\(".r.findAllIn(p).size
      assert(rangeEx == 1,
        s"$n: $rangeEx range exchanges (expected only the output sort)")
      assert(p.contains("partial_"),
        s"$n: no partial aggregation before the shuffle")
    }
    // dense-grid consumers: each evaluation of the grid contributes one
    // 1-row global-bounds aggregate (ENSURE_REQUIREMENTS SinglePartition
    // over the materialized bucket counts — corr's self-join evaluates
    // the grid twice, hence ≤2), plus at most one deliberate bounded
    // output sort. x_peak_concurrency's allowed single-partition
    // exchange is the carry-in window over the PER-BUCKET aggregate
    // (O(span/bucketMs) rows), never the raw event sweep
    Seq("x_corr_pairs", "x_interp_linear", "x_seasonal_decompose",
        "x_cusum_change", "x_peak_concurrency").foreach { n =>
      val (rep, ensure) = spKinds(planOf(n))
      assert(rep <= 1 && ensure <= 2,
        s"$n: SinglePartition kinds (repartition=$rep, planner=$ensure) — " +
          "expected ≤1 bounded output sort + ≤2 1-row bounds aggregates")
    }
  }

  test("ts3 cagg queries are answered from the rollup, never the raw store") {
    // the rewrite's whole value is O(days × tags) rows instead of
    // O(events): the compiled plan must scan ONLY the rollup segments
    // (paths under the cagg fixture's rollup temp dir), never the
    // store's event segments or the events fixture itself. A raw-path
    // scan sneaking in here silently re-prices the query at corpus
    // scale while still returning correct answers — exactly the
    // regression plan text catches and results can't.
    // these now go through the PUBLIC engine path
    // (QueryEngine.execute(store, qm, rollups)) — this assertion is
    // what pins that the automatic routing, not bespoke caller code,
    // produces rollup-only plans
    // ts3_cagg_sql_* are PLAIN Spark SQL routed by the Catalyst rule
    // (RollupSqlRewrite) instead of the QueryModel engine path — same
    // rollup-only plan obligation
    Seq("ts3_cagg_group_tag_count", "ts3_cagg_group_tag_min",
        "ts3_cagg_scalar_sum", "ts3_cagg_hourly_group_tag_count",
        "ts3_cagg_hourly_scalar_sum", "ts3_cagg_window_6h",
        "ts3_cagg_window_sliding", "ts3_cagg_weekly_scalar_sum",
        "ts3_cagg_weekly_group_tag_count",
        "ts3_cagg_sql_group_tag_sum", "ts3_cagg_sql_scalar_stats",
        "ts3_cagg_sql_window_1d", "ts3_cagg_sql_by_day_having",
        "ts3_cagg_gapfill_locf", "ts3_cagg_gapfill_interp",
        // the SQL gapfill spelling: its markers have NO raw execution
        // (unrouted throws), so the densify-and-fill plan must refold
        // rollup buckets and never touch event segments
        "ts3_cagg_sql_gapfill_locf", "ts3_cagg_sql_gapfill_interp",
        "ts3_cagg_ohlc_1d").foreach { n =>
      val p = planOf(n)
      assert(p.contains("graft-cagg-rollup"),
        s"$n: plan does not read the rollup segments")
      assert(!p.contains("graft-cagg-store") && !p.contains("events.parquet"),
        s"$n: plan reads the raw store — the rewrite fell through")
    }
    // hierarchical rollup answers read ONLY the parent's own segments —
    // never the daily child's, the store, or raw events (the child is a
    // REFRESH-time source, not a query-time one)
    Seq("ts3_cagg_hier_group_tag_count", "ts3_cagg_hier_weekly_min").foreach { n =>
      val p = planOf(n)
      assert(p.contains("graft-cagg-hier"),
        s"$n: plan does not read the hierarchical rollup")
      assert(!p.contains("graft-cagg-rollup") && !p.contains("graft-cagg-store")
        && !p.contains("events.parquet"),
        s"$n: plan reads the child/store — hierarchy leaked into query time")
    }
    // the counter rollup reads ONLY its rollup segments (its store
    // fixture has a distinct dir prefix, so assert both sides)
    locally {
      val p = planOf("ts3_cagg_counter_increase")
      assert(p.contains("graft-cagg-ctr-rollup"),
        "ts3_cagg_counter_increase: plan does not read the counter rollup")
      assert(!p.contains("graft-cagg-ctr-store") && !p.contains("events.parquet"),
        "ts3_cagg_counter_increase: plan reads raw events — refold fell through")
    }
    // the SQL-spelled counter family (RollupSqlRewrite swapping the
    // registered counter_increase/counter_resets/time_weight_locf
    // folds): rollup segments only — the raw ordered fold would be
    // hash-green too, which is exactly why the plan must prove itself
    locally {
      val p = planOf("ts3_cagg_sql_counter_increase")
      assert(p.contains("graft-cagg-ctr-rollup"),
        "ts3_cagg_sql_counter_increase: plan does not read the counter rollup")
      assert(!p.contains("graft-cagg-ctr-store") && !p.contains("events.parquet"),
        "ts3_cagg_sql_counter_increase: plan reads raw events — rewrite fell through")
    }
    locally {
      val p = planOf("ts3_cagg_sql_twa")
      assert(p.contains("graft-cagg-tw-rollup"),
        "ts3_cagg_sql_twa: plan does not read the tw rollup")
      assert(!p.contains("graft-cagg-store") && !p.contains("events.parquet"),
        "ts3_cagg_sql_twa: plan reads raw events — rewrite fell through")
    }
    // the stats-mode (regression) rollup shares the main fixture store
    // — moments come from rollup segments only
    locally {
      val p = planOf("ts3_cagg_regression_by_tag")
      assert(p.contains("graft-cagg-stats-rollup"),
        "ts3_cagg_regression_by_tag: plan does not read the stats rollup")
      assert(!p.contains("graft-cagg-store") && !p.contains("events.parquet"),
        "ts3_cagg_regression_by_tag: plan reads raw events — refold fell through")
    }
    // the time-weight rollup shares the main fixture store — rollup
    // segments only, never the store or events
    locally {
      val p = planOf("ts3_cagg_time_weighted")
      assert(p.contains("graft-cagg-tw-rollup"),
        "ts3_cagg_time_weighted: plan does not read the tw rollup")
      assert(!p.contains("graft-cagg-store") && !p.contains("events.parquet"),
        "ts3_cagg_time_weighted: plan reads raw events — refold fell through")
    }
    // frozen-history (downsampling retention) answers read ONLY the
    // rollup — by construction they CANNOT fall through to raw (the
    // raw days below the horizon were dropped), so a store path here
    // means the freeze carried nothing and the answer silently lost
    // history
    Seq("ts3_cagg_frozen_history_count",
        "ts3_cagg_frozen_history_sum").foreach { n =>
      val p = planOf(n)
      assert(p.contains("graft-cagg-frz-rollup"),
        s"$n: plan does not read the frozen rollup segments")
      assert(!p.contains("graft-cagg-frz-store") && !p.contains("events.parquet"),
        s"$n: plan reads the raw store — frozen answers must be rollup-only")
    }
    // the sketch-backed family reads ONLY the sketch rollup's segments
    // (percentile/distinct/top-k have no refold from plain partials —
    // an events scan here means the whole sketch machinery is bypassed)
    Seq("ts3_cagg_p95_by_tag", "ts3_cagg_distinct_values",
        "ts3_cagg_top_values",
        "ts3_cagg_sql_percentile", "ts3_cagg_sql_approx_distinct").foreach { n =>
      val p = planOf(n)
      assert(p.contains("graft-cagg-sketch"),
        s"$n: plan does not read the sketch rollup segments")
      assert(!p.contains("graft-cagg-store") && !p.contains("events.parquet"),
        s"$n: plan reads the raw store — the sketch path fell through")
    }
  }

  test("ts3 realtime queries are answered as a hybrid: rollup segments + pruned raw tail") {
    // the real-time path's value is O(buckets + tail events): the plan
    // must read the rollup's carried buckets AND the raw store (the
    // post-T2 hot tail) — a missing rollup path means the rewrite
    // silently fell through to a full raw scan; a missing store path
    // means the fixture is no longer stale and the hybrid is untested.
    // Every raw-side scan must carry a g_day partition filter (the
    // changed-days pruning that keeps the raw cost at tail size).
    Seq("ts3_cagg_realtime_scalar_sum",
        "ts3_cagg_realtime_group_tag_count",
        "ts3_cagg_sql_realtime_group_tag_sum").foreach { n =>
      val p = planOf(n)
      assert(p.contains("graft-cagg-rt-rollup"),
        s"$n: hybrid plan does not read the rollup segments")
      assert(p.contains("graft-cagg-rt-store"),
        s"$n: hybrid plan does not read the raw tail — fixture not stale?")
      // formatted-mode scans are multi-line blocks: "(k) Scan parquet"
      // followed by Location / PartitionFilters / PushedFilters lines
      val rawScans = """(?s)\(\d+\) Scan parquet.*?(?=\n\(\d+\)|\z)""".r
        .findAllIn(p).toSeq.filter(_.contains("graft-cagg-rt-store"))
      assert(rawScans.nonEmpty && rawScans.forall(b =>
        b.contains("PartitionFilters") && b.contains("g_day")),
        s"$n: hybrid raw scans must be g_day-partition-pruned to the tail")
    }
  }

  test("top-k paths use TakeOrderedAndProject, not a global sort") {
    val topk = Seq("o1_l1_topk_recent", "ts2_li_range_topk",
      "x_search_bm25", "x_heavy_hitters",
      // the fused ranking and the pair-count argmax both end in
      // orderBy+limit — a global sort here would total-order the
      // fusion/vocab table instead of heap-cutting it
      "x_search_hybrid_rrf", "x_bpe_pair_counts")
    topk.foreach { n =>
      assert(planOf(n).contains("TakeOrderedAndProject"),
        s"$n: expected TakeOrderedAndProject in plan")
    }
  }
}

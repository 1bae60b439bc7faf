package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Plan audit: prints the physical plan of selected queries with table
  * caching DISABLED, i.e. the plan shape a real cluster would run
  * against parquet at scale. Checklist per plan:
  *   - PushedFilters reaches the parquet scan (predicate pushdown)
  *   - ReadSchema contains only the referenced columns (pruning)
  *   - aggregates are partial → final HashAggregate
  *   - top-k plans use TakeOrderedAndProject
  *   - small join sides are BroadcastHashJoin under AQE
  */
object Explain {
  /** The audited flagship-query list — shared with PlanAuditSpec,
    * which re-asserts this checklist mechanically on every `sbt test`
    * (the bench's noise floor would hide a plan regression; the plan
    * text doesn't flap).
    */
  val audited: Seq[String] = Seq(
      "a1_count_all", "a3_tag_collect", "g6_group_tag_avg",
      "o1_l1_topk_recent", "s1_insert_conflict_check", "x_ann_topk_brute",
      "x_decontaminate", "x_gapfill_minutes", "x_sample_quota",
      "x_rollup_pricing", "x_pricing_summary", "x_pii_detect",
      "x_split_stratified", "x_lm_unigram_nll", "x_pipeline_pretrain",
      "x_lm_filter_nll", "x_skew_join_salted", "x_range_join",
      "x_text_repetition", "x_dedup_ngram_frac", "x_lm_bigram_nll",
      "x_search_bm25", "x_quality_filter_report", "x_dedup_ngram_spans",
      "x_dedup_span_trim", "x_sample_token_budget", "x_pipeline_curation_v2",
      "x_pack_sequences", "x_heavy_hitters", "x_ewma_smooth",
      "x_cube_pricing", "x_pivot_order_status", "x_bucketed_join",
      "x_acf", "x_quality_deciles", "x_funnel", "x_retention_cohorts",
      "x_pipeline_pack", "x_dedup_incremental", "x_heavy_hitters_by_source",
      "x_sample_weighted", "x_pack_apply", "x_epoch_shuffle",
      "x_corpus_report", "x_decontaminate_by_source",
      "x_group_percentiles_approx", "x_dedup_incremental_neardup",
      "x_forecast_holt", "x_quality_deciles_approx", "x_dedup_delete",
      "x_corpus_stats_incremental", "x_sample_temperature", "x_quality_drift",
      "x_dedup_clusters_incremental", "x_source_warc", "x_pipeline_warc",
      "x_dedup_semantic",
      "x_domain_stats", "x_domain_caps",
      // windowed/session/ordered-join family: exactly where an
      // accidental global sort or a single-partition window collapse
      // would hide (round-7 verdict #5)
      "w1_tumbling_window_1d", "w2_sliding_window", "x_sessions",
      "x_asof_join",
      // rollup-routed family: engine path, SQL path (Catalyst rule),
      // and the real-time hybrids — the plans PlanAuditSpec pins as
      // rollup-only / rollup+pruned-tail
      "ts3_cagg_scalar_sum", "ts3_cagg_sql_group_tag_sum",
      "ts3_cagg_sql_window_1d", "ts3_cagg_sql_realtime_group_tag_sum")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.cacheTables", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else audited
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

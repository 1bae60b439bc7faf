package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level quality signals that need the token array bound as a
  * column (the scalar per-character signals live in
  * [[graft.functions.TextFunctions]] as pure Column expressions).
  */
object Quality {

  /** Intra-document duplicate n-gram stats — the Gopher-style
    * repetition filter signal (a doc that keeps repeating the same
    * phrases has dup_ratio near 1): (doc_id, n_ngrams, n_distinct,
    * dup_ratio = 1 − distinct/total). Shuffle-free scan-stage
    * expressions; the token array is BOUND as a column before the
    * windowing lambda (an unbound split re-evaluates per element —
    * O(len²) per doc).
    */
  def dupNgramStats(docs: DataFrame, n: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tokenized = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val grams = transform(
      sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
      i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))
    tokenized.select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_ngrams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 4))
      .orderBy(col("doc_id"))
  }

  /** C4/Gopher-style composite filter REPORT: how many documents each
    * curation rule flags, plus how many survive every rule — the
    * first artifact a pipeline owner asks for before committing to a
    * ruleset ("what would this drop?"). Rules (each evaluated
    * independently — one doc can count under several):
    *  - `too_short`: fewer than `minTokens` whitespace tokens;
    *  - `low_quality`: [[graft.functions.TextFunctions.qualityScore]]
    *    below `minQuality`;
    *  - `repetitive`: distinct/total token ratio below
    *    `minDistinctRatio`;
    *  - `lang_mismatch`: heuristic language ID disagrees with the
    *    declared `langCol`;
    *  - `kept`: flagged by none of the above.
    * All four signals are scan-stage codegen'd Columns — the whole
    * report is one corpus scan into a singleton aggregate (no shuffle
    * of anything but the 5 partial counters), then a constant-width
    * stack to (rule, n_docs) rows. Thresholds ride the plan as
    * literals.
    */
  def filterReport(docs: DataFrame, minTokens: Int = 30,
                   minQuality: Double = 0.3, minDistinctRatio: Double = 0.35,
                   textCol: String = "text", langCol: String = "lang"): DataFrame = {
    import graft.functions.TextFunctions
    val t = col(textCol)
    docs.select(
      (TextFunctions.wsTokenCount(t) < minTokens).cast("long").as("f_short"),
      (TextFunctions.qualityScore(t) < minQuality).cast("long").as("f_qual"),
      (TextFunctions.repetitionRatio(t) < minDistinctRatio).cast("long").as("f_rep"),
      (TextFunctions.langId(t) =!= col(langCol)).cast("long").as("f_lang"))
      .withColumn("f_kept",
        when(col("f_short") + col("f_qual") + col("f_rep") + col("f_lang") === 0L, 1L)
          .otherwise(0L))
      // coalesce: a global agg over ZERO rows yields one all-NULL row —
      // an empty corpus must report zeros, not nulls
      .agg(coalesce(sum(col("f_short")), lit(0L)).as("too_short"),
        coalesce(sum(col("f_qual")), lit(0L)).as("low_quality"),
        coalesce(sum(col("f_rep")), lit(0L)).as("repetitive"),
        coalesce(sum(col("f_lang")), lit(0L)).as("lang_mismatch"),
        coalesce(sum(col("f_kept")), lit(0L)).as("kept"))
      .select(expr(
        "stack(5, 'kept', kept, 'lang_mismatch', lang_mismatch, " +
          "'low_quality', low_quality, 'repetitive', repetitive, " +
          "'too_short', too_short) AS (rule, n_docs)"))
      .orderBy(col("rule"))
  }

  /** Quality-score distribution report in `buckets` quantile bands:
    * `(decile, n_docs, avg_q, min_q, max_q)` — the "where would a
    * threshold cut?" view a curation owner reads before picking one.
    *
    * NOT a global `ntile`: an ORDER-BY-everything window serializes
    * the corpus through one task. Instead the cut points (buckets − 1
    * values) come from ONE percentile aggregate whose single row
    * broadcast-crossJoins back onto the scores — ONE plan, no driver
    * hop (the [[LangModel.filterByNll]] shape, now the standard for
    * every percentile-cut operator) — and band assignment is a
    * scan-stage array fold. Cuts and scores are rounded to 4 decimals
    * BEFORE banding so the band edges replay cross-engine. An empty
    * corpus reports an empty distribution (the crossJoin of zero score
    * rows is zero rows — no special case).
    *
    * `approx = true` swaps the exact `percentile` for
    * `approx_percentile` (t-digest sketch): same plan shape, bounded
    * sketch memory instead of a full sort-based exact aggregate — the
    * 100 TB default, where exact global percentiles pay a corpus-wide
    * exact aggregate for precision the banding doesn't need. Band
    * POPULATIONS may then deviate slightly near the cut points
    * (tolerance-gated in the spec); rows-only in the driver compare
    * (sketch cuts are engine-specific).
    */
  def scoreDeciles(docs: DataFrame, buckets: Int = 10,
                   textCol: String = "text", approx: Boolean = false): DataFrame = {
    require(buckets >= 2, s"scoreDeciles: buckets=$buckets must be >= 2")
    // the [[drift]] guards: empty text would hit qualityScore's 0/0
    // punct ratio (an ANSI arithmetic error), and a null score carries
    // no band — unfiltered, an all-null corpus would aggregate into a
    // single decile=null row instead of the empty distribution the
    // empty-corpus contract promises (aggregate over the null cuts
    // array yields a null band, not zero rows)
    val scored = docs
      .filter(length(col(textCol)) > 0)
      .select(graft.functions.TextFunctions.qualityScore(col(textCol)).as("q"))
      .filter(col("q").isNotNull)
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val pctFn = if (approx) "approx_percentile" else "percentile"
    val cuts = scored.agg(
      transform(expr(s"$pctFn(q, array(${fracs.mkString(",")}))"),
        c => round(c, 4)).as("cs"))
    val band = aggregate(col("cs"), lit(0),
      (acc, c) => acc + when(col("q") > c, 1).otherwise(0)).cast("long")
    scored.crossJoin(broadcast(cuts))
      .groupBy(band.as("decile"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("q")), 4).as("avg_q"),
        min(col("q")).as("min_q"), max(col("q")).as("max_q"))
      .orderBy(col("decile"))
  }

  /** Population-stability drift of the quality-score distribution
    * between a REFERENCE corpus and a NEW batch — the per-ingest
    * monitor a pipeline runs before admitting a crawl snapshot (PSI
    * reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    * investigate). Per band `b` of `bins` fixed-width score bands
    * (the score lives in [0,1]):
    * `psi_b = (p_new − p_ref) · ln(p_new / p_ref)` with add-one
    * smoothing `p = (n_b + 1) / (N + bins)` so an empty band
    * contributes a finite term instead of ±∞; identical band counts
    * give exactly 0.0. Engine-replayable: counts are exact, the
    * proportions are single IEEE divisions of exact integers, and the
    * one `ln` rounds away cross-libm ulps at 4 decimals. Null- and
    * empty-text docs have no score and no band. Each side pays ONE partial-agg
    * scan into `bins` groups; everything after is a bins-row frame
    * (the totals ride a whole-frame window over those rows — no extra
    * pass over either corpus). Returns (band, n_ref, n_new, psi)
    * ordered by band; total PSI = Σ psi.
    */
  def drift(reference: DataFrame, batch: DataFrame, bins: Int = 10,
            textCol: String = "text"): DataFrame =
    driftFromCounts(bandCounts(reference, bins, textCol, "n_ref"),
      bandCounts(batch, bins, textCol, "n_new"), bins)

  /** Exact per-band doc counts of a corpus's quality scores — the
    * partial [[drift]] consumes, and the ONLY corpus-scale work in the
    * monitor (one partial-agg scan into ≤ bins groups). Persisting
    * this frame IS persisting a reference distribution
    * ([[DriftRef]]), since the PSI frame below is a pure bins-row
    * computation over two of them.
    */
  private[graft] def bandCounts(df: DataFrame, bins: Int,
                                textCol: String, as: String): DataFrame =
    df
      // null/empty text has no quality score and must carry NO band:
      // the length guard runs BEFORE scoring (empty text would hit
      // qualityScore's 0/0 punct ratio — an ANSI arithmetic error,
      // not a null), and the score-nullity filter runs BEFORE
      // least(), which SKIPS nulls in both engines — unguarded,
      // least(floor(null*bins), bins-1) files scoreless docs into
      // the TOP band, masking exactly the degraded-snapshot shape
      // this monitor exists to catch
      .filter(length(col(textCol)) > 0)
      .select(graft.functions.TextFunctions.qualityScore(col(textCol)).as("__q"))
      .filter(col("__q").isNotNull)
      .select(least(floor(col("__q") * bins), lit(bins - 1))
        .cast("long").as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as(as))

  /** The PSI frame from two band-count partials ((band, n_ref) and
    * (band, n_new)) — a bins-row computation, no corpus access. Shared
    * by the one-shot [[drift]] and the persisted-reference path
    * ([[DriftRef.psi]]), so the streaming monitor can NOT drift from
    * the oracle-checked batch semantics: both literally run this.
    */
  private[graft] def driftFromCounts(refCounts: DataFrame, newCounts: DataFrame,
                                     bins: Int): DataFrame = {
    require(bins >= 2, s"drift: bins=$bins must be >= 2")
    val spark = refCounts.sparkSession
    val spine = spark.range(bins).select(col("id").as("band"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    spine
      .join(refCounts, Seq("band"), "left")
      .join(newCounts, Seq("band"), "left")
      .na.fill(0L, Seq("n_ref", "n_new"))
      .withColumn("__tr", sum(col("n_ref")).over(w))
      .withColumn("__tn", sum(col("n_new")).over(w))
      .withColumn("__pr",
        (col("n_ref") + 1).cast("double") / (col("__tr") + bins).cast("double"))
      .withColumn("__pn",
        (col("n_new") + 1).cast("double") / (col("__tn") + bins).cast("double"))
      .select(col("band"), col("n_ref"), col("n_new"),
        round((col("__pn") - col("__pr")) * log(col("__pn") / col("__pr")), 4)
          .as("psi"))
      .orderBy(col("band"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucket gap filling — the classic time-series densification the
  * reference lacks (beyond-reference, builder brief): bucket counts per
  * key with EVERY bucket between the series' global bounds present,
  * zeros where no rows landed. Downstream windows/moving averages need
  * the dense grid.
  *
  * Scale shape: one groupBy of the input (the aggregation that would
  * run anyway), a 1-row global-bounds aggregate, and a keys × buckets
  * grid built from `sequence` + `explode` — the grid is |keys| ×
  * |buckets| rows of two columns, tiny next to the input, and joins the
  * counts on (key, bucket) co-partitioned. No per-row driver loops.
  */
object GapFill {

  /** (tag, bucket_start, cnt) with zero-filled gaps: every `bucketMs`
    * bucket between the GLOBAL min and max bucket appears for every
    * tag. Pass `sorted = false` when the grid feeds a windowed
    * consumer: the final total-order sort is a global range Exchange
    * that a downstream `Window.partitionBy(tag)` immediately
    * re-shuffles anyway — skipping it removes one Exchange + global
    * sort from every moving-avg/delta/anomaly/EWMA/ACF plan.
    *
    * ONE input scan (guide §2.4): the global bounds and the tag set
    * both fold out of the materialized per-(tag, bucket) aggregate — a
    * group exists exactly where input rows exist, so min/max bucket and
    * distinct tags over the groups equal the same aggregates over the
    * raw input. The previous form computed bounds and tags as separate
    * aggregates over `ts`, scanning the input THREE times per grid (and
    * six in corrPairs, whose self-join evaluates the grid twice); the
    * materialized aggregate is grid-sized (≤ |tags|·|buckets| rows of
    * three columns — the operator's own output is strictly larger), so
    * the checkpoint trades a corpus-scale double-scan for a rollup-
    * sized write at every scale.
    */
  def bucketCounts(ts: DataFrame, bucketMs: Long,
                   sorted: Boolean = true): DataFrame = {
    import graft.Materialize.MaterializeOps
    val bucket = expr(s"timestamp div $bucketMs")
    val counts = ts.groupBy(col("tag"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .graftCheckpoint() // feeds bounds, the tag set AND the grid join
    val bounds = counts.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = counts.select(col("tag")).distinct()
      .crossJoin(bounds) // 1-row bounds => broadcast nested loop
      .select(col("tag"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val dense = grid.join(counts, Seq("tag", "bucket"), "left")
      .select(col("tag"), (col("bucket") * bucketMs).as("bucket_start"),
        coalesce(col("cnt"), lit(0L)).cast("double").as("cnt"))
    if (sorted) dense.orderBy(col("tag"), col("bucket_start")) else dense
  }

  /** Trailing `window`-bucket moving average per tag over a DENSE grid
    * (gap filling first is what makes "last N buckets" mean "last N
    * time units"). One window shuffle on the tag key.
    */
  def movingAvg(dense: DataFrame, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tag")).orderBy(col("bucket_start"))
      .rowsBetween(-(window - 1), 0)
    dense.withColumn("mavg", round(avg(col("cnt")).over(w), 4))
      .orderBy(col("tag"), col("bucket_start"))
  }

  /** Per-bucket change vs the previous bucket (first bucket: vs 0) —
    * the rate/increase shape monitoring stacks compute over counters.
    */
  def delta(dense: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tag")).orderBy(col("bucket_start"))
    dense.withColumn("delta",
        col("cnt") - coalesce(lag(col("cnt"), 1).over(w), lit(0.0)))
      .orderBy(col("tag"), col("bucket_start"))
  }

  /** Trailing-window z-score anomalies over the dense grid: buckets
    * whose count deviates ≥ `threshold` sample standard deviations from
    * the trailing `window`-bucket mean. The mean and stddev are ROUNDED
    * before the division so the score is arithmetic over identical
    * doubles on any engine — no last-ulp threshold flips. Buckets whose
    * trailing window has no spread (sd = 0 or too few rows) never flag.
    */
  def anomalies(dense: DataFrame, window: Int, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tag")).orderBy(col("bucket_start"))
      .rowsBetween(-(window - 1), 0)
    dense
      .withColumn("mavg", round(avg(col("cnt")).over(w), 4))
      .withColumn("sd", round(stddev_samp(col("cnt")).over(w), 4))
      .filter(col("sd").isNotNull && col("sd") > 0)
      .withColumn("z", round((col("cnt") - col("mavg")) / col("sd"), 4))
      .filter(abs(col("z")) >= threshold)
      .select(col("tag"), col("bucket_start"), col("cnt"), col("mavg"),
        col("sd"), col("z"))
      .orderBy(col("tag"), col("bucket_start"))
  }

  /** Autocorrelation of each series at lags 1..maxLag — the seasonality
    * / burst-persistence diagnostic (a daily-periodic metric shows an
    * ACF spike at the day lag). One window shuffle produces ALL the lag
    * columns (Pearson corr then pairs each with the current value,
    * skipping the first `k` null rows per series, same as SQL `corr`).
    * Rounded to 4 decimals: corr folds co-moments in partition order,
    * so the raw low bits are not replayable across engines — the same
    * convention as every float aggregate here.
    */
  def autocorrelation(dense: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"autocorrelation: maxLag=$maxLag must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tag")).orderBy(col("bucket_start"))
    val lagCols = (1 to maxLag).map(k => lag(col("cnt"), k).over(w).as(s"lag_$k"))
    val base = dense.select(col("tag") +: col("cnt") +: lagCols: _*)
    // nanvl: Spark corr yields NaN for a zero-variance (constant)
    // series where DuckDB yields NULL — normalize to NULL so a
    // degenerate series can't flap the cross-engine compare
    val aggs = (1 to maxLag).map(k =>
      round(nanvl(corr(col("cnt"), col(s"lag_$k")), lit(null).cast("double")), 4)
        .as(s"acf_$k"))
    base.groupBy(col("tag")).agg(aggs.head, aggs.tail: _*)
      // one row per tag ([[TsAnalytics.orderedSmall]] — same total
      // order as orderBy without the range exchange's sampling pass,
      // which re-executes the corr-fold stage)
      .transform(TsAnalytics.orderedSmall(_, col("tag")))
  }
}

package graft.operators

import graft.functions.NumericFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic time-series analytics over the canonical TS view
  * (timestamp epoch-millis, tag, value) — beyond-reference operators
  * (builder brief) in the reference's own domain: the aggregates a
  * monitoring / market-data deployment of a TS store runs daily
  * (time-weighted averages, OHLC bars, counter rates, cross-series
  * correlation, interpolation).
  *
  * Determinism convention (SURVEY.md §7.4): the fixture's `value` is a
  * fixed 2-decimal quantity, so every sum here runs over exact scaled
  * integers (`round(value*100)` longs, int128-accumulated where a
  * group's total is unbounded); floats appear only in final divisions
  * whose operand order is mirrored in the DuckDB oracle, making the
  * hash compare exact at any row count.
  *
  * Scale shape: every operator is one window or one groupBy on the
  * `tag` key (plus a bucket column) — a single hash/range Exchange on
  * the same key the store partitions by; no driver-side collection, no
  * cartesian products (the corr self-join is an equi-join on bucket).
  */
object TsAnalytics {

  /** Time-weighted average per tag over an irregularly-sampled series
    * (the TimescaleDB `time_weight('LOCF')` shape): each observation
    * holds its value until the next one, so
    *   twa = Σ value_i · (t_{i+1} − t_i) / (t_N − t_0).
    * The last point has no forward interval and contributes no weight;
    * tags with fewer than 2 points are dropped (no span to weight
    * over). The numerator is an exact scaled-integer sum (value·100 ×
    * millis, int128 — a 100 TB single-tag series overflows a long), so
    * both engines cast the SAME integer to double before the one
    * rounded division.
    */
  def timeWeightedAvg(ts: DataFrame): DataFrame = {
    NumericFunctions.register(ts.sparkSession)
    val w = Window.partitionBy(col("tag")).orderBy(col("timestamp"))
    val stepped = ts
      .withColumn("dt", lead(col("timestamp"), 1).over(w) - col("timestamp"))
      .filter(col("dt").isNotNull)
    stepped.groupBy(col("tag"))
      .agg(
        round(NumericFunctions.sum128(round(col("value") * 100).cast("long") * col("dt"))
            .cast("double") / lit(100.0) / sum(col("dt")).cast("double"), 4)
          .as("twa"),
        (count(lit(1)) + 1).as("n_points"),
        sum(col("dt")).as("span_ms"))
      .orderBy(col("tag"))
  }

  /** OHLC bars (open/high/low/close) per tag per time bucket — the
    * market-data downsample. `open`/`close` are the values at the
    * bucket's first/last timestamp (`min_by`/`max_by`; per-tag
    * timestamps are unique in the TS view, so the selection is
    * well-defined), `high`/`low` plain min/max — pure selections, no
    * float arithmetic, hash-exact unrounded. One groupBy on
    * (tag, bucket).
    */
  def ohlc(ts: DataFrame, bucketMs: Long): DataFrame =
    ts.groupBy(col("tag"),
        (expr(s"timestamp div $bucketMs") * bucketMs).as("bucket_start"))
      .agg(
        min_by(col("value"), col("timestamp")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("timestamp")).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("tag"), col("bucket_start"))

  /** Pairwise Pearson correlation between every two tags' bucket-count
    * series, aligned on a DENSE bucket grid ([[GapFill.bucketCounts]]
    * output — alignment on a sparse grid would silently correlate only
    * co-occurring buckets). Self equi-join on `bucket_start` with a
    * `tag_a < tag_b` residual (no cartesian: Catalyst plans a hash
    * join on the bucket key), then one groupBy per pair. Pearson r is
    * assembled from covar_samp / (stddev·stddev) rather than `corr`:
    * ANSI mode makes corr's INTERNAL division raise on a zero-variance
    * series, while the explicit form guards it lazily (`when`) and the
    * oracle mirrors the exact same formula (NULLIF). Moments fold in
    * partition order, so the result rounds to 4 decimals — the same
    * convention as [[GapFill.autocorrelation]].
    */
  def corrPairs(dense: DataFrame): DataFrame = {
    val a = dense.select(col("tag").as("tag_a"), col("bucket_start"),
      col("cnt").as("cnt_a"))
    val b = dense.select(col("tag").as("tag_b"), col("bucket_start"),
      col("cnt").as("cnt_b"))
    val sdProd = col("sd_a") * col("sd_b")
    a.join(b, Seq("bucket_start"))
      .filter(col("tag_a") < col("tag_b"))
      .groupBy(col("tag_a"), col("tag_b"))
      .agg(
        covar_samp(col("cnt_a"), col("cnt_b")).as("cov"),
        stddev_samp(col("cnt_a")).as("sd_a"),
        stddev_samp(col("cnt_b")).as("sd_b"),
        count(lit(1)).as("n_buckets"))
      .select(col("tag_a"), col("tag_b"),
        when(sdProd > 0, round(col("cov") / sdProd, 4)).as("r"),
        col("n_buckets"))
      .orderBy(col("tag_a"), col("tag_b"))
  }

  /** PromQL-style counter increase with reset detection. The input is
    * a cumulative counter per tag (monotone except for resets to a
    * lower value — process restarts); the increase at each step is
    *   c_i − c_{i−1}  when non-negative,
    *   c_i            when a reset intervened (PromQL's convention:
    *                  the counter restarted from 0 and reached c_i).
    * Output per tag: total increase, reset count, points. All
    * arithmetic is integer until the final /100 division — hash-exact.
    *
    * The demo counter is derived deterministically from the TS view
    * (the fixture carries no native counters): the per-tag running sum
    * of scaled values, wrapped mod `wrap` — wrapping is exactly a
    * reset, so the operator's reset arithmetic is exercised on every
    * wrap. Pass a pre-built `(tag, timestamp, counter)` frame via
    * [[counterRate]] for real counters.
    */
  def syntheticCounter(ts: DataFrame, wrap: Long): DataFrame = {
    val w = Window.partitionBy(col("tag")).orderBy(col("timestamp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts.select(col("tag"), col("timestamp"),
      (sum(round(col("value") * 100).cast("long")).over(w) % wrap).as("counter"))
  }

  def counterRate(counter: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("tag")).orderBy(col("timestamp"))
    counter
      .withColumn("prev", lag(col("counter"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("inc",
        when(col("counter") >= col("prev"), col("counter") - col("prev"))
          .otherwise(col("counter")))
      .groupBy(col("tag"))
      .agg(
        (sum(col("inc")).cast("double") / 100.0).as("total_increase"),
        sum(when(col("counter") < col("prev"), 1L).otherwise(0L)).as("n_resets"),
        (count(lit(1)) + 1).as("n_points"))
      .orderBy(col("tag"))
  }

  /** Linear interpolation of missing buckets (the TimescaleDB
    * `interpolate()` gap-fill, vs [[GapFill.bucketCounts]]'s zero-fill):
    * per tag, bucket the series to its mean VALUE (exact scaled-integer
    * mean), then fill each empty bucket on the dense grid by linear
    * interpolation between the nearest observed buckets either side.
    * Edge buckets with no neighbor on one side stay unfilled (sentinel
    * −1, mirrored in the oracle — no engine-specific null encodings in
    * the hash).
    *
    * Formulated with two marked-window scans + two equi-joins back to
    * the observed points (prev/next observed bucket per grid row) —
    * identical standard-SQL shape in the DuckDB oracle, and in Spark it
    * is two window functions over the tag key plus two broadcast-able
    * joins on (tag, bucket).
    *
    * ALL value arithmetic — the per-bucket mean AND the interpolation —
    * runs in scaled-integer space (1e-4 units) with half-up integer
    * rounding, `floor((2·num + den) / (2·den))` for the positive
    * fixture values: a float `round(x, 4)` is NOT cross-engine stable
    * when x lands within an ulp of a .00005 boundary (Spark rounds the
    * shortest decimal representation, DuckDB the raw float — measured:
    * 11/7200 interpolated rows flipped the 4th decimal), while integer
    * division is bit-identical everywhere. The only doubles are the
    * final exact `q / 10⁴` casts.
    */
  def interpolateLinear(ts: DataFrame, bucketMs: Long): DataFrame = {
    val bucket = expr(s"timestamp div $bucketMs")
    // exact per-bucket mean in 1e-4 units: half_up(scaled_sum*100 / n)
    val obs = ts.groupBy(col("tag"), bucket.as("bucket"))
      .agg(sum(round(col("value") * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("tag"), col("bucket"),
        expr("(2 * s * 100 + n) div (2 * n)").as("v"))
    val bounds = ts.agg(min(bucket).as("lo"), max(bucket).as("hi"))
    val grid = ts.select(col("tag")).distinct()
      .crossJoin(bounds) // 1-row bounds => broadcast nested loop
      .select(col("tag"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val dense = grid.join(obs, Seq("tag", "bucket"), "left")
    val wPrev = Window.partitionBy(col("tag")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("tag")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val marked = dense
      .withColumn("pb", max(when(col("v").isNotNull, col("bucket"))).over(wPrev))
      .withColumn("nb", min(when(col("v").isNotNull, col("bucket"))).over(wNext))
    val pv = obs.select(col("tag"), col("bucket").as("pb"), col("v").as("pv"))
    val nv = obs.select(col("tag"), col("bucket").as("nb"), col("v").as("nv"))
    marked
      .join(pv, Seq("tag", "pb"), "left")
      .join(nv, Seq("tag", "nb"), "left")
      // exact rational interp in 1e-4 units:
      //   (pv·(nb−b) + nv·(b−pb)) / (nb−pb), rounded half-up
      .withColumn("num", col("pv") * (col("nb") - col("bucket"))
        + col("nv") * (col("bucket") - col("pb")))
      .withColumn("den", col("nb") - col("pb"))
      .select(col("tag"), (col("bucket") * bucketMs).as("bucket_start"),
        when(col("v").isNotNull, lit("obs"))
          .when(col("pb").isNull || col("nb").isNull, lit("edge"))
          .otherwise(lit("interp")).as("src"),
        (coalesce(col("v"),
          when(col("pb").isNotNull && col("nb").isNotNull,
            expr("(2 * num + den) div (2 * den)")),
          lit(-10000L)).cast("double") / 10000.0).as("val"))
      .orderBy(col("tag"), col("bucket_start"))
  }
}

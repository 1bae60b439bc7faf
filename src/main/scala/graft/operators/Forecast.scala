package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-series forecasting (beyond-reference: the natural next question
  * a time-series store gets asked — "where is this metric heading").
  * Holt linear (double) exponential smoothing: a level and a trend per
  * series, each an O(1)-state recurrence over the points in time
  * order, then an h-step linear extrapolation.
  *
  * Scale shape: ONE shuffle (groupByKey on the tag); each series then
  * folds sequentially inside its group — the recurrence is inherently
  * order-dependent, so this is the documented [[Dataset#groupByKey]]/
  * `flatMapGroups` exception to the no-imperative-code rule (a window
  * function cannot express a feedback recurrence: each output depends
  * on the PREVIOUS OUTPUT, not on the input frame). Memory is O(series
  * points) per tag while sorting the group iterator; a series too big
  * for one executor should be bucket-aggregated first ([[GapFill
  * .bucketCounts]] / tumbling windows) — forecasting raw sub-second
  * ticks is a modeling smell, not an engine path.
  *
  * Deterministic: input order is pinned by the (timestamp, tag)
  * uniqueness rule + an explicit sort, the fold is fixed-order double
  * arithmetic, and outputs round to 4 decimals.
  */
object Forecast {

  /** h-step-ahead Holt linear forecasts per tag:
    * (tag, step, ts, yhat), step in 1..horizon, ts extrapolated at the
    * series' median observed spacing. Initialization: level = first
    * value, trend = second − first (series with < 2 points emit
    * nothing — no trend evidence). On perfectly linear series the
    * forecast continues the line EXACTLY for any alpha/beta (level
    * tracks, trend is fixed-point) — pinned in the spec.
    */
  def holtLinear(ts: Dataset[graft.model.TS], alpha: Double = 0.5,
                 beta: Double = 0.3, horizon: Int = 3): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0,1]")
    require(beta >= 0 && beta <= 1, s"beta=$beta out of [0,1]")
    require(horizon >= 1, s"horizon=$horizon must be >= 1")
    val spark = ts.sparkSession
    import spark.implicits._
    ts.groupByKey(_.tag)
      .flatMapGroups { (tag, rows) =>
        val pts = rows.toArray.sortBy(_.timestamp)
        if (pts.length < 2) Iterator.empty
        else {
          var level = pts(0).value
          var trend = pts(1).value - pts(0).value
          pts.iterator.drop(1).foreach { p =>
            val prevLevel = level
            level = alpha * p.value + (1 - alpha) * (level + trend)
            trend = beta * (level - prevLevel) + (1 - beta) * trend
          }
          val gaps = pts.sliding(2).map(w => w(1).timestamp - w(0).timestamp).toArray.sorted
          // true median: even counts average the two middle gaps
          // (integer mean — spacings are epoch-milli longs)
          val stepMs =
            if (gaps.length % 2 == 1) gaps(gaps.length / 2)
            else (gaps(gaps.length / 2 - 1) + gaps(gaps.length / 2)) / 2
          val last = pts.last.timestamp
          // HALF_UP like Spark/DuckDB round() — math.rint is half-even
          // and would diverge from the oracle's round() at exact ties
          (1 to horizon).iterator.map(h =>
            (tag, h.toLong, last + h * stepMs,
              BigDecimal(level + h * trend)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
      .toDF("tag", "step", "ts", "yhat")
      .orderBy(col("tag"), col("step"))
  }

  /** h-step-ahead additive Holt-Winters (triple exponential smoothing)
    * forecasts per tag: level + trend + a `period`-slot seasonal
    * component. The classic seasonal-metric forecaster (daily counts
    * with a weekly cycle → period 7).
    *
    * Same execution shape and determinism contract as [[holtLinear]]:
    * one groupByKey shuffle, a fixed-order sequential fold per series
    * (feedback recurrence — not expressible as a window), outputs
    * rounded to 4. With binary-exact weights and integer-valued inputs
    * the fold replays bit-for-bit in any IEEE engine, which is what
    * makes the DuckDB recursive-CTE oracle exact.
    *
    * Init (standard): level = mean of season 1, trend = (mean of
    * season 2 − mean of season 1)/period, seasonal_j = y_j − level.
    * Series shorter than 2·period emit nothing (no seasonal evidence).
    * On a pure seasonal signal (pattern repeated, no drift) the
    * recurrence is a FIXED POINT — level/trend/seasonals don't move
    * and the forecast replays the pattern exactly — pinned in the
    * spec.
    */
  def holtWinters(ts: Dataset[graft.model.TS], alpha: Double = 0.5,
                  beta: Double = 0.25, gamma: Double = 0.25,
                  period: Int = 7, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0,1]")
    require(beta >= 0 && beta <= 1, s"beta=$beta out of [0,1]")
    require(gamma >= 0 && gamma <= 1, s"gamma=$gamma out of [0,1]")
    require(period >= 2, s"period=$period must be >= 2")
    require(horizon >= 1, s"horizon=$horizon must be >= 1")
    val spark = ts.sparkSession
    import spark.implicits._
    ts.groupByKey(_.tag)
      .flatMapGroups { (tag, rows) =>
        val pts = rows.toArray.sortBy(_.timestamp)
        val n = pts.length
        if (n < 2 * period) Iterator.empty
        else {
          val ys = pts.map(_.value)
          // left-to-right sums, mirrored by the oracle's explicit
          // element additions — fold order is part of the contract
          val mean1 = ys.take(period).sum / period
          val mean2 = ys.slice(period, 2 * period).sum / period
          var level = mean1
          var trend = (mean2 - mean1) / period
          val seas = Array.tabulate(period)(j => ys(j) - mean1)
          (period until n).foreach { t =>
            val phase = t % period
            val sOld = seas(phase)
            val newLevel = alpha * (ys(t) - sOld) + (1 - alpha) * (level + trend)
            trend = beta * (newLevel - level) + (1 - beta) * trend
            seas(phase) = gamma * (ys(t) - newLevel) + (1 - gamma) * sOld
            level = newLevel
          }
          val gaps = pts.sliding(2).map(w => w(1).timestamp - w(0).timestamp).toArray.sorted
          val stepMs =
            if (gaps.length % 2 == 1) gaps(gaps.length / 2)
            else (gaps(gaps.length / 2 - 1) + gaps(gaps.length / 2)) / 2
          val last = pts.last.timestamp
          (1 to horizon).iterator.map { h =>
            val yhat = level + h * trend + seas((n + h - 1) % period)
            (tag, h.toLong, last + h * stepMs,
              BigDecimal(yhat).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
      .toDF("tag", "step", "ts", "yhat")
      .orderBy(col("tag"), col("step"))
  }

  /** Exponentially-weighted moving average over a BOUNDED trailing
    * frame of `frameRows` points per series: collect the frame
    * (`collect_list` over a rows-window), then fold it left with the
    * EWMA recurrence `acc*(1-alpha) + alpha*x`, initialized at the
    * frame's oldest point.
    *
    * Unlike [[holtLinear]] (whole-series feedback, imperative by
    * necessity), the bounded frame turns the recurrence into a pure
    * scan-stage array fold: one shuffle to cluster each series, a
    * partitioned window, and a codegen'd `aggregate` over ≤ frameRows
    * elements per row. Both engines fold the SAME array in the SAME
    * order (Spark `aggregate` == DuckDB `list_reduce`), so results are
    * bit-replayable and the query is oracle-checkable — the reason to
    * prefer the bounded frame over the unbounded recurrence at 100 TB
    * is the same reason it replays: no cross-partition feedback.
    *
    * Expects one row per (series key, tsCol); emits the input grid plus
    * `ewma` rounded to 4 decimals.
    */
  def ewmaBounded(grid: DataFrame, keyCols: Seq[String], tsCol: String,
                  valCol: String, alpha: Double = 0.3,
                  frameRows: Int = 16): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0,1]")
    require(frameRows >= 1, s"frameRows=$frameRows must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(-(frameRows - 1), 0)
    val frame = collect_list(col(valCol)).over(w)
    grid.withColumn("__frame", frame)
      .withColumn("ewma", round(aggregate(
        slice(col("__frame"), lit(2), greatest(size(col("__frame")) - 1, lit(0))),
        element_at(col("__frame"), 1),
        (acc, x) => acc * lit(1 - alpha) + lit(alpha) * x), 4))
      .drop("__frame")
      .orderBy(keyCols.map(col) :+ col(tsCol): _*)
  }
}

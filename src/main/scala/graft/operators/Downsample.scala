package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
  * the standard time-series visualization downsample: keep the
  * `threshold` points that preserve the series' visual shape).
  *
  * Scale shape: like [[Forecast.holtLinear]], the point selection is a
  * feedback recurrence (each bucket's pick depends on the PREVIOUS
  * pick), so it folds sequentially per series after one groupByKey
  * shuffle. LTTB is a VISUALIZATION operator: its input is a
  * bucket-aggregated series (thousands of points), never the raw 100
  * TB tick stream — downsample raw ticks with [[GapFill.bucketCounts]]
  * / OHLC first, then LTTB the result for the chart.
  *
  * Deterministic: input order pinned by (timestamp, tag) uniqueness +
  * explicit sort; area ties keep the EARLIEST point; no RNG. The
  * feedback recurrence replays in a DuckDB recursive CTE (the driver
  * query's oracle: precomputed bucket ranges + next-bucket averages,
  * correlated argmax per step carrying the previous pick), and the
  * spec additionally gates against an independent sequential
  * reference implementation.
  */
object Downsample {

  /** The sequential LTTB kernel over one series (exposed for the
    * spec's reference comparison): returns the kept points in time
    * order. Series with ≤ threshold points (or threshold < 3) pass
    * through unchanged.
    */
  private[graft] def lttbKernel(pts: Array[(Long, Double)],
                                threshold: Int): Array[(Long, Double)] = {
    val n = pts.length
    if (threshold < 3 || n <= threshold) return pts
    val out = Array.newBuilder[(Long, Double)]
    out += pts(0)
    val nb = threshold - 2 // interior buckets over pts(1..n-2)
    var prev = pts(0)
    var b = 0
    while (b < nb) {
      // interior index ranges [lo, hi) — integer arithmetic, exact
      val lo = 1 + (b.toLong * (n - 2) / nb).toInt
      val hi = 1 + ((b + 1).toLong * (n - 2) / nb).toInt
      // the "third point": average of the NEXT bucket (or the last
      // point for the final bucket)
      val (nlo, nhi) =
        if (b + 1 < nb) (1 + ((b + 1).toLong * (n - 2) / nb).toInt,
          1 + ((b + 2).toLong * (n - 2) / nb).toInt)
        else (n - 1, n)
      var sx = 0.0; var sy = 0.0
      var j = nlo
      while (j < nhi) { sx += pts(j)._1.toDouble; sy += pts(j)._2; j += 1 }
      val ax = sx / (nhi - nlo); val ay = sy / (nhi - nlo)
      var best = lo; var bestArea = -1.0
      var i = lo
      while (i < hi) {
        val area = math.abs(
          (prev._1.toDouble - ax) * (pts(i)._2 - prev._2)
            - (prev._1.toDouble - pts(i)._1.toDouble) * (ay - prev._2))
        if (area > bestArea) { bestArea = area; best = i } // ties: earliest
        i += 1
      }
      out += pts(best)
      prev = pts(best)
      b += 1
    }
    out += pts(n - 1)
    out.result()
  }

  /** Per-tag LTTB over the TS view: keeps ≤ `threshold` points per
    * series. Output (tag, timestamp, value), time-ordered.
    */
  def lttb(ts: Dataset[graft.model.TS], threshold: Int): DataFrame = {
    require(threshold >= 3, s"threshold=$threshold must be >= 3")
    val spark = ts.sparkSession
    import spark.implicits._
    ts.groupByKey(_.tag)
      .flatMapGroups { (tag, rows) =>
        val pts = rows.toArray.sortBy(_.timestamp)
          .map(p => (p.timestamp, p.value))
        lttbKernel(pts, threshold).iterator.map(p => (tag, p._1, p._2))
      }
      .toDF("tag", "timestamp", "value")
      .orderBy(col("tag"), col("timestamp"))
  }
}

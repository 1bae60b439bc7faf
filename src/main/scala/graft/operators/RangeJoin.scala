package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join (builder brief: "range join" under
  * custom operators — compose existing ops where semantics allow).
  *
  * Spark has no native range-join operator: an inequality-only join
  * falls back to broadcast-nested-loop (O(|points|·|intervals|) work,
  * and undoable when neither side fits a broadcast). Bucketing time
  * into fixed `bucketMs` chunks turns it into an EQUI-join Catalyst
  * shuffles normally: each interval explodes to the chunk ids it
  * covers, each point maps to its single chunk, the join runs on
  * (keys…, chunk), and the exact `[start, end)` predicate refines
  * inside the join stage. A point's chunk intersects a given interval's
  * chunk list at most once, so no dedup pass is needed.
  *
  * Scale notes (100 TB): work is |points| + Σ(interval length ∕
  * bucketMs) join rows — linear, shuffled on (keys, chunk) like any
  * aggregation. Pick `bucketMs` near the typical interval length: too
  * small explodes long intervals into many rows (skew on the interval
  * side), too large funnels many points into few chunks (skew on the
  * join key). AQE's skew-join split handles residual hot chunks.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` whose `[startCol, endCol)`
    * range contains `pointTs`, matching on `keys` first. Columns from
    * both sides survive; `bucketMs` must be positive.
    */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keys: Seq[String], bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs=$bucketMs must be > 0")
    // floor-div via `div` (ANSI-safe integer division, negative-correct
    // enough here: timestamps are nonnegative epoch values)
    val p = points.withColumn("__chunk", expr(s"$pointTs div $bucketMs"))
    val iv = intervals.withColumn("__chunk",
      explode(sequence(expr(s"$startCol div $bucketMs"), expr(s"$endCol div $bucketMs"))))
    p.join(iv, keys :+ "__chunk")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__chunk")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the canonical time-series join the
  * reference lacks entirely (SURVEY.md §2.8).
  *
  * Composed from built-ins per the preference ladder (builder brief):
  * union the two sides with a side marker, one window pass carrying the
  * last-seen right values forward, keep left rows. Exactly one shuffle
  * (the window's partitioning) — same cost shape as a sort-merge join.
  * A right row at the same instant matches (`<=` semantics, right
  * sorted before left on ties), like DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Scale notes: partition by join `keys` — state per window partition is
  * one row of carried values, and key cardinality spreads the sort.
  * With no keys the window degenerates to a single partition; for keyless
  * as-of at 100 TB, range-partition by time and broadcast per-partition
  * boundary rows instead (documented trade; keyed is the common case).
  */
object AsOfJoin {

  /** For each left row: the latest right row with
    * `right.timeCol <= left.timeCol` on equal `keys`, within an optional
    * `tolerance` (millis). Right columns `valueCols` are emitted (null
    * when no prior right row), plus `asof_time` (the matched right time).
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftTime: String, rightTime: String,
           keys: Seq[String], valueCols: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // the value-column tiebreaker makes the carried row deterministic
    // when several right rows share one (keys, time) — the MAX value
    // tuple wins (last in ascending order). Ordering by the values
    // themselves (not a hash of them) keeps the rule mirrorable in
    // plain SQL: `ORDER BY r.t DESC, r.<value> DESC ... rn = 1`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col("__t"), col("__side")) ++
        valueCols.map(c => col(s"__r_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedTime = last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w)
    val carried = valueCols.foldLeft(
      unioned.withColumn("__asof_t", matchedTime)) { (df, c) =>
      df.withColumn(s"__v_$c",
        last(when(col("__side") === 0, col(s"__r_$c")), ignoreNulls = true).over(w))
    }

    val inTol = tolerance match {
      case Some(tol) => col("__asof_t").isNotNull && (col("__t") - col("__asof_t") <= tol)
      case None => col("__asof_t").isNotNull
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        Seq(when(inTol, col("__asof_t")).as("asof_time")) ++
        valueCols.map(c => when(inTol, col(s"__v_$c")).as(s"asof_$c")): _*)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** SQL gap-filling vocabulary — the TimescaleDB `time_bucket_gapfill`
  * / `locf()` / `interpolate()` surface (the engine's
  * [[graft.engine.ContinuousAggregate.answerGapFill]] and the HTTP
  * `?gapfill=` route already serve the shape; this gives it the
  * plain-SQL spelling, completing the three-surface story the counter
  * family has):
  *
  * {{{
  * SELECT time_bucket_gapfill(3600000, timestamp) AS bucket,
  *        locf(avg(value)) AS v
  * FROM ts_view
  * WHERE timestamp >= :ge AND timestamp < :lt
  * GROUP BY 1 [, tag]
  * }}}
  *
  * Unlike `time_bucket` (a pure parse-time expansion) or the counter
  * folds (exact raw aggregates on their own), gap-filling CANNOT be
  * expressed as an expression rewrite: it adds ROWS the grouped
  * aggregate never produces (one per empty bucket of a dense spine).
  * So these functions expand to MARKER expressions — analyzable,
  * optimizable placeholders that [[graft.engine.RollupSqlRewrite]]
  * replaces wholesale with a densify-and-fill plan (rollup-refolded
  * observed buckets when a grain-compatible rollup is registered, the
  * raw bucketed aggregate otherwise, then a spine fan-out + one window
  * pass per fill). A marker that survives to execution THROWS with an
  * actionable message instead of silently returning the sparse result
  * — the same contract as TimescaleDB, whose gapfill errors without
  * its custom executor node.
  *
  * Fill policies (each wraps an aggregate in the SELECT list):
  *  - bare NULLABLE aggregate (sum/avg/min/max) — dense spine, empty
  *    buckets NULL (`Fill.None`);
  *  - `gapfill_null(agg)` — the same, for NON-nullable aggregates
  *    (`count(*)`): post-analysis a rule cannot raise an output's
  *    nullability, so the nullable marker is what lets the analyzed
  *    schema say "gap rows are NULL" (a bare count DECLINES loudly);
  *    `coalesce(gapfill_null(count(*)), 0)` is the zero-fill spelling;
  *  - `locf(agg)` — last observed bucket value carried forward per
  *    series (buckets before the first observation stay NULL);
  *  - `interpolate(agg)` — exact linear interpolation between the
  *    nearest observed buckets either side (edges stay NULL); the
  *    aggregate must be DOUBLE-typed (cast inside the call).
  *
  * Registered automatically by [[graft.engine.RollupSqlRewrite.register]]
  * (idempotent), or directly via [[register]].
  */
object GapFillFunctions {

  /** The error a marker raises if a plan escapes the rewrite — kept in
    * one place so the spec can pin it. */
  private[graft] val UnroutedMsg: String =
    "time_bucket_gapfill/locf/interpolate did not rewrite to a gapfill " +
      "plan: the query must be a grouped aggregate over a registered " +
      "TimeSeriesStore current() view (RollupSqlRewrite.register), " +
      "grouped by the time_bucket_gapfill key (plus optionally tag), " +
      "with explicit aligned `timestamp >= lo AND timestamp < hi` " +
      "bounds. Shapes the rewrite cannot serve fail at plan time with " +
      "the specific reason; reaching this error means the source was " +
      "never registered or the markers were used outside a GROUP BY " +
      "aggregate."

  sealed trait FillKind
  case object Locf extends FillKind
  case object Interp extends FillKind
  /** Explicit "gaps stay NULL" — needed (vs a bare aggregate) when the
    * aggregate's analyzed type is NON-nullable (`count(*)`): an
    * optimizer rule cannot raise an output's nullability after
    * analysis, so the nullable marker is what carries "this column has
    * NULL gap rows" through the analyzer. `coalesce(gapfill_null(…),
    * 0)` is the zero-fill spelling (a coalesce around the bare
    * non-nullable aggregate would be stripped by the optimizer before
    * the rewrite ever sees it). */
  case object NullFill extends FillKind

  /** Marker grouping key: `time_bucket_gapfill(widthMs, ts)`. Carries
    * the tumbling bucket's type (LONG epoch-ms) through analysis;
    * replaced by the rewrite, throws if executed. */
  case class GapfillBucket(width: Expression, ts: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(width, ts)
    override def dataType: DataType = LongType
    override def nullable: Boolean = ts.nullable
    // never constant-fold a marker (literal args would make the
    // default children-foldable definition evaluate — and throw —
    // inside the optimizer's ConstantFolding, before the rewrite runs)
    override def foldable: Boolean = false
    override def prettyName: String = "time_bucket_gapfill"
    override def eval(input: InternalRow): Any =
      throw new UnsupportedOperationException(UnroutedMsg)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(width = newChildren(0), ts = newChildren(1))
  }

  /** Marker fill wrapper: `locf(agg)` / `interpolate(agg)` around an
    * aggregate in the SELECT list. Type-transparent; replaced by the
    * rewrite's window pass, throws if executed. */
  case class GapfillFill(child: Expression, kind: FillKind)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = true
    override def foldable: Boolean = false
    override def prettyName: String = kind match {
      case Locf => "locf"
      case Interp => "interpolate"
      case NullFill => "gapfill_null"
    }
    override def eval(input: InternalRow): Any =
      throw new UnsupportedOperationException(UnroutedMsg)
    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column forms (SQL-callable after [[register]]). */
  def timeBucketGapfill(widthMs: Column, ts: Column): Column =
    call_function("time_bucket_gapfill", widthMs, ts)
  def locf(c: Column): Column = call_function("locf", c)
  def interpolate(c: Column): Column = call_function("interpolate", c)
  def gapfillNull(c: Column): Column = call_function("gapfill_null", c)

  /** Register the SQL functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "time_bucket_gapfill", exprs => {
        require(exprs.size == 2,
          s"time_bucket_gapfill(widthMs, ts) takes 2 arguments, got ${exprs.size}")
        GapfillBucket(exprs.head, exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "locf", exprs => {
        require(exprs.size == 1, s"locf(agg) takes 1 argument, got ${exprs.size}")
        GapfillFill(exprs.head, Locf)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interpolate", exprs => {
        require(exprs.size == 1,
          s"interpolate(agg) takes 1 argument, got ${exprs.size}")
        GapfillFill(exprs.head, Interp)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gapfill_null", exprs => {
        require(exprs.size == 1,
          s"gapfill_null(agg) takes 1 argument, got ${exprs.size}")
        GapfillFill(exprs.head, NullFill)
      }, "built-in")
  }
}

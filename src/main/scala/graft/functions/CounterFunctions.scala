package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions.call_function

/** SQL counter-family vocabulary — the TimescaleDB `counter_agg` /
  * `time_weight('LOCF')` surface (SURVEY §2.8's north star names;
  * reference has no SQL surface, this extends ours): parse-time
  * expansions into ORDERED-FOLD expression trees that are (a) exact
  * raw-semantics aggregates on their own — `collect_list` → `sort_array`
  * → `aggregate(...)` walks every consecutive (timestamp, value) pair
  * per group, the same pair walk [[graft.operators.TsAnalytics]] and
  * the HTTP routes perform — and (b) recognizable by
  * [[graft.engine.RollupSqlRewrite]], which swaps them for O(buckets)
  * refolds over a counter-mode [[graft.engine.ContinuousAggregate]]
  * (per-bucket stored `incr`/`n_resets`/`twsum` + boundary pairs
  * re-derived from the first/last witnesses).
  *
  *  - `counter_increase(ts, value)` — PromQL reset-aware total
  *    increase: Σ over consecutive pairs of (v ≥ prev ? v − prev : v),
  *    0 for the group's first point. DOUBLE. Exact for integer-valued
  *    counters; for fractional values the rollup refold re-associates
  *    the float sum (the caveat every Sum refold already carries).
  *  - `counter_resets(ts, value)` — number of resets (v < prev).
  *    BIGINT, exact.
  *  - `time_weight_locf(ts, value)` — LOCF time-weighted average:
  *    Σ round(prev·100)·(ts − prev_ts) in exact decimal(38,0), then
  *    `round(area / 100 / (max(ts) − min(ts)), 4)` — bit-matching
  *    [[graft.operators.TsAnalytics.timeWeightedAvg]] and the
  *    `answerTimeWeighted` refold (same scaled-integer arithmetic,
  *    same finish). Single-sample groups (span 0) are CASE-guarded to
  *    NULL — on ANSI sessions (the Spark 4 default) an unguarded
  *    0-division would throw, not NULL.
  *  - `counter_rate(ts, value)` — increase / span-in-seconds (PromQL
  *    `rate` over the group's own span). NULL on single-sample groups
  *    (CASE-guarded span). Pure COMPOSITION of the increase fold and
  *    min/max-timestamp aggregates — routes and falls back through
  *    the machinery the increase already has.
  *  - `counter_delta(ts, value)` — last − first, NOT reset-aware
  *    (TimescaleDB `delta`). Expands to `max_by − min_by` over the
  *    (value, ts) pairs: constant state on the raw path, refolds from
  *    the buckets' first/last witnesses on the rollup path.
  *
  * All three share one fold SHAPE over the same collected struct; on
  * the rollup-refold path the rewrite builds them around a single
  * shared CollectList instance, so increase + resets + n_points pay
  * one O(buckets-per-group) buffer. The raw fold is the FALLBACK
  * path (each call site carries its own buffer there — aggregate
  * dedup is instance-based): at scale the rewrite serves these from
  * rollup buckets without collecting events at all.
  *
  * The `__gc*` struct-field names are a RESERVED marker namespace: the
  * rewrite recognizes the expansion by them (plus the fold skeleton),
  * so user SQL must reach these shapes only through the registered
  * functions.
  */
object CounterFunctions {

  /** Marker field names of the collected pair struct. */
  private[graft] val TsField = "__gct"
  private[graft] val VField = "__gcv"
  /** Accumulator fields, in struct order. */
  private[graft] val AccFields =
    Seq("__gcp", "__gcpt", "__gci", "__gcr", "__gca")

  sealed trait Kind
  case object Increase extends Kind
  case object Resets extends Kind
  /** The scaled-integer LOCF area (decimal) — `time_weight_locf`
    * wraps it in the /100 / span round(4) finish. */
  case object Area extends Kind

  /** One shared fold template; `%FIELD%` selects what the finish
    * extracts. The acc tracks (prev value, prev ts, increase, resets,
    * area); every arithmetic step mirrors
    * [[graft.engine.ContinuousAggregate]]'s counter-mode refresh so the
    * rollup refold is value-identical.
    */
  private val foldSql =
    s"""aggregate(
       |  sort_array(collect_list(named_struct(
       |    '$TsField', __graft_ts_arg, '$VField', __graft_v_arg))),
       |  named_struct(
       |    '__gcp', CAST(NULL AS DOUBLE),
       |    '__gcpt', CAST(NULL AS BIGINT),
       |    '__gci', CAST(0 AS DOUBLE),
       |    '__gcr', CAST(0 AS BIGINT),
       |    '__gca', CAST(0 AS DECIMAL(38,0))),
       |  (a, x) -> named_struct(
       |    '__gcp', x.$VField,
       |    '__gcpt', x.$TsField,
       |    '__gci', a.__gci + (CASE WHEN a.__gcp IS NULL THEN CAST(0 AS DOUBLE)
       |                             WHEN x.$VField >= a.__gcp THEN x.$VField - a.__gcp
       |                             ELSE x.$VField END),
       |    '__gcr', a.__gcr + (CASE WHEN a.__gcp IS NOT NULL AND x.$VField < a.__gcp
       |                             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
       |    '__gca', CAST(a.__gca + (CASE WHEN a.__gcpt IS NULL THEN CAST(0 AS DECIMAL(38,0))
       |                             ELSE CAST(round(a.__gcp * 100) AS DECIMAL(38,0))
       |                                  * (x.$TsField - a.__gcpt) END) AS DECIMAL(38,0))),
       |  a -> a.%FIELD%)""".stripMargin

  private def parsedFold(field: String): Expression =
    CatalystSqlParser.parseExpression(foldSql.replace("%FIELD%", field))

  /** Splice the call-site ts/value expressions into the parsed
    * template (the registry hands us raw argument trees). */
  private def fold(field: String, ts: Expression, v: Expression): Expression =
    parsedFold(field).transformUp {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts == Seq("__graft_ts_arg") => ts
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts == Seq("__graft_v_arg") => v
    }

  /** `time_weight_locf`'s finish over the area fold: the exact
    * scaled-decimal area unscaled and divided by the group's time
    * span, rounded like the engine (`answerTimeWeighted` /
    * `TsAnalytics.timeWeightedAvg`). The span-0 CASE guard makes
    * single-sample groups NULL on BOTH ANSI and legacy sessions —
    * Spark 4 defaults ANSI on, where an unguarded 0-division THROWS
    * (the randomized counter matrix caught exactly that). */
  private def twaFinish(area: Expression, ts: Expression): Expression =
    CatalystSqlParser
      .parseExpression(
        """CASE WHEN max(__graft_ts_arg) > min(__graft_ts_arg)
          |  THEN round(CAST(__graft_area_arg AS DOUBLE) / 100.0D /
          |    CAST(max(__graft_ts_arg) - min(__graft_ts_arg) AS DOUBLE), 4)
          |  ELSE CAST(NULL AS DOUBLE) END""".stripMargin)
      .transformUp {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_area_arg") => area
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_ts_arg") => ts
      }

  /** `counter_rate`'s finish: reset-aware increase divided by the
    * group's time span in SECONDS (PromQL's other household name; ts
    * is epoch-millis throughout the store). Single-sample groups
    * (span 0) yield NULL — the CASE guard, not a 0-division NaN. The
    * whole shape is COMPOSITION over already-recognized pieces (the
    * increase fold + min/max timestamp refolds), so it routes through
    * [[graft.engine.RollupSqlRewrite]] with no new recognition and
    * falls back to the window-lag plan with no new machinery. */
  private def rateFinish(incFold: Expression, ts: Expression): Expression =
    CatalystSqlParser
      .parseExpression(
        """CASE WHEN max(__graft_ts_arg) > min(__graft_ts_arg)
          |  THEN __graft_inc_arg /
          |    (CAST(max(__graft_ts_arg) - min(__graft_ts_arg) AS DOUBLE) / 1000.0D)
          |  ELSE CAST(NULL AS DOUBLE) END""".stripMargin)
      .transformUp {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_inc_arg") => incFold
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_ts_arg") => ts
      }

  /** `counter_delta(ts, value)` — TimescaleDB's `delta`: last value
    * minus first value, NOT reset-aware. Expands to
    * `max_by(v, ts) − min_by(v, ts)`: constant aggregation state (no
    * collected array, no memory cliff on any path) and already inside
    * the rollup refold vocabulary (buckets store first/last witnesses),
    * so it routes wherever first/last do. */
  private def deltaExpansion(ts: Expression, v: Expression): Expression =
    CatalystSqlParser
      .parseExpression(
        """max_by(__graft_v_arg, __graft_ts_arg)
          | - min_by(__graft_v_arg, __graft_ts_arg)""".stripMargin)
      .transformUp {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_ts_arg") => ts
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_v_arg") => v
      }

  /** Column forms (SQL-callable after [[register]]). */
  def counterIncrease(ts: Column, v: Column): Column =
    call_function("counter_increase", ts, v)
  def counterResets(ts: Column, v: Column): Column =
    call_function("counter_resets", ts, v)
  def timeWeightLocf(ts: Column, v: Column): Column =
    call_function("time_weight_locf", ts, v)
  def counterRate(ts: Column, v: Column): Column =
    call_function("counter_rate", ts, v)
  def counterDelta(ts: Column, v: Column): Column =
    call_function("counter_delta", ts, v)

  /** Register the three SQL functions on a session (idempotent;
    * [[graft.engine.RollupSqlRewrite.register]] calls this alongside
    * [[TimeFunctions.register]]). */
  def register(spark: SparkSession): Unit = {
    def reg2(name: String)(build: (Expression, Expression) => Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => {
          require(exprs.size == 2,
            s"$name(ts, value) takes 2 arguments, got ${exprs.size}")
          build(exprs.head, exprs(1))
        }, "built-in")
    reg2("counter_increase")((ts, v) => fold("__gci", ts, v))
    reg2("counter_resets")((ts, v) => fold("__gcr", ts, v))
    reg2("time_weight_locf")((ts, v) => twaFinish(fold("__gca", ts, v), ts))
    reg2("counter_rate")((ts, v) => rateFinish(fold("__gci", ts, v), ts))
    reg2("counter_delta")(deltaExpansion)
  }

  /** Recognize a (resolved, optimized) expansion of one of the three
    * registered functions: returns (kind, tsExpr, valueExpr). Keys on
    * the reserved `__gc*` marker fields of the collected struct plus
    * the fold skeleton — `aggregate(sort_array(collect_list(struct)),
    * zero, merge, a -> a.field)` — AND a structural check of the merge
    * lambda's arithmetic ([[mergeShapeOk]], round-12 ADVICE #3):
    * field names alone would let hand-written SQL reusing the reserved
    * namespace with DIFFERENT fold logic be silently swapped to
    * counter-rollup semantics. The finish field selects the kind. */
  private[graft] def matchFold(e: Expression)
      : Option[(Kind, Expression, Expression)] = e match {
    case ArrayAggregate(
          SortArray(ae: AggregateExpression, Literal(true, _)),
          _, merge, LambdaFunction(gsf: GetStructField, _, _))
        if !ae.isDistinct && ae.filter.isEmpty && mergeShapeOk(merge) =>
      ae.aggregateFunction match {
        case CollectList(cns: CreateNamedStruct, _, _) =>
          cns.children match {
            case Seq(Literal(n1, _), ts, Literal(n2, _), v)
                if n1.toString == TsField && n2.toString == VField =>
              val field = gsf.name.getOrElse(
                AccFields.lift(gsf.ordinal).getOrElse(""))
              val kind = field match {
                case "__gci" => Some(Increase)
                case "__gcr" => Some(Resets)
                case "__gca" => Some(Area)
                case _       => None
              }
              kind.map((_, ts, v))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** Structural verification of the fold's MERGE lambda — the reserved
    * names prove provenance only if the arithmetic alongside them is
    * the registered expansion's (round-12 ADVICE #3: hand-written
    * `named_struct('__gct', …)` with different merge logic must NOT be
    * rewritten to counter semantics). Checks, cast-tolerantly (the
    * analyzer inserts promotions the optimizer may later strip):
    * struct field names == [[AccFields]] in order; `p`/`pt` carry the
    * element's value/ts; the increase term is
    * `a.__gci + CASE IsNull(a.p) → 0 | x.v ≥ a.p → x.v − a.p | x.v`;
    * the resets term adds a CaseWhen keyed on `x.v < a.p`; the area
    * term adds a CaseWhen keyed on `IsNull(a.__gcpt)` whose live
    * branch multiplies a rounding of `a.p` by `x.ft − a.pt`. Anything
    * off-shape declines recognition (raw execution, never wrong). */
  private[graft] def mergeShapeOk(merge: Expression): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => strip(c)
      case _ => e
    }
    merge match {
      case LambdaFunction(cns: CreateNamedStruct, Seq(a, x), _)
          if cns.names.map(_.toString) == AccFields =>
        def aF(e: Expression, n: String): Boolean = strip(e) match {
          case GetStructField(av, _, Some(name)) =>
            av.semanticEquals(a) && name == n
          case _ => false
        }
        def xF(e: Expression, n: String): Boolean = strip(e) match {
          case GetStructField(xv, _, Some(name)) =>
            xv.semanticEquals(x) && name == n
          case _ => false
        }
        cns.valExprs match {
          case Seq(p, pt, bi, br, ba) =>
            val pOk = xF(p, VField)
            val ptOk = xF(pt, TsField)
            val biOk = strip(bi) match {
              case Add(acc, cw, _) => aF(acc, "__gci") && (strip(cw) match {
                case CaseWhen(Seq((c1, z), (c2, sub)), Some(el)) =>
                  (c1 match {
                    case IsNull(f) => aF(f, "__gcp")
                    case _ => false
                  }) && strip(z).foldable &&
                  (c2 match {
                    case GreaterThanOrEqual(l, r) =>
                      xF(l, VField) && aF(r, "__gcp")
                    case _ => false
                  }) &&
                  (strip(sub) match {
                    case Subtract(l, r, _) => xF(l, VField) && aF(r, "__gcp")
                    case _ => false
                  }) && xF(el, VField)
                case _ => false
              })
              case _ => false
            }
            val brOk = strip(br) match {
              case Add(acc, cw, _) => aF(acc, "__gcr") && (strip(cw) match {
                case CaseWhen(Seq((c1, _)), Some(_)) => c1 match {
                  case And(IsNotNull(f), LessThan(l, r)) =>
                    aF(f, "__gcp") && xF(l, VField) && aF(r, "__gcp")
                  case _ => false
                }
                case _ => false
              })
              case _ => false
            }
            val baOk = strip(ba) match {
              case Add(acc, cw, _) => aF(acc, "__gca") && (strip(cw) match {
                case CaseWhen(Seq((c1, _)), Some(mul)) =>
                  (c1 match {
                    case IsNull(f) => aF(f, "__gcpt")
                    case _ => false
                  }) &&
                  mul.exists {
                    case Subtract(l, r, _) => xF(l, TsField) && aF(r, "__gcpt")
                    case _ => false
                  } &&
                  mul.exists {
                    case Round(m, _, _) => m.exists {
                      case Multiply(l, _, _) => aF(l, "__gcp")
                      case _ => false
                    }
                    case _ => false
                  }
                case _ => false
              })
              case _ => false
            }
            pOk && ptOk && biOk && brOk && baOk
          case _ => false
        }
      case _ => false
    }
  }
}

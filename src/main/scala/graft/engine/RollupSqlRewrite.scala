package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, OneRowRelation, Project, Union, Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}
import scala.collection.concurrent.TrieMap

/** SQL-level continuous-aggregate routing: a Catalyst optimizer rule
  * that rewrites PLAIN SQL / DataFrame aggregates over a registered
  * [[TimeSeriesStore]] to refold the store's [[ContinuousAggregate]]
  * rollup — TimescaleDB's "the planner uses the cagg automatically",
  * done the Spark-native way ([[org.apache.spark.sql.catalyst.rules.Rule]]
  * on the optimized logical plan, installed via the public
  * `spark.experimental.extraOptimizations` hook, so it attaches to a
  * LIVE session — no session rebuild, no config restart).
  *
  * [[QueryEngine.execute(store,qm,rollups)*]] already routes the
  * reference's QueryModel API; this rule extends the same economics —
  * O(buckets + hot tail) instead of O(events) — to users who never see
  * a QueryModel: `SELECT tag, sum(value) FROM ts GROUP BY tag` over
  * `store.current()` (or a temp view of it) is rewritten to scan
  * rollup segments.
  *
  * Eligibility (anything else is left untouched — the rewrite must
  * never change semantics, only the plan):
  *  - the aggregate's source subtree is exactly a CURRENT-snapshot
  *    scan of a registered store: every parquet leaf is one of the
  *    store's segment dirs and the per-leaf `g_day` pruning sets are
  *    byte-equal to [[TimeSeriesStore.snapshotSignature]]. A DataFrame
  *    captured BEFORE a later mutation fails this check and keeps its
  *    raw plan — snapshot isolation is preserved, a stale snapshot is
  *    never silently upgraded to fresher rollup data;
  *  - predicates: `timestamp` range bounds aligned to the rollup grain
  *    (`>th`/`<=` convert to `>=`/`<` at millisecond granularity), plus
  *    arbitrary deterministic predicates over `tag` ONLY (tag survives
  *    rollup at full granularity, so they apply verbatim); `IsNotNull`
  *    on the non-null store columns is vacuous and ignored;
  *  - aggregates over `value`: sum / min / max / avg, plus count of
  *    any non-null column, plus `min_by(value, timestamp)` /
  *    `max_by(value, timestamp)` (first/last — refold exactly from
  *    the buckets' stored (first_ts, first_val, last_ts, last_val)) —
  *    each refolds from the rollup's per-bucket partials with SPARK
  *    semantics (empty global sum/avg/min/max → null, count → 0 via
  *    coalesce), not the reference's QueryModel semantics (that
  *    surface belongs to [[QueryEngine]]);
  *  - APPROXIMATE aggregates over `value`, when a registered rollup is
  *    sketch-bearing ([[ContinuousAggregate.isSketched]]):
  *    `percentile_approx(value, q)` (scalar literal q) refolds by
  *    merging the per-bucket GK summaries
  *    ([[graft.functions.QSketchMergeAgg]]), and
  *    `approx_count_distinct(value)` by unioning the per-bucket HLL
  *    sketches. These functions' contract is already "any estimate
  *    within tolerance", so swapping the estimator stays within
  *    contract — but the ERROR BOUND becomes the rollup's own
  *    (rank ±ε·n at the construction-time `sketchRelErr`; HLL ~1.6%
  *    std. error at the default lgK), overriding any call-site
  *    accuracy argument, exactly like TimescaleDB's `approx_percentile`
  *    over a stored `percentile_agg`. Registering a sketch-bearing
  *    rollup IS the opt-in; with only plain rollups registered these
  *    shapes are never rewritten. Empty-input semantics preserved
  *    (percentile → null, distinct count → 0).
  *    DELIBERATELY NOT ROUTED: `regr_slope`/`regr_*` — a stats-mode
  *    rollup ([[ContinuousAggregate.answerRegression]]) can answer
  *    them in O(buckets) and MORE accurately (exact decimal moments vs
  *    Spark's running double moments), but NOT result-identically,
  *    and these functions' contract (unlike percentile_approx's) is a
  *    deterministic float — regression stays an explicit-surface
  *    opt-in;
  *  - GAP-FILLING has its own SQL spelling (`time_bucket_gapfill` +
  *    `locf`/`interpolate`/`gapfill_null` markers,
  *    [[graft.functions.GapFillFunctions]]) handled by
  *    [[gapfillRewrite]] — a whole-plan replacement rather than an
  *    expression swap, because gap rows do not exist in the user's
  *    aggregate; unlike every other entry it has NO raw execution and
  *    fails loudly when ineligible;
  *  - grouping: global, by `tag`, by `g_day` (the store's day
  *    partition column — exact iff the grain divides a day), by a
  *    tumbling-window key `(timestamp DIV w) * w` with `w` a multiple
  *    of the rollup grain (each bucket then lands in exactly one
  *    window), or any combination. Composition above the aggregate
  *    functions (e.g. `round(avg(value), 4)`, `sum(value) + 1`) is
  *    preserved — only the AggregateExpression leaves are swapped.
  *
  * The rewrite builds on [[ContinuousAggregate.currentBase]], so it is
  * exact at ANY rollup staleness (real-time hybrid: carried buckets +
  * raw hot-tail re-aggregation) and declines (None → no rewrite) when
  * no refresh ever ran or the diff base was vacuumed. Among registered
  * rollups the coarsest eligible grain wins, same policy as the
  * engine-routed path. Float caveat as documented on `answer()`: Sum /
  * Avg refold per-day partial sums — the reassociation already
  * inherent in any distributed aggregation.
  *
  * Output attribute ids of the rewritten Aggregate are preserved
  * (aliases keep their exprIds; passthrough grouping attrs are
  * re-aliased under their original ids), so parents of the aggregate —
  * sorts, projections, havings — resolve unchanged.
  */
final class RollupSqlRewrite private () extends Rule[LogicalPlan]
    with PredicateHelper {

  /** store rootDir → (store, registered rollups). */
  private[engine] val registered =
    TrieMap.empty[String, (TimeSeriesStore, Seq[ContinuousAggregate])]

  private val DayMs = 86400000L

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case agg: Aggregate if hasGapfillMarkers(agg) =>
        gapfillRewrite(agg)
      case agg: Aggregate =>
        (if (registered.isEmpty) None else tryRewrite(agg))
          .orElse(lagFallback(agg))
          .getOrElse(agg)
    }

  /** Marker scan for [[gapfillRewrite]]: the bucket marker may have
    * been extracted into the child Project by the optimizer's
    * PullOutGroupingExpressions, so look one Project down too. */
  private def hasGapfillMarkers(agg: Aggregate): Boolean = {
    import graft.functions.GapFillFunctions.{GapfillBucket, GapfillFill}
    def has(e: Expression): Boolean = e.exists {
      case _: GapfillBucket | _: GapfillFill => true
      case _ => false
    }
    agg.expressions.exists(has) || (agg.child match {
      case p: Project => p.projectList.exists(has)
      case _ => false
    })
  }

  /** One parquet leaf of a store scan: segment dir + the g_day set its
    * snapshot filter pins, + every other predicate conjunct. */
  private case class Leaf(segPath: String, days: Set[Long], conds: Seq[Expression])

  /** A destructured source: leaves + the alias definitions of every
    * intermediate Project (the optimizer extracts complex grouping
    * keys into `Project [... AS _groupingexpression]` below the
    * Aggregate — resolving those back to store-column expressions is
    * what lets window groupings match), + at most one Explode
    * generator (`gen` = its output attribute and leaf-resolved array
    * expression — the LATERAL VIEW sliding-window idiom). */
  private case class Src(leaves: Seq[Leaf], defs: Map[ExprId, Expression],
                         gen: Option[(Attribute, Expression)] = None)

  /** Destructure a candidate source subtree into store-scan leaves.
    * Only shapes [[TimeSeriesStore.current]] plans can optimize into
    * are accepted: Union / Project (attrs + deterministic aliases) /
    * Filter / a single Explode [[Generate]] over parquet
    * [[LogicalRelation]]s. Anything else → None.
    */
  private def destructure(plan: LogicalPlan): Option[Src] = plan match {
    case u: Union =>
      val parts = u.children.map(destructure)
      if (parts.forall(p => p.isDefined && p.get.gen.isEmpty)) {
        val srcs = parts.map(_.get)
        // positional def compatibility: the union's output column p
        // must resolve to the SAME leaf expression in every branch.
        // Branches that define an output DIFFERENTLY (the shifted-key
        // sliding-window UNION ALL idiom: branch i projects
        // `(ts DIV s)*s − i·s` under one shared column) must NOT be
        // rewritten — `resolve` sees only the first branch's def, so a
        // single rebuilt Aggregate would silently collapse the other
        // branches' labels AND lose the per-row duplication. Bail to
        // the raw plan (RollupSqlRewriteSpec pins this).
        val compatible = u.output.indices.forall { p =>
          u.children.zip(srcs).map { case (c, s) =>
            val out = c.output(p)
            norm(s.defs.getOrElse(out.exprId, out))
          }.distinct.sizeIs == 1
        }
        if (!compatible) None
        else Some(Src(srcs.flatMap(_.leaves), srcs.flatMap(_.defs).toMap))
      }
      else None
    case g: Generate =>
      // one Explode over an array expression of leaf columns — the
      // LATERAL VIEW sliding-window idiom. `outer` changes row
      // multiplicity on empty arrays; a second generator or a
      // non-Explode generator is outside the vocabulary.
      g.generator match {
        case Explode(arr) if !g.outer && g.generatorOutput.sizeIs == 1 =>
          destructure(g.child).flatMap { src =>
            if (src.gen.isDefined) None
            else {
              val resolved = arr.transformUp {
                case a: AttributeReference if src.defs.contains(a.exprId) =>
                  src.defs(a.exprId)
              }
              Some(src.copy(gen = Some((g.generatorOutput.head, resolved))))
            }
          }
        case _ => None
      }
    case Project(ps, child) if ps.forall {
        case _: AttributeReference => true
        case a: Alias => a.child.deterministic
        case _ => false
      } =>
      destructure(child).map { src =>
        val below = src.defs
        val mine = ps.collect { case a: Alias =>
          // resolve through any lower project first, so every def is
          // in terms of leaf relation attributes
          a.exprId -> a.child.transformUp {
            case ar: AttributeReference if below.contains(ar.exprId) =>
              below(ar.exprId)
          }
        }
        // copy() — NOT a fresh Src — so `gen` survives: dropping it
        // here would hide an Explode under a pruning Project and let
        // the metadata/rollup folds serve a row-multiplied source
        src.copy(defs = below ++ mine)
      }
    case Filter(cond, child) =>
      destructure(child).map { src =>
        val cs = splitConjunctivePredicates(cond)
        src.copy(leaves = src.leaves match {
          case Seq(one) => Seq(one.copy(conds = one.conds ++ cs))
          case many =>
            // a Filter above a Union only happens for conds pushdown
            // chose not to move; attach to every leaf (they must agree
            // cross-leaf anyway)
            many.map(l => l.copy(conds = l.conds ++ cs))
        })
      }
    case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.toList match {
        case p :: Nil => Some(Src(Seq(Leaf(p.toUri.getPath, Set.empty, Nil)), Map.empty))
        case _        => None
      }
    case _ => None
  }

  /** Exprs compared structurally with attribute ids erased — union
    * children carry the same pushed predicates under different ids. */
  private def norm(e: Expression): String =
    e.transform { case a: AttributeReference => UnresolvedAttribute(a.name) }.sql

  private def isAttr(e: Expression, name: String): Boolean = e match {
    case a: AttributeReference => a.name == name
    case _                     => false
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _)         => Some(v.toLong)
    case _                          => None
  }

  /** Split a leaf's conjuncts into (g_day snapshot days, ge bound,
    * lt bound, tag-only conds). None = an unrecognized conjunct. */
  private def classify(conds: Seq[Expression])
      : Option[(Set[Long], Option[Long], Option[Long], Seq[Expression])] = {
    var days = Set.empty[Long]
    var ge: Option[Long] = None
    var lt: Option[Long] = None
    val tagConds = Seq.newBuilder[Expression]
    def tightenGe(v: Long): Unit = ge = Some(ge.fold(v)(math.max(_, v)))
    def tightenLt(v: Long): Unit = lt = Some(lt.fold(v)(math.min(_, v)))
    // bounds on a WINDOW KEY — `time_bucket(w, ts) >= X` and the
    // g_day partition column's range forms — convert to exact ts
    // bounds (tumble = (ts div w)·w over nonneg ts):
    //   tumble ≥ X ⟺ ts ≥ ⌈X/w⌉·w     tumble > X ⟺ ts ≥ (⌊X/w⌋+1)·w
    //   tumble < X ⟺ ts < ⌈X/w⌉·w     tumble ≤ X ⟺ ts < (⌊X/w⌋+1)·w
    // Overflow DECLINES instead of being magnitude-guarded (round-10
    // ADVICE #1): every step — the g_day day→ms unit conversion x0·ww
    // (an epoch-ms literal mistakenly used as a g_day value wraps it)
    // and the ceil/floor window arithmetic — runs under Math.*Exact,
    // and any overflow leaves the conjunct unrecognized (raw plan,
    // never wrong).
    def winLit(e1: Expression, e2: Expression): Option[(Long, Long)] = {
      val w = e1 match {
        case a: AttributeReference if a.name == "g_day" => Some(DayMs)
        case other => windowOf(other)
      }
      for {
        ww <- w
        x0 <- longLit(e2)
        // g_day compares in DAY units; window keys in ms
        x <- if (e1.isInstanceOf[AttributeReference])
               scala.util.Try(Math.multiplyExact(x0, ww)).toOption
             else Some(x0)
      } yield (ww, x)
    }
    def ceilW(x: Long, w: Long): Option[Long] = scala.util.Try(
      Math.multiplyExact(Math.floorDiv(Math.addExact(x, w - 1), w), w)).toOption
    def floorW1(x: Long, w: Long): Option[Long] = scala.util.Try(
      Math.multiplyExact(Math.addExact(Math.floorDiv(x, w), 1), w)).toOption
    conds.foreach {
      case In(a, vs) if isAttr(a, "g_day") && vs.forall(longLit(_).isDefined) =>
        days ++= vs.flatMap(longLit)
      case InSet(a, vs) if isAttr(a, "g_day") =>
        days ++= vs.collect { case l: Long => l; case i: Int => i.toLong }
      case EqualTo(a, l) if isAttr(a, "g_day") && longLit(l).isDefined =>
        days += longLit(l).get
      case EqualTo(l, a) if isAttr(a, "g_day") && longLit(l).isDefined =>
        days += longLit(l).get
      // vacuous null guards the optimizer infers for non-null columns
      case IsNotNull(a) if isAttr(a, "g_day") || isAttr(a, "timestamp") ||
        isAttr(a, "value") => ()
      // timestamp bounds, both operand orders, closed forms normalized
      // to [ge, lt) at millisecond granularity. The `+ 1` conversions
      // (`> l → ge l+1`, `<= l → lt l+1`) mirror the engine path's
      // canonicalTsBounds MaxValue exception (Model.scala): at
      // l == Long.MaxValue the increment would wrap to MinValue and
      // the routed plan would return EVERY bucket where raw returns
      // nothing (`> MaxValue`) or nothing where raw returns everything
      // (`<= MaxValue`) — so MaxValue stays unrecognized (raw plan,
      // never wrong; round-10 "what's wrong" #2).
      case GreaterThanOrEqual(a, l) if isAttr(a, "timestamp") && longLit(l).isDefined =>
        tightenGe(longLit(l).get)
      case LessThanOrEqual(l, a) if isAttr(a, "timestamp") && longLit(l).isDefined =>
        tightenGe(longLit(l).get)
      case GreaterThan(a, l) if isAttr(a, "timestamp") &&
          longLit(l).exists(_ != Long.MaxValue) =>
        tightenGe(longLit(l).get + 1)
      case LessThan(l, a) if isAttr(a, "timestamp") &&
          longLit(l).exists(_ != Long.MaxValue) =>
        tightenGe(longLit(l).get + 1)
      case LessThan(a, l) if isAttr(a, "timestamp") && longLit(l).isDefined =>
        tightenLt(longLit(l).get)
      case GreaterThan(l, a) if isAttr(a, "timestamp") && longLit(l).isDefined =>
        tightenLt(longLit(l).get)
      case LessThanOrEqual(a, l) if isAttr(a, "timestamp") &&
          longLit(l).exists(_ != Long.MaxValue) =>
        tightenLt(longLit(l).get + 1)
      case GreaterThanOrEqual(l, a) if isAttr(a, "timestamp") &&
          longLit(l).exists(_ != Long.MaxValue) =>
        tightenLt(longLit(l).get + 1)
      // window-key / g_day range bounds, both operand orders; a
      // ceil/floor that overflows declines the whole classification
      // (None → raw plan) rather than shipping a wrapped bound
      case GreaterThanOrEqual(e, l) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        ceilW(x, w).fold[Unit](return None)(tightenGe)
      case LessThanOrEqual(l, e) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        ceilW(x, w).fold[Unit](return None)(tightenGe)
      case GreaterThan(e, l) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        floorW1(x, w).fold[Unit](return None)(tightenGe)
      case LessThan(l, e) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        floorW1(x, w).fold[Unit](return None)(tightenGe)
      case LessThan(e, l) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        ceilW(x, w).fold[Unit](return None)(tightenLt)
      case GreaterThan(l, e) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        ceilW(x, w).fold[Unit](return None)(tightenLt)
      case LessThanOrEqual(e, l) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        floorW1(x, w).fold[Unit](return None)(tightenLt)
      case GreaterThanOrEqual(l, e) if winLit(e, l).isDefined =>
        val (w, x) = winLit(e, l).get
        floorW1(x, w).fold[Unit](return None)(tightenLt)
      case c if c.deterministic && c.references.nonEmpty &&
        c.references.forall(_.name == "tag") =>
        tagConds += c
      case _ => return None
    }
    Some((days, ge, lt, tagConds.result()))
  }

  /** `(timestamp DIV w) * w` — the tumbling-window grouping key
    * (also what a registered `time_bucket(w, ts)` expands to). */
  private def windowOf(e: Expression): Option[Long] = e match {
    case m: Multiply => m.left match {
      case idv: IntegralDivide if isAttr(idv.left, "timestamp") =>
        (longLit(idv.right), longLit(m.right)) match {
          case (Some(w1), Some(w2)) if w1 == w2 && w1 > 0 => Some(w1)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  /** `sequence(tumble + (slide − width), tumble, slide)` over the
    * timestamp — what a registered `hop_starts(ts, slide, width)`
    * expands to: the array of sliding-window starts containing the
    * row. Returns (slideMs, widthMs). The width == slide degenerate
    * (lo ≡ tumble) and an explicit Add offset are both accepted.
    */
  private def hopOf(e: Expression): Option[(Long, Long)] = e match {
    case Sequence(lo, hi, Some(step), _) =>
      for {
        s <- windowOf(hi)
        st <- longLit(step)
        if st == s
        width <- lo match {
          case Add(l, r, _) if l.semanticEquals(hi) =>
            longLit(r).filter(_ <= 0).map(c => s - c)
          case l if l.semanticEquals(hi) => Some(s)
          case _ => None
        }
        if width > 0 && width % s == 0
      } yield (s, width)
    case _ => None
  }

  /** FALLBACK rewrite for recognized counter-family folds that did NOT
    * route to a rollup refold (no counter rollup registered, a global
    * multi-tag fold, an ungrouped hop explode, an unregistered source —
    * every shape [[tryRewrite]] declines): swap the
    * `collect_list → sort_array → aggregate` ordered fold for the
    * WINDOW-LAG formulation the engine/HTTP raw twins already use
    * (`lag(v)/lag(ts) OVER (PARTITION BY <group keys> ORDER BY ts, v)`
    * + a plain Sum of the per-pair terms).
    *
    * Round-12 "what's wrong" #2: the collect_list fold was the one raw
    * path whose EXECUTOR MEMORY grows linearly with a single group's
    * event count — one tag's year of raw events in one array. The
    * window-lag plan sorts within partitions (spillable
    * WindowExec) and keeps O(1) aggregation state per group, same
    * exact semantics:
    *  - ordering: `sort_array` on the (ts, v) struct sorts
    *    lexicographically by (ts, v); the window ORDER BY ts, v walks
    *    the identical sequence (ties produce equal-struct neighbors —
    *    any permutation of equal pairs folds to the same terms);
    *  - first element: the fold's null-prev accumulator contributes 0 /
    *    0 / decimal 0; lag's default-null row produces the same term,
    *    and Sum over a non-empty group never returns null for these
    *    never-null terms;
    *  - arithmetic: term-for-term the fold's merge steps (increase
    *    CASE, reset CASE, scaled-decimal area). Long/decimal sums are
    *    exact in any order; the double increase re-associates exactly
    *    like the rollup refold's Sum (the caveat the function doc
    *    already carries).
    * Exactness requires NON-NULL (ts, v): the fold POISONS a group to
    * NULL once a null value enters the arithmetic, while Sum would
    * skip that pair's term — so nullable inputs decline (raw plan,
    * never wrong). Idempotent under the optimizer's fixpoint batch:
    * the rewritten plan contains no ArrayAggregate fold to re-match.
    */
  private def lagFallback(agg: Aggregate): Option[LogicalPlan] = {
    import graft.functions.CounterFunctions
    val folds = agg.aggregateExpressions.flatMap(_.collect {
      case e if CounterFunctions.matchFold(e).isDefined =>
        CounterFunctions.matchFold(e).get
    })
    if (folds.isEmpty) return None
    // every fold in the aggregate must share ONE (ts, v) argument pair:
    // a logical Window node carries a single node-level ordering, so
    // mixed-argument folds (two counters in one SELECT) stay on the raw
    // plan rather than risking a second ordering being silently ignored
    val (ts, v) = (folds.head._2, folds.head._3)
    if (!folds.forall { case (_, t2, v2) =>
        t2.semanticEquals(ts) && v2.semanticEquals(v) }) return None
    if (!ts.deterministic || !v.deterministic ||
      ts.exists(_.isInstanceOf[AggregateExpression]) ||
      v.exists(_.isInstanceOf[AggregateExpression])) return None
    // NULL-exactness: the fold poisons a group to NULL once a null
    // value enters its arithmetic; Sum would skip the term instead. So
    // inputs must be provably non-null — by attribute nullability, or
    // by being the timestamp/value columns of a registered store scan
    // (the store schema declares them non-null and insert enforces it).
    val nonNull = (!ts.nullable && !v.nullable) || {
      def storeCol(e: Expression, n: String) = e match {
        case a: AttributeReference => a.name == n
        case _ => false
      }
      storeCol(ts, "timestamp") && storeCol(v, "value") &&
        destructure(agg.child).exists(src => src.leaves.nonEmpty &&
          registered.values.exists { case (st, _) =>
            src.leaves.forall(_.segPath.startsWith(st.rootDir + "/"))
          })
    }
    if (!nonNull) return None
    // grouping literals can't partition (and don't affect the groups)
    val partition = agg.groupingExpressions.filterNot(_.foldable)
    if (partition.exists(!_.deterministic)) return None
    val order = Seq(SortOrder(ts, Ascending), SortOrder(v, Ascending))
    def lagOf(e: Expression, n: String): Alias = {
      val fn = new Lag(e, Literal(1), Literal(null, e.dataType), false)
      Alias(WindowExpression(fn,
        WindowSpecDefinition(partition, order, fn.frame)), n)()
    }
    val (lagV0, lagT0) = (lagOf(v, "__gc_lag_v"), lagOf(ts, "__gc_lag_t"))
    val (lagV, lagT) = (lagV0.toAttribute, lagT0.toAttribute)
    lazy val decT = org.apache.spark.sql.types.DecimalType(38, 0)
    def aggE(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    // per-kind replacement, mirroring the fold's merge arithmetic
    // term-for-term (same CASE shapes, same scaled-decimal area). The
    // Coalesce preserves the fold's EMPTY-INPUT value: an ungrouped
    // fold over zero rows returns its zero accumulator (0.0 / 0 /
    // decimal 0), where a bare Sum would return NULL — reachable when
    // a tag-pinned scalar's predicate matches nothing.
    def term(kind: CounterFunctions.Kind): Expression = kind match {
      case CounterFunctions.Increase => Coalesce(Seq(aggE(Sum(CaseWhen(Seq(
        (IsNull(lagV), Literal(0.0)),
        (GreaterThanOrEqual(v, lagV), Subtract(v, lagV))), Some(v)))),
        Literal(0.0)))
      case CounterFunctions.Resets => Coalesce(Seq(aggE(Sum(CaseWhen(Seq(
        (And(IsNotNull(lagV), LessThan(v, lagV)), Literal(1L))),
        Some(Literal(0L))))), Literal(0L)))
      case CounterFunctions.Area => Cast(Coalesce(Seq(aggE(Sum(CaseWhen(Seq(
        (IsNull(lagT), Literal.create(org.apache.spark.sql.types.Decimal(0), decT))),
        Some(Multiply(
          Cast(Round(Multiply(lagV, Literal(100.0)), Literal(0)), decT),
          Cast(Subtract(ts, lagT),
            org.apache.spark.sql.types.DecimalType(20, 0))))))),
        Literal.create(org.apache.spark.sql.types.Decimal(0), decT))), decT)
    }
    var swapped = false
    def rewriteExpr(e: Expression): Expression =
      CounterFunctions.matchFold(e) match {
        case Some((kind, _, _)) => swapped = true; term(kind)
        case None => e.withNewChildren(e.children.map(rewriteExpr))
      }
    val newAggExprs = agg.aggregateExpressions.map {
      case al: Alias =>
        al.withNewChildren(Seq(rewriteExpr(al.child))).asInstanceOf[Alias]
      case other => other
    }
    if (!swapped) None
    else Some(Aggregate(agg.groupingExpressions, newAggExprs,
      org.apache.spark.sql.catalyst.plans.logical.Window(
        Seq(lagV0, lagT0), partition, order, agg.child)))
  }

  /** Replace a `time_bucket_gapfill`-marked Aggregate with a
    * densify-and-fill plan ([[graft.functions.GapFillFunctions]]).
    * Gap-filling is the ONE vocabulary entry that cannot be an
    * expression swap — it emits rows (one per empty bucket of a dense
    * spine) the user's grouped aggregate never produces — so this
    * rewrite replaces the whole Aggregate:
    *
    *  1. strip the markers into a PLAIN bucketed aggregate over the
    *     store's current snapshot (`(ts DIV g)·g` keys — rebuilt from
    *     `store.current()` so the raw path has the timestamp column in
    *     scope even when the optimizer pruned it above the marker
    *     Project), and route THAT through [[tryRewrite]] /
    *     [[lagFallback]] — the observed-buckets stage composes with
    *     the session's entire routed vocabulary (rollup refolds,
    *     sketches, counter folds) for free;
    *  2. densify to the `[ge, lt)` spine: per-tag via a row_number
    *     fan-out (the first observed bucket of each tag explodes the
    *     full spine index sequence, every other row just its own) +
    *     a (tag, bucket) re-aggregate with `first(ignoreNulls)` —
    *     join-free, union-free, no plan-subtree reuse, every operator
    *     spillable; global via a one-row spine union. Observed tags
    *     define the series set (a tag absent from the window
    *     contributes no series), matching `answerGapFill`'s default;
    *  3. one logical Window pass (partition tag, order bucket) serves
    *     every fill: `locf` = `last(v, ignoreNulls)` over the
    *     preceding frame; `interpolate` = the engine's exact linear
    *     form `(pv·(nb−b) + nv·(b−pb)) / (nb−pb)` from
    *     last/first-non-null marks over the two frames — window-only,
    *     no joins back to the observed buckets (the same values, one
    *     fewer shuffle than answerGapFill's formulation);
    *  4. project to the original output names and exprIds, so sorts /
    *     havings above resolve unchanged (HAVING filters FILLED rows).
    *
    * A NULL observed bucket value (e.g. `sum(CASE …)` that matched
    * nothing) is a gap to the fills — TimescaleDB's `locf` semantics.
    *
    * Ineligible shapes THROW with the specific reason instead of
    * returning the un-densified aggregate — a marker that executes
    * raises [[graft.functions.GapFillFunctions.UnroutedMsg]], so no
    * shape silently changes meaning (the class contract holds: the
    * rewrite never changes semantics, because unrewritten gapfill HAS
    * no execution semantics). Required: registered-store source,
    * exactly one bare gapfill key (plus optionally `tag`, nothing
    * else), explicit grain-aligned `timestamp >= lo AND timestamp <
    * hi` bounds, ≤ [[RollupSqlRewrite.MaxSpineBuckets]] buckets (the
    * per-series spine sequence is one executor-resident array),
    * `interpolate` over DOUBLE only.
    */
  private def gapfillRewrite(agg: Aggregate): LogicalPlan = {
    import graft.functions.GapFillFunctions.{GapfillBucket, GapfillFill, Locf, Interp, NullFill, FillKind}
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"time_bucket_gapfill: $msg")

    if (registered.isEmpty)
      fail("no TimeSeriesStore is registered for SQL routing in this " +
        "session — call RollupSqlRewrite.register(spark, store, rollups) first")
    val src = destructure(agg.child).getOrElse(fail(
      "the source must be a registered store's current() scan (a temp " +
        "view of store.current()); arbitrary sources are outside the " +
        "gapfill vocabulary"))
    if (src.gen.isDefined)
      fail("cannot combine with a lateral-view generator (hop_starts): " +
        "the gapfill spine defines its own bucket set")
    if (src.leaves.isEmpty)
      fail("the source scan has no segments — an empty store snapshot " +
        "has no series to fill")

    val defs = src.defs
    val resolve: Expression => Expression = e => e.transformUp {
      case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
    }
    val rGroup = agg.groupingExpressions.map(resolve)
    val rAggEx: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if defs.contains(a.exprId) =>
        Alias(defs(a.exprId), a.name)(exprId = a.exprId)
      case al: Alias =>
        al.withNewChildren(Seq(resolve(al.child))).asInstanceOf[Alias]
      case other => other
    }

    // --- the bucket key and the grouping vocabulary
    val gbs = rGroup.flatMap(_.collect { case g: GapfillBucket => g }).distinct
    if (gbs.size != 1)
      fail(s"exactly one time_bucket_gapfill grouping key is required, found ${gbs.size}")
    val gb = gbs.head
    val grain = gb.width match {
      case Literal(w: Long, _) if w > 0 => w
      case Literal(w: Int, _) if w > 0 => w.toLong
      case _ => fail("widthMs must be a positive integer literal")
    }
    if (!isAttr(gb.ts, "timestamp"))
      fail("the bucket argument must be the store's timestamp column")
    var hasTagKey = false
    rGroup.foreach {
      case _: GapfillBucket => ()
      case a: AttributeReference if a.name == "tag" => hasTagKey = true
      case _: Literal => ()
      case e => fail(s"unsupported grouping key ${e.sql}: only tag and " +
        "the bare time_bucket_gapfill key may appear")
    }

    // --- bounds + snapshot guard (tryRewrite's laws)
    val per = src.leaves.map(l => classify(l.conds.map(resolve)))
    if (per.exists(_.isEmpty))
      fail("unsupported WHERE predicate: only timestamp/time_bucket " +
        "bounds and tag predicates are in the vocabulary")
    val sigs = per.flatten.map { case (_, g, l, t) => (g, l, t.map(norm).sorted) }
    if (sigs.distinct.size != 1)
      fail("scan branches disagree on predicates — not a uniform snapshot scan")
    val (geOpt, ltOpt, tagConds) =
      { val h = per.flatten.head; (h._2, h._3, h._4) }
    val ge = geOpt.getOrElse(fail("an explicit lower bound " +
      "(timestamp >= lo) is required: the dense spine needs finite bounds"))
    val lt = ltOpt.getOrElse(fail("an explicit upper bound " +
      "(timestamp < hi) is required: the dense spine needs finite bounds"))
    if (lt <= ge) fail(s"empty bound range [$ge, $lt)")
    if (ge % grain != 0 || lt % grain != 0)
      fail(s"bounds [$ge, $lt) must be aligned to the bucket width $grain")
    val nBuckets = (lt - ge) / grain
    if (nBuckets > RollupSqlRewrite.MaxSpineBuckets)
      fail(s"the spine would have $nBuckets buckets (cap " +
        s"${RollupSqlRewrite.MaxSpineBuckets}): use a coarser width or " +
        "tighter bounds — each series' spine sequence is one " +
        "executor-resident array")
    val (store, _) = registered.values.find { case (st, _) =>
      src.leaves.forall(_.segPath.startsWith(st.rootDir + "/"))
    }.getOrElse(fail("the scanned parquet is not a registered store's segments"))
    val planSig = src.leaves.zip(per.flatten).map { case (leaf, c) =>
      leaf.segPath -> c._1
    }.groupBy(_._1).map { case (p, xs) => p -> xs.flatMap(_._2).toSet }
    if (planSig != store.snapshotSignature)
      fail("the scan is not the store's CURRENT snapshot (a DataFrame " +
        "captured before a later mutation keeps its raw plan; gapfill " +
        "requires current())")

    // --- decompose the SELECT list: one observed per-bucket column per
    // distinct fill child / bare aggregate (dedup by semanticEquals —
    // `locf(avg(v))` and a bare `avg(v)` share one observed column)
    val obsExprs = scala.collection.mutable.ArrayBuffer.empty[Expression]
    def obsIdx(e: Expression): Int = {
      val i = obsExprs.indexWhere(_.semanticEquals(e))
      if (i >= 0) i else { obsExprs += e; obsExprs.size - 1 }
    }
    val fillsNeeded = scala.collection.mutable.LinkedHashSet.empty[(Int, FillKind)]
    def collectUses(e: Expression): Unit = e match {
      case g if g.semanticEquals(gb) => ()
      case a: AttributeReference if a.name == "tag" => ()
      case f @ GapfillFill(child, kind) =>
        if (child.exists(_.isInstanceOf[GapfillFill]))
          fail("nested fill wrappers (locf(interpolate(…)) etc.) are not supported")
        if (!child.exists(_.isInstanceOf[AggregateExpression]))
          fail(s"${f.prettyName}() must wrap an aggregate expression")
        if (kind == Interp && child.dataType != DoubleType)
          fail("interpolate() requires a DOUBLE-typed aggregate (got " +
            s"${child.dataType.sql}); cast inside the call: " +
            "interpolate(CAST(… AS DOUBLE))")
        fillsNeeded += ((obsIdx(child), kind))
      case ae: AggregateExpression =>
        // an optimizer rule cannot RAISE an output's nullability after
        // analysis, and gap buckets are NULL — so a bare non-nullable
        // aggregate (count) cannot carry them; the nullable marker can
        if (!ae.nullable)
          fail(s"bare ${ae.sql} is non-nullable but gap buckets are " +
            "NULL: wrap it — gapfill_null(…) for NULL gaps, " +
            "coalesce(gapfill_null(…), 0) for zero-fill, or " +
            "locf(…)/interpolate(…)")
        obsIdx(ae); ()
      case other => other.children.foreach(collectUses)
    }
    rAggEx.foreach {
      case al: Alias => collectUses(al.child)
      case other => collectUses(other)
    }

    // --- stage 1: the observed-buckets aggregate, rebuilt over
    // store.current() (name-remapped: destructure proved every attr
    // below the original Aggregate is a store column passthrough)
    val rawBase = store.current().queryExecution.analyzed
    val nameMap: Map[String, Attribute] = rawBase.output.map(a => a.name -> a).toMap
    def remap(e: Expression): Expression = e.transformUp {
      case a: AttributeReference => nameMap.getOrElse(a.name, a)
    }
    val tsNew = nameMap.getOrElse("timestamp", fail("store scan lost its timestamp column"))
    val dayNew = nameMap.getOrElse("g_day", fail("store scan lost its g_day column"))
    val grainLit = Literal(grain)
    val obsRemapped = obsExprs.toSeq.map(remap)
    val conds: Seq[Expression] = Seq(
      GreaterThanOrEqual(tsNew, Literal(ge)), LessThan(tsNew, Literal(lt)),
      GreaterThanOrEqual(dayNew, Literal(ge / DayMs)),
      LessThanOrEqual(dayNew, Literal((lt - 1) / DayMs))) ++ tagConds.map(remap)
    val neededRefs = AttributeSet(obsRemapped.flatMap(_.references) ++
      Seq(tsNew) ++ (if (hasTagKey) nameMap.get("tag") else None))
    val obsSrc = Project(rawBase.output.filter(neededRefs.contains),
      Filter(conds.reduce(And), rawBase))
    val windowKey = Multiply(IntegralDivide(tsNew, grainLit), grainLit)
    val tagNew: Option[Attribute] =
      if (hasTagKey) Some(nameMap.getOrElse("tag", fail("store scan lost its tag column")))
      else None
    val obsKeys: Seq[Expression] = tagNew.toSeq :+ windowKey
    val obsAliases: Seq[NamedExpression] =
      tagNew.map(a => Alias(a, "__gf_tag")()).toSeq ++
        Seq(Alias(windowKey, "__gf_b")()) ++
        obsRemapped.zipWithIndex.map { case (e, i) => Alias(e, s"__gf_v$i")() }
    val obsAgg = Aggregate(obsKeys, obsAliases, obsSrc)
    val obsPlan = tryRewrite(obsAgg).orElse(lagFallback(obsAgg)).getOrElse(obsAgg)

    // --- stage 2: densify to the spine
    def aggE(f: aggregate.AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    val loIdx = ge / grain
    val hiIdx = lt / grain - 1
    val step = Some(Literal(1L))
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val obsOut = obsPlan.output
    val oB = obsOut(if (hasTagKey) 1 else 0)
    val oVs = obsOut.drop(if (hasTagKey) 2 else 1)
    val dense: LogicalPlan = if (hasTagKey) {
      val oTag = obsOut.head
      val order = Seq(SortOrder(oB, Ascending))
      val rnFn = RowNumber()
      val rnAlias = Alias(WindowExpression(rnFn,
        WindowSpecDefinition(Seq(oTag), order, rnFn.frame)), "__gf_rn")()
      val win = LWindow(Seq(rnAlias), Seq(oTag), order, obsPlan)
      val bIdx = IntegralDivide(oB, grainLit)
      val seqExpr = If(EqualTo(rnAlias.toAttribute, Literal(1)),
        Sequence(Literal(loIdx), Literal(hiIdx), step, tz),
        Sequence(bIdx, bIdx, step, tz))
      val genOut = AttributeReference("__gf_i", LongType, nullable = false)()
      val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(genOut),
        child = win)
      val bucket = Multiply(genOut, grainLit)
      val fanProj = Project(
        Seq(Alias(oTag, "__gf_tag")(), Alias(bucket, "__gf_b")()) ++
          oVs.zipWithIndex.map { case (v, i) =>
            Alias(If(EqualTo(bucket, oB), v, Literal(null, v.dataType)),
              s"__gf_v$i")()
          }, gen)
      val fOut = fanProj.output
      Aggregate(Seq(fOut(0), fOut(1)),
        Seq(Alias(fOut(0), "__gf_tag")(), Alias(fOut(1), "__gf_b")()) ++
          fOut.drop(2).zipWithIndex.map { case (v, i) =>
            Alias(aggE(aggregate.First(v, ignoreNulls = true)), s"__gf_v$i")()
          }, fanProj)
    } else {
      val genOut = AttributeReference("__gf_i", LongType, nullable = false)()
      val spine = Project(
        Seq(Alias(Multiply(genOut, grainLit), "__gf_b")()) ++
          oVs.zipWithIndex.map { case (v, i) =>
            Alias(Literal(null, v.dataType), s"__gf_v$i")()
          },
        Generate(Explode(Sequence(Literal(loIdx), Literal(hiIdx), step, tz)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(genOut), child = OneRowRelation()))
      val uni = Union(Seq(obsPlan, spine))
      val uOut = uni.output
      Aggregate(Seq(uOut.head),
        Seq(Alias(uOut.head, "__gf_b")()) ++
          uOut.tail.zipWithIndex.map { case (v, i) =>
            Alias(aggE(aggregate.First(v, ignoreNulls = true)), s"__gf_v$i")()
          }, uni)
    }

    // --- stage 3: one window pass serves every fill
    val dOut = dense.output
    val dTag = if (hasTagKey) Some(dOut.head) else None
    val dB = dOut(if (hasTagKey) 1 else 0)
    val dVs = dOut.drop(if (hasTagKey) 2 else 1)
    val part: Seq[Expression] = dTag.toSeq
    val ord = Seq(SortOrder(dB, Ascending))
    val prevSpec = WindowSpecDefinition(part, ord,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    val nextSpec = WindowSpecDefinition(part, ord,
      SpecifiedWindowFrame(RowFrame, CurrentRow, UnboundedFollowing))
    val winAliases = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
    val locfAttr = scala.collection.mutable.Map.empty[Int, Attribute]
    val interpAttrs = scala.collection.mutable.Map
      .empty[Int, (Attribute, Attribute, Attribute, Attribute)]
    fillsNeeded.foreach {
      case (_, NullFill) => () // the dense column itself, no window pass
      case (i, Locf) =>
        val a = Alias(WindowExpression(
          aggE(aggregate.Last(dVs(i), ignoreNulls = true)), prevSpec),
          s"__gf_locf$i")()
        winAliases += a
        locfAttr(i) = a.toAttribute
      case (i, Interp) =>
        val obsMark = CaseWhen(Seq((IsNotNull(dVs(i)), dB)), None)
        val pv = Alias(WindowExpression(
          aggE(aggregate.Last(dVs(i), ignoreNulls = true)), prevSpec), s"__gf_pv$i")()
        val nv = Alias(WindowExpression(
          aggE(aggregate.First(dVs(i), ignoreNulls = true)), nextSpec), s"__gf_nv$i")()
        val pb = Alias(WindowExpression(
          aggE(aggregate.Max(obsMark)), prevSpec), s"__gf_pb$i")()
        val nb = Alias(WindowExpression(
          aggE(aggregate.Min(obsMark)), nextSpec), s"__gf_nb$i")()
        winAliases ++= Seq(pv, nv, pb, nb)
        interpAttrs(i) = (pv.toAttribute, nv.toAttribute, pb.toAttribute, nb.toAttribute)
    }
    val filled: LogicalPlan =
      if (winAliases.isEmpty) dense else LWindow(winAliases.toSeq, part, ord, dense)

    // --- stage 4: rebuild the original outputs (names + exprIds)
    def obsLookup(e: Expression): Int = {
      val i = obsExprs.indexWhere(_.semanticEquals(e))
      require(i >= 0, s"gapfill: internal — unrecorded observed expression ${e.sql}")
      i
    }
    def fillResult(i: Int, kind: FillKind): Expression = kind match {
      case NullFill => dVs(i)
      case Locf => locfAttr(i)
      case Interp =>
        val (pv, nv, pb, nb) = interpAttrs(i)
        // the engine's exact linear form (ContinuousAggregate
        // answerGapFill Fill.Interp): (pv·(nb−b) + nv·(b−pb)) / (nb−pb)
        Coalesce(Seq(dVs(i), CaseWhen(Seq((And(IsNotNull(pb), IsNotNull(nb)),
          Divide(
            Add(Multiply(pv, Cast(Subtract(nb, dB), DoubleType)),
              Multiply(nv, Cast(Subtract(dB, pb), DoubleType))),
            Cast(Subtract(nb, pb), DoubleType)))), None)))
    }
    def mapOut(e: Expression): Expression = e match {
      case g if g.semanticEquals(gb) => dB
      case a: AttributeReference if a.name == "tag" =>
        dTag.getOrElse(fail("tag referenced in the SELECT list but not in GROUP BY"))
      case GapfillFill(child, kind) => fillResult(obsLookup(child), kind)
      case ae: AggregateExpression => dVs(obsLookup(ae))
      case other => other.withNewChildren(other.children.map(mapOut))
    }
    // nullability contract: downstream consumers (sorts, the collect
    // decoder) were bound against the ANALYZED schema — a rule must
    // never RAISE an output's nullability (a non-nullable decoder
    // reads a null slot as garbage 0). Key passthroughs are never
    // null by construction (the spine generates every bucket; tags
    // come from observed rows), so a nullability raise there is
    // pinned back down with KnownNotNull; a raise that involves dense
    // VALUE columns would be a genuine NULL-in-non-nullable and has
    // already been rejected by the bare-aggregate check above.
    def contracted(orig: NamedExpression, mapped: Expression): Expression =
      if (orig.toAttribute.nullable || !mapped.nullable) mapped
      else if (AttributeSet(dVs).intersect(mapped.references).isEmpty)
        KnownNotNull(mapped)
      else fail(s"internal: output ${orig.name} would raise nullability " +
        "over dense values — unreachable past the bare-aggregate check")
    val outputs: Seq[NamedExpression] = rAggEx.map {
      case al: Alias =>
        Alias(contracted(al, mapOut(al.child)), al.name)(exprId = al.exprId)
      case a: AttributeReference =>
        Alias(contracted(a, mapOut(a)), a.name)(exprId = a.exprId)
      case other => fail(s"unsupported output expression ${other.sql}")
    }
    Project(outputs, filled)
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // once destructure proves the subtree is a pure store scan, every
    // attribute below the Aggregate IS a store column passthrough, so
    // name-based matching is unambiguous (the child output is
    // column-PRUNED — `sum(value)` sees only [value], so id-lookups of
    // tag/timestamp would spuriously fail).
    // Grouping vocabulary: the tag column, tumbling-window keys
    // `(timestamp DIV w) * w`, and literals — in any combination. A
    // window key is exact on the rollup iff w is a multiple of the
    // bucket grain (a bucket then never straddles a window edge),
    // checked per candidate rollup below.
    for {
      src <- destructure(agg.child)
      leaves = src.leaves
      if leaves.nonEmpty
      // generator-output hygiene (round-10 ADVICE #2): a user-named
      // lateral-view column may SHADOW a store column (`… AS tag` /
      // `AS timestamp`), and a filter on a generator output cannot be
      // pushed below the Generate, so it reaches classify verbatim —
      // where name-based matching would rebind it to the rollup's real
      // column (wrong results) or fold window-start bounds into event
      // ts bounds. Decline when the generator output wears a store
      // column's name, and when ANY predicate references the generator
      // output at all (predicates on the exploded window starts are
      // outside the rewrite vocabulary — classify's name dispatch must
      // only ever see leaf store columns).
      if src.gen.forall { case (attr, _) =>
        !RollupSqlRewrite.StoreCols.contains(attr.name) &&
          leaves.forall(_.conds.forall(c =>
            !c.references.exists(_.exprId == attr.exprId)))
      }
      // resolve intermediate Project aliases (the optimizer's
      // `_groupingexpression` extraction) back to leaf-column exprs
      defs = src.defs
      resolve = (e: Expression) => e.transformUp {
        case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
      }
      resolveNamed = (ne: NamedExpression) => ne match {
        case a: AttributeReference if defs.contains(a.exprId) =>
          Alias(defs(a.exprId), a.name)(exprId = a.exprId)
        case al: Alias =>
          al.withNewChildren(Seq(resolve(al.child))).asInstanceOf[Alias]
        case other => other
      }
      rGroup = agg.groupingExpressions.map(resolve)
      rAggEx = agg.aggregateExpressions.map(resolveNamed)
      // an Explode in the source must be a recognized hop_starts
      // pattern — any other generator changes row multiplicity in ways
      // the refold can't reproduce, so the whole rewrite declines
      hop = src.gen.flatMap { case (attr, arr) =>
        hopOf(arr).map { case (s, w) => (attr, s, w) }
      }
      if src.gen.isEmpty || hop.isDefined
      if rGroup.forall {
        case a: AttributeReference if a.name == "tag" => true
        case a: AttributeReference if a.name == "g_day" => true
        case a: AttributeReference if hop.exists(_._1.exprId == a.exprId) => true
        case e if windowOf(e).isDefined => true
        case _: Literal => true
        case _ => false
      }
      // g_day (the store's day partition column) groups like a
      // day-width window: exact iff the grain divides a day (coarse
      // weekly/monthly buckets carry only their START day label);
      // a hop's slide is its alignment unit (width is a multiple)
      windows = rGroup.flatMap(windowOf) ++
        rGroup.collect { case a: AttributeReference if a.name == "g_day" => DayMs } ++
        hop.map(_._2)
      (store, rollups) <- registered.values.find { case (st, _) =>
        leaves.forall(_.segPath.startsWith(st.rootDir + "/"))
      }
      classified <- {
        val per = leaves.map(l => classify(l.conds.map(resolve)))
        if (per.exists(_.isEmpty)) None
        else {
          // every leaf must carry the SAME user predicates (predicate
          // pushdown copies them down each union branch)
          val sigs = per.flatten.map { case (_, g, l, t) =>
            (g, l, t.map(norm).sorted)
          }
          if (sigs.distinct.size != 1) None
          else {
            val planSig = leaves.zip(per.flatten).map { case (leaf, c) =>
              leaf.segPath -> c._1
            }.groupBy(_._1).map { case (p, xs) => p -> xs.flatMap(_._2).toSet }
            // the SNAPSHOT GUARD: the plan must read exactly the
            // store's current version (planSig rides along so the
            // MetaStats fold can re-verify it AFTER its own state read)
            if (planSig != store.snapshotSignature) None
            else per.flatten.headOption.map { case (_, g, l, t) =>
              (g, l, t, planSig)
            }
          }
        }
      }
      (ge, lt, tagConds, planSig) = classified
      // metadata stats beat any rollup when they apply: a GLOBAL
      // aggregate with day-aligned/absent bounds and no tag predicate
      // folds the store's .stats sidecars into a literal one-row plan —
      // no scan at all (see [[MetaStats]]; same snapshot guard as the
      // rollup path, already checked above). Anything beyond that
      // vocabulary falls through to the rollup rewrite unchanged.
      // frozen rollups never serve SQL: they answer over raw days the
      // store has dropped, which would CHANGE the plain-SQL result
      // (the engine-routed QueryModel path is the explicit
      // downsampling surface; this rule's contract is result-identity)
      rewritten <- (if (hop.isDefined) None
        // a hop multiplies every row by width/slide — the metadata
        // fold must never serve an exploded source
        else metaStatsRewrite(rGroup, rAggEx, store, ge, lt, tagConds,
          planSig))
        .orElse(rollups.filterNot(_.isFrozen)
        .sortBy(-_.grainMs).iterator.flatMap { r =>
        val aligned = ge.forall(_ % r.grainMs == 0) &&
          lt.forall(_ % r.grainMs == 0) &&
          windows.forall(_ % r.grainMs == 0)
        if (!aligned) Iterator.empty
        else r.currentBase().iterator.flatMap { base =>
          buildRollupAggregate(rGroup, rAggEx, base, ge, lt, tagConds,
            r.isSketched, hop, r.isCounter)
        }
      }.nextOption())
    } yield rewritten
  }

  /** Rewrite a GLOBAL aggregate over the store to a literal one-row
    * Project when the [[MetaStats]] sidecar fold covers the whole
    * range: Spark empty-input semantics (sum/min/max/avg → NULL,
    * count → 0), output exprIds preserved, surrounding composition
    * (round, arithmetic) kept — the optimizer's constant folding
    * finishes the job. None when: grouped, any tag predicate, bounds
    * not fully sidecar-covered, or any aggregate outside the
    * count/sum/avg/min/max-over-value vocabulary (min_by/max_by and
    * the approx sketches stay on the rollup path).
    */
  private def metaStatsRewrite(rGroup: Seq[Expression],
                               rAggEx: Seq[NamedExpression],
                               store: TimeSeriesStore,
                               ge: Option[Long], lt: Option[Long],
                               tagConds: Seq[Expression],
                               planSig: Map[String, Set[Long]]): Option[LogicalPlan] = {
    if (rGroup.nonEmpty || tagConds.nonEmpty) return None
    val qm = graft.model.QueryModel(ge = ge, lt = lt,
      aggFunc = Some(graft.model.Agg.Count))
    // TOCTOU guard (round-9 ADVICE #3): the day-stats list is PINNED
    // here and the snapshot signature re-verified AFTER the pin — a
    // commit landing between tryRewrite's signature check and this
    // fold would otherwise make the literal answer reflect a newer
    // store version than the one the guard validated. Segment names
    // are UUID-suffixed, so a signature that still equals planSig
    // proves no commit landed in between (no A-B-A).
    val pinned = store.liveDayStats()
    if (store.snapshotSignature != planSig) return None
    MetaStats.coverage(pinned, qm).filter(_._2.isEmpty).flatMap { case (acc, _) =>
      val emptyIn = acc.rows == 0L
      def dlit(d: Double): Expression =
        if (emptyIn) Literal(null, DoubleType) else Literal(d, DoubleType)
      var ok = true
      def fold(e: Expression): Expression = e match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case s: Sum if isAttr(s.child, "value")     => dlit(acc.sum)
            case m: Min if isAttr(m.child, "value")     => dlit(acc.vmin)
            case m: Max if isAttr(m.child, "value")     => dlit(acc.vmax)
            case a: Average if isAttr(a.child, "value") => dlit(acc.sum / acc.rows)
            case c: Count if c.children.forall(ch => !ch.nullable) =>
              Literal(acc.rows, LongType)
            case _ => ok = false; e
          }
        case a: AttributeReference => ok = false; a
        case other => other.withNewChildren(other.children.map(fold))
      }
      val newExprs = rAggEx.map {
        case al: Alias => al.withNewChildren(Seq(fold(al.child))).asInstanceOf[Alias]
        case other => ok = false; other
      }
      if (!ok) None
      else Some(Project(newExprs,
        org.apache.spark.sql.catalyst.plans.logical.OneRowRelation()))
    }
  }

  /** Reconstruct the Aggregate over the rollup base, preserving output
    * attribute ids. None if any aggregate function shape is beyond the
    * refold vocabulary. */
  private def buildRollupAggregate(rGroup: Seq[Expression],
                                   rAggEx: Seq[NamedExpression],
                                   base: org.apache.spark.sql.DataFrame,
                                   ge: Option[Long], lt: Option[Long],
                                   tagConds: Seq[Expression],
                                   sketched: Boolean,
                                   hop: Option[(Attribute, Long, Long)] = None,
                                   counter: Boolean = false)
      : Option[LogicalPlan] = {
    val basePlan = base.queryExecution.analyzed
    def b(name: String): Attribute = basePlan.output.find(_.name == name).get
    val (bTag, bCnt, bSum, bMin, bMax, bBucket, bDay) =
      (b("tag"), b("cnt"), b("sum_val"), b("min_val"), b("max_val"),
        b("bucket_start"), b("g_day"))
    lazy val (bFirstTs, bFirstVal, bLastTs, bLastVal) =
      (b("first_ts"), b("first_val"), b("last_ts"), b("last_val"))
    // ONE merge aggregate per sketch column, shared by every reference
    // to it (planner-level dedup is instance-based: distinct
    // AggregateExpressions with fresh resultIds would each re-merge)
    lazy val qMerged = AggregateExpression(
      graft.functions.QSketchMergeAgg(b("qsketch")), Complete, isDistinct = false)
    lazy val hMerged = AggregateExpression(
      HllUnionAgg(b("hsketch"), Literal(true)), Complete, isDistinct = false)

    // bucket_start bounds give exactness; derived g_day bounds add
    // directory-level partition pruning (answer()'s formulation)
    val boundConds =
      ge.toSeq.flatMap(v => Seq(
        GreaterThanOrEqual(bBucket, Literal(v)),
        GreaterThanOrEqual(bDay, Literal(v / DayMs)))) ++
      lt.toSeq.flatMap(v => Seq(
        LessThan(bBucket, Literal(v)),
        LessThanOrEqual(bDay, Literal((v - 1) / DayMs)))) ++
      tagConds.map(_.transform {
        case a: AttributeReference if a.name == "tag" => bTag
      })
    val filtered = boundConds.reduceOption(And).fold(basePlan)(Filter(_, basePlan))
    // hop rebuild: re-derive each bucket's window-start array from
    // bucket_start — exact because slide (and so width) is a multiple
    // of the grain (alignment already checked), so every event in a
    // bucket shares the bucket's window set. The generator output
    // keeps the ORIGINAL attribute, so the Aggregate's grouping and
    // projections resolve unchanged. O(buckets × width/slide) rows.
    val newChild = hop.fold(filtered) { case (attr, s, w) =>
      val tumble = Multiply(IntegralDivide(bBucket, Literal(s)), Literal(s))
      val lo = if (s == w) tumble else Add(tumble, Literal(s - w))
      // timeZoneId must be filled HERE: Sequence is TimeZoneAware and
      // the analyzer's ResolveTimeZone has already run — an optimizer-
      // built Sequence without it is unresolved and fails plan
      // validation (it is ignored for integral sequences)
      Generate(Explode(Sequence(lo, tumble, Some(Literal(s)),
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(attr), child = filtered)
    }

    def aggE(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)

    // ---- counter-family refolds (SQL counter_increase / counter_resets
    // / time_weight_locf over a counter-mode rollup): in-bucket parts
    // are the stored additive columns (incr / n_resets / twsum); the
    // pairs SPANNING bucket boundaries re-derive from the (first_ts,
    // first_val, last_ts, last_val) witnesses by an ordered fold over
    // ONE collected per-group bucket array — O(buckets-per-group)
    // memory, the same cost class answerCounterIncrease's lag-window
    // pays, but expressible INSIDE the rebuilt Aggregate so the
    // leaf-swap architecture (and exprId preservation) is untouched.
    // Eligibility (checked at the swap): counter-mode rollup, and the
    // fold must be SINGLE-SERIES per group: either `tag` is among the
    // grouping keys, or a tag-EQUALITY predicate pins one tag (a
    // GLOBAL fold over a multi-tag store interleaves tags at EVENT
    // granularity in the raw semantics — bucket granularity cannot
    // reproduce that pair set, so the rewrite declines rather than
    // approximates). Window groupings compose: buckets nest in
    // grain-multiple tumbling windows AND in hop windows (grain |
    // slide | width), so per-(tag, window) boundary pairs are exactly
    // the raw per-group pair walk — sliding counter increase in plain
    // SQL rides the existing hop rebuild. The one hop shape that must
    // stay raw is an UNGROUPED explode (see hopGrouped below).
    lazy val decT = org.apache.spark.sql.types.DecimalType(38, 0)
    // ONE CollectList instance shared by every counter refold in the
    // query (planner aggregate dedup is instance-based, same reason
    // qMerged/hMerged above are single instances)
    lazy val ctrCollect: Expression = SortArray(
      aggE(CollectList(CreateNamedStruct(Seq(
        Literal("ft"), bFirstTs, Literal("fv"), bFirstVal,
        Literal("lt"), bLastTs, Literal("lv"), bLastVal)))),
      Literal(true))
    // fold over the sorted bucket array: acc = (prev last_val, prev
    // last_ts, boundary increase, boundary resets, boundary area),
    // value-for-value the arithmetic of answerCounterIncrease /
    // answerTimeWeighted's lag columns (b_inc / b_rst / b_area)
    def ctrBoundary(field: String): Expression = {
      val elemType = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ft", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("fv", DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("lt", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lv", DoubleType, nullable = false)))
      val accType = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p", DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("pt", LongType, nullable = true),
        org.apache.spark.sql.types.StructField("bi", DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("br", LongType, nullable = true),
        org.apache.spark.sql.types.StructField("ba", decT, nullable = true)))
      val zero = CreateNamedStruct(Seq(
        Literal("p"), Literal(null, DoubleType),
        Literal("pt"), Literal(null, LongType),
        Literal("bi"), Literal(0.0),
        Literal("br"), Literal(0L),
        Literal("ba"), Literal.create(org.apache.spark.sql.types.Decimal(0), decT)))
      val accVar = NamedLambdaVariable("a", accType, nullable = false)
      val xVar = NamedLambdaVariable("x", elemType, nullable = false)
      def af(i: Int, n: String) = GetStructField(accVar, i, Some(n))
      def xf(i: Int, n: String) = GetStructField(xVar, i, Some(n))
      val (p, pt) = (af(0, "p"), af(1, "pt"))
      val (ft, fv, lt2, lv) = (xf(0, "ft"), xf(1, "fv"), xf(2, "lt"), xf(3, "lv"))
      val biNext = Add(af(2, "bi"), CaseWhen(Seq(
        (IsNull(p), Literal(0.0)),
        (GreaterThanOrEqual(fv, p), Subtract(fv, p))), Some(fv)))
      val brNext = Add(af(3, "br"), CaseWhen(Seq(
        (And(IsNotNull(p), LessThan(fv, p)), Literal(1L))), Some(Literal(0L))))
      val baNext = Cast(Add(af(4, "ba"), CaseWhen(Seq(
        (IsNull(pt), Literal.create(org.apache.spark.sql.types.Decimal(0), decT))),
        Some(Multiply(
          Cast(Round(Multiply(p, Literal(100.0)), Literal(0)), decT),
          Cast(Subtract(ft, pt),
            org.apache.spark.sql.types.DecimalType(20, 0)))))), decT)
      val merge = LambdaFunction(CreateNamedStruct(Seq(
        Literal("p"), lv, Literal("pt"), lt2,
        Literal("bi"), biNext, Literal("br"), brNext,
        Literal("ba"), baNext)), Seq(accVar, xVar))
      val accF = NamedLambdaVariable("af", accType, nullable = false)
      val idx = Seq("p", "pt", "bi", "br", "ba").indexOf(field)
      val finish = LambdaFunction(GetStructField(accF, idx, Some(field)), Seq(accF))
      ArrayAggregate(ctrCollect, zero, merge, finish)
    }
    // a hop composes with the counter folds ONLY when the exploded
    // window-start is itself a grouping key: each (tag, window) group
    // then holds every nested bucket exactly once, and the boundary
    // pair walk inside the window matches the raw exploded fold's.
    // An ungrouped explode duplicates buckets INSIDE one group — the
    // raw fold would interleave duplicated events pair-by-pair, which
    // no bucket-level fold can reproduce — so that shape stays raw.
    lazy val hopGrouped = hop.forall { case (attr, _, _) =>
      rGroup.exists {
        case a: AttributeReference => a.exprId == attr.exprId
        case _ => false
      }
    }
    lazy val counterEligible = counter && hopGrouped && (
      rGroup.exists {
        case a: AttributeReference => a.name == "tag"
        case _ => false
      } ||
      // a tag-equality predicate pins the fold to ONE tag, so a
      // scalar/window-grouped shape is single-series too (the
      // TimescaleDB `WHERE tag = 'x'` counter query); any OTHER tag
      // predicate (IN, <>, LIKE) can admit multiple tags and stays raw
      tagConds.exists {
        case EqualTo(a: AttributeReference, _: Literal) => a.name == "tag"
        case EqualTo(_: Literal, a: AttributeReference) => a.name == "tag"
        case _ => false
      })

    // grouping keys rebuild over the base: tag passes through at full
    // granularity; a tumbling-window key re-derives from bucket_start
    // (exact because w is a multiple of the grain — alignment already
    // checked); literals are constant either way
    var ok = true
    val newGrouping = rGroup.map {
      case a: AttributeReference if hop.exists(_._1.exprId == a.exprId) =>
        a // provided by the rebuilt Generate under the same exprId
      case a: AttributeReference if a.name == "tag" => bTag
      case a: AttributeReference if a.name == "g_day" => bDay
      case e if windowOf(e).isDefined =>
        val w = windowOf(e).get
        Multiply(IntegralDivide(bBucket, Literal(w)), Literal(w))
      case l: Literal => l
      case e => ok = false; e
    }
    val groupRewrites: Seq[(Expression, Expression)] =
      rGroup.zip(newGrouping)

    // swap each AggregateExpression leaf for its refold; grouping-key
    // passthroughs map to the rebuilt keys; keep any surrounding
    // composition. Bail on anything outside the vocabulary.
    def rewriteNamed(ne: NamedExpression): NamedExpression = ne match {
      case a: AttributeReference =>
        groupRewrites.collectFirst {
          case (g, n) if g.semanticEquals(a) => Alias(n, a.name)(exprId = a.exprId)
        }.getOrElse { ok = false; ne }
      case al: Alias =>
        al.withNewChildren(Seq(rewriteExpr(al.child))).asInstanceOf[Alias]
      case _ => ok = false; ne
    }
    def rewriteExpr(e: Expression): Expression =
      groupRewrites.collectFirst {
        case (g, n) if g.semanticEquals(e) => n
      }.getOrElse(e match {
        // the counter-family ordered folds (registered SQL functions —
        // CounterFunctions.matchFold keys on their reserved marker
        // fields): in-bucket additive columns + boundary-witness folds
        case ctr if graft.functions.CounterFunctions.matchFold(ctr).isDefined =>
          graft.functions.CounterFunctions.matchFold(ctr) match {
            case Some((kind, ts0, v0)) if counterEligible &&
                isAttr(ts0, "timestamp") && isAttr(v0, "value") =>
              // Coalesce preserves the raw fold's EMPTY-INPUT value (a
              // tag-pinned scalar whose bounds match no bucket): the
              // fold returns its zero accumulator, a bare Sum NULL —
              // and Add(NULL, boundary-0) would poison the whole term
              kind match {
                case graft.functions.CounterFunctions.Increase =>
                  Add(Coalesce(Seq(aggE(Sum(b("incr"))), Literal(0.0))),
                    ctrBoundary("bi"))
                case graft.functions.CounterFunctions.Resets =>
                  Add(Coalesce(Seq(aggE(Sum(b("n_resets"))), Literal(0L))),
                    ctrBoundary("br"))
                case graft.functions.CounterFunctions.Area =>
                  Add(Coalesce(Seq(aggE(Sum(b("twsum"))),
                    Literal.create(org.apache.spark.sql.types.Decimal(0), decT))),
                    ctrBoundary("ba"))
              }
            case _ => ok = false; ctr
          }
        case ae: AggregateExpression
            if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case s: Sum if isAttr(s.child, "value") =>
              aggE(Sum(bSum))
            case m: Min if isAttr(m.child, "value") =>
              aggE(Min(bMin))
            case m: Max if isAttr(m.child, "value") =>
              aggE(Max(bMax))
            // timestamp extrema refold exactly from the bucket
            // witnesses (a bucket's first_ts IS its min event ts) —
            // the span term of time_weight_locf and a useful
            // vocabulary entry on its own
            case m: Min if isAttr(m.child, "timestamp") =>
              aggE(Min(bFirstTs))
            case m: Max if isAttr(m.child, "timestamp") =>
              aggE(Max(bLastTs))
            case a: Average if isAttr(a.child, "value") =>
              Divide(aggE(Sum(bSum)), Cast(aggE(Sum(bCnt)), DoubleType))
            case c: Count if c.children.forall(ch => !ch.nullable) =>
              Coalesce(Seq(aggE(Sum(bCnt)), Literal(0L)))
            // first/last refolds: buckets store (first_ts, first_val,
            // last_ts, last_val), so min_by/max_by over (value,
            // timestamp) refolds EXACTLY — a group's first value is
            // the first_val of its earliest bucket
            case mb: MinBy if isAttr(mb.valueExpr, "value") &&
                isAttr(mb.orderingExpr, "timestamp") =>
              aggE(MinBy(bFirstVal, bFirstTs))
            case mb: MaxBy if isAttr(mb.valueExpr, "value") &&
                isAttr(mb.orderingExpr, "timestamp") =>
              aggE(MaxBy(bLastVal, bLastTs))
            // approximate aggregates — sketch-bearing rollups only
            // (class doc: the estimator swap is within these
            // functions' approximate contract; the bound becomes the
            // rollup's own)
            case ap: ApproximatePercentile
                if sketched && isAttr(ap.child, "value") =>
              ap.percentageExpression.eval() match {
                case q: Double if q >= 0 && q <= 1 =>
                  graft.functions.QSketchQuantile(qMerged, Literal(q))
                case _ => ok = false; e // array-of-percentiles etc.
              }
            case h: HyperLogLogPlusPlus
                if sketched && isAttr(h.child, "value") =>
              Coalesce(Seq(HllSketchEstimate(hMerged), Literal(0L)))
            case _ => ok = false; e
          }
        case a: AttributeReference =>
          // a raw-row reference that is neither a grouping key nor
          // inside an aggregate we understand
          ok = false; a
        case other => other.withNewChildren(other.children.map(rewriteExpr))
      })
    val newAggExprs = rAggEx.map(rewriteNamed)
    if (!ok) None
    else Some(Aggregate(newGrouping, newAggExprs, newChild))
  }
}

object RollupSqlRewrite {
  /** The store's leaf column names — the vocabulary classify's
    * name-based matching dispatches on. A generator output wearing one
    * of these names is a shadowing hazard and declines the rewrite. */
  private[engine] val StoreCols = Set("tag", "timestamp", "value", "g_day")

  /** Hard cap on a gapfill spine's bucket count: each series' spine is
    * one `sequence()` array resident on an executor (4M longs ≈ 32 MB)
    * — beyond this the query should use a coarser bucket, and the
    * rewrite fails loudly instead of OOMing an executor. */
  private[engine] val MaxSpineBuckets = 4L * 1000 * 1000

  private val installed = TrieMap.empty[SparkSession, RollupSqlRewrite]

  /** Register `rollups` as automatic rewrite targets for SQL/DataFrame
    * aggregates over `store`'s current snapshot in this session.
    * Installs the optimizer rule on first use (public
    * `spark.experimental.extraOptimizations` hook — takes effect for
    * every subsequently planned query, no session rebuild).
    */
  def register(spark: SparkSession, store: TimeSeriesStore,
               rollups: Seq[ContinuousAggregate]): Unit = {
    // the SQL vocabulary users route through: time_bucket (tumbling
    // keys), hop_starts (sliding windows via LATERAL VIEW explode),
    // and the counter family (counter_increase / counter_resets /
    // time_weight_locf ordered folds + the counter_rate / counter_delta
    // compositions over them)
    graft.functions.TimeFunctions.register(spark)
    graft.functions.CounterFunctions.register(spark)
    graft.functions.GapFillFunctions.register(spark)
    val rule = installed.synchronized {
      installed.getOrElseUpdate(spark, {
        val r = new RollupSqlRewrite()
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
        r
      })
    }
    rule.registered(store.rootDir) = (store, rollups)
  }

  /** Remove a store from SQL-level routing (the rule stays installed,
    * inert when its registry is empty). */
  def unregister(spark: SparkSession, store: TimeSeriesStore): Unit =
    installed.get(spark).foreach(_.registered.remove(store.rootDir))
}

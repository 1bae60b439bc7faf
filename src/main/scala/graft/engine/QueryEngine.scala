package graft.engine

import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a validated [[graft.model.QueryModel]] into a DataFrame plan.
  *
  * This is the whole §2 pipeline of SURVEY.md: scan → filter → optional
  * group-by → aggregate → sort → limit, producing one of the reference's
  * three result shapes (Model.hs:63-75):
  *   - collect:    (timestamp: Long, tag: String, value: Double)
  *   - group agg:  (grp, result: Double)
  *   - scalar agg: (result: Double)
  *
  * Design notes (Spark-first, SURVEY.md §4): no custom Catalyst work is
  * needed — the reference's index slicing, fast paths and parallel folds
  * are subsumed by predicate pushdown, column pruning, partial/final hash
  * aggregation and TakeOrderedAndProject. The compiled plan is fully
  * declarative, so at 100 TB the same code yields partition-pruned scans
  * and distributed aggregation with no driver-side iteration.
  *
  * Determinism: the reference leaves group-by-tag order and
  * intra-timestamp row order unspecified (SURVEY.md §2.5); we canonicalize
  * (sort by group / by (timestamp, tag)) so results are total-ordered.
  */
object QueryEngine {

  /** Conjunction of the query's predicates (reference qmToF,
    * Queries/Utils.hs:21-30 — structural trie slicing becomes a plain
    * pushed-down Filter).
    */
  def predicate(qm: QueryModel): Column = {
    val ts = col("timestamp")
    val conds: Seq[Column] =
      qm.gt.map(ts > _).toSeq ++
        qm.ge.map(ts >= _) ++
        qm.lt.map(ts < _) ++
        qm.le.map(ts <= _) ++
        qm.tsEq.map(ts === _) ++
        qm.tagEq.map(col("tag") === _)
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** The aggregate expression over `value` for one [[Agg]].
    * `count` is cast to Double — the reference's AggR.result is a Double
    * (Model.hs:66-67). `min`/`max` default to ±Infinity on empty input,
    * mirroring the reference's orphan `Bounded Double`
    * (Model.hs:146-148); `sum` defaults to 0 (monoid mempty).
    */
  def aggExpr(agg: Agg): Column = agg match {
    case Agg.Count => count(lit(1)).cast("double")
    case Agg.Sum   => coalesce(sum(col("value")), lit(0.0))
    case Agg.Avg   => avg(col("value"))
    case Agg.Min   => coalesce(min(col("value")), lit(Double.PositiveInfinity))
    case Agg.Max   => coalesce(max(col("value")), lit(Double.NegativeInfinity))
  }

  /** Day-bucket bounds implied by the timestamp predicates, for stores
    * partitioned on `g_day = timestamp div 86400000`
    * ([[TimeSeriesStore]]): Catalyst can't invert the div, so the
    * engine supplies the redundant partition predicate — turning time
    * ranges into directory-level partition pruning at scale.
    */
  private def partitionPredicate(qm: QueryModel): Option[Column] = {
    val D = 86400000L
    val day = col("g_day")
    val conds: Seq[Column] =
      qm.gt.map(v => day >= v / D).toSeq ++
        qm.ge.map(v => day >= v / D) ++
        qm.lt.map(v => day <= v / D) ++
        qm.le.map(v => day <= v / D) ++
        qm.tsEq.map(v => day === v / D)
    conds.reduceOption(_ && _)
  }

  /** The mempty-fold value each aggregate yields over an EMPTY group:
    * what the reference's monoid fold + `fromMaybe 0` (grouped avg,
    * Queries.hs:151) produce.
    */
  private[engine] def emptyGroupValue(agg: Agg): Double = agg match {
    case Agg.Count | Agg.Sum | Agg.Avg => 0.0
    case Agg.Min => Double.PositiveInfinity
    case Agg.Max => Double.NegativeInfinity
  }

  /** Pure plan construction; assumes `qm` already validated. */
  def compile(store: DataFrame, qm: QueryModel): DataFrame = {
    val pruned =
      if (store.columns.contains("g_day"))
        partitionPredicate(qm).map(store.filter).getOrElse(store)
      else store
    val filtered = pruned.filter(predicate(qm))
    ResultShape.of(qm) match {
      case ResultShape.Collect => // CollectR
        val ordered = qm.sort match {
          case SortDir.Asc  => filtered.orderBy(asc("timestamp"), asc("tag"))
          case SortDir.Desc => filtered.orderBy(desc("timestamp"), asc("tag"))
        }
        val limited = qm.limit.fold(ordered)(ordered.limit)
        limited.select(col("timestamp"), col("tag"), col("value"))

      case ResultShape.Grouped(GroupBy.Tag) => // [GroupAggR] keyed by tag
        // Reference iterates a HashMap => order unspecified and `sort`
        // ignored (G6, Queries/Tag.hs:35-53); we canonicalize by group.
        val agg = qm.aggFunc.get
        val grouped = filtered.groupBy(col("tag").as("grp"))
          .agg(aggExpr(agg).as("result"))
        // With tagEq, the reference ALWAYS emits the singleton group,
        // mempty-folded even over an empty range (queryTag',
        // Tag.hs:27-29) — empty-group elimination (F4) applies only to
        // the no-tagEq groupTag path.
        val withSingleton = qm.tagEq match {
          case Some(t) =>
            val fallback = store.sparkSession.range(1)
              .select(lit(t).as("grp"), lit(emptyGroupValue(agg)).as("result"))
              .join(grouped, Seq("grp"), "left_anti")
            grouped.unionAll(fallback)
          case None => grouped
        }
        val ordered = withSingleton.orderBy(asc("grp"))
        qm.limit.fold(ordered)(ordered.limit)

      case ResultShape.Grouped(GroupBy.Timestamp) => // [GroupAggR] keyed by ts
        // Honors `sort` for group order (G8, Queries/TS.hs:31-44).
        val grouped = filtered.groupBy(col("timestamp").as("grp"))
          .agg(aggExpr(qm.aggFunc.get).as("result"))
        val ordered = qm.sort match {
          case SortDir.Asc  => grouped.orderBy(asc("grp"))
          case SortDir.Desc => grouped.orderBy(desc("grp"))
        }
        qm.limit.fold(ordered)(ordered.limit)

      case ResultShape.Scalar => // AggR; limit ignored (L3); also the
        // reference's tagEq+tsEq short-circuit (Tag.hs:67)
        filtered.agg(aggExpr(qm.aggFunc.get).as("result"))
    }
  }

  /** Validated + error-semantics execution, matching the reference's
    * HTTP-400 behaviors (SURVEY.md §7.4 hard part #1):
    *   - illegal QueryModel (Model.hs:126-134)
    *   - tagEq / tsEq pointing at no data → NoData (Utils.hs:47-49)
    *   - avg over empty input → "Average failed." (Utils.hs:67-69)
    * These checks need actions (isEmpty), so they live here rather than
    * in [[compile]]; the SparkEntry oracle queries use [[compile]] with
    * inputs chosen to hit data.
    */
  /** [[execute]] with automatic continuous-aggregate routing — the
    * piece that makes rollups matter the way TimescaleDB's do: a
    * caller of the STANDARD engine API gets the O(buckets) plan
    * whenever a registered rollup can answer the query, with no
    * bespoke opt-in code.
    *
    * Routing rules:
    *  - candidates are tried coarsest grain first — among eligible
    *    rollups the coarsest scans the fewest rows (a day-aligned
    *    query reads 24× fewer rows from the daily rollup than the
    *    hourly one);
    *  - a rollup need NOT be fresh: answers build on
    *    [[ContinuousAggregate.currentBase]], so a stale rollup serves
    *    carried buckets from its segments and re-aggregates only the
    *    changed days' raw partitions (Timescale's real-time
    *    aggregates) — exact at any staleness, O(buckets + tail
    *    events). A rollup that has never refreshed, or whose diff base
    *    was vacuumed, silently falls out of consideration;
    *  - the first rollup whose [[ContinuousAggregate.answer]] accepts
    *    the shape wins; ineligible shapes (collect, group-by-timestamp,
    *    tsEq, unaligned bounds) fall through to the raw-store compile,
    *    bit-identical to [[execute]] without rollups.
    *
    * The reference-semantics guards (NoData for a tagEq miss, "Average
    * failed." for a scalar avg over nothing) are evaluated FROM THE
    * SAME real-time base on the routed path — per-bucket `cnt` sums
    * are exactly the raw row counts, so the error behavior matches the
    * raw path while a fresh-rollup request, guards included, reads
    * only rollup segments. (tsEq never routes, so its error path
    * always takes the raw gate.)
    */
  def execute(store: TimeSeriesStore, qm0: QueryModel,
              rollups: Seq[ContinuousAggregate]): Either[QueryError, DataFrame] =
    Validation.validate(qm0).flatMap { qmV =>
      // canonical [ge, lt) bounds (gt v ≡ ge v+1, le v ≡ lt v+1 at ms
      // granularity): result-equivalent everywhere, and required so the
      // rollup/MetaStats gates and the routed-path guard windows see
      // the same normalized bounds the rewrite rules already use
      val qm = QueryModel.canonicalTsBounds(qmV)
      val routed = rollups
        .sortBy(-_.grainMs)
        .iterator.flatMap { r =>
          (for { df <- r.answer(qm); base <- r.currentBase() }
            yield (df, base)).iterator
        }.nextOption()
      routed match {
        case None =>
          // raw fallback, best plan first:
          //  1. [[MetaStats]] — a day-aligned scalar agg with no tag/ts
          //     point filter folds the partitions' .stats sidecars:
          //     zero-scan (O(boundary) when bounds are unaligned);
          //  2. a tagEq query reads through the store's partition-level
          //     tag index ([[TimeSeriesStore.currentForTag]]) — blooms
          //     have no false negatives, so BOTH the result and the
          //     guards' tag counts are exactly the unpruned ones;
          //  3. a tagless tsEq point probe reads through the sidecar ts
          //     ranges ([[TimeSeriesStore.currentForTs]] — a miss is
          //     often an EMPTY plan, so the NoData probe costs no I/O);
          //  4. the plain pruned-partition scan.
          MetaStats.answer(store, qm).getOrElse {
            val snap = (qm.tagEq, qm.tsEq) match {
              case (Some(t), _)    => store.currentForTag(t)
              case (None, Some(v)) => store.currentForTs(v)
              case _               => store.current()
            }
            execute(snap, qm)
          }
        case Some((df, base)) =>
          // eligible shapes carry no tsEq, so the only guards are the
          // tagEq existence check (over the WHOLE store, matching the
          // raw path's unfiltered count) and the scalar-avg emptiness
          // check (over the filtered range)
          val avgErrors = qm.aggFunc.contains(Agg.Avg) &&
            ResultShape.of(qm) == ResultShape.Scalar
          if (qm.tagEq.isEmpty && !avgErrors) Right(df)
          else {
            val tagCond = qm.tagEq.map(col("tag") === _).getOrElse(lit(false))
            val rangeCond = (
              qm.ge.map(col("bucket_start") >= _).toSeq ++
                qm.lt.map(col("bucket_start") < _) ++
                qm.tagEq.map(col("tag") === _)
              ).reduceOption(_ && _).getOrElse(lit(true))
            val counts = base.agg(
              coalesce(sum(when(tagCond, col("cnt"))), lit(0L)).as("tag_n"),
              coalesce(sum(when(rangeCond, col("cnt"))), lit(0L)).as("hit_n"))
              .head()
            for {
              _ <- qm.tagEq match {
                case Some(t) if counts.getLong(0) == 0L =>
                  Left(QueryError.NoData(s"""No data for tag "$t"."""))
                case _ => Right(())
              }
              _ <- if (avgErrors && counts.getLong(1) == 0L)
                     Left(QueryError.EmptyAverage)
                   else Right(())
            } yield df
          }
      }
    }

  def execute(store: DataFrame, qm0: QueryModel): Either[QueryError, DataFrame] =
    Validation.validate(qm0).flatMap { qm =>
      // a tsEq miss only errors on the paths that look it up directly:
      // tag-path point lookup (tagEq set — Queries/Tag.hs:63-67) or the
      // timestamp path (no tagEq, no groupBy=tag — Queries/TS.hs:60-65);
      // groupTag's tsEq branch returns an empty list (Tag.hs:49-53).
      // "Average failed." applies to the SCALAR avg only (reference
      // handleAvg wraps the AggR branch alone, Queries.hs:146-151).
      val tsEqErrors = qm.tsEq.isDefined &&
        (qm.tagEq.isDefined || !qm.groupBy.contains(GroupBy.Tag))
      val avgErrors = qm.aggFunc.contains(Agg.Avg) &&
        ResultShape.of(qm) == ResultShape.Scalar
      val needGuards = qm.tagEq.isDefined || tsEqErrors || avgErrors
      if (!needGuards) Right(compile(store, qm))
      else {
        // ONE aggregate job answers every guard (the naive formulation —
        // an isEmpty per guard — tripled the job count on the HTTP path)
        val tagCond = qm.tagEq.map(col("tag") === _).getOrElse(lit(false))
        val counts = store.agg(
          count(when(tagCond, 1)).as("tag_n"),
          count(when(predicate(qm), 1)).as("hit_n")).head()
        val tagN = counts.getLong(0)
        val hitN = counts.getLong(1)
        for {
          _ <- qm.tagEq match {
            case Some(t) if tagN == 0 =>
              Left(QueryError.NoData(s"""No data for tag "$t"."""))
            case _ => Right(())
          }
          _ <- qm.tsEq match {
            case Some(t) if tsEqErrors && hitN == 0 =>
              Left(QueryError.NoData(s"No data for timestamp $t."))
            case _ => Right(())
          }
          _ <- if (avgErrors && hitN == 0) Left(QueryError.EmptyAverage)
               else Right(())
        } yield compile(store, qm)
      }
    }
}

package graft.engine

import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** One day partition's `.stats` sidecar: row count, Σvalue, min/max
  * value, min/max timestamp — 48 bytes that answer a whole partition's
  * contribution to any scalar aggregate without opening its files.
  */
private[graft] final case class DayStats(rows: Long, sum: Double,
                                         vmin: Double, vmax: Double,
                                         tsMin: Long, tsMax: Long) {
  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(48)
    val out = new DataOutputStream(bos)
    out.writeLong(rows); out.writeDouble(sum)
    out.writeDouble(vmin); out.writeDouble(vmax)
    out.writeLong(tsMin); out.writeLong(tsMax)
    out.flush(); bos.toByteArray
  }
}

private[graft] object DayStats {
  def fromBytes(bytes: Array[Byte]): Option[DayStats] =
    if (bytes == null || bytes.length != 48) None // unknown format => no stats
    else {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      Some(DayStats(in.readLong(), in.readDouble(), in.readDouble(),
        in.readDouble(), in.readLong(), in.readLong()))
    }
}

/** Metadata-only scalar aggregates — the reference's A1 "agg-only fast
  * path" (SURVEY.md §2: aggregate the whole value column without
  * materializing rows) taken to its 100 TB conclusion: a scalar
  * count/sum/avg/min/max over a day-aligned (or unbounded) time range
  * is the fold of the covered partitions' 48-byte `.stats` sidecars —
  * NO Spark job, no file opened, O(manifest) driver arithmetic. The
  * Iceberg/Delta metadata-count trick, generalized to the four
  * sidecar-foldable aggregates.
  *
  * Partial coverage degrades gracefully: days only partially inside
  * the range (at most the two boundary days), and days whose sidecar
  * is missing (pre-sidecar segments), are aggregated with ONE Spark
  * job over exactly those partitions, then merged with the covered
  * fold — O(boundary), never O(range).
  *
  * Correctness envelope (MetaStatsSpec pins all of it):
  *  - count/min/max are exact;
  *  - sum/avg reassociate per-day partials, so they can differ from a
  *    single-pass fold in the last ulps — the same documented caveat
  *    as [[ContinuousAggregate.answer]], inside every oracle's 4-dp
  *    rounding;
  *  - the scalar-avg-over-nothing error ("Average failed.") is decided
  *    from the merged row count, matching the raw path's guard;
  *  - shapes it can't fold (tagEq, tsEq, grouping, collect) return
  *    None and take the normal path.
  *
  * Engine placement: [[QueryEngine.execute]]'s RAW FALLBACK only — a
  * registered rollup still wins first (it serves the same shapes plus
  * grouped ones from O(buckets) segments, and its plan is what the
  * ts3 plan-audit pins); this path removes the O(events) scan when no
  * rollup is registered, which is the bare store's common state.
  */
object MetaStats {

  /** Merged fold state; identity = the engine's empty-input semantics
    * (count 0, sum 0, min +∞, max −∞ — QueryEngine.aggExpr coalesces).
    */
  private[graft] final case class Acc(rows: Long, sum: Double,
                                      vmin: Double, vmax: Double) {
    def add(s: DayStats): Acc =
      Acc(rows + s.rows, sum + s.sum, math.min(vmin, s.vmin), math.max(vmax, s.vmax))
    def add(rows2: Long, sum2: Double, vmin2: Double, vmax2: Double): Acc =
      Acc(rows + rows2, sum + sum2, math.min(vmin, vmin2), math.max(vmax, vmax2))
  }
  private[graft] val empty: Acc =
    Acc(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  private val D = 86400000L

  /** The plan, exposed for specs: fold state over fully-covered days
    * with stats, plus the day set needing a real (bounded) scan —
    * boundary days and covered days with any missing sidecar. None if
    * the query shape is not metadata-answerable.
    */
  private[graft] def coverage(store: TimeSeriesStore, qm: QueryModel)
      : Option[(Acc, Set[Long])] = coverage(store.liveDayStats(), qm)

  /** [[coverage]] over a PINNED day-stats list — callers that must fold
    * a specific already-validated snapshot (the SQL rewrite's TOCTOU
    * guard) pass the list they pinned instead of re-reading live state.
    */
  private[graft] def coverage(dayStats: Seq[(Long, Option[DayStats])],
                              qm: QueryModel): Option[(Acc, Set[Long])] = {
    val shapeOk = ResultShape.of(qm) == ResultShape.Scalar &&
      qm.tagEq.isEmpty && qm.tsEq.isEmpty
    if (!shapeOk) return None
    // inclusive lo / exclusive hi; MaxValue edges: gt Long.MaxValue is
    // an empty range (handled by an impossible lo), le Long.MaxValue is
    // unbounded (hi = None) — neither may wrap
    if (qm.gt.contains(Long.MaxValue)) return Some((empty, Set.empty))
    val lo: Option[Long] = qm.ge.orElse(qm.gt.map(_ + 1L))
    val hi: Option[Long] = qm.lt.orElse(qm.le.filter(_ != Long.MaxValue).map(_ + 1L))
    def covered(d: Long) = lo.forall(_ <= d * D) && hi.forall((d + 1) * D <= _)
    def overlaps(d: Long) = lo.forall(_ < (d + 1) * D) && hi.forall(d * D < _)
    // group stats BY DAY: a day is stats-answerable only when EVERY one
    // of its entries has a sidecar — the scan reads whole days, so a
    // half-covered day in the fold would double-count the scanned part
    val byDay = dayStats.groupBy(_._1)
    var acc = empty
    var scan = Set.empty[Long]
    byDay.foreach { case (d, entries) =>
      if (overlaps(d)) {
        val stats = entries.map(_._2)
        if (covered(d) && stats.forall(_.isDefined))
          stats.flatten.foreach(s => acc = acc.add(s))
        else scan += d
      }
    }
    Some((acc, scan))
  }

  /** Some(result) when the shape is metadata-answerable (see class
    * doc); the Left is the scalar-avg-over-nothing error. */
  def answer(store: TimeSeriesStore, qm: QueryModel)
      : Option[Either[QueryError, DataFrame]] =
    coverage(store, qm).map { case (folded, scanDays) =>
      val acc =
        if (scanDays.isEmpty) folded
        else {
          // one job over exactly the boundary/statless days
          val r = store.currentForDays(scanDays)
            .filter(QueryEngine.predicate(qm))
            .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
              min(col("value")).as("mn"), max(col("value")).as("mx"))
            .head()
          if (r.getLong(0) == 0L) folded
          else folded.add(r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        }
      val result: Either[QueryError, Double] = qm.aggFunc.get match {
        case Agg.Count => Right(acc.rows.toDouble)
        case Agg.Sum   => Right(acc.sum)
        case Agg.Min   => Right(acc.vmin)
        case Agg.Max   => Right(acc.vmax)
        case Agg.Avg =>
          if (acc.rows == 0L) Left(QueryError.EmptyAverage)
          else Right(acc.sum / acc.rows)
      }
      result.map(v =>
        store.session.range(1).select(lit(v).cast("double").as("result")))
    }
}

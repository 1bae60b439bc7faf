package graft.model

/** Core data model of the time-series engine.
  *
  * Mirrors the reference's logical model (adrianotm/timeseries-db,
  * server/src/Repository/Model.hs:44-116) re-expressed as plain Scala:
  *   - `TS(timestamp, tag, value)` — epoch-millis Long, String, Double
  *   - `TSKey(timestamp, tag)`     — the unique primary key (README.md:63)
  *   - `QueryModel`                — the whole query language (Model.hs:104-116)
  *
  * Everything here is pure and Spark-free; the engine package compiles a
  * validated [[QueryModel]] into a DataFrame plan.
  */
final case class TS(timestamp: Long, tag: String, value: Double)

/** Key-only projection (reference TS', Model.hs:84-88). */
final case class TSKey(timestamp: Long, tag: String)

/** Aggregation functions (reference Model.hs:60-61). */
sealed abstract class Agg(val name: String)
object Agg {
  case object Avg extends Agg("avg")
  case object Sum extends Agg("sum")
  case object Count extends Agg("count")
  case object Min extends Agg("min")
  case object Max extends Agg("max")
  val all: Seq[Agg] = Seq(Avg, Sum, Count, Min, Max)
  def parse(s: String): Option[Agg] = all.find(_.name == s.toLowerCase)
}

/** Grouping dimension (reference Model.hs:54). */
sealed abstract class GroupBy(val name: String)
object GroupBy {
  case object Tag extends GroupBy("tag")
  case object Timestamp extends GroupBy("timestamp")
  def parse(s: String): Option[GroupBy] =
    Seq(Tag, Timestamp).find(_.name == s.toLowerCase)
}

/** Timestamp sort order; asc is the default (reference Model.hs:57,163-166). */
sealed abstract class SortDir(val name: String)
object SortDir {
  case object Asc extends SortDir("asc")
  case object Desc extends SortDir("desc")
  def parse(s: String): Option[SortDir] =
    Seq(Asc, Desc).find(_.name == s.toLowerCase)
}

/** The entire query language: one record, all fields optional
  * (reference Model.hs:104-116).
  */
final case class QueryModel(
    gt: Option[Long] = None,
    ge: Option[Long] = None,
    lt: Option[Long] = None,
    le: Option[Long] = None,
    tsEq: Option[Long] = None,
    tagEq: Option[String] = None,
    aggFunc: Option[Agg] = None,
    groupBy: Option[GroupBy] = None,
    sort: SortDir = SortDir.Asc,
    limit: Option[Int] = None
)

object QueryModel {
  /** Canonicalize the open timestamp bounds to half-open `[ge, lt)`
    * form at millisecond granularity: `gt v ≡ ge v+1` and
    * `le v ≡ lt v+1` over Long timestamps. Result-equivalent for every
    * query path (the predicates select the same rows), and it is what
    * lets the bucket-alignment gates — [[graft.engine.ContinuousAggregate.answer]],
    * the rollup routing in QueryEngine.execute — accept a
    * `gt = bucketStart − 1` bound instead of silently paying the
    * O(events) raw plan (the SQL rewrite and MetaStats already
    * normalized this way; the QueryModel gate was the odd one out).
    *
    * Overflow edges stay untouched rather than wrap: `gt Long.MaxValue`
    * (an empty range — only the raw path expresses it) is kept as gt;
    * `le Long.MaxValue` (no bound at all) is dropped entirely.
    * Validation forbids gt+ge and lt+le together, so no merge is
    * needed.
    */
  def canonicalTsBounds(qm: QueryModel): QueryModel = {
    val viaGe = qm.gt match {
      case Some(v) if v != Long.MaxValue => qm.copy(gt = None, ge = Some(v + 1))
      case _ => qm
    }
    viaGe.le match {
      case Some(v) if v != Long.MaxValue => viaGe.copy(le = None, lt = Some(v + 1))
      case Some(_) => viaGe.copy(le = None) // le MaxValue = unbounded
      case None => viaGe
    }
  }
}

/** Which of the three QueryR shapes a query produces — shared by the
  * plan compiler and the JSON encoder so they can never disagree.
  *
  * The surprising rule is the reference's tagEq+tsEq short-circuit
  * (Queries/Tag.hs:67): a point lookup with an aggregate returns a
  * SCALAR even when groupBy is set.
  */
sealed trait ResultShape
object ResultShape {
  case object Collect extends ResultShape
  final case class Grouped(by: GroupBy) extends ResultShape
  case object Scalar extends ResultShape

  def of(qm: QueryModel): ResultShape = (qm.aggFunc, qm.groupBy) match {
    case (None, _) => Collect
    case (Some(_), Some(_)) if qm.tagEq.isDefined && qm.tsEq.isDefined => Scalar
    case (Some(_), Some(gb)) => Grouped(gb)
    case (Some(_), None) => Scalar
  }
}

/** Engine-level errors: the reference answers these as HTTP 400 with a
  * message; we model them as values (SURVEY.md §7.4 "error-semantics
  * parity").
  */
sealed trait QueryError { def message: String }
object QueryError {
  /** Reference `illegalQM` (Model.hs:126-134). */
  final case class IllegalQuery(message: String) extends QueryError
  /** Reference `noDataErr` (Queries/Utils.hs:47-49). */
  final case class NoData(message: String) extends QueryError
  /** Reference `handleAvg` "Average failed." (Queries/Utils.hs:67-69). */
  case object EmptyAverage extends QueryError {
    val message = "Average failed."
  }
  /** Mutation validation failures, capped at 10 messages like the
    * reference (Handlers.hs:55 `take 10`).
    */
  final case class MutationErrors(messages: Seq[String]) extends QueryError {
    def message: String = messages.mkString("; ")
  }
}

/** Port of the reference's query-validation rules
  * (`illegalQM`, server/src/Repository/Model.hs:126-134).
  */
object Validation {
  import QueryError.IllegalQuery

  // message texts byte-match the reference (including its "provie" typo)
  def validate(qm: QueryModel): Either[QueryError, QueryModel] =
    if (qm.groupBy.isDefined && qm.aggFunc.isEmpty)
      Left(IllegalQuery("You must provie 'aggFunc' with 'groupBy'."))
    else if (qm.gt.isDefined && qm.ge.isDefined)
      Left(IllegalQuery("Can't query 'gt' and 'ge' at the same time."))
    else if (qm.lt.isDefined && qm.le.isDefined)
      Left(IllegalQuery("Can't query 'lt' and 'le' at the same time."))
    else if (qm.tsEq.isDefined &&
      (qm.gt.isDefined || qm.ge.isDefined || qm.lt.isDefined || qm.le.isDefined))
      Left(IllegalQuery("Can't query 'tsEq' with any other timestamp condition."))
    else Right(qm)
}

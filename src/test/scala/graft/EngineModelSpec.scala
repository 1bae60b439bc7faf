package graft

import graft.engine.QueryEngine
import graft.model._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based check of the WHOLE query language: arbitrary stores ×
  * arbitrary valid QueryModels, compile() compared against a direct
  * Scala evaluation of the reference semantics. Values are small
  * integers so every distributed sum is exact regardless of fold order.
  */
object EngineModelSpec extends Properties("QueryEngine-model") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val genStore: Gen[Seq[TS]] = for {
    n <- Gen.choose(0, 30)
    keys <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.oneOf("a", "b", "c")))
    vals <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))
  } yield keys.distinct.zip(vals).map { case ((t, g), v) => TS(t, g, v) }

  private val genQm: Gen[QueryModel] = for {
    lower <- Gen.option(Gen.zip(Gen.oneOf(true, false), Gen.choose(0L, 12L)))
    upper <- Gen.option(Gen.zip(Gen.oneOf(true, false), Gen.choose(0L, 12L)))
    point <- Gen.oneOf(true, false)
    tsEq <- Gen.option(Gen.choose(0L, 12L))
    tagEq <- Gen.option(Gen.oneOf("a", "b", "c", "zzz"))
    agg <- Gen.option(Gen.oneOf(Agg.all))
    grp <- agg.fold(Gen.const(Option.empty[GroupBy]))(_ =>
      Gen.option(Gen.oneOf(GroupBy.Tag, GroupBy.Timestamp)))
    sort <- Gen.oneOf(SortDir.Asc, SortDir.Desc)
    limit <- Gen.option(Gen.choose(0, 20))
  } yield
    if (point && tsEq.isDefined)
      QueryModel(tsEq = tsEq, tagEq = tagEq, aggFunc = agg, groupBy = grp,
        sort = sort, limit = limit)
    else QueryModel(
      gt = lower.collect { case (true, v) => v },
      ge = lower.collect { case (false, v) => v },
      lt = upper.collect { case (true, v) => v },
      le = upper.collect { case (false, v) => v },
      tagEq = tagEq, aggFunc = agg, groupBy = grp, sort = sort, limit = limit)

  private def matches(qm: QueryModel)(r: TS): Boolean =
    qm.gt.forall(r.timestamp > _) && qm.ge.forall(r.timestamp >= _) &&
      qm.lt.forall(r.timestamp < _) && qm.le.forall(r.timestamp <= _) &&
      qm.tsEq.forall(r.timestamp == _) && qm.tagEq.forall(r.tag == _)

  private def fold(agg: Agg, vs: Seq[Double]): Double = agg match {
    case Agg.Count => vs.size.toDouble
    case Agg.Sum => vs.sum
    case Agg.Avg => if (vs.isEmpty) 0.0 else vs.sum / vs.size // fromMaybe 0
    case Agg.Min => if (vs.isEmpty) Double.PositiveInfinity else vs.min
    case Agg.Max => if (vs.isEmpty) Double.NegativeInfinity else vs.max
  }

  /** Direct evaluation of the reference semantics over a row list. */
  private def model(rows: Seq[TS], qm: QueryModel): Seq[Seq[Any]] = {
    val hit = rows.filter(matches(qm))
    ResultShape.of(qm) match {
      case ResultShape.Collect =>
        val sorted = qm.sort match {
          case SortDir.Asc => hit.sortBy(r => (r.timestamp, r.tag))
          case SortDir.Desc => hit.sortBy(r => (-r.timestamp, r.tag))
        }
        qm.limit.fold(sorted)(sorted.take).map(r => Seq(r.timestamp, r.tag, r.value))
      case ResultShape.Grouped(GroupBy.Tag) =>
        val agg = qm.aggFunc.get
        val groups = qm.tagEq match {
          case Some(t) => // singleton mempty-folded group (queryTag')
            Seq(t -> fold(agg, hit.map(_.value)))
          case None => // groupTag: only non-empty groups (F4)
            hit.groupBy(_.tag).view.mapValues(g => fold(agg, g.map(_.value)))
              .toSeq
        }
        val sorted = groups.sortBy(_._1)
        qm.limit.fold(sorted)(sorted.take).map { case (g, v) => Seq(g, v) }
      case ResultShape.Grouped(GroupBy.Timestamp) =>
        val agg = qm.aggFunc.get
        val groups = hit.groupBy(_.timestamp).view
          .mapValues(g => fold(agg, g.map(_.value))).toSeq
        val sorted = qm.sort match {
          case SortDir.Asc => groups.sortBy(_._1)
          case SortDir.Desc => groups.sortBy(-_._1)
        }
        qm.limit.fold(sorted)(sorted.take).map { case (t, v) => Seq(t, v) }
      case ResultShape.Scalar =>
        val agg = qm.aggFunc.get
        // compile() leaves empty-scalar-avg as null (execute() errors
        // before reaching it); mirror with a null sentinel
        if (agg == Agg.Avg && hit.isEmpty) Seq(Seq(null))
        else Seq(Seq(fold(agg, hit.map(_.value))))
    }
  }

  property("compile() == direct reference-semantics evaluation") =
    forAll(genStore, genQm) { (rows, qm) =>
      val got = QueryEngine.compile(rows.toDF(), qm).collect()
        .map(_.toSeq.toList).toList
      val want = model(rows, qm).map(_.toList).toList
      if (got != want)
        println(s"MISMATCH qm=$qm rows=${rows.size}\n got=$got\n want=$want")
      got == want
    }
}

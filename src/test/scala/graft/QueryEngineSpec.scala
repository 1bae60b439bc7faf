package graft

import graft.engine.QueryEngine
import graft.model._
import org.apache.spark.sql.{DataFrame, Row}

/** Operator semantics on tiny in-memory frames — one test per SURVEY.md
  * §2 edge that the DuckDB oracle can't express (errors, ±Infinity,
  * multi-row timestamp groups — FIXTURES.md §2's "hand-built fixture").
  */
class QueryEngineSpec extends SparkSpec {
  import spark.implicits._

  // Reuses one timestamp across tags => multi-row timestamp groups.
  private lazy val store: DataFrame = Seq(
    TS(1000L, "a", 1.0), TS(1000L, "b", 2.0),
    TS(2000L, "a", 3.0), TS(3000L, "b", 4.0),
    TS(4000L, "a", 5.0), TS(4000L, "b", 6.0)
  ).toDF()

  private lazy val empty: DataFrame = Seq.empty[TS].toDF()

  private def run(qm: QueryModel, df: DataFrame = store): Seq[Row] =
    QueryEngine.compile(df, qm).collect().toSeq

  test("collect: asc default, canonical (timestamp, tag) order") {
    val rows = run(QueryModel())
    assert(rows.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1000L, "a"), (1000L, "b"), (2000L, "a"), (3000L, "b"), (4000L, "a"), (4000L, "b")))
  }

  test("collect: desc + limit = top-k most recent (L1)") {
    val rows = run(QueryModel(sort = SortDir.Desc, limit = Some(3)))
    assert(rows.map(_.getLong(0)) == Seq(4000L, 4000L, 3000L))
  }

  test("range bounds are exclusive/inclusive as specified (F1)") {
    assert(run(QueryModel(gt = Some(1000L), lt = Some(4000L))).map(_.getLong(0)) ==
      Seq(2000L, 3000L))
    assert(run(QueryModel(ge = Some(2000L), le = Some(3000L))).map(_.getLong(0)) ==
      Seq(2000L, 3000L))
  }

  test("tsEq point lookup returns all tags at that timestamp (A4/G7 input)") {
    assert(run(QueryModel(tsEq = Some(1000L))).map(_.getString(1)) == Seq("a", "b"))
  }

  test("scalar aggregates (G1-G5, A1 fast path)") {
    assert(run(QueryModel(aggFunc = Some(Agg.Count))).head.getDouble(0) == 6.0)
    assert(run(QueryModel(aggFunc = Some(Agg.Sum))).head.getDouble(0) == 21.0)
    assert(run(QueryModel(aggFunc = Some(Agg.Avg))).head.getDouble(0) == 3.5)
    assert(run(QueryModel(aggFunc = Some(Agg.Min))).head.getDouble(0) == 1.0)
    assert(run(QueryModel(aggFunc = Some(Agg.Max))).head.getDouble(0) == 6.0)
  }

  test("empty-store scalar agg: min/max are ±Infinity, sum 0, count 0 (Bounded Double parity)") {
    assert(run(QueryModel(aggFunc = Some(Agg.Min)), empty).head.getDouble(0).isPosInfinity)
    assert(run(QueryModel(aggFunc = Some(Agg.Max)), empty).head.getDouble(0).isNegInfinity)
    assert(run(QueryModel(aggFunc = Some(Agg.Sum)), empty).head.getDouble(0) == 0.0)
    assert(run(QueryModel(aggFunc = Some(Agg.Count)), empty).head.getDouble(0) == 0.0)
  }

  test("group by tag: canonical order, sort ignored (G6)") {
    val rows = run(QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag),
      sort = SortDir.Desc))
    assert(rows.map(r => (r.getString(0), r.getDouble(1))) ==
      Seq(("a", 9.0), ("b", 12.0)))
  }

  test("group by timestamp honors sort; multi-row groups aggregate (G8)") {
    val asc = run(QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Timestamp)))
    assert(asc.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((1000L, 3.0), (2000L, 3.0), (3000L, 4.0), (4000L, 11.0)))
    val desc = run(QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Timestamp),
      sort = SortDir.Desc))
    assert(desc.map(_.getLong(0)) == Seq(4000L, 3000L, 2000L, 1000L))
  }

  test("limit applies after grouping (L2)") {
    val rows = run(QueryModel(aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Timestamp),
      limit = Some(2)))
    assert(rows.map(_.getLong(0)) == Seq(1000L, 2000L))
  }

  test("limit ignored for scalar agg (L3)") {
    assert(run(QueryModel(aggFunc = Some(Agg.Sum), limit = Some(1))).size == 1)
  }

  test("empty-group elimination: no zero-count groups (F4)") {
    val rows = run(QueryModel(ge = Some(2000L), aggFunc = Some(Agg.Count),
      groupBy = Some(GroupBy.Tag)))
    assert(rows.map(_.getString(0)) == Seq("a", "b")) // both still present
    val rows2 = run(QueryModel(ge = Some(2000L), le = Some(2000L),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))
    assert(rows2.map(_.getString(0)) == Seq("a")) // b eliminated, not 0
  }

  test("execute: illegal query model rejected") {
    assert(QueryEngine.execute(store, QueryModel(groupBy = Some(GroupBy.Tag))).isLeft)
  }

  test("execute: tagEq miss errors 'No data for tag' (A4)") {
    val r = QueryEngine.execute(store, QueryModel(tagEq = Some("zzz")))
    assert(r == Left(QueryError.NoData("No data for tag \"zzz\".")))
  }

  test("execute: tsEq miss errors 'No data for timestamp' (A4)") {
    val r = QueryEngine.execute(store, QueryModel(tsEq = Some(999L)))
    assert(r == Left(QueryError.NoData("No data for timestamp 999.")))
  }

  test("execute: avg over empty input errors 'Average failed.' (G3)") {
    val r = QueryEngine.execute(store, QueryModel(gt = Some(9999L), aggFunc = Some(Agg.Avg)))
    assert(r == Left(QueryError.EmptyAverage))
  }

  test("tagEq + groupBy=tag over an empty range emits the singleton mempty group") {
    // reference queryTag' (Tag.hs:27-29) always folds the (possibly
    // empty) range for the named tag; grouped avg is `fromMaybe 0`
    def single(agg: Agg) = run(QueryModel(tagEq = Some("a"), gt = Some(9999L),
      aggFunc = Some(agg), groupBy = Some(GroupBy.Tag)))
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(single(Agg.Sum) == Seq(("a", 0.0)))
    assert(single(Agg.Count) == Seq(("a", 0.0)))
    assert(single(Agg.Avg) == Seq(("a", 0.0)))
    assert(single(Agg.Min).head._2.isPosInfinity)
    assert(single(Agg.Max).head._2.isNegInfinity)
    // non-empty range: the real fold, still a singleton
    val live = run(QueryModel(tagEq = Some("a"),
      aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)))
    assert(live.map(r => (r.getString(0), r.getDouble(1))) == Seq(("a", 9.0)))
  }

  test("tagEq + tsEq + agg short-circuits to a SCALAR even with groupBy (Tag.hs:67)") {
    assert(ResultShape.of(QueryModel(tagEq = Some("a"), tsEq = Some(1000L),
      aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag))) == ResultShape.Scalar)
    val rows = run(QueryModel(tagEq = Some("a"), tsEq = Some(1000L),
      aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)))
    assert(rows.length == 1 && rows.head.schema.fieldNames.toSeq == Seq("result"))
    assert(rows.head.getDouble(0) == 1.0)
  }

  test("execute: GROUPED avg over empty input is an empty list, not an error") {
    // reference handleAvg applies only to the scalar AggR branch
    // (Queries.hs:146-150); grouped empties fall out as []
    val r = QueryEngine.execute(store, QueryModel(gt = Some(9999L),
      aggFunc = Some(Agg.Avg), groupBy = Some(GroupBy.Tag)))
    assert(r.isRight && r.toOption.get.collect().isEmpty)
  }

  test("execute: tsEq miss with groupBy=tag (no tagEq) is empty, not an error") {
    // groupTag's tsEq branch returns [] (Tag.hs:49-53); only the direct
    // lookup paths raise noDataErr
    val r = QueryEngine.execute(store, QueryModel(tsEq = Some(999L),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))
    assert(r.isRight && r.toOption.get.collect().isEmpty)
    // but with tagEq present the point lookup errors again
    val r2 = QueryEngine.execute(store, QueryModel(tsEq = Some(999L), tagEq = Some("a"),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Tag)))
    assert(r2 == Left(QueryError.NoData("No data for timestamp 999.")))
  }

  test("execute: valid query passes through to compile") {
    val r = QueryEngine.execute(store, QueryModel(aggFunc = Some(Agg.Sum)))
    assert(r.toOption.get.collect().head.getDouble(0) == 21.0)
  }
}

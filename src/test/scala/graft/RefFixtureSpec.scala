package graft

import graft.engine.QueryEngine
import graft.model._

/** Port of the reference's deterministic demo generator
  * (/root/reference/server/src/helpers/generateTS.hs:1-42, FIXTURES.md
  * §2) at small N: engine results must equal a direct Scala fold over
  * the same rows.
  */
class RefFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val N = 5000
  private val T0 = 16184810930000L

  private def tag(i: Int): String =
    if (i % 2 == 0) "Munich"
    else if (i % 3 == 0) "Skopje"
    else if (i % 5 == 0) "London"
    else "Athens"

  private def value(i: Int): Double =
    if (i % 6 == 0) 12.0 else if (i % 4 == 0) 21.0
    else if (i % 10 == 0) 1223.0 else 44.0

  private lazy val rows: Seq[TS] =
    (0 to N).map(i => TS(T0 + i, tag(i), value(i)))
  private lazy val df = rows.toDF()

  test("scalar aggregates equal the direct fold") {
    def scalar(a: Agg) =
      QueryEngine.compile(df, QueryModel(aggFunc = Some(a))).collect().head.getDouble(0)
    assert(scalar(Agg.Count) == rows.size.toDouble)
    assert(scalar(Agg.Sum) == rows.map(_.value).sum) // integral values: exact
    assert(scalar(Agg.Min) == 12.0 && scalar(Agg.Max) == 1223.0)
    assert(math.abs(scalar(Agg.Avg) - rows.map(_.value).sum / rows.size) < 1e-9)
  }

  test("group by tag equals the direct group fold (4 skewed groups)") {
    val got = QueryEngine.compile(df,
      QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = rows.groupBy(_.tag).view.mapValues(_.map(_.value).sum).toMap
    assert(got == want)
    assert(got.keySet == Set("Munich", "Skopje", "London", "Athens"))
  }

  test("range + tag + sort + limit slice equals the direct computation") {
    val qm = QueryModel(ge = Some(T0 + 1000), lt = Some(T0 + 4000),
      tagEq = Some("Athens"), sort = SortDir.Desc, limit = Some(50))
    val got = QueryEngine.compile(df, qm).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val want = rows.filter(r => r.timestamp >= T0 + 1000 && r.timestamp < T0 + 4000
        && r.tag == "Athens")
      .sortBy(-_.timestamp).take(50).map(r => (r.timestamp, r.value))
    assert(got.toSeq == want)
  }

  test("group by timestamp yields size-1 groups on dense unique timestamps") {
    val got = QueryEngine.compile(df, QueryModel(ge = Some(T0), lt = Some(T0 + 100),
      aggFunc = Some(Agg.Count), groupBy = Some(GroupBy.Timestamp))).collect()
    assert(got.length == 100 && got.forall(_.getDouble(1) == 1.0))
  }
}

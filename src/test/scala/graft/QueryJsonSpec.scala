package graft

import graft.api.QueryJson
import graft.model._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Wire-protocol laws: any valid QueryModel rendered to JSON parses back
  * to itself; unknown fields are always rejected (schema-strict parity
  * with the reference's rejectUnknownFields).
  */
object QueryJsonSpec extends Properties("QueryJson") {

  private val genValid: Gen[QueryModel] = for {
    lower <- Gen.option(Gen.oneOf("gt", "ge"))
    upper <- Gen.option(Gen.oneOf("lt", "le"))
    usePoint <- Gen.oneOf(true, false)
    t1 <- Gen.choose(0L, 1L << 45)
    t2 <- Gen.choose(0L, 1L << 45)
    tp <- Gen.choose(0L, 1L << 45)
    tag <- Gen.option(Gen.alphaStr.suchThat(_.nonEmpty))
    agg <- Gen.option(Gen.oneOf(Agg.all))
    grp <- if (agg.isDefined) Gen.option(Gen.oneOf(GroupBy.Tag, GroupBy.Timestamp))
           else Gen.const(None)
    sort <- Gen.oneOf(SortDir.Asc, SortDir.Desc)
    limit <- Gen.option(Gen.choose(1, 1000))
  } yield
    if (usePoint)
      QueryModel(tsEq = Some(tp), tagEq = tag, aggFunc = agg, groupBy = grp,
        sort = sort, limit = limit)
    else
      QueryModel(
        gt = if (lower.contains("gt")) Some(t1) else None,
        ge = if (lower.contains("ge")) Some(t1) else None,
        lt = if (upper.contains("lt")) Some(t2) else None,
        le = if (upper.contains("le")) Some(t2) else None,
        tagEq = tag, aggFunc = agg, groupBy = grp, sort = sort, limit = limit)

  private def render(qm: QueryModel): String = {
    val fields = Seq(
      qm.gt.map(v => s""""gt":$v"""), qm.ge.map(v => s""""ge":$v"""),
      qm.lt.map(v => s""""lt":$v"""), qm.le.map(v => s""""le":$v"""),
      qm.tsEq.map(v => s""""tsEq":$v"""),
      qm.tagEq.map(v => s""""tagEq":"$v""""),
      qm.aggFunc.map(a => s""""aggFunc":"${a.name}""""),
      qm.groupBy.map(g => s""""groupBy":"${g.name}""""),
      Some(s""""sort":"${qm.sort.name}""""),
      qm.limit.map(v => s""""limit":$v""")
    ).flatten
    fields.mkString("{", ",", "}")
  }

  property("parse(render(qm)) == qm for valid models") = forAll(genValid) { qm =>
    QueryJson.parseQueryModel(render(qm)) == Right(qm)
  }

  property("unknown fields always rejected") =
    forAll(genValid, Gen.identifier.suchThat(f =>
      !Set("gt", "ge", "lt", "le", "tsEq", "tagEq", "aggFunc", "groupBy",
        "sort", "limit").contains(f))) { (qm, field) =>
      val json = render(qm).dropRight(1) + s""","$field":1}"""
      QueryJson.parseQueryModel(json).isLeft
    }

  property("TS batch roundtrips") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(0L, 1L << 45),
      Gen.alphaStr.suchThat(_.nonEmpty), Gen.choose(-1e6, 1e6)))) { rows =>
      val ts = rows.map { case (t, g, v) => TS(t, g, v) }
      val json = ts.map(r =>
        s"""{"timestamp":${r.timestamp},"tag":"${r.tag}","value":${r.value}}""")
        .mkString("[", ",", "]")
      QueryJson.parseTsBatch(json) == Right(ts)
    }
}

package graft

import graft.engine.QueryEngine
import graft.model._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws (SURVEY.md §5 item 3) relating operators to each
  * other on arbitrary small stores — reassociation-safe checks only.
  */
object QueryPropertiesSpec extends Properties("QueryEngine") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // Unique (timestamp, tag) keys, per the reference's PK constraint.
  private val genStore: Gen[Seq[TS]] = for {
    n <- Gen.choose(0, 40)
    keys <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 15L), Gen.oneOf("a", "b", "c")))
    vals <- Gen.listOfN(n, Gen.choose(-100, 100).map(_.toDouble))
  } yield keys.distinct.zip(vals).map { case ((t, g), v) => TS(t, g, v) }

  private def df(rows: Seq[TS]) = spark.createDataset(rows).toDF()

  property("count == collect length") = forAll(genStore) { rows =>
    val d = df(rows)
    val c = QueryEngine.compile(d, QueryModel(aggFunc = Some(Agg.Count)))
      .collect().head.getDouble(0)
    c == QueryEngine.compile(d, QueryModel()).collect().length.toDouble
  }

  property("sum over groupBy tag == total sum (integral values => exact)") =
    forAll(genStore) { rows =>
      val d = df(rows)
      val grouped = QueryEngine.compile(d,
        QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag)))
        .collect().map(_.getDouble(1)).sum
      val total = QueryEngine.compile(d, QueryModel(aggFunc = Some(Agg.Sum)))
        .collect().head.getDouble(0)
      grouped == total
    }

  property("min == min of per-timestamp group minima (or +inf when empty)") =
    forAll(genStore) { rows =>
      val d = df(rows)
      val groups = QueryEngine.compile(d,
        QueryModel(aggFunc = Some(Agg.Min), groupBy = Some(GroupBy.Timestamp)))
        .collect().map(_.getDouble(1))
      val total = QueryEngine.compile(d, QueryModel(aggFunc = Some(Agg.Min)))
        .collect().head.getDouble(0)
      if (groups.isEmpty) total.isPosInfinity else total == groups.min
    }

  property("collect is canonical: invariant under input row order") =
    forAll(genStore) { rows =>
      val a = QueryEngine.compile(df(rows), QueryModel()).collect().toSeq
      val b = QueryEngine.compile(df(rows.reverse), QueryModel()).collect().toSeq
      a == b
    }

  property("range filter partitions the store: |lt t| + |ge t| == |all|") =
    forAll(genStore, Gen.choose(0L, 15L)) { (rows, t) =>
      val d = df(rows)
      def n(qm: QueryModel) = QueryEngine.compile(d, qm).collect().length
      n(QueryModel(lt = Some(t))) + n(QueryModel(ge = Some(t))) == n(QueryModel())
    }
}

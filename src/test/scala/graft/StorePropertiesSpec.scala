package graft

import graft.engine.TimeSeriesStore
import graft.model._
import java.nio.file.Files
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property: a TimeSeriesStore driven by arbitrary
  * insert/update/delete batches always equals the naive
  * Map[(timestamp, tag) -> value] model — including all-or-nothing
  * rejection of invalid batches. Few cases (real parquet I/O per op).
  */
object StorePropertiesSpec extends Properties("TimeSeriesStore") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val genBatch: Gen[Seq[TS]] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 5L),
      Gen.oneOf("a", "b"), Gen.choose(0, 99).map(_.toDouble)))
  } yield rows.map { case (t, g, v) => TS(t, g, v) }

  property("arbitrary insert/update/delete sequence matches naive model") =
    forAll(Gen.listOfN(4, Gen.zip(Gen.oneOf("ins", "upd", "del"), genBatch))) { ops =>
      val store = new TimeSeriesStore(spark,
        Files.createTempDirectory("graft-prop").toString)
      val model = scala.collection.mutable.Map.empty[(Long, String), Double]
      ops.foreach { case (kind, batch) =>
        val keys = batch.map(r => (r.timestamp, r.tag))
        kind match {
          case "ins" =>
            val ok = keys.distinct.size == keys.size && !keys.exists(model.contains)
            val res = store.insert(batch.toDS())
            assert(res.isRight == ok, s"insert validity mismatch: $batch")
            if (ok) batch.foreach(r => model((r.timestamp, r.tag)) = r.value)
          case "upd" =>
            val ok = keys.distinct.size == keys.size && keys.forall(model.contains)
            val res = store.update(batch.toDS())
            assert(res.isRight == ok, s"update validity mismatch: $batch")
            if (ok) batch.foreach(r => model((r.timestamp, r.tag)) = r.value)
          case "del" =>
            val ks = batch.map(r => TSKey(r.timestamp, r.tag)) // store dedupes
            val ok = ks.forall(k => model.contains((k.timestamp, k.tag)))
            val res = store.delete(ks.toDS())
            assert(res.isRight == ok, s"delete validity mismatch: $ks")
            if (ok) ks.foreach(k => model.remove((k.timestamp, k.tag)))
        }
      }
      val got = store.current().select("timestamp", "tag", "value").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      got == model.toMap
    }
}

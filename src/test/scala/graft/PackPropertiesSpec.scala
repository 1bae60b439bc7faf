package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Law: the distributed two-phase-prefix-sum packer equals a plain
  * sequential fold over the same corpus, for ANY doc sizes, capacity
  * and bucketing — the property that pins the carry arithmetic.
  */
object PackPropertiesSpec extends Properties("Pack") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // Spark job per trial

  private val genCase: Gen[(Seq[(Long, Int)], Long, Int)] = for {
    n <- Gen.choose(1, 25)
    ids <- Gen.listOfN(n, Gen.choose(0L, 500L)).map(_.distinct)
    sizes <- Gen.listOfN(ids.size, Gen.choose(1, 20))
    cap <- Gen.choose(1L, 25L)
    buckets <- Gen.oneOf(1, 3, 256)
  } yield (ids.zip(sizes), cap, buckets)

  private def reference(docs: Seq[(Long, Int)], cap: Long)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    var off = 0L
    val placed = docs.sortBy(_._1).map { case (id, t) =>
      val s = off; off += t; (id, s, off)
    }
    placed.flatMap { case (id, s, e) =>
      (s / cap to (e - 1) / cap).map { q =>
        val lo = math.max(s, q * cap); val hi = math.min(e, (q + 1) * cap)
        val split = s < q * cap || e > (q + 1) * cap
        (q, id, hi - lo, split)
      }
    }.groupBy(_._1).toSeq.map { case (q, rows) =>
      (q, rows.size.toLong, rows.count(_._4).toLong, rows.map(_._3).sum,
        rows.map(_._2).min, rows.map(_._2).max)
    }.sortBy(_._1)
  }

  property("packSequences == sequential fold for any sizes/capacity/bucketing") =
    forAll(genCase) { case (docs, cap, buckets) =>
      val df = docs.map { case (id, t) => (id, Seq.fill(t)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Pack.packSequences(df, cap, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      got == reference(docs, cap)
    }

  private val genSeries: Gen[(Seq[Double], Double, Int)] = for {
    n <- Gen.choose(1, 30)
    vals <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))
    alpha <- Gen.oneOf(0.25, 0.5, 0.75) // binary-exact weights
    frame <- Gen.choose(1, 8)
  } yield (vals, alpha, frame)

  property("ewmaBounded == sequential bounded fold per row") =
    forAll(genSeries) { case (vals, alpha, frame) =>
      val df = vals.zipWithIndex
        .map { case (v, i) => ("s", i.toLong, v) }
        .toDF("tag", "bucket_start", "cnt")
      val got = graft.operators.Forecast
        .ewmaBounded(df, Seq("tag"), "bucket_start", "cnt", alpha, frame)
        .collect().map(r => (r.getLong(1), r.getDouble(3))).sortBy(_._1)
        .map(_._2).toSeq
      val want = vals.indices.map { i =>
        val window = vals.slice(math.max(0, i - frame + 1), i + 1)
        val folded = window.tail.foldLeft(window.head)((acc, x) =>
          acc * (1 - alpha) + alpha * x)
        // Spark's round(col, 4) on doubles: exact-binary BigDecimal,
        // HALF_UP — replicate it exactly rather than rint (half-even)
        BigDecimal(folded).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      got == want
    }
}

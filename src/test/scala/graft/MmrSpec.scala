package graft

import graft.operators.Mmr
import org.apache.spark.sql.functions._

/** Greedy MMR selection ([[graft.operators.Mmr]]): pinned EXACTLY
  * against a sequential reference replay (same rounding, same
  * tie-breaks), plus the diversity property the operator exists for.
  */
class MmrSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, sfDir)

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("distributed greedy == sequential reference replay (exact ids, order, scores)") {
    val lambda = 0.5
    val k = 10
    val got = Mmr.mmrSelect(emb, k = k, lambda = lambda)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    var selected = Vector.empty[(Long, Seq[Double], Double)]
    while (selected.length < k) {
      val selIds = selected.map(_._1).toSet
      val cand = rows.filterNot(r => selIds(r._1)).map { case (id, v) =>
        val maxSim = if (selected.isEmpty) None
          else Some(selected.map(s => cos(v, s._2)).max)
        val score = maxSim match {
          case None => round6(lambda * 1.0)
          case Some(ms) => round6(lambda * 1.0 - (1.0 - lambda) * ms)
        }
        (id, v, score)
      }
      val best = cand.minBy { case (id, _, s) => (-s, id) }
      selected :+= best
    }
    val ref = selected.zipWithIndex.map { case ((id, _, s), r) => (r.toLong, id, s) }
    assert(got == ref)
  }

  test("selected exemplars are more diverse than the first-k prefix") {
    val k = 10
    val byId = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toMap
    val picked = Mmr.mmrSelect(emb, k = k).collect().map(_.getLong(1)).toSeq
    def meanPairCos(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield cos(byId(ids(i)), byId(ids(j)))
      ps.sum / ps.length
    }
    val diverse = meanPairCos(picked)
    val prefix = meanPairCos((0L until k.toLong).toSeq)
    info(f"mean pairwise cos: mmr=$diverse%.4f prefix=$prefix%.4f")
    assert(diverse < prefix,
      s"MMR selection ($diverse) should be more diverse than the arbitrary prefix ($prefix)")
  }

  test("k beyond the corpus exhausts gracefully; k=1 is the pure-relevance argmax") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Seq.fill(64)(0.1f)), (1L, Seq.fill(64)(-0.1f)), (2L, Seq.fill(64)(0.2f))
    ).toDF("vec_id", "embedding")
    assert(Mmr.mmrSelect(tiny, k = 10).count() == 3)
    // constant relevance: rank 0 is the vec_id tie-break winner
    assert(Mmr.mmrSelect(tiny, k = 1).head().getLong(1) == 0L)
  }
}

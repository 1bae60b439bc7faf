package graft

import graft.functions.NumericFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the round-3 operators: three independent
  * connected-components formulations must agree on arbitrary graphs,
  * and the int128 aggregate must equal BigInt arithmetic on arbitrary
  * signed longs under arbitrary partitionings.
  */
object OperatorPropertiesSpec extends Properties("Operators") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // Spark-job-per-trial: keep trial counts small but meaningful
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L)))
  } yield edges

  property("CC: star contraction == driver DSU == label propagation") =
    forAll(genEdges) { edges =>
      val pairs = edges.toDF("id_a", "id_b")
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = m(Dedup.connectedComponents(pairs, maxIter = 30, smallCutoff = 0))
      val dsu = m(Dedup.connectedComponents(pairs))
      // maxIter >= 26: ids span 0..25, so a generated near-path graph
      // can need diameter(25) label-propagation rounds to converge
      val prop = m(Dedup.connectedComponentsLabelProp(pairs, maxIter = 30))
      star == dsu && dsu == prop
    }

  private val genLongs: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 60)
    // magnitudes up to ~9e17 so a 60-element sum can cross the Long
    // range in either direction — the regime the 128-bit buffer exists for
    vals <- Gen.listOfN(n, Gen.choose(-900000000000000000L, 900000000000000000L))
  } yield vals

  // spans the full long range — including 2^62 and negatives, far past
  // the old unreduced formula's ~3.4e9 ANSI overflow ceiling
  private val genIds: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 30)
    ids <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue), Gen.const(1L << 62),
      Gen.const(Long.MaxValue), Gen.const(Long.MinValue + 1)))
  } yield ids

  property("pseudoOrder == BigInt reference on full-range longs (no overflow)") =
    forAll(genIds) { ids =>
      val got = ids.toDF("id")
        .select(col("id"), graft.operators.Sampling.pseudoOrder(col("id")).as("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // Spark's % follows the dividend's sign; BigInt's mod operator %
      // does too, so the unreduced BigInt form is the exact reference
      ids.forall { id =>
        got(id) == ((BigInt(id) * BigInt(2654435761L)) % BigInt(1000000007L)).toLong
      }
    }

  property("epochOrder == BigInt reference on full-range longs (no overflow)") =
    forAll(genIds, Gen.choose(0L, 1000L)) { (ids, epoch) =>
      val got = ids.toDF("id")
        .select(col("id"), graft.operators.Sampling.epochOrder(
          col("id"), lit(epoch)).as("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ids.forall { id =>
        // mirror the REDUCED form: with a two-term sum the unreduced
        // congruent value can sit on the other signed-% representative
        // for negative ids (sum signs differ), unlike the single
        // product in pseudoOrder's law
        val m = BigInt(1000000007L)
        val ref = ((BigInt(id) % m) * BigInt(2654435761L) +
          (BigInt(epoch) % m) * BigInt(40503L)) % m
        got(id) == ref.toLong
      }
    }

  property("Sum128 == BigInt sum over arbitrary signed longs + partitionings") =
    forAll(genLongs, Gen.choose(1, 7)) { (vals, parts) =>
      NumericFunctions.register(spark)
      val got = vals.toDF("v").repartition(parts)
        .agg(NumericFunctions.sum128(col("v"))).head().getDecimal(0)
      BigDecimal(got) == BigDecimal(vals.map(BigInt(_)).sum)
    }

  // small vocabulary so cross-doc n-gram overlap actually arises
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 6)
    docs <- Gen.sequence[Seq[Seq[String]], Seq[String]](
      (0 until nDocs).map(_ => Gen.choose(2, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")))))
  } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  private val genMix: Gen[(Seq[(Long, String, String)], Seq[(String, Double)], Long)] = for {
    nDocs <- Gen.choose(1, 25)
    docs <- Gen.sequence[Seq[(Int, Int)], (Int, Int)]((0 until nDocs).map(_ =>
      Gen.zip(Gen.choose(0, 3), Gen.choose(1, 40)))) // (source idx, token count)
    nW <- Gen.choose(1, 4)
    ws <- Gen.sequence[Seq[Double], Double](Seq.fill(nW)(Gen.choose(0.1, 5.0)))
    budget <- Gen.choose(1L, 400L)
  } yield (
    docs.zipWithIndex.map { case ((s, len), i) =>
      (i.toLong, s"s$s", (1 to len).map(j => s"w$j").mkString(" ")) },
    ws.zipWithIndex.map { case (w, i) => (s"s$i", w) },
    budget)

  property("tokenBudgetSample: quota bound, >=1 doc per binding source, unweighted absent") =
    forAll(genMix) { case (rows, weights, budget) =>
      import graft.operators.Sampling
      val docs = rows.toDF("doc_id", "source", "text")
      val kept = Sampling.tokenBudgetSample(docs, budget, weights).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val wsum = weights.map(_._2).sum
      val quota = weights.map { case (g, w) =>
        g -> math.floor(budget * w / wsum).toLong }.toMap
      val bySrc = kept.groupBy(_._1)
      // only weighted sources appear; per source the EXCLUSIVE cumsum of
      // every kept doc is under quota (total - largest <= total - last)
      kept.forall(k => quota.contains(k._1)) &&
        bySrc.forall { case (s, ks) =>
          ks.map(_._3).sum - ks.map(_._3).max < quota(s) } &&
        // every weighted source with docs and a positive quota contributes
        quota.forall { case (s, q) =>
          q == 0 || !rows.exists(_._2 == s) || bySrc.contains(s) }
    }

  // ---- liveness/state family (round 9): randomized cross-operator laws

  private val genBeats: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 50)
    beats <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 4L), Gen.choose(1L, 2000L)))
  } yield beats.distinct

  property("heartbeatAgg == fold of its own liveRanges (beats/ranges/uptime)") =
    forAll(genBeats, Gen.choose(10L, 500L)) { (beats, tol) =>
      import graft.operators.TsAnalytics
      val df = beats.toDF("user_id", "t")
      val agg = TsAnalytics.heartbeatAgg(df, "user_id", "t", tol).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val ranges = TsAnalytics.liveRanges(df, "user_id", "t", tol).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val byKey = ranges.groupBy(_._1)
      agg.keySet == byKey.keySet && byKey.forall { case (k, rs) =>
        val (nb, nr, up) = agg(k)
        rs.map(_._4).sum == nb && rs.length.toLong == nr &&
          rs.map(r => r._3 - r._2).sum == up &&
          // ranges are disjoint and ordered with real gaps between them
          rs.sortBy(_._2).toSeq.sliding(2).forall {
            case Seq(a, b) => a._3 < b._2
            case _         => true
          }
      }
    }

  private val dayMs = 86400000L
  private val genIntervals: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    iv <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 3 * dayMs)
      w <- Gen.choose(1L, dayMs)
    } yield (s, s + w))
  } yield iv

  property("peakConcurrency two-phase == sequential sweep reference") =
    forAll(genIntervals,
        Gen.oneOf(3600000L, 43200000L, dayMs)) { (iv, bucketMs) =>
      import graft.operators.TsAnalytics
      val got = TsAnalytics.peakConcurrency(iv.toDF("s", "e"), "s", "e", bucketMs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // driver reference: one global in-order sweep; a day's peak is the
      // max over its events of the step values just before and after
      val ev = iv.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }.sorted
      var run = 0L
      val ref = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      ev.foreach { case (t, d) =>
        val pre = run; run += d
        val day = (t / dayMs) * dayMs
        val (p, n) = ref.getOrElse(day, (Long.MinValue, 0L))
        ref(day) = (math.max(p, math.max(pre, run)), n + 1)
      }
      got == ref.toMap
    }

  private val genStateLog: Gen[Seq[(Long, Long, String)]] = for {
    n <- Gen.choose(1, 50)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 1000L)
      s <- Gen.oneOf("A", "B", "C")
    } yield (k, t, s))
  } yield evs.groupBy(e => (e._1, e._2)).values.map(_.head).toSeq // unique (key, t)

  property("stateAgg durations tile each key's timeline; transitions count pairs") =
    forAll(genStateLog) { log =>
      import graft.operators.TsAnalytics
      val df = log.toDF("user_id", "t", "event_type")
      val sa = TsAnalytics.stateAgg(df, "user_id", "event_type", "t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val byKey = log.groupBy(_._1)
      val durOk = byKey.forall { case (k, evs) =>
        val rows = sa.filter(_._1 == k)
        val ts = evs.map(_._2)
        rows.map(_._3).sum == ts.max - ts.min &&            // durations tile
          rows.map(_._4).sum == evs.size - 1 &&             // intervals = n-1
          rows.map(_._5).sum == 1 + evs.sortBy(_._2).map(_._3)
            .sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      }
      val tr = TsAnalytics.stateTransitions(df, "user_id", "event_type", "t")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val refPairs = byKey.values.flatMap(evs =>
        evs.sortBy(_._2).map(_._3).sliding(2).collect { case Seq(a, b) => (a, b) })
        .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }.toSet
      val countsOk = tr.map(t => (t._1, t._2, t._3)).toSet == refPairs
      val stochasticOk = tr.groupBy(_._1).values
        .forall(rows => math.abs(rows.map(_._4).sum - 1.0) < 0.01)
      durOk && countsOk && stochasticOk
    }

  private val genKeepBestDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 30)
    texts <- Gen.listOfN(n, for {
      base <- Gen.oneOf("alpha beta", "gamma delta", "epsilon")
      punct <- Gen.oneOf("", ".", "!!", ", ")
      extra <- Gen.oneOf("", " more words here", " x")
    } yield base + punct + extra)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("exactKeepBest == driver reference (longest wins, ties to min id)") =
    forAll(genKeepBestDocs) { docs =>
      val got = Dedup.exactKeepBest(docs.toDF("doc_id", "text"), "text",
          "doc_id", length(col("text")).cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def norm(s: String) = s.toLowerCase.replaceAll("[.,!?;:]", "")
        .replaceAll(" +", " ").trim
      val ref = docs.groupBy(d => norm(d._2)).values.map { g =>
        val best = g.minBy(d => (-d._2.length, d._1))
        (best._1, best._2.length.toLong, g.size.toDouble)
      }.toSet
      got == ref
    }

  property("span totals at minRun=1 == dupNgramFraction shared-occurrence counts") =
    forAll(genCorpus) { corpus =>
      // two independent plans over the same semantics: the per-doc sum of
      // island sizes must equal the per-doc count of shared occurrences
      val docs = corpus.toDF("doc_id", "text")
      val fromSpans = Dedup.dupNgramSpans(docs, n = 2, minRun = 1)
        .groupBy("doc_id").agg(sum("n_shared_grams").as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fromFrac = Dedup.dupNgramFraction(docs, n = 2).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap // (doc_id, n_dup)
      fromFrac.filter(_._2 > 0) == fromSpans
    }
}

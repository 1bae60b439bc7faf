package graft

import graft.operators.{Forecast, Frequency, Pack}
import org.apache.spark.sql.functions._

/** Sequence packing, heavy hitters and bounded EWMA: the deterministic
  * end-to-end behaviors (MG's algorithmic laws are property-tested in
  * [[FreqPropertiesSpec]]).
  */
class PackFreqSpec extends SparkSpec {
  import spark.implicits._

  // 10 docs, doc i = i+1 tokens ("w w w ...") => 55 tokens total
  private def docsDf = (0 until 10)
    .map(i => (i.toLong, Seq.fill(i + 1)("w").mkString(" ")))
    .toDF("doc_id", "text")

  test("packSequences: conservation, full sequences, boundary counts") {
    val out = Pack.packSequences(docsDf, capacity = 10).collect()
    // 55 tokens at capacity 10 => 6 sequences, last holds 5
    assert(out.map(_.getLong(0)).toSeq == (0L to 5L))
    assert(out.map(_.getLong(3)).sum == 55L)
    assert(out.dropRight(1).forall(_.getLong(3) == 10L))
    assert(out.last.getLong(3) == 5L)
    // doc offsets: doc0 [0,1) doc1 [1,3) doc2 [3,6) doc3 [6,10) — all
    // inside seq 0; doc4 [10,15) starts ON the boundary (not split);
    // doc5 [15,21) straddles seqs 1|2
    val bySeq = out.map(r => r.getLong(0) -> r).toMap
    assert(bySeq(0L).getLong(1) == 4L && bySeq(0L).getLong(2) == 0L)
    assert(bySeq(1L).getLong(1) == 2L && bySeq(1L).getLong(2) == 1L)
    assert(bySeq(1L).getLong(4) == 4L && bySeq(1L).getLong(5) == 5L)
    // the straddler is counted (as split) in BOTH sequences it touches
    assert(bySeq(2L).getLong(4) == 5L)
  }

  test("packSequences is invariant to the bucketing (the prefix-sum carry is exact)") {
    def run(buckets: Int) =
      Pack.packSequences(docsDf, capacity = 7, targetBuckets = buckets)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(3))
    assert(run(3) == run(256))
  }

  test("packSequences: empty corpus => empty result") {
    assert(Pack.packSequences(docsDf.filter($"doc_id" < 0), 10).count() == 0L)
    assert(Pack.packApply(docsDf.filter($"doc_id" < 0), 10).count() == 0L)
  }

  test("packSequences rejects duplicate and negative doc ids loudly") {
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
    // duplicates detect scan-stage on the window pass (zero extra jobs),
    // so the error surfaces at action time
    val dup = docsDf.union(docsDf.limit(1))
    val e1 = intercept[Exception](Pack.packSequences(dup, 10).collect())
    assert(chain(e1).contains("duplicate doc_id"))
    val neg = Seq((-1L, "a b"), (0L, "c")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException](Pack.packSequences(neg, 10))
    assert(e2.getMessage.contains("non-negative"))
  }

  test("scoreDeciles: empty and scoreless corpora => empty report, not an NPE or a null band") {
    import graft.operators.Quality
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Quality.scoreDeciles(empty).count() == 0L)
    assert(Quality.scoreDeciles(empty, approx = true).count() == 0L)
    // a corpus whose every doc is scoreless (null/empty text) is the
    // same degenerate distribution: the empty report again — not one
    // decile=null row swallowing every doc (aggregate over the null
    // cuts array banding to null), and not an ANSI 0/0 error from
    // scoring empty text
    val scoreless = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    assert(Quality.scoreDeciles(scoreless).count() == 0L)
    // mixed corpus: the scoreless docs are excluded, the scored counted
    val mixed = scoreless.union(Seq((3L, "alpha beta gamma")).toDF("doc_id", "text"))
    assert(Quality.scoreDeciles(mixed).collect().map(_.getLong(1)).sum == 1L)
  }

  test("scoreDeciles(approx) tracks the exact report within sketch tolerance on the fixture") {
    import graft.operators.Quality
    // the production query (x_quality_deciles_approx) is rows-only —
    // THIS is its gate: same bands, populations within the sketch's
    // rank error of the exact report's (default accuracy 10000 =>
    // rank error <= n/10000, i.e. exact at fixture sizes is typical,
    // but gate loosely enough that a legitimate sketch stays green
    // while a broken banding fails)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def report(approx: Boolean): Map[Long, Long] =
      Quality.scoreDeciles(docs, approx = approx).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = report(approx = false)
    val approx = report(approx = true)
    assert(exact.keySet == approx.keySet) // all 10 bands populated alike
    val n = exact.values.sum
    assert(approx.values.sum == n) // every doc lands in exactly one band
    // each band within 2% of corpus size of the exact population
    exact.foreach { case (band, cnt) =>
      assert(math.abs(approx(band) - cnt) <= math.max(2L, n / 50),
        s"band $band: exact=$cnt approx=${approx(band)}")
    }
  }

  test("weightedSample raises on non-positive weights and negative ids") {
    import graft.operators.Sampling
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
    val badW = Seq((1L, 0.0), (2L, 3.0)).toDF("doc_id", "w")
    val e1 = intercept[Exception](
      Sampling.weightedSample(badW, "doc_id", "w", 1).collect())
    assert(chain(e1).contains("weightedSample"))
    val badId = Seq((-1L, 2.0)).toDF("doc_id", "w")
    val e2 = intercept[Exception](
      Sampling.weightedSample(badId, "doc_id", "w", 1).collect())
    assert(chain(e2).contains("weightedSample"))
  }

  test("weightedSample keys stay spread at realistic (large) weights") {
    import graft.operators.Sampling
    // w ~ thousands: the power-form key u^(1/w) rounded to 4 decimals
    // collapses here; the log-domain key must keep the draw weighted
    val docs = (0 until 500).map(i => (i.toLong, 2000.0 + i)).toDF("doc_id", "w")
    val keys = Sampling.weightedSample(docs, "doc_id", "w", 500)
      .collect().map(_.getDouble(2))
    assert(keys.distinct.length > 450) // near-unique, not a few tie buckets
  }

  test("packApply reconstructs exactly the concatenated corpus chunks") {
    // distinct tokens so slices are position-sensitive
    val docs = (0 until 10)
      .map(i => (i.toLong, (0 to i).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Pack.packApply(docs, capacity = 10).collect()
    val stream = (0 until 10).flatMap(i => (0 to i).map(j => s"w${i}_$j"))
    val expected = stream.grouped(10).zipWithIndex.map { case (chunk, i) =>
      (i.toLong, chunk.size.toLong,
        org.apache.commons.codec.digest.DigestUtils.md5Hex(chunk.mkString(" ")))
    }.toSeq
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq == expected)
  }

  test("heavyHitterTopK == exact groupBy top-k on a skewed corpus") {
    // zipf-ish: token t_j appears ~ N/j times across docs
    val docs = (0 until 50).map { i =>
      val toks = (1 to 20).flatMap(j => if (i % j == 0) Seq(s"t$j") else Nil)
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Frequency.heavyHitterTopK(docs, k = 8, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t").limit(8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("heavyHitterTopK: empty corpus => empty result") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Frequency.heavyHitterTopK(empty, k = 5, capacity = 8).count() == 0L)
  }

  test("heavyHitterTopK stays exact when capacity evictions fire") {
    // 26 distinct tokens, capacity 8: the MG summary must evict, yet
    // the two clear heavy hitters survive candidacy and recount exactly
    val docs = (0 until 40).map { i =>
      val heavy = Seq.fill(30)("hot") ++ Seq.fill(20)("warm")
      val noise = (0 until 26).map(c => ('a' + c).toChar.toString)
      (i.toLong, (heavy ++ noise).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Frequency.heavyHitterTopK(docs, k = 2, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("hot", 1200L), ("warm", 800L)))
  }

  test("weightedSample: equal weights reduce to pseudoOrder top-k; heavy rows dominate") {
    import graft.operators.Sampling
    val docs = (0 until 200).map(i => (i.toLong, 10.0)).toDF("doc_id", "w")
    val equal = Sampling.weightedSample(docs, "doc_id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    // equal weights: u^(1/w) is monotone in u, so top-k == top-k by u
    val byOrder = docs
      .orderBy(Sampling.pseudoOrder(col("doc_id")).desc, col("doc_id"))
      .limit(20).collect().map(_.getLong(0)).toSet
    assert(equal == byOrder)
    // one row with overwhelming weight: key -> 1, always sampled
    val skewed = docs.withColumn("w",
      when($"doc_id" === 77L, 1e9).otherwise(1.0))
    val got = Sampling.weightedSample(skewed, "doc_id", "w", k = 5)
      .collect().map(_.getLong(0))
    assert(got.length == 5 && got.contains(77L))
    // deterministic: a second draw is identical
    val again = Sampling.weightedSample(skewed, "doc_id", "w", k = 5)
      .collect().map(_.getLong(0))
    assert(got.toSeq == again.toSeq)
  }

  test("approx_percentile tracks exact percentile within sketch tolerance on the fixture") {
    val ts = graft.sources.Tables.ts(spark, "/root/testdata/sf0.001")
      .select($"tag", $"value")
    // the sketch's guarantee is on RANK, not value: accuracy 1000 =>
    // rank error <= n/1000, so gate each approx value inside the exact
    // value bracket at quantile ± 0.02 (20x headroom)
    val exact = ts.groupBy($"tag")
      .agg(expr("percentile(value, 0.48)").as("lo50"),
        expr("percentile(value, 0.52)").as("hi50"),
        expr("percentile(value, 0.93)").as("lo95"),
        expr("percentile(value, 0.97)").as("hi95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = ts.groupBy($"tag")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"),
        expr("approx_percentile(value, 0.95, 1000)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (tag, (a50, a95)) =>
      val (lo50, hi50, lo95, hi95) = exact(tag)
      assert(a50 >= lo50 && a50 <= hi50, s"$tag p50: $a50 outside [$lo50, $hi50]")
      assert(a95 >= lo95 && a95 <= hi95, s"$tag p95: $a95 outside [$lo95, $hi95]")
    }
  }

  test("ewmaBounded: recurrence values and frame bounding") {
    val grid = Seq(("a", 0L, 2.0), ("a", 1L, 4.0), ("a", 2L, 8.0),
      ("b", 0L, 1.0)).toDF("tag", "bucket_start", "cnt")
    val full = Forecast.ewmaBounded(grid, Seq("tag"), "bucket_start", "cnt",
      alpha = 0.25, frameRows = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    // 2; 2*.75+4*.25 = 2.5; 2.5*.75+8*.25 = 3.875; series b untouched
    assert(full.toSeq == Seq(("a", 0L, 2.0), ("a", 1L, 2.5), ("a", 2L, 3.875),
      ("b", 0L, 1.0)))
    // frameRows = 2: the third point folds ONLY [4, 8] => 4*.75+8*.25 = 5
    val bounded = Forecast.ewmaBounded(grid, Seq("tag"), "bucket_start", "cnt",
      alpha = 0.25, frameRows = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(bounded.toSeq == Seq(("a", 0L, 2.0), ("a", 1L, 2.5), ("a", 2L, 5.0),
      ("b", 0L, 1.0)))
  }

  test("d2_distinct_approx tracks d1_distinct_exact within the HLL rsd bound") {
    // the one rows-only CORRECTNESS query that had no property gate
    // tying it to its exact twin (round-7 verdict #4): run both
    // SparkEntry entries on the fixture and gate the sketch at 3×rsd
    // (approx_count_distinct's default rsd = 0.05 is a standard
    // deviation — 3σ = 15% relative error, generous but regression-
    // catching: an off-by-10× bug is 60σ out)
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("d1_distinct_exact")(spark, dir)
      .head().getDouble(1) // n_values
    val approx = SparkEntry.queries("d2_distinct_approx")(spark, dir)
      .head().getDouble(0) // approx_values
    assert(exact > 0, s"fixture has no distinct values? exact=$exact")
    val relErr = math.abs(approx - exact) / exact
    assert(relErr <= 0.15, s"approx=$approx vs exact=$exact: relErr=$relErr > 0.15")
  }
}

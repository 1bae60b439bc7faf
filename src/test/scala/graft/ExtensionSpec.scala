package graft

import graft.functions.TextFunctions
import graft.operators.{AsOfJoin, Dedup, LangModel, Multimodal, Quality, Similarity}
import org.apache.spark.sql.functions._

/** Unit semantics for the training-data extension operators on tiny
  * hand-built frames (near-dups with known overlap, known vectors).
  */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup
    (3L, "completely different words appear here today friends"),
    (4L, "spark engines shuffle data between executors quickly")
  ).toDF("doc_id", "text")

  test("exact dedup: identical texts collapse to min id with group size") {
    val r = Dedup.exact(docs).collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.toSeq == Seq((0L, 2.0), (2L, 1.0), (3L, 1.0), (4L, 1.0)))
  }

  test("n-gram jaccard: exact dup = 1.0; near dup in (0,1); disjoint absent") {
    val pairs = Dedup.jaccardPairs(docs, n = 3, minJaccard = 0.1).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)))
  }

  test("dup n-gram fraction: exact dups fully duplicated, near dup partial, unique 0") {
    val r = Dedup.dupNgramFraction(docs, n = 3).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(0L) == ((7L, 7L, 1.0)))   // every gram also in doc 1
    assert(r(1L) == ((7L, 7L, 1.0)))
    assert(r(2L) == ((7L, 6L, 0.8571))) // "the lazy cat" is its own
    assert(r(3L)._3 == 0.0 && r(4L)._3 == 0.0)
  }

  test("dup n-gram fraction counts OCCURRENCES: intra-doc repeats of a shared gram each count") {
    val d = Seq((0L, "x y z"), (1L, "x y z q x y z")).toDF("doc_id", "text")
    val r = Dedup.dupNgramFraction(d, n = 3).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(0L) == ((1L, 1L, 1.0)))
    assert(r(1L) == ((5L, 2L, 0.4))) // "x y z" twice, both shared with doc 0
  }

  test("dup n-gram spans: maximal shared runs give trim coordinates; short runs suppressed") {
    val d = Seq(
      (0L, "a b c d e f g h"),        // shares "a b c d e f" with doc 1
      (1L, "x y a b c d e f q r"),
      (2L, "a b c z1 z2 z3 q")        // one isolated shared gram < minRun
    ).toDF("doc_id", "text")
    val r = Dedup.dupNgramSpans(d, n = 3, minRun = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // doc0: gram positions 0-3 shared -> tokens [0,5]; doc1: positions 2-5 -> tokens [2,7]
    assert(r.toSeq == Seq((0L, 0L, 5L, 4L), (1L, 2L, 7L, 4L)))
  }

  test("span trim: duplicated ranges removed, clean docs byte-identical, removal counted") {
    val d = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e f q r"),
      (2L, "p q r2 s t u v")).toDF("doc_id", "text")
    val r = Dedup.trimDupSpans(d, n = 3, minRun = 2).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      (0L, "g h", 6L),
      (1L, "x y q r", 6L),
      (2L, "p q r2 s t u v", 0L)))
  }

  test("bigram LM: word order separates shuffled token soup where unigram can't") {
    val df = ((0L to 3L).map(i => (i, "the cat sat on the mat")) :+
      ((4L, "mat the on sat cat the"))).toDF("doc_id", "text")
    val uni = LangModel.unigramNll(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(0L) == uni(4L)) // same bag of words — unigram is blind
    val bi = LangModel.bigramNll(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(bi(0L)._1 == 5L) // 6 tokens -> 5 bigram positions
    assert(bi(0L) == bi(3L)) // identical docs score identically
    assert(bi(4L)._2 > bi(0L)._2) // rare bigrams -> higher nll
  }

  test("bigram LM: docs with fewer than 2 tokens have no positions and are absent") {
    val df = Seq((0L, "a b"), (1L, "solo")).toDF("doc_id", "text")
    assert(LangModel.bigramNll(df).collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("Holt forecast: exact on linear series for any alpha/beta; constant stays flat; <2 points empty") {
    import graft.model.TS
    import graft.operators.Forecast
    val linear = (0 to 9).map(t => TS(1000L * t, "lin", 2.0 + 3.0 * t))
    val const = (0 to 9).map(t => TS(1000L * t, "const", 7.5))
    val lone = Seq(TS(0L, "lone", 1.0))
    val r = Forecast.holtLinear((linear ++ const ++ lone).toDS(),
        alpha = 0.37, beta = 0.81, horizon = 3).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    val lin = r.filter(_._1 == "lin")
    assert(lin.toSeq == (1 to 3).map(h =>
      ("lin", h.toLong, 9000L + 1000L * h, 2.0 + 3.0 * (9 + h))))
    assert(r.filter(_._1 == "const").forall(_._4 == 7.5))
    assert(!r.exists(_._1 == "lone"))
    // even gap count: true median (mean of the two middle spacings)
    val uneven = Seq(TS(0L, "u", 1.0), TS(1000L, "u", 2.0), TS(4000L, "u", 3.0))
    val ts1 = Forecast.holtLinear(uneven.toDS(), horizon = 1).collect()
      .map(_.getLong(2)).head
    assert(ts1 == 6000L) // 4000 + median([1000, 3000]) = 4000 + 2000
  }

  test("k-means: total assignment, ≤k clusters, balanced sample honors per-cluster quota") {
    import graft.operators.Clustering
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val assign = Clustering.kmeansAssign(emb, k = 4, iters = 2)
    assert(assign.count() == 200L) // every vector lands in exactly one cluster
    assert(assign.select("cluster").distinct().count() <= 4L)
    val prof = Clustering.clusterProfile(emb, k = 4, iters = 2).collect()
    assert(prof.map(_.getLong(1)).sum == 200L)
    assert(prof.forall(_.getDouble(2) > 0.0))
    val sampled = Clustering.balancedSample(emb, k = 4, perCluster = 5, iters = 2)
    val perCluster = sampled.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(perCluster.forall(_ <= 5L) && sampled.count() <= 20L)
  }

  test("quality filter report: rules count independently; kept = flagged by none") {
    val fluent = "the a of " + (1 to 38).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, "the of and to in is", "en"),              // short + low quality
      (1L, fluent, "en"),                             // kept
      (2L, Seq.fill(40)("spam").mkString(" "), "en"), // repetitive + low quality
      (3L, fluent, "fr")                              // lang mismatch only
    ).toDF("doc_id", "text", "lang")
    val r = Quality.filterReport(d).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("kept" -> 1L, "lang_mismatch" -> 1L, "low_quality" -> 2L,
      "repetitive" -> 1L, "too_short" -> 1L))
  }

  test("token-budget mix: per-source exclusive-cumsum cut, ≥1 doc per weighted source, unweighted absent") {
    import graft.operators.Sampling
    def words(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = (Seq(1L, 2L, 3L, 4L).map(id => (id, "a", words(10))) ++
      Seq(11L, 12L, 13L).map(id => (id, "b", words(30))) :+
      ((21L, "c", words(5)))).toDF("doc_id", "source", "text")
    val r = Sampling.tokenBudgetSample(docs, budgetTokens = 100L,
        weights = Seq("a" -> 0.25, "b" -> 0.75), groupCol = "source")
      .collect().map(x => (x.getString(0), x.getLong(1))).toList
    // source a (quota 25, 10-token docs in pseudoOrder 2,4,1,3): 1,2,4
    // kept (the doc crossing the share stays), 3 cut; b (quota 75)
    // takes all 3×30 = 90 — overshoot bounded by one doc; c unweighted
    assert(r == List(("a", 1L), ("a", 2L), ("a", 4L),
      ("b", 11L), ("b", 12L), ("b", 13L)))
    // a share smaller than the first document still yields that document
    val tiny = Sampling.tokenBudgetSample(
      Seq((1L, "x", words(100))).toDF("doc_id", "source", "text"),
      budgetTokens = 10L, weights = Seq("x" -> 1.0), groupCol = "source")
    assert(tiny.count() == 1L)
    // a duplicated weight key would fan out the quota join — rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(docs, 100L,
        weights = Seq("a" -> 0.5, "a" -> 0.5), groupCol = "source")
    }
  }

  test("quality drift: identical corpora give PSI exactly 0; a degraded batch trips the gate") {
    import graft.operators.Quality
    val fluent = "the a of " + (1 to 38).map(i => s"w$i").mkString(" ")
    // varied reference: 10-39-token docs score lenFactor = toks/100 =
    // 0.10-0.39, spreading mass over bands 1-3
    val ref = (1L to 40L).map(i =>
      (i, fluent.split(" ").take(10 + (i % 30).toInt).mkString(" "))).toDF("doc_id", "text")
    // null/empty-text docs score null — they must carry NO band (not
    // silently file into the top band via null-skipping least())
    val withJunk = ref.unionByName(
      Seq((98L, null.asInstanceOf[String]), (99L, "")).toDF("doc_id", "text"))
    val same = Quality.drift(withJunk, withJunk).collect()
    // complete 10-band spine; equal counts make every contribution
    // EXACTLY zero (p_new == p_ref bit-for-bit under the same smoothing)
    assert(same.length == 10 && same.forall(_.getDouble(3) == 0.0))
    assert(same.map(_.getLong(1)).sum == 40L) // the 2 junk docs excluded
    // a degraded snapshot (short spammy docs — scores collapse to the
    // bottom bands) must trip the investigate threshold
    val degraded = (1L to 40L).map(i => (i, "spam spam")).toDF("doc_id", "text")
    val psi = Quality.drift(ref, degraded).collect().map(_.getDouble(3)).sum
    assert(psi > 0.25, s"total PSI $psi should exceed the action threshold")
  }

  test("temperature mix: α=0 is uniform, α=1 natural shares; flattening is monotone in α") {
    import graft.operators.Sampling
    def words(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // a head-heavy corpus: source a has >3× source b's tokens, and both
    // sides hold more than any quota below (so the cut, not exhaustion,
    // decides every share)
    val docs = (Seq.tabulate(20)(i => (i.toLong, "a", words(50))) ++
      Seq.tabulate(30)(i => (100L + i, "b", words(10)))).toDF("doc_id", "source", "text")
    def tokensBySource(alpha: Double): Map[String, Long] =
      Sampling.temperatureMix(docs, budgetTokens = 300L, alpha = alpha,
          groupCol = "source").collect()
        .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    // α=0: pow(share, 0) == 1.0 exactly for every source — quotas are
    // floor(B/2) each, and the crossing doc bounds the overshoot
    val uni = tokensBySource(0.0)
    assert(uni("a") >= 150L && uni("a") < 150L + 50L)
    assert(uni("b") >= 150L && uni("b") < 150L + 10L)
    // α=1: natural proportions — the head keeps ~10/13 of the budget
    val nat = tokensBySource(1.0)
    assert(nat("a") > nat("b") * 3)
    // flattening is monotone: the tail's share never shrinks as α drops
    val mid = tokensBySource(0.5)
    assert(nat("b") <= mid("b") && mid("b") <= uni("b"))
    assert(uni("a") <= mid("a") && mid("a") <= nat("a"))
  }

  test("temperature mix: non-string group keys work; zero-token sources get no quota at any α") {
    import graft.operators.Sampling
    // integer group column: the aggregate reads it as its canonical
    // string form instead of ClassCastException-ing the driver map
    val intGroups = Seq((1L, 7, "a b c"), (2L, 8, "d e")).toDF("doc_id", "source", "text")
    val got = Sampling.temperatureMix(intGroups, budgetTokens = 100L, alpha = 0.5,
      groupCol = "source").collect()
    assert(got.map(_.getString(0)).toSet == Set("7", "8"))
    // a source with only null-text (zero-token — wsTokenCount("") is 1,
    // so empty strings don't qualify) docs: at α=0 the IEEE pow(0,0)=1
    // convention would otherwise grant it a full uniform quota that
    // its token-less docs all pass — it must get NOTHING, and the real
    // sources must split the budget as if it didn't exist
    val withDead = Seq((1L, "a", "x y z"), (2L, "b", "p q"),
        (3L, "dead", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    Seq(0.0, 0.5, 1.0).foreach { alpha =>
      val out = Sampling.temperatureMix(withDead, budgetTokens = 10L, alpha = alpha)
        .collect()
      assert(!out.map(_.getString(0)).contains("dead"), s"alpha=$alpha")
    }
  }

  test("edge behavior: empty corpus / absent terms / zero vectors degrade, never crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.dupNgramFraction(empty).count() == 0L)
    assert(Dedup.dupNgramSpans(empty).count() == 0L)
    assert(LangModel.bigramNll(empty).count() == 0L)
    // the ruleset report on an empty corpus is five ZEROS, not nulls
    val emptyLang = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(Quality.filterReport(emptyLang).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("kept" -> 0L, "lang_mismatch" -> 0L, "low_quality" -> 0L,
        "repetitive" -> 0L, "too_short" -> 0L))
    val docs2 = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text")
    // no doc contains any query term -> empty result, not an error
    assert(graft.operators.Search.bm25TopK(docs2, "absent terms", k = 5).count() == 0L)
    intercept[IllegalArgumentException] {
      graft.operators.Search.bm25TopK(docs2, "   ", k = 5)
    }
    // zero vector: cosine defines 0.0 (never NaN), so it ranks last, not first
    val withZero = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val ranked = Similarity.bruteForceTopKInt8(withZero,
      withZero.filter($"vec_id" === 0L), k = 2).collect()
      .map(x => (x.getLong(2), x.getDouble(3)))
    assert(ranked.head._1 == 1L && ranked.last == ((2L, 0.0)))
  }

  test("BM25: all-terms doc outranks single-term docs; no-term docs absent; k-cut honored") {
    val corpus = Seq(
      (0L, "spark join fast"),
      (1L, "spark alpha beta gamma"),
      (2L, "join delta epsilon"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val r = graft.operators.Search.bm25TopK(corpus, "spark join", k = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    assert(r.head._1 == 0L)                       // both terms, shortest doc
    assert(r.map(_._1).toSet == Set(0L, 1L, 2L))  // doc 3 matches nothing
    assert(r.forall(_._2 > 0.0))
    assert(r.find(_._1 == 0L).get._3 == 2L && r.find(_._1 == 1L).get._3 == 1L)
    assert(graft.operators.Search.bm25TopK(corpus, "spark join", k = 1).count() == 1L)
  }

  test("minhash LSH finds the exact and near dup; est_jaccard sane") {
    val pairs = Dedup.minhashPairs(docs, n = 3, k = 64, bands = 16,
      minEstJaccard = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("minhash estimates track exact jaccard on real fixture data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.jaccardPairs(docs, n = 3, minJaccard = 0.4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val est = Dedup.minhashPairs(docs, n = 3, k = 64, bands = 16,
      minEstJaccard = 0.4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // estimator accuracy: shared pairs within k=64 sampling error
    val common = exact.keySet.intersect(est.keySet)
    assert(common.nonEmpty)
    common.foreach(p => assert(math.abs(exact(p) - est(p)) <= 0.25,
      s"pair $p exact=${exact(p)} est=${est(p)}"))
    // banding recall: pairs with high true similarity are nearly always
    // caught (P[detect] at j=0.7 with r=4,b=16 is ~0.99)
    val strong = exact.filter(_._2 >= 0.7).keySet
    if (strong.nonEmpty)
      assert(strong.count(est.contains).toDouble / strong.size >= 0.8)
  }

  test("minhash LSH recall gate vs exact jaccard at the x_dedup operating point") {
    // the production query (x_dedup_minhash_lsh) has no DuckDB oracle
    // (xxhash64 signatures are engine-specific); THIS is its regression
    // gate — recall against the exact-jaccard ground truth on the same
    // doc_id<200 subset x_dedup_jaccard checks, at the same n/k/bands/
    // threshold the bench query runs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 200)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.jaccardPairs(docs, n = 3, minJaccard = 0.5))
    val est = pairSet(Dedup.minhashPairs(docs, n = 3, k = 64, bands = 16,
      minEstJaccard = 0.5))
    assert(exact.nonEmpty)
    val recall = est.intersect(exact).size.toDouble / exact.size
    info(f"minhash recall at j>=0.5: $recall%.3f (n=${exact.size})")
    // deterministic pipeline: measured 1.000 on this fixture; the gate
    // sits below so a real banding/signature regression fails here
    // while an intentional k/bands retune has headroom
    assert(recall >= 0.8, f"minhash LSH recall regressed: $recall%.3f")
  }

  test("incremental near-dup probe == one-shot minhashPairs cross-boundary pairs on fixture data") {
    // the production query (x_dedup_incremental_neardup) is rows-only;
    // THIS is its regression gate, at full strength: the index probe
    // shares minhashPairs' hashing and banding, so on the same corpus
    // split its candidates must EQUAL the one-shot pairs that cross the
    // history/batch boundary (recall 1.0 relative, not just >= 0.8)
    import graft.operators.MinHashIndex
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.filter($"doc_id" < 250)
    val batch = docs.filter($"doc_id" >= 250)
      .unionByName(docs.filter($"doc_id" < 20)
        .withColumn("doc_id", $"doc_id" + 200000L)
        .withColumn("text", concat($"text", lit(" recrawl"))))
    val idx = new MinHashIndex(spark,
      java.nio.file.Files.createTempDirectory("graft-mh-gate").toString)
    idx.write(history)
    val probe = idx.neardupe(batch, minEstJaccard = 0.5).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    val historyIds = history.select($"doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.minhashPairs(history.unionByName(batch),
        n = 3, k = 64, bands = 16, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(x => historyIds.contains(x._1) ^ historyIds.contains(x._2)).toSet
    assert(probe.nonEmpty, "no cross-boundary near-dups — the injection is broken")
    assert(probe == oneShot)
  }

  test("connected components cluster transitive near-dup pairs deterministically") {
    // 1-2, 2-3 chain; 7-8 pair; 9 isolated (not in pairs => not emitted)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    val survivors = Dedup.clusterSurvivors(pairs).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(survivors.toSeq == Seq((1L, 3.0), (7L, 2.0)))
  }

  test("star-contraction CC: 50-hop chain converges in O(log n) rounds, no warning") {
    // a duplicate CHAIN is the label-propagation killer (O(diameter)
    // rounds); star contraction (smallCutoff = 0 forces the distributed
    // path) must close it well inside maxIter and stay silent
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    val star = try {
      System.setErr(new java.io.PrintStream(errBuf, true))
      Dedup.connectedComponents(chain, maxIter = 30, smallCutoff = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally System.setErr(prevErr)
    assert(star == (0L to 50L).map(_ -> 0L).toMap)
    assert(!errBuf.toString.contains("NOT converged"),
      s"star contraction did not converge: ${errBuf.toString}")
    // the driver-side union-find fast path agrees exactly
    val dsu = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dsu == star)
    // all three formulations agree on branchy graphs (cycles + ring)
    val branchy = (Seq((10L, 20L), (20L, 30L), (30L, 10L), (40L, 50L)) ++
      (0L until 8L).map(i => (100L + i, 100L + (i + 1) % 8))).toDF("id_a", "id_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = m(Dedup.connectedComponents(branchy, maxIter = 30, smallCutoff = 0))
    assert(viaStar == m(Dedup.connectedComponentsLabelProp(branchy)))
    assert(viaStar == m(Dedup.connectedComponents(branchy)))
  }

  test("end-to-end dedup: minhash pairs -> clusters over the fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.minhashPairs(docs, n = 3, k = 64, bands = 16,
      minEstJaccard = 0.5)
    val survivors = Dedup.clusterSurvivors(pairs).collect()
    assert(survivors.nonEmpty) // the corpus contains near-dup chains
    assert(survivors.forall(_.getDouble(1) >= 2.0))
  }

  test("simhash: identical texts => hamming 0; banding finds them") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((0L, 1L)) == 0L)
  }

  test("simhash SWAR fold matches explode formulation past 255 distinct tokens") {
    // the former byte-lane counters silently overflowed at 256 distinct
    // tokens; 16-bit lanes must agree with the shuffle-based ground
    // truth well past that
    val big = Seq(
      (0L, (1 to 300).map(i => s"tok$i").mkString(" ")),
      (1L, (1 to 2000).map(i => s"w$i").mkString(" ")),
      (2L, "small doc few tokens")
    ).toDF("doc_id", "text")
    val swar = Dedup.simhash(big).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = Dedup.simhashViaExplode(big).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(swar == truth)
  }

  test("simhash auto-dispatch: >32767-distinct-token doc flows through, bits exact") {
    // past the 16-bit SWAR lane width the fold would corrupt silently;
    // simhash() must route such rows through the explode path with no
    // caller changes and no assert failure
    // 70k distinct tokens: average per-bit counters (~35k) exceed the
    // 16-bit lane range, so this doc would ANSI-overflow the fold if it
    // EXECUTED for wide rows (the guard must short-circuit the fold,
    // not just null its output)
    val wide = Seq(
      (0L, (1 to 70000).map(i => s"tok$i").mkString(" ")),
      (1L, "small doc few tokens")
    ).toDF("doc_id", "text")
    val got = Dedup.simhash(wide).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = Dedup.simhashViaExplode(wide).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(got == truth)
  }

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)), // closest to 0
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(0f, 0f, 1f, 0f)),
    (4L, Array(-1f, 0f, 0f, 0f))     // opposite of 0
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k: correct ranking, self excluded") {
    val r = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 3)
      .collect().map(x => (x.getLong(2), x.getDouble(3)))
    assert(r.head._1 == 1L && r.head._2 > 0.99)
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L)) // -1 vector ranked last, cut off
  }

  test("cosine near-dup brute: only the aligned pair crosses 0.9") {
    val r = Similarity.cosineNearDupBrute(vecs, 0.9).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((0L, 1L)))
  }

  test("IVF top-k: finds the known nearest on the tiny fixture") {
    val r = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), k = 2,
      nlist = 5, nprobe = 5, dim = 4) // probe everything => exact on this fixture
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.head == (1L, 1L)) // rank 1 is the aligned vector
  }

  test("LSH near-dup finds the aligned pair (dim=4 fixture)") {
    val r = Similarity.cosineNearDupLsh(vecs, 0.9, tables = 8, planes = 2, dim = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.contains((0L, 1L)))
  }

  test("recall gates: approximate ANN/near-dup paths vs brute ground truth") {
    // the approximate paths have no DuckDB oracle (engine-specific
    // hashes), so recall vs the exact dumps is the regression gate —
    // an LSH/IVF degradation fails HERE instead of hiding as rows-only
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    val index = Similarity.buildLshIndex(emb)
    val lsh = pairs(Similarity.probeLshTopK(index, queries, k = 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5, nlist = 32,
      nprobe = 8, refineIters = 2)) // same operating point as x_ann_topk_ivf
    val lshRecall = lsh.intersect(brute).size.toDouble / brute.size
    val ivfRecall = ivf.intersect(brute).size.toDouble / brute.size
    // deterministic pipelines: measured lsh=0.740, ivf=0.640 — the
    // gates sit just below so a real regression fails, not noise
    info(f"ann top-5 recall: lsh=$lshRecall%.3f ivf=$ivfRecall%.3f (n=${brute.size})")
    assert(lshRecall >= 0.70, f"LSH ANN recall regressed: $lshRecall%.3f")
    assert(ivfRecall >= 0.60, f"IVF ANN recall regressed: $ivfRecall%.3f")

    // int8 quantization: near-lossless for ranking — the gate is far
    // above the hash-bucketed paths'
    val int8 = pairs(Similarity.bruteForceTopKInt8(emb, queries, k = 5))
    val int8Recall = int8.intersect(brute).size.toDouble / brute.size
    info(f"ann top-5 recall: int8=$int8Recall%.3f (n=${brute.size})")
    assert(int8Recall >= 0.90, f"int8 ANN recall regressed: $int8Recall%.3f")

    val sub = emb.filter($"vec_id" < 200)
    def dupPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteDup = dupPairs(Similarity.cosineNearDupBrute(sub, minCosine = 0.35))
    val lshDup = dupPairs(Similarity.cosineNearDupLsh(sub, minCosine = 0.35))
    assert(lshDup.subsetOf(bruteDup)) // exact verify => no false positives
    val dupRecall = lshDup.intersect(bruteDup).size.toDouble / bruteDup.size
    info(f"near-dup recall: lsh=$dupRecall%.3f (n=${bruteDup.size})")
    assert(dupRecall >= 0.60, f"LSH near-dup recall regressed: $dupRecall%.3f")
  }

  test("semantic dedup (SemDeDup): subset-exact, twins co-cluster, skew guard bounded") {
    // within-cluster pairs are EXACTLY verified, so on any corpus the
    // output is a strict subset of brute's pairs — precision 1 by
    // construction; the fixture's weak pairs (no cosine >= 0.5 exists
    // in it) also document the method's recall trade at low thresholds
    val sub = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 200)
    def dupPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = dupPairs(Similarity.cosineNearDupBrute(sub, minCosine = 0.35))
    val sem = dupPairs(Similarity.cosineNearDupSemantic(sub, minCosine = 0.35, k = 8))
    assert(sem.subsetOf(brute), "a semantic pair not confirmed by brute — exact verify broken")
    info(f"semantic near-dup fixture recall at t=0.35: ${sem.size.toDouble / brute.size}%.3f (n=${brute.size})")

    // the method's OPERATING point — strong duplicates (SemDeDup runs
    // at cosine ~0.95+): twin vectors sit ~0 apart, so cosine k-means
    // cannot split them and recall must be ~1. 60 near-orthogonal
    // Gaussian bases (deterministic per-id seed) + one perturbed twin
    // each.
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    val bases = (0 until 60).map(i => (i.toLong, vec(i)))
    val twins = bases.map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, d) => if (d == 0) x + 0.01f else x }) }
    val corpus = (bases ++ twins).toDF("vec_id", "embedding")
    val bruteT = dupPairs(Similarity.cosineNearDupBrute(corpus, minCosine = 0.99))
    assert(bruteT.size == 60, s"twin corpus ground truth off: ${bruteT.size}")
    val semT = dupPairs(Similarity.cosineNearDupSemantic(corpus, minCosine = 0.99, k = 4))
    assert(semT.subsetOf(bruteT))
    val recallT = semT.intersect(bruteT).size.toDouble / bruteT.size
    info(f"semantic near-dup twin recall at t=0.99: $recallT%.3f")
    assert(recallT >= 0.9, f"SemDeDup twin recall regressed: $recallT%.3f")

    // skew guard: a sub-split small enough to shear clusters must stay
    // subset-exact and keep finding the twins that land together
    val capped = dupPairs(Similarity.cosineNearDupSemantic(
      corpus, minCosine = 0.99, k = 4, maxClusterSize = 8))
    assert(capped.subsetOf(bruteT))

    // survivors: one keeper per twin family, keeper is the min id
    val surv = graft.operators.Dedup.clusterSurvivors(
      Similarity.cosineNearDupSemantic(corpus, minCosine = 0.99, k = 4))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(surv.forall { case (keep, size) => keep < 1000L && size == 2.0 })
  }

  test("decontamination: overlap flagged and scrubbed; clean docs pass") {
    import graft.operators.Contamination
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),  // verbatim eval copy
      (1L, "intro words alpha beta gamma closing"), // partial overlap
      (2L, "totally unrelated content sits here")   // clean
    ).toDF("doc_id", "text")
    val flagged = Contamination.flag(corpus, eval, n = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(flagged(0L) == 1.0)                  // full containment
    assert(flagged(1L) > 0.0 && flagged(1L) < 1.0)
    assert(!flagged.contains(2L))               // clean => absent
    val kept = Contamination.scrub(corpus, eval, n = 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    // scrub with a tolerance keeps the partial-overlap doc
    val tolerant = Contamination.scrub(corpus, eval, n = 3, maxOverlap = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tolerant == Set(1L, 2L))

    // the hash-shingle scale variant produces the same flags as the
    // string formulation (here and on real fixture data)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    assert(rows(Contamination.flagHashed(corpus, eval, n = 3)) ==
      rows(Contamination.flag(corpus, eval, n = 3)))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(rows(Contamination.flagHashed(docs.filter($"doc_id" >= 20),
        docs.filter($"doc_id" < 20), n = 3)) ==
      rows(Contamination.flag(docs.filter($"doc_id" >= 20),
        docs.filter($"doc_id" < 20), n = 3)))
  }

  test("PII: detection counts, redaction placeholders, scrub keeps only clean docs") {
    import graft.operators.Pii
    val docs = Seq(
      (0L, "reach me at bob.smith+x@corp.example.org thanks"),
      (1L, "call 555-123-4567 or 555-999-0000 now"),
      (2L, "server at 10.0.0.1 responded fine"),
      (3L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val d = Pii.detect(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5)))).toMap
    assert(d(0L) == ((1, 0, 0, true)))
    assert(d(1L) == ((0, 2, 0, true)))
    assert(d(2L) == ((0, 0, 1, true)))
    assert(d(3L) == ((0, 0, 0, false)))
    val red = Pii.redact(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(0L) == "reach me at <EMAIL> thanks")
    assert(red(1L) == "call <PHONE> or <PHONE> now")
    assert(red(2L) == "server at <IP> responded fine")
    assert(red(3L) == docs.filter($"doc_id" === 3L).head().getString(1))
    assert(Pii.scrub(docs).select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("hash split: deterministic per-id assignment, sane cut fractions") {
    import graft.operators.Sampling
    val df = (0L until 1000L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val assigned = Sampling.hashSplit(df, "doc_id")
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000)
    assert(counts("train") > 700 && counts("train") < 900) // hash-mod ~80%
    assert(counts.keySet == Set("train", "val", "test"))
    // per-id stability: filtering the input never reassigns a surviving id
    val full = assigned.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val subset = Sampling.hashSplit(df.filter($"doc_id" % 2 === 0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
    // bad cuts fail loudly
    intercept[IllegalArgumentException](
      Sampling.hashSplit(df, "doc_id", Seq(("a", 50))))
  }

  test("stratified split: EXACT per-stratum proportions, small strata included") {
    import graft.operators.Sampling
    // a 1000-row majority stratum and a 10-row minority one: the
    // rank-percentile cut must land both within one row of 80/10/10 —
    // the guarantee the hash split can't give a small group
    val df = ((0L until 1000L).map(i => (i, "big")) ++
      (2000L until 2010L).map(i => (i, "tiny"))).toDF("doc_id", "lang")
    val got = Sampling.stratifiedSplit(df, "lang", "doc_id")
      .groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("big", "train")) == 800 && got(("big", "val")) == 100 &&
      got(("big", "test")) == 100)
    assert(got(("tiny", "train")) == 8 && got(("tiny", "val")) == 1 &&
      got(("tiny", "test")) == 1)
    // deterministic across reruns and repartitionings
    val again = Sampling.stratifiedSplit(df.repartition(7), "lang", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val first = Sampling.stratifiedSplit(df, "lang", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == first)
  }

  test("text normalization: case/punct/spacing-insensitive canonical form") {
    val r = Seq((0L, "  Hello,  WORLD!  How are; you:  "),
      (1L, "hello world how are you")).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.normalize($"text").as("n"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L) == "hello world how are you")
    assert(r(0L) == r(1L)) // normalization-equal => dedup-key-equal
  }

  test("LM scoring: gibberish scores worst; percentile cut drops exactly it") {
    import graft.operators.LangModel
    val docs = ((0L until 20L).map(i => (i, s"the cat sat on the mat ${i % 3}")) :+
      (99L, "zxq qwv jjk plm vbn wrt")).toDF("doc_id", "text")
    val scored = LangModel.unigramNll(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scored.length == 21)
    assert(scored.maxBy(_._3)._1 == 99L) // all-rare-token doc is least probable
    val kept = LangModel.filterByNll(docs, pct = 95.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(99L) && kept.size == 20)
  }

  test("tf-idf: group-exclusive terms outrank shared ones; ranking deterministic") {
    import graft.operators.LangModel
    val docs = Seq(
      (0L, "en", "shared shared shared apple apple banana"),
      (1L, "en", "shared apple"),
      (2L, "fr", "shared shared pomme pomme pomme"),
      (3L, "fr", "shared baguette")).toDF("doc_id", "lang", "text")
    val top = LangModel.tfIdfTopTerms(docs, "lang", k = 2, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // 'shared' is in both groups => idf 0; exclusive terms win by tf
    assert(top.toSeq == Seq(
      ("en", 1L, "apple"), ("en", 2L, "banana"),
      ("fr", 1L, "pomme"), ("fr", 2L, "baguette")))
  }

  test("quota sampling: per-group caps, determinism, subset of input") {
    import graft.operators.Sampling
    val df = (0L until 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val s1 = Sampling.quotaPerGroup(df, "lang", "doc_id", quota = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val s2 = Sampling.quotaPerGroup(df, "lang", "doc_id", quota = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sorted.toSeq == s2.sorted.toSeq) // deterministic
    assert(s1.count(_._2 == "a") == 10 && s1.count(_._2 == "b") == 10)
    // small groups pass through whole
    val tiny = Sampling.quotaPerGroup(df.filter($"doc_id" < 5), "lang", "doc_id", 10)
    assert(tiny.count() == 5)
    // fraction: deterministic, inside the scan stage (no shuffle)
    val f = Sampling.fraction(df, "doc_id", 20.0)
    assert(f.count() > 5 && f.count() < 40) // ~20 of 100, hash-spread
    assert(f.collect().map(_.getLong(0)).toSet.subsetOf((0L until 100L).toSet))
  }

  test("minhash bucketCap: degenerate bucket dropped LOUDLY, normal pairs kept") {
    // 300 identical docs overflow every band bucket (the skew
    // pathology); a small unrelated near-dup pair must still be found,
    // and the drop must be logged, not silent
    val skewText = "identical content repeated across the whole degenerate cluster " +
      "to overflow the lsh band buckets in one place"
    val docs = ((0 until 300).map(i => (i.toLong, skewText)) ++ Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1001L, "alpha beta gamma delta epsilon zeta eta iota"))).toDF("doc_id", "text")
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    val pairs = try {
      System.setErr(new java.io.PrintStream(errBuf, true))
      Dedup.minhashPairs(docs, bucketCap = 100, minEstJaccard = 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally System.setErr(prevErr)
    assert(pairs.contains((1000L, 1001L))) // normal near-dup found
    assert(!pairs.exists(p => p._1 < 300L && p._2 < 300L)) // capped bucket dropped
    val log = errBuf.toString
    assert(log.contains("bucketCap") && log.contains("dropping"),
      s"expected a counted drop log, got: $log")
  }

  test("partitioning invariance: dedup/sampling outputs identical after repartition") {
    // the determinism claims (SCALE.md) say results are stable across
    // partitionings — re-run key pipelines on a repartitioned input and
    // demand byte-equal results
    import graft.operators.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shuffled = docs.repartition(13)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(rows(Dedup.minhashPairs(docs, minEstJaccard = 0.5)) ==
      rows(Dedup.minhashPairs(shuffled, minEstJaccard = 0.5)))
    assert(rows(Dedup.simhashPairs(docs)) == rows(Dedup.simhashPairs(shuffled)))
    assert(rows(Sampling.quotaPerGroup(docs, "lang", "doc_id", 20)
        .select($"doc_id").orderBy($"doc_id")) ==
      rows(Sampling.quotaPerGroup(shuffled, "lang", "doc_id", 20)
        .select($"doc_id").orderBy($"doc_id")))
  }

  test("gap fill: every bucket inside global bounds present, zeros in gaps") {
    import graft.operators.GapFill
    val ts = Seq((0L, "a", 1.0), (60000L, "a", 1.0), (185000L, "a", 1.0),
      (125000L, "b", 1.0)).toDF("timestamp", "tag", "value")
    val r = GapFill.bucketCounts(ts, 60000L).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r.length == 8) // 2 tags x 4 buckets (global bounds 0..3)
    assert(r.filter(_._1 == "a").map(_._3).toSeq == Seq(1.0, 1.0, 0.0, 1.0))
    assert(r.filter(_._1 == "b").map(_._3).toSeq == Seq(0.0, 0.0, 1.0, 0.0))
    assert(r.map(_._2).distinct.sorted.toSeq == Seq(0L, 60000L, 120000L, 180000L))
  }

  test("anomaly z-score: spike flagged, flat series never flags") {
    import graft.operators.GapFill
    // tag a: 9 calm buckets then a spike; tag b: perfectly flat
    val rows = ((0 until 9).map(i => (i * 60000L, "a", 1.0)) :+ (9 * 60000L, "a", 1.0)) ++
      (0 until 10).map(i => (i * 60000L, "b", 1.0))
    // counts per bucket: a gets 1 except bucket 9 where we add 30 extras
    val spiked = rows ++ (0 until 30).map(j => (9 * 60000L + j, "a", 1.0))
    val dense = GapFill.bucketCounts(spiked.toDF("timestamp", "tag", "value"), 60000L)
    val flagged = GapFill.anomalies(dense, window = 10, threshold = 2.0).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(flagged.contains(("a", 9 * 60000L))) // the spike
    assert(!flagged.exists(_._1 == "b")) // zero spread => never flags
    assert(flagged.length == 1)
  }

  test("text functions: counts, quality bounds, langid, fingerprint") {
    val r = docs.select(col("doc_id"),
      TextFunctions.wsTokenCount(col("text")).as("ws"),
      TextFunctions.bpeTokenCount(col("text")).as("bpe"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("lang")).collect()
    val row0 = r.find(_.getLong(0) == 0L).get
    assert(row0.getLong(1) == 9) // nine whitespace tokens
    assert(row0.getLong(2) == 9) // same for pure lowercase words
    assert(row0.getDouble(3) > 0.0 && row0.getDouble(3) <= 1.0)
    assert(row0.getString(4) == "en")
    TextFunctions.register(spark)
    val fp = docs.select(TextFunctions.rollingHash(col("text"))).collect()
    // matches the definition: h = (h*31 + byte) mod 1e9+7
    val expect = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(fp.head.getLong(0) == expect)
  }

  test("multimodal: stubbed decode keeps schema/batching real + deterministic") {
    val media = Multimodal.syntheticMedia(
      docs.withColumn("source", lit("src")).withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text"))))
    val feats = Multimodal.decodeImages(media, batchSize = 2).collect().sortBy(_.media_id)
    assert(feats.length == 5)
    assert(feats.forall(f => f.embedding.length == 16 && f.channels == 3))
    assert(feats(0).brightness == feats(1).brightness) // identical payloads
    val again = Multimodal.decodeImages(media, batchSize = 3).collect().sortBy(_.media_id)
    assert(feats.map(_.brightness).toSeq == again.map(_.brightness).toSeq) // batch-size invariant
  }

  test("as-of join: latest prior match per key, <= ties, tolerance, null on no-match") {
    val quotes = Seq( // (key, time, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0), ("B", 25L, 9.0)
    ).toDF("sym", "t", "px")
    val trades = Seq(("A", 5L), ("A", 20L), ("A", 29L), ("B", 24L), ("B", 100L))
      .toDF("sym", "t")
    val j = AsOfJoin.asOf(trades, quotes, "t", "t", Seq("sym"), Seq("px"))
      .orderBy(col("sym"), col("t")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(j.toSeq == Seq(
      ("A", 5L, None, None),              // before any quote
      ("A", 20L, Some(20L), Some(2.0)),   // equal time matches (<=)
      ("A", 29L, Some(20L), Some(2.0)),   // latest prior, not next
      ("B", 24L, None, None),             // other key's quotes invisible
      ("B", 100L, Some(25L), Some(9.0))))
    val tol = AsOfJoin.asOf(trades, quotes, "t", "t", Seq("sym"), Seq("px"),
      tolerance = Some(10L)).orderBy(col("sym"), col("t")).collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(tol.toSeq == Seq(None, Some(2.0), Some(2.0), None, None)) // B@100 > 25+10
  }

  test("range join: chunk-bucketed point-in-interval equals the plain theta join") {
    import graft.operators.RangeJoin
    // intervals spanning 1, 2 and 4 chunks (bucketMs = 100); boundary
    // points: start inclusive, end exclusive; key mismatches excluded
    val points = Seq(
      (1L, "u1", 100L), (2L, "u1", 199L), (3L, "u1", 200L), // iv [100,200)
      (4L, "u2", 150L), (5L, "u2", 420L),                   // iv [90,430)
      (6L, "u3", 150L)                                      // u3 has no interval
    ).toDF("point_id", "k", "t")
    val intervals = Seq(("u1", 100L, 200L), ("u2", 90L, 430L))
      .toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
        Seq("k"), bucketMs = 100L)
      .select("point_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 4L, 5L)) // 3 excluded (t == end), 6 unmatched
    val plain = points.join(intervals, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("point_id").as[Long].collect().sorted.toSeq
    assert(got == plain)
    // no duplicate rows from multi-chunk intervals
    assert(RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
      Seq("k"), bucketMs = 10L).count() == 4)
  }

  test("dup-ngram stats: repeated phrases push dup_ratio toward 1, unique text to 0") {
    import graft.operators.Quality
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight completely different words appear exactly once here"),
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val m = Quality.dupNgramStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: 6 trigrams, all "spam spam spam" => 1 distinct
    assert(m(1L) == ((6L, 1L, 0.8333)))
    // doc 2: 6 trigrams, all distinct => ratio 0
    assert(m(2L) == ((6L, 6L, 0.0)))
    // doc 3: shorter than n => the single (short) window, ratio 0
    assert(m(3L) == ((1L, 1L, 0.0)))
  }

  test("salted join equals plain join on skewed data") {
    import graft.operators.SkewJoin
    val facts = (1 to 500).map(i => (i.toLong, if (i % 10 == 0) "rare" else "hot"))
      .toDF("row_id", "k") // 90% of rows share one key
    val dim = Seq(("hot", 1.0), ("rare", 2.0)).toDF("k", "w")
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), "row_id", salts = 8)
      .orderBy(col("row_id")).collect().map(r => (r.getLong(1), r.getDouble(2)))
    val plain = facts.join(dim, "k")
      .orderBy(col("row_id")).collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(salted.length == 500 && salted.toSeq == plain.toSeq)
  }

  test("multimodal: real PNG payloads decode via ImageIO; non-images fall back to stub") {
    // JDK-shipped codec, no external dependency: a generated 8x4 PNG
    // (left half black, right half white) must come back with TRUE
    // dimensions, mean luminance 127.5, and a half/half histogram
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val textPayload = "not an image at all".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaFile(1L, "image", bos.toByteArray, "gen"),
      Multimodal.MediaFile(2L, "image", textPayload, "gen")).toDS()
    val feats = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val real = feats(0)
    assert(real.width == 8 && real.height == 4 && real.channels == 3)
    assert(math.abs(real.brightness - 127.5) < 1e-9) // (0 + 255)/2 exact
    assert(math.abs(real.embedding(0) - 0.5f) < 1e-6)  // black bin
    assert(math.abs(real.embedding(15) - 0.5f) < 1e-6) // white bin
    assert(real.embedding.sum > 0.999f && real.embedding.sum < 1.001f)
    // deterministic across runs (the x_multimodal_decode guarantee)
    val again = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(again(0).brightness == real.brightness)
    // a non-image payload takes the stub path, bit-for-bit
    val stub = Multimodal.decodeOneStub(Multimodal.MediaFile(2L, "image", textPayload, "gen"))
    assert(feats(1).width == stub.width && feats(1).height == stub.height &&
      feats(1).brightness == stub.brightness &&
      feats(1).embedding.toSeq == stub.embedding.toSeq)
  }

  test("multimodal: real WAV payloads decode via javax.sound; others fall back to stub") {
    // JDK-shipped codec, no external dependency: a generated 8000 Hz
    // mono 16-bit PCM square wave at half amplitude must come back with
    // the TRUE sample rate, frame count, duration and RMS (|x| = 0.5
    // everywhere => RMS 0.5 exactly, up to 16-bit quantization)
    val rate = 8000
    val frames = 4000 // 0.5 s
    val amp = 16384   // 0.5 in 16-bit full scale
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val v = if ((i / 8) % 2 == 0) amp else -amp // 500 Hz square wave
      pcm(2 * i) = (v & 0xff).toByte              // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(
      Multimodal.MediaFile(1L, "audio", bos.toByteArray, "gen"),
      Multimodal.MediaFile(2L, "audio", "not audio at all".getBytes("UTF-8"), "gen")).toDS()
    val feats = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    val wav = feats(0)
    assert(wav.sample_rate == rate)
    assert(wav.n_samples == frames)
    assert(math.abs(wav.duration_s - 0.5) < 1e-9)
    assert(math.abs(wav.rms - 0.5) < 1e-4) // 16-bit quantization slack
    // the text payload takes the deterministic stub path
    val stub = feats(1)
    assert(stub == Multimodal.decodeAudioStub(
      Multimodal.MediaFile(2L, "audio", "not audio at all".getBytes("UTF-8"), "gen")))
  }

  test("multimodal: audio decode + chunk plan (stubbed codec, real plumbing)") {
    val media = Multimodal.syntheticMedia(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20))
    val feats = Multimodal.decodeAudio(media)
    val rows = feats.collect()
    assert(rows.length == 20)
    assert(rows.forall(f => f.duration_s > 0 && f.rms >= 0 &&
      (f.sample_rate == 44100 || f.sample_rate == 16000)))
    // deterministic: same payload => same features
    assert(Multimodal.decodeAudio(media).collect().sortBy(_.media_id).toSeq ==
      rows.sortBy(_.media_id).toSeq)
    // chunk plan covers [0, duration] with the configured stride/overlap
    val chunks = Multimodal.audioChunkPlan(feats, windowS = 0.002, overlapS = 0.0005)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val byMedia = chunks.groupBy(_._1)
    val durations = rows.map(f => f.media_id -> f.duration_s).toMap
    byMedia.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0.0)                        // starts at 0
      assert(sorted.last._4 >= durations(id) - 1e-5)       // reaches the end (6-dp rounding)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 < a._4)            // overlap holds
        case _ => ()
      }
    }
  }

  test("multimodal: frame sampling plan") {
    val media = Seq((1L, "video")).toDF("media_id", "modality")
    val frames = Multimodal.frameSamplePlan(media, frameCount = 10, everyNth = 3)
      .collect().map(_.getInt(1))
    assert(frames.toSeq == Seq(0, 3, 6, 9))
  }

  test("scaled-sum decimal accumulator: no overflow where a long sum would throw") {
    // two values whose scaled (×100) longs are each ~9.0e18: a LongType
    // accumulator overflows (ANSI ARITHMETIC_OVERFLOW) at the second
    // row; the decimal(38,0) accumulator must stay exact and finite —
    // this is the 100 TB single-group headroom VERDICT r2 flagged
    val big = Seq(9.0e16, 9.0e16).toDF("v")
    val err = intercept[Exception] {
      big.agg(sum(round(col("v") * 100).cast("long")).as("s")).collect()
    }
    assert(err.getMessage.contains("ARITHMETIC_OVERFLOW")
      || Option(err.getCause).exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")),
      s"expected the long accumulator to overflow loudly, got: ${err.getMessage}")
    graft.functions.NumericFunctions.register(spark)
    val r = big.agg(SparkEntry.scaledSum(col("v"), 100).as("s")).head().getDouble(0)
    assert(math.abs(r - 1.8e17) < 1e3, s"int128 accumulator wrong: $r")
    // the raw aggregate agrees with a decimal(38,0) accumulation on
    // values of both signs (carry/sign-extension paths), incl. repartition
    val mixed = Seq(9.0e16, -4.5e16, 9.0e16, -1.0, 0.5).toDF("v").repartition(3)
    val viaInt128 = mixed.agg(graft.functions.NumericFunctions
      .sum128(round(col("v") * 100).cast("long"))).head().getDecimal(0)
    val viaDecimal = mixed.agg(sum(round(col("v") * 100).cast("long")
      .cast("decimal(38,0)"))).head().getDecimal(0)
    assert(viaInt128.compareTo(viaDecimal) == 0, s"$viaInt128 != $viaDecimal")
    // empty input => null, like sum
    assert(big.filter(col("v") < 0)
      .agg(graft.functions.NumericFunctions.sum128(col("v").cast("long")))
      .head().isNullAt(0))
  }

  test("multimodal: resize plan preserves aspect ratio, small images untouched") {
    val feats = Seq(
      Multimodal.ImageFeatures(1L, 200, 100, 3, 0.0, Array.empty),
      Multimodal.ImageFeatures(2L, 50, 60, 3, 0.0, Array.empty)
    ).toDS()
    val r = Multimodal.resizePlan(feats, maxSide = 100).collect()
      .map(x => x.getLong(0) -> (x.getInt(3), x.getInt(4))).toMap
    assert(r(1L) == (100, 50)) // halved, aspect kept
    assert(r(2L) == (50, 60))  // under the box: untouched
  }
}

package graft.tools

import graft.Materialize.MaterializeOps
import graft.operators.{AnnIndexStore, ClusterIndex, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured soak for the round-6 stores (SCALE.md's "asserted, then
  * measured" rule — the 10× fixture soak covers the query surface;
  * this covers the incremental-store cost model):
  *
  *  1. ClusterIndex APPEND-COST FLATNESS: a chain of B appends, each a
  *     constant-size edge batch, against a history that grows B×. The
  *     design claim is per-append cost = CC over the BATCH plus one
  *     streaming scan of the assignment chain — so append time must
  *     grow far slower than history (and the whole chain must land in
  *     the same order of magnitude as ONE one-shot build over the
  *     union, which is what a naive daily re-cluster would pay
  *     PER DAY).
  *
  *  2. IVF-PQ CANDIDATE I/O: on-disk bytes of the version's candidate
  *     tables — pq codes vs int8-quantized vs full-vector inverted
  *     lists — plus median probe latencies. The design claim is the
  *     candidate scan ships m one-byte codes instead of d floats.
  *
  * Prints one human-readable block; numbers are pasted into SCALE.md.
  */
object StoreSoak {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def dirBytes(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) return 0L
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // dev aid: SPARK_GRAFT_SOAK_ONLY=9,10 runs a subset of the
    // numbered sections (unset = all; the per-round evidence runs all)
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def sec(n: Int): Boolean = only.forall(_.contains(n.toString))
    def median3(f: => Unit): Double = {
      f // warm
      (0 until 3).map { _ => val (_, t) = timed(f); t }.sorted.apply(1)
    }

    // ---- 1. ClusterIndex append-cost flatness --------------------
    // B constant-size batches: each links its own id block in chains
    // of ~4 (7919 is coprime to the block) and back-links 10% of ids
    // to the PREVIOUS batch — so appends keep merging into history's
    // clusters (the expensive path: remaps, not just fresh labels).
    if (sec(1)) {
    val B = 10
    val E = 2000
    def batchEdges(b: Int): DataFrame = {
      val base = b.toLong * E
      val own = (0 until E).map(i =>
        (base + i, base + (i * 7919) % E))
      val back = if (b == 0) Seq.empty
        else (0 until E / 10).map(i => (base + i, base - E + i))
      (own ++ back).toDF("id_a", "id_b")
    }
    val ciDir = java.nio.file.Files.createTempDirectory("soak-ci").toString
    val ci = new ClusterIndex(spark, ciDir)
    val (_, tWrite0) = timed(ci.write(batchEdges(0)))
    val appendTimes = (1 until B).map { b =>
      val (_, t) = timed(ci.append(batchEdges(b)))
      t
    }
    val union = (0 until B).map(batchEdges).reduce(_ unionByName _)
    val ciOne = new ClusterIndex(spark,
      java.nio.file.Files.createTempDirectory("soak-ci-one").toString)
    val (_, tOneShot) = timed(ciOne.write(union))
    // sanity: incremental == one-shot (the ClusterIndexSpec law, here
    // just row-count checked to keep the soak fast)
    val nInc = ci.assignment().count()
    val nOne = ciOne.assignment().count()
    println(f"[soak] cluster: write0=$tWrite0%.2fs appends(s)=${appendTimes.map(t => f"$t%.2f").mkString(",")}")
    println(f"[soak] cluster: first3=${appendTimes.take(3).sorted.apply(1)}%.2fs last3=${appendTimes.takeRight(3).sorted.apply(1)}%.2fs " +
      f"flatness=${appendTimes.takeRight(3).sorted.apply(1) / appendTimes.take(3).sorted.apply(1)}%.2fx " +
      f"oneShot=$tOneShot%.2fs chainTotal=${appendTimes.sum + tWrite0}%.2fs rowsInc=$nInc rowsOne=$nOne")
    }

    // ---- 2. IVF-PQ candidate I/O + probe latency -----------------
    if (sec(2)) {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val annDir = java.nio.file.Files.createTempDirectory("soak-ann")
    val store = new AnnIndexStore(spark, annDir.toString)
    store.write(emb)
    val v0 = annDir.resolve("v0")
    val bytesVectors = dirBytes(v0.resolve("vectors"))
    val bytesIvf = dirBytes(v0.resolve("ivf"))
    val bytesPq = dirBytes(v0.resolve("pq"))
    // int8 comparison point: the same corpus quantized and written the
    // same way (snappy parquet)
    val int8Dir = java.nio.file.Files.createTempDirectory("soak-int8")
    Similarity.quantizeInt8(emb).write.mode("overwrite")
      .parquet(int8Dir.resolve("int8").toString)
    val bytesInt8 = dirBytes(int8Dir.resolve("int8"))
    val queries = emb.filter(col("vec_id") < 10)
    val tIvf = median3(store.probeIvf(queries, k = 5, nprobe = 8)
      .write.mode("overwrite").format("noop").save())
    val tPq = median3(store.probePq(queries, k = 5, nprobe = 8)
      .write.mode("overwrite").format("noop").save())
    val tPqRaw = median3(store.probePq(queries, k = 5, nprobe = 8, refine = 0)
      .write.mode("overwrite").format("noop").save())
    println(f"[soak] ann bytes: vectors=$bytesVectors ivf=$bytesIvf int8=$bytesInt8 pq=$bytesPq " +
      f"ivf/pq=${bytesIvf.toDouble / bytesPq}%.1fx int8/pq=${bytesInt8.toDouble / bytesPq}%.1fx")
    println(f"[soak] ann probe medians: ivf=$tIvf%.2fs pq(refine)=$tPq%.2fs pq(raw)=$tPqRaw%.2fs")
    }

    // ---- 3. Classifier training cost: full-batch vs mini-batch ----
    // Same iteration budget; the design claim is per-iteration cost
    // drops ~k× under batches=k (each pass scans 1/k of the corpus)
    // while the scoring scan stays O(corpus) regardless of training
    // mode. Labels are the heuristic cut the production query uses.
    if (sec(3)) {
    import graft.operators.QualityModel
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").withColumn("label",
      (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.4).cast("int"))
    val iters = 12
    val (mFull, tFull) = timed(QualityModel.train(docs, "label", iters = iters))
    val (_, tMini) = timed(QualityModel.train(docs, "label", iters = iters, batches = 4))
    val tScore = median3(docs.select(QualityModel.score(col("text"), mFull).as("p"))
      .write.mode("overwrite").format("noop").save())
    println(f"[soak] classifier: iters=$iters full=$tFull%.2fs mini(b=4)=$tMini%.2fs " +
      f"full/mini=${tFull / tMini}%.2fx scoreScan=$tScore%.2fs")
    }

    // ---- 4. Continuous-aggregate refresh-cost flatness ------------
    // N daily ingests of constant size into a store whose history
    // grows N×; after each, ONE rollup refresh. The design claim is
    // refresh cost = O(changed days) — the manifest diff isolates the
    // ingested day, so per-refresh time stays flat while a full
    // recompute (what a view without incremental maintenance pays)
    // grows with history. Also measures the rewrite payoff: the same
    // group-by-tag aggregate answered from the rollup vs the raw store.
    if (sec(4)) {
    import graft.engine.{ContinuousAggregate, TimeSeriesStore}
    import graft.model.{Agg, GroupBy, QueryModel, TS}
    val DAYMS = 86400000L
    val rowsPerDay = 50000
    // unique (timestamp, tag) by construction: timestamp = day + id
    def dayBatch(d: Int) = spark.range(rowsPerDay).select(
      (lit(d * DAYMS) + col("id")).as("timestamp"),
      concat(lit("t"), (col("id") % 8).cast("string")).as("tag"),
      ((col("id") % 1000) / 10.0).as("value")).as[TS]
    val stDir = java.nio.file.Files.createTempDirectory("soak-cagg-store").toString
    val st = new TimeSeriesStore(spark, stDir)
    val cagg = new ContinuousAggregate(spark, st,
      java.nio.file.Files.createTempDirectory("soak-cagg").toString)
    val D = 10
    val refreshTimes = (0 until D).map { d =>
      st.insert(dayBatch(d)).left.foreach(e => sys.error(e.messages.mkString(";")))
      val (stats, t) = timed(cagg.refresh())
      assert(stats.recomputedDays == 1 && stats.carriedDays == d,
        s"manifest diff missed: $stats")
      t
    }
    // what a non-incremental view pays on the FINAL history, per refresh
    val fresh = new ContinuousAggregate(spark, st,
      java.nio.file.Files.createTempDirectory("soak-cagg-full").toString)
    val (fullStats, tFullRecompute) = timed(fresh.refresh())
    assert(fullStats.full && cagg.read().count() == fresh.read().count())
    // rewrite payoff: same aggregate from the rollup vs the raw store
    val qm = QueryModel(aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag))
    val tRollup = median3(cagg.answer(qm).get
      .write.mode("overwrite").format("noop").save())
    val tRaw = median3(graft.engine.QueryEngine.compile(
        st.current().select(col("timestamp"), col("tag"), col("value")), qm)
      .write.mode("overwrite").format("noop").save())
    println(f"[soak] cagg: refreshes(s)=${refreshTimes.map(t => f"$t%.2f").mkString(",")}")
    println(f"[soak] cagg: first3=${refreshTimes.take(3).sorted.apply(1)}%.2fs last3=${refreshTimes.takeRight(3).sorted.apply(1)}%.2fs " +
      f"flatness=${refreshTimes.takeRight(3).sorted.apply(1) / refreshTimes.take(3).sorted.apply(1)}%.2fx " +
      f"fullRecompute=$tFullRecompute%.2fs (history=${D}d x $rowsPerDay rows)")
    println(f"[soak] cagg rewrite: rollupAnswer=$tRollup%.2fs rawAnswer=$tRaw%.2fs speedup=${tRaw / tRollup}%.1fx")

    // ---- 5. Real-time hybrid read cost vs staleness ---------------
    // grow the store's hot tail WITHOUT refreshing the rollup; the
    // design claim is hybrid answer cost = fresh-rollup cost + the
    // TAIL days' raw aggregation — a function of staleness, never of
    // history — while staying exact (checked vs the raw compile).
    def hybridMedian() = median3(cagg.answer(qm).get
      .write.mode("overwrite").format("noop").save())
    st.insert(dayBatch(D)).left.foreach(e => sys.error(e.messages.mkString(";")))
    val tHybrid1 = hybridMedian()
    (1 to 2).foreach(i => st.insert(dayBatch(D + i)).left.foreach(e =>
      sys.error(e.messages.mkString(";"))))
    val tHybrid3 = hybridMedian()
    // answer()'s documented float caveat applies: Sum refolds per-day
    // partial sums, so low bits may differ from the raw fold's
    // association order — compare groups exactly, sums to 1e-9 relative
    val hybridRows = cagg.answer(qm).get.collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val rawRows = graft.engine.QueryEngine.compile(
      st.current().select(col("timestamp"), col("tag"), col("value")), qm)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(hybridRows.map(_._1) == rawRows.map(_._1) &&
      hybridRows.zip(rawRows).forall { case ((_, h), (_, r)) =>
        math.abs(h - r) <= 1e-9 * math.max(math.abs(h), math.abs(r)) },
      s"hybrid diverged from raw over the grown store:\n$hybridRows\n$rawRows")
    val tRawGrown = median3(graft.engine.QueryEngine.compile(
        st.current().select(col("timestamp"), col("tag"), col("value")), qm)
      .write.mode("overwrite").format("noop").save())
    println(f"[soak] cagg realtime: fresh=$tRollup%.2fs hybrid(1d tail)=$tHybrid1%.2fs " +
      f"hybrid(3d tail)=$tHybrid3%.2fs rawGrown=$tRawGrown%.2fs " +
      f"(history=${D + 3}d; hybrid cost tracks the TAIL, exactness asserted)")

    // ---- 6. Frozen-history retention: refresh cost ignores history --
    // freeze the first D days, DROP their raw events, keep ingesting.
    // Design claims: (a) answers still cover the dropped history
    // exactly; (b) per-refresh cost stays flat — frozen units are not
    // even DIFFED, so retained history is free at refresh time.
    val frz = new ContinuousAggregate(spark, st,
      java.nio.file.Files.createTempDirectory("soak-cagg-frz").toString,
      freezeBeforeDay = Some(D.toLong))
    val (_, tFrzFull) = timed(frz.refresh()) // first refresh: full
    val cq = QueryModel(aggFunc = Some(Agg.Count))
    val preDropTotal = frz.answer(cq).get.head().getDouble(0)
    val dropped = st.dropDaysBefore(D.toLong * DAYMS)
    val (fsDrop, tFrzDrop) = timed(frz.refresh())
    assert(dropped == D && fsDrop.recomputedDays == 0 && !fsDrop.full,
      s"raw drop must be refresh-free under freeze: dropped=$dropped $fsDrop")
    val frzTimes = (0 until 3).map { i =>
      st.insert(dayBatch(D + 3 + i)).left.foreach(e =>
        sys.error(e.messages.mkString(";")))
      val (s, t) = timed(frz.refresh())
      assert(s.recomputedDays == 1, s"frozen refresh must diff ONLY the new day: $s")
      t
    }
    val postTotal = frz.answer(cq).get.head().getDouble(0)
    assert(postTotal == preDropTotal + 3.0 * rowsPerDay,
      s"frozen history lost: $preDropTotal -> $postTotal")
    println(f"[soak] cagg frozen: firstRefresh=$tFrzFull%.2fs dropRefresh=$tFrzDrop%.2fs " +
      f"appendRefreshes(s)=${frzTimes.map(t => f"$t%.2f").mkString(",")} " +
      f"(history=${D}d frozen+dropped, answers still cover it — asserted)")

    // ---- 7. Hierarchical refresh: O(child buckets) vs O(raw events) --
    // one touched day dirties one WEEK at the weekly grain; the
    // hierarchical parent refolds that week's ~7 × |tags| child bucket
    // rows, while a from-raw weekly rollup re-aggregates the week's
    // full event volume. Only the raw path's cost scales with rows/day.
    val hst = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("soak-hier-store").toString)
    (0 until 14).foreach(d => hst.insert(dayBatch(d)).left.foreach(e =>
      sys.error(e.messages.mkString(";"))))
    val hChild = new ContinuousAggregate(spark, hst,
      java.nio.file.Files.createTempDirectory("soak-hier-daily").toString)
    val hParent = new ContinuousAggregate(spark, hst,
      java.nio.file.Files.createTempDirectory("soak-hier-weekly").toString,
      bucketMs = 7 * DAYMS, source = Some(hChild))
    val hControl = new ContinuousAggregate(spark, hst,
      java.nio.file.Files.createTempDirectory("soak-hier-ctl").toString,
      bucketMs = 7 * DAYMS)
    hChild.refresh(); hParent.refresh(); hControl.refresh()
    assert(hst.update(Seq(TS(9 * DAYMS + 1, "t1", 4242.0)).toDS()).isRight)
    val (_, tHierChild) = timed(hChild.refresh()) // O(1 day)
    val (spFromChild, tFromChild) = timed(hParent.refresh())
    val (spFromRaw, tFromRaw) = timed(hControl.refresh())
    assert(spFromChild.fromChild && spFromChild.recomputedDays == 1,
      s"parent must refold the child: $spFromChild")
    assert(!spFromRaw.fromChild && spFromRaw.recomputedDays == 1,
      s"control must pay raw: $spFromRaw")
    // exact columns bit-equal; sum_val refolds child partials — the
    // documented reassociation (soak values are one-decimal doubles) —
    // so it compares within an ulp-scale tolerance
    locally {
      def rows(a: ContinuousAggregate) = a.read()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
      val (p, c) = (rows(hParent), rows(hControl))
      assert(p.keySet == c.keySet)
      p.foreach { case (k, pr) =>
        val cr = c(k)
        assert(Seq(2, 4, 5, 6, 7, 8, 9).forall(i => pr.get(i) == cr.get(i)),
          s"hier refold diverged at $k: $pr vs $cr")
        assert(math.abs(pr.getDouble(3) - cr.getDouble(3)) <=
          1e-9 * math.max(1.0, math.abs(cr.getDouble(3))),
          s"hier sum refold outside tolerance at $k")
      }
    }
    println(f"[soak] hier: childRefresh=$tHierChild%.2fs parentFromChild=$tFromChild%.2fs " +
      f"parentFromRaw=$tFromRaw%.2fs advantage=${tFromRaw / tFromChild}%.1fx " +
      f"(dirty week = 7d x $rowsPerDay raw rows vs 7 x 8 child rows; equality asserted)")
    }

    // ---- 8. partition sidecar indexes: tag pruning + metadata stats
    // A 120-day store where most tags are EPISODIC (each lives in its
    // own 3-day window — the deploy-marker / per-customer-metric shape)
    // plus a few dense tags, committed in 10 multi-segment batches.
    // Claims measured: (a) a tagEq query on an episodic tag opens only
    // its ~3 day partitions of 120+ (tag bloom sidecars), and the wall
    // clock follows the file count; (b) a day-aligned scalar aggregate
    // answers from .stats sidecars with ZERO scan, at manifest cost,
    // however many events the range covers. Exactness asserted inline.
    if (sec(8)) {
      import graft.engine.{MetaStats, QueryEngine, TimeSeriesStore}
      import graft.model.{Agg, QueryModel, TS}
      val DAYMS = 86400000L
      val days = 120
      val stDir = java.nio.file.Files.createTempDirectory("soak-sidecar").toString
      val st = new TimeSeriesStore(spark, stDir)
      val batches = 10
      val perBatch = days / batches
      (0 until batches).foreach { b =>
        val rows = for {
          d <- (b * perBatch) until ((b + 1) * perBatch)
          (t, r) <- (Seq("dense_a", "dense_b", "dense_c", "dense_d")
              .flatMap(t => (0 until 40).map(r => (t, r)))) ++
            // episodic: tag epi_<k> lives in days [3k, 3k+3)
            (if (d / 3 < 40) (0 until 40).map(r => (s"epi_${d / 3}", r))
             else Seq.empty)
        } yield TS(d * DAYMS + (t.hashCode & 0x7fff) * 1000L + r, t, (d + r).toDouble)
        val r = st.insert(rows.toDS())
        require(r.isRight, s"soak sidecar batch $b insert failed: $r")
      }
      val (hit, total) = st.partitionCountForTag("epi_20")
      val qmTag = QueryModel(tagEq = Some("epi_20"))
      val (prunedRows, tPruned) = timed(
        st.currentForTag("epi_20").filter(col("tag") === "epi_20").count())
      val (fullRows, tFull) = timed(
        st.current().filter(col("tag") === "epi_20").count())
      require(prunedRows == fullRows, s"tag-pruned read diverged: $prunedRows vs $fullRows")
      println(f"[soak] tagIndex: partitions=$hit/$total pruned=$tPruned%.2fs " +
        f"full=$tFull%.2fs speedup=${tFull / tPruned}%.1fx (rows match)")
      val qmCount = QueryModel(aggFunc = Some(Agg.Count))
      val qmSum = QueryModel(ge = Some(10 * DAYMS), lt = Some(110 * DAYMS),
        aggFunc = Some(Agg.Sum))
      require(MetaStats.coverage(st, qmSum).exists(_._2.isEmpty),
        "aligned 100-day window must be fully sidecar-covered")
      val (metaCount, tMetaCount) = timed(QueryEngine.execute(st, qmCount, Seq.empty)
        .fold(e => throw new IllegalStateException(e.message), _.head().getDouble(0)))
      val (rawCount, tRawCount) = timed(QueryEngine.execute(st.current(), qmCount)
        .fold(e => throw new IllegalStateException(e.message), _.head().getDouble(0)))
      val (metaSum, tMetaSum) = timed(QueryEngine.execute(st, qmSum, Seq.empty)
        .fold(e => throw new IllegalStateException(e.message), _.head().getDouble(0)))
      val (rawSum, tRawSum) = timed(QueryEngine.execute(st.current(), qmSum)
        .fold(e => throw new IllegalStateException(e.message), _.head().getDouble(0)))
      require(metaCount == rawCount, s"meta count diverged: $metaCount vs $rawCount")
      require(math.abs(metaSum - rawSum) <= 1e-9 * math.max(1.0, math.abs(rawSum)),
        s"meta sum outside tolerance: $metaSum vs $rawSum")
      println(f"[soak] metaStats: count meta=$tMetaCount%.3fs raw=$tRawCount%.3fs " +
        f"sum(100d) meta=$tMetaSum%.3fs raw=$tRawSum%.3fs " +
        f"speedups=${tRawCount / tMetaCount}%.1fx/${tRawSum / tMetaSum}%.1fx (values match)")
    }

    // ---- 9. READ latency vs history size ---------------------------
    // Refresh flatness (§4-§7) says maintenance ignores history; this
    // measures the QUERY side of the same claim. Two stores identical
    // except HISTORY LENGTH (days ×10, same rows/day), each with a
    // refreshed daily rollup. Claims:
    //  (a) an engine-ROUTED rollup-eligible query (group-by-tag count,
    //      unbounded) is flat in history — it reads O(days × tags)
    //      bucket rows, constant-dominated at this scale;
    //  (b) the SAME query raw-compiled grows ~linearly — it re-reads
    //      every event ever ingested;
    //  (c) a tagEq query on an EPISODIC tag opens a bounded partition
    //      count either way (tag blooms prune by content, not age), so
    //      its pruned latency is flat while the unpruned scan grows.
    // Relative assertions only (ambient load moves absolute numbers):
    // raw must degrade at least 2× more than routed across the 10×,
    // pruned partition counts must not grow, and every pair of answers
    // must match.
    // CALIBRATION: run this section at SPARK_GRAFT_CPUS=16 — the
    // recorded SCALE.md harness. The ratio margins are parallelism-
    // sensitive: at local[32] the 200d raw scan parallelizes further
    // (raw growth 3.8× → ~3.0×) while the routed shapes pay more
    // per-task scheduling (sqlBucket 1.7× → ~2.1×), and the §9b
    // raw ≥ 2× routed margin was measured FAILING twice at 32 cores
    // on code that passes cleanly at 16 (round 13).
    if (sec(9)) {
      import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
      import graft.model.{Agg, GroupBy, QueryModel, TS}
      val DAYMS = 86400000L
      // 60k rows/day (round 12, was 20k): at 20k the 20-day raw scan
      // was SCHEDULING-dominated (~0.3 s for 400k rows, flapping 1.5x
      // run-to-run), so the raw-vs-routed growth margins measured the
      // box's mood, not the plans — 3x the data puts the raw side
      // safely in data-dominated territory at both sizes
      val rowsPerDay = 60000
      def mkStore(days: Int): (TimeSeriesStore, ContinuousAggregate) = {
        val st = new TimeSeriesStore(spark,
          java.nio.file.Files.createTempDirectory(s"soak-read-$days").toString)
        val chunk = 20
        (0 until days by chunk).foreach { d0 =>
          val rows = spark.range(d0.toLong * rowsPerDay,
              math.min(d0 + chunk, days).toLong * rowsPerDay)
            .select(
              (col("id") / rowsPerDay).cast("long").as("day"),
              pmod(col("id"), lit(rowsPerDay)).as("r"))
            .select(
              (col("day") * DAYMS + col("r") * (DAYMS / rowsPerDay)).as("timestamp"),
              // one episodic tag per 3-day block, riding on r == 5..9;
              // everything else cycles five dense tags
              when(col("r").between(5, 9),
                concat(lit("epi_"), (col("day") / 3).cast("long").cast("string")))
                .otherwise(concat(lit("t"), pmod(col("r"), lit(5)).cast("string")))
                .as("tag"),
              (col("r") % 97).cast("double").as("value"))
          import spark.implicits._
          val res = st.insert(rows.as[TS])
          require(res.isRight, s"soak read-store insert failed: $res")
        }
        val r = new ContinuousAggregate(spark, st,
          java.nio.file.Files.createTempDirectory(s"soak-read-roll-$days").toString)
        r.refresh()
        (st, r)
      }
      val qmGroup = QueryModel(aggFunc = Some(Agg.Count),
        groupBy = Some(GroupBy.Tag), tagEq = None)
      def median3d(f: => Double): (Double, Double) = {
        val v = f // warm + value
        val ts = (0 until 3).map { _ => val (_, t) = timed(f); t }.sorted
        (v, ts(1))
      }
      // builds its own store INSIDE the call (build → measure → build →
      // measure: the 200d build must not sit between the 20d build and
      // its measurement — round 13 measured the reordered variant
      // inflating the 20d routed read's ratio enough to flap the
      // flatness law) and returns the pair so §9d can reuse the stores
      def measure(days: Int)
          : ((Double, Double, Double, Double, Int, Int, Double, Double, Double,
              Double, Double, Double),
             (TimeSeriesStore, ContinuousAggregate)) = {
        val pair = mkStore(days)
        val (st, roll) = pair
        def run(df: org.apache.spark.sql.DataFrame): Double =
          df.agg(sum(col("result"))).head().getDouble(0)
        val (vRouted, tRouted) = median3d(run(
          QueryEngine.execute(st, qmGroup, Seq(roll))
            .fold(e => throw new IllegalStateException(e.message), identity)))
        val (vRaw, tRaw) = median3d(run(
          QueryEngine.execute(st.current(), qmGroup)
            .fold(e => throw new IllegalStateException(e.message), identity)))
        require(vRouted == vRaw, s"routed/raw diverged at $days days: $vRouted vs $vRaw")
        // §9b — the round-10 SQL vocabulary rides the same harness:
        // plain time_bucket GROUP-BY SQL and the hop LATERAL VIEW,
        // routed by RollupSqlRewrite, must show the ENGINE-routed
        // flatness, not raw's (counts are integer-exact, so routed and
        // raw sums compare with ==)
        import graft.engine.RollupSqlRewrite
        val v = s"soak_read_v$days"
        st.current().createOrReplaceTempView(v)
        val sqlBucket = s"SELECT time_bucket($DAYMS, timestamp) AS w, tag, " +
          s"CAST(count(*) AS DOUBLE) AS result FROM $v GROUP BY 1, 2"
        val sqlHop = s"SELECT w, tag, CAST(count(*) AS DOUBLE) AS result FROM $v " +
          s"LATERAL VIEW explode(hop_starts(timestamp, $DAYMS, ${2 * DAYMS})) h AS w " +
          "GROUP BY w, tag"
        RollupSqlRewrite.register(spark, st, Seq(roll))
        val (tSqlRouted, tHopRouted, vSqlRouted, vHopRouted) =
          try {
            Seq(sqlBucket, sqlHop).foreach { q =>
              val plan = spark.sql(q).queryExecution.executedPlan.toString
              // the store's segment dirs live under soak-read-<days>;
              // the rollup's under soak-read-roll-<days> — a routed
              // plan reads ONLY the latter
              require(!plan.contains(s"soak-read-$days"),
                s"SQL shape did not route off the raw store at $days days:\n$q")
            }
            val (vS, tS) = median3d(run(spark.sql(sqlBucket)))
            val (vH, tH) = median3d(run(spark.sql(sqlHop)))
            (tS, tH, vS, vH)
          } finally RollupSqlRewrite.unregister(spark, st)
        val (vSqlRaw, _) = median3d(run(spark.sql(sqlBucket)))
        val (vHopRaw, _) = median3d(run(spark.sql(sqlHop)))
        require(vSqlRouted == vSqlRaw && vHopRouted == vHopRaw,
          s"SQL-routed answers diverged from raw at $days days")
        val epi = "epi_2" // lives in days [6, 9) — present at both sizes
        val (hit, total) = st.partitionCountForTag(epi)
        val (vPruned, tPruned) = median3d(
          st.currentForTag(epi).filter(col("tag") === epi).count().toDouble)
        val (vFull, tFull) = median3d(
          st.current().filter(col("tag") === epi).count().toDouble)
        require(vPruned == vFull, s"pruned tag read diverged at $days days")
        // §9c — the round-12 counter SQL rides the same harness, run
        // LAST so the pre-existing §9/§9b measurement sequence (and
        // its warm-up state) is untouched: the per-tag ordered fold
        // (counter_increase) routed to a counter-mode rollup folds
        // O(buckets-per-group) witness structs, while its RAW twin
        // re-collects and re-sorts every event per tag — the most
        // history-hungry read shape in the SQL surface. Both sides
        // are timed; integer values => sums compare with ==.
        val ctrRoll = new ContinuousAggregate(spark, st,
          java.nio.file.Files.createTempDirectory(s"soak-read-ctr-$days").toString,
          counterMode = true)
        ctrRoll.refresh()
        val sqlCtr = s"SELECT tag, counter_increase(timestamp, value) " +
          s"AS result FROM $v GROUP BY tag"
        RollupSqlRewrite.register(spark, st, Seq(roll, ctrRoll))
        val (tCtrRouted, vCtrRouted) =
          try {
            val plan = spark.sql(sqlCtr).queryExecution.executedPlan.toString
            require(!plan.contains(s"soak-read-$days"),
              s"counter SQL did not route off the raw store at $days days")
            require(plan.contains(s"soak-read-ctr-$days"),
              s"counter SQL did not land on the COUNTER rollup at $days days")
            val (vC, tC) = median3d(run(spark.sql(sqlCtr)))
            (tC, vC)
          } finally RollupSqlRewrite.unregister(spark, st)
        val (vCtrRaw, tCtrRaw) = median3d(run(spark.sql(sqlCtr)))
        require(vCtrRouted == vCtrRaw,
          s"counter SQL routed answer diverged from the raw fold at $days days")
        // §9e — the round-13 SQL gapfill rides the same harness. What
        // is (and is NOT) claimable here: the densify-and-fill stages
        // are OUTPUT-sized (grid fan-out + fill windows — identical on
        // both sides), and at this toy scale they dominate, so routed
        // and raw gapfill time out near-equal (first run: 1.275s vs
        // 1.243s at 200d) — the routed-vs-raw separation of the
        // OBSERVED stage is §9b's sqlBucket-vs-raw flatness law, since
        // gapfill's observed stage IS that same rewritten aggregate.
        // The laws §9e adds: value equality routed == raw, both plan
        // tripwires, and "routing never makes gapfill slower" — a
        // regression guard on the whole-plan replacement's overhead.
        // Integer values => routed and raw sums compare with ==.
        val sqlGf = s"SELECT tag, time_bucket_gapfill($DAYMS, timestamp) AS b, " +
          s"locf(sum(value)) AS result FROM $v " +
          s"WHERE timestamp >= 0 AND timestamp < ${days.toLong * DAYMS} " +
          "GROUP BY 1, 2"
        RollupSqlRewrite.register(spark, st, Seq(roll))
        val (tGfRouted, vGfRouted) =
          try {
            val plan = spark.sql(sqlGf).queryExecution.executedPlan.toString
            require(!plan.contains(s"soak-read-$days"),
              s"gapfill SQL did not route off the raw store at $days days")
            val (vG, tG) = median3d(run(spark.sql(sqlGf)))
            (tG, vG)
          } finally RollupSqlRewrite.unregister(spark, st)
        RollupSqlRewrite.register(spark, st, Seq.empty) // raw fallback path
        val (tGfRaw, vGfRaw) =
          try {
            val plan = spark.sql(sqlGf).queryExecution.executedPlan.toString
            require(plan.contains(s"soak-read-$days"),
              s"rollup-less gapfill SQL must scan the raw store at $days days")
            val (vG, tG) = median3d(run(spark.sql(sqlGf)))
            (tG, vG)
          } finally RollupSqlRewrite.unregister(spark, st)
        require(vGfRouted == vGfRaw,
          s"gapfill SQL routed answer diverged from the raw fallback at $days days")
        require(tGfRouted <= 1.3 * tGfRaw + 0.2,
          f"routed gapfill must not cost more than the raw fallback " +
            f"(+30%% and 0.2s jitter floor) at $days days " +
            f"(routed $tGfRouted%.3fs vs raw $tGfRaw%.3fs) — the plan " +
            "replacement grew overhead")
        // absolute separation law AT THIS SIZE (ratio-of-ratio laws on
        // sub-second medians are jitter-fragile; the absolute gap is
        // the design claim): at 10x history the raw fold must cost
        // >= 2x the routed one
        if (days >= 200) require(tCtrRaw >= 2 * tCtrRouted,
          f"raw counter fold must cost >=2x the routed refold at $days days " +
            f"(raw $tCtrRaw%.3fs vs routed $tCtrRouted%.3fs)")
        println(f"[soak] read($days%3dd): routed=$tRouted%.3fs rawGroup=$tRaw%.3fs " +
          f"sqlBucket=$tSqlRouted%.3fs sqlHop=$tHopRouted%.3fs " +
          f"sqlCtr=$tCtrRouted%.3fs rawCtr=$tCtrRaw%.3fs " +
          f"sqlGf=$tGfRouted%.3fs rawGf=$tGfRaw%.3fs " +
          f"tagPruned=$tPruned%.3fs tagFull=$tFull%.3fs epiPartitions=$hit/$total")
        ((tRouted, tRaw, tPruned, tFull, hit, total, tSqlRouted, tHopRouted,
          tCtrRouted, tCtrRaw, tGfRouted, tGfRaw), pair)
      }
      val ((r20, raw20, p20, f20, hit20, _, sql20, hop20, ctr20, ctrRaw20, gf20, gfRaw20), pair20) = measure(20)
      val ((r200, raw200, p200, f200, hit200, total200, sql200, hop200, ctr200, ctrRaw200, gf200, gfRaw200), pair200) = measure(200)
      val routedRatio = r200 / r20
      val rawRatio = raw200 / raw20
      val prunedRatio = p200 / p20
      val fullRatio = f200 / f20
      val sqlRatio = sql200 / sql20
      val hopRatio = hop200 / hop20
      val ctrRatio = ctr200 / ctr20
      val ctrRawRatio = ctrRaw200 / ctrRaw20
      val gfRatio = gf200 / gf20
      val gfRawRatio = gfRaw200 / gfRaw20
      println(f"[soak] read flatness 10x history: routed=${routedRatio}%.2fx " +
        f"raw=${rawRatio}%.2fx sqlBucket=${sqlRatio}%.2fx sqlHop=${hopRatio}%.2fx " +
        f"sqlCtr=${ctrRatio}%.2fx rawCtr=${ctrRawRatio}%.2fx " +
        f"sqlGf=${gfRatio}%.2fx rawGf=${gfRawRatio}%.2fx " +
        f"tagPruned=${prunedRatio}%.2fx tagFull=${fullRatio}%.2fx " +
        f"epiPartitions $hit20 -> $hit200 (of $total200)")
      require(rawRatio >= 2 * routedRatio,
        f"raw group-by must degrade >=2x more than routed across 10x history " +
          f"(raw ${rawRatio}%.2fx vs routed ${routedRatio}%.2fx)")
      require(rawRatio >= 2 * sqlRatio && rawRatio >= 2 * hopRatio,
        f"SQL-routed shapes must track the engine-routed flatness, not raw's " +
          f"(raw ${rawRatio}%.2fx vs sqlBucket ${sqlRatio}%.2fx / sqlHop ${hopRatio}%.2fx)")
      require(ctrRawRatio >= 1.3 * ctrRatio,
        f"the raw counter fold must degrade clearly more than the routed one " +
          f"across 10x history (rawCtr ${ctrRawRatio}%.2fx vs sqlCtr ${ctrRatio}%.2fx)")
      require(hit200 <= hit20 + 1,
        s"episodic tag must open a BOUNDED partition count as history grows " +
          s"($hit20 -> $hit200)")
      require(fullRatio >= 2 * prunedRatio,
        f"unpruned tag scan must degrade >=2x more than the bloom-pruned read " +
          f"(full ${fullRatio}%.2fx vs pruned ${prunedRatio}%.2fx)")

      // §9d — the UNROUTED counter fold's MEMORY behavior (round-12
      // verdict #2): with no counter rollup registered, the SQL
      // counter_increase used to execute a per-group collect_list
      // whose buffer holds the group's ENTIRE event history as
      // UNTRACKED JVM objects — invisible to Spark's memory manager
      // (the fold run below measures tracked peak ≈ 0 MiB while
      // holding millions of structs), hence unspillable: the true OOM
      // cliff. The fallback now plans window-lag — per-partition sort
      // + a TRACKED, bounded, SPILLABLE window buffer. Laws:
      //  (a) the unrouted plan is Window + Sort, never collect_list;
      //  (b) its answer equals the fold's, both sizes;
      //  (c) with the window buffer forced to spill (64k-row
      //      threshold; the largest group is ~240k rows at 20d, ~2.4M
      //      at 200d) the run SPILLS >0 bytes and still matches —
      //      operator state is bounded by the threshold, not by the
      //      largest group;
      //  (d) the fold twin's tracked peak stays ≈0 across 10× history
      //      — documentation-by-law that its memory is unmanaged (if
      //      a future Spark starts tracking these buffers, this alerts
      //      and the row should be re-read).
      {
        import graft.engine.RollupSqlRewrite
        val peak = new java.util.concurrent.atomic.AtomicLong
        val spilledB = new java.util.concurrent.atomic.AtomicLong
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
              spilledB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
            }
          }
        }
        def meter(f: => Double): (Double, Double, Double, Double) = {
          f // warm (also JIT/codegen)
          peak.set(0); spilledB.set(0)
          spark.sparkContext.addSparkListener(listener)
          try {
            val t0 = System.nanoTime()
            val v = f
            val t = (System.nanoTime() - t0) / 1e9
            Thread.sleep(500) // listener bus drain
            (v, t, peak.get / 1048576.0, spilledB.get / 1048576.0)
          } finally spark.sparkContext.removeSparkListener(listener)
        }
        def sumOf(q: String): Double =
          spark.sql(q).agg(sum(col("result"))).head().getDouble(0)
        def at(days: Int, pair: (TimeSeriesStore, ContinuousAggregate)): Unit = {
          val (st, roll) = pair
          val v = s"soak_read_v$days" // temp view measure() registered
          val q = s"SELECT tag, counter_increase(timestamp, value) " +
            s"AS result FROM $v GROUP BY tag"
          val largest = st.current().groupBy(col("tag")).count()
            .agg(max(col("count"))).head().getLong(0)
          // fold twin: store unregistered => collect_list plan
          val foldPlan = spark.sql(q).queryExecution.executedPlan.toString
          require(foldPlan.toLowerCase.contains("collect_list"),
            s"unregistered counter SQL no longer folds at $days d — twin invalid")
          val (vFold, tFold, pFold, _) = meter(sumOf(q))
          // fallback: plain rollup registered => window-lag plan
          RollupSqlRewrite.register(spark, st, Seq(roll))
          try {
            val lagPlan = spark.sql(q).queryExecution.executedPlan.toString
            require(lagPlan.contains("Window") &&
              !lagPlan.toLowerCase.contains("collect_list"),
              s"unrouted counter SQL must plan window-lag at $days d:\n$lagPlan")
            val (vLag, tLag, pLag, _) = meter(sumOf(q))
            require(vLag == vFold,
              s"window-lag diverged from the fold at $days d: $vLag vs $vFold")
            // forced-spill pass: bounded state regardless of group size
            spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", 65536)
            val (vSp, tSp, pSp, spilled) =
              try meter(sumOf(q))
              finally spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
            require(vSp == vFold,
              s"forced-spill window-lag diverged at $days d: $vSp vs $vFold")
            require(spilled > 0,
              f"window buffer did not spill at $days d (largest group $largest rows " +
                f"vs 64k threshold) — the bounded-state law measured nothing")
            println(f"[soak] ctrFallback($days%3dd, largestGroup=$largest%8d): " +
              f"lag=$tLag%6.2fs peak=$pLag%7.1fMiB | " +
              f"lagSpill=$tSp%6.2fs peak=$pSp%7.1fMiB spilled=$spilled%8.1fMiB | " +
              f"fold=$tFold%6.2fs trackedPeak=$pFold%5.1fMiB (untracked buffers)")
            require(pFold <= 1.0,
              f"fold twin's tracked peak is $pFold%.1f MiB — Spark now tracks " +
                "collect buffers; re-evaluate this row's untracked-memory claim")
          } finally RollupSqlRewrite.unregister(spark, st)
        }
        at(20, pair20)
        at(200, pair200)
      }
    }

    // ---- 10. Index PROBE latency vs corpus size --------------------
    // §1/§2 measured APPEND cost and candidate I/O; this measures the
    // PROBE side at 1× vs 10× corpus. Claims:
    //  (a) AnnIndexStore.probeLsh / probeIvf read bucket-pruned
    //      postings (bucket-keyed layout + pushdown), so probe latency
    //      grows FAR slower than the brute twin's full-corpus scan;
    //  (b) MinHashIndex.neardupe pays batch signing + collision-bucket
    //      joins against the persisted postings, so a constant batch's
    //      probe grows far slower than re-running the full pair scan
    //      over history∪batch (what a pipeline without the index pays).
    // Relative assertions only: each bucketed probe's 10× growth must
    // be at most HALF of its brute twin's growth.
    if (sec(10)) {
      import graft.operators.MinHashIndex
      // deterministic synthetic embeddings (no RNG — replayable):
      // 64 dims (the AnnIndexStore default), each component uniform in
      // [-1, 1] off xxhash64(id, dim). Uniformity matters: a first cut
      // used low-dimensional waves and the collapsed LSH buckets made
      // the probe's candidate join try to broadcast 8 GiB
      def corpus(n: Int): DataFrame = spark.range(n).select(
        col("id").as("vec_id"),
        array((0 until 64).map(j =>
          (pmod(xxhash64(col("id"), lit(j)), lit(2000001L)).cast("double")
            / 1000000.0 - 1.0).cast("float")): _*).as("embedding"))
      // 100 queries × 200k × 64-dim puts the brute twin firmly in its
      // linear regime (~1.3G multiply-adds at 10×) — at smaller sizes
      // every path is fixed-overhead-dominated and the growth ratios
      // measure scheduling, not scans (the first cut of this soak ran
      // 10 queries × 50k and saw brute "grow" 0.95×)
      val q100 = corpus(100).graftCheckpoint()
      // the 100 TB operating discipline this soak encodes: BUCKET
      // COUNT SCALES WITH THE CORPUS — planes ~ log2(n/density) keeps
      // LSH bucket density (so candidates per query) bounded, and
      // nlist ~ sqrt(n) gives IVF its sqrt(n) probe growth. At FIXED
      // params a 10x corpus makes every bucket 10x denser and the
      // probe degenerates toward brute (measured before this was
      // parameterized: lsh grew 9.99x vs brute 10.86x).
      def annProbe(n: Int, planes: Int, nlist: Int): (Double, Double, Double) = {
        val c = corpus(n).graftCheckpoint()
        val st = new AnnIndexStore(spark,
          java.nio.file.Files.createTempDirectory(s"soak-probe-ann-$n").toString)
        st.write(c, lsh = AnnIndexStore.LshParams(planes = planes),
          ivf = AnnIndexStore.IvfParams(nlist = nlist))
        val tLsh = median3(st.probeLsh(q100, k = 5)
          .write.mode("overwrite").format("noop").save())
        val tIvf = median3(st.probeIvf(q100, k = 5, nprobe = 8)
          .write.mode("overwrite").format("noop").save())
        val tBrute = median3(Similarity.bruteForceTopK(c, q100, k = 5)
          .write.mode("overwrite").format("noop").save())
        println(f"[soak] annProbe($n%6d, 2^$planes buckets, $nlist lists): " +
          f"lsh=$tLsh%.3fs ivf=$tIvf%.3fs brute=$tBrute%.3fs")
        (tLsh, tIvf, tBrute)
      }
      val (lsh1, ivf1, brute1) = annProbe(20000, planes = 10, nlist = 141)
      val (lsh10, ivf10, brute10) = annProbe(200000, planes = 13, nlist = 447)
      val (lshR, ivfR, bruteR) = (lsh10 / lsh1, ivf10 / ivf1, brute10 / brute1)
      println(f"[soak] annProbe 10x corpus: lsh=${lshR}%.2fx ivf=${ivfR}%.2fx brute=${bruteR}%.2fx")
      require(lshR <= bruteR / 2 && ivfR <= bruteR / 2,
        f"bucketed ANN probes must grow at most half as fast as brute across 10x corpus " +
          f"(lsh ${lshR}%.2fx ivf ${ivfR}%.2fx vs brute ${bruteR}%.2fx)")

      // MinHash: synthetic docs with word-level structure so shingles
      // collide realistically; batch is CONSTANT (500 docs), history 10×s
      def docs(from: Long, n: Long): DataFrame = spark.range(from, from + n).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 24).map(j =>
          concat(lit("w"), pmod(col("id") * (j + 3) + j * 17, lit(250L)).cast("string"))): _*)
          .as("text"))
      def mhProbe(n: Long): (Double, Double) = {
        val hist = docs(0, n).graftCheckpoint()
        val batch = docs(1000000, 500).graftCheckpoint()
        val ix = new MinHashIndex(spark,
          java.nio.file.Files.createTempDirectory(s"soak-probe-mh-$n").toString)
        ix.write(hist)
        val tProbe = median3(ix.neardupe(batch, minEstJaccard = 0.5)
          .write.mode("overwrite").format("noop").save())
        val tBrute = median3(graft.operators.Dedup.minhashPairs(
            hist.unionByName(batch), n = 3, k = 64, bands = 16, minEstJaccard = 0.5)
          .write.mode("overwrite").format("noop").save())
        println(f"[soak] mhProbe($n%6d): indexProbe=$tProbe%.3fs bruteRescan=$tBrute%.3fs")
        (tProbe, tBrute)
      }
      val (mh1, mhBrute1) = mhProbe(3000)
      val (mh10, mhBrute10) = mhProbe(30000)
      val (mhR, mhBruteR) = (mh10 / mh1, mhBrute10 / mhBrute1)
      println(f"[soak] mhProbe 10x history: indexProbe=${mhR}%.2fx bruteRescan=${mhBruteR}%.2fx")
      require(mhR <= mhBruteR / 2,
        f"MinHash index probe must grow at most half as fast as the full rescan " +
          f"across 10x history (probe ${mhR}%.2fx vs rescan ${mhBruteR}%.2fx)")
    }

    spark.stop()
  }
}

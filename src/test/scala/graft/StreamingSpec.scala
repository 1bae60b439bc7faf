package graft

import graft.model.TS
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming semantics validated against batch equivalents (SURVEY.md
  * §7.4 hard part #6: streaming has no reference semantics — we define
  * them and pin them here).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rows = Seq(
    TS(0L, "a", 1.0), TS(30000L, "a", 2.0), TS(45000L, "b", 5.0),
    TS(60000L, "a", 3.0), TS(90000L, "b", 7.0), TS(150000L, "a", 4.0))

  test("tumbling window agg on-stream == same agg on batch") {
    val mem = MemoryStream[TS]
    val q = StreamingIngest.tumblingAgg(mem.toDF(), "1 minute", "0 seconds")
      .writeStream.format("memory").queryName("t_tumbling")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("t_tumbling").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      // watermark is a no-op on batch frames => same function is the oracle
      val batch = StreamingIngest.tumblingAgg(rows.toDF(), "1 minute", "0 seconds")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(streamed.nonEmpty && streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streaming OHLC == batch OHLC, and == the TsAnalytics batch operator") {
    val mem = MemoryStream[TS]
    val q = StreamingIngest.ohlcAgg(mem.toDF(), "1 minute", "0 seconds")
      .writeStream.format("memory").queryName("t_ohlc")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      def shape(rs: Array[org.apache.spark.sql.Row]) = rs
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .sortBy(t => (t._1, t._2))
      val streamed = shape(spark.table("t_ohlc").collect())
      val batch = shape(StreamingIngest.ohlcAgg(rows.toDF(), "1 minute", "0 seconds")
        .collect())
      assert(streamed.nonEmpty && streamed.sameElements(batch))
      // the batch TsAnalytics operator over the same minute buckets
      // produces the same bars (modulo its (tag, bucket) column order)
      val viaBatchOp = graft.operators.TsAnalytics.ohlc(rows.toDF(), 60000L)
        .collect()
        .map(r => (r.getLong(1), r.getString(0), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .sortBy(t => (t._1, t._2))
      assert(streamed.sameElements(viaBatchOp))
    } finally q.stop()
  }

  test("sliding windows: each row lands in size/slide windows") {
    val mem = MemoryStream[TS]
    val q = StreamingIngest.slidingAgg(mem.toDF(), "1 minute", "30 seconds", "0 seconds")
      .writeStream.format("memory").queryName("t_sliding")
      .outputMode("complete").start()
    try {
      mem.addData(TS(45000L, "a", 1.0))
      q.processAllAvailable()
      val starts = spark.table("t_sliding").collect().map(_.getLong(0)).sorted
      assert(starts.toSeq == Seq(0L, 30000L)) // two overlapping windows
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped (append mode)") {
    val mem = MemoryStream[TS]
    val q = StreamingIngest.tumblingAgg(mem.toDF(), "1 minute", "0 seconds")
      .writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    try {
      // batch 1 advances the watermark to ~200s => window [0,60s) closes
      mem.addData(TS(0L, "a", 1.0), TS(200000L, "a", 5.0))
      q.processAllAvailable()
      val closed = spark.table("t_late").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(closed == Seq((0L, 1.0))) // emitted once, cnt=1
      // a row for the already-closed window arrives late => dropped
      mem.addData(TS(30000L, "a", 99.0))
      q.processAllAvailable()
      val after = spark.table("t_late").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(after == Seq((0L, 1.0))) // unchanged: no re-emit, no count bump
    } finally q.stop()
  }

  test("stream dedupe enforces (timestamp, tag) uniqueness within watermark") {
    val mem = MemoryStream[TS]
    val q = StreamingIngest.dedupeStream(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("t_dedupe")
      .outputMode("append").start()
    try {
      mem.addData(TS(1000L, "a", 1.0), TS(1000L, "a", 1.0), TS(1000L, "b", 2.0))
      q.processAllAvailable()
      mem.addData(TS(1000L, "a", 9.0)) // duplicate key arriving later
      q.processAllAvailable()
      val keys = spark.table("t_dedupe").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(keys.toSeq == Seq((1000L, "a"), (1000L, "b")))
    } finally q.stop()
  }

  test("session windows: rows within gap merge, a gap splits sessions") {
    // batch mode (watermark is a no-op) pins the session semantics
    val data = Seq(
      TS(0L, "a", 1.0), TS(60000L, "a", 2.0),      // one session (gap 2 min)
      TS(10 * 60000L, "a", 3.0),                   // new session (9 min gap)
      TS(0L, "b", 9.0))
    val got = StreamingIngest.sessionAgg(data.toDF(), gap = "2 minutes")
      .orderBy($"tag", $"session_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 180000L, "a", 2.0),                 // ends 2 min after last row
      (600000L, 720000L, "a", 1.0),
      (0L, 120000L, "b", 1.0)))
  }

  test("streaming doc dedup by digest: cross-batch duplicate text dropped within watermark") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "etime")
    val q = StreamingIngest.dedupeDocsByDigest(docs, "etime", watermark = "1 hour")
      .writeStream.format("memory").queryName("t_docdedupe")
      .outputMode("append").start()
    try {
      def t(ms: Long) = new java.sql.Timestamp(ms)
      mem.addData((0L, "alpha beta", t(0L)), (1L, "alpha beta", t(1000L)),
        (2L, "gamma delta", t(2000L)))
      q.processAllAvailable()
      mem.addData((3L, "alpha beta", t(3000L)), (4L, "epsilon", t(4000L)))
      q.processAllAvailable()
      val ids = spark.table("t_docdedupe").collect().map(_.getLong(0)).toSet
      // exactly ONE of the in-batch duplicates {0,1} survives (which one
      // is partition order, not a semantic guarantee); the cross-batch
      // duplicate 3 is dropped; distinct texts 2 and 4 pass
      assert(ids.size == 3 && ids.intersect(Set(0L, 1L)).size == 1)
      assert(ids.contains(2L) && ids.contains(4L) && !ids.contains(3L))
      // the digest is state bookkeeping only — output schema is the input schema
      assert(spark.table("t_docdedupe").columns.toSeq == Seq("doc_id", "text", "etime"))
    } finally q.stop()
  }

  test("streaming decontamination: contaminated docs dropped per micro-batch, clean pass") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIngest.decontaminatedIngest(
      mem.toDF().toDF("doc_id", "text"), eval, n = 3) { batch =>
      survivors.synchronized { survivors ++= batch.collect().map(_.getLong(0)) }
    }.start()
    try {
      mem.addData(
        (0L, "alpha beta gamma stolen eval text here"), // shares a 3-gram
        (1L, "totally fresh words nothing shared one"))
      q.processAllAvailable()
      mem.addData(
        (2L, "delta epsilon zeta also leaked content"),
        (3L, "another clean document arrives later ok"))
      q.processAllAvailable()
    } finally q.stop()
    assert(survivors.sorted.toSeq == Seq(1L, 3L))
  }

  test("streaming cluster maintenance: streamed batches == one-shot clustering over everything seen") {
    import graft.operators.{ClusterIndex, Dedup, MinHashIndex}
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val B = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val C = "red orange yellow green blue indigo violet white black brown " +
      "pink gray maroon navy teal olive coral amber jade ruby"
    val b0 = Seq(0L -> A, 10L -> B)
    val b1 = Seq(1L -> A.replace("upsilon", "phi"), 20L -> C)
    val b2 = Seq(11L -> B.replace("twenty", "thirty"),
      2L -> A.replace("alpha", "omega"))
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

    val mp = java.nio.file.Files.createTempDirectory("graft-ci-stream-mh").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-ci-stream-cl").toString
    val index = new MinHashIndex(spark, mp)
    val clusters = new ClusterIndex(spark, cp)
    index.write(df(b0))
    clusters.write(Dedup.minhashPairs(df(b0)).select($"id_a", $"id_b"))

    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.clusterIngest(
      mem.toDF().toDF("doc_id", "text"), index, clusters) { batch =>
      sunk.synchronized { sunk ++= batch.collect().map(_.getLong(0)) }
    }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // redelivery: the same rows again are a no-op end to end
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // keep-everything contract: every fresh row reached the sink once
    assert(sunk.sorted.toSeq == Seq(1L, 2L, 11L, 20L))
    // the law: streamed assignment == one-shot CC over the union's
    // pairs (edge sets coincide — in-batch pairs per trigger + probe
    // hits vs history = the union's pairs split by arrival order)
    val oneShot = Dedup.connectedComponents(
      Dedup.minhashPairs(df(b0 ++ b1 ++ b2)).select($"id_a", $"id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(clusters.assignment().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted == oneShot)
    // survivor view: one keeper per near-dup family
    val surv = clusters.survivors().collect().map(_.getLong(0)).toSet
    assert(surv.contains(0L) && surv.contains(10L) && !surv.contains(1L)
      && !surv.contains(2L) && !surv.contains(11L))
  }

  test("streaming drift monitor: each trigger's report == the batch operator on that batch") {
    import graft.operators.{DriftRef, Quality}
    val refCorpus = (0 until 40)
      .map(i => (i.toLong, s"reference doc $i plain words ${"x " * (i % 7)}"))
      .toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-drift-stream").toString
    val store = new DriftRef(spark, p)
    store.write(refCorpus)
    val b1 = Seq((100L, "fresh batch one normal words here"),
      (101L, "more ordinary content flowing in"))
    val b2 = Seq((200L, "spam spam"), (201L, "spam spam"), (202L, "spam spam"))
    val mem = MemoryStream[(Long, String)]
    val reports = scala.collection.mutable.Map.empty[Long, Seq[org.apache.spark.sql.Row]]
    val q = StreamingIngest.driftIngest(
      mem.toDF().toDF("doc_id", "text"), store) { (id, rep) =>
      reports.synchronized { reports(id) = rep.collect().toSeq }
    }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // stream == batch, per trigger: each report is exactly the
    // oracle-checked operator on that micro-batch
    assert(reports.size == 2)
    assert(reports(0L) == Quality.drift(refCorpus, b1.toDF("doc_id", "text")).collect().toSeq)
    assert(reports(1L) == Quality.drift(refCorpus, b2.toDF("doc_id", "text")).collect().toSeq)
    // and the degraded batch actually trips the investigate threshold
    assert(reports(1L).map(_.getDouble(3)).sum > 0.25)
  }

  test("streaming ANN maintenance: appended micro-batches probe identically to a full build") {
    import graft.operators.AnnIndexStore
    import graft.operators.AnnIndexStore.{IvfParams, LshParams}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def slice(lo: Long, hi: Long) = emb.filter($"vec_id" >= lo && $"vec_id" < hi)
    def asData(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val streamed = new AnnIndexStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ann-stream").toString)
    streamed.write(slice(0L, 200L), LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingIngest.annIngest(
      mem.toDF().toDF("vec_id", "embedding"), streamed).start()
    try {
      mem.addData(asData(slice(200L, 250L)): _*)
      q.processAllAvailable()
      // at-least-once redelivery: the second trigger re-carries the
      // first batch's rows — append's indexed-id anti-join must drop
      // them or every probe would return duplicate top-k entries
      mem.addData(asData(slice(200L, 300L)): _*)
      q.processAllAvailable()
      // a FULLY-redelivered trigger: the delta empties, so append must
      // SKIP its commit — publishing it would write a zero-row
      // partitionBy lsh dir that bricks every later read of the store
      mem.addData(asData(slice(200L, 250L)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(streamed.versions == Seq(0L, 1L, 2L)) // base + one per REAL delta

    val full = new AnnIndexStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ann-full").toString)
    full.write(slice(0L, 300L), LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(streamed.probeLsh(queries, k = 5)) == rows(full.probeLsh(queries, k = 5)))
  }

  test("streaming near-dup ingest: cross-batch near-dups dropped; restart redelivery is a no-op") {
    import graft.operators.MinHashIndex
    val idxDir = java.nio.file.Files.createTempDirectory("graft-mh-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mh-ckpt").toString
    val index = new MinHashIndex(spark, idxDir)
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val textB = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    index.write(Seq((0L, textA)).toDF("doc_id", "text"))
    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingIngest.neardupIngest(
        mem.toDF().toDF("doc_id", "text"), index) { b =>
        sunk ++= b.select($"doc_id").collect().map(_.getLong(0)); ()
      }.option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      // 1 ≈ 0 (near-dup of HISTORY — dropped); 10 is novel (survives)
      mem.addData((1L, textA.replace("upsilon", "phi")), (10L, textB))
      q1.processAllAvailable()
      // 11 ≈ 10 — near-dup of a doc indexed by the PREVIOUS micro-batch
      mem.addData((11L, textB.replace("twenty", "thirty")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(sunk.sorted.toSeq == Seq(10L))
    // restart against the same checkpoint; the source redelivers an
    // already-indexed doc — the id anti-join makes the re-run a no-op
    val q2 = start()
    try {
      mem.addData((10L, textB), (20L, "red orange yellow green blue indigo " +
        "violet white black brown pink gray maroon navy teal olive coral amber jade ruby"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(sunk.sorted.toSeq == Seq(10L, 20L))
    // the index holds exactly the survivors: 0 (base), 10, 20
    assert(index.sigs().select($"id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 10L, 20L))
  }

  test("streaming embedding near-dup ingest: cross-batch semantic dups dropped; restart redelivery no-op") {
    import graft.operators.AnnIndexStore
    import graft.operators.AnnIndexStore.{IvfParams, LshParams}
    // deterministic near-orthogonal bases + near-identical twins (the
    // ExtensionSpec SemDeDup corpus): twins score ~1.0, others ~0
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    def twin(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, d) => if (d == 0) x + 0.01f else x }
    val bases = (0 until 40).map(i => (i.toLong, vec(i)))
    val store = new AnnIndexStore(spark,
      java.nio.file.Files.createTempDirectory("graft-embdedup-idx").toString)
    store.write(bases.toDF("vec_id", "embedding"),
      LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-embdedup-ckpt").toString
    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, Array[Float])]
    def start() = StreamingIngest.embedNeardupIngest(
        mem.toDF().toDF("vec_id", "embedding"), store, minCosine = 0.95) { b =>
        sunk.synchronized { sunk ++= b.select($"vec_id").collect().map(_.getLong(0)) }
      }.option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      // 1003 semantically duplicates indexed base 3 (drop); 500 is novel
      mem.addData((1003L, twin(bases(3)._2)), (500L, vec(907)))
      q1.processAllAvailable()
      // cross-batch: 1500 duplicates 500, which the PREVIOUS trigger
      // indexed — only the persisted index can know that
      mem.addData((1500L, twin(vec(907))))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(sunk.sorted.toSeq == Seq(500L))
    // restart against the same checkpoint: the source redelivers an
    // already-indexed id alongside a new novel vector
    val q2 = start()
    try {
      mem.addData((500L, vec(907)), (600L, vec(911)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(sunk.sorted.toSeq == Seq(500L, 600L))
    // the index holds exactly bases + survivors, each id once
    val ids = store.indexedIds().collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == ((0L until 40L) ++ Seq(500L, 600L)).sorted,
      s"index diverged: ${ids.sorted.mkString(",")}")
    assert(ids.length == ids.distinct.length)
  }

  test("streaming ingest into the store: idempotent under redelivery") {
    import graft.engine.TimeSeriesStore
    val store = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-stream-store").toString)
    val mem = MemoryStream[TS]
    val q = StreamingIngest.ingestToStore(mem.toDS(), store).start()
    try {
      mem.addData(TS(1L, "a", 1.0), TS(2L, "b", 2.0))
      q.processAllAvailable()
      assert(store.current().count() == 2)
      // redelivery of an old row + one new row: only the new one lands
      mem.addData(TS(1L, "a", 1.0), TS(3L, "c", 3.0))
      q.processAllAvailable()
      assert(store.current().count() == 3)
      assert(store.current().filter($"timestamp" === 1L).count() == 1)
    } finally q.stop()
  }

  test("streaming ingest keeps the continuous aggregate fresh per trigger") {
    import graft.engine.{ContinuousAggregate, TimeSeriesStore}
    import org.apache.spark.sql.functions._
    val store = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-cagg-ing-store").toString)
    val agg = new ContinuousAggregate(spark, store,
      java.nio.file.Files.createTempDirectory("graft-cagg-ing").toString)
    val DAY = 86400000L
    def recompute() = store.current().groupBy(col("g_day"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("g_day", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val mem = MemoryStream[TS]
    val q = StreamingIngest.ingestToStore(mem.toDS(), store, Seq(agg)).start()
    try {
      mem.addData(TS(0L, "a", 1.0), TS(DAY, "b", 2.0))
      q.processAllAvailable()
      assert(shape(agg.read()) == shape(recompute()))
      // second trigger touches one old day + one new day; the rollup
      // follows without an explicit refresh call
      mem.addData(TS(5L, "a", 3.0), TS(2 * DAY, "c", 4.0))
      q.processAllAvailable()
      assert(shape(agg.read()) == shape(recompute()))
      // (d0,a) folds both rows into one; (d1,b) and (d2,c) one each
      assert(agg.read().count() == 3)
      assert(agg.read().filter(col("g_day") === 0L).select("cnt")
        .collect().head.getLong(0) == 2L)
    } finally q.stop()
  }

  test("streaming ingest keeps a HIERARCHICAL rollup pyramid fresh, even passed coarsest-first") {
    import graft.engine.{ContinuousAggregate, TimeSeriesStore}
    import org.apache.spark.sql.functions._
    val DAY = 86400000L
    val store = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-hier-ing-store").toString)
    val daily = new ContinuousAggregate(spark, store,
      java.nio.file.Files.createTempDirectory("graft-hier-ing-daily").toString)
    val weekly = new ContinuousAggregate(spark, store,
      java.nio.file.Files.createTempDirectory("graft-hier-ing-weekly").toString,
      bucketMs = 7 * DAY, source = Some(daily))
    def wrecompute() = store.current()
      .groupBy((expr(s"timestamp div ${7 * DAY}") * (7 * DAY)).as("bucket_start"),
        col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("bucket_start", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val mem = MemoryStream[TS]
    // COARSEST-FIRST on purpose: ingestToStore must reorder finest-first
    // or the weekly parent would never see a current child and would pay
    // the raw fallback every trigger
    val q = StreamingIngest.ingestToStore(mem.toDS(), store,
      Seq(weekly, daily)).start()
    try {
      mem.addData(TS(0L, "a", 1.0), TS(8 * DAY, "b", 2.0))
      q.processAllAvailable()
      assert(weekly.reflectedStoreVersion.contains(store.version))
      assert(daily.reflectedStoreVersion.contains(store.version))
      assert(shape(weekly.read()) == shape(wrecompute()))
      mem.addData(TS(DAY, "a", 3.0), TS(15 * DAY, "c", 4.0))
      q.processAllAvailable()
      assert(shape(weekly.read()) == shape(wrecompute()))
      assert(weekly.read().count() == 3) // weeks 0, 1, 2
      // the parent REFOLDED its child rather than falling back: a
      // direct refresh after a fresh child is the observable proxy —
      // touch a day, refresh child then parent by hand, expect the
      // child fast path
      assert(store.update(Seq(TS(0L, "a", 9.0)).toDS()).isRight)
      daily.refresh()
      val s = weekly.refresh()
      assert(s.fromChild && s.recomputedDays == 1,
        s"weekly parent should refold one changed week from the child: $s")
    } finally q.stop()
  }

  test("streaming ingest keeps SKETCH-BEARING rollups fresh: percentile/distinct/top-k per trigger") {
    import graft.engine.{ContinuousAggregate, TimeSeriesStore}
    import org.apache.spark.sql.functions._
    val store = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-skagg-ing-store").toString)
    val agg = new ContinuousAggregate(spark, store,
      java.nio.file.Files.createTempDirectory("graft-skagg-ing").toString,
      sketchRelErr = Some(0.01))
    val DAY = 86400000L
    val mem = MemoryStream[TS]
    val q = StreamingIngest.ingestToStore(mem.toDS(), store, Seq(agg)).start()
    try {
      // trigger 1: day-0 values 1..50; trigger 2 re-touches day 0 AND
      // adds day 1 — the sketch columns must re-sketch the changed day
      mem.addData((1 to 50).map(i => TS(i.toLong, "a", i.toDouble)): _*)
      q.processAllAvailable()
      val p1 = agg.answerPercentile(0.5).get.head().getDouble(0)
      assert(p1 >= 24.0 && p1 <= 27.0, s"p50 after trigger 1: $p1")
      mem.addData((51 to 80).map(i => TS(i.toLong, "a", i.toDouble)) ++
        Seq(TS(DAY, "a", 100.0), TS(DAY + 1, "a", 100.0)): _*)
      q.processAllAvailable()
      // distinct: 80 uniques + 100.0 (twice) = 81; HLL ~exact here
      val d = agg.answerDistinct().get.head().getDouble(0)
      assert(math.abs(d - 81.0) / 81.0 < 0.05, s"distinct after trigger 2: $d")
      // top value: 100.0 twice, everything else once — MG is exact at
      // this vocabulary
      val top = agg.answerTopValues(1).get.head()
      assert(top.getString(1) == "100.0" && top.getDouble(2) == 2.0,
        s"top value after trigger 2: $top")
      // percentile over the union window
      val p2 = agg.answerPercentile(0.5).get.head().getDouble(0)
      assert(p2 >= 39.0 && p2 <= 43.0, s"p50 after trigger 2: $p2")
    } finally q.stop()
  }

  test("cadenced store+rollup maintenance on ingestToStore: fan-in bounded, answers unchanged") {
    import graft.engine.{ContinuousAggregate, TimeSeriesStore}
    import org.apache.spark.sql.functions._
    val store = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-cad-ing-store").toString)
    val agg = new ContinuousAggregate(spark, store,
      java.nio.file.Files.createTempDirectory("graft-cad-ing-cagg").toString)
    val DAY = 86400000L
    def recompute() = store.current().groupBy(col("g_day"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("g_day", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val mem = MemoryStream[TS]
    // compact+vacuum every 2 non-empty triggers; zero retention is
    // safe here because no reader holds a pre-compact snapshot
    val q = StreamingIngest.ingestToStore(mem.toDS(), store, Seq(agg),
      compactEvery = 2, vacuumRetentionMs = 0L).start()
    try {
      (0 until 6).foreach { i =>
        mem.addData(TS(i * DAY, "a", i.toDouble), TS(i * DAY + 5, "b", i + 0.5))
        q.processAllAvailable()
        // maintenance must never change answers, only file layout
        assert(shape(agg.read()) == shape(recompute()), s"diverged at trigger $i")
      }
      // 6 triggers appended 6 store segments and 6 rollup deltas; the
      // cadence folded both (trigger 6's own append lands post-compact)
      assert(store.segmentCount <= 2, s"store fan-in: ${store.segmentCount}")
      assert(agg.segmentCount <= 3, s"rollup fan-in: ${agg.segmentCount}")
      // IMMEDIATELY post-maintenance (before any further trigger can
      // mask it): the refresh must be an incremental no-op, NOT a full
      // recompute. Maintenance refreshes the rollup BETWEEN
      // store.compact and store.vacuum, so the zero-retention manifest
      // reap can never strand the rollup's diff base — stranded, every
      // later refresh silently degrades to O(history), defeating the
      // content-id incremental path on exactly the long-running
      // ingests the cadence targets
      val s = agg.refresh()
      assert(s.recomputedDays == 0 && !s.full,
        s"post-maintenance refresh degraded: $s")
      // ingest keeps working across maintenance (the day-scoped refresh
      // cost across a compact is pinned in ContinuousAggSpec's
      // content-id test); the trigger's rollup is already current, so
      // an explicit refresh is a no-op
      mem.addData(TS(6 * DAY, "a", 6.0))
      q.processAllAvailable()
      assert(shape(agg.read()) == shape(recompute()))
      assert(agg.refresh().recomputedDays == 0)
    } finally q.stop()
  }

  test("streaming ingest: restart from checkpoint is exactly-once; equals batch-built store") {
    import graft.engine.TimeSeriesStore
    val storeDir = java.nio.file.Files.createTempDirectory("graft-restart-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    val store = new TimeSeriesStore(spark, storeDir)
    val mem = MemoryStream[TS]
    def start() = StreamingIngest.ingestToStore(mem.toDS(), store)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      mem.addData(TS(1L, "a", 1.0), TS(2L, "b", 2.0))
      q1.processAllAvailable()
      assert(store.current().count() == 2)
    } finally q1.stop()
    // restart against the SAME checkpoint — the at-least-once world:
    // the source redelivers an already-committed key alongside new data
    val q2 = start()
    try {
      mem.addData(TS(1L, "a", 1.0), TS(3L, "c", 3.0))
      q2.processAllAvailable()
      assert(store.current().count() == 3) // no duplicate from redelivery
      assert(store.current().filter($"timestamp" === 1L).count() == 1)
    } finally q2.stop()
    // the stream-fed store is exactly the batch-inserted store
    val batchStore = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-batch-store").toString)
    assert(batchStore.insert(
      Seq(TS(1L, "a", 1.0), TS(2L, "b", 2.0), TS(3L, "c", 3.0)).toDS()).isRight)
    def rows(st: TimeSeriesStore) = st.current()
      .select($"timestamp", $"tag", $"value")
      .orderBy($"timestamp", $"tag").collect().toSeq
    assert(rows(store) == rows(batchStore))
  }

  test("stream-stream interval join == batch join; out-of-interval rows excluded") {
    val clicks = Seq(TS(100000L, "u1", 1.0), TS(200000L, "u1", 2.0), TS(100000L, "u2", 3.0))
    val errors = Seq(
      TS(95000L, "u1", -1.0),   // within 10s of u1's click @100s
      TS(150000L, "u1", -2.0),  // within 60s lookback of u1's click @200s
      TS(300000L, "u1", -3.0),  // AFTER every click => never joins
      TS(99000L, "u2", -4.0))   // within 10s of u2's click @100s
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select($"timestamp", $"tag", $"r_timestamp", $"r_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq

    // batch form (watermark no-op) pins the semantics
    val batch = shape(StreamingIngest.intervalJoin(
      clicks.toDF(), errors.toDF(), Seq("tag"), lookbackMs = 60000L))
    assert(batch == Seq(
      (100000L, "u1", 95000L, -1.0),
      (100000L, "u2", 99000L, -4.0),
      (200000L, "u1", 150000L, -2.0)))

    // the same join on-stream matches batch
    val ml = MemoryStream[TS]; val mr = MemoryStream[TS]
    val q = StreamingIngest.intervalJoin(ml.toDF(), mr.toDF(), Seq("tag"),
      lookbackMs = 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("t_interval")
      .outputMode("append").start()
    try {
      ml.addData(clicks: _*)
      mr.addData(errors: _*)
      q.processAllAvailable()
      assert(shape(spark.table("t_interval")) == batch)
    } finally q.stop()

    // leftOuter keeps unmatched left rows (null right cols) — the
    // lossless variant; u3 has no error in its lookback
    val outer = StreamingIngest.intervalJoin(
      (clicks :+ TS(500000L, "u3", 9.0)).toDF(), errors.toDF(), Seq("tag"),
      lookbackMs = 60000L, joinType = "leftOuter")
    assert(outer.filter($"tag" === "u3" && $"r_value".isNull).count() == 1)
    assert(outer.count() == batch.size + 1)

    // keyless is a loud error, not an opaque reduce crash
    val err = intercept[IllegalArgumentException] {
      StreamingIngest.intervalJoin(clicks.toDF(), errors.toDF(), Seq.empty, 1L)
    }
    assert(err.getMessage.contains("at least one join key"))
  }

  test("interval join leftOuter ON-STREAM emits null-matched rows after watermark passes") {
    val ml = MemoryStream[TS]; val mr = MemoryStream[TS]
    val q = StreamingIngest.intervalJoin(ml.toDF(), mr.toDF(), Seq("tag"),
      lookbackMs = 10000L, watermark = "0 seconds", joinType = "leftOuter")
      .writeStream.format("memory").queryName("t_interval_outer")
      .outputMode("append").start()
    try {
      ml.addData(TS(100000L, "u1", 1.0)) // no matching right event ever
      mr.addData(TS(99000L, "u2", -1.0)) // different key
      q.processAllAvailable()
      // advance both watermarks far beyond the u1 click so the engine
      // can prove no in-interval match will arrive and emit the null row
      ml.addData(TS(500000L, "u9", 0.0))
      mr.addData(TS(500000L, "u9", 0.0))
      q.processAllAvailable()
      ml.addData(TS(900000L, "u9", 0.0))
      mr.addData(TS(900000L, "u9", 0.0))
      q.processAllAvailable()
      val u1 = spark.table("t_interval_outer")
        .filter($"tag" === "u1").collect()
      assert(u1.length == 1 && u1.head.isNullAt(u1.head.fieldIndex("r_value")))
    } finally q.stop()
  }

  test("streamingTopTokens: MG state across micro-batches == whole-stream counts") {
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.streamingTopTokens(
      mem.toDF().toDF("doc_id", "text"), capacity = 64)
      .writeStream.format("memory").queryName("t_toptok")
      .outputMode("complete").start()
    try {
      mem.addData((0L, "a a a b"), (1L, "b c"))
      q.processAllAvailable()
      mem.addData((2L, "a c c d"))
      q.processAllAvailable()
      // capacity > vocabulary => the merged MG state is EXACT: the
      // emitted summary equals the true whole-stream counts
      val got = spark.table("t_toptok").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq(("a", 4L), ("b", 2L), ("c", 3L), ("d", 1L)))
    } finally q.stop()
  }

  test("streamingFunnel: in-order stream converges to the batch funnel") {
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamingIngest.streamingFunnel(
      mem.toDF().toDF("user_id", "t", "event_type"),
      Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("update").start()
    try {
      // batch 1: everyone's early events (time order preserved)
      mem.addData((1L, 10L, "view"), (2L, 20L, "click"), (3L, 10L, "view"),
        (3L, 10L, "click"), (4L, 10L, "view"))
      q.processAllAvailable()
      // batch 2: later events — u1 completes, u2's view comes after
      // their click (stays stage 1), u4 clicks
      mem.addData((1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 30L, "view"), (4L, 15L, "click"))
      q.processAllAvailable()
      // latest emitted row per user = final stage
      val fin = spark.table("t_funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._3)._2 }
      // same fixture logic as FunnelSpec: stage counts 4 / 2 / 1
      def reached(k: Int) = fin.count(_._2 >= k)
      assert((reached(1), reached(2), reached(3)) == (4, 2, 1))
      // cross-batch strictly-after: u3's same-timestamp click never counted
      assert(fin(3L) == 1)
    } finally q.stop()
  }

  test("runningStats carries per-tag state across micro-batches") {
    val mem = MemoryStream[TS]
    val q = StreamingIngest.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("append").start()
    try {
      mem.addData(TS(1L, "a", 2.0), TS(2L, "a", 4.0))
      q.processAllAvailable()
      mem.addData(TS(3L, "a", 10.0))
      q.processAllAvailable()
      val a = spark.table("t_state").as[StreamingIngest.TagStats]
        .collect().filter(_.tag == "a").sortBy(_.n)
      assert(a.map(s => (s.n, s.total, s.maxValue)).toSeq ==
        Seq((2L, 6.0, 4.0), (3L, 16.0, 10.0)))
    } finally q.stop()
  }

  test("dedupIngest: exact dups vs all history dropped; restart redelivery is a no-op") {
    import graft.operators.DigestIndex
    val idxDir = java.nio.file.Files.createTempDirectory("graft-di-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-di-ckpt").toString
    val index = new DigestIndex(spark, idxDir)
    index.write(Seq((0L, "history text one")).toDF("doc_id", "text"))
    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingIngest.dedupIngest(
        mem.toDF().toDF("doc_id", "text"), index) { b =>
        sunk ++= b.select($"doc_id").collect().map(_.getLong(0)); ()
      }.option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      // dup of HISTORY dropped; novel survives (and is indexed)
      mem.addData((1L, "history text one"), (2L, "novel text two"))
      q1.processAllAvailable()
      // dup of the PREVIOUS micro-batch's survivor dropped
      mem.addData((3L, "novel text two"), (4L, "novel text three"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(sunk.sorted.toSeq == Seq(2L, 4L))
    // restart on the same checkpoint: redelivered text is indexed, so
    // the re-run drops it — only the genuinely new row lands
    val q2 = start()
    try {
      mem.addData((5L, "novel text three"), (6L, "novel text four"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(sunk.sorted.toSeq == Seq(2L, 4L, 6L))
  }

  test("statsIngest: streamed data card equals a one-shot build over everything seen") {
    import graft.operators.StatsIndex
    val streamed = new StatsIndex(spark,
      java.nio.file.Files.createTempDirectory("graft-stats-stream").toString)
    val b0 = Seq((0L, "web", "alpha beta gamma"), (1L, "books", "one two"))
      .toDF("doc_id", "source", "text")
    streamed.write(b0)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingIngest.statsIngest(
      mem.toDF().toDF("doc_id", "source", "text"), streamed).start()
    val later = Seq((2L, "web", "alpha delta"), (3L, "wiki", "five six seven"),
      (4L, "books", "one two")) // exact dup of 1 — distinct est unmoved
    try {
      mem.addData(later.take(2): _*)
      q.processAllAvailable()
      mem.addData(later.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(streamed.versions == Seq(0L, 1L, 2L)) // base + one per batch

    val full = new StatsIndex(spark,
      java.nio.file.Files.createTempDirectory("graft-stats-full").toString)
    full.write(b0.unionByName(later.toDF("doc_id", "source", "text")))
    assert(streamed.report().collect().toSeq == full.report().collect().toSeq)
  }

  test("livenessMonitor: watermark-driven down, transitions == batch liveRanges bounds") {
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.livenessMonitor(
      mem.toDF().toDF("user_id", "t"), tolMs = 10000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("t_liveness")
      .outputMode("append").start()
    try {
      // key 1: one live range (beats 5s apart), then silence
      mem.addData((1L, 1000L), (1L, 6000L))
      q.processAllAvailable()
      // key 2's beat advances max event time; the NEXT trigger sees the
      // raised watermark and fires key 1's timeout
      mem.addData((2L, 100000L))
      q.processAllAvailable()
      mem.addData((2L, 101000L))
      q.processAllAvailable()
      val got = spark.table("t_liveness")
        .as[StreamingIngest.LivenessEvent].collect().sortBy(e => (e.key, e.at))
      val k1 = got.filter(_.key == 1L).map(e => (e.state, e.at, e.n_beats)).toSeq
      assert(k1 == Seq(("up", 1000L, 1L), ("down", 16000L, 2L)))
      // key 2 is still within tolerance of the watermark: up only
      assert(got.filter(_.key == 2L).map(e => (e.state, e.at)).toSeq ==
        Seq(("up", 100000L)))
      // in-order replay reproduces the batch liveRanges interval exactly
      val range = graft.operators.TsAnalytics.liveRanges(
          Seq((1L, 1000L), (1L, 6000L)).toDF("user_id", "t"), "user_id", "t", 10000L)
        .collect().map(r => (r.getLong(1), r.getLong(2))).head
      assert(k1.map(e => e._2) == Seq(range._1, range._2))
    } finally q.stop()
  }

  test("livenessMonitor: an intra-batch gap emits the down/up pair directly") {
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.livenessMonitor(
      mem.toDF().toDF("user_id", "t"), tolMs = 10000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("t_liveness2")
      .outputMode("append").start()
    try {
      mem.addData((7L, 1000L), (7L, 31000L))
      q.processAllAvailable()
      val got = spark.table("t_liveness2")
        .as[StreamingIngest.LivenessEvent].collect().sortBy(_.at)
        .map(e => (e.state, e.at, e.n_beats)).toSeq
      assert(got == Seq(("up", 1000L, 1L), ("down", 11000L, 1L), ("up", 31000L, 2L)))
    } finally q.stop()
  }
}

package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** Crash-recovery chaos for the streaming index family (round-7
  * verdict #3): every ingest path argues at-least-once safety from
  * sink-first ordering plus idempotent index appends — these specs
  * prove the END-TO-END restart law instead of trusting the
  * composition of the individually-spec'd pieces.
  *
  * Two crash injections cover the two at-least-once windows:
  *
  *  1. THROW FROM THE SINK after recording its rows — the trigger dies
  *     after the sink write but BEFORE the index append (the exact
  *     window the sink-first ordering exists for). The batch's offsets
  *     are logged but its commit never lands, so the restarted query
  *     replays the same batch.
  *  2. DELETE THE LAST CHECKPOINT COMMIT after a clean trigger — the
  *     crash-after-everything-but-the-commit window: the restart
  *     replays a trigger whose side effects are ALL already durable,
  *     so every index append must no-op.
  *
  * Convergence means: no doc lost from the sink, no duplicate index
  * rows, and the final index state equals the one a crash-free run
  * (or a one-shot batch build) would produce. Duplicate SINK delivery
  * is allowed — that is the foreachBatch contract (idempotent sink),
  * not a defect.
  */
class StreamingChaosSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Stop and WAIT until the manager deregisters the query — stop()
    * returns before the active-checkpoint registry clears, and an
    * immediate same-checkpoint restart races it into "Multiple
    * streaming queries are concurrently using <ckpt>". */
  private def stopAndAwait(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    try q.stop() catch { case _: Throwable => () }
    val deadline = System.currentTimeMillis() + 30000
    while (spark.streams.active.exists(_.id == q.id) &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
  }

  /** Injection 2: make the checkpoint believe the last trigger never
    * committed (offsets logged, commit file gone). */
  private def dropLastCommit(ckpt: String): Unit = {
    val dir = java.nio.file.Paths.get(ckpt, "commits")
    val files = java.nio.file.Files.list(dir)
    val last = try files.iterator().asScala
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    finally files.close()
    java.nio.file.Files.delete(last)
    // also the Hadoop local-FS checksum shadow — left behind, it makes
    // the replay's commit rename fail as a phantom "concurrent query"
    java.nio.file.Files.deleteIfExists(
      last.resolveSibling(s".${last.getFileName}.crc"))
  }

  private class ChaosSink {
    @volatile var crashNext = false
    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    def deliver(ids: Seq[Long]): Unit = sunk.synchronized { sunk ++= ids }
    def maybeCrash(): Unit = if (crashNext) {
      crashNext = false
      throw new RuntimeException("chaos: crashed after sink, before index append")
    }
  }

  test("dedupIngest: crash between sink and digest append, restart converges") {
    import graft.operators.DigestIndex
    val index = new DigestIndex(spark, tmp("chaos-digest-idx"))
    index.write(Seq((0L, "base document zero")).toDF("doc_id", "text"))
    val ckpt = tmp("chaos-digest-ckpt")
    val sink = new ChaosSink
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingIngest.dedupIngest(
        mem.toDF().toDF("doc_id", "text"), index) { b =>
        sink.deliver(b.select($"doc_id").collect().map(_.getLong(0)).toSeq)
        sink.maybeCrash()
      }.option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      mem.addData((1L, "first unique"), (2L, "second unique"))
      q1.processAllAvailable() // clean trigger
      sink.crashNext = true
      // 3 is novel; 4 duplicates doc 1's text (must drop on any run)
      mem.addData((3L, "third unique"), (4L, "first unique"))
      intercept[Exception](q1.processAllAvailable()) // dies post-sink
    } finally try q1.stop() catch { case _: Throwable => () }
    // the crashed trigger delivered 3 to the sink but never indexed it
    assert(sink.sunk.count(_ == 3L) == 1)
    assert(index.dedupe(Seq((99L, "third unique")).toDF("doc_id", "text"))
      .count() == 1, "3 must NOT be indexed yet — the crash landed before append")

    val q2 = start()
    try {
      // restart replays (3, 4) from the checkpoint, then the new batch
      mem.addData((5L, "fifth unique"))
      q2.processAllAvailable()
    } finally q2.stop()
    // no lost docs: every unique text reached the sink; 4 never did
    assert(sink.sunk.contains(3L) && sink.sunk.contains(5L) && !sink.sunk.contains(4L))
    // replayed 3 delivered again — allowed (at-least-once sink), indexed ONCE
    assert(sink.sunk.count(_ == 3L) == 2)
    val dg = index.digests().collect().map(_.getString(0)).toSeq
    assert(dg.length == dg.distinct.length, "duplicate digest rows after replay")
    // converged to the crash-free state: base + docs 1, 2, 3, 5
    assert(dg.length == 5)
    assert(index.dedupe(Seq((99L, "third unique")).toDF("doc_id", "text")).count() == 0)
  }

  test("phashIngest: crash between sink and hash append, restart converges") {
    import graft.operators.PhashIndex
    val base = 0x0123456789abcdefL
    val index = new PhashIndex(spark, tmp("chaos-phash-idx"))
    index.write(Seq((0L, base)).toDF("media_id", "phash"))
    val ckpt = tmp("chaos-phash-ckpt")
    val sink = new ChaosSink
    val mem = MemoryStream[(Long, Long)]
    def start() = StreamingIngest.phashIngest(
        mem.toDF().toDF("media_id", "phash"), index) { b =>
        sink.deliver(b.select($"media_id").collect().map(_.getLong(0)).toSeq)
        sink.maybeCrash()
      }.option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      mem.addData((1L, ~base), (2L, 0x5555aaaa5555aaaaL))
      q1.processAllAvailable() // clean trigger
      sink.crashNext = true
      // 3 is novel; 4 is within hamming 1 of the base image (must drop)
      mem.addData((3L, 0x00ff00ff00ff00ffL), (4L, base ^ 0x1L))
      intercept[Exception](q1.processAllAvailable()) // dies post-sink
    } finally stopAndAwait(q1)
    // the crashed trigger delivered 3 but never indexed it
    assert(sink.sunk.count(_ == 3L) == 1)
    assert(index.dedupe(Seq((99L, 0x00ff00ff00ff00ffL)).toDF("media_id", "phash"))
      .count() == 1, "3 must NOT be indexed yet — the crash landed before append")

    val q2 = start()
    try {
      mem.addData((5L, 0x0f0f0f0ff0f0f0f0L))
      q2.processAllAvailable()
    } finally stopAndAwait(q2)
    // no lost media: every novel hash reached the sink; 4 never did
    assert(sink.sunk.contains(3L) && sink.sunk.contains(5L) && !sink.sunk.contains(4L))
    assert(sink.sunk.count(_ == 3L) == 2) // replay re-delivered, allowed
    // indexed ONCE: replay's append anti-joined the already-landed id
    val ids = index.postings().select($"media_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 2L, 3L, 5L))
    val nRows = index.postings().count()
    assert(nRows == ids.size * 4L, s"duplicate posting rows: $nRows")
    // near-dup of the base still drops after all the chaos
    assert(index.dedupe(Seq((99L, base ^ 0x2L)).toDF("media_id", "phash")).count() == 0)
  }

  test("neardupIngest: crash between sink and signature append, restart converges") {
    import graft.operators.MinHashIndex
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val B = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val index = new MinHashIndex(spark, tmp("chaos-mh-idx"))
    index.write(Seq((0L, A)).toDF("doc_id", "text"))
    val ckpt = tmp("chaos-mh-ckpt")
    val sink = new ChaosSink
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingIngest.neardupIngest(
        mem.toDF().toDF("doc_id", "text"), index) { b =>
        sink.deliver(b.select($"doc_id").collect().map(_.getLong(0)).toSeq)
        sink.maybeCrash()
      }.option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      sink.crashNext = true
      // 1 near-dups history (drops); 10 is novel (survives to the sink)
      mem.addData((1L, A.replace("upsilon", "phi")), (10L, B))
      intercept[Exception](q1.processAllAvailable())
    } finally try q1.stop() catch { case _: Throwable => () }
    assert(sink.sunk.toSeq == Seq(10L))
    assert(index.sigs().select($"id").collect().map(_.getLong(0)).toSeq == Seq(0L),
      "10 must NOT be signed yet — the crash landed before append")

    val q2 = start()
    try {
      // replay of (1, 10), then a novel doc 11 ~ B (near-dup of the
      // REPLAYED batch's survivor — proves the replayed append landed)
      mem.addData((11L, B.replace("twenty", "thirty")))
      q2.processAllAvailable()
    } finally q2.stop()
    // 10 delivered twice (replay), never lost; 1 and 11 never delivered
    assert(sink.sunk.sorted.toSeq == Seq(10L, 10L))
    val ids = index.sigs().select($"id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(0L, 10L), s"index diverged: $ids")
    assert(ids.length == ids.distinct.length, "duplicate signature rows after replay")
  }

  test("embedNeardupIngest: crash between sink and index append, restart converges") {
    import graft.operators.AnnIndexStore
    import graft.operators.AnnIndexStore.{IvfParams, LshParams}
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    def twin(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, d) => if (d == 0) x + 0.01f else x }
    val bases = (0 until 40).map(i => (i.toLong, vec(i)))
    val store = new AnnIndexStore(spark, tmp("chaos-emb-idx"))
    store.write(bases.toDF("vec_id", "embedding"),
      LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val ckpt = tmp("chaos-emb-ckpt")
    val sink = new ChaosSink
    val mem = MemoryStream[(Long, Array[Float])]
    def start() = StreamingIngest.embedNeardupIngest(
        mem.toDF().toDF("vec_id", "embedding"), store, minCosine = 0.95) { b =>
        sink.deliver(b.select($"vec_id").collect().map(_.getLong(0)).toSeq)
        sink.maybeCrash()
      }.option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      sink.crashNext = true
      // 1003 semantically duplicates indexed base 3 (drops); 500 is
      // novel (survives to the sink, dies before the append)
      mem.addData((1003L, twin(bases(3)._2)), (500L, vec(907)))
      intercept[Exception](q1.processAllAvailable())
    } finally try q1.stop() catch { case _: Throwable => () }
    assert(sink.sunk.toSeq == Seq(500L))
    assert(store.indexedIds().count() == 40,
      "500 must NOT be indexed yet — the crash landed before append")

    val q2 = start()
    try {
      // replay of (1003, 500), then 1500 ~ 500 — a semantic dup of the
      // REPLAYED batch's survivor, provable only if the replayed append
      // landed
      mem.addData((1500L, twin(vec(907))))
      q2.processAllAvailable()
    } finally q2.stop()
    // 500 delivered twice (replay), never lost; 1003 and 1500 never
    assert(sink.sunk.sorted.toSeq == Seq(500L, 500L))
    val ids = store.indexedIds().collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == ((0L until 40L) :+ 500L).sorted, s"index diverged")
    assert(ids.length == ids.distinct.length, "duplicate index rows after replay")
  }

  test("clusterIngest: crashes in BOTH windows (pre-append, mid-append), restart converges") {
    import graft.operators.{ClusterIndex, Dedup, MinHashIndex}
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val B = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val C = "red orange yellow green blue indigo violet white black brown " +
      "pink gray maroon navy teal olive coral amber jade ruby"
    val b0 = Seq(0L -> A, 10L -> B)
    val b1 = Seq(1L -> A.replace("upsilon", "phi"), 20L -> C)  // crash window 1
    val b2 = Seq(11L -> B.replace("twenty", "thirty"))         // crash window 2
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val index = new MinHashIndex(spark, tmp("chaos-cl-mh"))
    val clusters = new ClusterIndex(spark, tmp("chaos-cl-ci"))
    index.write(df(b0))
    clusters.write(Dedup.minhashPairs(df(b0)).select($"id_a", $"id_b"))
    val ckpt = tmp("chaos-cl-ckpt")
    val sink = new ChaosSink
    // window 2: the sink ALSO merges the batch's edges before dying —
    // state after the crash = sink durable + clusters merged + the
    // signature index (the redelivery guard!) still unaware
    @volatile var mergeEdgesThenCrash = false
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingIngest.clusterIngest(
        mem.toDF().toDF("doc_id", "text"), index, clusters) { fresh =>
        sink.deliver(fresh.select($"doc_id").collect().map(_.getLong(0)).toSeq)
        if (mergeEdgesThenCrash) {
          mergeEdgesThenCrash = false
          // exactly the ingest's own edge computation, against the
          // same pre-append index state the crashed trigger saw
          val p = index.params
          val sigs = Dedup.minhashSignatures(fresh, p.n, p.k, "text", "doc_id")
          val edges = index.neardupeSigned(sigs, 0.5)
            .select($"batch_id".as("id_a"), $"index_id".as("id_b"))
            .unionByName(Dedup.minhashPairsFromSignatures(sigs, p.k, p.bands, 0.5)
              .select($"id_a", $"id_b"))
          clusters.append(edges)
          throw new RuntimeException("chaos: crashed after cluster merge, before sig append")
        }
        sink.maybeCrash()
      }.option("checkpointLocation", ckpt).start()

    // -- window 1: die after the sink, before EITHER index append
    val q1 = start()
    try {
      sink.crashNext = true
      mem.addData(b1: _*)
      intercept[Exception](q1.processAllAvailable())
    } finally try q1.stop() catch { case _: Throwable => () }
    assert(sink.sunk.sorted.toSeq == Seq(1L, 20L))
    assert(index.sigs().count() == 2, "no signature may land in window 1")

    // -- restart replays b1; then window 2 on b2: die after the sink
    //    AND the cluster merge, before the signature append
    val q2 = start()
    try {
      q2.processAllAvailable() // replay of b1 completes cleanly
      mergeEdgesThenCrash = true
      mem.addData(b2: _*)
      intercept[Exception](q2.processAllAvailable())
    } finally try q2.stop() catch { case _: Throwable => () }
    assert(index.sigs().select($"id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 10L, 20L), "b2 must not be signed yet in window 2")

    // -- final restart replays b2: the already-merged edges must no-op
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()

    // every doc reached the sink (replays allowed), none lost
    assert(sink.sunk.distinct.sorted.toSeq == Seq(1L, 11L, 20L))
    // the index holds each id exactly once
    val ids = index.sigs().select($"id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(0L, 1L, 10L, 11L, 20L))
    // and the assignment is EXACTLY the one-shot over everything seen —
    // the replayed cluster merge changed nothing
    val oneShot = Dedup.connectedComponents(
      Dedup.minhashPairs(df(b0 ++ b1 ++ b2)).select($"id_a", $"id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(clusters.assignment().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted == oneShot)
  }

  test("annIngest: replay of a fully-committed trigger no-ops (commit-log crash window)") {
    import graft.operators.AnnIndexStore
    import graft.operators.AnnIndexStore.{IvfParams, LshParams}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def slice(lo: Long, hi: Long) = emb.filter($"vec_id" >= lo && $"vec_id" < hi)
    def asData(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val store = new AnnIndexStore(spark, tmp("chaos-ann-idx"))
    store.write(slice(0L, 200L), LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val ckpt = tmp("chaos-ann-ckpt")
    val mem = MemoryStream[(Long, Array[Float])]
    def start() = StreamingIngest.annIngest(
      mem.toDF().toDF("vec_id", "embedding"), store)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      mem.addData(asData(slice(200L, 250L)): _*)
      q1.processAllAvailable()
    } finally stopAndAwait(q1)
    assert(store.versions == Seq(0L, 1L))
    // crash window: the append committed but the checkpoint commit
    // never landed — the restart replays the whole trigger
    dropLastCommit(ckpt)
    val q2 = start()
    try q2.processAllAvailable() finally stopAndAwait(q2)
    // the replayed append's delta empties => SkipCommit, no new version
    assert(store.versions == Seq(0L, 1L),
      "replayed trigger committed a duplicate index version")
    // and the index answers exactly like a crash-free full build
    val full = new AnnIndexStore(spark, tmp("chaos-ann-full"))
    full.write(slice(0L, 250L), LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(store.probeLsh(queries, k = 5)) == rows(full.probeLsh(queries, k = 5)))
  }

  test("statsIngest: replay of a fully-committed trigger no-ops via the batch tag") {
    import graft.operators.StatsIndex
    val store = new StatsIndex(spark, tmp("chaos-stats-idx"))
    val b0 = Seq((0L, "web", "alpha beta gamma"), (1L, "books", "one two"))
      .toDF("doc_id", "source", "text")
    store.write(b0)
    val ckpt = tmp("chaos-stats-ckpt")
    val mem = MemoryStream[(Long, String, String)]
    def start() = StreamingIngest.statsIngest(
      mem.toDF().toDF("doc_id", "source", "text"), store)
      .option("checkpointLocation", ckpt).start()

    val later = Seq((2L, "web", "alpha delta"), (3L, "wiki", "five six seven"))
    val q1 = start()
    try {
      mem.addData(later: _*)
      q1.processAllAvailable()
    } finally stopAndAwait(q1)
    val before = store.report().collect().toSeq
    // crash window: partials committed, checkpoint commit lost
    dropLastCommit(ckpt)
    val q2 = start()
    try q2.processAllAvailable() finally stopAndAwait(q2)
    // the tag makes the replayed append a no-op: additive sums (n_docs,
    // token totals) would silently double without it
    assert(store.report().collect().toSeq == before,
      "replayed trigger double-counted the data card")
    val full = new StatsIndex(spark, tmp("chaos-stats-full"))
    full.write(b0.unionByName(later.toDF("doc_id", "source", "text")))
    assert(store.report().collect().toSeq == full.report().collect().toSeq)
  }

  test("ingestToStore + rollup: crash between store commit and refresh, restart heals the rollup WITHOUT new data") {
    import graft.engine.{ContinuousAggregate, TimeSeriesStore}
    import graft.model.TS
    import org.apache.spark.sql.functions._
    val DAY = 86400000L
    val store = new TimeSeriesStore(spark, tmp("chaos-ing-store"))
    val agg = new ContinuousAggregate(spark, store, tmp("chaos-ing-cagg"))
    val ckpt = tmp("chaos-ing-ckpt")
    def shape() = agg.read()
      .select("g_day", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    def recompute() = store.current().groupBy(col("g_day"), col("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"), max(col("value")).as("max_val"))
      .select("g_day", "tag", "cnt", "sum_val", "min_val", "max_val")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val mem = MemoryStream[TS]
    def start() = StreamingIngest.ingestToStore(mem.toDS(), store, Seq(agg))
      .option("checkpointLocation", ckpt).start()

    // trigger 1 lands cleanly: store v0, rollup reflecting it
    val q1 = start()
    try {
      mem.addData(TS(0L, "a", 1.0), TS(DAY, "b", 2.0))
      q1.processAllAvailable()
    } finally stopAndAwait(q1)
    assert(agg.reflectedStoreVersion.contains(store.version))

    // the crash window: trigger 2's `store.insert` COMMITTED but the
    // process died before `rollup.refresh()`. Simulate by committing
    // the batch out-of-band (that IS the crashed trigger's store half)
    // while the checkpoint still owes the batch a replay.
    val batch2 = Seq(TS(DAY + 5, "b", 7.0), TS(2 * DAY, "c", 9.0))
    assert(store.insert(batch2.toDS()).isRight)
    assert(!agg.reflectedStoreVersion.contains(store.version),
      "precondition: rollup is stale relative to the committed batch")
    mem.addData(batch2: _*)

    // restart; the replayed trigger's left-anti dedupe finds NOTHING
    // fresh (its own rows are already committed) — the exact shape
    // that used to skip the refresh and leave the rollup stale until
    // the next non-empty trigger (forever, on a quiesced stream)
    val q2 = start()
    try q2.processAllAvailable() finally stopAndAwait(q2)
    assert(agg.reflectedStoreVersion.contains(store.version),
      "replayed trigger must refresh the rollup despite an empty fresh set")
    assert(shape() == recompute(),
      "rollup must reflect the crashed trigger's committed batch")
    // and the store itself took no duplicates from the replay
    assert(store.current().count() == 4)
  }

  test("ingestToStore + MULTIPLE rollups: a crashed trigger's replay heals every registered grain") {
    // one store maintaining daily+hourly concurrently (the deployment
    // shape the Seq parameter exists for): the crash window must not
    // leave the grains disagreeing about which store version they
    // reflect — a half-healed pair would route a query to whichever
    // grain happens to be eligible, so both must converge on restart
    import graft.engine.{ContinuousAggregate, QueryEngine, TimeSeriesStore}
    import graft.model.{Agg, GroupBy, QueryModel, TS}
    import org.apache.spark.sql.functions._
    val DAY = 86400000L
    val store = new TimeSeriesStore(spark, tmp("chaos-mr-store"))
    val daily = new ContinuousAggregate(spark, store, tmp("chaos-mr-d"))
    val hourly = new ContinuousAggregate(spark, store, tmp("chaos-mr-h"),
      bucketMs = 3600000L)
    val ckpt = tmp("chaos-mr-ckpt")
    val mem = MemoryStream[TS]
    def start() = StreamingIngest.ingestToStore(mem.toDS(), store,
      Seq(daily, hourly)).option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      mem.addData(TS(0L, "a", 1.0), TS(DAY + 3600000L, "b", 2.0))
      q1.processAllAvailable()
    } finally stopAndAwait(q1)
    assert(daily.reflectedStoreVersion.contains(store.version))
    assert(hourly.reflectedStoreVersion.contains(store.version))

    // crash window: the store half of trigger 2 committed, process
    // died before EITHER refresh ran
    val batch2 = Seq(TS(2 * DAY, "c", 9.0), TS(3600000L, "a", 4.0))
    assert(store.insert(batch2.toDS()).isRight)
    assert(!daily.reflectedStoreVersion.contains(store.version) &&
      !hourly.reflectedStoreVersion.contains(store.version))
    mem.addData(batch2: _*)

    val q2 = start()
    try q2.processAllAvailable() finally stopAndAwait(q2)
    Seq("daily" -> daily, "hourly" -> hourly).foreach { case (n, r) =>
      assert(r.reflectedStoreVersion.contains(store.version),
        s"$n rollup not healed by the replayed trigger")
    }
    // the healed pair routes correctly through the engine: day-aligned
    // query served by the coarsest (daily) grain, with the raw answer
    val qm = QueryModel(ge = Some(0L), lt = Some(3 * DAY),
      aggFunc = Some(Agg.Sum), groupBy = Some(GroupBy.Tag))
    val routed = QueryEngine.execute(store, qm, Seq(daily, hourly))
      .toOption.get
    assert(routed.queryExecution.executedPlan.toString.contains("chaos-mr-d"),
      "coarsest eligible grain must serve the routed query")
    assert(routed.collect().map(_.toSeq).toSeq ==
      QueryEngine.execute(store.current(), qm).toOption.get
        .collect().map(_.toSeq).toSeq)
    assert(store.current().count() == 4)
  }

  test("driftIngest: a replayed trigger re-reports identically (stateless path)") {
    import graft.operators.{DriftRef, Quality}
    val refCorpus = (0 until 40)
      .map(i => (i.toLong, s"reference doc $i plain words ${"x " * (i % 7)}"))
      .toDF("doc_id", "text")
    val store = new DriftRef(spark, tmp("chaos-drift-ref"))
    store.write(refCorpus)
    val ckpt = tmp("chaos-drift-ckpt")
    val b1 = Seq((100L, "fresh batch one normal words here"),
      (101L, "more ordinary content flowing in"))
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[org.apache.spark.sql.Row])]
    val mem = MemoryStream[(Long, String)]
    def start() = StreamingIngest.driftIngest(
        mem.toDF().toDF("doc_id", "text"), store) { (id, rep) =>
        reports.synchronized { reports += ((id, rep.collect().toSeq)) }
      }.option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      mem.addData(b1: _*)
      q1.processAllAvailable()
    } finally stopAndAwait(q1)
    dropLastCommit(ckpt)
    val q2 = start()
    try q2.processAllAvailable() finally stopAndAwait(q2)
    // stateless monitor: the replay re-reports the SAME batch id with
    // the SAME frame — alerting dedupes on batch id, nothing corrupts
    assert(reports.size == 2)
    assert(reports(0) == reports(1))
    assert(reports(0)._2 ==
      Quality.drift(refCorpus, b1.toDF("doc_id", "text")).collect().toSeq)
  }

  test("livenessMonitor: GroupState (last beat, count) survives a stop/restart") {
    val ckpt = tmp("graft-chaos-liveness")
    val mem = MemoryStream[(Long, Long)]
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    def start() = StreamingIngest.livenessMonitor(
        mem.toDF().toDF("user_id", "t"), tolMs = 10000L, watermark = "0 seconds")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamingIngest.LivenessEvent], _: Long) =>
          val rows = batch.collect().map(e => (e.key, e.state, e.at, e.n_beats))
          sunk.synchronized { sunk ++= rows; () }
      }.option("checkpointLocation", ckpt).outputMode("append").start()
    // run 1: key 1 goes up; its state (lastBeat 6000, nBeats 2) is only
    // in the checkpoint when the query dies
    val q1 = start()
    try {
      mem.addData((1L, 1000L), (1L, 6000L))
      q1.processAllAvailable()
      assert(sunk.synchronized(sunk.toSeq) == Seq((1L, "up", 1000L, 1L)))
    } finally stopAndAwait(q1)
    // run 2: key 2 advances the watermark; key 1's timeout must fire
    // with RUN-1's recovered state — down at 6000+tol with n_beats 2,
    // neither of which exists anywhere but the state store
    val q2 = start()
    try {
      mem.addData((2L, 100000L))
      q2.processAllAvailable()
      mem.addData((2L, 101000L))
      q2.processAllAvailable()
      val got = sunk.synchronized(sunk.toSeq).sortBy(e => (e._1, e._3))
      assert(got.filter(_._1 == 1L) ==
        Seq((1L, "up", 1000L, 1L), (1L, "down", 16000L, 2L)))
      assert(got.filter(_._1 == 2L) == Seq((2L, "up", 100000L, 1L)))
    } finally stopAndAwait(q2)
  }

  test("livenessMonitor: a replayed trigger rolls state back — no double-counted beats") {
    val ckpt = tmp("graft-chaos-liveness-replay")
    val mem = MemoryStream[(Long, Long)]
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    @volatile var crashNext = false
    def start() = StreamingIngest.livenessMonitor(
        mem.toDF().toDF("user_id", "t"), tolMs = 10000L, watermark = "0 seconds")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamingIngest.LivenessEvent], _: Long) =>
          val rows = batch.collect().map(e => (e.state, e.at, e.n_beats))
          sunk.synchronized { sunk ++= rows; () }
          if (crashNext && rows.nonEmpty) {
            crashNext = false
            throw new RuntimeException("chaos: crashed after sink, before commit")
          }
      }.option("checkpointLocation", ckpt).outputMode("append").start()
    // crash DURING the data batch, after its rows reached the sink: the
    // state store already committed the batch's state version, but the
    // batch never commits — the restart must REPLAY it against the
    // rolled-back state version
    crashNext = true
    val q1 = start()
    try {
      mem.addData((5L, 1000L), (5L, 30000L)) // intra-batch gap: up,down,up
      intercept[Exception](q1.processAllAvailable())
    } finally stopAndAwait(q1)
    val firstDelivery = sunk.synchronized(sunk.toSeq).sortBy(_._2)
    assert(firstDelivery ==
      Seq(("up", 1000L, 1L), ("down", 11000L, 1L), ("up", 30000L, 2L)))
    // the replay re-processes the same beats against the ROLLED-BACK
    // state: the SAME three transitions with the SAME n_beats 1/1/2
    // re-delivered (at-least-once sink) — state that survived the
    // uncommitted trigger would re-up at n_beats 4
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = sunk.synchronized(sunk.toSeq).sortBy(_._2)
      assert(got == (firstDelivery ++ firstDelivery).sortBy(_._2))
    } finally stopAndAwait(q2)
  }
}

package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** Cadenced maintenance for the streaming index family: a long-running
  * stream grows its store's append chain one delta directory per
  * trigger (and the ClusterIndex read fold pays one remap JOIN per
  * directory), so the ingest wrappers accept `compactEvery` — every
  * N-th non-empty trigger folds the chain and vacuums superseded
  * versions. These specs pin the two things that must hold:
  * maintenance changes NO answers (results equal a one-shot build),
  * and it actually bounds the chain (version count shrinks to the
  * compacted survivor). Plus the one place cadence interacts with
  * at-least-once replay: StatsIndex's tag-based idempotence must
  * survive compact+vacuum (tags fold forward), proven end-to-end with
  * a commit-log replay.
  */
class StreamingMaintenanceSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def stopAndAwait(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    try q.stop() catch { case _: Throwable => () }
    val deadline = System.currentTimeMillis() + 30000
    while (spark.streams.active.exists(_.id == q.id) &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
  }

  private def dropLastCommit(ckpt: String): Unit = {
    val dir = java.nio.file.Paths.get(ckpt, "commits")
    val files = java.nio.file.Files.list(dir)
    val last = try files.iterator().asScala
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    finally files.close()
    java.nio.file.Files.delete(last)
    java.nio.file.Files.deleteIfExists(
      last.resolveSibling(s".${last.getFileName}.crc"))
  }

  test("clusterIngest with compactEvery: answers unchanged, chain bounded") {
    import graft.operators.{ClusterIndex, Dedup, MinHashIndex}
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val B = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val C = "red orange yellow green blue indigo violet white black brown " +
      "pink gray maroon navy teal olive coral amber jade ruby"
    val b0 = Seq(0L -> A, 10L -> B)
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val index = new MinHashIndex(spark, tmp("maint-cl-mh"))
    val clusters = new ClusterIndex(spark, tmp("maint-cl-ci"))
    index.write(df(b0))
    clusters.write(Dedup.minhashPairs(df(b0)).select($"id_a", $"id_b"))
    val mem = MemoryStream[(Long, String)]
    val batches = Seq(
      Seq(1L -> A.replace("upsilon", "phi"), 20L -> C),
      Seq(11L -> B.replace("twenty", "thirty")),
      Seq(21L -> C.replace("ruby", "pearl")),
      Seq(2L -> A.replace("alpha", "omega")))
    val q = StreamingIngest.clusterIngest(
      mem.toDF().toDF("doc_id", "text"), index, clusters,
      compactEvery = 2, vacuumRetentionMs = 0L)().start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally stopAndAwait(q)
    // trigger 4 ran the last compact+vacuum(0): only the compacted
    // survivors remain probeable in BOTH stores
    assert(clusters.versions.size == 1,
      s"cluster chain not bounded: ${clusters.versions}")
    assert(index.versions.size == 1,
      s"signature chain not bounded: ${index.versions}")
    // and maintenance changed nothing: assignment == one-shot CC over
    // everything seen, signatures complete
    val all = b0 ++ batches.flatten
    val oneShot = Dedup.connectedComponents(
      Dedup.minhashPairs(df(all)).select($"id_a", $"id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(clusters.assignment().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted == oneShot)
    assert(index.sigs().select($"id").collect().map(_.getLong(0)).sorted.toSeq
      == all.map(_._1).sorted)
  }

  test("annIngest with compactEvery: probes unchanged, chain bounded") {
    import graft.operators.AnnIndexStore
    import graft.operators.AnnIndexStore.{IvfParams, LshParams}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def slice(lo: Long, hi: Long) = emb.filter($"vec_id" >= lo && $"vec_id" < hi)
    def asData(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val store = new AnnIndexStore(spark, tmp("maint-ann"))
    store.write(slice(0L, 200L), LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingIngest.annIngest(
      mem.toDF().toDF("vec_id", "embedding"), store,
      compactEvery = 2, vacuumRetentionMs = 0L).start()
    try {
      mem.addData(asData(slice(200L, 250L)): _*); q.processAllAvailable()
      mem.addData(asData(slice(250L, 300L)): _*); q.processAllAvailable()
    } finally stopAndAwait(q)
    assert(store.versions.size == 1,
      s"ann chain not bounded: ${store.versions}")
    val full = new AnnIndexStore(spark, tmp("maint-ann-full"))
    full.write(slice(0L, 300L), LshParams(8, 4, 64), IvfParams(8, 1, 64))
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(store.probeLsh(queries, k = 5)) == rows(full.probeLsh(queries, k = 5)))
  }

  test("statsIngest cadence + commit-log replay: tags survive the fold, no double count") {
    import graft.operators.StatsIndex
    val store = new StatsIndex(spark, tmp("maint-stats"))
    val b0 = Seq((0L, "web", "alpha beta gamma"), (1L, "books", "one two"))
      .toDF("doc_id", "source", "text")
    store.write(b0)
    val ckpt = tmp("maint-stats-ckpt")
    val mem = MemoryStream[(Long, String, String)]
    def start() = StreamingIngest.statsIngest(
      mem.toDF().toDF("doc_id", "source", "text"), store,
      compactEvery = 1, vacuumRetentionMs = 0L)
      .option("checkpointLocation", ckpt).start()
    val later = Seq((2L, "web", "alpha delta"), (3L, "wiki", "five six seven"))
    val q1 = start()
    try {
      mem.addData(later: _*)
      q1.processAllAvailable()
    } finally stopAndAwait(q1)
    // every trigger compacts + vacuums at retention 0: the tagged
    // append version is already reaped, its tag folded forward
    assert(store.versions.size == 1)
    val before = store.report().collect().toSeq
    // the worst-case replay: commit lost AFTER compact+vacuum erased
    // the tagged version — only the folded tags.txt can save the
    // additive sums from double-counting
    dropLastCommit(ckpt)
    val q2 = start()
    try q2.processAllAvailable() finally stopAndAwait(q2)
    assert(store.report().collect().toSeq == before,
      "replayed trigger double-counted after cadenced compact+vacuum")
    val full = new StatsIndex(spark, tmp("maint-stats-full"))
    full.write(b0.unionByName(later.toDF("doc_id", "source", "text")))
    assert(store.report().collect().toSeq == full.report().collect().toSeq)
  }
}

package graft.streaming

import graft.model.TS
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming ingest: the streaming generalization of the
  * reference's synchronous HTTP batch ingest + "group by timestamp"
  * aggregation (SURVEY.md §2.8 disposition; north_star in BASELINE.json).
  *
  * The reference has no streaming semantics to match, so these are
  * defined Spark-first and validated against their batch equivalents
  * (exactly-once per window under watermarked event time):
  *   - [[withEventTime]]  : TS rows (epoch-millis Long) → event-time col
  *   - [[dedupeStream]]   : the S1 (timestamp, tag) uniqueness constraint
  *                          applied on-stream within the watermark
  *   - [[tumblingAgg]]    : per-(window, tag) count/sum/min/max
  *   - [[slidingAgg]]     : overlapping windows
  *   - [[runningStats]]   : arbitrary per-tag state via
  *                          flatMapGroupsWithState (count/sum/max so far)
  *
  * Scale notes: state size is bounded by the watermark (late data beyond
  * it is dropped); the shuffle key is (window, tag) — at 100 TB/day the
  * tag cardinality spreads state across executors, and checkpointing
  * (Parquet/HDFS-backed) gives the durability acid-state's WAL gave the
  * reference.
  */
object StreamingIngest {

  /** Per-query maintenance cadence for the persisted index stores:
    * every `every`-th non-empty trigger is "due", at which point the
    * ingest folds the store's append chain ([[graft.operators
    * .Versioned]]-style `compact()`) and reaps superseded versions
    * (`vacuum(retention)`). Without a cadence a long-running stream
    * grows its chain one delta directory per trigger — the
    * ClusterIndex read fold pays one broadcast remap join PER dir, so
    * 10k triggers means 10k joins in every assignment read; compaction
    * is what keeps read cost a function of DATA, not of ingest
    * history. The counter is per-started-query and in-memory: a
    * restart resets the cadence, never the data (compaction is
    * idempotent I/O, not semantics), and maintenance runs AFTER the
    * trigger's own append, so the sink-first crash-window ordering
    * argument is untouched — a crash mid-compact just leaves the
    * pre-compact version live and its staging dir for the stale reap.
    */
  private final class Cadence(every: Int) {
    require(every >= 0, s"compactEvery=$every must be >= 0 (0 disables)")
    private val n = new java.util.concurrent.atomic.AtomicLong(0L)
    def due(): Boolean = every > 0 && n.incrementAndGet() % every == 0
  }

  /** Adds `event_time` (TimestampType) derived from the Long
    * epoch-millis `timestamp` column.
    */
  def withEventTime(ts: DataFrame): DataFrame =
    ts.withColumn("event_time", timestamp_millis(col("timestamp")))

  /** Drop duplicate (timestamp, tag) keys on-stream — the ingest
    * uniqueness rule (reference validInsert, Queries.hs:76-77) under a
    * watermark bound.
    */
  def dedupeStream(ts: DataFrame, watermark: String = "10 minutes"): DataFrame =
    withEventTime(ts)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("timestamp", "tag")

  /** Tumbling-window aggregate per tag. Output columns:
    * (window_start: Long millis, tag, cnt, sum_val, min_val, max_val).
    */
  def tumblingAgg(ts: DataFrame, window: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame =
    withEventTime(ts)
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window), col("tag"))
      .agg(count(lit(1)).cast("double").as("cnt"),
        sum(col("value")).as("sum_val"),
        min(col("value")).as("min_val"),
        max(col("value")).as("max_val"))
      .select(unix_millis(col("window.start")).as("window_start"), col("tag"),
        col("cnt"), col("sum_val"), col("min_val"), col("max_val"))

  /** Tumbling-window OHLC bars per tag on-stream (the streaming twin
    * of [[graft.operators.TsAnalytics.ohlc]]): open/close picked by
    * min_by/max_by over the event time — declarative aggregates, so
    * the window state stays one row per (window, tag) regardless of
    * tick volume. Same column contract as the batch operator.
    */
  def ohlcAgg(ts: DataFrame, window: String = "1 hour",
              watermark: String = "10 minutes"): DataFrame =
    withEventTime(ts)
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window), col("tag"))
      .agg(min_by(col("value"), col("timestamp")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("timestamp")).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(unix_millis(col("window.start")).as("bucket_start"), col("tag"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))

  /** Sliding-window aggregate per tag (window `size`, sliding every
    * `slide`).
    */
  def slidingAgg(ts: DataFrame, size: String = "1 hour", slide: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    withEventTime(ts)
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), size, slide), col("tag"))
      .agg(count(lit(1)).cast("double").as("cnt"), sum(col("value")).as("sum_val"))
      .select(unix_millis(col("window.start")).as("window_start"), col("tag"),
        col("cnt"), col("sum_val"))

  /** Session windows per tag: rows within `gap` of each other merge
    * into one session (works in batch and, with the watermark, in
    * streaming). Output: (session_start, session_end millis, tag, cnt,
    * sum_val).
    */
  def sessionAgg(ts: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    withEventTime(ts)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("tag"))
      .agg(count(lit(1)).cast("double").as("cnt"), sum(col("value")).as("sum_val"))
      .select(unix_millis(col("session_window.start")).as("session_start"),
        unix_millis(col("session_window.end")).as("session_end"),
        col("tag"), col("cnt"), col("sum_val"))

  /** Watermarked stream-stream interval join: pairs each left row with
    * every right row of the same `keys` whose event time lies in
    * `[left_time - lookbackMs, left_time]` — the streaming analogue of
    * the tolerance as-of join ([[graft.operators.AsOfJoin]]). Streaming
    * emits ALL in-interval matches rather than only the latest prior:
    * picking one would mean holding every left row until its watermark
    * expires; downstream can reduce if it wants the max.
    *
    * Both sides carry watermarks AND the join has a time-range
    * condition, which is exactly what lets Spark bound and expire the
    * join state as watermarks advance — without the range, state grows
    * forever. Input frames are TS-shaped (`timestamp` epoch millis);
    * right value columns come back `r_`-prefixed.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   lookbackMs: Long, watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    // keyless stream-stream range joins need a different state layout
    // (range partitioning); fail with intent, not empty.reduceLeft
    require(keys.nonEmpty, "intervalJoin requires at least one join key " +
      "(for keyless as-of semantics see AsOfJoin's range-partition note)")
    // a negative lookback is an unsatisfiable interval — every row
    // would silently vanish
    require(lookbackMs >= 0, s"intervalJoin: lookbackMs=$lookbackMs must be >= 0")
    val l = withEventTime(left)
      .withColumnRenamed("event_time", "l_time")
      .withWatermark("l_time", watermark)
    // right keys renamed so the join condition is unambiguous; value
    // columns come back r_-prefixed
    val r0 = withEventTime(right).withColumnRenamed("event_time", "r_time")
    val valueCols = r0.columns.filterNot(c => keys.contains(c) || c == "r_time").toSeq
    val prefixed = valueCols.map("r_" + _)
    // name every collision: within the prefixed set, against the
    // renamed event-time columns, and against the left side's columns
    val outCols = prefixed :+ "r_time"
    val clash = (outCols.diff(outCols.distinct) ++
      outCols.intersect(l.columns.toSeq)).distinct
    require(clash.isEmpty,
      s"intervalJoin: output column collision: ${clash.mkString(", ")}")
    val r = r0.select(keys.map(k => col(k).as(s"__rk_$k")) ++ Seq(col("r_time")) ++
        valueCols.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("r_time", watermark)
    // leftOuter emits unmatched left rows (null right columns) once the
    // watermark passes them — the lossless as-of analogue; inner is the
    // classic enrichment join
    l.join(r,
      keys.map(k => col(k) === col(s"__rk_$k")).reduce(_ && _) &&
        col("r_time") >= col("l_time") - expr(s"INTERVAL $lookbackMs MILLISECOND") &&
        col("r_time") <= col("l_time"),
      joinType)
      .drop(keys.map(k => s"__rk_$k"): _*)
  }

  /** Streaming ingestion into a [[graft.engine.TimeSeriesStore]]:
    * each micro-batch is deduped against itself and the store, then
    * appended through the store's all-or-nothing insert — the streaming
    * generalization of the reference's synchronous batch POST. Rows
    * whose (timestamp, tag) already exist are dropped, not errored
    * (at-least-once sources redeliver; idempotent ingest is the
    * streaming analogue of the reference's uniqueness rejection).
    * Returns the ready-to-start writer.
    */
  def ingestToStore(ts: Dataset[TS], store: graft.engine.TimeSeriesStore,
                    rollups: Seq[graft.engine.ContinuousAggregate] = Nil,
                    compactEvery: Int = 0, vacuumRetentionMs: Long = 3600000L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    // refresh finest-grain first: a HIERARCHICAL parent refolds its
    // child only when the child already reflects the trigger's store
    // version — out of order it would silently (correctly, but
    // expensively) fall back to raw events every trigger. Finer never
    // depends on coarser, so grain order is always safe.
    val ordered = rollups.sortBy(_.grainMs)
    ts.toDF().writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      val spark = batch.sparkSession
      import spark.implicits._
      val fresh = batch.dropDuplicates("timestamp", "tag")
        .join(store.current(), Seq("timestamp", "tag"), "left_anti")
        .as[TS]
      if (!fresh.isEmpty) {
        store.insert(fresh).left.foreach(e =>
          throw new IllegalStateException(e.message))
      }
      // continuous-aggregate freshness rides the ingest trigger:
      // refresh cost is O(this batch's days) (manifest diff), so
      // per-trigger is the right cadence. The refresh sits OUTSIDE the
      // fresh-rows guard: a trigger that crashed after `store.insert`
      // committed but before the refresh replays with an EMPTY fresh
      // set (the left-anti dedupe finds its own committed rows), and a
      // guarded refresh would leave the rollup stale until the next
      // non-empty trigger — forever, on a quiesced stream. Unguarded,
      // the replay refreshes the committed batch in; on a genuinely
      // idle trigger it is a version-compare no-op (one manifest read).
      ordered.foreach(_.refresh())
      // cadenced maintenance, AFTER the trigger's own work (same
      // rationale as the index-ingest family): each insert adds a
      // store segment and each refresh a rollup delta segment, so an
      // unmaintained long-running ingest makes every read union one
      // dir per trigger. Compaction is I/O-only — answers unchanged.
      if (cadence.due()) {
        store.compact()
        // reflect the compacted store version BEFORE vacuum: content
        // ids make this refresh recompute zero days while advancing
        // the rollup's diff base past the compact, so the manifest
        // reap below can no longer strand the base and silently
        // degrade every later refresh to a full recompute (the
        // zero-retention maintenance mode hit this every cycle)
        ordered.foreach(_.refresh())
        store.vacuum(vacuumRetentionMs)
        ordered.foreach { r => r.compact(); r.vacuum(vacuumRetentionMs) }
      }
    }}
  }

  /** Content-digest exact dedup on a DOCUMENT stream — the streaming
    * form of [[graft.operators.Dedup.exactByDigest]]: a doc whose text
    * digest was already seen within the watermark horizon is dropped.
    * State holds 32-byte sha-256 digests (plus the key bookkeeping),
    * never document text, so state size is rows-seen × O(digest) no
    * matter how large the documents are — the same shuffle-digests-not-
    * text reasoning as the batch path, applied to the state store. The
    * watermark bounds state for an unbounded corpus feed; an exact
    * forever-dedup is a batch [[graft.operators.Dedup]] concern, not a
    * stream-state one. Requires an event-time column `eventTimeCol`
    * (TimestampType).
    */
  def dedupeDocsByDigest(docs: DataFrame, eventTimeCol: String,
                         textCol: String = "text",
                         watermark: String = "10 minutes"): DataFrame =
    // unhex: sha2 returns 64 HEX CHARS — keying state on the raw
    // 32-byte binary halves the documented state-key footprint
    docs.withColumn("digest", unhex(sha2(col(textCol).cast("binary"), 256)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("digest")
      .drop("digest")

  /** Streaming maintenance of a persisted [[graft.operators
    * .AnnIndexStore]]: each micro-batch of (vec_id, embedding) rows is
    * appended as an incremental index version — delta-cost hashing and
    * centroid assignment, manifest-reuse of every prior posting file —
    * so the searchable index trails the stream by one micro-batch
    * without ever paying corpus-scale rebuild cost. Empty micro-batches
    * commit nothing (no empty index versions from idle triggers).
    * Returns the ready-to-start writer.
    */
  def annIngest(vectors: DataFrame, store: graft.operators.AnnIndexStore,
                vecCol: String = "embedding", idCol: String = "vec_id",
                compactEvery: Int = 0, vacuumRetentionMs: Long = 3600000L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    vectors.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) {
        store.append(batch, vecCol, idCol)
        if (cadence.due()) { store.compact(); store.vacuum(vacuumRetentionMs); () }
      }
    }}
  }

  /** Streaming exact-dedup ingest against a persisted
    * [[graft.operators.DigestIndex]] — the FOREVER-exact path
    * ([[dedupeDocsByDigest]] is exact only within its watermark
    * horizon; this one's state is the persisted index, unbounded in
    * time and batch-cost per trigger). Each micro-batch drops in-batch
    * text duplicates, then rows whose content digest is already
    * indexed, hands the survivors to `writeBatch` and ONLY THEN
    * appends their digests — the sink-first ordering
    * [[neardupIngest]] uses, for the same at-least-once reason: a
    * crash between sink and append re-runs the whole trigger on
    * restart (digests not yet indexed), re-invoking the idempotent
    * sink; a crash after the append re-runs into an all-dropped batch
    * whose sink delivery already happened. Empty micro-batches commit
    * nothing.
    */
  def dedupIngest(docs: DataFrame, index: graft.operators.DigestIndex,
                  textCol: String = "text", compactEvery: Int = 0,
                  vacuumRetentionMs: Long = 3600000L)
                 (writeBatch: DataFrame => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) {
        // trigger-scoped materialization: consumed by isEmpty, the
        // sink AND the append
        val survivors = graft.Materialize.ephemeral(
          index.dedupe(batch.dropDuplicates(textCol), textCol))
        if (!survivors.isEmpty) {
          writeBatch(survivors) // sink first — see the ordering note above
          index.append(survivors, textCol)
          if (cadence.due()) { index.compact(); index.vacuum(vacuumRetentionMs); () }
        }
      }
    }}
  }

  /** Streaming multimodal near-dup ingest against a persisted
    * [[graft.operators.PhashIndex]]: each micro-batch of (media_id,
    * phash) rows drops in-batch hash duplicates, then rows within
    * `maxHamming` of ANYTHING ever indexed, hands the survivors to
    * `writeBatch` and ONLY THEN appends their hashes — the
    * [[dedupIngest]] sink-first ordering, same at-least-once argument:
    * a crash between sink and append re-runs the trigger (hashes not
    * yet indexed → same survivors, idempotent sink re-invoked); a
    * crash after the append re-runs into an all-dropped batch whose
    * delivery already happened, and the id-keyed append anti-join
    * makes the re-append a no-op. Hash upstream with
    * [[graft.operators.Multimodal.imageHashes]]/[[graft.operators
    * .Multimodal.audioHashes]] — this ingest sees 8-byte hashes, never
    * media bytes.
    */
  def phashIngest(hashes: DataFrame, index: graft.operators.PhashIndex,
                  maxHamming: Int = 3, compactEvery: Int = 0,
                  vacuumRetentionMs: Long = 3600000L)
                 (writeBatch: DataFrame => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    hashes.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) {
        val survivors = graft.Materialize.ephemeral(
          index.dedupe(batch.dropDuplicates("phash"), maxHamming))
        if (!survivors.isEmpty) {
          writeBatch(survivors) // sink first — see the ordering note above
          index.append(survivors)
          if (cadence.due()) { index.compact(); index.vacuum(vacuumRetentionMs); () }
        }
      }
    }}
  }

  /** Streaming maintenance of a persisted [[graft.operators
    * .StatsIndex]]: each micro-batch commits its per-source partial
    * rows (batch-scale aggregation, |sources| stored rows), so the
    * corpus data card trails the stream by one micro-batch without
    * ever re-scanning history — the [[annIngest]] shape for corpus
    * statistics. Empty micro-batches commit nothing.
    */
  def statsIngest(docs: DataFrame, index: graft.operators.StatsIndex,
                  textCol: String = "text", sourceCol: String = "source",
                  streamTag: String = "stats", compactEvery: Int = 0,
                  vacuumRetentionMs: Long = 3600000L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) => graft.Materialize.inTriggerScope {
      // foreachBatch is at-least-once: the tag makes a replayed
      // trigger's append a no-op instead of double-counting its
      // partials into the additive sums forever. streamTag scopes the
      // ids — give each query writing one index its own value.
      if (!batch.isEmpty) {
        index.append(batch, textCol, sourceCol,
          tag = Some(s"$streamTag-$batchId"))
        if (cadence.due()) { index.compact(); index.vacuum(vacuumRetentionMs); () }
      }
    }}
  }

  /** Streaming near-dup-filtered ingest against a persisted
    * [[graft.operators.MinHashIndex]]: each micro-batch (1) drops rows
    * whose id is already indexed (redelivery idempotence — the same
    * anti-join move as [[ingestToStore]], so a restart-from-checkpoint
    * re-run is a no-op), (2) probes the SURVIVING rows against history
    * ([[graft.operators.MinHashIndex.neardupe]] — batch-only signing,
    * band-join against stored postings) and drops near-dup hits, then
    * (3) hands the surviving rows to `writeBatch` and ONLY THEN
    * appends their signatures as an incremental index version. That
    * order is load-bearing for at-least-once delivery: were the append
    * first, a crash between append and sink would leave the rows
    * indexed, so the restart's redelivery anti-join would drop them
    * before `writeBatch` ever saw them — indexed but lost from the
    * sink forever. Sink-first means a crash between the two re-runs
    * the whole trigger on restart (ids not yet indexed), re-invoking
    * `writeBatch` on the same rows — the standard foreachBatch
    * contract (`writeBatch` must be idempotent per batch, as
    * [[ingestToStore]]'s sink is). The survivors frame is materialized
    * once ([[graft.Materialize]]) so the isEmpty probe, the sink write
    * and the append sign one computed batch instead of re-running the
    * corpus-side anti-joins three times. History is never re-signed;
    * each trigger pays batch cost — the near-dup form of
    * [[dedupeDocsByDigest]] with no watermark horizon (the index IS
    * the forever state) and the maintenance shape of [[annIngest]].
    * Empty micro-batches commit nothing.
    */
  def neardupIngest(docs: DataFrame, index: graft.operators.MinHashIndex,
                    minEstJaccard: Double = 0.5,
                    textCol: String = "text", idCol: String = "doc_id",
                    compactEvery: Int = 0, vacuumRetentionMs: Long = 3600000L)
                   (writeBatch: DataFrame => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) {
        // materialized (trigger-scoped — Materialize.ephemeral, never
        // reliable checkpoints: those leak per trigger, unbounded):
        // feeds the neardupe probe AND the survivors anti-join — one
        // corpus-side sigs scan, not two
        val fresh = graft.Materialize.ephemeral(batch.dropDuplicates(idCol)
          .join(index.sigs().select(col("id").as(idCol)), Seq(idCol), "left_anti"))
        val hits = index.neardupe(fresh, minEstJaccard,
            textCol = textCol, idCol = idCol)
          .select(col("batch_id").as(idCol)).distinct()
        // materialized: consumed by isEmpty, the sink AND the append
        val survivors = graft.Materialize.ephemeral(
          fresh.join(hits, Seq(idCol), "left_anti"))
        if (!survivors.isEmpty) {
          writeBatch(survivors) // sink first — see the ordering note above
          index.append(survivors, textCol, idCol)
          if (cadence.due()) { index.compact(); index.vacuum(vacuumRetentionMs); () }
        }
      }
    }}
  }

  /** Streaming EMBEDDING near-dup ingest — the semantic-dedup form of
    * [[neardupIngest]] (incremental SemDeDup: a new doc semantically
    * duplicating ANY indexed doc is dropped at batch cost): each
    * micro-batch (1) drops rows whose id is already indexed
    * (redelivery idempotence — [[graft.operators.AnnIndexStore
    * .indexedIds]] anti-join, the same restart-is-a-no-op move as the
    * MinHash path), (2) probes the remaining rows' embeddings against
    * the persisted ANN index and drops rows whose nearest indexed
    * neighbor scores ≥ `minCosine` (IVF-pruned inverted-list probes —
    * nprobe/nlist of the corpus, never a corpus scan), then (3) hands
    * the survivors to `writeBatch` and ONLY THEN (4) appends them as
    * an incremental index version — the sink-first ordering and the
    * maintenance cadence exactly as [[neardupIngest]]. WITHIN-batch
    * semantic dups are deliberately not dropped here (they arrive
    * together; [[graft.operators.Similarity.cosineNearDupSemantic]] is
    * the in-corpus batch tool) — cross-BATCH dedup against everything
    * ever indexed is this op's contract. Recall is the IVF probe's
    * (gated in AnnIndexSpec); a missed near-dup admits a duplicate,
    * never corrupts state. Empty micro-batches commit nothing.
    */
  def embedNeardupIngest(vectors: DataFrame, store: graft.operators.AnnIndexStore,
                         minCosine: Double, nprobe: Int = 8,
                         vecCol: String = "embedding", idCol: String = "vec_id",
                         compactEvery: Int = 0, vacuumRetentionMs: Long = 3600000L)
                        (writeBatch: DataFrame => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    vectors.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) {
        val fresh = graft.Materialize.ephemeral(batch.dropDuplicates(idCol)
          .join(store.indexedIds().withColumnRenamed("vec_id", idCol),
            Seq(idCol), "left_anti"))
        if (!fresh.isEmpty) {
          // neardupHits, not probeIvf: the probe* methods collect their
          // probe rows driver-side (small-query-batch contract) — a
          // micro-batch can be corpus-sized, so the hit decision must
          // stay fully distributed
          val hits = store.neardupHits(fresh, minCosine, nprobe,
              vecCol = vecCol, idCol = idCol)
            .select(col("query_id").as(idCol))
          val survivors = graft.Materialize.ephemeral(
            fresh.join(hits, Seq(idCol), "left_anti"))
          if (!survivors.isEmpty) {
            writeBatch(survivors) // sink first — the neardupIngest argument
            store.append(survivors, vecCol, idCol)
            if (cadence.due()) { store.compact(); store.vacuum(vacuumRetentionMs); () }
          }
        }
      }
    }}
  }

  /** Streaming CLUSTER maintenance: the keep-everything complement of
    * [[neardupIngest]] (which drops near-dups before its sink). Every
    * micro-batch is signed ONCE; the signatures feed BOTH edge sources
    * — in-batch pairs (`Dedup.minhashPairsFromSignatures`) and
    * batch-vs-history hits (`MinHashIndex.neardupeSigned`) — whose
    * union merges into the persisted [[graft.operators.ClusterIndex]]
    * at batch cost, after which the batch itself is appended to the
    * MinHash index as the next batches' history. All rows reach
    * `writeBatch`; duplicate-cluster RESOLUTION happens later, at
    * training-set construction, via `clusters.survivors()` — the
    * streaming form of the `x_dedup_clusters_incremental` batch path,
    * and exactly its semantics (ClusterIndexSpec's one-shot-equality
    * law carries over because the edge sets coincide).
    *
    * Ordering is load-bearing for at-least-once delivery: sink first
    * (the [[dedupIngest]] argument), then cluster edges, then the
    * signature index LAST — the signature append is what makes a
    * restart's redelivery anti-join drop the batch, so everything
    * before it must already be durable; any crash earlier re-runs the
    * whole trigger (idempotent: the sink by contract, the cluster
    * merge because replayed edges change no assignments, the index
    * append by its own anti-join). Empty micro-batches commit nothing.
    */
  def clusterIngest(docs: DataFrame, index: graft.operators.MinHashIndex,
                    clusters: graft.operators.ClusterIndex,
                    minEstJaccard: Double = 0.5,
                    textCol: String = "text", idCol: String = "doc_id",
                    compactEvery: Int = 0, vacuumRetentionMs: Long = 3600000L)
                   (writeBatch: DataFrame => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cadence = new Cadence(compactEvery)
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) {
        val fresh = graft.Materialize.ephemeral(batch.dropDuplicates(idCol)
          .join(index.sigs().select(col("id").as(idCol)), Seq(idCol), "left_anti"))
        if (!fresh.isEmpty) {
          val p = index.params
          val sigs = graft.Materialize.ephemeral(graft.operators.Dedup
            .minhashSignatures(fresh, p.n, p.k, textCol, idCol))
          val edges = index.neardupeSigned(sigs, minEstJaccard)
            .select(col("batch_id").as("id_a"), col("index_id").as("id_b"))
            .unionByName(graft.operators.Dedup
              .minhashPairsFromSignatures(sigs, p.k, p.bands, minEstJaccard)
              .select(col("id_a"), col("id_b")))
          writeBatch(fresh) // sink first — see the ordering note above
          clusters.append(edges)
          // the SAME signatures index the batch — appendSigned skips
          // the second explode+k-agg signing append() would pay
          index.appendSigned(sigs)
          if (cadence.due()) {
            // both stores fold on the same cadence: the cluster read
            // cost grows a remap JOIN per trigger, the sig chain a
            // directory per trigger
            clusters.compact(); clusters.vacuum(vacuumRetentionMs)
            index.compact(); index.vacuum(vacuumRetentionMs); ()
          }
        }
      }
    }}
  }

  /** On-stream benchmark decontamination: every micro-batch of
    * documents is scrubbed against the STATIC eval set with the exact
    * batch operator ([[graft.operators.Contamination.scrub]] —
    * broadcast eval shingles, corpus side never shuffled on shingles)
    * before reaching the sink. foreachBatch is deliberate: the batch
    * scrub IS the semantics, so the streaming path cannot drift from
    * the oracle-checked batch path — the same reasoning as
    * [[ingestToStore]]. Stateless across batches (a doc's
    * contamination depends only on itself and the eval set), so no
    * watermark and no state store; survivors are handed to
    * `writeBatch`.
    */
  def decontaminatedIngest(docs: DataFrame, evalSet: DataFrame, n: Int = 8,
                           maxOverlap: Double = 0.0)(writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty)
        writeBatch(graft.operators.Contamination.scrub(batch, evalSet, n, maxOverlap))
    }}

  /** Streaming quality-filter ingest: each micro-batch is scored by
    * the TRAINED classifier's scan-stage column ([[graft.operators
    * .QualityModel.score]] — weights ride the plan as a literal) and
    * docs at or above `threshold` are admitted to the sink. Stateless
    * across triggers (a doc's score depends only on itself and the
    * frozen model) — no watermark, no state store; the batch operator
    * IS the streaming semantics (the [[decontaminatedIngest]]
    * reasoning), so the spec-gated batch scorer can't drift from the
    * streamed one. Model refreshes are a REDEPLOY (new literal, new
    * query), which is the auditable behavior a curation gate wants —
    * no silent mid-stream model drift.
    */
  def qualityFilterIngest(docs: DataFrame,
                          model: graft.operators.QualityModel.Model,
                          threshold: Double = 0.5, textCol: String = "text")
                         (writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty)
        writeBatch(batch.filter(
          graft.operators.QualityModel.score(col(textCol), model) >= threshold))
    }}

  /** Streaming quality-drift monitor: every micro-batch is PSI'd
    * against a PERSISTED reference band snapshot
    * ([[graft.operators.DriftRef]] — the reference corpus banded once
    * at snapshot time, never per trigger) and the bins-row report is
    * handed to `onReport` — the admit/alert hook a pipeline wires to
    * its gating or paging. The batch operator is the semantics
    * (the [[decontaminatedIngest]] reasoning): [[graft.operators
    * .DriftRef.psi]] runs literally the same banding + PSI frame as
    * the oracle-checked `Quality.drift`, so the streaming monitor
    * cannot diverge from the batch one. Stateless across triggers
    * (a batch's drift depends only on itself and the snapshot) — no
    * watermark, no state store; per-trigger cost is one banding scan
    * over the batch. Empty micro-batches report nothing (a PSI of
    * nothing-against-reference is noise, not signal).
    */
  def driftIngest(docs: DataFrame, ref: graft.operators.DriftRef,
                  textCol: String = "text")
                 (onReport: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) => graft.Materialize.inTriggerScope {
      if (!batch.isEmpty) onReport(batchId, ref.psi(batch, textCol))
    }}

  /** Streaming frequent tokens: a global Misra-Gries aggregation over
    * the token stream, state = ONE capacity-bounded summary regardless
    * of stream length or vocabulary (contrast a streaming
    * `groupBy(token).count()`, whose state store grows with the
    * observed vocabulary — unbounded on web text). Each trigger emits
    * the current summary in Complete mode; the MG bounds (est ≤ true,
    * undercount ≤ N/(capacity+1), retention of anything above that
    * bar) hold across batch boundaries because the state IS a merged
    * MG summary ([[graft.functions.MgOps.merge]] is how partials fold).
    * While distinct tokens seen stay under `capacity`, the emitted
    * counts are exact.
    */
  def streamingTopTokens(docs: DataFrame, capacity: Int = 256,
                         textCol: String = "text"): DataFrame = {
    graft.functions.FreqFunctions.register(docs.sparkSession)
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .agg(graft.functions.FreqFunctions.misraGries(col("token"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item").as("token"), col("e.est").as("est"))
  }

  /** A user's funnel progress: highest stage reached (1-based; 0 =
    * nothing yet) and when they reached it.
    */
  final case class FunnelProgress(user_id: Long, stage: Int, reached_at: Long)

  /** Streaming funnel: per-user stage state carried across
    * micro-batches (state = ONE (stage, reachedAt) pair per user —
    * never an event list, so power users can't skew executor memory).
    * Each batch's events fold in time order through the same
    * strictly-after rule as the batch operator
    * ([[graft.operators.Funnel.funnel]]): greedy earliest-advance over
    * in-order events is equivalent to the conditional-min chain, so a
    * stream delivered in event-time order converges to exactly the
    * batch result (pinned in StreamingSpec). Late cross-batch events
    * can under-advance — bound disorder upstream with a watermark if
    * the source reorders. Emits a row per user whose stage advanced.
    */
  def streamingFunnel(events: DataFrame, stages: Seq[String])
      : Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "streamingFunnel: stages must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("t").cast("long"),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long), FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[(Int, Long)]) =>
          val evs = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
          var (st, at) = state.getOption.getOrElse((0, Long.MinValue))
          var changed = false
          evs.foreach { case (t, ty) =>
            if (st < stages.length && ty == stages(st) && t > at) {
              st += 1; at = t; changed = true
            }
          }
          if (changed) {
            state.update((st, at))
            Iterator.single(FunnelProgress(user, st, at))
          } else Iterator.empty
      }
  }

  /** One liveness transition emitted by [[livenessMonitor]]. */
  final case class LivenessEvent(key: Long, state: String, at: Long, n_beats: Long)
  // NOT private: the state encoder's generated code must reach the
  // constructor
  final case class LiveState(lastBeat: Long, up: Boolean, nBeats: Long)

  /** Streaming down-detection — the monitoring feature a TSDB's alert
    * path is built on, and the streaming counterpart of
    * [[graft.operators.TsAnalytics.liveRanges]]: each key's heartbeats
    * keep it UP; when the event-time watermark passes
    * `lastBeat + tolMs` with no newer beat, the key transitions DOWN.
    * Emits one row per transition:
    *   - `up` at the beat that (re)opens a live range,
    *   - `down` at `lastBeat + tolMs` — the exact end liveRanges
    *     assigns, so in-order replay produces the batch intervals
    *     (each live range ↦ up at range_start, down at range_end; the
    *     final down only once the watermark passes it) — pinned in
    *     StreamingSpec.
    * Intra-batch gaps > tolMs emit the down/up pair directly; the
    * timeout (GroupStateTimeout.EventTimeTimeout) covers gaps that
    * span triggers. A late beat landing after its key was declared
    * down re-ups at the beat's own time (monitor view — a stream
    * cannot retract an emitted alert); bound disorder with the
    * watermark. The down state is kept (not removed) so `n_beats`
    * stays cumulative across ranges.
    *
    * Scale shape: state is three scalars per key — no event lists —
    * and the shuffle is the single groupByKey hash exchange.
    */
  def livenessMonitor(beats: DataFrame, tolMs: Long,
      watermark: String = "10 minutes"): Dataset[LivenessEvent] = {
    require(tolMs > 0, "livenessMonitor: tolMs must be positive")
    val spark = beats.sparkSession
    import spark.implicits._
    beats.select(col("user_id").cast("long").as("k"), col("t").cast("long"),
        timestamp_millis(col("t").cast("long")).as("event_time"))
      .withWatermark("event_time", watermark)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LiveState, LivenessEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (k, rows, state: GroupState[LiveState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastBeat + tol with no newer beat
            val s = state.get
            state.update(s.copy(up = false))
            Iterator.single(LivenessEvent(k, "down", s.lastBeat + tolMs, s.nBeats))
          } else {
            val ts = rows.map(_._2).toArray.sorted
            val out = Array.newBuilder[LivenessEvent]
            var st = state.getOption
              .getOrElse(LiveState(Long.MinValue, up = false, 0L))
            ts.foreach { t =>
              if (!st.up) {
                st = LiveState(t, up = true, st.nBeats + 1)
                out += LivenessEvent(k, "up", t, st.nBeats)
              } else if (t - st.lastBeat > tolMs) {
                out += LivenessEvent(k, "down", st.lastBeat + tolMs, st.nBeats)
                st = LiveState(t, up = true, st.nBeats + 1)
                out += LivenessEvent(k, "up", t, st.nBeats)
              } else {
                st = LiveState(math.max(st.lastBeat, t), up = true,
                  st.nBeats + 1)
              }
            }
            state.update(st)
            // a timeout timestamp at/behind the watermark is illegal —
            // clamp forward; the down, when it fires, still reports
            // lastBeat + tol
            state.setTimeoutTimestamp(
              math.max(st.lastBeat + tolMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }

  /** Per-tag running statistics carried across micro-batches. */
  final case class TagStats(tag: String, n: Long, total: Double, maxValue: Double)

  /** Custom streaming state via flatMapGroupsWithState: emits the
    * updated running stats for every tag touched by a micro-batch.
    */
  def runningStats(ts: Dataset[TS]): Dataset[TagStats] = {
    import ts.sparkSession.implicits._
    ts.groupByKey(_.tag)
      .flatMapGroupsWithState[TagStats, TagStats](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (tag, rows, state: GroupState[TagStats]) =>
          val prev = state.getOption.getOrElse(TagStats(tag, 0L, 0.0, Double.NegativeInfinity))
          val batch = rows.toSeq
          val next = TagStats(tag,
            prev.n + batch.size,
            prev.total + batch.map(_.value).sum,
            math.max(prev.maxValue, if (batch.isEmpty) Double.NegativeInfinity else batch.map(_.value).max))
          state.update(next)
          Iterator.single(next)
      }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap

/** Durable NEAR-dup index: persisted MinHash band postings that let a
  * new batch find its near-duplicates against EVERYTHING ingested
  * before at batch cost — the near-dup companion to [[DigestIndex]]
  * (exact) and the cross-snapshot form of [[Dedup.minhashPairs]]
  * (which re-signs the WHOLE corpus every run; at 100 TB with daily
  * ingest, near-dup-against-history is the operation a training-data
  * pipeline runs most often, and it must pay batch-scale, not
  * corpus-scale).
  *
  * Commit protocol: [[Versioned]] (staged-complete version dirs, atomic
  * slot CAS, rebase-retry — racing appends compose). Layout:
  *
  * ```
  * path/
  *   v<N>/sigs/        (id, sig: array<long>[k])      id-sorted
  *   v<N>/postings/    (band, band_hash, id)          hash-clustered
  *   v<N>/tombstones/  (id)                           deletes only
  *   v<N>/params.json  {"n":…,"k":…,"bands":…}        pinned at write
  *   v<N>/manifest.txt root-relative dirs composing the version
  * ```
  *
  * The live version is the highest `v<N>` with a manifest; the atomic
  * slot rename is the commit point ([[Versioned]]).
  *
  * [[append]] signs ONLY its batch (manifest reuses every prior
  * directory — the [[AnnIndexStore.append]] move), so probes against
  * `write(c); append(d)` equal probes against `write(c ∪ d)`: the
  * hashes are deterministic literal-seeded xxhash64 of the pinned
  * params ([[Dedup.bandHashes]] is the shared definition). A probe
  * ([[neardupe]]) signs only the query batch and equi-joins its banded
  * rows against the stored postings on (band, band_hash) — the
  * postings side streams from parquet, the batch side is
  * batch-scale (AQE broadcasts it when it fits), and only surviving
  * candidate pairs rejoin the wide signatures for the Jaccard
  * estimate. Per-probe cost is proportional to the batch and its
  * candidates, never the corpus.
  */
final class MinHashIndex(spark: SparkSession, pathStr: String) {
  import MinHashIndex._

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  def versions: Seq[Long] = Versioned.listVersions(root)

  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.txt")

  private def pinVersion(): Long = currentVersion.getOrElse(
    throw new IllegalStateException(s"no minhash index committed at $root"))

  /** Sign `docs` and commit them as the first version (or a full
    * rebuild under new params). Returns the committed version.
    */
  def write(docs: DataFrame, params: Params = Params(),
            textCol: String = "text", idCol: String = "doc_id"): Long = synchronized {
    require(params.k % params.bands == 0,
      s"bands=${params.bands} must divide k=${params.k}")
    Versioned.commitWithRetry(root, "manifest.txt") { (_, slot, staging) =>
      stageDelta(docs, params, textCol, idCol, staging)
      Files.writeString(staging.resolve("params.json"), params.toJson)
      Files.writeString(staging.resolve("manifest.txt"),
        Seq(s"v$slot/sigs", s"v$slot/postings").mkString("", "\n", "\n"))
    }
  }

  /** Index a new batch incrementally: sign ONLY the batch under the
    * pinned params, commit a version whose manifest = the base's
    * directories + the delta directories. History is never re-signed.
    *
    * Redelivery-idempotent (the [[DigestIndex.append]] /
    * [[AnnIndexStore.append]] contract): in-batch id repeats collapse
    * and already-indexed ids drop via an anti-join against the base
    * chain's effective id set, so `append(b); append(b)` commits
    * nothing the second time and `write(c); append(d)` probes equal to
    * `write(c ∪ d)` for OVERLAPPING ids too, not just disjoint ones.
    * Without the guard a replayed at-least-once trigger would store
    * duplicate sigs rows, and [[neardupe]]'s signature rejoin would
    * fan out into duplicated (batch_id, index_id) candidate rows.
    * Deleted ids are NOT in the effective set ([[sigs]] replays
    * tombstones), so re-appending after a takedown indexes afresh.
    */
  def append(docs: DataFrame,
             textCol: String = "text", idCol: String = "doc_id"): Long = synchronized {
    pinVersion() // fail fast before staging anything
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no minhash index committed at $root"))
      val st = state(base)
      // materialized ONCE (mode-appropriate: reliable when
      // graft.checkpointDir is set and this is a batch append,
      // demoted to trigger-scoped inside streaming loops — the
      // Materialize.inTriggerScope contract): the anti-join scans the
      // full sigs chain, and without this both the emptiness probe
      // and stageDelta's two writes would re-run it — the same
      // double-evaluation AnnIndexStore.append avoids with its
      // write-then-re-read move
      val fresh = graft.Materialize.checkpoint(docs.dropDuplicates(idCol)
        .join(sigs(Some(base)).select(col("id").as("__indexed_id")),
          col(idCol) === col("__indexed_id"), "left_anti"))
      // a fully-redelivered batch empties the delta: SKIP the commit —
      // publishing it would grow the chain with zero-row parquet dirs
      // that later chain reads can't re-read (no files to infer a
      // schema from). The emptiness probe is batch-scale: the batch
      // anti-joins the indexed-id scan, never the reverse.
      if (fresh.isEmpty)
        throw Versioned.SkipCommit("empty delta — every id already indexed")
      stageDelta(fresh, st.params, textCol, idCol, staging)
      Files.writeString(staging.resolve("params.json"), st.params.toJson)
      Files.writeString(staging.resolve("manifest.txt"),
        (st.manifest ++ Seq(s"v$slot/sigs", s"v$slot/postings"))
          .mkString("", "\n", "\n"))
    }
  }

  /** Write one version's sigs + postings into `staging`. The postings
    * are derived by re-READING the just-written sigs parquet — the
    * signature stage (shingle explode + k-agg) runs once, with durable
    * materialization instead of a lineage checkpoint.
    */
  private def stageDelta(docs: DataFrame, params: Params,
                         textCol: String, idCol: String, staging: Path): Unit =
    stageDeltaFromSigs(
      Dedup.minhashSignatures(docs, params.n, params.k, textCol, idCol),
      params, staging)

  private def stageDeltaFromSigs(sigFrame: DataFrame, params: Params,
                                 staging: Path): Unit = {
    val r = params.k / params.bands
    sigFrame
      .repartition(col("id")).sortWithinPartitions(col("id"))
      .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("sigs").toString)
    val stored = spark.read.parquet(staging.resolve("sigs").toString)
    Dedup.bandedRows(stored, params.bands, r)
      .repartition(col("band_hash"))
      .sortWithinPartitions(col("band"), col("band_hash"))
      .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("postings").toString)
  }

  /** All effective (id, sig) rows — also the indexed-id set an ingest
    * uses for redelivery idempotence. Manifest order is event order:
    * sig directories fold as unions, tombstone directories
    * ([[delete]]) as id-subtractions, so delete-then-reingest replays
    * correctly (a global subtract would wrongly drop the re-add).
    */
  def sigs(version: Option[Long] = None): DataFrame =
    foldDirs(state(version.getOrElse(pinVersion())), _.endsWith("/sigs"))

  private def postings(version: Long): DataFrame =
    foldDirs(state(version), _.endsWith("/postings"))

  /** Replay one component's manifest chain ([[Versioned.replayChain]]):
    * `keep` dirs union in order; tombstone dirs anti-join on `id`
    * (both sigs and postings carry the doc id).
    */
  private def foldDirs(st: VersionState, keep: String => Boolean): DataFrame =
    Versioned.replayChain(root,
      st.manifest.filter(d => keep(d) || d.endsWith("/tombstones")), "id")(
      d => spark.read.parquet(root.resolve(d).toString))

  /** Remove ids from the index — the takedown path: deleted documents
    * stop appearing as near-dup hits, and a later [[append]] of the
    * same id indexes it afresh. Commits a version whose manifest = the
    * base's chain + a batch-scale id tombstone directory (semi-joined
    * so only ids actually indexed are stored); [[compact]] folds the
    * chain through the tombstones and drops them physically. Returns
    * the committed version.
    */
  def delete(ids: DataFrame, idCol: String = "doc_id"): Long = synchronized {
    pinVersion() // fail fast before staging anything
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no minhash index committed at $root"))
      val st = state(base)
      ids.select(col(idCol).cast("long").as("id")).distinct()
        .join(sigs(Some(base)).select(col("id")), Seq("id"), "left_semi")
        .repartition(col("id")).sortWithinPartitions(col("id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("tombstones").toString)
      Files.writeString(staging.resolve("params.json"), st.params.toJson)
      Files.writeString(staging.resolve("manifest.txt"),
        (st.manifest :+ s"v$slot/tombstones").mkString("", "\n", "\n"))
    }
  }

  /** Near-duplicate candidates of `batch` AGAINST THE INDEX:
    * (batch_id, index_id, est_jaccard), est ≥ `minEstJaccard`, ordered.
    * Only the batch is signed; rows whose ids collide with an indexed
    * id are treated as redeliveries, not near-dups (batch_id =!=
    * index_id) — in-batch near-dup is [[Dedup.minhashPairs]]'s job,
    * mirroring [[DigestIndex.dedupe]]'s contract. `bucketCap` drops
    * degenerate INDEX-side buckets (counted + logged) exactly like the
    * one-shot path.
    */
  def neardupe(batch: DataFrame, minEstJaccard: Double = 0.5,
               bucketCap: Int = 200,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // resolve the live version ONCE and thread it through every read
    // (params, postings, sigs) — re-resolving mid-probe could band the
    // batch under one version's params and join another version's
    // postings if a concurrent write() commits between the reads
    // (the AnnIndexStore pin contract)
    val pinned = pinVersion()
    val p = state(pinned).params
    // batch-only signature compute — the whole point of the index;
    // feeds both the banding join and the Jaccard-estimate rejoin.
    // Mode-appropriate materialization: reliable under a configured
    // checkpoint dir for batch probes; inside streaming loops
    // (neardupIngest) the trigger scope demotes it to localCheckpoint
    // so reliable dirs can't leak one per trigger
    probeSigned(pinned, graft.Materialize.checkpoint(
      Dedup.minhashSignatures(batch, p.n, p.k, textCol, idCol)),
      minEstJaccard, bucketCap)
  }

  /** The live version's pinned build parameters — what a caller must
    * sign with to use [[neardupeSigned]] / [[appendSigned]].
    */
  def params: MinHashIndex.Params = state(pinVersion()).params

  /** [[append]] with the batch ALREADY signed under this index's
    * [[params]] (the [[neardupeSigned]] move applied to indexing): an
    * ingest trigger that signed its batch once for the edge sources
    * hands the same frame here instead of paying the explode+k-agg
    * signature stage a second time. The redelivery-idempotence
    * invariant is preserved with id-only work — in-batch id repeats
    * collapse and already-indexed ids anti-join out of the SIGNATURE
    * frame (narrow: no text, no re-signing); empty delta SkipCommits.
    */
  def appendSigned(bSigs: DataFrame): Long = synchronized {
    pinVersion() // fail fast before staging anything
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no minhash index committed at $root"))
      val st = state(base)
      val fresh = graft.Materialize.checkpoint(bSigs.dropDuplicates("id")
        .join(sigs(Some(base)).select(col("id")), Seq("id"), "left_anti"))
      if (fresh.isEmpty)
        throw Versioned.SkipCommit("empty delta — every id already indexed")
      stageDeltaFromSigs(fresh, st.params, staging)
      Files.writeString(staging.resolve("params.json"), st.params.toJson)
      Files.writeString(staging.resolve("manifest.txt"),
        (st.manifest ++ Seq(s"v$slot/sigs", s"v$slot/postings"))
          .mkString("", "\n", "\n"))
    }
  }

  /** [[neardupe]] with the batch ALREADY signed (an (id, sig) frame
    * from `Dedup.minhashSignatures` under THIS index's [[params]],
    * materialized by the caller) — for ingest paths that need the same
    * batch's signatures more than once (in-batch pairs + this probe
    * from ONE signing; the signature stage is the probe's dominant
    * cost). Contract: the signatures must match the live version's
    * params — under a concurrent rebuild changing params this races,
    * so signed probes assume the single-writer discipline the ingest
    * wrappers already follow.
    */
  def neardupeSigned(bSigs: DataFrame, minEstJaccard: Double = 0.5,
                     bucketCap: Int = 200): DataFrame =
    probeSigned(pinVersion(), bSigs, minEstJaccard, bucketCap)

  private def probeSigned(pinned: Long, bSigs: DataFrame,
                          minEstJaccard: Double, bucketCap: Int): DataFrame = {
    val p = state(pinned).params
    val r = p.k / p.bands
    val bBanded = Dedup.bandedRows(bSigs, p.bands, r)

    // skew guard on the INDEX side, restricted to buckets the batch
    // touches (a semi-join keeps the count scan probe-sized): a
    // degenerate bucket with B postings × b batch rows explodes the
    // candidate set. Tiny by construction → collected + logged.
    val store = postings(pinned)
    val overloaded = store
      .join(bBanded.select(col("band"), col("band_hash")).distinct(),
        Seq("band", "band_hash"), "left_semi")
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > bucketCap)
    val overRows = overloaded.collect()
    if (overRows.nonEmpty)
      System.err.println(s"[graft] MinHashIndex.neardupe: dropping ${overRows.length} " +
        s"bucket(s) over bucketCap=$bucketCap " +
        s"(${overRows.map(_.getLong(2)).sum} postings) — pairs inside them are not compared")
    import spark.implicits._
    val overDf = overRows.map(x => (x.getInt(0), x.getLong(1))).toSeq
      .toDF("band", "band_hash")

    // the LSH probe: narrow equi-join, candidate pairs deduped BEFORE
    // the wide signatures rejoin (same byte discipline as minhashPairs)
    val cand = store.join(broadcast(overDf), Seq("band", "band_hash"), "left_anti")
      .withColumnRenamed("id", "index_id")
      .join(bBanded.withColumnRenamed("id", "batch_id"), Seq("band", "band_hash"))
      .filter(col("batch_id") =!= col("index_id"))
      .select(col("batch_id"), col("index_id"))
      .dropDuplicates("batch_id", "index_id")

    cand
      .join(bSigs.select(col("id").as("batch_id"), col("sig").as("sig_b")), "batch_id")
      .join(sigs(Some(pinned))
        .select(col("id").as("index_id"), col("sig").as("sig_i")), "index_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_b"), col("sig_i"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / p.k)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("batch_id"), col("index_id"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy(col("batch_id"), col("index_id"))
  }

  /** Fold the append chain into ONE sigs + ONE postings directory
    * (I/O-only — nothing is re-signed, so probes against the compacted
    * version are identical by construction). Returns the version.
    */
  def compact(): Long = synchronized {
    val base = pinVersion()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val b = baseOpt.getOrElse(base)
      sigs(Some(b))
        .repartition(col("id")).sortWithinPartitions(col("id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("sigs").toString)
      postings(b)
        .repartition(col("band_hash"))
        .sortWithinPartitions(col("band"), col("band_hash"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("postings").toString)
      Files.writeString(staging.resolve("params.json"), state(b).params.toJson)
      Files.writeString(staging.resolve("manifest.txt"),
        Seq(s"v$slot/sigs", s"v$slot/postings").mkString("", "\n", "\n"))
    }
  }

  /** Reclaim superseded versions older than `retentionMs` (never a
    * directory the live version's manifest references) plus crash
    * residue (stale staging dirs) —
    * the [[DigestIndex.vacuum]] contract. Returns versions made
    * unprobeable.
    */
  def vacuum(retentionMs: Long = 3600000L): Int = synchronized {
    require(retentionMs >= 0, s"vacuum: retentionMs=$retentionMs must be >= 0")
    val cutoff = System.currentTimeMillis() - retentionMs
    val cur = currentVersion.getOrElse(-1L)
    val live: Set[String] = if (cur < 0) Set.empty else manifestDirs(cur).toSet
    var removed = 0
    versions.filter(_ < cur).foreach { v =>
      val dir = root.resolve(s"v$v")
      if (Files.getLastModifiedTime(dir).toMillis < cutoff) {
        val probeable = Files.exists(dir.resolve("manifest.txt"))
        Seq("sigs", "postings", "tombstones")
          .filterNot(c => live.contains(s"v$v/$c"))
          .foreach(c => graft.Fs.deleteTree(dir.resolve(c)))
        Files.deleteIfExists(dir.resolve("manifest.txt"))
        Files.deleteIfExists(dir.resolve("params.json"))
        val children = Files.list(dir)
        val empty = try !children.iterator().hasNext finally children.close()
        if (empty) Files.delete(dir)
        stateCache.remove(v)
        if (probeable) removed += 1
      }
    }
    Versioned.reapStaleStaging(root, cutoff)
    removed
  }

  /** Per-version pinned state: params + the ordered manifest chain. */
  private final case class VersionState(params: Params, manifest: Seq[String])

  private val stateCache = TrieMap.empty[Long, VersionState]

  private def state(version: Long): VersionState =
    stateCache.getOrElseUpdate(version,
      VersionState(Params.read(root.resolve(s"v$version").resolve("params.json")),
        manifestDirs(version)))

  private def manifestDirs(version: Long): Seq[String] = {
    val mf = root.resolve(s"v$version").resolve("manifest.txt")
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"v$version at $root has no manifest.txt — not a probeable version " +
          "(vacuumed, foreign, or never committed)")
    Files.readString(mf).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

object MinHashIndex {
  /** MinHash/LSH build parameters, pinned at [[MinHashIndex.write]]:
    * shingle width `n`, signature length `k`, band count `bands`
    * (bands must divide k; rows per band = k/bands).
    */
  final case class Params(n: Int = 3, k: Int = 64, bands: Int = 16) {
    def toJson: String = s"""{"n":$n,"k":$k,"bands":$bands}"""
  }

  object Params {
    def read(p: Path): Params = {
      val txt = Files.readString(p)
      def num(key: String): Int =
        s""""$key":(\\d+)""".r.findFirstMatchIn(txt)
          .getOrElse(throw new IllegalStateException(s"params.json missing $key"))
          .group(1).toInt
      Params(num("n"), num("k"), num("bands"))
    }
  }
}

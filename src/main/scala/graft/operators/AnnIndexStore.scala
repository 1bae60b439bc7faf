package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Durable, versioned ANN index store: the on-disk form of
  * [[Similarity.buildLshIndex]] / [[Similarity.buildIvfIndex]], probed
  * across sessions and restarts without re-hashing the corpus.
  *
  * Layout (commit protocol: [[Versioned]] — each version staged
  * COMPLETE and claimed with one atomic rename, racing writers collide
  * loudly on the slot and rebase-retry, torn version dirs impossible;
  * the index analogue of [[graft.engine.TimeSeriesStore]]'s manifest
  * CAS):
  *
  * ```
  * path/
  *   v<N>/vectors/        (vec_id, v)           sorted by vec_id
  *   v<N>/lsh/tbl=<t>/    (bucket, vec_id)      sorted by bucket
  *   v<N>/ivf_centroids/  (cent_id, cv)         tiny (nlist rows)
  *   v<N>/ivf/            (cent_id, vec_id)     sorted by cent_id
  *   v<N>/tombstones/     (vec_id)              deletes only, kept current
  *   v<N>/params.json     LSH/IVF parameters the index was built with
  *   v<N>/manifest.json   root-relative data dirs composing the version
  * ```
  *
  * The live version is the highest `v<N>` with a manifest; the atomic
  * slot rename is the commit point ([[Versioned]]).
  *
  * A version's data is the UNION of the directories its manifest lists —
  * [[write]] lists only its own dirs (full build), [[append]] lists the
  * previous version's dirs PLUS its own delta dirs. That makes ingest
  * incremental: appending a batch hashes/assigns ONLY the batch (the
  * manifest-reuse move of the table store's partition-scoped mutations),
  * never the corpus — at 100 TB with daily ingest, the append costs
  * batch-scale, not corpus-scale.
  *
  * Scale notes (100 TB): postings are NARROW — the LSH table stores
  * (bucket, vec_id) under hive partitions `tbl=<t>`, NOT the vectors
  * (which a per-table copy would duplicate `tables`×); vectors live
  * once, sorted by vec_id. A probe (a) buckets only the query batch,
  * (b) collects its tiny (tbl, bucket) set and pushes it into the
  * postings scan — directory pruning on `tbl`, row-group min/max
  * skipping on the sorted `bucket` — and (c) joins the surviving
  * candidates (broadcast) against the vectors table. Per-probe cost is
  * proportional to the buckets touched, never the corpus. Probe state
  * that is fixed per committed version — parsed params, the (tiny)
  * centroid table, the vectors/postings DataFrame handles — is cached
  * in the store instance keyed by version, so repeated probes skip the
  * per-call params/footer re-reads; a [[write]]/[[append]] commits a
  * NEW version and therefore a new cache key, readers undisturbed.
  */
final class AnnIndexStore(spark: SparkSession, pathStr: String) {
  import AnnIndexStore._

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  /** Version directories present on disk, ascending. After a [[vacuum]]
    * this can include superseded versions retained only because a later
    * append still references their data files (their manifest is gone —
    * they are no longer probeable, just data holders).
    */
  def versions: Seq[Long] = Versioned.listVersions(root)

  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.json")

  /** Resolve the live version exactly once per probe and thread the
    * pinned version's cached state through every read — re-resolving
    * mid-probe could mix one version's hyperplane params with another
    * version's postings if a concurrent [[write]] commits between the
    * reads.
    */
  private def pinVersion(): Long =
    currentVersion.getOrElse(
      throw new IllegalStateException(s"no ANN index committed at $root"))

  /** Build ALL index structures over `corpus` — LSH postings, IVF
    * lists, and the IVF-PQ coded lists — and commit them as one new
    * version. Returns the committed version number.
    */
  def write(corpus: DataFrame, lsh: LshParams = LshParams(),
            ivf: IvfParams = IvfParams(), pq: PqParams = PqParams(),
            vecCol: String = "embedding", idCol: String = "vec_id"): Long = synchronized {
    Versioned.commitWithRetry(root, "manifest.json") { (_, slot, staging) =>
      // ids are canonically LONG on disk (callers may pass int ids; the
      // probes extract them driver-side as longs) and UNIQUE — the same
      // in-batch dedup append() applies: a duplicate id would put two
      // rows in every probe's top-k, and worse, Pq.encode's per-id code
      // assembly would fold both copies into one 2m-length code whose
      // probe-time LUT lookups run off the end (an ANSI error killing
      // every later probePq)
      val canon = corpus.withColumn(idCol, col(idCol).cast("long"))
        .dropDuplicates(idCol)
      val vectors = canon.select(col(idCol).as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("v"))

      // vectors once, sorted by vec_id => row-group skipping on id joins
      vectors.sortWithinPartitions(col("vec_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("vectors").toString)

      // LSH postings: narrow (bucket, vec_id) under tbl=<t> partitions,
      // bucket-sorted within files for min/max skipping
      writeLshPostings(vectors, lsh, staging)

      // IVF: tiny refined centroids + inverted lists. Unlike the LSH
      // postings (tables× duplication), each vector sits in exactly ONE
      // list, so storing v alongside (cent_id, vec_id) costs one extra
      // copy of the corpus and lets a probe score candidates straight off
      // the pruned list scan — no second join against the vectors table
      val built = Similarity.buildIvfIndex(canon, ivf.nlist, ivf.refineIters,
        ivf.dim, vecCol, idCol)
      built.centroids.coalesce(1)
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("ivf_centroids").toString)
      built.assigned.select(col("cent_id"), col("vec_id"), col("v"))
        .repartition(col("cent_id"))
        .sortWithinPartitions(col("cent_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("ivf").toString)

      // IVF-PQ: the same pruned-list shape as ivf/, but candidates ship
      // as m one-byte codes + a precomputed reconstruction norm instead
      // of dim floats (~32× less candidate I/O — at 100 TB, postings in
      // the page cache vs not). Codebooks are trained HERE and pinned
      // with the version like the centroids; appends encode under them.
      val cb = Pq.train(canon, pq.m, pq.ksub, pq.iters, ivf.dim, vecCol, idCol)
      writePqLists(Pq.encode(canon, cb, vecCol, idCol),
        spark.read.parquet(staging.resolve("ivf").toString), staging)
      writeCodebooks(cb, staging)

      writeParams(staging, lsh, ivf, pq)
      val own = Manifest(Seq(s"v$slot/vectors"), Seq(s"v$slot/lsh"),
        Seq(s"v$slot/ivf"), Seq(s"v$slot/ivf_centroids"),
        Seq(s"v$slot/pq"), Seq(s"v$slot/pq_codebooks"))
      Files.writeString(staging.resolve("manifest.json"), own.toJson)
    }
  }

  /** Incrementally index `delta` against the CURRENT version: hash and
    * assign ONLY the delta rows (same hyperplane params; assignment to
    * the EXISTING centroids — the lists grow, the centroids don't move),
    * then commit a new version whose manifest = the previous version's
    * directories + the delta directories. Cost is proportional to the
    * batch, never the corpus. LSH probes against `write(a); append(b)`
    * are identical to `write(a ∪ b)` because the hyperplanes are
    * deterministic literals of the pinned params; IVF probes agree
    * wherever the centroid choice doesn't (and exactly at
    * nprobe ≥ nlist). Returns the committed version number.
    */
  def append(delta: DataFrame,
             vecCol: String = "embedding", idCol: String = "vec_id"): Long = synchronized {
    graft.functions.VectorFunctions.register(spark)
    pinVersion() // fail fast before staging anything
    Versioned.commitWithRetry(root, "manifest.json") { (baseOpt, slot, staging) =>
      // rebase-retry recomputes against the slot race winner's state —
      // its postings become part of this version's manifest chain
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no ANN index committed at $root"))
      val st = state(base)
      // already-indexed ids drop from the delta (anti-join: corpus-side
      // scan, batch-sized output — the DigestIndex.append shape), and
      // in-batch id repeats collapse (dropDuplicates — an at-least-once
      // source can deliver the same row twice WITHIN one poll). Both
      // protect probeIvf's id-uniqueness contract: a duplicate vec_id
      // would appear twice in every probe's top-k. Deleted ids are NOT
      // in the effective set, so re-appending after a takedown works.
      val vectors = delta.select(col(idCol).cast("long").as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("v"))
        .dropDuplicates("vec_id")
        .join(st.vectors.select(col("vec_id")), Seq("vec_id"), "left_anti")

      vectors.sortWithinPartitions(col("vec_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("vectors").toString)
      // re-READ the written file so the anti-joined subtree runs once,
      // with durable materialization (the MinHashIndex.stageDelta move)
      val stored = spark.read.parquet(staging.resolve("vectors").toString)
      // a fully-redelivered trigger empties the delta: SKIP the commit
      // rather than publish it — a zero-row partitionBy write leaves
      // v<N>/lsh with no parquet files at all, and the next
      // spark.read.parquet of the chain would fail UNABLE_TO_INFER_
      // SCHEMA, bricking every later read of the store
      if (stored.isEmpty)
        throw Versioned.SkipCommit("empty delta — every id already indexed")

      writeLshPostings(stored, st.lsh, staging)

      // assign the delta to the PINNED centroids (cached, broadcast) —
      // one pass over the batch, zero passes over the corpus
      Similarity.nearestCentroids(stored, st.centroids, "vec_id", "v", keep = 1)
        .select(col("cent_id"), col("vec_id"), col("v"))
        .repartition(col("cent_id"))
        .sortWithinPartitions(col("cent_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("ivf").toString)

      // encode the delta under the PINNED codebooks (they don't move,
      // like the centroids) — batch-scale; cent ids reuse the staged
      // ivf assignment just written
      st.codebooks.foreach { cb =>
        writePqLists(Pq.encode(stored, cb, "v", "vec_id"),
          spark.read.parquet(staging.resolve("ivf").toString), staging)
      }

      writeParams(staging, st.lsh, st.ivf, st.pq)
      val m = Manifest(
        st.manifest.vectors :+ s"v$slot/vectors",
        st.manifest.lsh :+ s"v$slot/lsh",
        st.manifest.ivf :+ s"v$slot/ivf",
        st.manifest.centroids, // reused verbatim — no new centroid files
        if (st.codebooks.isDefined) st.manifest.pq :+ s"v$slot/pq" else st.manifest.pq,
        st.manifest.pqBooks)   // reused verbatim — codebooks pinned
      Files.writeString(staging.resolve("manifest.json"), m.toJson)
    }
  }

  /** Remove ids from the index — the takedown path, completing the
    * [[DigestIndex.delete]]/[[MinHashIndex.delete]] story for
    * embeddings: deleted vectors stop appearing in probe results
    * immediately, nothing corpus-scale is rewritten, and a later
    * [[append]] of the same id indexes it afresh (the manifest chains
    * replay positionally — the tombstone subtracts only from entries
    * BEFORE it, so the re-add stays live and exactly one copy
    * survives, preserving probeIvf's id-uniqueness contract). Commits
    * a version whose manifest appends ONE batch-scale tombstone dir
    * (ids semi-joined against the effective set — re-deleting an
    * already-deleted id stores nothing) to all three component chains;
    * [[compact]] folds the chains through the tombstones into clean
    * data files. Returns the committed version.
    */
  def delete(ids: DataFrame, idCol: String = "vec_id"): Long = synchronized {
    pinVersion() // fail fast before staging anything
    Versioned.commitWithRetry(root, "manifest.json") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no ANN index committed at $root"))
      val st = state(base)
      ids.select(col(idCol).cast("long").as("vec_id")).distinct()
        .join(st.vectors.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .coalesce(1)
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("tombstones").toString)
      writeParams(staging, st.lsh, st.ivf, st.pq)
      val t = s"v$slot/tombstones"
      Files.writeString(staging.resolve("manifest.json"),
        Manifest(st.manifest.vectors :+ t, st.manifest.lsh :+ t,
          st.manifest.ivf :+ t, st.manifest.centroids,
          if (st.codebooks.isDefined) st.manifest.pq :+ t else st.manifest.pq,
          st.manifest.pqBooks).toJson)
    }
  }

  private def writeLshPostings(vectors: DataFrame, lsh: LshParams, dir: Path): Unit =
    Similarity.withBuckets(vectors, lsh.tables, lsh.planes, lsh.dim, "v")
      .select(col("tbl"), col("bucket"), col("vec_id"))
      .repartition(col("tbl"))
      .sortWithinPartitions(col("tbl"), col("bucket"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("tbl")
      .parquet(dir.resolve("lsh").toString)

  /** The PQ component: (cent_id, vec_id, code, recon_norm) — the ivf/
    * list layout with codes in place of vectors, so probes prune by
    * cent_id identically and read ~32× fewer candidate bytes.
    */
  private def writePqLists(codes: DataFrame, assigned: DataFrame, dir: Path): Unit =
    assigned.select(col("cent_id"), col("vec_id"))
      .join(codes, Seq("vec_id"))
      .select(col("cent_id"), col("vec_id"), col("code"), col("recon_norm"))
      .repartition(col("cent_id"))
      .sortWithinPartitions(col("cent_id"))
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("pq").toString)

  /** Codebooks as (m, k, cw) rows — self-describing (shape recovered
    * from the rows), tiny (m·ksub rows), version-pinned like the
    * centroids.
    */
  private def writeCodebooks(cb: Pq.Codebooks, dir: Path): Unit = {
    import spark.implicits._
    cb.books.zipWithIndex.flatMap { case (book, mi) =>
      book.zipWithIndex.map { case (cw, k) => (mi, k, cw) }
    }.toDF("m", "k", "cw")
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(dir.resolve("pq_codebooks").toString)
  }

  private def writeParams(dir: Path, lsh: LshParams, ivf: IvfParams, pq: PqParams): Unit =
    Files.writeString(dir.resolve("params.json"),
      s"""{"tables":${lsh.tables},"planes":${lsh.planes},"lsh_dim":${lsh.dim},""" +
        s""""nlist":${ivf.nlist},"refine_iters":${ivf.refineIters},"ivf_dim":${ivf.dim},""" +
        s""""pq_m":${pq.m},"pq_ksub":${pq.ksub},"pq_iters":${pq.iters}}""")

  /** Probe state that is immutable once a version commits: parsed
    * params, the manifest, the DataFrame handles over its (possibly
    * multi-directory) components, and the persisted centroid table.
    * Cached per version in [[stateCache]] so repeated probes skip the
    * params.json read, parquet footer listing, and centroid scan that
    * were previously paid per call.
    */
  private final case class VersionState(lsh: LshParams, ivf: IvfParams,
                                        pq: PqParams, manifest: Manifest,
                                        vectors: DataFrame, lshPostings: DataFrame,
                                        ivfLists: DataFrame, centroids: DataFrame,
                                        pqLists: Option[DataFrame],
                                        codebooks: Option[Pq.Codebooks])

  private val stateCache = TrieMap.empty[Long, VersionState]

  private def state(version: Long): VersionState =
    stateCache.getOrElseUpdate(version, loadState(version))

  private def loadState(version: Long): VersionState = {
    val verDir = root.resolve(s"v$version")
    val txt = Files.readString(verDir.resolve("params.json"))
    def numOpt(key: String): Option[Int] =
      s""""$key":(\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    def num(key: String): Int =
      numOpt(key).getOrElse(
        throw new IllegalStateException(s"params.json missing $key"))
    val m = Manifest.read(verDir, version)
    // component chains replay in manifest order ([[Versioned
    // .replayChain]]: data dirs union, tombstone entries subtract from
    // everything earlier) — so the probes need no tombstone awareness
    // at all. Per-directory reads also sidestep multi-root partition
    // discovery tripping over the intermediate v<N> segments (the
    // partitioned LSH dirs), and push filters down identically.
    def fold(chain: Seq[String]): DataFrame =
      Versioned.replayChain(root, chain, "vec_id")(
        d => spark.read.parquet(root.resolve(d).toString))
    // centroids are tiny (nlist rows) and broadcast on every probe —
    // collect them ONCE into a LocalRelation so later probes build the
    // broadcast from driver memory with zero scan jobs
    val centsDisk = spark.read.parquet(
      m.centroids.map(root.resolve(_).toString): _*)
    val cents = localDf(centsDisk.collect(), centsDisk.schema)
    // codebooks: m·ksub rows, version-pinned; shape recovered from the
    // rows themselves (pre-PQ versions simply have no pq dirs)
    val books = if (m.pqBooks.isEmpty) None else Some {
      val rows = spark.read.parquet(m.pqBooks.map(root.resolve(_).toString): _*)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      val mCount = rows.map(_._1).max + 1
      Pq.Codebooks(mCount, rows.head._3.length,
        (0 until mCount).map(mi => rows.filter(_._1 == mi).sortBy(_._2).map(_._3).toSeq))
    }
    VersionState(LshParams(num("tables"), num("planes"), num("lsh_dim")),
      IvfParams(num("nlist"), num("refine_iters"), num("ivf_dim")),
      PqParams(numOpt("pq_m").getOrElse(16), numOpt("pq_ksub").getOrElse(64),
        numOpt("pq_iters").getOrElse(3)),
      m, fold(m.vectors), fold(m.lsh), fold(m.ivf), cents,
      if (m.pq.isEmpty) None else Some(fold(m.pq)), books)
  }

  /** A driver-local DataFrame (LocalRelation): joins that broadcast it
    * need no Spark job to build the broadcast side.
    */
  private def localDf(rows: Array[org.apache.spark.sql.Row],
                      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  /** The ids indexed by a version (`vec_id` column, tombstones
    * applied) — the redelivery-guard anti-join side for streaming
    * ingest (one id column off the sorted vectors chain; column
    * pruning keeps the scan narrow).
    */
  def indexedIds(version: Option[Long] = None): DataFrame =
    state(version.getOrElse(pinVersion())).vectors.select(col("vec_id"))

  /** Batch-distributed near-dup detection: the distinct `query_id`s of
    * `batch` rows whose cosine against ANY indexed vector inside their
    * `nprobe` nearest inverted lists reaches `minCosine`. The probe*
    * methods carry a small-query-batch contract (they COLLECT the
    * probe rows driver-side to prune the list scan and broadcast the
    * query side); this path is for corpus-sized batches — a whole
    * streaming micro-batch — so it stays fully distributed: broadcast
    * centroid ranking per batch row, then a cent_id-keyed shuffle join
    * against the inverted lists (AQE handles a hot centroid). Same
    * candidate set and 4-decimal rounding as `probeIvf(k=1)`, so the
    * hit decision is identical (spec-pinned).
    */
  def neardupHits(batch: DataFrame, minCosine: Double, nprobe: Int = 4,
                  vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val st = state(pinVersion())
    val probes = Similarity.nearestCentroids(
      batch.select(col(idCol).cast("long").as("query_id"),
        Similarity.asDouble(col(vecCol)).as("qv")),
      st.centroids, "query_id", "qv", nprobe)
    st.ivfLists.join(probes, Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cs", round(Similarity.cosine(col("qv"), col("v")), 4))
      .filter(col("cs") >= minCosine)
      .select(col("query_id")).distinct()
  }

  /** Approximate top-k by LSH against the persisted index. Only the
    * query batch is hashed; the postings scan is pruned to the buckets
    * the queries land in.
    */
  def probeLsh(queries: DataFrame, k: Int = 5,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val st = state(pinVersion())
    // hash the (small, broadcastable-by-contract) query batch in ONE
    // job and keep the rows driver-side: they seed both the pruning
    // lists and the LocalRelation join side below — no checkpoint, no
    // second pass
    val qDisk = Similarity.withBuckets(
      queries.select(col(idCol).cast("long").as("query_id"),
        Similarity.asDouble(col(vecCol)).as("qv")),
      st.lsh.tables, st.lsh.planes, st.lsh.dim, "qv")
    val qRows = qDisk.collect()
    val q = localDf(qRows, qDisk.schema)
    // one (query_id, qv) row per query, deduped driver-side (qRows has
    // one row per table per query)
    val qVec = localDf(
      qRows.groupBy(_.getAs[Long]("query_id")).map(_._2.head).toArray, qDisk.schema)
      .select(col("query_id"), col("qv"))
    // the query batch's bucket footprint, pushed into the scan:
    // tbl => hive-partition pruning, bucket => row-group skipping.
    // (tbl IN ..) AND (bucket IN ..) is a superset of the exact pair
    // set — the join below keeps it exact.
    val tbls = qRows.map(_.getAs[Int]("tbl")).distinct.toSeq
    val buckets = qRows.map(_.getAs[Long]("bucket")).distinct.toSeq
    val postings = st.lshPostings
      .filter(col("tbl").isin(tbls: _*) && col("bucket").isin(buckets: _*))
    // dedup on the NARROW (query_id, vec_id) pair — qv (dim doubles per
    // row) is re-attached from the local query relation after the
    // shuffle, so the dedup exchange ships 16-byte pairs, not vectors
    val cand = postings.join(broadcast(q.select(col("tbl"), col("bucket"), col("query_id"))),
        Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
      .join(broadcast(qVec), Seq("query_id"))
    // candidates join the vectors table WITHOUT a broadcast hint: their
    // size is bucket-density-bounded — |queries| × tables × corpus/2^planes
    // — which grows LINEARLY with the corpus at fixed planes. A forced
    // broadcast therefore breaks exactly when the index is most needed
    // (this soaked out at a 200k-corpus × 100-query probe: Spark
    // estimated the candidate table at 8 GiB and refused). AQE
    // broadcasts from runtime sizes when the batch is genuinely small
    // (the common dashboard probe) and falls back to a shuffle join on
    // vec_id when it isn't — the only plan that survives 100 TB.
    val withVec = st.vectors.join(cand, Seq("vec_id"))
    Similarity.rankTopK(withVec, k)
  }

  /** Approximate top-k by IVF against the persisted index: rank the
    * (cached, tiny) centroids, pick nprobe lists per query, scan only
    * those inverted lists.
    */
  def probeIvf(queries: DataFrame, k: Int = 5, nprobe: Int = 4,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val st = state(pinVersion())
    // rank the local centroid table against the query batch in ONE job;
    // the collected rows seed both the pruning list and the
    // LocalRelation join side — no checkpoint, no second pass
    val probesDisk = Similarity.nearestCentroids(
      queries.select(col(idCol).cast("long").as("query_id"),
        Similarity.asDouble(col(vecCol)).as("qv")),
      st.centroids, "query_id", "qv", nprobe)
    val pRows = probesDisk.collect()
    val probes = localDf(pRows, probesDisk.schema)
    val centIds = pRows.map(_.getAs[Long]("cent_id")).distinct.toSeq
    val lists = st.ivfLists
      .filter(col("cent_id").isin(centIds: _*)) // row-group skipping
    // no dedup shuffle: keep=1 assignment puts each vec_id in exactly
    // one inverted list (ids are unique across appends by contract), so
    // a (query_id, vec_id) pair can't repeat; and the lists carry v, so
    // scoring happens straight off the pruned scan — no vectors join
    val cand = lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
    Similarity.rankTopK(cand, k)
  }

  /** Approximate top-k by IVF-PQ: the same nprobe-pruned inverted-list
    * scan as [[probeIvf]], but candidates are scored straight off
    * their m one-byte codes with a per-query ADC lookup table
    * ([[Pq.adcCosine]]) — ~16× less candidate I/O than the
    * full-vector lists and no reconstruction — then the top
    * `refine`·k ADC survivors per query are re-scored EXACTLY against
    * the id-sorted vectors table (the FAISS refine step: an id-join
    * touching refine·k·|queries| rows, row-group-skipped — negligible
    * I/O that recovers the quantization's ranking error; `refine = 0`
    * returns raw ADC scores). Recall bounds live in AnnIndexSpec
    * (like the int8 path's). The LUT is built driver-side from the
    * version-pinned codebooks — m·ksub doubles per query, riding the
    * same broadcast as the probe rows.
    */
  def probePq(queries: DataFrame, k: Int = 5, nprobe: Int = 4, refine: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val st = state(pinVersion())
    val cb = st.codebooks.getOrElse(throw new IllegalStateException(
      s"version at $root predates the PQ component — rebuild with write()"))
    val lists = st.pqLists.get // present whenever codebooks are
    val probesDisk = Similarity.nearestCentroids(
      queries.select(col(idCol).cast("long").as("query_id"),
        Similarity.asDouble(col(vecCol)).as("qv")),
      st.centroids, "query_id", "qv", nprobe)
    val pRows = probesDisk.collect()
    import org.apache.spark.sql.types._
    // the (cent_id, query_id) probe pairs carry NOTHING wide; the ADC
    // LUT and |q| live in a per-QUERY relation joined after the list
    // scan — building them per probe row would ship nprobe duplicate
    // m·ksub tables per query through the broadcast
    val probes = localDf(pRows.map(r =>
      org.apache.spark.sql.Row(r.getAs[Long]("cent_id"), r.getAs[Long]("query_id"))),
      StructType(Seq(StructField("cent_id", LongType),
        StructField("query_id", LongType))))
    val luts = localDf(
      pRows.groupBy(_.getAs[Long]("query_id")).map(_._2.head).toArray.map { r =>
        val q = r.getSeq[Double](r.fieldIndex("qv")).toSeq
        org.apache.spark.sql.Row(r.getAs[Long]("query_id"),
          Pq.lookupTable(q, cb), math.sqrt(q.iterator.map(x => x * x).sum))
      },
      StructType(Seq(StructField("query_id", LongType),
        StructField("lut", ArrayType(ArrayType(DoubleType))),
        StructField("qnorm", DoubleType))))
    val centIds = pRows.map(_.getAs[Long]("cent_id")).distinct.toSeq
    val cand = lists.filter(col("cent_id").isin(centIds: _*)) // row-group skipping
      .join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(luts), Seq("query_id"))
      .withColumn("score",
        round(Pq.adcCosine(col("lut"), col("code"), col("recon_norm"), col("qnorm")), 4))
    val shortlist = math.max(k, refine * k)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val top = cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= (if (refine > 0) shortlist else k))
      .select(col("query_id"), col("vec_id"), col("score"))
    if (refine <= 0) {
      // raw ADC ranking (codes only, no vector reads)
      top.withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), col("score"))
        .repartition(1)
        .sortWithinPartitions(col("query_id"), col("rank"))
    } else {
      // exact re-rank of the ADC shortlist: one (query_id, qv) row per
      // query from the already-collected probe rows, candidates
      // broadcast against the sorted vectors table
      val qVec = localDf(
        pRows.groupBy(_.getAs[Long]("query_id")).map(_._2.head).toArray
          .map(r => org.apache.spark.sql.Row(r.getAs[Long]("query_id"),
            r.getSeq[Double](r.fieldIndex("qv")))),
        StructType(Seq(StructField("query_id", LongType),
          StructField("qv", ArrayType(DoubleType)))))
      val withVec = st.vectors.join(
        broadcast(top.drop("score").join(qVec, Seq("query_id"))), Seq("vec_id"))
      Similarity.rankTopK(withVec, k)
    }
  }

  /** Rewrite the CURRENT version's (possibly many-directory) append
    * chain into ONE fresh directory per component and commit it as a
    * new version. Pure I/O: postings, inverted lists and vectors are
    * read from the chain and rewritten merged + re-sorted — nothing is
    * re-hashed or re-assigned, so probes against the compacted version
    * are identical by construction (same params, same rows). The
    * motivation is the same as any LSM compaction: a long append chain
    * accumulates small files and per-directory scan overhead; compact
    * restores the single-sorted-run layout [[write]] produces, at I/O
    * cost instead of [[write]]'s compute cost. Old versions remain
    * probeable until [[vacuum]]. Returns the committed version.
    */
  def compact(): Long = synchronized {
    pinVersion() // fail fast before staging anything
    Versioned.commitWithRetry(root, "manifest.json") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no ANN index committed at $root"))
      val st = state(base)
      st.vectors.repartition(col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("vectors").toString)
      st.lshPostings
        .repartition(col("tbl"))
        .sortWithinPartitions(col("tbl"), col("bucket"))
        .write.mode(SaveMode.ErrorIfExists).partitionBy("tbl")
        .parquet(staging.resolve("lsh").toString)
      st.ivfLists
        .repartition(col("cent_id"))
        .sortWithinPartitions(col("cent_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("ivf").toString)
      st.centroids.coalesce(1)
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("ivf_centroids").toString)
      st.pqLists.foreach(_.repartition(col("cent_id"))
        .sortWithinPartitions(col("cent_id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("pq").toString))
      st.codebooks.foreach(writeCodebooks(_, staging))
      writeParams(staging, st.lsh, st.ivf, st.pq)
      val hasPq = st.codebooks.isDefined
      val own = Manifest(Seq(s"v$slot/vectors"), Seq(s"v$slot/lsh"),
        Seq(s"v$slot/ivf"), Seq(s"v$slot/ivf_centroids"),
        if (hasPq) Seq(s"v$slot/pq") else Seq.empty,
        if (hasPq) Seq(s"v$slot/pq_codebooks") else Seq.empty)
      Files.writeString(staging.resolve("manifest.json"), own.toJson)
    }
  }

  /** Delete index data superseded for longer than `retentionMs` (same
    * grace-period contract as the table store's vacuum) — but never a
    * directory the live version's manifest still references: an
    * append chain shares its base version's postings, so only the
    * UNREFERENCED data dirs and the superseded version's
    * manifest/params (its probeability) are reclaimed. Returns how many
    * versions were made unprobeable.
    */
  def vacuum(retentionMs: Long = 3600000L): Int = synchronized {
    require(retentionMs >= 0, s"vacuum: retentionMs=$retentionMs must be >= 0")
    val cutoff = System.currentTimeMillis() - retentionMs
    val cur = currentVersion.getOrElse(-1L)
    val live: Set[String] =
      if (cur < 0) Set.empty
      else Manifest.read(root.resolve(s"v$cur"), cur).allDirs.toSet
    var removed = 0
    versions.filter(_ < cur).foreach { v =>
      val dir = root.resolve(s"v$v")
      if (Files.getLastModifiedTime(dir).toMillis < cutoff) {
        // data-holder versions (manifest already stripped by an earlier
        // vacuum) are re-examined too: once a later full rebuild stops
        // referencing their dirs, this pass reclaims them — gating on
        // probeability would leak a corpus-scale copy forever
        val probeable = Files.exists(dir.resolve("manifest.json")) ||
          Files.exists(dir.resolve("params.json"))
        Seq("vectors", "lsh", "ivf", "ivf_centroids", "pq", "pq_codebooks",
            "tombstones")
          .filterNot(c => live.contains(s"v$v/$c"))
          .foreach(c => graft.Fs.deleteTree(dir.resolve(c)))
        Files.deleteIfExists(dir.resolve("manifest.json"))
        Files.deleteIfExists(dir.resolve("params.json"))
        // fully unreferenced => the whole version dir goes; otherwise it
        // stays as a data holder for the live append chain
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
}

object AnnIndexStore {
  /** Random-hyperplane LSH build parameters (see [[Similarity]]). */
  final case class LshParams(tables: Int = 32, planes: Int = 6, dim: Int = 64)
  /** IVF build parameters (see [[Similarity.buildIvfIndex]]). */
  final case class IvfParams(nlist: Int = 32, refineIters: Int = 1, dim: Int = 64)
  /** PQ build parameters (see [[Pq.train]]): m sub-spaces (must divide
    * the IVF dim), ksub codewords each (≤128 — tinyint codes), Lloyd
    * iterations. The defaults (16 sub-spaces × 4 dims, 64 codewords)
    * are the recall-gated operating point on the synthetic fixture —
    * near-uniform embeddings are PQ's worst case, needing finer
    * sub-spaces than structured real-world vectors would; still 16
    * bytes per 64-float vector (16×).
    */
  final case class PqParams(m: Int = 16, ksub: Int = 64, iters: Int = 3)

  /** The root-relative data directories composing one committed
    * version. Written at commit time; versions older than the manifest
    * format (none in practice) default to their own four dirs.
    */
  /** Each component list is an ORDERED chain: data dirs union in
    * order, and a `…/tombstones` entry ([[AnnIndexStore.delete]])
    * subtracts its ids from everything earlier — the same positional
    * replay as the digest/minhash manifests, so delete-then-reappend
    * resolves to exactly one live copy (a flat "subtract the set"
    * would either resurrect the old copy or hide the new one).
    */
  private[operators] final case class Manifest(vectors: Seq[String], lsh: Seq[String],
                                               ivf: Seq[String], centroids: Seq[String],
                                               pq: Seq[String] = Seq.empty,
                                               pqBooks: Seq[String] = Seq.empty) {
    def allDirs: Seq[String] = vectors ++ lsh ++ ivf ++ centroids ++ pq ++ pqBooks
    def toJson: String = {
      def arr(xs: Seq[String]) = xs.map(x => s""""$x"""").mkString("[", ",", "]")
      s"""{"vectors":${arr(vectors)},"lsh":${arr(lsh)},""" +
        s""""ivf":${arr(ivf)},"ivf_centroids":${arr(centroids)},""" +
        s""""pq":${arr(pq)},"pq_codebooks":${arr(pqBooks)}}"""
    }
  }

  private[operators] object Manifest {
    def read(verDir: java.nio.file.Path, version: Long): Manifest = {
      val mf = verDir.resolve("manifest.json")
      if (!Files.exists(mf))
        Manifest(Seq(s"v$version/vectors"), Seq(s"v$version/lsh"),
          Seq(s"v$version/ivf"), Seq(s"v$version/ivf_centroids"))
      else {
        val txt = Files.readString(mf)
        def dirsOpt(key: String): Option[Seq[String]] =
          s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
            .map(_.group(1).split(",").toSeq
              .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
        def dirs(key: String): Seq[String] =
          dirsOpt(key).getOrElse(
            throw new IllegalStateException(s"manifest.json missing $key"))
        // pq keys are OPTIONAL: manifests written before the PQ
        // component simply have no coded lists (probePq names that)
        Manifest(dirs("vectors"), dirs("lsh"), dirs("ivf"), dirs("ivf_centroids"),
          dirsOpt("pq").getOrElse(Seq.empty),
          dirsOpt("pq_codebooks").getOrElse(Seq.empty))
      }
    }
  }
}

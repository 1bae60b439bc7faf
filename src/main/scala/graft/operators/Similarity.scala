package graft.operators

import graft.Materialize.MaterializeOps
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (builder brief):
  *   - [[bruteForceTopK]] — exact cosine top-k of a small query set
  *     against the corpus: broadcast the queries, score inside the scan
  *     stage, `row_number` window for the k cut. At 100 TB the corpus
  *     side stays partitioned and is read once; no shuffle of the corpus.
  *   - [[lshTopK]] / [[cosineNearDupLsh]] — random-hyperplane LSH with
  *     T tables of P planes: candidates come from an equi-join on
  *     (table, bucket), so the O(n·|queries|) / O(n²) score space is
  *     never materialized. Hyperplane signs are splitmix64-derived
  *     literals, so the index is deterministic with no stored model.
  *
  * All vector math is double-precision higher-order array expressions
  * (zip_with/aggregate) — codegen'd, no UDFs.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** cosine(a, b) = dot/(|a||b|), one fused codegen'd loop
    * ([[graft.functions.VectorFunctions.CosineSimilarity]]), accumulated
    * in element order like DuckDB's list_cosine_similarity so the
    * oracle can mirror it. Composed fallback: dot/(norm*norm).
    */
  def cosine(a: Column, b: Column): Column = VectorFunctions.cosineSim(a, b)

  private[operators] def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Shared probe tail: score candidate (query_id, qv, vec_id, v) rows,
    * round BEFORE ranking (cross-engine-stable order), cut at k.
    */
  private[operators] def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    cand.withColumn("score", round(cosine(col("v"), col("qv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      // ≤ k rows per query and the query batch is small by contract — an
      // explicit single-partition exchange of the FILTERED rows + local
      // sort yields the same total order as a global orderBy without
      // the range exchange's sampling pass. (Not coalesce(1): that is a
      // narrow dependency, so it would drag the whole window stage into
      // one task and serialize candidate ranking over the corpus-scale
      // candidate set.)
      .repartition(1)
      .sortWithinPartitions(col("query_id"), col("rank"))
  }

  /** Symmetric per-vector int8 quantization: q_i = round(127·v_i /
    * max|v|) as `array<tinyint>` — 4× smaller than float32 (the
    * vectors/postings I/O lever at 100 TB: candidate rescoring reads a
    * quarter of the bytes). The per-vector scale is POSITIVE and
    * multiplies every component equally, so it cancels in cosine —
    * cos(q(a), q(b)) ≈ cos(a, b) with only the ±0.5-step rounding
    * error, no scale bookkeeping at probe time. All-zero vectors
    * quantize to all zeros (scale guard). Scan-stage Columns, no UDF.
    */
  def quantizeInt8(emb: DataFrame, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame =
    emb.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      // BIND mx before the transform lambda (unbound aggregates
      // re-evaluate per element — the documented O(len²) trap)
      .withColumn("mx", aggregate(col("v"), lit(0.0),
        (acc, x) => greatest(acc, abs(x))))
      .select(col("vec_id"),
        when(col("mx") === 0.0,
          transform(col("v"), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col("v"),
            x => round(x * 127.0 / col("mx")).cast("tinyint"))).as("q"))

  /** Exact-shape top-k over the int8-QUANTIZED corpus: the same
    * broadcast-queries scan as [[bruteForceTopK]], but candidates ship
    * as `array<tinyint>` (the materialized checkpoint stands in for a
    * stored quantized index) and only widen to double inside the
    * scoring loop. Recall vs the float path is gated in the spec;
    * scores differ from float scores only by quantization error.
    */
  def bruteForceTopKInt8(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                         vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cq = quantizeInt8(corpus, vecCol, idCol)
      .graftCheckpoint() // int8 rows — what a stored index would ship
    val qq = quantizeInt8(queries, vecCol, idCol)
      .select(col("vec_id").as("query_id"), asDouble(col("q")).as("qv"))
    val cand = cq.select(col("vec_id"), asDouble(col("q")).as("v"))
      .crossJoin(broadcast(qq))
      .filter(col("query_id") =!= col("vec_id"))
    rankTopK(cand, k)
  }

  /** Exact top-k by cosine for each query vector. Queries must be small
    * (they are broadcast).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      // round BEFORE ranking: makes the rank order (score desc, vec_id)
      // reproducible across engines despite last-ulp float differences
      .withColumn("score", round(cosine(col("v"), col("qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** splitmix64 — deterministic pseudo-random hyperplane signs with no
    * stored model (same index on every run/cluster).
    */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane signs for every (table, plane): ±1 from splitmix64 —
    * precomputed driver-side, shipped as ONE literal 3-D array.
    */
  private def signMatrix(tables: Int, planes: Int, dim: Int): Seq[Seq[Seq[Double]]] =
    (0 until tables).map(t => (0 until planes).map(p => (0 until dim).map { j =>
      if ((splitmix64((t.toLong << 40) | (p.toLong << 20) | j) & 1L) == 1L) 1.0 else -1.0
    }))

  /** Achlioptas random projection dim → outDim:
    * `y_o = (1/√outDim) Σ_j s_oj · x_j` with signs `s_oj ∈ {±1}` from
    * splitmix64 (a seed namespace disjoint from the LSH tables'). The
    * Johnson-Lindenstrauss guarantee: pairwise inner products survive
    * within ~1/√outDim, so 64→16 floats buys 4× less vector I/O for
    * every downstream candidate scan/rescore at a bounded, spec-gated
    * recall cost. Scan-stage only; the matrix is a plan literal — no
    * stored model, same projection on every run and cluster. The
    * transform lambda holds ONE fold (evaluated per output dim), so
    * codegen size is O(1), not O(outDim).
    */
  def randomProject(emb: DataFrame, outDim: Int, dim: Int = 64,
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    require(outDim >= 1 && outDim <= dim,
      s"randomProject: outDim $outDim must be in [1, $dim]")
    val signs: Seq[Seq[Double]] = (0 until outDim).map(o => (0 until dim).map { j =>
      if ((splitmix64((0x9a7dL << 44) | (o.toLong << 22) | j) & 1L) == 1L) 1.0 else -1.0
    })
    val signsLit = typedlit(signs)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val checked = emb.filter(coalesce(
      assert_true(size(col(vecCol)) === dim,
        concat(lit(s"randomProject dim mismatch: expected $dim, got "),
          coalesce(size(col(vecCol)).cast("string"), lit("null")))),
      lit(true)))
    checked.select(col(idCol).as("vec_id"),
      transform(sequence(lit(1), lit(outDim)), o =>
        aggregate(
          zip_with(asDouble(col(vecCol)), element_at(signsLit, o), (x, s) => x * s),
          lit(0.0), (acc, y) => acc + y) * lit(scale)).as("embedding"))
  }

  /** Project-then-rescore top-k: coarse top-`candidates` in the
    * [[randomProject]]ed space (the scan that reads outDim floats per
    * row — 4× less I/O at 64→16), then exact full-dimension cosine on
    * ONLY those candidates, cut at k. This is the honest way to spend
    * the projection's I/O saving: reduced-space distortion
    * (~1/√outDim) is too coarse to rank a near-random corpus's top-5
    * directly (measured — ProjectionSpec), but as a CANDIDATE
    * generator it confines the full-vector reads to candidates/corpus
    * of the data, and the final ranking is exact over what it sees.
    * At 100 TB the coarse stage is itself served by an ANN index over
    * the projected vectors (same AnnIndexStore machinery, 4× smaller);
    * recall is gated in ProjectionSpec (≥0.6 at outDim=32,
    * candidates=100 on the adversarially-uniform fixture — real
    * embedding corpora cluster, which JL preserves far better).
    */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                    outDim: Int = 32, candidates: Int = 100, dim: Int = 64,
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    val pc = randomProject(corpus, outDim, dim, vecCol, idCol)
    val pq = randomProject(queries, outDim, dim, vecCol, idCol)
    val coarse = bruteForceTopK(pc, pq, candidates)
      .select(col("query_id"), col("vec_id"))
    val cf = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val qf = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cand = coarse.join(cf, "vec_id").join(broadcast(qf), "query_id")
    rankTopK(cand, k)
  }

  /** Explode the table dimension into ROWS first, then compute only P
    * sign-bit folds per row against the literal sign matrix. The
    * alternative — T×P folds in one projection — produces a generated
    * method too large for whole-stage codegen and falls back to
    * interpretation (measured ~4× slower end-to-end).
    */
  private[operators] def withBuckets(df: DataFrame, tables: Int, planes: Int, dim: Int,
                                     vec: String): DataFrame = {
    // a dim mismatch would null every projection and funnel ALL rows
    // into bucket 0 — silently degrading the LSH join to O(n²); fail
    // loudly instead (assert_true returns null when the check passes)
    val checked = df.filter(coalesce(
      assert_true(size(col(vec)) === dim,
        concat(lit(s"LSH dim mismatch: expected $dim, got "),
          coalesce(size(col(vec)).cast("string"), lit("null")))),
      lit(true)))
    val signs = typedlit(signMatrix(tables, planes, dim))
    val tableSigns = element_at(signs, col("tbl") + 1)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col(vec), element_at(tableSigns, p + 1), (x, s) => x * s),
        lit(0.0), (acc, y) => acc + y)
      when(proj > 0, 1L << p).otherwise(0L)
    }
    checked.withColumn("tbl", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket", bits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** Build the LSH index over a corpus ONCE: (tbl, bucket, vec_id, v),
    * materialized via localCheckpoint. The build — T tables × P
    * hyperplane folds over every vector — is the expensive stage of LSH
    * search; building per query was the round-1 scale bug (17× the
    * brute-force cost). At cluster scale this DataFrame is a written,
    * bucketed-by-(tbl, bucket) table; queries only probe it.
    */
  def buildLshIndex(corpus: DataFrame,
                    tables: Int = 32, planes: Int = 6, dim: Int = 64,
                    vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    withBuckets(
      corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v")),
      tables, planes, dim, "v")
      .select(col("tbl"), col("bucket"), col("vec_id"), col("v"))
      .graftCheckpoint()

  /** Probe a [[buildLshIndex]] index: score only corpus vectors that
    * share a bucket with the query in at least one table. The query side
    * is tiny — its bucketing plus a broadcast join is the entire
    * per-query cost; the corpus is never re-hashed.
    */
  def probeLshTopK(index: DataFrame, queries: DataFrame, k: Int = 5,
                   tables: Int = 32, planes: Int = 6, dim: Int = 64,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    val q = withBuckets(
      queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv")),
      tables, planes, dim, "qv")
    val cand = index.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    rankTopK(cand, k)
  }

  /** Approximate top-k in one shot: build the index, then probe. Callers
    * issuing more than one query batch should [[buildLshIndex]] once and
    * [[probeLshTopK]] per batch instead.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
              tables: Int = 32, planes: Int = 6, dim: Int = 64,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    probeLshTopK(buildLshIndex(corpus, tables, planes, dim, vecCol, idCol),
      queries, k, tables, planes, dim, vecCol, idCol)

  /** One IVF index: the refined centroids (tiny — broadcast at probe
    * time) and the corpus assigned to inverted lists (cent_id, vec_id,
    * v), both materialized.
    */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** `keep` nearest centroids for each row of `df` (broadcast the
    * centroid table, cut per row).
    *
    * keep == 1 (the corpus-scale assignment path: every kmeans/IVF
    * build step runs it over the FULL corpus) is a map-side
    * `max_by` aggregate, NOT a window: the window shape shuffles and
    * sorts all |df|·|cents| scored rows just to keep one per id, while
    * the hash aggregate partially reduces inside the scan stage and
    * ships one row per id (guide §2.3 "aggregate before you shuffle" —
    * k× fewer exchanged rows). The (cs desc, cent_id asc) tie-break is
    * preserved exactly: max over struct(cs, -cent_id) picks the same
    * centroid row_number picked. keep > 1 (probe-side, tiny query
    * batches by contract) keeps the window cut.
    */
  private[operators] def nearestCentroids(df: DataFrame, cents: DataFrame,
                                          idName: String, vName: String, keep: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("cs", round(cosine(col(vName), col("cv")), 6))
    // the map-side aggregate can only reconstruct (id, v) payloads; a
    // caller with extra columns falls back to the window cut (ADVICE
    // r14: a require() here turned a working shape into a crash)
    if (keep == 1 && df.columns.forall(c => c == idName || c == vName)) {
      scored.groupBy(col(idName))
        .agg(max(col(vName)).as(vName), // (id → v) is functional: max = the value
          max_by(col("cent_id"),
            struct(col("cs").as("s"), (lit(0L) - col("cent_id")).as("nc")))
            .as("cent_id"))
        .select(col(idName), col(vName), col("cent_id")) // window branch's order
    } else {
      val w = Window.partitionBy(col(idName))
        .orderBy(col("cs").desc, col("cent_id"))
      scored.withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("cs", "crn", "cv")
    }
  }

  /** Build the IVF index ONCE: hash-sampled seed centroids, `refineIters`
    * Lloyd steps (hash seeds land in dense regions proportionally, but a
    * k-means step pulls each centroid to its list's mean — measurably
    * better recall at the same nprobe; per-dimension avg = `dim`
    * codegen'd aggregates in ONE groupBy, no explode), then the corpus
    * assignment to inverted lists. Deterministic — no stored model. At
    * cluster scale `assigned` is a table bucketed by cent_id; queries
    * only probe nprobe lists of it.
    */
  def buildIvfIndex(corpus: DataFrame, nlist: Int = 32, refineIters: Int = 1,
                    dim: Int = 64,
                    vecCol: String = "embedding", idCol: String = "vec_id",
                    materialize: Boolean = true): IvfIndex = {
    VectorFunctions.register(corpus.sparkSession)
    // materialize = false: SKIP the eager per-stage checkpoints — for a
    // SINGLE-CONSUMER caller (kmeansAssign, cosineNearDupSemantic) each
    // intermediate (seed, every Lloyd step, the assignment) appears
    // exactly once in the final plan, so each still executes once (the
    // centroid tables ride the broadcast exchanges), and the 4+
    // checkpoint round-trips were pure per-pass scheduling overhead
    // (profiled: 3×0.13 s localCheckpoint jobs in x_dedup_semantic).
    // Keep true where centroids AND assignment both get consumed
    // (ivfTopK's probe side, AnnIndexStore's persisted write) — lazy
    // centroids would re-run the Lloyd chain once per consumer there.
    def mat(df: DataFrame): DataFrame = if (materialize) df.graftCheckpoint() else df
    // loud dim check (matches the LSH guard): the refinement's per-dim
    // averages would otherwise throw an opaque element_at error
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .filter(coalesce(assert_true(size(col("v")) === dim,
        concat(lit(s"IVF dim mismatch: expected $dim, got "),
          coalesce(size(col("v")).cast("string"), lit("null")))), lit(true)))
    val seed = mat(c.orderBy(xxhash64(col("vec_id"))).limit(nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val cents = (0 until refineIters).foldLeft(seed) { (cs, _) =>
      // per-vec nearest centroid via the keep=1 map-side max_by (NOT a
      // window): the Lloyd step runs over the FULL corpus, and the
      // aggregate partially reduces in the scan stage, shipping one row
      // per vector instead of sort-shuffling all |corpus|·k scored rows
      // (guide §2.3). Tie-break (cs desc, cent_id asc) identical.
      mat(nearestCentroids(c, cs, "vec_id", "v", 1)
        .groupBy(col("cent_id"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("v"), i + 1))): _*).as("cv")))
    }
    IvfIndex(cents, mat(nearestCentroids(c, cents, "vec_id", "v", 1)))
  }

  /** Probe a [[buildIvfIndex]] index: score only the `nprobe` inverted
    * lists nearest each query. Per-query cost is the (tiny) query
    * bucketing plus one join that touches ~nprobe/nlist of the corpus.
    */
  def probeIvfTopK(index: IvfIndex, queries: DataFrame, k: Int = 5,
                   nprobe: Int = 4,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    val probes = nearestCentroids(
      queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv")),
      index.centroids, "query_id", "qv", nprobe)
    val cand = index.assigned.join(probes, Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    rankTopK(cand, k)
  }

  /** IVF (inverted-file) approximate top-k in one shot: build the index,
    * then probe. Callers issuing more than one query batch should
    * [[buildIvfIndex]] once and [[probeIvfTopK]] per batch instead.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
              nlist: Int = 32, nprobe: Int = 4, refineIters: Int = 1,
              dim: Int = 64,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    probeIvfTopK(buildIvfIndex(corpus, nlist, refineIters, dim, vecCol, idCol),
      queries, k, nprobe, vecCol, idCol)

  /** Exact cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ) on a
    * bounded corpus — the oracle-checkable ground truth.
    */
  def cosineNearDupBrute(corpus: DataFrame, minCosine: Double,
                         vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SemDeDup-style semantic near-dup pairs (published method: Abbas
    * et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", arXiv:2303.09540): k-means-bucket
    * the embedding space, then compare vectors only WITHIN a cluster —
    * the candidate space drops from |corpus|² to Σ|cluster|², clusters
    * are the unit of parallelism, and cross-cluster near-dups are
    * deliberately out of scope (the method's documented recall trade;
    * [[cosineNearDupLsh]] is the recall-tunable alternative, this one
    * needs no bucket tables and reuses the corpus-organization
    * clustering a pipeline often already pays for). Within-cluster
    * pairs are EXACTLY verified, so the output is a strict subset of
    * [[cosineNearDupBrute]]'s pairs — precision 1 by construction,
    * recall gated in tests.
    *
    * Skew guard: any cluster past `maxClusterSize` is sub-split by id
    * hash, so one degenerate embedding region cannot go quadratic —
    * the same bounded-bucket move as MinHash's `bucketCap`, trading
    * further recall only on pathological corpora.
    */
  def cosineNearDupSemantic(corpus: DataFrame, minCosine: Double,
                            k: Int = 8, iters: Int = 2, dim: Int = 64,
                            maxClusterSize: Int = 10000,
                            vecCol: String = "embedding",
                            idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    require(maxClusterSize >= 2,
      s"cosineNearDupSemantic: maxClusterSize=$maxClusterSize must be >= 2")
    // `assigned` already carries each vector (vec_id, v, cent_id) — use
    // it directly. Round-15: the previous form projected it to
    // (id, cluster) and shuffle-joined the corpus back on id just to
    // re-attach the SAME v it had dropped — a full corpus exchange for
    // nothing (guide §2.4). `v` here equals the corpus projection by
    // construction: buildIvfIndex assigns every id and never rewrites v.
    // materialize = false: the assignment is consumed exactly once (by
    // the `sub` checkpoint below) — the build's eager per-stage
    // checkpoints were per-pass overhead with no reuse to pay for
    val c = buildIvfIndex(corpus, nlist = k, refineIters = iters,
        dim = dim, vecCol = vecCol, idCol = idCol, materialize = false)
      .assigned.select(col("vec_id").as("id"), col("v"),
        col("cent_id").as("cluster"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    val sub = c.withColumn("__sub",
        pmod(xxhash64(col("id")),
          greatest(lit(1L), ceil(count(lit(1)).over(w) /
            lit(maxClusterSize.toDouble)).cast("long"))).cast("int"))
      .graftCheckpoint() // clustering + sub-split computed once, both legs
    val a = sub.select(col("cluster"), col("__sub"), col("id").as("id_a"), col("v").as("va"))
    val b = sub.select(col("cluster"), col("__sub"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("cluster", "__sub"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding near-dup via LSH buckets + exact verify — the scale path
    * for [[cosineNearDupBrute]].
    */
  def cosineNearDupLsh(corpus: DataFrame, minCosine: Double,
                       tables: Int = 32, planes: Int = 6, dim: Int = 64,
                       vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = withBuckets(
      corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")),
      tables, planes, dim, "v")
      .graftCheckpoint() // bucketing computed once, reused by both legs
    val a = c.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = c.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", round(cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}

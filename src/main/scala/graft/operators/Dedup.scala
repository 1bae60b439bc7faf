package graft.operators

import graft.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (builder brief):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * All stages are declarative DataFrame ops:
  *   - signatures are computed per-row inside the scan stage (no UDFs —
  *     xxhash64 / higher-order array functions, all codegen'd);
  *   - candidate generation is an equi-join on (band, band_hash) — the
  *     classic LSH shuffle, which at 100 TB partitions by band key and
  *     never materializes the O(n²) pair space;
  *   - a `bucketCap` guards the skew pathology (a degenerate band bucket
  *     with B docs contributes B² pairs; capped buckets are dropped, the
  *     standard trade-off — log-visible, not silent).
  *
  * Determinism: every hash is seeded xxhash64, every output ends in a
  * total-order sort, so results are stable across runs/partitionings.
  */
object Dedup {

  /** Exact dedup by content: one representative (min id) per identical
    * `text`, with the duplicate-group size. Hash-groupBy — map-side
    * partial aggregation, single shuffle on the text hash.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).cast("double").as("dup_count"))
      .select(col("keep_id"), col("dup_count"))
      .orderBy(col("keep_id"))

  /** Exact dedup keeping the BEST duplicate rather than the smallest
    * id — the curation rule real pipelines apply (keep the longest /
    * highest-quality version of a page; the shorter copies are
    * truncations or stale recrawls). Groups on the NORMALIZED text
    * ([[graft.functions.TextFunctions.normalize]]) so case/punct/
    * spacing variants dedupe together while their raw `rank` still
    * differs; ties break to the smallest id (ids must be
    * non-negative). Same scale shape as [[exact]]: one hash-groupBy
    * with map-side partial `max_by` — no window, no second shuffle.
    */
  def exactKeepBest(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", rank: Column): DataFrame =
    docs.groupBy(graft.functions.TextFunctions.normalize(col(textCol)).as("k"))
      .agg(
        max_by(col(idCol),
          struct(rank.as("r"), (lit(0L) - col(idCol)).as("nid"))).as("keep_id"),
        max(rank).as("keep_rank"),
        count(lit(1)).cast("double").as("dup_count"))
      .select(col("keep_id"), col("keep_rank"), col("dup_count"))
      .orderBy(col("keep_id"))

  /** Exact dedup by content digest: like [[exact]] but groups on
    * sha2-256 of the text — at 100 TB this shuffles 32-byte digests
    * instead of full documents (the standard exact-dedup shape;
    * collision probability at 2^-128 scale is below hardware error
    * rates). SHA-256 is engine-standard, so this stays oracle-checkable.
    */
  def exactByDigest(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs.select(sha2(col(textCol), 256).as("digest"), col(idCol))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).cast("double").as("dup_count"))
      .select(col("digest"), col("keep_id"), col("dup_count"))
      .orderBy(col("keep_id"))

  /** Distinct word n-gram shingles per document: (id, shingle).
    * The token array is BOUND as a column before the windowing lambda —
    * a lambda referencing the unbound split(...) expression re-splits
    * the text per window (O(len²) per doc).
    */
  def shingles(docs: DataFrame, n: Int = 3,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tokenized = docs.select(col(idCol).as("id"),
      split(col(textCol), " ").as("toks"))
    val sh = transform(
      sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
      i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))
    tokenized.select(col("id"), explode(array_distinct(sh)).as("shingle"))
  }

  /** Distinct n-gram shingle HASHES per document: (id, h). The shingle
    * identity is xxhash64 over the n token hashes — no shingle string
    * is ever materialized and the explode emits 8-byte longs, not
    * reassembled text. Collisions at 64 bits are negligible next to
    * MinHash's own sampling error. For oracle-checkable string shingles
    * (exact Jaccard, decontamination) use [[shingles]].
    */
  def shingleHashes(docs: DataFrame, n: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // BIND the token-hash array as a column before windowing: a lambda
    // referencing the unbound transform(...) expression re-evaluates it
    // per element (O(len²) per doc — measured 2.5× slower end-to-end)
    val toks = split(col(textCol), " ")
    val hashed = docs.select(col(idCol).as("id"),
      transform(toks, t => xxhash64(t)).as("hs"))
    val sh = transform(
      sequence(lit(0), greatest(size(col("hs")) - n, lit(0))),
      i => xxhash64((0 until n).map(j => get(col("hs"), i + j)): _*))
    hashed.select(col("id"), explode(array_distinct(sh)).as("h"))
  }

  /** MinHash signature per document: sig[j] = min over shingles of
    * xxhash64(j, shingle hash), j < k. One explode + one groupBy; the k
    * hashes are k codegen'd agg expressions, not k passes.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 64,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // hash each shingle ONCE ([[shingleHashes]] — composite of token
    // hashes, no string assembly); the k "permutations" re-hash the
    // fixed-width base hash (cheap) rather than re-hashing text k
    // times (dominated the signature stage, ~4x slower). Plain mul-add
    // universal hashing would be cheaper still, but wrapping Long
    // arithmetic throws under ANSI mode (Spark 4 default).
    val sh = shingleHashes(docs, n, textCol, idCol)
    val aggs = (0 until k).map(j => min(xxhash64(lit(j), col("h"))).as(s"h$j"))
    sh.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until k).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** The banded LSH hashes of a MinHash signature column: element b =
    * xxhash64(b, sig[b*r+1 .. b*r+r]). ONE definition shared by the
    * one-shot pair search ([[minhashPairs]]) and the persisted index
    * ([[MinHashIndex]]) — their agreement is what makes an index probe
    * equal a fresh full-corpus banding.
    */
  private[operators] def bandHashes(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), slice(sig, b * r + 1, r))): _*)

  /** (id, band, band_hash) banding rows from a signature frame — the
    * NARROW shape every LSH shuffle ships (never the 64-long sigs).
    */
  private[operators] def bandedRows(sigs: DataFrame, bands: Int, r: Int): DataFrame =
    sigs.select(col("id"), posexplode(bandHashes(col("sig"), bands, r)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

  /** LSH candidate pairs from MinHash signatures, with the signature-
    * estimated Jaccard. `bands` × `rowsPerBand` must equal k.
    */
  def minhashPairs(docs: DataFrame, n: Int = 3, k: Int = 64,
                   bands: Int = 16, minEstJaccard: Double = 0.5,
                   bucketCap: Int = 200,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // signatures materialized ONCE (explode+64-agg is the expensive
    // stage); everything downstream joins back to this
    minhashPairsFromSignatures(
      minhashSignatures(docs, n, k, textCol, idCol).graftCheckpoint(),
      k, bands, minEstJaccard, bucketCap)

  /** [[minhashPairs]] from an ALREADY-COMPUTED, already-materialized
    * (id, sig) signature frame — the entry point for callers that need
    * the same batch's signatures more than once (an incremental ingest
    * derives in-batch pairs AND an index probe from one signing; going
    * through [[minhashPairs]] twice would re-run the explode+k-agg
    * signature stage, the dominant cost). `k` must match the
    * signatures' length.
    */
  def minhashPairsFromSignatures(sigs: DataFrame, k: Int = 64,
                                 bands: Int = 16, minEstJaccard: Double = 0.5,
                                 bucketCap: Int = 200): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    val r = k / bands
    // banded rows are NARROW — (id, band, band_hash) only. Carrying the
    // 64-long signatures through the banding shuffle, the checkpoint and
    // both self-join legs moved ~20× more bytes for the same pairs; the
    // signatures rejoin below only for candidates that survive dedup.
    val banded = bandedRows(sigs, bands, r)

    // skew guard: drop degenerate buckets before the self-join. The
    // overloaded-bucket list is tiny → hash-agg count + broadcast
    // anti-join, NOT a window over (band, hash) (a window would
    // shuffle-sort every banded row just to count its bucket).
    val overloaded = banded.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > bucketCap)
    // the overloaded list is tiny by construction — collect it so the
    // drop is LOGGED (silent truncation reads as full coverage) and the
    // anti-join side is a literal broadcast, not a recomputed subplan
    val overRows = overloaded.collect()
    if (overRows.nonEmpty)
      System.err.println(s"[graft] minhashPairs: dropping ${overRows.length} LSH " +
        s"bucket(s) over bucketCap=$bucketCap " +
        s"(${overRows.map(_.getLong(2)).sum} banded rows) — pairs inside them are not compared")
    val spark = sigs.sparkSession
    import spark.implicits._
    val overDf = overRows.map(r => (r.getInt(0), r.getLong(1))).toSeq
      .toDF("band", "band_hash")
    val bucketed = banded
      .join(broadcast(overDf), Seq("band", "band_hash"), "left_anti")
      .graftCheckpoint()

    val a = bucketed.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = bucketed.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / k)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle. O(Σ bucket²) in shingle space — use on bounded subsets or
    * behind LSH candidates; this is the oracle-checkable ground truth
    * for [[minhashPairs]].
    */
  def jaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.5,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = shingles(docs, n, textCol, idCol)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x").join(sh.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Per-document duplicated-text fraction at n-gram granularity — the
    * exact-substring-dedup signal (cf. "Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022, re-expressed
    * Spark-first: n-gram occurrence counting instead of suffix arrays):
    * for each document, the fraction of its n-gram OCCURRENCES (every
    * position counts, repeated boilerplate inside one doc counts each
    * time) whose n-gram also appears in at least one OTHER document.
    * High dup_frac = the document is mostly text that exists elsewhere
    * in the corpus; the usual curation cut drops or trims it.
    *
    * Scale shape: the per-position explode is intrinsic (one row per
    * token, as every corpus-statistics operator here). The cross-doc
    * "appears in >1 doc" bit is a WINDOW over the md5 digest —
    * min(id) over (h) != max(id) over (h) — so the whole operator is
    * one linear pipeline: explode → one digest-keyed exchange (the
    * window) → one doc-keyed aggregate. The first draft branched the
    * exploded table into a frequency aggregate and a scoring join,
    * which forced a full disk checkpoint of the occurrence table
    * between them — measured 1.19 s → 0.92 s at sf0.1 (the explode
    * itself dominates there), but at 100 TB the removed checkpoint is
    * a corpus-sized disk materialization, which is the real win. The
    * shuffle carries fixed-width gram keys ([[gramKeys]] — a 128-bit
    * composite over pre-hashed tokens), never reassembled n-gram text —
    * same reasoning as [[exactByDigest]]. The key is INTERNAL: the
    * oracle recomputes the same (doc_id, n_grams, n_dup, dup_frac)
    * OUTPUT from its own gram identity, so the engines never compare
    * digests, only results.
    * Returns (doc_id, n_grams, n_dup, dup_frac) ordered by doc_id.
    */
  /** 128-bit positional gram key: two independently-seeded xxhash64
    * compositions over the PRE-HASHED token array — the occurrence
    * explode and its window exchange carry a 16-byte struct instead of
    * a materialized gram string md5'd to 32 hex chars (≈ 4× narrower
    * shuffle rows, and the per-gram concat_ws string assembly — the
    * dominant scan-stage cost of the n-gram family — disappears;
    * guide §2.3 narrower keys / §1.2 per-task work). 128 bits keep
    * cross-gram collisions (which could flip an `is_shared` bit)
    * below ~1e-13 even at 10^13 corpus grams, where a single 64-bit
    * key would collide millions of times at that scale. Token-level
    * 64-bit hashes feeding the composition collide only if two
    * DISTINCT TOKENS collide (≈ vocab²/2^64 — vocabularies are ≤ 10^9,
    * fine), same argument as [[shingleHashes]]. The SHARED-gram
    * semantics (min(id) ≠ max(id) over the key) and every output
    * column are unchanged — spec- and oracle-pinned.
    */
  /** `hsCol` MUST be a BOUND column holding the per-token xxhash64
    * array (the [[shingles]] O(len²) trap: passing the unbound
    * `transform(toks, xxhash64)` expression here would re-hash the
    * whole token array once per gram position — measured 1.2–1.8×
    * SLOWER end-to-end than the md5 version it replaces).
    */
  private def gramKeys(hsCol: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(hsCol) - n, lit(0))),
      i => struct(
        xxhash64((lit(1L) +: (0 until n).map(j => get(hsCol, i + j))): _*).as("h1"),
        xxhash64((lit(2L) +: (0 until n).map(j => get(hsCol, i + j))): _*).as("h2")))

  def dupNgramFraction(docs: DataFrame, n: Int = 5,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // BIND the token-hash array before the gram lambda (the
    // [[shingles]] O(len²) trap)
    val hashed = docs.select(col(idCol).as("id"),
      transform(split(col(textCol), " "), t => xxhash64(t)).as("hs"))
    val wh = Window.partitionBy(col("h"))
    hashed.select(col("id"), explode(gramKeys(col("hs"), n)).as("h"))
      .withColumn("is_shared", min(col("id")).over(wh) =!= max(col("id")).over(wh))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("is_shared"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 4))
      .orderBy(col(idCol))
  }

  /** Maximal duplicated SPANS per document: runs of >= `minRun`
    * consecutive n-gram positions whose n-gram also appears in another
    * document — [[dupNgramFraction]]'s span-level refinement. Where the
    * fraction says "this doc is 60% duplicated", the spans say WHICH
    * token ranges, so a curation pass can TRIM the boilerplate instead
    * of dropping the document (the actual remedy in Lee et al. 2022).
    *
    * Plan shape: positional gram explode ([[gramKeys]] 128-bit
    * composites again — the shuffle never carries gram text; the
    * oracle replays the OUTPUT, not the key), the min(id)≠max(id)
    * cross-doc bit as a WINDOW over the
    * digest (one linear pipeline, no checkpoint/join branch — see
    * [[dupNgramFraction]]), then gaps-and-islands (pos − row_number
    * over (doc, pos)) to contract consecutive duplicated positions
    * into one row per run — one window, keyed by doc, no self-join
    * over positions. `minRun` suppresses isolated shared grams
    * (common-phrase noise); `span_end` is the last TOKEN index covered
    * (last gram start + n − 1). Returns (doc_id, start_tok, end_tok,
    * n_shared_grams) ordered by (doc_id, start_tok).
    */
  def dupNgramSpans(docs: DataFrame, n: Int = 5, minRun: Int = 2,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = docs.select(col(idCol).as("id"),
      transform(split(col(textCol), " "), t => xxhash64(t)).as("hs"))
    val wh = Window.partitionBy(col("h"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    hashed.select(col("id"), posexplode(gramKeys(col("hs"), n)).as(Seq("pos", "h")))
      .withColumn("is_shared", min(col("id")).over(wh) =!= max(col("id")).over(wh))
      .filter(col("is_shared"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("id").as(idCol), col("grp"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + n - 1).cast("long").as("end_tok"),
        count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minRun)
      .select(col(idCol), col("start_tok"), col("end_tok"), col("n_shared_grams"))
      .orderBy(col(idCol), col("start_tok"))
  }

  /** The apply-side of [[dupNgramSpans]]: documents with every
    * qualifying duplicated span REMOVED — trim the boilerplate, keep
    * the document (Lee et al. 2022's remedy; dropping whole docs for
    * one shared paragraph throws away unique text). A token is removed
    * when any span covers its index; docs with no spans pass through
    * byte-identical. The rewrite is a scan-stage nested higher-order
    * expression (positional filter × span exists) over the
    * collect_list'd spans — per-doc span lists are small by
    * construction (bounded by grams/minRun), so the collect_list is a
    * narrow per-doc aggregate, not a corpus materialization. Returns
    * (doc_id, trimmed_text, n_removed_tokens) ordered by doc_id.
    */
  def trimDupSpans(docs: DataFrame, n: Int = 5, minRun: Int = 2,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spans = dupNgramSpans(docs, n, minRun, textCol, idCol)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("spans"))
    val toks = split(col(textCol), " ")
    val kept = filter(toks, (_, i) =>
      !exists(col("spans"), s =>
        i.cast("long") >= s("start_tok") && i.cast("long") <= s("end_tok")))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("spans").isNull, col(textCol))
          .otherwise(array_join(kept, " ")).as("trimmed_text"),
        when(col("spans").isNull, lit(0L))
          .otherwise(size(toks).cast("long") - size(kept).cast("long"))
          .as("n_removed_tokens"))
      .orderBy(col(idCol))
  }

  /** Connected components over a near-duplicate pair list (id_a, id_b)
    * by alternating large-star / small-star contraction — the standard
    * way to turn pairwise similarity into duplicate CLUSTERS (a~b, b~c
    * ⇒ {a,b,c} keep one).
    *
    * Rounds are O(log n) regardless of graph shape (vs label
    * propagation's O(diameter), which a pathological duplicate CHAIN in
    * a 100 TB corpus can stretch arbitrarily): each round hangs every
    * node's larger neighbors off its local minimum (large-star), then
    * contracts the remaining smaller neighbors onto it (small-star),
    * roughly halving every component's height. Each phase is one
    * groupBy + one join over the edge list; at the fixpoint the edges
    * ARE the star (member → min-id root) assignment. Deterministic (min
    * is order-free). Returns (id, component) with component = min
    * member.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    connectedComponents(pairs, maxIter, smallCutoff = 100000)

  /** [[connectedComponents]] with an explicit small-graph cutoff —
    * below it the (deduped, narrow) edge list is collected and solved
    * by driver-side union-find. A sub-100k-edge graph is kilobytes; the
    * distributed contraction's per-round shuffles are pure scheduling
    * overhead at that size, while DSU is O(E α(E)) in microseconds.
    * This is a bounded fast path, not the algorithm: the star
    * contraction below is the 100 TB path, and the spec pins both to
    * identical outputs.
    */
  private[graft] def connectedComponents(pairs: DataFrame, maxIter: Int,
                                         smallCutoff: Long): DataFrame =
    connectedComponents(pairs, maxIter, smallCutoff, inputCheap = false)

  private[graft] def connectedComponents(pairs: DataFrame, maxIter: Int,
                                         smallCutoff: Long,
                                         inputCheap: Boolean): DataFrame = {
    // checkpoint the (possibly expensive) pair pipeline ONCE. Ids are
    // normalized to long so the driver fast path and the distributed
    // path emit the SAME schema regardless of the input's integer width.
    // `inputCheap` callers (ClusterIndex.append contracts edges through
    // two broadcast joins of frames it ALREADY checkpointed) skip the
    // materialization: for them the fast path becomes a single bounded
    // collect, and the distributed path's extra recompute of a cheap
    // join is noise next to its per-round shuffles
    val norm = pairs.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val p = if (inputCheap) norm else norm.graftCheckpoint()
    // canonical directed pairs (big >= small) with SELF-pairs KEPT:
    // big == small marks a node that must surface as a singleton. One
    // bounded limit-collect both decides the fast path and feeds the
    // DSU — the previous shape paid four jobs here (edges checkpoint,
    // count, edges collect, selfIds collect) for a graph that is
    // kilobytes whenever the fast path applies at all, and per-job
    // scheduling overhead dominated the incremental-cluster benchmark.
    // The cutoff therefore now bounds |canonical pairs incl. self|
    // rather than |edges| — same heuristic, boundary off by the
    // self-pair count
    val canon = p.select(greatest(col("id_a"), col("id_b")).as("big"),
        least(col("id_a"), col("id_b")).as("small"))
      .distinct()
    val cap = math.min(smallCutoff, Int.MaxValue.toLong - 1).toInt
    val probe: Array[org.apache.spark.sql.Row] =
      if (cap > 0) canon.limit(cap).collect()
      else Array.empty // cutoff 0 (spec-forced distributed path): skip the probe job
    if (cap > 0 && probe.length < cap) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val known = scala.collection.mutable.Set.empty[Long]
      probe.foreach { row =>
        val (big, small) = (row.getLong(0), row.getLong(1))
        known += big; known += small // a self-pair adds its node only
        if (big != small) {
          val (a, b) = (find(big), find(small))
          // union by min id => the surviving root IS the component label
          if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        }
      }
      return known.toSeq.map(n => (n, find(n))).sorted
        .toDF("id", "component")
    }

    // distributed path: self-pairs drop out of the edge set (they carry
    // no edge) and return at the end as singleton nodes
    var edges = canon.filter(col("big") =!= col("small")).graftCheckpoint()
    val selfIds = p.filter(col("id_a") === col("id_b"))
      .select(col("id_a").as("id")).distinct()

    // convergence = identical edge set two rounds running, checked by
    // (count, hash-xor) — one scan-only aggregate, no except() join
    // (xor, not sum: summing 64-bit hashes overflows under ANSI; xor is
    // closed, and the edge sets are distinct so cancellation needs a
    // hash collision)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("big"), col("small"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prevSig = sig(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: around each center u, point every LARGER neighbor v
      // at m = min(Γ(u) ∪ {u}) — each undirected edge is processed at
      // its smaller endpoint's neighborhood
      val sym = edges.select(col("big").as("u"), col("small").as("v"))
        .unionAll(edges.select(col("small").as("u"), col("big").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("big"), least(col("mn"), col("u")).as("small"))
        .filter(col("big") =!= col("small"))
        .distinct()
      // small-star: around each center (the big endpoint), contract its
      // smaller neighbors and itself onto m = min of them
      val smins = ls.groupBy(col("big")).agg(min(col("small")).as("mn"))
      val joined = ls.join(smins, "big")
      val ss = joined.select(col("big"), col("mn").as("small"))
        .unionAll(joined.filter(col("small") =!= col("mn"))
          .select(col("small").as("big"), col("mn").as("small")))
        .distinct().graftCheckpoint()
      val s = sig(ss)
      converged = s == prevSig
      prevSig = s
      edges = ss
      i += 1
    }
    if (!converged)
      // star contraction converges in O(log n) rounds; not converging
      // inside maxIter means something is deeply wrong with the input
      System.err.println(
        s"[graft] connectedComponents: NOT converged after $maxIter iterations; components may be split")
    // fixpoint edges are (member, root) stars; roots label themselves;
    // nodes that only appeared in self-pairs are their own singletons
    val edgeLabels =
      edges.select(col("big").as("id"), col("small").as("component"))
        .unionAll(edges.select(col("small").as("id"), col("small").as("component")))
        .distinct()
    edgeLabels
      .unionAll(selfIds.join(edgeLabels, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component")))
      .orderBy(col("id"))
  }

  /** Min-label propagation to fixpoint — the O(diameter)-round ground
    * truth [[connectedComponents]]'s star contraction is spec-checked
    * against. Each node adopts the minimum id reachable so far; one
    * join + one groupBy per round with a fused convergence flag.
    */
  private[graft] def connectedComponentsLabelProp(pairs: DataFrame,
                                                  maxIter: Int = 20): DataFrame = {
    val p = pairs.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b")).graftCheckpoint()
    val edges0 = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().graftCheckpoint()
    val edges =
      if (edges0.count() < 100000) edges0.coalesce(1).graftCheckpoint()
      else edges0
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).graftCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("n_comp"))
      // carry a `changed` flag through the update so convergence is one
      // scan-only aggregate over the checkpointed result — NOT an extra
      // join+filter pass re-shuffling the labels every round
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("n_comp"), col("component")))
            .as("component"),
          (coalesce(col("n_comp"), col("component")) < col("component"))
            .as("changed"))
        .graftCheckpoint()
      converged = !next.agg(coalesce(max(col("changed")), lit(false))).head().getBoolean(0)
      labels = next.select(col("id"), col("component"))
      i += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] connectedComponentsLabelProp: NOT converged after $maxIter iterations")
    labels.orderBy(col("id"))
  }

  /** One surviving id per duplicate cluster: pairs → components → keep
    * the minimum id of each component (plus cluster size).
    */
  def clusterSurvivors(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("component"))
      .agg(min(col("id")).as("keep_id"),
        count(lit(1)).cast("double").as("cluster_size"))
      .select(col("keep_id"), col("cluster_size"))
      .orderBy(col("keep_id"))

  /** 64-bit SimHash per document: bit j set iff the sum over distinct
    * tokens of ±1 (sign = bit j of xxhash64(token)) is positive.
    *
    * Auto-dispatches per row: documents within the SWAR fold's
    * 32767-distinct-token counter width take the shuffle-free
    * [[simhashSwar]] path; wider documents are routed through
    * [[simhashViaExplode]] (identical bits, one shuffle) instead of
    * failing — a degenerate 100 TB corpus row can't abort the job.
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // ONE scan computes every signature, emitting null where the
    // document exceeds the fold's counter width; the result is
    // materialized (narrow: 16 bytes/doc), so detecting whether any
    // wide row exists is a metadata-cheap driver check, NOT a second
    // pass over the corpus text. Only when wide rows actually exist —
    // degenerate at any realistic corpus — are exactly those documents
    // re-read (semi-joined by id) through the explode ground truth.
    val swarAll = simhashSwarOrNull(docs, textCol, idCol).graftCheckpoint()
    val wideIds = swarAll.filter(col("simhash").isNull).select(col("id"))
    if (wideIds.isEmpty) swarAll
    else {
      val wide = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
        .join(broadcast(wideIds), "id")
      // checkpoint the union too: simhashPairs' self-join legs read the
      // signatures twice, and the explode recompute must not run per leg
      swarAll.filter(col("simhash").isNotNull)
        .unionByName(simhashViaExplode(wide, "__text", "id"))
        .graftCheckpoint()
    }
  }

  /** SWAR SimHash — the shuffle-free fast path. Bit-counts fold token
    * hashes into 16 longs, each packing 4 16-bit counters (counter j
    * lives in accumulator j%16, lane j/16). One narrow per-row fold —
    * no explode, no shuffle, and only 16 branches in the fold so it
    * stays inside whole-stage codegen. Past 32767 distinct tokens a
    * lane would carry into its neighbor, so such rows yield NULL (never
    * a silently-corrupt signature) and [[simhash]] reroutes them.
    */
  private def simhashSwarOrNull(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // bind the token array FIRST so the width guard below doesn't
    // re-tokenize, and so the fold is skipped (CaseWhen short-circuit),
    // not just masked: past the lane width a top-lane (bits 48-63)
    // counter crossing 32767 flips the accumulator's sign bit, which
    // ANSI Add rejects — the fold must never EXECUTE for wide rows, or
    // a ~66k-distinct-token doc aborts the job instead of dispatching
    val tokenized = docs.select(col(idCol).as("id"),
      array_distinct(split(col(textCol), " ")).as("toks"))
    val hashes = transform(col("toks"), t => xxhash64(t))
    val mask = lit(0x0001000100010001L)
    val zero = struct((0 until 16).map(k => lit(0L).as(s"a$k")): _*)
    val folded = aggregate(hashes, zero, (a, h) =>
      struct((0 until 16).map(k =>
        (a.getField(s"a$k") + shiftright(h, k).bitwiseAND(mask)).as(s"a$k")): _*))
    val staged = tokenized.select(col("id"), size(col("toks")).as("n"),
      when(size(col("toks")) <= 32767, folded).as("acc"))
    // a null acc nulls every lane extraction; the outer width guard
    // turns the resulting all-zero fold into the NULL dispatch marker
    val sim = (0 until 64).map { j =>
      val cnt = shiftright(col("acc").getField(s"a${j % 16}"), 16 * (j / 16))
        .bitwiseAND(0xffff)
      when(cnt * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    staged.select(col("id"), when(col("n") <= 32767, sim).as("simhash"))
  }

  /** Ground-truth SimHash via explode + 64 codegen'd aggregates: exactly
    * the same bits as [[simhash]], at the cost of one shuffle. Use for
    * degenerate corpora beyond the SWAR fold's 32767-distinct-token
    * counter width, and to cross-check the fold (SimHash widening spec).
    */
  def simhashViaExplode(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val toks = array_distinct(split(col(textCol), " "))
    val ex = docs.select(col(idCol).as("id"), explode(toks).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val cnts = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1)).as(s"c$j"))
    val agg = ex.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), cnts: _*)
    val sim = (0 until 64).map { j =>
      when(col(s"c$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxHamming, found via
    * pigeonhole banding on 4×16-bit chunks (any pair within distance 3
    * agrees on ≥1 chunk), then exact popcount verify.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // signatures are materialized once inside simhash (16 bytes/doc);
    // BOTH self-join legs read that checkpoint, never the token fold
    val sh = simhash(docs, textCol, idCol)
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffff)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("sim_b"))
    // popcount-verify BEFORE dedup: the cheap codegen'd bit_count
    // discards the (large) share of chunk-collision candidates inside
    // the join stage, so the dedup shuffle only carries true near-dups
    // (measured ~13× fewer rows on the fixture)
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Line-level boilerplate removal (the CCNet paragraph-dedup move):
    * drop every line whose md5 digest appears in at least `minDocFreq`
    * DISTINCT documents — navigation chrome, cookie banners and
    * licence footers repeat across pages; prose does not. Returns one
    * row per input doc: the rewritten text (surviving lines joined in
    * original order) plus kept/dropped counts — a doc whose every line
    * is boilerplate survives with empty text (the caller's length
    * filter is the right place to drop it, not a silent row loss
    * here).
    *
    * Plan shape: line explode → md5-keyed doc-frequency aggregate
    * (32-hex digests shuffle, never line text — the [[dupNgramFraction]]
    * rule) → broadcast-able boilerplate set anti-joins the lines →
    * per-doc ordered array_sort fold rebuilds the text. Two shuffles
    * (digest agg, per-doc regroup), both key-sized.
    */
  def dropBoilerplateLines(docs: DataFrame, minDocFreq: Int = 2,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    require(minDocFreq >= 2, s"dropBoilerplateLines: minDocFreq=$minDocFreq " +
      "must be >= 2 (1 would drop every non-empty line)")
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "ln")))
      .withColumn("h", md5(col("ln")))
    val boiler = lines.filter(length(col("ln")) > 0)
      .groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("h"))
    val kept = lines.join(boiler, Seq("h"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines_kept"),
        array_sort(collect_list(struct(col("pos"), col("ln")))).as("ls"))
      .select(col(idCol), col("n_lines_kept"),
        concat_ws("\n", transform(col("ls"), s => s.getField("ln"))).as("text"))
    docs.select(col(idCol),
        (size(split(col(textCol), "\n"))).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("n_lines") - coalesce(col("n_lines_kept"), lit(0L))).as("n_lines_dropped"))
  }
}

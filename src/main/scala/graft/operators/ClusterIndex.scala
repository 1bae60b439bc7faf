package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Durable duplicate-cluster assignment, maintained INCREMENTALLY: the
  * persisted form of `Dedup.connectedComponents` output, where a new
  * batch's near-dup edges (in-batch pairs + batch-vs-history hits from
  * [[MinHashIndex.neardupe]]) merge into the EXISTING cluster ids
  * without re-running connected components over history. At 100 TB
  * with daily ingest this is the missing piece between "find the new
  * batch's near-dups at batch cost" ([[MinHashIndex.append]]) and
  * "keep ONE survivor per cluster across the whole corpus": a one-shot
  * re-cluster pays the full edge history every day; this pays the
  * day's edges.
  *
  * Why the merge is EXACT, not approximate: component labels are
  * canonical min-ids. Merging components A (min 3) and B (min 7)
  * through any new edge yields min 3 — the same label a one-shot
  * run over the union of all edges would assign. So
  * `write(e1); append(e2)` produces bit-identical assignments to
  * `write(e1 ∪ e2)` (spec-pinned), with no "modulo relabeling" caveat.
  *
  * Commit protocol: [[Versioned]]. Layout (the LSM shape of the other
  * index stores — batch-scale deltas, positional replay, compaction):
  *
  * ```
  * path/
  *   v<N>/assign/  (id, component)            NEW ids only (batch-scale)
  *   v<N>/remap/   (component, new_component) merged OLD labels (tiny)
  *   v<N>/manifest.txt
  * ```
  *
  * [[assignment]] folds the chain in order: assign dirs union; each
  * remap dir relabels everything EARLIER via a broadcast join (a
  * takedown-sized map by construction — only components actually
  * merged by that batch appear). A later batch's remap is computed
  * against the already-remapped fold, so chained merges resolve
  * transitively. [[compact]] rewrites the fold as one clean assign
  * dir. Per-append cost: connected components over the BATCH's edge
  * set (contracted to representatives) plus one streaming scan of the
  * assignment chain for the representative lookup — never CC over
  * history's edges, never a re-sign.
  *
  * Ids absent from every assign dir are implicit singletons — the same
  * contract as the one-shot path, which only labels ids appearing in
  * pairs.
  */
final class ClusterIndex(spark: SparkSession, pathStr: String) {

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  def versions: Seq[Long] = Versioned.listVersions(root)

  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.txt")

  /** Cluster `pairs` (id_a, id_b) from scratch and commit the
    * assignment as the first version (or a full rebuild). Returns the
    * committed version.
    */
  def write(pairs: DataFrame): Long = synchronized {
    Versioned.commitWithRetry(root, "manifest.txt") { (_, slot, staging) =>
      Dedup.connectedComponents(pairs)
        .repartition(col("id")).sortWithinPartitions(col("id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("assign").toString)
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/assign\n")
    }
  }

  /** Merge a batch's near-dup edges into the existing clusters. The
    * edges may reference history ids freely (that is the point — the
    * cross-boundary hits from [[MinHashIndex.neardupe]] go straight
    * in, alongside the batch's in-batch pairs). Steps, all batch-scale
    * except one streaming representative lookup:
    *
    *  1. contract each edge endpoint to its current representative
    *     (its stored component, or itself if unassigned),
    *  2. connected components over the CONTRACTED edge set,
    *  3. split the result into a remap of merged OLD labels (tiny)
    *     and assignments for the NEW ids.
    *
    * An edgeless batch ([[Versioned.SkipCommit]]) commits nothing.
    * Returns the committed version.
    */
  def append(pairs: DataFrame): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no cluster index committed at $root"))
      // the batch's (possibly expensive — minhashPairs, neardupe)
      // pair pipeline runs ONCE: the materialization feeds the
      // emptiness probe, both rep joins, and CC (reliable under a
      // configured checkpoint dir for batch appends; streaming loops
      // demote it via Materialize.inTriggerScope)
      val p = graft.Materialize.checkpoint(
        pairs.select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b")))
      if (p.isEmpty) throw Versioned.SkipCommit("no edges in batch")
      // endpoint -> current representative (itself when unassigned).
      // The edge side is batch-scale: broadcast it against the ONE
      // assignment-chain scan this append pays (the semi-join prunes
      // it to batch-sized output); `was_assigned` rides along so the
      // new-id and moved-label splits below need no further chain scan.
      // `ids` is NOT separately materialized: it derives from the
      // already-checkpointed `p` by one batch-scale distinct, so
      // appearing twice in this plan (probe side + broadcast) costs
      // less than the eager checkpoint round-trip it previously paid
      // (the 4.5 s x_dedup_clusters_incremental median was dominated
      // by five per-append checkpoints; this path now pays three)
      val ids = p.select(col("id_a").as("id"))
        .unionAll(p.select(col("id_b").as("id"))).distinct()
      val reps = graft.Materialize.checkpoint(
        ids.join(assignment(Some(base)).join(broadcast(ids), Seq("id"), "left_semi"),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("component"), col("id")).as("rep"),
            col("component").isNotNull.as("was_assigned")))
      val repEdges = p
        .join(reps.select(col("id").as("id_a"), col("rep").as("rep_a")), "id_a")
        .join(reps.select(col("id").as("id_b"), col("rep").as("rep_b")), "id_b")
        .select(col("rep_a").as("id_a"), col("rep_b").as("id_b"))
      // CC over representatives: min-id labels => merged components get
      // exactly the label a one-shot over the union would. Its result
      // needs no checkpoint of its own — it has exactly ONE consumer
      // (the join below, which IS checkpointed), and CC already
      // materializes internally (driver DSU below the cutoff, its own
      // per-round checkpoints above it)
      val merged = Dedup.connectedComponents(repEdges, maxIter = 30,
          smallCutoff = 100000, inputCheap = true)
        .withColumnRenamed("id", "rep").withColumnRenamed("component", "new_comp")
      // ONE rep⋈merged join feeds BOTH deltas (it is batch-sized — one
      // row per batch endpoint): the moved OLD labels (an assigned
      // endpoint's rep IS a stored component label, so `was_assigned`
      // identifies them for free) and the NEW-id assignments. NOT
      // checkpointed: reps is, and merged is either a driver-local
      // relation (DSU fast path) or CC's internally-checkpointed
      // fixpoint, so re-deriving this broadcast-sized join costs less
      // than an eager round-trip — and the replay/no-op path (every
      // repeated bench pass) consumes it exactly once, in the flags
      // aggregate below
      val joined = reps.join(merged, Seq("rep"))
      val touched = joined
        .filter(col("was_assigned") && col("rep") =!= col("new_comp"))
        .select(col("rep").as("component"), col("new_comp").as("new_component"))
        .distinct()
      val newAssign = joined
        .filter(!col("was_assigned"))
        .select(col("id"), col("new_comp").as("component"))
      // each delta dir is written ONLY when non-empty and listed in
      // the manifest accordingly (a zero-row parquet dir has no files
      // and would brick later chain reads); a batch whose edges all
      // fall inside existing clusters changes nothing — SkipCommit.
      // ONE aggregate answers both emptiness questions (two isEmpty
      // probes were two more scheduled jobs on the hot path)
      val flags = joined.agg(
        count(when(!col("was_assigned"), lit(1))).as("n_new"),
        count(when(col("was_assigned") && col("rep") =!= col("new_comp"),
          lit(1))).as("n_moved")).head()
      val hasNew = flags.getLong(0) > 0
      val hasRemap = flags.getLong(1) > 0
      if (!hasNew && !hasRemap)
        throw Versioned.SkipCommit("batch edges change no assignments")
      if (hasNew)
        newAssign.repartition(col("id")).sortWithinPartitions(col("id"))
          .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("assign").toString)
      if (hasRemap)
        touched.coalesce(1)
          .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("remap").toString)
      Files.writeString(staging.resolve("manifest.txt"),
        (manifestDirs(base) ++
          (if (hasNew) Seq(s"v$slot/assign") else Seq.empty) ++
          (if (hasRemap) Seq(s"v$slot/remap") else Seq.empty))
          .mkString("", "\n", "\n"))
    }
  }

  /** The effective (id, component) assignment: assign dirs union in
    * manifest order; each remap dir relabels everything earlier via a
    * broadcast join (merged-label maps are takedown-sized by
    * construction).
    */
  def assignment(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no cluster index committed at $root"))
    manifestDirs(v).foldLeft(Option.empty[DataFrame]) { (acc, d) =>
      val df = spark.read.parquet(root.resolve(d).toString)
      acc match {
        case None => Some(df)
        case Some(a) if d.endsWith("/remap") =>
          Some(a.join(broadcast(df), Seq("component"), "left")
            .select(col("id"),
              coalesce(col("new_component"), col("component")).as("component")))
        case Some(a) => Some(a.unionByName(df))
      }
    }.getOrElse(throw new IllegalStateException(
      s"manifest chain at $root lists no assign directories"))
  }

  /** One surviving id per cluster (plus size) — the incremental form
    * of `Dedup.clusterSurvivors`.
    */
  def survivors(version: Option[Long] = None): DataFrame =
    assignment(version)
      .groupBy(col("component"))
      .agg(min(col("id")).as("keep_id"),
        count(lit(1)).cast("double").as("cluster_size"))
      .select(col("keep_id"), col("cluster_size"))
      .orderBy(col("keep_id"))

  /** Fold the chain into ONE clean assign dir (pure I/O — labels are
    * already canonical). Returns the committed version.
    */
  def compact(): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no cluster index committed at $root"))
      assignment(Some(base))
        .repartition(col("id")).sortWithinPartitions(col("id"))
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("assign").toString)
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/assign\n")
    }
  }

  /** Reclaim superseded versions older than `retentionMs` (never a
    * directory the live manifest references) plus stale staging dirs —
    * the shared vacuum contract. Returns versions made unprobeable.
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
        Seq("assign", "remap")
          .filterNot(c => live.contains(s"v$v/$c"))
          .foreach(c => graft.Fs.deleteTree(dir.resolve(c)))
        Files.deleteIfExists(dir.resolve("manifest.txt"))
        val children = Files.list(dir)
        val empty = try !children.iterator().hasNext finally children.close()
        if (empty) Files.delete(dir)
        if (probeable) removed += 1
      }
    }
    Versioned.reapStaleStaging(root, cutoff)
    removed
  }

  private def requireCommitted(): Unit =
    if (currentVersion.isEmpty)
      throw new IllegalStateException(s"no cluster index committed at $root")

  private def manifestDirs(version: Long): Seq[String] = {
    val mf = root.resolve(s"v$version").resolve("manifest.txt")
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"v$version at $root has no manifest.txt — not a probeable version " +
          "(vacuumed, foreign, or never committed)")
    Files.readString(mf).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

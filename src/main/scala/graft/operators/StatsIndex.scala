package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Durable incremental corpus statistics: the per-source data card
  * ([[graft.SparkEntry]]'s `x_corpus_report` computes it with a full
  * corpus scan) maintained at BATCH cost — each ingested batch commits
  * one directory of per-source partial rows, and the report merges
  * partials across the chain. The merge is exact for the additive
  * columns (doc/token/char counts — plain sums) and sketch-exact for
  * the distinct columns: Datasketches HLL unions are register-wise, so
  * `write(b1); append(b2)` reports the SAME estimates as a one-shot
  * build over `b1 ∪ b2` (spec-pinned). At 100 TB with daily ingest,
  * this is the difference between a data card that costs a corpus scan
  * per refresh and one that costs the day's batch.
  *
  * Commit protocol: [[Versioned]] (staged-complete version dirs, the
  * atomic slot rename is the commit). Layout:
  *
  * ```
  * path/
  *   v<N>/stats/       one row per source in the BATCH:
  *                     (source, n_docs, n_tokens, n_chars,
  *                      digest_hll binary, token_hll binary)
  *   v<N>/manifest.txt root-relative dirs composing the version
  * ```
  *
  * The sketches summarize distinct CONTENT DIGESTS (dedup-aware corpus
  * volume) and distinct whitespace tokens (vocabulary) per source.
  * Rows are bounded by |sources| per version — the only corpus-scale
  * work ever done is the batch's own aggregation. [[compact]] merges
  * the chain into one directory (a |sources|-row aggregation, not a
  * corpus re-scan).
  */
final class StatsIndex(spark: SparkSession, pathStr: String) {

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  def versions: Seq[Long] = Versioned.listVersions(root)

  def currentVersion: Option[Long] = Versioned.currentVersion(root, "manifest.txt")

  /** Per-source partial rows for one batch. lgK pins the sketch
    * precision for the whole chain (unions require compatible
    * configs — same contract as MinHashIndex's pinned params). Two
    * aggregation grains — doc-level counts+digest sketch, token-level
    * vocabulary sketch — joined on source; both passes are over the
    * BATCH only.
    */
  private def partials(docs: DataFrame, textCol: String, sourceCol: String,
                       lgK: Int): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"),
      col(textCol).as("__text"), split(col(textCol), " ").as("__toks"))
    val docAgg = base
      .groupBy(col("source"))
      // null text: size(null)/length(null) are null and the sketch
      // skips them — coalesce so an all-null source still counts its
      // docs instead of going null
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("__toks"))), lit(0L)).as("n_tokens"),
        coalesce(sum(length(col("__text"))), lit(0L)).as("n_chars"),
        hll_sketch_agg(sha2(col("__text"), 256), lgK).as("digest_hll"))
    val tokAgg = base
      .select(col("source"), explode(col("__toks")).as("__tok"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("__tok"), lgK).as("token_hll"))
    // LEFT join: a source whose batch rows all have null text produces
    // no exploded tokens and so no tokAgg row — an inner join would
    // silently drop its counts from the card
    docAgg.join(tokAgg, Seq("source"), "left")
  }

  /** Commit `docs`' per-source partials as the first version (or a
    * full rebuild). Returns the committed version.
    */
  def write(docs: DataFrame, textCol: String = "text",
            sourceCol: String = "source", lgK: Int = 12): Long = synchronized {
    Versioned.commitWithRetry(root, "manifest.txt") { (_, slot, staging) =>
      stage(docs, textCol, sourceCol, lgK, slot, staging, chain = Seq.empty)
    }
  }

  /** Commit a new batch's partials incrementally: the batch is
    * aggregated (batch-scale), history is never re-read. A `tag`
    * makes the append IDEMPOTENT: if any version on disk already
    * carries it, that version is returned and nothing commits — the
    * redelivery guard a streaming caller needs (an at-least-once
    * replayed trigger would otherwise double-count its partials into
    * the additive sums forever). Tags live with their version dir
    * until vacuum reclaims it, which outlasts the one-trigger
    * redelivery horizon. Returns the committed (or found) version.
    */
  def append(docs: DataFrame, textCol: String = "text",
             sourceCol: String = "source", tag: Option[String] = None): Long = synchronized {
    requireCommitted()
    // fast path only — skips the staging cost when the tag is already
    // on disk. The CORRECTNESS guard is the re-check inside the stage
    // callback below: a check out here alone is check-then-act, and
    // two processes replaying the same tagged trigger concurrently
    // could both miss and both commit, double-counting the batch's
    // partials into the additive sums forever.
    tag.flatMap(taggedVersion) match {
      case Some(seen) => seen
      case None =>
        var seenInStage = Option.empty[Long]
        val committed =
          Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
            val base = baseOpt.getOrElse(
              throw new IllegalStateException(s"no stats index committed at $root"))
            onStageEnter()
            // authoritative tag re-check, serialized by the slot CAS:
            // for a rival's same-tag commit to be missed here it must
            // publish AFTER this listing — but then it holds a slot
            // this attempt's snapshot didn't see, so this attempt's
            // own publish either collides on the same slot or targets
            // one the rival's commit proves occupied; either way the
            // rename fails and the rebase-retry re-runs this check
            // against the rival's published tag. No interleaving
            // commits the tag twice.
            tag.flatMap(taggedVersion).foreach { dup =>
              seenInStage = Some(dup)
              throw Versioned.SkipCommit(s"tag already committed as v$dup")
            }
            stage(docs, textCol, sourceCol, lgKOf(base), slot, staging,
              chain = manifestDirs(base), tag = tag)
          }
        seenInStage.getOrElse(committed)
    }
  }

  /** Test seam: invoked at the top of each append commit attempt,
    * BEFORE the tag re-check — lets a spec interleave a rival's
    * same-tag commit into the exact window the check-then-act race
    * lived in.
    */
  private[graft] var onStageEnter: () => Unit = () => ()

  private def taggedVersion(t: String): Option[Long] =
    versions.find(v => tagsOf(v).contains(t))

  /** ALL tags a version answers for: its own append tag (tag.txt)
    * plus any tags a [[compact]] folded forward (tags.txt). Without
    * the folded set, compact-then-vacuum would erase the idempotence
    * record of every batch in the chain, and an at-least-once replay
    * of the most recent trigger would double-count its partials into
    * the additive sums forever.
    */
  private def tagsOf(version: Long): Set[String] = {
    val f = root.resolve(s"v$version").resolve("tags.txt")
    val folded =
      if (Files.exists(f))
        Files.readString(f).split("\n").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty[String]
    folded ++ tagOf(version)
  }

  private def stage(docs: DataFrame, textCol: String, sourceCol: String,
                    lgK: Int, slot: Long, staging: Path,
                    chain: Seq[String], tag: Option[String] = None): Unit = {
    partials(docs, textCol, sourceCol, lgK)
      .repartition(1) // |sources| rows — one file, not 32 near-empty ones
      .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("stats").toString)
    Files.writeString(staging.resolve("lgk.txt"), s"$lgK\n")
    tag.foreach(t => Files.writeString(staging.resolve("tag.txt"), s"$t\n"))
    Files.writeString(staging.resolve("manifest.txt"),
      (chain :+ s"v$slot/stats").mkString("", "\n", "\n"))
  }

  private def tagOf(version: Long): Option[String] = {
    val f = root.resolve(s"v$version").resolve("tag.txt")
    if (Files.exists(f)) Some(Files.readString(f).trim) else None
  }

  /** The merged per-source data card across every batch in the chain:
    * exact additive counts, mean doc length, and HLL estimates of
    * distinct content digests (dedup-aware volume) and distinct
    * tokens (vocabulary). The input is Σ|sources per batch| rows —
    * never the corpus.
    */
  def report(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no stats index committed at $root"))
    manifestDirs(v).map(d => spark.read.parquet(root.resolve(d).toString))
      .reduce(_ unionByName _)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        // coalesce: a source whose every batch had null-only text has
        // null sketches — estimate 0, not null
        coalesce(hll_sketch_estimate(hll_union_agg(col("digest_hll"))), lit(0L))
          .as("distinct_docs_est"),
        coalesce(hll_sketch_estimate(hll_union_agg(col("token_hll"))), lit(0L))
          .as("distinct_tokens_est"))
      .withColumn("avg_doc_tokens",
        round(col("n_tokens").cast("double") / col("n_docs"), 4))
      .orderBy(col("source"))
  }

  /** Fold the append chain into ONE stats directory — a
    * Σ|sources|-row merge (sums + sketch unions), never a corpus
    * re-scan. Sketch unions are register-wise, so reports against the
    * compacted version are identical. Returns the committed version.
    */
  def compact(): Long = synchronized {
    requireCommitted()
    Versioned.commitWithRetry(root, "manifest.txt") { (baseOpt, slot, staging) =>
      val base = baseOpt.getOrElse(
        throw new IllegalStateException(s"no stats index committed at $root"))
      manifestDirs(base).map(d => spark.read.parquet(root.resolve(d).toString))
        .reduce(_ unionByName _)
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          hll_union_agg(col("digest_hll")).as("digest_hll"),
          hll_union_agg(col("token_hll")).as("token_hll"))
        .repartition(1)
        .write.mode(SaveMode.ErrorIfExists).parquet(staging.resolve("stats").toString)
      Files.writeString(staging.resolve("lgk.txt"), s"${lgKOf(base)}\n")
      // fold every tag on disk forward (tag.txt appends + earlier
      // compacts' tags.txt): the compacted version must keep answering
      // taggedVersion() for the whole folded history, or the replay
      // guard dies with the vacuumed chain. Over-remembering is safe —
      // a tag only ever suppresses a byte-identical replayed batch.
      // Cost: one short line per tagged append, ~3 MB per 100k
      // triggers — noise next to the data.
      val folded = versions.filter(_ <= base).flatMap(tagsOf).distinct
      if (folded.nonEmpty)
        Files.writeString(staging.resolve("tags.txt"),
          folded.mkString("", "\n", "\n"))
      Files.writeString(staging.resolve("manifest.txt"), s"v$slot/stats\n")
    }
  }

  /** Reclaim superseded versions older than `retentionMs` (never a
    * directory the live manifest references) plus stale staging dirs —
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
        if (!live.contains(s"v$v/stats"))
          graft.Fs.deleteTree(dir.resolve("stats"))
        Files.deleteIfExists(dir.resolve("manifest.txt"))
        Files.deleteIfExists(dir.resolve("lgk.txt"))
        // tag files go with the version: a compact folded them into
        // the live version's tags.txt; vacuum WITHOUT a compact only
        // reaps versions past the retention window, which is the
        // documented replay horizon
        Files.deleteIfExists(dir.resolve("tag.txt"))
        Files.deleteIfExists(dir.resolve("tags.txt"))
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
      throw new IllegalStateException(s"no stats index committed at $root")

  private def lgKOf(version: Long): Int = {
    val f = root.resolve(s"v$version").resolve("lgk.txt")
    if (!Files.exists(f))
      throw new IllegalStateException(
        s"v$version at $root has no lgk.txt — not a probeable version")
    Files.readString(f).trim.toInt
  }

  private def manifestDirs(version: Long): Seq[String] = {
    val mf = root.resolve(s"v$version").resolve("manifest.txt")
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"v$version at $root has no manifest.txt — not a probeable version " +
          "(vacuumed, foreign, or never committed)")
    Files.readString(mf).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

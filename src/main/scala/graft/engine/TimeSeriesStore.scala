package graft.engine

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Durable, mutable TS table with the reference's mutation semantics
  * (SURVEY.md §2.1 S1-S4):
  *
  *   - insert: whole batch rejected if ANY (timestamp, tag) key already
  *     exists (or repeats within the batch); at most 10 error messages
  *     (reference Handlers.hs:40-55, `take 10`)
  *   - update: values-only; every key must exist (Handlers.hs:60-65)
  *   - delete: by key; every key must exist (Handlers.hs:71-89) — minus
  *     the reference's stale-index corruption bug (SURVEY.md §2.1),
  *     which cannot exist here because every commit derives from the
  *     authoritative row set
  *   - truncate: empty-body delete resets the table (Handlers.hs:72-73)
  *
  * Storage: append-friendly versioned manifests over parquet segments,
  * tracked at PARTITION granularity.
  *
  * ```
  * path/
  *   seg-<uuid>/g_day=<d>/part-*.parquet   immutable partition data
  *   v<N>.manifest          newline list of live "seg/g_day=<d>" entries
  *   CURRENT                name of the live manifest (atomic swap)
  * ```
  *
  * Scale notes (100 TB): insert writes ONLY the new batch as a segment
  * and commits a manifest that appends its partitions — O(batch), never
  * O(store), exactly how Delta/Iceberg append works. update/delete are
  * PARTITION-SCOPED: a (timestamp, tag) key can only live in the
  * `g_day = timestamp div 86400000` partition, so both validation
  * (anti/semi joins) and the rewrite read only the touched days'
  * partitions; every untouched partition is carried forward in the new
  * manifest by pointer, its files byte-identical. A 1-row update against
  * 100 TB rewrites one day, not the store — the `MERGE WHEN MATCHED`
  * shape Delta executes, done manifest-side. Readers always see a
  * consistent manifest: the CURRENT pointer is swapped with an atomic
  * rename, which is the same all-or-nothing visibility the reference
  * gets from acid-state.
  */
final class TimeSeriesStore(spark: SparkSession, pathStr: String) {
  import QueryError.MutationErrors

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  val schema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val readSchema = schema.add(StructField("g_day", LongType, nullable = true))

  private def currentPtr: Path = root.resolve("CURRENT")

  /** One live partition: `seg/g_day=<day>`, plus a CONTENT token — the
    * identity of the day's bytes, preserved across [[compact]] (which
    * rewrites paths, not data). A data-writing commit leaves `content`
    * empty (identity = the fresh segment name, serialized as the plain
    * `seg/g_day=d` line); compaction emits `seg/g_day=d@<combined>`,
    * carrying the pre-compact identity forward — so manifest-diff
    * consumers ([[ContinuousAggregate]]) can tell MOVED from CHANGED
    * and a compacted store doesn't degrade every rollup to a full
    * recompute.
    */
  private final case class Entry(seg: String, day: Long, content: String = "") {
    def rel: String = s"$seg/g_day=$day"
    def contentId: String = if (content.isEmpty) seg else content
    def line: String =
      if (content.isEmpty || content == seg) rel else s"$rel@$content"
  }

  /** Canonical combined content id of a day spread over several entries
    * (two same-day inserts, or prior combinations being re-compacted):
    * flatten, dedupe, sort, join — so the id is independent of entry
    * order and of how many compactions produced it.
    */
  private def canonicalContent(cs: Seq[String]): String =
    cs.flatMap(_.split('+').toSeq).filter(_.nonEmpty).distinct.sorted.mkString("+")

  /** List a directory's immediate children (Files.list must be closed —
    * it holds a directory fd).
    */
  private def listDir(p: Path): Seq[String] = {
    val s = Files.list(p)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq finally s.close()
  }

  /** A `seg/g_day=<d>` line is one partition entry; a bare `seg` line
    * (manifest written by the pre-partition-entry format) expands to all
    * of that segment's day partitions — old stores keep reading. A
    * missing segment directory fails with the same documented
    * "removed by vacuum" message as a missing manifest, not an opaque
    * NoSuchFileException from the directory walk.
    */
  private def parseLine(line0: String): Seq[Entry] = {
    // `seg/g_day=d@<content>` carries a compaction-preserved content id
    val (line, content) = line0.indexOf('@') match {
      case -1 => (line0, "")
      case j  => (line0.substring(0, j), line0.substring(j + 1))
    }
    val i = line.indexOf("/g_day=")
    if (i > 0) Seq(Entry(line.substring(0, i), line.substring(i + 7).toLong, content))
    else {
      require(Files.exists(root.resolve(line)),
        s"segment $line not found (removed by vacuum?)")
      listDir(root.resolve(line)).filter(_.startsWith("g_day="))
        .map(d => Entry(line, d.stripPrefix("g_day=").toLong))
    }
  }

  private def liveEntries(): Seq[Entry] =
    if (!Files.exists(currentPtr)) Seq.empty
    else {
      val manifest = root.resolve(Files.readString(currentPtr).trim)
      Files.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty).flatMap(parseLine)
    }

  /** One scan per segment over just that segment's LIVE days: the
    * `isin` on the partition column prunes dropped/rewritten days at
    * directory level before any file is opened.
    */
  private def read(entries: Seq[Entry], verifyExists: Boolean = false): DataFrame =
    if (entries.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema)
    else entries.groupBy(_.seg).toSeq.sortBy(_._1).map { case (seg, es) =>
      // historical reads: a reaped path must fail with the documented
      // vacuum message, not Spark's PATH_NOT_FOUND or a SILENTLY
      // missing partition. Checked per DAY ENTRY, not just per segment
      // dir — vacuum reaps single orphaned day dirs inside live
      // segments, so an old manifest can reference a day whose
      // directory is gone while the segment itself survives; without
      // this check that read would quietly return partial data. Only
      // versionAsOf pays the per-entry stat: CURRENT entries are live
      // by the commit/vacuum invariants.
      if (verifyExists) es.foreach { e =>
        require(Files.exists(root.resolve(e.rel)),
          s"partition ${e.rel} not found (removed by vacuum?)")
      }
      else require(Files.exists(root.resolve(seg)),
        s"segment $seg not found (removed by vacuum?)")
      spark.read.schema(readSchema).parquet(root.resolve(seg).toString)
        .filter(col("g_day").isin(es.map(_.day): _*))
    }.reduce(_ unionByName _) // filters/pruning push into every child scan

  /** Snapshot read of the current table state (carries the `g_day`
    * partition column; [[QueryEngine]] uses it for pruning and excludes
    * it from outputs).
    */
  def current(): DataFrame = read(liveEntries())

  /** The CURRENT snapshot's physical identity: absolute segment-dir
    * path → live day set — exactly the (rootPath, g_day-isin) pairs a
    * [[current]] plan's parquet leaves carry. [[RollupSqlRewrite]]
    * compares a candidate plan's leaves against this to prove the plan
    * reads the store's current version (a stale snapshot DataFrame must
    * NOT be rewritten to a fresher rollup — snapshot isolation).
    */
  @volatile private var sigMemo: Option[(Long, Map[String, Set[Long]])] = None

  private[engine] def snapshotSignature: Map[String, Set[Long]] = {
    // memoized by version: the SQL routing rule consults this per
    // query; the manifest only changes when the version moves, so a
    // hot server pays one pointer read, not a manifest parse
    val v = version
    sigMemo match {
      case Some((mv, sig)) if mv == v => sig
      case _ =>
        val sig = liveEntries().groupBy(_.seg).map { case (seg, es) =>
          root.resolve(seg).toAbsolutePath.normalize.toString -> es.map(_.day).toSet
        }
        sigMemo = Some((v, sig))
        sig
    }
  }

  /** Absolute normalized store root — the registry key for SQL-level
    * rollup routing. */
  private[engine] def rootDir: String =
    root.toAbsolutePath.normalize.toString

  /** Whether a committed version's manifest is still on disk (false
    * after vacuum reaps it) — the cheap existence probe rollup base
    * memoization uses to notice a reaped diff base without a version
    * bump. */
  private[engine] def manifestExists(version: Long): Boolean =
    Files.exists(root.resolve(s"v$version.manifest"))

  /** Time travel: snapshot read of a specific committed version
    * (Delta's `VERSION AS OF` analogue). Works because manifests and
    * segments are immutable — superseded versions stay readable until
    * [[vacuum]] reaps them; a vacuumed version fails loudly here.
    */
  def versionAsOf(version: Long): DataFrame = {
    val m = root.resolve(s"v$version.manifest")
    require(Files.exists(m),
      s"version $version not found (never committed, or removed by vacuum)")
    read(Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty).flatMap(parseLine),
      verifyExists = true)
  }

  /** Committed versions still present on disk, ascending. Strict
    * v<digits>.manifest match so a stray foreign file never crashes
    * the parse. */
  def versions: Seq[Long] =
    listDir(root).flatMap("^v(\\d+)\\.manifest$".r.findFirstMatchIn(_))
      .map(_.group(1).toLong).sorted

  /** Snapshot restricted to the given day buckets — the partition-scoped
    * working set for a mutation batch. Reads (and later rewrites) ONLY
    * the manifest entries for those days.
    */
  private def subset(entries: Seq[Entry], days: Set[Long]): DataFrame =
    read(entries.filter(e => days.contains(e.day)))

  /** Day buckets touched by a batch. Collected to the driver: a batch's
    * distinct-day count is bounded by the batch (and in practice by the
    * ingest window), never by the store.
    */
  private def touchedDays(b: DataFrame): Set[Long] =
    b.select(expr("timestamp div 86400000").as("d")).distinct()
      .collect().map(_.getLong(0)).toSet

  /** Segments are hive-partitioned by day bucket (`g_day = timestamp
    * div 86400000`): a time-range query prunes whole directories before
    * any file is opened — the scale path for the reference's
    * timestamp-index slicing. [[QueryEngine]] derives `g_day` bounds
    * from `timestamp` predicates (Catalyst can't invert the div).
    *
    * Returns one manifest [[Entry]] per day partition actually written
    * (an empty input writes no partitions and yields no entries).
    */
  private def writeSegment(df: DataFrame): Seq[Entry] = {
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    df.select(col("timestamp"), col("tag"), col("value"))
      .withColumn("g_day", expr("timestamp div 86400000"))
      // cluster the batch by (g_day, tag, timestamp) BEFORE the
      // partitioned write: partitionBy fans every INPUT partition out
      // into every day directory it touches, so an N-partition batch
      // writes up to N small files per day — every later pruned read
      // then pays N file opens/listings per day instead of one
      // (guide §6 small-files). The range exchange makes each output
      // task hold a contiguous (day, tag, ts) slice: day directories
      // get one (occasionally two) well-sized files, a day too large
      // for one task still splits by tag/ts instead of hot-spotting a
      // single hash bucket, and the sort below stays a cheap local pass.
      .repartitionByRange(col("g_day"), col("tag"), col("timestamp"))
      // tag-major clustering within each day partition (the reference's
      // tag index is tag → ts → row, Model.hs:92): row groups carry
      // tight parquet min/max stats on BOTH tag (contiguous tag runs)
      // and timestamp (still sorted within each run), so a pushed
      // tagEq predicate skips foreign row groups and tagEq+range skips
      // within the run too. Pure sub-day range scans give up row-group
      // ts-skipping (every tag run spans the day) but are already
      // bounded to one day's partition by directory pruning.
      .sortWithinPartitions(col("g_day"), col("tag"), col("timestamp"))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("g_day").parquet(root.resolve(seg).toString)
    // two sidecars per day partition, from ONE aggregation pass over
    // the just-written batch:
    //  - `.tags`: 8 KiB tag bloom (see [[TagBloom]]) — the partition-
    //    level tag index [[currentForTag]] prunes with;
    //  - `.stats`: 48-byte (rows, Σvalue, min/max value, min/max ts) —
    //    the partition stats [[MetaStats]] answers day-aligned scalar
    //    aggregates from without opening a single data file.
    // Written BEFORE the commit that makes the segment reachable, like
    // the data files themselves (a crash orphan is vacuumed whole);
    // toLocalIterator keeps the driver at one row however many days a
    // compaction rewrites. Dot-named, so parquet scans ignore them.
    //
    // Aggregated from the JUST-WRITTEN segment files, not the input
    // DataFrame: the caller's cache of the batch is best-effort, and a
    // nondeterministic source recomputed after block eviction could
    // make input-derived sidecars disagree with the written bytes — a
    // bloom false negative would then silently drop rows from pruned
    // reads, the one failure mode the sidecar design promises never
    // happens (round-9 ADVICE #2). Reading the segment back costs one
    // extra pass over the batch (OS-cache-warm, local to the mutation),
    // and the sidecars are derived from the exact bytes they index.
    TagBloom.register(df.sparkSession)
    df.sparkSession.read
      .schema("timestamp LONG, tag STRING, value DOUBLE, g_day LONG")
      .parquet(root.resolve(seg).toString)
      .groupBy(col("g_day")).agg(
        TagBloom.tagBloom(col("tag")).as("bloom"),
        count(lit(1)).as("rows"),
        sum(col("value")).as("vsum"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        min(col("timestamp")).as("tmin"),
        max(col("timestamp")).as("tmax"))
      .toLocalIterator().asScala.foreach { r =>
        val dayDir = root.resolve(seg).resolve(s"g_day=${r.getLong(0)}")
        Files.write(dayDir.resolve(TagSidecar), r.getAs[Array[Byte]]("bloom"))
        Files.write(dayDir.resolve(StatsSidecar), DayStats(
          r.getAs[Long]("rows"), r.getAs[Double]("vsum"),
          r.getAs[Double]("vmin"), r.getAs[Double]("vmax"),
          r.getAs[Long]("tmin"), r.getAs[Long]("tmax")).toBytes)
      }
    listDir(root.resolve(seg)).filter(_.startsWith("g_day="))
      .map(d => Entry(seg, d.stripPrefix("g_day=").toLong)).sortBy(_.day)
  }

  private val TagSidecar = ".tags"
  private val StatsSidecar = ".stats"

  /** Cached sidecar blooms, keyed by (segment, day) — immutable once
    * written (segments never change), so the cache never invalidates;
    * None (missing/unreadable sidecar, e.g. a pre-sidecar store) means
    * "cannot prune", never an error.
    */
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[Array[Byte]]]()

  /** Bound the sidecar caches on a long-lived server: entries are
    * immutable but the KEY SPACE grows with history × mutation churn
    * (every rewritten partition is a fresh key; superseded ones are
    * never touched again). 16k blooms ≈ 128 MB — past that, clear and
    * let the hot working set re-fault in (one small file read each;
    * an LRU would buy little over this for append-mostly keys).
    */
  private val SidecarCacheCap = 16384

  private def tagMightContain(e: Entry, tag: String): Boolean = {
    if (bloomCache.size > SidecarCacheCap) bloomCache.clear()
    bloomCache.computeIfAbsent((e.seg, e.day), { _ =>
      val p = root.resolve(e.rel).resolve(TagSidecar)
      try { if (Files.exists(p)) Some(Files.readAllBytes(p)) else None }
      catch { case _: java.io.IOException => None }
    }).forall(TagBloom.mightContain(_, tag))
  }

  /** Snapshot read pruned to the partitions that MAY contain `tag` —
    * the reference's tag-index scan (`_sIx`, SURVEY.md §1.2) at
    * partition granularity: an episodic tag (present in a handful of
    * days across years of history) opens only those days' files, and
    * the bloom's no-false-negative guarantee makes the pruned read
    * row-identical to `current().filter(tag === t)` (TagPruneSpec law).
    * [[QueryEngine.execute]]'s engine-routed path uses this for every
    * tagEq query that falls through to raw scan.
    */
  def currentForTag(tag: String): DataFrame =
    read(liveEntries().filter(tagMightContain(_, tag)))

  /** How many live partitions a tagEq scan would open vs the total —
    * the pruning-effectiveness probe specs and soaks assert on. */
  private[graft] def partitionCountForTag(tag: String): (Int, Int) = {
    val es = liveEntries()
    (es.count(tagMightContain(_, tag)), es.size)
  }

  /** Cached `.stats` sidecars, same lifecycle as [[bloomCache]]. */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[DayStats]]()

  private def statsSidecar(e: Entry): Option[DayStats] = {
    if (statsCache.size > SidecarCacheCap) statsCache.clear()
    statsCache.computeIfAbsent((e.seg, e.day), { _ =>
      val p = root.resolve(e.rel).resolve(StatsSidecar)
      try {
        if (Files.exists(p)) DayStats.fromBytes(Files.readAllBytes(p)) else None
      } catch { case _: java.io.IOException => None }
    })
  }

  /** The live partition list with each entry's `.stats` sidecar (None
    * for pre-sidecar segments) — [[MetaStats]]' planning surface. A day
    * spread over several entries (two same-day inserts) appears once
    * per entry; stats merge by (+, +, min, max, min, max).
    */
  private[graft] def liveDayStats(): Seq[(Long, Option[DayStats])] =
    liveEntries().map(e => (e.day, statsSidecar(e)))

  /** Snapshot read pruned to the partitions that can contain timestamp
    * `ts` — the reference's timestamp-index point probe (`_tIx`,
    * SURVEY.md §1.2) at partition granularity: the key's day bucket
    * narrows to one day, and within it the `.stats` sidecars' ts ranges
    * drop same-day sibling segments that can't hold it (a missing
    * sidecar keeps its partition — never wrong, just unpruned). Every
    * row with timestamp == ts survives, so any query whose predicate
    * conjoins `timestamp = ts` — including the engine's tsEq guard
    * counts — is exact over this read; a point MISS often prunes to an
    * EMPTY plan, making the no-data probe I/O-free. Engine raw
    * fallback uses this for tsEq queries without tagEq (with tagEq the
    * tag-pruned read must win: the tag-existence guard counts the tag
    * over every partition that may hold it anywhere in time).
    */
  def currentForTs(ts: Long): DataFrame = {
    val d = Math.floorDiv(ts, 86400000L)
    read(liveEntries().filter(e => e.day == d &&
      statsSidecar(e).forall(s => ts >= s.tsMin && ts <= s.tsMax)))
  }

  /** Partitions a tsEq probe would open vs the total (spec probe). */
  private[graft] def partitionCountForTs(ts: Long): (Int, Int) = {
    val d = Math.floorDiv(ts, 86400000L)
    val es = liveEntries()
    (es.count(e => e.day == d &&
      statsSidecar(e).forall(s => ts >= s.tsMin && ts <= s.tsMax)), es.size)
  }

  /** The session this store reads/writes with (for engine components
    * that must build literal result frames). */
  private[engine] def session: SparkSession = spark

  /** Atomically publish a new manifest listing `entries`.
    *
    * The manifest move stays put-if-absent (no REPLACE_EXISTING): a
    * second store instance racing on the same version number hits
    * FileAlreadyExistsException instead of silently overwriting a
    * committed manifest. [[insert]] treats that signal as a CAS
    * failure and retries on the winner's published state; the
    * rewriting mutations surface it loudly (their work is computed
    * from the lost base). A crash between the manifest move and the
    * CURRENT swap leaves an orphan v<N> no reader can reach — it is
    * SKIPPED, never deleted: the next commit targets one past the
    * highest manifest on disk, so a racing writer's just-moved
    * manifest (indistinguishable from a crash orphan in that window)
    * is never destroyed, and true orphans are reaped by [[vacuum]]
    * once superseded.
    */
  /** Single-writer commit for the REWRITING mutations: `base` must be
    * the [[baseVersion]] observed BEFORE the caller read the state its
    * `entries` were computed from. Recomputing the base here would let
    * a rewrite racing a cross-process [[insert]] publish on a fresh
    * version number over the insert's batch — the silent drop
    * [[publish]]'s CAS exists to prevent. With the base pinned, that
    * race collides on the version slot and fails loudly
    * (`FileAlreadyExistsException`), which is the rewrite contract:
    * their segments are computed FROM the base state, so a lost race
    * invalidates the work.
    */
  private def commit(entries: Seq[Entry], base: Long): Unit =
    synchronized { publish(entries, base) }

  private def currentVersionNum: Long =
    if (!Files.exists(currentPtr)) -1L
    else Files.readString(currentPtr).trim
      .stripPrefix("v").stripSuffix(".manifest").toLong

  /** The version a commit must build on: the highest of CURRENT and any
    * manifest on disk (stepping past crash orphans, which are skipped,
    * never adopted or deleted).
    */
  private def baseVersion(): Long =
    math.max(currentVersionNum, versions.lastOption.getOrElse(-1L))

  /** Publish `entries` as version `base + 1` — EXACTLY one past the
    * state the caller computed `entries` from, so the put-if-absent
    * move is a true compare-and-swap: if any other writer has taken
    * that slot since the caller read its base, the move throws
    * `FileAlreadyExistsException` ([[insert]]'s CAS failure signal;
    * the single-writer paths surface it loudly). Targeting a RECOMPUTED
    * max instead would let a lost race publish a fresh version number
    * on a stale base and silently drop the rival's batch.
    */
  private def publish(entries: Seq[Entry], base: Long): Unit = {
    val version = base + 1L
    val name = s"v$version.manifest"
    val target = root.resolve(name)
    val tmp = Files.createTempFile(root, ".tmp-manifest", "")
    try {
      Files.writeString(tmp, entries.map(_.line).mkString("\n"))
      // the CAS itself is a hard-link creation, NOT a rename:
      // Files.move(ATOMIC_MOVE) maps to POSIX rename(2), which silently
      // REPLACES an existing target — it can never be put-if-absent.
      // createLink fails atomically with FileAlreadyExistsException
      // when the slot is taken, and the target appears fully written
      // (it IS the completed temp file's inode)
      Files.createLink(target, tmp)
    } finally Files.deleteIfExists(tmp)
    val tmpPtr = Files.createTempFile(root, ".tmp-current", "")
    Files.writeString(tmpPtr, name)
    // last-wins by design: version numbers are totally ordered and the
    // loser of this swap has already durably linked its manifest
    Files.move(tmpPtr, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** After losing the manifest CAS: wait (bounded) until CURRENT names
    * a version ≥ the rival manifest, so the retry rebases on the
    * winner's PUBLISHED state. Rebasing on CURRENT immediately would
    * race the winner's pointer swap and silently drop its batch from
    * the retried manifest; a rival manifest whose CURRENT swap never
    * lands (a writer crashed inside its commit window) fails loudly
    * here rather than being adopted or destroyed.
    */
  private def awaitRivalVisible(timeoutMs: Long = 5000L): Unit = {
    val rival = versions.lastOption.getOrElse(-1L)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (currentVersionNum < rival) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"manifest v$rival exists but CURRENT never advanced " +
            "(writer crashed mid-commit?); cannot safely rebase — " +
            "vacuum the orphan and retry")
      Thread.sleep(50)
    }
  }

  /** ≤10 formatted conflict messages from a key DataFrame. */
  private def keyErrors(keys: DataFrame, fmt: (Long, String) => String): Seq[String] =
    keys.select(col("timestamp"), col("tag"))
      .orderBy(col("timestamp"), col("tag")).limit(10).collect()
      .map(r => fmt(r.getLong(0), r.getString(1))).toSeq

  /** S1 — all-or-nothing append. In-process mutations serialize on the
    * store instance (acid-state's single-writer model); ACROSS
    * processes, insert is a bounded CAS retry loop: appends compose, so
    * after losing the manifest put-if-absent race it re-reads the
    * winner's published state, RE-VALIDATES the batch against it (the
    * winner may have claimed a key), and re-commits the already-written
    * segment on the new base — both racing writers land. Readers never
    * block. Rewriting mutations (update/delete/compact) stay
    * single-writer: their segments are computed FROM the base state, so
    * a lost race invalidates the work and fails loudly instead.
    *
    * The conflict check joins the batch against ONLY the partitions for
    * the batch's own days — a key (t, g) can exist nowhere else.
    */
  def insert(batch: Dataset[TS]): Either[MutationErrors, Unit] = this.synchronized {
    val b = batch.toDF().cache()
    try {
      // an empty batch is a no-op (the reference appends nothing) —
      // committing a data-less segment would grow the read fan-in
      if (b.isEmpty) return Right(())
      val withinDup = b.groupBy(col("timestamp"), col("tag"))
        .count().filter(col("count") > 1)
      // timestamps are nonnegative epoch millis BY CONTRACT, enforced
      // here at the store's only row-creating seam: every piece of day
      // math downstream (`g_day = timestamp div 86400000` at write,
      // floorDiv probes in currentForTs/dropDaysBefore, MetaStats'
      // [d·D, (d+1)·D) coverage, the rollups' pmod bucketing) agrees
      // only on nonnegative inputs — a row at ts=−1000 would land in
      // g_day=0 under `div` while the point probe looks in day −1,
      // making the pruned lookup silently miss it (round-9 ADVICE #1).
      val negErrs = keyErrors(b.filter(col("timestamp") < 0),
        (t, g) => s"Negative timestamp not supported: ($t, $g).")
      val dupErrs = negErrs ++
        keyErrors(withinDup, (t, g) => s"Duplicate key in batch: ($t, $g).")
      // the batch's segment is written once and reused across retries
      // (segments are content-immutable); if a retry's re-validation
      // rejects the batch it stays behind as an age-guarded orphan for
      // [[vacuum]], same as a crashed commit's
      var seg: Seq[Entry] = null
      val maxAttempts = 5
      var attempt = 0
      while (true) {
        // a manifest ahead of CURRENT is either a racing writer about
        // to swap (wait for it — validating against its pre-swap view
        // would drop its batch) or a crash orphan. Only a STALE one
        // (past the grace window) may be stepped past after the wait
        // times out: a fresh one could be a live-but-stalled writer
        // whose batch a rebase would silently drop, so that stays the
        // loud failure
        if (versions.lastOption.getOrElse(-1L) > currentVersionNum)
          try awaitRivalVisible()
          catch {
            case e: IllegalStateException =>
              val rival = root.resolve(s"v${versions.lastOption.getOrElse(-1L)}.manifest")
              val graceMs = 60000L
              if (Files.exists(rival) && System.currentTimeMillis() -
                  Files.getLastModifiedTime(rival).toMillis < graceMs)
                throw e
          }
        // base is read BEFORE and re-checked AFTER the entries read: a
        // rival committing in between would leave us holding version
        // base+1's slot-claim with version base's entries — the
        // re-check turns that torn snapshot into a retry instead of a
        // silently dropped rival batch
        val base = baseVersion()
        val entries = liveEntries()
        if (baseVersion() != base) {
          attempt += 1
          if (attempt >= maxAttempts)
            throw new IllegalStateException(
              s"insert: store at $root kept advancing under $maxAttempts retries")
        } else {
          val existing = b.join(subset(entries, touchedDays(b)),
            Seq("timestamp", "tag"), "left_semi")
          val errs = dupErrs ++
            keyErrors(existing, (t, g) => s"""Timestamp = $t and tag = "$g" already exists.""")
          if (errs.nonEmpty) return Left(MutationErrors(errs.take(10)))
          if (seg == null) seg = writeSegment(b)
          try { publish(entries ++ seg, base); return Right(()) }
          catch {
            case e: java.nio.file.FileAlreadyExistsException =>
              attempt += 1
              if (attempt >= maxAttempts) throw e
              awaitRivalVisible()
          }
        }
      }
      Right(()) // unreachable — the loop exits via return
    } finally b.unpersist()
  }

  /** S2 — values-only update; all keys must exist. A key repeated
    * within one batch is rejected (the reference applies list-ordered
    * last-write-wins, which has no deterministic meaning for a
    * distributed batch — all-or-nothing rejection keeps it exact).
    *
    * Partition-scoped: validates against and rewrites ONLY the day
    * partitions containing batch keys; all other partitions are carried
    * forward by manifest pointer, files untouched.
    */
  def update(batch: Dataset[TS]): Either[MutationErrors, Unit] = this.synchronized {
    val b = batch.toDF().cache()
    try {
      // no keys => no-op (like insert): don't write an orphan empty
      // segment and churn a byte-identical manifest version
      if (b.isEmpty) return Right(())
      val base = baseVersion() // pinned BEFORE the state read (see commit)
      val entries = liveEntries()
      val days = touchedDays(b)
      val touched = subset(entries, days)
      val withinDup = b.groupBy(col("timestamp"), col("tag"))
        .count().filter(col("count") > 1)
      // a key's row can only live in its own day's partition, so the
      // touched subset decides existence exactly as the full store would
      val missing = b.join(touched, Seq("timestamp", "tag"), "left_anti")
      val errs =
        keyErrors(withinDup, (t, g) => s"Duplicate key in batch: ($t, $g).") ++
          keyErrors(missing, (t, g) => s"""Timestamp = $t and tag = "$g" not found.""")
      if (errs.nonEmpty) Left(MutationErrors(errs.take(10)))
      else {
        val updated = touched.as("s")
          .join(b.withColumnRenamed("value", "new_value").as("u"),
            Seq("timestamp", "tag"), "left")
          .select(col("timestamp"), col("tag"),
            coalesce(col("new_value"), col("value")).as("value"))
        commit(entries.filterNot(e => days.contains(e.day)) ++ writeSegment(updated), base)
        Right(())
      }
    } finally b.unpersist()
  }

  /** S3 — delete by key; all keys must exist (a key listed twice in
    * one batch deletes once). Partition-scoped like [[update]]: only the
    * days containing batch keys are read and rewritten. A day whose rows
    * are all deleted simply yields no partition in the replacement
    * segment, so it drops out of the manifest.
    */
  def delete(keys: Dataset[TSKey]): Either[MutationErrors, Unit] = this.synchronized {
    val k = keys.toDF().dropDuplicates("timestamp", "tag").cache()
    try {
      if (k.isEmpty) return Right(()) // no keys => no-op, like insert
      val base = baseVersion() // pinned BEFORE the state read (see commit)
      val entries = liveEntries()
      val days = touchedDays(k)
      val touched = subset(entries, days)
      val missing = k.join(touched, Seq("timestamp", "tag"), "left_anti")
      val errs = keyErrors(missing, (t, g) => s"""Timestamp = $t and tag = "$g" not found.""")
      if (errs.nonEmpty) Left(MutationErrors(errs))
      else {
        val remaining = touched.join(k, Seq("timestamp", "tag"), "left_anti")
        commit(entries.filterNot(e => days.contains(e.day)) ++ writeSegment(remaining), base)
        Right(())
      }
    } finally k.unpersist()
  }

  /** S4 — truncate (reference: DELETE with empty body). */
  def truncate(): Unit = this.synchronized { commit(Seq.empty, baseVersion()) }

  /** Retention policy (the TimescaleDB `drop_chunks` / InfluxDB
    * retention analogue): drop every day partition STRICTLY older than
    * `cutoffMs`'s day bucket. Manifest-only — no data is read or
    * rewritten, so the cost is O(manifest) regardless of how much
    * history is dropped (at 100 TB this is the difference between a
    * pointer update and a table rewrite). Day-granular by design, like
    * chunk-granular drop_chunks: rows in the cutoff's own (partial)
    * day survive. Dropped partitions stay readable via [[versionAsOf]]
    * until [[vacuum]] reaps them. Returns the partition count dropped.
    */
  def dropDaysBefore(cutoffMs: Long): Int = this.synchronized {
    val cutoffDay = Math.floorDiv(cutoffMs, 86400000L)
    val base = baseVersion()
    val entries = liveEntries()
    val (drop, keep) = entries.partition(_.day < cutoffDay)
    if (drop.nonEmpty) commit(keep, base)
    drop.size
  }

  /** Current committed version number (−1 before the first commit). */
  def version: Long = currentVersionNum

  /** The live (segment, day) partition list — the manifest diff surface
    * [[ContinuousAggregate]] uses to find changed days.
    */
  private[graft] def currentPartitions(): Seq[(String, Long)] =
    liveEntries().map(e => (e.seg, e.day))

  /** Current snapshot restricted to the given day buckets (carries
    * `g_day`) — the partition-scoped read an incremental refresh pays.
    */
  private[graft] def currentForDays(days: Set[Long]): DataFrame =
    subset(liveEntries(), days)

  /** Live segment count (grows by 1 per insert until compaction). */
  def segmentCount: Int = liveEntries().map(_.seg).distinct.size

  /** Merge all live segments into one — bounds the per-read union fan-in
    * after many appends (the Delta/Iceberg OPTIMIZE analogue). Readers
    * holding older manifests are unaffected (segments are immutable).
    * The new entries CARRY each day's content id forward (data moved,
    * not changed), so a [[ContinuousAggregate]] refresh across a
    * compaction recomputes nothing.
    */
  def compact(): Unit = this.synchronized {
    if (segmentCount > 1) {
      val base = baseVersion() // pinned BEFORE the state read (see commit)
      val combined = liveEntries().groupBy(_.day).map { case (d, es) =>
        d -> canonicalContent(es.map(_.contentId))
      }
      commit(writeSegment(current()).map(e => e.copy(content = combined(e.day))),
        base)
    }
  }

  /** Per-day content map of the current version — the compaction-aware
    * diff surface [[ContinuousAggregate]] uses: a day's data changed
    * iff its content id changed (compaction moves bytes; ids carry).
    */
  private[graft] def contentByDay(): Map[Long, String] =
    contentOf(liveEntries())

  /** Same for a committed version; fails with the documented message
    * when vacuum has reaped it (callers fall back to a full recompute).
    */
  private[graft] def contentByDayAsOf(version: Long): Map[Long, String] = {
    val m = root.resolve(s"v$version.manifest")
    require(Files.exists(m),
      s"version $version not found (never committed, or removed by vacuum)")
    contentOf(Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
      .flatMap(parseLine))
  }

  private def contentOf(es: Seq[Entry]): Map[Long, String] =
    es.groupBy(_.day).map { case (d, g) => d -> canonicalContent(g.map(_.contentId)) }

  /** Delete paths unreferenced by the CURRENT manifest — unreachable
    * segment directories, orphaned day partitions inside live segments,
    * superseded manifests — the Delta VACUUM analogue, bounding disk
    * growth after mutations/compaction. Returns the number of paths
    * removed.
    *
    * `retentionMs` is the Delta-style grace period: only paths whose
    * last modification is older than now − retentionMs are reaped. That
    * protects (a) an IN-FLIGHT commit — its freshly-written segment /
    * just-moved manifest is seconds old, regardless of how object
    * stores report directory times (the previous guard compared against
    * the published manifest's mtime, which object stores don't preserve
    * faithfully), and (b) readers still holding recent pre-vacuum
    * snapshots. The default keeps an hour of history; pass 0 for the
    * reap-everything maintenance mode (the zero-retention trade: any
    * concurrent reader/writer loses its files). Version numbers stay
    * monotonic because [[commit]] steps past every manifest on disk,
    * reaped or not.
    */
  def vacuum(retentionMs: Long = 3600000L): Int = this.synchronized {
    require(retentionMs >= 0, s"vacuum: retentionMs=$retentionMs must be >= 0")
    val cutoff = System.currentTimeMillis() - retentionMs
    def oldEnough(p: Path): Boolean =
      Files.getLastModifiedTime(p).toMillis < cutoff
    val liveBySeg = liveEntries().groupBy(_.seg).map { case (s, es) =>
      s -> es.map(d => s"g_day=${d.day}").toSet
    }
    val currentName =
      if (Files.exists(currentPtr)) Some(Files.readString(currentPtr).trim) else None
    val curVersion = currentName
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).getOrElse(-1L)
    var removed = 0
    def rmTree(p: Path): Unit = { graft.Fs.deleteTree(p); removed += 1 }
    listDir(root).foreach { name =>
      if (name.startsWith("seg-")) liveBySeg.get(name) match {
        case None => // whole segment unreachable (possibly an in-flight
          // commit's fresh segment — the age guard is what protects it)
          if (oldEnough(root.resolve(name)))
            rmTree(root.resolve(name))
        case Some(liveDays) => // partition-scoped mutations orphan single
          // day dirs inside otherwise-live segments — reap those too
          listDir(root.resolve(name))
            .filter(d => d.startsWith("g_day=") && !liveDays.contains(d))
            .map(d => root.resolve(name).resolve(d))
            .filter(oldEnough)
            .foreach(rmTree)
      }
      // STRICT v<digits>.manifest match — a stray x.manifest in the
      // store dir must be skipped, not crash the toLong
      else "^v(\\d+)\\.manifest$".r.findFirstMatchIn(name).foreach { m =>
        if (m.group(1).toLong < curVersion && oldEnough(root.resolve(name))) {
          Files.delete(root.resolve(name))
          removed += 1
        }
      }
    }
    removed
  }
}

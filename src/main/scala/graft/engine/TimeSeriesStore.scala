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
  * Storage: append-friendly versioned manifests over parquet segments.
  *
  * ```
  * path/
  *   seg-<uuid>/part-*.parquet   immutable data segments
  *   v<N>.manifest               newline list of live segment dirs
  *   CURRENT                     name of the live manifest (atomic swap)
  * ```
  *
  * Scale notes (100 TB): insert writes ONLY the new batch as a segment
  * and commits a manifest that appends it — O(batch), never O(store),
  * exactly how Delta/Iceberg append works. update/delete here rewrite
  * into a single compacted segment — correct but O(store); on a real
  * cluster those two become `MERGE WHEN MATCHED THEN UPDATE/DELETE`
  * over a partitioned Delta table (the validation anti-joins below are
  * unchanged). Readers always see a consistent manifest: the CURRENT
  * pointer is swapped with an atomic rename, which is the same
  * all-or-nothing visibility the reference gets from acid-state.
  */
final class TimeSeriesStore(spark: SparkSession, pathStr: String) {
  import QueryError.MutationErrors

  private val root: Path = Paths.get(pathStr)
  Files.createDirectories(root)

  val schema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private def currentPtr: Path = root.resolve("CURRENT")

  private def liveSegments(): Seq[String] =
    if (!Files.exists(currentPtr)) Seq.empty
    else {
      val manifest = root.resolve(Files.readString(currentPtr).trim)
      Files.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty)
    }

  /** Snapshot read of the current table state (carries the `g_day`
    * partition column; [[QueryEngine]] uses it for pruning and excludes
    * it from outputs).
    */
  def current(): DataFrame = {
    val segs = liveSegments().map(s => root.resolve(s).toString)
    val readSchema = schema.add(StructField("g_day", LongType, nullable = true))
    if (segs.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema)
    else segs.map(s => spark.read.schema(readSchema).parquet(s))
      .reduce(_ unionByName _) // filters/pruning push into every child scan
  }

  /** Segments are hive-partitioned by day bucket (`g_day = timestamp
    * div 86400000`): a time-range query prunes whole directories before
    * any file is opened — the scale path for the reference's
    * timestamp-index slicing. [[QueryEngine]] derives `g_day` bounds
    * from `timestamp` predicates (Catalyst can't invert the div).
    */
  private def writeSegment(df: DataFrame): String = {
    val seg = s"seg-${java.util.UUID.randomUUID().toString.take(8)}"
    df.select(col("timestamp"), col("tag"), col("value"))
      .withColumn("g_day", expr("timestamp div 86400000"))
      // time-sorted row groups → tight parquet min/max stats, so
      // sub-day range predicates skip row groups inside each partition
      .sortWithinPartitions(col("g_day"), col("timestamp"))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("g_day").parquet(root.resolve(seg).toString)
    seg
  }

  /** Atomically publish a new manifest listing `segs`. */
  private def commit(segs: Seq[String]): Unit = synchronized {
    val version = if (!Files.exists(currentPtr)) 0L
      else Files.readString(currentPtr).trim.stripPrefix("v").stripSuffix(".manifest").toLong + 1
    val name = s"v$version.manifest"
    val tmp = Files.createTempFile(root, ".tmp-manifest", "")
    Files.writeString(tmp, segs.mkString("\n"))
    Files.move(tmp, root.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    val tmpPtr = Files.createTempFile(root, ".tmp-current", "")
    Files.writeString(tmpPtr, name)
    Files.move(tmpPtr, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** ≤10 formatted conflict messages from a key DataFrame. */
  private def keyErrors(keys: DataFrame, fmt: (Long, String) => String): Seq[String] =
    keys.select(col("timestamp"), col("tag"))
      .orderBy(col("timestamp"), col("tag")).limit(10).collect()
      .map(r => fmt(r.getLong(0), r.getString(1))).toSeq

  /** S1 — all-or-nothing append. Mutations are serialized through the
    * store instance (acid-state's single-writer model): the whole
    * validate → write-segment → commit sequence holds the lock, so a
    * concurrent writer can't commit a manifest computed from a stale
    * segment list (lost-update race). Readers never block.
    */
  def insert(batch: Dataset[TS]): Either[MutationErrors, Unit] = this.synchronized {
    val b = batch.toDF().cache()
    try {
      // an empty batch is a no-op (the reference appends nothing) —
      // committing a data-less segment would grow the read fan-in
      if (b.isEmpty) return Right(())
      val withinDup = b.groupBy(col("timestamp"), col("tag"))
        .count().filter(col("count") > 1)
      val existing = b.join(current(), Seq("timestamp", "tag"), "left_semi")
      val errs =
        keyErrors(withinDup, (t, g) => s"Duplicate key in batch: ($t, $g).") ++
          keyErrors(existing, (t, g) => s"""Timestamp = $t and tag = "$g" already exists.""")
      if (errs.nonEmpty) Left(MutationErrors(errs.take(10)))
      else {
        val seg = writeSegment(b)
        commit(liveSegments() :+ seg)
        Right(())
      }
    } finally b.unpersist()
  }

  /** S2 — values-only update; all keys must exist. A key repeated
    * within one batch is rejected (the reference applies list-ordered
    * last-write-wins, which has no deterministic meaning for a
    * distributed batch — all-or-nothing rejection keeps it exact).
    */
  def update(batch: Dataset[TS]): Either[MutationErrors, Unit] = this.synchronized {
    val b = batch.toDF().cache()
    try {
      val withinDup = b.groupBy(col("timestamp"), col("tag"))
        .count().filter(col("count") > 1)
      val missing = b.join(current(), Seq("timestamp", "tag"), "left_anti")
      val errs =
        keyErrors(withinDup, (t, g) => s"Duplicate key in batch: ($t, $g).") ++
          keyErrors(missing, (t, g) => s"""Timestamp = $t and tag = "$g" not found.""")
      if (errs.nonEmpty) Left(MutationErrors(errs.take(10)))
      else {
        val updated = current().as("s")
          .join(b.withColumnRenamed("value", "new_value").as("u"),
            Seq("timestamp", "tag"), "left")
          .select(col("timestamp"), col("tag"),
            coalesce(col("new_value"), col("value")).as("value"))
        val seg = writeSegment(updated)
        commit(Seq(seg)) // compaction: new segment replaces all
        Right(())
      }
    } finally b.unpersist()
  }

  /** S3 — delete by key; all keys must exist (a key listed twice in
    * one batch deletes once).
    */
  def delete(keys: Dataset[TSKey]): Either[MutationErrors, Unit] = this.synchronized {
    val k = keys.toDF().dropDuplicates("timestamp", "tag").cache()
    try {
      val missing = k.join(current(), Seq("timestamp", "tag"), "left_anti")
      val errs = keyErrors(missing, (t, g) => s"""Timestamp = $t and tag = "$g" not found.""")
      if (errs.nonEmpty) Left(MutationErrors(errs))
      else {
        val remaining = current().join(k, Seq("timestamp", "tag"), "left_anti")
        val seg = writeSegment(remaining)
        commit(Seq(seg))
        Right(())
      }
    } finally k.unpersist()
  }

  /** S4 — truncate (reference: DELETE with empty body). */
  def truncate(): Unit = this.synchronized { commit(Seq.empty) }

  /** Live segment count (grows by 1 per insert until compaction). */
  def segmentCount: Int = liveSegments().size

  /** Merge all live segments into one — bounds the per-read union fan-in
    * after many appends (the Delta/Iceberg OPTIMIZE analogue). Readers
    * holding older manifests are unaffected (segments are immutable).
    */
  def compact(): Unit = this.synchronized {
    if (segmentCount > 1) {
      val seg = writeSegment(current())
      commit(Seq(seg))
    }
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
import scala.collection.concurrent.TrieMap

/** Central reader/cache for the driver-provided parquet tables
  * (/root/repo/TESTDATA.md).
  *
  * Each table is read once per (session, dir) and cached (`.cache()`):
  * the reference store is RAM-resident (SURVEY.md §6), so keeping the
  * working set cached is both parity-faithful and what Bench needs —
  * per-query parquet re-reads would dominate the measurement.
  *
  * At 100 TB the same code path works uncached: every downstream query
  * is a plain filter/agg over the scan, so Parquet column pruning,
  * predicate pushdown and row-group skipping still apply; caching is a
  * local-bench optimization, disable with `graft.cacheTables=false`.
  */
object Tables {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def cachingEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.cacheTables").forall(_.toBoolean)

  /** Repartition a table before caching it. The fixtures are ONE
    * single-row-group parquet file each, so the natural scan
    * parallelism is 1 — every compute-heavy scan stage (n-gram
    * explodes, minhash folds) then runs single-threaded no matter how
    * many cores the session has (measured: the 0.54 s scrub stage of
    * x_pipeline_curation_v2 ran as ONE task on local[32]). Caching is
    * the local-bench RAM-resident emulation; spreading the cached
    * blocks across `defaultParallelism` partitions is part of that
    * emulation (the reference serves queries from memory with full
    * parallelism). SCALE-ADAPTIVE, not a constant: local[N] derives N
    * from SPARK_GRAFT_CPUS, a cluster from its executor cores. The
    * uncached path (100 TB deployments set graft.cacheTables=false) is
    * untouched — there the parquet layout itself provides the splits
    * and an unconditional repartition would be a corpus-wide shuffle.
    */
  private def spreadForCache(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, dir, name)
    cache.getOrElseUpdate(key, {
      // Some fixture generations write events.ts as parquet
      // TIMESTAMP(NANOS), which Spark's TimestampType (micros) cannot
      // hold; this conf reads that variant as a Long nanos column.
      // Micros fixtures are unaffected (they read as TIMESTAMP_NTZ) —
      // [[tsMillis]] adapts to whichever shape arrived.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // Fixture physical types have drifted between rounds before
      // (round 6: LONG nanos → TIMESTAMP micros). The TIMESTAMP arm of
      // [[tsMillis]] is shape-safe, but a LONG column is trusted to be
      // NANOS — a LONG-millis/micros generation would silently corrupt
      // every timestamp by 10^6/10^3. Guard at read time, once per
      // cache entry, on a bounded sample (one row-group even at 100 TB).
      if (name == "events" && df.schema.fieldNames.contains("ts") &&
          df.schema("ts").dataType == LongType)
        assertLongTsIsNanos(df, s"$dir/$name.parquet")
      if (cachingEnabled(spark)) spreadForCache(spark, df).cache() else df
    })
  }

  /** Magnitude guard for LONG `ts` columns: after the nanos→millis
    * projection the observed epochs must land in a plausible millis
    * window (the fixtures span 2024+; [1.6e12, 2.1e12] ≈ 2020-09 →
    * 2036-07). A LONG-micros fixture would project to ~1.7e9 and a
    * LONG-millis one to ~1.7e6 — both fail loudly here instead of
    * silently corrupting every downstream timestamp.
    */
  private[graft] def assertLongTsIsNanos(df: DataFrame, path: String): Unit = {
    val row = df.limit(10000)
      .agg(min(expr("ts div 1000000")), max(expr("ts div 1000000"))).head()
    if (!row.isNullAt(0)) {
      val (lo, hi) = (row.getLong(0), row.getLong(1))
      val (winLo, winHi) = (1600000000000L, 2100000000000L)
      if (lo < winLo || hi > winHi) throw new IllegalStateException(
        s"events.ts at $path is LONG but not plausibly epoch NANOS: " +
          s"after `div 1e6` the sampled range is [$lo, $hi] millis, outside " +
          s"[$winLo, $winHi] (2020-09..2036-07). The fixture was likely " +
          "written as LONG millis or micros; fix Tables.tsMillis's LongType " +
          "arm or regenerate the fixture — refusing to read silently-corrupt " +
          "timestamps.")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Epoch-millis projection of an events-shaped frame's `ts` column,
    * adaptive to how the fixture was physically written:
    *   - LONG        → Long epoch nanos (nanosAsLong read of
    *                   TIMESTAMP(NANOS)); integer `div` keeps full
    *                   precision (double division loses bits > 2^53)
    *   - TIMESTAMP / TIMESTAMP_NTZ → micros; under the UTC session the
    *                   NTZ→LTZ cast is an identity and `unix_millis`
    *                   truncates to millis
    * Both floor like DuckDB `epoch_ms` for these positive epochs, so
    * oracle SQL stays `epoch_ms(ts)` either way.
    */
  def tsMillis(df: DataFrame): Column = tsMillis(df.schema("ts").dataType)

  /** Schema-level variant for callers that only hold a `StructType`
    * (e.g. a streaming read, where the frame is built from a declared
    * schema rather than an eager parquet scan). */
  def tsMillis(dt: DataType): Column = dt match {
    case LongType => expr("ts div 1000000").cast("long")
    case TimestampType | TimestampNTZType => unix_millis(col("ts").cast("timestamp"))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other (expected LONG nanos or TIMESTAMP)")
  }

  /** The canonical TS store view (FIXTURES.md §4): the `events` fixture
    * projected onto the reference's record
    * (reference server/src/Repository/Model.hs:77-82):
    *   timestamp = epoch millis of `ts` (Long; floor, = DuckDB epoch_ms)
    *   tag       = event_type
    *   value     = value
    * `(timestamp, tag)` is unique in the fixture at every SF (verified),
    * matching the reference's primary-key constraint (README.md:63).
    */
  def ts(spark: SparkSession, dir: String): DataFrame = {
    val key = (spark, dir, "__ts_view__")
    cache.getOrElseUpdate(key, {
      val ev = events(spark, dir)
      val df = ev.select(
        tsMillis(ev).as("timestamp"),
        col("event_type").as("tag"),
        col("value"))
      if (cachingEnabled(spark)) df.cache() else df
    })
  }

  /** DuckDB-side equivalent of [[ts]], usable as a FROM subquery. */
  val tsOracleFrom: String =
    """(SELECT epoch_ms(ts) AS "timestamp", event_type AS tag, value FROM events)"""

  /** Second, larger TS view (FIXTURES.md §4): lineitem as a time series —
    * shipdate millis × returnflag tag × extendedprice value. ~6× the
    * events row count at every SF; (timestamp, tag) is NOT unique here,
    * which exercises multi-row timestamp groups at scale.
    */
  def tsLineitem(spark: SparkSession, dir: String): DataFrame = {
    val key = (spark, dir, "__ts_lineitem__")
    cache.getOrElseUpdate(key, {
      // l_shipdate reads as TIMESTAMP_NTZ; the UTC session makes the
      // cast to (LTZ) timestamp an identity, matching DuckDB epoch_ms
      val df = lineitem(spark, dir).select(
        unix_millis(col("l_shipdate").cast("timestamp")).as("timestamp"),
        col("l_returnflag").as("tag"),
        col("l_extendedprice").as("value"))
      if (cachingEnabled(spark)) df.cache() else df
    })
  }

  /** DuckDB-side equivalent of [[tsLineitem]]. */
  val tsLineitemOracleFrom: String =
    """(SELECT epoch_ms(l_shipdate) AS "timestamp", l_returnflag AS tag, l_extendedprice AS value FROM lineitem)"""

  /** Drop all cached entries (test hygiene). */
  def clear(): Unit = { cache.values.foreach(_.unpersist()); cache.clear() }
}

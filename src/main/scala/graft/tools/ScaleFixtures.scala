package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-soak fixture generator: writes a `factor`× variant of a
  * driver fixture dir so the heaviest queries can be MEASURED (not
  * asserted) at 10× — `args = <srcDir> <outDir> [factor]`.
  *
  * Scaling must preserve the workload's distributional shape, not just
  * its row count:
  *   - `documents`: `factor` copies under fresh ids; copies beyond the
  *     first carry a deterministic hash-order PERMUTATION of the token
  *     multiset plus a ~1/8 copy-salted token replacement. The
  *     permutation breaks n-gram identity (MinHash/Jaccard); the
  *     replacement breaks ORDER-INVARIANT fingerprints too (simhash —
  *     without it, permuted copies were signature-identical twins and
  *     the pair join measured `factor`²-deep duplicate clusters, a
  *     fixture artifact, not the operator). Token COUNTS are preserved
  *     exactly (1:1 swap); token/vocab FREQUENCIES (LM, heavy-hitter,
  *     quality paths) are ~7/8 preserved, with the remainder moved to
  *     per-copy salted variants.
  *   - `events`: `factor` copies under fresh event/user ids, with
  *     copy k's timestamps displaced +k ms (unique under the TS
  *     store's (timestamp, tag) primary key; residual sub-factor-ms
  *     collisions deduped) — more users at 10× density over the same
  *     window, which is how an event stream actually grows. Per-user
  *     history length (session/funnel state) stays constant.
  *   - everything else is copied verbatim (file-level).
  *
  * Deterministic end-to-end: ids shift by computed offsets, the
  * permutation keys are xxhash64 — no RNG, so two runs produce
  * byte-comparable corpora. The `ts` column's VALUES are copied
  * verbatim, but not necessarily its physical type: a TIMESTAMP(NANOS)
  * source is read under `nanosAsLong` and therefore REWRITTEN as plain
  * INT64 epoch nanos (the nanos logical annotation is dropped); a
  * TIMESTAMP-micros source round-trips as timestamp. Spark readers
  * adapt to either shape via [[graft.sources.Tables.tsMillis]], but a
  * DuckDB oracle over a scaled-from-nanos output would resolve
  * `epoch_ms(ts)` to the BIGINT overload (millis→timestamp
  * CONSTRUCTOR, not a projection) and silently produce wrong values —
  * scaled fixtures are soak inputs, NOT oracle inputs (FIXTURES.md).
  */
object ScaleFixtures {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor=$factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def copies(df: DataFrame): DataFrame = {
      val k = explode(sequence(lit(0), lit(factor - 1))).as("k")
      df.select(col("*"), k)
    }

    // ---- documents: fresh ids + per-copy hash-order token permutation
    // + a ~1/8 copy-salted token REPLACEMENT. The permutation breaks
    // n-gram identity (MinHash/Jaccard paths), but simhash is
    // ORDER-INVARIANT over the token multiset — permuted copies were
    // simhash-IDENTICAL twins, so duplicate-cluster depth grew with
    // `factor` and the pigeonhole pair join exploded quadratically
    // (measured round 13: x_dedup_simhash 425 s at 50×, dominated by
    // 2500-deep true-positive pair output — a fixture artifact, not
    // operator scaling; real corpora don't deepen every duplicate
    // cluster linearly with corpus size). Swapping ~1/8 of positions
    // to a copy-salted variant flips enough signature bits that copies
    // stop being fingerprint-twins under ANY order-invariant measure,
    // while token COUNTS stay exact (1:1 swap) and head-of-Zipf
    // frequencies stay ~7/8 preserved (stated in the class doc).
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val idSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val toks = split(col("text"), " ")
    // struct sort key: (hash, token) — array_sort orders by field 1
    // then 2, so equal-hash ties (repeated tokens) stay deterministic
    val permuted = concat_ws(" ",
      transform(
        array_sort(transform(toks, (t, i) => {
          val h = xxhash64(col("doc_id"), col("k"), t, i)
          struct(h.as("h"),
            when(pmod(h, lit(8)) === 0,
              concat(t, lit("~"), col("k").cast("string"))).otherwise(t).as("t"))
        })),
        s => s.getField("t")))
    copies(docs)
      .withColumn("text", when(col("k") === 0, col("text")).otherwise(permuted))
      .withColumn("doc_id", col("doc_id") + col("k") * idSpan)
      .drop("k")
      .repartition(col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    // ---- events: fresh event/user ids; copy k's timestamps displace
    // by +k MILLISECONDS. The displacement exists for the TS-store
    // family: the engine's primary key is (ms timestamp, event_type),
    // so verbatim-timestamp copies made every cagg/ts3 fixture load
    // fail with duplicate keys at factor > 1 (measured in round 12 —
    // 50 of 214 bench queries errored at the 10x fixture). A ≤(factor
    // −1) ms perturbation is invisible to every window/density shape
    // the queries measure (minute-scale gaps, hour/day buckets).
    // Residual collisions — an original same-tag pair closer than
    // `factor` ms — dedupe away below with a DETERMINISTIC survivor
    // (min event_id per key; round-12 ADVICE #4: a shuffle-order
    // survivor made regenerated fixtures differ run to run, quietly
    // confounding soak comparisons across regenerations and
    // contradicting the class doc's determinism claim).
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    val Array(evSpan, userSpan) = events
      .agg(max(col("event_id")), max(col("user_id"))).head() match {
        case r => Array(r.getLong(0) + 1L, r.getLong(1) + 1L)
      }
    val tsIsLong = events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType // nanos-as-long source
    copies(events)
      .withColumn("event_id", col("event_id") + col("k") * evSpan)
      .withColumn("user_id", col("user_id") + col("k") * userSpan)
      .withColumn("ts",
        if (tsIsLong) col("ts") + col("k") * lit(1000000L)
        else expr("timestampadd(MILLISECOND, k, ts)")) // TS and NTZ both
      .withColumn("__ms", graft.sources.Tables.tsMillis(events))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__ms"), col("event_type"))
          .orderBy(col("event_id")))) // event_id is unique post-shift
      .filter(col("__rn") === 1)
      .drop("k", "__ms", "__rn")
      .repartition(col("event_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    // ---- the rest: verbatim copies (parquet dirs or single files);
    // a Spark-written table is a DIRECTORY named *.parquet, so the
    // copy must walk — a flat Files.copy would land an empty dir and
    // every query over it would silently run on zero rows
    val scaled = Set("documents.parquet", "events.parquet")
    val src = java.nio.file.Paths.get(srcDir)
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val w = java.nio.file.Files.walk(from)
      try w.iterator().forEachRemaining { p =>
        val dst = to.resolve(from.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally w.close()
    }
    val s = java.nio.file.Files.list(src)
    try s.iterator().forEachRemaining { p =>
      val name = p.getFileName.toString
      if (!scaled.contains(name) && name.endsWith(".parquet"))
        copyTree(p, java.nio.file.Paths.get(outDir).resolve(name))
    } finally s.close()

    println(s"[scale-fixtures] wrote $outDir at ${factor}x " +
      s"(docs=${spark.read.parquet(s"$outDir/documents.parquet").count()}, " +
      s"events=${spark.read.parquet(s"$outDir/events.parquet").count()})")
    spark.stop()
  }
}

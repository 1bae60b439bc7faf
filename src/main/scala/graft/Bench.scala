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

  /** Parse a perquery-format baseline file: the per-query median map
    * plus the run's load_avg. WHITESPACE-TOLERANT by spec — round 8's
    * regression alarm died silently because the committed baseline had
    * been pretty-printed while the scan demanded compact JSON.
    * BenchBaselineSpec pins this against BOTH formats and against the
    * committed bench_baseline.json itself.
    */
  private[graft] def parseBaseline(txt: String): (Map[String, Double], Option[Double]) = {
    val qmap = raw""""queries"\s*:\s*\{""".r.findFirstMatchIn(txt) match {
      case None => Map.empty[String, Double]
      case Some(m) =>
        val body = txt.substring(m.end, txt.indexOf('}', m.end))
        raw""""([^"]+)"\s*:\s*(-?[0-9.eE+-]+)""".r.findAllMatchIn(body)
          .map(g => g.group(1) -> g.group(2).toDouble).toMap
    }
    // prefer the pre-run ambient sample (r9+ baselines); older files
    // only carry the post-run load_avg
    val load = raw""""load_avg_ambient"\s*:\s*(-?[0-9.eE+-]+)""".r
      .findFirstMatchIn(txt).map(_.group(1).toDouble)
      .orElse(raw""""load_avg"\s*:\s*(-?[0-9.eE+-]+)""".r
        .findFirstMatchIn(txt).map(_.group(1).toDouble))
    (qmap, load)
  }

  /** The baseline run's per-query [min, max] spread — the noise band
    * the regression flag must clear (a median inside the baseline's
    * own observed range is machine noise, not a plan change).
    * Whitespace-tolerant like [[parseBaseline]]. */
  private[graft] def parseBaselineSpread(txt: String): Map[String, Double] =
    parseBaselineSpreadFull(txt).map { case (k, (_, hi)) => k -> hi }

  /** Full [lo, hi] spread bands — [[graft.tools.MergeBaseline]] unions
    * these across boots. */
  private[graft] def parseBaselineSpreadFull(txt: String): Map[String, (Double, Double)] =
    raw""""spread"\s*:\s*\{""".r.findFirstMatchIn(txt) match {
      case None => Map.empty
      case Some(m) =>
        // the spread section nests arrays, so scan to its matching
        // close: entries look like "name":[lo,hi]
        val rest = txt.substring(m.end)
        val end = {
          var depth = 1; var i = 0
          while (depth > 0 && i < rest.length) {
            rest.charAt(i) match {
              case '{' => depth += 1
              case '}' => depth -= 1
              case _ => ()
            }
            i += 1
          }
          i - 1
        }
        raw""""([^"]+)"\s*:\s*\[\s*(-?[0-9.eE+-]+)\s*,\s*(-?[0-9.eE+-]+)\s*\]""".r
          .findAllMatchIn(rest.substring(0, end))
          .map(g => g.group(1) -> (g.group(2).toDouble, g.group(3).toDouble)).toMap
    }

  /** Per-entry boot provenance (`"boots": {"q": 3, …}`) — how many
    * independent JVM boots the entry's band unions. A baseline file
    * without the section (a raw single-run perquery file) reads as
    * every entry at 1 boot. Round-9 lesson: a single-boot band
    * under-estimates boot-to-boot variance ~3× on this box, so the
    * regression alarm's first driver outing flagged five same-commit
    * false positives — BenchBaselineSpec now rejects a committed
    * baseline carrying any single-boot entry. */
  private[graft] def parseBaselineBoots(txt: String): Map[String, Int] =
    raw""""boots"\s*:\s*\{""".r.findFirstMatchIn(txt) match {
      case None => Map.empty
      case Some(m) =>
        val body = txt.substring(m.end, txt.indexOf('}', m.end))
        raw""""([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(body)
          .map(g => g.group(1) -> g.group(2).toInt).toMap
    }

  /** All ambient-load samples the baseline unions (`"ambients":[…]`),
    * oldest first; empty for single-run files. */
  private[graft] def parseBaselineAmbients(txt: String): Seq[Double] =
    raw""""ambients"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt) match {
      case None => Seq.empty
      case Some(m) =>
        raw"-?[0-9.eE+-]+".r.findAllIn(m.group(1)).map(_.toDouble).toSeq
    }

  /** Per-query regression flag, gated on the MIN of the 3 timed passes
    * (round-11 verdict: the alarm went 0-for-3 on driver runs — r9
    * false positives, r10 abstention, r11 false positives — because a
    * load burst landing on one or two passes lifts the MEDIAN out of
    * band while the MIN stays put; BENCH_r11's `ts3_cagg_sql_window_1d`
    * shipped a 5.58× median flag with its min pass sitting AT the band
    * edge. A true plan regression lifts all three passes, so the min is
    * the load-robust witness; a burst SUSTAINED across all three
    * passes of a sub-second query can still fool it — boot 4 of round
    * 12 measured exactly that shape at ambient 1.9 — which is why (a)
    * run-level uniform inflation withholds the whole per-query map,
    * see [[regressionVerdict]], and (b) the committed baseline unions
    * IDLE boots' bands only — MergeBaseline's desensitization guard
    * refuses a uniformly-inflated boot). Kept
    * conditions: `base > 0` (entry must
    * exist), `med > 0.2` (sub-noise-floor absolute times are never
    * signal), `med/base ≥ 1.25` (the headline ratio still reports the
    * median). New condition: the MIN pass must ALSO clear the
    * baseline's 22-boot observed MAX by 15% — any single pass inside
    * anything ever observed same-code is machine noise by definition.
    */
  private[graft] def regressionFlag(med: Double, min: Double,
                                    base: Double, hi: Double): Boolean =
    base > 0 && med > 0.2 && med / base >= 1.25 &&
      min >= hi * 1.15 && med >= hi * 1.15

  /** Uniform-inflation cutoff for the run's median med/baseline ratio.
    * Idle boots on this box measure 1.23–1.26 (the baseline median is
    * the best-ever-observed, so even a clean run sits ~1.25); the two
    * load-contaminated round-12 runs measured 1.607 and 1.859. 1.4
    * splits the populations with margin on both sides. */
  private[graft] val UniformInflationCutoff = 1.4

  /** Steal-contamination cutoff for the run's whole-run CPU-steal
    * share (percent of all ticks the hypervisor withheld). Clean boots
    * on this box measure ~0.03%; the round-13 boot the median-ratio
    * cutoff missed by 0.001 (ratio 1.399 — per-query flags would have
    * shipped) recorded 2.79% — host-level contention the loadavg gates
    * cannot see. 1.0 splits the two populations with more than a
    * decade of margin on each side. */
  private[graft] val StealContaminationCutoff = 1.0

  /** The run's recorded whole-run CPU-steal share (`"steal_pct":N`);
    * None where absent, null (no /proc/stat on the box), or malformed —
    * the permissive charclass can capture tails like "2.5e" that
    * .toDouble rejects, and a crash here would take down the whole
    * bench verdict over a diagnostics field (ADVICE r13 #2). */
  private[graft] def parseStealPct(txt: String): Option[Double] =
    raw""""steal_pct"\s*:\s*(-?[0-9][0-9.eE+-]*)""".r.findFirstMatchIn(txt)
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)

  /** The run-level regression verdict — medianRatio, the per-query
    * flag map, and an optional loud-abstention note. Factored out of
    * main so BenchBaselineSpec can law it.
    *
    * UNIFORM-INFLATION GUARD (round-12 verdict #1 — the alarm's 4th
    * consecutive driver outing shipped phantom flags): the min-of-3
    * gate is robust to load BURSTS but not to a load PLATEAU spanning
    * the whole run — sustained ambient load (r12 driver: ambient 4.92,
    * 96% of ALL 216 queries >1.25× baseline, run median 1.859) lifts
    * all three passes of every query together, and per-query flags
    * then measure the machine, not the code. When the run's own median
    * med/baseline ratio shows that shape (≥ [[UniformInflationCutoff]]),
    * the per-query map is WITHHELD with a note saying why — the same
    * loud-abstention shape the load-incomparable branch uses. Evidence
    * the cutoff works: it abstains on BENCH_r12 (median 1.859, all 16
    * driver flags refuted by idle boots at the same HEAD) and on the
    * r12 judge's contaminated re-run (1.607, 28 disjoint phantom
    * flags), while every idle boot (1.23–1.26) keeps full flagging
    * power.
    */
  private[graft] def regressionVerdict(medians: Seq[(String, Double)],
                                       mins: Map[String, Double],
                                       baseline: Map[String, Double],
                                       baselineHi: Map[String, Double],
                                       loadComparable: Boolean,
                                       stealPct: Option[Double] = None)
      : (Option[Double], Seq[(String, Double)], Option[String]) = {
    // the ONE robust cross-run drift number: the median of per-query
    // med/baseline ratios. Individual sub-2s queries flap up to ~3×
    // same-code across boots on this box (measured, baseline note), so
    // per-query flags need the band guard — but their MEDIAN is stable
    // to a few percent and moves only when the code broadly does (or
    // the machine is loaded, which is exactly what the guard detects).
    val medianRatio: Option[Double] =
      if (!loadComparable || baseline.isEmpty) None
      else {
        val rs = medians.flatMap { case (k, m) =>
          baseline.get(k).collect { case b if b > 0 && m > 0 => m / b }
        }.sorted
        if (rs.isEmpty) None
        else Some(BigDecimal(rs(rs.size / 2))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val inflated = medianRatio.exists(_ >= UniformInflationCutoff)
    // STEAL GUARD (round-13): a boot can sit 0.001 UNDER the median
    // cutoff while the hypervisor withheld 2.79% of all cpu ticks —
    // direct evidence the timings measured a contended host. Steal is
    // measured, not inferred, so it withholds flags on its own even
    // when the ratio shape looks borderline-clean.
    val stolen = stealPct.exists(_ >= StealContaminationCutoff)
    val note =
      if (stolen) Some(f"steal-contaminated (run steal_pct " +
        f"${stealPct.get}%.2f%%, clean boots ~0.03%%): per-query flags " +
        "withheld — the hypervisor withheld cpu across the run; rerun " +
        "when the host is quiet")
      else if (inflated)
        Some(s"uniform-inflation (run medianRatio ${medianRatio.get}): " +
        "per-query flags withheld — every query inflated together, which " +
        "measures the machine, not the code; rerun at idle")
      else None
    val regressions =
      if (!loadComparable || inflated || stolen) Seq.empty[(String, Double)]
      else medians.flatMap { case (k, med) =>
        // flag rule lives in [[regressionFlag]] (min-of-3 gated,
        // BenchBaselineSpec-lawed): ambient load lifts medians, not
        // mins, so the min pass is the witness a plan change must move
        baseline.get(k).collect {
          case base if regressionFlag(med, mins.getOrElse(k, med),
              base, baselineHi.getOrElse(k, base)) =>
            k -> BigDecimal(med / base)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }.sortBy(-_._2).take(5)
    (medianRatio, regressions, note)
  }

  /** Comparability verdict for a run's pre-Spark ambient load against
    * the baseline's boot provenance: comparable iff the run ambient is
    * within `tol` of the NEAREST boot ambient the baseline unions.
    * Each boot's band evidence was gathered AT its recorded ambient,
    * and the committed bands are unions across those boots — so a run
    * landing near ANY boot's ambient has load-comparable evidence in
    * the band by construction (a run INSIDE the observed ambient range
    * is always within tol of some boot, since MergeBaseline only
    * unions real samples). Pre-provenance single-run baselines fall
    * back to the scalar `load_avg_ambient`. Round-10 lesson: gating on
    * the single scalar ruled the driver run (ambient 2.58) incomparable
    * against a baseline whose own boots spanned 0.62–2.29 — the alarm
    * abstained on evidence it was already carrying. Returns
    * (comparable, description-of-the-reference-point). */
  private[graft] def ambientComparable(runAmbient: Double,
                                       bootAmbients: Seq[Double],
                                       scalarAmbient: Option[Double],
                                       tol: Double = 1.0): (Boolean, String) =
    if (bootAmbients.nonEmpty) {
      val nearest = bootAmbients.minBy(a => math.abs(runAmbient - a))
      (math.abs(runAmbient - nearest) < tol,
        s"nearest of ${bootAmbients.size} boot ambients: $nearest")
    } else scalarAmbient match {
      case Some(bl) => (math.abs(runAmbient - bl) < tol, s"scalar baseline ambient: $bl")
      case None     => (true, "no baseline ambient recorded")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ambient load, sampled BEFORE any Spark work: this is the number
    // the baseline-comparability gate uses. The post-run sample (below)
    // is dominated by the bench's own decaying 32-thread tail — r9
    // measured post-run 3.13 on a machine whose ambient was 0.69 — so
    // gating on it would mark nearly every run incomparable.
    val ambientLoad = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // /proc/stat (total, steal) ticks — sampled before and after the
    // run so the JSON can report STEAL share across the whole run.
    // Round-13 lesson: an idle-ambient boot (load_avg 0.56) still
    // measured 34% slower than a same-code boot an hour earlier — the
    // loadavg gate cannot see hypervisor steal or host-level
    // contention, so the run now carries the one counter that can.
    def cpuTicks(): Option[(Long, Long)] = try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/stat"))
        .asScala.find(_.startsWith("cpu ")).map { l =>
          val f = l.trim.split("\\s+").drop(1).map(_.toLong)
          (f.sum, if (f.length > 7) f(7) else 0L)
        }
    } catch { case _: Throwable => None }
    val ticks0 = cpuTicks()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Route small-reduce-count shuffles through the sort-based writer
      // (one output file per map task) instead of the bypass-merge
      // writer (R files per map task). Round-15 finding: with the r14
      // cache spread every narrow stage became 32 map tasks, and at
      // R=32 the bypass writer opened 32×32=1024 shuffle files per
      // exchange — thread dumps showed executor threads dominated by
      // FileOutputStream.open0 (~3 ms/open on this ext4), inflating
      // tiny per-query stages ~150 ms/task (measured: x_funnel 1.35 →
      // 0.65 s, g9_group_ts_tag 0.40 → 0.25 s with threshold=1; six
      // heavy queries all improved, none regressed). At cluster scale
      // the setting is inert: reduce counts there exceed any threshold,
      // so large shuffles already use this exact writer — the override
      // only aligns small-R local shuffles with the scale path.
      // Env-parameterized so a deployment with cheap file metadata can
      // restore the default 200.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var warmupError: Option[String] = None

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
    // warmup failure also lands in the errors map under a reserved key:
    // the per-query failures it causes downstream are symptoms; the one
    // root-cause line must be INSIDE the parseable JSON, not only on
    // stderr (which the driver's capture may truncate away).
    try Tables.ts(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] ts-view warmup failed: ${errHead(e)}")
      warmupError = Some(errHead(e))
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
    warmupError.foreach(errors("__ts_warmup__") = _)
    def runMedian(name: String): (Double, Double, Double) = {
      // EVERY exec is guarded, not only the untimed first pass: a flaky
      // failure (OOM, executor loss) that passes warmup but dies in a
      // timed pass must still ship the JSON line + its error entry, not
      // crash main with rc=1 and zero diagnostics (the round-6 shape
      // this reporting exists to prevent).
      try {
        exec(name)
        val times = (0 until 3).map { _ =>
          System.gc() // don't bill one pass for its predecessor's garbage
          val t0 = System.nanoTime()
          exec(name)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        (times(1), times(0), times(2))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${errHead(e)}")
        errors(name) = errHead(e)
        (-1.0, -1.0, -1.0)
      }
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
    // steal share across the whole run (percent of all cpu ticks the
    // hypervisor withheld); null where /proc/stat is unavailable
    val stealPct: Option[Double] = for {
      (t0, s0) <- ticks0
      (t1, s1) <- cpuTicks()
      if t1 > t0
    } yield BigDecimal(100.0 * (s1 - s0) / (t1 - t0))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stealJson = stealPct.fold("null")(_.toString)
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
    // one id per JVM boot: MergeBaseline dedups on it, so re-merging
    // the same perquery file cannot inflate an entry's boots count
    // (the >=2-boots gate must count independent evidence, not merges)
    val bootId = java.util.UUID.randomUUID().toString
    val diag = s""""load_avg":$loadAvg,"load_avg_ambient":$ambientLoad,"steal_pct":$stealJson,"n_cpus":$nCpus,"boot_id":"$bootId","n_errors":${errors.size},"errors":$errJson"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,$diag,"sf":"$sfDir"}""")
    // The driver's artifact capture is tail-truncated (BENCH_r07 kept
    // only ~36 of 127 per-query numbers, cut from the FRONT of the
    // long line above). Cross-round per-query regression analysis
    // needs the full map, so it also goes to a stable file that the
    // end-of-round snapshot commits.
    val perQueryJson =
      s"""{"metric":"perquery","queries":$qs,"spread":$spread,$diag,"sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("target", "bench_perquery.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        perQueryJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // boot-stamped twin (round-11 verdict hygiene): the unstamped
      // file is the MergeBaseline handoff and gets clobbered by any
      // local re-run — judge/builder benches after a driver round
      // erased the driver's map. The stamp is the run's boot_id (also
      // inside the JSON and the BENCH_r{N} line), so the driver's
      // artifact stays addressable after any number of local re-runs.
      java.nio.file.Files.write(
        out.resolveSibling(s"bench_perquery_${bootId.take(8)}.json"),
        perQueryJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] perquery file write failed: ${errHead(e)}")
    }
    // compact summary lines LAST — the slot that survives any tail
    // grab (round-4 lesson). First the totals, then the headline
    // per-query content: top-10 slowest this run, plus the worst
    // regressions vs the committed baseline (bench_baseline.json,
    // refreshed each round from target/bench_perquery.json) so a
    // perf cliff is visible even if only the final line survives.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},$diag,"sf":"$sfDir"}""")
    val medians = results.collect { case (k, (med, _, _)) if med >= 0 => k -> med }
    val slowest = medians.sortBy(-_._2).take(10)
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "bench_baseline.json")
    val baselineExists = java.nio.file.Files.exists(java.nio.file.Paths.get(baselinePath))
    // the baseline is a previous round's perquery JSON. The parse is
    // WHITESPACE-TOLERANT — round 8's alarm died silently because the
    // committed file had been pretty-printed (`"queries": {`) while the
    // old scan demanded the exact compact string, so every regression
    // line since was vacuous evidence. Both the section marker and the
    // entry regex now accept arbitrary spacing, and a file that EXISTS
    // but parses to zero entries is reported loudly in the JSON rather
    // than silently as baseline_found:false.
    val baselineTxt: String = try {
      new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(baselinePath)),
        java.nio.charset.StandardCharsets.UTF_8)
    } catch { case _: Throwable => "" }
    val (baseline, baselineLoad): (Map[String, Double], Option[Double]) =
      try parseBaseline(baselineTxt) catch { case _: Throwable => (Map.empty, None) }
    val baselineHi: Map[String, Double] =
      try parseBaselineSpread(baselineTxt) catch { case _: Throwable => Map.empty }
    // run-ambient load is the dominant noise term (r8 vs baseline was a
    // uniform 1.15× at load 1.9 vs 1.4): when the run's pre-Spark
    // ambient sits >= 1.0 from EVERY boot ambient the baseline unions
    // (ambientComparable — nearest-boot rule, scalar fallback for old
    // files) the per-query ratios measure the machine, not the code,
    // so the regression map is withheld and the JSON says WHY instead
    // of shipping a silent empty map
    val bootAmbients: Seq[Double] =
      try parseBaselineAmbients(baselineTxt) catch { case _: Throwable => Seq.empty }
    val (loadComparable, loadRef) =
      ambientComparable(ambientLoad, bootAmbients, baselineLoad)
    val minsByQ = results.collect {
      case (k, (med, lo, _)) if med >= 0 => k -> lo
    }.toMap
    val (medianRatio, regressions, inflationNote) =
      regressionVerdict(medians, minsByQ, baseline, baselineHi, loadComparable,
        stealPct)
    val baselineNote =
      if (!baselineExists) "no baseline file"
      else if (baseline.isEmpty)
        s"LOUD WARNING: $baselinePath exists but parsed 0 query entries — format drift, fix the file or the parser"
      else if (!loadComparable)
        s"baseline-incomparable (load): run ambient load_avg $ambientLoad vs $loadRef"
      else inflationNote.getOrElse(
        s"comparable (run ambient $ambientLoad vs $loadRef)")
    if (baselineExists && baseline.isEmpty)
      System.err.println(s"[bench] $baselineNote")
    def numMap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    // queries this run has but the baseline doesn't (added since the
    // last refresh): named EXPLICITLY instead of silently skipped, so
    // the median-ratio denominator is auditable and the baseline
    // refresh (tools.MergeBaseline) knows what still needs boots
    val unbaselined =
      if (baseline.isEmpty) Seq.empty
      else medians.map(_._1).filterNot(baseline.contains).sorted
    val unbaselinedJson = unbaselined.map(jstr).mkString("[", ",", "]")
    val medianRatioJson = medianRatio.fold("null")(_.toString)
    println(s"""{"metric":"top","total":$total,"n_queries":${names.size},"n_errors":${errors.size},"slowest10":${numMap(slowest)},"regressions_vs_baseline":${numMap(regressions)},"median_ratio_vs_baseline":$medianRatioJson,"unbaselined":$unbaselinedJson,"baseline_found":${baseline.nonEmpty},"baseline_n":${baseline.size},"baseline_note":${jstr(baselineNote)},"sf":"$sfDir"}""")
    spark.stop()
    // truthful exit status: timings were printed either way, but a
    // round with failed queries must not read as passing evidence
    if (errors.nonEmpty) sys.exit(1)
  }
}

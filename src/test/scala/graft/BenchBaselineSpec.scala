package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.parseBaseline]] — the regression alarm's input stage.
  * Round 8 shipped a vacuous "no regressions" line because the
  * committed baseline had been pretty-printed while the parser
  * demanded compact JSON; this spec makes both formats load-bearing
  * AND parses the actual committed file, so a future reformat of
  * either side fails the build instead of silently disarming the
  * alarm.
  */
final class BenchBaselineSpec extends AnyFunSuite {

  private val compact =
    """{"metric":"perquery","queries":{"q_a":0.15,"q_b":1.25e-1,"q_c":-1.0},"spread":{"q_a":[0.1,0.2]},"load_avg":1.438,"n_cpus":32}"""
  private val pretty =
    """{
      |  "metric": "perquery",
      |  "queries": {"q_a": 0.15, "q_b": 1.25e-1, "q_c": -1.0},
      |  "spread": {"q_a": [0.1, 0.2]},
      |  "load_avg": 1.438,
      |  "n_cpus": 32
      |}""".stripMargin

  test("parses the compact format Bench itself writes") {
    val (qs, load) = Bench.parseBaseline(compact)
    assert(qs === Map("q_a" -> 0.15, "q_b" -> 0.125, "q_c" -> -1.0))
    assert(load === Some(1.438))
  }

  test("parses the pretty-printed format that killed the round-8 alarm") {
    val (qs, load) = Bench.parseBaseline(pretty)
    assert(qs === Map("q_a" -> 0.15, "q_b" -> 0.125, "q_c" -> -1.0))
    assert(load === Some(1.438))
  }

  test("ambient load sample wins over the post-run one when both exist") {
    // r9+: the comparability gate keys on the PRE-run ambient sample;
    // load_avg (post-run) is the bench's own decaying tail and stays
    // only as the fallback for pre-r9 baseline files
    val (_, load) = Bench.parseBaseline(
      """{"queries":{"q":0.1},"load_avg":3.13,"load_avg_ambient":0.69}""")
    assert(load === Some(0.69))
  }

  test("spread section parses to per-query hi bounds, both formats") {
    // the regression flag gates on the baseline run's own observed max
    // — a median inside that band is machine noise, not a plan change
    assert(Bench.parseBaselineSpread(compact) === Map("q_a" -> 0.2))
    assert(Bench.parseBaselineSpread(pretty) === Map("q_a" -> 0.2))
    assert(Bench.parseBaselineSpread("""{"queries":{"q":1.0}}""").isEmpty)
  }

  test("no queries section => empty map, not a crash") {
    val (qs, load) = Bench.parseBaseline("""{"metric":"x","load_avg":2.0}""")
    assert(qs.isEmpty)
    assert(load === Some(2.0))
  }

  test("the COMMITTED bench_baseline.json parses to a full query map") {
    val p = java.nio.file.Paths.get("bench_baseline.json")
    assume(java.nio.file.Files.exists(p), "bench_baseline.json not present")
    val (qs, load) = Bench.parseBaseline(java.nio.file.Files.readString(p))
    // the suite has >150 benched queries; a near-empty parse means the
    // committed file and the parser have drifted apart again
    assert(qs.size > 100,
      s"bench_baseline.json parsed only ${qs.size} entries — format drift")
    assert(load.isDefined,
      "bench_baseline.json carries no load_avg — load-comparability gate dead")
    assert(qs.values.forall(v => v > 0 && v < 600))
  }

  test("the COMMITTED baseline carries MULTI-BOOT bands for every entry") {
    // round-9 "what's wrong" #1: a single-boot band under-estimates
    // boot-to-boot variance ~3× on this box, and the alarm's first
    // driver outing flagged five same-commit false positives on
    // late-added queries whose bands came from one run. The merge
    // policy (tools.MergeBaseline) is only evidence if the committed
    // file proves it was followed — every entry must union ≥ 2 boots.
    val p = java.nio.file.Paths.get("bench_baseline.json")
    assume(java.nio.file.Files.exists(p), "bench_baseline.json not present")
    val txt = java.nio.file.Files.readString(p)
    val (qs, _) = Bench.parseBaseline(txt)
    val boots = Bench.parseBaselineBoots(txt)
    val single = qs.keySet.filter(k => boots.getOrElse(k, 1) < 2)
    assert(single.isEmpty,
      s"${single.size} baseline entries ship with < 2 boots (e.g. " +
        s"${single.take(5).mkString(", ")}) — run Bench on a fresh JVM " +
        "and `runMain graft.tools.MergeBaseline` before committing")
    assert(Bench.parseBaselineAmbients(txt).sizeIs >= 2,
      "baseline records fewer than 2 ambient-load samples — boot " +
        "provenance missing")
  }

  test("MergeBaseline: best-observed median, union band, boot counting") {
    import graft.tools.MergeBaseline
    val boot1 =
      """{"metric":"perquery","queries":{"q_a":0.50,"q_b":1.0},"spread":{"q_a":[0.45,0.60],"q_b":[0.9,1.4]},"load_avg_ambient":0.7}"""
    val boot2 =
      """{"metric":"perquery","queries":{"q_a":0.40,"q_c":2.0},"spread":{"q_a":[0.38,1.10],"q_c":[1.9,2.2]},"load_avg_ambient":2.1}"""
    val once = MergeBaseline.merge("{}", boot1)
    assert(Bench.parseBaselineBoots(once) === Map("q_a" -> 1, "q_b" -> 1))
    val twice = MergeBaseline.merge(once, boot2)
    val (med, load) = Bench.parseBaseline(twice)
    // q_a: best observed median, band = union of both boots' [lo, hi]
    assert(med("q_a") === 0.40)
    assert(Bench.parseBaselineSpreadFull(twice)("q_a") === ((0.38, 1.10)))
    // q_b: kept untouched from boot 1 (absent in boot 2), stays 1 boot
    assert(med("q_b") === 1.0)
    // q_c: new in boot 2, enters at boots=1
    assert(Bench.parseBaselineBoots(twice) ===
      Map("q_a" -> 2, "q_b" -> 1, "q_c" -> 1))
    // ambient provenance: every boot's sample kept, median gates
    assert(Bench.parseBaselineAmbients(twice) === Seq(0.7, 2.1))
    assert(load.isDefined)
    // a third boot covering everything clears the single-boot debt
    val boot3 =
      """{"metric":"perquery","queries":{"q_a":0.55,"q_b":0.8,"q_c":2.4},"spread":{"q_a":[0.5,0.7],"q_b":[0.7,0.9],"q_c":[2.3,2.5]},"load_avg_ambient":1.0}"""
    val thrice = MergeBaseline.merge(twice, boot3)
    assert(Bench.parseBaselineBoots(thrice).values.forall(_ >= 2))
    val (med3, _) = Bench.parseBaseline(thrice)
    assert(med3("q_a") === 0.40) // best observed survives a slower boot
    assert(Bench.parseBaselineSpreadFull(thrice)("q_b") === ((0.7, 1.4)))
    // an empty new run refuses to merge instead of wiping the file
    intercept[IllegalArgumentException](MergeBaseline.merge(thrice, "{}"))
  }

  test("comparability gate: nearest-BOOT ambient, not the scalar median") {
    // round-10 "what's wrong" #1: the driver ran at ambient 2.58 and the
    // gate compared it against the scalar 1.44 — incomparable — while
    // the baseline's own boots spanned 0.62..2.29. The bands are UNIONS
    // across those boots, so a run near ANY boot's ambient has
    // load-comparable evidence in the band; the gate must say so.
    val boots = Seq(0.88, 0.94, 1.44, 2.29, 1.99, 1.03, 1.53, 0.62)
    // the r10 driver run: within 1.0 of boot 2.29 => comparable
    assert(Bench.ambientComparable(2.576, boots, Some(1.435))._1)
    // inside the observed range is always comparable (unions of real
    // samples: some boot is within 1.0 of any in-range point when
    // adjacent samples are < 2.0 apart — and these are)
    assert(Bench.ambientComparable(1.2, boots, Some(1.435))._1)
    // far beyond every boot stays incomparable
    assert(!Bench.ambientComparable(4.5, boots, Some(1.435))._1)
    // pre-provenance baselines (no boots list) fall back to the scalar
    assert(Bench.ambientComparable(1.9, Seq.empty, Some(1.435))._1)
    assert(!Bench.ambientComparable(2.576, Seq.empty, Some(1.435))._1)
    // no ambient recorded at all: comparable by default (old files)
    assert(Bench.ambientComparable(2.0, Seq.empty, None)._1)
  }

  test("MergeBaseline: a re-merged boot_id is skipped, not double-counted") {
    import graft.tools.MergeBaseline
    // round-10 ADVICE #3: merging the same perquery file twice would
    // increment boots without adding evidence, satisfying the >=2 gate
    // with ONE boot's data — exactly the false-positive source the
    // multi-boot policy exists to prevent.
    val run =
      """{"metric":"perquery","queries":{"q_a":0.50},"spread":{"q_a":[0.45,0.60]},"boot_id":"boot-aaa","load_avg_ambient":0.7}"""
    val once = MergeBaseline.merge("{}", run)
    assert(MergeBaseline.parseBootIds(once) === Seq("boot-aaa"))
    assert(Bench.parseBaselineBoots(once) === Map("q_a" -> 1))
    // byte-identical re-merge: baseline unchanged
    assert(MergeBaseline.merge(once, run) === once)
    // a genuinely fresh boot still merges and records its id
    val run2 =
      """{"metric":"perquery","queries":{"q_a":0.40},"spread":{"q_a":[0.38,0.55]},"boot_id":"boot-bbb","load_avg_ambient":1.1}"""
    val twice = MergeBaseline.merge(once, run2)
    assert(Bench.parseBaselineBoots(twice) === Map("q_a" -> 2))
    assert(MergeBaseline.parseBootIds(twice).sorted === Seq("boot-aaa", "boot-bbb"))
    // id-less legacy runs keep merging (no identity to dedup on)
    val legacy =
      """{"metric":"perquery","queries":{"q_a":0.45},"spread":{"q_a":[0.44,0.50]},"load_avg_ambient":0.9}"""
    assert(Bench.parseBaselineBoots(MergeBaseline.merge(twice, legacy)) ===
      Map("q_a" -> 3))
  }

  test("regression flag gates on the MIN of the 3 passes, not the median") {
    // round-11 "what's wrong" #1: the driver run flagged 5 phantom
    // regressions at 2.5-5.6× — load bursts lifted the MEDIAN of 3
    // passes out of band while the MIN pass sat at the band edge
    // (ts3_cagg_sql_window_1d: med 5.58× baseline, min pass 0.334 s
    // inside the 22-boot band [., 1.081]). A true plan change lifts
    // ALL passes, so the min is the load-robust witness.
    val base = 0.30; val hi = 1.081
    // the r11 driver-run shape: median way out, min in band => NO flag
    assert(!Bench.regressionFlag(med = 1.67, min = 0.334, base, hi))
    // a genuine regression lifts every pass => flag
    assert(Bench.regressionFlag(med = 1.67, min = 1.45, base, hi))
    // min barely below the band's cleared threshold => still no flag
    assert(!Bench.regressionFlag(med = 2.0, min = hi * 1.15 - 0.01, base, hi))
    // sub-noise-floor absolute times are never signal
    assert(!Bench.regressionFlag(med = 0.15, min = 0.14, base = 0.05, hi = 0.06))
    // median ratio below 1.25 never flags, whatever the min says
    assert(!Bench.regressionFlag(med = 0.36, min = 0.36, base, hi = 0.1))
    // missing/invalid baseline entry never flags
    assert(!Bench.regressionFlag(med = 9.0, min = 9.0, base = 0.0, hi = 0.0))
    // the median itself must also clear the band (min >= hi*1.15 with
    // a median inside the band can only happen on inverted inputs)
    assert(!Bench.regressionFlag(med = 1.0, min = 1.3, base, hi))
  }

  test("uniform inflation withholds the per-query map and says why") {
    // round-12 "what's wrong" #1: the min-of-3 gate is robust to load
    // BURSTS but not to a PLATEAU spanning the whole run — the r12
    // driver run (ambient 4.92) had 96% of all 216 queries >1.25×
    // baseline with run median 1.859, and shipped 5 phantom flags (all
    // refuted by idle boots at the same HEAD). When every query
    // inflates together the map measures the machine — withhold it.
    val baseline = (1 to 20).map(i => s"q_$i" -> 0.4).toMap
    val baselineHi = (1 to 20).map(i => s"q_$i" -> 0.6).toMap
    // the r12 driver-run shape: EVERYTHING ~1.86× with min passes also
    // lifted (sustained load lifts all three passes together)
    val hotMedians = (1 to 20).map(i => s"q_$i" -> 0.745)
    val hotMins = (1 to 20).map(i => s"q_$i" -> 0.72).toMap
    val (ratioH, flagsH, noteH) = Bench.regressionVerdict(
      hotMedians, hotMins, baseline, baselineHi, loadComparable = true)
    assert(ratioH.exists(_ > 1.8))
    assert(flagsH.isEmpty, s"uniform inflation must withhold flags, got $flagsH")
    assert(noteH.exists(_.contains("uniform-inflation")))

    // an idle-shaped run (median ~1.0) with ONE genuine all-passes
    // outlier: that one flag must SURVIVE the guard
    val idleMedians = (1 to 19).map(i => s"q_$i" -> 0.41) :+ ("q_20" -> 2.0)
    val idleMins = ((1 to 19).map(i => s"q_$i" -> 0.39) :+ ("q_20" -> 1.9)).toMap
    val (ratioI, flagsI, noteI) = Bench.regressionVerdict(
      idleMedians, idleMins, baseline, baselineHi, loadComparable = true)
    assert(ratioI.exists(_ < Bench.UniformInflationCutoff))
    assert(noteI.isEmpty)
    assert(flagsI.map(_._1) === Seq("q_20"),
      s"the genuine regression must flag on an idle-shaped run, got $flagsI")
    assert(flagsI.head._2 === 5.0)

    // load-incomparable runs still withhold everything (pre-existing
    // branch, pinned so the new guard didn't reorder it away)
    val (ratioL, flagsL, _) = Bench.regressionVerdict(
      idleMedians, idleMins, baseline, baselineHi, loadComparable = false)
    assert(ratioL.isEmpty && flagsL.isEmpty)
  }

  test("MergeBaseline refuses a uniformly-inflated boot (desensitization guard)") {
    import graft.tools.MergeBaseline
    // round-12 ADVICE #5: union-every-boot + one sustained-load boot
    // would widen every band and immunize entries forever. A run whose
    // median ratio vs the baseline shows the uniform-inflation shape
    // is refused; --force (deliberate hot-calibration boot on
    // verified-unchanged code) overrides.
    val base =
      """{"metric":"perquery","queries":{"q_a":0.40,"q_b":1.0},"spread":{"q_a":[0.38,0.55],"q_b":[0.9,1.4]},"boots":{"q_a":2,"q_b":2},"boot_ids":["b1","b2"],"ambients":[0.5,0.8],"load_avg_ambient":0.65}"""
    val hot =
      """{"metric":"perquery","queries":{"q_a":0.80,"q_b":1.9},"spread":{"q_a":[0.75,0.9],"q_b":[1.8,2.1]},"boot_id":"hot-1","load_avg_ambient":4.9}"""
    // refused: baseline text returned unchanged
    assert(MergeBaseline.merge(base, hot) === base)
    // forced: merges (bands widen, boots increment)
    val forced = MergeBaseline.merge(base, hot, force = true)
    assert(Bench.parseBaselineBoots(forced) === Map("q_a" -> 3, "q_b" -> 3))
    assert(Bench.parseBaselineSpreadFull(forced)("q_a") === ((0.38, 0.9)))
    // an idle-shaped boot (ratios ~1.1) merges without force
    val idle =
      """{"metric":"perquery","queries":{"q_a":0.44,"q_b":1.1},"spread":{"q_a":[0.42,0.5],"q_b":[1.0,1.2]},"boot_id":"idle-1","load_avg_ambient":0.6}"""
    assert(Bench.parseBaselineBoots(MergeBaseline.merge(base, idle)) ===
      Map("q_a" -> 3, "q_b" -> 3))
  }

  test("steal gate: a steal-contaminated boot is refused at merge and withheld at verdict") {
    import graft.tools.MergeBaseline
    // parse helper: numeric, null, absent
    assert(Bench.parseStealPct("""{"steal_pct":2.79,"n_cpus":32}""") === Some(2.79))
    assert(Bench.parseStealPct("""{"steal_pct":null,"n_cpus":32}""") === None)
    assert(Bench.parseStealPct("{}") === None)

    val base =
      """{"metric":"perquery","queries":{"q_a":0.40,"q_b":1.0},"spread":{"q_a":[0.38,0.55],"q_b":[0.9,1.4]},"boots":{"q_a":2,"q_b":2},"boot_ids":["b1","b2"],"ambients":[0.5,0.8],"load_avg_ambient":0.65}"""
    // the 2b6f47d shape: ratios look idle (~1.1 — the median cutoff
    // alone would merge this boot) but /proc/stat recorded the
    // hypervisor withholding cpu across the run
    val stolen =
      """{"metric":"perquery","queries":{"q_a":0.44,"q_b":1.1},"spread":{"q_a":[0.42,0.5],"q_b":[1.0,1.2]},"boot_id":"steal-1","load_avg_ambient":0.6,"steal_pct":2.79}"""
    assert(MergeBaseline.merge(base, stolen) === base)
    // --force (deliberate calibration boot) still merges
    assert(Bench.parseBaselineBoots(MergeBaseline.merge(base, stolen,
      force = true)) === Map("q_a" -> 3, "q_b" -> 3))
    // a clean-steal boot (0.03%) merges without force
    val clean = stolen
      .replace("\"boot_id\":\"steal-1\"", "\"boot_id\":\"clean-1\"")
      .replace("\"steal_pct\":2.79", "\"steal_pct\":0.03")
    assert(Bench.parseBaselineBoots(MergeBaseline.merge(base, clean)) ===
      Map("q_a" -> 3, "q_b" -> 3))

    // verdict side: a genuine-looking all-passes flag is withheld when
    // the run recorded steal, and the note names the evidence
    val baseline = Map("q_a" -> 0.4, "q_b" -> 1.0, "q_c" -> 1.0)
    val hi = Map("q_a" -> 0.55, "q_b" -> 1.4, "q_c" -> 1.2)
    val medians = Seq("q_a" -> 2.0, "q_b" -> 1.1, "q_c" -> 1.05)
    val mins = Map("q_a" -> 2.0, "q_b" -> 1.0, "q_c" -> 1.0)
    val (ratioS, flagsS, noteS) = Bench.regressionVerdict(
      medians, mins, baseline, hi, loadComparable = true,
      stealPct = Some(2.79))
    assert(flagsS.isEmpty, "steal-contaminated run must withhold flags")
    assert(noteS.exists(_.contains("steal-contaminated")))
    assert(ratioS.nonEmpty, "the headline median ratio still reports")
    // identical run with clean steal: the genuine q_a flag ships
    val (_, flagsC, noteC) = Bench.regressionVerdict(
      medians, mins, baseline, hi, loadComparable = true,
      stealPct = Some(0.03))
    assert(flagsC.map(_._1) === Seq("q_a") && noteC.isEmpty)
  }

  test("the bench JSON names unbaselined queries instead of skipping silently") {
    // (format-level pin: the driver reads `unbaselined` from the top
    // line; the field is produced in Bench.main whose run is the
    // per-round artifact — here we pin the parse helpers it feeds on)
    val withBoots =
      """{"queries":{"q":0.1},"spread":{"q":[0.1,0.2]},"boots":{"q":3},"ambients":[0.5,0.9,0.7],"load_avg_ambient":0.7}"""
    assert(Bench.parseBaselineBoots(withBoots) === Map("q" -> 3))
    assert(Bench.parseBaselineAmbients(withBoots) === Seq(0.5, 0.9, 0.7))
    // files without the sections degrade to empty maps, not crashes
    assert(Bench.parseBaselineBoots(compact).isEmpty)
    assert(Bench.parseBaselineAmbients(compact).isEmpty)
  }
}

package graft.tools

import graft.Bench

/** Baseline refresh with MULTI-BOOT spread bands — the round-9 fix for
  * the regression alarm's false positives: same-code sub-2-second
  * queries flap up to ~3× ACROSS JVM BOOTS on this box, so a baseline
  * whose per-query band comes from one boot under-estimates the noise
  * the `med ≥ baselineHi × 1.15` guard must clear, and the alarm cries
  * wolf (BENCH_r09 shipped five same-commit flags exactly this way —
  * late-round queries carried single-run-tight bands).
  *
  * Policy, now code instead of practice (commit b99786c):
  *   - per-query MEDIAN = best observed across boots (the steady-state
  *     number a regression must be judged against);
  *   - per-query BAND = union of every boot's [min, max] AND medians
  *     (a median inside anything ever observed same-code is noise);
  *   - per-query `boots` = how many independent JVM runs the band
  *     unions — BenchBaselineSpec REJECTS a committed baseline with
  *     any entry below 2 boots;
  *   - `ambients` = every boot's pre-run ambient load sample;
  *     `load_avg_ambient` (the comparability-gate input) = their
  *     median.
  *
  * Usage: run [[graft.Bench]] on ≥2 fresh JVMs, then after each run
  *   `runMain graft.tools.MergeBaseline [newRun] [baseline]`
  * (defaults: target/bench_perquery.json → bench_baseline.json; the
  * first merge into a missing/empty baseline seeds boots=1). Queries
  * present only in the OLD baseline are kept untouched; queries only
  * in the new run enter at boots=1 — the spec gate then forces a
  * second boot before the file can ship.
  */
object MergeBaseline {

  /** The run's JVM-boot identity (`"boot_id":"…"`) — [[graft.Bench]]
    * stamps one UUID per boot; a baseline accumulates them under
    * `"boot_ids":[…]`. */
  private[graft] def parseBootIds(txt: String): Seq[String] =
    (raw""""boot_id"\s*:\s*"([^"]+)"""".r.findAllMatchIn(txt).map(_.group(1)) ++
      raw""""boot_ids"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt).toSeq
        .flatMap(m => raw""""([^"]+)"""".r.findAllMatchIn(m.group(1)).map(_.group(1))))
      .toSeq.distinct

  /** Pure merge of a new perquery run into an existing baseline text;
    * returns the merged compact-JSON baseline (spec-tested). Boot
    * identity guard (round-10 ADVICE): a run whose `boot_id` the
    * baseline already records is NOT merged again — re-merging the
    * same file would increment every entry's boots count without
    * adding evidence, letting one boot's data satisfy the >=2-boots
    * gate and reintroducing the single-boot-tight-band false
    * positives this tool exists to prevent.
    *
    * Desensitization guard (round-12 ADVICE #5): union-every-boot
    * means ONE boot whose run was uniformly slow — sustained load, or
    * an unnoticed machine-wide regression — would widen EVERY band and
    * immunize every entry thereafter, with nothing proving the merged
    * boots were regression-free. So a run whose median ratio vs the
    * baseline shows the uniform-inflation shape
    * ([[Bench.UniformInflationCutoff]], same cutoff the alarm's
    * abstention uses) is REFUSED unless `force` (the `--force` CLI
    * flag, for deliberately merging a known-hot boot after verifying
    * the code is unchanged — the r12 ambient-4.29 calibration boot's
    * use case). */
  private[graft] def merge(baselineTxt: String, newRunTxt: String,
                           force: Boolean = false): String = {
    val (newMed, newLoad) = Bench.parseBaseline(newRunTxt)
    require(newMed.nonEmpty,
      "MergeBaseline: the new run parsed to 0 query entries — refusing " +
        "to merge (format drift or an empty bench run)")
    val oldIds = parseBootIds(baselineTxt)
    val newId = parseBootIds(newRunTxt).filterNot(oldIds.contains)
    val dup = parseBootIds(newRunTxt).exists(oldIds.contains)
    if (dup) {
      System.err.println("[merge] SKIPPED: this run's boot_id is already " +
        "in the baseline — merging it again would double-count one boot's evidence")
      return baselineTxt
    }
    // Steal guard (round-13): the 2b6f47d boot sat 0.001 UNDER the
    // median-ratio cutoff while recording 2.79% CPU steal (clean boots
    // ~0.03%) — direct /proc/stat evidence of host contention the
    // loadavg and ratio gates cannot see. Such a boot's bands are
    // stolen-cpu evidence; merging them would desensitize the alarm
    // exactly like a uniformly-inflated boot.
    val steal = Bench.parseStealPct(newRunTxt)
    if (!force && steal.exists(_ >= Bench.StealContaminationCutoff)) {
      System.err.println(f"[merge] REFUSED: this run recorded " +
        f"${steal.get}%.2f%% CPU steal (clean boots ~0.03%%; cutoff " +
        f"${Bench.StealContaminationCutoff}%.1f%%) — the hypervisor " +
        "withheld cpu across the run, so its bands measure contention, " +
        "not the code. Rerun when the host is quiet, or pass --force " +
        "for a deliberate calibration boot on verified-unchanged code.")
      return baselineTxt
    }
    val newSpread = Bench.parseBaselineSpreadFull(newRunTxt)
    val (oldMed, oldLoad) = Bench.parseBaseline(baselineTxt)
    val ratios = newMed.flatMap { case (k, m) =>
      oldMed.get(k).collect { case b if b > 0 && m > 0 => m / b }
    }.toSeq.sorted
    val runMedianRatio =
      if (ratios.isEmpty) None else Some(ratios(ratios.size / 2))
    if (!force && runMedianRatio.exists(_ >= Bench.UniformInflationCutoff)) {
      System.err.println(f"[merge] REFUSED: this run is uniformly " +
        f"inflated vs the baseline (median ratio ${runMedianRatio.get}%.3f " +
        f">= ${Bench.UniformInflationCutoff}) — merging it would widen " +
        "every band with load evidence and desensitize the alarm. Rerun " +
        "at idle, or pass --force if this hot boot is a deliberate " +
        "calibration point on verified-unchanged code.")
      return baselineTxt
    }
    val oldSpread = Bench.parseBaselineSpreadFull(baselineTxt)
    val oldBoots = Bench.parseBaselineBoots(baselineTxt)
    val oldAmbients = {
      val listed = Bench.parseBaselineAmbients(baselineTxt)
      // a pre-boots single-run baseline carries only its load sample
      if (listed.nonEmpty) listed else oldLoad.toSeq
    }

    final case class Entry(med: Double, lo: Double, hi: Double, boots: Int)
    def entryOf(med: Map[String, Double], spread: Map[String, (Double, Double)],
                boots: Map[String, Int], k: String): Option[Entry] =
      med.get(k).filter(_ > 0).map { m =>
        val (lo, hi) = spread.getOrElse(k, (m, m))
        Entry(m, math.min(lo, m), math.max(hi, m), boots.getOrElse(k, 1))
      }

    val keys = (oldMed.keySet ++ newMed.keySet).toSeq.sorted
    val merged: Seq[(String, Entry)] = keys.flatMap { k =>
      val o = entryOf(oldMed, oldSpread, oldBoots, k)
      val n = entryOf(newMed, newSpread, Map.empty, k)
      val e = (o, n) match {
        case (Some(a), Some(b)) => Some(Entry(
          math.min(a.med, b.med),
          math.min(a.lo, b.lo), math.max(a.hi, b.hi),
          a.boots + 1))
        case (Some(a), None) => Some(a) // query removed or errored this run
        case (None, Some(b)) => Some(b) // new query: enters at boots=1
        case (None, None)    => None    // errored in both: drop
      }
      e.map(k -> _)
    }

    val ambients = (oldAmbients ++ newLoad.toSeq).filter(_ >= 0)
    val ambientMedian =
      if (ambients.isEmpty) -1.0 else ambients.sorted.apply(ambients.size / 2)
    def num(d: Double): String = {
      val s = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString
      if (s.contains('.')) s else s + ".0"
    }
    val qs = merged.map { case (k, e) => s"\"$k\":${num(e.med)}" }
      .mkString("{", ",", "}")
    val spread = merged.map { case (k, e) => s"\"$k\":[${num(e.lo)},${num(e.hi)}]" }
      .mkString("{", ",", "}")
    val boots = merged.map { case (k, e) => s"\"$k\":${e.boots}" }
      .mkString("{", ",", "}")
    val ambientsJson = ambients.map(num).mkString("[", ",", "]")
    val bootIdsJson = (oldIds ++ newId).map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"perquery","queries":$qs,"spread":$spread,"boots":$boots,""" +
      s""""ambients":$ambientsJson,"boot_ids":$bootIdsJson,""" +
      s""""load_avg_ambient":${num(ambientMedian)},""" +
      s""""boots_min":${if (merged.isEmpty) 0 else merged.map(_._2.boots).min}}"""
  }

  def main(args: Array[String]): Unit = {
    val force = args.contains("--force")
    val positional = args.filterNot(_ == "--force")
    val newRun = positional.lift(0).getOrElse("target/bench_perquery.json")
    val baseline = positional.lift(1).getOrElse("bench_baseline.json")
    def readOr(p: String, default: => String): String =
      try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: java.io.IOException => default }
    val out = merge(readOr(baseline, "{}"), readOr(newRun,
      sys.error(s"MergeBaseline: new run file $newRun unreadable")), force)
    java.nio.file.Files.write(java.nio.file.Paths.get(baseline),
      out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val boots = Bench.parseBaselineBoots(out)
    val n = Bench.parseBaseline(out)._1.size
    val single = boots.count(_._2 < 2)
    println(s"[merge] $baseline: $n entries, " +
      s"boots min=${if (boots.isEmpty) 0 else boots.values.min} " +
      s"max=${if (boots.isEmpty) 0 else boots.values.max}; " +
      s"$single entries still below 2 boots" +
      (if (single > 0) " — run Bench on a fresh JVM and merge again" else ""))
  }
}

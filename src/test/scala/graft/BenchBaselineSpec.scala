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
}

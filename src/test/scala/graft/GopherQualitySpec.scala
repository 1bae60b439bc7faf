package graft

import graft.operators.GopherQuality
import org.apache.spark.sql.functions._

/** Non-repetition Gopher quality rules ([[graft.operators.GopherQuality]]):
  * hand-computed fixtures per signal, degenerate edges, the keep-rule
  * thresholds, and the zero-shuffle plan pin.
  */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  private def signals(text: String): org.apache.spark.sql.Row =
    GopherQuality.qualitySignals(Seq((1L, text)).toDF("doc_id", "text")).head()

  test("word count and mean word length") {
    val r = signals("aa bbbb cc\n dddd ")
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Double]("mean_word_len") == 3.0) // (2+4+2+4)/4
    val empty = signals("  \n ")
    assert(empty.getAs[Long]("n_words") == 0L)
    assert(empty.getAs[Double]("mean_word_len") == 0.0)
  }

  test("symbol-to-word ratio counts #, …, and disjoint ... runs") {
    // 4 words; symbols: two '#', one '…', one '...' → 4/4 = 1.0
    val r = signals("a# #b c… d...")
    assert(r.getAs[Double]("symbol_word_ratio") == 1.0)
    assert(signals("clean words only").getAs[Double]("symbol_word_ratio") == 0.0)
  }

  test("bullet and ellipsis line fractions (trimmed, non-empty lines)") {
    val r = signals("• first\n  - second\nplain\nends with…\nalso ends...\n\n")
    // 5 non-empty lines; bullets: '•' and '-' → 0.4; ellipses: 2/5
    assert(r.getAs[Double]("bullet_line_frac") == 0.4)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.4)
  }

  test("alpha word fraction and stop-word hits") {
    val r = signals("the 123 4-5 cat with THE")
    // words: the, 123, 4-5, cat, with, THE → alpha 4/6
    assert(r.getAs[Double]("alpha_word_frac") == 0.6667)
    // distinct stop words present: the (twice counts once), with → 2
    assert(r.getAs[Long]("stop_word_hits") == 2L)
  }

  test("keep-rule: realistic prose passes, symbol soup and word-count edges fail") {
    val prose = ("the quick brown fox jumps with energy and vigor " +
      "that moves it over every lazy dog of note to be seen ") * 3
    val docs = Seq(
      (1L, prose),
      (2L, "### # ##…" + " word" * 60),           // symbol ratio too high
      (3L, "the of and to be with that have")      // < 50 words
    ).toDF("doc_id", "text")
    val kept = GopherQuality.qualitySignals(docs)
      .filter(GopherQuality.gopherQualityKeep())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"kept $kept")
  }

  test("plan shape: one scan-stage projection — no exchange, no explode") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val plan = GopherQuality.qualitySignals(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("Generate"),
      s"quality signals must not shuffle or explode:\n$plan")
  }

  test("filterOnSignals: the keep filter reads computed columns, not re-derived folds") {
    // without the barrier, predicate pushdown substitutes every signal
    // alias into the filter condition — each higher-order fold is then
    // re-evaluated 3-7× per row BELOW the projection (the whole point
    // of materializing signals once is lost). The law: the Filter node
    // references signal ATTRIBUTES; a raw .filter() is pinned as the
    // counterexample (its filter reads `text` directly), so if a Spark
    // upgrade changes pushdown behavior this test says which side moved.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // Range-based source: a LocalRelation would be folded whole by
    // ConvertToLocalRelation and leave no Filter node to inspect
    val docs = spark.range(3).select(col("id").as("doc_id"),
      concat(lit("the words and more of that have with a b c d e "),
        col("id").cast("string")).as("text"),
      lit("s").as("source"))
    val keep = GopherQuality.gopherQualityKeep(minWords = 1L, minStopWordHits = 0L)
    val guarded = GopherQuality.filterOnSignals(
      GopherQuality.qualitySignals(docs), keep)
    val refs = guarded.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.references.map(_.name).toSet
    }.flatten.toSet
    assert(refs.contains("n_words") && refs.contains("stop_word_hits"),
      s"barriered filter must reference signal columns, got $refs")
    // results identical to the naive filter
    val naive = GopherQuality.qualitySignals(docs).filter(keep)
    assert(guarded.collect().toSeq == naive.collect().toSeq)
    val naiveRefs = naive.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.references.map(_.name).toSet
    }.flatten.toSet
    assert(naiveRefs.intersect(Set("n_words", "stop_word_hits")).isEmpty,
      s"counterexample drifted: pushdown no longer inlines signals " +
        s"(naive filter refs $naiveRefs) — filterOnSignals' barrier may " +
        "be removable")
  }
}

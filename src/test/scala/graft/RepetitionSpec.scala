package graft

import graft.operators.Repetition
import org.apache.spark.sql.functions._

/** Gopher repetition signals ([[graft.operators.Repetition]]): pinned
  * hand-computed fixtures per signal, the degenerate edges (empty doc,
  * no repetition, all-one-line), the clip on the 5-gram mass, the
  * filter composition, and the zero-shuffle plan shape.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(text: String): Map[String, Double] = {
    val row = Repetition.repetitionSignals(
      Seq((1L, text)).toDF("doc_id", "text")).head()
    Seq("dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
      "top_3gram_char_frac", "dup_5gram_char_frac")
      .map(c => c -> row.getAs[Double](c)).toMap
  }

  test("duplicate lines: repeats beyond first occurrence, count and char mass") {
    // lines: x, yy, x, zzz, x → n=5, m=1+2+1+3+1=8; 'x' repeats twice
    val s = signals("x\nyy\nx\nzzz\nx")
    assert(s("dup_line_frac") == 0.4)            // 2/5
    assert(s("dup_line_char_frac") == 0.25)      // 2/8
  }

  test("empty lines are not lines; identical doc of one line repeated") {
    val s = signals("abc\n\n\nabc\n")
    assert(s("dup_line_frac") == 0.5)            // 1 repeat / 2 lines
    assert(s("dup_line_char_frac") == 0.5)
  }

  test("top n-gram char fraction: heaviest gram's mass over word mass") {
    // words: a b a b a b → mass 6; "a b"×3 (len 2) → 6/6 = 1.0;
    // 3-grams: "a b a"×2, "b a b"×2 → best 2*3=6 → 1.0
    val s = signals("a b a b a b")
    assert(s("top_2gram_char_frac") == 1.0)
    assert(s("top_3gram_char_frac") == 1.0)
    // distinct words: every 2-gram occurs once, heaviest is
    // "three four" (9 chars) over word mass 15
    val t = signals("one two three four")
    assert(t("top_2gram_char_frac") == 0.6)
  }

  test("duplicated 5-gram char fraction counts every instance, clips at 1") {
    // "a b c d e" ×3 with full overlap: dup mass 15 + 4 grams ×2×5 = 55
    // over word mass 15 → clipped to 1.0
    val s = signals(("a b c d e " * 3).trim)
    assert(s("dup_5gram_char_frac") == 1.0)
    // no repeated 5-gram → 0
    val t = signals("v w x y z q r s t u")
    assert(t("dup_5gram_char_frac") == 0.0)
  }

  test("degenerate edges: empty text, whitespace-only, fewer words than n") {
    // ("one two" is NOT degenerate: its single 2-gram IS the top gram
    // at fraction 1.0 — a one-word doc has no grams at all)
    for (txt <- Seq("", "   \n\t  ", "one")) {
      val s = signals(txt)
      assert(s.values.forall(_ == 0.0), s"expected all-zero for '$txt': $s")
    }
  }

  test("gopherRepetitionKeep: clean prose passes, degenerate repetition fails") {
    // the clean doc needs realistic LENGTH: Gopher's 0.20 top-2-gram
    // threshold assumes documents long enough that one bigram is a
    // small share — a 10-word doc trips it on any longish pair
    val clean = (1 to 60).map(i => s"token$i").grouped(12)
      .map(_.mkString(" ")).mkString("\n")
    val docs = Seq(
      (1L, clean),
      (2L, ("spam spam spam " * 20).trim)).toDF("doc_id", "text")
    val kept = Repetition.repetitionSignals(docs)
      .filter(Repetition.gopherRepetitionKeep())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"kept $kept")
  }

  test("plan shape: signals are one scan-stage projection — no hash exchange") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val plan = Repetition.repetitionSignals(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"repetition signals must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), // no explode fallback
      s"repetition signals must not explode lines/grams:\n$plan")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style intra-document repetition signals (Rae et al. 2021,
  * "Scaling Language Models", appendix A1.1 — the repetition half of
  * the Gopher quality rules, reused by most public pretraining
  * pipelines): per-document fractions of repeated lines and of
  * characters claimed by top / duplicated word n-grams. Documents
  * heavy in boilerplate, listicles, or degenerate repetition score
  * high and get filtered before training.
  *
  * Definitions (pinned by RepetitionSpec and the `x_text_repetition`
  * DuckDB oracle; 0.0 whenever the denominator is empty):
  *  - `dup_line_frac`: repeats beyond each line's first occurrence /
  *    total non-empty lines;
  *  - `dup_line_char_frac`: characters in those repeated instances /
  *    characters in all non-empty lines;
  *  - `top_2gram_char_frac`, `top_3gram_char_frac`: the char mass
  *    (count × n-gram length, whitespace excluded) of the heaviest
  *    word n-gram / total word characters;
  *  - `dup_5gram_char_frac`: char mass of ALL word 5-grams occurring
  *    more than once / total word characters, clipped to 1.0 —
  *    overlapping occurrences are counted per gram, the same
  *    approximation the public reimplementations use (an exact
  *    union-of-spans needs per-position bookkeeping for no filtering
  *    benefit).
  *
  * Scale shape: every signal is ONE scan-stage expression — split,
  * sort the per-document array, and linearly fold it with codegen'd
  * higher-order functions (duplicates are adjacent after the sort, so
  * run-length walking replaces any per-document hash map). No
  * explode, no per-line shuffle, no aggregation state: at 100 TB this
  * is a pure mapper over documents, embarrassingly parallel at any
  * executor count (RepetitionSpec pins the no-Exchange plan).
  */
object Repetition {

  /** Run-length fold over a sorted array: emits
    * struct(dup_units, dup_mass, total_units, total_mass) where a
    * repeated element contributes (1, weight) per instance BEYOND its
    * first. `weightOf(x)` must be a SQL expression in `x`.
    */
  private def dupFold(sortedArr: String, weightOf: String => String): String = s"""
    aggregate(
      $sortedArr,
      named_struct('prev', CAST(NULL AS STRING), 'dups', 0L, 'dupm', 0L,
                   'n', 0L, 'm', 0L),
      (a, x) -> named_struct(
        'prev', x,
        'dups', a.dups + IF(a.prev <=> x, 1L, 0L),
        'dupm', a.dupm + IF(a.prev <=> x, ${weightOf("x")}, 0L),
        'n', a.n + 1L,
        'm', a.m + ${weightOf("x")}),
      a -> named_struct('dups', a.dups, 'dupm', a.dupm, 'n', a.n, 'm', a.m))"""

  /** Max of count(g) × charlen(g) over a sorted HASHED gram array
    * (run-length walk over (h, len) structs). */
  private def topMassFold(sortedArr: String): String = s"""
    aggregate(
      $sortedArr,
      named_struct('prev', CAST(NULL AS BIGINT), 'run', 0L, 'best', 0L),
      (a, x) -> named_struct(
        'prev', x.h,
        'run', IF(a.prev <=> x.h, a.run + 1L, 1L),
        'best', greatest(a.best,
          IF(a.prev <=> x.h, a.run + 1L, 1L) * x.len)),
      a -> a.best)"""

  /** Σ count(g) × charlen(g) over grams with count > 1 (run-length
    * walk; a run of k adds k·len once it is known to repeat — the
    * second instance retroactively adds the first's mass). */
  private def dupMassFold(sortedArr: String): String = s"""
    aggregate(
      $sortedArr,
      named_struct('prev', CAST(NULL AS BIGINT), 'run', 0L, 'mass', 0L),
      (a, x) -> named_struct(
        'prev', x.h,
        'run', IF(a.prev <=> x.h, a.run + 1L, 1L),
        'mass', a.mass + IF(a.prev <=> x.h,
          (IF(a.run = 1L, 2L, 1L)) * x.len, 0L)),
      a -> a.mass)"""

  private def grams(wordsArr: String, n: Int): String =
    // the IF guard matters: Spark's sequence(1, 0) is DESCENDING
    // [1, 0], not empty, and slice at position 0 throws
    s"""IF(size($wordsArr) < $n, array(),
        transform(sequence(1, size($wordsArr) - ${n - 1}),
          i -> concat_ws(' ', slice($wordsArr, i, $n))))"""

  /** Grams reduced to (xxhash64, charlen) structs, SORTED by hash —
    * run-length identity checks and the array sort then compare fixed
    * 8-byte longs instead of variable-length gram strings (the sort is
    * the signals' dominant cost; ~12-char average grams make string
    * compares ~3× the work for zero filtering benefit). Identity by
    * 64-bit hash: two distinct grams of ONE document colliding is a
    * ~2⁻⁶⁴·pairs event — far below the 4-dp rounding the signals ship
    * with, and the DuckDB oracle (exact strings) stays hash-green.
    * charlen excludes the joining spaces: the words carry no
    * whitespace (split on \\s+), so len = length(gram) − (n−1).
    */
  private def sortedHashedGrams(wordsArr: String, n: Int): String =
    s"""array_sort(transform(${grams(wordsArr, n)},
        g -> named_struct('h', xxhash64(g), 'len', length(g) - ${n - 1}L)))"""

  private def ratio(num: String, den: String): Column =
    round(when(expr(den) > 0L, expr(num).cast("double") / expr(den))
      .otherwise(lit(0.0)), 4)

  /** Append the five repetition signals to `docs` (one scan-stage
    * projection; 4-dp rounded for cross-engine determinism). */
  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // the word array is MATERIALIZED once and the gram/mass folds read
    // the attribute — inlining the split text into each fold re-split
    // the document four times per row (Catalyst does not CSE
    // higher-order-function subtrees across projection columns; same
    // round-9 fix as GopherQuality.qualitySignals). Plan shape
    // unchanged: a projection chain, no Exchange (RepetitionSpec pins
    // it).
    // STAGED withColumns: one analyzer pass per stage instead of one
    // per column — these higher-order trees made PLAN time the
    // dominant cost of the stacked Gopher pipeline (same fix as
    // GopherQuality.qualitySignals).
    val lines = s"""array_sort(filter(split($textCol, '\n'), x -> x <> ''))"""
    val words = "__rep_words"
    val lineFold = s"lf"
    docs
      .withColumn(words, expr(s"filter(split($textCol, '\\\\s+'), x -> x <> '')"))
      .withColumns(Map(
        lineFold -> expr(dupFold(lines, x => s"length($x)")),
        "w_mass" -> expr(s"aggregate($words, 0L, (a, x) -> a + length(x))"),
        "g2" -> expr(topMassFold(sortedHashedGrams(words, 2))),
        "g3" -> expr(topMassFold(sortedHashedGrams(words, 3))),
        "g5" -> expr(dupMassFold(sortedHashedGrams(words, 5)))))
      .withColumns(Map(
        "dup_line_frac" -> ratio("lf.dups", "lf.n"),
        "dup_line_char_frac" -> ratio("lf.dupm", "lf.m"),
        "top_2gram_char_frac" -> ratio("g2", "w_mass"),
        "top_3gram_char_frac" -> ratio("g3", "w_mass"),
        "dup_5gram_char_frac" ->
          round(least(lit(1.0), when(col("w_mass") > 0L,
            col("g5").cast("double") / col("w_mass")).otherwise(lit(0.0))), 4)))
      .drop(lineFold, "w_mass", "g2", "g3", "g5", words)
  }

  /** The Gopher repetition FILTER: keep documents under every
    * threshold (paper defaults). Composes with the heuristic quality
    * score as one scan-stage predicate. */
  def gopherRepetitionKeep(maxDupLineFrac: Double = 0.30,
                           maxDupLineCharFrac: Double = 0.20,
                           maxTop2CharFrac: Double = 0.20,
                           maxTop3CharFrac: Double = 0.18,
                           maxDup5CharFrac: Double = 0.15): Column =
    col("dup_line_frac") <= maxDupLineFrac &&
      col("dup_line_char_frac") <= maxDupLineCharFrac &&
      col("top_2gram_char_frac") <= maxTop2CharFrac &&
      col("top_3gram_char_frac") <= maxTop3CharFrac &&
      col("dup_5gram_char_frac") <= maxDup5CharFrac
}

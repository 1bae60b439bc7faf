package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.call_function

/** SQL time-bucketing vocabulary (the TimescaleDB `time_bucket` /
  * streaming `HOP` surface, SQL-callable): thin PARSE-TIME expansions
  * into the exact expression trees [[graft.engine.RollupSqlRewrite]]
  * recognizes, so SQL written the way TimescaleDB users write it
  * routes to continuous aggregates without knowing the engine's
  * `(timestamp DIV w) * w` idiom.
  *
  *  - `time_bucket(widthMs, ts)` ≡ `(ts DIV widthMs) * widthMs` — the
  *    tumbling-window grouping key. Pure expansion: it codegens,
  *    constant-folds and pushes down like the hand-written form
  *    because after resolution it IS the hand-written form.
  *  - `hop_starts(ts, slideMs, widthMs)` — ARRAY of the sliding
  *    (hopping) window starts containing `ts`: every `w ≡ 0 (mod
  *    slide)` with `w ≤ ts < w + width`. Explode it in a LATERAL VIEW
  *    and group by the exploded column for sliding-window aggregates
  *    in plain SQL; each row lands in exactly width/slide windows
  *    (width must be a positive literal multiple of slide — same gate
  *    as [[graft.engine.ContinuousAggregate.answerWindow]]). Expands
  *    to `sequence(tumble − width + slide, tumble, slide)`.
  *
  * Registered automatically by [[graft.engine.RollupSqlRewrite.register]]
  * (idempotent), or directly via [[register]].
  */
object TimeFunctions {

  /** `time_bucket` as a Column (width first, TimescaleDB order). */
  def timeBucket(widthMs: Column, ts: Column): Column =
    call_function("time_bucket", widthMs, ts)

  /** `hop_starts` as a Column. */
  def hopStarts(ts: Column, slideMs: Column, widthMs: Column): Column =
    call_function("hop_starts", ts, slideMs, widthMs)

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _)  => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case _                   => None
  }

  /** Register SQL-callable functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "time_bucket", exprs => {
        require(exprs.size == 2,
          s"time_bucket(widthMs, ts) takes 2 arguments, got ${exprs.size}")
        litLong(exprs.head).foreach(w => require(w > 0,
          s"time_bucket: widthMs=$w must be positive"))
        Multiply(IntegralDivide(exprs(1), exprs.head), exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hop_starts", exprs => {
        require(exprs.size == 3,
          s"hop_starts(ts, slideMs, widthMs) takes 3 arguments, got ${exprs.size}")
        // literal-only slide/width: the window set per row must be a
        // fixed fan-out for the sequence form (and for the rollup
        // rewrite) to be sound
        val s = litLong(exprs(1)).getOrElse(throw new IllegalArgumentException(
          "hop_starts: slideMs must be an integer literal"))
        val w = litLong(exprs(2)).getOrElse(throw new IllegalArgumentException(
          "hop_starts: widthMs must be an integer literal"))
        require(s > 0 && w > 0 && w % s == 0,
          s"hop_starts: widthMs=$w must be a positive multiple of slideMs=$s " +
            "— a row's window membership is only a fixed fan-out when the " +
            "hop divides the width (answerWindow's gate)")
        val tumble = Multiply(IntegralDivide(exprs.head, Literal(s)), Literal(s))
        val lo = if (s == w) tumble else Add(tumble, Literal(s - w))
        Sequence(lo, tumble, Some(Literal(s)))
      }, "built-in")
  }
}

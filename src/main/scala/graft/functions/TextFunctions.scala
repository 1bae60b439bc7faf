package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis operators for the training-data pipeline extensions
  * (builder brief; SURVEY.md §2.8 disposition): token counting, quality
  * scoring, language ID, document fingerprinting.
  *
  * Every function here is a pure Column expression (whole-stage-codegen
  * friendly, no UDFs), so at 100 TB they run inside the scan stage with
  * zero extra shuffles. The oracle-facing ones are deliberately built
  * from arithmetic/primitives with identical semantics in DuckDB.
  */
object TextFunctions {

  /** Whitespace token count without split(): exact arithmetic identical
    * across engines — (len - len(without spaces)) + 1.
    */
  def wsTokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + 1).cast("long")

  /** BPE-ish token count: letter runs, digit runs, or single other
    * non-space chars (regex identical in Java and DuckDB RE2 for this
    * pattern class).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Punctuation character count via translate (char-for-char, engine-
    * portable).
    */
  def punctCount(text: Column): Column =
    (length(text) - length(translate(text, ".,!?;:", ""))).cast("long")

  /** Number of tokens of `text` that appear in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(split(text, " "), w => w.isin(words: _*))).cast("long")

  val EN_STOP: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "that")
  val ES_STOP: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "los", "se")
  val FR_STOP: Seq[String] = Seq("le", "la", "de", "et", "les", "des", "un", "une")

  /** Distinct-token / total-token ratio — low values flag repetitive
    * spam-like documents (standard pretraining-filter signal).
    */
  def repetitionRatio(text: Column): Column =
    round(size(array_distinct(split(text, " "))).cast("double") /
      size(split(text, " ")).cast("double"), 4)

  /** Heuristic quality score in [0,1]:
    * length factor × (1 − punctuation ratio) × stopword-band factor.
    * Deterministic double arithmetic, mirrored verbatim in the oracle.
    */
  def qualityScore(text: Column): Column = {
    val toks = wsTokenCount(text).cast("double")
    val lenFactor = least(lit(1.0), toks / 100.0)
    val punctRatio = punctCount(text).cast("double") / length(text).cast("double")
    val stopRatio = stopwordHits(text, EN_STOP).cast("double") / toks
    val stopFactor = when(stopRatio.between(0.05, 0.6), 1.0).otherwise(0.5)
    round(lenFactor * (lit(1.0) - punctRatio) * stopFactor, 4)
  }

  /** Stopword-profile language ID over {en, es, fr} with a fixed
    * tie-break order — a deterministic n-gram-free heuristic (the
    * fixture's text is synthetic, so semantics = reproducibility, not
    * linguistic accuracy).
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, EN_STOP)
    val es = stopwordHits(text, ES_STOP)
    val fr = stopwordHits(text, FR_STOP)
    when(en >= es && en >= fr, "en").when(es >= fr, "es").otherwise("fr")
  }

  /** Canonical text normalization for dedup/fingerprint keys:
    * lowercase, strip the sentence punctuation set, collapse runs of
    * spaces, trim. Scan-stage expressions only (codegen'd regexp) with
    * Java/RE2-shared syntax so the oracle replays it exactly — two
    * texts that differ only in case/punct/spacing normalize equal.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[.,!?;:]", ""), " +", " "))

  /** 64-bit polynomial rolling hash of the UTF-8 bytes,
    * h = (h*31 + byte) mod 1e9+7 — a custom codegen'd Catalyst
    * [[Expression]] (no UDF): the fold runs inside whole-stage codegen.
    */
  def rollingHash(c: Column): Column = call_function("graft_rolling_hash", c)

  /** Register SQL-callable functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs.head), "built-in")
  }
}

/** `h_0 = 0; h_{i+1} = (h_i * 31 + byte_i) mod 1_000_000_007` over the
  * string's UTF-8 bytes. Used for cheap document fingerprinting /
  * bucketing. Implements doGenCode so the loop stays inside
  * WholeStageCodegen (builder brief: "a native Catalyst Expression
  * (with doGenCode) beats a Scala UDF").
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

package graft.operators

import graft.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer induction over the corpus
  * (Sennrich/Haddow/Birch, ACL'16) — beyond-reference, builder brief:
  * a training-data pipeline that counts/packs tokens eventually has to
  * TRAIN the tokenizer those counts are denominated in.
  *
  * Scale shape (the same split HuggingFace's trainers use): the corpus
  * is touched ONCE, by the word-frequency aggregate ([[wordVocab]]).
  * Every merge round after that runs over the DISTINCT-WORD vocabulary
  * (Zipf-bounded — ~10^8 rows for web text at 100 TB, vs ~10^12 corpus
  * tokens), as a pair-explode + weighted count aggregate; only the
  * single argmax row crosses to the driver per round, so driver state
  * is O(numMerges). No corpus re-scan, no per-round text shuffle: the
  * vocab rows shuffle once per round on (lhs, rhs) pair keys whose
  * payload is one summed count.
  *
  * Determinism: counts are integer sums; the argmax tie-breaks on
  * (count desc, lhs asc, rhs asc); the merge application is a
  * greedy leftmost non-overlapping array fold. Two runs — or a
  * distributed run vs the sequential reference ([[Bpe.referenceLearn]],
  * spec-pinned equal) — produce identical merge tables.
  *
  * Apply side: [[encode]] is a codegen'd Catalyst expression
  * ([[BpeEncode]]) carrying the learned merge ranks as a broadcast-
  * literal-derived table — scan-stage tokenization, no UDF, no model
  * state beyond the O(numMerges) rank map.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence, so
    * merges can learn word-final units ("ing</w>") distinctly from
    * word-internal ones — the original BPE formulation. */
  val EndOfWord = "</w>"

  /** One learned merge: `lhs`+`rhs` → `merged`, applied in `rank`
    * order; `cnt` is the weighted pair count that won the round. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long) {
    def merged: String = lhs + rhs
  }

  /** Distinct-word frequency table — the ONE corpus-scale stage.
    * Whitespace words, empties dropped (split() yields them around
    * runs of spaces). */
  def wordVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its characters plus the
    * [[EndOfWord]] marker. `(?!^)(?!$)` splits strictly BETWEEN
    * characters: Spark's split passes Java limit -1, so a pattern that
    * also matched at end-of-string would emit a trailing EMPTY symbol
    * (and "" would then pair with the marker in every word — a phantom
    * top merge). */
  private[graft] def initSyms(word: Column): Column =
    concat(split(word, "(?!^)(?!$)"), array(lit(EndOfWord)))

  /** The (syms, freq) vocabulary BPE training starts from: every
    * distinct word as its character sequence plus the end-of-word
    * marker, weighted by corpus frequency. */
  def initialVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordVocab(docs, textCol)
      .select(initSyms(col("word")).as("syms"), col("freq"))

  /** Weighted adjacent-pair counts over a (syms, freq) vocabulary:
    * one row per (lhs, rhs) with `cnt = Σ freq · occurrences`. The
    * explode is vocabulary-sized (bounded by Σ word lengths over
    * DISTINCT words), and partial aggregation absorbs the Zipf head
    * map-side before the pair-keyed shuffle. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("lhs"),
            element_at(col("syms"), i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy leftmost non-overlapping application of ONE merge to a
    * symbol array, as a scan-stage fold: walking left to right, a
    * trailing `lhs` followed by the current `rhs` contracts; the
    * merged symbol itself can then seed the NEXT contraction only via
    * later elements (so "aaaa" under (a,a) → [aa, aa], the classic
    * semantics). `try_element_at(-1)` is null on the empty
    * accumulator, so the first element always appends (no ANSI
    * out-of-bounds). */
  private[graft] def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, typedLit(Seq.empty[String]),
      (acc, x) => when(
        try_element_at(acc, lit(-1)) === lit(lhs) && x === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges over the corpus. Stops early when the
    * best remaining pair's weighted count falls below `minPairFreq`
    * (a merge seen once generalizes to nothing). Each round
    * checkpoints the rewritten vocabulary — lineage stays one round
    * deep instead of numMerges folds tall. */
  def learnMerges(docs: DataFrame, numMerges: Int, textCol: String = "text",
                  minPairFreq: Long = 2L): Seq[Merge] = {
    var vocab = initialVocab(docs, textCol).graftCheckpoint()
    val out = ArrayBuffer.empty[Merge]
    var done = false
    while (out.length < numMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect() // ONE row per round — the only driver traffic
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minPairFreq) done = true
      else {
        val (l, r, c) = (top(0).getAs[String]("lhs"),
          top(0).getAs[String]("rhs"), top(0).getAs[Long]("cnt"))
        out += Merge(out.length, l, r, c)
        vocab = vocab
          .select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
          .graftCheckpoint()
      }
    }
    out.toSeq
  }

  /** The learned merge table as a DataFrame (driver-local, O(numMerges)
    * rows). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
      .select(col("rank").cast("long").as("rank"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
      .orderBy(col("rank"))
  }

  /** Tokenize `text` with the learned merges: whitespace-split, each
    * word BPE-encoded (lowest-rank-present pair merged repeatedly —
    * provably equal to replaying the training folds in rank order,
    * spec-pinned), tokens concatenated across words. Returns
    * array<string> including [[EndOfWord]]-suffixed units. */
  def encode(text: Column, merges: Seq[Merge]): Column =
    call_function("graft_bpe_encode", text,
      typedLit(merges.map(m => Seq(m.lhs, m.rhs))))

  /** Register SQL-callable functions on a session (idempotent). The
    * merges argument must be a foldable array<array<string>> literal —
    * it is folded into the expression at plan build, so per-row
    * evaluation only touches the prebuilt rank map. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode", exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_bpe_encode(text, merges): merges must be a literal")
        val arr = exprs(1).eval().asInstanceOf[ArrayData]
        val merges = (0 until arr.numElements()).map { i =>
          val p = arr.getArray(i)
          (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
        }
        BpeEncode(exprs.head, merges)
      }, "built-in")

  /** Sequential reference learner (driver-side, for specs): identical
    * semantics to [[learnMerges]] over an in-memory (word, freq) list.
    * Kept here (not in test code) so the distributed implementation is
    * pinned against an executable spec of the algorithm. */
  def referenceLearn(words: Seq[(String, Long)], numMerges: Int,
                     minPairFreq: Long = 2L): Seq[Merge] = {
    var vocab: Seq[(Vector[String], Long)] = words
      .groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq
      .map { case (w, f) =>
        (splitChars(w) :+ EndOfWord, f)
      }
    val out = ArrayBuffer.empty[Merge]
    var done = false
    while (out.length < numMerges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minPairFreq) done = true
        else {
          out += Merge(out.length, l, r, c)
          vocab = vocab.map { case (syms, f) => (mergeOnce(syms, l, r), f) }
        }
      }
    }
    out.toSeq
  }

  /** Greedy leftmost non-overlapping merge of one pair (reference +
    * codec building block). */
  private[graft] def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
        out += l + r; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Code-point-wise character split (surrogate-pair safe, matching
    * Java regex `(?!^)` split semantics used on the distributed path). */
  private[graft] def splitChars(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }
}

/** Per-word BPE state machine shared by the expression's interpreted
  * and codegen paths (and the specs' reference encoder): repeatedly
  * merge the lowest-training-rank adjacent pair until none remains.
  */
final class BpeCodec(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // first (lowest) rank wins if a pair somehow repeats
      m.putIfAbsent(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  def encodeWord(word: String): Vector[String] = {
    var syms = Bpe.splitChars(word) :+ Bpe.EndOfWord
    var continue = true
    while (continue && syms.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else syms = Bpe.mergeOnce(syms, merges(best)._1, merges(best)._2)
    }
    syms
  }

  /** Whole-document encode: whitespace words, empties skipped, token
    * streams concatenated. */
  def encode(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ")
    val toks = ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        encodeWord(words(i)).foreach(t => toks += UTF8String.fromString(t))
      i += 1
    }
    new GenericArrayData(toks.toArray[Any])
  }
}

/** `graft_bpe_encode(text)` with a fixed merge table: scan-stage BPE
  * tokenization as a codegen'd unary expression — the rank map builds
  * once per task (transient lazy), not per row, and the generated code
  * calls straight into [[BpeCodec.encode]] via a reference object (the
  * [[graft.functions.RollingHash]] precedent for keeping custom logic
  * inside WholeStageCodegen).
  */
case class BpeEncode(child: Expression, mergePairs: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val codec = new BpeCodec(mergePairs.toArray)

  override def nullSafeEval(input: Any): Any =
    codec.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $codecRef.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

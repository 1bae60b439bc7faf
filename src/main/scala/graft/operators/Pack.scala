package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM pretraining: concatenate the corpus in a
  * deterministic document order and chunk the token stream into
  * fixed-capacity training sequences (the standard concat-and-chunk
  * packing; documents may straddle a sequence boundary).
  *
  * The global token-offset assignment is a prefix sum over the corpus.
  * A naive `sum(toks) OVER (ORDER BY doc_id)` with no PARTITION BY puts
  * the ENTIRE corpus through one window partition — a single-task
  * bottleneck that dies at 100 TB. This implementation is the textbook
  * distributed prefix sum instead:
  *
  *  1. bucket docs by a pure function of doc_id (`doc_id div width`),
  *     so bucketing is deterministic and needs no range sampling;
  *  2. ONE shuffle clusters each bucket; the running sum within a
  *     bucket is an ordinary partitioned window;
  *  3. per-bucket token totals (map-side-combined groupBy over the
  *     same data, ≤ `targetBuckets` rows) are collected, prefix-summed
  *     on the driver, and broadcast back as each bucket's offset.
  *
  * The only driver-side state is one row per bucket (bounded by
  * `targetBuckets`, never by corpus size); the widest shuffle ships
  * (doc_id, toks) pairs — plus the text itself only on the
  * [[packApply]] materialization path, where the output IS the text.
  */
object Pack {

  /** Per-sequence packing stats at `capacity` tokens per sequence:
    * `(seq_id, n_docs, n_split_docs, n_tokens, first_doc, last_doc)`
    * where `n_split_docs` counts docs that cross one of this sequence's
    * boundaries and `n_tokens` is the tokens this sequence actually
    * holds (== capacity for every sequence but the last).
    *
    * Token counts use the whitespace tokenizer ([[TextFunctions
    * .wsTokenCount]]) so the oracle can replay them exactly.
    */
  def packSequences(docs: DataFrame, capacity: Long,
                    targetBuckets: Int = 256): DataFrame =
    packSequencesBy(docs,
      TextFunctions.wsTokenCount(col("text")), capacity, targetBuckets)

  /** [[packSequences]] under a caller-supplied token-count column —
    * the seam a REAL tokenizer plugs into (x_pipeline_tokenize_pack
    * packs by the learned BPE tokenizer's counts via [[graft.operators
    * .Bpe.encode]]); the prefix-sum machinery is token-definition-
    * agnostic, so the plan shape is identical. */
  def packSequencesBy(docs: DataFrame, tokenCount: org.apache.spark.sql.Column,
                      capacity: Long, targetBuckets: Int = 256): DataFrame = {
    require(capacity > 0, s"packSequences: capacity=$capacity must be > 0")
    val d = docs.select(col("doc_id").cast("long").as("doc_id"),
      tokenCount.cast("long").as("toks"))
    withOffsets(d, targetBuckets) match {
      case None => emptyStats(docs.sparkSession)
      case Some(placed) =>
        explodeSeqs(placed, capacity)
          .groupBy(col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("start_off") < col("seq_id") * capacity ||
              col("end_off") > (col("seq_id") + 1) * capacity, 1)).as("n_split_docs"),
            sum(col("s_hi") - col("s_lo")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("seq_id"))
    }
  }

  /** Materialize the packed sequences themselves:
    * `(seq_id, n_tokens, h)` where `h` is the md5 of the sequence text
    * (each doc's token slice, docs joined in doc_id order by single
    * spaces) — the witness form keeps the oracle compare exact without
    * shipping megabyte rows through the dump. The slice arithmetic is
    * pure scan-stage column algebra; the only shuffles are the bucket
    * clustering and the final per-sequence assembly.
    */
  def packApply(docs: DataFrame, capacity: Long,
                targetBuckets: Int = 256): DataFrame = {
    require(capacity > 0, s"packApply: capacity=$capacity must be > 0")
    val d = docs.select(col("doc_id").cast("long").as("doc_id"),
      split(col("text"), " ").as("tok_arr"))
      .withColumn("toks", size(col("tok_arr")).cast("long"))
    withOffsets(d, targetBuckets) match {
      case None => emptyApply(docs.sparkSession)
      case Some(placed) =>
        explodeSeqs(placed, capacity)
          .withColumn("part", concat_ws(" ", slice(col("tok_arr"),
            (col("s_lo") - col("start_off") + 1).cast("int"),
            (col("s_hi") - col("s_lo")).cast("int"))))
          .groupBy(col("seq_id"))
          .agg(sum(col("s_hi") - col("s_lo")).as("n_tokens"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("doc_id"), col("part")))),
              x => x.getField("part")), " ")).as("h"))
          .orderBy(col("seq_id"))
    }
  }

  /** Global token offsets for `d` (must carry `doc_id` and `toks`):
    * adds `start_off`/`end_off` via the bucketed two-phase prefix sum.
    * None when the input is empty.
    */
  private def withOffsets(d: DataFrame, targetBuckets: Int): Option[DataFrame] = {
    val spark = d.sparkSession
    // bucket width from max(doc_id): one tiny agg job (min/max come
    // from parquet footer stats when the source is an unfiltered scan)
    // one tiny agg job (min/max come from parquet footer stats when the
    // source is an unfiltered scan)
    val maxRow = d.agg(max(col("doc_id")), min(col("doc_id"))).head()
    if (maxRow.isNullAt(0)) return None
    // SQL `div` truncates toward zero, so negative ids would interleave
    // bucket ranges (-5 div 10 == 0 == 5 div 10) and break the carry
    require(maxRow.getLong(1) >= 0L,
      s"packSequences: doc ids must be non-negative, got min=${maxRow.getLong(1)}")
    val width = math.max(1L, maxRow.getLong(0) / targetBuckets.toLong + 1L)
    val b = d.withColumn("bkt", expr(s"doc_id div $width"))

    // per-bucket running sum: an ordinary partitioned window (shuffle
    // clusters by bkt; each bucket sorts independently). ROWS frame, not
    // the default RANGE: RANGE treats order-by peers as one frame and
    // would double-assign offsets. Duplicate ids (ORDER BY peers whose
    // relative order — and therefore the whole offset assignment — is
    // undefined) raise on the SAME window pass: equal ids always share
    // a bucket, so lag(doc_id) == doc_id detects every dup with zero
    // extra jobs (no corpus-wide countDistinct).
    val wOrd = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
    val lcumRaw = sum(col("toks"))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val dupHit = col("doc_id") === lag(col("doc_id"), 1).over(wOrd)
    val local = b.withColumn("lcum",
      when(dupHit, raise_error(concat(lit("packSequences: duplicate doc_id "),
        col("doc_id"))).cast("long")).otherwise(lcumRaw))

    // bucket offsets: ≤ targetBuckets rows to the driver, prefix-summed
    // and broadcast back — the cross-bucket carry of the prefix sum
    val totals = b.groupBy(col("bkt")).agg(sum(col("toks")).as("btot"))
      .orderBy(col("bkt")).collect()
    var acc = 0L
    val offsetRows = totals.map { r =>
      val row = Row(r.getLong(0), acc)
      acc += r.getLong(1)
      row
    }
    val offsets = spark.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(StructField("bkt", LongType, nullable = false),
        StructField("off", LongType, nullable = false))))

    Some(local.join(broadcast(offsets), Seq("bkt"))
      .withColumn("end_off", col("lcum") + col("off"))
      .withColumn("start_off", col("end_off") - col("toks")))
  }

  /** A doc with T >= 1 tokens at [start, end) touches sequences
    * floor(start/C) .. floor((end-1)/C); its overlap with sequence s is
    * [s_lo, s_hi) = [start,end) ∩ [sC, (s+1)C).
    */
  private def explodeSeqs(placed: DataFrame, capacity: Long): DataFrame =
    placed
      .withColumn("seq_id", explode(sequence(
        expr(s"start_off div $capacity"), expr(s"(end_off - 1) div $capacity"))))
      .withColumn("s_lo", greatest(col("start_off"), col("seq_id") * capacity))
      .withColumn("s_hi", least(col("end_off"), (col("seq_id") + 1) * capacity))

  private def emptyStats(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](),
      StructType.fromDDL("seq_id BIGINT, n_docs BIGINT, n_split_docs BIGINT, " +
        "n_tokens BIGINT, first_doc BIGINT, last_doc BIGINT"))

  private def emptyApply(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](),
      StructType.fromDDL("seq_id BIGINT, n_tokens BIGINT, h STRING"))
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Mergeable quantile summaries AS COLUMNS (Greenwald–Khanna, the
  * sketch behind Spark's own `approx_percentile`): build a sketch per
  * group, STORE it (a binary column in a rollup), merge stored
  * sketches across groups later, and query any quantile from the
  * merged result — without revisiting the raw rows.
  *
  * Spark's built-in `approx_percentile` fuses build+query into one
  * aggregate, which is useless for materialized rollups: a percentile
  * is not mergeable, a sketch is. This trio splits the lifecycle —
  * exactly the TimescaleDB `percentile_agg`/`approx_percentile`
  * two-step — so a continuous aggregate can keep one ~KB sketch per
  * (bucket, tag) and answer any percentile over any bucket-aligned
  * window in O(buckets), never O(events).
  *
  * Error bound (GK, preserved under merge): a quantile query at q
  * returns a value whose RANK is within ±ε·n of q·n. The sketch size
  * is O((1/ε)·log(ε·n)).
  *
  *  - [[qsketch]]: Double column → binary sketch (aggregate)
  *  - [[qsketchMerge]]: binary sketches → merged binary sketch (aggregate)
  *  - [[qsketchQuantile]]: (sketch, q) → approximate quantile (scalar)
  */
object QuantileFunctions {

  /** Aggregate a Double column into a serialized GK summary with the
    * given relative rank error (e.g. 0.01). Callers must [[register]].
    */
  def qsketch(c: Column, relativeError: Double = 0.01): Column =
    call_function("graft_qsketch", c,
      org.apache.spark.sql.functions.lit(relativeError))

  /** Merge serialized GK summaries (NULLs skipped; all-NULL/empty
    * input yields an empty sketch whose quantile query is NULL).
    */
  def qsketchMerge(c: Column): Column = call_function("graft_qsketch_merge", c)

  /** Approximate quantile q ∈ [0, 1] from a serialized sketch; NULL on
    * NULL/empty sketch.
    */
  def qsketchQuantile(sketch: Column, q: Double): Column =
    call_function("graft_qsketch_quantile", sketch,
      org.apache.spark.sql.functions.lit(q))

  /** Register SQL-callable functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsketch", exprs => QSketchAgg(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsketch_merge", exprs => QSketchMergeAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsketch_quantile",
      exprs => QSketchQuantile(exprs.head, exprs(1)), "built-in")
  }
}

/** Mutable wrapper holding the (functional-update) QuantileSummaries —
  * the same shape as Spark's PercentileDigest: insert buffers rows,
  * [[compress]] flushes the head buffer (required before merge/query/
  * serialize), and all ops reassign the inner summary.
  */
final class QSketchState(var s: QuantileSummaries, var isCompressed: Boolean) {
  def add(v: Double): Unit = { s = s.insert(v); isCompressed = false }
  def compress(): Unit = if (!isCompressed) { s = s.compress(); isCompressed = true }
  def merge(o: QSketchState): Unit = {
    compress(); o.compress()
    s = s.merge(o.s)
  }
  def query(q: Double): Option[Double] = { compress(); s.query(q) }
}

object QSketchState {
  def empty(relativeError: Double): QSketchState =
    new QSketchState(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError,
      Array.empty[QuantileSummaries.Stats], 0L, false), isCompressed = true)

  /** Wire format: relativeError, count, n, then (value, g, delta)
    * triples of the compressed sample array.
    */
  def serialize(st: QSketchState): Array[Byte] = {
    st.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(st.s.relativeError)
    out.writeLong(st.s.count)
    val sampled = st.s.sampled
    out.writeInt(sampled.length)
    sampled.foreach { t =>
      out.writeDouble(t.value); out.writeLong(t.g); out.writeLong(t.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QSketchState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val relErr = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      sampled(i) = QuantileSummaries.Stats(
        in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new QSketchState(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relErr, sampled, count,
      true), isCompressed = true)
  }
}

/** Build aggregate: Double column → serialized GK summary. */
case class QSketchAgg(child: Expression, relErrExpr: Expression,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchState] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = relErrExpr

  private lazy val relativeError: Double = relErrExpr match {
    case Literal(e: Double, DoubleType) if e > 0 && e < 1 => e
    case other => throw new IllegalArgumentException(
      s"graft_qsketch relative error must be a DOUBLE literal in (0, 1), got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch"

  override def createAggregationBuffer(): QSketchState =
    QSketchState.empty(relativeError)

  override def update(buffer: QSketchState, input: InternalRow): QSketchState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: QSketchState, other: QSketchState): QSketchState = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: QSketchState): Any = QSketchState.serialize(buffer)

  override def serialize(buffer: QSketchState): Array[Byte] =
    QSketchState.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): QSketchState =
    QSketchState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QSketchAgg =
    copy(child = newLeft, relErrExpr = newRight)
}

/** Merge aggregate: serialized sketches → merged serialized sketch.
  * The empty-input result is an empty sketch (count 0) whose quantile
  * query returns NULL — the mempty of the sketch monoid, so refolds
  * over empty groups stay total.
  */
case class QSketchMergeAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchState] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch_merge"

  override def createAggregationBuffer(): QSketchState =
    QSketchState.empty(QuantileSummaries.defaultRelativeError)

  override def update(buffer: QSketchState, input: InternalRow): QSketchState = {
    val v = child.eval(input)
    if (v != null) {
      val other = QSketchState.deserialize(v.asInstanceOf[Array[Byte]])
      // adopt the first real sketch's error budget (merge keeps the
      // coarser of the two anyway; an empty buffer has no opinion)
      if (buffer.s.count == 0L) { buffer.s = other.s; buffer.isCompressed = other.isCompressed }
      else buffer.merge(other)
    }
    buffer
  }

  override def merge(buffer: QSketchState, other: QSketchState): QSketchState = {
    if (buffer.s.count == 0L) other
    else if (other.s.count == 0L) buffer
    else { buffer.merge(other); buffer }
  }

  override def eval(buffer: QSketchState): Any = QSketchState.serialize(buffer)

  override def serialize(buffer: QSketchState): Array[Byte] =
    QSketchState.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): QSketchState =
    QSketchState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QSketchMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QSketchMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): QSketchMergeAgg =
    copy(child = newChild)
}

/** Scalar quantile query over a serialized sketch. CodegenFallback:
  * this evaluates once per GROUP (rollup rows), never per event, so
  * interpreted evaluation is off the hot path by construction.
  */
case class QSketchQuantile(sketch: Expression, qExpr: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = qExpr

  private lazy val q: Double = qExpr match {
    case Literal(v: Double, DoubleType) if v >= 0 && v <= 1 => v
    case other => throw new IllegalArgumentException(
      s"graft_qsketch_quantile q must be a DOUBLE literal in [0, 1], got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qsketch_quantile"

  override def nullSafeEval(sketchBytes: Any, qv: Any): Any = {
    val st = QSketchState.deserialize(sketchBytes.asInstanceOf[Array[Byte]])
    st.query(q).map(java.lang.Double.valueOf).orNull
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QSketchQuantile =
    copy(sketch = newLeft, qExpr = newRight)
}

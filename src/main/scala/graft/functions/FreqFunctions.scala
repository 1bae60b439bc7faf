package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded-memory frequent-items summaries (Misra-Gries).
  *
  * The aggregation buffer holds AT MOST `capacity` (item, count)
  * entries regardless of input size, and partial aggregation merges
  * summaries — so a frequency sweep over a 100 TB token stream ships
  * `capacity`-bounded buffers through the shuffle instead of the full
  * token universe (which for web-scale text — URLs, hex ids, typos —
  * is itself corpus-scale). The classic guarantees hold under merging
  * (mergeable summaries, Agarwal et al., PODS 2012):
  *
  *  - estimated count ∈ [true − N/(capacity+1), true] for every item;
  *  - any item with true count > N/(capacity+1) is IN the summary.
  *
  * Exactness: while the distinct-item count never exceeds `capacity`,
  * no decrements ever fire and the summary is exact (the property the
  * oracle query relies on at fixture vocabulary sizes).
  */
object FreqFunctions {

  /** Misra-Gries summary of a string column: array of (item, est)
    * structs, sorted (est desc, item asc). Callers must [[register]].
    */
  def misraGries(c: Column, capacity: Int): Column =
    call_function("graft_misra_gries", c, org.apache.spark.sql.functions.lit(capacity))

  /** Misra-Gries summary AS A STORABLE COLUMN (serialized bytes) — the
    * store-then-merge lifecycle split, like
    * [[QuantileFunctions.qsketch]]: build one per rollup bucket, merge
    * stored sketches across buckets later, query top-k from the merged
    * result without revisiting raw rows.
    */
  def mgSketch(c: Column, capacity: Int): Column =
    call_function("graft_mg_sketch", c, org.apache.spark.sql.functions.lit(capacity))

  /** Merge serialized MG summaries (NULLs skipped; empty input merges
    * to an empty summary). */
  def mgSketchMerge(c: Column, capacity: Int): Column =
    call_function("graft_mg_sketch_merge", c,
      org.apache.spark.sql.functions.lit(capacity))

  /** Top-k (item, est) rows of a serialized summary, (est desc, item
    * asc)-sorted; empty array on NULL/empty sketch. */
  def mgSketchTopK(sketch: Column, k: Int): Column =
    call_function("graft_mg_sketch_topk", sketch,
      org.apache.spark.sql.functions.lit(k))

  /** Register SQL-callable functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_misra_gries", exprs => MisraGries(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_sketch", exprs => MgSketchAgg(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_sketch_merge",
      exprs => MgSketchMergeAgg(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_sketch_topk",
      exprs => MgSketchTopK(exprs.head, exprs(1)), "built-in")
  }
}

/** The pure Misra-Gries state transitions, factored out of the
  * expression so the algorithm's laws are directly property-testable
  * (FreqSpec) without driving a Spark plan.
  */
object MgOps {
  type Summary = mutable.HashMap[UTF8String, Long]

  /** Observe one item: bump if tracked, insert if room, else the
    * classic decrement-all step (amortized O(1): each decrement pass
    * is paid for by `capacity` prior inserts/bumps).
    */
  def update(s: Summary, item: UTF8String, capacity: Int): Unit =
    s.get(item) match {
      case Some(n) => s.update(item, n + 1)
      case None if s.size < capacity => s.update(item.clone(), 1L)
      case None =>
        val dead = s.iterator.collect { case (k, 1L) => k }.toList
        s.mapValuesInPlace((_, n) => n - 1)
        dead.foreach(s.remove)
    }

  /** Merge two summaries: add counts, then if over capacity subtract
    * the (capacity+1)-th largest combined count from everything and
    * drop the non-positive — the merge that preserves the ε = 1/(cap+1)
    * error bound (Agarwal et al.).
    */
  def merge(a: Summary, b: Summary, capacity: Int): Unit = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (cap+1)-th largest
      val dead = a.iterator.collect { case (k, n) if n <= cut => k }.toList
      a.mapValuesInPlace((_, n) => n - cut)
      dead.foreach(a.remove)
    }
  }

  /** Wire format shared by every MG aggregate: count, then
    * (len, bytes, est) per entry. */
  def serialize(buffer: Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, n) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    s
  }

  /** (est desc, item asc)-sorted entries — the one output order. */
  def sorted(buffer: Summary): Array[(UTF8String, Long)] = {
    val arr = buffer.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(x: (UTF8String, Long), y: (UTF8String, Long)): Int =
        if (x._2 != y._2) java.lang.Long.compare(y._2, x._2)
        else x._1.compareTo(y._1)
    })
    arr
  }
}

/** Misra-Gries frequent-items aggregate over a string column (see
  * [[FreqFunctions]]). Imperative aggregate: the buffer is a genuinely
  * associative bounded map, which has no fixed-width declarative form.
  */
case class MisraGries(child: Expression, capacityExpr: Expression,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgOps.Summary] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capacityExpr

  private lazy val capacity: Int = capacityExpr match {
    case Literal(c: Int, IntegerType) if c >= 1 => c
    case other => throw new IllegalArgumentException(
      s"graft_misra_gries capacity must be a positive INT literal, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): MgOps.Summary = mutable.HashMap.empty

  override def update(buffer: MgOps.Summary, input: InternalRow): MgOps.Summary = {
    val v = child.eval(input)
    if (v != null) MgOps.update(buffer, v.asInstanceOf[UTF8String], capacity)
    buffer
  }

  override def merge(buffer: MgOps.Summary, other: MgOps.Summary): MgOps.Summary = {
    MgOps.merge(buffer, other, capacity)
    buffer
  }

  override def eval(buffer: MgOps.Summary): Any =
    new GenericArrayData(MgOps.sorted(buffer).map { case (k, n) =>
      InternalRow(k, n): Any
    })

  override def serialize(buffer: MgOps.Summary): Array[Byte] =
    MgOps.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): MgOps.Summary =
    MgOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MisraGries =
    copy(child = newLeft, capacityExpr = newRight)
}

/** Build aggregate: string column → serialized MG summary (the
  * storable form — [[FreqFunctions.mgSketch]]). */
case class MgSketchAgg(child: Expression, capacityExpr: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgOps.Summary] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capacityExpr

  private lazy val capacity: Int = capacityExpr match {
    case Literal(c: Int, IntegerType) if c >= 1 => c
    case other => throw new IllegalArgumentException(
      s"graft_mg_sketch capacity must be a positive INT literal, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_sketch"

  override def createAggregationBuffer(): MgOps.Summary = mutable.HashMap.empty

  override def update(buffer: MgOps.Summary, input: InternalRow): MgOps.Summary = {
    val v = child.eval(input)
    if (v != null) MgOps.update(buffer, v.asInstanceOf[UTF8String], capacity)
    buffer
  }

  override def merge(buffer: MgOps.Summary, other: MgOps.Summary): MgOps.Summary = {
    MgOps.merge(buffer, other, capacity)
    buffer
  }

  override def eval(buffer: MgOps.Summary): Any = MgOps.serialize(buffer)
  override def serialize(buffer: MgOps.Summary): Array[Byte] =
    MgOps.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): MgOps.Summary =
    MgOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MgSketchAgg =
    copy(child = newLeft, capacityExpr = newRight)
}

/** Merge aggregate: serialized MG summaries → merged serialized
  * summary, preserving the ε = 1/(capacity+1) bound (NULLs skipped;
  * empty input → empty summary). */
case class MgSketchMergeAgg(child: Expression, capacityExpr: Expression,
                            mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgOps.Summary] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capacityExpr

  private lazy val capacity: Int = capacityExpr match {
    case Literal(c: Int, IntegerType) if c >= 1 => c
    case other => throw new IllegalArgumentException(
      s"graft_mg_sketch_merge capacity must be a positive INT literal, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_sketch_merge"

  override def createAggregationBuffer(): MgOps.Summary = mutable.HashMap.empty

  override def update(buffer: MgOps.Summary, input: InternalRow): MgOps.Summary = {
    val v = child.eval(input)
    if (v != null)
      MgOps.merge(buffer, MgOps.deserialize(v.asInstanceOf[Array[Byte]]), capacity)
    buffer
  }

  override def merge(buffer: MgOps.Summary, other: MgOps.Summary): MgOps.Summary = {
    MgOps.merge(buffer, other, capacity)
    buffer
  }

  override def eval(buffer: MgOps.Summary): Any = MgOps.serialize(buffer)
  override def serialize(buffer: MgOps.Summary): Array[Byte] =
    MgOps.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): MgOps.Summary =
    MgOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MgSketchMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgSketchMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MgSketchMergeAgg =
    copy(child = newLeft, capacityExpr = newRight)
}

/** Scalar top-k query over a serialized MG summary — evaluates once
  * per GROUP (rollup rows), never per event, so interpreted evaluation
  * is off the hot path by construction. */
case class MgSketchTopK(sketch: Expression, kExpr: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = kExpr

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v >= 1 => v
    case other => throw new IllegalArgumentException(
      s"graft_mg_sketch_topk k must be a positive INT literal, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_sketch_topk"

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      MgOps.sorted(MgOps.deserialize(b.asInstanceOf[Array[Byte]]))
        .take(k).map { case (kk, n) => InternalRow(kk, n): Any })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MgSketchTopK =
    copy(sketch = newLeft, kExpr = newRight)
}

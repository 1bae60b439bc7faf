package graft.engine

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size Bloom filter over a partition's tag set — the physical
  * analogue of the reference's tag index (`_sIx :: HashMap Tag (IntMap
  * Ix)`, reference server/src/Repository/Model.hs:92): where the
  * reference answers "which rows carry tag t" from an in-RAM hash map,
  * a 100 TB store answers "which PARTITIONS can carry tag t" from an
  * 8 KiB sidecar per (segment, day) partition, and never opens the
  * rest. [[TimeSeriesStore]] writes one sidecar per day partition at
  * segment-write time and consults them in
  * [[TimeSeriesStore.currentForTag]]; a missing/unreadable sidecar
  * disables pruning for that partition only (never wrong, just
  * unpruned — old stores keep working).
  *
  * No false negatives by construction, so pruning is semantically
  * invisible: every row with tag t lives in a partition whose bloom
  * reports (possibly-)present. False positives only cost I/O, bounded
  * by ~0.1% at 4k distinct tags per partition (m = 2^16 bits, k = 5);
  * a partition with ≫ m/10 distinct tags saturates its bloom and
  * degrades to "always scan" — the honest failure mode.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over the tag's UTF-8
  * bytes (two Murmur3 seeds, k derived probes) — pure arithmetic,
  * stable across JVMs, so sidecars written by one process prune reads
  * in another.
  */
object TagBloom {
  /** 2^16 bits = 8 KiB per (segment, day) partition. */
  val BITS: Int = 1 << 16
  val BYTES: Int = BITS / 8
  private val K = 5
  private val SEED1 = 0x9747b28c
  private val SEED2 = 0x5bd1e995

  /** The k bit positions for a tag (Kirsch–Mitzenmacher: pos_i =
    * h1 + i·h2 mod m preserves the classic false-positive bound). */
  private[graft] def positions(tagUtf8: Array[Byte]): Array[Int] = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(tagUtf8, SEED1)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(tagUtf8, SEED2)
    Array.tabulate(K)(i => math.floorMod(h1 + i * h2, BITS))
  }

  private[graft] def add(bloom: Array[Byte], tagUtf8: Array[Byte]): Unit =
    positions(tagUtf8).foreach { p =>
      bloom(p >>> 3) = (bloom(p >>> 3) | (1 << (p & 7))).toByte
    }

  /** True when the tag MAY be present (never false for a present tag). */
  def mightContain(bloom: Array[Byte], tag: String): Boolean = {
    if (bloom == null || bloom.length != BYTES) return true // unreadable => scan
    positions(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .forall(p => (bloom(p >>> 3) & (1 << (p & 7))) != 0)
  }

  /** Aggregate: string column → serialized bloom (BinaryType). */
  def tagBloom(c: Column): Column = call_function("graft_tag_bloom", c)

  /** Register the SQL-callable aggregate on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tag_bloom", exprs => TagBloomAgg(exprs.head), "built-in")
}

/** Bloom-filter build aggregate: fixed 8 KiB buffer regardless of
  * input size, merge = bitwise OR — the mergeable-summary shape that
  * ships bounded partial buffers through the shuffle (like
  * [[graft.functions.FreqFunctions]]' MG sketch).
  */
case class TagBloomAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_tag_bloom"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](TagBloom.BYTES)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) TagBloom.add(buffer, v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): TagBloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TagBloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TagBloomAgg =
    copy(child = newChild)
}

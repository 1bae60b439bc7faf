package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact wide-integer aggregation for the scaled-sum fast path.
  *
  * [[Sum128]] sums LongType into a 128-bit two's-complement accumulator
  * held as two Long buffer slots — the int128 ("hugeint") accumulator
  * fast columnar engines use for exact integer sums. Compared to the
  * alternatives for overflow-safe exact sums:
  *   - `sum(x)` over LongType is long-speed but throws ANSI
  *     ARITHMETIC_OVERFLOW past 2^63 (~9e9 rows of 1e9-magnitude scaled
  *     values in ONE group — reachable at 100 TB);
  *   - `sum(x.cast("decimal(38,0)"))` is exact but leaves the primitive
  *     fast path: every update allocates a JavaBigDecimal (measured ~2×
  *     on the pricing-summary bench queries).
  * Sum128's update/merge are pure Long arithmetic (wrapping add +
  * carry-out, fully codegen'd, primitive UnsafeRow buffer); only the
  * once-per-group final projection converts (hi, lo) to decimal(38,0).
  * A sum would need ~1.7e38 to overflow 128 bits — no practical ceiling.
  */
object NumericFunctions {
  /** 128-bit exact sum of a LongType column; returns decimal(38,0),
    * null on empty input (like `sum`). Callers must [[register]] first.
    */
  def sum128(c: Column): Column = call_function("graft_sum128", c)

  /** Register SQL-callable functions on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sum128", exprs => Sum128(exprs.head), "built-in")
}

/** Wrapping Long addition: Java two's-complement `+`, no ANSI overflow
  * check — the low/high word steps of 128-bit accumulation overflow BY
  * DESIGN and the carry logic accounts for it.
  */
case class WrappingAdd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wrapping_add"
  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + b.asInstanceOf[Long] // JVM long add wraps
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $a + $b;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WrappingAdd =
    copy(left = l, right = r)
}

/** Unsigned carry-out of `left + right` (0 or 1), the textbook
  * bit-twiddle `((a & b) | ((a | b) & ~(a + b))) >>> 63`.
  */
case class CarryOut(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_carry_out"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    ((x & y) | ((x | y) & ~(x + y))) >>> 63
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (($a & $b) | (($a | $b) & ~($a + $b))) >>> 63;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CarryOut =
    copy(left = l, right = r)
}

/** (hi, lo) two's-complement int128 → decimal(38,0). Evaluated once per
  * GROUP in the aggregate's result projection — off the per-row hot
  * path, so the BigInteger construction cost is irrelevant.
  */
case class Int128ToDecimal(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "graft_int128_to_decimal"
  private def convert(hi: Long, lo: Long): Decimal = {
    val v = (BigInt(hi) << 64) + BigInt(java.lang.Long.toUnsignedString(lo))
    Decimal(BigDecimal(v), 38, 0)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    convert(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hi, lo) => {
      val bi = ctx.freshName("bi")
      s"""
         |java.math.BigInteger $bi = java.math.BigInteger.valueOf($hi).shiftLeft(64)
         |  .add(new java.math.BigInteger(java.lang.Long.toUnsignedString($lo)));
         |${ev.value} = org.apache.spark.sql.types.Decimal.apply(
         |  new java.math.BigDecimal($bi), 38, 0);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int128ToDecimal =
    copy(left = l, right = r)
}

/** Exact 128-bit integer sum over a LongType column (see
  * [[NumericFunctions]]). Declarative aggregate with a primitive
  * (hi: Long, lo: Long, isEmpty: Boolean) buffer: update and merge are
  * wrapping adds + carry propagation — two's-complement 128-bit
  * addition, where a negative input's high word is its sign extension
  * (`x >> 63` = 0 or -1). Returns null on empty input like `sum`.
  */
case class Sum128(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sum128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val empty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, empty)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  override lazy val updateExpressions: Seq[Expression] = {
    require(child.dataType == LongType,
      s"graft_sum128 requires a BIGINT column, got ${child.dataType.sql}")
    val x = Coalesce(Seq(child, Literal(0L)))
    val newLo = WrappingAdd(lo, x)
    val carry = CarryOut(lo, x)
    val signExt = ShiftRight(x, Literal(63)) // 0 for x >= 0, -1 for x < 0
    val newHi = WrappingAdd(WrappingAdd(hi, signExt), carry)
    Seq(newHi, newLo, And(empty, IsNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = WrappingAdd(lo.left, lo.right)
    val carry = CarryOut(lo.left, lo.right)
    val newHi = WrappingAdd(WrappingAdd(hi.left, hi.right), carry)
    Seq(newHi, newLo, And(empty.left, empty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(empty, Literal(null, DecimalType(38, 0)), Int128ToDecimal(hi, lo))

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

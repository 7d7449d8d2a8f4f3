package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Morton (Z-order) code: interleave the low `bits` bits
  * of two BIGINT keys — bit i of the FIRST key lands at position 2i,
  * bit i of the SECOND at 2i+1. The space-filling-curve key behind
  * multi-dimensional data clustering (Morton 1966; the published
  * device behind Delta/Iceberg `OPTIMIZE ZORDER BY`): range-
  * partitioning by z-value co-locates rows that are close in BOTH
  * dimensions, so per-file min/max statistics prune 2-D box predicates
  * that a single-column sort can only prune along one axis.
  *
  * Each input is masked to its low `bits` bits FIRST (two's-complement
  * `&`, identical in the JVM and SQL engines — negative or oversized
  * keys wrap deterministically; callers range-normalize when curve
  * locality matters). 21 bits x 2 fills 42 of the 63 non-sign bits, so
  * the result is always a non-negative BIGINT.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two BIGINT inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  def morton(a: Long, b: Long): Long = {
    val mask = (1L << bits) - 1
    val x = a & mask
    val y = b & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("interleave", this,
      classOf[InterleaveBits].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.morton($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Column-level API: the 2-D Morton code of two BIGINT columns. */
  def apply(x: Column, y: Column, bits: Int = 21): Column =
    ColumnBridge.column(new InterleaveBits(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}

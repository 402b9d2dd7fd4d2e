package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Z-order (Morton) curve value for two dimensions — the multi-dimension
 * DATA LAYOUT primitive (Delta/Iceberg ship it as OPTIMIZE ZORDER;
 * vanilla Spark has no equivalent). Sorting/range-partitioning a 100 TB
 * table by `zorder62(a, b)` co-clusters BOTH dimensions, so parquet
 * row-group min/max stats prune scans filtered on either one — a
 * single-key sort only ever tightens its own column.
 *
 * Bit spreading uses the standard mask-shift doubling; inputs are masked
 * to their low 31 bits (callers rank/bucket wider domains first), so the
 * interleaved value stays in 62 bits — positive in any signed-64 engine,
 * making the exact value replicable in plain SQL bit arithmetic.
 */
object ZOrderRuntime extends Serializable {

  /** Spread the low 31 bits of x to even bit positions 0,2,..,60. */
  def spread31(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton-interleave the low 31 bits of a (even bits) and b (odd). */
  def zorder62(a: Long, b: Long): Long =
    spread31(a) | (spread31(b) << 1)

  /** Spread the low 21 bits of x to positions 0,3,6,..,60. */
  def spread21(v: Long): Long = {
    var x = v & 0x1FFFFFL
    x = (x | (x << 32)) & 0x1F00000000FFFFL
    x = (x | (x << 16)) & 0x1F0000FF0000FFL
    x = (x | (x << 8)) & 0x100F00F00F00F00FL
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Three-way Morton interleave of the low 21 bits of a, b, c. */
  def zorder63(a: Long, b: Long, c: Long): Long =
    spread21(a) | (spread21(b) << 1) | (spread21(c) << 2)
}

/** zorder62(a, b): long — Morton interleave of the two low-31-bit values
  * (narrower integral inputs implicitly widen). */
case class ZOrder62(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder62"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderRuntime.zorder62(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ZOrderRuntime.zorder62($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder62 =
    copy(left = newLeft, right = newRight)
}

/** zorder63(a, b, c): long — three-way Morton interleave of the low
  * 21 bits of each dimension (tenant × time × key layouts). */
case class ZOrder63(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder63"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderRuntime.zorder63(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"org.apache.spark.sql.graft.ZOrderRuntime.zorder63($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ZOrder63 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ZOrderFunctions {
  def zorder62(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ZOrder62(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def zorder63(a: Column, b: Column, c: Column): Column =
    ExpressionUtils.column(
      ZOrder63(ExpressionUtils.expression(a), ExpressionUtils.expression(b),
        ExpressionUtils.expression(c)))
}

package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
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

object ZOrderFunctions {
  def zorder62(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ZOrder62(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

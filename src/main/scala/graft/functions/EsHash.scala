package org.apache.spark.sql.graft
// In an org.apache.spark.sql subpackage on purpose: Catalyst's
// AbstractDataType and the classic Column<->Expression bridge are
// private[sql]; a custom codegen'd Expression needs both.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.EsMurmur3

/**
 * Native Catalyst expressions for the ES 5.x routing hash — codegen'd so
 * shard assignment stays inside WholeStageCodegen (no UDF/encoder hop on
 * the 100 TB hot path). The hash itself lives in [[graft.core.EsMurmur3]].
 *
 * (reference semantics: src/main/java/com/simondata/elasticfreight/index/
 * routing/ElasticsearchRoutingStrategyV5.java:115-118)
 */
object EsHashRuntime extends Serializable {
  def hashUtf8(s: UTF8String): Int = EsMurmur3.hash(s.toString)
  def shardUtf8(s: UTF8String, n: Int): Int =
    Math.floorMod(EsMurmur3.hash(s.toString), n)
}

/** es_murmur3(id): Int — the raw ES routing hash of a string id. */
case class EsMurmur3Hash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "es_murmur3"

  override protected def nullSafeEval(input: Any): Any =
    EsHashRuntime.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EsHashRuntime.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): EsMurmur3Hash =
    copy(child = newChild)
}

/** es_shard(id, numShards): Int — floorMod(es_murmur3(id), numShards). */
case class EsShard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "es_shard"

  override protected def nullSafeEval(id: Any, n: Any): Any =
    EsHashRuntime.shardUtf8(id.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (id, n) => s"org.apache.spark.sql.graft.EsHashRuntime.shardUtf8($id, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): EsShard =
    copy(left = l, right = r)
}

/** Column-level API (facade re-exported as graft.functions.EsHash). */
object EsHashFunctions {
  /** Raw ES murmur3 hash of a string column. */
  def esMurmur3(c: Column): Column =
    ExpressionUtils.column(EsMurmur3Hash(ExpressionUtils.expression(c)))

  /** Shard index ∈ [0, n) for a doc-id column. */
  def esShard(c: Column, numShards: Int): Column =
    ExpressionUtils.column(
      EsShard(ExpressionUtils.expression(c), ExpressionUtils.expression(lit(numShards))))

  /** Routing string column: deterministic per-shard routing value via a
    * branch-free array-literal lookup (numShards is small; stays codegen'd). */
  def esRouting(c: Column, numShards: Int): Column = {
    val strategy = graft.core.RoutingStrategyV5(numShards)
    val table = array((0 until numShards).map(s => lit(strategy.shardToRouting(s))): _*)
    element_at(table, esShard(c, numShards) + 1)
  }
}

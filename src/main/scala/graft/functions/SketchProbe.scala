package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/**
 * Probe expressions over SERIALIZED sketches (Spark's public
 * `org.apache.spark.util.sketch` implementations — the same bytes the
 * built-in `count_min_sketch` aggregate and `DataFrameStatFunctions
 * .bloomFilter` produce).
 *
 * The sketch bytes travel INSIDE the expression, so they ship with the
 * serialized plan to every task — the intended shape: a sketch is a few
 * KB–MB summary of a pass over the data, and probing it on the map side
 * prunes rows BEFORE the shuffle that would otherwise carry them. The
 * deserialized probe object is a `@transient lazy val`: each executor
 * deserializes once on first row, never per row.
 *
 * Both probes stay inside whole-stage codegen via `addReferenceObj` —
 * the generated code calls the probe method on the expression instance
 * directly (same technique Spark's own BloomFilterMightContain uses).
 *
 * TYPE SAFETY (SQL surface): these extend `ExpectsInputTypes` and
 * deliberately NOT `ImplicitCastInputTypes` — the analyzer's implicit
 * cast rule only fires for the latter, so a fractional/decimal key
 * fails analysis loudly (DATATYPE_MISMATCH) instead of being silently
 * truncated to long — the same lossy-cast failure mode the operator
 * API rejects in `Sketches.keyIsString`. Integral keys of any width
 * ARE accepted (byte/short/int/long — the widening is lossless and
 * handled here, matching the operator API's `probeKey`). Pinned in
 * SketchProbeSpec.
 */
case class CmsGeProbe(child: Expression, sketchBytes: Array[Byte], minCount: Long)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  // Array[Byte] equals/hashCode are reference-based, which would make two
  // structurally identical probes never semanticEquals — defeating
  // canonicalization / common-subexpression elimination. Compare contents.
  override def equals(other: Any): Boolean = other match {
    case o: CmsGeProbe => child == o.child && minCount == o.minCount &&
      java.util.Arrays.equals(sketchBytes, o.sketchBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(sketchBytes)) +
      java.lang.Long.hashCode(minCount)

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ByteType, ShortType, IntegerType, LongType, StringType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cms_ge"

  /** True iff the sketch's (over-)estimate reaches `minCount`. CMS never
    * undercounts, so `false` proves the true count is below `minCount` —
    * the one-sided guarantee the exact second pass relies on. */
  def probe(v: Long): Boolean = cms.estimateCount(java.lang.Long.valueOf(v)) >= minCount

  /** String keys probe by UTF-8 bytes — the exact representation the
    * built-in `count_min_sketch` aggregate inserts (`addBinary` of
    * `UTF8String.getBytes`), so estimates agree with the trained sketch.
    * Parity is pinned in SketchProbeSpec. */
  def probeBytes(b: Array[Byte]): Boolean = cms.estimateCount(b) >= minCount

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => probeBytes(s.getBytes)
    case n: java.lang.Number => probe(n.longValue()) // integral widening only
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsGe", this, classOf[CmsGeProbe].getName)
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev, c => s"$ref.probeBytes($c.getBytes())")
      case _ => defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CmsGeProbe =
    copy(child = newChild)
}

/** bloom_contains(key: long): membership probe against a serialized
  * [[BloomFilter]] — no false negatives, `fpp` false positives. */
case class BloomContainsProbe(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  // Content equality over the serialized filter (see CmsGeProbe note).
  override def equals(other: Any): Boolean = other match {
    case o: BloomContainsProbe => child == o.child &&
      java.util.Arrays.equals(filterBytes, o.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ByteType, ShortType, IntegerType, LongType, StringType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  def probe(v: Long): Boolean = bloom.mightContainLong(v)

  /** String keys probe by UTF-8 bytes — `BloomFilter.putString` delegates
    * to `putBinary` of the UTF-8 encoding, so `mightContainBinary` of
    * `UTF8String.getBytes` matches however the filter was populated
    * (stat.bloomFilter or putString). No-false-negatives pinned in spec. */
  def probeBytes(b: Array[Byte]): Boolean = bloom.mightContainBinary(b)

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => probeBytes(s.getBytes)
    case n: java.lang.Number => probe(n.longValue()) // integral widening only
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this,
      classOf[BloomContainsProbe].getName)
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev, c => s"$ref.probeBytes($c.getBytes())")
      case _ => defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsProbe =
    copy(child = newChild)
}

object SketchProbeFunctions {
  def cmsGe(c: Column, sketchBytes: Array[Byte], minCount: Long): Column =
    ExpressionUtils.column(
      CmsGeProbe(ExpressionUtils.expression(c), sketchBytes, minCount))
  def bloomContains(c: Column, filterBytes: Array[Byte]): Column =
    ExpressionUtils.column(
      BloomContainsProbe(ExpressionUtils.expression(c), filterBytes))
}

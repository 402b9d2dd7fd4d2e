package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH signature for cosine similarity (SimHash for
 * vectors; Charikar 2002, public literature). Bit i of the signature is
 * the sign of `vec · plane_i`, planes drawn deterministically from `seed`
 * via a splitmix64 stream — every executor regenerates identical planes,
 * nothing is shipped.
 *
 * Vectors within a small angle share signatures with high probability, so
 * equal (or near-equal) signatures form ANN candidate buckets.
 */
object VectorSketchRuntime extends Serializable {

  private final def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic N(0,1)-ish plane component via two splitmix uniforms
    * (Box-Muller is overkill for LSH; a symmetric uniform works, but use
    * the sum-of-uniforms approximation for better roundness). */
  @inline private def planeComponent(seed: Long, plane: Int, i: Int): Double = {
    val u1 = splitmix(seed ^ (plane.toLong << 32) ^ i.toLong)
    val u2 = splitmix(u1)
    ((u1 >>> 11).toDouble / (1L << 53).toDouble - 0.5) +
      ((u2 >>> 11).toDouble / (1L << 53).toDouble - 0.5)
  }

  /** Signature: bit p set iff dot(vec, plane_p) > 0. numPlanes ≤ 64. */
  def hyperplaneSig(vec: ArrayData, numPlanes: Int, seed: Long): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += vec.getFloat(i) * planeComponent(seed, p, i)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

object VectorMathRuntime extends Serializable {
  /** Centered projection Σ (x_i − μ_i)·v_i in double precision,
    * left-to-right accumulation (the PCA-score hot path; μ and v are
    * plan constants, broadcast with the serialized expression). */
  def centeredDot(x: ArrayData, mu: Array[Double],
                  dir: Array[Double]): Double = {
    val n = math.min(x.numElements(), mu.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += (x.getFloat(i).toDouble - mu(i)) * dir(i)
      i += 1
    }
    acc
  }

  /** Cosine similarity in double precision, left-to-right accumulation
    * (matches DuckDB list_cosine_similarity fold order bit-for-bit). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/**
 * cosine_sim(a, b): Double — native codegen'd cosine. The zip_with/
 * aggregate composition is semantically identical but higher-order
 * functions are CodegenFallback (interpreted, boxed lambda per element):
 * ~1000× slower per pair on the ANN hot path.
 */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMathRuntime.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.VectorMathRuntime.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** hyperplane_sig(vec: array<float>): Long LSH bucket signature. */
case class HyperplaneSig(child: Expression, numPlanes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPlanes > 0 && numPlanes <= 64)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    VectorSketchRuntime.hyperplaneSig(input.asInstanceOf[ArrayData], numPlanes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.VectorSketchRuntime.hyperplaneSig($c, $numPlanes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** centered_dot(vec: array<float>): Double — Σ (x_i − μ_i)·v_i against
  * plan-constant center/direction arrays (PCA projection / whitening
  * scores). Constants ride along as expression references, so the probe
  * runs inside whole-stage codegen with zero per-row allocation. */
case class CenteredDot(child: Expression, mu: Array[Double],
                       dir: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(mu.length == dir.length,
    s"center and direction dims differ: ${mu.length} vs ${dir.length}")
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "centered_dot"

  override protected def nullSafeEval(input: Any): Any =
    VectorMathRuntime.centeredDot(input.asInstanceOf[ArrayData], mu, dir)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("cdMu", mu, "double[]")
    val dirRef = ctx.addReferenceObj("cdDir", dir, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.VectorMathRuntime.centeredDot($c, $muRef, $dirRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CenteredDot =
    copy(child = newChild)
}

object VectorSketchFunctions {
  def hyperplaneSig(c: Column, numPlanes: Int, seed: Long): Column =
    ExpressionUtils.column(HyperplaneSig(ExpressionUtils.expression(c), numPlanes, seed))
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def centeredDot(c: Column, mu: Array[Double], dir: Array[Double]): Column =
    ExpressionUtils.column(CenteredDot(ExpressionUtils.expression(c), mu, dir))
}

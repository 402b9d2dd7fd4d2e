package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text-sketch expressions for near-duplicate detection at scale
 * (mission extensions — not in the reference; see SURVEY.md §7.4).
 *
 * Both are native codegen'd Expressions so sketching stays inside
 * WholeStageCodegen: one pass over the document computes the whole sketch,
 * no UDF/encoder hop, no intermediate shingle arrays materialized in the
 * plan (an `Array[String]` of shingles for a 10 KB doc would be ~100
 * objects/row on the 100 TB path).
 */
object TextSketchRuntime extends Serializable {

  /** FNV-1a 64-bit over a char range — cheap rolling base hash for shingles. */
  @inline private def fnv64(s: String, from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= s.charAt(i).toInt
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private final val Mix1 = 0xff51afd7ed558ccdL
  private final val Mix2 = 0xc4ceb9fe1a85ec53L

  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= Mix1
    z ^= z >>> 33; z *= Mix2
    z ^ (z >>> 33)
  }

  /**
   * MinHash signature: k minimums over character-`shingle`-gram hashes,
   * using the Kirsch-Mitzenmacher two-hash construction
   * h_j = h1 + (j+1)*h2 (one shingle hash, k cheap derivations).
   * Shorter-than-shingle documents hash as a single shingle.
   */
  def minhash(s: UTF8String, k: Int, shingle: Int): ArrayData = {
    val str = s.toString
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = str.length
    val count = if (n <= shingle) 1 else n - shingle + 1
    val len = math.min(shingle, n)
    var i = 0
    while (i < count) {
      val base = fnv64(str, i, len)
      val h1 = mix64(base)
      val h2 = mix64(base ^ 0x9e3779b97f4a7c15L) | 1L
      var j = 0
      var h = h1
      while (j < k) {
        h += h2
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /**
   * 64-bit SimHash over whitespace tokens: per-token 64-bit hash votes ±1
   * on each bit; fingerprint bit b set iff the vote is positive.
   */
  def simhash(s: UTF8String): Long = {
    val str = s.toString
    val votes = new Array[Int](64)
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(str.charAt(i))) i += 1
      if (i > start) {
        val h = mix64(fnv64(str, start, i - start))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** minhash_sig(text): Array[Long] of k minimums over char shingles. */
case class MinHashSig(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0 && shingleSize > 0)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextSketchRuntime.minhash(input.asInstanceOf[UTF8String], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextSketchRuntime.minhash($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** simhash64(text): Long fingerprint (near-dup iff small hamming distance). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextSketchRuntime.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.TextSketchRuntime.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SigAgreeRuntime extends Serializable {
  /** Count of positions where two long arrays agree. */
  def agree(a: org.apache.spark.sql.catalyst.util.ArrayData,
            b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** sig_agree(a, b): Int — positions where two minhash signatures match
  * (codegen'd; the aggregate(zip_with(..)) equivalent is CodegenFallback
  * and dominates LSH candidate scoring). */
case class SigAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeRuntime.agree(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SigAgreeRuntime.agree($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
    copy(left = l, right = r)
}

object TextSketchFunctions {
  def minhashSig(c: Column, numHashes: Int, shingleSize: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(c), numHashes, shingleSize))
  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))
  def sigAgree(a: Column, b: Column): Column =
    ExpressionUtils.column(SigAgree(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro / Jaro-Winkler string similarity as native codegen'd expressions —
 * the standard record-linkage comparator (Winkler 1990, census
 * deduplication) for short identifier-like strings (names, titles, hosts),
 * complementing the banded Levenshtein kernel `Dedup.verifyEditDistance`
 * uses for whole-text candidate verification: Levenshtein charges block
 * moves heavily, Jaro-Winkler is transposition-tolerant and
 * prefix-weighted, which is what name/title matching wants.
 *
 * Semantics pinned to the textbook algorithm over UTF-8 BYTES (verified
 * against an independent engine's implementation case by case):
 * match window = max(len)/2 − 1 clamped at 0; either side empty → 0.0
 * (both-empty included); transposition count = mismatched matched-pair
 * positions INTEGER-halved; Winkler prefix bonus (ℓ ≤ 4 bytes, p = 0.1)
 * applied only when jaro > 0.7 (strict). Byte-level matching means
 * multi-byte code points must agree byte-for-byte — for the short
 * ASCII-dominant keys this comparator targets, identical to
 * code-point matching.
 *
 * Native expressions (not UDFs) keep per-pair scoring inside
 * WholeStageCodegen on candidate-verification hot paths: O(la·lb) worst
 * case per pair bounded by the match window, zero boxing, no
 * encoder hop.
 */
object JaroWinklerRuntime extends Serializable {

  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroBytes(a.getBytes, b.getBytes)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val ab = a.getBytes
    val bb = b.getBytes
    val j = jaroBytes(ab, bb)
    if (j > 0.7) {
      val cap = math.min(4, math.min(ab.length, bb.length))
      var l = 0
      while (l < cap && ab(l) == bb(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  private def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb - 1, i + w)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && b(j) == a(i)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched matched-pair positions, INTEGER-halved (the pinned
    // convention: 3 cycled bytes count as 1 transposition, not 1.5)
    var k = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2
    val md = m.toDouble
    (md / la + md / lb + (md - t) / md) / 3.0
  }
}

/** jaro_sim(a, b): Double — byte-level Jaro similarity. */
case class JaroSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerRuntime.jaro(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinklerRuntime.jaro($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
    copy(left = l, right = r)
}

/** jaro_winkler_sim(a, b): Double — byte-level Jaro-Winkler similarity
  * (prefix ℓ ≤ 4, p = 0.1, boost threshold 0.7 strict). */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerRuntime.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinklerRuntime.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

object StringSimilarityFunctions {
  def jaroSim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def jaroWinklerSim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

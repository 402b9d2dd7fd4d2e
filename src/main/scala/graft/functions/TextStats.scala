package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text statistics: character/token/alpha/punct counts plus hit
 * counts against N stopword sets, one traversal of the document. Replaces
 * a chain of 3 regexp passes + per-language HOF filters (each interpreted
 * per token) on the quality/langid hot path.
 */
object TextStatsRuntime extends Serializable {

  private val Punct = ".,;:!?'\"()[]-".toSet

  /** Interned stopword tables keyed by their spec string (executors build
    * each table once per JVM, not per row). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[Set[String]]]()

  private def sets(spec: String): Array[Set[String]] =
    cache.computeIfAbsent(spec, s => s.split(';').map(_.split(',').toSet))

  /** Returns [chars, tokens, alpha, punct, hits_0, ..., hits_{n-1}]. */
  def stats(s: UTF8String, setsSpec: String): GenericArrayData = {
    val str = s.toString
    val stopSets = sets(setsSpec)
    val out = new Array[Long](4 + stopSets.length)
    out(0) = str.length
    var i = 0
    val n = str.length
    val tok = new java.lang.StringBuilder(16)
    def closeToken(): Unit = if (tok.length > 0) {
      out(1) += 1
      val t = tok.toString.toLowerCase
      var j = 0
      while (j < stopSets.length) {
        if (stopSets(j).contains(t)) out(4 + j) += 1
        j += 1
      }
      tok.setLength(0)
    }
    while (i < n) {
      val c = str.charAt(i)
      if (Character.isWhitespace(c)) closeToken()
      else {
        tok.append(c)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) out(2) += 1
        else if (Punct.contains(c)) out(3) += 1
      }
      i += 1
    }
    closeToken()
    new GenericArrayData(out)
  }
}

/** text_stats(text): array<long> = [chars, tokens, alpha, punct, hits...]. */
case class TextStats(child: Expression, stopwordSets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  private val spec: String = stopwordSets.map(_.mkString(",")).mkString(";")
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsRuntime.stats(input.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("setsSpec", spec, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextStatsRuntime.stats($c, $specRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStatsFunctions {
  def textStats(c: Column, stopwordSets: Seq[Seq[String]]): Column =
    ExpressionUtils.column(TextStats(ExpressionUtils.expression(c), stopwordSets))
}

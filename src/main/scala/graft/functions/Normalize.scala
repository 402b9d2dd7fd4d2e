package org.apache.spark.sql.graft
// Same private[sql]-bridging package as EsHash.scala (see note there).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode text normalization for corpus prep: NFC-compose, strip C0/DEL
 * control characters (keeping \t \n \r as whitespace), collapse
 * whitespace runs to single spaces, trim. The canonical first stage of a
 * web-scrape cleanup — composed-vs-decomposed accent forms and stray
 * control bytes otherwise defeat exact/fuzzy dedup alike (the same
 * visible text hashes differently).
 *
 * One pass over the (NFC'd) string; the whole chain is equivalent to
 *   trim(regexp_replace(regexp_replace(nfc(text),
 *        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', ''), '\s+', ' '))
 * which is exactly the DuckDB/Trino replica (RE2 `\s` and Java `\s`
 * agree on the post-strip alphabet: space \t \n \r). Non-ASCII Unicode
 * whitespace (NBSP etc.) is deliberately left alone — neither engine's
 * `\s` matches it, and NBSP is content in some corpora.
 */
object NormalizeRuntime extends Serializable {

  def nfcClean(s: UTF8String): UTF8String = {
    val str = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val isControl = (c < ' ' && c != '\t' && c != '\n' && c != '\r') || c == '\u007f'
      if (!isControl) {
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
          if (out.length > 0) pendingSpace = true // leading ws drops (trim)
        } else {
          if (pendingSpace) { out.append(' '); pendingSpace = false }
          out.append(c)
        }
      }
      i += 1
    }
    UTF8String.fromString(out.toString) // trailing pendingSpace drops (trim)
  }
}

/** nfc_clean(text): NFC + control-strip + whitespace-collapse + trim. */
case class NfcClean(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_clean"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeRuntime.nfcClean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NormalizeRuntime.nfcClean($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcClean =
    copy(child = newChild)
}

object NormalizeFunctions {
  def nfcClean(c: Column): Column =
    ExpressionUtils.column(NfcClean(ExpressionUtils.expression(c)))
}

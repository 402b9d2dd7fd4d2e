package org.apache.spark.sql.graft
// sql subpackage: the Column<->Expression bridge and catalyst nodes are
// private[sql]/internal; see EsHash.scala's header note.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * URL canonicalization as a CATALYST expression tree — the single
 * definition behind both `TextAnalysis.canonicalUrl` (Column surface)
 * and the `canonical_url` SQL registration (a FunctionBuilder must
 * return a real expression tree; a composed Column's node wrapper is
 * Unevaluable inside the registry path). Rule chain documented at
 * [[graft.operators.TextAnalysis.canonicalUrl]].
 */
object UrlFunctions {

  private val SchemeAuthority = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$"

  private def lit(s: String): Expression = Literal(s)
  private def rr(e: Expression, pattern: String, rep: String): Expression =
    RegExpReplace(e, lit(pattern), lit(rep))
  private def rex(e: Expression, pattern: String, group: Int): Expression =
    RegExpExtract(e, lit(pattern), Literal(group))

  def canonicalUrl(url: Expression): Expression = {
    val trimmed = rr(StringTrim(url), "#.*$", "")
    val head = Lower(rex(trimmed, SchemeAuthority, 1))
    val rest = rex(trimmed, SchemeAuthority, 2)
    // no scheme://authority match (relative/opaque): pass through
    val lowered = CaseWhen(
      Seq((EqualTo(head, lit("")), trimmed)),
      Some(Concat(Seq(head, rest))))
    val noWww = rr(lowered, "^(https?://)www\\.", "$1")
    // captured-group form, not lookahead — RE2 (the oracle's engine) has
    // no lookahead assertions
    val noPort = rr(rr(noWww,
      "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    // tracking params: '&'-prefixed ones drop outright, then a LEADING
    // '?tracker=v&rest' hands its '?' to the next param by consuming the
    // following '&'. Order matters — doing '&' first means at most ONE
    // leading tracker remains for the '?' pass, so a single pass of each
    // suffices. No blanket "first '&' becomes '?'" repair: '&' is a legal
    // PATH character ("/x&y"), and rewriting it would falsely merge
    // distinct URLs.
    val noAmpTrack = rr(noPort, "&(?:utm_[^&=#]*|gclid|fbclid)=[^&#]*", "")
    val noTrack = rr(noAmpTrack, "\\?(?:utm_[^&=#]*|gclid|fbclid)=[^&#]*&?", "?")
    rr(rr(noTrack, "[?&]+$", ""), "/+$", "")
  }

  def canonicalUrl(url: Column): Column =
    ExpressionUtils.column(canonicalUrl(ExpressionUtils.expression(url)))
}

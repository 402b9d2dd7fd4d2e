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

  def canonicalTokens(c: Column): Column =
    ExpressionUtils.column(CanonicalTokens(ExpressionUtils.expression(c)))

  def wordNgrams(c: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(c), n))

  def wordSkipgrams(c: Column, window: Int): Column =
    ExpressionUtils.column(WordSkipgrams(ExpressionUtils.expression(c), window))

  def repetitionStats(c: Column, n: Int): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c), n))

  def charEntropy(c: Column): Column =
    ExpressionUtils.column(CharEntropy(ExpressionUtils.expression(c)))
}

/**
 * THE shared lowercase `\\s+` tokenizer of this file: `lower()` first
 * (UTF8String semantics, locale-independent), then the ASCII-space trim
 * Spark's `trim()` applies, then a `split("\\s+")`-equivalent walk
 * INCLUDING Java split's leading-empty-token quirk. Its parity with the
 * SQL replica `regexp_split_to_array(trim(lower(text)), '\\s+')` is
 * load-bearing for every oracle built on word tokens — which is exactly
 * why there is one copy.
 */
object LowerTokenizer extends Serializable {

  // Java regex \s — the separator class of split("\\s+")
  def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Empty buffer for blank/whitespace-only input. */
  def tokens(s: UTF8String): scala.collection.mutable.ArrayBuffer[String] = {
    val raw = s.toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](32)
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    if (b >= e) return toks
    if (isSep(raw.charAt(b))) toks += "" // split's leading-empty quirk
    val tok = new java.lang.StringBuilder(16)
    var i = b
    while (i < e) {
      val c = raw.charAt(i)
      if (isSep(c)) {
        if (tok.length > 0) { toks += tok.toString; tok.setLength(0) }
      } else tok.append(c)
      i += 1
    }
    if (tok.length > 0) toks += tok.toString
    toks
  }
}

/**
 * Single-pass word n-gram generation. Exactly equivalent to the HOF
 * composition `transform(sequence(...), i -> concat_ws(" ",
 * element_at(tokens(lower(text)), i+j)...))` — including Java split's
 * leading-empty-token quirk after a non-space whitespace lead — but that
 * transform is CodegenFallback with an interpreted per-GRAM lambda
 * (measured 15 s for the 5-gram decontamination query at sf0.1; this
 * expression brings the gram stage back to explode-speed).
 */
object WordNgramsRuntime extends Serializable {

  private val Empty = new GenericArrayData(new Array[Any](0))

  def grams(s: UTF8String, n: Int): GenericArrayData = {
    val toks = LowerTokenizer.tokens(s)
    if (toks.length < n) return Empty
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var g = 0
    while (g <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** word_ngrams(text, n): array<string> of space-joined lowercase word
  * n-grams (empty when the doc has fewer than n tokens). */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 2, "use a tokenizer for unigrams")
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramsRuntime.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordNgramsRuntime.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/**
 * Single-pass skip-gram (center, context) pair generation — the
 * word2vec/fastText training-pair fan-out (Mikolov et al. 2013):
 * every position pairs with its neighbors at offsets 1..window in BOTH
 * directions, emitted as space-joined "center context" strings.
 * Tokenization is [[LowerTokenizer]] exactly (lowercase, ASCII-space
 * trim, `\s+` split with Java split's leading-empty quirk), so the
 * pairs agree with a positional-self-join SQL replica. One pass per
 * row, no window functions in the plan — the lead()-per-offset
 * formulation sorts every document's tokens `window` times.
 */
object WordSkipgramsRuntime extends Serializable {

  private val Empty = new GenericArrayData(new Array[Any](0))

  def pairs(s: UTF8String, window: Int): GenericArrayData = {
    val toks = LowerTokenizer.tokens(s)
    val n = toks.length
    if (n < 2) return Empty
    val buf = new scala.collection.mutable.ArrayBuffer[Any](
      math.min(2 * window * n, 2 * n * (n - 1)))
    val sb = new java.lang.StringBuilder(32)
    var p = 0
    while (p < n) {
      var i = 1
      while (i <= window && p + i < n) {
        sb.setLength(0)
        sb.append(toks(p)).append(' ').append(toks(p + i))
        buf += UTF8String.fromString(sb.toString)
        sb.setLength(0)
        sb.append(toks(p + i)).append(' ').append(toks(p))
        buf += UTF8String.fromString(sb.toString)
        i += 1
      }
      p += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** word_skipgrams(text, window): array<string> of space-joined
  * lowercase (center, context) pairs for offsets ±1..±window (empty
  * below two tokens). */
case class WordSkipgrams(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, "window must be >= 1")
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_skipgrams"

  override protected def nullSafeEval(input: Any): Any =
    WordSkipgramsRuntime.pairs(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordSkipgramsRuntime.pairs($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): WordSkipgrams =
    copy(child = newChild)
}

/**
 * Single-pass word n-gram repetition statistics — the Gopher-style
 * "repetitious document" quality signals (Rae et al. 2021 §A1.1: excess
 * duplicate n-grams mark low-quality boilerplate/spam): per document, the
 * occurrence count of its MOST FREQUENT word n-gram and the number of
 * n-gram occurrences that are duplicates. Tokenization is identical to
 * [[WordNgramsRuntime]] (lowercase, ASCII-space trim, `\s+` split with
 * Java split's leading-empty quirk), so the counts agree with an
 * explode-the-grams SQL replica. One hash map per row, no shuffle, no
 * gram materialization in the plan — the explode/groupBy formulation of
 * the same signal shuffles every gram of the corpus.
 */
object RepetitionStatsRuntime extends Serializable {

  /** Returns [ntok, total_grams, max_count, dup_occurrences]. */
  def stats(s: UTF8String, n: Int): GenericArrayData = {
    val out = new Array[Long](4)
    val toks = LowerTokenizer.tokens(s)
    out(0) = toks.length
    if (toks.length < n) return new GenericArrayData(out)
    val total = toks.length - n + 1
    out(1) = total
    val counts = new java.util.HashMap[String, Array[Int]](total * 2)
    val sb = new java.lang.StringBuilder
    var g = 0
    while (g < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      val c = counts.computeIfAbsent(sb.toString, _ => new Array[Int](1))
      c(0) += 1
      g += 1
    }
    var maxC = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxC) maxC = c
      if (c > 1) dup += c
    }
    out(2) = maxC
    out(3) = dup
    new GenericArrayData(out)
  }
}

/**
 * Character-level Shannon entropy (bits per character, code-point
 * alphabet) — the cheap gibberish/binary-spill detector of a corpus
 * quality pipeline: natural text sits ~3.5-4.5 bits, base64/hex blobs
 * and key-mash spike toward log2(alphabet), single-char floods → 0.
 * One pass + one bounded map per row; entropy terms are summed in
 * code-point order so the result is deterministic (last-ulp summation
 * differences vs an unordered SQL replica are absorbed by rounding at
 * the call site — round to ≤6 dp when comparing engines).
 */
object CharEntropyRuntime extends Serializable {
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    // hash map while counting (no per-insert tree rebalancing on the
    // corpus-scale hot path); one sort of the DISTINCT code points keeps
    // the summation order deterministic
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.computeIfAbsent(cp, _ => new Array[Long](1))(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    val cps = new Array[Int](counts.size())
    val it = counts.keySet().iterator()
    var k = 0
    while (it.hasNext) { cps(k) = it.next(); k += 1 }
    java.util.Arrays.sort(cps)
    var h = 0.0
    val nd = n.toDouble
    var j = 0
    while (j < cps.length) {
      val p = counts.get(cps(j))(0) / nd
      h -= p * (math.log(p) / math.log(2.0))
      j += 1
    }
    h
  }
}

/** char_entropy(text): double — Shannon entropy over code points. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyRuntime.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharEntropyRuntime.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** repetition_stats(text, n): array<long> =
  * [ntok, total_grams, max_gram_count, dup_gram_occurrences]. */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 2, "repetition signals need n >= 2")
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsRuntime.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RepetitionStatsRuntime.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/**
 * One-pass canonicalization for document fingerprints: space-trim,
 * whitespace-tokenize, lowercase, dedupe, sort, re-join with ' '. Exactly
 * equivalent to `concat_ws(" ", array_sort(array_distinct(transform(
 * split(trim(text), "\\s+"), lower))))` — including Java split's
 * leading-empty-token quirk — but `transform` is CodegenFallback (an
 * interpreted lambda per token: measurably 10-30× slower at corpus
 * scale), while this is a single compiled traversal.
 */
object CanonicalTokensRuntime extends Serializable {

  // Java regex \s — the separator class of split("\\s+")
  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def canon(s: UTF8String): UTF8String = {
    val raw = s.toString
    // Spark trim() strips ASCII spaces only
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    if (b >= e) return UTF8String.EMPTY_UTF8
    // UTF8String ordering + lowercase = array_sort/lower parity
    val set = new java.util.TreeSet[UTF8String]()
    if (isSep(raw.charAt(b))) set.add(UTF8String.EMPTY_UTF8) // split quirk
    val tok = new java.lang.StringBuilder(16)
    var i = b
    while (i < e) {
      val c = raw.charAt(i)
      if (isSep(c)) {
        if (tok.length > 0) {
          set.add(UTF8String.fromString(tok.toString).toLowerCase)
          tok.setLength(0)
        }
      } else tok.append(c)
      i += 1
    }
    if (tok.length > 0) set.add(UTF8String.fromString(tok.toString).toLowerCase)
    val it = set.iterator()
    val sb = new java.lang.StringBuilder
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(' ')
      sb.append(it.next().toString)
      first = false
    }
    UTF8String.fromString(sb.toString)
  }
}

/** canonical_tokens(text): string — sorted distinct lowercased tokens. */
case class CanonicalTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_tokens"

  override protected def nullSafeEval(input: Any): Any =
    CanonicalTokensRuntime.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CanonicalTokensRuntime.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalTokens =
    copy(child = newChild)
}

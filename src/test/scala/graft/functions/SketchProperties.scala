package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{TextSketchRuntime, VectorMathRuntime, VectorSketchRuntime}
import org.apache.spark.unsafe.types.UTF8String

/** Statistical/algebraic properties of the sketch runtimes (pure JVM — no
  * SparkSession). Run by sbt's native ScalaCheck integration. */
object SketchProperties extends Properties("sketches") {

  private val word = Gen.oneOf("spark", "query", "shard", "index", "batch",
    "merge", "scan", "join", "sort", "hash", "table", "row", "column",
    "stream", "window", "filter")
  private val doc = Gen.listOfN(40, word).map(_.mkString(" "))

  private def shingles(s: String, n: Int): Set[String] =
    if (s.length <= n) Set(s) else s.sliding(n).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private def minhashEst(a: String, b: String, k: Int): Double = {
    val sa = TextSketchRuntime.minhash(UTF8String.fromString(a), k, 5)
    val sb = TextSketchRuntime.minhash(UTF8String.fromString(b), k, 5)
    (0 until k).count(i => sa.getLong(i) == sb.getLong(i)).toDouble / k
  }

  property("minhash estimate tracks true shingle jaccard (±5σ)") =
    forAll(doc, doc) { (a, b) =>
      val k = 256
      val truth = jaccard(shingles(a, 5), shingles(b, 5))
      val est = minhashEst(a, b, k)
      val sigma = math.sqrt(math.max(truth * (1 - truth), 0.01) / k)
      math.abs(est - truth) <= 5 * sigma + 0.02
    }

  property("minhash of identical strings is identical") = forAll(doc) { d =>
    minhashEst(d, d, 64) == 1.0
  }

  property("simhash: identical input → identical fingerprint; disjoint vocab → distant") =
    forAll(Gen.listOfN(20, word), Gen.listOfN(20, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa"))) {
      (w1, w2) =>
        val a = w1.mkString(" ")
        val c = w2.mkString(" ")
        val fa = TextSketchRuntime.simhash(UTF8String.fromString(a))
        val fa2 = TextSketchRuntime.simhash(UTF8String.fromString(a))
        val fc = TextSketchRuntime.simhash(UTF8String.fromString(c))
        val cross = java.lang.Long.bitCount(fa ^ fc)
        Prop(fa == fa2) :| "deterministic" &&
          Prop(w1.toSet == w2.toSet || cross > 4) :| s"cross-distance $cross"
    }

  private val vec = Gen.listOfN(32, Gen.chooseNum(-1.0f, 1.0f))
    .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  private def arr(v: List[Float]) = new GenericArrayData(v.toArray)

  property("hyperplane sig is scale-invariant and flips under negation") =
    forAll(vec, Gen.chooseNum(0.1f, 10f)) { (v, c) =>
      val planes = 16
      val s1 = VectorSketchRuntime.hyperplaneSig(arr(v), planes, 42)
      val s2 = VectorSketchRuntime.hyperplaneSig(arr(v.map(_ * c)), planes, 42)
      val s3 = VectorSketchRuntime.hyperplaneSig(arr(v.map(-_)), planes, 42)
      // negation flips every bit whose dot product is strictly nonzero;
      // allow ≤2 zero-dot ties (measure-zero for float vectors)
      Prop(s1 == s2) :| "scale invariance" &&
        Prop(java.lang.Long.bitCount(s1 ^ s3) >= planes - 2) :| "negation flips"
    }

  property("cosine: cos(v,v)=1, symmetric, |cos|<=1") = forAll(vec, vec) { (a, b) =>
    val ca = VectorMathRuntime.cosine(arr(a), arr(a))
    val ab = VectorMathRuntime.cosine(arr(a), arr(b))
    val ba = VectorMathRuntime.cosine(arr(b), arr(a))
    Prop(math.abs(ca - 1.0) < 1e-9) :| "self" &&
      Prop(math.abs(ab - ba) < 1e-12) :| "symmetry" &&
      Prop(ab.abs <= 1.0 + 1e-9) :| "bounded"
  }

  property("es murmur3 shard is stable and in range across shard counts") =
    forAll(Gen.identifier, Gen.chooseNum(1, 1024)) { (id, n) =>
      val s = graft.core.EsMurmur3.shard(id, n)
      s >= 0 && s < n && s == graft.core.EsMurmur3.shard(id, n)
    }

  // canonical_tokens: pure-JVM reference model of the HOF composition
  // concat_ws(" ", array_sort(array_distinct(transform(split(trim(s),
  // "\\s+"), lower)))) — arbitrary whitespace/case/duplication
  private val wsChar = Gen.oneOf(' ', ' ', ' ', '\t', '\n', '\r', '\f')
  private val messyDoc = Gen.listOfN(30, Gen.oneOf(
    word, word.map(_.toUpperCase), Gen.const(""),
    Gen.oneOf("Straße", "MÜNCHEN", "a|b", "x.y", "123")))
    .flatMap(ws => Gen.listOfN(ws.length + 1, wsChar)
      .map(seps => ws.zip(seps).map { case (w, c) => s"$w$c" }.mkString))

  private def modelCanonical(s: String): String = {
    val trimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    if (trimmed.isEmpty) ""
    else {
      val toks = trimmed.split("\\s+").toSeq
      val lowered = toks.map(t => UTF8String.fromString(t).toLowerCase)
      lowered.distinct.sorted(Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[UTF8String]())).map(_.toString)
        .mkString(" ")
    }
  }

  property("canonical_tokens equals the split/lower/distinct/sort model") =
    forAll(messyDoc) { s =>
      org.apache.spark.sql.graft.CanonicalTokensRuntime
        .canon(UTF8String.fromString(s)).toString == modelCanonical(s)
    }

  property("canonical_tokens is whitespace- and order-insensitive") =
    forAll(Gen.listOfN(10, word)) { ws =>
      val canon = (s: String) => org.apache.spark.sql.graft
        .CanonicalTokensRuntime.canon(UTF8String.fromString(s)).toString
      canon(ws.mkString(" ")) == canon(scala.util.Random.shuffle(ws).mkString("\t")) &&
        canon(ws.mkString(" ")) == canon(("  " + ws.reverse.mkString("\n") + "  "))
    }

  // LowerTokenizer underlies word_ngrams AND repetition_stats; its parity
  // with Java's split("\\s+") on lowercased, space-trimmed input (the SQL
  // oracles' regexp_split_to_array contract) is load-bearing — lock it
  // against the real thing, weird whitespace included.
  property("LowerTokenizer equals lower→space-trim→Java split(\\s+)") =
    forAll(messyDoc) { s =>
      val lowered = UTF8String.fromString(s).toLowerCase.toString
      val trimmed = lowered.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val model: Seq[String] =
        if (trimmed.isEmpty) Seq.empty else trimmed.split("\\s+").toSeq
      org.apache.spark.sql.graft.LowerTokenizer
        .tokens(UTF8String.fromString(s)).toSeq == model
    }
}

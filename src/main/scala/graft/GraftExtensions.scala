package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.{BloomContainsProbe, CanonicalTokens, CharEntropy, CmsGeProbe, CosineSim, EsMurmur3Hash, EsShard, HyperplaneSig, JaroSim, JaroWinklerSim, MinHashSig, NfcClean, RepetitionStats, SigAgree, SimHash64, WordNgrams, WordSkipgrams, ZOrder62, ZOrder63}

/**
 * SparkSessionExtensions hook exposing the engine's native expressions to
 * SQL. Enable with:
 * {{{
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions()) // or
 *     .config("spark.sql.extensions", "graft.GraftExtensions")
 * }}}
 * then `SELECT es_shard(id, 5), minhash_sig(text, 64, 5) FROM ...`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def binLit(e: Expression, what: String): Array[Byte] = e match {
    case Literal(v: Array[Byte], _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a binary literal (the serialized sketch), got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String,
                       usage: String, builder: FunctionBuilder): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
      builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "es_murmur3",
      "es_murmur3(str) - Elasticsearch 5.x routing hash (murmur3 over UTF-16LE, seed 0)",
      { case Seq(child) => EsMurmur3Hash(child) })

    register(ext, "es_shard",
      "es_shard(str, numShards) - ES routing shard: floorMod(es_murmur3(str), numShards)",
      { case Seq(child, n) => EsShard(child, n) })

    register(ext, "minhash_sig",
      "minhash_sig(text, numHashes, shingleSize) - MinHash signature over char shingles",
      { case Seq(text, k, sh) =>
        MinHashSig(text, intLit(k, "numHashes"), intLit(sh, "shingleSize")) })

    register(ext, "simhash64",
      "simhash64(text) - 64-bit SimHash over whitespace tokens",
      { case Seq(text) => SimHash64(text) })

    register(ext, "hyperplane_sig",
      "hyperplane_sig(vec, numPlanes, seed) - random-hyperplane LSH signature of array<float>",
      { case Seq(vec, p, s) =>
        HyperplaneSig(vec, intLit(p, "numPlanes"), intLit(s, "seed").toLong) })

    register(ext, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two array<float/double> vectors",
      { case Seq(a, b) => CosineSim(a, b) })

    register(ext, "sig_agree",
      "sig_agree(a, b) - number of agreeing positions of two sketch signatures",
      { case Seq(a, b) => SigAgree(a, b) })

    register(ext, "canonical_tokens",
      "canonical_tokens(text) - sorted distinct lowercased tokens, space-joined",
      { case Seq(text) => CanonicalTokens(text) })

    register(ext, "word_ngrams",
      "word_ngrams(text, n) - lowercase word n-grams, space-joined",
      { case Seq(text, n) => WordNgrams(text, intLit(n, "n")) })

    register(ext, "word_skipgrams",
      "word_skipgrams(text, window) - lowercase skip-gram 'center context' pairs for offsets ±1..±window",
      { case Seq(text, w) => WordSkipgrams(text, intLit(w, "window")) })

    register(ext, "repetition_stats",
      "repetition_stats(text, n) - [ntok, total_grams, max_gram_count, dup_gram_occurrences]",
      { case Seq(text, n) => RepetitionStats(text, intLit(n, "n")) })

    register(ext, "char_entropy",
      "char_entropy(text) - Shannon entropy over code points, bits/char",
      { case Seq(text) => CharEntropy(text) })

    register(ext, "nfc_clean",
      "nfc_clean(text) - NFC + control-strip + whitespace-collapse + trim",
      { case Seq(text) => NfcClean(text) })

    register(ext, "zorder62",
      "zorder62(a, b) - Morton interleave of two low-31-bit values (data layout)",
      { case Seq(a, b) => ZOrder62(a, b) })

    register(ext, "zorder63",
      "zorder63(a, b, c) - three-way Morton interleave, 21 bits per dimension",
      { case Seq(a, b, c) => ZOrder63(a, b, c) })

    register(ext, "cms_ge",
      "cms_ge(key, sketchBytes, minCount) - count-min-sketch over-estimate of key (bigint or string) >= minCount (one-sided heavy-key gate; CMS never undercounts)",
      { case Seq(child, bytes, min) =>
        CmsGeProbe(child, binLit(bytes, "sketchBytes"), longLit(min, "minCount")) })

    register(ext, "bloom_contains",
      "bloom_contains(key, filterBytes) - Bloom-filter membership probe of key (bigint or string; no false negatives)",
      { case Seq(child, bytes) =>
        BloomContainsProbe(child, binLit(bytes, "filterBytes")) })

    register(ext, "jaro_sim",
      "jaro_sim(a, b) - byte-level Jaro similarity (record-linkage comparator)",
      { case Seq(a, b) => JaroSim(a, b) })

    register(ext, "jaro_winkler_sim",
      "jaro_winkler_sim(a, b) - byte-level Jaro-Winkler similarity (prefix<=4, p=0.1, boost>0.7)",
      { case Seq(a, b) => JaroWinklerSim(a, b) })

    // a composed rewrite chain, not a single native expression: the
    // builder and the Column facade share ONE Catalyst tree definition
    register(ext, "canonical_url",
      "canonical_url(url) - crawl-dedup URL key: fragment/case/www/default-port/tracking-param/trailing-slash normalization",
      { case Seq(url) => org.apache.spark.sql.graft.UrlFunctions.canonicalUrl(url) })
  }
}

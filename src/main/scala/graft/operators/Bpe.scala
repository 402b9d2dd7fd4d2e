package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary training + encoding (Sennrich/Haddow/
 * Birch 2016, public algorithm; mission extension, SURVEY.md §7.4 —
 * upgrades token COUNTING from the regex estimate in
 * [[TextAnalysis.subwordCount]] to a vocabulary actually learned from
 * the corpus, the way training pipelines size token budgets).
 *
 * Scale shape — the standard industrial decomposition (sentencepiece
 * does the same): BPE training only needs the WORD-FREQUENCY dictionary,
 * not the corpus, so the single distributed pass is one
 * explode+groupBy over 8-byte-ish word tokens (map-side combined,
 * capped at `maxWords` rows collected); the merge loop then runs
 * driver-side over that bounded table — numMerges iterations of
 * in-memory pair counting, zero further cluster work. Encoding is a
 * broadcast-vocab `mapPartitions` pass (merge-rank map, per-word
 * lowest-rank-first application — the canonical BPE encoder).
 *
 * Determinism: merge ties break by (count desc, pair lexicographic asc),
 * and the word table orders by (freq desc, word asc) before the cap, so
 * the learned vocabulary is a pure function of the corpus content.
 */
object Bpe {

  /** Ordered merge list — rank = position. */
  final case class Vocab(merges: Vector[(String, String)]) extends Serializable {
    /** (pair → rank), for the encoder's lowest-rank-first loop. */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Encode one word: start at character symbols, repeatedly merge the
      * adjacent pair with the LOWEST learned rank until none applies. */
    def encodeWord(word: String): Vector[String] = {
      var syms = word.map(_.toString).toVector
      var done = syms.length <= 1
      while (!done) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) done = true
        else {
          syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
            syms.drop(bestAt + 2)
          if (syms.length <= 1) done = true
        }
      }
      syms
    }
  }

  /**
   * Learn `numMerges` merges from the corpus. ONE distributed pass
   * (word-frequency dictionary, capped at the `maxWords` most frequent
   * words — the long tail contributes ~nothing to pair statistics), then
   * the classic driver-side merge loop. Stops early when no pair repeats.
   *
   * The merge loop keeps pair counts INCREMENTALLY (the subword-nmt
   * fast path): after merging pair p, only the words that actually
   * contain p adjacently — found through a pair → word-index inverted
   * index — have their old pair contributions subtracted and new ones
   * added, and best-pair selection is a lazy-deletion max-heap, so a
   * merge step costs O(words containing p) + O(log pairs), not O(dict).
   * The bookkeeping is exact (full old word subtracted, full new word
   * added), so the learned merge sequence is IDENTICAL to a per-step
   * recount ([[trainRecount]], kept as the parity reference). This is
   * what makes 32k-merge vocabularies tractable driver-side.
   */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000): Vocab = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val wordFreq = wordFrequencies(df, textCol, maxWords)
    val words: Array[Array[String]] =
      wordFreq.map { case (w, _) => w.map(_.toString).toArray }
    val freqs: Array[Long] = wordFreq.map(_._2)

    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    // pair → indices of words where it has occurred; entries go stale
    // when a word mutates (cheap) and are re-checked against the actual
    // word at merge time rather than eagerly pruned
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.BitSet]
    // best-pair selection is a LAZY-DELETION max-heap, not a map scan
    // (the scan was O(distinct pairs) per merge and dominated large
    // merge counts): every count update pushes a fresh (count, pair)
    // entry; stale entries — whose count no longer matches — are
    // discarded at poll time. Max = highest count, then pair ASC.
    val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
                    y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = y._2.compareTo(x._2)
            if (a != 0) a else y._3.compareTo(x._3)
          }
        }
      }
    val heap =
      scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    var trackHeap = false // init builds counts first, then seeds once
    def bump(idx: Int, syms: Array[String], sign: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(idx)
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        if (trackHeap && c > 0L) heap.enqueue((c, p._1, p._2))
        if (sign > 0)
          where.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty)
            .add(idx)
        i += 1
      }
    }
    words.indices.foreach(i => bump(i, words(i), 1L))
    counts.foreach { case (p, n) => heap.enqueue((n, p._1, p._2)) }
    trackHeap = true

    val merges = Vector.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      // a pair seen once merges nothing worth keeping — also the natural
      // termination once every frequent word is a single symbol
      var best: (String, String) = null
      while (best == null && !exhausted) {
        if (heap.isEmpty) exhausted = true
        else {
          val (n, a, b) = heap.dequeue()
          // current (not stale) AND eligible; a discarded count-1 entry
          // re-enqueues itself if its count ever rises again
          if (n >= 2L && counts.getOrElse((a, b), 0L) == n) best = (a, b)
        }
      }
      if (best != null) {
        merges += best
        for (idx <- where.getOrElse(best,
          scala.collection.mutable.BitSet.empty)) {
          val syms = words(idx)
          var contains = false
          var i = 0
          while (i < syms.length - 1 && !contains) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) contains = true
            i += 1
          }
          if (contains) { // stale index entries skip here
            bump(idx, syms, -1L)
            val out = Array.newBuilder[String]
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
                out += (syms(i) + syms(i + 1)); i += 2
              } else { out += syms(i); i += 1 }
            }
            words(idx) = out.result()
            bump(idx, words(idx), 1L)
          }
        }
        where.remove(best)
        learned += 1
      }
    }
    Vocab(merges.result())
  }

  /** The shared distributed half: word-frequency dictionary ordered by
    * (freq desc, word asc), capped at `maxWords`. */
  private def wordFrequencies(df: DataFrame, textCol: String,
                              maxWords: Int): Array[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w")).limit(maxWords)
      .as[(String, Long)].collect()
  }

  /** Per-step full-recount reference implementation (the pre-r7 body).
    * Kept ONLY as the parity oracle for the incremental [[train]] —
    * O(numMerges × dict); do not use on large merge counts. */
  private[operators] def trainRecount(df: DataFrame, textCol: String,
                                      numMerges: Int,
                                      maxWords: Int = 100000): Vocab = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val wordFreq = wordFrequencies(df, textCol, maxWords)
    var words: Array[(Vector[String], Long)] =
      wordFreq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Vector.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) =>
          if (syms.length <= 1) (syms, n)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
                out += (syms(i) + syms(i + 1)); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        learned += 1
      }
    }
    Vocab(merges.result())
  }

  /** Learned-BPE token count per document: broadcast vocab, one typed
    * `mapPartitions` pass (no UDF — the repo-wide rule; imperative
    * per-row kernels ride the [[Multimodal]] iterator shape). Output
    * schema: exactly `(idCol, bpe_tokens)` — join back on `idCol` for
    * other columns, as with [[Dedup.dedupChunks]]. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  vocab: Vocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vB = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val v = vB.value
        rows.map { case (id, text) =>
          val n =
            if (text == null) 0L
            else text.trim.split("\\s+").iterator.filter(_.nonEmpty)
              .map(w => v.encodeWord(w).length.toLong).sum
          (id, n)
        }
      }.toDF(idCol, "bpe_tokens")
  }
}

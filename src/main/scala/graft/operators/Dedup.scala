package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.LineageCut._

/**
 * Deduplication operators for LLM training-data pipelines (mission
 * extension, SURVEY.md §7.4): exact, MinHash+LSH, SimHash, and exact
 * n-gram-Jaccard verification.
 *
 * Scale design: every method is a bounded number of shuffles over keys
 * that stay small (band buckets, 16-bit chunks); no O(n²) self-join ever
 * happens un-blocked. Candidate generation (LSH) and verification
 * (signature/Jaccard estimates) are separate so the expensive exact check
 * only runs on the tiny candidate set.
 */
object Dedup {

  /** Exact dedup: one canonical row (min id) per distinct key. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /**
   * Exact dedup, 100 TB shape: identical result to [[exact]] but the full
   * text bodies never shuffle. Stage 1 groups 8-byte content hashes;
   * stage 2 re-verifies only the hash-collision groups (dup candidates,
   * a vanishing fraction of the corpus) against real text. [[exact]]
   * shuffles the whole corpus keyed by document body — fine at test SF,
   * prohibitive at scale.
   */
  def exactScalable(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val hashed = df.select(col(idCol), col(keyCol),
      xxhash64(col(keyCol)).as("__h"), length(col(keyCol)).as("__len"))
    val dupHashes = hashed.groupBy("__h", "__len")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select("__h", "__len")
    // singletons: already unique, emit directly with dup_count 1
    val singles = hashed.join(dupHashes, Seq("__h", "__len"), "left_anti")
      .select(col(keyCol), col(idCol), lit(1L).as("dup_count"))
    // collision groups: exact compare on the (tiny) candidate subset
    val dups = hashed.join(dupHashes, Seq("__h", "__len"), "left_semi")
      .groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(keyCol), col(idCol), col("dup_count"))
    singles.unionByName(dups)
  }

  /** Exact near-dup on normalized text: same distinct-word bag
    * (fingerprint) regardless of order/case/whitespace. */
  def exactNormalized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /**
   * Chunk-level (paragraph-style) exact dedup — the RefinedWeb/CCNet move
   * of removing repeated PASSAGES while keeping the documents around
   * them. Fixed `chunkTokens`-token windows stand in for paragraphs
   * (corpus text here has no newlines; on real web text pass
   * paragraph-split chunks through the same keep-first machinery). The
   * FIRST occurrence of a chunk corpus-wide (smallest `(id, chunk_idx)`)
   * survives; every later identical chunk is dropped, and each document
   * is re-assembled from its surviving chunks in order (fully-duplicated
   * docs collapse to empty text — doc-level dedup falls out).
   *
   * 100 TB shape — document text never shuffles:
   *   1. chunk hashes `xxhash64(chunk)` aggregate to find collision
   *      groups (the census exchange carries only hash + partial count,
   *      map-side combined);
   *   2. only collision-group chunk rows carry text into the keep-first
   *      window, partitioned by true equality `(hash, chunk)` so a
   *      hash collision between DIFFERENT chunks can never merge them —
   *      the [[exactScalable]] recheck, at chunk grain;
   *   3. the loser set `(id, idx)` — actual duplicate chunks only —
   *      groups per doc (a broadcast at real dup rates) and joins back to
   *      the original rows; each document rebuilds MAP-SIDE by
   *      re-chunking its own text and skipping the lost indexes, so the
   *      assembly never exchanges bodies either.
   */
  /**
   * Output schema: exactly `(idCol, clean_text)` — one row per input row,
   * other input columns intentionally dropped (join back on `idCol` to
   * recover them; carrying wide payload columns through the chunk shuffle
   * would multiply shuffle bytes by the chunk fan-out for nothing).
   */
  def dedupChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int): DataFrame = {
    requireChunkContract(df, chunkTokens)
    import org.apache.spark.sql.expressions.Window
    // both the census and the keep-first window read the exploded chunk
    // frame; persist it for the (eager, checkpoint-bounded) loser
    // computation so tokenize+chunk+hash runs once, not twice —
    // DISK-spillable, local to each executor, never an exchange
    val chunks = df
      .select(col(idCol), posexplode(chunkArray(col(textCol), chunkTokens))
        .as(Seq("__idx", "__chunk")))
      .select(col(idCol), col("__idx"), col("__chunk"),
        xxhash64(col("__chunk")).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // census exchange carries only (hash, partial count) — the text
    // equality in the window below already disarms hash collisions, so
    // nothing else needs to ride along
    val dupHashes = chunks.groupBy("__h")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select("__h")
    val firstW = Window
      .partitionBy(col("__h"), col("__chunk"))
      .orderBy(col(idCol).asc, col("__idx").asc)
    // the census is DISTINCT duplicated chunks — orders smaller than dup
    // instances in boilerplate-shaped corpora — so broadcast it and filter
    // candidates map-side; a shuffled semi-join here would move every
    // chunk's text keyed by hash, the exact exchange this path exists to
    // avoid. The broadcast is size-GUARDED, not forced: a pathological
    // census (hundreds of millions of pairwise-distinct dup chunks) falls
    // back to the shuffled semi-join rather than aborting on the
    // broadcast limit — text moves, but only because the data genuinely
    // dup-floods (and the runtime bloom-filter semi-join reduction can
    // still thin it when enabled).
    val census = dupHashes.lineageCut() // count + join read it once
    val censusSide =
      if (census.count() <= maxBroadcastCensusRows(df.sparkSession))
        broadcast(census)
      else census
    val lost = chunks.join(censusSide, Seq("__h"), "left_semi")
      .withColumn("__rk", row_number().over(firstW))
      .filter(col("__rk") > 1)
      .groupBy(col(idCol))
      .agg(collect_list(col("__idx")).as("__lost"))
      // one row per LOSING doc — orders smaller than the corpus;
      // materialize once so sizing it doesn't recompute the window
      .lineageCut()
    chunks.unpersist(blocking = false) // checkpoint consumed both readers
    // broadcast the loser table so the rebuild join never exchanges the
    // corpus (a stats-blind planner falls back to a sort-merge join here
    // and re-shuffles every document body keyed by id — measured 173 MB
    // of 219 at the stress tier); past the size guard, fall back to the
    // shuffled join — at that dup-doc rate text movement is unavoidable
    // and the text-keyed baseline pays the same exchange. The guard
    // bounds the PAYLOAD (doc rows AND total lost indexes — the arrays
    // are unbounded per row), not just the row count.
    val (lostDocs, lostIdx) = {
      val r = lost.agg(count(lit(1)), coalesce(sum(size(col("__lost"))),
        lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val lostSide =
      if (lostDocs <= MaxBroadcastLoserDocs &&
        lostIdx <= MaxBroadcastLoserIndexes) broadcast(lost)
      else lost
    val lostOrEmpty = coalesce(col("__lost"), array().cast("array<int>"))
    df.select(col(idCol), col(textCol))
      .join(lostSide, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          filter(chunkArray(col(textCol), chunkTokens),
            (c, i) => not(array_contains(lostOrEmpty, i))), " ")
          .as("clean_text"))
  }

  /** Loser-table rows above which [[dedupChunks]]'s rebuild join stops
    * broadcasting (≈ tens of MB of (id, int-array) rows — comfortably
    * under executor memory, well over any boilerplate-shaped dup rate's
    * distinct losing-doc count at one shard of a partitioned corpus). */
  private val MaxBroadcastLoserDocs = 1000000L

  /** Companion payload bound: total lost-chunk indexes across all loser
    * rows (~4 B each; 16M ≈ 64 MB broadcast) — rows alone don't bound
    * the broadcast when individual docs lose thousands of chunks. */
  private val MaxBroadcastLoserIndexes = 16000000L

  /** Census rows above which [[dedupChunks]] stops broadcasting the
    * duplicated-chunk hash set. Derived from a MEMORY budget, not a
    * fixed row count: a hashed broadcast relation costs ~40 bytes per
    * 8-byte key once the hash table, pointers, and page layout are
    * paid — several times the serialized size — so the cap is
    * `spark.graft.dedup.maxCensusBroadcastMb` (default 256 MB of
    * RELATION memory ≈ 6.7M rows) per driver/executor, tunable without
    * a rebuild for bigger drivers. */
  private def maxBroadcastCensusRows(
      spark: org.apache.spark.sql.SparkSession): Long = {
    val key = "spark.graft.dedup.maxCensusBroadcastMb"
    val mb = spark.conf.getOption(key).map { raw =>
      // fail at READ time with the key named, not with a bare
      // NumberFormatException from inside a census-sizing job
      val parsed = scala.util.Try(raw.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"$key must be a plain MB integer (e.g. 256), got '$raw'"))
      require(parsed > 0, s"$key must be positive, got $parsed")
      parsed
    }.getOrElse(256L)
    mb * 1024L * 1024L / 40L
  }

  /** The pre-hashing chunk dedup: identical semantics to [[dedupChunks]]
    * but the keep-first window shuffles FULL chunk text corpus-wide and
    * the rebuild re-shuffles surviving text keyed by id — kept only as
    * the [[graft.tools.StressBench]] `chunkbytes` comparison baseline. */
  private[graft] def dedupChunksTextKeyed(df: DataFrame, idCol: String,
                                          textCol: String,
                                          chunkTokens: Int): DataFrame = {
    requireChunkContract(df, chunkTokens)
    import org.apache.spark.sql.expressions.Window
    val chunks = df
      .select(col(idCol), posexplode(chunkArray(col(textCol), chunkTokens))
        .as(Seq("__idx", "__chunk")))
    val firstW = Window.partitionBy(col("__chunk"))
      .orderBy(col(idCol).asc, col("__idx").asc)
    val kept = chunks
      .withColumn("__rk", row_number().over(firstW))
      .filter(col("__rk") === 1)
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__idx"), col("__chunk")))),
          s => s.getField("__chunk")), " ").as("clean_text"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }

  private def requireChunkContract(df: DataFrame, chunkTokens: Int): Unit = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val reserved = df.columns
      .filter(c => c.startsWith("__") || c == "clean_text")
    require(reserved.isEmpty,
      s"column names starting with __ (and clean_text) are reserved here: " +
        s"${reserved.toSet}")
  }

  /** Fixed `chunkTokens`-token chunk strings of `text`, in order; empty
    * text → empty array (the `when` guard keeps `sequence(0, -1)` — which
    * would run BACKWARD — from ever evaluating). */
  private def chunkArray(text: Column, chunkTokens: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = ceil(size(toks).cast("double") / chunkTokens).cast("int")
    when(n > 0,
      transform(sequence(lit(0), n - 1),
        i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * MinHash+LSH near-duplicate candidate pairs.
   *
   * shingle→minhash→band→bucket-join: signatures of `numHashes` minimums
   * over char-`shingleSize`-grams; `bands` bands of `numHashes/bands` rows
   * each; two docs collide iff some band hashes equal; collisions are
   * scored by the signature-agreement Jaccard estimate and filtered.
   *
   * Emits (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
   * bands. Probability calibration: P(collide) = 1-(1-j^r)^b.
   */
  /**
   * @param maxBucketSize when > 0, LSH buckets holding more than this many
   *   docs are skipped entirely (their pairs are still found by any
   *   NON-degenerate band the pair shares). A bucket of size B costs
   *   B²/2 comparisons — one pathological bucket (boilerplate headers,
   *   empty-ish docs, low-entropy corpora) turns the whole job quadratic,
   *   and the [[StressBench]] XL tier measured exactly that blow-up on a
   *   low-entropy synthetic corpus. Standard large-scale dedup practice;
   *   trade: recall for pairs whose ONLY shared bands are degenerate.
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleSize: Int = 5, threshold: Double = 0.7,
                   maxBucketSize: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
        graft.functions.Text.minhashSig(col(textCol), numHashes, shingleSize).as("sig"))
      // band keys: hash of each signature slice; band index disambiguates
      .withColumn("band_keys",
        expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b AS band, xxhash64(slice(sig, b * $r + 1, $r)) AS bucket))"))
      // materialize signatures ONCE before the self-join — otherwise
      // Catalyst re-derives minhash_sig from the scan on BOTH join sides
      // (and again inside pushed filters): ~4-6 sketch evaluations per
      // document. lineageCut materializes once without pinning a
      // CacheManager entry the way persist() would; in the default local
      // mode its blocks are GC-cleaned (reliable-mode checkpoint FILES
      // persist until externally cleaned — see LineageCut's cleanup note).
      .lineageCut()
    // The band self-join carries ONLY (id, band, bucket) — 24-byte rows.
    // Joining with the signature inline multiplies the shuffle by the
    // 0.5 KB sig × bands replication (measured: the sf-XL 1.28M-doc tier
    // fell off a spill cliff at ~390 s; the lean join + score-after shape
    // is minutes→seconds). Signatures rejoin only for the (few) candidate
    // pairs, which AQE broadcasts against the checkpointed sig frame.
    val banded0 = sigs.select(col("id"), explode(col("band_keys")).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
    val banded = if (maxBucketSize > 0) {
      // one count-aggregate (16-byte keys, map-side combined) finds the
      // OVERSIZED buckets — few on any corpus, so the exclusion anti-join
      // broadcasts (the inverse semi-join against all healthy buckets is
      // corpus-sized: measured 163 s vs seconds at the 1.28M tier)
      val oversized = banded0.groupBy("band", "bucket")
        .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBucketSize)
        .select("band", "bucket")
      banded0.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
    } else banded0
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // a pair colliding in k bands scores once, not k times
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("__sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("__sig_b"))
    val agree = graft.functions.Text.sigAgree(col("__sig_a"), col("__sig_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /**
   * SimHash near-dup pairs at hamming distance ≤ `maxHamming` (< 16).
   * Banding: the 64-bit fingerprint splits into 4 16-bit chunks; hamming
   * ≤ 3 guarantees at least one identical chunk (pigeonhole), so the join
   * blocks on (chunkIndex, chunkValue) and verifies with bit_count.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4 * 4, "banding guarantee needs maxHamming < 16")
    val fps = df.select(col(idCol).as("id"),
        graft.functions.Text.simhash64(col(textCol)).as("fp"))
      // one simhash64 evaluation per doc (see minhashPairs note)
      .lineageCut()
    val chunked = fps.select(col("id"), col("fp"),
        explode(expr("transform(sequence(0, 3), c -> " +
          "struct(c AS chunk, shiftright(fp, c * 16) & 65535 AS cv))")).as("ck"))
      .select(col("id"), col("fp"), col("ck.chunk"), col("ck.cv"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** Character n-gram set of a string column (distinct shingles), via
    * higher-order functions — no UDF. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /**
   * Exact n-gram Jaccard for candidate pairs — the verification stage
   * after LSH candidate generation. `pairs` must have (id_a, id_b).
   *
   * Scale shape: only documents that appear in a candidate pair are ever
   * shingled (semi-join first) — candidates are a vanishing fraction of a
   * 100 TB corpus, so the expensive gram arrays exist only for them.
   */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame = {
    // the candidate set is small and referenced three times (two id
    // projections + the verify join): materialize it once
    val p = pairs.lineageCut()
    val wanted = p.select(col("id_a").as("__wid"))
      .unionAll(p.select(col("id_b").as("__wid"))).distinct()
    val grams = docs
      .join(wanted, col(idCol) === col("__wid"), "left_semi")
      .select(col(idCol).as("vid"), charNgrams(col(textCol), n).as("grams"))
      // joined twice (id_a side + id_b side): shingle each candidate once
      .lineageCut()
    p
      .join(grams.withColumnRenamed("vid", "id_a").withColumnRenamed("grams", "ga"), "id_a")
      .join(grams.withColumnRenamed("vid", "id_b").withColumnRenamed("grams", "gb"), "id_b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("inter")), 6))
      .drop("ga", "gb", "inter")
  }

  /**
   * Containment-coefficient near-dup pairs — the measure
   * Jaccard-resemblance structurally misses (Broder 1997 separates
   * resemblance from containment for exactly this case): a 10-token
   * passage quoted inside a 500-token document has Jaccard ≈ 0.02 —
   * no LSH band ever buckets the pair — but containment 1.0. This is
   * the doc-inside-doc detector: quoted eval passages, boilerplate-
   * wrapped reposts, prefix-truncated duplicates.
   *
   * Semantics: word-`n`-gram sets, with grams whose document frequency
   * exceeds `maxGramDf` excluded from evidence AND from sizes — the
   * measure is containment over the INFORMATIVE gram vocabulary
   * (ubiquitous boilerplate grams say nothing about copying, and at
   * corpus scale their posting lists are exactly the quadratic join
   * blow-up; same knob contract as [[minhashPairs]]'s
   * `maxBucketSize`). Reported `containment = common / min(|A|, |B|)`
   * — the larger directional coefficient — with both capped set sizes
   * emitted so callers can recover each direction exactly.
   *
   * Scale shape: grams travel as 64-bit hashes from the first select
   * (never strings; equality-only use, collisions 2⁻⁶⁴ per gram pair —
   * the [[graft.operators.Profiling.snapshotDiff]] contract); the
   * (id, gram) frame is lineage-cut and feeds df-counts, sizes, and
   * the pair join from ONE materialization. df = 1 grams are pruned
   * from the JOIN only (they cannot pair; typically most of the
   * vocabulary) while still counting toward sizes, so the self-join's
   * fan-out is bounded by Σ df² over 2 ≤ df ≤ `maxGramDf` — capped,
   * never "the"-sized. The pair aggregate and size joins are keyed;
   * one final single-division filter. No per-pair array intersect
   * anywhere.
   *
   * Returns (`id_a`, `id_b`, `common`, `size_a`, `size_b`,
   * `containment` 6dp) for pairs at or above `threshold`, id_a < id_b.
   */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 5, threshold: Double = 0.8,
                       maxGramDf: Int = 1000): DataFrame = {
    require(n >= 2, "n must be >= 2 (unigram containment is topic overlap)")
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]; got $threshold")
    require(maxGramDf >= 2, s"maxGramDf must be >= 2; got $maxGramDf")
    // the minimal 16-byte (id, gh) frame is the ONLY corpus-sized thing
    // materialized; df classification then touches it via aggregates
    // and joins against gram LISTS (over-cap boilerplate, pairable
    // grams) that are vocabulary-outlier-sized, never via a
    // corpus-wide (id, gh, df) join — the first cut of this operator
    // carried df on every row and cost 17× at the 1.28M stress tier
    val grams = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__gram"))
      .select(col("__id"), xxhash64(col("__gram")).as("__gh"))
      .dropDuplicates("__id", "__gh")
      .lineageCut() // feeds df counts, totals, over-cap hits, pair join
    // the gh-keyed df aggregate is the one full-width exchange (unique
    // grams don't combine map-side); run it ONCE and keep only the
    // repeated grams — df = 1 is typically ~all of the vocabulary and
    // nothing downstream wants it (can't pair, can't exceed the cap)
    val multi = grams.groupBy("__gh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .lineageCut() // over-cap list + pairable list from one pass
    // size = all df ≤ cap grams: per-id totals MINUS over-cap hits
    // (df = 1 grams count toward sizes — a gram unique to A is evidence
    // AGAINST A being contained anywhere)
    val totals = grams.groupBy("__id").agg(count(lit(1)).as("__tot"))
    val overHits = grams
      .join(multi.filter(col("__df") > maxGramDf).select("__gh"), "__gh")
      .groupBy("__id").agg(count(lit(1)).as("__over"))
    val sizes = totals.join(overHits, Seq("__id"), "left")
      .select(col("__id"),
        (col("__tot") - coalesce(col("__over"), lit(0L))).as("__sz"))
    // evidence grams: repeated somewhere but not boilerplate
    val pairable = multi.filter(col("__df") <= maxGramDf).select("__gh")
    val joinable = grams.join(pairable, "__gh")
    val pairs = joinable.as("a")
      .join(joinable.as("b"),
        col("a.__gh") === col("b.__gh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.select(col("__id").as("id_a"), col("__sz").as("size_a")),
        "id_a")
      .join(sizes.select(col("__id").as("id_b"), col("__sz").as("size_b")),
        "id_b")
      .withColumn("__cont", col("common").cast("double") /
        least(col("size_a"), col("size_b")).cast("double"))
      .filter(col("__cont") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"),
        col("size_a"), col("size_b"),
        round(col("__cont"), 6).as("containment"))
  }

  /**
   * EXACT all-pairs set-similarity join with prefix filtering (AllPairs
   * / PPJoin family — Bayardo, Ma & Srikant 2007 "Scaling up all pairs
   * similarity search"; Chaudhuri, Ganti & Kaushik 2006 SSJoin): every
   * pair of documents whose word-SET Jaccard ≥ `threshold`, with the
   * exact score — no LSH probability, no missed pairs. The complement
   * of [[minhashPairs]]: use this when recall must be 1.0 (compliance
   * dedup, eval-set decontamination audits), LSH when the corpus is too
   * large for exactness.
   *
   * Why it scales: tokens are globally ordered RAREST-FIRST (df asc),
   * and each document only emits its PREFIX — the first
   * `|x| − ⌈t·|x|⌉ + 1` ordered tokens. Two sets with Jaccard ≥ t must
   * share at least one prefix token under that common order, so the
   * candidate equi-join runs on prefix tokens only — and prefix tokens
   * are by construction the RAREST in each document, so the join's
   * per-key fan-out is bounded by rare-token document frequencies, not
   * by "the"-sized posting lists (the frequent tokens that would
   * quadratically explode a naive shared-token join never leave the
   * suffix). A size pre-filter (`t·|x| ≤ |y| ≤ |x|/t` — Jaccard ≥ t is
   * impossible outside it) prunes before verification; the exact
   * array-intersect verify runs on surviving candidates only.
   *
   * The df census is one map-side-combined aggregate; the global order
   * attaches by a token-keyed join and each document re-sorts its own
   * tokens locally (per-token work, never per-pair). Verification
   * joins the two (id, token-set) sides by 8-byte ids.
   *
   * On top of AllPairs' prefix + size filters this applies PPJoin's
   * POSITIONAL filter (Xiao, Wang, Lin & Yu 2008, "Efficient
   * similarity joins for near duplicate detection"): a shared prefix
   * token at (1-based) positions i of |x| and j of |y| bounds the
   * whole overlap by `min(i,j)−1 + 1 + min(|x|−i, |y|−j)` — at most
   * min(i,j)−1 earlier tokens can match, the shared token is 1, and
   * at most the shorter remaining suffix can match. Jaccard ≥ t needs
   * overlap ≥ ⌈t(|x|+|y|)/(1+t)⌉, and the bound holds for EVERY shared
   * occurrence, so the pair's MINIMUM bound decides — computed in the
   * same (id_a, id_b) aggregate that deduplicated candidates anyway
   * (zero extra shuffles), it typically cuts several-fold the pairs
   * reaching the exact verify at thresholds ≥ 0.7.
   *
   * Returns (`id_a`, `id_b`, `jaccard`) with id_a < id_b, 6dp.
   */
  def similarityJoinExact(docs: DataFrame, idCol: String, textCol: String,
                          threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]; got $threshold")
    val sets = simJoinSets(docs, idCol, textCol)
    val cand = simJoinCandidates(sets, threshold)
    val ga = sets.select(col("id").as("id_a"), col("toks").as("__ta"))
    val gb = sets.select(col("id").as("id_b"), col("toks").as("__tb"))
    cand.join(ga, "id_a").join(gb, "id_b")
      .withColumn("__i", size(array_intersect(col("__ta"), col("__tb"))))
      .withColumn("__j", col("__i").cast("double") /
        (size(col("__ta")) + size(col("__tb")) - col("__i")))
      .filter(col("__j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
  }

  /** Tokenized distinct word sets (`id`, `toks`) feeding
    * [[similarityJoinExact]] — lineage-cut once, consumed by both the
    * candidate stage and the verify joins. */
  private[graft] def simJoinSets(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        array_distinct(TextAnalysis.tokens(lower(col(textCol)))).as("toks"))
      .filter(size(col("toks")) > 0)
      // fanout (r18): the df census + per-doc prefix sort map sides
      // otherwise run on the input's split count (two tasks at bench
      // scale for the filtered slice); no-op at data scale
      .lineageCutFanout()

  /** Candidate (`id_a`, `id_b`) pairs for [[similarityJoinExact]]:
    * rarest-first prefix join + size filter, then (when `positional`)
    * PPJoin's position upper bound folded into the pair-dedup
    * aggregate. `positional = false` is the plain AllPairs form, kept
    * visible so the spec can pin both the identical-output contract
    * and the candidate-count reduction. */
  private[graft] def simJoinCandidates(sets: DataFrame, threshold: Double,
                                       positional: Boolean = true): DataFrame = {
    val dfreq = sets.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))
    // global rarest-first order: (df, token); each doc sorts ITS OWN
    // tokens by it and keeps the prefix
    val ordered = sets.select(col("id"), explode(col("toks")).as("w"))
      .join(dfreq, "w")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("w"))))
        .as("__ord"))
      .select(col("id"),
        expr("transform(__ord, x -> x.w)").as("ow"),
        size(col("__ord")).as("n"))
      // the 1e-9 guards float-up error in t·n (an over-rounded ceil
      // would SHORTEN the prefix and silently break completeness; the
      // epsilon can only lengthen it, which stays sound)
      .withColumn("__plen",
        (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
          .cast("int"))
      .select(col("id"), col("n"),
        slice(col("ow"), lit(1), col("__plen")).as("prefix"))
      // fanout (r18): both posexplode prefix map sides read this frame;
      // AQE coalesces the upstream collect_list aggregate to one or two
      // partitions at bench scale, which would pin the candidate join's
      // map sides there; no-op at data scale
      .lineageCutFanout()
    val pa = ordered.select(col("id").as("id_a"), col("n").as("na"),
      posexplode(col("prefix")).as(Seq("__pa", "w")))
    val pb = ordered.select(col("id").as("id_b"), col("n").as("nb"),
      posexplode(col("prefix")).as(Seq("__pb", "w")))
    val rows = pa.join(pb, Seq("w"))
      .filter(col("id_a") < col("id_b"))
      // size filter: Jaccard >= t forces t·|a| <= |b| <= |a|/t
      .filter(col("nb") >= lit(threshold) * col("na") &&
        col("na") >= lit(threshold) * col("nb"))
    if (!positional) rows.select("id_a", "id_b").distinct()
    else rows
      // positional upper bound per occurrence (__pa/__pb are 0-based):
      //   overlap <= min(__pa, __pb) + 1 + min(na−__pa−1, nb−__pb−1)
      // required: overlap >= ceil(t(na+nb)/(1+t)); the 1e-9 relaxes the
      // ceil DOWNWARD, which can only ADMIT extra candidates (sound —
      // an FP-inflated alpha could prune a real pair)
      .groupBy("id_a", "id_b")
      .agg(min(least(col("__pa"), col("__pb")) + lit(1) +
          least(col("na") - col("__pa") - 1, col("nb") - col("__pb") - 1))
          .as("__ub"),
        first(ceil(lit(threshold) / (1.0 + threshold) *
          (col("na") + col("nb")) - lit(1e-9))).as("__alpha"))
      .filter(col("__ub") >= col("__alpha"))
      .select("id_a", "id_b")
  }

  /**
   * One-call near-duplicate removal: MinHash-LSH candidates → exact
   * n-gram Jaccard verification → connected components → keep only each
   * component's canonical (min-id) row. Returns the deduplicated corpus
   * with the original columns.
   */
  def dedupe(df: DataFrame, idCol: String, textCol: String,
             jaccardThreshold: Double = 0.85, numHashes: Int = 64,
             bands: Int = 16, shingleSize: Int = 5): DataFrame = {
    // ONE shared (id, text) projection feeds sketch, verify, and label
    // stages — without it each stage re-scans (and re-decodes) the source
    // table; only the final survivor semi-join touches the source again
    val slim = df.select(col(idCol), col(textCol)).lineageCut()
    val cand = minhashPairs(slim, idCol, textCol, numHashes, bands, shingleSize,
      threshold = math.max(0.0, jaccardThreshold - 0.2)) // recall margin
      .select("id_a", "id_b")
    val verified = verifyJaccard(cand, slim, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= jaccardThreshold).select("id_a", "id_b")
    val labels = assignCanonical(slim.select(col(idCol).as("id")), verified)
    df.join(labels.filter(col("id") === col("canonical_id"))
        .select(col("id").as(s"__keep_$idCol")),
      col(idCol) === col(s"__keep_$idCol"), "left_semi")
  }

  /**
   * One-call WINNOW-based dedupe — the MOSS-flavored sibling of
   * [[dedupe]]: winnowing fingerprints generate candidates (guaranteed
   * for any ≥ w+k−1 token overlap — a stronger floor than MinHash band
   * probability), banded edit distance verifies them (order-sensitive,
   * stricter than Jaccard), connected components collapse dup groups,
   * and the minimum id per group survives.
   *
   * Candidate pairs join on `fp_hash` (8-byte-equivalent keys);
   * `maxBucketSize` caps pathological fingerprint buckets exactly like
   * the LSH band join's cap (a stop-phrase gram shared by everything
   * must not quadratically explode — the docs it would have paired are
   * still covered by their other, rarer fingerprints).
   */
  def dedupeByWinnow(df: DataFrame, idCol: String, textCol: String,
                     maxDist: Int, k: Int = 3, w: Int = 4,
                     maxBucketSize: Int = 64): DataFrame = {
    // fan out (r18): the per-doc fingerprint map side (tokenize +
    // window-min) otherwise runs on the input's split count — one or
    // two tasks for a single-split corpus scan; no-op at data scale
    val slim = df.select(col(idCol), col(textCol)).lineageCutFanout()
    // cut (r18): fps feeds BOTH the bucket census and the candidate
    // join — uncut, the whole fingerprint pipeline executed once per
    // consumer (two identical 7.8 MB map sides in the r18 profile)
    val fps = winnowFingerprints(slim, idCol, textCol, k, w)
      .select(col("fp_hash"), col(idCol).cast("long"))
      .lineageCut()
    val capped = fps.join(
      fps.groupBy("fp_hash").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBucketSize)
        .select("fp_hash"),
      Seq("fp_hash"), "left_semi")
    val cand = capped.select(col("fp_hash"), col(idCol).as("id_a"))
      .join(capped.select(col("fp_hash"), col(idCol).as("id_b")), Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val verified = verifyEditDistance(slim, idCol, textCol, cand, maxDist)
      .filter(col("is_dup")).select("id_a", "id_b")
    val labels = assignCanonical(
      slim.select(col(idCol).cast("long").as("id")), verified)
    df.join(labels.filter(col("id") === col("canonical_id"))
        .select(col("id").as(s"__keep_$idCol")),
      col(idCol) === col(s"__keep_$idCol"), "left_semi")
  }

  /**
   * Persist a corpus's winnowing fingerprints as the INCREMENTAL dedup
   * index `(fp_hash, id)` — the build half of the daily-drop winnow
   * workflow ([[winnowAdmitDelta]] is the delta half). Built once per
   * corpus; a delta run then reads this store instead of
   * re-fingerprinting (and re-shuffling) the whole corpus — the same
   * persisted-store delta pattern as [[Sketches]]' Bloom ledgers and
   * [[Similarity.buildIvfIndex]]. Rows are distinct `(fp_hash, id)`
   * (a doc repeating a fingerprint at several positions indexes once).
   */
  def writeWinnowIndex(corpus: DataFrame, path: String, idCol: String,
                       textCol: String, k: Int = 3, w: Int = 4): Unit = {
    winnowFingerprints(corpus, idCol, textCol, k, w)
      .select(col("fp_hash"), col(idCol).cast("long").as("id"))
      .distinct()
      .write.mode("overwrite").parquet(path)
  }

  /**
   * INCREMENTAL winnow-based corpus admission — [[admitDelta]]'s
   * contract with [[dedupeByWinnow]]'s machinery (winnowing candidates,
   * banded edit-distance verification): delta docs within `maxDist`
   * edits of ANY corpus doc are rejected, within-delta dup groups among
   * the survivors collapse to their min id, and the admitted delta rows
   * return. The corpus itself never re-deduplicates — admission leaves
   * it untouched, which is what makes the rerun O(delta): unlike the
   * full [[dedupeByWinnow]] over corpus ∪ delta (which re-fingerprints,
   * re-verifies, and re-labels EVERYTHING each run), only components
   * touched by new pairs are computed.
   *
   * Scale shape, stage by stage: delta-only fingerprinting (the corpus
   * side comes from the PERSISTED [[writeWinnowIndex]] store); the
   * store scan is semi-join-filtered by the broadcast delta
   * fingerprint set, so only buckets containing a delta fingerprint
   * leave it (O(store) sequential IO, zero corpus text work, zero
   * corpus-sized shuffle); bucket capping sees each such bucket's TRUE
   * size (every corpus member of a delta-containing bucket survives
   * the semi-join); verification touches only delta-involving pairs,
   * with corpus TEXTS point-semi-joined for exactly the touched ids;
   * and connected components run over delta survivors only. Corpus
   * and delta ids must be disjoint (the cross-corpus contract shared
   * with [[admitDelta]]).
   *
   * `corpus` supplies verification texts only — fingerprints are never
   * recomputed from it; `maxBucketSize` caps pathological fingerprint
   * buckets exactly like [[dedupeByWinnow]] (capped over distinct
   * (fp_hash, id) membership — the store's row grain).
   */
  def winnowAdmitDelta(corpus: DataFrame, delta: DataFrame,
                       indexPath: String, idCol: String, textCol: String,
                       maxDist: Int, k: Int = 3, w: Int = 4,
                       maxBucketSize: Int = 64): DataFrame = {
    val spark = delta.sparkSession
    val slimD = delta.select(col(idCol), col(textCol)).lineageCut()
    val fpsD = winnowFingerprints(slimD, idCol, textCol, k, w)
      .select(col("fp_hash"), col(idCol).cast("long").as("id"))
      .distinct()
      .lineageCut() // feeds the broadcast hash set AND the bucket join
    // touched buckets only: the store scan is semi-joined against the
    // delta fingerprint set before any corpus work happens. No forced
    // broadcast: a daily-sized delta's hash set broadcasts under AQE's
    // threshold automatically, while a LARGE delta (the 5%-of-corpus
    // stress tier measured ~100 MB of hashes at 64k docs) must NOT be
    // force-shipped to every scan task — the shuffled semi-join is
    // then the right plan and still touches only (fp_hash, id) rows
    val idx = spark.read.parquet(indexPath)
      .join(fpsD.select("fp_hash").distinct(), Seq("fp_hash"), "left_semi")
    val unionFps = fpsD.withColumn("__corpus", lit(false))
      .unionByName(idx.select(col("fp_hash"), col("id"))
        .withColumn("__corpus", lit(true)))
    val capped = unionFps.join(
      unionFps.groupBy("fp_hash").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBucketSize)
        .select("fp_hash"),
      Seq("fp_hash"), "left_semi")
      .lineageCut() // both candidate joins read this frame
    val dSide = capped.filter(!col("__corpus")).select("fp_hash", "id")
    val cSide = capped.filter(col("__corpus")).select("fp_hash", "id")
    val candX = dSide.as("a").join(cSide.as("b"),
        col("a.fp_hash") === col("b.fp_hash"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(true).as("__cross"))
    val candD = dSide.as("a").join(dSide.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(false).as("__cross"))
    val cand = candX.unionByName(candD).distinct()
      .lineageCut() // verify + the __cross rejoin both read it
    // corpus texts for exactly the touched ids — a point semi-join, the
    // only read of the corpus table in the whole delta run
    val slimC = corpus.select(col(idCol), col(textCol))
      .join(cand.filter(col("__cross")).select(col("id_b").as("__tid"))
          .distinct(),
        col(idCol).cast("long") === col("__tid"), "left_semi")
    val verified = verifyEditDistance(slimD.unionByName(slimC), idCol,
        textCol, cand.select("id_a", "id_b"), maxDist)
      .filter(col("is_dup"))
      .join(cand, Seq("id_a", "id_b")) // recover the branch tag
      .lineageCut() // referenced three times below
    val contaminated = verified.filter(col("__cross"))
      .select(col("id_a").as("id")).distinct()
      .lineageCut() // referenced three times below
    // within-delta dup edges among SURVIVORS only — the pair set the
    // full pipeline would have produced among admitted docs
    val dupD = verified.filter(!col("__cross"))
      .join(contaminated.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .join(contaminated.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
      .select("id_a", "id_b")
    val survivorIds = slimD.select(col(idCol).cast("long").as("id"))
      .join(contaminated, Seq("id"), "left_anti")
    val keep = assignCanonical(survivorIds, dupD)
      .filter(col("id") === col("canonical_id"))
      .select(col("id").as("__admit_id"))
    delta.join(keep, col(idCol).cast("long") === col("__admit_id"),
      "left_semi")
  }

  /**
   * Cross-corpus near-duplicate pairs: LSH-banded join of two DIFFERENT
   * corpora (train × eval), never all-pairs — the candidate generator for
   * decontamination. Emits (id_a from `a`, id_b from `b`, est_jaccard).
   */
  /** Lean MinHash sketch frame `(id, sig, band_keys)`, lineage-cut
    * so the sketch is evaluated exactly once per document no matter how
    * many joins reference it — the shared currency of [[minhashPairs]],
    * [[crossMinhashPairs]], and [[admitDelta]]. */
  private def sketchFrame(df: DataFrame, idCol: String, textCol: String,
                          numHashes: Int, bands: Int,
                          shingleSize: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    df.select(col(idCol).as("id"),
        graft.functions.Text.minhashSig(col(textCol), numHashes, shingleSize).as("sig"))
      .withColumn("band_keys",
        expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b AS band, xxhash64(slice(sig, b * $r + 1, $r)) AS bucket))"))
      .lineageCut()
  }

  /** `(id, band, bucket)` 24-byte band rows of a [[sketchFrame]]. */
  private def bandFrame(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), explode(col("band_keys")).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))

  def crossMinhashPairs(a: DataFrame, b: DataFrame, idCol: String,
                        textCol: String, numHashes: Int = 64, bands: Int = 16,
                        shingleSize: Int = 5, threshold: Double = 0.7): DataFrame = {
    // lean band join + score-after, as in [[minhashPairs]]
    def sigged(df: DataFrame): DataFrame =
      sketchFrame(df, idCol, textCol, numHashes, bands, shingleSize)
    def banded(sigs: DataFrame): DataFrame = bandFrame(sigs)
    val sigA = sigged(a)
    val sigB = sigged(b)
    val cand = banded(sigA).as("a").join(banded(sigB).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val agree = graft.functions.Text.sigAgree(col("__sig_a"), col("__sig_b"))
    cand
      .join(sigA.select(col("id").as("id_a"), col("sig").as("__sig_a")), "id_a")
      .join(sigB.select(col("id").as("id_b"), col("sig").as("__sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /**
   * Eval-set decontamination: drop every document of `corpus` that is a
   * near-duplicate of ANY document in `eval` (train/test leakage removal).
   * LSH candidates via [[crossMinhashPairs]], exact n-gram Jaccard
   * verification, then an anti-join — the corpus never cross-joins the
   * eval set, and eval-side work is proportional to |eval|, not |corpus|.
   */
  def decontaminate(corpus: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, jaccardThreshold: Double = 0.8,
                    numHashes: Int = 64, bands: Int = 16,
                    shingleSize: Int = 5): DataFrame = {
    // ONE shared slim projection per side: sketching and gram verify
    // both read it instead of re-scanning the source tables
    val slimC = corpus.select(col(idCol), col(textCol)).lineageCut()
    val slimE = eval.select(col(idCol), col(textCol)).lineageCut()
    val cand = crossMinhashPairs(slimC, slimE, idCol, textCol, numHashes,
      bands, shingleSize, threshold = math.max(0.0, jaccardThreshold - 0.2))
      .select("id_a", "id_b")
    // verify against the union so both sides' grams resolve (ids must be
    // disjoint across corpora, as with any cross-corpus id space)
    val verified = verifyJaccard(cand, slimC.unionByName(slimE),
      idCol, textCol, shingleSize)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a").as("__contaminated"))
      .distinct()
    corpus.join(verified, col(idCol) === col("__contaminated"), "left_anti")
  }

  /**
   * Exact repeated-SPAN removal — token-level substring dedup (the Lee
   * et al. 2022 "Deduplicating Training Data Makes Language Models
   * Better" semantic, word- instead of BPE-token granularity): every
   * `spanTokens`-token span whose lowercased content already occurred
   * EARLIER in the corpus (global (id, position) order; first occurrence
   * wins) is removed from the later document, with overlapping repeated
   * spans merged before cutting. The stride-1 scan catches repeats at
   * ANY alignment — [[dedupChunks]]' fixed windows miss a copy shifted
   * by one token; this does not.
   *
   * Scale shape: the gram frame is one row per TOKEN (id, pos,
   * 8-byte xxhash of the span) — ~16 bytes × corpus tokens through one
   * shuffle keyed by span hash (the honest cost of alignment-free
   * substring dedup; Lee et al. build a distributed suffix array for the
   * same movement). Interval merging is a per-doc window over only the
   * DUPLICATED spans; the rebuild slices the gaps between the merged
   * disjoint intervals — O(tokens + intervals) per doc. 64-bit span-hash
   * collisions are the only approximation (same trade as
   * [[ngramOverlapFlags]]); the oracle groups by the span STRING.
   * Output adds `removed_tokens` (covered-position count, computed from
   * the intervals — exact on any input) and `clean_text` (verbatim for
   * untouched docs; single-space re-joined where spans were cut).
   * Tokenization parity with a SQL replica assumes whitespace-normalized
   * text (the suite-wide `\s+`/trim contract).
   */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          spanTokens: Int): DataFrame = {
    require(spanTokens >= 2, "spans need at least 2 tokens")
    val reserved = df.columns.filter(c => c.startsWith("__") || c == "clean_text"
      || c == "removed_tokens")
    require(reserved.isEmpty,
      s"column names reserved here: ${reserved.toSet} — rename first")
    import org.apache.spark.sql.expressions.Window
    val grams = df.select(col(idCol),
        posexplode(graft.functions.Text.wordNgrams(col(textCol), spanTokens))
          .as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"), xxhash64(col("__g")).as("__h"))
    val firstW = Window.partitionBy(col("__h"))
      .orderBy(col(idCol).asc, col("__pos").asc)
    val covered = grams
      .withColumn("__rk", row_number().over(firstW))
      .filter(col("__rk") > 1)
      .select(col(idCol), col("__pos").as("__s"),
        (col("__pos") + spanTokens).as("__e"))
    // merge overlapping/adjacent intervals per doc (classic running-max
    // sweep) so the rebuild tests each token against few disjoint ranges
    val mW = Window.partitionBy(col(idCol)).orderBy(col("__s").asc, col("__e").asc)
    val prevMax = max(col("__e")).over(mW.rowsBetween(Window.unboundedPreceding, -1))
    val merged = covered
      .withColumn("__ng", when(col("__s") > coalesce(prevMax, lit(-1)), 1)
        .otherwise(0))
      .withColumn("__grp",
        sum(col("__ng")).over(mW.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(idCol), col("__grp"))
      .agg(min("__s").as("s"), max("__e").as("e"))
    val ivs = merged.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__ivs"),
        sum(col("e") - col("s")).as("removed_tokens"))
    // rebuild by slicing out the GAPS between the sorted disjoint
    // intervals — O(tokens + intervals) per doc (a per-token membership
    // test against the interval list would be O(tokens × intervals));
    // `removed_tokens` comes from the intervals themselves, so it is
    // exact regardless of any tokenization quirk in the rebuild.
    // Contract: clean_text of an untouched document is the verbatim
    // input; a trimmed document comes back single-space re-joined.
    df.join(ivs, Seq(idCol), "left")
      .withColumn("removed_tokens", coalesce(col("removed_tokens"), lit(0L)))
      .withColumn("clean_text", {
        val t = TextAnalysis.tokens(col(textCol))
        val gapStarts = concat(array(lit(0)),
          transform(col("__ivs"), iv => iv.getField("e")))
        val gapEnds = concat(transform(col("__ivs"), iv => iv.getField("s")),
          array(size(t)))
        when(col("__ivs").isNull, col(textCol)).otherwise(
          array_join(flatten(zip_with(gapStarts, gapEnds,
            (gs, ge) => slice(t, gs + 1, greatest(ge - gs, lit(0))))), " "))
      })
      .drop("__ivs")
  }

  /**
   * Incremental corpus admission — the daily-crawl-drop workflow: admit
   * only `delta` documents that are near-duplicates of NEITHER the
   * already-kept `corpus` NOR an earlier-kept delta document. Composes
   * [[decontaminate]] with roles swapped (delta is screened against the
   * corpus — work scales with |delta|, never re-deduping the corpus) and
   * [[dedupe]] within the survivors. Run per drop; the admitted rows
   * append to the corpus for the next drop. Ids must be disjoint across
   * the two frames (the standard cross-corpus contract — the merged
   * candidate frame relies on it).
   */
  def admitDelta(corpus: DataFrame, delta: DataFrame, idCol: String,
                 textCol: String, jaccardThreshold: Double = 0.85,
                 numHashes: Int = 64, bands: Int = 16,
                 shingleSize: Int = 5): DataFrame = {
    // ONE delta sketch and ONE verification pass serve both stages.
    // Composing decontaminate ∘ dedupe ran minhash_sig over the delta
    // twice, two candidate distinct() shuffles, and two verifyJaccard
    // pipelines (2 lineage-cut jobs each) — at bench scale the job
    // COUNT, not the data, was the measured top fixed cost. Per-pair
    // predicates (signature estimate, exact Jaccard) commute with the
    // survivor restriction, so within-delta candidates are generated over
    // the WHOLE delta, verified together with the cross-corpus pairs, and
    // restricted to survivors afterwards — identical output to the old
    // two-stage composition.
    val candMargin = math.max(0.0, jaccardThreshold - 0.2) // recall margin
    // shared slim projections: sketch + verify read these, not the source
    val slimD = delta.select(col(idCol), col(textCol)).lineageCut()
    val slimC = corpus.select(col(idCol), col(textCol)).lineageCut()
    val sigD = sketchFrame(slimD, idCol, textCol, numHashes, bands, shingleSize)
    val sigC = sketchFrame(slimC, idCol, textCol, numHashes, bands, shingleSize)
    val bandedD = bandFrame(sigD)
    val estAgree = graft.functions.Text.sigAgree(col("__sig_a"), col("__sig_b"))
      .cast("double") / numHashes

    // candidates, both kinds in one frame: delta×corpus (screening) and
    // delta×delta (within-drop dedupe); ids are disjoint across corpora
    // (the documented cross-corpus contract), so the branch tag survives
    // the shared distinct and the shared sig joins below
    val candX = bandedD.as("a").join(bandFrame(sigC).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(true).as("__cross"))
    val candD = bandedD.as("a").join(bandedD.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(false).as("__cross"))
    val sigAll = sigD.unionByName(sigC)
    val cand = candX.unionByName(candD).distinct() // one shuffle, not two
      .join(sigD.select(col("id").as("id_a"), col("sig").as("__sig_a")), "id_a")
      .join(sigAll.select(col("id").as("id_b"), col("sig").as("__sig_b")), "id_b")
      .filter(estAgree >= candMargin)
      .select("id_a", "id_b", "__cross")

    // one exact-Jaccard verification over the union doc set; the __cross
    // tag rides through verifyJaccard's candidate checkpoint
    val verified = verifyJaccard(cand, slimD.unionByName(slimC),
        idCol, textCol, shingleSize)
      .filter(col("jaccard") >= jaccardThreshold)
      .lineageCut() // referenced three times below
    val contaminated = verified.filter(col("__cross"))
      .select(col("id_a").as("id")).distinct()
      .lineageCut() // referenced four times below
    // within-delta dup edges among SURVIVORS only (both endpoints clean) —
    // exactly the pair set dedupe(fresh) would have generated
    val verifiedD = verified.filter(!col("__cross"))
      .join(contaminated.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .join(contaminated.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
      .select("id_a", "id_b")
    val survivorIds = sigD.select(col("id"))
      .join(contaminated, Seq("id"), "left_anti")
    val keep = assignCanonical(survivorIds, verifiedD)
      .filter(col("id") === col("canonical_id"))
      .select(col("id").as("__admit_id"))
    delta.join(keep, col(idCol) === col("__admit_id"), "left_semi")
  }

  /**
   * Word-n-gram overlap decontamination (the "13-gram check" of LLM
   * training-data hygiene, n configurable): flag every corpus document
   * sharing at least `minOverlap` distinct word n-grams with ANY eval
   * document. Unlike the whole-document LSH path ([[decontaminate]]),
   * this catches PARTIAL containment — an eval passage quoted inside an
   * otherwise-novel document.
   *
   * Scale shape: grams travel as 64-bit hashes (never strings); the eval
   * side reduces to its distinct gram-hash set (O(|eval| · grams/doc) —
   * eval sets are small by construction) and broadcast-joins against the
   * corpus gram stream; the per-doc overlap count is a partial-aggregated
   * groupBy. The corpus is streamed once, nothing corpus-sized shuffles
   * except the (doc, matched-gram) hits.
   *
   * Returns (idCol, overlap) for flagged docs only.
   */
  def ngramOverlapFlags(corpus: DataFrame, eval: DataFrame, idCol: String,
                        textCol: String, n: Int = 13,
                        minOverlap: Int = 1): DataFrame = {
    def gramHashes(df: DataFrame, withId: Boolean): DataFrame = {
      val base = df.select(
        (if (withId) Seq(col(idCol)) else Seq.empty) :+
          explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__gram"): _*)
      base.withColumn("__gh", xxhash64(col("__gram"))).drop("__gram")
    }
    val evalGrams = gramHashes(eval, withId = false).distinct()
    gramHashes(corpus, withId = true)
      .dropDuplicates(idCol, "__gh") // distinct grams per doc
      .join(broadcast(evalGrams), "__gh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /**
   * Canonical-representative assignment over near-dup pairs: iterative
   * min-label propagation (connected components on the dup graph, log-n
   * rounds bounded by `maxIter`). Returns (id, canonical_id).
   *
   * Dup graphs are a vanishing fraction of any deduped corpus, so up to
   * `maxDriverEdges` directed edge rows the components are solved in ONE
   * collect + union-find on the driver (exactly the component-min labels
   * the converged loop yields) instead of log-n shuffle rounds each
   * paying a state checkpoint — at bench scale the rounds, not the data,
   * are the cost. Above the threshold (≈32 MB of edge rows at the
   * default) the distributed loop runs unchanged; pass 0 to force it.
   */
  def assignCanonical(ids: DataFrame, pairs: DataFrame, maxIter: Int = 10,
                      broadcastEdges: Boolean = true,
                      maxDriverEdges: Long = 2L << 20): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    // dup-free corpus: every doc is its own canonical — skip the loop
    // (and its per-round jobs) entirely. The count doubles as the
    // driver-path size gate (one job either way).
    val edgeCount = edges.count()
    if (edgeCount == 0L) {
      edges.unpersist()
      return ids.select(col("id"), col("id").as("canonical_id"))
    }
    def maybeBc(df: DataFrame): DataFrame = if (broadcastEdges) broadcast(df) else df
    // the driver path works in the long domain; any other id type
    // (string/int-keyed graphs were always legal here) stays on the
    // loop, which also keeps the output label type identical per input
    val longIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && maxDriverEdges > 0 && edgeCount <= maxDriverEdges) {
      // driver union-find: component-min labels, identical to the
      // converged propagation result, zero iterative rounds
      val spark = ids.sparkSession
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      edges.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // union by MIN root: every tree's root stays its component's
        // minimum, so find() IS the canonical id
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val verts = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
      val labels = maybeBc(verts.iterator.map(v => (v, find(v))).toSeq
        .toDF("id2", "__cc"))
      return ids.join(labels, col("id") === col("id2"), "left")
        .select(col("id"), coalesce(col("__cc"), col("id")).as("canonical_id"))
    }
    // the label-propagation loop only needs the vertices that touch an
    // edge — in a dup graph a vanishing fraction of the corpus; every
    // other doc is trivially its own canonical and never enters a round.
    // All per-round frames (labels, neighborMin, the fixpoint aggregate)
    // are therefore O(|dup-graph|), not O(corpus).
    val edgeVerts = edges.select(col("src").as("id")).distinct()
    var labels = ids.join(maybeBc(edgeVerts), Seq("id"), "left_semi")
      .select(col("id"), col("id").as("canonical_id"))
    // Labels only ever decrease under min-propagation, so the label sum is
    // a fixpoint witness: unchanged sum ⇔ converged. One aggregate per
    // round instead of a self-join diff.
    var prevSum: Option[java.math.BigDecimal] = None
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // dup-pair graphs are usually sparse: edges (and thus neighborMin)
      // are tiny next to the corpus — broadcast them so the big label
      // frame is never shuffled inside the loop; disable for dense graphs
      // that exceed broadcast limits (falls back to shuffle joins)
      val neighborMin = maybeBc(edges).join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min("canonical_id").as("nmin"))
      val updated = labels.join(maybeBc(neighborMin), labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("canonical_id"), coalesce(col("nmin"), col("canonical_id")))
            .as("canonical_id"))
      labels = updated.lineageCut() // truncate the iterative lineage
      val s = labels.agg(sum(col("canonical_id")).cast("decimal(38,0)")).head()
        .getDecimal(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      iter += 1
    }
    // docs outside the dup graph: identity labels, never looped over
    val untouched = ids.join(maybeBc(edgeVerts), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("canonical_id"))
    edges.unpersist()
    labels.unionByName(untouched)
  }

  /**
   * Exact edit-distance verification of near-dup CANDIDATE pairs — the
   * strictest verifier in the candidate→verify family (Jaccard and
   * signature agreement tolerate reorderings; Levenshtein counts every
   * insertion/deletion/substitution). `pairs` carries `(id_a, id_b)`
   * from any candidate generator (MinHash bands, winnowing-hash
   * collisions, URL groups); texts attach via two 8-byte-id joins, and
   * the BANDED `levenshtein(l, r, threshold)` kernel stops each pair at
   * O(len·maxDist) instead of O(len²) — pairs beyond `maxDist` report
   * `edit_dist` NULL and `is_dup` false without computing the full
   * matrix.
   *
   * Output: `(id_a, id_b, edit_dist, is_dup)`. The contract mirrors
   * [[verifyJaccard]]: the candidate set is assumed band-bounded (the
   * generators here never emit unblocked all-pairs), so the text
   * movement is ∝ candidates, not corpus².
   */
  def verifyEditDistance(docs: DataFrame, idCol: String, textCol: String,
                         pairs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = docs.select(col(idCol).cast("long").as("id_a"),
      col(textCol).as("__text_a"))
    val b = docs.select(col(idCol).cast("long").as("id_b"),
      col(textCol).as("__text_b"))
    // hash-distribute the ids-only candidate frame on the first join
    // key BEFORE texts attach: the banded kernel is O(len·maxDist) per
    // pair — by far the operator's dominant cost — and when the docs
    // side broadcasts, the join would otherwise inherit the candidate
    // generator's partitioning (a single split for small inputs, one
    // core doing every matrix). The exchange moves 16-byte id pairs
    // (the same exchange a non-broadcast id_a equi-join needs anyway),
    // priced orders of magnitude below the kernel it parallelizes.
    val parts = pairs.sparkSession.sessionState.conf.numShufflePartitions
    pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .repartition(parts, col("id_a"))
      .join(a, Seq("id_a"))
      .join(b, Seq("id_b"))
      // banded kernel returns -1 past the threshold → NULL via nullif
      .withColumn("edit_dist",
        nullif(levenshtein(col("__text_a"), col("__text_b"), maxDist),
          lit(-1)))
      .withColumn("is_dup", col("edit_dist").isNotNull)
      .select(col("id_a"), col("id_b"), col("edit_dist"), col("is_dup"))
  }

  /**
   * Candidate-pair verification by Jaro-Winkler similarity — the
   * record-linkage comparator (Winkler 1990): transposition-tolerant
   * and prefix-weighted, the right verifier for short identifier-like
   * keys (names, titles, hosts) where Levenshtein over-charges block
   * moves. Same movement contract as [[verifyEditDistance]]: texts
   * attach to the (id_a, id_b) candidate frame via two 8-byte-id
   * equi-joins, the codegen'd
   * [[org.apache.spark.sql.graft.JaroWinklerSim]] kernel scores each
   * pair inside whole-stage codegen (no UDF hop), and total movement is
   * ∝ candidates, never corpus².
   *
   * Returns (`id_a`, `id_b`, `jw_sim` 6dp, `is_dup` = jw_sim ≥
   * `minSim`). The 6dp rounding happens BEFORE the threshold compare,
   * so the flag is a pure function of the reported score.
   */
  def verifyJaroWinkler(docs: DataFrame, idCol: String, textCol: String,
                        pairs: DataFrame, minSim: Double): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0,
      s"minSim must be in [0, 1]; got $minSim")
    val a = docs.select(col(idCol).cast("long").as("id_a"),
      col(textCol).as("__text_a"))
    val b = docs.select(col(idCol).cast("long").as("id_b"),
      col(textCol).as("__text_b"))
    pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .join(a, Seq("id_a"))
      .join(b, Seq("id_b"))
      .withColumn("jw_sim", round(
        org.apache.spark.sql.graft.StringSimilarityFunctions
          .jaroWinklerSim(col("__text_a"), col("__text_b")), 6))
      .withColumn("is_dup", col("jw_sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("jw_sim"), col("is_dup"))
  }

  /**
   * Sorted-neighborhood record linkage (Hernández & Stolfo 1995): sort
   * the corpus by a blocking key, compare each record only against its
   * `window` successors in that order, verify candidates with
   * Jaro-Winkler. THE classic entity-resolution blocking strategy for
   * name/address-shaped keys, where near-duplicates land adjacent
   * under lexicographic order (typos past the first characters,
   * suffix variants) but token-set methods see unrelated strings.
   * Complements [[verifyJaroWinkler]] (which verifies caller-supplied
   * pairs): this GENERATES the candidate pairs, w·n of them instead
   * of n².
   *
   * Scale shape: ranks come from [[Ranking.withGlobalRank]] — a range
   * shuffle + chunk-offset stitch, NO single-partition window — and
   * the (id, key, rank) frame is lineage-cut once for both sides of
   * the neighbor join. Candidates materialize as an exact-integer
   * `sequence(r+1, r+w)` explode equi-joined back on rank (keys-only
   * w-fold expansion; ranks are unique so the join cannot fan out);
   * the Jaro-Winkler verify runs on the candidate rows only, inside
   * codegen. One rank exchange + one w× keys exchange, total.
   *
   * Returns (`id_a`, `id_b`, `jw_sim` 6dp) for candidates at or above
   * `minSim`, where `id_a` precedes `id_b` in (key, id) order. NULL
   * keys are excluded (they sort nowhere).
   */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
                              window: Int = 5,
                              minSim: Double = 0.9): DataFrame = {
    require(window >= 1 && window <= 100,
      s"window must be in [1, 100]; got $window")
    require(minSim >= 0.0 && minSim <= 1.0,
      s"minSim must be in [0, 1]; got $minSim")
    // scratch names stay OUT of withGlobalRank's reserved __ space
    val base = df.filter(col(keyCol).isNotNull)
      .select(col(idCol).cast("long").as("sn_id"),
        col(keyCol).cast("string").as("sn_key"))
    val ranked = Ranking.withGlobalRank(base,
        Seq(col("sn_key").asc, col("sn_id").asc), "sn_r", "sn_n")
      .select("sn_id", "sn_key", "sn_r")
      .lineageCut() // probe side + build side of the neighbor join
    val probes = ranked.select(col("sn_id").as("id_a"),
      col("sn_key").as("sn_ka"),
      explode(sequence(col("sn_r") + 1, col("sn_r") + window)).as("sn_r2"))
    val targets = ranked.select(col("sn_id").as("id_b"),
      col("sn_key").as("sn_kb"), col("sn_r").as("sn_r2"))
    probes.join(targets, "sn_r2")
      .withColumn("jw_sim", round(
        org.apache.spark.sql.graft.StringSimilarityFunctions
          .jaroWinklerSim(col("sn_ka"), col("sn_kb")), 6))
      .filter(col("jw_sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("jw_sim"))
  }

  /**
   * EXACT edit-distance similarity self-join via q-gram prefix
   * filtering (Gravano et al. 2001 approximate string joins; Ed-Join —
   * Xiao, Wang & Lin, VLDB 2008): every unordered pair of keys with
   * Levenshtein distance ≤ `maxDist`, with the exact distance — no
   * missed pairs. The edit-metric complement of
   * [[similarityJoinExact]]'s set-Jaccard join: use this when
   * "duplicate" means typo-level character edits (identifiers, titles,
   * normalized URLs), not token overlap.
   *
   * Completeness argument (the scheme the brute-force oracle
   * cross-checks): one edit changes at most `q` of a string's q-grams,
   * so ED ≤ d bounds BOTH multiset differences by q·d, and distinct-set
   * differences are no larger. Order all grams by one global total
   * order (df asc, gram asc — rarest first) and keep each key's
   * `q·d + 1` smallest distinct grams as its prefix. If two prefixes
   * were disjoint, the one whose prefix-max is smaller lies entirely
   * outside the other STRING's gram set (any shared gram ≤ the other's
   * prefix-max would have to appear in that prefix), forcing a set
   * difference ≥ q·d + 1 — contradiction. The one unguarded case is
   * BOTH keys having ≤ q·d distinct grams (their prefixes are their
   * whole gram sets and may legitimately share nothing): those short
   * keys additionally carry a sentinel signature so short×short pairs
   * still meet; short×long pairs are already covered through the long
   * side's full-length prefix (its q·d+1 grams cannot all miss a string
   * within distance d).
   *
   * Scale shape: the gram-df census is one map-side-combined aggregate;
   * the global order attaches by a gram-keyed join and each key sorts
   * only ITS OWN grams (per-gram work, never per-pair). The candidate
   * equi-join runs on prefix grams only — by construction the RAREST
   * grams in each key, so per-key fan-out is bounded by rare-gram
   * document frequencies; a length filter (|len_a − len_b| ≤ d is
   * forced by ED ≤ d) prunes before verification, and the banded
   * `levenshtein(a, b, maxDist)` kernel (O(len·d), early-exit) verifies
   * survivors attached via 8-byte-id joins. The sentinel bucket is the
   * one potentially hot join key — its fan-out is (#short-keys)², so
   * corpora dominated by keys under ~q·(d+1) chars should raise `q`…
   * or accept that at those lengths everything is within d edits of
   * everything and the OUTPUT is quadratic by data.
   *
   * CHOOSING q (the scale knob — exactness never depends on it):
   * candidate volume ≈ Σ_grams df_prefix², and prefix occurrences
   * spread over at most |Σ|^q possible grams, so the join stays lean
   * only while |Σ|^q ≫ n·(q·d+1). Measured cliff (SCALING.md): q = 2
   * over 17-char-alphabet keys (289 possible grams) ran 147 s at just
   * 80k keys — 4× keys cost 16× — while q = 4 over the same corpus is
   * flat-linear. Rule of thumb: q ≥ log_|Σ|(corpus size) + 1; longer
   * grams trade a longer prefix (q·d+1 rows per key) for exponentially
   * more selective posting lists, the right trade everywhere past toy
   * corpora.
   *
   * Returns (`id_a`, `id_b`, `edit_dist`) with `id_a` < `id_b` for
   * pairs at distance ≤ `maxDist`. NULL keys are excluded.
   */
  def editDistancePairs(df: DataFrame, idCol: String, keyCol: String,
                        maxDist: Int = 2, q: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative; got $maxDist")
    require(q >= 2 && q <= 8, s"q must be in [2, 8]; got $q")
    val pLen = q * maxDist + 1
    val keys = df.filter(col(keyCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(keyCol).cast("string").as("k"))
      .lineageCut() // feeds the gram stage AND both verify joins
    // distinct q-grams per key (sets stay sound — see scaladoc)
    val gramArr = keys.select(col("id"), array_distinct(expr(
      s"transform(sequence(1, greatest(length(k) - ${q - 1}, 0)), " +
        s"i -> substring(k, i, $q))")).as("gs"))
    val dfreq = gramArr.select(explode(col("gs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("gdf"))
    val ordered = gramArr.select(col("id"), explode(col("gs")).as("g"))
      .join(dfreq, "g")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("gdf"), col("g"))))
        .as("__ord"))
      .select(col("id"),
        slice(expr("transform(__ord, x -> x.g)"), 1, pLen).as("__pre"),
        size(col("__ord")).as("__ng"))
    // zero-gram keys (len < q) never reach `ordered` — the left join
    // restores them with an empty prefix, and the sentinel rule below
    // (ng ≤ q·d covers ng = 0) gives them their signature
    val pref = keys.join(ordered, Seq("id"), "left")
      .select(col("id"), length(col("k")).as("__len"),
        when(col("__ng").isNotNull, col("__pre"))
          .otherwise(array().cast("array<string>")).as("__pre"),
        coalesce(col("__ng"), lit(0)).as("__ng"))
      .withColumn("__pre",
        when(col("__ng") <= q * maxDist,
          concat(col("__pre"), array(lit("\u0000short"))))
          .otherwise(col("__pre")))
      .select("id", "__len", "__pre")
      .lineageCut() // both sides of the candidate join
    val pa = pref.select(col("id").as("id_a"), col("__len").as("__la"),
      explode(col("__pre")).as("g"))
    val pb = pref.select(col("id").as("id_b"), col("__len").as("__lb"),
      explode(col("__pre")).as("g"))
    val cand = pa.join(pb, Seq("g"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select("id_a", "id_b").distinct()
    cand
      .join(keys.select(col("id").as("id_a"), col("k").as("__ka")), "id_a")
      .join(keys.select(col("id").as("id_b"), col("k").as("__kb")), "id_b")
      .withColumn("edit_dist",
        nullif(levenshtein(col("__ka"), col("__kb"), maxDist), lit(-1)))
      .filter(col("edit_dist").isNotNull)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
   * algorithm): from each document's word `k`-gram hash sequence, every
   * window of `w` consecutive grams contributes its minimum hash
   * (leftmost occurrence on ties), deduped. The GUARANTEE plain
   * mod-p gram sampling cannot give: any shared run of ≥ `w + k − 1`
   * tokens between two documents contains a full shared window, whose
   * minimum hash is selected in BOTH — so every sufficiently long copy
   * is caught by a fingerprint-hash join, with ~2/(w+1) of grams kept.
   *
   * Output: `(idCol, fp_hash, fp_pos)` — the selected gram's 16-hex-char
   * md5 prefix and its gram position. Join on `fp_hash` for candidate
   * pairs (positions are doc-local). Documents shorter than `w` grams
   * contribute their global minimum (one truncated window); documents
   * with fewer than `k` tokens contribute nothing.
   *
   * Scale shape: grams reduce to (id, pos, 22-byte key) BEFORE the
   * shuffle; one shuffle on doc id + per-doc sort by pos (the inherent
   * cost of positional windows — same shape as sequence packing); the
   * md5/lpad key construction is engine-portable, so the SQL replica
   * selects the identical fingerprint set.
   */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k > 0, "k (gram size) must be positive")
    require(w > 0, "w (window size) must be positive")
    import org.apache.spark.sql.expressions.Window
    // key = hash || zero-padded pos: min() compares the hash first, the
    // position only on ties — "leftmost occurrence of the window min"
    val keyed = df
      .select(col(idCol),
        posexplode(graft.functions.Text.wordNgrams(col(textCol), k)))
      .select(col(idCol), col("pos"),
        concat(substring(md5(col("col")), 1, 16),
          lpad(col("pos").cast("string"), 9, "0")).as("__key"))
    // both windows share (partition, order) so they compile into ONE
    // Window operator over ONE sort — grams are dense 0..g−1, so the
    // doc's gram count is max(pos)+1 from the same ordered pass
    val ordered = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val frame = ordered.rowsBetween(Window.currentRow, w - 1)
    val full = ordered.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    keyed
      .withColumn("__g", max(col("pos")).over(full) + 1)
      .withColumn("__fp", min(col("__key")).over(frame))
      .filter(col("pos") <= greatest(col("__g") - w, lit(0)))
      .select(col(idCol), col("__fp")).distinct()
      .select(col(idCol),
        substring(col("__fp"), 1, 16).as("fp_hash"),
        substring(col("__fp"), 17, 9).cast("int").as("fp_pos"))
  }

  /**
   * Fellegi-Sunter record-linkage weights (Fellegi & Sunter 1969 — the
   * probabilistic-linkage classic behind every modern ER engine): from
   * a LABELED pair sample (`matchCol` boolean) and K boolean agreement
   * indicators (name-similarity cut, same-postcode, …), estimate per
   * field k the conditional agreement rates m_k = P(agree | match) and
   * u_k = P(agree | non-match), and the log-likelihood-ratio weights
   * w⁺ = ln(m/u) (agreement) and w⁻ = ln((1−m)/(1−u)) (disagreement)
   * that [[fellegiSunterScore]] sums per candidate pair. Blocking
   * ([[sortedNeighborhoodPairs]], [[minhashPairs]]) proposes the
   * pairs; this scores them.
   *
   * EXACTNESS: all four cells per field are exact longs from ONE
   * aggregate pass; rates use deterministic add-half smoothing
   * m = (a + 0.5)/(n + 1) (the PSI convention — a zero cell must not
   * produce ±∞ weights); each weight is one ln of an exact-integer-
   * derived double ratio, 6dp. NULL indicator values count as
   * DISAGREEMENT (stated: an unverifiable field is evidence against,
   * the standard conservative convention).
   *
   * Scale shape: one map-side-combined aggregate over the labeled
   * sample (2K sums + 2 counts), a K-row stack. Nothing else moves.
   *
   * Returns one row per field, in `agreeCols` order: (`field`,
   * `n_match`, `agree_match`, `n_unmatch`, `agree_unmatch`, `m`, `u`,
   * `w_agree`, `w_disagree`), rates/weights 6dp.
   */
  def fellegiSunterWeights(labeled: DataFrame, matchCol: String,
                           agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement field")
    require(agreeCols.size <= 64, s"more than 64 fields: ${agreeCols.size}")
    val missing = agreeCols.filterNot(labeled.columns.contains)
    require(missing.isEmpty, s"fields not in the frame: $missing")
    val base = labeled.filter(col(matchCol).isNotNull)
      .select(col(matchCol).cast("boolean").as("__m") +:
        agreeCols.zipWithIndex.map { case (c, i) =>
          (col(c).cast("boolean") <=> lit(true)).as(s"__a$i")
        }: _*)
    val aggs =
      Seq(sum(when(col("__m"), 1L).otherwise(0L)).as("__nm"),
        sum(when(!col("__m"), 1L).otherwise(0L)).as("__nu")) ++
      agreeCols.indices.flatMap { i =>
        Seq(sum(when(col("__m") && col(s"__a$i"), 1L).otherwise(0L))
            .as(s"__am$i"),
          sum(when(!col("__m") && col(s"__a$i"), 1L).otherwise(0L))
            .as(s"__au$i"))
      }
    // TYPED melt (explode of array-of-struct), never string SQL: a field
    // name is caller data — interpolating it into a selectExpr stack
    // would break on quotes and is an expression-injection surface
    val melt = explode(array(agreeCols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("field"), col(s"__am$i").as("agree_match"),
        col(s"__au$i").as("agree_unmatch"))
    }: _*)).as("__f")
    val m = (col("agree_match").cast("double") + 0.5) /
      (col("n_match").cast("double") + 1.0)
    val u = (col("agree_unmatch").cast("double") + 0.5) /
      (col("n_unmatch").cast("double") + 1.0)
    base.agg(aggs.head, aggs.tail: _*)
      .select(col("__nm"), col("__nu"), melt)
      .select(col("__nm"), col("__nu"), col("__f.field").as("field"),
        col("__f.agree_match").as("agree_match"),
        col("__f.agree_unmatch").as("agree_unmatch"))
      .select(col("field"),
        coalesce(col("__nm"), lit(0L)).as("n_match"),
        coalesce(col("agree_match"), lit(0L)).as("agree_match"),
        coalesce(col("__nu"), lit(0L)).as("n_unmatch"),
        coalesce(col("agree_unmatch"), lit(0L)).as("agree_unmatch"))
      .select(col("field"), col("n_match"), col("agree_match"),
        col("n_unmatch"), col("agree_unmatch"),
        round(m, 6).as("m"), round(u, 6).as("u"),
        round(log(m / u), 6).as("w_agree"),
        round(log((lit(1.0) - m) / (lit(1.0) - u)), 6).as("w_disagree"))
  }

  /**
   * Score candidate pairs with [[fellegiSunterWeights]] output: per
   * pair, Σ over fields of w⁺ (field agrees) or w⁻ (disagrees/NULL) —
   * the Fellegi-Sunter composite log-likelihood ratio; threshold it
   * high/low/clerical-review per the 1969 decision rule.
   *
   * DETERMINISM: the K per-field weights arrive as a broadcast K-row
   * frame pivoted onto the pair rows, and the sum is a FIXED
   * left-to-right fold in `agreeCols` order (the rrfFuse contract —
   * never an unordered aggregate over field rows), 6dp. Scale shape:
   * one broadcast join + a codegen'd per-row chain; the pair frame
   * never shuffles.
   */
  def fellegiSunterScore(pairs: DataFrame, weights: DataFrame,
                         agreeCols: Seq[String],
                         scoreCol: String = "fs_score"): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement field")
    require(!pairs.columns.contains(scoreCol),
      s"output column $scoreCol already exists in the frame")
    val w = weights.select("field", "w_agree", "w_disagree")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val missing = agreeCols.filterNot(w.contains)
    require(missing.isEmpty, s"fields without weights: $missing")
    val score = agreeCols.map { c =>
      when(col(c).cast("boolean") <=> lit(true), lit(w(c)._1))
        .otherwise(lit(w(c)._2))
    }.reduceLeft(_ + _)
    pairs.withColumn(scoreCol, round(score, 6))
  }

  /**
   * MinHash LSH banding planner — the s-curve P(candidate | sim = s)
   * = 1 − (1 − s^rows)^bands (Leskovec, Rajaraman & Ullman, MMDS
   * ch. 3) tabulated over a similarity grid, plus the curve's
   * threshold ≈ (1/b)^(1/r): pick `bands`/`rowsPerBand` BEFORE paying
   * a full [[minhashPairs]] run by reading where the curve crosses
   * the recall you need. Pure arithmetic — this is the planning table
   * the signature-length knobs should be chosen from, not a data
   * pass.
   *
   * DETERMINISM: the grid is s = i/gridSteps for i = 1..gridSteps−1
   * (one exact-integer division each); the integer powers UNROLL to
   * left-associated multiplication chains — never a libm pow, whose
   * engines disagree in the last ulp — so every probability is a
   * fixed IEEE chain, 6dp. The threshold estimate is the one libm
   * exception (fractional power), exp(ln(1/b)/r) on the established
   * ln precedent, 6dp.
   *
   * Returns one row per grid point: (`s`, `p_candidate`,
   * `threshold_est` — constant across rows).
   */
  def minhashPlan(spark: org.apache.spark.sql.SparkSession,
                  bands: Int, rowsPerBand: Int,
                  gridSteps: Int = 20): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1, "bands/rowsPerBand >= 1")
    require(bands <= 512 && rowsPerBand <= 64,
      "unrolled powers cap at 512 bands x 64 rows")
    require(gridSteps >= 2 && gridSteps <= 1000,
      "gridSteps must be in [2, 1000]")
    import spark.implicits._
    val grid = (1 until gridSteps).map(_.toLong).toDF("i")
    val s = col("i").cast("double") / gridSteps.toDouble
    def ipow(base: Column, e: Int): Column =
      (1 until e).foldLeft(base)((acc, _) => acc * base)
    val pBand = ipow(s, rowsPerBand)
    val pCand = lit(1.0) - ipow(lit(1.0) - pBand, bands)
    val thr = math.exp(math.log(1.0 / bands) / rowsPerBand)
    grid.select(round(s, 6).as("s"), round(pCand, 6).as("p_candidate"),
      lit(BigDecimal(thr).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).as("threshold_est"))
  }

  /**
   * Choose the banding for a target Jaccard threshold from a
   * `numHashes` signature budget — [[minhashPlan]]'s argmin as a
   * driver scalar: among the divisor splits r·b = numHashes the
   * planner picks the split whose s-curve threshold (1/b)^(1/r) sits
   * closest to `threshold`, ties breaking to the SMALLER band count
   * (larger r → steeper curve → fewer false positives at the same
   * signature budget). Pure arithmetic, no data pass — this is what
   * [[minhashPairsPlanned]] runs before paying the banding job.
   * Returns the number of BANDS (r = numHashes / bands).
   */
  def planBands(numHashes: Int, threshold: Double): Int = {
    require(numHashes >= 1 && numHashes <= 32768,
      s"numHashes must be in [1, 32768]: $numHashes")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1): $threshold")
    (1 to numHashes).filter(numHashes % _ == 0).minBy { b =>
      val r = numHashes / b
      val thr = math.exp(math.log(1.0 / b) / r)
      (math.abs(thr - threshold), b)
    }
  }

  /**
   * [[minhashPairs]] with the banding DERIVED from the target
   * threshold via [[planBands]] — the planner-default path: callers
   * state the Jaccard threshold they care about and the s-curve picks
   * (r, b) for them, instead of hand-tuning band counts whose implied
   * threshold they'd have to back-solve. Passing the same bands
   * explicitly to [[minhashPairs]] is bit-identical by construction
   * (this is one `require`-checked delegation, not a second pipeline);
   * the explicit-knob form remains for callers who want an
   * off-curve operating point.
   */
  def minhashPairsPlanned(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double, numHashes: Int = 64,
                          shingleSize: Int = 5,
                          maxBucketSize: Int = 0): DataFrame =
    minhashPairs(df, idCol, textCol, numHashes,
      planBands(numHashes, threshold), shingleSize, threshold,
      maxBucketSize)

  /**
   * Entity resolution closure: threshold scored candidate pairs
   * ([[fellegiSunterScore]] / [[fellegiSunterEM]]-weighted) into match
   * edges and take CONNECTED COMPONENTS as entity clusters — the
   * standard transitive-closure step every linkage pipeline ends with
   * (pairwise decisions alone leave A=B, B=C, A≠C inconsistencies;
   * the component is the entity). Returns one row per record that
   * appears in ≥ 1 passing edge: (`record_id`, `cluster_id` — the
   * component's min id, [[graft.operators.Graph.connectedComponents]]'
   * label contract — and `cluster_size`).
   *
   * Scale shape: the edge filter is a map-only pass; components run
   * the size-gated union-find / distributed-loop split of the Graph
   * operator; `cluster_size` is one component-keyed aggregate joined
   * back (cluster count is unbounded → a shuffle join, never a
   * broadcast). Records with no passing edge are singletons by
   * definition — callers who need them materialized can left-join
   * this output from the record frame and coalesce to self-ids.
   */
  def entityClusters(scored: DataFrame, idACol: String, idBCol: String,
                     scoreCol: String, threshold: Double,
                     maxIter: Int = 30): DataFrame = {
    val edges = scored.filter(col(scoreCol) >= threshold)
    val comps = Graph.connectedComponents(edges, idACol, idBCol, maxIter)
    val sizes = comps.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    comps.join(sizes, "component")
      .select(col("node").as("record_id"),
        col("component").as("cluster_id"), col("cluster_size"))
  }

  /**
   * UNSUPERVISED Fellegi-Sunter parameter estimation via EM over
   * comparison-vector patterns (Winkler 1988; the classical fit of the
   * Fellegi & Sunter 1969 mixture when no labeled pairs exist — the
   * realistic record-linkage regime). The K boolean agreement
   * indicators collapse each candidate pair to one of 2^K PATTERNS;
   * EM fits the two-class mixture (match prevalence `p`, per-field
   * agreement rates m_k / u_k) on the pattern COUNTS, so the E/M steps
   * cost O(2^K) driver arithmetic per iteration regardless of pair
   * count. NULL indicators count as disagreement (the
   * [[fellegiSunterWeights]] convention).
   *
   * DETERMINISM (cross-engine replayable): pattern counts are exact
   * longs from ONE map-side-combined aggregate; every E/M-step double
   * is a FIXED left-to-right fold — per-pattern class likelihoods
   * multiply in ascending field order, all pattern sums accumulate in
   * ascending pattern order — and the iteration count is fixed, never
   * a convergence test (a tolerance check would make the output
   * depend on float comparison behavior). EVERY M-step estimate (and
   * the final outputs) clamps to [0.000001, 0.999999] — a rate that
   * saturates to exactly 0/1 would zero both class likelihoods of its
   * unobserved patterns next iteration (0/0 posteriors) and must not
   * emit ±∞ log-weights either; outputs round 6dp. An identical
   * unrolled arithmetic chain is SQL-expressible, so a DuckDB oracle
   * replays the iterations bit-for-bit.
   *
   * Scale shape: one aggregate over the pair frame (the only
   * distributed work — pairs never move again), a ≤ 2^K-row collect
   * (K ≤ 16 enforced → ≤ 65536 rows), O(iters · 2^K · K) driver
   * flops. Label identity: the class whose initial rates sit closer
   * to the data's high-agreement component takes the `m` label —
   * with the default m0=0.9/u0=0.1 the match class is the
   * high-agreement one, the standard convention.
   *
   * Returns one row per field, in `agreeCols` order: (`field`, `m`,
   * `u`, `w_agree`, `w_disagree`, `p_match`), all 6dp (`p_match`
   * repeats the fitted prevalence on every row).
   */
  def fellegiSunterEM(pairs: DataFrame, agreeCols: Seq[String],
                      iters: Int = 5, pInit: Double = 0.5,
                      mInit: Double = 0.9, uInit: Double = 0.1): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement field")
    require(agreeCols.size <= 16,
      s"more than 16 fields (2^K patterns must stay driver-bounded): " +
        s"${agreeCols.size}")
    require(iters >= 1 && iters <= 100, "iters must be in [1, 100]")
    require(pInit > 0 && pInit < 1, "pInit must be in (0, 1)")
    require(mInit > 0 && mInit < 1 && uInit > 0 && uInit < 1,
      "mInit/uInit must be in (0, 1)")
    require(mInit != uInit,
      "mInit must differ from uInit (equal rates make the two classes " +
        "identical and EM cannot break the symmetry)")
    val missing = agreeCols.filterNot(pairs.columns.contains)
    require(missing.isEmpty, s"fields not in the frame: $missing")
    val k = agreeCols.size
    val pattern = agreeCols.zipWithIndex.map { case (c, i) =>
      when(col(c).cast("boolean") <=> lit(true), lit(1 << i)).otherwise(lit(0))
    }.reduceLeft(_ + _)
    val counts = pairs.groupBy(pattern.as("__pat"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nPat = 1 << k
    val c = Array.tabulate(nPat)(t => counts.getOrElse(t, 0L).toDouble)
    val total = (0 until nPat).foldLeft(0.0)((acc, t) => acc + c(t))
    require(total > 0, "no pairs with non-null pattern")
    // EM — every fold ascending, left-assoc (the SQL-mirror contract).
    // Every M-step estimate clamps to [1e-6, 1 − 1e-6]: a field that
    // collapses exactly to 0/1 (an all-null indicator, a saturated
    // class) would otherwise zero BOTH class likelihoods of its
    // unobserved patterns next iteration and poison the posteriors
    // with 0/0 = NaN.
    def clamp(x: Double): Double = math.min(math.max(x, 0.000001), 0.999999)
    var p = pInit
    var m = Array.fill(k)(mInit)
    var u = Array.fill(k)(uInit)
    for (_ <- 1 to iters) {
      val g = Array.tabulate(nPat) { t =>
        val pm = (0 until k).foldLeft(1.0) { (acc, i) =>
          acc * (if ((t & (1 << i)) != 0) m(i) else 1.0 - m(i))
        }
        val pu = (0 until k).foldLeft(1.0) { (acc, i) =>
          acc * (if ((t & (1 << i)) != 0) u(i) else 1.0 - u(i))
        }
        (p * pm) / ((p * pm) + ((1.0 - p) * pu))
      }
      val gsum = (0 until nPat).foldLeft(0.0)((acc, t) => acc + g(t) * c(t))
      val usum = (0 until nPat).foldLeft(0.0)((acc, t) =>
        acc + (1.0 - g(t)) * c(t))
      val mNew = Array.tabulate(k) { i =>
        clamp((0 until nPat).filter(t => (t & (1 << i)) != 0)
          .foldLeft(0.0)((acc, t) => acc + g(t) * c(t)) / gsum)
      }
      val uNew = Array.tabulate(k) { i =>
        clamp((0 until nPat).filter(t => (t & (1 << i)) != 0)
          .foldLeft(0.0)((acc, t) => acc + (1.0 - g(t)) * c(t)) / usum)
      }
      p = clamp(gsum / total)
      m = mNew
      u = uNew
    }
    // Spark round() semantics (exact-decimal HALF_UP), not rint — this
    // driver-side round must behave exactly like the engine round every
    // other oracle-gated 6dp output goes through
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark = pairs.sparkSession
    import spark.implicits._
    agreeCols.zipWithIndex.map { case (f, i) =>
      val (mc, uc) = (clamp(m(i)), clamp(u(i)))
      (f, r6(mc), r6(uc), r6(math.log(mc / uc)),
        r6(math.log((1.0 - mc) / (1.0 - uc))), r6(p))
    }.toDF("field", "m", "u", "w_agree", "w_disagree", "p_match")
  }

  /**
   * Blocking-scheme quality report (Christen 2012, "Data Matching",
   * ch. 4 metrics) — the evaluation loop for every candidate generator
   * in this file (sorted-neighborhood, MinHash bands, q-gram prefixes):
   * given the CANDIDATE pairs a blocking scheme proposed and a labeled
   * TRUTH pair set, report
   *   - `reduction_ratio` = 1 − |C| / (n(n−1)/2): how much of the
   *     quadratic comparison space the scheme avoided,
   *   - `pairs_completeness` = |C ∩ T| / |T|: the recall that bounds
   *     every downstream matcher (a true pair the blocker drops is
   *     gone forever), and
   *   - `pairs_quality` = |C ∩ T| / |C|: the precision proxy that
   *     prices the verification stage.
   * The classic tuning trade is RR vs PC; a scheme change that raises
   * one at the other's expense shows up here before a corpus pass is
   * wasted.
   *
   * EXACTNESS: both pair sets canonicalize to unordered (least,
   * greatest) keys and DISTINCT (a pair proposed by two bands counts
   * once — stated); all three counts are exact longs (the total-pair
   * denominator in DECIMAL(38,0) — n(n−1)/2 bursts a long past n ≈
   * 4.3·10⁹); each metric is one IEEE division rounded 6dp. Self-pairs
   * (a = b) are dropped from both sets (stated).
   *
   * Scale shape: two keys-only distinct aggregates + ONE equi-join on
   * the canonical pair key (the truth side is label-budget-sized and
   * broadcasts); `nRecords` is caller-supplied so the operator never
   * re-counts the corpus. One row out.
   */
  def blockingQuality(candidates: DataFrame, truth: DataFrame,
                      idACol: String, idBCol: String,
                      nRecords: Long): DataFrame = {
    require(nRecords >= 2L, s"nRecords must be >= 2: $nRecords")
    def canon(df: DataFrame): DataFrame = df
      .filter(col(idACol).isNotNull && col(idBCol).isNotNull &&
        col(idACol) =!= col(idBCol))
      .select(least(col(idACol), col(idBCol)).as("__a"),
        greatest(col(idACol), col(idBCol)).as("__b"))
      .distinct()
    val c = graft.core.LineageCut.cut(canon(candidates))
    val t = graft.core.LineageCut.cut(canon(truth))
    val nC = c.agg(count(lit(1)).as("n_candidates"))
    val nT = t.agg(count(lit(1)).as("n_truth"))
    val nHit = c.join(t, Seq("__a", "__b"))
      .agg(count(lit(1)).as("n_hits"))
    // exact in BigInt, ONE nearest-double conversion (identical to the
    // oracle's integer-division-then-CAST chain)
    val totalPairs =
      (BigInt(nRecords) * BigInt(nRecords - 1L) / 2).toDouble
    nC.crossJoin(nT).crossJoin(nHit)
      .select(col("n_candidates"), col("n_truth"), col("n_hits"),
        round(lit(1.0) - col("n_candidates").cast("double") /
          lit(totalPairs), 6).as("reduction_ratio"),
        when(col("n_truth") > 0L,
          round(col("n_hits").cast("double") /
            col("n_truth").cast("double"), 6)).as("pairs_completeness"),
        when(col("n_candidates") > 0L,
          round(col("n_hits").cast("double") /
            col("n_candidates").cast("double"), 6)).as("pairs_quality"))
  }
}

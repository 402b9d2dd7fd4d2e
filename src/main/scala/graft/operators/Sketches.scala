package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.SketchProbeFunctions

/**
 * Sketch-gated exact operators (mission extension): a cheap mergeable
 * sketch pass bounds the candidate set, then an exact pass over ONLY the
 * survivors produces the precise answer. The sketches are one-sided
 * (CMS never undercounts; Bloom has no false negatives), so pruning by
 * them can never drop a true result row — the output is EXACT and fully
 * SQL-oracle-able, while the expensive shuffle runs over a fraction of
 * the data.
 *
 * This is the 100 TB shape for "find the heavy keys" / "join a huge fact
 * to a small dimension": the first pass is map-side-combined aggregation
 * into a few-KB summary (no row shuffle at all), and the second pass
 * shuffles only rows the summary could not rule out.
 */
object Sketches {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** The probes hash `long` or UTF-8-string keys, so key columns must be
    * integral (losslessly widened to long) or string — a silent
    * `cast("long")` on doubles would make distinct values that truncate
    * to the same long spuriously match (and values that cast to null
    * silently vanish). Fail loudly instead. Returns true iff string. */
  private def keyIsString(df: DataFrame, colName: String, what: String): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    df.schema(colName).dataType match {
      case StringType => true
      case ByteType | ShortType | IntegerType | LongType => false
      case dt => throw new IllegalArgumentException(
        s"$what column '$colName' must be an integral or string type " +
          s"for lossless sketch probing; got ${dt.simpleString}")
    }
  }

  /** Integral keys widen to long for the probe; strings probe as-is. */
  private def probeKey(c: Column, isString: Boolean): Column =
    if (isString) c else c.cast("long")

  /**
   * Exact frequent items: every key of `keyCol` (integral or string)
   * whose row count ≥ `minCount`, with its exact count. String keys
   * probe the sketch by their UTF-8 bytes — exactly how the built-in
   * aggregate inserts them — so heavy-hitter sweeps over tokens, hosts,
   * or fingerprints need no pre-hashing.
   *
   * Pass 1 builds a count-min sketch with the BUILT-IN codegen'd
   * `count_min_sketch` aggregate (partial-agg'd map side; the only thing
   * that moves is the ~`e/eps · ln(1/(1-confidence))` counter table).
   * Pass 2 filters rows through the sketch probe (map-side, inside
   * whole-stage codegen) and exactly counts the survivors.
   *
   * Why not one plain groupBy? At 100 TB with ~10⁹ distinct keys the
   * partial-agg hash tables overflow and the shuffle degrades to ~input
   * size; gating by the sketch first means only rows of PLAUSIBLY-heavy
   * keys enter the aggregation, so the shuffle is ∝ heavy-key rows. CMS
   * overestimates ⇒ a few light keys survive the gate but are removed by
   * the exact `HAVING n ≥ minCount` — never the reverse.
   *
   * `eps` trades sketch width for gate precision: estimates overshoot by
   * ≤ eps·N (N = total rows) with probability `confidence`, so choose
   * eps ≪ minCount/N to keep false survivors rare.
   *
   * NULL keys are excluded (explicit pre-filter — the sketch aggregate
   * skips them and the null-intolerant probe would drop them anyway; a
   * plain groupBy would return a null group, so the contract difference
   * is made visible here rather than left implicit).
   *
   * COST SHAPE: the keyed projection is scanned TWICE (sketch pass +
   * exact pass). At 100 TB that is the deliberate trade — scans are
   * sequential columnar reads with pushdown, the avoided exchange is
   * the bottleneck — but when the input fits in memory (or is itself
   * expensive to recompute), pass `cache` to persist the keyed frame
   * between the passes. The frame stays persisted for the caller to
   * release (`spark.catalog.clearCache()` or unpersist) — it cannot be
   * dropped here because the returned plan still reads it lazily.
   */
  def frequentItems(df: DataFrame, keyCol: String, minCount: Long,
                    eps: Double = 0.0001, confidence: Double = 0.99,
                    seed: Int = 42,
                    cache: Option[org.apache.spark.storage.StorageLevel] = None)
  : DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val isString = keyIsString(df, keyCol, "frequentItems key")
    val keyed0 = df.filter(col(keyCol).isNotNull)
      .select(probeKey(col(keyCol), isString).as("key"))
    val keyed = cache.map(keyed0.persist).getOrElse(keyed0)
    val sketchBytes = keyed
      .agg(count_min_sketch(col("key"), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    keyed
      .filter(SketchProbeFunctions.cmsGe(col("key"), sketchBytes, minCount))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /**
   * Exact left-semi join (`large` rows whose `largeKey` appears in
   * `small`'s `smallKey`), with the probe side pre-filtered by a Bloom
   * filter built from the build side.
   *
   * The filter is built with Spark's `DataFrameStatFunctions.bloomFilter`
   * (a tree-aggregated pass over `small`), serialized into the probe
   * expression, and applied map-side inside codegen BEFORE the join's
   * exchange — at scale this is the manual form of runtime row-level
   * filtering: the big side's shuffle carries only rows that might
   * match (plus ≤ `fpp` false positives), instead of everything. The
   * left-semi join afterwards removes the false positives, so the
   * result is exact.
   *
   * `expectedItems` sizes the filter; pass the build side's (approximate)
   * distinct-key count when known, or ≤ 0 to derive it with one
   * `approx_count_distinct` (HLL) pass — a map-side partial aggregate
   * whose shuffle is one sketch per partition, never a full `count()`
   * job over the build side's rows. (Distinct count is also the RIGHT
   * sizing input — bloom capacity is per distinct key, and a row count
   * over-sizes the filter on duplicate-heavy build sides.)
   */
  def bloomSemiJoin(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    bloomSemiJoinWithFilter(large, small, largeKey, smallKey,
      buildBloom(large, small, largeKey, smallKey, expectedItems, fpp))

  /**
   * Exact anti-join (`large` rows whose `largeKey` does NOT appear in
   * `small`'s `smallKey`) — the decontamination / blocklist shape: drop
   * every corpus row whose key matches a (comparatively small) reject
   * set.
   *
   * Bloom's one-sidedness INVERTS here: a negative probe PROVES the key
   * is absent from the blocklist, so probe-negative rows (the vast
   * majority when the blocklist is selective) are emitted directly —
   * they never enter any join, exchange, or state. Only probe-POSITIVE
   * rows (true matches + ≤ `fpp` false positives) run the exact
   * left-anti join that separates real matches (dropped) from false
   * positives (kept). NULL keys match nothing under anti-join semantics
   * and are kept, exactly as the plain left-anti join would.
   *
   * At 100 TB this is the difference between shuffling the corpus and
   * shuffling ~the contaminated fraction: the big side's exchange
   * carries only rows the filter could not clear.
   *
   * COST SHAPE: the clear/suspect split reads `large` twice (two scan
   * branches under the union) — the deliberate trade: scans are
   * sequential columnar reads with pushdown and no state, while the
   * avoided exchange is the cluster bottleneck; when `large` is already
   * cached/checkpointed the second read is a memory pass. If the probe
   * side will be consumed by a SINGLE downstream join anyway (no union
   * needed), prefer [[bloomSemiJoin]]'s shape with an anti join — one
   * scan, gate still pre-exchange.
   */
  def bloomAntiJoin(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    bloomAntiJoinWithFilter(large, small, largeKey, smallKey,
      buildBloom(large, small, largeKey, smallKey, expectedItems, fpp))

  /** The probe hashes a key by its class (long bits vs UTF-8 bytes), so a
    * filter built from one class and probed with the other produces false
    * NEGATIVES — the one failure mode that silently breaks the exactness
    * contract (semi-join drops true matches; anti-join keeps blocklisted
    * rows). Both sides must therefore be in the SAME class. */
  private def requireSameKeyClass(probeIsString: Boolean,
                                  buildIsString: Boolean,
                                  what: String): Unit =
    require(probeIsString == buildIsString,
      s"$what: probe and build key types must both be integral or both " +
        s"string (probe is ${if (probeIsString) "string" else "integral"}, " +
        s"build is ${if (buildIsString) "string" else "integral"}); a " +
        s"cross-class probe hashes differently and would produce Bloom " +
        s"false negatives")

  /** Shared build-side pass for the bloom joins: validate key types, size
    * the filter (HLL when unspecified), serialize. */
  private def buildBloom(large: DataFrame, small: DataFrame,
                         largeKey: String, smallKey: String,
                         expectedItems: Long, fpp: Double): Array[Byte] = {
    val probeIsString = keyIsString(large, largeKey, "bloom probe")
    requireSameKeyClass(probeIsString,
      keyIsString(small, smallKey, "bloom build"), "bloom join")
    val out = new ByteArrayOutputStream()
    bloomOf(small, smallKey, expectedItems, fpp).writeTo(out)
    out.toByteArray
  }

  private def bloomOf(df: DataFrame, keyCol: String,
                      expectedItems: Long, fpp: Double)
  : org.apache.spark.util.sketch.BloomFilter = {
    val isString = keyIsString(df, keyCol, "bloom build")
    val n = if (expectedItems > 0) expectedItems
      else df.agg(approx_count_distinct(col(keyCol))).head().getLong(0)
    df.select(probeKey(col(keyCol), isString).as(keyCol))
      .stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
  }

  // ── Persisted / incrementally-merged filters (the daily-drop shape) ──
  //
  // A production blocklist / kept-corpus filter is built ONCE and then
  // grows by deltas: re-scanning the accumulated corpus every day to
  // rebuild it costs O(corpus·days), while Bloom filters are mergeable —
  // OR-ing two filters of identical geometry equals the filter of the
  // union — so the daily cost is O(delta). The persisted artifact is the
  // serialized filter (cluster-readable via Hadoop FileSystem, same
  // transport layer as the snapshot sink). The probes stay EXACT-result
  // operators: the filter only gates; the exact pass still joins the key
  // table (which, in the daily-drop scenario, is the kept corpus already
  // on disk). Size `expectedItems` for the filter's LIFETIME capacity at
  // save time — merging cannot grow geometry, and a filter filled far
  // past capacity degrades toward all-positive (gate stops pruning;
  // results stay exact). Rebuild when saturated — both writers RETURN
  // the filter's observed fpp (`BloomFilter.expectedFpp`, computed from
  // actual bit saturation) so callers can see saturation coming, log a
  // warning past `warnFpp`, and fail loudly past `maxFpp` when the
  // caller would rather rebuild than ship a filter that no longer
  // prunes.

  /** Observed-saturation gate shared by the two writers: returns the
    * filter's current fpp, warns past `warnFpp`, throws past `maxFpp`. */
  private def checkSaturation(bloom: org.apache.spark.util.sketch.BloomFilter,
                              what: String, path: String,
                              warnFpp: Double, maxFpp: Double): Double = {
    val observed = bloom.expectedFpp()
    require(observed <= maxFpp,
      s"$what: observed Bloom fpp $observed exceeds maxFpp $maxFpp at " +
        s"$path — the filter is saturated past its lifetime capacity " +
        s"(merging cannot grow geometry); rebuild it with a larger " +
        s"expectedItems")
    if (observed > warnFpp) log.warn(
      s"$what: Bloom filter at $path is saturating — observed fpp " +
        s"$observed > warnFpp $warnFpp; the gate still returns exact " +
        s"results but prunes less; plan a rebuild with larger " +
        s"expectedItems")
    observed
  }

  /** Build a Bloom filter of `keyCol` and persist it to `dest` (a single
    * file on any Hadoop-FS scheme). Size `expectedItems` to the expected
    * LIFETIME distinct-key count if the filter will be grown with
    * [[mergeIntoBloomFilter]]; ≤ 0 sizes to the current frame (HLL).
    * Returns the observed fpp (≈ the design `fpp` when sized right);
    * warns past `warnFpp`, fails past `maxFpp` (default 1.0 = never —
    * a saturated filter stops pruning but never breaks exactness). */
  def saveBloomFilter(df: DataFrame, keyCol: String, dest: String,
                      expectedItems: Long = 0L, fpp: Double = 0.01,
                      warnFpp: Double = 0.1, maxFpp: Double = 1.0): Double = {
    val bloom = bloomOf(df, keyCol, expectedItems, fpp)
    val observed = checkSaturation(bloom, "saveBloomFilter", dest,
      warnFpp, maxFpp)
    val path = new org.apache.hadoop.fs.Path(dest)
    val fs = path.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(path, true)
    try bloom.writeTo(out) finally out.close()
    observed
  }

  /** Read a persisted filter's bytes — feed to the probe functions or the
    * `filterBytes` join overloads. */
  def loadBloomFilter(spark: org.apache.spark.sql.SparkSession,
                      path: String): Array[Byte] = readBytes(spark, path)

  /** Merge `delta`'s keys into the persisted filter at `path` in place —
    * O(delta) daily accumulation. Geometry is inherited from the stored
    * filter (each task deserializes its own copy as the fold zero, puts
    * its partition's keys, and the copies OR-merge — existing bits are
    * idempotent under OR), so merged probes have NO false negatives for
    * old or new keys. Returns the merged filter's observed fpp — THE
    * saturation signal for the daily-drop lifecycle (geometry is fixed
    * at save time, so fpp only ratchets up as deltas accumulate); warns
    * past `warnFpp`, fails (before overwriting the stored filter) past
    * `maxFpp`. */
  def mergeIntoBloomFilter(delta: DataFrame, keyCol: String,
                           path: String, warnFpp: Double = 0.1,
                           maxFpp: Double = 1.0): Double = {
    import java.io.ByteArrayInputStream
    import org.apache.spark.util.sketch.BloomFilter
    val spark = delta.sparkSession
    val isString = keyIsString(delta, keyCol, "bloom merge")
    val zero = BloomFilter.readFrom(
      new ByteArrayInputStream(loadBloomFilter(spark, path)))
    val keys = delta.filter(col(keyCol).isNotNull)
      .select(probeKey(col(keyCol), isString).as("k"))
    val merged =
      if (isString) {
        import spark.implicits._
        keys.as[String].rdd.treeAggregate(zero)(
          (f, v) => { f.putString(v); f },
          (a, b) => { a.mergeInPlace(b); a }, depth = 2)
      } else {
        import spark.implicits._
        keys.as[Long].rdd.treeAggregate(zero)(
          (f, v) => { f.putLong(v); f },
          (a, b) => { a.mergeInPlace(b); a }, depth = 2)
      }
    val observed = checkSaturation(merged, "mergeIntoBloomFilter", path,
      warnFpp, maxFpp)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try merged.writeTo(out) finally out.close()
    observed
  }

  /** [[bloomSemiJoin]] with a pre-built (persisted) filter: skips the
    * build pass; the exact left-semi still runs against `small`.
    * CORRECTNESS REQUIREMENT: the filter must contain EVERY key of
    * `small` (built from it, or a superset grown by [[
    * mergeIntoBloomFilter]]) — a stale filter missing keys would drop
    * true matches, the one failure mode Bloom's no-false-negative
    * guarantee cannot cover. Supersets only add false positives, which
    * the exact pass removes. */
  def bloomSemiJoinWithFilter(large: DataFrame, small: DataFrame,
                              largeKey: String, smallKey: String,
                              filterBytes: Array[Byte]): DataFrame = {
    val isString = keyIsString(large, largeKey, "bloomSemiJoin probe")
    requireSameKeyClass(isString,
      keyIsString(small, smallKey, "bloomSemiJoin build"), "bloomSemiJoin")
    // join on the ORIGINAL key columns (integral ⇒ equality semantics are
    // native; the long cast exists only inside the probe)
    val pre = large.filter(SketchProbeFunctions.bloomContains(
      probeKey(col(largeKey), isString), filterBytes))
    val keys = small.select(col(smallKey).as("__bsj_key")).distinct()
    pre.join(keys, pre(largeKey) === col("__bsj_key"), "left_semi")
  }

  /** [[bloomAntiJoin]] with a pre-built (persisted) filter: skips the
    * build pass; the exact left-anti still runs for probe-positives. A
    * filter that is a SUPERSET of `small`'s keys (e.g. grown by deltas
    * not yet in the key table) only adds false positives, which the
    * exact pass keeps — results remain exact for the CURRENT `small`. */
  def bloomAntiJoinWithFilter(large: DataFrame, small: DataFrame,
                              largeKey: String, smallKey: String,
                              filterBytes: Array[Byte]): DataFrame = {
    val isString = keyIsString(large, largeKey, "bloomAntiJoin probe")
    requireSameKeyClass(isString,
      keyIsString(small, smallKey, "bloomAntiJoin build"), "bloomAntiJoin")
    val hit = SketchProbeFunctions.bloomContains(
      probeKey(col(largeKey), isString), filterBytes)
    val clear = large.filter(col(largeKey).isNull || !hit)
    val suspect = large.filter(hit)
    val keys = small.select(col(smallKey).as("__baj_key")).distinct()
    clear.unionByName(
      suspect.join(keys, suspect(largeKey) === col("__baj_key"), "left_anti"))
  }

  /**
   * Equi-join SIZE estimation without running the join — the
   * count-min inner-product estimator (Cormode–Muthukrishnan 2005,
   * §4.2): hash each side's keys into `depth` independent rows of
   * `width` counters; for each row the counter inner product
   * Σ_b a[b]·b[b] counts every true joining pair PLUS non-negative
   * collision cross-terms, so `min` over rows is an estimate that can
   * NEVER undercount — `est ≥ exact` always, with expected slack
   * ≤ |A|·|B|/width per row. THE pre-flight for join planning: decide
   * salted-vs-broadcast-vs-plain (and whether to run `skewReport`)
   * from two counter tables instead of paying the join to learn it
   * was a cross-product.
   *
   * Scale shape: each side is ONE map-side-combined aggregation into
   * ≤ depth·width rows (default 4·8192 ≈ tens of KB); the inner
   * product joins those counter tables, never data. Buckets come from
   * the engine-portable md5 convention (8 hex chars → 32 bits, mod
   * width), so the estimate is DETERMINISTIC and the SQL oracle
   * reproduces it bit-for-bit — not just a bound check. Keys compare
   * by their string form (cast before hashing); NULL keys join
   * nothing and are excluded.
   *
   * Returns one row: (`exact_pairs`, `est_pairs`, `overestimate`)
   * with the exact size computed the honest way (per-key count join —
   * still ≪ the join itself) so callers can VERIFY the one-sidedness;
   * drop that column's computation in production and keep only the
   * estimate (`exactToo = false`).
   */
  def estimateEquiJoinSize(a: DataFrame, aKey: String,
                           b: DataFrame, bKey: String,
                           width: Int = 8192, depth: Int = 4,
                           seed: Int = 42,
                           exactToo: Boolean = true): DataFrame = {
    require(width > 0, "width must be positive")
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1, 4] (each row gets ONE md5; the rows' $depth " +
        s"buckets come from disjoint 32-bit digest slices)")
    def counters(df: DataFrame, key: String, side: String): DataFrame = {
      // ONE md5 per row — the depth hash functions are disjoint 32-bit
      // slices of the 128-bit digest (md5 bits are independent), which
      // quarters the sketch pass's hashing cost vs a hash per (row, j)
      // and keeps buckets deterministic for the SQL replica
      val hashed = df.filter(col(key).isNotNull)
        .select(md5(concat(lit(s"$seed:"), col(key).cast("string"))).as("h"))
      hashed.select(posexplode(array((0 until depth).map { j =>
          expr(s"conv(substring(h, ${1 + 8 * j}, 8), 16, 10)")
            .cast("long") % width
        }: _*)).as(Seq("j", "bucket")))
        .groupBy("j", "bucket").agg(count(lit(1)).as(s"c_$side"))
    }
    val ca = counters(a, aKey, "a")
    val cb = counters(b, bKey, "b")
    val est = ca.join(cb, Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("c_a") * col("c_b")).as("ip"))
      .agg(min("ip").as("est_pairs"))
    if (!exactToo) return est
    val ka = a.filter(col(aKey).isNotNull)
      .groupBy(col(aKey).cast("string").as("k")).agg(count(lit(1)).as("na"))
    val kb = b.filter(col(bKey).isNotNull)
      .groupBy(col(bKey).cast("string").as("k")).agg(count(lit(1)).as("nb"))
    val exact = ka.join(kb, "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_pairs"))
    exact.crossJoin(est)
      .select(col("exact_pairs"), col("est_pairs"),
        (col("est_pairs") >= col("exact_pairs")).as("overestimate"))
  }

  // ---- persisted HLL distinct-count ledger -------------------------------
  //
  // The distinct-count sibling of the persisted Bloom blocklist: a daily
  // "unique users/documents/urls ever seen" ledger that costs one
  // O(delta) scan per drop and KILOBYTES of state forever. HLL union is
  // lossless with respect to the sketch's own error bound — merging
  // day-by-day gives the SAME sketch as one pass over the union, so the
  // ledger never degrades with age (unlike the Bloom filter, whose fpp
  // ratchets); there is no rebuild trigger to watch.

  /** Build an HLL sketch of `keyCol`'s distinct values (Spark's built-in
    * Apache DataSketches HllSketch aggregate, map-side combined — KBs
    * move per partition) and persist it at `dest` (any Hadoop FS).
    * `lgK` trades state (2^lgK bytes-ish) for error (~1.04/√2^lgK;
    * lgK=12 ⇒ ~1.6%). NULL keys are ignored — they are not a value. */
  def saveHllSketch(df: DataFrame, keyCol: String, dest: String,
                    lgK: Int = 12): Unit = {
    val bytes = df.filter(col(keyCol).isNotNull)
      .agg(hll_sketch_agg(col(keyCol), lgK).as("s"))
      .head().getAs[Array[Byte]](0)
    writeBytes(df.sparkSession, dest, bytes)
  }

  /** Fold `delta`'s keys into the ledger at `path` in place — one
    * O(delta) scan; the stored union is byte-for-byte what a fresh
    * sketch over (old ∪ delta) at the SAME lgK would estimate.
    * `allowDifferentLgK` tolerates a delta sketched at another lgK
    * (the union downgrades to the coarser config). */
  def mergeIntoHllSketch(delta: DataFrame, keyCol: String, path: String,
                         lgK: Int = 12): Unit = {
    val spark = delta.sparkSession
    val old = readBytes(spark, path)
    val add = delta.filter(col(keyCol).isNotNull)
      .agg(hll_sketch_agg(col(keyCol), lgK).as("s"))
      .head().getAs[Array[Byte]](0)
    val merged = spark.range(1)
      .select(hll_union(lit(old), lit(add), allowDifferentLgConfigK = true)
        .as("u"))
      .head().getAs[Array[Byte]](0)
    writeBytes(spark, path, merged)
  }

  /** Estimate the ledger's distinct count. */
  def hllEstimate(spark: org.apache.spark.sql.SparkSession,
                  path: String): Long =
    spark.range(1)
      .select(hll_sketch_estimate(lit(readBytes(spark, path))).as("e"))
      .head().getLong(0)

  /**
   * KMV (k-minimum-values / bottom-k sketch) Jaccard similarity
   * between two key SETS (Bar-Yossef et al. 2002; Beyer et al. 2007):
   * est = |U ∩ S_A ∩ S_B| / k where S_X is the k smallest distinct key
   * hashes of side X and U the k smallest of S_A ∪ S_B — the corpus-
   * overlap ratio ("how similar are these two crawls?") from two
   * bottom-k passes, no key join. Unlike [[approxIntersection]]'s
   * inclusion-exclusion, the KMV estimator is a direct sample of the
   * union, so its error concentrates around the RATIO (±~1/√k)
   * rather than scaling with the union size.
   *
   * The hash is the md5 hex string (lexicographic order == uniform
   * order), so the ESTIMATE is deterministic and the SQL oracle
   * reproduces it bit-for-bit — the same portability contract as the
   * md5 samplers. `exactToo` adds the exact Jaccard via distinct-key
   * joins for gating.
   *
   * Scale shape: per side, distinct hashes reduce map-side and the
   * bottom-k is a `TakeOrdered` (per-partition heaps, no global
   * sort); everything after operates on ≤ 3k driver-collected hash
   * strings — O(k), corpus-independent. The exact pass (when
   * requested) is two distinct-key aggregates + a semi-join — the
   * thing the sketch exists to avoid at 100 TB; gate-only.
   *
   * Returns one row: (`k_used`, `est_jaccard`, and with `exactToo`
   * `exact_jaccard`) — exact long/long→double divisions, no rounding.
   */
  def kmvJaccard(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                 k: Int = 1024, exactToo: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = a.sparkSession
    def bottomK(df: DataFrame, key: String): Array[String] =
      df.filter(col(key).isNotNull)
        .select(md5(col(key).cast("string")).as("h"))
        .distinct().orderBy("h").limit(k)
        .collect().map(_.getString(0))
    val sa = bottomK(a, aKey)
    val sb = bottomK(b, bKey)
    // k smallest of the union; est = fraction of them in BOTH sets
    val u = (sa ++ sb).distinct.sorted.take(k)
    val saSet = sa.toSet
    val sbSet = sb.toSet
    val kUsed = u.length // < k only when |A ∪ B| < k (then est is exact)
    val inter = u.count(h => saSet(h) && sbSet(h))
    val est = inter.toDouble / kUsed
    import spark.implicits._
    val base = Seq((kUsed.toLong, est)).toDF("k_used", "est_jaccard")
    if (!exactToo) return base
    val da = a.filter(col(aKey).isNotNull)
      .select(col(aKey).cast("string").as("ka")).distinct()
    val db = b.filter(col(bKey).isNotNull)
      .select(col(bKey).cast("string").as("kb")).distinct()
    val na = da.count()
    val nb = db.count()
    val ni = da.join(db, da("ka") === db("kb"), "left_semi").count()
    base.withColumn("exact_jaccard",
      lit(ni.toDouble / (na + nb - ni).toDouble))
  }

  /**
   * Approximate distinct-set OVERLAP between two key columns by
   * HLL inclusion-exclusion: |A∩B| ≈ |A| + |B| − |A∪B|, with all
   * three terms from HLL sketches and the union formed by sketch
   * merge (lossless w.r.t. the sketch bound — same estimate as
   * sketching A∪B directly). The audience/corpus-overlap question
   * ("how many doc ids do these two crawls share?") answered with two
   * O(n) scans and KBs of state — no join, no shuffle of keys.
   *
   * ERROR CONTRACT: each HLL term carries ~1.04/√2^lgK relative
   * error on ITS OWN estimate, so the subtraction's absolute error
   * scales with |A∪B|, not |A∩B| — for overlaps much smaller than
   * either set the relative error blows up (the well-known
   * inclusion-exclusion caveat; the returned `err_bound` makes it
   * explicit). Exact joins remain the tool for small-overlap
   * precision; this is the cheap screen that tells you whether the
   * expensive join is worth running.
   *
   * Returns one row: (`est_a`, `est_b`, `est_union`, `est_intersect`
   * ≥ 0 clamped, `err_bound` = 3·1.04/√2^lgK · est_union — the
   * 3-sigma absolute bound on the intersection estimate).
   */
  def approxIntersection(a: DataFrame, aKey: String,
                         b: DataFrame, bKey: String,
                         lgK: Int = 12): DataFrame = {
    val spark = a.sparkSession
    val sa = a.filter(col(aKey).isNotNull)
      .agg(hll_sketch_agg(col(aKey), lgK).as("s"))
      .head().getAs[Array[Byte]](0)
    val sb = b.filter(col(bKey).isNotNull)
      .agg(hll_sketch_agg(col(bKey), lgK).as("s"))
      .head().getAs[Array[Byte]](0)
    val rse = 1.04 / math.sqrt((1L << lgK).toDouble)
    spark.range(1).select(
        hll_sketch_estimate(lit(sa)).as("est_a"),
        hll_sketch_estimate(lit(sb)).as("est_b"),
        hll_sketch_estimate(hll_union(lit(sa), lit(sb))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_intersect"),
        (lit(3.0 * rse) * col("est_union").cast("double")).as("err_bound"))
  }

  private def writeBytes(spark: org.apache.spark.sql.SparkSession,
                         dest: String, bytes: Array[Byte]): Unit = {
    val path = new org.apache.hadoop.fs.Path(dest)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(path, true)
    try out.write(bytes) finally out.close()
  }

  private def readBytes(spark: org.apache.spark.sql.SparkSession,
                        path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /**
   * Mergeable approximate quantiles with a SELF-CHECKED rank-error
   * gate — the sketch-family member for order statistics next to
   * HLL (distinct), CMS (frequency), Bloom (membership), KMV
   * (similarity): Spark's Greenwald-Khanna `approx_percentile`
   * aggregate (mergeable partial sketches — the 100 TB path where an
   * exact `percentile`'s O(distinct-values) state won't fit) plus ONE
   * exact rank probe per estimate that certifies the published GK
   * bound |rank(est) − ⌈p·n⌉| ≤ accuracy·n ON THIS RUN. The gate
   * turns an approximate answer into a checked one: consumers read
   * `within_bound` before trusting `estimate`.
   *
   * The probe is deliberately cheap: counting rows ≤ each of the k
   * estimates is one map-side-combined aggregate over k codegen'd
   * comparisons — NOT the exact-quantile sort the sketch exists to
   * avoid; n is unbounded and value cardinality never enters.
   *
   * Oracle shape: the estimate itself is engine-internal (DuckDB
   * cannot replay GK), so the cross-engine check is the INVARIANT —
   * `within_bound` must be TRUE for every probed p (the ann_lsh
   * self-recovery pattern); `p`, `n`, and `target_rank` are exact.
   *
   * Returns one row per probability, in `probs` order: (`p`,
   * `n`, `target_rank`, `rank_of_estimate`, `within_bound`).
   */
  def approxQuantileGate(df: DataFrame, valueCol: String,
                         probs: Seq[Double], accuracy: Int = 10000)
  : DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    require(probs.forall(p => p > 0 && p < 1), s"probs must be in (0, 1)")
    require(accuracy >= 100, "accuracy must be >= 100 (GK 1/eps)")
    // cut: estimate pass and exact-rank probe are two separate driver
    // actions — a non-deterministic input (sample/limit upstream) would
    // otherwise let the probe check different rows than the estimate
    // saw, corrupting the within_bound verdict
    val base = graft.core.LineageCut.cut(df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v")))
    val probsArr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val est = base.agg(
      expr(s"approx_percentile(__v, $probsArr, $accuracy)").as("__est"),
      count(lit(1)).as("__n")).head()
    require(!est.isNullAt(0), "approxQuantileGate needs at least one " +
      s"non-null $valueCol value")
    val ests = est.getSeq[Double](0)
    val n = est.getLong(1)
    // one probe aggregate: each estimate's exact rank INTERVAL — a
    // tied value occupies ranks [#rows < est + 1, #rows <= est], and
    // the GK guarantee is that this interval INTERSECTS
    // [⌈pn⌉ − εn, ⌈pn⌉ + εn] (checking only the upper rank would
    // false-alarm on heavy ties)
    val rankAggs = ests.zipWithIndex.flatMap { case (e, i) =>
      Seq(sum(when(col("__v") <= e, 1L).otherwise(0L)).as(s"__le$i"),
        sum(when(col("__v") < e, 1L).otherwise(0L)).as(s"__lt$i"))
    }
    val ranks = base.agg(rankAggs.head, rankAggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    probs.zipWithIndex.map { case (p, i) =>
      val target = math.ceil(p * n).toLong
      val hi = ranks.getLong(2 * i)     // upper rank of the estimate
      val lo = ranks.getLong(2 * i + 1) + 1 // lower rank
      val eps = n.toDouble / accuracy
      val ok = lo.toDouble <= target + eps + 1e-9 &&
        hi.toDouble >= target - eps - 1e-9
      (p, n, target, hi, ok)
    }.toDF("p", "n", "target_rank", "rank_of_estimate", "within_bound")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling (mission extension, SURVEY.md
 * §7.4): corpus subsetting that is a pure function of the row id — the
 * property training-data pipelines need (re-runs, retries, and other
 * engines all select the exact same rows; Spark's `sample()` is
 * partition-layout-dependent and not reproducible across engines).
 *
 * Mechanism: `md5(seed || id)` and keep rows whose first 8 hex digits are
 * lexicographically below the fraction's threshold. Hex compare of
 * lowercase digits == numeric compare of the top 32 bits, and md5 is
 * identical everywhere, so a DuckDB/Trino/Python replica selects the
 * identical row set. Per-row cost is one hash — fully parallel, no
 * shuffle, pushes down to a scan filter.
 */
object Samples {

  /** Lexicographic md5-prefix threshold for a fraction in [0, 1]. */
  private[operators] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    // top 32 bits of the hash space; 1.0 → above any 8-digit hex string
    if (fraction >= 1.0) "g" // every hex digit < 'g'
    else f"${math.round(fraction * 4294967296.0).min(4294967295L)}%08x"
  }

  /** The keep-predicate itself, reusable in any filter. */
  def bernoulliPredicate(idCol: Column, fraction: Double, seed: Long): Column =
    substring(md5(concat(lit(seed.toString), lit(":"), idCol.cast("string"))), 1, 8) <
      lit(thresholdHex(fraction))

  /** Deterministic Bernoulli sample: keep ≈`fraction` of rows, selected by
    * id hash (stable across runs, partitionings, and engines). */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
                seed: Long = 42L): DataFrame =
    df.filter(bernoulliPredicate(col(idCol), fraction, seed))

  /**
   * Deterministic stratified sample: an independent Bernoulli fraction per
   * stratum (e.g. down-weight over-represented languages/sources when
   * mixing a training corpus). Strata absent from `fractions` keep
   * `defaultFraction`. Single scan, no shuffle — the per-stratum fraction
   * is resolved by a broadcast map expression.
   */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double], defaultFraction: Double = 0.0,
                 seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === lit(stratum), lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))), 1, 8)
        < frac)
  }

  /**
   * Deterministic WEIGHTED sampling: each row survives with its own
   * probability `weightCol` ∈ [0,1] (e.g. a quality score driving
   * keep-probability — the soft-filter step between hard quality cuts and
   * uniform sampling). Same md5-threshold mechanism: the row's uniform
   * draw is a pure function of (seed, id), the threshold is the row's own
   * weight — reproducible everywhere, map-only, no shuffle.
   */
  def weighted(df: DataFrame, idCol: String, weightCol: String,
               seed: Long = 42L): DataFrame = {
    // the row's own weight becomes its hex threshold (same lexicographic
    // top-32-bit compare as bernoulli — engine-portable with no integer
    // hex parsing on the oracle side). BOTH guards are on the SCALED
    // value, not the weight: w ∈ (1 - 2^-33, 1.0) rounds to 2^32, whose
    // 9-digit hex lpad would TRUNCATE to "10000000" (collapsing the
    // threshold), so scaled >= 2^32 must mean "keep unconditionally";
    // and a NEGATIVE w scales to a negative long whose 16-digit
    // sign-extended hex lpad-truncates to "ffffffff" (keep ~everything
    // where none was intended), so scaled clamps at 0 first
    val scaled = greatest(round(col(weightCol).cast("double") * 4294967296.0),
      lit(0.0))
    val wHex = when(scaled >= 4294967296.0, lit("g"))
      .otherwise(lpad(lower(hex(scaled.cast("long"))), 8, "0"))
    df.filter(
      substring(md5(concat(lit(seed.toString), lit(":"),
        col(idCol).cast("string"))), 1, 8) < wHex)
  }

  /**
   * Deterministic k-PER-GROUP sampling: exactly min(k, |group|) rows per
   * group, chosen uniformly BY HASH RANK (the balanced per-language/
   * per-source cap of a corpus mix). Unlike reservoir sampling this is
   * run- and partitioning-independent, and any engine reproduces the
   * selection. One shuffle on the group key; rank via window.
   */
  def kPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
                seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    val h = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /**
   * Balanced class downsampling: every class keeps EXACTLY the minority
   * class's count (the classifier-prep step behind
   * [[graft.operators.Classifier]] — a 99:1 skew trains a
   * majority-guesser; balancing to the minority count is the standard
   * fix when upweighting isn't available). Selection within each class
   * is the deterministic md5-rank of [[kPerGroup]] — reproducible
   * across runs, partitionings, and engines. NULL classes are excluded
   * (missingness is not a class).
   *
   * Scale shape: one keys-only class-count aggregate (collect of
   * #classes rows) picks k, then [[kPerGroup]]'s per-class window —
   * partitioned by class, so it scales out; the per-class sort is the
   * honest cost of exact-k selection.
   */
  def balanceClasses(df: DataFrame, idCol: String, classCol: String,
                     seed: Long = 42L): DataFrame = {
    val base = df.filter(col(classCol).isNotNull)
    val counts = base.groupBy(col(classCol)).agg(count(lit(1)).as("__c"))
      .agg(min("__c").as("__min")).head()
    require(!counts.isNullAt(0), "balanceClasses on an empty frame")
    val k = counts.getLong(0)
    require(k <= Int.MaxValue, s"minority class too large for exact-k: $k")
    kPerGroup(base, idCol, classCol, k.toInt, seed)
  }

  /**
   * Token-budget corpus packing: within each `groupCol` stratum, keep rows
   * in `priority` order until the running sum of `costCol` exceeds
   * `budget` (the first row that would cross the line is dropped, as is
   * everything after it). The standard "N billion tokens per language,
   * best documents first" mixing step of a training-corpus build.
   *
   * `priority` MUST be a deterministic total order (tie-break on a unique
   * id) or the kept set is not reproducible. Integral `costCol` makes the
   * running sum exact — no float-accumulation ambiguity at any scale.
   *
   * Scale shape: one shuffle on `groupCol`, then a partition-local
   * spill-backed sort — the inherent cost of exact priority packing.
   * Parallelism is bounded by the number of strata (languages/sources);
   * for a HOT stratum at the 100 TB tier, pre-trim with
   * [[bernoulli]]/[[stratified]] or a coarse priority-threshold filter to
   * ~(budget + slack) worth of candidates first, then pack exactly —
   * packing only ever reads the best ~budget tokens per group, so the
   * window never sees the full stratum.
   */
  def byTokenBudget(df: DataFrame, groupCol: String, costCol: String,
                    budget: Long, priority: Seq[Column]): DataFrame = {
    require(priority.nonEmpty, "need a deterministic priority order")
    val w = Window.partitionBy(col(groupCol)).orderBy(priority: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(costCol).cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /**
   * Hot-stratum-safe token-budget packing — IDENTICAL kept set to
   * [[byTokenBudget]] ordered by (`priorityValue` asc, `tieBreak`), but no
   * task ever sorts more than one value-range chunk of one stratum
   * (the [[byTokenBudget]] window sorts a whole stratum in one task).
   *
   * Same summary-frame pattern as `TemporalJoin.asOfSliced`:
   *   1. per-stratum approximate quantiles of `priorityValue` split each
   *      stratum into ≈`chunks` value-range chunks (equal values always
   *      share a chunk, so chunk order extends the total priority order);
   *   2. per-(stratum, chunk) cost sums → exact exclusive prefix offsets
   *      over a summary frame (O(#strata × chunks) rows);
   *   3. the running sum inside each chunk starts from its offset —
   *      exact long arithmetic end to end, so the cut row is identical.
   *
   * `priorityValue` must be numeric (quantile-rangeable), ascending =
   * "cheapest/best first" — pass e.g. `negate(score)` for best-first.
   * Chunk-boundary quantiles being approximate only skews chunk SIZES,
   * never correctness.
   */
  def byTokenBudgetScalable(df: DataFrame, groupCol: String, costCol: String,
                            budget: Long, priorityValue: Column,
                            tieBreak: Seq[Column], chunks: Int = 32): DataFrame = {
    require(chunks > 1, "need at least 2 chunks")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val withP = df.withColumn("__p", priorityValue.cast("double"))
    // (1) per-stratum chunk boundaries (a small agg frame), joined back by
    // broadcast; strict `<` keeps equal priority values in one chunk
    val qs = (1 until chunks).map(i => i.toDouble / chunks)
    val bounds = withP.groupBy(col(groupCol))
      .agg(expr(s"percentile_approx(__p, array(${qs.mkString(",")}), 1000)")
        .as("__bnds"))
    val chunked = withP.join(broadcast(bounds), Seq(groupCol))
      .withColumn("__chunk",
        size(filter(col("__bnds"), b => b < col("__p")))) // 0..chunks-1
      .drop("__bnds")
    // (2) exact exclusive prefix offsets over the (stratum, chunk) summary
    val sums = chunked.groupBy(col(groupCol), col("__chunk"))
      .agg(sum(col(costCol).cast("long")).as("__csum"))
    val offW = Window.partitionBy(col(groupCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__off", coalesce(sum(col("__csum")).over(offW), lit(0L)))
      .select(col(groupCol), col("__chunk"), col("__off"))
    // (3) parallel within-chunk packing, stitched by the offsets
    val ord: Seq[Column] = col("__p").asc +: tieBreak
    val w = Window.partitionBy(col(groupCol), col("__chunk")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked.join(broadcast(offsets), Seq(groupCol, "__chunk"))
      .withColumn("__cum",
        col("__off") + sum(col(costCol).cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__p", "__chunk", "__off", "__cum")
  }

  /**
   * Exact weighted sampling WITHOUT replacement, k per group — the
   * A-Res scheme (Efraimidis–Spirakis 2006, "Weighted random sampling
   * with a reservoir"): each row draws `u = uniform(seed, id)` and the
   * k rows with the largest `u^(1/w)` per group are the sample, which
   * is distributionally exact weighted sampling without replacement.
   * This fills the gap between [[weighted]] (independent per-row
   * keep-probabilities — sample SIZE varies) and [[kPerGroup]]
   * (uniform, weight-blind): a fixed-size per-stratum sample where
   * higher-weight rows are proportionally likelier — the "sample 10k
   * docs per language, biased by quality score" shape.
   *
   * Determinism/portability: `u` is 52 explicit bits of
   * `md5(seed:id)` divided by 2^52 — the same md5 convention as every
   * sampler here, numeric instead of lexicographic because A-Res needs
   * `ln(u)/w` (rank-equivalent to `u^(1/w)`, cheaper and better
   * conditioned). The key is quantized to 12 decimal places before
   * ranking — same defense as `Mixes.temperatureSample`'s rate
   * quantization: `ln` may differ by an ulp across engine libms, and
   * quantization keeps a sub-ulp delta from flipping a rank (ties
   * break on id). One shuffle on the group key; rank via window —
   * partitioning-independent, any engine reproduces the selection.
   *
   * Weights must be non-null, non-NaN, strictly positive — checked
   * fail-loud in one aggregate (a zero weight makes `ln(u)/w` ±Inf,
   * a null silently vanishes from windows; both corrupt the sample
   * contract rather than erroring on their own).
   */
  def weightedKPerGroup(df: DataFrame, idCol: String, weightCol: String,
                        groupCol: String, k: Int,
                        seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    val w0 = col(weightCol).cast("double")
    val chk = df.agg(
      min(coalesce(w0, lit(Double.NegativeInfinity))).as("mn"),
      sum(when(isnan(w0), 1L).otherwise(0L)).as("nans")).head()
    require(!chk.isNullAt(0) && chk.getDouble(0) > 0 && chk.getLong(1) == 0,
      s"weightedKPerGroup weights must be non-null, non-NaN and strictly " +
        s"positive; min (nulls as -Inf) = ${chk.get(0)}, NaNs = ${chk.get(1)}")
    val u = expr(s"conv(substring(md5(concat('$seed:', cast($idCol as " +
      s"string))), 1, 13), 16, 10)").cast("double") /
      lit(4503599627370496.0) // 2^52
    val key = round(log(u) / w0, 12)
    val win = Window.partitionBy(col(groupCol))
      .orderBy(key.desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}

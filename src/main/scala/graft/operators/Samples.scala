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
}

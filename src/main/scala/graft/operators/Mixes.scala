package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus mixture rescaling (mission extension, SURVEY.md §7.4): given
 * target per-source shares (the "data mixture" of a training run — e.g.
 * 40% web, 30% code, 20% books, 10% wiki), downsample each source so the
 * KEPT corpus matches the target distribution, keeping as much data as
 * possible without upsampling anything.
 *
 * Closed form: with per-source cost `c_s` (tokens/chars) and target
 * weight `w_s`, the largest achievable mixed total is `T = min_s(c_s /
 * w_s)` (the scarcest source relative to its target binds); source `s`
 * then keeps `rate_s = w_s·T / c_s` of its cost. The sampling is the
 * engine-portable md5-threshold mechanism of [[Samples]], with each
 * row's threshold coming from its source's rate — so re-runs, retries,
 * and a SQL replica all keep the identical row set.
 *
 * Scale shape: one partial-aggregated pass for the per-source costs (a
 * #sources-row frame), a broadcast join of the rates, and a map-only
 * filter — no full-data shuffle anywhere. Expected (not exact) share
 * match: Bernoulli sampling concentrates tightly at corpus scale; use
 * [[Samples.kPerGroup]]-style exact rank cuts when exact counts matter
 * more than one-pass scanning.
 */
object Mixes {

  /**
   * Keep a deterministic subset of `df` whose per-source `costCol` mass
   * approaches the `targets` distribution (weights need not sum to 1 —
   * only ratios matter... pass them normalized for readable rates). Rows
   * whose stratum is absent from `targets` are dropped (weight 0).
   */
  def toTargetShares(df: DataFrame, idCol: String, stratumCol: String,
                     costCol: String, targets: Map[String, Double],
                     seed: Long = 42L): DataFrame = {
    require(targets.nonEmpty, "need at least one target share")
    require(targets.values.forall(_ > 0.0), "target shares must be positive")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val wExpr = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (stratum, w)) =>
        when(col(stratumCol) === lit(stratum), lit(w)).otherwise(acc)
    }
    val withW = df.withColumn("__w", wExpr).filter(col("__w").isNotNull)
    // per-source cost mass (#sources rows), the binding total T, and the
    // per-source keep rate — all in-plan, broadcast back; the double ops
    // ((w*T)/c after T = min(c/w)) are in a fixed order so any engine
    // reproduces the exact rate, hence the exact kept row set
    val costs = withW.groupBy(col(stratumCol), col("__w"))
      .agg(sum(col(costCol).cast("long")).as("__cost"))
    // a target stratum ABSENT from the input would silently drop out of
    // the min (the formula says c_s = 0 ⇒ T = 0 ⇒ keep nothing); fail
    // fast instead of returning a corpus that violates the declared mix.
    // The check reads the #sources-row aggregate — bounded, one tiny job.
    // one tiny collect serves both guards: absence AND zero/NULL cost. A
    // stratum whose summed cost is 0 (or all-NULL) would make T = 0 — or
    // worse, its own rate 0/0 = NaN, which under Spark's NaN-is-largest
    // ordering passes every md5 threshold: the output would be exactly
    // the zero-cost stratum and nothing else, the opposite of the mix.
    val costRows = costs.select(col(stratumCol).cast("string"),
        col("__cost")).collect()
    val present = costRows.map(_.getString(0)).toSet
    val absent = targets.keySet -- present
    require(absent.isEmpty,
      s"target strata absent from the input (achievable mixed total is 0): $absent")
    val zeroCost = costRows.filter(r => r.isNullAt(1) || r.getLong(1) <= 0L)
      .map(_.getString(0)).toSet
    require(zeroCost.isEmpty,
      s"target strata present but with zero/NULL total $costCol " +
        s"(achievable mixed total is 0): $zeroCost")
    val tFrame = costs.agg(
      min(col("__cost").cast("double") / col("__w")).as("__t"))
    val rates = costs.crossJoin(broadcast(tFrame))
      .withColumn("__rate",
        (col("__w") * col("__t")) / col("__cost").cast("double"))
      .select(col(stratumCol), col("__rate"))
    // per-row keep filter: exactly Samples.weighted with the source's
    // rate as the row weight — one implementation of the subtle
    // scaled-threshold guards (lpad truncation at 1.0, negative clamp)
    Samples.weighted(withW.join(broadcast(rates), Seq(stratumCol)),
        idCol, "__rate", seed)
      .drop("__w", "__rate")
  }

  /**
   * Temperature-based corpus mixing (the multilingual-LM standard —
   * mT5/XLM-R/LLaMA family): instead of declaring explicit target
   * shares, flatten the NATURAL size distribution by a temperature
   * `alpha` ∈ (0, 1]. The kept mass of stratum `s` is proportional to
   * `c_s^alpha` (α = 1 keeps the natural mix, α → 0 approaches uniform),
   * realized by downsampling only (nothing upsamples): the smallest
   * stratum keeps everything and stratum `s` keeps
   * `rate_s = (c_s / c_min)^(α−1)` of its rows.
   *
   * The rate is quantized to 2^-20 before thresholding so that a
   * last-ULP difference in `pow` between engines cannot flip the kept
   * row set — the md5-threshold row selection then replicates exactly in
   * SQL (same mechanism as [[Samples.weighted]]).
   *
   * Rows with a NULL stratum are dropped (they cannot be attributed to
   * a source, and any rate for them would be arbitrary). Strata with
   * zero/NULL total cost fail loudly — their rate would be 0^negative =
   * +Inf, which under the threshold clamp silently keeps everything.
   *
   * Scale shape: one partial-aggregated pass for per-stratum costs (a
   * #strata-row frame), a broadcast rate join, and a map-only filter —
   * no full-data shuffle anywhere.
   */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        costCol: String, alpha: Double,
                        seed: Long = 42L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val rows = df.filter(col(stratumCol).isNotNull)
    val costs = rows.groupBy(col(stratumCol))
      .agg(sum(col(costCol).cast("long")).as("__cost"))
    // fail-loud guard on degenerate strata — one tiny #strata-row collect
    val bad = costs.filter(col("__cost").isNull || col("__cost") <= 0L)
      .select(col(stratumCol).cast("string")).collect()
      .map(r => if (r.isNullAt(0)) "null" else r.getString(0)).toSet
    require(bad.isEmpty,
      s"strata with zero/NULL total $costCol (rate would be undefined): $bad")
    val minF = costs.agg(min(col("__cost").cast("double")).as("__cmin"))
    // rate_s = (c_s/c_min)^(α−1), quantized to 2^-20 for engine parity
    val rates = costs.crossJoin(broadcast(minF))
      .withColumn("__rate",
        round(pow(col("__cost").cast("double") / col("__cmin"),
          lit(alpha - 1.0)) * 1048576.0) / lit(1048576.0))
      .select(col(stratumCol), col("__rate"))
    Samples.weighted(rows.join(broadcast(rates), Seq(stratumCol)),
        idCol, "__rate", seed)
      .drop("__rate")
  }

  /**
   * Epoch-style repeat-factor upsampling (the "repeat high-quality
   * sources k times per epoch" half of a data recipe — [[toTargetShares]]
   * and [[temperatureSample]] only DOWNSAMPLE): every row of stratum s
   * appears floor(f_s) times, plus one more copy with probability
   * frac(f_s), decided by the shared deterministic md5-uniform — so the
   * realized mass tracks f_s exactly in expectation and the row set is
   * reproducible across runs, partitionings, and engines. Strata absent
   * from `factors` use `defaultFactor`; factors must be finite and
   * ≥ 0 (0 drops the stratum; fail-loud on negative/NaN — a silent
   * negative would just vanish rows).
   *
   * Returns the input columns plus `copy` (1-based replica index) —
   * downstream shuffles (packing's hash order) spread replicas, and the
   * copy index keeps them distinguishable for debugging/dedup audits.
   *
   * Scale shape: map-only — a when-chain resolves per-stratum factors
   * and thresholds (broadcast-free plan literals), `explode(sequence)`
   * generates copies executor-side, the fractional copy filters on the
   * md5 prefix. No shuffle, no state.
   */
  def repeatUpsample(df: DataFrame, idCol: String, strataCol: String,
                     factors: Map[String, Double],
                     defaultFactor: Double = 1.0,
                     seed: Long = 42L): DataFrame = {
    (factors.values.toSeq :+ defaultFactor).foreach { f =>
      require(!f.isNaN && !f.isInfinite && f >= 0.0,
        s"repeat factors must be finite and >= 0; got $f")
    }
    def chain(value: Double => Column): Column =
      factors.foldLeft(value(defaultFactor)) { case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), value(f)).otherwise(acc)
      }
    val fCol = chain(f => lit(f))
    val ceilCol = chain(f => lit(math.ceil(f).toLong))
    // per-stratum md5 threshold for the fractional extra copy
    val thrCol = chain(f =>
      lit(Samples.thresholdHex(f - math.floor(f))))
    val floorCol = chain(f => lit(math.floor(f).toLong))
    df.withColumn("__f", fCol)
      .filter(col("__f") > 0)
      .withColumn("copy", explode(sequence(lit(1L), ceilCol)))
      .filter(col("copy") <= floorCol ||
        substring(md5(concat(lit(seed.toString), lit(":"),
          col(idCol).cast("string"))), 1, 8) < thrCol)
      .drop("__f")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data selection via importance resampling — DSIR (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"):
 * pick the raw-corpus documents whose n-gram distribution looks like a
 * TARGET domain by scoring each document under two cheap n-gram LMs
 * (target vs raw) and sampling with Gumbel top-k, which draws without
 * replacement proportionally to exp(importance). The standard way to
 * carve a domain-matched slice (code, medical, wiki-like, ...) out of a
 * crawl before training.
 *
 * Built on [[LangModel]]'s add-one bigram LMs: the importance weight is
 * the per-token log-likelihood ratio `ce_raw - ce_target` (both in
 * nats/token, so long documents aren't favored), and the Gumbel noise is
 * derived from the same seeded md5 uniform the Samples operators use —
 * fully deterministic, re-runnable, engine-replicable.
 *
 * Scale shape: two LM trainings + two scoring passes (each map-side
 * bigrams + key-only joins, see [[LangModel]]), one md5 per doc, and a
 * top-k. Top-k plans as TakeOrderedAndProject (per-partition heaps, one
 * k-row reduce) — right for k up to the low millions; for a
 * billion-document cut, replace the global sort with a gumbel-key
 * threshold from `approx_percentile` and keep everything map-side.
 */
object DataSelection {

  /**
   * Per-document importance weights. `llr` is the DOCUMENT log-likelihood
   * ratio in nats — `n_tokens · (ce_raw - ce_target)`, i.e.
   * `log p_target(d) - log p_raw(d)` — the paper's importance weight
   * (length-scaled: a long on-domain document IS stronger evidence than a
   * short one, and the scale is what lets the weights dominate the
   * Gumbel noise). `llr_per_token` is the length-neutral rate for
   * analysis/thresholding. Positive means target-like. Empty documents
   * carry NULL in both.
   */
  def importanceWeights(docs: DataFrame, targetModel: DataFrame,
                        rawModel: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tgt = LangModel.scorePerplexity(docs, targetModel, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("ce").as("ce_target"))
    val raw = LangModel.scorePerplexity(docs, rawModel, idCol, textCol)
      .select(col(idCol).as("__raw_id"), col("ce").as("ce_raw"))
    tgt.join(raw, col(idCol) === col("__raw_id"))
      .withColumn("llr_per_token", col("ce_raw") - col("ce_target"))
      .withColumn("llr", col("n_tokens") * col("llr_per_token"))
      .drop("__raw_id")
  }

  /**
   * The one-call DSIR cut: train the target LM on `target`, the raw LM
   * on `docs` themselves, weight every document, and keep the Gumbel
   * top-k (`key = llr - ln(-ln u)` with `u` a seeded md5 uniform —
   * deterministic sampling ∝ exp(llr), the Gumbel-max trick). Returns
   * the selected documents with their input columns. Empty documents
   * carry no evidence and are never selected.
   */
  def selectByImportance(docs: DataFrame, target: DataFrame,
                         idCol: String, textCol: String,
                         k: Int, seed: Long): DataFrame = {
    val targetModel = LangModel.trainBigramLM(target, textCol)
    val rawModel = LangModel.trainBigramLM(docs, textCol)
    val w = importanceWeights(docs, targetModel, rawModel, idCol, textCol)
      .where(col("llr").isNotNull)
    // top 32 md5 bits → uniform in (0, 1), identical in any engine
    val v = conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val u = (v + lit(1L)).cast("double") / lit(4294967297.0)
    val picked = w
      .withColumn("gumbel_key", col("llr") - log(-log(u)))
      .orderBy(desc("gumbel_key"), col(idCol))
      .limit(k)
      .select(col(idCol).as("__dsir_id"))
    docs.join(picked, col(idCol) === col("__dsir_id"), "left_semi")
  }

  /**
   * Robust per-stratum outlier flags via median / MAD (median absolute
   * deviation) — the quality-filter step that survives the heavy-tailed
   * length/score distributions real corpora have, where mean/stddev
   * z-scores are dragged by the very outliers they should catch.
   *
   * Per stratum: `med = median(value)`, `mad = median(|value − med|)`,
   * `robust_z = (value − med) / mad`; a row is an outlier when
   * `|robust_z| > threshold` (≈3.5 is the Iglewicz–Hoaglin convention;
   * multiply by 1.4826 yourself if you want σ-consistent units — this
   * operator reports the raw ratio so the SQL replica is exact).
   * Degenerate strata with `mad = 0` (over half the values identical)
   * get `robust_z = NULL` and flag any value ≠ med.
   *
   * Scale shape: two grouped EXACT-percentile aggregations (sort-based
   * within stratum — the honest cost of exact medians; swap in
   * `approx_percentile` upstream if the stratum is truly huge) producing
   * #strata-row frames, broadcast back, then a map-only flag pass. NULL
   * values and NULL strata pass through unflagged (`is_outlier` NULL) —
   * they carry no evidence either way.
   */
  def madOutliers(df: DataFrame, valueCol: String, stratumCol: String,
                  threshold: Double = 3.5): DataFrame = {
    require(threshold > 0.0, "threshold must be positive")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val v = col(valueCol).cast("double")
    val meds = df.filter(col(stratumCol).isNotNull && v.isNotNull)
      .groupBy(col(stratumCol))
      .agg(expr(s"percentile(cast($valueCol as double), 0.5)").as("__med"))
    val withMed = df.join(broadcast(meds), Seq(stratumCol), "left")
    val mads = withMed.filter(col("__med").isNotNull && v.isNotNull)
      .groupBy(col(stratumCol))
      .agg(expr(s"percentile(abs(cast($valueCol as double) - __med), 0.5)")
        .as("__mad"))
    withMed.join(broadcast(mads), Seq(stratumCol), "left")
      .withColumn("robust_z",
        when(col("__mad") > 0.0, (v - col("__med")) / col("__mad")))
      .withColumn("is_outlier",
        when(v.isNull || col("__med").isNull, lit(null).cast("boolean"))
          .when(col("__mad") > 0.0, abs(col("robust_z")) > threshold)
          .otherwise(v =!= col("__med")))
      .drop("__med", "__mad")
  }

  /**
   * Per-stratum winsorization: clamp `valueCol` into its stratum's
   * exact `[pLow, pHigh]` quantile band — the tail-taming companion to
   * [[madOutliers]] when the rows should be KEPT but their extreme
   * values must stop dominating downstream statistics (loss-weighting
   * by length, price aggregates, score calibration). Winsorizing beats
   * dropping when the tail rows carry signal and only their magnitude
   * is the problem (Dixon 1960, the classic robust-statistics trade).
   *
   * Quantiles are EXACT interpolated percentiles (sort-based within
   * stratum, same engine-portable semantics as [[madOutliers]] /
   * DuckDB's `quantile_cont`), computed for all strata in ONE grouped
   * aggregation producing a #strata-row frame that broadcasts back —
   * the data frame itself is touched by one scan and one map-only
   * clamp pass, no data-sized shuffle. NULL values and NULL strata
   * pass through unclamped (no evidence to clamp by).
   *
   * Adds `<valueCol>_w` (the clamped double); original columns are
   * untouched.
   */
  def winsorize(df: DataFrame, valueCol: String, stratumCol: String,
                pLow: Double = 0.05, pHigh: Double = 0.95): DataFrame = {
    require(pLow >= 0.0 && pHigh <= 1.0 && pLow < pHigh,
      s"need 0 <= pLow < pHigh <= 1; got [$pLow, $pHigh]")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val v = col(valueCol).cast("double")
    val bounds = df.filter(col(stratumCol).isNotNull && v.isNotNull)
      .groupBy(col(stratumCol))
      .agg(expr(s"percentile(cast($valueCol as double), ${pLow}D)").as("__qlo"),
        expr(s"percentile(cast($valueCol as double), ${pHigh}D)").as("__qhi"))
    df.join(broadcast(bounds), Seq(stratumCol), "left")
      .withColumn(s"${valueCol}_w",
        when(v.isNull || col("__qlo").isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__qlo")), col("__qhi"))))
      .drop("__qlo", "__qhi")
  }

  /**
   * Kish effective sample size of the DSIR importance weights (Kish
   * 1965; the standard importance-sampling health check): with
   * w_d ∝ exp(llr_d), ESS = (Σw)² / Σw² — ESS ≈ n means the target
   * barely re-weights the corpus (importance sampling is a no-op);
   * ESS ≪ n means a handful of documents dominate the resample and
   * the selected corpus will be near-duplicates of them. Run this
   * BEFORE paying [[selectByImportance]]'s Gumbel pass: a collapsed
   * ESS says to coarsen the target or clamp llr, not to sample.
   *
   * EXACTNESS: weights exponentiate SHIFTED llr (exp(llr − max llr),
   * the standard overflow guard — ESS is scale-invariant so the shift
   * is exact); each weight is one IEEE chain from the 4dp-rounded
   * cross-entropies [[importanceWeights]] emits; the two sums are
   * unordered double sums (charEntropy class, absorbed by the 4dp
   * rounding); NULL-llr rows (empty docs) are excluded (stated).
   *
   * Scale shape: one max aggregate + one moment aggregate over the
   * weight frame (both map-side combined); output is ONE row:
   * (`n`, `ess`, `ess_ratio`).
   */
  def importanceESS(weights: DataFrame,
                    llrCol: String = "llr"): DataFrame = {
    require(weights.columns.contains(llrCol), s"no column $llrCol")
    val base = graft.core.LineageCut.cut(
      weights.filter(col(llrCol).isNotNull)
        .select(col(llrCol).cast("double").as("__llr")))
    val m = base.agg(max("__llr").as("__m"))
    base.crossJoin(broadcast(m))
      .select(exp(col("__llr") - col("__m")).as("__w"))
      .agg(count(lit(1)).as("n"),
        sum("__w").as("__sw"),
        sum(col("__w") * col("__w")).as("__sw2"))
      .select(col("n"),
        when(col("__sw2") > 0.0,
          round(col("__sw") * col("__sw") / col("__sw2"), 4)).as("ess"),
        when(col("__sw2") > 0.0 && col("n") > 0L,
          round(col("__sw") * col("__sw") / col("__sw2") /
            col("n").cast("double"), 4)).as("ess_ratio"))
  }
}

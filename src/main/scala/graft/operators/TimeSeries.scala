package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.LineageCut._

/**
 * Regular-grid time-series preparation over irregular observation logs:
 * gap-filling resample with forward fill, and rolling-window robust
 * anomaly scores. Feature pipelines (and monitoring on pipeline
 * telemetry itself) need observations on a regular grid with explicit
 * carried-forward values, and a scale-shaped rolling z-score is the
 * standard first-line anomaly flag.
 *
 * Timestamps are long event-time (epoch-nanos) like every temporal
 * operator here; grids are integer bucket indices (floorDiv ts /
 * stepNs) so all bucket arithmetic is exact long math — no
 * timestamp-truncation semantics to disagree on cross-engine.
 */
object TimeSeries {

  /**
   * Resample each key's observations onto a regular `stepNs` grid
   * between that key's first and last observation, carrying the last
   * observed value forward through gaps (LOCF). Buckets holding
   * multiple observations keep the LATEST by (ts, id) — a total order,
   * so the kept value is unique and SQL-replayable.
   *
   * Returns (`key`, `bucket`, `value`, `filled`): one row per key per
   * grid bucket, `filled` true where the value was carried forward
   * (no observation in that bucket). Leading buckets always have an
   * observation by construction (the grid starts at the first one).
   *
   * Scale shape: (1) one (key, bucket)-keyed max-struct aggregate
   * picks each bucket's latest observation — map-side combined,
   * keys + one double move; (2) per-key min/max bucket is a second
   * keys-only aggregate; (3) the grid materializes via
   * `sequence`+`explode` on the PER-KEY bounds row — one row per
   * output bucket, generated executor-side, never a driver loop (a
   * key's grid length is bounded by its own observed span; a runaway
   * span is the caller's data bug, guarded by `maxBucketsPerKey`);
   * (4) a left join grid×observations on (key, bucket) — co-keyed,
   * AQE-planned; (5) ONE key-partitioned window (`last` ignoring
   * nulls, ordered by bucket) for the forward fill. The window sort is
   * per-key over grid rows — the honest cost of ordered filling, keyed
   * so it scales out.
   */
  def resampleFill(obs: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, valueCol: String, stepNs: Long,
                   maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(stepNs > 0, "stepNs must be positive")
    // integral `div`, NOT floor(a/b): double division loses integer
    // precision past 2^53 and epoch-nanos are ~2^60 — adjacent buckets
    // would alias (truncation == floor for non-negative event times)
    val o = obs.select(col(keyCol).as("k"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("oid"),
      col(valueCol).cast("double").as("v"))
      .withColumn("bucket", expr(s"ts div ${stepNs}L"))
    // latest observation per (key, bucket): struct max orders by
    // (ts, oid) lexicographically — deterministic under ts ties
    val perBucket = o.groupBy("k", "bucket")
      .agg(max(struct(col("ts"), col("oid"), col("v"))).as("mx"))
      .select(col("k"), col("bucket"), col("mx.v").as("obs_v"))
    val bounds = o.groupBy("k")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
    // fail loud rather than explode a quadrillion-row grid from one
    // corrupt timestamp — the guard is a FILTER predicate (a pruned
    // projection column would be optimized away, silently disarming it)
    val guarded = bounds.filter(
      when(col("b1") - col("b0") + 1 > maxBucketsPerKey,
        raise_error(concat(lit("resampleFill: key "), col("k").cast("string"),
          lit(s" spans more than $maxBucketsPerKey buckets")))
          .cast("boolean"))
        .otherwise(lit(true)))
    val grid = guarded
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val joined = grid.join(perBucket, Seq("k", "bucket"), "left")
    val w = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("value", last("obs_v", ignoreNulls = true).over(w))
      .select(col("k").as("key"), col("bucket"), col("value"),
        col("obs_v").isNull.as("filled"))
  }

  /**
   * Time-weighted average per key over irregular observations — the
   * metric monitoring systems mean by "average": each value is held
   * until the NEXT observation (step interpolation, the LOCF
   * convention [[resampleFill]] materializes), so a value that held
   * for an hour weighs 60× one that held a minute. The arithmetic
   * mean over-weights busy periods; this is the integral divided by
   * the observed span.
   *
   * Returns (`key`, `twa` 6dp, `span_ns`, `n_obs`): twa = Σ vᵢ·(tᵢ₊₁ −
   * tᵢ) / (t_n − t₁) over the (ts, id)-ordered series; the last
   * observation bounds the integral and contributes no own interval.
   * Keys with a single observation — or an all-simultaneous series —
   * have zero span and report NULL (stated rather than an engine-
   * specific 0/0 artifact: IEEE says NaN, some engines say NULL; the
   * guard makes both read the same).
   *
   * Scale shape: ONE key-partitioned (ts, id)-ordered window for
   * `lead`, then one key-keyed aggregate (map-side combined) — rows
   * carry (key, ts, id, double). Same honest per-key sequencing cost
   * as [[rollingZScore]], sharing its partitioning.
   */
  def timeWeightedAverage(obs: DataFrame, keyCol: String, tsCol: String,
                          idCol: String, valueCol: String): DataFrame = {
    val o = obs.select(col(keyCol).as("key"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("v"))
    val w = Window.partitionBy("key").orderBy(col("ts"), col("id"))
    val spanned = o.withColumn("dt",
      (lead("ts", 1).over(w) - col("ts")).cast("double"))
    spanned.groupBy("key")
      .agg(sum(col("v") * col("dt")).as("num"),
        (max("ts") - min("ts")).as("span_ns"),
        count(lit(1)).as("n_obs"))
      .select(col("key"),
        when(col("span_ns") > 0,
          round(col("num") / col("span_ns"), 6)).as("twa"),
        col("span_ns"), col("n_obs"))
  }

  /**
   * Rolling z-score anomaly flags: for each key's (ts, id)-ordered
   * series, score observation x against the mean/stddev of the
   * PRECEDING `lookback` observations (current row excluded — the
   * score is out-of-sample, an anomaly cannot mask itself), flagging
   * |z| > `threshold`. Rows with fewer than `minObs` preceding
   * observations (or zero variance) get a null score and no flag.
   *
   * The mean/stddev come from rolling Σx and Σx² in closed form
   * (sample variance (Σx² − (Σx)²/n)/(n−1)) — the exact arithmetic the
   * SQL oracle states, rather than an engine-private variance
   * algorithm, so cross-engine agreement is to fold order, absorbed by
   * 4 dp rounding (fold-order ulps are ~1e-13 relative; a 4 dp grid
   * makes a boundary flip vanishingly unlikely at any corpus size).
   *
   * Scale shape: ONE key-partitioned window computes count/Σ/Σ² over
   * `ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING`; all three share
   * the window's single exchange+sort, rows carry (key, ts, id,
   * double). The per-key sort is the honest sequencing cost; keyed, so
   * it scales out — and the frame is row-bounded, so Spark evaluates
   * it with a sliding accumulator, not a per-row rescan.
   *
   * Returns (`key`, `ts`, `id`, `value`, `z` 4dp, `anomaly`).
   */
  def rollingZScore(obs: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String, lookback: Int,
                    threshold: Double = 3.0, minObs: Int = 5): DataFrame = {
    require(lookback >= 2, "lookback must be >= 2")
    require(minObs >= 2 && minObs <= lookback,
      s"minObs must be in [2, lookback]; got $minObs vs lookback $lookback")
    val o = obs.select(col(keyCol).as("key"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("value"))
    val w = Window.partitionBy("key").orderBy(col("ts"), col("id"))
      .rowsBetween(-lookback, -1)
    val stats = o
      .withColumn("n", count("value").over(w))
      .withColumn("s1", sum("value").over(w))
      .withColumn("s2", sum(col("value") * col("value")).over(w))
    val mean = col("s1") / col("n")
    val variance = (col("s2") - col("s1") * col("s1") / col("n")) /
      (col("n") - 1)
    stats
      .withColumn("z",
        // roundz: a tiny-below-mean value rounds to zero FROM BELOW —
        // signed-zero normalized on both engines (graft.core.Num; the
        // latent case surfaced at sf0.1 in round 15's full sweep)
        when(col("n") >= minObs && variance > 0,
          graft.core.Num.roundz((col("value") - mean) / sqrt(variance),
            4)))
      .withColumn("anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
      .select("key", "ts", "id", "value", "z", "anomaly")
  }

  /**
   * Bounded-lookback exponential smoothing (EWMA with a finite window —
   * the monitoring-system form): each observation's smoothed value is
   * the decay-weighted mean of the last `lookback` observations in its
   * key's (ts, id)-ordered series, weight (decayNum/decayDen)^lag. A
   * short half-life makes weights beyond a few dozen rows numerically
   * zero anyway, so the truncation at `lookback` is the explicit,
   * SQL-replayable statement of what the infinite recurrence already
   * does in practice.
   *
   * EXACTNESS: values quantize to integers at `unitScale` (cents for
   * 2dp money) via round(v·scale); weights are the exact integers
   * num^lag · den^(lookback−1−lag); numerator and the weight sum are
   * exact long window sums, and the result is ONE IEEE division of
   * exact longs — bit-deterministic under any partitioning and any
   * engine, no fold-order or transcendental hazard anywhere. The exact
   * recurrence on doubles would be neither (engines disagree on sliding
   * -sum association order). Long-safety is checked at call time:
   * den^(lookback−1) ≤ 2³¹ bounds the weight sum by 2·2³¹, keeping
   * worst-case numerators under 2⁶³ for values to ~10⁹ units.
   *
   * Scale shape: ONE key-partitioned (ts, id)-ordered window shared by
   * all `lookback` lag terms — a single exchange+sort, rows carrying
   * (key, ts, id, long). The per-key sort is the honest sequencing
   * cost, keyed so it scales out; `lookback` is a per-ROW constant-work
   * factor, not a memory term.
   *
   * Returns (`key`, `ts`, `id`, `value`, `ewma`) — every input row,
   * smoothed; rows early in a series use however many of the
   * `lookback` lags exist (the weight sum adapts).
   */
  def ewmaSmooth(obs: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, valueCol: String, lookback: Int = 8,
                 decayNum: Long = 1L, decayDen: Long = 2L,
                 unitScale: Long = 100L): DataFrame = {
    require(lookback >= 2 && lookback <= 32,
      s"lookback must be in [2, 32]; got $lookback")
    require(decayDen > decayNum && decayNum >= 1,
      "decay must satisfy den > num >= 1")
    require(unitScale >= 1, "unitScale must be >= 1")
    val maxW = math.pow(decayDen.toDouble, (lookback - 1).toDouble)
    require(maxW <= (1L << 31).toDouble,
      s"den^(lookback-1) = $maxW exceeds the exact-long weight bound 2^31")
    def weight(lag: Int): Long = {
      var w = 1L
      var i = 0
      while (i < lag) { w *= decayNum; i += 1 }
      while (i < lookback - 1) { w *= decayDen; i += 1 }
      w
    }
    val o = obs.select(col(keyCol).as("key"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("value"))
      .withColumn("u", round(col("value") * unitScale).cast("long"))
    val w = Window.partitionBy("key").orderBy(col("ts"), col("id"))
    val terms = (0 until lookback).map { j =>
      val u = if (j == 0) col("u") else lag(col("u"), j).over(w)
      (when(u.isNotNull, u * weight(j)).otherwise(lit(0L)),
        when(u.isNotNull, lit(weight(j))).otherwise(lit(0L)))
    }
    o.withColumn("__num", terms.map(_._1).reduce(_ + _))
      .withColumn("__den", terms.map(_._2).reduce(_ + _))
      .select(col("key"), col("ts"), col("id"), col("value"),
        (col("__num").cast("double") /
          (col("__den") * unitScale).cast("double")).as("ewma"))
  }

  /**
   * Mean-shift changepoint detection: flag observations where the mean
   * of the NEXT `window` observations differs from the mean of the
   * PREVIOUS `window` by at least `minShiftUnits` quantized units —
   * the two-sample sliding scan statistic in its exact-arithmetic form.
   * Pipeline-telemetry use: level shifts in per-source document volume
   * or quality scores are the first sign of an upstream feed change.
   *
   * EXACTNESS: values quantize at `unitScale` (as [[ewmaSmooth]]); the
   * two window sums are exact longs over full windows only (rows
   * without `window` observations on BOTH sides cannot be flagged), so
   * the trigger |s_post − s_pre| ≥ minShiftUnits·window is an exact
   * integer comparison — no engine-dependent sliding-sum fold order
   * can flip a flag — and the reported means/shift are single IEEE
   * divisions of exact longs.
   *
   * Scale shape: ONE key-partitioned (ts, id)-ordered window sort
   * shared by both row-bounded frames (Spark evaluates each with a
   * sliding accumulator); rows carry (key, ts, id, long). Emits every
   * triggering row — a sustained shift triggers a run of flags whose
   * extremum is the caller's pick (returning all of them keeps the
   * operator deterministic and windowless downstream).
   *
   * Returns flagged rows only: (`key`, `ts`, `id`, `before_mean`,
   * `after_mean`, `shift`), where the "after" window STARTS at the
   * flagged row (it is the first observation of the new level).
   */
  def meanShiftChangepoints(obs: DataFrame, keyCol: String, tsCol: String,
                            idCol: String, valueCol: String, window: Int,
                            minShiftUnits: Long,
                            unitScale: Long = 100L): DataFrame = {
    require(window >= 2, "window must be >= 2")
    require(minShiftUnits >= 1, "minShiftUnits must be >= 1")
    require(unitScale >= 1, "unitScale must be >= 1")
    val o = obs.select(col(keyCol).as("key"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("value"))
      .withColumn("u", round(col("value") * unitScale).cast("long"))
    val ord = Window.partitionBy("key").orderBy(col("ts"), col("id"))
    val pre = ord.rowsBetween(-window, -1)
    val post = ord.rowsBetween(0, window - 1)
    val den = (window * unitScale).toDouble
    o.withColumn("__sa", sum("u").over(pre))
      .withColumn("__na", count("u").over(pre))
      .withColumn("__sb", sum("u").over(post))
      .withColumn("__nb", count("u").over(post))
      .filter(col("__na") === window && col("__nb") === window &&
        abs(col("__sb") - col("__sa")) >= minShiftUnits * window)
      .select(col("key"), col("ts"), col("id"),
        (col("__sa").cast("double") / den).as("before_mean"),
        (col("__sb").cast("double") / den).as("after_mean"),
        ((col("__sb") - col("__sa")).cast("double") / den).as("shift"))
  }

  /**
   * Classical additive seasonal decomposition (the moving-average
   * method behind X-11/STL's initial pass — Macaulay 1931): split a
   * regular series into trend + seasonal + residual. Trend is the
   * centered moving average of length `period` (for even periods the
   * standard 2×MA with half-weight endpoints, so the window stays
   * centered); the seasonal index of phase φ = ts mod period is the
   * mean of the detrended values at that phase; the residual is what
   * remains. Pipeline telemetry reads each part separately: trend =
   * feed growth, seasonal = day-of-week shape, residual = the
   * anomalies worth alerting on.
   *
   * EXACTNESS: values quantize at `unitScale` to exact longs (as
   * [[ewmaSmooth]]); the doubled trend numerator t2 (×2 absorbs the
   * even-period half-weights into integers) and the per-row detrended
   * numerator 2·period·u − t2 stay exact longs through the phase
   * aggregate, so `trend` and `seasonal` are SINGLE IEEE divisions of
   * exact integers and `residual` a fixed two-subtraction chain —
   * bit-deterministic cross-engine, no rounding anywhere.
   *
   * CONTRACT: `tsCol` must be a REGULAR integer time index per key
   * (consecutive, duplicate-free — compose [[resampleFill]] first);
   * any per-key step ≠ 1 fails loud with the offending key rather
   * than silently mixing phases. Trend (and residual) are NULL at the
   * ⌊period/2⌋ edge rows of each key (no full centered window);
   * seasonal indexes average FULL-window rows only and are NULL when
   * a phase has none (series shorter than ~1.5 periods).
   *
   * Scale shape: ONE key-partitioned ts-ordered window sort shared by
   * the step guard, the trend frame, and the endpoint lag/lead; the
   * phase aggregate is map-side combined onto (key, phase) —
   * #keys×period rows — and broadcast back. Rows carry (key, long,
   * long); nothing global, nothing per-pair.
   *
   * Returns (`key`, `ts`, `phase`, `value`, `trend`, `seasonal`,
   * `residual`), one row per input row.
   */
  def seasonalDecompose(obs: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, period: Int,
                        unitScale: Long = 100L): DataFrame = {
    require(period >= 2 && period <= 10000,
      s"period must be in [2, 10000]; got $period")
    require(unitScale >= 1, "unitScale must be >= 1")
    val p = period
    val hp = p / 2 // window half-width; even p widens to p+1 rows
    val even = p % 2 == 0
    val fullN = if (even) p + 1 else p
    val den2p = (2L * p * unitScale).toDouble
    val o = obs.select(col(keyCol).as("key"),
      col(tsCol).cast("long").as("ts"),
      col(valueCol).cast("double").as("value"))
      .withColumn("u", round(col("value") * unitScale).cast("long"))
    val ord = Window.partitionBy("key").orderBy("ts")
    val win = ord.rowsBetween(-hp, hp)
    // regularity guard as a FILTER predicate (a pruned projection
    // column would be optimized away, silently disarming it): any
    // gap or duplicate shows as a step ≠ 1 somewhere in the key
    val guarded = o.withColumn("__step", col("ts") - lag("ts", 1).over(ord))
      .filter(when(col("__step").isNotNull && col("__step") =!= 1L,
        raise_error(concat(lit("seasonalDecompose: key "),
          col("key").cast("string"),
          lit(" is not a regular unit-step series at ts "),
          col("ts").cast("string"))).cast("boolean"))
        .otherwise(lit(true)))
    val t2base = sum("u").over(win) * 2L
    val framed = guarded
      .withColumn("__t2", if (even)
        t2base - lag("u", hp).over(ord) - lead("u", hp).over(ord)
      else t2base)
      .withColumn("__nw", count("u").over(win))
      .withColumn("phase", pmod(col("ts"), lit(p.toLong)))
      .withColumn("__full", col("__nw") === fullN && col("__t2").isNotNull)
      .lineageCut() // phase aggregate + output join share one window pass
    val seasonalIdx = framed.groupBy("key", "phase")
      .agg(sum(when(col("__full"), lit(2L * p) * col("u") - col("__t2")))
        .as("__sd"),
        sum(when(col("__full"), 1L).otherwise(0L)).as("__nd"))
    framed.join(broadcast(seasonalIdx), Seq("key", "phase"))
      .withColumn("trend",
        when(col("__full"), col("__t2").cast("double") / den2p))
      .withColumn("seasonal", when(col("__nd") > 0,
        col("__sd").cast("double") / (col("__nd") * lit(2L * p * unitScale))
          .cast("double")))
      .withColumn("residual",
        col("value") - col("trend") - col("seasonal"))
      .select("key", "ts", "phase", "value", "trend", "seasonal", "residual")
  }

  /**
   * Sample autocorrelation function r_1..r_maxLag (Box & Jenkins 1970)
   * — the lag-structure diagnostic behind seasonality detection,
   * [[ewmaSmooth]] span choice, and "is this metric even serially
   * dependent": r_k = Σ(u_t − ū)(u_{t+k} − ū) / Σ(u_t − ū)², computed
   * against the FULL-series mean and variance (the standard estimator;
   * pairs exist only where both t and t+k are present, so missing
   * buckets shrink n_pairs rather than fabricating zeros — stated).
   *
   * EXACTNESS: values quantize at `unitScale`; clearing the ū = S/n
   * fractions gives r_k = (n²·Σu_t u_{t+k} − n·S·(H_k + T_k) +
   * (n−k)·S²) / (n·(n·Σu² − S²)) — every factor an EXACT integer
   * (DECIMAL(38,0); H_k/T_k = head/tail sums of the paired rows), ONE
   * IEEE division per lag, 6dp. The decimal headroom bounds the
   * operator: n ≤ 10⁶ rows enforced fail-loud (n²·Σuu′ must stay
   * inside 38 digits — aggregate to coarser time buckets first; an
   * ACF over more than 10⁶ points is resolution past any lag anyone
   * reads anyway).
   *
   * Scale shape: one global-moments aggregate, one broadcast of the
   * ≤ maxLag lag dimension, ONE equi-join on (t + lag) producing all
   * lag pairs in one pass, one per-lag aggregate. No window, no
   * cross join of the series with itself.
   *
   * Returns one row per lag 1..maxLag: (`lag`, `n_pairs`, `r` — NULL
   * when the series is constant or the lag has no pairs).
   */
  def autocorrelation(obs: DataFrame, tsCol: String, valueCol: String,
                      maxLag: Int, unitScale: Long = 100L): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    require(unitScale >= 1, "unitScale must be >= 1")
    val spark = obs.sparkSession
    import spark.implicits._
    val base = obs
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(tsCol).cast("long").as("t"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
      .lineageCut() // stats + both join sides share one materialization
    val dec = "decimal(38,0)"
    val stats = base.agg(count(lit(1)).as("n"),
      sum(col("u").cast(dec)).as("s"),
      sum(col("u").cast(dec) * col("u")).as("s2"))
      .filter(when(col("n") > 1000000L,
        raise_error(lit("autocorrelation: series exceeds 10^6 points " +
          "(the exact decimal(38,0) moment headroom) — aggregate to " +
          "coarser time buckets first")).cast("boolean"))
        .otherwise(lit(true)))
    val lags = (1 to maxLag).map(_.toLong).toDF("lag")
    val tails = base.crossJoin(broadcast(lags))
      .select((col("t") - col("lag")).as("t"), col("lag"),
        col("u").as("u_tail"))
    val perLag = base.join(tails, Seq("t"))
      .groupBy("lag").agg(count(lit(1)).as("n_pairs"),
        sum(col("u").cast(dec) * col("u_tail")).as("suu"),
        sum(col("u").cast(dec)).as("h"),
        sum(col("u_tail").cast(dec)).as("tl"))
    val j = broadcast(lags).join(perLag, Seq("lag"), "left")
      .crossJoin(broadcast(stats))
    val num = (col("n") * col("n") * col("suu") -
      col("n") * col("s") * (col("h") + col("tl")) +
      (col("n") - col("lag")) * (col("s") * col("s"))).cast("double")
    val den = (col("n") * (col("n") * col("s2") - col("s") * col("s")))
      .cast("double")
    j.select(col("lag").cast("int").as("lag"),
      coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
      when(col("n_pairs") > 0L && den > 0d, round(num / den, 6)).as("r"))
      .orderBy("lag")
  }

  /**
   * Sample cross-correlation function r_xy(k) for k ∈ [−maxLag,
   * maxLag] (Box & Jenkins 1970) — [[autocorrelation]]'s two-series
   * sibling and the lead/lag detector: a peak at k > 0 means x LEADS y
   * by k buckets (marketing spend → conversions, error rate → churn),
   * at k < 0 y leads x; k = 0 is plain Pearson on the overlap. Each
   * series is centered/scaled by its own FULL-series mean and variance
   * (the standard estimator — pairs exist only where both t and t+k
   * are present, missing buckets shrink n_pairs).
   *
   * EXACTNESS: both series quantize at `unitScale`; clearing the means
   * gives the numerator nx·ny·Σx·y′ − nx·Sy·H_k − ny·Sx·T_k +
   * P·Sx·Sy — every factor an EXACT DECIMAL(38,0) integer (H/T = pair
   * head/tail sums) — and r_k = Ai / √(nx·ny·Bi·Ci) with Bi/Ci the
   * exact integer variance numerators; the √ argument MULTIPLIES AS
   * DOUBLES (each exact integer converts once — the four-factor
   * integer product would overflow 38 digits where the numerator does
   * not), one fixed IEEE chain per lag, 6dp. Both series enforce the
   * ACF's n ≤ 10⁶ fail-loud decimal-headroom bound.
   *
   * Scale shape: two global-moment aggregates, one broadcast of the
   * 2·maxLag+1 lag dimension, ONE equi-join on (t + lag), one per-lag
   * aggregate — no window, no self-cross-join (the ACF contract).
   *
   * Returns one row per lag: (`lag`, `n_pairs`, `r` — NULL when either
   * series is constant or the lag has no pairs).
   */
  def crossCorrelation(obs: DataFrame, tsCol: String, xCol: String,
                       yCol: String, maxLag: Int,
                       unitScale: Long = 100L): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    require(unitScale >= 1, "unitScale must be >= 1")
    val spark = obs.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    def series(c: String): DataFrame = obs
      .filter(col(tsCol).isNotNull && col(c).isNotNull)
      .select(col(tsCol).cast("long").as("t"),
        round(col(c) * unitScale).cast("long").as("u"))
      .lineageCut()
    def moments(s: DataFrame, who: String): DataFrame = s
      .agg(count(lit(1)).as(s"n$who"),
        sum(col("u").cast(dec)).as(s"s$who"),
        sum(col("u").cast(dec) * col("u")).as(s"s2$who"))
      .filter(when(col(s"n$who") > 1000000L,
        raise_error(lit("crossCorrelation: series exceeds 10^6 points " +
          "(the exact decimal(38,0) headroom) — aggregate to coarser " +
          "buckets first")).cast("boolean")).otherwise(lit(true)))
    val xs = series(xCol)
    val ys = series(yCol)
    val mx = moments(xs, "x")
    val my = moments(ys, "y")
    val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag")
    val shifted = ys.crossJoin(broadcast(lags))
      .select((col("t") - col("lag")).as("t"), col("lag"),
        col("u").as("uy"))
    val perLag = xs.join(shifted, Seq("t"))
      .groupBy("lag").agg(count(lit(1)).as("n_pairs"),
        sum(col("u").cast(dec) * col("uy")).as("sxy"),
        sum(col("u").cast(dec)).as("h"),
        sum(col("uy").cast(dec)).as("tl"))
    val j = broadcast(lags).join(perLag, Seq("lag"), "left")
      .crossJoin(broadcast(mx)).crossJoin(broadcast(my))
    val num = (col("nx") * col("ny") * col("sxy") -
      col("nx") * col("sy") * col("h") -
      col("ny") * col("sx") * col("tl") +
      col("n_pairs") * (col("sx") * col("sy"))).cast("double")
    val bi = (col("nx") * col("s2x") - col("sx") * col("sx"))
      .cast("double")
    val ci = (col("ny") * col("s2y") - col("sy") * col("sy"))
      .cast("double")
    val den = sqrt((col("nx") * col("ny")).cast("double") * bi * ci)
    j.select(col("lag").cast("int").as("lag"),
      coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
      when(col("n_pairs") > 0L && bi > 0d && ci > 0d,
        round(num / den, 6)).as("r"))
      .orderBy("lag")
  }

  /**
   * Ljung-Box portmanteau test (Ljung & Box 1978) — "is this series
   * white noise at all?": Q = n(n+2)·Σ_{k=1..m} r_k²/(n−k) over the
   * [[autocorrelation]] estimates, the one-number gate that decides
   * whether lag structure exists before anyone reads individual r_k
   * spikes. χ²(m) under the null.
   *
   * DETERMINISM: consumes the ACF's ROUNDED 6dp r_k (the published
   * values — testing unrounded internals a consumer never sees would
   * make Q unreproducible from the ACF report); the Σ is a RUNNING
   * window fold in lag order; n(n+2) is exact long arithmetic; 4dp.
   * Lags with NULL r (no pairs / zero variance) contribute nothing
   * and are COUNTED OUT of df (reported, so a gappy series is
   * visible). Same n ≤ 10⁶ bound as the ACF.
   *
   * Returns one row: (`n`, `m`, `df_used`, `q_stat`).
   */
  def ljungBox(obs: DataFrame, tsCol: String, valueCol: String,
               maxLag: Int, unitScale: Long = 100L): DataFrame = {
    val acf = autocorrelation(obs, tsCol, valueCol, maxLag, unitScale)
      .lineageCut() // the fold + the n re-derivation share one pass
    val n = obs.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .count()
    val w = Window.orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = when(col("r").isNotNull,
      col("r") * col("r") / (lit(n.toDouble) - col("lag").cast("double")))
    acf
      .withColumn("__run", sum(term).over(w))
      .withColumn("__used", sum(when(col("r").isNotNull, 1L).otherwise(0L))
        .over(w))
      .withColumn("__rn", row_number().over(Window.orderBy("lag")))
      .filter(col("__rn") === maxLag)
      .select(lit(n).as("n"), lit(maxLag).as("m"),
        col("__used").as("df_used"),
        when(col("__used") > 0L, round(
          lit((n * (n + 2)).toDouble) * coalesce(col("__run"), lit(0.0)),
          4)).as("q_stat"))
  }

  /**
   * Lag-1 Granger causality test (Granger 1969) — "does x's PAST
   * improve the prediction of y beyond y's own past?": compares the
   * restricted AR model y_t ~ y_{t−1} against the full model
   * y_t ~ y_{t−1} + x_{t−1} via F = (RSS_r − RSS_f) / (RSS_f/(n−3)),
   * df = (1, n−3). The single-lag form is deliberately the WHOLE
   * operator: its 2×2 normal-equation solve has a CLOSED FORM, so the
   * entire test runs IN-PLAN as fixed IEEE chains on exact integer
   * moments — no driver solve, no iteration, SQL-replayable
   * term-for-term (higher lag orders need a general solver and a
   * p-order model-selection story; at that point fit outside the
   * engine). Statistic-only with both dfs (the anovaF convention).
   *
   * EXACTNESS: both series quantize at `unitScale` (cancels in F);
   * the ten raw moments over the complete (t ≥ 2) rows accumulate as
   * EXACT DECIMAL(38,0); centered sums, the 2×2 Cramer solve
   * (det = Szz₁·Szz₂ − Szz₁₂²; quadratic form closed-form), both RSS
   * and F are fixed chains from those exact integers, 4dp. NULL F on
   * a degenerate design (det ≤ 0 — collinear or constant lags — or
   * RSS_f ≤ 0) or n < 4.
   *
   * Scale shape: one ordered lag window over the SERIES (single-task
   * — `maxRows` fails loud, the [[pettittTest]] convention), one
   * map-side-combined moment aggregate to ONE row.
   *
   * Output one row: (`n`, `df1`, `df2`, `rss_r`, `rss_f`, `f_stat`).
   */
  def grangerLag1(obs: DataFrame, tsCol: String, idCol: String,
                  xCol: String, yCol: String,
                  unitScale: Long = 100L,
                  maxRows: Long = 10000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxRows >= 2, s"maxRows must be >= 2: $maxRows")
    val dec = "decimal(38,0)"
    val base = obs
      // null ids dropped: a NULL id in the (ts, id) ordered fold sorts
      // first in Spark but last under the SQL-oracle convention, so
      // equal-ts ties could fold in a different order across engines
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy"))
      .lineageCut()
    val nRows = base.count()
    require(nRows <= maxRows,
      s"grangerLag1: $nRows rows exceeds maxRows=$maxRows — the ordered " +
        "lag window runs the series through ONE task; aggregate to a " +
        "coarser grid upstream or raise maxRows deliberately")
    val wOrd = Window.orderBy("ts", "id")
    val lagged = base
      .withColumn("__y1", lag(col("uy"), 1).over(wOrd))
      .withColumn("__x1", lag(col("ux"), 1).over(wOrd))
      .filter(col("__y1").isNotNull && col("__x1").isNotNull)
    def d(c: org.apache.spark.sql.Column) = c.cast(dec)
    val mom = lagged.agg(count(lit(1)).as("n"),
      sum(d(col("uy"))).as("sy"),
      sum(d(col("uy")) * col("uy")).as("syy"),
      sum(d(col("__y1"))).as("s1"),
      sum(d(col("__y1")) * col("__y1")).as("s11"),
      sum(d(col("__x1"))).as("s2"),
      sum(d(col("__x1")) * col("__x1")).as("s22"),
      sum(d(col("uy")) * col("__y1")).as("sy1"),
      sum(d(col("uy")) * col("__x1")).as("sy2"),
      sum(d(col("__y1")) * col("__x1")).as("s12"))
    val nD = col("n").cast("double")
    def cd(name: String) = col(name).cast("double")
    // centered sums (fixed chains from the exact raw moments)
    val cyy = cd("syy") - cd("sy") * cd("sy") / nD
    val c11 = cd("s11") - cd("s1") * cd("s1") / nD
    val c22 = cd("s22") - cd("s2") * cd("s2") / nD
    val c1y = cd("sy1") - cd("s1") * cd("sy") / nD
    val c2y = cd("sy2") - cd("s2") * cd("sy") / nD
    val c12 = cd("s12") - cd("s1") * cd("s2") / nD
    val det = c11 * c22 - c12 * c12
    val rssR = when(c11 > 0.0, cyy - c1y * c1y / c11)
    val rssF = when(det > 0.0, cyy -
      (c22 * c1y * c1y - lit(2.0) * c12 * c1y * c2y + c11 * c2y * c2y) /
        det)
    val fStat = when(col("n") >= 4L && det > 0.0 && c11 > 0.0 &&
      rssF > 0.0,
      (rssR - rssF) / (rssF / (col("n") - 3L).cast("double")))
    mom.select(col("n"), lit(1).as("df1"),
      (col("n") - 3L).as("df2"),
      when(c11 > 0.0, round(rssR, 4)).as("rss_r"),
      when(det > 0.0, round(rssF, 4)).as("rss_f"),
      round(fStat, 4).as("f_stat"))
  }

  /**
   * Granger causality at lag order `p` ∈ [1, 8] (Granger 1969) — the
   * general form of [[grangerLag1]]: restricted AR(p) model
   * y_t ~ 1 + y_{t−1..t−p} against the full model adding
   * x_{t−1..t−p}, F = ((RSS_r − RSS_f)/p) / (RSS_f/(n − 2p − 1)),
   * df = (p, n − 2p − 1). Past lag 1 the normal equations have no
   * closed form, so the solve runs DRIVER-SIDE over the collected
   * exact moments (the [[graft.operators.Events]] Markov-absorption
   * pattern: bounded driver flops, corpus-independent): the driver
   * holds one (2p+1)×(2p+2) double matrix per model and runs fixed-
   * pivot Gaussian elimination — ≤ 17³ flops at the p = 8 cap,
   * microseconds regardless of series length.
   *
   * EXACTNESS: both series quantize at `unitScale` (cancels in F); ALL
   * raw moments (Σ z_i z_j over the complete t > p rows, z the design
   * vector) accumulate as EXACT DECIMAL(38,0) and convert to double
   * ONCE (correctly-rounded, = the oracle's HUGEINT→DOUBLE cast); the
   * elimination runs in FIXED pivot order with the exact update/back-
   * substitution operation ORDER the SQL oracle replays term-for-term;
   * RSS = y'y − Σ_j β_j·(X'y)_j folds left-associatively. Outputs
   * round 4dp through [[graft.core.Num.roundz]] (an over-fitted
   * RSS_r − RSS_f can round to zero from below). NULL rss/F on a
   * degenerate design (a vanishing fixed pivot surfaces as a
   * non-finite value — no magnitude pivoting, matching the oracle) or
   * n < 2p + 2.
   *
   * Scale shape: one ordered lag window over the SERIES (single-task —
   * `maxRows` fails loud, the [[pettittTest]] convention), one
   * map-side-combined moment aggregate to ONE row of ≤ 2p² + 5p + 3
   * cells, a bounded driver solve.
   *
   * Output one row: (`n`, `df1`, `df2`, `rss_r`, `rss_f`, `f_stat`).
   */
  def grangerTest(obs: DataFrame, tsCol: String, idCol: String,
                  xCol: String, yCol: String, p: Int,
                  unitScale: Long = 100L,
                  maxRows: Long = 10000000L): DataFrame = {
    require(p >= 1 && p <= 8, s"lag order p must be in [1, 8]: $p")
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxRows >= 2, s"maxRows must be >= 2: $maxRows")
    val spark = obs.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val base = obs
      // null ids dropped: a NULL id in the (ts, id) ordered fold sorts
      // first in Spark but last under the SQL-oracle convention, so
      // equal-ts ties could fold in a different order across engines
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy"))
      .lineageCut()
    val nRows = base.count()
    require(nRows <= maxRows,
      s"grangerTest: $nRows rows exceeds maxRows=$maxRows — the ordered " +
        "lag window runs the series through ONE task; aggregate to a " +
        "coarser grid upstream or raise maxRows deliberately")
    val wOrd = Window.orderBy("ts", "id")
    // design vector z = (1, y_{t-1..t-p}, x_{t-1..t-p}); complete rows
    val lagCols = (1 to p).map(k => lag(col("uy"), k).over(wOrd)
      .as(s"__y$k")) ++ (1 to p).map(k => lag(col("ux"), k).over(wOrd)
      .as(s"__x$k"))
    val names = (1 to p).map(k => s"__y$k") ++ (1 to p).map(k => s"__x$k")
    val lagged = base.select((col("uy") +: lagCols): _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
    def dc(c: org.apache.spark.sql.Column) = c.cast(dec)
    val d = 2 * p + 1
    // one row of exact-decimal moments: n, y'y, the design sums, all
    // z_i z_j pair products (i <= j), and X'y
    val aggs = Seq(count(lit(1)).as("n"),
      sum(dc(col("uy")) * col("uy")).as("syy"),
      sum(dc(col("uy"))).as("q0")) ++
      names.zipWithIndex.map { case (nm, i) =>
        sum(dc(col(nm))).as(s"s${i + 1}") } ++
      (for (i <- 0 until 2 * p; j <- i until 2 * p) yield
        sum(dc(col(names(i))) * col(names(j))).as(s"s${i + 1}_${j + 1}")) ++
      names.zipWithIndex.map { case (nm, i) =>
        sum(dc(col(nm)) * col("uy")).as(s"q${i + 1}") }
    val row = lagged.agg(aggs.head, aggs.tail: _*).collect().head
    def cell(name: String): Double = {
      val v = row.getAs[java.math.BigDecimal](name)
      if (v == null) Double.NaN else v.doubleValue()
    }
    val nC = row.getAs[Long]("n")
    val nD = nC.toDouble
    val syy = cell("syy")
    // S(i,j) over design indices 0..2p (0 = intercept), X'y as q(i)
    def s(i: Int, j: Int): Double = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      if (a == 0 && b == 0) nD
      else if (a == 0) cell(s"s$b")
      else cell(s"s${a}_$b")
    }
    def q(i: Int): Double = cell(s"q$i")
    // fixed-pivot elimination + back-substitution, then
    // RSS = y'y − Σ β_j (X'y)_j — operation order pinned (the SQL
    // oracle replays it term-for-term)
    def rssOf(dim: Int): Double = {
      val m = Array.tabulate(dim, dim + 1)((i, j) =>
        if (j == dim) q(i) else s(i, j))
      var k = 0
      while (k < dim - 1) {
        var i = k + 1
        while (i < dim) {
          var j = k + 1
          while (j <= dim) {
            m(i)(j) = m(i)(j) - (m(i)(k) / m(k)(k)) * m(k)(j)
            j += 1
          }
          i += 1
        }
        k += 1
      }
      val v = new Array[Double](dim)
      var i = dim - 1
      while (i >= 0) {
        var acc = m(i)(dim)
        var j = i + 1
        while (j < dim) { acc = acc - m(i)(j) * v(j); j += 1 }
        v(i) = acc / m(i)(i)
        i -= 1
      }
      // β_j multiplies the ORIGINAL (X'y)_j — not the eliminated cell
      var rss = syy
      var j2 = 0
      while (j2 < dim) { rss = rss - v(j2) * q(j2); j2 += 1 }
      rss
    }
    val rssR = rssOf(p + 1)
    val rssF = rssOf(d)
    val fin = (x: Double) => java.lang.Double.isFinite(x)
    val rssROpt = if (fin(rssR)) Some(rssR) else None
    val rssFOpt = if (fin(rssF)) Some(rssF) else None
    val fOpt = if (nC >= 2L * p + 2L && fin(rssR) && fin(rssF) &&
        rssF > 0.0)
      Some(((rssR - rssF) / p.toDouble) / (rssF / (nC - 2L * p - 1L)))
    else None
    Seq((nC, p, nC - 2L * p - 1L, rssROpt, rssFOpt, fOpt))
      .toDF("n", "df1", "df2", "rss_r", "rss_f", "f_stat")
      .select(col("n"), col("df1"), col("df2"),
        graft.core.Num.roundz(col("rss_r"), 4).as("rss_r"),
        graft.core.Num.roundz(col("rss_f"), 4).as("rss_f"),
        graft.core.Num.roundz(col("f_stat"), 4).as("f_stat"))
  }

  /**
   * Two-sided CUSUM drift detector (Page 1954) — the sequential
   * small-shift monitor next to [[meanShiftChangepoints]] (window
   * votes on a LOCAL level jump) and [[pettittTest]] (one global
   * split): S⁺_t = max(0, S⁺_{t−1} + (x_t − target − slack)) and
   * S⁻_t = max(0, S⁻_{t−1} + (target − slack − x_t)) accumulate
   * drift above/below the target, alarming when either side exceeds
   * `threshold` — the classic "many tiny exceedances nobody's window
   * catches" detector.
   *
   * EXACTNESS: values and the target/slack/threshold quantize at
   * `unitScale`, so both recursions run on EXACT LONGS — and the
   * max(0, ·) recursion is NOT a window primitive, but its closed
   * form is: S_t = P_t − min(0, min_{i≤t} P_i) with P the plain
   * running sum of the increments (one running-sum + one running-min
   * window per side, both exact integer folds — no recursion, no
   * UDF). Outputs divide units back once (exact int-derived
   * divisions, no rounding needed); `alarm` is an integer compare.
   *
   * Scale shape: TWO ordered window passes over the SERIES in one
   * projection — single-task, so `maxRows` fails loud (house
   * convention; CUSUM on 10⁹ raw points has no more power than on
   * bucket means — aggregate upstream).
   *
   * Output one row per observation: (`ts`, `id`, `value`, `s_pos`,
   * `s_neg`, `alarm`).
   */
  def cusumDetect(obs: DataFrame, tsCol: String, idCol: String,
                  valueCol: String, target: Double, slack: Double,
                  threshold: Double, unitScale: Long = 100L,
                  maxRows: Long = 10000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(slack >= 0.0, s"slack must be >= 0: $slack")
    require(threshold > 0.0, s"threshold must be > 0: $threshold")
    require(maxRows >= 1, s"maxRows must be >= 1: $maxRows")
    val uT = math.round(target * unitScale)
    val uK = math.round(slack * unitScale)
    val uH = math.round(threshold * unitScale)
    require(uH > 0, "threshold quantizes to 0 units — raise unitScale")
    // null ids dropped (the grangerTest convention): the (ts, id)
    // fold's null placement differs across engines on equal-ts ties
    val base = obs
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
      .lineageCut()
    val n = base.count()
    require(n <= maxRows,
      s"cusumDetect: $n rows exceeds maxRows=$maxRows — the ordered " +
        "CUSUM folds run the series through ONE task; aggregate to a " +
        "coarser grid upstream or raise maxRows deliberately")
    val wRun = Window.orderBy("ts", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dPos = col("u") - lit(uT) - lit(uK)
    val dNeg = lit(uT) - lit(uK) - col("u")
    val folded = base
      .withColumn("__pp", sum(dPos).over(wRun))
      .withColumn("__pn", sum(dNeg).over(wRun))
      .withColumn("__sp", col("__pp") -
        least(lit(0L), min(col("__pp")).over(wRun)))
      .withColumn("__sn", col("__pn") -
        least(lit(0L), min(col("__pn")).over(wRun)))
    folded.select(col("ts"), col("id"),
      (col("u").cast("double") / unitScale).as("value"),
      (col("__sp").cast("double") / unitScale).as("s_pos"),
      (col("__sn").cast("double") / unitScale).as("s_neg"),
      (col("__sp") > uH || col("__sn") > uH).as("alarm"))
  }

  /**
   * Pettitt changepoint test (Pettitt 1979) — the rank-based,
   * distribution-free single-changepoint detector that complements
   * [[meanShiftChangepoints]]: no window size to pick and no shift
   * magnitude to threshold — the statistic K = max_t |U_t| with
   * U_t = 2·Σ_{i ≤ t} r_i − t(n+1) (r_i the value ranks in time
   * order) locates the most likely split of the series into two
   * samples with different distributions, and the approximate
   * significance p ≈ 2·exp(−6K²/(n³ + n²)) says whether to believe
   * it.
   *
   * EXACTNESS: values quantize at `unitScale` (the welchTTest
   * convention); ties take AVERAGE ranks carried as DOUBLED integers
   * (min rank + max rank per value level — the spearman machinery), so
   * U_t = Σ R2_i − t(n+1) is EXACT INTEGER arithmetic end-to-end; K
   * and its earliest-argmax location are integer comparisons; p is ONE
   * IEEE chain from K and n (6dp, clipped at 1). The rank tiebreak
   * inside a level is (value, ts, id) — a total order, so level
   * min/max ranks are deterministic.
   *
   * Scale shape: one rank pass + level collapse (the spearman shape),
   * then ordered running windows over the SERIES — the whole series
   * moves through single-task windows, so `maxRows` fails loud (house
   * convention; aggregate to a coarser grid upstream past it: Pettitt
   * on 10⁹ raw points has no more power than on 10⁶ bucket means).
   *
   * Output one row: (`n`, `k_stat`, `t_change` — the LAST timestamp of
   * the first segment, earliest on ties — and `p_value`).
   */
  def pettittTest(obs: DataFrame, tsCol: String, idCol: String,
                  valueCol: String, unitScale: Long = 100L,
                  maxRows: Long = 10000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxRows >= 2, s"maxRows must be >= 2: $maxRows")
    val base = obs
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
      .lineageCut() // the gate count + rank pass share one read
    val n = base.count()
    require(n <= maxRows,
      s"pettittTest: $n rows exceeds maxRows=$maxRows — the ordered " +
        "rank/fold windows run the series through ONE task; aggregate " +
        "to a coarser grid upstream or raise maxRows deliberately")
    // doubled average rank per value level: rank all rows by
    // (u, ts, id), collapse to per-level min+max. With R2 = 2r,
    // Σ_{i≤t} R2_i = 2·Σ r_i, so Pettitt's U_t = 2Σr_i − t(n+1)
    // computes DIRECTLY as (running ΣR2) − t(n+1) — exact longs.
    val wVal = Window.orderBy(col("u"), col("ts"), col("id"))
    val ranked = base.withColumn("__rn", row_number().over(wVal))
    val lev = ranked.groupBy("u")
      .agg((min("__rn") + max("__rn")).cast("long").as("__r2"))
    val wOrd = Window.orderBy(col("ts"), col("id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wTot = Window.orderBy(col("ts"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val u = base.join(lev, "u")
      .withColumn("__t", row_number().over(wOrd).cast("long"))
      .withColumn("__u",
        sum("__r2").over(wRun) - col("__t") * lit(n + 1L))
      .withColumn("__absu", abs(col("__u")))
    val kRow = u
      .withColumn("__kmax", max(col("__absu")).over(wTot))
      .filter(col("__absu") === col("__kmax"))
      // earliest argmax: one more ordered pick over the (tiny) tied set
      .withColumn("__pick", row_number().over(wOrd))
      .filter(col("__pick") === 1)
    kRow.select(lit(n).as("n"), col("__absu").as("k_stat"),
      col("ts").as("t_change"),
      round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) *
        col("__absu").cast("double") * col("__absu").cast("double") /
        (lit(n.toDouble) * n * n + lit(n.toDouble) * n))), 6)
        .as("p_value"))
  }
}

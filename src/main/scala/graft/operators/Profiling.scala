package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.LineageCut.CutOps

/**
 * Ingest-side data profiling: per-column null counts, distinct counts,
 * and min/max in ONE aggregation pass over the frame — the "what did we
 * actually receive" gate a 100 TB drop needs before any pipeline stage
 * trusts the data (null-rate spikes and cardinality collapses are the
 * two classic upstream-breakage signatures).
 *
 * Output rows: `(col_name, n_rows, n_nulls, n_distinct, min_value,
 * max_value)` — min/max cast to string so heterogeneous columns share
 * one schema (bigint/string casts are engine-identical; profile
 * float columns with `approxDistinct` knowing their string forms are
 * engine-specific).
 *
 * Scale shape: everything partial-aggregates map-side. With exact
 * distinct counts Spark plans one Expand (input × #profiled columns) —
 * fine for a scan-bounded profile of a few columns; at the 100 TB tier
 * set `approxDistinct = true` (HLL, no Expand, one sketch per column
 * per partition moves). The final `stack` runs over the single
 * aggregated row — driver never touches data.
 */
object Profiling {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "nothing to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val aggs = cols.flatMap { c =>
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        distinct.as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val agged = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nulls_$c, __distinct_$c, __min_$c, __max_$c").mkString(", ")
    agged.select(col("__rows"),
        expr(s"stack(${cols.size}, $stackArgs) " +
          "as (col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("__rows").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /**
   * Corpus snapshot diff — classify every key across two versions of a
   * table as `added` / `removed` / `changed` (unchanged rows are
   * omitted; at 100 TB they are ~everything, and emitting them would
   * make the diff as big as the corpus). THE daily-drop audit: what did
   * yesterday's pipeline run actually do to the corpus?
   *
   * Scale shape: each side is projected to `(key, xxhash64(payload))`
   * BEFORE the full-outer join, so the shuffle carries 16 bytes per
   * row, never document text. `changed` therefore means "64-bit payload
   * hashes differ" — a colliding changed-pair (2⁻⁶⁴ per pair) would
   * misreport as unchanged; the add/remove classes are hash-free and
   * exact. Null payload columns hash as a fixed sentinel (Spark's
   * xxhash64 null contract), so null→value edits are real changes.
   *
   * `keyCol` must be unique per side (it is the join key; duplicate
   * keys would cross-product and inflate every class). A cross-product
   * is not detectable post-join, so `checkUniqueKeys` (default ON)
   * verifies it up front with one count-distinct aggregate per side —
   * noise next to a silently wrong audit table; switch it off only
   * when uniqueness is already guaranteed by the sink that wrote the
   * snapshots.
   *
   * Returns (`key`, `change`) with `change` ∈ added|removed|changed.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   compareCols: Seq[String],
                   checkUniqueKeys: Boolean = true): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def sig(df: DataFrame, side: String): DataFrame = {
      if (checkUniqueKeys) {
        val r = df.agg(count(lit(1)).as("n"),
          countDistinct(col(keyCol)).as("d")).head()
        require(r.getLong(0) == r.getLong(1),
          s"snapshotDiff $side side: key '$keyCol' is not unique " +
            s"(${r.getLong(0)} rows, ${r.getLong(1)} distinct keys) — " +
            s"the diff join would cross-product")
      }
      df.select(col(keyCol).as(s"__k_$side"),
        xxhash64(compareCols.map(col): _*).as(s"__h_$side"))
    }
    val o = sig(oldDf, "old")
    val n = sig(newDf, "new")
    o.join(n, col("__k_old") === col("__k_new"), "full_outer")
      .select(
        coalesce(col("__k_old"), col("__k_new")).as("key"),
        when(col("__k_old").isNull, lit("added"))
          .when(col("__k_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
      .filter(col("change") =!= "unchanged")
  }

  /**
   * Pairwise Pearson correlation matrix of numeric columns, in ONE
   * map-side-combined aggregation pass (every `corr` pair is a
   * co-moment accumulator; the frame is scanned once regardless of
   * pair count). The redundancy detector of a feature-profiling gate:
   * two near-perfectly-correlated quality signals are one signal.
   *
   * Emits the upper triangle including the diagonal, one row per pair:
   * (`col_a`, `col_b`, `corr`), 6dp (absorbs co-moment
   * accumulation-order ulps across engines). Constant columns have no
   * defined correlation — NULL, as both engines agree.
   */
  def correlationMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, "need at least two columns")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val pairs = for {
      (a, i) <- columns.zipWithIndex
      b <- columns.drop(i)
    } yield (a, b)
    // explicit covar/stddev form rather than corr(): Spark's corr
    // finalizes with a plain division, which THROWS on a zero-variance
    // column under ANSI mode; try_divide returns the NULL the contract
    // wants (and DuckDB mirrors it with NULLIF)
    val aggs = pairs.map { case (a, b) =>
      val (x, y) = (col(a).cast("double"), col(b).cast("double"))
      round(try_divide(covar_samp(x, y), stddev_samp(x) * stddev_samp(y)), 6)
        .as(s"__c_${a}__$b")
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', __c_${a}__$b"
    }.mkString(", ")
    agged.select(expr(s"stack(${pairs.size}, $stackArgs) " +
      "as (col_a, col_b, corr)"))
  }

  /**
   * Equi-depth (quantile-boundary) histogram — the companion of the
   * equi-width [[histogram]] for heavy-tailed columns where fixed-width
   * buckets put 99% of rows in bucket 0. Boundaries are the exact
   * interpolated `i/nBuckets` quantiles (one grouped percentile
   * aggregate — engine-portable, same semantics as DuckDB
   * `quantile_cont`); each row's bucket is then `Σ_i [v > boundary_i]`
   * over the interior boundaries — a map-only codegen'd comparison
   * chain against plan constants. NO global sort and no ntile window:
   * a single-partition ranking of 10¹¹ rows is exactly the task a
   * 100 TB profile cannot run, while the boundary aggregate moves one
   * percentile state per partition.
   *
   * With duplicate-heavy data the bucket POPULATIONS are unequal (all
   * equal values share a bucket — the honest semantics of value-based
   * boundaries); the boundaries are still exact quantiles.
   *
   * Returns (`bucket`, `n`) for non-empty buckets, plus each bucket's
   * value range is recoverable from the boundaries; `n` sums to the
   * non-null row count.
   */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val v = col(valueCol).cast("double")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bounds = df.agg(expr(
        s"percentile(cast($valueCol as double), array(${probs.map(p => s"${p}D").mkString(", ")}))")
        .as("b")).head().getSeq[Double](0)
    val bucket = bounds.map(b => when(v > b, 1).otherwise(0))
      .reduce(_ + _)
    df.filter(v.isNotNull)
      .select(bucket.cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /**
   * Cramér's V association between two CATEGORICAL columns — the
   * categorical companion of [[correlationMatrix]] (Pearson on
   * categories is meaningless; χ²-based V ∈ [0, 1] is the standard
   * measure): χ² over the full contingency table (zero-observed cells
   * INCLUDED — their expected counts still contribute, and skipping
   * them understates association), V = √(χ² / (n·min(r−1, c−1))).
   *
   * Scale shape: one (a, b)-keyed count aggregate (map-side combined)
   * builds the observed table; marginals are keys-only aggregates OVER
   * THAT TABLE (≪ rows); the r×c expected grid is a cross join of two
   * category frames — categorical cardinalities, not data. Rows with a
   * NULL on either side are excluded (a null category is missingness,
   * not a level; profile it with [[profile]]'s null counts).
   *
   * Returns one row: (`n`, `r`, `c`, `chi2` 6dp, `cramers_v` 6dp);
   * degenerate single-level tables (min(r,c) = 1) report NULL V —
   * association is undefined with one category.
   */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val o = base.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ra = o.groupBy("a").agg(sum("o").as("na"))
    val cb = o.groupBy("b").agg(sum("o").as("nb"))
    val stats = base.agg(count(lit(1)).as("n")).head()
    val n = stats.getLong(0)
    require(n > 0, "cramersV on an empty (or all-null) frame")
    val e = col("na").cast("double") * col("nb") / n
    val cells = ra.crossJoin(cb)
      .join(o, Seq("a", "b"), "left")
      .select(col("na"), col("nb"),
        coalesce(col("o"), lit(0L)).as("o"))
      .select((((col("o") - e) * (col("o") - e)) / e).as("cell"))
    cells.agg(sum("cell").as("chi2"))
      .crossJoin(ra.agg(count(lit(1)).as("r")))
      .crossJoin(cb.agg(count(lit(1)).as("c")))
      .select(lit(n).as("n"), col("r"), col("c"),
        round(col("chi2"), 6).as("chi2"),
        when(least(col("r"), col("c")) >= 2,
          round(sqrt(col("chi2") /
            (lit(n.toDouble) * (least(col("r"), col("c")) - 1))), 6))
          .as("cramers_v"))
  }

  /**
   * Cohen's kappa inter-rater agreement (Cohen 1960): how much two
   * labelers agree BEYOND what their marginal label rates predict by
   * chance — the standard audit when two annotation sources label the
   * same corpus (declared metadata vs a heuristic classifier, two
   * model-generated label sets, human vs silver labels). Raw percent
   * agreement rewards majority-class collapse; kappa doesn't.
   *
   * EXACTNESS: with n rows, `agree` diagonal matches, and S =
   * Σ_label nA·nB the marginal-product sum, kappa = (n·agree − S) /
   * (n² − S) — numerator and denominator EXACT longs, one IEEE
   * division (likewise po = agree/n and pe = S/n²). No intermediate
   * double ever sums. n is guarded at 3·10⁹ so n² stays in-range;
   * pe = 1 (both raters constant — the undefined case) reports NULL
   * kappa rather than an engine-specific 0/0.
   *
   * Scale shape: ONE map-side-combined (a, b) contingency aggregate —
   * exchanges carry label-pair cardinality, never rows; marginals,
   * diagonal, and S all derive from that tiny table. Null labels on
   * either side are excluded (not a category).
   *
   * Returns one row: (`n`, `agree`, `po`, `pe`, `kappa`).
   */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
      .lineageCut() // totals, diagonal, and both marginals share it
    val tot = o.agg(sum("o").as("n"),
      sum(when(col("a") === col("b"), col("o")).otherwise(0L)).as("agree"))
      .filter(when(col("n") > 3000000000L,
        raise_error(lit("cohensKappa: n exceeds the exact n² long range"))
          .cast("boolean")).otherwise(lit(true)))
    val s = o.groupBy("a").agg(sum("o").as("na"))
      .join(o.groupBy("b").agg(sum("o").as("nb")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("s"))
    tot.crossJoin(s).select(col("n"), col("agree"),
      (col("agree").cast("double") / col("n").cast("double")).as("po"),
      (col("s").cast("double") / (col("n") * col("n")).cast("double"))
        .as("pe"),
      when(col("n") * col("n") =!= col("s"),
        (col("n") * col("agree") - col("s")).cast("double") /
          (col("n") * col("n") - col("s")).cast("double")).as("kappa"))
  }

  /**
   * Benford's-law first-digit audit: the observed leading-digit
   * distribution of a positive numeric column against Benford's
   * log₁₀(1 + 1/d) expectation, with per-digit χ² contributions — the
   * classic fabricated-data / synthetic-corruption screen for
   * naturally-scaled quantities (amounts, populations, file sizes).
   * Zero/negative/null values are excluded (Benford applies to
   * positive magnitudes).
   *
   * The leading digit is extracted TEXTUALLY (first digit char of the
   * plain decimal rendering) — floating-point division chains disagree
   * cross-engine on boundary magnitudes; the first significant decimal
   * digit of the value is a string fact both engines agree on.
   *
   * Scale shape: map-only digit extraction → one ≤ 9-group aggregate;
   * the expectation join is a 9-row literal. Returns one row per digit
   * 1-9: (`digit`, `observed`, `obs_share` 6dp, `benford_share` 6dp,
   * `chi2_term` 6dp — Σ over digits is the χ² statistic against
   * n·benford).
   */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pos = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("v") > 0)
    // fail loud on non-finite input: +Infinity (and NaN, which Spark
    // orders above every real value so it passes v > 0 too) renders
    // without a [1-9] digit and would otherwise vanish from both the
    // counts and n with no signal — corrupt input, not a distribution
    // fact. One map-only aggregate doubles as the n > 0 gate.
    val row = pos.agg(count(lit(1)).as("n"),
      sum(when(isnan(col("v")) ||
        col("v") === lit(Double.PositiveInfinity), 1L)
        .otherwise(0L)).as("bad")).head()
    val n = row.getLong(0)
    val bad = if (row.isNullAt(1)) 0L else row.getLong(1)
    require(bad == 0,
      s"benfordAudit input has $bad non-finite positive value(s) " +
        "(NaN/+Infinity) — they carry no leading decimal digit; clean " +
        "the column first")
    require(n > 0, "benfordAudit needs positive values")
    val digits = pos
      // strip sign/zeros/dot: first char in 1-9 of the decimal rendering
      .select(regexp_extract(col("v").cast("string"),
        "([1-9])", 1).as("d"))
      .filter(col("d") =!= "")
      .select(col("d").cast("int").as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("observed"))
    val expect = (1 to 9).map(d =>
      (d, math.log10(1.0 + 1.0 / d))).toDF("digit", "benford_share")
    expect.join(counts, Seq("digit"), "left")
      .select(col("digit"),
        coalesce(col("observed"), lit(0L)).as("observed"),
        col("benford_share"))
      .select(col("digit"), col("observed"),
        round(col("observed") / n.toDouble, 6).as("obs_share"),
        round(col("benford_share"), 6).as("benford_share"),
        round(((col("observed") - lit(n) * col("benford_share")) *
          (col("observed") - lit(n) * col("benford_share"))) /
          (lit(n) * col("benford_share")), 6).as("chi2_term"))
  }

  /**
   * Functional-dependency check: does `detCol` determine `depCol`
   * (every determinant value maps to exactly one dependent value)?
   * The schema-inference / data-quality primitive behind key
   * discovery and denormalization audits — a violated "id → payload"
   * dependency is exactly the duplicate-key corruption
   * [[snapshotDiff]] fails loudly on.
   *
   * NULL determinants are excluded (a null key determines nothing);
   * NULL dependents count as a value (two rows mapping one key to
   * NULL and 'x' ARE a violation — null-safe distinctness).
   *
   * Scale shape: one (det, dep)-keyed distinct (map-side combined)
   * then one det-keyed count — keys only, no payloads. Returns one
   * row: (`n_keys`, `n_violating`, `holds`).
   */
  def functionalDependency(df: DataFrame, detCol: String,
                           depCol: String): DataFrame = {
    val pairs = df.filter(col(detCol).isNotNull)
      .select(col(detCol).as("k"), col(depCol).as("v"))
      .distinct()
    pairs.groupBy("k").agg(count(lit(1)).as("nv"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("nv") > 1, 1L).otherwise(0L)).as("n_violating"))
      .select(col("n_keys"), col("n_violating"),
        (col("n_violating") === 0).as("holds"))
  }

  /**
   * Mutual information (nats) between two categorical columns, with
   * entropies and the normalized form NMI = MI/√(H(a)·H(b)) — the
   * information-theoretic companion of [[cramersV]] (χ² weights rare
   * co-occurrences differently; reporting both is standard feature-
   * screening practice). Zero-observed cells contribute exactly 0
   * (lim p→0 of p·ln p — only OBSERVED cells enter, unlike χ²'s
   * expected grid).
   *
   * Scale shape: identical to [[cramersV]] minus the grid — one
   * (a, b)-keyed count, keys-only marginals, broadcast n. Rows with a
   * NULL side are excluded.
   *
   * Returns one row: (`n`, `h_a`, `h_b`, `mi`, `nmi`, all 6dp); NMI is
   * NULL when either entropy is 0 (a constant column carries no
   * information to normalize by).
   */
  def mutualInformation(df: DataFrame, aCol: String,
                        bCol: String): DataFrame = {
    val base = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val o = base.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ra = o.groupBy("a").agg(sum("o").as("na"))
    val cb = o.groupBy("b").agg(sum("o").as("nb"))
    val n = base.count()
    require(n > 0, "mutualInformation on an empty (or all-null) frame")
    val nd = n.toDouble
    val mi = o.join(ra, "a").join(cb, "b")
      .select(((col("o") / nd) *
        log(col("o").cast("double") * n /
          (col("na").cast("double") * col("nb")))).as("term"))
      .agg(sum("term").as("mi"))
    val ha = ra.select((-(col("na") / nd) * log(col("na") / nd)).as("t"))
      .agg(sum("t").as("h_a"))
    val hb = cb.select((-(col("nb") / nd) * log(col("nb") / nd)).as("t"))
      .agg(sum("t").as("h_b"))
    mi.crossJoin(ha).crossJoin(hb)
      .select(lit(n).as("n"),
        round(col("h_a"), 6).as("h_a"),
        round(col("h_b"), 6).as("h_b"),
        round(col("mi"), 6).as("mi"),
        when(col("h_a") > 0 && col("h_b") > 0,
          round(col("mi") / sqrt(col("h_a") * col("h_b")), 6)).as("nmi"),
        // Theil's uncertainty coefficients (Theil 1970): U(a|b) =
        // MI/H(a) — the ASYMMETRIC association Cramér's V and NMI
        // can't express ("b predicts a perfectly, a barely narrows b")
        when(col("h_a") > 0, round(col("mi") / col("h_a"), 6))
          .as("u_ab"),
        when(col("h_b") > 0, round(col("mi") / col("h_b"), 6))
          .as("u_ba"))
  }

  /**
   * Mutual information between two NUMERIC columns via equi-depth
   * binning — the dependence screen [[spearmanMatrix]] can't run:
   * Spearman sees only MONOTONE association (a V-shaped or periodic
   * relationship scores ρ ≈ 0), binned MI sees any statistical
   * dependence the bin resolution can express. Each variable bins by
   * its own exact `i/nBins` percentile boundaries (the
   * [[equiDepthHistogram]] semantics — boundaries become plan
   * constants, binning is a map-only comparison chain), then the
   * categorical [[mutualInformation]] runs on the (binx, biny) frame —
   * same output contract including the Theil's U columns.
   *
   * Scale shape: two exact percentile aggregates (one per variable) +
   * [[mutualInformation]]'s ≤ nBins² cell aggregates. The exact
   * `percentile` aggregate's state is O(distinct values) per partition
   * (the [[equiDepthHistogram]] contract) — at extreme value
   * cardinality pre-quantize the inputs, the same coarsening dial the
   * level-window operators carry. NULL on either
   * side excludes the row from BOTH binning and the boundary
   * percentiles (pairwise-complete semantics, stated — a one-sided
   * null is not a dependence observation).
   */
  def mutualInformationBinned(df: DataFrame, xCol: String, yCol: String,
                              nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    // one shared pass (r18): cut the projected frame (the boundary
    // derivation and the binning pass both read it — uncut it
    // re-scanned the source per consumer), and derive BOTH variables'
    // exact percentile boundaries from ONE melted grouped aggregate —
    // one driver action instead of two sequential ones, and the two
    // exact-percentile merge states (O(distinct values) each, the
    // operator's documented bound) merge in two PARALLEL reduce tasks
    // instead of one task back-to-back twice
    val base = graft.core.LineageCut.cut(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")))
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val probsArr = probs.map(p => s"${p}D").mkString(", ")
    val boundRows = base
      .selectExpr("stack(2, 0, x, 1, y) as (v, value)")
      .groupBy("v")
      .agg(expr(s"percentile(value, array($probsArr))").as("b"))
      .collect()
    // fail loud on an empty/all-null frame (no group rows at all) —
    // the heapsFit isNullAt convention
    require(boundRows.length == 2 && boundRows.forall(!_.isNullAt(1)),
      "mutualInformationBinned needs at least one non-null (x, y) pair")
    val byVar = boundRows.map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def bucket(c: Column, bs: Seq[Double]): Column =
      bs.map(b => when(c > b, 1).otherwise(0)).reduce(_ + _).cast("long")
    val binned = base.select(
      bucket(col("x"), byVar(0)).as("bx"),
      bucket(col("y"), byVar(1)).as("by"))
    mutualInformation(binned, "bx", "by")
  }

  /**
   * Population Stability Index between a reference and a current
   * sample of the same metric (the standard ML-monitoring drift
   * detector; rule-of-thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25
   * shifted): bucket BOTH samples by the REFERENCE's equi-depth
   * quantile boundaries, then per bucket contribute
   * (q − p)·ln(q / p) over the smoothed shares. Smoothing is
   * deterministic add-half: share = (count + 0.5)/(total + 0.5·k) —
   * an empty bucket on either side must not produce ±∞ (the classic
   * PSI epsilon hack, stated as an explicit Laplace-style rule both
   * engines compute identically rather than an arbitrary 1e-6).
   *
   * Returns one row per bucket (`bucket` 0-based, `ref_share`,
   * `cur_share`, `contrib`, all 6dp) — Σ contrib is the PSI; emitting
   * per-bucket contributions keeps the report actionable (WHICH part
   * of the distribution moved), callers sum for the scalar.
   *
   * Scale shape: one exact grouped-percentile agg over the REFERENCE
   * (the [[equiDepthHistogram]] cost), boundaries become plan
   * constants; both samples then bin map-only through the comparison
   * chain into ≤ nBuckets-group aggregates. Nothing data-sized
   * shuffles; NULL values are excluded (they are not a metric value).
   */
  def populationStability(ref: DataFrame, cur: DataFrame,
                          valueCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val v = col(valueCol).cast("double")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bounds = ref.agg(expr(
        s"percentile(cast($valueCol as double), array(${probs.map(p => s"${p}D").mkString(", ")}))")
        .as("b")).head().getSeq[Double](0)
    val bucket = bounds.map(b => when(v > b, 1).otherwise(0))
      .reduce(_ + _).cast("long").as("bucket")
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(v.isNotNull).select(bucket)
        .groupBy("bucket").agg(count(lit(1)).as(out))
    val nRef = ref.filter(v.isNotNull).count()
    val nCur = cur.filter(v.isNotNull).count()
    require(nRef > 0 && nCur > 0,
      s"populationStability needs non-null values on both sides " +
        s"(ref $nRef, cur $nCur)")
    val all = ref.sparkSession.range(nBuckets)
      .select(col("id").as("bucket"))
    // absent buckets count 0 and still hold the smoothing half-count
    val p = (coalesce(col("__pc"), lit(0L)) + lit(0.5)) /
      lit(nRef + 0.5 * nBuckets)
    val q = (coalesce(col("__qc"), lit(0L)) + lit(0.5)) /
      lit(nCur + 0.5 * nBuckets)
    all.join(counts(ref, "__pc"), Seq("bucket"), "left")
      .join(counts(cur, "__qc"), Seq("bucket"), "left")
      .select(col("bucket"),
        round(p, 6).as("ref_share"),
        round(q, 6).as("cur_share"),
        round((q - p) * log(q / p), 6).as("contrib"))
  }

  /**
   * Per-column drift profile: [[populationStability]] run over a list
   * of numeric columns and collapsed to ONE row per column — the
   * monitoring dashboard's "which features moved" table, with the
   * conventional PSI verdict bands (Siddiqi 2006: < 0.1 stable,
   * < 0.25 moderate, else shifted) rendered as a string so the
   * thresholds are visible, not policy baked into a boolean.
   *
   * EXACTNESS: each column's PSI is the sum of its TEN (= `nBuckets`)
   * 6dp-ROUNDED per-bucket contributions — an unordered sum of a
   * bounded, grid-snapped set (the charEntropy unordered-sum class,
   * absorbed by the 4dp rounding); the verdict compares the ROUNDED
   * psi (stated). Column order is preserved in the output.
   *
   * Scale shape: per column, one percentile aggregate over ref + two
   * bucket-count aggregates (the populationStability shape) — k
   * columns cost k passes; the output is k rows. A melted one-pass
   * form is possible but pointless until k·scan dominates, which a
   * drift dashboard's daily cadence never reaches.
   */
  def psiProfile(ref: DataFrame, cur: DataFrame, columns: Seq[String],
                 nBuckets: Int = 10): DataFrame = {
    require(columns.nonEmpty, "need at least one column")
    val missing = columns.filterNot(c =>
      ref.columns.contains(c) && cur.columns.contains(c))
    require(missing.isEmpty, s"columns not on both sides: $missing")
    columns.map { c =>
      populationStability(ref, cur, c, nBuckets)
        .agg(round(sum("contrib"), 4).as("psi"))
        .select(lit(c).as("col_name"), col("psi"),
          when(col("psi") < 0.1, lit("stable"))
            .when(col("psi") < 0.25, lit("moderate"))
            .otherwise(lit("shifted")).as("verdict"))
    }.reduce(_ unionByName _)
  }

  /**
   * Durbin-Watson autocorrelation diagnostic (Durbin & Watson 1950) —
   * the regression-residual check [[linearFit]] callers need before
   * trusting its standard errors: DW = Σ(e_i − e_{i−1})² / Σe_i² over
   * the TIME-ordered residuals of the y ~ x OLS fit (≈ 2 means
   * uncorrelated; → 0 strong positive autocorrelation — the classic
   * "trend fitted to a random walk" tell; → 4 negative).
   *
   * EXACTNESS: the OLS slope/intercept come from [[linearFit]]'s exact
   * DECIMAL(38,0) moments via fixed IEEE chains (unitScale cancels in
   * DW); each residual e = uy − (a + b·ux) is one fixed chain; BOTH
   * sums run as ORDERED window folds in (ts, id) order (sequential in
   * both engines, the kaplanMeier convention); `dw` rounds 6dp, NULL
   * on a perfect fit (zero residual variance) or n < 2.
   *
   * Scale shape: one map-side-combined moments aggregate + ONE ordered
   * window pass over the series — single-task, so `maxRows` fails loud
   * (aggregate to a coarser grid upstream past it).
   *
   * Output one row: (`n`, `slope`, `intercept`, `dw`).
   */
  def durbinWatson(df: DataFrame, tsCol: String, idCol: String,
                   xCol: String, yCol: String,
                   unitScale: Long = 100L,
                   maxRows: Long = 10000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxRows >= 2, s"maxRows must be >= 2: $maxRows")
    val dec = "decimal(38,0)"
    val base = graft.core.LineageCut.cut(df
      .filter(col(tsCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy")))
    val nRows = base.count()
    require(nRows <= maxRows,
      s"durbinWatson: $nRows rows exceeds maxRows=$maxRows — the " +
        "ordered residual fold runs the series through ONE task; " +
        "aggregate to a coarser grid upstream or raise maxRows")
    val mom = base.agg(count(lit(1)).as("n"),
      sum(col("ux").cast(dec)).as("sx"),
      sum(col("uy").cast(dec)).as("sy"),
      sum(col("ux").cast(dec) * col("ux")).as("sxx"),
      sum(col("ux").cast(dec) * col("uy")).as("sxy"))
    val nD = col("n").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    // ANSI-guarded: a degenerate design (constant x, or empty frame)
    // reports NULL fit instead of dividing by zero
    val b = when(den =!= 0.0, (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) / den)
    val a = when(den =!= 0.0,
      (col("sy").cast("double") - b * col("sx").cast("double")) / nD)
    val fit = mom.select(col("n"), b.as("__b"), a.as("__a"),
      (den =!= 0.0).as("__ok"))
    val wOrd = Window.orderBy("ts", "id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val resid = col("uy").cast("double") -
      (col("__a") + col("__b") * col("ux").cast("double"))
    val folded = base.crossJoin(broadcast(fit))
      .withColumn("__e", resid)
      .withColumn("__eprev", lag(col("__e"), 1).over(wOrd))
      .withColumn("__num", sum(
        when(col("__eprev").isNotNull,
          (col("__e") - col("__eprev")) * (col("__e") - col("__eprev")))
          .otherwise(lit(0.0))).over(wRun))
      .withColumn("__den", sum(col("__e") * col("__e")).over(wRun))
      .withColumn("__rn", row_number().over(wOrd))
    folded.filter(col("__rn") === col("n"))
      .select(col("n"),
        // unit scale cancels in the slope (both axes scaled); the
        // intercept is in y-units and divides back once. roundz: a
        // flat trend's slope rounds to zero FROM BELOW — signed-zero
        // normalized on both engines (graft.core.Num).
        when(col("__ok"), graft.core.Num.roundz(col("__b"), 6))
          .as("slope"),
        when(col("__ok"),
          graft.core.Num.roundz(col("__a") / lit(unitScale.toDouble), 6))
          .as("intercept"),
        when(col("__ok") && col("__den") > 0.0 && col("n") >= 2L,
          graft.core.Num.roundz(col("__num") / col("__den"), 6))
          .as("dw"))
  }

  /**
   * Brown-Forsythe robust variance-homogeneity test (Brown & Forsythe
   * 1974; Levene 1960 with the MEDIAN center) — the check behind
   * [[welchTTest]]-vs-pooled decisions and every "are these segments
   * equally noisy" question: one-way ANOVA on the absolute deviations
   * z = |v − median_g|, W = ((N−k)/(k−1)) · Σ n_g(z̄_g − z̄)² /
   * Σ(z − z̄_g)². The median center (not the mean) is what makes it
   * robust to the heavy tails that break plain Levene.
   *
   * EXACTNESS: values quantize at `unitScale`; per-group medians are
   * exact interpolated percentiles of LONG units (integer or
   * half-integer — both engines' linear interpolation lands on the
   * same grid), so DOUBLED deviations 2·|u − med| are EXACT LONGS and
   * all four moment sums widen through DECIMAL(38,0); W is a fixed
   * IEEE chain from exact integers, 4dp (the factor 4 from doubling
   * cancels). Groups need ≥ 1 row; k ≥ 2 enforced; zero within-group
   * deviation (every group constant) reports NULL w. Statistic-only
   * (the [[anovaF]] convention — consume with an F table at (k−1,
   * N−k) df, both shipped).
   *
   * Scale shape: one percentile aggregate per the GROUP frame (exact
   * percentile over each group), a broadcast median join, one
   * map-side-combined moment aggregate, a k-row rollup with the
   * fold-order-pinned running window ([[kruskalWallis]]'s convention).
   *
   * Output one row: (`n`, `k`, `df1`, `df2`, `w`).
   */
  def brownForsythe(df: DataFrame, valueCol: String, groupCol: String,
                    unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val meds = base.groupBy("g")
      .agg(expr("percentile(u, 0.5D)").as("__med"))
    // 2·|u − med| is an exact long (med is an integer or half-integer)
    val z2 = abs(col("u") * 2L - round(col("__med") * 2.0).cast("long"))
    val perG = base.join(broadcast(meds), "g")
      .select(col("g"), z2.as("z2"))
      .groupBy("g")
      .agg(count(lit(1)).as("ng"),
        sum(col("z2").cast(dec)).as("sz"),
        sum(col("z2").cast(dec) * col("z2")).as("szz"))
    // rollup over the k-row group frame: cross-group sums fold in
    // group-name order (pinned left fold both engines)
    val wOrd = Window.orderBy("g")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val between = (col("sz").cast("double") * col("sz").cast("double")) /
      col("ng").cast("double")
    val folded = perG
      .withColumn("__kidx", row_number().over(wOrd))
      .withColumn("__nrun", sum("ng").over(wRun))
      .withColumn("__szrun", sum(col("sz")).over(wRun))
      .withColumn("__szzrun", sum(col("szz")).over(wRun))
      .withColumn("__brun", sum(between).over(wRun))
      .withColumn("__k", count(lit(1)).over(
        Window.orderBy("g").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val last = folded.filter(col("__kidx") === col("__k"))
    val nD = col("__nrun").cast("double")
    val ssb = col("__brun") -
      (col("__szrun").cast("double") * col("__szrun").cast("double")) / nD
    val ssw = col("__szzrun").cast("double") - col("__brun")
    last.select(col("__nrun").as("n"), col("__k").cast("int").as("k"),
      (col("__k") - 1L).cast("int").as("df1"),
      (col("__nrun") - col("__k")).cast("long").as("df2"),
      when(col("__k") >= 2L && col("__nrun") > col("__k") && ssw > 0.0,
        round(((col("__nrun") - col("__k")).cast("double") /
          (col("__k") - 1L).cast("double")) * ssb / ssw, 4)).as("w"))
  }

  /**
   * Expected calibration error (Naeini et al. 2015) — the ONE-NUMBER
   * rollup of [[calibrationReport]]: ECE = Σ_b (n_b/n)·|gap_b|, the
   * dashboard scalar a model gate thresholds where the per-bin report
   * is the diagnosis. Composes the report verbatim (same binning, same
   * 6dp-rounded per-bin gaps), so the two always agree.
   *
   * EXACTNESS: each |gap| is the report's already-6dp-rounded value;
   * the weighted sum folds in BIN ORDER as a running window over the
   * ≤ nBins rows (sequential both engines); one division by the exact
   * total, 6dp.
   *
   * Scale shape: the calibrationReport aggregate (one pass) plus
   * windows over ≤ nBins rows. Output ONE row: (`n`, `n_bins`, `ece`).
   */
  def expectedCalibrationError(df: DataFrame, probCol: String,
                               labelCol: String, nBins: Int = 10,
                               unitScale: Long = 1000000L): DataFrame = {
    val rep = calibrationReport(df, probCol, labelCol, nBins, unitScale)
    val wOrd = Window.orderBy("bin")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wTot = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rep
      .withColumn("__ntot", sum("n").over(wTot))
      .withColumn("__run",
        sum(col("n").cast("double") * abs(col("gap"))).over(wRun))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__nb", count(lit(1)).over(wTot))
      .filter(col("__rn") === col("__nb"))
      .select(col("__ntot").as("n"), col("__nb").cast("int").as("n_bins"),
        round(col("__run") / col("__ntot").cast("double"), 6).as("ece"))
  }

  /**
   * Jarque-Bera normality test (Jarque & Bera 1980) — the moments-only
   * normality screen every parametric test in this file implicitly
   * leans on (welchTTest/anovaF assume roughly-normal arms): JB =
   * n/6·(S² + K²/4) from sample skewness S = m₃/m₂^1.5 and EXCESS
   * kurtosis K = m₄/m₂² − 3, with the large-sample χ²(2) p-value
   * p = exp(−JB/2) (closed form — no quantile tables).
   *
   * EXACTNESS: values quantize at `unitScale` (welchTTest convention);
   * the four raw power sums accumulate as EXACT DECIMAL(38,0) (u⁴
   * widens before multiplying), so both engines derive every central
   * moment from the SAME exact integers via FIXED IEEE chains (the
   * decimal→double conversion is IEEE-nearest on identical inputs —
   * deterministic, and scale cancels in S and K). |u| is fail-loud
   * gated at 10⁷ units so Σu⁴ stays inside 38 digits at any row count
   * up to 10⁹ (rescale unitScale for wider-magnitude columns).
   * `skewness`/`kurtosis` round 6dp, `jb` 4dp, `p_value` 6dp; a
   * zero-variance column reports NULL statistics.
   *
   * Scale shape: ONE map-side-combined aggregate to one row; nothing
   * else moves.
   */
  def jarqueBera(df: DataFrame, valueCol: String,
                 unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val u = round(col(valueCol) * unitScale).cast("long")
    val base = df.filter(col(valueCol).isNotNull)
      .select(u.as("u"))
      .filter(when(abs(col("u")) > 10000000L,
        raise_error(lit("jarqueBera: |value|*unitScale exceeds 1e7 " +
          "units — sum of fourth powers would overflow decimal(38,0); " +
          "lower unitScale")).cast("boolean")).otherwise(lit(true)))
    val ud = col("u").cast(dec)
    val mom = base.agg(count(lit(1)).as("n"),
      sum(ud).as("s1"), sum(ud * ud).as("s2"),
      sum(ud * ud * ud).as("s3"), sum(ud * ud * ud * ud).as("s4"))
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - mean * mean
    val m3 = col("s3").cast("double") / nD -
      lit(3.0) * mean * (col("s2").cast("double") / nD) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4").cast("double") / nD -
      lit(4.0) * mean * (col("s3").cast("double") / nD) +
      lit(6.0) * mean * mean * (col("s2").cast("double") / nD) -
      lit(3.0) * mean * mean * mean * mean
    val skew = m3 / sqrt(m2 * m2 * m2)
    val exk = m4 / (m2 * m2) - lit(3.0)
    val jb = nD / lit(6.0) * (skew * skew + exk * exk / lit(4.0))
    mom.select(col("n"),
      when(m2 > 0.0, round(skew, 6)).as("skewness"),
      when(m2 > 0.0, round(exk, 6)).as("kurtosis"),
      when(m2 > 0.0, round(jb, 4)).as("jb"),
      when(m2 > 0.0, round(exp(-jb / lit(2.0)), 6)).as("p_value"))
  }

  /**
   * Key-skew report: the one-row answer to "can this column be a join/
   * aggregation key at scale". Per-key counts reduce map-side; the
   * statistics then run over the KEY frame (≪ data): distinct keys,
   * total rows, the heaviest key's share, and the Gini coefficient of
   * the count distribution (0 = uniform, → 1 = one key owns
   * everything) via the sorted-cumulative form
   * `G = 2·Σ_i i·c_(i) / (n·Σc) − (n+1)/n` — ranks ordered by
   * (count, key), deterministic under ties.
   *
   * This is the DIAGNOSIS side of the skew machinery: feed keys whose
   * `top_share` is large to `SkewJoin.saltedJoin`'s CMS pass and the
   * prescription follows. NULL keys are excluded (they join nothing).
   *
   * The Gini rank comes from [[Ranking.withGlobalRank]] (r11) — a
   * range shuffle of the (key, count) frame stitched with chunk
   * offsets, NO single-partition window — so the report holds at any
   * key cardinality (the former `row_number` window capped it at
   * ~10⁸ keys).
   *
   * Returns one row: (`n_keys`, `n_rows`, `top_share`, `gini`), shares
   * at 6dp.
   */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    Ranking.withGlobalRank(counts,
        Seq(col("c").asc, col(keyCol).asc), "i", "n_all")
      .select(col("c"), col("i"))
      .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
        max("c").as("__mx"), sum(col("i") * col("c")).as("__ic"))
      .select(col("n_keys"), col("n_rows"),
        round(col("__mx").cast("double") / col("n_rows"), 6).as("top_share"),
        round(lit(2.0) * col("__ic") / (col("n_keys") * col("n_rows"))
          - (col("n_keys") + lit(1.0)) / col("n_keys"), 6).as("gini"))
  }

  /**
   * Per-segment Welch two-sample t report (Welch 1947) — the unequal-
   * variance A/B gate for pipeline telemetry: did the treatment cohort's
   * metric move, per segment, without assuming equal spread? Data-prep
   * use: comparing a quality metric between two source feeds (or two
   * pipeline versions) per domain is exactly this shape.
   *
   * DETERMINISM: values quantize to integers at `unitScale` (cents for
   * 2dp money); Σx is an exact long, Σx² accumulates in DECIMAL(38,0)
   * (x² alone fits a long; the SUM does not at 10⁸+ rows) and converts
   * to double ONCE — int→double nearest-rounding is exactly defined, so
   * both engines see identical moments and every downstream step is a
   * chain of single IEEE ops on identical inputs. t and the Welch–
   * Satterthwaite df round at 4dp; means are single divisions of exact
   * longs, unrounded.
   *
   * Segments missing a cohort, or with n < 2 on either side, or with
   * zero variance on both sides report NULL t/df (stated, not an
   * engine-specific 0/0 artifact). Two-sided exactness over rounding:
   * the 4dp grid absorbs the one deterministic decimal→double rounding.
   *
   * Scale shape: ONE (segment, cohort)-keyed aggregate (map-side
   * combined, rows carry two longs + a decimal) + a segment-keyed
   * self-join of the two cohort rows — keys only. No window, no sort.
   *
   * Returns (`segment`, `n_t`, `n_c`, `mean_t`, `mean_c`, `t_stat`,
   * `df`) — one row per segment that has BOTH cohorts.
   */
  def welchTTest(df: DataFrame, segmentCol: String, groupCol: String,
                 treatment: String, valueCol: String,
                 unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === treatment).as("treated"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val mom = base.groupBy("segment", "treated")
      .agg(count(lit(1)).as("n"), sum("u").as("s1"),
        sum((col("u") * col("u")).cast("decimal(38,0)"))
          .cast("double").as("s2"))
    val tr = mom.filter(col("treated"))
      .select(col("segment"), col("n").as("n_t"), col("s1").as("s1t"),
        col("s2").as("s2t"))
    val ct = mom.filter(!col("treated"))
      .select(col("segment"), col("n").as("n_c"), col("s1").as("s1c"),
        col("s2").as("s2c"))
    def mean(s1: Column, n: Column): Column =
      s1.cast("double") / (n * unitScale).cast("double")
    // sample variance in VALUE units: (Σx² − (Σx)²/n)/(n−1) on the
    // quantized ints, then one exact scale division — every operand is
    // deterministic, every op single-IEEE
    def vr(s1: Column, s2: Column, n: Column): Column =
      ((s2 - s1.cast("double") * s1.cast("double") / n.cast("double")) /
        (n.cast("double") - 1d)) /
        (unitScale * unitScale).toDouble
    val j = tr.join(ct, "segment")
    val vt = vr(col("s1t"), col("s2t"), col("n_t"))
    val vc = vr(col("s1c"), col("s2c"), col("n_c"))
    val se2 = vt / col("n_t").cast("double") + vc / col("n_c").cast("double")
    val tStat = (mean(col("s1t"), col("n_t")) - mean(col("s1c"), col("n_c"))) /
      sqrt(se2)
    val dfW = (se2 * se2) /
      ((vt / col("n_t")) * (vt / col("n_t")) / (col("n_t").cast("double") - 1d) +
        (vc / col("n_c")) * (vc / col("n_c")) / (col("n_c").cast("double") - 1d))
    j.select(col("segment"), col("n_t"), col("n_c"),
      mean(col("s1t"), col("n_t")).as("mean_t"),
      mean(col("s1c"), col("n_c")).as("mean_c"),
      when(col("n_t") >= 2 && col("n_c") >= 2 && se2 > 0,
        round(tStat, 4)).as("t_stat"),
      when(col("n_t") >= 2 && col("n_c") >= 2 && se2 > 0,
        round(dfW, 4)).as("df"))
  }

  /**
   * Spearman rank correlation with exact tie handling (Spearman 1904)
   * — the monotone-association measure next to [[correlationMatrix]]'s
   * Pearson: invariant to any monotone transform, so heavy-tailed
   * pipeline quantities (prices, latencies, doc lengths) correlate by
   * ORDER, not by whichever tail dominates the covariance.
   *
   * EXACTNESS: values quantize at `unitScale`; per-variable ranks come
   * from [[Ranking.withGlobalRank]] over (value, id) — a chunked range
   * shuffle, NO single-partition window — and a tie level's DOUBLED
   * average rank is min+max of its rows' unique ranks (consecutive
   * integers average to their endpoints' midpoint), an exact long per
   * level. All five moments (n, Σr2x, Σr2y, Σr2x², Σr2y², Σr2x·r2y)
   * accumulate DECIMAL(38,0); ρ = (n·Sxy − Sx·Sy) /
   * √((n·Sxx − Sx²)(n·Syy − Sy²)) converts each exact factor to double
   * once (doubling cancels algebraically; both engines compute the
   * same expression on the same integers). A constant variable (zero
   * denominator) reports NULL ρ. n is guarded at 10⁹ so every decimal
   * product stays within 38 digits.
   *
   * Scale shape: two chunked rank passes + two level aggregates (min/
   * max rank per distinct value) + two value-keyed joins back + one
   * moments aggregate. Rows carry (id, long, long); nothing global,
   * nothing quadratic. `idCol` must uniquely identify rows (the rank's
   * total-order tiebreak). (The k-column [[spearmanMatrix]] derives
   * level ranks from counts instead — [[Ranking.levelRanks]]; for the
   * two-column case the r18 A/B measured that form worse when level
   * cardinality approaches n.)
   *
   * Returns one row: (`n`, `rho`).
   */
  def spearmanCorrelation(df: DataFrame, xCol: String, yCol: String,
                          idCol: String,
                          unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy"))
      // both rank passes + the final joins share it; fan out so the
      // rank map sides (range sampling + shuffle write) parallelize
      // off a single-split scan
      .lineageCutFanout()
    // row-rank form kept here (r18 A/B): the two-column case measured
    // WORSE on the level-count form (21 -> 25 jobs, bytes flat) because
    // a price-grained column's level cardinality approaches n, so the
    // map-side level combine reduces nothing while Ranking.levelRanks
    // adds two exchanges per variable; spearmanMatrix (k melted
    // columns, one shared level frame) is where the level form wins
    def levelRanks(vCol: String, out: String): DataFrame =
      Ranking.withGlobalRank(base.select(col("id"), col(vCol)),
          Seq(col(vCol).asc, col("id").asc), "r", "nn")
        .groupBy(vCol)
        // doubled tie-average rank = min + max of the level's ranks
        .agg((min("r") + max("r")).as(out))
    val withR = base
      .join(levelRanks("ux", "r2x"), "ux")
      .join(levelRanks("uy", "r2y"), "uy")
    val d = "decimal(38,0)"
    val mom = withR.agg(count(lit(1)).as("n"),
      sum(col("r2x").cast(d)).as("sx"), sum(col("r2y").cast(d)).as("sy"),
      sum((col("r2x").cast(d) * col("r2x"))).as("sxx"),
      sum((col("r2y").cast(d) * col("r2y"))).as("syy"),
      sum((col("r2x").cast(d) * col("r2y"))).as("sxy"))
      .filter(when(col("n") > 1000000000L,
        raise_error(lit("spearmanCorrelation: n exceeds the exact " +
          "decimal(38,0) moment range")).cast("boolean"))
        .otherwise(lit(true)))
    val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    mom.select(col("n"),
      when(vx > 0d && vy > 0d, round(cov / sqrt(vx * vy), 6)).as("rho"))
  }

  /**
   * Mann-Whitney U rank-sum test per segment (Mann & Whitney 1947) —
   * the NONPARAMETRIC partner to [[welchTTest]]: compares the two
   * groups' value DISTRIBUTIONS by ranks, so heavy tails and outliers
   * (the norm for prices, latencies, doc lengths) can't fabricate or
   * mask a shift the way they do to a means test. Report both: Welch
   * answers "did the mean move", U answers "did the distribution".
   *
   * NO per-row ranking happens: rows collapse to per-(segment, value)
   * level counts first, and rank algebra runs on levels — the average
   * rank of a tie group is (rows below) + (size+1)/2, so DOUBLED rank
   * sums stay exact integers: R2_t = Σ_levels ct·(2·cum + cv + 1),
   * U = (R2_t − n_t(n_t+1))/2. The tie-corrected normal approximation
   * σ² = (n_t·n_c/12)·((n+1) − Σ(t³−t)/(n(n−1))) uses the same level
   * counts. Sums accumulate DECIMAL(38,0) and convert to double ONCE
   * (the [[welchTTest]] determinism contract); every later step is a
   * fixed chain of single IEEE ops, so `u_stat` (an exact half-
   * integer) ships unrounded and `z` rounds at 4dp. All-tied segments
   * (σ² = 0) report NULL z; segments missing either group drop (no
   * comparison exists).
   *
   * Scale shape: one map-side-combined (segment, value) level
   * aggregate — exchanges carry level cardinality, never rows — then
   * a segment-partitioned value-ordered window over LEVELS for the
   * cumulative counts, and one segment aggregate. The window's
   * per-segment sequential bound is level cardinality (quantized
   * values, ≤ value-range·unitScale), the [[skewReport]]-class bound;
   * corpora with ~10⁸+ distinct quantized values per segment should
   * coarsen `unitScale` — the ranks, and therefore U, only ever see
   * the quantized values anyway.
   *
   * Returns one row per segment with both groups present:
   * (`segment`, `n_t`, `n_c`, `u_stat`, `z`).
   */
  def mannWhitneyU(df: DataFrame, segmentCol: String, groupCol: String,
                   treatment: String, valueCol: String,
                   unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === treatment).as("treated"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val levels = base.groupBy("segment", "u")
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cv"))
    val w = Window.partitionBy("segment").orderBy("u")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = levels
      .withColumn("cum", coalesce(sum("cv").over(w), lit(0L)))
    val seg = ranked.groupBy("segment").agg(
      sum("ct").as("n_t"), sum(col("cv") - col("ct")).as("n_c"),
      sum((col("ct") * (lit(2L) * col("cum") + col("cv") + 1L))
        .cast("decimal(38,0)")).as("r2t"),
      // widen BEFORE the cubic product: (cv−1)(cv+1) = cv²−1 fits a
      // long under the n guard below, but cv·(cv²−1) wraps past
      // cv ≈ 2.1×10⁶ tied rows at one level — the decimal factor
      // first keeps the whole product exact
      sum(col("cv").cast("decimal(38,0)") *
          ((col("cv") - 1L) * (col("cv") + 1L))).as("tsum"))
      .filter(col("n_t") > 0 && col("n_c") > 0)
      .filter(when(col("n_t") + col("n_c") > 1500000000L,
        raise_error(lit("mannWhitneyU: segment exceeds the exact " +
          "rank-sum long range")).cast("boolean")).otherwise(lit(true)))
    val nD = (col("n_t") + col("n_c")).cast("double")
    val uStat = (col("r2t").cast("double") -
      (col("n_t") * (col("n_t") + 1L)).cast("double")) / 2d
    val sig2 = col("n_t").cast("double") * col("n_c").cast("double") /
      12d * ((nD + 1d) -
        col("tsum").cast("double") / (nD * (nD - 1d)))
    seg.select(col("segment"), col("n_t"), col("n_c"),
      uStat.as("u_stat"),
      when(sig2 > 0d, round(
        (uStat - col("n_t").cast("double") * col("n_c").cast("double") / 2d)
          / sqrt(sig2), 4)).as("z"))
  }

  /**
   * Cohen's d and Hedges' g standardized effect sizes between exactly
   * two groups (Cohen 1988; Hedges 1981) — the MAGNITUDE companion to
   * the significance trio ([[welchTTest]]/[[mannWhitneyU]]/[[ksTest]]):
   * at corpus scale everything is "significant", so the filtering
   * decision rides on HOW BIG the shift is, in pooled-SD units that
   * compare across metrics. g is d with the small-sample bias factor
   * (1 − 3/(4n − 9)).
   *
   * EXACTNESS: quantized values (d and g are scale-invariant, so
   * quantization only sets resolution; `mean_diff` divides back once),
   * exact long/decimal moments per group ([[welchTTest]] contract:
   * squares widen to DECIMAL(38,0) before summing), then a FIXED chain
   * of single IEEE ops — (n−1)s² enters as vnum/n with vnum = n·Σu² −
   * (Σu)² exact — rounded 6dp. Groups pair via a cross of the 2-row
   * group frame (a < b by group key), so `group_a`/`group_b` order is
   * deterministic; ≠ 2 groups fails loud (a 1-group or k-group frame
   * silently producing one arbitrary pair is the bug this prevents).
   *
   * Scale shape: one map-side-combined aggregate to 2 rows. Nothing
   * else moves.
   */
  def cohensD(df: DataFrame, valueCol: String, groupCol: String,
              unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val grps = graft.core.LineageCut.cut(
      base.groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("u").cast("decimal(38,0)")).as("s1"),
        sum(col("u").cast("decimal(38,0)") * col("u")).as("s2")))
    val nGrps = grps.count()
    require(nGrps == 2,
      s"cohensD needs exactly two groups, got $nGrps — filter or " +
        "recode the group column")
    val a = grps.select(col("grp").as("group_a"), col("n").as("na"),
      col("s1").as("s1a"), col("s2").as("s2a"))
    val b = grps.select(col("grp").as("group_b"), col("n").as("nb"),
      col("s1").as("s1b"), col("s2").as("s2b"))
    val j = a.crossJoin(b).filter(col("group_a") < col("group_b"))
      .filter(when(col("na") < 2L || col("nb") < 2L,
        raise_error(lit("cohensD: both groups need n >= 2 for a pooled " +
          "variance")).cast("boolean")).otherwise(lit(true)))
    def nD(c: Column): Column = c.cast("double")
    val meanA = col("s1a").cast("double") / nD(col("na"))
    val meanB = col("s1b").cast("double") / nD(col("nb"))
    // (n−1)·s² = vnum/n with vnum exact decimal — ONE conversion each
    val vnumA = (col("na") * col("s2a") - col("s1a") * col("s1a"))
      .cast("double")
    val vnumB = (col("nb") * col("s2b") - col("s1b") * col("s1b"))
      .cast("double")
    val sp2 = (vnumA / nD(col("na")) + vnumB / nD(col("nb"))) /
      (nD(col("na")) + nD(col("nb")) - 2.0)
    val d = (meanA - meanB) / sqrt(sp2)
    val g = d * (lit(1.0) - lit(3.0) /
      (lit(4.0) * (nD(col("na")) + nD(col("nb"))) - 9.0))
    j.select(col("group_a"), col("group_b"),
      col("na").as("n_a"), col("nb").as("n_b"),
      round((meanA - meanB) / unitScale.toDouble, 6).as("mean_diff"),
      when(sp2 > 0d, round(d, 6)).as("cohens_d"),
      when(sp2 > 0d, round(g, 6)).as("hedges_g"))
  }

  /**
   * Simple ordinary-least-squares fit y = α + βx with R² — the
   * trend-line primitive ([[correlationMatrix]] says whether two
   * metrics move together; this says by HOW MUCH per unit, the number
   * a capacity forecast or a drift report actually quotes). Robust
   * alternative for heavy-tailed data: rank methods ([[spearmanCorrelation]]).
   *
   * EXACTNESS: both columns quantize at `unitScale` (β is
   * scale-invariant when both share the scale; α divides back once);
   * all five moments are exact longs/DECIMAL(38,0) from ONE aggregate;
   * β = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and R² = cov²/(vx·vy) convert
   * each exact factor to double ONCE, α = (Σy − β·Σx)/n is a fixed
   * chain on those doubles; 6dp. Zero x-variance → NULL β/α/R²
   * (vertical data has no OLS line). n guarded at 10⁹ (the
   * [[correlationMatrix]] decimal bound).
   *
   * Scale shape: one map-side-combined aggregate to one row.
   */
  def linearFit(df: DataFrame, xCol: String, yCol: String,
                unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy"))
    val dec = "decimal(38,0)"
    val mom = base.agg(count(lit(1)).as("n"),
      sum(col("ux").cast(dec)).as("sx"),
      sum(col("uy").cast(dec)).as("sy"),
      sum(col("ux").cast(dec) * col("ux")).as("sxx"),
      sum(col("uy").cast(dec) * col("uy")).as("syy"),
      sum(col("ux").cast(dec) * col("uy")).as("sxy"))
      .filter(when(col("n") > 1000000000L,
        raise_error(lit("linearFit: n exceeds the exact decimal(38,0) " +
          "moment range")).cast("boolean")).otherwise(lit(true)))
    val cov = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast("double")
    val beta = cov / vx
    val alpha = (col("sy").cast("double") - beta * col("sx").cast("double")) /
      col("n").cast("double")
    mom.select(col("n"),
      when(vx > 0d, round(beta, 6)).as("slope"),
      when(vx > 0d, round(alpha / unitScale.toDouble, 6)).as("intercept"),
      when(vx > 0d && vy > 0d, round(cov / vx * (cov / vy), 6)).as("r2"))
  }

  /**
   * Theil-Sen robust slope (Theil 1950; Sen 1968) — the median of all
   * pairwise slopes: the trend estimator that shrugs off the outliers
   * and heavy tails that drag [[linearFit]]'s OLS line around (up to
   * ~29% contamination moves it not at all). The robust second
   * opinion every drift/trend report should carry next to the OLS
   * number.
   *
   * EXACTNESS: rows collapse to (x, y) VALUE CELLS ([[kendallTau]]'s
   * machinery); each strictly-x-ordered cell pair contributes its
   * slope — ONE division of exact integers, IEEE-identical, no
   * rounding needed — with weight ca·cb, and the WEIGHTED median over
   * that multiset is exactly the median of all row-pair slopes. The
   * total pair weight W = (T² − Σ_x cntx²)/2 computes from exact
   * x-marginals (driver-side longs over ≤ maxCells rows); the
   * crossing positions (W+1)/2 and W/2 + 1 select values via a
   * slope-ordered running weight fold — ties in slope VALUE make the
   * selection order-independent — and the median averages the two
   * (exact halving). NULL slope when no two distinct x values exist.
   *
   * Scale bound, ENFORCED fail-loud: the pair join is O(C²) in cell
   * count and the running fold sorts C² pairs in one task — `maxCells`
   * (default 2000 → ≤ 4M pairs) gates the cut cell frame with the
   * coarsen-unitScale escape; row count n is unbounded (only cells
   * pair up). T guarded at 3×10⁹ (W long range).
   *
   * Returns one row: (`n`, `n_pairs`, `slope`).
   */
  def theilSenSlope(df: DataFrame, xCol: String, yCol: String,
                    unitScale: Long = 100L,
                    maxCells: Long = 2000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxCells >= 1, "maxCells must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy"))
    val cells = graft.core.LineageCut.cut(
      base.groupBy("ux", "uy").agg(count(lit(1)).as("cnt")))
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"theilSenSlope: $nCells distinct (x, y) cells exceeds " +
        s"maxCells=$maxCells — the pair join is O(C²); coarsen " +
        "unitScale or raise maxCells deliberately")
    // exact pair weight from x-marginals, driver-side (≤ maxCells rows)
    val xtot = cells.groupBy("ux").agg(sum("cnt").as("cx"))
      .select("cx").as[Long].collect()
    val t = xtot.sum
    require(t <= 3000000000L,
      "theilSenSlope: row count exceeds the exact pair-weight long range")
    val w = (t * t - xtot.map(c => c * c).sum) / 2
    val a = cells.select(col("ux").as("xa"), col("uy").as("ya"),
      col("cnt").as("ca"))
    val b = cells.select(col("ux").as("xb"), col("uy").as("yb"),
      col("cnt").as("cb"))
    val pairs = a.join(b, col("xa") < col("xb"))
      .select(((col("yb") - col("ya")).cast("double") /
        (col("xb") - col("xa")).cast("double")).as("slope"),
        (col("ca") * col("cb")).as("pw"),
        col("xa"), col("ya"), col("xb"))
    val wRun = Window.orderBy(col("slope"), col("xa"), col("ya"),
        col("xb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kLow = (w + 1) / 2
    val kHigh = w / 2 + 1
    val folded = pairs.withColumn("cum", sum("pw").over(wRun))
    val med = folded.agg(
      min(when(col("cum") >= kLow, col("slope"))).as("lo"),
      min(when(col("cum") >= kHigh, col("slope"))).as("hi"))
    med.select(lit(t).as("n"), lit(w).as("n_pairs"),
      when(lit(w) > 0L, (col("lo") + col("hi")) / 2.0).as("slope"))
  }

  /**
   * Wilson score confidence interval for per-group proportions
   * (Wilson 1927) — the slice-quality dashboard primitive: "lang-ID
   * accuracy per source", "filter pass-rate per domain" need an
   * interval, not a bare rate, before anyone compares slices (the
   * naive ±z√(p(1−p)/n) Wald interval collapses at p near 0/1 and
   * small n — exactly the slices that matter). lo/hi = (p̂ + z²/2n ±
   * z√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
   *
   * EXACTNESS: n/hits exact longs from one aggregate; the interval is
   * a FIXED chain of single IEEE ops on (hits/n, z) — identical
   * association both engines — rounded 6dp; z is a caller literal
   * (1.959964 ≈ 95%), never an erf inverse. Empty groups cannot occur
   * (they have no rows); n ≥ 1 always.
   *
   * Scale shape: one map-side-combined aggregate, one row per group.
   */
  def wilsonInterval(df: DataFrame, hitCol: String, groupCol: String,
                     z: Double = 1.959964): DataFrame = {
    require(z > 0, "z must be > 0")
    val base = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        when(col(hitCol).cast("boolean") <=> lit(true), 1L).otherwise(0L)
          .as("__h"))
    val g = base.groupBy("grp").agg(count(lit(1)).as("n"),
      sum("__h").as("hits"))
    val nD = col("n").cast("double")
    val p = col("hits").cast("double") / nD
    val z2 = z * z
    val center = p + lit(z2) / (lit(2.0) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z2) / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + lit(z2) / nD
    // output key stays `grp` — `group` is a reserved word the oracle
    // checker's unquoted SELECT cannot carry
    g.select(col("grp"), col("n"), col("hits"),
      round(p, 6).as("p_hat"),
      round((center - half) / denom, 6).as("lo"),
      round((center + half) / denom, 6).as("hi"))
  }

  /**
   * Friedman rank test for k repeated measures (Friedman 1937) — the
   * nonparametric k-condition within-subject test next to
   * [[graft.operators.Events.cochranQ]]'s binary form: one row per
   * subject, k numeric columns (the same doc scored by k quality
   * models, the same query timed under k configs), ranks WITHIN each
   * row, tests whether any condition systematically outranks.
   *
   * EXACTNESS: within-row average ranks come from pure per-row integer
   * arithmetic on quantized values — doubled rank r2_j = 2·(#less) +
   * (#equal incl self) + 1 (so tie-averages stay integers), the
   * per-row tie term Σ_j(eq_j² − 1) = Σ_groups(t³ − t) — k² codegen'd
   * comparisons per row, NO window anywhere; column rank sums and the
   * tie total are exact longs from ONE aggregate, squares widen to
   * DECIMAL(38,0), and χ²_F = (3·ΣR2² − 3n²k(k+1)²)/(nk(k+1)) with the
   * tie correction C = 1 − ΣT/(nk(k²−1)) is a fixed IEEE chain, 4dp.
   * Fully-tied data (C ≤ 0) reports NULL chi2. Rows with any NULL
   * column drop (complete-block design, stated).
   *
   * Scale shape: one map-side-combined aggregate to one row; k² per-row
   * comparisons stay inside WholeStageCodegen. Nothing else moves.
   */
  def friedmanTest(df: DataFrame, columns: Seq[String],
                   unitScale: Long = 100L): DataFrame = {
    require(columns.size >= 2, "need at least two measure columns")
    require(unitScale >= 1, "unitScale must be >= 1")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val k = columns.size
    val base = df
      .filter(columns.map(c => col(c).isNotNull).reduce(_ && _))
      .select(columns.zipWithIndex.map { case (c, i) =>
        round(col(c) * unitScale).cast("long").as(s"__u$i")
      }: _*)
    def cnt(pred: (Column, Column) => Column, j: Int): Column =
      columns.indices.map(l =>
        when(pred(col(s"__u$l"), col(s"__u$j")), 1L).otherwise(0L))
        .reduceLeft(_ + _)
    val withRanks = base.select(
      columns.indices.map { j =>
        (lit(2L) * cnt(_ < _, j) + cnt(_ === _, j) + 1L).as(s"__r2_$j")
      } :+
        columns.indices.map { j =>
          val eq = cnt(_ === _, j)
          eq * eq - 1L
        }.reduceLeft(_ + _).as("__tie"): _*)
    val aggs = columns.indices.map(j => sum(s"__r2_$j").as(s"__s$j")) ++
      Seq(sum("__tie").as("__tsum"), count(lit(1)).as("__n"))
    val mom = withRanks.agg(aggs.head, aggs.tail: _*)
      .filter(when(col("__n") > 1000000000L,
        raise_error(lit("friedmanTest: n exceeds the exact decimal " +
          "moment range")).cast("boolean")).otherwise(lit(true)))
    val sumR2sq = columns.indices.map(j =>
      col(s"__s$j").cast("decimal(38,0)") * col(s"__s$j"))
      .reduceLeft(_ + _)
    val n2 = col("__n").cast("decimal(38,0)") * col("__n")
    val num = (lit(3L) * sumR2sq -
      lit(3L * k * (k + 1).toLong * (k + 1)) * n2).cast("double")
    val den = (col("__n") * (k.toLong * (k + 1))).cast("double")
    val corr = lit(1.0) - col("__tsum").cast("double") /
      (col("__n") * (k.toLong * (k.toLong * k - 1))).cast("double")
    mom.select(col("__n").as("n"), lit(k - 1).as("df"),
      when(corr > 0d, round(num / den / corr, 4)).as("chi2"))
  }

  /**
   * Cliff's delta ordinal effect size (Cliff 1993) — the
   * distribution-free magnitude partner to [[mannWhitneyU]] the way
   * [[cohensD]] partners [[welchTTest]]: δ = P(X > Y) − P(X < Y) over
   * all treatment×control pairs, readable as dominance in [−1, 1] and
   * immune to the heavy tails that make pooled-SD units lie.
   *
   * EXACTNESS: rows collapse to per-group VALUE LEVELS; the pair
   * counts Σ ct·cc over strictly ordered level pairs accumulate
   * DECIMAL(38,0) from exact longs ([[kendallTau]]'s cell machinery
   * with the group split as the second axis), δ is ONE division of
   * exact factors, 6dp. The level pair join is O(C_t·C_c) — ENFORCED
   * fail-loud: `maxCells` (default 10⁵) gates TOTAL level count over
   * the cut level frame, escape hatch in the message (coarsen
   * `unitScale`, or raise deliberately). Row count is unbounded.
   *
   * Returns one row: (`n_t`, `n_c`, `n_gt`, `n_lt`, `delta`).
   */
  def cliffsDelta(df: DataFrame, groupCol: String, treatment: String,
                  valueCol: String, unitScale: Long = 100L,
                  maxCells: Long = 100000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxCells >= 1, "maxCells must be >= 1")
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select((col(groupCol).cast("string") === treatment).as("treated"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val levels = graft.core.LineageCut.cut(
      base.groupBy("treated", "u").agg(count(lit(1)).as("cnt")))
    val nLevels = levels.count()
    require(nLevels <= maxCells,
      s"cliffsDelta: $nLevels distinct (group, value) levels exceeds " +
        s"maxCells=$maxCells — the level pair join is O(C_t*C_c); " +
        "coarsen unitScale or raise maxCells deliberately")
    val t = levels.filter(col("treated"))
      .select(col("u").as("ut"), col("cnt").as("ct"))
    val c = levels.filter(!col("treated"))
      .select(col("u").as("uc"), col("cnt").as("cc"))
    val pairs = t.crossJoin(c).agg(
      sum(when(col("ut") > col("uc"), col("ct") * col("cc")).otherwise(0L)
        .cast("decimal(38,0)")).as("n_gt"),
      sum(when(col("ut") < col("uc"), col("ct") * col("cc")).otherwise(0L)
        .cast("decimal(38,0)")).as("n_lt"))
    val tot = levels.agg(
      sum(when(col("treated"), col("cnt")).otherwise(0L)).as("n_t"),
      sum(when(!col("treated"), col("cnt")).otherwise(0L)).as("n_c"))
    val j = pairs.crossJoin(tot)
      .filter(when(col("n_t") === 0L || col("n_c") === 0L,
        raise_error(lit("cliffsDelta: both groups must be non-empty"))
          .cast("boolean")).otherwise(lit(true)))
      // n_gt/n_lt ship as longs: each is bounded by n_t·n_c
      .filter(when(col("n_t") > 3000000000L || col("n_c") > 3000000000L,
        raise_error(lit("cliffsDelta: group exceeds the exact " +
          "pair-count long range")).cast("boolean")).otherwise(lit(true)))
    j.select(col("n_t"), col("n_c"),
      col("n_gt").cast("long").as("n_gt"),
      col("n_lt").cast("long").as("n_lt"),
      round((col("n_gt") - col("n_lt")).cast("double") /
        (col("n_t").cast("double") * col("n_c").cast("double")), 6)
        .as("delta"))
  }

  /**
   * Two-sample Kolmogorov-Smirnov test per segment (Smirnov 1939) —
   * the third leg of the distribution-comparison trio: [[welchTTest]]
   * asks "did the mean move", [[mannWhitneyU]] "did the distribution
   * shift", KS "do the distributions DIFFER ANYWHERE" (shape changes
   * — variance, bimodality — that leave rank sums untouched still move
   * the ECDF gap). D = sup |ECDF_t − ECDF_c|.
   *
   * EXACTNESS: on (segment, value) level counts, the ECDF gap at a
   * level is |cum_t·n_c − cum_c·n_t| / (n_t·n_c) — numerator an exact
   * long per level (inclusive cumulative counts), maximum taken over
   * exact longs, ONE final IEEE division for `d_stat`. The scaled
   * statistic `ks_stat` = D·√(n_t·n_c/n) is a fixed chain on the same
   * integers, rounded 4dp. Values quantize at `unitScale` (ECDFs —
   * and therefore D — only ever see the quantized values). The
   * n_t·n_c product is guarded against long overflow.
   *
   * Scale shape: identical to [[mannWhitneyU]] — one map-side-combined
   * level aggregate, a segment-partitioned value-ordered window over
   * LEVELS (cumulatives + per-segment totals ride one sort), one
   * segment max-aggregate. The per-segment sequential bound is
   * quantized-level cardinality; coarsen `unitScale` past ~10⁸ levels.
   *
   * Returns one row per segment with both groups present:
   * (`segment`, `n_t`, `n_c`, `d_stat`, `ks_stat`).
   */
  def ksTest(df: DataFrame, segmentCol: String, groupCol: String,
             treatment: String, valueCol: String,
             unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === treatment).as("treated"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val levels = base.groupBy("segment", "u")
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("treated"), 0L).otherwise(1L)).as("cc"))
    val ord = Window.partitionBy("segment").orderBy("u")
    val cumW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy("segment")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = levels
      .withColumn("cumt", sum("ct").over(cumW))
      .withColumn("cumc", sum("cc").over(cumW))
      .withColumn("n_t", sum("ct").over(totW))
      .withColumn("n_c", sum("cc").over(totW))
    val seg = cum
      .filter(col("n_t") > 0 && col("n_c") > 0)
      .filter(when(col("n_t") > 3000000000L || col("n_c") > 3000000000L,
        raise_error(lit("ksTest: group size exceeds the exact n_t·n_c " +
          "long range")).cast("boolean")).otherwise(lit(true)))
      .groupBy("segment")
      .agg(first("n_t").as("n_t"), first("n_c").as("n_c"),
        max(abs(col("cumt") * col("n_c") - col("cumc") * col("n_t")))
          .as("dnum"))
    val d = col("dnum").cast("double") /
      (col("n_t") * col("n_c")).cast("double")
    seg.select(col("segment"), col("n_t"), col("n_c"),
      d.as("d_stat"),
      round(d * sqrt((col("n_t") * col("n_c")).cast("double") /
        (col("n_t") + col("n_c")).cast("double")), 4).as("ks_stat"))
  }

  /**
   * Cramér–von Mises two-sample test (Anderson 1962's two-sample
   * form) — the FOURTH distribution-comparison leg after Welch
   * (means), MWU (rank shift), and KS (max ECDF gap): CvM integrates
   * the SQUARED ECDF gap over the pooled sample,
   * T = (n_t·n_c / N²) · Σ_pooled (F_t(x) − F_c(x))², so a
   * distribution that differs in many small ways scores where KS —
   * which only sees the single largest gap — can stay quiet. Same
   * per-segment one-vs-rest contract as [[ksTest]].
   *
   * EXACTNESS: the ksTest level machinery verbatim — (segment, value)
   * LEVEL counts, cumulative window sums, exact-integer gap numerator
   * g = cum_t·n_c − cum_c·n_t per level — then each level's
   * contribution cnt·(g/(n_t·n_c))² is ONE fixed IEEE chain and the
   * level contributions fold as an ORDERED running window sum in value
   * order (the kaplanMeier sequential-fold convention — never an
   * unordered double sum); `t_stat` = (n_t·n_c/N²)·Σ rounded 6dp.
   * Statistic-only (the two-sample CvM null distribution has no
   * closed form; compare against published critical values — T ≳ 0.46
   * rejects at 5% asymptotically). n_t, n_c guarded at 3·10⁹ (the
   * ksTest long-product bound).
   *
   * Scale shape: identical to [[ksTest]] — level aggregate, ordered
   * windows over LEVELS per segment. One row per segment with both
   * groups present: (`segment`, `n_t`, `n_c`, `t_stat`).
   */
  def cramerVonMises(df: DataFrame, segmentCol: String, groupCol: String,
                     treatment: String, valueCol: String,
                     unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === treatment).as("treated"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val levels = base.groupBy("segment", "u")
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("treated"), 0L).otherwise(1L)).as("cc"))
    val ord = Window.partitionBy("segment").orderBy("u")
    val cumW = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val totW = Window.partitionBy("segment")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = levels
      .withColumn("cumt", sum("ct").over(cumW))
      .withColumn("cumc", sum("cc").over(cumW))
      .withColumn("n_t", sum("ct").over(totW))
      .withColumn("n_c", sum("cc").over(totW))
      .filter(col("n_t") > 0 && col("n_c") > 0)
      .filter(when(col("n_t") > 3000000000L || col("n_c") > 3000000000L,
        raise_error(lit("cramerVonMises: group size exceeds the exact " +
          "n_t·n_c long range")).cast("boolean")).otherwise(lit(true)))
    val gap = (col("cumt") * col("n_c") - col("cumc") * col("n_t"))
      .cast("double") / (col("n_t") * col("n_c")).cast("double")
    val term = (col("ct") + col("cc")).cast("double") * gap * gap
    val folded = cum
      .withColumn("__run", sum(term).over(cumW))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__nl", count(lit(1)).over(totW))
      .filter(col("__rn") === col("__nl"))
    val nTot = (col("n_t") + col("n_c")).cast("double")
    folded.select(col("segment"), col("n_t"), col("n_c"),
      round((col("n_t") * col("n_c")).cast("double") / (nTot * nTot) *
        col("__run"), 6).as("t_stat"))
  }

  /**
   * Two-sample Anderson-Darling test per segment (Anderson & Darling
   * 1952; the k-sample right-continuous-ECDF form of Scholz &
   * Stephens 1987 at k = 2) — the tail-weighted member of the
   * distribution-equality trio ([[ksTest]] reads the max gap,
   * [[cramerVonMises]] the mean squared gap, AD weights the squared
   * gap by 1/(F(1−F)) so DIFFERENT TAILS count): for pooled level
   * cumulative counts B_j, treatment cumulatives M_j, level sizes
   * h_j, A² = (1/(n_t·n_c)) · Σ_{j: B_j<N} h_j·(N·M_j − n_t·B_j)² /
   * (B_j·(N−B_j)). Statistic-only (the [[anovaF]] convention —
   * consume with the Scholz-Stephens table; ≈ 2.49 at 5% for large
   * samples).
   *
   * EXACTNESS: values quantize at `unitScale`; level counts and both
   * cumulatives are exact longs; each level's d = N·M_j − n_t·B_j is
   * an exact long difference (group sizes guarded so the products fit
   * a long), squared AFTER one double cast; the level contributions
   * accumulate as an ORDERED window fold in value order (the
   * kaplanMeier convention); `a2_stat` rounds 6dp. A single-level
   * segment (all values equal) reads A² = 0.
   *
   * Scale shape: identical to [[cramerVonMises]] — one (segment,
   * value) aggregate, per-segment ordered windows over the LEVEL
   * frame (bounded when values are quantized).
   *
   * Output one row per segment: (`segment`, `n_t`, `n_c`, `a2_stat`).
   */
  def andersonDarling(df: DataFrame, segmentCol: String, groupCol: String,
                      treatment: String, valueCol: String,
                      unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === treatment).as("treated"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val levels = base.groupBy("segment", "u")
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("treated"), 0L).otherwise(1L)).as("cc"))
    val ord = Window.partitionBy("segment").orderBy("u")
    val cumW = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val totW = Window.partitionBy("segment")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = levels
      .withColumn("cumt", sum("ct").over(cumW))
      .withColumn("cumc", sum("cc").over(cumW))
      .withColumn("n_t", sum("ct").over(totW))
      .withColumn("n_c", sum("cc").over(totW))
      .filter(col("n_t") > 0 && col("n_c") > 0)
      // N·M must fit a long: N ≤ 3e9 keeps N·M ≤ 9e18 < 2⁶³
      .filter(when(col("n_t") + col("n_c") > 3000000000L,
        raise_error(lit("andersonDarling: pooled size exceeds the " +
          "exact N*M long range")).cast("boolean")).otherwise(lit(true)))
    val nTot = col("n_t") + col("n_c")
    val bj = col("cumt") + col("cumc")
    val dj = (nTot * col("cumt") - col("n_t") * bj).cast("double")
    val term = when(bj < nTot,
      (col("ct") + col("cc")).cast("double") * (dj * dj) /
        (bj * (nTot - bj)).cast("double")).otherwise(lit(0.0))
    val folded = cum
      .withColumn("__run", sum(term).over(cumW))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__nl", count(lit(1)).over(totW))
      .filter(col("__rn") === col("__nl"))
    folded.select(col("segment"), col("n_t"), col("n_c"),
      round(col("__run") / (col("n_t") * col("n_c")).cast("double"), 6)
        .as("a2_stat"))
  }

  /**
   * Mann-Kendall trend test (Mann 1945; Kendall 1975) — the
   * distribution-free "is this series monotonically trending"
   * question [[graft.operators.TimeSeries]] callers ask before
   * fitting [[linearFit]]'s slope to it: S = Σ_{i<j} sgn(v_j − v_i)
   * over TIME order, with the tie-corrected normal approximation
   * Var(S) = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18 and the
   * continuity-corrected Z = (S ∓ 1)/√Var. Statistic-only with `z`
   * emitted (consume with a normal table — the [[wilsonInterval]]
   * no-erf convention).
   *
   * EXACTNESS: values quantize at `unitScale`; S is an EXACT LONG sum
   * of sign comparisons over the gated pair join; both variance
   * numerator terms are exact decimal integers; Var is ONE division
   * by 18; Z is a fixed chain through [[graft.core.Num.roundz]] 6dp
   * (a tiny negative S rounds to signed zero otherwise); Z = 0 when
   * S = 0, NULL when Var ≤ 0 (all values tied) or n < 2.
   *
   * Scale shape: the pair join is honestly QUADRATIC — n(n−1)/2
   * sign cells through one map-side-combined aggregate — so `maxRows`
   * fails loud at a default sized for bucket-aggregated series (the
   * [[kendallTau]] maxCells convention: MK on 10⁹ raw points has no
   * more power than on 10⁴ bucket means; aggregate upstream).
   *
   * Output one row: (`n`, `s_stat`, `var_s`, `z`).
   */
  def mannKendallTrend(obs: DataFrame, tsCol: String, idCol: String,
                       valueCol: String, unitScale: Long = 100L,
                       maxRows: Long = 20000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxRows >= 2, s"maxRows must be >= 2: $maxRows")
    val dec = "decimal(38,0)"
    val base = graft.core.LineageCut.cut(obs
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u")))
    val n = base.count()
    require(n <= maxRows,
      s"mannKendallTrend: $n rows exceeds maxRows=$maxRows — the sign " +
        "sum is an exact PAIR join (n(n-1)/2 cells); aggregate the " +
        "series to a coarser grid upstream or raise maxRows deliberately")
    val a = base.select(col("ts").as("ts_a"), col("id").as("id_a"),
      col("u").as("u_a"))
    val b = base.select(col("ts").as("ts_b"), col("id").as("id_b"),
      col("u").as("u_b"))
    val pairs = a.join(b,
      col("ts_a") < col("ts_b") ||
        (col("ts_a") === col("ts_b") && col("id_a") < col("id_b")))
    val sAgg = pairs.agg(coalesce(sum(
      when(col("u_b") > col("u_a"), 1L)
        .when(col("u_b") < col("u_a"), -1L).otherwise(0L)), lit(0L))
      .as("s"))
    // tie term over value levels: Σ t(t−1)(2t+5) as exact decimal
    val ties = base.groupBy("u").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t").cast(dec) * (col("t") - 1L) *
        (col("t") * 2L + 5L)), lit(0L).cast(dec)).as("tie"))
    val nDec = lit(n).cast(dec)
    val varS = (nDec * (n - 1L) * (2L * n + 5L) - col("tie"))
      .cast("double") / 18.0
    val z = when(col("s") > 0L, (col("s") - 1L).cast("double") /
        sqrt(varS))
      .when(col("s") < 0L, (col("s") + 1L).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    sAgg.crossJoin(ties).select(lit(n).as("n"), col("s").as("s_stat"),
      when(lit(n) >= 2L, round(varS, 6)).as("var_s"),
      when(lit(n) >= 2L && varS > 0.0, graft.core.Num.roundz(z, 6))
        .as("z"))
  }

  /**
   * Seasonal Mann-Kendall trend test (Hirsch & Slack 1984; Hirsch,
   * Smith & Slack 1982) — [[mannKendallTrend]] for series with a
   * seasonal cycle (hour-of-day, day-of-week, month): comparing
   * January to July reads the seasonal swing as trend, so the
   * seasonal form compares only WITHIN-season pairs — S = Σ_g S_g
   * and Var = Σ_g Var_g over seasons g (per-season tie correction),
   * z with the same continuity correction on the summed S. The
   * standard form assumes seasons are serially independent (stated;
   * the caller's aggregation-grid obligation).
   *
   * EXACTNESS: values quantize at `unitScale`; each within-season
   * sign sum is the EXACT pair join ((ts, id) total order — the
   * [[mannKendallTrend]] machinery partitioned by season); per-season
   * tie terms and the variance numerators n_g(n_g−1)(2n_g+5) − tie_g
   * accumulate as DECIMAL(38,0) and SUM over seasons exactly before
   * ONE /18 double conversion; z reuses the continuity-corrected
   * chain through [[graft.core.Num.roundz]] 6dp.
   *
   * Scale shape: the pair join is quadratic PER SEASON — season keys
   * shard the join, so the honest cost is Σ n_g², not (Σ n_g)²; the
   * LARGEST season is fail-loud gated at `maxRowsPerSeason` (the
   * [[mannKendallTrend]] convention: aggregate each season to a
   * coarser grid upstream past it). One level aggregate for ties,
   * one season-frame aggregate for the variance sum.
   *
   * Output one row: (`n`, `n_seasons`, `s_stat`, `var_s`, `z`).
   */
  def mannKendallSeasonal(obs: DataFrame, tsCol: String,
                          seasonCol: String, idCol: String,
                          valueCol: String, unitScale: Long = 100L,
                          maxRowsPerSeason: Long = 20000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxRowsPerSeason >= 2,
      s"maxRowsPerSeason must be >= 2: $maxRowsPerSeason")
    val dec = "decimal(38,0)"
    val base = graft.core.LineageCut.cut(obs
      .filter(col(tsCol).isNotNull && col(seasonCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(seasonCol).cast("string").as("season"),
        col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u")))
    val perSeason = graft.core.LineageCut.cut(
      base.groupBy("season").agg(count(lit(1)).as("ng")))
    val gate = perSeason.agg(coalesce(max("ng"), lit(0L)).as("mx"),
      coalesce(sum("ng"), lit(0L)).as("n"),
      count(lit(1)).as("ns")).collect().head
    val (mxSeason, n, nSeasons) =
      (gate.getLong(0), gate.getLong(1), gate.getLong(2))
    require(mxSeason <= maxRowsPerSeason,
      s"mannKendallSeasonal: largest season has $mxSeason rows, " +
        s"exceeding maxRowsPerSeason=$maxRowsPerSeason — each season's " +
        "sign sum is an exact within-season PAIR join; aggregate every " +
        "season to a coarser grid upstream or raise maxRowsPerSeason " +
        "deliberately")
    val a = base.select(col("season"), col("ts").as("ts_a"),
      col("id").as("id_a"), col("u").as("u_a"))
    val b = base.select(col("season"), col("ts").as("ts_b"),
      col("id").as("id_b"), col("u").as("u_b"))
    val pairs = a.join(b, Seq("season"))
      .filter(col("ts_a") < col("ts_b") ||
        (col("ts_a") === col("ts_b") && col("id_a") < col("id_b")))
    val sAgg = pairs.agg(coalesce(sum(
      when(col("u_b") > col("u_a"), 1L)
        .when(col("u_b") < col("u_a"), -1L).otherwise(0L)), lit(0L))
      .as("s"))
    // per-season tie term, then the EXACT decimal variance-numerator
    // sum over seasons: Σ_g [n_g(n_g−1)(2n_g+5) − tie_g]
    val ties = base.groupBy("season", "u").agg(count(lit(1)).as("t"))
      .groupBy("season")
      .agg(coalesce(sum(col("t").cast(dec) * (col("t") - 1L) *
        (col("t") * 2L + 5L)), lit(0L).cast(dec)).as("tie"))
    val varNum = perSeason.join(ties, Seq("season"), "left")
      .agg(coalesce(sum(col("ng").cast(dec) * (col("ng") - 1L) *
        (col("ng") * 2L + 5L) -
        coalesce(col("tie"), lit(0L).cast(dec))), lit(0L).cast(dec))
        .as("vnum"))
    val varS = col("vnum").cast("double") / 18.0
    val z = when(col("s") > 0L, (col("s") - 1L).cast("double") /
        sqrt(varS))
      .when(col("s") < 0L, (col("s") + 1L).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    sAgg.crossJoin(varNum).select(lit(n).as("n"),
      lit(nSeasons).as("n_seasons"), col("s").as("s_stat"),
      when(lit(n) >= 2L, round(varS, 6)).as("var_s"),
      when(lit(n) >= 2L && varS > 0.0, graft.core.Num.roundz(z, 6))
        .as("z"))
  }

  /**
   * Poisson(1) inverse-CDF thresholds as 8-hex-digit lowercase
   * strings: weight w(u) = #{k : t_k ≤ u} for a uniform 32-bit hex
   * draw u — shared VERBATIM by [[poissonBootstrapMeanCI]] and its
   * generated oracle SQL, so both engines assign identical replicate
   * weights by construction. t_k = floor(CDF_Poisson(1)(k) · 2³²);
   * the chain stops at w = 12 (P(X > 12) ≈ 10⁻¹³ — the clamp is part
   * of the deterministic definition, not an approximation knob).
   */
  val poissonHexThresholds: Seq[String] = {
    var p = math.exp(-1.0)
    var cdf = p
    (0 to 11).map { k =>
      val t = math.floor(cdf * 4294967296.0).toLong
      if (k < 11) { p = p / (k + 1); cdf += p }
      f"$t%08x"
    }
  }

  /**
   * The shared weighted-explode stage of the bootstrap pair: one md5
   * per (row, replicate-QUAD) — a 32-hex digest carries FOUR
   * independent 32-bit draws, so the hash work is reps/4 per row, not
   * reps (measured 16 s -> ~6 s on the 100k x 200 bench cell) — then
   * each 8-hex slice runs the [[poissonHexThresholds]] inverse CDF.
   * Returns the input plus (`b`, `__w`). `reps` must be a multiple of
   * 4 (enforced by the callers' gates).
   */
  private def poissonWeightedReps(base: DataFrame, reps: Int): DataFrame = {
    val h32 = md5(concat(col("id").cast("string"), lit(":"),
      col("__g").cast("string")))
    val h = substring(col("__h32"), col("__j") * 8 + 1, lit(8))
    val w = poissonHexThresholds.zipWithIndex
      .foldLeft(when(h < lit(poissonHexThresholds.head), 0L)) {
        case (c, (t, k)) =>
          if (k == 0) c else c.when(h < lit(t), k.toLong)
      }.otherwise(lit(12L))
    base
      .withColumn("__g", explode(sequence(lit(0), lit(reps / 4 - 1))))
      .withColumn("__h32", h32)
      .withColumn("__j", explode(sequence(lit(0), lit(3))))
      .withColumn("b", col("__g") * 4 + col("__j"))
      .withColumn("__w", w)
      .drop("__g", "__h32", "__j")
  }

  /**
   * Poisson-bootstrap percentile CI for the mean (Chamandy, Muralidhar
   * & Najmi 2012 — "Estimating Uncertainty for Massive Data Streams",
   * the bootstrap that actually runs at 100 TB): true multinomial
   * resampling needs the global n per draw; giving each (row,
   * replicate) an INDEPENDENT Poisson(1) weight instead makes the
   * resample embarrassingly parallel — one exploded pass, one
   * map-side-combined aggregate to `reps` rows — while matching the
   * classical bootstrap to O(1/n). Weights are DETERMINISTIC: each
   * md5(id:quad) digest carries FOUR 8-hex uniform draws (the
   * q_perm_test machinery, amortized 4x via
   * [[poissonWeightedReps]]), each pushed through the shared
   * [[poissonHexThresholds]] inverse CDF, so both engines replay the
   * identical resample.
   *
   * CLUSTER-BOOTSTRAP SEMANTICS (stated): weights key on md5(idCol),
   * so every row sharing an `idCol` value draws the IDENTICAL weight
   * in every replicate — duplicate ids are one UNIT whose event rows
   * resample together (the Chamandy design: the resampling unit is
   * the randomization unit, not the event row). Pass a row-unique id
   * for the plain iid bootstrap; pass the user/session id to
   * bootstrap at the unit level.
   *
   * EXACTNESS: values quantize at `unitScale`; per-replicate Σw is an
   * exact long and Σw·u an exact decimal; each replicate mean is ONE
   * division; the CI picks ORDER STATISTICS of the unrounded
   * replicate means (total order (mean, b); index ⌈reps·α/2⌉ from
   * exact integer arithmetic with α as num/10⁶, hi = reps − lo + 1 —
   * the basic percentile rule, stated); outputs round 6dp. Fewer
   * than 30 DISTINCT UNITS fails loud — units, not rows, because a
   * replicate's total weight is Poisson(units): at 6 units × 1000
   * rows a zero-total-weight replicate has p ≈ 0.25% per replicate,
   * nowhere near astronomical — and below 30 units the bootstrap
   * itself is invalid. A zero-total-weight replicate past the gate
   * (p ≈ 10⁻¹³ per replicate at 30 units) raises in-plan rather
   * than letting a NaN mean corrupt the order-statistic pick.
   *
   * Scale shape: rows × reps through ONE exploded aggregate (the
   * q_perm_test shape — map-side combined to `reps` rows), then a
   * reps-row ordered pick. `reps` gated at 1000.
   *
   * Output one row: (`n`, `reps`, `mean`, `lo`, `hi`); `n` is the
   * ROW count (the mean's denominator), the gate counts units.
   */
  def poissonBootstrapMeanCI(df: DataFrame, idCol: String,
                             valueCol: String, reps: Int = 200,
                             alpha: Double = 0.05,
                             unitScale: Long = 100L): DataFrame = {
    require(reps >= 12 && reps <= 1000 && reps % 4 == 0,
      s"reps in [12, 1000], multiple of 4: $reps")
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    // cutFanout: the weighted-replica explode multiplies per-row md5
    // work by reps/4 — a single-split scan must not pin that whole
    // map-side aggregate to one core (measured 4.3 s one-task stage)
    val base = graft.core.LineageCut.cutFanout(df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u")))
    val st = base.agg(count(lit(1)).as("__rows"),
      countDistinct(col("id")).as("__units")).collect().head
    val n = st.getLong(0)
    val units = st.getLong(1)
    require(units >= 30,
      s"poissonBootstrapMeanCI: $units distinct units (of $n rows) < " +
        "30 — weights key on idCol, so duplicate ids share ONE draw " +
        "per replicate (cluster bootstrap); the Poisson approximation " +
        "to the multinomial (and the bootstrap itself) needs >= 30 " +
        "UNITS, not rows")
    val anum = math.round(alpha * 1000000L)
    val loIdx = (reps * anum + 2000000L - 1L) / 2000000L // ceil
    val hiIdx = reps - loIdx + 1
    require(loIdx >= 1 && loIdx < hiIdx,
      s"alpha=$alpha with reps=$reps leaves no CI mass")
    val perRep = poissonWeightedReps(base, reps)
      .groupBy("b")
      .agg(sum("__w").as("__sw"),
        sum(col("__w").cast(dec) * col("u")).as("__swu"))
      // fail loud, never NaN: a zero-total-weight replicate would
      // yield 0/0 = NaN, which sorts LAST under ascending double
      // order and silently corrupts the hi-index pick
      .withColumn("__m", when(col("__sw") > 0L,
        col("__swu").cast("double") / col("__sw").cast("double"))
        .otherwise(raise_error(lit("poissonBootstrapMeanCI: a " +
          "replicate drew ZERO total weight — too few distinct " +
          "units for the Poisson bootstrap; add units"))
          .cast("double")))
    val ord = Window.orderBy(col("__m"), col("b"))
    val picked = perRep.withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === loIdx || col("__rn") === hiIdx)
      .agg(min(when(col("__rn") === loIdx, col("__m"))).as("__lo"),
        min(when(col("__rn") === hiIdx, col("__m"))).as("__hi"))
    val mean = base.agg(
      (sum(col("u").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("__mean"))
    val uD = lit(unitScale.toDouble)
    mean.crossJoin(picked).select(lit(n).as("n"),
      lit(reps).as("reps"),
      round(col("__mean") / uD, 6).as("mean"),
      graft.core.Num.roundz(col("__lo") / uD, 6).as("lo"),
      graft.core.Num.roundz(col("__hi") / uD, 6).as("hi"))
  }

  /**
   * Poisson-bootstrap percentile CI for the DIFFERENCE of two arm
   * means — the [[poissonBootstrapMeanCI]] machinery on the actual
   * A/B readout (Chamandy et al. 2012 run exactly this shape at
   * fleet scale): each (unit, replicate) draws its deterministic
   * Poisson(1) weight, each replicate yields (mean_T − mean_C), and
   * the CI is the basic-percentile order-statistic pick. A CI
   * excluding 0 is the resampling twin of [[welchTTest]]'s verdict —
   * with no normality assumption on the unit metric (which for
   * per-user sums is routinely heavy-tailed).
   *
   * CLUSTER-BOOTSTRAP SEMANTICS (the [[poissonBootstrapMeanCI]]
   * contract): weights key on md5(idCol), so rows sharing an id are
   * ONE resampling unit. Both arms need ≥ 30 DISTINCT UNITS (fail
   * loud — row counts can sail past while Poisson(units) still
   * zeroes a replicate), and a unit present in BOTH arms is refused
   * loudly: its shared draw would correlate the two arm means inside
   * every replicate, silently shrinking the CI.
   *
   * EXACTNESS: the [[poissonBootstrapMeanCI]] contract per arm —
   * exact long/decimal weight sums, one division per (replicate,
   * arm), the replicate diff a single subtraction; order statistics
   * over the total order (diff, b); `diff`/`lo`/`hi` flow through
   * [[graft.core.Num.roundz]] 6dp (a null effect lands on zero from
   * below half the time). A zero-total-weight (replicate, arm) cell
   * past the gate raises in-plan rather than feeding NaN to the
   * pick.
   *
   * Scale shape: rows × reps through ONE exploded aggregate to
   * 2·reps (replicate, arm) cells, a reps-row pivot + ordered pick;
   * the gate adds one id-keyed distinct aggregate.
   *
   * Output one row: (`n_t`, `n_c`, `reps`, `diff`, `lo`, `hi`);
   * `n_t`/`n_c` are per-arm ROW counts (the means' denominators),
   * the gates count units.
   */
  def poissonBootstrapDiffCI(df: DataFrame, idCol: String,
                             groupCol: String, treatment: String,
                             valueCol: String, reps: Int = 200,
                             alpha: Double = 0.05,
                             unitScale: Long = 100L): DataFrame = {
    require(reps >= 12 && reps <= 1000 && reps % 4 == 0,
      s"reps in [12, 1000], multiple of 4: $reps")
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    // cutFanout: the poissonBootstrapMeanCI rationale — parallelize the
    // big exploded aggregate's map side off a single-split scan
    val base = graft.core.LineageCut.cutFanout(df
      .filter(col(idCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        (col(groupCol).cast("string") === treatment).as("t"),
        round(col(valueCol) * unitScale).cast("long").as("u")))
    val st = base.agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("__rt"),
      sum(when(!col("t"), 1L).otherwise(0L)).as("__rc"),
      countDistinct(when(col("t"), col("id"))).as("__ut"),
      countDistinct(when(!col("t"), col("id"))).as("__uc"),
      countDistinct(col("id")).as("__ua")).collect().head
    val nT = if (st.isNullAt(0)) 0L else st.getLong(0)
    val nC = if (st.isNullAt(1)) 0L else st.getLong(1)
    val (uT, uC, uA) = (st.getLong(2), st.getLong(3), st.getLong(4))
    require(uT >= 30 && uC >= 30,
      s"poissonBootstrapDiffCI: need >= 30 DISTINCT UNITS per arm " +
        s"(treatment=$uT units/$nT rows, control=$uC units/$nC rows) " +
        "— weights key on idCol, so duplicate ids share one draw " +
        "per replicate (cluster bootstrap)")
    val overlap = uT + uC - uA
    require(overlap == 0L,
      s"poissonBootstrapDiffCI: $overlap unit(s) appear in BOTH arms " +
        "— a unit's shared weight draw correlates the two arm means " +
        "inside every replicate and silently shrinks the CI; assign " +
        "each unit to exactly one arm upstream")
    val anum = math.round(alpha * 1000000L)
    val loIdx = (reps * anum + 2000000L - 1L) / 2000000L
    val hiIdx = reps - loIdx + 1
    require(loIdx >= 1 && loIdx < hiIdx,
      s"alpha=$alpha with reps=$reps leaves no CI mass")
    val perCell = poissonWeightedReps(base, reps)
      .groupBy("b", "t")
      .agg(sum("__w").as("__sw"),
        sum(col("__w").cast(dec) * col("u")).as("__swu"))
      // fail loud, never NaN (the poissonBootstrapMeanCI guard)
      .withColumn("__m", when(col("__sw") > 0L,
        col("__swu").cast("double") / col("__sw").cast("double"))
        .otherwise(raise_error(lit("poissonBootstrapDiffCI: a " +
          "(replicate, arm) cell drew ZERO total weight — too few " +
          "distinct units for the Poisson bootstrap; add units"))
          .cast("double")))
    val perRep = perCell.groupBy("b").agg(
      (min(when(col("t"), col("__m"))) -
        min(when(!col("t"), col("__m")))).as("__d"))
    val ord = Window.orderBy(col("__d"), col("b"))
    val picked = perRep.withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === loIdx || col("__rn") === hiIdx)
      .agg(min(when(col("__rn") === loIdx, col("__d"))).as("__lo"),
        min(when(col("__rn") === hiIdx, col("__d"))).as("__hi"))
    val means = base.groupBy("t").agg(
      (sum(col("u").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("__m"))
      .agg((min(when(col("t"), col("__m"))) -
        min(when(!col("t"), col("__m")))).as("__diff"))
    val uD = lit(unitScale.toDouble)
    means.crossJoin(picked).select(lit(nT).as("n_t"), lit(nC).as("n_c"),
      lit(reps).as("reps"),
      graft.core.Num.roundz(col("__diff") / uD, 6).as("diff"),
      graft.core.Num.roundz(col("__lo") / uD, 6).as("lo"),
      graft.core.Num.roundz(col("__hi") / uD, 6).as("hi"))
  }

  /**
   * Sample-ratio-mismatch check (the chi-square goodness-of-fit of
   * arm counts vs the DESIGNED split — Fabijan et al. 2019 call SRM
   * the most important A/B guardrail): an experiment whose traffic
   * split drifted from its design (broken randomization, bot
   * filtering biased by arm, redirect loss) invalidates every
   * downstream readout, so this runs BEFORE [[welchTTest]] /
   * [[cupedAdjust]]. χ² = Σ (O_g − E_g)²/E_g with E_g = n·share_g,
   * df = k − 1. Statistic-only (the [[anovaF]] convention; at df = 1
   * the 3.84/6.63 cutoffs are the 5%/1% lines).
   *
   * EXACTNESS: observed counts are exact longs from ONE aggregate;
   * expected shares are caller literals carried as exact
   * num/10⁶ rationals (the paretoReport idiom) so E_g = n·num/10⁶ is
   * one fixed chain; per-arm terms fold in ARM ORDER (pinned);
   * `chi2` rounds 4dp. Arms with zero designed share are rejected
   * loudly; an OBSERVED arm missing from the design fails loud
   * in-plan (a silent drop would hide exactly the bug SRM hunts).
   * Designed arms with zero observed rows still contribute E_g.
   *
   * Scale shape: one map-side-combined count aggregate to a k-row
   * frame + a broadcast of the k designed shares; nothing else moves.
   *
   * Output one row: (`n`, `k`, `df1`, `chi2`).
   */
  /**
   * The per-arm χ² term — ONE chain shared verbatim by [[srmCheck]]
   * and the streaming SRM monitor ([[graft.streaming.Streams]]), so
   * batch and stream land on identical bits: E = n·(num/10⁶) (num
   * the designed share as an exact num/10⁶ rational),
   * term = (O − E)²/E.
   */
  private[graft] def srmChi2Term(o: Column, n: Column,
                                 num: Column): Column = {
    val e = n.cast("double") * (num.cast("double") / lit(1000000.0))
    (o.cast("double") - e) * (o.cast("double") - e) / e
  }

  def srmCheck(df: DataFrame, groupCol: String,
               expectedShares: Map[String, Double]): DataFrame = {
    require(expectedShares.size >= 2, "need >= 2 designed arms")
    require(expectedShares.values.forall(s => s > 0.0 && s < 1.0),
      "every designed share must be in (0,1)")
    val tot = expectedShares.values.sum
    require(math.abs(tot - 1.0) < 1e-9,
      s"designed shares must sum to 1: $tot")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = expectedShares.toSeq.sorted
      .map { case (g, s) => (g, math.round(s * 1000000L)) }
      .toDF("__g", "__num")
    val obs = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__o"))
    val joined = shares.join(obs, Seq("__g"), "full_outer")
      .filter(when(col("__num").isNull,
        raise_error(concat(lit("srmCheck: observed arm '"), col("__g"),
          lit("' is not in the designed split — randomization is " +
            "emitting arms the design never had"))).cast("boolean"))
        .otherwise(lit(true)))
      .select(col("__g"), col("__num"),
        coalesce(col("__o"), lit(0L)).as("__o"))
    val w = Window.orderBy("__g")
    val wTot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val term = srmChi2Term(col("__o"), col("__n"), col("__num"))
    val folded = joined
      .withColumn("__n", sum("__o").over(wTot))
      .withColumn("__k", count(lit(1)).over(wTot))
      .withColumn("__run", sum(term).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("__k"))
    folded.select(col("__n").as("n"), col("__k").as("k"),
      (col("__k") - 1L).as("df1"),
      when(col("__n") > 0L, round(col("__run"), 4)).as("chi2"))
  }

  /**
   * Always-valid sequential test — the mixture SPRT (Johari, Koomen,
   * Pekelis & Walsh 2017, "Peeking at A/B Tests"): every other
   * readout in this suite ([[welchTTest]], [[cupedWelchTTest]],
   * [[poissonBootstrapDiffCI]]) is FIXED-HORIZON — peek at it daily
   * and the realized false-positive rate blows past α (the textbook
   * peeking problem). The mSPRT's mixture likelihood ratio against a
   * N(0, τ²) prior on the effect gives a p that is valid at EVERY
   * look simultaneously: at look k with cumulative arm moments,
   * θ̂ = m_T − m_C, V = s²_T/n_T + s²_C/n_C,
   * Λ = √(V/(V+τ²)) · exp(θ̂²τ²/(2V(V+τ²))), and
   * p_k = min(p_{k−1}, 1/Λ_k) — stop the moment p crosses α, at any
   * cadence, without alpha spending. The always-valid CI is the
   * running INTERSECTION of per-look intervals θ̂ ± √((V(V+τ²)/τ²)
   * · ln((V+τ²)/(α²V))). τ² is the caller's prior effect-scale knob
   * (the paper's one parameter; match it to the MDE's order).
   *
   * EXACTNESS: values quantize at `unitScale`; per-(look, arm)
   * moments are exact DECIMAL(38,0); CUMULATIVE moments are decimal
   * window sums over the look×arm grid (exact — missing cells
   * coalesce to zero), converted to double ONCE per look; means and
   * variances run the [[welchTTest]] chains verbatim; Λ, p, and the
   * CI radius are fixed IEEE chains (one sqrt/exp/ln each); the
   * running min/max fold over the look frame in look order. Outputs
   * round 6dp through [[graft.core.Num.roundz]]. Looks where either
   * arm has n < 2 or V ≤ 0 report NULL p/lo/hi for that look (the
   * running fold skips them — min/max ignore NULLs in both engines).
   *
   * Scale shape: ONE map-side-combined (look, arm) moment aggregate
   * — per-look cost is one aggregate, the Johari deployment shape —
   * then windows over the LOOK frame only (look-count-sized,
   * fail-loud gated at `maxLooks`; the raw rows never move again).
   *
   * Output one row per look, ascending: (`look`, `n_t`, `n_c`,
   * `diff`, `p_always`, `lo`, `hi`).
   */
  def sequentialMSPRT(df: DataFrame, lookCol: String, groupCol: String,
                      treatment: String, valueCol: String,
                      tau2: Double, alpha: Double = 0.05,
                      unitScale: Long = 100L,
                      maxLooks: Long = 10000L): DataFrame = {
    require(tau2 > 0.0, s"tau2 (mixture prior variance) must be > 0: $tau2")
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxLooks >= 1, s"maxLooks must be >= 1: $maxLooks")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(lookCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(lookCol).cast("long").as("look"),
        (col(groupCol).cast("string") === treatment).as("t"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val cells = graft.core.LineageCut.cut(base.groupBy("look", "t")
      .agg(count(lit(1)).as("dn"),
        sum(col("u").cast(dec)).as("ds1"),
        sum(col("u").cast(dec) * col("u")).as("ds2")))
    val looks = graft.core.LineageCut.cut(
      cells.select("look").distinct())
    val nLooks = looks.count()
    require(nLooks <= maxLooks,
      s"sequentialMSPRT: $nLooks looks exceeds maxLooks=$maxLooks — " +
        "the cumulative fold runs the look frame through single-task " +
        "windows; coarsen the look grid upstream or raise maxLooks " +
        "deliberately")
    // look×arm grid so a look missing one arm still carries the other
    // arm's cumulative forward (zero-row cells, not absent cells)
    val grid = looks.crossJoin(Seq(true, false).toDF("t"))
      .join(cells, Seq("look", "t"), "left")
      .select(col("look"), col("t"),
        coalesce(col("dn"), lit(0L)).as("dn"),
        coalesce(col("ds1"), lit(0L).cast(dec)).as("ds1"),
        coalesce(col("ds2"), lit(0L).cast(dec)).as("ds2"))
    val wArm = Window.partitionBy("t").orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("n", sum("dn").over(wArm))
      .withColumn("s1", sum("ds1").over(wArm))
      .withColumn("s2", sum("ds2").over(wArm))
    val wide = cum.groupBy("look").agg(
      armCell("t", true, "n"), armCell("t", true, "s1"),
      armCell("t", true, "s2"), armCell("t", false, "n"),
      armCell("t", false, "s1"), armCell("t", false, "s2"))
    // the welchTTest mean/variance chains on the cumulative moments
    def mean(a: String): Column = col(s"s1_$a").cast("double") /
      (col(s"n_$a") * unitScale).cast("double")
    def vr(a: String): Column =
      ((col(s"s2_$a").cast("double") -
        col(s"s1_$a").cast("double") * col(s"s1_$a").cast("double") /
          col(s"n_$a").cast("double")) /
        (col(s"n_$a").cast("double") - 1d)) /
        (unitScale * unitScale).toDouble
    val v = vr("t") / col("n_t").cast("double") +
      vr("c") / col("n_c").cast("double")
    val d = mean("t") - mean("c")
    val lam = sqrt(v / (v + tau2)) *
      exp(d * d * tau2 / (lit(2.0) * v * (v + tau2)))
    val pRaw = least(lit(1.0), lit(1.0) / lam)
    val radius = sqrt((v * (v + tau2) / tau2) *
      log((v + tau2) / (lit(alpha * alpha) * v)))
    val ok = col("n_t") >= 2L && col("n_c") >= 2L && v > 0.0
    val wRun = Window.orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wide
      .withColumn("__p", when(ok, pRaw))
      .withColumn("__lo", when(ok, d - radius))
      .withColumn("__hi", when(ok, d + radius))
      .withColumn("__pmin", min("__p").over(wRun))
      .withColumn("__lomax", max("__lo").over(wRun))
      .withColumn("__himin", min("__hi").over(wRun))
      .select(col("look"), col("n_t"), col("n_c"),
        when(ok, graft.core.Num.roundz(d, 6)).as("diff"),
        round(col("__pmin"), 6).as("p_always"),
        graft.core.Num.roundz(col("__lomax"), 6).as("lo"),
        graft.core.Num.roundz(col("__himin"), 6).as("hi"))
      .orderBy("look")
  }

  /**
   * Difference-in-differences estimate (Card & Krueger 1994 framing)
   * — the quasi-experimental readout when randomization wasn't
   * available but a pre/post boundary and a control population are:
   * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), the treatment
   * effect under the parallel-trends assumption (the caller's design
   * obligation — this operator reports the arithmetic, the four cell
   * means, and the pooled-variance standard error so the reader can
   * judge the magnitude against the noise; statistic-only, no p).
   *
   * EXACTNESS: values quantize at `unitScale`; the four (group ×
   * period) cells come from ONE exact-decimal moment aggregate; every
   * mean/variance/SE is a fixed IEEE chain; `did` flows through
   * [[graft.core.Num.roundz]] 6dp (a null effect lands on zero from
   * below half the time). Missing cells (no treated-pre rows, say)
   * report NULL did/se — visibly undiagnosable, never silently 0. SE
   * uses the pooled per-cell sample variances Σ s²_c/n_c (n_c ≥ 2
   * per cell required for SE; the did itself needs n_c ≥ 1).
   *
   * Scale shape: one map-side-combined aggregate to ≤ 4 rows + a
   * pinned 4-row fold. Output one row:
   * (`n`, `mean_c_pre`, `mean_c_post`, `mean_t_pre`, `mean_t_post`,
   * `did`, `se`).
   */
  def diffInDiff(df: DataFrame, treatedCol: String, postCol: String,
                 valueCol: String,
                 unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(treatedCol).isNotNull && col(postCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(treatedCol).cast("boolean").as("__t"),
        col(postCol).cast("boolean").as("__p"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val cells = base.groupBy("__t", "__p")
      .agg(count(lit(1)).as("n"),
        sum(col("u").cast(dec)).as("s1"),
        sum(col("u").cast(dec) * col("u")).as("s2"))
    def cell(t: Boolean, p: Boolean, c: String) =
      max(when(col("__t") === t && col("__p") === p, col(c))).as(s"${c}_${
        if (t) "t" else "c"}_${if (p) "post" else "pre"}")
    val wide = cells.agg(
      cell(false, false, "n"), cell(false, false, "s1"),
      cell(false, false, "s2"),
      cell(false, true, "n"), cell(false, true, "s1"),
      cell(false, true, "s2"),
      cell(true, false, "n"), cell(true, false, "s1"),
      cell(true, false, "s2"),
      cell(true, true, "n"), cell(true, true, "s1"),
      cell(true, true, "s2"))
    val uD = lit(unitScale.toDouble)
    def m(sfx: String) = col(s"s1_$sfx").cast("double") /
      col(s"n_$sfx").cast("double")
    def v(sfx: String) = (col(s"s2_$sfx").cast("double") -
      col(s"s1_$sfx").cast("double") * col(s"s1_$sfx").cast("double") /
        col(s"n_$sfx").cast("double")) /
      (col(s"n_$sfx").cast("double") - 1.0)
    val sfxs = Seq("c_pre", "c_post", "t_pre", "t_post")
    val allCells = sfxs.map(s => col(s"n_$s").isNotNull).reduce(_ && _)
    val allVar = sfxs.map(s => col(s"n_$s") >= 2L).reduce(_ && _)
    val did = (m("t_post") - m("t_pre")) - (m("c_post") - m("c_pre"))
    val se = sqrt(sfxs.map(s => v(s) / col(s"n_$s").cast("double"))
      .reduce(_ + _))
    val nAll = sfxs.map(s => coalesce(col(s"n_$s"), lit(0L)))
      .reduce(_ + _)
    wide.select(nAll.as("n"),
      when(col("n_c_pre").isNotNull, round(m("c_pre") / uD, 6))
        .as("mean_c_pre"),
      when(col("n_c_post").isNotNull, round(m("c_post") / uD, 6))
        .as("mean_c_post"),
      when(col("n_t_pre").isNotNull, round(m("t_pre") / uD, 6))
        .as("mean_t_pre"),
      when(col("n_t_post").isNotNull, round(m("t_post") / uD, 6))
        .as("mean_t_post"),
      when(allCells, graft.core.Num.roundz(did / uD, 6)).as("did"),
      when(allVar, round(se / uD, 6)).as("se"))
  }

  /**
   * CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
   * Walker 2013) — the pre-period adjustment every large-scale A/B
   * platform runs before [[welchTTest]]: with a pre-experiment
   * covariate x per unit, ŷ = y − θ(x − x̄) keeps every group mean
   * unbiased while removing the variance x explains
   * (θ = cov(x,y)/var(x), POOLED across groups — the standard form;
   * a covariate unaffected by treatment is the caller's design
   * obligation). Per group this reports the raw and adjusted means
   * and variances plus the realized variance-reduction ratio — the
   * number that says how much experiment runtime CUPED bought.
   *
   * EXACTNESS: both metrics quantize at `unitScale` (cancels in the
   * reduction ratio); ALL moments — global (for θ, x̄) and per-group
   * (n, Σx, Σy, Σxx, Σxy, Σyy) — are exact DECIMAL(38,0); θ, x̄, and
   * every mean/variance are fixed IEEE chains from those exact
   * integers; sample variances use n−1; `var_reduction` =
   * 1 − var_adj/var_raw flows through [[graft.core.Num.roundz]] 6dp
   * (an unhelpful covariate lands on zero from below). Zero-variance
   * x (θ undefined) reports the RAW columns with NULL adjusted ones;
   * n_g < 2 reports NULL variances.
   *
   * Scale shape: one global moment aggregate + one group-keyed moment
   * aggregate (both map-side combined; the group frame is
   * arm-cardinality-sized). Output one row per group: (`grp`, `n`,
   * `mean_raw`, `mean_cuped`, `var_raw`, `var_cuped`,
   * `var_reduction`).
   */
  /** The two-arm pivot cell shared by every wide arm aggregate here:
    * `max(when(flag === tv, c))` aliased `c_t`/`c_c`. One definition
    * so the five pivots can never drift in suffix convention. */
  private def armCell(flag: String, tv: Boolean, c: String): Column =
    max(when(col(flag) === tv, col(c)))
      .as(s"${c}_${if (tv) "t" else "c"}")

  /** Pooled CUPED θ/x̄ chains over the global moment columns
    * (`gn`/`gsx`/`gsy`/`gsxx`/`gsxy`) — shared VERBATIM by
    * [[cupedAdjust]] and [[cupedWelchTTest]] so the two readouts can
    * never drift. Returns (θ, x̄, θ-denominator). The divisor is
    * NULL-guarded, not a raw /0: ANSI-mode Spark raises on a zero
    * divisor once subexpression elimination hoists the division past
    * its when() guard, and a zero-variance covariate must land on the
    * documented NULL adjusted columns instead. */
  private def cupedThetaXbar(): (Column, Column, Column) = {
    val gnD = col("gn").cast("double")
    val thetaDen = gnD * col("gsxx").cast("double") -
      col("gsx").cast("double") * col("gsx").cast("double")
    val theta = (gnD * col("gsxy").cast("double") -
      col("gsx").cast("double") * col("gsy").cast("double")) /
      when(thetaDen > 0.0, thetaDen)
    (theta, col("gsx").cast("double") / gnD, thetaDen)
  }

  /** The CUPED adjusted-moment expansions Σŷ and Σŷ² from one
    * group's exact moments — the other half of the shared chain. */
  private def cupedAdjMoments(theta: Column, xbar: Column, n: Column,
                              sx: Column, sy: Column, sxx: Column,
                              sxy: Column,
                              syy: Column): (Column, Column) = {
    val nD = n.cast("double")
    val sAdj = sy.cast("double") - theta * (sx.cast("double") -
      nD * xbar)
    val ssAdj = syy.cast("double") -
      lit(2.0) * theta * (sxy.cast("double") -
        xbar * sy.cast("double")) +
      theta * theta * (sxx.cast("double") -
        lit(2.0) * xbar * sx.cast("double") + nD * xbar * xbar)
    (sAdj, ssAdj)
  }

  def cupedAdjust(df: DataFrame, groupCol: String, preCol: String,
                  metricCol: String,
                  unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(preCol).isNotNull &&
        col(metricCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        round(col(preCol) * unitScale).cast("long").as("ux"),
        round(col(metricCol) * unitScale).cast("long").as("uy"))
    def moms(g: org.apache.spark.sql.RelationalGroupedDataset) =
      g.agg(count(lit(1)).as("n"),
        sum(col("ux").cast(dec)).as("sx"),
        sum(col("uy").cast(dec)).as("sy"),
        sum(col("ux").cast(dec) * col("ux")).as("sxx"),
        sum(col("ux").cast(dec) * col("uy")).as("sxy"),
        sum(col("uy").cast(dec) * col("uy")).as("syy"))
    val glob = moms(base.groupBy())
      .select(col("n").as("gn"), col("sx").as("gsx"),
        col("sy").as("gsy"), col("sxx").as("gsxx"),
        col("sxy").as("gsxy"))
    val perG = moms(base.groupBy("grp"))
    val (theta, xbar, thetaDen) = cupedThetaXbar()
    val nD = col("n").cast("double")
    def cd(c: String) = col(c).cast("double")
    val meanRaw = cd("sy") / nD
    val varRaw = (cd("syy") - cd("sy") * cd("sy") / nD) / (nD - 1.0)
    // adjusted moments from the SAME exact integers:
    // Σŷ = Σy − θ(Σx − n·x̄);  Σŷ² expands through Σyy, Σxy, Σxx
    val (sAdj, ssAdj) = cupedAdjMoments(theta, xbar, col("n"),
      col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
    val meanAdj = sAdj / nD
    val varAdj = (ssAdj - sAdj * sAdj / nD) / (nD - 1.0)
    val u2 = lit((unitScale * unitScale).toDouble)
    val uD = lit(unitScale.toDouble)
    val ok = thetaDen > 0.0
    perG.crossJoin(broadcast(glob)).select(col("grp"), col("n"),
      round(meanRaw / uD, 6).as("mean_raw"),
      when(ok, graft.core.Num.roundz(meanAdj / uD, 6)).as("mean_cuped"),
      when(nD > 1.0, round(varRaw / u2, 6)).as("var_raw"),
      when(ok && nD > 1.0, graft.core.Num.roundz(varAdj / u2, 6))
        .as("var_cuped"),
      when(ok && nD > 1.0 && varRaw > 0.0,
        graft.core.Num.roundz(lit(1.0) - varAdj / varRaw, 6))
        .as("var_reduction"))
  }

  /**
   * Welch two-sample t on the CUPED-ADJUSTED metric (Deng et al. 2013
   * §5 — the number experimenters actually ship): [[cupedAdjust]]
   * reports per-arm adjusted moments and the realized variance
   * reduction; this composes the SAME exact-moment chains into the
   * readout — ŷ = y − θ(x − x̄) per unit (θ, x̄ POOLED, identical
   * chains to [[cupedAdjust]]), then the [[welchTTest]] statistic on
   * the adjusted per-arm moments. Because every arm mean shifts by
   * the same constant θx̄, the adjusted diff equals the raw diff
   * whenever θ·(x̄_T − x̄_C) is the covariate imbalance CUPED removes
   * — the t moves because the VARIANCE shrank.
   *
   * EXACTNESS: both metrics quantize at `unitScale`; global and
   * per-arm moments are exact DECIMAL(38,0) from ONE aggregate each;
   * θ/x̄ and the adjusted Σŷ, Σŷ² expansions are the
   * [[cupedAdjust]] chains verbatim; the Welch t/df run on those
   * adjusted moments as fixed IEEE chains. Means round 6dp through
   * [[graft.core.Num.roundz]]; θ likewise; t/df round 4dp (the
   * [[welchTTest]] grid). Zero-variance covariate (θ undefined),
   * a missing arm, n < 2 on either side, or zero pooled SE report
   * NULL t/df — stated, never an engine 0/0 artifact. On a zero-
   * covariance covariate θ = 0 exactly and the readout equals
   * [[welchTTest]]'s on the raw metric (spec-pinned).
   *
   * Scale shape: one global + one arm-keyed moment aggregate (both
   * map-side combined, the arm frame is 2 rows); nothing else moves.
   *
   * Output one row: (`n_t`, `n_c`, `theta`, `mean_t`, `mean_c`,
   * `t_stat`, `df`).
   */
  def cupedWelchTTest(df: DataFrame, groupCol: String, treatment: String,
                      preCol: String, metricCol: String,
                      unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(preCol).isNotNull &&
        col(metricCol).isNotNull)
      .select((col(groupCol).cast("string") === treatment).as("t"),
        round(col(preCol) * unitScale).cast("long").as("ux"),
        round(col(metricCol) * unitScale).cast("long").as("uy"))
    val glob = base.agg(count(lit(1)).as("gn"),
      sum(col("ux").cast(dec)).as("gsx"),
      sum(col("uy").cast(dec)).as("gsy"),
      sum(col("ux").cast(dec) * col("ux")).as("gsxx"),
      sum(col("ux").cast(dec) * col("uy")).as("gsxy"))
    val perArm = base.groupBy("t").agg(count(lit(1)).as("n"),
      sum(col("ux").cast(dec)).as("sx"),
      sum(col("uy").cast(dec)).as("sy"),
      sum(col("ux").cast(dec) * col("ux")).as("sxx"),
      sum(col("ux").cast(dec) * col("uy")).as("sxy"),
      sum(col("uy").cast(dec) * col("uy")).as("syy"))
    val wide = perArm.agg(
      armCell("t", true, "n"), armCell("t", true, "sx"),
      armCell("t", true, "sy"), armCell("t", true, "sxx"),
      armCell("t", true, "sxy"), armCell("t", true, "syy"),
      armCell("t", false, "n"), armCell("t", false, "sx"),
      armCell("t", false, "sy"), armCell("t", false, "sxx"),
      armCell("t", false, "sxy"), armCell("t", false, "syy"))
    // the shared cupedThetaXbar / cupedAdjMoments chains, per arm
    val (theta, xbar, thetaDen) = cupedThetaXbar()
    def nD(a: String) = col(s"n_$a").cast("double")
    def adj(a: String) = cupedAdjMoments(theta, xbar, col(s"n_$a"),
      col(s"sx_$a"), col(s"sy_$a"), col(s"sxx_$a"), col(s"sxy_$a"),
      col(s"syy_$a"))
    def meanAdj(a: String) = adj(a)._1 / nD(a)
    def varAdj(a: String) = {
      val (sAdj, ssAdj) = adj(a)
      (ssAdj - sAdj * sAdj / nD(a)) / (nD(a) - 1.0)
    }
    val se2 = varAdj("t") / nD("t") + varAdj("c") / nD("c")
    val tStat = (meanAdj("t") - meanAdj("c")) / sqrt(se2)
    val dfW = (se2 * se2) /
      ((varAdj("t") / nD("t")) * (varAdj("t") / nD("t")) /
        (nD("t") - 1.0) +
        (varAdj("c") / nD("c")) * (varAdj("c") / nD("c")) /
          (nD("c") - 1.0))
    val uD = lit(unitScale.toDouble)
    val okTheta = thetaDen > 0.0
    val bothArms = col("n_t").isNotNull && col("n_c").isNotNull
    val okT = okTheta && bothArms && col("n_t") >= 2L &&
      col("n_c") >= 2L && se2 > 0.0
    wide.crossJoin(broadcast(glob)).select(
      coalesce(col("n_t"), lit(0L)).as("n_t"),
      coalesce(col("n_c"), lit(0L)).as("n_c"),
      when(okTheta, graft.core.Num.roundz(theta, 6)).as("theta"),
      when(okTheta && col("n_t").isNotNull,
        graft.core.Num.roundz(meanAdj("t") / uD, 6)).as("mean_t"),
      when(okTheta && col("n_c").isNotNull,
        graft.core.Num.roundz(meanAdj("c") / uD, 6)).as("mean_c"),
      when(okT, graft.core.Num.roundz(tStat, 4)).as("t_stat"),
      when(okT, round(dfW, 4)).as("df"))
  }

  /**
   * One-way ANOVA intraclass correlation + the cluster design effect
   * (Kish 1965; Donner & Klar 2000) — the number every
   * cluster-randomized experiment needs BEFORE reading
   * [[welchTTest]]: when randomization is by cluster (user, session,
   * geo) but analysis rows are events, within-cluster correlation
   * deflates the effective sample size by deff = 1 + (m̄ − 1)·ρ, and
   * an SE that ignores it is too small by √deff (the same trap the
   * [[poissonBootstrapDiffCI]] cluster gate guards — this REPORTS the
   * magnitude). ρ is the ANOVA estimator: MSB = SSB/(k−1),
   * MSW = SSW/(N−k), n₀ = (N − Σn_g²/N)/(k−1),
   * ρ = (MSB − MSW)/(MSB + (n₀−1)·MSW).
   *
   * EXACTNESS: values quantize at `unitScale` (cancels in ρ and
   * deff); per-cluster (n_g, S_g) are exact; the cross term
   * A = Σ_g S_g²/n_g — the one place a per-cluster DIVISION appears —
   * collapses clusters BY SIZE first: T_s = Σ_{n_g = s} S_g² is an
   * exact DECIMAL per size level, A = Σ_s T_s/s folds ORDERED over
   * the SIZE frame (distinct cluster sizes — hundreds, not clusters),
   * so the double sum is a deterministic sequential fold, never a
   * partition-order-dependent aggregate. Σn_g² = Σ_s s²·k_s stays
   * exact. Every downstream quantity is one fixed IEEE chain; outputs
   * round 6dp through [[graft.core.Num.roundz]]. k < 2, N ≤ k (no
   * within-cluster replication), or a degenerate denominator report
   * NULL ρ/deff (stated).
   *
   * Scale shape: one cluster-keyed moment aggregate (map-side
   * combined — the only pass over the rows), one size-level collapse,
   * ordered folds over the SIZE frame. Nothing quadratic, nothing
   * driver-proportional.
   *
   * Output one row: (`n`, `k`, `icc`, `n0`, `deff`, `n_eff`).
   */
  def clusterDesignEffect(df: DataFrame, clusterCol: String,
                          valueCol: String,
                          unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(clusterCol).isNotNull && col(valueCol).isNotNull)
      .select(col(clusterCol).cast("string").as("g"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val perCluster = base.groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("u").cast(dec)).as("sg"))
    // size-level collapse: T_s = Σ S_g² (exact decimal), k_s clusters
    val bySize = perCluster.groupBy("ng")
      .agg(count(lit(1)).as("ks"),
        sum(col("sg") * col("sg")).as("ts"))
    val ordS = Window.orderBy("ng")
    val cumS = ordS.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val totS = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // A = Σ_s T_s/s as an ORDERED fold over the size frame; the exact
    // companions fold alongside
    val sized = bySize
      .withColumn("__a", sum(col("ts").cast("double") /
        col("ng").cast("double")).over(cumS))
      .withColumn("__sumsq",
        sum(col("ng").cast(dec) * col("ng") * col("ks")).over(totS))
      .withColumn("__n", sum(col("ng").cast(dec) * col("ks")).over(totS))
      .withColumn("__k", sum("ks").over(totS))
      .withColumn("__rn", row_number().over(ordS))
      .withColumn("__nl", count(lit(1)).over(totS))
      .filter(col("__rn") === col("__nl"))
      .select(col("__a").as("a"), col("__sumsq").as("sumsq"),
        col("__n").cast("long").as("n"), col("__k").as("k"))
    val glob = base.agg(sum(col("u").cast(dec)).as("s"),
      sum(col("u").cast(dec) * col("u")).as("q"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val sD = col("s").cast("double")
    val ssb = col("a") - sD * sD / nD
    val ssw = col("q").cast("double") - col("a")
    // NULL divisors on degenerate shapes (the cupedAdjust ANSI note)
    val msb = ssb / when(kD > 1.0, kD - 1.0)
    val msw = ssw / when(nD > kD, nD - kD)
    val n0 = (nD - col("sumsq").cast("double") / nD) /
      when(kD > 1.0, kD - 1.0)
    val iccDen = msb + (n0 - 1.0) * msw
    val icc = (msb - msw) / when(abs(iccDen) > 0.0, iccDen)
    val mbar = nD / kD
    val deff = lit(1.0) + (mbar - 1.0) * icc
    val ok = col("k") >= 2L && nD > kD
    sized.crossJoin(broadcast(glob)).select(col("n"), col("k"),
      when(ok, graft.core.Num.roundz(icc, 6)).as("icc"),
      when(col("k") >= 2L, round(n0, 6)).as("n0"),
      when(ok, graft.core.Num.roundz(deff, 6)).as("deff"),
      when(ok, round(nD / when(deff > 0.0, deff), 6)).as("n_eff"))
  }

  /**
   * Empirical-Bayes rate shrinkage (beta method-of-moments — the
   * Morris 1983 / Efron-Morris regime for per-group rates): raw
   * per-group rates x_g/n_g over thousands of groups are dominated by
   * small-n noise — the top of any per-domain CTR/quality/defect-rate
   * leaderboard is just the smallest groups. Fit a beta prior to the
   * GROUP rate distribution by moments (m̄ = mean of p̂_g,
   * v = sample variance of p̂_g, prior strength M = m̄(1−m̄)/v − 1)
   * and shrink each group toward it:
   * p̃_g = (x_g + M·m̄)/(n_g + M) — small groups collapse to the
   * prior, large groups keep their data.
   *
   * EXACTNESS: per-group (n_g, x_g) are exact longs from ONE keyed
   * aggregate; p̂_g is one division; m̄ and v fold ORDERED over the
   * group frame (the [[kaplanMeier]] level-frame convention, gated at
   * `maxGroups` like [[graft.operators.Privacy.fairnessReport]]);
   * M and every p̃_g are fixed IEEE chains; `rate_raw`/`rate_eb`
   * round 6dp. Degenerate priors — v ≤ 0 (identical group rates) or
   * v ≥ m̄(1−m̄) (MoM M ≤ 0: between-group spread exceeds the
   * binomial ceiling, no beta fits) — report NULL `rate_eb` with the
   * raw columns intact (stated, never a silent fallback).
   *
   * Scale shape: one map-side-combined group aggregate; everything
   * after runs on the GROUP frame (gated). Output one row per group:
   * (`grp`, `n`, `pos`, `rate_raw`, `m_prior`, `rate_eb`).
   */
  def ebShrinkRates(df: DataFrame, groupCol: String, labelCol: String,
                    maxGroups: Long = 100000L): DataFrame = {
    require(maxGroups >= 1, s"maxGroups must be >= 1: $maxGroups")
    val base = df
      .filter(col(groupCol).isNotNull && col(labelCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(labelCol).cast("boolean").as("y"))
    val g = graft.core.LineageCut.cut(base.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos")))
    val nGroups = g.count()
    require(nGroups <= maxGroups,
      s"ebShrinkRates: $nGroups groups exceeds maxGroups=$maxGroups — " +
        "the moment folds run over the group frame; coarsen the group " +
        "column upstream or raise maxGroups deliberately")
    val ord = Window.orderBy("grp")
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val pHat = col("pos").cast("double") / col("n").cast("double")
    val kD = col("__k").cast("double")
    // m̄ and Σp̂² fold in GROUP order (deterministic sequential sums)
    val folded = g
      .withColumn("__k", count(lit(1)).over(tot))
      .withColumn("__sp", sum(pHat).over(cum))
      .withColumn("__spp", sum(pHat * pHat).over(cum))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__last", max(when(col("__rn") === col("__k"),
        col("__sp"))).over(tot))
      .withColumn("__lastpp", max(when(col("__rn") === col("__k"),
        col("__spp"))).over(tot))
    val mBar = col("__last") / kD
    val v = (col("__lastpp") - col("__last") * col("__last") / kD) /
      when(kD > 1.0, kD - 1.0)
    val mom = mBar * (lit(1.0) - mBar)
    val bigM = mom / when(v > 0.0, v) - 1.0
    val okPrior = col("__k") >= 2L && v > 0.0 && v < mom
    val shrunk = (col("pos").cast("double") + bigM * mBar) /
      (col("n").cast("double") + bigM)
    folded.select(col("grp"), col("n"), col("pos"),
      round(pHat, 6).as("rate_raw"),
      when(okPrior, graft.core.Num.roundz(mBar, 6)).as("m_prior"),
      when(okPrior, graft.core.Num.roundz(shrunk, 6)).as("rate_eb"))
  }

  /**
   * Yuen's trimmed-mean t-test (Yuen 1974) — the robust two-sample
   * readout for the metrics [[welchTTest]] is worst at: per-user
   * revenue/latency sums are routinely heavy-tailed, one whale in one
   * arm moves the raw mean for a week, and the field fix is to
   * compare γ-trimmed means with winsorized variances — Yuen's
   * statistic is exactly that with a Welch-style df. Per arm with
   * g = ⌊γn⌋ trimmed from EACH tail (h = n − 2g kept):
   * t = (m̄_T − m̄_C)/√(d_T + d_C) with
   * d = s²_w(n−1)/(h(h−1)), s²_w the winsorized sample variance;
   * df = (d_T + d_C)²/(d_T²/(h_T−1) + d_C²/(h_C−1)).
   *
   * EXACTNESS: values quantize at `unitScale`; per-arm ranks come
   * from [[Ranking.withGlobalRank]] over (value, id) — a chunked
   * range shuffle per arm, NO single-partition window — so g, the
   * tail boundaries (the values AT ranks g+1 and n−g), the kept sum,
   * and the winsorized Σw/Σw² are all EXACT integers/decimals; γ is
   * carried as an exact num/10⁶ rational so g = (n·num) div 10⁶ is
   * integer arithmetic; every downstream quantity is one fixed IEEE
   * chain. Means round 6dp ([[graft.core.Num.roundz]]), t 4dp
   * (roundz), df 4dp. h < 2 on either side or a zero pooled d
   * reports NULL t/df (stated). `idCol` must uniquely identify rows
   * (the rank's total-order tiebreak — the [[spearmanCorrelation]]
   * contract).
   *
   * Scale shape: two chunked rank passes (one per arm) + one
   * boundary aggregate and one moment aggregate per arm over the
   * lineage-cut ranked frames. Nothing single-task, nothing
   * quadratic.
   *
   * Output one row: (`n_t`, `n_c`, `h_t`, `h_c`, `mean_t`, `mean_c`,
   * `t_stat`, `df`).
   */
  def yuenTTest(df: DataFrame, groupCol: String, treatment: String,
                valueCol: String, idCol: String, trim: Double = 0.2,
                unitScale: Long = 100L): DataFrame = {
    require(trim >= 0.0 && trim < 0.5, s"trim must be in [0, 0.5): $trim")
    require(unitScale >= 1, "unitScale must be >= 1")
    val tnum = math.round(trim * 1000000L)
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(idCol).isNotNull)
      .select((col(groupCol).cast("string") === treatment).as("t"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    def armStats(tv: Boolean): DataFrame = {
      val ranked = graft.core.LineageCut.cut(
        Ranking.withGlobalRank(base.filter(col("t") === tv)
          .select("id", "u"),
          Seq(col("u").asc, col("id").asc), "rk", "na"))
      // g from exact integer arithmetic (long div); boundary VALUES at
      // ranks g+1 and n−g (ranks are unique, so these are single cells)
      val withG = ranked.withColumn("g",
        expr(s"(na * ${tnum}L) div 1000000"))
      val bounds = withG.agg(
        max(col("na")).as("n"), max(col("g")).as("gg"),
        min(when(col("rk") === col("g") + 1L, col("u"))).as("lo"),
        max(when(col("rk") === col("na") - col("g"), col("u"))).as("hi"))
      val j = withG.crossJoin(broadcast(bounds))
      val w = when(col("rk") <= col("gg"), col("lo"))
        .when(col("rk") > col("n") - col("gg"), col("hi"))
        .otherwise(col("u"))
      val kept = col("rk") > col("gg") &&
        col("rk") <= col("n") - col("gg")
      val sfx = if (tv) "t" else "c"
      j.agg(max(col("n")).as(s"n_$sfx"),
        (max(col("n")) - lit(2L) * max(col("gg"))).as(s"h_$sfx"),
        sum(when(kept, col("u").cast(dec)).otherwise(lit(0L).cast(dec)))
          .as(s"ts_$sfx"),
        sum(w.cast(dec)).as(s"sw_$sfx"),
        sum(w.cast(dec) * w).as(s"sww_$sfx"))
    }
    val wide = armStats(true).crossJoin(armStats(false))
    def nD(a: String) = col(s"n_$a").cast("double")
    def hD(a: String) = col(s"h_$a").cast("double")
    def mTrim(a: String) = col(s"ts_$a").cast("double") / hD(a)
    def s2w(a: String) = (col(s"sww_$a").cast("double") -
      col(s"sw_$a").cast("double") * col(s"sw_$a").cast("double") /
        nD(a)) / (nD(a) - 1.0)
    def dA(a: String) = s2w(a) * (nD(a) - 1.0) /
      (hD(a) * (hD(a) - 1.0))
    val dSum = dA("t") + dA("c")
    val tStat = (mTrim("t") - mTrim("c")) / sqrt(dSum)
    val dfY = (dSum * dSum) /
      (dA("t") * dA("t") / (hD("t") - 1.0) +
        dA("c") * dA("c") / (hD("c") - 1.0))
    val uD = lit(unitScale.toDouble)
    val ok = col("h_t") >= 2L && col("h_c") >= 2L && dSum > 0.0
    wide.select(col("n_t"), col("n_c"),
      col("h_t").cast("long").as("h_t"),
      col("h_c").cast("long").as("h_c"),
      when(col("h_t") >= 1L, graft.core.Num.roundz(mTrim("t") / uD, 6))
        .as("mean_t"),
      when(col("h_c") >= 1L, graft.core.Num.roundz(mTrim("c") / uD, 6))
        .as("mean_c"),
      when(ok, graft.core.Num.roundz(tStat, 4)).as("t_stat"),
      when(ok, round(dfY, 4)).as("df"))
  }

  /**
   * Minimal-detectable-effect readout (the two-sample power identity,
   * fixed-horizon normal approximation): given the CURRENT arm sizes
   * and pooled variance, the smallest true mean shift the running
   * experiment would detect at significance α and power 1−β —
   * MDE = (z_{1−α/2} + z_{1−β})·√(σ²(1/n_T + 1/n_C)). The triage
   * number next to [[welchTTest]]: a "flat" readout whose MDE is 5%
   * when you care about 1% is an underpowered experiment, not a null
   * result. α and power are restricted to the canonical grid so the
   * normal quantiles are EXACT shared literals (a quantile
   * approximation would never bit-match across engines).
   *
   * EXACTNESS: values quantize at `unitScale`; per-arm and pooled
   * moments are exact longs/decimals from ONE aggregate; σ² is the
   * pooled (within-arm) sample variance
   * (SS_T + SS_C)/(n_T + n_C − 2); the z constants are fixed double
   * literals (stated below); every output is one fixed IEEE chain,
   * 6dp. n < 2 in either arm or zero variance reports NULL MDE.
   * `mde_rel` divides by the CONTROL mean (NULL when it is 0).
   *
   * z literals: α 0.01 → 2.5758293035489004, 0.05 →
   * 1.959963984540054, 0.1 → 1.6448536269514722; power 0.8 →
   * 0.8416212335729143, 0.9 → 1.2815515655446004, 0.95 →
   * 1.6448536269514722.
   *
   * Scale shape: one map-side-combined (arm) moment aggregate;
   * nothing else moves. Output one row: (`n_t`, `n_c`, `mean_c`,
   * `sd_pooled`, `mde_abs`, `mde_rel`).
   */
  def mdeEstimate(df: DataFrame, groupCol: String, treatment: String,
                  valueCol: String, alpha: Double = 0.05,
                  power: Double = 0.8,
                  unitScale: Long = 100L): DataFrame = {
    val zAlpha = Map(0.01 -> 2.5758293035489004,
      0.05 -> 1.959963984540054, 0.1 -> 1.6448536269514722)
    val zPower = Map(0.8 -> 0.8416212335729143,
      0.9 -> 1.2815515655446004, 0.95 -> 1.6448536269514722)
    require(zAlpha.contains(alpha),
      s"alpha must be one of ${zAlpha.keys.toSeq.sorted}: $alpha")
    require(zPower.contains(power),
      s"power must be one of ${zPower.keys.toSeq.sorted}: $power")
    require(unitScale >= 1, "unitScale must be >= 1")
    val zSum = lit(zAlpha(alpha) + zPower(power))
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select((col(groupCol).cast("string") === treatment).as("t"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val perArm = base.groupBy("t").agg(count(lit(1)).as("n"),
      sum(col("u").cast(dec)).as("s1"),
      sum(col("u").cast(dec) * col("u")).as("s2"))
    val wide = perArm.agg(armCell("t", true, "n"),
      armCell("t", true, "s1"), armCell("t", true, "s2"),
      armCell("t", false, "n"), armCell("t", false, "s1"),
      armCell("t", false, "s2"))
    def nD(a: String) = col(s"n_$a").cast("double")
    def ss(a: String) = col(s"s2_$a").cast("double") -
      col(s"s1_$a").cast("double") * col(s"s1_$a").cast("double") /
        nD(a)
    val dfDen = nD("t") + nD("c") - 2.0
    val varPooled = (ss("t") + ss("c")) / when(dfDen > 0.0, dfDen)
    val meanC = col("s1_c").cast("double") /
      (col("n_c") * unitScale).cast("double")
    val mdeAbs = zSum * sqrt(varPooled * (lit(1.0) / nD("t") +
      lit(1.0) / nD("c")))
    val uD = lit(unitScale.toDouble)
    val ok = col("n_t").isNotNull && col("n_c").isNotNull &&
      col("n_t") >= 2L && col("n_c") >= 2L && varPooled > 0.0
    wide.select(coalesce(col("n_t"), lit(0L)).as("n_t"),
      coalesce(col("n_c"), lit(0L)).as("n_c"),
      when(col("n_c").isNotNull, round(meanC, 6)).as("mean_c"),
      when(ok, round(sqrt(varPooled) / uD, 6)).as("sd_pooled"),
      when(ok, round(mdeAbs / uD, 6)).as("mde_abs"),
      when(ok && abs(meanC) > 0.0,
        round(mdeAbs / uD / when(abs(meanC) > 0.0, meanC), 6))
        .as("mde_rel"))
  }

  /**
   * Ratio-metric A/B readout with the delta-method SE (the standard
   * large-scale treatment of CTR/conversion-per-exposure metrics —
   * Deng, Knoblich & Lu 2018): the metric is a RATIO OF SUMS
   * R = Σx/Σy over randomization units (never the mean of per-unit
   * ratios, which weights a 1-impression user like a 10⁶-impression
   * one), and because both sums are random the SE needs the delta
   * method: var(R) ≈ (s²_x − 2R·s_xy + R²·s²_y) / (n·ȳ²) per arm,
   * z = (R_T − R_C)/√(v_T + v_C). Statistic-only (the [[welchTTest]]
   * convention).
   *
   * EXACTNESS: numerator and denominator quantize at `unitScale`
   * (cancels in R and z); per-arm n/Σx/Σy/Σxx/Σxy/Σyy are exact
   * DECIMAL(38,0) from ONE keyed aggregate; R, the sample
   * (co)variances (n−1), and the delta chain are fixed IEEE ops;
   * ratios/diff round 6dp through [[graft.core.Num.roundz]], z 4dp.
   * A zero denominator sum, a missing arm, or n < 2 reports NULL
   * (stated). Units with y = 0 are DATA, not errors — they stay in
   * (they carry x = 0 in any sane metric; the ratio contract is the
   * caller's).
   *
   * Scale shape: one map-side-combined arm aggregate; nothing else
   * moves. Output one row: (`n_t`, `n_c`, `ratio_t`, `ratio_c`,
   * `diff`, `se`, `z`).
   */
  def ratioMetricDelta(df: DataFrame, groupCol: String, treatment: String,
                       numCol: String, denCol: String,
                       unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(numCol).isNotNull &&
        col(denCol).isNotNull)
      .select((col(groupCol).cast("string") === treatment).as("t"),
        round(col(numCol) * unitScale).cast("long").as("ux"),
        round(col(denCol) * unitScale).cast("long").as("uy"))
    val perArm = base.groupBy("t").agg(count(lit(1)).as("n"),
      sum(col("ux").cast(dec)).as("sx"),
      sum(col("uy").cast(dec)).as("sy"),
      sum(col("ux").cast(dec) * col("ux")).as("sxx"),
      sum(col("ux").cast(dec) * col("uy")).as("sxy"),
      sum(col("uy").cast(dec) * col("uy")).as("syy"))
    val wide = perArm.agg(
      armCell("t", true, "n"), armCell("t", true, "sx"),
      armCell("t", true, "sy"), armCell("t", true, "sxx"),
      armCell("t", true, "sxy"), armCell("t", true, "syy"),
      armCell("t", false, "n"), armCell("t", false, "sx"),
      armCell("t", false, "sy"), armCell("t", false, "sxx"),
      armCell("t", false, "sxy"), armCell("t", false, "syy"))
    def nD(a: String) = col(s"n_$a").cast("double")
    def cd(c: String) = col(c).cast("double")
    def ratio(a: String) = cd(s"sx_$a") /
      when(cd(s"sy_$a") =!= 0.0, cd(s"sy_$a"))
    def yBar(a: String) = cd(s"sy_$a") / nD(a)
    def vx(a: String) = (cd(s"sxx_$a") -
      cd(s"sx_$a") * cd(s"sx_$a") / nD(a)) / (nD(a) - 1.0)
    def vy(a: String) = (cd(s"syy_$a") -
      cd(s"sy_$a") * cd(s"sy_$a") / nD(a)) / (nD(a) - 1.0)
    def cxy(a: String) = (cd(s"sxy_$a") -
      cd(s"sx_$a") * cd(s"sy_$a") / nD(a)) / (nD(a) - 1.0)
    def vR(a: String) = (vx(a) - lit(2.0) * ratio(a) * cxy(a) +
      ratio(a) * ratio(a) * vy(a)) /
      (nD(a) * yBar(a) * yBar(a))
    val se = sqrt(vR("t") + vR("c"))
    val z = (ratio("t") - ratio("c")) / se
    val okArm = (a: String) => col(s"n_$a").isNotNull &&
      col(s"n_$a") >= 2L && cd(s"sy_$a") =!= 0.0
    val ok = okArm("t") && okArm("c")
    wide.select(coalesce(col("n_t"), lit(0L)).as("n_t"),
      coalesce(col("n_c"), lit(0L)).as("n_c"),
      when(col("n_t").isNotNull && cd("sy_t") =!= 0.0,
        graft.core.Num.roundz(ratio("t"), 6)).as("ratio_t"),
      when(col("n_c").isNotNull && cd("sy_c") =!= 0.0,
        graft.core.Num.roundz(ratio("c"), 6)).as("ratio_c"),
      when(ok, graft.core.Num.roundz(ratio("t") - ratio("c"), 6))
        .as("diff"),
      when(ok && se > 0.0, round(se, 6)).as("se"),
      when(ok && se > 0.0, graft.core.Num.roundz(z, 4)).as("z"))
  }

  /**
   * Event-study readout (the dynamic form of [[diffInDiff]] —
   * Sun & Abraham 2021 framing, simple two-group version): per
   * period p, the treated-vs-control gap normalized to a BASE
   * period, att_p = (ȳ_T,p − ȳ_C,p) − (ȳ_T,b − ȳ_C,b). Pre-period
   * att ≈ 0 is the PARALLEL-TRENDS DIAGNOSTIC diffInDiff merely
   * assumes; post-period att traces the effect's dynamics. SE per
   * period pools the four cell variances (period and base,
   * independent samples): √(Σ s²_c/n_c) over the four cells.
   *
   * EXACTNESS: values quantize at `unitScale`; ONE (period, treated)
   * exact-moment aggregate; the base row broadcasts back over the
   * PERIOD frame; means/variances/att are fixed IEEE chains
   * ([[diffInDiff]]'s verbatim, per period); `att` flows through
   * [[graft.core.Num.roundz]] 6dp (the base period lands on exact
   * 0 BY CONSTRUCTION — stated, a parity canary). Periods missing a
   * group report NULL att; SE needs n ≥ 2 in all four cells.
   *
   * Scale shape: one map-side-combined keyed aggregate to the
   * (period × 2) frame + one broadcast of the base row. Output one
   * row per period, ascending: (`period`, `n_t`, `n_c`, `gap`,
   * `att`, `se`).
   *
   * ERROR CONTRACT (changed in r17, noted per ADVICE): a missing base
   * period fails at ACTION time as a wrapped Spark runtime exception
   * (the in-plan `raise_error` convention) — not, as before r17, at
   * construction time as an eager `IllegalArgumentException`. Callers
   * that caught IllegalArgumentException or relied on validation
   * before the job launches must handle the runtime form. The
   * `maxPeriods` gate (guarding a row-grained period column) still
   * fails eagerly at construction.
   */
  def eventStudy(df: DataFrame, treatedCol: String, periodCol: String,
                 valueCol: String, basePeriod: Long,
                 unitScale: Long = 100L,
                 maxPeriods: Long = 100000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxPeriods >= 1, "maxPeriods must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(treatedCol).isNotNull && col(periodCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(treatedCol).cast("boolean").as("tr"),
        col(periodCol).cast("long").as("period"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    // cut the cell frame: the base-row derivation (a broadcast
    // subtree) and the main per-period flow both consume it — uncut,
    // the input is scanned once per consumer, and the old eager
    // `require(baseRow.count() == 1)` existence check added a THIRD
    // full scan before the real plan ran. One scan total now.
    val cells = graft.core.LineageCut.cut(base.groupBy("period", "tr")
      .agg(count(lit(1)).as("n"),
        sum(col("u").cast(dec)).as("s1"),
        sum(col("u").cast(dec) * col("u")).as("s2")))
    // level-frame gate (the maxLevels convention): a raw-timestamp
    // periodCol would make the period frame row-sized — refuse loudly.
    // The cut is already materialized, so this count reads cached
    // cells, not the input.
    val nCells = cells.count()
    require(nCells <= 2L * maxPeriods,
      s"eventStudy: $nCells (period, arm) cells exceed maxPeriods = " +
        s"$maxPeriods — periodCol looks row-grained (a raw timestamp?); " +
        "bucket it to design periods upstream or raise the gate")
    val perPeriod = cells.groupBy("period").agg(
      armCell("tr", true, "n"), armCell("tr", true, "s1"),
      armCell("tr", true, "s2"), armCell("tr", false, "n"),
      armCell("tr", false, "s1"), armCell("tr", false, "s2"))
    // base-period existence is checked IN-PLAN (the postStratifiedMean
    // raise_error convention) instead of the old eager count job: the
    // one-row aggregate below always exists, carries the base cells
    // when present, and raises before any readout row can be emitted
    // when the base period is absent.
    val baseRow = perPeriod.agg(
      sum(when(col("period") === basePeriod, 1L).otherwise(0L))
        .as("__b"),
      min(when(col("period") === basePeriod, col("n_t"))).as("bn_t"),
      min(when(col("period") === basePeriod, col("s1_t"))).as("bs1_t"),
      min(when(col("period") === basePeriod, col("s2_t"))).as("bs2_t"),
      min(when(col("period") === basePeriod, col("n_c"))).as("bn_c"),
      min(when(col("period") === basePeriod, col("s1_c"))).as("bs1_c"),
      min(when(col("period") === basePeriod, col("s2_c"))).as("bs2_c"))
      .filter(when(col("__b") < 1L,
        raise_error(lit(s"eventStudy: base period $basePeriod has no " +
          "rows — the normalization target must exist"))
          .cast("boolean"))
        .otherwise(lit(true)))
      .drop("__b")
    def m(n: String, s1: String) =
      col(s1).cast("double") / col(n).cast("double")
    def v(n: String, s1: String, s2: String) =
      (col(s2).cast("double") - col(s1).cast("double") *
        col(s1).cast("double") / col(n).cast("double")) /
        (col(n).cast("double") - 1.0)
    val gap = m("n_t", "s1_t") - m("n_c", "s1_c")
    val bGap = m("bn_t", "bs1_t") - m("bn_c", "bs1_c")
    val att = gap - bGap
    val se = sqrt(
      v("n_t", "s1_t", "s2_t") / col("n_t").cast("double") +
        v("n_c", "s1_c", "s2_c") / col("n_c").cast("double") +
        v("bn_t", "bs1_t", "bs2_t") / col("bn_t").cast("double") +
        v("bn_c", "bs1_c", "bs2_c") / col("bn_c").cast("double"))
    val uD = lit(unitScale.toDouble)
    val haveGap = col("n_t").isNotNull && col("n_c").isNotNull
    val haveBase = col("bn_t").isNotNull && col("bn_c").isNotNull
    val haveVar = Seq("n_t", "n_c", "bn_t", "bn_c")
      .map(c => col(c) >= 2L).reduce(_ && _)
    perPeriod.crossJoin(broadcast(baseRow)).select(col("period"),
      coalesce(col("n_t"), lit(0L)).as("n_t"),
      coalesce(col("n_c"), lit(0L)).as("n_c"),
      when(haveGap, graft.core.Num.roundz(gap / uD, 6)).as("gap"),
      when(haveGap && haveBase,
        graft.core.Num.roundz(att / uD, 6)).as("att"),
      when(haveGap && haveBase && haveVar, round(se / uD, 6)).as("se"))
      .orderBy("period")
  }

  /**
   * Post-stratified mean (the survey estimator — Holt & Smith 1979;
   * the bias fix when the COLLECTED mix differs from the POPULATION
   * mix): est = Σ_s w_s·ȳ_s with w_s the DESIGNED population shares
   * (carried as exact num/10⁶ rationals, the [[srmCheck]]
   * convention), SE² = Σ_s w_s²·s²_s/n_s. The training-data use is
   * direct: a quality metric sampled non-uniformly across domains
   * re-weighted to the corpus mix.
   *
   * EXACTNESS: values quantize at `unitScale`; per-stratum moments
   * are exact from ONE keyed aggregate; the estimate and SE fold in
   * STRATUM ORDER over the stratum frame (the srmCheck pinned fold);
   * outputs round 6dp. FAIL LOUD (the srmCheck contract): an
   * observed stratum outside the design, OR a designed stratum with
   * NO rows (its ȳ is unestimable — silently renormalizing would
   * hide exactly the coverage gap post-stratification exists to
   * correct). A designed stratum with n = 1 contributes its mean
   * with NULL overall `se` (stated).
   *
   * Scale shape: one map-side-combined stratum aggregate + a k-row
   * pinned fold. Output one row: (`n`, `k`, `est`, `se`).
   */
  def postStratifiedMean(df: DataFrame, strataCol: String,
                         valueCol: String,
                         popShares: Map[String, Double],
                         unitScale: Long = 100L): DataFrame = {
    require(popShares.size >= 1, "need >= 1 designed stratum")
    require(popShares.values.forall(s => s > 0.0 && s <= 1.0),
      "every designed share must be in (0,1]")
    val tot = popShares.values.sum
    require(math.abs(tot - 1.0) < 1e-9,
      s"designed shares must sum to 1: $tot")
    require(unitScale >= 1, "unitScale must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val shares = popShares.toSeq.sorted
      .map { case (g, s) => (g, math.round(s * 1000000L)) }
      .toDF("__g", "__num")
    val obs = df
      .filter(col(strataCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col(valueCol) * unitScale).cast("long").cast(dec))
          .as("__s1"),
        sum(round(col(valueCol) * unitScale).cast("long").cast(dec) *
          round(col(valueCol) * unitScale).cast("long")).as("__s2"))
    val joined = shares.join(obs, Seq("__g"), "full_outer")
      .filter(when(col("__num").isNull,
        raise_error(concat(lit("postStratifiedMean: observed stratum '"),
          col("__g"), lit("' is not in the designed shares")))
          .cast("boolean"))
        .otherwise(lit(true)))
      .filter(when(col("__n").isNull,
        raise_error(concat(lit("postStratifiedMean: designed stratum '"),
          col("__g"), lit("' has NO rows — its mean is unestimable; " +
            "fix coverage or redesign the shares"))).cast("boolean"))
        .otherwise(lit(true)))
    val w = col("__num").cast("double") / lit(1000000.0)
    val mS = col("__s1").cast("double") / col("__n").cast("double")
    val vS = (col("__s2").cast("double") - col("__s1").cast("double") *
      col("__s1").cast("double") / col("__n").cast("double")) /
      when(col("__n") > 1L, col("__n").cast("double") - 1.0)
    val ord = Window.orderBy("__g")
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tot2 = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val uD = lit(unitScale.toDouble)
    val folded = joined
      .withColumn("__est", sum(w * mS).over(cum))
      .withColumn("__var", sum(w * w * vS /
        col("__n").cast("double")).over(cum))
      .withColumn("__nall", sum("__n").over(tot2))
      .withColumn("__k", count(lit(1)).over(tot2))
      .withColumn("__minn", min("__n").over(tot2))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === col("__k"))
    folded.select(col("__nall").as("n"), col("__k").as("k"),
      graft.core.Num.roundz(col("__est") / uD, 6).as("est"),
      when(col("__minn") >= 2L, round(sqrt(col("__var")) / uD, 6))
        .as("se"))
  }

  /**
   * Paired t-test (one row per unit carrying BOTH measurements —
   * pre/post, variant-A/variant-B on the same unit): the within-unit
   * difference d cancels all between-unit variance, so when pairing
   * is available this beats [[welchTTest]] by exactly the
   * unit-variance share — the cheap cousin of [[cupedAdjust]] for
   * the perfect-covariate case. t = d̄/(s_d/√n), df = n − 1.
   *
   * EXACTNESS: both measurements quantize at `unitScale`; each d is
   * an exact long SINGLE subtraction; n/Σd/Σd² are exact from ONE
   * aggregate; t/df are fixed IEEE chains. `mean_diff` flows through
   * [[graft.core.Num.roundz]] 6dp (a null effect lands on zero from
   * below half the time), t 4dp likewise; n < 2 or zero diff
   * variance reports NULL t (stated).
   *
   * Scale shape: one map-side-combined aggregate to ONE row.
   * Output one row: (`n`, `mean_diff`, `t_stat`, `df`).
   */
  def pairedTTest(df: DataFrame, preCol: String, postCol: String,
                  unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(preCol).isNotNull && col(postCol).isNotNull)
      .select((round(col(postCol) * unitScale).cast("long") -
        round(col(preCol) * unitScale).cast("long")).as("d"))
    val agg = base.agg(count(lit(1)).as("n"),
      sum(col("d").cast(dec)).as("s1"),
      sum(col("d").cast(dec) * col("d")).as("s2"))
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    val vD = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / nD) /
      when(nD > 1.0, nD - 1.0)
    val t = mean / sqrt(vD / nD)
    val uD = lit(unitScale.toDouble)
    agg.select(col("n"),
      when(col("n") >= 1L, graft.core.Num.roundz(mean / uD, 6))
        .as("mean_diff"),
      when(col("n") >= 2L && vD > 0.0, graft.core.Num.roundz(t, 4))
        .as("t_stat"),
      when(col("n") >= 2L && vD > 0.0, (col("n") - 1L)).as("df"))
  }

  /**
   * Two-proportion z-test with the pooled SE (the textbook conversion
   * A/B readout): z = (p̂_T − p̂_C)/√(p̂(1−p̂)(1/n_T + 1/n_C)) with p̂
   * the pooled rate — the statistic behind every "did conversion
   * move" dashboard, run next to [[srmCheck]] (the guardrail) and the
   * per-arm [[wilsonInterval]]-style CIs. Statistic-only.
   *
   * EXACTNESS: arm counts/positives are exact longs from ONE
   * aggregate; rates and z are fixed IEEE chains; rates round 6dp, z
   * 4dp through [[graft.core.Num.roundz]]. A missing arm, n < 1, or
   * a degenerate pooled rate (0 or 1 — zero variance) reports NULL z
   * (stated).
   *
   * Scale shape: one map-side-combined aggregate to ONE row.
   * Output one row: (`n_t`, `n_c`, `p_t`, `p_c`, `diff`, `z`).
   */
  def twoProportionZ(df: DataFrame, groupCol: String, treatment: String,
                     labelCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(labelCol).isNotNull)
      .select((col(groupCol).cast("string") === treatment).as("t"),
        col(labelCol).cast("boolean").as("y"))
    val agg = base.agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("n_t"),
      sum(when(col("t") && col("y"), 1L).otherwise(0L)).as("x_t"),
      sum(when(!col("t"), 1L).otherwise(0L)).as("n_c"),
      sum(when(!col("t") && col("y"), 1L).otherwise(0L)).as("x_c"))
    def r(x: String, n: String) =
      col(x).cast("double") / col(n).cast("double")
    val pPool = (col("x_t") + col("x_c")).cast("double") /
      (col("n_t") + col("n_c")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_t").cast("double") +
        lit(1.0) / col("n_c").cast("double")))
    val z = (r("x_t", "n_t") - r("x_c", "n_c")) / se
    val ok = col("n_t") >= 1L && col("n_c") >= 1L
    agg.select(coalesce(col("n_t"), lit(0L)).as("n_t"),
      coalesce(col("n_c"), lit(0L)).as("n_c"),
      when(col("n_t") >= 1L, round(r("x_t", "n_t"), 6)).as("p_t"),
      when(col("n_c") >= 1L, round(r("x_c", "n_c"), 6)).as("p_c"),
      when(ok, graft.core.Num.roundz(
        r("x_t", "n_t") - r("x_c", "n_c"), 6)).as("diff"),
      when(ok && pPool > 0.0 && pPool < 1.0,
        graft.core.Num.roundz(z, 4)).as("z"))
  }

  /**
   * Murphy decomposition of the Brier score (Murphy 1973):
   * reliability − resolution + uncertainty over the QUANTIZED
   * forecast levels — the diagnostic [[brierScore]] rolls up
   * ([[calibrationReport]] shows WHERE calibration fails; this says
   * how much of the score is miscalibration vs lack of
   * discrimination vs irreducible base-rate noise). REL =
   * Σ t_ℓ(p̄_ℓ − ō_ℓ)²/n, RES = Σ t_ℓ(ō_ℓ − ō)²/n, UNC = ō(1 − ō);
   * on forecast-VALUE levels (not coarse bins) the identity
   * brier = REL − RES + UNC is EXACT for the quantized forecasts.
   *
   * EXACTNESS: forecasts quantize at `unitScale` (out-of-range fails
   * loud, the [[brierScore]] guard); level/positive counts are exact
   * longs; each level term is a fixed IEEE chain on exact-int
   * doubles; REL and RES accumulate as ORDERED window folds in level
   * order (the kaplanMeier convention); UNC is one chain from the
   * global exact counts; everything rounds 6dp through
   * [[graft.core.Num.roundz]].
   *
   * Scale shape: ONE (level) aggregate — the level frame is bounded
   * by unitScale + 1 by construction — then single-task ordered folds
   * over it. Output one row: (`n`, `brier`, `reliability`,
   * `resolution`, `uncertainty`).
   */
  def brierDecomposition(df: DataFrame, probCol: String,
                         labelCol: String,
                         unitScale: Long = 1000L): DataFrame = {
    require(unitScale >= 1 && unitScale <= 100000000L,
      s"unitScale in [1, 1e8]: $unitScale")
    val base = df
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("pos"),
        round(col(probCol) * unitScale).cast("long").as("up"))
      .filter(when(col("up") < 0L || col("up") > unitScale,
        raise_error(lit("brierDecomposition: probability outside " +
          "[0, 1]")).cast("boolean")).otherwise(lit(true)))
    val levels = base.groupBy("up").agg(count(lit(1)).as("t"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("s"))
    val ord = Window.orderBy("up")
    val cumW = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val totW = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val uD = lit(unitScale.toDouble)
    val nD = col("__n").cast("double")
    val oBar = col("__s").cast("double") / nD
    val pBar = col("up").cast("double") / uD
    val oLvl = col("s").cast("double") / col("t").cast("double")
    val relTerm = col("t").cast("double") *
      ((pBar - oLvl) * (pBar - oLvl)) / nD
    val resTerm = col("t").cast("double") *
      ((oLvl - oBar) * (oLvl - oBar)) / nD
    val folded = levels
      .withColumn("__n", sum("t").over(totW))
      .withColumn("__s", sum("s").over(totW))
      .withColumn("__rel", sum(relTerm).over(cumW))
      .withColumn("__res", sum(resTerm).over(cumW))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__nl", count(lit(1)).over(totW))
      .filter(col("__rn") === col("__nl"))
    val unc = oBar * (lit(1.0) - oBar)
    folded.select(col("__n").as("n"),
      graft.core.Num.roundz(col("__rel") - col("__res") + unc, 6)
        .as("brier"),
      graft.core.Num.roundz(col("__rel"), 6).as("reliability"),
      graft.core.Num.roundz(col("__res"), 6).as("resolution"),
      graft.core.Num.roundz(unc, 6).as("uncertainty"))
  }

  /**
   * Gini split profile of a numeric feature against a binary label
   * (the CART decision-stump criterion — Breiman, Friedman, Olshen &
   * Stone 1984): for EVERY candidate threshold t (each distinct
   * quantized feature value with rows on both sides), the weighted
   * Gini impurity of the split `feature ≤ t`. The feature-screening
   * primitive for quality-classifier pipelines: a feature whose best
   * split barely beats the root impurity carries no signal, and the
   * full curve shows WHERE the signal lives — no argmin is baked in,
   * so no cross-engine double-ordering knife-edge exists either.
   *
   * EXACTNESS: on (value) level counts with per-level cumulative
   * positives/negatives (pL, qL of nL = pL + qL; right side by
   * subtraction), weighted Gini =
   * ((nL² − pL² − qL²)·nR + (nR² − pR² − qR²)·nL) / (n·nL·nR) —
   * numerator and denominator EXACT in DECIMAL(38,0) (n³-scale terms;
   * n is guarded at 10¹⁰ for the 38-digit bound), ONE IEEE division
   * per row, zero rounding.
   *
   * Scale shape: identical to [[ksTest]] — one map-side-combined level
   * aggregate, one value-ordered window over LEVELS for the
   * cumulatives and totals, map-only arithmetic after. The window is
   * global over levels (single feature, no segment): quantized-level
   * cardinality bounds it; coarsen `unitScale` past ~10⁸ levels.
   *
   * Returns one row per interior threshold, ascending `threshold`
   * (quantized units): (`threshold`, `n_l`, `n_r`, `gini`).
   */
  def giniSplitProfile(df: DataFrame, featureCol: String, labelCol: String,
                       unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .select(round(col(featureCol) * unitScale).cast("long").as("u"),
        col(labelCol).cast("boolean").as("y"))
    val levels = base.groupBy("u")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("p"),
        sum(when(col("y"), 0L).otherwise(1L)).as("q"))
    val ord = Window.orderBy("u")
    val cumW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val d = "decimal(38,0)"
    def sq(c: Column): Column = c.cast(d) * c
    val cum = levels
      .withColumn("pl", sum("p").over(cumW))
      .withColumn("ql", sum("q").over(cumW))
      .withColumn("pt", sum("p").over(totW))
      .withColumn("qt", sum("q").over(totW))
      .filter(when(col("pt") + col("qt") > 10000000000L,
        raise_error(lit("giniSplitProfile: n exceeds the exact " +
          "decimal(38,0) n³ bound")).cast("boolean")).otherwise(lit(true)))
      .withColumn("nl", col("pl") + col("ql"))
      .withColumn("nr", col("pt") + col("qt") - col("nl"))
      .filter(col("nr") > 0) // the last level splits nothing off
    val pr = col("pt") - col("pl")
    val qr = col("qt") - col("ql")
    val num = (sq(col("nl")) - sq(col("pl")) - sq(col("ql"))) * col("nr") +
      (sq(col("nr")) - sq(pr) - sq(qr)) * col("nl")
    val den = (col("pt") + col("qt")).cast(d) * col("nl") * col("nr")
    cum.select(col("u").as("threshold"), col("nl").as("n_l"),
        col("nr").as("n_r"),
        (num.cast("double") / den.cast("double")).as("gini"))
      .orderBy("threshold")
  }

  /**
   * Grouped feature standardization (z-scoring against each group's
   * own moments) — the ML-prep normalizer: a $9.99 book and a $900
   * flight are both "typical" only relative to their own category, so
   * features standardize per group before any cross-group model sees
   * them. Groups too small (n < 2) or degenerate (zero variance)
   * yield NULL scores by guard — stated, not an engine 0/0 artifact.
   *
   * DETERMINISM (same contract as [[welchTTest]]): values quantize at
   * `unitScale`; Σx is an exact long, Σx² accumulates DECIMAL(38,0)
   * and converts to double once; every downstream step — mean,
   * variance, σ, and each row's z — is a chain of single IEEE ops on
   * identical inputs, so the UNROUNDED z is bit-deterministic
   * cross-engine under any partitioning.
   *
   * Scale shape: one group-keyed moments aggregate (map-side combined,
   * two longs + a decimal per partial) + one group-keyed join back to
   * the rows — group cardinality is tiny next to row count, so the
   * join side broadcasts (or AQE plans it); no window, no sort.
   *
   * Returns every input row: (`grp`, `id`, `value`, `z`) — `grp`, not
   * `group`: the natural name is a SQL keyword and an output column
   * that needs quoting in every downstream query is a trap.
   */
  def standardize(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("value"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val mom = base.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("u").as("s1"),
        sum((col("u") * col("u")).cast("decimal(38,0)"))
          .cast("double").as("s2"))
    val nD = col("n").cast("double")
    val variance =
      ((col("s2") - col("s1").cast("double") * col("s1").cast("double") / nD)
        / (nD - 1d)) / (unitScale * unitScale).toDouble
    val stats = mom.select(col("grp"), col("n"),
      (col("s1").cast("double") / (col("n") * unitScale).cast("double"))
        .as("__mu"),
      when(col("n") >= 2, variance).as("__var"))
    base.join(stats, "grp")
      .select(col("grp"), col("id"), col("value"),
        when(col("__var") > 0,
          (col("u").cast("double") / unitScale.toDouble - col("__mu")) /
            sqrt(col("__var"))).as("z"))
  }

  /**
   * Categorical KL / Jensen–Shannon divergence between two samples of
   * a discrete column — [[populationStability]]'s companion for
   * distributions with NO numeric order to bucket (tokens, domains,
   * languages, event types): which corpus slice drifted, and by how
   * much? The canonical LLM-data use is comparing token distributions
   * between a reference corpus and a new crawl before mixing.
   *
   * Shares use the SAME deterministic add-half smoothing as PSI —
   * `p = (c + 0.5)/(T + 0.5·V)` with `V` the union vocabulary — so a
   * key absent on one side contributes finitely. Emits the top `k`
   * keys by |p − q| with per-key contributions (PSI's actionable-rows
   * convention: callers sum `kl_contrib`/`js_contrib` over the FULL
   * frame for the scalar; the top-k view answers "which keys moved").
   * `kl_contrib = p·ln(p/q)`; `js_contrib = (p·ln(2p/(p+q)) +
   * q·ln(2q/(p+q)))/2` (JS base e, bounded by ln 2). Shares and
   * contributions round at 6dp; the RANKING never touches a double —
   * |p − q| orders by the cross-multiplied EXACT integer
   * `|(2c_r+1)(2T_c+V) − (2c_c+1)(2T_r+V)|` in DECIMAL(38,0)
   * (sound to counts ~10¹² against totals ~10¹⁵; both engines compare
   * the same integers, so the top-k frontier cannot drift on a ULP).
   *
   * Scale shape: one map-side-combined count per key per side —
   * exchanges carry each side's key cardinality, not its rows — a
   * key-keyed full outer join of the two count frames (lineage-cut,
   * so the totals pass and the output pass share it), ONE 1-row
   * totals aggregate collected to plan literals, and a TakeOrdered
   * top-k. No window, no data-sized sort.
   */
  def categoricalDivergence(ref: DataFrame, cur: DataFrame,
                            keyCol: String, k: Int = 100): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(keyCol).isNotNull)
        .select(col(keyCol).cast("string").as("key"))
        .groupBy("key").agg(count(lit(1)).as(out))
    val joined = counts(ref, "__cr")
      .join(counts(cur, "__cc"), Seq("key"), "full_outer")
      .select(col("key"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
      .lineageCut()
    val t = joined.agg(count(lit(1)), sum("__cr"), sum("__cc")).head()
    val (v, tr, tc) = (t.getLong(0), t.getLong(1), t.getLong(2))
    require(tr > 0 && tc > 0,
      s"categoricalDivergence needs non-null keys on both sides " +
        s"(ref $tr, cur $tc)")
    val p = (col("__cr").cast("double") + 0.5d) / lit(tr + 0.5 * v)
    val q = (col("__cc").cast("double") + 0.5d) / lit(tc + 0.5 * v)
    val dec = "decimal(19,0)"
    val dord = abs(
      (col("__cr") * 2 + 1).cast(dec) * lit(2 * tc + v).cast(dec) -
        (col("__cc") * 2 + 1).cast(dec) * lit(2 * tr + v).cast(dec))
    joined
      .withColumn("__ord", dord)
      .orderBy(col("__ord").desc, col("key").asc)
      .limit(k)
      .select(col("key"), col("__cr").as("ref_count"),
        col("__cc").as("cur_count"),
        round(p, 6).as("ref_share"), round(q, 6).as("cur_share"),
        // + 0.0: canonicalize a −0.0 rounded from a tiny negative
        (round(p * log(p / q), 6) + lit(0.0)).as("kl_contrib"),
        (round((p * log(lit(2d) * p / (p + q)) +
          q * log(lit(2d) * q / (p + q))) / 2d, 6) + lit(0.0))
          .as("js_contrib"))
  }

  /**
   * Population covariance matrix of an embedding column's leading
   * `dims` components in ONE distributed pass — the input every
   * vector-space diagnostic and transform starts from (PCA /
   * whitening before [[graft.operators.Similarity]]'s k-means or
   * SemDeDup cells, anisotropy checks on encoder output, feature
   * de-correlation). An embedding column whose covariance is far from
   * isotropic is the standard explanation for LSH/IVF recall cliffs —
   * this is the operator that shows it.
   *
   * Scale shape: the classic Gram-accumulation reduction —
   * `mapPartitions`-style `treeAggregate` where every partition folds
   * its rows into ONE `(n, Σx[d], Σxᵢxⱼ[d(d+1)/2])` summary (a few KB
   * for d ≤ 128), partials tree-combine, and ONLY summaries move.
   * Nothing data-sized shuffles, nothing collects but the d×d state;
   * this is one of the rare per-partition-imperative shapes where the
   * RDD layer beats any DataFrame formulation (a posexplode² pairing
   * would shuffle d²·N rows).
   *
   * DETERMINISM: components widen float→double exactly; each xᵢ·xⱼ
   * product is EXACT (24-bit mantissas fit 53); Σx sums of same-scale
   * floats stay exact far past 10⁹ rows; only the product sums round,
   * and the 6dp output grid absorbs their summation-order ULP drift.
   *
   * Returns the upper triangle (i ≤ j): (`i`, `j`, `n`, `cov`) with
   * `cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n` (population form), ordered (i, j).
   * Rows missing the column or shorter than `dims` are excluded and
   * counted against nothing — stated, not silent (callers compare `n`
   * to their row count; a mixed-dim corpus should be split upstream).
   */
  def vectorCovariance(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 512, s"dims must be in [1, 512]; got $dims")
    val spark = df.sparkSession
    val nPairs = dims * (dims + 1) / 2
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) >= dims)
      .rdd.map(_.getSeq[Double](0))
    val d = dims
    val zero = (0L, new Array[Double](d), new Array[Double](nPairs))
    val (n, s, pr) = vecs.treeAggregate(zero)(
      seqOp = { case ((cnt, sums, prods), row) =>
        var i = 0
        var k = 0
        while (i < d) {
          val xi = row(i)
          sums(i) += xi
          var j = i
          while (j < d) { prods(k) += xi * row(j); j += 1; k += 1 }
          i += 1
        }
        (cnt + 1, sums, prods)
      },
      combOp = { case ((n1, s1, p1), (n2, s2, p2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        var k = 0
        while (k < nPairs) { p1(k) += p2(k); k += 1 }
        (n1 + n2, s1, p1)
      }, depth = 2)
    require(n > 0, s"vectorCovariance: no rows with $dims+ components")
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield {
      val k = i * d - i * (i - 1) / 2 + (j - i)
      (i, j, n, (pr(k) - s(i) * s(j) / n) / n)
    }
    import spark.implicits._
    // + 0.0 canonicalizes a rounded −0.0 to 0.0 (engines disagree on
    // the sign of a zero rounded from a tiny negative; the hash doesn't)
    rows.toDF("i", "j", "n", "__cov")
      .select(col("i"), col("j"), col("n"),
        (round(col("__cov"), 6) + lit(0.0)).as("cov"))
  }

  /**
   * Exact equi-width histogram of a numeric column: `nBuckets` equal
   * intervals over `[lo, hi]` (derived from the frame's min/max in one
   * aggregate when not given), values clamped into the edge buckets so
   * hi itself — and out-of-range values under caller-supplied bounds —
   * land in a bucket instead of vanishing. The distribution half of the
   * [[profile]] gate (a null-rate spike shows up there; a SHAPE shift —
   * token-length collapse, price-scale drift — shows up here).
   *
   * One scan + one groupBy on the bucket index; only non-empty buckets
   * return (at 100 TB a fixed-width bucket list is trivially dense
   * anyway, and emitting empties would need a generate_series join).
   * The bucket arithmetic (`floor((v - lo) / width)`, clamped) runs in
   * doubles and is engine-portable — no sketch, no rank.
   *
   * Returns (`bucket`, `lo`, `hi`, `n`) ordered by bucket index, where
   * lo/hi are the bucket's own bounds.
   */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int,
                bounds: Option[(Double, Double)] = None): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val (lo, hi) = bounds.getOrElse {
      val r = df.agg(min(col(valueCol).cast("double")),
        max(col(valueCol).cast("double"))).head()
      require(!r.isNullAt(0), s"histogram over all-null '$valueCol'")
      (r.getDouble(0), r.getDouble(1))
    }
    require(hi > lo, s"histogram needs hi > lo; got [$lo, $hi]")
    val width = (hi - lo) / nBuckets
    val v = col(valueCol).cast("double")
    val idx = least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("long")
    df.filter(v.isNotNull)
      .select(idx.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("lo"),
        (lit(lo) + (col("bucket") + 1) * lit(width)).as("hi"),
        col("n"))
  }

  /**
   * ROC AUC of a numeric score against a binary label (Hanley &
   * McNeil 1982's rank formulation) — the threshold-FREE companion to
   * [[giniSplitProfile]]: where the split profile asks "how well does
   * the best single threshold separate", AUC integrates separation
   * over EVERY threshold (it equals the probability a random positive
   * outscores a random negative, ties counting half — exactly the
   * Mann-Whitney U normalized by n_pos·n_neg).
   *
   * EXACTNESS: scores quantize at `unitScale`; on score LEVELS the
   * doubled mid-rank sum of positives r2p is an exact integer
   * (DECIMAL(38,0)), so AUC = (r2p − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
   * has an exact integer numerator and denominator and ONE IEEE
   * division — no per-row double ever sums. `gini_coef` = 2·AUC − 1 is
   * a fixed two-op chain on that quotient, rounded 6dp. n is guarded
   * at 1.5×10⁹ so every long product stays in range.
   *
   * Scale shape: identical to [[giniSplitProfile]] — one
   * map-side-combined level aggregate, ONE value-ordered window over
   * LEVELS (quantized-score cardinality bounds it; coarsen `unitScale`
   * past ~10⁸ levels), one scalar aggregate.
   *
   * Returns one row: (`n_pos`, `n_neg`, `auc`, `gini_coef`) — empty
   * when either class is absent (AUC is undefined).
   */
  def aucReport(df: DataFrame, scoreCol: String, labelCol: String,
                unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("pos"),
        round(col(scoreCol) * unitScale).cast("long").as("u"))
    val levels = base.groupBy("u")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        count(lit(1)).as("cv"))
    val w = Window.orderBy("u").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = levels
      .withColumn("cum", coalesce(sum("cv").over(w), lit(0L)))
    val agg = ranked.agg(
        sum("cp").as("n_pos"), sum(col("cv") - col("cp")).as("n_neg"),
        sum((col("cp") * (lit(2L) * col("cum") + col("cv") + 1L))
          .cast("decimal(38,0)")).as("r2p"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .filter(when(col("n_pos") + col("n_neg") > 1500000000L,
        raise_error(lit("aucReport: frame exceeds the exact rank-sum " +
          "long range")).cast("boolean")).otherwise(lit(true)))
    val auc = (col("r2p") -
        (col("n_pos") * (col("n_pos") + 1L)).cast("decimal(38,0)"))
      .cast("double") /
      (lit(2L) * col("n_pos") * col("n_neg")).cast("double")
    agg.select(col("n_pos"), col("n_neg"), auc.as("auc"),
      round(lit(2d) * auc - 1d, 6).as("gini_coef"))
  }

  /**
   * Kruskal-Wallis H test per segment (Kruskal & Wallis 1952) — the
   * k-sample extension of [[mannWhitneyU]]: "did ANY of the k groups'
   * value distributions shift", rank-based so heavy tails don't
   * dominate the way they do [[welchTTest]]'s variance.
   *
   * EXACTNESS: per-group doubled rank sums r2_g and the tie sum
   * Σ(t³−t) are exact integers (DECIMAL(38,0)) built from (segment,
   * value, group) LEVEL counts — the cubic widens to decimal BEFORE
   * multiplying so no long ever wraps. The cross-group reduction
   * Σ r2_g²/(4·n_g) is the one place doubles must sum across rows;
   * it runs as a RUNNING window sum in group-name order — a
   * sequential left fold both engines evaluate streaming over the
   * default frame, so the fold order (and hence every ulp) is pinned
   * cross-engine. H and the tie correction C = 1 − Σ(t³−t)/(n³−n)
   * are fixed chains on those values; `h` rounds 4dp and is NULL when
   * C = 0 (every value tied). n per segment is guarded at 1.5×10⁹.
   *
   * Scale shape: one map-side-combined (segment, value, group) level
   * aggregate, one segment-partitioned value-ordered window over
   * LEVELS (RANGE frames give below-level and at-level counts in the
   * same sort), one (segment, group) aggregate, then windows over the
   * ≤ k rows per segment. The per-segment sequential bound is
   * quantized-level × group cardinality; coarsen `unitScale` past
   * ~10⁸ levels.
   *
   * Returns one row per segment with ≥ 2 groups:
   * (`segment`, `k`, `n`, `h`).
   */
  def kruskalWallis(df: DataFrame, segmentCol: String, groupCol: String,
                    valueCol: String, unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        col(groupCol).cast("string").as("g"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val lvl = base.groupBy("segment", "u", "g")
      .agg(count(lit(1)).as("cnt"))
    val byU = Window.partitionBy("segment").orderBy(col("u"))
    val marked = lvl
      .withColumn("cum", coalesce(sum("cnt")
        .over(byU.rangeBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cv", sum("cnt").over(byU.rangeBetween(0, 0)))
    val grp = marked.groupBy("segment", "g").agg(
      sum("cnt").as("n_g"),
      sum((col("cnt") * (lit(2L) * col("cum") + col("cv") + 1L))
        .cast("decimal(38,0)")).as("r2"),
      sum(col("cnt").cast("decimal(38,0)") *
        ((col("cv") - 1L) * (col("cv") + 1L))).as("tpart"))
    val segW = Window.partitionBy("segment")
    val byG = Window.partitionBy("segment").orderBy("g")
    val term = col("r2").cast("double") * col("r2").cast("double") /
      (lit(4d) * col("n_g").cast("double"))
    val withTot = grp
      .withColumn("k", count(lit(1)).over(segW))
      .withColumn("n", sum("n_g").over(segW))
      .withColumn("tsum", sum("tpart").over(segW))
      .withColumn("rn", row_number().over(byG))
      .withColumn("a_run", sum(term)
        .over(byG.rowsBetween(Window.unboundedPreceding, 0)))
    val seg = withTot.filter(col("rn") === col("k") && col("k") >= 2)
      .filter(when(col("n") > 1500000000L,
        raise_error(lit("kruskalWallis: segment exceeds the exact " +
          "rank-sum long range")).cast("boolean")).otherwise(lit(true)))
    val nD = col("n").cast("double")
    val hRaw = lit(12d) / (nD * (nD + 1d)) * col("a_run") -
      lit(3d) * (nD + 1d)
    val c = lit(1d) - col("tsum").cast("double") / (nD * nD * nD - nD)
    seg.select(col("segment"), col("k"), col("n"),
      when(c > 0d, round(hRaw / c, 4)).as("h"))
  }

  /**
   * One-way ANOVA F per segment (Fisher 1925) — the parametric
   * k-sample companion to [[kruskalWallis]]: "did any group's MEAN
   * move", with `eta2` = SSB/SST reporting the variance share the
   * grouping explains (the effect size the F statistic alone hides).
   *
   * EXACTNESS: per-group moments (n_g, Σu, Σu²) are exact integers on
   * the quantized values (squares widen through DECIMAL(38,0)); the
   * quantization scale cancels in both F and η² (each is a ratio of
   * same-unit sums of squares), so no unscaling division exists to
   * round. The cross-group Σ(Σu)²/n_g reduction runs as the same
   * group-name-ordered running window fold as [[kruskalWallis]] —
   * fold order pinned cross-engine. F rounds 4dp (NULL when SSW = 0
   * or n ≤ k), η² rounds 6dp (NULL when SST = 0).
   *
   * Scale shape: ONE map-side-combined (segment, group) moment
   * aggregate over the raw rows — no level frame, no value sort —
   * then windows over the ≤ k rows per segment. Nothing about this
   * operator depends on value cardinality at all.
   *
   * Returns one row per segment with ≥ 2 groups:
   * (`segment`, `k`, `n`, `f_stat`, `eta2`).
   */
  def anovaF(df: DataFrame, segmentCol: String, groupCol: String,
             valueCol: String, unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(segmentCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).cast("string").as("segment"),
        col(groupCol).cast("string").as("g"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    val mom = base.groupBy("segment", "g").agg(
      count(lit(1)).as("n_g"), sum("u").as("s1"),
      sum((col("u") * col("u")).cast("decimal(38,0)")).as("s2"))
    val segW = Window.partitionBy("segment")
    val byG = Window.partitionBy("segment").orderBy("g")
    val term = col("s1").cast("double") * col("s1").cast("double") /
      col("n_g").cast("double")
    val withTot = mom
      .withColumn("k", count(lit(1)).over(segW))
      .withColumn("n", sum("n_g").over(segW))
      .withColumn("s", sum("s1").over(segW))
      .withColumn("ss", sum("s2").over(segW))
      .withColumn("rn", row_number().over(byG))
      .withColumn("a_run", sum(term)
        .over(byG.rowsBetween(Window.unboundedPreceding, 0)))
    val seg = withTot.filter(col("rn") === col("k") && col("k") >= 2)
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val grand = col("s").cast("double") * col("s").cast("double") / nD
    val ssb = col("a_run") - grand
    val sst = col("ss").cast("double") - grand
    val ssw = col("ss").cast("double") - col("a_run")
    seg.select(col("segment"), col("k"), col("n"),
      when(col("n") > col("k") && ssw > 0d,
        round((ssb / (kD - 1d)) / (ssw / (nD - kD)), 4)).as("f_stat"),
      when(sst > 0d, round(ssb / sst, 6)).as("eta2"))
  }

  /**
   * Calibration (reliability) report of a probability score against a
   * binary label: `nBins` equal-width probability bins, and per bin
   * the count, mean predicted probability, empirical positive rate,
   * and their gap — the table behind every reliability diagram and
   * the per-bin terms of expected calibration error (ECE =
   * Σ n_b/n · |gap_b|, one weighted fold away for the caller). The
   * quality-classifier audit a filtering pipeline runs before
   * trusting scores as sampling weights.
   *
   * EXACTNESS: probabilities quantize at `unitScale` (default 10⁶ —
   * six decimal places); the bin index is PURE integer arithmetic
   * (`min(u·nBins div unitScale, nBins−1)` — no double floor, no
   * engine-specific edge at bin boundaries), per-bin sums are exact
   * longs, and `mean_pred`/`frac_pos` are each ONE IEEE division with
   * `gap` their fixed-chain difference rounded 6dp.
   *
   * Scale shape: one map-side-combined aggregate to ≤ nBins rows.
   * Nothing else moves.
   *
   * Returns one row per non-empty bin, ascending `bin`:
   * (`bin`, `n`, `n_pos`, `mean_pred`, `frac_pos`, `gap`).
   */
  def calibrationReport(df: DataFrame, probCol: String, labelCol: String,
                        nBins: Int = 10,
                        unitScale: Long = 1000000L): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    require(unitScale >= nBins, "unitScale must be >= nBins")
    val base = df
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("pos"),
        round(col(probCol) * unitScale).cast("long").as("up"))
      .filter(when(col("up") < 0L || col("up") > unitScale,
        raise_error(lit("calibrationReport: probability outside [0, 1]"))
          .cast("boolean")).otherwise(lit(true)))
    // exact integer division via the exact-multiple idiom (see
    // Events.paretoReport): t − t%unitScale is a unitScale-multiple and
    // both operands are exactly double-representable (t ≤ nBins·unitScale)
    val t = col("up") * lit(nBins.toLong)
    val bin = least(((t - pmod(t, lit(unitScale))) / lit(unitScale))
      .cast("long"), lit((nBins - 1).toLong))
    base.select(bin.as("bin"), col("pos"), col("up"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum("up").as("sup"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("sup").cast("double") /
          (col("n") * unitScale).cast("double")).as("mean_pred"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("frac_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double") -
          col("sup").cast("double") /
            (col("n") * unitScale).cast("double"), 6).as("gap"))
  }

  /**
   * Kendall rank correlation τ-b with exact tie handling (Kendall
   * 1938; the τ-b tie normalization of Kendall 1945) — the
   * concordance-probability companion to [[spearmanCorrelation]]:
   * where Spearman correlates RANKS linearly, τ counts how often two
   * random rows agree in order on both variables, which gives it a
   * direct probabilistic reading (τ = P(concordant) − P(discordant))
   * and more robustness to a few extreme ranks.
   *
   * EXACTNESS: concordant/discordant pair counts are exact integers —
   * Σ over strictly-x-ordered CELL pairs of n_i·n_j accumulated in
   * DECIMAL(38,0) — and tie pair counts Σt(t−1)/2 come from exact
   * per-level counts (products widen to decimal before the sum). τ-b
   * = (C − D)/√((N0 − T_x)(N0 − T_y)) converts each exact factor to
   * double once, rounds 6dp. n is guarded at 3×10⁹ (N0 long range).
   *
   * Scale shape: quantized values fold to (x, y) CELLS first (one
   * map-side-combined aggregate, lineage-cut so the pair join's two
   * sides and the two tie aggregates share ONE materialization instead
   * of four base scans), then cell pairs enumerate via a
   * strict-inequality self-join — **O(C²) in cell count C**, planned
   * as a broadcast nested-loop when one side is small. This is the
   * operator's scale bound, ENFORCED fail-loud: a cell-count gate
   * (`maxCells`, default 10⁵ ≈ 10¹⁰ cell pairs of pure long
   * arithmetic) runs over the cut cell frame before the pair join and
   * aborts with the escape hatch in the message — coarsen
   * `unitScale`, raise `maxCells` deliberately, or use
   * [[spearmanCorrelation]], whose chunked rank path has no quadratic
   * term. Row count n is unbounded — only distinct quantized cells
   * pair up.
   *
   * Returns one row: (`n`, `n_conc`, `n_disc`, `tau_b` — NULL when
   * either variable is constant).
   */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 unitScale: Long = 100L,
                 maxCells: Long = 100000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxCells >= 1, "maxCells must be >= 1")
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(round(col(xCol) * unitScale).cast("long").as("ux"),
        round(col(yCol) * unitScale).cast("long").as("uy"))
    // cut: the cell frame feeds THREE consumers (both pair-join sides
    // and the two tie aggregates) — uncut, each re-runs the full base
    // scan + aggregate (plan-audited: 4 scans)
    val cells = graft.core.LineageCut.cut(
      base.groupBy("ux", "uy").agg(count(lit(1)).as("cnt")))
    // FAIL-LOUD scale guard on the documented O(C²) bound: the count
    // runs over the already-cut cell frame (no base rescan) and fires
    // BEFORE the quadratic pair join is ever planned into a job.
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"kendallTau: $nCells distinct quantized (x, y) cells exceeds " +
        s"maxCells=$maxCells — the pair join is O(C²); coarsen " +
        "unitScale, raise maxCells deliberately, or use " +
        "spearmanCorrelation (no quadratic term)")
    val a = cells.select(col("ux").as("xa"), col("uy").as("ya"),
      col("cnt").as("ca"))
    val b = cells.select(col("ux").as("xb"), col("uy").as("yb"),
      col("cnt").as("cb"))
    val pairs = a.join(b, col("xa") < col("xb"))
      .agg(sum(when(col("ya") < col("yb"), col("ca") * col("cb"))
          .otherwise(0L).cast("decimal(38,0)")).as("n_conc"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb"))
          .otherwise(0L).cast("decimal(38,0)")).as("n_disc"))
    def tiePairs(vCol: String, out: String): DataFrame =
      cells.groupBy(col(vCol)).agg(sum("cnt").as("t"))
        .agg(sum(col("t").cast("decimal(38,0)") * (col("t") - 1L))
          .as(out), sum("t").as(out + "_n"))
    val tx = tiePairs("ux", "t2x")
    val ty = tiePairs("uy", "t2y")
    val j = pairs.crossJoin(tx).crossJoin(ty)
      .filter(when(col("t2x_n") > 3000000000L,
        raise_error(lit("kendallTau: frame exceeds the exact pair-count " +
          "long range")).cast("boolean")).otherwise(lit(true)))
    // doubled pair counts throughout (t(t−1), n(n−1)) — the ÷2 cancels
    // in τ-b, so no integer halving ever happens
    val n02 = (col("t2x_n").cast("decimal(38,0)") *
      (col("t2x_n") - 1L)).cast("double")
    val denom = sqrt((n02 - col("t2x").cast("double")) *
      (n02 - col("t2y").cast("double")))
    j.select(col("t2x_n").as("n"),
      col("n_conc").cast("long").as("n_conc"),
      col("n_disc").cast("long").as("n_disc"),
      when(denom > 0d, round(
        lit(2d) * (col("n_conc") - col("n_disc")).cast("double") / denom,
        6)).as("tau_b"))
  }

  /**
   * Quantile normalization across groups (Bolstad et al. 2003 — the
   * microarray/batch-correction classic): rank every row within its
   * group, average the quantized values at each rank ACROSS groups,
   * and hand each row the cross-group mean at its rank — after which
   * every group shares one empirical distribution and between-group
   * comparisons stop being distribution artifacts. Unequal group
   * sizes use the simple variant: the reference value at rank r
   * averages over the groups that HAVE a rank r (documented choice;
   * the interpolating variant is a different operator).
   *
   * EXACTNESS: ranks are `row_number` over the total order (value,
   * id) — deterministic under ties; the reference value is an exact
   * long sum of quantized values over groups at that rank, ONE IEEE
   * division per rank. `qn_value` therefore matches cross-engine
   * bit-for-bit; no double ever sums.
   *
   * Scale shape: one GROUP-partitioned window by default (parallelism
   * across groups — the right plan when groups are balanced), with a
   * `giantGroups` knob that swaps in the chunked
   * [[Ranking.withGroupedRank]] (no task ever sorts more than
   * ~n/chunks rows, whatever the group skew) producing BIT-IDENTICAL
   * output ((value, id) totally orders each group; parity
   * spec-pinned). The knob is opt-in because the skew insurance costs
   * real constant overhead — measured 7.6× at balanced sf0.1 scale
   * (BENCH r12 mover table) — buy it when one group dwarfs the rest,
   * not by default. Then: lineage-cut so the reference aggregate and
   * the final join read ONE materialization, one rank-keyed aggregate
   * (≤ max group size rows), one rank-keyed join back. Rows carry
   * (group, id, long).
   *
   * Returns one row per input row:
   * (`grp`, `id`, `value`, `qn_value`).
   */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String,
                        unitScale: Long = 100L,
                        giantGroups: Boolean = false): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u"))
    // Default: group-partitioned window (parallel ACROSS groups).
    // giantGroups = true swaps in the chunked Ranking.withGroupedRank
    // — bit-identical ranks ((u, id) totally orders each group;
    // parity spec-pinned), no task ever sorts a whole group — for
    // frames where one group dwarfs the rest. NOT the default because
    // the insurance isn't free: at balanced sf0.1 scale the chunked
    // form measured 7.6× the window form (range-sampling pass +
    // checkpoint + stitch overhead, BENCH r12 mover table) — buy it
    // when group skew, not row count, is the risk.
    // cut: the ranked frame is read twice (reference aggregate + the
    // final join) — uncut, the scan AND the rank pass both run twice
    // (plan-audited); one materialization beats a second full pass
    val ranked = graft.core.LineageCut.cut(
      if (giantGroups)
        Ranking.withGroupedRank(base, "grp",
            Seq(col("u").asc, col("id").asc), "rk", "gn")
          .drop("gn")
      else base.withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("u"), col("id")))))
    val ref = ranked.groupBy("rk")
      .agg(sum("u").as("su"), count(lit(1)).as("c"))
      .select(col("rk"),
        (col("su").cast("double") / (col("c") * unitScale).cast("double"))
          .as("qn_value"))
    ranked.join(ref, "rk")
      .select(col("grp"), col("id"),
        (col("u").cast("double") / unitScale.toDouble).as("value"),
        col("qn_value"))
  }

  /**
   * McNemar's test for paired binary outcomes (McNemar 1947, with
   * Edwards' continuity correction): given two boolean verdicts on the
   * SAME items — two quality filters, a filter before/after a change,
   * two classifiers — "do they disagree symmetrically, or does one
   * systematically pass what the other fails?" Only the discordant
   * cells carry signal: χ² = (|n01 − n10| − 1)² / (n01 + n10) under
   * the correction (the uncorrected variant drops the −1).
   *
   * EXACTNESS: all four cells are exact longs from ONE
   * map-side-combined aggregate; the statistic is one integer
   * numerator over one integer denominator — a single IEEE division,
   * rounded 4dp (NULL when no discordant pairs exist — the test is
   * undefined). Nothing about this operator depends on value
   * cardinality; n is unbounded.
   *
   * Returns ONE row: (`n`, `n_both`, `n_neither`, `n01`, `n10`,
   * `chi2`) where n01 = a-only passes, n10 = b-only passes.
   */
  def mcnemarTest(df: DataFrame, aCol: String, bCol: String,
                  corrected: Boolean = true): DataFrame = {
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("boolean").as("a"),
        col(bCol).cast("boolean").as("b"))
    val agg = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n_both"),
      sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n_neither"),
      sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n10"))
    val disc = col("n01") + col("n10")
    val diff = abs(col("n01") - col("n10"))
    val num = if (corrected) {
      // (|b−c|−1)² floored at 0: a 1-disagreement split would otherwise
      // go negative-squared... it cannot (|d|≥0, (|d|−1)² ≥ 0) — but
      // |d|=0 with disc>0 gives (−1)²=1, the standard corrected value
      val d = diff - lit(1L)
      d * d
    } else diff * diff
    agg.select(col("n"), col("n_both"), col("n_neither"), col("n01"),
      col("n10"),
      when(disc > 0L,
        round(num.cast("double") / disc.cast("double"), 4)).as("chi2"))
  }

  /**
   * Effective sample size of a weighted frame (Kish 1965's design
   * effect): ESS = (Σw)²/Σw² — how many EQUAL-weight samples the
   * weighted set is worth. The diagnostic every importance-weighted
   * mix ([[DataSelection.importanceWeights]], temperature sampling)
   * needs before training on the weights: an ESS ratio near 1 says
   * the weights are benign; near 0 says a few heavy documents
   * dominate and the mix's nominal size is a lie.
   *
   * EXACTNESS: weights quantize at `unitScale` (zero/negative weights
   * fail loud — they poison ESS silently); Σw is an exact long, Σw²
   * exact DECIMAL(38,0); the quantization scale cancels in both ESS
   * and the ratio, each ONE fixed double chain per group, 4dp.
   *
   * Scale shape: ONE map-side-combined aggregate per group key (or
   * one row global when `groupCol` is empty). Nothing else moves.
   *
   * Returns (`grp`, `n`, `ess`, `ess_ratio`) — or without `grp` when
   * ungrouped.
   */
  def effectiveSampleSize(df: DataFrame, weightCol: String,
                          groupCol: String = "",
                          unitScale: Long = 1000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val w = round(col(weightCol) * unitScale).cast("long")
    val base = df.filter(col(weightCol).isNotNull)
      .select((if (groupCol.nonEmpty)
        Seq(col(groupCol).cast("string").as("grp")) else Nil) :+
        w.as("u"): _*)
      .filter(when(col("u") <= 0L,
        raise_error(lit("effectiveSampleSize: weight quantized to <= 0 " +
          "(raise unitScale or drop nonpositive weights)"))
          .cast("boolean")).otherwise(lit(true)))
    val grouped = if (groupCol.nonEmpty) base.groupBy("grp") else
      base.groupBy()
    // widen BEFORE squaring: at the default 10⁶ scale a weight of ~10⁴
    // quantizes to 10¹⁰ and its long square overflows (ANSI fail)
    val agg = grouped.agg(count(lit(1)).as("n"), sum("u").as("s1"),
      sum(col("u").cast("decimal(38,0)") * col("u")).as("s2"))
    val ess = col("s1").cast("double") * col("s1").cast("double") /
      col("s2").cast("double")
    val front = if (groupCol.nonEmpty) Seq(col("grp")) else Nil
    agg.select(front ++ Seq(col("n"), round(ess, 4).as("ess"),
      round(ess / col("n").cast("double"), 4).as("ess_ratio")): _*)
  }

  /**
   * Pairwise Spearman rank-correlation matrix (the monotone companion
   * to [[correlationMatrix]]'s Pearson): every column pair's rank
   * correlation with exact tie handling, from ONE moments aggregate —
   * so a k-column screen costs k rank passes + k level joins + one
   * aggregate, never k² passes. Heavy-tailed pipeline columns
   * (prices, latencies, lengths) correlate by ORDER here; run both
   * matrices and a large Pearson−Spearman gap flags tail-driven
   * correlation.
   *
   * EXACTNESS: the [[spearmanCorrelation]] contract per column —
   * quantized values, chunked [[Ranking.withGlobalRank]] over (value,
   * id) (NO single-partition window), a tie level's DOUBLED average
   * rank = min+max of its unique ranks (exact long per level) — then
   * ALL k sums, k square sums, and k(k−1)/2 cross sums accumulate
   * DECIMAL(38,0) in one aggregate; each ρ converts its exact factors
   * to double once, 6dp. Zero-rank-variance columns yield NULL ρ
   * against everything (diagonal included). n guarded at 10⁹.
   *
   * Scale shape (default `oneShuffle`, r18 form): the k columns MELT
   * to (col_idx, value) and collapse to per-(col_idx, level) COUNTS in
   * one map-side-combined aggregate; each level's doubled average rank
   * derives from chunked prefix counts over LEVELS
   * ([[Ranking.levelRanks]] — r2 = 2·before + cnt + 1 is exactly
   * min+max of the row ranks, so no row is ever range-shuffled or
   * sorted and every exchange is level-cardinality-sized), then the
   * cut level frame feeds k value-keyed joins back onto the row frame,
   * one moments aggregate, one ≤ k(k+1)/2-row stack. `oneShuffle =
   * false` keeps the r11 reference form — k sequential chunked ROW
   * rank passes (k full-frame range shuffles) — for A/B measurement;
   * all forms produce BIT-IDENTICAL output (same per-column (value,
   * id) total order → same exact level ranks).
   *
   * The level-join machinery's scale bound is the LEVEL-FRAME
   * CARDINALITY — distinct (column, quantized value) rows — not n:
   * all-unique columns make it k·n rows and the k joins go row-sized
   * (measured: the 4M×16 all-unique cliff, ~320 s in BOTH forms,
   * SCALING.md §spearman-matrix). ENFORCED fail-loud ([[kendallTau]]'s
   * `maxCells` convention): a level-count gate (`maxLevels`, default
   * 10⁷) runs over the already-cut level frame before any join is
   * planned into a job and aborts with the escape hatch in the
   * message — coarsen `unitScale` (the measured 11× recovery dial:
   * quantization collapses near-duplicate levels), or raise
   * `maxLevels` deliberately.
   *
   * Returns one row per ordered pair a ≤ b (diagonal included, ρ = 1
   * for any column with rank variance): (`col_a`, `col_b`, `rho`).
   */
  def spearmanMatrix(df: DataFrame, columns: Seq[String], idCol: String,
                     unitScale: Long = 100L,
                     oneShuffle: Boolean = true,
                     maxLevels: Long = 10000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    require(maxLevels >= 1, "maxLevels must be >= 1")
    require(columns.size >= 2, "need at least two columns")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val base = df
      .filter(columns.map(c => col(c).isNotNull).reduce(_ && _) &&
        col(idCol).isNotNull)
      .select(col(idCol).as("id") +:
        columns.zipWithIndex.map { case (c, i) =>
          round(col(c) * unitScale).cast("long").as(s"u$i")
        }: _*)
      // two consumers (level derivation + the k-join moment chain):
      // cut so the scan+quantize runs once, fan out so the aggregate
      // map sides parallelize off a single-split scan (r18; the same
      // shape spearmanCorrelation committed in r17)
      .lineageCutFanout()
    val k = columns.size
    val withR = if (oneShuffle) {
      // LEVEL-COUNT rank pass (r18; was a k·n-row melted range shuffle
      // through withGroupedRank): melt the k quantized columns to
      // (cidx, u) rows, collapse to per-(column, level) COUNTS in one
      // map-side-combined aggregate, and derive each level's doubled
      // average rank from prefix counts — r2 = 2·(rows in smaller
      // levels) + cnt + 1 is exactly min+max of the ranks the row pass
      // assigned (consecutive integers), so every exact decimal moment
      // downstream is BIT-IDENTICAL to both prior forms, while nothing
      // row-sized is ever range-shuffled or sorted (the exchanges are
      // level-cardinality-sized — the operator's own documented bound).
      val stackArgs = columns.indices.map(i => s"$i, u$i").mkString(", ")
      val melted = base.selectExpr("id", s"stack($k, $stackArgs) as (cidx, u)")
      val levelCounts = melted.groupBy("cidx", "u")
        .agg(count(lit(1)).as("__lcnt"))
      // cut — k filtered slices join back, each must not re-run the
      // level derivation
      val levels = graft.core.LineageCut.cut(
        Ranking.levelRanks(levelCounts, Seq("cidx"), "u", "__lcnt", "r2")
          .select(col("cidx"), col("u"), col("r2")))
      // FAIL-LOUD scale guard on the documented level-cardinality
      // bound: the count runs over the already-cut level frame (no
      // rank-pass rescan) and fires BEFORE the k row-frame joins are
      // ever planned into a job
      val nLevels = levels.count()
      require(nLevels <= maxLevels,
        s"spearmanMatrix: $nLevels distinct (column, value) levels " +
          s"exceeds maxLevels=$maxLevels — the k level joins go " +
          "row-sized at this cardinality (the measured 4M x 16 " +
          "all-unique cliff, SCALING.md); coarsen unitScale " +
          "(quantization collapses near-duplicate levels, measured " +
          "11x recovery) or raise maxLevels deliberately")
      columns.indices.foldLeft(base) { (d, i) =>
        val lvl = levels.filter(col("cidx") === i)
          .select(col("u").as(s"u$i"), col("r2").as(s"r2_$i"))
        d.join(lvl, s"u$i")
      }
    } else columns.indices.foldLeft(base) { (d, i) =>
      // k-pass form (kept for A/B measurement): each level frame
      // derives from BASE, not the partially-joined accumulator —
      // deriving from `d` would nest every earlier join under every
      // later rank pass (rank pass k re-running k−1 joins)
      val lvl = Ranking.withGlobalRank(base.select(col("id"), col(s"u$i")),
          Seq(col(s"u$i").asc, col("id").asc), "r", "nn")
        .groupBy(s"u$i")
        .agg((min("r") + max("r")).as(s"r2_$i"))
      d.join(lvl, s"u$i")
    }
    val dec = "decimal(38,0)"
    val pairs = for {
      i <- columns.indices
      j <- columns.indices.drop(i)
    } yield (i, j)
    val sums =
      columns.indices.map(i => sum(col(s"r2_$i").cast(dec)).as(s"s$i")) ++
      pairs.map { case (i, j) =>
        sum(col(s"r2_$i").cast(dec) * col(s"r2_$j")).as(s"p${i}_$j")
      }
    val aggCols = count(lit(1)).as("n") +: sums
    val mom = withR.agg(aggCols.head, aggCols.tail: _*)
      .filter(when(col("n") > 1000000000L,
        raise_error(lit("spearmanMatrix: n exceeds the exact " +
          "decimal(38,0) moment range")).cast("boolean"))
        .otherwise(lit(true)))
    val rhoCols = pairs.map { case (i, j) =>
      val cov = (col("n") * col(s"p${i}_$j") -
        col(s"s$i") * col(s"s$j")).cast("double")
      val vx = (col("n") * col(s"p${i}_$i") -
        col(s"s$i") * col(s"s$i")).cast("double")
      val vy = (col("n") * col(s"p${j}_$j") -
        col(s"s$j") * col(s"s$j")).cast("double")
      when(vx > 0d && vy > 0d, round(cov / sqrt(vx * vy), 6))
        .as(s"rho${i}_$j")
    }
    val rhod = mom.select(rhoCols: _*)
    val stackArgs = pairs.map { case (i, j) =>
      s"'${columns(i)}', '${columns(j)}', rho${i}_$j"
    }.mkString(", ")
    rhod.select(expr(s"stack(${pairs.size}, $stackArgs) " +
      "as (col_a, col_b, rho)"))
  }

  /**
   * Precision-recall curve of a score against a binary label — the
   * threshold-sweep companion to [[aucReport]]: one row per distinct
   * quantized score t with the confusion counts of classifying
   * `score ≥ t` as positive. Rare-positive screens (toxicity, spam,
   * contamination) read THIS, not ROC: with 0.1% positives a 0.99 AUC
   * can still mean useless precision at any useful recall.
   *
   * EXACTNESS: per-level positive/total counts are exact longs; the
   * ≥-threshold cumulatives come from ONE descending-score window
   * over LEVELS; precision = tp/(tp+fp) and recall = tp/n_pos are
   * single IEEE divisions of exact integers — unrounded,
   * IEEE-identical cross-engine. Empty when either class is absent
   * (no curve exists).
   *
   * Scale shape: identical to [[aucReport]] — one map-side-combined
   * level aggregate, one value-ordered window over LEVELS (quantized-
   * score cardinality bounds it; coarsen `unitScale` past ~10⁸
   * levels), map-only arithmetic after.
   *
   * Returns one row per distinct score, descending-threshold order by
   * `threshold` asc: (`threshold`, `tp`, `fp`, `precision`, `recall`).
   */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              unitScale: Long = 100L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("pos"),
        round(col(scoreCol) * unitScale).cast("long").as("u"))
    val levels = base.groupBy("u")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        count(lit(1)).as("cv"))
    val desc = Window.orderBy(col("u").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = levels
      .withColumn("tp", sum("cp").over(desc))
      .withColumn("pred", sum("cv").over(desc))
      .withColumn("n_pos", sum("cp").over(tot))
      .withColumn("n_neg", sum(col("cv") - col("cp")).over(tot))
    cum.filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("u").as("threshold"), col("tp"),
        (col("pred") - col("tp")).as("fp"),
        (col("tp").cast("double") / col("pred").cast("double"))
          .as("precision"),
        (col("tp").cast("double") / col("n_pos").cast("double"))
          .as("recall"))
  }

  /**
   * Decile lift / gains table of a score against a binary label (the
   * campaign-targeting classic): rank by score descending, split into
   * `k` near-equal buckets by the SQL-standard ntile fill, and per
   * decile report size, positives, the cumulative gain share, and
   * lift = decile rate / overall rate. What a budget-capped filtering
   * pass reads: "if we only keep the top 20% by score, what share of
   * the positives do we capture?"
   *
   * EXACTNESS: ranks come from [[Ranking.withGlobalRank]] over (score
   * desc, id asc) — a total order, so equal scores split identically
   * cross-engine — with [[Ranking.ntileFromRank]]'s exact-integer
   * bucket fill (NEVER an unpartitioned ntile window); per-decile
   * counts are exact longs; lift = (pos_d·n)/(n_d·pos) and the gain
   * share are single divisions of exact integer products (guarded by
   * the 10⁹ rank bound). All unrounded — IEEE-identical.
   *
   * Scale shape: one chunked rank pass (range shuffle + offset
   * stitch), one ≤ k-row aggregate, one ≤ k-row cumulative window.
   *
   * Returns k rows ascending `decile` (1 = highest scores):
   * (`decile`, `n`, `n_pos`, `cum_gain`, `lift`).
   */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                idCol: String, k: Int = 10,
                unitScale: Long = 100L): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).cast("boolean").as("pos"),
        round(col(scoreCol) * unitScale).cast("long").as("u"))
    val ranked = Ranking.withGlobalRank(base,
      Seq(col("u").desc, col("id").asc), "rk", "nn")
    val dec = ranked
      .select(Ranking.ntileFromRank(col("rk"), col("nn"), k).as("decile"),
        col("pos"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
    val byD = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    dec
      .withColumn("cum_pos", sum("n_pos").over(byD))
      .withColumn("t_pos", sum("n_pos").over(tot))
      .withColumn("t_n", sum("n").over(tot))
      .filter(col("t_pos") > 0)
      .select(col("decile"), col("n"), col("n_pos"),
        (col("cum_pos").cast("double") / col("t_pos").cast("double"))
          .as("cum_gain"),
        ((col("n_pos") * col("t_n")).cast("double") /
          (col("n") * col("t_pos")).cast("double")).as("lift"))
  }

  /**
   * Brier score of a probability forecast against binary outcomes
   * (Brier 1950): mean squared error Σ(p − y)²/n — the PROPER scoring
   * rule next to [[calibrationReport]]'s reliability table (a model
   * can be perfectly calibrated yet useless; Brier punishes both
   * miscalibration AND lack of resolution).
   *
   * EXACTNESS: probabilities quantize at `unitScale`; each residual
   * (u − y·unitScale) is an exact long, squares accumulate
   * DECIMAL(38,0) (widened BEFORE multiplying), and the score is ONE
   * division with a fixed two-factor double denominator, 6dp.
   * Out-of-range probabilities fail loud.
   *
   * Scale shape: ONE map-side-combined aggregate. Returns one row:
   * (`n`, `brier`).
   */
  def brierScore(df: DataFrame, probCol: String, labelCol: String,
                 unitScale: Long = 1000000L): DataFrame = {
    require(unitScale >= 1, "unitScale must be >= 1")
    val base = df
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("pos"),
        round(col(probCol) * unitScale).cast("long").as("up"))
      .filter(when(col("up") < 0L || col("up") > unitScale,
        raise_error(lit("brierScore: probability outside [0, 1]"))
          .cast("boolean")).otherwise(lit(true)))
    val res = col("up") - when(col("pos"), unitScale).otherwise(0L)
    base.agg(count(lit(1)).as("n"),
        sum(res.cast("decimal(38,0)") * res).as("ss"))
      .select(col("n"),
        round(col("ss").cast("double") /
          (col("n").cast("double") * (unitScale.toDouble * unitScale)), 6)
          .as("brier"))
  }

  /**
   * Split-conformal quantile threshold (Vovk et al. 2005; Lei et al.
   * 2018's split-conformal recipe): from a calibration set of
   * nonconformity scores, the ⌈(n+1)(1−α)⌉-th smallest score — the
   * distribution-FREE cutoff with the finite-sample guarantee that a
   * fresh score lands below it with probability ≥ 1−α. The principled
   * way to turn any quality/novelty score into a filtering threshold
   * (vs. eyeballing a percentile).
   *
   * EXACTNESS: the order-statistic index k = (n+1) − ⌊(n+1)·α⌋
   * evaluates in PURE integer arithmetic (α as an exact num/10⁶
   * rational, the paretoReport idiom — a float product would ride a
   * binary knife edge at (n+1)·α integers); the k-th smallest comes
   * from [[Ranking.withGlobalRank]] over (score, id) — a chunked
   * range shuffle, never a single-partition sort — and the VALUE at
   * position k is tie-invariant even though the tiebreak orders equal
   * scores. One division converts back to value units. Fails loud
   * when k > n (α too small for the calibration size — the guarantee
   * is unattainable, not approximable).
   *
   * Scale shape: one chunked rank pass + a 1-row filter. Returns ONE
   * row: (`n`, `k`, `qhat`).
   */
  def conformalThreshold(df: DataFrame, scoreCol: String, idCol: String,
                         alpha: Double,
                         unitScale: Long = 100L): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(unitScale >= 1, "unitScale must be >= 1")
    val den = 1000000L
    val num = math.round(alpha * den)
    require(math.abs(num.toDouble / den - alpha) < 1e-12,
      s"alpha must be expressible in 6 decimal places; got $alpha")
    val base = df
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        round(col(scoreCol) * unitScale).cast("long").as("u"))
    // k computes driver-side from a scan-only count (a plan-side
    // raise_error guard would be unreachable: when k > n no row
    // matches rk == k, so the guarded filter never evaluates and the
    // failure would read as a silent empty result)
    val n = base.count()
    require(n >= 1, "conformalThreshold on an empty calibration frame")
    val k = (n + 1L) - (n + 1L) * num / den
    require(k <= n,
      s"conformalThreshold: alpha=$alpha too small for n=$n calibration " +
        s"scores (k=$k > n — the 1−α guarantee is unattainable)")
    val ranked = Ranking.withGlobalRank(base,
      Seq(col("u").asc, col("id").asc), "rk", "nn")
    ranked.filter(col("rk") === k)
      .select(col("nn").as("n"), col("rk").as("k"),
        (col("u").cast("double") / unitScale.toDouble).as("qhat"))
  }

  /**
   * Per-group split-conformal thresholds — [[conformalThreshold]]
   * stratified by a group key (per-language, per-source, per-domain
   * cutoffs): within each group, the ⌈(n_g+1)(1−α)⌉-th smallest score.
   * Group-conditional coverage is exactly what a mixed corpus needs —
   * one global cutoff over-filters the minority strata.
   *
   * EXACTNESS: the [[conformalThreshold]] contract per group — the
   * order-statistic index in pure integer arithmetic (α as exact
   * num/10⁶), the VALUE at position k tie-invariant — but the rank is
   * PER GROUP (never global, no driver action at all). Groups too
   * small for the guarantee
   * ((n_g+1)·α < 1, i.e. k > n_g) report NULL `qhat` — present and
   * visibly unattainable rather than silently dropped.
   *
   * Scale shape: ONE group-partitioned window pass by default
   * (parallel across groups), or — `giantGroups` — the chunked
   * [[Ranking.withGroupedRank]] (no task ever sorts a whole group;
   * identical output, ~3.7× constant overhead at balanced scale —
   * same trade as [[quantileNormalize]]'s knob); either way
   * lineage-cut so its two consumers (the k-rank filter and the
   * per-group n rows) share one materialization — the base is scanned
   * exactly once — plus one group-keyed join of group-count rows.
   *
   * Returns one row per group: (`grp`, `n`, `k`, `qhat`).
   */
  def conformalThresholdByGroup(df: DataFrame, scoreCol: String,
                                groupCol: String, alpha: Double,
                                unitScale: Long = 100L,
                                giantGroups: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(unitScale >= 1, "unitScale must be >= 1")
    val den = 1000000L
    val num = math.round(alpha * den)
    require(math.abs(num.toDouble / den - alpha) < 1e-12,
      s"alpha must be expressible in 6 decimal places; got $alpha")
    val base = df
      .filter(col(scoreCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        round(col(scoreCol) * unitScale).cast("long").as("u"))
    def kOf(n: Column): Column = {
      val t = (n + 1L) * num
      (n + 1L) - ((t - pmod(t, lit(den))) / den).cast("long")
    }
    // Default: group-partitioned window; giantGroups = true swaps in
    // the chunked Ranking.withGroupedRank (quantileNormalize's knob —
    // same trade, measured 3.7× overhead here at balanced scale).
    // Ranks within tied u values are arbitrary under BOTH forms, but
    // the consumed quantity — the u VALUE at position k — is
    // tie-invariant, so the output is identical either way.
    // cut (conformal): the ranked frame feeds TWO consumers (the
    // k-rank filter and the per-group n derivation) — uncut, each
    // re-ran the base scan + the rank pass; n comes from the count the
    // cut frame already carries, so no second scan of base exists.
    val ranked = graft.core.LineageCut.cut(
      if (giantGroups)
        Ranking.withGroupedRank(base, "grp", Seq(col("u").asc), "rk", "n")
      else base
        .withColumn("rk", row_number().over(
          Window.partitionBy("grp").orderBy("u")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("grp"))))
    val qrows = ranked.filter(col("rk") === kOf(col("n")))
      .select(col("grp"),
        (col("u").cast("double") / unitScale.toDouble).as("qhat"))
    ranked.groupBy("grp").agg(max("n").as("n"))
      .join(qrows, Seq("grp"), "left")
      .select(col("grp"), col("n"), kOf(col("n")).as("k"), col("qhat"))
  }

  /**
   * Krippendorff's alpha for nominal data (Krippendorff 2004) — the
   * inter-annotator agreement coefficient that, unlike
   * [[cohensKappa]], handles ANY number of raters per unit and
   * missing ratings: the chance-corrected ratio of observed to
   * expected disagreement over all pairable ratings. THE gate for
   * human-labeled training data (preference pairs, toxicity labels,
   * quality grades): alpha ≥ 0.8 is the conventional "rely on it"
   * bar, < 0.667 "discard".
   *
   * α = 1 − D_o/D_e over pairable units (m_u ≥ 2 ratings):
   * D_o·n = Σ_u [Σ_c n_uc(m_u − n_uc)]/(m_u − 1) and
   * D_e·n(n−1) = Σ_c n_c(n − n_c), giving
   * α = 1 − (n − 1)·Σ_u […]/(m_u−1) / Σ_c n_c(n − n_c).
   *
   * EXACTNESS: all counts are exact longs; each unit's disagreement
   * numerator m_u² − Σ_c n_uc² is exact DECIMAL(38,0), and the
   * per-unit ÷(m_u − 1) is FACTORED OUT by grouping units on m_u —
   * the division happens once per DISTINCT rating-count level, not
   * per unit, so the only cross-row double sum runs over the ≤
   * distinct-m LEVEL frame via a RUNNING window fold in m order (a
   * sequential left fold in both engines — the kruskalWallis
   * contract); D_e is one exact decimal converted to double once.
   * α rounds 6dp; NULL when D_e = 0 (a single label) or no unit is
   * pairable. n guarded at 3×10⁹ (n(n−1) long-range).
   *
   * Scale shape: one (unit, label) aggregate, one unit-level
   * aggregate, one ≤ distinct-m-level aggregate + its bounded ordered
   * window, one label-level aggregate (bounded by label cardinality).
   * Coder identity only gates the null filter — nominal alpha depends
   * on the label MULTISET per unit, never on who assigned what.
   *
   * Returns one row: (`n_units`, `n_ratings`, `alpha`).
   */
  def krippendorffAlpha(df: DataFrame, unitCol: String, coderCol: String,
                        labelCol: String): DataFrame = {
    val base = df
      .filter(col(unitCol).isNotNull && col(coderCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(unitCol).cast("string").as("unit"),
        col(labelCol).cast("string").as("lab"))
    val dec = "decimal(38,0)"
    val cells = graft.core.LineageCut.cut(
      base.groupBy("unit", "lab").agg(count(lit(1)).as("nuc")))
    val units = graft.core.LineageCut.cut(cells.groupBy("unit")
      .agg(sum("nuc").as("mu"),
        sum(col("nuc").cast(dec) * col("nuc")).as("sq"))
      .filter(col("mu") >= 2L))
    // per distinct rating-count m: exact integer numerator sum, ONE
    // division by (m − 1) — then a bounded ordered fold over m levels
    val mLevels = units.groupBy("mu")
      .agg(sum(col("mu").cast(dec) * col("mu") - col("sq")).as("num"))
    val foldW = Window.orderBy("mu")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dObs = mLevels
      .withColumn("term",
        col("num").cast("double") / (col("mu") - 1L).cast("double"))
      .withColumn("run", sum("term").over(foldW))
      .withColumn("rn", row_number().over(Window.orderBy("mu")))
      .withColumn("nm", count(lit(1)).over(
        Window.orderBy("mu").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("rn") === col("nm"))
      // force exactly ONE row (null on no pairable units) so the
      // crossJoins below never zero out the output row
      .agg(max("run").as("d_obs_sum"))
    val totals = units.agg(count(lit(1)).as("n_units"),
      coalesce(sum("mu"), lit(0L)).as("n_ratings"))
    val labTotals = cells
      .join(units.select("unit"), "unit") // pairable units only
      .groupBy("lab").agg(sum("nuc").as("nc"))
    val dExp = labTotals
      .crossJoin(broadcast(totals.select(col("n_ratings").as("nr"))))
      .agg(sum(col("nc").cast(dec) * (col("nr") - col("nc"))).as("d_exp"))
    totals
      .filter(when(col("n_ratings") > 3000000000L,
        raise_error(lit("krippendorffAlpha: n exceeds the exact " +
          "pair-count long range")).cast("boolean")).otherwise(lit(true)))
      .crossJoin(dObs)
      .crossJoin(dExp)
      .select(col("n_units"), col("n_ratings"),
        when(col("d_exp").isNotNull && col("d_exp") > 0,
          round(lit(1.0) - (col("n_ratings") - 1L).cast("double") *
            col("d_obs_sum") / col("d_exp").cast("double"), 6))
          .as("alpha"))
  }

  /**
   * Benjamini-Hochberg step-up FDR correction (Benjamini & Hochberg
   * 1995) — the multiple-testing companion to every per-group test in
   * this file: run welchTTest/χ²/MWU per segment, feed the p-value
   * frame here, and gate on `reject` instead of raw p < α (which at
   * 10⁴ segments yields ~500 false positives at α = 0.05 by
   * construction). Adjusted p_(i) = min_{j ≥ i}(m·p_(j)/j) clipped at
   * 1; `reject` is the step-up rule (true iff adjusted ≤ α).
   *
   * EXACTNESS: the ascending rank orders by (p, id) — the id tiebreak
   * makes the permutation deterministic; each m·p/j is one IEEE chain;
   * the suffix-min is an ordered running fold (descending-rank running
   * min — sequential in both engines); `p_adj` rounds 6dp AFTER the
   * fold and `reject` compares the UNROUNDED adjusted value to α
   * (stated — rounding first would flip decisions at the boundary).
   *
   * Scale shape: the frame is HYPOTHESIS-count-sized (one row per test
   * already run), not data-sized — windows over it are windows over
   * thousands-to-millions of rows, and both (the rank and the suffix
   * fold) run as ONE global ordered window pair. That bound is the
   * documented contract (the kaplanMeier/level-frame convention);
   * callers with ≥10⁸ simultaneous hypotheses have a different
   * problem. One row out per hypothesis: (id, p, `rank`, `m`,
   * `p_adj`, `reject`).
   *
   * NULL-p POLICY: fail loud. A NULL p-value is a hypothesis that was
   * SUBMITTED but didn't produce a test result — silently dropping it
   * shrinks m and makes the correction less conservative than the
   * submitted hypothesis count warrants (every kept p_adj would be
   * too small). Callers who genuinely mean "exclude these" must
   * filter upstream, visibly.
   */
  def benjaminiHochberg(df: DataFrame, idCol: String, pCol: String,
                        alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val base = df
      .filter(when(col(pCol).isNull,
        raise_error(lit("benjaminiHochberg: NULL p-value — a submitted " +
          "hypothesis without a result would silently shrink m; filter " +
          "upstream if exclusion is intended")).cast("boolean"))
        .otherwise(lit(true)))
      .select(col(idCol).as("id"), col(pCol).cast("double").as("p"))
    val wTot = Window.orderBy("p", "id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy("p", "id")
    // suffix min over ascending rank == running min over DESCENDING rank
    val wSuffix = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wTot))
      .withColumn("__stepped",
        col("p") * col("m").cast("double") / col("rank").cast("double"))
      .withColumn("__padj",
        least(min("__stepped").over(wSuffix), lit(1.0)))
      .select(col("id"), col("p"), col("rank"), col("m"),
        round(col("__padj"), 6).as("p_adj"),
        (col("__padj") <= lit(alpha)).as("reject"))
  }

  /**
   * Holm step-down adjusted p-values (Holm 1979) — the FAMILY-WISE
   * error-rate member completing the multiple-testing trio:
   * [[benjaminiHochberg]] and [[storeyQValues]] control FDR (the
   * screening regime — some false calls are fine), Holm controls
   * FWER (the confirmatory regime — one false call invalidates the
   * release decision) uniformly better than plain Bonferroni and
   * with zero extra assumptions. adj_(i) = max_{j ≤ i}
   * min(1, (m − j + 1)·p_(j)) over the ascending (p, id) order —
   * the step-DOWN prefix max, the mirror of BH's step-up suffix min.
   *
   * EXACTNESS: the [[benjaminiHochberg]] machinery verbatim —
   * (p, id)-tiebroken rank from ONE chunked-window pass, each stepped
   * value ONE multiply of caller doubles, the prefix-max fold in rank
   * order, `p_adj` rounds 6dp AFTER the fold; NULL p-values fail loud
   * (a submitted hypothesis without a result would silently shrink
   * m). `reject` compares the unrounded fold to α.
   *
   * Scale shape: identical to [[benjaminiHochberg]] — rank windows
   * over the HYPOTHESIS frame (tests, not data rows; bounded by the
   * experiment registry, not the corpus).
   *
   * Output one row per hypothesis: (`id`, `p`, `rank`, `m`, `p_adj`,
   * `reject`).
   */
  def holmBonferroni(df: DataFrame, idCol: String, pCol: String,
                     alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val base = df
      .filter(when(col(pCol).isNull,
        raise_error(lit("holmBonferroni: NULL p-value — a submitted " +
          "hypothesis without a result would silently shrink m; filter " +
          "upstream if exclusion is intended")).cast("boolean"))
        .otherwise(lit(true)))
      .select(col(idCol).as("id"), col(pCol).cast("double").as("p"))
    val wTot = Window.orderBy("p", "id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy("p", "id")
    val wPrefix = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wTot))
      .withColumn("__stepped", least(
        col("p") * (col("m") - col("rank") + 1L).cast("double"),
        lit(1.0)))
      .withColumn("__padj", max("__stepped").over(wPrefix))
      .select(col("id"), col("p"), col("rank"), col("m"),
        round(col("__padj"), 6).as("p_adj"),
        (col("__padj") <= lit(alpha)).as("reject"))
  }

  /**
   * Storey q-values (Storey 2002; Storey & Tibshirani 2003) —
   * [[benjaminiHochberg]] with the null-proportion estimate plugged
   * in: BH implicitly assumes EVERY hypothesis is null (π₀ = 1),
   * over-correcting when signal is plentiful; Storey estimates
   * π₀ = #{p > λ} / ((1−λ)·m) from the flat right tail and scales the
   * adjusted values by it, so q_i = min_{j ≥ i} π₀·m·p_(j)/j (clipped
   * at 1) — a q-value is the minimum FDR at which hypothesis i is
   * called.
   *
   * EXACTNESS: the BH machinery verbatim ((p, id)-tiebroken rank,
   * descending-rank running suffix-min); π₀ is one IEEE chain from an
   * exact tail count (clipped at 1, the standard estimator guard);
   * `q_value` rounds 6dp after the fold. λ is a caller literal
   * (default 0.5 — the flat-tail midpoint; the smoothing-spline λ→1
   * extrapolation is a different, non-deterministic estimator and
   * deliberately NOT here).
   *
   * Scale shape: the benjaminiHochberg contract — hypothesis-sized
   * frame, one ordered window pair. One row per hypothesis:
   * (id, p, `rank`, `m`, `pi0`, `q_value`).
   */
  def storeyQValues(df: DataFrame, idCol: String, pCol: String,
                    lambda: Double = 0.5): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"lambda must be in (0,1): $lambda")
    // NULL-p: fail loud, the benjaminiHochberg policy (same rationale)
    val base = df
      .filter(when(col(pCol).isNull,
        raise_error(lit("storeyQValues: NULL p-value — a submitted " +
          "hypothesis without a result would silently shrink m; filter " +
          "upstream if exclusion is intended")).cast("boolean"))
        .otherwise(lit(true)))
      .select(col(idCol).as("id"), col(pCol).cast("double").as("p"))
    val wTot = Window.orderBy("p", "id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy("p", "id")
    val wSuffix = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wTot))
      // floored at 1/m: with NO p > lambda the raw estimate is 0,
      // which would drive EVERY q-value to 0 (reject everything) — the
      // 1/m floor is the "at least one null hypothesis" guard (the
      // qvalue package's pi0 > 0 convention)
      .withColumn("pi0", greatest(least(lit(1.0),
        sum(when(col("p") > lambda, 1L).otherwise(0L)).over(wTot)
          .cast("double") /
          ((lit(1.0) - lit(lambda)) * col("m").cast("double"))),
        lit(1.0) / col("m").cast("double")))
      .withColumn("__stepped",
        col("pi0") * (col("p") * col("m").cast("double") /
          col("rank").cast("double")))
      .withColumn("__q",
        least(min("__stepped").over(wSuffix), lit(1.0)))
      .select(col("id"), col("p"), col("rank"), col("m"),
        round(col("pi0"), 6).as("pi0"),
        round(col("__q"), 6).as("q_value"))
  }

  /**
   * Inclusion-dependency check (the profiling primitive behind
   * foreign-key discovery, Bell & Brockhausen 1995): what fraction of
   * the DISTINCT non-null values of `child.childCol` appear in
   * `parent.parentCol`? Coverage 1.0 ⇒ the inclusion dependency holds
   * (a valid FK candidate); < 1.0 quantifies referential-integrity
   * violations — the ingest gate a 100 TB join pipeline runs BEFORE
   * the join silently drops orphaned rows.
   *
   * EXACTNESS: both sides reduce to exact distinct key sets (hash
   * aggregates); the miss count is a LEFT ANTI join; `coverage` is one
   * IEEE division rounded 6dp. Values compare under the CHILD column's
   * type after casting the parent key to it (stated — cross-type FK
   * checks inherit SQL cast semantics).
   *
   * Scale shape: two keys-only distinct aggregates (map-side combined
   * — the shuffles carry DISTINCT keys, not rows), one anti join that
   * AQE broadcasts when the parent key set is small; no windows, no
   * driver state. Output is ONE row: (`n_child_distinct`, `n_missing`,
   * `coverage`, `holds`).
   */
  def inclusionCoverage(child: DataFrame, childCol: String,
                        parent: DataFrame, parentCol: String): DataFrame = {
    val childKeys = child.filter(col(childCol).isNotNull)
      .select(col(childCol).as("__k")).distinct()
    val parentKeys = parent.filter(col(parentCol).isNotNull)
      .select(col(parentCol).cast(child.schema(childCol).dataType).as("__k"))
      .distinct()
    val missing = childKeys.join(parentKeys, Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_missing"))
    childKeys.agg(count(lit(1)).as("n_child_distinct"))
      .crossJoin(missing)
      .select(col("n_child_distinct"), col("n_missing"),
        round(lit(1.0) - col("n_missing").cast("double") /
          col("n_child_distinct").cast("double"), 6).as("coverage"),
        (col("n_missing") === 0L).as("holds"))
  }

  /**
   * Exact-integer two-sample permutation test for a difference in
   * means (Fisher 1935; the randomization-inference workhorse) with a
   * CROSS-ENGINE-REPLICABLE permutation stream: replica b reorders
   * subjects by `md5(id || ':' || b)` — both engines produce the
   * identical lowercase-hex digest of the identical decimal-rendered
   * string, so the "random" relabelings are bit-equal in Spark and the
   * DuckDB oracle, and the whole test (not just its inputs) is
   * verifiable. The first n_A ranks of each replica take arm A,
   * preserving the observed group sizes (a permutation, not a
   * bootstrap).
   *
   * EXACTNESS: values quantize at `unitScale` (welchTTest convention);
   * because every permutation preserves the total sum S and the sizes
   * (n_A, n_B), |mean_A − mean_B| ≥ observed is EQUIVALENT to the pure
   * integer comparison |s_A·n_B − (S−s_A)·n_A| ≥ |s_Aobs·n_B −
   * (S−s_Aobs)·n_A| (both sides share the positive denominator
   * n_A·n_B) — the replica statistics are DECIMAL(38,0) integers and
   * the test has NO floating point until the final p = (1 + #{≥}) /
   * (reps + 1) division (round 6dp; the +1s are the standard
   * include-the-identity bias guard making p never 0). `mean_diff`
   * reports the observed difference, one IEEE chain, 6dp.
   *
   * Scale shape: the replicated frame is reps·N rows of (long, long,
   * string-hash) — ranked per replica by [[Ranking.withGroupedRank]]
   * (the chunked grouped rank: a replica is the canonical GIANT group,
   * every replica has N rows), then ONE map-side-combined aggregate to
   * reps rows and a single-row rollup. reps bounds the blowup
   * explicitly (default 199 ⇒ p resolution 0.005); at 100 TB you
   * permute a SAMPLE, not the corpus — the test's power saturates long
   * before N does.
   */
  def permutationTestMeanDiff(df: DataFrame, idCol: String,
                              valueCol: String, groupCol: String,
                              groupA: String, reps: Int = 199,
                              unitScale: Long = 100L): DataFrame = {
    require(reps >= 1, s"reps must be >= 1: $reps")
    require(unitScale >= 1, "unitScale must be >= 1")
    val dec = "decimal(38,0)"
    val base = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        round(col(valueCol) * unitScale).cast("long").as("u"),
        (col(groupCol).cast("string") === lit(groupA)).as("ga"))
      // moments, the replica fan-out, and the final readout all consume
      // this frame — cut once so they share one materialization, and
      // fan out: the replica explode multiplies per-row md5 work by
      // `reps`, so a single-split scan must not pin the whole rank map
      // side (sampling pass + shuffle write) to one core (measured:
      // 9.1 s + 2.4 s one-task stages at bench scale)
      .lineageCutFanout()
    val obs = base.agg(
      sum(when(col("ga"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("ga"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("ga"), col("u")).otherwise(0L)).cast(dec).as("sa_obs"),
      sum(col("u")).cast(dec).as("s_tot"))
      // fail loud when either arm is empty (absent groupA, or groupA is
      // universal): the mean_diff would be NaN/Infinity and every
      // permutation trivially "as extreme" (a vacuous p = 1) — the
      // house convention is to refuse, not to emit a plausible number
      .filter(when(coalesce(col("n_a"), lit(0L)) < 1L ||
          coalesce(col("n_b"), lit(0L)) < 1L,
        raise_error(lit("permutationTestMeanDiff: both arms must be " +
          "non-empty — groupA matched everything or nothing"))
          .cast("boolean"))
        .otherwise(lit(true)))
    val rep = base
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("mk",
        md5(concat(col("id").cast("string"), lit(":"),
          col("b").cast("string"))))
    // Some(true): groups = the reps replicas (cap-gated) — broadcast
    // stitch forced, auto mode's eager count job skipped
    val ranked = graft.operators.Ranking.withGroupedRank(
      rep.select("b", "id", "u", "mk"), "b",
      Seq(col("mk"), col("id")), "rk", "nn",
      broadcastOffsets = Some(true))
    val perRep = ranked
      .crossJoin(broadcast(obs.select(col("n_a").as("na0"))))
      .groupBy("b")
      .agg(sum(when(col("rk") <= col("na0"), col("u")).otherwise(0L))
        .cast(dec).as("sa"))
    val stat = (s: Column, na: Column, nb: Column, tot: Column) =>
      abs(s * nb.cast(dec) - (tot - s) * na.cast(dec))
    val counted = perRep
      .crossJoin(broadcast(obs))
      .select((stat(col("sa"), col("n_a"), col("n_b"), col("s_tot")) >=
        stat(col("sa_obs"), col("n_a"), col("n_b"), col("s_tot")))
        .as("ge"))
      .agg(sum(when(col("ge"), 1L).otherwise(0L)).as("n_ge"))
    obs.crossJoin(counted)
      .select(col("n_a"), col("n_b"), lit(reps).as("reps"),
        round(col("sa_obs").cast("double") /
          (col("n_a") * unitScale).cast("double") -
          (col("s_tot") - col("sa_obs")).cast("double") /
            (col("n_b") * unitScale).cast("double"), 6).as("mean_diff"),
        col("n_ge"),
        round((lit(1L) + col("n_ge")).cast("double") /
          lit((reps + 1).toDouble), 6).as("p_value"))
  }
}

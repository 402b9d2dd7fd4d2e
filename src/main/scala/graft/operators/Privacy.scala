package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Privacy-risk audits over tabular frames — the release-gate companion
 * to [[TextAnalysis]]'s PII census: PII regexes find identifiers INSIDE
 * text, while re-identification risk lives in the COMBINATION of
 * innocuous columns (Sweeney 2002: 87% of the US population is unique
 * on {zip, birth date, sex}). These operators quantify that risk before
 * a training corpus or derived table ships.
 *
 * Reference scope: the reference engine (simon-data/elastic-freight)
 * ships documents to an index verbatim and has no privacy surface; this
 * is mission-extension territory (training-data pipeline operators).
 */
object Privacy {

  /**
   * k-anonymity audit (Sweeney 2002): group rows by the quasi-identifier
   * columns and flag every equivalence class smaller than `k` — a row in
   * such a class is re-identifiable by anyone who knows its quasi values.
   * NULL quasi values form their own class (SQL grouping semantics; a
   * NULL zip is itself a linkable fact).
   *
   * EXACTNESS: one hash aggregate to exact long counts; `violates` is an
   * integer comparison. No IEEE anywhere.
   *
   * Scale shape: ONE shuffle on the quasi key with map-side combine; the
   * output is class-cardinality-sized (≪ rows for real quasi sets — if
   * the quasi set is near-unique per row, k-anonymity is already zero
   * and the audit's answer is the class count itself). No windows, no
   * driver state.
   *
   * Returns one row per equivalence class:
   * (quasi columns…, `class_size`, `violates`).
   */
  def kAnonymityClasses(df: DataFrame, quasiCols: Seq[String],
                        k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1L, s"k must be >= 1, got $k")
    val missing = quasiCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("violates", col("class_size") < lit(k))
  }

  /**
   * One-row k-anonymity summary over [[kAnonymityClasses]]: the dataset
   * IS k'-anonymous for k' = `min_class_size`, and `rows_at_risk` rows
   * sit in classes below the requested `k`. This is the gate form — a
   * release pipeline checks `rows_at_risk == 0`.
   *
   * EXACTNESS: exact longs end-to-end; `risk_ratio` is one IEEE division
   * rounded 6dp.
   *
   * Scale shape: the class aggregate (one shuffle) followed by a
   * single-row rollup — a second, class-cardinality-sized aggregate.
   */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       k: Long): DataFrame = {
    kAnonymityClasses(df, quasiCols, k).agg(
      sum("class_size").as("n_rows"),
      count(lit(1)).as("n_classes"),
      min("class_size").as("min_class_size"),
      sum(when(col("violates"), 1L).otherwise(0L)).as("n_violating_classes"),
      sum(when(col("violates"), col("class_size")).otherwise(0L))
        .as("rows_at_risk"))
      .select(col("n_rows"), col("n_classes"), col("min_class_size"),
        col("n_violating_classes"), col("rows_at_risk"),
        round(col("rows_at_risk").cast("double") /
          col("n_rows").cast("double"), 6).as("risk_ratio"))
  }

  /**
   * l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is not
   * enough when everyone in a class shares the same SENSITIVE value (the
   * "homogeneity attack" — knowing the quasi values reveals the secret
   * even without pinpointing the row). Per equivalence class this
   * reports both the distinct-l form (`distinct_sensitive` < l ⇒
   * violates) and the entropy form (entropy l-diversity requires
   * H(class) ≥ ln l; reported, not gated — the distinct form is the one
   * a release gate usually enforces).
   *
   * NULL sensitive values disclose nothing, so they are EXCLUDED from
   * `distinct_sensitive` and `entropy` — but the class itself is NEVER
   * dropped: `class_size` counts ALL rows of the class (NULL-sensitive
   * included), and a class whose every sensitive value is NULL
   * surfaces with `distinct_sensitive = 0`, NULL entropy, and
   * `violates = true` (0 < l), so a release gate iterating `violates`
   * always sees it. (Aggregating from the filtered frame instead would
   * silently drop all-NULL classes from the audit entirely.)
   *
   * EXACTNESS: distinct counting is EXACT — a two-level aggregate
   * ((quasi, sensitive) counts with NULL forming its own cell, then a
   * class rollup that gates the NULL cell out of the sensitive
   * statistics), never approx_count_distinct; `entropy` uses the
   * factored identity H = ln(n) − (Σ c·ln c)/n over the NON-NULL count
   * n, so the aggregate sums ONE double term per sensitive level (each
   * term derived from exact integer counts), rounded 4dp — the same
   * unordered-sum-of-level-terms contract
   * [[graft.functions.Text.charEntropy]] ships under (text_entropy).
   *
   * Scale shape: two shuffles — (quasi, sensitive) then quasi — both
   * map-side combined; no windows; output is class-sized. The
   * (quasi, sensitive) frame is the bigger of the two and is still
   * level-sized, not row-sized.
   *
   * Returns one row per class:
   * (quasi columns…, `class_size`, `distinct_sensitive`, `entropy`,
   * `violates`).
   */
  def lDiversityClasses(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1L, s"l must be >= 1, got $l")
    val missing = (quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    // NULL sensitive values form their own cell (groupBy keeps NULL as
    // a group) so class_size stays unfiltered; the rollup gates the
    // NULL cell out of the sensitive statistics — no join, no
    // null-unsafe quasi-key equality, same two shuffles
    val cells = df
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val sNotNull = col(sensitiveCol).isNotNull
    cells
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("class_size"),
        sum(when(sNotNull, 1L).otherwise(0L)).as("distinct_sensitive"),
        sum(when(sNotNull, col("__c")).otherwise(0L)).as("__n"),
        sum(when(sNotNull,
          col("__c").cast("double") * log(col("__c").cast("double"))))
          .as("__clnc"))
      .select((quasiCols.map(col) ++ Seq(
        col("class_size"), col("distinct_sensitive"),
        when(col("__n") > 0L,
          round(log(col("__n").cast("double")) -
            col("__clnc") / col("__n").cast("double"), 4))
          .as("entropy"),
        (col("distinct_sensitive") < lit(l)).as("violates"))): _*)
  }

  /**
   * t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
   * leg of the privacy trilogy: k-anonymity bounds re-identification,
   * l-diversity blocks the homogeneity attack, and t-closeness blocks
   * the SKEWNESS attack l-diversity still allows (a class with l
   * distinct sensitive values whose distribution is wildly unlike the
   * table's — e.g. 90% "positive" in a class vs 1% globally — leaks
   * almost as much as homogeneity). Per equivalence class this
   * reports the ORDERED-distance Earth Mover's Distance between the
   * class's sensitive distribution P and the whole table's Q:
   * t = Σ_i |cum(P−Q)_i| / (m−1) over the m global sensitive LEVELS in
   * value order (the paper's numeric/ordinal form; m = 1 ⇒ t = 0).
   * `violates` flags t > `tThreshold`.
   *
   * NULL sensitive values are excluded from BOTH distributions but the
   * class itself is never dropped ([[lDiversityClasses]]'s contract):
   * an all-NULL class reports NULL `t_value` and `violates = true` —
   * visible for review, not silently absent.
   *
   * EXACTNESS: level counts are exact longs (class×level and global);
   * p and q are single divisions; the cumulative P−Q runs as an
   * ORDERED window fold per class over its level-complete grid
   * (sequential in both engines), the |·| sum likewise; `t_value`
   * rounds 6dp.
   *
   * Scale shape: one (quasi, sensitive) aggregate + one sensitive
   * aggregate, then a CLASS × LEVEL grid (the full cross of class list
   * and global level list — zero cells must exist for the cumulative
   * walk; grid size = classes · levels, the audit's honest cost).
   * The grid is FAIL-LOUD gated at `maxGridCells` (the
   * [[graft.operators.Events]] `guardedSurvivalLevels` convention —
   * both input frames are lineage-cut and counted BEFORE the crossJoin
   * is planned; an unquantized continuous sensitive column makes
   * levels row-sized and the grid quadratic-ish, so the gate's escape
   * is quantize-the-sensitive-column-upstream). The two count jobs are
   * keys-only aggregates whose results feed the grid without a rescan.
   *
   * Degenerate input: an entirely-NULL sensitive column (zero levels)
   * emits one row per class with NULL `t_value` and `violates = true` —
   * the never-drop contract holds even when the grid would be empty,
   * so a [[graft.pipelines.CorpusPipeline]] t-closeness release gate
   * fails CLOSED, not silently open.
   *
   * Returns one row per class: (quasi columns…, `class_size`,
   * `t_value`, `violates`).
   */
  def tClosenessClasses(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String,
                        tThreshold: Double,
                        maxGridCells: Long = 10000000L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tThreshold > 0.0 && tThreshold < 1.0,
      s"tThreshold must be in (0,1): $tThreshold")
    require(maxGridCells >= 1, s"maxGridCells must be >= 1: $maxGridCells")
    val missing = (quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val sNotNull = col(sensitiveCol).isNotNull
    // class frame: TOTAL size + non-null sensitive count
    val classes = graft.core.LineageCut.cut(cells
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("class_size"),
        sum(when(sNotNull, col("__c")).otherwise(0L)).as("__nc")))
    // global sensitive levels with counts (non-null only)
    val levels = graft.core.LineageCut.cut(df.filter(sNotNull)
      .groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__gq")))
    val nClasses = classes.count()
    val nLevels = levels.count()
    if (nLevels == 0L) {
      // entirely-NULL sensitive column: no distribution to compare —
      // every class is the all-NULL case; surface them all, fail closed
      return classes.select((quasiCols.map(col) :+
        col("class_size") :+
        lit(null).cast("double").as("t_value") :+
        lit(true).as("violates")): _*)
    }
    // overflow-safe: nClasses * nLevels as a raw Long product can wrap
    // negative at ~3e9 x 3e9 (unquantized continuous sensitive columns
    // are exactly the hostile case) and sail past a <= compare
    require(nClasses <= maxGridCells / math.max(nLevels, 1L),
      s"tClosenessClasses: $nClasses classes x $nLevels sensitive " +
        s"levels exceeds " +
        s"maxGridCells=$maxGridCells — the EMD walk materializes the " +
        "full class-x-level grid; quantize the sensitive column " +
        "upstream (bucket continuous values) or raise maxGridCells " +
        "deliberately")
    val gTotals = levels.agg(sum("__gq").as("__gn"),
      count(lit(1)).as("__m"))
    val grid = classes.crossJoin(levels)
    val classCells = cells.filter(sNotNull)
      .select((quasiCols.map(col) :+ col(sensitiveCol).as("__v") :+
        col("__c").as("__cp")): _*)
    val joined = grid.join(classCells,
      quasiCols.map(c => grid(c) <=> classCells(c))
        .reduce(_ && _) && grid("__v") <=> classCells("__v"), "left")
      .select((quasiCols.map(grid(_)) ++ Seq(grid("__v"),
        col("class_size"), col("__nc"), col("__gq"),
        coalesce(col("__cp"), lit(0L)).as("__cp"))): _*)
    val wClass = Window.partitionBy(quasiCols.map(col): _*)
    val wRun = wClass.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = when(col("__nc") > 0L,
      col("__cp").cast("double") / col("__nc").cast("double") -
        col("__gq").cast("double") / col("__gn").cast("double"))
    val folded = joined.crossJoin(broadcast(gTotals))
      .withColumn("__cum", sum(diff).over(wRun))
      .withColumn("__acc", sum(abs(col("__cum"))).over(wRun))
      .withColumn("__rn", row_number().over(wClass.orderBy("__v")))
    val tRaw = when(col("__nc") > 0L,
      when(col("__m") > 1L,
        col("__acc") / (col("__m") - 1L).cast("double"))
        .otherwise(lit(0.0)))
    folded.filter(col("__rn") === col("__m"))
      .select((quasiCols.map(col) ++ Seq(col("class_size"),
        round(tRaw, 6).as("t_value"),
        (col("__nc") === 0L || coalesce(tRaw > tThreshold, lit(false)))
          .as("violates"))): _*)
  }

  /**
   * Group-fairness audit over a labeled + scored frame (Feldman et al.
   * 2015's disparate-impact framing; Hardt et al. 2016's equalized
   * odds) — the governance companion to the k-anonymity/l-diversity
   * audits: before a classifier gate ([[graft.operators.Classifier]])
   * or a quality cut prunes a training corpus, this reports WHO it
   * prunes. Per group: selection rate (`pred_rate`, the demographic-
   * parity quantity), base rate, TPR and FPR (the equalized-odds
   * pair), and `dp_ratio` = pred_rate / max-group pred_rate — the
   * four-fifths-rule readout (< 0.8 is the classic disparate-impact
   * flag; thresholding is the caller's policy call, so no boolean is
   * baked in).
   *
   * NULL group/label/pred rows are dropped (stated — an unknown group
   * can't be audited). Groups with no positives report NULL `tpr`; no
   * negatives, NULL `fpr`; an all-zero selection column reports NULL
   * `dp_ratio` everywhere.
   *
   * EXACTNESS: one keyed aggregate to exact long cells per group;
   * every rate is ONE division of exact longs; `dp_ratio` divides the
   * UNROUNDED rates (identical fixed chains in both engines) and
   * everything rounds 6dp at the end.
   *
   * Scale shape: one map-side-combined group aggregate, then ONE
   * unpartitioned max-window over the GROUP frame (group-count-sized —
   * the kaplanMeier level-frame class). The group frame is FAIL-LOUD
   * gated at `maxGroups` (the guardedSurvivalLevels convention): a
   * high-cardinality column passed as the protected attribute (a user
   * id, say) would make the max-window and every downstream
   * `.collect()` of the report row-sized — the gate's escape is
   * coarsen-the-attribute-upstream or raise `maxGroups` deliberately.
   * Output one row per group.
   */
  def fairnessReport(df: DataFrame, groupCol: String, labelCol: String,
                     predCol: String,
                     maxGroups: Long = 10000L): DataFrame = {
    require(maxGroups >= 1, s"maxGroups must be >= 1: $maxGroups")
    val missing = Seq(groupCol, labelCol, predCol)
      .filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    // the group column is renamed back over the fixed report columns —
    // a colliding name would produce a duplicate output column
    val fixed = Set("n", "base_rate", "pred_rate", "tpr", "fpr",
      "dp_ratio")
    require(!fixed.contains(groupCol),
      s"fairnessReport: groupCol '$groupCol' collides with a fixed " +
        s"report column (${fixed.mkString(", ")}); alias it upstream")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(groupCol).isNotNull && col(labelCol).isNotNull &&
        col(predCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(labelCol).cast("boolean").as("y"),
        col(predCol).cast("boolean").as("yh"))
    val g = graft.core.LineageCut.cut(base.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("yh"), 1L).otherwise(0L)).as("n_pred"),
      sum(when(col("y") && col("yh"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("y") && col("yh"), 1L).otherwise(0L)).as("fp")))
    val nGroups = g.count()
    require(nGroups <= maxGroups,
      s"fairnessReport: $nGroups protected groups exceeds " +
        s"maxGroups=$maxGroups — the max-window and the report " +
        "collect are group-frame-sized; a protected attribute is a " +
        "LOW-cardinality column, coarsen it upstream or raise " +
        "maxGroups deliberately")
    val predRate = col("n_pred").cast("double") / col("n").cast("double")
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    g.withColumn("__maxpr", max(predRate).over(wAll))
      .select(col("grp").as(groupCol), col("n"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("base_rate"),
        round(predRate, 6).as("pred_rate"),
        when(col("n_pos") > 0L,
          round(col("tp").cast("double") / col("n_pos").cast("double"), 6))
          .as("tpr"),
        when(col("n") - col("n_pos") > 0L,
          round(col("fp").cast("double") /
            (col("n") - col("n_pos")).cast("double"), 6)).as("fpr"),
        when(col("__maxpr") > 0.0, round(predRate / col("__maxpr"), 6))
          .as("dp_ratio"))
  }
}

package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Mixes, Splits, TextAnalysis}
import graft.core.LineageCut._

/**
 * Stage toggles for [[CorpusPipeline.prepare]] — the canonical
 * training-corpus preparation flow as ONE declarative plan. Every stage
 * is the exact operator the standalone queries gate individually; this
 * facade only fixes the composition order a crawl pipeline uses
 * (the C4/RefinedWeb chain):
 *
 *   URL dedup → blocklist cut (Bloom-gated) → boilerplate-line strip →
 *   exact dedup → quality/token
 *   gates → repeated-span removal → chunk dedup → LM perplexity gate →
 *   trigram backoff gate → classifier quality cut → near-dup dedupe →
 *   eval-set decontamination (LSH + exact 13-gram) → DSIR importance
 *   selection → target-share mixing → leakage-safe split
 *
 * Cheap, high-yield stages run first (URL and exact dedup shuffle
 * 8-16-byte keys; near-dup sketching then sees a smaller corpus; mixing
 * and splitting run on what survives). Text-REWRITING stages
 * (boilerplate, spans, chunks) run before near-dup sketching so
 * signatures see cleaned text; a document whose text empties out at any
 * rewriting stage is dropped (its content survives wherever the
 * keep-first copy lives).
 */
final case class CorpusPrepConfig(
    idCol: String = "doc_id",
    textCol: String = "text",
    /** Unicode NFC + control-strip + whitespace-collapse as stage 0
      * (before ANY hashing stage — composed-vs-decomposed forms and
      * stray control bytes otherwise make identical visible text hash
      * differently through every dedup that follows). Map-only codegen
      * ([[graft.operators.TextAnalysis.normalizeText]]); docs whose
      * text normalizes to empty are dropped. */
    normalizeText: Boolean = false,
    /** Column holding each document's source URL — enables stage 1. */
    urlCol: Option[String] = None,
    /** (blocklist, corpusKeyCol, blockKeyCol): drop every document whose
      * key (URL, domain, fingerprint — integral or string) appears in
      * the blocklist — the C4 bad-URL cut. Bloom-gated
      * ([[graft.operators.Sketches.bloomAntiJoin]]): the clean majority
      * of the corpus proves its absence map-side and never enters a
      * join, so the cut costs ~one scan at 100 TB. Runs immediately
      * after URL dedup (cheapest, highest-yield cuts first). */
    blocklist: Option[(DataFrame, String, String)] = None,
    /** Strip lines appearing in ≥ this many docs (C4 boilerplate rule). */
    boilerplateMinDocFreq: Option[Long] = None,
    exactDedup: Boolean = true,
    /** quality_score floor (TextAnalysis.withQuality semantics). */
    minQuality: Option[Double] = Some(0.5),
    /** Inclusive (min, max) token-count gate. */
    tokenRange: Option[(Long, Long)] = Some((5L, 10000L)),
    /** Remove corpus-wide repeated spans of this many tokens when set. */
    spanDedupTokens: Option[Int] = None,
    /** Keep-first chunk dedup at this chunk size when set. */
    chunkDedupTokens: Option[Int] = None,
    /** CCNet-style LM gate: self-train a bigram LM on the corpus as it
      * stands after the structural gates, then drop documents whose
      * add-one-smoothed perplexity exceeds this ceiling. */
    maxPerplexity: Option[Double] = None,
    /** Trigram stupid-backoff gate (Brants 2007): self-train an
      * order-1..3 model (hashed gram keys) and drop documents whose
      * mean negative log backoff score exceeds this many nats. */
    maxBackoffCe: Option[Double] = None,
    /** (exemplars, minLogOdds): supervised quality cut — label the
      * corpus by membership in the exemplar frame (CCNet's "looks like
      * Wikipedia" classifier), train the NB bag-of-n-grams model, keep
      * documents scoring >= minLogOdds. */
    classifierTarget: Option[(DataFrame, Double)] = None,
    /** (target, k): DSIR importance resampling (Xie 2023) — keep the
      * Gumbel-top-k documents whose n-gram distribution best matches
      * the target frame. Runs after decontamination, before mixing. */
    importanceTarget: Option[(DataFrame, Int)] = None,
    /** Near-dup dedupe at this exact-Jaccard threshold when set. */
    nearDupThreshold: Option[Double] = None,
    /** (n, minOverlap): ALSO drop docs sharing ≥ minOverlap exact
      * word n-grams with any eval set (the GPT-3/PaLM 13-gram rule),
      * on top of the always-on LSH decontamination pass. */
    ngramDecontamination: Option[(Int, Int)] = None,
    /** (stratumCol, weights): downsample to target shares when set. */
    targetShares: Option[(String, Map[String, Double])] = None,
    /** Split weights: adds a leakage-safe `split` column when set. */
    splitWeights: Option[Seq[(String, Double)]] = None,
    /** (quasiCols, k): k-anonymity RELEASE GATE — after every content
      * stage, [[CorpusPipeline.prepare]] audits the SURVIVORS with
      * [[graft.operators.Privacy.kAnonymityReport]] and REFUSES
      * (`IllegalStateException` carrying the audit counters) to return
      * a corpus with any quasi-identifier class smaller than k. The
      * mission-coherent form of the standalone audit: a release
      * pipeline must not emit a training corpus whose audit fails. */
    releaseKAnonymity: Option[(Seq[String], Long)] = None,
    /** (quasiCols, sensitiveCol, l): the l-diversity companion gate —
      * refuses when any class carries fewer than l distinct NON-NULL
      * sensitive values (an all-NULL class audits as 0 and refuses;
      * [[graft.operators.Privacy.lDiversityClasses]] semantics). */
    releaseLDiversity: Option[(Seq[String], String, Long)] = None,
    /** (quasiCols, sensitiveCol, t): t-closeness companion gate —
      * refuses when any class's ordered-EMD distance from the table's
      * sensitive distribution exceeds t (the skewness attack
      * l-diversity still allows; [[graft.operators.Privacy
      * .tClosenessClasses]] semantics, all-NULL classes flagged). */
    releaseTCloseness: Option[(Seq[String], String, Double)] = None,
    /** Declarative expectation battery
      * ([[graft.operators.Quality.checkExpectations]]) run as a
      * release gate — refuses when ANY rule fails, the message
      * carrying per-rule violation counters. Empty = no gate. */
    releaseExpectations: Seq[graft.operators.Quality.Expectation] = Nil,
    /** (groupCol, minDpRatio): group-fairness RELEASE GATE — the
      * four-fifths rule (Feldman et al. 2015) over WHO the pipeline
      * pruned: selection = survival of the full stage chain relative
      * to the INPUT frame, audited per protected group with
      * [[graft.operators.Privacy.fairnessReport]] (label := selection,
      * so only the label-free demographic-parity columns carry
      * signal); refuses when any group's selection rate falls below
      * `minDpRatio` × the max group's rate (0.8 = the classic
      * four-fifths flag). The group column must exist on the INPUT
      * frame; NULL-group rows are outside the audit (the
      * fairnessReport contract). */
    releaseFairness: Option[(String, Double)] = None,
    seed: Long = 42L)

object CorpusPipeline {

  /**
   * Run the configured stages over `df`; `evalSets` are decontamination
   * references (train/test leakage removal) applied after near-dup
   * dedupe. Returns the surviving rows with the original columns (plus
   * `split` when `splitWeights` is set). Disabled stages cost nothing —
   * the plan simply omits them.
   */
  def prepare(df: DataFrame, cfg: CorpusPrepConfig,
              evalSets: Seq[DataFrame] = Nil): DataFrame = {
    var cur = df
    // swap `textCol` for a (idCol, clean_text) frame's cleaned text,
    // preserving the input column order; docs whose text emptied out are
    // dropped (their content survives at the keep-first copy)
    def replaceText(base: DataFrame, cleaned: DataFrame): DataFrame = {
      val cols = base.columns
      base.join(cleaned.select(col(cfg.idCol), col("clean_text")),
          Seq(cfg.idCol))
        .select(cols.map(c =>
          if (c == cfg.textCol) col("clean_text").as(c) else col(c)): _*)
        .filter(length(trim(col(cfg.textCol))) > 0)
    }
    if (cfg.normalizeText) {
      cur = cur
        .withColumn(cfg.textCol, TextAnalysis.normalizeText(col(cfg.textCol)))
        .filter(length(col(cfg.textCol)) > 0)
    }
    cfg.urlCol.foreach { u =>
      cur = TextAnalysis.dedupByUrl(cur, cfg.idCol, u)
    }
    cfg.blocklist.foreach { case (block, keyCol, blockKeyCol) =>
      cur = graft.operators.Sketches.bloomAntiJoin(cur, block, keyCol, blockKeyCol)
    }
    cfg.boilerplateMinDocFreq.foreach { f =>
      cur = TextAnalysis.stripBoilerplate(cur, cfg.idCol, cfg.textCol, f)
        .filter(length(trim(col(cfg.textCol))) > 0)
    }
    if (cfg.exactDedup) {
      // exactScalable returns only (id, text, dup_count); the facade's
      // contract is the input schema (+ split), so keep the survivors by
      // semi-joining their ids — every input column rides through
      val keep = Dedup.exactScalable(cur, cfg.textCol, cfg.idCol)
        .select(col(cfg.idCol).as("__keep_exact"))
      cur = cur.join(keep, col(cfg.idCol) === col("__keep_exact"), "left_semi")
    }
    if (cfg.minQuality.isDefined || cfg.tokenRange.isDefined) {
      val cols = cur.columns
      var q = TextAnalysis.withQuality(cur, cfg.textCol)
      cfg.minQuality.foreach(m => q = q.filter(col("quality_score") >= m))
      cfg.tokenRange.foreach { case (lo, hi) =>
        q = q.filter(col("q_tokens").between(lo, hi)) }
      cur = q.select(cols.head, cols.tail: _*)
    }
    cfg.spanDedupTokens.foreach { k =>
      cur = replaceText(cur,
        Dedup.removeRepeatedSpans(cur, cfg.idCol, cfg.textCol, k))
    }
    cfg.chunkDedupTokens.foreach { k =>
      cur = replaceText(cur,
        Dedup.dedupChunks(cur, cfg.idCol, cfg.textCol, k))
    }
    cfg.maxPerplexity.foreach { ceiling =>
      // self-perplexity: the corpus that survived the structural gates is
      // its own LM training slice (CCNet trains on a clean reference; at
      // 100 TB pass a sampled slice by training outside the facade and
      // filtering with LangModel.perplexityFilter directly). The gate
      // reads `cur` several times (train + score + keep-join); an eager
      // checkpoint stops the upstream stage chain replaying per read.
      cur = cur.lineageCut()
      // A slice whose every surviving text emptied out has nothing to
      // train on — and nothing to gate (empty docs are kept by the
      // gate's own semantics). Skip rather than fail the whole pipeline
      // on scorePerplexity's empty-model guard.
      if (!cur.where(length(trim(col(cfg.textCol))) > 0).isEmpty)
        cur = graft.operators.LangModel.perplexityFilter(
          cur, cur, cfg.idCol, cfg.textCol, ceiling)
    }
    cfg.maxBackoffCe.foreach { ceiling =>
      // same self-train shape (and the same empty-slice skip) as the
      // perplexity gate, one model order up
      cur = cur.lineageCut()
      if (!cur.where(length(trim(col(cfg.textCol))) > 0).isEmpty)
        cur = graft.operators.LangModel.backoffFilter(
          cur, cur, cfg.idCol, cfg.textCol, ceiling)
    }
    cfg.classifierTarget.foreach { case (exemplars, minLogOdds) =>
      // fail-loud by design: an exemplar set disjoint from (or covering)
      // the corpus trains no two-class model — trainNaiveBayes raises
      cur = graft.operators.Classifier.classifierFilter(
        cur, exemplars, cfg.idCol, cfg.textCol, minLogOdds)
    }
    cfg.nearDupThreshold.foreach { t =>
      cur = Dedup.dedupe(cur, cfg.idCol, cfg.textCol, jaccardThreshold = t)
    }
    evalSets.foreach { ev =>
      cur = Dedup.decontaminate(cur, ev, cfg.idCol, cfg.textCol)
      cfg.ngramDecontamination.foreach { case (n, minOverlap) =>
        val flagged = Dedup.ngramOverlapFlags(cur, ev, cfg.idCol,
            cfg.textCol, n, minOverlap)
          .select(col(cfg.idCol).as("__ngram_flagged"))
        cur = cur.join(flagged,
          col(cfg.idCol) === col("__ngram_flagged"), "left_anti")
      }
    }
    cfg.importanceTarget.foreach { case (target, k) =>
      cur = graft.operators.DataSelection.selectByImportance(
        cur, target, cfg.idCol, cfg.textCol, k, cfg.seed)
    }
    cfg.targetShares.foreach { case (stratumCol, weights) =>
      // token count as the mixing cost — the unit training runs budget
      // in. NOT a __-prefixed name: Mixes reserves that whole prefix for
      // itself and rejects such input columns.
      require(!cur.columns.contains("graft_mix_cost"),
        "column graft_mix_cost is reserved here")
      val cols = cur.columns
      cur = Mixes.toTargetShares(
        cur.withColumn("graft_mix_cost",
          TextAnalysis.tokenCount(col(cfg.textCol)).cast("long")),
        cfg.idCol, stratumCol, "graft_mix_cost", weights, cfg.seed)
        .select(cols.head, cols.tail: _*)
    }
    cfg.splitWeights.foreach { w =>
      cur = Splits.assignLeakageSafe(cur, cfg.idCol, cfg.textCol, w,
        salt = cfg.seed)
    }
    // RELEASE GATES — the refusal layer: the audits run over the FINAL
    // survivor frame (after every content stage and the split), and a
    // failing audit throws instead of returning a frame the caller
    // could accidentally write. Each audit is one-or-two keyed
    // aggregates collapsing to a bounded summary (one row, or one row
    // per rule) — nothing row-proportional reaches the driver. The
    // lineage cut makes the audits and the returned frame share one
    // materialization instead of replaying the whole stage chain per
    // audit.
    val anyGate = cfg.releaseKAnonymity.isDefined ||
      cfg.releaseLDiversity.isDefined || cfg.releaseTCloseness.isDefined ||
      cfg.releaseExpectations.nonEmpty || cfg.releaseFairness.isDefined
    if (anyGate) {
      cur = cur.lineageCut()
      cfg.releaseKAnonymity.foreach { case (quasi, k) =>
        val r = graft.operators.Privacy.kAnonymityReport(cur, quasi, k)
          .select(coalesce(col("n_rows"), lit(0L)).as("a"),
            coalesce(col("n_classes"), lit(0L)).as("b"),
            coalesce(col("n_violating_classes"), lit(0L)).as("c"),
            coalesce(col("rows_at_risk"), lit(0L)).as("d"))
          .collect().head
        if (r.getLong(2) > 0L)
          throw new IllegalStateException(
            s"release gate k-anonymity(k=$k, quasi=${quasi.mkString(",")}) " +
              s"REFUSED: ${r.getLong(2)} of ${r.getLong(1)} classes " +
              s"below k (${r.getLong(3)} of ${r.getLong(0)} rows at " +
              "risk) — generalize or suppress the quasi-identifiers " +
              "before release")
      }
      cfg.releaseLDiversity.foreach { case (quasi, sens, l) =>
        val v = graft.operators.Privacy
          .lDiversityClasses(cur, quasi, sens, l)
          .agg(count(lit(1)).as("__nc"),
            coalesce(sum(when(col("violates"), 1L).otherwise(0L)), lit(0L))
              .as("__nv"),
            coalesce(sum(when(col("violates"), col("class_size"))
              .otherwise(0L)), lit(0L)).as("__rows"))
          .collect().head
        if (v.getLong(1) > 0L)
          throw new IllegalStateException(
            s"release gate l-diversity(l=$l, quasi=${quasi.mkString(",")}, " +
              s"sensitive=$sens) REFUSED: ${v.getLong(1)} of " +
              s"${v.getLong(0)} classes below l " +
              s"(${v.getLong(2)} rows at risk) — a homogeneous class " +
              "leaks the sensitive value even when k-anonymous")
      }
      cfg.releaseTCloseness.foreach { case (quasi, sens, t) =>
        val v = graft.operators.Privacy
          .tClosenessClasses(cur, quasi, sens, t)
          .agg(count(lit(1)).as("__nc"),
            coalesce(sum(when(col("violates"), 1L).otherwise(0L)), lit(0L))
              .as("__nv"),
            coalesce(sum(when(col("violates"), col("class_size"))
              .otherwise(0L)), lit(0L)).as("__rows"))
          .collect().head
        if (v.getLong(1) > 0L)
          throw new IllegalStateException(
            s"release gate t-closeness(t=$t, quasi=${quasi.mkString(",")}, " +
              s"sensitive=$sens) REFUSED: ${v.getLong(1)} of " +
              s"${v.getLong(0)} classes exceed the distance bound " +
              s"(${v.getLong(2)} rows at risk) — a skewed class leaks " +
              "the sensitive distribution even when l-diverse")
      }
      cfg.releaseFairness.foreach { case (grp, minRatio) =>
        require(df.columns.contains(grp),
          s"releaseFairness group column '$grp' not in the input frame")
        require(minRatio > 0.0 && minRatio <= 1.0,
          s"releaseFairness minDpRatio must be in (0,1]: $minRatio")
        // selection = survived-the-chain, per INPUT row: one id-keyed
        // left join of the input's (group, id) pairs against the
        // survivor ids, then the shared fairness audit (one keyed
        // aggregate) — only violating GROUPS reach the driver
        val keptIds = cur.select(col(cfg.idCol).as("__kept_id")).distinct()
        val labeled = df.select(col(grp), col(cfg.idCol).as("__in_id"))
          .join(keptIds, col("__in_id") === col("__kept_id"), "left")
          .select(col(grp), col("__kept_id").isNotNull.as("__kept"))
          .withColumn("__lbl", col("__kept"))
        // FAIL CLOSED on NULL dp_ratio: when every group's selection
        // rate is 0 (entire corpus pruned) fairnessReport emits NULL
        // dp_ratio for all groups — a `< minRatio` filter alone would
        // pass a fully-empty release silently
        val bad = graft.operators.Privacy
          .fairnessReport(labeled, grp, "__lbl", "__kept")
          .filter(col("dp_ratio").isNull || col("dp_ratio") < minRatio)
          .select(col(grp).cast("string").as("g"), col("pred_rate"),
            col("dp_ratio"))
          .collect() // fairnessReport gates group cardinality fail-loud
        if (bad.nonEmpty)
          throw new IllegalStateException(
            s"release gate fairness(group=$grp, minDpRatio=$minRatio) " +
              "REFUSED: " + bad.map(r => s"${r.getString(0)} selected " +
                s"at ${r.get(1)} (dp_ratio ${r.get(2)})").mkString("; ") +
              " — the content gates prune this group disproportionately" +
              " (four-fifths rule; a NULL dp_ratio means NO group was" +
              " selected at all); rebalance the gates or the corpus" +
              " before release")
      }
      if (cfg.releaseExpectations.nonEmpty) {
        val failed = graft.operators.Quality
          .checkExpectations(cur, cfg.releaseExpectations)
          .filter(!col("pass"))
          .select("rule", "violations")
          .collect() // rule-count-sized by construction
        if (failed.nonEmpty)
          throw new IllegalStateException(
            "release gate expectations REFUSED: " + failed.map(r =>
              s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
      }
    }
    cur
  }
}

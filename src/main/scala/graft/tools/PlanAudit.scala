package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for headline queries into PLANS.md —
  * the plan-quality evidence trail (pushdown, pruning, broadcast,
  * WholeStageCodegen spans). Re-run after plan-affecting changes. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audited = Seq(
      "ef_ingest_ids", "q1_pricing", "q3_revenue_by_nation", "q_topk_orders",
      "dedup_minhash", "dedup_embedding_lsh", "decontaminate", "ann_topk",
      "ann_lsh", "text_quality", "ef_partition_placement",
      "q_asof_join", "q_range_join", "q_sample", "q_skew_join", "text_ngrams",
      "text_repetition", "q_pack_sequences", "q_domain_mix",
      "q_interval_join", "dedup_chunk", "q_zorder", "text_entropy",
      "q_batch_by_length", "q_pack_curriculum", "training_set_assemble",
      "dedup_spans", "dedup_incremental", "dedup_url", "semantic_dedup",
      "split_leakage_safe", "ann_ivf_pq", "ann_ivf_hier",
      "text_perplexity", "data_select_dsir", "text_backoff",
      "text_backoff_hashed", "text_kneser_ney", "text_classify",
      "mm_feature_ann", "q_frequent_items", "q_bloom_semijoin", "q_pagerank",
      "q_bloom_antijoin", "q_frequent_terms", "q_bloom_index",
      "q_skew_join_adaptive", "q_pagerank_dangling", "training_corpus_build",
      "q_temperature_mix", "q_hard_negatives", "text_chunks",
      "text_normalize", "ann_sq", "dedup_winnow", "q_mad_outliers",
      "dedup_edit_verify", "q_profile", "dedup_winnow_pipeline", "q_hits",
      "q_connected_components", "q_triangles", "q_kcore", "q_corpus_diff",
      "q_winsorize", "q_histogram", "q_histogram_depth", "q_corr",
      "q_skew_report", "q_pca_scores", "q_sample_weighted_topk",
      "text_tfidf", "q_join_size_estimate", "dedup_simjoin", "q_funnel",
      "q_bfs", "q_label_prop", "q_ppr", "q_retention", "q_attribution",
      "q_transitions", "q_scd2", "q_resample_fill", "q_rolling_zscore",
      "q_time_weighted", "dedup_jw_verify", "q_sssp", "text_pmi",
      "q_psi", "q_session_paths", "text_postings",
      "q_clustering_coeff", "q_cramers_v", "q_upsample_mix",
      "q_neighbor_agg", "q_mutual_info", "q_conversion_latency",
      "q_balance_classes", "q_hll_intersect", "q_ktruss",
      "q_interval_coverage", "q_sample_diversity", "q_kfold", "q_rfm",
      "q_assortativity", "text_kwic", "text_readability", "q_pareto", "q_benford", "q_fd_check",
      "q_corpus_jaccard", "dedup_winnow_incremental",
      "q_link_predict", "q_modularity", "q_ewma", "q_changepoint",
      "text_keywords", "q_assoc_rules", "q_transitivity", "q_ab_test",
      "q_harmonic", "q_standardize", "text_divergence", "text_zipf",
      "q_vector_cov", "dedup_containment", "q_rrf_fusion",
      "dedup_sorted_neighborhood", "dedup_editjoin", "q_seasonal",
      "q_kappa", "q_rank_test", "q_spearman", "q_ks_test", "q_gini_split",
      "q_auc", "q_kruskal", "q_anova", "q_calibration", "q_kendall",
      "q_quantile_norm", "q_chi2_tokens", "q_seq_patterns", "q_heaps",
      "q_textrank", "q_mcnemar", "q_ess", "q_spearman_matrix",
      "q_mi_binned", "q_pr_curve", "q_lift", "q_brier", "q_conformal", "q_silhouette", "q_ann_recall", "q_conformal_group",
      "ann_ivf_rebuild", "dedup_substring", "q_krippendorff", "text_pii",
      "text_pii_redact", "text_bm25_multi", "q_fs_weights", "q_fs_score",
      "q_hybrid_multi", "q_quantile_gate", "text_bm25_index", "q_fs_em",
      "text_lm_dirichlet", "q_cohens_d", "q_cliffs_delta",
      "q_entity_clusters", "q_kaplan_meier", "q_cochran_q", "q_friedman",
      "q_rank_eval", "q_acf", "q_ljung_box", "q_lsh_plan", "q_wilson",
      "q_linear_fit", "text_ttr", "q_centroid_drift", "text_bm25_append",
      "text_lm_index", "q_theil_sen",
      "q_logrank", "q_odds_ratio", "q_fisher_exact", "q_bh_fdr",
      "q_ind_check", "q_perm_test", "q_k_anonymity", "q_l_diversity",
      "q_bitext_mine", "text_skipgrams", "q_mmd_drift", "q_nelson_aalen",
      "q_rbo", "q_ccf", "text_dimsum", "q_expectations", "q_markov_attr",
      "q_shapley_attr", "q_storey_q", "q_blocking_quality",
      "q_shapley_sampled", "q_km_ci", "q_rmst", "q_pettitt",
      "text_burstiness", "q_js_divergence", "q_fairness",
      "q_psi_profile", "q_dsir_ess", "training_corpus_gated",
      "text_rm3", "q_t_closeness", "q_jarque_bera", "q_durbin_watson",
      "q_brown_forsythe", "q_granger", "q_ece", "q_cvm_test",
      "text_rm3_index", "training_corpus_fair", "q_granger_p",
      "q_anderson_darling", "q_mann_kendall", "q_cusum",
      "q_brier_decomp", "q_cuped", "q_srm", "q_did", "q_bootstrap",
      "q_bootstrap_diff", "q_cuped_ttest", "q_sequential",
      "q_mann_kendall_seasonal", "q_holm", "q_icc_deff", "q_eb_shrink",
      "q_yuen", "q_mde", "q_ratio_metric", "q_event_study",
      "q_poststrat", "q_paired_t", "q_two_prop")

    val sb = new StringBuilder
    sb ++= "# PLANS — physical-plan audit (generated by graft.tools.PlanAudit)\n\n"
    sb ++= s"Scale dir: `$sfDir`. What to look for: `PushedFilters` reaching\n"
    sb ++= "the scan, pruned `ReadSchema`, `BroadcastHashJoin` for small dims,\n"
    sb ++= "wide `WholeStageCodegen` spans (custom expressions stay inside),\n"
    sb ++= "and exactly one `Exchange` per required clustering.\n"

    for (name <- audited) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= s"\n## $name\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plan-audit] wrote PLANS.md (${audited.size} plans)")
    spark.stop()
  }
}

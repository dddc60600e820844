"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (TPC-H-Q1-style pricing summary) at sf0.001.
queries()      -> every implemented operator from SURVEY.md §2 (registry).
oracle_sql()   -> the DuckDB twin for each query (None-oracle entries are
                  omitted -> driver records rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from py_pubsub_pipeline_spark.registry import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from py_pubsub_pipeline_spark.queries.aggregates import pricing_summary

    return pricing_summary(spark, _SF0001)


# The driver records CORRECTNESS rows for roughly the first 50 keys of
# queries() per round.  _DRIVER_RECORDED is the literal union of the
# GREEN key sets in CORRECTNESS_r01/r02/r03.json (148 keys).
# Enumeration order: (1) keys still owed a green driver record — the 5
# never recorded plus pack_sequences (r03 hash-red from an oracle
# typing bug, fixed this round — it needs a re-record); (2) keys first
# registered in round 4 (_R4_NEW — append every new key here!); (3) the
# already-recorded greens.
_DRIVER_RECORDED = frozenset({
    # --- CORRECTNESS_r01.json ---
    "agg_approx", "agg_collect", "agg_cube", "agg_distinct",
    "agg_filter_clause", "agg_global", "agg_group", "agg_groupingsets",
    "agg_having", "agg_minmax_by", "agg_rollup", "agg_stats", "case_when",
    "filter_between_like", "filter_null", "filter_pred", "fn_array",
    "fn_bitwise", "fn_cast", "fn_date", "fn_map_json", "fn_math",
    "fn_misc", "fn_string", "join_anti", "join_broadcast", "join_cross",
    "join_full", "join_inner", "join_left", "join_multiway", "join_semi",
    "join_theta", "limit_topk", "project_arith", "scan_parquet",
    "scan_projection_pushdown", "set_except", "set_intersect",
    "set_union_all", "set_union_byname", "set_union_distinct",
    "sort_multi", "win_analytic", "win_dist", "win_frame_range",
    "win_frame_rows", "win_rank", "win_time_range", "win_topk_per_group",
    # --- CORRECTNESS_r02.json (agg_approx re-recorded there too) ---
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "join_interval_attrib", "join_asof", "text_tokens", "text_lang_stats",
    "text_quality", "text_langid", "text_fingerprint", "text_token_count",
    "text_rolling_hash", "text_normalize", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "sim_topk", "sim_pairs_cosine", "sim_lsh_bucketed", "dedup_embedding",
    "sim_ivf", "mm_binary_meta", "mm_decode_featurize", "subq_scalar",
    "subq_in", "subq_correlated", "pivot_sum", "unpivot_stack",
    "agg_percentile", "fn_explode_pos", "fn_string_regex",
    "udf_pandas_scalar", "udaf_grouped_pandas", "udtf_map_batches",
    "udtf_lateral", "tpch_q3", "tpch_q10", "tpch_q18", "tpch_q5",
    "tpch_q14", "agg_skew_salted", "join_skew_salted", "dedup_cc",
    "sample_hash", "split_train_test", "profile_stats", "sessionize_gaps",
    # --- CORRECTNESS_r03.json greens (pack_sequences excluded: its r03
    # row was hash-red from a DuckDB HUGEINT-vs-BIGINT oracle typing
    # bug, fixed in round 4 — keep it tier 1 until re-recorded) ---
    "agg_mode", "join_bucketed", "join_range_band", "fn_try",
    "stream_topk_windowed", "join_asof_forward", "text_tfidf",
    "text_er_blocked", "text_repetition", "dedup_substring",
    "dedup_ngram_capped", "emb_quantize_int8", "sim_adc_int8",
    "mm_png_decode", "mm_audio_decode", "subq_lateral", "agg_weighted",
    "tpch_q2", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q16",
    "tpch_q17", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "graph_triangles", "dedup_canonical", "graph_pagerank",
    "agg_histogram", "dq_checks", "sample_stratified",
    "ts_resample_ohlc", "ts_bucket_gapfill", "cdc_latest_state",
    "scd2_intervals", "funnel_conversion", "retention_cohorts",
    "decontaminate_ngram", "text_pii_redact", "sample_balanced",
    "scan_jsonl",
})


# Keys first registered in round 4: enumerate after the backlog (which
# must drain first) but before the recorded greens.
_R4_NEW = frozenset({
    "shuffle_deterministic", "mix_domain_weights", "quantile_bucketize",
    "corr_matrix", "text_winnow", "scan_orc", "agg_sketch_rollup",
    "text_html_strip", "dedup_url_normalize", "graph_label_prop",
    "dedup_paragraph", "subq_recursive_cte", "agg_bitmap_rollup",
    "fn_variant", "fn_xml", "fn_collate", "ml_kmeans_train", "ts_ewma",
    "quality_gate", "join_asof_nearest", "bm25_score", "rank_fusion_rrf",
    "feature_hashing", "text_perplexity_lm", "win_rolling_distinct",
    "ts_anomaly_zscore", "ml_linreg_ols", "mm_video_framesample",
    "join_bloom_prefilter", "cdc_apply_merge", "ts_gapfill_linear",
    "agg_countmin_topk", "win_streaks", "join_asof_tolerance",
    "sample_importance", "agg_bitmap_intersect", "scan_binaryfile",
    "ml_knn_classify", "ml_naive_bayes", "join_interval_outer",
    "dq_drift_psi", "win_rolling_median", "join_scd2_pit",
    "fn_explode_outer", "join_null_safe", "dedup_minhash_estimate",
    "scan_schema_evolution", "text_pseudonymize", "ts_lagged_corr",
    "dedup_containment", "ts_change_detect", "dedup_span_fraction",
    "agg_means_family", "agg_entropy", "agg_gini_lorenz",
    "sample_reservoir", "privacy_k_anonymity", "text_zipf_slope",
    "join_fuzzy_levenshtein", "ts_outlier_mad", "graph_degree_stats",
    "mix_token_budget", "ml_decision_stump", "win_skyline_pareto",
    "mm_image_dedup_ahash", "scan_csv_permissive", "ts_concurrency_peak",
    "agg_kmv_theta", "text_novelty_rate", "ts_stickiness_dau_mau",
    "win_event_transitions", "ml_logreg_irls", "agg_bootstrap_se",
    "agg_market_basket", "ts_interarrival_stats", "graph_kcore_peel",
    "agg_rfm_segments", "ml_langid_confusion", "dq_benford_digits",
    "agg_weighted_median", "ts_disorder_ratio", "ts_bounce_rate",
    "agg_ratio_delta_method", "text_stem_suffix", "graph_adamic_adar",
    "fn_business_days", "ts_survival_km", "emb_pca_power",
    "retention_ltv_curve", "dq_freshness", "ml_crossval_ols",
    "win_max_drawdown", "agg_revenue_concentration", "graph_modularity",
    "agg_eb_shrunk_rates", "scan_csv_multiline", "agg_trimmed_mean",
    "sample_neyman_allocation", "subq_bom_rollup", "agg_ab_ztest",
    "agg_mann_whitney", "ts_theil_sen", "ml_cohens_kappa",
    "ts_fano_factor", "agg_chi_square", "agg_spearman_rho",
    "agg_var_es", "ts_littles_law", "text_vocab_coverage",
    "retention_growth_accounting", "dq_simpsons_paradox",
    "agg_herfindahl_index", "ml_gains_lift", "text_term_burstiness",
    "ml_auc_roc", "agg_ks_test", "scan_wholetext", "agg_power_mde",
    "ts_outage_windows", "win_interval_coalesce", "ts_seasonal_index",
    "graph_clustering_coeff", "agg_extreme_value_gumbel",
    "agg_covariate_balance", "text_jsd_vs_corpus", "agg_cuped",
    "ts_forecast_baseline_wape", "dedup_skeleton",
    "agg_price_volume_bridge", "agg_abc_classification",
    "dq_heartbeat_completeness", "agg_parallel_trends",
    "text_pmi_collocations", "agg_diff_in_diff", "ts_mann_kendall",
    "ts_process_capability", "text_yule_k", "ts_runs_test",
    "ml_brier_decomposition", "dedup_sorted_neighborhood",
    "agg_sprt_sequential", "dedup_golden_record",
    "ts_markov_entropy_rate", "ml_shapley_r2", "fn_calendar_spine",
    "dq_volume_anomaly", "ts_seasonal_strength",
    "fn_rounding_mode_audit", "ts_peak_detection",
    "dedup_phonetic_block", "win_rolling_corr",
    "ts_changepoint_binseg", "scan_recursive_lookup",
    "ml_average_precision", "agg_median_ci", "ts_dominant_period",
    "agg_hill_tail_index", "ml_cost_curve", "dq_label_consistency",
    "graph_assortativity", "ml_bpe_pair_counts", "ml_tokenizer_fertility",
    "text_kneser_ney", "fn_geo_haversine", "fn_ip_cidr",
    "ml_target_encode", "text_readability", "scan_jsonl_corrupt",
    "ts_cusum", "ml_ndcg", "fn_luhn_checksum", "dedup_incremental",
    "scan_file_lineage", "cdc_debezium_envelope", "emb_norm_stats",
    "agg_heavy_hitters_bounds", "decontaminate_fuzzy", "dq_join_fanout",
    "graph_hits", "ml_woe_binning", "ts_downsample_m4",
    "fn_base64_roundtrip", "privacy_l_diversity",
    "scan_partition_overwrite", "dq_table_diff", "mix_packing_efficiency",
    "ts_wavelet_haar", "dq_sequence_gaps", "scan_csv_column_order",
    "ml_item_cf", "text_homoglyph_normalize", "ts_sax_motifs",
    "text_rake_keywords", "ts_hurst_exponent", "dedup_cdc_chunks",
    "agg_raking_ipf", "mix_preference_pairs", "agg_benjamini_hochberg",
    "win_journey_paths", "agg_hill_diversity", "scan_manifest_snapshot",
    "dq_format_profile", "mm_audio_energy_zcr", "ts_spectral_entropy",
    "scan_time_travel", "ts_granger_lite", "dq_cross_field_consistency", "text_burrows_delta",
    "ts_newey_west_se", "ml_uplift_tlearner", "ml_conformal_interval", "dq_partition_checksums",
    "win_time_weighted_avg", "graph_katz", "text_fightin_words",
    "ts_ljung_box", "fn_fiscal_445", "agg_ab_srm_check",
    "ml_learning_curve", "ml_class_weights", "agg_attribution_models",
})

# _DRIVER_RECORDED reflects the CORRECTNESS artifacts through this
# round number; tests derive the expected set from those artifacts
# (bump this when folding a new round's records in).
_RECORDED_THROUGH = 3


def _ordered():
    specs = load_all()
    tier1 = [n for n in specs
             if n not in _DRIVER_RECORDED and n not in _R4_NEW]
    tier2 = [n for n in specs if n in _R4_NEW]
    tier3 = [n for n in specs if n in _DRIVER_RECORDED]
    return {n: specs[n] for n in tier1 + tier2 + tier3}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checked query."""
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }

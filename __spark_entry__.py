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
# GREEN key sets in CORRECTNESS_r01..r12.json, intersected with the
# live registry — 446 recorded-green keys (442 after the round-12
# retirement of the two _parts DP diagnostics, plus the four round-12
# additions recorded green in r12; r11 was the first fully-green
# record and closed the only reds ever written).  The live registry
# itself is larger (round-13 additions await their first record —
# tests/test_entry.py asserts the current size).  Enumeration order:
# (1) _PRIORITY (currently empty), (2) any unrecorded keys in registry
# order (new keys land here), (3) the already-recorded greens.
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
    # --- CORRECTNESS_r04.json greens (all 50 rows green) ---
    "agg_ab_ztest", "agg_abc_classification", "agg_bitmap_rollup",
    "agg_bootstrap_se", "agg_chi_square", "agg_covariate_balance",
    "agg_cuped", "agg_diff_in_diff", "agg_eb_shrunk_rates", "agg_entropy",
    "agg_extreme_value_gumbel", "agg_gini_lorenz",
    "agg_heavy_hitters_bounds", "agg_herfindahl_index",
    "agg_hill_diversity", "agg_hill_tail_index", "agg_kmv_theta",
    "agg_ks_test", "agg_mann_whitney", "agg_market_basket",
    "agg_means_family", "agg_median_ci", "agg_parallel_trends",
    "agg_power_mde", "agg_price_volume_bridge", "agg_ratio_delta_method",
    "agg_revenue_concentration", "agg_spearman_rho", "agg_sprt_sequential",
    "agg_trimmed_mean", "agg_var_es", "agg_weighted_median",
    "fn_business_days", "fn_collate", "fn_variant", "fn_xml",
    "join_bloom_prefilter", "layout_zorder", "pack_sequences",
    "sample_balanced_exact", "scan_csv", "scan_partition_pruned",
    "sim_topk_bucketed", "win_event_transitions", "win_interval_coalesce",
    "win_journey_paths", "win_max_drawdown", "win_rolling_corr",
    "win_skyline_pareto", "win_time_weighted_avg",
    # --- CORRECTNESS_r05.json greens (all 50 rows green) ---
    "bm25_score", "cdc_apply_merge", "decontaminate_fuzzy",
    "dedup_cdc_chunks", "dedup_containment", "dedup_golden_record",
    "dedup_incremental", "dedup_minhash_estimate", "dedup_phonetic_block",
    "dedup_skeleton", "dedup_sorted_neighborhood", "dedup_span_fraction",
    "dq_table_diff", "emb_pca_power", "fn_base64_roundtrip",
    "fn_calendar_spine", "fn_fiscal_445", "fn_geo_haversine", "fn_ip_cidr",
    "fn_luhn_checksum", "fn_rounding_mode_audit", "join_asof_nearest",
    "join_asof_tolerance", "join_fuzzy_levenshtein", "join_interval_outer",
    "mix_preference_pairs", "ml_bpe_pair_counts", "ml_cohens_kappa",
    "ml_kmeans_train", "ml_knn_classify", "ml_langid_confusion",
    "ml_tokenizer_fertility", "quality_gate", "scan_orc",
    "subq_recursive_cte", "text_burrows_delta", "text_fightin_words",
    "text_homoglyph_normalize", "text_jsd_vs_corpus", "text_kneser_ney",
    "text_novelty_rate", "text_perplexity_lm", "text_pmi_collocations",
    "text_rake_keywords", "text_readability", "text_stem_suffix",
    "text_term_burstiness", "text_vocab_coverage", "text_yule_k",
    "text_zipf_slope",
    # --- CORRECTNESS_r06.json greens (all 50 rows green) ---
    "agg_bitmap_intersect", "agg_countmin_topk", "agg_sketch_rollup",
    "cdc_debezium_envelope", "corr_matrix", "dedup_paragraph",
    "dedup_url_normalize", "dq_drift_psi", "dq_format_profile",
    "dq_freshness", "dq_join_fanout", "dq_partition_checksums",
    "dq_volume_anomaly", "emb_norm_stats", "feature_hashing",
    "fn_explode_outer", "join_null_safe", "join_scd2_pit",
    "mix_domain_weights", "mix_packing_efficiency", "mix_token_budget",
    "mm_audio_energy_zcr", "mm_image_dedup_ahash", "mm_video_framesample",
    "privacy_k_anonymity", "privacy_l_diversity", "quantile_bucketize",
    "rank_fusion_rrf", "sample_importance", "sample_reservoir",
    "scan_binaryfile", "scan_csv_column_order", "scan_csv_multiline",
    "scan_csv_permissive", "scan_file_lineage", "scan_jsonl_corrupt",
    "scan_manifest_snapshot", "scan_partition_overwrite",
    "scan_recursive_lookup", "scan_schema_evolution", "scan_time_travel",
    "scan_wholetext", "shuffle_deterministic", "text_html_strip",
    "text_pseudonymize", "text_winnow", "ts_ewma", "win_rolling_distinct",
    "win_rolling_median", "win_streaks",
    # --- CORRECTNESS_r08.json greens (all 50 rows green) ---
    "agg_ab_srm_check", "agg_attribution_models", "agg_benjamini_hochberg",
    "agg_raking_ipf", "agg_rfm_segments", "dq_benford_digits",
    "dq_cross_field_consistency", "dq_heartbeat_completeness",
    "dq_label_consistency", "dq_sequence_gaps", "dq_simpsons_paradox",
    "graph_adamic_adar", "graph_assortativity", "graph_clustering_coeff",
    "graph_degree_stats", "graph_hits", "graph_katz", "graph_kcore_peel",
    "graph_label_prop", "graph_modularity", "ml_auc_roc",
    "ml_average_precision", "ml_brier_decomposition", "ml_class_weights",
    "ml_conformal_interval", "ml_cost_curve", "ml_crossval_ols",
    "ml_decision_stump", "ml_gains_lift", "ml_item_cf",
    "ml_learning_curve", "ml_linreg_ols", "ml_logreg_irls",
    "ml_naive_bayes", "ml_ndcg", "ml_shapley_r2", "ml_target_encode",
    "ml_uplift_tlearner", "ml_woe_binning", "retention_growth_accounting",
    "retention_ltv_curve", "sample_neyman_allocation", "subq_bom_rollup",
    "ts_anomaly_zscore", "ts_change_detect", "ts_gapfill_linear",
    "ts_lagged_corr", "ts_outlier_mad", "ts_seasonal_index",
    "ts_survival_km",
    # --- CORRECTNESS_r09.json greens (49 of 50 rows green; the one red,
    # privacy_dp_count, stays in the backlog until re-recorded — its
    # libm-LN noise path was replaced by the engine-exact DECIMAL
    # ladder in round 10, functions/dp_noise.py) ---
    "dedup_semantic_prune", "rag_context_pack", "rag_hard_negatives",
    "rag_grounding_overlap", "sim_mmr_rerank", "text_chunk_overlap",
    "mix_curriculum", "mix_water_filling", "mix_overlap_discounted",
    "privacy_dp_sum", "sample_priority_ppswor", "ml_calibration_ece",
    "ml_recall_at_k", "emb_matryoshka_eval", "emb_whitening_diag",
    "emb_cluster_purity", "emb_drift_centroid", "sim_knn_graph_blocked",
    "sim_ivf_balance", "graph_bfs_hops", "graph_ppr_seeds",
    "text_source_overlap", "dq_referential_orphans", "ts_downsample_lttb",
    "ts_stickiness_dau_mau", "ts_bounce_rate", "ts_concurrency_peak",
    "ts_interarrival_stats", "ts_outage_windows", "ts_littles_law",
    "ts_forecast_baseline_wape", "ts_peak_detection", "ts_cusum",
    "ts_changepoint_binseg", "ts_theil_sen", "ts_mann_kendall",
    "ts_seasonal_strength", "ts_dominant_period", "ts_disorder_ratio",
    "ts_fano_factor", "ts_process_capability", "ts_runs_test",
    "ts_markov_entropy_rate", "ts_downsample_m4", "ts_wavelet_haar",
    "ts_sax_motifs", "ts_hurst_exponent", "ts_spectral_entropy",
    "ts_granger_lite",
    # --- CORRECTNESS_r10.json greens (48 of 50 rows green; the two
    # reds — privacy_dp_count and privacy_dp_mean, hash-only at
    # matching rows/schema despite local value-exactness — were
    # hardened to pure-integer BIGINT e4 releases in round 11
    # (functions/dp_noise.py laplace_ladder_e4) and stay in the
    # priority backlog with their _parts decomposition diagnostics
    # until a green driver row exists) ---
    "emb_binary_quantize", "rag_fusion_multiquery", "rag_dedup_context",
    "rag_router_centroid", "mix_temperature_sampling",
    "mix_epoch_schedule", "layout_compaction_plan",
    "dedup_survivorship_tokens", "ml_mrr_at_k", "graph_jaccard_linkpred",
    "ts_newey_west_se", "ts_ljung_box", "sim_pq_adc", "sim_pq_rescore",
    "emb_pq_distortion", "sim_pq_trained", "scan_manifest_diff",
    "scan_manifest_orphans", "scan_manifest_retention_plan",
    "scan_commitlog_replay", "privacy_dp_partition_select",
    "privacy_rr_frequency",
    # --- CORRECTNESS_r11.json greens (all 50 rows green — the first
    # fully-green record; 23 keys new to this set, the rest re-records.
    # The two formerly-red DP keys green here; their _parts
    # decomposition diagnostics were then retired in round 12 per
    # their own drop-once-green contract and so do not appear) ---
    "agg_hll_registers", "dq_functional_dependency", "emb_abtt",
    "join_dpp_partition_pruned", "join_spatial_grid",
    "layout_overlap_depth", "mix_doremi_step", "ml_bpe_apply",
    "privacy_dp_count", "privacy_dp_mean", "privacy_dp_quantile",
    "privacy_dp_topk", "privacy_dp_user_count", "rag_maxsim",
    "rag_prf_expansion", "scan_bucket_pruning", "scan_equality_deletes",
    "scan_minmax_skipping", "scan_partition_evolution", "sim_ivfpq",
    "sim_lsh_multiprobe", "sim_range_search", "ts_token_bucket_meter",
    # --- CORRECTNESS_r12.json greens (all 50 rows green; 4 keys new
    # to the record — the round-12 additions, each 5-scale certified
    # at birth — the other 46 re-records of the rotation's
    # asof/text/fn/stream sweep) ---
    "privacy_dp_gaussian_count", "scan_mor_snapshot",
    "sim_ivfpq_rescore", "sim_ivfpq_trained",
    # --- CORRECTNESS_r13.json greens (all 50 rows green; 5 keys new
    # to the record — the round-13 additions, each 5-scale certified
    # at birth — the other 45 re-records of the rotation's
    # dedup/similarity/text/emb/ml sweep) ---
    "privacy_dp_accountant", "scan_mor_compacted",
    "sim_ivfpq_mp_rescore", "sim_ivfpq_streamed", "sim_ivfpq_trained_mp",
})


# Unrecorded keys to enumerate FIRST, in this exact order.  Round 12:
# empty — every registry key has a green driver row (r11 closed the DP
# backlog), so new keys simply land via the generic backlog rule and
# the driver's ~50 slots re-record existing greens in registry order.
_PRIORITY = ()

# _DRIVER_RECORDED reflects the CORRECTNESS artifacts through this
# round number; tests derive the expected set from those artifacts
# (bump this when folding a new round's records in).
_RECORDED_THROUGH = 13


def _ordered():
    specs = load_all()
    backlog = [n for n in _PRIORITY if n not in _DRIVER_RECORDED]
    backlog += [n for n in specs
                if n not in _DRIVER_RECORDED and n not in _PRIORITY]
    recorded = [n for n in specs if n in _DRIVER_RECORDED]
    # Rotate the recorded section by a round-deterministic offset so
    # the ~50 slots the driver re-records each round sweep DIFFERENT
    # families instead of re-greening the registry head every time
    # (r10 and r11 both re-recorded the scan/filter/agg prefix).
    if recorded:
        k = (_RECORDED_THROUGH * 49) % len(recorded)
        recorded = recorded[k:] + recorded[:k]
    return {n: specs[n] for n in backlog + recorded}


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

"""Driver-window rotation ledger: which 50 registered queries the
driver verifies each round, the per-round promotion/backfill plans,
and the historical window lists rounds 3-7 shipped (kept verbatim —
the judge's CORRECTNESS_r0N boards are indexed by these names).
Moved out of ``standard_queries.py`` in round 7 when the registry
module brushed the 6,000-line monolith ceiling the repo-hygiene test
enforces. Pure data: no imports, no Spark.
"""

from __future__ import annotations

#: round-2 red rows — oracles now CAST(SUM(toks) AS BIGINT); values
#: were proven equal in round 2, so these flip green on re-check.
ROUND3_REVERIFY_RED = [
    "pack_sequences_512",
    "corpus_pipeline_manifest",
]

#: value-oracled queries with no driver CORRECTNESS row in r1/r2
#: (window overflow or registered after round 2).
ROUND3_NEVER_CHECKED = [
    "a8b_percentile_disc",
    "session_window_native",
    "pca_orders_features",
    "audio_decode_features",
    "video_decode_features",
    "clean_text_normalize",
    "heavy_hitters_tokens",
    "delta_log_read_events",
    "delta_write_roundtrip_events",
    "iceberg_read_events",
    "iceberg_v2_mor_events",
    "acid_restore_events",
    "edit_distance_pairs",
    "token_freq_topk",
    "corpus_mix_sample",
    "emb_near_dup_pairs",
    "bigram_topk",
    "ttr_by_source",
    "pii_redact_props",
    "emb_label_centroid_dist",
    "int8_quant_topk",
    "time_weekly_revenue",
    "time_ship_latency",
    "json_parse_props",
    "user_event_sequence",
    "doc_repetition",
    "decontaminate_docs",
    "chunk_documents",
    "hard_negative_mining",
    "grouped_ols_arrow",
    "variant_json_props",
    "frame_sample_docs",
    "bigram_lm_quality",
    "weighted_sample_docs",
    "unigram_entropy_docs",
    "hybrid_search_rrf",
    "duplicate_spans_docs",
    "ewma_user_value",
    "profile_orders",
    "chi2_terms_by_lang",
    "mad_outliers_orders",
    "interval_union_user_time",
    "gapfill_daily_events",
    "kmeans_orders_wellsep",
    "dq_orders_checks",
]

#: rows-only entries getting their no_oracle rows on record this
#: round (one per rows-only code family; siblings deferred to r4).
ROUND3_ROWS_ONLY = [
    "bpe_merge_table",
    "semantic_dedup_survivors",
    "hll_user_rollup",
]

#: round-4 queue: late round-3 registrations (first), deferred
#: rows-only siblings, then standing re-verifies.
ROUND4_QUEUE = [
    "kmv_custkey_overlap_priority",  # registered after the r3 window froze
    "incremental_dedup_manifest",  # registered after the r3 window froze
    "gopher_quality_docs",  # registered after the r3 window froze
    "group_split_docs",  # registered after the r3 window froze
    "pq_topk_rerank",  # registered after the r3 window froze (rows-only)
    "temperature_mix_docs",  # registered after the r3 window froze
    "salted_join_events",  # registered after the r3 window froze
    "freshness_events_by_type",  # registered after the r3 window froze
    "cms_user_frequencies",  # registered after the r3 window froze
    "zipf_slope_tokens",  # registered after the r3 window froze
    "pit_join_purchases",  # registered after the r3 window froze
    "classification_report_nb",  # registered after the r3 window froze
    "ir_metrics_ann",  # registered after the r3 window froze
    "psi_drift_event_types",  # registered after the r3 window froze
    "w10_price_distribution_ranks",  # registered after the r3 window froze
    "digest_core_tables",  # registered after the r3 window froze
    "shard_manifest_docs",  # registered after the r3 window froze
    "date_spine_q1_2024",  # registered after the r3 window froze
    "rollup_tree_revenue",  # registered after the r3 window froze
    "ntile_price_bands",  # registered after the r3 window froze
    "pca_project_embeddings",
    "kmeans_cluster_sizes",
    "approx_distinct_users",
    "bpe_tokenize_docs",
    "ann_lsh_topk",  # rows-only -> value-oracle upgrade, re-check
    "minhash_lsh_pairs",  # rows-only -> value-oracle upgrade, re-check
    "simhash_near_pairs",  # rows-only -> value-oracle upgrade, re-check
    # VERDICT r3 item 1c: the two omissions the judge flagged.
    "profile_orders",  # r3 red (oracle-side HUGEINT, now cast) — re-verify
    "simhash_fingerprints",  # stale r1 no_oracle; value oracle since r3
]

#: queries registered DURING round 4 — appended here at registration
#: time, then the list is FROZEN before the driver pass (VERDICT r3
#: item 3: land new operators early; post-freeze work waits for r5).
ROUND4_NEW: list[str] = [
    "serving_rankings_page",
    "stream_pit_equivalence",
    "stream_dedup_equivalence",
    "ann_ivf_topk",  # rows-only -> value-oracle upgrade (fixed int centroids)
    "target_encode_loo_orders",
    "funnel_windowed_3d",
    "interevent_stats_users",
    "temporal_split_purged_events",
    "feature_hash_docs",
    "kfold_assign_docs",
    "dedup_keep_best_docs",
    "rfm_customer_segments",
    "abtest_conversion_ztest",
    "event_transition_matrix",
    "mom_revenue_change",
    "robust_scale_orders",
    "iceberg_write_roundtrip_events",
    "cdc_scd2_user_dim",
    "balanced_sample_docs",
    "benford_first_digit_orders",
    "seasonal_weekday_index",
]


#: queries whose SEMANTICS or result SHAPE changed after the round-4
#: window froze — they must lead round 5's window for
#: re-verification under the new definition (the in-repo replica
#: covers them every session meanwhile). Rotation is safe:
#: CORRECTNESS_r04.json exists (memory: driver-window-rotation).
ROUND5_QUEUE: list[str] = [
    "image_decode_features",  # r4: BMP-only -> BMP/PNG/GIF/JPEG/TIFF/PPM rotation
    "audio_decode_features",  # r4: WAV-only -> WAV/FLAC rotation
    "pca_project_embeddings",  # r4 red: array<double> result; now scalar pca_0..7
    "dedup_keep_best_docs",  # ADVICE r4: pair feed now exact Jaccard, matches oracle definitionally
    "record_linkage_parts",  # promoted from r4 staging (linkage pre-cut loosened)
    "golden_record_parts",  # promoted from r4 staging
    "orc_roundtrip_events",  # promoted from r4 staging
    "jsonl_bz2_roundtrip_docs",  # promoted from r4 staging
    "kneser_ney_quality_docs",  # promoted from r4 staging
    "ql_dirichlet_topk_docs",  # promoted from r4 staging
    "pmi_collocations_docs",  # promoted from r4 staging
    "containment_pairs_docs",  # promoted from r4 staging
]

#: queries registered DURING round 5 — appended at registration time,
#: FROZEN before the driver pass (same discipline as ROUND4_NEW).
ROUND5_NEW: list[str] = [
    "triangle_counts_events",
    "link_prediction_users",
    "logreg_orders_gd",
    "auc_order_priority",
    "mutual_info_terms_by_lang",
    "gini_customer_revenue",
    "activity_streaks_users",
    "cusum_daily_events",
    "basket_pairs_lift",
    "skipgram_ppmi_docs",
    "fixed_width_roundtrip_orders",
    "hive_partition_prune_events",
    "avro_roundtrip_events",
    "stream_window_counts_equivalence",
]

#: backfill: every query on the board is green, but these 24 have had
#: no driver row since ROUND 1 — rotate the stalest evidence back
#: under the gate so the cumulative board stays fresh (alphabetical
#: 24 of the 42 r1-only rows; the remaining 18 lead round 6's
#: backfill).
ROUND5_BACKFILL: list[str] = [
    "a10_ratio_of_sums",
    "a12_rollup_revenue",
    "a2_conditional_avg",
    "a3_regression_slope",
    "a4_group_rank_cell_avg",
    "a5_replacement_floor",
    "a7_pivot_daily_events",
    "a8_value_percentiles",
    "a9_budget_share",
    "cosine_topk",
    "dedup_exact",
    "doc_fingerprint",
    "embedding_label_norms",
    "j10_anti_unordered_customers",
    "j1_left_enrich",
    "j7_join_literal_pred",
    "j8_two_step_join",
    "j9_semi_join_big_spenders",
    "lang_id",
    "multimodal_features",
    "ngram_jaccard_pairs",
    "p2_distinct_segments",
    "p_predicate_gauntlet",
    "q1_pricing_summary",
]

#: Round-6 window: exactly the 50 round-6 promotions (first 50 of
#: the round-5 staging file in file order — see queries_r6.py).
#: Rotation is safe: CORRECTNESS_r05.json exists (memory:
#: driver-window-rotation), and round 5 closed 49 green / 50 with
#: the one non-green a rows-only-by-design entry.
ROUND6_WINDOW: list[str] = [
    "part_hierarchy_rollup",
    "seasonal_naive_backtest",
    "blocking_quality_parts",
    "conformal_interval_coverage",
    "heaps_law_vocab_growth",
    "incremental_agg_maintenance_events",
    "image_ahash_fingerprints",
    "table_diff_orders",
    "rolling_28d_active_users",
    "proximity_pairs_customers",
    "stream_interval_join_equivalence",
    "moments_by_priority",
    "survival_km_repurchase",
    "session_paths_3step",
    "k_anonymity_orders",
    "ks_drift_order_values",
    "stream_append_exactly_once",
    "personalized_pagerank_buyers",
    "training_matrix_pit",
    "acid_asof_timestamp_events",
    "csv_quoted_roundtrip_parts",
    "contamination_check_docs",
    "holt_forecast_daily_events",
    "acf_daily_events",
    "log_odds_terms_en",
    "calibration_brier_orders",
    "dbscan_customer_blobs",
    "theil_sen_trend_events",
    "cube_events_type_weekday",
    "ohlc_daily_events",
    "twap_user_values",
    "js_divergence_sources",
    "hits_part_authorities",
    "join_skew_advisor_events",
    "kcore_users_events",
    "array_hof_embedding_stats",
    "json_typed_props_events",
    "xml_roundtrip_parts",
    "bloom_semi_join_orders",
    "prefix_jaccard_pairs_docs",
    "isotonic_calibration_orders",
    "bootstrap_ci_orders",
    "approx_quantile_bounds_orders",
    "attribution_models_events",
    "agg_function_gauntlet_orders",
    "weighted_median_lineitem",
    "string_function_gauntlet_parts",
    "datetime_gauntlet_orders",
    "regex_gauntlet_parts",
    "arrow_ipc_roundtrip_orders",
]

#: Round-7 window (rotated once CORRECTNESS_r06.json landed — 50/50
#: green; memory: driver-window-rotation), amended from the original
#: "staged_r7 verbatim" plan per the round-6 verdict:
#:   * 2 lead slots for the round-6 ORACLE UPGRADES — bpe_merge_table
#:     and semantic_dedup_survivors gained full value oracles in r6
#:     (unrolled merge-round CTEs / exact-cosine + recursive-CTE
#:     components) but their latest driver rows predate the upgrade
#:     (r3 `no_oracle`). ROUND5_QUEUE precedent: changed oracles
#:     re-verify first.
#:   * 2 slots for the capped wedge twins
#:     (link_prediction_capped_users, triangle_counts_capped_events,
#:     moved from staged_r10 into queries_r7.py) — the registered
#:     fix for the only two sf1.0 watchdog failures; the uncapped
#:     exact forms stay registered as calibration-class (the
#:     exact-vs-LSH dedup pattern).
#:   * the first 46 round-7 promotions in original file order; the
#:     4 tail queries (item_cf_topk_parts, max_drawdown_users,
#:     fifo_match_returns_parts, als_user_step_lineitem) are
#:     REGISTERED now but their driver rows lead round 8's window.
ROUND7_WINDOW: list[str] = [
    "bpe_merge_table",
    "semantic_dedup_survivors",
    "link_prediction_capped_users",
    "triangle_counts_capped_events",
    "null_conditional_gauntlet_customer",
    "set_ops_customers",
    "acid_rename_column_events",
    "recursive_cte_part_closure",
    "lateral_topk_customers",
    "window_frame_gauntlet_orders",
    "pivot_unpivot_native_events",
    "variant_extract_events",
    "collation_groups_parts",
    "quantile_normalize_docs",
    "bfs_hops_users",
    "lpa_communities_users",
    "chunk_overlap_docs",
    "url_features_docs",
    "html_extract_docs",
    "pii_scrub_docs",
    "stream_merge_exactly_once",
    "map_function_gauntlet_events",
    "vocab_ids_docs",
    "negative_sampling_docs",
    "cdc_chunks_docs",
    "phrase_search_docs",
    "lift_gains_orders",
    "holt_winters_daily_events",
    "embedding_int8_quantize",
    "pareto_frontier_parts",
    "fk_integrity_audit",
    "listagg_gauntlet_nation",
    "leakage_safe_split_docs",
    "diff_in_diff_events",
    "ams_f2_users",
    "stream_quarantine_split",
    "web_pipeline_chunks",
    "incremental_join_maintenance",
    "trimmed_mean_orders",
    "correlation_matrix_lineitem",
    "welch_ttest_events",
    "readability_by_lang",
    "mann_whitney_by_type",
    "spearman_qty_price",
    "decision_stump_orders",
    "ols_price_qty_disc",
    "spatial_grid_nn_customers",
    "grouping_sets_events",
    "bitwise_gauntlet_orders",
    "dp_noisy_counts_events",
]

#: ROUND-8 WINDOW (CORRECTNESS_r08.json target) — rotated after the
#: driver wrote CORRECTNESS_r07.json, exactly per the round-7 plan
#: (verdict r7 item 1): the 4 round-7 promotions whose driver rows
#: were deferred lead, then the first 46 of the former staged_r8
#: (now queries_r8.py) in original file order. staged_r8's 4 tail
#: queries (capture_recapture_users, transition_latency_matrix,
#: weighted_kappa_quality, feature_gini_importance) are REGISTERED
#: but their driver rows join round 9, as do the four rows moved up
#: on the round-7 verdict (lpa_communities_capped_users,
#: kcore_capped_users, hll_error_bound_users, kmv_error_bound_customers
#: — registered + benched now per verdict items 2 and 4; driver
#: evidence at the round-9 rotation).
ROUND8_WINDOW: list[str] = [
    "item_cf_topk_parts",
    "max_drawdown_users",
    "fifo_match_returns_parts",
    "als_user_step_lineitem",
    "stl_lite_daily_events",
    "string_format_gauntlet_parts",
    "markov_perplexity_events",
    "cramers_v_events",
    "largest_remainder_allocation",
    "cidr_longest_prefix_events",
    "iso_calendar_gauntlet_orders",
    "keyset_pagination_parts",
    "timezone_gauntlet_events",
    "cohens_d_events",
    "hhi_by_part_type",
    "change_point_daily_events",
    "mix_shift_decomposition",
    "linear_interpolate_daily",
    "reconcile_order_totals",
    "acid_replace_where_events",
    "daily_percentile_bands",
    "wilson_ci_conversion",
    "dispersion_index_events",
    "durbin_watson_daily",
    "k_anon_generalization_ladder",
    "degree_assortativity_users",
    "burst_days_events",
    "digest_codec_gauntlet_parts",
    "stream_replace_where_daily",
    "partial_correlation_lineitem",
    "mahalanobis_outliers_lineitem",
    "cuped_adjustment_events",
    "srm_check_events",
    "jackknife_ratio_variance",
    "stratified_ate_events",
    "travel_distance_users",
    "budget_pacing_daily",
    "churn_threshold_ladder",
    "type_token_ratio_sources",
    "open_orders_per_day",
    "acid_drop_column_events",
    "duplicate_payment_pairs",
    "stl_anomaly_days",
    "scd3_user_prior_state",
    "bitemporal_asof_events",
    "eb_shrunk_return_rates",
    "minhash_eval_vs_exact",
    "peak_event_rate_users",
    "regression_discontinuity_orders",
    "kpi_driver_decomposition",
]

#: ROUND-9 WINDOW (CORRECTNESS_r09.json target) — rotated after the
#: driver wrote CORRECTNESS_r08.json (50/50 green), exactly per the
#: round-8 plan below and VERDICT r8 item 2: the 8 round-8
#: registrations whose driver rows were deferred lead (staged_r8's 4
#: tail + the 4 verdict move-ups — first driver evidence for the
#: capped LPA/k-core twins and the HLL/KMV bound rows), then the
#: 18-query stalest-evidence backfill (ROUND6_BACKFILL_PLAN: the
#: r1-only §2 rows), then the first 24 of the round-9 promotions
#: (queries_r9.py, formerly staged_r9) in original file order.
#: queries_r9's 8 tail rows (zorder_cells_events …
#: friedman_by_type) are REGISTERED now but their driver rows lead
#: round 10's window. NOTE: lpa_communities_capped_users,
#: kcore_capped_users and degree_assortativity_users (r8 row) were
#: re-based onto the slot-bounded co-activity constructor this round
#: (VERDICT r8 item 1) — their first/next driver evidence is under
#: the new definition, oracle changed in lockstep.
ROUND9_WINDOW: list[str] = [
    "capture_recapture_users",
    "transition_latency_matrix",
    "weighted_kappa_quality",
    "feature_gini_importance",
    "lpa_communities_capped_users",
    "kcore_capped_users",
    "hll_error_bound_users",
    "kmv_error_bound_customers",
    "q3_top_revenue_orders",
    "quality_filter",
    "s2_path_metadata",
    "s5_latest_snapshot",
    "s6_latest_per_group",
    "scd2_user_state",
    "text_quality",
    "token_stats",
    "u2_unpivot_measures",
    "u3_tiered_union",
    "u4_party_union",
    "w2_priority_price_ranks",
    "w3_top_parts_per_brand",
    "w4_global_order_rank",
    "w5_rank_diff",
    "w6_ntile_value_quartiles",
    "w7_rolling_7day_value",
    "w8_value_distribution",
    "monge_elkan_parts",
    "trigram_cosine_pairs_parts",
    "closeness_users_events",
    "bellman_ford_users",
    "anova_f_event_types",
    "kruskal_wallis_priority",
    "cross_correlation_lag_events",
    "sharpe_daily_users",
    "basket_triples_apriori",
    "croston_demand_parts",
    "ltv_cohort_triangle_orders",
    "abc_xyz_parts",
    "runs_test_daily_events",
    "theil_index_customers",
    "term_burstiness_docs",
    "mcnemar_view_purchase",
    "video_rle8_delta_features",
    "growth_accounting_weekly",
    "stickiness_dau_mau",
    "simpsons_paradox_check",
    "path_entropy_users",
    "rake_keywords_docs",
    "wow_movers_event_types",
    "acid_shallow_clone_events",
]

DRIVER_WINDOW: list[str] = ROUND9_WINDOW[:50]

#: ROUND-9/10/11/12 PLAN (rotate only once CORRECTNESS_r08.json
#: exists — memory: driver-window-rotation). Staged inventory at
#: round-8 close: staged_r9 32, staged_r10 48, staged_r11 48
#: (hll_error_bound_users moved up into queries_r8 per verdict r7
#: item 4), staged_r12 46 (9 carried + 37 authored and 4-gate
#: verified in round 8; the LPA capped twin moved up into
#: queries_r8 per verdict r7 item 2) — staged_r11's 4 tail + the
#: 46 fill the round-12 window exactly. staged_r13 opened in round
#: 8 with 12 fully-gated entries (feeds rounds 13+).
#:   * ROUND 9: the 8 round-8 registrations whose driver rows were
#:     deferred (staged_r8's 4 tail: capture_recapture_users,
#:     transition_latency_matrix, weighted_kappa_quality,
#:     feature_gini_importance; + the 4 verdict move-ups:
#:     lpa_communities_capped_users, kcore_capped_users,
#:     hll_error_bound_users, kmv_error_bound_customers) + the 18-query
#:     stalest-evidence backfill below (r1-only driver rows) + the
#:     first 24 of staged_r9 = 50; staged_r9's remaining 8 join
#:     round 10.
#:   * ROUND 10: an OPTIMIZATION round — the window stayed FROZEN on
#:     ROUND9_WINDOW (no staged promotions; VERDICT r9 item 9), which
#:     also re-gates closeness_users_events / bellman_ford_users
#:     under their round-10 capped rebase (VERDICT r9 item 1). One
#:     new registration outside the window: the VERDICT-r9-item-4
#:     sketched-closeness audit row (queries_r10.py, benched per the
#:     invariant). The promotion plan below shifts one build round:
#:   * next BUILD round: queries_r9's 8 tail (zorder_cells_events,
#:     cochran_q_events, audience_overlap_sources,
#:     conversion_horizon_shares, haar_energy_daily_events,
#:     dup_cluster_size_histogram, lmoments_order_values,
#:     friedman_by_type) + closeness_sketch_users_events + the first
#:     41 of staged_r10; staged_r10's 7 tail join the round after.
#:   * ROUND 11: staged_r10's 6 tail + the first 44 of staged_r11;
#:     staged_r11's 4 tail + staged_r12 rotate in round 12.
#: Every staged entry is oracle-green at sf0.001 AND sf0.01
#: (scripts/check_staged.py), vanilla-ANSI checked
#: (check_staged_vanilla.py), plan-linted + sf0.1-timed, and
#: sf1.0-audited under the 240 s watchdog (bench_sf1_staged.py)
#: BEFORE its window rotates. The streaming-equivalence fixtures
#: (stream_late_data_equivalence, stream_session_equivalence) stay
#: out of bench.py per the standing policy; everything else joins
#: the headline set on promotion. Keep registering genuinely-new
#: round-N work into staging only, never straight into the frozen
#: window.
ROUND6_BACKFILL_PLAN: list[str] = [
    "q3_top_revenue_orders",
    "quality_filter",
    "s2_path_metadata",
    "s5_latest_snapshot",
    "s6_latest_per_group",
    "scd2_user_state",
    "text_quality",
    "token_stats",
    "u2_unpivot_measures",
    "u3_tiered_union",
    "u4_party_union",
    "w2_priority_price_ranks",
    "w3_top_parts_per_brand",
    "w4_global_order_rank",
    "w5_rank_diff",
    "w6_ntile_value_quartiles",
    "w7_rolling_7day_value",
    "w8_value_distribution",
]



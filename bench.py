"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE compact JSON line (the driver's contract):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

and ALSO writes the full payload (per-run raw timings + medians +
run metadata) to BENCH_full.json next to this file, so the complete
per-query signal survives even if the driver's stdout tail capture
truncates the line (BENCH_r02.json arrived `"parsed": null` for
exactly that reason).

Each query is executed to completion (count() over the full plan)
SPARK_GRAFT_BENCH_RUNS times (default 3) after a warm-up pass that
touches every input table; the reported figure is the per-query
MEDIAN, so ±0.3 s single-run noise stops swamping sub-second deltas
(VERDICT r2 item 3).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark import standard_queries as SQ

#: headline set: the reference's signature relational shapes + the
#: scale-path LLM ops (LSH variants, not the quadratic baselines).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "s5_latest_snapshot",
    "a3_regression_slope",
    "a7_pivot_daily_events",
    "a8_value_percentiles",
    "w2_priority_price_ranks",
    "w3_top_parts_per_brand",
    "w4_global_order_rank",
    "u2_unpivot_measures",
    "j1_left_enrich",
    "j7_join_literal_pred",
    "a10_ratio_of_sums",
    "sgp_factor_chain",
    "j8_two_step_join",
    "u3_tiered_union",
    "sessionize_events",
    "scd2_user_state",
    "stratified_sample_docs",
    "pack_sequences_512",
    "corpus_pipeline_manifest",
    "asof_purchase_attribution",
    "range_join_click_views",
    "dedup_exact",
    "text_quality",
    "doc_fingerprint",
    "token_stats",
    "bigram_lm_quality",
    "minhash_lsh_pairs",
    "edit_distance_pairs",
    "cosine_topk",
    "cosine_topk_arrow",
    "emb_near_dup_pairs",
    "q13_order_count_distribution",
    "q18_large_volume_orders",
    "q5_local_supplier_volume",
    "q19_disjunctive_brackets",
    "q21_waiting_suppliers",
    "bigram_topk",
    "emb_label_centroid_dist",
    "int8_quant_topk",
    "q4_priority_exists",
    "q17_small_quantity_revenue",
    "doc_repetition",
    "decontaminate_docs",
    "chunk_documents",
    "hard_negative_mining",
    "grouped_ols_arrow",
    "paragraph_dedup_docs",
    "tfidf_topk_docs",
    "dsir_importance_sample",
    "nb_classify_docs",
    "bm25_topk_docs",
    "hybrid_search_rrf",
    "funnel_signup_purchase",
    "cohort_retention_events",
    "unigram_entropy_docs",
    "duplicate_spans_docs",
    "ewma_user_value",
    "weighted_sample_docs",
    "chi2_terms_by_lang",
    "mad_outliers_orders",
    "interval_union_user_time",
    "profile_orders",
    # round-2 additions
    "image_decode_features",
    "clean_text_normalize",
    "pagerank_event_graph",
    "pca_project_embeddings",
    "merge_upsert_events",
    # round-3 additions (flagged per VERDICT r2 item 8: same basis +
    # additions called out so round totals stay attributable)
    "audio_decode_features",
    "video_decode_features",
    "pca_orders_features",
    "delta_log_read_events",
    "iceberg_read_events",
    "gapfill_daily_events",
    "dq_orders_checks",
    "kmeans_orders_wellsep",
    # round-3 late additions (new operators this round)
    "kmv_custkey_overlap_priority",
    "incremental_dedup_manifest",
    "gopher_quality_docs",
    "group_split_docs",
    "pq_topk_rerank",
    "temperature_mix_docs",
    "salted_join_events",
    "freshness_events_by_type",
    "cms_user_frequencies",
    "zipf_slope_tokens",
    "ntile_price_bands",
    "pit_join_purchases",
    "classification_report_nb",
    "ir_metrics_ann",
    "psi_drift_event_types",
    "w10_price_distribution_ranks",
    "digest_core_tables",
    "shard_manifest_docs",
    "date_spine_q1_2024",
    "rollup_tree_revenue",
    # round-4 additions (same basis + additions called out, VERDICT r2
    # item 8). Excluded: stream_pit_equivalence / stream_dedup_equivalence
    # — correctness fixtures that run a full streaming job AND its batch
    # twin twice each; they gate in CORRECTNESS, not the throughput bench.
    "serving_rankings_page",
    "ann_ivf_topk",
    "bpe_tokenize_docs",
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
    # round-5 additions (same basis + additions called out, VERDICT r2
    # item 8): the eight r4-staged promotions, then this round's new
    # operators. Excluded: stream_window_counts_equivalence — a
    # correctness fixture (streaming job + batch twin + two exceptAll
    # passes), gated in CORRECTNESS like the other two stream rows.
    "record_linkage_parts",
    "golden_record_parts",
    "orc_roundtrip_events",
    "jsonl_bz2_roundtrip_docs",
    "kneser_ney_quality_docs",
    "ql_dirichlet_topk_docs",
    "pmi_collocations_docs",
    "containment_pairs_docs",
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

    # round-6 promotions (the 50 ROUND6_WINDOW queries; VERDICT r6
    # item 3 — resume headline growth). Excluded per the standing
    # policy: stream_interval_join_equivalence /
    # stream_append_exactly_once (streaming correctness fixtures).
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
    "moments_by_priority",
    "survival_km_repurchase",
    "session_paths_3step",
    "k_anonymity_orders",
    "ks_drift_order_values",
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
    # round-7 promotions incl. the capped wedge twins (the 100 TB
    # production forms of the calibration-class exact wedge rows).
    # Excluded: stream_merge_exactly_once / stream_quarantine_split
    # (streaming correctness fixtures, gated in CORRECTNESS).
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
    "item_cf_topk_parts",
    "max_drawdown_users",
    "fifo_match_returns_parts",
    "als_user_step_lineitem",
    "link_prediction_capped_users",
    "triangle_counts_capped_events",

    # round-7 completeness sweep (VERDICT r6 item 3): every
    # registered query is benched from here on — these are the
    # r1-r3 registrations that never joined the headline set.
    # Only the streaming equivalence fixtures stay out (policy).
    "s6_latest_per_group",
    "a2_conditional_avg",
    "a4_group_rank_cell_avg",
    "a5_replacement_floor",
    "a8b_percentile_disc",
    "session_window_native",
    "a9_budget_share",
    "p_predicate_gauntlet",
    "p2_distinct_segments",
    "f_json_props",
    "u4_party_union",
    "j9_semi_join_big_spenders",
    "lang_id",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "embedding_label_norms",
    "ann_lsh_topk",
    "s2_path_metadata",
    "simhash_near_pairs",
    "minhash_dedup_survivors",
    "multimodal_features",
    "w5_rank_diff",
    "quality_filter",
    "heavy_hitters_tokens",
    "j10_anti_unordered_customers",
    "w6_ntile_value_quartiles",
    "a12_rollup_revenue",
    "w7_rolling_7day_value",
    "w8_value_distribution",
    "delta_write_roundtrip_events",
    "iceberg_v2_mor_events",
    "acid_change_feed",
    "acid_restore_events",
    "a14_value_histogram",
    "a15_corr_covar_stats",
    "token_freq_topk",
    "approx_distinct_users",
    "corpus_mix_sample",
    "ttr_by_source",
    "pii_redact_props",
    "a16_cube_revenue",
    "a17_grouping_sets_acctbal",
    "w9_user_event_gaps",
    "w10_brand_price_position",
    "u6_order_year_cohorts",
    "q15_top_revenue_supplier",
    "q2_min_price_per_brand",
    "time_weekly_revenue",
    "time_ship_latency",
    "kmeans_cluster_sizes",
    "json_parse_props",
    "user_event_sequence",
    "q16_supplier_variety",
    "q22_idle_rich_customers",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_nation_balance_share",
    "q12_late_priority_counts",
    "q14_promo_revenue_ratio",
    "q20_promo_part_suppliers",
    "variant_json_props",
    "frame_sample_docs",
    "bpe_merge_table",
    "semantic_dedup_survivors",
    "hll_user_rollup",
    "j11_full_outer_presence",
    "j12_null_safe_join",
    # round-8 promotions (former staged_r8) + the four verdict-r7
    # move-ups — registered ⇒ benched (test-enforced invariant)
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
    "capture_recapture_users",
    "transition_latency_matrix",
    "weighted_kappa_quality",
    "feature_gini_importance",
    "hll_error_bound_users",
    "lpa_communities_capped_users",
    "kcore_capped_users",
    "kmv_error_bound_customers",
    # round-9 promotions (queries_r9.py, formerly staged_r9): the
    # full 32 in file order — first 24 lead the round-9 driver
    # window, 8 tail join round 10. No stream_* fixtures among them.
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
    "zorder_cells_events",
    "cochran_q_events",
    "audience_overlap_sources",
    "conversion_horizon_shares",
    "haar_energy_daily_events",
    "dup_cluster_size_histogram",
    "lmoments_order_values",
    "friedman_by_type",
    # round-10 registration (queries_r10.py): the HyperBall
    # sketched-closeness audit row (VERDICT r9 item 4) — registered
    # ⇒ benched per the standing invariant.
    "closeness_sketch_users_events",
]


def _prepare_chunked(sf_dir: str) -> str:
    """Re-chunk the bench inputs into multi-file, multi-row-group
    tables so scans actually parallelize.

    The driver's testdata ships ONE row group per table (one file) —
    every scan is a single task regardless of cluster width, so
    sf0.1 wall-clock is overhead-dominated and perf regressions hide
    under the noise floor (PERF.md; VERDICT r1 item 6). Real 100 TB
    tables are thousands of files; splitting here makes the local
    bench exercise the same parallel-scan path. Source data is
    read-only, so the split copy lands in /tmp, built once and
    reused (rebuilt only if row counts drift). Set
    SPARK_GRAFT_BENCH_RAW=1 to bench the pristine single-file dir.
    """
    import pyarrow.parquet as pq

    if os.environ.get("SPARK_GRAFT_BENCH_RAW"):
        return sf_dir
    tag = os.path.basename(os.path.normpath(sf_dir))
    target = os.path.join("/tmp", f"spark_graft_bench_{tag}")
    os.makedirs(target, exist_ok=True)
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, fname)
        dst = os.path.join(target, fname)  # a DIRECTORY of parts
        table = pq.ParquetFile(src)
        rows = table.metadata.num_rows
        # ≥32 concurrent tasks for the big tables; the small-but-CPU-heavy
        # documents/embeddings tables still split (text/vector queries do
        # real per-row work), only tiny dims stay 1 file
        n_files = max(1, min(32, rows // 1_000))
        if os.path.isdir(dst):
            existing = sum(
                pq.ParquetFile(os.path.join(dst, f)).metadata.num_rows
                for f in os.listdir(dst)
                if f.endswith(".parquet")
            )
            if existing == rows:
                continue
            import shutil

            shutil.rmtree(dst)
        os.makedirs(dst, exist_ok=True)
        data = table.read()
        per = -(-rows // n_files)  # ceil
        for i in range(n_files):
            chunk = data.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(
                chunk,
                os.path.join(dst, f"part-{i:05d}.parquet"),
                row_group_size=max(10_000, per // 4),
            )
    return target


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    sf_dir = _prepare_chunked(sf_dir)

    spark = get_spark("bench")
    queries = SQ.all_queries()

    # warm-up: materialize every table scan once (JVM + codegen warm)
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "events", "documents", "embeddings"):
        try:
            SQ.T(spark, sf_dir, t).count()
        except Exception:
            pass
    # spin up the Arrow Python workers once (one per core, ~0.5 s each
    # cold) so worker fork cost isn't billed to the first pandas-UDF
    # query — on a real cluster these are long-lived daemons.
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # run-major order (all queries, then repeat) so run 1 of query N
    # doesn't warm run 2's caches back-to-back; per-query medians are
    # then honest about steady-state cost.
    for _ in range(runs):
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            raw[name].append(round(time.perf_counter() - t0, 3))

    timings = {n: round(statistics.median(ts), 3) for n, ts in raw.items()}
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    full = dict(payload)
    full["runs"] = runs
    full["raw_sec"] = raw
    full["aggregation"] = "median"
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    # stop Spark BEFORE printing so no JVM shutdown chatter lands
    # after (and tail-truncates) the driver-parsed line.
    spark.stop()
    sys.stdout.flush()
    # Per-query detail goes FIRST on its own line (and lives in
    # BENCH_full.json); the FINAL stdout line is <200 bytes carrying
    # only the headline totals. BENCH_r01–r03 all arrived
    # `"parsed": null` because a ~2.5 KB final line overflowed the
    # driver's tail capture, cutting off metric/value at the front
    # (VERDICT r3 item 2) — the parse-critical line must stay short.
    print(
        json.dumps(
            {"detail_queries": {n: round(v, 2) for n, v in timings.items()}},
            separators=(",", ":"),
        ),
        flush=True,
    )
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "runs": runs,
        "n_queries": len(timings),
    }
    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) < 200, f"summary line too long ({len(line)}B): {line}"
    print(line, flush=True)


if __name__ == "__main__":
    main()

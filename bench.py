"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() over the full plan)
after a warm-up pass that touches every input table, so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

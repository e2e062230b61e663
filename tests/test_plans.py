"""Physical-plan property tests — the 100 TB scale contract.

Correctness tests prove the operators compute the right answer;
these prove Catalyst compiles them to the plans that survive scale:
filters pushed to the parquet scan, columns pruned, small sides
broadcast, rank-limit pushdown on top-k windows, partial (map-side)
aggregation, and no full-data single-partition exchange anywhere.
A regression that silently de-optimizes a plan fails here even
though results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark import standard_queries as SQ
from dbt_lakehouse_aws_spark.operators.windows import global_row_number


def plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def queries():
    return SQ.all_queries()


def test_q1_filter_pushdown_and_partial_agg(spark, sf_dir, queries):
    p = plan(queries["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert "partial_sum" in p  # map-side combine: shuffle O(groups), not O(rows)
    # column pruning: only the 7 needed columns reach the scan
    assert "l_orderkey" not in p.split("ReadSchema")[1].split("\n")[0]


def test_j8_all_broadcast_no_shuffle(spark, sf_dir, queries):
    p = plan(queries["j8_two_step_join"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    # the fact table never moves: no hash-partition exchange at all
    assert "hashpartitioning" not in p
    # literal dim predicate reached the nation scan
    assert "EqualTo(n_regionkey,2)" in p


def test_s5_latest_snapshot_broadcasts_the_max(spark, sf_dir, queries):
    p = plan(queries["s5_latest_snapshot"](spark, sf_dir))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # the only SinglePartition exchange is the 1-row global max agg
    assert p.count("SinglePartition") == 1


def test_w3_rank_limit_pushdown(spark, sf_dir, queries):
    p = plan(queries["w3_top_parts_per_brand"](spark, sf_dir))
    # Partial WindowGroupLimit = each map task pre-prunes to k rows
    # per group BEFORE the exchange → shuffle O(groups·k)
    assert "WindowGroupLimit" in p and "Partial" in p


def test_w4_global_rank_never_single_partitions_data(spark, sf_dir, queries):
    p = plan(queries["w4_global_order_rank"](spark, sf_dir))
    assert "rangepartitioning" in p
    assert "SinglePartition" not in p
    # offsets come back as a broadcast join, not a window
    assert "BroadcastHashJoin" in p
    naive = SQ.T(spark, sf_dir, "orders")
    naive_plan = plan(
        naive.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                    F.desc("o_totalprice")
                )
            ),
        )
    )
    assert "SinglePartition" in naive_plan  # what we're avoiding


def test_u3_tier3_is_take_ordered(spark, sf_dir, queries):
    p = plan(queries["u3_tiered_union"](spark, sf_dir))
    # global top-10 compiles to TakeOrderedAndProject (per-partition
    # heap + driver merge), never a global sort
    assert "TakeOrderedAndProject" in p


def test_q3_topk_is_take_ordered(spark, sf_dir, queries):
    p = plan(queries["q3_top_revenue_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "c_mktsegment" in p and "EqualTo(c_mktsegment,BUILDING)" in p


def test_global_row_number_scales_partitions(spark):
    df = spark.range(10_000).withColumn("k", F.col("id") % 100)
    out = global_row_number(df, [F.asc("k"), F.asc("id")], num_partitions=16)
    assert out.rdd.getNumPartitions() >= 8  # result stays distributed


def test_text_ops_stay_in_codegen(spark, sf_dir, queries):
    # no BatchEvalPython / row-at-a-time UDF in the text pipeline
    for q in ("text_quality", "token_stats", "doc_fingerprint", "lang_id"):
        p = plan(queries[q](spark, sf_dir))
        assert "BatchEvalPython" not in p, q
        # '*'-prefixed nodes are inside a WholeStageCodegen stage
        assert "* ColumnarToRow" in p or "* Project" in p, q


def test_multimodal_is_arrow_batched(spark, sf_dir, queries):
    p = plan(queries["multimodal_features"](spark, sf_dir))
    # mapInPandas → Arrow-batched MapInPandas node, not per-row Python
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + date predicate → Catalyst reads only
    matching directories (PartitionFilters), the physical realization
    of the reference's year=/month=/day= logical partitioning."""
    from dbt_lakehouse_aws_spark import standard_queries as SQ
    from dbt_lakehouse_aws_spark.sources.catalog import TableCatalog

    ev = SQ.T(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    cat = TableCatalog(spark, warehouse_dir=str(tmp_path))
    stored = cat.put("source", "events_by_day", ev, materialize=True,
                     partition_by=["day"])
    one_day = ev.select(F.max("day")).collect()[0][0]
    q = stored.filter(F.col("day") == F.lit(one_day)).select("event_id", "value")
    p = plan(q)
    assert "PartitionFilters" in p and "isnotnull(day" in p
    assert q.count() > 0


def test_asof_one_exchange_no_join(spark, sf_dir, queries):
    """as_of_join compiles to union + ONE hash exchange + window —
    never a join operator, never a per-row subquery."""
    p = plan(queries["asof_purchase_attribution"](spark, sf_dir))
    assert "Join" not in p
    # formatted mode lists each node in tree + detail: 1 exchange → 2 mentions
    assert p.count("Exchange hashpartitioning(user_id") <= 2
    assert "SinglePartition" not in p


def test_sessionize_single_shuffle_shared_sort(spark, sf_dir, queries):
    """Both windows and the final aggregate ride ONE exchange on
    user_id: grouping on (user_id, _sess) is satisfied by the
    existing hash distribution — no second shuffle."""
    p = plan(queries["sessionize_events"](spark, sf_dir))
    # exactly one exchange node in the tree listing
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 1
    assert "SinglePartition" not in p


def test_range_join_is_hash_equi_join(spark, sf_dir, queries):
    p = plan(queries["range_join_click_views"](spark, sf_dir))
    assert "NestedLoop" not in p
    assert "Cartesian" not in p


def test_corpus_pipeline_all_codegen_bounded_shuffles(spark, sf_dir, queries):
    """The 4-stage corpus pipeline must stay entirely JVM-side (no
    Python eval) and shuffle only on its three partition keys
    (text-dedup, lang-sample, lang-pack — pack reuses sample's)."""
    p = plan(queries["corpus_pipeline_manifest"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") <= 3
    assert "SinglePartition" not in p


def test_w9_window_and_agg_share_one_exchange(spark, sf_dir, queries):
    """lag() window partitions on user_id and the gap aggregate
    groups on user_id — Catalyst must reuse the one hash exchange."""
    p = plan(queries["w9_user_event_gaps"](spark, sf_dir))
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 1
    assert "SinglePartition" not in p


def test_cube_expands_in_one_aggregate_pass(spark, sf_dir, queries):
    """CUBE = Expand (4 grouping sets) feeding ONE partial+final
    hash aggregate — not one scan/shuffle per set."""
    p = plan(queries["a16_cube_revenue"](spark, sf_dir))
    assert "Expand" in p
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 1 and tree.count("Scan") == 1


def test_bigram_topk_plan(spark, sf_dir, queries):
    """Bigram construction is per-row codegen (no Python, no extra
    shuffle); final top-20 is a TakeOrderedAndProject heap, never a
    global sort of all distinct bigrams."""
    p = plan(queries["bigram_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 1  # only the bigram-count agg


def test_q18_having_is_filter_after_partial_agg(spark, sf_dir, queries):
    """HAVING compiles to a plain Filter over the final aggregate;
    the customer dimension stays broadcast."""
    p = plan(queries["q18_large_volume_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "partial_sum" in p


def test_int8_quant_topk_no_cartesian_blowup(spark, sf_dir, queries):
    """The query side (8 vectors) must be the broadcast side of the
    inequality join — a nested-loop against a tiny broadcast is a
    map-side pass, but a CartesianProduct would be corpus²."""
    p = plan(queries["int8_quant_topk"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_q4_semi_join_keeps_equi_key(spark, sf_dir, queries):
    """The EXISTS with a date residual must still be an equi semi
    join on l_orderkey (hash/SMJ), never a nested loop over the
    fact table."""
    p = plan(queries["q4_priority_exists"](spark, sf_dir))
    assert "LeftSemi" in p
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_q16_exclusion_is_broadcast_anti(spark, sf_dir, queries):
    """NOT IN over a non-null key compiles to a broadcast anti join
    — the 6-row exclusion list must never shuffle the fact table."""
    p = plan(queries["q16_supplier_variety"](spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_q22_anti_join_scan_is_date_pruned(spark, sf_dir, queries):
    """The NOT EXISTS build side must carry the o_orderdate filter
    into the parquet scan (PushedFilters), not post-filter."""
    p = plan(queries["q22_idle_rich_customers"](spark, sf_dir))
    assert "LeftAnti" in p
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in p


def test_doc_repetition_no_explode_no_python(spark, sf_dir, queries):
    """Repetition scoring stays array-local: no Generate (explode)
    node, no Python eval — one exchange for the per-source rollup."""
    p = plan(queries["doc_repetition"](spark, sf_dir))
    assert "Generate" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_decontaminate_benchmark_set_broadcast(spark, sf_dir, queries):
    """The benchmark shingle set is broadcast to a map-side semi
    join; the corpus side must not shuffle on shingle."""
    p = plan(queries["decontaminate_docs"](spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_chunk_documents_map_only_codegen(spark, sf_dir, queries):
    """Chunking is a map-only stage: one Generate (the chunk
    fan-out), zero Exchange, zero Python."""
    p = plan(queries["chunk_documents"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 0


def test_hard_negatives_broadcast_not_cartesian(spark, sf_dir, queries):
    """The label-inequality join must broadcast the tiny query set,
    never CartesianProduct the corpus."""
    p = plan(queries["hard_negative_mining"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p


def test_grouped_ols_is_arrow_not_pickle(spark, sf_dir, queries):
    """applyInPandas must compile to FlatMapGroupsInPandas (Arrow
    batches), not row-pickling BatchEvalPython."""
    p = plan(queries["grouped_ols_arrow"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p
    assert "BatchEvalPython" not in p


def test_q21_single_lineitem_agg_no_self_joins(spark, sf_dir, queries):
    """The EXISTS / NOT EXISTS pair is decorrelated into ONE
    per-order aggregate of lineitem: the plan must contain no
    nested-loop join, and lineitem appears at most twice (probe +
    the shared per-order aggregate), never three times as the
    correlated form would scan it."""
    p = plan(queries["q21_waiting_suppliers"](spark, sf_dir))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert p.count("lineitem.parquet") <= 2
    assert "LeftSemi" in p


def test_paragraph_dedup_no_window_on_paragraph(spark, sf_dir, queries):
    """First-occurrence must be the min-struct aggregate (map-side
    combinable — a hot paragraph never sorts in one task), not a
    row_number window over the paragraph key."""
    p = plan(queries["paragraph_dedup_docs"](spark, sf_dir))
    assert "Window" not in p


def test_tfidf_topk_rank_limit_pushdown(spark, sf_dir, queries):
    """Per-doc top-k must pre-prune with a partial WindowGroupLimit
    before the shuffle to the final window."""
    p = plan(queries["tfidf_topk_docs"](spark, sf_dir))
    assert "WindowGroupLimit" in p


def test_dsir_ratio_table_broadcasts(spark, sf_dir, queries):
    """The n_buckets-row log-ratio table joins back to the exploded
    tokens as a broadcast hash join — token traffic never shuffles
    on the token/bucket key."""
    p = plan(queries["dsir_importance_sample"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_semantic_dedup_blocks_on_cluster(spark, sf_dir, queries):
    """The within-cluster pair join must be a hash/sort-merge
    equi-join on the cluster id — never a cartesian product."""
    p = plan(queries["semantic_dedup_survivors"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_runtime_bloom_filter_prunes_fact_scan(spark, queries):
    """Spark's InjectRuntimeFilter adds a bloom-filter semi-filter
    (might_contain) on the fact side of a shuffle join whose dim side
    is selectively filtered — the runtime analogue of partition
    pruning for non-partition keys. Thresholds: creationSideThreshold
    is a MAXIMUM for the dim side, applicationSideScanSizeThreshold a
    MINIMUM for the fact side (at 100 TB the defaults 10MB/10GB
    trigger this on every dim-filtered fact join; local test data
    needs the floor lowered)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_orderstatus") == "F"
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        assert "might_contain" in plan(j).lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_group_split_is_pure_projection(spark, sf_dir, queries):
    """Leakage-safe split must add zero exchanges and stay JVM-side —
    it is one hash + one CASE over the scan."""
    p = plan(queries["group_split_docs"](spark, sf_dir))
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 0
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_gopher_quality_single_pass_no_shuffle(spark, sf_dir, queries):
    """All five rules compute in one projection over one scan."""
    p = plan(queries["gopher_quality_docs"](spark, sf_dir))
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert tree.count("Exchange") == 0
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_kmv_sketch_bounded_exchanges(spark, sf_dir, queries):
    """KMV build = (group, hash) distinct + per-group bottom-k +
    collect; the pair stage joins the tiny sketch table. Budget: the
    distinct's exchange, the group window/agg exchange, and the
    sketch-table self-join's (broadcast or tiny hash) — no
    SinglePartition funnel anywhere."""
    p = plan(queries["kmv_custkey_overlap_priority"](spark, sf_dir))
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert "SinglePartition" not in tree
    assert tree.count("Exchange") <= 6
    assert "BatchEvalPython" not in p


def test_pit_join_is_hash_join_not_nested_loop(spark, sf_dir, queries):
    """The SCD2 point-in-time join must plan as a key equi-join with
    the validity window as a residual condition — never a nested
    loop or cartesian product."""
    p = plan(queries["pit_join_purchases"](spark, sf_dir))
    assert "NestedLoop" not in p
    assert "Cartesian" not in p


def test_salted_join_no_single_partition(spark, sf_dir, queries):
    """Salting exists to spread hot keys; the plan must show the
    (key, salt) shuffle and no one-task funnel."""
    p = plan(queries["salted_join_events"](spark, sf_dir))
    tree = p.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert "SinglePartition" not in tree
    assert "BatchEvalPython" not in p


def test_cms_build_single_bounded_shuffle(spark, sf_dir, queries):
    """Sketch build aggregates to depth*width rows with map-side
    combine; the probe join broadcasts the sketch side. No Python
    eval anywhere."""
    p = plan(queries["cms_user_frequencies"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "SinglePartition" not in p.split("== Physical Plan ==")[1].split("(1) ")[0]


def test_round4_queries_no_funnels_or_row_udfs(spark, sf_dir, queries):
    """Plan-lint sweep over the round-4 declarative additions: no
    single-partition exchanges (window funnels), no row-pickling
    Python UDFs. (mom_revenue_change originally used a bounded lag
    window here — the registry-wide linter correctly flagged it, and
    it now self-joins on the month calendar instead.)
    Eagerly-executing fixtures (streaming equivalence, ACID/iceberg
    round trips) are exercised by their own tests."""
    from dbt_lakehouse_aws_spark.plans.lint import plan_report

    names = [
        "serving_rankings_page",
        "target_encode_loo_orders",
        "funnel_windowed_3d",
        "interevent_stats_users",
        "temporal_split_purged_events",
        "feature_hash_docs",
        "kfold_assign_docs",
        "rfm_customer_segments",
        "abtest_conversion_ztest",
        "event_transition_matrix",
        "mom_revenue_change",
        "benford_first_digit_orders",
        "seasonal_weekday_index",
        "balanced_sample_docs",
        "robust_scale_orders",
    ]
    for n in names:
        rep = plan_report(queries[n](spark, sf_dir))
        assert not rep.smells.get("single_partition_exchange"), (n, rep.smells)
        assert not rep.smells.get("python_row_udf"), (n, rep.smells)


def test_hive_partition_prune_plan(spark, sf_dir):
    """The partitioned-sink roundtrip's read side must prune at
    PLANNING time: the event_type filter shows up as a PartitionFilter
    on the scan (directory-level pruning), not a data filter."""
    import tempfile

    ev = SQ.T(spark, sf_dir, "events").select("event_id", "ts", "value", "event_type")
    root = tempfile.mkdtemp(prefix="hivep_plan_") + "/events_part"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(root)
    back = spark.read.parquet(root).filter(F.col("event_type") == "purchase")
    p = plan(back.groupBy(F.to_date("ts").alias("day")).count())
    assert "PartitionFilters" in p and "event_type" in p.split("PartitionFilters", 1)[1][:200]


def test_round5_queries_no_funnels_or_row_udfs(spark, sf_dir, queries):
    """Plan-lint sweep over the round-5 declarative additions: no
    single-partition exchanges, no row-pickling Python UDFs.
    Eagerly-executing fixtures (roundtrips, streaming equivalence,
    iterative fits) are exercised by their own correctness tests."""
    from dbt_lakehouse_aws_spark.plans.lint import plan_report

    names = [
        "triangle_counts_events",
        "link_prediction_users",
        "mutual_info_terms_by_lang",
        "basket_pairs_lift",
        "skipgram_ppmi_docs",
        "activity_streaks_users",
    ]
    for n in names:
        rep = plan_report(queries[n](spark, sf_dir))
        assert not rep.smells.get("single_partition_exchange"), (n, rep.smells)
        assert not rep.smells.get("python_row_udf"), (n, rep.smells)


def test_prefix_sum_matches_window_and_avoids_funnel(spark):
    """prefix_sum == the single-partition window's answer, without
    the single-partition exchange."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum
    from pyspark.sql import Window

    # order key must be total: (k, v) is not unique -> include row id
    df2 = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 9973).alias("k"),
        (F.col("id") % 97).cast("long").alias("v"),
    )
    got = prefix_sum(df2, [F.asc("k"), F.asc("id")], "v", name="cum")
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df2.withColumn("cum", F.sum("v").over(w))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    p = plan(got)
    assert "SinglePartition" not in p


def test_staged_r5_session_queries_no_funnels_or_row_udfs(spark, sf_dir):
    """Plan-lint sweep over this session's staged additions: no
    single-partition exchanges, no row-pickling Python UDFs
    (cdc_chunks' MapInPandas is Arrow-batched, not BatchEvalPython —
    the linter distinguishes them). Excluded with reasons:
    quantile_normalize_docs / vocab_ids_docs / negative_sampling_docs
    (two-pass ranks execute bounded metadata collects at
    construction), bfs_hops_users / lpa_communities_users /
    stream_merge_exactly_once / fk_integrity_audit (iterative or
    eagerly-executing fixtures), lift_gains_orders (ntile_scalable collects partition counts);
    pareto_frontier_parts / ams_f2_users use tiny broadcast self-joins
    instead of global windows and pass the staged linter directly."""
    from dbt_lakehouse_aws_spark.plans.lint import plan_report
    from dbt_lakehouse_aws_spark import queries_r7, queries_r8

    STAGED_QUERIES = {**queries_r7._PROMOTED_QUERIES, **queries_r8._PROMOTED_QUERIES}

    names = [
        "chunk_overlap_docs",
        "url_features_docs",
        "html_extract_docs",
        "pii_scrub_docs",
        "map_function_gauntlet_events",
        "phrase_search_docs",
        "embedding_int8_quantize",
        "listagg_gauntlet_nation",
        "cdc_chunks_docs",
        "holt_winters_daily_events",
    ]
    for n in names:
        rep = plan_report(STAGED_QUERIES[n](spark, sf_dir))
        assert not rep.smells.get("single_partition_exchange"), (n, rep.smells)
        assert not rep.smells.get("python_row_udf"), (n, rep.smells)


def test_staged_rank_stats_and_spatial_no_funnels_or_row_udfs(spark, sf_dir):
    """Plan-lint sweep over the rank-statistics/stump/OLS/spatial/
    gauntlet staged additions. The rank-based pair (Mann-Whitney,
    Spearman) builds value-level midranks on prefix_sum — bounded
    metadata collects at construction, but the RESULT plan must hold
    no one-task exchange; spatial NN must be a hash join on the grid
    cell keys, never a Cartesian product (the brute-force cross join
    lives only in the oracle)."""
    from dbt_lakehouse_aws_spark.plans.lint import plan_report
    from dbt_lakehouse_aws_spark import queries_r7, queries_r8

    STAGED_QUERIES = {**queries_r7._PROMOTED_QUERIES, **queries_r8._PROMOTED_QUERIES}

    names = [
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
    ]
    for n in names:
        df = STAGED_QUERIES[n](spark, sf_dir)
        rep = plan_report(df)
        assert not rep.smells.get("single_partition_exchange"), (n, rep.smells)
        assert not rep.smells.get("python_row_udf"), (n, rep.smells)

    nn_plan = STAGED_QUERIES["spatial_grid_nn_customers"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in nn_plan
    assert "BroadcastNestedLoopJoin" not in nn_plan


def test_prefix_filter_jaccard_single_array_pass(spark):
    """Round-9 PPJoin shape: prefixes come from SLICING the one pinned
    per-doc id array — no window pass over the shingle stream, and no
    duplicated ranking subtree per self-join side. A Window node
    reappearing here means the single-pass structure regressed."""
    from dbt_lakehouse_aws_spark.llmops.dedup import prefix_filter_jaccard_pairs

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + ("x" * (i % 3))) for i in range(20)],
        "doc_id long, text string",
    )
    p = plan(prefix_filter_jaccard_pairs(df, threshold=0.5))
    assert "Window" not in p
    # candidate keys and verification arrays are integer-typed (the
    # dictionary encoding): no shingle STRING survives past the scan
    assert "slice(" in p or "Generate explode(slice" in p

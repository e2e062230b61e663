"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``dbt_lakehouse_aws_spark/`` (see SURVEY.md
§2 for the operator inventory each query covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_lakehouse_aws_spark import standard_queries as SQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SQ.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return SQ.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable
    query. 4 of 313 registrations are omitted → rows-only check, each
    with a measured justification in its docstring (HLL/KMV sketches
    are approximate by design: `hll_user_rollup`,
    `approx_distinct_users`; the embeddings k-means/PCA queries are
    iterative/ill-conditioned: `kmeans_cluster_sizes`,
    `pca_project_embeddings` — their ALGORITHMS are value-oracled via
    well-conditioned twin queries `kmeans_orders_wellsep` /
    `pca_orders_features` on the same code path). BPE training and
    SemDeDup were upgraded to FULL value oracles in round 6
    (unrolled-fixpoint CTEs / ground-truth cosine components)."""
    return SQ.all_oracles()

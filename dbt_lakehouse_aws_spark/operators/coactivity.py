"""User co-activity graph shared by the graph queries (PageRank,
triangles, link prediction, k-core, PPR, HITS, BFS, assortativity):
two users share an edge when they emit the same event_type in the
same hour slot at least ``min_shared`` times — hour granularity
keeps the graph sparse (day granularity makes it complete at every
SF).

The standard graph queries run at min_shared=3: the shared≥2 graph
is 34% DENSE at sf0.1 (384k edges / 1.5k nodes — avg degree 512),
where wedge enumeration costs 67M (triangles, even oriented) / 400M
(common-neighbor) row scans for no extra signal; at ≥3 the graph is
sparse at every SF and stays non-empty at sf0.001 (measured,
PERF.md). Orientation still guards the HUB case — probed separately
at a 100k-degree hub (scale_probe9).

Lives in a leaf module so query modules (queries_r5/r6/r7, staged_
r8) can all share it without circular imports through
``standard_queries``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.sources.tables import T


def coactivity_edges_sql(min_shared: int) -> str:
    """DuckDB CTE prelude (``ue``/``shared``/``edges``) mirroring
    :func:`coactivity_edges` — splice into oracle SQL with
    ``WITH {coactivity_edges_sql(3)}, ...``."""
    return f"""
    ue AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
      FROM events
    ),
    shared AS (
      SELECT x.user_id AS a, y.user_id AS b, count(*) AS shared
      FROM ue x JOIN ue y
        ON x.event_type = y.event_type AND x.hr = y.hr
       AND x.user_id < y.user_id
      GROUP BY 1, 2
    ),
    edges AS (SELECT a, b FROM shared WHERE shared >= {min_shared})
"""


def coactivity_edges(
    spark: SparkSession, sf_dir: str, min_shared: int = 2
) -> DataFrame:
    ue = (
        T(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hr"),
        )
        .distinct()
    )
    x = ue.select(F.col("user_id").alias("a"), "event_type", "hr")
    y = ue.select(F.col("user_id").alias("b"), "event_type", "hr")
    return (
        x.join(y, ["event_type", "hr"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
        .select("a", "b")
    )

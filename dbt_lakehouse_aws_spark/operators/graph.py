"""Iterative graph operators on edge-list DataFrames.

Connected components (llmops/dedup.py) handles the dedup-grouping
case; this module adds PageRank — the canonical "iterative sparse
matrix-vector product" workload, here as the quality/centrality
scorer a link-graph curation pipeline uses (rank hosts by citation,
weight crawl frontiers).

Scale shape per iteration (the GraphX/Pregel plan, relationally):

* contributions = edges ⋈ ranks on src (shuffle O(edges)) with
  rank/out-degree fan-out;
* new ranks = per-dst sum (map-side combinable) + teleport and
  dangling-mass terms;
* dangling mass (rank parked on sink nodes) is a scalar aggregate
  collected per round — KBs to the driver, redistributed uniformly
  so total rank stays 1.0;
* lineage truncates via ``localCheckpoint`` every few rounds
  (PERF.md rule for iterative algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Standard damped PageRank over a directed edge list; returns
    (node, rank) with Σ rank = 1 (dangling mass redistributed)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # the dangling NODE SET is static across iterations — only its
    # rank mass moves. Materialize it once; when it's empty (every
    # node has out-edges) the per-round driver round-trip disappears
    # entirely (8-round bipartite probe: 14.4 s → 6.6 s cold).
    dangling_nodes = nodes.join(out_deg, "node", "left_anti").localCheckpoint(
        eager=True
    )
    has_dangling = dangling_nodes.limit(1).count() > 0

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        dangling = 0.0
        if has_dangling:
            dangling = (
                ranks.join(F.broadcast(dangling_nodes), "node")
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        contribs = (
            edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst"))
            .join(ranks, "node")
            .join(out_deg, "node")
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce("_s", F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks

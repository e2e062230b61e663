"""Scale probe #9: triangle counting under a power-law hub.

The claim in operators/graph.py::triangle_counts is that degree-
ordered orientation is what makes distributed triangle counting
survive skew: a naive wedge join generates deg(v)² candidate wedges
per node, so ONE hub of degree d contributes d² rows to the shuffle;
orientation caps every out-degree at O(√m), making the wedge volume
Σ out_deg² ≪ Σ deg².

This probe builds a zero-I/O synthetic graph — a sparse random layer
(~M edges) plus one hub wired to `hub_deg` nodes — and measures:

* the WEDGE VOLUME both ways: naive = Σ deg·(deg−1)/2 (computed
  analytically from the degree table — actually materializing it at
  hub_deg=100k would be 5·10⁹ rows), oriented = the count the
  implementation actually shuffles (executed);
* wall-clock of the full oriented triangle count.

Run:  python scripts/scale_probe9_graph.py [edges] [hub_deg]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.operators.graph import (  # noqa: E402
    canonical_edges,
    triangle_counts,
)


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hub_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_nodes = m // 4
    spark = get_spark(f"scale_probe9_graph_{m}")

    rand = (
        spark.range(m)
        .select(
            ((F.col("id") * 2654435761) % n_nodes + 1).alias("src"),
            ((F.col("id") * 40503 + 7) % n_nodes + 1).alias("dst"),
        )
    )
    hub = spark.range(1, hub_deg + 1).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    edges = rand.unionByName(hub)

    und = canonical_edges(edges).persist()
    m_canon = und.count()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    stats = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("naive_wedges"),
        F.max("deg").alias("max_deg"),
    ).collect()[0]

    t0 = time.time()
    tri = triangle_counts(edges)
    total_tri = tri.agg((F.sum("triangles") / 3).cast("long")).collect()[0][0]
    dt = time.time() - t0

    # the wedge volume the oriented implementation actually produced
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    wd = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = wd.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u")
    )
    out_deg = oriented.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    o_stats = out_deg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("oriented_wedges"),
        F.max("od").alias("max_out_deg"),
    ).collect()[0]

    print(
        f"edges={m_canon:,}  max_deg={stats['max_deg']:,}  "
        f"naive_wedges={int(stats['naive_wedges']):,}  "
        f"oriented_wedges={int(o_stats['oriented_wedges']):,}  "
        f"max_out_deg={o_stats['max_out_deg']:,}  "
        f"reduction={stats['naive_wedges'] / max(o_stats['oriented_wedges'], 1):,.0f}x"
    )
    print(f"triangles={total_tri:,}  wall={dt:.1f}s")


if __name__ == "__main__":
    main()

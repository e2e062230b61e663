"""Scale probe #16: bounded BFS + label propagation at 10M+ edges.

Both operators' scale claim is the same: cost per round is O(edges)
— one shuffle join + one aggregate — with NO term proportional to
rounds×nodes-visited-so-far (BFS joins only the NEW frontier) and no
per-node window. This probe builds a deterministic expander-ish
graph (each node points at 3 affine neighbors), runs 4 BFS rounds
from a ~1% seed set and 3 LPA rounds, and reports per-round
wall-clock + frontier sizes.

Run:  python scripts/scale_probe16_graph_rounds.py [n_nodes]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.operators.graph import (  # noqa: E402
    bfs_hops,
    label_propagation_rounds,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_500_000
    spark = get_spark(f"scale_probe16_graph_{n}")

    base = spark.range(n)
    edges = (
        base.select(F.col("id").alias("a"), ((F.col("id") * 7 + 3) % n).alias("b"))
        .union(base.select(F.col("id"), (F.col("id") * 31 + 11) % n))
        .union(base.select(F.col("id"), (F.col("id") * 101 + 7) % n))
        .filter(F.col("a") != F.col("b"))
    ).localCheckpoint(eager=True)
    m = edges.count()
    print(f"nodes={n} edges={m} (undirected fan-out {2*m})")

    seeds = base.filter(F.col("id") % 97 == 0).select(F.col("id").alias("node"))
    t0 = time.time()
    dist = bfs_hops(edges, seeds, src="a", dst="b", max_hops=4)
    per_hop = {
        r["dist"]: r["n"]
        for r in dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t_bfs = time.time() - t0
    print(f"BFS 4 hops: {t_bfs:.1f}s  per-hop reached: {per_hop}")
    reached = sum(per_hop.values())
    print(f"reached {reached}/{n} = {100.0*reached/n:.1f}% "
          f"(expander: ~whole graph inside 4 hops of a 1% seed set)")

    t0 = time.time()
    labels = label_propagation_rounds(edges, src="a", dst="b", rounds=3)
    n_comm = labels.select("label").distinct().count()
    t_lpa = time.time() - t0
    print(f"LPA 3 rounds: {t_lpa:.1f}s  distinct labels after r3: {n_comm}")
    print(
        "per-round cost is one O(edges) join + one aggregate; "
        "BFS round cost additionally tracks the NEW frontier only — "
        "rounds after saturation are near-free."
    )
    spark.stop()


if __name__ == "__main__":
    main()

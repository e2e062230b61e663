"""Scale probe #12: DBSCAN pipeline at planted-blob scale.

operators/spatial.py::dbscan_labels claims (a) pair volume
O(points·density) via the 3×3 grid join, (b) component cost
independent of cluster DENSITY via the cell-clique contraction (a
square cell of side ⌊eps/√2⌋ is a clique, so dense blobs collapse to
a few hundred supernodes before label propagation), and (c) an exact
min-id labeling. This probe plants B dense blobs of P points each
(side-800 jitter, centers 10k apart, eps 250, minPts 3) plus 1-in-31
scattered noise and measures:

* end-to-end wall-clock and the ε-pair count (the O(n·density) term);
* the contracted cell-graph size (supernodes ≪ core points);
* recovered cluster count == B (no cross-blob bridge: centers are
  40·eps apart; border adoption labels points, never merges).

Run:  python scripts/scale_probe12_dbscan.py [n_blobs] [per_blob]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.operators.spatial import (  # noqa: E402
    dbscan_labels,
    grid_proximity_pairs,
)

M31 = 2_147_483_647


def main() -> None:
    n_blobs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    per_blob = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    n = n_blobs * per_blob
    spark = get_spark(f"scale_probe12_dbscan_{n}")

    h1 = (F.col("id") % M31) * (2654435761 % M31) % M31
    h2 = (h1 * 48271) % M31
    blob = F.col("id") % n_blobs
    scattered = F.col("id") % 31 == 0
    pts = spark.range(n).select(
        F.col("id"),
        F.when(scattered, h1 % 30_000_000)
        .otherwise((blob % 64) * 10_000 + h1 % 800)
        .alias("x"),
        F.when(scattered, h2 % 30_000_000)
        .otherwise(F.floor(blob / 64) * 10_000 + h2 % 800)
        .alias("y"),
    )

    t0 = time.time()
    n_pairs = grid_proximity_pairs(
        pts, id_col="id", x_col="x", y_col="y", radius=250
    ).count()
    t_pairs = time.time() - t0

    t0 = time.time()
    out = dbscan_labels(
        pts, id_col="id", x_col="x", y_col="y", eps=250, min_pts=3
    ).localCheckpoint()
    roles = {
        r["role"]: r["n"]
        for r in out.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_clusters = out.filter(F.col("cluster").isNotNull()).select(
        "cluster"
    ).distinct().count()
    t_total = time.time() - t0

    print(
        f"n={n} blobs={n_blobs} pairs={n_pairs} "
        f"pairs_per_point={2 * n_pairs / n:.1f} t_pairs={t_pairs:.1f}s"
    )
    print(f"roles={roles} clusters={n_clusters} t_dbscan={t_total:.1f}s")
    # scattered noise can land inside a blob (it then joins the blob's
    # cluster) but cannot BRIDGE blobs 40·eps apart; allow recovered
    # clusters = blobs plus at most a few coincidental scatter-cliques
    assert n_blobs <= n_clusters <= n_blobs + 10, n_clusters
    spark.stop()


if __name__ == "__main__":
    main()

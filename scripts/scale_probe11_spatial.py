"""Scale probe #11: grid proximity join vs the naive cross join.

operators/spatial.py::grid_proximity_pairs claims O(points·density)
candidate volume via 3×3 cell bucketing where the naive formulation
scans |A|²/2 pairs (and Spark plans the inequality-only join as
BroadcastNestedLoopJoin). This probe scatters N integer points
uniformly on a square and measures:

* the candidate volume the grid join actually scans (Σ per-cell
  |left replicas|·|right|) vs the naive N²/2 — computed from cell
  histograms, not by running the naive join;
* end-to-end wall-clock of the grid join and the result pair count.

Run:  python scripts/scale_probe11_spatial.py [n_points] [radius]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.operators.spatial import (  # noqa: E402
    grid_proximity_pairs,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    side = 1_000_000  # 1000x1000 cells at the default radius
    spark = get_spark(f"scale_probe11_spatial_{n}")

    pts = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % side).alias("x"),
        ((F.col("id") * 40503 + 12345) % side).alias("y"),
    ).localCheckpoint(eager=True)

    cells = pts.groupBy(
        F.floor(F.col("x") / radius).alias("cx"),
        F.floor(F.col("y") / radius).alias("cy"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # grid candidate volume: every point is replicated into 9 cells,
    # so scanned pairs = Σ_cell (Σ_{3x3 neighborhood} c) · c ≈ 9·Σ c²
    stats = cells.agg(
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.max("c").alias("max_cell"),
        F.count(F.lit(1)).alias("n_cells"),
    ).collect()[0]
    grid_volume = 9 * int(stats["sum_c2"])
    naive_volume = n * (n - 1) // 2

    t0 = time.time()
    pairs = grid_proximity_pairs(pts, id_col="id", x_col="x", y_col="y", radius=radius)
    n_pairs = pairs.count()
    dt = time.time() - t0

    print(
        f"points={n:,}  radius={radius}  cells={stats['n_cells']:,} "
        f"(max occupancy {stats['max_cell']})"
    )
    print(
        f"candidate volume: grid≈{grid_volume:,} vs naive={naive_volume:,} "
        f"({naive_volume / grid_volume:,.0f}x reduction)"
    )
    print(f"pairs_within_radius={n_pairs:,}  wall={dt:.1f}s")


if __name__ == "__main__":
    main()

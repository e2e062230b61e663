"""Spatial proximity join via grid bucketing.

Spark has no spatial join; the naive formulation (cross join +
distance filter) is O(|A|·|B|) and planned as BroadcastNestedLoopJoin
— a non-starter at scale. The standard distributed answer is GRID
BUCKETING (the same family as the banded range join in
operators/temporal.py, in two dimensions):

* hash every point into a square cell of side ``radius``;
* a pair within ``radius`` must lie in the same or one of the 8
  neighboring cells, so replicating ONE side into its 3×3 cell
  neighborhood turns the candidate search into a plain equi-join on
  the cell key — hash-partitioned, AQE-planable, skew-splittable;
* the exact distance predicate filters the cell collisions.

Cost: 9·|A| replicated rows + per-cell products — O(points·density),
never all-pairs. Dense hot cells (a city center) are the skew lever:
shrink the cell size or salt the hot cells upstream.

Coordinates here are INTEGER (meters, micro-degrees…): the distance
test compares squared integers, so results are exact and an external
SQL oracle replays them bit-for-bit — no trigonometry, no float
epsilon at the boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_proximity_pairs(
    df: DataFrame,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) of points within EUCLIDEAN
    ``radius`` (inclusive, integer coordinates), found through a 3×3
    grid-cell equi-join. Returns (id_a, id_b, dist_sq).

    The left replica explodes into its home cell plus all 8
    neighbors; the right side stays in its home cell — every
    qualifying pair meets in exactly the right cell once, and the
    ``id_a < id_b`` canonicalization plus a distinct collapse the
    double-finds that occur when both orientations land in replicated
    cells."""
    cell_x = F.floor(F.col(x_col) / radius).cast("long")
    cell_y = F.floor(F.col(y_col) / radius).cast("long")
    home = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        cell_x.alias("_cx"),
        cell_y.alias("_cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = home.select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("xa"),
        F.col("_y").alias("ya"),
        F.explode(offsets).alias("_o"),
        "_cx",
        "_cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("_cx") + F.col("_o.dx")).alias("cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("cy"),
    )
    right = home.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        F.col("_cx").alias("cx"),
        F.col("_cy").alias("cy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist_sq = dx * dx + dy * dy
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist_sq <= F.lit(radius) * F.lit(radius))
        .select("id_a", "id_b", dist_sq.cast("long").alias("dist_sq"))
        .distinct()
    )

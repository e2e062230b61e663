"""Scale probe #19: grid-bucketed fixed-radius nearest neighbor.

spatial_grid_nn_customers' engine path buckets the point sets into
radius-sized grid cells and probes the 3×3 neighborhood — the claim
is O(queries·9·cell_density) work, NOT O(queries·points): doubling
the QUERY side should double wall-clock, while growing the TARGET
side only matters through per-cell density. The probe also asserts
exactness against a sampled brute-force check.

Run:  python scripts/scale_probe19_spatial_grid.py [n_query] [n_target]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402

SIDE = 10_000_000  # integer plane side
R = 10_000  # radius -> R2 = 1e8
R2 = R * R
CELL = R
RADIX = 10_000_000  # > max target key, for the packed argmin


def points(spark, n: int, mulx: int, muly: int, key: str):
    return spark.range(1, n + 1).select(
        F.col("id").alias(key),
        ((F.col("id") * mulx) % SIDE).alias("x"),
        ((F.col("id") * muly) % SIDE).alias("y"),
    )


def grid_nn(q, t):
    t = t.select(
        "tkey",
        "x",
        "y",
        F.floor(F.col("x") / CELL).alias("cellx"),
        F.floor(F.col("y") / CELL).alias("celly"),
    ).withColumnsRenamed({"x": "tx", "y": "ty"})
    probes = (
        q.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "qkey",
            "x",
            "y",
            (F.floor(F.col("x") / CELL) + F.col("dx")).alias("cellx"),
            (F.floor(F.col("y") / CELL) + F.col("dy")).alias("celly"),
        )
    )
    d2 = (F.col("x") - F.col("tx")) * (F.col("x") - F.col("tx")) + (
        F.col("y") - F.col("ty")
    ) * (F.col("y") - F.col("ty"))
    return (
        probes.join(t, ["cellx", "celly"])
        .filter(d2 <= R2)
        .groupBy("qkey")
        .agg(F.min(d2 * RADIX + F.col("tkey")).alias("pk"))
        .select(
            "qkey",
            (F.col("pk") % RADIX).alias("nearest"),
            F.floor(F.col("pk") / RADIX).alias("d2"),
        )
    )


def main() -> None:
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(f"scale_probe19_grid_{nq}")

    q = points(spark, nq, 48271, 69621, "qkey")
    t = points(spark, nt, 40692, 16807, "tkey")

    for scale, label in ((2, "full"), (4, "half-queries")):
        qs = q.filter(F.col("qkey") % scale == 0)
        t0 = time.time()
        res = grid_nn(qs, t)
        n_matched = res.count()
        dt = time.time() - t0
        print(
            f"{label}: queries={nq // scale:,} targets={nt:,} "
            f"matched={n_matched:,} wall={dt:.1f}s "
            f"({nq // scale / dt / 1e6:.1f}M queries/s)"
        )

    # exactness: brute-force 2,000 sampled queries against ALL targets
    sample = q.filter(F.col("qkey") % (nq // 2000) == 0)
    d2 = (F.col("x") - F.col("tx")) * (F.col("x") - F.col("tx")) + (
        F.col("y") - F.col("ty")
    ) * (F.col("y") - F.col("ty"))
    brute = (
        sample.crossJoin(
            t.withColumnsRenamed({"x": "tx", "y": "ty"})
        )
        .filter(d2 <= R2)
        .groupBy("qkey")
        .agg(F.min(d2 * RADIX + F.col("tkey")).alias("pk_brute"))
    )
    fast = grid_nn(sample.filter(F.lit(True)), t).select(
        "qkey", (F.col("d2") * RADIX + F.col("nearest")).alias("pk_fast")
    )
    diff = (
        brute.join(fast, "qkey", "full")
        .filter(
            F.col("pk_brute").isNull()
            | F.col("pk_fast").isNull()
            | (F.col("pk_brute") != F.col("pk_fast"))
        )
        .count()
    )
    n_checked = brute.count()
    print(f"exactness: {n_checked:,} sampled queries brute-forced, mismatches={diff}")
    assert diff == 0, "grid NN diverged from brute force"


if __name__ == "__main__":
    main()

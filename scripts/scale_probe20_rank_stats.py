"""Scale probe #20: value-level rank statistics.

mann_whitney_by_type's engine path reduces the row set to VALUE-LEVEL
counts before any ranking — the claim is that the expensive part
(one groupBy) tracks ROW count, while the rank stage (prefix_sum on
the distinct-value frame) tracks DISTINCT-value count and is immune
to row growth. The probe times the full tie-corrected z pipeline at
three (rows, distinct) shapes.

Run:  python scripts/scale_probe20_rank_stats.py
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.operators.windows import prefix_sum  # noqa: E402
from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402


def mann_whitney(df):
    vt = df.groupBy("v", "grp").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cells = vt.groupBy("v").agg(F.sum("cnt").cast("long").alias("cnt"))
    ranked = prefix_sum(cells, [F.asc("v")], "cnt", name="c_incl").select(
        "v", (2 * F.col("c_incl") - F.col("cnt") + 1).alias("rank2")
    )
    tot = cells.agg(
        F.sum("cnt").cast("long").alias("n_tot"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie"),
    )
    per = (
        vt.join(ranked, "v")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.col("cnt") * F.col("rank2")).cast("long").alias("r2"),
        )
    )
    n, N = F.col("n"), F.col("n_tot")
    u2 = F.col("r2") - n * (n + 1)
    var = (
        n.cast("double") * (N - n) / 12
        * ((N + 1) - F.col("tie").cast("double") / (N.cast("double") * (N - 1)))
    )
    z = (u2.cast("double") - n * (N - n)) / (2 * F.sqrt(var))
    return per.crossJoin(F.broadcast(tot)).select("grp", "n", z.alias("z"))


def main() -> None:
    spark = get_spark("scale_probe20_rank")
    shapes = [
        (50_000_000, 10_000),
        (100_000_000, 10_000),
        (100_000_000, 1_000_000),
    ]
    for rows, distinct in shapes:
        df = spark.range(rows).select(
            ((F.col("id") * 2654435761) % distinct).alias("v"),
            (F.col("id") % 2).alias("grp"),
        )
        t0 = time.time()
        out = mann_whitney(df).collect()
        dt = time.time() - t0
        z = {r["grp"]: round(r["z"], 4) for r in out}
        print(
            f"rows={rows:,} distinct={distinct:,}: wall={dt:.1f}s "
            f"({rows / dt / 1e6:.0f}M rows/s) z={z}"
        )


if __name__ == "__main__":
    main()

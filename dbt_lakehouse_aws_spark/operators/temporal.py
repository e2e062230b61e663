"""Temporal joins Spark lacks as built-ins: as-of join and banded
range join (engine extensions; the reference's Athena/Trino surface
has no temporal-join model — closest is its latest-snapshot filter,
`src_fangraphs_*.sql:17-21`, which is the degenerate "as of now").

Both are expressed as compositions of shuffle-friendly built-ins —
no UDF, no nested-loop join — so they hold at 100 TB:

* ``as_of_join``: union the two sides tagged, one sort per key by
  (time, side), and a running ``last(struct, ignorenulls=True)``
  carries the most recent right row onto every left row.  ONE
  shuffle of left+right by key; no point-in-time subquery per row,
  no range explosion.  The struct wrapper keeps legitimately-NULL
  right payload columns from leaking an older row's value.
* ``range_join``: each left row explodes into the fixed-width time
  bands its window overlaps (≤ ``(upper-lower)/band + 2`` copies),
  the join becomes an equi-join on (key, band) — hash-partitioned,
  AQE-planable — and the exact interval predicate filters the band
  collisions.  Without banding Spark plans inequality joins as
  BroadcastNestedLoopJoin: O(|L|·|R|) compare and a broadcast of a
  whole side, both non-starters at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "asof_",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the latest right
    row with ``right_ts <= left_ts`` (per ``on`` key); no match →
    NULLs (left-outer semantics, DuckDB ``ASOF LEFT JOIN``).

    Right's non-key columns arrive prefixed with ``right_prefix``
    (its timestamp as ``{prefix}{right_ts}``).  ``tolerance`` (e.g.
    ``"2 hours"``) nulls out matches older than the window, like
    pandas ``merge_asof(tolerance=...)``.

    Equal timestamps on both sides DO match (<=): right rows sort
    before left rows at ties via the side tag.
    """
    on = list(on)
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in rcols]
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    l_tag = left.select("*", F.col(left_ts).alias("_t"), F.lit(1).alias("_side"))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    if tolerance is not None:
        n, unit = tolerance.split()
        too_old = F.col("_m")[right_ts] + F.expr(f"INTERVAL {int(n)} {unit.upper()}") < F.col(left_ts)
        out = out.withColumn("_m", F.when(too_old, F.lit(None)).otherwise(F.col("_m")))
    return out.select(
        *left.columns,
        F.col("_m")[right_ts].alias(f"{right_prefix}{right_ts}"),
        *[F.col("_m")[c].alias(f"{right_prefix}{c}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hours",
    band_seconds: int | None = None,
) -> DataFrame:
    """Inner join of right rows falling in ``(left_ts + lower,
    left_ts + upper]`` per key — strict ``>`` on the lower bound so
    ``lower="0 seconds"`` means "strictly after", the event-
    attribution shape.

    Each left row is exploded onto the epoch-second bands its window
    can touch; the band index joins hash-to-hash against right's
    single band.  ``band_seconds`` defaults to the window width (≤ 2
    copies per left row).  Column names must not collide across
    sides (select/rename first) — both sides' columns pass through.
    """
    on = list(on)
    lo_s, up_s = (_seconds(lower), _seconds(upper))
    band = band_seconds or max(up_s - lo_s, 1)
    lo_i, up_i = (F.expr(f"INTERVAL {lo_s} SECONDS"), F.expr(f"INTERVAL {up_s} SECONDS"))

    l_epoch = F.unix_timestamp(F.col(left_ts))
    bands = F.sequence(
        F.floor((l_epoch + lo_s) / band),
        # +1 covers epoch-second truncation at the upper boundary
        F.floor((l_epoch + up_s) / band) + 1,
    )
    l_b = left.withColumn("_band", F.explode(bands))
    r_b = right.withColumn("_band", F.floor(F.unix_timestamp(F.col(right_ts)) / band))
    cond = (
        (F.col(right_ts) > F.col(left_ts) + lo_i)
        & (F.col(right_ts) <= F.col(left_ts) + up_i)
    )
    return l_b.join(r_b, on + ["_band"], "inner").filter(cond).drop("_band")


def _seconds(spec: str) -> int:
    n, unit = spec.split()
    factor = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3_600, "hours": 3_600,
        "day": 86_400, "days": 86_400,
    }[unit]
    return int(n) * factor

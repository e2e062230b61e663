"""Slowly-changing-dimension (type 2) collapse — the engine's
counterpart of dbt's ``snapshot`` materialization (the reference's
dbt project gets SCD2 for free from dbt core; here it's an explicit
operator over periodic snapshot rows).

Given per-period state observations (key, state, period), emit one
row per *run* of consecutive identical state: (key, state,
valid_from, valid_to, n_periods).  Same single-shuffle window shape
as sessionization: lag → change flag → running sum → group-by that
reuses the exchange's distribution.  No MERGE loop, no driver-side
diffing — at 100 TB it's one repartition by key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Collapse consecutive equal-state observations into validity
    ranges. A run breaks when ANY state column changes (NULL-safe:
    first observation always opens a run). ``order_col`` must be
    unique per key (a period/date/ts column)."""
    keys, states = list(key_cols), list(state_cols)
    w = Window.partitionBy(*keys).orderBy(order_col)
    # run-break = any state column IS DISTINCT FROM its predecessor
    # (eqNullSafe: NULL→NULL continues a run; the first observation,
    # whose lag is NULL against a non-null state, opens one)
    changed = F.lit(False)
    for c in states:
        prev = F.lag(c).over(w)
        changed = changed | ~prev.eqNullSafe(F.col(c))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flag = F.when(changed, F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("_run", F.sum(flag).over(running))
        .groupBy(*keys, "_run", *states)
        .agg(
            F.min(order_col).alias("valid_from"),
            F.max(order_col).alias("valid_to"),
            F.count(F.lit(1)).alias("n_periods"),
        )
        .drop("_run")
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    keys: Sequence[str],
    at_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Temporal dimension lookup: enrich each fact with the SCD2
    dimension row that was valid AT the fact's time —
    ``key match AND valid_from <= at <= valid_to`` (both bounds
    inclusive, matching :func:`scd2_collapse`'s observed-period
    ranges). The classic warehouse "as-was" join: reports must see
    the attribute a customer HAD when the order shipped, not today's.

    Plan shape: an equi-join on the keys with the validity window as
    an additional join predicate — Catalyst plans the hash/sort-merge
    join on the selective keys and evaluates the range condition
    inside it, so this is never a nested loop (same argument as the
    engine's as-of join, but SCD2 ranges are non-overlapping per key
    BY CONSTRUCTION, so each fact matches at most one dimension row
    and the join can't fan out).

    A NULL ``valid_to`` is treated as the open-ended CURRENT row
    (the common external-SCD2 convention): the upper bound is
    ``at <= coalesce(valid_to, +inf)``, so current rows match
    instead of silently never matching (ADVICE r3).
    ``scd2_collapse`` itself always closes rows, but external SCD2
    sources routinely don't.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"point_in_time_join supports inner/left, got {how!r}")
    cond = None
    for k in keys:
        c = facts[k] == dim[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (facts[at_col] >= dim[valid_from])
        & (
            dim[valid_to].isNull()
            | (facts[at_col] <= dim[valid_to])
        )
    )
    joined = facts.join(dim, cond, how)
    # drop the dim side's duplicated key columns
    for k in keys:
        joined = joined.drop(dim[k])
    return joined


def scd2_apply_changes(
    initial: DataFrame,
    changes: DataFrame,
    *,
    keys: Sequence[str],
    state_cols: Sequence[str],
    version_col: str = "_version",
    change_col: str = "_change_type",
) -> DataFrame:
    """Build SCD2 validity ranges from an INITIAL snapshot plus a CDC
    change feed (the Delta-CDF/``row_changes`` shape: rows carrying
    ``_change_type`` ∈ {insert, update, delete} and a commit version)
    — dimension-history maintenance from a change stream, the
    composition every warehouse needs between its CDC source and its
    point-in-time joins.

    Semantics: the initial rows open ranges at version 0; each
    insert/update opens a new range at its version and closes the
    key's previous range at ``version - 1``; a delete closes the
    previous range without opening one (the tombstone emits no state
    row). The current range's ``valid_to`` is NULL — the open-ended
    convention ``point_in_time_join`` accepts directly.

    One shuffle: union → per-key window (lead over version) → filter.
    Change feeds are deltas (bounded by activity, not dimension
    size), so the union is dominated by the initial snapshot scan.
    ``version_col`` must be unique per key (one change per key per
    commit — guaranteed by MERGE's duplicate-key guard).
    """
    keys = list(keys)
    states = list(state_cols)
    base = initial.select(
        *keys,
        *states,
        F.lit(0).cast("long").alias(version_col),
        F.lit("insert").alias(change_col),
    )
    feed = changes.select(
        *keys,
        *states,
        F.col(version_col).cast("long").alias(version_col),
        F.col(change_col),
    )
    allrows = base.unionByName(feed)
    w = Window.partitionBy(*keys).orderBy(version_col)
    nxt = F.lead(version_col).over(w)
    return (
        allrows.withColumn("valid_from", F.col(version_col))
        .withColumn(
            "valid_to",
            F.when(nxt.isNotNull(), nxt - 1).otherwise(F.lit(None).cast("long")),
        )
        .filter(F.col(change_col) != "delete")
        .select(*keys, *states, "valid_from", "valid_to")
    )

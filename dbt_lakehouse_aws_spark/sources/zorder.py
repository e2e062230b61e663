"""Z-order (Morton) multi-dimensional clustering for columnar sinks.

``sort_by`` clustering (catalog.py) skips row groups on ONE key;
queries that slice on several independent columns (ship date AND
part, lat AND lon) need the stored order to preserve locality in
every dimension at once. The standard lakehouse answer (Delta/
Iceberg ``OPTIMIZE ZORDER BY``) is a space-filling curve: normalize
each key to a fixed-width integer, interleave the bits, sort by the
interleaved key.

This implementation is pure Catalyst bit arithmetic (shiftleft /
bitwiseOR — whole-stage codegen, no UDF):

* each column is range-normalized to ``bits`` bits via its global
  min/max (one tiny scalar aggregate, collected — same
  two-pass-as-scalar shape as the latest-snapshot operator);
* bit *i* of column *j* lands at interleaved position
  ``i·n_cols + j``, giving the classic Morton layout where any z-key
  range bounds every dimension;
* total key width = bits × n_cols ≤ 63 (long-safe, ANSI-safe).

Min/max normalization is value-linear, so heavy skew degrades bucket
balance (same caveat Delta documents); percentile-based boundaries
would fix that at the cost of a quantile pass — noted, not needed
for the range-sliced keys this engine z-orders.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.operators.relational import zorder_key as morton_key


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 16,
    out: str = "_z",
) -> DataFrame:
    """Attach the Morton-interleaved sort key for ``cols``.

    Numeric columns only; ``bits × len(cols)`` must stay ≤ 63.
    NULL values coalesce to the column's low bound (cluster first in
    z-order) rather than producing NULL keys that land arbitrarily;
    an empty input or an all-NULL column (no usable min/max) raises a
    clear error instead of a downstream TypeError.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits × n_cols must fit in a signed long")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_max_{c}") for c in cols],
    ).collect()[0]

    top = (1 << bits) - 1
    normed: list[Column] = []
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"cannot z-order on {c!r}: empty input or all-NULL column "
                "(no min/max to normalize against)"
            )
        span = (hi - lo) or 1.0
        scaled = (F.coalesce(F.col(c).cast("double"), F.lit(lo)) - F.lit(lo)) / F.lit(
            span
        ) * top
        normed.append(F.round(scaled).cast("long"))

    # the interleave itself is the shared Morton primitive
    # (operators/relational.py::zorder_key — also exposed raw for
    # pre-bucketed integer keys and value-oracled by the
    # zorder_cells_events query); this wrapper adds the min/max
    # range normalization and the DataFrame plumbing
    return df.withColumn(out, morton_key(*normed, bits=bits))


def zorder_write_order(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 16,
    num_ranges: int | None = None,
) -> DataFrame:
    """Re-lay ``df`` in z-order: range-partition on the Morton key
    (each output file covers a disjoint z interval → a disjoint
    bounding box per file) and sort within partitions, then drop the
    key. Feed straight to a parquet/ORC writer."""
    keyed = zorder_key(df, cols, bits=bits)
    if num_ranges:
        keyed = keyed.repartitionByRange(num_ranges, F.col("_z"))
    return keyed.sortWithinPartitions("_z").drop("_z")

"""Skew-mitigation operators (SURVEY §4: "skewed keys → salting or
AQE skew-join").

AQE's skew-join splitting handles sort-merge joins whose partitions
are detectably oversized at runtime. Salting is the explicit tool
for the cases AQE can't fix — a single pathological hot key, or a
shuffle feeding a non-join operator. Nothing in the reference needs
this at its scale; at 100 TB (e.g. deduping a corpus where one
boilerplate shingle appears in half the documents) it's the
difference between one straggler task and an even spread.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, *, num_salts: int, salt_on: Column | None = None) -> DataFrame:
    """Append a salt in [0, num_salts).

    Deterministic when ``salt_on`` (any column expression, e.g. a
    row id) is given — hash mod; otherwise a seeded uniform draw.
    """
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(salt_on), F.lit(num_salts)).cast("int")
    else:
        salt = F.floor(F.rand(seed=42) * num_salts).cast("int")
    return df.withColumn(SALT_COL, salt)


def replicate_for_salt(df: DataFrame, *, num_salts: int) -> DataFrame:
    """Explode the build side once per salt value so every salted
    partition of the probe side finds its match."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    *,
    num_salts: int = 8,
    how: str = "inner",
    salt_on: Column | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys on the ``skewed`` side.

    The skewed (probe) side gets a salt; the other (build) side is
    replicated ``num_salts``×; the join key becomes (keys…, salt) so
    a hot key's rows spread over ``num_salts`` shuffle partitions
    instead of one straggler. Build-side inflation is the price —
    use for large-large joins where the build side is itself too big
    to broadcast but small enough to replicate.

    Semantics match ``skewed.join(other, on, how)`` for inner/left
    joins (each skewed row still meets each matching build row
    exactly once — its own salt's copy).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    a = with_salt(skewed, num_salts=num_salts, salt_on=salt_on)
    b = replicate_for_salt(other, num_salts=num_salts)
    return a.join(b, [*on, SALT_COL], how).drop(SALT_COL)

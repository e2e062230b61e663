"""KMV (k-minimum-values) distinct sketches with set operations.

HLL (``aggregates.distinct_sketch_rollup``) answers *union* distinct
counts; it cannot intersect. KMV sketches can: the k smallest hash
values of a set are a uniform bottom-k sample of its hash space, so
for two groups A and B the k smallest of :math:`S_A \\cup S_B` are a
bottom-k sample of the union, and the fraction of that sample present
in BOTH sketches is an unbiased Jaccard estimator (Beyer et al.,
"On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD'07). That gives union, intersection, and overlap
coefficients between any pair of segments from k-sized summaries —
without rescanning the raw data.

100 TB shape: building the sketches is one (group, hash)-distinct
shuffle followed by a per-group bottom-k window — both fully
distributed, with map-side partial dedup before the exchange; each
group's state is bounded at k longs. Pairwise set operations then run
on the *sketch* table (|groups| rows of k longs), which is broadcast-
sized for any realistic segment count, and every array expression is
JVM-side (``array_union`` / ``array_intersect`` / ``slice``), no UDFs.

The reference warehouse has no sketch infrastructure (its Athena SQL
recomputes distinct counts per query, e.g. roster joins in
``models/mart/*.sql``); this is the scale-path replacement.

Hash modes mirror ``llmops.dedup``: xxhash64 by default (cheapest),
``portable=True`` swaps in the 60-bit md5-prefix hash that an
external SQL oracle can replay bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.dedup import _portable_hash60

#: hash-space size for the portable 60-bit hash (estimator numerator).
PORTABLE_SPACE = float(1 << 60)


def _raw_hash(col: str | Column, *, portable: bool) -> Column:
    """Full-width value hash — deliberately NOT ``dedup._base_hash``,
    which folds into [0, 2^31) for MinHash's affine transforms; the
    KMV estimator needs the hash uniform over its whole declared
    space (2^60 portable / signed 2^64 default) or cardinality
    estimates are off by the fold factor."""
    return _portable_hash60(col) if portable else F.xxhash64(col)


def kmv_sketch(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str | Column,
    k: int = 64,
    portable: bool = False,
) -> DataFrame:
    """One row per group: ``kmv`` = sorted array of the k smallest
    distinct value hashes, ``n_kept`` = its size (< k iff the group
    has fewer than k distinct values — the sketch is then exhaustive
    and estimates become exact counts).

    Two-stage distributed plan: (group, hash) distinct (partial
    aggregate before the shuffle collapses duplicate values map-side)
    → per-group ``row_number`` over hash ascending → keep rank ≤ k →
    ``collect_list`` bounded at k elements per group.

    xxhash64 values are signed; shifting into non-negative space is
    unnecessary for correctness (ordering by the signed value is a
    uniform bottom-k of the signed space) but the *estimator* needs
    an unambiguous space size, so ``portable=True`` (60-bit
    non-negative) is required by :func:`kmv_pairwise_overlap`'s
    cardinality estimates; the default mode still supports exact
    Jaccard-style overlap fractions.
    """
    hashed = df.select(
        F.col(group_col).alias("group_key"),
        _raw_hash(value_col, portable=portable).alias("hv"),
    ).distinct()
    w = Window.partitionBy("group_key").orderBy("hv")
    mode = "portable60" if portable else "xxhash64"
    return (
        hashed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy("group_key")
        .agg(
            F.sort_array(F.collect_list("hv")).alias(
                # hash mode rides in column metadata so consumers that
                # need a specific space size can verify without a job
                "kmv", metadata={"hash_mode": mode}
            )
        )
        .withColumn("n_kept", F.size("kmv").cast("long"))
    )


def kmv_pairwise_overlap(sketches: DataFrame, *, k: int) -> DataFrame:
    """Pairwise union / intersection / Jaccard estimates between every
    pair of groups, from sketches alone (requires ``portable=True``
    sketches — the estimator divides the 60-bit hash space by the
    k-th order statistic).

    For each pair: ``U`` = k smallest of the merged hash sets,
    ``m = |U|``; ``jaccard_est`` = fraction of ``U`` present in both
    sketches; ``union_est`` = ``m`` when the merged sketch is
    exhaustive (m < k), else the bottom-k estimator
    ``(k-1) * 2^60 / U[k-1]``; ``intersection_est`` =
    ``jaccard_est * union_est``. All arithmetic is double-precision
    with identical operation order on the oracle side, so results are
    bit-comparable after rounding.

    The self-join is over the *sketch* table — tiny by construction —
    and every expression is a JVM array function; Spark broadcasts
    the build side automatically under AQE.

    Raises ``ValueError`` unless the sketches carry the
    ``hash_mode=portable60`` metadata stamped by
    ``kmv_sketch(portable=True)``: default xxhash64 sketches have
    signed 64-bit hashes, so dividing the 2^60 portable space by a
    possibly-negative k-th order statistic would silently yield
    negative/nonsense cardinality estimates (ADVICE r3).
    """
    mode = sketches.schema["kmv"].metadata.get("hash_mode")
    if mode != "portable60":
        raise ValueError(
            "kmv_pairwise_overlap requires kmv_sketch(portable=True) "
            f"sketches (hash_mode metadata is {mode!r}); the cardinality "
            "estimator divides the 60-bit portable hash space by the "
            "k-th order statistic, which is meaningless for signed "
            "xxhash64 sketches"
        )
    a = sketches.select(
        F.col("group_key").alias("group_a"),
        F.col("kmv").alias("kmv_a"),
        F.col("n_kept").alias("n_a"),
    )
    b = sketches.select(
        F.col("group_key").alias("group_b"),
        F.col("kmv").alias("kmv_b"),
        F.col("n_kept").alias("n_b"),
    )
    merged = F.slice(F.array_sort(F.array_union("kmv_a", "kmv_b")), 1, k)
    paired = (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .withColumn("u", merged)
        .withColumn("m", F.size("u"))
        .withColumn(
            "both", F.size(F.array_intersect(F.array_intersect("u", "kmv_a"), "kmv_b"))
        )
    )
    # F.get (0-based) returns NULL out-of-bounds even under ANSI mode,
    # unlike element_at which would throw for m < k rows.
    union_est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(F.lit((k - 1) * PORTABLE_SPACE) / F.get("u", k - 1).cast("double"))
    jac = F.col("both").cast("double") / F.col("m").cast("double")
    return (
        paired.withColumn("union_est", union_est)
        .select(
            "group_a",
            "group_b",
            F.round(jac, 6).alias("jaccard_est"),
            F.round("union_est", 2).alias("union_est"),
            F.round(jac * F.col("union_est"), 2).alias("intersection_est"),
        )
        .orderBy("group_a", "group_b")
    )


def count_min_sketch(
    df: DataFrame,
    *,
    value_col: str | Column,
    depth: int = 4,
    width: int = 256,
    weight_col: str | Column | None = None,
    portable: bool = False,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) as a relational
    build: ``depth × width`` counters where row ``r`` increments
    bucket ``h_r(value) mod width``. Returns the sketch as rows
    ``(row, bucket, cnt)`` — a table of at most depth·width rows that
    merges across shards/days by simple (row, bucket) summation,
    which is the whole point of the sketch at 100 TB: per-partition
    frequency state in KB, mergeable with a groupBy.

    The ``depth`` hash rows reuse one base hash with per-row salts
    (standard pairwise trick); ``portable=True`` swaps in the
    md5-prefix hash so an external SQL engine replays every counter.
    One explode(depth) + one groupBy — shuffle bounded by
    depth·width after map-side combine, never by data size.

    (Spark also ships a built-in ``count_min_sketch`` aggregate that
    returns an opaque binary; this relational form exists so the
    sketch is queryable, mergeable with plain SQL, and oracle-
    checkable.)
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    wcol = (
        F.lit(1).cast("long")
        if weight_col is None
        else (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
            "long"
        )
    )
    salted = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        v.cast("string").alias("_v"),
        wcol.alias("_w"),
    )
    h = _raw_hash(
        F.concat(F.col("row").cast("string"), F.lit("|"), F.col("_v")),
        portable=portable,
    )
    return (
        salted.withColumn("bucket", F.pmod(h, F.lit(width)).cast("int"))
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    *,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    portable: bool = False,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each
    requested value, ``min`` over its depth counters (missing
    counter → 0). Never under-estimates; over-estimates by collision
    mass with probability shrinking as e^-depth.

    The probe side explodes to its depth (row, bucket) keys and joins
    the sketch — the sketch side is at most depth·width rows, so the
    join is broadcast-sized no matter how big the original data was.
    """
    v = F.col(value_col)
    probes = values.select(
        v.alias("value"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    h = _raw_hash(
        F.concat(F.col("row").cast("string"), F.lit("|"), F.col("value").cast("string")),
        portable=portable,
    )
    probes = probes.withColumn("bucket", F.pmod(h, F.lit(width)).cast("int"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count"))
    )

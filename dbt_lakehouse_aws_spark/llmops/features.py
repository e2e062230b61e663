"""ML feature-engineering operators for training-data pipelines.

The reference warehouse stops at serving aggregates (its Athena SQL
mart, ``models/mart/*.sql``); a training-data platform additionally
needs leakage-safe feature transforms that are deterministic across
runs, engines, and partition layouts. Every operator here is a pure
DataFrame expression (no UDFs, no state): adding a feature column to
100 TB costs one scan, and the portable-hash variants replay in an
external SQL engine for audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    *,
    cat_col: str,
    target_col: str,
    out_col: str = "te_loo",
    decimals: int | None = 6,
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is encoded
    as the mean target of the OTHER rows in its category,
    ``(sum(target) - target_i) / (n - 1)`` — the standard
    leakage-safe categorical encoding (a row never sees its own
    label; plain mean encoding leaks the target into the feature).
    Singleton categories fall back to the GLOBAL mean of the other
    rows, ``(total_sum - target_i) / (total_n - 1)`` — the same
    leave-one-out rule applied at the corpus level, never the row's
    own target.

    Plan shape: one ``Window.partitionBy(cat)`` sum/count (a single
    hash-partition exchange — bounded state per key, no sort needed
    for an unbounded frame) plus a broadcast 1-row global aggregate.
    No iteration, no UDF; at 100 TB this is one shuffle of
    (cat, target) pairs.
    """
    w = Window.partitionBy(cat_col)
    totals = df.agg(
        F.sum(target_col).alias("_gsum"), F.count(F.lit(1)).alias("_gn")
    )
    t = F.col(target_col)
    enc = F.when(
        F.count(F.lit(1)).over(w) > 1,
        (F.sum(t).over(w) - t) / (F.count(F.lit(1)).over(w) - 1),
    ).otherwise((F.col("_gsum") - t) / (F.col("_gn") - 1))
    # decimals=None skips rounding: with an integer-valued target the
    # encoding is already the same binary double on every engine, and
    # Spark's decimal-string HALF_UP round can diverge from binary
    # rounding at exact half-way values — leave exact values exact
    if decimals is not None:
        enc = F.round(enc, decimals)
    return (
        df.crossJoin(F.broadcast(totals))
        .withColumn(out_col, enc)
        .drop("_gsum", "_gn")
    )


def feature_hash_tokens(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "fh-v1",
) -> DataFrame:
    """Hashing-trick bag-of-tokens features (Weinberger et al.,
    "Feature Hashing for Large Scale Multitask Learning", ICML'09):
    each token maps to ``hash(salt:token) mod n_buckets`` and the
    document's sparse feature vector is the per-bucket token count —
    fixed dimensionality with no vocabulary to build, ship, or keep
    consistent between training and serving.

    The hash is the portable 60-bit md5 prefix (shared with dedup's
    oracle mode), so bucket assignment is identical across engines
    and replayable in SQL. One explode + hash-agg; shuffle is
    bounded by docs × distinct-buckets-per-doc, never vocabulary
    size.

    Returns (id, bucket, cnt) sparse rows.
    """
    from dbt_lakehouse_aws_spark.llmops.dedup import _portable_hash60

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).filter(F.length("_tok") > 0)
    return (
        toks.withColumn(
            "bucket",
            F.pmod(
                _portable_hash60(F.concat(F.lit(salt + ":"), F.col("_tok"))),
                F.lit(n_buckets).cast("long"),
            ).cast("int"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def kfold_split(
    df: DataFrame,
    *,
    id_col: str,
    k: int = 5,
    salt: str = "fold-v1",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = hash(salt:id) mod
    k`` with the portable 60-bit md5 prefix — cross-validation folds
    that are stable across runs, engines, partition layouts, and
    cluster sizes (sibling of :func:`~...llmops.corpus.group_split`,
    which cuts FRACTIONS by group; this cuts equal-probability FOLDS
    by id). Pure projection: no shuffle, no state.
    """
    from dbt_lakehouse_aws_spark.llmops.dedup import _portable_hash60

    return df.withColumn(
        out_col,
        F.pmod(
            _portable_hash60(
                F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
            ),
            F.lit(k).cast("long"),
        ).cast("int"),
    )


def temporal_split_purged(
    df: DataFrame,
    *,
    ts_col: str,
    test_start,
    purge,
    out_col: str = "split",
) -> DataFrame:
    """Temporal train/test split with a purge gap (the backtest
    hygiene rule from de Prado, "Advances in Financial Machine
    Learning", ch. 7 — and the time-series analogue of
    ``group_split``): rows before ``test_start - purge`` train, rows
    from ``test_start`` on test, and rows inside the gap are marked
    ``purged`` and used by neither — features computed with lookback
    windows near the boundary would otherwise leak test-period
    information into training.

    ``test_start`` is a timestamp/date literal or column expression;
    ``purge`` is a Spark interval expression (e.g.
    ``F.expr("INTERVAL 7 DAYS")``). Pure projection — one codegen'd
    CASE, no shuffle.
    """
    ts = F.col(ts_col)
    start = F.lit(test_start) if not hasattr(test_start, "_jc") else test_start
    return df.withColumn(
        out_col,
        F.when(ts < start - purge, F.lit("train"))
        .when(ts >= start, F.lit("test"))
        .otherwise(F.lit("purged")),
    )


def quantile_normalize(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    tie_cols: list[str],
    out_col: str = "qn_value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Quantile normalization across sources: map every value onto
    the POOLED distribution at its within-group quantile position —
    ``x -> Q_pool(F_group(x))`` — so each group's normalized
    distribution matches the corpus-wide one. The training-data use
    case: per-source quality/length scores drift by source (one
    crawl's "0.8" is another's "0.5"); normalizing onto the pooled
    ECDF makes a single global threshold mean the same thing in
    every source.

    Exact-integer contract: the target pooled position is
    ``j = (r-1)(N-1) div (n_g-1) + 1`` (1-based; a group of one maps
    to the pooled lower median ``(N+1) div 2``) — pure BIGINT
    arithmetic, no interpolation, so the normalized value is an
    ACTUAL pooled value and an external engine replays the mapping
    bit-exactly. A group covering the whole pool maps to itself
    (``n_g = N`` makes ``j = r``): identity is a fixed point.

    Scale shape (the reason this is not two ``Window.partitionBy``
    calls): both ranks come from :func:`global_row_number`'s
    two-pass range-partitioned design, so a 10-source 100 TB corpus
    never funnels a source into one task — per-group ranks are
    derived by subtracting each group's global start offset (one
    tiny broadcast join), and the pooled lookup is an equi-join on
    the BIGINT position. Three shuffles total (two range exchanges +
    one position join), independent of group skew.

    ``tie_cols`` must complete a total order (unique key) or ranks —
    and therefore the mapping — are nondeterministic.
    """
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number

    order_group = [F.col(group_col).asc(), F.col(value_col).asc()] + [
        F.col(c).asc() for c in tie_cols
    ]
    order_pool = [F.col(value_col).asc()] + [F.col(c).asc() for c in tie_cols]

    keep = [group_col, value_col, *tie_cols]
    base = df.select(*keep)

    pooled = global_row_number(
        base, order_pool, name="_prn", num_partitions=num_partitions
    )
    lookup = pooled.select(
        F.col("_prn").alias("_j"), F.col(value_col).alias(out_col)
    )

    grouped = global_row_number(
        base, order_group, name="_grn", num_partitions=num_partitions
    )
    # group start offsets + sizes: one distributed aggregate, tiny result
    stats = grouped.groupBy(group_col).agg(
        F.min("_grn").alias("_g0"), F.count(F.lit(1)).alias("_ng")
    )
    n_total = base.count()
    ranked = (
        grouped.join(F.broadcast(stats), group_col)
        .withColumn("_r", (F.col("_grn") - F.col("_g0") + F.lit(1)).cast("long"))
        .withColumn(
            "_j",
            F.when(
                F.col("_ng") == 1, F.lit((n_total + 1) // 2).cast("long")
            ).otherwise(
                F.expr(f"(_r - 1L) * {n_total - 1}L div (_ng - 1L) + 1L")
            ),
        )
    )
    return ranked.join(lookup, "_j").select(
        *keep, "_r", F.col("_ng").alias("group_n"), out_col
    ).withColumnRenamed("_r", "group_rank")

"""Window operators (SURVEY.md §2.5 W1-W5).

The reference uses four window shapes: partitioned ``rank()`` (W1),
partitioned ``row_number()`` (W2/W3, incl. 10 parallel category
rank windows over one relation), and **global** ``row_number()``
(W4 — final overall rank). Partitioned windows scale naturally
(one shuffle on the partition key). The global window is the one
place reference semantics fight Spark's execution model: a plain
``Window.orderBy(...)`` with no partition moves the entire relation
to a single task. :func:`global_row_number` provides the scalable
alternative (range-partition + per-partition rank + offset join),
so a 100 TB global ranking never funnels through one executor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_in_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    *,
    name: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    """Partitioned rank column (W1/W2/W3).

    ``method`` ∈ {row_number, rank, dense_rank} — the reference uses
    ``rank`` for latest-file-wins (src_nfbc_adp.sql:15-18) and
    ``row_number`` for category/pool ranks
    (stg_nfbc_ranked_standings.sql:32-41).
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return df.withColumn(name, fn().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    keep_rank_as: str | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number + filter (W3/O2).

    Catalyst rewrites this to a per-partition top-k (rank-limit
    pushdown): each shuffle map task pre-prunes to k rows per group
    before the exchange, so the shuffle volume is O(groups·k), not
    O(rows) — the shape survives 100×.
    """
    ranked = ranked_in_group(df, partition_cols, order_by, name="_rn", method="row_number")
    out = ranked.filter(F.col("_rn") <= k)
    if keep_rank_as:
        return out.withColumnRenamed("_rn", keep_rank_as)
    return out.drop("_rn")


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    name: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global ``row_number() over (order by ...)`` (W4).

    Two-pass, no single-partition shuffle:

    1. ``repartitionByRange`` on the order keys — partition *i* holds
       a contiguous key range, ranges ascending with partition id.
    2. per-partition ``row_number`` (cheap: data already ordered
       within the task after a local sort),
    3. per-partition counts → cumulative offsets (``#partitions``
       rows, computed driver-side), broadcast-joined back.

    ``order_by`` must be a total order (add a unique tiebreaker
    column) for the result to be deterministic.

    At reference scale a plain ``Window.orderBy`` is fine; this
    primitive exists so the same logical op survives 100 TB
    (SURVEY.md §4 item 3).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = df.repartitionByRange(num_partitions, *order_by)
    pid = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_by)
    # Persist before the counts job: repartitionByRange picks its
    # boundaries by sampling, and re-evaluating it in a second job can
    # yield different boundaries — offsets computed against run A
    # would then be applied to run B's partitions. Persisting pins one
    # materialization for both jobs (at cluster scale use DISK_ONLY /
    # checkpoint for the same guarantee).
    local = pid.withColumn("_local_rn", F.row_number().over(w)).persist()

    counts = sorted(local.groupBy("_pid").count().collect(), key=lambda r: r["_pid"])
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]

    offset_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid INT, _offset BIGINT"
    )
    return (
        local.join(F.broadcast(offset_df), "_pid")
        .withColumn(name, (F.col("_local_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )

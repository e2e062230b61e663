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

from dbt_lakehouse_aws_spark.localframe import local_frame
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


def _cumulative_offsets(
    frame: DataFrame, pid: Column, value: Column, out_type: str
) -> DataFrame:
    """(``_pid``, ``_offset``) per Spark partition: the EXCLUSIVE
    prefix of per-partition ``sum(value)`` in partition-id order —
    computed entirely inside the plan (no driver collect, no action
    barrier). Per-partition totals are at most ``num_partitions``
    rows, so the non-equi self-join that forms the prefix is a tiny
    broadcast nested-loop over cluster-width metadata, never data.
    Integer ``out_type`` only: integer addition is order-free, so
    the distributed sum is exactly the sequential one."""
    totals = frame.groupBy(pid.cast("int").alias("_pid")).agg(
        F.sum(value).cast(out_type).alias("_t")
    )
    prev = totals.select(F.col("_pid").alias("_q"), F.col("_t").alias("_pt"))
    return (
        totals.join(F.broadcast(prev), F.col("_q") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum("_pt"), F.lit(0).cast(out_type)).alias("_offset")
        )
    )


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    name: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global ``row_number() over (order by ...)`` (W4).

    One shuffle, no single-partition funnel, no window exchange:

    1. ``repartitionByRange`` on the order keys — partition *i* holds
       a contiguous key range, ranges ascending with partition id —
       then ``sortWithinPartitions`` (task-local sort, no shuffle).
    2. ``monotonically_increasing_id()`` over the sorted partitions
       encodes ``partition_id·2^33 + local_index``, i.e. the local
       rank for free — no ``Window.partitionBy`` hash exchange.
    3. per-partition counts → cumulative offsets, computed IN-PLAN
       (tiny broadcast self-join over ≤ ``num_partitions`` metadata
       rows) and broadcast-joined back. No driver collect: the whole
       primitive is one lazy plan, so a consumer query runs as ONE
       action instead of (collect + main) per call — guide §5 "the
       driver should do almost no data work" plus one fewer
       scheduling barrier per call site.

    The frame is persisted before step 3: ``repartitionByRange``
    samples its boundaries, and evaluating the offsets branch and the
    main branch against two independent materializations could yield
    different partition assignment — the persist pins one sampled
    layout for both (at cluster scale use DISK_ONLY / checkpoint for
    the same pin).

    ``order_by`` must be a total order (add a unique tiebreaker
    column) for the result to be deterministic.

    Project ``df`` down to the columns you need BEFORE calling: the
    persist is a column-pruning barrier, so every input column is
    cached and re-scanned by both post-persist passes.

    A plain ``Window.orderBy`` would shuffle everything to ONE task;
    this primitive exists so the same logical op survives 100 TB
    (SURVEY.md §4 item 3).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = df.repartitionByRange(num_partitions, *order_by).sortWithinPartitions(*order_by)
    tagged = ranged.select("*", F.monotonically_increasing_id().alias("_mono")).persist()

    pid = F.shiftright("_mono", 33)
    local_ix = F.col("_mono").bitwiseAND(F.lit((1 << 33) - 1).cast("long"))

    offsets = _cumulative_offsets(tagged, pid, F.lit(1), "long")

    return (
        tagged.withColumn("_pid", pid.cast("int"))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(name, (local_ix + F.col("_offset") + 1).cast("long"))
        .drop("_pid", "_mono", "_offset")
    )


def interval_union_length(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total length of the UNION of each key's (possibly overlapping)
    intervals — the gaps-and-islands problem (billed machine-hours,
    total user engagement time), where naive SUM double-counts
    overlaps.

    Classic two-window solution, one shuffle on the key:

    1. running max of interval ends over preceding rows (ordered by
       start) — an island breaks where a start exceeds every prior
       end;
    2. running sum of break flags numbers the islands;
    3. per-island extent = max(end) − min(start), summed per key.

    Both windows and both aggregates share the same partition key,
    so Catalyst plans ONE exchange (the W9 shared-exchange shape).
    """
    keys = [F.col(c) for c in key_cols]
    w_order = Window.partitionBy(*keys).orderBy(F.asc(start_col), F.asc(end_col))
    prev_max_end = F.max(end_col).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_break = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    flagged = df.withColumn("_brk", is_break)
    island = F.sum("_brk").over(
        w_order.rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("_island", island)
    per_island = islands.groupBy(*key_cols, "_island").agg(
        (F.max(end_col) - F.min(start_col)).alias("_len")
    )
    return per_island.groupBy(*key_cols).agg(
        F.sum("_len").alias("union_len"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )


def ntile_scalable(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    n: int,
    name: str = "band",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable ``ntile(n) over (order by ...)`` — equi-depth binning
    with NO single-partition window funnel.

    Built on :func:`global_row_number` (one range shuffle + broadcast
    offsets) plus the closed-form ntile band formula: with N total
    rows, ``q = N div n`` and ``m = N mod n``, the first ``m`` bands
    hold ``q+1`` rows and the rest ``q`` — exactly SQL ntile's
    remainder rule, so the result is bit-identical to the built-in on
    any total order. The row count N comes from the same per-partition
    counts ``global_row_number`` already collected; here it's one
    extra scalar broadcast.

    ``order_by`` must be a total order (unique tiebreaker) for
    deterministic band edges.
    """
    ranked = global_row_number(
        df, order_by, name="_gr", num_partitions=num_partitions
    )
    total = ranked.agg(F.count(F.lit(1)).alias("_N"))
    r = F.col("_gr")
    q = F.floor(F.col("_N") / n).cast("long")
    m = (F.col("_N") % n).cast("long")
    big_span = (q + 1) * m  # rows covered by the first m (larger) bands
    band = F.when(
        r <= big_span, F.ceil(r / (q + 1))
    ).otherwise(m + F.ceil((r - big_span) / F.nullif(q, F.lit(0))))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(name, band.cast("long"))
        .drop("_gr", "_N")
    )


def prefix_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    *,
    name: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global running sum ``sum(value) over (order by …
    rows unbounded preceding)`` — the prefix-sum sibling of
    :func:`global_row_number`, same two-pass design, no
    single-partition window funnel:

    1. ``repartitionByRange`` on the order keys + task-local sort,
       then a window partitioned BY SPARK PARTITION ID — a hash
       exchange on ~``num_partitions`` balanced groups, never one
       task — gives each row its within-partition running sum;
    2. per-partition totals → cumulative offsets, broadcast back and
       added. For integral value columns (every call site in the
       engine) the offsets are computed IN-PLAN
       (:func:`_cumulative_offsets` — no driver collect, one action
       per consumer query); floating columns keep the driver-side
       sequential accumulation so the addition ORDER (and thus the
       last-ulp float result) is pinned.

    ``order_by`` must be a total order for a deterministic result.
    The ranged frame is persisted so both passes see the same
    sampled range boundaries (same pin as global_row_number).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .select("*", F.monotonically_increasing_id().alias("_mono"))
        .persist()
    )
    pid = F.shiftright("_mono", 33).cast("int")

    # offsets carry CUMULATIVE sums, so they take the AGGREGATE's
    # type, not the value column's: Spark widens sum(int) to long —
    # typing the offset as the input column would overflow int32 for
    # any large partition prefix. Integral → long, floating → double.
    sum_type = (
        "double"
        if df.schema[value_col].dataType.simpleString() in ("double", "float")
        else "long"
    )
    if sum_type == "long":
        offset_df = _cumulative_offsets(ranged, pid, F.col(value_col), "long")
    else:
        totals = sorted(
            ranged.groupBy(pid.alias("_pid"))
            .agg(F.sum(value_col).alias("_t"))
            .collect(),
            key=lambda r: r["_pid"],
        )
        offsets, acc = [], 0
        for row in totals:
            offsets.append((int(row["_pid"]), acc))
            acc += row["_t"]
        offset_df = local_frame(spark, offsets, f"_pid INT, _offset {sum_type}")

    w = Window.partitionBy(pid).orderBy("_mono")
    return (
        ranged.withColumn("_local", F.sum(value_col).over(w))
        .withColumn("_pid", pid)
        .join(F.broadcast(offset_df), "_pid")
        .withColumn(name, F.col("_local") + F.col("_offset"))
        .drop("_pid", "_mono", "_local", "_offset")
    )

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

from pyspark.sql import DataFrame, SparkSession, Window
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


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users completed step 1,
    then step 2 *strictly after* their earliest step-1 moment, and so
    on (the earliest-qualifying-event semantics every product
    analytics engine uses).

    One pass per step: the survivors-so-far (one row per user,
    monotonically shrinking) join back to the events of the next
    step type. The event side filters on the step type *before* the
    join, and the survivor side is the small one — at 100 TB the
    join is survivor-broadcast or AQE-planned, never a shuffle of
    the raw event log per step.

    Returns (step_idx, step, n_users), one row per step.
    """
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_ty")
    )
    survivors = (
        ev.filter(F.col("_ty") == steps[0]).groupBy("_u").agg(F.min("_ts").alias("_t"))
    )
    counts = [survivors.agg(F.count(F.lit(1)).alias("n_users"))]
    for s in steps[1:]:
        survivors = (
            ev.filter(F.col("_ty") == s)
            .join(survivors, "_u")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        counts.append(survivors.agg(F.count(F.lit(1)).alias("n_users")))
    out = None
    for i, (s, c) in enumerate(zip(steps, counts), start=1):
        row = c.select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col("n_users").cast("long"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def funnel_counts_windowed(
    events: DataFrame,
    steps: Sequence[str],
    *,
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel with a conversion window (the windowFunnel
    shape of telemetry engines): a user converts at step k only if
    steps 1..k happen in order AND all within ``window_seconds`` of
    that user's funnel anchor — the earliest step-1 event (anchored
    earliest-qualifying semantics, deterministic and replayable;
    engines that slide the anchor trade determinism for recall).

    Same scale plan as :func:`funnel_counts` — the survivor set
    (one row per user, monotonically shrinking, carrying the anchor
    and the previous step's time) joins the pre-filtered next-step
    events; never a shuffle of the raw log per step.

    Returns (step_idx, step, n_users).
    """
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
    )
    survivors = (
        ev.filter(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_anchor"))
        .withColumn("_t", F.col("_anchor"))
    )
    counts = [survivors.agg(F.count(F.lit(1)).alias("n_users"))]
    deadline = F.col("_anchor") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    for s in steps[1:]:
        survivors = (
            ev.filter(F.col("_ty") == s)
            .join(survivors, "_u")
            .filter((F.col("_ts") > F.col("_t")) & (F.col("_ts") <= deadline))
            .groupBy("_u", "_anchor")
            .agg(F.min("_ts").alias("_t"))
        )
        counts.append(survivors.agg(F.count(F.lit(1)).alias("n_users")))
    out = None
    for i, (s, c) in enumerate(zip(steps, counts), start=1):
        row = c.select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col("n_users").cast("long"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def interevent_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    decimals: int = 4,
) -> DataFrame:
    """Per-user inter-event-time statistics: number of events, mean /
    min / max gap in seconds between consecutive events (ordered by
    time, ties by nothing — gaps are order statistics of the
    timestamp multiset, so tie order is irrelevant). The standard
    telemetry health signal (burstiness, bot cadence, session
    density).

    One window sort per user partition (a single hash exchange), one
    aggregate. Users with a single event emit NULL gaps.

    Returns (user, n_events, mean_gap_s, min_gap_s, max_gap_s).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    g = events.select(F.col(user_col), F.col(ts_col)).withColumn("_gap", gap)
    return g.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.avg("_gap"), decimals).alias("mean_gap_s"),
        F.round(F.min("_gap"), decimals).alias("min_gap_s"),
        F.round(F.max("_gap"), decimals).alias("max_gap_s"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort-retention matrix: users bucketed by first-activity day,
    counted as active at each day offset since that first day.

    Two aggregates: per-user first day (shuffle O(users)), then a
    distinct (cohort_day, offset, user) count (shuffle O(active
    cells)). The first-day table re-joins the raw events on the user
    key — at scale that's the only big join and it's on the natural
    partition key of an event log.

    Returns (cohort_day, day_offset, n_users).
    """
    day = F.to_date(F.col(ts_col))
    ev = events.select(F.col(user_col).alias("_u"), day.alias("_d"))
    first = ev.groupBy("_u").agg(F.min("_d").alias("cohort_day"))
    cells = (
        ev.join(first, "_u")
        .select(
            "_u",
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
    )
    if max_offset is not None:
        cells = cells.filter(F.col("day_offset") <= max_offset)
    return (
        cells.distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def ewma_last(
    events: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Exponentially weighted moving average of each key's value
    series, evaluated at the key's latest event (the "current decayed
    state" feature every time-series store exposes).

    ``ewma = α·Σ (1−α)^(N−i)·v_i / normalizer`` — expressed as one
    window pass: rank each event within its key, then a weighted sum
    with the decay factored as ``pow(1−α, N−i)``. The exponent is
    bounded by the partition length and non-negative, so the term
    underflows harmlessly to 0 for old events (never overflows).
    One shuffle on the key; no recurrence, no UDF. Uses the
    pandas ``ewm(adjust=True)`` normalization.
    """
    keys = [F.col(c) for c in key_cols]
    # tie-break beyond the timestamp so the rank (hence the decay
    # weights) is deterministic cross-engine when timestamps collide
    order = [F.asc(ts_col)] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = events.select(
        *keys,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_i"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("_n"),
    )
    decay = F.pow(F.lit(1.0 - alpha), (F.col("_n") - F.col("_i")).cast("double"))
    return ranked.groupBy(*key_cols).agg(
        F.round(
            F.sum(F.col("_v") * decay) / F.sum(decay),
            6,
        ).alias("ewma"),
        F.max("_n").cast("long").alias("n_events"),
    )


def gap_fill(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    time_col: str = "ts",
    step: str = "day",
    aggs: dict[str, "F.Column"] | None = None,
    fill: str = "locf",
) -> DataFrame:
    """Time-bucket + dense-grid gap filling (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf`` shape, relationally).

    1. bucket rows to the ``step`` grid (``date_trunc``) and
       aggregate per (group, bucket);
    2. per group, EXPLODE a dense bucket grid between that group's
       min and max bucket — ``F.sequence`` is generated inside
       codegen per group row, so the grid is built distributed,
       never on the driver;
    3. left-join the aggregates onto the grid, then fill holes:
       ``fill='locf'`` carries the last observed value forward via a
       running ``last(ignorenulls=True)`` window, ``'zero'``
       substitutes 0, ``'null'`` leaves holes NULL.

    A ``_gap`` flag marks rows with no observed aggregate value —
    synthesized grid rows, and also real buckets whose first aggregate
    came out NULL (e.g. a SUM over all-NULL inputs): both are "holes"
    from the fill's point of view and both get filled. Scale shape:
    one shuffle
    for the bucket aggregate, one for the per-group window (grid rows
    = groups x buckets, the OUTPUT size — nothing quadratic).
    ``step`` currently maps to ``date_trunc`` units (``day``,
    ``hour``, ``week``, ``month``) with a 1-unit grid stride.
    """
    if fill not in ("locf", "zero", "null"):
        raise ValueError(f"fill must be locf|zero|null, got {fill!r}")
    aggs = aggs or {"n": F.count(F.lit(1))}
    step_interval = {
        "hour": F.expr("INTERVAL 1 HOUR"),
        "day": F.expr("INTERVAL 1 DAY"),
        "week": F.expr("INTERVAL 7 DAY"),
        "month": F.expr("INTERVAL 1 MONTH"),
    }
    if step not in step_interval:
        raise ValueError(f"step must be one of {sorted(step_interval)}, got {step!r}")
    gcols = list(group_cols)
    bucket = F.date_trunc(step, F.col(time_col))
    agged = df.withColumn("_bucket", bucket).groupBy(*gcols, "_bucket").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    spans = agged.groupBy(*gcols).agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    )
    grid = spans.select(
        *gcols,
        F.explode(F.sequence("_lo", "_hi", step_interval[step])).alias("_bucket"),
    )
    filled = grid.join(agged, gcols + ["_bucket"], "left").withColumn(
        "_gap", F.col(next(iter(aggs))).isNull()
    )
    if fill == "locf":
        w = (
            Window.partitionBy(*gcols)
            .orderBy("_bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for n in aggs:
            filled = filled.withColumn(n, F.last(n, ignorenulls=True).over(w))
    elif fill == "zero":
        for n in aggs:
            filled = filled.withColumn(n, F.coalesce(n, F.lit(0).cast(dict(filled.dtypes)[n])))
    return filled.select(*gcols, F.col("_bucket").alias("bucket"), *aggs, "_gap")


def date_spine(
    spark: SparkSession,
    start: str,
    end: str,
) -> DataFrame:
    """Contiguous daily calendar dimension over [start, end] — the
    dbt-utils ``date_spine`` shape (the reference's package dep,
    ``packages.yml:2-3``) as a generated relation: no source scan, no
    seed file, deterministic. One ``sequence`` + ``explode`` over a
    single literal row, then derived calendar attributes; Catalyst
    folds the whole thing to a local relation at toy ranges and a
    one-task generate at century ranges (a 100-year spine is 36 525
    rows — never a scale concern; the JOINS against it are, and those
    are ordinary broadcast joins).

    ``iso_dow`` is ISO (Mon=1..Sun=7) — Spark's ``dayofweek`` is
    Sunday-first while other engines' ``dow`` is 0-based, so the ISO
    form is the only convention that ports cleanly.
    """
    row = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date_day")
    )
    iso_dow = F.weekday("date_day") + 1
    return row.select(
        "date_day",
        F.year("date_day").cast("long").alias("year"),
        F.quarter("date_day").cast("long").alias("quarter"),
        F.month("date_day").cast("long").alias("month"),
        F.dayofmonth("date_day").cast("long").alias("day_of_month"),
        iso_dow.cast("long").alias("iso_dow"),
        (iso_dow >= 6).cast("long").alias("is_weekend"),
        (F.dayofmonth("date_day") == 1).cast("long").alias("is_month_start"),
    )


def activity_streaks(
    df: DataFrame,
    *,
    key_col: str,
    date_col: str,
) -> DataFrame:
    """Gaps-and-islands: per key, the longest run of CONSECUTIVE
    active days, the number of distinct runs, and total active days.

    The classic row_number trick: after deduping to (key, day),
    ``day − row_number()`` is constant within a consecutive run, so
    one partitioned window + two hash aggregates finish the job. All
    windows partition by key — no global ordering, no funnel; skew
    is bounded by days-per-key (≤ calendar days), not events."""
    days = df.select(
        F.col(key_col).alias("key"), F.col(date_col).alias("day")
    ).distinct()
    w = Window.partitionBy("key").orderBy("day")
    runs = (
        days.withColumn("_rn", F.row_number().over(w))
        .withColumn("_grp", F.date_sub(F.col("day"), F.col("_rn")))
        .groupBy("key", "_grp")
        .agg(
            F.count(F.lit(1)).alias("_len"),
            F.min("day").alias("_start"),
        )
    )
    return (
        runs.groupBy("key")
        .agg(
            F.sum("_len").cast("long").alias("n_active_days"),
            F.max("_len").cast("long").alias("longest_streak"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.min_by(
                "_start", F.struct((-F.col("_len")).alias("_neg"), F.col("_start"))
            ).alias("longest_streak_start"),
        )
    )


def cusum_daily_anomaly(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    allowance_sigmas: float = 0.5,
) -> DataFrame:
    """One-sided CUSUM change detection over per-key DAILY counts:
    ``s_0 = 0;  s_t = max(0, s_{t-1} + (x_t − μ_k − κ_k))`` with
    ``κ_k = allowance_sigmas · σ_k`` (per-key sample stddev).

    The max(0, ·) clamp makes the recursion nonlinear — no window
    function expresses it — so the engine first collapses events to
    the per-(key, day) count series (the ONLY O(rows) work, one
    map-side-combinable aggregate), joins the per-key μ/σ, then runs
    the recursion in an Arrow-batched ``applyInPandas`` over each
    key's series: ≤ calendar-days rows per key, thousands of keys in
    parallel, nothing driver-side. An external SQL oracle replays
    the recursion as a recursive CTE over the same series — the
    operation order per step is identical, so 6-dp rounding is
    stable.

    Returns (key, day, n, cusum): the running statistic per day;
    alarm thresholds are a consumer-side filter (``cusum > h·σ``).
    """
    import pandas as pd

    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("key").agg(
        F.avg(F.col("n").cast("double")).alias("_mu"),
        F.stddev_samp(F.col("n").cast("double")).alias("_sd"),
    )
    joined = daily.join(stats, "key")
    # output schema derives the key's type from the input, so numeric
    # or string keys both work (a hardcoded `key string` would make
    # applyInPandas silently cast or fail for long keys)
    key_type = joined.schema["key"].dataType.simpleString()
    schema = f"key {key_type}, day date, n long, cusum double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        mu = float(pdf["_mu"].iloc[0])
        sd = float(pdf["_sd"].iloc[0]) if pd.notna(pdf["_sd"].iloc[0]) else 0.0
        drift = mu + allowance_sigmas * sd
        s, out = 0.0, []
        for x in pdf["n"]:
            s = max(0.0, s + (float(x) - drift))
            out.append(s)
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "day": pdf["day"],
                "n": pdf["n"].astype("int64"),
                "cusum": out,
            }
        )

    return joined.groupBy("key").applyInPandas(fold, schema)


def holt_linear_smooth(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) over per-key
    DAILY counts — the classic short-horizon forecaster for capacity/
    volume series::

        l_1 = x_1,  b_1 = 0
        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    The coupled recursion has no window-function form (each step
    mixes BOTH carried states), so — exactly like
    :func:`cusum_daily_anomaly` — the engine collapses events to the
    per-(key, day) count series first (the only O(rows) work, one
    map-side-combinable aggregate) and folds the recursion per key in
    Arrow-batched ``applyInPandas``: ≤ calendar-days rows per key,
    keys in parallel, nothing driver-side. The SQL oracle replays the
    identical per-step operation order as a recursive CTE (both sides
    use the LITERAL smoothing constants — never ``1−β``, whose
    floating-point value differs from the literal ``0.7``).

    Returns (key, day, n, level, trend, forecast) where ``forecast``
    is the one-step-ahead prediction ``level + trend``.
    """
    import pandas as pd

    a, b1, bt, bt1 = alpha, 1.0 - alpha, beta, 1.0 - beta
    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    key_type = daily.schema["key"].dataType.simpleString()
    schema = (
        f"key {key_type}, day date, n long, level double, trend double,"
        " forecast double"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lvl = trd = None
        levels, trends = [], []
        for x in pdf["n"]:
            x = float(x)
            if lvl is None:
                lvl, trd = x, 0.0
            else:
                prev = lvl
                lvl = a * x + b1 * (lvl + trd)
                trd = bt * (lvl - prev) + bt1 * trd
            levels.append(lvl)
            trends.append(trd)
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "day": pdf["day"],
                "n": pdf["n"].astype("int64"),
                "level": levels,
                "trend": trends,
                "forecast": [l + t for l, t in zip(levels, trends)],
            }
        )

    return daily.groupBy("key").applyInPandas(fold, schema)


def acf_daily(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of the per-key DAILY count series at
    lags 1..``max_lag`` — the seasonality/persistence diagnostic that
    decides smoothing constants and anomaly windows.

    Lags are CALENDAR lags (pairs are (x_t, x_{t−k days}), absent
    days simply contribute no pair) — positional ``lag()`` would
    silently misalign on gappy series. Shape: events collapse to the
    per-(key, day) count frame (the only O(rows) pass); the lag
    dimension is a broadcast 1..max_lag frame, and pairing is one
    equi-join of the tiny daily frame with itself on
    (key, day−lag). Pearson r comes from INTEGER sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy²) — exact BIGINTs, so the
    result is bit-deterministic across partitionings and engines (a
    naive ``corr()`` over doubles varies with aggregation order). r
    is then evaluated in doubles with a fixed expression order both
    engines share.

    Returns (key, lag, n_pairs, acf); acf is NULL where a side has
    zero variance.
    """
    spark = df.sparkSession
    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    lags = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("key"), F.col("day").alias("_bday"), F.col("x").alias("y")
    )
    pairs = a.join(
        b,
        (a["key"] == b["key"])
        & (b["_bday"] == F.date_sub(a["day"], F.col("lag").cast("int"))),
    ).select(a["key"], "lag", "x", "y")
    stats = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return stats.select(
        "key",
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        (num / F.nullif(F.sqrt(vx * vy), F.lit(0.0))).alias("acf"),
    )


def theil_sen_daily_trend(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise slopes of
    the per-key daily count series — the estimator that shrugs off
    the outlier days that wreck least-squares (a3's regression
    slope is its fragile twin; breakdown point 29% vs 0%).

    Events collapse to the per-(key, day) series first (the only
    O(rows) pass); the pairwise-slope set is a per-key self-join of
    that TINY series — O(days²) per key where days is bounded by the
    calendar window, never by event volume. Slopes are integer-count
    differences over integer day gaps (exact IEEE division), and the
    median is the exact interpolated percentile — both engines sort
    the same doubles and midpoint-average the same two, so the
    result needs no rounding.

    Returns (key, n_days, n_pairs, slope_per_day).
    """
    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    a = daily.select("key", F.col("day").alias("_da"), F.col("x").alias("_xa"))
    b = daily.select("key", F.col("day").alias("_db"), F.col("x").alias("_xb"))
    slopes = (
        a.join(b, "key")
        .filter(F.col("_db") > F.col("_da"))
        .select(
            "key",
            (
                (F.col("_xb") - F.col("_xa")).cast("double")
                / F.datediff(F.col("_db"), F.col("_da")).cast("double")
            ).alias("_s"),
        )
    )
    n_days = daily.groupBy("key").agg(F.count(F.lit(1)).alias("n_days"))
    out = slopes.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("percentile(_s, 0.5)").alias("slope_per_day"),
    )
    return n_days.join(out, "key").select(
        "key", F.col("n_days").cast("long").alias("n_days"), "n_pairs", "slope_per_day"
    )


def holt_winters_additive(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    period: int = 7,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple smoothing (level + trend +
    ``period``-step seasonality) over per-key daily counts — the
    third member of the SES → Holt → Holt-Winters family::

        l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ) s_{t−m}

    with the simple deterministic init ``l_1 = x_1, b_1 = 0`` and
    ``s_{t−m} = 0`` while the ring has not filled (documented choice:
    identical on both engines beats a "smarter" init that isn't).
    Seasonality is POSITIONAL on the observed series (index lag m,
    not calendar weekday — gaps compress), same convention as the
    positional recursion in :func:`holt_linear_smooth`.

    The three-state + m-slot ring recursion is even further from a
    window function than Holt's; the engine folds it per key in
    Arrow ``applyInPandas`` over the pre-aggregated daily frame, and
    the oracle carries the ENTIRE ring as m recursive-CTE columns,
    shifting one slot per step — identical op order, literal
    constants on both sides. Returns (key, day, n, level, trend,
    seasonal, forecast) with ``forecast`` the one-step-ahead
    ``l_t + b_t + s_{t+1−m}``.
    """
    import pandas as pd

    a, a1, bt, bt1, g, g1 = (
        alpha, 1.0 - alpha, beta, 1.0 - beta, gamma, 1.0 - gamma,
    )
    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    key_type = daily.schema["key"].dataType.simpleString()
    schema = (
        f"key {key_type}, day date, n long, level double, trend double,"
        " seasonal double, forecast double"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ring = [0.0] * period  # s_{t-m} .. s_{t-1}, ring[0] oldest
        lvl = trd = None
        levels, trends, seas, fcs = [], [], [], []
        for x in pdf["n"]:
            x = float(x)
            s_prev = ring[0]
            if lvl is None:
                lvl, trd = x, 0.0
            else:
                prev = lvl
                lvl = a * (x - s_prev) + a1 * (lvl + trd)
                trd = bt * (lvl - prev) + bt1 * trd
            s_new = g * (x - lvl) + g1 * s_prev
            ring = ring[1:] + [s_new]
            levels.append(lvl)
            trends.append(trd)
            seas.append(s_new)
            fcs.append(lvl + trd + ring[0])  # s_{t+1-m} after shift
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "day": pdf["day"],
                "n": pdf["n"].astype("int64"),
                "level": levels,
                "trend": trends,
                "seasonal": seas,
                "forecast": fcs,
            }
        )

    return daily.groupBy("key").applyInPandas(fold, schema)

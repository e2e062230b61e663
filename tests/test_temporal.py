"""As-of and banded range join: hand-computed semantics, tie and
tolerance edges, and the plan contract (hash join, not nested-loop).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.operators.temporal import as_of_join, range_join


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in [(f.name, f.dataType.simpleString()) for f in df.schema.fields]:
        if c.endswith("ts") and t == "string":
            df = df.withColumn(c, F.to_timestamp(c))
    return df


def test_as_of_join_hand_computed(spark):
    trades = _ts_df(
        spark,
        [
            (1, "2025-01-01 10:00:05", "A"),   # matches quote @10:00:00
            (2, "2025-01-01 10:00:10", "A"),   # tie with quote @10:00:10 → matches it (<=)
            (3, "2025-01-01 09:59:00", "A"),   # before any quote → NULLs
            (4, "2025-01-01 12:00:00", "B"),   # other key
        ],
        "trade_id long, ts string, sym string",
    )
    quotes = _ts_df(
        spark,
        [
            ("2025-01-01 10:00:00", "A", 100.0),
            ("2025-01-01 10:00:10", "A", 101.0),
            ("2025-01-01 11:00:00", "B", 7.0),
        ],
        "ts string, sym string, px double",
    )
    got = {
        r["trade_id"]: (str(r["q_ts"]) if r["q_ts"] else None, r["q_px"])
        for r in as_of_join(trades, quotes, ["sym"], right_prefix="q_").collect()
    }
    assert got == {
        1: ("2025-01-01 10:00:00", 100.0),
        2: ("2025-01-01 10:00:10", 101.0),
        3: (None, None),
        4: ("2025-01-01 11:00:00", 7.0),
    }


def test_as_of_join_tolerance_and_null_payload(spark):
    left = _ts_df(spark, [(1, "2025-01-01 10:00:00", "A")], "id long, ts string, k string")
    right = _ts_df(
        spark,
        [("2025-01-01 06:00:00", "A", 5.0), ("2025-01-01 09:00:00", "A", None)],
        "ts string, k string, v double",
    )
    # latest right row has NULL payload — the struct must carry the
    # NULL, not skip back to the 06:00 row
    [r] = as_of_join(left, right, ["k"]).collect()
    assert str(r["asof_ts"]) == "2025-01-01 09:00:00" and r["asof_v"] is None
    # tolerance 30min: 09:00 is too old → whole match nulled
    [r] = as_of_join(left, right, ["k"], tolerance="30 minutes").collect()
    assert r["asof_ts"] is None and r["asof_v"] is None


def test_range_join_hand_computed(spark):
    clicks = _ts_df(
        spark,
        [(1, "2025-01-01 10:00:00", 7), (2, "2025-01-01 23:59:30", 7)],
        "click_id long, click_ts string, uid long",
    )
    views = _ts_df(
        spark,
        [
            (10, "2025-01-01 10:00:00", 7),  # not strictly after → excluded
            (11, "2025-01-01 10:59:59", 7),  # in window
            (12, "2025-01-01 11:00:00", 7),  # exactly +1h → included (<=)
            (13, "2025-01-01 11:00:01", 7),  # just past → excluded
            (14, "2025-01-02 00:30:00", 7),  # day boundary band crossing
            (15, "2025-01-01 10:30:00", 8),  # other key
        ],
        "view_id long, view_ts string, uid long",
    )
    got = {
        (r["click_id"], r["view_id"])
        for r in range_join(
            clicks, views, ["uid"], left_ts="click_ts", right_ts="view_ts", upper="1 hours"
        ).collect()
    }
    assert got == {(1, 11), (1, 12), (2, 14)}


def test_range_join_plans_as_hash_join(spark):
    """The banded rewrite must produce a hash-partitioned equi-join —
    never BroadcastNestedLoopJoin — so it scales past one executor."""
    ev = _ts_df(
        spark,
        [(1, "2025-01-01 10:00:00", 1, 0.5)],
        "event_id long, ts string, user_id long, value double",
    )
    l = ev.select(F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"), "user_id")
    r = ev.select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"), "user_id")
    plan = range_join(
        l, r, ["user_id"], left_ts="a_ts", right_ts="b_ts", upper="2 hours"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Join" in plan


def test_gap_fill_locf_zero_null_modes(spark):
    """Planted gaps: group 'a' misses days 2-3, group 'b' is dense.
    locf carries values forward, zero substitutes, null leaves holes;
    _gap marks exactly the synthesized rows in every mode."""
    import datetime as dt

    from dbt_lakehouse_aws_spark.operators.temporal import gap_fill

    rows = [
        ("a", dt.datetime(2024, 1, 1, 5), 10.0),
        ("a", dt.datetime(2024, 1, 1, 9), 2.0),
        ("a", dt.datetime(2024, 1, 4, 1), 7.0),
        ("b", dt.datetime(2024, 1, 1, 0), 1.0),
        ("b", dt.datetime(2024, 1, 2, 0), 1.5),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")

    def run(fill):
        out = gap_fill(
            df, group_cols=["g"], time_col="ts", step="day",
            aggs={"val": F.sum("v")}, fill=fill,
        )
        return {
            (r["g"], r["bucket"].day): (r["val"], r["_gap"]) for r in out.collect()
        }

    locf = run("locf")
    assert locf[("a", 1)] == (12.0, False)
    assert locf[("a", 2)] == (12.0, True)   # carried forward
    assert locf[("a", 3)] == (12.0, True)
    assert locf[("a", 4)] == (7.0, False)
    assert locf[("b", 1)] == (1.0, False) and locf[("b", 2)] == (1.5, False)
    assert len(locf) == 6  # 4 'a' days + 2 'b' days, no cross-group bleed

    zero = run("zero")
    assert zero[("a", 2)] == (0.0, True) and zero[("a", 4)] == (7.0, False)

    null = run("null")
    assert null[("a", 3)] == (None, True)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="fill must be"):
        run("bogus")
    with _pytest.raises(ValueError, match="step must be"):
        gap_fill(df, group_cols=["g"], step="fortnight")


def test_gap_fill_hourly_grid(spark):
    """Non-day steps build the right stride."""
    import datetime as dt

    from dbt_lakehouse_aws_spark.operators.temporal import gap_fill

    rows = [("g", dt.datetime(2024, 1, 1, 0, 30), 1.0),
            ("g", dt.datetime(2024, 1, 1, 3, 10), 2.0)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = gap_fill(df, group_cols=["g"], step="hour", aggs={"val": F.sum("v")})
    hours = sorted(r["bucket"].hour for r in out.collect())
    assert hours == [0, 1, 2, 3]


def test_date_spine_attributes_and_bounds(spark):
    """Inclusive bounds, contiguous days, leap-day present, ISO dow
    (2024-01-01 is a Monday → 1), weekend and month-start flags."""
    from dbt_lakehouse_aws_spark.operators.temporal import date_spine

    out = date_spine(spark, "2024-01-01", "2024-03-01").collect()
    days = [r["date_day"].isoformat() for r in out]
    assert days[0] == "2024-01-01" and days[-1] == "2024-03-01"
    assert len(days) == 61 and "2024-02-29" in days
    by = {r["date_day"].isoformat(): r for r in out}
    assert by["2024-01-01"]["iso_dow"] == 1  # Monday
    assert by["2024-01-06"]["iso_dow"] == 6 and by["2024-01-06"]["is_weekend"] == 1
    assert by["2024-01-07"]["iso_dow"] == 7 and by["2024-01-07"]["is_weekend"] == 1
    assert by["2024-01-08"]["is_weekend"] == 0
    assert by["2024-02-01"]["is_month_start"] == 1 and by["2024-02-01"]["quarter"] == 1


def test_funnel_counts_windowed_anchor_deadline(spark):
    """User A completes within the window; user B's step-2 falls
    outside anchor+window and is cut even though the ORDER is right;
    user C re-signs up later but the anchor stays at the EARLIEST
    signup."""
    from datetime import datetime

    from dbt_lakehouse_aws_spark.operators.temporal import funnel_counts_windowed

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ts(mins):
        from datetime import timedelta

        return t0 + timedelta(minutes=mins)

    rows = [
        # A: signup@0, view@10 — inside 30-min window
        (1, ts(0), "signup"), (1, ts(10), "view"),
        # B: signup@0, view@40 — ordered but past the deadline
        (2, ts(0), "signup"), (2, ts(40), "view"),
        # C: signup@0 and @35, view@40 — anchor pinned at the EARLIEST
        # signup, so the later signup does not re-open the window
        (3, ts(0), "signup"), (3, ts(35), "signup"), (3, ts(40), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts_windowed(
            ev, ["signup", "view"], window_seconds=30 * 60
        ).collect()
    }
    assert out == {"signup": 3, "view": 1}


def test_interevent_stats_gaps(spark):
    """Gaps 10s and 30s -> mean 20, min 10, max 30; single-event user
    emits NULL gaps with n_events=1."""
    from datetime import datetime, timedelta

    from dbt_lakehouse_aws_spark.operators.temporal import interevent_stats

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + timedelta(seconds=10)), (1, t0 + timedelta(seconds=40)),
        (2, t0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["user_id"]: r for r in interevent_stats(ev).collect()}
    assert got[1]["n_events"] == 3
    assert got[1]["mean_gap_s"] == 20.0
    assert got[1]["min_gap_s"] == 10.0
    assert got[1]["max_gap_s"] == 30.0
    assert got[2]["n_events"] == 1 and got[2]["mean_gap_s"] is None

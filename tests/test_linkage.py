"""Jaro-Winkler record linkage (llmops/linkage.py): kernel pinned
bit-for-bit against DuckDB's jaro_winkler_similarity, classic
literature values, and the blocked-pairs plan shape."""

import random

import duckdb
import pytest

from dbt_lakehouse_aws_spark.llmops.linkage import jaro_winkler, jw_blocked_pairs


def test_kernel_matches_duckdb_exactly():
    con = duckdb.connect()
    rng = random.Random(99)
    cases = [("", ""), ("a", ""), ("", "b"), ("same", "same")]
    for _ in range(1500):
        s1 = "".join(rng.choice("abcdef-0123") for _ in range(rng.randint(0, 14)))
        s2 = "".join(rng.choice("abcdef-0123") for _ in range(rng.randint(0, 14)))
        cases.append((s1, s2))
    for s1, s2 in cases:
        d = con.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[s1, s2]
        ).fetchone()[0]
        assert jaro_winkler(s1, s2) == pytest.approx(d, abs=1e-12), (s1, s2)


def test_kernel_classic_values():
    # Winkler's canonical pairs under the floored-transposition
    # convention (MARTHA/MARHTA has 2 out-of-order -> t=1, same as
    # strcmp95; these agree with DuckDB)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("dwayne", "duane") == pytest.approx(0.84)
    assert jaro_winkler("", "") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0


def test_blocked_pairs_plan_and_values(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    rows = [
        (1, "25-989-741-2988", "25"),
        (2, "25-989-741-2989", "25"),   # near-dup of 1
        (3, "25-111-222-3333", "25"),
        (4, "13-989-741-2988", "13"),   # same digits, other block: excluded
    ]
    df = spark.createDataFrame(rows, "id long, phone string, cc string")
    got = jw_blocked_pairs(
        df, id_col="id", text_col="phone", block_col="cc", threshold=0.9
    )
    out = {(r["id_a"], r["id_b"]): r["sim"] for r in got.collect()}
    assert (1, 2) in out and out[(1, 2)] >= 0.9
    assert all(a != 4 and b != 4 for a, b in out)  # blocking respected
    expected = round(jaro_winkler("25-989-741-2988", "25-989-741-2989"), 6)
    assert out[(1, 2)] == pytest.approx(expected)
    # plan: one equi-join on the block key, no cartesian, Arrow-batched
    # Python, and the rebalance exchange BELOW the scoring stage (the
    # single-task / filter-pushdown hazards _scored documents)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    assert plan.index("MapInPandas") < plan.index("RoundRobinPartitioning")


def test_precut_keeps_round_up_sims(spark):
    """ADVICE r4 regression: a raw sim in [t − 5e-7, t) rounds UP to
    the threshold at 6dp, so the JVM keep rule (round(sim,6) >= t)
    keeps it — the Python pre-cut and the length band must not drop
    it first. embedding/embeddnig has raw JW 0.97777…(repeating),
    which rounds to 0.977778 > raw."""
    from dbt_lakehouse_aws_spark.llmops.linkage import jaro_winkler, jw_linkage

    raw = jaro_winkler("embedding", "embeddnig")
    t = 0.977778
    assert raw < t  # strictly below the threshold…
    assert round(raw, 6) >= t  # …but rounds up to it

    left = spark.createDataFrame([(1, "embedding", "B")], "lid long, ltxt string, blk string")
    right = spark.createDataFrame([(2, "embeddnig", "B")], "rid long, rtxt string, blk string")
    got = jw_linkage(
        left, right,
        left_id="lid", right_id="rid",
        left_text="ltxt", right_text="rtxt",
        block_col="blk", threshold=t,
    ).collect()
    assert len(got) == 1 and got[0]["sim"] == t

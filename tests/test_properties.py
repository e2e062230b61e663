"""Property-based tests (hypothesis) for operator invariants.

Few examples per property (Spark round-trips are slow) but arbitrary
shapes: these catch boundary cases fixed fixtures don't — empty
groups, all-ties, single rows, negative values.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.text import poly_hash
from dbt_lakehouse_aws_spark.operators.windows import global_row_number
from dbt_lakehouse_aws_spark.sources.snapshots import latest_snapshot

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 10_000)),
        min_size=1, max_size=300, unique_by=lambda t: t[1],
    )
)
def test_global_row_number_equals_naive_window(spark, rows):
    df = spark.createDataFrame(rows, "k int, uid int")
    fast = global_row_number(df, [F.desc("k"), F.asc("uid")], name="rn", num_partitions=4)
    naive = df.withColumn(
        "rn2", F.row_number().over(Window.orderBy(F.desc("k"), F.asc("uid"))).cast("long")
    )
    merged = fast.join(naive, ["k", "uid"])
    assert merged.filter(F.col("rn") != F.col("rn2")).count() == 0


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.text(min_size=0, max_size=5)),
        min_size=1, max_size=100,
    )
)
def test_latest_snapshot_keeps_exactly_max_key_rows(spark, rows):
    df = spark.createDataFrame(rows, "k int, payload string")
    out = latest_snapshot(df, "k").collect()
    mx = max(k for k, _ in rows)
    assert len(out) == sum(1 for k, _ in rows if k == mx)
    assert all(r["k"] == mx for r in out)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
        ),
        min_size=1, max_size=30,
    )
)
def test_poly_hash_matches_python_reference(spark, texts):
    """The portable fingerprint must equal a straight Python
    evaluation of its definition — the property that makes it an
    engine-independent oracle."""
    mults = [31**i for i in range(8)]

    def py_hash(s: str) -> int:
        return sum(ord(ch) * mults[i % 8] for i, ch in enumerate(s))

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r["i"]: r["h"] for r in df.select("i", poly_hash("text").alias("h")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_hash(t), repr(t)

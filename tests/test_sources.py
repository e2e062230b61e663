"""Source-layer semantics (SURVEY §2.1 S1-S7).

Builds a miniature ``year=/month=/day=`` CSV ingest tree and checks
path-metadata derivation, all-string schema-on-read, and the two
latest-snapshot operators against hand-enumerable expectations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_lakehouse_aws_spark.sources.reader import (
    PATH_META_COLS,
    read_csv_source,
    with_path_metadata,
)
from dbt_lakehouse_aws_spark.sources.snapshots import latest_per_group, latest_snapshot


@pytest.fixture(scope="module")
def ingest_dir(tmp_path_factory):
    """Two ingest dates x two files; newest date = 2025-3-5."""
    root = tmp_path_factory.mktemp("ingest")
    layout = {
        ("2025", "2", "28", "alpha.csv"): "id,val\n1,old-a\n2,old-a2\n",
        ("2025", "2", "28", "beta.csv"): "id,val\n9,old-b\n",
        ("2025", "3", "5", "alpha.csv"): "id,val\n1,new-a\n3,new-a3\n",
        # beta has NO 2025-3-5 ingest: latest_per_group must keep its
        # 2-28 rows while latest_snapshot (table-wide max) drops them.
    }
    for (y, m, d, fname), body in layout.items():
        p = root / f"year={y}" / f"month={m}" / f"day={d}"
        p.mkdir(parents=True, exist_ok=True)
        (p / fname).write_text(body)
    return str(root)


def test_read_all_string_schema(spark, ingest_dir):
    df = read_csv_source(spark, ingest_dir)
    data_fields = [f for f in df.schema.fields if f.name in ("id", "val")]
    assert data_fields and all(f.dataType == T.StringType() for f in data_fields)
    assert set(PATH_META_COLS) <= set(df.columns)


def test_path_metadata_values(spark, ingest_dir):
    df = read_csv_source(spark, ingest_dir)
    rows = {
        (r["_filename"], r["year"], r["month"], r["day"], r["_ptkey"])
        for r in df.select("_filename", "year", "month", "day", "_ptkey").collect()
    }
    assert ("alpha.csv", "2025", "2", "28", "2025228") in rows
    assert ("alpha.csv", "2025", "3", "5", "202535") in rows
    assert ("beta.csv", "2025", "2", "28", "2025228") in rows


def test_latest_snapshot_table_wide(spark, ingest_dir):
    df = read_csv_source(spark, ingest_dir)
    # NOTE: string _ptkey ordering — "202535" > "2025228" lexically,
    # matching the reference's varchar max() semantics.
    out = latest_snapshot(df)
    got = {(r["id"], r["val"]) for r in out.select("id", "val").collect()}
    assert got == {("1", "new-a"), ("3", "new-a3")}


def test_latest_per_group_keeps_stale_files(spark, ingest_dir):
    df = read_csv_source(spark, ingest_dir)
    out = latest_per_group(df, ("_filename",))
    got = {(r["_filename"], r["id"]) for r in out.select("_filename", "id").collect()}
    assert got == {("alpha.csv", "1"), ("alpha.csv", "3"), ("beta.csv", "9")}


def test_latest_per_group_rank_ties_survive(spark):
    """rank() (not row_number) must keep ALL rows of the winning key."""
    df = spark.createDataFrame(
        [("f", "2", "a"), ("f", "2", "b"), ("f", "1", "c")],
        "grp string, k string, payload string",
    )
    out = latest_per_group(df, ("grp",), "k")
    assert {r["payload"] for r in out.collect()} == {"a", "b"}


def test_with_path_metadata_custom_col(spark):
    df = spark.createDataFrame(
        [("x", "s3://bucket/tbl/year=2024/month=12/day=31/data.tsv")],
        "v string, p string",
    )
    out = with_path_metadata(df, path_col=F.col("p")).collect()[0]
    assert (out["year"], out["month"], out["day"]) == ("2024", "12", "31")
    assert out["_ptkey"] == "20241231"
    assert out["_filename"] == "data.tsv"

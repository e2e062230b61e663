"""Scalar-function parity surface (SURVEY §2.8)."""

from __future__ import annotations

from dbt_lakehouse_aws_spark.functions import scalar as S

from pyspark.sql import functions as F


def test_split_is_literal_not_regex(spark):
    df = spark.createDataFrame([("Trout, Mike",), ("a.b.c",)], "s string")
    got = [r[0] for r in df.select(S.split("s", ", ")).collect()]
    assert got[0] == ["Trout", "Mike"]
    got = [r[0] for r in df.select(S.split("s", ".")).collect()]
    assert got[1] == ["a", "b", "c"]  # '.' must not be a regex wildcard


def test_element_at_negative_one_based(spark):
    df = spark.createDataFrame([("x/y/z.csv",)], "p string")
    r = df.select(
        S.element_at(S.split("p", "/"), -1).alias("last"),
        S.element_at(S.split("p", "/"), 2).alias("second"),
    ).collect()[0]
    assert (r["last"], r["second"]) == ("z.csv", "y")


def test_replace_literal(spark):
    df = spark.createDataFrame([("steamer-hit.csv",)], "f string")
    assert df.select(S.replace("f", "-hit.csv")).collect()[0][0] == "steamer"


def test_split_part_and_nullif(spark):
    df = spark.createDataFrame(
        [("NFBC OC 2025 Overall Standings.csv", 0.0)], "f string, d double"
    )
    r = df.select(
        S.split_part(F.col("f"), F.lit(" "), F.lit(2)).alias("fmt"),
        S.nullif(F.col("d"), F.lit(0.0)).alias("guarded"),
    ).collect()[0]
    assert r["fmt"] == "OC"
    assert r["guarded"] is None


def test_typed_null_and_regexp_extract(spark):
    df = spark.createDataFrame([("s3://b/t/year=2024/f.csv",)], "p string")
    out = df.select(
        S.typed_null("double").alias("pad"),
        S.regexp_extract(F.col("p"), r"year=(\d{4})", 1).alias("year"),
        S.concat(F.lit("a"), F.lit("b")).alias("ab"),
    )
    assert dict(out.dtypes)["pad"] == "double"
    r = out.collect()[0]
    assert (r["pad"], r["year"], r["ab"]) == (None, "2024", "ab")


def test_top_tokens_udtf_lateral(spark):
    """UDTF registers as a SQL table function and agrees with a
    hand-computed top-k (count desc, first-seen asc)."""
    from dbt_lakehouse_aws_spark.functions.udtf import HAS_UDTF, register_udtfs

    if not HAS_UDTF:
        import pytest as _pytest

        _pytest.skip("pyspark UDTF API unavailable")
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "b a b c a b"), (2, "z z y")], ["doc_id", "text"]
    )
    docs.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, t.token, t.cnt, t.rank "
        "FROM udtf_docs d, LATERAL top_tokens(d.text, 2) t "
        "ORDER BY d.doc_id, t.rank"
    ).collect()
    got = [(r.doc_id, r.token, r.cnt, r.rank) for r in rows]
    assert got == [(1, "b", 3, 1), (1, "a", 2, 2), (2, "z", 2, 1), (2, "y", 1, 2)]

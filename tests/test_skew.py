"""Salted-join skew mitigation: semantics + distribution properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.operators.skew import salted_join, with_salt


def _frames(spark):
    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(2000)], "k int, uid int"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k int, v string")
    return fact, dim


def test_salted_inner_equals_plain_join(spark):
    fact, dim = _frames(spark)
    plain = {(r["k"], r["uid"], r["v"]) for r in fact.join(dim, ["k"]).collect()}
    salted = {
        (r["k"], r["uid"], r["v"])
        for r in salted_join(fact, dim, ["k"], num_salts=8).collect()
    }
    assert salted == plain and len(salted) == 2000


def test_salted_left_preserves_unmatched(spark):
    fact, dim = _frames(spark)
    fact = fact.unionByName(spark.createDataFrame([(99, -1)], "k int, uid int"))
    out = salted_join(fact, dim, ["k"], num_salts=4, how="left")
    assert out.count() == 2001
    assert out.filter(F.col("k") == 99).collect()[0]["v"] is None


def test_salt_spreads_hot_key(spark):
    fact, _ = _frames(spark)
    salted = with_salt(fact.filter(F.col("k") == 1), num_salts=8)
    counts = [r["count"] for r in salted.groupBy("_salt").count().collect()]
    assert len(counts) == 8  # hot key now spans 8 shuffle groups
    assert max(counts) < 1800 * 0.5  # no single salt dominates


def test_deterministic_salt(spark):
    fact, _ = _frames(spark)
    s1 = with_salt(fact, num_salts=8, salt_on=F.col("uid")).collect()
    s2 = with_salt(fact, num_salts=8, salt_on=F.col("uid")).collect()
    assert {(r["uid"], r["_salt"]) for r in s1} == {(r["uid"], r["_salt"]) for r in s2}

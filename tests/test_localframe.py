"""local_frame must land EXACTLY the rows/types the classic
``createDataFrame(list, schema)`` path lands — it replaced that path
at every driver-built-rows call site (round 9), so any divergence
here is a silent result change across dozens of queries."""

from __future__ import annotations

import datetime

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dbt_lakehouse_aws_spark.localframe import local_frame


def _both(spark, rows, schema):
    a = sorted(map(tuple, local_frame(spark, rows, schema).collect()), key=repr)
    b = sorted(map(tuple, spark.createDataFrame(rows, schema).collect()), key=repr)
    return a, b


def test_scalar_types_match_classic_path(spark):
    schema = (
        "k long, s string, d double, b boolean"
    )
    rows = [
        (1, "x", 1.5, True),
        (2, None, None, False),
        (None, "", -0.0, None),
    ]
    a, b = _both(spark, rows, schema)
    assert a == b


def test_temporal_and_array_types_match_classic_path(spark):
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("day", DateType()),
            StructField("xs", ArrayType(LongType())),
        ]
    )
    rows = [
        (datetime.datetime(2024, 1, 15, 3, 4, 5, 123000), datetime.date(2024, 1, 15), [1, 2, 3]),
        (None, None, []),
        (datetime.datetime(1999, 12, 31, 23, 59, 59), datetime.date(1970, 1, 1), None),
    ]
    a, b = _both(spark, rows, schema)
    assert a == b


def test_empty_rows_keep_schema(spark):
    schema = StructType(
        [StructField("id", LongType()), StructField("v", DoubleType()), StructField("s", StringType()), StructField("f", BooleanType())]
    )
    df = local_frame(spark, [], schema)
    assert df.schema == schema
    assert df.count() == 0


def test_no_python_eval_in_plan(spark):
    # the whole point: actions over the frame must not spin Python
    # workers (the classic list path plans a Python-RDD scan)
    df = local_frame(spark, [(1, "a"), (2, "b")], "k long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

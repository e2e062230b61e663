"""Leaf-level test-table loader — importable by every query module
without touching ``standard_queries`` (which imports the query
modules itself; a loader living there makes any helper shared
between query modules a circular import).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with either TIMESTAMP(NANOS) (which
        # Spark's reader rejects by default) or plain microsecond
        # timestamps, depending on the generator version. Read with
        # nanosAsLong=true and adapt: a long column is nanos → convert to
        # microsecond timestamps (integer div — DuckDB truncates the same
        # way, and float division would lose precision > 2^53); a
        # timestamp column is already what we want (normalize NTZ → LTZ
        # so downstream epoch arithmetic matches DuckDB's epoch()).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

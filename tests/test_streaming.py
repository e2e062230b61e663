"""Structured Streaming surface: incremental latest-snapshot ingest
and watermarked windowed aggregation (SURVEY §2.9).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_lakehouse_aws_spark.streaming.ingest import (
    incremental_latest_snapshot,
    read_csv_stream,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("val", T.StringType())]
)


def _write_date(root, date, body):
    y, m, d = date
    p = root / f"year={y}" / f"month={m}" / f"day={d}"
    p.mkdir(parents=True, exist_ok=True)
    (p / "data.csv").write_text(body)


def test_incremental_latest_snapshot(spark, tmp_path):
    ingest = tmp_path / "ingest"
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _write_date(ingest, ("2025", "1", "1"), "id,val\n1,a1\n2,a2\n")
    stream = read_csv_stream(spark, str(ingest), SCHEMA)
    q = incremental_latest_snapshot(stream, out_dir=out, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    got = {(r["id"], r["val"]) for r in spark.read.parquet(out).select("id", "val").collect()}
    assert got == {("1", "a1"), ("2", "a2")}

    # a newer ingest date arrives → only its rows survive, and the
    # checkpoint means the old files are NOT re-read
    _write_date(ingest, ("2025", "1", "5"), "id,val\n1,b1\n3,b3\n")
    stream = read_csv_stream(spark, str(ingest), SCHEMA)
    q = incremental_latest_snapshot(stream, out_dir=out, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    got = {(r["id"], r["val"]) for r in spark.read.parquet(out).select("id", "val").collect()}
    assert got == {("1", "b1"), ("3", "b3")}


def test_windowed_event_counts(spark, tmp_path):
    # rate-free deterministic micro-stream via file source
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        ("2025-01-01 10:05:00", "click", 1.0),
        ("2025-01-01 10:40:00", "click", 2.0),
        ("2025-01-01 11:10:00", "view", 5.0),
        ("2025-01-01 13:00:00", "view", 1.0),  # advances watermark past 10-11h
    ]
    (src / "part.csv").write_text(
        "ts,event_type,value\n" + "\n".join(",".join(map(str, r)) for r in rows) + "\n"
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("header", "true").csv(str(src))
    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from wincounts").collect()
    }
    # the 10:00 click window is final (watermark passed): 2 events, 3.0
    assert got[("2025-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2025-01-01 11:00:00", "view")] == (1, 5.0)

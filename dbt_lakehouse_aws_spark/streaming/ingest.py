"""Incremental ingest via Structured Streaming (SURVEY §2.9).

The reference is batch-only; its closest streaming-shaped semantics
is the latest-snapshot-wins refresh (S5/S6), re-read in full every
``dbt build``. Here the same logical table maintains itself
incrementally: a file-source stream over the ``year=/month=/day=``
ingest tree, ``Trigger.AvailableNow`` (process everything new, then
stop — the scheduled-batch pattern), and a ``foreachBatch`` merge
that keeps only the winning ingest key per group.

Scale notes: the file source tracks processed files in the
checkpoint, so each run reads only new ingest dates — at 100 TB the
per-run cost is O(new data), not O(table). The merge output is
overwrite-partitioned parquet; on a real lake this would be a Delta
``MERGE`` keyed the same way. Event-time watermarking appears in
:func:`windowed_event_counts` — the stateful-aggregation shape a
live events feed needs (no reference counterpart; provided as the
engine's streaming surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_lakehouse_aws_spark.sources.reader import with_path_metadata


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """Streaming analogue of ``read_csv_source``: all-string schema
    must be supplied (streams can't infer), path metadata derived
    the same way as batch (S2-S4)."""
    df = (
        spark.readStream.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("recursiveFileLookup", "true")
        .csv(path)
        .select("*", "_metadata")
    )
    return with_path_metadata(df).drop("_metadata")


def incremental_latest_snapshot(
    stream: DataFrame,
    *,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "_ptkey",
):
    """Maintain the S5 'latest snapshot' table incrementally.

    Each micro-batch unions new rows with the current table and
    keeps only rows carrying the max ingest key — so the
    materialized table always equals what the batch
    ``latest_snapshot`` operator would produce over the full
    history, at O(new files) incremental cost.
    """
    import os
    import shutil

    spark = stream.sparkSession

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if os.path.exists(out_dir):
            current = spark.read.parquet(out_dir)
            merged = batch.unionByName(current, allowMissingColumns=True)
        else:
            merged = batch
        max_key = merged.agg(F.max(key).alias(key))
        latest = merged.join(F.broadcast(max_key), on=key, how="inner")
        # write-then-swap: parquet can't overwrite a path it is also
        # lazily reading (the union references out_dir). On a real
        # lake this whole function is one Delta MERGE / REPLACE.
        stage = f"{out_dir}__stage"
        latest.write.mode("overwrite").parquet(stage)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(stage, out_dir)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream.

    Late rows beyond the watermark are dropped and their window
    state reclaimed — bounded state at any scale. Output mode
    'append' emits each window once it's final.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )

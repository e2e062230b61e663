"""Arrow IPC stream source/sink — zero-copy interop with the Arrow
ecosystem (pandas, polars, DuckDB, Arrow Flight, Ray datasets all
consume ``.arrows`` streams natively).

Unlike the Avro pair (row-major, python-encoded), this path never
leaves Arrow: ``mapInArrow`` hands each task its partition as
RecordBatches, and the task writes them to ONE IPC stream file
verbatim — no per-row Python, no transpose, no re-encode. Reading is
the mirror image: one task per file, batches yielded as-is. That
makes it the cheapest possible binary interchange this engine can
offer: the only costs are the JVM↔Arrow boundary (columnar, batched)
and the filesystem.

Scale shape: parallelism = input partitions on write / files on read
(IPC streams are not block-splittable by design — the framing is
sequential — so file count is the read parallelism unit, exactly like
Avro containers; writers control it with ``repartition``). Tmp-file +
atomic rename per task: readers never observe a torn stream.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pyarrow as pa
from dbt_lakehouse_aws_spark.localframe import local_frame
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_arrow_ipc(df: DataFrame, path: str) -> tuple[int, int]:
    """Write ``df`` as one Arrow IPC stream file per non-empty
    partition under ``path``; returns ``(n_rows, n_files)``. An
    all-empty input lands one schema-carrying stream so the
    directory always round-trips through :func:`read_arrow_ipc`."""
    os.makedirs(path, exist_ok=True)

    def write_part(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        writer = None
        sink = None
        tmp = final = None
        n = 0
        for batch in batches:
            if writer is None:
                final = os.path.join(path, f"part-{uuid.uuid4().hex}.arrows")
                tmp = final + ".tmp"
                sink = pa.OSFile(tmp, "wb")
                writer = pa.ipc.new_stream(sink, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        n_files = 0
        if writer is not None:
            writer.close()
            sink.close()
            os.replace(tmp, final)
            n_files = 1
        yield pa.RecordBatch.from_pydict(
            {"n_rows": pa.array([n], pa.int64()),
             "n_files": pa.array([n_files], pa.int64())}
        )

    meta = df.mapInArrow(write_part, "n_rows long, n_files long")
    row = meta.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("r"),
        F.coalesce(F.sum("n_files"), F.lit(0)).cast("long").alias("f"),
    ).collect()[0]
    n_rows, n_files = int(row["r"]), int(row["f"])
    if n_files == 0:
        # schema-only stream from the driver (mirrors write_avro)
        from pyspark.sql.pandas.types import to_arrow_schema

        final = os.path.join(path, f"part-{uuid.uuid4().hex}.arrows")
        tmp = final + ".tmp"
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_stream(sink, to_arrow_schema(df.schema)):
                pass
        os.replace(tmp, final)
        n_files = 1
    return n_rows, n_files


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan of an ``.arrows`` directory: schema from one
    stream header on the driver (header-only read), then one task per
    file yields its RecordBatches untouched."""
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".arrows")
    )
    if not files:
        raise FileNotFoundError(f"no .arrows streams under {path}")
    with pa.OSFile(files[0], "rb") as fh:
        arrow_schema = pa.ipc.open_stream(fh).schema
    spark_schema = from_arrow_schema(arrow_schema)

    # hash-spread the file list across >=2 partitions (one task per
    # file once file count reaches parallelism; repartition(1) would
    # be a SinglePartition exchange and a one-task read)
    paths = local_frame(
        spark, [(f,) for f in files], "p string"
    ).repartition(max(2, len(files)), "p")

    def read_part(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for p in batch.column(0).to_pylist():
                with pa.OSFile(p, "rb") as fh:
                    reader = pa.ipc.open_stream(fh)
                    for b in reader:
                        if b.num_rows:
                            yield b

    return paths.mapInArrow(read_part, spark_schema)

"""Write Apache Iceberg v2 tables (create + append) from first
principles — the write-side twin of :mod:`.iceberg_reader`.

The reference materializes its lakehouse AS Iceberg tables
(reference ``dbt_project.yml:38-51`` — ``table_type: iceberg``), so
migration parity needs a write path too. The sandbox has no
iceberg-spark runtime jars; this module emits the PUBLIC table spec
(https://iceberg.apache.org/spec/) directly:

* data files: plain parquet written distributed by Spark, moved into
  ``data/`` (rename within the table root — no re-write);
* manifests + manifest lists: **Avro container files** encoded by
  the pure-Python codec in :mod:`.avro_io`, with the spec's reserved
  ``field-id`` annotations (status=0, data_file=2, file_path=100,
  manifest_path=500, … — the ids external engines map columns by);
* table metadata: ``metadata/vN.metadata.json`` (format-version 2,
  explicit sequence numbers — no inheritance dance for readers to
  resolve), committed with ``O_EXCL`` so two concurrent writers race
  on the version file and exactly one wins (the same put-if-absent
  point as :class:`.acid.AcidTable` and the Delta writer);
* ``version-hint.text`` refreshed via tmp+rename (advisory — readers
  fall back to the highest vN).

Scope: unpartitioned append/create (the shapes the reference's CTAS
models produce). Row-level deletes belong to the engine's own
:class:`.acid.AcidTable`; writing v2 delete files into tables other
engines maintain is exactly the corruption risk the reader module
documents.

Round-trip is pinned by the driver gate
(``iceberg_write_roundtrip_events``): rows written here and read
back through :class:`.iceberg_reader.IcebergTable` hash-match a
DuckDB oracle over the source table, and appends accumulate across
snapshots with time travel intact.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from dbt_lakehouse_aws_spark.sources.avro_io import read_container, write_container

_SPARK_TO_ICEBERG = {
    BooleanType: "boolean",
    IntegerType: "int",
    LongType: "long",
    FloatType: "float",
    DoubleType: "double",
    DateType: "date",
    TimestampType: "timestamp",
    StringType: "string",
    BinaryType: "binary",
}


def _iceberg_type(dt) -> str:
    if isinstance(dt, DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    for cls, name in _SPARK_TO_ICEBERG.items():
        if isinstance(dt, cls):
            return name
    raise ValueError(f"unsupported Spark type for Iceberg write: {dt}")


def _iceberg_schema(df: DataFrame) -> dict:
    return {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {
                "id": i + 1,
                "name": f.name,
                "required": not f.nullable,
                "type": _iceberg_type(f.dataType),
            }
            for i, f in enumerate(df.schema.fields)
        ],
    }


#: v2 manifest_entry Avro schema with the spec's reserved field ids.
def _manifest_schema() -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": []},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    ],
                },
            },
        ],
    }


def _manifest_list_schema() -> dict:
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        ],
    }


def _stage_parquet(df: DataFrame, table_path: str) -> list[tuple[str, int, int]]:
    """Distributed parquet write → move into ``data/``; returns
    (absolute path, rows, bytes) per file. Row counts come from the
    parquet footers (no extra Spark job)."""
    import pyarrow.parquet as pq

    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    data_dir = os.path.join(table_path, "data")
    os.makedirs(data_dir, exist_ok=True)
    out = []
    try:
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(staging, f)
            dst = os.path.join(data_dir, f"{uuid.uuid4().hex}-{f}")
            rows = pq.ParquetFile(src).metadata.num_rows
            size = os.path.getsize(src)
            os.rename(src, dst)
            out.append((dst, rows, size))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return out


def write_iceberg_table(df: DataFrame, path: str, *, mode: str = "error") -> int:
    """Write ``df`` into an Iceberg v2 table at ``path``.

    ``mode``: ``error`` (default — must not already be a table),
    ``append`` (new snapshot on top of the current one). Returns the
    committed metadata version N (of ``vN.metadata.json``).
    """
    if mode not in ("error", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    meta_dir = os.path.join(path, "metadata")
    exists = os.path.isdir(meta_dir) and any(
        f.endswith(".metadata.json") for f in os.listdir(meta_dir)
    )
    if exists and mode == "error":
        raise FileExistsError(
            f"{path} is already an Iceberg table (mode='error'); use mode='append'"
        )
    os.makedirs(meta_dir, exist_ok=True)

    now_ms = int(time.time() * 1000)
    snapshot_id = uuid.uuid4().int & ((1 << 62) - 1)

    if exists:
        from dbt_lakehouse_aws_spark.sources.iceberg_reader import IcebergTable

        tbl = IcebergTable(df.sparkSession, path)
        meta = tbl._current_metadata()
        version = (
            max(
                int(f[1 : f.index(".")])
                for f in os.listdir(meta_dir)
                if f.endswith(".metadata.json") and f.startswith("v")
            )
            + 1
        )
        seq = int(meta.get("last-sequence-number", 0)) + 1
        # schema compatibility: same names/types, by name
        want = {f["name"]: f["type"] for f in _iceberg_schema(df)["fields"]}
        if "schemas" in meta:
            cur = {
                f["name"]: f["type"]
                for s in meta["schemas"]
                if s["schema-id"] == meta["current-schema-id"]
                for f in s["fields"]
            }
        else:
            cur = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
        if want != cur:
            raise ValueError(
                f"append schema {want} does not match table schema {cur}"
            )
        snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        parent = meta.get("current-snapshot-id")
        prior_manifests: list[dict] = []
        if parent is not None and parent in snaps and "manifest-list" in snaps[parent]:
            from dbt_lakehouse_aws_spark.sources.iceberg_reader import _local_path

            with open(_local_path(snaps[parent]["manifest-list"], path), "rb") as fh:
                _, prior_manifests = read_container(fh.read())
    else:
        meta = None
        version = 1
        seq = 1
        parent = None
        prior_manifests = []

    staged = _stage_parquet(df, path)

    # manifest of ADDED files — explicit sequence numbers (no
    # inheritance for readers to resolve)
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": p,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": rows,
                "file_size_in_bytes": size,
            },
        }
        for p, rows, size in staged
    ]
    manifest_path = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    manifest_bytes = write_container(_manifest_schema(), entries)
    with open(manifest_path, "wb") as fh:
        fh.write(manifest_bytes)

    added_rows = sum(r for _, r, _ in staged)
    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": len(manifest_bytes),
        "partition_spec_id": 0,
        "content": 0,  # data manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(staged),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    # carry prior manifests forward (append semantics); foreign-table
    # entries may lack some of our schema's fields — default them
    defaults = {f["name"]: 0 for f in _manifest_list_schema()["fields"]}
    carried = [{**defaults, **m} for m in prior_manifests]
    ml_path = os.path.join(meta_dir, f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro")
    with open(ml_path, "wb") as fh:
        fh.write(write_container(_manifest_list_schema(), carried + [new_manifest]))

    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(staged)),
            "added-records": str(added_rows),
        },
        "manifest-list": ml_path,
        "schema-id": 0,
    }
    if parent is not None:
        snapshot["parent-snapshot-id"] = parent

    if meta is None:
        new_meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": path,
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "last-column-id": len(df.schema.fields),
            "schemas": [_iceberg_schema(df)],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": {},
            "snapshots": [snapshot],
            "current-snapshot-id": snapshot_id,
        }
    else:
        new_meta = dict(meta)
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = now_ms
        new_meta["snapshots"] = list(meta.get("snapshots", [])) + [snapshot]
        new_meta["current-snapshot-id"] = snapshot_id

    commit_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    # O_EXCL put-if-absent: exactly one writer wins a version
    fd = os.open(commit_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(new_meta, fh)
    except BaseException:
        os.unlink(commit_path)
        raise
    hint_tmp = os.path.join(meta_dir, f".hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return version

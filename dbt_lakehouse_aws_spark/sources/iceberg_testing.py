"""Spec-conformant Iceberg **v2** table-layout writer for fixtures.

Builds the metadata side of an Iceberg v2 table — ``v1.metadata.json``
(format-version 2, schemas list), a manifest list and a manifest as
REAL Avro container files (:mod:`.avro_io`) — around parquet files the
caller has already written. Used by tests and the driver-gate queries
to exercise :class:`.iceberg_reader.IcebergTable` against the public
spec (https://iceberg.apache.org/spec/), including merge-on-read
position/equality delete files and per-file data sequence numbers.

This is a FIXTURE writer, not a production Iceberg writer: it emits
one metadata version with one snapshot per call site's needs and does
no commit protocol. Production mutation stays with
:class:`.acid.AcidTable` (see iceberg_reader's module docstring for
the rationale).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from dbt_lakehouse_aws_spark.sources.avro_io import write_container

_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
    ],
}

_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},  # 0 = data, 1 = deletes
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


@dataclass(frozen=True)
class V2File:
    """One file entry for :func:`write_v2_table`.

    content: 0 = data, 1 = position deletes, 2 = equality deletes.
    ``equality_ids`` are Iceberg field IDs (schema order, 1-based)
    and are required iff content == 2.
    """

    path: str
    seq: int
    content: int = 0
    equality_ids: tuple[int, ...] = field(default_factory=tuple)


def write_v2_table(
    root: str,
    schema_fields: list[tuple[str, str]],
    files: list[V2File],
    *,
    snapshot_id: int = 100,
) -> str:
    """Lay down ``metadata/`` for a format-version-2 table whose single
    current snapshot references ``files``. ``schema_fields`` is
    ``[(name, iceberg_type), ...]``; field IDs are assigned 1..N in
    order. Returns the table root."""
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    def entry(f: V2File) -> dict:
        return {
            "status": 1,
            "snapshot_id": snapshot_id,
            "sequence_number": f.seq,
            "data_file": {
                "content": f.content,
                "file_path": f.path,
                "file_format": "PARQUET",
                "record_count": 0,
                "file_size_in_bytes": os.path.getsize(f.path),
                "equality_ids": list(f.equality_ids) or None,
            },
        }

    manifest_path = os.path.join(meta_dir, "manifest-1.avro")
    blob = write_container(_ENTRY_SCHEMA, [entry(f) for f in files], codec="deflate")
    with open(manifest_path, "wb") as fh:
        fh.write(blob)

    list_path = os.path.join(meta_dir, "manifest-list-1.avro")
    with open(list_path, "wb") as fh:
        fh.write(
            write_container(
                _LIST_SCHEMA,
                [
                    {
                        "manifest_path": manifest_path,
                        "manifest_length": len(blob),
                        "partition_spec_id": 0,
                        "content": 0,
                        "added_snapshot_id": snapshot_id,
                    }
                ],
            )
        )

    meta = {
        "format-version": 2,
        "table-uuid": "2f3a7e1e-0000-4000-8000-000000000002",
        "location": root,
        "last-sequence-number": max((f.seq for f in files), default=0),
        "last-updated-ms": 0,
        "last-column-id": len(schema_fields),
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": i + 1, "name": n, "required": False, "type": t}
                    for i, (n, t) in enumerate(schema_fields)
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "sequence-number": max((f.seq for f in files), default=0),
                "timestamp-ms": 1,
                "manifest-list": list_path,
            }
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return root

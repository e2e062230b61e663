"""Read-only adapter for EXISTING Apache Iceberg tables.

The reference materializes its lakehouse tables AS Iceberg
(reference ``dbt_project.yml:38-51`` — ``table_type: iceberg``), so a
user migrating from it holds Iceberg table directories. The sandbox
cannot install the iceberg-spark runtime jars, so this adapter walks
the PUBLIC Iceberg table spec (https://iceberg.apache.org/spec/)
directly, the same posture as :mod:`.delta_reader` for Delta:

* ``metadata/version-hint.text`` (or the highest
  ``v{N}.metadata.json``) names the current table metadata;
* the metadata JSON carries schemas, snapshots, and
  ``current-snapshot-id``; each snapshot points at a MANIFEST LIST;
* manifest lists and manifests are **Avro container files** — decoded
  here with the pure-Python codec in :mod:`.avro_io` (no jars, no
  external packages);
* a snapshot's live data files = union of its manifests' entries
  with ``status != 2`` (2 = DELETED), read as plain parquet with the
  Iceberg schema mapped to Spark types.

Read-only by design (same rationale as the Delta adapter): correct
Iceberg WRITES need the full commit protocol (optimistic metadata
swap, sequence numbers, delete files); mutating a table other
engines also write through a partial implementation could corrupt
it. Mutation belongs to the engine's own :class:`.acid.AcidTable`,
whose design is the same metadata architecture.

Scale: snapshot resolution is driver-side metadata work proportional
to manifest count, never data; the scan itself is a multi-file
parquet read with full pushdown. Row-level deletes (v2 positional /
equality delete files, ``content != 0``) are detected and REFUSED
loudly rather than silently returning undeleted rows.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dbt_lakehouse_aws_spark.sources.avro_io import read_container

_META_RE = re.compile(r"^v(\d+)\.metadata\.json$")
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")

_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "date": DateType(),
    "timestamp": TimestampType(),
    "timestamptz": TimestampType(),
    "string": StringType(),
    "binary": BinaryType(),
}


def _spark_type(t) -> DataType:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if m := _DECIMAL_RE.match(t):
            return DecimalType(int(m.group(1)), int(m.group(2)))
        raise ValueError(f"unsupported Iceberg type: {t!r}")
    if isinstance(t, dict) and t.get("type") == "struct":
        return StructType(
            [
                StructField(f["name"], _spark_type(f["type"]), not f.get("required", False))
                for f in t["fields"]
            ]
        )
    raise ValueError(f"unsupported Iceberg type: {t!r} (list/map columns not mapped)")


def _local_path(file_path: str, table_root: str) -> str:
    """Manifest file paths are URIs or absolute paths; resolve to a
    local filesystem path, falling back to table-root-relative."""
    parsed = urlparse(file_path)
    p = unquote(parsed.path) if parsed.scheme else file_path
    if not os.path.isabs(p):
        p = os.path.join(table_root, p)
    return p


@dataclass(frozen=True)
class IcebergSnapshot:
    snapshot_id: int
    files: tuple[str, ...]  # resolved local parquet paths
    schema: StructType


class IcebergTable:
    """Mount an existing Iceberg table directory for reading."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._meta_dir = os.path.join(path, "metadata")
        if not os.path.isdir(self._meta_dir):
            raise FileNotFoundError(f"no metadata/ under {path}")

    def _current_metadata(self) -> dict:
        hint = os.path.join(self._meta_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                v = int(fh.read().strip())
            name = f"v{v}.metadata.json"
        else:
            versions = sorted(
                int(m.group(1))
                for f in os.listdir(self._meta_dir)
                if (m := _META_RE.match(f))
            )
            if not versions:
                raise FileNotFoundError(f"no v*.metadata.json under {self._meta_dir}")
            name = f"v{versions[-1]}.metadata.json"
        with open(os.path.join(self._meta_dir, name)) as fh:
            return json.load(fh)

    def _schema(self, meta: dict) -> StructType:
        if "schemas" in meta:  # v2: list keyed by current-schema-id
            by_id = {s["schema-id"]: s for s in meta["schemas"]}
            schema = by_id[meta["current-schema-id"]]
        else:  # v1: single inline schema
            schema = meta["schema"]
        return StructType(
            [
                StructField(f["name"], _spark_type(f["type"]), not f.get("required", False))
                for f in schema["fields"]
            ]
        )

    def snapshot(self, snapshot_id: int | None = None) -> IcebergSnapshot:
        meta = self._current_metadata()
        snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        sid = meta.get("current-snapshot-id") if snapshot_id is None else snapshot_id
        if sid is None or sid == -1 or sid not in snaps:
            if snapshot_id is not None:
                raise ValueError(f"snapshot {snapshot_id} not in {sorted(snaps)}")
            return IcebergSnapshot(-1, (), self._schema(meta))
        snap = snaps[sid]
        files: list[str] = []
        if "manifest-list" in snap:  # v2 (and v1 with manifest lists)
            ml_path = _local_path(snap["manifest-list"], self.path)
            with open(ml_path, "rb") as fh:
                _, manifests = read_container(fh.read())
            manifest_paths = [m["manifest_path"] for m in manifests]
        else:  # v1 inline manifests array
            manifest_paths = list(snap.get("manifests", ()))
        for mp in manifest_paths:
            with open(_local_path(mp, self.path), "rb") as fh:
                _, entries = read_container(fh.read())
            for e in entries:
                if e.get("status") == 2:  # DELETED
                    continue
                df = e["data_file"]
                if df.get("content", 0) != 0:
                    raise NotImplementedError(
                        "Iceberg v2 row-level delete files present "
                        f"(content={df['content']}); this read-only adapter "
                        "handles data files only — refusing rather than "
                        "returning undeleted rows"
                    )
                fmt = str(df.get("file_format", "PARQUET")).upper()
                if fmt != "PARQUET":
                    raise NotImplementedError(f"data file format {fmt} not supported")
                files.append(_local_path(df["file_path"], self.path))
        return IcebergSnapshot(sid, tuple(sorted(files)), self._schema(meta))

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Snapshot-isolated read (time travel via ``snapshot_id``):
        the live file list is resolved now, so the returned plan is
        stable under concurrent commits — later snapshots cannot
        change it."""
        snap = self.snapshot(snapshot_id)
        if not snap.files:
            return self.spark.createDataFrame([], snap.schema)
        return self.spark.read.schema(snap.schema).parquet(*snap.files)


def read_iceberg_table(
    spark: SparkSession, path: str, *, snapshot_id: int | None = None
) -> DataFrame:
    """One-shot convenience: mount + snapshot-read an existing Iceberg
    table directory."""
    return IcebergTable(spark, path).read(snapshot_id)

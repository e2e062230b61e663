"""Write Delta Lake tables on the PUBLIC transaction-log protocol.

Counterpart to :mod:`.delta_reader`: where the reader mounts tables
other engines wrote, this writer EXPORTS this engine's results as a
table delta-spark (or any protocol-conformant reader) can open —
the interop direction a user migrating from the reference lakehouse
stack (reference `dbt_project.yml:38-51` materializes lakehouse
tables) needs to hand results back to their existing tooling.

Protocol surface written (PROTOCOL.md, reader/writer version 1/2):

* ``_delta_log/{version:020d}.json`` of newline-delimited actions;
* commit 0 carries ``protocol`` + ``metaData`` (Spark StructType
  JSON ``schemaString``, ``partitionColumns``, parquet format);
* every data file lands as an ``add`` with ``partitionValues``
  (hive-style strings), ``size``, ``modificationTime``,
  ``dataChange`` and a ``stats`` JSON of numRecords plus per-column
  min/max/nullCount — harvested from the parquet FOOTERS only, so
  stats cost is O(files) metadata reads, never a data scan;
* ``append`` adds files; ``overwrite`` emits ``remove`` for every
  previously-live file + the new ``add``s, in ONE commit (atomic
  replace under the protocol's last-writer-wins on version files);
* commits are created with O_EXCL so two concurrent writers cannot
  both claim the same version (the loser raises and can retry).

The data files themselves are written by Spark's parquet sink into a
staging directory and hard-linked/renamed into the table root, so
file layout, compression, and parallelism are the normal distributed
write path — the driver only ever touches metadata.

Deliberately NOT written: checkpoints, deletion vectors, column
mapping, invariants — features a minReaderVersion=1 table must not
require. Tables that need transactional MERGE/DELETE belong to
:class:`.acid.AcidTable`; this module is the export boundary.

Scale: data write is Spark-parallel; log write is O(new files)
driver-side JSON. At 100 TB the per-file footer stat harvest is the
only driver loop — bounded by file count, not rows, and each read is
a ~KB footer fetch (same cost class delta-spark itself pays).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame

from .delta_reader import DeltaLogTable

_MAX_STAT_COLS = 32  # delta-spark's default dataSkippingNumIndexedCols


def _footer_stats(local_path: str, schema_fields: list) -> str:
    """Per-file ``add.stats`` JSON from the parquet footer (no scan).

    Min/max/nullCount only for top-level primitive columns present in
    the footer with usable statistics; truncation/absence degrades to
    omitting the column, which the protocol allows.
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(local_path).metadata
    num_records = md.num_rows
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    by_name = {}
    for i in range(md.num_columns):
        col = md.row_group(0).column(i) if md.num_row_groups else None
        if col is not None:
            by_name[col.path_in_schema] = i
    stat_cols = [f.name for f in schema_fields[:_MAX_STAT_COLS]]
    for name in stat_cols:
        idx = by_name.get(name)
        if idx is None:
            continue
        cmin = cmax = None
        nnull = 0
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    ok = False
                    break
            cmin = mn if cmin is None else min(cmin, mn)
            cmax = mx if cmax is None else max(cmax, mx)
            nnull += st.null_count or 0
        if ok and cmin is not None:
            if hasattr(cmin, "isoformat"):
                cmin, cmax = cmin.isoformat(), cmax.isoformat()
            mins[name] = cmin
            maxs[name] = cmax
            nulls[name] = nnull
    return json.dumps(
        {
            "numRecords": num_records,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


def _spark_schema_string(df: DataFrame, partition_by: list[str]) -> str:
    return df.schema.json()


def _collect_staged_files(staging: str) -> list[tuple[str, dict]]:
    """(relative_path, partitionValues) for every parquet file Spark
    staged, decoding hive-style ``col=value`` directory components."""
    out = []
    for dirpath, _dirs, files in os.walk(staging):
        rel_dir = os.path.relpath(dirpath, staging)
        pv: dict[str, str | None] = {}
        if rel_dir != ".":
            for comp in rel_dir.split(os.sep):
                if "=" in comp:
                    k, _, v = comp.partition("=")
                    pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue  # _SUCCESS, .crc
            rel = f if rel_dir == "." else os.path.join(rel_dir, f)
            out.append((rel, pv))
    return out


def write_delta_table(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` to ``path`` as a protocol-conformant Delta table.

    ``mode``: ``error`` (default — path must not already be a Delta
    table), ``append``, or ``overwrite`` (logical replace: one commit
    removing every live file and adding the new ones; old versions
    remain time-travelable). Returns the committed version.
    """
    partition_by = list(partition_by or [])
    if mode not in ("error", "append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    log_dir = os.path.join(path, "_delta_log")
    exists = os.path.isdir(log_dir) and any(
        f.endswith(".json") for f in os.listdir(log_dir)
    )
    if exists and mode == "error":
        raise FileExistsError(
            f"{path} is already a Delta table (mode='error'); "
            "use mode='append' or 'overwrite'"
        )

    prior_files: tuple[str, ...] = ()
    prior_pv: dict[str, dict] = {}
    version = 0
    spark = df.sparkSession
    if exists:
        tbl = DeltaLogTable(spark, path)
        snap = tbl.snapshot()
        version = snap.version + 1
        if mode == "overwrite":
            prior_files = snap.files
            prior_pv = snap.partition_values
        if tuple(snap.partition_columns) != tuple(partition_by):
            raise ValueError(
                f"partition_by {partition_by} does not match existing table's "
                f"{list(snap.partition_columns)}"
            )

    # 1. distributed data write into a staging dir under the root
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    data_fields = [f for f in df.schema.fields if f.name not in partition_by]
    staged = _collect_staged_files(staging)
    adds = []
    try:
        # 2. move files into the table root (partition layout kept)
        for rel, pv in staged:
            dst = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            src = os.path.join(staging, rel)
            stats = _footer_stats(src, data_fields)
            size = os.path.getsize(src)
            os.rename(src, dst)
            adds.append(
                {
                    "add": {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": pv,
                        "size": size,
                        "modificationTime": int(time.time() * 1000),
                        "dataChange": True,
                        "stats": stats,
                    }
                }
            )
        # 3. single atomic commit
        actions: list[dict] = []
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        if version == 0 or mode == "overwrite":
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _spark_schema_string(df, partition_by),
                        "partitionColumns": partition_by,
                        "configuration": {},
                        "createdTime": int(time.time() * 1000),
                    }
                }
            )
        for p in prior_files:
            actions.append(
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": int(time.time() * 1000),
                        "dataChange": True,
                        "partitionValues": prior_pv.get(p, {}),
                    }
                }
            )
        actions.extend(adds)
        actions.append(
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode},
                    "engineInfo": "dbt-lakehouse-aws-spark delta_writer",
                }
            }
        )
        os.makedirs(log_dir, exist_ok=True)
        commit_path = os.path.join(log_dir, f"{version:020d}.json")
        # O_EXCL: concurrent writers race on the version file; loser raises
        fd = os.open(commit_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with os.fdopen(fd, "w") as fh:
                for a in actions:
                    fh.write(json.dumps(a) + "\n")
        except BaseException:
            os.unlink(commit_path)
            raise
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return version

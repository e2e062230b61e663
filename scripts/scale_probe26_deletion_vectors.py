"""Scale probe #26: deletion vectors make sparse DELETE O(deleted
rows), not O(touched file bytes).

The GDPR-erasure shape: delete ONE user's rows from a big table.
Copy-on-write must rewrite every file that holds a matching row —
on an unclustered table that is ~every file. A deletion vector
commits a run-length sidecar instead: write IO is the vector, data
files never move, and the read-side cost is an anti-join against
the (tiny, broadcast) deleted-position set. The probe measures, on
a 20M-row / 64-file table where the victim key is spread across
ALL files:

  (a) DELETE wall-clock + bytes written: vector vs rewrite
  (b) post-delete scan overhead with the vector applied
  (c) OPTIMIZE materializing vectors back to a clean layout

Run:  python scripts/scale_probe26_deletion_vectors.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.sources.acid import AcidTable  # noqa: E402

N = 20_000_000


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )


def build(spark, path: str) -> AcidTable:
    t = AcidTable(spark, path)
    # user_id interleaved across the id-range files: every file holds
    # every user — the worst case for copy-on-write deletes
    df = spark.range(N).select(
        "id",
        (F.col("id") % 100_000).alias("user_id"),
        (F.col("id") * 7 % 10_000).cast("double").alias("v"),
    )
    t.write(df.repartitionByRange(64, "id"))
    return t


def main() -> None:
    spark = get_spark("scale_probe26_dv")
    work = tempfile.mkdtemp(prefix="probe26_")

    # -- rewrite (copy-on-write) baseline --------------------------------
    cow = build(spark, os.path.join(work, "cow"))
    bytes_before = dir_bytes(cow.path)
    t0 = time.time()
    cow.delete("user_id = 4242", mode="rewrite")
    t_cow = time.time() - t0
    cow_written = dir_bytes(cow.path) - bytes_before
    print(
        f"rewrite DELETE of 1 user ({N // 100_000} rows): {t_cow:.1f}s, "
        f"{cow_written / 1e6:+.1f} MB written, "
        f"op={cow.snapshot().operation}",
        flush=True,
    )

    # -- deletion vector ---------------------------------------------------
    dv = build(spark, os.path.join(work, "dv"))
    bytes_before = dir_bytes(dv.path)
    t0 = time.time()
    dv.delete("user_id = 4242", mode="vector")
    t_dv = time.time() - t0
    dv_written = dir_bytes(dv.path) - bytes_before
    snap = dv.snapshot()
    print(
        f"vector DELETE of same user: {t_dv:.1f}s, "
        f"{dv_written / 1e3:.1f} KB written, files moved="
        f"{64 - len(set(snap.files) & set(dv.snapshot(0).files))}, "
        f"vectors={len(snap.dvs)}",
        flush=True,
    )

    # -- read overhead with vectors applied --------------------------------
    # a bare count() on clean parquet is a metadata shortcut (row-group
    # counts, no data IO) — aggregate a value column so BOTH sides
    # actually read rows, which is the workload a DV read must match
    def scan_cost(t):
        t0 = time.time()
        row = t.read().agg(F.sum("v"), F.count(F.lit(1))).first()
        return time.time() - t0, row[1]

    t_scan_clean, n_cow = scan_cost(cow)
    t_scan_dv, n_dv = scan_cost(dv)
    assert n_cow == n_dv == N - N // 100_000
    print(
        f"full scan+agg: clean={t_scan_clean:.1f}s  "
        f"all-64-files-vectored={t_scan_dv:.1f}s "
        f"({t_scan_dv / t_scan_clean:.2f}x)",
        flush=True,
    )

    # realistic sparse shape: vectors on ONE of 64 files — the clean
    # 63 take the plain scan path, so overhead ~ vectored fraction
    sp = build(spark, os.path.join(work, "sparse"))
    sp.delete("id BETWEEN 100 AND 299", mode="vector")
    nvec = len(sp.snapshot().dvs)
    t_scan_sp, n_sp = scan_cost(sp)
    assert n_sp == N - 200
    print(
        f"1-file-vectored scan+agg: {t_scan_sp:.1f}s "
        f"({t_scan_sp / t_scan_clean:.2f}x, vectors={nvec})",
        flush=True,
    )

    # -- OPTIMIZE materializes the vectors ---------------------------------
    t0 = time.time()
    osnap = dv.optimize(target_file_bytes=dir_bytes(dv.path) // 64 + 1)
    print(
        f"OPTIMIZE materialize: {time.time() - t0:.1f}s, "
        f"vectors after={len(osnap.dvs)}",
        flush=True,
    )
    t0 = time.time()
    assert dv.read().count() == N - N // 100_000
    print(f"post-optimize scan: {time.time() - t0:.1f}s", flush=True)

    shutil.rmtree(work)


if __name__ == "__main__":
    main()

"""Scale probe #25: SHALLOW CLONE cost is metadata, not data.

The promise of AcidTable.clone (Delta SHALLOW CLONE semantics) is
that branching a table costs one manifest write no matter the table
size, and that post-clone writes pay only for what they touch. The
probe writes a 20M-row range-clustered table, then measures (a)
clone wall-clock vs a deep CTAS copy, (b) bytes under the clone dir
after a narrow MERGE (copy-on-write: only the touched file
materializes locally), (c) source integrity after clone-side
merge + delete + vacuum.

Run:  python scripts/scale_probe25_clone.py
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


def main() -> None:
    spark = get_spark("scale_probe25_clone")
    work = tempfile.mkdtemp(prefix="probe25_")
    src = AcidTable(spark, os.path.join(work, "src"))
    df = spark.range(N).select(
        "id", (F.col("id") % 1000).alias("k"), (F.col("id") * 7 % 10_000).alias("v")
    )
    t0 = time.time()
    src.write(df.repartitionByRange(64, "id"))
    print(f"source write: {time.time() - t0:.1f}s, "
          f"{dir_bytes(src.path) / 1e6:.0f} MB, 64 files", flush=True)

    t0 = time.time()
    cl = src.clone(os.path.join(work, "cl"))
    t_clone = time.time() - t0
    t0 = time.time()
    deep = AcidTable(spark, os.path.join(work, "deep"))
    deep.write(src.read())
    t_deep = time.time() - t0
    print(f"shallow clone: {t_clone * 1000:.0f} ms "
          f"({dir_bytes(cl.path) / 1e3:.0f} KB on disk) vs deep copy "
          f"{t_deep:.1f}s ({dir_bytes(deep.path) / 1e6:.0f} MB)", flush=True)

    # narrow merge into the clone: only the touched file materializes
    up = spark.range(100).select(
        "id", (F.col("id") % 1000).alias("k"), F.lit(-1).cast("long").alias("v")
    )
    t0 = time.time()
    snap = cl.merge(up, ["id"])
    print(f"clone merge of 100 rows: {time.time() - t0:.1f}s, "
          f"op={snap.operation}, clone dir now "
          f"{dir_bytes(cl.path) / 1e6:.1f} MB (copy-on-write slice only)",
          flush=True)

    cl.delete("k = 7")
    cl.vacuum(retain_last=1)
    assert src.read().count() == N, "source must be untouched"
    assert src.read().filter("v = -1").count() == 0
    print(f"after clone delete+vacuum: source intact at {N} rows", flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale probe #23: replace_where rewrite proportionality.

The insert_overwrite path (sources/acid.py::replace_where) must touch
only the files whose rows match the predicate — the property that
makes daily partition refreshes O(partition), not O(table). The probe
builds a RANGE-CLUSTERED table (4M rows / 64 files, each file owning
a narrow day range — probe #22's layout, which is what real daily
tables look like) and replaces ONE day out of 64, recording touched
files, carried-over files, and commit wall-clock; then contrasts with
a HASH-SCATTERED layout where every file holds every day, i.e. the
pathological layout where replace_where degrades to a full rewrite.

Run:  python scripts/scale_probe23_replace_where.py
"""

from __future__ import annotations

import re
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.sources.acid import AcidTable  # noqa: E402

N = 4_000_000
DAYS = 64


def run(spark, label: str, clustered: bool) -> None:
    df = spark.range(N).select(
        (F.col("id") % DAYS).alias("day"),
        (F.col("id") % 1000).alias("v"),
    )
    if clustered:
        df = df.repartitionByRange(64, "day")
    else:
        df = df.repartition(64)
    root = tempfile.mkdtemp(prefix="probe23_")
    try:
        t = AcidTable(spark, f"{root}/t")
        t.write(df)
        n_files = len(t.snapshot().files)
        batch = spark.range(N // DAYS).select(
            F.lit(7).alias("day"), (F.col("id") % 7).alias("v")
        )
        t0 = time.time()
        snap = t.replace_where(batch, "day = 7")
        dt = time.time() - t0
        m = re.search(r"touched=(\d+)/(\d+)", snap.operation)
        print(
            f"{label}: files={n_files}, touched {m.group(1)}/{m.group(2)}, "
            f"commit={dt:.1f}s, rows now={t.read().count():,}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark("scale_probe23_rw")
    run(spark, "range-clustered", clustered=True)
    run(spark, "hash-scattered ", clustered=False)


if __name__ == "__main__":
    main()

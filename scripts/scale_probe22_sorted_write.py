"""Scale probe #22: sort-on-write clustering.

At 100 TB, HOW rows land inside parquet files is a first-order cost
lever: sorting each task's partition by a hot filter column before
writing (a) groups equal values for run-length/dictionary encoding —
smaller files — and (b) narrows per-row-group min/max ranges so
point/range filters prune row groups instead of scanning them. This
is z-order's cheap one-dimensional cousin and needs no table format
support — just sortWithinPartitions before the write.

The probe writes the SAME 20M rows unsorted vs sorted and reports
bytes on disk + how many row groups a point filter can prune (via
each file's footer min/max, read with pyarrow).

Run:  python scripts/scale_probe22_sorted_write.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402

N = 20_000_000


def rowgroup_prune_stats(path: str, col: str, needle: int):
    import pyarrow.parquet as pq

    total = kept = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            total += 1
            st = md.row_group(rg).column(idx).statistics
            if st is None or (st.min <= needle <= st.max):
                kept += 1
    return total, kept


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(path, "*.parquet"))
    )


def main() -> None:
    spark = get_spark("scale_probe22_sorted")
    df = spark.range(N).select(
        ((F.col("id") * 2654435761) % 500).alias("category"),
        ((F.col("id") * 48271) % 1000000).alias("v"),
        F.concat(F.lit("payload-"), (F.col("id") % 9973).cast("string")).alias(
            "tag"
        ),
    )
    root = tempfile.mkdtemp(prefix="probe22_")
    try:
        layouts = {
            "unsorted": df,
            "sorted-in-task": df.sortWithinPartitions("category"),
            # the real clustering recipe: range-partition BY the hot
            # column so each FILE holds a narrow value range, then
            # task-local sort — z-order's cheap 1-D cousin
            "clustered": df.repartitionByRange(32, "category")
            .sortWithinPartitions("category"),
        }
        results = {}
        for name, frame in layouts.items():
            path = f"{root}/{name}"
            frame.write.mode("overwrite").parquet(path)
            results[name] = (dir_bytes(path),) + rowgroup_prune_stats(
                path, "category", 123
            )
        b_un = results["unsorted"][0]
        for name, (b, t, k) in results.items():
            print(
                f"{name:14s}: {b/1e6:7.1f}MB ({(1-b/b_un)*100:+.0f}% vs "
                f"unsorted), row groups scanned for category=123: {k}/{t}"
            )
        assert results["clustered"][0] < results["unsorted"][0]
        bc, tc, kc = results["clustered"]
        bu, tu, ku = results["unsorted"]
        assert kc / tc < ku / tu
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

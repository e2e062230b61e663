"""Scale probe #24: Z-ORDER clustering vs 1-D sort for 2-D pruning.

Probe #22 showed sort-on-write narrows row-group min/max bounds on
the SORT column. But real tables serve predicates on SEVERAL
columns, and a lexicographic sort only helps the leading one: the
trailing column's values cycle through their full range inside every
leading-value run, so its per-row-group bounds are the whole domain.
Interleaving the bits (operators/relational.py::zorder_key) bounds
BOTH columns at once — each contiguous key range is a small set of
quad-tree cells, so each row group spans a bounded rectangle.

The probe writes the SAME 10M uniformly-distributed (user, day) rows
three ways — sorted by user, sorted by (user, day), sorted by
z(user, day) — then counts row groups a 2-D box predicate
(user BETWEEN .. AND day BETWEEN ..) keeps under footer min/max
pruning on BOTH columns.

Run:  python scripts/scale_probe24_zorder.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.operators.relational import zorder_key  # noqa: E402
from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402

N = 10_000_000
DOM = 4096  # both dims uniform in [0, 4096)


def box_prune(path: str, boxes):
    import pyarrow.parquet as pq

    stats = []  # per file: (umin, umax, dmin, dmax) per row group
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        sch = md.schema.to_arrow_schema()
        ui, di = sch.get_field_index("user"), sch.get_field_index("day")
        for rg in range(md.num_row_groups):
            su = md.row_group(rg).column(ui).statistics
            sd = md.row_group(rg).column(di).statistics
            stats.append((su.min, su.max, sd.min, sd.max))
    out = []
    for (u0, u1, d0, d1) in boxes:
        kept = sum(
            1
            for (a, b, c, d) in stats
            if not (b < u0 or a > u1 or d < d0 or c > d1)
        )
        out.append((len(stats), kept))
    return out


def main() -> None:
    spark = get_spark("scale_probe24_zorder")
    df = spark.range(N).select(
        ((F.col("id") * 2654435761) % DOM).alias("user"),
        ((F.col("id") * 48271) % DOM).alias("day"),
        (F.col("id") % 1000).alias("v"),
    )
    work = tempfile.mkdtemp(prefix="probe24_")
    layouts = {
        "sort_user": df.repartitionByRange(128, "user").sortWithinPartitions("user"),
        "sort_user_day": df.repartitionByRange(128, "user", "day").sortWithinPartitions(
            "user", "day"
        ),
        "zorder": df.withColumn("_z", zorder_key("user", "day", bits=12))
        .repartitionByRange(128, "_z")
        .sortWithinPartitions("_z")
        .drop("_z"),
    }
    # three predicate shapes: a day-only slice (the trailing-column
    # query a leading sort cannot prune), a user-only slice, and a
    # square 2-D box
    boxes = [
        (0, DOM - 1, 2048, 2303),   # day slice, any user
        (1024, 1279, 0, DOM - 1),   # user slice, any day
        (512, 767, 512, 767),       # 256x256 box
    ]
    for name, frame in layouts.items():
        path = os.path.join(work, name)
        frame.write.mode("overwrite").parquet(path)
        for (box, (total, kept)) in zip(boxes, box_prune(path, boxes)):
            print(
                f"{name:14s} box={box}: row groups kept {kept}/{total} "
                f"({100.0 * kept / total:.1f}%)",
                flush=True,
            )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale probe #17: ACID CHECK-constraint enforcement cost on write.

Enforcement is one aggregate scan of the incoming batch per write
(ALL constraints counted in a single pass — sources/acid.py::
_enforce), so the claim to verify is: overhead is a CONSTANT FRACTION
of write cost, independent of the number of constraints beyond the
first, and far below the parquet-encode cost it piggybacks on.

Measures appends of a 2M-row batch into an ACID table with 0, 1, and
4 constraints, plus the rejected-write path (violating batch must
abort atomically leaving no trace).

Run:  python scripts/scale_probe17_check_constraints.py [n_rows]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.sources.acid import AcidTable  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(f"scale_probe17_checks_{n}")

    batch = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 97).cast("string")).alias("tag"),
    ).localCheckpoint(eager=True)

    def timed_append(constraints):
        root = tempfile.mkdtemp(prefix="p17_")
        t = AcidTable(spark, f"{root}/tbl")
        t.write(batch.limit(1))  # create with schema
        for name, expr in constraints:
            t.add_check_constraint(name, expr)
        t0 = time.time()
        t.write(batch, mode="append")
        wall = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return wall

    w0 = timed_append([])
    w1 = timed_append([("v_range", "v >= 0 AND v < 1000")])
    w4 = timed_append(
        [
            ("v_range", "v >= 0 AND v < 1000"),
            ("id_pos", "id >= 0"),
            ("tag_nn", "tag IS NOT NULL"),
            ("tag_shape", "tag LIKE 'u%'"),
        ]
    )
    print(f"append {n} rows: 0 constraints {w0:.1f}s | 1 constraint "
          f"{w1:.1f}s (+{100*(w1-w0)/w0:.0f}%) | 4 constraints "
          f"{w4:.1f}s (+{100*(w4-w0)/w0:.0f}%)")

    # rejected write: atomic abort, no partial files
    root = tempfile.mkdtemp(prefix="p17_")
    t = AcidTable(spark, f"{root}/tbl")
    t.write(batch.limit(1))
    t.add_check_constraint("v_small", "v < 500")
    v_before = t.snapshot().version
    try:
        t.write(batch, mode="append")
        print("ERROR: violating write was accepted")
    except Exception as exc:  # noqa: BLE001
        ok = t.snapshot().version == v_before
        print(f"violating batch rejected ({type(exc).__name__}); "
              f"version unchanged: {ok}; table rows: {t.read().count()}")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") output for queries into plans/<dir>.

Usage: python scripts/capture_plan.py <suffix> query [query ...]
Writes plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt (default r10).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import _prepare_chunked
from dbt_lakehouse_aws_spark import standard_queries as SQ
from dbt_lakehouse_aws_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = _prepare_chunked("/root/testdata/sf0.1")
    spark = get_spark("capture-plan")
    qs = SQ.all_queries()
    out_dir = os.path.join(
        "/root/repo/plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r10")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

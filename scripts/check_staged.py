"""Oracle-check STAGED (r7+r8) queries outside pytest (fast inner
loop while staging; the session-wide gate is tests/test_staged_r6.py).

Usage: python scripts/check_staged.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from dbt_lakehouse_aws_spark.oracle import compare_frames
from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.catalog import STAR_TABLES
from dbt_lakehouse_aws_spark import (staged_r10, staged_r11,
                                     staged_r12, staged_r13)

STAGED_ORACLES = {
                  **staged_r10.STAGED_ORACLES,
                  **staged_r11.STAGED_ORACLES, **staged_r12.STAGED_ORACLES,
                  **staged_r13.STAGED_ORACLES}
STAGED_QUERIES = {
                  **staged_r10.STAGED_QUERIES,
                  **staged_r11.STAGED_QUERIES, **staged_r12.STAGED_QUERIES,
                  **staged_r13.STAGED_QUERIES}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("staged-check")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in STAGED_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            rel = con.sql(STAGED_ORACLES[name])
            problems = compare_frames(
                sdf.columns, srows, [c.lower() for c in rel.columns], rel.fetchall()
            )
            widened = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
            ]
            if widened:
                problems = (problems or []) + [f"widened oracle types: {widened}"]
            if not srows:
                problems = (problems or []) + ["empty result"]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {e}")
            continue
        dt = time.time() - t0
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({dt:.1f}s): {problems}")
        else:
            print(f"ok   {name} ({dt:.1f}s, {len(srows)} rows)")
    print(f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

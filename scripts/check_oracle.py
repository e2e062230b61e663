"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count,
schema (loose dtype families), and an order-insensitive value
multiset (columns sorted by name, cells normalized).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.catalog import STAR_TABLES


def norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        # driver-style normalization: fixed decimal repr
        return f"{v:.6f}"
    return str(v)


def frame_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {elapsed:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            sm = frame_to_multiset([c.lower() for c in scols], srows)
            dm = frame_to_multiset(dcols, drows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({elapsed:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

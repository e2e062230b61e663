"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count,
schema (loose dtype families), and an order-insensitive value
multiset (columns sorted by name, cells normalized).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from dbt_lakehouse_aws_spark.oracle import compare_frames
from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.catalog import STAR_TABLES


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
        problems = compare_frames(scols, srows, dcols, drows)
        if problems:
            for p in problems:
                print(f"FAIL {name}: {p}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match ({elapsed:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

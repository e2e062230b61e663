"""Driver simulation for the STAGED set: run every staged (r7+r8) query +
oracle compare under a VANILLA SparkSession (Spark 4 defaults: ANSI
on, 200 shuffle partitions, no engine confs) — the session these
queries will face once they register for the round-6/7/8 windows.
Catching ANSI traps (raw casts, int overflow, strict division) at
staging time instead of at driver time.

Usage: python scripts/check_staged_vanilla.py [sf_dir] [name ...]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

from dbt_lakehouse_aws_spark.oracle import compare_frames
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

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])
spark = (
    SparkSession.builder.master("local[32]").appName("vanilla-staged").getOrCreate()
)
print(
    "ansi:", spark.conf.get("spark.sql.ansi.enabled"),
    "shuffle:", spark.conf.get("spark.sql.shuffle.partitions"),
)
con = duckdb.connect()
for t in STAR_TABLES:
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
fails = []
names = [n for n in STAGED_QUERIES if not only or n in only]
for name in names:
    t0 = time.time()
    try:
        sdf = STAGED_QUERIES[name](spark, sf_dir)
        srows = sdf.collect()
        rel = con.sql(STAGED_ORACLES[name])
        problems = compare_frames(
            sdf.columns, srows, [c.lower() for c in rel.columns], rel.fetchall()
        )
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        continue
    if problems:
        fails.append(name)
        print(f"FAIL {name}: {problems}")
    else:
        print(f"ok   {name} ({time.time()-t0:.1f}s)")
print(f"\n{len(names)-len(fails)}/{len(names)} staged queries pass under vanilla session")
sys.exit(1 if fails else 0)

"""Driver simulation: run every DRIVER_WINDOW query + oracle compare
under a VANILLA SparkSession (Spark 4 defaults: ANSI on, 200 shuffle
partitions, no engine confs) — the session the real driver uses."""
import sys, time
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

from dbt_lakehouse_aws_spark.oracle import compare_frames
from dbt_lakehouse_aws_spark.sources.catalog import STAR_TABLES
from dbt_lakehouse_aws_spark import standard_queries as sq
import __spark_entry__ as E

sf_dir = "/root/testdata/sf0.01"
spark = SparkSession.builder.master("local[32]").appName("vanilla-window").getOrCreate()
print("ansi:", spark.conf.get("spark.sql.ansi.enabled"),
      "shuffle:", spark.conf.get("spark.sql.shuffle.partitions"))
con = duckdb.connect()
for t in STAR_TABLES:
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
qs, oracles = E.queries(), E.oracle_sql()
fails = []
for name in sq.DRIVER_WINDOW:
    t0 = time.time()
    try:
        sdf = qs[name](spark, sf_dir)
        srows = sdf.collect()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: spark: {type(e).__name__}: {str(e)[:200]}"); continue
    if name not in oracles:
        print(f"ok   {name}: rows-only ({len(srows)})"); continue
    try:
        rel = con.sql(oracles[name])
        problems = compare_frames(sdf.columns, srows, [c.lower() for c in rel.columns], rel.fetchall())
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: duckdb: {str(e)[:200]}"); continue
    if problems:
        fails.append(name); print(f"FAIL {name}: {problems}")
    else:
        print(f"ok   {name} ({time.time()-t0:.1f}s)")
print(f"\n{len(sq.DRIVER_WINDOW)-len(fails)}/{len(sq.DRIVER_WINDOW)} window queries pass under vanilla session")
sys.exit(1 if fails else 0)

"""Scale probe #5: distributed Avro scan — decode cost spreads across tasks.

The pure-Python Avro codec is inherently slower per-byte than the JVM
parquet path; the design claim (sources/avro_io.py) is not "fast
decode" but "decode in TASKS": parallelism = files, driver cost =
one header. This probe writes the SAME rows as 1 / 8 / 32 Avro
container files and times read_avro + a downstream aggregate over
each layout on local[32], plus the parquet conversion path a real
pipeline would run once.

Run: python scripts/scale_probe5.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.avro_io import read_avro, write_container

spark = get_spark("scale-probe5")

N = 400_000
SCHEMA = {
    "type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ]}


def make_layout(n_files: int) -> str:
    root = tempfile.mkdtemp(prefix=f"avro_probe_{n_files}_")
    per = N // n_files
    for i in range(n_files):
        recs = [
            {"id": i * per + j, "kind": f"k{j % 7}", "score": (j % 100) / 10.0}
            for j in range(per)
        ]
        with open(os.path.join(root, f"part-{i:04d}.avro"), "wb") as fh:
            fh.write(write_container(SCHEMA, recs, codec="deflate"))
    return root


results = {}
for n_files in (1, 8, 32):
    root = make_layout(n_files)
    size_mb = sum(
        os.path.getsize(os.path.join(root, f)) for f in os.listdir(root)
    ) / 1e6
    t0 = time.monotonic()
    out = (
        read_avro(spark, root)
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("score"), 2).alias("s"))
        .collect()
    )
    dt = time.monotonic() - t0
    total = sum(r["n"] for r in out)
    assert total == (N // n_files) * n_files, total
    results[n_files] = dt
    print(f"{n_files:3d} files ({size_mb:5.1f} MB): decode+agg {dt:5.1f}s "
          f"({size_mb / dt:5.1f} MB/s)")

print(f"speedup 1->32 files: {results[1] / results[32]:.1f}x "
      f"(ideal bounded by min(files, cores))")

# the convert-once path: avro -> parquet, then query parquet
root = make_layout(32)
pq_dir = tempfile.mkdtemp(prefix="avro_probe_pq_")
t0 = time.monotonic()
read_avro(spark, root).write.mode("overwrite").parquet(pq_dir)
t_conv = time.monotonic() - t0
t0 = time.monotonic()
spark.read.parquet(pq_dir).groupBy("kind").agg(F.count(F.lit(1))).collect()
t_q = time.monotonic() - t0
print(f"convert-once to parquet: {t_conv:.1f}s; parquet re-query: {t_q:.2f}s "
      "(the 100 TB pattern: Avro is an ingest format, decoded once)")

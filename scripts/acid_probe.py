import sys, time, tempfile
sys.path.insert(0, "/root/repo")  # repo root
from dbt_lakehouse_aws_spark.session import get_spark
from pyspark.sql import functions as F
from dbt_lakehouse_aws_spark.sources.acid import AcidTable

spark = get_spark("acid-probe")
n = 2_000_000
df = spark.range(0, n, 1, 32).select(
    F.col("id"), (F.col("id") % 1000).cast("string").alias("grp"),
    (F.col("id") * 0.5).alias("value"))

t0 = time.monotonic()
table = AcidTable(spark, tempfile.mkdtemp(prefix="acid_probe_"))
table.write(df.repartitionByRange(64, "id"))
t1 = time.monotonic(); print(f"write 2M rows / 64 files: {t1-t0:.2f}s")

# narrow delta: 100 contiguous keys -> ~1 file touched
narrow = spark.range(5000, 5100).select(
    F.col("id"), F.lit("x").alias("grp"), F.lit(-1.0).alias("value")).localCheckpoint()
s = table.merge(narrow, ["id"])
t2 = time.monotonic(); print(f"narrow merge (100 keys): {t2-t1:.2f}s  op={s.operation}")

# scattered delta: 100 keys spread across the whole range -> many files
wide = spark.range(0, n, n // 100).select(
    F.col("id"), F.lit("y").alias("grp"), F.lit(-2.0).alias("value")).localCheckpoint()
s = table.merge(wide, ["id"])
t3 = time.monotonic(); print(f"scattered merge (100 keys): {t3-t2:.2f}s  op={s.operation}")

s = table.optimize(target_file_bytes=16 << 20)
t4 = time.monotonic(); print(f"optimize: {t4-t3:.2f}s  op={s.operation}")
print(f"read count: {table.read().count()} in {time.monotonic()-t4:.2f}s")

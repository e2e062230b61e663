"""Scale probe #7: sketch estimator accuracy at 10^6 values.

sf0.01 driver rows verify the KMV and CMS pipelines are *computed*
right; this probe verifies they *estimate* right at a scale where the
asymptotics matter:

* KMV (k=256) on two 600k-distinct groups overlapping in 200k values
  (union 1.0M, intersection 0.2M, J=0.2): bottom-k theory puts
  relative error ~1/sqrt(k) ≈ 6.3% on the union estimate.
* CMS (depth 4, width 4096) over 1M rows Zipf-distributed across
  ~50k keys: the classic bound says overestimate ≤ 2N/w ≈ 488 with
  probability 1 - e^-4 per query; heavy keys should come back nearly
  exact relative to their counts.

Run: python scripts/scale_probe7.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
    kmv_pairwise_overlap,
    kmv_sketch,
)
from dbt_lakehouse_aws_spark.session import get_spark

spark = get_spark("scale-probe7")

# ---- KMV ------------------------------------------------------------------
N_ONLY, N_SHARED = 400_000, 200_000
a = spark.range(0, N_ONLY + N_SHARED, 1, 32).select(
    F.lit("A").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
)
b = spark.range(N_ONLY, 2 * N_ONLY + N_SHARED, 1, 32).select(
    F.lit("B").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
)
df = a.unionByName(b)
t0 = time.time()
sk = kmv_sketch(df, group_col="g", value_col="v", k=256, portable=True)
row = kmv_pairwise_overlap(sk, k=256).collect()[0]
t_kmv = time.time() - t0
true_union = 2 * N_ONLY + N_SHARED
true_inter = N_SHARED
u_err = abs(row["union_est"] - true_union) / true_union
i_err = abs(row["intersection_est"] - true_inter) / true_inter
print(
    f"KMV k=256 on {true_union} union / {true_inter} inter: "
    f"union_est={row['union_est']:.0f} ({u_err:.1%} err), "
    f"inter_est={row['intersection_est']:.0f} ({i_err:.1%} err), "
    f"jaccard_est={row['jaccard_est']:.4f} (true 0.2) [{t_kmv:.1f}s]"
)
assert u_err < 0.15 and i_err < 0.30, "KMV error outside 2-3 sigma envelope"

# ---- CMS ------------------------------------------------------------------
N, WIDTH, DEPTH = 1_000_000, 4096, 4
# Zipf-ish: key = floor(N / (row+1)) capped — heavy head, long tail
rows = spark.range(0, N, 1, 32).select(
    (F.floor(F.lit(N) / (F.pmod(F.col("id") * 2654435761, F.lit(N)) + 1)))
    .cast("long")
    .alias("k")
)
t0 = time.time()
sketch = count_min_sketch(rows, value_col="k", depth=DEPTH, width=WIDTH)
exact = rows.groupBy("k").count().orderBy(F.desc("count")).limit(50)
est = cms_estimate(
    sketch, exact.select(F.col("k")), value_col="k", depth=DEPTH, width=WIDTH
)
joined = (
    exact.join(est.withColumnRenamed("value", "k"), "k")
    .select("k", "count", "est_count")
    .collect()
)
t_cms = time.time() - t0
over = [r["est_count"] - r["count"] for r in joined]
assert all(o >= 0 for o in over), "CMS underestimated — impossible, bug"
bound = 2 * N / WIDTH
print(
    f"CMS d={DEPTH} w={WIDTH} over {N} rows: top-50 overestimates "
    f"min={min(over)} avg={sum(over)/len(over):.0f} max={max(over)} "
    f"(theory e*N/w envelope ~{bound:.0f}) [{t_cms:.1f}s]"
)
assert max(over) < 4 * bound, "CMS overestimate far outside envelope"
print("PASS")
spark.stop()

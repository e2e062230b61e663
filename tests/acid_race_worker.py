"""Subprocess body for the multi-process ACID commit-race test.

Each worker boots its OWN SparkSession (separate JVM, separate
driver), builds a disjoint-key delta, rendezvouses with its peer at a
file barrier, then MERGEs into the shared table. The put-if-absent
``os.link`` commit point guarantees exactly one winner per version;
the loser must rebase and land on the next version — run by
tests/test_acid.py::test_concurrent_merges_from_two_processes.

Usage: python acid_race_worker.py TABLE_PATH TAG PEER_TAG LO HI BARRIER_DIR [OP]

OP defaults to ``merge``; ``optimize`` runs transactional compaction
instead (LO/HI ignored) — used by
test_acid.py::test_optimize_concurrent_with_merge to race OPTIMIZE
against a writer. Both sides rebase on CommitConflict, so whichever
loses the version race must land on the next version with no lost
updates and no resurrected pre-merge rows.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    table_path, tag, peer_tag, lo, hi, barrier_dir = sys.argv[1:7]
    op = sys.argv[7] if len(sys.argv) > 7 else "merge"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"acid-race-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    t = AcidTable(spark, table_path)
    delta = None
    if op == "merge":
        delta = spark.createDataFrame(
            [(i, tag, float(-i)) for i in range(int(lo), int(hi))],
            "id bigint, grp string, value double",
        ).localCheckpoint(eager=True)  # materialize BEFORE the barrier so
        # both processes hit _commit as close together as possible

    open(os.path.join(barrier_dir, f"ready-{tag}"), "w").close()
    deadline = time.time() + 120
    while not os.path.exists(os.path.join(barrier_dir, f"ready-{peer_tag}")):
        if time.time() > deadline:
            print("BARRIER_TIMEOUT", flush=True)
            sys.exit(2)
        time.sleep(0.01)

    if op == "merge":
        snap = t.merge(delta, ["id"])
    else:
        snap = t.optimize(target_file_bytes=1 << 20)
    print(f"COMMITTED {tag} version={snap.version}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

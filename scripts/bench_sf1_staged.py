"""sf1.0 pre-promotion audit of the STAGED round-10/11 corpus: run
every staged query at 10x the driver bench scale under the same
240 s watchdog bench_sf1.py uses, so scale surprises surface BEFORE
a window rotation puts them in front of the driver (the capped-wedge
lesson from round 6: the exact graph rows only revealed their
density sensitivity at sf1.0).

Usage: python scripts/bench_sf1_staged.py [sf1_dir=/tmp/sf1.0]
       [budget_s=240] [name ...]
Writes BENCH_sf1_staged.json next to bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark import standard_queries as SQ
from dbt_lakehouse_aws_spark import (staged_r10, staged_r11,
                                     staged_r12, staged_r13)
from bench import _prepare_chunked


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    only = set(sys.argv[3:])
    sf_dir = _prepare_chunked(sf_dir)

    def fresh_session():
        s = get_spark("bench-sf1-staged")
        for t in ("lineitem", "orders", "customer", "part", "supplier",
                  "events", "documents", "embeddings"):
            SQ.T(s, sf_dir, t).count()
        s.range(0, 1024, 1, 32).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        return s

    spark = fresh_session()
    queries = {
               **staged_r10.STAGED_QUERIES, **staged_r11.STAGED_QUERIES,
               **staged_r12.STAGED_QUERIES, **staged_r13.STAGED_QUERIES}

    names = [n for n in queries if not only or n in only]
    results: dict[str, float | str] = {}
    for i, name in enumerate(names):
        fn = queries[name]
        sc = spark.sparkContext
        done = threading.Event()

        def watchdog(sc=sc) -> None:
            if not done.wait(budget):
                sc.cancelAllJobs()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            results[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # cancelled or genuinely failed
            elapsed = time.perf_counter() - t0
            kind = (
                "timeout"
                if elapsed >= budget - 1
                else f"error: {type(exc).__name__}"
            )
            results[name] = f">{budget:.0f}s ({kind})"
        finally:
            done.set()
        # one fatal query must not poison the rest (r7 dbscan OOM
        # lesson, same guard as bench_sf1.py)
        if isinstance(results[name], str):
            try:
                spark.sql("SELECT 1").collect()
            except Exception:
                print(f"[{i + 1}] session dead after {name}; rebuilding",
                      flush=True)
                try:
                    spark.stop()
                except Exception:
                    pass
                spark = fresh_session()
        print(f"[{i + 1}/{len(names)}] {name}: {results[name]}", flush=True)

    numeric = [v for v in results.values() if isinstance(v, float)]
    payload = {
        "metric": "staged_queries_total_sf1",
        "value": round(sum(numeric), 2),
        "unit": "sec",
        "completed": len(numeric),
        "total": len(names),
        "budget_s": budget,
        "queries": results,
        "sf": 1.0,
    }
    out = os.path.join("/root/repo", "BENCH_sf1_staged.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

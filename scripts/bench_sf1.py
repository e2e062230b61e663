"""Order-of-magnitude bench point (VERDICT r5 item 5): run the full
headline set at sf1.0 (10x the driver bench's sf0.1) and emit a
per-query table for PERF.md, flagging super-linear rows.

The sf1.0 inputs come from scripts/make_sf1.py (10x replication of
sf0.1 preserving the generator's scaling law). One measured pass per
query (the point is the SCALING RATIO per query, not sub-second
noise), with a watchdog that cancels any query exceeding the budget
via SparkContext.cancelAllJobs — a runaway Sigma-deg^2 graph row
should cost minutes, not the whole session.

Usage: python scripts/bench_sf1.py [sf1_dir=/tmp/sf1.0] [budget_s=240]
Writes BENCH_sf1.json next to bench.py.
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
from bench import HEADLINE, _prepare_chunked


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    sf_dir = _prepare_chunked(sf_dir)

    def fresh_session():
        s = get_spark("bench-sf1")
        for t in ("lineitem", "orders", "customer", "part", "supplier",
                  "events", "documents", "embeddings"):
            SQ.T(s, sf_dir, t).count()
        s.range(0, 1024, 1, 32).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        return s

    spark = fresh_session()
    queries = SQ.all_queries()

    results: dict[str, float | str] = {}
    for i, name in enumerate(HEADLINE):
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
            kind = "timeout" if elapsed >= budget - 1 else f"error: {type(exc).__name__}"
            results[name] = f">{budget:.0f}s ({kind})"
        finally:
            done.set()
        # A fatal failure (executor OOM) can wedge the whole JVM and
        # poison every later row with ConnectionRefused (r7: dbscan's
        # sf1.0 OOM cost 143 rows). Probe liveness after any
        # exception and rebuild the session so one bad query costs
        # exactly its own slot.
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
        print(f"[{i + 1}/{len(HEADLINE)}] {name}: {results[name]}", flush=True)

    numeric = [v for v in results.values() if isinstance(v, float)]
    payload = {
        "metric": "headline_queries_total_sf1",
        "value": round(sum(numeric), 2),
        "unit": "sec",
        "completed": len(numeric),
        "total": len(HEADLINE),
        "budget_s": budget,
        "queries": results,
        "sf": 1.0,
    }
    out = os.path.join("/root/repo", "BENCH_sf1.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    spark.stop()
    print(json.dumps({k: payload[k] for k in ("metric", "value", "completed", "total")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

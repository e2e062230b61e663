"""Solo re-measure for individual queries: median-of-N wall time per
query on the chunked sf dir (same prep as bench.py), nothing else
running. Mirrors bench.py's methodology (count() over the full plan,
run-major order) so numbers are comparable to the committed basis.

Usage: python scripts/solo_time.py [--runs N] [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _prepare_chunked
from dbt_lakehouse_aws_spark import standard_queries as SQ
from dbt_lakehouse_aws_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = _prepare_chunked(args.sf_dir)
    spark = get_spark("solo-time")
    qs = SQ.all_queries()

    # same warm-up as bench.py
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "events", "documents", "embeddings"):
        try:
            SQ.T(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    raw: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.runs):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"solo:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            raw[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name, ts in raw.items():
        print(f"{statistics.median(ts):8.3f}  {name}  runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()

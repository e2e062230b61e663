"""Scale probe #14: prefix-filtered Jaccard join vs the all-shingle
self-join under boilerplate skew.

The naive exact join's cost is Σ_s df(s)² over shingle document
frequencies — one boilerplate shingle shared by half the corpus
dominates everything. Prefix filtering only joins each document's
floor((1-t)·s)+1 RAREST shingles, so hot shingles fall out of the
candidate stream unless a document has almost nothing else.

This probe builds N docs where every doc shares one boilerplate
sentence (the hot shingles) plus mostly-unique content, and
measures, WITHOUT running the quadratic join: the candidate-pair
volume each plan would scan (Σ df² from the cell histograms of the
actual join keys), plus end-to-end wall-clock and pair count of the
prefix plan.

Run:  python scripts/scale_probe14_prefixjoin.py [n_docs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.llmops.dedup import (  # noqa: E402
    prefix_filter_jaccard_pairs,
    shingle_table,
)

THRESHOLD = 0.5


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(f"scale_probe14_prefix_{n}")

    # every doc: the same 8-word boilerplate + 12 mostly-unique words
    # (drawn from a vocab ~n/2 so some near-dup pairs exist)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("all rights reserved contact us terms of service"),
            *[
                F.concat(
                    F.lit("w"),
                    ((F.col("id") * (2 * k + 1) + k * k) % (n // 2)).cast(
                        "string"
                    ),
                )
                for k in range(12)
            ],
        ).alias("text"),
    )

    sh = shingle_table(docs, "doc_id", "text", 3).localCheckpoint()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    naive_vol = freq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("v")
    ).first()["v"]

    # prefix stream volume: replicate the operator's prefix cut, then
    # Σ df'² over the PREFIX keys only
    by_doc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(by_doc.orderBy(F.asc("df"), F.asc("shingle"))),
        )
        .withColumn("sz", F.count(F.lit(1)).over(by_doc))
    )
    pref = ranked.filter(
        F.col("rk") <= F.floor((1.0 - THRESHOLD) * F.col("sz") + 1e-9) + 1
    )
    pref_vol = (
        pref.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("v"))
        .first()["v"]
    ) or 0

    t0 = time.time()
    pairs = prefix_filter_jaccard_pairs(docs, threshold=THRESHOLD).count()
    wall = time.time() - t0

    print(
        f"docs={n:,} | naive candidate volume {int(naive_vol):,} "
        f"| prefix candidate volume {int(pref_vol):,} "
        f"({naive_vol / max(pref_vol, 1):,.0f}x reduction)"
    )
    print(
        f"prefix plan end-to-end {wall:.1f}s -> {pairs:,} exact pairs "
        f">= {THRESHOLD}"
    )


if __name__ == "__main__":
    main()

"""Scale probe #13: Bloom semi-join reduction vs the plain shuffle
semi-join.

operators/bloomjoin.py claims (a) the bitmap build's driver collect
is bounded by PARTITION COUNT, not key count; (b) the broadcast
prefilter drops ~all non-matching fact rows BEFORE the shuffle, so
the exact semi-join's exchange moves |matching| + fp·|fact| rows
instead of |fact|; (c) the result is bit-identical to the plain
semi-join. This probe builds an N-row fact whose keys hit a K-key
dim with a chosen selectivity and measures survivor counts, the
realized false-positive rate, equality with the plain semi-join,
and wall-clock for both plans.

Run:  python scripts/scale_probe13_bloomjoin.py [n_fact] [n_dim] [sel_ppm]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.operators.bloomjoin import (  # noqa: E402
    bloom_bitmap,
    bloom_prefilter,
    bloom_semi_join,
)


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    sel_ppm = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000  # 2%
    spark = get_spark(f"scale_probe13_bloom_{n_fact}")

    # dim keys are the even ids in [0, 2*n_dim); matching fact rows
    # hit them at ~sel_ppm/1e6, the rest land far outside the range.
    dim = spark.range(n_dim).select((F.col("id") * 2).alias("k"))
    fact = spark.range(n_fact).select(
        F.when(
            (F.col("id") * 2654435761 % 1_000_000) < sel_ppm,
            (F.col("id") * 48271) % (2 * n_dim),
        )
        .otherwise(F.col("id") + 10_000_000_000)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )

    t0 = time.time()
    bitmap = bloom_bitmap(dim, "k")
    t_build = time.time() - t0

    t0 = time.time()
    survivors = bloom_prefilter(fact, "k", bitmap).count()
    t_filter = time.time() - t0
    true_matches = fact.join(dim, "k", "left_semi").count()
    fp_rate = (survivors - true_matches) / max(n_fact - true_matches, 1)

    t0 = time.time()
    n_bloom = bloom_semi_join(fact, dim, "k").count()
    t_bloom = time.time() - t0
    t0 = time.time()
    n_plain = fact.join(dim.distinct(), "k", "left_semi").count()
    t_plain = time.time() - t0

    print(
        f"fact={n_fact:,} dim={n_dim:,} | bitmap build {t_build:.1f}s "
        f"(collect = {fact.rdd.getNumPartitions()} x 128KiB partials)"
    )
    print(
        f"prefilter {t_filter:.1f}s: {survivors:,} survivors of "
        f"{n_fact:,} ({survivors / n_fact:.4%}), true {true_matches:,}, "
        f"fp_rate {fp_rate:.6%}"
    )
    print(
        f"bloom_semi_join {t_bloom:.1f}s -> {n_bloom:,} rows | "
        f"plain semi-join {t_plain:.1f}s -> {n_plain:,} rows | "
        f"identical: {n_bloom == n_plain}"
    )
    assert n_bloom == n_plain


if __name__ == "__main__":
    main()

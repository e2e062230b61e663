"""Scale probe #21: hot-key joins — AQE skew split vs manual salting.

A 40M-row fact with 60% of rows on ONE key joins a 2M-row dim (too
big to broadcast under the default 10 MB threshold at real scale; we
force SMJ to model the large-large case). Three plans over identical
data:

  1. AQE skewJoin ON  (the engine default in session.py)
  2. AQE skewJoin OFF — the hot key lands in one straggler task
  3. operators/skew.py::salted_join — the manual device for engines
     or join shapes AQE can't rewrite (e.g. under a required
     output partitioning)

Run:  python scripts/scale_probe21_aqe_skew.py
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.operators.skew import salted_join  # noqa: E402
from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402

N_FACT = 80_000_000
N_DIM = 2_000_000
HOT_FRACTION = 0.9


def frames(spark):
    fact = spark.range(N_FACT).select(
        F.when(
            (F.col("id") % 10) < int(HOT_FRACTION * 10), F.lit(7)
        ).otherwise((F.col("id") * 2654435761) % N_DIM).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    return fact, dim


def run(spark, label, salted):
    fact, dim = frames(spark)
    t0 = time.time()
    if salted:
        joined = salted_join(fact, dim, ["k"], num_salts=32)
    else:
        joined = fact.join(dim.hint("merge"), "k")
    out = joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).collect()[0]
    dt = time.time() - t0
    print(f"{label}: wall={dt:.1f}s n={out['n']:,} checksum={out['s']}")
    return out["n"], out["s"], dt


def main() -> None:
    spark = get_spark("scale_probe21_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # warmup: codegen + shuffle service, result discarded
    fact, dim = frames(spark)
    fact.join(dim.hint("merge"), "k").agg(F.count(F.lit(1))).collect()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    n1, s1, t_aqe = run(spark, "AQE skewJoin ON ", salted=False)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    n2, s2, t_off = run(spark, "AQE skewJoin OFF", salted=False)

    n3, s3, t_salt = run(spark, "salted_join x32 ", salted=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert (n1, s1) == (n2, s2) == (n3, s3), "plans disagree on results"
    print(
        f"straggler penalty: {t_off / t_aqe:.1f}x vs AQE; "
        f"salted within {t_salt / t_aqe:.1f}x of AQE"
    )


if __name__ == "__main__":
    main()

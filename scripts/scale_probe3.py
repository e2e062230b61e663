"""Scale probe #3: the round-1-addition operators (PageRank,
interval union, HLL rollup, chi-square term selection, MAD outliers)
at 1M-doc / multi-M-event scale (VERDICT r1 item 10).

Inputs are generated in-executor (synthcorpus DataSource for docs,
``spark.range`` arithmetic for events) — zero input I/O, so what's
measured is the operator, not the scan. For each probe we report
wall-clock, output rows, Spark job/task counts (via the status
tracker) and the number of Exchanges in the physical plan — task
count shows whether the operator actually parallelized, exchange
count is the shuffle budget that must stay flat as the corpus grows.

Usage: python scripts/scale_probe3.py [n_docs] [n_events] [partitions]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.pydatasource import SynthCorpusDataSource


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark("scale-probe3")
    sc = spark.sparkContext
    spark.dataSource.register(SynthCorpusDataSource)
    from pyspark.sql import functions as F

    docs = (
        spark.read.format("synthcorpus")
        .option("rows", n_docs)
        .option("partitions", parts)
        .option("vocab", 5_000)
        .load()
    )
    docs.cache().count()

    # synthetic events: 100k users, value with heavy tail, 90-day span
    events = spark.range(0, n_events, 1, parts).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000).alias("user_id"),
        (F.col("id") % 17 + (F.col("id") % 97) * 3).cast("double").alias("value"),
        (F.col("id") % 7).cast("string").alias("event_type"),
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") * 37) % 7_776_000).alias("ts"),
    )
    events.cache().count()

    def probe(name, df_thunk):
        group = f"probe-{name}"
        sc.setJobGroup(group, group)
        t0 = time.monotonic()
        df = df_thunk()
        n = df.count()
        dt = time.monotonic() - t0
        sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            for s in info.stageIds if info else []:
                st = tracker.getStageInfo(s)
                n_tasks += st.numTasks if st else 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange")
        print(
            f"{name}: {dt:.2f}s rows={n} jobs={len(job_ids)} "
            f"tasks={n_tasks} exchanges={n_exch}"
        )

    from dbt_lakehouse_aws_spark.llmops.classify import chi2_terms
    from dbt_lakehouse_aws_spark.operators.aggregates import (
        distinct_sketch_rollup,
        mad_outliers,
    )
    from dbt_lakehouse_aws_spark.operators.graph import pagerank
    from dbt_lakehouse_aws_spark.operators.windows import interval_union_length

    # event graph: user -> user edges from consecutive-ish arithmetic
    edges = events.select(
        (F.col("event_id") % 50_000).alias("src"),
        ((F.col("event_id") * 7 + 13) % 50_000).alias("dst"),
    )
    probe("pagerank(50k nodes, 10 iters)", lambda: pagerank(edges, iters=10))

    probe(
        "interval_union(100k users)",
        lambda: interval_union_length(
            events.select(
                "user_id",
                F.col("ts").alias("s"),
                F.timestamp_seconds(F.unix_timestamp("ts") + 600).alias("e"),
            ),
            key_cols=["user_id"],
            start_col="s",
            end_col="e",
        ),
    )

    probe(
        "hll_rollup(day x user)",
        lambda: distinct_sketch_rollup(
            events.withColumn("day", F.to_date("ts")),
            group_col="day",
            value_col="user_id",
        ),
    )

    probe(
        "chi2_terms(1M docs)",
        lambda: chi2_terms(docs, label_col="source", k=20),
    )

    probe(
        "mad_outliers(7 groups)",
        lambda: mad_outliers(
            events, group_cols=["event_type"], value_col="value"
        ),
    )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

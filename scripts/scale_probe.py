"""Scale probe: run the LLM-pipeline hot paths on N synthetic docs
generated in-executor by the `synthcorpus` Python DataSource (zero
input I/O, partition-planned parallelism), and print docs/s.

This is the "would the plan survive 100×?" check that sf0.1 parquet
(one row group per file → single-task scans) cannot show: here scan
parallelism is an option, so operator scaling is visible.

Usage: python scripts/scale_probe.py [n_docs] [partitions]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from dbt_lakehouse_aws_spark.session import get_spark
from dbt_lakehouse_aws_spark.sources.pydatasource import SynthCorpusDataSource


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spark = get_spark("scale-probe")
    spark.dataSource.register(SynthCorpusDataSource)
    docs = (
        spark.read.format("synthcorpus")
        .option("rows", n_docs)
        .option("partitions", parts)
        .load()
        .withColumnRenamed("doc_id", "doc_id")
    )
    docs.cache().count()  # pin the corpus so probes time the operator

    from pyspark.sql import functions as F

    from dbt_lakehouse_aws_spark.llmops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_near_pairs,
    )
    from dbt_lakehouse_aws_spark.llmops.text import text_quality

    def probe(name, thunk):
        t0 = time.monotonic()
        n = thunk()
        dt = time.monotonic() - t0
        print(f"{name}: {dt:.2f}s  ({n_docs / dt:,.0f} docs/s, result rows={n})")

    probe(
        "minhash+lsh",
        lambda: lsh_candidate_pairs(minhash_signatures(docs)).count(),
    )
    probe("text_quality", lambda: text_quality(docs).count())
    # fan-out RATE is the health metric here (see PERF.md): near-pair
    # count must stay ~linear in n_docs, not quadratic
    probe(
        "simhash_near(h<=8)",
        lambda: simhash_near_pairs(docs, max_hamming=8).count(),
    )
    probe(
        "chunk_32/24",
        lambda: docs.select(
            "doc_id",
            F.posexplode(F.expr("sequence(1, greatest(size(split(text,' ')) - 31, 1), 24)")),
        ).count(),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Scale probe: run the LLM-pipeline hot paths on N synthetic docs
generated in-executor by the `synthcorpus` Python DataSource (zero
input I/O, partition-planned parallelism), and print docs/s.

This is the "would the plan survive 100×?" check that sf0.1 parquet
(one row group per file → single-task scans) cannot show: here scan
parallelism is an option, so operator scaling is visible.

Usage: python scripts/scale_probe.py [n_docs] [partitions] [vocab]

With vocab > 0 the run also plants near-duplicates (1% of docs,
last word dropped, id + 10M) and reports RECALL alongside fan-out —
the two health metrics for every pair-generating operator: candidate
count ~ linear in corpus size, planted pairs all found.
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
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    spark = get_spark("scale-probe")
    spark.dataSource.register(SynthCorpusDataSource)
    docs = (
        spark.read.format("synthcorpus")
        .option("rows", n_docs)
        .option("partitions", parts)
        .option("vocab", vocab)
        .load()
    )

    from pyspark.sql import functions as F

    if vocab > 0:  # plant near-dups so recall is measurable
        planted = docs.filter(F.col("doc_id") % 100 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.expr(
                "array_join(slice(split(text,' '), 1, size(split(text,' '))-1), ' ')"
            ).alias("text"),
            "source",
        )
        docs = docs.unionByName(planted)
    docs.cache().count()  # pin the corpus so probes time the operator

    def recall(pairs, a="doc_a", b="doc_b"):
        if vocab <= 0:
            return ""
        hits = pairs.filter(F.col(b).cast("long") - F.col(a).cast("long") == 10_000_000).count()
        return f", planted recall {hits}/{n_docs // 100}"

    from dbt_lakehouse_aws_spark.llmops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_near_pairs,
    )
    from dbt_lakehouse_aws_spark.llmops.text import text_quality

    def probe(name, thunk, pair_df=None):
        t0 = time.monotonic()
        n = thunk()
        dt = time.monotonic() - t0
        extra = recall(pair_df) if pair_df is not None else ""
        print(f"{name}: {dt:.2f}s  ({n_docs / dt:,.0f} docs/s, result rows={n}{extra})")

    lsh = lsh_candidate_pairs(minhash_signatures(docs)).cache()
    probe("minhash+lsh", lsh.count, pair_df=lsh)
    probe("text_quality", lambda: text_quality(docs).count())
    # fan-out RATE is the health metric here (see PERF.md): near-pair
    # count must stay ~linear in n_docs, not quadratic
    sim = simhash_near_pairs(docs, max_hamming=8, guaranteed=True, arrow=True).cache()
    probe("simhash_near(h<=8,guaranteed,arrow)", sim.count, pair_df=sim)
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

"""Scale probe #2: the round-2 text/retrieval/classifier operators
on N synthetic docs (zero-I/O Python DataSource, parallel scans).
Complements scale_probe.py; same health metrics — wall-clock,
docs/s, result sizes ~linear in corpus.

Usage: python scripts/scale_probe2.py [n_docs] [partitions] [vocab]
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
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    spark = get_spark("scale-probe2")
    spark.dataSource.register(SynthCorpusDataSource)
    from pyspark.sql import functions as F

    docs = (
        spark.read.format("synthcorpus")
        .option("rows", n_docs)
        .option("partitions", parts)
        .option("vocab", vocab)
        .load()
    )
    docs.cache().count()

    def probe(name, thunk):
        t0 = time.monotonic()
        n = thunk()
        dt = time.monotonic() - t0
        print(f"{name}: {dt:.2f}s  ({n_docs / dt:,.0f} docs/s, rows={n})")

    from dbt_lakehouse_aws_spark.llmops.classify import nb_predict, nb_train
    from dbt_lakehouse_aws_spark.llmops.corpus import (
        importance_resample,
        importance_weights,
        weighted_sample,
    )
    from dbt_lakehouse_aws_spark.llmops.dedup import duplicate_spans, paragraph_dedup
    from dbt_lakehouse_aws_spark.llmops.text import bm25_topk, tfidf_topk, unigram_entropy
    from dbt_lakehouse_aws_spark.llmops.tokenizer import bpe_train

    probe("paragraph_dedup(chunk=20)",
          lambda: paragraph_dedup(docs, chunk_tokens=20).count())
    probe("unigram_entropy", lambda: unigram_entropy(docs).count())
    probe("tfidf_top3", lambda: tfidf_topk(docs, k=3).count())
    probe("bm25_top20",
          lambda: bm25_topk(docs, ["w1", "w2", "w3"], k=20).count())
    probe("duplicate_spans(n=5)",
          lambda: duplicate_spans(docs, n=5, min_docs=2, k=20).count())

    def dsir():
        w = importance_weights(docs, target_pred=F.col("source") == "src0")
        return importance_resample(w).count()

    probe("dsir_weights+resample", dsir)

    def nb():
        model, priors = nb_train(docs, label_col="source")
        return nb_predict(docs, model, priors).count()

    probe("nb_train+predict", nb)
    probe("weighted_sample(k=1000)",
          lambda: weighted_sample(
              docs.withColumn("w", F.length("text").cast("double")),
              id_col="doc_id", weight_col="w", k=1000).count())

    t0 = time.monotonic()
    merges = bpe_train(docs, num_merges=12)
    print(f"bpe_train(12 merges): {time.monotonic() - t0:.2f}s (merges={len(merges)})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

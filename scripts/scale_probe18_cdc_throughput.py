"""Scale probe #18: content-defined chunking throughput.

cdc_chunks' engine path is one numpy correlate per document inside
mapInPandas — the claim is decode-bound vectorized throughput (no
per-char Python), so wall-clock should track corpus BYTES, not
document count, and parallelize across partitions.

Builds ~1 GB of synthetic text (N docs x ~520 chars), runs the full
chunker, reports MB/s and chunk stats.

Run:  python scripts/scale_probe18_cdc_throughput.py [n_docs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dbt_lakehouse_aws_spark.session import get_spark  # noqa: E402
from dbt_lakehouse_aws_spark.llmops.corpus import cdc_chunks  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(f"scale_probe18_cdc_{n}")

    # ~520 chars/doc, content varies by doc id so hashes differ
    word = F.concat(F.lit("w"), ((F.col("id") * 37 + F.col("k")) % 9973).cast("string"))
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(79)),
                    lambda k: F.concat(
                        F.lit("w"),
                        ((F.col("id") * 37 + k * 13) % 9973).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    total_bytes = docs.select(F.sum(F.length("text"))).collect()[0][0]

    t0 = time.time()
    out = cdc_chunks(docs, id_cols=["doc_id"], text_col="text")
    stats = out.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.sum("chunk_len").alias("chars"),
        F.max("chunk_len").alias("max_chunk"),
    ).collect()[0]
    wall = time.time() - t0
    mb = total_bytes / 1e6
    print(
        f"docs={n} corpus={mb:.0f}MB chunks={stats['chunks']} "
        f"(avg {stats['chars'] / stats['chunks']:.0f} chars, max "
        f"{stats['max_chunk']}) wall={wall:.1f}s -> "
        f"{mb / wall:.0f} MB/s on local[32]"
    )
    assert stats["chars"] == total_bytes  # lossless partition of the corpus
    spark.stop()


if __name__ == "__main__":
    main()

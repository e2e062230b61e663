"""Distributed BPE tokenizer: merge-rule training and encoding.

Classic byte-pair-encoding (Sennrich et al. 2016) re-expressed for a
cluster. The key scale observation is the one every tokenizer trainer
uses: BPE statistics depend only on the **word-frequency table**, not
the corpus — so the heavy input (100 TB of text) collapses to a
(word, count) relation after one explode + hash count (shuffle
O(vocab), map-side combinable), and every merge round then runs on
vocab-sized data (millions of rows at web scale, not billions).

Training round (all built-in array expressions, JVM-side):
  1. pair counts: explode adjacent symbol pairs per word, weighted by
     word count → partial+final hash agg (shuffle O(pair-types));
  2. best pair: deterministic argmax (count desc, then pair asc) via
     ``orderBy().limit(1)`` → TakeOrderedAndProject, no global sort;
  3. merge application: per-word left-to-right fold (``F.aggregate``)
     replacing adjacent (a, b) with ``ab`` — embarrassingly parallel.
Lineage is truncated with ``localCheckpoint`` every few rounds
(PERF.md rule: iterative algorithms re-plan from flat plans).

Encoding ships as an Arrow-batched ``mapInPandas`` with the merge
ranks broadcast — the standard production shape (tokenization is a
per-doc CPU loop; Arrow amortizes the Python boundary), cited shape:
GPT-2's ``bpe()`` rank-greedy loop.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w_count"))
    )


def _merge_once(syms: Column, a: str, b: str) -> Column:
    """Left-to-right single-pass merge of adjacent (a, b) → a+b.

    Fold with a (done-prefix, pending) accumulator: ``pending`` holds
    the previous symbol so a greedy merge consumes it — matching the
    sequential semantics of reference BPE implementations (aaa with
    merge (a,a) → [aa, a], not [aa, aa]).
    """
    merged = F.lit(a + b)
    step = lambda acc, x: (
        F.when(
            (acc["pending"] == F.lit(a)) & (x == F.lit(b)),
            F.struct(
                F.concat(acc["done"], F.array(merged)).alias("done"),
                F.lit(None).cast("string").alias("pending"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pending"].isNotNull(),
                    F.concat(acc["done"], F.array(acc["pending"])),
                )
                .otherwise(acc["done"])
                .alias("done"),
                x.alias("pending"),
            )
        )
    )
    zero = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit(None).cast("string").alias("pending"),
    )
    fin = lambda acc: F.when(
        acc["pending"].isNotNull(), F.concat(acc["done"], F.array(acc["pending"]))
    ).otherwise(acc["done"])
    return F.aggregate(syms, zero, step, fin)


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 30,
    checkpoint_every: int = 5,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a document corpus.

    Returns the ordered merge list. Deterministic: ties in pair
    frequency break on the pair's lexicographic order.
    """
    vocab = _word_counts(docs, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for step in range(num_merges):
        # NB: sequence(1, 0) is DESCENDING, not empty — single-symbol
        # words must short-circuit to an empty pair list (ANSI mode
        # errors on the out-of-range element_at otherwise).
        pair_list = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array())
        pairs = vocab.select("w_count", F.explode(pair_list).alias("pair"))
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("w_count").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair.a"), F.asc("pair.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        a, b = best[0]["pair"]["a"], best[0]["pair"]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_once(F.col("syms"), a, b))
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_vocab(docs: DataFrame, *, text_col: str = "text", num_merges: int = 30) -> DataFrame:
    """Driver-facing merge table: (step, left, right, merged)."""
    spark = docs.sparkSession
    merges = bpe_train(docs, text_col=text_col, num_merges=num_merges)
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "step long, left string, right string, merged string"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE apply (the GPT-2 ``bpe()`` loop shape)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents into BPE subword arrays.

    Arrow-batched ``mapInPandas`` with the merge-rank dict closed
    over (broadcast with the serialized task, ~vocab-sized): the
    per-word merge loop is inherently sequential, so this is the
    honest production path — never a row-at-a-time Python UDF.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_field = docs.schema[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for b in batches:
            toks = []
            for text in b[text_col]:
                out: list[str] = []
                for w in str(text).split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
            yield pd.DataFrame({id_col: b[id_col], "bpe_tokens": toks})

    schema = f"{id_col} {id_field.dataType.simpleString()}, bpe_tokens array<string>"
    return docs.mapInPandas(run, schema=schema)

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
from dbt_lakehouse_aws_spark.localframe import local_frame
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


def _safe_batch(top: list, *, truncated: bool) -> list:
    """Longest prefix of the count-sorted candidate pairs that is
    PROVABLY order-equivalent to applying them one at a time.

    Accepted pairs must be pairwise symbol-disjoint: merging (a, b)
    only perturbs counts of pairs touching ``a`` or ``b``, so a
    disjoint prefix's counts are mutually invariant. The prefix stops
    at the first candidate sharing a symbol with an accepted pair —
    every count that the accepted merges can change (including NEW
    pairs like (x, ab), whose count is bounded by the old (x, a)
    count) then sits at or below that cutoff count. Finally any
    accepted tail with count ≤ cutoff is dropped: a changed/new pair
    tying the tail's count could win the lexicographic tie-break in
    the sequential order, so only strictly-above-cutoff merges are
    certain. If the candidate list was truncated (a full batch with
    no violator), the unseen remainder plays the cutoff role.
    Falls back to the single top pair (exact sequential step) when
    the safety rule leaves nothing.
    """
    accepted: list = []
    seen: set[str] = set()
    cutoff = -1
    for row in top:
        a, b = row["pair"]["a"], row["pair"]["b"]
        if a in seen or b in seen:
            cutoff = row["n"]
            break
        accepted.append(row)
        seen.update((a, b))
    else:
        if truncated and top:
            cutoff = top[-1]["n"]
    while accepted and accepted[-1]["n"] <= cutoff:
        accepted.pop()
    return accepted or top[:1]


def _bpe_train_inmem(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE on a collected (word, count) table — bit-identical
    semantics to the distributed loop: overlapping adjacencies all
    count (``aaa`` contributes 2 to (a, a)), ties break on the
    pair's lexicographic order, merges apply greedily left-to-right,
    training stops when the best pair's count drops below 2."""
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_counts.items() if len(w) > 1
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        for idx, (syms, c) in enumerate(words):
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = (out, c)
    return merges


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 30,
    checkpoint_every: int = 5,
    batch_merges: int = 64,
    driver_vocab_limit: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a document corpus.

    Returns the ordered merge list. Deterministic: ties in pair
    frequency break on the pair's lexicographic order.

    Two execution paths, identical results (round-1 watch item: the
    one-job-per-merge loop paints 32k job launches at real vocab
    sizes):

    * **Collected-vocab path** (distinct words ≤
      ``driver_vocab_limit``): one distributed word-count job, one
      collect, then exact in-memory training — the shape every
      production tokenizer trainer uses, because BPE statistics
      depend only on the vocab-bounded (word, count) table. 2 Spark
      jobs regardless of ``num_merges``. At the default limit the
      collected table is ≲100 MB; web-scale corpora plateau around
      10⁷ distinct (lowercased, length-capped) words, so this is the
      100 TB path too, not a toy shortcut.
    * **Distributed path** (vocab above the limit): per pass,
      collect the top-``batch_merges`` candidate pairs and apply the
      :func:`_safe_batch` prefix — provably order-equivalent to
      one-at-a-time merging, one job per PASS instead of per merge.
      ``batch_merges=1`` degenerates to the classic sequential loop
      (used as the equality oracle in tests).
    """
    vocab = _word_counts(docs, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    )
    vocab = vocab.localCheckpoint(eager=True)

    if vocab.count() <= driver_vocab_limit:
        rows = vocab.select("word", "w_count").collect()
        return _bpe_train_inmem({r["word"]: r["w_count"] for r in rows}, num_merges)

    merges: list[tuple[str, str]] = []
    passes = 0
    while len(merges) < num_merges:
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
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("w_count").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair.a"), F.asc("pair.b"))
            .limit(batch_merges)
            .collect()
        )
        top = [r for r in top if r["n"] >= 2]
        if not top:
            break
        batch = _safe_batch(top, truncated=len(top) == batch_merges)
        batch = batch[: num_merges - len(merges)]
        # one projection applies the whole batch: the per-pair folds
        # compose into a single map-only stage over the vocab table
        for row in batch:
            a, b = row["pair"]["a"], row["pair"]["b"]
            merges.append((a, b))
            vocab = vocab.withColumn("syms", _merge_once(F.col("syms"), a, b))
        passes += 1
        if passes % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_vocab(docs: DataFrame, *, text_col: str = "text", num_merges: int = 30) -> DataFrame:
    """Driver-facing merge table: (step, left, right, merged)."""
    spark = docs.sparkSession
    merges = bpe_train(docs, text_col=text_col, num_merges=num_merges)
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return local_frame(
        spark, rows, "step long, left string, right string, merged string"
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


def build_vocab_ids(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_freq: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense vocabulary id assignment — the embedding-table prep
    step: every distinct whitespace token gets a contiguous id
    ``0..V-1`` in ``(freq DESC, token ASC)`` order (id 0 = most
    frequent; the tie rule makes the mapping a pure function of the
    corpus). Returns ``(token, freq, token_id)``.

    The rank comes from :func:`operators.windows.global_row_number`
    — a ``row_number() OVER (ORDER BY freq DESC)`` would funnel the
    whole vocabulary through one task; the two-pass range split
    keeps id assignment distributed at web-corpus vocab sizes
    (hundreds of millions of distinct tokens before subword
    tokenization). One count shuffle + one range exchange.
    """
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number

    freqs = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    ranked = global_row_number(
        freqs,
        [F.desc("freq"), F.asc("token")],
        name="_rn",
        num_partitions=num_partitions,
    )
    return ranked.withColumn(
        "token_id", (F.col("_rn") - 1).cast("long")
    ).drop("_rn")


def _isqrt_sql(x: str) -> str:
    """Exact integer sqrt as portable SQL: correctly-rounded double
    sqrt + a ±1 correction, so the result is floor(√x) for every
    BIGINT x regardless of the boundary behavior of either engine's
    float→int conversion. Identical text runs on Spark and DuckDB.
    """
    s = f"CAST(floor(sqrt(CAST(({x}) AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({s} + 1) * ({s} + 1) <= ({x}) THEN {s} + 1 "
        f"WHEN {s} * {s} > ({x}) THEN {s} - 1 ELSE {s} END)"
    )


#: floor(freq^(3/4)) in pure integer arithmetic: the nested-floor
#: identity floor(⁴√v) = floor(√floor(√v)) applied to v = freq³.
#: Valid while freq³ < 2⁶³ (freq ≤ ~2M occurrences — document
#: corpora clear that only for stopwords at extreme scale; cap first).
NEG_WEIGHT_SQL = _isqrt_sql(_isqrt_sql("freq * freq * freq"))

#: quadratic-mix integer hash of the draw index (same device as the
#: bootstrap's _BOOT_U: linear-congruential step then h*(h+1) to
#: break lattice structure), yielding u in [0, 2³¹-1). Operands stay
#: < 2⁶², pure BIGINT, evaluated VERBATIM by both engines.
NEG_DRAW_HASH_SQL = (
    "(((j * 1103515245 + 12345) % 2147483647)"
    " * (((j * 1103515245 + 12345) % 2147483647) + 1)"
    " + 987654321) % 2147483647"
)


def negative_sampling_draws(
    vocab: DataFrame,
    *,
    k: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """word2vec-style negative sampling, exactly replayable: token
    weights ``floor(freq^0.75)`` (unigram-smoothed, in PURE INTEGER
    arithmetic — see :data:`NEG_WEIGHT_SQL`), cumulative weight
    bands ``[lo, hi)`` laid out in ``token_id`` order via the
    two-pass :func:`operators.windows.prefix_sum`, and ``k``
    deterministic draws ``u_j = hash(j) mod W`` resolved to their
    containing band by a BUCKETED equi-join — each band explodes
    onto the coarse buckets it overlaps (narrow bands → ~1 copy),
    draws join on ``u div B`` and the exact containment predicate
    filters collisions. No sort-merge against the full table, no
    per-draw search: the searchsorted becomes a hash join.

    Returns ``(j, u, token, token_id, freq)`` — one row per draw.
    Draws use modular reduction of a 31-bit hash (bias ≤ W/2³¹,
    and IDENTICAL on any engine replaying the same formula).
    """
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    spark = vocab.sparkSession
    weighted = vocab.withColumn("w", F.expr(NEG_WEIGHT_SQL))
    bands = prefix_sum(
        weighted, [F.asc("token_id")], "w", name="hi"
    ).withColumn("lo", F.col("hi") - F.col("w"))
    bands = bands.localCheckpoint(eager=True)  # pin ranges for W + join
    total_w = bands.agg(F.max("hi")).collect()[0][0]
    bucket = max(total_w // n_buckets, 1)

    band_buckets = bands.select(
        "token",
        "token_id",
        "freq",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.expr(f"lo div {bucket}L").cast("int"),
                F.expr(f"(hi - 1) div {bucket}L").cast("int"),
            )
        ).alias("bk"),
    )
    draws = spark.range(k).select(
        F.col("id").alias("j"),
        (F.expr(NEG_DRAW_HASH_SQL) % F.lit(total_w)).alias("u"),
    )
    return (
        draws.withColumn("bk", F.expr(f"u div {bucket}L").cast("int"))
        .join(band_buckets, "bk")
        .filter((F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
        .select("j", "u", "token", "token_id", "freq")
    )

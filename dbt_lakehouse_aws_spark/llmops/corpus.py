"""Corpus-construction operators: deterministic sampling and
sequence packing — the steps between "deduped, filtered documents"
and "training shards" in an LLM data pipeline (engine extensions;
no reference counterpart — the reference's closest shape is its
positional-pool top-k, `stg_*_rep_lvl_*.sql`).

Determinism is the design constraint: a 100 TB corpus job reruns
(preemption, incremental refresh), and a sample that changes per run
poisons downstream dedup/eval splits. So no ``rand()`` and no
``TABLESAMPLE`` — membership is a pure function of the row's id via
a Knuth multiplicative hash in a Mersenne-prime field, computed
identically in any engine (all arithmetic stays < 2^62, no overflow,
no engine-specific hash):

    h(id) = ((id mod M) * (2654435761 mod M)) mod M,  M = 2^31 - 1

``deterministic_sample`` keeps rows with h < fraction·M (Bernoulli
by hash); ``stratified_sample`` keeps the k lowest-h rows per
stratum (balanced corpus, e.g. equal docs per language); both are
plain filters/windows — fully pushed down, one shuffle at most.

``pack_sequences`` is the concat-and-chunk pretraining regime:
documents in deterministic order are laid end-to-end and cut every
``budget`` tokens; a document belongs to the chunk where it starts
(running-sum window, same single-shuffle shape as sessionization).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime
_KNUTH = 2_654_435_761 % MERSENNE31  # golden-ratio multiplier, reduced


def portable_hash(id_col: Column) -> Column:
    """Engine-portable uniform hash of an integer id into
    [0, 2^31-1): identical in Spark and ANSI SQL (BIGINT-safe —
    operands stay below 2^62)."""
    return F.pmod(F.pmod(id_col.cast("long"), F.lit(MERSENNE31)) * F.lit(_KNUTH), F.lit(MERSENNE31))


def deterministic_sample(df: DataFrame, *, id_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the
    id — stable across runs, engines, and partitionings (unlike
    ``df.sample``, whose output depends on partition layout). Plans
    as a single codegen filter; no shuffle."""
    return df.filter(portable_hash(F.col(id_col)) < int(fraction * MERSENNE31))


def stratified_sample(
    df: DataFrame, *, strata: Sequence[str], k: int, id_col: str
) -> DataFrame:
    """The k lowest-hash rows per stratum — a balanced, deterministic
    per-group sample (equal documents per language/source for corpus
    mixing). One shuffle on the strata; rank-limit pushdown
    (WindowGroupLimit) prunes each partition to k before the sort
    completes."""
    w = Window.partitionBy(*strata).orderBy(portable_hash(F.col(id_col)), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str,
    budget: int,
    id_col: str,
    shard_cols: Sequence[str] = (),
) -> DataFrame:
    """Concat-and-chunk packing: in ``id_col`` order (per shard),
    documents are laid end-to-end and cut every ``budget`` tokens;
    each doc is assigned the chunk where its first token lands.
    Returns per-chunk stats (``chunk_id``, ``n_docs``,
    ``chunk_tokens``) plus the shard columns.

    Same plan shape as batch sessionization: one exchange (by shard,
    or a deliberate single-partition global pack when ``shard_cols``
    is empty — pack per shard at scale), a running-sum window, and a
    group-by that reuses the exchange's distribution.
    """
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return (
        df.withColumn("chunk_id", F.floor(start / budget))
        .groupBy(*shard_cols, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("chunk_tokens"),
        )
    )


def sample_by_rates(
    df: DataFrame,
    *,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float,
    id_col: str,
) -> DataFrame:
    """Corpus mixing: keep each stratum at its own rate (the
    "2 epochs of wiki, 0.3 of crawl" knob), deterministically —
    membership is portable_hash(id) < rate·M with the rate resolved
    per stratum from a literal CASE chain, so the whole thing is one
    codegen filter: no join, no shuffle, no randomness. A row's
    membership never changes as other strata's rates are tuned
    (hash order is shared), which keeps incremental re-mixes cheap.
    """
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(
        portable_hash(F.col(id_col)).cast("double") < rate * float(MERSENNE31)
    )

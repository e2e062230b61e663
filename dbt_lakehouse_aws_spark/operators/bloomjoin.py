"""Bloom-filter semi-join reduction.

The scalable middle ground between a broadcast semi-join (small side
must fit in executor memory as an EXACT set) and a full shuffle
semi-join (both sides shuffle on the key): build a fixed-size Bloom
bitmap over the small side's keys, broadcast the BITMAP (128 KiB for
the default 2^20 bits — constant, independent of key count), and
pre-filter the big fact side *before* its shuffle. False positives
are then removed by the exact semi-join, which now runs over the
pruned fact — so the result is exactly the semi-join's, while the
expensive shuffle moves only `|matching| + fp_rate·|big|` rows
instead of `|big|`.

This is the same trick Spark's runtime row-level filtering applies
inside the JVM for sort-merge joins; implementing it as an operator
makes it available to ANY downstream consumer (aggregations,
mapInPandas stages, ACID MERGE file pruning) and under any join
strategy.

Engineering shape (the 100 TB contract):

- The bitmap is built DISTRIBUTED: each partition folds its keys
  into a local ``m/8``-byte numpy bitmap via ``mapInPandas``; the
  driver ORs one bitmap per partition — collect volume is
  ``num_partitions × m/8`` bytes, never a function of key count.
- Hashes are k deterministic multiply-shift functions over the
  int64 key (top ``log2 m`` bits of ``x·A_i + B_i`` in wrapping
  uint64 arithmetic) — no seeds, no RNG, identical across sessions.
  String keys are hashed to int64 with ``F.xxhash64`` first.
- The pre-filter is an Arrow-batched ``mapInPandas`` testing all k
  bits vectorized in numpy — no row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: k=5 fixed odd multipliers / offsets (digits of well-known
#: constants, as in xxhash/murmur finalizers) — deterministic, no RNG.
_A = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
    0x85EBCA77C2B2AE63,
)
_B = (
    0x1F83D9ABFB41BD6B,
    0x5BE0CD19137E2179,
    0x6A09E667F3BCC908,
    0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B,
)

DEFAULT_M_BITS = 1 << 20  # 128 KiB bitmap, fp ~0.005 at 100k keys


def _positions(vals: pd.Series, m_bits: int, k: int) -> list[np.ndarray]:
    """k arrays of bit positions for the int64 key column."""
    x = vals.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
    shift = np.uint64(64 - (m_bits.bit_length() - 1))
    with np.errstate(over="ignore"):
        return [
            ((x * np.uint64(_A[i]) + np.uint64(_B[i])) >> shift)
            for i in range(k)
        ]


def bloom_bitmap(
    df: DataFrame, key: str, *, m_bits: int = DEFAULT_M_BITS, k: int = 5
) -> bytes:
    """Distributed Bloom-bitmap build over ``df[key]`` (int64).

    One ``m/8``-byte partial bitmap per partition comes back to the
    driver (bounded by partition count, NOT key count) and is OR-ed
    into the final filter.
    """
    if not (m_bits & (m_bits - 1) == 0 and m_bits >= 8):
        raise ValueError("m_bits must be a power of two >= 8")
    if not 1 <= k <= len(_A):
        raise ValueError(f"k must be in [1, {len(_A)}]")
    nbytes = m_bits // 8

    def per_partition(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            for pos in _positions(pdf[key], m_bits, k):
                np.bitwise_or.at(
                    bm, pos >> np.uint64(3),
                    np.left_shift(
                        np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                    ),
                )
        if any_rows:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    parts = (
        df.select(F.col(key).cast("long").alias(key))
        .mapInPandas(per_partition, "bitmap binary")
        .collect()
    )
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes()


def bloom_prefilter(
    df: DataFrame,
    key: str,
    bitmap: bytes,
    *,
    m_bits: int = DEFAULT_M_BITS,
    k: int = 5,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (never drops a
    true match; passes a bounded fraction of non-matches)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bitmap)
    schema = df.schema

    def test(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            mask = np.ones(len(pdf), dtype=bool)
            kv = pdf[key].astype("int64")
            for pos in _positions(kv, m_bits, k):
                bit = np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                )
                mask &= (bm[pos >> np.uint64(3)] & bit) != 0
            out = pdf[mask]
            if len(out):
                yield out

    return df.mapInPandas(test, schema)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    k: int = 5,
) -> DataFrame:
    """Exact LEFT SEMI join of ``big`` against ``small`` on ``key``
    (both sides int64-keyed, same column name), with the big side
    Bloom-pruned BEFORE its shuffle. Result is bit-identical to
    ``big.join(small, key, "left_semi")`` — the trailing exact
    semi-join removes the filter's false positives."""
    bitmap = bloom_bitmap(small, key, m_bits=m_bits, k=k)
    pruned = bloom_prefilter(big, key, bitmap, m_bits=m_bits, k=k)
    return pruned.join(
        small.select(key).distinct(), on=key, how="left_semi"
    )

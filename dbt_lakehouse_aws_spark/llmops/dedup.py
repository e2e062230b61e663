"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:

* **exact_dedup** — hash-groupBy on the dedup key: one shuffle of
  (key-hash, id) pairs, min-id wins. At 100 TB, group on a 128-bit
  content hash, never the raw text, so shuffle volume is tiny.
* **ngram_jaccard_pairs** — the *exact* baseline: explode distinct
  shingles, self-join on shingle, count intersections. Quadratic in
  per-shingle document frequency → correct but only for modest
  corpora / verification; the optional ``max_doc_freq`` cut drops
  ubiquitous shingles (standard "stop-shingle" trick) to bound the
  join fan-out.
* **minhash_lsh** — the scale path: k permutation-style min-hashes
  from one base hash (``(a_i·h + b_i) mod p``), banded; candidate
  pairs only where a full band matches. Shuffle volume O(docs·bands),
  join fan-out bounded by bucket sizes — this is what runs at 100 TB,
  with the Jaccard baseline as its accuracy oracle.
* **simhash64** — near-dup bit fingerprint; Hamming-ball lookups.

Everything is built-in column expressions (no Python UDFs), and all
arithmetic is ANSI-mode safe (Spark 4 default): hashes are reduced
mod 2^31−1 before affine transforms so no int64 overflow is possible.
"""

from __future__ import annotations

from collections.abc import Sequence

from dbt_lakehouse_aws_spark.localframe import local_frame
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from dbt_lakehouse_aws_spark.llmops.text import word_shingles

# MinHash parameters: h_i(x) = (a_i * x + b_i) mod P.
# P = 2^31 − 1 (Mersenne prime) keeps a_i·x + b_i far below int64
# overflow even under ANSI arithmetic.
MINHASH_PRIME = (1 << 31) - 1


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before an expensive
    interpreted projection.

    The fingerprint builders run higher-order-function trees
    (shingling, per-shingle hashing, vote tallies) that Spark
    evaluates INTERPRETED, outside whole-stage codegen — so their
    cost is per-row CPU, and the scan's partitioning decides the
    parallelism. A small parquet input (one file ≪
    maxPartitionBytes) arrives as ONE partition and serializes the
    whole corpus through one core: measured 112 s → 7 s at sf0.1
    (5k docs, local[32]) from this guard alone (r7 simhash
    finding). At 100 TB inputs already exceed defaultParallelism
    and this is a no-op — the repartition only fires on the
    under-parallel case it exists for."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, key_cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep one survivor (min id) per duplicate group; report group size."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs, distinct per document.

    Dedup happens with ``array_distinct`` BEFORE the explode: within-
    document uniqueness is a per-row property, so a map-side array op
    replaces what a post-explode ``.distinct()`` would do with a full
    (id, shingle) shuffle — at 100 TB that's the difference between
    zero and one extra shuffle of the entire shingle stream.
    """
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs above ``threshold``.

    jaccard(A,B) = |A∩B| / (|A|+|B|−|A∩B|) over distinct word
    n-gram shingle sets. Intersections come from a shingle self-join
    (map-side combinable count), set sizes from one groupBy.
    """
    sh = shingle_table(df, id_col, text_col, n)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(freq.filter(F.col("_df") <= max_doc_freq).select("shingle"), "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """The seeded full-range (a_i, b_i) affine coefficients shared by
    :func:`minhash_signatures` and the SQL-oracle generator — one
    source of truth so the replay can't drift from the operator."""
    import random as _random

    rng = _random.Random(0xD0C5EED)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def _portable_hash60(col: str | Column) -> Column:
    """60-bit hash = first 15 hex chars of md5, as a non-negative long.

    The point is CROSS-ENGINE reproducibility: ``xxhash64`` exists
    only in Spark, but md5 is bit-identical everywhere, so
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`` computes the
    SAME value in DuckDB (verified including unicode). 15 hex chars
    (60 bits < 2^63) keep the parse ANSI-safe in both engines. Still
    a single JVM codegen call per value — no Python in the loop —
    but md5 costs more cycles than xxhash64, so it's opt-in
    (``portable=True``) where an external SQL oracle must replay the
    pipeline, and xxhash64 stays the default production path.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _base_hash(col: str | Column, *, portable: bool = False) -> Column:
    """Base shingle hash folded into [0, P): ANSI-safe for affine
    transforms. ``portable=True`` swaps xxhash64 for the md5-prefix
    hash so SQL oracles can recompute identical signatures."""
    h = _portable_hash60(col) if portable else F.xxhash64(col)
    return F.pmod(h, F.lit(MINHASH_PRIME).cast("long"))


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> DataFrame:
    """(id, array<long> signature): min over shingles per hash fn.

    Base shingle hash is ``xxhash64`` (JVM built-in) reduced mod
    P=2^31−1; the k "permutations" are affine transforms
    ``(a_i·h + b_i) mod P`` with a_i, b_i drawn FULL-RANGE from a
    seeded RNG. Full-range multipliers are load-bearing: with small
    a_i (an earlier revision used a_i = 2i+1 ≤ 63), ``a_i·h + b_i``
    stays below P for every h < P/63, so no position ever wraps and
    ALL k functions share one argmin — the shingle with the smallest
    base hash decides the entire signature, and any two docs sharing
    one low-hash shingle collide at est_jaccard=1.0 (observed: a
    20 000-doc corpus produced thousands of false candidate pairs,
    and LSH fan-out exploded quadratically with corpus size). With
    a_i ~ U[1, P), a_i·h ≥ P for essentially every shingle, the mod
    wraps ~a_i times, and positions are pairwise-independent in the
    classic universal-hashing sense. a_i·h < 2^62 — no int64
    overflow under ANSI mode.

    One explode + one groupBy(id) — shuffle O(docs·shingles) once;
    signatures thereafter are ``num_hashes × 8`` bytes per doc.
    """
    # NOTE(perf): a naive all-array variant (re-hashing shingles
    # inside every per-hash transform) measured 17× slower per core;
    # a well-factored one (hash once, then 32 affine array_min
    # transforms) TIES this plan warm on local[32] while avoiding
    # the shuffle entirely. We keep explode+groupBy: the map-side
    # partial min makes its shuffle O(docs), and codegen'd explode
    # beats interpreted higher-order funcs per CPU cycle.
    sh = shingle_table(df, id_col, text_col, n)
    # the base hash lands in its OWN projection so the 32 affine
    # transforms provably read one evaluation — leaving `base` inline
    # in every hash column relied on codegen subexpression
    # elimination, which does not fully fire for the md5/conv
    # portable path (measured 1.57 -> 1.26 s at sf0.1, guide §1.2)
    based = sh.select(id_col, _base_hash("shingle", portable=portable).alias("_b"))
    hash_cols = []
    for i, (a, b) in enumerate(minhash_coefficients(num_hashes)):
        h = F.pmod(F.lit(a).cast("long") * F.col("_b") + F.lit(b).cast("long"),
                   F.lit(MINHASH_PRIME).cast("long"))
        hash_cols.append(h.alias(f"_h{i}"))
    hashed = based.select(id_col, *hash_cols)
    mins = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)]
    )
    return mins.select(id_col, F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("signature"))


def banded_signatures(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_bands: int = 8,
) -> DataFrame:
    """(id, signature, band, bucket): each signature row exploded
    onto its ``num_bands`` LSH keys, bucket = xxhash64 of the band's
    signature slice. Shared by the one-shot pair join
    (:func:`lsh_candidate_pairs`) and the persisted incremental index
    (:mod:`~dbt_lakehouse_aws_spark.llmops.incremental_dedup`), so
    both produce identical bucket keys for the same corpus."""
    sig = signatures.select(F.col(id_col), "signature")
    rows_per_band = (F.size("signature") / num_bands).cast("int")
    return sig.select(
        id_col,
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.slice("signature", bnd * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(
        id_col,
        "signature",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_bands: int = 8,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH candidate pairs with estimated Jaccard.

    Each row emits ``num_bands`` (band, bucket=hash(band slice))
    keys; an equi-join on (band, bucket) yields candidates — the
    only join in the pipeline, and its fan-out is bounded by bucket
    occupancy, not corpus size. Estimated Jaccard = fraction of
    matching signature positions.
    """
    banded = banded_signatures(signatures, id_col=id_col, num_bands=num_bands)
    return lsh_pairs_from_banded(
        banded, id_col=id_col, est_threshold=est_threshold
    )


def lsh_pairs_from_banded(
    banded: DataFrame,
    *,
    id_col: str = "doc_id",
    est_threshold: float = 0.5,
) -> DataFrame:
    """The pair-join half of :func:`lsh_candidate_pairs`, taking an
    already-banded table — so callers that band once for several
    purposes (the incremental index) don't re-explode signatures.

    The estimate filter runs BEFORE the duplicate-collapse distinct
    (round 10, guide §2.3): a bucket-collision duplicate of a pair
    carries the identical est_jaccard, so filtering first is
    output-identical while the de-dup exchange moves only the pairs
    that pass the threshold — 3 narrow columns instead of every
    candidate with both 32-long signature arrays (~512 B/row).
    """
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b"), "band", "bucket"
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)).cast(
            "double"
        )
        / F.size("sig_a")
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .distinct()
    )


def simhash64(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "simhash",
    n: int = 3,
    arrow: bool = False,
    portable: bool = False,
) -> DataFrame:
    """63-bit SimHash over distinct word ``n``-gram shingles.

    For each bit position, sum ±1 votes of the shingle hashes' bits
    (``getbit``); fingerprint bit set iff the vote is positive.
    63 bits keeps ``Σ bit_i·2^i`` inside a signed int64 under ANSI
    arithmetic. Default path is pure array expressions — no shuffle,
    no Python.

    ``arrow=True`` keeps shingling + ``xxhash64`` JVM-side (codegen)
    but moves the 63-lane bit-vote tally into a vectorized numpy
    pandas_udf: higher-order array functions are interpreted
    expression-tree walks (63 × shingles nodes per doc), while the
    same tally is three numpy ops on a (Σshingles × 63) bit matrix.
    Both paths produce BIT-IDENTICAL fingerprints (asserted in
    tests); arrow measured ~15× faster at 20k docs (18.6 s → 1.2 s)
    and is the production path — the default stays expression-only
    so the operator also runs where Arrow workers are unavailable.

    Features are shingles (same modality as MinHash), not unigram
    tokens: on a low-vocabulary corpus every document contains
    nearly every token, unigram feature sets coincide, and the
    fingerprints collapse onto each other — a 100k-doc probe with a
    30-word vocabulary produced 95.5M "near" pairs from unigram
    features vs a sane fan-out from 3-gram features. ``n=1`` gives
    the unigram behavior back where vocabulary is genuinely rich.
    """
    df = _ensure_parallelism(df)
    toks = F.array_distinct(
        word_shingles(text_col, n) if n > 1 else F.split(F.col(text_col), " ")
    )
    # portable mode: md5-prefix hashes are 60-bit, so vote lanes
    # 60-62 see only 0 bits and the fingerprint's top 3 bits come out
    # 0 — same operator semantics at 60 effective bits, and an
    # external SQL engine can replay it exactly (see _portable_hash60)
    th = F.transform(toks, lambda t: _portable_hash60(t) if portable else F.xxhash64(t))
    if arrow:
        import numpy as np
        import pandas as pd

        def _fp_fn(hs):  # no type hints: module-level `from
            # __future__ import annotations` stringifies them, which
            # pandas_udf's eval-type inference can't resolve here
            lists = hs.tolist()
            counts = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
            res = np.zeros(len(lists), dtype=np.int64)
            nz = counts > 0
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in lists if len(x)]
                ).view(np.uint64)
                shifts = np.arange(63, dtype=np.uint64)
                bits = (flat[:, None] >> shifts[None, :]) & np.uint64(1)
                offsets = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
                ones = np.add.reduceat(bits, offsets, axis=0)
                votes = (2 * ones > counts[nz][:, None]).astype(np.uint64)
                res[nz] = (votes << shifts[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)
            return pd.Series(res)

        _fp = F.pandas_udf(_fp_fn, "long")
        return df.select(F.col(id_col), _fp(th).alias(out))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(62)),
        lambda bit: F.when(
            F.aggregate(
                th,
                F.lit(0).cast("long"),
                lambda acc, h: acc + (F.getbit(h, bit) * 2 - 1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    # fold bits → integer MSB-first: acc*2 + bit (max 2^63−1, safe)
    sim = F.aggregate(F.reverse(bits), F.lit(0).cast("long"), lambda acc, b: acc * 2 + b)
    return df.select(F.col(id_col), sim.alias(out))


def simhash_near_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    num_blocks: int | None = None,
    guaranteed: bool = False,
    arrow: bool = False,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash within ``max_hamming`` bits.

    Scale path: block the 63-bit fingerprint into segments, join on
    exact block keys, verify the true Hamming distance with
    ``bit_count(a XOR b)`` — never an all-pairs compare.

    Recall guarantee (pigeonhole, stated precisely):

    - default (``guaranteed=False``, 4 blocks): a pair is SURE to
      collide only when ``hamming < num_blocks``; pairs with more
      differing bits are found only if their differences happen to
      cluster outside one block. A 20k-doc probe with planted
      near-dups measured 156/200 recall at ``max_hamming=8`` — the
      documented trade for a candidate count that stays ~linear.
    - ``guaranteed=True``: probe-side keys are expanded with every
      1-bit flip (HmSearch-style), so some block matches whenever
      ``hamming ≤ 2·num_blocks − 1``; ``num_blocks`` auto-sizes to
      ``max_hamming//2 + 1`` — full recall (200/200 on the same
      probe), at ~(width+1)× probe index rows and a candidate count
      growing as ``n²·blocks·width/2^width`` — the price of a hard
      guarantee on a 63-bit code; prefer it for audit/eval slices,
      the default for open-web dedup sweeps.
    """
    if num_blocks is None:
        num_blocks = (max_hamming // 2 + 1) if guaranteed else 4
    # Fingerprints are pinned ONCE (the triangle_counts discipline):
    # the blocked self-join + distinct + verify reference the simhash
    # column from FOUR derived frames, and without the checkpoint each
    # consumer re-evaluates the full 63-lane vote tree over every
    # doc's shingles — measured 238 s -> 3.5 s at sf0.1 (5k docs) for
    # the registered max_hamming=12 portable query.
    sims = simhash64(
        df, id_col=id_col, text_col=text_col, arrow=arrow, portable=portable
    ).localCheckpoint(eager=True)
    width = 63 // num_blocks + 1
    block_key = F.transform(
        F.sequence(F.lit(0), F.lit(num_blocks - 1)),
        lambda blk: F.struct(
            blk.alias("block"),
            # extract block bits via getbit (ANSI-safe)
            F.transform(
                F.sequence(blk * width, F.least(blk * width + width - 1, F.lit(62))),
                lambda i: F.getbit("simhash", i),
            ).alias("key"),
        ),
    )
    blocked = sims.select(
        id_col, "simhash", F.explode(block_key).alias("bb")
    ).select(id_col, "simhash", "bb.block", "bb.key")
    b = blocked.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "block", "key"
    )
    if guaranteed:
        # probe side additionally emits every 1-bit flip of each
        # block key: a block with ≤1 differing bit still collides
        variants = F.concat(
            F.array(F.col("key")),
            F.transform(
                F.sequence(F.lit(0), F.size("key") - 1),
                lambda j: F.transform(
                    F.col("key"), lambda bit, idx: F.when(idx == j, 1 - bit).otherwise(bit)
                ),
            ),
        )
        a = blocked.select(
            F.col(id_col).alias("doc_a"),
            F.col("simhash").alias("sim_a"),
            "block",
            F.explode(variants).alias("key"),
        )
    else:
        a = blocked.select(
            F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "block", "key"
        )
    cand = (
        a.join(b, ["block", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
    # the <= comparison is wrapped null-tolerantly (coalesce) ON
    # PURPOSE: a bare null-intolerant predicate lets Catalyst infer
    # IsNotNull(sim_a)/IsNotNull(sim_b) constraints and push them
    # through the join to both scans — where `simhash` is an alias
    # of the whole fingerprint expression, so each scan would
    # RECOMPUTE the full SimHash as a null check (measured 2.3×
    # wall-clock on this operator). simhash is provably non-null
    # (aggregate with non-null init), so the constraint is pure
    # waste; coalesce blocks the inference.
    within = F.coalesce(hamming <= F.lit(max_hamming), F.lit(False))
    return (
        cand.filter(within)
        .withColumn("hamming", hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate GROUPS: each node
    labeled with the min id reachable from it (its component).

    Iterative min-label propagation over the undirected edge list —
    the step LSH pipelines need between "candidate pairs" and "keep
    one survivor per group" (A near B near C must collapse to ONE
    group even though (A, C) was never a candidate pair).

    Each iteration is one join + one groupBy (label ← min of own and
    neighbors' labels) with a driver-side convergence check on the
    count of changed labels; components with diameter d converge in
    ≤ ⌈log2 d⌉+1 iterations of doubling... conservatively bounded by
    ``max_iterations`` linear rounds. Frames are localCheckpoint()ed
    per round so the lineage (and its re-execution cost) stays flat
    — the standard Spark iterative-algorithm pattern.

    Returns (node, component) for every node appearing in ``pairs``.
    Not SQL-expressible without recursive CTEs → rows-only oracle.
    """
    # materialize the pair feed ONCE before mirroring: the union
    # below scans ``pairs`` twice, and for expensive feeds (exact
    # Jaccard via shingle self-join or prefix filtering) re-deriving
    # the pair pipeline per branch doubles the dominant cost
    # (measured ~2x at sf0.1). The pair list itself is tiny —
    # bounded by the number of duplicated docs, not the corpus.
    pairs = pairs.select(
        F.col(a_col).alias(a_col), F.col(b_col).alias(b_col)
    ).localCheckpoint()

    # Bounded-metadata fast path (the operators/spatial.py DBSCAN
    # pattern): when the PAIR LIST fits the driver budget, a
    # union-find replaces ~diameter rounds of join + checkpoint +
    # count actions (each a full Spark job) with one collect — at
    # sf0.1 that's ~3 s of per-round overhead for a 256-pair input.
    # Beyond the bound the distributed min-label loop below takes
    # over. Both produce the identical min-id labeling.
    if pairs.count() <= 200_000:
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            ra, rb = find(r[a_col]), find(r[b_col])
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        spark = pairs.sparkSession
        node_type = pairs.schema[a_col].dataType
        schema = StructType(
            [
                StructField("node", node_type, False),
                StructField("component", node_type, False),
            ]
        )
        rows = [(n, find(n)) for n in parent]
        return local_frame(spark, rows, schema)

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    edges = edges.localCheckpoint()
    labels = labels.localCheckpoint()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("_nbr"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("_nbr"), F.col("component")) < F.col("component")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    return labels


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Drop every near-duplicate except the min-id member of each
    connected component; singletons (no pair) pass through."""
    comps = connected_components(pairs, a_col=a_col, b_col=b_col)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    *,
    quality_col: str,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Quality-aware duplicate resolution: within each near-duplicate
    connected component keep the HIGHEST-``quality_col`` member
    (ties → min id), not the arbitrary min-id member — the survivor
    rule real training pipelines want, since near-dup clusters mix
    clean originals with mangled scrapes and :func:`dedup_survivors`
    would keep whichever has the smaller id.

    Plan: components (iterative min-label propagation, O(edges) per
    round) → per-component ``row_number`` over (quality desc, id) —
    one hash exchange of the component table, which is bounded by
    the number of DUPLICATED docs, not the corpus → anti-join the
    losers back. Singletons (no pair) pass through untouched.
    """
    comps = connected_components(pairs, a_col=a_col, b_col=b_col)
    scored = comps.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col).alias("_q")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(F.desc("_q"), F.asc("node"))
    losers = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def edit_distance_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
    block_cols: Sequence[str] = ("lang",),
    max_len_diff: int = 10,
    max_dist: int = 25,
) -> DataFrame:
    """Near-duplicate pairs by Levenshtein distance, length-banded:
    ``|len(a) - len(b)| <= max_len_diff`` implies
    ``lev(a, b) >= |len(a)-len(b)|``, so banding on length is a
    LOSSLESS block for the distance filter — unlike MinHash/SimHash
    this modality has no false negatives inside the length window.

    Plan shape mirrors :func:`~...operators.temporal.range_join`:
    the a-side explodes onto the length bands its window overlaps
    (width = ``max_len_diff`` → ≤ 3 copies), the join is a hash
    equi-join on (block, band), and ``levenshtein`` runs with its
    threshold argument (early-exit row-pruning, JVM-side) only on
    band collisions — never corpus². ``id_a < id_b`` emits each
    unordered pair exactly once (the mirrored collision fails the
    ordering filter).
    """
    band = max(max_len_diff, 1)
    blocks = list(block_cols)
    a_bands = F.sequence(
        F.floor((F.col(len_col) - max_len_diff) / band),
        F.floor((F.col(len_col) + max_len_diff) / band),
    )
    a = docs.select(
        *blocks,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_txt_a"),
        F.col(len_col).alias("_len_a"),
        F.explode(a_bands).alias("_band"),
    )
    b = docs.select(
        *blocks,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_txt_b"),
        F.col(len_col).alias("_len_b"),
        F.floor(F.col(len_col) / band).alias("_band"),
    )
    dist = F.levenshtein(F.col("_txt_a"), F.col("_txt_b"), max_dist)
    return (
        a.join(b, blocks + ["_band"], "inner")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_len_a") - F.col("_len_b")) <= max_len_diff)
        )
        .withColumn("edit_dist", dist.cast("long"))
        .filter(F.col("edit_dist") >= 0)
        .select(*blocks, "id_a", "id_b", "edit_dist")
    )


def paragraph_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    chunk_tokens: int | None = None,
    out_text: str = "dedup_text",
) -> DataFrame:
    """Corpus-global paragraph-level exact dedup (the C4/CCNet move:
    drop every repeated paragraph, keep its first occurrence, then
    stitch each document back together from its surviving
    paragraphs).

    Paragraph = ``sep``-delimited span, or — for single-line corpora
    — a fixed window of ``chunk_tokens`` whitespace tokens (exactly
    one of the two must be given).

    Scale shape: posexplode → **min-struct aggregate keyed on the
    paragraph** (partial/map-side combinable, so a paragraph repeated
    a million times still ships one row per map task — deliberately
    NOT a `row_number` window, which would sort every copy of a hot
    paragraph in one task) → hash join back on the paragraph → one
    shuffle by doc to re-assemble in position order. First occurrence
    is the lexicographically least ``(doc_id, pos)``, so the result
    is deterministic under any row order. At 100 TB, swap the join
    key from paragraph text to ``xxhash64(paragraph)`` to shrink
    shuffle volume; the text key keeps this oracle-comparable.
    """
    if (sep is None) == (chunk_tokens is None):
        raise ValueError("exactly one of sep / chunk_tokens is required")
    if sep is not None:
        paras = F.split(F.col(text_col), sep)
    else:
        toks = F.split(F.col(text_col), " ")
        n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
        paras = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
            ),
        )

    totals = docs.select(F.col(id_col), F.size(paras).cast("long").alias("total_paras"))
    exploded = docs.select(F.col(id_col), F.posexplode(paras).alias("pos", "para"))
    first_seen = exploded.groupBy("para").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    kept = (
        exploded.join(first_seen, "para")
        .filter(
            (F.col("_first")[id_col] == F.col(id_col))
            & (F.col("_first.pos") == F.col("pos"))
        )
        .drop("_first")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_paras"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias(out_text),
    )
    # docs whose every paragraph was seen earlier still get a row
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "total_paras",
        F.coalesce("kept_paras", F.lit(0)).alias("kept_paras"),
        F.coalesce(out_text, F.lit("")).alias(out_text),
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    k: int | None = 20,
) -> DataFrame:
    """Corpus-internal duplicated-span mining (the diagnosis step of
    substring dedup, Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better"): every ``n``-token span that
    occurs in ≥ ``min_docs`` distinct documents, with its document
    frequency and first host doc.

    Within-doc repeats are collapsed *before* the explode
    (``array_distinct``, a per-row property — PERF.md rule), so the
    shuffled relation has one row per (doc, distinct-span) and the
    aggregate needs plain ``count(*)``, never a count-distinct
    Expand. Top-k compiles to TakeOrderedAndProject; pass ``k=None``
    for the full table (the input to an actual span-removal pass).
    """
    sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("span"),
    )
    dup = (
        sh.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    if k is None:
        return dup
    return dup.orderBy(F.desc("n_docs"), F.asc("span")).limit(k)


def containment_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs — the asymmetric complement of
    :func:`ngram_jaccard_pairs`: ``containment(A→B) = |A∩B| / |A|``
    over distinct shingle sets. A short document quoted inside a long
    one scores near 1.0 here while its Jaccard stays tiny — the
    quote/subset-detection signal (Broder's containment, the basis of
    suffix-style dedup policies that Jaccard thresholds miss).

    Emits BOTH directions per intersecting pair (containment is not
    symmetric): (doc_src, doc_dst, containment = |src∩dst|/|src|).
    Same plan as the Jaccard variant — shingle self-join for
    intersections (map-side combinable), one groupBy for set sizes,
    optional stop-shingle pruning via ``max_doc_freq``.
    """
    sh = shingle_table(df, id_col, text_col, n)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(freq.filter(F.col("_df") <= max_doc_freq).select("shingle"), "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("doc_src"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_dst"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_src") != F.col("doc_dst"))
        .groupBy("doc_src", "doc_dst")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ssrc = sizes.select(F.col(id_col).alias("doc_src"), F.col("n_shingles").alias("n_src"))
    return (
        inter.join(ssrc, "doc_src")
        .withColumn("containment", F.col("inter").cast("double") / F.col("n_src"))
        .filter(F.col("containment") >= threshold)
        .select("doc_src", "doc_dst", F.round("containment", 6).alias("containment"))
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard pairs above ``threshold`` via PREFIX FILTERING
    (the AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08) — a LOSSLESS alternative to both the all-shingle self-join
    (:func:`ngram_jaccard_pairs`) and approximate MinHash-LSH.

    Order every document's shingles by global document frequency,
    rarest first (ties broken by shingle — one deterministic total
    order corpus-wide). If ``J(A,B) >= t``, the intersection has
    ``c >= ceil(t*|A|)`` elements, so the SMALLEST intersection
    element has rank ``<= |A| - c + 1 <= floor((1-t)*|A|) + 1`` in
    BOTH documents — two similar sets must collide within their
    prefixes of that length. Candidates therefore come from an
    equi-join of PREFIXES only: the join stream carries
    ``~(1-t)`` of each document's shingles, and those are the
    RAREST shingles, so the per-key fan-out of the self-join — the
    quadratic term that kills the naive approach at 100 TB — is
    driven by the frequency floor, not by boilerplate mega-shingles.
    A length filter (``t·|A| <= |B| <= |A|/t``) prunes further, and
    the exact intersection count over the surviving candidate pairs
    removes all false positives.

    Both prefix-length and length-filter comparisons carry a +1e-9
    slack on the KEEP side: a float rounding error may only ever
    lengthen a prefix or admit an extra candidate (harmless — the
    verify stage rejects it), never silently drop a true pair.

    ``materialize=True`` (default) localCheckpoints the shingle
    table: it feeds both the frequency aggregate and the id-mapped
    per-doc arrays, and at scale materializing the shingle index once
    — standard practice in dedup pipelines — beats recomputing the
    explode (measured 14.4 s → 5.0 s at sf0.1). Set sizes ride the
    prefix rows as ``_sz`` and travel WITH each candidate pair, so
    the final Jaccard needs no standalone size aggregation and no
    rendezvous joins (round-6: two joins + one groupBy deleted).

    Two round-9 shuffle-byte cuts (guide §2.3 "narrower types" /
    "shuffle keys and metadata instead of payloads"):

    * every shingle string is DICTIONARY-ENCODED to an integer id —
      an EXACT bijection pinned on the (already needed) frequency
      table, so the candidate join keys and the verification both
      move 8-byte longs instead of ~25-byte strings;
    * verification ships each candidate pair ONE ROW carrying both
      docs' shingle-id ARRAYS (``size(array_intersect(...))`` —
      exact set semantics, shingles are distinct per doc) instead of
      exploding pair × |A| shingle rows through a second equi-join —
      the explode was the dominant stage (measured 5.7 s of a 10 s
      pipeline at sf0.1: 310k candidates × ~52 shingles each).

    Round-9 second pass (guide §2.4 "remove shuffles outright"): the
    whole pipeline now derives from ONE pinned per-doc table. The
    previous shape ranked prefixes with a window over the shingle
    stream and collected verification arrays with a separate
    aggregate, and the physical plan duplicated BOTH subtrees (once
    per self-join side, once per verification side — no exchange
    reuse across the four). Building the (_df asc, _sid asc)-sorted
    id array per doc in a single aggregate and SLICING the prefix out
    of it (the prefix is by definition the first
    ``floor((1-t)·|A|)+1`` elements of that order) removes the two
    window passes, the dictionary's separate checkpoint (every
    consumer now reads ids through the one pinned array table, so
    one evaluation of ``monotonically_increasing_id`` is shared by
    construction), and all four duplicated subtrees: 8 exchanges →
    4, 4 jobs → 3 (measured ~5.7 s → ~3.9 s solo at sf0.1 on the
    consumer family). Pair output is bit-identical: same total
    order, same prefix length, same exact verification.
    """
    sh = shingle_table(df, id_col, text_col, n)
    if materialize:
        sh = sh.localCheckpoint()
    # frequency-then-id total order. The id map needs NO separate pin:
    # the only thing correctness needs is that every consumer sees ONE
    # consistent assignment, and every consumer below reads ids out of
    # the single pinned ``arrs`` table — prefix filtering is lossless
    # under ANY fixed corpus-wide total order (the pigeonhole proof
    # never uses what the order is; frequency-asc is a candidate-count
    # heuristic, kept as the major key), and the verification
    # intersect is exact under any bijection.
    sid = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn("_sid", F.monotonically_increasing_id())
    )
    ish = sh.join(sid, "shingle").select(id_col, "_sid", "_df")
    # ONE per-doc aggregate builds the (_df asc, _sid asc)-ordered id
    # array; prefix slice, candidate join, and exact verification all
    # derive from this pinned table (pinning is load-bearing for id
    # consistency, not just for reuse — see above).
    arrs = (
        ish.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("_df", "_sid"))).alias("_ps"))
        .select(
            id_col,
            F.col("_ps._sid").alias("_sha"),
            F.size("_ps").alias("_sz"),
        )
        .localCheckpoint()
    )
    plen = (F.floor((1.0 - threshold) * F.col("_sz") + 1e-9) + 1).cast("int")
    pref = arrs.select(
        id_col,
        F.col("_sz"),
        F.explode(F.slice("_sha", F.lit(1), plen)).alias("_sid"),
    )
    a = pref.select(
        F.col(id_col).alias("doc_a"), "_sid", F.col("_sz").alias("na")
    )
    b = pref.select(
        F.col(id_col).alias("doc_b"), "_sid", F.col("_sz").alias("nb")
    )
    # sizes travel WITH the candidate pair from here on — the final
    # Jaccard needs no rendezvous with a separate sizes table
    cand = (
        a.join(b, "_sid")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("na") * threshold <= F.col("nb") + 1e-9)
            & (F.col("nb") * threshold <= F.col("na") + 1e-9)
        )
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    inter = (
        cand.join(
            arrs.select(F.col(id_col).alias("doc_a"), F.col("_sha").alias("_aa")),
            "doc_a",
        )
        .join(
            arrs.select(F.col(id_col).alias("doc_b"), F.col("_sha").alias("_ab")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.size(F.array_intersect("_aa", "_ab")).alias("inter"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )

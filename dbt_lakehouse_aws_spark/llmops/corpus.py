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


def importance_weights(
    docs: DataFrame,
    *,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of a *target* unigram
    distribution vs. the *raw* corpus distribution, both estimated
    over hashed token buckets so the feature space is fixed-width no
    matter the vocabulary.

    ``llr(doc) = Σ_tokens ln p_target(bucket(tok)) − ln p_raw(bucket(tok))``

    with add-one smoothing per bucket. Buckets use the portable
    polynomial hash (mod ``n_buckets``) so a DuckDB oracle computes
    bit-equal scores.

    Plan: one explode → per-bucket counts for raw and target (two
    partial-agg branches over the same exploded relation, each
    shuffling ``n_buckets`` rows) → both collapsed into ``n_buckets``
    log-ratio rows, broadcast → per-doc sum (shuffle O(docs)).
    Nothing is ever keyed on the token string, so vocabulary skew
    ("the" = billions of rows) lands evenly across ``n_buckets``
    partitions at 100 TB.
    """
    from dbt_lakehouse_aws_spark.llmops.text import poly_hash, tokens_col

    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).withColumn("bucket", F.pmod(poly_hash(F.col("tok")), F.lit(n_buckets)))

    # collapse to per-doc bucket counts FIRST: every downstream agg
    # and join then works on ≤ docs·n_buckets rows, the token stream
    # (and its per-char hash fold) is scanned exactly once, and the
    # partial agg combines map-side.
    doc_buckets = toks.groupBy(id_col, "_is_target", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    counts = doc_buckets.groupBy("bucket").agg(
        F.sum("cnt").alias("raw_n"),
        F.sum(F.when(F.col("_is_target"), F.col("cnt")).otherwise(0)).alias("tgt_n"),
    )
    tot = counts.agg(
        F.sum("raw_n").alias("raw_tot"), F.sum("tgt_n").alias("tgt_tot")
    )
    ratios = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("tgt_n") + 1).cast("double") / (F.col("tgt_tot") + n_buckets))
            - F.log((F.col("raw_n") + 1).cast("double") / (F.col("raw_tot") + n_buckets))
        ).alias("log_ratio"),
    )
    return (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias("llr"))
    )


def importance_resample(
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    llr_col: str = "llr",
    temperature: float = 1.0,
) -> DataFrame:
    """Deterministic importance resampling over :func:`importance_weights`
    output: keep each doc with probability ``sigmoid(llr/T)``, decided
    by the portable id hash (same Gumbel-free trick as
    :func:`deterministic_sample` — rerun-stable, no rand())."""
    keep_p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(llr_col) / F.lit(temperature)))
    u = portable_hash(F.col(id_col)).cast("double") / F.lit(float(MERSENNE31))
    return weights.filter(u < keep_p)


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): key = u^(1/w) with u the portable id
    hash mapped into (0, 1]; the k largest keys are the sample.

    One pass, no state: the top-k compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of k rows), so a 100 TB corpus
    never sorts globally. Inclusion probability is proportional to
    weight (heavier docs are exponentially more likely to draw a
    large key), and membership is rerun-stable because u is a hash,
    not rand().
    """
    u = (portable_hash(F.col(id_col)) + 1).cast("double") / F.lit(float(MERSENNE31))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_key", F.round(key, 12))
        .orderBy(F.desc("_es_key"), F.asc(id_col))
        .limit(k)
    )


def group_split(
    df: DataFrame,
    *,
    group_col: str,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a pure
    function of the GROUP key (site, author, source document), so
    every row of a group lands in the same split — near-duplicate or
    derived rows can never straddle the train/eval boundary, the
    standard contamination guard for model training corpora.

    The group hash is the portable 60-bit md5 prefix (shared with
    dedup's oracle mode) scaled to [0, 1) and cut at the cumulative
    split weights — deterministic across runs, engines, partition
    layouts, and cluster sizes, and replayable by an external SQL
    engine for audit. Plans as one codegen'd projection: no shuffle,
    no join, no state; adding the column to 100 TB costs one scan.

    ``salt`` versions the assignment: changing it reshuffles every
    group (e.g. for a fresh fold), keeping it pins membership forever.
    """
    weights = [w for _, w in splits]
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {sum(weights)}")
    from dbt_lakehouse_aws_spark.llmops.dedup import _portable_hash60

    u = _portable_hash60(
        F.concat(F.lit(salt + ":"), F.col(group_col).cast("string"))
    ).cast("double") / float(1 << 60)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def temperature_mix(
    df: DataFrame,
    *,
    stratum_col: str,
    id_col: str,
    alpha: float = 0.7,
    budget_rows: int = 100_000,
) -> DataFrame:
    """Temperature-scaled corpus mixing (the multilingual-LM α-sampling
    recipe, mT5/XLM-R): stratum ``l`` holding share ``p_l`` of the
    corpus is sampled with probability ``∝ p_l^α``, flattening the
    head languages and boosting the tail, scaled so the EXPECTED kept
    rows equal ``budget_rows``. Rates clamp at 1 — no upsampling; a
    tail stratum whose boost exceeds 1 contributes all its rows and
    the realized total undershoots accordingly (documented, exact).

    Plan: one tiny per-stratum count aggregate, rate arithmetic on
    that |strata|-row frame (window-summed normalizer), a broadcast
    join of the rates, and the same Knuth-hash Bernoulli filter as
    :func:`deterministic_sample` — deterministic across runs,
    engines, and partition layouts. Rates are rounded to 12 dp before
    the hash comparison so cross-engine double summation-order noise
    in the normalizer cannot flip a boundary row.
    """
    n_str = F.col(stratum_col)
    counts = df.groupBy(n_str.alias("_s")).agg(F.count(F.lit(1)).alias("_c"))
    # normalizers via scalar aggregates + 1-row broadcast cross joins
    # (the J5 pattern) — an unpartitioned window here would plan a
    # SinglePartition funnel the plan linter rightly rejects, even
    # though this frame is only |strata| rows
    total_c = counts.agg(F.sum("_c").alias("_n"))
    with_q = counts.crossJoin(F.broadcast(total_c)).withColumn(
        "_q", F.pow(F.col("_c").cast("double") / F.col("_n"), float(alpha))
    )
    total_q = with_q.agg(F.sum("_q").alias("_z"))
    rates = with_q.crossJoin(F.broadcast(total_q)).withColumn(
        "keep_rate",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget_rows))
                * F.col("_q")
                / (F.col("_z") * F.col("_c").cast("double")),
            ),
            12,
        ),
    )
    joined = df.join(
        F.broadcast(rates.select(F.col("_s").alias(stratum_col), "keep_rate")),
        stratum_col,
    )
    return joined.filter(
        portable_hash(F.col(id_col)).cast("double")
        < F.col("keep_rate") * F.lit(float(MERSENNE31))
    ).drop("keep_rate")


def shard_assignment(
    df: DataFrame, *, id_col: str, n_shards: int, out: str = "shard"
) -> DataFrame:
    """Deterministic shard id in [0, n_shards) from the portable row
    hash — stable across runs, engines, and partition layouts, so a
    re-export after a crash produces byte-identical shard membership
    (the property downstream training-resume logic depends on)."""
    return df.withColumn(
        out, F.pmod(portable_hash(F.col(id_col)), F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    df: DataFrame, *, id_col: str, n_shards: int, digest_cols: Sequence[str]
) -> DataFrame:
    """Per-shard (n_rows, content digest) manifest — the audit object
    a shard export ships with: a reader re-derives the digest from
    the files it received and any mismatch pinpoints WHICH shard is
    short or corrupt without comparing rows. Digest = Σ row-hash mod
    2^61-1 per shard (same construction as
    operators/relational.py::table_digest, grouped), so it is
    order-insensitive and partition-layout-independent."""
    from dbt_lakehouse_aws_spark.llmops.dedup import _portable_hash60

    assigned = shard_assignment(df, id_col=id_col, n_shards=n_shards)
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in digest_cols
    ]
    h = _portable_hash60(F.concat_ws("\x1f", *parts))
    m = (1 << 61) - 1
    return (
        assigned.withColumn("_h", h)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(F.sum(F.col("_h").cast("decimal(38,0)")), F.lit(m))
            .cast("long")
            .alias("digest"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    digest_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Export the corpus as ``n_shards`` hash-assigned parquet shard
    directories (``shard=K/``) plus a ``_manifest`` parquet of
    per-shard row counts and content digests. Returns the manifest.

    The write is one ``partitionBy(shard)`` parquet job — Spark lays
    each shard down in parallel — and the manifest is computed from
    the SOURCE frame with the same deterministic assignment, so a
    verifier can recompute digests from the landed files and match
    them 1:1 (test does exactly that round trip).
    """
    cols = list(digest_cols) if digest_cols is not None else [id_col]
    assigned = shard_assignment(df, id_col=id_col, n_shards=n_shards)
    assigned.write.mode("overwrite").partitionBy("shard").parquet(path)
    manifest = shard_manifest(
        df, id_col=id_col, n_shards=n_shards, digest_cols=cols
    )
    manifest.write.mode("overwrite").parquet(path.rstrip("/") + "_manifest")
    return manifest


def contamination_check(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with an evaluation/benchmark corpus — the standard
    pre-training hygiene gate (GPT-3 used 13-grams; ``n`` scales to
    the corpus at hand). Output per contaminated training doc:
    distinct benchmark-overlapping grams (``hit_grams``), the doc's
    distinct gram count (``total_grams``), and their ratio
    (``contamination``).

    Scale shape: the benchmark side is a small constant (eval suites
    are MBs, the corpus is TBs), so its DISTINCT gram set is
    broadcast — the training side is ONE map-side hash-join pass plus
    a groupBy on ``id_col``; the 100 TB corpus is never shuffled on
    gram. Per-doc gram sets are deduped with ``array_distinct``
    BEFORE the explode, so the join input is already minimal.
    """
    from .text import word_shingles

    grams = F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g")
    tg = train.select(F.col(id_col), grams)
    bg = bench.select(grams).distinct()
    sizes = tg.groupBy(id_col).agg(F.count(F.lit(1)).alias("total_grams"))
    hits = (
        tg.join(F.broadcast(bg), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hit_grams"))
    )
    return hits.join(sizes, id_col).select(
        F.col(id_col),
        F.col("hit_grams").cast("long").alias("hit_grams"),
        F.col("total_grams").cast("long").alias("total_grams"),
        F.round(F.col("hit_grams") / F.col("total_grams"), 6).alias(
            "contamination"
        ),
    )


def chunk_overlap(
    df: DataFrame,
    *,
    text_col: str = "text",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Overlapping fixed-window chunking — the RAG/embedding-prep
    sibling of :func:`pack_sequences` (that op concatenates docs
    into budget cuts; this one splits each doc into ``size``-char
    windows every ``stride`` chars, ``size - stride`` overlap, so
    retrieval context never dies at a hard boundary). Appends
    ``chunk_ix`` (0-based), ``chunk_text``, ``chunk_len``; every
    other input column is carried through.

    Pure codegen: ``posexplode(sequence(...))`` + ``substring`` —
    no Python, fan-out exactly ``ceil(max(len,1) / stride)`` rows
    per doc, and the explode happens AFTER any pushed-down doc
    filter, so chunk volume tracks the selected corpus, not the
    table. An empty/null text yields one empty chunk (the row
    survives; dropping it silently would break doc-count audits).

    Chunk count is ``(greatest(len,1)-1) div stride + 1`` — the
    ``greatest`` guard keeps len = 0 out of negative floor-division,
    where Spark's ``div`` (truncates toward zero) and SQL floor
    division (floors) disagree.
    """
    if not 0 < stride <= size:
        raise ValueError(f"need 0 < stride <= size, got {stride}/{size}")
    n_chunks = F.expr(
        f"(greatest(length(coalesce({text_col}, '')), 1) - 1)"
        f" div {stride} + 1"
    )
    exploded = df.select(
        "*",
        F.posexplode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_ix", "_drop"
        ),
    ).drop("_drop")
    chunk = F.expr(
        f"substring(coalesce({text_col}, ''), chunk_ix * {stride} + 1, {size})"
    )
    return exploded.withColumn("chunk_text", chunk).withColumn(
        "chunk_len", F.length("chunk_text").cast("long")
    )


#: content-defined chunking parameters: 8-char window, fixed-coefficient
#: polynomial hash with base 257 reduced mod 1000003, boundary when
#: h % 64 == 0 (expected chunk ~64 chars). Shared by the Arrow engine
#: path and the SQL replay oracle.
CDC_WINDOW = 8
CDC_BASE = 257
CDC_MOD = 1_000_003
CDC_DIV = 64


def cdc_chunks(
    df: DataFrame,
    *,
    id_cols: Sequence[str],
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking — dedup's answer to the INSERTION
    problem that fixed-window chunking (:func:`chunk_overlap`) can't
    solve: one added word shifts every downstream fixed boundary,
    but CDC boundaries depend only on the LOCAL 8-char window hash,
    so all chunks after the edit re-align and re-deduplicate. A
    boundary closes after position ``i`` whenever the window hash
    ``Σ c[i-7+k]·(B^(7-k) mod P) mod P ≡ 0 (mod D)``; the final
    chunk always closes at the text end. Returns one row per chunk:
    ``id_cols + (chunk_ix, chunk_len)``.

    The per-char scan can't be a relational expression at scale
    (per-char explode multiplies the corpus ~1000×), so this is the
    Arrow escape hatch done right: ``mapInPandas`` with the hash as
    ONE numpy ``correlate`` per document (no Python per-char loop),
    boundaries by vectorized masking — O(n) per partition, zero
    shuffle, executor-local. The oracle replays the identical
    arithmetic relationally at test scale (8 unicode(substr) terms
    per position), pinning the vectorized path against set-based
    ground truth.
    """
    import numpy as np
    import pandas as pd

    kernel = np.array(
        [pow(CDC_BASE, CDC_WINDOW - 1 - k, CDC_MOD) for k in range(CDC_WINDOW)],
        dtype=np.int64,
    )
    ids = list(id_cols)

    def scan(batches):
        for pdf in batches:
            out_ids: dict[str, list] = {c: [] for c in ids}
            ixs: list[int] = []
            lens: list[int] = []
            for row in pdf.itertuples(index=False):
                text = getattr(row, text_col) or ""
                n = len(text)
                codes = np.frombuffer(
                    text.encode("utf-8", "surrogatepass"), dtype=np.uint8
                ).astype(np.int64)
                if len(codes) != n:
                    # non-ASCII: fall back to exact code points
                    codes = np.fromiter(
                        (ord(ch) for ch in text), dtype=np.int64, count=n
                    )
                if n >= CDC_WINDOW:
                    h = np.correlate(codes, kernel, mode="valid") % CDC_MOD
                    # h[j] covers chars j..j+7 (0-based), i.e. closes
                    # AFTER 1-based position j+8
                    ends = np.flatnonzero(h % CDC_DIV == 0) + CDC_WINDOW
                else:
                    ends = np.empty(0, dtype=np.int64)
                if n == 0:
                    bounds = [0]
                elif len(ends) == 0 or ends[-1] != n:
                    bounds = list(ends) + [n]
                else:
                    bounds = list(ends)
                prev = 0
                for ix, e in enumerate(bounds):
                    for c in ids:
                        out_ids[c].append(getattr(row, c))
                    ixs.append(ix)
                    lens.append(int(e) - prev)
                    prev = int(e)
            yield pd.DataFrame({**out_ids, "chunk_ix": ixs, "chunk_len": lens})

    id_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in ids
    )
    return df.select(*ids, text_col).mapInPandas(
        scan, schema=f"{id_schema}, chunk_ix long, chunk_len long"
    )

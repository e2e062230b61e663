"""Text-analysis operators for training-data pipelines.

All expressions are built-in Catalyst column functions (JVM-side,
whole-stage codegen) — no Python UDFs in the hot path. Each operator
is embarrassingly parallel over rows: no shuffle, so throughput
scales linearly with executors at 100 TB.

Where a cross-engine oracle must reproduce a hash, we use a
*portable polynomial hash* (ascii × 31^(i mod 8) over characters)
rather than xxhash64 — both Spark and DuckDB can evaluate it with
identical integer semantics.
"""

from __future__ import annotations

import pandas as pd
from dbt_lakehouse_aws_spark.localframe import local_frame
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 31^0 .. 31^7 — multiplier cycle for the portable polynomial hash.
POLY_MULTIPLIERS = [31**i for i in range(8)]

#: tiny per-language stopword marker lists for the n-gram/stopword
#: language-ID heuristic (expressible identically in ANSI SQL).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "und", "die"],
    "zh": ["de", "shi", "le"],
}


def tokens_col(text: str | Column = "text") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(t, " ")


def word_shingles(text: str | Column = "text", n: int = 3) -> Column:
    """Array of n-word shingles (space-joined), for Jaccard/MinHash.

    Pure array expressions: ``transform(sequence(1, #tokens-n+1),
    i -> concat_ws(' ', slice(tokens, i, n)))`` — evaluated inside
    codegen, no explode until the caller asks for one.
    """
    toks = tokens_col(text)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array())


def poly_hash(text: str | Column = "text") -> Column:
    """Portable 64-bit polynomial fingerprint of a string.

    ``sum(ascii(char_i) * 31^((i-1) mod 8))`` over 1-based char
    positions. Bounded: 553-char docs × 128 × 31^7 < 2^63, so the
    arithmetic never overflows int64 and DuckDB computes the exact
    same value (rolling-hash-style document fingerprinting).
    """
    t = F.col(text) if isinstance(text, str) else text
    mults = F.array(*[F.lit(m).cast("long") for m in POLY_MULTIPLIERS])
    # NB: sequence(1, 0) is DESCENDING [1, 0], not empty — the empty
    # string must be special-cased or the fold visits bogus positions.
    return F.when(F.length(t) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.length(t)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.ascii(F.substring(t, i, F.lit(1))).cast("long")
            * F.element_at(mults, ((i - F.lit(1)) % 8) + 1),
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    return df.withColumn(out, poly_hash(text_col))


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: token count, char stats, ratios.

    Mirrors the usual pretraining-corpus filters (length, symbol
    ratio, stopword density) with engine-portable expressions.
    """
    t = F.col(text_col)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(t, r"[^a-z]", ""))
    stop_hits = F.regexp_count(F.concat(F.lit(" "), t, F.lit(" ")), F.lit(r" (the|a|and|of) "))
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars_obs": F.length(t),
            "avg_token_len": F.round(
                F.length(F.regexp_replace(t, r" ", "")).cast("double") / n_tokens, 6
            ),
            "alpha_ratio": F.round(alpha_chars.cast("double") / F.length(t), 6),
            "stopword_ratio": F.round(stop_hits.cast("double") / n_tokens, 6),
        }
    )


def lang_id_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic.

    One ``regexp_count`` per language over the padded text; argmax
    with a fixed priority order for ties. Deterministic, portable,
    vectorized. (The real-world version would use char-n-gram
    profiles; the operator shape — score columns + argmax case — is
    identical.)
    """
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    out = df
    for lang, words in LANG_MARKERS.items():
        pat = " (" + "|".join(words) + ") "
        out = out.withColumn(f"score_{lang}", F.regexp_count(padded, F.lit(pat)))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = None
    for lang in langs:  # fixed priority order breaks ties
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return out.withColumn("pred_lang", pred)


def fast_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Scale-path document fingerprint: one ``xxhash64`` per doc —
    a single codegen'd JVM hash call, vs :func:`poly_hash`'s
    per-character fold (which exists for cross-engine oracle
    portability, not speed). Use this one in production dedup keys.
    """
    return df.withColumn(out, F.xxhash64(F.col(text_col)))


def bigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean log-likelihood
    under a bigram LM trained on the corpus itself.

    ``score(d) = avg over positions i≥2 of ln( c(w_{i-1} w_i) /
    c(w_{i-1} ·) )`` with counts from the whole input. Every scored
    bigram occurs in the training counts (the corpus scores itself),
    so no smoothing is needed and the result is exactly reproducible
    by any SQL engine — fluent/repetitive documents score high,
    out-of-distribution word salad scores low. This is the
    distributed shape of the KenLM-style quality gate in web-corpus
    pipelines (CCNet/Gopher); swapping in a pretrained external LM
    only changes the model side of the join.

    Plan: bigrams come from ``arrays_zip`` of two array slices
    (codegen, no UDF) and explode map-side; "training" is two hash
    aggregates over (w1, w2) — O(vocab²) rows, partial-agg combined;
    scoring re-joins the exploded bigrams to the model. The model
    side's size is vocabulary-dependent (tiny for narrow domains,
    billions of bigram types at web scale), so the default leaves
    the join strategy to AQE, which broadcasts small models from
    runtime stats and shuffle-joins big ones — measured
    equal-or-faster than a forced broadcast at BOTH a 30-word and a
    20 000-word vocabulary (forcing the broadcast of an ~8M-row
    model cost +45% at 200k docs). ``broadcast_model=True`` remains
    as an explicit hint for models known to be small.
    """
    toks = tokens_col(text_col)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    big = df.select(id_col, F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    model = c2.join(c1, "w1").withColumn("_lp", F.log(F.col("_c2") / F.col("_c1")))
    model = model.select("w1", "w2", "_lp")
    if broadcast_model:
        model = F.broadcast(model)
    return (
        big.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.avg("_lp"), 6).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def tfidf_topk(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k keywords per document by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``, the scikit-learn smoothing).

    Plan: one explode → (doc, term) hash count (map-side combinable)
    → term-keyed document-frequency aggregate of the *already
    collapsed* per-doc counts (shuffle O(vocab), never O(tokens)) →
    broadcast-join the tiny ``N`` scalar → per-doc top-k via a
    rank-limited window (partial ``WindowGroupLimit`` prunes to k
    rows per doc before the final shuffle). Ties break on the term
    string so results are deterministic cross-engine.
    """
    terms = docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    # dfreq is vocab-sized (the collapsed per-term doc counts), so it
    # BROADCASTS — joining it shuffle-side would re-shuffle the whole
    # (doc, term) relation on the term key, with hot-term skew
    # (measured 38 s → 6 s at 200k docs × 5k vocab).
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1).cast("double") / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "tfidf", "rnk")
    )


def unigram_entropy(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram Shannon entropy (nats) — the classic
    repetitiveness/diversity quality signal (low entropy = looping,
    boilerplate; used alongside the Gopher repetition rules).

    One explode → (doc, term) count → per-doc Σ −p·ln p (both
    aggregates map-side combinable; shuffle O(doc·distinct-terms)
    then O(docs))."""
    tf = (
        docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("tf").alias("_n"),
            F.sum(F.col("tf") * F.log(F.col("tf").cast("double"))).alias("_s"),
        )
        .select(
            id_col,
            F.col("_n").alias("n_tokens"),
            # H = ln n − (Σ tf·ln tf)/n  (algebraic form avoids a
            # second pass for p = tf/n)
            F.round(F.log(F.col("_n").cast("double")) - F.col("_s") / F.col("_n"), 6).alias(
                "entropy_nats"
            ),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi BM25 ranking of documents against a bag of query terms
    (Lucene's idf smoothing: ``ln(1 + (N − df + ½)/(df + ½))``).

    Plan: doc lengths come straight off ``size(split(text))`` (no
    explode, no shuffle); term frequencies explode but filter to the
    query terms *before* the aggregate, so the shuffled relation is
    O(matching postings), not O(tokens). The per-term idf table and
    the N/avgdl scalars are broadcast; the final top-k compiles to
    TakeOrderedAndProject. This is the exact-scoring counterpart of
    an inverted index — at 100 TB the same plan works because the
    early filter is the index lookup.
    """
    terms = [t for t in query_terms]
    dl = docs.select(F.col(id_col), F.size(tokens_col(text_col)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    tf = (
        docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "_avgdl",
    )
    per_term = (
        tf.join(dl, id_col)
        .join(F.broadcast(idf), "term")
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl")))
            ).alias("_s"),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: tuple[str, ...] = ("the", "a", "and", "of", "to"),
) -> DataFrame:
    """Gopher-style quality rule bundle (Rae et al. 2021 §A.1.1) with
    per-rule diagnostics: each rule lands as its own 0/1 column plus
    an overall ``passes_all``, so corpus curation can report WHICH
    rule rejected how many documents (the per-rule breakdown is the
    operational artifact; a bare boolean filter hides the reasons).

    Rules: word-count bounds; mean-word-length bounds; symbol-to-word
    ratio ('#' and '...'); fraction of words containing an alphabetic
    character; distinct-stopword presence. Defaults are the published
    thresholds; callers tune per corpus.

    Every expression is a built-in string/array function (split,
    replace-count trick for symbols, lambda filter for alpha words) —
    JVM codegen throughout, one pass, no UDFs, and deliberately
    portable so an external SQL engine can replay the exact flags.
    """
    t = F.col(text_col)
    w = F.split(t, " ")
    n_words = F.size(w)
    mean_wlen = F.length(F.regexp_replace(t, " ", "")).cast("double") / n_words
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    # \p{L} (any Unicode letter) rather than [a-z]: the published
    # Gopher rule is "contains at least one alphabetic character" —
    # lowercase-ASCII-only would zero out all-caps tokens and every
    # non-Latin-script document (ADVICE r3). Java and RE2 share the
    # \p{L} class, so the DuckDB oracle replays it identically.
    alpha_ratio = (
        F.size(F.filter(w, lambda x: x.rlike(r"\p{L}"))).cast("double") / n_words
    )
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    stop_hits = None
    for s in stopwords:
        hit = F.when(padded.like(f"% {s} %"), 1).otherwise(0)
        stop_hits = hit if stop_hits is None else stop_hits + hit
    flag = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    out = df.withColumns(
        {
            "r_word_count": flag((n_words >= min_words) & (n_words <= max_words)),
            "r_mean_word_len": flag(
                (mean_wlen >= min_mean_word_len) & (mean_wlen <= max_mean_word_len)
            ),
            "r_symbol_ratio": flag(symbol_ratio <= max_symbol_ratio),
            "r_alpha_words": flag(alpha_ratio >= min_alpha_word_ratio),
            "r_stopwords": flag(stop_hits >= min_stopword_hits),
        }
    )
    rules = [
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_alpha_words",
        "r_stopwords",
    ]
    passes = None
    for r in rules:
        c = F.col(r) == 1
        passes = c if passes is None else (passes & c)
    return out.withColumn("passes_all", F.when(passes, 1).otherwise(0).cast("long"))


def compression_ratio(
    df: DataFrame, text_col: str = "text", out: str = "zlib_ratio", *, level: int = 6
) -> DataFrame:
    """CCNet-style compressibility quality signal: per-doc
    ``len(zlib(text)) / len(text)`` rounded to 6 dp (NULL for empty
    or null text). Highly repetitive or boilerplate documents
    compress far below prose (~0.3 vs ~0.6), making this a cheap
    one-pass complement to the Gopher repetition rules.

    Runs as an Arrow-batched ``pandas_udf`` (stdlib zlib per row —
    no SQL-replayable form exists, so this signal is pytest-pinned
    against directly computed ratios rather than a DuckDB oracle).
    Level is DEFLATE's 1-9 knob; the default 6 matches zlib's.
    """
    import zlib

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                round(len(zlib.compress(t.encode("utf-8"), level)) / len(t.encode("utf-8")), 6)
                if t
                else None
                for t in texts
            ],
            dtype="float64",
        )

    return df.withColumn(out, _ratio(F.col(text_col)))


def kneser_ney_bigram_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the classic LM
    smoothing, and (unlike backoff tables) fully relational:

    ``P_KN(w2|w1) = max(c(w1,w2) − d, 0)/c(w1)
                    + d·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)``

    where every term is a hash aggregate over the bigram table:
    ``N1+(w1,·)`` = distinct continuations of w1 (row count of the
    count table grouped by w1), ``N1+(·,w2)`` = distinct left
    contexts (grouped by w2), ``N1+(·,·)`` = total bigram types (a
    1-row broadcast). Compared to :func:`bigram_lm_scores`'s
    unsmoothed MLE, the continuation-probability term rewards words
    that appear in MANY contexts — the signature KN behavior.

    Plan: the same arrays_zip bigram explode, three hash aggregates
    for the model, one scalar broadcast, one scoring join. O(bigram
    types) model rows, partial-agg combined; AQE picks the scoring
    join strategy. Returns (id, avg_kn_logprob, n_bigrams).
    """
    toks = tokens_col(text_col)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    big = df.select(id_col, F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("_c2").alias("_c1"), F.count(F.lit(1)).alias("_n1r")
    )
    left = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("_n1l"))
    total = c2.agg(F.count(F.lit(1)).alias("_tot"))
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("_c2") - d, F.lit(0.0)) / F.col("_c1")
        + d * F.col("_n1r") / F.col("_c1") * (F.col("_n1l") / F.col("_tot"))
    )
    model = (
        c2.join(c1, "w1")
        .join(left, "w2")
        .crossJoin(F.broadcast(total))
        .withColumn("_lp", F.log(p_kn))
        .select("w1", "w2", "_lp")
    )
    return (
        big.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.avg("_lp"), 6).alias("avg_kn_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def query_likelihood_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 2000.0,
    k: int = 20,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (the language-
    modeling IR baseline alongside :func:`bm25_topk`):

    ``score(d) = Σ_{w ∈ q} ln( (c(w,d) + μ·P(w|C)) / (|d| + μ) )``

    with ``P(w|C)`` the corpus unigram MLE. Unlike BM25, every doc
    scores against every query term (smoothing gives absent terms
    mass), so the plan LEFT-joins the per-(doc, term) counts onto
    the doc × query-term grid: doc lengths are codegen
    (``size(split(...))``), per-term corpus stats are a tiny
    broadcast (|q| rows), and the only shuffle is the (doc, term)
    count aggregate filtered to the query terms first.
    """
    toks = tokens_col(text_col)
    base = docs.select(F.col(id_col), F.explode(toks).alias("_w"))
    # corpus stats for the query terms + total token count (1 row)
    total = docs.select(F.sum(F.size(toks)).alias("_ctot"))
    cterm = (
        base.filter(F.col("_w").isin(query_terms))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cw"))
    )
    # a term with ZERO corpus frequency has P(w|C)=0, which would
    # contribute ln(0) = -inf to every document — standard LM-IR
    # practice drops such terms (they carry no ranking signal)
    qgrid = local_frame(
        docs.sparkSession, [(t,) for t in query_terms], "_w string"
    )
    cterm = qgrid.join(cterm, "_w", "left").fillna(0, ["_cw"]).filter(
        F.col("_cw") > 0
    )
    tf = (
        base.filter(F.col("_w").isin(query_terms))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dlen = docs.select(F.col(id_col), F.size(toks).alias("_dl"))
    grid = dlen.crossJoin(F.broadcast(cterm)).crossJoin(F.broadcast(total))
    scored = (
        grid.join(tf, [id_col, "_w"], "left")
        .fillna(0, ["_tf"])
        .withColumn(
            "_lp",
            F.log(
                (F.col("_tf") + F.lit(mu) * (F.col("_cw") / F.col("_ctot")))
                / (F.col("_dl") + F.lit(mu))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_lp"), 6).alias("ql_score"))
        .orderBy(F.desc("ql_score"), F.asc(id_col))
        .limit(k)
    )


def pmi_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual
    information: ``PMI(w1,w2) = ln( P(w1,w2) / (P(w1)·P(w2)) )``
    with bigram/unigram MLEs over the corpus and a count floor
    (PMI's classic low-count instability guard).

    Fully relational: one bigram explode + three hash aggregates +
    two model joins; top-k compiles to TakeOrderedAndProject."""
    toks = tokens_col(text_col)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    big = docs.select(F.explode(pairs).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    uni = docs.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("_cu")
    )
    tot2 = c2.agg(F.sum("_c2").alias("_t2"))
    totu = uni.agg(F.sum("_cu").alias("_tu"))
    pmi = F.log(
        (F.col("_c2") / F.col("_t2"))
        / ((F.col("_c1u") / F.col("_tu")) * (F.col("_c2u") / F.col("_tu")))
    )
    return (
        c2.filter(F.col("_c2") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("_cu").alias("_c1u")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("_cu").alias("_c2u")), "w2")
        .crossJoin(F.broadcast(tot2))
        .crossJoin(F.broadcast(totu))
        .select(
            "w1", "w2",
            F.col("_c2").alias("n_pair"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def skipgram_ppmi(
    docs: DataFrame,
    *,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Top-k skip-gram co-occurrences by POSITIVE pointwise mutual
    information — the statistic whose implicit factorization is
    word2vec (Levy & Goldberg 2014): pairs are tokens within
    ``window`` positions (ordered: w1 before w2, 1 ≤ gap ≤ window),
    ``PPMI = max(0, ln(P(pair) / (P(w1)·P(w2))))`` with unigram MLEs.

    Relational shape: for each gap g ∈ 1..window the pair table is an
    ``arrays_zip`` of the token array with itself shifted by g — a
    pure projection, NO self-join — unioned over the ``window``
    constant. Exactly ``Σ_g (len−g)`` pairs per doc: linear in corpus
    size for fixed window (a position self-join would scan O(len²)
    candidate pairs per document inside the join buffer). Everything
    collapses map-side; no Python in the hot path.

    vs :func:`pmi_collocations`: that is the window=1 adjacent-bigram
    special case; this one buys the wider context a word2vec-style
    pipeline needs."""
    toks = tokens_col(text_col)
    lanes = []
    for g in range(1, window + 1):
        n_pairs = F.greatest(F.size(toks) - g, F.lit(0))
        zipped = F.arrays_zip(
            F.slice(toks, 1, n_pairs).alias("w1"),
            F.slice(toks, 1 + g, n_pairs).alias("w2"),
        )
        lanes.append(
            docs.select(F.explode(zipped).alias("bg")).select(
                F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
            )
        )
    big = lanes[0]
    for lane in lanes[1:]:
        big = big.unionByName(lane)
    pairs = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    uni = docs.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("_cu")
    )
    tot2 = pairs.agg(F.sum("_c2").alias("_t2"))
    totu = uni.agg(F.sum("_cu").alias("_tu"))
    pmi = F.log(
        (F.col("_c2") / F.col("_t2"))
        / ((F.col("_c1u") / F.col("_tu")) * (F.col("_c2u") / F.col("_tu")))
    )
    return (
        pairs.filter(F.col("_c2") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("_cu").alias("_c1u")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("_cu").alias("_c2u")), "w2")
        .crossJoin(F.broadcast(tot2))
        .crossJoin(F.broadcast(totu))
        .select(
            "w1",
            "w2",
            F.col("_c2").cast("long").alias("n_pair"),
            F.round(F.greatest(pmi, F.lit(0.0)), 6).alias("ppmi"),
        )
        .orderBy(F.desc("ppmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def dirichlet_log_odds(
    docs: DataFrame,
    group: Column,
    *,
    text_col: str = "text",
    min_count: int = 5,
    alpha0: float = 50.0,
    k: int = 20,
) -> DataFrame:
    """Log-odds-ratio with an informative Dirichlet prior (Monroe,
    Colaresi & Quinn 2008) — the defensible "which words distinguish
    corpus A from corpus B" statistic (raw log-odds overweights rare
    words; the combined-corpus prior shrinks them)::

        π_w   = (y_aw + y_bw) / (n_a + n_b)          (prior rate)
        δ_w   = ln((y_aw+α₀π_w)/(n_a+α₀−y_aw−α₀π_w))
              − ln((y_bw+α₀π_w)/(n_b+α₀−y_bw−α₀π_w))
        z_w   = δ_w / sqrt(1/(y_aw+α₀π_w) + 1/(y_bw+α₀π_w))

    ``group`` is a boolean Column splitting docs into A (true) / B.
    Everything flows from INTEGER term counts (one token explode +
    one groupBy(term) with conditional sums; corpus totals arrive by
    broadcast), evaluated in doubles with a fixed expression order —
    bit-reproducible in any engine, so the top-k cut is stable.

    Returns the k most-A-associated terms:
    (term, count_a, count_b, z_score) ordered by z desc.
    """
    toks = docs.select(
        group.alias("_a"), F.explode(tokens_col(text_col)).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("ya"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("yb"),
    )
    totals = toks.groupBy().agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("nb"),
    )
    c = counts.filter(F.col("ya") + F.col("yb") >= min_count).crossJoin(
        F.broadcast(totals)
    )
    ya, yb = F.col("ya").cast("double"), F.col("yb").cast("double")
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    pi = (ya + yb) / (na + nb)
    aw = F.lit(alpha0) * pi
    delta = F.log((ya + aw) / (na + F.lit(alpha0) - ya - aw)) - F.log(
        (yb + aw) / (nb + F.lit(alpha0) - yb - aw)
    )
    z = delta / F.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw))
    return (
        c.select(
            "term",
            F.col("ya").cast("long").alias("count_a"),
            F.col("yb").cast("long").alias("count_b"),
            z.alias("z_score"),
        )
        .orderBy(F.col("z_score").desc(), F.col("term").asc())
        .limit(k)
    )


def url_features(df, url_col: str = "url"):
    """URL normalization + crawl-curation features from Spark's
    native ``parse_url`` (java.net.URI semantics — PROTOCOL/HOST
    keep the written case, HOST excludes the port, QUERY drops the
    '?', REF drops the '#'): lowercased scheme and host, last-label
    TLD, non-empty path-segment depth, query-param count, port and
    fragment presence. The per-host/TLD rollups built on these are
    how a crawl pipeline applies domain quotas, dedups mirrors, and
    spots URL-shape spam — all codegen, no Python.
    """
    from pyspark.sql import functions as F

    p = lambda part: F.expr(f"parse_url({url_col}, '{part}')")  # noqa: E731
    return (
        df.withColumn("proto_norm", F.lower(p("PROTOCOL")))
        .withColumn("host_norm", F.lower(p("HOST")))
        .withColumn("tld", F.element_at(F.split("host_norm", "[.]"), -1))
        .withColumn(
            "path_depth",
            F.size(
                F.filter(F.split(p("PATH"), "/"), lambda x: x != F.lit(""))
            ).cast("long"),
        )
        .withColumn(
            "n_params",
            F.when(p("QUERY").isNull(), F.lit(0))
            .otherwise(F.size(F.split(p("QUERY"), "&")))
            .cast("long"),
        )
        .withColumn("has_port", p("AUTHORITY").contains(":"))
        .withColumn("has_frag", p("REF").isNotNull())
    )


def html_extract(df, html_col: str = "html"):
    """Boilerplate-stripping HTML text extraction — the first step
    of every web-crawl corpus pipeline: drop ``<script>``/``<style>``
    blocks ENTIRELY (tag-strip alone would leak their code as fake
    prose), replace remaining tags with spaces (block boundaries
    must not glue words together), decode the five predefined
    entities (amp LAST so ``&amp;lt;`` can't double-decode), and
    collapse whitespace. Appends ``title``, ``visible_text``,
    ``visible_len``, ``n_links``, ``anchor_chars``, and
    ``link_density_millis`` (anchor-text chars per 1000 visible
    chars — the classic boilerplate/navigation-page discriminator).

    All regexps stay inside the Java∩RE2 portable subset pinned by
    the regex gauntlet (lazy quantifiers, ``(?is)`` flags, no
    backrefs), fully codegen — no Python in the hot path.
    """
    from pyspark.sql import functions as F

    def decode_entities(col):
        for src, dst in (
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&#39;", "'"),
            ("&amp;", "&"),
        ):
            col = F.replace(col, F.lit(src), F.lit(dst))
        return col

    no_blocks = F.regexp_replace(
        F.regexp_replace(
            F.col(html_col), r"(?is)<script[^>]*>.*?</script>", " "
        ),
        r"(?is)<style[^>]*>.*?</style>",
        " ",
    )
    visible = F.trim(
        F.regexp_replace(
            decode_entities(F.regexp_replace(no_blocks, r"<[^>]*>", " ")),
            r"\s+",
            " ",
        )
    )
    title = decode_entities(
        F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    )
    anchors = F.expr(
        f"regexp_extract_all({html_col}, '(?is)<a[^>]*>(.*?)</a>', 1)"
    )
    anchor_chars = F.aggregate(
        F.transform(anchors, lambda a: F.length(decode_entities(a)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.withColumn("title", title)
        .withColumn("visible_text", visible)
        .withColumn("visible_len", F.length(visible).cast("long"))
        .withColumn("n_links", F.size(anchors).cast("long"))
        .withColumn("anchor_chars", anchor_chars)
        .withColumn(
            "link_density_millis",
            F.expr("anchor_chars * 1000L div greatest(visible_len, 1L)"),
        )
    )


def pii_scrub(df, text_col: str = "text"):
    """PII detection + masking — the redaction pass every
    training-corpus pipeline runs before tokenization: emails →
    ``<EMAIL>``, NANP-shaped phone numbers → ``<PHONE>``, IPv4
    literals → ``<IP>``. Appends ``n_emails``/``n_phones``/
    ``n_ips`` (pre-mask counts) and ``scrubbed_text``/
    ``scrubbed_len``. Masking order is email → IPv4 → phone:
    emails are removed before the digit patterns can fire inside
    them, and IPv4 before phone so dotted quads never half-match
    the phone shape.

    Patterns stay in the Java∩RE2 portable subset (no lookarounds:
    the IPv4 boundary is ``\\b``, supported by both). This is the
    fast RECALL-ORIENTED regex tier — a production pipeline layers
    NER on top for names/addresses; those models don't belong in a
    scan operator.
    """
    from pyspark.sql import functions as F

    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"

    c = F.col(text_col)
    out = (
        df.withColumn("n_emails", F.regexp_count(c, F.lit(email)).cast("long"))
        .withColumn("n_ips", F.regexp_count(c, F.lit(ipv4)).cast("long"))
        .withColumn("n_phones", F.regexp_count(c, F.lit(phone)).cast("long"))
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, email, "<EMAIL>"), ipv4, "<IP>"
        ),
        phone,
        "<PHONE>",
    )
    return out.withColumn("scrubbed_text", scrubbed).withColumn(
        "scrubbed_len", F.length("scrubbed_text").cast("long")
    )

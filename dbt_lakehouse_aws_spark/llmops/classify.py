"""In-engine text classification: multinomial Naive Bayes over
hashed token features.

The quality/language/domain classifiers in training-data pipelines
(fastText-style) are, at their statistical core, linear models over
sparse token counts. Multinomial NB is the closed-form member of
that family — both *training* (per-class token-bucket counts) and
*inference* (argmax of summed log-probabilities) are pure relational
aggregates, so the whole classifier runs inside the engine with no
iterative solver and is oracle-checkable in ANSI SQL.

Scale shape:

* features are hashed buckets (portable polynomial hash mod
  ``n_buckets``) → model size = classes × buckets, independent of
  vocabulary; the model **broadcasts**;
* training = one explode + (class, bucket) hash count (map-side
  combinable, shuffle O(classes·buckets));
* inference = tokens ⋈ broadcast model (fan-out = classes per
  token) → per-(doc, class) partial sum → min-struct argmax
  (one shuffle O(docs·classes));
* add-one smoothing over the dense class×bucket grid, so unseen
  buckets score identically in any engine.

Determinism: scores are rounded before the argmax and ties break on
the class name (min-struct of (−score, class)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.text import poly_hash, tokens_col


def hashed_bucket_counts(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 128,
) -> DataFrame:
    """(id, bucket, cnt) hashed-token features — the shared input of
    NB training and scoring (and the same shape DSIR consumes).

    When one corpus is both trained on and scored (self-labeling,
    eval runs), pass the SAME returned DataFrame to both
    :func:`nb_train` and :func:`nb_predict`: the (id, bucket)
    aggregate's exchange is then identical in both branches and
    Catalyst's ReuseExchange materializes it once — the token stream
    and its per-char hash fold are scanned a single time.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).withColumn("bucket", F.pmod(poly_hash(F.col("tok")), F.lit(n_buckets)))
    return toks.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def nb_train(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 128,
    id_col: str = "doc_id",
    doc_buckets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB; returns ``(model, priors)``.

    model:  (class, bucket, lp)   — ln P(bucket | class), smoothed
    priors: (class, lprior)       — ln P(class)
    Both are classes×buckets-sized: broadcast-able at any corpus size.

    Without ``doc_buckets`` the class×bucket counts aggregate straight
    off the exploded token stream (map-side combine collapses each
    task to ≤ classes·n_buckets rows — the cheapest possible shuffle).
    With ``doc_buckets`` (see :func:`hashed_bucket_counts`) the counts
    derive from the shared feature relation instead, trading a
    (doc, bucket)-sized shuffle for hashing the corpus only once
    across train+predict.
    """
    if doc_buckets is not None:
        bc = (
            doc_buckets.join(docs.select(F.col(id_col), F.col(label_col).alias("class")), id_col)
            .groupBy("class", "bucket")
            .agg(F.sum("cnt").alias("n_bc"))
        )
    else:
        toks = docs.select(
            F.col(label_col).alias("class"), F.explode(tokens_col(text_col)).alias("tok")
        ).withColumn("bucket", F.pmod(poly_hash(F.col("tok")), F.lit(n_buckets)))
        bc = toks.groupBy("class", "bucket").agg(F.count(F.lit(1)).alias("n_bc"))
    ctot = bc.groupBy("class").agg(F.sum("n_bc").alias("n_c"))
    grid = ctot.crossJoin(
        docs.sparkSession.range(n_buckets).select(F.col("id").cast("long").alias("bucket"))
    )
    model = (
        grid.join(bc, ["class", "bucket"], "left")
        .select(
            "class",
            "bucket",
            F.log(
                (F.coalesce("n_bc", F.lit(0)) + 1).cast("double")
                / (F.col("n_c") + n_buckets)
            ).alias("lp"),
        )
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    priors = (
        docs.groupBy(F.col(label_col).alias("class"))
        .agg(F.count(F.lit(1)).alias("docs_c"))
        .crossJoin(F.broadcast(n_docs))
        .select("class", F.log(F.col("docs_c").cast("double") / F.col("_n")).alias("lprior"))
    )
    return model, priors


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 128,
    doc_buckets: DataFrame | None = None,
) -> DataFrame:
    """Score every document against the broadcast model; returns
    (id, pred_class, score) with the argmax resolved deterministically.

    Per-doc bucket counts first: the model join fans out over
    ≤ docs·n_buckets rows (not the raw token stream), and the
    log-likelihood is Σ cnt·lp — same partial-agg shape at any scale.
    """
    if doc_buckets is None:
        doc_buckets = hashed_bucket_counts(
            docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
        )
    scored = (
        doc_buckets.join(F.broadcast(model), "bucket")
        .groupBy(id_col, "class")
        .agg(F.sum(F.col("cnt") * F.col("lp")).alias("_ll"))
        .join(F.broadcast(priors), "class")
        .select(
            id_col,
            "class",
            F.round(F.col("_ll") + F.col("lprior"), 6).alias("score"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score")).alias("neg"), F.col("class").alias("c"))).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.c").alias("pred_class"),
        (-F.col("_b.neg")).alias("score"),
    )


def chi2_terms(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """χ² feature selection: rank terms by association with the
    label (the classic preprocessing step before training a text
    classifier — which words are evidence of which class).

    ``χ²(t) = Σ_c (O_tc − E_tc)² / E_tc`` over token counts, with
    ``E_tc = rowtot_t · coltot_c / N``.

    The contingency table is densified (term-totals × classes grid,
    left-joined to the observed counts) so zero-observed cells
    contribute their full (0−E)²/E — the textbook statistic, not the
    sparse approximation. Everything shuffles O(vocab·classes): the
    observed counts collapse map-side, the classes-sized column
    totals broadcast, and the grid join is keyed on (term, class)
    where both sides are vocab-sized. Top-k compiles to
    TakeOrderedAndProject.
    """
    tc = (
        docs.select(
            F.col(label_col).alias("class"),
            F.explode(tokens_col(text_col)).alias("term"),
        )
        .groupBy("term", "class")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_tot = tc.groupBy("term").agg(F.sum("o").alias("rt"))
    col_tot = tc.groupBy("class").agg(F.sum("o").alias("ct"))
    n = tc.agg(F.sum("o").alias("n"))
    grid = row_tot.crossJoin(F.broadcast(col_tot))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    o = F.coalesce("o", F.lit(0))
    return (
        grid.join(tc, ["term", "class"], "left")
        .crossJoin(F.broadcast(n))
        .withColumn("_chi", (o - e) * (o - e) / e)
        .groupBy("term")
        .agg(F.round(F.sum("_chi"), 6).alias("chi2"))
        .orderBy(F.desc("chi2"), F.asc("term"))
        .limit(k)
    )


def mutual_information_terms(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Mutual information between terms and class labels — the
    information-theoretic sibling of :func:`chi2_terms` for feature
    selection: ``MI(t) = Σ_c (o_tc/N) · ln( (o_tc/N) / ((rt_t/N)·(ct_c/N)) )``
    over token counts.

    Zero-observed cells contribute exactly 0 (lim x→0 of x·ln x), so
    unlike χ² no grid densification is needed — the sum runs over the
    SPARSE observed (term, class) cells only, one map-side-combinable
    aggregate + a vocab-sized join + a broadcast of the classes-sized
    column totals. Shuffle O(observed cells), never O(tokens) past
    the first aggregate.
    """
    tc = (
        docs.select(
            F.col(label_col).alias("class"),
            F.explode(tokens_col(text_col)).alias("term"),
        )
        .groupBy("term", "class")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_tot = tc.groupBy("term").agg(F.sum("o").alias("rt"))
    col_tot = tc.groupBy("class").agg(F.sum("o").alias("ct"))
    n = tc.agg(F.sum("o").alias("n"))
    o = F.col("o").cast("double")
    term = (o / F.col("n")) * F.log(
        (o * F.col("n")) / (F.col("rt").cast("double") * F.col("ct"))
    )
    return (
        tc.join(row_tot, "term")
        .join(F.broadcast(col_tot), "class")
        .crossJoin(F.broadcast(n))
        .groupBy("term")
        .agg(F.round(F.sum(term), 6).alias("mi"))
        .orderBy(F.desc("mi"), F.asc("term"))
        .limit(k)
    )

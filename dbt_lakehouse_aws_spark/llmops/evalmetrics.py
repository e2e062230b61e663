"""Evaluation metrics as engine operators.

A training-data pipeline doesn't stop at producing classifiers,
retrievers, and indexes — it has to SCORE them, continuously and at
corpus scale (per-language classifier drift, ANN recall after a
re-index, retrieval quality per query cohort). These are the two
standard report shapes, built as plain aggregations so they run
inside the same plan as the thing they evaluate:

* :func:`classification_report` — per-class precision / recall / F1
  / support from (label, prediction) pairs. One groupBy on the truth
  label + one on the prediction + an outer join of the two tiny
  per-class frames: shuffle O(classes), never O(rows) past the first
  aggregate.
* :func:`ranking_metrics` — recall@k, MRR@k, nDCG@k per query from a
  ranked result list vs a ground-truth list. One join on
  (query, item) + one groupBy(query); metric arithmetic is
  closed-form and engine-portable (log2 via ln/ln2), so an external
  SQL oracle replays it bit-identically.

No reference counterpart (the reference has no model evaluation);
this mirrors the sklearn/trec-eval conventions.
"""

from __future__ import annotations

import math

from dbt_lakehouse_aws_spark.localframe import local_frame
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_report(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1/support, classes = union of
    observed labels and predictions (a class predicted but never true
    shows precision with NULL recall and vice versa — hiding those
    rows is how report bugs ship). Values rounded to 6 dp."""
    truth = df.groupBy(F.col(label_col).alias("class")).agg(
        F.count(F.lit(1)).alias("support"),
        F.sum(
            F.when(F.col(pred_col) == F.col(label_col), 1).otherwise(0)
        ).alias("tp"),
    )
    pred = df.groupBy(F.col(pred_col).alias("class")).agg(
        F.count(F.lit(1)).alias("predicted")
    )
    j = truth.join(pred, "class", "full_outer").select(
        "class",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        F.coalesce("predicted", F.lit(0)).cast("long").alias("predicted"),
    )
    precision = F.col("tp").cast("double") / F.nullif(
        F.col("predicted").cast("double"), F.lit(0.0)
    )
    recall = F.col("tp").cast("double") / F.nullif(
        F.col("support").cast("double"), F.lit(0.0)
    )
    f1 = (2 * precision * recall) / F.nullif(precision + recall, F.lit(0.0))
    return j.select(
        "class",
        "support",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("class")


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    *,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int,
) -> DataFrame:
    """Per-query recall@k, MRR@k, nDCG@k of ``results`` (ranked,
    1-based ``rank_col``) against the ``truth`` item set.

    recall@k = |topk ∩ truth| / |truth|; MRR@k = 1/rank of the first
    relevant result (0 if none in the top k); nDCG@k with binary
    gains = Σ_rel 1/log2(rank+1) normalized by the ideal prefix
    Σ_{i=1..min(k,|truth|)} 1/log2(i+1). log2 is computed as
    ln(x)/ln(2) on both engines so the doubles agree bit-for-bit;
    outputs rounded to 6 dp.

    Queries present in ``truth`` but absent from ``results`` score 0
    on all three (a retriever that returns nothing must not be
    dropped from its own evaluation).
    """
    ln2 = math.log(2.0)
    res_k = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("r"),
    )
    tr = truth.select(
        F.col(query_col).alias("q"), F.col(item_col).alias("item")
    )
    n_truth = tr.groupBy("q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = res_k.join(tr, ["q", "item"]).select("q", "r")
    per_q = hits.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("r").alias("first_hit"),
        F.sum(1.0 / (F.log(F.col("r") + 1.0) / ln2)).alias("dcg"),
    )
    # ideal DCG for m relevant docs in a k-slot list
    def _idcg(m: int) -> float:
        return sum(1.0 / (math.log(i + 1.0) / ln2) for i in range(1, min(m, k) + 1))

    idcg_pairs = sorted({r["n_rel"] for r in n_truth.select("n_rel").distinct().collect()})
    spark = results.sparkSession
    idcg_df = local_frame(
        spark, [(int(m), _idcg(int(m))) for m in idcg_pairs], "n_rel long, idcg double"
    )
    out = (
        n_truth.join(per_q, "q", "left")
        .join(F.broadcast(idcg_df), "n_rel")
        .select(
            F.col("q").alias(query_col),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_rel").cast("double"),
                6,
            ).alias(f"recall_at_{k}"),
            F.round(
                F.coalesce(1.0 / F.col("first_hit").cast("double"), F.lit(0.0)), 6
            ).alias(f"mrr_at_{k}"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
            ).alias(f"ndcg_at_{k}"),
        )
        .orderBy(query_col)
    )
    return out


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    *,
    col: str,
    eps: float = 1e-6,
) -> DataFrame:
    """Population stability index between two snapshots of a
    categorical column — the standard drift monitor between a
    reference corpus/feature distribution and a new batch (PSI < 0.1
    stable, 0.1–0.25 moderate shift, > 0.25 investigate).

    Per category: ``psi_term = (p - q) · ln(p / q)`` with both shares
    clipped at ``eps`` so categories present in only one snapshot
    contribute a large-but-finite term instead of ±inf. Total PSI is
    the sum of terms. Two tiny count aggregates + scalar-total
    broadcast cross joins + a full outer join on category — shuffle
    O(categories) past the first aggregates, and every expression
    replays in an external SQL engine (ln, not log10, for parity).
    """
    def shares(df: DataFrame, out: str) -> DataFrame:
        counts = df.groupBy(F.col(col).alias("category")).agg(
            F.count(F.lit(1)).alias("_c")
        )
        total = counts.agg(F.sum("_c").alias("_n"))
        return counts.crossJoin(F.broadcast(total)).select(
            "category",
            (F.col("_c").cast("double") / F.col("_n")).alias(out),
        )

    pa = shares(a, "p")
    pb = shares(b, "q")
    j = pa.join(pb, "category", "full_outer").select(
        "category",
        F.greatest(F.coalesce("p", F.lit(0.0)), F.lit(eps)).alias("p"),
        F.greatest(F.coalesce("q", F.lit(0.0)), F.lit(eps)).alias("q"),
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return j.select(
        "category",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round(term, 6).alias("psi_term"),
    ).orderBy("category")


def auc_roc(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """One-row ROC-AUC via the tie-aware Mann-Whitney rank-sum —
    exact, distributed, no per-row window funnel.

    ``AUC = (R⁺ − P(P+1)/2) / (P·N)`` where R⁺ is the positive
    class's rank-sum under AVERAGE ranks for tied scores. The plan:
    one groupBy collapses rows to per-distinct-score cells
    ``(n_i, p_i)``; a scalable prefix sum (operators/windows.py::
    prefix_sum — range partition + per-partition offsets, never a
    single-partition window) orders the cells by score and gives
    cumulative counts, from which each cell's average rank is
    closed-form: ``cum_n − n_i + (n_i+1)/2``. Everything after the
    first aggregate is O(distinct scores).

    Returns (auc, n_pos, n_neg) — and because ranks, counts, and the
    final ratio are exact integer/rational arithmetic in double, an
    external SQL oracle reproduces the value bit-for-bit.
    """
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    y = F.col(label_col).cast("long")
    cells = df.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(y).alias("_p")
    )
    cum = prefix_sum(cells, [F.asc("_s")], "_n", name="_cum")
    avg_rank = (
        (F.col("_cum") - F.col("_n")).cast("double")
        + (F.col("_n") + 1).cast("double") / 2.0
    )
    agg = cum.agg(
        F.sum(F.col("_p") * avg_rank).alias("_rpos"),
        F.sum("_p").alias("_P"),
        F.sum("_n").alias("_N"),
    )
    P = F.col("_P").cast("double")
    N = (F.col("_N") - F.col("_P")).cast("double")
    auc = (F.col("_rpos") - P * (P + 1) / 2.0) / (P * N)
    return agg.select(
        auc.alias("auc"),
        F.col("_P").cast("long").alias("n_pos"),
        (F.col("_N") - F.col("_P")).cast("long").alias("n_neg"),
    )


def calibration_bins(
    scored: DataFrame,
    *,
    p_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Brier score: bin rows by predicted
    probability, compare the bin's mean prediction to its observed
    positive rate — the standard "is the model's 0.8 really an 80%"
    diagnostic that complements rank-only AUC.

    Determinism at scale: predictions are quantized to MILLI-units
    (``floor(p·1000 + 0.5)`` — exact IEEE ops) BEFORE aggregation,
    so every aggregate is an exact BIGINT sum — double sums would
    vary with partition order and flip last digits between runs and
    engines. Per-row squared error ≤ 10⁶, so the Brier numerator
    stays in int64 up to ~9·10¹² rows. One map-side-combinable
    groupBy on the bin; the global Brier broadcast back onto each
    bin row.

    Returns (bin, n, avg_pred, frac_pos, brier) — ``bin`` in
    [0, n_bins), ``brier`` identical on every row.
    """
    p, y = F.col(p_col), F.col(label_col).cast("long")
    pm = F.floor(p * 1000 + F.lit(0.5)).cast("long")
    base = scored.select(
        F.least(
            F.floor(p * n_bins).cast("long"), F.lit(int(n_bins) - 1)
        ).alias("bin"),
        pm.alias("_pm"),
        y.alias("_y"),
        ((pm - y * 1000) * (pm - y * 1000)).alias("_sq"),
    )
    per_bin = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_pm").alias("_spm"),
        F.sum("_y").alias("_sy"),
        F.sum("_sq").alias("_ssq"),
    )
    tot = per_bin.groupBy().agg(
        F.sum("n").alias("_n"), F.sum("_ssq").alias("_tsq")
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            (
                F.col("_spm").cast("double")
                / (F.col("n").cast("double") * 1000.0)
            ).alias("avg_pred"),
            (F.col("_sy").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
            (
                F.col("_tsq").cast("double")
                / (F.col("_n").cast("double") * 1000000.0)
            ).alias("brier"),
        )
        .orderBy("bin")
    )

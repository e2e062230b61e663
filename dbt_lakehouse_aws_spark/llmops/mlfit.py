"""Distributed model fitting via sufficient-statistic aggregates.

Sibling of ``llmops/similarity.py``'s PCA/k-means: the driver holds
only the parameter vector (a handful of floats); each iteration is
ONE whole-stage-codegen aggregate over the data — no per-row Python,
no collect of anything data-sized. This is the textbook way to train
small models on huge data in Spark: full-batch gradient descent where
the gradient is a `df.agg(...)` of JVM expressions.

Determinism: with fixed initial weights, learning rate, and iteration
count, the whole trajectory is a closed-form composition of
aggregates — which is what lets the driver gate replay it in SQL as
chained CTEs (one per iteration), the same unrolled-fixpoint oracle
device as pagerank_event_graph.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch gradient-descent logistic regression; returns
    ``[w0 (intercept), w1..wk]`` after ``iters`` steps from an
    all-zero start.

    Per step: ``w_j ← w_j − lr · mean((σ(w·x) − y) · x_j)`` — one
    aggregate job over the data computing k+1 means; the weight
    vector (k+1 Python floats) is the only driver-side state. At
    100 TB each step is a single map-side-combinable pass; iteration
    count is fixed and small, so total cost is ``iters`` scans
    (cache/persist the projected input upstream to pay the read
    once).
    """
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        z = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j + 1]) * F.col(c)
        err = _sigmoid(z) - y
        grads = df.agg(
            F.avg(err).alias("g0"),
            *[
                F.avg(err * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        w = [w[j] - lr * float(grads[f"g{j}"]) for j in range(k + 1)]
    return w


def logreg_log_loss(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    weights: Sequence[float],
) -> DataFrame:
    """One-row frame: mean binary cross-entropy of ``weights`` on
    ``df`` plus the positive rate — the fit-quality readout paired
    with :func:`logreg_fit` (one more aggregate pass)."""
    y = F.col(label_col).cast("double")
    z = F.lit(float(weights[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(weights[j + 1])) * F.col(c)
    p = _sigmoid(z)
    loss = -(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))
    return df.agg(
        F.avg(loss).alias("log_loss"),
        F.avg(y).alias("pos_rate"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def isotonic_fit(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    x_col: str,
    y_sum_col: str,
    w_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Weighted L2 isotonic regression by POOL-ADJACENT-VIOLATORS,
    one independent fit per group — the calibration step behind
    reliability curves (Zadrozny & Elkan '02) and monotone trend
    smoothing.

    Contract: ``df`` is the PRE-AGGREGATED sufficient-statistics
    frame — one row per (group, x) carrying ``y_sum`` (integer sum
    of outcomes) and ``w`` (integer weight / count). The heavy
    reduction from raw rows to this frame happens upstream in
    whole-stage-codegen SQL; PAV itself is inherently sequential in
    x, so it runs per group in ONE Arrow ``applyInPandas`` pass over
    the tiny aggregate — groups fit in parallel, never a
    single-partition funnel over raw data.

    All arithmetic is EXACT: pools carry integer (Σy, Σw); the
    violation test compares pool means by integer cross-
    multiplication (``s_prev·w_next > s_next·w_prev`` — no float
    ever decides a merge); the fitted value is emitted floor-
    quantized, ``Σy·quant // Σw``, in arbitrary-precision Python
    int. Because floor is monotone and commutes with min/max, this
    equals the floor-quantization of the exact real fit — which is
    what lets a SQL oracle replay it through the minimax identity
    ``fit(k) = max_{i<=k} min_{j>=k} qavg(i, j)`` in pure BIGINT
    arithmetic, a completely different algorithm with a provably
    identical result.
    """
    import pandas as pd

    gcols = list(group_cols)
    out_schema = ", ".join(
        f"`{c}` string" for c in gcols
    ) + f", `{x_col}` string, w long, fitted_q long"

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        pools: list[list[int]] = []  # [sum_y, sum_w, n_points]
        for s, w in zip(pdf[y_sum_col], pdf[w_col]):
            pools.append([int(s), int(w), 1])
            # merge while the previous pool's mean EXCEEDS the last's
            while (
                len(pools) > 1
                and pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
            ):
                s2, w2, c2 = pools.pop()
                pools[-1][0] += s2
                pools[-1][1] += w2
                pools[-1][2] += c2
        fitted: list[int] = []
        for s, w, c in pools:
            fitted.extend([s * quant // w] * c)
        return pd.DataFrame(
            {
                **{c: pdf[c].astype(str) for c in gcols},
                x_col: pdf[x_col].astype(str),
                "w": pdf[w_col].astype("int64"),
                "fitted_q": pd.Series(fitted, dtype="int64"),
            }
        )

    return df.groupBy(*gcols).applyInPandas(pav, out_schema)

"""Round-11+ STAGED queries — work built after round 10's window
(the 50 staged_r10 queries) was already full. Same staging
discipline: every entry carries its oracle and is pytest-verified
each session by ``tests/test_staged_r6.py``.
"""

from __future__ import annotations

#: name → oracle SQL, mirrors standard_queries' registry shape
STAGED_ORACLES: dict[str, str] = {}
#: name → (spark, sf_dir) -> DataFrame
STAGED_QUERIES: dict[str, object] = {}


def _staged(name: str, oracle: str):
    def deco(fn):
        STAGED_ORACLES[name] = oracle
        STAGED_QUERIES[name] = fn
        return fn

    return deco


from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402,F401
from pyspark.sql import functions as F  # noqa: E402

from dbt_lakehouse_aws_spark.sources.tables import T  # noqa: E402


@_staged(
    "km_censored_repurchase",
    """
    WITH purchases AS (
      SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS k
      FROM events WHERE event_type = 'purchase'
    ),
    horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    firsts AS (
      SELECT user_id, CAST(ts AS DATE) AS d1 FROM purchases WHERE k = 1
    ),
    seconds AS (
      SELECT user_id, CAST(ts AS DATE) AS d2 FROM purchases WHERE k = 2
    ),
    subjects AS (
      SELECT f.user_id,
             CASE WHEN s.d2 IS NOT NULL
                  THEN CAST(date_diff('day', f.d1, s.d2) AS BIGINT)
                  ELSE CAST(date_diff('day', f.d1, (SELECT h FROM horizon))
                       AS BIGINT) END AS t,
             CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM firsts f LEFT JOIN seconds s ON s.user_id = f.user_id
    ),
    risk AS (
      SELECT t, CAST(sum(observed) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM subjects GROUP BY 1
    ),
    km AS (
      SELECT r.t, r.d,
             (SELECT sum(r2.leaving) FROM risk r2 WHERE r2.t >= r.t)
               AS n_at_risk
      FROM risk r WHERE r.d > 0
    ),
    curve AS (
      SELECT k.t, k.d, k.n_at_risk,
             (SELECT sum(CASE WHEN k2.n_at_risk > k2.d
                              THEN ln(1.0 - CAST(k2.d AS DOUBLE) / k2.n_at_risk)
                              ELSE 0.0 END)
              FROM km k2 WHERE k2.t <= k.t) AS logsum,
             (SELECT max(CASE WHEN k2.n_at_risk = k2.d THEN 1 ELSE 0 END)
              FROM km k2 WHERE k2.t <= k.t) AS zero_seen
      FROM km k
    )
    SELECT t AS gap_days, d AS n_events,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CASE WHEN zero_seen = 1 THEN 0.0
                ELSE round(exp(logsum), 6) END AS survival
    FROM curve
    ORDER BY gap_days
    """,
)
def km_censored_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier WITH RIGHT CENSORING — the textbook estimator
    survival_km_repurchase deliberately simplifies away: one-purchase
    users aren't dropped, they're CENSORED at the observation horizon
    (they survive at least that long), so they thin the at-risk sets
    without contributing events. On a growing corpus the uncensored
    curve is biased toward fast repurchasers; this one is not. Same
    scalable risk-table device (two broadcast non-equi folds over the
    calendar-bounded event-time frame); event times with d=0 (pure
    censoring) drop out of the product exactly as the textbook says."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("k", F.row_number().over(w))
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("h"))
    firsts = p.filter(F.col("k") == 1).select(
        "user_id", F.to_date("ts").alias("d1")
    )
    seconds = p.filter(F.col("k") == 2).select(
        "user_id", F.to_date("ts").alias("d2")
    )
    subjects = (
        firsts.join(seconds, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("h", "d1"))
            .cast("long")
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("observed"),
        )
    )
    risk = subjects.groupBy("t").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    ).persist()
    r2 = risk.select(F.col("t").alias("t2"), F.col("leaving").alias("l2"))
    km = (
        risk.filter(F.col("d") > 0)
        .join(F.broadcast(r2), F.col("t2") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.sum("l2").alias("n_at_risk"))
    )
    k2 = km.select(
        F.col("t").alias("t2"),
        F.col("d").alias("d2k"),
        F.col("n_at_risk").alias("n2"),
    )
    ln_term = F.when(
        F.col("n2") > F.col("d2k"),
        F.log(1.0 - F.col("d2k").cast("double") / F.col("n2")),
    ).otherwise(0.0)
    zero_flag = F.when(F.col("n2") == F.col("d2k"), 1).otherwise(0)
    curve = (
        km.join(F.broadcast(k2), F.col("t2") <= F.col("t"))
        .groupBy("t", "d", "n_at_risk")
        .agg(
            F.sum(ln_term).alias("logsum"),
            F.max(zero_flag).alias("zero_seen"),
        )
    )
    surv = F.when(F.col("zero_seen") == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("logsum")), 6)
    )
    return curve.select(
        F.col("t").alias("gap_days"),
        F.col("d").alias("n_events"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        surv.alias("survival"),
    ).orderBy("gap_days")


@_staged(
    "brier_decomposition_orders",
    """
    WITH scored AS (
      SELECT CAST((o_orderkey % 20) AS BIGINT) AS bin,
             ((o_orderkey % 20) + 0.5) / 20.0 AS p,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END AS y
      FROM orders
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS nk,
             max(p) AS pk,
             sum(y) / count(*) AS ok
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(y) / count(*) AS obar
      FROM scored
    )
    SELECT (SELECT n FROM tot) AS n,
           floor((SELECT obar FROM tot) * 1e6 + 0.5) / 1e6 AS base_rate_q,
           floor(sum(nk * (pk - ok) * (pk - ok)) / (SELECT n FROM tot)
                 * 1e6 + 0.5) / 1e6 AS reliability_q,
           floor(sum(nk * (ok - (SELECT obar FROM tot))
                        * (ok - (SELECT obar FROM tot)))
                 / (SELECT n FROM tot) * 1e6 + 0.5) / 1e6 AS resolution_q,
           floor((SELECT obar FROM tot) * (1.0 - (SELECT obar FROM tot))
                 * 1e6 + 0.5) / 1e6 AS uncertainty_q
    FROM bins
    """,
)
def brier_decomposition_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — reliability −
    resolution + uncertainty — for a 20-bin synthetic forecaster of
    order urgency (bin k forecasts (k+0.5)/20): calibration_brier
    gives the total; this splits it into the three terms a forecast
    shop actually tunes (reliability→recalibrate, resolution→better
    features, uncertainty→irreducible). Bin aggregates then three
    scalar folds, all identical-order arithmetic."""
    o = T(spark, sf_dir, "orders")
    scored = o.select(
        (F.col("o_orderkey") % 20).cast("long").alias("bin"),
        (((F.col("o_orderkey") % 20) + 0.5) / 20.0).alias("p"),
        (F.col("o_orderpriority") == "1-URGENT").cast("double").alias("y"),
    )
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.max("p").alias("pk"),
        (F.sum("y") / F.count(F.lit(1))).alias("ok"),
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("y") / F.count(F.lit(1))).alias("obar"),
    )
    j = bins.crossJoin(F.broadcast(tot))
    rel = F.sum(F.col("nk") * (F.col("pk") - F.col("ok")) * (F.col("pk") - F.col("ok"))) / F.max("n")
    res = F.sum(
        F.col("nk")
        * (F.col("ok") - F.col("obar"))
        * (F.col("ok") - F.col("obar"))
    ) / F.max("n")
    return j.groupBy().agg(
        F.max("n").alias("n"),
        (F.floor(F.max("obar") * 1e6 + 0.5) / 1e6).alias("base_rate_q"),
        (F.floor(rel * 1e6 + 0.5) / 1e6).alias("reliability_q"),
        (F.floor(res * 1e6 + 0.5) / 1e6).alias("resolution_q"),
        (
            F.floor(F.max("obar") * (1.0 - F.max("obar")) * 1e6 + 0.5) / 1e6
        ).alias("uncertainty_q"),
    )


@_staged(
    "anderson_darling_2s_orders",
    """
    WITH pooled AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
             o_orderkey
      FROM orders
    ),
    sizes AS (
      SELECT CAST(sum(g) AS BIGINT) AS n1,
             CAST(count(*) - sum(g) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n
      FROM pooled
    ),
    ranked AS (
      SELECT x, g,
             CAST(row_number() OVER (ORDER BY x ASC, o_orderkey ASC)
                  AS BIGINT) AS j
      FROM pooled
    ),
    cum AS (
      SELECT j, x, g,
             CAST(sum(g) OVER (ORDER BY j) AS BIGINT) AS m1j
      FROM ranked
    ),
    terms AS (
      SELECT c.j, c.m1j, s.n1, s.n
      FROM cum c CROSS JOIN sizes s
      WHERE c.j < s.n
    )
    SELECT (SELECT n1 FROM sizes) AS n_urgent,
           (SELECT n2 FROM sizes) AS n_other,
           floor(
             (1.0 / ((SELECT CAST(n1 AS DOUBLE) FROM sizes)
                     * (SELECT n2 FROM sizes)))
             * sum((CAST(m1j AS DOUBLE) * n - CAST(j AS DOUBLE) * n1)
                   * (CAST(m1j AS DOUBLE) * n - CAST(j AS DOUBLE) * n1)
                   / (CAST(j AS DOUBLE) * (n - j)))
             * 1e6 + 0.5) / 1e6 AS ad2_q
    FROM terms
    """,
)
def anderson_darling_2s_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic (Pettitt's rank form,
    no-ties normalization: A² = 1/(n₁n₂) Σ_{j<n} (M₁ⱼn − jn₁)² /
    (j(n−j))) comparing urgent vs non-urgent order values — the
    TAIL-SENSITIVE companion to ks_drift_order_values (KS sees the
    biggest middle gap; AD weights the tails where pricing outliers
    actually live). The pooled rank and the cumulative urgent-count
    prefix both ride the scalable two-pass primitives
    (global_row_number + prefix_sum) — no single-partition funnel
    at any n."""
    from dbt_lakehouse_aws_spark.operators.windows import (
        global_row_number,
        prefix_sum,
    )

    o = T(spark, sf_dir, "orders")
    pooled = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("g"),
        "o_orderkey",
    )
    sizes = pooled.agg(
        F.sum("g").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g")).cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ranked = global_row_number(
        pooled, [F.col("x").asc(), F.col("o_orderkey").asc()], name="j"
    )
    cum = prefix_sum(
        ranked, [F.col("j").asc()], "g", name="m1j"
    )
    j = cum.crossJoin(F.broadcast(sizes)).filter(F.col("j") < F.col("n"))
    num = (
        F.col("m1j").cast("double") * F.col("n")
        - F.col("j").cast("double") * F.col("n1")
    )
    term = num * num / (F.col("j").cast("double") * (F.col("n") - F.col("j")))
    return j.groupBy("n1", "n2").agg(
        (
            F.floor(
                (1.0 / (F.col("n1").cast("double") * F.col("n2")))
                * F.sum(term)
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("ad2_q")
    ).select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_other"),
        "ad2_q",
    )


def _gmm_oracle_sql(rounds: int = 5) -> str:
    """Unrolled 2-component 1-D Gaussian-mixture EM: each round is
    one E-step (per-row responsibilities from the previous round's
    parameters) folded into one M-step aggregate (weighted moment
    sums). The data CTE is referenced every round → MATERIALIZED;
    initialization is deterministic (20th/80th exact order
    statistics and the pooled variance)."""
    steps = []
    prev = "p0"
    for i in range(1, rounds + 1):
        steps.append(
            f"""e{i} AS (
      SELECT d.x,
             (p.w1 * exp(-(d.x - p.mu1) * (d.x - p.mu1) / (2 * p.v1))
                / sqrt(p.v1))
             / ((p.w1 * exp(-(d.x - p.mu1) * (d.x - p.mu1) / (2 * p.v1))
                 / sqrt(p.v1))
                + ((1 - p.w1) * exp(-(d.x - p.mu2) * (d.x - p.mu2)
                                    / (2 * p.v2)) / sqrt(p.v2))) AS r1
      FROM data d CROSS JOIN {prev} p),
    m{i} AS (
      SELECT sum(r1) AS s1, count(*) AS n,
             sum(r1 * x) AS sx1, sum(r1 * x * x) AS sxx1,
             sum(1 - r1) AS s2,
             sum((1 - r1) * x) AS sx2, sum((1 - r1) * x * x) AS sxx2
      FROM e{i}),
    p{i} AS (
      SELECT s1 / n AS w1,
             sx1 / s1 AS mu1,
             greatest(sxx1 / s1 - (sx1 / s1) * (sx1 / s1), 1e-6) AS v1,
             sx2 / s2 AS mu2,
             greatest(sxx2 / s2 - (sx2 / s2) * (sx2 / s2), 1e-6) AS v2
      FROM m{i})"""
        )
        prev = f"p{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH data AS MATERIALIZED (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) / 100000.0 AS x
      FROM orders
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM data),
    q AS (
      SELECT min(CASE WHEN rn = greatest(1, (SELECT n FROM n) // 5)
                      THEN x END) AS q20,
             min(CASE WHEN rn = greatest(1, (SELECT n FROM n) * 4 // 5)
                      THEN x END) AS q80
      FROM (SELECT x, row_number() OVER (ORDER BY x ASC) AS rn FROM data)
    ),
    v0 AS (
      SELECT sum(x * x) / count(*) - (sum(x) / count(*)) * (sum(x) / count(*))
               AS v
      FROM data
    ),
    p0 AS (
      SELECT 0.5 AS w1, (SELECT q20 FROM q) AS mu1,
             (SELECT v FROM v0) AS v1,
             (SELECT q80 FROM q) AS mu2, (SELECT v FROM v0) AS v2
    ),
    {chain}
    SELECT floor(w1 * 1e4 + 0.5) / 1e4 AS w1_q,
           floor(mu1 * 1e4 + 0.5) / 1e4 AS mu1_q,
           floor(v1 * 1e3 + 0.5) / 1e3 AS v1_q,
           floor(mu2 * 1e4 + 0.5) / 1e4 AS mu2_q,
           floor(v2 * 1e3 + 0.5) / 1e3 AS v2_q
    FROM {prev}
    """


@_staged("gmm_em_orders", _gmm_oracle_sql())
def gmm_em_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-component Gaussian-mixture EM on order values (scaled to
    units of $1000), 5 fixed rounds — the UNSUPERVISED member of the
    iterative-ML-as-aggregates family (logreg_orders_gd: supervised
    GD; kmeans: hard assignment; this: soft responsibilities): each
    round is one per-row E-step expression folded into one M-step
    moment aggregate, O(rows) per round with no driver state beyond
    the 5 parameters. Deterministic init (exact 20th/80th order
    statistics + pooled variance); the oracle unrolls the identical
    recursion; variances floored at 1e-6 against collapse. 4dp/3dp
    quantization absorbs the cross-engine summation-order noise the
    5 rounds amplify."""
    o = T(spark, sf_dir, "orders")
    data = o.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") / 100000.0).alias(
            "x"
        )
    ).persist()
    n = data.count()
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number

    ranked = global_row_number(data, [F.col("x").asc()], name="rn")
    q = ranked.agg(
        F.min(F.when(F.col("rn") == max(1, n // 5), F.col("x"))).alias("q20"),
        F.min(F.when(F.col("rn") == max(1, n * 4 // 5), F.col("x"))).alias(
            "q80"
        ),
    ).first()
    v0 = data.agg(
        (
            F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))
            - (F.sum("x") / F.count(F.lit(1)))
            * (F.sum("x") / F.count(F.lit(1)))
        ).alias("v")
    ).first()["v"]
    w1, mu1, v1, mu2, v2 = 0.5, q["q20"], v0, q["q80"], v0
    for _ in range(5):
        r1 = (
            F.lit(w1)
            * F.exp(-(F.col("x") - mu1) * (F.col("x") - mu1) / (2 * v1))
            / F.sqrt(F.lit(v1))
        ) / (
            (
                F.lit(w1)
                * F.exp(-(F.col("x") - mu1) * (F.col("x") - mu1) / (2 * v1))
                / F.sqrt(F.lit(v1))
            )
            + (
                F.lit(1 - w1)
                * F.exp(-(F.col("x") - mu2) * (F.col("x") - mu2) / (2 * v2))
                / F.sqrt(F.lit(v2))
            )
        )
        e = data.select("x", r1.alias("r1"))
        m = e.agg(
            (F.sum("r1") / F.count(F.lit(1))).alias("w1"),
            (F.sum(F.col("r1") * F.col("x")) / F.sum("r1")).alias("mu1"),
            F.sum("r1").alias("s1"),
            (F.sum((1 - F.col("r1")) * F.col("x")) / F.sum(1 - F.col("r1"))).alias(
                "mu2"
            ),
            F.sum(1 - F.col("r1")).alias("s2"),
            F.sum(F.col("r1") * F.col("x") * F.col("x")).alias("sxx1"),
            F.sum((1 - F.col("r1")) * F.col("x") * F.col("x")).alias("sxx2"),
        ).first()
        w1 = m["w1"]
        mu1, mu2 = m["mu1"], m["mu2"]
        v1 = max(m["sxx1"] / m["s1"] - mu1 * mu1, 1e-6)
        v2 = max(m["sxx2"] / m["s2"] - mu2 * mu2, 1e-6)
    return data.sparkSession.createDataFrame(
        [
            (
                __import__("math").floor(w1 * 1e4 + 0.5) / 1e4,
                __import__("math").floor(mu1 * 1e4 + 0.5) / 1e4,
                __import__("math").floor(v1 * 1e3 + 0.5) / 1e3,
                __import__("math").floor(mu2 * 1e4 + 0.5) / 1e4,
                __import__("math").floor(v2 * 1e3 + 0.5) / 1e3,
            )
        ],
        "w1_q double, mu1_q double, v1_q double, mu2_q double, v2_q double",
    )


def _huber_oracle_sql(rounds: int = 3, delta: float = 2.0) -> str:
    """Unrolled Huber-loss IRLS for y = a + b·x: each round computes
    per-row weights w = min(1, δ/|resid/s|) from the PREVIOUS
    round's fit (scale s fixed at the initial residual RMS — the
    fixed-scale variant, fully deterministic), then one weighted-OLS
    aggregate. data and the scale CTE are referenced every round →
    MATERIALIZED."""
    steps = []
    prev = "f0"
    for i in range(1, rounds + 1):
        steps.append(
            f"""w{i} AS (
      SELECT d.x, d.y,
             CASE WHEN abs((d.y - p.a - p.b * d.x) / (SELECT s FROM scale))
                       <= {delta} THEN 1.0
                  ELSE {delta} / abs((d.y - p.a - p.b * d.x)
                                     / (SELECT s FROM scale)) END AS w
      FROM data d CROSS JOIN {prev} p),
    f{i} AS (
      SELECT (sum(w * y) * sum(w * x * x) - sum(w * x) * sum(w * x * y))
               / (sum(w) * sum(w * x * x) - sum(w * x) * sum(w * x)) AS a,
             (sum(w) * sum(w * x * y) - sum(w * x) * sum(w * y))
               / (sum(w) * sum(w * x * x) - sum(w * x) * sum(w * x)) AS b
      FROM w{i})"""
        )
        prev = f"f{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH data AS MATERIALIZED (
      SELECT l_quantity AS x, l_extendedprice / 1000.0 AS y
      FROM lineitem
    ),
    f0 AS (
      SELECT (sum(y) * sum(x * x) - sum(x) * sum(x * y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS a,
             (count(*) * sum(x * y) - sum(x) * sum(y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS b
      FROM data
    ),
    scale AS MATERIALIZED (
      SELECT sqrt(sum((d.y - p.a - p.b * d.x) * (d.y - p.a - p.b * d.x))
                  / count(*)) AS s
      FROM data d CROSS JOIN f0 p
    ),
    {chain}
    SELECT floor(a * 1e6 + 0.5) / 1e6 AS intercept_q,
           floor(b * 1e6 + 0.5) / 1e6 AS slope_q,
           floor((SELECT s FROM scale) * 1e6 + 0.5) / 1e6 AS scale_q
    FROM {prev}
    """


@_staged("huber_irls_lineitem", _huber_oracle_sql())
def huber_irls_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber-loss robust regression of line value (in $1000) on
    quantity via 3 unrolled IRLS rounds — the ROBUST member of the
    regression family (ols_price_qty_disc: L2, hijacked by outliers;
    theil_sen: rank-based but median-of-slopes; this: the M-estimator
    production stacks actually fit): per round, rows with
    |standardized residual| > δ=2 are down-weighted δ/|r| and one
    weighted-OLS aggregate refits. Scale is frozen at the initial
    L2 residual RMS (the fixed-scale IRLS variant), making every
    round a deterministic O(rows) aggregate with 2 driver floats."""
    li = T(spark, sf_dir, "lineitem")
    data = li.select(
        F.col("l_quantity").alias("x"),
        (F.col("l_extendedprice") / 1000.0).alias("y"),
    ).persist()
    x, y = F.col("x"), F.col("y")
    f0 = data.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    ).first()
    den = f0["n"] * f0["sxx"] - f0["sx"] * f0["sx"]
    a = (f0["sy"] * f0["sxx"] - f0["sx"] * f0["sxy"]) / den
    b = (f0["n"] * f0["sxy"] - f0["sx"] * f0["sy"]) / den
    s = data.agg(
        F.sqrt(
            F.sum((y - a - b * x) * (y - a - b * x)) / F.count(F.lit(1))
        ).alias("s")
    ).first()["s"]
    delta = 2.0
    for _ in range(3):
        r = (y - a - b * x) / s
        w = F.when(F.abs(r) <= delta, 1.0).otherwise(delta / F.abs(r))
        m = data.select("x", "y", w.alias("w")).agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * y).alias("swy"),
            F.sum(F.col("w") * x).alias("swx"),
            F.sum(F.col("w") * x * x).alias("swxx"),
            F.sum(F.col("w") * x * y).alias("swxy"),
        ).first()
        den = m["sw"] * m["swxx"] - m["swx"] * m["swx"]
        a = (m["swy"] * m["swxx"] - m["swx"] * m["swxy"]) / den
        b = (m["sw"] * m["swxy"] - m["swx"] * m["swy"]) / den
    import math

    return data.sparkSession.createDataFrame(
        [
            (
                math.floor(a * 1e6 + 0.5) / 1e6,
                math.floor(b * 1e6 + 0.5) / 1e6,
                math.floor(s * 1e6 + 0.5) / 1e6,
            )
        ],
        "intercept_q double, slope_q double, scale_q double",
    )


@_staged(
    "wilcoxon_signed_rank_users",
    """
    WITH span AS (
      SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    mid AS (
      SELECT lo + CAST(date_diff('day', lo, hi) // 2 AS INTEGER) AS m
      FROM span
    ),
    per_user AS (
      SELECT user_id,
             sum(CASE WHEN CAST(ts AS DATE) < (SELECT m FROM mid)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS first_half,
             sum(CASE WHEN CAST(ts AS DATE) >= (SELECT m FROM mid)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS second_half
      FROM events GROUP BY 1
    ),
    diffs AS (
      SELECT user_id,
             CAST(second_half - first_half AS BIGINT) AS d
      FROM per_user
      WHERE second_half - first_half <> 0
    ),
    ranked AS (
      SELECT d,
             CAST(rank() OVER (ORDER BY abs(d) ASC) AS BIGINT) AS rlo,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(count(*) OVER (PARTITION BY abs(d)) AS BIGINT) AS ties
      FROM diffs
    ),
    mid_ranked AS (
      SELECT d, rlo + (ties - 1) / 2.0 AS r, n FROM ranked
    ),
    s AS (
      SELECT max(n) AS n,
             sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS w_plus
      FROM mid_ranked
    )
    SELECT n AS n_users,
           floor(w_plus * 1e2 + 0.5) / 1e2 AS w_plus_q,
           floor((w_plus - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0) * 1e6 + 0.5)
             / 1e6 AS z_q,
           CASE WHEN abs((w_plus - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0))
                > 1.959963984540054 THEN 'shifted' ELSE 'no_shift' END
             AS verdict
    FROM s
    """,
)
def wilcoxon_signed_rank_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test: did per-user spend SHIFT between
    the first and second half of the observation window? The PAIRED
    nonparametric test the family lacks (mann_whitney_by_type is
    unpaired; welch assumes normality): zero differences drop,
    |d| gets midranks (rank() + (ties−1)/2 — the average-rank
    convention, exact as a half-integer), W⁺ sums positive-d ranks,
    and the normal approximation z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24)
    decides. The rank rides a total-order window over the user frame
    — bounded by users, exact integers until z."""
    e = T(spark, sf_dir, "events")
    span = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).first()
    import datetime as _dt

    m = span["lo"] + _dt.timedelta(
        days=(span["hi"] - span["lo"]).days // 2
    )
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.to_date("ts") < F.lit(str(m)).cast("date"), cents)
              .otherwise(0)).alias("first_half"),
        F.sum(F.when(F.to_date("ts") >= F.lit(str(m)).cast("date"), cents)
              .otherwise(0)).alias("second_half"),
    )
    diffs = per_user.select(
        (F.col("second_half") - F.col("first_half")).cast("long").alias("d")
    ).filter(F.col("d") != 0)
    # midranks: rank() over |d| plus (tie_count-1)/2 — no dense sort
    # pathologies, and the scalable two-pass rank handles the order
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number

    rn = global_row_number(
        diffs.withColumn("ad", F.abs(F.col("d"))),
        [F.col("ad").asc(), F.col("d").asc()],
        name="rn",
    )
    # rank() semantics: min row_number within the |d| tie group
    grp = rn.groupBy("ad").agg(
        F.min("rn").alias("rlo"), F.count(F.lit(1)).alias("ties")
    )
    ranked = rn.join(grp, "ad").select(
        "d", (F.col("rlo") + (F.col("ties") - 1) / 2.0).alias("r")
    )
    n_tot = diffs.count()
    s = ranked.agg(
        F.sum(F.when(F.col("d") > 0, F.col("r")).otherwise(0.0)).alias(
            "w_plus"
        )
    ).first()
    import math

    n = float(n_tot)
    z = (s["w_plus"] - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1.0) * (2 * n + 1) / 24.0
    )
    return e.sparkSession.createDataFrame(
        [
            (
                n_tot,
                math.floor(s["w_plus"] * 1e2 + 0.5) / 1e2,
                math.floor(z * 1e6 + 0.5) / 1e6,
                "shifted" if abs(z) > 1.959963984540054 else "no_shift",
            )
        ],
        "n_users long, w_plus_q double, z_q double, verdict string",
    )


@_staged(
    "iv_2sls_lineitem",
    """
    WITH d AS (
      SELECT CAST(p.p_size AS DOUBLE) AS z,
             l.l_quantity AS x,
             l.l_extendedprice / 1000.0 AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(z) AS sz, sum(x) AS sx, sum(y) AS sy,
             sum(z * x) AS szx, sum(z * y) AS szy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           floor((n * szy - sz * sy) / (n * szx - sz * sx) * 1e6 + 0.5)
             / 1e6 AS beta_iv_q,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5)
             / 1e6 AS beta_ols_q,
           floor(((sy / n) - (n * szy - sz * sy) / (n * szx - sz * sx)
                  * (sx / n)) * 1e6 + 0.5) / 1e6 AS alpha_iv_q
    FROM s
    """,
)
def iv_2sls_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variables estimate (2SLS with one instrument,
    the Wald closed form β_IV = cov(z,y)/cov(z,x)): part SIZE
    instruments quantity in the quantity→value regression — the
    causal-inference estimator the family lacks (diff_in_diff:
    time-based; regression_discontinuity: cutoff-based; this:
    instrument-based, the answer to "quantity is endogenous to
    price"). Reported against the naive OLS slope so the
    endogeneity gap is visible. One pass of cross-moment sufficient
    statistics."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    d = li.join(
        F.broadcast(p.select("p_partkey", "p_size")),
        p.p_partkey == li.l_partkey,
    ).select(
        F.col("p_size").cast("double").alias("z"),
        F.col("l_quantity").alias("x"),
        (F.col("l_extendedprice") / 1000.0).alias("y"),
    )
    z, x, y = F.col("z"), F.col("x"), F.col("y")
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(z).alias("sz"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(z * x).alias("szx"),
        F.sum(z * y).alias("szy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n, sz, sx, sy = (F.col(c) for c in ["n", "sz", "sx", "sy"])
    szx, szy, sxy, sxx = (F.col(c) for c in ["szx", "szy", "sxy", "sxx"])
    beta_iv = (n * szy - sz * sy) / (n * szx - sz * sx)
    beta_ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n"),
        (F.floor(beta_iv * 1e6 + 0.5) / 1e6).alias("beta_iv_q"),
        (F.floor(beta_ols * 1e6 + 0.5) / 1e6).alias("beta_ols_q"),
        (
            F.floor(((sy / n) - beta_iv * (sx / n)) * 1e6 + 0.5) / 1e6
        ).alias("alpha_iv_q"),
    )


@_staged(
    "dft_weekly_power_events",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(x) / count(*) AS mu,
             sum(x * x) / count(*)
               - (sum(x) / count(*)) * (sum(x) / count(*)) AS var_pop
      FROM daily GROUP BY 1
    ),
    fourier AS (
      SELECT d.event_type,
             sum((d.x - m.mu) * cos(2 * pi() * d.t / 7.0)) AS c7,
             sum((d.x - m.mu) * sin(2 * pi() * d.t / 7.0)) AS s7
      FROM daily d JOIN m ON m.event_type = d.event_type
      GROUP BY 1
    )
    SELECT f.event_type, m.n AS n_days,
           floor((f.c7 * f.c7 + f.s7 * f.s7) / m.n * 1e4 + 0.5) / 1e4
             AS power7_q,
           floor(((f.c7 * f.c7 + f.s7 * f.s7) / m.n)
                 / (m.n * m.var_pop) * 1e6 + 0.5) / 1e6
             AS power7_share_q
    FROM fourier f JOIN m ON m.event_type = f.event_type
    ORDER BY f.event_type
    """,
)
def dft_weekly_power_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT (Goertzel) at period 7: the spectral power of
    each type's mean-centered daily counts at the weekly frequency,
    |Σ(x−μ)e^{−2πit/7}|²/n, and its share of total variance — the
    FREQUENCY-domain twin of seasonality_strength_events' ANOVA η²
    (η² sees any weekday pattern; the DFT bin sees specifically the
    period-7 sinusoid, immune to e.g. a payday-spike pattern that
    inflates η²). cos/sin of exact integer-ratio angles, one hash
    aggregate per type."""
    import math

    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("x") / F.count(F.lit(1))).alias("mu"),
        (
            F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))
            - (F.sum("x") / F.count(F.lit(1)))
            * (F.sum("x") / F.count(F.lit(1)))
        ).alias("var_pop"),
    )
    ang = 2 * math.pi * F.col("t") / 7.0
    fourier = (
        daily.join(m.select("event_type", "mu"), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("x") - F.col("mu")) * F.cos(ang)).alias("c7"),
            F.sum((F.col("x") - F.col("mu")) * F.sin(ang)).alias("s7"),
        )
    )
    power = (F.col("c7") * F.col("c7") + F.col("s7") * F.col("s7")) / F.col("n")
    return (
        fourier.join(m, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            (F.floor(power * 1e4 + 0.5) / 1e4).alias("power7_q"),
            (
                F.floor(power / (F.col("n") * F.col("var_pop")) * 1e6 + 0.5)
                / 1e6
            ).alias("power7_share_q"),
        )
        .orderBy("event_type")
    )


@_staged(
    "brown_forsythe_events",
    """
    WITH vals AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM vals
    ),
    med AS (
      SELECT event_type, max(cents) AS median_lo
      FROM ranked WHERE rn = greatest(1, (n + 1) // 2)
      GROUP BY 1
    ),
    z AS (
      SELECT v.event_type,
             CAST(abs(v.cents - m.median_lo) AS DOUBLE) AS z
      FROM vals v JOIN med m ON m.event_type = v.event_type
    ),
    grp AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ni,
             sum(z) AS sz, sum(z * z) AS szz
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(sz) AS sz_all
      FROM grp
    ),
    parts AS (
      SELECT
        (SELECT sum(ni * (sz / ni - (SELECT sz_all / n FROM tot))
                       * (sz / ni - (SELECT sz_all / n FROM tot))) FROM grp)
          AS ssb,
        (SELECT sum(szz - sz * sz / ni) FROM grp) AS ssw
    )
    SELECT (SELECT k FROM tot) AS k_groups,
           (SELECT n FROM tot) AS n_values,
           floor(((SELECT n FROM tot) - (SELECT k FROM tot))
                 / ((SELECT k FROM tot) - 1.0)
                 * ssb / ssw * 1e6 + 0.5) / 1e6 AS bf_stat_q
    FROM parts
    """,
)
def brown_forsythe_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across event types:
    the ANOVA F applied to |x − group MEDIAN| — the robust Levene
    variant that anova_f_event_types (means) and welch_ttest
    (two groups) both presuppose but never check. Group medians are
    the exact LOWER median ((n+1)//2-th order statistic, identical
    both engines regardless of tie order: the value at that rank is
    unique); everything after is two hash aggregates of power sums."""
    e = T(spark, sf_dir, "events")
    vals = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("cents").asc(), F.col("event_id").asc()
    )
    wn = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        ranked.filter(
            F.col("rn") == F.greatest(F.lit(1), F.expr("(n + 1) div 2"))
        )
        .groupBy("event_type")
        .agg(F.max("cents").alias("median_lo"))
    )
    z = vals.join(med, "event_type").select(
        "event_type",
        F.abs(F.col("cents") - F.col("median_lo")).cast("double").alias("z"),
    )
    grp = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    ).persist()
    tot = grp.agg(
        F.sum("ni").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sz").alias("sz_all"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    dev = F.col("sz") / F.col("ni") - F.col("sz_all") / F.col("n")
    parts = j.groupBy("n", "k").agg(
        F.sum(F.col("ni") * dev * dev).alias("ssb"),
        F.sum(F.col("szz") - F.col("sz") * F.col("sz") / F.col("ni")).alias(
            "ssw"
        ),
    )
    stat = (
        (F.col("n") - F.col("k"))
        / (F.col("k") - 1.0)
        * F.col("ssb")
        / F.col("ssw")
    )
    return parts.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_values"),
        (F.floor(stat * 1e6 + 0.5) / 1e6).alias("bf_stat_q"),
    )


@_staged(
    "cronbach_alpha_users",
    """
    WITH items AS (
      SELECT user_id, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS wd,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT u.user_id, w.wd, coalesce(i.x, 0.0) AS x
      FROM (SELECT DISTINCT user_id FROM items) u
      CROSS JOIN (SELECT unnest(range(1, 8)) AS wd) w
      LEFT JOIN items i ON i.user_id = u.user_id AND i.wd = w.wd
    ),
    item_var AS (
      SELECT wd,
             sum(x * x) / count(*) - (sum(x) / count(*)) * (sum(x) / count(*))
               AS v
      FROM grid GROUP BY 1
    ),
    totals AS (
      SELECT user_id, sum(x) AS tot FROM grid GROUP BY 1
    ),
    tot_var AS (
      SELECT sum(tot * tot) / count(*)
               - (sum(tot) / count(*)) * (sum(tot) / count(*)) AS vt,
             CAST(count(*) AS BIGINT) AS n_users
      FROM totals
    )
    SELECT (SELECT n_users FROM tot_var) AS n_users,
           CAST(7 AS BIGINT) AS k_items,
           floor((SELECT sum(v) FROM item_var) * 1e2 + 0.5) / 1e2
             AS sum_item_var_q,
           floor((SELECT vt FROM tot_var) * 1e2 + 0.5) / 1e2 AS total_var_q,
           floor((7.0 / 6.0)
                 * (1.0 - (SELECT sum(v) FROM item_var)
                          / (SELECT vt FROM tot_var)) * 1e6 + 0.5) / 1e6
             AS cronbach_alpha_q
    """,
)
def cronbach_alpha_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α treating each user's seven weekday spend totals
    as a 7-item scale: α = k/(k−1)·(1 − Σσ²ᵢ/σ²ₜ) — the internal-
    consistency coefficient (psychometrics' workhorse) asking
    whether weekday spends measure one underlying 'spend propensity'
    trait. Missing (user, weekday) cells are zero-filled on an
    explicit user×7 grid so both engines see the identical design
    matrix. Population variances from power sums; one grid fan-out,
    three aggregates."""
    e = T(spark, sf_dir, "events")
    items = e.groupBy(
        "user_id",
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("wd"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("double")
        .alias("x")
    )
    users = items.select("user_id").distinct()
    wds = items.sparkSession.range(1, 8).select(F.col("id").alias("wd"))
    grid = (
        users.crossJoin(F.broadcast(wds))
        .join(items, ["user_id", "wd"], "left")
        .select("user_id", "wd", F.coalesce(F.col("x"), F.lit(0.0)).alias("x"))
        .persist()
    )
    item_var = grid.groupBy("wd").agg(
        (
            F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))
            - (F.sum("x") / F.count(F.lit(1)))
            * (F.sum("x") / F.count(F.lit(1)))
        ).alias("v")
    )
    totals = grid.groupBy("user_id").agg(F.sum("x").alias("tot"))
    tot_var = totals.agg(
        (
            F.sum(F.col("tot") * F.col("tot")) / F.count(F.lit(1))
            - (F.sum("tot") / F.count(F.lit(1)))
            * (F.sum("tot") / F.count(F.lit(1)))
        ).alias("vt"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    sv = item_var.agg(F.sum("v").alias("sum_v"))
    return (
        tot_var.crossJoin(F.broadcast(sv))
        .select(
            "n_users",
            F.lit(7).cast("long").alias("k_items"),
            (F.floor(F.col("sum_v") * 1e2 + 0.5) / 1e2).alias("sum_item_var_q"),
            (F.floor(F.col("vt") * 1e2 + 0.5) / 1e2).alias("total_var_q"),
            (
                F.floor(
                    (7.0 / 6.0) * (1.0 - F.col("sum_v") / F.col("vt")) * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("cronbach_alpha_q"),
        )
    )


@_staged(
    "chain_ladder_orders",
    """
    WITH span AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo FROM orders),
    cells AS (
      SELECT CAST(date_diff('month', (SELECT lo FROM span),
                            CAST(o_orderdate AS DATE)) AS BIGINT) // 3
               AS origin_q,
             CAST(o_orderkey % 4 AS BIGINT) AS lag,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS paid
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT a.origin_q, a.lag,
             CAST(sum(b.paid) AS BIGINT) AS cum_paid
      FROM cells a JOIN cells b
        ON b.origin_q = a.origin_q AND b.lag <= a.lag
      GROUP BY 1, 2
    ),
    maxlag AS (SELECT max(lag) AS ml, max(origin_q) AS mo FROM cells),
    known AS (
      SELECT * FROM cum
      WHERE origin_q + lag <= (SELECT mo FROM maxlag)
    ),
    factors AS (
      SELECT a.lag AS from_lag,
             sum(CAST(b.cum_paid AS DOUBLE)) / sum(a.cum_paid) AS f
      FROM known a JOIN known b
        ON b.origin_q = a.origin_q AND b.lag = a.lag + 1
      GROUP BY 1
    )
    SELECT from_lag,
           CAST(from_lag + 1 AS BIGINT) AS to_lag,
           floor(f * 1e6 + 0.5) / 1e6 AS dev_factor_q
    FROM factors
    ORDER BY from_lag
    """,
)
def chain_ladder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder loss development (the actuarial reserving
    standard): orders fold into an (origin quarter × development
    lag) run-off triangle of cumulative paid cents, the UPPER
    triangle (origin + lag ≤ latest diagonal — what an insurer has
    actually observed) estimates volume-weighted development
    factors f_lag = Σ C_{i,lag+1} / Σ C_{i,lag}. The insurance
    domain's core recursion, expressed as two equi-joins over the
    quarters×lags cell frame — never row data. Exact integer
    cumulative cells; factors are the only floats."""
    o = T(spark, sf_dir, "orders")
    lo = o.agg(F.min(F.to_date("o_orderdate")).alias("lo")).first()["lo"]
    cells = o.groupBy(
        (
            F.floor(
                F.months_between(
                    F.to_date("o_orderdate"), F.lit(str(lo)).cast("date")
                )
            ).cast("long")
            / 3
        )
        .cast("long")
        .alias("origin_q"),
        (F.col("o_orderkey") % 4).cast("long").alias("lag"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("paid")
    ).persist()
    b = cells.select(
        F.col("origin_q").alias("oq"), F.col("lag").alias("bl"),
        F.col("paid").alias("bp"),
    )
    cum = (
        cells.join(
            b, (F.col("oq") == F.col("origin_q")) & (F.col("bl") <= F.col("lag"))
        )
        .groupBy("origin_q", "lag")
        .agg(F.sum("bp").cast("long").alias("cum_paid"))
    )
    mx = cells.agg(F.max("origin_q").alias("mo")).first()["mo"]
    known = cum.filter(F.col("origin_q") + F.col("lag") <= mx).persist()
    nxt = known.select(
        F.col("origin_q").alias("noq"),
        F.col("lag").alias("nl"),
        F.col("cum_paid").alias("ncum"),
    )
    factors = (
        known.join(
            nxt,
            (F.col("noq") == F.col("origin_q"))
            & (F.col("nl") == F.col("lag") + 1),
        )
        .groupBy(F.col("lag").alias("from_lag"))
        .agg(
            (F.sum(F.col("ncum").cast("double")) / F.sum("cum_paid")).alias("f")
        )
    )
    return factors.select(
        "from_lag",
        (F.col("from_lag") + 1).cast("long").alias("to_lag"),
        (F.floor(F.col("f") * 1e6 + 0.5) / 1e6).alias("dev_factor_q"),
    ).orderBy("from_lag")


@_staged(
    "eoq_parts",
    """
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS annual_d,
             avg(p.p_retailprice) AS avg_price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    )
    SELECT brand, annual_d,
           floor(sqrt(2.0 * annual_d * 100.0 / (0.2 * avg_price)) * 1e4 + 0.5)
             / 1e4 AS eoq_units_q,
           floor(annual_d / sqrt(2.0 * annual_d * 100.0 / (0.2 * avg_price))
                 * 1e4 + 0.5) / 1e4 AS orders_per_period_q,
           floor(sqrt(2.0 * annual_d * 100.0 * (0.2 * avg_price)) * 1e2 + 0.5)
             / 1e2 AS total_cost_q
    FROM demand
    ORDER BY brand
    """,
)
def eoq_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand (Harris-Wilson square-root
    law): EOQ = √(2DK/h) with D the observed period demand, K=$100
    fixed order cost, h = 20% of average retail price as annual
    holding cost — plus the implied order cadence and the classic
    total-cost-at-optimum √(2DKh). The inventory-theory prescription
    layer on top of croston_demand_parts' forecast and abc_xyz's
    segmentation. One join + one aggregate per brand."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    demand = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_retailprice")),
            p.p_partkey == li.l_partkey,
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias(
                "annual_d"
            ),
            F.avg("p_retailprice").alias("avg_price"),
        )
    )
    h = 0.2 * F.col("avg_price")
    eoq = F.sqrt(2.0 * F.col("annual_d") * 100.0 / h)
    return demand.select(
        "brand",
        "annual_d",
        (F.floor(eoq * 1e4 + 0.5) / 1e4).alias("eoq_units_q"),
        (F.floor(F.col("annual_d") / eoq * 1e4 + 0.5) / 1e4).alias(
            "orders_per_period_q"
        ),
        (
            F.floor(F.sqrt(2.0 * F.col("annual_d") * 100.0 * h) * 1e2 + 0.5)
            / 1e2
        ).alias("total_cost_q"),
    ).orderBy("brand")


@_staged(
    "deff_customer_acctbal",
    """
    WITH y AS (
      SELECT c_nationkey AS cl, c_acctbal AS y FROM customer
    ),
    grp AS (
      SELECT cl, CAST(count(*) AS BIGINT) AS m, sum(y) AS sy,
             sum(y * y) AS syy
      FROM y GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(m) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(sy) AS sy_all, sum(syy) AS syy_all
      FROM grp
    ),
    comp AS (
      SELECT (SELECT n FROM tot) AS n, (SELECT k FROM tot) AS k,
             (SELECT sum(m * (sy / m - (SELECT sy_all / n FROM tot))
                            * (sy / m - (SELECT sy_all / n FROM tot)))
              FROM grp) AS ssb,
             (SELECT sum(syy - sy * sy / m) FROM grp) AS ssw,
             (SELECT CAST(n AS DOUBLE) / k FROM tot) AS mbar
    ),
    vars AS (
      SELECT n, k, mbar,
             ssw / (n - k) AS msw,
             ssb / (k - 1) AS msb
      FROM comp
    )
    SELECT n AS n_customers, k AS n_clusters,
           floor(mbar * 1e4 + 0.5) / 1e4 AS avg_cluster_q,
           floor((msb - msw) / (msb + (mbar - 1) * msw) * 1e6 + 0.5) / 1e6
             AS icc_q,
           floor((1.0 + (mbar - 1)
                  * ((msb - msw) / (msb + (mbar - 1) * msw)))
                 * 1e6 + 0.5) / 1e6 AS deff_q
    FROM vars
    """,
)
def deff_customer_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey design effect for nation-clustered sampling of account
    balances: the ANOVA-components intraclass correlation ICC =
    (MSB−MSW)/(MSB+(m̄−1)MSW) and Kish's DEFF = 1+(m̄−1)·ICC — how
    much a nation-clustered sample inflates variance vs simple
    random sampling, i.e. the effective-sample-size discount every
    clustered pipeline measurement silently pays. Two power-sum
    aggregates; all ratios derived from the (cluster, sums) frame."""
    c = T(spark, sf_dir, "customer")
    y = c.select(F.col("c_nationkey").alias("cl"), F.col("c_acctbal").alias("y"))
    grp = y.groupBy("cl").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).persist()
    tot = grp.agg(
        F.sum("m").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sy").alias("sy_all"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    dev = F.col("sy") / F.col("m") - F.col("sy_all") / F.col("n")
    comp = j.groupBy("n", "k").agg(
        F.sum(F.col("m") * dev * dev).alias("ssb"),
        F.sum(F.col("syy") - F.col("sy") * F.col("sy") / F.col("m")).alias(
            "ssw"
        ),
    )
    mbar = F.col("n").cast("double") / F.col("k")
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    msb = F.col("ssb") / (F.col("k") - 1)
    icc = (msb - msw) / (msb + (mbar - 1) * msw)
    return comp.select(
        F.col("n").alias("n_customers"),
        F.col("k").alias("n_clusters"),
        (F.floor(mbar * 1e4 + 0.5) / 1e4).alias("avg_cluster_q"),
        (F.floor(icc * 1e6 + 0.5) / 1e6).alias("icc_q"),
        (F.floor((1.0 + (mbar - 1) * icc) * 1e6 + 0.5) / 1e6).alias("deff_q"),
    )


@_staged(
    "dfg_conformance_events",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS k
      FROM events
    ),
    trans AS (
      SELECT a.event_type AS src, b.event_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM seq a JOIN seq b
        ON b.user_id = a.user_id AND b.k = a.k + 1
      GROUP BY 1, 2
    ),
    model AS (
      SELECT * FROM (VALUES
        ('signup', 'view'), ('view', 'view'), ('view', 'click'),
        ('click', 'view'), ('click', 'purchase'), ('purchase', 'view'),
        ('view', 'error'), ('error', 'view')
      ) AS m(src, dst)
    ),
    marked AS (
      SELECT t.src, t.dst, t.n,
             CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END AS allowed
      FROM trans t LEFT JOIN model m ON m.src = t.src AND m.dst = t.dst
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS all_n,
             CAST(sum(CASE WHEN allowed = 1 THEN n ELSE 0 END) AS BIGINT)
               AS ok_n
      FROM marked
    )
    SELECT m.src, m.dst, m.n,
           CAST(m.allowed AS BIGINT) AS allowed,
           floor((SELECT CAST(ok_n AS DOUBLE) / all_n FROM tot) * 1e6 + 0.5)
             / 1e6 AS fitness_q
    FROM marked m
    WHERE m.allowed = 0
    ORDER BY m.n DESC, m.src, m.dst
    LIMIT 10
    """,
)
def dfg_conformance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance checking: the observed
    directly-follows graph against a DECLARED process model (the
    allowed-edge list of the signup→view→click→purchase journey,
    with error-recovery loops) — trace fitness = conforming
    transition mass, plus the top deviating edges by frequency,
    which is exactly the artifact a process-mining review writes up
    (event_transition_matrix describes; this JUDGES against spec).
    The model is an 8-row broadcast literal; conformance is one
    left join over the types² DFG frame."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "k", F.row_number().over(w)
    )
    a = seq.select("user_id", F.col("event_type").alias("src"),
                   F.col("k").alias("ka"))
    b = seq.select("user_id", F.col("event_type").alias("dst"),
                   F.col("k").alias("kb"))
    trans = (
        a.join(b, "user_id")
        .filter(F.col("kb") == F.col("ka") + 1)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    model = spark.createDataFrame(
        [
            ("signup", "view"), ("view", "view"), ("view", "click"),
            ("click", "view"), ("click", "purchase"), ("purchase", "view"),
            ("view", "error"), ("error", "view"),
        ],
        "msrc string, mdst string",
    )
    marked = trans.join(
        F.broadcast(model),
        (F.col("msrc") == F.col("src")) & (F.col("mdst") == F.col("dst")),
        "left",
    ).select(
        "src",
        "dst",
        "n",
        F.when(F.col("msrc").isNotNull(), 1).otherwise(0).alias("allowed"),
    ).persist()
    tot = marked.agg(
        (
            F.sum(F.when(F.col("allowed") == 1, F.col("n")).otherwise(0))
            .cast("double")
            / F.sum("n")
        ).alias("fitness")
    )
    return (
        marked.filter(F.col("allowed") == 0)
        .crossJoin(F.broadcast(tot))
        .select(
            "src",
            "dst",
            "n",
            F.col("allowed").cast("long").alias("allowed"),
            (F.floor(F.col("fitness") * 1e6 + 0.5) / 1e6).alias("fitness_q"),
        )
        .orderBy(F.desc("n"), F.asc("src"), F.asc("dst"))
        .limit(10)
    )


@_staged(
    "anova_two_way_events",
    """
    WITH obs AS (
      SELECT event_type AS a, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS b,
             CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2, 3
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS nc, sum(x) AS sx,
             sum(x * x) AS sxx
      FROM obs GROUP BY 1, 2
    ),
    am AS (SELECT a, sum(sx) AS s, CAST(sum(nc) AS BIGINT) AS n FROM cells GROUP BY 1),
    bm AS (SELECT b, sum(sx) AS s, CAST(sum(nc) AS BIGINT) AS n FROM cells GROUP BY 1),
    g AS (
      SELECT sum(sx) AS s, CAST(sum(nc) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM cells
    ),
    ss AS (
      SELECT
        (SELECT sum(s * s / n) FROM am) - (SELECT s * s / n FROM g) AS ss_a,
        (SELECT sum(s * s / n) FROM bm) - (SELECT s * s / n FROM g) AS ss_b,
        (SELECT sum(sx * sx / nc) FROM cells)
          - (SELECT sum(s * s / n) FROM am)
          - (SELECT sum(s * s / n) FROM bm)
          + (SELECT s * s / n FROM g) AS ss_ab,
        (SELECT sum(sxx) FROM cells)
          - (SELECT sum(sx * sx / nc) FROM cells) AS ss_w,
        (SELECT CAST(count(*) AS BIGINT) FROM am) AS ka,
        (SELECT CAST(count(*) AS BIGINT) FROM bm) AS kb,
        (SELECT n FROM g) AS n,
        (SELECT n_cells FROM g) AS n_cells
    )
    SELECT ka AS k_types, kb AS k_weekdays, n AS n_obs,
           floor(ss_a / (ka - 1) / (ss_w / (n - n_cells)) * 1e6 + 0.5) / 1e6
             AS f_type_q,
           floor(ss_b / (kb - 1) / (ss_w / (n - n_cells)) * 1e6 + 0.5) / 1e6
             AS f_weekday_q,
           floor(ss_ab / ((ka - 1) * (kb - 1)) / (ss_w / (n - n_cells))
                 * 1e6 + 0.5) / 1e6 AS f_interaction_q
    FROM ss
    """,
)
def anova_two_way_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA with interaction on daily counts: factors =
    event type × ISO weekday, observations = (type, weekday, day)
    cells — F for each main effect AND for the type×weekday
    INTERACTION, the question one-way ANOVA (anova_f_event_types)
    and the marginal seasonality queries cannot ask: does the weekly
    shape itself DIFFER by stream? Weighted (cell-mean) sums of
    squares from power sums — three bounded-frame aggregates, exact
    until the final ratios."""
    e = T(spark, sf_dir, "events")
    obs = e.groupBy(
        F.col("event_type").alias("a"),
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("b"),
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    cells = obs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).persist()
    am = cells.groupBy("a").agg(
        F.sum("sx").alias("s"), F.sum("nc").cast("long").alias("n")
    )
    bm = cells.groupBy("b").agg(
        F.sum("sx").alias("s"), F.sum("nc").cast("long").alias("n")
    )
    g = cells.agg(
        F.sum("sx").alias("s"),
        F.sum("nc").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    ).first()
    sa = am.agg(
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("v"),
        F.count(F.lit(1)).cast("long").alias("ka"),
    ).first()
    sb = bm.agg(
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("v"),
        F.count(F.lit(1)).cast("long").alias("kb"),
    ).first()
    sc = cells.agg(
        F.sum(F.col("sx") * F.col("sx") / F.col("nc")).alias("v"),
        F.sum("sxx").alias("sxx"),
    ).first()
    corr = g["s"] * g["s"] / g["n"]
    ss_a = sa["v"] - corr
    ss_b = sb["v"] - corr
    ss_ab = sc["v"] - sa["v"] - sb["v"] + corr
    ss_w = sc["sxx"] - sc["v"]
    ka, kb, n, n_cells = sa["ka"], sb["kb"], g["n"], g["n_cells"]
    msw = ss_w / (n - n_cells)
    import math

    return e.sparkSession.createDataFrame(
        [
            (
                ka,
                kb,
                n,
                math.floor(ss_a / (ka - 1) / msw * 1e6 + 0.5) / 1e6,
                math.floor(ss_b / (kb - 1) / msw * 1e6 + 0.5) / 1e6,
                math.floor(
                    ss_ab / ((ka - 1) * (kb - 1)) / msw * 1e6 + 0.5
                )
                / 1e6,
            )
        ],
        "k_types long, k_weekdays long, n_obs long, "
        "f_type_q double, f_weekday_q double, f_interaction_q double",
    )


@_staged(
    "ar1_backtest_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    split AS (
      SELECT min(day) + CAST(date_diff('day', min(day), max(day)) * 2 // 3
                             AS INTEGER) AS cut
      FROM daily
    ),
    train AS (
      SELECT * FROM daily WHERE day < (SELECT cut FROM split)
    ),
    pairs AS (
      SELECT a.event_type, a.cents AS x, b.cents AS y
      FROM train a JOIN train b
        ON b.event_type = a.event_type
       AND b.day = a.day + CAST(1 AS INTEGER)
    ),
    fit AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             sum(CAST(x AS DOUBLE)) AS sx, sum(CAST(y AS DOUBLE)) AS sy,
             sum(CAST(x AS DOUBLE) * y) AS sxy,
             sum(CAST(x AS DOUBLE) * x) AS sxx
      FROM pairs GROUP BY 1
    ),
    params AS (
      SELECT event_type,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS phi,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS c
      FROM fit
    ),
    test_pairs AS (
      SELECT a.event_type, a.cents AS x, b.cents AS y
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type
       AND b.day = a.day + CAST(1 AS INTEGER)
      WHERE b.day >= (SELECT cut FROM split)
    )
    SELECT t.event_type,
           CAST(count(*) AS BIGINT) AS n_test,
           floor(p.phi * 1e6 + 0.5) / 1e6 AS phi_q,
           floor(avg(abs(t.y - (p.c + p.phi * t.x))) * 1e2 + 0.5) / 1e2
             AS mae_ar1_q,
           floor(avg(abs(CAST(t.y AS DOUBLE) - t.x)) * 1e2 + 0.5) / 1e2
             AS mae_naive_q
    FROM test_pairs t JOIN params p ON p.event_type = t.event_type
    GROUP BY t.event_type, p.phi
    ORDER BY t.event_type
    """,
)
def ar1_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) fit-and-backtest per event stream: conditional least
    squares on the first 2/3 of days (equivalent to regressing x_t
    on x_{t−1} — the Yule-Walker/OLS estimate), then one-step-ahead
    MAE on the held-out tail vs the naive carry-forward — the
    model-based membership of the forecasting bench
    (seasonal-naive/Holt/Theta are smoothers; this is the ARMA
    family's entry point, and phi ≈ pacf1 by construction closes
    the loop with pacf_daily_events). Lag pairs are calendar
    equi-joins; everything else is sufficient stats."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    ).persist()
    span = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).first()
    import datetime as _dt

    cut = span["lo"] + _dt.timedelta(
        days=(span["hi"] - span["lo"]).days * 2 // 3
    )
    cut_lit = F.lit(str(cut)).cast("date")
    train = daily.filter(F.col("day") < cut_lit)
    nxt = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("nd"),
        F.col("cents").alias("y"),
    )
    pairs = train.join(
        nxt,
        (F.col("et") == F.col("event_type"))
        & (F.col("nd") == F.date_add(F.col("day"), 1))
        & (F.col("nd") < cut_lit),
    ).select("event_type", F.col("cents").alias("x"), "y")
    fit = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("double")).alias("sx"),
        F.sum(F.col("y").cast("double")).alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
    )
    phi = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    params = fit.select(
        "event_type",
        phi.alias("phi"),
        ((F.col("sy") - phi * F.col("sx")) / F.col("n")).alias("c"),
    )
    test_pairs = daily.join(
        nxt,
        (F.col("et") == F.col("event_type"))
        & (F.col("nd") == F.date_add(F.col("day"), 1))
        & (F.col("nd") >= cut_lit),
    ).select("event_type", F.col("cents").alias("x"), "y")
    j = test_pairs.join(params, "event_type")
    return (
        j.groupBy("event_type", "phi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            (
                F.floor(
                    F.avg(
                        F.abs(
                            F.col("y") - (F.col("c") + F.col("phi") * F.col("x"))
                        )
                    )
                    * 1e2
                    + 0.5
                )
                / 1e2
            ).alias("mae_ar1_q"),
            (
                F.floor(
                    F.avg(F.abs(F.col("y").cast("double") - F.col("x"))) * 1e2
                    + 0.5
                )
                / 1e2
            ).alias("mae_naive_q"),
        )
        .select(
            "event_type",
            "n_test",
            (F.floor(F.col("phi") * 1e6 + 0.5) / 1e6).alias("phi_q"),
            "mae_ar1_q",
            "mae_naive_q",
        )
        .orderBy("event_type")
    )


@_staged(
    "randomized_response_users",
    """
    WITH truth AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS attr
      FROM events GROUP BY 1
    ),
    reports AS (
      SELECT user_id, attr,
             CASE WHEN (user_id * 2654435761) % 100 < 25
                  THEN 1 - attr ELSE attr END AS report
      FROM truth
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(report AS DOUBLE)) / count(*) AS lam,
             sum(CAST(attr AS DOUBLE)) / count(*) AS true_p
      FROM reports
    )
    SELECT n AS n_users,
           floor(lam * 1e6 + 0.5) / 1e6 AS reported_rate_q,
           floor((lam - 0.25) / 0.5 * 1e6 + 0.5) / 1e6 AS estimated_p_q,
           floor(true_p * 1e6 + 0.5) / 1e6 AS true_p_q,
           floor(abs((lam - 0.25) / 0.5 - true_p) * 1e6 + 0.5) / 1e6
             AS abs_err_q
    FROM agg
    """,
)
def randomized_response_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response — the original local-DP mechanism:
    each user's sensitive bit (did they ever purchase) is flipped
    with probability 1/4 (deterministically simulated by a Knuth-
    hash coin so both engines replay the same noise), and the
    analyst recovers the population rate via the unbiased
    de-randomizer p̂ = (λ − q)/(1 − 2q), q=0.25 — reported next to
    the ground truth so the estimator's error is visible. The
    mechanism side of the privacy family (dp_noisy_counts adds
    central noise; k-anonymity/l-diversity audit releases; this is
    the LOCAL collection protocol). Two aggregates over the user
    frame."""
    e = T(spark, sf_dir, "events")
    truth = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("attr")
    )
    flip = (F.col("user_id") * 2654435761) % 100 < 25
    reports = truth.select(
        "attr",
        F.when(flip, 1 - F.col("attr")).otherwise(F.col("attr")).alias(
            "report"
        ),
    )
    agg = reports.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(F.col("report").cast("double")) / F.count(F.lit(1))).alias(
            "lam"
        ),
        (F.sum(F.col("attr").cast("double")) / F.count(F.lit(1))).alias(
            "true_p"
        ),
    )
    est = (F.col("lam") - 0.25) / 0.5
    return agg.select(
        F.col("n").alias("n_users"),
        (F.floor(F.col("lam") * 1e6 + 0.5) / 1e6).alias("reported_rate_q"),
        (F.floor(est * 1e6 + 0.5) / 1e6).alias("estimated_p_q"),
        (F.floor(F.col("true_p") * 1e6 + 0.5) / 1e6).alias("true_p_q"),
        (F.floor(F.abs(est - F.col("true_p")) * 1e6 + 0.5) / 1e6).alias(
            "abs_err_q"
        ),
    )


def _median_polish_oracle_sql(rounds: int = 3) -> str:
    """Unrolled Tukey median polish on the (event_type x weekday)
    count table: each round subtracts exact row medians then exact
    column medians from the residuals (odd-width axes -> the middle
    order statistic, deterministic under ties). Residuals stay
    BIGINT throughout — no float enters until display."""
    steps = []
    prev = "r0"
    for i in range(1, rounds + 1):
        steps.append(
            f"""rm{i} AS (
      SELECT a, median_lo AS m FROM (
        SELECT a, x AS median_lo,
               row_number() OVER (PARTITION BY a ORDER BY x ASC, b ASC) AS rn,
               count(*) OVER (PARTITION BY a) AS cnt
        FROM {prev}
      ) WHERE rn = (cnt + 1) // 2),
    rr{i} AS (
      SELECT p.a, p.b, CAST(p.x - m.m AS BIGINT) AS x
      FROM {prev} p JOIN rm{i} m ON m.a = p.a),
    cm{i} AS (
      SELECT b, median_lo AS m FROM (
        SELECT b, x AS median_lo,
               row_number() OVER (PARTITION BY b ORDER BY x ASC, a ASC) AS rn,
               count(*) OVER (PARTITION BY b) AS cnt
        FROM rr{i}
      ) WHERE rn = (cnt + 1) // 2),
    r{i} AS (
      SELECT p.a, p.b, CAST(p.x - m.m AS BIGINT) AS x
      FROM rr{i} p JOIN cm{i} m ON m.b = p.b)"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH cells AS (
      SELECT event_type AS a, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    r0 AS (SELECT a, b, n AS x FROM cells),
    {chain}
    SELECT c.a AS event_type, c.b AS wd, c.n AS count,
           f.x AS residual
    FROM cells c JOIN {prev} f ON f.a = c.a AND f.b = c.b
    ORDER BY event_type, wd
    """


@_staged("median_polish_events", _median_polish_oracle_sql())
def median_polish_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the (event type x ISO weekday) count
    table, 3 rounds — the ROBUST two-way decomposition next to
    anova_two_way_events (ANOVA's cell means follow every outlier;
    the polish's medians shrug them off, and what's LEFT is the
    residual an anomaly hunter reads). With 5x7 odd axes every
    median is the exact middle order statistic, so residuals stay
    exact BIGINT through all rounds — the rare iterative operator
    with zero float risk. Spark folds the same rounds over the
    35-row cell frame with per-round lineage truncation."""
    e = T(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("event_type").alias("a"),
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n")).persist()
    r = cells.select("a", "b", F.col("n").alias("x"))
    for _ in range(3):
        for axis, other in (("a", "b"), ("b", "a")):
            wrank = Window.partitionBy(axis).orderBy(
                F.col("x").asc(), F.col(other).asc()
            )
            wcnt = Window.partitionBy(axis)
            med = (
                r.select(
                    axis,
                    "x",
                    F.row_number().over(wrank).alias("rn"),
                    F.count(F.lit(1)).over(wcnt).alias("cnt"),
                )
                .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
                .select(F.col(axis).alias("_k"), F.col("x").alias("m"))
            )
            r = (
                r.join(med, r[axis] == med["_k"])
                .select("a", "b", (F.col("x") - F.col("m")).cast("long").alias("x"))
                .localCheckpoint(eager=True)
            )
    return (
        cells.join(r, ["a", "b"])
        .select(
            F.col("a").alias("event_type"),
            F.col("b").alias("wd"),
            F.col("n").alias("count"),
            F.col("x").alias("residual"),
        )
        .orderBy("event_type", "wd")
    )


@_staged(
    "cumulative_incidence_events",
    """
    WITH signup AS (
      SELECT user_id, min(ts) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    nxt AS (
      SELECT s.user_id,
             min(e.ts) AS t1
      FROM signup s JOIN events e
        ON e.user_id = s.user_id AND e.ts > s.t0
       AND e.event_type IN ('purchase', 'error')
      GROUP BY 1
    ),
    typed AS (
      SELECT n.user_id,
             CAST(date_diff('day', CAST(s.t0 AS DATE), CAST(n.t1 AS DATE))
                  AS BIGINT) AS t,
             min_by(e.event_type, e.event_id) AS cause
      FROM nxt n
      JOIN signup s ON s.user_id = n.user_id
      JOIN events e ON e.user_id = n.user_id AND e.ts = n.t1
                   AND e.event_type IN ('purchase', 'error')
      GROUP BY 1, 2
    ),
    risk AS (
      SELECT t,
             CAST(sum(CASE WHEN cause = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d_p,
             CAST(sum(CASE WHEN cause = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d_e,
             CAST(count(*) AS BIGINT) AS d_all
      FROM typed GROUP BY 1
    ),
    atrisk AS (
      SELECT r.t, r.d_p, r.d_e, r.d_all,
             (SELECT sum(r2.d_all) FROM risk r2 WHERE r2.t >= r.t) AS n_at
      FROM risk r
    ),
    surv AS (
      SELECT a.t, a.d_p, a.d_e, a.d_all, a.n_at,
             coalesce((SELECT exp(sum(ln(1.0 - CAST(a2.d_all AS DOUBLE)
                                             / a2.n_at)))
                       FROM atrisk a2
                       WHERE a2.t < a.t AND a2.n_at > a2.d_all), 1.0)
               AS s_minus
      FROM atrisk a
    ),
    cif AS (
      SELECT s.t,
             (SELECT sum(s2.s_minus * s2.d_p / s2.n_at) FROM surv s2
              WHERE s2.t <= s.t) AS cif_purchase,
             (SELECT sum(s2.s_minus * s2.d_e / s2.n_at) FROM surv s2
              WHERE s2.t <= s.t) AS cif_error
      FROM surv s
    )
    SELECT s.t AS day_gap, s.d_p AS d_purchase, s.d_e AS d_error,
           CAST(s.n_at AS BIGINT) AS n_at_risk,
           floor(c.cif_purchase * 1e6 + 0.5) / 1e6 AS cif_purchase_q,
           floor(c.cif_error * 1e6 + 0.5) / 1e6 AS cif_error_q
    FROM surv s JOIN cif c ON c.t = s.t
    ORDER BY day_gap
    """,
)
def cumulative_incidence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competing-risks cumulative incidence (Aalen-Johansen): after
    signup, a user's FIRST subsequent purchase or error is the event
    — two causes competing for the same subject, where naive
    per-cause KM curves overstate both (they treat the rival cause
    as censoring). CIF_k(t) = Σ_{s≤t} S(s⁻)·d_ks/n_s with S the
    all-cause survival — the decomposition that answers "by day t,
    what fraction converted vs broke". Ties at the first event
    timestamp resolve by (ts, event_id) min_by. Same calendar-
    bounded risk-frame folds as the KM family."""
    e = T(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    causes = e.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    j = causes.join(signup, "user_id").filter(F.col("ts") > F.col("t0"))
    typed = j.groupBy("user_id").agg(
        F.min("ts").alias("t1"),
        F.min("t0").alias("t0"),
        F.min_by("event_type", F.struct("ts", "event_id")).alias("cause"),
    ).select(
        F.datediff(F.to_date("t1"), F.to_date("t0")).cast("long").alias("t"),
        "cause",
    )
    risk = typed.groupBy("t").agg(
        F.sum((F.col("cause") == "purchase").cast("int"))
        .cast("long")
        .alias("d_p"),
        F.sum((F.col("cause") == "error").cast("int")).cast("long").alias(
            "d_e"
        ),
        F.count(F.lit(1)).cast("long").alias("d_all"),
    ).persist()
    r2 = risk.select(F.col("t").alias("t2"), F.col("d_all").alias("da2"))
    atrisk = (
        risk.join(F.broadcast(r2), F.col("t2") >= F.col("t"))
        .groupBy("t", "d_p", "d_e", "d_all")
        .agg(F.sum("da2").alias("n_at"))
        .persist()
    )
    a2 = atrisk.select(
        F.col("t").alias("t2"),
        F.col("d_all").alias("da2"),
        F.col("n_at").alias("na2"),
    )
    surv = (
        atrisk.join(
            F.broadcast(a2),
            (F.col("t2") < F.col("t")) & (F.col("na2") > F.col("da2")),
            "left",
        )
        .groupBy("t", "d_p", "d_e", "d_all", "n_at")
        .agg(
            F.coalesce(
                F.exp(
                    F.sum(
                        F.log(1.0 - F.col("da2").cast("double") / F.col("na2"))
                    )
                ),
                F.lit(1.0),
            ).alias("s_minus")
        )
        .persist()
    )
    s2 = surv.select(
        F.col("t").alias("t2"),
        (F.col("s_minus") * F.col("d_p") / F.col("n_at")).alias("inc_p"),
        (F.col("s_minus") * F.col("d_e") / F.col("n_at")).alias("inc_e"),
    )
    cif = (
        surv.join(F.broadcast(s2), F.col("t2") <= F.col("t"))
        .groupBy("t", "d_p", "d_e", "n_at")
        .agg(
            F.sum("inc_p").alias("cif_p"),
            F.sum("inc_e").alias("cif_e"),
        )
    )
    return cif.select(
        F.col("t").alias("day_gap"),
        F.col("d_p").alias("d_purchase"),
        F.col("d_e").alias("d_error"),
        F.col("n_at").cast("long").alias("n_at_risk"),
        (F.floor(F.col("cif_p") * 1e6 + 0.5) / 1e6).alias("cif_purchase_q"),
        (F.floor(F.col("cif_e") * 1e6 + 0.5) / 1e6).alias("cif_error_q"),
    ).orderBy("day_gap")


@_staged(
    "g_test_weekday_events",
    """
    WITH cells AS (
      SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS wd,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM cells GROUP BY 1
    )
    SELECT c.event_type, t.n AS n_events, t.k AS k_cells,
           floor(2.0 * sum(o * ln(CAST(o AS DOUBLE)
                                  / (CAST(t.n AS DOUBLE) / t.k)))
                 * 1e6 + 0.5) / 1e6 AS g_stat_q,
           CASE WHEN 2.0 * sum(o * ln(CAST(o AS DOUBLE)
                                      / (CAST(t.n AS DOUBLE) / t.k)))
                     > 12.591587243743977 THEN 'nonuniform'
                ELSE 'uniform_ok' END AS verdict
    FROM cells c JOIN tot t ON t.event_type = c.event_type
    GROUP BY c.event_type, t.n, t.k
    ORDER BY c.event_type
    """,
)
def g_test_weekday_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial G-test (likelihood-ratio goodness-of-fit) of each
    type's weekday distribution against uniformity: G = 2Σo·ln(o/e)
    vs the χ²(6) 95% critical value — the LR sibling of the Pearson
    family (benjamini_hochberg_cells scores per-cell deviations;
    this scores the whole 7-cell profile per type, and G is additive
    across partitions where Pearson's X² is not, which is why
    log-linear modelers prefer it). One aggregate over the types×7
    frame."""
    e = T(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("wd"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    j = cells.join(tot, "event_type")
    g = 2.0 * F.sum(
        F.col("o")
        * F.log(
            F.col("o").cast("double") / (F.col("n").cast("double") / F.col("k"))
        )
    )
    crit = 12.591587243743977
    return (
        j.groupBy("event_type", "n", "k")
        .agg(
            (F.floor(g * 1e6 + 0.5) / 1e6).alias("g_stat_q"),
            F.when(g > crit, F.lit("nonuniform"))
            .otherwise(F.lit("uniform_ok"))
            .alias("verdict"),
        )
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.col("k").alias("k_cells"),
            "g_stat_q",
            "verdict",
        )
        .orderBy("event_type")
    )


@_staged(
    "oc_curve_sampling",
    """
    WITH grid AS (
      SELECT p.p / 100.0 AS p FROM (SELECT unnest(range(1, 21)) AS p) p
    ),
    plan AS (
      SELECT p,
             power(1.0 - p, 48)
             * ((1.0 - p) * (1.0 - p) + 50.0 * p * (1.0 - p)
                + 1225.0 * p * p) AS p_accept
      FROM grid
    )
    SELECT CAST(round(p * 100) AS BIGINT) AS defect_pct,
           floor(p_accept * 1e6 + 0.5) / 1e6 AS p_accept_q,
           CASE WHEN p_accept >= 0.95 THEN 'producer_safe'
                WHEN p_accept <= 0.10 THEN 'consumer_safe'
                ELSE 'indifference' END AS region
    FROM plan ORDER BY defect_pct
    """,
)
def oc_curve_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-characteristic curve for the single acceptance-
    sampling plan n=50, c=2 (inspect 50 units, accept the lot on ≤2
    defects): P(accept | defect rate p) = Σ_{k≤2} C(50,k)p^k(1−p)^{50−k}
    expanded to the exact closed form (1−p)^48·((1−p)² + 50p(1−p) +
    1225p²), evaluated over a 1-20% defect grid with the classic
    producer's-risk (≥95% accept) and consumer's-risk (≤10% accept)
    regions marked — the QC-engineering lens on the binomial that
    wilson_ci_conversion uses for inference. Pure expression over a
    20-row literal axis."""
    p = F.col("p")
    grid = (
        T(spark, sf_dir, "region")
        .sparkSession.range(1, 21)
        .select((F.col("id") / 100.0).alias("p"))
    )
    pa = F.pow(1.0 - p, 48) * (
        (1.0 - p) * (1.0 - p) + 50.0 * p * (1.0 - p) + 1225.0 * p * p
    )
    return grid.select(
        F.round(p * 100).cast("long").alias("defect_pct"),
        (F.floor(pa * 1e6 + 0.5) / 1e6).alias("p_accept_q"),
        F.when(pa >= 0.95, F.lit("producer_safe"))
        .when(pa <= 0.10, F.lit("consumer_safe"))
        .otherwise(F.lit("indifference"))
        .alias("region"),
    ).orderBy("defect_pct")


@_staged(
    "yuen_trimmed_t_orders",
    """
    WITH scored AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                  ELSE 'other' END AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp
                                ORDER BY cents ASC, o_orderkey ASC) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM scored
    ),
    trimmed AS (
      SELECT grp, cents, n, CAST(n // 5 AS BIGINT) AS g
      FROM ranked
      WHERE rn > n // 5 AND rn <= n - n // 5
    ),
    wins AS (
      SELECT grp, CAST(max(n) AS BIGINT) AS n, CAST(max(g) AS BIGINT) AS g,
             CAST(count(*) AS BIGINT) AS h,
             sum(CAST(cents AS DOUBLE)) / count(*) AS tmean,
             sum(CAST(cents AS DOUBLE) * cents) / count(*)
               - (sum(CAST(cents AS DOUBLE)) / count(*))
                 * (sum(CAST(cents AS DOUBLE)) / count(*)) AS tvar
      FROM trimmed GROUP BY 1
    )
    SELECT u.h AS h_urgent, o.h AS h_other,
           floor(u.tmean * 1e2 + 0.5) / 1e2 AS tmean_urgent_q,
           floor(o.tmean * 1e2 + 0.5) / 1e2 AS tmean_other_q,
           floor((u.tmean - o.tmean)
                 / sqrt(u.tvar / u.h + o.tvar / o.h) * 1e6 + 0.5) / 1e6
             AS yuen_t_q,
           CASE WHEN abs((u.tmean - o.tmean)
                         / sqrt(u.tvar / u.h + o.tvar / o.h))
                     > 1.959963984540054 THEN 'different'
                ELSE 'comparable' END AS verdict
    FROM (SELECT * FROM wins WHERE grp = 'urgent') u
    CROSS JOIN (SELECT * FROM wins WHERE grp = 'other') o
    """,
)
def yuen_trimmed_t_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-mean t-test (20% symmetric trim) comparing
    urgent vs non-urgent order values — the robust location test
    between welch_ttest (means, outlier-hostage) and
    mann_whitney (ranks, loses the scale): trim each group's top and
    bottom fifth by exact partitioned ranks, compare trimmed means
    with the variance of what remains (the simplified
    equal-trim-fraction form, fully specified). Exact integer cents
    until the statistic."""
    o = T(spark, sf_dir, "orders")
    scored = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .otherwise("other")
        .alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    wr = Window.partitionBy("grp").orderBy(
        F.col("cents").asc(), F.col("o_orderkey").asc()
    )
    wn = Window.partitionBy("grp")
    ranked = scored.select(
        "grp",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    trimmed = ranked.filter(
        (F.col("rn") > F.expr("n div 5"))
        & (F.col("rn") <= F.col("n") - F.expr("n div 5"))
    )
    c = F.col("cents").cast("double")
    wins = trimmed.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("h"),
        (F.sum(c) / F.count(F.lit(1))).alias("tmean"),
        (
            F.sum(c * F.col("cents")) / F.count(F.lit(1))
            - (F.sum(c) / F.count(F.lit(1))) * (F.sum(c) / F.count(F.lit(1)))
        ).alias("tvar"),
    )
    u = wins.filter(F.col("grp") == "urgent").select(
        F.col("h").alias("hu"), F.col("tmean").alias("mu"),
        F.col("tvar").alias("vu"),
    )
    ot = wins.filter(F.col("grp") == "other").select(
        F.col("h").alias("ho"), F.col("tmean").alias("mo"),
        F.col("tvar").alias("vo"),
    )
    j = u.crossJoin(F.broadcast(ot))
    t = (F.col("mu") - F.col("mo")) / F.sqrt(
        F.col("vu") / F.col("hu") + F.col("vo") / F.col("ho")
    )
    return j.select(
        F.col("hu").alias("h_urgent"),
        F.col("ho").alias("h_other"),
        (F.floor(F.col("mu") * 1e2 + 0.5) / 1e2).alias("tmean_urgent_q"),
        (F.floor(F.col("mo") * 1e2 + 0.5) / 1e2).alias("tmean_other_q"),
        (F.floor(t * 1e6 + 0.5) / 1e6).alias("yuen_t_q"),
        F.when(F.abs(t) > 1.959963984540054, F.lit("different"))
        .otherwise(F.lit("comparable"))
        .alias("verdict"),
    )


@_staged(
    "circular_stats_events",
    """
    WITH ang AS (
      SELECT event_type,
             2 * pi() * (CAST(hour(ts) AS DOUBLE) * 3600
                         + minute(ts) * 60 + CAST(second(ts) AS DOUBLE))
               / 86400.0 AS theta
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(cos(theta)) / count(*) AS cbar,
             sum(sin(theta)) / count(*) AS sbar
      FROM ang GROUP BY 1
    )
    SELECT event_type, n,
           floor(sqrt(cbar * cbar + sbar * sbar) * 1e6 + 0.5) / 1e6
             AS resultant_q,
           floor((atan2(sbar, cbar) * 86400.0 / (2 * pi())
                  + CASE WHEN atan2(sbar, cbar) < 0 THEN 86400.0
                         ELSE 0.0 END) / 3600.0 * 1e4 + 0.5) / 1e4
             AS mean_hour_q,
           floor(n * (cbar * cbar + sbar * sbar) * 1e4 + 0.5) / 1e4
             AS rayleigh_z_q,
           CASE WHEN n * (cbar * cbar + sbar * sbar) > 2.995732273553991
                THEN 'clock_pattern' ELSE 'uniform_over_day' END AS verdict
    FROM s ORDER BY event_type
    """,
)
def circular_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event TIME-OF-DAY per type: seconds
    since midnight wrap onto the unit circle (θ = 2π·s/86400), the
    resultant length R̄ measures clock concentration, atan2 recovers
    the mean hour (a quantity a linear mean butchers across
    midnight), and the Rayleigh test z = nR̄² vs the 5% critical
    value ln(20) decides whether the stream has a daily rhythm at
    all. The domain (directional data) no other registry query
    touches; one trig aggregate per type."""
    import math

    e = T(spark, sf_dir, "events")
    theta = (
        2
        * math.pi
        * (
            F.hour("ts").cast("double") * 3600
            + F.minute("ts") * 60
            + F.second("ts").cast("double")
        )
        / 86400.0
    )
    s = e.select("event_type", theta.alias("theta")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(F.cos("theta")) / F.count(F.lit(1))).alias("cbar"),
        (F.sum(F.sin("theta")) / F.count(F.lit(1))).alias("sbar"),
    )
    r2 = F.col("cbar") * F.col("cbar") + F.col("sbar") * F.col("sbar")
    mean_ang = F.atan2(F.col("sbar"), F.col("cbar"))
    mean_sec = mean_ang * 86400.0 / (2 * math.pi) + F.when(
        mean_ang < 0, 86400.0
    ).otherwise(0.0)
    z = F.col("n") * r2
    return s.select(
        "event_type",
        "n",
        (F.floor(F.sqrt(r2) * 1e6 + 0.5) / 1e6).alias("resultant_q"),
        (F.floor(mean_sec / 3600.0 * 1e4 + 0.5) / 1e4).alias("mean_hour_q"),
        (F.floor(z * 1e4 + 0.5) / 1e4).alias("rayleigh_z_q"),
        F.when(z > 2.995732273553991, F.lit("clock_pattern"))
        .otherwise(F.lit("uniform_over_day"))
        .alias("verdict"),
    ).orderBy("event_type")


@_staged(
    "morans_i_nations",
    """
    WITH vals AS (
      SELECT n.n_nationkey AS k, n.n_regionkey AS r,
             sum(c.c_acctbal) / count(*) AS y
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    mu AS (SELECT sum(y) / count(*) AS m, CAST(count(*) AS BIGINT) AS n FROM vals),
    pairs AS (
      SELECT a.k, (a.y - (SELECT m FROM mu)) * (b.y - (SELECT m FROM mu))
               AS cross_dev
      FROM vals a JOIN vals b
        ON b.r = a.r AND b.k <> a.k
    ),
    w AS (SELECT CAST(count(*) AS BIGINT) AS sw FROM pairs),
    ss AS (
      SELECT sum((y - (SELECT m FROM mu)) * (y - (SELECT m FROM mu))) AS s
      FROM vals
    )
    SELECT (SELECT n FROM mu) AS n_nations,
           (SELECT sw FROM w) AS n_pairs,
           floor((SELECT CAST(n AS DOUBLE) FROM mu) / (SELECT sw FROM w)
                 * (SELECT sum(cross_dev) FROM pairs) / (SELECT s FROM ss)
                 * 1e6 + 0.5) / 1e6 AS morans_i_q,
           floor(-1.0 / ((SELECT n FROM mu) - 1) * 1e6 + 0.5) / 1e6
             AS expected_i_q
    """,
)
def morans_i_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of mean account balance
    over the nation graph with same-region contiguity weights
    (w_ij = 1 iff nations share a region): I = (n/ΣW)·Σw_ij(y_i−ȳ)
    (y_j−ȳ)/Σ(y_i−ȳ)² against its null expectation −1/(n−1) — do
    neighboring markets move together? The spatial-AUTOCORRELATION
    member the geo family lacks (grid-NN/proximity find neighbors;
    Moran's I scores whether neighbors RESEMBLE each other). The
    weight graph is the nations×nations same-region frame — a
    schema axis."""
    c = T(spark, sf_dir, "customer")
    nat = T(spark, sf_dir, "nation")
    vals = (
        c.join(F.broadcast(nat), nat.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("r")
        )
        .agg((F.sum("c_acctbal") / F.count(F.lit(1))).alias("y"))
        .persist()
    )
    mu = vals.agg(
        (F.sum("y") / F.count(F.lit(1))).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).first()
    b = vals.select(
        F.col("k").alias("bk"), F.col("r").alias("br"), F.col("y").alias("by")
    )
    pairs = vals.join(
        F.broadcast(b),
        (F.col("br") == F.col("r")) & (F.col("bk") != F.col("k")),
    ).select(((F.col("y") - mu["m"]) * (F.col("by") - mu["m"])).alias("cd"))
    sw = pairs.count()
    cross = pairs.agg(F.sum("cd").alias("s")).first()["s"]
    ss = vals.agg(
        F.sum((F.col("y") - mu["m"]) * (F.col("y") - mu["m"])).alias("s")
    ).first()["s"]
    import math

    i_stat = (mu["n"] / sw) * cross / ss
    return c.sparkSession.createDataFrame(
        [
            (
                mu["n"],
                sw,
                math.floor(i_stat * 1e6 + 0.5) / 1e6,
                math.floor(-1.0 / (mu["n"] - 1) * 1e6 + 0.5) / 1e6,
            )
        ],
        "n_nations long, n_pairs long, morans_i_q double, expected_i_q double",
    )


@_staged(
    "seasonal_mann_kendall_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS wd,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.event_type, a.wd,
             CAST(sum(CAST(sign(b.cents - a.cents) AS BIGINT)) AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.wd = a.wd AND b.day > a.day
      GROUP BY 1, 2
    ),
    counts AS (
      SELECT event_type, wd, CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1, 2
    ),
    strata AS (
      SELECT c.event_type, c.wd, c.n, coalesce(p.s, 0) AS s,
             c.n * (c.n - 1) * (2 * c.n + 5) / 18.0 AS var_s
      FROM counts c LEFT JOIN pairs p
        ON p.event_type = c.event_type AND p.wd = c.wd
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(s) AS BIGINT) AS s_total,
             sum(var_s) AS var_total
      FROM strata GROUP BY 1
    )
    SELECT event_type, s_total,
           floor(var_total * 1e6 + 0.5) / 1e6 AS var_total_q,
           floor(CASE WHEN s_total > 0 THEN (s_total - 1) / sqrt(var_total)
                      WHEN s_total < 0 THEN (s_total + 1) / sqrt(var_total)
                      ELSE 0.0 END * 1e6 + 0.5) / 1e6 AS z_q,
           CASE WHEN (CASE WHEN s_total > 0
                           THEN (s_total - 1) / sqrt(var_total)
                           WHEN s_total < 0
                           THEN (s_total + 1) / sqrt(var_total)
                           ELSE 0.0 END) > 1.959963984540054 THEN 'increasing'
                WHEN (CASE WHEN s_total > 0
                           THEN (s_total - 1) / sqrt(var_total)
                           WHEN s_total < 0
                           THEN (s_total + 1) / sqrt(var_total)
                           ELSE 0.0 END) < -1.959963984540054
                  THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM agg ORDER BY event_type
    """,
)
def seasonal_mann_kendall_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (Hirsch-Slack) Mann-Kendall: the trend test computed
    WITHIN each ISO-weekday stratum and pooled (S = ΣS_g, Var =
    ΣVar_g) — so a strong weekly cycle can neither mask nor fake a
    monotone trend, the failure mode the plain mann_kendall_trend
    has on seasonal streams. Same-weekday day pairs only (the
    calendar axis squared stays bounded); exact BIGINT sign sums;
    no within-stratum value ties in practice, so the untied variance
    formula is the estimand."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("wd"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    ).persist()
    b = daily.select(
        F.col("event_type").alias("et"), F.col("wd").alias("bwd"),
        F.col("day").alias("bday"), F.col("cents").alias("bc"),
    )
    pairs = (
        daily.join(
            b,
            (F.col("et") == F.col("event_type"))
            & (F.col("bwd") == F.col("wd"))
            & (F.col("bday") > F.col("day")),
        )
        .groupBy("event_type", "wd")
        .agg(
            F.sum(F.signum(F.col("bc") - F.col("cents")).cast("long"))
            .cast("long")
            .alias("s")
        )
    )
    counts = daily.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    strata = counts.join(pairs, ["event_type", "wd"], "left").select(
        "event_type",
        F.coalesce(F.col("s"), F.lit(0)).alias("s"),
        (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0).alias(
            "var_s"
        ),
    )
    agg = strata.groupBy("event_type").agg(
        F.sum("s").cast("long").alias("s_total"),
        F.sum("var_s").alias("var_total"),
    )
    st = F.col("s_total")
    z = (
        F.when(st > 0, (st - 1) / F.sqrt(F.col("var_total")))
        .when(st < 0, (st + 1) / F.sqrt(F.col("var_total")))
        .otherwise(F.lit(0.0))
    )
    crit = 1.959963984540054
    return agg.select(
        "event_type",
        "s_total",
        (F.floor(F.col("var_total") * 1e6 + 0.5) / 1e6).alias("var_total_q"),
        (F.floor(z * 1e6 + 0.5) / 1e6).alias("z_q"),
        F.when(z > crit, F.lit("increasing"))
        .when(z < -crit, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    ).orderBy("event_type")


@_staged(
    "gumbel_block_maxima_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    blocks AS (
      SELECT event_type, date_trunc('week', CAST(day AS TIMESTAMP)) AS wk,
             CAST(max(n) AS BIGINT) AS block_max
      FROM daily GROUP BY 1, 2
    ),
    fit AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_blocks,
             sum(CAST(block_max AS DOUBLE)) / count(*) AS m,
             sqrt(sum(CAST(block_max AS DOUBLE) * block_max) / count(*)
                  - (sum(CAST(block_max AS DOUBLE)) / count(*))
                    * (sum(CAST(block_max AS DOUBLE)) / count(*))) AS s
      FROM blocks GROUP BY 1
    )
    SELECT event_type, n_blocks,
           floor((s * sqrt(6.0) / pi()) * 1e4 + 0.5) / 1e4 AS beta_q,
           floor((m - 0.5772156649015329 * (s * sqrt(6.0) / pi()))
                 * 1e4 + 0.5) / 1e4 AS mu_q,
           floor((m - 0.5772156649015329 * (s * sqrt(6.0) / pi())
                  - (s * sqrt(6.0) / pi()) * ln(-ln(0.99)))
                 * 1e2 + 0.5) / 1e2 AS return_level_100_q
    FROM fit ORDER BY event_type
    """,
)
def gumbel_block_maxima_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value capacity planning: each type's WEEKLY block
    maxima of daily load fit a Gumbel distribution by moments
    (β = s√6/π, μ = m − γβ with Euler's γ), and the 100-block return
    level μ − β·ln(−ln 0.99) answers the question percentiles
    cannot: how big a day should we expect once per 100 weeks? The
    EVT member of the capacity family (Erlang-C sizes the steady
    state; this sizes the storm). Two aggregates over the
    calendar-bounded block frame."""
    e = T(spark, sf_dir, "events")
    import math

    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    blocks = daily.groupBy(
        "event_type",
        F.date_trunc("week", F.col("day").cast("timestamp")).alias("wk"),
    ).agg(F.max("n").cast("long").alias("block_max"))
    bm = F.col("block_max").cast("double")
    fit = blocks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (F.sum(bm) / F.count(F.lit(1))).alias("m"),
        F.sqrt(
            F.sum(bm * F.col("block_max")) / F.count(F.lit(1))
            - (F.sum(bm) / F.count(F.lit(1)))
            * (F.sum(bm) / F.count(F.lit(1)))
        ).alias("s"),
    )
    gamma = 0.5772156649015329
    beta = F.col("s") * math.sqrt(6.0) / math.pi
    mu = F.col("m") - gamma * beta
    rl = mu - beta * math.log(-math.log(0.99))
    return fit.select(
        "event_type",
        "n_blocks",
        (F.floor(beta * 1e4 + 0.5) / 1e4).alias("beta_q"),
        (F.floor(mu * 1e4 + 0.5) / 1e4).alias("mu_q"),
        (F.floor(rl * 1e2 + 0.5) / 1e2).alias("return_level_100_q"),
    ).orderBy("event_type")

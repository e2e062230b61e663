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


def _capped_coactivity_sql(k: int = 16, min_shared: int = 3) -> str:
    """DuckDB CTE prelude (slot-bounded ``ue``/``uact``/``slot_kept``/
    ``shared``/``strong``, then ``sym``/``ranked``/``capped``)
    replaying operators/coactivity.py::coactivity_weighted_capped +
    operators/graph.py::cap_neighbors over the hour-slot co-activity
    graph — the same SQL the promoted capped wedge twins
    (queries_r7.py) carry since the round-9 re-base (VERDICT r8
    item 1: the cap now also bounds the pair JOIN, not just the
    wedge stage), factored here so further capped-graph oracles stay
    in sync."""
    from dbt_lakehouse_aws_spark.operators.coactivity import (
        coactivity_capped_sql,
    )

    return coactivity_capped_sql(min_shared).strip().rstrip() + f""",
    sym AS (
      SELECT a AS node, b AS nbr, shared FROM strong
      UNION ALL SELECT b, a, shared FROM strong
    ),
    ranked AS (
      SELECT node, nbr,
             row_number() OVER (PARTITION BY node
                                ORDER BY shared DESC, nbr ASC) AS rk
      FROM sym
    ),
    capped AS MATERIALIZED (
      SELECT DISTINCT least(node, nbr) AS a, greatest(node, nbr) AS b
      FROM ranked WHERE rk <= {k}
    )
"""


@_staged(
    "clustering_coefficient_users",
    f"""
    WITH {_capped_coactivity_sql()},
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM capped e1
      JOIN capped e2 ON e2.a = e1.b
      JOIN capped e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      GROUP BY node
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM capped UNION ALL SELECT b FROM capped)
      GROUP BY node
    )
    SELECT d.node AS user_id, d.deg,
           CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
           floor(2.0 * coalesce(p.triangles, 0)
                 / (d.deg * (d.deg - 1)) * 1e6 + 0.5) / 1e6 AS cc_q
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    WHERE d.deg >= 2
    ORDER BY cc_q DESC, user_id ASC LIMIT 20
    """,
)
def clustering_coefficient_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient cc(v) = 2T(v)/(deg(v)·(deg(v)−1))
    on the NEIGHBOR-CAPPED co-activity graph (operators/graph.py::
    cap_neighbors, k=16 — the same 100 TB degeneracy control the
    promoted capped wedge twins ride; T(v) via degree-ordered
    orientation, operators/graph.py::triangle_counts, wedge volume
    bounded n·k²). The classic 'how clique-like is each user's
    neighborhood' metric — an exact integer rational quantized 1e-6,
    so ranking never turns on a sub-quantum float. Oracle replays
    the cap with a window and counts the same triangles with the
    naive ordered triple join. Top-20, degree ≥ 2."""
    from dbt_lakehouse_aws_spark.operators.coactivity import (
        coactivity_weighted_capped,
    )
    from dbt_lakehouse_aws_spark.operators.graph import (
        cap_neighbors,
        triangle_counts,
    )

    weighted = coactivity_weighted_capped(spark, sf_dir, min_shared=3)
    capped = cap_neighbors(weighted, k=16, weight="shared")
    deg = (
        capped.select(F.col("a").alias("node"))
        .unionByName(capped.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_counts(capped, src="a", dst="b")
    cc = (
        deg.join(tri, "node", "left")
        .select(
            F.col("node").alias("user_id"),
            "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
        .filter(F.col("deg") >= 2)
        .withColumn(
            "cc_q",
            F.floor(
                2.0
                * F.col("triangles").cast("double")
                / (F.col("deg") * (F.col("deg") - 1))
                * 1e6
                + 0.5
            )
            / 1e6,
        )
    )
    return cc.orderBy(F.desc("cc_q"), F.asc("user_id")).limit(20)


@_staged(
    "doc_repetition_gopher",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    g2 AS (
      SELECT doc_id,
             array_to_string(list_slice(tokens, i, i + 1), ' ') AS gram
      FROM toks, unnest(range(1, len(tokens))) AS r(i)
      WHERE len(tokens) >= 2
    ),
    g3 AS (
      SELECT doc_id,
             array_to_string(list_slice(tokens, i, i + 2), ' ') AS gram
      FROM toks, unnest(range(1, len(tokens) - 1)) AS r(i)
      WHERE len(tokens) >= 3
    ),
    s2 AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS total2,
             CAST(count(DISTINCT gram) AS BIGINT) AS distinct2
      FROM g2 GROUP BY 1
    ),
    c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
    s3 AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS total3,
             CAST(count(*) AS BIGINT) AS distinct3,
             CAST(max(c) AS BIGINT) AS top3_count
      FROM c3 GROUP BY 1
    )
    SELECT s3.doc_id, s2.total2 + 1 AS n_tokens,
           floor((1.0 - CAST(s2.distinct2 AS DOUBLE) / s2.total2) * 1e6 + 0.5)
             / 1e6 AS dup2_frac_q,
           floor((1.0 - CAST(s3.distinct3 AS DOUBLE) / s3.total3) * 1e6 + 0.5)
             / 1e6 AS dup3_frac_q,
           s3.top3_count
    FROM s3 JOIN s2 ON s2.doc_id = s3.doc_id
    ORDER BY dup3_frac_q DESC, s3.doc_id ASC LIMIT 25
    """,
)
def doc_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document n-gram repetition — the Gopher/MassiveText
    internal-repetition filter family (Rae et al. 2021 §A1.1:
    'fraction of duplicate n-grams') that catches boilerplate and
    generation loops EXACT dedup can't (the doc is unique, its
    content is not): duplicate-bigram and duplicate-trigram
    fractions 1 − distinct/total plus the modal trigram count. One
    explode + two per-doc hash aggregates — counts exact integers,
    the two fractions floor-quantized 1e-6. Top-25 most repetitive
    docs. Composes with gopher_quality_docs (llmops/text.py), which
    carries the length/stopword axes of the same filter suite."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    g2 = d.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
        "toks",
    ).select("doc_id", F.array_join(F.expr("slice(toks, i, 2)"), " ").alias("gram"))
    g3 = d.filter(F.size("toks") >= 3).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - 2)).alias("i"),
        "toks",
    ).select("doc_id", F.array_join(F.expr("slice(toks, i, 3)"), " ").alias("gram"))
    s2 = g2.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("total2"),
        F.countDistinct("gram").cast("long").alias("distinct2"),
    )
    c3 = g3.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    s3 = c3.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("total3"),
        F.count(F.lit(1)).cast("long").alias("distinct3"),
        F.max("c").cast("long").alias("top3_count"),
    )
    q6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    return (
        s3.join(s2, "doc_id")
        .select(
            "doc_id",
            (F.col("total2") + 1).alias("n_tokens"),
            q6(1.0 - F.col("distinct2").cast("double") / F.col("total2")).alias(
                "dup2_frac_q"
            ),
            q6(1.0 - F.col("distinct3").cast("double") / F.col("total3")).alias(
                "dup3_frac_q"
            ),
            "top3_count",
        )
        .orderBy(F.desc("dup3_frac_q"), F.asc("doc_id"))
        .limit(25)
    )


@_staged(
    "winnowing_fingerprints_docs",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             CAST('0x' || substr(md5(
               array_to_string(list_slice(tokens, i, i + 2), ' ')), 1, 10)
             AS BIGINT) AS h
      FROM toks, unnest(range(1, len(tokens) - 1)) AS r(i)
      WHERE len(tokens) >= 3
    ),
    keyed AS (
      SELECT doc_id, i, h, h * 65536 + (65535 - i) AS key FROM grams
    ),
    wins AS (
      SELECT doc_id,
             min(key) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey,
             count(*) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
      FROM keyed
    ),
    fps AS (
      SELECT DISTINCT doc_id, 65535 - (wkey % 65536) AS fp_pos,
             wkey // 65536 AS fp_hash
      FROM wins WHERE wn = 4
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
             CAST(sum(fp_hash) AS BIGINT) AS checksum
      FROM fps GROUP BY 1
    ),
    ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY 1)
    SELECT p.doc_id, g.n_grams, p.n_fp,
           floor(CAST(p.n_fp AS DOUBLE) / g.n_grams * 1e6 + 0.5) / 1e6
             AS density_q,
           p.checksum
    FROM per_doc p JOIN ng g ON g.doc_id = p.doc_id
    ORDER BY n_fp DESC, p.doc_id ASC LIMIT 25
    """,
)
def winnowing_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word 3-gram with
    the portable md5-prefix hash (llmops/dedup.py::_portable_hash
    family, bit-identical Spark↔DuckDB), slide a w=4 window over the
    per-doc hash sequence, and keep each window's MINIMUM hash with
    the RIGHTMOST-on-tie rule — the selection guarantee (at least
    one fingerprint per w consecutive grams, density → 2/(w+1)) that
    makes fingerprint-overlap a position-robust near-dup signal
    where a single edit shifts every downstream shingle. The
    min-with-rightmost-tie selection is encoded ARITHMETICALLY so
    one window MIN does both: key = h·2¹⁶ + (2¹⁶−1−pos) orders first
    by hash then by DESCENDING position, and the frame min decodes
    back to (pos, hash). Per-doc hash-partitioned frames — no global
    window; fingerprint positions dedup'd across overlapping
    windows. Output: per-doc fingerprint count, selection density,
    and checksum (exact integer sum of selected 40-bit hashes)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = (
        d.filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 2)).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("i"),
            F.conv(
                F.substring(
                    F.md5(F.array_join(F.expr("slice(toks, i, 3)"), " ")), 1, 10
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    keyed = grams.withColumn("key", F.col("h") * 65536 + (65535 - F.col("i")))
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    wins = keyed.select(
        "doc_id",
        F.min("key").over(w).alias("wkey"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    fps = (
        wins.filter(F.col("wn") == 4)
        .select(
            "doc_id",
            (65535 - F.col("wkey") % 65536).alias("fp_pos"),
            F.expr("wkey div 65536").alias("fp_hash"),
        )
        .distinct()
    )
    per_doc = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.sum("fp_hash").cast("long").alias("checksum"),
    )
    ng = grams.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    return (
        per_doc.join(ng, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_fp",
            (F.floor(F.col("n_fp").cast("double") / F.col("n_grams") * 1e6 + 0.5) / 1e6).alias(
                "density_q"
            ),
            "checksum",
        )
        .orderBy(F.desc("n_fp"), F.asc("doc_id"))
        .limit(25)
    )


@_staged(
    "changepoint_binseg_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, d, cents,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                  AS BIGINT) AS k,
             CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY d)
                  AS BIGINT) AS s1,
             CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ),
    gains AS (
      SELECT event_type, d, k, n,
             floor((CAST(s1 AS DOUBLE) * s1 / k
                    + CAST(s - s1 AS DOUBLE) * (s - s1) / (n - k)
                    - CAST(s AS DOUBLE) * s / n) * 1e4 + 0.5) / 1e4 AS gain_q,
             floor(CAST(s1 AS DOUBLE) / k * 1e2 + 0.5) / 1e2 AS mean_left_q,
             floor(CAST(s - s1 AS DOUBLE) / (n - k) * 1e2 + 0.5) / 1e2
               AS mean_right_q
      FROM seq WHERE k < n
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY gain_q DESC, k ASC) AS rk
      FROM gains
    )
    SELECT event_type, d AS split_day, k AS split_idx, n AS n_days,
           gain_q, mean_left_q, mean_right_q
    FROM best WHERE rk = 1 ORDER BY event_type
    """,
)
def changepoint_binseg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type — the first split
    of binary segmentation (Scott & Knott 1974 / the CUSUM-adjacent
    offline changepoint family): over each type's daily-cents series,
    the day boundary maximizing the between-segment SSE reduction
    gain(k) = S₁²/k + (S−S₁)²/(n−k) − S²/n (the variance-decomposition
    identity, so gain ≥ 0 and no per-candidate variance pass is
    needed — prefix sums suffice). All sums exact integer cents;
    gains/means are fixed-order float expressions floor-quantized
    BEFORE the argmax so the chosen split never turns on a
    sub-quantum float; ties break to the earliest day. Windows are
    hash-partitioned per type over the bounded day frame — the
    cusum_daily_events pattern, no global exchange."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents"))
    wo = Window.partitionBy("event_type").orderBy("d")
    wa = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "d",
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("cents").over(wo).cast("long").alias("s1"),
        F.sum("cents").over(wa).cast("long").alias("s"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
    )
    s1 = F.col("s1").cast("double")
    s = F.col("s").cast("double")
    sr = (F.col("s") - F.col("s1")).cast("double")
    k = F.col("k")
    n = F.col("n")
    gains = seq.filter(F.col("k") < F.col("n")).select(
        "event_type",
        "d",
        "k",
        "n",
        (F.floor((s1 * s1 / k + sr * sr / (n - k) - s * s / n) * 1e4 + 0.5) / 1e4).alias(
            "gain_q"
        ),
        (F.floor(s1 / k * 1e2 + 0.5) / 1e2).alias("mean_left_q"),
        (F.floor(sr / (n - k) * 1e2 + 0.5) / 1e2).alias("mean_right_q"),
    )
    wbest = Window.partitionBy("event_type").orderBy(F.desc("gain_q"), F.asc("k"))
    return (
        gains.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("split_day"),
            F.col("k").alias("split_idx"),
            F.col("n").alias("n_days"),
            "gain_q",
            "mean_left_q",
            "mean_right_q",
        )
        .orderBy("event_type")
    )


@_staged(
    "rrf_hybrid_search_docs",
    """
    WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2
    ), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    per AS (
      SELECT t.doc_id,
             ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * 2.2)
             / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) AS sc
      FROM tf t JOIN dl l USING (doc_id) JOIN dfreq d USING (term), stats s
    ),
    bm AS (
      SELECT doc_id, round(sum(sc), 6) AS bm25 FROM per GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 100
    ),
    r1 AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                          AS BIGINT) AS r1
      FROM bm
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    q AS (SELECT emb AS vq FROM v WHERE vec_id = 0),
    sc2 AS (
      SELECT c.vec_id,
             floor(list_dot_product(q.vq, c.emb)
                   / (sqrt(list_dot_product(q.vq, q.vq))
                      * sqrt(list_dot_product(c.emb, c.emb))) * 1e6 + 0.5)
               / 1e6 AS cos_q
      FROM v c, q
    ),
    top2 AS (SELECT vec_id, cos_q FROM sc2 ORDER BY cos_q DESC, vec_id LIMIT 100),
    r2 AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY cos_q DESC, vec_id)
                          AS BIGINT) AS r2
      FROM top2
    ),
    fused AS (
      SELECT coalesce(r1.doc_id, r2.vec_id) AS doc_id, r1.r1, r2.r2,
             floor((coalesce(1.0 / (60 + r1.r1), 0.0)
                    + coalesce(1.0 / (60 + r2.r2), 0.0)) * 1e9 + 0.5) / 1e9
               AS rrf_q
      FROM r1 FULL JOIN r2 ON r2.vec_id = r1.doc_id
    )
    SELECT doc_id, r1, r2, rrf_q FROM fused
    ORDER BY rrf_q DESC, doc_id ASC LIMIT 20
    """,
)
def rrf_hybrid_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of a LEXICAL and a DENSE retriever
    (Cormack, Clarke & Buettcher, SIGIR 2009 — the standard hybrid-
    search combiner: score(d) = Σᵢ 1/(60 + rankᵢ(d)), rank-only so
    incomparable score scales never need calibration): ranker 1 is
    exact Okapi BM25 for query {spark, join, window} (llmops/
    text.py::bm25_topk — early-filtered postings, broadcast idf),
    ranker 2 is exact cosine to the vec_id-0 embedding over the
    1:1-aligned embeddings table (llmops/similarity.py dot/fold).
    Both top-100 candidate lists get ranks from the SCALABLE 2-pass
    global_row_number (operators/windows.py — no single-partition
    window exchange even on the bounded lists), docs absent from a
    list contribute nothing (truncated-list RRF), cosine quantized
    1e-6 BEFORE ranking so ranks never turn on a sub-quantum float.
    Top-20 fused."""
    from dbt_lakehouse_aws_spark.llmops.similarity import _as_double, dot
    from dbt_lakehouse_aws_spark.llmops.text import bm25_topk
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number

    d = T(spark, sf_dir, "documents")
    bm = bm25_topk(d, ["spark", "join", "window"], k=100)
    r1 = global_row_number(
        bm.select("doc_id", "bm25"), [F.desc("bm25"), F.asc("doc_id")], name="r1"
    ).select("doc_id", F.col("r1").cast("long").alias("r1"))

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("vq"))
    cos = e.crossJoin(F.broadcast(q)).select(
        "vec_id",
        (
            F.floor(
                dot(F.col("emb"), F.col("vq"))
                / (
                    F.sqrt(dot(F.col("vq"), F.col("vq")))
                    * F.sqrt(dot(F.col("emb"), F.col("emb")))
                )
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("cos_q"),
    )
    top2 = cos.orderBy(F.desc("cos_q"), F.asc("vec_id")).limit(100)
    r2 = global_row_number(
        top2, [F.desc("cos_q"), F.asc("vec_id")], name="r2"
    ).select("vec_id", F.col("r2").cast("long").alias("r2"))

    fused = r1.join(r2, r1["doc_id"] == r2["vec_id"], "full").select(
        F.coalesce(r1["doc_id"], r2["vec_id"]).alias("doc_id"),
        "r1",
        "r2",
        (
            F.floor(
                (
                    F.coalesce(1.0 / (60 + F.col("r1")), F.lit(0.0))
                    + F.coalesce(1.0 / (60 + F.col("r2")), F.lit(0.0))
                )
                * 1e9
                + 0.5
            )
            / 1e9
        ).alias("rrf_q"),
    )
    return fused.orderBy(F.desc("rrf_q"), F.asc("doc_id")).limit(20)



@_staged(
    "multiset_ops_gauntlet_customers",
    """
    WITH a AS (
      SELECT c_mktsegment AS seg, c_nationkey % 5 AS bucket
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    b AS (
      SELECT c_mktsegment AS seg, c_nationkey % 5 AS bucket
      FROM customer WHERE c_custkey % 2 = 0
    ),
    ex AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
    inter AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
    exd AS (SELECT * FROM a EXCEPT SELECT * FROM b),
    intd AS (SELECT * FROM a INTERSECT SELECT * FROM b)
    SELECT 'except_all' AS op, seg, CAST(count(*) AS BIGINT) AS n
    FROM ex GROUP BY 1, 2
    UNION ALL
    SELECT 'intersect_all', seg, count(*) FROM inter GROUP BY 1, 2
    UNION ALL
    SELECT 'except_distinct', seg, count(*) FROM exd GROUP BY 1, 2
    UNION ALL
    SELECT 'intersect_distinct', seg, count(*) FROM intd GROUP BY 1, 2
    ORDER BY op, seg
    """,
)
def multiset_ops_gauntlet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set-operation gauntlet — EXCEPT ALL / INTERSECT ALL
    keep duplicate MULTIPLICITY (bag semantics: max(m−n, 0) and
    min(m, n) copies respectively) where the DISTINCT forms collapse
    it; mixing them up silently corrupts reconciliation counts, and
    set_ops_customers (queries_r7) only exercised the distinct
    forms. Spark's exceptAll/intersectAll compile to left-anti-style
    joins on (row, replica) — no row-UDF, shuffle on the compared
    columns — and both engines must agree on every per-segment
    multiplicity. Two overlapping multisets built from deterministic
    modular slices of customer."""
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("bucket"),
    )
    b = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("bucket"),
    )
    def agg(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("seg").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ).select(F.lit(op).alias("op"), "seg", "n")

    out = (
        agg(a.exceptAll(b), "except_all")
        .unionByName(agg(a.intersectAll(b), "intersect_all"))
        .unionByName(agg(a.subtract(b), "except_distinct"))
        .unionByName(agg(a.intersect(b), "intersect_distinct"))
    )
    return out.orderBy("op", "seg")


@_staged(
    "try_arithmetic_gauntlet_orders",
    """
    SELECT o_orderkey,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
           TRY_CAST(o_orderpriority AS BIGINT) AS prio_whole,
           o_totalprice / nullif(CAST(o_custkey % 7 AS DOUBLE), 0.0)
             AS price_per,
           CAST(NULL AS BIGINT) AS div0_int,
           TRY_CAST('2024-02-' || CAST(28 + o_custkey % 3 AS VARCHAR)
                    AS DATE) AS feb_date,
           ([10, 20, 30])[CAST(1 + o_custkey % 5 AS INTEGER)] AS arr_at
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
)
def try_arithmetic_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY_* gauntlet — the driver runs a Spark-4 ANSI
    session where a bare cast('1-URGENT' AS BIGINT) or div-by-zero
    THROWS, so every maybe-dirty expression must ride the TRY family
    (SURVEY §2.8's cast row, hostile-input edition): try_cast of a
    leading digit (succeeds) vs the whole enum (NULL), try_divide by
    a sometimes-zero denominator (NULL, matching DuckDB's NULL-on-
    zero division), integer division by zero pinned NULL on both
    engines, try_to_date on a rolling Feb 28/29/30 (the 30th is NULL
    in BOTH engines — 2024 is a leap year so the 29th survives), and
    try_element_at past the array end (indices 4-5 of a 3-element
    array are NULL; index 0 is NOT try-able — Spark throws
    INVALID_INDEX_OF_ZERO even in the TRY form, a pinned engine
    fact this gauntlet's 1-based index range respects). Every lane
    lands NULL-or-value identically across engines."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias(
            "prio_num"
        ),
        F.col("o_orderpriority").try_cast("bigint").alias("prio_whole"),
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_custkey") % 7).cast("double")
        ).alias("price_per"),
        F.try_divide(F.lit(1), F.lit(0)).cast("long").alias("div0_int"),
        F.try_to_date(
            F.concat(
                F.lit("2024-02-"),
                (28 + F.col("o_custkey") % 3).cast("string"),
            )
        ).alias("feb_date"),
        F.try_element_at(
            F.array(F.lit(10), F.lit(20), F.lit(30)),
            (1 + F.col("o_custkey") % 5).cast("int"),
        ).alias("arr_at"),
    ).orderBy("o_orderkey")


@_staged(
    "mcc_orders",
    """
    WITH cm AS (
      SELECT CAST(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM (
        SELECT o_totalprice > 150000 AS pred, o_orderstatus = 'F' AS truth
        FROM orders)
    )
    SELECT tp, fp, fn, tn,
           floor((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / sqrt((CAST(tp + fp AS DOUBLE)) * (tp + fn)
                        * (CAST(tn AS DOUBLE) + fp) * (tn + fn))
                 * 1e6 + 0.5) / 1e6 AS mcc_q,
           floor((CAST(tp AS DOUBLE) / (tp + fn)
                  + CAST(tn AS DOUBLE) / (tn + fp)) / 2 * 1e6 + 0.5) / 1e6
             AS balanced_acc_q,
           floor(2.0 * tp / (2.0 * tp + fp + fn) * 1e6 + 0.5) / 1e6 AS f1_q
    FROM cm
    """,
)
def mcc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient + balanced accuracy + F1 from
    one exact confusion matrix — MCC is the single-number binary
    metric that stays honest under class imbalance (Chicco & Jurman
    2020), where accuracy and even F1 reward majority-class
    collapse; the eval-metrics family (AUC, calibration, PR) lacked
    it. Deterministic classifier: price > 150k predicting order
    finality. One whole-stage-codegen conditional aggregate to four
    BIGINTs; the three scores are fixed-order float expressions over
    them, floor-quantized 1e-6 (products ordered tp·tn and
    (tp+fp)(tp+fn)(tn+fp)(tn+fn) as doubles — deterministic IEEE
    both engines)."""
    o = T(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") > 150000).alias("pred"),
        (F.col("o_orderstatus") == "F").alias("truth"),
    )
    cm = o.agg(
        F.sum(F.when(F.col("pred") & F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    q6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        q6(
            (tp * tn - fp * fn)
            / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        ).alias("mcc_q"),
        q6((tp / (tp + fn) + tn / (tn + fp)) / 2).alias("balanced_acc_q"),
        q6(2.0 * tp / (2.0 * tp + fp + fn)).alias("f1_q"),
    )


@_staged(
    "tail_index_hill_orders",
    """
    WITH topk AS (
      SELECT o_totalprice AS x FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 101
    ),
    ref AS (SELECT min(x) AS xref FROM topk),
    pico AS (
      SELECT CAST(sum(CAST(floor(ln(t.x / r.xref) * 1e12 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM topk t CROSS JOIN ref r
    )
    SELECT CAST(100 AS BIGINT) AS k,
           floor(CAST(s AS DOUBLE) / 1e12 / 100 * 1e6 + 0.5) / 1e6 AS hill_q,
           floor(1.0 / (CAST(s AS DOUBLE) / 1e12 / 100) * 1e4 + 0.5) / 1e4
             AS alpha_q,
           (SELECT floor(xref * 100 + 0.5) / 100 FROM ref) AS threshold
    FROM pico
    """,
)
def tail_index_hill_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) over the top-k order
    statistics of order value — the standard heavy-tail exponent
    measurement behind 'is this distribution Pareto and how fat'
    (revenue concentration, outlier pricing, retry storms); the
    Zipf/Gumbel rows measure tails of RANKS and MAXIMA, this one
    measures the value tail itself. H = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over
    the top k=100, α = 1/H. The top-101 arrives via
    TakeOrderedAndProject (no global sort), the reference value is
    the 101-set MIN — summing ln(x/xref) over ALL 101 rows equals
    the top-100 sum because the min row contributes exactly 0, which
    sidesteps boundary-tie rank ambiguity entirely. Each log term is
    floor-quantized to integer picounits BEFORE the sum (the
    jackknife/JS discipline), so the aggregate is an exact BIGINT
    on both engines."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"), "o_orderkey"
    )
    topk = o.orderBy(F.desc("x"), F.asc("o_orderkey")).limit(101).select("x")
    ref = topk.agg(F.min("x").alias("xref"))
    pico = (
        topk.crossJoin(F.broadcast(ref))
        .select(
            F.floor(F.log(F.col("x") / F.col("xref")) * 1e12 + 0.5)
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("s"))
    )
    h = F.col("s").cast("double") / 1e12 / 100
    return pico.crossJoin(F.broadcast(ref)).select(
        F.lit(100).cast("long").alias("k"),
        (F.floor(h * 1e6 + 0.5) / 1e6).alias("hill_q"),
        (F.floor(1.0 / h * 1e4 + 0.5) / 1e4).alias("alpha_q"),
        (F.floor(F.col("xref") * 100 + 0.5) / 100).alias("threshold"),
    )


@_staged(
    "negbin_mom_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM daily GROUP BY 1
    ),
    mv AS (
      SELECT event_type, n_days,
             CAST(s AS DOUBLE) / n_days AS m,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days) / n_days
               AS v
      FROM stats
    )
    SELECT event_type, n_days,
           floor(m * 1e6 + 0.5) / 1e6 AS mean_q,
           floor(v * 1e6 + 0.5) / 1e6 AS var_q,
           (v > m) AS overdispersed,
           CASE WHEN v > m
                THEN floor(m * m / (v - m) * 1e6 + 0.5) / 1e6 END AS r_q,
           CASE WHEN v > m
                THEN floor(m / v * 1e6 + 0.5) / 1e6 END AS p_q
    FROM mv ORDER BY event_type
    """,
)
def negbin_mom_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit on per-type daily
    event counts — the distribution choice the dispersion-index row
    (staged r6) motivates but doesn't make: when var > mean
    (overdispersion), Poisson underestimates tail days and NB(r, p)
    with r = m²/(v−m), p = m/v is the standard two-moment fit
    (capacity planning, anomaly thresholds, bursty arrivals). One
    grouped pass to exact integer (n, Σc, Σc²); mean/variance/r/p
    are fixed-order float expressions floor-quantized 1e-6; the
    under-dispersed guard keeps r/p NULL (CASE, not a throw) exactly
    as the oracle does."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    m = F.col("s").cast("double") / F.col("n_days")
    v = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_days")
    ) / F.col("n_days")
    q6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    return stats.select(
        "event_type",
        "n_days",
        q6(m).alias("mean_q"),
        q6(v).alias("var_q"),
        (v > m).alias("overdispersed"),
        F.when(v > m, q6(m * m / (v - m))).alias("r_q"),
        F.when(v > m, q6(m / v)).alias("p_q"),
    ).orderBy("event_type")


@_staged(
    "simpson_diversity_sources",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    c AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    s AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c * c) AS BIGINT) AS ss,
             CAST(sum(c * (c - 1)) AS BIGINT) AS pairs
      FROM c GROUP BY 1
    )
    SELECT source, n, vocab,
           floor((1.0 - CAST(pairs AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
                 * 1e6 + 0.5) / 1e6 AS simpson_q,
           floor(CAST(n AS DOUBLE) * n / ss * 1e4 + 0.5) / 1e4
             AS effective_vocab_q
    FROM s ORDER BY source
    """,
)
def simpson_diversity_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity of each source's token distribution — the
    ecology-standard concentration complement to Shannon entropy
    (unigram_entropy_docs) and the JS drift row: unbiased Simpson
    1 − Σc(c−1)/(n(n−1)) (the probability two tokens drawn WITHOUT
    replacement differ) plus Hill-number effective vocabulary
    n²/Σc² ('how many equally-common types would look this
    diverse') — the pair every corpus-mix dashboard wants next to
    raw vocab size, which hapax noise inflates. One per-(source,
    term) count pass to exact integer (n, V, Σc², Σc(c−1)); two
    fixed-order float expressions, floor-quantized."""
    from dbt_lakehouse_aws_spark.llmops.text import tokens_col

    d = T(spark, sf_dir, "documents")
    c = d.select("source", F.explode(tokens_col("text")).alias("term")).groupBy(
        "source", "term"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    s = c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("pairs"),
    )
    n = F.col("n").cast("double")
    return s.select(
        "source",
        "n",
        "vocab",
        (
            F.floor(
                (1.0 - F.col("pairs").cast("double") / (n * (F.col("n") - 1)))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("simpson_q"),
        (F.floor(n * n / F.col("ss") * 1e4 + 0.5) / 1e4).alias(
            "effective_vocab_q"
        ),
    ).orderBy("source")


@_staged(
    "cramers_v_orders",
    """
    WITH base AS (
      SELECT o_orderpriority AS prio, o_orderstatus AS status,
             CAST(floor(o_totalprice / 100000) AS BIGINT) AS band
      FROM orders
    ),
    pairs AS (
      SELECT 'prio_x_status' AS pair, prio AS x, status AS y FROM base
      UNION ALL
      SELECT 'prio_x_band', prio, CAST(band AS VARCHAR) FROM base
      UNION ALL
      SELECT 'status_x_band', status, CAST(band AS VARCHAR) FROM base
    ),
    cells AS (
      SELECT pair, x, y, CAST(count(*) AS BIGINT) AS o
      FROM pairs GROUP BY 1, 2, 3
    ),
    rx AS (SELECT pair, x, CAST(sum(o) AS BIGINT) AS rx FROM cells GROUP BY 1, 2),
    cy AS (SELECT pair, y, CAST(sum(o) AS BIGINT) AS cy FROM cells GROUP BY 1, 2),
    tot AS (
      SELECT pair, CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT x) AS BIGINT) AS r,
             CAST(count(DISTINCT y) AS BIGINT) AS c
      FROM cells GROUP BY 1
    ),
    contrib AS (
      SELECT cl.pair,
             CAST(sum(CAST(floor(
               CAST(cl.o AS DOUBLE) * cl.o * tot.n
               / (CAST(rx.rx AS DOUBLE) * cy.cy) * 1e9 + 0.5)
             AS BIGINT)) AS BIGINT) AS nano
      FROM cells cl
      JOIN rx ON rx.pair = cl.pair AND rx.x = cl.x
      JOIN cy ON cy.pair = cl.pair AND cy.y = cl.y
      JOIN tot ON tot.pair = cl.pair
      GROUP BY 1
    )
    SELECT t.pair, t.n, t.r, t.c,
           floor((CAST(k.nano AS DOUBLE) / 1e9 - t.n) * 1e4 + 0.5) / 1e4
             AS chi2_q,
           floor(sqrt((CAST(k.nano AS DOUBLE) / 1e9 - t.n)
                      / (t.n * (least(t.r, t.c) - 1))) * 1e6 + 0.5) / 1e6
             AS cramers_v_q
    FROM tot t JOIN contrib k ON k.pair = t.pair
    ORDER BY t.pair
    """,
)
def cramers_v_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association matrix over three categorical pairs of
    orders (priority×status, priority×$100k-band, status×band) — the
    bounded-[0,1] normalization of χ² that makes association
    comparable ACROSS tables of different shape (feature-redundancy
    screens before one-hot encoding; the g-test row checks ONE pair
    for independence, this ranks pairs by strength). All three
    contingency tables ride ONE unpivoted (pair, x, y) aggregate +
    broadcast margins, and χ² uses the algebraic identity
    Σ_all (o−e)²/e = Σ_observed o²·n/(rx·cy) − n, so ZERO cells —
    whose naive (o−e)²/e term is e, not 0 — are covered without
    materializing the full r×c grid; per-cell terms are fixed-order
    float expressions floor-quantized to integer nano-units BEFORE
    the vocabulary-bounded sum (the JS/jackknife discipline). V =
    √(χ²/(n·(min(r,c)−1)))."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") / 100000).cast("long").alias("band"),
    )
    pairs = (
        o.select(
            F.lit("prio_x_status").alias("pair"),
            F.col("prio").alias("x"),
            F.col("status").alias("y"),
        )
        .unionByName(
            o.select(
                F.lit("prio_x_band").alias("pair"),
                F.col("prio").alias("x"),
                F.col("band").cast("string").alias("y"),
            )
        )
        .unionByName(
            o.select(
                F.lit("status_x_band").alias("pair"),
                F.col("status").alias("x"),
                F.col("band").cast("string").alias("y"),
            )
        )
    )
    cells = pairs.groupBy("pair", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rx = cells.groupBy("pair", "x").agg(F.sum("o").cast("long").alias("rx"))
    cy = cells.groupBy("pair", "y").agg(F.sum("o").cast("long").alias("cy"))
    tot = cells.groupBy("pair").agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("x").cast("long").alias("r"),
        F.countDistinct("y").cast("long").alias("c"),
    )
    contrib = (
        cells.join(rx, ["pair", "x"])
        .join(cy, ["pair", "y"])
        .join(F.broadcast(tot), "pair")
        .select(
            "pair",
            F.floor(
                F.col("o").cast("double")
                * F.col("o")
                * F.col("n")
                / (F.col("rx").cast("double") * F.col("cy"))
                * 1e9
                + 0.5
            )
            .cast("long")
            .alias("t"),
        )
        .groupBy("pair")
        .agg(F.sum("t").cast("long").alias("nano"))
    )
    chi2 = F.col("nano").cast("double") / 1e9 - F.col("n")
    return (
        tot.join(contrib, "pair")
        .select(
            "pair",
            "n",
            "r",
            "c",
            (F.floor(chi2 * 1e4 + 0.5) / 1e4).alias("chi2_q"),
            (
                F.floor(
                    F.sqrt(chi2 / (F.col("n") * (F.least("r", "c") - 1))) * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("cramers_v_q"),
        )
        .orderBy("pair")
    )


@_staged(
    "rich_club_users",
    f"""
    WITH {_capped_coactivity_sql()},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM capped UNION ALL SELECT b FROM capped)
      GROUP BY node
    ),
    ks AS (SELECT unnest([2, 4, 6, 8]) AS k),
    nk AS (
      SELECT ks.k, CAST(count(deg.node) AS BIGINT) AS n_k
      FROM ks LEFT JOIN deg ON deg.deg > ks.k GROUP BY 1
    ),
    ek AS (
      SELECT ks.k, CAST(count(e.a) AS BIGINT) AS e_k
      FROM ks LEFT JOIN (
        SELECT c.a, c.b, da.deg AS dega, db.deg AS degb
        FROM capped c
        JOIN deg da ON da.node = c.a
        JOIN deg db ON db.node = c.b) e
        ON e.dega > ks.k AND e.degb > ks.k
      GROUP BY 1
    )
    SELECT CAST(nk.k AS BIGINT) AS k, nk.n_k, ek.e_k,
           CASE WHEN nk.n_k >= 2 THEN
             floor(2.0 * ek.e_k / (CAST(nk.n_k AS DOUBLE) * (nk.n_k - 1))
                   * 1e6 + 0.5) / 1e6 END AS phi_q
    FROM nk JOIN ek ON ek.k = nk.k
    ORDER BY nk.k
    """,
)
def rich_club_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) = 2·E₍>k₎ / (N₍>k₎·(N₍>k₎−1)) at
    degree thresholds k ∈ {2,4,6,8} on the neighbor-capped
    co-activity graph — 'do the hubs form their own clique'
    (Colizza et al. 2006), the hub-interconnection companion to
    degree assortativity's global correlation: assortativity can be
    near zero while the top decile is fully wired. Degrees once,
    then each threshold is one broadcast-filtered count over the
    SAME joined edge frame (4-row threshold ladder, the k-anon
    ladder device) — exact integers, quantized ratio, NULL below
    two qualifying nodes."""
    from dbt_lakehouse_aws_spark.operators.coactivity import (
        coactivity_weighted_capped,
    )
    from dbt_lakehouse_aws_spark.operators.graph import cap_neighbors

    weighted = coactivity_weighted_capped(spark, sf_dir, min_shared=3)
    capped = cap_neighbors(weighted, k=16, weight="shared").localCheckpoint(
        eager=True
    )
    deg = (
        capped.select(F.col("a").alias("node"))
        .unionByName(capped.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ks = spark.range(1, 5).select((F.col("id") * 2).cast("long").alias("k"))
    nk = (
        ks.join(deg, deg["deg"] > ks["k"], "left")
        .groupBy("k")
        .agg(F.count("node").cast("long").alias("n_k"))
    )
    edges_deg = (
        capped.join(deg.withColumnsRenamed({"node": "a", "deg": "dega"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "degb"}), "b")
        .select("a", "b", "dega", "degb")
    )
    ek = (
        ks.join(
            edges_deg,
            (edges_deg["dega"] > ks["k"]) & (edges_deg["degb"] > ks["k"]),
            "left",
        )
        .groupBy("k")
        .agg(F.count("a").cast("long").alias("e_k"))
    )
    return (
        nk.join(ek, "k")
        .select(
            "k",
            "n_k",
            "e_k",
            F.when(
                F.col("n_k") >= 2,
                F.floor(
                    2.0
                    * F.col("e_k")
                    / (F.col("n_k").cast("double") * (F.col("n_k") - 1))
                    * 1e6
                    + 0.5
                )
                / 1e6,
            ).alias("phi_q"),
        )
        .orderBy("k")
    )


@_staged(
    "acid_optimize_compaction_events",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(round(value * 100)) AS BIGINT) AS cents,
           TRUE AS compacted,
           TRUE AS rows_preserved
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY 1 ORDER BY 1
    """,
)
def acid_optimize_compaction_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE small-file compaction under the driver gate
    (sources/acid.py::optimize — the periodic counterweight to
    incremental ingest's one-small-file-per-commit manifest
    pressure): three per-type appends leave ≥ 3 data files; OPTIMIZE
    rewrites the snapshot into a bounded file count as ONE atomic
    commit (readers of the old version untouched, conflicting
    writers rebase — raced in test_acid.py). The row pins the audit
    IN-QUERY: ``compacted`` asserts the post-OPTIMIZE snapshot holds
    fewer files than the pre-state and the log recorded an OPTIMIZE
    operation; ``rows_preserved`` asserts version-over-version
    counts agree. Values must equal the oracle's straight-from-source
    aggregate — any row lost or duplicated by the rewrite flips
    cents."""
    import tempfile
    import uuid as _uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.col("value"),
    )
    t = AcidTable(
        spark,
        tempfile.mkdtemp(prefix=f"opt_{_uuid.uuid4().hex[:8]}_") + "/t",
    )
    for i, ty in enumerate(("view", "click", "purchase")):
        t.write(
            ev.filter(F.col("event_type") == ty).select(
                "event_id", "event_type", "cents"
            ),
            mode="overwrite" if i == 0 else "append",
        )
    pre = t.snapshot()
    n_before = t.read().count()
    t.optimize(target_file_bytes=1 << 30)
    post = t.snapshot()
    n_after = t.read().count()
    compacted = (
        len(post.files) < len(pre.files)
        and post.operation.startswith("OPTIMIZE")
    )
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            "event_type",
            "n",
            "cents",
            F.lit(bool(compacted)).alias("compacted"),
            F.lit(bool(n_before == n_after)).alias("rows_preserved"),
        )
        .orderBy("event_type")
    )


@_staged(
    "image_dhash_fingerprints",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(4 + doc_id % 13 AS INT) AS w,
             CAST(3 + doc_id % 7 AS INT) AS h
      FROM documents WHERE doc_id % 6 != 3
    ),
    g AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h),
               p -> (doc_id * 31 + 3 * p) % 256
                    + (doc_id * 31 + 3 * p + 1) % 256
                    + (doc_id * 31 + 3 * p + 2) % 256) AS gs
      FROM base
    )
    SELECT doc_id, w AS width, h AS height,
           CAST(list_sum(list_transform(
                  range(0, CAST(least(h * (w - 1), 63) AS INT)),
                  j -> CASE WHEN gs[(j // (w - 1)) * w + (j % (w - 1)) + 2]
                                 > gs[(j // (w - 1)) * w + (j % (w - 1)) + 1]
                            THEN CAST(1 AS BIGINT) << j
                            ELSE 0 END)) AS BIGINT) AS dhash
    FROM g
    """,
)
def image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-hash perceptual fingerprints over REAL decoded
    rasters (llmops/multimodal.py::image_dhash) — the
    brightness-invariant sibling of image_ahash_fingerprints
    (queries_r6): the same five lossless codec lanes rotated by
    doc_id % 6 (BMP, PNG, GIF LZW, TIFF LZW+predictor, PPM), decoded
    by the pure-Python codecs, grayscaled by integer channel sum,
    then bit j = gray[r,c+1] > gray[r,c] over horizontal neighbor
    pairs — all comparisons, zero arithmetic a float could perturb.
    The oracle computes the hash CLOSED-FORM from the deterministic
    pixel formula, so a green row re-proves all five decode paths
    bit-exact under a second, gradient-based bit pattern (ahash's
    mean-threshold green row can mask a swapped-pixel-PAIR decode
    bug that preserves sums; dhash cannot)."""
    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_ppm,
        image_dhash,
    )
    from dbt_lakehouse_aws_spark.llmops.tiff import encode_tiff

    def make_payloads(batches):
        import numpy as np
        import pandas as pd

        encoders = {0: encode_bmp, 1: encode_png, 2: encode_gif,
                    4: encode_tiff, 5: encode_ppm}
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                codec = doc_id % 6
                if codec == 3:
                    continue
                w, h = 4 + doc_id % 13, 3 + doc_id % 7
                px = (
                    (doc_id * 31 + np.arange(w * h * 3, dtype=np.int64)) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                ids.append(doc_id)
                payloads.append(encoders[codec](px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    d = T(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(make_payloads, "doc_id long, payload binary")
    return image_dhash(payloads)


@_staged(
    "schema_drift_audit_acid",
    """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 'added',   'bucket',      'schema grew by one column'),
      (CAST(1 AS BIGINT), 'renamed', 'cents',       'logical name now amount_cents'),
      (CAST(2 AS BIGINT), 'dropped', 'event_type',  'column removed from schema'),
      (CAST(3 AS BIGINT), 'kept',    'event_id',    'stable across all versions')
    ) AS t(step, change, column_name, note)
    ORDER BY step
    """,
)
def schema_drift_audit_acid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit across an ACID table's commit history —
    the contract-monitoring readout every ingest pipeline wants
    ('what changed between v0 and now'): the engine applies the full
    evolution trio (ADD via union-by-name append, RENAME COLUMN,
    DROP COLUMN — all metadata-only commits, sources/acid.py) and
    then DIFFS the v0 schema against the latest straight from the
    MANIFEST (StructType.fromJson over the two snapshots' schema
    JSON + the rename map), emitting one row per drift fact. The
    oracle pins the expected drift report; a wrong row means the
    schema-evolution metadata path — not the data path, which
    acid_rename/drop_column_events already gate — misrecorded a
    commit."""
    import tempfile
    import uuid as _uuid

    from pyspark.sql.types import StructType as _St
    import json as _json

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = AcidTable(
        spark,
        tempfile.mkdtemp(prefix=f"drift_{_uuid.uuid4().hex[:8]}_") + "/t",
    )
    t.write(ev.filter(F.col("event_type") == "view"))
    v0 = t.snapshot()
    # ADD: append a slice carrying a new column (union-by-name evolution)
    t.write(
        ev.filter(F.col("event_type") == "click").withColumn(
            "bucket", (F.col("event_id") % 4).cast("long")
        ),
        mode="append",
    )
    t.rename_column("cents", "amount_cents")
    t.drop_column("event_type")
    vN = t.snapshot()

    cols0 = [f.name for f in _St.fromJson(_json.loads(v0.schema_json)).fields]
    # snapshot schemas carry PHYSICAL names; renames maps phys -> logical
    colsN_phys = [
        f.name for f in _St.fromJson(_json.loads(vN.schema_json)).fields
    ]
    rows = []
    for p_ in colsN_phys:
        logical = vN.renames.get(p_, p_)
        if p_ in vN.renames and p_ in cols0:
            rows.append(("renamed", p_, f"logical name now {logical}"))
        elif p_ not in cols0:
            rows.append(("added", logical, "schema grew by one column"))
    for c in cols0:
        if c not in colsN_phys:
            rows.append(("dropped", c, "column removed from schema"))
    order = {"added": 0, "renamed": 1, "dropped": 2}
    rows.sort(key=lambda r: (order[r[0]], r[1]))
    rows.append(("kept", "event_id", "stable across all versions"))
    assert "event_id" in cols0 and "event_id" in colsN_phys
    return spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "step long, change string, column_name string, note string",
    ).orderBy("step")


@_staged(
    "permutation_test_events",
    """
    WITH pool AS (
      SELECT event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             (event_type = 'purchase') AS is_a
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    obs AS (
      SELECT CAST(sum(CASE WHEN is_a THEN cents ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN NOT is_a THEN cents ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM pool
    ),
    lanes AS (
      SELECT pool.event_id, pool.cents, l.lane,
             CAST('0x' || substr(md5(CAST(pool.event_id AS VARCHAR)
                                     || '#' || CAST(l.lane AS VARCHAR)),
                                 1, 1) AS BIGINT) % 2 = 0 AS flag
      FROM pool CROSS JOIN (SELECT unnest(range(1, 21)) AS lane) l
    ),
    perm AS (
      SELECT lane,
             CAST(sum(CASE WHEN flag THEN cents ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN NOT flag THEN cents ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN NOT flag THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM lanes GROUP BY 1
    ),
    tstats AS (
      SELECT lane,
             floor(abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                   * 1e6 + 0.5) AS t_abs_micro
      FROM perm WHERE na > 0 AND nb > 0
    ),
    tobs AS (
      SELECT floor(abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                   * 1e6 + 0.5) AS t_obs_micro,
             na, nb
      FROM obs
    )
    SELECT CAST(t.t_obs_micro AS DOUBLE) / 1e6 AS t_obs_q,
           t.na, t.nb,
           CAST(count(*) FILTER (WHERE s.t_abs_micro >= t.t_obs_micro)
                AS BIGINT) AS n_exceed,
           floor((1.0 + count(*) FILTER (WHERE s.t_abs_micro >= t.t_obs_micro))
                 / 21.0 * 1e6 + 0.5) / 1e6 AS p_q
    FROM tstats s CROSS JOIN tobs t
    GROUP BY t.t_obs_micro, t.na, t.nb
    """,
)
def permutation_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic permutation test for the purchase-vs-click mean
    value gap — the distribution-free significance check next to the
    parametric z/t rows (abtest_conversion_ztest, welch_ttest): 20
    REPLAYABLE relabelings of the pooled rows via md5(event_id#lane)
    parity (the exchangeability-null device — no RNG, both engines
    derive the identical pseudo-permutation), each lane's |Δmean| in
    integer micro-cents, p = (1 + #{|T_perm| ≥ |T_obs|}) / 21 (the
    add-one rule that keeps p valid). Lanes are one
    crossJoin-explode + one 40-cell aggregate; every comparison
    happens on floor-quantized INTEGER micro-units, never
    float-vs-float."""
    e = T(spark, sf_dir, "events")
    pool = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").alias("is_a"),
    )
    obs = pool.agg(
        F.sum(F.when(F.col("is_a"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(~F.col("is_a"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("nb"),
    )
    lanes = pool.crossJoin(
        F.broadcast(
            spark.range(1, 21).select(F.col("id").cast("long").alias("lane"))
        )
    ).select(
        "cents",
        "lane",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"),
                            F.lit("#"),
                            F.col("lane").cast("string"),
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        ).alias("flag"),
    )
    perm = lanes.groupBy("lane").agg(
        F.sum(F.when(F.col("flag"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("flag"), 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(~F.col("flag"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.sum(F.when(~F.col("flag"), 1).otherwise(0)).cast("long").alias("nb"),
    )
    tmicro = lambda df: F.floor(  # noqa: E731
        F.abs(
            F.col("sa").cast("double") / F.col("na")
            - F.col("sb").cast("double") / F.col("nb")
        )
        * 1e6
        + 0.5
    )
    tstats = perm.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        tmicro(perm).alias("t_abs_micro")
    )
    tobs = obs.select(tmicro(obs).alias("t_obs_micro"), "na", "nb")
    return (
        tstats.crossJoin(F.broadcast(tobs))
        .groupBy("t_obs_micro", "na", "nb")
        .agg(
            F.sum(
                F.when(F.col("t_abs_micro") >= F.col("t_obs_micro"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_exceed")
        )
        .select(
            (F.col("t_obs_micro").cast("double") / 1e6).alias("t_obs_q"),
            "na",
            "nb",
            "n_exceed",
            (F.floor((1.0 + F.col("n_exceed")) / 21.0 * 1e6 + 0.5) / 1e6).alias(
                "p_q"
            ),
        )
    )


@_staged(
    "sprt_sequential_ab_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, d,
             CAST(sum(n) OVER w AS BIGINT) AS n_t,
             CAST(sum(c) OVER w AS BIGINT) AS c_t
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS UNBOUNDED PRECEDING)
    ),
    llr AS (
      SELECT event_type, d, n_t, c_t,
             CAST(floor((c_t * ln(0.30 / 0.25)
                         + (n_t - c_t) * ln(0.70 / 0.75)) * 1e9 + 0.5)
                  AS BIGINT) AS llr_nano
      FROM cum
    )
    SELECT event_type, d, n_t, c_t,
           CAST(llr_nano AS DOUBLE) / 1e9 AS llr_q,
           CASE WHEN llr_nano >= CAST(floor(ln(19.0) * 1e9 + 0.5) AS BIGINT)
                THEN 'accept_h1'
                WHEN llr_nano <= -CAST(floor(ln(19.0) * 1e9 + 0.5) AS BIGINT)
                THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr ORDER BY event_type, d
    """,
)
def sprt_sequential_ab_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over each event
    type's daily high-value rate (value > 250 as 'conversion') —
    the sequential-testing primitive mature experimentation
    platforms run so they can PEEK daily without alpha inflation
    (Wald 1945: H₀ p=0.25 vs H₁ p=0.30, α=β=0.05 → symmetric
    log-boundaries ±ln 19): LLR_t = c_t·ln(p₁/p₀) +
    (n_t−c_t)·ln((1−p₁)/(1−p₀)) over CUMULATIVE (n, c). Exact
    integer cumulative counts on per-type day-frame windows (the
    cusum pattern); the LLR is two integer-scaled log literals,
    floor-quantized to integer nano-units, and the boundary
    comparison happens INTEGER-vs-INTEGER (the burst-detection
    discipline at the decision boundary). Emits the full daily
    decision trail per type."""
    import math

    e = T(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 250, 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "event_type",
        "d",
        F.sum("n").over(w).cast("long").alias("n_t"),
        F.sum("c").over(w).cast("long").alias("c_t"),
    )
    l1 = math.log(0.30 / 0.25)
    l0 = math.log(0.70 / 0.75)
    bound = int(math.floor(math.log(19.0) * 1e9 + 0.5))
    llr_nano = F.floor(
        (F.col("c_t") * F.lit(l1) + (F.col("n_t") - F.col("c_t")) * F.lit(l0))
        * 1e9
        + 0.5
    ).cast("long")
    return (
        cum.withColumn("llr_nano", llr_nano)
        .select(
            "event_type",
            "d",
            "n_t",
            "c_t",
            (F.col("llr_nano").cast("double") / 1e9).alias("llr_q"),
            F.when(F.col("llr_nano") >= bound, "accept_h1")
            .when(F.col("llr_nano") <= -bound, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
        )
        .orderBy("event_type", "d")
    )


@_staged(
    "winsorized_mean_orders",
    """
    WITH o AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    cuts AS (
      SELECT priority,
             CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo,
             CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi
      FROM o GROUP BY 1
    ),
    w AS (
      SELECT o.priority,
             CASE WHEN o.cents < c.lo THEN c.lo
                  WHEN o.cents > c.hi THEN c.hi
                  ELSE o.cents END AS wc,
             CASE WHEN o.cents < c.lo THEN 1 ELSE 0 END AS clamped_lo,
             CASE WHEN o.cents > c.hi THEN 1 ELSE 0 END AS clamped_hi,
             o.cents
      FROM o JOIN cuts c USING (priority)
    )
    SELECT priority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(clamped_lo) AS BIGINT) AS n_clamped_lo,
           CAST(sum(clamped_hi) AS BIGINT) AS n_clamped_hi,
           floor(CAST(sum(wc) AS DOUBLE) / count(*) / 100 * 1e4 + 0.5) / 1e4
             AS winsor_mean_q,
           floor(CAST(sum(cents) AS DOUBLE) / count(*) / 100 * 1e4 + 0.5) / 1e4
             AS raw_mean_q
    FROM w GROUP BY 1 ORDER BY 1
    """,
)
def winsorized_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean order value per priority — the
    outlier-robust location estimate finance/ops dashboards quote
    when a single whale order shouldn't move the KPI (clamp to the
    exact DISCRETE p5/p95 per group, then average — unlike trimming
    it keeps n constant): percentile_disc returns actual data values
    (bit-comparable across engines, the a8b lesson), clamping is
    integer-vs-integer in cents, the winsorized sum stays an exact
    BIGINT, and only the final mean is a quantized float. One
    per-group percentile aggregate broadcast back over one
    clamp-and-sum pass."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cuts = o.groupBy("priority").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("hi"),
    )
    w = o.join(F.broadcast(cuts), "priority").select(
        "priority",
        "cents",
        F.when(F.col("cents") < F.col("lo"), F.col("lo"))
        .when(F.col("cents") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("cents"))
        .alias("wc"),
        F.when(F.col("cents") < F.col("lo"), 1).otherwise(0).alias("clamped_lo"),
        F.when(F.col("cents") > F.col("hi"), 1).otherwise(0).alias("clamped_hi"),
    )
    return (
        w.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("clamped_lo").cast("long").alias("n_clamped_lo"),
            F.sum("clamped_hi").cast("long").alias("n_clamped_hi"),
            F.sum("wc").cast("long").alias("swc"),
            F.sum("cents").cast("long").alias("sc"),
        )
        .select(
            "priority",
            "n",
            "n_clamped_lo",
            "n_clamped_hi",
            (
                F.floor(
                    F.col("swc").cast("double") / F.col("n") / 100 * 1e4 + 0.5
                )
                / 1e4
            ).alias("winsor_mean_q"),
            (
                F.floor(
                    F.col("sc").cast("double") / F.col("n") / 100 * 1e4 + 0.5
                )
                / 1e4
            ).alias("raw_mean_q"),
        )
        .orderBy("priority")
    )


@_staged(
    "median_of_means_orders",
    """
    WITH b AS (
      SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
                  AS BIGINT) % 16 AS bucket,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    bm AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) + 0.5)
                  AS BIGINT) AS mean_cents
      FROM b GROUP BY 1
    ),
    mom AS (
      SELECT CAST(quantile_disc(mean_cents, 0.5) AS BIGINT) AS mom_cents,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(min(n) AS BIGINT) AS min_bucket_n
      FROM bm
    ),
    raw AS (
      SELECT floor(CAST(sum(cents) AS DOUBLE) / count(*) / 100 * 1e4 + 0.5)
               / 1e4 AS raw_mean_q
      FROM b
    )
    SELECT m.n_buckets, m.min_bucket_n,
           CAST(m.mom_cents AS DOUBLE) / 100 AS mom_mean,
           r.raw_mean_q
    FROM mom m CROSS JOIN raw r
    """,
)
def median_of_means_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means estimator for order value — the
    heavy-tail-robust mean with exponential concentration (the MoM
    device behind robust statistics and sketch error bounds:
    Nemirovsky-Yudin / Jerrum-Valiant-Vazirani): rows land in 16
    DETERMINISTIC md5 buckets (no RNG — both engines replay the
    identical assignment), each bucket's mean is an exact
    BIGINT-cents ratio rounded to integer cents, and the estimate is
    the DISCRETE median of the 16 bucket means — one outlier bucket
    (a whale order) moves the raw mean but not the median of 16.
    Shuffle O(16 cells); the raw mean rides along as the contrast
    exhibit."""
    o = T(spark, sf_dir, "orders").select(
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2),
                16,
                10,
            ).cast("long")
            % 16
        ).alias("bucket"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bm = o.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor(F.sum("cents").cast("double") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("mean_cents"),
    )
    mom = bm.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_cents)")
        .cast("long")
        .alias("mom_cents"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.min("n").cast("long").alias("min_bucket_n"),
    )
    raw = o.agg(
        (
            F.floor(
                F.sum("cents").cast("double") / F.count(F.lit(1)) / 100 * 1e4
                + 0.5
            )
            / 1e4
        ).alias("raw_mean_q")
    )
    return mom.crossJoin(F.broadcast(raw)).select(
        "n_buckets",
        "min_bucket_n",
        (F.col("mom_cents").cast("double") / 100).alias("mom_mean"),
        "raw_mean_q",
    )


@_staged(
    "asof_forward_next_purchase",
    """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    nxt AS (
      SELECT user_id, event_type, us,
             min(CASE WHEN event_type = 'purchase' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_us
      FROM e
    ),
    views AS (
      SELECT user_id, us, next_purchase_us,
             (next_purchase_us IS NOT NULL
              AND next_purchase_us - us <= 259200000000) AS converted
      FROM nxt WHERE event_type = 'view'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_views,
           CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           CAST(quantile_disc(CASE WHEN converted
                                   THEN next_purchase_us - us END, 0.5)
                AS BIGINT) AS p50_gap_us,
           CAST(sum(CASE WHEN converted THEN next_purchase_us - us END)
                AS BIGINT) AS total_gap_us
    FROM views GROUP BY 1 ORDER BY 1
    """,
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance — the mirror of the
    backward PIT family (pit_join_purchases, training_matrix_pit
    look BACK for the latest state; attribution and time-to-convert
    look FORWARD for the next outcome): every view event picks the
    user's NEXT purchase within 72 h via one conditional frame-min
    (min over ROWS 1 FOLLOWING..UNBOUNDED of the purchase-only
    timestamp) on per-user hash-partitioned windows — the union-tag
    as-of device, no range-join explode, no per-row subquery. Gaps
    are exact integer MICROSECONDS (unix_micros/epoch_us — the
    fractional-epoch trap from duplicate_payment_pairs, solved at
    full precision), aggregated per user with a discrete-median gap.
    At 100 TB this is one shuffle on user_id."""
    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("us"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = e.select(
        "user_id",
        "event_type",
        "us",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        )
        .over(w)
        .alias("next_purchase_us"),
    )
    views = nxt.filter(F.col("event_type") == "view").select(
        "user_id",
        "us",
        "next_purchase_us",
        (
            F.col("next_purchase_us").isNotNull()
            & (F.col("next_purchase_us") - F.col("us") <= 259_200_000_000)
        ).alias("converted"),
    )
    gap = F.when(
        F.col("converted"), F.col("next_purchase_us") - F.col("us")
    )
    return (
        views.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.sum(F.when(F.col("converted"), 1).otherwise(0))
            .cast("long")
            .alias("n_converted"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY "
                "CASE WHEN converted THEN next_purchase_us - us END)"
            )
            .cast("long")
            .alias("p50_gap_us"),
            F.sum(gap).cast("long").alias("total_gap_us"),
        )
        .orderBy("user_id")
    )


@_staged(
    "bollinger_bands_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    roll AS (
      SELECT d, cents,
             CAST(count(*) OVER w AS BIGINT) AS wn,
             CAST(sum(cents) OVER w AS BIGINT) AS ws,
             CAST(sum(cents * cents) OVER w AS BIGINT) AS wss
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    bands AS (
      SELECT d, cents, wn, ws,
             CAST(ws AS DOUBLE) / wn AS mid,
             sqrt((CAST(wss AS DOUBLE) - CAST(ws AS DOUBLE) * ws / wn) / wn)
               AS sd
      FROM roll WHERE wn = 7
    )
    SELECT d, cents,
           floor(mid * 1e2 + 0.5) / 1e2 AS mid_q,
           floor((mid - 2 * sd) * 1e2 + 0.5) / 1e2 AS lower_q,
           floor((mid + 2 * sd) * 1e2 + 0.5) / 1e2 AS upper_q,
           (CAST(cents AS DOUBLE) * wn > CAST(ws AS DOUBLE) + 2 * sd * wn)
             AS above_upper,
           (CAST(cents AS DOUBLE) * wn < CAST(ws AS DOUBLE) - 2 * sd * wn)
             AS below_lower
    FROM bands ORDER BY d
    """,
)
def bollinger_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily total event value — the
    rolling-mean ± 2σ control chart (the finance/monitoring
    companion to cusum's drift detector and stl_anomaly's robust
    gate): 7-day trailing window, variance from exact integer
    (Σc, Σc², n) window sums, warm-up rows (window < 7 days)
    DROPPED rather than emitted with a shrunken window — the
    convention mismatch that silently reds cross-engine band
    charts. The band-crossing FLAGS are integer-vs-float
    cross-multiplications c·n vs Σ ± 2σ·n (the burst-detection
    discipline: the decision boundary never compares two
    quantized floats). The trailing window is a CALENDAR SELF-JOIN
    on the bounded day frame (the burst_days/durbin_watson device —
    no global-order window exchange; the ROWS frame and the
    day-range join coincide because the daily aggregate has exactly
    one row per day)."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents")
    )
    l = daily.select(F.col("d"), F.col("cents"))
    r = daily.select(F.col("d").alias("d2"), F.col("cents").alias("c2"))
    roll = (
        l.join(
            r,
            (F.col("d2") >= F.date_sub(F.col("d"), 6)) & (F.col("d2") <= F.col("d")),
        )
        .groupBy("d", "cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("wn"),
            F.sum("c2").cast("long").alias("ws"),
            F.sum(F.col("c2") * F.col("c2")).cast("long").alias("wss"),
        )
        .filter(F.col("wn") == 7)
    )
    mid = F.col("ws").cast("double") / F.col("wn")
    sd = F.sqrt(
        (
            F.col("wss").cast("double")
            - F.col("ws").cast("double") * F.col("ws") / F.col("wn")
        )
        / F.col("wn")
    )
    return roll.select(
        "d",
        "cents",
        (F.floor(mid * 1e2 + 0.5) / 1e2).alias("mid_q"),
        (F.floor((mid - 2 * sd) * 1e2 + 0.5) / 1e2).alias("lower_q"),
        (F.floor((mid + 2 * sd) * 1e2 + 0.5) / 1e2).alias("upper_q"),
        (
            F.col("cents").cast("double") * F.col("wn")
            > F.col("ws").cast("double") + 2 * sd * F.col("wn")
        ).alias("above_upper"),
        (
            F.col("cents").cast("double") * F.col("wn")
            < F.col("ws").cast("double") - 2 * sd * F.col("wn")
        ).alias("below_lower"),
    ).orderBy("d")

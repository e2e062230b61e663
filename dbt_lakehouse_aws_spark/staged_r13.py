"""Round-13+ STAGED queries — work built after the round-12 window
inventory (staged_r11's 4 tail + staged_r12's 46) was already full.
Same staging discipline: every entry carries its oracle and is
pytest-verified each session by ``tests/test_staged_r6.py``.
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
    "histogram_equi_depth_orders",
    """
    WITH d AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS usd FROM orders
    ),
    br AS (
      SELECT quantile_cont(usd, [0.125, 0.25, 0.375, 0.5,
                                 0.625, 0.75, 0.875]) AS q
      FROM d
    ),
    b AS (
      SELECT CAST(CASE
               WHEN usd <= q[1] THEN 0 WHEN usd <= q[2] THEN 1
               WHEN usd <= q[3] THEN 2 WHEN usd <= q[4] THEN 3
               WHEN usd <= q[5] THEN 4 WHEN usd <= q[6] THEN 5
               WHEN usd <= q[7] THEN 6 ELSE 7 END AS BIGINT) AS bucket,
             usd
      FROM d, br
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(min(usd) AS BIGINT) AS lo,
           CAST(max(usd) AS BIGINT) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equi_depth_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH 8-bucket histogram (the optimizer's-statistics
    sibling of the equi-width row): bucket boundaries at the exact
    octile percentiles, buckets then carry ~equal row counts however
    skewed the values — the shape ANALYZE TABLE sketches and range
    partitioners both want. One percentile aggregate broadcast onto
    the scan; whole-dollar integers anchor the interpolation on both
    engines."""
    o = T(spark, sf_dir, "orders")
    d = o.select(F.round("o_totalprice").cast("long").alias("usd"))
    br = d.agg(
        F.expr(
            "percentile(usd, array(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875))"
        ).alias("q")
    )
    j = d.crossJoin(F.broadcast(br))
    bucket = (
        F.when(F.col("usd") <= F.col("q")[0], 0)
        .when(F.col("usd") <= F.col("q")[1], 1)
        .when(F.col("usd") <= F.col("q")[2], 2)
        .when(F.col("usd") <= F.col("q")[3], 3)
        .when(F.col("usd") <= F.col("q")[4], 4)
        .when(F.col("usd") <= F.col("q")[5], 5)
        .when(F.col("usd") <= F.col("q")[6], 6)
        .otherwise(7)
        .cast("long")
    )
    return (
        j.select(bucket.alias("bucket"), "usd")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("usd").cast("long").alias("lo"),
            F.max("usd").cast("long").alias("hi"),
        )
        .orderBy("bucket")
    )


@_staged(
    "mood_median_test_orders",
    """
    WITH d AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    med AS (SELECT quantile_cont(usd, 0.5) AS m FROM d),
    cells AS (
      SELECT grp,
             CAST(sum(CASE WHEN usd > m THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN usd <= m THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM d, med GROUP BY grp
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
             CAST(sum(a + b) AS BIGINT) AS nn
      FROM cells
    ),
    chi AS (
      SELECT CAST(sum(CAST(round(
               (a - CAST((a + b) AS DOUBLE) * ta / nn)
               * (a - CAST((a + b) AS DOUBLE) * ta / nn)
               / (CAST((a + b) AS DOUBLE) * ta / nn) * 1e9) AS BIGINT)
             + CAST(round(
               (b - CAST((a + b) AS DOUBLE) * tb / nn)
               * (b - CAST((a + b) AS DOUBLE) * tb / nn)
               / (CAST((a + b) AS DOUBLE) * tb / nn) * 1e9) AS BIGINT))
             AS BIGINT) AS chi_int
      FROM cells, tot
    )
    SELECT CAST((SELECT count(*) FROM cells) AS BIGINT) AS k_groups,
           floor((CAST(chi_int AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
             AS mood_chi2_q,
           ((CAST(chi_int AS DOUBLE) / 1e9) > 9.488) AS reject_at_5pct
    FROM chi
    """,
)
def mood_median_test_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five priorities: the 2×k χ²
    over above/below-grand-median counts (df = k−1, critical 9.488)
    — the coarse-but-assumption-free location test next to the
    Kruskal-Wallis rank row. Counts are integers; the ten χ² cell
    terms are quantized to 1e-9 integers before summing."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice").cast("long").alias("usd"),
    )
    med = d.agg(F.expr("percentile(usd, 0.5)").alias("m"))
    cells = (
        d.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum(F.when(F.col("usd") > F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("usd") <= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("b"),
        )
    )
    tot = cells.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
        F.sum(F.col("a") + F.col("b")).cast("long").alias("nn"),
    )
    ea = (F.col("a") + F.col("b")).cast("double") * F.col("ta") / F.col("nn")
    eb = (F.col("a") + F.col("b")).cast("double") * F.col("tb") / F.col("nn")
    chi = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            (
                F.round((F.col("a") - ea) * (F.col("a") - ea) / ea * 1e9).cast("long")
                + F.round((F.col("b") - eb) * (F.col("b") - eb) / eb * 1e9).cast(
                    "long"
                )
            ).alias("cell_q"),
        )
        .agg(F.sum("cell_q").cast("long").alias("chi_int"))
    )
    k = cells.count()
    stat = F.col("chi_int").cast("double") / 1e9
    return chi.select(
        F.lit(k).cast("long").alias("k_groups"),
        (F.floor(stat * 1e6 + 0.5) / 1e6).alias("mood_chi2_q"),
        (stat > 9.488).alias("reject_at_5pct"),
    )


@_staged(
    "price_elasticity_loglog_lineitem",
    """
    WITH d AS (
      SELECT p.p_brand,
             CAST(round((ln(l.l_quantity) - 2) * 1e4) AS BIGINT) AS ly,
             CAST(round((ln(l.l_extendedprice / l.l_quantity) - 7) * 1e4)
                  AS BIGINT) AS lx
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    st AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
             CAST(sum(lx * lx) AS BIGINT) AS sxx,
             CAST(sum(lx * ly) AS BIGINT) AS sxy
      FROM d GROUP BY 1
    )
    SELECT p_brand, n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
                 * 1e6 + 0.5) / 1e6 AS elasticity_q
    FROM st ORDER BY p_brand
    """,
)
def price_elasticity_loglog_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: the log-log OLS slope
    of ln(quantity) on ln(unit price) — the constant-elasticity
    model every pricing team fits first. The broadcast part-dim join
    feeds CENTERED integer-quantized logs (anchors ln≈7 / ln≈2, 1e-4
    grid — centering keeps n·Σx² inside BIGINT through sf1.0 where a
    raw 1e-6 grid overflowed), so the per-brand OLS runs on BIGINT
    sufficient statistics; slope is centering-invariant. One scan,
    one broadcast join, one aggregate at any scale."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    d = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        F.round((F.log(F.col("l_quantity")) - 2) * 1e4).cast("long").alias("ly"),
        F.round(
            (F.log(F.col("l_extendedprice") / F.col("l_quantity")) - 7) * 1e4
        )
        .cast("long")
        .alias("lx"),
    )
    st = d.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return st.select(
        "p_brand", "n", (F.floor(slope * 1e6 + 0.5) / 1e6).alias("elasticity_q")
    ).orderBy("p_brand")


@_staged(
    "quantile_sketch_bound_orders",
    """
    WITH d AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    g AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             quantile_cont(usd, 0.495) AS lo50,
             quantile_cont(usd, 0.505) AS hi50,
             quantile_cont(usd, 0.5) AS ex50,
             quantile_cont(usd, 0.895) AS lo90,
             quantile_cont(usd, 0.905) AS hi90,
             quantile_cont(usd, 0.9) AS ex90
      FROM d GROUP BY 1
    )
    SELECT grp, n,
           floor(ex50 * 1e6 + 0.5) / 1e6 AS exact_p50_q,
           floor(ex90 * 1e6 + 0.5) / 1e6 AS exact_p90_q,
           TRUE AS p50_bound_ok, TRUE AS p90_bound_ok
    FROM g ORDER BY grp
    """,
)
def quantile_sketch_bound_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tolerance-checked quantile-sketch audit — the
    hll/kmv_error_bound device applied to approx_percentile
    (Greenwald-Khanna style ε-rank guarantee): the engine's sketch
    p50/p90 must land inside the EXACT [p−0.005, p+0.005] rank
    window (accuracy=10000 ⇒ rank error 1e-4, so the 5e-3 margin is
    50× slack — a false flag means broken sketch plumbing, not
    sketch luck). The sketch values are engine-specific, so the
    oracle pins (group, n, exact quantiles, bound-holds) — the
    production rollup reads the KB-sized sketch; the exact pass
    exists only to audit it."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice").cast("long").alias("usd"),
    )
    g = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("approx_percentile(usd, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(usd, 0.9, 10000)").alias("a90"),
        F.expr("percentile(usd, 0.495)").alias("lo50"),
        F.expr("percentile(usd, 0.505)").alias("hi50"),
        F.expr("percentile(usd, 0.5)").alias("ex50"),
        F.expr("percentile(usd, 0.895)").alias("lo90"),
        F.expr("percentile(usd, 0.905)").alias("hi90"),
        F.expr("percentile(usd, 0.9)").alias("ex90"),
    )
    return g.select(
        "grp",
        "n",
        (F.floor(F.col("ex50") * 1e6 + 0.5) / 1e6).alias("exact_p50_q"),
        (F.floor(F.col("ex90") * 1e6 + 0.5) / 1e6).alias("exact_p90_q"),
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias(
            "p50_bound_ok"
        ),
        ((F.col("a90") >= F.col("lo90")) & (F.col("a90") <= F.col("hi90"))).alias(
            "p90_bound_ok"
        ),
    ).orderBy("grp")


@_staged(
    "ridge_2feature_daily",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x1,
             CAST(CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                       THEN 1 ELSE 0 END AS BIGINT) AS x2,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS y
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x2 * x2) AS BIGINT) AS s22,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x1 * y) AS BIGINT) AS s1y,
             CAST(sum(x2 * y) AS BIGINT) AS s2y
      FROM daily
    ),
    c AS (
      SELECT n,
             (s11 - CAST(s1 AS DOUBLE) * s1 / n) + 10.0 AS a11,
             (s22 - CAST(s2 AS DOUBLE) * s2 / n) + 10.0 AS a22,
             (s12 - CAST(s1 AS DOUBLE) * s2 / n) AS a12,
             (s1y - CAST(s1 AS DOUBLE) * sy / n) AS b1,
             (s2y - CAST(s2 AS DOUBLE) * sy / n) AS b2
      FROM st
    )
    SELECT n,
           floor((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12)
                 * 1e6 + 0.5) / 1e6 AS beta_trend_q,
           floor((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12)
                 * 1e6 + 0.5) / 1e6 AS beta_weekend_q
    FROM c
    """,
)
def ridge_2feature_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (λ=10, centered 2-feature normal
    equations inverted analytically) of daily revenue on the day
    trend and a weekend indicator — the regularized sibling of the
    OLS rows, the 2×2 case every feature-attribution sanity check
    starts from. Sufficient statistics are BIGINT-exact (whole
    dollars, 0/1 and day-index features); the matrix solve is four
    deterministic double expressions."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x1"),
        F.when(F.dayofweek(F.to_date("ts")).isin(1, 7), 1)
        .otherwise(0)
        .cast("long")
        .alias("x2"),
    ).agg(
        F.floor(F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
        .cast("long")
        .alias("y")
    )
    st = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    a11 = (F.col("s11") - F.col("s1").cast("double") * F.col("s1") / F.col("n")) + 10.0
    a22 = (F.col("s22") - F.col("s2").cast("double") * F.col("s2") / F.col("n")) + 10.0
    a12 = F.col("s12") - F.col("s1").cast("double") * F.col("s2") / F.col("n")
    b1 = F.col("s1y") - F.col("s1").cast("double") * F.col("sy") / F.col("n")
    b2 = F.col("s2y") - F.col("s2").cast("double") * F.col("sy") / F.col("n")
    det = a11 * a22 - a12 * a12
    return st.select(
        "n",
        (F.floor((a22 * b1 - a12 * b2) / det * 1e6 + 0.5) / 1e6).alias(
            "beta_trend_q"
        ),
        (F.floor((a11 * b2 - a12 * b1) / det * 1e6 + 0.5) / 1e6).alias(
            "beta_weekend_q"
        ),
    )


@_staged(
    "vocab_coverage_curve_docs",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS v FROM c),
    rk AS (
      SELECT a.t, a.c, CAST(count(*) AS BIGINT) AS rank
      FROM c a JOIN c b
        ON (b.c > a.c) OR (b.c = a.c AND b.t <= a.t)
      GROUP BY a.t, a.c
    ),
    ks AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 10000000]) AS BIGINT) AS k)
    SELECT least(ks.k, (SELECT v FROM tot)) AS k,
           CAST(sum(CASE WHEN rk.rank <= ks.k THEN rk.c ELSE 0 END)
                AS BIGINT) AS covered,
           floor(CAST(sum(CASE WHEN rk.rank <= ks.k THEN rk.c ELSE 0 END)
                      AS DOUBLE) / (SELECT nn FROM tot) * 1e6 + 0.5) / 1e6
             AS coverage_q
    FROM ks CROSS JOIN rk
    GROUP BY 1 ORDER BY 1
    """,
)
def vocab_coverage_curve_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of token INSTANCES
    covered by the top-k most frequent types, k ∈ {1,2,4,8,16,all} —
    the readout that sizes tokenizer vocabularies and stopword lists
    (the Zipf row's integral form). Ranking uses a bounded self-join
    over the TYPE table (types are bounded by the language, not the
    corpus — never a global window over rows); counts stay integer
    to the final ratio."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
    c = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = c.agg(
        F.sum("c").cast("long").alias("nn"), F.count(F.lit(1)).cast("long").alias("v")
    )
    c2 = c.select(F.col("t").alias("t2"), F.col("c").alias("cc2"))
    rk = (
        c.join(
            F.broadcast(c2),
            (F.col("cc2") > F.col("c"))
            | ((F.col("cc2") == F.col("c")) & (F.col("t2") <= F.col("t"))),
        )
        .groupBy("t", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("rank"))
    )
    ks = d.sparkSession.createDataFrame(
        [(1,), (2,), (4,), (8,), (16,), (10000000,)], "k LONG"
    )
    j = rk.crossJoin(F.broadcast(ks)).crossJoin(F.broadcast(tot))
    return (
        j.groupBy(F.least(F.col("k"), F.col("v")).alias("k"))
        .agg(
            F.sum(F.when(F.col("rank") <= F.col("k"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("rank") <= F.col("k"), F.col("c")).otherwise(0)
                    ).cast("double")
                    / F.max("nn")
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("coverage_q"),
        )
        .orderBy("k")
    )


@_staged(
    "zero_inflation_audit_events",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
    per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT)
               AS cells_hit
      FROM events GROUP BY 1
    )
    SELECT event_type,
           CAST(nu.n_users * 30 AS BIGINT) AS n_cells,
           CAST(nu.n_users * 30 - cells_hit AS BIGINT) AS observed_zeros,
           floor(CAST(n_events AS DOUBLE) / (nu.n_users * 30) * 1e6 + 0.5)
             / 1e6 AS lambda_q,
           floor(nu.n_users * 30
                 * exp(-(CAST(n_events AS DOUBLE) / (nu.n_users * 30)))
                 * 1e6 + 0.5) / 1e6 AS expected_zeros_q,
           floor((nu.n_users * 30 - cells_hit)
                 / (nu.n_users * 30
                    * exp(-(CAST(n_events AS DOUBLE) / (nu.n_users * 30))))
                 * 1e6 + 0.5) / 1e6 AS inflation_ratio_q
    FROM per, nu ORDER BY event_type
    """,
)
def zero_inflation_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflation audit for per-(user, day) event counts: the
    observed empty-cell count against the Poisson(λ̂) expectation —
    the diagnostic that decides between Poisson and ZIP/NB count
    models (ratio ≫ 1 ⇒ excess zeros) and complements the
    dispersion-index row. The user×30-day grid never materializes:
    zeros = n_users·30 − distinct hit cells, all integer
    aggregates."""
    e = T(spark, sf_dir, "events")
    nu = e.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(F.col("user_id"), F.to_date("ts"))
        .cast("long")
        .alias("cells_hit"),
    )
    lam = F.col("n_events").cast("double") / (F.col("n_users") * 30)
    ez = F.col("n_users") * 30 * F.exp(-lam)
    return (
        per.crossJoin(F.broadcast(nu))
        .select(
            "event_type",
            (F.col("n_users") * 30).cast("long").alias("n_cells"),
            (F.col("n_users") * 30 - F.col("cells_hit"))
            .cast("long")
            .alias("observed_zeros"),
            (F.floor(lam * 1e6 + 0.5) / 1e6).alias("lambda_q"),
            (F.floor(ez * 1e6 + 0.5) / 1e6).alias("expected_zeros_q"),
            (
                F.floor((F.col("n_users") * 30 - F.col("cells_hit")) / ez * 1e6 + 0.5)
                / 1e6
            ).alias("inflation_ratio_q"),
        )
        .orderBy("event_type")
    )

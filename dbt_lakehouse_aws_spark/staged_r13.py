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


def _ivf_recall_oracle() -> str:
    """Recall@5 of the fixed-centroid IVF index vs exact cosine, at
    nprobe ∈ {1,2,4} — the queries_llm._ivf_oracle CTE machinery
    with an exact-ranking CTE and a recall join on top."""
    from dbt_lakehouse_aws_spark.queries_llm import _ivf_fixed_centroids

    cents = _ivf_fixed_centroids()
    rows = ", ".join(
        f"({c}, {[float(x) for x in cents[c]]!r})" for c in range(16)
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 64) AS DOUBLE)) AS emb
      FROM embeddings
    ),
    cb(cell, cv) AS (SELECT * FROM (VALUES {rows}) t(cell, cv)),
    dist AS (
      SELECT v.vec_id, cb.cell,
             list_sum(list_transform(range(1, 65),
                      i -> pow(emb[i] - cv[i], 2))) AS d2
      FROM v CROSS JOIN cb
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM dist) WHERE rn = 1
    ),
    proberank AS (
      SELECT vec_id AS query_id, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS prn
      FROM dist WHERE vec_id < 10
    ),
    np AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
    scored AS (
      SELECT np.nprobe, p.query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(qv.emb, nv.emb)
                   / (sqrt(list_dot_product(qv.emb, qv.emb))
                      * sqrt(list_dot_product(nv.emb, nv.emb))), 6) AS cosine
      FROM np JOIN proberank p ON p.prn <= np.nprobe
      JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
      JOIN v qv ON qv.vec_id = p.query_id
      JOIN v nv ON nv.vec_id = a.vec_id
    ),
    ivf5 AS (
      SELECT nprobe, query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY nprobe, query_id
                  ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)
      WHERE rn <= 5
    ),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb)
                   / (sqrt(list_dot_product(q.emb, q.emb))
                      * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
      FROM v q JOIN v c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 10
    ),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS rn FROM exact)
      WHERE rn <= 5
    ),
    hits AS (
      SELECT i.nprobe, i.query_id, CAST(count(e.neighbor_id) AS BIGINT) AS h
      FROM ivf5 i LEFT JOIN exact5 e
        ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
      GROUP BY 1, 2
    )
    SELECT nprobe,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(h) AS BIGINT) AS hits_at_5,
           floor(CAST(sum(h) AS DOUBLE) / (count(*) * 5) * 1e6 + 0.5) / 1e6
             AS recall_at_5_q
    FROM hits GROUP BY nprobe ORDER BY nprobe
    """


@_staged("ivf_probe_recall_curve_embeddings", "PLACEHOLDER_IVF_RECALL")
def ivf_probe_recall_curve_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN tuning curve every vector-store deployment reads
    before fixing nprobe: recall@5 of the IVF index against exact
    cosine at nprobe ∈ {1,2,4}, on the integer-quantized vectors and
    closed-form integer coarse quantizer of `ann_ivf_topk` (so both
    the index AND the exact ranking replay bit-identically in SQL).
    Rides the production ann_search_ivf path three times — cell
    assignment is bucketed, the exact pass exists only as the
    ground-truth audit, and recall is an integer hit-count ratio."""
    import numpy as _np

    from dbt_lakehouse_aws_spark.llmops.similarity import ann_search_ivf
    from dbt_lakehouse_aws_spark.queries_llm import _ivf_fixed_centroids

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 64).cast("double"),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    cents = _np.array(_ivf_fixed_centroids(), dtype=_np.float64)

    # exact ground truth on the same quantized vectors
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = q.crossJoin(e.withColumnRenamed("vec_id", "neighbor_id")).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("embedding"))
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv")))
                * F.sqrt(dot(F.col("embedding"), F.col("embedding")))
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact5 = (
        cos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )

    out = None
    for nprobe in (1, 2, 4):
        ivf = ann_search_ivf(
            e,
            query_ids=range(10),
            k=5,
            n_cells=16,
            nprobe=nprobe,
            centroids=cents,
            metric="l2",
        ).select("query_id", "neighbor_id")
        part = (
            ivf.join(F.broadcast(exact5), ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("_hit").cast("long").alias("h"))
            .agg(
                F.lit(nprobe).cast("long").alias("nprobe"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.sum("h").cast("long").alias("hits_at_5"),
                (
                    F.floor(
                        F.sum("h").cast("double")
                        / (F.count(F.lit(1)) * 5)
                        * 1e6
                        + 0.5
                    )
                    / 1e6
                ).alias("recall_at_5_q"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("nprobe")


STAGED_ORACLES["ivf_probe_recall_curve_embeddings"] = _ivf_recall_oracle()


def _DAILY(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily revenue in whole dollars (the staged_r12
    _daily_type_df shape, local to this module)."""
    e = T(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(
        F.floor(F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
        .cast("long")
        .alias("y")
    )


@_staged(
    "hampel_filter_daily",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS y
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT a.event_type, a.x, a.y,
             quantile_cont(b.y, 0.5) AS med7,
             CAST(count(*) AS BIGINT) AS w
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.x BETWEEN a.x - 3 AND a.x + 3
      GROUP BY 1, 2, 3
    ),
    mad AS (
      SELECT m.event_type, m.x, m.y, m.med7, m.w,
             quantile_cont(abs(b.y - m.med7), 0.5) AS mad7
      FROM med m JOIN daily b
        ON b.event_type = m.event_type AND b.x BETWEEN m.x - 3 AND m.x + 3
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT event_type, x, y,
           floor(med7 * 1e6 + 0.5) / 1e6 AS med7_q,
           floor(mad7 * 1e6 + 0.5) / 1e6 AS mad7_q,
           (abs(y - med7) > 3 * 1.4826 * mad7) AS outlier
    FROM mad WHERE w = 7
    ORDER BY event_type, x
    """,
)
def hampel_filter_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel identifier over each event type's daily revenue: a
    centered 7-day rolling median and rolling MAD, flagging days
    beyond 3·1.4826·MAD — the robust despiking filter every
    telemetry pipeline runs before trend fits (immune to the very
    outliers a z-score filter would absorb). Both rolling medians
    ride day-bounded self-joins (≤7·n pairs per type on the fixed
    30-day window — never a sort), and edges with partial windows
    are excluded (w=7), which pins the estimand exactly."""
    daily = _DAILY(spark, sf_dir)
    b = daily.select(
        F.col("event_type").alias("et2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    med = (
        daily.join(
            b,
            (F.col("et2") == F.col("event_type"))
            & (F.col("x2") >= F.col("x") - 3)
            & (F.col("x2") <= F.col("x") + 3),
        )
        .groupBy("event_type", "x", "y")
        .agg(
            F.expr("percentile(y2, 0.5)").alias("med7"),
            F.count(F.lit(1)).cast("long").alias("w"),
        )
    )
    mad = (
        med.join(
            b,
            (F.col("et2") == F.col("event_type"))
            & (F.col("x2") >= F.col("x") - 3)
            & (F.col("x2") <= F.col("x") + 3),
        )
        .groupBy("event_type", "x", "y", "med7", "w")
        .agg(F.expr("percentile(abs(y2 - med7), 0.5)").alias("mad7"))
    )
    return (
        mad.filter(F.col("w") == 7)
        .select(
            "event_type",
            "x",
            "y",
            (F.floor(F.col("med7") * 1e6 + 0.5) / 1e6).alias("med7_q"),
            (F.floor(F.col("mad7") * 1e6 + 0.5) / 1e6).alias("mad7_q"),
            (
                F.abs(F.col("y") - F.col("med7")) > 3 * 1.4826 * F.col("mad7")
            ).alias("outlier"),
        )
        .orderBy("event_type", "x")
    )


@_staged(
    "rsi_14_daily_events",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS y
      FROM events GROUP BY 1, 2
    ),
    delta AS (
      SELECT event_type, x,
             y - lag(y) OVER (PARTITION BY event_type ORDER BY x) AS d,
             row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn
      FROM daily
    ),
    rolled AS (
      SELECT event_type, x, rn,
             CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS BIGINT)
               AS sg,
             CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w AS BIGINT)
               AS sl
      FROM delta
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, x,
           floor(100.0 * sg / (sg + sl) * 1e6 + 0.5) / 1e6 AS rsi_q,
           (100.0 * sg / (sg + sl) > 70) AS overbought,
           (100.0 * sg / (sg + sl) < 30) AS oversold
    FROM rolled WHERE rn >= 15 AND sg + sl > 0
    ORDER BY event_type, x
    """,
)
def rsi_14_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (Cutler's SMA form — the arithmetic variant, so
    the statistic is a pure ratio of integer gain/loss sums with no
    recursive smoothing to drift across engines) per event type's
    daily revenue, with the classic 70/30 overbought/oversold flags.
    Only complete 14-delta windows emit (rn ≥ 15). The momentum
    sibling of the Bollinger and drawdown rows."""
    daily = _DAILY(spark, sf_dir)
    w0 = Window.partitionBy("event_type").orderBy("x")
    delta = daily.select(
        "event_type",
        "x",
        (F.col("y") - F.lag("y").over(w0)).alias("d"),
        F.row_number().over(w0).alias("rn"),
    )
    wr = w0.rowsBetween(-13, 0)
    rolled = delta.select(
        "event_type",
        "x",
        "rn",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0))
        .over(wr)
        .cast("long")
        .alias("sg"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0))
        .over(wr)
        .cast("long")
        .alias("sl"),
    )
    rsi = 100.0 * F.col("sg") / (F.col("sg") + F.col("sl"))
    return (
        rolled.filter((F.col("rn") >= 15) & (F.col("sg") + F.col("sl") > 0))
        .select(
            "event_type",
            "x",
            (F.floor(rsi * 1e6 + 0.5) / 1e6).alias("rsi_q"),
            (rsi > 70).alias("overbought"),
            (rsi < 30).alias("oversold"),
        )
        .orderBy("event_type", "x")
    )


@_staged(
    "chao1_vocab_estimate_docs",
    """
    WITH tri AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2),
                                  ' '))) AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY 1),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS observed,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(c) AS BIGINT) AS n_instances
      FROM c
    )
    SELECT observed, f1, f2, n_instances,
           floor((observed + CAST(f1 AS DOUBLE) * f1 / (2 * (f2 + 1))
                  - CAST(f1 AS DOUBLE) * f2 / (2 * (f2 + 1) * (f2 + 1)))
                 * 1e6 + 0.5) / 1e6 AS chao1_q,
           floor(CAST(f1 AS DOUBLE) / n_instances * 1e6 + 0.5) / 1e6
             AS singleton_rate_q
    FROM st
    """,
)
def chao1_vocab_estimate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimate of the UNSEEN trigram vocabulary
    (bias-corrected form, Chao 1984): observed types +
    f₁²/(2(f₂+1)) − f₁f₂/(2(f₂+1)²) from singleton/doubleton counts
    — the "how much vocabulary has this corpus NOT seen yet"
    estimator that pairs with the Heaps-curve row (growth observed
    vs ceiling estimated), plus the Good-Turing singleton rate
    (P(next trigram is novel)). One explode + counts-of-counts."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("tokens")).filter(
        F.size("tokens") >= 3
    )
    tri = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(tokens) - 3), "
                "i -> concat_ws(' ', slice(tokens, i + 1, 3)))"
            )
        ).alias("t")
    )
    c = tri.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    st = c.agg(
        F.count(F.lit(1)).cast("long").alias("observed"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
        F.sum("c").cast("long").alias("n_instances"),
    )
    f1d = F.col("f1").cast("double")
    chao = (
        F.col("observed")
        + f1d * F.col("f1") / (2 * (F.col("f2") + 1))
        - f1d * F.col("f2") / (2 * (F.col("f2") + 1) * (F.col("f2") + 1))
    )
    return st.select(
        "observed",
        "f1",
        "f2",
        "n_instances",
        (F.floor(chao * 1e6 + 0.5) / 1e6).alias("chao1_q"),
        (
            F.floor(f1d / F.col("n_instances") * 1e6 + 0.5) / 1e6
        ).alias("singleton_rate_q"),
    )


@_staged(
    "good_turing_counts_docs",
    """
    WITH tri AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2),
                                  ' '))) AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY 1),
    coc AS (
      SELECT c AS r, CAST(count(*) AS BIGINT) AS nr
      FROM c GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(r * nr) AS BIGINT) AS n FROM coc)
    SELECT a.r, a.nr,
           floor((a.r + 1) * CAST(coalesce(b.nr, 0) AS DOUBLE) / a.nr
                 * 1e6 + 0.5) / 1e6 AS r_star_q,
           floor((a.r + 1) * CAST(coalesce(b.nr, 0) AS DOUBLE) / a.nr
                 / (SELECT n FROM tot) * 1e9 + 0.5) / 1e9 AS p_gt_q
    FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
    WHERE a.r <= 5
    ORDER BY a.r
    """,
)
def good_turing_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* = (r+1)·N_{r+1}/N_r for the
    low-frequency trigram classes (r ≤ 5) and the implied smoothed
    probabilities — the counts-of-counts discount every classical
    LM backoff (Katz, SGT) builds on, complementing the Kneser-Ney
    row with the estimator KN itself approximates. Two integer
    aggregations and a self-join on r+1; floats only in the final
    quantized ratios."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("tokens")).filter(
        F.size("tokens") >= 3
    )
    tri = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(tokens) - 3), "
                "i -> concat_ws(' ', slice(tokens, i + 1, 3)))"
            )
        ).alias("t")
    )
    c = tri.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    coc = c.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("nr")
    )
    tot = coc.agg(F.sum(F.col("r") * F.col("nr")).cast("long").alias("n"))
    b = coc.select((F.col("r") - 1).alias("r"), F.col("nr").alias("nr1"))
    rstar = (F.col("r") + 1) * F.coalesce(F.col("nr1"), F.lit(0)).cast(
        "double"
    ) / F.col("nr")
    return (
        coc.join(b, "r", "left")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("r") <= 5)
        .select(
            "r",
            "nr",
            (F.floor(rstar * 1e6 + 0.5) / 1e6).alias("r_star_q"),
            (F.floor(rstar / F.col("n") * 1e9 + 0.5) / 1e9).alias("p_gt_q"),
        )
        .orderBy("r")
    )

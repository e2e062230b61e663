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

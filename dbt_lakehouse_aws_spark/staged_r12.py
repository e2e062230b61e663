"""Round-12+ STAGED queries — work built after the round-11 window
inventory (staged_r10's 2 tail + staged_r11's 48) was already full.
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
    "rank_function_gauntlet_orders",
    """
    WITH base AS (
      SELECT o_orderpriority AS prio, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 53 = 0
    )
    SELECT prio, o_orderkey, cents,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS prank_q,
           floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume_q,
           CAST(nth_value(o_orderkey, 2) OVER
                  (PARTITION BY prio ORDER BY cents DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS second_key,
           CAST(lag(cents, 1, -1) OVER w AS BIGINT) AS prev_cents,
           CAST(lead(cents, 2) OVER w AS BIGINT) AS next2_cents,
           CAST(first_value(o_orderkey) OVER
                  (PARTITION BY prio ORDER BY cents DESC, o_orderkey)
                AS BIGINT) AS top_key
    FROM base
    WINDOW w AS (PARTITION BY prio ORDER BY cents DESC, o_orderkey)
    ORDER BY prio, rnk, o_orderkey
    """,
)
def rank_function_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function gauntlet — the window functions the frame
    gauntlet (window_frame_gauntlet_orders, queries_r7) didn't
    cover: rank vs dense_rank gap semantics, percent_rank's
    (rank−1)/(n−1) vs cume_dist's rank/n normalizations (quantized —
    both are exact rationals), nth_value with an EXPLICIT running
    frame (default frames for nth_value differ across engines — the
    gauntlet pins ROWS UNBOUNDED PRECEDING..CURRENT ROW so row 1
    sees NULL), lag with an explicit default (-1, exercising the
    3-arg form), lead at offset 2, and first_value on the default
    frame. Total order inside each partition via the (cents DESC,
    key) tiebreak; per-priority hash-partitioned windows."""
    base = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 53 == 0)
        .select(
            F.col("o_orderpriority").alias("prio"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("prio").orderBy(F.desc("cents"), F.asc("o_orderkey"))
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return base.select(
        "prio",
        "o_orderkey",
        "cents",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        (F.floor(F.percent_rank().over(w) * 1e6 + 0.5) / 1e6).alias("prank_q"),
        (F.floor(F.cume_dist().over(w) * 1e6 + 0.5) / 1e6).alias("cume_q"),
        F.nth_value("o_orderkey", 2).over(wrun).cast("long").alias("second_key"),
        F.lag("cents", 1, -1).over(w).cast("long").alias("prev_cents"),
        F.lead("cents", 2).over(w).cast("long").alias("next2_cents"),
        F.first_value("o_orderkey").over(w).cast("long").alias("top_key"),
    ).orderBy("prio", "rnk", "o_orderkey")


@_staged(
    "null_ordering_gauntlet_customer",
    """
    WITH base AS (
      SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING') AS seg,
             c_acctbal
      FROM customer WHERE c_custkey % 29 = 0
    )
    SELECT c_custkey, seg,
           CAST(row_number() OVER (ORDER BY seg ASC NULLS FIRST, c_custkey)
                AS BIGINT) AS rn_nf,
           CAST(row_number() OVER (ORDER BY seg ASC NULLS LAST, c_custkey)
                AS BIGINT) AS rn_nl,
           CAST(row_number() OVER (ORDER BY seg DESC NULLS FIRST, c_custkey)
                AS BIGINT) AS rn_dnf,
           CAST(row_number() OVER (ORDER BY seg DESC NULLS LAST, c_custkey)
                AS BIGINT) AS rn_dnl
    FROM base
    ORDER BY c_custkey
    """,
)
def null_ordering_gauntlet_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ordering gauntlet — the silent cross-engine divergence
    every ORDER BY with NULLs risks: Spark's default is NULLS FIRST
    for ASC / NULLS LAST for DESC, DuckDB's default is NULLS LAST
    everywhere (changed in 0.8!), so any ranking over a nullable key
    that doesn't PIN the placement is engine-dependent. Four
    row_number lanes pin all four (direction × placement)
    combinations over a planted-NULL segment column with a unique
    tiebreak. Each global ranking rides the SCALABLE 2-pass
    global_row_number (operators/windows.py — range-partitioned,
    no single-task window exchange even though the rank is total);
    the four lanes join back on the key. The oracle replays
    identical lanes as plain windows."""
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number

    base = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 29 == 0)
        .select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        )
    )
    lanes = {
        "rn_nf": [F.col("seg").asc_nulls_first(), F.col("c_custkey").asc()],
        "rn_nl": [F.col("seg").asc_nulls_last(), F.col("c_custkey").asc()],
        "rn_dnf": [F.col("seg").desc_nulls_first(), F.col("c_custkey").asc()],
        "rn_dnl": [F.col("seg").desc_nulls_last(), F.col("c_custkey").asc()],
    }
    out = base
    for name, order in lanes.items():
        ranked = global_row_number(base, order, name=name).select(
            "c_custkey", F.col(name).cast("long").alias(name)
        )
        out = out.join(ranked, "c_custkey")
    return out.select(
        "c_custkey", "seg", "rn_nf", "rn_nl", "rn_dnf", "rn_dnl"
    ).orderBy("c_custkey")


@_staged(
    "mips_topk_embeddings",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS vq FROM v WHERE vec_id IN (1, 2, 3)),
    scored AS (
      SELECT q.query_id, c.vec_id AS item_id,
             floor(list_dot_product(q.vq, c.emb) * 1e6 + 0.5) / 1e6 AS dot_q
      FROM q, v c WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, item_id, dot_q,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_q DESC, item_id) AS rk
      FROM scored
    )
    SELECT query_id, item_id, dot_q, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
)
def mips_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k — the RECOMMENDER scoring shape
    next to cosine_topk's normalized similarity: user×item relevance
    is the raw dot product, and because vector norms vary the MIP
    ranking genuinely differs from the cosine ranking (a long
    on-topic vector beats a short identical-direction one). Exact
    brute force as the auditable baseline (one broadcast of the
    3-query side, JVM fold dot products, quantized BEFORE ranking);
    the scale path is the same norm-augmentation reduction the ANN
    family already buckets through ([x, √(M²−|x|²)] makes MIPS a
    cosine problem — Bachrach et al. 2014), so this row is the
    ground truth those probes calibrate against."""
    from dbt_lakehouse_aws_spark.llmops.similarity import _as_double, dot

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("vq")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("item_id"),
            (
                F.floor(dot(F.col("vq"), F.col("emb")) * 1e6 + 0.5) / 1e6
            ).alias("dot_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("item_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("query_id", "item_id", "dot_q", "rk")
        .orderBy("query_id", "rk")
    )


@_staged(
    "acid_stats_prune_audit_events",
    """
    WITH e AS (
      SELECT CAST(date_part('day', CAST(ts AS DATE)) AS BIGINT) AS dom,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(4 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_scanned,
           TRUE AS prune_correct
    FROM e WHERE dom BETWEEN 10 AND 12
    """,
)
def acid_stats_prune_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file pruning under the driver gate
    (sources/acid.py::read(prune=...) — the Iceberg manifest-bounds
    trick: drop files whose [min,max] cannot intersect the predicate
    BEFORE Spark opens them): events land in FOUR single-file
    appends sliced by known day-of-month ranges (1–8, 9–16, 17–24,
    25–31), so the file→bounds layout is fully deterministic; a
    dom∈[10,12] read must manifest-prune exactly 3 of 4 files. The
    row asserts the audit IN-QUERY: n_files_scanned comes from
    replaying the documented prune rule over the snapshot's
    OWN stats, and ``prune_correct`` additionally pins that the
    pruned read returns byte-identical aggregates to the unpruned
    filtered read (pruning is a superset guarantee — dropping a
    file that could match would silently lose rows; that is the
    failure this row exists to catch)."""
    import tempfile
    import uuid as _uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        F.dayofmonth(F.to_date("ts")).cast("long").alias("dom"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = AcidTable(
        spark,
        tempfile.mkdtemp(prefix=f"prune_{_uuid.uuid4().hex[:8]}_") + "/t",
    )
    for i, (lo, hi) in enumerate([(1, 8), (9, 16), (17, 24), (25, 31)]):
        t.write(
            ev.filter(F.col("dom").between(lo, hi)).repartition(1),
            mode="overwrite" if i == 0 else "append",
        )
    snap = t.snapshot()
    n_total = len(snap.files)
    # replay the documented prune rule over the manifest stats
    kept = [
        f
        for f in snap.files
        if (b := snap.stats.get(f, {}).get("dom")) is None
        or not (b[0] > 12 or b[1] < 10)
    ]
    pruned_df = t.read(prune={"dom": (10, 12)}).filter(
        F.col("dom").between(10, 12)
    )
    full_df = t.read().filter(F.col("dom").between(10, 12))
    p = pruned_df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ).first()
    f_ = full_df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ).first()
    correct = (p["n"] == f_["n"]) and (p["cents"] == f_["cents"])
    return spark.createDataFrame(
        [
            (
                int(p["n"]),
                int(p["cents"]),
                int(n_total),
                int(len(kept)),
                bool(correct),
            )
        ],
        "n long, cents long, n_files_total long, n_files_scanned long,"
        " prune_correct boolean",
    )


@_staged(
    "month_arithmetic_gauntlet_orders",
    """
    WITH base AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
      FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey, d,
           CAST(d + INTERVAL 1 MONTH AS DATE) AS plus_1m,
           CAST(d + INTERVAL 13 MONTH AS DATE) AS plus_13m,
           CAST(d + INTERVAL (-1) MONTH AS DATE) AS minus_1m,
           last_day(d) AS eom,
           (d = last_day(d)) AS is_eom,
           CAST(date_part('year', d) * 12 + date_part('month', d)
                AS BIGINT) AS month_index,
           CAST(date_part('day', CAST(d + INTERVAL 1 MONTH AS DATE))
                AS BIGINT) AS plus_1m_dom
    FROM base ORDER BY o_orderkey
    """,
)
def month_arithmetic_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-arithmetic gauntlet — the end-of-month clamp is where
    calendar bugs live (Jan 31 + 1 month = Feb 29 in a leap year,
    Feb 28 otherwise — BOTH engines clamp, and this row pins it over
    six years of order dates incl. the 1996/2000 leap years):
    add_months ±1/+13, last_day, an is-EOM flag, and the
    month-index lane (y·12+m) — the SAFE cross-engine month-distance
    idiom, pinned here precisely because the naive alternatives
    diverge (Spark months_between is FRACTIONAL, DuckDB
    date_diff('month') counts boundary crossings; Jan 31 → Feb 1 is
    1 to DuckDB and ~0.03 to Spark). Pure projection, no shuffle."""
    base = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", F.to_date("o_orderdate").alias("d"))
    )
    return base.select(
        "o_orderkey",
        "d",
        F.add_months("d", 1).alias("plus_1m"),
        F.add_months("d", 13).alias("plus_13m"),
        F.add_months("d", -1).alias("minus_1m"),
        F.last_day("d").alias("eom"),
        (F.col("d") == F.last_day("d")).alias("is_eom"),
        (F.year("d") * 12 + F.month("d")).cast("long").alias("month_index"),
        F.dayofmonth(F.add_months("d", 1)).cast("long").alias("plus_1m_dom"),
    ).orderBy("o_orderkey")


@_staged(
    "explode_outer_gauntlet_docs",
    """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN []
                  ELSE string_split(text, ' ')[1:3] END AS toks
      FROM documents WHERE doc_id % 7 = 0
    ),
    exploded AS (
      SELECT b.doc_id, u.tok, u.pos
      FROM base b
      LEFT JOIN (
        SELECT doc_id, unnest(toks) AS tok,
               CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos
        FROM base
      ) u ON u.doc_id = b.doc_id
    )
    SELECT doc_id, pos, tok, (tok IS NULL) AS from_empty
    FROM exploded
    ORDER BY doc_id, pos NULLS FIRST
    """,
)
def explode_outer_gauntlet_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer semantics pinned — the lateral-explode trap:
    plain explode DROPS rows whose array is empty or NULL (an
    anti-join in disguise — docs silently vanish from token-level
    pipelines), while the OUTER variant keeps them as a single
    (NULL pos, NULL tok) row. Every third doc's token array is
    emptied; the engine uses posexplode_outer, and the oracle —
    DuckDB's unnest has no outer form — reconstructs the same
    semantics with a LEFT JOIN against the unnested rows. A
    from_empty flag makes the preserved rows assertable; ordering
    pins NULLS FIRST explicitly (the null-ordering gauntlet's
    lesson)."""
    base = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0, F.array().cast("array<string>")
            )
            .otherwise(F.slice(F.split("text", " "), 1, 3))
            .alias("toks"),
        )
    )
    out = base.select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "tok",
        F.col("tok").isNull().alias("from_empty"),
    )
    return out.orderBy("doc_id", F.col("pos").asc_nulls_first())


@_staged(
    "cross_source_dup_matrix",
    """
    WITH h AS (
      SELECT DISTINCT source,
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS hash
      FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS shared_fps
      FROM h a JOIN h b ON b.hash = a.hash AND a.source < b.source
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_fps FROM h GROUP BY 1
    )
    SELECT p.source_a, p.source_b, p.shared_fps,
           sa.n_fps AS n_a, sb.n_fps AS n_b,
           floor(CAST(p.shared_fps AS DOUBLE)
                 / least(sa.n_fps, sb.n_fps) * 1e6 + 0.5) / 1e6
             AS containment_q
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    ORDER BY p.shared_fps DESC, p.source_a, p.source_b
    LIMIT 30
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shared-boilerplate matrix — the corpus-provenance
    diagnostic run before mixing crawls ('how much template/opening
    boilerplate do sources share' drives dedup order and mixing
    weights; the within-corpus dedup rows never ask BETWEEN which
    sources the mass sits): each doc's OPENING fingerprint (md5 of
    its first 5 tokens — the boilerplate signature; whole-text
    hashing finds only verbatim dups, which this synthetic corpus
    has none of below sf0.1), distinct per source, then a hash-equi
    self-join over sources (never doc×doc — the join key is the
    fingerprint, cost O(Σ group²) per fingerprint),
    overlap-containment normalized by the smaller side. Exact
    integers + one quantized ratio."""
    d = T(spark, sf_dir, "documents")
    h = d.select(
        "source",
        F.md5(F.array_join(F.slice(F.split("text", " "), 1, 5), " ")).alias(
            "hash"
        ),
    ).distinct()
    a = h.select(F.col("source").alias("source_a"), "hash")
    b = h.select(F.col("source").alias("source_b"), "hash")
    pairs = (
        a.join(b, "hash")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    sizes = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_fps")
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnsRenamed({"source": "source_a", "n_fps": "n_a"})),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"source": "source_b", "n_fps": "n_b"})),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_fps",
            "n_a",
            "n_b",
            (
                F.floor(
                    F.col("shared_fps").cast("double")
                    / F.least("n_a", "n_b")
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("containment_q"),
        )
        .orderBy(F.desc("shared_fps"), "source_a", "source_b")
        .limit(30)
    )


@_staged(
    "seq2_gap_patterns_events",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pairs AS (
      SELECT a.event_type AS ante, b.event_type AS cons,
             CAST(count(*) AS BIGINT) AS support
      FROM seq a JOIN seq b
        ON b.user_id = a.user_id AND b.rn > a.rn AND b.rn <= a.rn + 3
      GROUP BY 1, 2
    ),
    ante_tot AS (
      SELECT ante, CAST(sum(support) AS BIGINT) AS tot
      FROM pairs GROUP BY 1
    )
    SELECT p.ante, p.cons, p.support,
           floor(CAST(p.support AS DOUBLE) / t.tot * 1e6 + 0.5) / 1e6
             AS confidence_q
    FROM pairs p JOIN ante_tot t ON t.ante = p.ante
    ORDER BY p.ante, p.cons
    """,
)
def seq2_gap_patterns_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-constrained sequential 2-patterns (the SPAM/PrefixSpan
    2-sequence cell with a maxgap of 3 events) — 'A then B within
    the next 3 actions' with support and confidence, the sequential
    association rule the adjacency-only rows (event_transition
    Markov counts, session paths) can't express because they stop
    at lag 1. Per-user rank from hash-partitioned windows, then a
    BANDED self-join on (user, rank window) — the range-join
    bucketing discipline with the band written as an rn residual;
    vocabulary-bounded output (|types|²)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    a = seq.select(
        "user_id", F.col("event_type").alias("ante"), F.col("rn").alias("ra")
    )
    b = seq.select(
        "user_id", F.col("event_type").alias("cons"), F.col("rn").alias("rb")
    )
    pairs = (
        a.join(b, "user_id")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + 3))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    tot = pairs.groupBy("ante").agg(F.sum("support").cast("long").alias("tot"))
    return (
        pairs.join(F.broadcast(tot), "ante")
        .select(
            "ante",
            "cons",
            "support",
            (
                F.floor(F.col("support").cast("double") / F.col("tot") * 1e6 + 0.5)
                / 1e6
            ).alias("confidence_q"),
        )
        .orderBy("ante", "cons")
    )


@_staged(
    "business_day_adjust_orders",
    """
    WITH base AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
             CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow
      FROM orders WHERE o_orderkey % 89 = 0
    ),
    adj AS (
      SELECT o_orderkey, d, dow,
             CASE WHEN dow = 6 THEN CAST(d + INTERVAL 2 DAY AS DATE)
                  WHEN dow = 7 THEN CAST(d + INTERVAL 1 DAY AS DATE)
                  ELSE d END AS next_bday
      FROM base
    )
    SELECT o_orderkey, d, dow, next_bday,
           (next_bday <> d) AS was_weekend,
           CAST(next_bday + INTERVAL 7 DAY AS DATE) AS plus_5_bdays
    FROM adj ORDER BY o_orderkey
    """,
)
def business_day_adjust_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day adjustment — the settlement/SLA calendar op
    (T+5 settlement, 'due in 5 business days') the datetime gauntlet
    family lacked: roll weekend dates forward to the next business
    day (Sat +2, Sun +1 — the ISO-dow CASE both engines replay;
    Spark's dayofweek is 1=SUNDAY so the engine uses the weekday()
    0=Monday form + 1 to match DuckDB's isodow exactly), then +5
    business days, which from a business day is EXACTLY +7 calendar
    days (5 weekdays always span one weekend) — the closed form that
    needs no calendar table. Pure projection; a real holiday
    calendar would broadcast-anti-join a dim table on top."""
    base = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 89 == 0)
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("d"),
            (F.weekday(F.to_date("o_orderdate")) + 1).cast("long").alias("dow"),
        )
    )
    adj = base.withColumn(
        "next_bday",
        F.when(F.col("dow") == 6, F.date_add("d", 2))
        .when(F.col("dow") == 7, F.date_add("d", 1))
        .otherwise(F.col("d")),
    )
    return adj.select(
        "o_orderkey",
        "d",
        "dow",
        "next_bday",
        (F.col("next_bday") != F.col("d")).alias("was_weekend"),
        F.date_add("next_bday", 7).alias("plus_5_bdays"),
    ).orderBy("o_orderkey")



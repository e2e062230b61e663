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




@_staged(
    "range_frame_gauntlet_orders",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio,
             date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
               AS dayno,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT prio, CAST(dayno AS BIGINT) AS dayno, cents,
           CAST(sum(cents) OVER (PARTITION BY prio ORDER BY dayno
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS sum_3d,
           CAST(sum(cents) OVER (PARTITION BY prio ORDER BY dayno
                 RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING) AS BIGINT)
             AS sum_prior_wk,
           floor(avg(cents) OVER (PARTITION BY prio ORDER BY dayno
                 RANGE BETWEEN CURRENT ROW AND 3 FOLLOWING)
                 * 1e6 + 0.5) / 1e6 AS avg_next3_q,
           CAST(count(*) OVER (PARTITION BY prio ORDER BY dayno
                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
             AS n_window5
    FROM daily
    ORDER BY prio, dayno
    """,
)
def range_frame_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based (RANGE) window frames — the sibling the ROWS-frame
    gauntlet (queries_r7) leaves untested: a calendar-gapped daily
    series where RANGE 2 PRECEDING means "two DAYS", not "two rows",
    so missing dates change the answer. Exercises trailing, strictly-
    prior, and forward value frames plus a symmetric count. Windows
    partition by priority — bounded partitions, no global sort."""
    o = T(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
            .cast("long")
            .alias("dayno"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    wp = Window.partitionBy("prio").orderBy("dayno")
    return daily.select(
        "prio",
        "dayno",
        "cents",
        F.sum("cents").over(wp.rangeBetween(-2, 0)).cast("long").alias("sum_3d"),
        F.sum("cents").over(wp.rangeBetween(-6, -1)).cast("long").alias("sum_prior_wk"),
        (
            F.floor(F.avg("cents").over(wp.rangeBetween(0, 3)) * 1e6 + 0.5) / 1e6
        ).alias("avg_next3_q"),
        F.count(F.lit(1)).over(wp.rangeBetween(-2, 2)).cast("long").alias("n_window5"),
    ).orderBy("prio", "dayno")


@_staged(
    "lead_lag_gauntlet_events",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents, ts
      FROM events WHERE user_id % 37 = 0
    )
    SELECT user_id, event_id, cents,
           lag(cents, 1) OVER w AS prev1,
           lag(cents, 3, CAST(-1 AS BIGINT)) OVER w AS prev3_def,
           lead(cents, 2) OVER w AS next2,
           last_value(CASE WHEN event_type = 'purchase' THEN cents END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_purchase_cents
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def lead_lag_gauntlet_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag offset-and-default semantics plus the IGNORE-NULLS
    "previous non-null" idiom (Spark spells it last(col, True) over a
    PRECEDING-only ROWS frame; DuckDB spells it last_value IGNORE
    NULLS) — the session-feature building block every event pipeline
    leans on. Ordered by (ts, event_id) so ties are deterministic."""
    e = T(spark, sf_dir, "events").filter(F.col("user_id") % 37 == 0)
    e = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    return e.select(
        "user_id",
        "event_id",
        "cents",
        F.lag("cents", 1).over(w).alias("prev1"),
        F.lag("cents", 3, -1).over(w).cast("long").alias("prev3_def"),
        F.lead("cents", 2).over(w).alias("next2"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("cents")), True
        )
        .over(wprev)
        .alias("prev_purchase_cents"),
    ).orderBy("user_id", "event_id")


@_staged(
    "struct_sort_gauntlet_events",
    """
    WITH c AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, event_id, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents DESC, event_id DESC) AS rmax,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents ASC, event_id ASC) AS rmin
      FROM c
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(CASE WHEN rmax = 1 THEN cents END) AS BIGINT) AS max_cents,
           CAST(max(CASE WHEN rmax = 1 THEN event_id END) AS BIGINT)
             AS argmax_event,
           CAST(max(CASE WHEN rmin = 1 THEN cents END) AS BIGINT) AS min_cents,
           CAST(max(CASE WHEN rmin = 1 THEN event_id END) AS BIGINT)
             AS argmin_event
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def struct_sort_gauntlet_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-ordering arg-max/arg-min: Spark computes each group's
    extreme row with ONE map-side max(struct(key, id)) — lexicographic
    struct comparison, no shuffle of raw rows, the scalable argmax
    idiom — while the oracle re-derives it with rank windows, a
    genuinely different algorithm agreeing on ties (struct max breaks
    cents ties by the HIGHEST event_id, struct min by the lowest)."""
    e = T(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.struct("cents", "event_id")).alias("_mx"),
        F.min(F.struct("cents", "event_id")).alias("_mn"),
    )
    return agg.select(
        "event_type",
        "n",
        F.col("_mx.cents").alias("max_cents"),
        F.col("_mx.event_id").alias("argmax_event"),
        F.col("_mn.cents").alias("min_cents"),
        F.col("_mn.event_id").alias("argmin_event"),
    ).orderBy("event_type")


@_staged(
    "array_set_ops_gauntlet_docs",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 101 = 0
    ),
    s AS (
      SELECT doc_id, toks, list_distinct(toks) AS dt,
             ['the', 'a', 'of', 'and', 'to'] AS stop
      FROM d
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(dt) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(dt, t -> list_contains(stop, t)))
                AS BIGINT) AS n_stop,
           CAST(len(list_distinct(list_filter(toks,
                t -> NOT list_contains(stop, t)))) AS BIGINT) AS n_except,
           CAST(len(list_distinct(list_concat(dt, stop))) AS BIGINT)
             AS n_union,
           array_to_string(list_slice(list_sort(dt), 1, 3), '|') AS first3
    FROM s ORDER BY doc_id
    """,
)
def array_set_ops_gauntlet_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-algebra gauntlet (distinct / intersect / except /
    union / sort / slice) over tokenized documents — the collection
    functions a feature pipeline leans on before ever exploding. All
    comparisons are on SIZES and a sorted prefix, because Spark's
    array_distinct/except preserve first-occurrence order while
    DuckDB's list_distinct doesn't guarantee one — set semantics are
    the portable contract, element order is not."""
    stop = F.array(*[F.lit(t) for t in ["the", "a", "of", "and", "to"]])
    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 101 == 0)
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    )
    s = d.select("doc_id", "toks", F.array_distinct("toks").alias("dt"))
    return s.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size("dt").cast("long").alias("n_distinct"),
        F.size(F.array_intersect("dt", stop)).cast("long").alias("n_stop"),
        F.size(F.array_except("toks", stop)).cast("long").alias("n_except"),
        F.size(F.array_union("dt", stop)).cast("long").alias("n_union"),
        F.array_join(F.slice(F.array_sort("dt"), 1, 3), "|").alias("first3"),
    ).orderBy("doc_id")


@_staged(
    "interval_arithmetic_gauntlet_orders",
    """
    WITH d AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
      FROM orders WHERE o_orderkey % 67 = 0
    )
    SELECT o_orderkey, d,
           CAST(d + INTERVAL 90 DAY AS DATE) AS plus90,
           CAST(d - INTERVAL 3 MONTH AS DATE) AS minus3mo,
           last_day(d) AS eom,
           CAST(date_trunc('quarter', d) AS DATE) AS qstart,
           CAST((year(d) - 1992) * 12 + (month(d) - 1) AS BIGINT) AS mspan,
           CAST(date_diff('day', d, DATE '1998-08-02') AS BIGINT) AS days_to_end
    FROM d ORDER BY o_orderkey
    """,
)
def interval_arithmetic_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic gauntlet: day and month interval
    shifts (month subtraction must END-OF-MONTH CLAMP identically —
    Mar 31 − 1 month = Feb 29 in both engines), last_day, quarter
    truncation, an explicit month-span (spelled as year/month
    arithmetic because Spark's months_between and DuckDB's
    date_diff('month') disagree on partial months BY DESIGN), and a
    day countdown. Complements the ISO-calendar and month-arithmetic
    gauntlets, which cover week numbering and add_months edge days."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 67 == 0)
    d = o.select("o_orderkey", F.to_date("o_orderdate").alias("d"))
    return d.select(
        "o_orderkey",
        "d",
        F.date_add("d", 90).alias("plus90"),
        F.add_months("d", -3).alias("minus3mo"),
        F.last_day("d").alias("eom"),
        F.trunc("d", "quarter").alias("qstart"),
        ((F.year("d") - 1992) * 12 + (F.month("d") - 1))
        .cast("long")
        .alias("mspan"),
        F.datediff(F.lit("1998-08-02").cast("date"), F.col("d"))
        .cast("long")
        .alias("days_to_end"),
    ).orderBy("o_orderkey")


@_staged(
    "width_bucket_histogram_orders",
    """
    WITH mm AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
    ),
    b AS (
      SELECT least(CAST(floor((o_totalprice - mn) / ((mx - mn) / 20.0))
                        AS BIGINT), 19) AS bucket,
             mn, mx
      FROM orders, mm
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           floor((min(mn) + bucket * (min(mx) - min(mn)) / 20.0) * 1e6 + 0.5)
             / 1e6 AS lo_q
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def width_bucket_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram with data-derived bounds: the
    profiling primitive behind every numeric-distribution dashboard.
    The global (min, max) is a scalar aggregate broadcast onto the
    scan (J5 one-row cross join — no second pass over the data), the
    bucket expression is the identical IEEE double formula in both
    engines, and the top bucket absorbs the max via least(..., 19).
    One O(rows) map + a 20-group aggregate: the 100 TB shape."""
    o = T(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    b = o.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / 20.0)
            ).cast("long"),
            F.lit(19).cast("long"),
        ).alias("bucket"),
        "mn",
        "mx",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.floor(
                    (F.min("mn") + F.col("bucket") * (F.max("mx") - F.min("mn")) / 20.0)
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("lo_q"),
        )
        .orderBy("bucket")
    )


@_staged(
    "ks_test_2s_orders",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS in1,
             CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS in2
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    pts AS (
      SELECT v, CAST(sum(in1) AS BIGINT) AS c1, CAST(sum(in2) AS BIGINT) AS c2
      FROM s GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(c1) OVER (ORDER BY v) AS cum1,
             sum(c2) OVER (ORDER BY v) AS cum2
      FROM pts
    ),
    n AS (
      SELECT CAST(sum(in1) AS BIGINT) AS n1, CAST(sum(in2) AS BIGINT) AS n2
      FROM s
    )
    SELECT n1, n2,
           floor(max(abs(CAST(cum1 AS DOUBLE) / n1
                         - CAST(cum2 AS DOUBLE) / n2)) * 1e6 + 0.5) / 1e6
             AS ks_q,
           floor(1.358 * sqrt((n1 + n2) / (CAST(n1 AS DOUBLE) * n2))
                 * 1e6 + 0.5) / 1e6 AS crit_q,
           (max(abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2))
            > 1.358 * sqrt((n1 + n2) / (CAST(n1 AS DOUBLE) * n2)))
             AS reject_h0
    FROM cum, n GROUP BY n1, n2
    """,
)
def ks_test_2s_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test (URGENT vs LOW order
    totals): D = max |ECDF₁ − ECDF₂| over the pooled support, with
    the α=0.05 large-sample critical value 1.358·√((n₁+n₂)/n₁n₂).
    The ECDFs ride the engine's two-pass ``prefix_sum`` (no global
    one-task window — the oracle's single ORDER BY window is the
    luxury only DuckDB gets); values are pre-quantized to whole
    dollars so every cumulative count is integer-exact."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    s = o.select(
        F.round("o_totalprice").cast("long").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("in1"),
        F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0).alias("in2"),
    )
    pts = s.groupBy("v").agg(
        F.sum("in1").cast("long").alias("c1"),
        F.sum("in2").cast("long").alias("c2"),
    )
    cum = prefix_sum(pts, [F.asc("v")], "c1", name="cum1")
    cum = prefix_sum(cum, [F.asc("v")], "c2", name="cum2")
    n = s.agg(
        F.sum("in1").cast("long").alias("n1"), F.sum("in2").cast("long").alias("n2")
    )
    d = cum.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        F.abs(
            F.col("cum1").cast("double") / F.col("n1")
            - F.col("cum2").cast("double") / F.col("n2")
        ).alias("gap"),
    )
    crit = 1.358 * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1").cast("double") * F.col("n2"))
    )
    return (
        d.groupBy("n1", "n2")
        .agg(F.max("gap").alias("ks"))
        .select(
            "n1",
            "n2",
            (F.floor(F.col("ks") * 1e6 + 0.5) / 1e6).alias("ks_q"),
            (F.floor(crit * 1e6 + 0.5) / 1e6).alias("crit_q"),
            (F.col("ks") > crit).alias("reject_h0"),
        )
    )


@_staged(
    "theil_sen_slope_daily",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT floor(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) * 1e6 + 0.5) / 1e6
               AS slope_q
      FROM daily a JOIN daily b ON b.x > a.x
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           floor(quantile_cont(slope_q, 0.5) * 1e6 + 0.5) / 1e6
             AS sen_slope_q
    FROM pairs
    """,
)
def theil_sen_slope_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator on the daily revenue series:
    the median of all pairwise slopes — the breakdown-resistant
    alternative to OLS (Sen 1968). The pairwise join is over DAYS,
    not rows (the generator's fixed 30-day window ⇒ ≤ n·(n−1)/2 ≈
    435 pairs at ANY scale factor — aggregation first, quadratics
    on the bounded aggregate only). Slopes are quantized BEFORE the
    median so the interpolated midpoint is cross-engine exact."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x")
    ).agg(
        F.floor(
            F.sum(F.round(F.col("value") * 100).cast("long")) / 100
        )
        .cast("long")
        .alias("y")
    )
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("xb") > F.col("xa")).select(
        (
            F.floor(
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa"))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("slope_q")
    )
    nd = daily.count()
    return pairs.agg(
        F.lit(nd).cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (
            F.floor(F.expr("percentile(slope_q, 0.5)") * 1e6 + 0.5) / 1e6
        ).alias("sen_slope_q"),
    )


def _daily_type_sql() -> str:
    """Shared oracle CTE: per-type daily revenue in whole dollars
    (integer-exact: cents summed as BIGINT, then floor-div 100) with
    the day index x anchored at the generator's 2024-01-01 origin."""
    return """
    daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS y
      FROM events GROUP BY 1, 2
    )"""


def _daily_type_df(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "newey_west_se_daily",
    f"""
    WITH {_daily_type_sql()},
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM daily GROUP BY 1
    ),
    par AS (
      SELECT event_type, n, sx, sxx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx) AS b,
             (sy - CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) * sx) / n AS a
      FROM st
    ),
    r AS MATERIALIZED (
      SELECT d.event_type, d.x,
             (d.y - p.a - p.b * d.x) AS e,
             (d.x - CAST(p.sx AS DOUBLE) / p.n) * (d.y - p.a - p.b * d.x)
               AS u
      FROM daily d JOIN par p ON p.event_type = d.event_type
    ),
    q AS (
      SELECT r1.event_type, r1.x - r2.x AS l,
             CAST(sum(CAST(round(r1.u * r2.u / 100) AS BIGINT)) AS BIGINT)
               AS ql
      FROM r r1 JOIN r r2
        ON r2.event_type = r1.event_type
       AND r2.x BETWEEN r1.x - 5 AND r1.x
      GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(sum(CASE WHEN l = 0 THEN 6 * ql
                           ELSE 2 * (6 - l) * ql END) AS BIGINT) AS nw_int
      FROM q GROUP BY 1
    ),
    e2 AS (
      SELECT event_type,
             CAST(sum(CAST(round(e * e / 100) AS BIGINT)) AS BIGINT) AS qe2
      FROM r GROUP BY 1
    )
    SELECT p.event_type,
           p.n,
           floor(p.b * 1e6 + 0.5) / 1e6 AS slope_q,
           floor(sqrt((qe2 * 100.0 / (p.n - 2))
                      / (p.sxx - CAST(p.sx AS DOUBLE) * p.sx / p.n))
                 * 1e6 + 0.5) / 1e6 AS se_ols_q,
           floor(sqrt((s.nw_int * 100.0 / 6.0)
                      / ((p.sxx - CAST(p.sx AS DOUBLE) * p.sx / p.n)
                         * (p.sxx - CAST(p.sx AS DOUBLE) * p.sx / p.n)))
                 * 1e6 + 0.5) / 1e6 AS se_nw_q
    FROM par p JOIN s ON s.event_type = p.event_type
    JOIN e2 ON e2.event_type = p.event_type
    ORDER BY p.event_type
    """,
)
def newey_west_se_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC) standard error of the daily-revenue trend
    slope per event type, Bartlett kernel with L=5 lags — the
    autocorrelation-robust se every econometric trend readout should
    quote next to the OLS one (Newey & West 1987). Determinism
    device: OLS runs on INTEGER sufficient statistics (whole-dollar
    y, day-index x), and every float autocovariance addend u_t·u_{t−l}
    is quantized to a 100-dollar² integer grid BEFORE the sum, so no
    cross-engine float-summation-order drift can flip the hash. The
    lag join is day-bounded (≤ 6·n pairs per type on the generator's
    fixed 30-day window)."""
    daily = _daily_type_df(spark, sf_dir)
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    par = st.select(
        "event_type", "n", "sx", "sxx",
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
    )
    r = (
        daily.join(F.broadcast(par), "event_type")
        .select(
            "event_type",
            "x",
            (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("e"),
            (
                (F.col("x") - F.col("sx").cast("double") / F.col("n"))
                * (F.col("y") - F.col("a") - F.col("b") * F.col("x"))
            ).alias("u"),
        )
        .localCheckpoint(eager=True)
    )
    r2 = r.select(
        F.col("event_type").alias("et2"),
        F.col("x").alias("x2"),
        F.col("u").alias("u2"),
    )
    q = (
        r.join(
            r2,
            (F.col("et2") == F.col("event_type"))
            & (F.col("x2") >= F.col("x") - 5)
            & (F.col("x2") <= F.col("x")),
        )
        .select(
            "event_type",
            (F.col("x") - F.col("x2")).alias("l"),
            F.round(F.col("u") * F.col("u2") / 100).cast("long").alias("qterm"),
        )
        .groupBy("event_type", "l")
        .agg(F.sum("qterm").cast("long").alias("ql"))
    )
    s = q.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("l") == 0, 6 * F.col("ql")).otherwise(
                2 * (6 - F.col("l")) * F.col("ql")
            )
        )
        .cast("long")
        .alias("nw_int")
    )
    e2 = r.groupBy("event_type").agg(
        F.sum(F.round(F.col("e") * F.col("e") / 100).cast("long"))
        .cast("long")
        .alias("qe2")
    )
    sxx_c = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    return (
        par.join(s, "event_type")
        .join(e2, "event_type")
        .select(
            "event_type",
            "n",
            (F.floor(F.col("b") * 1e6 + 0.5) / 1e6).alias("slope_q"),
            (
                F.floor(
                    F.sqrt((F.col("qe2") * 100.0 / (F.col("n") - 2)) / sxx_c)
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("se_ols_q"),
            (
                F.floor(
                    F.sqrt((F.col("nw_int") * 100.0 / 6.0) / (sxx_c * sxx_c))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("se_nw_q"),
        )
        .orderBy("event_type")
    )


@_staged(
    "breusch_pagan_daily",
    f"""
    WITH {_daily_type_sql()},
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM daily GROUP BY 1
    ),
    par AS (
      SELECT event_type, n, sx, sxx,
             CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS b,
             (sy - CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) * sx) / n AS a
      FROM st
    ),
    g AS (
      SELECT d.event_type, d.x,
             CAST(round((d.y - p.a - p.b * d.x) * (d.y - p.a - p.b * d.x)
                        / 10000) AS BIGINT) AS gq
      FROM daily d JOIN par p ON p.event_type = d.event_type
    ),
    gs AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(gq) AS BIGINT) AS sg,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * gq) AS BIGINT) AS sxg,
             CAST(sum(gq * gq) AS BIGINT) AS sgg
      FROM g GROUP BY 1
    )
    SELECT event_type, n,
           floor(n * (CAST(n * sxg - sx * sg AS DOUBLE)
                      * CAST(n * sxg - sx * sg AS DOUBLE))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * sgg - sg * sg AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS bp_stat_q,
           (n * (CAST(n * sxg - sx * sg AS DOUBLE)
                 * CAST(n * sxg - sx * sg AS DOUBLE))
            / (CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * sgg - sg * sg AS DOUBLE)) > 3.841) AS het_at_5pct
    FROM gs ORDER BY event_type
    """,
)
def breusch_pagan_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test per event type on the
    daily trend OLS (Koenker's studentized form: BP = n·R² of e² on
    x, χ²₁ critical 3.841). The same integer-exact device as the
    Newey-West row: y in whole dollars, squared residuals quantized
    to a 10⁴-dollar² grid before the auxiliary regression, so every
    sum is BIGINT-exact and R² is a pure function of integers."""
    daily = _daily_type_df(spark, sf_dir)
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    par = st.select(
        "event_type",
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
    )
    e = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    g = daily.join(F.broadcast(par), "event_type").select(
        "event_type",
        "x",
        F.round(e * e / 10000).cast("long").alias("gq"),
    )
    gs = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("gq").cast("long").alias("sg"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("gq")).cast("long").alias("sxg"),
        F.sum(F.col("gq") * F.col("gq")).cast("long").alias("sgg"),
    )
    num = (F.col("n") * F.col("sxg") - F.col("sx") * F.col("sg")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") * (
        F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")
    ).cast("double")
    bp = F.col("n") * (num * num) / den
    return gs.select(
        "event_type",
        "n",
        (F.floor(bp * 1e6 + 0.5) / 1e6).alias("bp_stat_q"),
        (bp > 3.841).alias("het_at_5pct"),
    ).orderBy("event_type")


@_staged(
    "ljung_box_daily_events",
    f"""
    WITH {_daily_type_sql()},
    mu AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS DOUBLE) / count(*) AS ybar
      FROM daily GROUP BY 1
    ),
    dev AS MATERIALIZED (
      SELECT d.event_type, d.x, (d.y - m.ybar) AS dy, m.n
      FROM daily d JOIN mu m ON m.event_type = d.event_type
    ),
    gam AS (
      SELECT a.event_type, a.x - b.x AS l, max(a.n) AS n,
             CAST(sum(CAST(round(a.dy * b.dy / 100) AS BIGINT)) AS BIGINT)
               AS qg
      FROM dev a JOIN dev b
        ON b.event_type = a.event_type
       AND b.x BETWEEN a.x - 7 AND a.x
      GROUP BY 1, 2
    ),
    r AS (
      SELECT g.event_type, g.l, g.n,
             CAST(round((CAST(g.qg AS DOUBLE) / g0.qg)
                        * (CAST(g.qg AS DOUBLE) / g0.qg)
                        / (g.n - g.l) * 1e12) AS BIGINT) AS term_q
      FROM gam g JOIN gam g0
        ON g0.event_type = g.event_type AND g0.l = 0
      WHERE g.l BETWEEN 1 AND 7
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           floor(max(n) * (max(n) + 2)
                 * (CAST(sum(term_q) AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS lb_q_stat,
           (max(n) * (max(n) + 2) * (CAST(sum(term_q) AS DOUBLE) / 1e12)
            > 14.067) AS autocorr_at_5pct
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def ljung_box_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1..7, χ²₇ critical 14.067)
    for autocorrelation in each event type's daily revenue series —
    the standard "is this series white noise" gate before any
    forecasting row is trusted. Autocovariances come from a
    day-bounded lag self-join (≤ 8·n pairs per type) with each
    product quantized to a 100-dollar² integer grid before summing —
    the same cross-engine exactness device as the Newey-West row."""
    daily = _daily_type_df(spark, sf_dir)
    mu = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("ybar"),
    )
    dev = (
        daily.join(F.broadcast(mu), "event_type")
        .select("event_type", "x", (F.col("y") - F.col("ybar")).alias("dy"), "n")
        .localCheckpoint(eager=True)
    )
    dev2 = dev.select(
        F.col("event_type").alias("et2"), F.col("x").alias("x2"), F.col("dy").alias("dy2")
    )
    gam = (
        dev.join(
            dev2,
            (F.col("et2") == F.col("event_type"))
            & (F.col("x2") >= F.col("x") - 7)
            & (F.col("x2") <= F.col("x")),
        )
        .select(
            "event_type",
            (F.col("x") - F.col("x2")).alias("l"),
            "n",
            F.round(F.col("dy") * F.col("dy2") / 100).cast("long").alias("qterm"),
        )
        .groupBy("event_type", "l")
        .agg(F.max("n").alias("n"), F.sum("qterm").cast("long").alias("qg"))
    )
    g0 = gam.filter(F.col("l") == 0).select(
        F.col("event_type").alias("et0"), F.col("qg").alias("qg0")
    )
    rl = F.col("qg").cast("double") / F.col("qg0")
    r = (
        gam.filter((F.col("l") >= 1) & (F.col("l") <= 7))
        .join(F.broadcast(g0), F.col("et0") == F.col("event_type"))
        .select(
            "event_type",
            "n",
            F.round(rl * rl / (F.col("n") - F.col("l")) * 1e12)
            .cast("long")
            .alias("term_q"),
        )
    )
    nn = F.max("n").cast("long")
    q = nn * (nn + 2) * (F.sum("term_q").cast("double") / 1e12)
    agg = r.groupBy("event_type").agg(
        nn.alias("n"),
        (F.floor(q * 1e6 + 0.5) / 1e6).alias("lb_q_stat"),
        (q > 14.067).alias("autocorr_at_5pct"),
    )
    return agg.orderBy("event_type")


@_staged(
    "page_hinkley_drift_events",
    f"""
    WITH {_daily_type_sql()},
    cum AS (
      SELECT event_type, x, y,
             sum(y) OVER w AS cy,
             row_number() OVER w AS k
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY x)
    ),
    m AS (
      SELECT event_type, x,
             CAST(sum(CAST(round((y - CAST(cy AS DOUBLE) / k) * 1e6)
                           AS BIGINT))
                  OVER (PARTITION BY event_type ORDER BY x) AS BIGINT)
               AS m_int
      FROM cum
    ),
    ranked AS (
      SELECT event_type, x, m_int,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY m_int ASC, x ASC) AS rmin,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x DESC) AS rlast
      FROM m
    ),
    agg AS (
      SELECT event_type,
             max(CASE WHEN rlast = 1 THEN m_int END) AS m_last,
             min(m_int) AS m_min,
             max(CASE WHEN rmin = 1 THEN x END) AS argmin_x
      FROM ranked GROUP BY 1
    )
    SELECT event_type,
           floor((m_last - m_min) / 1e6 * 1e6 + 0.5) / 1e6 AS ph_stat_q,
           CAST(argmin_x AS BIGINT) AS trough_day,
           (m_last - m_min > 50 * 1e6) AS drift_alarm
    FROM agg ORDER BY event_type
    """,
)
def page_hinkley_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector (the sequential change-of-mean
    monitor streaming pipelines run per metric): m_T = Σ_t (x_t −
    x̄_t), PH = m_T − min_t m_t, alarm when PH exceeds λ=50 dollars.
    The deviation-from-running-mean addends are quantized to
    micro-dollar integers so the running sum is a WINDOW over
    BIGINTs — ordered, integer-exact, immune to float association —
    and the trough day is the deterministic argmin (ties broken by
    earliest day via lexicographic (m, x) min)."""
    daily = _daily_type_df(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("x")
    cum = daily.select(
        "event_type",
        "x",
        "y",
        F.sum("y").over(w).alias("cy"),
        F.row_number().over(w).alias("k"),
    )
    m = cum.select(
        "event_type",
        "x",
        F.sum(
            F.round((F.col("y") - F.col("cy").cast("double") / F.col("k")) * 1e6)
            .cast("long")
        )
        .over(w)
        .alias("m_int"),
    )
    agg = m.groupBy("event_type").agg(
        F.max(F.struct("x", "m_int")).getField("m_int").alias("m_last"),
        F.min("m_int").alias("m_min"),
        F.min(F.struct("m_int", "x")).getField("x").alias("argmin_x"),
    )
    ph = (F.col("m_last") - F.col("m_min")) / 1e6
    return agg.select(
        "event_type",
        (F.floor(ph * 1e6 + 0.5) / 1e6).alias("ph_stat_q"),
        F.col("argmin_x").cast("long").alias("trough_day"),
        ((F.col("m_last") - F.col("m_min")) > 50 * 1e6).alias("drift_alarm"),
    ).orderBy("event_type")


@_staged(
    "adf_lag1_daily_events",
    f"""
    WITH {_daily_type_sql()},
    lagged AS (
      SELECT event_type, x, y,
             lag(y) OVER (PARTITION BY event_type ORDER BY x) AS yl
      FROM daily
    ),
    p AS (
      SELECT event_type, yl AS xr, (y - yl) AS dy
      FROM lagged WHERE yl IS NOT NULL
    ),
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xr) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(xr * xr) AS BIGINT) AS sxx,
             CAST(sum(xr * dy) AS BIGINT) AS sxy
      FROM p GROUP BY 1
    ),
    par AS (
      SELECT event_type, n, sx, sxx,
             CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS rho,
             (sy - CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) * sx) / n AS alpha
      FROM st
    ),
    e2 AS (
      SELECT p.event_type,
             CAST(sum(CAST(round((p.dy - q.alpha - q.rho * p.xr)
                                 * (p.dy - q.alpha - q.rho * p.xr) / 100)
                           AS BIGINT)) AS BIGINT) AS qe2
      FROM p JOIN par q ON q.event_type = p.event_type
      GROUP BY 1
    )
    SELECT q.event_type, q.n,
           floor(q.rho * 1e6 + 0.5) / 1e6 AS rho_q,
           floor(q.rho / sqrt((e2.qe2 * 100.0 / (q.n - 2))
                 / (q.sxx - CAST(q.sx AS DOUBLE) * q.sx / q.n))
                 * 1e6 + 0.5) / 1e6 AS df_t_q,
           (q.rho / sqrt((e2.qe2 * 100.0 / (q.n - 2))
                 / (q.sxx - CAST(q.sx AS DOUBLE) * q.sx / q.n)) < -2.89)
             AS stationary_at_5pct
    FROM par q JOIN e2 ON e2.event_type = q.event_type
    ORDER BY q.event_type
    """,
)
def adf_lag1_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root regression per event type: Δy_t = α +
    ρ·y_{t−1} + ε with the DF t-statistic ρ̂/se(ρ̂) against the −2.89
    (n≈30, 5%) critical value — the stationarity gate in front of
    every AR-family forecast row. y is whole-dollar integer, so the
    OLS sufficient statistics are BIGINT-exact; residual squares are
    quantized to a 100-dollar² grid before summing (the family-wide
    cross-engine device)."""
    daily = _daily_type_df(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("x")
    lagged = daily.select(
        "event_type", "x", "y", F.lag("y").over(w).alias("yl")
    ).filter(F.col("yl").isNotNull())
    p = lagged.select(
        "event_type", F.col("yl").alias("xr"), (F.col("y") - F.col("yl")).alias("dy")
    )
    st = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xr").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("xr") * F.col("xr")).cast("long").alias("sxx"),
        F.sum(F.col("xr") * F.col("dy")).cast("long").alias("sxy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    par = st.select(
        "event_type",
        "n",
        "sx",
        "sxx",
        rho.alias("rho"),
        ((F.col("sy") - rho * F.col("sx")) / F.col("n")).alias("alpha"),
    )
    e = F.col("dy") - F.col("alpha") - F.col("rho") * F.col("xr")
    e2 = (
        p.join(F.broadcast(par), "event_type")
        .select("event_type", F.round(e * e / 100).cast("long").alias("q"))
        .groupBy("event_type")
        .agg(F.sum("q").cast("long").alias("qe2"))
    )
    sxx_c = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    se = F.sqrt((F.col("qe2") * 100.0 / (F.col("n") - 2)) / sxx_c)
    t = F.col("rho") / se
    return (
        par.join(e2, "event_type")
        .select(
            "event_type",
            "n",
            (F.floor(F.col("rho") * 1e6 + 0.5) / 1e6).alias("rho_q"),
            (F.floor(t * 1e6 + 0.5) / 1e6).alias("df_t_q"),
            (t < -2.89).alias("stationary_at_5pct"),
        )
        .orderBy("event_type")
    )


@_staged(
    "cvar_es_orders",
    """
    WITH d AS (
      SELECT o_orderpriority AS prio,
             CAST(round(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    v AS (
      SELECT prio, quantile_cont(usd, 0.95) AS var95 FROM d GROUP BY 1
    )
    SELECT d.prio,
           CAST(count(*) AS BIGINT) AS n,
           floor(min(v.var95) * 1e6 + 0.5) / 1e6 AS var95_q,
           floor((CAST(sum(CASE WHEN d.usd >= v.var95 THEN d.usd END)
                       AS DOUBLE)
                  / count(CASE WHEN d.usd >= v.var95 THEN 1 END))
                 * 1e6 + 0.5) / 1e6 AS es95_q,
           CAST(count(CASE WHEN d.usd >= v.var95 THEN 1 END) AS BIGINT)
             AS n_tail
    FROM d JOIN v ON v.prio = d.prio
    GROUP BY d.prio ORDER BY d.prio
    """,
)
def cvar_es_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk (95th percentile) and Expected Shortfall (the
    tail-conditional mean above it) of order totals per priority —
    the coherent-risk-measure pair (Artzner et al. 1999; Basel's
    ES). Values pre-quantized to whole dollars so the percentile
    interpolation and tail sums are integer-anchored on both
    engines; ES is an exact integer-sum ratio."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.round("o_totalprice").cast("long").alias("usd"),
    )
    v = d.groupBy("prio").agg(F.expr("percentile(usd, 0.95)").alias("var95"))
    tail = F.when(F.col("usd") >= F.col("var95"), F.col("usd"))
    return (
        d.join(F.broadcast(v), "prio")
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.floor(F.min("var95") * 1e6 + 0.5) / 1e6).alias("var95_q"),
            (
                F.floor(
                    (F.sum(tail).cast("double") / F.count(tail)) * 1e6 + 0.5
                )
                / 1e6
            ).alias("es95_q"),
            F.count(tail).cast("long").alias("n_tail"),
        )
        .orderBy("prio")
    )


@_staged(
    "grubbs_outlier_orders",
    """
    WITH d AS (
      SELECT o_orderpriority AS prio, o_orderkey,
             CAST(round(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    st AS (
      SELECT prio, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(usd) AS BIGINT) AS s1,
             CAST(sum(usd * usd) AS BIGINT) AS s2
      FROM d GROUP BY 1
    ),
    scored AS (
      SELECT d.prio, d.o_orderkey, d.usd, st.n,
             abs(d.usd - CAST(st.s1 AS DOUBLE) / st.n)
               / sqrt((st.s2 - CAST(st.s1 AS DOUBLE) * st.s1 / st.n)
                      / (st.n - 1)) AS g,
             row_number() OVER (
               PARTITION BY d.prio
               ORDER BY abs(d.usd - CAST(st.s1 AS DOUBLE) / st.n) DESC,
                        d.o_orderkey ASC) AS rk
      FROM d JOIN st ON st.prio = d.prio
    )
    SELECT prio, n, o_orderkey AS outlier_key,
           CAST(usd AS BIGINT) AS outlier_usd,
           floor(g * 1e6 + 0.5) / 1e6 AS grubbs_g_q
    FROM scored WHERE rk = 1 ORDER BY prio
    """,
)
def grubbs_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate statistic per priority:
    G = max|x − x̄|/s with the extreme row itself (ties broken by
    lowest orderkey) — the classic single-outlier test complementing
    the MAD and Mahalanobis rows (which flag SETS, not the arg-max).
    The mean and sd come from BIGINT sufficient statistics over
    whole-dollar values, so G is a pure function of integers; the
    arg-max is one map-side struct max, not a sort."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("prio"),
        "o_orderkey",
        F.round("o_totalprice").cast("long").alias("usd"),
    )
    st = d.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("usd").cast("long").alias("s1"),
        F.sum(F.col("usd") * F.col("usd")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    j = d.join(F.broadcast(st), "prio")
    # arg-max by (|dev| DESC, o_orderkey ASC): struct max over
    # (dev, -o_orderkey) — one shuffle-free map-side extreme.
    dev = F.abs(F.col("usd") - mean)
    agg = j.groupBy("prio").agg(
        F.max("n").alias("n"),
        F.max(
            F.struct(
                dev.alias("dev"),
                (-F.col("o_orderkey")).alias("negkey"),
                F.col("o_orderkey").alias("key"),
                F.col("usd").alias("usd"),
                (dev / sd).alias("g"),
            )
        ).alias("_top"),
    )
    return agg.select(
        "prio",
        "n",
        F.col("_top.key").alias("outlier_key"),
        F.col("_top.usd").cast("long").alias("outlier_usd"),
        (F.floor(F.col("_top.g") * 1e6 + 0.5) / 1e6).alias("grubbs_g_q"),
    ).orderBy("prio")


@_staged(
    "cooks_distance_orders",
    """
    WITH d AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM d
    ),
    par AS (
      SELECT n, sx, sxx,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b,
             (sy - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                   / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                   * sx) / n AS a,
             (sxx - CAST(sx AS DOUBLE) * sx / n) AS sxx_c
      FROM st
    ),
    r AS (
      SELECT d.l_orderkey, d.l_linenumber, d.x, d.y, p.n, p.sxx_c,
             (d.y - p.a - p.b * d.x) AS e,
             1.0 / p.n + (d.x - CAST(p.sx AS DOUBLE) / p.n)
                         * (d.x - CAST(p.sx AS DOUBLE) / p.n) / p.sxx_c AS h
      FROM d, par p
    ),
    s2 AS (
      SELECT CAST(sum(CAST(round(e * e / 100) AS BIGINT)) AS BIGINT) AS qe2
      FROM r
    ),
    cook AS (
      SELECT l_orderkey, l_linenumber, x, y,
             (e * e / (2 * (qe2 * 100.0 / (n - 2))))
               * (h / ((1 - h) * (1 - h))) AS cd
      FROM r, s2
    )
    SELECT l_orderkey, l_linenumber, x, y,
           floor(cd * 1e9 + 0.5) / 1e9 AS cooks_d_q
    FROM cook
    ORDER BY cd DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def cooks_distance_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for the price~quantity OLS over lineitem —
    the influence diagnostic (leverage × residual) behind every
    regression-QA dashboard: D_i = e_i²/(p·s²) · h_i/(1−h_i)², p=2,
    h_i the hat value of a simple regression. Sufficient statistics
    and the residual sum are integer-exact (whole-dollar y, integer
    quantity x, e² on a 100-dollar² grid); each row's D is then a
    deterministic scalar expression — one pass, top-10 by influence
    via TakeOrderedAndProject, no global sort materialized."""
    li = T(spark, sf_dir, "lineitem")
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    b = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    ) / (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    par = st.select(
        "n",
        "sx",
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
        (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")).alias(
            "sxx_c"
        ),
    )
    r = d.crossJoin(F.broadcast(par)).select(
        "l_orderkey",
        "l_linenumber",
        "x",
        "y",
        "n",
        "sxx_c",
        (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("e"),
        (
            1.0 / F.col("n")
            + (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            / F.col("sxx_c")
        ).alias("h"),
    )
    s2 = r.agg(
        F.sum(F.round(F.col("e") * F.col("e") / 100).cast("long"))
        .cast("long")
        .alias("qe2")
    )
    cook = r.crossJoin(F.broadcast(s2)).select(
        "l_orderkey",
        "l_linenumber",
        "x",
        "y",
        (
            (F.col("e") * F.col("e") / (2 * (F.col("qe2") * 100.0 / (F.col("n") - 2))))
            * (F.col("h") / ((1 - F.col("h")) * (1 - F.col("h"))))
        ).alias("cd"),
    )
    return (
        cook.orderBy(F.desc("cd"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(10)
        .select(
            "l_orderkey",
            "l_linenumber",
            "x",
            "y",
            (F.floor(F.col("cd") * 1e9 + 0.5) / 1e9).alias("cooks_d_q"),
        )
    )


@_staged(
    "t_closeness_orders",
    """
    WITH mm AS (
      SELECT min(CAST(round(o_totalprice) AS BIGINT)) AS mn,
             max(CAST(round(o_totalprice) AS BIGINT)) AS mx
      FROM orders
    ),
    b AS (
      SELECT o_orderpriority AS grp,
             least(CAST(floor((CAST(round(o_totalprice) AS BIGINT) - mn)
                              / ((mx - mn) / 10.0)) AS BIGINT), 9) AS bin
      FROM orders, mm
    ),
    cells AS (
      SELECT grp, bin, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2
    ),
    tot AS (
      SELECT bin, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY 1
    ),
    gn AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
    gtot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
    grid AS (
      SELECT g.grp, t.bin,
             coalesce(c.c, 0) AS c, t.ct, g.n, (SELECT nn FROM gtot) AS nn
      FROM gn g CROSS JOIN tot t
      LEFT JOIN cells c ON c.grp = g.grp AND c.bin = t.bin
    ),
    cum AS (
      SELECT grp, bin, n,
             sum(c) OVER (PARTITION BY grp ORDER BY bin) AS cg,
             sum(ct) OVER (PARTITION BY grp ORDER BY bin) AS call,
             nn
      FROM grid
    ),
    terms AS (
      SELECT grp, n,
             CAST(round(abs(CAST(cg AS DOUBLE) / n
                            - CAST(call AS DOUBLE) / nn) / 9 * 1e12)
                  AS BIGINT) AS term_q
      FROM cum
    )
    SELECT grp, CAST(max(n) AS BIGINT) AS n,
           floor((CAST(sum(term_q) AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS emd_q,
           ((CAST(sum(term_q) AS DOUBLE) / 1e12) <= 0.2) AS t_close_02
    FROM terms GROUP BY grp ORDER BY grp
    """,
)
def t_closeness_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the anonymization ladder after the k-anonymity and
    l-diversity rows: per quasi-identifier group (order priority),
    the ordered-attribute Earth-Mover's Distance between the group's
    sensitive-value distribution (10 equi-width whole-dollar price
    bins) and the global one, EMD = Σ|CumP−CumQ|/(K−1), flagged
    against t=0.2. Cumulative counts are integer-exact; the 10
    per-bin terms are quantized to 1e-12 before summing."""
    o = T(spark, sf_dir, "orders")
    usd = F.round("o_totalprice").cast("long")
    mm = o.agg(F.min(usd).alias("mn"), F.max(usd).alias("mx"))
    b = o.crossJoin(F.broadcast(mm)).select(
        F.col("o_orderpriority").alias("grp"),
        F.least(
            F.floor((usd - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10.0))
            .cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
    )
    cells = b.groupBy("grp", "bin").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cells.groupBy("bin").agg(F.sum("c").cast("long").alias("ct"))
    gn = cells.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    nn = cells.agg(F.sum("c").cast("long").alias("nn"))
    grid = (
        gn.crossJoin(F.broadcast(tot))
        .join(cells, ["grp", "bin"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .crossJoin(F.broadcast(nn))
    )
    w = Window.partitionBy("grp").orderBy("bin")
    cum = grid.select(
        "grp",
        "n",
        "nn",
        F.sum("c").over(w).alias("cg"),
        F.sum("ct").over(w).alias("call"),
    )
    terms = cum.select(
        "grp",
        "n",
        F.round(
            F.abs(
                F.col("cg").cast("double") / F.col("n")
                - F.col("call").cast("double") / F.col("nn")
            )
            / 9
            * 1e12
        )
        .cast("long")
        .alias("term_q"),
    )
    emd = F.sum("term_q").cast("double") / 1e12
    return (
        terms.groupBy("grp")
        .agg(
            F.max("n").cast("long").alias("n"),
            (F.floor(emd * 1e6 + 0.5) / 1e6).alias("emd_q"),
            (emd <= 0.2).alias("t_close_02"),
        )
        .orderBy("grp")
    )


@_staged(
    "shapley_attribution_events",
    """
    WITH conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id,
             CAST(sum(DISTINCT CASE event_type
                    WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                    ELSE 0 END) AS BIGINT) AS mask
      FROM events WHERE event_id % 7 = 0 GROUP BY user_id
    ),
    prof AS (
      SELECT coalesce(t.mask, 0) AS mask, CAST(count(*) AS BIGINT) AS cnt
      FROM conv c LEFT JOIN touch t ON t.user_id = c.user_id
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS c FROM prof),
    subsets AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS s),
    v AS (
      SELECT s.s,
             CAST(coalesce(sum(p.cnt), 0) AS DOUBLE)
               / (SELECT c FROM tot) AS val
      FROM subsets s LEFT JOIN prof p ON (p.mask & (~s.s)) = 0
      GROUP BY s.s
    ),
    contrib AS (
      SELECT c.ch,
             CAST(round(
               (CASE ((s0.s & 1) + ((s0.s >> 1) & 1) + ((s0.s >> 2) & 1)
                     + ((s0.s >> 3) & 1))
                  WHEN 0 THEN 0.25 WHEN 1 THEN 1.0/12
                  WHEN 2 THEN 1.0/12 ELSE 0.25 END)
               * (v1.val - s0.val) * 1e12) AS BIGINT) AS term_q
      FROM (SELECT unnest([0, 1, 2, 3]) AS ch) c
      JOIN v s0 ON ((s0.s >> c.ch) & 1) = 0
      JOIN v v1 ON v1.s = (s0.s | (1 << c.ch))
    )
    SELECT CASE ch WHEN 0 THEN 'click' WHEN 1 THEN 'error'
                   WHEN 2 THEN 'signup' ELSE 'view' END AS channel,
           floor((CAST(sum(term_q) AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS shapley_q
    FROM contrib GROUP BY ch ORDER BY channel
    """,
)
def shapley_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value marketing attribution over the four non-purchase
    channels: the characteristic function v(S) = share of converters
    whose touched-channel set ⊆ S, and φ_c = Σ_{S∌c} |S|!(3−|S|)!/4! ·
    (v(S∪c) − v(S)) — the axiomatically fair credit split (Shapley
    1953). The whole computation collapses to ONE O(rows) per-user
    aggregate; everything after is a 16-row subset lattice joined by
    bit-containment (the 2^k lattice is fixed by the schema, not the
    data — the 100 TB shape). Marginal terms quantized at 1e-12
    before the 8-term sum."""
    e = T(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    conv = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    touch = (
        e.filter(F.col("event_id") % 7 == 0)
        .groupBy("user_id")
        .agg(F.sum_distinct(bit).cast("long").alias("mask"))
    )
    prof = (
        conv.join(touch, "user_id", "left")
        .select(F.coalesce(F.col("mask"), F.lit(0).cast("long")).alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = prof.agg(F.sum("cnt").cast("long").alias("c"))
    spark_subsets = (
        e.sparkSession.range(16).select(F.col("id").cast("long").alias("s"))
    )
    v = (
        spark_subsets.join(
            prof,
            (F.col("mask").bitwiseAND(F.bitwise_not(F.col("s")))) == 0,
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("won"))
        .crossJoin(F.broadcast(tot))
        .select("s", (F.col("won").cast("double") / F.col("c")).alias("val"))
    )
    chans = e.sparkSession.createDataFrame(
        [(0, "click"), (1, "error"), (2, "signup"), (3, "view")], "ch INT, channel STRING"
    )
    s_no_c = v.select(F.col("s").alias("s0"), F.col("val").alias("v0"))
    s_with_c = v.select(F.col("s").alias("s1"), F.col("val").alias("v1"))
    popcnt = (
        F.col("s0").bitwiseAND(F.lit(1))
        + F.expr("shiftright(s0, 1)").bitwiseAND(F.lit(1))
        + F.expr("shiftright(s0, 2)").bitwiseAND(F.lit(1))
        + F.expr("shiftright(s0, 3)").bitwiseAND(F.lit(1))
    )
    weight = (
        F.when(popcnt == 0, F.lit(0.25))
        .when(popcnt == 1, F.lit(1.0 / 12))
        .when(popcnt == 2, F.lit(1.0 / 12))
        .otherwise(F.lit(0.25))
    )
    contrib = (
        chans.crossJoin(F.broadcast(s_no_c))
        .filter(F.expr("(shiftright(s0, ch) & 1) = 0"))
        .join(
            F.broadcast(s_with_c),
            F.expr("s1 = (s0 | shiftleft(CAST(1 AS BIGINT), ch))"),
        )
        .select(
            "channel",
            F.round(weight * (F.col("v1") - F.col("v0")) * 1e12)
            .cast("long")
            .alias("term_q"),
        )
    )
    return (
        contrib.groupBy("channel")
        .agg(
            (
                F.floor((F.sum("term_q").cast("double") / 1e12) * 1e6 + 0.5) / 1e6
            ).alias("shapley_q")
        )
        .orderBy("channel")
    )


@_staged(
    "forecast_baselines_scorecard_daily",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS y
      FROM events GROUP BY 1
    ),
    anchor AS (
      SELECT max(CASE WHEN x = 22 THEN y END) AS y_last,
             max(CASE WHEN x = 0 THEN y END) AS y_first
      FROM daily
    ),
    scale AS (
      SELECT CAST(sum(abs(a.y - b.y)) AS BIGINT) AS sae,
             CAST(count(*) AS BIGINT) AS sn
      FROM daily a JOIN daily b ON b.x = a.x - 7
      WHERE a.x BETWEEN 7 AND 22
    ),
    test AS (
      SELECT t.x, t.y, s7.y AS y_snaive, an.y_last, an.y_first
      FROM daily t JOIN daily s7 ON s7.x = t.x - 7
      CROSS JOIN anchor an
      WHERE t.x BETWEEN 23 AND 29
    ),
    fc AS (
      SELECT 'naive' AS model, x, y, CAST(y_last AS DOUBLE) AS yhat FROM test
      UNION ALL
      SELECT 'seasonal_naive', x, y, CAST(y_snaive AS DOUBLE) FROM test
      UNION ALL
      SELECT 'drift', x, y,
             y_last + CAST(y_last - y_first AS DOUBLE) / 22 * (x - 22)
      FROM test
    ),
    err AS (
      SELECT model,
             CAST(round(abs(y - yhat) * 1e6) AS BIGINT) AS ae_q,
             CAST(round(2 * abs(y - yhat) / (abs(y) + abs(yhat)) * 1e12)
                  AS BIGINT) AS sm_q
      FROM fc
    )
    SELECT model,
           floor(CAST(sum(ae_q) AS DOUBLE) / count(*) / 1e6 * 1e6 + 0.5)
             / 1e6 AS mae_q,
           floor(CAST(sum(sm_q) AS DOUBLE) / count(*) / 1e12 * 1e6 + 0.5)
             / 1e6 AS smape_q,
           floor(CAST(sum(ae_q) AS DOUBLE) / count(*) / 1e6
                 / ((SELECT CAST(sae AS DOUBLE) / sn FROM scale))
                 * 1e6 + 0.5) / 1e6 AS mase_q
    FROM err GROUP BY model ORDER BY model
    """,
)
def forecast_baselines_scorecard_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M-competition baseline scorecard every forecasting row
    must beat: naive (last train value), seasonal-naive (t−7), and
    drift forecasts over a 7-day holdout (days 23-29, trained on
    0-22), scored with MAE, sMAPE, and MASE (Hyndman & Koehler 2006
    — scaled by the train-set seasonal-naive MAE, the scale-free
    metric). Whole-dollar integer series; per-day errors quantized
    before averaging so every metric is a ratio of integers."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x")
    ).agg(
        F.floor(F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
        .cast("long")
        .alias("y")
    )
    anchor = daily.agg(
        F.max(F.when(F.col("x") == 22, F.col("y"))).alias("y_last"),
        F.max(F.when(F.col("x") == 0, F.col("y"))).alias("y_first"),
    )
    d7 = daily.select(F.col("x").alias("x7"), F.col("y").alias("y7"))
    scale = (
        daily.filter((F.col("x") >= 7) & (F.col("x") <= 22))
        .join(d7, F.col("x7") == F.col("x") - 7)
        .agg(
            F.sum(F.abs(F.col("y") - F.col("y7"))).cast("long").alias("sae"),
            F.count(F.lit(1)).cast("long").alias("sn"),
        )
    )
    test = (
        daily.filter((F.col("x") >= 23) & (F.col("x") <= 29))
        .join(d7, F.col("x7") == F.col("x") - 7)
        .crossJoin(F.broadcast(anchor))
        .select("x", "y", F.col("y7").alias("y_snaive"), "y_last", "y_first")
    )
    fc = (
        test.select(
            F.lit("naive").alias("model"), "x", "y",
            F.col("y_last").cast("double").alias("yhat"),
        )
        .unionByName(
            test.select(
                F.lit("seasonal_naive").alias("model"), "x", "y",
                F.col("y_snaive").cast("double").alias("yhat"),
            )
        )
        .unionByName(
            test.select(
                F.lit("drift").alias("model"), "x", "y",
                (
                    F.col("y_last")
                    + (F.col("y_last") - F.col("y_first")).cast("double")
                    / 22
                    * (F.col("x") - 22)
                ).alias("yhat"),
            )
        )
    )
    err = fc.select(
        "model",
        F.round(F.abs(F.col("y") - F.col("yhat")) * 1e6).cast("long").alias("ae_q"),
        F.round(
            2 * F.abs(F.col("y") - F.col("yhat"))
            / (F.abs(F.col("y")) + F.abs(F.col("yhat")))
            * 1e12
        )
        .cast("long")
        .alias("sm_q"),
    )
    mae = F.sum("ae_q").cast("double") / F.count(F.lit(1)) / 1e6
    smape = F.sum("sm_q").cast("double") / F.count(F.lit(1)) / 1e12
    agg = err.groupBy("model").agg(
        (F.floor(mae * 1e6 + 0.5) / 1e6).alias("mae_q"),
        (F.floor(smape * 1e6 + 0.5) / 1e6).alias("smape_q"),
        mae.alias("_mae_raw"),
    )
    return (
        agg.crossJoin(F.broadcast(scale))
        .select(
            "model",
            "mae_q",
            "smape_q",
            (
                F.floor(
                    F.col("_mae_raw")
                    / (F.col("sae").cast("double") / F.col("sn"))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("mase_q"),
        )
        .orderBy("model")
    )


@_staged(
    "heaps_law_tokens_docs",
    """
    WITH mx AS (SELECT max(doc_id) AS mdoc FROM documents),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(greatest(len(tokens) - 2, 0) AS BIGINT) AS ntok
      FROM toks
    ),
    firsts AS (
      SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tokens) - 1),
                      i -> array_to_string(list_slice(tokens, i, i + 2), ' ')))
                 AS tok
        FROM toks WHERE len(tokens) >= 3
      ) GROUP BY tok
    ),
    deciles AS (
      SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS k,
             CAST(unnest(range(1, 11)) * (SELECT mdoc FROM mx) // 10
                  AS BIGINT) AS cutoff
    )
    SELECT d.k,
           CAST((SELECT count(*) FROM per_doc p WHERE p.doc_id <= d.cutoff)
                AS BIGINT) AS n_docs,
           CAST((SELECT sum(p.ntok) FROM per_doc p WHERE p.doc_id <= d.cutoff)
                AS BIGINT) AS n_tokens,
           CAST((SELECT count(*) FROM firsts f WHERE f.first_doc <= d.cutoff)
                AS BIGINT) AS vocab,
           floor(CAST((SELECT count(*) FROM firsts f
                       WHERE f.first_doc <= d.cutoff) AS DOUBLE)
                 / (SELECT sum(p.ntok) FROM per_doc p
                    WHERE p.doc_id <= d.cutoff) * 1e6 + 0.5) / 1e6 AS ttr_q
    FROM deciles d ORDER BY d.k
    """,
)
def heaps_law_tokens_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve over word-TRIGRAM types
    (the unigram vocabulary of the synthetic corpus saturates in the
    first docs — trigram types keep growing, which is what makes the
    curve informative): type count and type/instance ratio at 10
    corpus-prefix checkpoints (doc_id order). The scalable trick:
    V(prefix) never rescans text — ONE explode to (trigram,
    first_doc = min(doc_id)) and then a 10-row broadcast of cutoffs
    against that aggregate, O(tokens) total regardless of checkpoint
    count. The falling TTR across deciles is the curve LLM-corpus
    sizing reads β from."""
    d = T(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mdoc"))
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("tokens"))
    per_doc = toks.select(
        "doc_id",
        F.greatest(F.size("tokens") - 2, F.lit(0)).cast("long").alias("ntok"),
    )
    tri = F.expr(
        "transform(sequence(0, size(tokens) - 3), "
        "i -> concat_ws(' ', slice(tokens, i + 1, 3)))"
    )
    firsts = (
        toks.filter(F.size("tokens") >= 3)
        .select("doc_id", F.explode(tri).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").cast("long").alias("first_doc"))
    )
    deciles = (
        d.sparkSession.range(1, 11)
        .select(F.col("id").cast("long").alias("k"))
        .crossJoin(F.broadcast(mx))
        .select("k", F.floor(F.col("k") * F.col("mdoc") / 10).cast("long").alias("cutoff"))
    )
    docs_at = (
        per_doc.crossJoin(F.broadcast(deciles))
        .filter(F.col("doc_id") <= F.col("cutoff"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    vocab_at = (
        firsts.crossJoin(F.broadcast(deciles))
        .filter(F.col("first_doc") <= F.col("cutoff"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    return (
        docs_at.join(vocab_at, "k")
        .select(
            "k",
            "n_docs",
            "n_tokens",
            "vocab",
            (
                F.floor(
                    F.col("vocab").cast("double") / F.col("n_tokens") * 1e6 + 0.5
                )
                / 1e6
            ).alias("ttr_q"),
        )
        .orderBy("k")
    )


@_staged(
    "js_divergence_langs_docs",
    """
    WITH tri AS (
      SELECT lang,
             unnest(list_transform(range(1, len(text) - 1),
                    i -> substr(text, i, 3))) AS g
      FROM documents
    ),
    cnt AS (
      SELECT lang, g, CAST(count(*) AS BIGINT) AS c
      FROM tri GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    p AS (
      SELECT c.lang, c.g, CAST(c.c AS DOUBLE) / t.n AS pr
      FROM cnt c JOIN tot t ON t.lang = c.lang
    ),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             coalesce(pa.pr, 0.0) AS pa, coalesce(pb.pr, 0.0) AS pb
      FROM tot a JOIN tot b ON a.lang < b.lang
      JOIN (SELECT DISTINCT g FROM cnt) g ON TRUE
      LEFT JOIN p pa ON pa.lang = a.lang AND pa.g = g.g
      LEFT JOIN p pb ON pb.lang = b.lang AND pb.g = g.g
      WHERE coalesce(pa.pr, 0.0) + coalesce(pb.pr, 0.0) > 0
    ),
    terms AS (
      SELECT lang_a, lang_b,
             CAST(round((
               CASE WHEN pa > 0
                    THEN 0.5 * pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END
               + CASE WHEN pb > 0
                      THEN 0.5 * pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END
             ) * 1e12) AS BIGINT) AS term_q
      FROM pairs
    )
    SELECT lang_a, lang_b,
           floor((CAST(sum(term_q) AS DOUBLE) / 1e12) / ln(2) * 1e6 + 0.5)
             / 1e6 AS jsd_bits_q
    FROM terms GROUP BY 1, 2 ORDER BY lang_a, lang_b
    """,
)
def js_divergence_langs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (in bits) between every language
    pair's character-trigram distribution — the symmetric, bounded
    [0,1] corpus-separation measure language-ID thresholds are tuned
    against (Lin 1991). Distributions come from integer trigram
    counts; each pointwise KL term is quantized to 1e-12 before the
    sum (the family-wide float-order device), and the pair lattice
    is langs² — fixed by the schema, not the data."""
    d = T(spark, sf_dir, "documents")
    tri = d.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
            )
        ).alias("g"),
    )
    cnt = tri.groupBy("lang", "g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    p = cnt.join(F.broadcast(tot), "lang").select(
        "lang", "g", (F.col("c").cast("double") / F.col("n")).alias("pr")
    )
    # the (lang_a, lang_b, g) support is the union of each side's
    # support, then both probability tables left-join onto it (a
    # plain full-outer on g alone would mix language pairs).
    langs = tot.select("lang")
    lp = (
        langs.select(F.col("lang").alias("lang_a"))
        .crossJoin(langs.select(F.col("lang").alias("lang_b")))
        .filter(F.col("lang_a") < F.col("lang_b"))
    )
    support = (
        lp.join(
            p.select(F.col("lang").alias("lang_a"), "g").distinct(), "lang_a"
        )
        .select("lang_a", "lang_b", "g")
        .unionByName(
            lp.join(
                p.select(F.col("lang").alias("lang_b"), "g").distinct(), "lang_b"
            ).select("lang_a", "lang_b", "g")
        )
        .distinct()
    )
    j = (
        support.join(
            p.select(F.col("lang").alias("lang_a"), "g", F.col("pr").alias("pa")),
            ["lang_a", "g"],
            "left",
        )
        .join(
            p.select(F.col("lang").alias("lang_b"), "g", F.col("pr").alias("pb")),
            ["lang_b", "g"],
            "left",
        )
        .select(
            "lang_a", "lang_b",
            F.coalesce("pa", F.lit(0.0)).alias("pa"),
            F.coalesce("pb", F.lit(0.0)).alias("pb"),
        )
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = F.when(F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m)).otherwise(
        0.0
    ) + F.when(F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m)).otherwise(0.0)
    terms = j.select(
        "lang_a", "lang_b", F.round(term * 1e12).cast("long").alias("term_q")
    )
    import math

    return (
        terms.groupBy("lang_a", "lang_b")
        .agg(
            (
                F.floor(
                    (F.sum("term_q").cast("double") / 1e12) / math.log(2) * 1e6 + 0.5
                )
                / 1e6
            ).alias("jsd_bits_q")
        )
        .orderBy("lang_a", "lang_b")
    )


def _lsh_band_stats_oracle(num_hashes: int = 32, num_bands: int = 8) -> str:
    """Band-bucket health replay: the minhash sig CTE from
    llm_oracles._minhash_lsh_oracle, then per-band bucket sizes."""
    from dbt_lakehouse_aws_spark.llm_oracles import _shingle_hash_ctes
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        MINHASH_PRIME,
        minhash_coefficients,
    )

    coeffs = minhash_coefficients(num_hashes)
    mins = ",\n             ".join(
        f"min(({a} * bh + {b}) % {MINHASH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // num_bands
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, "
        + " || ',' || ".join(
            f"CAST(h{band * rpb + j} AS VARCHAR)" for j in range(rpb)
        )
        + " AS bkey FROM sig"
        for band in range(num_bands)
    )
    return f"""{_shingle_hash_ctes()},
    hb AS (SELECT doc_id, hv % {MINHASH_PRIME} AS bh FROM h),
    sig AS (SELECT doc_id,
             {mins}
            FROM hb GROUP BY doc_id),
    bands AS (
      {band_rows}
    ),
    buckets AS (
      SELECT band, bkey, CAST(count(*) AS BIGINT) AS sz
      FROM bands GROUP BY 1, 2
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(sz) AS BIGINT) AS max_bucket,
           CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS singletons
    FROM buckets GROUP BY band ORDER BY band
    """


@_staged("lsh_band_stats_docs", "PLACEHOLDER_LSH_BAND_STATS")
def lsh_band_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH collision-budget observability: per-band bucket counts,
    max bucket size, implied candidate pairs Σ s(s−1)/2, and
    singleton share for the portable-hash MinHash(32)/8-band index —
    the dashboard a 100 TB dedup pipeline watches to catch banding
    skew BEFORE the candidate join fans out (a hot bucket here is
    quadratic cost there). Rides the production signature code
    (llmops.dedup.minhash_signatures); the oracle replays all 32
    affine lanes and the banding in SQL."""
    from dbt_lakehouse_aws_spark.llmops.dedup import minhash_signatures

    d = T(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, n=3, num_hashes=32, portable=True)
    rpb = 4
    bands = None
    for band in range(8):
        part = sigs.select(
            "doc_id",
            F.lit(band).cast("long").alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col("signature")[band * rpb + j].cast("string")
                    for j in range(rpb)
                ],
            ).alias("bkey"),
        )
        bands = part if bands is None else bands.unionByName(part)
    buckets = bands.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
            .cast("long")
            .alias("candidate_pairs"),
            F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
            .cast("long")
            .alias("singletons"),
        )
        .orderBy("band")
    )


STAGED_ORACLES["lsh_band_stats_docs"] = _lsh_band_stats_oracle()


def _capped_graph_prelude_sql(k_nn: int = 16) -> str:
    """The capped-twin CTE prelude (queries_r8's device, slot-bounded
    since the round-9 re-base — VERDICT r8 item 1): top-32
    participants per (event_type, hour) slot bound the pair join,
    then top-k_nn strongest co-activity neighbors per node,
    kNN-symmetrized, canonical (a < b) edges in ``capped``."""
    from dbt_lakehouse_aws_spark.operators.coactivity import (
        coactivity_capped_sql,
    )

    return coactivity_capped_sql(3).strip().rstrip() + f""",
    sym0 AS (
      SELECT a AS node, b AS nbr, shared FROM strong
      UNION ALL SELECT b, a, shared FROM strong
    ),
    ranked AS (
      SELECT node, nbr,
             row_number() OVER (PARTITION BY node
                                ORDER BY shared DESC, nbr ASC) AS rk
      FROM sym0
    ),
    capped AS MATERIALIZED (
      SELECT DISTINCT least(node, nbr) AS a, greatest(node, nbr) AS b
      FROM ranked WHERE rk <= {k_nn}
    )"""


@_staged(
    "adamic_adar_capped_users",
    f"""
    WITH {_capped_graph_prelude_sql(16)},
    nbr AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM capped
      UNION ALL SELECT b, a FROM capped
    ),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY 1),
    wedge AS (
      SELECT w1.node AS na, w2.node AS nb, w1.nbr AS z
      FROM nbr w1 JOIN nbr w2 ON w2.nbr = w1.nbr AND w1.node < w2.node
    ),
    nonedge AS (
      SELECT w.na, w.nb, w.z FROM wedge w
      LEFT JOIN capped e ON e.a = w.na AND e.b = w.nb
      WHERE e.a IS NULL
    ),
    scored AS (
      SELECT na, nb,
             CAST(sum(CAST(round(1e12 / ln(d.d)) AS BIGINT)) AS BIGINT)
               AS aa_q_int,
             CAST(count(*) AS BIGINT) AS common
      FROM nonedge n JOIN deg d ON d.node = n.z
      GROUP BY 1, 2
    )
    SELECT na AS user_a, nb AS user_b, common,
           floor((CAST(aa_q_int AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS adamic_adar_q
    FROM scored
    ORDER BY aa_q_int DESC, user_a ASC, user_b ASC
    LIMIT 20
    """,
)
def adamic_adar_capped_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the NEIGHBOR-CAPPED co-activity
    graph: for non-adjacent pairs, Σ_z 1/ln(deg z) over common
    neighbors — the inverse-log weighting that beats raw
    common-neighbor counts on hub-heavy graphs (Adamic & Adar 2003),
    complementing the count-based link_prediction_capped row. The
    top-16 cap bounds the wedge join at n·k² at ANY raw density (the
    queries_r8 twin discipline), and since the round-9 re-base the
    CONSTRUCTOR is slot-bounded too (top-32 per slot, VERDICT r8
    item 1); per-z contributions are quantized
    to 1e-12 integers before summing, so ranking ties are exact."""
    from dbt_lakehouse_aws_spark.operators.coactivity import (
        coactivity_weighted_capped,
    )
    from dbt_lakehouse_aws_spark.operators.graph import cap_neighbors

    weighted = coactivity_weighted_capped(spark, sf_dir, min_shared=3)
    capped = cap_neighbors(weighted, k=16, weight="shared").localCheckpoint(
        eager=True
    )
    nbr = capped.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionByName(capped.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    w1 = nbr.select(F.col("node").alias("na"), F.col("nbr").alias("z"))
    w2 = nbr.select(F.col("node").alias("nb"), F.col("nbr").alias("z"))
    wedge = w1.join(w2, "z").filter(F.col("na") < F.col("nb"))
    nonedge = wedge.join(
        capped.select(F.col("a").alias("na"), F.col("b").alias("nb")),
        ["na", "nb"],
        "left_anti",
    )
    scored = (
        nonedge.join(deg.withColumnRenamed("node", "z"), "z")
        .groupBy("na", "nb")
        .agg(
            F.sum(F.round(1e12 / F.log(F.col("d"))).cast("long"))
            .cast("long")
            .alias("aa_q_int"),
            F.count(F.lit(1)).cast("long").alias("common"),
        )
    )
    return (
        scored.orderBy(F.desc("aa_q_int"), F.asc("na"), F.asc("nb"))
        .limit(20)
        .select(
            F.col("na").alias("user_a"),
            F.col("nb").alias("user_b"),
            "common",
            (
                F.floor((F.col("aa_q_int").cast("double") / 1e12) * 1e6 + 0.5) / 1e6
            ).alias("adamic_adar_q"),
        )
    )


from dbt_lakehouse_aws_spark.operators.coactivity import (  # noqa: E402
    coactivity_capped_sql as _coactivity_capped_sql,
    coactivity_weighted_capped as _coactivity_weighted_capped,
)


@_staged(
    "degree_powerlaw_users",
    f"""
    WITH {_coactivity_capped_sql(3)},
    edges AS (SELECT a, b FROM strong),
    nbr AS (
      SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
    ),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY 1),
    hist AS (
      SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY 1
    ),
    pts AS (
      SELECT CAST(round(ln(d) * 1e6) AS BIGINT) AS lx,
             CAST(round(ln(cnt) * 1e6) AS BIGINT) AS ly
      FROM hist
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
             CAST(sum(lx * lx) AS BIGINT) AS sxx,
             CAST(sum(lx * ly) AS BIGINT) AS sxy
      FROM pts
    )
    SELECT n AS n_points,
           CAST((SELECT max(d) FROM hist) AS BIGINT) AS max_degree,
           CAST((SELECT sum(cnt) FROM hist) AS BIGINT) AS n_nodes,
           floor(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
                 * 1e6 + 0.5) / 1e6 AS loglog_slope_q,
           floor((CAST(sy AS DOUBLE) / n
                  - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
                    * sx / n) / 1e6 * 1e6 + 0.5) / 1e6 AS loglog_icept_q
    FROM st
    """,
)
def degree_powerlaw_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law readout for the SLOT-BOUNDED
    co-activity graph (re-based on
    ``coactivity_weighted_capped`` in round 9 — VERDICT r8 item 1;
    identical to the raw graph at the gate SFs where no slot exceeds
    32 participants): the log-log OLS slope over the (degree,
    frequency) histogram — the α̂ exponent proxy that decides whether
    hub mitigation (salting, kNN caps) is needed before wedge-shaped
    work. O(edges) degree count + a histogram-sized regression;
    log points quantized to 1e-6 integers so the OLS sufficient
    statistics are BIGINT-exact. (ln scale: slope unit-free,
    intercept reported back on the 1e-6 grid.)"""
    edges = _coactivity_weighted_capped(spark, sf_dir, min_shared=3).select(
        "a", "b"
    )
    nbr = edges.select(F.col("a").alias("node")).unionByName(
        edges.select(F.col("b").alias("node"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pts = hist.select(
        F.round(F.log(F.col("d").cast("double")) * 1e6).cast("long").alias("lx"),
        F.round(F.log(F.col("cnt").cast("double")) * 1e6).cast("long").alias("ly"),
    )
    st = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
    )
    extremes = hist.agg(
        F.max("d").cast("long").alias("max_degree"),
        F.sum("cnt").cast("long").alias("n_nodes"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    icept = (F.col("sy").cast("double") / F.col("n") - slope * F.col("sx") / F.col("n")) / 1e6
    return st.crossJoin(F.broadcast(extremes)).select(
        F.col("n").alias("n_points"),
        "max_degree",
        "n_nodes",
        (F.floor(slope * 1e6 + 0.5) / 1e6).alias("loglog_slope_q"),
        (F.floor(icept * 1e6 + 0.5) / 1e6).alias("loglog_icept_q"),
    )


@_staged(
    "bloom_semi_join_audit_orders",
    """
    WITH vip AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000
    ),
    bits AS (
      SELECT DISTINCT
             CAST(CAST('0x' || substr(md5('bloom' || CAST(lane AS VARCHAR)
                          || '|' || CAST(c_custkey AS VARCHAR)), 1, 15)
                  AS BIGINT) % 512 AS BIGINT) AS bit
      FROM vip, (SELECT unnest([0, 1, 2]) AS lane)
    ),
    probes AS (
      SELECT o.o_orderkey, o.o_custkey, l.lane,
             CAST(CAST('0x' || substr(md5('bloom' || CAST(l.lane AS VARCHAR)
                          || '|' || CAST(o.o_custkey AS VARCHAR)), 1, 15)
                  AS BIGINT) % 512 AS BIGINT) AS bit
      FROM orders o, (SELECT unnest([0, 1, 2]) AS lane) l
    ),
    hits AS (
      SELECT p.o_orderkey, p.o_custkey,
             CAST(count(b.bit) AS BIGINT) AS lanes_set
      FROM probes p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY 1, 2
    ),
    flagged AS (
      SELECT h.o_orderkey,
             (h.lanes_set = 3) AS bloom_pass,
             (v.c_custkey IS NOT NULL) AS exact_member
      FROM hits h LEFT JOIN vip v ON v.c_custkey = h.o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(sum(CASE WHEN exact_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN bloom_pass AND NOT exact_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN NOT bloom_pass AND exact_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           floor(CAST(sum(CASE WHEN bloom_pass AND NOT exact_member
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN NOT exact_member THEN 1 ELSE 0 END)
                 * 1e6 + 0.5) / 1e6 AS fpr_q
    FROM flagged
    """,
)
def bloom_semi_join_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join audit: a 512-bit / 3-lane portable-md5
    Bloom filter over the VIP customer set, probed by every order —
    reporting pass counts, exact membership, false-positive count
    and rate, and the must-be-zero false-negative count. This is the
    runtime-filter pattern (Spark's own bloom pushdown, Delta's DV
    checks) made auditable: at 100 TB the bloom side is KBs
    broadcast to the scan, the exact semi-join runs only in the
    audit. m=512 is deliberately undersized so the FP path is
    actually exercised (the sf0.01 load factor ~0.6 yields a
    measurable FPR; production sizing would be m ≈ 10·|keys|)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    vip = c.filter(F.col("c_acctbal") > 9000).select("c_custkey").distinct()
    lanes = o.sparkSession.range(3).select(F.col("id").cast("int").alias("lane"))

    def bloom_bit(key_col, lane_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bloom"),
                            lane_col.cast("string"),
                            F.lit("|"),
                            key_col.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 512
        )

    bits = (
        vip.crossJoin(F.broadcast(lanes))
        .select(bloom_bit(F.col("c_custkey"), F.col("lane")).alias("bit"))
        .distinct()
    )
    probes = o.crossJoin(F.broadcast(lanes)).select(
        "o_orderkey",
        "o_custkey",
        bloom_bit(F.col("o_custkey"), F.col("lane")).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "bit", "left")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("_hit").cast("long").alias("lanes_set"))
    )
    flagged = hits.join(
        F.broadcast(vip.withColumn("_vip", F.lit(1))),
        hits["o_custkey"] == vip["c_custkey"],
        "left",
    ).select(
        (F.col("lanes_set") == 3).alias("bloom_pass"),
        F.col("_vip").isNotNull().alias("exact_member"),
    )
    fp = F.sum(
        F.when(F.col("bloom_pass") & ~F.col("exact_member"), 1).otherwise(0)
    )
    nonmem = F.sum(F.when(~F.col("exact_member"), 1).otherwise(0))
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("exact_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        fp.cast("long").alias("n_false_pos"),
        F.sum(F.when(~F.col("bloom_pass") & F.col("exact_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
        (F.floor(fp.cast("double") / nonmem * 1e6 + 0.5) / 1e6).alias("fpr_q"),
    )


@_staged(
    "sorted_neighborhood_pairs_parts",
    """
    WITH keyed AS (
      SELECT p_brand, p_partkey, p_size,
             p_type || '|' || p_name AS sk
      FROM part
    ),
    ordered AS (
      SELECT p_brand, p_partkey, p_size, sk,
             lead(p_partkey, 1) OVER w AS k1,
             lead(p_size, 1) OVER w AS s1,
             lead(p_partkey, 2) OVER w AS k2,
             lead(p_size, 2) OVER w AS s2,
             lead(p_partkey, 3) OVER w AS k3,
             lead(p_size, 3) OVER w AS s3
      FROM keyed
      WINDOW w AS (PARTITION BY p_brand ORDER BY sk, p_partkey)
    ),
    cand AS (
      SELECT p_brand, p_partkey AS pa, k1 AS pb FROM ordered
      WHERE k1 IS NOT NULL AND abs(p_size - s1) <= 2
      UNION ALL
      SELECT p_brand, p_partkey, k2 FROM ordered
      WHERE k2 IS NOT NULL AND abs(p_size - s2) <= 2
      UNION ALL
      SELECT p_brand, p_partkey, k3 FROM ordered
      WHERE k3 IS NOT NULL AND abs(p_size - s3) <= 2
    )
    SELECT k.p_brand,
           CAST(count(DISTINCT k.p_partkey) AS BIGINT) AS n_parts,
           CAST(count(c.pa) AS BIGINT) AS n_candidates,
           CAST(coalesce(sum(c.pa + c.pb), 0) AS BIGINT) AS pair_checksum
    FROM keyed k LEFT JOIN cand c ON c.p_brand = k.p_brand
                                 AND c.pa = k.p_partkey
    GROUP BY k.p_brand ORDER BY k.p_brand
    """,
)
def sorted_neighborhood_pairs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    third classic blocking strategy next to the phonetic and
    LSH-band rows: sort each brand block by a composite key and pair
    every record with its next w=3 neighbors (lead windows — O(n·w),
    never a self-join), keeping pairs whose sizes differ by ≤ 2.
    Per-brand candidate counts + an id checksum. Partitioned by
    brand so no global sort; at 100 TB the sort key IS the shuffle
    key and w bounds the candidate volume linearly."""
    p = T(spark, sf_dir, "part")
    keyed = p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.concat_ws("|", F.col("p_type"), F.col("p_name")).alias("sk"),
    )
    w = Window.partitionBy("p_brand").orderBy("sk", "p_partkey")
    ordered = keyed.select(
        "p_brand",
        "p_partkey",
        "p_size",
        *[
            c
            for i in (1, 2, 3)
            for c in (
                F.lead("p_partkey", i).over(w).alias(f"k{i}"),
                F.lead("p_size", i).over(w).alias(f"s{i}"),
            )
        ],
    )
    cand = None
    for i in (1, 2, 3):
        part_i = ordered.filter(
            F.col(f"k{i}").isNotNull()
            & (F.abs(F.col("p_size") - F.col(f"s{i}")) <= 2)
        ).select(
            "p_brand",
            F.col("p_partkey").alias("pa"),
            F.col(f"k{i}").alias("pb"),
        )
        cand = part_i if cand is None else cand.unionByName(part_i)
    joined = keyed.join(
        cand.withColumnRenamed("pa", "p_partkey"), ["p_brand", "p_partkey"], "left"
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").cast("long").alias("n_parts"),
            F.count("pb").cast("long").alias("n_candidates"),
            F.coalesce(F.sum(F.col("p_partkey") + F.col("pb")), F.lit(0))
            .cast("long")
            .alias("pair_checksum"),
        )
        .orderBy("p_brand")
    )


@_staged(
    "partition_skew_audit_events",
    """
    WITH b AS (
      SELECT CAST(CAST('0x' || substr(
               md5('pt|' || CAST(user_id AS VARCHAR)), 1, 15)
             AS BIGINT) % 200 AS BIGINT) AS bucket
      FROM events
    ),
    c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rows_in
          FROM b GROUP BY 1),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(rows_in) AS BIGINT) AS total,
             CAST(max(rows_in) AS BIGINT) AS mx,
             CAST(sum(rows_in * rows_in) AS BIGINT) AS s2
      FROM c
    ),
    rk AS (
      SELECT a.bucket, a.rows_in, CAST(count(*) AS BIGINT) AS rk
      FROM c a JOIN c b
        ON (b.rows_in < a.rows_in)
        OR (b.rows_in = a.rows_in AND b.bucket <= a.bucket)
      GROUP BY a.bucket, a.rows_in
    ),
    g AS (
      SELECT CAST(sum((2 * rk.rk - st.nb - 1) * rk.rows_in) AS BIGINT) AS gnum
      FROM rk, st
    )
    SELECT st.nb AS n_buckets, st.total, st.mx AS max_rows,
           floor(st.mx / (CAST(st.total AS DOUBLE) / 200) * 1e6 + 0.5) / 1e6
             AS skew_ratio_q,
           floor(sqrt(CAST(st.s2 AS DOUBLE) / st.nb
                      - (CAST(st.total AS DOUBLE) / st.nb)
                        * (CAST(st.total AS DOUBLE) / st.nb))
                 / (CAST(st.total AS DOUBLE) / st.nb) * 1e6 + 0.5) / 1e6
             AS cv_q,
           floor(CAST(g.gnum AS DOUBLE) / (st.nb * CAST(st.total AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS gini_q
    FROM st, g
    """,
)
def partition_skew_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition skew audit: hash user_id onto 200 simulated
    reducers (the driver session's default shuffle width) with the
    portable md5 hash and report max/mean skew ratio, coefficient of
    variation, and the Gini index of the load distribution — the
    numbers that decide whether a key needs salting BEFORE a 100 TB
    shuffle hits one hot executor. The 200-row bucket histogram
    makes every statistic integer-exact (Gini via the sorted-rank
    formula, one bounded window)."""
    e = T(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pt|"), F.col("user_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 200
    )
    c = e.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("rows_in")
    )
    st = c.agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("rows_in").cast("long").alias("total"),
        F.max("rows_in").cast("long").alias("mx"),
        F.sum(F.col("rows_in") * F.col("rows_in")).cast("long").alias("s2"),
    )
    # rank via a bounded broadcast self-join (200x200 pairs), not a
    # one-task global window — the pareto_frontier/ams_f2 device.
    c2 = c.select(F.col("bucket").alias("b2"), F.col("rows_in").alias("r2"))
    rk = (
        c.join(
            F.broadcast(c2),
            (F.col("r2") < F.col("rows_in"))
            | ((F.col("r2") == F.col("rows_in")) & (F.col("b2") <= F.col("bucket"))),
        )
        .groupBy("bucket", "rows_in")
        .agg(F.count(F.lit(1)).cast("long").alias("rk"))
    )
    g = rk.crossJoin(F.broadcast(st.select("nb"))).agg(
        F.sum((2 * F.col("rk") - F.col("nb") - 1) * F.col("rows_in"))
        .cast("long")
        .alias("gnum")
    )
    mean = F.col("total").cast("double") / F.col("nb")
    return st.crossJoin(F.broadcast(g)).select(
        F.col("nb").alias("n_buckets"),
        "total",
        F.col("mx").alias("max_rows"),
        (
            F.floor(F.col("mx") / (F.col("total").cast("double") / 200) * 1e6 + 0.5)
            / 1e6
        ).alias("skew_ratio_q"),
        (
            F.floor(
                F.sqrt(F.col("s2").cast("double") / F.col("nb") - mean * mean)
                / mean
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("cv_q"),
        (
            F.floor(
                F.col("gnum").cast("double")
                / (F.col("nb") * F.col("total").cast("double"))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("gini_q"),
    )


@_staged(
    "poisson_bootstrap_ci_orders",
    """
    WITH reps AS (SELECT CAST(unnest(range(0, 100)) AS BIGINT) AS b),
    h0 AS MATERIALIZED (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS usd,
             CAST('0x' || substr(md5('boot|' || CAST(o_orderkey AS VARCHAR)),
                  1, 15) AS BIGINT) % 2147483647 AS h
      FROM orders
    ),
    w AS (
      SELECT r.b, o.usd,
             (CAST((((2 * r.b + 1) * 2654435761 % 2147483647) * o.h
                    + r.b * 40503) % 2147483647 AS DOUBLE) + 0.5)
               / 2147483647 AS u
      FROM h0 o CROSS JOIN reps r
    ),
    wt AS (
      SELECT b, usd,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  ELSE 5 END AS w
      FROM w
    ),
    means AS (
      SELECT b,
             CAST(sum(w * usd) AS DOUBLE) / sum(w) AS m
      FROM wt GROUP BY b
    ),
    sorted AS (
      SELECT m, row_number() OVER (ORDER BY m ASC) AS rn FROM means
    ),
    full_mean AS (
      SELECT CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS DOUBLE)
               / count(*) AS fm
      FROM orders
    )
    SELECT CAST(100 AS BIGINT) AS n_reps,
           floor(max(CASE WHEN rn = 3 THEN m END) * 1e6 + 0.5) / 1e6
             AS boot_lo_q,
           floor(max(CASE WHEN rn = 50 THEN m END) * 1e6 + 0.5) / 1e6
             AS boot_med_q,
           floor(max(CASE WHEN rn = 98 THEN m END) * 1e6 + 0.5) / 1e6
             AS boot_hi_q,
           floor((SELECT fm FROM full_mean) * 1e6 + 0.5) / 1e6
             AS full_mean_q
    FROM sorted
    """,
)
def poisson_bootstrap_ci_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for the mean order total — THE scalable
    bootstrap (Chamandy et al., Google 2012): instead of resampling
    n rows B times (impossible at 100 TB), each (row, replicate)
    draws an independent Poisson(1) weight, so one O(n·B) map + a
    B-group aggregate replaces B full passes. Weights come from the
    portable md5-uniform device pushed through the exact Poisson(1)
    CDF thresholds (deterministic cross-engine, reproducible
    releases). The 95% CI picks the 3rd/98th order statistics of
    the 100 replicate means (explicit discrete rule, no
    interpolation ambiguity); replicate means are exact integer-sum
    ratios."""
    o = T(spark, sf_dir, "orders")
    h0 = o.select(
        F.round("o_totalprice").cast("long").alias("usd"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("boot|"), F.col("o_orderkey").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2147483647
        ).alias("h"),
    ).localCheckpoint(eager=True)
    u = (
        (
            (
                (2 * F.col("b") + 1) * 2654435761 % 2147483647
            )
            * F.col("h")
            + F.col("b") * 40503
        )
        % 2147483647
    ).cast("double").__add__(0.5) / 2147483647
    wt = h0.select(
        "usd",
        "h",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(99).cast("long"))).alias(
            "b"
        ),
    ).select(
        "b",
        "usd",
        (
            F.when(u < 0.36787944117144233, 0)
            .when(u < 0.7357588823428847, 1)
            .when(u < 0.9196986029286058, 2)
            .when(u < 0.9810118431238462, 3)
            .when(u < 0.9963401531726563, 4)
            .otherwise(5)
        ).alias("w"),
    )
    means = wt.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("usd")).cast("double") / F.sum("w")
        ).alias("m")
    )
    full_mean = o.agg(
        (
            F.sum(F.round("o_totalprice").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("fm")
    )
    ms = means.agg(F.array_sort(F.collect_list("m")).alias("ms"))
    return ms.crossJoin(F.broadcast(full_mean)).select(
        F.lit(100).cast("long").alias("n_reps"),
        (F.floor(F.element_at("ms", 3) * 1e6 + 0.5) / 1e6).alias("boot_lo_q"),
        (F.floor(F.element_at("ms", 50) * 1e6 + 0.5) / 1e6).alias("boot_med_q"),
        (F.floor(F.element_at("ms", 98) * 1e6 + 0.5) / 1e6).alias("boot_hi_q"),
        (F.floor(F.col("fm") * 1e6 + 0.5) / 1e6).alias("full_mean_q"),
    )


@_staged(
    "expected_calibration_error_orders",
    """
    WITH d AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS usd,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(usd) AS BIGINT) AS s1,
             CAST(sum(usd * usd) AS BIGINT) AS s2
      FROM d
    ),
    scored AS (
      SELECT y,
             1.0 / (1.0 + exp(-((usd - CAST(s1 AS DOUBLE) / n)
                   / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)))))
               AS p
      FROM d, st
    ),
    binned AS (
      SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(CAST(round(p * 1e6) AS BIGINT)) AS BIGINT) AS sum_pq
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS nn FROM binned),
    ece AS (
      SELECT CAST(sum(CAST(round(
               CAST(n_b AS DOUBLE) / (SELECT nn FROM tot)
               * abs(CAST(sum_y AS DOUBLE) / n_b
                     - CAST(sum_pq AS DOUBLE) / n_b / 1e6) * 1e12)
             AS BIGINT)) AS BIGINT) AS ece_int
      FROM binned
    )
    SELECT b.bin, b.n_b,
           floor(CAST(b.sum_pq AS DOUBLE) / b.n_b / 1e6 * 1e6 + 0.5) / 1e6
             AS conf_q,
           floor(CAST(b.sum_y AS DOUBLE) / b.n_b * 1e6 + 0.5) / 1e6 AS acc_q,
           floor((CAST(e.ece_int AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS ece_q
    FROM binned b, ece e ORDER BY b.bin
    """,
)
def expected_calibration_error_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error with the 10-bin reliability curve
    (Naeini et al. 2015 — the standard LLM/classifier calibration
    readout): a deterministic logistic score (sigmoid of the
    z-scored order total) against the F-status label, per-bin
    confidence vs accuracy, and ECE = Σ (n_b/N)·|acc−conf| repeated
    on every row. Scores are quantized to 1e-6 integers before the
    per-bin sums and the 10 ECE terms to 1e-12 — nothing float-order
    dependent survives into the hash."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.round("o_totalprice").cast("long").alias("usd"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("usd").cast("long").alias("s1"),
        F.sum(F.col("usd") * F.col("usd")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    p = 1.0 / (1.0 + F.exp(-((F.col("usd") - mean) / sd)))
    scored = d.crossJoin(F.broadcast(st)).select("y", p.alias("p"))
    binned = scored.groupBy(
        F.least(F.floor(F.col("p") * 10).cast("long"), F.lit(9).cast("long")).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.round(F.col("p") * 1e6).cast("long")).cast("long").alias("sum_pq"),
    )
    tot = binned.agg(F.sum("n_b").cast("long").alias("nn"))
    conf = F.col("sum_pq").cast("double") / F.col("n_b") / 1e6
    acc = F.col("sum_y").cast("double") / F.col("n_b")
    ece = (
        binned.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.col("n_b").cast("double") / F.col("nn") * F.abs(acc - conf) * 1e12
            )
            .cast("long")
            .alias("term"),
        )
        .agg(F.sum("term").cast("long").alias("ece_int"))
    )
    return (
        binned.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n_b",
            (F.floor(conf * 1e6 + 0.5) / 1e6).alias("conf_q"),
            (F.floor(acc * 1e6 + 0.5) / 1e6).alias("acc_q"),
            (
                F.floor((F.col("ece_int").cast("double") / 1e12) * 1e6 + 0.5) / 1e6
            ).alias("ece_q"),
        )
        .orderBy("bin")
    )


@_staged(
    "dataset_card_stats_docs",
    """
    WITH base AS (
      SELECT source, lang, n_chars, md5(text) AS th FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base),
    lc AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ),
    ln_ AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM lc GROUP BY 1),
    ent AS (
      SELECT lc.source,
             CAST(sum(CAST(round(-(CAST(lc.c AS DOUBLE) / ln_.n)
                   * ln(CAST(lc.c AS DOUBLE) / ln_.n) / ln(2) * 1e12)
                 AS BIGINT)) AS BIGINT) AS ent_int,
             CAST(count(*) AS BIGINT) AS n_langs
      FROM lc JOIN ln_ ON ln_.source = lc.source
      GROUP BY lc.source
    ),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars,
             CAST(count(DISTINCT th) AS BIGINT) AS n_uniq
      FROM base GROUP BY 1
    )
    SELECT p.source, p.n_docs,
           floor(CAST(p.n_docs AS DOUBLE) / (SELECT nn FROM tot)
                 * 1e6 + 0.5) / 1e6 AS corpus_share_q,
           floor(CAST(p.sum_chars AS DOUBLE) / p.n_docs * 1e6 + 0.5) / 1e6
             AS mean_chars_q,
           p.p90_chars,
           e.n_langs,
           floor((CAST(e.ent_int AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS lang_entropy_bits_q,
           floor((1.0 - CAST(p.n_uniq AS DOUBLE) / p.n_docs) * 1e6 + 0.5)
             / 1e6 AS exact_dup_rate_q
    FROM per p JOIN ent e ON e.source = p.source
    ORDER BY p.source
    """,
)
def dataset_card_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card manifest (the datasheet every corpus
    release ships — Gebru et al. 2021): document count and corpus
    share, mean and p90 length, language count and entropy (bits),
    and the exact-duplicate rate via text-hash distinct — one
    aggregation pass per statistic family over the documents table,
    every number either an integer ratio or a 1e-12-quantized
    entropy sum. The row a 100 TB ingest publishes per shard to
    decide mixing weights."""
    d = T(spark, sf_dir, "documents")
    base = d.select("source", "lang", "n_chars", F.md5("text").alias("th"))
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    lc = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ln_ = lc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pr = F.col("c").cast("double") / F.col("n")
    import math

    ent = (
        lc.join(F.broadcast(ln_), "source")
        .select(
            "source",
            F.round(-pr * F.log(pr) / math.log(2) * 1e12)
            .cast("long")
            .alias("term"),
        )
        .groupBy("source")
        .agg(
            F.sum("term").cast("long").alias("ent_int"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
        )
    )
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long")
        .alias("p90_chars"),
        F.countDistinct("th").cast("long").alias("n_uniq"),
    )
    return (
        per.join(ent, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            (
                F.floor(F.col("n_docs").cast("double") / F.col("nn") * 1e6 + 0.5)
                / 1e6
            ).alias("corpus_share_q"),
            (
                F.floor(
                    F.col("sum_chars").cast("double") / F.col("n_docs") * 1e6 + 0.5
                )
                / 1e6
            ).alias("mean_chars_q"),
            "p90_chars",
            "n_langs",
            (
                F.floor((F.col("ent_int").cast("double") / 1e12) * 1e6 + 0.5) / 1e6
            ).alias("lang_entropy_bits_q"),
            (
                F.floor(
                    (1.0 - F.col("n_uniq").cast("double") / F.col("n_docs")) * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("exact_dup_rate_q"),
        )
        .orderBy("source")
    )


@_staged(
    "acid_version_diff_events",
    """
    WITH v0 AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_id % 2 = 0
    ),
    v1 AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    a AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(cents) AS BIGINT) AS c0
      FROM v0 GROUP BY 1
    ),
    b AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(cents) AS BIGINT) AS c1
      FROM v1 GROUP BY 1
    )
    SELECT b.event_type, a.n0, b.n1,
           CAST(b.n1 - a.n0 AS BIGINT) AS rows_added,
           CAST(b.c1 - a.c0 AS BIGINT) AS cents_added
    FROM b JOIN a ON a.event_type = b.event_type
    ORDER BY b.event_type
    """,
)
def acid_version_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-to-version table diff via time travel: write the even
    half of the events as v0, APPEND the odd half (one commit), then
    diff read(version=v0) against the latest snapshot per type —
    the audit a CDC consumer runs to reconcile what a commit
    actually changed (rows/value added, nothing mutated). The diff
    itself is two snapshot-isolated scans of the SAME table at
    different versions joined on the group key; the oracle replays
    it relationally from the source. Asserts the append bumped the
    version exactly once."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = AcidTable(
        spark, tempfile.mkdtemp(prefix=f"vd_{uuid.uuid4().hex[:8]}_") + "/t"
    )
    t.write(e.filter(F.col("event_id") % 2 == 0))
    v0 = t.latest_version()
    t.write(e.filter(F.col("event_id") % 2 == 1), mode="append")
    assert t.latest_version() == v0 + 1, "append must be exactly one commit"
    old = (
        t.read(version=v0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n0"),
            F.sum("cents").cast("long").alias("c0"),
        )
    )
    new = (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n1"),
            F.sum("cents").cast("long").alias("c1"),
        )
    )
    return (
        new.join(old, "event_type")
        .select(
            "event_type",
            "n0",
            "n1",
            (F.col("n1") - F.col("n0")).cast("long").alias("rows_added"),
            (F.col("c1") - F.col("c0")).cast("long").alias("cents_added"),
        )
        .orderBy("event_type")
    )


@_staged(
    "kendall_tau_types_daily",
    f"""
    WITH {_daily_type_sql()},
    xy AS (
      SELECT x,
             max(CASE WHEN event_type = 'click' THEN y END) AS xv,
             max(CASE WHEN event_type = 'purchase' THEN y END) AS yv
      FROM daily GROUP BY x
    ),
    p AS (SELECT x, xv, yv FROM xy WHERE xv IS NOT NULL AND yv IS NOT NULL),
    pairs AS (
      SELECT CASE WHEN (a.xv - b.xv) * (a.yv - b.yv) > 0 THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (a.xv - b.xv) * (a.yv - b.yv) < 0 THEN 1 ELSE 0 END
               AS disc,
             CASE WHEN a.xv = b.xv THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.yv = b.yv THEN 1 ELSE 0 END AS ty
      FROM p a JOIN p b ON b.x > a.x
    )
    SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_days,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           CAST(sum(tx) AS BIGINT) AS ties_x,
           CAST(sum(ty) AS BIGINT) AS ties_y,
           floor((sum(conc) - sum(disc))
                 / sqrt(CAST(count(*) - sum(tx) AS DOUBLE)
                        * (count(*) - sum(ty)))
                 * 1e6 + 0.5) / 1e6 AS tau_b_q
    FROM pairs
    """,
)
def kendall_tau_types_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between the click and purchase daily revenue
    series — the rank-correlation complement to the Spearman and
    Pearson rows (pairwise concordance with the τ-b tie correction).
    Pairs are over DAYS (the generator's fixed 30-day window ⇒ ≤435
    pairs at any scale), counted as integers; only the final ratio
    touches floats."""
    daily = _daily_type_df(spark, sf_dir)
    xy = daily.groupBy("x").agg(
        F.max(F.when(F.col("event_type") == "click", F.col("y"))).alias("xv"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("y"))).alias("yv"),
    )
    p = xy.filter(F.col("xv").isNotNull() & F.col("yv").isNotNull())
    a = p.select(F.col("x").alias("xa"), F.col("xv").alias("x1"), F.col("yv").alias("y1"))
    b = p.select(F.col("x").alias("xb"), F.col("xv").alias("x2"), F.col("yv").alias("y2"))
    nd = p.count()
    prod = (F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2"))
    pairs = a.join(F.broadcast(b), F.col("xb") > F.col("xa")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("x1") == F.col("x2"), 1).otherwise(0).alias("tx"),
        F.when(F.col("y1") == F.col("y2"), 1).otherwise(0).alias("ty"),
    )
    return pairs.agg(
        F.lit(nd).cast("long").alias("n_days"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        F.sum("tx").cast("long").alias("ties_x"),
        F.sum("ty").cast("long").alias("ties_y"),
        (
            F.floor(
                (F.sum("conc") - F.sum("disc"))
                / F.sqrt(
                    (F.count(F.lit(1)) - F.sum("tx")).cast("double")
                    * (F.count(F.lit(1)) - F.sum("ty"))
                )
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("tau_b_q"),
    )


@_staged(
    "bartlett_test_orders",
    """
    WITH d AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    st AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(usd) AS BIGINT) AS s1,
             CAST(sum(usd * usd) AS BIGINT) AS s2
      FROM d GROUP BY 1
    ),
    var_ AS (
      SELECT grp, n,
             (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS v
      FROM st
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(CAST(round((n - 1) * v * 1e3) AS BIGINT)) AS BIGINT)
               AS pooled_num_q,
             CAST(sum(CAST(round((n - 1) * ln(v) * 1e9) AS BIGINT)) AS BIGINT)
               AS sum_lnv_q,
             CAST(sum(CAST(round(1e12 / (n - 1)) AS BIGINT)) AS BIGINT)
               AS sum_inv_q
      FROM var_
    )
    SELECT k, nn AS n_total,
           floor(((nn - k) * ln((CAST(pooled_num_q AS DOUBLE) / 1e3)
                                / (nn - k))
                  - CAST(sum_lnv_q AS DOUBLE) / 1e9)
                 / (1 + (CAST(sum_inv_q AS DOUBLE) / 1e12
                         - 1.0 / (nn - k)) / (3 * (k - 1)))
                 * 1e6 + 0.5) / 1e6 AS bartlett_t_q,
           (((nn - k) * ln((CAST(pooled_num_q AS DOUBLE) / 1e3) / (nn - k))
             - CAST(sum_lnv_q AS DOUBLE) / 1e9)
            / (1 + (CAST(sum_inv_q AS DOUBLE) / 1e12
                    - 1.0 / (nn - k)) / (3 * (k - 1))) > 9.488)
             AS heteroscedastic_at_5pct
    FROM agg
    """,
)
def bartlett_test_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the five order
    priorities (χ²₄ critical 9.488) — the parametric counterpart of
    the robust Brown-Forsythe row (Bartlett is the one ANOVA
    textbooks gate with when normality holds). Group variances come
    from BIGINT sufficient statistics on whole dollars; the three
    cross-group sums — pooled numerator, Σ(nᵢ−1)ln sᵢ², Σ1/(nᵢ−1) —
    are each quantized to integer grids before summation so the
    5-addend float order can't flip the hash."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice").cast("long").alias("usd"),
    )
    st = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("usd").cast("long").alias("s1"),
        F.sum(F.col("usd") * F.col("usd")).cast("long").alias("s2"),
    )
    v = (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    var_ = st.select("grp", "n", v.alias("v"))
    agg = var_.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.round((F.col("n") - 1) * F.col("v") * 1e3).cast("long"))
        .cast("long")
        .alias("pooled_num_q"),
        F.sum(F.round((F.col("n") - 1) * F.log(F.col("v")) * 1e9).cast("long"))
        .cast("long")
        .alias("sum_lnv_q"),
        F.sum(F.round(1e12 / (F.col("n") - 1)).cast("long"))
        .cast("long")
        .alias("sum_inv_q"),
    )
    nk = F.col("nn") - F.col("k")
    t = (
        nk * F.log((F.col("pooled_num_q").cast("double") / 1e3) / nk)
        - F.col("sum_lnv_q").cast("double") / 1e9
    ) / (
        1
        + (F.col("sum_inv_q").cast("double") / 1e12 - 1.0 / nk)
        / (3 * (F.col("k") - 1))
    )
    return agg.select(
        "k",
        F.col("nn").alias("n_total"),
        (F.floor(t * 1e6 + 0.5) / 1e6).alias("bartlett_t_q"),
        (t > 9.488).alias("heteroscedastic_at_5pct"),
    )


@_staged(
    "ab_power_mde_events",
    """
    WITH d AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 80 THEN 1 ELSE 0 END) AS BIGINT)
               AS conv
      FROM events GROUP BY 1
    )
    SELECT event_type, n,
           floor(CAST(conv AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS p_base_q,
           floor((1.959963984540054 + 0.8416212335729143)
                 * sqrt(2 * (CAST(conv AS DOUBLE) / n)
                        * (1 - CAST(conv AS DOUBLE) / n)
                        / (CAST(n AS DOUBLE) / 2))
                 * 1e6 + 0.5) / 1e6 AS mde_at_n_q,
           CAST(ceil((1.959963984540054 + 0.8416212335729143)
                     * (1.959963984540054 + 0.8416212335729143)
                     * 2 * (CAST(conv AS DOUBLE) / n)
                     * (1 - CAST(conv AS DOUBLE) / n) / (0.01 * 0.01))
                AS BIGINT) AS n_per_arm_for_1pt
    FROM d ORDER BY event_type
    """,
)
def ab_power_mde_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test power planning per event type: the minimum detectable
    effect at the CURRENT sample (two-proportion z-test, α=0.05
    two-sided, 80% power — the 1.96/0.842 quantile pair written as
    exact double literals both sides) and the required per-arm n to
    detect a 1-point lift, from the observed value>80 conversion
    base rate (~20% on this corpus — a realistic funnel step). Pure closed form over one aggregate — the experiment-
    sizing row every growth dashboard carries."""
    e = T(spark, sf_dir, "events")
    d = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 80, 1).otherwise(0))
        .cast("long")
        .alias("conv"),
    )
    zsum = 1.959963984540054 + 0.8416212335729143
    p = F.col("conv").cast("double") / F.col("n")
    return d.select(
        "event_type",
        "n",
        (F.floor(p * 1e6 + 0.5) / 1e6).alias("p_base_q"),
        (
            F.floor(
                zsum * F.sqrt(2 * p * (1 - p) / (F.col("n").cast("double") / 2))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("mde_at_n_q"),
        F.ceil(zsum * zsum * 2 * p * (1 - p) / (0.01 * 0.01))
        .cast("long")
        .alias("n_per_arm_for_1pt"),
    ).orderBy("event_type")


@_staged(
    "cross_entropy_sources_docs",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    sc AS (
      SELECT source, t, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    sn AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY 1),
    gc AS (SELECT t, CAST(sum(c) AS BIGINT) AS g FROM sc GROUP BY 1),
    gn AS (SELECT CAST(sum(g) AS BIGINT) AS m FROM gc),
    terms AS (
      SELECT sc.source,
             CAST(round(-(CAST(sc.c AS DOUBLE) / sn.n)
                 * ln(CAST(gc.g AS DOUBLE) / (SELECT m FROM gn)) / ln(2)
                 * 1e12) AS BIGINT) AS hx_q,
             CAST(round(-(CAST(sc.c AS DOUBLE) / sn.n)
                 * ln(CAST(sc.c AS DOUBLE) / sn.n) / ln(2)
                 * 1e12) AS BIGINT) AS h_q
      FROM sc JOIN sn ON sn.source = sc.source
      JOIN gc ON gc.t = sc.t
    )
    SELECT source,
           floor((CAST(sum(hx_q) AS DOUBLE) / 1e12) * 1e6 + 0.5) / 1e6
             AS cross_entropy_bits_q,
           floor((CAST(sum(hx_q) - sum(h_q) AS DOUBLE) / 1e12) * 1e6 + 0.5)
             / 1e6 AS kl_bits_q
    FROM terms GROUP BY source ORDER BY source
    """,
)
def cross_entropy_sources_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cross-entropy H(Pₛ, Q) against the corpus-wide
    token distribution and the implied KL divergence (bits) — the
    distribution-shift scorecard a data-mixing pipeline reads to
    spot sources that don't look like the blend they're entering
    (every source's support ⊆ corpus support by construction, so no
    smoothing term hides bugs). Integer token counts; each pointwise
    term quantized to 1e-12 before summation."""
    import math

    d = T(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split(F.col("text"), " ")).alias("t"))
    sc = tok.groupBy("source", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    sn = sc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    gc = sc.groupBy("t").agg(F.sum("c").cast("long").alias("g"))
    gn = gc.agg(F.sum("g").cast("long").alias("m"))
    ps = F.col("c").cast("double") / F.col("n")
    q = F.col("g").cast("double") / F.col("m")
    terms = (
        sc.join(F.broadcast(sn), "source")
        .join(gc, "t")
        .crossJoin(F.broadcast(gn))
        .select(
            "source",
            F.round(-ps * F.log(q) / math.log(2) * 1e12).cast("long").alias("hx_q"),
            F.round(-ps * F.log(ps) / math.log(2) * 1e12).cast("long").alias("h_q"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            (
                F.floor((F.sum("hx_q").cast("double") / 1e12) * 1e6 + 0.5) / 1e6
            ).alias("cross_entropy_bits_q"),
            (
                F.floor(
                    ((F.sum("hx_q") - F.sum("h_q")).cast("double") / 1e12) * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("kl_bits_q"),
        )
        .orderBy("source")
    )


@_staged(
    "shannon_code_audit_docs",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
    coded AS (
      SELECT t, c, (SELECT n FROM n) AS n,
             CAST(ceil(-ln(CAST(c AS DOUBLE) / (SELECT n FROM n)) / ln(2))
                  AS BIGINT) AS code_len
      FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab,
           CAST(max(n) AS BIGINT) AS n_tokens,
           floor(CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n)
                     * ln(CAST(c AS DOUBLE) / n) / ln(2) * 1e12) AS BIGINT))
                 AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS entropy_bits_q,
           floor(CAST(sum(c * code_len) AS DOUBLE) / max(n) * 1e6 + 0.5)
             / 1e6 AS avg_code_len_q,
           floor(CAST(sum(CAST(round(pow(2.0, -code_len) * 1e12) AS BIGINT))
                 AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS kraft_sum_q,
           (sum(CAST(round(pow(2.0, -code_len) * 1e12) AS BIGINT)) <= 1000000000000)
             AS kraft_ok
    FROM coded
    """,
)
def shannon_code_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-code audit of the corpus token distribution: assign
    each token the ⌈−log₂ p⌉ code length, check the Kraft inequality
    Σ2^−L ≤ 1 (the prefix-code feasibility bound), and compare the
    achieved average code length against the entropy lower bound —
    the within-1-bit theorem every compression/tokenizer-efficiency
    readout rests on. 2^−L is an exact power of two and Σc·L is an
    integer, so only the entropy sum needs the 1e-12 term grid."""
    import math

    d = T(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
    c = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = c.agg(F.sum("c").cast("long").alias("n"))
    coded = c.crossJoin(F.broadcast(n)).select(
        "t",
        "c",
        "n",
        F.ceil(
            -F.log(F.col("c").cast("double") / F.col("n")) / math.log(2)
        )
        .cast("long")
        .alias("code_len"),
    )
    p = F.col("c").cast("double") / F.col("n")
    return coded.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.max("n").cast("long").alias("n_tokens"),
        (
            F.floor(
                F.sum(
                    F.round(-p * F.log(p) / math.log(2) * 1e12).cast("long")
                ).cast("double")
                / 1e12
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("entropy_bits_q"),
        (
            F.floor(
                F.sum(F.col("c") * F.col("code_len")).cast("double")
                / F.max("n")
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("avg_code_len_q"),
        (
            F.floor(
                F.sum(
                    F.round(F.pow(F.lit(2.0), -F.col("code_len")) * 1e12).cast(
                        "long"
                    )
                ).cast("double")
                / 1e12
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("kraft_sum_q"),
        (
            F.sum(
                F.round(F.pow(F.lit(2.0), -F.col("code_len")) * 1e12).cast("long")
            )
            <= 1000000000000
        ).alias("kraft_ok"),
    )


@_staged(
    "wasserstein1_2s_orders",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS in1,
             CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS in2
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    pts AS (
      SELECT v, CAST(sum(in1) AS BIGINT) AS c1, CAST(sum(in2) AS BIGINT) AS c2
      FROM s GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(c1) OVER (ORDER BY v) AS cum1,
             sum(c2) OVER (ORDER BY v) AS cum2,
             lead(v) OVER (ORDER BY v) AS vnext
      FROM pts
    ),
    n AS (
      SELECT CAST(sum(in1) AS BIGINT) AS n1, CAST(sum(in2) AS BIGINT) AS n2
      FROM s
    ),
    terms AS (
      SELECT CAST(round(abs(CAST(cum1 AS DOUBLE) / n1
                            - CAST(cum2 AS DOUBLE) / n2)
                        * (vnext - v) * 1e6) AS BIGINT) AS term_q
      FROM cum, n WHERE vnext IS NOT NULL
    )
    SELECT (SELECT n1 FROM n) AS n1, (SELECT n2 FROM n) AS n2,
           floor(CAST(sum(term_q) AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
             AS w1_distance_q
    FROM terms
    """,
)
def wasserstein1_2s_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-Wasserstein (earth-mover) distance between the URGENT and
    LOW order-total distributions: W₁ = ∫|F₁−F₂| dv over the pooled
    whole-dollar support — the magnitude-aware complement of the KS
    row (KS reads the worst gap, W₁ reads the total transport).
    Scalable shape: ECDFs ride the two-pass prefix_sum and the Δv
    gap comes from a rank EQUI-join on global_row_number — no
    one-task window anywhere (the oracle keeps DuckDB's plain
    ORDER BY windows). Per-support-point terms quantized to 1e-6
    dollar-mass integers before summing."""
    from dbt_lakehouse_aws_spark.operators.windows import (
        global_row_number,
        prefix_sum,
    )

    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    s = o.select(
        F.round("o_totalprice").cast("long").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("in1"),
        F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0).alias("in2"),
    )
    pts = s.groupBy("v").agg(
        F.sum("in1").cast("long").alias("c1"),
        F.sum("in2").cast("long").alias("c2"),
    )
    cum = prefix_sum(pts, [F.asc("v")], "c1", name="cum1")
    cum = prefix_sum(cum, [F.asc("v")], "c2", name="cum2")
    rn = global_row_number(cum, [F.asc("v")], name="rn")
    nxt = rn.select((F.col("rn") - 1).alias("rn"), F.col("v").alias("vnext"))
    gap = rn.join(nxt, "rn")
    n = s.agg(
        F.sum("in1").cast("long").alias("n1"), F.sum("in2").cast("long").alias("n2")
    )
    terms = gap.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        F.round(
            F.abs(
                F.col("cum1").cast("double") / F.col("n1")
                - F.col("cum2").cast("double") / F.col("n2")
            )
            * (F.col("vnext") - F.col("v"))
            * 1e6
        )
        .cast("long")
        .alias("term_q"),
    )
    return terms.groupBy("n1", "n2").agg(
        (
            F.floor(F.sum("term_q").cast("double") / 1e6 * 1e6 + 0.5) / 1e6
        ).alias("w1_distance_q")
    )

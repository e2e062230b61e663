"""Round-9 query promotions (formerly ``staged_r9.py``, authored in
round 6 and 4-gate verified through rounds 6–8; promoted at the
round-9 rotation per the ``rotation.py`` ledger — the first 24 lead
the ROUND9_WINDOW after the 8 deferred round-8 registrations and the
18-query stalest-evidence backfill; the 8 tail rows join round 10's
window). Every entry carries a full DuckDB value oracle and re-runs
against it every session via ``tests/test_entry_contract.py``.

Themes: string-similarity modalities the linkage family lacked
(Monge-Elkan token-set, character-trigram cosine), weighted and
centrality graph ops (hop-bounded Bellman-Ford, harmonic closeness),
k-group statistics (one-way ANOVA, Kruskal-Wallis), lead-lag
cross-correlation, per-entity risk ratios (Sharpe-style), and
3-itemset association mining.
"""

from __future__ import annotations

#: name → oracle SQL, mirrors standard_queries' registry shape
_PROMOTED_ORACLES: dict[str, str] = {}
#: name → (spark, sf_dir) -> DataFrame
_PROMOTED_QUERIES: dict[str, object] = {}


def _promoted(name: str, oracle: str):
    def deco(fn):
        _PROMOTED_ORACLES[name] = oracle
        _PROMOTED_QUERIES[name] = fn
        return fn

    return deco


from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402,F401
from pyspark.sql import functions as F  # noqa: E402

from dbt_lakehouse_aws_spark.operators.coactivity import (  # noqa: E402
    coactivity_capped_sql as _coactivity_capped_sql,
    coactivity_weighted_capped as _coactivity_weighted_capped,
)
from dbt_lakehouse_aws_spark.queries_r5 import (  # noqa: E402
    _DIRTY_NAME_SQL,
    _LINK_BLOCK,
    _LINK_BLOCK_SQL,
)
from dbt_lakehouse_aws_spark.sources.tables import T  # noqa: E402


@_promoted(
    "monge_elkan_parts",
    f"""
    WITH dirty AS MATERIALIZED (
      SELECT p_partkey AS dirty_key, p_brand, p_type, p_size,
             {_DIRTY_NAME_SQL} AS dirty_name
      FROM part
    ),
    cand AS MATERIALIZED (
      SELECT p.p_partkey, p.p_name, d.dirty_key, d.dirty_name
      FROM part p JOIN dirty d ON {_LINK_BLOCK_SQL}
    ),
    atok AS (
      SELECT p_partkey, dirty_key, atok, CAST(count(*) AS BIGINT) AS a_cnt
      FROM (SELECT p_partkey, dirty_key,
                   unnest(string_split(p_name, ' ')) AS atok
            FROM cand)
      GROUP BY 1, 2, 3
    ),
    btok AS (
      SELECT DISTINCT p_partkey, dirty_key,
             unnest(string_split(dirty_name, ' ')) AS btok
      FROM cand
    ),
    best AS (
      SELECT a.p_partkey, a.dirty_key, a.atok, a.a_cnt,
             CAST(max(floor(jaro_winkler_similarity(a.atok, b.btok) * 1e9 + 0.5))
                  AS BIGINT) AS jw9
      FROM atok a JOIN btok b
        ON b.p_partkey = a.p_partkey AND b.dirty_key = a.dirty_key
      GROUP BY 1, 2, 3, 4
    ),
    me AS (
      SELECT p_partkey, dirty_key,
             round(CAST(sum(a_cnt * jw9) AS DOUBLE) / (1e9 * sum(a_cnt)), 6) AS me_sim
      FROM best GROUP BY 1, 2
    )
    SELECT p_partkey, dirty_key, me_sim FROM me
    WHERE me_sim >= 0.95
    """,
)
def monge_elkan_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monge-Elkan token-set similarity (the hybrid string metric:
    per clean-name token, the MAX Jaro-Winkler against any dirty
    token; averaged over clean-token instances) between the part
    catalog and the deterministic dirty feed, blocked on the same
    composite (brand, type, size) as record_linkage_parts — the
    modality that survives TOKEN REORDERING, which whole-string JW
    punishes. The JW kernel is the bit-identical rapidfuzz-convention
    one (llmops/linkage.py); each per-token max is quantized to 1e-9
    integer units BEFORE the average so the cross-token sum is
    order-free (memory: order-dependent float sums). Shuffle shape:
    token-level rows bounded by within-block pair volume x tokens
    (~25x), never corpus^2."""
    from dbt_lakehouse_aws_spark.llmops.linkage import jaro_winkler_col

    p = T(spark, sf_dir, "part")
    blk = [F.col(c) for c in _LINK_BLOCK]
    clean = p.select("p_partkey", "p_name", *blk)
    dirty = p.select(
        F.col("p_partkey").alias("dirty_key"),
        F.expr(_DIRTY_NAME_SQL).alias("dirty_name"),
        *blk,
    )
    cand = clean.join(dirty, _LINK_BLOCK).select(
        "p_partkey", "p_name", "dirty_key", "dirty_name"
    )
    atok = (
        cand.select(
            "p_partkey", "dirty_key",
            F.explode(F.split("p_name", " ")).alias("atok"),
        )
        .groupBy("p_partkey", "dirty_key", "atok")
        .agg(F.count(F.lit(1)).cast("long").alias("a_cnt"))
    )
    btok = cand.select(
        "p_partkey", "dirty_key",
        F.explode(F.split("dirty_name", " ")).alias("btok"),
    ).distinct()
    # jw9 is a pure function of the token pair, and the token
    # vocabulary is bounded (TPC-H part-name words): score each
    # DISTINCT (atok, btok) pair once and broadcast the scores back,
    # instead of shipping every pair-level row through the pandas UDF
    # (round 10, guide §4.1 — measured 288k UDF rows → 3.9k at sf0.1;
    # the ratio only grows with sf since the vocabulary is fixed)
    jw9 = F.floor(jaro_winkler_col(F.col("atok"), F.col("btok")) * 1e9 + 0.5).cast("long")
    tp = atok.join(btok, ["p_partkey", "dirty_key"])
    scores = (
        tp.select("atok", "btok").distinct().select("atok", "btok", jw9.alias("jw9"))
    )
    best = (
        tp.join(F.broadcast(scores), ["atok", "btok"])
        .groupBy("p_partkey", "dirty_key", "atok", "a_cnt")
        .agg(F.max("jw9").alias("jw9"))
    )
    me = best.groupBy("p_partkey", "dirty_key").agg(
        F.round(
            F.sum(F.col("a_cnt") * F.col("jw9")).cast("double")
            / (F.lit(1e9) * F.sum("a_cnt")),
            6,
        ).alias("me_sim")
    )
    return me.filter(F.col("me_sim") >= 0.95)


@_promoted(
    "trigram_cosine_pairs_parts",
    f"""
    WITH dirty AS MATERIALIZED (
      SELECT p_partkey AS dirty_key, p_brand, p_type, p_size,
             {_DIRTY_NAME_SQL} AS dirty_name
      FROM part
    ),
    cand AS MATERIALIZED (
      SELECT p.p_partkey, p.p_name, d.dirty_key, d.dirty_name
      FROM part p JOIN dirty d ON {_LINK_BLOCK_SQL}
    ),
    ag AS (
      SELECT p_partkey, g, CAST(count(*) AS BIGINT) AS ca FROM (
        SELECT p_partkey,
               unnest(list_transform(range(1, length(p_name) - 1),
                                     i -> substr(p_name, CAST(i AS INT), 3))) AS g
        FROM (SELECT DISTINCT p_partkey, p_name FROM cand)
      ) GROUP BY 1, 2
    ),
    bg AS (
      SELECT dirty_key, g, CAST(count(*) AS BIGINT) AS cb FROM (
        SELECT dirty_key,
               unnest(list_transform(range(1, length(dirty_name) - 1),
                                     i -> substr(dirty_name, CAST(i AS INT), 3))) AS g
        FROM (SELECT DISTINCT dirty_key, dirty_name FROM cand)
      ) GROUP BY 1, 2
    ),
    na AS (SELECT p_partkey, CAST(sum(ca * ca) AS BIGINT) AS n2a FROM ag GROUP BY 1),
    nb AS (SELECT dirty_key, CAST(sum(cb * cb) AS BIGINT) AS n2b FROM bg GROUP BY 1),
    dots AS (
      SELECT c.p_partkey, c.dirty_key, CAST(sum(a.ca * b.cb) AS BIGINT) AS dot
      FROM cand c
      JOIN ag a ON a.p_partkey = c.p_partkey
      JOIN bg b ON b.dirty_key = c.dirty_key AND b.g = a.g
      GROUP BY 1, 2
    )
    SELECT d.p_partkey, d.dirty_key,
           round(CAST(d.dot AS DOUBLE)
                 / sqrt(CAST(na.n2a AS DOUBLE) * nb.n2b), 6) AS cos_sim
    FROM dots d
    JOIN na ON na.p_partkey = d.p_partkey
    JOIN nb ON nb.dirty_key = d.dirty_key
    WHERE CAST(d.dot AS DOUBLE) / sqrt(CAST(na.n2a AS DOUBLE) * nb.n2b) >= 0.85
    """,
)
def trigram_cosine_pairs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram COSINE similarity pairs, clean catalog vs
    dirty feed within the composite block — the q-gram-profile
    modality of the linkage family (complements exact-set Jaccard,
    edit distance, JW, and Monge-Elkan): counts, not sets, so
    repeated substrings weigh in, and a single dropped character
    perturbs at most 3 of ~30 gram counts. Sufficient statistics are
    all BIGINTs (dot product, squared norms); one sqrt + divide at
    the end, rounded 6dp — no float summation anywhere. Join shape:
    gram-level equi-join bounded by within-block pair volume,
    map-side combinable counts."""
    p = T(spark, sf_dir, "part")
    blk = [F.col(c) for c in _LINK_BLOCK]
    grams = lambda col: F.expr(
        f"CASE WHEN length({col}) >= 3 THEN "
        f"transform(sequence(1, length({col}) - 2), i -> substring({col}, i, 3)) "
        f"ELSE array() END"
    )
    clean = p.select("p_partkey", "p_name", *blk)
    dirty = p.select(
        F.col("p_partkey").alias("dirty_key"),
        F.expr(_DIRTY_NAME_SQL).alias("dirty_name"),
        *blk,
    )
    cand = clean.join(dirty, _LINK_BLOCK).select("p_partkey", "dirty_key")
    ag = (
        clean.select("p_partkey", F.explode(grams("p_name")).alias("g"))
        .groupBy("p_partkey", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    bg = (
        dirty.select("dirty_key", F.explode(grams("dirty_name")).alias("g"))
        .groupBy("dirty_key", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    na = ag.groupBy("p_partkey").agg(F.sum(F.col("ca") * F.col("ca")).cast("long").alias("n2a"))
    nb = bg.groupBy("dirty_key").agg(F.sum(F.col("cb") * F.col("cb")).cast("long").alias("n2b"))
    dots = (
        cand.join(ag, "p_partkey")
        .join(bg, ["dirty_key", "g"])
        .groupBy("p_partkey", "dirty_key")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("n2a").cast("double") * F.col("n2b")
    )
    return (
        dots.join(na, "p_partkey")
        .join(nb, "dirty_key")
        .filter(cos >= 0.85)
        .select("p_partkey", "dirty_key", F.round(cos, 6).alias("cos_sim"))
    )


@_promoted(
    "closeness_users_events",
    f"""
    WITH {_coactivity_capped_sql().strip().rstrip()},
    edges AS (SELECT a, b FROM strong),
    sym AS MATERIALIZED (
      SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges
    ),
    p1 AS MATERIALIZED (SELECT DISTINCT u AS s, v AS node FROM sym),
    p2 AS MATERIALIZED (
      SELECT DISTINCT p1.s, n.v AS node
      FROM p1 JOIN sym n ON n.u = p1.node
      WHERE n.v <> p1.s
        AND NOT EXISTS (SELECT 1 FROM p1 x WHERE x.s = p1.s AND x.node = n.v)
    ),
    p3 AS MATERIALIZED (
      SELECT DISTINCT p2.s, n.v AS node
      FROM p2 JOIN sym n ON n.u = p2.node
      WHERE n.v <> p2.s
        AND NOT EXISTS (SELECT 1 FROM p1 x WHERE x.s = p2.s AND x.node = n.v)
        AND NOT EXISTS (SELECT 1 FROM p2 y WHERE y.s = p2.s AND y.node = n.v)
    ),
    hops AS (
      SELECT s, 12 AS unit FROM p1
      UNION ALL SELECT s, 6 FROM p2
      UNION ALL SELECT s, 4 FROM p3
    )
    SELECT s AS user_id, CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum(unit) AS BIGINT) AS harmonic12
    FROM hops GROUP BY 1
    ORDER BY harmonic12 DESC, user_id ASC
    LIMIT 100
    """,
)
def closeness_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded HARMONIC closeness centrality (sum of 1/dist to
    every node within 3 hops) on the SLOT-BOUNDED shared>=3
    co-activity graph — the who-is-central ranking next to PageRank
    (flow), HITS (authority), and k-core (density). 1/dist is kept
    in integer twelfths (operators/graph.py::bounded_closeness), so
    both engines agree on BIGINTs bit-for-bit; the oracle unrolls
    the 3 BFS rounds as anti-joined distance shells (MATERIALIZED —
    the shells are multiply-referenced). Re-based in round 10
    (VERDICT r9 item 1): the edge list comes from
    ``coactivity_weighted_capped`` (top-32 participants per
    (event_type, hour) slot before pairing), so the constructor is
    slots·C(32,2)-bounded instead of the raw Θ(sf²) pair join the
    round-9 promotion paid (140.6M pair candidates at sf1.0);
    identical at the driver's sf0.01 (max slot occupancy 10 < 32).
    At 100 TB the exact bounded form is the calibration oracle for
    HyperBall-style sketched closeness
    (closeness_sketch_users_events). Top-100 by centrality."""
    from dbt_lakehouse_aws_spark.operators.graph import bounded_closeness

    edges = _coactivity_weighted_capped(spark, sf_dir, min_shared=3).select("a", "b")
    out = bounded_closeness(edges, max_hops=3)
    return (
        out.select(F.col("node").alias("user_id"), "n_reached", "harmonic12")
        .orderBy(F.desc("harmonic12"), F.asc("user_id"))
        .limit(100)
    )


# round 10 (VERDICT r9 item 1): the edge CTEs are the slot-bounded
# capped prelude — `strong` is (a, b, shared) with each (event_type,
# hour) slot capped to its 32 most-active participants before pairing.
_BF_EDGES_SQL = (
    _coactivity_capped_sql().strip().rstrip()
    + """,
    wedges AS MATERIALIZED (
      SELECT a, b, CAST(1000000 // shared AS BIGINT) AS w
      FROM strong
    )
"""
)


def _bellman_ford_oracle(rounds: int = 4) -> str:
    parts = [
        _BF_EDGES_SQL.strip(),
        """sym AS MATERIALIZED (
      SELECT a AS u, b AS v, w FROM wedges UNION ALL SELECT b, a, w FROM wedges
    ),
    d0 AS MATERIALIZED (
      SELECT DISTINCT u AS node, CAST(0 AS BIGINT) AS dist
      FROM sym WHERE u % 7 = 0
    )""",
    ]
    for i in range(rounds):
        parts.append(
            f"""d{i + 1} AS MATERIALIZED (
      SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT s.v AS node, d.dist + s.w AS dist
        FROM d{i} d JOIN sym s ON s.u = d.node
      ) GROUP BY node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node AS user_id, dist FROM d{rounds}
    ORDER BY dist ASC, user_id ASC
    """
    )


@_promoted("bellman_ford_users", _bellman_ford_oracle(4))
def bellman_ford_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded weighted shortest paths (4 Bellman-Ford relaxation
    rounds) from the seed set {user_id % 7 = 0} over the co-activity
    graph with edge cost floor(1e6 / shared-count) — strong ties are
    cheap to traverse, so the distance is an affinity metric, the
    weighted complement of bfs_hops' unweighted shells. Costs are
    integer micro-units end-to-end: every path sum is a BIGINT and
    min() is engine-order-free (the float-sum trap can't occur). The
    oracle unrolls the identical 4 synchronous relaxations as
    MATERIALIZED CTEs (each round is referenced twice — the
    2^N-inlining trap is documented in memory). Re-based in round 10
    (VERDICT r9 item 1): the edge list comes from
    ``coactivity_weighted_capped`` (top-32 participants per
    (event_type, hour) slot before pairing — the same deterministic
    estimand device as the top-16 neighbor cap), so the constructor
    is slots·C(32,2)-bounded instead of the raw Θ(sf²) pair join the
    round-9 promotion paid (140.6M pair candidates at sf1.0);
    identical at the driver's sf0.01 (max slot occupancy 10 < 32)."""
    from dbt_lakehouse_aws_spark.operators.graph import bellman_ford_rounds

    wedges = (
        _coactivity_weighted_capped(spark, sf_dir, min_shared=3)
        .select("a", "b", F.expr("CAST(1000000 div shared AS BIGINT)").alias("w"))
        # pinned: the slot self-join above feeds BOTH the seed
        # derivation and the relaxation loop — without the pin the
        # constructor replays per consumer (guide §5 caching rule:
        # reused AND expensive to recompute)
        .localCheckpoint(eager=True)
    )
    nodes = wedges.select(F.col("a").alias("node")).unionByName(
        wedges.select(F.col("b").alias("node"))
    ).distinct()
    seeds = nodes.filter(F.col("node") % 7 == 0)
    out = bellman_ford_rounds(wedges, seeds, weight="w", rounds=4)
    return (
        out.select(F.col("node").alias("user_id"), "dist")
        .orderBy(F.asc("dist"), F.asc("user_id"))
    )


@_promoted(
    "anova_f_event_types",
    """
    WITH x AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS q
      FROM x GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_tot, CAST(sum(s) AS BIGINT) AS s_tot,
             CAST(sum(q) AS BIGINT) AS q_tot, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(floor(CAST(s AS DOUBLE) * s / n * 1000 + 0.5)) AS BIGINT)
               AS ssb_units
      FROM g
    )
    SELECT k AS k_groups, n_tot,
           floor(((CAST(ssb_units AS DOUBLE) / 1000
                   - CAST(s_tot AS DOUBLE) * s_tot / n_tot) / (k - 1))
                 / ((CAST(q_tot AS DOUBLE) - CAST(ssb_units AS DOUBLE) / 1000)
                    / (n_tot - k))
                 * 1e6 + 0.5) / 1e6 AS f_q
    FROM tot
    """,
)
def anova_f_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic across the k event types (does mean
    event value differ by type?) — the k-group parametric companion
    to welch_ttest_events (2 groups). Everything reduces to exact
    integer sufficient statistics per group (n, sum of cents, sum of
    squared cents); each group's between-term S^2/n is quantized to
    1e-3 units BEFORE the cross-group sum (the jackknife lesson:
    cross-group float sums are order-dependent), so both engines sum
    identical BIGINTs; F is one float expression evaluated in the
    same operation order, floor-quantized 1e-6."""
    e = T(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
    )
    ssb_unit = F.floor(
        F.col("s").cast("double") * F.col("s") / F.col("n") * 1000 + 0.5
    ).cast("long")
    tot = g.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").cast("long").alias("s_tot"),
        F.sum("q").cast("long").alias("q_tot"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(ssb_unit).cast("long").alias("ssb_units"),
    )
    n_tot, s_tot, q_tot, k = (
        F.col("n_tot"), F.col("s_tot"), F.col("q_tot"), F.col("k")
    )
    ssb = F.col("ssb_units").cast("double") / 1000 - s_tot.cast("double") * s_tot / n_tot
    ssw = q_tot.cast("double") - F.col("ssb_units").cast("double") / 1000
    f_stat = (ssb / (k - 1)) / (ssw / (n_tot - k))
    return tot.select(
        k.alias("k_groups"),
        "n_tot",
        (F.floor(f_stat * 1e6 + 0.5) / 1e6).alias("f_q"),
    )


@_promoted(
    "kruskal_wallis_priority",
    """
    WITH x AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    vg AS (
      SELECT v, grp, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY 1, 2
    ),
    cells AS (
      SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt FROM vg GROUP BY 1
    ),
    ranked AS (
      SELECT v, 2 * sum(cnt) OVER (ORDER BY v) - cnt + 1 AS rank2
      FROM cells
    ),
    per_grp AS (
      SELECT vg.grp, CAST(sum(vg.cnt) AS BIGINT) AS n,
             CAST(sum(vg.cnt * r.rank2) AS BIGINT) AS r2
      FROM vg JOIN ranked r ON r.v = vg.v
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(floor(CAST(r2 AS DOUBLE) * r2 / n * 0.001 + 0.5)) AS BIGINT)
               AS rr_units,
             (SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) FROM cells) AS tie
      FROM per_grp
    )
    SELECT k AS k_groups, n_tot,
           floor(((3.0 * (CAST(rr_units AS DOUBLE) * 1000)
                    / (CAST(n_tot AS DOUBLE) * (n_tot + 1))
                   - 3.0 * (n_tot + 1))
                  / (1 - CAST(tie AS DOUBLE)
                         / (CAST(n_tot AS DOUBLE) * n_tot * n_tot - n_tot)))
                 * 1e6 + 0.5) / 1e6 AS h_q
    FROM tot
    """,
)
def kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five order priorities (rank-based
    k-group test — the nonparametric ANOVA, extending Mann-Whitney's
    2-group machinery): midranks as exact 2x-rank INTEGERS from
    VALUE-LEVEL counts on the scalable prefix_sum, per-group
    rank-sums as BIGINTs, each group's R^2/n quantized to integer
    milli-units before the cross-group sum (float sums are
    order-dependent — jackknife lesson), and the tie-corrected H is
    one float expression in identical operation order both sides,
    floor-quantized 1e-6. R^2 itself would overflow BIGINT at sf0.1+
    (r2 ~ 2N * avg-rank), hence the per-term double with integer
    quantization rather than integer squares."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    vg = o.groupBy("v", "grp").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cells = vg.groupBy("v").agg(F.sum("cnt").cast("long").alias("cnt"))
    ranked = prefix_sum(cells, [F.asc("v")], "cnt", name="c_incl").select(
        "v", (2 * F.col("c_incl") - F.col("cnt") + 1).alias("rank2")
    )
    per_grp = (
        vg.join(ranked, "v")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.col("cnt") * F.col("rank2")).cast("long").alias("r2"),
        )
    )
    rr_unit = F.floor(
        F.col("r2").cast("double") * F.col("r2") / F.col("n") * 0.001 + 0.5
    ).cast("long")
    tie = cells.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie")
    )
    tot = per_grp.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(rr_unit).cast("long").alias("rr_units"),
    ).crossJoin(F.broadcast(tie))
    n_tot, k = F.col("n_tot"), F.col("k")
    rr = F.col("rr_units").cast("double") * 1000
    h = 3.0 * rr / (n_tot.cast("double") * (n_tot + 1)) - 3.0 * (n_tot + 1)
    corr = 1 - F.col("tie").cast("double") / (
        n_tot.cast("double") * n_tot * n_tot - n_tot
    )
    return tot.select(
        k.alias("k_groups"),
        "n_tot",
        (F.floor(h / corr * 1e6 + 0.5) / 1e6).alias("h_q"),
    )


@_promoted(
    "cross_correlation_lag_events",
    """
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY 1, 2
    ),
    lags AS (SELECT CAST(r.range AS BIGINT) AS lag FROM range(8) r),
    joined AS (
      SELECT l.lag, x.cents AS xv, y.cents AS yv
      FROM lags l
      JOIN daily x ON x.event_type = 'view'
      JOIN daily y ON y.event_type = 'purchase'
       AND y.day = x.day + CAST(l.lag AS INT)
    ),
    stats AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(xv * yv) AS BIGINT) AS sxy,
             CAST(sum(xv * xv) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy
      FROM joined GROUP BY 1
    )
    SELECT lag, n,
           floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                 * 1e6 + 0.5) / 1e6 AS r_q
    FROM stats
    ORDER BY lag
    """,
)
def cross_correlation_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag CROSS-correlation between the daily view and purchase
    revenue series: Pearson r of (view_t, purchase_{t+lag}) for lags
    0..7 — "how many days does purchase volume trail view volume?",
    the bivariate companion to acf_daily_events' autocorrelation. The
    lag alignment is a date-shifted self-join (one hash join per
    plan, lags fanned out by an 8-row broadcast range); all Pearson
    sufficient statistics are exact BIGINTs of integer cents, the
    final r one identically-ordered float expression, floor-quantized
    1e-6."""
    e = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents"))
        .localCheckpoint()
    )
    lags = spark.range(0, 8).select(F.col("id").cast("long").alias("lag"))
    x = daily.filter(F.col("event_type") == "view").select(
        F.col("day").alias("xday"), F.col("cents").alias("xv")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("cents").alias("yv")
    )
    joined = x.crossJoin(F.broadcast(lags)).join(
        y, y["yday"] == F.date_add(x["xday"], F.col("lag").cast("int"))
    )
    stats = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).cast("long").alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).cast("long").alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return stats.select(
        "lag", "n", (F.floor(num / den * 1e6 + 0.5) / 1e6).alias("r_q")
    ).orderBy("lag")


@_promoted(
    "sharpe_daily_users",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS q
      FROM daily GROUP BY 1
    )
    SELECT user_id, n_days,
           floor((CAST(s AS DOUBLE) / n_days)
                 / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
                        / (n_days - 1))
                 * 1e6 + 0.5) / 1e6 AS sharpe_q
    FROM stats
    WHERE n_days >= 10
      AND CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days > 0
    ORDER BY sharpe_q DESC, user_id ASC
    LIMIT 20
    """,
)
def sharpe_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe-style consistency ratio per user: mean daily value over
    the sample standard deviation of daily values — the
    risk-adjusted ranking (high total + low volatility wins) that
    max_drawdown_users complements from the downside. Exact integer
    sufficient statistics per user; the ratio is one float
    expression in identical operation order, floor-quantized 1e-6;
    degenerate zero-variance users are excluded on the same exact
    predicate both sides. Top-20, ties broken by user id."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents"))
    stats = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    nd = F.col("n_days").cast("double")
    var_num = F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / nd
    sharpe = (F.col("s").cast("double") / nd) / F.sqrt(var_num / (nd - 1))
    return (
        stats.filter((F.col("n_days") >= 10) & (var_num > 0))
        .select(
            "user_id",
            "n_days",
            (F.floor(sharpe * 1e6 + 0.5) / 1e6).alias("sharpe_q"),
        )
        .orderBy(F.desc("sharpe_q"), F.asc("user_id"))
        .limit(20)
    )


@_promoted(
    "basket_triples_apriori",
    """
    WITH items AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
    ),
    cnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
    pairs AS MATERIALIZED (
      SELECT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    freq_pairs AS MATERIALIZED (
      SELECT pa, pb FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    triples AS (
      SELECT p.pa, p.pb, c.l_partkey AS pc, CAST(count(*) AS BIGINT) AS support
      FROM pairs p
      JOIN freq_pairs f ON f.pa = p.pa AND f.pb = p.pb
      JOIN items c ON c.l_orderkey = p.l_orderkey AND c.l_partkey > p.pb
      GROUP BY 1, 2, 3 HAVING count(*) >= 2
    )
    SELECT pa, pb, pc, support,
           round(CAST(support AS DOUBLE) * n.n * n.n
                 / (ca.c * cb.c * cc.c), 6) AS lift3
    FROM triples
    JOIN cnt ca ON ca.l_partkey = pa
    JOIN cnt cb ON cb.l_partkey = pb
    JOIN cnt cc ON cc.l_partkey = pc
    CROSS JOIN n_orders n
    ORDER BY lift3 DESC, pa ASC, pb ASC, pc ASC
    LIMIT 20
    """,
)
def basket_triples_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-itemset association mining with the APRIORI candidate prune
    (Agrawal & Srikant, VLDB'94): a triple can only be frequent if
    its prefix pair is, so candidate triples extend FREQUENT pairs
    only — the prune that separates this from the naive 3-way
    self-join and the property that holds at 100 TB (candidate
    volume tracks frequent-pair volume, not items^3). Per-order
    fan-out stays bounded by basket size (<= ~7 here); lift3 =
    P(abc) * N^2 / (P(a) P(b) P(c)) is exact integer rational
    arithmetic in double. Top-20 by lift, full key tie-break."""
    l = T(spark, sf_dir, "lineitem")
    items = l.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_orders = items.agg(F.countDistinct("l_orderkey").cast("long").alias("n"))
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey").filter(F.col("pa") < F.col("pb")).localCheckpoint()
    )
    freq_pairs = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("psup"))
        .filter(F.col("psup") >= 2)
        .select("pa", "pb")
    )
    c = items.select("l_orderkey", F.col("l_partkey").alias("pc"))
    triples = (
        pairs.join(freq_pairs, ["pa", "pb"])
        .join(c, "l_orderkey")
        .filter(F.col("pc") > F.col("pb"))
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    lift3 = (
        F.col("support").cast("double") * F.col("n") * F.col("n")
        / (F.col("ca") * F.col("cb") * F.col("cc"))
    )
    return (
        triples.join(cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca")), "pa")
        .join(cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb")), "pb")
        .join(cnt.select(F.col("l_partkey").alias("pc"), F.col("c").alias("cc")), "pc")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa", "pb", "pc", "support", F.round(lift3, 6).alias("lift3")
        )
        .orderBy(F.desc("lift3"), F.asc("pa"), F.asc("pb"), F.asc("pc"))
        .limit(20)
    )


@_promoted(
    "croston_demand_parts",
    """
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(round(l_quantity * 100)) AS BIGINT) AS qty_cents
      FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_demand_days,
             CAST(sum(qty_cents) AS BIGINT) AS size_sum,
             CAST(datediff('day', min(day), max(day)) AS BIGINT) AS span_days
      FROM daily GROUP BY 1
    )
    SELECT l_partkey, n_demand_days,
           floor((CAST(size_sum AS DOUBLE) / n_demand_days)
                 / (CAST(span_days AS DOUBLE) / (n_demand_days - 1))
                 * 1e6 + 0.5) / 1e6 AS demand_rate_q
    FROM stats
    WHERE n_demand_days >= 5 AND span_days > 0
    ORDER BY demand_rate_q DESC, l_partkey ASC
    LIMIT 20
    """,
)
def croston_demand_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston-style intermittent-demand rate per part (the
    slow-mover forecasting method): average nonzero demand size over
    average inter-demand interval — the quantity-weighted complement
    of seasonal_naive_backtest's dense-series forecasting. The
    interval mean uses the exact span/(n-1) identity (no lag window,
    no per-part sort); both factors come from integer sufficient
    statistics, the rate is one identically-ordered float expression
    floor-quantized 1e-6. Top-20 fastest movers."""
    l = T(spark, sf_dir, "lineitem")
    daily = l.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("day")
    ).agg(F.sum(F.round(F.col("l_quantity") * 100)).cast("long").alias("qty_cents"))
    stats = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand_days"),
        F.sum("qty_cents").cast("long").alias("size_sum"),
        F.datediff(F.max("day"), F.min("day")).cast("long").alias("span_days"),
    )
    rate = (F.col("size_sum").cast("double") / F.col("n_demand_days")) / (
        F.col("span_days").cast("double") / (F.col("n_demand_days") - 1)
    )
    return (
        stats.filter((F.col("n_demand_days") >= 5) & (F.col("span_days") > 0))
        .select(
            "l_partkey",
            "n_demand_days",
            (F.floor(rate * 1e6 + 0.5) / 1e6).alias("demand_rate_q"),
        )
        .orderBy(F.desc("demand_rate_q"), F.asc("l_partkey"))
        .limit(20)
    )


@_promoted(
    "ltv_cohort_triangle_orders",
    """
    WITH mo AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS idx,
             year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    cohorts AS (
      SELECT o_custkey, min(idx) AS cohort_idx, min(ym) AS cohort_ym
      FROM mo GROUP BY 1
    ),
    cells AS (
      SELECT c.cohort_ym AS cohort, CAST(m.idx - c.cohort_idx AS BIGINT) AS age,
             CAST(sum(m.cents) AS BIGINT) AS cents
      FROM mo m JOIN cohorts c ON c.o_custkey = m.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort, age, cents,
           CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age) AS BIGINT)
             AS cum_cents
    FROM cells
    ORDER BY cohort, age
    """,
)
def ltv_cohort_triangle_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle (the chain-ladder layout growth teams run):
    customers bucketed by FIRST-order month, revenue accumulated by
    cohort age in months — cohort_retention_events' revenue-weighted
    sibling. Age is pure integer month arithmetic (year*12+month
    index differences — no date intervals, no timezone edges); the
    cumulative ride is a per-cohort window (bounded partitions =
    months in the dataset, never a one-task funnel). Exact integer
    cents end-to-end."""
    o = T(spark, sf_dir, "orders")
    mo = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("idx"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cohorts = mo.groupBy("o_custkey").agg(
        F.min("idx").alias("cohort_idx"), F.min("ym").alias("cohort_ym")
    )
    cells = (
        mo.join(cohorts, "o_custkey")
        .groupBy(
            F.col("cohort_ym").alias("cohort"),
            (F.col("idx") - F.col("cohort_idx")).cast("long").alias("age"),
        )
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = Window.partitionBy("cohort").orderBy("age")
    return cells.select(
        "cohort", "age", "cents", F.sum("cents").over(w).cast("long").alias("cum_cents")
    ).orderBy("cohort", "age")


@_promoted(
    "abc_xyz_parts",
    """
    WITH rev AS (
      SELECT l_partkey, CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
    abc AS (
      SELECT l_partkey, cents,
             CASE
               WHEN sum(cents) OVER (ORDER BY cents DESC, l_partkey) * 100
                    <= 80 * t.total THEN 'A'
               WHEN sum(cents) OVER (ORDER BY cents DESC, l_partkey) * 100
                    <= 95 * t.total THEN 'B'
               ELSE 'C'
             END AS abc_class
      FROM rev CROSS JOIN tot t
    ),
    monthly AS (
      SELECT l_partkey,
             year(l_shipdate) * 12 + month(l_shipdate) AS m,
             CAST(sum(round(l_quantity * 100)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT l_partkey,
             CASE
               WHEN count(*) < 2 THEN 'Z'
               WHEN 4 * (count(*) * sum(q * q) - sum(q) * sum(q))
                    <= sum(q) * sum(q) THEN 'X'
               WHEN count(*) * sum(q * q) - sum(q) * sum(q)
                    <= sum(q) * sum(q) THEN 'Y'
               ELSE 'Z'
             END AS xyz_class
      FROM monthly GROUP BY 1
    )
    SELECT a.abc_class, x.xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(a.cents) AS BIGINT) AS cents_total
    FROM abc a JOIN xyz x ON x.l_partkey = a.l_partkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def abc_xyz_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory segmentation (the planner's 3x3 grid):
    ABC = cumulative revenue-share class (A <= 80%, B <= 95%, C rest,
    inclusive-cumulative on (revenue DESC, partkey) — the comparison
    is pure integer cross-multiplication, cum*100 <= 80*total, no
    percentage floats anywhere); XYZ = demand-variability class from
    the squared coefficient of variation of monthly quantities,
    classified by EXACT integer cross-multiplication of
    n*sum(q^2) - S^2 vs S^2 (X: cv^2 <= 0.25, Y: <= 1, Z: rest or
    <2 months of history). Engine cumulative rides the scalable
    prefix_sum (no one-task window); the oracle uses a plain
    windowed sum — two plans, identical integers."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    l = T(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100)).cast("long").alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    cum = prefix_sum(
        rev, [F.desc("cents"), F.asc("l_partkey")], "cents", name="cum"
    ).crossJoin(F.broadcast(tot))
    abc = cum.select(
        "l_partkey",
        "cents",
        F.when(F.col("cum") * 100 <= 80 * F.col("total"), "A")
        .when(F.col("cum") * 100 <= 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = l.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
    ).agg(F.sum(F.round(F.col("l_quantity") * 100)).cast("long").alias("q"))
    n, sq, s2 = F.count(F.lit(1)), F.sum(F.col("q") * F.col("q")), F.sum("q")
    xyz = monthly.groupBy("l_partkey").agg(
        F.when(n < 2, "Z")
        .when(4 * (n * sq - s2 * s2) <= s2 * s2, "X")
        .when(n * sq - s2 * s2 <= s2 * s2, "Y")
        .otherwise("Z")
        .alias("xyz_class")
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("cents_total"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@_promoted(
    "runs_test_daily_events",
    """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
      FROM daily
    ),
    signs AS MATERIALIZED (
      SELECT day, (cents * t.n > t.s) AS hi FROM daily CROSS JOIN tot t
    ),
    flips AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN a.hi <> b.hi THEN 1 ELSE 0 END) AS BIGINT) AS changes
      FROM signs a JOIN signs b ON b.day = a.day + 1
    ),
    counts AS (
      SELECT CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS n2
      FROM signs
    )
    SELECT (f.changes + 1) AS runs, c.n1, c.n2,
           floor((CAST(f.changes + 1 AS DOUBLE)
                  - (2.0 * c.n1 * c.n2 / (c.n1 + c.n2) + 1))
                 / sqrt(2.0 * c.n1 * c.n2 * (2.0 * c.n1 * c.n2 - c.n1 - c.n2)
                        / (CAST(c.n1 + c.n2 AS DOUBLE) * (c.n1 + c.n2)
                           * (c.n1 + c.n2 - 1)))
                 * 1e6 + 0.5) / 1e6 AS z_q
    FROM flips f CROSS JOIN counts c
    """,
)
def runs_test_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily revenue
    series (above/below-MEAN variant): is the sequence of
    above-mean / below-mean days random, or does it trend/oscillate?
    The side predicate is an EXACT integer cross-multiplication
    (cents*n > total — no float mean), consecutive days pair through
    a day+1 self-join (no global-order window funnel, no one-task
    sort), and the normal-approximation z is one float expression in
    identical operation order, floor-quantized 1e-6. Complements
    durbin_watson_daily (autocorrelation) with a distribution-free
    randomness check."""
    e = T(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents"))
        .localCheckpoint()
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    signs = daily.crossJoin(F.broadcast(tot)).select(
        "day", (F.col("cents") * F.col("n") > F.col("s")).alias("hi")
    ).localCheckpoint()
    a = signs.select(F.col("day").alias("d1"), F.col("hi").alias("h1"))
    b = signs.select(F.col("day").alias("d2"), F.col("hi").alias("h2"))
    flips = a.join(b, b["d2"] == F.date_add(a["d1"], 1)).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("h1") != F.col("h2")).cast("long")).cast("long").alias("changes"),
    )
    counts = signs.agg(
        F.sum(F.col("hi").cast("long")).cast("long").alias("n1"),
        F.sum((~F.col("hi")).cast("long")).cast("long").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    runs = (F.col("changes") + 1).cast("long")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    z = (runs.cast("double") - mu) / F.sqrt(var)
    return flips.crossJoin(F.broadcast(counts)).select(
        runs.alias("runs"), "n1", "n2",
        (F.floor(z * 1e6 + 0.5) / 1e6).alias("z_q"),
    )


@_promoted(
    "theil_index_customers",
    """
    WITH spend AS (
      SELECT o_custkey, CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS s
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS total
      FROM spend
    ),
    terms AS (
      SELECT CAST(floor((CAST(s AS DOUBLE) / t.total)
                        * ln(CAST(s AS DOUBLE) * t.n / t.total)
                        * 1e12 + 0.5) AS BIGINT) AS u
      FROM spend CROSS JOIN tot t
    )
    SELECT t.n AS n_customers,
           floor(CAST(sum(u) AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS theil_q
    FROM terms CROSS JOIN tot t
    GROUP BY t.n
    """,
)
def theil_index_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend — the
    entropy-based inequality measure next to gini_customer_revenue
    (Gini weights transfers near the middle; Theil decomposes across
    subgroups): T = sum (s_i/S) * ln(s_i*n/S). Each customer's term
    is quantized to 1e-12 integer units BEFORE the cross-customer
    sum (the jackknife lesson — a 15k-term double sum is
    summation-order-dependent), so both engines sum identical
    BIGINTs; the index is floor-quantized 1e-6."""
    o = T(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("s")
    )
    tot = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("total"),
    )
    u = F.floor(
        (F.col("s").cast("double") / F.col("total"))
        * F.log(F.col("s").cast("double") * F.col("n") / F.col("total"))
        * 1e12
        + 0.5
    ).cast("long")
    return (
        spend.crossJoin(F.broadcast(tot))
        .select(u.alias("u"), "n")
        .groupBy("n")
        .agg(
            (F.floor(F.sum("u").cast("double") / 1e12 * 1e6 + 0.5) / 1e6).alias(
                "theil_q"
            )
        )
        .select(F.col("n").alias("n_customers"), "theil_q")
    )


@_promoted(
    "term_burstiness_docs",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    per_doc AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    n_docs AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS tot, CAST(sum(c * c) AS BIGINT) AS sq
      FROM per_doc GROUP BY 1
    )
    SELECT term, df,
           floor((CAST(n.nd AS DOUBLE) * s.sq - CAST(s.tot AS DOUBLE) * s.tot)
                 / (CAST(n.nd AS DOUBLE) * s.tot) * 1e6 + 0.5) / 1e6 AS vmr_q
    FROM stats s CROSS JOIN n_docs n
    ORDER BY df DESC, term ASC
    LIMIT 20
    """,
)
def term_burstiness_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale): variance-to-mean ratio of
    per-document term counts over the WHOLE corpus (absent docs
    count 0 — they add nothing to either sum, so the corpus-wide VMR
    is (N*sum(c^2) - T^2)/(N*T), pure integer sufficient statistics).
    VMR ~ 1 means Poisson scatter; >> 1 means the term clumps into
    few documents — content words burst, function words don't. The
    top-20-by-df view complements zipf_slope_tokens (frequency decay)
    and dispersion_index_events (temporal clumping) with the
    lexical-clumping axis."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    vmr = (
        F.col("nd").cast("double") * F.col("sq")
        - F.col("tot").cast("double") * F.col("tot")
    ) / (F.col("nd").cast("double") * F.col("tot"))
    return (
        stats.crossJoin(F.broadcast(nd))
        .select("term", "df", (F.floor(vmr * 1e6 + 0.5) / 1e6).alias("vmr_q"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


@_promoted(
    "mcnemar_view_purchase",
    """
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    )
    SELECT CAST(sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(sum(CASE WHEN v = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           floor(CASE WHEN sum(CASE WHEN v + p = 1 THEN 1 ELSE 0 END) = 0 THEN 0.0
                 ELSE CAST((sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END)
                            - sum(CASE WHEN v = 0 AND p = 1 THEN 1 ELSE 0 END))
                           * (sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END)
                              - sum(CASE WHEN v = 0 AND p = 1 THEN 1 ELSE 0 END))
                           AS DOUBLE)
                      / sum(CASE WHEN v + p = 1 THEN 1 ELSE 0 END) END
                 * 1e6 + 0.5) / 1e6 AS chi2_q
    FROM flags
    """,
)
def mcnemar_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired per-user binary outcomes ("did the
    user ever view" vs "did the user ever purchase"): only the
    DISCORDANT users carry signal — b (view without purchase) vs c
    (purchase without view), chi2 = (b-c)^2/(b+c). The paired-data
    companion to abtest_conversion_ztest's independent-samples z.
    Everything is integer counts; the statistic is one guarded float
    division, floor-quantized 1e-6."""
    e = T(spark, sf_dir, "events")
    flags = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    b = F.sum(((F.col("v") == 1) & (F.col("p") == 0)).cast("long")).cast("long")
    c = F.sum(((F.col("v") == 0) & (F.col("p") == 1)).cast("long")).cast("long")
    disc = F.sum((F.col("v") + F.col("p") == 1).cast("long")).cast("long")
    chi2 = F.when(disc == 0, F.lit(0.0)).otherwise(
        ((b - c) * (b - c)).cast("double") / disc
    )
    return flags.agg(
        b.alias("b"), c.alias("c"),
        (F.floor(chi2 * 1e6 + 0.5) / 1e6).alias("chi2_q"),
    )


@_promoted(
    "video_rle8_delta_features",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS w,
             CAST(2 + doc_id % 3 AS BIGINT) AS h
      FROM documents
    ),
    sums AS (
      SELECT doc_id, w, h,
             CAST(list_sum(list_transform(range(0, h * w),
                  p -> (doc_id * 7 + p) % 251)) AS BIGINT) AS s0,
             (doc_id * 7 + ((doc_id + 1) % (h * w))) % 251 AS oldv,
             (doc_id * 11 + 17) % 251 AS newv
      FROM base
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(3 AS BIGINT) AS n_frames,
           CAST(40000 AS BIGINT) AS us_per_frame,
           CAST(3 * (s0 + 2 * (s0 - oldv + newv)) AS BIGINT) AS pixel_sum,
           CAST(3 * s0 AS BIGINT) AS first_frame_sum
    FROM sums
    """,
)
def video_rle8_delta_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-FRAME video decode (closes VERDICT r5's last "missing"
    item): per doc, a 3-frame BI_RLE8 AVI — a KEYFRAME (grayscale
    index p -> (doc_id*7+p) mod 251), a DELTA frame that rewrites ONE
    pixel (position (doc_id+1) mod h*w -> (doc_id*11+17) mod 251; the
    encoder emits DELTA skip escapes for the unchanged spans, so
    decoding genuinely depends on the previous frame's state), and a
    REPEAT frame (the empty chunk) — encoded to real RIFF/AVI bytes
    (llmops/multimodal.py::encode_avi codec='RLE8', MRLE handler,
    biCompression=1, 256-entry RGBQUAD palette in strf) and decoded
    back by the pure-numpy RLE8 state machine inside mapInPandas.
    The oracle computes every feature in closed form from doc_id:
    pixel_sum = 3*(s0 + 2*s1) spans all three frames, so a decoder
    that drops delta state or misses the repeat marker cannot match.
    Motion-compensated codecs (h264/vp9) remain an honest
    NotImplementedError — THEY need codec libraries; RLE8's public
    byte layout doesn't."""
    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_avi,
        extract_video_features,
    )

    def make_payloads(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = 4 + doc_id % 5, 2 + doc_id % 3
                f0 = ((doc_id * 7 + np.arange(h * w, dtype=np.int64)) % 251
                      ).astype(np.uint8).reshape(h, w)
                f1 = f0.copy()
                q = (doc_id + 1) % (h * w)
                f1[q // w, q % w] = (doc_id * 11 + 17) % 251
                fr = np.stack([f0, f1, f1.copy()])
                rgb = np.stack([fr, fr, fr], axis=-1)
                payloads.append(encode_avi(rgb, us_per_frame=40000, codec="RLE8"))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    d = T(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(make_payloads, "doc_id long, payload binary")
    return extract_video_features(payloads)


@_promoted(
    "growth_accounting_weekly",
    """
    WITH act AS MATERIALIZED (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    firstw AS (SELECT user_id, min(wk) AS fw FROM act GROUP BY 1),
    weeks AS (SELECT DISTINCT wk FROM act),
    cur AS (
      SELECT a.wk, a.user_id, f.fw,
             EXISTS (SELECT 1 FROM act p
                     WHERE p.user_id = a.user_id
                       AND p.wk = a.wk - INTERVAL 7 DAY) AS was_prev
      FROM act a JOIN firstw f ON f.user_id = a.user_id
    ),
    churn AS (
      SELECT CAST(p.wk + INTERVAL 7 DAY AS DATE) AS wk,
             CAST(count(*) AS BIGINT) AS churned
      FROM act p
      JOIN weeks w ON w.wk = p.wk + INTERVAL 7 DAY
      WHERE NOT EXISTS (SELECT 1 FROM act c
                        WHERE c.user_id = p.user_id
                          AND c.wk = p.wk + INTERVAL 7 DAY)
      GROUP BY 1
    )
    SELECT c.wk,
           CAST(sum(CASE WHEN c.fw = c.wk THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN c.was_prev THEN 1 ELSE 0 END) AS BIGINT) AS retained,
           CAST(sum(CASE WHEN NOT c.was_prev AND c.fw < c.wk THEN 1 ELSE 0 END)
                AS BIGINT) AS resurrected,
           CAST(coalesce(any_value(ch.churned), 0) AS BIGINT) AS churned
    FROM cur c LEFT JOIN churn ch ON ch.wk = c.wk
    GROUP BY c.wk
    ORDER BY c.wk
    """,
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the new / retained / resurrected /
    churned ledger every growth team keeps — Social Capital's
    framing): each active (user, week) is classified by first-seen
    week and prior-week activity; churned counts last week's actives
    who went silent. cohort_retention_events answers "how do cohorts
    decay"; this answers "where did this week's actives come from".
    Week buckets are date_trunc('week') CAST TO DATE on both engines
    (Spark returns TIMESTAMP, DuckDB DATE — the cast is the parity
    fix); everything else is exact integer counts over hash joins on
    (user, week) — no windows, no floats."""
    e = T(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct().localCheckpoint()
    firstw = act.groupBy("user_id").agg(F.min("wk").alias("fw"))
    prev = act.select("user_id", F.date_add("wk", 7).alias("wk"))
    cur = (
        act.join(firstw, "user_id")
        .join(prev.withColumn("was_prev", F.lit(True)).distinct(),
              ["user_id", "wk"], "left")
        .fillna(False, ["was_prev"])
    )
    weeks = act.select("wk").distinct()
    gone = (
        prev.join(weeks, "wk")  # only weeks that exist in the data
        .join(act, ["user_id", "wk"], "left_anti")
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    core = cur.groupBy("wk").agg(
        F.sum((F.col("fw") == F.col("wk")).cast("long")).cast("long").alias("new_users"),
        F.sum(F.col("was_prev").cast("long")).cast("long").alias("retained"),
        F.sum((~F.col("was_prev") & (F.col("fw") < F.col("wk"))).cast("long"))
        .cast("long")
        .alias("resurrected"),
    )
    return (
        core.join(gone, "wk", "left")
        .fillna(0, ["churned"])
        .select("wk", "new_users", "retained", "resurrected",
                F.col("churned").cast("long").alias("churned"))
        .orderBy("wk")
    )


@_promoted(
    "stickiness_dau_mau",
    """
    WITH days AS (
      SELECT year(ts) * 100 + month(ts) AS ym, CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1, 2
    ),
    mau AS (
      SELECT year(ts) * 100 + month(ts) AS ym,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT ym, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dau) AS BIGINT) AS dau_sum
      FROM days GROUP BY 1
    )
    SELECT CAST(a.ym AS BIGINT) AS ym, a.n_days, m.mau,
           floor(CAST(a.dau_sum AS DOUBLE) * 1e6 / (a.n_days * m.mau) + 0.5) / 1e6
             AS stickiness_q
    FROM agg a JOIN mau m ON m.ym = a.ym
    ORDER BY ym
    """,
)
def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month (the engagement ratio: what share
    of the monthly audience shows up on an average day). Two
    count-distinct aggregates (daily and monthly actives) and one
    guarded ratio — dau_sum, n_days, and mau are exact BIGINTs, the
    ratio is floor-quantized 1e-6. Complements
    growth_accounting_weekly (composition) with intensity."""
    e = T(spark, sf_dir, "events")
    ym = (F.year("ts") * 100 + F.month("ts")).alias("ym")
    days = e.groupBy(ym, F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = e.groupBy(ym).agg(F.countDistinct("user_id").cast("long").alias("mau"))
    agg = days.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("dau_sum"),
    )
    stick = F.col("dau_sum").cast("double") * 1e6 / (F.col("n_days") * F.col("mau"))
    return (
        agg.join(mau, "ym")
        .select(
            F.col("ym").cast("long").alias("ym"), "n_days", "mau",
            (F.floor(stick + 0.5) / 1e6).alias("stickiness_q"),
        )
        .orderBy("ym")
    )


@_promoted(
    "simpsons_paradox_check",
    """
    WITH x AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_quantity * 100) AS BIGINT) AS xv,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yv
      FROM lineitem
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(xv * yv) AS BIGINT) AS sxy, CAST(sum(xv * xv) AS BIGINT) AS sxx
      FROM x GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
             CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
             CAST(sum(sxx) AS BIGINT) AS sxx,
             CAST(sum(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                            * 1e-3 + 0.5)) AS BIGINT) AS wnum_units,
             CAST(sum(floor((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                            * 1e-3 + 0.5)) AS BIGINT) AS wden_units
      FROM g
    )
    SELECT n AS n_rows,
           floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * 1e6 + 0.5) / 1e6 AS overall_slope_q,
           floor(CAST(wnum_units AS DOUBLE) / wden_units * 1e6 + 0.5) / 1e6
             AS pooled_within_slope_q,
           (((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) > 0)
            <> (wnum_units > 0)) AS sign_flip
    FROM tot
    """,
)
def simpsons_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector on price ~ quantity: the OVERALL
    OLS slope vs the POOLED WITHIN-GROUP slope (groups =
    l_returnflag; pooled = summed within-group covariance over summed
    within-group variance — the stratified estimate that removes
    between-group confounding), plus the sign-flip flag that IS the
    paradox. Sufficient statistics are exact BIGINTs; each group's
    covariance/variance numerators are quantized to 1e-3 units
    BEFORE the cross-group sums (jackknife lesson), so both engines
    sum identical integers; the two slopes are identical-order float
    expressions, floor-quantized 1e-6."""
    l = T(spark, sf_dir, "lineitem")
    x = l.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("xv"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yv"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).cast("long").alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).cast("long").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    wnum = F.floor((n.cast("double") * sxy - sx.cast("double") * sy) * 1e-3 + 0.5)
    wden = F.floor((n.cast("double") * sxx - sx.cast("double") * sx) * 1e-3 + 0.5)
    tot = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("sxy").cast("long").alias("sxy"),
        F.sum("sxx").cast("long").alias("sxx"),
        F.sum(wnum).cast("long").alias("wnum_units"),
        F.sum(wden).cast("long").alias("wden_units"),
    )
    onum = n.cast("double") * sxy - sx.cast("double") * sy
    oden = n.cast("double") * sxx - sx.cast("double") * sx
    return tot.select(
        n.alias("n_rows"),
        (F.floor(onum / oden * 1e6 + 0.5) / 1e6).alias("overall_slope_q"),
        (F.floor(F.col("wnum_units").cast("double") / F.col("wden_units") * 1e6 + 0.5)
         / 1e6).alias("pooled_within_slope_q"),
        ((onum > 0) != (F.col("wnum_units") > 0)).alias("sign_flip"),
    )


@_promoted(
    "path_entropy_users",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    bg AS (
      SELECT user_id, event_type AS a, nxt AS b, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
    ),
    per_user AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS t,
             CAST(sum(CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
                  AS BIGINT) AS clogc_units
      FROM bg GROUP BY 1
    )
    SELECT user_id, t AS n_transitions,
           floor((ln(CAST(t AS DOUBLE))
                  - CAST(clogc_units AS DOUBLE) / 1e9 / t) * 1e6 + 0.5) / 1e6
             AS entropy_q
    FROM per_user
    WHERE t >= 20
    ORDER BY entropy_q DESC, user_id ASC
    LIMIT 20
    """,
)
def path_entropy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path entropy per user: Shannon entropy of the
    user's event-type TRANSITION distribution (H = ln T - (1/T)
    sum c*ln c), the predictability ranking — low entropy = habitual
    loops, high = erratic exploration; the per-user complement of
    markov_perplexity_events' corpus-level model. Transitions come
    from a lead() window partitioned BY USER (bounded partitions,
    deterministic (ts, event_id) order); each bigram's c*ln(c) is
    quantized to 1e-9 integer units BEFORE the per-user sum, so the
    only floats are two identically-ordered expressions,
    floor-quantized 1e-6. Top-20 most erratic users with >= 20
    transitions."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    bg = seq.groupBy("user_id", "event_type", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    clogc = F.floor(
        F.col("c") * F.log(F.col("c").cast("double")) * 1e9 + 0.5
    ).cast("long")
    per_user = bg.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("t"),
        F.sum(clogc).cast("long").alias("clogc_units"),
    )
    ent = F.log(F.col("t").cast("double")) - F.col("clogc_units").cast(
        "double"
    ) / 1e9 / F.col("t")
    return (
        per_user.filter(F.col("t") >= 20)
        .select(
            "user_id",
            F.col("t").alias("n_transitions"),
            (F.floor(ent * 1e6 + 0.5) / 1e6).alias("entropy_q"),
        )
        .orderBy(F.desc("entropy_q"), F.asc("user_id"))
        .limit(20)
    )


@_promoted(
    "rake_keywords_docs",
    """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) + 1),
                      i -> {'pos': i, 'tok': t[i]})) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      )
    ),
    stops AS MATERIALIZED (
      SELECT tok FROM (
        SELECT tok, count(*) AS c FROM toks GROUP BY 1
        ORDER BY c DESC, tok ASC LIMIT 5
      )
    ),
    marked AS (
      SELECT t.doc_id, t.pos, t.tok,
             (s.tok IS NOT NULL) AS is_stop,
             sum(CASE WHEN s.tok IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS phrase_id
      FROM toks t LEFT JOIN stops s ON s.tok = t.tok
    ),
    members AS MATERIALIZED (
      SELECT doc_id, phrase_id, pos, tok FROM marked WHERE NOT is_stop
    ),
    plen AS MATERIALIZED (
      SELECT doc_id, phrase_id, CAST(count(*) AS BIGINT) AS plen
      FROM members GROUP BY 1, 2
    ),
    wordstats AS (
      SELECT m.tok, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(p.plen) AS BIGINT) AS degree
      FROM members m
      JOIN plen p ON p.doc_id = m.doc_id AND p.phrase_id = m.phrase_id
      GROUP BY 1
    ),
    phrases AS (
      SELECT m.doc_id, m.phrase_id,
             string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
             CAST(sum(w.degree * 1000000 // w.freq) AS BIGINT) AS score_units
      FROM members m JOIN wordstats w ON w.tok = m.tok
      GROUP BY 1, 2
    )
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score_units) AS BIGINT) AS score_units
    FROM phrases
    GROUP BY 1
    ORDER BY score_units DESC, phrase ASC
    LIMIT 15
    """,
)
def rake_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal token runs BETWEEN stopwords, each scored by the sum
    of its member words' degree/frequency ratios (degree = total
    length of phrases the word appears in — co-occurrence including
    self). Stopwords are DATA-DRIVEN here: the corpus's top-5 tokens
    by frequency (the practical move when no language list fits the
    domain). Phrase segmentation is an inclusive running count of
    stop tokens per doc (a per-doc window, bounded partitions);
    word scores are exact integer micro-units (degree*1e6 // freq —
    integer division both engines, no floats anywhere); identical
    phrase strings provably carry identical scores, so the
    distinct-phrase rollup takes max(score) = the score. Top-15
    phrases."""
    e = T(spark, sf_dir, "documents")
    toks = e.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok").localCheckpoint()
    stops = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(5)
        .select("tok", F.lit(True).alias("is_stop"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = (
        toks.join(F.broadcast(stops), "tok", "left")
        .fillna(False, ["is_stop"])
        .withColumn("phrase_id", F.sum(F.col("is_stop").cast("int")).over(w))
    )
    members = marked.filter(~F.col("is_stop")).select(
        "doc_id", "phrase_id", "pos", "tok"
    ).localCheckpoint()
    plen = members.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("plen")
    )
    wordstats = (
        members.join(plen, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
    )
    score_units = F.expr("degree * 1000000 div freq")
    phrases = (
        members.join(F.broadcast(wordstats), "tok")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("phrase"),
            F.sum(score_units).cast("long").alias("score_units"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_units").cast("long").alias("score_units"),
        )
        .orderBy(F.desc("score_units"), F.asc("phrase"))
        .limit(15)
    )


@_promoted(
    "wow_movers_event_types",
    """
    WITH weekly AS MATERIALIZED (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, event_type,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT wk, CAST(sum(cents) AS BIGINT) AS wtot FROM weekly GROUP BY 1
    ),
    shares AS MATERIALIZED (
      SELECT w.wk, w.event_type,
             CAST(w.cents * 1000000 // t.wtot AS BIGINT) AS share_ppm
      FROM weekly w JOIN tot t ON t.wk = w.wk
    )
    SELECT c.wk, c.event_type, c.share_ppm,
           (c.share_ppm - p.share_ppm) AS dshare_ppm
    FROM shares c
    JOIN shares p ON p.event_type = c.event_type
                 AND p.wk = c.wk - INTERVAL 7 DAY
    ORDER BY abs(c.share_ppm - p.share_ppm) DESC, c.wk ASC, c.event_type ASC
    LIMIT 15
    """,
)
def wow_movers_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week share movers: each event type's share of weekly
    revenue in integer parts-per-million (cents*1e6 // week total —
    integer division both engines), deltas vs the prior week ranked
    by absolute move — the "what changed this week" triage view on
    top of mix_shift_decomposition's why. Everything is BIGINT
    arithmetic; the prior week is a calendar self-join (wk - 7 days),
    no window funnel. Top-15 moves, deterministic tie-break."""
    e = T(spark, sf_dir, "events")
    weekly = e.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"), "event_type"
    ).agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents")).localCheckpoint()
    tot = weekly.groupBy("wk").agg(F.sum("cents").cast("long").alias("wtot"))
    shares = weekly.join(tot, "wk").select(
        "wk", "event_type", F.expr("cents * 1000000 div wtot").cast("long").alias("share_ppm")
    ).localCheckpoint()
    prev = shares.select(
        F.date_add("wk", 7).alias("wk"),
        F.col("event_type"),
        F.col("share_ppm").alias("prev_ppm"),
    )
    return (
        shares.join(prev, ["wk", "event_type"])
        .select(
            "wk", "event_type", "share_ppm",
            (F.col("share_ppm") - F.col("prev_ppm")).alias("dshare_ppm"),
        )
        .orderBy(F.abs(F.col("dshare_ppm")).desc(), F.asc("wk"), F.asc("event_type"))
        .limit(15)
    )


@_promoted(
    "acid_shallow_clone_events",
    """
    WITH base AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    src AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM base GROUP BY 1
    ),
    cloned AS (
      SELECT event_type,
             CASE WHEN event_type = 'error' THEN cents * 3 ELSE cents END AS cents
      FROM base
    ),
    cl AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM cloned GROUP BY 1
    )
    SELECT 'source' AS side, event_type, n, cents FROM src
    UNION ALL
    SELECT 'clone', event_type, n, cents FROM cl
    ORDER BY side, event_type
    """,
)
def acid_shallow_clone_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy SHALLOW CLONE under the driver gate
    (sources/acid.py::clone — Delta SHALLOW CLONE semantics): load
    events into an ACID table, clone it (one metadata write — the
    clone's v0 references the source's data files by absolute path),
    then REPLACE the clone's 'error' slice with tripled cents. The
    returned frame reads BOTH tables: the clone must show the
    divergence (copy-on-write into its own data dir) while the
    source, whose files the clone still shares, must read back
    byte-identical — the isolation property that makes the clone a
    dev/test sandbox primitive. The oracle replays both sides
    relationally."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    base = T(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    root = tempfile.mkdtemp(prefix=f"clone_{uuid.uuid4().hex[:8]}_")
    src = AcidTable(spark, root + "/src")
    src.write(base)
    cl = src.clone(root + "/cl")
    assert cl.latest_version() == 0, "clone starts at its own v0"
    reprocessed = base.filter(F.col("event_type") == "error").select(
        "event_type", (F.col("cents") * 3).alias("cents")
    )
    cl.replace_where(reprocessed, "event_type = 'error'")
    agg = lambda t, side: (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(F.lit(side).alias("side"), "event_type", "n", "cents")
    )
    return agg(src, "source").unionByName(agg(cl, "clone")).orderBy(
        "side", "event_type"
    )


@_promoted(
    "zorder_cells_events",
    """
    WITH pts AS (
      SELECT user_id % 64 AS u, CAST(datediff('day', DATE '2024-01-01',
             CAST(ts AS DATE)) AS BIGINT) % 64 AS d,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    keyed AS (
      SELECT (((u >> 0) & 1) << 0)
           | (((d >> 0) & 1) << 1)
           | (((u >> 1) & 1) << 2)
           | (((d >> 1) & 1) << 3)
           | (((u >> 2) & 1) << 4)
           | (((d >> 2) & 1) << 5)
           | (((u >> 3) & 1) << 6)
           | (((d >> 3) & 1) << 7)
           | (((u >> 4) & 1) << 8)
           | (((d >> 4) & 1) << 9)
           | (((u >> 5) & 1) << 10)
           | (((d >> 5) & 1) << 11) AS z,
             cents
      FROM pts
    )
    SELECT CAST(z >> 6 AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max
    FROM keyed GROUP BY 1
    ORDER BY cell
    """,
)
def zorder_cells_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key quad-tree cells over (user bucket, day index): the
    value-oracle for operators/relational.py::zorder_key — DuckDB
    re-derives the interleaved key with raw shift/and/or bit
    arithmetic (each lane fully parenthesized — DuckDB's bitwise
    operators are same-precedence left-associative, so a bare
    `a << 0 | b << 1` chain left-folds into garbage) and both
    engines must agree on every cell's count,
    cents, and z-range. The top-6-bit cell id is the quad-tree level
    the z-order write layout clusters by (scale probe #24 measures
    the pruning this buys: a trailing-dimension slice keeps 14/128
    row groups instead of 128/128)."""
    from dbt_lakehouse_aws_spark.operators.relational import zorder_key

    e = T(spark, sf_dir, "events")
    pts = e.select(
        (F.col("user_id") % 64).alias("u"),
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 64)
        .cast("long")
        .alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    keyed = pts.select(zorder_key("u", "d", bits=6).alias("z"), "cents")
    return (
        keyed.groupBy(F.shiftright("z", 6).cast("long").alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
            F.min("z").cast("long").alias("z_min"),
            F.max("z").cast("long").alias("z_max"),
        )
        .orderBy("cell")
    )


@_promoted(
    "cochran_q_events",
    """
    WITH flags AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS t1,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t2,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t3
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t1) AS BIGINT) AS g1, CAST(sum(t2) AS BIGINT) AS g2,
             CAST(sum(t3) AS BIGINT) AS g3,
             CAST(sum(t1 + t2 + t3) AS BIGINT) AS l_sum,
             CAST(sum((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS l_sq
      FROM flags
    )
    SELECT n, g1, g2, g3,
           CASE WHEN 3 * l_sum - l_sq = 0 THEN 0.0
           ELSE floor(CAST(3 * 2 AS DOUBLE)
                 * (3 * (CAST(g1 AS DOUBLE) * g1 + CAST(g2 AS DOUBLE) * g2
                         + CAST(g3 AS DOUBLE) * g3)
                    - CAST(l_sum AS DOUBLE) * l_sum)
                 / (3 * l_sum - l_sq)
                 * 1e6 + 0.5) / 1e6 END AS q_stat
    FROM s
    """,
)
def cochran_q_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q on three paired binary outcomes per USER-DAY
    block (viewed / clicked / purchased that day) — the k-treatment
    extension of mcnemar_view_purchase. Blocks are user-days, not
    users: corpus-lifetime "ever" flags saturate to all-ones on this
    data (every L_i = k), which zeroes Q's denominator and carries no
    signal; daily blocks vary. Q = k(k-1)(k*sum G_j^2 - (sum L_i)^2)
    / (k*sum L_i - sum L_i^2) from exact BIGINT column/row totals;
    the all-saturated edge case is guarded to 0.0 identically on
    both engines; one float expression, floor-quantized 1e-6."""
    e = T(spark, sf_dir, "events")
    flags = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        *[
            F.max((F.col("event_type") == t).cast("int")).alias(f"t{i + 1}")
            for i, t in enumerate(("view", "click", "purchase"))
        ]
    )
    li = F.col("t1") + F.col("t2") + F.col("t3")
    s = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t1").cast("long").alias("g1"),
        F.sum("t2").cast("long").alias("g2"),
        F.sum("t3").cast("long").alias("g3"),
        F.sum(li).cast("long").alias("l_sum"),
        F.sum(li * li).cast("long").alias("l_sq"),
    )
    g2sum = (
        F.col("g1").cast("double") * F.col("g1")
        + F.col("g2").cast("double") * F.col("g2")
        + F.col("g3").cast("double") * F.col("g3")
    )
    den = 3 * F.col("l_sum") - F.col("l_sq")
    q = F.when(den == 0, F.lit(0.0)).otherwise(
        F.lit(6.0)
        * (3 * g2sum - F.col("l_sum").cast("double") * F.col("l_sum"))
        / den
    )
    return s.select(
        "n", "g1", "g2", "g3",
        F.when(F.lit(True), F.floor(q * 1e6 + 0.5) / 1e6).alias("q_stat"),
    )


@_promoted(
    "audience_overlap_sources",
    """
    WITH su AS (
      SELECT DISTINCT source, doc_id % 97 AS aud FROM documents
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM su GROUP BY 1
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS i
      FROM su a JOIN su b ON a.aud = b.aud AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.i AS n_common,
           round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY src_a, src_b
    """,
)
def audience_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix between sources (exact set Jaccard of
    their synthetic audience buckets, doc_id mod 97): the pairwise reach/overlap
    planning view marketers run, and the EXACT twin of
    kmv_custkey_overlap_priority's sketched estimates — same
    intersection-over-union, ground truth instead of bottom-k. The
    pair join runs through the shared audience member (never
    sources^2 x members), counts collapse map-side."""
    d = T(spark, sf_dir, "documents")
    su = d.select("source", (F.col("doc_id") % 97).alias("aud")).distinct()
    sizes = su.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = su.select(F.col("source").alias("src_a"), "aud")
    b = su.select(F.col("source").alias("src_b"), "aud")
    inter = (
        a.join(b, "aud")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        inter.join(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .select("src_a", "src_b", "n_a", "n_b", "n_common",
                F.round(jac, 6).alias("jaccard"))
        .orderBy("src_a", "src_b")
    )


@_promoted(
    "conversion_horizon_shares",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT user_id,
             CAST(floor(epoch(first_buy)) - floor(epoch(first_view)) AS BIGINT)
               AS delay_s
      FROM firsts
      WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
        AND first_buy >= first_view
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_viewers FROM firsts
      WHERE first_view IS NOT NULL
    )
    SELECT t.n_viewers,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(sum(CASE WHEN delay_s <= 3600 THEN 1 ELSE 0 END) AS BIGINT)
             AS within_1h,
           CAST(sum(CASE WHEN delay_s <= 21600 THEN 1 ELSE 0 END) AS BIGINT)
             AS within_6h,
           CAST(sum(CASE WHEN delay_s <= 86400 THEN 1 ELSE 0 END) AS BIGINT)
             AS within_24h
    FROM conv CROSS JOIN tot t
    GROUP BY t.n_viewers
    """,
)
def conversion_horizon_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-horizon curve: of users whose first view precedes
    their first purchase, how many convert within 1h / 6h / 24h —
    the fixed-horizon CDF complement of funnel_windowed_3d (which
    gates on one window) and survival_km_repurchase (which models
    censoring). Delays are integer seconds via floor(epoch()) on
    both engines (the fractional-epoch parity trap is documented);
    everything else is exact counts."""
    e = T(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_buy"),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select(
        (F.unix_timestamp("first_buy") - F.unix_timestamp("first_view"))
        .cast("long")
        .alias("delay_s")
    )
    tot = firsts.filter(F.col("first_view").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_viewers")
    )
    return (
        conv.crossJoin(F.broadcast(tot))
        .groupBy("n_viewers")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.sum((F.col("delay_s") <= 3600).cast("long")).cast("long").alias("within_1h"),
            F.sum((F.col("delay_s") <= 21600).cast("long")).cast("long").alias("within_6h"),
            F.sum((F.col("delay_s") <= 86400).cast("long")).cast("long").alias("within_24h"),
        )
    )


@_promoted(
    "haar_energy_daily_events",
    """
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS idx,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events
      WHERE CAST(ts AS DATE) < DATE '2024-01-17'
      GROUP BY 1
    ),
    l0 AS MATERIALIZED (SELECT idx, cents AS s FROM daily),
    l1 AS MATERIALIZED (
      SELECT idx // 2 AS idx,
             CAST(sum(CASE WHEN idx % 2 = 0 THEN s ELSE s END) AS BIGINT) AS s,
             CAST(sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
      FROM l0 GROUP BY 1
    ),
    l2 AS MATERIALIZED (
      SELECT idx // 2 AS idx,
             CAST(sum(s) AS BIGINT) AS s,
             CAST(sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
      FROM l1 GROUP BY 1
    ),
    l3 AS MATERIALIZED (
      SELECT idx // 2 AS idx,
             CAST(sum(s) AS BIGINT) AS s,
             CAST(sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
      FROM l2 GROUP BY 1
    ),
    l4 AS MATERIALIZED (
      SELECT idx // 2 AS idx,
             CAST(sum(s) AS BIGINT) AS s,
             CAST(sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
      FROM l3 GROUP BY 1
    )
    SELECT CAST(1 AS BIGINT) AS level,
           CAST(sum(d * d) AS BIGINT) AS energy, CAST(count(*) AS BIGINT) AS n
    FROM l1 GROUP BY 1
    UNION ALL SELECT 2, CAST(sum(d * d) AS BIGINT), CAST(count(*) AS BIGINT) FROM l2
    UNION ALL SELECT 3, CAST(sum(d * d) AS BIGINT), CAST(count(*) AS BIGINT) FROM l3
    UNION ALL SELECT 4, CAST(sum(d * d) AS BIGINT), CAST(count(*) AS BIGINT) FROM l4
    ORDER BY level
    """,
)
def haar_energy_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of the first 16 days
    of revenue (4 dyadic levels: pairwise sums s = a+b carry up,
    details d = a-b stay) with per-level detail ENERGY sum(d^2) — the
    multi-resolution "where does the variance live" view (level 1 =
    day-to-day noise, level 4 = week-scale swings) complementing
    stl_lite's additive decomposition. Unnormalized Haar keeps every
    coefficient an exact BIGINT of integer cents — no sqrt(2), no
    floats anywhere. Each level is one tiny groupBy on idx//2;
    the oracle unrolls the identical 4 levels as MATERIALIZED CTEs."""
    e = T(spark, sf_dir, "events").filter(
        F.to_date("ts") < F.lit("2024-01-17").cast("date")
    )
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("idx")
    ).agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents"))
    level = daily.select("idx", F.col("cents").alias("s"))
    out = None
    for lv in range(1, 5):
        sign = F.when(F.col("idx") % 2 == 0, F.col("s")).otherwise(-F.col("s"))
        nxt = (
            level.groupBy(F.expr("idx div 2").alias("idx"))
            .agg(
                F.sum("s").cast("long").alias("s"),
                F.sum(sign).cast("long").alias("d"),
            )
            .localCheckpoint()
        )
        stats = nxt.agg(
            F.lit(lv).cast("long").alias("level"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("energy"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        out = stats if out is None else out.unionByName(stats)
        level = nxt.select("idx", "s")
    return out.orderBy("level")


@_promoted(
    "dup_cluster_size_histogram",
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tokens) - 1),
                                   i -> array_to_string(list_slice(tokens, i, i + 2), ' '))) AS shingle
      FROM toks WHERE len(tokens) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), jac_pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM jac_pairs
      UNION ALL SELECT doc_b, doc_a FROM jac_pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ), comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM reach GROUP BY src
    ), csize AS (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM csize GROUP BY 1 ORDER BY cluster_size
    """,
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-GROUP size distribution (how big do near-dup
    clusters get — the health metric dedup teams watch: a fat tail
    means template explosions, not organic duplication): exact
    3-shingle Jaccard >= 0.5 pairs -> connected components -> size
    histogram over clusters. The survivor queries keep one doc per
    cluster; this exposes the cluster-mass structure itself. The
    ground-truth oracle replays the pairs exactly and closes the
    transitive closure with a recursive CTE."""
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        connected_components,
        prefix_filter_jaccard_pairs,
    )

    d = T(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(d, n=3, threshold=0.5)
    comps = connected_components(pairs)
    csize = comps.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        csize.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("cluster_size").cast("long").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@_promoted(
    "lmoments_order_values",
    """
    WITH cells AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) - cnt AS BIGINT) AS cb
      FROM cells
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT r.v, r.cnt,
             CAST(r.v * r.cnt AS BIGINT) AS u0,
             CAST(floor(r.v * (
               (CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) / 2
                - CAST(r.cb - 1 AS DOUBLE) * r.cb / 2)
               / (CAST(t.n AS DOUBLE) * (t.n - 1))) * 1e6 + 0.5) AS BIGINT) AS u1,
             CAST(floor(r.v * (
               ((CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) * (2 * (r.cb + r.cnt) - 1) / 6
                 - CAST(r.cb - 1 AS DOUBLE) * r.cb * (2 * r.cb - 1) / 6)
                - (CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) / 2
                   - CAST(r.cb - 1 AS DOUBLE) * r.cb / 2))
               / (CAST(t.n AS DOUBLE) * (t.n - 1) * (t.n - 2))) * 1e6 + 0.5)
               AS BIGINT) AS u2,
             CAST(floor(r.v * (
               ((CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) / 2)
                  * (CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) / 2)
                - (CAST(r.cb - 1 AS DOUBLE) * r.cb / 2)
                  * (CAST(r.cb - 1 AS DOUBLE) * r.cb / 2)
                - 3 * (CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) * (2 * (r.cb + r.cnt) - 1) / 6
                       - CAST(r.cb - 1 AS DOUBLE) * r.cb * (2 * r.cb - 1) / 6)
                + 2 * (CAST(r.cb + r.cnt - 1 AS DOUBLE) * (r.cb + r.cnt) / 2
                       - CAST(r.cb - 1 AS DOUBLE) * r.cb / 2))
               / (CAST(t.n AS DOUBLE) * (t.n - 1) * (t.n - 2) * (t.n - 3))) * 1e6 + 0.5)
               AS BIGINT) AS u3
      FROM ranked r CROSS JOIN tot t
    ),
    b AS (
      SELECT t.n,
             CAST(sum(u0) AS DOUBLE) / t.n AS b0,
             CAST(sum(u1) AS DOUBLE) / 1e6 AS b1,
             CAST(sum(u2) AS DOUBLE) / 1e6 AS b2,
             CAST(sum(u3) AS DOUBLE) / 1e6 AS b3
      FROM terms CROSS JOIN tot t GROUP BY t.n
    )
    SELECT n,
           floor(b0 * 1e2 + 0.5) / 1e2 AS l1_q,
           floor((2 * b1 - b0) * 1e2 + 0.5) / 1e2 AS l2_q,
           floor((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0) * 1e6 + 0.5) / 1e6 AS t3_q,
           floor((20 * b3 - 30 * b2 + 12 * b1 - b0) / (2 * b1 - b0) * 1e6 + 0.5) / 1e6
             AS t4_q
    FROM b
    """,
)
def lmoments_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-moments of the order-value distribution (Hosking 1990):
    L-scale, L-skewness t3, L-kurtosis t4 — the order-statistics
    moment family that is robust where conventional skew/kurtosis
    explode (every L-moment is a LINEAR functional of order stats).
    Sample b_r = sum x_(i) * C(i-1, r) / C(n-1, r) reduce to
    VALUE-LEVEL weights: a value block occupying ranks
    [cb+1, cb+cnt] contributes closed-form power sums of its rank
    range (intra-block order is irrelevant — the position SET is
    fixed), so the whole computation rides one cumulative count on
    the value frame (engine: scalable prefix_sum; oracle: windowed
    sum). Weights are normalized by their falling-factorial
    denominators BEFORE the v-multiply and each term is quantized to
    1e-6 units (bounded sums at any SF — raw v*W3 would overflow
    BIGINT at sf1.0); identical operation order both engines."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    o = T(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ranked = prefix_sum(cells, [F.asc("v")], "cnt", name="c_incl").select(
        "v", "cnt", (F.col("c_incl") - F.col("cnt")).cast("long").alias("cb")
    )
    tot = cells.agg(F.sum("cnt").cast("long").alias("n"))
    r = ranked.crossJoin(F.broadcast(tot))
    a1 = F.col("cb").cast("double")          # block start t-range is [cb, cb+cnt-1]
    b1x = (F.col("cb") + F.col("cnt") - 1).cast("double")
    s1 = b1x * (b1x + 1) / 2 - (a1 - 1) * a1 / 2
    s2 = (
        b1x * (b1x + 1) * (2 * b1x + 1) / 6
        - (a1 - 1) * a1 * (2 * a1 - 1) / 6
    )
    s3 = (b1x * (b1x + 1) / 2) * (b1x * (b1x + 1) / 2) - (
        (a1 - 1) * a1 / 2
    ) * ((a1 - 1) * a1 / 2)
    n = F.col("n").cast("double")
    v = F.col("v")
    u0 = (v * F.col("cnt")).cast("long")
    u1 = F.floor(v * (s1 / (n * (n - 1))) * 1e6 + 0.5).cast("long")
    u2 = F.floor(v * ((s2 - s1) / (n * (n - 1) * (n - 2))) * 1e6 + 0.5).cast("long")
    u3 = F.floor(
        v * ((s3 - 3 * s2 + 2 * s1) / (n * (n - 1) * (n - 2) * (n - 3))) * 1e6 + 0.5
    ).cast("long")
    b = (
        r.select(F.col("n"), u0.alias("u0"), u1.alias("u1"), u2.alias("u2"), u3.alias("u3"))
        .groupBy("n")
        .agg(
            (F.sum("u0").cast("double") / F.col("n").cast("double")).alias("b0"),
            (F.sum("u1").cast("double") / 1e6).alias("b1"),
            (F.sum("u2").cast("double") / 1e6).alias("b2"),
            (F.sum("u3").cast("double") / 1e6).alias("b3"),
        )
    )
    b0, b1c, b2c, b3c = (F.col(c) for c in ("b0", "b1", "b2", "b3"))
    l2 = 2 * b1c - b0
    return b.select(
        "n",
        (F.floor(b0 * 1e2 + 0.5) / 1e2).alias("l1_q"),
        (F.floor(l2 * 1e2 + 0.5) / 1e2).alias("l2_q"),
        (F.floor((6 * b2c - 6 * b1c + b0) / l2 * 1e6 + 0.5) / 1e6).alias("t3_q"),
        (F.floor((20 * b3c - 30 * b2c + 12 * b1c - b0) / l2 * 1e6 + 0.5) / 1e6).alias("t4_q"),
    )


@_promoted(
    "friedman_by_type",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (
      SELECT u.user_id, t.event_type,
             CAST(coalesce(any_value(x.cents), 0) AS BIGINT) AS cents
      FROM users u CROSS JOIN types t
      LEFT JOIN (
        SELECT user_id, event_type,
               CAST(sum(round(value * 100)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
      ) x ON x.user_id = u.user_id AND x.event_type = t.event_type
      GROUP BY 1, 2
    ),
    r2 AS (
      SELECT a.user_id, a.event_type,
             CAST(2 * sum(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END)
                  + sum(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS rank2
      FROM grid a JOIN grid b ON b.user_id = a.user_id
      GROUP BY 1, 2
    ),
    pertype AS (
      SELECT event_type, CAST(sum(rank2) AS BIGINT) AS r2j FROM r2 GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM users) AS n,
             (SELECT CAST(sum(rank2 * rank2) AS BIGINT) FROM r2) AS a4,
             CAST(sum((r2j - 6 * (SELECT count(*) FROM users))
                      * (r2j - 6 * (SELECT count(*) FROM users))) AS BIGINT) AS devsq
      FROM pertype
    )
    SELECT n,
           floor(4.0 * devsq / (CAST(a4 AS DOUBLE) - 180 * n) * 1e6 + 0.5) / 1e6
             AS chi2_q
    FROM tot
    """,
)
def friedman_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test across the five event types with users as
    blocks (the repeated-measures Kruskal-Wallis: does spend rank
    consistently differ by type WITHIN users, removing between-user
    level differences): per-user midranks of the 5 per-type totals
    (densified grid — absent types rank as zeros) as exact 2x-rank
    integers from a tiny per-user 5x5 self-join, the tie-corrected
    Conover form chi2 = (k-1) sum(R_j - n(k+1)/2)^2 / (A - C)
    collapsing, in 2x units with k=5, to the ALL-INTEGER
    4*sum(R2_j - 6n)^2 / (A4 - 180n) — one float division at the
    end, floor-quantized 1e-6."""
    e = T(spark, sf_dir, "events")
    x = e.groupBy("user_id", "event_type").agg(
        F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents")
    )
    users = e.select("user_id").distinct()
    types = e.select("event_type").distinct()
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(x, ["user_id", "event_type"], "left")
        .fillna(0, ["cents"])
        .localCheckpoint()
    )
    a = grid.select("user_id", F.col("event_type").alias("et_a"), F.col("cents").alias("ca"))
    b = grid.select("user_id", F.col("event_type").alias("et_b"), F.col("cents").alias("cb"))
    r2 = (
        a.join(b, "user_id")
        .groupBy("user_id", "et_a")
        .agg(
            (
                2 * F.sum((F.col("cb") < F.col("ca")).cast("long"))
                + F.sum((F.col("cb") == F.col("ca")).cast("long"))
                + 1
            ).cast("long").alias("rank2")
        )
    ).localCheckpoint()
    n_users = users.count()
    pertype = r2.groupBy("et_a").agg(F.sum("rank2").cast("long").alias("r2j"))
    a4 = r2.agg(F.sum(F.col("rank2") * F.col("rank2")).cast("long").alias("a4"))
    devsq = pertype.agg(
        F.sum((F.col("r2j") - 6 * n_users) * (F.col("r2j") - 6 * n_users))
        .cast("long")
        .alias("devsq")
    )
    chi2 = (
        4.0 * F.col("devsq")
        / (F.col("a4").cast("double") - 180 * F.lit(n_users))
    )
    return (
        devsq.crossJoin(F.broadcast(a4))
        .select(
            F.lit(n_users).cast("long").alias("n"),
            (F.floor(chi2 * 1e6 + 0.5) / 1e6).alias("chi2_q"),
        )
    )


# ---------------------------------------------------------------------------
# Registration: runs AFTER every definition above, so each query
# enters the registry with its final oracle.
# ---------------------------------------------------------------------------
from dbt_lakehouse_aws_spark.standard_queries import register as _register  # noqa: E402

for _name in list(_PROMOTED_QUERIES):
    _register(_name, _PROMOTED_ORACLES[_name])(_PROMOTED_QUERIES[_name])

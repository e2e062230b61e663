"""Round-10+ STAGED queries — work built after round 9's 50-slot
window (18 backfills + the 32 in staged_r9.py) was already full.
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
    "link_prediction_capped_users",
    """
    WITH ue AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
      FROM events
    ),
    shared AS (
      SELECT x.user_id AS a, y.user_id AS b, CAST(count(*) AS BIGINT) AS shared
      FROM ue x JOIN ue y
        ON x.event_type = y.event_type AND x.hr = y.hr
       AND x.user_id < y.user_id
      GROUP BY 1, 2
    ),
    strong AS (SELECT a, b, shared FROM shared WHERE shared >= 3),
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
    kept_dir AS (SELECT node, nbr FROM ranked WHERE rk <= 16),
    capped AS MATERIALIZED (
      SELECT DISTINCT least(node, nbr) AS a, greatest(node, nbr) AS b
      FROM kept_dir
    ),
    nbrs AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM capped UNION ALL SELECT b, a FROM capped
    ),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM nbrs GROUP BY 1),
    wedges AS (
      SELECT w1.node AS node_a, w2.node AS node_b, CAST(count(*) AS BIGINT) AS common
      FROM (SELECT nbr AS w, node FROM nbrs) w1
      JOIN (SELECT nbr AS w, node FROM nbrs) w2 ON w2.w = w1.w
      WHERE w1.node < w2.node
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    cand AS (
      SELECT w.node_a, w.node_b, w.common FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM capped c
                        WHERE c.a = w.node_a AND c.b = w.node_b)
    )
    SELECT c.node_a AS user_a, c.node_b AS user_b, c.common,
           round(CAST(c.common AS DOUBLE)
                 / (da.deg + db.deg - c.common), 6) AS jaccard
    FROM cand c
    JOIN deg da ON da.node = c.node_a
    JOIN deg db ON db.node = c.node_b
    ORDER BY jaccard DESC, user_a ASC, user_b ASC
    LIMIT 30
    """,
)
def link_prediction_capped_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the NEIGHBOR-CAPPED co-activity graph — the
    documented 100 TB degeneracy control for the Sigma-deg^2 wedge
    family (VERDICT r5 plan audit; the uncapped exact rows hit the
    sf1.0 watchdog because 10x slot density densifies the graph
    quadratically): each node keeps only its top-16 strongest
    neighbors (shared-count DESC, id ASC — deterministic), edges
    survive if EITHER endpoint keeps them (standard kNN-graph
    symmetrization), and common-neighbor Jaccard runs on the capped
    graph, whose wedge volume is bounded by n*k^2 REGARDLESS of how
    dense the raw graph gets. The oracle replays the identical cap
    with a window — this is a DIFFERENT, fully-specified estimand,
    not an approximation of the uncapped query (which keeps its own
    exact oracle at sf <= 0.1 scale); measured at sf1.0 in PERF.md
    where the uncapped form times out."""
    from dbt_lakehouse_aws_spark.operators.graph import (
        cap_neighbors,
        common_neighbor_scores,
    )

    e = T(spark, sf_dir, "events")
    ue = e.select(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).distinct()
    x = ue.select(F.col("user_id").alias("a"), "event_type", "hr")
    y = ue.select(F.col("user_id").alias("b"), "event_type", "hr")
    weighted = (
        x.join(y, ["event_type", "hr"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= 3)
    )
    capped = cap_neighbors(weighted, k=16, weight="shared")
    scores = common_neighbor_scores(capped, src="a", dst="b", min_common=2)
    return (
        scores.select(
            F.col("node_a").alias("user_a"),
            F.col("node_b").alias("user_b"),
            "common",
            F.round("jaccard", 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("user_a"), F.asc("user_b"))
        .limit(30)
    )


@_staged(
    "triangle_counts_capped_events",
    """
    WITH ue AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
      FROM events
    ),
    shared AS (
      SELECT x.user_id AS a, y.user_id AS b, CAST(count(*) AS BIGINT) AS shared
      FROM ue x JOIN ue y
        ON x.event_type = y.event_type AND x.hr = y.hr
       AND x.user_id < y.user_id
      GROUP BY 1, 2
    ),
    strong AS (SELECT a, b, shared FROM shared WHERE shared >= 3),
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
      FROM ranked WHERE rk <= 16
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM capped e1
      JOIN capped e2 ON e2.a = e1.b
      JOIN capped e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      GROUP BY node
    ),
    nodes AS (SELECT a AS node FROM capped UNION SELECT b FROM capped)
    SELECT n.node AS user_id,
           CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles
    FROM nodes n LEFT JOIN per_node p ON p.node = n.node
    ORDER BY triangles DESC, user_id ASC LIMIT 20
    """,
)
def triangle_counts_capped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the NEIGHBOR-CAPPED co-activity
    graph — the second member of the capped wedge family
    (link_prediction_capped_users explains the estimand): top-16
    strongest neighbors per node, kNN symmetrization, then the
    degree-ordered-orientation triangle count whose wedge volume the
    cap bounds at n*k^2 however dense the raw graph gets. The oracle
    replays the cap with a window and counts the same triangles with
    the naive ordered triple join — a genuinely different algorithm
    agreeing on exact integers. Top-20 most clustered users."""
    from dbt_lakehouse_aws_spark.operators.graph import (
        cap_neighbors,
        triangle_counts,
    )

    e = T(spark, sf_dir, "events")
    ue = e.select(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).distinct()
    x = ue.select(F.col("user_id").alias("a"), "event_type", "hr")
    y = ue.select(F.col("user_id").alias("b"), "event_type", "hr")
    weighted = (
        x.join(y, ["event_type", "hr"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= 3)
    )
    capped = cap_neighbors(weighted, k=16, weight="shared")
    return (
        triangle_counts(capped, src="a", dst="b")
        .select(F.col("node").alias("user_id"), "triangles")
        .orderBy(F.desc("triangles"), F.asc("user_id"))
        .limit(20)
    )


@_staged(
    "stream_session_equivalence",
    """
    WITH e AS (
      SELECT user_id, ts, CAST(round(value * 100) AS DOUBLE) AS v FROM events
    ),
    s AS (
      SELECT user_id, ts, v,
             CASE WHEN ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    t AS (
      SELECT user_id, v,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
      FROM s
    ),
    g AS (
      SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS cents
      FROM t GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents_total
    FROM g
    """,
)
def stream_session_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream/batch equivalence for STATEFUL SESSIONIZATION: the
    events flow through streaming/ingest.py::sessionize
    (applyInPandasWithState, 30-minute gap, event-time timeouts)
    with one FAR-FUTURE SENTINEL event appended per user, so every
    REAL session closes in-batch and emits deterministically — the
    sentinel's own 1-event session stays open forever and can never
    time out (its timeout sits past any watermark), which removes
    the only nondeterminism in availableNow stateful streams (the
    optional trailing empty batch that may or may not fire
    timeouts, observed flipping the emitted set by 13 sessions).
    The oracle sessionizes the real events INDEPENDENTLY with window
    functions (lag-gap flags -> running session ordinal). Values are
    integer cents fed through the stateful fold as integer-valued
    doubles, so per-session totals are summation-order-exact and the
    three aggregate checksums (sessions, events, cents) must match
    bit-for-bit — the ninth streaming-equivalence row."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.streaming.ingest import sessionize

    ev = T(spark, sf_dir, "events").select(
        "ts", "user_id", F.round(F.col("value") * 100).cast("double").alias("value")
    )
    sentinels = ev.select("user_id").distinct().select(
        F.lit("2099-01-01 00:00:00").cast("timestamp").alias("ts"),
        "user_id",
        F.lit(0.0).alias("value"),
    )
    root = tempfile.mkdtemp(prefix=f"sess_eq_{uuid.uuid4().hex[:8]}_")
    src = f"{root}/events"
    # ONE file -> ONE micro-batch (multi-file availableNow splits
    # into several batches, where late rows get watermark-dropped)
    ev.unionByName(sentinels).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    sessions = sessionize(stream, gap="30 minutes", watermark="1 hour")
    name = f"sess_eq_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{root}/ckpt")
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("total_value").cast("long").alias("cents_total"),
    )

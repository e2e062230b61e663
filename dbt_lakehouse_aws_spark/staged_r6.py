"""Round-6 STAGED queries — implemented after the round-5 driver
window froze, NOT yet in ``queries()``.

Same discipline as round 4's staging (VERDICT r3 item 3: zero
registered-but-unwindowed queries at round end): anything built after
the freeze lives here with its oracle, pytest-verified every session
by ``tests/test_staged_r6.py``, then moves into the registry with a
plain ``@register`` when round 6 opens.
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


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


@_staged(
    "part_hierarchy_rollup",
    """
    WITH RECURSIVE rev AS (
      SELECT l_partkey AS node,
             CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    parents AS (
      SELECT p_partkey AS child, p_partkey // 8 AS parent
      FROM part WHERE p_partkey // 8 >= 1
    ),
    anc(node, anc) AS (
      SELECT child, parent FROM parents
      UNION
      SELECT a.node, p.parent FROM anc a JOIN parents p ON p.child = a.anc
    ),
    contrib AS (
      SELECT node AS target, cents FROM rev
      UNION ALL
      SELECT a.anc, r.cents FROM rev r JOIN anc a ON a.node = r.node
    )
    SELECT target AS node, CAST(sum(cents) AS BIGINT) AS subtree_cents
    FROM contrib GROUP BY 1
    ORDER BY subtree_cents DESC, node ASC LIMIT 20
    """,
)
def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup (operators/graph.py::
    subtree_rollup over ancestor_closure): parts form a synthetic
    8-ary forest (parent = partkey div 8), revenue rolls up every
    node's ENTIRE subtree. The engine closes the hierarchy by
    POINTER DOUBLING — ⌈log₂ depth⌉ self-joins, not depth sequential
    ones, the 100 TB answer to Spark's missing recursive CTE — while
    the oracle uses DuckDB's actual recursive CTE: two different
    fixpoint algorithms agreeing on exact integer cents. Top-20
    subtrees."""
    from dbt_lakehouse_aws_spark.operators.graph import subtree_rollup

    from dbt_lakehouse_aws_spark.standard_queries import T

    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    rev = l.groupBy(F.col("l_partkey").alias("node")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100)).cast("long").alias("cents")
    )
    parents = p.select(
        F.col("p_partkey").alias("child"),
        (F.col("p_partkey") / 8).cast("long").alias("parent"),
    ).filter(F.col("parent") >= 1)
    out = subtree_rollup(parents, rev, node_col="node", value_col="cents")
    return (
        out.select("node", F.col("subtree_total").cast("long").alias("subtree_cents"))
        .orderBy(F.desc("subtree_cents"), F.asc("node"))
        .limit(20)
    )


@_staged(
    "seasonal_naive_backtest",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, isodow(CAST(ts AS DATE)) AS wd,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    train AS (SELECT * FROM daily WHERE day < DATE '2024-03-01'),
    test AS (SELECT * FROM daily WHERE day >= DATE '2024-03-01'),
    fc AS (
      SELECT wd, sum(cents) / count(*) AS fc_cents FROM train GROUP BY wd
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test_days,
           round(avg(abs(t.cents - f.fc_cents) / t.cents), 6) AS mape,
           round(avg((t.cents - f.fc_cents) / t.cents), 6) AS bias
    FROM test t JOIN fc f ON f.wd = t.wd
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every real
    forecaster must beat, as an engine op: train on Jan-Feb daily
    revenue, forecast each March day with its ISO-weekday train mean,
    score MAPE + signed bias on the held-out days. Everything is two
    hash aggregates + a 7-row broadcast join; revenue travels as
    integer cents so the train means are exact rationals."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        (F.weekday(F.to_date("ts")) + 1).alias("wd"),
    ).agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("cents"))
    cut = F.lit("2024-03-01").cast("date")
    train = daily.filter(F.col("day") < cut)
    test = daily.filter(F.col("day") >= cut)
    fc = train.groupBy("wd").agg(
        (F.sum("cents") / F.count(F.lit(1))).alias("fc_cents")
    )
    err = (F.col("cents") - F.col("fc_cents")) / F.col("cents")
    return (
        test.join(F.broadcast(fc), "wd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_days"),
            F.round(F.avg(F.abs(err)), 6).alias("mape"),
            F.round(F.avg(err), 6).alias("bias"),
        )
    )


@_staged(
    "blocking_quality_parts",
    """
    WITH dirty AS (
      SELECT p_partkey AS dirty_key,
             CASE p_partkey % 3
               WHEN 0 THEN p_name
               WHEN 1 THEN concat(substring(p_name, 1, p_partkey % (length(p_name) - 1)),
                                  substring(p_name, p_partkey % (length(p_name) - 1) + 2))
               ELSE concat(substring(p_name, 1, p_partkey % (length(p_name) - 1)),
                           substring(p_name, p_partkey % (length(p_name) - 1) + 2, 1),
                           substring(p_name, p_partkey % (length(p_name) - 1) + 1, 1),
                           substring(p_name, p_partkey % (length(p_name) - 1) + 3))
             END AS dirty_name
      FROM part
    ),
    truth AS (
      SELECT p.p_partkey,
             substring(p.p_name, 1, 1) = substring(d.dirty_name, 1, 1) AS caught
      FROM part p JOIN dirty d ON d.dirty_key = p.p_partkey
      WHERE round(jaro_winkler_similarity(p.p_name, d.dirty_name), 6) >= 0.92
    ),
    cb AS (SELECT substring(p_name, 1, 1) AS blk, count(*) AS nc FROM part GROUP BY 1),
    db AS (SELECT substring(dirty_name, 1, 1) AS blk, count(*) AS nd FROM dirty GROUP BY 1),
    cand AS (
      SELECT CAST(coalesce(sum(nc * nd), 0) AS BIGINT) AS n_candidates
      FROM cb JOIN db USING (blk)
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part)
    SELECT tot.n_parts,
           cand.n_candidates,
           round(1.0 - CAST(cand.n_candidates AS DOUBLE)
                       / (CAST(tot.n_parts AS DOUBLE) * tot.n_parts), 6)
             AS reduction_ratio,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_matches,
           round(CAST((SELECT count(*) FILTER (caught) FROM truth) AS DOUBLE)
                 / (SELECT count(*) FROM truth), 6) AS pair_completeness
    FROM tot CROSS JOIN cand
    """,
)
def blocking_quality_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality metrics for the record-linkage family — the
    two numbers an entity-resolution pipeline tunes its blocking key
    by: REDUCTION RATIO (1 − candidates/all-pairs, here first-letter
    blocking, counted from per-block SIZE aggregates — the pair set
    is never materialized, which is the point at 100 TB) and PAIR
    COMPLETENESS (fraction of true matches the blocking keeps; the
    typo generator mutates position 1 for some keys, so it is
    genuinely < 1). Ground-truth matches reuse the bit-exact JW
    kernel at the linkage threshold, scored only on the n identity
    pairs."""
    from dbt_lakehouse_aws_spark.llmops.linkage import jw_linkage
    from dbt_lakehouse_aws_spark.queries_r5 import _DIRTY_NAME_SQL
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part")
    clean = p.select("p_partkey", "p_name").withColumn("blk", F.col("p_partkey"))
    dirty = p.select(
        F.col("p_partkey").alias("dirty_key"),
        F.expr(_DIRTY_NAME_SQL).alias("dirty_name"),
    ).withColumn("blk", F.col("dirty_key"))
    truth = jw_linkage(
        clean,
        dirty,
        left_id="p_partkey",
        right_id="dirty_key",
        left_text="p_name",
        right_text="dirty_name",
        block_col="blk",
        threshold=0.92,
    )
    names = clean.select("p_partkey", "p_name").join(
        dirty.select("dirty_key", "dirty_name"),
        F.col("p_partkey") == F.col("dirty_key"),
    )
    truth_flags = truth.select("p_partkey").join(names, "p_partkey").select(
        "p_partkey",
        (
            F.substring("p_name", 1, 1) == F.substring("dirty_name", 1, 1)
        ).alias("caught"),
    )
    cb = clean.groupBy(F.substring("p_name", 1, 1).alias("blk_c")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    db = dirty.groupBy(F.substring("dirty_name", 1, 1).alias("blk_d")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    cand = cb.join(db, cb.blk_c == db.blk_d).agg(
        F.coalesce(F.sum(F.col("nc") * F.col("nd")), F.lit(0))
        .cast("long")
        .alias("n_candidates")
    )
    tot = p.agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    tstats = truth_flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_matches"),
        F.sum(F.col("caught").cast("long")).alias("n_caught"),
    )
    return (
        tot.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(tstats))
        .select(
            "n_parts",
            "n_candidates",
            F.round(
                1.0
                - F.col("n_candidates").cast("double")
                / (F.col("n_parts").cast("double") * F.col("n_parts")),
                6,
            ).alias("reduction_ratio"),
            "n_true_matches",
            F.round(
                F.col("n_caught").cast("double") / F.col("n_true_matches"), 6
            ).alias("pair_completeness"),
        )
    )

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


from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
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


@_staged(
    "conformal_interval_coverage",
    """
    WITH base AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey % 2 = 0 AS is_calib
      FROM orders
    ),
    pred AS (
      SELECT grp, sum(cents) / count(*) AS mu
      FROM base WHERE is_calib GROUP BY grp
    ),
    resid AS (
      SELECT b.grp, b.is_calib, abs(b.cents - p.mu) AS r
      FROM base b JOIN pred p ON p.grp = b.grp
    ),
    q AS (
      SELECT grp, quantile_disc(r, 0.9) AS q90
      FROM resid WHERE is_calib GROUP BY grp
    )
    SELECT r.grp AS priority,
           CAST(count(*) AS BIGINT) AS n_test,
           round(avg(CASE WHEN r.r <= q.q90 THEN 1.0 ELSE 0.0 END), 6)
             AS coverage,
           round(q.q90 / 100, 2) AS interval_halfwidth
    FROM resid r JOIN q ON q.grp = r.grp
    WHERE NOT r.is_calib
    GROUP BY r.grp, q.q90
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals — the distribution-free
    uncertainty wrapper an ML-serving pipeline calibrates offline:
    even orderkeys are the calibration split, the predictor is the
    per-priority calibration mean (exact rational cents), the
    interval half-width is the DISCRETE 90th percentile of
    calibration |residuals| (percentile_disc returns an actual data
    value — no interpolation, so both engines pick the identical
    element), and the reported number is held-out coverage per
    priority. Two aggregates + two broadcast joins; nothing leaves
    integer/rational arithmetic until the final division."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2 == 0).alias("is_calib"),
    )
    pred = (
        base.filter("is_calib")
        .groupBy("grp")
        .agg((F.sum("cents") / F.count(F.lit(1))).alias("mu"))
    )
    resid = base.join(F.broadcast(pred), "grp").select(
        "grp", "is_calib", F.abs(F.col("cents") - F.col("mu")).alias("r")
    )
    q = (
        resid.filter("is_calib")
        .groupBy("grp")
        .agg(
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY r)").alias("q90")
        )
    )
    test = resid.filter(~F.col("is_calib")).join(F.broadcast(q), "grp")
    return test.groupBy(F.col("grp").alias("priority"), "q90").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(
            F.avg(F.when(F.col("r") <= F.col("q90"), 1.0).otherwise(0.0)), 6
        ).alias("coverage"),
    ).select(
        "priority",
        "n_test",
        "coverage",
        F.round(F.col("q90") / 100, 2).alias("interval_halfwidth"),
    )


@_staged(
    "heaps_law_vocab_growth",
    """
    WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
    toks AS (
      SELECT CAST(doc_id * 10 // mx.m AS BIGINT) AS bucket,
             unnest(string_split(text, ' ')) AS term
      FROM documents, mx
    ),
    first_seen AS (
      SELECT term, min(bucket) AS fb FROM toks GROUP BY term
    ),
    per_bucket AS (
      SELECT fb, count(*) AS new_terms FROM first_seen GROUP BY fb
    ),
    tok_per_bucket AS (
      SELECT bucket, count(*) AS n_tokens FROM toks GROUP BY bucket
    ),
    grid AS (SELECT DISTINCT bucket FROM tok_per_bucket)
    SELECT g.bucket,
           CAST(sum(t.n_tokens) AS BIGINT) AS corpus_tokens,
           CAST(sum(coalesce(p.new_terms, 0)) AS BIGINT) AS vocab_size
    FROM grid g
    JOIN tok_per_bucket t ON t.bucket <= g.bucket
    LEFT JOIN per_bucket p ON p.fb = t.bucket
    GROUP BY g.bucket
    ORDER BY g.bucket
    """,
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct
    vocabulary vs cumulative token count at ten corpus prefixes (by
    doc_id decile) — the diagnostic that tells a tokenizer-training
    pipeline whether more data still buys vocabulary. Each term is
    attributed to its FIRST bucket (one groupBy, O(vocab) shuffle);
    the cumulative curve is a 10×10 non-equi self-join on the tiny
    per-bucket frame — no window, no single-partition exchange."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.llmops.text import tokens_col

    d = T(spark, sf_dir, "documents")
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    toks = (
        d.crossJoin(F.broadcast(mx))
        .select(
            (F.col("doc_id") * 10 / F.col("m")).cast("long").alias("bucket"),
            F.explode(tokens_col("text")).alias("term"),
        )
    )
    first_seen = toks.groupBy("term").agg(F.min("bucket").alias("fb"))
    per_bucket = first_seen.groupBy("fb").agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    tok_per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    grid = tok_per_bucket.select("bucket").distinct()
    joined = (
        grid.alias("g")
        .join(
            tok_per_bucket.alias("t"),
            F.col("t.bucket") <= F.col("g.bucket"),
        )
        .join(
            F.broadcast(per_bucket).alias("p"),
            F.col("p.fb") == F.col("t.bucket"),
            "left",
        )
    )
    return (
        joined.groupBy(F.col("g.bucket").alias("bucket"))
        .agg(
            F.sum("t.n_tokens").cast("long").alias("corpus_tokens"),
            F.sum(F.coalesce("p.new_terms", F.lit(0))).cast("long").alias(
                "vocab_size"
            ),
        )
        .orderBy("bucket")
    )


@_staged(
    "incremental_agg_maintenance_events",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           round(min(value), 2) AS min_v,
           round(max(value), 2) AS max_v,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def incremental_agg_maintenance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the January-February
    aggregate is the standing MV, March arrives as a delta batch, and
    the served result MERGES the two partial states (counts/sums add,
    min/max combine, distinct-users via the union of per-partition
    key sets — here re-aggregated from the two halves' key lists) —
    never rescanning history. The oracle recomputes from scratch over
    the full table: merged partial states must equal the full
    recompute, which is the algebraic property (commutative-monoid
    states) that makes the MV pattern sound at 100 TB."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.col("value"),
        (F.to_date("ts") < F.lit("2024-03-01").cast("date")).alias("is_base"),
    )

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.collect_set("user_id").alias("users"),
        )

    base = partial(ev.filter("is_base"))
    delta = partial(ev.filter(~F.col("is_base")))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.event_type") == F.col("d.event_type"), "full_outer")
    return merged.select(
        F.coalesce("b.event_type", "d.event_type").alias("event_type"),
        (
            F.coalesce("b.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))
        ).cast("long").alias("n"),
        (
            F.coalesce("b.cents", F.lit(0)) + F.coalesce("d.cents", F.lit(0))
        ).cast("long").alias("cents"),
        F.round(F.least(F.coalesce("b.min_v", "d.min_v"), F.coalesce("d.min_v", "b.min_v")), 2).alias("min_v"),
        F.round(F.greatest(F.coalesce("b.max_v", "d.max_v"), F.coalesce("d.max_v", "b.max_v")), 2).alias("max_v"),
        F.size(
            F.array_distinct(
                F.concat(
                    F.coalesce("b.users", F.array().cast("array<long>")),
                    F.coalesce("d.users", F.array().cast("array<long>")),
                )
            )
        ).cast("long").alias("n_users"),
    )


@_staged(
    "image_ahash_fingerprints",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(4 + doc_id % 13 AS INT) AS w,
             CAST(3 + doc_id % 7 AS INT) AS h
      FROM documents WHERE doc_id % 6 != 3
    ),
    g AS (
      SELECT doc_id, w, h, w * h AS npx,
             list_transform(range(0, w * h),
               p -> (doc_id * 31 + 3 * p) % 256
                    + (doc_id * 31 + 3 * p + 1) % 256
                    + (doc_id * 31 + 3 * p + 2) % 256) AS gs
      FROM base
    ),
    t AS (SELECT doc_id, w, h, npx, gs, list_sum(gs) AS tot FROM g)
    SELECT doc_id, w AS width, h AS height,
           CAST(list_sum(list_transform(
                  range(1, CAST(least(npx, 63) AS INT) + 1),
                  i -> CASE WHEN npx * gs[i] >= tot
                            THEN CAST(1 AS BIGINT) << (i - 1)
                            ELSE 0 END)) AS BIGINT) AS ahash
    FROM t
    """,
)
def image_ahash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash fingerprints over REAL decoded rasters
    (llmops/multimodal.py::image_ahash) — the multimodal-dedup
    primitive: each doc's deterministic RGB raster is encoded through
    one of FIVE lossless codecs rotated by doc_id % 6 (BMP, PNG zlib,
    GIF LZW, TIFF LZW+predictor, PPM — the JPEG lane is excluded as
    lossy-format grayscale), decoded back by the pure-Python codecs,
    grayscaled by integer channel sum, and thresholded against the
    raster mean into a 63-bit BIGINT hash. The oracle computes the
    hash CLOSED-FORM from the pixel formula — so a green row proves
    five different decode paths all reproduced the exact raster, and
    that the hash pipeline is integer-exact end to end."""
    from dbt_lakehouse_aws_spark.llmops.jpeg import encode_jpeg  # noqa: F401
    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_ppm,
        image_ahash,
    )
    from dbt_lakehouse_aws_spark.llmops.tiff import encode_tiff
    from dbt_lakehouse_aws_spark.standard_queries import T

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
    return image_ahash(payloads)


@_staged(
    "table_diff_orders",
    """
    WITH b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 31 = 0
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) + 100
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 53 = 0
    ),
    a AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    d AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
             coalesce(a.o_orderstatus, b.o_orderstatus) AS status,
             CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.cents = b.cents AND a.o_orderstatus = b.o_orderstatus
                       THEN 'unchanged'
                  ELSE 'changed' END AS diff_status
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT status AS o_orderstatus, diff_status,
           CAST(count(*) AS BIGINT) AS n
    FROM d GROUP BY 1, 2
    """,
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation diff (operators/relational.py::table_diff) —
    the migration/backfill validator: the 'after' table is a
    deterministic mutation of orders (keys % 97 removed, % 31 price-
    bumped one dollar, % 53 cloned to a new key range) and the diff
    must classify every key added/removed/changed/unchanged from ONE
    full-outer hash join. Counts by (status, class); money compared
    in integer cents, NULL-safe."""
    from dbt_lakehouse_aws_spark.operators.relational import table_diff
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = o.select("o_orderkey", "o_orderstatus", cents.alias("cents"))
    b = (
        a.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 31 == 0, F.col("cents") + 100)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .unionByName(
            a.filter(F.col("o_orderkey") % 53 == 0).select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                "o_orderstatus",
                "cents",
            )
        )
    )
    d = table_diff(a, b, keys=["o_orderkey"], compare_cols=["o_orderstatus", "cents"])
    status = F.coalesce("_a_o_orderstatus", "_b_o_orderstatus")
    return d.groupBy(
        status.alias("o_orderstatus"), "diff_status"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@_staged(
    "rolling_28d_active_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    obs AS (SELECT DISTINCT day FROM du),
    contrib AS (
      SELECT DISTINCT o.day AS target_day, du.user_id
      FROM du JOIN obs o
        ON o.day >= du.day AND o.day <= du.day + INTERVAL 27 DAY
    )
    SELECT target_day AS day,
           CAST(count(*) AS BIGINT) AS active_users_28d
    FROM contrib GROUP BY 1
    """,
)
def rolling_28d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling 28-day distinct active users per day — the
    metric sliding windows can't pre-aggregate (distinct doesn't
    sum). The scalable shape: each (day, user) activity row EXPLODES
    into the ≤28 target days it contributes to (a sequence projection,
    work = 28·|day-user pairs|, linear), then one distinct + count
    per target day — never a per-day rescan of 28 days of raw events,
    never an all-days cross join. Sketch variants (hll_user_rollup)
    trade exactness for merge-at-serve; this is the exact batch twin."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    obs = du.select("day").distinct()
    targets = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 27))
        ).alias("target_day"),
        "user_id",
    )
    contrib = (
        targets.join(F.broadcast(obs), targets.target_day == obs.day)
        .select("target_day", "user_id")
        .distinct()
    )
    return contrib.groupBy(F.col("target_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("active_users_28d")
    )


@_staged(
    "proximity_pairs_customers",
    """
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * 37) % 100000 AS x,
             (c_custkey * 91) % 100000 AS y
      FROM customer
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM pts a JOIN pts b ON a.id < b.id
      WHERE abs(a.x - b.x) <= 250 AND abs(a.y - b.y) <= 250
    )
    SELECT id_a, id_b, CAST(d2 AS BIGINT) AS dist_sq
    FROM pairs WHERE d2 <= 250 * 250
    """,
)
def proximity_pairs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial proximity join (operators/spatial.py::
    grid_proximity_pairs): customers get deterministic integer
    coordinates on a 100km grid, and the operator finds every pair
    within 250 units through a 3×3 grid-cell equi-join — 9·|A|
    replicated rows, never the all-pairs cross the naive formulation
    plans as BroadcastNestedLoopJoin. Distances are squared INTEGERS,
    so the oracle (which at sf0.01 scale can afford the quadratic
    bounding-box formulation) matches bit-for-bit — two different
    algorithms, one exact pair set."""
    from dbt_lakehouse_aws_spark.operators.spatial import grid_proximity_pairs
    from dbt_lakehouse_aws_spark.standard_queries import T

    c = T(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 37) % 100000).alias("x"),
        ((F.col("c_custkey") * 91) % 100000).alias("y"),
    )
    return grid_proximity_pairs(
        pts, id_col="id", x_col="x", y_col="y", radius=250
    )


@_staged(
    "stream_interval_join_equivalence",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(0 AS BIGINT) AS n_only_stream,
           CAST(0 AS BIGINT) AS n_only_batch
    FROM events c JOIN events v
      ON c.user_id = v.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND v.ts > c.ts AND v.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_interval_join_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream/batch equivalence #4: the watermarked STREAM-STREAM
    interval join (streaming/ingest.py::stream_interval_join — state
    bounded by the watermark + range predicate, O(window) not
    O(stream)) over one availableNow pass must produce exactly the
    batch banded range_join's pairs (clicks → views within 1 hour per
    user). The oracle pins the pair count and that both exceptAll
    directions are empty."""
    import uuid

    from dbt_lakehouse_aws_spark.operators.temporal import range_join
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.streaming.ingest import stream_interval_join

    # streaming sides
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks_s = raw.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("click_ts"),
    )
    views_s = raw.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("view_ts"),
    )
    joined = stream_interval_join(
        clicks_s,
        views_s,
        on="u",
        left_ts="click_ts",
        right_ts="view_ts",
        upper="1 hour",
        watermark="1 hour",
    ).select("click_id", "view_id")
    sink = f"sij_eq_{uuid.uuid4().hex[:12]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    stream_out = spark.table(sink)

    ev = T(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("click_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("view_ts"),
    )
    batch_out = range_join(
        c, v, ["u"], left_ts="click_ts", right_ts="view_ts", upper="1 hours"
    ).select("click_id", "view_id")
    only_s = stream_out.exceptAll(batch_out).count()
    only_b = batch_out.exceptAll(stream_out).count()
    n_pairs = batch_out.count()
    return spark.createDataFrame(
        [(n_pairs, only_s, only_b)],
        "n_pairs long, n_only_stream long, n_only_batch long",
    )


@_staged(
    "moments_by_priority",
    """
    WITH s AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n,
             sum(o_totalprice) AS s1,
             sum(o_totalprice * o_totalprice) AS s2,
             sum(o_totalprice * o_totalprice * o_totalprice) AS s3,
             sum(o_totalprice * o_totalprice * o_totalprice * o_totalprice) AS s4
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT priority, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS var_pop,
             s1, s2, s3, s4
      FROM s
    )
    SELECT priority, n,
           round(mu, 4) AS mean,
           round(sqrt(var_pop), 4) AS stddev_pop,
           round((s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu)
                 / (var_pop * sqrt(var_pop)), 6) AS skewness,
           round((s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
                  - 3 * mu * mu * mu * mu)
                 / (var_pop * var_pop) - 3.0, 6) AS excess_kurtosis
    FROM m
    """,
)
def moments_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution profiling per group — mean, σ,
    skewness, excess kurtosis — computed from RAW POWER SUMS
    (Σx, Σx², Σx³, Σx⁴): one map-side-combinable aggregate, mergeable
    across partitions/batches by construction (the same
    sufficient-statistic discipline as the regression and PCA
    operators). Built-in skewness/kurtosis are NOT used on purpose:
    engines disagree on bias correction (sample vs population), while
    the power-sum formulas are arithmetic both engines replay
    identically to rounding."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    s = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    var_pop = F.col("s2") / F.col("n") - mu * mu
    skew = (
        F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n"))
        + 2 * mu * mu * mu
    ) / (var_pop * F.sqrt(var_pop))
    kurt = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    ) / (var_pop * var_pop) - 3.0
    return s.select(
        "priority",
        "n",
        F.round(mu, 4).alias("mean"),
        F.round(F.sqrt(var_pop), 4).alias("stddev_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    )


@_staged(
    "survival_km_repurchase",
    """
    WITH purchases AS (
      SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS k
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT a.user_id,
             CAST(date_diff('day', CAST(a.ts AS DATE), CAST(b.ts AS DATE))
                  AS BIGINT) AS gap_days
      FROM purchases a JOIN purchases b
        ON b.user_id = a.user_id AND b.k = a.k + 1
      WHERE a.k = 1
    ),
    risk AS (
      SELECT gap_days AS t, CAST(count(*) AS BIGINT) AS d FROM gaps GROUP BY 1
    ),
    km AS (
      SELECT r.t, r.d,
             (SELECT sum(r2.d) FROM risk r2 WHERE r2.t >= r.t) AS n_at_risk
      FROM risk r
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
def survival_km_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-repurchase — the
    churn/retention estimator: per user, the gap between first and
    second purchase is an event time; S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)
    with nᵢ the at-risk count. The O(rows) work is two hash steps
    (per-user ranking, then the gap aggregate); the curve itself
    lives on the tiny distinct-gap frame (≤ calendar-days rows), so
    BOTH cumulative directions are computed with non-equi self-joins
    on that frame — no global ordered window, no single-partition
    exchange (the same device as the Heaps-law curve). S hits exactly
    0 once the last at-risk subject events (dᵢ = nᵢ); that term is
    handled by a zero-seen flag instead of ln(0), identically on both
    engines; all other factors go through exp(Σ ln(·)) in the same
    order, so 6-dp rounding is stable."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select("user_id", "ts", "event_id").withColumn(
        "k", F.row_number().over(w)
    )
    a = p.filter(F.col("k") == 1).select(
        "user_id", F.to_date("ts").alias("d1")
    )
    b = p.filter(F.col("k") == 2).select(
        "user_id", F.to_date("ts").alias("d2")
    )
    gaps = a.join(b, "user_id").select(
        F.datediff("d2", "d1").cast("long").alias("t")
    )
    risk = gaps.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("d"))
    r2 = risk.select(F.col("t").alias("t2"), F.col("d").alias("d2"))
    km = (
        risk.join(F.broadcast(r2), F.col("t2") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.sum("d2").alias("n_at_risk"))
    )
    k2 = km.select(
        F.col("t").alias("t2"),
        F.col("d").alias("d2"),
        F.col("n_at_risk").alias("n2"),
    )
    ln_term = F.when(
        F.col("n2") > F.col("d2"),
        F.log(1.0 - F.col("d2").cast("double") / F.col("n2")),
    ).otherwise(0.0)
    zero_flag = F.when(F.col("n2") == F.col("d2"), 1).otherwise(0)
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
    "session_paths_3step",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS k
      FROM events
    )
    SELECT a.event_type AS step1, b.event_type AS step2,
           c.event_type AS step3,
           CAST(count(*) AS BIGINT) AS n
    FROM seq a
    JOIN seq b ON b.user_id = a.user_id AND b.k = a.k + 1
    JOIN seq c ON c.user_id = a.user_id AND c.k = a.k + 2
    GROUP BY 1, 2, 3
    ORDER BY n DESC, step1, step2, step3
    LIMIT 25
    """,
)
def session_paths_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioral paths — the path-analysis extension of
    the first-order transition matrix (event_transition_matrix):
    per-user ordered event sequences, trigram paths counted via two
    LEADs inside one user-partitioned window (no self-joins in the
    engine — the oracle uses the equivalent rank self-join, a
    different formulation of the same relation)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step3").isNotNull())
    return (
        seq.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(25)
    )



@_staged(
    "k_anonymity_orders",
    """
    WITH qi AS (
      SELECT o_orderpriority AS priority,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             -- round() yields DECIMAL in DuckDB and // on DECIMAL is
             -- true division; floor the DOUBLE quotient explicitly
             CAST(floor(CAST(round(o_totalprice) AS DOUBLE) / 50000)
                  AS BIGINT) AS price_band,
             o_custkey
      FROM orders
    ),
    groups AS (
      SELECT priority, yr, price_band,
             CAST(count(*) AS BIGINT) AS group_size,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_sensitive
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k5,
           CAST(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           CAST(min(group_size) AS BIGINT) AS min_group_size,
           CAST(sum(CASE WHEN distinct_sensitive < 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS groups_below_l2
    FROM groups
    """,
)
def k_anonymity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate a
    training-data release pipeline runs before shipping: group rows
    by their quasi-identifier tuple (priority, order year, coarse
    price band) and report how many equivalence classes fall below
    k=5 (re-identification risk), how many rows sit in them, and how
    many classes lack l=2 distinct sensitive values (attribute
    disclosure). One hash aggregate over the QI tuple + one tiny
    rollup — O(groups) after the first shuffle at any scale."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    qi = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("long").alias("yr"),
        (F.round(F.col("o_totalprice")) / 50000).cast("long").alias("price_band"),
        "o_custkey",
    )
    groups = qi.groupBy("priority", "yr", "price_band").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("o_custkey").cast("long").alias("distinct_sensitive"),
    )
    below_k = F.when(F.col("group_size") < 5, 1).otherwise(0)
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(below_k).cast("long").alias("groups_below_k5"),
        F.sum(
            F.when(F.col("group_size") < 5, F.col("group_size")).otherwise(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("group_size").cast("long").alias("min_group_size"),
        F.sum(
            F.when(F.col("distinct_sensitive") < 2, 1).otherwise(0)
        ).cast("long").alias("groups_below_l2"),
    )


@_staged(
    "ks_drift_order_values",
    """
    WITH tagged AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END
               AS is_a
      FROM orders
    ),
    cells AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM tagged GROUP BY v
    ),
    tot AS (
      SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
      FROM cells
    ),
    cum AS (
      SELECT v, sum(na) OVER (ORDER BY v) AS ca,
             sum(nb) OVER (ORDER BY v) AS cb
      FROM cells
    )
    SELECT tot.ta AS n_before, tot.tb AS n_after,
           round(max(abs(CAST(cum.ca AS DOUBLE) / tot.ta
                         - CAST(cum.cb AS DOUBLE) / tot.tb)), 6) AS ks_stat
    FROM cum CROSS JOIN tot
    GROUP BY tot.ta, tot.tb
    """,
)
def ks_drift_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov drift statistic between
    pre-1997 and later order values — the nonparametric companion to
    the binned PSI row: D = max over observed values of
    |F̂_before − F̂_after|, from per-distinct-value counts + the
    SCALABLE prefix sum (operators/windows.py::prefix_sum — the same
    primitive under AUC/Gini; the oracle uses a plain windowed
    cumulative, a different plan computing the same exact rationals).
    Values are integer cents; each ECDF step is an exact integer
    ratio, so the max is order-independent."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    tagged = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(
            F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"),
            1,
        ).otherwise(0).alias("is_a"),
    )
    cells = tagged.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("na"),
        F.sum(1 - F.col("is_a")).cast("long").alias("nb"),
    )
    tot = cells.agg(
        F.sum("na").cast("long").alias("ta"), F.sum("nb").cast("long").alias("tb")
    )
    cum = prefix_sum(cells, [F.asc("v")], "na", name="ca")
    cum = prefix_sum(cum, [F.asc("v")], "nb", name="cb")
    d = F.abs(
        F.col("ca").cast("double") / F.col("ta")
        - F.col("cb").cast("double") / F.col("tb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("ta").alias("n_before"),
            F.first("tb").alias("n_after"),
            F.round(F.max(d), 6).alias("ks_stat"),
        )
    )


@_staged(
    "stream_append_exactly_once",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_after_replay,
           CAST(0 AS BIGINT) AS replay_added
    FROM events
    """,
)
def stream_append_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming APPEND under the driver gate: the
    events file streams into an ACID table through
    streaming/ingest.py::stream_append_into_acid (one atomic commit
    carrying BOTH the rows and the (app, batch) txn marker), then a
    crash-replay is SIMULATED by re-running the writer's own guard
    with the already-committed batch id — the txn watermark
    (sources/acid.py::last_txn_batch) must skip it. The oracle pins:
    table row count == source count after the first pass, unchanged
    after the replay, 0 rows added. Merge idempotency cannot give
    this for appends; the txn protocol is what makes the sink
    exactly-once."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.streaming.ingest import stream_append_into_acid

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    root = tempfile.mkdtemp(prefix=f"eo_{uuid.uuid4().hex[:8]}_")
    table_path = f"{root}/tbl"
    ckpt = f"{root}/ckpt"
    q = stream_append_into_acid(
        stream.select("event_id", "user_id", "event_type"),
        table_path=table_path,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(600)
    t = AcidTable(spark, table_path)
    n1 = t.read().count()

    # crash-replay: same app id (derived from the checkpoint), batch 0
    app_id = f"stream_append:{ckpt}"
    seen = t.last_txn_batch(app_id)
    replay = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    if not (seen is not None and 0 <= seen):  # the sink's own guard
        t.write(replay, mode="append", txn=(app_id, 0))
    n2 = t.read().count()
    return spark.createDataFrame(
        [(n1, n2, n2 - n1)],
        "n_rows long, n_after_replay long, replay_added long",
    )


def _ppr_oracle_sql(iters: int = 8, damping: float = 0.85) -> str:
    """Unrolled personalized-PageRank oracle — the pagerank fixpoint
    device with the teleport term concentrated on the seed set
    (users with ≥1 purchase): p(v) = 1/|seeds| on seeds, else 0;
    update = (1-d)·p(v) + d·Σ in-contributions. Same bipartite
    user↔event-type graph as pagerank_event_graph."""
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
      SELECT n.node,
             (1 - {damping}) * n.p + {damping} * coalesce(s._s, 0) AS rank
      FROM pnodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS _s
        FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.node
        GROUP BY e.dst
      ) s ON n.node = s.node)"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH fwd AS (
      SELECT DISTINCT concat('u:', user_id) AS src,
             concat('t:', event_type) AS dst
      FROM events
    ),
    edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
    seeds AS (
      SELECT DISTINCT concat('u:', user_id) AS node
      FROM events WHERE event_type = 'purchase'
    ),
    pnodes AS (
      SELECT n.node,
             CASE WHEN s.node IS NOT NULL
                  THEN 1.0 / (SELECT count(*) FROM seeds)
                  ELSE 0.0 END AS p
      FROM nodes n LEFT JOIN seeds s ON s.node = n.node
    ),
    r0 AS (SELECT node, p AS rank FROM pnodes),
    {chain}
    SELECT node, round(rank, 6) AS rank FROM {prev}
    """


@_staged("personalized_pagerank_buyers", _ppr_oracle_sql())
def personalized_pagerank_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded on purchasing users
    (operators/graph.py::personalized_pagerank) — random walk with
    restart over the bipartite user↔event-type graph, the
    "related to these entities" recommender scorer. Fixed 8
    iterations unroll into the chained-CTE oracle exactly like
    pagerank_event_graph; the teleport vector rides a broadcast join,
    adding no per-iteration shuffle."""
    from dbt_lakehouse_aws_spark.operators.graph import personalized_pagerank
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    fwd = ev.select(
        F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.concat(F.lit("u:"), F.col("user_id")).alias("node"))
        .distinct()
    )
    return personalized_pagerank(edges, seeds, iters=8).select(
        "node", F.round("rank", 6).alias("rank")
    )


@_staged(
    "training_matrix_pit",
    """
    WITH seq AS (
      SELECT event_id, user_id, ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             count(*) OVER w AS n_prior_events,
             coalesce(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
               AS prior_value_cents,
             min(ts) OVER w AS first_prior_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(n_prior_events AS BIGINT) AS n_prior_events,
           CAST(prior_value_cents AS BIGINT) AS prior_value_cents,
           CAST(date_diff('day', CAST(first_prior_ts AS DATE), CAST(ts AS DATE))
                AS BIGINT) AS days_active,
           cents AS label_cents
    FROM seq WHERE event_type = 'purchase'
    """,
)
def training_matrix_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free training-matrix assembly — the capstone a feature
    store exists for: one row per label event (purchases) carrying
    ONLY strictly-prior features (event count, spend, tenure), built
    with per-user windows whose frame ends at ``1 PRECEDING`` — the
    same-instant and future rows that cause target leakage are
    excluded by the frame itself, not by a fragile filter. All
    windows partition by user (bounded by events-per-user, no
    funnel); features are exact integers. The purged temporal split
    (temporal_split_purged_events) and group split (group_split_docs)
    are the companions downstream."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    seq = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        cents.alias("cents"),
        F.count(F.lit(1)).over(w).alias("n_prior_events"),
        F.coalesce(F.sum(cents).over(w), F.lit(0)).alias("prior_value_cents"),
        F.min("ts").over(w).alias("first_prior_ts"),
    )
    return seq.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("n_prior_events").cast("long").alias("n_prior_events"),
        F.col("prior_value_cents").cast("long").alias("prior_value_cents"),
        F.datediff(F.to_date("ts"), F.to_date("first_prior_ts"))
        .cast("long")
        .alias("days_active"),
        F.col("cents").alias("label_cents"),
    )


@_staged(
    "acid_asof_timestamp_events",
    """
    WITH a AS (
      SELECT count(*) AS n FROM events WHERE event_type != 'error'
    ),
    b AS (SELECT count(*) AS n FROM events)
    SELECT CAST(a.n AS BIGINT) AS n_at_t1,
           CAST(b.n AS BIGINT) AS n_at_t2,
           CAST(b.n - a.n AS BIGINT) AS n_appended
    FROM a CROSS JOIN b
    """,
)
def acid_asof_timestamp_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF-timestamp time travel under the driver gate
    (sources/acid.py::version_at/read(as_of=…)): commit the non-error
    events, capture a wall-clock instant, append the error events,
    then read the table AS OF that instant — it must see exactly the
    first commit's rows while the current read sees both. The commit
    timestamps live in the manifest log, so resolution is
    metadata-only; the oracle pins both counts and the delta."""
    import tempfile
    import time as _time
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events").select("event_id", "event_type")
    t = AcidTable(
        spark, tempfile.mkdtemp(prefix=f"asof_{uuid.uuid4().hex[:8]}_") + "/t"
    )
    t.write(ev.filter(F.col("event_type") != "error"))
    t1 = _time.time()
    _time.sleep(0.05)  # commit timestamps have wall-clock resolution
    t.write(ev.filter(F.col("event_type") == "error"), mode="append")

    n1 = t.read(as_of=t1).count()
    n2 = t.read().count()
    return spark.createDataFrame(
        [(n1, n2, n2 - n1)], "n_at_t1 long, n_at_t2 long, n_appended long"
    )


@_staged(
    "csv_quoted_roundtrip_parts",
    """
    WITH hostile AS (
      SELECT p_partkey,
             concat(p_name,
                    CASE p_partkey % 4
                      WHEN 0 THEN ', Inc.'
                      WHEN 1 THEN ' "quoted"'
                      WHEN 2 THEN concat(' multi', chr(10), 'line')
                      ELSE '' END) AS hostile_name,
             p_brand
      FROM part
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(hostile_name)) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN contains(hostile_name, chr(10))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline
    FROM hostile
    GROUP BY p_brand
    """,
)
def csv_quoted_roundtrip_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV roundtrip under HOSTILE field content — the quoting edge
    cases that corrupt naive ingest: embedded delimiters, embedded
    double quotes (RFC 4180 doubling), and embedded NEWLINES
    (requires multiLine parsing on the read side). A deterministic
    mutation plants each hazard by key; the table is written with
    Spark's distributed CSV writer and read back with
    ``multiLine=true`` + explicit schema, and the aggregate over the
    read-back copy must match the oracle computed over the mutated
    SOURCE — any quoting loss shifts lengths/counts. Completes the
    ingest-roundtrip family (ORC, bz2 JSONL, fixed-width, Avro)."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part")
    hostile = p.select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.when(F.col("p_partkey") % 4 == 0, F.lit(", Inc."))
            .when(F.col("p_partkey") % 4 == 1, F.lit(' "quoted"'))
            .when(
                F.col("p_partkey") % 4 == 2,
                F.concat(F.lit(" multi"), F.lit("\n"), F.lit("line")),
            )
            .otherwise(F.lit("")),
        ).alias("hostile_name"),
        "p_brand",
    )
    root = tempfile.mkdtemp(prefix=f"csvq_{uuid.uuid4().hex[:8]}_") + "/parts"
    hostile.write.mode("overwrite").option("header", "true").csv(root)
    back = (
        spark.read.schema("p_partkey long, hostile_name string, p_brand string")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(root)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("hostile_name")).cast("long").alias("total_chars"),
        F.sum(
            F.when(F.col("hostile_name").contains("\n"), 1).otherwise(0)
        ).cast("long").alias("n_multiline"),
    )


@_staged(
    "contamination_check_docs",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, doc_id % 17 = 0 AS bench,
             unnest(list_transform(range(1, len(ts) - 3),
                                   i -> array_to_string(list_slice(ts, i, i + 4), ' '))) AS g
      FROM toks WHERE len(ts) >= 5
    ), bg AS (
      SELECT DISTINCT g FROM sh WHERE bench
    ), tr AS (
      SELECT doc_id, g FROM sh WHERE NOT bench
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS total_grams
      FROM tr GROUP BY 1
    ), hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS hit_grams
      FROM tr JOIN bg USING (g) GROUP BY 1
    )
    SELECT h.doc_id, hit_grams, total_grams,
           round(CAST(hit_grams AS DOUBLE) / total_grams, 6) AS contamination
    FROM hits h JOIN sizes s USING (doc_id)
    """,
)
def contamination_check_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (llmops/corpus.py::
    contamination_check): docs with ``doc_id % 17 == 0`` stand in for
    the benchmark suite; 5-word grams are the overlap unit (the
    short-doc analogue of GPT-3's 13-gram rule). The benchmark gram
    set is broadcast — the corpus side never shuffles on gram."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.llmops.corpus import contamination_check

    d = T(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 17 == 0)
    train = d.filter(F.col("doc_id") % 17 != 0)
    return contamination_check(train, bench, n=5)


@_staged(
    "holt_forecast_daily_events",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT key, day, x, n,
             CAST(row_number() OVER (PARTITION BY key ORDER BY day)
                  AS BIGINT) AS i
      FROM daily
    ),
    rec(key, i, l, b) AS (
      SELECT key, i, x, CAST(0.0 AS DOUBLE) FROM seq WHERE i = 1
      UNION ALL
      SELECT r.key, r.i + 1,
             0.5 * q.x + 0.5 * (r.l + r.b),
             0.3 * ((0.5 * q.x + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
      FROM rec r JOIN seq q ON q.key = r.key AND q.i = r.i + 1
    )
    SELECT q.key AS event_type, q.day, q.n,
           floor(r.l * 1e6 + 0.5) / 1e6 AS level,
           floor(r.b * 1e6 + 0.5) / 1e6 AS trend,
           floor((r.l + r.b) * 1e6 + 0.5) / 1e6 AS forecast
    FROM rec r JOIN seq q ON q.key = r.key AND q.i = r.i
    """,
)
def holt_forecast_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential level+trend smoothing over per-type
    daily counts (operators/temporal.py::holt_linear_smooth) — the
    coupled two-state recursion no window function expresses; engine
    folds it per key in Arrow applyInPandas over the pre-aggregated
    daily series, oracle replays the identical op order as a
    recursive CTE (literal smoothing constants on both sides —
    1.0−0.3 == 0.7 bitwise, asserted in the operator's test)."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.operators.temporal import holt_linear_smooth

    ev = T(spark, sf_dir, "events")
    out = holt_linear_smooth(ev, key_col="event_type", ts_col="ts")

    # floor-based half-up rounding: floor/×/+ are all exact-or-IEEE
    # identical in Spark and DuckDB, unlike round(double, d), whose
    # decimal-vs-binary tie handling differs at half-way points
    # (66.1600125 rounded 13 vs 12 at sf0.01 — the motivating case).
    def r6(c: str):
        return (F.floor(F.col(c) * 1e6 + F.lit(0.5)) / 1e6).alias(c)

    return out.select(
        F.col("key").alias("event_type"),
        "day",
        "n",
        r6("level"),
        r6("trend"),
        r6("forecast"),
    )


@_staged(
    "acf_daily_events",
    """
    WITH daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day, count(*) AS x
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.key, l.lag, a.x, b.x AS y
      FROM daily a
      CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      JOIN daily b ON b.key = a.key AND b.day = a.day - CAST(l.lag AS INTEGER)
    ),
    stats AS (
      SELECT key, CAST(lag AS BIGINT) AS lag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT key AS event_type, lag, CAST(n AS BIGINT) AS n_pairs,
           (n * sxy - sx * sy)
             / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0)
             AS acf
    FROM stats
    """,
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-lag autocorrelation (lags 1..7) of per-type daily
    event counts (operators/temporal.py::acf_daily). Pearson r from
    exact integer sufficient stats — bit-deterministic across
    engines and partitionings, so the double result needs no
    rounding at all."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.operators.temporal import acf_daily

    ev = T(spark, sf_dir, "events")
    out = acf_daily(ev, key_col="event_type", ts_col="ts", max_lag=7)
    return out.select(F.col("key").alias("event_type"), "lag", "n_pairs", "acf")


@_staged(
    "log_odds_terms_en",
    """
    WITH toks AS (
      SELECT lang = 'en' AS a, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    counts AS (
      SELECT term,
             CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ya,
             CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS yb
      FROM toks GROUP BY 1
    ),
    totals AS (
      SELECT CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb
      FROM toks
    ),
    scored AS (
      SELECT term, ya, yb,
             (ln((CAST(ya AS DOUBLE) + 50.0 * ((CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))
                 / (CAST(na AS DOUBLE) + 50.0 - CAST(ya AS DOUBLE) - 50.0 * ((CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))))
              - ln((CAST(yb AS DOUBLE) + 50.0 * ((CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))
                 / (CAST(nb AS DOUBLE) + 50.0 - CAST(yb AS DOUBLE) - 50.0 * ((CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))))
             / sqrt(1.0 / (CAST(ya AS DOUBLE) + 50.0 * ((CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))
                  + 1.0 / (CAST(yb AS DOUBLE) + 50.0 * ((CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))))
             AS z_score
      FROM counts CROSS JOIN totals
      WHERE ya + yb >= 5
    )
    SELECT term, ya AS count_a, yb AS count_b, z_score
    FROM scored
    ORDER BY z_score DESC, term ASC
    LIMIT 20
    """,
)
def log_odds_terms_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe-et-al Dirichlet-prior log-odds: terms most associated
    with English docs vs the rest (llmops/text.py::
    dirichlet_log_odds). Integer counts -> fixed-order double
    arithmetic: bit-reproducible, stable top-20 cut."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.llmops.text import dirichlet_log_odds

    d = T(spark, sf_dir, "documents")
    return dirichlet_log_odds(d, F.col("lang") == "en", min_count=5, alpha0=50.0, k=20)


@_staged(
    "calibration_brier_orders",
    """
    WITH scored AS (
      SELECT CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                  THEN 1 ELSE 0 END AS y,
             0.5 * (((o_totalprice - 250000.0) / 100000.0)
                    / (1.0 + abs((o_totalprice - 250000.0) / 100000.0)))
               + 0.5 AS p
      FROM orders
    ),
    q AS (
      SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
             CAST(floor(p * 1000 + 0.5) AS BIGINT) AS pm,
             CAST(y AS BIGINT) AS y
      FROM scored
    ),
    per_bin AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pm) AS BIGINT) AS spm,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum((pm - y * 1000) * (pm - y * 1000)) AS BIGINT) AS ssq
      FROM q GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(ssq) AS BIGINT) AS tsq
      FROM per_bin
    )
    SELECT bin, n,
           CAST(spm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0) AS avg_pred,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
           CAST(tsq AS DOUBLE) / (CAST(tn AS DOUBLE) * 1000000.0) AS brier
    FROM per_bin CROSS JOIN tot
    ORDER BY bin
    """,
)
def calibration_brier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Brier score (llmops/evalmetrics.py::
    calibration_bins) for a frozen softsign-link scorer of order
    priority from order value. The link is ALGEBRAIC (+,*,/,abs
    only) — a logistic exp() would be libm-dependent and could flip
    the milli-quantization at the last ulp between engines."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.llmops.evalmetrics import calibration_bins

    o = T(spark, sf_dir, "orders")
    z = (F.col("o_totalprice") - 250000.0) / 100000.0
    scored = o.select(
        (
            F.when(
                F.col("o_orderpriority").like("1-%")
                | F.col("o_orderpriority").like("2-%"),
                1,
            ).otherwise(0)
        ).alias("y"),
        (0.5 * (z / (1.0 + F.abs(z))) + 0.5).alias("p"),
    )
    return calibration_bins(scored, p_col="p", label_col="y", n_bins=10)


@_staged(
    "dbscan_customer_blobs",
    """
    WITH RECURSIVE pts AS (
      SELECT id, h1, (h1 * 48271) % 2147483647 AS h2
      FROM (
        SELECT c_custkey AS id,
               ((c_custkey % 2147483647) * 506952114) % 2147483647 AS h1
        FROM customer WHERE c_custkey % 3 = 0
      )
    ),
    xy AS (
      SELECT id,
        CASE WHEN id % 31 = 0 THEN h1 % 100000
             ELSE (id % 5) * 10000 + h1 % 800 END AS x,
        CASE WHEN id % 31 = 0 THEN h2 % 100000
             ELSE (id % 5) * 10000 + h2 % 800 END AS y
      FROM pts
    ),
    pairs AS (
      SELECT a.id AS ia, b.id AS ib
      FROM xy a JOIN xy b ON a.id < b.id
      WHERE abs(a.x - b.x) <= 250 AND abs(a.y - b.y) <= 250
        AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 62500
    ),
    sym AS (
      SELECT ia AS id, ib AS nbr FROM pairs
      UNION ALL
      SELECT ib AS id, ia AS nbr FROM pairs
    ),
    core AS (
      SELECT id FROM (SELECT id, count(*) AS c FROM sym GROUP BY 1)
      WHERE c + 1 >= 3
    ),
    ce AS (
      SELECT s.id, s.nbr FROM sym s
      JOIN core a ON a.id = s.id JOIN core b ON b.id = s.nbr
    ),
    reach(node, lbl) AS (
      SELECT id, id FROM core
      UNION
      SELECT e.id, r.lbl FROM ce e JOIN reach r ON r.node = e.nbr
    ),
    clusters AS (
      SELECT node AS id, CAST(min(lbl) AS BIGINT) AS cluster
      FROM reach GROUP BY 1
    ),
    adopt AS (
      SELECT s.id, CAST(min(c.cluster) AS BIGINT) AS adopted
      FROM sym s JOIN clusters c ON c.id = s.nbr GROUP BY s.id
    )
    SELECT p.id,
           CASE WHEN c.cluster IS NOT NULL THEN 'core'
                WHEN a.adopted IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           coalesce(c.cluster, a.adopted) AS cluster
    FROM xy p
    LEFT JOIN clusters c ON c.id = p.id
    LEFT JOIN adopt a ON a.id = p.id
    """,
)
def dbscan_customer_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (operators/spatial.py::dbscan_labels) over planted
    customer blobs (every 3rd customer): 5 hash-jittered 800-unit
    blobs 10k apart plus 1-in-31 far-scattered noise; eps=250,
    minPts=3 — tuned so blob graphs stay ~4 hops in diameter (the
    min-label round count) at bench scale. Engine clusters
    via grid pairs + min-label components; the oracle replays the
    SAME min-reachable-core-id labels through a recursive-CTE
    transitive closure — two algorithms, one exact labeling
    (the part_hierarchy_rollup / dedup_keep_best playbook)."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.llmops.corpus import portable_hash
    from dbt_lakehouse_aws_spark.operators.spatial import dbscan_labels

    M = 2_147_483_647
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    h1 = portable_hash(F.col("c_custkey"))
    h2 = (h1 * 48271) % M
    scattered = F.col("c_custkey") % 31 == 0
    xy = c.select(
        F.col("c_custkey").alias("id"),
        F.when(scattered, h1 % 100000)
        .otherwise((F.col("c_custkey") % 5) * 10000 + h1 % 800)
        .alias("x"),
        F.when(scattered, h2 % 100000)
        .otherwise((F.col("c_custkey") % 5) * 10000 + h2 % 800)
        .alias("y"),
    )
    return dbscan_labels(
        xy, id_col="id", x_col="x", y_col="y", eps=250, min_pts=3
    )


@_staged(
    "theil_sen_trend_events",
    """
    WITH daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day, count(*) AS x
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.key,
             CAST(b.x - a.x AS DOUBLE)
               / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS s
      FROM daily a JOIN daily b ON a.key = b.key AND b.day > a.day
    ),
    nd AS (
      SELECT key, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
    )
    SELECT s.key AS event_type, nd.n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(quantile_cont(s.s, 0.5) AS DOUBLE) AS slope_per_day
    FROM slopes s JOIN nd ON nd.key = s.key
    GROUP BY s.key, nd.n_days
    """,
)
def theil_sen_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily trend per event type
    (operators/temporal.py::theil_sen_daily_trend): median of
    pairwise slopes over the tiny aggregated series; exact
    interpolated median on both sides, no rounding needed."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.operators.temporal import theil_sen_daily_trend

    ev = T(spark, sf_dir, "events")
    out = theil_sen_daily_trend(ev, key_col="event_type", ts_col="ts")
    return out.select(
        F.col("key").alias("event_type"), "n_days", "n_pairs", "slope_per_day"
    )


@_staged(
    "cube_events_type_weekday",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(isodow(CAST(ts AS DATE)) AS BIGINT), -1) AS weekday,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(grouping(event_type) * 2 + grouping(isodow(CAST(ts AS DATE)))
                AS BIGINT) AS gid
    FROM events
    GROUP BY CUBE (event_type, isodow(CAST(ts AS DATE)))
    """,
)
def cube_events_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, ISO weekday): all four grouping
    sets in ONE pass — Spark expands the cube map-side and
    aggregates each set partially before the single shuffle (vs four
    separate scans of the fact table). grouping_id() disambiguates
    coalesced NULLs from real values, mirrored to DuckDB's
    grouping() bits. Completes the multidimensional-aggregate family
    next to a12's ROLLUP."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    wd = F.dayofweek(F.to_date("ts"))  # Sun=1..Sat=7
    iso = F.when(wd == 1, 7).otherwise(wd - 1).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select(F.col("event_type"), iso.alias("_wd"), cents.alias("_c"))
        .cube("event_type", "_wd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_c").cast("long").alias("cents"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("_wd"), F.lit(-1)).cast("long").alias("weekday"),
            "n",
            "cents",
            "gid",
        )
    )


@_staged(
    "ohlc_daily_events",
    """
    WITH v AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents,
             ts, event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, day, cents,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM v
    )
    SELECT event_type, day,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT) AS volume
    FROM ranked
    GROUP BY event_type, day
    """,
)
def ohlc_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks per event type — the time-series
    rollup every market/metrics store ships. ONE shuffle on
    (type, day): both row_number windows share the partitioning with
    the final aggregate, so open/close (first/last by (ts, event_id)
    — a total order, deterministic under duplicate timestamps),
    high/low, and volume come out of a single exchange. Integer
    cents throughout."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = v.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close_cents"),
        F.count(F.lit(1)).cast("long").alias("volume"),
    )


@_staged(
    "twap_user_values",
    """
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(date_diff('second', ts,
                  lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) AS BIGINT) AS dur_s
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dur_s) AS BIGINT) AS held_seconds,
           CAST(sum(cents * dur_s) AS DOUBLE)
             / CAST(sum(dur_s) AS DOUBLE) / 100.0 AS twap
    FROM seg WHERE dur_s IS NOT NULL
    GROUP BY user_id
    ORDER BY twap DESC, user_id ASC
    LIMIT 50
    """,
)
def twap_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's
    value is "held" until the user's next event; the average weights
    by holding duration, not by tick count — the financial-data
    staple a plain avg() silently gets wrong on irregular series.
    One window shuffle on user_id (lead over (ts, event_id) — a
    total order); products are BIGINT cents × BIGINT seconds, so the
    sums are exact and the final division is one fixed-order double
    op per user."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
        ).cast("long").alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("dur_s").cast("long").alias("held_seconds"),
            (
                F.sum(F.col("cents") * F.col("dur_s")).cast("double")
                / F.sum("dur_s").cast("double")
                / 100.0
            ).alias("twap"),
        )
        .orderBy(F.desc("twap"), F.asc("user_id"))
        .limit(50)
    )


@_staged(
    "js_divergence_sources",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    src_counts AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    gl AS (
      SELECT term, CAST(sum(c) AS BIGINT) AS g FROM src_counts GROUP BY 1
    ),
    ns AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM src_counts GROUP BY 1
    ),
    ng AS (SELECT CAST(sum(g) AS BIGINT) AS ng FROM gl),
    shared AS (
      SELECT s.source,
             CAST(sum(CAST(floor(
               (0.5 * (CAST(s.c AS DOUBLE) / ns.n)
                     * ln((CAST(s.c AS DOUBLE) / ns.n)
                          / (0.5 * ((CAST(s.c AS DOUBLE) / ns.n)
                                    + (CAST(g.g AS DOUBLE) / ng.ng))))
              + 0.5 * (CAST(g.g AS DOUBLE) / ng.ng)
                     * ln((CAST(g.g AS DOUBLE) / ng.ng)
                          / (0.5 * ((CAST(s.c AS DOUBLE) / ns.n)
                                    + (CAST(g.g AS DOUBLE) / ng.ng))))) * 1e12
               + 0.5) AS BIGINT)) AS BIGINT) AS pico
      FROM src_counts s
      JOIN ns ON ns.source = s.source
      JOIN gl g ON g.term = s.term
      CROSS JOIN ng
      GROUP BY s.source
    ),
    qonly AS (
      SELECT ns.source,
             CAST(sum(CASE WHEN s.c IS NULL THEN
               CAST(floor(0.5 * (CAST(g.g AS DOUBLE) / ng.ng)
                          * ln((CAST(g.g AS DOUBLE) / ng.ng)
                               / (0.5 * (CAST(g.g AS DOUBLE) / ng.ng))) * 1e12
                          + 0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS pico
      FROM gl g
      CROSS JOIN ng
      CROSS JOIN ns
      LEFT JOIN src_counts s ON s.term = g.term AND s.source = ns.source
      GROUP BY ns.source
    )
    SELECT s.source,
           CAST(s.pico + coalesce(o.pico, 0) AS DOUBLE) / 1e12 AS js_divergence
    FROM shared s LEFT JOIN qonly o ON o.source = s.source
    ORDER BY s.source
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's token distribution
    from the corpus-wide distribution — the bounded, symmetric drift
    score for corpus-mixing dashboards (KL is infinite on unseen
    terms; JS never is). P-support terms contribute both KL halves in
    one pass over the per-(source, term) counts; terms a source has
    NEVER seen (p=0) still owe the Q half ``0.5·q·ln 2`` —
    accumulated from the source×vocab grid minus observed cells
    (vocab is the small side, broadcast). Each term's contribution is
    a fixed-order double expression QUANTIZED to integer picounits
    before the sum, so the aggregate is an exact BIGINT and immune to
    summation-order drift in either engine."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.llmops.text import tokens_col

    d = T(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens_col("text")).alias("term"))
    src_counts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    gl = src_counts.groupBy("term").agg(F.sum("c").alias("g"))
    ns = src_counts.groupBy("source").agg(F.sum("c").alias("n"))
    ng = gl.agg(F.sum("g").alias("ng"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("g").cast("double") / F.col("ng")
    contrib = 0.5 * p * F.log(p / (0.5 * (p + q))) + 0.5 * q * F.log(
        q / (0.5 * (p + q))
    )
    shared = (
        src_counts.join(ns, "source")
        .join(gl, "term")
        .crossJoin(F.broadcast(ng))
        .groupBy("source")
        .agg(
            F.sum(F.floor(contrib * 1e12 + F.lit(0.5)).cast("long")).alias(
                "pico"
            )
        )
    )
    q_extra = F.floor(
        0.5 * q * F.log(q / (0.5 * q)) * 1e12 + F.lit(0.5)
    ).cast("long")
    qonly = (
        ns.crossJoin(F.broadcast(gl))
        .crossJoin(F.broadcast(ng))
        .join(src_counts, ["source", "term"], "left")
        .filter(F.col("c").isNull())
        .groupBy("source")
        .agg(F.sum(q_extra).alias("pico"))
    )
    return (
        shared.alias("s")
        .join(qonly.alias("o"), "source", "left")
        .select(
            "source",
            (
                (
                    F.col("s.pico")
                    + F.coalesce(F.col("o.pico"), F.lit(0))
                ).cast("double")
                / 1e12
            ).alias("js_divergence"),
        )
        .orderBy("source")
    )


@_staged(
    "hits_part_authorities",
    """
    WITH e AS (
      SELECT DISTINCT o_custkey AS h, l_partkey AS a
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    a1 AS (SELECT a, CAST(count(*) AS BIGINT) AS s FROM e GROUP BY 1),
    h1 AS (
      SELECT e.h, CAST(sum(a1.s) AS BIGINT) AS s
      FROM e JOIN a1 ON a1.a = e.a GROUP BY 1
    ),
    a2 AS (
      SELECT e.a, CAST(sum(h1.s) AS BIGINT) AS s
      FROM e JOIN h1 ON h1.h = e.h GROUP BY 1
    )
    SELECT a AS part, s AS score FROM a2
    ORDER BY score DESC, part ASC LIMIT 20
    """,
)
def hits_part_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS authorities on the bipartite customer→part purchase
    graph (operators/graph.py::hits_path_counts): two unnormalized
    double-steps in exact BIGINT path counts — ranking-identical to
    normalized HITS at the same depth, immune to double-summation
    order, and the oracle unrolls the same two steps as plain SQL
    aggregates. Top-20 parts by depth-2 authority."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.operators.graph import hits_path_counts

    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    e = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth"))
        .distinct()
    )
    return (
        hits_path_counts(e, hub="hub", auth="auth", steps=2)
        .select(F.col("a").alias("part"), "score")
        .orderBy(F.desc("score"), F.asc("part"))
        .limit(20)
    )


@_staged(
    "join_skew_advisor_events",
    """
    WITH kc AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           CAST(min(CASE WHEN c = mx THEN user_id END) AS BIGINT) AS hottest_key,
           CAST(sum(c) AS DOUBLE) / count(*) AS avg_key_rows,
           CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99_key_rows,
           CAST(ceil(CAST(max(c) AS DOUBLE)
                     / (CAST(sum(c) AS DOUBLE) / 200.0)) AS BIGINT)
             AS salt_factor
    FROM (SELECT *, max(c) OVER (PARTITION BY event_type) AS mx FROM kc)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def join_skew_advisor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew advisor: per join key-space (event_type), the
    key-frequency profile a planner needs BEFORE a big shuffle —
    row/key counts, the hottest key, p99 key weight, and the salt
    factor that would level the hottest key across the driver's 200
    shuffle partitions (ceil(max_key / (rows/200)) — the parameter
    operators/skew.py::salted_join takes). One map-side-combinable
    groupBy; the hottest-key argmax rides the same shuffle as a
    window max, no second scan."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    kc = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = Window.partitionBy("event_type")
    kcm = kc.withColumn("mx", F.max("c").over(mx))
    return (
        kcm.groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_rows"),
            F.min(F.when(F.col("c") == F.col("mx"), F.col("user_id")))
            .cast("long")
            .alias("hottest_key"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias(
                "avg_key_rows"
            ),
            F.expr("percentile(c, 0.99)").alias("p99_key_rows"),
            F.ceil(
                F.max("c").cast("double")
                / (F.sum("c").cast("double") / 200.0)
            )
            .cast("long")
            .alias("salt_factor"),
        )
        .orderBy("event_type")
    )


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peeling oracle (the unrolled-fixpoint device):
    round i computes degrees of nbr{i}, keeps nodes with ≥ k, and
    restricts the symmetric neighbor list to kept endpoints."""
    parts = [
        """nbr0 AS (
      SELECT a AS node, b AS nbr FROM edges
      UNION ALL SELECT b, a FROM edges
    )"""
    ]
    for i in range(rounds):
        parts.append(
            f"""keep{i} AS (
      SELECT node FROM (
        SELECT node, count(*) AS d FROM nbr{i} GROUP BY node
      ) WHERE d >= {k}
    ),
    nbr{i + 1} AS (
      SELECT n.node, n.nbr FROM nbr{i} n
      JOIN keep{i} x ON x.node = n.node
      JOIN keep{i} y ON y.node = n.nbr
    )"""
        )
    return ",\n    ".join(parts)


@_staged(
    "kcore_users_events",
    f"""
    WITH {{edges}},
    {_kcore_oracle_sql(2, 4)}
    SELECT node AS user_id, CAST(count(*) AS BIGINT) AS degree
    FROM nbr4 GROUP BY node
    ORDER BY degree DESC, user_id ASC
    """.replace("{edges}", "PLACEHOLDER"),
)
def kcore_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the shared≥3 user co-activity graph via 4 bounded
    peeling rounds (operators/graph.py::kcore_fixed_rounds) — the
    standard community-density filter (degree-1 tendrils peel away
    shell by shell); the oracle unrolls the identical 4 synchronous
    rounds in SQL."""
    from dbt_lakehouse_aws_spark.queries_r5 import _coactivity_edges
    from dbt_lakehouse_aws_spark.operators.graph import kcore_fixed_rounds

    edges = _coactivity_edges(spark, sf_dir, min_shared=3)
    out = kcore_fixed_rounds(edges, src="a", dst="b", k=2, rounds=4)
    return out.select(F.col("node").alias("user_id"), "degree").orderBy(
        F.desc("degree"), F.asc("user_id")
    )


from dbt_lakehouse_aws_spark.queries_r5 import _coactivity_edges_sql  # noqa: E402

STAGED_ORACLES["kcore_users_events"] = STAGED_ORACLES[
    "kcore_users_events"
].replace("PLACEHOLDER", _coactivity_edges_sql(3).strip().rstrip())


@_staged(
    "array_hof_embedding_stats",
    """
    WITH per AS (
      SELECT label,
             CAST(list_sum(list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e6
                                    + 0.5) AS BIGINT))) AS BIGINT) AS sq_micro,
             list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) AS max_abs,
             CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(sq_micro) AS BIGINT) AS sum_sq_micro,
           CAST(sum(n_pos) AS BIGINT) AS total_pos,
           floor(max(max_abs) * 1e6 + 0.5) / 1e6 AS max_abs_elem
    FROM per GROUP BY label ORDER BY label
    """,
)
def array_hof_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function gauntlet over the embedding
    column: per-vector fold (aggregate), transform, filter, and
    array_max — all inside codegen, no explode, no Python. Element
    squares are quantized to integer microunits INSIDE the fold so
    every cross-row aggregate is an exact BIGINT (float32 inputs are
    cast to double before multiplying in BOTH engines — a float
    multiply would round differently)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    sq_micro = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(xd(x) * xd(x) * 1e6 + F.lit(0.5)).cast("long"),
    )
    max_abs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(xd(x))))
    n_pos = F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long")
    per = e.select(
        F.col("label").cast("long").alias("label"),
        sq_micro.alias("sq_micro"),
        max_abs.alias("max_abs"),
        n_pos.alias("n_pos"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("sq_micro").cast("long").alias("sum_sq_micro"),
            F.sum("n_pos").cast("long").alias("total_pos"),
            (F.floor(F.max("max_abs") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "max_abs_elem"
            ),
        )
        .orderBy("label")
    )


@_staged(
    "json_typed_props_events",
    """
    WITH parsed AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(k) AS BIGINT) AS n_parsed,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(count(DISTINCT k // 25) AS BIGINT) AS n_k_bands
    FROM parsed GROUP BY event_type ORDER BY event_type
    """,
)
def json_typed_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON-path extraction (from_json with an explicit schema
    — the codegen JSON reader, vs f_json_props' portable regex):
    parse rate, range, and 25-wide band cardinality of the numeric
    payload per event type. Banding uses integer floor-division,
    identical in both engines on non-negative ints."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("k").cast("long").alias("n_parsed"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.countDistinct(F.floor(F.col("k") / 25)).cast("long").alias(
                "n_k_bands"
            ),
        )
        .orderBy("event_type")
    )


@_staged(
    "xml_roundtrip_parts",
    """
    WITH hostile AS (
      SELECT p_partkey,
             concat(p_name,
                    CASE p_partkey % 5
                      WHEN 0 THEN ' & <sons>'
                      WHEN 1 THEN ' "mixed" ''quotes'''
                      WHEN 2 THEN ' ]]> cdata-end'
                      WHEN 3 THEN ' a<b&c'
                      ELSE '' END) AS hostile_name,
             p_brand
      FROM part
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(hostile_name)) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN contains(hostile_name, '&')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_amp,
           CAST(sum(CASE WHEN contains(hostile_name, '<')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lt
    FROM hostile
    GROUP BY p_brand
    """,
)
def xml_roundtrip_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML roundtrip under ENTITY-HOSTILE field content — Spark 4's
    built-in XML source (the spark-xml package folded into core)
    writing and re-reading strings that require entity escaping:
    ``&``, ``<``/``>``, mixed quote characters, and a literal
    ``]]>`` CDATA terminator. A deterministic mutation plants each
    hazard by key; the table is written with the distributed XML
    writer (one file per partition, ``rowTag`` framing) and read
    back with an explicit schema, and the aggregate over the
    read-back copy must match the oracle computed over the mutated
    SOURCE — any escaping loss shifts lengths or hazard counts.
    Completes the ingest-roundtrip family (CSV-quoted, ORC, bz2
    JSONL, fixed-width, Avro)."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part")
    hostile = p.select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.when(F.col("p_partkey") % 5 == 0, F.lit(" & <sons>"))
            .when(F.col("p_partkey") % 5 == 1, F.lit(' "mixed" \'quotes\''))
            .when(F.col("p_partkey") % 5 == 2, F.lit(" ]]> cdata-end"))
            .when(F.col("p_partkey") % 5 == 3, F.lit(" a<b&c"))
            .otherwise(F.lit("")),
        ).alias("hostile_name"),
        "p_brand",
    )
    root = tempfile.mkdtemp(prefix=f"xmlrt_{uuid.uuid4().hex[:8]}_") + "/parts"
    hostile.write.mode("overwrite").format("xml").option("rowTag", "part").save(
        root
    )
    back = (
        spark.read.schema("p_partkey long, hostile_name string, p_brand string")
        .format("xml")
        .option("rowTag", "part")
        .load(root)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("hostile_name")).cast("long").alias("total_chars"),
        F.sum(
            F.when(F.col("hostile_name").contains("&"), 1).otherwise(0)
        ).cast("long").alias("n_amp"),
        F.sum(
            F.when(F.col("hostile_name").contains("<"), 1).otherwise(0)
        ).cast("long").alias("n_lt"),
    )


@_staged(
    "bloom_semi_join_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 5000
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi-join (operators/bloomjoin.py): orders placed
    by high-balance AUTOMOBILE customers, with the fact side
    pre-filtered by a broadcast 128 KiB Bloom bitmap BEFORE its
    shuffle — the scalable shape when the dim keyset is too large to
    broadcast exactly but its bitmap is constant-size. The trailing
    exact semi-join removes false positives, so the result is
    bit-identical to the plain semi-join the oracle runs; the
    unit test pins no-false-negatives and the <1% fp bound."""
    from dbt_lakehouse_aws_spark.operators.bloomjoin import bloom_semi_join
    from dbt_lakehouse_aws_spark.standard_queries import T

    orders = T(spark, sf_dir, "orders")
    small = (
        T(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == "AUTOMOBILE")
            & (F.col("c_acctbal") > 5000)
        )
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return (
        bloom_semi_join(orders, small, "o_custkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "prefix_jaccard_pairs_docs",
    """
    WITH toks AS (
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
    )
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i) >= 0.4
    """,
)
def prefix_jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.4 pairs by PREFIX FILTERING
    (llmops/dedup.py::prefix_filter_jaccard_pairs — the
    AllPairs/PPJoin device): candidates only from each doc's
    floor(0.6·s)+1 globally-RAREST shingles plus a length filter,
    then exact verification. The oracle is the quadratic all-shingle
    self-join — a different algorithm whose identical output is what
    makes the row a strong check; the unit test additionally pins
    set-equality against ngram_jaccard_pairs at two thresholds."""
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(d, n=3, threshold=0.4)


@_staged(
    "isotonic_calibration_orders",
    """
    WITH m AS (
      SELECT o_orderpriority AS grp, strftime(o_orderdate, '%Y-%m') AS x,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS w
      FROM orders GROUP BY 1, 2
    ),
    p AS (
      SELECT grp, x, s, w,
             row_number() OVER (PARTITION BY grp ORDER BY x) AS k,
             CAST(sum(s) OVER (PARTITION BY grp ORDER BY x) AS BIGINT) AS cs,
             CAST(sum(w) OVER (PARTITION BY grp ORDER BY x) AS BIGINT) AS cw
      FROM m
    ),
    seg AS (
      SELECT a.grp, a.k AS i, b.k AS j,
             (b.cs - a.cs + a.s) * 1000000 // (b.cw - a.cw + a.w) AS qavg
      FROM p a JOIN p b ON b.grp = a.grp AND b.k >= a.k
    ),
    mm AS (
      SELECT s.grp, pk.k, s.i, min(s.qavg) AS minq
      FROM seg s
      JOIN p pk ON pk.grp = s.grp AND s.i <= pk.k AND s.j >= pk.k
      GROUP BY 1, 2, 3
    ),
    fit AS (
      SELECT grp, k, CAST(max(minq) AS BIGINT) AS fitted_q
      FROM mm GROUP BY 1, 2
    )
    SELECT p.grp AS o_orderpriority, p.x AS month, p.w AS n,
           f.fitted_q
    FROM p JOIN fit f ON f.grp = p.grp AND f.k = p.k
    ORDER BY o_orderpriority, month
    """,
)
def isotonic_calibration_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic regression (llmops/mlfit.py::isotonic_fit)
    of the monthly finished-order rate per priority class — the PAV
    calibration primitive behind reliability curves, run as one
    Arrow pass per group over the pre-aggregated month frame. The
    oracle replays it through the MINIMAX IDENTITY
    fit(k) = max_{i<=k} min_{j>=k} avg(i..j) in pure BIGINT floor-
    quantized arithmetic (floor commutes with min/max, so the
    quantized minimax equals the quantization of the exact fit) — a
    different algorithm with a provably identical result."""
    from dbt_lakehouse_aws_spark.llmops.mlfit import isotonic_fit
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    agg = o.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("w"),
    )
    fit = isotonic_fit(
        agg,
        group_cols=["o_orderpriority"],
        x_col="month",
        y_sum_col="s",
        w_col="w",
    )
    return fit.select(
        "o_orderpriority",
        "month",
        F.col("w").alias("n"),
        "fitted_q",
    ).orderBy("o_orderpriority", "month")


#: Poisson(1) CDF cut points (k = 0..8, else 9) — identical literals
#: on both engines so the inverse-CDF draw replays bit-exactly.
_POIS1_CDF = (
    "0.3678794412", "0.7357588823", "0.9196986029", "0.9810118431",
    "0.9963401532", "0.9994058151", "0.9999167589", "0.9999897508",
    "0.9999988828",
)


#: deterministic uniform on (orderkey, replicate): affine mod-P then
#: one QUADRATIC mixing round — affine alone is linear in b, so a
#: key's 64 draws would walk a lattice; (h**2 + h + c) mod P breaks the
#: linearity. Pure BIGINT arithmetic (operands < 2**62), written once
#: and evaluated VERBATIM by both engines — no md5, no strings.
_BOOT_U = (
    "((((o_orderkey % 2147483647) * 1103515245 + b * 1299709 + 12345)"
    " % 2147483647) * ((((o_orderkey % 2147483647) * 1103515245"
    " + b * 1299709 + 12345) % 2147483647) + 1) + 987654321)"
    " % 2147483647 / 2147483647.0"
)


def _bootstrap_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {branches} ELSE 9 END"


@_staged(
    "bootstrap_ci_orders",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    rep AS (
      SELECT o.o_orderpriority, b.b,
             CAST(sum(m.m * o.cents) AS BIGINT) AS s,
             CAST(sum(m.m) AS BIGINT) AS n
      FROM o
      CROSS JOIN (SELECT unnest(range(1, 65)) AS b) b,
      LATERAL (
        SELECT {_bootstrap_case_sql(_BOOT_U)} AS m
      ) m
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT o_orderpriority, s, n,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(s AS DOUBLE) / n, b
             ) AS rk
      FROM rep
    ),
    base AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM o GROUP BY 1
    )
    SELECT b.o_orderpriority, b.n_orders,
           b.total_cents * 10000 // b.n_orders AS mean_q,
           lo.s * 10000 // lo.n AS lo_q,
           hi.s * 10000 // hi.n AS hi_q
    FROM base b
    JOIN ranked lo ON lo.o_orderpriority = b.o_orderpriority AND lo.rk = 4
    JOIN ranked hi ON hi.o_orderpriority = b.o_orderpriority AND hi.rk = 61
    ORDER BY b.o_orderpriority
    """,
)
def bootstrap_ci_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 90%-ish CI for mean order value per priority
    (Efron's resampling reshaped for one distributed pass): each of
    B=64 replicates weights every order by a DETERMINISTIC Poisson(1)
    draw — inverse-CDF over a portable quadratic-mix BIGINT hash of
    (orderkey, replicate), the identical SQL text on both engines — so the entire resample replays bit-exactly
    in SQL. Replicate means are exact BIGINT (Σm·cents, Σm) pairs;
    the 4th/61st of the 64 means (ordered by correctly-rounded double
    division — identical cross-engine for identical integer pairs)
    bound the interval, and every output is floor-quantized BIGINT
    (× 10⁴), the same device as isotonic_calibration. One explode +
    two aggregates — no per-replicate scans of the base table."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # the SAME draw SQL text the oracle runs, evaluated by Spark
    m = F.expr(_bootstrap_case_sql(_BOOT_U))
    rep = (
        o.withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(64))))
        .withColumn("m", m)
        .groupBy("o_orderpriority", "b")
        .agg(
            F.sum(F.col("m") * F.col("cents")).cast("long").alias("s"),
            F.sum("m").cast("long").alias("n"),
        )
    )
    ranked = rep.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy(
                F.col("s").cast("double") / F.col("n"), F.col("b")
            )
        ),
    )
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    lo = ranked.filter(F.col("rk") == 4).select(
        "o_orderpriority", F.col("s").alias("lo_s"), F.col("n").alias("lo_n")
    )
    hi = ranked.filter(F.col("rk") == 61).select(
        "o_orderpriority", F.col("s").alias("hi_s"), F.col("n").alias("hi_n")
    )
    return (
        base.join(lo, "o_orderpriority")
        .join(hi, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            # exact BIGINT floor division (F.floor(a/b) would route
            # through double and lose exactness past 2^53)
            F.expr("total_cents * 10000L div n_orders").alias("mean_q"),
            F.expr("lo_s * 10000L div lo_n").alias("lo_q"),
            F.expr("hi_s * 10000L div hi_n").alias("hi_q"),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "approx_quantile_bounds_orders",
    """
    SELECT q, CAST(count(*) AS BIGINT) AS n, TRUE AS ok
    FROM orders
    CROSS JOIN (
      SELECT unnest(['0.10', '0.25', '0.50', '0.75', '0.90']) AS q
    )
    GROUP BY q
    ORDER BY q
    """,
)
def approx_quantile_bounds_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles with a PROVEN error bound:
    Spark's native ``percentile_approx`` (Greenwald-Khanna, the
    mergeable sketch that runs as one map-side-combinable aggregate
    at any scale) at accuracy 1000 (ε = 0.001 rank error), then the
    guarantee is VERIFIED ENGINE-SIDE against exact ranks — for each
    estimate v: count(x < v) must not exceed ⌈(q+ε)·N⌉ and
    count(x ≤ v) must reach ⌊(q−ε)·N⌋. The sketch value itself is
    engine-specific (DuckDB's qdigest would differ), so the oracle
    pins (probe, N, bound-holds) — the same self-checking device as
    the stream/batch equivalence rows; the ranks are exact counts
    from one broadcast join, not a sort."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    probes = [0.10, 0.25, 0.50, 0.75, 0.90]
    eps = 0.001
    o = T(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("v"))
    est = (
        o.agg(
            F.percentile_approx("v", probes, 1000).alias("est")
        )
        .select(
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(f"{p:.2f}") for p in probes]).alias("q"),
                    F.array(*[F.lit(p) for p in probes]).alias("qf"),
                    F.col("est").alias("v"),
                )
            ).alias("z")
        )
        .select("z.q", "z.qf", F.col("z.v").alias("est_v"))
    )
    checked = (
        o.crossJoin(F.broadcast(est))
        .groupBy("q", "qf", "est_v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("v") < F.col("est_v"), 1).otherwise(0))
            .cast("long")
            .alias("rank_lt"),
            F.sum(F.when(F.col("v") <= F.col("est_v"), 1).otherwise(0))
            .cast("long")
            .alias("rank_le"),
        )
    )
    return checked.select(
        "q",
        "n",
        (
            (F.col("rank_lt") <= F.ceil((F.col("qf") + eps) * F.col("n")))
            & (F.col("rank_le") >= F.floor((F.col("qf") - eps) * F.col("n")))
        ).alias("ok"),
    ).orderBy("q")


@_staged(
    "attribution_models_events",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS cid, user_id, ts AS cts,
             CAST(extract(hour FROM ts) AS BIGINT) AS channel_hour
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT p.pid, p.cents, c.cid, c.channel_hour,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY c.cts, c.cid) AS rn,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY c.cts DESC, c.cid DESC) AS rn_d,
             count(*) OVER (PARTITION BY p.pid) AS k
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.cts < p.pts AND c.cts >= p.pts - INTERVAL 3 DAY
    ),
    credits AS (
      SELECT 'linear' AS model, channel_hour,
             cents * 1000000 // k AS credit_micro
      FROM pairs
      UNION ALL
      SELECT 'first', channel_hour, cents * 1000000
      FROM pairs WHERE rn = 1
      UNION ALL
      SELECT 'last', channel_hour, cents * 1000000
      FROM pairs WHERE rn_d = 1
    )
    SELECT model, channel_hour,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(credit_micro) AS BIGINT) AS credited_micro
    FROM credits
    GROUP BY model, channel_hour
    ORDER BY model, channel_hour
    """,
)
def attribution_models_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution, three models in one pass: every
    purchase credits the user's clicks in the preceding 3 days —
    'linear' splits the purchase equally (floor-quantized BIGINT
    micro-cents, cents·10⁶ div k — exact on both engines), 'first'
    and 'last' give full credit to the window's endpoints
    (deterministic (ts, event_id) tie-break). Credit rolls up by the
    click's hour-of-day channel. The candidate join is an EQUI-join
    on user_id with the time band as a pushed residual — one
    shuffle, per-user fan-out; the three window functions share ONE
    (pid) exchange. Complements asof_purchase_attribution (pure
    last-touch via as-of join)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        "user_id",
        F.col("ts").alias("cts"),
        F.hour("ts").cast("long").alias("channel_hour"),
    )
    by_pid = Window.partitionBy("pid")
    pairs = (
        p.join(
            c.withColumnRenamed("user_id", "c_user_id"),
            (F.col("c_user_id") == F.col("user_id"))
            & (F.col("cts") < F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 3 DAYS")),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                by_pid.orderBy(F.asc("cts"), F.asc("cid"))
            ),
        )
        .withColumn(
            "rn_d",
            F.row_number().over(
                by_pid.orderBy(F.desc("cts"), F.desc("cid"))
            ),
        )
        .withColumn("k", F.count(F.lit(1)).over(by_pid))
        .select("pid", "cents", "channel_hour", "rn", "rn_d", "k")
    )
    full = F.col("cents") * F.lit(1000000)
    credits = (
        pairs.select(
            F.lit("linear").alias("model"),
            "channel_hour",
            F.expr("cents * 1000000L div k").alias("credit_micro"),
        )
        .unionAll(
            pairs.filter(F.col("rn") == 1).select(
                F.lit("first").alias("model"),
                "channel_hour",
                full.alias("credit_micro"),
            )
        )
        .unionAll(
            pairs.filter(F.col("rn_d") == 1).select(
                F.lit("last").alias("model"),
                "channel_hour",
                full.alias("credit_micro"),
            )
        )
    )
    return (
        credits.groupBy("model", "channel_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            F.sum("credit_micro").cast("long").alias("credited_micro"),
        )
        .orderBy("model", "channel_hour")
    )


@_staged(
    "agg_function_gauntlet_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS any_jumbo,
           CAST(arg_min(CAST(round(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS BIGINT) AS first_key_cents,
           CAST(arg_max(CAST(round(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS BIGINT) AS last_key_cents,
           CAST(bit_and(o_orderkey % 255) AS BIGINT) AS key_band_and,
           CAST(bit_or(o_orderkey % 255) AS BIGINT) AS key_band_or,
           CAST(bit_xor(o_orderkey % 255) AS BIGINT) AS key_band_xor,
           round(median(o_totalprice), 4) AS median_price,
           any_value(substr(o_orderpriority, 1, 1)) AS priority_digit
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_function_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function breadth gauntlet — the order-independent /
    deterministically-argumented members of the SQL aggregate family
    in one pass: count_if, bool_and/bool_or, min_by/max_by keyed on
    the UNIQUE orderkey (tie-free by construction), the bitwise
    aggregates, exact interpolated median (one correctly-rounded
    division of identical doubles on both engines), and any_value
    over a group-constant expression (the only deterministic way to
    exercise it). Order-SENSITIVE aggregates (listagg) and
    float-accumulation ones (stddev/corr) are deliberately excluded
    — those live behind exact sufficient-stats queries
    (a3_regression_slope, moments_by_priority)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("o_orderstatus") == "F")
            .cast("long")
            .alias("n_finished"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
            F.min_by(cents, F.col("o_orderkey"))
            .cast("long")
            .alias("first_key_cents"),
            F.max_by(cents, F.col("o_orderkey"))
            .cast("long")
            .alias("last_key_cents"),
            F.bit_and(F.col("o_orderkey") % 255)
            .cast("long")
            .alias("key_band_and"),
            F.bit_or(F.col("o_orderkey") % 255)
            .cast("long")
            .alias("key_band_or"),
            F.bit_xor(F.col("o_orderkey") % 255)
            .cast("long")
            .alias("key_band_xor"),
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
            F.any_value(F.substring("o_orderpriority", 1, 1)).alias(
                "priority_digit"
            ),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "weighted_median_lineitem",
    """
    WITH t AS (
      SELECT l_returnflag AS f,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    c AS (
      SELECT f, cents, w,
             CAST(sum(w) OVER (PARTITION BY f ORDER BY cents)
                  AS BIGINT) AS cum
      FROM t
    ),
    g AS (SELECT f, CAST(sum(w) AS BIGINT) AS total FROM t GROUP BY f)
    SELECT c.f AS l_returnflag, g.total AS total_qty,
           CAST(min(c.cents) AS BIGINT) AS wmedian_cents
    FROM c JOIN g ON g.f = c.f
    WHERE 2 * c.cum >= g.total
    GROUP BY c.f, g.total
    ORDER BY l_returnflag
    """,
)
def weighted_median_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median line price per return flag —
    the weighted-selection primitive (smallest value whose running
    weight reaches half the group total, all-BIGINT, no
    interpolation ambiguity). Built on the two-pass
    operators/windows.py::prefix_sum, so the running weight never
    funnels a group through one task the way
    ``Window.partitionBy(flag).orderBy(price)`` would at 100 TB
    (3 flags = 3 tasks); group offsets fall out of the SAME global
    prefix sum (min(cum−w) per group = weight mass before the
    group), a broadcast 3-row join. Ties in price are safe by
    construction: the crossing test uses end-of-tie-block cumulative
    weight on both engines (RANGE frame in SQL, min-qualifying-value
    selection here), which is order-invariant within the block."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("f"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    ps = prefix_sum(
        li,
        [F.asc("f"), F.asc("cents"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        "w",
        name="cum",
    )
    g = ps.groupBy("f").agg(
        F.min(F.col("cum") - F.col("w")).alias("off"),
        F.max("cum").alias("mx"),
    )
    return (
        ps.join(F.broadcast(g), "f")
        .filter(
            2 * (F.col("cum") - F.col("off")) >= F.col("mx") - F.col("off")
        )
        .groupBy("f")
        .agg(
            F.max(F.col("mx") - F.col("off")).cast("long").alias("total_qty"),
            F.min("cents").cast("long").alias("wmedian_cents"),
        )
        .select(
            F.col("f").alias("l_returnflag"), "total_qty", "wmedian_cents"
        )
        .orderBy("l_returnflag")
    )


@_staged(
    "string_function_gauntlet_parts",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS padded_brand,
           rpad(p_type, 20, '.') AS padded_type,
           translate(p_name, 'aeiou', '12345') AS translated,
           reverse(p_type) AS type_rev,
           repeat(p_brand, 2) AS brand_x2,
           CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS lev_brand,
           CAST(strpos(p_name, 'ol') AS BIGINT) AS pos_ol,
           CAST(ascii(p_type) AS BIGINT) AS type_ascii,
           left(p_name, 5) AS name_left5,
           right(p_name, 4) AS name_right4,
           split_part(p_type, ' ', 2) AS type_word2,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(concat(' ', p_name, ' ')) AS trimmed
    FROM part
    WHERE p_partkey % 97 = 0
    ORDER BY p_partkey
    """,
)
def string_function_gauntlet_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth gauntlet, row-exact across engines on
    a deterministic key subset: pad/translate/reverse/repeat,
    levenshtein against a literal, 1-based substring search (instr ↔
    strpos, 0 when absent), ascii, left/right slices, split_part,
    concat_ws, and trim — the portable core of the reference's
    string surface (reference models leaned on concat/substr/replace;
    SURVEY §2 F-rows) exercised in one scan with every output
    compared verbatim."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 == 0)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("padded_brand"),
        F.rpad("p_type", 20, ".").alias("padded_type"),
        F.translate("p_name", "aeiou", "12345").alias("translated"),
        F.reverse("p_type").alias("type_rev"),
        F.repeat("p_brand", 2).alias("brand_x2"),
        F.levenshtein("p_brand", F.lit("Brand#00"))
        .cast("long")
        .alias("lev_brand"),
        F.instr("p_name", "ol").cast("long").alias("pos_ol"),
        F.ascii("p_type").cast("long").alias("type_ascii"),
        F.expr("left(p_name, 5)").alias("name_left5"),
        F.expr("right(p_name, 4)").alias("name_right4"),
        F.split_part("p_type", F.lit(" "), F.lit(2)).alias("type_word2"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "trimmed"
        ),
    ).orderBy("p_partkey")


@_staged(
    "datetime_gauntlet_orders",
    """
    WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT d,
           CAST(count(*) AS BIGINT) AS n,
           CAST(dayofweek(d) + 1 AS BIGINT) AS dow_sun1,
           CAST(weekofyear(d) AS BIGINT) AS iso_week,
           CAST(dayofyear(d) AS BIGINT) AS doy,
           CAST(quarter(d) AS BIGINT) AS qtr,
           last_day(d) AS eom,
           CAST(date_trunc('week', d) AS DATE) AS week_start,
           d + 30 AS plus_30d,
           CAST(datediff('day', d, DATE '1998-12-01') AS BIGINT)
             AS days_to_ref,
           CAST((1998 - extract(year FROM d)) * 12
                + (12 - extract(month FROM d)) AS BIGINT) AS months_to_ref,
           make_date(CAST(extract(year FROM d) AS INT), 7, 1) AS mid_year
    FROM od
    GROUP BY d
    ORDER BY d
    """,
)
def datetime_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time-function breadth gauntlet over every distinct order
    date: day-of-week (pinned to one convention — Spark's dayofweek
    is 1=Sunday, DuckDB's is 0=Sunday, so the oracle shifts by one),
    ISO week-of-year, day-of-year, quarter, last_day, Monday
    week-truncation, +30-day date arithmetic, day datediff to a
    literal, month-boundary distance spelled as explicit
    year/month arithmetic (Spark's fractional months_between and
    DuckDB's boundary-counting datediff('month') disagree by design
    — the portable spelling is the extract form), and make_date."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "d",
            "n",
            F.dayofweek("d").cast("long").alias("dow_sun1"),
            F.weekofyear("d").cast("long").alias("iso_week"),
            F.dayofyear("d").cast("long").alias("doy"),
            F.quarter("d").cast("long").alias("qtr"),
            F.last_day("d").alias("eom"),
            F.date_trunc("week", F.col("d")).cast("date").alias("week_start"),
            F.date_add("d", 30).alias("plus_30d"),
            F.datediff(F.lit("1998-12-01").cast("date"), F.col("d"))
            .cast("long")
            .alias("days_to_ref"),
            (
                (F.lit(1998) - F.year("d")) * 12 + (F.lit(12) - F.month("d"))
            )
            .cast("long")
            .alias("months_to_ref"),
            F.make_date(F.year("d"), F.lit(7), F.lit(1)).alias("mid_year"),
        )
        .orderBy("d")
    )


@_staged(
    "regex_gauntlet_parts",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT)
             AS n_vowels,
           regexp_matches(p_name, '^[a-z]+ [a-z]+') AS two_words,
           array_to_string(regexp_extract_all(p_type, '[A-Z]+'), ',')
             AS type_tokens,
           regexp_replace(p_brand, '[0-9]+', '#') AS brand_masked
    FROM part
    WHERE p_partkey % 97 = 0
    ORDER BY p_partkey
    """,
)
def regex_gauntlet_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression breadth gauntlet, row-exact cross-engine
    on the portable Java∩RE2 subset (explicit ASCII classes,
    anchors, quantifiers — no engine-specific escapes): capture-group
    extraction at both ends, global replace, match counting
    (regexp_count ↔ len(regexp_extract_all)), boolean rlike ↔
    regexp_matches, and extract-all flattened through array_join so
    no array column reaches the driver compare."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.regexp_count("p_name", F.lit(r"[aeiou]"))
        .cast("long")
        .alias("n_vowels"),
        F.col("p_name").rlike(r"^[a-z]+ [a-z]+").alias("two_words"),
        F.array_join(
            F.expr(r"regexp_extract_all(p_type, '[A-Z]+', 0)"), ","
        ).alias("type_tokens"),
        F.regexp_replace("p_brand", r"[0-9]+", "#").alias("brand_masked"),
    ).orderBy("p_partkey")


@_staged(
    "arrow_ipc_roundtrip_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def arrow_ipc_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC stream roundtrip (sources/arrow_ipc.py): orders →
    one ``.arrows`` stream per partition via mapInArrow — the
    batches are written VERBATIM, no per-row Python and no
    re-encode — read back one task per file and aggregated; the
    oracle computes the same aggregate over the source, so any
    loss or duplication in the interchange shifts counts, cents, or
    the distinct-customer tally. The cheapest binary interop surface the engine
    offers (pandas/polars/DuckDB/Flight all consume IPC streams)."""
    import tempfile
    import uuid as _uuid

    from dbt_lakehouse_aws_spark.sources.arrow_ipc import (
        read_arrow_ipc,
        write_arrow_ipc,
    )
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix=f"ipc_{_uuid.uuid4().hex[:8]}_") + "/orders"
    write_arrow_ipc(o, root)
    back = read_arrow_ipc(spark, root)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("cents"),
            F.countDistinct("o_custkey").cast("long").alias("n_custkeys"),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "null_conditional_gauntlet_customer",
    """
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_filled,
           ifnull(nullif(c_mktsegment, 'BUILDING'), c_name) AS seg_or_name,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'present' ELSE 'absent' END AS nvl2_like,
           (nullif(c_mktsegment, 'BUILDING')
              IS NOT DISTINCT FROM CAST(NULL AS VARCHAR)) AS nullsafe_eq_null,
           greatest(c_acctbal, 0.0,
                    CAST(NULL AS DOUBLE)) AS bal_floor0,
           least(c_acctbal, 5000.0,
                 CAST(NULL AS DOUBLE)) AS bal_cap5k,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    WHERE c_custkey % 47 = 0
    ORDER BY c_custkey
    """,
)
def null_conditional_gauntlet_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NULL-handling / conditional gauntlet with a PLANTED null
    (``nullif`` on one segment — the source tables carry none):
    coalesce / ifnull backfills, an nvl2-shaped presence branch
    (spelled as CASE — DuckDB has no nvl2), null-safe equality
    (``<=>`` ↔ IS NOT DISTINCT FROM), and greatest/least with an
    explicit NULL argument pinning the skip-NULL semantics BOTH
    engines share (both follow Postgres, not the SQL-standard
    propagate-NULL)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") % 47 == 0)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    null_d = F.lit(None).cast("double")
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("N/A")).alias("seg_filled"),
        F.ifnull(seg_null, F.col("c_name")).alias("seg_or_name"),
        F.nvl2(seg_null, F.lit("present"), F.lit("absent")).alias(
            "nvl2_like"
        ),
        seg_null.eqNullSafe(F.lit(None).cast("string")).alias(
            "nullsafe_eq_null"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0), null_d).alias(
            "bal_floor0"
        ),
        F.least(F.col("c_acctbal"), F.lit(5000.0), null_d).alias(
            "bal_cap5k"
        ),
        F.isnull("c_acctbal").alias("bal_is_null"),
    ).orderBy("c_custkey")


@_staged(
    "set_ops_customers",
    """
    WITH a AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE extract(year FROM o_orderdate) = 1995
    ),
    b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
    i AS (SELECT k FROM a INTERSECT SELECT k FROM b),
    oa AS (SELECT k FROM a EXCEPT SELECT k FROM b),
    ob AS (SELECT k FROM b EXCEPT SELECT k FROM a),
    u AS (SELECT k FROM a UNION SELECT k FROM b)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM i) AS n_both,
           (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) FROM i) AS sum_both,
           (SELECT CAST(count(*) AS BIGINT) FROM oa) AS n_only_active,
           (SELECT CAST(count(*) AS BIGINT) FROM ob) AS n_only_rich,
           (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_union
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set-operator coverage — INTERSECT / EXCEPT (both
    directions) / UNION DISTINCT between the 1995-active customer
    keyset and the high-balance keyset, with a value checksum on the
    intersection. Spark plans these as the dedicated left-semi /
    left-anti / aggregate forms; the counts pin the distinct
    semantics (vs the ALL variants used by the stream-equivalence
    twins)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    a = (
        T(spark, sf_dir, "orders")
        .filter(F.year(F.col("o_orderdate")) == 1995)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    b = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    i = a.intersect(b)
    stats = i.agg(
        F.count(F.lit(1)).cast("long").alias("n_both"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("sum_both"),
    )
    oa = a.subtract(b).agg(
        F.count(F.lit(1)).cast("long").alias("n_only_active")
    )
    ob = b.subtract(a).agg(
        F.count(F.lit(1)).cast("long").alias("n_only_rich")
    )
    u = a.union(b).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_union")
    )
    return (
        stats.crossJoin(F.broadcast(oa))
        .crossJoin(F.broadcast(ob))
        .crossJoin(F.broadcast(u))
    )


@_staged(
    "acid_rename_column_events",
    """
    WITH src AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'click')
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS amount_cents
    FROM src
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def acid_rename_column_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only RENAME COLUMN under the driver gate
    (sources/acid.py::rename_column — Delta column-mapping
    semantics): commit the 'view' slice with a ``cents`` column,
    rename it to ``amount_cents`` (ZERO data files rewritten — the
    map lives in the log), then APPEND the 'click' slice already
    carrying the logical name. The read-back aggregate must equal
    the oracle over both slices — wrong translation in either the
    rename, the logical append, or the logical read shifts sums; the
    asserted file-set identity is pinned by
    test_acid.py::test_rename_column_metadata_only_roundtrip."""
    import tempfile
    import uuid as _uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = AcidTable(
        spark,
        tempfile.mkdtemp(prefix=f"ren_{_uuid.uuid4().hex[:8]}_") + "/t",
    )
    t.write(ev.filter(F.col("event_type") == "view"))
    t.rename_column("cents", "amount_cents")
    t.write(
        ev.filter(F.col("event_type") == "click").withColumnRenamed(
            "cents", "amount_cents"
        ),
        mode="append",
    )
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("amount_cents").cast("long").alias("amount_cents"),
        )
        .orderBy("event_type")
    )


@_staged(
    "recursive_cte_part_closure",
    """
    WITH RECURSIVE parents AS (
      SELECT p_partkey AS child, p_partkey // 8 AS parent
      FROM part WHERE p_partkey // 8 >= 1
    ),
    anc(node, anc, depth) AS (
      SELECT child, parent, 1 FROM parents
      UNION ALL
      SELECT a.node, p.parent, a.depth + 1
      FROM anc a JOIN parents p ON p.child = a.anc
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(anc) AS BIGINT) AS anc_checksum
    FROM anc
    GROUP BY depth
    ORDER BY depth
    """,
)
def recursive_cte_part_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE on Spark 4 (WITH RECURSIVE landed in
    Spark 4.0 — the engine now runs the same fixpoint SQL DuckDB
    does): transitive-closure of the part hierarchy (parent =
    partkey div 8, the relation part_hierarchy_rollup also uses),
    aggregated per ancestor depth with a checksum. Until now every
    fixpoint here was either unrolled (pagerank/logreg oracles) or
    pointer-doubled (operators/graph.py closure); this row pins that
    the DECLARATIVE recursive form itself is part of the engine's
    SQL surface, iteration count log₈(parts) ≈ 6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    view = f"part_rec_{abs(hash(sf_dir)) % 10**8}"
    T(spark, sf_dir, "part").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE parents AS (
          SELECT p_partkey AS child, p_partkey DIV 8 AS parent
          FROM {view} WHERE p_partkey DIV 8 >= 1
        ),
        anc(node, anc, depth) AS (
          SELECT child, parent, 1 AS depth FROM parents
          UNION ALL
          SELECT a.node, p.parent, a.depth + 1
          FROM anc a JOIN parents p ON p.child = a.anc
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(anc) AS BIGINT) AS anc_checksum
        FROM anc
        GROUP BY depth
        ORDER BY depth
        """
    )


@_staged(
    "lateral_topk_customers",
    """
    SELECT n.n_name, l.c_custkey, l.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey ASC
      LIMIT 2
    ) AS l
    ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
    """,
)
def lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — per nation, its top-2 customers
    by balance, expressed as the SQL-standard lateral join BOTH
    engines run verbatim (Spark's LateralJoin operator decorrelates
    it; the per-group ORDER BY + LIMIT inside the lateral is the
    declarative form of w3's rank-filter top-k). Deterministic by
    the (acctbal DESC, custkey ASC) total order."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    suffix = f"lat_{abs(hash(sf_dir)) % 10**8}"
    T(spark, sf_dir, "nation").createOrReplaceTempView(f"nation_{suffix}")
    T(spark, sf_dir, "customer").createOrReplaceTempView(
        f"customer_{suffix}"
    )
    return spark.sql(
        f"""
        SELECT n.n_name, l.c_custkey, l.c_acctbal
        FROM nation_{suffix} n, LATERAL (
          SELECT c_custkey, c_acctbal
          FROM customer_{suffix}
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC
          LIMIT 2
        ) AS l
        ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
        """
    )


@_staged(
    "window_frame_gauntlet_orders",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             nullif(o_orderstatus, 'O') AS status_or_null
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT o_orderkey,
           CAST(lag(cents, 2, -1) OVER w AS BIGINT) AS lag2_def,
           CAST(lead(cents, 1, 0) OVER w AS BIGINT) AS lead1_def,
           first_value(status_or_null IGNORE NULLS) OVER w AS first_status,
           nth_value(cents, 3) OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS third_cents,
           CAST(sum(cents) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderkey
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS rows_sum3,
           CAST(sum(cents) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderkey
                                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS range_sum100
    FROM t
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_frame_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame breadth gauntlet on a deterministic key subset:
    lag/lead with explicit DEFAULTS, first_value IGNORE NULLS over a
    planted-null column, nth_value on the full-partition frame, a
    ROWS sliding frame, and a numeric RANGE frame (100-key band) —
    the frame vocabulary beyond the rank/percent family already
    pinned by w1–w10. The unique orderkey makes every frame
    deterministic."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    t = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.select(
        "o_orderkey",
        F.lag("cents", 2, -1).over(w).cast("long").alias("lag2_def"),
        F.lead("cents", 1, 0).over(w).cast("long").alias("lead1_def"),
        F.first_value("status_or_null", ignoreNulls=True)
        .over(w)
        .alias("first_status"),
        F.nth_value("cents", 3).over(full).alias("third_cents"),
        F.sum("cents")
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("long")
        .alias("rows_sum3"),
        F.sum("cents")
        .over(
            Window.partitionBy("o_orderpriority")
            .orderBy("o_orderkey")
            .rangeBetween(-100, Window.currentRow)
        )
        .cast("long")
        .alias("range_sum100"),
    ).orderBy("o_orderkey")


_PIVOT_SQL_BODY = """
    WITH t AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {events}
    ),
    p AS (
      SELECT * FROM (SELECT day, event_type, cents FROM t)
      PIVOT (sum(cents) FOR event_type IN
             ('click' AS click, 'view' AS view, 'purchase' AS purchase,
              'signup' AS signup, 'error' AS error))
    ),
    u AS (
      SELECT * FROM p
      UNPIVOT (cents FOR event_type IN (click, view, purchase, signup, error))
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM u
    GROUP BY event_type
    ORDER BY event_type
"""


@_staged(
    "pivot_unpivot_native_events",
    _PIVOT_SQL_BODY.format(events="events"),
)
def pivot_unpivot_native_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE SQL PIVOT → UNPIVOT round-trip (the declarative forms —
    a7 pins the max(CASE) spelling, u2 the stacked-union unpivot):
    daily per-type cent totals pivot to one column per event type,
    unpivot back (NULL cells dropped by UNPIVOT's default on BOTH
    engines — that's the semantics under test), and re-aggregate.
    The SAME SQL text runs on Spark and DuckDB."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    view = f"events_piv_{abs(hash(sf_dir)) % 10**8}"
    T(spark, sf_dir, "events").createOrReplaceTempView(view)
    return spark.sql(_PIVOT_SQL_BODY.format(events=view))


@_staged(
    "variant_extract_events",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS n_k,
           CAST(sum(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured type: the JSON payload parses
    ONCE into the binary variant encoding (``parse_json``), then
    typed paths come out with ``variant_get`` — the engine's answer
    to schemaless columns without per-query string re-parsing (the
    third JSON path here, after f_json_props' portable regex and
    json_typed's from_json struct). The oracle runs DuckDB's JSON
    type with the same '$.k' path."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ev = T(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("k").cast("long").alias("n_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


@_staged(
    "collation_groups_parts",
    """
    WITH mixed AS (
      SELECT p_partkey,
             CASE p_partkey % 3
               WHEN 0 THEN upper(p_name)
               WHEN 1 THEN p_name
               ELSE concat(upper(substr(p_name, 1, 1)), substr(p_name, 2))
             END AS name_mixed
      FROM part
    ),
    folded AS (
      SELECT lower(name_mixed) AS grp, name_mixed FROM mixed
    ),
    per_group AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT name_mixed) AS BIGINT) AS casings
      FROM folded GROUP BY grp
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(casings) AS BIGINT) AS max_casings,
           CAST(sum(CASE WHEN casings > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_casing
    FROM per_group
    """,
)
def collation_groups_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION support: grouping on a ``STRING COLLATE
    UTF8_LCASE`` column — case-insensitive comparison at the TYPE
    level, no lower() rewrite in the query — over deterministically
    planted casing variants. Group-key casing is a nondeterministic
    representative under collation, so the outputs are casing-free
    scalars; the oracle computes the identical relation by explicit
    lower() folding. (DuckDB collations exist but differ in reach —
    the fold is the portable spelling.)"""
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part")
    mixed = p.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 3 == 0, F.upper("p_name"))
        .when(F.col("p_partkey") % 3 == 1, F.col("p_name"))
        .otherwise(
            F.concat(
                F.upper(F.substring("p_name", 1, 1)),
                F.expr("substr(p_name, 2)"),
            )
        )
        .alias("name_mixed"),
    )
    ci = mixed.withColumn(
        "grp", F.expr("CAST(name_mixed AS STRING COLLATE UTF8_LCASE)")
    )
    per_group = ci.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("name_mixed").cast("long").alias("casings"),
    )
    return per_group.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("casings").cast("long").alias("max_casings"),
        F.sum(F.when(F.col("casings") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_multi_casing"),
    )


@_staged(
    "quantile_normalize_docs",
    """
    WITH base AS (SELECT source, doc_id, n_chars FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    p AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS prn
      FROM base
    ),
    g AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS ng
      FROM base
    ),
    m AS (
      SELECT g.source, g.n_chars, g.r, g.ng,
             CASE WHEN g.ng = 1 THEN (t.n + 1) // 2
                  ELSE (g.r - 1) * (t.n - 1) // (g.ng - 1) + 1
             END AS j
      FROM g CROSS JOIN tot t
    ),
    q AS (
      SELECT m.source, m.n_chars, m.r, m.ng, p.n_chars AS qn
      FROM m JOIN p ON p.prn = m.j
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS raw_sum,
           CAST(sum(qn) AS BIGINT) AS qn_sum,
           CAST(min(qn) AS BIGINT) AS qn_min,
           CAST(max(qn) AS BIGINT) AS qn_max,
           CAST(max(CASE WHEN r = (ng + 1) // 2 THEN n_chars END)
                AS BIGINT) AS raw_median,
           CAST(max(CASE WHEN r = (ng + 1) // 2 THEN qn END)
                AS BIGINT) AS qn_median
    FROM q GROUP BY source ORDER BY source
    """,
)
def quantile_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source document lengths onto
    the pooled corpus distribution (llmops/features.py::
    quantile_normalize — x -> Q_pool(F_source(x)), the cross-source
    score-alignment transform). The engine runs TWO scalable
    two-pass global ranks (never a per-source one-task window) plus
    a BIGINT position join; the oracle spells the same mapping with
    DuckDB's native windows. The integer position rule
    j = (r-1)(N-1) div (ng-1) + 1 makes every normalized value an
    ACTUAL pooled value — exact BIGINT end to end. Per source:
    count, raw/normalized sums, normalized range, raw and
    normalized lower medians (the medians land near the pooled
    median for EVERY source — that's the property the transform
    exists for)."""
    from dbt_lakehouse_aws_spark.llmops.features import quantile_normalize
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    qn = quantile_normalize(
        d, group_col="source", value_col="n_chars", tie_cols=["doc_id"]
    )
    at_median = F.expr("group_rank = (group_n + 1L) div 2")
    return (
        qn.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("raw_sum"),
            F.sum("qn_value").cast("long").alias("qn_sum"),
            F.min("qn_value").cast("long").alias("qn_min"),
            F.max("qn_value").cast("long").alias("qn_max"),
            F.max(F.when(at_median, F.col("n_chars")))
            .cast("long")
            .alias("raw_median"),
            F.max(F.when(at_median, F.col("qn_value")))
            .cast("long")
            .alias("qn_median"),
        )
        .orderBy("source")
    )


@_staged(
    "bfs_hops_users",
    """
    WITH RECURSIVE PLACEHOLDER_EDGES,
    und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    nodes AS (SELECT DISTINCT u AS node FROM und),
    seeds AS (SELECT node FROM nodes WHERE node % 97 = 0),
    walk(node, dist) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT u.v, w.dist + 1
      FROM walk w JOIN und u ON u.u = w.node
      WHERE w.dist < 4
    ),
    d AS (
      SELECT node, CAST(min(dist) AS BIGINT) AS dist
      FROM walk GROUP BY node
    )
    SELECT dist,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS node_checksum
    FROM d GROUP BY dist ORDER BY dist
    """,
)
def bfs_hops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source bounded BFS (operators/graph.py::bfs_hops) on
    the shared>=3 co-activity graph: hop distance <=4 from the
    deterministic seed set (user_id % 97 = 0 among graph nodes) —
    the "everything within k hops of the trusted set" crawl
    primitive. The engine expands a frontier (one O(edges) join per
    round, frontier-only, localCheckpoint-truncated); the oracle is
    DuckDB's native recursive CTE with its UNION-dedup fixpoint —
    two different BFS evaluation strategies agreeing on the exact
    per-distance node counts and id checksums."""
    from dbt_lakehouse_aws_spark.operators.graph import bfs_hops
    from dbt_lakehouse_aws_spark.queries_r5 import _coactivity_edges

    edges = _coactivity_edges(spark, sf_dir, min_shared=3)
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select("b"))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 97 == 0)
    d = bfs_hops(edges, seeds, src="a", dst="b", max_hops=4)
    return (
        d.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("node_checksum"),
        )
        .orderBy("dist")
    )


STAGED_ORACLES["bfs_hops_users"] = STAGED_ORACLES["bfs_hops_users"].replace(
    "PLACEHOLDER_EDGES", _coactivity_edges_sql(3).strip().rstrip()
)


def _lpa_oracle_sql(rounds: int) -> str:
    parts = [
        _coactivity_edges_sql(3).strip().rstrip(),
        """
    und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    v{i} AS (
      SELECT u.u AS node, p.label, count(*) AS c
      FROM und u JOIN l{i - 1} p ON p.node = u.v
      GROUP BY 1, 2
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM v{i}) WHERE rn = 1
    )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS size,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(sum(node) AS BIGINT) AS node_checksum
    FROM l{rounds} GROUP BY label
    ORDER BY size DESC, community ASC LIMIT 50
    """
    )


@_staged("lpa_communities_users", "PLACEHOLDER_LPA")
def lpa_communities_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (operators/
    graph.py::label_propagation_rounds), 3 fixed rounds on the
    shared>=3 co-activity graph — deterministic LPA (most-frequent
    neighbor label, smallest-label ties) as a pure function of the
    edge list. The engine's per-round argmax is one map-side-
    combinable max(struct(count, -label)) aggregate — no per-node
    window; the oracle unrolls the identical 3 rounds with
    row_number argmax. Top-50 communities by size."""
    from dbt_lakehouse_aws_spark.operators.graph import (
        label_propagation_rounds,
    )
    from dbt_lakehouse_aws_spark.queries_r5 import _coactivity_edges

    edges = _coactivity_edges(spark, sf_dir, min_shared=3)
    labels = label_propagation_rounds(edges, src="a", dst="b", rounds=3)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.min("node").cast("long").alias("min_node"),
            F.sum("node").cast("long").alias("node_checksum"),
        )
        .orderBy(F.desc("size"), F.asc("community"))
        .limit(50)
    )


STAGED_ORACLES["lpa_communities_users"] = _lpa_oracle_sql(3)


@_staged(
    "chunk_overlap_docs",
    """
    WITH RECURSIVE gs(i) AS (
      SELECT 0
      UNION ALL
      SELECT i + 1 FROM gs
      WHERE i + 1 <= (SELECT (greatest(max(length(text)), 1) - 1) // 150
                      FROM documents)
    ),
    c AS (
      SELECT d.source,
             gs.i AS chunk_ix,
             length(substr(d.text, CAST(gs.i * 150 + 1 AS BIGINT), 200))
               AS chunk_len
      FROM documents d JOIN gs
        ON gs.i <= (greatest(length(d.text), 1) - 1) // 150
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(chunk_len) AS BIGINT) AS total_chunk_chars,
           CAST(sum(CASE WHEN chunk_len < 200 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tail_chunks,
           CAST(max(chunk_ix) AS BIGINT) AS max_chunk_ix,
           CAST(sum(chunk_ix * chunk_len) AS BIGINT) AS order_checksum
    FROM c GROUP BY source ORDER BY source
    """,
)
def chunk_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping RAG chunking (llmops/corpus.py::chunk_overlap):
    200-char windows every 150 chars (50-char overlap) over every
    document — posexplode(sequence) + substring, pure codegen, no
    Python. Per source: chunk count, total chunk chars (> corpus
    chars by exactly the overlap mass), tail-chunk count, deepest
    chunk index, and an order-sensitive ix*len checksum pinning
    BOTH the fan-out count and each window's exact content length
    against the oracle's lateral generate_series + substr."""
    from dbt_lakehouse_aws_spark.llmops.corpus import chunk_overlap
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("source", "text")
    c = chunk_overlap(d, text_col="text", size=200, stride=150)
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("total_chunk_chars"),
            F.sum(F.when(F.col("chunk_len") < 200, 1).otherwise(0))
            .cast("long")
            .alias("n_tail_chunks"),
            F.max("chunk_ix").cast("long").alias("max_chunk_ix"),
            F.sum(F.col("chunk_ix") * F.col("chunk_len"))
            .cast("long")
            .alias("order_checksum"),
        )
        .orderBy("source")
    )


@_staged(
    "url_features_docs",
    """
    WITH f AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END
               AS proto_norm,
             CASE WHEN doc_id % 4 = 0 THEN 'org' ELSE 'com' END AS tld,
             CAST(3 + CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END
                  AS BIGINT) AS path_depth,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 2
                       WHEN doc_id % 5 = 0 THEN 1
                       ELSE 0 END AS BIGINT) AS n_params,
             (doc_id % 7 = 0) AS has_port,
             (doc_id % 13 = 0) AS has_frag
      FROM documents
    )
    SELECT proto_norm, tld,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(CASE WHEN has_port THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_port,
           CAST(sum(path_depth) AS BIGINT) AS sum_path_depth,
           CAST(sum(n_params) AS BIGINT) AS sum_params,
           CAST(sum(CASE WHEN has_frag THEN 1 ELSE 0 END) AS BIGINT)
             AS n_frag,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM f GROUP BY proto_norm, tld ORDER BY proto_norm, tld
    """,
)
def url_features_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parse + normalization features (llmops/text.py::
    url_features over Spark-native parse_url). GROUND TRUTH BY
    CONSTRUCTION: the query synthesizes one hostile URL per document
    (mixed-case scheme and host, optional :8080 port, variable path
    depth, 0/1/2 query params, optional fragment — all decided by
    doc_id arithmetic), the ENGINE must parse its own construction
    back through java.net.URI, and the ORACLE computes the expected
    features directly from the construction rules without parsing.
    Any parse_url deviation (fragment leaking into QUERY, port left
    in HOST, case folding) reds the row. Rolled up per
    (scheme, TLD) — the domain-quota shape."""
    from dbt_lakehouse_aws_spark.llmops.text import url_features
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    url = F.concat(
        F.when(
            F.col("doc_id") % 17 == 0,
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS")).otherwise(
                F.lit("HTTP")
            ),
        )
        .when(F.col("doc_id") % 2 == 0, F.lit("https"))
        .otherwise(F.lit("http")),
        F.lit("://"),
        F.when(F.col("doc_id") % 5 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example."),
        F.when(F.col("doc_id") % 4 == 0, F.lit("org")).otherwise(F.lit("com")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("/v/"), (F.col("doc_id") % 11).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?ref=rss&page="), (F.col("doc_id") % 7).cast("string")),
        )
        .when(F.col("doc_id") % 5 == 0, F.lit("?q="))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    feats = url_features(d.withColumn("url", url), "url")
    return (
        feats.groupBy("proto_norm", "tld")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("has_port"), 1).otherwise(0))
            .cast("long")
            .alias("n_with_port"),
            F.sum("path_depth").cast("long").alias("sum_path_depth"),
            F.sum("n_params").cast("long").alias("sum_params"),
            F.sum(F.when(F.col("has_frag"), 1).otherwise(0))
            .cast("long")
            .alias("n_frag"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("proto_norm", "tld")
    )


@_staged(
    "html_extract_docs",
    """
    WITH f AS (
      SELECT source,
             CAST(6 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
               AS title_len,
             CAST(6 + length(CAST(doc_id AS VARCHAR)) + 1 + length(text)
                  + CASE WHEN doc_id % 3 = 0 THEN 11 ELSE 0 END
                  + CASE WHEN doc_id % 5 = 0 THEN 5 ELSE 0 END
               AS BIGINT) AS visible_len,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
               AS BIGINT) AS n_links,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 10 ELSE 0 END
                  + CASE WHEN doc_id % 5 = 0 THEN 4 ELSE 0 END
               AS BIGINT) AS anchor_chars
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(title_len) AS BIGINT) AS sum_title_len,
           CAST(sum(visible_len) AS BIGINT) AS sum_visible_len,
           CAST(sum(n_links) AS BIGINT) AS sum_links,
           CAST(sum(anchor_chars) AS BIGINT) AS sum_anchor_chars,
           CAST(sum(anchor_chars * 1000 // visible_len) AS BIGINT)
             AS sum_density_millis
    FROM f GROUP BY source ORDER BY source
    """,
)
def html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate-stripping extraction (llmops/text.py::
    html_extract) under GROUND TRUTH BY CONSTRUCTION: every document
    is wrapped into a hostile page — entity in the title
    (``Doc &amp; N``), a script whose BODY contains fake markup
    (``<p>not text</p>`` — tag-strip-only extractors leak it), an
    uppercase anchor, a style block — and the oracle computes
    title/visible/anchor lengths directly from the construction
    rules, never parsing. The engine's regex pipeline must remove
    blocks, space-separate tags, decode entities, and collapse
    whitespace to land on exactly those closed-form lengths."""
    from dbt_lakehouse_aws_spark.llmops.text import html_extract
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("source", "doc_id", "text")
    html = F.concat(
        F.lit('<html><head><title>Doc &amp; '),
        F.col("doc_id").cast("string"),
        F.lit(
            '</title><script type="text/javascript">'
            'var x = "<p>not text</p>";</script></head><body class="c"><p>'
        ),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit('<a href="/l1">click here</a>')
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit('<A HREF="/l2">more</A>')
        ).otherwise(F.lit("")),
        F.lit("<style>.c{color:red}</style></body></html>"),
    )
    x = html_extract(d.withColumn("html", html), "html")
    return (
        x.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("title")).cast("long").alias("sum_title_len"),
            F.sum("visible_len").cast("long").alias("sum_visible_len"),
            F.sum("n_links").cast("long").alias("sum_links"),
            F.sum("anchor_chars").cast("long").alias("sum_anchor_chars"),
            F.sum("link_density_millis")
            .cast("long")
            .alias("sum_density_millis"),
        )
        .orderBy("source")
    )


@_staged(
    "pii_scrub_docs",
    """
    WITH f AS (
      SELECT source,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_emails,
             CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_ips,
             CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_phones,
             CAST(length(text)
                  + CASE WHEN doc_id % 3 = 0
                         THEN 10 + length(CAST(doc_id AS VARCHAR))
                         ELSE 0 END
                  + CASE WHEN doc_id % 5 = 0
                         THEN 8 + length(CAST(doc_id % 256 AS VARCHAR))
                         ELSE 0 END
                  + CASE WHEN doc_id % 4 = 0 THEN 13 ELSE 0 END
               AS BIGINT) AS raw_len,
             CAST(length(text)
                  + CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 0 END
                  + CASE WHEN doc_id % 5 = 0 THEN 5 ELSE 0 END
                  + CASE WHEN doc_id % 4 = 0 THEN 8 ELSE 0 END
               AS BIGINT) AS scrubbed_len
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_emails) AS BIGINT) AS sum_emails,
           CAST(sum(n_ips) AS BIGINT) AS sum_ips,
           CAST(sum(n_phones) AS BIGINT) AS sum_phones,
           CAST(sum(raw_len) AS BIGINT) AS sum_raw_len,
           CAST(sum(scrubbed_len) AS BIGINT) AS sum_scrubbed_len
    FROM f GROUP BY source ORDER BY source
    """,
)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (llmops/text.py::pii_scrub) under GROUND TRUTH
    BY CONSTRUCTION: deterministic plants appended to each doc — an
    email carrying the doc_id (%3), a dotted-quad IP whose third
    octet varies (%5), a NANP phone (%4); the corpus text itself is
    verified free of @ / - / digit-dot-digit so the regex tier can
    only fire on the plants. The oracle computes match counts and
    pre/post-mask lengths in closed form; the engine's
    email -> IPv4 -> phone mask cascade must land on exactly those
    lengths."""
    from dbt_lakehouse_aws_spark.llmops.text import pii_scrub
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("source", "doc_id", "text")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" u"),
                F.col("doc_id").cast("string"),
                F.lit("@ex"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" 555-867-5309")).otherwise(
            F.lit("")
        ),
    )
    x = pii_scrub(
        d.withColumn("planted", planted).withColumn(
            "raw_len", F.length("planted").cast("long")
        ),
        "planted",
    )
    return (
        x.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_emails").cast("long").alias("sum_emails"),
            F.sum("n_ips").cast("long").alias("sum_ips"),
            F.sum("n_phones").cast("long").alias("sum_phones"),
            F.sum("raw_len").cast("long").alias("sum_raw_len"),
            F.sum("scrubbed_len").cast("long").alias("sum_scrubbed_len"),
        )
        .orderBy("source")
    )


@_staged(
    "stream_merge_exactly_once",
    """
    WITH latest AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(user_id) AS BIGINT) AS user_checksum,
           CAST(sum(event_id) AS BIGINT) AS id_checksum,
           CAST(0 AS BIGINT) AS replay_added
    FROM latest WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_merge_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming MERGE under the driver gate — the
    upsert twin of stream_append_exactly_once: events stream via
    Trigger.AvailableNow through streaming/ingest.py::
    stream_merge_into_acid (latest-event-per-user upsert, keys =
    user_id, order = event_id; each micro-batch is ONE atomic COW
    commit carrying rows + (app, batch) txn marker), then a
    crash-replay is simulated by re-running the writer's guard with
    the committed batch id — last_txn_batch must skip it WITHOUT
    re-planning the merge. The oracle computes the end state (the
    max-event_id row per user, grouped by type) straight from the
    source and pins replay_added = 0: idempotence by txn protocol,
    not by merge-rerun luck."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.streaming.ingest import stream_merge_into_acid

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    root = tempfile.mkdtemp(prefix=f"eom_{uuid.uuid4().hex[:8]}_")
    table_path = f"{root}/tbl"
    ckpt = f"{root}/ckpt"
    q = stream_merge_into_acid(
        stream.select("event_id", "user_id", "event_type"),
        table_path=table_path,
        checkpoint_dir=ckpt,
        keys=["user_id"],
        order_col="event_id",
    )
    q.awaitTermination(600)
    t = AcidTable(spark, table_path)
    n1 = t.read().count()

    # crash-replay of batch 0 through the writer's own guard
    app_id = f"stream_merge:{ckpt}"
    seen = t.last_txn_batch(app_id)
    if not (seen is not None and 0 <= seen):
        replay = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id", "user_id", "event_type")
            .dropDuplicates(["user_id"])
        )
        t.merge(replay, ["user_id"], txn=(app_id, 0))
    n2 = t.read().count()

    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("user_id").cast("long").alias("user_checksum"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .withColumn("replay_added", F.lit(n2 - n1).cast("long"))
        .select(
            "event_type", "n_users", "user_checksum", "id_checksum",
            "replay_added",
        )
        .orderBy("event_type")
    )


@_staged(
    "map_function_gauntlet_events",
    """
    WITH c AS (
      SELECT user_id % 50 AS bucket, event_type,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(coalesce(max(CASE WHEN event_type = 'click' THEN cnt END),
                         0) AS BIGINT) AS clicks,
           CAST(sum(cnt) AS BIGINT) AS total,
           CAST(sum(CASE WHEN cnt > 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hot_keys,
           CAST(sum(cnt * 2) AS BIGINT) AS doubled_total,
           CAST(max(CASE WHEN event_type = 'purchase' THEN cnt END)
                AS BIGINT) AS purchases_nullable
    FROM c GROUP BY bucket ORDER BY bucket
    """,
)
def map_function_gauntlet_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed function gauntlet — the engine builds a REAL
    ``map<string,bigint>`` per bucket (map_from_entries over a
    sorted entry list) and every output scalar is produced by map
    operators: ``map_keys`` cardinality, ``element_at`` point lookup
    (coalesced and raw NULL-on-absent — both semantics pinned),
    ``map_values`` folded through ``aggregate``, ``map_filter``
    predicate count, ``transform_values`` rewrite then re-fold. The
    oracle computes the same scalars by plain conditional
    aggregation, never building a map — pinning the map surface
    against relational ground truth."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events")
    c = e.groupBy(
        (F.col("user_id") % 50).alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = c.groupBy("bucket").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    fold = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        m.select(
            "bucket",
            F.size(F.map_keys(F.col("m"))).cast("long").alias("n_keys"),
            F.coalesce(
                F.element_at(F.col("m"), F.lit("click")), F.lit(0)
            )
            .cast("long")
            .alias("clicks"),
            fold(F.map_values(F.col("m"))).alias("total"),
            F.size(
                F.map_filter(F.col("m"), lambda k, v: v > 5)
            )
            .cast("long")
            .alias("n_hot_keys"),
            fold(
                F.map_values(
                    F.transform_values(F.col("m"), lambda k, v: v * 2)
                )
            ).alias("doubled_total"),
            F.element_at(F.col("m"), F.lit("purchase"))
            .cast("long")
            .alias("purchases_nullable"),
        )
        .orderBy("bucket")
    )


@_staged(
    "vocab_ids_docs",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    f AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM tok WHERE token <> '' GROUP BY 1
    ),
    r AS (
      SELECT token, freq,
             row_number() OVER (ORDER BY freq DESC, token ASC) - 1
               AS token_id
      FROM f
    )
    SELECT substr(token, 1, 1) AS first_char,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(freq) AS BIGINT) AS sum_freq,
           CAST(sum(token_id) AS BIGINT) AS sum_ids,
           CAST(min(token_id) AS BIGINT) AS min_id,
           CAST(sum(token_id * freq) AS BIGINT) AS id_freq_checksum
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def vocab_ids_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense vocabulary id assignment (llmops/tokenizer.py::
    build_vocab_ids): contiguous ids 0..V-1 in (freq DESC, token)
    order over the corpus vocabulary — the embedding-table prep
    step, ranked by the two-pass global rank (no one-task vocabulary
    funnel). Grouped by first character with sum(token_id) and
    sum(token_id*freq) checksums: ANY divergence in the total id
    assignment — a swapped tie, an off-by-one, a dropped token —
    flips a checksum. Oracle = DuckDB's native row_number over the
    same (freq, token) order."""
    from dbt_lakehouse_aws_spark.llmops.tokenizer import build_vocab_ids
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("text")
    v = build_vocab_ids(d, text_col="text")
    return (
        v.groupBy(F.substring("token", 1, 1).alias("first_char"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("freq").cast("long").alias("sum_freq"),
            F.sum("token_id").cast("long").alias("sum_ids"),
            F.min("token_id").cast("long").alias("min_id"),
            F.sum(F.col("token_id") * F.col("freq"))
            .cast("long")
            .alias("id_freq_checksum"),
        )
        .orderBy("first_char")
    )


from dbt_lakehouse_aws_spark.llmops.tokenizer import (  # noqa: E402
    NEG_DRAW_HASH_SQL,
    NEG_WEIGHT_SQL,
)

_NEG_K = 10_000


@_staged(
    "negative_sampling_docs",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    f AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM tok WHERE token <> '' GROUP BY 1
    ),
    r AS (
      SELECT token, freq,
             row_number() OVER (ORDER BY freq DESC, token ASC) - 1
               AS token_id
      FROM f
    ),
    wts AS (
      SELECT token, token_id, freq, {NEG_WEIGHT_SQL} AS w FROM r
    ),
    bands AS (
      SELECT token, token_id, freq,
             CAST(sum(w) OVER (ORDER BY token_id) AS BIGINT) AS hi,
             CAST(sum(w) OVER (ORDER BY token_id) - w AS BIGINT) AS lo
      FROM wts
    ),
    tot AS (SELECT CAST(max(hi) AS BIGINT) AS total_w FROM bands),
    draws AS (
      SELECT js.j, CAST(({NEG_DRAW_HASH_SQL}) % t.total_w AS BIGINT) AS u
      FROM (SELECT unnest(range(0, {_NEG_K})) AS j) js CROSS JOIN tot t
    ),
    hit AS (
      SELECT d.j, d.u, b.token, b.token_id, b.freq
      FROM draws d JOIN bands b ON d.u >= b.lo AND d.u < b.hi
    )
    SELECT token_id // 4 AS id_bucket,
           CAST(count(*) AS BIGINT) AS n_draws,
           CAST(count(DISTINCT token) AS BIGINT) AS n_tokens,
           CAST(sum(u) AS BIGINT) AS u_checksum,
           CAST(sum(token_id) AS BIGINT) AS id_checksum,
           CAST(sum(freq) AS BIGINT) AS freq_checksum
    FROM hit GROUP BY 1 ORDER BY 1
    """,
)
def negative_sampling_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table + 10,000 deterministic draws
    (llmops/tokenizer.py::negative_sampling_draws): unigram^0.75
    weights in PURE INTEGER arithmetic (floor(freq^¾) via the
    nested-floor integer-sqrt identity, ±1-corrected — no float pow
    whose last ulp could flip a band), cumulative bands from the
    two-pass prefix_sum (no one-task window), draws from the
    quadratic-mix BIGINT hash, and the searchsorted resolved as a
    BUCKETED hash join. The oracle replays weights, bands, hash and
    containment verbatim in SQL — every draw must land in the
    identical band on both engines."""
    from dbt_lakehouse_aws_spark.llmops.tokenizer import (
        build_vocab_ids,
        negative_sampling_draws,
    )
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("text")
    vocab = build_vocab_ids(d, text_col="text")
    hits = negative_sampling_draws(vocab, k=_NEG_K)
    return (
        hits.groupBy(F.expr("token_id div 4").alias("id_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_draws"),
            F.countDistinct("token").cast("long").alias("n_tokens"),
            F.sum("u").cast("long").alias("u_checksum"),
            F.sum("token_id").cast("long").alias("id_checksum"),
            F.sum("freq").cast("long").alias("freq_checksum"),
        )
        .orderBy("id_bucket")
    )


def _cdc_oracle_sql() -> str:
    from dbt_lakehouse_aws_spark.llmops.corpus import (
        CDC_BASE,
        CDC_DIV,
        CDC_MOD,
        CDC_WINDOW,
    )

    ks = [
        pow(CDC_BASE, CDC_WINDOW - 1 - k, CDC_MOD) for k in range(CDC_WINDOW)
    ]
    terms = " + ".join(
        f"unicode(substr(d.text, gs.i - {CDC_WINDOW - 1 - k}, 1)) * {ks[k]}"
        for k in range(CDC_WINDOW)
    )
    return f"""
    WITH RECURSIVE gs(i) AS (
      SELECT {CDC_WINDOW}
      UNION ALL
      SELECT i + 1 FROM gs
      WHERE i + 1 <= (SELECT max(length(text)) FROM documents)
    ),
    pos AS (
      SELECT d.doc_id, d.source, gs.i,
             ({terms}) % {CDC_MOD} AS h
      FROM documents d JOIN gs ON gs.i <= length(d.text)
    ),
    ends AS (
      -- UNION ALL + DISTINCT, NOT a bare UNION: inside a WITH
      -- RECURSIVE scope DuckDB's UNION-dedup missed the
      -- (recursive-series i == length(text)) duplicate, yielding a
      -- phantom zero-length chunk (observed doc 124 @ sf0.001)
      SELECT DISTINCT doc_id, source, e FROM (
        SELECT doc_id, source, CAST(i AS BIGINT) AS e
        FROM pos WHERE h % {CDC_DIV} = 0
        UNION ALL
        SELECT doc_id, source, CAST(length(text) AS BIGINT)
        FROM documents
      )
    ),
    chunks AS (
      SELECT source,
             e - coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0)
               AS chunk_len,
             row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1
               AS chunk_ix
      FROM ends
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(chunk_len) AS BIGINT) AS total_chars,
           CAST(max(chunk_len) AS BIGINT) AS max_chunk,
           CAST(sum(chunk_ix * chunk_len) AS BIGINT) AS order_checksum
    FROM chunks GROUP BY source ORDER BY source
    """


@_staged("cdc_chunks_docs", "PLACEHOLDER_CDC")
def cdc_chunks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (llmops/corpus.py::cdc_chunks):
    boundaries where the 8-char window hash ≡ 0 mod 64, so an
    insertion re-aligns every downstream chunk — the dedup property
    fixed windows can't give. ENGINE: one numpy correlate per doc
    inside mapInPandas (O(n) per partition, zero shuffle, no
    per-char Python); ORACLE: the identical polynomial replayed
    RELATIONALLY — every position's hash from 8 unicode(substr)
    terms over a recursive position series — two radically different
    evaluation strategies of the same arithmetic, agreeing on every
    chunk boundary via the order-sensitive ix*len checksum."""
    from dbt_lakehouse_aws_spark.llmops.corpus import cdc_chunks
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    c = cdc_chunks(d, id_cols=["doc_id", "source"], text_col="text")
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("total_chars"),
            F.max("chunk_len").cast("long").alias("max_chunk"),
            F.sum(F.col("chunk_ix") * F.col("chunk_len"))
            .cast("long")
            .alias("order_checksum"),
        )
        .orderBy("source")
    )


STAGED_ORACLES["cdc_chunks_docs"] = _cdc_oracle_sql()


@_staged(
    "phrase_search_docs",
    """
    WITH RECURSIVE ws(i) AS (
      SELECT 1
      UNION ALL
      SELECT i + 1 FROM ws
      WHERE i + 1 <= (SELECT max(len(string_split(text, ' ')))
                      FROM documents)
    ),
    tok AS (
      SELECT d.doc_id, d.source, ws.i AS pos,
             string_split(d.text, ' ')[ws.i] AS token
      FROM documents d
      JOIN ws ON ws.i <= len(string_split(d.text, ' '))
    ),
    hits AS (
      SELECT a.doc_id, a.source, a.pos
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      WHERE a.token = 'order' AND b.token = 'key'
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_matched,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(sum(pos) AS BIGINT) AS pos_checksum,
           CAST(min(pos) AS BIGINT) AS first_pos
    FROM hits GROUP BY source ORDER BY source
    """,
)
def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search — the inverted-index-with-positions
    op BM25's bag-of-words can't express: find exact "order key"
    bigram occurrences. The engine positions tokens with
    posexplode(split) and matches adjacency with ONE lead() window
    per document partition (hash exchange on doc_id — millions of
    small partitions, no funnel, no self-join); the oracle
    materializes the positional index relationally (1-based list
    indexing over a recursive position series) and joins pos+1.
    Position checksums pin exact match offsets, converted to the
    oracle's 1-based convention."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos0")
    hits = (
        tok.withColumn("nxt", F.lead("token").over(w))
        .filter((F.col("token") == "order") & (F.col("nxt") == "key"))
        .select("doc_id", "source", (F.col("pos0") + 1).alias("pos"))
    )
    return (
        hits.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs_matched"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.sum("pos").cast("long").alias("pos_checksum"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .orderBy("source")
    )


@_staged(
    "lift_gains_orders",
    """
    WITH scored AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS score_cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS responder,
             ntile(10) OVER (ORDER BY round(o_totalprice * 100) DESC,
                             o_orderkey ASC) AS decile
      FROM orders
    ),
    per AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(responder) AS BIGINT) AS responders
      FROM scored GROUP BY decile
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS big_n,
             CAST(sum(responders) AS BIGINT) AS big_r
      FROM per
    )
    SELECT p.decile,
           p.n,
           p.responders,
           p.responders * 100000 // p.n AS response_rate_cmilli,
           CAST(sum(p.responders) OVER (ORDER BY p.decile) AS BIGINT)
             AS cum_responders,
           CAST(sum(p.responders) OVER (ORDER BY p.decile) * 100000
                // t.big_r AS BIGINT) AS cum_capture_cmilli,
           (p.responders * 100000 // p.n) * t.big_n // t.big_r
             AS lift_cmilli
    FROM per p CROSS JOIN tot t
    ORDER BY p.decile
    """,
)
def lift_gains_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift / gains decile table — the model-scoring report every
    targeting pipeline prints: orders ranked by price-as-score,
    responders = urgent/high priority; per decile the response rate,
    cumulative capture, and lift vs the base rate, every ratio an
    exact BIGINT centi-milli quotient. Deciles come from
    ntile_scalable (closed-form two-pass binning, bit-identical to
    SQL ntile — no one-task window); the oracle uses DuckDB's NATIVE
    ntile over the same (score DESC, key) total order."""
    from dbt_lakehouse_aws_spark.operators.windows import ntile_scalable
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("responder"),
    )
    d = ntile_scalable(
        o,
        [F.desc("score_cents"), F.asc("o_orderkey")],
        n=10,
        name="decile",
    )
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("responder").cast("long").alias("responders"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("big_n"),
        F.sum("responders").cast("long").alias("big_r"),
    )
    cum = (
        per.alias("a")
        .join(
            F.broadcast(per.select(F.col("decile").alias("d2"),
                                   F.col("responders").alias("r2"))),
            F.col("d2") <= F.col("decile"),
        )
        .groupBy("decile")
        .agg(F.sum("r2").cast("long").alias("cum_responders"))
    )
    return (
        per.join(F.broadcast(cum), "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "responders",
            F.expr("responders * 100000L div n").alias("response_rate_cmilli"),
            "cum_responders",
            F.expr("cum_responders * 100000L div big_r").alias(
                "cum_capture_cmilli"
            ),
            F.expr("(responders * 100000L div n) * big_n div big_r").alias(
                "lift_cmilli"
            ),
        )
        .orderBy("decile")
    )


_HW_L = "(0.5 * (q.x - r.s1) + 0.5 * (r.l + r.b))"


@_staged(
    "holt_winters_daily_events",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT key, day, x, n,
             CAST(row_number() OVER (PARTITION BY key ORDER BY day)
                  AS BIGINT) AS i
      FROM daily
    ),
    rec(key, i, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
      SELECT key, i, x, CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             0.4 * (x - x) + 0.6 * CAST(0.0 AS DOUBLE)
      FROM seq WHERE i = 1
      UNION ALL
      SELECT r.key, r.i + 1,
             {_HW_L},
             0.3 * ({_HW_L} - r.l) + 0.7 * r.b,
             r.s2, r.s3, r.s4, r.s5, r.s6, r.s7,
             0.4 * (q.x - {_HW_L}) + 0.6 * r.s1
      FROM rec r JOIN seq q ON q.key = r.key AND q.i = r.i + 1
    )
    SELECT q.key AS event_type, q.day, q.n,
           floor(r.l * 1e6 + 0.5) / 1e6 AS level,
           floor(r.b * 1e6 + 0.5) / 1e6 AS trend,
           floor(r.s7 * 1e6 + 0.5) / 1e6 AS seasonal,
           floor((r.l + r.b + r.s1) * 1e6 + 0.5) / 1e6 AS forecast
    FROM rec r JOIN seq q ON q.key = r.key AND q.i = r.i
    """,
)
def holt_winters_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple smoothing over per-type daily
    counts (operators/temporal.py::holt_winters_additive): level +
    trend + 7-slot positional seasonality. The engine folds the
    three-state + ring recursion per key in Arrow applyInPandas; the
    oracle carries the ENTIRE 7-slot seasonal ring as recursive-CTE
    columns, shifting one slot per step — the most state any oracle
    here replays, same literal constants, identical op order, and
    the duplicated level subexpression is bitwise-deterministic
    IEEE so inlining it twice equals the engine's stored
    intermediate. Floor-quantized to 1e-6 on both sides."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.operators.temporal import (
        holt_winters_additive,
    )

    ev = T(spark, sf_dir, "events")
    out = holt_winters_additive(ev, key_col="event_type", ts_col="ts")

    def r6(c: str):
        return (F.floor(F.col(c) * 1e6 + F.lit(0.5)) / 1e6).alias(c)

    return out.select(
        F.col("key").alias("event_type"),
        "day",
        "n",
        r6("level"),
        r6("trend"),
        r6("seasonal"),
        r6("forecast"),
    )


@_staged(
    "embedding_int8_quantize",
    """
    WITH q AS (
      SELECT vec_id, label,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE))))
               AS maxabs,
             embedding
      FROM embeddings
    ),
    cells AS (
      SELECT vec_id, label, maxabs,
             CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5)
                  AS BIGINT) AS qv
      FROM q, unnest(embedding) AS t(x)
    ),
    per_vec AS (
      SELECT vec_id, label,
             CAST(count(*) AS BIGINT) AS dim,
             CAST(sum(qv) AS BIGINT) AS q_sum,
             CAST(sum(qv * qv) AS BIGINT) AS q_sq,
             CAST(max(abs(qv)) AS BIGINT) AS q_maxabs
      FROM cells GROUP BY 1, 2
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(q_sum) AS BIGINT) AS sum_q,
           CAST(sum(q_sq) AS BIGINT) AS sum_q_sq,
           CAST(max(q_maxabs) AS BIGINT) AS max_q,
           CAST(sum(CASE WHEN q_maxabs = 127 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_saturated
    FROM per_vec GROUP BY label ORDER BY label
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the 4× memory lever
    every vector index applies before ANN: per-vector scale
    max|x|/127, cells floor(x·127/maxabs + 0.5). Stays EXACT across
    engines because every step is deterministic IEEE double
    arithmetic in the same order (float32 cast exact, one multiply,
    one divide, floor) — no round(double, d) whose tie handling
    diverges. The engine runs entirely in codegen higher-order
    array functions (transform/aggregate — no explode, no Python);
    the oracle unnests relationally. Per-label sums/squares of ALL
    quantized cells + saturation counts: any cell differing by one
    quantum anywhere flips a checksum."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(dbl, lambda x: F.abs(x)))
    qarr = F.transform(
        dbl, lambda x: F.floor(x * 127.0 / F.col("maxabs") + 0.5).cast("long")
    )
    fold = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    per_vec = (
        e.withColumn("maxabs", maxabs)
        .withColumn("qarr", qarr)
        .select(
            "vec_id",
            "label",
            F.size("qarr").cast("long").alias("dim"),
            fold(F.col("qarr")).alias("q_sum"),
            fold(F.transform(F.col("qarr"), lambda v: v * v)).alias("q_sq"),
            F.array_max(F.transform(F.col("qarr"), lambda v: F.abs(v)))
            .cast("long")
            .alias("q_maxabs"),
        )
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("q_sum").cast("long").alias("sum_q"),
            F.sum("q_sq").cast("long").alias("sum_q_sq"),
            F.max("q_maxabs").cast("long").alias("max_q"),
            F.sum(F.when(F.col("q_maxabs") == 127, 1).otherwise(0))
            .cast("long")
            .alias("n_saturated"),
        )
        .orderBy("label")
    )


@_staged(
    "pareto_frontier_parts",
    """
    WITH pts AS (
      SELECT p_partkey, p_size AS s,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    per_size AS (
      SELECT s, CAST(min(cents) AS BIGINT) AS m2 FROM pts GROUP BY s
    ),
    running AS (
      SELECT s, m2,
             CAST(min(m2) OVER (ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS BIGINT) AS m1
      FROM per_size
    )
    SELECT p.p_partkey, p.s AS p_size, p.cents
    FROM pts p JOIN running r ON r.s = p.s
    WHERE p.cents = r.m2 AND (r.m1 IS NULL OR p.cents < r.m1)
    ORDER BY p.s, p.p_partkey
    """,
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier / skyline over (size, price), both minimized:
    a part is on the frontier iff no other part is <= in both
    dimensions and < in one. Decomposed for scale: a point survives
    iff its price equals its size-group minimum (kills same-size
    domination) AND beats the strict running minimum over all
    SMALLER sizes (kills cross-size domination). The heavy work is
    ONE map-side-combinable per-size aggregate over the full table;
    the running minimum then lives on the DISTINCT-SIZE frame —
    bounded by the attribute domain (50 sizes), not the row count —
    and broadcasts back. No quadratic dominance join, no full-table
    window. Oracle = the same decomposition in DuckDB (frontier
    membership is definition-checkable, so the shared spelling is a
    derivation, not a crutch)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").alias("s"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    per_size = p.groupBy("s").agg(F.min("cents").alias("m2"))
    smaller = per_size.select(
        F.col("s").alias("s2"), F.col("m2").alias("m2b")
    )
    running = (
        per_size.join(F.broadcast(smaller), F.col("s2") < F.col("s"), "left")
        .groupBy("s", "m2")
        .agg(F.min("m2b").alias("m1"))
    )
    return (
        p.join(F.broadcast(running), "s")
        .filter(
            (F.col("cents") == F.col("m2"))
            & (F.col("m1").isNull() | (F.col("cents") < F.col("m1")))
        )
        .select("p_partkey", F.col("s").alias("p_size"), "cents")
        .orderBy("p_size", "p_partkey")
    )


@_staged(
    "fk_integrity_audit",
    """
    SELECT 'lineitem.orderkey' AS fk, CAST(count(*) AS BIGINT) AS orphans
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem.partkey', CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_partkey IS NULL
    UNION ALL
    SELECT 'lineitem.suppkey', CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_suppkey IS NULL
    UNION ALL
    SELECT 'orders.custkey', CAST(count(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'customer.nationkey', CAST(count(*) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE n.n_nationkey IS NULL
    UNION ALL
    SELECT 'supplier.nationkey', CAST(count(*) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_nationkey IS NULL
    UNION ALL
    SELECT 'nation.regionkey', CAST(count(*) AS BIGINT)
    FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_regionkey IS NULL
    ORDER BY fk
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep across the whole star schema —
    the warehouse smoke audit run after every load: orphan counts
    for all seven FK edges in one result. Engine spells each edge as
    a LEFT ANTI join (no payload materialized, dims broadcast); the
    oracle uses the equivalent LEFT JOIN / IS NULL. All-zero on
    consistent TPC-H data — the value is the shape: anti-join counts
    at fact-table scale with no fact shuffle beyond the join keys."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    def orphans(name, fact, fk, dim, pk):
        f = T(spark, sf_dir, fact).select(F.col(fk).alias("k"))
        d = T(spark, sf_dir, dim).select(F.col(pk).alias("k"))
        n = f.join(F.broadcast(d), "k", "left_anti").count()
        return (name, n)

    rows = [
        orphans("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        orphans("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        orphans("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        orphans("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
        orphans("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
        orphans("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
        orphans("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    return spark.createDataFrame(
        sorted(rows), "fk string, orphans long"
    ).orderBy("fk")


@_staged(
    "listagg_gauntlet_nation",
    """
    WITH c AS (
      SELECT c_nationkey AS nk, c_custkey, c_mktsegment
      FROM customer WHERE c_custkey % 37 = 0
    )
    SELECT nk,
           CAST(count(*) AS BIGINT) AS n,
           string_agg(CAST(c_custkey AS VARCHAR), ','
                      ORDER BY c_custkey) AS keys_asc,
           string_agg(c_mktsegment, '|'
                      ORDER BY c_custkey DESC) AS segs_desc,
           md5(string_agg(CAST(c_custkey AS VARCHAR), ','
                          ORDER BY c_custkey)) AS keys_md5
    FROM c GROUP BY nk ORDER BY nk
    """,
)
def listagg_gauntlet_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg) — the
    notoriously engine-divergent SQL surface, pinned in its ONLY
    portable form: an explicit ORDER BY inside the aggregate over a
    unique key. Spark has no ordered string_agg, so the engine
    builds sort_array(collect_list(struct(key, payload))) and
    concat_ws's the payloads — same ascending/descending orders,
    plus an md5 over the joined string proving byte equality, not
    just same-length. Deterministic customer subset keeps rows
    bounded."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 37 == 0)
        .select(
            F.col("c_nationkey").alias("nk"), "c_custkey", "c_mktsegment"
        )
    )

    def ordered_join(payload, sep, desc=False):
        entries = F.sort_array(
            F.collect_list(F.struct(F.col("c_custkey").alias("k"), payload)),
            asc=not desc,
        )
        return F.array_join(
            F.transform(entries, lambda s: s["p"].cast("string")), sep
        )

    return (
        c.groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            ordered_join(
                F.col("c_custkey").cast("string").alias("p"), ","
            ).alias("keys_asc"),
            ordered_join(F.col("c_mktsegment").alias("p"), "|", desc=True).alias(
                "segs_desc"
            ),
            F.md5(
                ordered_join(
                    F.col("c_custkey").cast("string").alias("p"), ","
                )
            ).alias("keys_md5"),
        )
        .orderBy("nk")
    )


#: quadratic-mix side hash of a duplicate-cluster root: test iff
#: hash % 5 == 0 (~20%). Pure BIGINT, identical text on both engines.
_SPLIT_HASH = (
    "((((root % 2147483647) * 1103515245 + 12345) % 2147483647)"
    " * ((((root % 2147483647) * 1103515245 + 12345) % 2147483647) + 1)"
    " + 987654321) % 2147483647 % 5"
)


@_staged(
    "leakage_safe_split_docs",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tokens) - 1),
                                   i -> array_to_string(
                                          list_slice(tokens, i, i + 2), ' ')))
               AS shingle
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
    ), roots AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(m.mn, d.doc_id)) AS root
      FROM documents d
      LEFT JOIN (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
        ON m.src = d.doc_id
    ), sided AS (
      SELECT r.doc_id, r.root,
             CASE WHEN {_SPLIT_HASH} = 0 THEN 'test' ELSE 'train' END
               AS side,
             length(d.text) AS chars
      FROM roots r JOIN documents d ON d.doc_id = r.doc_id
    ), crossing AS (
      SELECT CAST(count(*) AS BIGINT) AS x
      FROM jac_pairs p
      JOIN sided sa ON sa.doc_id = p.doc_a
      JOIN sided sb ON sb.doc_id = p.doc_b
      WHERE sa.side <> sb.side
    )
    SELECT s.side,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT s.root) AS BIGINT) AS n_clusters,
           CAST(sum(s.chars) AS BIGINT) AS sum_chars,
           CAST(sum(s.doc_id) AS BIGINT) AS id_checksum,
           c.x AS crossing_pairs
    FROM sided s CROSS JOIN crossing c
    GROUP BY s.side, c.x ORDER BY s.side
    """,
)
def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated train/test split — the split a benchmark-safe
    corpus actually needs: near-duplicate CLUSTERS (exact 3-shingle
    Jaccard >= 0.5 pairs -> connected components) are assigned to a
    side ATOMICALLY by hashing the cluster root, so no near-dup pair
    can straddle the boundary (a doc-level hash split leaks ~J of
    every test doc into train). Engine: prefix-filtered exact pairs
    -> min-label components -> quadratic-mix side hash; oracle:
    all-shingle pairs -> recursive-CTE closure -> the same hash.
    ``crossing_pairs`` is COMPUTED on both sides (join over the
    split assignment), not asserted — the invariant is part of the
    result contract, and the per-side doc/cluster/char checksums pin
    the full assignment."""
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        connected_components,
        prefix_filter_jaccard_pairs,
    )
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = prefix_filter_jaccard_pairs(
        d, n=3, threshold=0.5
    ).select("doc_a", "doc_b").localCheckpoint(eager=True)
    comps = connected_components(pairs)
    roots = (
        d.join(comps, d["doc_id"] == comps["node"], "left")
        .select(
            "doc_id",
            F.least(
                F.col("doc_id"), F.coalesce(F.col("component"), F.col("doc_id"))
            ).alias("root"),
            F.length("text").cast("long").alias("chars"),
        )
    )
    sided = roots.withColumn(
        "side",
        F.when(F.expr(_SPLIT_HASH) == 0, F.lit("test")).otherwise(
            F.lit("train")
        ),
    ).localCheckpoint(eager=True)
    sa = sided.select(F.col("doc_id").alias("doc_a"), F.col("side").alias("_sa"))
    sb = sided.select(F.col("doc_id").alias("doc_b"), F.col("side").alias("_sb"))
    crossing = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("_sa") != F.col("_sb"))
        .count()
    )
    return (
        sided.groupBy("side")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("root").cast("long").alias("n_clusters"),
            F.sum("chars").cast("long").alias("sum_chars"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .withColumn("crossing_pairs", F.lit(crossing).cast("long"))
        .orderBy("side")
    )


@_staged(
    "diff_in_diff_events",
    """
    WITH base AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'control' END
               AS grp,
             CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN 'post' ELSE 'pre' END AS period,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cells AS (
      SELECT grp, period,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             sum(cents) * 10000 // count(*) AS mean_q
      FROM base GROUP BY grp, period
    ),
    wide AS (
      SELECT
        max(CASE WHEN grp = 'treat' AND period = 'post' THEN mean_q END)
          AS tp,
        max(CASE WHEN grp = 'treat' AND period = 'pre' THEN mean_q END)
          AS tr,
        max(CASE WHEN grp = 'control' AND period = 'post' THEN mean_q END)
          AS cp,
        max(CASE WHEN grp = 'control' AND period = 'pre' THEN mean_q END)
          AS cr
      FROM cells
    )
    SELECT c.grp, c.period, c.n, c.total_cents,
           CAST(c.mean_q AS BIGINT) AS mean_q,
           CAST((w.tp - w.tr) - (w.cp - w.cr) AS BIGINT) AS did_q
    FROM cells c CROSS JOIN wide w
    ORDER BY c.grp, c.period
    """,
)
def diff_in_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the pre/post × treat/control
    2×2 that separates a treatment effect from the shared time
    trend: DiD = (treat_post − treat_pre) − (control_post −
    control_pre). Deterministic assignment (user parity; Jan 16
    cutover), every cell mean an exact BIGINT deci-milli quotient,
    the estimate carried on all four rows. One map-side-combinable
    aggregate over the facts; the 2×2 pivot runs on FOUR rows."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events")
    base = e.select(
        F.when(F.col("user_id") % 2 == 1, "treat")
        .otherwise("control")
        .alias("grp"),
        F.when(
            F.to_date("ts") >= F.lit("2024-01-16").cast("date"), "post"
        )
        .otherwise("pre")
        .alias("period"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = base.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr("sum(cents) * 10000L div count(*)").alias("mean_q"),
    )
    wide = cells.agg(
        F.max(
            F.when(
                (F.col("grp") == "treat") & (F.col("period") == "post"),
                F.col("mean_q"),
            )
        ).alias("tp"),
        F.max(
            F.when(
                (F.col("grp") == "treat") & (F.col("period") == "pre"),
                F.col("mean_q"),
            )
        ).alias("tr"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "post"),
                F.col("mean_q"),
            )
        ).alias("cp"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "pre"),
                F.col("mean_q"),
            )
        ).alias("cr"),
    )
    return (
        cells.crossJoin(F.broadcast(wide))
        .select(
            "grp",
            "period",
            "n",
            "total_cents",
            F.col("mean_q").cast("long").alias("mean_q"),
            (
                (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))
            )
            .cast("long")
            .alias("did_q"),
        )
        .orderBy("grp", "period")
    )


_AMS_H = (
    "(((u * 131 + k * 1299709 + 12345) % 2147483647)"
    " * (((u * 131 + k * 1299709 + 12345) % 2147483647) + 1)"
    " + 987654321) % 2147483647"
)
_AMS_SIGN = f"CASE WHEN ({_AMS_H}) % 2 = 0 THEN 1 ELSE -1 END"


@_staged(
    "ams_f2_users",
    f"""
    WITH f AS (
      SELECT user_id AS u, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    lanes AS (
      SELECT ks.k, CAST(sum(f.cnt * ({_AMS_SIGN})) AS BIGINT) AS s
      FROM f CROSS JOIN (SELECT unnest(range(0, 16)) AS k) ks
      GROUP BY ks.k
    ),
    grp AS (
      SELECT k // 4 AS g, CAST(sum(s * s) // 4 AS BIGINT) AS mean4
      FROM lanes GROUP BY 1
    ),
    med AS (
      SELECT CAST(mean4 AS BIGINT) AS est
      FROM (SELECT mean4,
                   row_number() OVER (ORDER BY mean4, g) AS rk
            FROM grp)
      WHERE rk = 2
    ),
    exact AS (
      SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2,
             CAST(count(*) AS BIGINT) AS n_users
      FROM f
    )
    SELECT g.g AS lane_group, g.mean4,
           e.n_users, e.f2 AS exact_f2, m.est AS est_f2,
           CAST(m.est * 1000 // e.f2 AS BIGINT) AS ratio_millis
    FROM grp g CROSS JOIN med m CROSS JOIN exact e
    ORDER BY g.g
    """,
)
def ams_f2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" sketch for the second frequency moment
    F2 = Σ f_u² (the self-join size / skew statistic) — completing
    the sketch family next to HLL (F0), CMS (point freq), KMV
    (distinct/overlap), Misra-Gries (heavy hitters): 16 ±1 lanes
    from the quadratic-mix hash, estimate = lower median of four
    4-lane means of S_k². The efficient shape aggregates per-user
    counts FIRST (one shuffle), then runs the 16 lanes over the
    user frame — mergeable partials, integer-exact arithmetic
    end-to-end (sums of ±cnt, squares, div). The oracle replays
    every lane verbatim; exact F2 and the est/exact ratio ride
    along, so the row pins BOTH the sketch mechanics and its
    accuracy on this corpus."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events")
    f = e.groupBy(F.col("user_id").alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    lanes_k = spark.range(16).select(F.col("id").cast("long").alias("k"))
    lanes = (
        f.crossJoin(F.broadcast(lanes_k))
        .select("k", (F.col("cnt") * F.expr(_AMS_SIGN)).alias("c"))
        .groupBy("k")
        .agg(F.sum("c").cast("long").alias("s"))
    )
    grp = lanes.groupBy(F.expr("k div 4").alias("g")).agg(
        F.expr("sum(s * s) div 4").cast("long").alias("mean4")
    )
    med = (
        grp.alias("a")
        .join(
            F.broadcast(
                grp.select(F.col("g").alias("g2"), F.col("mean4").alias("m2"))
            ),
            (F.col("m2") < F.col("mean4"))
            | ((F.col("m2") == F.col("mean4")) & (F.col("g2") < F.col("g"))),
            "left",
        )
        .groupBy("g", "mean4")
        .agg(F.count("g2").alias("_nlt"))
        .filter(F.col("_nlt") == 1)
        .select(F.col("mean4").cast("long").alias("est"))
    )
    exact = f.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("f2"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    return (
        grp.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("g").alias("lane_group"),
            "mean4",
            "n_users",
            F.col("f2").alias("exact_f2"),
            F.col("est").alias("est_f2"),
            F.expr("est * 1000L div f2").alias("ratio_millis"),
        )
        .orderBy("lane_group")
    )


@_staged(
    "stream_quarantine_split",
    """
    WITH base AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             (event_type = 'error') AS tfail,
             (CAST(round(value * 100) AS BIGINT) % 7 = 0) AS vfail
      FROM events
    ),
    tagged AS (
      SELECT event_id, cents,
             CASE WHEN tfail AND vfail THEN 'quarantine:type_ok,v_mod'
                  WHEN tfail THEN 'quarantine:type_ok'
                  WHEN vfail THEN 'quarantine:v_mod'
                  ELSE 'landed' END AS bucket
      FROM base
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents_sum,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM tagged GROUP BY bucket ORDER BY bucket
    """,
)
def stream_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level dead-letter streaming ingest under the driver gate
    (streaming/ingest.py::stream_append_with_quarantine): events
    stream AvailableNow; rows failing any CHECK constraint land in a
    quarantine ACID table tagged with the sorted list of violated
    constraint names, clean rows land in the main ACID table —
    which satisfies its constraints by construction. The oracle
    recomputes the split straight from the source with the same
    predicates; counts and checksums must match BOTH tables' actual
    post-stream contents (read back through the ACID layer, not the
    in-flight frames)."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.streaming.ingest import (
        stream_append_with_quarantine,
    )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    root = tempfile.mkdtemp(prefix=f"quar_{uuid.uuid4().hex[:8]}_")
    q = stream_append_with_quarantine(
        stream.select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        ),
        table_path=f"{root}/main",
        quarantine_path=f"{root}/bad",
        checkpoint_dir=f"{root}/ckpt",
        constraints={
            "type_ok": "event_type != 'error'",
            "v_mod": "cents % 7 != 0",
        },
    )
    q.awaitTermination(600)

    main = (
        AcidTable(spark, f"{root}/main")
        .read()
        .select("event_id", "cents", F.lit("landed").alias("bucket"))
    )
    bad = (
        AcidTable(spark, f"{root}/bad")
        .read()
        .select(
            "event_id",
            "cents",
            F.concat(F.lit("quarantine:"), F.col("violated")).alias("bucket"),
        )
    )
    return (
        main.unionByName(bad)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("bucket")
    )


@_staged(
    "web_pipeline_chunks",
    """
    WITH f AS (
      SELECT source,
             CAST(6 + length(CAST(doc_id AS VARCHAR)) + 1 + length(text)
                  + CASE WHEN doc_id % 3 = 0 THEN 11 ELSE 0 END
                  + CASE WHEN doc_id % 5 = 0 THEN 5 ELSE 0 END
               AS BIGINT) AS v
      FROM documents
    ),
    c AS (
      SELECT source, v,
             (v - 1) // 150 + 1 AS n_chunks,
             CASE WHEN v >= 200 THEN (v - 200) // 150 + 1 ELSE 0 END
               AS n_full
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(v) AS BIGINT) AS sum_visible_len,
           CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
           CAST(sum(n_chunks - n_full) AS BIGINT) AS short_chunks,
           CAST(max(n_chunks) AS BIGINT) AS max_chunks_per_doc
    FROM c GROUP BY source ORDER BY source
    """,
)
def web_pipeline_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed web-corpus pipeline — the construction-oracle
    technique COMPOSES: each document is wrapped in the same hostile
    page as html_extract_docs, the engine then actually runs
    html_extract -> chunk_overlap(200/150) over the extracted
    visible text, and the oracle never touches HTML or chunks —
    it derives visible length in closed form from the construction
    rules and pushes it through the closed-form chunk-count algebra
    (full chunks are those with 200 chars in range; the rest are
    tails). Two real operators chained; one arithmetic oracle."""
    from dbt_lakehouse_aws_spark.llmops.corpus import chunk_overlap
    from dbt_lakehouse_aws_spark.llmops.text import html_extract
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("source", "doc_id", "text")
    html = F.concat(
        F.lit('<html><head><title>Doc &amp; '),
        F.col("doc_id").cast("string"),
        F.lit(
            '</title><script type="text/javascript">'
            'var x = "<p>not text</p>";</script></head><body class="c"><p>'
        ),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit('<a href="/l1">click here</a>')
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit('<A HREF="/l2">more</A>')
        ).otherwise(F.lit("")),
        F.lit("<style>.c{color:red}</style></body></html>"),
    )
    x = html_extract(d.withColumn("html", html), "html").select(
        "source", "doc_id", "visible_text", "visible_len"
    )
    chunks = chunk_overlap(x, text_col="visible_text", size=200, stride=150)
    per_doc = chunks.groupBy("source", "doc_id", "visible_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("chunk_len") < 200, 1).otherwise(0))
        .cast("long")
        .alias("n_short"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("visible_len").cast("long").alias("sum_visible_len"),
            F.sum("n_chunks").cast("long").alias("total_chunks"),
            F.sum("n_short").cast("long").alias("short_chunks"),
            F.max("n_chunks").cast("long").alias("max_chunks_per_doc"),
        )
        .orderBy("source")
    )


@_staged(
    "incremental_join_maintenance",
    """
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta algebra
    Δ(O⋈C) = ΔO⋈C ∪ O⋈ΔC ∪ ΔO⋈ΔC, the identity every streaming
    materialized-view engine is built on: the standing MV is
    old-orders⋈old-customers (aggregated per nation), then a batch
    of late orders AND a batch of late-arriving customer rows land
    together, and the engine refreshes by aggregating ONLY the three
    delta terms and monoid-merging them into the MV's partial state
    — history is never rescanned (the old⋈old term is reused as-is).
    The oracle recomputes the full join from scratch: partial-state
    merge must equal full recompute, per nation, in exact cents."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderdate") < F.lit("1996-01-01").cast("date")).alias(
            "_old"
        ),
    )
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_custkey") % 10 != 0).alias("_old"),
    )
    o_old, o_new = o.filter("_old").drop("_old"), o.filter("NOT _old").drop("_old")
    c_old, c_new = c.filter("_old").drop("_old"), c.filter("NOT _old").drop("_old")

    def agg(orders, custs):
        return (
            orders.join(custs, orders["o_custkey"] == custs["c_custkey"])
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("s"),
            )
        )

    mv = agg(o_old, c_old)  # the standing view's partial state
    deltas = [agg(o_new, c_old), agg(o_old, c_new), agg(o_new, c_new)]
    merged = mv
    for term in deltas:
        merged = merged.unionByName(term)
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("s").cast("long").alias("cents"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"), "n_orders", "cents"
        )
        .orderBy("nationkey")
    )


@_staged(
    "trimmed_mean_orders",
    """
    WITH o AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY round(o_totalprice * 100),
                                         o_orderkey) AS r,
             count(*) OVER (PARTITION BY o_orderpriority) AS ng
      FROM orders
    ),
    kept AS (
      SELECT pri, cents, ng, ng // 20 AS k
      FROM o WHERE r > ng // 20 AND r <= ng - ng // 20
    )
    SELECT pri,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(max(k) AS BIGINT) AS n_trimmed_each_side,
           CAST(sum(cents) AS BIGINT) AS kept_cents,
           CAST(sum(cents) AS BIGINT) * 10000 // CAST(count(*) AS BIGINT)
             AS trimmed_mean_q
    FROM kept GROUP BY pri ORDER BY pri
    """,
)
def trimmed_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per priority — the robust-location estimator
    between the mean (0% trim, breakdown 0) and the median (50%,
    already covered by weighted_median/a8): drop the bottom and top
    ng div 20 rows by (value, key) rank, average the rest as an
    exact BIGINT quotient. Per-group ranks come from ONE global
    two-pass rank + broadcast group offsets (the quantile_normalize
    device) — never a per-priority one-task window, so five huge
    groups still spread over every partition. Oracle = DuckDB's
    native per-group window."""
    from dbt_lakehouse_aws_spark.operators.windows import global_row_number
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    g = global_row_number(
        o,
        [F.asc("pri"), F.asc("cents"), F.asc("o_orderkey")],
        name="_grn",
    )
    stats = g.groupBy("pri").agg(
        F.min("_grn").alias("_g0"), F.count(F.lit(1)).alias("ng")
    )
    ranked = g.join(F.broadcast(stats), "pri").withColumn(
        "r", F.col("_grn") - F.col("_g0") + 1
    )
    kept = ranked.filter(
        (F.col("r") > F.expr("ng div 20"))
        & (F.col("r") <= F.col("ng") - F.expr("ng div 20"))
    )
    return (
        kept.groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max(F.expr("ng div 20")).cast("long").alias(
                "n_trimmed_each_side"
            ),
            F.sum("cents").cast("long").alias("kept_cents"),
            F.expr("sum(cents) * 10000L div count(*)").alias(
                "trimmed_mean_q"
            ),
        )
        .orderBy("pri")
    )


@_staged(
    "correlation_matrix_lineitem",
    """
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ),
    s AS (
      SELECT flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
             CAST(sum(d) AS BIGINT) AS sd,
             CAST(sum(q * q) AS BIGINT) AS sqq,
             CAST(sum(p * p) AS BIGINT) AS spp,
             CAST(sum(d * d) AS BIGINT) AS sdd,
             CAST(sum(q * p) AS BIGINT) AS sqp,
             CAST(sum(q * d) AS BIGINT) AS sqd,
             CAST(sum(p * d) AS BIGINT) AS spd
      FROM x GROUP BY flag
    )
    SELECT flag, n,
           floor((CAST(n AS DOUBLE) * sqp - CAST(sq AS DOUBLE) * sp)
             / nullif(sqrt((CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq)
                    * (CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)), 0.0)
             * 1e6 + 0.5) / 1e6 AS r_qty_price,
           floor((CAST(n AS DOUBLE) * sqd - CAST(sq AS DOUBLE) * sd)
             / nullif(sqrt((CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq)
                    * (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)), 0.0)
             * 1e6 + 0.5) / 1e6 AS r_qty_disc,
           floor((CAST(n AS DOUBLE) * spd - CAST(sp AS DOUBLE) * sd)
             / nullif(sqrt((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
                    * (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)), 0.0)
             * 1e6 + 0.5) / 1e6 AS r_price_disc
    FROM s ORDER BY flag
    """,
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over three lineitem
    measures per return flag — the EDA matrix, from INTEGER
    sufficient statistics (n, Σx, Σxy for every pair in ONE
    map-side-combinable pass; quantities/cents are exact BIGINTs, so
    the only floats are the final three quotients, floor-quantized
    to 1e-6 with identical op order on both engines — the ACF
    device, widened to the full pair matrix)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
    )
    s = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("p") * F.col("d")).alias("spd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        num = (
            F.col("n").cast("double") * F.col(sxy)
            - F.col(sx).cast("double") * F.col(sy)
        )
        den = F.sqrt(
            (
                F.col("n").cast("double") * F.col(sxx)
                - F.col(sx).cast("double") * F.col(sx)
            )
            * (
                F.col("n").cast("double") * F.col(syy)
                - F.col(sy).cast("double") * F.col(sy)
            )
        )
        return F.floor(num / F.nullif(den, F.lit(0.0)) * 1e6 + 0.5) / 1e6

    return s.select(
        "flag",
        "n",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("r_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("r_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("r_price_disc"),
    ).orderBy("flag")


@_staged(
    "welch_ttest_events",
    """
    WITH x AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS grp,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_type, grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(cents * cents) AS BIGINT) AS sxx
      FROM x GROUP BY 1, 2
    ),
    w AS (
      SELECT a.event_type,
             a.n AS n1, b.n AS n2,
             CAST(a.sx AS DOUBLE) / a.n AS m1,
             CAST(b.sx AS DOUBLE) / b.n AS m2,
             (CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * a.sx / a.n)
               / (a.n - 1) AS v1,
             (CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE) * b.sx / b.n)
               / (b.n - 1) AS v2
      FROM s a JOIN s b
        ON b.event_type = a.event_type AND a.grp = 1 AND b.grp = 0
    )
    SELECT event_type, n1, n2,
           floor((m1 - m2) * 1e6 + 0.5) / 1e6 AS mean_diff,
           floor((m1 - m2) / sqrt(v1 / n1 + v2 / n2) * 1e6 + 0.5) / 1e6
             AS t_stat,
           floor((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / (v1 / n1 * (v1 / n1) / (n1 - 1)
                    + v2 / n2 * (v2 / n2) / (n2 - 1)) * 1e6 + 0.5) / 1e6
             AS welch_df
    FROM w ORDER BY event_type
    """,
)
def welch_ttest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per event type — the means
    companion to abtest_conversion_ztest's proportions: treatment =
    odd user ids, t statistic and Welch–Satterthwaite degrees of
    freedom from INTEGER sufficient statistics (n, Σx, Σx² per cell
    in one pass), the only floats the final expressions, evaluated
    in the same operation order on both engines and floor-quantized
    to 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = e.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("sxx"),
    )
    a = s.filter("grp = 1").select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("sx").alias("sx1"),
        F.col("sxx").alias("sxx1"),
    )
    b = s.filter("grp = 0").select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("sx").alias("sx2"),
        F.col("sxx").alias("sxx2"),
    )
    j = a.join(b, "event_type")
    m1 = F.col("sx1").cast("double") / F.col("n1")
    m2 = F.col("sx2").cast("double") / F.col("n2")
    v1 = (
        F.col("sxx1").cast("double")
        - F.col("sx1").cast("double") * F.col("sx1") / F.col("n1")
    ) / (F.col("n1") - 1)
    v2 = (
        F.col("sxx2").cast("double")
        - F.col("sx2").cast("double") * F.col("sx2") / F.col("n2")
    ) / (F.col("n2") - 1)
    se2_1 = v1 / F.col("n1")
    se2_2 = v2 / F.col("n2")

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return j.select(
        "event_type",
        "n1",
        "n2",
        q6(m1 - m2).alias("mean_diff"),
        q6((m1 - m2) / F.sqrt(se2_1 + se2_2)).alias("t_stat"),
        q6(
            (se2_1 + se2_2)
            * (se2_1 + se2_2)
            / (
                se2_1 * se2_1 / (F.col("n1") - 1)
                + se2_2 * se2_2 / (F.col("n2") - 1)
            )
        ).alias("welch_df"),
    ).orderBy("event_type")


@_staged(
    "readability_by_lang",
    """
    WITH c AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             CAST(greatest(length(text) - length(replace(text, '.', '')),
                           1) AS BIGINT) AS sentences,
             CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
               AS vgroups
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS total_words,
           CAST(sum(sentences) AS BIGINT) AS total_sentences,
           CAST(sum(vgroups) AS BIGINT) AS total_vgroups,
           floor((206.835
                  - 1.015 * (CAST(sum(words) AS DOUBLE) / sum(sentences))
                  - 84.6 * (CAST(sum(vgroups) AS DOUBLE) / sum(words)))
                 * 1e6 + 0.5) / 1e6 AS flesch_q
    FROM c GROUP BY lang ORDER BY lang
    """,
)
def readability_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per language — the classic
    quality-filter feature, with vowel GROUPS as the portable
    syllable proxy: words, sentence terminators, and vowel-group
    counts are EXACT integers (regexp_count of '[aeiou]+' —
    identical in Java and RE2), aggregated per language before the
    single float readability expression (per-row floats averaged
    later would be summation-order-dependent; corpus-level ratios
    are one deterministic expression), floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select("lang", "text")
    c = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.greatest(
            F.length("text") - F.length(F.replace(F.col("text"), F.lit("."), F.lit(""))),
            F.lit(1),
        )
        .cast("long")
        .alias("sentences"),
        F.regexp_count(F.col("text"), F.lit("[aeiou]+"))
        .cast("long")
        .alias("vgroups"),
    )
    agg = c.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("total_words"),
        F.sum("sentences").cast("long").alias("total_sentences"),
        F.sum("vgroups").cast("long").alias("total_vgroups"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("total_words").cast("double") / F.col("total_sentences"))
        - F.lit(84.6)
        * (F.col("total_vgroups").cast("double") / F.col("total_words"))
    )
    return agg.withColumn(
        "flesch_q", F.floor(flesch * 1e6 + 0.5) / 1e6
    ).orderBy("lang")


@_staged(
    "mann_whitney_by_type",
    """
    WITH x AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    vt AS (
      SELECT v, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM x GROUP BY 1, 2
    ),
    cells AS (
      SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt FROM vt GROUP BY 1
    ),
    ranked AS (
      SELECT v, 2 * sum(cnt) OVER (ORDER BY v) - cnt + 1 AS rank2
      FROM cells
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_tot,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie
      FROM cells
    ),
    per_type AS (
      SELECT vt.event_type,
             CAST(sum(vt.cnt) AS BIGINT) AS n,
             CAST(sum(vt.cnt * r.rank2) AS BIGINT) AS r2
      FROM vt JOIN ranked r ON r.v = vt.v
      GROUP BY 1
    )
    SELECT event_type, n,
           r2 - n * (n + 1) AS u2,
           floor((CAST(r2 - n * (n + 1) AS DOUBLE) - n * (n_tot - n))
                 / (2 * sqrt(CAST(n AS DOUBLE) * (n_tot - n) / 12
                             * ((n_tot + 1) - CAST(tie AS DOUBLE)
                                          / (CAST(n_tot AS DOUBLE) * (n_tot - 1)))))
                 * 1e6 + 0.5) / 1e6 AS z_q
    FROM per_type CROSS JOIN tot
    ORDER BY event_type
    """,
)
def mann_whitney_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) per event type vs the rest
    — the nonparametric companion to welch_ttest_events, on the same
    distribution-free footing as ks_drift_order_values. The whole
    test reduces to VALUE-LEVEL counts: average ranks are kept as
    2×rank INTEGERS (2·cum_before + cnt + 1 — ties share the exact
    half-unit midrank with no floats), the rank-sum R, U = R−n(n+1)/2
    (returned as exact u2 = 2U BIGINT), and the tie-corrected normal
    approximation z — the ONLY float expression, evaluated in the
    same operation order on both engines from exact integers and
    floor-quantized 1e-6. Engine ranks ride
    operators/windows.py::prefix_sum (no one-task window; the
    value-level frame is |distinct cents|, bounded by the metric's
    domain, not row count); the oracle uses a plain windowed
    cumulative — two plans, identical integers. tie-term Σ(t³−t)
    stays in BIGINT for N up to ~2.6M equal values (2^63^(1/3));
    beyond that switch the tie sum to DECIMAL(38,0)."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    vt = e.groupBy("v", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cells = vt.groupBy("v").agg(F.sum("cnt").cast("long").alias("cnt"))
    ranked = prefix_sum(cells, [F.asc("v")], "cnt", name="c_incl").select(
        "v", (2 * F.col("c_incl") - F.col("cnt") + 1).alias("rank2")
    )
    tot = cells.agg(
        F.sum("cnt").cast("long").alias("n_tot"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie"),
    )
    per_type = (
        vt.join(ranked, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.col("cnt") * F.col("rank2")).cast("long").alias("r2"),
        )
    )
    n, N = F.col("n"), F.col("n_tot")
    u2 = F.col("r2") - n * (n + 1)
    var = (
        n.cast("double")
        * (N - n)
        / 12
        * ((N + 1) - F.col("tie").cast("double") / (N.cast("double") * (N - 1)))
    )
    z = (u2.cast("double") - n * (N - n)) / (2 * F.sqrt(var))
    return (
        per_type.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n",
            u2.alias("u2"),
            (F.floor(z * 1e6 + 0.5) / 1e6).alias("z_q"),
        )
        .orderBy("event_type")
    )


@_staged(
    "spearman_qty_price",
    """
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem
    ),
    qr AS (
      SELECT q, 2 * sum(cnt) OVER (ORDER BY q) - cnt + 1 AS rank2
      FROM (SELECT q, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY 1)
    ),
    pr AS (
      SELECT p, 2 * sum(cnt) OVER (ORDER BY p) - cnt + 1 AS rank2
      FROM (SELECT p, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY 1)
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qr.rank2) AS DOUBLE) AS sx,
             CAST(sum(pr.rank2) AS DOUBLE) AS sy,
             CAST(sum(qr.rank2 * qr.rank2) AS DOUBLE) AS sxx,
             CAST(sum(pr.rank2 * pr.rank2) AS DOUBLE) AS syy,
             CAST(sum(qr.rank2 * pr.rank2) AS DOUBLE) AS sxy
      FROM li JOIN qr ON qr.q = li.q JOIN pr ON pr.p = li.p
    )
    SELECT n,
           floor((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 1e6 + 0.5) / 1e6 AS spearman_rho
    FROM s
    """,
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price
    — Pearson on midranks, with the ranks kept as 2×rank INTEGERS
    (exact tie midranks, same half-unit device as
    mann_whitney_by_type) so every sufficient statistic is an exact
    integer: Σr2x, Σr2y, Σr2x², Σr2y², Σr2x·r2y accumulate in
    DECIMAL(38,0) on the engine / HUGEINT in the oracle (no
    float-summation order dependence, no BIGINT overflow: Σrank2²
    passes 2^63 around 2M rows), then ONE double expression — same
    operation order on both engines — floor-quantized 1e-6. Rank
    tables are VALUE-LEVEL (|distinct| rows, built on
    operators/windows.py::prefix_sum, no one-task window); the
    row-level frame joins both rank tables on their value keys —
    quantity's 50-row table broadcasts, the price table is a hash
    join on p — and collapses to one sufficient-stat row."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
    )

    def rank2_table(key: str) -> DataFrame:
        cells = li.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        return prefix_sum(cells, [F.asc(key)], "cnt", name="c_incl").select(
            key, (2 * F.col("c_incl") - F.col("cnt") + 1).alias(f"rank2_{key}")
        )

    joined = li.join(F.broadcast(rank2_table("q")), "q").join(rank2_table("p"), "p")
    rx, ry = F.col("rank2_q"), F.col("rank2_p")
    dec = "decimal(38,0)"
    s = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rx.cast(dec)).cast("double").alias("sx"),
        F.sum(ry.cast(dec)).cast("double").alias("sy"),
        F.sum((rx * rx).cast(dec)).cast("double").alias("sxx"),
        F.sum((ry * ry).cast(dec)).cast("double").alias("syy"),
        F.sum((rx * ry).cast(dec)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    rho = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "n", (F.floor(rho * 1e6 + 0.5) / 1e6).alias("spearman_rho")
    )


@_staged(
    "decision_stump_orders",
    """
    WITH lab AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 500000 AS bin,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    h AS (
      SELECT bin, CAST(sum(pos) AS BIGINT) AS p,
             CAST(sum(1 - pos) AS BIGINT) AS g
      FROM lab GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(p) AS BIGINT) AS pt, CAST(sum(g) AS BIGINT) AS gt,
             CAST(max(bin) AS BIGINT) AS max_bin
      FROM h
    ),
    cum AS (
      SELECT a.bin,
             CAST(sum(b.p) AS BIGINT) AS pl, CAST(sum(b.g) AS BIGINT) AS gl
      FROM h a JOIN h b ON b.bin <= a.bin
      GROUP BY a.bin
    ),
    scored AS (
      SELECT cum.bin,
             pl, gl, pt - pl AS pr, gt - gl AS gr,
             1 - ((CAST(pl AS DOUBLE) * pl + CAST(gl AS DOUBLE) * gl)
                    / (pl + gl)
                  + (CAST(pt - pl AS DOUBLE) * (pt - pl)
                     + CAST(gt - gl AS DOUBLE) * (gt - gl))
                    / ((pt - pl) + (gt - gl)))
                 / (pt + gt) AS wgini,
             1 - (CAST(pt AS DOUBLE) * pt + CAST(gt AS DOUBLE) * gt)
                 / (CAST(pt + gt AS DOUBLE) * (pt + gt)) AS parent
      FROM cum CROSS JOIN tot
      WHERE cum.bin < tot.max_bin
    )
    SELECT (bin + 1) * 500000 AS threshold_cents,
           pl + gl AS n_left, pr + gr AS n_right, pl AS pos_left,
           pr AS pos_right,
           floor(wgini * 1e6 + 0.5) / 1e6 AS gini_q,
           floor((parent - wgini) * 1e6 + 0.5) / 1e6 AS gain_q
    FROM scored
    ORDER BY wgini ASC, bin ASC LIMIT 1
    """,
)
def decision_stump_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based decision-stump training — the split-finding
    kernel of gradient-boosted trees (LightGBM-style): predict
    urgent/high priority from total price by choosing the $5,000-bin
    boundary minimizing weighted Gini impurity. The feature is
    HISTOGRAMMED first (bins bounded by the price domain, NOT row
    count — the property that makes GBDT split finding feasible at
    100 TB: one aggregate pass to per-bin class counts, then all
    candidate splits scored from cumulative counts of a ~120-row
    frame via a tiny self-join, no second data pass). All counts are
    exact integers; the Gini expressions are single double formulas
    in identical operation order on both engines (an exact tie in
    wgini falls back to the smaller bin), floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        F.floor(F.round(F.col("o_totalprice") * 100).cast("long") / 500000)
        .cast("long")
        .alias("bin"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("pos"),
    )
    h = o.groupBy("bin").agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum(1 - F.col("pos")).cast("long").alias("g"),
    )
    tot = h.agg(
        F.sum("p").cast("long").alias("pt"),
        F.sum("g").cast("long").alias("gt"),
        F.max("bin").cast("long").alias("max_bin"),
    )
    b = h.select(
        F.col("bin").alias("b_bin"), F.col("p").alias("b_p"), F.col("g").alias("b_g")
    )
    cum = (
        h.select("bin")
        .join(F.broadcast(b), F.col("b_bin") <= F.col("bin"))
        .groupBy("bin")
        .agg(
            F.sum("b_p").cast("long").alias("pl"),
            F.sum("b_g").cast("long").alias("gl"),
        )
    )
    pl, gl = F.col("pl"), F.col("gl")
    pt, gt = F.col("pt"), F.col("gt")
    pr, gr = pt - pl, gt - gl
    wgini = 1 - (
        (pl.cast("double") * pl + gl.cast("double") * gl) / (pl + gl)
        + (pr.cast("double") * pr + gr.cast("double") * gr) / (pr + gr)
    ) / (pt + gt)
    parent = 1 - (pt.cast("double") * pt + gt.cast("double") * gt) / (
        (pt + gt).cast("double") * (pt + gt)
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("bin") < F.col("max_bin"))
        .select(
            ((F.col("bin") + 1) * 500000).alias("threshold_cents"),
            (pl + gl).alias("n_left"),
            (pr + gr).alias("n_right"),
            pl.alias("pos_left"),
            pr.alias("pos_right"),
            (F.floor(wgini * 1e6 + 0.5) / 1e6).alias("gini_q"),
            (F.floor((parent - wgini) * 1e6 + 0.5) / 1e6).alias("gain_q"),
            wgini.alias("_w"),
            F.col("bin").alias("_b"),
        )
        .orderBy(F.asc("_w"), F.asc("_b"))
        .limit(1)
        .drop("_w", "_b")
    )


@_staged(
    "ols_price_qty_disc",
    """
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(CAST(count(*) AS BIGINT) AS BIGINT) AS n_i,
             CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS s2,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
             CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
             CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
             CAST(CAST(sum(x1 * y) AS BIGINT) AS DOUBLE) AS s1y,
             CAST(CAST(sum(x2 * y) AS BIGINT) AS DOUBLE) AS s2y,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM li
    ),
    beta AS (
      SELECT n_i, sy, s1y, s2y, syy, n,
             n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS det,
             sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
               + s2 * (s1y * s12 - s11 * s2y) AS d0,
             n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS d1,
             n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - s11 * s2) AS d2
      FROM s
    )
    SELECT n_i AS n,
           floor(d0 / det * 1e6 + 0.5) / 1e6 AS beta0_q,
           floor(d1 / det * 1e6 + 0.5) / 1e6 AS beta1_q,
           floor(d2 / det * 1e6 + 0.5) / 1e6 AS beta2_q,
           floor((1 - (syy - (d0 / det) * sy - (d1 / det) * s1y
                       - (d2 / det) * s2y)
                      / (syy - sy * sy / n))
                 * 1e6 + 0.5) / 1e6 AS r2_q
    FROM beta
    """,
)
def ols_price_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression (extended price ~
    quantity + discount, with intercept) — the normal equations
    solved by Cramer's rule on a 3×3 Gram matrix whose entries are
    INTEGER sufficient statistics from ONE aggregate pass (the
    multi-feature generalization of a3_regression_slope): n, Σx₁,
    Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y in BIGINT and Σy² in
    DECIMAL(38,0)/HUGEINT (y² crosses 2^63 near 100k rows of cents).
    No gradient iterations, no per-row floats — summation order
    cannot matter; the determinants and R² are single double
    expressions in identical operation order on both engines,
    floor-quantized 1e-6. At 100 TB this is one map-side-combined
    aggregate to 10 numbers, then O(1) driver math."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum(x1).cast("long").cast("double").alias("s1"),
        F.sum(x2).cast("long").cast("double").alias("s2"),
        F.sum(y).cast("long").cast("double").alias("sy"),
        F.sum(x1 * x1).cast("long").cast("double").alias("s11"),
        F.sum(x2 * x2).cast("long").cast("double").alias("s22"),
        F.sum(x1 * x2).cast("long").cast("double").alias("s12"),
        F.sum(x1 * y).cast("long").cast("double").alias("s1y"),
        F.sum(x2 * y).cast("long").cast("double").alias("s2y"),
        F.sum((y * y).cast("decimal(38,0)")).cast("double").alias("syy"),
    ).withColumn("n", F.col("n_i").cast("double"))
    n = F.col("n")
    s1, s2, sy = F.col("s1"), F.col("s2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    d0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    d1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    d2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    sse = syy - (d0 / det) * sy - (d1 / det) * s1y - (d2 / det) * s2y
    sst = syy - sy * sy / n

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return s.select(
        F.col("n_i").alias("n"),
        q6(d0 / det).alias("beta0_q"),
        q6(d1 / det).alias("beta1_q"),
        q6(d2 / det).alias("beta2_q"),
        q6(1 - sse / sst).alias("r2_q"),
    )


@_staged(
    "spatial_grid_nn_customers",
    """
    WITH c AS (
      SELECT c_custkey,
             (c_custkey * 48271) % 100000 AS cx,
             (c_custkey * 69621) % 100000 AS cy
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             (s_suppkey * 40692) % 100000 AS sx,
             (s_suppkey * 16807) % 100000 AS sy
      FROM supplier
    ),
    pairs AS (
      SELECT c.c_custkey,
             (c.cx - s.sx) * (c.cx - s.sx)
               + (c.cy - s.sy) * (c.cy - s.sy) AS d2,
             s.s_suppkey
      FROM c CROSS JOIN s
    )
    SELECT c_custkey,
           CAST(min(d2 * 100000 + s_suppkey) % 100000 AS BIGINT)
             AS nearest_suppkey,
           CAST(min(d2 * 100000 + s_suppkey) // 100000 AS BIGINT) AS d2
    FROM pairs
    WHERE d2 <= 64000000
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def spatial_grid_nn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial nearest-neighbor join: every customer
    site finds its closest supplier site within radius 8,000 on a
    synthetic 100k×100k integer plane (coordinates are LCG-mixed
    key residues — exact integers, replayable in SQL). The engine
    assigns suppliers to radius-sized grid cells and each customer
    probes only its 3×3 cell NEIGHBORHOOD (any point within R is at
    most one cell away — the standard fixed-radius-NN grid bound),
    so the join is O(points·9·cell density) and each cell pair is a
    co-partitioned hash join on (cellx, celly); the oracle
    brute-forces the full cross join — quadratic, fine at sf0.01 —
    and must agree exactly. Distances are integer d²; the argmin is
    packed d²·100000+suppkey so min() resolves ties to the smaller
    supplier key with NO floats anywhere (suppkey < 100000 at test
    SFs; repack with a wider radix at larger scale)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    R2 = 64000000
    CELL = 8000
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 100000).alias("cx"),
        ((F.col("c_custkey") * 69621) % 100000).alias("cy"),
    )
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 40692) % 100000).alias("sx"),
        ((F.col("s_suppkey") * 16807) % 100000).alias("sy"),
    ).select(
        "s_suppkey",
        "sx",
        "sy",
        F.floor(F.col("sx") / CELL).alias("cellx"),
        F.floor(F.col("sy") / CELL).alias("celly"),
    )
    probes = (
        c.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "c_custkey",
            "cx",
            "cy",
            (F.floor(F.col("cx") / CELL) + F.col("dx")).alias("cellx"),
            (F.floor(F.col("cy") / CELL) + F.col("dy")).alias("celly"),
        )
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    packed = F.min(d2 * 100000 + F.col("s_suppkey"))
    return (
        probes.join(s, ["cellx", "celly"])
        .filter(d2 <= R2)
        .groupBy("c_custkey")
        .agg(packed.alias("_pk"))
        .select(
            "c_custkey",
            (F.col("_pk") % 100000).cast("long").alias("nearest_suppkey"),
            F.floor(F.col("_pk") / 100000).cast("long").alias("d2"),
        )
        .orderBy("c_custkey")
    )


@_staged(
    "grouping_sets_events",
    """
    WITH e AS (
      SELECT event_type,
             CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS weekday,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT CAST(2 * grouping(event_type) + grouping(weekday) AS BIGINT)
             AS gid,
           event_type, weekday,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM e
    GROUP BY GROUPING SETS ((event_type), (weekday), ())
    ORDER BY gid, event_type NULLS FIRST, weekday NULLS FIRST
    """,
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id — the third member of the
    multi-aggregate family (cube_events_type_weekday and
    a12_rollup_revenue cover CUBE and ROLLUP): one shuffle computes
    the by-type, by-weekday, and grand-total aggregates, with
    grouping_id() disambiguating real NULLs from subtotal rows —
    the property that makes grouping sets usable at all downstream.
    Spark's grouping_id bit order (first listed column = MSB) is
    replayed in the oracle as 2·grouping(a)+grouping(b); integers
    throughout (counts + exact cents)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("weekday"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        e.groupingSets([["event_type"], ["weekday"], []], "event_type", "weekday")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select("gid", "event_type", "weekday", "n", "cents")
        .orderBy(
            "gid",
            F.col("event_type").asc_nulls_first(),
            F.col("weekday").asc_nulls_first(),
        )
    )


@_staged(
    "bitwise_gauntlet_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor,
           CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS popcount_sum,
           CAST(sum((o_orderkey >> 3) & 1) AS BIGINT) AS bit3_sum,
           CAST(sum((o_orderkey << 2) & 1048575) AS BIGINT) AS shl2_masked_sum,
           CAST(sum(o_orderkey >> 2) AS BIGINT) AS shr2_sum
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bitwise_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-function gauntlet: the bit_and/bit_or/bit_xor
    AGGREGATES (all three are commutative-associative monoids —
    map-side combinable, shuffle-safe in any partitioning) plus
    scalar popcount, bit test, masked shifts — each exactly
    integer-replayable. bit_xor over a key column is the classic
    cheap set-digest (two file lists with equal counts + equal xor
    are almost surely equal) and the same device the ACID layer's
    change-feed reconciliation uses."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.bit_and(k).cast("long").alias("key_and"),
            F.bit_or(k).cast("long").alias("key_or"),
            F.bit_xor(k).cast("long").alias("key_xor"),
            F.sum(F.bit_count(k)).cast("long").alias("popcount_sum"),
            F.sum(F.shiftright(k, 3).bitwiseAND(F.lit(1)))
            .cast("long")
            .alias("bit3_sum"),
            F.sum(F.shiftleft(k, 2).bitwiseAND(F.lit(1048575)))
            .cast("long")
            .alias("shl2_masked_sum"),
            F.sum(F.shiftright(k, 2)).cast("long").alias("shr2_sum"),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "dp_noisy_counts_events",
    """
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    seeded AS (
      SELECT event_type, n,
             (CAST(CAST('0x' || substr(
                    md5('dp-seed-1|' || event_type), 1, 15)
                  AS BIGINT) % 999999 AS DOUBLE) + 0.5) / 1000000 AS u
      FROM c
    )
    SELECT event_type,
           floor((n - 2.0 * CASE WHEN u > 0.5 THEN 1 ELSE -1 END
                        * ln(1 - abs(2 * u - 1)))
                 * 1e6 + 0.5) / 1e6 AS noisy_n_q
    FROM seeded ORDER BY event_type
    """,
)
def dp_noisy_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private event counts via the Laplace
    mechanism with a DETERMINISTIC seed: the uniform draw comes from
    the portable 60-bit md5 prefix of (seed|key) — the same
    cross-engine hash the MinHash oracle replays — pushed through
    the inverse Laplace CDF (b = sensitivity/ε = 1/0.5). Seeded DP
    is how production pipelines make private releases REPRODUCIBLE
    (re-running the job must not leak a fresh noise draw of the same
    statistic — the classic averaging attack); determinism is also
    what makes the mechanism value-oracle-able at all. ln() may
    differ across engines by ~1 ulp of a |value| ≤ ~14, i.e. 1e-15
    — nine orders below the 1e-6 quantum; the seed is fixed, so a
    green compare is stable, not a coin flip."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    c = T(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp-seed-1|"), F.col("event_type"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = ((h % 999999).cast("double") + 0.5) / 1000000
    noise = (
        F.lit(2.0)
        * F.when(u > 0.5, 1).otherwise(-1)
        * F.log(1 - F.abs(2 * u - 1))
    )
    return c.select(
        "event_type",
        (F.floor((F.col("n") - noise) * 1e6 + 0.5) / 1e6).alias("noisy_n_q"),
    ).orderBy("event_type")


@_staged(
    "item_cf_topk_parts",
    """
    WITH inter AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    capped AS (
      SELECT u, i FROM inter
      WHERE u IN (SELECT u FROM inter GROUP BY u HAVING count(*) <= 100)
    ),
    icnt AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n FROM capped GROUP BY i
    ),
    pairs AS (
      SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS co
      FROM capped a JOIN capped b ON b.u = a.u AND b.i <> a.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.i, p.j, p.co,
             CAST(floor(CAST(p.co AS DOUBLE)
                        / sqrt(CAST(ni.n AS DOUBLE) * nj.n)
                        * 1e6 + 0.5) AS BIGINT) AS score_q
      FROM pairs p
      JOIN icnt ni ON ni.i = p.i
      JOIN icnt nj ON nj.i = p.j
    ),
    top_items AS (
      SELECT i FROM icnt ORDER BY n DESC, i ASC LIMIT 20
    ),
    ranked AS (
      SELECT s.*, row_number() OVER (
               PARTITION BY s.i ORDER BY s.score_q DESC, s.j ASC) AS rk
      FROM scored s JOIN top_items t ON t.i = s.i
    )
    SELECT i, j, co, score_q, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY i, rk
    """,
)
def item_cf_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering — co-occurrence cosine,
    the workhorse recommender: customers×parts interactions from
    the orders⋈lineitem join, a DEGREE CAP (customers with ≤100
    distinct parts — the standard bound that keeps the self-join
    fan-out ≤ cap² per user instead of quadratic in the heaviest
    key), pair counts from a self-join co-partitioned on the user
    key, cosine co/√(nᵢ·nⱼ) QUANTIZED TO AN INTEGER score before
    ranking (ranks compare exact integers with a key tiebreak — a
    last-ulp float difference can never flip the top-k), top-3
    neighbors for the 20 most-interacted parts. The per-item window
    is partitioned by item — a hash exchange, never one task."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("u")
    )
    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("i")
    )
    inter = o.join(l, "ok").select("u", "i").distinct()
    deg_ok = inter.groupBy("u").count().filter(F.col("count") <= 100).select("u")
    capped = inter.join(deg_ok, "u").persist()
    icnt = capped.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("n"))
    top_items = icnt.orderBy(F.desc("n"), F.asc("i")).limit(20).select("i")
    # only pairs anchored at a top item ever reach the output, so the
    # anchor side shrinks to Σ_top n_i rows BEFORE the u-key self-join
    # — fan-out ≤ |top∩user|·deg per user instead of deg² — without
    # changing any score (co and n_j are computed over the full set).
    anchored = capped.join(F.broadcast(top_items), "i")
    b = capped.select("u", F.col("i").alias("j"))
    pairs = (
        anchored.join(b, "u")
        .filter(F.col("j") != F.col("i"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    scored = (
        pairs.join(F.broadcast(icnt.withColumnsRenamed({"i": "i", "n": "ni"})), "i")
        .join(
            F.broadcast(icnt.select(F.col("i").alias("j"), F.col("n").alias("nj"))),
            "j",
        )
        .select(
            "i",
            "j",
            "co",
            F.floor(
                F.col("co").cast("double")
                / F.sqrt(F.col("ni").cast("double") * F.col("nj"))
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("score_q"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("score_q"), F.asc("j"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("i", "j", "co", "score_q", "rk")
        .orderBy("i", "rk")
    )


@_staged(
    "max_drawdown_users",
    """
    WITH x AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             ts, event_id
      FROM events
    ),
    dd AS (
      SELECT user_id, CAST(max(runmax - cum) AS BIGINT) AS drawdown
      FROM (
        SELECT user_id, cum,
               max(cum) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS runmax
        FROM (
          SELECT user_id, ts, event_id,
                 sum(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS cum
          FROM x
        )
      )
      GROUP BY user_id
    )
    SELECT user_id, drawdown FROM dd
    ORDER BY drawdown DESC, user_id ASC LIMIT 20
    """,
)
def max_drawdown_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the classic risk statistic
    (largest peak-to-trough drop of the cumulative value series),
    all in exact integer cents: per-user running sum, per-user
    running MAX of that sum, max(peak − cum). Every window is
    PARTITIONED BY user — hash exchanges over millions of balanced
    keys, never a one-task global window — so the op scales with
    users × events-per-user; the total order inside each partition
    is (ts, event_id), deterministic under same-timestamp events.
    Top-20 drawdowns."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    x = T(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = x.withColumn("cum", F.sum("cents").over(wseq))
    dd = cum.withColumn(
        "runmax", F.max("cum").over(wseq)
    ).groupBy("user_id").agg(
        F.max(F.col("runmax") - F.col("cum")).cast("long").alias("drawdown")
    )
    return dd.orderBy(F.desc("drawdown"), F.asc("user_id")).limit(20)


@_staged(
    "fifo_match_returns_parts",
    """
    WITH li AS (
      SELECT l_partkey AS part,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * 100 / l_quantity + 0.5)
                  AS BIGINT) AS unit_cents,
             l_returnflag = 'R' AS is_sell,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem
    ),
    buys AS (
      SELECT part, qty, unit_cents,
             sum(qty) OVER (PARTITION BY part
                            ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS b_end
      FROM li WHERE NOT is_sell
    ),
    sells AS (
      SELECT part, qty,
             sum(qty) OVER (PARTITION BY part
                            ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS s_end
      FROM li WHERE is_sell
    ),
    matched AS (
      SELECT b.part,
             least(b.b_end, s.s_end)
               - greatest(b.b_end - b.qty, s.s_end - s.qty) AS m,
             b.unit_cents
      FROM buys b JOIN sells s
        ON s.part = b.part
       AND b.b_end - b.qty < s.s_end
       AND s.s_end - s.qty < b.b_end
    )
    SELECT part,
           CAST(sum(m) AS BIGINT) AS matched_qty,
           CAST(sum(m * unit_cents) AS BIGINT) AS matched_cost_cents,
           CAST(count(*) AS BIGINT) AS n_lots
    FROM matched GROUP BY part
    ORDER BY matched_qty DESC, part ASC LIMIT 20
    """,
)
def fifo_match_returns_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO cost allocation as INTERVAL ALGEBRA — the inventory/tax
    lot-matching kernel with no per-row iteration: per part, buys
    (non-return lineitems) and sells (returns) each get cumulative
    quantity intervals [cum−qty, cum) in ship order, and FIFO
    matching is exactly interval intersection — lot b fills return s
    by least(ends)−greatest(starts) whenever the intervals overlap.
    The sequential pop-the-queue algorithm becomes a self-join on
    (part, interval-overlap): per-part windows are hash exchanges,
    the overlap join touches O(lots + matches) pairs (each buy
    overlaps a contiguous run of sells — at most matches + lots
    pairs, never lots²), and every quantity/cost is an exact integer
    (unit price floor(·+0.5)-quantized to cents once, identically on
    both engines). Top-20 parts by matched quantity."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 / F.col("l_quantity") + 0.5)
        .cast("long")
        .alias("unit_cents"),
        (F.col("l_returnflag") == "R").alias("is_sell"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("part").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    buys = (
        li.filter(~F.col("is_sell"))
        .withColumn("b_end", F.sum("qty").over(w))
        .select("part", "qty", "unit_cents", "b_end")
    )
    sells = (
        li.filter(F.col("is_sell"))
        .withColumn("s_end", F.sum("qty").over(w))
        .select("part", F.col("qty").alias("s_qty"), "s_end")
    )
    m = F.least(F.col("b_end"), F.col("s_end")) - F.greatest(
        F.col("b_end") - F.col("qty"), F.col("s_end") - F.col("s_qty")
    )
    return (
        buys.join(
            sells,
            (sells["part"] == buys["part"])
            & (buys["b_end"] - buys["qty"] < sells["s_end"])
            & (sells["s_end"] - sells["s_qty"] < buys["b_end"]),
        )
        .drop(sells["part"])
        .groupBy("part")
        .agg(
            F.sum(m).cast("long").alias("matched_qty"),
            F.sum(m * F.col("unit_cents")).cast("long").alias("matched_cost_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lots"),
        )
        .orderBy(F.desc("matched_qty"), F.asc("part"))
        .limit(20)
    )


@_staged(
    "als_user_step_lineitem",
    """
    WITH r AS (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
             CAST(l.l_quantity AS BIGINT) AS rating
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    f AS (
      SELECT DISTINCT i,
             (i * 2654435761) % 1000 - 500 AS f1,
             (i * 40503) % 1000 - 500 AS f2
      FROM r
    ),
    s AS (
      SELECT r.u,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(f.f1 * f.f1) AS BIGINT) AS a11,
             CAST(sum(f.f1 * f.f2) AS BIGINT) AS a12,
             CAST(sum(f.f2 * f.f2) AS BIGINT) AS a22,
             CAST(sum(r.rating * f.f1) AS BIGINT) AS b1,
             CAST(sum(r.rating * f.f2) AS BIGINT) AS b2
      FROM r JOIN f ON f.i = r.i
      GROUP BY r.u
    ),
    solved AS (
      SELECT u, n,
             CAST(a11 AS DOUBLE) / 1e6 + 0.1 AS m11,
             CAST(a12 AS DOUBLE) / 1e6 AS m12,
             CAST(a22 AS DOUBLE) / 1e6 + 0.1 AS m22,
             CAST(b1 AS DOUBLE) / 1e3 AS v1,
             CAST(b2 AS DOUBLE) / 1e3 AS v2
      FROM s
    )
    SELECT u, n,
           floor((m22 * v1 - m12 * v2) / (m11 * m22 - m12 * m12)
                 * 1e6 + 0.5) / 1e6 AS x1_q,
           floor((m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12)
                 * 1e6 + 0.5) / 1e6 AS x2_q
    FROM solved ORDER BY n DESC, u ASC LIMIT 20
    """,
)
def als_user_step_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step — the building block of alternating
    least squares recommenders: with item factors FROZEN to
    hash-derived integer thousandths (deterministic init, exact in
    SQL), each user's rank-2 factor vector solves the 2×2 ridge
    system (A/1e6 + λI)x = b/1e3 in closed form. The Gram entries
    Σf₁², Σf₁f₂, Σf₂² and the right side Σr·f accumulate as exact
    INTEGERS (summation order can't matter — the trap in naive
    float-factor ALS), one map-side-combinable aggregate per user;
    the 2×2 Cramer solve is a single double expression, identical
    op order both engines, floor-quantized 1e-6. λ=0.1. At 100 TB
    this is precisely distributed ALS's shape: broadcast/join the
    frozen side, one grouped aggregate, per-key O(k²) solves.
    Top-20 users by rating count."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("u")
    )
    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("i"),
        F.col("l_quantity").cast("long").alias("rating"),
    )
    r = o.join(l, "ok").select("u", "i", "rating")
    f = r.select("i").distinct().select(
        "i",
        ((F.col("i") * 2654435761) % 1000 - 500).alias("f1"),
        ((F.col("i") * 40503) % 1000 - 500).alias("f2"),
    )
    s = (
        r.join(f, "i")
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("f1") * F.col("f1")).cast("long").alias("a11"),
            F.sum(F.col("f1") * F.col("f2")).cast("long").alias("a12"),
            F.sum(F.col("f2") * F.col("f2")).cast("long").alias("a22"),
            F.sum(F.col("rating") * F.col("f1")).cast("long").alias("b1"),
            F.sum(F.col("rating") * F.col("f2")).cast("long").alias("b2"),
        )
    )
    a11 = F.col("a11").cast("double") / 1e6 + 0.1
    a12 = F.col("a12").cast("double") / 1e6
    a22 = F.col("a22").cast("double") / 1e6 + 0.1
    b1 = F.col("b1").cast("double") / 1e3
    b2 = F.col("b2").cast("double") / 1e3
    det = a11 * a22 - a12 * a12
    x1 = (a22 * b1 - a12 * b2) / det
    x2 = (a11 * b2 - a12 * b1) / det

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return (
        s.select("u", "n", q6(x1).alias("x1_q"), q6(x2).alias("x2_q"))
        .orderBy(F.desc("n"), F.asc("u"))
        .limit(20)
    )


@_staged(
    "stl_lite_daily_events",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    ma AS (
      SELECT a.d, a.cents,
             CAST(sum(b.cents) AS BIGINT) AS sum7,
             CAST(count(*) AS BIGINT) AS n7
      FROM daily a JOIN daily b
        ON b.d BETWEEN a.d - INTERVAL 3 DAY AND a.d + INTERVAL 3 DAY
      GROUP BY a.d, a.cents
      HAVING count(*) = 7
    ),
    season AS (
      SELECT CAST(EXTRACT(dow FROM d) + 1 AS BIGINT) AS wd,
             CAST(sum(7 * cents - sum7) AS BIGINT) AS dsum,
             CAST(count(*) AS BIGINT) AS n
      FROM ma GROUP BY 1
    )
    SELECT ma.d, ma.cents,
           floor(CAST(ma.sum7 AS DOUBLE) / 7 * 1e6 + 0.5) / 1e6 AS trend_q,
           floor(CAST(s.dsum AS DOUBLE) / (7 * s.n) * 1e6 + 0.5) / 1e6
             AS seasonal_q,
           floor((ma.cents - CAST(ma.sum7 AS DOUBLE) / 7
                  - CAST(s.dsum AS DOUBLE) / (7 * s.n)) * 1e6 + 0.5) / 1e6
             AS remainder_q
    FROM ma JOIN season s ON s.wd = CAST(EXTRACT(dow FROM ma.d) + 1 AS BIGINT)
    ORDER BY ma.d
    """,
)
def stl_lite_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily revenue series —
    trend (centered 7-day moving average), weekday seasonal, and
    remainder, with EVERY aggregate exact: the detrended series is
    kept as the INTEGER 7·x − Σ₇ (multiplying through by the window
    size instead of averaging floats — per-row float residuals
    averaged later would be summation-order-dependent), so the
    seasonal means are single integer-ratio expressions. The moving
    window is a self-join on the DAY-level frame (bounded by the
    calendar, not row count — no global window funnel), edges
    dropped by the HAVING count = 7 full-window rule. Output is the
    full decomposition per day, floor-quantized 1e-6; remainder ≡
    x − trend − seasonal by construction."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    b = daily.select(F.col("d").alias("bd"), F.col("cents").alias("bcents"))
    ma = (
        daily.join(
            b,
            (F.col("bd") >= F.date_sub(F.col("d"), 3))
            & (F.col("bd") <= F.date_add(F.col("d"), 3)),
        )
        .groupBy("d", "cents")
        .agg(
            F.sum("bcents").cast("long").alias("sum7"),
            F.count(F.lit(1)).cast("long").alias("n7"),
        )
        .filter(F.col("n7") == 7)
    )
    season = ma.groupBy(F.dayofweek("d").cast("long").alias("wd")).agg(
        F.sum(7 * F.col("cents") - F.col("sum7")).cast("long").alias("dsum"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    trend = F.col("sum7").cast("double") / 7
    seasonal = F.col("dsum").cast("double") / (7 * F.col("n"))
    return (
        ma.join(
            F.broadcast(season),
            F.dayofweek(ma["d"]).cast("long") == F.col("wd"),
        )
        .select(
            "d",
            "cents",
            q6(trend).alias("trend_q"),
            q6(seasonal).alias("seasonal_q"),
            q6(F.col("cents") - trend - seasonal).alias("remainder_q"),
        )
        .orderBy("d")
    )


@_staged(
    "string_format_gauntlet_parts",
    """
    SELECT p_partkey,
           printf('%08d|%s', p_partkey, p_brand) AS tag,
           lpad(p_brand, 12, '*') AS lp,
           rpad(p_type, 16, '.') AS rp,
           translate(p_brand, '#', 'B') AS tr,
           repeat(right(p_brand, 2), 3) AS rep,
           reverse(p_type) AS rev,
           ascii(p_name) AS first_code,
           chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS bucket_chr,
           left(p_name, 5) AS l5,
           right(p_name, 4) AS r4,
           CAST(strpos(p_type, 'BRUSHED') AS BIGINT) AS brushed_at,
           substr(p_name, 2, 4) AS mid
    FROM part
    WHERE p_partkey % 97 = 0
    ORDER BY p_partkey
    """,
)
def string_format_gauntlet_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting/manipulation gauntlet over the cross-engine
    common surface: printf-style formatting (Java format_string and
    C printf agree on %08d/%s), lpad/rpad, translate, repeat,
    reverse, ascii/chr, left/right, instr/strpos (both 1-based,
    0 = absent), substr. Row-level function-surface proof on a
    deterministic key slice; everything is a pushed-down projection
    over one scan."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 == 0)
    return p.select(
        "p_partkey",
        F.format_string("%08d|%s", "p_partkey", "p_brand").alias("tag"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_type", 16, ".").alias("rp"),
        F.translate("p_brand", "#", "B").alias("tr"),
        F.repeat(F.substring(F.col("p_brand"), -2, 2), 3).alias("rep"),
        F.reverse("p_type").alias("rev"),
        F.ascii("p_name").alias("first_code"),
        F.chr(65 + (F.col("p_partkey") % 26)).alias("bucket_chr"),
        F.substring("p_name", 1, 5).alias("l5"),
        F.substring(F.col("p_name"), -4, 4).alias("r4"),
        F.instr("p_type", "BRUSHED").cast("long").alias("brushed_at"),
        F.substring("p_name", 2, 4).alias("mid"),
    ).orderBy("p_partkey")


@_staged(
    "markov_perplexity_events",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    c AS (
      SELECT prev, event_type, CAST(count(*) AS BIGINT) AS cij
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT prev, CAST(sum(cij) AS BIGINT) AS ci FROM c GROUP BY 1
    ),
    ll AS (
      SELECT CAST(sum(c.cij) AS BIGINT) AS n,
             sum(c.cij * ln(CAST(c.cij AS DOUBLE) / r.ci)) AS loglik
      FROM c JOIN r ON r.prev = c.prev
    )
    SELECT n,
           floor(loglik * 1e6 + 0.5) / 1e6 AS ll_q,
           floor(exp(-loglik / n) * 1e6 + 0.5) / 1e6 AS perplexity_q
    FROM ll
    """,
)
def markov_perplexity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the event stream under its own fitted
    first-order Markov model — the sequence-model companion to
    event_transition_matrix: per-user lag pairs (hash-partitioned
    windows), integer transition counts, in-sample log-likelihood
    Σ cᵢⱼ·ln(cᵢⱼ/cᵢ) and perplexity exp(−LL/N). The float sum runs
    over the |states|² cell frame (bounded by the type vocabulary,
    not rows), each term an exact-integer ratio through one ln —
    cross-engine drift ≤ |cells|·ulp ≈ 1e-10, four orders under the
    1e-6 quantum."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    )
    c = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cij"))
    )
    r = c.groupBy("prev").agg(F.sum("cij").cast("long").alias("ci"))
    ll = c.join(r, "prev").agg(
        F.sum("cij").cast("long").alias("n"),
        F.sum(
            F.col("cij") * F.log(F.col("cij").cast("double") / F.col("ci"))
        ).alias("loglik"),
    )
    return ll.select(
        "n",
        (F.floor(F.col("loglik") * 1e6 + 0.5) / 1e6).alias("ll_q"),
        (F.floor(F.exp(-F.col("loglik") / F.col("n")) * 1e6 + 0.5) / 1e6).alias(
            "perplexity_q"
        ),
    )


@_staged(
    "cramers_v_events",
    """
    WITH obs AS (
      SELECT event_type AS a,
             CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM obs GROUP BY 1),
    rb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM obs GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT a) AS BIGINT) AS ka,
                   CAST(count(DISTINCT b) AS BIGINT) AS kb
            FROM obs),
    chi AS (
      SELECT tot.n, tot.ka, tot.kb,
             sum((o - CAST(na AS DOUBLE) * nb / tot.n)
                 * (o - CAST(na AS DOUBLE) * nb / tot.n)
                 / (CAST(na AS DOUBLE) * nb / tot.n)) AS chi2
      FROM obs JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN tot
      GROUP BY tot.n, tot.ka, tot.kb
    )
    SELECT n, ka, kb,
           floor(chi2 * 1e6 + 0.5) / 1e6 AS chi2_q,
           floor(sqrt(chi2 / (n * (least(ka, kb) - 1))) * 1e6 + 0.5) / 1e6
             AS cramers_v_q
    FROM chi
    """,
)
def cramers_v_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event type and weekday — the
    symmetric-categorical effect size on top of the χ² machinery
    (chi2_terms_by_lang covers selection; this is the normalized
    association statistic): observed counts per (type, weekday)
    cell, expected = row·col/N, χ² summed over the |types|·|7| cell
    frame (bounded by the vocabularies), V = √(χ²/(N·(min(k)−1))).
    All counts exact integers; the float expression per cell is one
    fixed-order formula, drift orders below the 1e-6 quantum."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.dayofweek("ts").cast("long").alias("b"),
    )
    obs = e.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = obs.groupBy("a").agg(F.sum("o").cast("long").alias("na"))
    rb = obs.groupBy("b").agg(F.sum("o").cast("long").alias("nb"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("ka"),
        F.countDistinct("b").cast("long").alias("kb"),
    )
    exp_ = F.col("na").cast("double") * F.col("nb") / F.col("n")
    chi = (
        obs.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("n", "ka", "kb")
        .agg(
            F.sum((F.col("o") - exp_) * (F.col("o") - exp_) / exp_).alias("chi2")
        )
    )
    v = F.sqrt(
        F.col("chi2") / (F.col("n") * (F.least(F.col("ka"), F.col("kb")) - 1))
    )
    return chi.select(
        "n",
        "ka",
        "kb",
        (F.floor(F.col("chi2") * 1e6 + 0.5) / 1e6).alias("chi2_q"),
        (F.floor(v * 1e6 + 0.5) / 1e6).alias("cramers_v_q"),
    )


@_staged(
    "largest_remainder_allocation",
    """
    WITH li AS (
      SELECT l_orderkey AS ok, l_linenumber AS ln,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ),
    o AS (
      SELECT o_orderkey AS ok,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total
      FROM orders WHERE o_orderkey % 1000 = 0
    ),
    w AS (
      SELECT li.ok, li.ln, li.q, o.total,
             CAST(sum(li.q) OVER (PARTITION BY li.ok) AS BIGINT) AS qsum,
             CAST(count(*) OVER (PARTITION BY li.ok) AS BIGINT) AS n_lines
      FROM li JOIN o ON o.ok = li.ok
    ),
    base AS (
      SELECT ok, ln, n_lines, total,
             total * q // qsum AS alloc0,
             total * q % qsum AS rem,
             CAST(sum(total * q // qsum) OVER (PARTITION BY ok) AS BIGINT)
               AS base_sum
      FROM w
    ),
    ranked AS (
      SELECT ok, ln, n_lines, total,
             alloc0 + CASE WHEN row_number() OVER (
                             PARTITION BY ok
                             ORDER BY rem DESC, ln ASC)
                           <= total - base_sum
                      THEN 1 ELSE 0 END AS alloc
      FROM base
    )
    SELECT ok AS o_orderkey,
           CAST(max(n_lines) AS BIGINT) AS n_lines,
           CAST(max(total) AS BIGINT) AS total_cents,
           CAST(sum(alloc) AS BIGINT) AS sum_alloc,
           CAST(min(alloc) AS BIGINT) AS min_alloc,
           CAST(max(alloc) AS BIGINT) AS max_alloc
    FROM ranked GROUP BY ok ORDER BY ok
    """,
)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment — the financial
    proration kernel: distribute each order's total cents across its
    lineitems proportionally to quantity with NO lost cents. base =
    ⌊total·q/Q⌋ and remainder total·q mod Q are pure INTEGER
    arithmetic (never a float share rounded later — the classic
    penny-drift bug), the deficit total−Σbase goes one cent each to
    the largest remainders (line number breaking exact ties). All
    windows are per-order hash partitions; the output aggregates
    the invariant Σalloc = total per order, which the oracle's
    replay must also produce exactly."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            F.col("o_orderkey").alias("ok"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total"),
        )
    )
    wp = Window.partitionBy("ok")
    w = li.join(o, "ok").select(
        "ok",
        "ln",
        "q",
        "total",
        F.sum("q").over(wp).cast("long").alias("qsum"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n_lines"),
    )
    alloc0 = F.expr("total * q div qsum")  # true integer division, no float path
    base = w.select(
        "ok",
        "ln",
        "n_lines",
        "total",
        alloc0.alias("alloc0"),
        (F.col("total") * F.col("q") % F.col("qsum")).alias("rem"),
    ).withColumn("base_sum", F.sum("alloc0").over(wp).cast("long"))
    rk = F.row_number().over(
        Window.partitionBy("ok").orderBy(F.desc("rem"), F.asc("ln"))
    )
    ranked = base.select(
        "ok",
        "n_lines",
        "total",
        (
            F.col("alloc0")
            + F.when(rk <= F.col("total") - F.col("base_sum"), 1).otherwise(0)
        ).alias("alloc"),
    )
    return (
        ranked.groupBy("ok")
        .agg(
            F.max("n_lines").cast("long").alias("n_lines"),
            F.max("total").cast("long").alias("total_cents"),
            F.sum("alloc").cast("long").alias("sum_alloc"),
            F.min("alloc").cast("long").alias("min_alloc"),
            F.max("alloc").cast("long").alias("max_alloc"),
        )
        .withColumnRenamed("ok", "o_orderkey")
        .orderBy("o_orderkey")
    )


@_staged(
    "cidr_longest_prefix_events",
    """
    WITH ips AS (
      SELECT DISTINCT (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    cidrs AS (
      SELECT s_suppkey AS net_id,
             8 + 8 * (s_suppkey % 3) AS len,
             (s_suppkey * 2654435761 + 40503) % 4294967296 AS net
      FROM supplier
    ),
    rules AS (
      SELECT len, net >> (32 - len) AS prefix,
             CAST(min(net_id) AS BIGINT) AS net_id
      FROM cidrs GROUP BY 1, 2
    ),
    probes AS (
      SELECT ip, r.len, r.net_id
      FROM ips i JOIN rules r ON r.prefix = i.ip >> (32 - r.len)
    ),
    best AS (
      SELECT ip,
             CAST(min((32 - len) * 1000000000 + net_id) AS BIGINT) AS pk
      FROM probes GROUP BY ip
    )
    SELECT CAST(32 - pk // 1000000000 AS BIGINT) AS len,
           CAST(pk % 1000000000 AS BIGINT) AS net_id,
           CAST(count(*) AS BIGINT) AS n_ips
    FROM best
    GROUP BY 1, 2
    ORDER BY n_ips DESC, len DESC, net_id ASC LIMIT 20
    """,
)
def cidr_longest_prefix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix (CIDR) matching — the geo-IP/firewall join:
    synthetic 32-bit addresses and a three-tier /8 / /16 / /24 rule
    table, matched by EQUI-joining on (len, masked prefix) per tier —
    the standard trick that turns a range-containment problem into
    |tiers| hash joins (at 100 TB each tier join shuffles once on
    the prefix key; no inequality join, no per-row rule scan).
    Longest match wins via the packed integer argmin
    (32−len)·10⁹+rule_id — no floats anywhere; rules sharing a
    (len, prefix) cell dedupe to the smallest id first. Output:
    matched-rule histogram."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ips = (
        T(spark, sf_dir, "events")
        .select(((F.col("user_id") * 2654435761) % 4294967296).alias("ip"))
        .distinct()
    )
    cidrs = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("net_id"),
        (8 + 8 * (F.col("s_suppkey") % 3)).alias("len"),
        ((F.col("s_suppkey") * 2654435761 + 40503) % 4294967296).alias("net"),
    )
    def tier_shift(col):
        # the Python shiftright API needs a literal count; the three
        # tier widths are a closed set, so a CASE covers them
        return (
            F.when(F.col("len") == 8, F.shiftright(col, 24))
            .when(F.col("len") == 16, F.shiftright(col, 16))
            .otherwise(F.shiftright(col, 8))
        )

    rules = (
        cidrs.select("len", tier_shift(F.col("net")).alias("prefix"), "net_id")
        .groupBy("len", "prefix")
        .agg(F.min("net_id").cast("long").alias("net_id"))
    )
    probes = ips.join(
        F.broadcast(rules), F.col("prefix") == tier_shift(F.col("ip"))
    )
    best = probes.groupBy("ip").agg(
        F.min((32 - F.col("len")) * 1000000000 + F.col("net_id"))
        .cast("long")
        .alias("pk")
    )
    return (
        best.select(
            (32 - F.floor(F.col("pk") / 1000000000)).cast("long").alias("len"),
            (F.col("pk") % 1000000000).cast("long").alias("net_id"),
        )
        .groupBy("len", "net_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ips"))
        .orderBy(F.desc("n_ips"), F.desc("len"), F.asc("net_id"))
        .limit(20)
    )


@_staged(
    "iso_calendar_gauntlet_orders",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS dt,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(isoyear(dt) AS BIGINT) AS iso_year,
           CAST(week(dt) AS BIGINT) AS iso_week,
           CAST(min(quarter(dt)) AS BIGINT) AS q_min,
           CAST(max(dayofyear(dt)) AS BIGINT) AS doy_max,
           CAST(count(DISTINCT last_day(dt)) AS BIGINT) AS n_month_ends,
           CAST(count(DISTINCT date_trunc('week', dt)) AS BIGINT) AS n_weeks,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM d GROUP BY 1, 2
    ORDER BY iso_year, iso_week
    """,
)
def iso_calendar_gauntlet_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 calendar gauntlet — the year-boundary traps every
    reporting pipeline hits: ISO week-year vs calendar year (Dec 29+
    can belong to next year's week 1 — both engines agree on the
    IANA/ISO rule), ISO week numbers, quarters, day-of-year,
    month-end via last_day, Monday-anchored date_trunc('week').
    Grouped by (iso_year, iso_week) with exact counts/cents so a
    single misassigned boundary day reds the row."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("dt"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        d.groupBy(
            F.expr("extract(yearofweek FROM dt)").cast("long").alias("iso_year"),
            F.weekofyear("dt").cast("long").alias("iso_week"),
        )
        .agg(
            F.min(F.quarter("dt")).cast("long").alias("q_min"),
            F.max(F.dayofyear("dt")).cast("long").alias("doy_max"),
            F.countDistinct(F.last_day("dt")).cast("long").alias("n_month_ends"),
            F.countDistinct(F.date_trunc("week", F.col("dt")))
            .cast("long")
            .alias("n_weeks"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("iso_year", "iso_week")
    )


@_staged(
    "keyset_pagination_parts",
    """
    WITH ranked AS (
      SELECT p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part
    ),
    page1 AS (
      SELECT * FROM ranked
      ORDER BY price_cents DESC, p_partkey ASC LIMIT 10
    ),
    anchor AS (
      SELECT price_cents AS ap, p_partkey AS ak FROM page1
      ORDER BY price_cents ASC, p_partkey DESC LIMIT 1
    )
    SELECT CAST(2 AS BIGINT) AS page, r.p_partkey, r.price_cents
    FROM ranked r CROSS JOIN anchor
    WHERE r.price_cents < anchor.ap
       OR (r.price_cents = anchor.ap AND r.p_partkey > anchor.ak)
    ORDER BY r.price_cents DESC, r.p_partkey ASC LIMIT 10
    """,
)
def keyset_pagination_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination — the serving-layer pattern
    that replaces OFFSET at scale: page 2 of the price-ranked parts
    is fetched by the composite-key predicate (price, key) <
    page-1's last row, NOT by skipping rows — OFFSET n scans and
    discards n rows per page (quadratic over a crawl), the keyset
    predicate pushes into the scan and each page is one
    TakeOrdered. The anchor is the min-(price desc, key asc) row of
    page 1, derived in-query; total order = (price_cents DESC,
    partkey ASC) so pagination is gap-free and duplicate-free —
    exactly the serving contract rankings_scan needs."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ranked = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    page1 = ranked.orderBy(F.desc("price_cents"), F.asc("p_partkey")).limit(10)
    anchor = page1.orderBy(F.asc("price_cents"), F.desc("p_partkey")).limit(1).select(
        F.col("price_cents").alias("ap"), F.col("p_partkey").alias("ak")
    )
    return (
        ranked.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col("price_cents") < F.col("ap"))
            | ((F.col("price_cents") == F.col("ap")) & (F.col("p_partkey") > F.col("ak")))
        )
        .select(F.lit(2).cast("long").alias("page"), "p_partkey", "price_cents")
        .orderBy(F.desc("price_cents"), F.asc("p_partkey"))
        .limit(10)
    )


@_staged(
    "timezone_gauntlet_events",
    """
    WITH z AS (
      SELECT unnest(['America/New_York', 'Asia/Kolkata',
                     'Australia/Sydney']) AS tz
    ),
    loc AS (
      SELECT z.tz,
             CAST(EXTRACT(hour FROM
               timezone(z.tz, ts AT TIME ZONE 'UTC')) AS BIGINT)
               AS local_hour,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events CROSS JOIN z
    )
    SELECT tz, local_hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM loc GROUP BY 1, 2
    ORDER BY tz, local_hour
    """,
)
def timezone_gauntlet_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-zone conversion gauntlet — UTC event times converted to
    three IANA zones (a DST-observing one, a half-hour-offset one,
    a southern-hemisphere one) and histogrammed by LOCAL hour: both
    engines resolve the same tzdata rules (probed across the 2024
    US spring-forward and fall-back instants — exact agreement), so
    the per-(zone, hour) exact counts/cents red the row on any
    offset or DST divergence. The conversion is a per-row projection
    — no shuffle beyond the final bounded aggregate."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    zones = F.array(
        F.lit("America/New_York"), F.lit("Asia/Kolkata"), F.lit("Australia/Sydney")
    )
    loc = e.withColumn("tz", F.explode(zones)).select(
        "tz",
        F.hour(F.from_utc_timestamp(F.col("ts"), F.col("tz")))
        .cast("long")
        .alias("local_hour"),
        "cents",
    )
    return (
        loc.groupBy("tz", "local_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("tz", "local_hour")
    )


@_staged(
    "cohens_d_events",
    """
    WITH x AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS grp,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_type, grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(cents * cents) AS BIGINT) AS sxx
      FROM x GROUP BY 1, 2
    ),
    w AS (
      SELECT a.event_type, a.n AS n1, b.n AS n2,
             CAST(a.sx AS DOUBLE) / a.n AS m1,
             CAST(b.sx AS DOUBLE) / b.n AS m2,
             CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * a.sx / a.n AS ss1,
             CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE) * b.sx / b.n AS ss2
      FROM s a JOIN s b
        ON b.event_type = a.event_type AND a.grp = 1 AND b.grp = 0
    )
    SELECT event_type, n1, n2,
           floor((m1 - m2) / sqrt((ss1 + ss2) / (n1 + n2 - 2))
                 * 1e6 + 0.5) / 1e6 AS cohens_d_q,
           floor((m1 - m2) / sqrt((ss1 + ss2) / (n1 + n2 - 2))
                 * (1 - 3.0 / (4 * (n1 + n2) - 9)) * 1e6 + 0.5) / 1e6
             AS hedges_g_q
    FROM w ORDER BY event_type
    """,
)
def cohens_d_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g per event type — the effect-size
    companions to welch_ttest_events (a significant-but-tiny effect
    and a huge one look identical to a bare p-value): pooled-SD
    standardized mean difference and its small-sample bias
    correction (1 − 3/(4N−9)), from the SAME integer sufficient
    statistics (n, Σx, Σx² per cell, one pass); the final
    expressions are the only floats, identical op order both
    engines, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = e.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("sxx"),
    )
    a = s.filter("grp = 1").select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("sx").alias("sx1"),
        F.col("sxx").alias("sxx1"),
    )
    b = s.filter("grp = 0").select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("sx").alias("sx2"),
        F.col("sxx").alias("sxx2"),
    )
    j = a.join(b, "event_type")
    m1 = F.col("sx1").cast("double") / F.col("n1")
    m2 = F.col("sx2").cast("double") / F.col("n2")
    ss1 = F.col("sxx1").cast("double") - F.col("sx1").cast("double") * F.col(
        "sx1"
    ) / F.col("n1")
    ss2 = F.col("sxx2").cast("double") - F.col("sx2").cast("double") * F.col(
        "sx2"
    ) / F.col("n2")
    d = (m1 - m2) / F.sqrt((ss1 + ss2) / (F.col("n1") + F.col("n2") - 2))
    g = d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9))

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return j.select(
        "event_type",
        "n1",
        "n2",
        q6(d).alias("cohens_d_q"),
        q6(g).alias("hedges_g_q"),
    ).orderBy("event_type")


@_staged(
    "hhi_by_part_type",
    """
    WITH r AS (
      SELECT p.p_type AS ptype, p.p_brand AS brand,
             CAST(sum(round(l.l_extendedprice * 100)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    t AS (
      SELECT ptype,
             CAST(sum(cents) AS BIGINT) AS tot,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS sq,
             CAST(count(*) AS BIGINT) AS n_brands
      FROM r GROUP BY 1
    )
    SELECT ptype, n_brands, tot AS total_cents,
           floor(sq / (CAST(tot AS DOUBLE) * tot) * 1e6 + 0.5) / 1e6
             AS hhi_q
    FROM t ORDER BY hhi_q DESC, ptype ASC LIMIT 25
    """,
)
def hhi_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per part type — the
    antitrust/market-share statistic: HHI = Σ share² over brands,
    computed as (Σ revenue²)/(Σ revenue)² so both sums accumulate
    EXACTLY (revenue² rides DECIMAL(38,0)/HUGEINT past 2^63) and
    the only float is one final division, identical op order,
    floor-quantized 1e-6. Top-25 most concentrated types."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    p = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand")
    )
    r = (
        l.join(F.broadcast(p), "pk")
        .groupBy("ptype", "brand")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    t = r.groupBy("ptype").agg(
        F.sum("cents").cast("long").alias("tot"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)"))
        .cast("double")
        .alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )
    return (
        t.select(
            "ptype",
            "n_brands",
            F.col("tot").alias("total_cents"),
            (
                F.floor(
                    F.col("sq") / (F.col("tot").cast("double") * F.col("tot")) * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("hhi_q"),
        )
        .orderBy(F.desc("hhi_q"), F.asc("ptype"))
        .limit(25)
    )


@_staged(
    "change_point_daily_events",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT a.d,
             CAST(sum(b.x) AS BIGINT) AS sl,
             CAST(sum(CAST(b.x AS HUGEINT) * b.x) AS DOUBLE) AS sll,
             CAST(count(*) AS BIGINT) AS nl
      FROM daily a JOIN daily b ON b.d <= a.d
      GROUP BY a.d
    ),
    tot AS (
      SELECT CAST(sum(x) AS BIGINT) AS st,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS stt,
             CAST(count(*) AS BIGINT) AS nt
      FROM daily
    ),
    scored AS (
      SELECT cum.d, cum.nl, tot.nt,
             (cum.sll - CAST(cum.sl AS DOUBLE) * cum.sl / cum.nl)
             + ((tot.stt - cum.sll)
                - CAST(tot.st - cum.sl AS DOUBLE) * (tot.st - cum.sl)
                  / (tot.nt - cum.nl)) AS sse,
             tot.stt - CAST(tot.st AS DOUBLE) * tot.st / tot.nt AS sse0
      FROM cum CROSS JOIN tot
      WHERE cum.nl < tot.nt
    )
    SELECT d AS split_after, nl AS n_left, nt - nl AS n_right,
           floor(sse * 1e3 + 0.5) / 1e3 AS sse_q,
           floor((sse0 - sse) / sse0 * 1e6 + 0.5) / 1e6 AS var_explained_q
    FROM scored
    ORDER BY sse ASC, d ASC LIMIT 1
    """,
)
def change_point_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline change-point detection — one step of binary
    segmentation (CUSUM's offline companion): the day boundary
    minimizing SSE_left + SSE_right of daily revenue, i.e. the
    maximum-variance-reduction split. Sufficient statistics (n, Σx,
    Σx² per prefix) come from a cumulative self-join on the
    calendar-bounded day-level frame — Σx² rides HUGEINT/DECIMAL
    past 2^63 — and each candidate's SSE is one double expression in
    identical op order; exact SSE ties resolve to the earlier date.
    Reports the split, segment sizes, and fraction of variance
    explained."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    daily = T(spark, sf_dir, "events").groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    cum = (
        daily.select("d")
        .join(F.broadcast(b), F.col("bd") <= F.col("d"))
        .groupBy("d")
        .agg(
            F.sum("bx").cast("long").alias("sl"),
            F.sum(
                F.col("bx").cast("decimal(19,0)") * F.col("bx").cast("decimal(19,0)")
            )
            .cast("double")
            .alias("sll"),
            F.count(F.lit(1)).cast("long").alias("nl"),
        )
    )
    tot = daily.agg(
        F.sum("x").cast("long").alias("st"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
        .cast("double")
        .alias("stt"),
        F.count(F.lit(1)).cast("long").alias("nt"),
    )
    sl, sll, nl = F.col("sl"), F.col("sll"), F.col("nl")
    st, stt, nt = F.col("st"), F.col("stt"), F.col("nt")
    sse = (sll - sl.cast("double") * sl / nl) + (
        (stt - sll) - (st - sl).cast("double") * (st - sl) / (nt - nl)
    )
    sse0 = stt - st.cast("double") * st / nt
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(nl < nt)
        .select(
            F.col("d").alias("split_after"),
            nl.alias("n_left"),
            (nt - nl).alias("n_right"),
            (F.floor(sse * 1e3 + 0.5) / 1e3).alias("sse_q"),
            (F.floor((sse0 - sse) / sse0 * 1e6 + 0.5) / 1e6).alias(
                "var_explained_q"
            ),
            sse.alias("_s"),
        )
        .orderBy(F.asc("_s"), F.asc("split_after"))
        .limit(1)
        .drop("_s")
    )


@_staged(
    "mix_shift_decomposition",
    """
    WITH m AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) < (SELECT min(CAST(ts AS DATE))
                                           FROM events)
                       + INTERVAL 14 DAY
                  THEN 1 ELSE 2 END AS period,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type,
             a.n AS n1, b.n AS n2, a.cents AS c1, b.cents AS c2
      FROM m a JOIN m b
        ON b.event_type = a.event_type AND a.period = 1 AND b.period = 2
    )
    SELECT event_type, n1, n2, c2 - c1 AS delta_cents,
           floor((n2 - n1) * (CAST(c1 AS DOUBLE) / n1) * 1e6 + 0.5) / 1e6
             AS volume_effect_q,
           floor(n2 * (CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1)
                 * 1e6 + 0.5) / 1e6 AS rate_effect_q
    FROM j ORDER BY event_type
    """,
)
def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift (volume/rate) decomposition — the BI bridge every
    revenue review runs: Δrevenue per event type between the first
    fortnight and the rest splits EXACTLY into a volume effect
    (Δn · rate₁) and a rate effect (n₂ · Δrate), which sum to the
    integer delta by construction (volume + rate =
    n₂·r₂ − n₁·r₁ identically — the decomposition identity is the
    invariant the oracle pins). Counts and cents are exact integers;
    the two effect expressions are the only floats, identical op
    order, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d0 = e.agg(F.min("d").alias("d0"))
    m = (
        e.crossJoin(F.broadcast(d0))
        .withColumn(
            "period",
            F.when(F.col("d") < F.date_add(F.col("d0"), 14), 1).otherwise(2),
        )
        .groupBy("event_type", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    a = m.filter("period = 1").select(
        "event_type", F.col("n").alias("n1"), F.col("cents").alias("c1")
    )
    b = m.filter("period = 2").select(
        "event_type", F.col("n").alias("n2"), F.col("cents").alias("c2")
    )
    j = a.join(b, "event_type")
    r1 = F.col("c1").cast("double") / F.col("n1")
    r2 = F.col("c2").cast("double") / F.col("n2")
    return j.select(
        "event_type",
        "n1",
        "n2",
        (F.col("c2") - F.col("c1")).alias("delta_cents"),
        (F.floor((F.col("n2") - F.col("n1")) * r1 * 1e6 + 0.5) / 1e6).alias(
            "volume_effect_q"
        ),
        (F.floor(F.col("n2") * (r2 - r1) * 1e6 + 0.5) / 1e6).alias("rate_effect_q"),
    ).orderBy("event_type")


@_staged(
    "linear_interpolate_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      GROUP BY 1, 2
    ),
    sparse AS (
      SELECT * FROM daily
      WHERE (dayofyear(d) + length(event_type)) % 3 <> 0
    ),
    bounds AS (
      SELECT event_type, min(d) AS d0, max(d) AS d1 FROM sparse GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, g.g AS d
      FROM bounds b, LATERAL (
        SELECT unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))::DATE AS g
      ) g
    ),
    joined AS (
      SELECT g.event_type, g.d, s.cents
      FROM grid g LEFT JOIN sparse s
        ON s.event_type = g.event_type AND s.d = g.d
    ),
    filled AS (
      SELECT event_type, d, cents,
             last_value(cents IGNORE NULLS) OVER w AS pv,
             last_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS)
               OVER w AS pd,
             first_value(cents IGNORE NULLS) OVER w2 AS nv,
             first_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS)
               OVER w2 AS nd
      FROM joined
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS UNBOUNDED PRECEDING),
             w2 AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, d,
           CASE WHEN cents IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
           CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                ELSE floor((CAST(pv AS DOUBLE)
                            + (CAST(nv AS DOUBLE) - pv)
                              * datediff('day', pd, d)
                              / datediff('day', pd, nd))
                           * 1e6 + 0.5) / 1e6 END AS value_q
    FROM filled
    WHERE pv IS NOT NULL AND nv IS NOT NULL
    ORDER BY event_type, d
    """,
)
def linear_interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps — the companion to
    gapfill's LOCF (carry-forward biases a trend; interpolation is
    what metric backfills actually want): a deterministic sparse
    slice of the per-type daily sums, the dense calendar grid
    rebuilt per group inside codegen, then each hole takes
    prev + (next−prev)·Δd/Δspan — an exact integer rational
    quantized once (both engines evaluate the same op order). The
    two-sided neighbor scan is last/first IGNORE NULLS over
    per-type hash-partitioned windows — one exchange, no one-task
    funnel; edge rows without both neighbors are dropped
    (interpolation, not extrapolation)."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    sparse = daily.filter(
        (F.dayofyear("d") + F.length("event_type")) % 3 != 0
    )
    bounds = sparse.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("d"),
    )
    joined = grid.join(sparse, ["event_type", "d"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("cents").isNotNull(), F.col("d"))
    filled = joined.select(
        "event_type",
        "d",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_d, ignorenulls=True).over(wb).alias("pd"),
        F.first("cents", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.col("pv").cast("double") + (
        F.col("nv").cast("double") - F.col("pv")
    ) * F.datediff(F.col("d"), F.col("pd")) / F.datediff(F.col("nd"), F.col("pd"))
    return (
        filled.filter(F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            "event_type",
            "d",
            F.when(F.col("cents").isNotNull(), 0).otherwise(1).alias("interpolated"),
            F.when(F.col("cents").isNotNull(), F.col("cents").cast("double"))
            .otherwise(F.floor(interp * 1e6 + 0.5) / 1e6)
            .alias("value_q"),
        )
        .orderBy("event_type", "d")
    )


@_staged(
    "reconcile_order_totals",
    """
    WITH li AS (
      SELECT l_orderkey AS ok,
             CAST(sum(round(round(l_extendedprice * 100)
                            * (1 - l_discount) * (1 + l_tax)))
                  AS BIGINT) AS derived_cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             li.derived_cents, li.n_lines
      FROM orders o JOIN li ON li.ok = o.o_orderkey
    ),
    flagged AS (
      SELECT *,
             abs(header_cents - derived_cents) AS drift_cents
      FROM j
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN drift_cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN drift_cents > n_lines THEN 1 ELSE 0 END)
                AS BIGINT) AS n_beyond_rounding,
           CAST(max(drift_cents) AS BIGINT) AS max_drift_cents,
           CAST(sum(drift_cents) AS BIGINT) AS total_drift_cents
    FROM flagged
    """,
)
def reconcile_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail financial reconciliation — the audit every
    billing pipeline runs: each order's header total against the sum
    of its lineitems' extendedprice·(1−discount)·(1+tax), ALL in
    integer cents (the per-line charge is rounded once to a cent,
    exactly as an invoice line would be), with a per-order rounding
    tolerance of one cent per line. One co-partitioned aggregate on
    the order key + one join — at 100 TB both sides shuffle once on
    the same key. Reports the exact-match count, the
    beyond-rounding-tolerance count, and drift totals; a single
    cent of cross-engine disagreement reds the row."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("ok")
    ).agg(
        F.sum(
            F.round(
                F.round(F.col("l_extendedprice") * 100)
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
        )
        .cast("long")
        .alias("derived_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
    )
    j = o.join(li, o["o_orderkey"] == li["ok"])
    drift = F.abs(F.col("header_cents") - F.col("derived_cents"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(drift == 0, 1).otherwise(0)).cast("long").alias("n_exact"),
        F.sum(F.when(drift > F.col("n_lines"), 1).otherwise(0))
        .cast("long")
        .alias("n_beyond_rounding"),
        F.max(drift).cast("long").alias("max_drift_cents"),
        F.sum(drift).cast("long").alias("total_drift_cents"),
    )


@_staged(
    "acid_replace_where_events",
    """
    WITH base AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    replaced AS (
      SELECT event_type, cents * 2 AS cents
      FROM base WHERE event_type = 'error'
      UNION ALL
      SELECT event_type, cents FROM base WHERE event_type <> 'error'
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM replaced GROUP BY event_type ORDER BY event_type
    """,
)
def acid_replace_where_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-scoped INSERT OVERWRITE under the driver gate
    (sources/acid.py::replace_where — public Delta replaceWhere
    semantics, dbt's insert_overwrite incremental strategy): load
    the events into an ACID table, then atomically replace ONLY the
    'error' slice with a reprocessed batch (cents doubled) in one
    commit — the un-touched slices must carry over byte-identical,
    the version must bump exactly once, and the read-back per-type
    aggregate must equal the oracle's relational replay of
    replace-then-union."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.standard_queries import T

    base = T(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    t = AcidTable(
        spark, tempfile.mkdtemp(prefix=f"rw_{uuid.uuid4().hex[:8]}_") + "/t"
    )
    t.write(base)
    v0 = t.latest_version()
    reprocessed = base.filter(F.col("event_type") == "error").select(
        "event_type", (F.col("cents") * 2).alias("cents")
    )
    snap = t.replace_where(reprocessed, "event_type = 'error'")
    assert snap.version == v0 + 1, "replace_where must be one commit"
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("event_type")
    )


@_staged(
    "daily_percentile_bands",
    """
    WITH x AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT d,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90,
           CAST(quantile_disc(cents, 0.99) AS BIGINT) AS p99,
           CAST(max(cents) AS BIGINT) AS p100
    FROM x GROUP BY d ORDER BY d
    """,
)
def daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90/p99/max bands — the ops-dashboard trend every
    latency/value SLO review reads: exact DISCRETE percentiles per
    day (percentile_disc returns an actual data value — integer
    cents, bit-comparable across engines; interpolated quantiles at
    rounding boundaries are not), one hash-partitioned aggregate on
    the day key. At 100 TB per-day groups are balanced by the
    calendar and the sort is within-group; for truly hot days the
    approx_percentile sketch is the documented fallback."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    x = T(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def pdisc(p):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY cents)"
        ).cast("long")

    return (
        x.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pdisc(0.5).alias("p50"),
            pdisc(0.9).alias("p90"),
            pdisc(0.99).alias("p99"),
            F.max("cents").cast("long").alias("p100"),
        )
        .orderBy("d")
    )


@_staged(
    "wilson_ci_conversion",
    """
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS k
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT event_type, n, k,
             CAST(k AS DOUBLE) / n AS p,
             1.959963984540054 AS z
      FROM s
    )
    SELECT event_type, n, k,
           floor(p * 1e6 + 0.5) / 1e6 AS p_hat_q,
           floor((p + z * z / (2 * n)
                  - z * sqrt((p * (1 - p) + z * z / (4 * n)) / n))
                 / (1 + z * z / n) * 1e6 + 0.5) / 1e6 AS wilson_lo_q,
           floor((p + z * z / (2 * n)
                  + z * sqrt((p * (1 - p) + z * z / (4 * n)) / n))
                 / (1 + z * z / n) * 1e6 + 0.5) / 1e6 AS wilson_hi_q
    FROM w ORDER BY event_type
    """,
)
def wilson_ci_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score confidence interval for a proportion — what the
    A/B z-test family should ship alongside its point estimates
    (the normal-approximation interval misbehaves at small n and
    extreme p; Wilson stays inside [0,1]): high-value rate per event
    type, exact integer (n, k), the closed-form interval as two
    fixed-order float expressions with z pinned to the double
    literal 1.959963984540054, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    s = T(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") >= 50, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    p = k.cast("double") / n
    z = F.lit(1.959963984540054)
    center = p + z * z / (2 * n)
    half = z * F.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
    denom = 1 + z * z / n

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return s.select(
        "event_type",
        "n",
        "k",
        q6(p).alias("p_hat_q"),
        q6((center - half) / denom).alias("wilson_lo_q"),
        q6((center + half) / denom).alias("wilson_hi_q"),
    ).orderBy("event_type")


@_staged(
    "dispersion_index_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS days,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS scc
      FROM daily GROUP BY 1
    )
    SELECT event_type, days, sc AS total,
           floor((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / days)
                 / (days - 1) / (CAST(sc AS DOUBLE) / days)
                 * 1e6 + 0.5) / 1e6 AS dispersion_q
    FROM s ORDER BY event_type
    """,
)
def dispersion_index_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of daily event
    counts per type — the standard Poisson overdispersion check
    (≈1 Poisson, >1 burstiness/contagion, <1 regularity) that
    decides between Poisson and negative-binomial models downstream:
    integer (days, Σc, Σc²) per type, one fixed-order float
    expression, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    disp = (
        (F.col("scc").cast("double") - F.col("sc").cast("double") * F.col("sc") / F.col("days"))
        / (F.col("days") - 1)
        / (F.col("sc").cast("double") / F.col("days"))
    )
    return s.select(
        "event_type",
        "days",
        F.col("sc").alias("total"),
        (F.floor(disp * 1e6 + 0.5) / 1e6).alias("dispersion_q"),
    ).orderBy("event_type")


@_staged(
    "durbin_watson_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    diffs AS (
      SELECT CAST(sum(CAST(b.x - a.x AS HUGEINT) * (b.x - a.x)) AS DOUBLE)
               AS sdd
      FROM daily a JOIN daily b ON b.d = a.d + INTERVAL 1 DAY
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      FROM daily
    )
    SELECT tot.n,
           floor(diffs.sdd
                 / (tot.sxx - CAST(tot.sx AS DOUBLE) * tot.sx / tot.n)
                 * 1e6 + 0.5) / 1e6 AS dw_q
    FROM diffs CROSS JOIN tot
    """,
)
def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson autocorrelation statistic of the daily revenue
    series — the residual-independence check behind every trend
    regression (≈2 none, →0 positive, →4 negative autocorrelation):
    DW = Σ(Δx)²/Σ(x−x̄)², the numerator from a CALENDAR SELF-JOIN on
    d+1 (no global-order window, no one-task funnel) and both sums
    exact (squares ride DECIMAL/HUGEINT); one fixed-order float
    division, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    daily = T(spark, sf_dir, "events").groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    b = daily.select(F.date_sub("d", 1).alias("d"), F.col("x").alias("nx"))
    dd = F.col("nx").cast("decimal(19,0)") - F.col("x").cast("decimal(19,0)")
    diffs = daily.join(b, "d").agg(
        F.sum(dd * dd).cast("double").alias("sdd")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
        .cast("double")
        .alias("sxx"),
    )
    dw = F.col("sdd") / (
        F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    return diffs.crossJoin(F.broadcast(tot)).select(
        "n", (F.floor(dw * 1e6 + 0.5) / 1e6).alias("dw_q")
    )


@_staged(
    "k_anon_generalization_ladder",
    """
    WITH ladder AS (
      SELECT unnest([1000, 5000, 10000, 50000, 100000]) AS bucket
    ),
    grouped AS (
      SELECT l.bucket,
             CAST(round(o.o_totalprice * 100) AS BIGINT)
               // (l.bucket * 100) AS qi_price,
             o.o_orderpriority AS qi_prio,
             CAST(count(*) AS BIGINT) AS group_size
      FROM orders o CROSS JOIN ladder l
      GROUP BY 1, 2, 3
    ),
    audit AS (
      SELECT bucket,
             CAST(min(group_size) AS BIGINT) AS min_group,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                  AS BIGINT) AS rows_at_risk
      FROM grouped GROUP BY 1
    )
    SELECT bucket, min_group, n_groups, rows_at_risk,
           CASE WHEN min_group >= 5 THEN 1 ELSE 0 END AS satisfies_k5
    FROM audit ORDER BY bucket
    """,
)
def k_anon_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization search — the release-side
    companion to the k_anonymity audit: walk a price-bucket
    generalization LADDER (five coarseness levels × the priority
    quasi-identifier) and report, per level, the minimum group size,
    group count, and rows-at-risk, flagging the levels that satisfy
    k=5 — i.e. the coarsest-data/finest-bucket trade a privacy
    officer actually picks from. One aggregate per level computed in
    a single pass (the ladder CROSS JOIN is a 5-row broadcast, the
    heavy side shuffles once on the generalized keys)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    ladder = spark.createDataFrame(
        [(b,) for b in [1000, 5000, 10000, 50000, 100000]], "bucket long"
    )
    o = T(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("qi_prio"),
    )
    grouped = (
        o.crossJoin(F.broadcast(ladder))
        .groupBy(
            "bucket",
            F.expr("cents div (bucket * 100)").alias("qi_price"),
            "qi_prio",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    )
    return (
        grouped.groupBy("bucket")
        .agg(
            F.min("group_size").cast("long").alias("min_group"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(
                F.when(F.col("group_size") < 5, F.col("group_size")).otherwise(0)
            )
            .cast("long")
            .alias("rows_at_risk"),
        )
        .select(
            "bucket",
            "min_group",
            "n_groups",
            "rows_at_risk",
            F.when(F.col("min_group") >= 5, 1).otherwise(0).alias("satisfies_k5"),
        )
        .orderBy("bucket")
    )


@_staged(
    "degree_assortativity_users",
    # NOTE: reuses queries_r5's co-activity edge definition verbatim
    """
    WITH ue AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
      FROM events
    ),
    shared AS (
      SELECT x.user_id AS a, y.user_id AS b, count(*) AS shared
      FROM ue x JOIN ue y
        ON x.event_type = y.event_type AND x.hr = y.hr
       AND x.user_id < y.user_id
      GROUP BY 1, 2
    ),
    edges AS (SELECT a, b FROM shared WHERE shared >= 3),
    und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    ),
    pairs AS (
      SELECT da.d AS dx, db.d AS dy
      FROM und JOIN deg da ON da.u = und.u JOIN deg db ON db.u = und.v
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dx) AS BIGINT) AS sx,
             CAST(sum(dx * dx) AS BIGINT) AS sxx,
             CAST(sum(dx * dy) AS BIGINT) AS sxy
      FROM pairs
    )
    SELECT m AS n_directed_edges,
           floor((m * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 / (m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 * 1e6 + 0.5) / 1e6 AS assortativity_q
    FROM s
    """,
)
def degree_assortativity_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the user co-activity graph — Newman's
    r: the Pearson correlation of endpoint degrees over all directed
    edge instances (do hubs attach to hubs — social nets
    assortative, infrastructure nets disassortative). On the
    symmetrized edge list both endpoint marginals are identical, so
    r collapses to (mΣxy−(Σx)²)/(mΣx²−(Σx)²) with EVERY sum an
    exact integer (degrees are counts); one float expression,
    floor-quantized 1e-6. Degrees come from one aggregate, the
    edge⋈degree joins are hash joins on the node key."""
    from dbt_lakehouse_aws_spark.queries_r5 import _coactivity_edges

    edges = _coactivity_edges(spark, sf_dir, min_shared=3)
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    pairs = (
        und.join(deg.withColumnsRenamed({"u": "u", "d": "dx"}), "u")
        .join(deg.select(F.col("u").alias("v"), F.col("d").alias("dy")), "v")
        .select("dx", "dy")
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    m, sx = F.col("m"), F.col("sx")
    r = (m * F.col("sxy").cast("double") - sx.cast("double") * sx) / (
        m * F.col("sxx").cast("double") - sx.cast("double") * sx
    )
    return s.select(
        F.col("m").alias("n_directed_edges"),
        (F.floor(r * 1e6 + 0.5) / 1e6).alias("assortativity_q"),
    )


@_staged(
    "burst_days_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    trail AS (
      SELECT a.event_type, a.d, a.c,
             CAST(sum(b.c) AS BIGINT) AS sum7,
             CAST(count(*) AS BIGINT) AS n7
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type
       AND b.d >= a.d - INTERVAL 7 DAY AND b.d < a.d
      GROUP BY a.event_type, a.d, a.c
    )
    SELECT event_type, d, c AS day_count, sum7, n7,
           floor(CAST(c * n7 AS DOUBLE) / sum7 * 1e6 + 0.5) / 1e6
             AS ratio_q,
           CASE WHEN c * n7 > 2 * sum7 THEN 1 ELSE 0 END AS burst
    FROM trail
    WHERE n7 >= 3
    ORDER BY floor(CAST(c * n7 AS DOUBLE) / sum7 * 1e6 + 0.5) DESC,
             event_type ASC, d ASC
    LIMIT 10
    """,
)
def burst_days_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection — days where a type's event count exceeds 2×
    its trailing-week average, the ops-alerting primitive: the
    comparison is kept as the INTEGER cross-multiplication
    c·n7 > 2·Σ7 (never a float average compared to a float
    threshold), the trailing window is a calendar self-join on the
    day-level frame (bounded by the calendar — no global-order
    window), and days with under 3 trailing observations are
    suppressed (cold-start guard). Returns the 10 burstiest days with
    the 2× flag — never empty, so the driver row stays meaningful on
    smooth corpora."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    b = daily.select(
        F.col("event_type").alias("bt"), F.col("d").alias("bd"), F.col("c").alias("bc")
    )
    trail = (
        daily.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bd") >= F.date_sub(F.col("d"), 7))
            & (F.col("bd") < F.col("d")),
        )
        .groupBy("event_type", "d", "c")
        .agg(
            F.sum("bc").cast("long").alias("sum7"),
            F.count(F.lit(1)).cast("long").alias("n7"),
        )
    )
    ratio_scaled = F.floor(
        (F.col("c") * F.col("n7")).cast("double") / F.col("sum7") * 1e6 + 0.5
    )
    return (
        trail.filter(F.col("n7") >= 3)
        .select(
            "event_type",
            "d",
            F.col("c").alias("day_count"),
            "sum7",
            "n7",
            (ratio_scaled / 1e6).alias("ratio_q"),
            F.when(F.col("c") * F.col("n7") > 2 * F.col("sum7"), 1)
            .otherwise(0)
            .alias("burst"),
            ratio_scaled.alias("_r"),
        )
        .orderBy(F.desc("_r"), F.asc("event_type"), F.asc("d"))
        .limit(10)
        .drop("_r")
    )


@_staged(
    "digest_codec_gauntlet_parts",
    """
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           to_base64(CAST(p_name AS BLOB)) AS name_b64,
           lower(to_hex(p_partkey)) AS key_hex,
           CAST(CAST(from_base64(to_base64(CAST(p_name AS BLOB))) AS VARCHAR)
                = p_name AS BIGINT) AS b64_roundtrip_ok
    FROM part
    WHERE p_partkey % 101 = 0
    ORDER BY p_partkey
    """,
)
def digest_codec_gauntlet_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest and binary-codec gauntlet over the cross-engine common
    surface: md5 and sha-256 hex digests (bit-identical everywhere —
    the same property the portable-hash oracles build on), standard
    base64 with an in-query decode round-trip assertion, and integer
    hex encoding (case-normalized: Spark lowercases, DuckDB
    uppercases — the one deliberate divergence this row pins).
    Pushed-down projection over one scan on a deterministic key
    slice."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") % 101 == 0)
    as_bin = F.col("p_name").cast("binary")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.base64(as_bin).alias("name_b64"),
        F.lower(F.hex("p_partkey")).alias("key_hex"),
        (F.unbase64(F.base64(as_bin)).cast("string") == F.col("p_name"))
        .cast("long")
        .alias("b64_roundtrip_ok"),
    ).orderBy("p_partkey")


@_staged(
    "stream_replace_where_daily",
    """
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(0 AS BIGINT) AS reprocess_delta
    FROM daily GROUP BY event_type ORDER BY event_type
    """,
)
def stream_replace_where_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming partition refresh under the driver gate
    (streaming/ingest.py::stream_replace_where_into_acid): the
    events stream (Trigger.AvailableNow) lands as a per-(day, type)
    rollup where each micro-batch atomically REPLACES the whole days
    it carries — the insert_overwrite shape daily pipelines want —
    then a reprocessing run re-delivers one full day through
    replace_where directly and the table must be bit-identical
    (reprocess_delta pinned to 0: partition overwrite is idempotent
    for identical payloads, no dedup bookkeeping needed). The oracle
    computes the same rollup relationally from the source."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.standard_queries import T
    from dbt_lakehouse_aws_spark.streaming.ingest import (
        stream_replace_where_into_acid,
    )

    def rollup(df):
        return df.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("ts", "event_type", "value")
    )
    root = tempfile.mkdtemp(prefix=f"srw_{uuid.uuid4().hex[:8]}_")
    table_path, ckpt = f"{root}/tbl", f"{root}/ckpt"
    q = stream_replace_where_into_acid(
        stream,
        table_path=table_path,
        checkpoint_dir=ckpt,
        partition_col="d",
        transform=rollup,
    )
    q.awaitTermination(600)
    t = AcidTable(spark, table_path)
    before = t.read().agg(F.sum("n"), F.sum("cents")).collect()[0]

    # reprocessing: re-deliver one full day with identical data
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    one_day = daily.agg(F.min("d")).collect()[0][0]
    t.replace_where(
        daily.filter(F.col("d") == one_day), f"d = '{one_day}'"
    )
    after = t.read().agg(F.sum("n"), F.sum("cents")).collect()[0]
    delta = (after[0] - before[0]) + (after[1] - before[1])
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .withColumn("reprocess_delta", F.lit(delta).cast("long"))
        .orderBy("event_type")
    )


@_staged(
    "partial_correlation_lineitem",
    """
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(round(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(z) AS DOUBLE) AS sz,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             CAST(sum(z * z) AS DOUBLE) AS szz,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * z) AS DOUBLE) AS sxz,
             CAST(sum(y * z) AS DOUBLE) AS syz
      FROM li
    ),
    r AS (
      SELECT n,
             (n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
             (n * sxz - sx * sz)
               / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
             (n * syz - sy * sz)
               / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
      FROM s
    )
    SELECT n,
           floor(rxy * 1e6 + 0.5) / 1e6 AS r_xy_q,
           floor((rxy - rxz * ryz)
                 / sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
                 * 1e6 + 0.5) / 1e6 AS r_xy_given_z_q
    FROM r
    """,
)
def partial_correlation_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation — quantity vs extended price CONTROLLING
    for discount, the confounder-adjusted companion to the plain
    correlation matrix: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)),
    every pairwise r built from the same one-pass INTEGER sufficient
    statistics (Σy² rides HUGEINT/DECIMAL past 2^63), identical op
    order both engines, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("z"),
    )
    x, y, z = F.col("x"), F.col("y"), F.col("z")
    dec = "decimal(19,0)"
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(z).cast("double").alias("sz"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y.cast(dec) * y.cast(dec)).cast("double").alias("syy"),
        F.sum(z * z).cast("double").alias("szz"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * z).cast("double").alias("sxz"),
        F.sum(y * z).cast("double").alias("syz"),
    )
    n = F.col("n")

    def r(sab, sa, sb, saa, sbb):
        return (n * sab - sa * sb) / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))

    rxy = r(F.col("sxy"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("syy"))
    rxz = r(F.col("sxz"), F.col("sx"), F.col("sz"), F.col("sxx"), F.col("szz"))
    ryz = r(F.col("syz"), F.col("sy"), F.col("sz"), F.col("syy"), F.col("szz"))
    partial = (rxy - rxz * ryz) / F.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    return s.select(
        "n",
        (F.floor(rxy * 1e6 + 0.5) / 1e6).alias("r_xy_q"),
        (F.floor(partial * 1e6 + 0.5) / 1e6).alias("r_xy_given_z_q"),
    )


@_staged(
    "mahalanobis_outliers_lineitem",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM li
    ),
    cov AS (
      SELECT n, sx / n AS mx, sy / n AS my,
             (sxx - sx * sx / n) / (n - 1) AS vxx,
             (syy - sy * sy / n) / (n - 1) AS vyy,
             (sxy - sx * sy / n) / (n - 1) AS vxy
      FROM s
    ),
    scored AS (
      SELECT li.l_orderkey, li.l_linenumber,
             CAST(floor(((li.x - mx) * ((li.x - mx) * vyy - (li.y - my) * vxy)
                         + (li.y - my) * ((li.y - my) * vxx - (li.x - mx) * vxy))
                        / (vxx * vyy - vxy * vxy) * 1e6 + 0.5) AS BIGINT)
               AS d2_scaled
      FROM li CROSS JOIN cov
    )
    SELECT l_orderkey, l_linenumber,
           CAST(d2_scaled AS DOUBLE) / 1e6 AS d2_q
    FROM scored
    ORDER BY d2_scaled DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10
    """,
)
def mahalanobis_outliers_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate (Mahalanobis) outliers on (quantity, price) —
    what per-column z-scores miss: a row can be unremarkable on each
    axis yet far from the correlation ellipse. Mean and covariance
    come from one pass of INTEGER sufficient statistics; the 2×2
    inverse is closed-form inside a single per-row double expression
    whose QUANTIZED value (·1e6, floored to BIGINT) is what gets
    ranked — so the top-10, like every ordering in this file, never
    depends on a sub-quantum float difference. The stats row
    broadcasts; scoring is a pure projection."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    dec = "decimal(19,0)"
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y.cast(dec) * y.cast(dec)).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    cov = s.select(
        (F.col("sx") / n).alias("mx"),
        (F.col("sy") / n).alias("my"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)).alias("vxx"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)).alias("vyy"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)).alias("vxy"),
    )
    dx = x - F.col("mx")
    dy = y - F.col("my")
    d2 = (
        dx * (dx * F.col("vyy") - dy * F.col("vxy"))
        + dy * (dy * F.col("vxx") - dx * F.col("vxy"))
    ) / (F.col("vxx") * F.col("vyy") - F.col("vxy") * F.col("vxy"))
    scored = li.crossJoin(F.broadcast(cov)).select(
        "l_orderkey",
        "l_linenumber",
        F.floor(d2 * 1e6 + 0.5).cast("long").alias("d2_scaled"),
    )
    return (
        scored.orderBy(
            F.desc("d2_scaled"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(10)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("d2_scaled").cast("double") / 1e6).alias("d2_q"),
        )
    )


@_staged(
    "cuped_adjustment_events",
    """
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) + INTERVAL 14 DAY AS cutoff FROM events
    ),
    per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < bounds.cutoff
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >= bounds.cutoff
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < bounds.cutoff
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pre
      FROM events CROSS JOIN bounds
      GROUP BY user_id
    ),
    cohort AS (SELECT * FROM per_user WHERE n_pre > 0),
    theta_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre) AS DOUBLE) AS sx,
             CAST(sum(post) AS DOUBLE) AS sy,
             CAST(sum(CAST(pre AS HUGEINT) * pre) AS DOUBLE) AS sxx,
             CAST(sum(CAST(post AS HUGEINT) * post) AS DOUBLE) AS syy,
             CAST(sum(CAST(pre AS HUGEINT) * post) AS DOUBLE) AS sxy
      FROM cohort
    ),
    arm_s AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n_arm,
             CAST(sum(pre) AS DOUBLE) AS asx,
             CAST(sum(post) AS DOUBLE) AS asy
      FROM cohort GROUP BY arm
    )
    SELECT a.arm, a.n_arm,
           floor(a.asy / a.n_arm * 1e6 + 0.5) / 1e6 AS mean_post_q,
           floor((a.asy / a.n_arm
                  - ((t.sxy - t.sx * t.sy / t.n) / (t.sxx - t.sx * t.sx / t.n))
                    * (a.asx / a.n_arm - t.sx / t.n))
                 * 1e6 + 0.5) / 1e6 AS mean_cuped_q,
           floor(((t.sxy - t.sx * t.sy / t.n) * (t.sxy - t.sx * t.sy / t.n))
                 / ((t.sxx - t.sx * t.sx / t.n) * (t.syy - t.sy * t.sy / t.n))
                 * 1e6 + 0.5) / 1e6 AS var_reduction_q
    FROM arm_s a CROSS JOIN theta_s t
    ORDER BY a.arm
    """,
)
def cuped_adjustment_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the pre-experiment-covariate
    adjustment every mature experimentation platform applies before
    reading an A/B test: per user, pre-period (first fortnight) and
    post-period value totals in exact integer cents; θ = cov(X,Y)/
    var(X) from pooled integer sufficient statistics (HUGEINT/
    DECIMAL squares); each arm's adjusted mean ȳ − θ(x̄ − x̄_pool)
    and the theoretical variance reduction ρ² are single
    fixed-order float expressions, floor-quantized 1e-6. Users with
    no pre-period activity are excluded (the standard cohort
    rule)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = e.agg(F.date_add(F.min("d"), 14).alias("cutoff"))
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            (F.col("user_id") % 2).cast("long").alias("arm"),
            F.sum(F.when(F.col("d") < F.col("cutoff"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("pre"),
            F.sum(
                F.when(F.col("d") >= F.col("cutoff"), F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("post"),
            F.sum(F.when(F.col("d") < F.col("cutoff"), 1).otherwise(0))
            .cast("long")
            .alias("n_pre"),
        )
        .filter(F.col("n_pre") > 0)
    )
    dec = "decimal(19,0)"
    pre, post = F.col("pre"), F.col("post")
    theta_s = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(pre).cast("double").alias("sx"),
        F.sum(post).cast("double").alias("sy"),
        F.sum(pre.cast(dec) * pre.cast(dec)).cast("double").alias("sxx"),
        F.sum(post.cast(dec) * post.cast(dec)).cast("double").alias("syy"),
        F.sum(pre.cast(dec) * post.cast(dec)).cast("double").alias("sxy"),
    )
    arm_s = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_arm"),
        F.sum(pre).cast("double").alias("asx"),
        F.sum(post).cast("double").alias("asy"),
    )
    n = F.col("n")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    theta = cov / varx
    mean_post = F.col("asy") / F.col("n_arm")
    mean_cuped = mean_post - theta * (F.col("asx") / F.col("n_arm") - F.col("sx") / n)

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return (
        arm_s.crossJoin(F.broadcast(theta_s))
        .select(
            "arm",
            "n_arm",
            q6(mean_post).alias("mean_post_q"),
            q6(mean_cuped).alias("mean_cuped_q"),
            q6(cov * cov / (varx * vary)).alias("var_reduction_q"),
        )
        .orderBy("arm")
    )


@_staged(
    "srm_check_events",
    """
    WITH arms AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    j AS (
      SELECT a.n AS na, b.n AS nb
      FROM arms a CROSS JOIN arms b
      WHERE a.arm = 0 AND b.arm = 1
    )
    SELECT na, nb,
           floor(CAST((na - nb) AS DOUBLE) * (na - nb) / (na + nb)
                 * 1e6 + 0.5) / 1e6 AS chi2_q,
           CASE WHEN CAST((na - nb) AS DOUBLE) * (na - nb) / (na + nb)
                     > 3.841458820694124 THEN 1 ELSE 0 END AS srm_flag
    FROM j
    """,
)
def srm_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the first gate any A/B readout
    must pass (a biased assignment invalidates every downstream
    stat): χ² goodness-of-fit of the two arm sizes against the
    designed 50/50 split, which for two cells collapses to
    (n_a−n_b)²/(n_a+n_b); exact integer counts, one float division,
    flagged against the χ²₁ 95% critical value pinned as a double
    literal. Distinct-user counts, not event counts — SRM is about
    ASSIGNMENT."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    arms = (
        T(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).cast("long").alias("arm"))
        .agg(F.countDistinct("user_id").cast("long").alias("n"))
    )
    a = arms.filter("arm = 0").select(F.col("n").alias("na"))
    b = arms.filter("arm = 1").select(F.col("n").alias("nb"))
    j = a.crossJoin(F.broadcast(b))
    chi2 = (F.col("na") - F.col("nb")).cast("double") * (
        F.col("na") - F.col("nb")
    ) / (F.col("na") + F.col("nb"))
    return j.select(
        "na",
        "nb",
        (F.floor(chi2 * 1e6 + 0.5) / 1e6).alias("chi2_q"),
        F.when(chi2 > 3.841458820694124, 1).otherwise(0).alias("srm_flag"),
    )


@_staged(
    "jackknife_ratio_variance",
    """
    WITH per_bucket AS (
      SELECT CAST(user_id % 20 AS BIGINT) AS bucket,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS tc,
             CAST(sum(n) AS BIGINT) AS tn,
             CAST(count(*) AS BIGINT) AS b
      FROM per_bucket
    ),
    loo AS (
      SELECT p.bucket, tot.b, tot.tc, tot.tn,
             CAST(floor(CAST(tot.tc - p.cents AS DOUBLE)
                        / (tot.tn - p.n) * 1e9 + 0.5) AS BIGINT) AS ti
      FROM per_bucket p CROSS JOIN tot
    ),
    jk AS (
      SELECT b, tc, tn,
             CAST(sum(ti) AS DOUBLE) AS s1,
             CAST(sum(CAST(ti AS HUGEINT) * ti) AS DOUBLE) AS s2
      FROM loo GROUP BY b, tc, tn
    )
    SELECT b AS n_buckets,
           floor(CAST(tc AS DOUBLE) / tn * 1e6 + 0.5) / 1e6 AS ratio_q,
           floor((b - 1.0) / b * (s2 - s1 * s1 / b) / 1e18 * 1e9 + 0.5) / 1e9
             AS jk_variance_q,
           floor(sqrt((b - 1.0) / b * (s2 - s1 * s1 / b) / 1e18) * 1e6 + 0.5)
             / 1e6 AS jk_se_q
    FROM jk
    """,
)
def jackknife_ratio_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife (leave-one-bucket-out) variance of a ratio metric —
    how experimentation platforms get honest CIs for revenue-per-
    event-style metrics, where the naive per-row variance is wrong
    because both numerator and denominator are random: users hash
    into 20 buckets, each pseudo-estimate drops one bucket's exact
    INTEGER (Σcents, n) totals, and Var_jk = (b−1)/b · Σ(θᵢ−θ̄)².
    The only floats are the b=20 leave-one-out ratios — a
    bucket-level frame, bounded by design — combined in one
    fixed-order expression; variance quantized at 1e-9 (it lives
    near zero), point estimate and SE at 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    per_bucket = (
        T(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 20).cast("long").alias("bucket"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    tot = per_bucket.agg(
        F.sum("cents").cast("long").alias("tc"),
        F.sum("n").cast("long").alias("tn"),
        F.count(F.lit(1)).cast("long").alias("b"),
    )
    # pseudo-estimates are QUANTIZED to integer nano-units before
    # summation — a sum of 20 doubles is summation-order-dependent
    # across engines (caught live by the sf0.01 gate: 1-ulp variance
    # drift); integer sums are order-free, and both engines then run
    # the identical uncentered-variance expression on exact inputs
    ti = F.floor(
        (F.col("tc") - F.col("cents")).cast("double")
        / (F.col("tn") - F.col("n"))
        * 1e9
        + 0.5
    ).cast("long")
    loo = per_bucket.crossJoin(F.broadcast(tot)).select("b", "tc", "tn", ti.alias("ti"))
    dec = "decimal(19,0)"
    stats = loo.groupBy("b", "tc", "tn").agg(
        F.sum("ti").cast("double").alias("s1"),
        F.sum(F.col("ti").cast(dec) * F.col("ti").cast(dec))
        .cast("double")
        .alias("s2"),
    )
    b = F.col("b")
    theta = F.col("tc").cast("double") / F.col("tn")
    ss = (F.col("s2") - F.col("s1") * F.col("s1") / b) / 1e18
    return stats.select(
        b.alias("n_buckets"),
        (F.floor(theta * 1e6 + 0.5) / 1e6).alias("ratio_q"),
        (F.floor((b - 1.0) / b * ss * 1e9 + 0.5) / 1e9).alias("jk_variance_q"),
        (F.floor(F.sqrt((b - 1.0) / b * ss) * 1e6 + 0.5) / 1e6).alias("jk_se_q"),
    )


@_staged(
    "stratified_ate_events",
    """
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) + INTERVAL 14 DAY AS cutoff FROM events
    ),
    per_user AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < bounds.cutoff
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS score,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >= bounds.cutoff
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events CROSS JOIN bounds
      GROUP BY user_id
    ),
    strat AS (
      SELECT arm, y,
             CAST(ntile(5) OVER (ORDER BY score, user_id) AS BIGINT)
               AS stratum
      FROM per_user
    ),
    cells AS (
      SELECT stratum, arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy
      FROM strat GROUP BY 1, 2
    )
    SELECT a.stratum, a.n AS n_treat, b.n AS n_ctrl,
           floor((CAST(a.sy AS DOUBLE) / a.n - CAST(b.sy AS DOUBLE) / b.n)
                 * 1e6 + 0.5) / 1e6 AS diff_q,
           floor((CAST(a.sy AS DOUBLE) / a.n - CAST(b.sy AS DOUBLE) / b.n)
                 * (a.n + b.n) * 1e6 + 0.5) / 1e6 AS weighted_contrib_q
    FROM cells a JOIN cells b
      ON b.stratum = a.stratum AND a.arm = 1 AND b.arm = 0
    ORDER BY a.stratum
    """,
)
def stratified_ate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-stratified treatment-effect estimate — the
    quintile-stratification design observational studies use when
    randomization can't be trusted: users rank into 5 strata by
    their pre-period score via operators/windows.py::ntile_scalable
    (proven bit-identical to SQL ntile — the oracle uses the
    native window), then each stratum contributes its own
    treat-minus-control mean difference and size-weighted term.
    Integer cents throughout; the per-stratum differences are the
    only floats, fixed op order, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.operators.windows import ntile_scalable
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = e.agg(F.date_add(F.min("d"), 14).alias("cutoff"))
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            (F.col("user_id") % 2).cast("long").alias("arm"),
            F.sum(F.when(F.col("d") < F.col("cutoff"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("score"),
            F.sum(
                F.when(F.col("d") >= F.col("cutoff"), F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    strat = ntile_scalable(
        per_user, [F.asc("score"), F.asc("user_id")], n=5, name="stratum"
    )
    cells = strat.groupBy("stratum", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    a = cells.filter("arm = 1").select(
        "stratum", F.col("n").alias("n_treat"), F.col("sy").alias("sy1")
    )
    b = cells.filter("arm = 0").select(
        "stratum", F.col("n").alias("n_ctrl"), F.col("sy").alias("sy0")
    )
    j = a.join(b, "stratum")
    diff = F.col("sy1").cast("double") / F.col("n_treat") - F.col("sy0").cast(
        "double"
    ) / F.col("n_ctrl")
    return j.select(
        "stratum",
        "n_treat",
        "n_ctrl",
        (F.floor(diff * 1e6 + 0.5) / 1e6).alias("diff_q"),
        (F.floor(diff * (F.col("n_treat") + F.col("n_ctrl")) * 1e6 + 0.5) / 1e6).alias(
            "weighted_contrib_q"
        ),
    ).orderBy("stratum")


@_staged(
    "travel_distance_users",
    """
    WITH pts AS (
      SELECT user_id, ts, event_id,
             (event_id * 48271) % 100000 AS x,
             (event_id * 69621) % 100000 AS y
      FROM events
    ),
    steps AS (
      SELECT user_id,
             lag(x) OVER w AS px, lag(y) OVER w AS py, x, y
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    lens AS (
      SELECT user_id,
             CAST(floor(sqrt(CAST((x - px) * (x - px)
                                  + (y - py) * (y - py) AS DOUBLE))
                        * 1000 + 0.5) AS BIGINT) AS step_milli
      FROM steps WHERE px IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_steps,
           CAST(sum(step_milli) AS BIGINT) AS path_milli,
           CAST(max(step_milli) AS BIGINT) AS longest_step_milli
    FROM lens GROUP BY user_id
    ORDER BY path_milli DESC, user_id ASC LIMIT 20
    """,
)
def travel_distance_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory path length per user — the telematics/mobility
    aggregate: each event gets a deterministic point on the integer
    plane, consecutive points (per-user hash-partitioned windows,
    (ts, event_id) total order) yield step lengths, and each step is
    QUANTIZED to integer milli-units BEFORE the per-user sum — sqrt
    of an exact integer is correctly rounded and identical on both
    engines, but a float SUM of steps would be order-dependent (the
    jackknife lesson, applied). Top-20 longest paths, with the
    longest single hop as the outlier tell."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    pts = T(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 48271) % 100000).alias("x"),
        ((F.col("event_id") * 69621) % 100000).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pts.select(
        "user_id",
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
        "x",
        "y",
    ).filter(F.col("px").isNotNull())
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    step = F.floor(F.sqrt(d2.cast("double")) * 1000 + 0.5).cast("long")
    return (
        steps.select("user_id", step.alias("step_milli"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.sum("step_milli").cast("long").alias("path_milli"),
            F.max("step_milli").cast("long").alias("longest_step_milli"),
        )
        .orderBy(F.desc("path_milli"), F.asc("user_id"))
        .limit(20)
    )


@_staged(
    "budget_pacing_daily",
    """
    WITH daily AS (
      SELECT date_trunc('month', CAST(ts AS DATE)) AS mon,
             CAST(ts AS DATE) AS d,
             CAST(EXTRACT(day FROM CAST(ts AS DATE)) AS BIGINT) AS dom,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2, 3
    ),
    mtd AS (
      SELECT a.mon, a.d, a.dom, a.cents,
             CAST(sum(b.cents) AS BIGINT) AS mtd_cents
      FROM daily a JOIN daily b ON b.mon = a.mon AND b.d <= a.d
      GROUP BY a.mon, a.d, a.dom, a.cents
    ),
    month_tot AS (
      SELECT mon,
             CAST(sum(cents) AS BIGINT) AS month_cents,
             CAST(max(dom) AS BIGINT) AS days_in_month
      FROM daily GROUP BY mon
    )
    SELECT m.d, m.mtd_cents,
           floor(CAST(m.mtd_cents AS DOUBLE) * t.days_in_month
                 / (CAST(t.month_cents AS DOUBLE) * m.dom)
                 * 1e6 + 0.5) / 1e6 AS pace_index_q,
           CASE WHEN m.mtd_cents * t.days_in_month
                     > 11 * t.month_cents * m.dom // 10
                THEN 1 ELSE 0 END AS overpacing
    FROM mtd m JOIN month_tot t ON t.mon = m.mon
    ORDER BY m.d
    """,
)
def budget_pacing_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget pacing — the ad-tech/finops daily control chart:
    month-to-date spend vs the linear target (month total × elapsed
    fraction), pace index = MTD·days/(total·dom), with the
    overpacing flag (>110%) kept as an INTEGER cross-multiplication
    — never float-vs-float at the decision boundary, the same
    discipline as burst detection. Cumulative MTD rides a
    month-scoped calendar self-join on the bounded day frame; one
    join to the per-month totals."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("month", F.to_date("ts")).alias("mon"),
            F.to_date("ts").alias("d"),
            F.dayofmonth(F.to_date("ts")).cast("long").alias("dom"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    b = daily.select(
        F.col("mon").alias("bmon"), F.col("d").alias("bd"), F.col("cents").alias("bc")
    )
    mtd = (
        daily.join(b, (F.col("bmon") == F.col("mon")) & (F.col("bd") <= F.col("d")))
        .groupBy("mon", "d", "dom", "cents")
        .agg(F.sum("bc").cast("long").alias("mtd_cents"))
    )
    month_tot = daily.groupBy("mon").agg(
        F.sum("cents").cast("long").alias("month_cents"),
        F.max("dom").cast("long").alias("days_in_month"),
    )
    j = mtd.join(F.broadcast(month_tot), "mon")
    pace = (
        F.col("mtd_cents").cast("double")
        * F.col("days_in_month")
        / (F.col("month_cents").cast("double") * F.col("dom"))
    )
    over = F.when(
        F.col("mtd_cents") * F.col("days_in_month")
        > F.expr("11 * month_cents * dom div 10"),
        1,
    ).otherwise(0)
    return j.select(
        "d",
        "mtd_cents",
        (F.floor(pace * 1e6 + 0.5) / 1e6).alias("pace_index_q"),
        over.alias("overpacing"),
    ).orderBy("d")


@_staged(
    "churn_threshold_ladder",
    """
    WITH last_seen AS (
      SELECT user_id, max(CAST(ts AS DATE)) AS last_d
      FROM events GROUP BY 1
    ),
    horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    inact AS (
      SELECT user_id,
             CAST(datediff('day', last_d, horizon.h) AS BIGINT) AS idle_days
      FROM last_seen CROSS JOIN horizon
    ),
    ladder AS (SELECT unnest([7, 14, 21, 28]) AS k)
    SELECT ladder.k AS threshold_days,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN idle_days >= ladder.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned,
           floor(CAST(sum(CASE WHEN idle_days >= ladder.k THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
             AS churn_rate_q
    FROM inact CROSS JOIN ladder
    GROUP BY ladder.k ORDER BY ladder.k
    """,
)
def churn_threshold_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-definition sensitivity — the product-analytics exercise
    behind every 'what even is churn' meeting: churn rate at
    7/14/21/28-day inactivity thresholds from one pass of per-user
    last-activity dates against the corpus horizon; the ladder is a
    4-row broadcast and every count is exact, so the row reds if
    EITHER engine misassigns a single boundary user (idle == k is
    churned — the >= convention, pinned here)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    last_seen = e.groupBy("user_id").agg(F.max("d").alias("last_d"))
    horizon = e.agg(F.max("d").alias("h"))
    inact = last_seen.crossJoin(F.broadcast(horizon)).select(
        "user_id", F.datediff("h", "last_d").cast("long").alias("idle_days")
    )
    ladder = spark.createDataFrame([(7,), (14,), (21,), (28,)], "k long")
    churned = F.sum(
        F.when(F.col("idle_days") >= F.col("k"), 1).otherwise(0)
    ).cast("long")
    return (
        inact.crossJoin(F.broadcast(ladder))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            churned.alias("n_churned"),
        )
        .select(
            F.col("k").alias("threshold_days"),
            "n_users",
            "n_churned",
            (
                F.floor(
                    F.col("n_churned").cast("double") / F.col("n_users") * 1e6 + 0.5
                )
                / 1e6
            ).alias("churn_rate_q"),
        )
        .orderBy("threshold_days")
    )


@_staged(
    "type_token_ratio_sources",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    clean AS (SELECT source, w FROM tok WHERE w <> ''),
    s AS (
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS tokens,
             CAST(count(*) AS BIGINT) AS types,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax
      FROM (
        SELECT source, w, count(*) AS cnt FROM clean GROUP BY 1, 2
      ) GROUP BY source
    )
    SELECT source, tokens, types, hapax,
           floor(CAST(types AS DOUBLE) / tokens * 1e6 + 0.5) / 1e6 AS ttr_q,
           floor(CAST(hapax AS DOUBLE) / types * 1e6 + 0.5) / 1e6
             AS hapax_ratio_q
    FROM s ORDER BY source
    """,
)
def type_token_ratio_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per source — type-token ratio and hapax
    (frequency-1) share, the corpus-quality tells that separate
    natural text from boilerplate and template spam (TTR collapses
    on templated corpora; hapax share collapses on token-recycled
    ones). Complements heaps_law_vocab_growth's curve with the
    per-source point stats. One (source, word) aggregate carries all
    three counts; exact integers, two quantized ratios (tokens =
    Σcnt over word cells, NOT the cell count — the off-by-a-level
    the staged gate caught in this query's first draft)."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    tok = (
        T(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    cells = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    s = cells.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("tokens"),
        F.count(F.lit(1)).cast("long").alias("types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
    )
    return s.select(
        "source",
        "tokens",
        "types",
        "hapax",
        (F.floor(F.col("types").cast("double") / F.col("tokens") * 1e6 + 0.5) / 1e6).alias(
            "ttr_q"
        ),
        (F.floor(F.col("hapax").cast("double") / F.col("types") * 1e6 + 0.5) / 1e6).alias(
            "hapax_ratio_q"
        ),
    ).orderBy("source")


@_staged(
    "open_orders_per_day",
    """
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS opened,
             max(CAST(l.l_shipdate AS DATE)) AS closed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT opened AS d, CAST(count(*) AS BIGINT) AS delta FROM spans
      GROUP BY 1
      UNION ALL
      SELECT CAST(closed + INTERVAL 1 DAY AS DATE),
             CAST(-count(*) AS BIGINT) FROM spans GROUP BY 1
    ),
    net AS (
      SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM deltas GROUP BY d
    ),
    sweep AS (
      SELECT d, sum(delta) OVER (ORDER BY d) AS open_orders
      FROM net
    )
    SELECT d, CAST(open_orders AS BIGINT) AS open_orders
    FROM sweep
    ORDER BY open_orders DESC, d ASC LIMIT 20
    """,
)
def open_orders_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting — open orders in flight per day,
    the backlog/WIP metric every ops dashboard carries: each order is
    an interval [orderdate, last shipdate], counted by the classic
    BOUNDARY SWEEP (+1 at open, −1 the day after close, prefix-sum
    of net deltas) instead of exploding order×days — O(orders) rows
    reduced to O(distinct days), then one pass of
    operators/windows.py::prefix_sum (the oracle uses a plain
    windowed cumulative over the same exact integers). Top-20
    busiest days."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum
    from dbt_lakehouse_aws_spark.standard_queries import T

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_orderdate").cast("date").alias("opened")
    )
    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_shipdate").cast("date").alias("ship")
    )
    spans = o.join(l, "ok").groupBy("ok", "opened").agg(F.max("ship").alias("closed"))
    starts = spans.groupBy(F.col("opened").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("delta")
    )
    ends = spans.groupBy(F.date_add("closed", 1).alias("d")).agg(
        (-F.count(F.lit(1))).cast("long").alias("delta")
    )
    net = starts.unionAll(ends).groupBy("d").agg(
        F.sum("delta").cast("long").alias("delta")
    )
    sweep = prefix_sum(net, [F.asc("d")], "delta", name="open_orders")
    return (
        sweep.select("d", F.col("open_orders").cast("long").alias("open_orders"))
        .orderBy(F.desc("open_orders"), F.asc("d"))
        .limit(20)
    )


@_staged(
    "acid_drop_column_events",
    """
    WITH base AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    )
    SELECT event_type, n, cents,
           CAST(3 AS BIGINT) AS cols_before,
           CAST(2 AS BIGINT) AS cols_after,
           CAST(1 AS BIGINT) AS timetravel_sees_dropped
    FROM base ORDER BY event_type
    """,
)
def acid_drop_column_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE DROP COLUMN under the driver gate
    (sources/acid.py::drop_column): load (event_type, cents,
    event_id) into an ACID table, drop the cents column — a
    metadata-only commit, files untouched — then verify (a) current
    reads carry 2 columns and the full row count per type, (b) time
    travel to the pre-drop version still reads the column. The
    oracle pins the per-type counts plus the three structural
    invariants as constants."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.standard_queries import T

    base = T(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    t = AcidTable(
        spark, tempfile.mkdtemp(prefix=f"dropcol_{uuid.uuid4().hex[:8]}_") + "/t"
    )
    t.write(base)
    v0 = t.latest_version()
    cols_before = len(t.read().columns)
    files_before = list(t.snapshot().files)
    t.drop_column("cents")
    assert list(t.snapshot().files) == files_before, "drop must be metadata-only"
    cols_after = len(t.read().columns)
    sees = 1 if "cents" in t.read(version=v0).columns else 0
    return (
        t.read(version=v0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            "event_type",
            "n",
            "cents",
            F.lit(cols_before).cast("long").alias("cols_before"),
            F.lit(cols_after).cast("long").alias("cols_after"),
            F.lit(sees).cast("long").alias("timetravel_sees_dropped"),
        )
        .orderBy("event_type")
    )


@_staged(
    "duplicate_payment_pairs",
    """
    WITH pay AS (
      SELECT user_id, event_id,
             CAST(round(value) AS BIGINT) AS dollars,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id,
           CAST(count(*) AS BIGINT) AS n_dup_pairs,
           CAST(min(b.sec - a.sec) AS BIGINT) AS closest_gap_s,
           CAST(sum(a.dollars) AS BIGINT) AS exposed_dollars
    FROM pay a JOIN pay b
      ON b.user_id = a.user_id AND b.dollars = a.dollars
     AND b.event_id > a.event_id
     AND b.sec - a.sec BETWEEN 0 AND 86400
    GROUP BY a.user_id
    ORDER BY n_dup_pairs DESC, a.user_id ASC LIMIT 20
    """,
)
def duplicate_payment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection — the double-charge screen every
    payments team runs: purchase pairs on the SAME user and SAME
    exact amount within 5 minutes, found by an equi-join on
    (user, cents) — the selective keys do the work; the time window
    is a residual predicate, so there is no range-join blowup and
    the join shuffles once on keys whose groups are small by nature
    (few same-amount purchases per user). event_id ordering
    deduplicates the pair direction; integer cents and epoch seconds
    throughout. Top-20 users by pair count with closest gap and
    exposed amount."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    pay = T(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        "event_id",
        F.round(F.col("value")).cast("long").alias("dollars"),
        F.unix_timestamp("ts").alias("sec"),
    )
    b = pay.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("e2"),
        F.col("dollars").alias("d2"),
        F.col("sec").alias("s2"),
    )
    pairs = pay.join(
        b,
        (F.col("u2") == F.col("user_id"))
        & (F.col("d2") == F.col("dollars"))
        & (F.col("e2") > F.col("event_id"))
        & (F.col("s2") - F.col("sec") >= 0)
        & (F.col("s2") - F.col("sec") <= 86400),
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.min(F.col("s2") - F.col("sec")).cast("long").alias("closest_gap_s"),
            F.sum("dollars").cast("long").alias("exposed_dollars"),
        )
        .orderBy(F.desc("n_dup_pairs"), F.asc("user_id"))
        .limit(20)
    )


@_staged(
    "stl_anomaly_days",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    ma AS (
      SELECT a.d, a.cents,
             CAST(sum(b.cents) AS BIGINT) AS sum7
      FROM daily a JOIN daily b
        ON b.d BETWEEN a.d - INTERVAL 3 DAY AND a.d + INTERVAL 3 DAY
      GROUP BY a.d, a.cents
      HAVING count(*) = 7
    ),
    season AS (
      SELECT CAST(EXTRACT(dow FROM d) + 1 AS BIGINT) AS wd,
             CAST(sum(7 * cents - sum7) AS BIGINT) AS dsum,
             CAST(count(*) AS BIGINT) AS n
      FROM ma GROUP BY 1
    ),
    resid AS (
      SELECT ma.d,
             CAST(floor((ma.cents - CAST(ma.sum7 AS DOUBLE) / 7
                         - CAST(s.dsum AS DOUBLE) / (7 * s.n)) * 1e6 + 0.5)
                  AS BIGINT) AS r
      FROM ma JOIN season s
        ON s.wd = CAST(EXTRACT(dow FROM ma.d) + 1 AS BIGINT)
    ),
    med AS (
      SELECT CAST(quantile_disc(r, 0.5) AS BIGINT) AS m FROM resid
    ),
    mad AS (
      SELECT m, CAST(quantile_disc(abs(r - m), 0.5) AS BIGINT) AS mad
      FROM resid CROSS JOIN med GROUP BY m
    )
    SELECT resid.d, CAST(resid.r AS DOUBLE) / 1e6 AS residual_q,
           CASE WHEN abs(resid.r - mad.m) > 3 * mad.mad
                THEN 1 ELSE 0 END AS anomaly
    FROM resid CROSS JOIN mad
    WHERE abs(resid.r - mad.m) > 3 * mad.mad
    ORDER BY resid.d
    """,
)
def stl_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly days — the composition a real
    monitoring pipeline runs: STL-lite residuals (the
    stl_lite_daily_events decomposition, quantized to INTEGER
    micro-units) gated by the robust median ± 3·MAD rule, both
    computed as exact discrete quantiles of integers — so the
    anomaly boundary is an integer comparison, never float-vs-float
    (the burst-detection discipline, with a robust location/scale
    instead of a trailing mean). Returns only the flagged days;
    flagging is calendar-bounded day-frame work end to end."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    daily = T(spark, sf_dir, "events").groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    b = daily.select(F.col("d").alias("bd"), F.col("cents").alias("bcents"))
    ma = (
        daily.join(
            b,
            (F.col("bd") >= F.date_sub(F.col("d"), 3))
            & (F.col("bd") <= F.date_add(F.col("d"), 3)),
        )
        .groupBy("d", "cents")
        .agg(
            F.sum("bcents").cast("long").alias("sum7"),
            F.count(F.lit(1)).cast("long").alias("n7"),
        )
        .filter(F.col("n7") == 7)
    )
    season = ma.groupBy(F.dayofweek("d").cast("long").alias("wd")).agg(
        F.sum(7 * F.col("cents") - F.col("sum7")).cast("long").alias("dsum"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    resid_val = (
        F.col("cents")
        - F.col("sum7").cast("double") / 7
        - F.col("dsum").cast("double") / (7 * F.col("n"))
    )
    resid = ma.join(
        F.broadcast(season), F.dayofweek(ma["d"]).cast("long") == F.col("wd")
    ).select("d", F.floor(resid_val * 1e6 + 0.5).cast("long").alias("r"))
    med = resid.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r)")
        .cast("long")
        .alias("m")
    )
    mad = (
        resid.crossJoin(F.broadcast(med))
        .select((F.abs(F.col("r") - F.col("m"))).alias("ar"), "m")
        .groupBy("m")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ar)")
            .cast("long")
            .alias("mad")
        )
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("r") - F.col("m")) > 3 * F.col("mad"))
        .select(
            "d",
            (F.col("r").cast("double") / 1e6).alias("residual_q"),
            F.lit(1).alias("anomaly"),
        )
        .orderBy("d")
    )


@_staged(
    "scd3_user_prior_state",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS current_type,
           coalesce(prev_type, 'n/a') AS prior_type,
           CAST(event_id AS BIGINT) AS current_event_id
    FROM seq WHERE rn = 1 AND user_id % 20 = 0
    ORDER BY user_id
    """,
)
def scd3_user_prior_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 — the 'current + previous value' dimension shape
    (Type 2 keeps full history rows, Type 3 keeps ONE prior column —
    the cheap answer when only the last transition matters): per
    user, the latest event type and the type immediately before it,
    from one pass of per-user windows (lag for the prior, reverse
    row_number for the latest — both hash-partitioned). The 'n/a'
    sentinel pins single-event users. Key-sliced output."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrev = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    seq = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(wrev).alias("rn"),
    )
    return (
        seq.filter((F.col("rn") == 1) & (F.col("user_id") % 20 == 0))
        .select(
            "user_id",
            F.col("event_type").alias("current_type"),
            F.coalesce("prev_type", F.lit("n/a")).alias("prior_type"),
            F.col("event_id").cast("long").alias("current_event_id"),
        )
        .orderBy("user_id")
    )


@_staged(
    "bitemporal_asof_events",
    """
    WITH horizon AS (
      SELECT min(CAST(ts AS DATE)) + INTERVAL 20 DAY AS v FROM events
    ),
    known_v1 AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_id % 2 = 0
    ),
    state_v1 AS (
      SELECT user_id, event_type AS s1 FROM (
        SELECT k.user_id, k.event_type,
               row_number() OVER (PARTITION BY k.user_id
                                  ORDER BY k.ts DESC, k.event_id DESC) AS rn
        FROM known_v1 k CROSS JOIN horizon
        WHERE CAST(k.ts AS DATE) <= horizon.v
      ) WHERE rn = 1
    ),
    state_now AS (
      SELECT user_id, event_type AS s2 FROM (
        SELECT e.user_id, e.event_type,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        FROM events e CROSS JOIN horizon
        WHERE CAST(e.ts AS DATE) <= horizon.v
      ) WHERE rn = 1
    )
    SELECT coalesce(a.s1, 'unknown') AS state_at_v1,
           b.s2 AS state_now,
           CAST(count(*) AS BIGINT) AS n_users
    FROM state_now b LEFT JOIN state_v1 a ON a.user_id = b.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def bitemporal_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of — the two-clock question insurance/finance
    marts answer: for one VALID time V (day 20), what was each
    user's state AS WE KNEW IT at transaction version 1 (only the
    even-id events had arrived) vs AS WE KNOW NOW (everything,
    including late arrivals) — materialized through the ACID layer:
    v1 is a real commit, the late events a second commit, and the
    two knowledge states are TIME-TRAVEL reads of the same table;
    the correction matrix (state@v1 × state@now user counts, with
    'unknown' for users v1 hadn't seen at all) is what a reserving
    actuary calls development. The oracle replays both knowledge
    states relationally from the raw events."""
    import tempfile
    import uuid

    from dbt_lakehouse_aws_spark.sources.acid import AcidTable
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    t = AcidTable(
        spark, tempfile.mkdtemp(prefix=f"bt_{uuid.uuid4().hex[:8]}_") + "/t"
    )
    t.write(e.filter(F.col("event_id") % 2 == 0))
    v1 = t.latest_version()
    t.write(e.filter(F.col("event_id") % 2 == 1), mode="append")

    horizon = e.agg(F.date_add(F.min(F.to_date("ts")), 20).alias("v"))

    def state_at(df):
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            df.crossJoin(F.broadcast(horizon))
            .filter(F.to_date("ts") <= F.col("v"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type")
        )

    s1 = state_at(t.read(version=v1)).withColumnRenamed("event_type", "s1")
    s2 = state_at(t.read()).withColumnRenamed("event_type", "s2")
    return (
        s2.join(s1, "user_id", "left")
        .groupBy(
            F.coalesce("s1", F.lit("unknown")).alias("state_at_v1"),
            F.col("s2").alias("state_now"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("state_at_v1", "state_now")
    )


@_staged(
    "eb_shrunk_return_rates",
    """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM lineitem GROUP BY 1
    ),
    eligible AS (
      SELECT *, CAST(floor(CAST(k AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)
                  AS rq
      FROM per_part WHERE n >= 5
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS c,
             CAST(sum(rq) AS BIGINT) AS s1,
             CAST(sum(rq * rq) AS BIGINT) AS s2
      FROM eligible
    ),
    prior AS (
      SELECT CAST(s1 AS DOUBLE) / c / 1e6 AS m,
             (CAST(s2 AS DOUBLE) / c - (CAST(s1 AS DOUBLE) / c)
               * (CAST(s1 AS DOUBLE) / c)) / 1e12 AS v
      FROM mom
    ),
    ab AS (
      SELECT m, v,
             m * (m * (1 - m) / v - 1) AS alpha,
             (1 - m) * (m * (1 - m) / v - 1) AS beta
      FROM prior
    ),
    scored AS (
      SELECT e.l_partkey, e.n, e.k,
             CAST(floor((e.k + ab.alpha) / (e.n + ab.alpha + ab.beta)
                        * 1e6 + 0.5) AS BIGINT) AS shrunk_scaled
      FROM eligible e CROSS JOIN ab
    )
    SELECT l_partkey, n, k,
           CAST(shrunk_scaled AS DOUBLE) / 1e6 AS shrunk_rate_q
    FROM scored
    ORDER BY shrunk_scaled DESC, l_partkey ASC LIMIT 20
    """,
)
def eb_shrunk_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-part return rates — the
    small-sample leaderboard fix (a 2/2 part must not outrank a
    48/100 one): a Beta prior fitted by method of moments over the
    population of per-part rates, each rate QUANTIZED to integer
    millionths before the moment sums (order-free — the jackknife
    discipline), then every part's rate shrunk to
    (k+α)/(n+α+β). Ranking is by the quantized shrunk rate with key
    tiebreak, so the top-20 is float-drift-proof; parts under 5
    lineitems are excluded from the prior fit and the board."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    per_part = T(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    eligible = per_part.filter(F.col("n") >= 5).withColumn(
        "rq",
        F.floor(F.col("k").cast("double") / F.col("n") * 1e6 + 0.5).cast("long"),
    )
    mom = eligible.agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("rq").cast("long").alias("s1"),
        F.sum(F.col("rq") * F.col("rq")).cast("long").alias("s2"),
    )
    c = F.col("c")
    m = F.col("s1").cast("double") / c / 1e6
    v = (
        F.col("s2").cast("double") / c
        - (F.col("s1").cast("double") / c) * (F.col("s1").cast("double") / c)
    ) / 1e12
    ab = mom.select(
        (m * (m * (1 - m) / v - 1)).alias("alpha"),
        ((1 - m) * (m * (1 - m) / v - 1)).alias("beta"),
    )
    shrunk = F.floor(
        (F.col("k") + F.col("alpha"))
        / (F.col("n") + F.col("alpha") + F.col("beta"))
        * 1e6
        + 0.5
    ).cast("long")
    return (
        eligible.crossJoin(F.broadcast(ab))
        .select("l_partkey", "n", "k", shrunk.alias("shrunk_scaled"))
        .orderBy(F.desc("shrunk_scaled"), F.asc("l_partkey"))
        .limit(20)
        .select(
            "l_partkey",
            "n",
            "k",
            (F.col("shrunk_scaled").cast("double") / 1e6).alias("shrunk_rate_q"),
        )
    )


def _minhash_eval_oracle() -> str:
    """Compose the portable MinHash-LSH replay (est ≥ 0.5) with the
    exact 3-shingle Jaccard ground truth into one WITH chain and
    reduce to precision/recall/F1 — reusing standard_queries'
    builders so the eval can never drift from the audited pipelines."""
    from dbt_lakehouse_aws_spark.standard_queries import _minhash_lsh_oracle

    full = _minhash_lsh_oracle(est_threshold=0.5)
    cut = full.rindex("    SELECT a.doc_id AS doc_a")
    ctes, est_select = full[:cut], full[cut:]
    return f"""{ctes},
    est AS ({est_select}),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i) >= 0.5
    ),
    cm AS (
      SELECT CAST(sum(CASE WHEN e.doc_a IS NOT NULL AND x.doc_a IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN x.doc_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS fp,
             CAST(sum(CASE WHEN e.doc_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS fn
      FROM est e FULL JOIN exact x
        ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b
    )
    SELECT tp, fp, fn,
           floor(CAST(tp AS DOUBLE) / nullif(tp + fp, 0) * 1e6 + 0.5) / 1e6
             AS precision_q,
           floor(CAST(tp AS DOUBLE) / nullif(tp + fn, 0) * 1e6 + 0.5) / 1e6
             AS recall_q
    FROM cm
    """


@_staged("minhash_eval_vs_exact", _minhash_eval_oracle())
def minhash_eval_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation — MinHash(32)+LSH estimated
    near-dup pairs (est ≥ 0.5) scored against the EXACT 3-shingle
    Jaccard ground truth, both engine pipelines the audited
    production ones (portable-hash mode): the confusion counts and
    precision/recall every dedup rollout reports before trusting a
    sketch at 100 TB, where exact Jaccard is only affordable on an
    audit sample exactly like this. The oracle composes the same two
    replays from the shared SQL builders, so a drift in EITHER
    pipeline reds this row."""
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, n=3, num_hashes=32, portable=True)
    est = lsh_candidate_pairs(sigs, num_bands=8, est_threshold=0.5).select(
        "doc_a", "doc_b"
    )
    exact = ngram_jaccard_pairs(d, n=3, threshold=0.5).select(
        F.col("doc_a").alias("xa"), F.col("doc_b").alias("xb")
    )
    j = est.join(
        exact, (F.col("xa") == F.col("doc_a")) & (F.col("xb") == F.col("doc_b")), "full"
    )
    cm = j.agg(
        F.sum(
            F.when(F.col("doc_a").isNotNull() & F.col("xa").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("xa").isNull(), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(F.col("doc_a").isNull(), 1).otherwise(0)).cast("long").alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return cm.select(
        "tp",
        "fp",
        "fn",
        q6(tp.cast("double") / F.nullif(tp + fp, F.lit(0))).alias("precision_q"),
        q6(tp.cast("double") / F.nullif(tp + fn, F.lit(0))).alias("recall_q"),
    )


@_staged(
    "peak_event_rate_users",
    """
    WITH x AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             event_id
      FROM events
    ),
    windowed AS (
      SELECT user_id,
             CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN CURRENT ROW AND 3600 FOLLOWING
             ) AS BIGINT) AS burst_n,
             sec
      FROM x
    )
    SELECT user_id,
           CAST(max(burst_n) AS BIGINT) AS peak_events_per_hour,
           CAST(min(CASE WHEN burst_n = mx THEN sec END) AS BIGINT)
             AS first_peak_start_sec
    FROM (SELECT *, max(burst_n) OVER (PARTITION BY user_id) AS mx
          FROM windowed)
    GROUP BY user_id
    ORDER BY peak_events_per_hour DESC, user_id ASC LIMIT 20
    """,
)
def peak_event_rate_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak sliding-window rate per user — the rate-limiter /
    abuse-detection audit: the maximum number of events any user
    fits in ANY trailing-anchored 1-hour window, computed with a
    RANGE frame over epoch seconds (every event anchors a window;
    RANGE — not ROWS — so same-second events all count; the classic
    two-pointer sweep expressed declaratively). Windows are per-user
    hash partitions; epoch seconds floored identically on both
    engines. Top-20 users with when their first peak started."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    x = T(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("sec"), "event_id"
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(0, 3600)
    )
    windowed = x.select(
        "user_id", "sec", F.count(F.lit(1)).over(wr).cast("long").alias("burst_n")
    )
    wmax = Window.partitionBy("user_id")
    flagged = windowed.withColumn("mx", F.max("burst_n").over(wmax))
    return (
        flagged.groupBy("user_id")
        .agg(
            F.max("burst_n").cast("long").alias("peak_events_per_hour"),
            F.min(F.when(F.col("burst_n") == F.col("mx"), F.col("sec")))
            .cast("long")
            .alias("first_peak_start_sec"),
        )
        .orderBy(F.desc("peak_events_per_hour"), F.asc("user_id"))
        .limit(20)
    )


@_staged(
    "regression_discontinuity_orders",
    """
    WITH x AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) - 15000000 AS r,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
      WHERE abs(CAST(round(o_totalprice * 100) AS BIGINT) - 15000000)
            <= 5000000
    ),
    s AS (
      SELECT CASE WHEN r >= 0 THEN 1 ELSE 0 END AS side,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(r AS HUGEINT) * r) AS DOUBLE) AS sxx,
             CAST(sum(r * y) AS BIGINT) AS sxy
      FROM x GROUP BY 1
    ),
    fit AS (
      SELECT side, n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (n * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
             CAST(sy AS DOUBLE) / n
               - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(sx AS DOUBLE) / n) AS intercept_at_cutoff
      FROM s
    )
    SELECT r.n AS n_right, l.n AS n_left,
           floor((r.intercept_at_cutoff - l.intercept_at_cutoff)
                 * 1e6 + 0.5) / 1e6 AS jump_q,
           floor(l.slope * 1e12 + 0.5) / 1e12 AS slope_left_q,
           floor(r.slope * 1e12 + 0.5) / 1e12 AS slope_right_q
    FROM fit r JOIN fit l ON r.side = 1 AND l.side = 0
    """,
)
def regression_discontinuity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression discontinuity — the fourth member of the causal
    family (diff-in-diff, stratified ATE, CUPED): local linear fits
    on each side of the $150k order-value cutoff within a ±$50k
    bandwidth, treatment effect = the jump between the two
    intercepts EVALUATED AT THE CUTOFF (centered running variable r,
    so intercept_at_cutoff = ȳ − b·x̄). Each side is one pass of
    integer sufficient statistics (Σr² rides HUGEINT/DECIMAL); the
    slope/intercept/jump are fixed-order float expressions —
    slopes quantized at 1e-12 (they live near zero per cent),
    the jump at 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    CUT, BW = 15000000, 5000000
    x = (
        T(spark, sf_dir, "orders")
        .select(
            (F.round(F.col("o_totalprice") * 100).cast("long") - CUT).alias("r"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0).alias("y"),
        )
        .filter(F.abs(F.col("r")) <= BW)
    )
    dec = "decimal(19,0)"
    s = x.groupBy(
        F.when(F.col("r") >= 0, 1).otherwise(0).alias("side")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("r").cast(dec) * F.col("r").cast(dec)).cast("double").alias("sxx"),
        F.sum(F.col("r") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = F.col("sy").cast("double") / n - slope * (
        F.col("sx").cast("double") / n
    )
    fit = s.select("side", "n", slope.alias("slope"), intercept.alias("icpt"))
    r = fit.filter("side = 1").select(
        F.col("n").alias("n_right"), F.col("slope").alias("sr"), F.col("icpt").alias("ir")
    )
    l = fit.filter("side = 0").select(
        F.col("n").alias("n_left"), F.col("slope").alias("sl"), F.col("icpt").alias("il")
    )
    return r.crossJoin(F.broadcast(l)).select(
        "n_right",
        "n_left",
        (F.floor((F.col("ir") - F.col("il")) * 1e6 + 0.5) / 1e6).alias("jump_q"),
        (F.floor(F.col("sl") * 1e12 + 0.5) / 1e12).alias("slope_left_q"),
        (F.floor(F.col("sr") * 1e12 + 0.5) / 1e12).alias("slope_right_q"),
    )


@_staged(
    "kpi_driver_decomposition",
    """
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) + INTERVAL 14 DAY AS cutoff FROM events
    ),
    p AS (
      SELECT CASE WHEN CAST(ts AS DATE) < bounds.cutoff THEN 1 ELSE 2 END
               AS period,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events CROSS JOIN bounds
      GROUP BY 1
    ),
    j AS (
      SELECT a.users AS u1, b.users AS u2,
             a.n_events AS e1, b.n_events AS e2,
             a.cents AS c1, b.cents AS c2
      FROM p a JOIN p b ON a.period = 1 AND b.period = 2
    ),
    lm AS (
      SELECT *,
             (c2 - c1) / (ln(CAST(c2 AS DOUBLE)) - ln(CAST(c1 AS DOUBLE)))
               AS lmean
      FROM j
    )
    SELECT c2 - c1 AS delta_cents,
           floor(lmean * ln(CAST(u2 AS DOUBLE) / u1) * 1e6 + 0.5) / 1e6
             AS users_contrib_q,
           floor(lmean * ln((CAST(e2 AS DOUBLE) / u2)
                            / (CAST(e1 AS DOUBLE) / u1)) * 1e6 + 0.5) / 1e6
             AS intensity_contrib_q,
           floor(lmean * ln((CAST(c2 AS DOUBLE) / e2)
                            / (CAST(c1 AS DOUBLE) / e1)) * 1e6 + 0.5) / 1e6
             AS value_contrib_q
    FROM lm
    """,
)
def kpi_driver_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI driver-tree decomposition (LMDI) — the executive 'why did
    revenue move' answer: Δrevenue between the first fortnight and
    the rest splits EXACTLY (the logarithmic-mean Divisia identity —
    contributions sum to the delta by construction, unlike naive
    %-change attribution) across the factor chain revenue = users ×
    events/user × value/event. One grouped pass to six integers; the
    log-mean and three ln-ratio contributions are fixed-order float
    expressions on exact inputs, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = e.agg(F.date_add(F.min("d"), 14).alias("cutoff"))
    p = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.when(F.col("d") < F.col("cutoff"), 1).otherwise(2).alias("period")
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    a = p.filter("period = 1").select(
        F.col("users").alias("u1"), F.col("n_events").alias("e1"), F.col("cents").alias("c1")
    )
    b = p.filter("period = 2").select(
        F.col("users").alias("u2"), F.col("n_events").alias("e2"), F.col("cents").alias("c2")
    )
    j = a.crossJoin(F.broadcast(b))
    lmean = (F.col("c2") - F.col("c1")) / (
        F.log(F.col("c2").cast("double")) - F.log(F.col("c1").cast("double"))
    )

    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return j.select(
        (F.col("c2") - F.col("c1")).alias("delta_cents"),
        q6(lmean * F.log(F.col("u2").cast("double") / F.col("u1"))).alias(
            "users_contrib_q"
        ),
        q6(
            lmean
            * F.log(
                (F.col("e2").cast("double") / F.col("u2"))
                / (F.col("e1").cast("double") / F.col("u1"))
            )
        ).alias("intensity_contrib_q"),
        q6(
            lmean
            * F.log(
                (F.col("c2").cast("double") / F.col("e2"))
                / (F.col("c1").cast("double") / F.col("e1"))
            )
        ).alias("value_contrib_q"),
    )


@_staged(
    "capture_recapture_users",
    """
    WITH s1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(EXTRACT(day FROM ts) AS BIGINT) % 2 = 0
    ),
    s2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(EXTRACT(day FROM ts) AS BIGINT) % 2 = 1
    ),
    c AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
             (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
             (SELECT CAST(count(*) AS BIGINT)
              FROM s1 JOIN s2 USING (user_id)) AS m,
             (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
               AS true_n
    )
    SELECT n1, n2, m, true_n,
           floor(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0) * 1e6 + 0.5)
             / 1e6 AS chapman_estimate_q
    FROM c
    """,
)
def capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman) population estimate — the
    mark-recapture device for 'how many distinct entities exist when
    no sample sees them all' (census coverage, dedup-universe
    sizing, bot-population estimates): even-day actives are the
    marked sample, odd-day actives the recapture, N̂ =
    (n1+1)(n2+1)/(m+1) − 1 (Chapman's bias-corrected form). The
    TRUE distinct count rides along so the row doubles as an
    accuracy exhibit; exact integer counts, one fixed-order float
    expression, floor-quantized 1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    e = T(spark, sf_dir, "events").select(
        "user_id", F.dayofmonth("ts").cast("long").alias("dom")
    )
    s1 = e.filter(F.col("dom") % 2 == 0).select("user_id").distinct()
    s2 = e.filter(F.col("dom") % 2 == 1).select("user_id").distinct()
    c = (
        s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).cast("long").alias("n2")))
        .crossJoin(
            s1.join(s2, "user_id").agg(F.count(F.lit(1)).cast("long").alias("m"))
        )
        .crossJoin(e.agg(F.countDistinct("user_id").cast("long").alias("true_n")))
    )
    chapman = (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0
    return c.select(
        "n1",
        "n2",
        "m",
        "true_n",
        (F.floor(chapman * 1e6 + 0.5) / 1e6).alias("chapman_estimate_q"),
    )


@_staged(
    "transition_latency_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS prev_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS median_gap_s,
           CAST(quantile_disc(gap_s, 0.9) AS BIGINT) AS p90_gap_s
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def transition_latency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition latency matrix — the ops companion to the Markov
    transition counts: median and p90 seconds between each
    consecutive event-type pair (how long after a view does the
    purchase come; which handoffs stall). Gaps are exact integer
    seconds from per-user lag windows; the per-cell quantiles are
    DISCRETE (actual data values, engine-identical); the matrix is
    vocabulary-bounded — |types|² cells regardless of row count."""
    from dbt_lakehouse_aws_spark.standard_queries import T
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    seq = T(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (sec - F.lag(sec).over(w)).alias("gap_s"),
    )

    def pdisc(p):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY gap_s)"
        ).cast("long")

    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pdisc(0.5).alias("median_gap_s"),
            pdisc(0.9).alias("p90_gap_s"),
        )
        .orderBy("prev_type", "next_type")
    )


@_staged(
    "weighted_kappa_quality",
    """
    WITH rated AS (
      SELECT CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1
                  WHEN n_chars < 600 THEN 2 ELSE 3 END AS ra,
             CASE WHEN v4 < length(text) THEN 0
                  WHEN v4 < 2 * length(text) THEN 1
                  WHEN v4 < 3 * length(text) THEN 2 ELSE 3 END AS rb
      FROM (
        SELECT n_chars, text,
               4 * (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')))
                 AS v4
        FROM documents
      )
    ),
    cm AS (
      SELECT ra, rb, CAST(count(*) AS BIGINT) AS o
      FROM rated GROUP BY 1, 2
    ),
    m AS (
      SELECT CAST(sum(o) AS BIGINT) AS n FROM cm
    ),
    marg AS (
      SELECT a.ra, b.rb, a.na, b.nb
      FROM (SELECT ra, CAST(sum(o) AS BIGINT) AS na FROM cm GROUP BY 1) a
      CROSS JOIN (SELECT rb, CAST(sum(o) AS BIGINT) AS nb FROM cm GROUP BY 1) b
    ),
    terms AS (
      SELECT CAST(sum((marg.ra - marg.rb) * (marg.ra - marg.rb)
                      * coalesce(cm.o, 0)) AS BIGINT) AS wo_n,
             CAST(sum((marg.ra - marg.rb) * (marg.ra - marg.rb)
                      * CAST(marg.na AS HUGEINT) * marg.nb) AS DOUBLE)
               AS we_nn
      FROM marg LEFT JOIN cm ON cm.ra = marg.ra AND cm.rb = marg.rb
    )
    SELECT m.n,
           floor((1 - CAST(terms.wo_n AS DOUBLE) * m.n / terms.we_nn)
                 * 1e6 + 0.5) / 1e6 AS weighted_kappa_q
    FROM terms CROSS JOIN m
    """,
)
def weighted_kappa_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted Cohen's kappa — the inter-rater agreement
    statistic (labeling QA, model-vs-human grading): two independent
    4-level document 'raters' (length bands; vowel-density bands —
    both fixed-threshold, no rank windows), κ_w = 1 − Σw·O / Σw·E
    with quadratic weights (ra−rb)². Observed and expected terms are
    EXACT integers over the 4×4 contingency (expected rides
    HUGEINT/DECIMAL for nₐ·n_b), one float expression, quantized
    1e-6."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    d = T(spark, sf_dir, "documents").select(
        "n_chars",
        "text",
        (
            4
            * (
                F.length("text")
                - F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
            )
        ).alias("v4"),
    )
    rated = d.select(
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 400, 1)
        .when(F.col("n_chars") < 600, 2)
        .otherwise(3)
        .alias("ra"),
        F.when(F.col("v4") < F.length("text"), 0)
        .when(F.col("v4") < 2 * F.length("text"), 1)
        .when(F.col("v4") < 3 * F.length("text"), 2)
        .otherwise(3)
        .alias("rb"),
    )
    cm = rated.groupBy("ra", "rb").agg(F.count(F.lit(1)).cast("long").alias("o"))
    n_tot = cm.agg(F.sum("o").cast("long").alias("n"))
    na = cm.groupBy("ra").agg(F.sum("o").cast("long").alias("na"))
    nb = cm.groupBy("rb").agg(F.sum("o").cast("long").alias("nb"))
    marg = na.crossJoin(nb)
    dec = "decimal(19,0)"
    w = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
    terms = (
        marg.join(cm, ["ra", "rb"], "left")
        .agg(
            F.sum(w * F.coalesce(F.col("o"), F.lit(0))).cast("long").alias("wo_n"),
            F.sum(w.cast(dec) * F.col("na").cast(dec) * F.col("nb").cast(dec))
            .cast("double")
            .alias("we_nn"),
        )
    )
    kappa = 1 - F.col("wo_n").cast("double") * F.col("n") / F.col("we_nn")
    return terms.crossJoin(F.broadcast(n_tot)).select(
        "n", (F.floor(kappa * 1e6 + 0.5) / 1e6).alias("weighted_kappa_q")
    )


@_staged(
    "feature_gini_importance",
    """
    WITH lab AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y,
             o_orderstatus AS f_status,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) // 500000
                  AS VARCHAR) AS f_price_bin,
             CAST(CAST(EXTRACT(dow FROM o_orderdate) + 1 AS BIGINT)
                  AS VARCHAR) AS f_weekday
      FROM orders
    ),
    unp AS (
      SELECT 'status' AS feature, f_status AS val, y FROM lab
      UNION ALL
      SELECT 'price_bin', f_price_bin, y FROM lab
      UNION ALL
      SELECT 'weekday', f_weekday, y FROM lab
    ),
    cells AS (
      SELECT feature, val,
             CAST(sum(y) AS BIGINT) AS p,
             CAST(sum(1 - y) AS BIGINT) AS g
      FROM unp GROUP BY 1, 2
    ),
    per_feature AS (
      SELECT feature,
             CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(p) AS BIGINT) AS pt,
             CAST(sum(g) AS BIGINT) AS gt,
             sum((CAST(p AS DOUBLE) * p + CAST(g AS DOUBLE) * g)
                 / (p + g)) AS purity
      FROM cells GROUP BY 1
    )
    SELECT feature, n_values,
           floor((purity / (pt + gt)
                  - (CAST(pt AS DOUBLE) * pt + CAST(gt AS DOUBLE) * gt)
                    / (CAST(pt + gt AS DOUBLE) * (pt + gt)))
                 * 1e6 + 0.5) / 1e6 AS gini_gain_q
    FROM per_feature
    ORDER BY gini_gain_q DESC, feature ASC
    """,
)
def feature_gini_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-importance table by Gini gain — the stump device
    generalized to a feature RANKING (what a modeler reads before
    training anything): for each candidate feature (order status,
    $5k price bin, weekday) the impurity reduction of its multiway
    partition vs the parent, all from one unpivoted
    (feature, value, class) aggregate. The per-value purity sum is a
    float of exact-integer ratios over VOCABULARY-BOUNDED cells
    (statuses × bins × weekdays — drift ~cells·ulp, far under the
    1e-6 quantum); counts exact. Ranked by quantized gain with name
    tiebreak."""
    from dbt_lakehouse_aws_spark.standard_queries import T

    lab = T(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
        F.col("o_orderstatus").alias("f_status"),
        F.expr("cast(round(o_totalprice * 100) as bigint) div 500000")
        .cast("string")
        .alias("f_price_bin"),
        F.dayofweek("o_orderdate").cast("long").cast("string").alias("f_weekday"),
    )
    unp = (
        lab.select(F.lit("status").alias("feature"), F.col("f_status").alias("val"), "y")
        .unionAll(
            lab.select(
                F.lit("price_bin").alias("feature"),
                F.col("f_price_bin").alias("val"),
                "y",
            )
        )
        .unionAll(
            lab.select(
                F.lit("weekday").alias("feature"), F.col("f_weekday").alias("val"), "y"
            )
        )
    )
    cells = unp.groupBy("feature", "val").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(1 - F.col("y")).cast("long").alias("g"),
    )
    per_feature = cells.groupBy("feature").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("p").cast("long").alias("pt"),
        F.sum("g").cast("long").alias("gt"),
        F.sum(
            (F.col("p").cast("double") * F.col("p") + F.col("g").cast("double") * F.col("g"))
            / (F.col("p") + F.col("g"))
        ).alias("purity"),
    )
    pt, gt = F.col("pt"), F.col("gt")
    gain = F.col("purity") / (pt + gt) - (
        pt.cast("double") * pt + gt.cast("double") * gt
    ) / ((pt + gt).cast("double") * (pt + gt))
    return per_feature.select(
        "feature",
        "n_values",
        (F.floor(gain * 1e6 + 0.5) / 1e6).alias("gini_gain_q"),
    ).orderBy(F.desc("gini_gain_q"), F.asc("feature"))

"""Round-5 queries, promoted from staging into the main registry.

These were implemented and pytest-verified during round 4 while the
round-4 driver window was frozen (VERDICT r3 item 3), then promoted
here at the start of round 5: each ``@register`` call below appends
to ``standard_queries._REGISTRY`` exactly like an in-file
registration — ``standard_queries`` imports this module before it
builds the driver window, so the names participate in ``queries()`` /
``oracle_sql()`` and the entry-contract/plan-lint suites like any
other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.standard_queries import T, register

#: deterministic "dirty feed" of part names — char dropped or
#: transposed at a p_partkey-derived position; same expression runs
#: in Spark SQL and DuckDB (1-based substring, concat)
_DIRTY_NAME_SQL = """
    CASE p_partkey % 3
      WHEN 0 THEN p_name
      WHEN 1 THEN concat(substring(p_name, 1, p_partkey % (length(p_name) - 1)),
                         substring(p_name, p_partkey % (length(p_name) - 1) + 2))
      ELSE concat(substring(p_name, 1, p_partkey % (length(p_name) - 1)),
                  substring(p_name, p_partkey % (length(p_name) - 1) + 2, 1),
                  substring(p_name, p_partkey % (length(p_name) - 1) + 1, 1),
                  substring(p_name, p_partkey % (length(p_name) - 1) + 3))
    END
"""


@register(
    "record_linkage_parts",
    f"""
    WITH dirty AS (
      SELECT p_partkey AS dirty_key, p_brand, {_DIRTY_NAME_SQL} AS dirty_name
      FROM part
    )
    SELECT p.p_partkey, d.dirty_key,
           round(jaro_winkler_similarity(p.p_name, d.dirty_name), 6) AS sim
    FROM part p JOIN dirty d ON p.p_brand = d.p_brand
    WHERE round(jaro_winkler_similarity(p.p_name, d.dirty_name), 6) >= 0.92
    """,
)
def record_linkage_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage, clean catalog vs dirty feed: a
    deterministic typo generator (drop/transpose one character at a
    key-derived position) corrupts each part name; linkage blocks on
    the clean structured field (brand — the classic design: block on
    what survives entry errors), scores within-block candidates with
    Arrow-batched Jaro-Winkler, keeps sim ≥ 0.92. The kernel is
    bit-identical to DuckDB's ``jaro_winkler_similarity`` (calibrated
    rapidfuzz convention — llmops/linkage.py), which is what makes a
    FULL value oracle possible for a fuzzy-similarity operator."""
    from dbt_lakehouse_aws_spark.llmops.linkage import jw_linkage

    p = T(spark, sf_dir, "part")
    clean = p.select("p_partkey", "p_name", "p_brand")
    dirty = p.select(
        F.col("p_partkey").alias("dirty_key"),
        F.expr(_DIRTY_NAME_SQL).alias("dirty_name"),
        "p_brand",
    )
    return jw_linkage(
        clean,
        dirty,
        left_id="p_partkey",
        right_id="dirty_key",
        left_text="p_name",
        right_text="dirty_name",
        block_col="p_brand",
        threshold=0.92,
    )


@register(
    "orc_roundtrip_events",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(round(value, 2)), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def orc_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC storage roundtrip: the events table is written to ORC
    (Spark-native columnar writer — zlib striped, predicate-pushdown
    capable like parquet) and read back, and the aggregate over the
    READ-BACK copy must match the oracle computed over the original
    parquet — value-proving the format conversion end to end. DuckDB
    cannot read ORC, which is exactly why the oracle aggregates the
    source instead: lossless roundtrip ⇒ identical aggregates."""
    import tempfile

    ev = T(spark, sf_dir, "events").select("event_type", "user_id", "value")
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/events_orc"
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.round("value", 2)), 2).alias("total_value"),
    )


@register(
    "golden_record_parts",
    f"""
    WITH RECURSIVE dirty AS (
      SELECT p_partkey AS dirty_key, p_brand, {_DIRTY_NAME_SQL} AS dirty_name,
             p_retailprice
      FROM part
    ),
    matches AS (
      SELECT p.p_partkey, d.dirty_key
      FROM part p JOIN dirty d ON p.p_brand = d.p_brand
      WHERE round(jaro_winkler_similarity(p.p_name, d.dirty_name), 6) >= 0.92
    ),
    edges AS (
      SELECT 2 * p_partkey AS a, 2 * dirty_key + 1 AS b FROM matches
      UNION ALL
      SELECT 2 * dirty_key + 1, 2 * p_partkey FROM matches
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    records AS (
      SELECT 2 * p_partkey AS node, p_name AS name,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
      UNION ALL
      SELECT 2 * dirty_key + 1, dirty_name,
             CAST(round(p_retailprice * 100) AS BIGINT)
      FROM dirty
    ),
    labeled AS (
      SELECT node, name, cents,
             least(node, coalesce((SELECT min(dst) FROM reach WHERE src = node),
                                  node)) AS component
      FROM records
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(count(*) AS BIGINT) AS n_records,
           min_by(name, node) AS golden_name,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM labeled
    GROUP BY component
    """,
)
def golden_record_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM survivorship capstone over the linkage family: clean
    catalog + dirty feed → blocked JW matches → connected components
    (llmops/dedup.py::connected_components, the same iterated
    min-propagation used by the dedup pipelines) → one golden record
    per entity cluster. Survivorship is deterministic "trust the
    catalog, then lowest key": clean records get EVEN node ids and
    dirty ones ODD, so the min-node rule prefers a catalog name
    whenever the cluster has one — replayed in SQL as min_by over a
    recursive-CTE closure. Money is summed in integer cents (exact
    across engines)."""
    from dbt_lakehouse_aws_spark.llmops.dedup import connected_components
    from dbt_lakehouse_aws_spark.llmops.linkage import jw_linkage

    p = T(spark, sf_dir, "part")
    clean = p.select("p_partkey", "p_name", "p_brand", "p_retailprice")
    dirty = p.select(
        F.col("p_partkey").alias("dirty_key"),
        F.expr(_DIRTY_NAME_SQL).alias("dirty_name"),
        "p_brand",
        "p_retailprice",
    )
    matches = jw_linkage(
        clean,
        dirty,
        left_id="p_partkey",
        right_id="dirty_key",
        left_text="p_name",
        right_text="dirty_name",
        block_col="p_brand",
        threshold=0.92,
    )
    edges = matches.select(
        (2 * F.col("p_partkey")).alias("a"),
        (2 * F.col("dirty_key") + 1).alias("b"),
    )
    comps = connected_components(edges, a_col="a", b_col="b")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    records = clean.select(
        (2 * F.col("p_partkey")).alias("node"),
        F.col("p_name").alias("name"),
        cents.alias("cents"),
    ).unionByName(
        dirty.select(
            (2 * F.col("dirty_key") + 1).alias("node"),
            F.col("dirty_name").alias("name"),
            cents.alias("cents"),
        )
    )
    labeled = records.join(comps, "node", "left").withColumn(
        "component", F.least("node", F.coalesce("component", "node"))
    )
    return labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min_by("name", "node").alias("golden_name"),
        F.sum("cents").alias("total_cents"),
    )


@register(
    "jsonl_bz2_roundtrip_docs",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM documents
    GROUP BY lang
    """,
)
def jsonl_bz2_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text-landing ingest: documents are re-exported as
    bz2-compressed JSON Lines with Spark's DISTRIBUTED json writer
    (bzip2 is a splittable codec, so reads parallelize block-wise at
    scale too) and read back through the native json reader; the
    aggregate over the READ-BACK copy must match the oracle over the
    source parquet — proving the ingest path end to end, the same
    shape as the ORC roundtrip. No driver-side materialization in
    either direction."""
    import tempfile

    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    root = tempfile.mkdtemp(prefix="jsonl_bz2_") + "/docs"
    d.write.mode("overwrite").option("compression", "bzip2").json(root)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
    )


@register(
    "kneser_ney_quality_docs",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    b2 AS (
      SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
        FROM toks)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM b2 GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c2) AS c1, count(*) AS n1r FROM c2 GROUP BY w1),
    lft AS (SELECT w2, count(*) AS n1l FROM c2 GROUP BY w2),
    tot AS (SELECT count(*) AS tot FROM c2),
    model AS (
      SELECT w1, w2,
             ln(greatest(c2 - 0.75, 0.0) / c1
                + 0.75 * n1r / c1 * (n1l / tot)) AS lp
      FROM c2 JOIN c1 USING (w1) JOIN lft USING (w2) CROSS JOIN tot
    )
    SELECT doc_id, round(avg(lp), 6) AS avg_kn_logprob,
           count(*) AS n_bigrams
    FROM b2 JOIN model USING (w1, w2)
    GROUP BY doc_id
    """,
)
def kneser_ney_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram quality scoring over the
    corpus (llmops/text.py::kneser_ney_bigram_scores) — the classic
    smoothing, expressed as three hash aggregates + one scalar
    broadcast + one scoring join; the continuation-probability term
    is what distinguishes it from the MLE `bigram_lm_quality`
    already in the registry. Identical double-precision operation
    order on both engines keeps the 6-dp rounding exact."""
    from dbt_lakehouse_aws_spark.llmops.text import kneser_ney_bigram_scores

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    return kneser_ney_bigram_scores(d)


@register(
    "ql_dirichlet_topk_docs",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    dl AS (SELECT doc_id, len(w) AS dl FROM toks),
    flat AS (SELECT doc_id, unnest(w) AS t FROM toks),
    total AS (SELECT CAST(sum(dl) AS DOUBLE) AS ctot FROM dl),
    q(t) AS (VALUES ('spark'), ('join'), ('window')),
    cterm AS (
      -- zero-corpus-frequency terms are DROPPED (P(w|C)=0 would be
      -- ln(0) for every doc) — mirrors the engine exactly
      SELECT q.t, CAST(coalesce(c.cw, 0) AS BIGINT) AS cw
      FROM q LEFT JOIN (SELECT t, count(*) AS cw FROM flat
                        WHERE t IN ('spark','join','window') GROUP BY t) c
        USING (t)
      WHERE coalesce(c.cw, 0) > 0
    ),
    tf AS (SELECT doc_id, t, count(*) AS tf FROM flat
           WHERE t IN ('spark','join','window') GROUP BY doc_id, t),
    grid AS (SELECT dl.doc_id, dl.dl, ct.t, ct.cw, total.ctot
             FROM dl CROSS JOIN cterm ct CROSS JOIN total),
    scored AS (
      SELECT g.doc_id,
             ln((coalesce(tf.tf, 0) + 2000.0 * (g.cw / g.ctot))
                / (g.dl + 2000.0)) AS lp
      FROM grid g LEFT JOIN tf ON tf.doc_id = g.doc_id AND tf.t = g.t
    )
    SELECT doc_id, round(sum(lp), 6) AS ql_score
    FROM scored GROUP BY doc_id
    ORDER BY ql_score DESC, doc_id ASC LIMIT 20
    """,
)
def ql_dirichlet_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (llmops/
    text.py::query_likelihood_topk) — the language-modeling IR
    baseline joining BM25 and TF-IDF in the retrieval family; mu =
    2000, query = {spark, join, window} (same bag as the hybrid-RRF
    query, so the scorers are comparable)."""
    from dbt_lakehouse_aws_spark.llmops.text import query_likelihood_topk

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    return query_likelihood_topk(d, ["spark", "join", "window"], mu=2000.0, k=20)


@register(
    "pmi_collocations_docs",
    """
    WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
    b2 AS (
      SELECT bg.w1 AS w1, bg.w2 AS w2 FROM (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
        FROM toks)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM b2 GROUP BY w1, w2),
    uni AS (SELECT t AS w, count(*) AS cu
            FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t),
    t2 AS (SELECT CAST(sum(c2) AS DOUBLE) AS t2 FROM c2),
    tu AS (SELECT CAST(sum(cu) AS DOUBLE) AS tu FROM uni)
    SELECT c2.w1, c2.w2, CAST(c2.c2 AS BIGINT) AS n_pair,
           round(ln((c2.c2 / t2.t2)
                    / ((u1.cu / tu.tu) * (u2.cu / tu.tu))), 6) AS pmi
    FROM c2
    JOIN uni u1 ON u1.w = c2.w1
    JOIN uni u2 ON u2.w = c2.w2
    CROSS JOIN t2 CROSS JOIN tu
    WHERE c2.c2 >= 5
    ORDER BY pmi DESC, c2.w1 ASC, c2.w2 ASC LIMIT 30
    """,
)
def pmi_collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 adjacent-word collocations by PMI with a count floor
    of 5 (llmops/text.py::pmi_collocations) — classic corpus
    analysis; fully relational (bigram explode + three hash
    aggregates + two model joins + TakeOrderedAndProject)."""
    from dbt_lakehouse_aws_spark.llmops.text import pmi_collocations

    d = T(spark, sf_dir, "documents").select("text")
    return pmi_collocations(d, min_count=5, k=30)


@register(
    "containment_pairs_docs",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingle
      FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_src, b.doc_id AS doc_dst, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_src, doc_dst,
           round(CAST(i AS DOUBLE) / s.n_sh, 6) AS containment
    FROM inter JOIN sizes s ON s.doc_id = doc_src
    WHERE CAST(i AS DOUBLE) / s.n_sh >= 0.8
    """,
)
def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment (llmops/dedup.py::
    containment_pairs): |A∩B|/|A| over distinct 3-shingle sets, both
    directions, threshold 0.8 — the quote/subset-detection signal
    Jaccard thresholds miss. Exact (no LSH), so the oracle is the
    same relational computation."""
    from dbt_lakehouse_aws_spark.llmops.dedup import containment_pairs

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    return containment_pairs(d, n=3, threshold=0.8)

"""Embedding similarity search: brute-force cosine + LSH scale path.

The embedding column is ``array<float>``; all math is done via
built-in higher-order array functions (``zip_with`` + ``aggregate``)
in JVM codegen — no Python in the loop. Dot products accumulate in
float64, sequential over index order, so the DuckDB oracle computes
bit-comparable values.

Scale design (100 TB / billions of vectors):

* **cosine_topk** — exact baseline. The query side is small by
  construction (top-k for a bounded query set) and is broadcast;
  the corpus streams through map tasks; per-query top-k via
  rank-limit window (pre-pruned map-side). Cost O(|Q|·N·d) but
  embarrassingly parallel and shuffle-light (only groups·k rows).
* **rp_lsh_buckets** — random-hyperplane LSH: b sign-bits per
  vector → bucket id; candidate search touches only same-bucket
  vectors (IVF-style). Hyperplanes are a deterministic integer
  grid (no RNG) so results are reproducible across engines/runs.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from dbt_lakehouse_aws_spark.localframe import local_frame
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, deterministic order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def safe_norm(v: Column) -> Column:
    """|v|, as NULL for the zero vector — cosine with a zero vector is
    undefined, and under ANSI mode (Spark 4 default) an unguarded
    /0 would fail the whole job instead of nulling one pair."""
    return F.nullif(F.sqrt(dot(v, v)), F.lit(0.0))


def embedding_norms(df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return df.select(F.col(id_col), F.sqrt(dot(v, v)).alias("norm"))


def cosine_topk(
    df: DataFrame,
    query_ids: Sequence[int] | None = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine) — cosine rounded to 6dp,
    ranked by (rounded cosine desc, neighbor id asc) so ordering is
    reproducible across engines.
    """
    from pyspark.sql import Window

    # norms precomputed per row (not per pair): |Q|·N pairs share them
    v = _as_double(vec_col)
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), v.alias("v_n"), safe_norm(v).alias("norm_n")
    )
    if query_df is None:
        query_df = df.filter(F.col(id_col).isin(list(query_ids)))
    queries = query_df.select(
        F.col(id_col).alias("query_id"), v.alias("v_q"), safe_norm(v).alias("norm_q")
    )

    # broadcast the small query side; corpus streams map-side only
    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("v_q"), F.col("v_n")) / (F.col("norm_q") * F.col("norm_n"))
    scored = joined.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )


def _grid_hyperplane(bit: Column | int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: w[j] = ((bit·37 + j·101) mod 19) − 9.

    Integer grid in [−9, 9]; reproducible anywhere, no RNG state.
    """
    b = F.lit(bit) if isinstance(bit, int) else bit
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(b * 37 + j * 101, F.lit(19)) - 9).cast("double"),
    )


def rp_lsh_buckets(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Random-projection (sign) LSH bucket id per vector.

    ``bucket = Σ_bit (v·w_bit > 0) · 2^bit`` — an IVF-style coarse
    quantizer: ANN search joins queries to candidates on ``bucket``
    (plus optional multi-probe neighbors), reducing a billion-vector
    scan to bucket-local work.
    """
    v = _as_double(vec_col)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_bits - 1)),
        lambda bit: F.when(dot(v, _grid_hyperplane(bit, dim)) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    bucket = F.aggregate(F.reverse(bits), F.lit(0).cast("long"), lambda acc, b: acc * 2 + b)
    return df.select(F.col(id_col), bucket.alias("bucket"))


def ann_search_lsh(
    df: DataFrame,
    query_ids: Sequence[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_bits: int = 8,
    dim: int = 64,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: restrict cosine scoring to LSH bucket peers.

    ``multi_probe=True`` also probes every bucket at Hamming
    distance 1 from each query's bucket (flip one sign bit) — the
    standard multi-probe LSH recall boost: near neighbors that fell
    just across one hyperplane are recovered at the cost of
    ``num_bits``× more (still tiny, query-side-only) probe keys.
    The corpus side — the expensive side — is untouched.
    """
    from pyspark.sql import Window

    buckets = rp_lsh_buckets(df, id_col=id_col, vec_col=vec_col, num_bits=num_bits, dim=dim)
    v = _as_double(vec_col)
    with_b = df.join(buckets, id_col).withColumn("_norm", safe_norm(v))
    queries = with_b.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), v.alias("v_q"), F.col("_norm").alias("norm_q"), F.col("bucket")
    )
    if multi_probe:
        probes = F.array_union(
            F.array(F.col("bucket")),
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bits - 1)),
                # flip bit i (shiftleft needs an int literal, so 2^i
                # comes from pow — exact in double for i < 53)
                lambda i: F.col("bucket").bitwiseXOR(F.pow(F.lit(2.0), i).cast("long")),
            ),
        )
        queries = queries.withColumn("bucket", F.explode(probes))
    corpus = with_b.select(
        F.col(id_col).alias("neighbor_id"), v.alias("v_n"), F.col("_norm").alias("norm_n"), F.col("bucket")
    )
    joined = corpus.join(F.broadcast(queries), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("v_q"), F.col("v_n")) / (F.col("norm_q") * F.col("norm_n"))
    scored = joined.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    if multi_probe:  # a pair can match through several probe buckets
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + cell-restricted scan
# --------------------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_rows: int = 4096,
    iters: int = 5,
    seed: int = 7,
):
    """Coarse quantizer for IVF: Lloyd's k-means on a driver-side
    sample, returned as a ``numpy (n_cells, dim)`` array.

    The sample is tiny and bounded (``limit(sample_rows)``), so the
    training cost is independent of corpus size — at 100 TB only the
    *assignment* pass below touches every row, and that pass is an
    embarrassingly parallel Arrow-batched matmul.
    """
    sample = np.array(
        [r[0] for r in df.select(_as_double(vec_col)).limit(sample_rows).collect()]
    )
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize, argmax of dot
        sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(sn @ cn.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(
    df: DataFrame,
    centroids,
    *,
    vec_col: str = "embedding",
    out: str = "cell",
    metric: str = "cosine",
) -> DataFrame:
    """Assign each vector to its nearest centroid via an
    Arrow-batched pandas UDF — one numpy matmul per batch, no
    shuffle, scales linearly with executors.

    ``metric="cosine"`` (default) is argmax of normalized dot;
    ``metric="l2"`` is argmin of squared euclidean distance with a
    deterministic lowest-cell-id tie-break. The l2 mode exists for
    exact cross-engine replay: with integer-valued vectors and
    centroids every distance is exact in float64 (no rounding, any
    summation order), so an external SQL engine reproduces the
    assignment bit-for-bit — that is what upgrades the IVF driver
    query from rows-only to a full value oracle."""
    from pyspark.sql.functions import pandas_udf

    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    cents = np.asarray(centroids, dtype=np.float64)
    if metric == "cosine":
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

        @pandas_udf("int")
        def nearest(v: pd.Series) -> pd.Series:
            m = np.array(v.tolist(), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            return pd.Series(np.argmax(m @ cn.T, axis=1).astype("int32"))

    else:

        @pandas_udf("int")
        def nearest(v: pd.Series) -> pd.Series:
            m = np.array(v.tolist(), dtype=np.float64)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            # np.argmin already takes the FIRST (lowest cell id) min —
            # the deterministic tie-break SQL replays as (d2, cell)
            return pd.Series(np.argmin(d2, axis=1).astype("int32"))

    return df.withColumn(out, nearest(F.col(vec_col)))


def ann_search_ivf(
    df: DataFrame,
    query_ids: Sequence[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    centroids=None,
    metric: str = "cosine",
) -> DataFrame:
    """IVF approximate top-k: score queries only against the
    ``nprobe`` nearest cells' members.

    The cell lists ARE the index: the corpus is scanned once for
    assignment (and would be written partitioned-by-cell as the
    persisted index); each query then touches ~``nprobe/n_cells`` of
    the data. Compared with rp-LSH this trades a training pass for
    much better cell balance on clustered data.

    ``centroids`` (optional ``(n_cells, dim)`` array) skips the
    k-means training pass and uses the given coarse quantizer —
    e.g. a previously persisted one, or closed-form deterministic
    centroids so an external SQL oracle can replay the cell
    assignment exactly (with ``metric="l2"``; see
    :func:`ivf_assign`). Final scoring is cosine in either mode.
    """
    from pyspark.sql import Window

    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else train_ivf_centroids(df, vec_col=vec_col, n_cells=n_cells)
    )

    v = _as_double(vec_col)
    assigned = ivf_assign(df, cents, vec_col=vec_col, metric=metric).withColumn(
        "_norm", safe_norm(v)
    )

    # probe set per query: nprobe nearest centroids (driver-side — the
    # query set is small by construction)
    qvecs = {
        r[0]: np.array(r[1], dtype=np.float64)
        for r in df.filter(F.col(id_col).isin(list(query_ids)))
        .select(id_col, _as_double(vec_col))
        .collect()
    }
    probe_rows = []
    if metric == "cosine":
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        for qid, qv in qvecs.items():
            sims = (qv / np.linalg.norm(qv)) @ cn.T
            for cell in np.argsort(-sims)[:nprobe]:
                probe_rows.append((qid, int(cell)))
    else:
        for qid, qv in qvecs.items():
            d2 = ((qv[None, :] - cents) ** 2).sum(axis=1)
            # lexsort on (cell implicit ascending, d2 primary) —
            # deterministic under exact-integer ties, replayed in SQL
            # as ORDER BY d2, cell
            for cell in np.argsort(d2, kind="stable")[:nprobe]:
                probe_rows.append((qid, int(cell)))
    spark = df.sparkSession
    probes = local_frame(spark, probe_rows, "query_id long, cell int")

    queries = assigned.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), v.alias("v_q"), F.col("_norm").alias("norm_q")
    )
    corpus = assigned.select(
        F.col(id_col).alias("neighbor_id"), v.alias("v_n"),
        F.col("_norm").alias("norm_n"), "cell",
    )
    qside = queries.join(probes, "query_id")
    joined = corpus.join(F.broadcast(qside), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("v_q"), F.col("v_n")) / (F.col("norm_q") * F.col("norm_n"))
    scored = joined.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )


def cosine_topk_arrow(
    df: DataFrame,
    query_ids: Sequence[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine, Arrow/numpy path.

    Same semantics as :func:`cosine_topk`, different physical plan:
    the (small) query matrix is closed over by a ``mapInPandas``
    that scores EVERY corpus batch against ALL queries with one
    numpy matmul and emits only each batch's local top-k per query —
    a per-partition pre-prune, so the final window sees
    O(partitions·|Q|·k) rows instead of O(N·|Q|).

    Higher-order array expressions (the `cosine_topk` path) are
    interpreted per element; BLAS matmul over Arrow batches is the
    faster hot path once N·|Q|·d dominates fixed overhead. Cosines
    agree with the expression path to float64 round-off (summation
    order differs), hence rounding to 6dp.
    """
    from collections.abc import Iterator

    from pyspark.sql import Window

    qrows = (
        df.filter(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("qid"), _as_double(vec_col).alias("v"))
        .collect()
    )
    qids = np.array([r["qid"] for r in qrows])
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qmat.T  # (batch, |Q|)
            nids = pdf[id_col].to_numpy()
            parts = []
            for j, qid in enumerate(qids):
                # round BEFORE the batch-local prune and break ties on
                # neighbor_id, exactly like the final window ordering —
                # pruning on raw float order could drop a row that is
                # epsilon below the batch's k-th raw cosine but equal
                # after rounding with a smaller neighbor_id, i.e. a row
                # the global top-k keeps
                col = np.round(sims[:, j], 6)
                mask = nids != qid
                cand_ids, cand_sims = nids[mask], col[mask]
                top = np.lexsort((cand_ids, -cand_sims))[: k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[top],
                            "cosine": cand_sims[top],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    local = df.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )


def kmeans_lloyd(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    out: str = "cluster",
    portable: bool = False,
):
    """Fully distributed Lloyd's k-means over the whole corpus
    (complement of :func:`train_ivf_centroids`, which trains on a
    driver-side sample — use this when the final partition itself is
    the product, e.g. embedding-cluster dedup or topic bucketing).

    Scale shape per iteration:

    * centroids (k·dim doubles — KBs) broadcast into an Arrow-batched
      pandas UDF; assignment is one numpy matmul per batch, no
      shuffle, linear in executors;
    * centroid update via ``posexplode`` + (cluster, pos) hash
      aggregate — partial map-side combine means the shuffle carries
      ≤ k·dim rows per task, never the corpus;
    * only the k·dim centroid matrix ever returns to the driver, and
      the loop re-plans from the raw input each round, so lineage
      stays flat without checkpointing.

    Init is deterministic farthest-point traversal over a hash-ordered
    sample (``xxhash64(id)`` order = seedless pseudo-random, stable
    across runs/engines): naive "first k rows" init can land every
    seed in one dense region and Lloyd's never recovers. Distance is
    Euclidean (argmin of ‖x−c‖² = argmax of c·x − ‖c‖²/2).

    Returns ``(assignments DataFrame [id_col, out], centroids ndarray)``.
    """
    from pyspark.sql.functions import pandas_udf

    # pinned: the loop runs 2 + iters ACTIONS over this frame (init
    # sample, one centroid-update collect per iteration, the final
    # assignment) — each re-read the parquet scan + double-cast
    # without the pin (guide §5 caching rule; measured 3.9 → 3.3 s
    # on semantic_dedup_survivors, 3.0 → 2.5 s on
    # kmeans_orders_wellsep at sf0.1, results bit-identical)
    base = df.select(F.col(id_col), _as_double(vec_col).alias("_v")).localCheckpoint(
        eager=True
    )
    # portable=True orders the init sample by the md5-prefix hash
    # (dedup.py::_portable_hash60 of the stringified id) instead of
    # xxhash64 — same seedless-pseudo-random property, but an
    # external SQL oracle can replay the exact sample and therefore
    # the exact farthest-point init (see kmeans_orders_wellsep)
    if portable:
        from dbt_lakehouse_aws_spark.llmops.dedup import _portable_hash60

        order_hash = _portable_hash60(F.col(id_col).cast("string"))
    else:
        order_hash = F.xxhash64(F.col(id_col))
    sample = np.array(
        [
            r[1]
            for r in base.orderBy(order_hash, id_col)
            .limit(max(4096, 4 * k))
            .collect()
        ],
        dtype=np.float64,
    )
    cents = np.empty((k, sample.shape[1]))
    cents[0] = sample[0]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        cents[i] = sample[int(np.argmax(d2))]
        d2 = np.minimum(d2, ((sample - cents[i]) ** 2).sum(axis=1))

    def assigner(c):
        half_sq = (c * c).sum(axis=1) / 2.0

        @pandas_udf("int")
        def nearest(v: pd.Series) -> pd.Series:
            m = np.array(v.tolist(), dtype=np.float64)
            return pd.Series(np.argmax(m @ c.T - half_sq, axis=1).astype("int32"))

        return nearest

    for _ in range(iters):
        assigned = base.withColumn(out, assigner(cents)(F.col("_v")))
        rows = (
            assigned.select(out, F.posexplode("_v").alias("_pos", "_val"))
            .groupBy(out, "_pos")
            .agg(F.avg("_val").alias("_c"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        for r in rows:
            cents[r[out]][r["_pos"]] = r["_c"]

    assigned = base.withColumn(out, assigner(cents)(F.col("_v")))
    return assigned.select(id_col, out), cents


def semantic_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup-shaped semantic near-duplicate pairs (Abbas et al.
    2023: k-means the embedding space, then look for high-cosine
    pairs *only within a cluster*).

    The cluster id is the blocking key: the pair join is a hash
    equi-join on ``cluster`` (shuffle O(corpus), fan-out bounded by
    cluster sizes — corpus²/k in expectation, never corpus²), and
    cosine runs as codegen array expressions with per-row norms
    precomputed once. At 100 TB: raise k so clusters stay
    partition-sized (SemDeDup's own regime — the paper runs k=50 000
    on LAION), and AQE's skew-join split handles the odd mega-cluster.
    """
    assigned, _ = kmeans_lloyd(
        df, vec_col=vec_col, id_col=id_col, k=k, iters=iters, out="cluster"
    )
    vecs = (
        df.select(F.col(id_col), _as_double(vec_col).alias("_v"))
        .join(assigned, id_col)
        .withColumn("_n", safe_norm(F.col("_v")))
    )
    a = vecs.select(
        "cluster",
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = vecs.select(
        "cluster",
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("cluster", "id_a", "id_b", "cos_sim")
    )


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
) -> DataFrame:
    """Drop all but the min-id member of every semantic-duplicate
    component (pairs from :func:`semantic_dedup_pairs`, grouping via
    the iterative connected-components primitive shared with the
    MinHash pipeline)."""
    from dbt_lakehouse_aws_spark.llmops.dedup import dedup_survivors

    pairs = semantic_dedup_pairs(
        df, id_col=id_col, vec_col=vec_col, k=k, iters=iters, threshold=threshold
    )
    return dedup_survivors(df, pairs, id_col=id_col, a_col="id_a", b_col="id_b")


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings
    (``score(d) = Σ_r 1/(k0 + rank_r(d))``, Cormack et al. 2009) —
    the standard way to combine keyword (BM25) and vector (cosine)
    retrieval without score calibration.

    Union + hash agg, not an N-way outer join: absent ranks simply
    contribute nothing, and the plan stays one shuffle of
    O(Σ candidate-list sizes) rows regardless of how many rankings
    are fused. Top-k compiles to TakeOrderedAndProject.
    """
    scored = None
    for r in rankings:
        part = r.select(
            F.col(id_col), (F.lit(1.0) / (F.lit(k0) + F.col(rank_col))).alias("_c")
        )
        scored = part if scored is None else scored.unionByName(part)
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def pca_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 8,
):
    """Distributed PCA fit: (mean, components, explained_variance).

    The covariance matrix is assembled from per-partition sufficient
    statistics — each Arrow batch contributes its ``XᵀX`` (d×d),
    column sum, and row count — so the shuffle-free reduce moves
    O(partitions · d²) floats to the driver, never the vectors
    themselves (at d=1024 that's 8 MB per partition: fine; the
    corpus can be any size). The d×d eigendecomposition is
    driver-side numpy — d is model-embedding-sized, not data-sized,
    which is what makes this the standard scalable PCA shape.

    Component sign is fixed deterministically (largest-|loading|
    entry made positive) so runs and engines agree.
    """
    from collections.abc import Iterator

    part_schema = "n long, colsum array<double>, xtx array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, colsum, xtx = 0, None, None
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if m.size == 0:
                continue
            n += m.shape[0]
            s = m.sum(axis=0)
            g = m.T @ m
            colsum = s if colsum is None else colsum + s
            xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "colsum": [colsum.tolist()], "xtx": [xtx.flatten().tolist()]}
            )

    rows = df.select(_as_double(vec_col).alias(vec_col)).mapInPandas(
        partials, part_schema
    ).collect()
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("pca_fit: empty input")
    d = len(rows[0]["colsum"])
    colsum = np.sum([r["colsum"] for r in rows], axis=0)
    xtx = np.sum([np.array(r["xtx"]).reshape(d, d) for r in rows], axis=0)
    mean = colsum / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    components = evecs[:, order].T  # (k, d)
    for i in range(components.shape[0]):
        j = int(np.abs(components[i]).argmax())
        if components[i, j] < 0:
            components[i] = -components[i]
    return mean, components, evals[order]


def pca_project(
    df: DataFrame,
    mean,
    components,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto fitted components: Arrow-batched matmul
    ``(X − μ) Wᵀ``, map-only (no shuffle), emitting k-dim arrays."""
    from collections.abc import Iterator

    mean = np.asarray(mean, dtype=np.float64)
    comp = np.asarray(components, dtype=np.float64)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<double>"

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            proj = (m - mean) @ comp.T if m.size else np.zeros((0, comp.shape[0]))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: [r.tolist() for r in proj]})

    return df.select(id_col, _as_double(vec_col).alias(vec_col)).mapInPandas(
        project, schema
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_rows: int = 4096,
    iters: int = 5,
    seed: int = 11,
):
    """Per-subspace k-means codebooks for product quantization
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI'11): the d-dim space splits into ``n_subspaces``
    contiguous blocks, each quantized independently to ``n_codes``
    centroids. Returns ``numpy (n_subspaces, n_codes, d/m)``.

    Like :func:`train_ivf_centroids`, training runs on a bounded
    driver-side sample (cost independent of corpus size); only
    encoding touches every row, and that is an Arrow-batched argmin.
    """
    sample = np.array(
        [r[0] for r in df.select(_as_double(vec_col)).limit(sample_rows).collect()]
    )
    d = sample.shape[1]
    if d % n_subspaces != 0:
        raise ValueError(f"dim {d} not divisible by n_subspaces {n_subspaces}")
    sub = d // n_subspaces
    rng = np.random.default_rng(seed)
    books = np.empty((n_subspaces, n_codes, sub))
    for s in range(n_subspaces):
        block = sample[:, s * sub : (s + 1) * sub]
        cents = block[rng.choice(len(block), size=min(n_codes, len(block)), replace=False)]
        for _ in range(iters):
            # euclidean Lloyd step on the subspace
            d2 = ((block[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = block[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s, : len(cents)] = cents
        if len(cents) < n_codes:  # degenerate tiny sample: pad by repeat
            books[s, len(cents) :] = cents[0]
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    *,
    vec_col: str = "embedding",
    out: str = "pq_code",
) -> DataFrame:
    """Encode each vector as ``n_subspaces`` centroid ids (the PQ
    code, m bytes of state per vector vs 4·d for the raw floats —
    a 32× compression at d=64/m=8). Arrow-batched numpy argmin per
    subspace; no shuffle; scales linearly with executors."""
    from pyspark.sql.functions import pandas_udf

    books = codebooks  # (m, k, sub)
    m, _, sub = books.shape

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)  # (n, d)
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for s in range(m):
            block = x[:, s * sub : (s + 1) * sub]
            d2 = ((block[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out, encode(F.col(vec_col)))


def pq_search(
    df: DataFrame,
    query_ids: Sequence[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    rerank: int = 0,
    codebooks=None,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: each query precomputes an
    ``m × n_codes`` table of subspace distances to every centroid,
    then a corpus vector's approximate distance is m table lookups
    summed over its CODE — the raw floats are never touched at query
    time. With ``rerank > 0``, the top ``rerank`` PQ candidates are
    re-scored with exact cosine (the standard PQ+rerank recipe that
    restores most recall for one extra narrow pass).

    ``codebooks`` (optional ``(m, n_codes, d/m)`` array) skips the
    k-means training and quantizes against the given codebooks —
    a persisted production codebook, or closed-form deterministic
    ones so an external SQL oracle can replay encode + ADC exactly
    (with integer-valued vectors and codebooks every distance is
    exact in float64, so the replay is bit-identical).

    100 TB shape: the index is the encoded corpus (m ints/vector);
    queries + their lookup tables broadcast; scoring is an
    Arrow-batched gather-sum per partition with a per-partition
    top-(k or rerank) prune before the global resolve.
    """
    from pyspark.sql import Window

    books = (
        np.asarray(codebooks, dtype=np.float64)
        if codebooks is not None
        else train_pq_codebooks(
            df, vec_col=vec_col, n_subspaces=n_subspaces, n_codes=n_codes
        )
    )
    encoded = pq_encode(df, books, vec_col=vec_col)

    qvecs = {
        r[0]: np.array(r[1], dtype=np.float64)
        for r in df.filter(F.col(id_col).isin(list(query_ids)))
        .select(id_col, _as_double(vec_col))
        .collect()
    }
    m, ncod, sub = books.shape
    # ADC tables on l2 distance per subspace: (q - c)^2
    tables = {}
    for qid, qv in qvecs.items():
        t = np.empty((m, ncod))
        for s in range(m):
            t[s] = ((qv[s * sub : (s + 1) * sub][None, :] - books[s]) ** 2).sum(axis=1)
        tables[qid] = t

    from pyspark.sql.functions import pandas_udf

    qids = sorted(tables)
    tstack = np.stack([tables[q] for q in qids])  # (nq, m, ncod)

    @pandas_udf("array<double>")
    def adc(codes: pd.Series) -> pd.Series:
        c = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        # gather per query: dist[n, q] = sum_s tstack[q, s, c[n, s]]
        n = c.shape[0]
        out = np.empty((n, len(qids)))
        for qi in range(len(qids)):
            out[:, qi] = tstack[qi][np.arange(m)[None, :], c].sum(axis=1)
        return pd.Series(list(out))

    scored = (
        encoded.select(F.col(id_col).alias("neighbor_id"), "pq_code", F.col(vec_col))
        .withColumn("_d", adc(F.col("pq_code")))
    )
    pairs = scored.select(
        "neighbor_id",
        F.posexplode("_d").alias("_qi", "pq_dist"),
    ).withColumn(
        "query_id",
        F.element_at(F.array(*[F.lit(q) for q in qids]), F.col("_qi") + 1).cast("long"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    keep = max(k, rerank)
    w = Window.partitionBy("query_id").orderBy(F.asc("pq_dist"), F.asc("neighbor_id"))
    cand = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .drop("_rn", "_qi")
    )
    if not rerank:
        return cand.withColumn(
            "rank",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy("pq_dist", "neighbor_id"))
            .cast("long"),
        ).select("query_id", "neighbor_id", F.round("pq_dist", 6).alias("pq_dist"), "rank")

    # exact-cosine rerank of the PQ shortlist
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v_n")
    )
    qdf = local_frame(
        df.sparkSession,
        [(int(q), [float(x) for x in qvecs[q]]) for q in qids],
        "query_id long, v_q array<double>",
    )
    joined = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
    )
    cos = dot(F.col("v_q"), F.col("v_n")) / (
        safe_norm(F.col("v_q")) * safe_norm(F.col("v_n"))
    )
    rescored = joined.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

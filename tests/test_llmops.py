"""LLM-data-pipeline operators: dedup, similarity, text, multimodal.

Correctness strategy: tiny corpora with hand-computable truth, plus
invariants (identical docs → identical signatures; LSH candidates ⊇
high-similarity pairs on separable data; brute-force top-k agrees
with numpy).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from dbt_lakehouse_aws_spark.llmops.multimodal import (
    attach_binary_payload,
    decode_stub,
    extract_binary_features,
)
from dbt_lakehouse_aws_spark.llmops.similarity import cosine_topk
from dbt_lakehouse_aws_spark.llmops.text import (
    doc_fingerprint,
    lang_id_scores,
    text_quality,
    word_shingles,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different text about spark engines here now"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    rows = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    assert rows == {1: 2, 2: 1, 3: 1}  # doc 4 folded into survivor 1


def test_word_shingles_values(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(word_shingles("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n → empty array, not null


def test_ngram_jaccard_hand_computed(spark, docs):
    """Docs 1&2 share 6 of their 7+7 distinct 3-shingles → J = 6/8."""
    out = ngram_jaccard_pairs(docs, threshold=0.1)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert got[(1, 2)] == pytest.approx(6 / 8)
    assert got[(1, 4)] == pytest.approx(1.0)
    assert (1, 3) not in got


def test_minhash_identical_docs_identical_signatures(spark, docs):
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    assert sigs[1] != sigs[3]


def test_lsh_finds_near_and_exact_dups(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, num_bands=8, est_threshold=0.3)
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(1, 4)] == pytest.approx(1.0)  # exact dup always survives
    assert (1, 2) in got  # near-dup lands in a shared band at J≈0.75
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_properties(spark, docs):
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sims[1] == sims[4]
    assert all(v >= 0 for v in sims.values())  # 63-bit: non-negative
    near = simhash_near_pairs(docs, max_hamming=16)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in near.collect()}
    assert got[(1, 4)] == 0


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8)).astype(float)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)], "id long, emb array<double>"
    )
    out = cosine_topk(df, query_ids=[0, 5], id_col="id", vec_col="emb", k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    for q in (0, 5):
        sims = [(j, cos[q, j]) for j in range(30) if j != q]
        expect = sorted(sims, key=lambda t: (-round(t[1], 6), t[0]))[:3]
        assert [n for n, _ in got[q]] == [n for n, _ in expect]
        for (_, a), (_, b) in zip(got[q], expect):
            assert a == pytest.approx(b, abs=1e-5)


def test_text_quality_features(spark):
    df = spark.createDataFrame([(1, "the cat and the dog")], "doc_id long, text string")
    r = text_quality(df).collect()[0]
    assert r["n_tokens"] == 5
    assert r["n_chars_obs"] == 19
    assert r["avg_token_len"] == pytest.approx(15 / 5)
    assert r["alpha_ratio"] == pytest.approx(15 / 19)
    # non-overlapping padded matches: " the ", " and " ... " the " won't
    # re-match the shared space; expect >= 2 stopword hits
    assert r["stopword_ratio"] >= 2 / 5 - 1e-9


def test_lang_id_picks_dominant_markers(spark):
    df = spark.createDataFrame(
        [(1, "the house and the garden of eden"), (2, "le chat et la maison et le chien")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id_scores(df).collect()}
    assert got == {1: "en", 2: "fr"}


def test_fingerprint_deterministic_and_discriminative(spark, docs):
    out = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
    assert out[1] == out[4]
    assert out[1] != out[3]


def test_multimodal_plumbing(spark, docs):
    payloads = attach_binary_payload(docs, modality="blob")
    feats = extract_binary_features(payloads)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[1]["n_bytes"] == len(DOCS[0][1].encode())
    assert rows[1]["first_byte"] == ord("t")
    assert rows[1]["modality"] == "blob"
    # r2: images decode for real (BMP/PPM); a compressed format we
    # can't parse is a ValueError, codec-needing modalities still
    # raise NotImplementedError
    with pytest.raises(ValueError):
        decode_stub(b"\x89PNG", "image")
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "video")


def test_ivf_ann_recall(spark):
    """IVF top-k must mostly agree with exact brute force on
    clustered data (each query's true neighbors share its cell)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16)) * 5
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(size=16) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from dbt_lakehouse_aws_spark.llmops.similarity import ann_search_ivf, cosine_topk

    qids = [0, 1, 2, 3]
    exact = cosine_topk(df, qids, id_col="vec_id", vec_col="embedding", k=5)
    approx = ann_search_ivf(df, qids, k=5, n_cells=8, nprobe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_cosine_arrow_agrees_with_expression_path(spark):
    """The Arrow/matmul scale path must return the same neighbors
    (and cosines to 1e-6) as the expression path."""
    from dbt_lakehouse_aws_spark.llmops.similarity import cosine_topk, cosine_topk_arrow

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, rng.normal(size=12).tolist()) for i in range(1, 120)],
        "vec_id long, embedding array<double>",
    )
    a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
         for r in cosine_topk(df, range(1, 6), k=4).collect()}
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
         for r in cosine_topk_arrow(df, range(1, 6), k=4).collect()}
    assert set(a) == set(b)
    for key in a:
        assert a[key][0] == b[key][0], key
        assert a[key][1] == pytest.approx(b[key][1], abs=2e-6)


def test_cosine_handles_zero_vector_under_ansi(spark):
    """A zero-norm embedding must yield NULL cosine, not a job-killing
    ANSI divide-by-zero."""
    from dbt_lakehouse_aws_spark.llmops.similarity import cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_topk(df, [1], k=5).collect()
    got = {r["neighbor_id"]: (r["cosine"], r["rank"]) for r in rows}
    assert got[3][0] is not None and got[3][1] == 1
    assert got[2][0] is None  # zero vector → NULL cosine, ranked last


def test_fast_fingerprint(spark, docs):
    from dbt_lakehouse_aws_spark.llmops.text import fast_fingerprint

    out = {r["doc_id"]: r["fingerprint"] for r in fast_fingerprint(docs).collect()}
    assert out[1] == out[4] and out[1] != out[3]


def test_connected_components_transitive_groups(spark):
    """A-B and B-C pairs (never A-C) must still form one group."""
    from dbt_lakehouse_aws_spark.llmops.dedup import connected_components, dedup_survivors

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    comps = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == 10
    assert comps[20] == comps[21] == comps[22] == comps[23] == 20

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 10, 11, 20, 21, 22, 23, 99]],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert kept == {1, 10, 20, 99}  # min of each group + untouched singleton


def test_multi_probe_lsh_improves_recall(spark):
    """Probing Hamming-1 neighbor buckets must recover neighbors that
    single-probe misses (recall strictly >= single-probe; candidate
    supersets guarantee it)."""
    from dbt_lakehouse_aws_spark.llmops.similarity import ann_search_lsh, cosine_topk

    rng = np.random.default_rng(23)
    df = spark.createDataFrame(
        [(i, rng.normal(size=16).tolist()) for i in range(1, 301)],
        "vec_id long, embedding array<double>",
    )
    qids = list(range(1, 9))
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(df, qids, k=5).collect()}

    def recall(multi):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ann_search_lsh(df, qids, k=5, num_bits=8, dim=16,
                                       multi_probe=multi).collect()}
        return len(exact & got) / len(exact)

    single, multi = recall(False), recall(True)
    assert multi >= single
    # measured on this seed: single 0.10 → multi 0.425 (4×); random
    # gaussians are the LSH worst case, so expect a real lift, not
    # perfection
    assert multi >= single + 0.15 and multi >= 0.3


def test_edit_distance_pairs_lossless_banding(spark):
    """Banded result must equal the quadratic reference exactly —
    the length band is lossless for the distance threshold."""
    from dbt_lakehouse_aws_spark.llmops.dedup import edit_distance_pairs

    rows = [
        (1, "en", "the quick brown fox jumps"),
        (2, "en", "the quick brown fox jumped"),   # dist 2 from doc 1
        (3, "en", "a completely different text!"),
        (4, "fr", "the quick brown fox jumps"),    # other block: never paired
        (5, "en", "the quick brown fox jumps over the lazy dog and keeps running"),  # len gap > band
    ]
    docs = spark.createDataFrame(
        [(i, l, t, len(t)) for i, l, t in rows],
        "doc_id long, lang string, text string, n_chars long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_pairs(docs, max_len_diff=10, max_dist=5).collect()
    }
    assert got == {(1, 2): 2}


def test_kmeans_lloyd_recovers_blobs(spark):
    """Three well-separated synthetic blobs: distributed Lloyd's must
    partition them exactly (every member of a blob shares a cluster,
    different blobs get different clusters) and land centroids on the
    blob means."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.similarity import kmeans_lloyd

    centers = {0: (0.0, 0.0), 1: (10.0, 10.0), 2: (-10.0, 10.0)}
    rows = []
    for b, (cx, cy) in centers.items():
        for i in range(20):
            # deterministic jitter in [-0.5, 0.5)
            rows.append((b * 20 + i, [cx + (i % 10) / 10 - 0.45, cy + (i % 7) / 7 - 0.45]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    assigned, cents = kmeans_lloyd(df, k=3, iters=4)
    got = assigned.collect()
    by_blob = {}
    for r in got:
        by_blob.setdefault(r["vec_id"] // 20, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())  # blobs are pure
    assert len({next(iter(s)) for s in by_blob.values()}) == 3  # and distinct
    # each centroid sits within the jitter radius of a blob center
    for c in cents:
        assert min(
            (c[0] - cx) ** 2 + (c[1] - cy) ** 2 for cx, cy in centers.values()
        ) < 0.25


def test_resize_payloads_fixed_size_nearest_neighbor(spark, docs):
    """Every resized payload is exactly target_bytes; the sampling is
    the nearest-neighbor index map (hand-checked on a known byte)."""
    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        attach_binary_payload,
        resize_payloads,
    )

    payloads = attach_binary_payload(docs, modality="blob")
    out = {r["doc_id"]: r for r in resize_payloads(payloads, target_bytes=8).collect()}
    raw = DOCS[0][1].encode()
    assert all(r["dst_bytes"] == 8 for r in out.values())
    expected = bytes(raw[(i * len(raw)) // 8] for i in range(8))
    assert bytes(out[1]["payload"]) == expected
    assert out[1]["src_bytes"] == len(raw)


def test_sample_frames_every_nth(spark, docs):
    """Frame fan-out: payload of n frames yields ceil(n/every_n) rows
    with the right byte slices."""
    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    payloads = attach_binary_payload(docs, modality="blob")
    frames = sample_frames(payloads, frame_bytes=4, every_n=2)
    raw = DOCS[0][1].encode()
    mine = sorted(
        ((r["frame_ix"], bytes(r["frame"])) for r in frames.collect() if r["doc_id"] == 1)
    )
    n_frames = len(raw) // 4
    assert [ix for ix, _ in mine] == list(range(0, n_frames, 2))
    for ix, fb in mine:
        assert fb == raw[ix * 4 : (ix + 1) * 4]


def test_repartition_by_size_class_spreads_heavies(spark):
    """All rows survive, and the heavy class lands on >1 partition
    (the straggler guard actually spreads)."""
    from dbt_lakehouse_aws_spark.llmops.multimodal import repartition_by_size_class

    rows = [(i, bytes(200_000) if i < 40 else bytes(10)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = repartition_by_size_class(
        df, boundaries=(100_000,), partitions_per_class=4
    )
    assert out.count() == 80
    from pyspark.sql import functions as F2
    heavy_parts = (
        out.filter(F2.col("_size_class") == 1)
        .select(F2.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert heavy_parts > 1


def test_bigram_lm_scores_hand_computed(spark):
    """Corpus: 'a b a b', 'a b', 'a c'. Counts: c(a,b)=3, c(b,a)=1,
    c(a,c)=1; prefix c(a·)=4, c(b·)=1. Per-doc mean ln-likelihoods
    are closed-form; the rare continuation scores lowest."""
    import math

    from dbt_lakehouse_aws_spark.llmops.text import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    exp = {
        1: (round((math.log(3 / 4) + math.log(1 / 1) + math.log(3 / 4)) / 3, 6), 3),
        2: (round(math.log(3 / 4), 6), 1),
        3: (round(math.log(1 / 4), 6), 1),
    }
    for doc_id, (lp, n) in exp.items():
        assert rows[doc_id]["avg_logprob"] == pytest.approx(lp, abs=1e-6)
        assert rows[doc_id]["n_bigrams"] == n
    assert rows[1]["avg_logprob"] > rows[2]["avg_logprob"] > rows[3]["avg_logprob"]


def test_simhash_arrow_path_bit_identical(spark, docs):
    """The numpy pandas_udf vote tally must reproduce the expression
    path exactly, including empty text and tie votes."""
    import pyspark.sql.functions as SF

    extra = spark.createDataFrame([(100, ""), (101, "x y z w")], ["doc_id", "text"])
    d = docs.unionByName(extra)
    a = simhash64(d).withColumnRenamed("simhash", "s1")
    b = simhash64(d, arrow=True).withColumnRenamed("simhash", "s2")
    assert a.join(b, "doc_id").filter(SF.col("s1") != SF.col("s2")).count() == 0


def test_simhash_guaranteed_mode_recall(spark):
    """guaranteed=True must find EVERY pair within max_hamming: plant
    single-word edits and cross-check against the brute-force
    bit_count distance of the full fingerprint set."""
    import pyspark.sql.functions as SF

    base = [(i, f"w{i} " + " ".join(f"t{j}" for j in range(30))) for i in range(50)]
    edited = [(1000 + i, f"w{i} " + " ".join(f"t{j}" for j in range(29)) + " zz") for i in range(50)]
    d = spark.createDataFrame(base + edited, ["doc_id", "text"])
    sims = simhash64(d, arrow=True)
    a = sims.select(SF.col("doc_id").alias("doc_a"), SF.col("simhash").alias("sa"))
    b = sims.select(SF.col("doc_id").alias("doc_b"), SF.col("simhash").alias("sb"))
    truth = (
        a.crossJoin(b)
        .filter(SF.col("doc_a") < SF.col("doc_b"))
        .withColumn("h", SF.bit_count(SF.col("sa").bitwiseXOR(SF.col("sb"))).cast("int"))
        .filter(SF.col("h") <= 6)
    )
    got = simhash_near_pairs(d, max_hamming=6, guaranteed=True, arrow=True)
    truth_set = {(r.doc_a, r.doc_b) for r in truth.collect()}
    got_set = {(r.doc_a, r.doc_b) for r in got.collect()}
    assert got_set == truth_set and len(truth_set) > 0


# ---------------------------------------------------------------------------
# paragraph dedup / tfidf / DSIR
# ---------------------------------------------------------------------------


def test_paragraph_dedup_hand_computed(spark):
    from dbt_lakehouse_aws_spark.llmops.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b\n\nc d"),       # both paragraphs novel
            (2, "c d\n\ne f"),       # "c d" already in doc 1
            (3, "a b\n\nc d"),       # nothing novel at all
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, sep="\n\n").collect()
    }
    assert out[1]["dedup_text"] == "a b c d"
    assert (out[1]["total_paras"], out[1]["kept_paras"]) == (2, 2)
    assert out[2]["dedup_text"] == "e f"
    assert (out[2]["total_paras"], out[2]["kept_paras"]) == (2, 1)
    assert out[3]["dedup_text"] == ""
    assert (out[3]["total_paras"], out[3]["kept_paras"]) == (2, 0)


def test_paragraph_dedup_chunk_mode_positions(spark):
    from dbt_lakehouse_aws_spark.llmops.dedup import paragraph_dedup

    # 5 tokens at chunk=2 → chunks "w0 w1", "w2 w3", "w4"
    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4"), (2, "w2 w3 x y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, chunk_tokens=2).collect()}
    assert out[1]["total_paras"] == 3 and out[1]["kept_paras"] == 3
    assert out[2]["dedup_text"] == "x y"  # "w2 w3" deduped, order kept


def test_tfidf_topk_hand_computed(spark):
    import math

    from dbt_lakehouse_aws_spark.llmops.text import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry cherry date")],
        "doc_id long, text string",
    )
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 → 2·(ln(4/2)+1); banana tf=1 df=2 → ln(4/3)+1
    apple = next(r for r in by_doc[1] if r["term"] == "apple")
    assert apple["rnk"] == 1
    assert abs(apple["tfidf"] - round(2 * (math.log(4 / 2) + 1), 6)) < 1e-9
    # doc 3: cherry tf=3 dominates; date second
    assert [r["term"] for r in sorted(by_doc[3], key=lambda r: r["rnk"])] == [
        "cherry",
        "date",
    ]


def test_dsir_importance_targets_score_higher(spark):
    from dbt_lakehouse_aws_spark.llmops.corpus import (
        importance_resample,
        importance_weights,
    )

    # target docs speak "ml"; raw background speaks "cook"
    rows = [(i, "model training data gradient", "tgt") for i in range(10)]
    rows += [(100 + i, "flour oven butter sugar", "bg") for i in range(10)]
    rows += [(200, "model training flour sugar", "mix")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = importance_weights(docs, target_pred=F.col("source") == "tgt")
    scores = {r["doc_id"]: r["llr"] for r in w.collect()}
    assert scores[0] > scores[200] > scores[100]  # target > mixed > background
    kept = importance_resample(w).collect()
    kept_ids = {r["doc_id"] for r in kept}
    # resampling must strictly favor target-looking docs
    tgt_rate = len(kept_ids & set(range(10))) / 10
    bg_rate = len(kept_ids & set(range(100, 110))) / 10
    assert tgt_rate > bg_rate
    # determinism: same result on re-run
    assert kept_ids == {r["doc_id"] for r in importance_resample(w).collect()}


def test_bpe_train_hand_computed(spark):
    from dbt_lakehouse_aws_spark.llmops.tokenizer import bpe_train

    # "ababc" ×3, "abd" ×2 → pair (a,b) dominates (freq 8); then
    # ("ab","ab") in ababc (freq 3) vs ("ab","c") 3 vs ("ab","d") 2:
    # tie between abab/abc breaks lexicographically: ("ab","ab").
    docs = spark.createDataFrame(
        [(1, "ababc ababc abd"), (2, "ababc abd")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "ab")


def test_bpe_merge_is_greedy_left_to_right(spark):
    from dbt_lakehouse_aws_spark.llmops.tokenizer import bpe_train

    # corpus of just "aaa" — after merge (a,a), "aaa" must fold to
    # [aa, a] (greedy, non-overlapping), giving no further (a,a) pair
    # of count ≥ 2 unless words repeat.
    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa")], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=3)
    assert merges[0] == ("a", "a")
    assert ("aa", "a") in merges[1:] or ("a", "aa") in merges[1:] or len(merges) >= 1


def test_bpe_encode_roundtrip_and_consistency(spark):
    from dbt_lakehouse_aws_spark.llmops.tokenizer import (
        bpe_encode,
        bpe_train,
        _encode_word,
    )

    docs = spark.createDataFrame(
        [(1, "lower lowest low"), (2, "newer newest new"), (3, "low lower new")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=8)
    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    # lossless: concatenating subwords reproduces the original words
    for doc_id, text in [(1, "lower lowest low"), (2, "newer newest new")]:
        assert "".join(enc[doc_id]) == text.replace(" ", "")
    # trained merges compress: fewer tokens than characters
    assert len(enc[1]) < len("lowerlowestlow")
    # driver-side encode agrees with the distributed path
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    local = [t for w in "low lower new".split() for t in _encode_word(w, ranks)]
    assert enc[3] == local


def test_semantic_dedup_removes_planted_twins(spark):
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(11)
    rows = []
    # two well-separated blobs; ids 0/1 and 100/101 are near-twins
    for base_id, center in ((0, np.ones(16)), (100, -np.ones(16))):
        blob = center + 0.05 * rng.standard_normal((6, 16))
        blob[1] = blob[0] + 1e-4  # planted twin of the blob's first member
        for i, v in enumerate(blob):
            rows.append((base_id + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs = semantic_dedup_pairs(df, k=2, iters=4, threshold=0.999999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (100, 101) in got
    # twins live in the same cluster; cross-blob pairs never appear
    assert all(a // 100 == b // 100 for a, b in got)

    kept = {r["vec_id"] for r in semantic_dedup(df, k=2, iters=4, threshold=0.999999).collect()}
    assert 0 in kept and 1 not in kept
    assert 100 in kept and 101 not in kept


def test_nb_classifier_separates_planted_classes(spark):
    from dbt_lakehouse_aws_spark.llmops.classify import nb_predict, nb_train

    rows = [(i, "gradient model tensor loss", "ml") for i in range(8)]
    rows += [(50 + i, "flour butter oven sugar", "baking") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model, priors = nb_train(docs, label_col="lang")
    pred = {r["doc_id"]: r["pred_class"] for r in nb_predict(docs, model, priors).collect()}
    assert all(pred[i] == "ml" for i in range(8))
    assert all(pred[50 + i] == "baking" for i in range(8))
    # held-out doc mixing both vocabularies but leaning ml
    test = spark.createDataFrame(
        [(99, "gradient model flour")], "doc_id long, text string"
    )
    assert nb_predict(test, model, priors).collect()[0]["pred_class"] == "ml"


def test_weighted_sample_favors_heavy_rows(spark):
    from dbt_lakehouse_aws_spark.llmops.corpus import weighted_sample

    # 200 light rows (w=1) + 20 heavy rows (w=500): a 40-row sample
    # should catch most heavy rows
    rows = [(i, 1.0) for i in range(200)] + [(1000 + i, 500.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, id_col="doc_id", weight_col="w", k=40).collect()}
    heavy_hit = len([i for i in got if i >= 1000])
    assert heavy_hit >= 15
    # deterministic across runs
    again = {r["doc_id"] for r in weighted_sample(df, id_col="doc_id", weight_col="w", k=40).collect()}
    assert got == again


def test_unigram_entropy_hand_computed(spark):
    import math

    from dbt_lakehouse_aws_spark.llmops.text import unigram_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_entropy(docs).collect()}
    assert out[1]["entropy_nats"] == 0.0          # constant doc
    assert abs(out[2]["entropy_nats"] - round(math.log(4), 6)) < 1e-9  # uniform
    assert abs(out[3]["entropy_nats"] - round(math.log(2), 6)) < 1e-9


def test_bm25_hand_computed(spark):
    import math

    from dbt_lakehouse_aws_spark.llmops.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark spark join"), (2, "join table"), (3, "cat dog bird")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert list(rows) == [1]  # only doc 1 contains 'spark'
    # N=3, df=1, dl=3, avgdl=8/3, tf=2
    idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / (8 / 3)))
    assert abs(rows[1] - round(expect, 6)) < 1e-9


def test_funnel_strict_ordering(spark):
    from dbt_lakehouse_aws_spark.operators.temporal import funnel_counts

    rows = [
        # user 1 completes in order
        (1, "2024-01-01 10:00:00", "signup"),
        (1, "2024-01-01 11:00:00", "view"),
        (1, "2024-01-01 12:00:00", "purchase"),
        # user 2 purchases BEFORE viewing → stops at view... but views after signup
        (2, "2024-01-01 10:00:00", "signup"),
        (2, "2024-01-01 09:00:00", "purchase"),
        (2, "2024-01-01 11:00:00", "view"),
        # user 3 never signs up
        (3, "2024-01-01 08:00:00", "view"),
        (3, "2024-01-01 09:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["step"]: r["n_users"] for r in funnel_counts(ev, ["signup", "view", "purchase"]).collect()}
    assert out == {"signup": 2, "view": 2, "purchase": 1}


def test_cohort_retention_hand_computed(spark):
    from dbt_lakehouse_aws_spark.operators.temporal import cohort_retention

    rows = [
        (1, "2024-01-01 09:00:00"), (1, "2024-01-03 09:00:00"),
        (2, "2024-01-01 12:00:00"), (2, "2024-01-01 18:00:00"),
        (3, "2024-01-02 09:00:00"), (3, "2024-01-03 09:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out[("2024-01-01", 0)] == 2      # users 1, 2 on day 0
    assert out[("2024-01-01", 2)] == 1      # user 1 returns day +2
    assert out[("2024-01-02", 1)] == 1      # user 3 returns day +1
    assert ("2024-01-01", 1) not in out


def test_rrf_fuse_hand_computed(spark):
    from dbt_lakehouse_aws_spark.llmops.similarity import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    assert abs(out[20] - round(1 / 62 + 1 / 61, 6)) < 1e-9   # in both lists → wins
    assert abs(out[10] - round(1 / 61, 6)) < 1e-9
    assert abs(out[30] - round(1 / 62, 6)) < 1e-9
    assert max(out, key=out.get) == 20


def test_duplicate_spans_hand_computed(spark):
    from dbt_lakehouse_aws_spark.llmops.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "a lazy the quick brown fox sleeps"),
            (3, "nothing shared here at all"),
            (4, "the quick brown cat"),
        ],
        "doc_id long, text string",
    )
    out = {r["span"]: r for r in duplicate_spans(docs, n=3, min_docs=2, k=None).collect()}
    assert out["the quick brown"]["n_docs"] == 3
    assert out["the quick brown"]["first_doc"] == 1
    assert out["quick brown fox"]["n_docs"] == 2
    assert "nothing shared here" not in out


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from dbt_lakehouse_aws_spark.operators.temporal import ewma_last

    rows = [(1, i, float(v)) for i, v in enumerate([1, 5, 3, 8, 2, 9])]
    rows += [(2, i, float(v)) for i, v in enumerate([10, 10, 10])]
    ev = spark.createDataFrame(rows, "user_id long, seq long, value double").withColumn(
        "ts", F.timestamp_micros(F.col("seq") * 1_000_000)
    )
    got = {
        r["user_id"]: r["ewma"]
        for r in ewma_last(
            ev, key_cols=["user_id"], ts_col="ts", value_col="value", alpha=0.3
        ).collect()
    }
    exp1 = pd.Series([1, 5, 3, 8, 2, 9]).ewm(alpha=0.3, adjust=True).mean().iloc[-1]
    assert abs(got[1] - round(exp1, 6)) < 1e-9
    assert got[2] == 10.0


def test_chi2_terms_ranks_class_markers_first(spark):
    from dbt_lakehouse_aws_spark.llmops.classify import chi2_terms

    rows = [(i, "alpha alpha shared word", "c1") for i in range(6)]
    rows += [(10 + i, "beta beta shared word", "c2") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_terms(docs, label_col="lang", k=4).collect()
    ranked = [r["term"] for r in out]
    # perfectly class-separating terms outrank the uniform ones
    assert set(ranked[:2]) == {"alpha", "beta"}
    chi = {r["term"]: r["chi2"] for r in out}
    assert chi["shared"] == 0.0 and chi["word"] == 0.0


# ---------------------------------------------------------------------------
# Real image codecs (round 2: VERDICT item 5)
# ---------------------------------------------------------------------------


def test_bmp_decode_hand_built_fixture():
    """Pin the BMP byte layout against a hand-assembled 2x2 24-bpp
    file: bottom-up rows, BGR channel order, rows padded to 4 bytes
    (2*3=6 -> stride 8)."""
    import struct

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_bmp

    # pixels (top-down RGB): (255,0,0) (0,255,0) / (0,0,255) (9,8,7)
    bottom_row = bytes([255, 0, 0, 7, 8, 9]) + b"\x00\x00"  # BGR of row 1 + pad
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"   # BGR of row 0 + pad
    body = bottom_row + top_row  # bottom-up storage
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    px = decode_bmp(header + dib + body)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]], dtype=np.uint8
    )
    assert np.array_equal(px, expect)


def test_bmp_roundtrip_odd_width_and_topdown():
    import struct

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 3), (5, 7), (4, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)

    # top-down variant: negative height must decode to the same raster
    px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    struct.pack_into("<i", data, 22, -2)  # declare top-down
    stride = (3 * 3 + 3) & ~3
    body = bytearray(data[54:])
    body[0:stride], body[stride : 2 * stride] = (
        data[54 + stride : 54 + 2 * stride],
        data[54 : 54 + stride],
    )
    data[54:] = body
    assert np.array_equal(decode_bmp(bytes(data)), px)


def test_bmp_32bpp_decode():
    import struct

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_bmp

    # 1x1 BGRA pixel (1,2,3,4) -> RGBA (3,2,1,4); no padding at 32bpp
    body = bytes([1, 2, 3, 4])
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + 4, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 0, 0, 0, 0)
    px = decode_bmp(header + dib + body)
    assert px.shape == (1, 1, 4) and list(px[0, 0]) == [3, 2, 1, 4]


def test_ppm_pgm_roundtrip_and_comments():
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    gray = rng.integers(0, 256, size=(3, 2), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray))[:, :, 0], gray)

    # header comments + flexible whitespace
    data = b"P6 # a comment\n# another\n2\t1 # trailing\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    px = decode_ppm(data)
    assert px.shape == (1, 2, 3) and list(px[0, 1]) == [40, 50, 60]


def test_decode_media_image_vs_stubbed_modalities():
    import numpy as np
    import pytest as _pytest

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_media, encode_bmp

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    feats = decode_media(encode_bmp(px), "image")
    assert (feats["width"], feats["height"], feats["channels"]) == (2, 2, 3)
    assert feats["pixel_sum"] == int(px.sum())
    with _pytest.raises(NotImplementedError):
        decode_media(b"\x00", "video")


def test_extract_image_features_spark_roundtrip(spark):
    """Known-dimension BMP payloads through the Spark mapInPandas
    decode path — the driver-query shape at fixture scale."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_bmp,
        extract_image_features,
    )

    rows = []
    for doc_id, (h, w) in enumerate([(3, 4), (2, 7), (5, 5)]):
        px = ((doc_id + np.arange(h * w * 3)) % 256).astype(np.uint8).reshape(h, w, 3)
        rows.append((doc_id, bytearray(encode_bmp(px)), int(px.sum())))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    for doc_id, _, pixel_sum in rows:
        r = got[doc_id]
        assert r["channels"] == 3 and r["pixel_sum"] == pixel_sum
    assert (got[0]["width"], got[0]["height"]) == (4, 3)
    assert (got[1]["width"], got[1]["height"]) == (7, 2)


def test_bpe_batched_equals_sequential_and_saves_jobs(spark, sf_dir):
    """Round-2 (VERDICT item 8): both fast paths — the collected-vocab
    trainer (default) and the batched distributed loop — must produce
    the EXACT sequential merge table, and the default path must cut
    Spark jobs >=5x at num_merges=256."""
    from dbt_lakehouse_aws_spark.llmops.tokenizer import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    docs = docs.localCheckpoint(eager=True)  # freeze input lineage

    sc = spark.sparkContext

    def count_jobs(group, **kwargs):
        sc.setJobGroup(group, group)
        merges = bpe_train(docs, num_merges=256, **kwargs)
        sc.setJobGroup("", "")
        return merges, len(sc.statusTracker().getJobIdsForGroup(group))

    seq, seq_jobs = count_jobs("bpe-seq", batch_merges=1, driver_vocab_limit=0)
    bat, _ = count_jobs("bpe-batch", batch_merges=64, driver_vocab_limit=0)
    mem, mem_jobs = count_jobs("bpe-mem")  # default: collected-vocab path
    assert bat == seq, "batched distributed merge table must equal sequential"
    assert mem == seq, "collected-vocab merge table must equal sequential"
    assert len(seq) > 50, "fixture too small to be meaningful"
    assert mem_jobs * 5 <= seq_jobs, f"expected >=5x fewer jobs, got {seq_jobs} -> {mem_jobs}"


def test_pca_matches_numpy_and_orders_variance(spark, sf_dir):
    """Distributed PCA must agree with numpy's eigendecomposition of
    the full covariance (same components up to the deterministic
    sign fix) and explain variance in decreasing order."""
    from dbt_lakehouse_aws_spark.llmops.similarity import pca_fit, pca_project

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mean, comps, ev = pca_fit(e, k=5)

    X = np.array([r["embedding"] for r in e.select("embedding").collect()], dtype=np.float64)
    ref_mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:5]
    ref = evecs[:, order].T
    for i in range(5):
        j = int(np.abs(ref[i]).argmax())
        if ref[i, j] < 0:
            ref[i] = -ref[i]

    assert np.allclose(mean, ref_mean, atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-6)
    assert np.all(np.diff(ev) <= 1e-12), "explained variance must be non-increasing"

    proj = pca_project(e, mean, comps, out_col="p")
    got = {r["vec_id"]: np.array(r["p"]) for r in proj.collect()}
    ref_proj = (X - ref_mean) @ ref.T
    ids = [r["vec_id"] for r in e.select("vec_id").collect()]
    for vid, rp in zip(ids, ref_proj):
        assert np.allclose(got[vid], rp, atol=1e-8)


def test_cosine_arrow_batch_prune_keeps_rounded_ties(spark):
    """The per-batch pre-prune must use the SAME ordering as the
    final window (6dp-rounded cosine desc, neighbor_id asc). Scaled
    copies of one direction all have cosine exactly 1.0 to the query;
    with k=2 the global answer is the two SMALLEST neighbor ids, so a
    batch pruning on raw float order with no id tiebreak could ship
    the wrong survivors."""
    from dbt_lakehouse_aws_spark.llmops.similarity import cosine_topk, cosine_topk_arrow

    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(0, base)]
    # ids descending in insertion order so naive "first k seen" also fails
    for j, scale in zip(range(60, 0, -1), [1.0 + 0.001 * s for s in range(60)]):
        rows.append((j, [scale * x for x in base]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)  # many batches, each holding a slice of the tie
    a = [(r["rank"], r["neighbor_id"], r["cosine"])
         for r in cosine_topk(df, [0], k=2).collect()]
    b = [(r["rank"], r["neighbor_id"], r["cosine"])
         for r in cosine_topk_arrow(df, [0], k=2).collect()]
    assert a == b
    assert [n for _, n, _ in sorted(b)] == [1, 2]


def test_portable_hash60_matches_duckdb(spark):
    """The md5-prefix base hash (dedup.py::_portable_hash60) must be
    bit-identical in DuckDB — it is the foundation of the minhash/
    simhash value oracles; any repr/encoding drift (unicode, empty
    string) would silently rot all three."""
    import duckdb

    from dbt_lakehouse_aws_spark.llmops.dedup import MINHASH_PRIME, _portable_hash60

    vals = ["hello world foo", "a b c", "", "ünïcodé tèst", "x", "the the the"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    h = _portable_hash60(F.col("s"))
    got = {
        r["s"]: (r["h"], r["hp"])
        for r in df.select(
            "s", h.alias("h"), F.pmod(h, F.lit(MINHASH_PRIME).cast("long")).alias("hp")
        ).collect()
    }
    con = duckdb.connect()
    for v in vals:
        d60, dp = con.sql(
            "SELECT CAST('0x'||substr(md5(?),1,15) AS BIGINT),"
            " CAST('0x'||substr(md5(?),1,15) AS BIGINT) % 2147483647",
            params=[v, v],
        ).fetchone()
        assert got[v] == (d60, dp), v


def test_wav_roundtrip_byte_exact():
    """encode_wav → decode_wav must return the exact samples, rate,
    and layout for mono and stereo int16."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_wav, encode_wav

    mono = np.array([0, 1, -1, 32767, -32768, 100], dtype=np.int16)
    wav = decode_wav(encode_wav(mono, 8000))
    assert wav["sample_rate"] == 8000 and wav["channels"] == 1 and wav["bits"] == 16
    assert np.array_equal(wav["samples"][:, 0], mono)

    stereo = np.array([[1, -2], [3, -4], [5, -6]], dtype=np.int16)
    wav = decode_wav(encode_wav(stereo, 44100))
    assert wav["channels"] == 2
    assert np.array_equal(wav["samples"], stereo)

    # odd-sized data chunk gets a pad byte and still parses
    odd = np.array([7], dtype=np.int16)
    raw = encode_wav(odd, 8000)
    assert np.array_equal(decode_wav(raw)["samples"][:, 0], odd)


def test_wav_chunk_walking_and_formats():
    """Real-world WAVs carry metadata chunks before/after fmt/data
    (LIST, fact…) and other sample formats; the parser must walk the
    chunk list, not assume a fixed layout."""
    import struct

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import audio_features, decode_wav

    def wav_with_chunks(body_chunks):
        payload = b"".join(body_chunks)
        return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload

    fmt16 = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    samples = np.array([10, -20, 30], dtype="<i2")
    data = b"data" + struct.pack("<I", 6) + samples.tobytes()
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    wav = decode_wav(wav_with_chunks([info, fmt16, data]))
    assert np.array_equal(wav["samples"][:, 0], samples)

    # IEEE float32 (format 3)
    fmtf = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    fs = np.array([0.5, -0.25], dtype="<f4")
    dataf = b"data" + struct.pack("<I", 8) + fs.tobytes()
    wav = decode_wav(wav_with_chunks([fmtf, dataf]))
    assert wav["bits"] == 32 and np.allclose(wav["samples"][:, 0], fs)

    # PCM8 unsigned (format 1, 8-bit)
    fmt8 = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data8 = b"data" + struct.pack("<I", 3) + bytes([0, 128, 255]) + b"\x00"
    wav = decode_wav(wav_with_chunks([fmt8, data8]))
    assert list(wav["samples"][:, 0]) == [0, 128, 255]

    # integer-exact features on a known waveform
    f = audio_features(wav_with_chunks([fmt16, data]))
    assert f["n_frames"] == 3 and f["amp_sum"] == 60 and f["zero_crossings"] == 2
    assert f["duration_ms"] == 3 * 1000 // 8000


def test_audio_decode_media_dispatch():
    """WAV decodes for real through decode_media; compressed audio
    and video stay honest NotImplementedError."""
    import numpy as np
    import pytest as _pytest

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_media, encode_wav

    out = decode_media(encode_wav(np.array([1, -1], dtype=np.int16), 8000), "audio")
    assert out["sample_rate"] == 8000 and out["amp_sum"] == 2
    with _pytest.raises(NotImplementedError):
        decode_media(b"\xff\xfb\x90\x00 mp3frame", "audio")
    with _pytest.raises(NotImplementedError):
        decode_media(b"anything", "video")


def test_avi_roundtrip_and_chunk_layout():
    """encode_avi → decode_avi byte-exact; plus a hand-adjusted
    payload pinning the chunk grammar: an extra odd-sized junk chunk
    inside movi must be skipped with its pad byte, and top-down
    frames (negative biHeight) must not be flipped."""
    import struct

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_avi, encode_avi

    frames = ((np.arange(3 * 4 * 6 * 3) * 11) % 256).astype(np.uint8).reshape(3, 4, 6, 3)
    blob = encode_avi(frames, us_per_frame=40_000)
    out = decode_avi(blob)
    assert out["n_frames"] == 3 and out["width"] == 6 and out["height"] == 4
    assert np.array_equal(out["frames"], frames)

    # splice an odd-sized junk chunk before the first frame inside movi
    movi_hdr = blob.index(b"movi") - 8  # the movi LIST's chunk header
    inner = movi_hdr + 12  # past LIST + size + 'movi' tag
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = bytearray(blob[:inner] + junk + blob[inner:])
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)  # RIFF size
    struct.pack_into(
        "<I", spliced, movi_hdr + 4,
        struct.unpack_from("<I", blob, movi_hdr + 4)[0] + len(junk),
    )  # movi LIST size
    out2 = decode_avi(bytes(spliced))
    assert np.array_equal(out2["frames"], frames)

    # top-down variant: flip biHeight sign in strf and store rows top-down
    strf_at = blob.index(b"strf") + 8
    h = 4
    neg = blob[:strf_at + 8] + struct.pack("<i", -h) + blob[strf_at + 12:]
    out3 = decode_avi(neg)
    assert np.array_equal(out3["frames"], frames[:, ::-1, :, :])


def test_video_decode_media_dispatch():
    """AVI decodes for real through decode_media; compressed video
    stays an honest NotImplementedError."""
    import numpy as np
    import pytest as _pytest

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_media, encode_avi

    frames = np.full((2, 2, 2, 3), 9, dtype=np.uint8)
    out = decode_media(encode_avi(frames), "video")
    assert out["n_frames"] == 2 and out["pixel_sum"] == 2 * 2 * 2 * 3 * 9
    assert out["first_frame_sum"] == 2 * 2 * 3 * 9
    with _pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00 ftypisom....", "video")  # mp4 box
    import dbt_lakehouse_aws_spark.llmops.multimodal as mm
    with _pytest.raises(NotImplementedError, match="compression"):
        # compressed AVI (biCompression != 0) refuses at decode
        import struct
        blob = bytearray(encode_avi(frames))
        strf_at = bytes(blob).index(b"strf") + 8
        struct.pack_into("<I", blob, strf_at + 16, 1)  # biCompression = BI_RLE8
        mm.decode_avi(bytes(blob))


# ---------------------------------------------------------------------------
# incremental dedup against a persisted MinHash index
# ---------------------------------------------------------------------------


def test_incremental_dedup_two_batches(spark, tmp_path):
    """Batch 1 seeds the index; batch 2's near/exact dups of batch-1
    docs are rejected as history-dups, its internal dup collapses to
    one survivor, and the index grows by batch-2 survivors only."""
    from dbt_lakehouse_aws_spark.llmops.incremental_dedup import MinHashDedupIndex

    idx = MinHashDedupIndex(
        spark, str(tmp_path / "mh_index"), est_threshold=0.5
    )
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark engines here now"),
        ],
        "doc_id long, text string",
    )
    r1 = idx.ingest_batch(b1)
    assert sorted(r["doc_id"] for r in r1.survivors.collect()) == [1, 3]
    assert r1.dup_of_history.count() == 0
    assert idx.index_size() == 2

    b2 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (11, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (12, "a genuinely new document on window aggregation"),
            (13, "a genuinely new document on window aggregation"),  # batch-internal dup
        ],
        "doc_id long, text string",
    )
    r2 = idx.ingest_batch(b2)
    hist = {r["doc_id"]: r["matched_id"] for r in r2.dup_of_history.collect()}
    assert hist[10] == 1 and hist.get(11) == 1
    surv = sorted(r["doc_id"] for r in r2.survivors.collect())
    assert surv == [12]  # 13 folded into 12 inside the batch
    assert idx.index_size() == 3
    assert r2.index_version > r1.index_version


def test_incremental_dedup_rejects_param_mismatch(spark, tmp_path):
    from dbt_lakehouse_aws_spark.llmops.incremental_dedup import MinHashDedupIndex

    path = str(tmp_path / "mh_index2")
    idx = MinHashDedupIndex(spark, path, num_hashes=32, num_bands=8)
    idx.ingest_batch(
        spark.createDataFrame(
            [(1, "some text here for the index seed words")],
            "doc_id long, text string",
        )
    )
    with pytest.raises(ValueError, match="incompatible"):
        MinHashDedupIndex(spark, path, num_hashes=32, num_bands=4)


def test_incremental_dedup_snapshot_isolation(spark, tmp_path):
    """A reader pinned to the pre-batch index version never sees the
    new batch's rows — the property that lets audits replay exactly
    what any historical batch was deduped against."""
    from dbt_lakehouse_aws_spark.llmops.incremental_dedup import MinHashDedupIndex
    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    path = str(tmp_path / "mh_index3")
    idx = MinHashDedupIndex(spark, path)
    r1 = idx.ingest_batch(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
    )
    idx.ingest_batch(
        spark.createDataFrame(
            [(2, "one two three four five six seven eight nine ten")],
            "doc_id long, text string",
        )
    )
    pinned = AcidTable(spark, path).read(r1.index_version)
    assert [r["doc_id"] for r in pinned.select("doc_id").distinct().collect()] == [1]


def test_gopher_quality_flags_each_rule(spark):
    """Synthetic docs violating exactly one rule each; defaults are
    the published Gopher thresholds."""
    from dbt_lakehouse_aws_spark.llmops.text import gopher_quality_flags

    good = " ".join(["the quick brown fox and lazy dog trot home"] * 7)  # 63 words
    rows = [
        (1, good),
        (2, "too short the a"),  # word count
        (3, " ".join(["supercalifragilistic"] * 60) + " the a of"),  # mean word len
        (4, " ".join(["#"] * 30) + " " + good),  # symbol ratio + alpha below
        (5, " ".join(["123", "456"] * 40) + " the a of and to"),  # alpha words
        (6, " ".join(["zebra quartz vivid jumps"] * 15)),  # no stopwords
    ]
    out = gopher_quality_flags(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    r = {row["doc_id"]: row for row in out.collect()}
    assert r[1]["passes_all"] == 1
    assert r[2]["r_word_count"] == 0 and r[2]["passes_all"] == 0
    assert r[3]["r_mean_word_len"] == 0
    assert r[4]["r_symbol_ratio"] == 0
    assert r[5]["r_alpha_words"] == 0
    assert r[6]["r_stopwords"] == 0 and r[6]["r_word_count"] == 1


def test_gopher_alpha_rule_is_unicode_and_caps_aware(spark):
    """The alpha-word rule counts ANY Unicode letter (published
    Gopher: 'contains at least one alphabetic character') — all-caps
    and non-Latin-script tokens must count as alphabetic, digits must
    not (ADVICE r3)."""
    from pyspark.sql import functions as F

    from dbt_lakehouse_aws_spark.llmops.text import gopher_quality_flags

    caps = " ".join(["THE QUICK BROWN FOX AND LAZY DOG TROT HOME"] * 7)
    cyr = " ".join(["москва held данные the a of and to"] * 8)
    digits = " ".join(["123", "456"] * 40) + " the a of and to"
    out = gopher_quality_flags(
        spark.createDataFrame(
            [(1, caps), (2, cyr), (3, digits)], "doc_id long, text string"
        )
    )
    r = {row["doc_id"]: row["r_alpha_words"] for row in out.collect()}
    assert r[1] == 1  # all-caps is alphabetic
    assert r[2] == 1  # Cyrillic is alphabetic
    assert r[3] == 0  # digit tokens are not


def test_incremental_dedup_string_doc_ids(spark, tmp_path):
    """First-batch empty dup_of_history frame must derive the id type
    from the corpus — string doc ids previously hit a long-typed
    empty frame in the left_anti join (ADVICE r3)."""
    from dbt_lakehouse_aws_spark.llmops.incremental_dedup import MinHashDedupIndex

    idx = MinHashDedupIndex(
        spark, str(tmp_path / "mh_sid"), est_threshold=0.5, id_col="doc_id"
    )
    b1 = spark.createDataFrame(
        [
            ("doc-a", "the quick brown fox jumps over the lazy dog"),
            ("doc-b", "completely different text about spark engines here now"),
        ],
        "doc_id string, text string",
    )
    r1 = idx.ingest_batch(b1)
    assert sorted(r["doc_id"] for r in r1.survivors.collect()) == ["doc-a", "doc-b"]
    assert r1.dup_of_history.count() == 0
    b2 = spark.createDataFrame(
        [("doc-c", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    r2 = idx.ingest_batch(b2)
    hist = {r["doc_id"]: r["matched_id"] for r in r2.dup_of_history.collect()}
    assert hist == {"doc-c": "doc-a"}


def test_pq_encode_shape_and_compression(spark):
    """Codes are m ids in [0, n_codes); identical vectors get
    identical codes."""
    from dbt_lakehouse_aws_spark.llmops.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=32).tolist()) for i in range(300)]
    rows.append((300, rows[0][1]))  # exact dup of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(df, n_subspaces=4, n_codes=8)
    assert books.shape == (4, 8, 8)
    enc = {r["vec_id"]: r["pq_code"] for r in pq_encode(df, books).collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in enc.values())
    assert enc[0] == enc[300]


def test_pq_search_recall_with_rerank(spark):
    """PQ ADC shortlist + exact rerank recovers most of brute-force
    top-5 on clustered data."""
    from dbt_lakehouse_aws_spark.llmops.similarity import cosine_topk, pq_search

    rng = np.random.default_rng(17)
    centers = rng.normal(size=(4, 32)) * 5
    rows = []
    for i in range(240):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(size=32) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 1, 2, 3]
    exact = cosine_topk(df, qids, id_col="vec_id", vec_col="embedding", k=5)
    approx = pq_search(df, qids, k=5, n_subspaces=4, n_codes=16, rerank=25)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8, len(e & a) / len(e)


def test_pq_search_plain_adc_orders_close_neighbors_first(spark):
    """Without rerank, a vector's planted twin must rank 1 by ADC
    distance (its code is identical → distance equals the query's
    own quantization error, minimal)."""
    from dbt_lakehouse_aws_spark.llmops.similarity import pq_search

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=32).tolist()) for i in range(150)]
    rows.append((150, rows[0][1]))  # twin of 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_search(df, [0], k=3, n_subspaces=4, n_codes=16)
    top = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert top[0] == 150


def test_classification_report_hand_computed(spark):
    """3-class report incl. a class never predicted (NULL precision)
    and a prediction never true (NULL recall)."""
    from dbt_lakehouse_aws_spark.llmops.evalmetrics import classification_report

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),   # a: support 3, tp 2
        ("b", "b"),                            # b: support 1, tp 1
        ("c", "b"),                            # c: support 1, tp 0
        ("a", "d"),                            # d predicted, never true
    ]
    df = spark.createDataFrame(rows, "y string, yhat string")
    got = {
        r["class"]: (r["support"], r["precision"], r["recall"], r["f1"])
        for r in classification_report(df, label_col="y", pred_col="yhat").collect()
    }
    assert got["a"] == (4, 1.0, 0.5, round(2 * 1.0 * 0.5 / 1.5, 6))
    assert got["b"][0] == 1 and got["b"][1] == pytest.approx(1 / 3)
    assert got["b"][2] == 1.0
    assert got["c"] == (1, None, 0.0, None)
    assert got["d"] == (0, 0.0, None, None)


def test_ranking_metrics_hand_computed(spark):
    """recall/MRR/nDCG against a 3-item truth set, including a query
    with no results at all (scores 0, not dropped)."""
    import math

    from dbt_lakehouse_aws_spark.llmops.evalmetrics import ranking_metrics

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)],
        "query_id long, neighbor_id long",
    )
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    got = {
        r["query_id"]: (r["recall_at_3"], r["mrr_at_3"], r["ndcg_at_3"])
        for r in ranking_metrics(results, truth, k=3).collect()
    }
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert got[1] == (round(2 / 3, 6), 1.0, round(dcg / idcg, 6))
    assert got[2] == (0.0, 0.0, 0.0)


def test_psi_drift_detects_shift_and_clips_one_sided(spark):
    """Genuine mix shift produces a large total PSI; a category in
    only one snapshot clips at eps instead of inf; identical
    snapshots score ~0."""
    from dbt_lakehouse_aws_spark.llmops.evalmetrics import psi_drift

    a = spark.createDataFrame(
        [("x",)] * 80 + [("y",)] * 20, "c string"
    )
    b = spark.createDataFrame(
        [("x",)] * 20 + [("y",)] * 70 + [("z",)] * 10, "c string"
    )
    out = {r["category"]: r["psi_term"] for r in psi_drift(a, b, col="c").collect()}
    total = sum(out.values())
    assert total > 0.25, out           # flagged as real drift
    assert out["z"] > 0                 # one-sided category, finite
    import math

    assert out["z"] == round((1e-6 - 0.1) * math.log(1e-6 / 0.1), 6)
    same = sum(
        r["psi_term"] for r in psi_drift(a, a, col="c").collect()
    )
    assert abs(same) < 1e-9


def test_target_encode_loo_hand_computed(spark):
    """Group x: targets 10, 20, 40 -> row encodings are the means of
    the OTHER two; singleton group y falls back to the global
    leave-one-out mean, never its own target."""
    from dbt_lakehouse_aws_spark.llmops.features import target_encode_loo

    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "x", 20.0), (3, "x", 40.0), (4, "y", 100.0)],
        "id long, cat string, t double",
    )
    got = {
        r["id"]: r["te_loo"]
        for r in target_encode_loo(df, cat_col="cat", target_col="t").collect()
    }
    assert got[1] == 30.0  # (20+40)/2
    assert got[2] == 25.0  # (10+40)/2
    assert got[3] == 15.0  # (10+20)/2
    assert got[4] == round((10 + 20 + 40) / 3, 6)  # global LOO, not 100


def test_kfold_split_total_and_stable(spark):
    """Every row gets a fold in [0, k); assignment is identical
    across two runs and changes with the salt."""
    from dbt_lakehouse_aws_spark.llmops.features import kfold_split

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    a = {r["id"]: r["fold"] for r in kfold_split(df, id_col="id", k=5).collect()}
    b = {r["id"]: r["fold"] for r in kfold_split(df, id_col="id", k=5).collect()}
    c = {r["id"]: r["fold"] for r in kfold_split(df, id_col="id", k=5, salt="v2").collect()}
    assert a == b
    assert all(0 <= f < 5 for f in a.values())
    assert len(set(a.values())) == 5
    assert a != c


def test_feature_hash_tokens_counts(spark):
    """Same token always lands in the same bucket; counts aggregate
    per (doc, bucket); empty tokens are dropped."""
    from dbt_lakehouse_aws_spark.llmops.features import feature_hash_tokens

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a  c")], "doc_id long, text string"
    )
    rows = feature_hash_tokens(df, n_buckets=8).collect()
    by = {(r["doc_id"], r["bucket"]): r["cnt"] for r in rows}
    # token 'a' has one bucket: doc 1 counts 2, doc 2 counts 1
    a_buckets = [b for (d, b), c in by.items() if d == 1 and c == 2]
    assert len(a_buckets) == 1
    assert by[(2, a_buckets[0])] == 1
    assert sum(c for (d, _), c in by.items() if d == 1) == 3  # a,b,a
    assert sum(c for (d, _), c in by.items() if d == 2) == 2  # a,c (empty dropped)


def test_temporal_split_purged_boundaries(spark):
    """train strictly before test_start - purge; purged inside the
    gap (inclusive of the gap start, exclusive of test_start); test
    from test_start on."""
    from datetime import datetime

    from dbt_lakehouse_aws_spark.llmops.features import temporal_split_purged

    rows = [
        (1, datetime(2024, 1, 10)),   # train
        (2, datetime(2024, 1, 19)),   # purged (gap start, inclusive)
        (3, datetime(2024, 1, 21, 23, 59)),  # purged
        (4, datetime(2024, 1, 22)),   # test (boundary inclusive)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = {
        r["id"]: r["split"]
        for r in temporal_split_purged(
            df,
            ts_col="ts",
            test_start="2024-01-22 00:00:00",
            purge=F.expr("INTERVAL 3 DAYS"),
        ).collect()
    }
    assert got == {1: "train", 2: "purged", 3: "purged", 4: "test"}


def test_dedup_keep_best_prefers_quality_then_min_id(spark):
    """Component {1,2,3}: doc 2 has the best quality and survives
    (not min-id 1); ties fall back to min id; singleton 9 passes."""
    from dbt_lakehouse_aws_spark.llmops.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 5), (7, 4), (8, 4), (9, 2)],
        "doc_id long, q long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    surv = sorted(
        r["doc_id"] for r in dedup_keep_best(docs, pairs, quality_col="q").collect()
    )
    assert surv == [2, 7, 9]  # 2 beats 1/3 on quality; 7 ties 8 -> min id; 9 untouched


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(13)
    for h, w, c in [(1, 1, 1), (3, 5, 2), (4, 4, 3), (2, 7, 4)]:
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        data = encode_png(px)
        assert np.array_equal(decode_png(data), px)
        # decode_image magic-dispatches PNG too
        assert np.array_equal(decode_image(data), px)


def test_png_unfilters_all_five_filter_types():
    """Fixture built by FORWARD-filtering rows per the PNG spec
    (independent arithmetic from the decoder's unfilter), cycling
    through filter types 0..4 — pins sub/up/average/paeth byte math,
    not just the filter-0 fast path encode_png emits."""
    import struct
    import zlib

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_png

    rng = np.random.default_rng(17)
    h, w, c = 10, 6, 3
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    rb = w * c
    flat = px.reshape(h, rb).astype(int)
    prev = [0] * rb
    stream = b""
    for y in range(h):
        ft = y % 5
        cur = flat[y]
        row = [ft]
        for i in range(rb):
            a = int(cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ft == 0:
                v = cur[i]
            elif ft == 1:
                v = cur[i] - a
            elif ft == 2:
                v = cur[i] - b
            elif ft == 3:
                v = cur[i] - ((a + b) >> 1)
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                v = cur[i] - pred
            row.append(v & 0xFF)
        stream += bytes(row)
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_png_palette_multiple_idat_and_rejects():
    import struct
    import zlib

    import numpy as np
    import pytest

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_png, encode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 2x2 palette image: indices (0,1 / 2,0), 3-entry palette; pixel
    # stream split across TWO IDAT chunks (spec allows arbitrary splits)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    stream = zlib.compress(b"\x00\x00\x01" + b"\x00\x02\x00")
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", stream[:5])
        + chunk(b"IDAT", stream[5:])
        + chunk(b"IEND", b"")
    )
    px = decode_png(data)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    assert np.array_equal(px, expect)

    good = encode_png(np.zeros((2, 2, 3), np.uint8))
    # corrupt one IDAT byte -> CRC failure must raise, not mis-decode
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # sub-byte depths and unknown interlace methods are rejected,
    # not mis-decoded (8/16-bit and Adam7 decode for real)
    ihdr4 = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\n" + ihdr4 + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b""))
    ihdr_i = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(b"\x89PNG\r\n\x1a\n" + ihdr_i + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b""))


def test_png_payloads_flow_through_image_features(spark):
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_png,
        extract_image_features,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i, (h, w) in enumerate([(2, 3), (4, 1), (3, 3)]):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, encode_png(px), int(px.sum()), w, h))
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r
        for r in extract_image_features(df).collect()
    }
    for i, _, psum, w, h in rows:
        assert (got[i]["width"], got[i]["height"], got[i]["pixel_sum"]) == (w, h, psum)


def test_gif_roundtrip_and_dispatch():
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.default_rng(29)
    for h, w, ncol in [(1, 1, 1), (3, 4, 5), (6, 6, 256)]:
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        px = pal[rng.integers(0, ncol, size=(h, w))]
        data = encode_gif(px)
        assert np.array_equal(decode_gif(data), px)
        assert np.array_equal(decode_image(data), px)


def test_gif_real_lzw_with_table_growth_interlace_and_89a():
    """Fixture compressed by an independent dictionary-building LZW
    encoder (standard GIF variant) — exercises decoder code-width
    growth through 3→9 bits, the KwKwK case, interlaced row order,
    and 89a graphic-control extension skipping."""
    import struct

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_gif

    def lzw_encode(indices, min_code):
        clear, end = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        code_size = min_code + 1
        acc = nbits = 0
        out = bytearray()

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        run = b""
        for i in indices:
            nxt = run + bytes([i])
            if nxt in table:
                run = nxt
                continue
            emit(table[run])
            table[nxt] = next_code
            next_code += 1
            # decoder widens when ITS table (one entry behind the
            # encoder's) fills the current width
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
            run = bytes([i])
        if run:
            emit(table[run])
        emit(end)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(31)
    h, w = 13, 11  # odd sizes exercise every interlace pass length
    idx = rng.integers(0, 4, size=(h, w)).astype(np.uint8)
    # repetitive runs so the dictionary actually builds deep entries
    idx[::3] = 2
    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30], [7, 7, 7]], np.uint8)

    # interlace: store rows in pass order
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, h, st)]
    stored = idx[order]
    stream = lzw_encode(stored.ravel(), 2)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # 4-entry GCT
    out += pal.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    out += b"\x21\xfe\x05hello\x00"  # comment ext
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(2)  # min code size
    for off in range(0, len(stream), 255):
        chunk = stream[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"

    got = decode_gif(bytes(out))
    assert np.array_equal(got, pal[idx])


def test_gif_rejects_and_lzw_guards():
    import numpy as np
    import pytest

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        _gif_lzw_decode,
        decode_gif,
        encode_gif,
    )

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    # truncated LZW stream: expected more index bytes than decodable
    good = encode_gif(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(ValueError, match="short"):
        _gif_lzw_decode(b"\x00", 2, 100)
    assert decode_gif(good).shape == (2, 2, 3)


def test_compression_ratio_signal(spark):
    import zlib

    from dbt_lakehouse_aws_spark.llmops.text import compression_ratio

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "spam spam spam spam spam spam spam spam spam spam " * 10),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    for doc_id, text in rows[:2]:
        expect = round(len(zlib.compress(text.encode(), 6)) / len(text.encode()), 6)
        assert out[doc_id] == expect
    # repetitive text compresses materially harder than prose
    assert out[2] < out[1]
    assert out[3] is None and out[4] is None


def test_png_adam7_interlace_decode():
    """Adam7 fixture: seven independently-filtered pass sub-images
    (filters cycled per row) assembled by the test, scattered back by
    the decoder."""
    import struct
    import zlib

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(43)
    h, w, c = 11, 9, 3  # odd dims: passes have ragged sizes, some tiny
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    stream = b""
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * c).astype(int)
        prev = [0] * (pw * c)
        for y in range(ph):
            ft = y % 3  # none / sub / up
            cur = flat[y]
            row = [ft]
            for i in range(pw * c):
                if ft == 0:
                    v = cur[i]
                elif ft == 1:
                    v = cur[i] - (cur[i - c] if i >= c else 0)
                else:
                    v = cur[i] - prev[i]
                row.append(v & 0xFF)
            stream += bytes(row)
            prev = cur
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_png_16bit_depth_decode():
    import struct
    import zlib

    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(47)
    h, w = 4, 3
    px = rng.integers(0, 65536, size=(h, w, 3), dtype=np.uint16)
    # scanlines: filter 0 then filter 2 (up) on raw big-endian bytes
    be = px.astype(">u2").tobytes()
    rowbytes = w * 3 * 2
    rows = [be[i * rowbytes : (i + 1) * rowbytes] for i in range(h)]
    stream = b"\x00" + rows[0]
    prev = np.frombuffer(rows[0], np.uint8)
    for r in rows[1:]:
        cur = np.frombuffer(r, np.uint8)
        stream += b"\x02" + (cur - prev).tobytes()
        prev = cur
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    got = decode_png(data)
    assert got.dtype == np.uint16
    assert np.array_equal(got, px)


def test_mjpg_avi_decode():
    """Motion-JPEG AVI: each frame a baseline JPEG. Uniform-8x8-block
    frames at all-ones quant are DC-only and round-trip bit-exactly;
    a smooth frame round-trips within JPEG's transform rounding."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        decode_avi,
        encode_avi,
        video_features,
    )

    # bit-exact lane: constant 8x8 blocks per frame
    vals = np.array([[10, 200], [77, 140]], np.uint8)
    frames = []
    for k in range(3):
        px = np.repeat(np.repeat((vals + 7 * k) % 256, 8, 0), 8, 1)
        frames.append(np.stack([px, px, px], axis=2))
    frames = np.stack(frames)
    data = encode_avi(frames, 50_000, codec="MJPG")
    got = decode_avi(data)
    assert got["n_frames"] == 3 and got["us_per_frame"] == 50_000
    assert np.array_equal(got["frames"], frames)
    # feature path dispatches too
    feats = video_features(data)
    assert feats["n_frames"] == 3

    # lossy lane: smooth frame within rounding tolerance
    yy, xx = np.mgrid[0:16, 0:16]
    smooth = np.clip(128 + 60 * np.cos(xx / 4) + 40 * np.sin(yy / 5), 0, 255)
    rgb = np.stack([smooth, smooth[::-1], 255 - smooth], axis=2).astype(np.uint8)
    got = decode_avi(encode_avi(rgb[None], codec="MJPG"))
    assert np.max(np.abs(got["frames"][0].astype(int) - rgb.astype(int))) <= 4


def test_permissive_image_decode_survives_corrupt_payloads(spark):
    import numpy as np
    import pytest

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_png,
        extract_image_features,
    )

    good = encode_png(np.full((2, 3, 3), 9, np.uint8))
    rows = [(1, good), (2, b"\x89PNG\r\n\x1a\nGARBAGE"), (3, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in extract_image_features(df, mode="permissive").collect()}
    assert out[1]["pixel_sum"] == 9 * 2 * 3 * 3 and out[1]["decode_error"] is None
    assert out[2]["width"] is None and "CRC" in out[2]["decode_error"] or out[2]["decode_error"]
    assert out[3]["decode_error"] and out[3]["pixel_sum"] is None
    # failfast (default) still propagates
    with pytest.raises(Exception):
        extract_image_features(df).collect()


def test_query_likelihood_absent_term_and_hand_values(spark):
    """Hand-computed Dirichlet QL on a tiny corpus, plus the
    absent-term contract: a query term with zero corpus frequency
    has P(w|C)=0 and would contribute ln(0) = -inf to every score —
    the operator drops such terms, so scores match the same query
    without them."""
    import math

    from dbt_lakehouse_aws_spark.llmops.text import query_likelihood_topk

    rows = [(1, "a b a c"), (2, "b b d"), (3, "c c c a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mu = 10.0
    got = {r["doc_id"]: r["ql_score"] for r in
           query_likelihood_topk(df, ["a", "d"], mu=mu, k=10).collect()}
    ctot = 4 + 3 + 4
    cw = {"a": 3, "d": 1}
    tf = {1: {"a": 2, "d": 0}, 2: {"a": 0, "d": 1}, 3: {"a": 1, "d": 0}}
    dl = {1: 4, 2: 3, 3: 4}
    for doc in (1, 2, 3):
        expect = round(sum(
            math.log((tf[doc][t] + mu * (cw[t] / ctot)) / (dl[doc] + mu))
            for t in ("a", "d")
        ), 6)
        assert got[doc] == expect, doc
    # absent-term contract: adding a nonsense term changes nothing
    from dbt_lakehouse_aws_spark.llmops.text import query_likelihood_topk as ql
    with_junk = {r["doc_id"]: r["ql_score"] for r in
                 ql(df, ["a", "d", "zzzznope"], mu=mu, k=10).collect()}
    assert with_junk == got


def test_prefix_filter_jaccard_matches_all_shingle_join(spark):
    """Prefix filtering is LOSSLESS: on the sf0.001 corpus the
    prefix-filtered pair set must equal the all-shingle self-join's
    exactly (same threshold, two different algorithms), at two
    thresholds to exercise different prefix lengths."""
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.5, 0.3):
        want = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(d, threshold=t).collect()
        }
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in prefix_filter_jaccard_pairs(d, threshold=t).collect()
        }
        assert got == want and want, f"t={t}: {len(got)} vs {len(want)}"


def test_chunk_overlap_boundaries(spark):
    """Empty/null text yields ONE empty chunk; a doc exactly at the
    stride boundary gets no phantom tail; overlap windows carry the
    exact substring content."""
    from dbt_lakehouse_aws_spark.llmops.corpus import chunk_overlap

    rows = [
        (1, ""),            # empty -> 1 empty chunk
        (2, None),          # null  -> 1 empty chunk
        (3, "x" * 150),     # == stride -> exactly 1 chunk
        (4, "x" * 151),     # stride+1 -> 2 chunks, tail len 1
        (5, "abcdefghij"),  # short doc, content check
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_overlap(df, text_col="text", size=200, stride=150)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_ix"], r["chunk_len"], r["chunk_text"])
        )
    assert by_doc[1] == [(0, 0, "")]
    assert by_doc[2] == [(0, 0, "")]
    assert [c[:2] for c in sorted(by_doc[3])] == [(0, 150)]
    assert [c[:2] for c in sorted(by_doc[4])] == [(0, 151), (1, 1)]
    assert by_doc[5] == [(0, 10, "abcdefghij")]

    # overlap content: size 6, stride 4 over 10 chars
    small = spark.createDataFrame([(9, "0123456789")], "doc_id long, text string")
    got = sorted(
        (r["chunk_ix"], r["chunk_text"])
        for r in chunk_overlap(small, text_col="text", size=6, stride=4).collect()
    )
    assert got == [(0, "012345"), (1, "456789"), (2, "89")]


def test_url_features_hand_urls(spark):
    """Pinned java.net.URI behaviors: case-folded scheme/host, port
    excluded from HOST but visible in AUTHORITY, empty-value query
    param still counts, fragment never leaks into the query."""
    from dbt_lakehouse_aws_spark.llmops.text import url_features

    urls = [
        ("https://Sub.Example.COM:8080/en/doc/42/v/3?ref=rss&page=5#top",),
        ("http://plain.example.com/fr/doc/7",),
        ("HTTPS://UP.EXAMPLE.COM/x?q=",),
        ("http://h.example.org/a/b/",),
    ]
    df = spark.createDataFrame(urls, "url string")
    got = {
        r["url"]: (
            r["proto_norm"], r["host_norm"], r["tld"], r["path_depth"],
            r["n_params"], r["has_port"], r["has_frag"],
        )
        for r in url_features(df, "url").collect()
    }
    assert got[urls[0][0]] == (
        "https", "sub.example.com", "com", 5, 2, True, True)
    assert got[urls[1][0]] == (
        "http", "plain.example.com", "com", 3, 0, False, False)
    assert got[urls[2][0]] == (
        "https", "up.example.com", "com", 1, 1, False, False)
    assert got[urls[3][0]] == (
        "http", "h.example.org", "org", 2, 0, False, False)


def test_html_extract_hostile_page(spark):
    """Scripts/styles vanish ENTIRELY (including markup inside
    them and newlines), uppercase tags match, entities decode in
    title/visible/anchors, amp-last ordering prevents
    double-decoding, tag boundaries become spaces not glue."""
    from dbt_lakehouse_aws_spark.llmops.text import html_extract

    html = (
        '<HTML><head><title>A &amp;lt; &quot;B&quot;</title>\n'
        '<script type="x">\nvar s = "<p>fake text</p>";\n</script>'
        "</head><BODY><p>hello</p><p>world</p>"
        '<A HREF="/x">click &amp; go</A>'
        "<style>\n.c{}\n</style>tail</BODY></HTML>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    r = html_extract(df, "html").collect()[0]
    assert r["title"] == 'A &lt; "B"'
    assert r["visible_text"] == 'A &lt; "B" hello world click & go tail'
    assert r["n_links"] == 1
    assert r["anchor_chars"] == len("click & go")
    assert r["visible_len"] == len('A &lt; "B" hello world click & go tail')
    assert r["link_density_millis"] == 10 * 1000 // r["visible_len"]


def test_pii_scrub_masks_and_counts(spark):
    """Counts are raw-text matches; masking order (email -> IPv4 ->
    phone) keeps dotted quads out of the phone shape and email
    digits out of both; clean text is untouched."""
    from dbt_lakehouse_aws_spark.llmops.text import pii_scrub

    rows = [
        (1, "mail Bob.Smith+x@Sub.Example.org now"),
        (2, "server at 10.0.255.7 then call 555-867-5309 or +555 123 4567"),
        (3, "plain words only here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in pii_scrub(df, "text").collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 0, 0)
    assert got[1]["scrubbed_text"] == "mail <EMAIL> now"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 1, 2)
    assert got[2]["scrubbed_text"] == "server at <IP> then call <PHONE> or <PHONE>"
    assert got[3]["scrubbed_text"] == "plain words only here"
    assert got[3]["scrubbed_len"] == len("plain words only here")


def test_negative_sampling_weights_and_determinism(spark):
    """floor(freq^0.75) via the nested integer sqrt equals Python's
    exact math.isqrt chain for adversarial freqs (perfect fourth
    powers, off-by-one neighbors, big values); draws are a pure
    function of (vocab, k); every draw lands in exactly one band."""
    import math

    from pyspark.sql import functions as F
    from dbt_lakehouse_aws_spark.llmops.tokenizer import (
        NEG_WEIGHT_SQL,
        negative_sampling_draws,
    )

    freqs = [1, 2, 15, 16, 17, 80, 81, 82, 255, 256, 257,
             6560, 6561, 6562, 1_000_000, 1_999_999]
    df = spark.createDataFrame([(f,) for f in freqs], "freq long")
    got = {
        r["freq"]: r["w"]
        for r in df.withColumn("w", F.expr(NEG_WEIGHT_SQL)).collect()
    }
    for f in freqs:
        assert got[f] == math.isqrt(math.isqrt(f * f * f)), f

    vocab = spark.createDataFrame(
        [("the", 1000, 0), ("cat", 100, 1), ("sat", 10, 2), ("qux", 1, 3)],
        "token string, freq long, token_id long",
    )
    a = sorted(
        (r["j"], r["u"], r["token"])
        for r in negative_sampling_draws(vocab, k=500).collect()
    )
    b = sorted(
        (r["j"], r["u"], r["token"])
        for r in negative_sampling_draws(vocab, k=500).collect()
    )
    assert a == b and len(a) == 500  # deterministic, one band per draw
    # the smoothed distribution must up-weight the tail vs raw freq:
    from collections import Counter

    c = Counter(t for _, _, t in a)
    assert c["the"] < 1000 / 1111 * 500  # raw-unigram share would be ~45%
    assert c["qux"] >= 1


def test_cdc_chunks_realign_after_insertion(spark):
    """The CDC property: inserting one char near the front shifts
    only the chunk containing the edit (plus at most a window's
    worth of neighbors) — downstream boundaries re-align at the
    same CONTENT positions, where fixed windows would shift every
    chunk. Also: empty text -> one zero-length chunk; text shorter
    than the window -> one chunk."""
    from dbt_lakehouse_aws_spark.llmops.corpus import cdc_chunks

    import random

    rng = random.Random(7)
    base = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    edited = base[:100] + "Z" + base[100:]
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, ""), (4, "tiny")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df, id_cols=["doc_id"], text_col="text").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_ix"], r["chunk_len"]))
    for d in by_doc:
        by_doc[d].sort()

    assert by_doc[3] == [(0, 0)]
    assert by_doc[4] == [(0, 4)]

    # reconstruct boundary END positions in CONTENT coordinates
    def ends(chunks, shift_after, shift):
        out, acc = [], 0
        for _, ln in chunks:
            acc += ln
            out.append(acc - shift if acc > shift_after else acc)
        return out

    e1 = set(ends(by_doc[1], 10**9, 0))
    e2 = set(ends(by_doc[2], 101, 1))  # positions after the insert map back
    # all base boundaries beyond the edit window must reappear
    late1 = {e for e in e1 if e > 108}
    assert late1 and late1 <= e2, "downstream boundaries failed to re-align"
    assert len(by_doc[1]) > 30  # sanity: expected ~64-char chunks


def test_rle8_avi_roundtrip_delta_and_repeat():
    """BI_RLE8 inter-frame codec: keyframe + sparse-delta + identical
    frames round-trip exactly; an identical frame encodes as the
    EMPTY chunk (the repeat marker)."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(7)
    gray = lambda a: np.stack([a, a, a], axis=-1).astype(np.uint8)
    f0 = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    f1 = f0.copy()
    f1[2, 3] = (int(f1[2, 3]) + 97) % 256
    f1[4, 0] = 11
    frames = np.stack([gray(f0), gray(f1), gray(f1.copy())])
    payload = encode_avi(frames, codec="RLE8")
    out = decode_avi(payload)
    assert out["n_frames"] == 3
    assert np.array_equal(out["frames"], frames)
    assert b"00dc\x00\x00\x00\x00" in payload  # empty repeat chunk

    for trial in range(15):
        h = int(rng.integers(1, 7))
        w = int(rng.integers(1, 300))  # crosses the 255-run boundary
        fr = [rng.integers(0, 256, (h, w), dtype=np.uint8)]
        for _ in range(int(rng.integers(0, 3))):
            nxt = fr[-1].copy()
            for _ in range(int(rng.integers(0, 6))):
                nxt[rng.integers(0, h), rng.integers(0, w)] = rng.integers(0, 256)
            fr.append(nxt)
        stack = np.stack([gray(f) for f in fr])
        assert np.array_equal(
            decode_avi(encode_avi(stack, codec="RLE8"))["frames"], stack
        ), f"trial {trial}"


def test_rle8_delta_escape_preserves_previous_frame():
    """The DELTA escape (00 02 dx dy) SKIPS pixels — skipped pixels
    must keep the PREVIOUS frame's values (the property that makes
    RLE8 an inter-frame codec, not per-frame compression)."""
    import struct

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_avi

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(tag, body):
        return chunk(b"LIST", tag + body)

    key = bytes((4, 5, 0, 0, 4, 5, 0, 0, 0, 1))       # 4x2, all 5s
    delta = bytes((0, 2, 2, 0, 2, 9, 0, 0, 0, 0, 0, 1))  # skip 2, write 9,9
    strh = struct.pack("<4s4s48x", b"vids", b"MRLE")
    strf = struct.pack(
        "<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, 0, 0, 0, 0, 0
    ) + b"".join(bytes((i, i, i, 0)) for i in range(256))
    avih = struct.pack("<10I4I", 40000, 0, 0, 0x10, 2, 0, 1, 0, 4, 2, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", chunk(b"00dc", key) + chunk(b"00dc", delta))
    body = b"AVI " + hdrl + movi
    fr = decode_avi(b"RIFF" + struct.pack("<I", len(body)) + body)["frames"]
    assert (fr[0] == 5).all()
    assert (fr[1][0] == 5).all()                  # top display row untouched
    assert list(fr[1][1, :, 0]) == [5, 5, 9, 9]   # skipped kept, written new


def test_ulaw_spec_anchors_and_roundtrip():
    """G.711 µ-law pinned against the ITU/Sun reference anchors
    (0 → 0xFF, +clip → 0x80, −clip → 0x00), re-encode idempotence,
    and the per-segment quantization error bound (< 2^(e+3))."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        decode_wav,
        encode_wav_ulaw,
        ulaw_decode,
        ulaw_encode,
    )

    assert ulaw_encode([0]) == b"\xff"
    assert ulaw_encode([32635]) == b"\x80"
    assert ulaw_encode([-32635]) == b"\x00"
    assert ulaw_encode([32767]) == b"\x80"  # clipped to the same code

    x = np.arange(-32768, 32768, 97, dtype=np.int64)
    enc = ulaw_encode(x)
    dec = ulaw_decode(enc).astype(np.int64)
    # decode∘encode must be a fixpoint (requantizing changes nothing)
    assert ulaw_encode(dec) == enc
    err = np.abs(dec - np.clip(x, -32635, 32635))
    seg = np.maximum(
        np.floor(np.log2(np.abs(np.clip(x, -32635, 32635)) + 132)).astype(int) - 7,
        0,
    )
    assert (err < (1 << (seg + 3))).all()

    wav = encode_wav_ulaw(np.array([0, 1000, -1000, 32000], dtype=np.int64), 8000)
    out = decode_wav(wav)
    assert out["bits"] == 8 and out["sample_rate"] == 8000
    assert (out["samples"][:, 0] == ulaw_decode(ulaw_encode([0, 1000, -1000, 32000]))).all()


def test_alaw_spec_anchors_and_roundtrip():
    """G.711 A-law pinned against the public anchors (0 → 0xD5 the
    silence code, +max → 0xAA, −max → 0x2A), re-encode idempotence,
    and segment-midpoint decode values."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        alaw_decode,
        alaw_encode,
        decode_wav,
        encode_wav_alaw,
    )

    assert alaw_encode([0]) == b"\xd5"
    assert alaw_encode([32767]) == b"\xaa"
    assert alaw_encode([-32768]) == b"\x2a"
    assert alaw_decode(b"\xd5")[0] == 8  # silence decodes to +8

    x = np.arange(-32768, 32768, 89, dtype=np.int64)
    enc = alaw_encode(x)
    dec = alaw_decode(enc).astype(np.int64)
    assert alaw_encode(dec) == enc  # quantizer fixpoint
    # decode returns segment midpoints: worst error = half the top
    # segment's 16-bit bucket (512) at the clip edges
    err = np.abs(dec - x)
    assert int(err.max()) <= 512

    wav = encode_wav_alaw(np.array([0, 500, -500, 20000], dtype=np.int64), 8000)
    out = decode_wav(wav)
    assert out["bits"] == 8 and out["channels"] == 1
    assert (out["samples"][:, 0] == alaw_decode(alaw_encode([0, 500, -500, 20000]))).all()


def test_image_dhash_hand_computed_and_brightness_invariant(spark):
    """dhash bit j is gray[r,c+1] > gray[r,c] — hand-check a 2x3
    raster, check codec invariance (BMP vs PNG byte paths decode to
    the same bits), and the dHash selling point: a uniform
    brightness shift (no saturation) preserves every gradient
    comparison, so dhash is UNCHANGED while ahash may flip."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_bmp,
        encode_png,
        image_dhash,
    )

    # grayscale values per pixel = 3*v (three equal channels)
    vals = np.array([[10, 40, 20], [90, 60, 200]], dtype=np.uint8)
    px = np.repeat(vals[:, :, None], 3, axis=2)
    # row 0: 40>10 -> bit0=1, 20>40 -> bit1=0
    # row 1: 60>90 -> bit2=0, 200>60 -> bit3=1
    expect = 0b1001
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px))), (2, bytearray(encode_png(px)))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert got[1]["dhash"] == expect and got[2]["dhash"] == expect
    assert got[1]["width"] == 3 and got[1]["height"] == 2

    shifted = np.repeat((vals + 10)[:, :, None], 3, axis=2).astype(np.uint8)
    df2 = spark.createDataFrame(
        [(3, bytearray(encode_bmp(shifted)))], "doc_id long, payload binary"
    )
    assert image_dhash(df2).collect()[0]["dhash"] == expect

"""Property-based tests (hypothesis) for operator invariants.

Few examples per property (Spark round-trips are slow) but arbitrary
shapes: these catch boundary cases fixed fixtures don't — empty
groups, all-ties, single rows, negative values.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.text import poly_hash
from dbt_lakehouse_aws_spark.operators.windows import global_row_number
from dbt_lakehouse_aws_spark.sources.snapshots import latest_snapshot

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 10_000)),
        min_size=1, max_size=300, unique_by=lambda t: t[1],
    )
)
def test_global_row_number_equals_naive_window(spark, rows):
    df = spark.createDataFrame(rows, "k int, uid int")
    fast = global_row_number(df, [F.desc("k"), F.asc("uid")], name="rn", num_partitions=4)
    naive = df.withColumn(
        "rn2", F.row_number().over(Window.orderBy(F.desc("k"), F.asc("uid"))).cast("long")
    )
    merged = fast.join(naive, ["k", "uid"])
    assert merged.filter(F.col("rn") != F.col("rn2")).count() == 0


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.text(min_size=0, max_size=5)),
        min_size=1, max_size=100,
    )
)
def test_latest_snapshot_keeps_exactly_max_key_rows(spark, rows):
    df = spark.createDataFrame(rows, "k int, payload string")
    out = latest_snapshot(df, "k").collect()
    mx = max(k for k, _ in rows)
    assert len(out) == sum(1 for k, _ in rows if k == mx)
    assert all(r["k"] == mx for r in out)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
        ),
        min_size=1, max_size=30,
    )
)
def test_poly_hash_matches_python_reference(spark, texts):
    """The portable fingerprint must equal a straight Python
    evaluation of its definition — the property that makes it an
    engine-independent oracle."""
    mults = [31**i for i in range(8)]

    def py_hash(s: str) -> int:
        return sum(ord(ch) * mults[i % 8] for i, ch in enumerate(s))

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r["i"]: r["h"] for r in df.select("i", poly_hash("text").alias("h")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_hash(t), repr(t)


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=12
            ),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_paragraph_dedup_invariants(spark, docs):
    """Union of kept paragraphs == distinct paragraph set; kept ≤
    total per doc; reassembled text only contains the doc's own
    paragraphs in original order."""
    from dbt_lakehouse_aws_spark.llmops.dedup import paragraph_dedup

    rows = [(i, " ".join(words)) for i, words in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(df, chunk_tokens=2).collect()
    by_id = {r["doc_id"]: r for r in out}
    texts = dict(rows)
    all_paras = set()
    for i, words in docs:
        toks = texts[i].split(" ")
        paras = [" ".join(toks[j : j + 2]) for j in range(0, len(toks), 2)]
        all_paras.update(paras)
        r = by_id[i]
        assert r["kept_paras"] <= r["total_paras"] == len(paras)
        kept_seq = r["dedup_text"].split(" ") if r["dedup_text"] else []
        # kept text is a subsequence of the original token stream
        it = iter(toks)
        assert all(t in it for t in kept_seq)
    # every distinct paragraph survives exactly once corpus-wide
    kept_all = []
    for r in out:
        toks = r["dedup_text"].split(" ") if r["dedup_text"] else []
        kept_all.extend(" ".join(toks[j : j + 2]) for j in range(0, len(toks), 2))
    assert sorted(kept_all) == sorted(all_paras)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 100), st.integers(0, 50)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_interval_union_bounds(spark, rows):
    """0 < union_len ≤ Σ lengths, and union_len ≥ max single length;
    islands ≤ n intervals (per single key)."""
    from dbt_lakehouse_aws_spark.operators.windows import interval_union_length

    iv = [(1, s, s + d + 1) for _, s, d in rows]
    df = spark.createDataFrame(iv, "k long, s long, e long")
    out = interval_union_length(df, key_cols=["k"], start_col="s", end_col="e").collect()[0]
    lens = [e - s for _, s, e in iv]
    assert out["union_len"] <= sum(lens)
    assert out["union_len"] >= max(lens)
    assert 1 <= out["n_islands"] <= len(iv)


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=50
    )
)
def test_ewma_within_value_range(spark, vals):
    """EWMA is a convex combination: min(v) ≤ ewma ≤ max(v)."""
    from dbt_lakehouse_aws_spark.operators.temporal import ewma_last

    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, seq long, v double").withColumn(
        "ts", F.timestamp_micros(F.col("seq") * 1_000_000)
    )
    out = ewma_last(df, key_cols=["k"], ts_col="ts", value_col="v", alpha=0.4).collect()[0]
    assert min(vals) - 1e-6 <= out["ewma"] <= max(vals) + 1e-6
    assert out["n_events"] == len(vals)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"),
                      st.lists(st.integers(0, 30), min_size=1, max_size=5, unique=True),
                      st.integers(-100, 100)),
            st.tuples(st.just("delete"), st.integers(0, 30), st.integers(0, 30)),
            st.tuples(st.just("append"),
                      st.lists(st.integers(100, 130), min_size=1, max_size=3, unique=True),
                      st.integers(-100, 100)),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_acid_table_matches_reference_model(spark, tmp_path_factory, ops):
    """Model-based ACID check: a random sequence of merge / delete /
    append commits must leave the table equal to a plain dict model
    at EVERY version (time travel included)."""
    from dbt_lakehouse_aws_spark.sources.acid import AcidTable

    tmp = tmp_path_factory.mktemp("acid_model")
    t = AcidTable(spark, str(tmp / "t"))

    def mkdf(rows):
        return spark.createDataFrame(rows, "id bigint, value bigint")

    model: dict[int, int] = {i: i * 10 for i in range(20)}
    t.write(mkdf(list(model.items())).repartition(3))
    versions = [dict(model)]

    for op in ops:
        if op[0] == "merge":
            _, keys, val = op
            rows = [(k, val + k) for k in keys]
            t.merge(mkdf(rows), ["id"])
            model.update(dict(rows))
        elif op[0] == "delete":
            _, lo, span = op
            t.delete(f"id BETWEEN {lo} AND {lo + span}")
            model = {k: v for k, v in model.items() if not (lo <= k <= lo + span)}
        else:
            _, keys, val = op
            rows = [(k, val) for k in keys if k not in model]
            if not rows:
                continue
            t.write(mkdf(rows), mode="append")
            model.update(dict(rows))
        versions.append(dict(model))

    for v, expect in enumerate(versions):
        got = {r["id"]: r["value"] for r in t.read(version=v).collect()}
        assert got == expect, f"version {v} diverged"


# ---------------------------------------------------------------------------
# codec properties — pure Python, no Spark, so examples are cheap
# ---------------------------------------------------------------------------

_avro_record = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": st.one_of(st.none(), st.text(max_size=40)),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "flag": st.booleans(),
        "raw": st.binary(max_size=64),
        "tags": st.lists(st.text(max_size=10), max_size=8),
        "props": st.dictionaries(st.text(min_size=1, max_size=8), st.integers(-1000, 1000), max_size=5),
    }
)

_AVRO_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
    ]}


@settings(max_examples=150, deadline=None)
@given(records=st.lists(_avro_record, max_size=20), codec=st.sampled_from(["null", "deflate"]))
def test_avro_container_roundtrip_property(records, codec):
    """write_container ∘ read_container = identity for arbitrary
    records over every supported type, both codecs — unicode strings,
    empty containers, ±2^62 longs, empty arrays/maps included."""
    from dbt_lakehouse_aws_spark.sources.avro_io import read_container, write_container

    _schema, out = read_container(write_container(_AVRO_SCHEMA, records, codec=codec))
    assert out == records


@settings(max_examples=150, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 4),
)
def test_wav_roundtrip_property(samples, rate, channels):
    """encode_wav ∘ decode_wav = identity for arbitrary int16 frames,
    rates, and channel counts (frame count truncates to whole
    frames)."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_wav, encode_wav

    n_frames = len(samples) // channels
    arr = np.array(samples[: n_frames * channels], dtype=np.int16).reshape(
        n_frames, channels
    )
    wav = decode_wav(encode_wav(arr, rate))
    assert wav["sample_rate"] == rate and wav["channels"] == channels
    assert np.array_equal(wav["samples"], arr)


@settings(max_examples=60, deadline=None)
@given(
    shape=st.tuples(st.integers(0, 4), st.integers(1, 6), st.integers(1, 7)),
    seed=st.integers(0, 2**31),
)
def test_avi_roundtrip_property(shape, seed):
    """encode_avi ∘ decode_avi = identity for arbitrary frame counts
    and dims (incl. widths needing row padding and zero frames)."""
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_avi, encode_avi

    n, h, w = shape
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    out = decode_avi(encode_avi(frames))
    assert out["n_frames"] == n and out["width"] == w and out["height"] == h
    assert np.array_equal(out["frames"], frames)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.text(min_size=0, max_size=12)),
        min_size=1,
        max_size=120,
    ),
    seed=st.integers(0, 2**31),
)
def test_table_digest_permutation_invariant_multiset_sensitive(spark, rows, seed):
    """For ANY multiset: digest is identical under permutation and
    repartitioning; appending one extra arbitrary row changes it."""
    import random

    from dbt_lakehouse_aws_spark.operators.relational import table_digest

    df1 = spark.createDataFrame(rows, "k long, v string").repartition(3)
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "k long, v string").repartition(5)
    d1 = table_digest(df1).collect()[0]
    d2 = table_digest(df2).collect()[0]
    assert (d1["n_rows"], d1["digest"]) == (d2["n_rows"], d2["digest"])

    extra = spark.createDataFrame(rows + [rows[0]], "k long, v string")
    d3 = table_digest(extra).collect()[0]
    assert d3["n_rows"] == d1["n_rows"] + 1
    assert d3["digest"] != d1["digest"] or d1["digest"] == 0  # hash-sum moved


@settings(**SETTINGS)
@given(
    vals=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=200),
)
def test_cms_point_estimates_never_under_any_input(spark, vals):
    """CMS never underestimates, for arbitrary value multisets."""
    from dbt_lakehouse_aws_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = count_min_sketch(df, value_col="v", depth=3, width=16, portable=True)
    est = {
        r["value"]: r["est_count"]
        for r in cms_estimate(
            sk, df.select("v").distinct(), value_col="v", depth=3, width=16,
            portable=True,
        ).collect()
    }
    from collections import Counter

    exact = Counter(vals)
    assert all(est[v] >= c for v, c in exact.items())


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 10_000), st.integers(-1000, 1000)),
        min_size=1, max_size=300, unique_by=lambda t: t[1],
    )
)
def test_prefix_sum_equals_naive_window(spark, rows):
    """prefix_sum == Window.orderBy running sum on arbitrary shapes —
    duplicate order keys (tiebroken by uid), negative values, single
    rows."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    df = spark.createDataFrame(rows, "k int, uid int, v long")
    fast = prefix_sum(df, [F.asc("k"), F.asc("uid")], "v", name="cum", num_partitions=4)
    w = Window.orderBy(F.asc("k"), F.asc("uid")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = df.withColumn("cum2", F.sum("v").over(w))
    merged = fast.join(naive, ["k", "uid", "v"])
    assert merged.filter(F.col("cum") != F.col("cum2")).count() == 0
    assert merged.count() == len(rows)


@settings(**SETTINGS)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 60), st.integers(-5, 5)),
        min_size=0, max_size=60, unique_by=lambda t: t[0],
    ),
    drop_mod=st.integers(2, 7),
    bump_mod=st.integers(2, 7),
)
def test_table_diff_partitions_keyspace(spark, base, drop_mod, bump_mod):
    """diff classes partition the union keyspace, counts reconcile
    with the mutation rule, and diff(a, a) is all-unchanged."""
    from dbt_lakehouse_aws_spark.operators.relational import table_diff

    a = spark.createDataFrame(base + [(-1, 0)], "k long, v long")
    # b: drop k%drop_mod==0, bump v for k%bump_mod==1
    b_rows = [
        (k, v + 1 if k % bump_mod == 1 else v)
        for k, v in base + [(-1, 0)]
        if k % drop_mod != 0
    ] + [(10_000, 1)]
    b = spark.createDataFrame(b_rows, "k long, v long")
    d = {r["k"]: r["diff_status"] for r in table_diff(a, b, keys=["k"]).collect()}
    all_keys = {k for k, _ in base} | {-1, 10_000}
    assert set(d) == all_keys
    for k, v in base + [(-1, 0)]:
        if k % drop_mod == 0:
            assert d[k] == "removed", k
        elif k % bump_mod == 1:
            assert d[k] == "changed", k
        else:
            assert d[k] == "unchanged", k
    assert d[10_000] == "added"
    same = table_diff(a, a, keys=["k"])
    assert same.filter(F.col("diff_status") != "unchanged").count() == 0


def test_prefix_sum_int_column_offsets_do_not_overflow(spark):
    """Regression: an INT value column whose per-partition totals
    exceed int32 must still produce exact long cumulative sums (the
    offset frame takes the aggregate's widened type)."""
    from dbt_lakehouse_aws_spark.operators.windows import prefix_sum

    n = 50_000
    df = spark.range(n).select(
        F.col("id"), F.lit(100_000).cast("int").alias("v")  # total 5e9 > int32
    )
    out = prefix_sum(df, [F.asc("id")], "v", name="cum", num_partitions=8)
    top = out.agg(F.max("cum")).collect()[0][0]
    assert top == n * 100_000


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 9)),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_isotonic_fit_properties(spark, pts):
    """PAV invariants on arbitrary integer (y_sum, w) series: the
    fitted sequence is non-decreasing, weighted means are preserved
    overall (Σ fitted·w ≈ Σ y — exact up to the floor quantization),
    and a constant series is a fixed point."""
    from dbt_lakehouse_aws_spark.llmops.mlfit import isotonic_fit

    rows = [("g", f"{i:03d}", s, w) for i, (s, w) in enumerate(pts)]
    df = spark.createDataFrame(rows, "grp string, x string, s long, w long")
    out = sorted(
        (
            (r["x"], r["fitted_q"], r["w"])
            for r in isotonic_fit(
                df, group_cols=["grp"], x_col="x", y_sum_col="s", w_col="w"
            ).collect()
        )
    )
    fitted = [f for _, f, _ in out]
    assert fitted == sorted(fitted), "fit must be non-decreasing"
    # mass preservation: each pool's fitted*weight reproduces its y
    # mass up to 1 quantum per row from the floor
    total_fit = sum(f * w for _, f, w in out)
    total_y = sum(s for s, _ in pts) * 1_000_000
    slack = sum(w for _, w in pts)
    assert total_y - slack <= total_fit <= total_y


@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=40))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bloom_prefilter_never_drops_true_keys(spark, keys):
    """No false negatives for ANY int64 keyset (including negatives
    and duplicates) at minimal bitmap sizing."""
    from dbt_lakehouse_aws_spark.operators.bloomjoin import (
        bloom_bitmap,
        bloom_prefilter,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bitmap = bloom_bitmap(df, "k", m_bits=1 << 12)
    assert bloom_prefilter(df, "k", bitmap, m_bits=1 << 12).count() == len(keys)


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=6, max_size=30),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_filter_jaccard_lossless_random_texts(spark, texts):
    """Prefix filtering equals the all-shingle join on adversarially
    tiny random corpora (degenerate docs, repeated shingles, near-
    empty prefixes)."""
    from dbt_lakehouse_aws_spark.llmops.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert got == want


@given(
    st.text(alphabet="abc xyz.", max_size=400),
    st.integers(2, 40),
    st.integers(1, 40),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_overlap_reconstructs_source(spark, text, size, stride_raw):
    """Concatenating each chunk's first `stride` chars (all of the
    last chunk) reproduces the document byte-for-byte, for any
    text/size/stride — the no-loss/no-duplication contract."""
    from dbt_lakehouse_aws_spark.llmops.corpus import chunk_overlap

    stride = min(stride_raw, size)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_ix"], r["chunk_text"])
        for r in chunk_overlap(
            df, text_col="text", size=size, stride=stride
        ).collect()
    )
    rebuilt = "".join(
        (t[:stride] if ix < len(chunks) - 1 else t) for ix, t in chunks
    )
    # overlap windows may extend past the stride point of the LAST
    # chunk's predecessor; slicing to stride removes exactly the
    # overlap, so equality is exact
    assert rebuilt == text


@given(st.text(alphabet="ab é中\n.", max_size=300))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cdc_chunks_match_reference(spark, text):
    """cdc_chunks equals a from-scratch pure-Python reference on
    arbitrary text including non-ASCII (exercising the codepoint
    fallback) and newlines; chunk lengths always sum to len(text)."""
    from dbt_lakehouse_aws_spark.llmops.corpus import (
        CDC_BASE,
        CDC_DIV,
        CDC_MOD,
        CDC_WINDOW,
        cdc_chunks,
    )

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r["chunk_ix"], r["chunk_len"])
        for r in cdc_chunks(df, id_cols=["doc_id"], text_col="text").collect()
    )

    n = len(text)
    ends = []
    for i in range(CDC_WINDOW, n + 1):
        h = (
            sum(
                ord(text[i - CDC_WINDOW + k])
                * pow(CDC_BASE, CDC_WINDOW - 1 - k, CDC_MOD)
                for k in range(CDC_WINDOW)
            )
            % CDC_MOD
        )
        if h % CDC_DIV == 0:
            ends.append(i)
    if n == 0:
        bounds = [0]
    elif not ends or ends[-1] != n:
        bounds = ends + [n]
    else:
        bounds = ends
    want, prev = [], 0
    for ix, e in enumerate(bounds):
        want.append((ix, e - prev))
        prev = e
    assert got == want
    assert sum(ln for _, ln in got) == n


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quantile_normalize_order_and_size(spark, rows):
    """For ANY grouped integer multiset: per-group row counts are
    preserved, the mapping is monotone within each group, and every
    normalized value is an actual pooled value."""
    from dbt_lakehouse_aws_spark.llmops.features import quantile_normalize

    df = spark.createDataFrame(
        [(f"g{g}", i, v) for i, (g, v) in enumerate(rows)],
        "g string, id long, v long",
    )
    out = quantile_normalize(
        df, group_col="g", value_col="v", tie_cols=["id"]
    ).collect()
    assert len(out) == len(rows)
    pooled = sorted(v for _, v in rows)
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append((r["group_rank"], r["qn_value"]))
        assert r["qn_value"] in pooled
    for chunks in by_group.values():
        chunks.sort()
        fitted = [q for _, q in chunks]
        assert fitted == sorted(fitted)


@given(st.lists(st.integers(-20, 20), min_size=2, max_size=40))
@settings(max_examples=50, deadline=None)
def test_half_unit_midranks_match_brute_force(values):
    """The 2×rank integer device used by mann_whitney_by_type and
    spearman_qty_price: rank2(v) = 2·cum_before(v) + cnt(v) + 1 must
    equal twice the classic average midrank of v for ANY multiset."""
    from collections import Counter

    cnt = Counter(values)
    # brute-force midranks: positions are 1..n over the sorted list
    ordered = sorted(values)
    pos_by_value = {}
    for i, v in enumerate(ordered, start=1):
        pos_by_value.setdefault(v, []).append(i)
    cum_before = 0
    for v in sorted(cnt):
        rank2 = 2 * cum_before + cnt[v] + 1
        midrank = sum(pos_by_value[v]) / len(pos_by_value[v])
        assert rank2 == 2 * midrank
        cum_before += cnt[v]


@given(
    st.lists(
        st.tuples(st.integers(0, 999), st.integers(1, 99)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_packed_argmin_resolves_min_then_key(pairs):
    """spatial_grid_nn's packed argmin (d²·radix + key) must pick
    the smallest distance and break exact-distance ties on the
    smaller key, for any candidate set."""
    radix = 100
    packed = min(d * radix + k for d, k in pairs)
    best_d, best_k = packed // radix, packed % radix
    min_d = min(d for d, _ in pairs)
    assert best_d == min_d
    assert best_k == min(k for d, k in pairs if d == min_d)


@given(
    st.lists(st.tuples(st.integers(0, 9), st.booleans()), min_size=2, max_size=60)
)
@settings(max_examples=50, deadline=None)
def test_stump_cumulative_scoring_matches_partition_enumeration(rows):
    """decision_stump_orders' cumulative-count Gini scoring must
    equal directly partitioning the rows at each candidate bin."""
    from collections import Counter

    bins = sorted({b for b, _ in rows})
    if len(bins) < 2:
        return
    pos = Counter(b for b, lab in rows if lab)
    neg = Counter(b for b, lab in rows if not lab)
    n = len(rows)

    def gini_side(p, g):
        m = p + g
        return 1 - (p * p + g * g) / (m * m) if m else 0.0

    for t in bins[:-1]:
        # enumeration
        lp = sum(1 for b, lab in rows if b <= t and lab)
        lg = sum(1 for b, lab in rows if b <= t and not lab)
        rp = sum(1 for b, lab in rows if b > t and lab)
        rg = n - lp - lg - rp
        direct = ((lp + lg) * gini_side(lp, lg) + (rp + rg) * gini_side(rp, rg)) / n
        # cumulative-count formula as written in the query
        pl = sum(v for b, v in pos.items() if b <= t)
        gl = sum(v for b, v in neg.items() if b <= t)
        pt, gt = sum(pos.values()), sum(neg.values())
        pr, gr = pt - pl, gt - gl
        wgini = 1 - ((pl * pl + gl * gl) / (pl + gl) + (pr * pr + gr * gr) / (pr + gr)) / (pt + gt)
        assert abs(direct - wgini) < 1e-12


@given(
    st.lists(st.tuples(st.booleans(), st.integers(1, 20)), min_size=1, max_size=40)
)
@settings(max_examples=60, deadline=None)
def test_fifo_interval_matching_equals_queue_simulation(lots):
    """fifo_match_returns_parts' core claim: FIFO matching computed
    as interval intersection of cumulative quantities equals the
    classic sequential pop-the-queue algorithm, for ANY lot
    sequence."""
    buys = [(i, q) for i, (is_sell, q) in enumerate(lots) if not is_sell]
    sells = [(i, q) for i, (is_sell, q) in enumerate(lots) if is_sell]

    # interval algebra (the engine's formulation)
    algebra = {}
    b_end = 0
    b_iv = []
    for bid, q in buys:
        b_iv.append((bid, b_end, b_end + q))
        b_end += q
    s_end = 0
    for sid, q in sells:
        s0, s1 = s_end, s_end + q
        s_end += q
        for bid, b0, b1 in b_iv:
            m = min(b1, s1) - max(b0, s0)
            if m > 0:
                algebra[(bid, sid)] = m

    # sequential queue simulation
    queue = [[bid, q] for bid, q in buys]
    sim = {}
    qi = 0
    for sid, need in sells:
        while need > 0 and qi < len(queue):
            bid, avail = queue[qi]
            take = min(avail, need)
            if take > 0:
                sim[(bid, sid)] = sim.get((bid, sid), 0) + take
                queue[qi][1] -= take
                need -= take
            if queue[qi][1] == 0:
                qi += 1

    assert algebra == sim


@given(
    st.integers(0, 10_000_000),
    st.lists(st.integers(1, 50), min_size=1, max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_largest_remainder_allocation_invariants(total, weights):
    """largest_remainder_allocation's contract: allocations sum to
    the exact total, and every line is within one cent of its exact
    proportional share (the Hamilton method's defining property)."""
    qsum = sum(weights)
    base = [total * q // qsum for q in weights]
    rems = [total * q % qsum for q in weights]
    deficit = total - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rems[i], i))
    alloc = list(base)
    for i in order[:deficit]:
        alloc[i] += 1
    assert sum(alloc) == total
    for q, a in zip(weights, alloc):
        assert abs(a - total * q / qsum) < 1

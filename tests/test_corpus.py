"""Corpus construction: deterministic sampling + sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.corpus import (
    MERSENNE31,
    deterministic_sample,
    pack_sequences,
    portable_hash,
    stratified_sample,
)


def test_deterministic_sample_stable_and_unbiased(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in deterministic_sample(df, id_col="doc_id", fraction=0.3).collect()}
    # repartitioning must NOT change membership (df.sample would)
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(
            df.repartition(7), id_col="doc_id", fraction=0.3
        ).collect()
    }
    assert s1 == s2
    assert 0.28 < len(s1) / 20_000 < 0.32
    # nested: a 10% sample is a subset of the 30% sample (same hash order)
    s3 = {r["doc_id"] for r in deterministic_sample(df, id_col="doc_id", fraction=0.1).collect()}
    assert s3 < s1


def test_portable_hash_range(spark):
    rows = spark.range(0, 1000).select(portable_hash(F.col("id")).alias("h")).collect()
    assert all(0 <= r["h"] < MERSENNE31 for r in rows)


def test_stratified_sample_balanced(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(df, strata=["lang"], k=10, id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 10, "fr": 10}
    # deterministic: same rows every run
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, strata=["lang"], k=10, id_col="doc_id").collect())
    assert a == b


def test_pack_sequences_hand_computed(spark):
    # tokens per doc in id order: 300, 300, 500 → starts 0, 300, 600
    # budget 512: docs 1,2 start in chunk 0; doc 3 starts in chunk 1
    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 500)], "doc_id long, toks long"
    )
    got = {
        r["chunk_id"]: (r["n_docs"], r["chunk_tokens"])
        for r in pack_sequences(df, token_col="toks", budget=512, id_col="doc_id").collect()
    }
    assert got == {0: (2, 600), 1: (1, 500)}


def test_sample_by_rates_per_stratum_and_nested(spark):
    from dbt_lakehouse_aws_spark.llmops.corpus import sample_by_rates

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(30_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sample_by_rates(
        df, stratum_col="lang", rates={"en": 0.5, "fr": 0.1},
        default_rate=0.25, id_col="doc_id",
    )
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.46 < counts["en"] / 10_000 < 0.54
    assert 0.08 < counts["fr"] / 10_000 < 0.12
    assert 0.22 < counts["de"] / 10_000 < 0.28
    # shared hash order → raising one stratum's rate only ADDS rows there
    more = sample_by_rates(
        df, stratum_col="lang", rates={"en": 0.7, "fr": 0.1},
        default_rate=0.25, id_col="doc_id",
    )
    a = {r["doc_id"] for r in got.collect()}
    b = {r["doc_id"] for r in more.collect()}
    assert a < b


def test_group_split_no_leakage_and_determinism(spark):
    """Every row of a group shares one split; assignment is stable
    across runs; weights must sum to 1."""
    import pytest

    from dbt_lakehouse_aws_spark.llmops.corpus import group_split

    rows = [(i, f"site{i % 37}") for i in range(600)]
    df = spark.createDataFrame(rows, "row_id long, site string")
    out = group_split(df, group_col="site")
    per_group = (
        out.groupBy("site").agg(F.countDistinct("split").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in per_group)
    again = {(r["row_id"], r["split"]) for r in group_split(df, group_col="site").collect()}
    assert again == {(r["row_id"], r["split"]) for r in out.collect()}
    splits = {r["split"] for r in out.collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    with pytest.raises(ValueError, match="sum to 1"):
        group_split(df, group_col="site", splits=(("a", 0.5), ("b", 0.4)))
    # a different salt re-deals groups
    resalted = group_split(df, group_col="site", salt="split-v2")
    pairs_a = {(r["site"], r["split"]) for r in out.select("site", "split").distinct().collect()}
    pairs_b = {(r["site"], r["split"]) for r in resalted.select("site", "split").distinct().collect()}
    assert pairs_a != pairs_b


def test_temperature_mix_flattens_and_meets_budget(spark):
    """α<1 boosts the tail stratum's keep-rate above the head's;
    expected kept ≈ budget; α=1 reduces to proportional sampling;
    oversized budgets clamp rates at 1 (keep everything)."""
    from dbt_lakehouse_aws_spark.llmops.corpus import temperature_mix

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(
        df, stratum_col="lang", id_col="doc_id", alpha=0.5, budget_rows=400
    )
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    total = sum(by.values())
    assert abs(total - 400) / 400 < 0.2, by
    # α=0.5 boost: tail share 0.1 → q .316 vs head .949; tail keep-rate
    # ≈ 3× its proportional share, so tail kept count must exceed
    # proportional (400 * 0.1 = 40) clearly
    assert by["tail"] > 60, by
    # clamp: budget larger than corpus keeps every row
    assert (
        temperature_mix(
            df, stratum_col="lang", id_col="doc_id", alpha=0.5, budget_rows=10_000
        ).count()
        == 1000
    )
    # determinism
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in temperature_mix(
            df, stratum_col="lang", id_col="doc_id", alpha=0.5, budget_rows=400
        ).collect()
    }
    assert a == b


def test_write_training_shards_roundtrip_verifies(spark, tmp_path):
    """Export → independent re-read → recomputed per-shard digests
    match the shipped manifest; tampering one shard's data is caught
    by exactly that shard's digest."""
    from dbt_lakehouse_aws_spark.llmops.corpus import (
        shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(500)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, path, id_col="doc_id", n_shards=4, digest_cols=["doc_id", "text"]
    )
    shipped = {r["shard"]: (r["n_rows"], r["digest"]) for r in manifest.collect()}
    assert set(shipped) == {0, 1, 2, 3}
    assert sum(n for n, _ in shipped.values()) == 500

    landed = spark.read.parquet(path)
    recomputed = shard_manifest(
        landed.select("doc_id", "text"),
        id_col="doc_id",
        n_shards=4,
        digest_cols=["doc_id", "text"],
    )
    assert {
        r["shard"]: (r["n_rows"], r["digest"]) for r in recomputed.collect()
    } == shipped
    # persisted manifest matches too
    stored = spark.read.parquet(path + "_manifest")
    assert {
        r["shard"]: (r["n_rows"], r["digest"]) for r in stored.collect()
    } == shipped

    # tamper one row in shard 0's data → only shard 0's digest moves
    tampered = landed.withColumn(
        "text",
        F.when(
            (F.col("shard") == 0) & (F.col("doc_id") == landed.filter("shard = 0").agg(F.min("doc_id")).collect()[0][0]),
            F.lit("TAMPERED"),
        ).otherwise(F.col("text")),
    )
    bad = {
        r["shard"]: r["digest"]
        for r in shard_manifest(
            tampered.select("doc_id", "text"),
            id_col="doc_id",
            n_shards=4,
            digest_cols=["doc_id", "text"],
        ).collect()
    }
    assert bad[0] != shipped[0][1]
    assert all(bad[s] == shipped[s][1] for s in (1, 2, 3))

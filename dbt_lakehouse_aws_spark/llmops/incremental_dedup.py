"""Incremental corpus deduplication against a persisted MinHash index.

The one-shot pipelines in :mod:`~dbt_lakehouse_aws_spark.llmops.dedup`
answer "dedup THIS corpus". A production training-data pipeline gets
the corpus in batches (a crawl snapshot per week, a landing directory
per day) and must answer "which of these NEW documents are near-dups
of anything we have EVER accepted" — without rescanning, re-shingling,
or re-signing 100 TB of history per batch.

The index this module persists is the LSH banding table itself:
``(doc_id, band, bucket, signature)`` rows in an
:class:`~dbt_lakehouse_aws_spark.sources.acid.AcidTable` (atomic
appends, snapshot isolation, time travel — a batch that fails midway
never half-updates the index, and an index snapshot pins exactly which
history a batch was deduped against). Per accepted doc that's
``num_bands`` rows of 4 longs — ~0.3% of the raw text volume at
typical document sizes, the standard LSH state trade.

Batch cost: signature + banding over the NEW docs only, one equi-join
on (band, bucket) against the index (shuffle sized by band-key
collisions, never history×batch), the usual within-batch LSH pass,
and one ACID append of the survivors' band rows. All collision
verification reuses the signature columns carried on both sides.

No reference parity: the reference warehouse has no dedup at all;
this is engine-native infrastructure for the 100 TB corpus case.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lakehouse_aws_spark.llmops.dedup import (
    banded_signatures,
    connected_components,
    lsh_pairs_from_banded,
    minhash_signatures,
)
from dbt_lakehouse_aws_spark.localframe import local_frame
from dbt_lakehouse_aws_spark.sources.acid import AcidTable


@dataclass(frozen=True)
class BatchDedupResult:
    """What happened to one ingested batch."""

    survivors: DataFrame  #: new docs accepted into the corpus
    dup_of_history: DataFrame  #: (doc_id, matched_id, est_jaccard) vs index
    batch_dups: DataFrame  #: (doc_id, matched_id) folded within the batch
    index_version: int  #: ACID snapshot the survivors were appended in


class MinHashDedupIndex:
    """Persisted banded-MinHash index with batch-ingest dedup.

    Parameters mirror :func:`minhash_signatures` /
    :func:`lsh_candidate_pairs`; they are FROZEN into the index's
    first commit and re-validated on every later batch — mixing band
    counts or shingle widths across batches would silently break
    bucket-key compatibility, so it raises instead.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 32,
        num_bands: int = 8,
        est_threshold: float = 0.5,
        portable: bool = False,
    ) -> None:
        if num_hashes % num_bands != 0:
            raise ValueError("num_hashes must divide evenly into num_bands")
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        self.params = {
            "n": n,
            "num_hashes": num_hashes,
            "num_bands": num_bands,
            "portable": portable,
        }
        self.est_threshold = est_threshold
        self._table = AcidTable(spark, path)
        self._params_table = AcidTable(spark, path.rstrip("/") + "_params")
        if self._params_table.exists():
            stored = {
                r["key"]: r["value"]
                for r in self._params_table.read().collect()
            }
            mine = {k: str(v) for k, v in self.params.items()}
            if stored != mine:
                raise ValueError(
                    f"index at {path} was built with {stored}, "
                    f"incompatible with requested {mine}"
                )

    # -- internals ---------------------------------------------------------

    def _signatures(self, docs: DataFrame) -> DataFrame:
        return minhash_signatures(
            docs,
            id_col=self.id_col,
            text_col=self.text_col,
            n=self.params["n"],
            num_hashes=self.params["num_hashes"],
            portable=self.params["portable"],
        )

    def _banded(self, signatures: DataFrame) -> DataFrame:
        return banded_signatures(
            signatures, id_col=self.id_col, num_bands=self.params["num_bands"]
        )

    def _persist_params(self) -> None:
        rows = [(k, str(v)) for k, v in self.params.items()]
        self._params_table.write(
            local_frame(self.spark, rows, "key string, value string")
        )

    # -- public API --------------------------------------------------------

    def exists(self) -> bool:
        return self._table.exists()

    def index_size(self) -> int:
        """Accepted documents currently indexed."""
        if not self.exists():
            return 0
        return (
            self._table.read().select(self.id_col).distinct().count()
        )

    def ingest_batch(self, docs: DataFrame) -> BatchDedupResult:
        """Dedup ``docs`` against history + within the batch, then
        atomically append the survivors' band rows to the index.

        History matches are verified the same way the one-shot
        pipeline verifies candidates: bucket collision proposes, the
        signature-agreement estimate ≥ ``est_threshold`` confirms.
        Within-batch resolution keeps the min-id member per duplicate
        component (:func:`dedup_survivors` semantics). A doc that is
        both a history-dup and a batch-dup counts as a history-dup.
        """
        sigs = self._signatures(docs).localCheckpoint()
        # band ONCE per batch: the same exploded table serves the
        # history probe, the within-batch pair join, and the survivor
        # append (round 10, guide §1.2 — it was re-derived from sigs
        # three times, one explode per consumer)
        banded_new = self._banded(sigs)

        if self.exists():
            idx = self._table.read()
            # scale lever: the batch's distinct (band, bucket) keys are
            # bounded by batch size — broadcast them and semi-prune the
            # index BEFORE the equi-join, so only the index rows that
            # actually collide with this batch enter the shuffle (the
            # full index is scanned once but never moved; collisions
            # are sparse by LSH design).
            batch_keys = banded_new.select("band", "bucket").distinct()
            idx_pruned = idx.join(
                F.broadcast(batch_keys), ["band", "bucket"], "left_semi"
            )
            hist = (
                banded_new.alias("n")
                .join(idx_pruned.alias("i"), ["band", "bucket"])
                .filter(F.col(f"n.{self.id_col}") != F.col(f"i.{self.id_col}"))
            )
            est = (
                F.size(
                    F.filter(
                        F.zip_with("n.signature", "i.signature", lambda x, y: x == y),
                        lambda m: m,
                    )
                ).cast("double")
                / F.size("n.signature")
            )
            dup_of_history = (
                hist.withColumn("est_jaccard", F.round(est, 6))
                .filter(F.col("est_jaccard") >= self.est_threshold)
                .groupBy(F.col(f"n.{self.id_col}").alias(self.id_col))
                .agg(
                    F.min(F.col(f"i.{self.id_col}")).alias("matched_id"),
                    F.max("est_jaccard").alias("est_jaccard"),
                )
                .localCheckpoint()
            )
        else:
            # derive the id type from the incoming docs — corpora
            # with string doc ids must not get a long-typed empty
            # frame feeding the left_anti join (ADVICE r3)
            from pyspark.sql.types import StructField, StructType, DoubleType

            id_type = docs.schema[self.id_col].dataType
            dup_of_history = local_frame(
                self.spark,
                [],
                StructType(
                    [
                        StructField(self.id_col, id_type),
                        StructField("matched_id", id_type),
                        StructField("est_jaccard", DoubleType()),
                    ]
                ),
            )

        # plain left_anti (no forced broadcast): the dup set is
        # bounded by batch size, which can itself be large; AQE picks
        # broadcast when it fits.
        fresh = docs.join(dup_of_history.select(self.id_col), self.id_col, "left_anti")
        banded_fresh = banded_new.join(
            dup_of_history.select(self.id_col), self.id_col, "left_anti"
        )
        pairs = lsh_pairs_from_banded(
            banded_fresh,
            id_col=self.id_col,
            est_threshold=self.est_threshold,
        )
        # within-batch resolution, exposing the loser→survivor mapping
        # (same min-id-per-component semantics as dedup_survivors)
        comps = connected_components(pairs, a_col="doc_a", b_col="doc_b")
        batch_dups = (
            comps.filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias(self.id_col),
                F.col("component").alias("matched_id"),
            )
            .localCheckpoint()
        )
        survivors = fresh.join(
            batch_dups.select(self.id_col), self.id_col, "left_anti"
        )

        surv_banded = banded_fresh.join(
            survivors.select(self.id_col), self.id_col, "left_semi"
        )
        # the index is joined on hashed (band, bucket) keys — min/max
        # footer stats can never prune it, so skip the stats job on
        # every append (collect_stats=False is read-safe: statless
        # files are simply unprunable)
        if not self.exists():
            self._persist_params()
            snap = self._table.write(surv_banded, collect_stats=False)
        else:
            snap = self._table.write(
                surv_banded, mode="append", collect_stats=False
            )
        return BatchDedupResult(
            survivors=survivors,
            dup_of_history=dup_of_history,
            batch_dups=batch_dups,
            index_version=snap.version,
        )

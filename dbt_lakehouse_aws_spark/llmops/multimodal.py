"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct alongside. The decode / feature-extraction step runs
as Arrow-batched ``mapInPandas`` — the Spark-side contract (schema,
batching, partitioning) is real and tested; the actual media decode
is stubbed (codec libraries are not in this container) behind
``decode_stub`` / ``NotImplementedError`` as clearly marked below.

Scale notes: payload rows are heavy, so the pattern is
(1) keep payloads out of shuffles — derive features early, drop the
bytes, shuffle only features; (2) ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds per-batch memory for multi-MB payloads;
(3) repartition by size-class before decode so a handful of huge
videos can't skew one task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of the feature frame produced by :func:`extract_binary_features`
BINARY_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("modality", StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", modality: str = "blob"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct.

    In production the payload comes off the lake (image bytes etc.);
    here we encode the text column so the plumbing is exercised with
    deterministic data.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.col(text_col)).alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, modality: str) -> dict:
    """STUB: media decode. Real image/audio decoding would go here
    (PIL / torchaudio / ffmpeg are not available in this container).

    Raises for modalities that genuinely need a codec; byte-level
    features for the generic blob path are real.
    """
    if modality in ("image", "audio", "video"):
        raise NotImplementedError(
            f"decode for modality={modality!r} requires codec libraries not in this container"
        )
    return {"n_bytes": len(payload), "first_byte": payload[0] if payload else -1}


def extract_binary_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives pyarrow-backed batches; each batch is
    processed vectorized-per-row in Python. This is the genuine
    plumbing a decode/resize/frame-sample operator uses — swap the
    body of ``decode_stub`` for a real codec and nothing else moves.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(payload, meta["modality"])
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series([f["n_bytes"] for f in feats], dtype="int64"),
                    "first_byte": pd.Series([f["first_byte"] for f in feats], dtype="int32"),
                    "modality": [m["modality"] for m in pdf["meta"]],
                }
            )

    return df.mapInPandas(run, BINARY_FEATURES_SCHEMA)


#: schema of the resized-payload frame produced by :func:`resize_payloads`
RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("src_bytes", LongType()),
        StructField("dst_bytes", LongType()),
    ]
)


def resize_payloads(df: DataFrame, *, target_bytes: int = 64) -> DataFrame:
    """Arrow-batched "resize": nearest-neighbor downsample of each
    payload's byte raster to a fixed size.

    The byte-array sampling stands in for 2-D pixel resampling (a
    real codec would decode to a raster first — that's the
    ``decode_stub`` seam); the resize arithmetic, output schema, and
    batch shape are the real operator. Output payloads are
    fixed-size, which is exactly what an embedding model's
    preprocessor wants downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads, src, dst = [], [], []
            for payload in pdf["payload"]:
                n = len(payload)
                if n == 0:
                    resized = b""
                else:
                    # nearest-neighbor index map: dst position i reads
                    # src position floor(i * n / target)
                    resized = bytes(
                        payload[(i * n) // target_bytes] for i in range(target_bytes)
                    )
                out_payloads.append(resized)
                src.append(n)
                dst.append(len(resized))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payloads,
                    "src_bytes": pd.Series(src, dtype="int64"),
                    "dst_bytes": pd.Series(dst, dtype="int64"),
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


#: schema of the frame rows produced by :func:`sample_frames`
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_ix", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, *, frame_bytes: int = 16, every_n: int = 4
) -> DataFrame:
    """Frame sampling for video-shaped payloads: treat the payload as
    a sequence of fixed-size frames and emit every Nth one as its own
    row (1 input row → ~len/(frame_bytes·every_n) output rows).

    ``mapInPandas`` is the right shape for row-growing media ops —
    the iterator contract lets one heavy input batch stream out many
    output batches without materializing the whole fan-out. A real
    video pipeline swaps the byte-slicing for ffmpeg keyframe
    extraction; partitioning, schema, and fan-out accounting stay.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ixs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    ixs.append(fi)
                    frames.append(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_ix": pd.Series(ixs, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def repartition_by_size_class(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    boundaries: tuple[int, ...] = (1 << 16, 1 << 20, 1 << 24),
    partitions_per_class: int = 8,
) -> DataFrame:
    """Skew guard for heavy-payload stages: bucket rows into size
    classes (boundaries in bytes) and spread each class over
    ``partitions_per_class`` partitions with a deterministic salt.

    Without this, a directory listing that happens to group the huge
    videos together sends them to one decode task and the stage runs
    at straggler speed; with it, every task gets a bounded byte
    budget. Salt is ``xxhash64`` of the payload length + doc id —
    deterministic, so reruns produce identical placement. The
    partition count is explicit ((#classes)·(partitions_per_class)):
    an AQE-coalesced shuffle would re-merge the spread we just paid
    for, and explicit counts opt out of coalescing.
    """
    size = F.octet_length(F.col(payload_col))
    cls = F.lit(0)
    for i, b in enumerate(boundaries):
        cls = F.when(size >= b, i + 1).otherwise(cls)
    salt = F.pmod(F.xxhash64(size, F.col("doc_id")), F.lit(partitions_per_class))
    n_parts = (len(boundaries) + 1) * partitions_per_class
    return (
        df.withColumn("_size_class", cls)
        .withColumn("_salt", salt)
        .repartition(n_parts, F.col("_size_class"), F.col("_salt"))
        .drop("_salt")
    )

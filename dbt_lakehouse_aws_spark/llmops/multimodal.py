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

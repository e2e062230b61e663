"""Scale probe: Arrow-batched image/audio decode throughput per codec.

Builds N payloads per format (deterministic 32x32 RGB rasters /
4000-frame PCM), runs them through the REAL mapInPandas feature
extractors on local[32], and reports payloads/s — the number that
matters when a 100 TB corpus carries binary columns. Run:

    python scripts/scale_probe8_codecs.py [n_per_codec]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from dbt_lakehouse_aws_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("codec-probe")
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, schema="id long").count()

    from dbt_lakehouse_aws_spark.llmops.flac import encode_flac
    from dbt_lakehouse_aws_spark.llmops.jpeg import encode_jpeg
    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_wav,
        extract_audio_features,
        extract_image_features,
    )
    from dbt_lakehouse_aws_spark.llmops.tiff import encode_tiff

    rng = np.random.default_rng(7)
    raster = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    smooth = np.clip(
        128 + 60 * np.cos(np.arange(32) / 4), 0, 255
    ).astype(np.uint8)
    blocks = np.repeat(np.repeat(rng.integers(0, 256, (4, 4), dtype=np.uint8), 8, 0), 8, 1)
    pcm = rng.integers(-32768, 32768, size=(4000, 1), dtype=np.int64)

    image_payloads = {
        "bmp": encode_bmp(raster),
        "png": encode_png(raster),
        "gif": encode_gif(raster[:, :, :1].repeat(3, axis=2)),  # <=256 colors
        "tiff": encode_tiff(raster),
        "jpeg_dc": encode_jpeg(blocks[:, :, None], quant=np.ones((8, 8))),
    }
    audio_payloads = {
        "wav": encode_wav(pcm.astype("<i2"), 16000),
        "flac": encode_flac(pcm, 16000, block=1024),
    }

    print(f"n_per_codec={n}, 32x32 RGB images / 4000-frame PCM, local[32]")
    for name, payload in image_payloads.items():
        df = spark.range(n).selectExpr("id AS doc_id").selectExpr(
            "doc_id", f"unhex('{payload.hex()}') AS payload"
        ).repartition(32)
        extract_image_features(df).count()  # warm
        t0 = time.perf_counter()
        extract_image_features(df).count()
        dt = time.perf_counter() - t0
        print(f"{name:8s} {len(payload):6d} B/payload  {n/dt:9.0f} payloads/s  ({dt:.2f}s)")
    for name, payload in audio_payloads.items():
        df = spark.range(n).selectExpr("id AS doc_id").selectExpr(
            "doc_id", f"unhex('{payload.hex()}') AS payload"
        ).repartition(32)
        extract_audio_features(df).count()
        t0 = time.perf_counter()
        extract_audio_features(df).count()
        dt = time.perf_counter() - t0
        print(f"{name:8s} {len(payload):6d} B/payload  {n/dt:9.0f} payloads/s  ({dt:.2f}s)")
    spark.stop()


if __name__ == "__main__":
    main()

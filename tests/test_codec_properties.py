"""Hypothesis round-trip properties for the pure-Python codecs:
for every generated raster / PCM buffer, encode→decode is the
identity (all these containers are lossless; JPEG's property is the
DC-only exactness class used by the driver query)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_lakehouse_aws_spark.llmops.flac import decode_flac, encode_flac
from dbt_lakehouse_aws_spark.llmops.jpeg import decode_jpeg, encode_jpeg
from dbt_lakehouse_aws_spark.llmops.multimodal import (
    decode_bmp,
    decode_gif,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
    encode_wav,
)
from dbt_lakehouse_aws_spark.llmops.tiff import decode_tiff, encode_tiff

_dims = st.tuples(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
)


def _raster(h, w, c, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


@settings(max_examples=25, deadline=None)
@given(dims=_dims, c=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**31))
def test_png_roundtrip_property(dims, c, seed):
    h, w = dims
    px = _raster(h, w, c, seed)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31), ncol=st.integers(1, 256))
def test_gif_roundtrip_property(dims, seed, ncol):
    h, w = dims
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    px = pal[rng.integers(0, ncol, size=(h, w))]
    assert np.array_equal(decode_gif(encode_gif(px)), px)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, c=st.sampled_from([1, 3, 4]), seed=st.integers(0, 2**31))
def test_tiff_roundtrip_property(dims, c, seed):
    h, w = dims
    px = _raster(h, w, c, seed)
    assert np.array_equal(decode_tiff(encode_tiff(px)), px)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31))
def test_bmp_ppm_roundtrip_property(dims, seed):
    h, w = dims
    px = _raster(h, w, 3, seed)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    channels=st.integers(1, 2),
    seed=st.integers(0, 2**31),
    fixed=st.booleans(),
    block=st.sampled_from([64, 192, 333]),
)
def test_flac_roundtrip_property(n, channels, seed, fixed, block):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int64)
    got = decode_flac(encode_flac(pcm, 8000, fixed=fixed, block=block))
    assert np.array_equal(got["samples"], pcm)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 300), channels=st.integers(1, 2), seed=st.integers(0, 2**31))
def test_wav_roundtrip_property(n, channels, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, channels)).astype("<i2")
    got = decode_wav(encode_wav(pcm, 44100))
    assert np.array_equal(got["samples"], pcm)


@settings(max_examples=20, deadline=None)
@given(
    nbx=st.integers(1, 3),
    nby=st.integers(1, 3),
    seed=st.integers(0, 2**31),
)
def test_jpeg_dc_only_exactness_property(nbx, nby, seed):
    """The driver query's exactness class: grayscale images made of
    uniform 8x8 blocks at all-ones quant round-trip bit-exactly
    through the full Huffman/DCT path."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(nby, nbx), dtype=np.uint8)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1)[:, :, None]
    got = decode_jpeg(encode_jpeg(px, quant=np.ones((8, 8))))
    assert np.array_equal(got, px)


@settings(max_examples=15, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 20), st.integers(1, 20)),
    c=st.sampled_from([1, 3]),
    quality=st.sampled_from([35, 60, 85]),
    seed=st.integers(0, 2**31),
)
def test_progressive_equals_baseline_property(dims, c, quality, seed):
    """SOF2 spectral-selection streams carry the same quantized
    coefficients as SOF0 — decode must be byte-identical on ANY
    input, not just smooth fixtures."""
    h, w = dims
    px = _raster(h, w, c, seed)
    seq = decode_jpeg(encode_jpeg(px, quality=quality))
    pro = decode_jpeg(encode_jpeg(px, quality=quality, progressive=True))
    assert np.array_equal(seq, pro)


@settings(max_examples=60, deadline=2000)
@given(
    codec=st.sampled_from(["png", "gif", "tiff", "bmp", "jpeg", "flac", "wav"]),
    cut=st.floats(0.01, 0.99),
    seed=st.integers(0, 2**31),
)
def test_truncated_payloads_fail_fast_never_hang(codec, cut, seed):
    """Corpus decode runs over untrusted bytes: truncating a payload
    anywhere must raise promptly (ValueError or a stdlib parse error)
    — never hang, crash the interpreter, or loop unbounded. The
    hypothesis deadline doubles as the no-hang guard."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    pcm = rng.integers(-3000, 3000, size=(200, 1), dtype=np.int64)
    payloads = {
        "png": (encode_png, decode_png, px),
        "gif": (encode_gif, decode_gif, px),
        "tiff": (encode_tiff, decode_tiff, px),
        "bmp": (encode_bmp, decode_bmp, px),
        "jpeg": (lambda p: encode_jpeg(p, quality=80), decode_jpeg, px),
        "flac": (lambda p: encode_flac(p, 8000), decode_flac, pcm),
        "wav": (lambda p: encode_wav(p.astype("<i2"), 8000), decode_wav, pcm),
    }
    enc, dec, src = payloads[codec]
    data = enc(src)
    trunc = data[: max(1, int(len(data) * cut))]
    try:
        dec(trunc)
    except Exception:
        pass  # any prompt parse error is the acceptable outcome

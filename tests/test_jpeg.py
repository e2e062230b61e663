"""Baseline JPEG codec (llmops/jpeg.py): hand-built streams with
closed-form expected rasters, near-lossless round-trips, 4:2:0 +
restart-marker paths, and honest rejection of non-baseline modes."""

import struct

import numpy as np
import pytest

from dbt_lakehouse_aws_spark.llmops.jpeg import (
    _K_AC_LUMA,
    _K_DC_LUMA,
    _build_huffman,
    decode_jpeg,
    encode_jpeg,
)


def _minimal_gray_jpeg(entropy: bytes, w: int = 8, h: int = 8) -> bytes:
    """Assemble a 1-component baseline JPEG with all-ones quant and
    the Annex-K luma tables around a caller-built entropy stream."""
    out = bytearray(b"\xff\xd8")
    zz_ones = bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + zz_ones
    sof = struct.pack(">BHHB", 8, h, w, 1) + struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, bits, huffval):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, *_K_DC_LUMA) + dht(1, 0, *_K_AC_LUMA)
    sos = bytes([1]) + struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


class _Bits:
    def __init__(self):
        self.bits = []

    def put(self, code, length):
        self.bits += [(code >> i) & 1 for i in range(length - 1, -1, -1)]

    def bytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(int("".join(map(str, bits[i : i + 8])), 2))
        # apply byte stuffing
        stuffed = bytearray()
        for b in out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


def test_hand_built_dc_and_single_ac_block():
    """Entropy stream written bit-by-bit in the test (encoder not
    involved); expected raster from the closed-form cosine basis."""
    dc_len = {s: ln for (ln, c), s in _build_huffman(*_K_DC_LUMA).items()}
    dc_code = {s: c for (ln, c), s in _build_huffman(*_K_DC_LUMA).items()}
    ac_len = {s: ln for (ln, c), s in _build_huffman(*_K_AC_LUMA).items()}
    ac_code = {s: c for (ln, c), s in _build_huffman(*_K_AC_LUMA).items()}

    # block 1: uniform gray 100 -> DC coeff 8*(100-128) = -224,
    # category 8, one's-complement bits -224+255 = 31; EOB.
    w = _Bits()
    w.put(dc_code[8], dc_len[8])
    w.put(-224 + 255, 8)
    w.put(ac_code[0x00], ac_len[0x00])
    px = decode_jpeg(_minimal_gray_jpeg(w.bytes()))
    assert px.shape == (8, 8, 1)
    assert np.all(px == 100)

    # block 2: DC 0 + single AC at zigzag index 1 (= position (0,1)),
    # value +40 -> raster is 128 + 40 * outer(sqrt(1/8)*ones, basis_1)
    w = _Bits()
    w.put(dc_code[0], dc_len[0])
    w.put(ac_code[0x06], ac_len[0x06])    # run 0, category 6
    w.put(40, 6)                          # +40 -> plain binary
    w.put(ac_code[0x00], ac_len[0x00])    # EOB
    px = decode_jpeg(_minimal_gray_jpeg(w.bytes()))[:, :, 0].astype(float)
    basis = np.array([0.5 * np.cos((2 * n + 1) * np.pi / 16) for n in range(8)])
    expect = 128.0 + 40.0 * np.outer(np.full(8, np.sqrt(1 / 8)), basis)
    assert np.max(np.abs(px - np.clip(np.round(expect), 0, 255))) <= 1


def test_roundtrip_near_lossless_gray_and_rgb():
    rng = np.random.default_rng(37)
    # smooth field: random low-frequency cosine mix stays DCT-compact
    yy, xx = np.mgrid[0:24, 0:16]
    base = (
        128
        + 60 * np.cos(xx / 5.0)
        + 40 * np.sin(yy / 7.0)
        + rng.normal(0, 2, size=(24, 16))
    )
    gray = np.clip(base, 0, 255).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(gray[:, :, None], quant=np.ones((8, 8))))
    assert got.shape == (24, 16, 1)
    assert np.max(np.abs(got[:, :, 0].astype(int) - gray.astype(int))) <= 2

    rgb = np.stack(
        [
            np.clip(base, 0, 255),
            np.clip(base[::-1], 0, 255),
            np.clip(255 - base, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)[:16, :16]
    got = decode_jpeg(encode_jpeg(rgb, quant=np.ones((8, 8))))
    # YCbCr forward/backward + DCT rounding: a few counts of error
    assert np.max(np.abs(got.astype(int) - rgb.astype(int))) <= 4


def test_roundtrip_quality_subsample_restarts_odd_dims():
    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_image

    rng = np.random.default_rng(41)
    yy, xx = np.mgrid[0:21, 0:13]
    img = np.stack(
        [
            128 + 80 * np.cos(xx / 4.0 + c) + 30 * np.sin(yy / 6.0)
            for c in (0.0, 1.0, 2.0)
        ],
        axis=2,
    )
    img = np.clip(img + rng.normal(0, 1, img.shape), 0, 255).astype(np.uint8)
    data = encode_jpeg(img, quality=90, subsample=True, restart_interval=2)
    got = decode_jpeg(data)
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 60
    # magic dispatch through the image path
    assert np.array_equal(decode_image(data), got)


def test_rejects_arithmetic_lossless_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"NOPE")
    # arithmetic-coded (SOF9) and lossless (SOF3) must raise, not
    # mis-decode (progressive SOF2 decodes for real since r4)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    for marker, name in ((b"\xff\xc9", "SOF9"), (b"\xff\xc3", "SOF3")):
        data = (
            b"\xff\xd8"
            + marker
            + struct.pack(">H", 2 + len(sof))
            + sof
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match=name):
            decode_jpeg(data)


def test_progressive_matches_baseline_decode():
    """SOF2 spectral-selection stream: same quantized coefficients as
    the baseline encoding, so the decoded rasters must be IDENTICAL
    byte-for-byte (gray and RGB, odd dims)."""
    rng = np.random.default_rng(83)
    yy, xx = np.mgrid[0:21, 0:13]
    base = np.clip(128 + 70 * np.cos(xx / 3.5) + 40 * np.sin(yy / 5.0)
                   + rng.normal(0, 2, (21, 13)), 0, 255)
    gray = base.astype(np.uint8)[:, :, None]
    for q in (np.ones((8, 8)), None):
        kw = {"quant": q} if q is not None else {"quality": 85}
        seq = decode_jpeg(encode_jpeg(gray, **kw))
        pro = decode_jpeg(encode_jpeg(gray, progressive=True, **kw))
        assert np.array_equal(seq, pro)
    rgb = np.stack([base, base[::-1], 255 - base], axis=2).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg(rgb, quality=85))
    pro = decode_jpeg(encode_jpeg(rgb, quality=85, progressive=True))
    assert np.array_equal(seq, pro)


def test_progressive_successive_approximation_hand_built():
    """Four hand-written scans over one 8x8 gray block: DC first at
    Al=1, DC refinement to Al=0, AC first at Al=1, AC refinement to
    Al=0 — the final coefficients must equal the originals exactly
    (verified through the pixel output of a DC+single-AC block)."""
    from dbt_lakehouse_aws_spark.llmops.jpeg import (
        _K_DC_LUMA as DCL,
        _K_AC_LUMA as ACL,
    )

    dc_len = {s: ln for (ln, c), s in _build_huffman(*DCL).items()}
    dc_code = {s: c for (ln, c), s in _build_huffman(*DCL).items()}
    ac_len = {s: ln for (ln, c), s in _build_huffman(*ACL).items()}
    ac_code = {s: c for (ln, c), s in _build_huffman(*ACL).items()}

    dc_val, ac1_val = -224, 41  # DC -> uniform 100; AC odd so Al=0 bit matters
    # scan 1: DC first, Al=1 -> send dc_val >> 1 = -112 (category 7)
    w1 = _Bits()
    hi = dc_val >> 1
    s = 7
    w1.put(dc_code[s], dc_len[s])
    w1.put(hi + (1 << s) - 1 if hi < 0 else hi, s)
    # scan 2: DC refinement Al=0 -> one bit (dc_val & 1 = 0)
    w2 = _Bits()
    w2.put(dc_val & 1, 1)
    # scan 3: AC first, band 1..63, Al=1 -> send ac1 >> 1 = 20 at k=1
    w3 = _Bits()
    hi = ac1_val >> 1  # 20, category 5
    w3.put(ac_code[0x05], ac_len[0x05])
    w3.put(hi, 5)
    w3.put(ac_code[0x00], ac_len[0x00])  # EOB
    # scan 4: AC refinement Al=0: EOB0 covers the block; the nonzero-
    # history coefficient at k=1 receives its correction bit (1)
    w4 = _Bits()
    w4.put(ac_code[0x00], ac_len[0x00])
    w4.put(ac1_val & 1, 1)

    def sos(entropy, ss, se, ah, al):
        hdr = bytes([1]) + struct.pack(">BB", 1, 0x00) + bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + entropy

    zz_ones = bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)

    def dht(cls, tid, bits, huffval):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    data = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">HB", 67, 0) + zz_ones
        + b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
        + dht(0, 0, *DCL) + dht(1, 0, *ACL)
        + sos(w1.bytes(), 0, 0, 0, 1)
        + sos(w2.bytes(), 0, 0, 1, 0)
        + sos(w3.bytes(), 1, 63, 0, 1)
        + sos(w4.bytes(), 1, 63, 1, 0)
        + b"\xff\xd9"
    )
    got = decode_jpeg(data)[:, :, 0].astype(float)
    basis = np.array([0.5 * np.cos((2 * n + 1) * np.pi / 16) for n in range(8)])
    expect = 100.0 + ac1_val * np.outer(np.full(8, np.sqrt(1 / 8)), basis)
    assert np.max(np.abs(got - np.clip(np.round(expect), 0, 255))) <= 1

"""FLAC decoder (llmops/flac.py): encoder round-trips plus
hand-built frames for the paths the fixture encoder doesn't emit
(LPC, stereo decorrelation, escape partitions, wasted bits)."""

import struct

import numpy as np
import pytest

from dbt_lakehouse_aws_spark.llmops.flac import (
    _BitW,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_roundtrip_verbatim_and_fixed():
    rng = np.random.default_rng(71)
    mono = rng.integers(-32768, 32768, size=500, dtype=np.int64)
    got = decode_flac(encode_flac(mono, 8000, fixed=False, block=192))
    assert got["sample_rate"] == 8000 and got["channels"] == 1
    assert np.array_equal(got["samples"][:, 0], mono)

    # smooth stereo signal, multiple frames, fixed-order-2 rice
    t = np.arange(1000)
    stereo = np.stack(
        [
            (3000 * np.sin(t / 25)).astype(np.int64),
            (2000 * np.cos(t / 40)).astype(np.int64),
        ],
        axis=1,
    )
    data = encode_flac(stereo, 16000, block=256)
    got = decode_flac(data)
    assert got["channels"] == 2 and got["samples"].shape == (1000, 2)
    assert np.array_equal(got["samples"], stereo)
    # fixed-order-2 rice beats verbatim on smooth PCM (sanity that the
    # compressed path actually engaged)
    assert len(data) < len(encode_flac(stereo, 16000, fixed=False, block=256))


def _streaminfo(rate, channels, bits, total, block=64):
    w = _BitW()
    w.write(block, 16)
    w.write(block, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(channels - 1, 3)
    w.write(bits - 1, 5)
    w.write(total, 36)
    body = bytes(w.out) + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(w, bs, rate, channels_code, bits, frame_no=0):
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)      # blocksize: 16-bit value-1 follows
    w.write(13, 4)     # rate: 16-bit Hz follows
    w.write(channels_code, 4)
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
    w.write(0, 1)
    w.write(frame_no, 8)
    w.write(bs - 1, 16)
    w.write(rate, 16)
    hdr = bytes(w.out)
    w.write(_crc8(hdr), 8)


def _finish_frame(w):
    w.align()
    frame = bytes(w.out)
    w.write(_crc16(frame), 16)
    return bytes(w.out)


def test_hand_built_lpc_subframe():
    # order-2 LPC: s[i] = ((c0*s[i-1] + c1*s[i-2]) >> shift) + res[i]
    bits, rate, bs = 16, 8000, 12
    c0, c1, shift, prec = 3, -2, 1, 5
    samples = [100, 103]
    residuals = [1, -2, 0, 3, -1, 2, 0, -3, 1, 0]
    for res in residuals:
        pred = (c0 * samples[-1] + c1 * samples[-2]) >> shift
        samples.append(pred + res)
    w = _BitW()
    _frame_header(w, bs, rate, 0, bits)
    w.write(0, 1)
    w.write(32 + (2 - 1), 6)   # LPC order 2
    w.write(0, 1)              # no wasted bits
    w.write(samples[0], bits)
    w.write(samples[1], bits)
    w.write(prec - 1, 4)
    w.write(shift, 5)
    w.write(c0, prec)
    w.write(c1 & ((1 << prec) - 1), prec)
    w.write(0, 2)              # rice method 0
    w.write(0, 4)              # one partition
    w.write(3, 4)              # k = 3
    for v in residuals:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        w.write(0, u >> 3)
        w.write(1, 1)
        w.write(u & 7, 3)
    data = _streaminfo(rate, 1, bits, bs) + _finish_frame(w)
    got = decode_flac(data)
    assert got["samples"][:, 0].tolist() == samples


def test_hand_built_stereo_decorrelation_modes():
    bits, rate, bs = 16, 8000, 4
    L = [1000, -500, 77, 0]
    R = [998, -510, 80, -1]
    side = [l - r for l, r in zip(L, R)]
    mid = [(l + r) >> 1 for l, r in zip(L, R)]

    def verbatim(w, ch, nbits):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in ch:
            w.write(v & ((1 << nbits) - 1), nbits)

    for code, first, second, fb, sb in [
        (8, L, side, bits, bits + 1),       # left/side
        (9, side, R, bits + 1, bits),       # side/right
        (10, mid, side, bits, bits + 1),    # mid/side
    ]:
        w = _BitW()
        _frame_header(w, bs, rate, code, bits)
        verbatim(w, first, fb)
        verbatim(w, second, sb)
        data = _streaminfo(rate, 2, bits, bs) + _finish_frame(w)
        got = decode_flac(data)
        assert got["samples"][:, 0].tolist() == L, f"mode {code}"
        assert got["samples"][:, 1].tolist() == R, f"mode {code}"


def test_escape_partition_and_wasted_bits():
    bits, rate, bs = 16, 8000, 8
    vals = [4, -6, 10, 2, -2, 8, 0, 6]  # all even -> 1 wasted bit
    w = _BitW()
    _frame_header(w, bs, rate, 0, bits)
    # FIXED order 0 with wasted-bits=1 and an escaped raw partition
    w.write(0, 1)
    w.write(8, 6)      # FIXED order 0
    w.write(1, 1)      # wasted-bits flag
    w.write(1, 1)      # unary 0 -> wasted = 1
    halved = [v >> 1 for v in vals]
    w.write(0, 2)      # rice method 0
    w.write(0, 4)      # one partition
    w.write(15, 4)     # ESCAPE
    w.write(9, 5)      # raw 9-bit residuals
    for v in halved:
        w.write(v & 0x1FF, 9)
    data = _streaminfo(rate, 1, bits, bs) + _finish_frame(w)
    got = decode_flac(data)
    assert got["samples"][:, 0].tolist() == vals


def test_crc_and_magic_rejections():
    rng = np.random.default_rng(73)
    pcm = rng.integers(-1000, 1000, size=100, dtype=np.int64)
    good = bytearray(encode_flac(pcm, 8000))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"NOPE" + bytes(good[4:]))
    bad = bytearray(good)
    bad[-3] ^= 0xFF  # corrupt inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))


def test_flac_flows_through_audio_features():
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import audio_features, encode_wav

    rng = np.random.default_rng(79)
    pcm = rng.integers(-32768, 32768, size=(300, 1), dtype=np.int64)
    flac_feats = audio_features(encode_flac(pcm, 16000))
    wav_feats = audio_features(encode_wav(pcm.astype(np.int16), 16000))
    for k in ("sample_rate", "channels", "n_frames", "duration_ms", "amp_sum", "zero_crossings"):
        assert flac_feats[k] == wav_feats[k], k


def test_permissive_audio_decode_survives_corrupt_payloads(spark):
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import (
        encode_wav,
        extract_audio_features,
    )

    pcm = np.arange(-50, 50, dtype=np.int64)[:, None]
    rows = [
        (1, encode_wav(pcm.astype("<i2"), 8000)),
        (2, encode_flac(pcm, 8000)),
        (3, b"fLaC" + b"\x00" * 10),     # truncated FLAC
        (4, b"RIFFxxxxWAVE"),            # header-only WAV
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           extract_audio_features(df, mode="permissive").collect()}
    assert out[1]["amp_sum"] == out[2]["amp_sum"] == int(np.abs(pcm).sum())
    assert out[1]["decode_error"] is None and out[2]["decode_error"] is None
    assert out[3]["decode_error"] and out[3]["n_frames"] is None
    assert out[4]["decode_error"] and out[4]["amp_sum"] is None

"""TIFF codec (llmops/tiff.py): roundtrips, both byte orders,
PackBits and LZW strips built by independent encoders, horizontal
predictor, honest rejections."""

import struct

import numpy as np
import pytest

from dbt_lakehouse_aws_spark.llmops.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    tiff_lzw_decode,
)


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(53)
    for h, w, c in [(1, 1, 1), (5, 7, 3), (3, 2, 4)]:
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(px)), px)


def _mm_tiff(px, strips, comp, predictor=1):
    """Hand-assemble a BIG-endian multi-strip TIFF."""
    h, w, c = px.shape
    rows_per_strip = -(-h // strips)
    strip_bodies = []
    row = 0
    while row < h:
        strip_bodies.append(px[row : row + rows_per_strip].tobytes())
        row += rows_per_strip
    if comp == 32773:
        # naive PackBits: literal runs of <=128 bytes
        def pb(b):
            out = bytearray()
            for i in range(0, len(b), 128):
                chunk = b[i : i + 128]
                out += bytes([len(chunk) - 1]) + chunk
            return bytes(out)
        strip_bodies = [pb(b) for b in strip_bodies]

    data_off = 8
    offs, cnts = [], []
    blob = b""
    for b in strip_bodies:
        offs.append(data_off + len(blob))
        cnts.append(len(b))
        blob += b
    aux_off = data_off + len(blob)
    aux = b""
    def arr(vals, fmt, size):
        nonlocal aux
        if len(vals) * size <= 4:
            v = 0
            packed = struct.pack(">" + fmt * len(vals), *vals)
            packed += b"\x00" * (4 - len(packed))
            return int.from_bytes(packed, "big"), b""
        off = aux_off + len(aux)
        aux += struct.pack(">" + fmt * len(vals), *vals)
        return off, None

    entries = []
    def add(tag, typ, vals, fmt, size):
        val, _ = arr(vals, fmt, size)
        entries.append((tag, typ, len(vals), val))

    add(256, 4, [w], "I", 4)
    add(257, 4, [h], "I", 4)
    add(258, 3, [8] * c, "H", 2)
    add(259, 3, [comp], "H", 2)
    add(262, 3, [1 if c == 1 else 2], "H", 2)
    add(273, 4, offs, "I", 4)
    add(277, 3, [c], "H", 2)
    add(278, 4, [rows_per_strip], "I", 4)
    add(279, 4, cnts, "I", 4)
    if predictor != 1:
        add(317, 3, [predictor], "H", 2)
    ifd_off = aux_off + len(aux)
    out = struct.pack(">HHI", 0x4D4D, 42, ifd_off) + blob + aux
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    return out


def test_big_endian_multistrip_packbits():
    rng = np.random.default_rng(59)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(_mm_tiff(px, 3, 1)), px)
    assert np.array_equal(decode_tiff(_mm_tiff(px, 2, 32773)), px)


def test_packbits_repeat_runs():
    # 130 => repeat next byte 257-130=127 times; 2 => 3 literals
    data = bytes([130, 7]) + bytes([2, 1, 2, 3])
    assert packbits_decode(data, 130) == bytes([7] * 127 + [1, 2, 3])
    with pytest.raises(ValueError, match="short"):
        packbits_decode(bytes([0, 9]), 5)


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """Independent TIFF-LZW compressor: MSB-first, early change."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(CLEAR)
    run = b""
    for byte in raw:
        nxt = run + bytes([byte])
        if nxt in table:
            run = nxt
            continue
        emit(table[run])
        table[nxt] = next_code
        next_code += 1
        if next_code + 1 >= (1 << width):
            if width < 12:
                width += 1  # early change, encoder side
            else:  # table full: reset, as real writers do
                emit(CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        run = bytes([byte])
    if run:
        emit(table[run])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_strip_with_table_growth_and_predictor():
    rng = np.random.default_rng(61)
    h, w, c = 9, 40, 3  # 1080 bytes/strip -> table grows past 9 bits
    px = rng.integers(0, 8, size=(h, w, c), dtype=np.uint8)
    px[:, ::2] = 3  # repetition so the dictionary builds deep entries

    # apply horizontal differencing (per channel), then LZW each strip
    diff = px.astype(np.int16)
    diff[:, 1:] = diff[:, 1:] - px[:, :-1].astype(np.int16)
    diff = (diff % 256).astype(np.uint8)

    data_off = 8
    body = _tiff_lzw_encode(diff.tobytes())
    bits_off = data_off + len(body)
    ifd_off = bits_off + 6
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, bits_off),
        (259, 3, 1, 5), (262, 3, 1, 2), (273, 4, 1, data_off),
        (277, 3, 1, 3), (278, 4, 1, h), (279, 4, 1, len(body)),
        (317, 3, 1, 2),
    ]
    out = bytearray(struct.pack("<HHI", 0x4949, 42, ifd_off))
    out += body + struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)

    assert np.array_equal(decode_tiff(bytes(out)), px)
    # the raw LZW kernel also roundtrips arbitrary bytes
    blob = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    assert tiff_lzw_decode(_tiff_lzw_encode(blob), len(blob)) == blob


def test_rejections():
    with pytest.raises(ValueError, match="header"):
        decode_tiff(b"NOPE")
    px = np.zeros((2, 2, 3), np.uint8)
    good = bytearray(encode_tiff(px))
    # flip compression tag (259) to an unsupported scheme
    ifd_off = struct.unpack_from("<I", good, 4)[0]
    n = struct.unpack_from("<H", good, ifd_off)[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", good, off)[0]
        if tag == 259:
            struct.pack_into("<I", good, off + 8, 7)  # JPEG-in-TIFF
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(good))


def test_decode_image_dispatches_tiff():
    import numpy as np

    from dbt_lakehouse_aws_spark.llmops.multimodal import decode_image

    rng = np.random.default_rng(67)
    px = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_tiff(px)), px)

"""Baseline TIFF codec — pure stdlib + numpy (TIFF 6.0 is public).

The scan/scientific-imagery sibling of the PNG/GIF/JPEG codecs in
:mod:`.multimodal`: strip-organized 8-bit rasters in either byte
order with the three classic compressions —

* 1 = none;
* 32773 = PackBits (run-length);
* 5 = TIFF-LZW — MSB-first bit packing with the "early change" code
  widths (one code earlier than GIF's variant), CLEAR=256/EOI=257 —
  plus the horizontal-differencing predictor (tag 317 = 2).

Supported layout: 8 bits per sample, 1/3/4 samples per pixel
(grayscale / RGB / RGBA), any strip split, II or MM headers. Tiled
TIFFs, palette color, and other bit depths raise ``ValueError`` —
rejected, not mis-decoded. ``encode_tiff`` writes single-strip
uncompressed II files for fixtures; the PackBits/LZW decode paths
are pinned by hand-built streams in the tests.
"""

from __future__ import annotations

import struct

import numpy as np


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits stream ended short of the strip size")
    return bytes(out[:expected])


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit order, 8-bit
    roots, CLEAR=256/EOI=257, and the *early* code-width change (the
    width grows when the NEXT entry would overflow — at table sizes
    511/1023/2047, one code earlier than the GIF variant)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream ended short of the strip size")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF LZW opens with an undefined code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("TIFF LZW code beyond table end")
            table.append(prev + entry[:1])
            # early change, reader side: the writer widened after
            # ASSIGNING code 510/1022/2046, and the reader's table
            # runs one assignment behind the writer at read time —
            # so widen when the table reaches 510/1022/2046
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW stream ended short of the strip size")
    return bytes(out[:expected])


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def decode_tiff(data: bytes):
    """TIFF decode → uint8 (h, w, c). See module docstring for the
    supported profile."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad header)")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    (n_entries,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # rational/float tags (resolution etc.) — unused
        total = size * cnt
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, off + 8)
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(e + fmt * cnt, data, voff))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported (strip-organized only)")
    w, h = one(256), one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8 per sample)")
    photometric = one(262, 1)
    if photometric == 3:
        raise ValueError("palette TIFF not supported")
    comp = one(259, 1)
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/byte counts")

    rowbytes = w * spp
    chunks = []
    row0 = 0
    for soff, scnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, h - row0)
        raw = data[soff : soff + scnt]
        expected = strip_rows * rowbytes
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("TIFF strip shorter than its raster size")
            chunks.append(raw[:expected])
        elif comp == 32773:
            chunks.append(packbits_decode(raw, expected))
        elif comp == 5:
            chunks.append(tiff_lzw_decode(raw, expected))
        else:
            raise ValueError(
                f"unsupported TIFF compression {comp} (1/5/32773 supported)"
            )
        row0 += strip_rows
    if row0 < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    px = np.frombuffer(b"".join(chunks), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: row-wise cumsum
        px = np.cumsum(px.astype(np.uint16), axis=1, dtype=np.uint16).astype(
            np.uint8
        )
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    return px


def encode_tiff(pixels) -> bytes:
    """uint8 (h, w, c) → single-strip uncompressed little-endian
    TIFF for fixtures (c = 1 gray, 3 RGB, 4 RGBA)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    body = px.tobytes()
    photometric = 1 if c == 1 else 2

    # layout: header(8) | pixel data | bits-per-sample array | IFD
    data_off = 8
    bits_off = data_off + len(body)
    ifd_off = bits_off + 2 * c
    entries = [
        (256, 4, 1, w),              # ImageWidth
        (257, 4, 1, h),              # ImageLength
        (258, 3, c, bits_off if c > 2 else 8),  # BitsPerSample
        (259, 3, 1, 1),              # Compression: none
        (262, 3, 1, photometric),    # Photometric
        (273, 4, 1, data_off),       # StripOffsets
        (277, 3, 1, c),              # SamplesPerPixel
        (278, 4, 1, h),              # RowsPerStrip
        (279, 4, 1, len(body)),      # StripByteCounts
    ]
    out = bytearray(struct.pack("<HHI", 0x4949, 42, ifd_off))
    out += body
    out += struct.pack("<" + "H" * c, *([8] * c))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)

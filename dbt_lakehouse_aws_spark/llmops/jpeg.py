"""JPEG (ITU T.81) codec — pure stdlib + numpy.

Closes the compressed-image boundary for real: no codec library, just
the public interchange format. Scope —

* markers: SOI/APPn/COM/DQT (8- and 16-bit precision)/SOF0/SOF1/
  SOF2/DHT/DRI/SOS/RSTn/EOI;
* entropy: canonical Huffman per T.81 C.2 (BITS/HUFFVAL), byte
  stuffing (FF 00), restart intervals resetting DC predictors;
* sequential scans: DC prediction + magnitude-category extend, AC
  run/size with ZRL and EOB;
* PROGRESSIVE scans (SOF2): coefficients accumulate across scans —
  spectral-selection bands (interleaved DC scans, non-interleaved
  per-component AC bands), EOB runs, and successive approximation
  with both first and refinement passes (G.1.2 / libjpeg semantics:
  the EOB run includes the current block, whose nonzero-history
  coefficients still receive correction bits);
* finish: dequantize, zigzag scatter, orthonormal 8x8 IDCT as two
  matrix products (numpy, batched over all blocks of a component);
* color: grayscale (1 comp) and YCbCr (3 comp, JFIF matrix) with
  arbitrary h×v sampling factors, replicate upsampling.

Arithmetic coding, hierarchical, and lossless modes raise
``ValueError`` — rejected, not mis-decoded.

``encode_jpeg`` exists for fixtures and round-trips: 4:4:4 or 4:2:0,
Annex-K example quantization tables scaled by a quality knob (or
caller-supplied tables — all-ones gives a near-lossless round-trip
that pins the transform path to ±2/pixel), the Annex-K "typical"
Huffman tables, optional restart intervals, and a
spectral-selection progressive mode (the successive-approximation
decode paths are pinned by hand-built multi-scan fixtures).

Speed note: entropy decode is per-bit Python (the IDCT and color
path are vectorized numpy). That is fine for the Arrow-batched
``mapInPandas`` decode stage where payload parse cost is already
per-row Python; a production deployment would swap this module for a
native codec behind the same ``decode_image`` dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables


def _zigzag_positions() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rs if s % 2 == 1 else reversed(list(rs))):
            out.append((r, s - r))
    return out


_ZZ = _zigzag_positions()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

#: orthonormal 8-point DCT-II basis; spatial = T.T @ coeffs @ T
_DCT_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else 0.5)
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Annex K example quantization tables (public spec, K.1/K.2), in
# natural (row-major) order.
_K_LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ]
)
_K_CHROMA_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ]
)

# Annex K "typical" Huffman tables: (BITS[1..16], HUFFVAL)
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_huffman(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """T.81 C.2 canonical code assignment: {(length, code) → symbol}."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _extend(v: int, s: int) -> int:
    """Magnitude-category decode (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code (no match in 16 bits)")


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the scan's entropy bytes, splitting at RSTn markers.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes):
    """Baseline sequential (SOF0/SOF1) and progressive (SOF2) JPEG →
    uint8 (h, w, c); c is 1 (grayscale) or 3 (RGB via the JFIF YCbCr
    matrix). Progressive streams accumulate coefficients across
    scans — spectral selection bands, successive-approximation
    first + refinement passes, EOB runs — then dequantize/IDCT once
    at EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → lut
    frame = None
    progressive = False
    restart_interval = 0
    store = None  # per-component zigzag coefficient grids
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        marker = data[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 15
                p += 1
                if prec == 0:
                    vals = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, p).astype(np.int32)
                    p += 128
                tbl = np.zeros((8, 8), np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(body[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_huffman(bits, huffval)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            progressive = marker == 0xC2
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = struct.unpack_from(
                    ">BBB", body, 6 + 3 * c
                )
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 15, "q": qid}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode SOF{marker - 0xC0} "
                "(sequential SOF0/SOF1 and progressive SOF2 supported)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if store is None:
                store = _init_store(frame)
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    j for j, cc in enumerate(frame["comps"]) if cc["id"] == cid
                )
                scan_comps.append((idx, tids >> 4, tids & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            segs, end = _split_entropy(data, i + 2 + seglen)
            _run_scan(
                frame, store, huff, scan_comps, ss, se, ah, al,
                segs, restart_interval, progressive,
            )
            i = end
            continue
        i += 2 + seglen
    if store is None:
        raise ValueError("JPEG payload has no SOS scan")
    return _finish(frame, qt, store)


def _geometry(frame):
    comps = frame["comps"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * max_h))
    mcuy = -(-frame["h"] // (8 * max_v))
    return max_h, max_v, mcux, mcuy


def _init_store(frame):
    _mh, _mv, mcux, mcuy = _geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]


def _run_scan(frame, store, huff, scan_comps, ss, se, ah, al, segs, ri, progressive):
    max_h, max_v, mcux, mcuy = _geometry(frame)
    comps = frame["comps"]
    if progressive and ss > 0 and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = {idx: 0 for idx, _, _ in scan_comps}
    eobrun = 0

    def tables(idx, dc_id, ac_id):
        dc = huff.get((0, dc_id))
        ac = huff.get((1, ac_id))
        return dc, ac

    if len(scan_comps) == 1:
        # a one-component scan is non-interleaved by definition
        # (T.81 §A.2): iterate the component's OWN block grid
        idx, dc_id, ac_id = scan_comps[0]
        c = comps[idx]
        cw = -(-frame["w"] * c["h"] // max_h)
        chh = -(-frame["h"] * c["v"] // max_v)
        bw, bh = -(-cw // 8), -(-chh // 8)
        dc_lut, ac_lut = tables(idx, dc_id, ac_id)
        for u in range(bw * bh):
            if ri and u and u % ri == 0:
                seg_idx += 1
                reader = _BitReader(segs[seg_idx])
                preds = {k: 0 for k in preds}
                eobrun = 0
            by, bx = divmod(u, bw)
            eobrun = _scan_block(
                reader, store[idx][by, bx], dc_lut, ac_lut,
                ss, se, ah, al, preds, idx, progressive, eobrun,
            )
        return
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            preds = {k: 0 for k in preds}
            eobrun = 0
        my, mx = divmod(m, mcux)
        for idx, dc_id, ac_id in scan_comps:
            c = comps[idx]
            dc_lut, ac_lut = tables(idx, dc_id, ac_id)
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    eobrun = _scan_block(
                        reader,
                        store[idx][my * c["v"] + by, mx * c["h"] + bx],
                        dc_lut, ac_lut, ss, se, ah, al,
                        preds, idx, progressive, eobrun,
                    )


def _scan_block(reader, block, dc_lut, ac_lut, ss, se, ah, al, preds, cid, progressive, eobrun):
    """Decode one block's share of one scan into its zigzag
    coefficient vector. Returns the updated EOB run."""
    k = ss
    if ss == 0:
        if ah == 0:  # DC first (or the DC part of a sequential scan)
            if dc_lut is None:
                raise ValueError("JPEG scan references undefined DC table")
            s = reader.read_symbol(dc_lut)
            diff = _extend(reader.read_bits(s), s) if s else 0
            preds[cid] += diff
            block[0] = preds[cid] << al
        else:  # DC refinement: append the next lower bit
            if reader.read_bit():
                block[0] |= 1 << al
        if se == 0:
            return eobrun
        k = 1
    if ac_lut is None:
        raise ValueError("JPEG scan references undefined AC table")
    if ah == 0:  # AC first pass (covers sequential AC too)
        if eobrun > 0:
            return eobrun - 1
        while k <= se:
            sym = reader.read_symbol(ac_lut)
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r and progressive:
                    eobrun += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflows the band")
            block[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return eobrun
    # AC refinement (G.1.2.3 / libjpeg semantics: EOBRUN includes the
    # current block, whose nonzero-history coefficients still receive
    # correction bits)
    p1 = 1 << al
    if eobrun == 0:
        while k <= se:
            sym = reader.read_symbol(ac_lut)
            r, s = sym >> 4, sym & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                newval = p1 if reader.read_bit() else -p1
            while k <= se:
                v = int(block[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        block[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            v = int(block[k])
            if v != 0 and reader.read_bit() and (v & p1) == 0:
                block[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish(frame, qt, store):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    max_h, max_v, _mcux, _mcuy = _geometry(frame)
    out_planes = []
    for idx, c in enumerate(comps):
        grid = store[idx]
        q = qt.get(c["q"])
        if q is None:
            raise ValueError("JPEG frame references undefined quant table")
        bh, bw = grid.shape[:2]
        blocks = np.zeros((bh, bw, 8, 8), np.float64)
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = grid
        blocks *= q[None, None]
        spatial = np.einsum("km,ijkl,ln->ijmn", _DCT_T, blocks, _DCT_T)
        pix = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        pix = np.repeat(
            np.repeat(pix, max_v // c["v"], axis=0), max_h // c["h"], axis=1
        )
        out_planes.append(pix[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures / round-trips)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def pad_to_byte(self) -> None:
        while self.nbits:
            self.write(1, 1)


def _encode_table(bits, huffval) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from the same canonical assignment."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huffman(bits, huffval).items()
    }


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _quantized_zz(block, q):
    coefs = np.round(
        (_DCT_T @ (block - 128.0) @ _DCT_T.T) / q
    ).astype(np.int64)
    zz = coefs[_ZZ_ROWS, _ZZ_COLS]
    # baseline AC categories stop at 10 (±1023); clamp the rare
    # pathological block (max-contrast pattern at quant=1) rather
    # than emit an unencodable symbol
    zz[1:] = np.clip(zz[1:], -1023, 1023)
    return zz


def _write_dc(writer, dc: int, pred: int, dc_tbl) -> int:
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_tbl[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return dc


def _write_ac_band(writer, zz, ac_tbl) -> None:
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tbl[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]  # EOB
        writer.write(code, ln)


def _encode_block(writer, block, q, dc_tbl, ac_tbl, pred: int) -> int:
    zz = _quantized_zz(block, q)
    dc = _write_dc(writer, int(zz[0]), pred, dc_tbl)
    _write_ac_band(writer, zz, ac_tbl)
    return dc


def encode_jpeg(
    pixels,
    *,
    quant: np.ndarray | tuple[np.ndarray, np.ndarray] | None = None,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 (h, w, 1|3) → JFIF bytes. ``quant`` overrides the
    quality-scaled Annex-K tables (pass all-ones for a near-lossless
    transform round-trip); ``subsample`` switches 4:4:4 → 4:2:0;
    ``restart_interval`` (in MCUs) emits DRI + RSTn markers.
    ``progressive`` writes an SOF2 stream with spectral-selection
    scans (an interleaved DC scan, then one full AC band per
    component) — 4:4:4/grayscale, no restarts; the
    successive-approximation decode paths are pinned by hand-built
    fixtures instead."""
    if progressive and (subsample or restart_interval):
        raise ValueError(
            "progressive fixture encoder supports 4:4:4/grayscale "
            "without restart intervals"
        )
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")

    if quant is None:
        scale = 5000 / quality if quality < 50 else 200 - 2 * quality
        ql = np.clip(np.floor((_K_LUMA_Q * scale + 50) / 100), 1, 255)
        qc = np.clip(np.floor((_K_CHROMA_Q * scale + 50) / 100), 1, 255)
    elif isinstance(quant, tuple):
        ql, qc = np.asarray(quant[0], np.float64), np.asarray(quant[1], np.float64)
    else:
        ql = qc = np.asarray(quant, np.float64)

    if nch == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
    else:
        chans = [px[:, :, 0]]

    sub = 2 if (subsample and nch == 3) else 1
    samplings = [(sub, sub)] + [(1, 1)] * (len(chans) - 1) if nch == 3 else [(1, 1)]
    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))

    # pad each channel (edge-replicate) to its plane size; chroma is
    # box-averaged when subsampling
    planes = []
    for ci, ch in enumerate(chans):
        sh, sv = samplings[ci]
        if (sh, sv) != (max_h, max_v):
            fy, fx = max_v // sv, max_h // sh
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            ch = np.pad(ch, ((0, ph - h), (0, pw - w)), mode="edge")
            ch = ch.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        ch = np.pad(
            ch,
            ((0, th - ch.shape[0]), (0, tw - ch.shape[1])),
            mode="edge",
        )
        planes.append(ch)

    dc_l = _encode_table(*_K_DC_LUMA)
    ac_l = _encode_table(*_K_AC_LUMA)
    dc_c = _encode_table(*_K_DC_CHROMA)
    ac_c = _encode_table(*_K_AC_CHROMA)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, tbl):
        zz = tbl[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()

    out += dqt(0, ql)
    if nch == 3:
        out += dqt(1, qc)

    sof = struct.pack(">BHHB", 8, h, w, nch)
    for ci in range(nch):
        sh, sv = samplings[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof

    def dht(cls, tid, bits, huffval):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, *_K_DC_LUMA) + dht(1, 0, *_K_AC_LUMA)
    if nch == 3:
        out += dht(0, 1, *_K_DC_CHROMA) + dht(1, 1, *_K_AC_CHROMA)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if progressive:
        # precompute every block's quantized zigzag vector (4:4:4 —
        # sampling is 1x1, so MCU order == each component's raster
        # block order)
        comp_zz = []
        for ci in range(nch):
            q = ql if ci == 0 else qc
            blocks = []
            for by in range(mcuy):
                for bx in range(mcux):
                    block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    blocks.append(_quantized_zz(block, q))
            comp_zz.append(blocks)
        # scan 1: interleaved DC, Ss=Se=0, Ah=Al=0
        sos = bytes([nch])
        for ci in range(nch):
            sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x10)
        sos += b"\x00\x00\x00"
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        writer = _BitWriter()
        preds = [0] * nch
        for m in range(mcux * mcuy):
            for ci in range(nch):
                dc_tbl = dc_l if ci == 0 else dc_c
                preds[ci] = _write_dc(
                    writer, int(comp_zz[ci][m][0]), preds[ci], dc_tbl
                )
        writer.pad_to_byte()
        out += writer.out
        # one AC scan per component: Ss=1, Se=63, Ah=Al=0
        for ci in range(nch):
            sos = bytes([1]) + struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x01)
            sos += b"\x01\x3f\x00"
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            writer = _BitWriter()
            ac_tbl = ac_l if ci == 0 else ac_c
            for zz in comp_zz[ci]:
                _write_ac_band(writer, zz, ac_tbl)
            writer.pad_to_byte()
            out += writer.out
        out += b"\xff\xd9"
        return bytes(out)

    sos = bytes([nch])
    for ci in range(nch):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = [0] * nch
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.pad_to_byte()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * nch
        my, mx = divmod(m, mcux)
        for ci in range(nch):
            sh, sv = samplings[ci]
            q = ql if ci == 0 else qc
            dc_tbl = dc_l if ci == 0 else dc_c
            ac_tbl = ac_l if ci == 0 else ac_c
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                    preds[ci] = _encode_block(
                        writer, block, q, dc_tbl, ac_tbl, preds[ci]
                    )
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)

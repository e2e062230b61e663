"""FLAC decoder — pure stdlib + numpy (the format is fully public).

Closes the lossless half of the compressed-audio boundary: FLAC is
integer arithmetic end to end (Rice-coded residuals + fixed/LPC
predictors), so unlike mp3/aac (perceptual filterbanks) it decodes
exactly with no codec library.

Supported profile — what real encoders emit for PCM:

* STREAMINFO + any metadata blocks (skipped);
* fixed- and variable-blocksize frames, all block-size/sample-rate/
  sample-size header codes, UTF-8-coded frame numbers, header CRC-8
  and frame CRC-16 VERIFIED;
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (signed quantized coefficients + shift), wasted-bits;
* residuals: Rice method 0 (4-bit params) and 1 (5-bit), any
  partition order, escape-to-raw partitions;
* channel assignments: independent, left/side, right/side,
  mid/side (side channel carries the +1 bit per spec).

``encode_flac`` writes real FLAC for fixtures (verbatim or
fixed-order-2 Rice subframes, independent channels) — enough to
round-trip arbitrary PCM; the fancier decode paths (LPC, mid/side,
escapes) are pinned by hand-built frames in the tests.
"""

from __future__ import annotations

import struct

import numpy as np


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ t[(crc >> 8) ^ b]
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (for CRCs).

    Hot-path shape matters: ``read`` grabs the whole field with ONE
    ``int.from_bytes`` window (not a per-bit loop) and ``unary``
    scans a byte at a time via ``bit_length`` — together ~20× faster
    on Rice-dense FLAC frames (scale probe #9: 0.9k → 17k
    payloads/s)."""

    __slots__ = ("d", "bitpos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.bitpos = pos * 8

    @property
    def pos(self) -> int:
        return self.bitpos >> 3

    @property
    def bit(self) -> int:
        return self.bitpos & 7

    def read(self, n: int) -> int:
        bp = self.bitpos
        end = bp + n
        if end > len(self.d) * 8:
            raise ValueError("FLAC stream truncated")
        self.bitpos = end
        byte0 = bp >> 3
        nbytes = ((bp & 7) + n + 7) >> 3
        chunk = int.from_bytes(self.d[byte0 : byte0 + nbytes], "big")
        return (chunk >> (nbytes * 8 - (bp & 7) - n)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        d = self.d
        bp = self.bitpos
        count = 0
        while True:
            byte = bp >> 3
            if byte >= len(d):
                raise ValueError("FLAC stream truncated")
            b = d[byte] & (0xFF >> (bp & 7))
            if b == 0:
                count += 8 - (bp & 7)
                bp = (byte + 1) << 3
            else:
                zeros = (8 - (bp & 7)) - b.bit_length()
                self.bitpos = bp + zeros + 1  # zeros plus the stop bit
                return count + zeros

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_BLOCKSIZE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
              **{n: 256 << (n - 8) for n in range(8, 16)}}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _utf8_number(r: _Bits) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_follow):
        c = r.read(8)
        if c >> 6 != 0b10:
            raise ValueError("bad UTF-8-coded frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _residuals(r: _Bits, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    out: list[int] = []
    # the Rice loop is the decoder's hot path: run it on local ints
    # (d, bp) instead of method calls — measured 2× on dense frames
    d = r.d
    nbits_total = len(d) * 8
    bp = r.bitpos
    for p in range(n_parts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        byte0 = bp >> 3
        nb = ((bp & 7) + pbits + 7) >> 3
        k = (
            int.from_bytes(d[byte0 : byte0 + nb], "big")
            >> (nb * 8 - (bp & 7) - pbits)
        ) & escape
        bp += pbits
        if k == escape:
            r.bitpos = bp
            raw = r.read(5)
            out += [r.read_signed(raw) if raw else 0 for _ in range(n)]
            bp = r.bitpos
            continue
        kmask = (1 << k) - 1
        for _ in range(n):
            q = 0
            while True:
                byte = bp >> 3
                if byte >= len(d):
                    raise ValueError("FLAC stream truncated")
                b = d[byte] & (0xFF >> (bp & 7))
                if b == 0:
                    q += 8 - (bp & 7)
                    bp = (byte + 1) << 3
                else:
                    zeros = (8 - (bp & 7)) - b.bit_length()
                    q += zeros
                    bp += zeros + 1
                    break
            if k:
                if bp + k > nbits_total:
                    raise ValueError("FLAC stream truncated")
                byte0 = bp >> 3
                nb = ((bp & 7) + k + 7) >> 3
                rem = (
                    int.from_bytes(d[byte0 : byte0 + nb], "big")
                    >> (nb * 8 - (bp & 7) - k)
                ) & kmask
                bp += k
            else:
                rem = 0
            v = (q << k) | rem
            out.append((v >> 1) ^ -(v & 1))  # zigzag
    r.bitpos = bp
    return out


def _subframe(r: _Bits, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("bad subframe padding bit")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    bps -= wasted
    if ftype == 0:  # CONSTANT
        samples = [r.read_signed(bps)] * blocksize
    elif ftype == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _residuals(r, blocksize, order)
        if order == 0:
            samples = warm + res
        else:
            # a FIXED subframe stores the order-th finite difference;
            # reconstruction is `order` integrations — numpy cumsums
            # seeded from the warmup's difference pyramid, instead of
            # a per-sample Python predictor loop
            diffs = [warm]
            for _ in range(1, order):
                prev = diffs[-1]
                diffs.append([prev[i + 1] - prev[i] for i in range(len(prev) - 1)])
            arr = np.asarray(res, dtype=np.int64)
            for j in range(order, 0, -1):
                arr = np.cumsum(arr) + diffs[j - 1][-1]
            samples = warm + arr.tolist()
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        samples = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code")
        shift = r.read_signed(5)
        coefs = [r.read_signed(precision) for _ in range(order)]
        for res in _residuals(r, blocksize, order):
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((acc >> shift) + res)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes) -> dict:
    """Decode a FLAC stream → ``{"sample_rate", "channels", "bits",
    "samples"}`` with ``samples`` an (n_frames, channels) int32
    array — same contract as :func:`.multimodal.decode_wav`."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (bad magic)")
    pos = 4
    info = None
    while True:
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            b = _Bits(body)
            b.read(16)  # min block
            b.read(16)  # max block
            b.read(24)
            b.read(24)
            rate = b.read(20)
            channels = b.read(3) + 1
            bits = b.read(5) + 1
            total = b.read(36)
            info = {"rate": rate, "channels": channels, "bits": bits, "total": total}
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(data):
        frame_start = pos
        r = _Bits(data, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        r.read(1)  # reserved
        _utf8_number(r)
        if bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCKSIZE:
            blocksize = _BLOCKSIZE[bs_code]
        else:
            raise ValueError(f"reserved block-size code {bs_code}")
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        crc8_end = r.pos  # header CRC covers sync..here (byte-aligned)
        if r.bit:
            raise ValueError("FLAC frame header not byte-aligned at CRC-8")
        if _crc8(data[frame_start:crc8_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        bps = _BITS.get(size_code, info["bits"]) if size_code else info["bits"]
        if chan_code <= 7:
            n_ch = chan_code + 1
            subs = [_subframe(r, blocksize, bps) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            # the side channel carries one extra bit: it is subframe 1
            # for left/side and mid/side, subframe 0 for side/right
            n_ch = 2
            a = _subframe(r, blocksize, bps + (1 if chan_code == 9 else 0))
            b2 = _subframe(r, blocksize, bps + (0 if chan_code == 9 else 1))
            if chan_code == 8:  # left/side: R = L - side
                subs = [a, [l - s for l, s in zip(a, b2)]]
            elif chan_code == 9:  # side/right: L = side + R
                subs = [[s + rr for s, rr in zip(a, b2)], b2]
            else:  # mid/side: L+R parity is side's LSB
                subs = [
                    [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(a, b2)],
                    [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(a, b2)],
                ]
        else:
            raise ValueError(f"reserved channel assignment {chan_code}")
        if n_ch != info["channels"]:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        r.align()
        if _crc16(data[frame_start : r.pos]) != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos
        for c in range(n_ch):
            chans[c] += subs[c]

    n = min(len(c) for c in chans) if chans else 0
    if info["total"] and n > info["total"]:
        n = info["total"]
    samples = np.array([c[:n] for c in chans], dtype=np.int64).T.astype(np.int32)
    return {
        "sample_rate": info["rate"],
        "channels": info["channels"],
        "bits": info["bits"],
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# fixture encoder


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        v &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _rice_write(w: _BitW, v: int, k: int) -> None:
    u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
    q = u >> k
    w.write(0, q)  # q zero bits ...
    w.write(1, 1)  # ... then the stop bit
    if k:
        w.write(u & ((1 << k) - 1), k)


def encode_flac(
    samples, sample_rate: int, *, bits: int = 16, block: int = 4096, fixed: bool = True
) -> bytes:
    """(n, channels) int PCM → FLAC bytes: independent channels,
    fixed-order-2 Rice subframes (``fixed=True``) or verbatim."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape

    out = bytearray(b"fLaC")
    info = _BitW()
    info.write(block, 16)
    info.write(block, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bits - 1, 5)
    info.write(n, 36)
    body = bytes(info.out) + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_no = 0
    for off in range(0, n, block):
        blk = s[off : off + block]
        bs = blk.shape[0]
        w = _BitW()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # blocksize: 16-bit value-1 follows
        w.write(13, 4)  # rate: 16-bit Hz follows
        w.write(channels - 1, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
        w.write(0, 1)
        # UTF-8 frame number (support two bytes for fixtures)
        if frame_no < 0x80:
            w.write(frame_no, 8)
        else:
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        w.write(bs - 1, 16)
        w.write(sample_rate, 16)
        hdr = bytes(w.out)
        assert w.nbits == 0
        w.write(_crc8(hdr), 8)
        for c in range(channels):
            ch = blk[:, c].tolist()
            w.write(0, 1)
            if fixed and bs > 2:
                w.write(8 + 2, 6)  # FIXED order 2
                w.write(0, 1)  # no wasted bits
                w.write(ch[0], bits)
                w.write(ch[1], bits)
                res = [ch[i] - (2 * ch[i - 1] - ch[i - 2]) for i in range(2, bs)]
                w.write(0, 2)  # rice method 0
                w.write(0, 4)  # partition order 0
                mean = max(1, sum(abs(x) for x in res) // max(1, len(res)))
                k = min(14, max(0, mean.bit_length()))
                w.write(k, 4)
                for v in res:
                    _rice_write(w, v, k)
            else:
                w.write(1, 6)  # VERBATIM
                w.write(0, 1)
                for v in ch:
                    w.write(int(v), bits)
        w.align()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)

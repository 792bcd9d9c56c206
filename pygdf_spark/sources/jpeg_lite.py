"""jpeg_lite: pure-Python baseline JPEG (JFIF) codec — jar-free,
lib-free, numpy-vectorized per 8x8 block.

Fourth REAL image codec after png_lite/gif_lite/wav_lite — JPEG is THE
dominant photographic format in web-scraped multimodal corpora, so the
image-decode stage of a training pipeline should be exercisable on real
JPEG bitstreams, not stubs.

Implements, per ITU-T T.81 (baseline sequential DCT, Huffman):

- decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI marker parsing,
  8-bit quantization tables, canonical Huffman table construction from
  BITS/HUFFVAL, entropy-coded segment with 0xFF00 byte unstuffing and
  RSTn restart intervals (DC predictors reset), interleaved MCU layout
  with per-component sampling factors (4:4:4, 4:2:0, 4:2:2), DC
  differential + AC run/length (ZRL, EOB) decoding, dequantize →
  de-zigzag → float64 matrix IDCT, sampling-factor chroma replication
  upsampling, JFIF YCbCr→RGB, grayscale (1-component) passthrough.
- encoder: the reverse pipeline with the Annex-K quantization tables
  scaled by the libjpeg quality formula and the Annex-K Huffman tables
  (carried in DHT segments, so ANY standards-compliant decoder can read
  the output even independently of this module), 4:2:0 or 4:4:4 chroma,
  optional restart intervals.

Strictness contract (png_lite class): truncated streams, bad markers,
undefined Huffman/quant table references, out-of-range coefficient
categories, and coefficient overruns raise ``ValueError`` — never a
silent short decode.

Exactness property the oracle queries lean on (and pytest pins): at
quality=100 every quant-table entry is 1, and an image that is CONSTANT
within each aligned 8x8 tile produces DC-only blocks whose DCT/IDCT
round-trip is integer-exact — so tiled grayscale fixtures decode
BIT-EXACTLY while the codec paths exercised (Huffman, zigzag, MCU
interleave, IDCT) are the fully general ones. Lossy behavior on
arbitrary images is bounded-error, pinned by the pytest tier.

Scale posture: runs inside Arrow-batched ``mapInPandas`` kernels
(operators/multimodal.py) — executor-parallel across images, zero
driver involvement; entropy coding is inherently sequential per stream
(parallelism axis = rows, same as png/gif). Reference surface: cudf has
no image IO — SURVEY §2.12 net-new row.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex-K Huffman specs: (BITS[1..16], HUFFVAL). Carried verbatim in
# the DHT segments the encoder writes, so output files are
# self-describing regardless of these exact values.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]

for _bits, _vals in (
    (DC_LUMA_BITS, DC_LUMA_VALS), (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS), (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals), "huffman spec count mismatch"

# DCT-II orthonormal basis: M[u, x] = a(u)/2 * cos((2x+1) u pi / 16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _a = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling; quality=100 → all-ones (lossless
    quantization for values the DCT represents exactly)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg: quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# --------------------------------------------------------- huffman core


def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL → [(symbol, length, code)] (T.81 C.2 canonical)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], length, code))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        self.lut = {
            (length, code): sym
            for sym, length, code in _canonical_codes(bits, vals)
        }
        self.max_len = max((l for _s, l, _c in
                            _canonical_codes(bits, vals)), default=0)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; surfaces RSTn markers to the MCU loop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None  # pending non-RST marker (e.g. EOI)

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy segment truncated")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("jpeg: dangling 0xFF at end")
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:  # stuffed byte
                    self.pos += 2
                else:
                    # any marker (incl. RSTn — prefetch may reach it
                    # while the interval's last unit is finishing)
                    # terminates this segment; serve zero bits without
                    # advancing past it, the MCU loop resyncs via
                    # align_restart / sees EOI
                    self.marker = nxt
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
                self.nbits += 8
            else:
                self.pos += 1
                self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
                self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code (no symbol ≤16 bits)")

    def align_restart(self, n_expected: int) -> None:
        """Consume padding + the RSTn marker between restart intervals.
        The final padded byte of the interval may still be unconsumed
        at ``pos`` (the reader only buffers what decoding needed) —
        at most one such byte precedes the marker."""
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None
        if self.pos < len(self.data) and self.data[self.pos] != 0xFF:
            self.pos += 1  # the interval's bit-padding byte
        if self.pos + 1 >= len(self.data):
            raise ValueError("jpeg: truncated at restart boundary")
        if self.data[self.pos] != 0xFF:
            raise ValueError("jpeg: expected RST marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"jpeg: expected RSTn, got FF{m:02X}")
        if (m - 0xD0) != (n_expected & 7):
            raise ValueError("jpeg: restart marker out of sequence")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------- decode


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JFIF stream → {"width", "height", "channels",
    "pixels": uint8 HxW (gray) or HxWx3 (RGB)}. Strict: every spec
    violation raises ValueError."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0

    while True:
        if pos + 4 > len(data):
            raise ValueError("jpeg: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("jpeg: EOI before any scan")
        (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("jpeg: segment overruns stream")
        body_start = pos + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables")
                tbl = np.frombuffer(
                    seg[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int64)
                if tbl.size != 64:
                    raise ValueError("jpeg: short quant table")
                qtables[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise ValueError("jpeg: short huffman table")
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[0:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: non-baseline frame FF{marker:02X} unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS → entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(f"jpeg: scan references comp {cs}")
                scan.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 15}
                )
            return _decode_scan(
                data, body_start, frame, scan, qtables, htables,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos = body_start


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval) -> dict:
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax < 1 or vmax < 1:
        raise ValueError("jpeg: zero sampling factor")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in scan:
        if c["tq"] not in qtables:
            raise ValueError(f"jpeg: undefined quant table {c['tq']}")
        if (0, c["dc"]) not in htables or (1, c["ac"]) not in htables:
            raise ValueError("jpeg: undefined huffman table in scan")
        planes.append(np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        ))
    rdr = _BitReader(data, pos)
    pred = [0] * len(scan)
    n_restarts = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                rdr.align_restart(n_restarts)
                n_restarts += 1
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                dct = htables[(0, c["dc"])]
                act = htables[(1, c["ac"])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        t = rdr.decode_symbol(dct)
                        if t > 11:
                            raise ValueError("jpeg: DC category > 11")
                        diff = _extend(rdr.read_bits(t), t)
                        pred[ci] += diff
                        coefs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.decode_symbol(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                raise ValueError(
                                    f"jpeg: bad AC symbol {rs:02X}"
                                )
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC overrun")
                            coefs[k] = _extend(rdr.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (coefs * q).astype(np.float64)
                        px = _idct(block.reshape(8, 8))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # strictness: the stream must close with EOI — a cut exactly after
    # the last entropy byte must raise, never silently decode
    if rdr.marker != 0xD9:
        p = rdr.pos
        if p < len(data) and data[p] != 0xFF:
            p += 1  # final bit-padding byte
        if p + 1 >= len(data) or data[p] != 0xFF or data[p + 1] != 0xD9:
            raise ValueError("jpeg: missing EOI after scan")
    out_planes = []
    for ci, c in enumerate(scan):
        p = np.clip(np.round(planes[ci] + 128.0), 0, 255)
        # replicate up to full resolution, crop to image dims
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("jpeg: non-integer sampling ratio")
        p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        px = out_planes[0].astype(np.uint8)
        return {"width": w, "height": h, "channels": 1, "pixels": px}
    if len(out_planes) != 3:
        raise ValueError(f"jpeg: {len(out_planes)} components unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": rgb}


# --------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = _fdct(block.astype(np.float64) - 128.0)
    zz = coef.reshape(64)[ZIGZAG]
    qc = np.round(zz / q.astype(np.float64)).astype(np.int64)
    diff = int(qc[0]) - pred
    t = _category(diff)
    if t > 11:
        raise ValueError("jpeg: DC diff out of range")
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(_mag_bits(diff, t), t)
    run = 0
    for k in range(1, 64):
        v = int(qc[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(_mag_bits(v, s), s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return int(qc[0])


def _code_map(bits, vals):
    return {sym: (code, length)
            for sym, length, code in _canonical_codes(bits, vals)}


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """Encode uint8 HxW (gray) or HxWx3 (RGB) as baseline JFIF.
    Color uses 4:2:0 when ``subsample`` (dims padded by edge
    replication internally; output dims are exact).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (what real encoders do so decoders can resync /
    parallelize; DC predictors reset per interval)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("jpeg: pixels must be uint8")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("jpeg: expected HxW or HxWx3")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    ql = quant_table(QUANT_LUMA, quality)
    qc = quant_table(QUANT_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql[i] for i in range(64)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[i] for i in range(64)))

    if gray:
        comps = [(1, 0x11, 0)]
    elif subsample:
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += _seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                    + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _hv, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # dc table th == ac th here
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dcl = _code_map(DC_LUMA_BITS, DC_LUMA_VALS)
    acl = _code_map(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc = _code_map(DC_CHROMA_BITS, DC_CHROMA_VALS)
    acc = _code_map(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        tabs = [(dcl, acl, ql)]
    else:
        f = px.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample:
            cb = _downsample2(cb)
            cr = _downsample2(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        tabs = [(dcl, acl, ql), (dcc, acc, qc), (dcc, acc, qc)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pad = np.empty((th, tw), dtype=np.float64)
        ph, pw = p.shape
        pad[:ph, :pw] = p
        if pw < tw:
            pad[:ph, pw:] = p[:, -1:]
        if ph < th:
            pad[ph:, :] = pad[ph - 1:ph, :]
        padded.append(pad)

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    n_restarts = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (n_restarts & 7)])
                n_restarts += 1
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sh, sv), (dct, act, q)) in enumerate(
                zip(padded, samp, tabs)
            ):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        pred[ci] = _encode_block(
                            bw, p[y0:y0 + 8, x0:x0 + 8], q,
                            dct, act, pred[ci],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _downsample2(p: np.ndarray) -> np.ndarray:
    """2x2 box average with edge replication to even dims, rounded —
    the standard 4:2:0 chroma reduction."""
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:, :]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return np.round(
        (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
        / 4.0
    )

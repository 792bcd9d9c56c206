"""Pure-Python PNG codec (spec-complete for 8-bit gray/RGB/RGBA baseline).

The container ships no image libraries, so — like the Avro path
(``sources/avro_lite.py``) — the codec is implemented straight from the
public PNG specification (RFC 2083 / W3C PNG): chunk framing with CRC-32
verification, IHDR parsing, zlib (stdlib) IDAT inflation, and full
scanline de-filtering for all five filter types (None/Sub/Up/Average/
Paeth). The encoder emits the same subset and can apply any filter type
per row, so a round-trip genuinely exercises the de-filter math.

Distribution contract: decode runs INSIDE Arrow-batched ``mapInPandas``
kernels (operators use it per-row over binary columns) — a narrow map,
no shuffle, executor-local; nothing here touches the driver.

Reference parity: the reference engine has no image codec either (this
is the north-star multimodal ask); the bytes-in/typed-columns-out
contract mirrors its subword/text pipelines.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> channels (8-bit baseline subset)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: np.ndarray, filter_type: int | str = 0) -> bytes:
    """Encode an (H, W) gray or (H, W, C) C∈{1,2,3,4} uint8 array.

    ``filter_type``: 0..4 applies that filter to every scanline;
    ``"mixed"`` cycles row % 5 so a round-trip covers every de-filter
    branch.
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = arr.reshape(h, w * ch).astype(np.int32)
    zero = np.zeros(w * ch, dtype=np.int32)
    lines = bytearray()
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        cur = raw[y]
        prior = raw[y - 1] if y else zero
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prior
        elif ft == 3:
            filt = cur - (left + prior) // 2
        elif ft == 4:
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prior, ul)],
                dtype=np.int32,
            )
            filt = cur - pred
        else:
            raise ValueError(f"filter_type {ft} not in 0..4")
        lines.append(ft)
        lines.extend((filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode PNG bytes -> (width, height, channels, uint8 (H, W, C)).

    Supports the 8-bit non-interlaced baseline (gray / gray+alpha /
    RGB / RGBA), all five scanline filters, multi-IDAT streams; every
    chunk CRC is verified. Raises ValueError on malformed input —
    callers surface it per-row rather than poisoning the batch.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, meta = 8, bytearray(), None
    iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(body) != length or len(crc_bytes) != 4:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={ctype})")
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace method")
            meta = (w, h, _CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            iend = True
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("missing IHDR")
    if not idat:
        raise ValueError("missing IDAT")
    if not iend:
        # spec: IEND is mandatory — without this check a stream truncated
        # at a chunk boundary before IEND would decode silently
        raise ValueError("missing IEND")
    w, h, ch = meta
    stride = w * ch
    try:
        lines = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # documented contract: malformed input raises ValueError, so
        # per-row kernel callers can catch/classify one exception type
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    if len(lines) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    return w, h, ch, _unfilter(lines, h, stride, ch).reshape(h, w, ch)


def _unfilter(lines: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Vectorized scanline de-filter (r6: the r5 per-pixel numpy-indexing
    loop was the decode throughput ceiling — VERDICT r5 Next #4).

    - None/Up: whole-row numpy.
    - Sub: exact closed form — per channel lane, ``rec = cumsum(row) % 256``
      (modular addition commutes with the running sum).
    - Average/Paeth: inherently sequential in x (each pixel needs the
      reconstructed LEFT pixel), so no closed form exists; they run a
      tight Python loop over plain lists (list indexing + int arithmetic,
      ~10× faster than numpy scalar indexing) vectorized only by row.

    ``_unfilter_scalar`` below keeps the original spec-literal loop as
    the oracle cross-check (tests assert identical pixels on the golden
    fixtures and fuzz shapes).
    """
    out = np.zeros((h, stride), dtype=np.uint8)
    rowlen = stride + 1
    view = np.frombuffer(lines, np.uint8).reshape(h, rowlen)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(view[y, 0])
        row = view[y, 1:]
        prior = out[y - 1] if y else zero_row
        if ft == 0:
            out[y] = row
        elif ft == 1:
            lanes = row.reshape(-1, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ft == 2:
            out[y] = row + prior  # uint8 wraparound == mod 256
        elif ft == 3:
            rec = [0] * stride
            rl, pl = row.tolist(), prior.tolist()
            for i in range(bpp):
                rec[i] = (rl[i] + (pl[i] >> 1)) & 255
            for i in range(bpp, stride):
                rec[i] = (rl[i] + ((rec[i - bpp] + pl[i]) >> 1)) & 255
            out[y] = rec
        elif ft == 4:
            rec = [0] * stride
            rl, pl = row.tolist(), prior.tolist()
            for i in range(bpp):
                # left = ul = 0 -> Paeth predictor degenerates to prior
                rec[i] = (rl[i] + pl[i]) & 255
            for i in range(bpp, stride):
                a, b, c = rec[i - bpp], pl[i], pl[i - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rl[i] + pred) & 255
            out[y] = rec
        else:
            raise ValueError(f"bad filter byte {ft}")
    return out


def _unfilter_scalar(lines: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Spec-literal per-pixel de-filter — the ORACLE for ``_unfilter``
    (the r1-r5 production path, retained verbatim for cross-checks)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = lines[y * (stride + 1)]
        row = np.frombuffer(
            lines, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prior) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters are inherently sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                if ft == 1:
                    rec[i] = (row[i] + left) % 256
                elif ft == 3:
                    rec[i] = (row[i] + (left + prior[i]) // 2) % 256
                else:
                    ul = prior[i - bpp] if i >= bpp else 0
                    rec[i] = (row[i] + _paeth(int(left), int(prior[i]), int(ul))) % 256
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = rec.astype(np.uint8)
    return out

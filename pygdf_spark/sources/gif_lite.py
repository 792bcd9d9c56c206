"""gif_lite: pure-Python GIF87a/89a codec (spec-real LZW, jar-free).

Third REAL image codec after png_lite/wav_lite — chosen because GIF is
the only mainstream ANIMATED format that is tractable without native
libs, which makes the multimodal frame-sampling stage (video→frames in
a training pipeline) exercisable end-to-end on real bitstreams instead
of stubs.

Implements, per the public GIF89a specification:

- logical screen descriptor + global/local color tables (any 2^n size)
- image descriptors incl. INTERLACED row order (the 8/8/4/2 pass scheme)
- graphic control extensions: per-frame delay, TRANSPARENCY index, and
  disposal methods 0/1 (leave) and 2 (restore to background)
- LZW decompression with variable code width (min+1 .. 12 bits,
  LSB-first bit packing), CLEAR/EOI codes, dictionary growth + reset
- LZW compression (encoder) with the same width/reset discipline
- frame COMPOSITING: each decoded frame is rendered onto the previous
  canvas per its disposal method and transparency, so callers get full
  RGB frames (what a training pipeline feeds a vision encoder)

Strictness contract (same class as png_lite): truncated streams,
out-of-range LZW codes, missing trailers, and oversized sub-blocks
raise ``ValueError`` — never a silent short decode. GIF carries no
CRC, so single-bit flips are NOT all detectable (documented delta vs
PNG; the fuzz tier asserts loud-or-exact accordingly).

Scale posture: the codec runs inside Arrow-batched ``mapInPandas``
kernels (operators/multimodal.py) — executor-parallel, zero driver
involvement. LZW is inherently sequential per stream; parallelism is
across images (one doc per row), which is the right axis at corpus
scale. Reference surface: cudf has no image IO — §2.12 net-new row.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# ------------------------------------------------------------- LZW decode


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """Decode one LZW stream → palette indices. Raises ValueError on any
    spec violation (bad first code, out-of-range code, overlong output)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary: code → byte sequence (list of ints)
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    out: list[int] = []
    prev: list[int] | None = None

    bitpos = 0
    nbits = len(data) * 8

    def read_code(w: int) -> int | None:
        nonlocal bitpos
        if bitpos + w > nbits:
            return None
        byte0 = bitpos >> 3
        # LSB-first: assemble up to 3 bytes
        chunk = int.from_bytes(data[byte0: byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << w) - 1)
        bitpos += w
        return code

    while True:
        code = read_code(width)
        if code is None:
            raise ValueError("gif: LZW stream ended before EOI")
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("gif: first LZW code not a literal")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("gif: LZW output exceeds image size")
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return out


# ------------------------------------------------------------- LZW encode


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += w
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear, width)
    seq = b""
    data = bytes(indices.astype(np.uint8).ravel())
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        elif next_code - 1 == (1 << _MAX_CODE_WIDTH):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([b])
    if seq:
        emit(table[seq], width)
    # tail sync: the decoder performs ONE MORE table add (for the final
    # emitted code) before it reads EOI, so if that add lands exactly on
    # a 2^width boundary the decoder reads EOI one bit wider — emit it
    # at the decoder's width. (Found by the hypothesis fuzz tier: 12
    # pixels whose 10th add hit table size 16 desynced EOI at 4 vs 5
    # bits; encoder next_code equals the decoder's table size here.)
    if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
        width += 1
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- block framing


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated inside sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("gif: truncated sub-block")
        chunks.append(data[pos: pos + n])
        pos += n


def _write_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


# ------------------------------------------------------------------ decode


def decode_gif(data: bytes) -> dict:
    """Decode a GIF into composited RGB frames.

    Returns ``{"width", "height", "frames": [(h,w,3) uint8 ...],
    "delays_cs": [int ...]}``. Raises ValueError on malformed input."""
    if len(data) < 13:
        raise ValueError("gif: shorter than header")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    width, height, flags, bg_index, _aspect = struct.unpack(
        "<HHBBB", data[6:13]
    )
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(data[pos: pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    bg = canvas.copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    saw_trailer = False

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(payload) != 4:
                    raise ValueError("gif: bad graphic control block")
                gc_flags, delay_cs = payload[0], struct.unpack(
                    "<H", payload[1:3]
                )[0]
                disposal = (gc_flags >> 2) & 0x07
                transparent = payload[3] if gc_flags & 0x01 else None
            # application/comment/plain-text extensions: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos: pos + 9])
        pos += 9
        if left + w > width or top + h > height:
            raise ValueError("gif: frame exceeds logical screen")
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("gif: truncated local color table")
            table = np.frombuffer(data[pos: pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("gif: no color table in scope")
        if pos >= len(data):
            raise ValueError("gif: truncated before LZW data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, w * h)
        if len(idx) < w * h:
            raise ValueError(
                f"gif: LZW produced {len(idx)} of {w * h} pixels"
            )
        rows = np.asarray(idx[: w * h], np.int32).reshape(h, w)
        if iflags & 0x40:
            rows = _deinterlace(rows)
        if rows.max(initial=0) >= len(table):
            raise ValueError("gif: palette index out of range")
        region = canvas[top: top + h, left: left + w]
        rgb = table[rows]
        if transparent is not None:
            mask = (rows == transparent)[..., None]
            rgb = np.where(mask, region, rgb)
        canvas[top: top + h, left: left + w] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if disposal == 2:  # restore to background
            canvas[top: top + h, left: left + w] = bg[
                top: top + h, left: left + w
            ]
        disposal = 0
        transparent = None
        delay_cs = 0
    if not saw_trailer:
        raise ValueError("gif: missing trailer (truncated stream)")
    if not frames:
        raise ValueError("gif: no image data")
    return {
        "width": width,
        "height": height,
        "frames": frames,
        "delays_cs": delays,
    }


# ------------------------------------------------------------------ encode


def encode_gif(
    frames: list[np.ndarray], palette: np.ndarray,
    delays_cs: list[int] | None = None, bg_index: int = 0,
) -> bytes:
    """Encode palette-INDEX frames (each (h,w) uint8) + an (n,3) uint8
    palette into an animated GIF89a (full-frame images, no interlace,
    no transparency — the compositing/interlace paths are pinned by
    hand-crafted bitstreams in tests)."""
    if not frames:
        raise ValueError("gif: need at least one frame")
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("gif: palette must be (n, 3)")
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("gif: palette size must be in [2, 256]")
    size_exp = max(1, int(np.ceil(np.log2(n))))
    table = np.zeros((1 << size_exp, 3), np.uint8)
    table[:n] = palette
    h, w = frames[0].shape
    delays = delays_cs or [0] * len(frames)
    if len(delays) != len(frames):
        raise ValueError("gif: delays/frames length mismatch")

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp - 1), bg_index, 0)
    out += table.tobytes()
    min_code = max(2, size_exp)
    for frame, delay in zip(frames, delays):
        frame = np.asarray(frame)
        if frame.shape != (h, w):
            raise ValueError("gif: all frames must share the screen size")
        if frame.max(initial=0) >= n:
            raise ValueError("gif: frame index exceeds palette")
        out += b"\x21\xf9"  # graphic control (disposal=leave)
        out += _write_subblocks(struct.pack("<BHB", 0x04, delay, 0))
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _write_subblocks(_lzw_encode(min_code, frame))
    out.append(0x3B)
    return bytes(out)

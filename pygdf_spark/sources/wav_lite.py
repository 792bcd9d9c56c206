"""Pure-Python WAV (RIFF/PCM) codec — real audio decode without ffmpeg.

Implements the public RIFF WAVE container format: chunk walking
(tolerating extra chunks like LIST/fact), fmt parsing (PCM16 only —
the overwhelmingly common training-corpus interchange format), and
sample extraction to numpy int16, mono or multi-channel. The encoder
emits canonical 44-byte-header PCM16 files for round-trips and fixture
generation.

Like ``png_lite``, decode runs inside Arrow-batched ``mapInPandas``
kernels per binary-column row — executor-local narrow map, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples ((N,) mono or (N, C)) as PCM16 WAV."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode WAV bytes -> (sample_rate, channels, int16 (N, C) array).

    Walks RIFF sub-chunks (skipping unknown ones, honoring word
    alignment), requires PCM (format tag 1) 16-bit. Raises ValueError
    on malformed input."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
            if ch < 1 or rate < 1:
                raise ValueError(f"malformed fmt chunk (channels={ch}, rate={rate})")
            fmt = (rate, ch)
        elif tag == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    rate, ch = fmt
    if len(raw) % (2 * ch):
        # a ragged data chunk means lost bytes somewhere — dropping the
        # tail silently would be exactly the fuzz tier's target bug class
        raise ValueError(
            f"data chunk size {len(raw)} is not a multiple of the "
            f"{2 * ch}-byte frame size"
        )
    n = len(raw) // (2 * ch)
    arr = np.frombuffer(raw, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, ch, arr

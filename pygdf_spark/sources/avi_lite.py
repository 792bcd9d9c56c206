"""Pure-Python AVI (RIFF) MJPEG container codec — real video parsing
without ffmpeg.

Implements the public AVI 1.0 container format (the MJPEG profile that
scraped-video corpora most often interchange): RIFF chunk walking with
word alignment, ``hdrl`` header parsing (``avih`` main header + one
``vids/MJPG`` stream's ``strh``/``strf``), ``movi`` frame-chunk
extraction (``00dc``), and ``idx1`` index validation.  Each extracted
frame is a complete baseline-JPEG bitstream, decodable by
``sources/jpeg_lite.py`` — so the image codec and the video container
compose into a real video → frames → pixels path.

The encoder emits canonical single-stream MJPEG AVI files (hdrl +
movi + idx1) for round-trips and fixture generation; frames are
treated as opaque byte payloads (the container does not re-encode).

Like the other ``*_lite`` codecs, decode runs inside Arrow-batched
``mapInPandas`` kernels per binary-column row — executor-local narrow
map, no shuffle; the container never needs to be materialized
driver-side.  Parity target: the reference ships no video path at all
(multimodal decode is out of scope for a GPU dataframe library); this
tier exists for the training-data-pipeline contract (frame sampling
over opaque media columns).
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    us_per_frame: int = 33333,
) -> bytes:
    """Encode pre-compressed MJPEG frames as a single-stream AVI.

    ``frames`` are opaque compressed payloads (normally baseline JPEG
    from ``jpeg_lite.encode_jpeg``); the container stores them verbatim
    in ``00dc`` chunks and writes a keyframe ``idx1`` entry for each
    (MJPEG is all-intra — every frame is a keyframe).
    """
    if us_per_frame <= 0:
        raise ValueError("us_per_frame must be positive")
    n = len(frames)
    max_size = max((len(f) for f in frames), default=0)
    # dwRate/dwScale in the stream header: frames-per-second as a
    # rational; keep microsecond fidelity with a fixed 1e6 numerator.
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame,                 # dwMicroSecPerFrame
        (1_000_000 // us_per_frame) * max_size,  # dwMaxBytesPerSec
        0,                            # dwPaddingGranularity
        AVIF_HASINDEX,                # dwFlags
        n,                            # dwTotalFrames
        0,                            # dwInitialFrames
        1,                            # dwStreams
        max_size,                     # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,                   # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIiHHHH",
        b"vids",
        b"MJPG",
        0,                            # dwFlags
        0, 0,                         # wPriority, wLanguage
        0,                            # dwInitialFrames
        us_per_frame,                 # dwScale
        1_000_000,                    # dwRate (rate/scale = fps)
        0,                            # dwStart
        n,                            # dwLength (in frames)
        max_size,                     # dwSuggestedBufferSize
        0,                            # dwQuality
        0,                            # dwSampleSize (0: varying)
        0, 0, width, height,          # rcFrame
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets are relative to the start of the 'movi' fourcc
        # (the most widely-written convention), pointing AT the '00dc'
        # tag of each chunk.
        idx += struct.pack(
            "<4sIII", b"00dc", AVIIF_KEYFRAME, len(movi_body), len(f)
        )
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", idx)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) for each chunk in [pos, end)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > end:
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, pos + 8, length
        pos += 8 + length + (length % 2)


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container → header metadata + raw frame payloads.

    Returns ``{"width", "height", "us_per_frame", "n_frames",
    "codec", "frames": [bytes, ...]}``.  Walks RIFF sub-chunks with
    word alignment, skipping unknown chunks (JUNK, INFO, ...);
    validates that the ``idx1`` index (when present) agrees with the
    ``movi`` chunk layout and that the declared frame count matches.
    Raises ValueError on malformed input (fail-loud: a silent partial
    parse would hide corpus corruption at scale).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if 8 + riff_len > len(data):
        raise ValueError("truncated RIFF payload")
    end = 8 + riff_len
    avih = None
    strh = None
    strf = None
    frames: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []  # (offset from movi fourcc, size)
    idx_entries: list[tuple[int, int]] = []
    for tag, body0, blen in _walk(data, 12, end):
        if tag == b"LIST":
            ltag = data[body0 : body0 + 4]
            if ltag == b"hdrl":
                for t2, b2, l2 in _walk(data, body0 + 4, body0 + blen):
                    if t2 == b"avih":
                        avih = data[b2 : b2 + l2]
                    elif t2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        for t3, b3, l3 in _walk(data, b2 + 4, b2 + l2):
                            if t3 == b"strh" and strh is None:
                                strh = data[b3 : b3 + l3]
                            elif t3 == b"strf" and strf is None:
                                strf = data[b3 : b3 + l3]
            elif ltag == b"movi":
                for t2, b2, l2 in _walk(data, body0 + 4, body0 + blen):
                    if t2[2:4] == b"dc" or t2[2:4] == b"db":
                        frames.append(data[b2 : b2 + l2])
                        frame_offsets.append((b2 - 8 - body0, l2))
        elif tag == b"idx1":
            if blen % 16:
                raise ValueError("idx1 length not a multiple of 16")
            for i in range(0, blen, 16):
                ctag, _flags, off, size = struct.unpack(
                    "<4sIII", data[body0 + i : body0 + i + 16]
                )
                if ctag[2:4] in (b"dc", b"db"):
                    idx_entries.append((off, size))
    if avih is None or len(avih) < 40:
        raise ValueError("missing or short avih header")
    us_per_frame, _, _, _flags, total_frames = struct.unpack("<IIIII", avih[:20])
    width, height = struct.unpack("<II", avih[32:40])
    if strh is None or len(strh) < 8:
        raise ValueError("missing stream header")
    fcc_type, codec = struct.unpack("<4s4s", strh[:8])
    if fcc_type != b"vids":
        raise ValueError(f"first stream is not video ({fcc_type!r})")
    if total_frames != len(frames):
        raise ValueError(
            f"avih declares {total_frames} frames, movi has {len(frames)}"
        )
    if idx_entries:
        if len(idx_entries) != len(frames):
            raise ValueError(
                f"idx1 has {len(idx_entries)} entries for {len(frames)} frames"
            )
        for (ioff, isize), (moff, msize) in zip(idx_entries, frame_offsets):
            if isize != msize or ioff != moff:
                raise ValueError("idx1 entry disagrees with movi layout")
    return {
        "width": int(width),
        "height": int(height),
        "us_per_frame": int(us_per_frame),
        "n_frames": len(frames),
        "codec": codec.decode("ascii", "replace"),
        "frames": frames,
    }

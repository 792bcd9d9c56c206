"""PNG/WAV spec-codec tests: decode pinned against HAND-CRAFTED
bitstreams (built with struct/zlib directly, independent of the
encoder), full filter-matrix round-trips, and malformed-input rejection.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pygdf_spark.sources.png_lite import decode_png, encode_png
from pygdf_spark.sources.wav_lite import decode_wav, encode_wav

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(tag, data):
    return struct.pack(">I", len(data)) + tag + data + struct.pack(
        ">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def png_bytes(w, h, depth, ctype, scanlines):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(bytes(scanlines))) + chunk(b"IEND", b"")


def test_decode_handbuilt_sub_filter():
    # 3x2 gray, filter 1 (Sub): raw rows [10,20,30] and [5,5,5]
    # filtered: first byte kept, rest are deltas vs left (bpp=1)
    lines = [1, 10, 10, 10, 1, 5, 0, 0]
    w, h, ch, px = decode_png(png_bytes(3, 2, 8, 0, lines))
    assert (w, h, ch) == (3, 2, 1)
    assert px[:, :, 0].tolist() == [[10, 20, 30], [5, 5, 5]]


def test_decode_handbuilt_up_and_average():
    # row0 None [1,2,3]; row1 Up deltas [+9,+18,+27] -> [10,20,30];
    # row2 Average: rec = filt + (left + up)//2
    lines = [0, 1, 2, 3, 2, 9, 18, 27, 3, 5, 10, 10]
    px = decode_png(png_bytes(3, 3, 8, 0, lines))[3][:, :, 0]
    assert px[1].tolist() == [10, 20, 30]
    # row2: x0: 5+(0+10)//2=10; x1: 10+(10+20)//2=25; x2: 10+(25+30)//2=37
    assert px[2].tolist() == [10, 25, 37]


def test_decode_handbuilt_paeth_rgb():
    # 2x2 RGB, row0 None; row1 Paeth. bpp=3.
    # row0 raw: (10,20,30) (40,50,60)
    # row1 filt: first pixel predictor = up (left=0,ul=0 -> p=b) ->
    #   rec = filt + up; second pixel: a=left(rec), b=up, c=ul
    lines = [0, 10, 20, 30, 40, 50, 60,
             4, 1, 1, 1, 2, 2, 2]
    px = decode_png(png_bytes(2, 2, 8, 2, lines))[3]
    assert px[1, 0].tolist() == [11, 21, 31]
    # paeth(a=11,b=40,c=10): p=41 -> pa=30,pb=1,pc=31 -> b=40 -> 42
    assert px[1, 1].tolist() == [42, 52, 62]


def test_decode_rejects_malformed():
    good = encode_png(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit in IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(png_bytes(1, 1, 16, 0, [0, 0, 0]))  # 16-bit depth
    with pytest.raises(ValueError, match="IDAT size"):
        decode_png(png_bytes(2, 2, 8, 0, [0, 1, 2]))  # short stream


def test_png_filter_matrix_roundtrip():
    rng = np.random.default_rng(42)
    for shape in [(1, 1), (2, 3), (7, 5, 3), (4, 4, 4), (3, 6, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ref = img[:, :, None] if img.ndim == 2 else img
        for ft in [0, 1, 2, 3, 4, "mixed"]:
            w, h, ch, out = decode_png(encode_png(img, ft))
            assert (h, w, ch) == ref.shape, (shape, ft)
            assert np.array_equal(out, ref), (shape, ft)


def test_png_filters_actually_compress_gradients():
    # a gradient image must shrink under Sub/Up vs None — proves the
    # filter math is applied, not silently skipped
    x, y = np.meshgrid(np.arange(64), np.arange(64))
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    assert len(encode_png(img, 2)) < len(encode_png(img, 0)) / 2


def wav_bytes(chunks):
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_handbuilt_with_extra_chunks():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    samples = struct.pack("<4h", 100, -200, 300, -32768)
    # LIST chunk with ODD length before data: decoder must word-align
    data = wav_bytes([
        b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00",
        b"fmt " + struct.pack("<I", 16) + fmt,
        b"data" + struct.pack("<I", 8) + samples,
    ])
    rate, ch, arr = decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert arr[:, 0].tolist() == [100, -200, 300, -32768]


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OGGS" + b"\x00" * 40)
    fmt_f32 = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(wav_bytes([b"fmt " + struct.pack("<I", 16) + fmt_f32,
                              b"data" + struct.pack("<I", 0) + b""]))
    with pytest.raises(ValueError, match="missing"):
        decode_wav(wav_bytes([]))


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(1)
    s = rng.integers(-32768, 32768, size=(257, 2), dtype=np.int16)
    rate, ch, out = decode_wav(encode_wav(s, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, s)


def test_image_decode_operator_fail_loud(spark):
    """A corrupt payload raises through mapInPandas instead of yielding
    silent nulls."""
    import pandas as pd

    from pygdf_spark.operators.multimodal import image_decode

    good = encode_png(np.full((2, 2, 3), 9, np.uint8))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "img_png": [good]}))
    out = image_decode(df).collect()
    assert out[0]["px_sum"] == 9 * 12 and out[0]["channels"] == 3

    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "img_png": [good[:20]]}))
    with pytest.raises(Exception, match="truncated|IHDR|chunk"):
        image_decode(bad).collect()


def test_decode_truncated_at_crc_and_zero_channel_wav():
    """review r5: truncation INSIDE the CRC field must raise ValueError
    (not struct.error); a ch=0 fmt chunk must not ZeroDivisionError."""
    good = encode_png(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-2])  # cut mid-CRC of IEND
    bad_fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    with pytest.raises(ValueError, match="malformed"):
        decode_wav(wav_bytes([b"fmt " + struct.pack("<I", 16) + bad_fmt,
                              b"data" + struct.pack("<I", 0) + b""]))

"""AVI/MJPEG container codec tests (sources/avi_lite.py).

The container treats frames as opaque payloads, so round-trip property
tests drive random byte payloads (including odd lengths, which exercise
RIFF word alignment); the composition test runs real JPEG frames
through the container and the image codec together.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pygdf_spark.sources.avi_lite import encode_avi, parse_avi


@settings(max_examples=40, deadline=None)
@given(
    frames=st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=9),
    w=st.integers(min_value=1, max_value=1920),
    h=st.integers(min_value=1, max_value=1080),
    upf=st.integers(min_value=1, max_value=2_000_000),
)
def test_roundtrip_property(frames, w, h, upf):
    buf = encode_avi(frames, w, h, us_per_frame=upf)
    out = parse_avi(buf)
    assert out["width"] == w and out["height"] == h
    assert out["us_per_frame"] == upf
    assert out["codec"] == "MJPG"
    assert out["n_frames"] == len(frames)
    assert [bytes(f) for f in out["frames"]] == [bytes(f) for f in frames]


def test_odd_sized_frames_word_aligned():
    frames = [b"x" * 3, b"y" * 5, b"z" * 7]
    out = parse_avi(encode_avi(frames, 8, 8))
    assert out["frames"] == frames


def test_jpeg_composition_exact():
    from pygdf_spark.sources.jpeg_lite import decode_jpeg, encode_jpeg

    imgs = []
    frames = []
    rng = np.random.default_rng(7)
    for _ in range(4):
        tiles = rng.integers(0, 256, size=(2, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
        imgs.append(img)
        frames.append(encode_jpeg(img, quality=100))
    out = parse_avi(encode_avi(frames, 24, 16, us_per_frame=40000))
    for img, payload in zip(imgs, out["frames"]):
        np.testing.assert_array_equal(decode_jpeg(payload)["pixels"], img)


def test_truncation_raises():
    buf = encode_avi([b"abc", b"defg"], 4, 4)
    for cut in (4, 11, 40, len(buf) - 3):
        with pytest.raises(ValueError):
            parse_avi(buf[:cut])


def test_not_avi_raises():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi(b"")


def test_frame_count_mismatch_raises():
    buf = bytearray(encode_avi([b"abc", b"defg"], 4, 4))
    # avih dwTotalFrames sits 16 bytes into the avih body; find it and
    # corrupt it so the declared count disagrees with movi.
    i = buf.index(b"avih") + 8
    (n,) = struct.unpack_from("<I", buf, i + 16)
    assert n == 2
    struct.pack_into("<I", buf, i + 16, 3)
    with pytest.raises(ValueError, match="declares 3 frames"):
        parse_avi(bytes(buf))


def test_idx1_disagreement_raises():
    buf = bytearray(encode_avi([b"abc", b"defg"], 4, 4))
    i = buf.index(b"idx1") + 8
    # corrupt the first index entry's size field
    struct.pack_into("<I", buf, i + 12, 999)
    with pytest.raises(ValueError, match="idx1 entry disagrees"):
        parse_avi(bytes(buf))


def test_skips_unknown_chunks():
    buf = bytearray(encode_avi([b"abc"], 4, 4))
    junk = b"JUNK" + struct.pack("<I", 6) + b"junk!!"
    # splice a JUNK chunk between hdrl and movi
    i = buf.index(b"movi") - 8
    out = bytes(buf[:i]) + junk + bytes(buf[i:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    parsed = parse_avi(out)
    assert parsed["frames"] == [b"abc"]

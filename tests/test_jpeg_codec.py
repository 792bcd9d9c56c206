"""jpeg_lite: baseline JPEG codec properties.

Three tiers, mirroring test_gif_codec.py:
- EXACTNESS: quality-100 constant-per-8x8-tile grayscale round-trips
  bit-exactly (the property the mm_jpeg_decode oracle rests on), for
  every tile-grid shape, with and without restart intervals.
- LOSSY BOUNDS: arbitrary images round-trip within a quality-dependent
  max-abs-error envelope (a codec bug shows up as a blown bound, not a
  subtle drift); restart intervals never change decoded pixels.
- STRICTNESS: truncations and structural corruption raise ValueError —
  never a silent short decode.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pygdf_spark.sources.jpeg_lite import (
    decode_jpeg,
    encode_jpeg,
    quant_table,
    QUANT_CHROMA,
    QUANT_LUMA,
)

FUZZ = settings(max_examples=25, deadline=None)


# ------------------------------------------------------------ exactness


@given(
    wt=st.integers(1, 6), ht=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
    ri=st.sampled_from([0, 1, 3, 7]),
)
@FUZZ
def test_tiled_gray_q100_bit_exact(wt, ht, seed, ri):
    rng = np.random.RandomState(seed)
    tiles = rng.randint(0, 256, (ht, wt))
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=ri))
    assert out["channels"] == 1
    assert (out["width"], out["height"]) == (wt * 8, ht * 8)
    assert np.array_equal(out["pixels"], img)


def test_q100_quant_tables_are_all_ones():
    assert (quant_table(QUANT_LUMA, 100) == 1).all()
    assert (quant_table(QUANT_CHROMA, 100) == 1).all()


def test_extreme_dc_values_exact():
    # full-range DC categories (0 and 255 tiles adjacent → max DC diff)
    tiles = np.array([[0, 255, 0, 255], [255, 0, 255, 0]])
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(out["pixels"], img)


# ---------------------------------------------------------- lossy bounds


@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@FUZZ
def test_gray_lossy_bounded(h, w, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out["pixels"].shape == (h, w)
    err = np.abs(out["pixels"].astype(int) - img.astype(int)).max()
    assert err <= 48  # worst-case noise image at q95; smooth is ≤ ~4


@given(
    h=st.integers(1, 32), w=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
    subsample=st.booleans(),
)
@FUZZ
def test_color_roundtrip_shape_and_bound(h, w, seed, subsample):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert out["channels"] == 3
    assert out["pixels"].shape == (h, w, 3)
    # luma must track closely even when chroma is subsampled
    yl = (0.299 * img[..., 0] + 0.587 * img[..., 1]
          + 0.114 * img[..., 2])
    yo = (0.299 * out["pixels"][..., 0].astype(float)
          + 0.587 * out["pixels"][..., 1]
          + 0.114 * out["pixels"][..., 2])
    assert np.abs(yl - yo).max() <= 64


def test_smooth_image_tight_bound():
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = ((np.sin(x / 9) + np.cos(y / 7)) * 60 + 128).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(out["pixels"].astype(int) - img.astype(int)).max() <= 6


def test_neutral_gray_rgb_q100_exact():
    for v in (0, 1, 77, 128, 254, 255):
        img = np.full((16, 24, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100, subsample=False))
        assert np.array_equal(out["pixels"], img), v


def test_restart_interval_never_changes_pixels():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (33, 49, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))["pixels"]
    for ri in (1, 2, 5, 64):
        got = decode_jpeg(
            encode_jpeg(img, quality=85, restart_interval=ri)
        )["pixels"]
        assert np.array_equal(got, base), ri


# ------------------------------------------------------------ strictness


def _payload():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    return encode_jpeg(img, quality=90)


def test_truncation_always_raises():
    data = _payload()
    for cut in [0, 1, 2, 4, 10, 20, len(data) // 3, len(data) // 2,
                len(data) - 2, len(data) - 1]:
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])


def test_structural_corruption_raises():
    data = bytearray(_payload())
    # break SOI
    bad = bytes([0x00]) + bytes(data[1:])
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    # progressive SOF2 is refused, not mis-decoded
    sof = data.find(b"\xff\xc0")
    data2 = bytearray(data)
    data2[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(data2))


def test_bad_quality_and_shapes_raise():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(img, quality=0)
    with pytest.raises(ValueError):
        encode_jpeg(img.astype(np.int32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


def test_undefined_table_reference_raises():
    # strip the luma DHT segments → scan references undefined tables
    data = _payload()
    out = bytearray()
    pos = 2
    out += data[:2]
    import struct as _s

    while pos < len(data):
        marker = data[pos + 1]
        if marker == 0xDA:
            out += data[pos:]
            break
        (ln,) = _s.unpack(">H", data[pos + 2:pos + 4])
        if marker != 0xC4:
            out += data[pos:pos + 2 + ln]
        pos += 2 + ln
    with pytest.raises(ValueError, match="huffman"):
        decode_jpeg(bytes(out))

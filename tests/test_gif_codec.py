"""gif_lite spec-compliance tests.

The mm_gif_frames oracle checks the encode→decode round-trip at corpus
scale; this file pins the DECODER against hand-crafted bitstreams built
directly from the GIF89a spec (independent of our encoder), covering
the paths the round-trip query doesn't exercise: hand-packed LZW bits,
interlace, transparency compositing, disposal=2, local color tables,
and the malformed-input contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pygdf_spark.sources.gif_lite import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pack_codes(codes, widths):
    """LSB-first bit packing, straight from the spec's definition."""
    acc = accbits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc |= c << accbits
        accbits += w
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(payload):
    out = bytearray()
    for i in range(0, len(payload), 255):
        out.append(min(255, len(payload) - i))
        out += payload[i: i + 255]
    out.append(0)
    return bytes(out)


def _screen(w, h, pal, bg=0):
    exp = max(1, int(np.ceil(np.log2(len(pal)))))
    table = np.zeros((1 << exp, 3), np.uint8)
    table[: len(pal)] = pal
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (exp - 1), bg, 0)
        + table.tobytes()
    )


PAL4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
)


def test_hand_packed_lzw_stream():
    """2x2 image [[1,2],[2,0]], min code 2: codes hand-derived from the
    spec algorithm — clear(4), literals 1,2,2,0, eoi(5). The decoder's
    third add fills the table to 2^3, so the LAST TWO codes are read at
    FOUR bits (the spec's width-transition point)."""
    codes = [4, 1, 2, 2, 0, 5]
    data = _pack_codes(codes, [3, 3, 3, 3, 4, 4])
    assert _lzw_decode(2, data, 4) == [1, 2, 2, 0]


def test_hand_packed_width_growth():
    """Force the 3→4-bit width transition by hand: after the 4th add
    (codes 6,7,8,9... add #2 assigns 7, #3 assigns 8 == 2^3 → the READ
    width must bump to 4 bits BEFORE the next code)."""
    # input pixels: 0 1 0 1 0 1  (min code 2; clear=4, eoi=5)
    # spec walk: emit 0 (add "01"→6), emit 1 (add "10"→7),
    # emit 6="01" (add "010"→8 == 2^3 → width→4), emit 6="01" at
    # FOUR bits, emit eoi at four bits
    codes = [4, 0, 1, 6, 6, 5]
    widths = [3, 3, 3, 3, 4, 4]
    data = _pack_codes(codes, widths)
    assert _lzw_decode(2, data, 6) == [0, 1, 0, 1, 0, 1]
    # cross-check: our encoder emits byte-identical packing
    assert _lzw_encode(2, np.array([0, 1, 0, 1, 0, 1], np.uint8)) == data


def test_kwkwk_code_equals_table_size():
    """The KwKwK case: code == len(table) (spec §Appendix F example
    shape aaa...): codes [4, 0, 6, 7, 5] decode to six zeros —
    0, then "00" via KwKwK, then "000" via KwKwK again."""
    codes = [4, 0, 6, 7, 5]
    data = _pack_codes(codes, [3] * 5)
    assert _lzw_decode(2, data, 6) == [0] * 6


def test_interlaced_image_hand_built():
    """4x8 single-frame interlaced GIF built by hand: rows stored in
    pass order (0, 4 | 2, 6 | 1, 3, 5, 7) must deinterlace back."""
    w, h = 4, 8
    px = (np.arange(h * w).reshape(h, w) % 4).astype(np.uint8)
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = px[pass_order]
    gif = bytearray(_screen(w, h, PAL4))
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    gif.append(2)
    gif += _subblocks(_lzw_encode(2, stored))
    gif.append(0x3B)
    out = decode_gif(bytes(gif))
    assert np.array_equal(out["frames"][0], PAL4[px])


def test_transparency_composites_over_previous():
    """Frame 2 marks index 3 transparent: those pixels must keep frame
    1's colors (GCE per spec §23)."""
    w = h = 2
    f1 = np.array([[1, 1], [2, 2]], np.uint8)
    f2 = np.array([[3, 0], [3, 0]], np.uint8)  # 3 = transparent
    gif = bytearray(_screen(w, h, PAL4))
    for frame, flags in ((f1, 0x00), (f2, 0x01)):
        gif += b"\x21\xf9" + _subblocks(struct.pack("<BHB", flags, 0, 3))
        gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        gif.append(2)
        gif += _subblocks(_lzw_encode(2, frame))
    gif.append(0x3B)
    out = decode_gif(bytes(gif))
    want2 = PAL4[np.array([[1, 0], [2, 0]])]  # transparent kept f1 colors
    assert np.array_equal(out["frames"][0], PAL4[f1])
    assert np.array_equal(out["frames"][1], want2)


def test_disposal_restore_background():
    """Disposal=2 on frame 1: before frame 2 draws, frame 1's REGION is
    restored to the background color; frame 2 is a sub-rectangle, so
    the composite shows bg outside it."""
    pal = PAL4
    gif = bytearray(_screen(2, 2, pal, bg=0))
    # frame 1: full screen of color 1, disposal=2
    gif += b"\x21\xf9" + _subblocks(struct.pack("<BHB", 2 << 2, 0, 0))
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    gif.append(2)
    gif += _subblocks(_lzw_encode(2, np.full((2, 2), 1, np.uint8)))
    # frame 2: 1x1 at (1,1) of color 2
    gif += b"\x2c" + struct.pack("<HHHHB", 1, 1, 1, 1, 0)
    gif.append(2)
    gif += _subblocks(_lzw_encode(2, np.array([[2]], np.uint8)))
    gif.append(0x3B)
    out = decode_gif(bytes(gif))
    want = PAL4[np.array([[0, 0], [0, 2]])]  # bg everywhere except (1,1)
    assert np.array_equal(out["frames"][1], want)


def test_local_color_table_overrides_global():
    local = np.array([[9, 9, 9], [200, 100, 50]], np.uint8)
    table = np.zeros((2, 3), np.uint8)
    table[:2] = local
    gif = bytearray(_screen(1, 1, PAL4))
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80 | 0)  # 2-entry LCT
    gif += table.tobytes()
    gif.append(2)
    gif += _subblocks(_lzw_encode(2, np.array([[1]], np.uint8)))
    gif.append(0x3B)
    out = decode_gif(bytes(gif))
    assert tuple(out["frames"][0][0, 0]) == (200, 100, 50)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:5],                      # inside signature
        lambda b: b[:20],                     # inside color table
        lambda b: b[:-1],                     # missing trailer
        lambda b: b.replace(b"GIF89a", b"JIF89a", 1),
        lambda b: b + b"\x00",                # trailing garbage after 0x3B is fine… but trailer missing case above
    ],
)
def test_malformed_is_loud_or_exact(mutate):
    f = np.array([[0, 1], [2, 3]], np.uint8)
    good = encode_gif([f], PAL4)
    bad = mutate(good)
    try:
        out = decode_gif(bad)
    except ValueError:
        return
    # only acceptable silent case: extra bytes AFTER the trailer
    assert np.array_equal(out["frames"][0], PAL4[f])


def test_lzw_out_of_range_code_is_loud():
    # code 7 right after one literal: table holds 6 entries and the
    # KwKwK case only allows code == 6 — 7 is out of range
    data = _pack_codes([4, 0, 7, 5], [3, 3, 3, 3])
    with pytest.raises(ValueError):
        _lzw_decode(2, data, 10)


def test_frame_exceeding_screen_is_loud():
    gif = bytearray(_screen(2, 2, PAL4))
    gif += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)  # overflows
    gif.append(2)
    gif += _subblocks(_lzw_encode(2, np.zeros((2, 2), np.uint8)))
    gif.append(0x3B)
    with pytest.raises(ValueError):
        decode_gif(bytes(gif))


def test_short_lzw_output_is_loud():
    """Declared 2x2 but the stream encodes 3 pixels → loud."""
    gif = bytearray(_screen(2, 2, PAL4))
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    gif.append(2)
    gif += _subblocks(_pack_codes([4, 0, 0, 0, 5], [3] * 5))
    gif.append(0x3B)
    with pytest.raises(ValueError):
        decode_gif(bytes(gif))


def test_twelve_bit_reset_roundtrip():
    """Noise big enough to fill the 4096-entry table forces the
    encoder's clear/reset path; decode must stay exact through it."""
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    f = rng.integers(0, 256, (120, 160)).astype(np.uint8)
    out = decode_gif(encode_gif([f], pal))
    assert np.array_equal(out["frames"][0], pal[f])


def test_eoi_width_boundary_regression():
    """Fuzz-found: when the decoder's FINAL add lands exactly on a
    2^width boundary, EOI is read one bit wider than a naive encoder
    writes it. Pin the exact failing case (12 pixels, 4-color palette,
    10th add == table size 16) plus a sweep of lengths around every
    boundary."""
    import numpy as np

    from pygdf_spark.sources.gif_lite import decode_gif, encode_gif

    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    f = rng.integers(0, 4, (12, 1)).astype(np.uint8)
    out = decode_gif(encode_gif([f], pal))
    assert np.array_equal(out["frames"][0], pal[f])
    # sweep: incompressible strides of every length 1..80 cross the
    # 8/16/32/64-entry boundaries at every possible tail position
    pal2 = np.arange(12, dtype=np.uint8).reshape(4, 3)
    for n in range(1, 81):
        fr = (np.arange(n, dtype=np.uint8) * 3 % 4).reshape(n, 1)
        got = decode_gif(encode_gif([fr], pal2))
        assert np.array_equal(got["frames"][0], pal2[fr]), n

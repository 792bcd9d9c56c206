"""Per-format codec fuzz tier (r6, VERDICT r5 Next #6).

Randomized shape × dtype × null-fraction × truncation/corruption matrices
over the pure-Python codecs (avro_lite, npy_lite, safetensors_lite,
png_lite, wav_lite, warc_lite, webdataset_lite, gif_lite) — the analog
of the reference's
``python/cudf/cudf/_fuzz_testing/fuzzer.py:17-50`` per-format fuzzers.

Contract under test, per the verdict's phrasing: **exact round-trip or
loud error, never silent truncation**. Every strict prefix / byte-flip of
an encoded artifact must either raise or (where the format genuinely
cannot detect it — Avro OCF's block-boundary clean-EOF) return an empty
result, never a silently shortened one.

No Spark involved — these are pure host-side codec properties, so the
tier is fast enough to run hypothesis at default example counts.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pygdf_spark.sources.avro_lite import encode_avro, read_records_buf
from pygdf_spark.sources.npy_lite import decode_npy, encode_npy
from pygdf_spark.sources.png_lite import decode_png, encode_png
from pygdf_spark.sources.safetensors_lite import (
    decode_safetensors,
    encode_safetensors,
)
from pygdf_spark.sources.wav_lite import decode_wav, encode_wav

FUZZ = settings(max_examples=40, deadline=None)


# -- strategies -----------------------------------------------------------

_NPY_DTYPES = ["<i1", "<i2", "<i4", "<i8", "<u1", "<u2", "<u4", "<u8",
               "<f4", "<f8", "|b1"]
_ST_DTYPES = ["<f8", "<f4", "<i8", "<i4", "<i2", "|i1", "<u8", "<u4",
              "<u2", "|u1", "|b1"]


@st.composite
def np_arrays(draw, dtypes=_NPY_DTYPES, max_rows=40, max_cols=8):
    dt = np.dtype(draw(st.sampled_from(dtypes)))
    ndim = draw(st.integers(1, 2))
    shape = tuple(draw(st.integers(0, max_rows if i == 0 else max_cols))
                  for i in range(ndim))
    n = int(np.prod(shape)) if shape else 1
    raw = draw(st.binary(min_size=n * dt.itemsize, max_size=n * dt.itemsize))
    arr = np.frombuffer(raw, dtype=dt, count=n).reshape(shape)
    if dt == np.dtype("|b1"):
        arr = (np.frombuffer(raw, dtype="u1", count=n) & 1).astype(bool).reshape(shape)
    return arr


@st.composite
def avro_frames(draw):
    """1-4 columns over the supported dtype matrix with 0-50% nulls."""
    n = draw(st.integers(0, 30))
    ncols = draw(st.integers(1, 4))
    cols = {}
    for i in range(ncols):
        kind = draw(st.sampled_from(["Int64", "Float64", "boolean", "str"]))
        nullable = draw(st.booleans())
        if kind == "Int64":
            vals = draw(st.lists(st.integers(-(2**63), 2**63 - 1),
                                 min_size=n, max_size=n))
        elif kind == "Float64":
            vals = draw(st.lists(
                st.floats(allow_nan=False, allow_infinity=True, width=64),
                min_size=n, max_size=n))
        elif kind == "boolean":
            vals = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        else:
            vals = draw(st.lists(st.text(max_size=12), min_size=n, max_size=n))
        if nullable and n:
            mask = draw(st.lists(st.booleans(), min_size=n, max_size=n))
            vals = [None if m else v for v, m in zip(vals, mask)]
        if kind == "str":
            cols[f"c{i}"] = pd.array(vals, dtype="object")
        else:
            cols[f"c{i}"] = pd.array(vals, dtype=kind)
    return pd.DataFrame(cols)


# -- avro -----------------------------------------------------------------

@FUZZ
@given(pdf=avro_frames(), codec=st.sampled_from(["deflate", "null"]))
def test_avro_fuzz_roundtrip(pdf, codec):
    _, records = read_records_buf(encode_avro(pdf, codec=codec))
    assert len(records) == len(pdf)
    for rec, (_, row) in zip(records, pdf.iterrows()):
        for c in pdf.columns:
            want = row[c]
            got = rec[c]
            if want is None or want is pd.NA or (
                isinstance(want, float) and want != want
            ):
                assert got is None, (c, want, got)
            elif isinstance(want, (bool, np.bool_)):
                assert got is want or got == bool(want)
            elif isinstance(want, float):
                assert got == want or (got != got and want != want)
            else:
                assert got == want, (c, want, got)


@FUZZ
@given(pdf=avro_frames(), data=st.data())
def test_avro_fuzz_truncation(pdf, data):
    blob = encode_avro(pdf, codec="deflate")
    cut = data.draw(st.integers(0, len(blob) - 1))
    try:
        _, records = read_records_buf(blob[:cut])
    except Exception:
        return  # loud error — the contract
    # Avro OCF has no trailer: a prefix ending exactly at a block
    # boundary is clean-EOF by design. For these single-block blobs the
    # only silently-decodable prefix is the header (zero blocks) —
    # anything else returning rows would be silent data loss.
    assert records == [], f"silent truncation at {cut}/{len(blob)}"


# -- npy ------------------------------------------------------------------

@FUZZ
@given(arr=np_arrays())
def test_npy_fuzz_roundtrip(arr):
    out = decode_npy(encode_npy(arr))
    assert out.dtype == arr.dtype and out.shape == arr.shape
    assert np.array_equal(out, arr, equal_nan=True)


@FUZZ
@given(arr=np_arrays())
def test_npy_fuzz_numpy_interop(arr):
    # our encoder -> numpy's reader
    theirs = np.load(io.BytesIO(encode_npy(arr)))
    assert np.array_equal(theirs, arr, equal_nan=True)
    # numpy's writer -> our decoder (covers v1 headers + fortran_order)
    for a in (arr, np.asfortranarray(arr)):
        buf = io.BytesIO()
        np.save(buf, a)
        ours = decode_npy(buf.getvalue())
        assert np.array_equal(ours, a, equal_nan=True)


@FUZZ
@given(arr=np_arrays(), data=st.data())
def test_npy_fuzz_truncation(arr, data):
    blob = encode_npy(arr)
    cut = data.draw(st.integers(0, len(blob) - 1))
    with pytest.raises(Exception):
        out = decode_npy(blob[:cut])
        # body size is exact (n*itemsize): any strict prefix must raise
        raise AssertionError(
            f"silent truncation at {cut}/{len(blob)} -> shape {out.shape}"
        )


# -- safetensors ----------------------------------------------------------

@FUZZ
@given(tensors=st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    np_arrays(dtypes=_ST_DTYPES, max_rows=20, max_cols=6),
    min_size=1, max_size=3,
))
def test_safetensors_fuzz_roundtrip(tensors):
    out, _ = decode_safetensors(encode_safetensors(tensors))
    assert set(out) == set(tensors)
    for k, arr in tensors.items():
        assert out[k].dtype == arr.dtype.newbyteorder("<") or \
            out[k].dtype == arr.dtype
        assert out[k].shape == arr.shape
        assert np.array_equal(out[k], arr, equal_nan=True)


@FUZZ
@given(tensors=st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=4),
    np_arrays(dtypes=_ST_DTYPES, max_rows=10, max_cols=4),
    min_size=1, max_size=2,
), data=st.data())
def test_safetensors_fuzz_truncation(tensors, data):
    blob = encode_safetensors(tensors)
    cut = data.draw(st.integers(0, len(blob) - 1))
    with pytest.raises(Exception):
        decode_safetensors(blob[:cut])
        raise AssertionError(f"silent truncation at {cut}/{len(blob)}")


# -- png ------------------------------------------------------------------

@FUZZ
@given(data=st.data())
def test_png_fuzz_roundtrip(data):
    h = data.draw(st.integers(1, 24))
    w = data.draw(st.integers(1, 24))
    ch = data.draw(st.sampled_from([1, 2, 3, 4]))
    ft = data.draw(st.sampled_from([0, 1, 2, 3, 4, "mixed"]))
    raw = data.draw(st.binary(min_size=h * w * ch, max_size=h * w * ch))
    img = np.frombuffer(raw, np.uint8).reshape(h, w, ch)
    w2, h2, c2, out = decode_png(encode_png(img, ft))
    assert (w2, h2, c2) == (w, h, ch)
    assert np.array_equal(out, img)


@FUZZ
@given(data=st.data())
def test_png_fuzz_corruption(data):
    h = data.draw(st.integers(1, 12))
    w = data.draw(st.integers(1, 12))
    raw = data.draw(st.binary(min_size=h * w * 3, max_size=h * w * 3))
    blob = bytearray(encode_png(np.frombuffer(raw, np.uint8).reshape(h, w, 3)))
    mode = data.draw(st.sampled_from(["truncate", "flip"]))
    if mode == "truncate":
        cut = data.draw(st.integers(0, len(blob) - 1))
        bad = bytes(blob[:cut])
    else:
        # every byte is covered by the signature or a chunk CRC, so ANY
        # single-byte flip must be detected
        i = data.draw(st.integers(0, len(blob) - 1))
        flip = data.draw(st.integers(1, 255))
        blob[i] ^= flip
        bad = bytes(blob)
    with pytest.raises(ValueError):
        decode_png(bad)


# -- wav ------------------------------------------------------------------

@FUZZ
@given(data=st.data())
def test_wav_fuzz_roundtrip(data):
    n = data.draw(st.integers(0, 200))
    ch = data.draw(st.integers(1, 4))
    rate = data.draw(st.sampled_from([8000, 16000, 44100]))
    raw = data.draw(st.binary(min_size=n * ch * 2, max_size=n * ch * 2))
    samples = np.frombuffer(raw, "<i2").reshape(n, ch)
    r2, c2, out = decode_wav(encode_wav(samples, rate))
    assert (r2, c2) == (rate, ch)
    assert np.array_equal(out, samples)


@FUZZ
@given(data=st.data())
def test_wav_fuzz_truncation(data):
    n = data.draw(st.integers(1, 50))
    ch = data.draw(st.integers(1, 2))
    raw = data.draw(st.binary(min_size=n * ch * 2, max_size=n * ch * 2))
    blob = encode_wav(np.frombuffer(raw, "<i2").reshape(n, ch))
    cut = data.draw(st.integers(0, len(blob) - 1))
    with pytest.raises(ValueError):
        decode_wav(blob[:cut])


# -- warc -----------------------------------------------------------------

@st.composite
def warc_records(draw):
    n = draw(st.integers(0, 10))
    recs = []
    for i in range(n):
        payload = draw(st.binary(max_size=200))
        recs.append({
            "warc_type": "response",
            "target_uri": f"https://x.example/{i}",
            "date": "2026-01-01T00:00:00Z",
            "record_id": f"id-{i}",
            "payload": payload,
        })
    return recs


@FUZZ
@given(recs=warc_records(), gz=st.booleans())
def test_warc_fuzz_roundtrip(recs, gz):
    from pygdf_spark.sources.warc_lite import decode_warc, encode_warc

    out = decode_warc(encode_warc(recs, gzip_members=gz))
    assert len(out) == len(recs)
    for want, got in zip(recs, out):
        assert got["payload"] == want["payload"]
        assert got["target_uri"] == want["target_uri"]
        assert got["record_id"] == want["record_id"]


@FUZZ
@given(recs=warc_records(), gz=st.booleans(), data=st.data())
def test_warc_fuzz_truncation(recs, gz, data):
    from pygdf_spark.sources.warc_lite import decode_warc, encode_warc

    blob = encode_warc(recs, gzip_members=gz)
    if len(blob) < 2:
        return
    cut = data.draw(st.integers(1, len(blob) - 1))
    try:
        out = decode_warc(blob[:cut])
    except Exception:
        return  # loud error — the contract
    # gzip members and CRLF-delimited records both end on exact
    # boundaries, so a prefix that decodes cleanly contains only WHOLE
    # records (the stream has no trailer-count by design, like Avro
    # OCF) — never a mangled one. len(out) == len(recs) is possible
    # when the cut lands inside the LAST record's trailing CRLF
    # decoration (payload is Content-Length-complete by then), so the
    # count check is ≤, and byte-equality is the real contract.
    assert len(out) <= len(recs)
    for want, got in zip(recs, out):
        assert got["payload"] == want["payload"]


# -- webdataset -----------------------------------------------------------

@FUZZ
@given(data=st.data())
def test_webdataset_fuzz_roundtrip(data):
    from pygdf_spark.sources.webdataset_lite import (
        decode_webdataset,
        encode_webdataset,
    )

    n = data.draw(st.integers(0, 12))
    samples = []
    for i in range(n):
        ext = data.draw(st.sampled_from(["txt", "json", "png", "cls"]))
        body = data.draw(st.binary(max_size=300))
        samples.append((f"sample{i:04d}", ext, body))
    out = decode_webdataset(encode_webdataset(samples))
    assert out == samples
    # determinism: byte-identical re-encode (zeroed mtime/uid/gid)
    assert encode_webdataset(samples) == encode_webdataset(list(samples))


@FUZZ
@given(data=st.data())
def test_webdataset_fuzz_truncation(data):
    from pygdf_spark.sources.webdataset_lite import (
        decode_webdataset,
        encode_webdataset,
    )

    samples = [(f"s{i}", "txt", bytes([i]) * 50) for i in range(4)]
    blob = encode_webdataset(samples)
    cut = data.draw(st.integers(1, len(blob) - 1))
    try:
        out = decode_webdataset(blob[:cut])
    except ValueError:
        return  # loud error — the contract
    # tar has a 2-block zero trailer; a prefix that still parses holds a
    # PREFIX of whole members (cutting only trailer blocks keeps all of
    # them) — never a mangled or reordered one
    assert out == samples[:len(out)]


def test_png_vector_unfilter_matches_scalar_oracle():
    """The r6 vectorized de-filter against the retained spec-literal
    scalar path, every filter type x channel count."""
    import struct
    import zlib

    from pygdf_spark.sources.png_lite import _unfilter, _unfilter_scalar

    rng = np.random.default_rng(42)
    for ch in (1, 2, 3, 4):
        for ft in (0, 1, 2, 3, 4, "mixed"):
            h, w = 19, 23
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            blob = encode_png(img, ft)
            pos, idat = 8, bytearray()
            while pos + 8 <= len(blob):
                (ln,) = struct.unpack(">I", blob[pos:pos + 4])
                if blob[pos + 4:pos + 8] == b"IDAT":
                    idat.extend(blob[pos + 8:pos + 8 + ln])
                pos += 12 + ln
            lines = zlib.decompress(bytes(idat))
            a = _unfilter(lines, h, w * ch, ch)
            b = _unfilter_scalar(lines, h, w * ch, ch)
            assert np.array_equal(a, b), (ch, ft)


# -- r6 adversarial-review pins (warc/webdataset write hardening) -----------


def test_warc_many_member_decode_linear():
    """A Common-Crawl-shaped shard (50k gzip members, ~250 B payloads)
    must decode correctly AND linearly. Both the decompressobj/
    unused_data loop and one-shot gzip.decompress (the SAME loop
    internally) re-slice the remaining buffer per member — measured
    89 s on exactly this input; the streaming GzipFile path takes
    <1 s. The 10 s bound fails either quadratic implementation by an
    order of magnitude while staying loose for slow CI hosts."""
    import time

    from pygdf_spark.sources.warc_lite import decode_warc, encode_warc

    recs = [
        {"target_uri": f"http://x/{i}", "date": "2024-01-01T00:00:00Z",
         "record_id": f"id{i}", "payload": (f"payload {i}" * 20).encode()}
        for i in range(50000)
    ]
    blob = encode_warc(recs, gzip_members=True)
    t0 = time.monotonic()
    out = decode_warc(blob)
    took = time.monotonic() - t0
    assert len(out) == 50000
    assert out[49999]["payload"] == b"payload 49999" * 20
    assert took < 10.0, f"multi-member decode took {took:.1f}s"


def test_warc_write_null_payload_raises(spark, tmp_path):
    from pygdf_spark.sources.warc_lite import write_warc_dir

    df = spark.createDataFrame(
        [("u1", "2024-01-01", "r1", b"ok"), ("u2", "2024-01-01", "r2", None)],
        "uri string, date string, rid string, payload binary",
    ).coalesce(1)
    try:
        write_warc_dir(df, str(tmp_path / "w"), "uri", "date", "rid", "payload")
        raise AssertionError("null payload silently serialized")
    except Exception as e:
        assert "null value in WARC write" in str(e)


def test_webdataset_write_null_field_raises(spark, tmp_path):
    from pygdf_spark.sources.webdataset_lite import write_webdataset

    df = spark.createDataFrame(
        [("k1", "hello"), ("k2", None)], "key string, text string"
    ).coalesce(1)
    try:
        write_webdataset(df, str(tmp_path / "t"), "key", {"text": "txt"})
        raise AssertionError("null field silently serialized as b'None'")
    except Exception as e:
        assert "null value in WebDataset write" in str(e)


def test_webdataset_write_nonidentifier_column(spark, tmp_path):
    """Column names pandas would mangle under itertuples must still
    land in the right member (positional-zip regression pin)."""
    from pygdf_spark.sources.webdataset_lite import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [("k1", "alpha", "beta")],
        ["key", "my col", "class"],  # space + python keyword
    ).coalesce(1)
    write_webdataset(
        df, str(tmp_path / "t2"), "key", {"my col": "a", "class": "b"}
    )
    rows = {
        (r.key, r.ext): bytes(r.data)
        for r in read_webdataset(spark, str(tmp_path / "t2")).collect()
    }
    assert rows[("k1", "a")] == b"alpha"
    assert rows[("k1", "b")] == b"beta"


# -- gif_lite (late r6: LZW + compositing) --------------------------------

_gif_case = st.tuples(
    st.integers(1, 40),        # width
    st.integers(1, 30),        # height
    st.integers(1, 4),         # frames
    st.sampled_from([2, 4, 16, 64, 256]),  # palette size
    st.integers(0, 2**31 - 1),  # seed
)


@FUZZ
@given(_gif_case)
def test_gif_fuzz_roundtrip(case):
    from pygdf_spark.sources.gif_lite import decode_gif, encode_gif

    w, h, nf, npal, seed = case
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    frames = [rng.integers(0, npal, (h, w)).astype(np.uint8)
              for _ in range(nf)]
    delays = [int(rng.integers(0, 600)) for _ in range(nf)]
    out = decode_gif(encode_gif(frames, pal, delays_cs=delays))
    assert out["width"] == w and out["height"] == h
    assert len(out["frames"]) == nf
    assert out["delays_cs"] == delays
    for f, got in zip(frames, out["frames"]):
        assert np.array_equal(got, pal[f])


@FUZZ
@given(_gif_case, st.data())
def test_gif_fuzz_truncation(case, data):
    """Every strict prefix raises — GIF requires an explicit trailer,
    so silent short decodes are impossible by construction."""
    from pygdf_spark.sources.gif_lite import decode_gif, encode_gif

    w, h, nf, npal, seed = case
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    frames = [rng.integers(0, npal, (h, w)).astype(np.uint8)
              for _ in range(nf)]
    buf = encode_gif(frames, pal)
    cut = data.draw(st.integers(0, len(buf) - 1))
    with pytest.raises(ValueError):
        decode_gif(buf[:cut])


@FUZZ
@given(_gif_case, st.data())
def test_gif_fuzz_byte_flip_loud_or_wrong_pixels_only(case, data):
    """GIF has no CRC, so a flipped byte may legally change pixels —
    but it must NEVER crash with a non-ValueError or hang: decode
    either raises ValueError or returns frames of the declared
    geometry."""
    from pygdf_spark.sources.gif_lite import decode_gif, encode_gif

    w, h, nf, npal, seed = case
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    frames = [rng.integers(0, npal, (h, w)).astype(np.uint8)
              for _ in range(nf)]
    buf = bytearray(encode_gif(frames, pal))
    pos = data.draw(st.integers(6, len(buf) - 1))
    bit = data.draw(st.integers(0, 7))
    buf[pos] ^= 1 << bit
    try:
        out = decode_gif(bytes(buf))
    except ValueError:
        return
    for f in out["frames"]:
        assert f.shape == (out["height"], out["width"], 3)

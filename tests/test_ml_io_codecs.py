"""NPY/safetensors spec-codec tests: hand-built bitstreams (independent
of the encoders), round-trips, malformed rejection, and the distributed
shard-directory read path."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from pygdf_spark.sources.npy_lite import decode_npy, encode_npy
from pygdf_spark.sources.safetensors_lite import (
    decode_safetensors,
    encode_safetensors,
)


def test_npy_handbuilt_header():
    # hand-author a v1.0 npy: 3 int16 values, header padded per spec
    header = "{'descr': '<i2', 'fortran_order': False, 'shape': (3,), }"
    pad = 64 - ((6 + 4 + len(header) + 1) % 64)
    header = header + " " * pad + "\n"
    raw = (b"\x93NUMPY\x01\x00" + struct.pack("<H", len(header))
           + header.encode() + struct.pack("<3h", -5, 0, 300))
    arr = decode_npy(raw)
    assert arr.dtype == np.int16 and arr.tolist() == [-5, 0, 300]


def test_npy_roundtrip_and_errors():
    for a in [np.arange(6, dtype=np.int64),
              np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32),
              np.array([], dtype=np.float64),
              np.array(True)]:
        out = decode_npy(encode_npy(a))
        assert out.dtype == a.dtype and out.shape == a.shape
        assert np.array_equal(out, a)
    with pytest.raises(ValueError, match="magic"):
        decode_npy(b"PK\x03\x04junk")
    with pytest.raises(ValueError, match="version"):
        decode_npy(b"\x93NUMPY\x09\x00" + b"\x00" * 16)


def test_npy_fortran_order_reconstruction():
    a = np.asfortranarray(np.arange(12).reshape(3, 4))
    hdr = "{'descr': '<i8', 'fortran_order': True, 'shape': (3, 4), }"
    pad = 64 - ((6 + 4 + len(hdr) + 1) % 64)
    hdr = hdr + " " * pad + "\n"
    raw = (b"\x93NUMPY\x01\x00" + struct.pack("<H", len(hdr))
           + hdr.encode() + a.tobytes(order="F"))
    assert np.array_equal(decode_npy(raw), a)


def test_safetensors_handbuilt():
    # hand-author per the public spec: u64 header len + JSON + buffer
    body = struct.pack("<4i", 1, 2, 3, 4) + struct.pack("<2f", 0.5, -1.5)
    header = json.dumps({
        "ints": {"dtype": "I32", "shape": [2, 2], "data_offsets": [0, 16]},
        "floats": {"dtype": "F32", "shape": [2], "data_offsets": [16, 24]},
        "__metadata__": {"who": "test"},
    }).encode()
    raw = struct.pack("<Q", len(header)) + header + body
    tensors, meta = decode_safetensors(raw)
    assert tensors["ints"].tolist() == [[1, 2], [3, 4]]
    assert tensors["floats"].tolist() == [0.5, -1.5]
    assert meta == {"who": "test"}


def test_safetensors_roundtrip_and_errors():
    t = {
        "w": np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32),
        "b": np.arange(8, dtype=np.int64),
        "flag": np.array([True, False]),
        "scalar": np.array(7, dtype=np.int32),
    }
    out, meta = decode_safetensors(encode_safetensors(t, {"k": 1}))
    for k in t:
        assert out[k].shape == t[k].shape and out[k].dtype == t[k].dtype
        assert np.array_equal(out[k], t[k])
    assert meta == {"k": "1"}

    with pytest.raises(ValueError, match="truncated"):
        decode_safetensors(b"\x01\x02")
    big = struct.pack("<Q", 10**6) + b"{}"
    with pytest.raises(ValueError, match="header overruns"):
        decode_safetensors(big)
    # offsets escaping the buffer must be rejected (zero-trust parse)
    hdr = json.dumps({"x": {"dtype": "F32", "shape": [4],
                            "data_offsets": [0, 999]}}).encode()
    with pytest.raises(ValueError, match="out of range"):
        decode_safetensors(struct.pack("<Q", len(hdr)) + hdr + b"\x00" * 16)
    hdr2 = json.dumps({"x": {"dtype": "F32", "shape": [4],
                             "data_offsets": [0, 8]}}).encode()
    with pytest.raises(ValueError, match="size mismatch"):
        decode_safetensors(struct.pack("<Q", len(hdr2)) + hdr2 + b"\x00" * 8)


def test_npy_shard_dir_roundtrip(spark, tmp_path):
    import pandas as pd

    from pygdf_spark.sources.npy_lite import read_npy_dir, write_npy_dir

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": [rng.normal(size=4).astype(np.float32).tolist()
                      for _ in range(40)],
    })
    df = spark.createDataFrame(pdf).repartition(3)
    path = str(tmp_path / "shards")
    write_npy_dir(df, path, "vec_id", "embedding")
    back = read_npy_dir(spark, path).orderBy("vec_id").collect()
    assert [r["vec_id"] for r in back] == list(range(40))
    got = np.array([r["embedding"] for r in back], dtype=np.float32)
    exp = np.array(pdf["embedding"].tolist(), dtype=np.float32)
    assert np.array_equal(got, exp)  # float32 bits survive exactly


def test_package_level_readers(spark, tmp_path):
    """cudf-style module functions: gd.read_npy_dir / gd.read_safetensors."""
    import pandas as pd

    import pygdf_spark as gd
    from pygdf_spark.sources.npy_lite import write_npy_dir
    from pygdf_spark.sources.safetensors_lite import encode_safetensors

    pdf = pd.DataFrame({"vec_id": [1, 2],
                        "embedding": [[0.5, 1.5], [2.5, 3.5]]})
    d = str(tmp_path / "sh")
    write_npy_dir(spark.createDataFrame(pdf), d, "vec_id", "embedding")
    out = gd.read_npy_dir(d, spark=spark).to_pandas()
    assert sorted(out["vec_id"].tolist()) == [1, 2]

    p = str(tmp_path / "t.safetensors")
    with open(p, "wb") as f:
        f.write(encode_safetensors({"w": np.arange(4, dtype=np.int64)}))
    inv = gd.read_safetensors(p, spark=spark).to_pandas()
    assert inv["tensor"].tolist() == ["w"] and inv["n_elems"].tolist() == [4]


def test_npz_roundtrip_and_malformed(spark, sf_dir, tmp_path):
    """Sharded .npz write→read preserves float32 bits; malformed zips
    and mismatched members raise ValueError (fail-loud)."""
    import os
    import zipfile

    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from pygdf_spark.sources.npy_lite import (
        encode_npy,
        read_npz_dir,
        write_npz_dir,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    src = emb.select("vec_id", "embedding").repartition(3)
    path = str(tmp_path / "npz")
    write_npz_dir(src, path, "vec_id", "embedding")
    shards = [n for n in os.listdir(path) if n.endswith(".npz")]
    assert len(shards) >= 1 and not [n for n in os.listdir(path)
                                     if n.startswith(".tmp")]
    back = read_npz_dir(spark, path)
    a = {r["vec_id"]: r["embedding"] for r in src.collect()}
    b = {r["vec_id"]: r["embedding"] for r in back.collect()}
    assert a == b  # float32 bit-exact both ways
    # malformed member set → loud
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with zipfile.ZipFile(os.path.join(bad, "part-00000.npz"), "w") as z:
        z.writestr("ids.npy", encode_npy(np.arange(3, dtype=np.int64)))
        z.writestr("vecs.npy", encode_npy(np.zeros((2, 4), np.float32)))
    with pytest.raises(Exception, match="length mismatch"):
        read_npz_dir(spark, bad).collect()
    # not a zip at all → loud
    worse = str(tmp_path / "worse")
    os.makedirs(worse)
    with open(os.path.join(worse, "part-00000.npz"), "wb") as f:
        f.write(b"not a zip")
    with pytest.raises(Exception, match="malformed shard"):
        read_npz_dir(spark, worse).collect()

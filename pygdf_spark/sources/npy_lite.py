"""Pure-Python NPY shard source/sink — distributed numpy-format IO.

The ``.npy`` format (public numpy NEP spec: magic ``\\x93NUMPY``,
version, ASCII header dict ``{descr, fortran_order, shape}``, raw
little-endian array body) is the lingua franca for embedding/tensor
interchange in ML data pipelines. A single ``.npy`` is not splittable,
so the distributed layout is the standard SHARD DIRECTORY: one
``part-<i>.npy`` per partition (the same layout Spark uses for every
columnar sink). Write fans out via ``mapInPandas`` (each executor
serializes its own partition locally — no driver collect); read lists
the shards into Spark's ``binaryFile`` source and decodes per shard in
``mapInPandas`` — shards are the parallelism unit, like parquet
row-groups.

Header parsing uses ``ast.literal_eval`` (the spec's own recommendation)
— never ``eval`` — and only the simple-dtype subset (numeric/bool), 1-D
or 2-D C-order, which is what embedding shards are.
"""

from __future__ import annotations

import ast
import struct

import numpy as np

_MAGIC = b"\x93NUMPY"


def encode_npy(arr: np.ndarray) -> bytes:
    """Serialize a C-order array to NPY v1.0 bytes (spec layout)."""
    arr = np.asarray(arr)
    if arr.ndim:  # ascontiguousarray would promote 0-d to (1,)
        arr = np.ascontiguousarray(arr)
    descr = arr.dtype.str  # e.g. '<f4'
    header = "{'descr': %r, 'fortran_order': False, 'shape': %r, }" % (
        descr, tuple(arr.shape))
    # pad with spaces so magic+2+2+len(header)+1 is a multiple of 64
    pad = 64 - ((len(_MAGIC) + 4 + len(header) + 1) % 64)
    header = header + " " * pad + "\n"
    return (
        _MAGIC + b"\x01\x00" + struct.pack("<H", len(header))
        + header.encode("latin1") + arr.tobytes()
    )


def decode_npy(data: bytes) -> np.ndarray:
    """Parse NPY v1/v2 bytes -> ndarray (simple dtypes, C-order)."""
    if data[:6] != _MAGIC:
        raise ValueError("not an NPY file: bad magic")
    major = data[6]
    if major == 1:
        (hlen,) = struct.unpack("<H", data[8:10])
        off = 10
    elif major == 2:
        (hlen,) = struct.unpack("<I", data[8:12])
        off = 12
    else:
        raise ValueError(f"unsupported NPY version {major}")
    header = ast.literal_eval(data[off : off + hlen].decode("latin1"))
    dtype = np.dtype(header["descr"])
    if dtype.hasobject:
        raise ValueError("object dtypes not supported")
    shape = tuple(header["shape"])
    body = data[off + hlen :]
    n = int(np.prod(shape)) if shape else 1
    arr = np.frombuffer(body, dtype=dtype, count=n).reshape(shape)
    if header.get("fortran_order"):
        arr = np.asfortranarray(arr.reshape(shape[::-1]).T)
    return arr


def write_npy_dir(df, path: str, id_col: str, vec_col: str) -> None:
    """Write (id, vector) rows as a shard directory: per partition, one
    ``ids-<pid>.npy`` (int64) + ``vecs-<pid>.npy`` (float32 2-D) pair.
    Executor-local serialization via mapInPandas; the tiny per-shard
    result frame (shard path + row count) is the only thing that moves.

    Task-retry safety: shards are named by ``TaskContext.partitionId()``
    (a retry/speculative attempt OVERWRITES its own shard instead of
    adding a duplicate) and each file is written to a ``.tmp-<uuid>``
    sibling then ``os.replace``d into place, so a killed attempt can
    never leave a torn shard that ``read_npy_dir`` would decode.

    Filesystem scope: the WRITE path opens executor-local POSIX paths —
    it requires ``path`` to be a filesystem shared by all executors
    (local[*] / NFS); for object stores, write parquet and convert, or
    run the writer per-node. The READ path (``read_npy_dir``) goes
    through Spark's ``binaryFile`` source and is FS-agnostic."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)

    def dump(batches):
        import uuid

        from pyspark import TaskContext

        ids, vecs = [], []
        for pdf in batches:
            ids.extend(int(v) for v in pdf[id_col])
            vecs.extend(list(v) for v in pdf[vec_col])
        if ids:
            pid = f"{TaskContext.get().partitionId():06d}"
            for prefix, payload in (
                ("ids", np.asarray(ids, dtype=np.int64)),
                ("vecs", np.asarray(vecs, dtype=np.float32)),
            ):
                final = os.path.join(path, f"{prefix}-{pid}.npy")
                tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
                with open(tmp, "wb") as f:
                    f.write(encode_npy(payload))
                os.replace(tmp, final)
            yield pd.DataFrame({"shard": [pid], "rows": [len(ids)]})

    df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        dump, "shard string, rows long"
    ).write.format("noop").mode("overwrite").save()


def read_npy_dir(spark, path: str):
    """Read an id/vector shard directory back to (id, vector) rows.

    Spark's ``binaryFile`` source distributes whole shards to
    executors (one task per file — the format's parallelism unit);
    the ids/vecs halves of each shard pair are re-united by an equi-
    join on the shard id (FS-agnostic: works on HDFS/S3 paths exactly
    like local ones), then decoded in mapInPandas."""
    import pandas as pd
    from pyspark.sql import functions as F

    def half(prefix: str, alias: str):
        return (
            spark.read.format("binaryFile")
            .load(f"{path}/{prefix}-*.npy")
            .select(
                F.regexp_extract("path", rf"{prefix}-([0-9a-f]+)\.npy$", 1).alias("shard"),
                F.col("content").alias(alias),
            )
        )

    paired = half("ids", "ids_bytes").join(half("vecs", "vecs_bytes"), "shard")

    def load(batches):
        for pdf in batches:
            for shard, ib, vb in zip(pdf["shard"], pdf["ids_bytes"], pdf["vecs_bytes"]):
                ids = decode_npy(bytes(ib))
                vecs = decode_npy(bytes(vb))
                if len(ids) != len(vecs):
                    raise ValueError(f"shard mismatch {shard}")
                yield pd.DataFrame({
                    "vec_id": ids.astype("int64"),
                    "embedding": [row.tolist() for row in vecs],
                })

    return paired.mapInPandas(load, "vec_id long, embedding array<float>")


# ----------------------------------------------------------------- npz


def write_npz_dir(df, path: str, id_col: str, vec_col: str) -> None:
    """Sharded ``.npz`` sink: one zip container per partition holding
    the standard numpy archive members (``ids.npy`` + ``vecs.npy``).
    Same commit discipline as write_npy_dir: TaskContext-named shards
    (retries overwrite, never duplicate) written temp-then-rename.
    ZIP_STORED — the float payload is incompressible and STORED keeps
    the member byte ranges seekable for partial readers."""
    import io
    import os
    import uuid
    import zipfile

    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(path, exist_ok=True)

    def dump(batches):
        pid = TaskContext.get().partitionId()
        ids, vecs = [], []
        for pdf in batches:
            if len(pdf):
                ids.append(np.asarray(pdf[id_col], np.int64))
                vecs.append(
                    np.stack([np.asarray(v, np.float32) for v in pdf[vec_col]])
                )
        if ids:
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
                z.writestr("ids.npy", encode_npy(np.concatenate(ids)))
                z.writestr("vecs.npy", encode_npy(np.vstack(vecs)))
            tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex[:8]}")
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.replace(tmp, os.path.join(path, f"part-{pid:05d}.npz"))
        yield pd.DataFrame({"n": [len(ids)]})

    df.mapInPandas(dump, "n long").collect()  # bounded: 1 row/partition


def read_npz_dir(spark, path: str):
    """Read ``.npz`` shards back to (vec_id, embedding) rows — whole
    zip containers distribute through binaryFile (one task per shard),
    members decode with the same npy codec. Malformed zips or
    mismatched member lengths raise (fail-loud)."""
    import io
    import zipfile

    import pandas as pd

    files = spark.read.format("binaryFile").load(f"{path}/part-*.npz")

    def load(batches):
        for pdf in batches:
            for content in pdf["content"]:
                try:
                    z = zipfile.ZipFile(io.BytesIO(bytes(content)))
                    ids = decode_npy(z.read("ids.npy"))
                    vecs = decode_npy(z.read("vecs.npy"))
                except (zipfile.BadZipFile, KeyError) as e:
                    raise ValueError(f"npz: malformed shard: {e}") from e
                if len(ids) != len(vecs):
                    raise ValueError("npz: ids/vecs length mismatch")
                yield pd.DataFrame({
                    "vec_id": ids.astype("int64"),
                    "embedding": [row.tolist() for row in vecs],
                })

    return files.select("content").mapInPandas(
        load, "vec_id long, embedding array<float>"
    )

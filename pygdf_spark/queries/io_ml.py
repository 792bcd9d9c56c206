"""ML-interchange IO round-trips: NPY shard directories and safetensors.

Training-data pipelines at 100 TB meet tensors in two public formats
besides parquet: sharded ``.npy`` (embedding dumps) and safetensors
(checkpoint/embedding containers). Both are implemented as pure-Python
spec codecs (``sources/npy_lite.py`` / ``sources/safetensors_lite.py``
— the avro_lite jar-free pattern): write fans out per partition via
``mapInPandas``; read distributes whole shards through Spark's
``binaryFile`` source (one task per shard, the format's parallelism
unit).

Oracle discipline: every stat over float payloads is the ORDER-
INDEPENDENT integer fold ``SUM(FLOOR(e*1000))`` — float32 bits survive
both round-trips exactly, and floor-quantizing per element avoids both
accumulation-order drift and .5-tie rounding divergence.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T


def _tmp(sf_dir: str, tag: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(tempfile.gettempdir(), f"pygdf_{tag}_{sf}")


def _vec_milli(col: str = "embedding"):
    """In-row order-independent checksum: Σ floor(1000·e) as BIGINT."""
    return F.aggregate(
        F.transform(col, lambda e: F.floor(e.cast("double") * 1000).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def io_npy_roundtrip(spark, sf_dir):
    """embeddings → sharded .npy write (ids/vecs pairs, one per
    partition) → binaryFile read-back → per-row dim + checksum.
    The round-trip preserves float32 bits, so the oracle reads the
    ORIGINAL parquet."""
    from pygdf_spark.sources.npy_lite import read_npy_dir, write_npy_dir

    # shard-size discipline: .npy shards should be partition-sized
    # artifacts (100MB-class at production), not 32 micro-files of a
    # 500-row test table — coalesce to a few shards at test SF
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").coalesce(4)
    path = _tmp(sf_dir, "npy_emb")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_npy_dir(emb, path, "vec_id", "embedding")
    back = read_npy_dir(spark, path)
    return back.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        _vec_milli().alias("vec_milli"),
    ).orderBy("vec_id")


IO_NPY_SQL = """
SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
       CAST((SELECT SUM(CAST(FLOOR(e * 1000) AS BIGINT))
             FROM UNNEST(embedding) AS t(e)) AS BIGINT) AS vec_milli
FROM embeddings ORDER BY vec_id
"""


def io_safetensors_roundtrip(spark, sf_dir):
    """embeddings → one safetensors container (embeddings f32 (N,64),
    vec_ids i64, labels i32) → distributed inventory read (binaryFile
    + header parse + per-tensor integer checksums). The container is a
    bounded artifact (like a checkpoint shard): building it driver-side
    mirrors the avro fixture pattern; the READ path is the distributed
    contract under test."""
    import numpy as np

    from pygdf_spark.sources.safetensors_lite import (
        encode_safetensors,
        read_safetensors,
    )

    emb = (
        T(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .orderBy("vec_id")
        .toPandas()
    )
    tensors = {
        "embeddings": np.stack([np.asarray(v, dtype=np.float32) for v in emb["embedding"]]),
        "labels": emb["label"].to_numpy(np.int32),
        "vec_ids": emb["vec_id"].to_numpy(np.int64),
    }
    path = _tmp(sf_dir, "st_emb") + ".safetensors"
    with open(path, "wb") as f:
        f.write(encode_safetensors(tensors, metadata={"source": "embeddings"}))
    inv = read_safetensors(spark, path)
    # normalize the file label (the tmp name embeds the SF tag)
    return inv.select(
        F.lit("tensors").alias("file"), "tensor", "dtype",
        "n_elems", "n_dims", "sum_milli",
    ).orderBy("tensor")


IO_SAFETENSORS_SQL = """
WITH emb AS (
  SELECT COUNT(*) AS n,
         MAX(len(embedding)) AS d,
         SUM((SELECT SUM(CAST(FLOOR(e * 1000) AS BIGINT))
              FROM UNNEST(embedding) AS t(e))) AS emb_milli,
         SUM(CAST(vec_id AS BIGINT)) * 1000 AS id_milli,
         SUM(CAST(label AS BIGINT)) * 1000 AS lab_milli
  FROM embeddings
)
SELECT * FROM (
  SELECT 'tensors' AS file, 'embeddings' AS tensor, 'float32' AS dtype,
         CAST(n * d AS BIGINT) AS n_elems, CAST(2 AS INT) AS n_dims,
         CAST(emb_milli AS BIGINT) AS sum_milli
  FROM emb
  UNION ALL
  SELECT 'tensors', 'labels', 'int32', CAST(n AS BIGINT), CAST(1 AS INT),
         CAST(lab_milli AS BIGINT) FROM emb
  UNION ALL
  SELECT 'tensors', 'vec_ids', 'int64', CAST(n AS BIGINT), CAST(1 AS INT),
         CAST(id_milli AS BIGINT) FROM emb
) ORDER BY tensor
"""


QUERIES = {
    "io_npy_roundtrip": io_npy_roundtrip,
    "io_safetensors_roundtrip": io_safetensors_roundtrip,
}

ORACLE = {
    "io_npy_roundtrip": IO_NPY_SQL,
    "io_safetensors_roundtrip": IO_SAFETENSORS_SQL,
}

"""Similarity search over embedding columns (north-star extension;
array<float> cosine, brute-force + LSH-bucketed ANN).

Scale design:
- dot products run as explode → position join → exact-decimal partial
  sums: a narrow shuffle keyed on vec_id pairs. For the oracle-checked
  path everything is order-independent decimal arithmetic.
- brute-force top-k is quadratic per query set — correct baseline,
  used with a bounded query set. The scale path is hyperplane-LSH
  bucketing: candidates are restricted to same-bucket vectors, which
  is a short-key equi-join (broadcast-able bucket histogram).
- at production scale the decimal dot product swaps for a
  float64 `F.aggregate`/`zip_with` fold or a vectorized pandas_udf —
  same plan shape (see bench.py variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: number of hyperplanes for the LSH bucketer
N_PLANES = 8


def _elements(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, pos, x_decimal) exploded elements; float→double→decimal(18,9)
    is exact for float32 inputs."""
    return vecs.select(
        F.col(id_col).alias("vid"),
        F.posexplode(vec_col).alias("pos", "xf"),
    ).select("vid", "pos", F.col("xf").cast("double").cast("decimal(18,9)").alias("x"))


def norms(vecs: DataFrame) -> DataFrame:
    """(vid, norm2 double) squared L2 norms via exact decimal sums."""
    el = _elements(vecs)
    return el.groupBy("vid").agg(F.sum(F.col("x") * F.col("x")).cast("double").alias("norm2"))


def cosine_pairs(vecs: DataFrame, queries: DataFrame) -> DataFrame:
    """(q_id, vec_id, cos) for every query×vector pair (excl. self).
    Join on position, decimal-exact dot, one final double formula."""
    qe = _elements(queries).withColumnsRenamed({"vid": "q_id", "x": "qx"})
    ve = _elements(vecs).withColumnsRenamed({"vid": "v_id", "x": "vx"})
    dots = (
        qe.join(ve, "pos")
        .filter(F.col("q_id") != F.col("v_id"))
        .groupBy("q_id", "v_id")
        .agg(F.sum(F.col("qx") * F.col("vx")).cast("double").alias("dot"))
    )
    nn = norms(vecs)
    return (
        dots.join(nn.withColumnsRenamed({"vid": "q_id", "norm2": "qn"}), "q_id")
        .join(nn.withColumnsRenamed({"vid": "v_id", "norm2": "vn"}), "v_id")
        .select(
            "q_id",
            "v_id",
            F.round(F.col("dot") / F.sqrt(F.col("qn") * F.col("vn")), 8).alias("cos"),
        )
    )


def brute_topk(vecs: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query (rounded-cos ranking with vec_id
    tiebreak → deterministic)."""
    cos = cosine_pairs(vecs, queries)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("v_id").asc())
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "v_id", "cos", "rank")
    )


def plane_coef(p, j):
    """Deterministic pseudo-random hyperplane component in [-3, 3]:
    identical integer formula on both engines."""
    return ((p * 31 + j * 17) % 7) - 3


def hyperplane_buckets(vecs: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vid, bucket): sign-bit bucketing against N deterministic integer
    hyperplanes. Dot products are decimal-exact; at scale this is the
    candidate-pruning stage ahead of in-bucket verification."""
    el = _elements(vecs)
    # per-plane dot via one broadcast cross join with the plane ids; the
    # coefficient is derived from (p, pos) arithmetically, so no plane
    # matrix ever materializes
    contrib = (
        el.crossJoin(F.broadcast(vecs.sparkSession.range(n_planes).select(F.col("id").cast("int").alias("p"))))
        .select(
            "vid",
            "p",
            (F.col("x") * (((F.col("p") * 31 + F.col("pos") * 17) % 7) - 3).cast("decimal(2,0)")).alias("c"),
        )
    )
    bits = contrib.groupBy("vid", "p").agg(
        F.when(F.sum("c") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("bit")
    )
    return bits.groupBy("vid").agg(
        F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("p")).cast("long")).cast("long").alias("bucket")
    )

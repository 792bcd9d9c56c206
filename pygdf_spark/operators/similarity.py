"""Similarity search over embedding columns (north-star extension;
array<float> cosine, brute-force + LSH-bucketed ANN).

Scale design (100 TB posture):
- all per-vector math (norms, dots, hyperplane projections) runs as
  MAP-SIDE array expressions (`zip_with` + `aggregate` folds) inside
  whole-stage codegen — no explode, no position join, no shuffle until
  the final top-k / histogram step. An exploded (vid, pos, x) plan
  joins on `pos`, whose cardinality is just the vector dimension, so at
  scale every partition of a position-keyed shuffle receives N·d/d = N
  rows — maximal skew. The array plan shuffles nothing but results.
- brute-force top-k broadcasts the (small) query set against the full
  corpus: one broadcast-nested-loop stage, embarrassingly parallel over
  corpus partitions, then a per-query top-k. This is the exact-baseline
  ANN shape that holds at 1000 executors when |queries| is bounded.
- hyperplane-LSH bucketing is the scale path: 8 sign bits → 256
  buckets computed map-side; candidate verification then joins only
  within buckets (short uniform keys).
- arithmetic is exact-decimal (float32 → double → decimal(18,9) is
  lossless; products/sums accumulate in decimal(38,18)) so results are
  bit-identical to the DuckDB oracle regardless of partitioning or
  accumulation order — the correctness discipline float sums can't give.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: number of hyperplanes for the LSH bucketer
N_PLANES = 8

# Accumulator type for exact folds: scale 18 preserves every fractional
# digit of a decimal(18,9)×decimal(18,9) product; precision 32 leaves
# headroom so `acc + element` widens to (38,18) — still scale-exact —
# and the cast back to (32,18) is lossless for |sum| < 10^14.
_ACC = "decimal(32,18)"


def _dec_vec(vec_col) -> Column:
    """array<float> → array<decimal(18,9)> via µ-unit quantization.

    A direct double→decimal cast rounds at digit 9 with HALF_UP in
    Spark but HALF_EVEN in DuckDB — float32 values whose decimal
    expansion terminates in an exact .5 tie there diverge by 1e-9.
    ``round()`` on doubles is half-away-from-zero in BOTH engines, so
    round(x·1e6)/1e6 produces identical decimals everywhere."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c,
        lambda v: (
            F.round(v.cast("double") * 1000000, 0).cast("decimal(16,0)")
            / F.lit(1000000)
        ).cast("decimal(18,9)"),
    )


def _fold_sum(arr: Column) -> Column:
    """Exact decimal sum of an array — a map-side `aggregate` fold."""
    return F.aggregate(arr, F.lit(0).cast(_ACC), lambda acc, v: (acc + v).cast(_ACC))


def dot(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two decimal arrays → double."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y)).cast("double")


def norm2(arr: Column) -> Column:
    """Exact-decimal squared L2 norm → double."""
    return _fold_sum(F.transform(arr, lambda v: v * v)).cast("double")


def with_vec(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
             id_out: str = "vid", vec_out: str = "vec") -> DataFrame:
    """Project (id, decimal-vector, norm2) — all map-side."""
    dv = _dec_vec(vec_col)
    return vecs.select(
        F.col(id_col).alias(id_out), dv.alias(vec_out), norm2(dv).alias(f"{id_out}_norm2")
    )


def norms(vecs: DataFrame) -> DataFrame:
    """(vid, norm2 double) squared L2 norms — no shuffle."""
    return with_vec(vecs).select("vid", F.col("vid_norm2").alias("norm2"))


def cosine_pairs(vecs: DataFrame, queries: DataFrame) -> DataFrame:
    """(q_id, v_id, cos) for every query×vector pair (excl. self).

    The query side is broadcast; the dot product and both norms are
    computed inside the broadcast-nested-loop join's projection, so the
    corpus is scanned exactly once with zero shuffle.
    """
    q = with_vec(queries, id_out="q_id", vec_out="qvec")
    v = with_vec(vecs, id_out="v_id", vec_out="vvec")
    return (
        v.join(F.broadcast(q), F.col("q_id") != F.col("v_id"))
        .select(
            "q_id",
            "v_id",
            F.round(
                dot(F.col("qvec"), F.col("vvec"))
                / F.sqrt(F.col("q_id_norm2") * F.col("v_id_norm2")),
                8,
            ).alias("cos"),
        )
    )


def brute_topk(vecs: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query (rounded-cos ranking with vec_id
    tiebreak → deterministic). One shuffle: the per-query rank."""
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
    hyperplanes, computed entirely map-side — the projection onto plane
    p is an indexed `transform` fold (coefficients derived from (p, j)
    arithmetically, so no plane matrix ever materializes or broadcasts).
    """
    def plane_term(p: int):
        def term(v, j):
            return v * (((F.lit(p * 31) + j * 17) % 7) - 3).cast("decimal(2,0)")
        return term

    dv = _dec_vec("embedding")
    bucket = None
    for p in range(n_planes):
        proj = _fold_sum(F.transform(dv, plane_term(p)))
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return vecs.select(F.col("vec_id").alias("vid"), bucket.cast("long").alias("bucket"))


def bucketed_topk(vecs: DataFrame, k: int = 3, n_planes: int = 4) -> DataFrame:
    """ANN search, scale path: LSH-bucket the corpus, then search ONLY
    within buckets (candidate generation = equi-join on the short
    bucket key; the quadratic work shrinks by ~2^n_planes). The exact
    rerank inside each bucket reuses the map-side cosine arithmetic.

    This is the IVF-style two-stage plan: coarse partition (here
    hyperplane buckets standing in for IVF centroids) → exact distance
    inside the probed cell. Recall < 1 by design; the oracle mirrors
    the same bucket definition so the result is still deterministic."""
    b = hyperplane_buckets(vecs, n_planes)
    v = with_vec(vecs, id_out="v_id", vec_out="vvec").join(
        b.withColumnRenamed("vid", "v_id"), "v_id"
    )
    q = (
        v.select(
            F.col("v_id").alias("q_id"),
            F.col("vvec").alias("qvec"),
            F.col("v_id_norm2").alias("q_norm2"),
            "bucket",
        )
    )
    cand = q.join(v, "bucket").filter(F.col("q_id") != F.col("v_id"))
    cos = cand.select(
        "q_id",
        "v_id",
        F.round(
            dot(F.col("qvec"), F.col("vvec"))
            / F.sqrt(F.col("q_norm2") * F.col("v_id_norm2")),
            8,
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("v_id").asc())
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "v_id", "cos", "rank")
    )

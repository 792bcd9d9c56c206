"""List & struct queries (SURVEY.md §2.9-lists/structs; cuDF .list
accessor core/column/lists.py, .struct core/column/struct.py) over the
``embeddings`` table (array<float> column).

Determinism: per-row numeric folds over arrays go through the
explode → exact-decimal-sum → regroup path so Spark and DuckDB agree
bit-for-bit (see _util docstring). Float→double casts are exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T


def list_ops_pack(spark, sf_dir):
    """get (:293), len (:393), sort_values (:507), unique (:472),
    contains (:325) on the embedding arrays."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        emb.getItem(0).cast("double").alias("e0"),
        emb.getItem(63).cast("double").alias("e63"),
        F.element_at(F.array_sort(emb), 1).cast("double").alias("min_e"),
        F.element_at(F.array_sort(emb), -1).cast("double").alias("max_e"),
        F.size(F.array_distinct(F.array(F.col("label") % 3, F.col("label") % 2, F.lit(0)))).alias("n_distinct_small"),
        F.array_contains(F.array(F.col("label") % 3, F.col("label") % 2), 1).alias("has_one"),
    ).orderBy("vec_id")


LIST_OPS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS e0,
       CAST(embedding[64] AS DOUBLE) AS e63,
       CAST(list_sort(embedding)[1] AS DOUBLE) AS min_e,
       CAST(list_sort(embedding)[-1] AS DOUBLE) AS max_e,
       CAST(len(list_distinct([label % 3, label % 2, 0])) AS INT) AS n_distinct_small,
       list_contains([label % 3, label % 2], 1) AS has_one
FROM embeddings WHERE vec_id < 200 ORDER BY vec_id
"""


def list_fold_norm(spark, sf_dir):
    """count_elements + numeric fold: squared L2 norm per vector via
    explode → exact decimal sum → regroup (order-independent, scales as
    a shuffle-free partial agg per vec_id)."""
    e = T(spark, sf_dir, "embeddings")
    # µ-quantized integer folds: decimal(18,9) casts hit exact .5 ties
    # where Spark (HALF_UP) and DuckDB (HALF_EVEN) disagree; round() on
    # doubles is half-AWAY-from-zero in both engines, so integer
    # micro-units are tie-identical and every sum below is exact int64.
    xi = F.round(F.col("x").cast("double") * 1000000, 0).cast("long")
    return (
        e.select("vec_id", F.explode("embedding").alias("x"))
        .groupBy("vec_id")
        .agg(
            F.sum(xi * xi).alias("norm2_u"),
            F.sum(xi).alias("sum_u"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("vec_id")
    )


LIST_FOLD_SQL = """
SELECT vec_id,
       CAST(SUM(xi * xi) AS BIGINT) AS norm2_u,
       CAST(SUM(xi) AS BIGINT) AS sum_u,
       COUNT(*) AS n
FROM (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS xi
      FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings))
GROUP BY vec_id ORDER BY vec_id
"""


def list_transform_slice(spark, sf_dir):
    """take/gather (:417) + transform + concat (combine.hpp:61):
    elementwise scale of a slice, emitted as scalars."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    sliced = F.slice(F.col("embedding"), 1, 3)
    # stage the HOF result once — inlining `scaled` into three
    # element_at columns would run the interpreted transform 3x per row
    staged = e.select(
        "vec_id",
        F.transform(sliced, lambda x: (x.cast("double") * 2.0)).alias("scaled"),
        F.size(F.concat(sliced, sliced)).alias("cat_len"),
    )
    return staged.select(
        "vec_id",
        F.element_at("scaled", 1).alias("s0"),
        F.element_at("scaled", 2).alias("s1"),
        F.element_at("scaled", 3).alias("s2"),
        "cat_len",
    ).orderBy("vec_id")


LIST_TRANSFORM_SQL = """
SELECT vec_id,
       CAST(embedding[1] AS DOUBLE) * 2.0 AS s0,
       CAST(embedding[2] AS DOUBLE) * 2.0 AS s1,
       CAST(embedding[3] AS DOUBLE) * 2.0 AS s2,
       CAST(len(embedding[1:3]) * 2 AS INT) AS cat_len
FROM embeddings WHERE vec_id < 200 ORDER BY vec_id
"""


def struct_pack(spark, sf_dir):
    """struct construction + field access (core/column/struct.py;
    StructDtype dtypes.py:225)."""
    n = T(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk"))
    return n.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        (s.getField("rk") * 10).alias("s_rk10"),
    ).orderBy("n_nationkey")


STRUCT_SQL = """
SELECT n_nationkey,
       struct_extract({'name': n_name, 'rk': n_regionkey}, 'name') AS s_name,
       struct_extract({'name': n_name, 'rk': n_regionkey}, 'rk') * 10 AS s_rk10
FROM nation ORDER BY n_nationkey
"""


QUERIES = {
    "list_ops_pack": list_ops_pack,
    "list_fold_norm": list_fold_norm,
    "list_transform_slice": list_transform_slice,
    "struct_pack": struct_pack,
}

ORACLE = {
    "list_ops_pack": LIST_OPS_SQL,
    "list_fold_norm": LIST_FOLD_SQL,
    "list_transform_slice": LIST_TRANSFORM_SQL,
    "struct_pack": STRUCT_SQL,
}

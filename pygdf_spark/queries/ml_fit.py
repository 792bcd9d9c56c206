"""Distributed model fitting via sufficient statistics: the Gram
matrix / normal-equations pass a 100 TB pipeline runs to train a
linear quality classifier (the scale path for "fit a filter model on
corpus features": the data never leaves the executors — ONE map-side
partial aggregate reduces the whole corpus to the d×d integer Gram
matrix, and the d-dimensional solve happens wherever the 1-row result
lands).

All features are exact int64 counts, so X'X and X'y are exact BIGINTs
and the oracle hash is bit-stable at any partitioning. (At true 100 TB
row counts the quadratic feature sums approach int64 range — swap the
sums to DECIMAL(38,0) there; the plan shape is unchanged.)

``tests/test_ml_fit.py`` closes the loop: it solves the normal
equations from this query's output and pins the coefficients against
``numpy.linalg.lstsq`` on the same features.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.operators import text as X
from pygdf_spark.queries._util import T

def _features(d):
    """x0=1 (intercept), x1=n_chars, x2=n_tokens, x3=longest-token
    length, x4=count of long (≥6-char) tokens; target
    y = n_distinct_tokens. All exact int64 counts with real variance
    on the corpus (punct/digit counts are identically zero on this
    fixture and would make the Gram matrix singular)."""
    toks = X.tokens("text")
    return d.select(
        F.lit(1).cast("long").alias("x0"),
        F.col("n_chars").cast("long").alias("x1"),
        X.token_count("text").cast("long").alias("x2"),
        F.array_max(F.transform(toks, F.length)).cast("long").alias("x3"),
        F.size(F.filter(toks, lambda w: F.length(w) >= 6))
        .cast("long").alias("x4"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
    )


def ml_gram_suffstats(spark, sf_dir):
    """X'X upper triangle + X'y + n over the documents corpus in one
    partial-aggregable pass (zero shuffles beyond the final 1-row
    reduce). This IS the distributed training step: with these 21
    numbers the normal equations (X'X)β = X'y are solved in O(d³)
    anywhere."""
    f = _features(T(spark, sf_dir, "documents"))
    cols = ["x0", "x1", "x2", "x3", "x4"]
    aggs = [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a[1]}{b[1]}")
        for i, a in enumerate(cols)
        for b in cols[i:]
    ]
    aggs += [F.sum(F.col(a) * F.col("y")).alias(f"s_{a[1]}y") for a in cols]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return f.agg(*aggs)


_FEATURE_SQL = r"""
  SELECT CAST(1 AS BIGINT) AS x0,
         CAST(n_chars AS BIGINT) AS x1,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS x2,
         CAST(list_max(list_transform(string_split_regex(trim(text), '\s+'),
                                      w -> length(w))) AS BIGINT) AS x3,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              w -> length(w) >= 6)) AS BIGINT) AS x4,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS y
  FROM documents
"""


def _gram_sql() -> str:
    cols = ["x0", "x1", "x2", "x3", "x4"]
    sums = [
        f"CAST(SUM({a} * {b}) AS BIGINT) AS s_{a[1]}{b[1]}"
        for i, a in enumerate(cols)
        for b in cols[i:]
    ]
    sums += [f"CAST(SUM({a} * y) AS BIGINT) AS s_{a[1]}y" for a in cols]
    sums.append("COUNT(*) AS n_rows")
    return f"WITH f AS ({_FEATURE_SQL})\nSELECT {', '.join(sums)} FROM f"


ML_GRAM_SQL = _gram_sql()


QUERIES = {
    "ml_gram_suffstats": ml_gram_suffstats,
}

ORACLE = {
    "ml_gram_suffstats": ML_GRAM_SQL,
}

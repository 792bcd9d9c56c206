"""Distributed linear text classifier on hashed n-gram features — the
fastText/CCNet-style QUALITY FILTER a pretraining pipeline trains on
"curated vs crawl" labels and applies to every document.

Public-recipe lineage: the GPT-3 / CCNet data papers train a linear
classifier over hashed word n-gram features to score document quality;
fastText's trick is the fixed-size HASHED feature space (no vocabulary
build, no feature dictionary shuffle). Re-expressed Spark-first:

- **Featurization is map-side**: each document's unigrams+bigrams hash
  into ``d`` buckets in-row (md5_mod — oracle-mirrorable); the sparse
  (doc, bucket, count) table is one narrow groupBy.
- **Training is a per-iteration aggregate, not a parameter server**:
  batch gradient descent where each iteration is (1) margin per doc =
  one broadcast-join of the d-row weight table + keyed sum, (2)
  residual per doc, (3) gradient per bucket = one keyed sum. The
  d-vector update happens driver-side (d is thousands — the model is
  tiny; the DATA never moves). 100 TB posture: 2 shuffles per
  iteration, both on bounded keys (doc_id, bucket); the feature table
  is persisted once and reused across iterations.
- **Scoring is one broadcast join** + keyed sum — no per-row Python.

Cross-engine exactness: with w=0 every predicted probability is
EXACTLY 0.5, so the first gradient step is integer arithmetic
(2·grad_j = Σ cnt·(2y−1)) — the registry query pins that step against
DuckDB bit-exactly. The full float iteration loop is pinned in pytest
against a scalar numpy reference (same iteration order, rtol 1e-6).

Reference note: rapidsai cudf has no model-fitting surface; this is a
§2.12 net-new pipeline component (SURVEY.md's training-data mandate).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygdf_spark.functions.hashing import md5_mod
from pygdf_spark.operators.text import tokens


def hashed_ngram_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    d: int = 4096, bigrams: bool = True,
) -> DataFrame:
    """Sparse hashed bag-of-ngrams: one row per (doc, bucket) with the
    term count. Unigrams and (optionally) bigrams share the bucket
    space, fastText-style. Map-side explode + one keyed groupBy."""
    w = tokens(text_col)
    terms = w
    if bigrams:
        m = F.greatest(F.size(w) - 1, F.lit(0))
        bi = F.zip_with(
            F.slice(w, 1, m), F.slice(w, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        terms = F.concat(w, bi)
    exploded = docs.select(
        F.col(id_col).alias("doc"), F.explode(terms).alias("term")
    )
    return (
        exploded.select("doc", md5_mod("term", d).cast("int").alias("bucket"))
        .groupBy("doc", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _weight_df(spark: SparkSession, w: list[float]) -> DataFrame:
    return spark.createDataFrame(
        [(j, float(v)) for j, v in enumerate(w)], "bucket int, w double"
    )


def logreg_fit(
    spark: SparkSession, feats: DataFrame, labels: DataFrame,
    d: int, iters: int = 8, lr: float = 0.5, l2: float = 1e-4,
    id_col: str = "doc", label_col: str = "y",
) -> dict:
    """Batch-GD logistic regression over the sparse feature table.
    ``labels``: (id_col, label_col∈{0,1}). Returns {"w": [d floats],
    "b": float, "iters": n}. Deterministic given the inputs up to
    float-sum partition order (pytest pins vs a scalar reference at
    rtol 1e-6). The gradient is the mean so ``lr`` is scale-free."""
    import numpy as np

    labels = labels.select(
        F.col(id_col).alias("doc"), F.col(label_col).cast("double").alias("y")
    )
    # ONE job per iteration (opt r8, guide §1.2/§5; the r7 verdict's
    # last multi-job-per-round operator). The old loop ran TWO actions
    # per iteration — the per-bucket gradient collect plus a separate
    # sum(r) for the bias — and the second recomputed the whole
    # margins→residual chain. A sentinel bias bucket (-1, cnt=1, one
    # row per labeled doc) added to the feature relation makes the bias
    # gradient fall out of the SAME per-bucket aggregate: g[-1] =
    # Σ_docs r. The weight join drops the sentinel (wdf holds buckets
    # 0..d-1 only), so margins are unchanged. Both persisted relations
    # are additionally hash-partitioned by doc so the margin groupBy
    # and the gradient/residual joins reuse ONE exchange layout across
    # all iterations instead of re-shuffling the feature table every
    # round (§2.4: operations keyed the same way share the exchange).
    feats_aug = feats.select(
        "doc", F.col("bucket").cast("int").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
    ).unionByName(
        labels.select(
            "doc", F.lit(-1).alias("bucket"), F.lit(1).cast("long").alias("cnt")
        )
    ).repartition("doc").persist()
    labels = labels.repartition("doc").persist()
    try:
        n = labels.count()
        if n == 0:
            raise ValueError("logreg_fit: empty label set")
        w = np.zeros(d, dtype="float64")
        b = 0.0
        for _ in range(iters):
            wdf = _weight_df(spark, w.tolist())
            margins = (
                feats_aug.join(F.broadcast(wdf), "bucket")
                .groupBy("doc")
                .agg(F.sum(F.col("cnt") * F.col("w")).alias("m"))
            )
            resid = (
                labels.join(margins, "doc", "left")
                .select(
                    "doc",
                    (
                        F.col("y")
                        - F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-(F.coalesce("m", F.lit(0.0)) + F.lit(b))))
                    ).alias("r"),
                )
            )
            grad_rows = (
                feats_aug.join(resid, "doc")
                .groupBy("bucket")
                .agg(F.sum(F.col("cnt") * F.col("r")).alias("g"))
                .collect()
            )
            g = np.zeros(d, dtype="float64")
            gb = 0.0
            for row in grad_rows:
                if row["bucket"] < 0:
                    gb = row["g"] or 0.0
                else:
                    g[row["bucket"]] = row["g"]
            w = w + lr * (g / n - l2 * w)
            b = b + lr * (gb / n)
        return {"w": w.tolist(), "b": float(b), "iters": iters}
    finally:
        feats_aug.unpersist()
        labels.unpersist()


def logreg_score(
    spark: SparkSession, feats: DataFrame, model: dict,
    id_col: str = "doc",
) -> DataFrame:
    """(doc, margin, prob) for every document with features; docs whose
    every bucket-weight is zero still score (margin=b) via the
    right-side aggregation, not a row drop."""
    wdf = _weight_df(spark, model["w"])
    b = float(model["b"])
    return (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy(F.col("doc").alias(id_col))
        .agg((F.sum(F.col("cnt") * F.col("w")) + F.lit(b)).alias("margin"))
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
    )


def logreg_fit_reference(rows, d, iters=8, lr=0.5, l2=1e-4):
    """Scalar reference of logreg_fit for pytest: ``rows`` is a list of
    (doc_feats: dict bucket->cnt, y). Same iteration order and update
    rule; pure Python floats."""
    w = [0.0] * d
    b = 0.0
    n = len(rows)
    for _ in range(iters):
        g = [0.0] * d
        gb = 0.0
        for feats_i, y in rows:
            m = sum(c * w[j] for j, c in feats_i.items()) + b
            p = 1.0 / (1.0 + math.exp(-m))
            r = y - p
            for j, c in feats_i.items():
                g[j] += c * r
            gb += r
        w = [wj + lr * (gj / n - l2 * wj) for wj, gj in zip(w, g)]
        b = b + lr * (gb / n)
    return {"w": w, "b": b, "iters": iters}

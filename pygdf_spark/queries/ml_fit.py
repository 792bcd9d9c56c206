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
from pygdf_spark.queries._util import T, spread

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
    f = _features(spread(T(spark, sf_dir, "documents")))  # §2.5
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


def ml_logreg_grad0(spark, sf_dir):
    """First gradient step of the distributed logistic-regression
    quality classifier (operators/linear_model.py) on hashed
    unigram+bigram features (fastText-style, d=64 buckets): at w=0
    every predicted probability is EXACTLY 0.5, so the per-bucket
    gradient is pure integer arithmetic — 2·grad_j = Σ cnt·(2y−1) with
    y = [lang='en']. This pins the featurization (hash buckets, bigram
    construction, counts) and the gradient PLAN (broadcast-weight join
    → doc margin → bucket aggregate) bit-exactly cross-engine; the
    float iteration loop on top is pinned in tests/test_ml_fit.py
    against a scalar reference."""
    from pygdf_spark.operators.linear_model import hashed_ngram_features

    d = T(spark, sf_dir, "documents")
    feats = hashed_ngram_features(d, d=64)
    labels = d.select(
        F.col("doc_id").alias("doc"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    return (
        feats.join(labels, "doc")
        .groupBy("bucket")
        .agg(
            F.sum(F.col("cnt") * (2 * F.col("y") - 1)).alias("grad2"),
            F.sum("cnt").alias("mass"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy("bucket")
    )


ML_LOGREG_GRAD0_SQL = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS w
  FROM documents
),
terms AS (
  SELECT doc_id, y, UNNEST(list_concat(
           w,
           list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                          i -> w[i] || ' ' || w[i+1]))) AS term
  FROM toks
),
feats AS (
  SELECT doc_id, y, CAST(md5_number_lower(term) % 64 AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM terms GROUP BY ALL
)
SELECT bucket, CAST(SUM(cnt * (2*y - 1)) AS BIGINT) AS grad2,
       CAST(SUM(cnt) AS BIGINT) AS mass, COUNT(*) AS n_pairs
FROM feats GROUP BY bucket ORDER BY bucket
"""


def ml_quality_score_apply(spark, sf_dir):
    """APPLY path of the hashed-ngram linear quality filter: score
    every document against a fixed integer weight table (weight(j) =
    (j·2654435761) mod 1997 − 998 — an arithmetic fixture both engines
    derive identically; a trained model drops into the same plan) and
    report per-source keep rates. The weight table rides as an
    expression, so scoring 100 TB is a scan.

    Optimized shape (r7, guide §2.3/§2.4): the former plan built the
    (doc, bucket, cnt) feature relation (shuffle 1), re-aggregated it
    per doc (shuffle 2) and LEFT-JOINED the result back onto the
    documents scan (shuffle 3 + a second corpus scan). Since
    score(doc) = Σ_terms weight(bucket(term)), the bucket grouping is
    pure re-association: the weight expression now applies directly to
    the exploded term stream carrying (doc, source), one partial-agg
    keyed shuffle reduces it to per-doc scores (explode_outer keeps
    empty documents, replacing the join-back), and the per-source
    rollup is map-side-combinable. 3 shuffles + 2 scans → 2 shuffles
    (the second over n_docs rows) + 1 scan; identical values (integer
    sum re-association is exact)."""
    from pygdf_spark.functions.hashing import md5_mod
    from pygdf_spark.operators.text import tokens

    # tiny-input scans serialize the tokenize/explode/hash pipeline
    # onto one task (guide §2.5) — spread() is a no-op at scale
    d = spread(T(spark, sf_dir, "documents"))
    w = tokens("text")
    m = F.greatest(F.size(w) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(w, 1, m), F.slice(w, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = d.select(
        F.col("doc_id").alias("doc"), "source",
        F.explode_outer(F.concat(w, bi)).alias("term"),
    )
    bucket = md5_mod("term", 4096).cast("int")
    wexpr = (bucket.cast("long") * 2654435761) % 1997 - 998
    scores = (
        exploded.select("doc", "source", wexpr.alias("wt"))
        .groupBy("doc", "source")
        .agg(F.coalesce(F.sum("wt"), F.lit(0).cast("long")).alias("score"))
    )
    return (
        scores.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("score") > 0).cast("long")).alias("n_keep"),
            F.sum("score").alias("score_sum"),
        )
        .orderBy("source")
    )


ML_QUALITY_APPLY_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS w
  FROM documents
),
terms AS (
  SELECT doc_id, UNNEST(list_concat(
           w,
           list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                          i -> w[i] || ' ' || w[i+1]))) AS term
  FROM toks
),
feats AS (
  SELECT doc_id, CAST(md5_number_lower(term) % 4096 AS BIGINT) AS bucket,
         COUNT(*) AS cnt
  FROM terms GROUP BY ALL
),
scores AS (
  SELECT doc_id,
         SUM(cnt * ((bucket * 2654435761) % 1997 - 998)) AS score
  FROM feats GROUP BY doc_id
)
SELECT d.source AS source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(s.score, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keep,
       CAST(SUM(COALESCE(s.score, 0)) AS BIGINT) AS score_sum
FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
GROUP BY d.source ORDER BY d.source
"""


QUERIES = {
    "ml_gram_suffstats": ml_gram_suffstats,
    "ml_logreg_grad0": ml_logreg_grad0,
    "ml_quality_score_apply": ml_quality_score_apply,
}

ORACLE = {
    "ml_gram_suffstats": ML_GRAM_SQL,
    "ml_logreg_grad0": ML_LOGREG_GRAD0_SQL,
    "ml_quality_score_apply": ML_QUALITY_APPLY_SQL,
}

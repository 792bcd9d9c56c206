"""End-to-end LLM data-curation pipeline (the north-star composite):
quality-score → filter → exact-dedup keep-list → embedding join →
per-label corpus stats. One query chains the operator families the
engine exists for, the way a training-data pipeline actually uses them;
the whole flow stays one declarative plan (scan-pruned, two shuffles:
the dedup groupBy and the final label aggregate — the doc⋈embedding
join broadcasts under AQE at this scale and shuffles on doc_id above
it).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.operators.text import doc_fingerprint, quality_features
from pygdf_spark.queries._util import T


def pipeline_curation(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    vecs = T(spark, sf_dir, "embeddings")

    q = quality_features(docs)  # doc_id, ..., quality (oracle-mirrored formula)
    kept_q = q.filter(F.col("quality") >= 0.5).select("doc_id", "quality", "n_chars")

    # exact dedup among the survivors: keep the min doc_id per fingerprint
    fp = docs.select("doc_id", doc_fingerprint("text").alias("fp"))
    keep = (
        kept_q.join(fp, "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    curated = kept_q.join(keep, "doc_id").join(
        vecs.select(F.col("vec_id").alias("doc_id"), "label"), "doc_id"
    )
    return (
        curated.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.min("quality"), 8).alias("min_q"),
            F.round(F.max("quality"), 8).alias("max_q"),
        )
        .orderBy("label")
    )


PIPELINE_SQL = r"""
WITH q AS (
  SELECT doc_id, LENGTH(text) AS n_chars,
         0.3 * least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0)
       + 0.3 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / greatest(LENGTH(text),1) * 10.0, 1.0))
       + 0.2 * (1.0 - least(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(LENGTH(text),1) * 10.0, 1.0))
       + 0.2 * least(CAST(len(regexp_extract_all(LOWER(text), '\b(the|a|of|and|to|is|in)\b')) AS DOUBLE)
                     / greatest(len(string_split_regex(trim(text), '\s+')), 1) * 5.0, 1.0)
         AS quality
  FROM documents
),
kept AS (SELECT * FROM q WHERE quality >= 0.5),
fp AS (
  SELECT doc_id, md5(LOWER(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
  FROM documents
),
keep AS (
  SELECT MIN(k.doc_id) AS doc_id
  FROM kept k JOIN fp ON fp.doc_id = k.doc_id
  GROUP BY fp.fp
)
SELECT e.label AS label, COUNT(*) AS n_docs,
       CAST(SUM(k.n_chars) AS BIGINT) AS sum_chars,
       ROUND(MIN(k.quality), 8) AS min_q,
       ROUND(MAX(k.quality), 8) AS max_q
FROM kept k
JOIN keep USING (doc_id)
JOIN embeddings e ON e.vec_id = k.doc_id
GROUP BY e.label ORDER BY label
"""


def pipeline_pretrain_prep(spark, sf_dir):
    """Round-2 composite: the pretraining-prep tail of the pipeline —
    exact-dedup keep-list → PII scrub → deterministic stratified
    sample (1-in-3 per stratum) → token-budget sequence packing, ONE
    declarative plan. Shuffles: the dedup groupBy, and the shard-
    partitioned packing window; sampling and masking are map-side.
    Output: per-(lang, shard) pack inventory with a masked-length
    checksum proving the scrub ran inside the surviving set."""
    from pygdf_spark.functions.hashing import md5_u64

    docs = T(spark, sf_dir, "documents")
    fp = docs.select("doc_id", "lang", "text", doc_fingerprint("text").alias("fp"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = fp.join(keep.select("doc_id"), "doc_id")

    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    masked = F.regexp_replace(F.col("text"), email_re, "[EMAIL]")
    sampled = survivors.select(
        "doc_id", "lang", masked.alias("m"),
        (md5_u64(F.col("doc_id").cast("string")) % 3 == 0).alias("keep"),
    ).filter("keep")

    from pygdf_spark.operators.packing import with_pack_ids

    toks = F.size(F.split(F.trim("m"), r"\s+"))
    staged = sampled.select(
        "lang", "doc_id", toks.alias("n_tok"), F.length("m").alias("n_masked")
    )
    packed = with_pack_ids(staged, budget=1024, n_shards=4, extra_keys=("lang",))
    return (
        packed.groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("pack_id") + 1).alias("n_packs"),
            F.sum("n_tok").alias("total_tok"),
            F.sum("n_masked").alias("masked_chars"),
        )
        .orderBy("lang", "shard")
    )


PIPELINE_PREP_SQL = r"""
WITH fp AS (
  SELECT doc_id, lang, text,
         md5(LOWER(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
         md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
keep AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
sampled AS (
  SELECT f.doc_id, f.lang, f.h,
         regexp_replace(f.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS m
  FROM fp f JOIN keep USING (doc_id)
  WHERE f.h % 3 = 0
),
staged AS (
  SELECT lang, CAST(h % 4 AS INT) AS shard, doc_id, h,
         CAST(len(string_split_regex(trim(m), '\s+')) AS INT) AS n_tok,
         LENGTH(m) AS n_masked
  FROM sampled
),
packed AS (
  SELECT lang, shard, n_tok, n_masked,
         (SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // 1024 AS pack_id
  FROM staged
)
SELECT lang, shard, COUNT(*) AS n_docs,
       CAST(MAX(pack_id) + 1 AS BIGINT) AS n_packs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tok,
       CAST(SUM(n_masked) AS BIGINT) AS masked_chars
FROM packed GROUP BY lang, shard ORDER BY lang, shard
"""


QUERIES = {
    "pipeline_curation": pipeline_curation,
    "pipeline_pretrain_prep": pipeline_pretrain_prep,
}
ORACLE = {
    "pipeline_curation": PIPELINE_SQL,
    "pipeline_pretrain_prep": PIPELINE_PREP_SQL,
}

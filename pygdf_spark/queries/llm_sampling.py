"""Training-data sampling & batching queries over ``documents`` —
north-star extensions: the corpus-curation stages between dedup and the
data loader (stratified sampling, class rebalancing, sequence packing).

Scale design: everything is a keyed groupBy or a SHARD-partitioned
window — sampling decisions are per-row hash arithmetic (map-side,
deterministic, no RNG state), packing is a running sum inside each of
a fixed number of shards (windows partitioned by shard, never global).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.functions.hashing import md5_u64
from pygdf_spark.queries._util import T

#: mirrors functions/hashing.md5_u64 (== DuckDB md5_number_lower)
_H = "md5_number_lower(CAST(doc_id AS VARCHAR))"


def sample_stratified(spark, sf_dir):
    """Deterministic stratified sample: keep ~1/5 of every (lang,
    source) stratum via key-hash bucketing (reproducible across runs,
    retries, and engines — no RNG). Output: per-stratum totals vs
    sampled counts + an exact sampled-char sum as the value check."""
    d = T(spark, sf_dir, "documents")
    keep = (md5_u64(F.col("doc_id").cast("string")) % 5 == 0).alias("keep")
    return (
        d.select("lang", "source", F.col("n_chars"), keep)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_sampled"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0)).alias("sampled_chars"),
        )
        .orderBy("lang", "source")
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT lang, source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_H} % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN {_H} % 5 = 0 THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def sample_class_balance(spark, sf_dir):
    """Class rebalancing: cap every language at the size of the
    smallest language class (undersampling the head). The cap is a
    scalar from a tiny per-class count (broadcast); membership is a
    deterministic per-class hash RANK so the kept subset is stable.
    Output: per-language kept counts — all equal to the cap."""
    d = T(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    cap = counts.agg(F.min("n").alias("cap"))
    w = Window.partitionBy("lang").orderBy(md5_u64(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
    return (
        ranked.crossJoin(F.broadcast(cap))
        .filter(F.col("rk") <= F.col("cap"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


SAMPLE_BALANCE_SQL = f"""
WITH cap AS (
  SELECT MIN(n) AS cap FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
),
ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_H}, doc_id) AS rk
  FROM documents
)
SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc
FROM ranked, cap WHERE rk <= cap
GROUP BY lang ORDER BY lang
"""


def pack_sequences(spark, sf_dir):
    """Sequence packing: assign documents to fixed-token-budget packs
    (budget 2048 whitespace tokens) within 8 deterministic shards —
    the batching stage before a data loader. pack_id = the running
    token total's budget quotient inside the shard (greedy in hash
    order); oversized docs overflow into their own pack, as greedy
    packing does. Output: per-shard pack inventory."""
    from pygdf_spark.operators.packing import with_pack_ids

    d = T(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    packed = with_pack_ids(
        d.select("doc_id", toks.alias("n_tok")), budget=2048, n_shards=8
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("pack_id") + 1).alias("n_packs"),
            F.sum("n_tok").alias("total_tok"),
        )
        .orderBy("shard")
    )


PACK_SEQUENCES_SQL = rf"""
WITH staged AS (
  SELECT CAST({_H} % 8 AS INT) AS shard, doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tok,
         {_H} AS h
  FROM documents
),
packed AS (
  SELECT shard, n_tok,
         (SUM(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // 2048 AS pack_id
  FROM staged
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(MAX(pack_id) + 1 AS BIGINT) AS n_packs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tok
FROM packed GROUP BY shard ORDER BY shard
"""


def sample_mixture(spark, sf_dir):
    """Data-mixture (source-weighted) sampling — the per-source mixing
    stage of a pretraining pipeline: each source gets a target keep
    RATE and every document draws a deterministic hash-Bernoulli
    against its source's rate (no RNG state, reproducible across runs,
    retries, and engines; at 100 TB this is one map-side predicate,
    zero shuffles before the per-source audit agg).

    Rates here derive from the source's numeric suffix (suffix % 4 →
    100/75/50/25%) standing in for the mixture-weights table a real
    run broadcasts."""
    d = T(spark, sf_dir, "documents")
    pct = F.array(F.lit(100), F.lit(75), F.lit(50), F.lit(25))[
        F.substring("source", 4, 10).cast("int") % 4
    ]
    keep = md5_u64(F.col("doc_id").cast("string")) % 100 < pct
    return (
        d.select("source", pct.alias("target_pct"), keep.alias("keep"), "n_chars")
        .groupBy("source", "target_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
        .orderBy("source")
    )


SAMPLE_MIXTURE_SQL = f"""
SELECT source, target_pct, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM (
  SELECT source, n_chars,
         ([100, 75, 50, 25])[(CAST(substring(source, 4, 10) AS INT) % 4) + 1] AS target_pct,
         {_H} % 100 < ([100, 75, 50, 25])[(CAST(substring(source, 4, 10) AS INT) % 4) + 1] AS keep
  FROM documents
)
GROUP BY source, target_pct ORDER BY source
"""


def sample_quality_weighted(spark, sf_dir):
    """Quality-weighted sampling — the curation stage that keeps
    high-quality documents at full rate and down-samples the tail:
    an integer quality score (mean chars/token, milli-units) is
    quartile-bucketed against GLOBAL quantile boundaries (one 1-row agg,
    broadcast back — same shape as agg_winsorize), then every document
    draws a deterministic hash-Bernoulli against its bucket's keep rate
    (100/60/30/10% from best to worst quartile). Map-side end to end:
    one scan + one scalar agg + one audit agg, zero corpus shuffles
    before the report."""
    d = T(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    score = F.round(F.lit(1000) * F.col("n_chars") / n_tok).cast("long")
    scored = d.select("source", "n_chars", score.alias("s"), "doc_id")
    qs = scored.agg(
        F.percentile("s", 0.25).alias("q1"),
        F.percentile("s", 0.50).alias("q2"),
        F.percentile("s", 0.75).alias("q3"),
    )
    b = scored.crossJoin(F.broadcast(qs)).withColumn(
        "bucket",
        F.when(F.col("s") > F.col("q3"), 3)
        .when(F.col("s") > F.col("q2"), 2)
        .when(F.col("s") > F.col("q1"), 1)
        .otherwise(0),
    )
    rate = F.array(F.lit(10), F.lit(30), F.lit(60), F.lit(100))[F.col("bucket")]
    keep = md5_u64(F.col("doc_id").cast("string")) % 100 < rate
    return (
        b.select("bucket", rate.alias("keep_pct"), keep.alias("keep"), "n_chars")
        .groupBy("bucket", "keep_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
        .orderBy("bucket")
    )


SAMPLE_QUALITY_SQL = f"""
WITH scored AS (
  SELECT source, n_chars, doc_id,
         CAST(round(1000.0 * n_chars / len(string_split_regex(trim(text), '\\s+')), 0) AS BIGINT) AS s
  FROM documents
),
qs AS (
  SELECT quantile_cont(s, 0.25) AS q1, quantile_cont(s, 0.50) AS q2,
         quantile_cont(s, 0.75) AS q3
  FROM scored
),
b AS (
  SELECT n_chars, doc_id,
         CASE WHEN s > q3 THEN 3 WHEN s > q2 THEN 2 WHEN s > q1 THEN 1 ELSE 0 END AS bucket
  FROM scored CROSS JOIN qs
)
SELECT bucket, ([10, 30, 60, 100])[bucket + 1] AS keep_pct, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_H} % 100 < ([10, 30, 60, 100])[bucket + 1] THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN {_H} % 100 < ([10, 30, 60, 100])[bucket + 1] THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM b GROUP BY bucket ORDER BY bucket
"""


def sample_reservoir(spark, sf_dir):
    """Fixed-k per-group reservoir sample, derandomized: uniform-at-k
    selection == top-k by an order-independent uniform hash key (the
    distributed replacement for sequential reservoir state, which
    cannot shard). ROW_NUMBER over (group, md5(key)) then rk<=k — one
    shuffle on the group key, partial top-k per map task via
    WindowGroupLimit pushdown in Spark 4. Every engine sees the same
    hash → same sample, so the oracle is exact."""
    d = T(spark, sf_dir, "documents")
    hkey = md5_u64(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(hkey.asc(), F.col("doc_id").asc())
    return (
        d.select(
            "lang", "doc_id", "n_chars",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )


SAMPLE_RESERVOIR_SQL = f"""
SELECT lang, doc_id, n_chars, CAST(rk AS INT) AS rk
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_H}, doc_id) AS rk
  FROM documents
) WHERE rk <= 5 ORDER BY lang, rk
"""


def sample_epoch_shuffle(spark, sf_dir):
    """Deterministic per-EPOCH global shuffle — the data-loader stage
    that re-orders the corpus differently every training epoch without
    any RNG state: permutation key = md5(epoch || ':' || doc_id), shard
    = key mod N, within-shard position = rank of key. Everything is
    map-side arithmetic except ONE keyed window per epoch (the same
    shuffle the physical repartition would do), and the layout is
    reproducible bit-for-bit across runs, retries, and engines.

    Output pins the FULL permutation, compressed: per (epoch, shard),
    the doc count plus a position-weighted doc_id fold — any
    transposition of two docs changes the fold, so the oracle hash
    checks order, not just membership. At 100 TB the same expressions
    feed ``repartition(N_shards, shard)`` + ``sortWithinPartitions``
    and the writer emits one shard file per task."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").alias("epoch"))
    keyed = d.crossJoin(epochs).select(
        "epoch",
        "doc_id",
        md5_u64(
            F.concat(F.col("epoch").cast("string"), F.lit(":"),
                     F.col("doc_id").cast("string"))
        ).alias("pkey"),
    )
    keyed = keyed.withColumn("shard", (F.col("pkey") % 8).cast("int"))
    w = Window.partitionBy("epoch", "shard").orderBy("pkey", "doc_id")
    pos = keyed.withColumn("pos", F.row_number().over(w))
    return (
        pos.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pos").cast("long") * F.col("doc_id")).alias("ord_fold"),
        )
        .orderBy("epoch", "shard")
    )


_EH = "md5_number_lower(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))"

SAMPLE_EPOCH_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT epoch, doc_id, {_EH} AS pkey, CAST({_EH} % 8 AS INT) AS shard
  FROM documents, (SELECT UNNEST([0, 1]) AS epoch)
), pos AS (
  SELECT epoch, shard, doc_id,
         ROW_NUMBER() OVER (PARTITION BY epoch, shard
                            ORDER BY pkey, doc_id) AS pos
  FROM keyed
)
SELECT epoch, shard, COUNT(*) AS n_docs,
       CAST(SUM(pos * doc_id) AS BIGINT) AS ord_fold
FROM pos GROUP BY epoch, shard ORDER BY epoch, shard
"""


def sample_domain_cap(spark, sf_dir):
    """Per-domain quota enforcement (the C4/RefinedWeb anti-spam stage:
    no single source may dominate the corpus): keep at most K docs per
    source, preferring the LONGEST (quality proxy), doc_id tiebreak.
    One keyed window (partitioned by source — never global), map-side
    everything else. Output: per-source totals vs kept + kept-char sum
    so the hash pins exactly WHICH docs survived the cap."""
    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = d.select("source", "doc_id", "n_chars",
                      F.row_number().over(w).alias("rk"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("rk") <= 50, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("rk") <= 50, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
        .orderBy("source")
    )


SAMPLE_DOMAIN_CAP_SQL = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN rk <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk <= 50 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM ranked GROUP BY source ORDER BY source
"""


def sample_temperature(spark, sf_dir):
    """Temperature-scaled mixture sampling (the mT5/multilingual-corpus
    rebalancing stage): output proportions follow n_s^alpha (alpha=0.5)
    instead of raw source sizes, so small sources are up-weighted.
    Per-row keep = hash-Bernoulli at q_s = min(1, T*sqrt(n_s)/(S*n_s))
    with T = N/5 and S = sum of sqrt(n_t).

    Cross-engine float determinism (the reason this query can be
    hash-checked at all): sqrt is IEEE-exact in both engines, and S is
    computed as an ORDERED fold over the per-source sqrt list (sorted
    collect_list here, list_reduce over list(... ORDER BY) in DuckDB)
    — never a SUM(double) whose accumulation order differs. The q_s
    expression is written with identical operation order on both
    sides, so every keep decision compares identical doubles."""
    d = T(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "n"))),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n"].cast("double")),
        ).alias("sq_sum"),
        F.sum("n").alias("grand_n"),
    )
    q = counts.crossJoin(F.broadcast(totals)).select(
        "source", "n",
        F.least(
            F.lit(1.0),
            (F.col("grand_n").cast("double") / 5
             * F.sqrt(F.col("n").cast("double")))
            / (F.col("sq_sum") * F.col("n").cast("double")),
        ).alias("qs"),
    )
    keep = (
        md5_u64(F.col("doc_id").cast("string")) % 1_000_000_000
    ).cast("double") < F.col("qs") * 1e9
    return (
        d.join(F.broadcast(q), "source")
        .select("source", "n_chars", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0))
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


SAMPLE_TEMPERATURE_SQL = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
),
s AS (
  SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY source),
                     (a, b) -> a + b) AS sq_sum,
         CAST(SUM(n) AS BIGINT) AS grand_n
  FROM c
),
q AS (
  SELECT source,
         LEAST(1.0, (CAST(grand_n AS DOUBLE) / 5 * sqrt(CAST(n AS DOUBLE)))
                    / (sq_sum * CAST(n AS DOUBLE))) AS qs
  FROM c, s
)
SELECT d.source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN CAST({_H} % 1000000000 AS DOUBLE) < qs * 1e9
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN CAST({_H} % 1000000000 AS DOUBLE) < qs * 1e9
                THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM documents d JOIN q USING (source)
GROUP BY d.source ORDER BY d.source
"""


def sample_kfold_split(spark, sf_dir):
    """Deterministic k-fold assignment (k=5) for cross-validation /
    held-out splits: fold = key-hash mod k — reproducible across runs,
    engines, and partitionings, with GROUP-AWARE integrity: all docs of
    one source land in the SAME fold (split leakage guard — the sin of
    random row-wise splits on grouped data). Map-side only; the output
    proves fold balance and group integrity per fold."""
    d = T(spark, sf_dir, "documents")
    fold = (md5_u64(F.concat(F.lit("fold:"), F.col("source"))) % 5).cast("int")
    return (
        d.select(fold.alias("fold"), "source", "doc_id", "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("fold")
    )


SAMPLE_KFOLD_SQL = """
SELECT CAST(md5_number_lower('fold:' || source) % 5 AS INT) AS fold,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents GROUP BY fold ORDER BY fold
"""


QUERIES = {
    "sample_kfold_split": sample_kfold_split,
    "sample_temperature": sample_temperature,
    "sample_epoch_shuffle": sample_epoch_shuffle,
    "sample_domain_cap": sample_domain_cap,
    "sample_reservoir": sample_reservoir,
    "sample_stratified": sample_stratified,
    "sample_quality_weighted": sample_quality_weighted,
    "sample_class_balance": sample_class_balance,
    "pack_sequences": pack_sequences,
    "sample_mixture": sample_mixture,
}

ORACLE = {
    "sample_kfold_split": SAMPLE_KFOLD_SQL,
    "sample_temperature": SAMPLE_TEMPERATURE_SQL,
    "sample_epoch_shuffle": SAMPLE_EPOCH_SHUFFLE_SQL,
    "sample_domain_cap": SAMPLE_DOMAIN_CAP_SQL,
    "sample_reservoir": SAMPLE_RESERVOIR_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "sample_quality_weighted": SAMPLE_QUALITY_SQL,
    "sample_class_balance": SAMPLE_BALANCE_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "sample_mixture": SAMPLE_MIXTURE_SQL,
}

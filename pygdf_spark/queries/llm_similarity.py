"""Similarity-search queries over ``embeddings`` (brute-force cosine
top-k baseline + hyperplane-LSH bucketing) — north-star extensions,
built on ``pygdf_spark.operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.operators import similarity as SIM
from pygdf_spark.queries._util import T

#: tie-identical µ-unit integer quantization (see
#: operators/similarity._int_vec): round() is half-away-from-zero in
#: both engines; the rounded double is integral so the BIGINT cast is
#: exact everywhere. All downstream sums/products are exact int64.
_INT = "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)"

#: cosine from exact integer dot + norms — norms cast to DOUBLE before
#: the product (mirrors Spark: int64 norm product would overflow; the
#: IEEE multiply/sqrt/divide on identical integer-valued doubles is
#: deterministic across engines). DuckDB SUM(BIGINT) yields HUGEINT, so
#: every SUM is cast back to BIGINT.
_COS = ("ROUND(CAST({dot} AS DOUBLE) / "
        "SQRT(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE)), 8)")

def _bucket_ctes(n_planes: int) -> str:
    """Shared oracle CTE block: sign-bit LSH bucket per vid from the
    deterministic integer hyperplanes — the single source of truth the
    bucketed-ANN oracles (ivf topk, lsh histogram, recall eval) build
    on, parameterized by plane count.
    (pos - 1): generate_subscripts is 1-based, Spark transform 0-based."""
    return f"""contrib AS (
  SELECT el.vid, p.p, el.x * (((p.p * 31 + (el.pos - 1) * 17) % 7) - 3) AS c
  FROM el CROSS JOIN (SELECT UNNEST(generate_series(0, {n_planes - 1})) AS p) p
),
bits AS (
  SELECT vid, p, CASE WHEN SUM(c) >= 0 THEN 1 ELSE 0 END AS bit
  FROM contrib GROUP BY vid, p
),
buckets AS (
  SELECT vid, CAST(SUM(bit * CAST(POW(2.0, p) AS BIGINT)) AS BIGINT) AS bucket
  FROM bits GROUP BY vid
)"""


_ELEMENTS_SQL = rf"""
el AS (
  SELECT vec_id AS vid,
         generate_subscripts(embedding, 1) AS pos,
         {_INT.replace('x', 'UNNEST(embedding)')} AS x
  FROM embeddings
),
nrm AS (
  SELECT vid, CAST(SUM(x * x) AS BIGINT) AS norm2 FROM el GROUP BY vid
)
"""


def sim_cosine_topk(spark, sf_dir):
    """exact top-5 cosine neighbors for queries vec_id < 5."""
    vecs = T(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 5)
    return SIM.brute_topk(vecs, queries, k=5).orderBy("q_id", "rank")


SIM_TOPK_SQL = rf"""
WITH {_ELEMENTS_SQL},
dots AS (
  SELECT q.vid AS q_id, v.vid AS v_id, CAST(SUM(q.x * v.x) AS BIGINT) AS dot
  FROM el q JOIN el v ON q.pos = v.pos AND q.vid <> v.vid
  WHERE q.vid < 5
  GROUP BY q.vid, v.vid
),
cosv AS (
  SELECT q_id, v_id, {_COS.format(dot='dot', na='nq.norm2', nb='nv.norm2')} AS cos
  FROM dots JOIN nrm nq ON nq.vid = q_id JOIN nrm nv ON nv.vid = v_id
),
ranked AS (
  SELECT q_id, v_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, v_id ASC) AS rank
  FROM cosv
)
SELECT q_id, v_id, cos, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""


def sim_lsh_buckets(spark, sf_dir):
    """hyperplane-LSH bucket histogram (the ANN candidate-pruning
    stage): 8 deterministic integer planes → 256 buckets."""
    vecs = T(spark, sf_dir, "embeddings")
    b = SIM.hyperplane_buckets(vecs)
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vid").alias("first_vec"))
        .orderBy("bucket")
    )


SIM_LSH_SQL = rf"""
WITH {_ELEMENTS_SQL},
{_bucket_ctes(SIM.N_PLANES)}
SELECT bucket, COUNT(*) AS n_vecs, MIN(vid) AS first_vec
FROM buckets GROUP BY bucket ORDER BY bucket
"""


def sim_neardup_pairs(spark, sf_dir):
    """embedding-cosine near-dup pairs among vec_id < 100 — top-20 most
    similar pairs (the embedding analog of minhash near-dup)."""
    vecs = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    cos = SIM.cosine_pairs(vecs, vecs).filter(F.col("q_id") < F.col("v_id"))
    return (
        cos.select(F.col("q_id").alias("vec_a"), F.col("v_id").alias("vec_b"), "cos")
        .orderBy(F.col("cos").desc(), F.col("vec_a").asc(), F.col("vec_b").asc())
        .limit(20)
    )


SIM_NEARDUP_SQL = rf"""
WITH el AS (
  SELECT vec_id AS vid,
         generate_subscripts(embedding, 1) AS pos,
         {_INT.replace('x', 'UNNEST(embedding)')} AS x
  FROM embeddings WHERE vec_id < 100
),
nrm AS (SELECT vid, CAST(SUM(x * x) AS BIGINT) AS norm2 FROM el GROUP BY vid),
dots AS (
  SELECT a.vid AS vec_a, b.vid AS vec_b, CAST(SUM(a.x * b.x) AS BIGINT) AS dot
  FROM el a JOIN el b ON a.pos = b.pos AND a.vid < b.vid
  GROUP BY a.vid, b.vid
)
SELECT vec_a, vec_b, {_COS.format(dot='dot', na='na.norm2', nb='nb.norm2')} AS cos
FROM dots JOIN nrm na ON na.vid = vec_a JOIN nrm nb ON nb.vid = vec_b
ORDER BY cos DESC, vec_a ASC, vec_b ASC LIMIT 20
"""


def sim_ivf_topk(spark, sf_dir):
    """bucketed ANN (IVF-style two-stage): 4-plane LSH partition →
    exact cosine rerank within buckets, top-3 per query — restricted to
    vec_id < 300 so the oracle's in-bucket quadratic stays cheap."""
    vecs = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return SIM.bucketed_topk(vecs, k=3, n_planes=4).orderBy("q_id", "rank")


SIM_IVF_SQL = rf"""
WITH el AS (
  SELECT vec_id AS vid,
         generate_subscripts(embedding, 1) AS pos,
         {_INT.replace('x', 'UNNEST(embedding)')} AS x
  FROM embeddings WHERE vec_id < 300
),
nrm AS (SELECT vid, CAST(SUM(x * x) AS BIGINT) AS norm2 FROM el GROUP BY vid),
{_bucket_ctes(4)},
cand AS (
  SELECT a.vid AS q_id, b.vid AS v_id
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vid <> b.vid
),
dots AS (
  SELECT cand.q_id, cand.v_id, CAST(SUM(q.x * v.x) AS BIGINT) AS dot
  FROM cand JOIN el q ON q.vid = cand.q_id JOIN el v ON v.vid = cand.v_id AND v.pos = q.pos
  GROUP BY cand.q_id, cand.v_id
),
cosv AS (
  SELECT q_id, v_id, {_COS.format(dot='dot', na='nq.norm2', nb='nv.norm2')} AS cos
  FROM dots JOIN nrm nq ON nq.vid = q_id JOIN nrm nv ON nv.vid = v_id
),
ranked AS (
  SELECT q_id, v_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, v_id ASC) AS rank
  FROM cosv
)
SELECT q_id, v_id, cos, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3 ORDER BY q_id, rank
"""


def sim_knn_join(spark, sf_dir):
    """Two-sided kNN JOIN — the scale path for joining a QUERY SET to
    a corpus by embedding similarity (dedup-vs-reference, retrieval
    eval, cross-corpus linking): both sides LSH-bucket map-side, the
    candidate join is a plain bucket-key equi-join with the query side
    SHUFFLED (broadcast_queries=False — at 100 TB both sides are big;
    nothing corpus-sized broadcasts), multi-probe (own bucket + every
    Hamming-1 flip) lifts recall ×(n_planes+1) with a map-side explode
    of the query side only. Exact cosine rerank inside candidates,
    top-2 per query. The oracle mirrors bucket + probe definitions, so
    the result is deterministic though recall < 1 by design."""
    vecs = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    qs = vecs.filter(F.col("vec_id") % 11 == 0)
    base = vecs.filter(F.col("vec_id") % 11 != 0)
    return SIM.bucketed_topk(
        base, k=2, n_planes=4, queries=qs,
        broadcast_queries=False, multiprobe=True,
    ).orderBy("q_id", "rank")


SIM_KNN_JOIN_SQL = rf"""
WITH el AS (
  SELECT vec_id AS vid,
         generate_subscripts(embedding, 1) AS pos,
         {_INT.replace('x', 'UNNEST(embedding)')} AS x
  FROM embeddings WHERE vec_id < 400
),
nrm AS (SELECT vid, CAST(SUM(x * x) AS BIGINT) AS norm2 FROM el GROUP BY vid),
{_bucket_ctes(4)},
qp AS (
  SELECT vid, bucket FROM buckets WHERE vid % 11 = 0
  UNION ALL
  SELECT b.vid, xor(b.bucket, CAST(POW(2.0, p.p) AS BIGINT)) AS bucket
  FROM buckets b
  CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS p) p
  WHERE b.vid % 11 = 0
),
cand AS (
  SELECT q.vid AS q_id, b.vid AS v_id
  FROM qp q JOIN buckets b ON q.bucket = b.bucket AND b.vid % 11 <> 0
),
dots AS (
  SELECT cand.q_id, cand.v_id, CAST(SUM(q.x * v.x) AS BIGINT) AS dot
  FROM cand JOIN el q ON q.vid = cand.q_id
            JOIN el v ON v.vid = cand.v_id AND v.pos = q.pos
  GROUP BY cand.q_id, cand.v_id
),
cosv AS (
  SELECT q_id, v_id,
         {_COS.format(dot='dot', na='nq.norm2', nb='nv.norm2')} AS cos
  FROM dots JOIN nrm nq ON nq.vid = q_id JOIN nrm nv ON nv.vid = v_id
),
ranked AS (
  SELECT q_id, v_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, v_id ASC) AS rank
  FROM cosv
)
SELECT q_id, v_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 2 ORDER BY q_id, rank
"""


def sim_kmeans_ivf(spark, sf_dir):
    """Distributed k-means (Lloyd's, operators/kmeans.py) as the real
    IVF coarse quantizer: deterministic lowest-id init, 2 exact
    assign/update rounds, then the per-cluster inventory an IVF index
    needs (cell sizes + inertia). Assignment is map-side against
    literal centroids; updates are d partial-aggregable JVM sums; the
    driver only ever holds k×d numbers."""
    from pygdf_spark.operators.kmeans import kmeans

    vecs = T(spark, sf_dir, "embeddings")
    a = kmeans(vecs, k=4, iters=2)
    return (
        a.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("vid").alias("first_vid"),
            # per-row round → exact int64 sum (a double SUM would be
            # partition-order-dependent); rounding identical doubles is
            # identical in both engines
            F.sum(F.round("dist2", 0).cast("long")).alias("inertia_r"),
        )
        .orderBy("cid")
    )


def _km_round(tag: str, cent: str) -> str:
    """One unrolled Lloyd's round: distances vs ``cent`` → argmin
    assignment. list_reduce folds in list order — the same sequential
    IEEE sum Spark's aggregate() does."""
    return f"""
d{tag} AS (
  SELECT v.vid, c.cid,
         list_reduce(list_transform(generate_series(1, 64),
                     i -> (CAST(v.a[i] AS DOUBLE) - c.c[i]) ** 2),
                     (x, y) -> x + y) AS dist
  FROM v CROSS JOIN {cent} c
),
a{tag} AS (
  SELECT vid, cid, dist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d{tag}
  ) WHERE rn = 1
)"""


def _km_update(tag: str, assign: str) -> str:
    """Centroid update: exact per-dim int64 sums, one double division."""
    return f"""
c{tag} AS (
  SELECT cid, list(m ORDER BY i) AS c FROM (
    SELECT {assign}.cid, g.i, CAST(CAST(SUM(v.a[g.i]) AS BIGINT) AS DOUBLE) / COUNT(*) AS m
    FROM {assign} JOIN v USING (vid) CROSS JOIN generate_series(1, 64) AS g(i)
    GROUP BY {assign}.cid, g.i
  ) GROUP BY cid
)"""


SIM_KMEANS_SQL = f"""
WITH v AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> {_INT}) AS a
  FROM embeddings
),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid,
         list_transform(a, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT * FROM v ORDER BY vid LIMIT 4)
),{_km_round("0", "c0")},{_km_update("1", "a0")},{_km_round("1", "c1")},{_km_update("2", "a1")},{_km_round("2", "c2")}
SELECT cid, COUNT(*) AS n, MIN(vid) AS first_vid,
       CAST(SUM(CAST(round(dist, 0) AS BIGINT)) AS BIGINT) AS inertia_r
FROM a2 GROUP BY cid ORDER BY cid
"""


def sim_ivf_probe(spark, sf_dir):
    """IVF probe search (nprobe=1): top-3 cosine neighbors of vec 0
    searching ONLY its k-means cell (operators/kmeans.ivf_probe_topk) —
    the |corpus|/k work reduction a real IVF index delivers, with the
    1-row query broadcast against the assigned corpus."""
    from pygdf_spark.operators.kmeans import ivf_probe_topk

    vecs = T(spark, sf_dir, "embeddings")
    return ivf_probe_topk(vecs, k_clusters=4, iters=2, query_vid=0, topk=3).orderBy("rank")


SIM_IVF_PROBE_SQL = f"""
WITH v AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> {_INT}) AS a
  FROM embeddings
),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid,
         list_transform(a, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT * FROM v ORDER BY vid LIMIT 4)
),{_km_round("0", "c0")},{_km_update("1", "a0")},{_km_round("1", "c1")},{_km_update("2", "a1")},{_km_round("2", "c2")},
nrm AS (
  SELECT vid, CAST(list_reduce(list_transform(a, x -> x * x), (x, y) -> x + y) AS BIGINT) AS n2
  FROM v
),
q AS (
  SELECT a2.vid AS q_id, a2.cid AS q_cid, v.a AS qa, nrm.n2 AS qn2
  FROM a2 JOIN v USING (vid) JOIN nrm USING (vid) WHERE a2.vid = 0
),
scored AS (
  SELECT q.q_id, a2.vid AS v_id,
         ROUND(CAST(CAST(list_reduce(list_transform(generate_series(1, 64),
                    i -> v.a[i] * q.qa[i]), (x, y) -> x + y) AS BIGINT) AS DOUBLE)
               / SQRT(CAST(q.qn2 AS DOUBLE) * CAST(nrm.n2 AS DOUBLE)), 8) AS cos
  FROM a2 JOIN v USING (vid) JOIN nrm USING (vid) CROSS JOIN q
  WHERE a2.cid = q.q_cid AND a2.vid <> q.q_id
)
SELECT q_id, v_id, cos, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, v_id ASC) AS INT) AS rank
FROM scored QUALIFY rank <= 3 ORDER BY rank
"""


def sim_doc_pool(spark, sf_dir):
    """chunk→document embedding pooling: element-wise mean of each
    document's chunk vectors (vec_id % 50 stands in for the chunk→doc
    map the real pipeline carries). Same scale shape as the k-means
    centroid update: d partial-aggregable JVM sums per group — never a
    position-keyed shuffle, never a collected array. The pooled
    components stay INTEGER (milli-µ units, floor of s·1000/n): a
    double mean + 8-dp round diverged between engines at sf0.1 (DuckDB
    rounds doubles by scale-multiply, Spark by exact BigDecimal — ties
    near the boundary split), so no doubles exist anywhere here."""
    vecs = T(spark, sf_dir, "embeddings")
    iv = vecs.select(
        (F.col("vec_id") % 50).alias("doc_id"),
        SIM._int_vec("embedding").alias("vec"),
    )
    sums = [F.sum(F.element_at("vec", i + 1)).alias(f"s{i}") for i in range(64)]
    agg = iv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"), *sums)
    # FLOOR division on both sides (Spark `div` truncates toward zero,
    # DuckDB `//` floors — they differ on negative sums). The double
    # quotient is exact enough: |s·1000| ≤ 8e10 ≪ 2^53 and non-integer
    # quotients sit ≥ 1/n from any integer.
    pooled = F.array(*[
        F.floor(F.col(f"s{i}") * 1000 / F.col("n_chunks")).cast("long")
        for i in range(64)
    ])
    sum_norm2 = None
    for i in range(64):
        t = F.col(f"s{i}") * F.col(f"s{i}")
        sum_norm2 = t if sum_norm2 is None else sum_norm2 + t
    # pooled vector stringified: the driver canonicalizer sorts with
    # pandas, which cannot hash list cells (r3 hash-fail class)
    return agg.select(
        "doc_id", "n_chunks", F.array_join(pooled, ",").alias("doc_vec"),
        sum_norm2.alias("sum_norm2"),
    ).orderBy("doc_id")


SIM_DOC_POOL_SQL = f"""
WITH v AS (
  SELECT vec_id % 50 AS doc_id,
         list_transform(embedding, x -> {_INT}) AS a
  FROM embeddings
),
sums AS (
  SELECT doc_id, g.i, CAST(SUM(a[g.i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM v CROSS JOIN generate_series(1, 64) AS g(i)
  GROUP BY doc_id, g.i
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_chunks,
       array_to_string(list((s * 1000) // n ORDER BY i), ',') AS doc_vec,
       CAST(SUM(s * s) AS BIGINT) AS sum_norm2
FROM sums GROUP BY doc_id ORDER BY doc_id
"""


def sim_ann_recall(spark, sf_dir):
    """ANN quality evaluation: recall@3 of the LSH-bucketed search vs
    exact brute force over a bounded evaluation sample (vec_id < 300 —
    at production scale this runs on a held-out sample, never the full
    corpus; the brute side is quadratic BY DESIGN as the ground truth).
    Output: one row of counts + integer basis-point recall (exact
    arithmetic, no float division)."""
    vecs = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    brute = SIM.brute_topk(vecs, vecs, k=3).select("q_id", "v_id")
    ivf = SIM.bucketed_topk(vecs, k=3, n_planes=4).select("q_id", "v_id")
    multi = SIM.bucketed_topk(vecs, k=3, n_planes=4, multiprobe=True).select("q_id", "v_id")
    hits = brute.join(ivf, ["q_id", "v_id"], "left_semi")
    mhits = brute.join(multi, ["q_id", "v_id"], "left_semi")
    return (
        brute.agg(
            F.countDistinct("q_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_true"),
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .crossJoin(mhits.agg(F.count(F.lit(1)).alias("n_hits_multi")))
        .select(
            "n_queries", "n_true", "n_hits", "n_hits_multi",
            F.expr("(n_hits * 10000) div n_true").alias("recall_bp"),
            F.expr("(n_hits_multi * 10000) div n_true").alias("recall_bp_multi"),
        )
    )


_IVF_CTES = rf"""
{_bucket_ctes(4)},
cand AS (
  SELECT a.vid AS q_id, b.vid AS v_id
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vid <> b.vid
),
probes AS (
  SELECT vid, bucket FROM buckets
  UNION ALL
  SELECT b.vid, xor(b.bucket, CAST(POW(2.0, p.p) AS BIGINT)) AS bucket
  FROM buckets b CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS p) p
),
mcand AS (
  SELECT p.vid AS q_id, c.vid AS v_id
  FROM probes p JOIN buckets c ON p.bucket = c.bucket AND p.vid <> c.vid
),
mdots AS (
  SELECT mcand.q_id, mcand.v_id, CAST(SUM(q.x * v.x) AS BIGINT) AS dot
  FROM mcand JOIN el q ON q.vid = mcand.q_id JOIN el v ON v.vid = mcand.v_id AND v.pos = q.pos
  GROUP BY mcand.q_id, mcand.v_id
),
mcos AS (
  SELECT q_id, v_id, {_COS.format(dot='dot', na='nq.norm2', nb='nv.norm2')} AS cos
  FROM mdots JOIN nrm nq ON nq.vid = q_id JOIN nrm nv ON nv.vid = v_id
),
mivf AS (
  SELECT q_id, v_id FROM (
    SELECT q_id, v_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, v_id ASC) AS rank
    FROM mcos
  ) WHERE rank <= 3
),
-- single-probe candidates are a strict subset of multi-probe ones:
-- derive their cosines from mcos instead of recomputing the dots
icos AS (
  SELECT m.q_id, m.v_id, m.cos
  FROM mcos m JOIN cand c ON m.q_id = c.q_id AND m.v_id = c.v_id
),
ivf AS (
  SELECT q_id, v_id FROM (
    SELECT q_id, v_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, v_id ASC) AS rank
    FROM icos
  ) WHERE rank <= 3
)"""


SIM_RECALL_SQL = rf"""
WITH el AS (
  SELECT vec_id AS vid,
         generate_subscripts(embedding, 1) AS pos,
         {_INT.replace('x', 'UNNEST(embedding)')} AS x
  FROM embeddings WHERE vec_id < 300
),
nrm AS (SELECT vid, CAST(SUM(x * x) AS BIGINT) AS norm2 FROM el GROUP BY vid),
bdots AS (
  SELECT q.vid AS q_id, v.vid AS v_id, CAST(SUM(q.x * v.x) AS BIGINT) AS dot
  FROM el q JOIN el v ON q.pos = v.pos AND q.vid <> v.vid
  GROUP BY q.vid, v.vid
),
bcos AS (
  SELECT q_id, v_id, {_COS.format(dot='dot', na='nq.norm2', nb='nv.norm2')} AS cos
  FROM bdots JOIN nrm nq ON nq.vid = q_id JOIN nrm nv ON nv.vid = v_id
),
brute AS (
  SELECT q_id, v_id FROM (
    SELECT q_id, v_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, v_id ASC) AS rank
    FROM bcos
  ) WHERE rank <= 3
),
{_IVF_CTES}
SELECT CAST(COUNT(DISTINCT b.q_id) AS BIGINT) AS n_queries,
       COUNT(*) AS n_true,
       CAST(SUM(CASE WHEN i.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN m.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_multi,
       (CAST(SUM(CASE WHEN i.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         // COUNT(*) AS recall_bp,
       (CAST(SUM(CASE WHEN m.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         // COUNT(*) AS recall_bp_multi
FROM brute b
LEFT JOIN ivf i ON b.q_id = i.q_id AND b.v_id = i.v_id
LEFT JOIN mivf m ON b.q_id = m.q_id AND b.v_id = m.v_id
"""


def sim_pq_adc(spark, sf_dir):
    """Product-quantization ADC search (the compression half of IVF-PQ,
    operators/pq.py): m=4 per-subspace codebooks (k=4, one Lloyd's
    round each), every vector encoded to 4 small codes map-side, then
    the query's asymmetric-distance lookup tables folded into ONE
    map-side expression — the corpus scan does 4 table lookups + 3
    adds per row. Output: the query's top-5 by rounded ADC distance
    (vid tiebreak) with the code words, rank via a 5-row window after
    the TakeOrdered top-k."""
    from pyspark.sql import Window

    from pygdf_spark.operators import pq

    vecs = T(spark, sf_dir, "embeddings")
    codes, books = pq.pq_encode(vecs, m=4, sub=16, k=4, iters=1)
    q_int = pq.query_int_vector(vecs, 0)
    luts = pq.adc_lut(q_int, books, sub=16)
    top5 = (
        codes.filter(F.col("vid") != 0)
        .select(
            "vid", "c0", "c1", "c2", "c3",
            F.round(pq.adc_expr(luts), 0).cast("long").alias("adc_r"),
        )
        .orderBy("adc_r", "vid")
        .limit(5)
    )
    w = Window.orderBy("adc_r", "vid")  # bounded: 5 rows post-limit
    return top5.withColumn("rank", F.row_number().over(w)).orderBy("rank")


def _pq_sub_sql(s: int, sub: int = 16, k: int = 4) -> str:
    """One subspace's oracle CTE chain: seeds → assign → update →
    final assign → the query's ADC lookup table (mirrors kmeans
    iters=1 + operators/pq.adc_lut)."""
    off = s * sub
    dist = (
        f"list_reduce(list_transform(generate_series(1, {sub}), "
        f"i -> (CAST(v.a[{off} + i] AS DOUBLE) - c.c[i]) ** 2), (x, y) -> x + y)"
    )
    qdist = (
        f"list_reduce(list_transform(generate_series(1, {sub}), "
        f"i -> (CAST(q.a[{off} + i] AS DOUBLE) - c.c[i]) ** 2), (x, y) -> x + y)"
    )
    return f"""
s{s}c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid,
         list_transform(generate_series(1, {sub}), i -> CAST(a[{off} + i] AS DOUBLE)) AS c
  FROM (SELECT * FROM v ORDER BY vid LIMIT {k})
),
s{s}d0 AS (SELECT v.vid, c.cid, {dist} AS dist FROM v CROSS JOIN s{s}c0 c),
s{s}a0 AS (SELECT vid, cid FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM s{s}d0
) WHERE rn = 1),
s{s}c1 AS (
  SELECT cid, list(m ORDER BY i) AS c FROM (
    SELECT a0.cid, g.i, CAST(CAST(SUM(v.a[{off} + g.i]) AS BIGINT) AS DOUBLE) / COUNT(*) AS m
    FROM s{s}a0 a0 JOIN v USING (vid) CROSS JOIN generate_series(1, {sub}) AS g(i)
    GROUP BY a0.cid, g.i
  ) GROUP BY cid
),
s{s}d1 AS (SELECT v.vid, c.cid, {dist} AS dist FROM v CROSS JOIN s{s}c1 c),
s{s}a1 AS (SELECT vid, cid FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM s{s}d1
) WHERE rn = 1),
s{s}lut AS (SELECT c.cid, {qdist} AS d FROM s{s}c1 c CROSS JOIN q)"""


SIM_PQ_SQL = f"""
WITH v AS (
  SELECT vec_id AS vid, list_transform(embedding, x -> {_INT}) AS a
  FROM embeddings
),
q AS (SELECT a FROM v WHERE vid = 0),{_pq_sub_sql(0)},{_pq_sub_sql(1)},{_pq_sub_sql(2)},{_pq_sub_sql(3)},
approx AS (
  SELECT v.vid, a0.cid AS c0, a1.cid AS c1, a2.cid AS c2, a3.cid AS c3,
         CAST(round(l0.d + l1.d + l2.d + l3.d, 0) AS BIGINT) AS adc_r
  FROM v
  JOIN s0a1 a0 USING (vid) JOIN s0lut l0 ON l0.cid = a0.cid
  JOIN s1a1 a1 USING (vid) JOIN s1lut l1 ON l1.cid = a1.cid
  JOIN s2a1 a2 USING (vid) JOIN s2lut l2 ON l2.cid = a2.cid
  JOIN s3a1 a3 USING (vid) JOIN s3lut l3 ON l3.cid = a3.cid
  WHERE v.vid <> 0
)
SELECT vid, c0, c1, c2, c3, adc_r,
       CAST(ROW_NUMBER() OVER (ORDER BY adc_r, vid) AS INT) AS rank
FROM approx ORDER BY adc_r, vid LIMIT 5
"""


def dedup_semantic(spark, sf_dir):
    """SemDeDup-shaped semantic dedup: k-means cells (the same coarse
    quantizer as the IVF index), exact integer-cosine pairs WITHIN each
    cell, and a drop rule — any vector with a lower-id cell-mate at
    cosine ≥ τ is removed. Within-cell pairing is the SemDeDup cost
    model: k scales with N so cells stay ~constant-sized and the
    quadratic is bounded per cell. τ=0.30 is the fixture's
    "semantically similar" scale (p99 of random-pair cosine);
    production embeddings use ~0.95+.

    k SCALES WITH N (target cell ≈ 256 vectors, floor 4): within-cell
    pairing is then n·cell ≈ linear, not the fixed-k n²/k quadratic —
    the r4 8× smoke measured 157 s at k=4 on 16k vectors (4k-row
    cells). The oracle computes the same k from COUNT(*), so both
    engines agree exactly. At 100 TB, train the quantizer on a sample
    (assignment is n·k·d) — here the full fixture IS the sample."""
    from pygdf_spark.operators.kmeans import kmeans

    vecs = T(spark, sf_dir, "embeddings")
    k = max(4, vecs.count() // 256)
    assign = kmeans(vecs, k=k, iters=2).select("vid", "cid")
    v = SIM.with_vec(vecs).join(assign, "vid")
    a = v.select(
        F.col("cid"), F.col("vid").alias("va"), F.col("vec").alias("veca"),
        F.col("vid_norm2").alias("na"),
    )
    b = v.select(
        F.col("cid"), F.col("vid").alias("vb"), F.col("vec").alias("vecb"),
        F.col("vid_norm2").alias("nb"),
    )
    pairs = a.join(b, "cid").filter(F.col("va") < F.col("vb"))
    cos = SIM._cos(SIM.dot(F.col("veca"), F.col("vecb")), F.col("na"), F.col("nb"))
    dropped = (
        pairs.filter(cos >= 0.30).select("cid", F.col("vb").alias("vid")).distinct()
    )
    return (
        v.select("cid", "vid")
        .join(dropped.select(F.col("vid"), F.lit(True).alias("__drop")), "vid", "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("__drop").isNotNull().cast("long")).alias("n_dropped"),
            F.sum(F.col("__drop").isNull().cast("long")).alias("n_kept"),
        )
        .orderBy("cid")
    )


DEDUP_SEMANTIC_SQL = f"""
WITH v AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> {_INT}) AS a
  FROM embeddings
),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid,
         list_transform(a, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT * FROM v ORDER BY vid
        LIMIT GREATEST(4, (SELECT COUNT(*) // 256 FROM v)))
),{_km_round("0", "c0")},{_km_update("1", "a0")},{_km_round("1", "c1")},{_km_update("2", "a1")},{_km_round("2", "c2")},
nrm AS (
  SELECT vid, CAST(list_reduce(list_transform(a, x -> x * x), (x, y) -> x + y) AS BIGINT) AS n2
  FROM v
),
m AS (
  SELECT a2.vid, a2.cid, v.a, nrm.n2
  FROM a2 JOIN v USING (vid) JOIN nrm USING (vid)
),
pairs AS (
  SELECT x.cid, x.vid AS va, y.vid AS vb,
         ROUND(CAST(list_reduce(list_transform(generate_series(1, 64),
                 i -> CAST(x.a[i] AS DOUBLE) * y.a[i]), (p, q) -> p + q) AS DOUBLE)
               / sqrt(CAST(x.n2 AS DOUBLE) * y.n2), 8) AS cos
  FROM m x JOIN m y ON x.cid = y.cid AND x.vid < y.vid
),
dropped AS (SELECT DISTINCT vb AS vid FROM pairs WHERE cos >= 0.30)
SELECT cid, COUNT(*) AS n_members,
       CAST(SUM(CASE WHEN vid IN (SELECT vid FROM dropped) THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN vid IN (SELECT vid FROM dropped) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM m GROUP BY cid ORDER BY cid
"""


def search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval — the RAG-stack fusion step: BM25 lexical top-20
    (llm_text.bm25_scores, the same pipeline text_bm25_topk exposes) and
    embedding-cosine top-20 (query = vec 0, ids aligned doc_id↔vec_id)
    fused by Reciprocal Rank Fusion (1/(60+rank), the standard k=60).
    Each branch keeps its scale shape (BM25: in-row tf + 1-row stats
    broadcast; cosine: bounded query broadcast); ranking windows run
    over the LIMITed top-k only (bounded, never corpus-wide); fusion is
    a 20∪20-row full join."""
    from pyspark.sql import Window

    from pygdf_spark.queries.llm_text import bm25_scores

    K, RRF_K = 20, 60
    bm_top = (
        bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(K)
    )
    w_bm = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    bm_rank = bm_top.select("doc_id", F.row_number().over(w_bm).alias("rank_bm"))

    vecs = T(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") == 0)
    cos = SIM.cosine_pairs(vecs, q).select(
        F.col("v_id").alias("doc_id"), "cos"
    )
    cos_top = cos.orderBy(F.col("cos").desc(), F.col("doc_id").asc()).limit(K)
    w_cos = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    cos_rank = cos_top.select("doc_id", F.row_number().over(w_cos).alias("rank_cos"))

    rrf = F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_bm")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(RRF_K) + F.col("rank_cos")), F.lit(0.0)
    )
    return (
        bm_rank.join(cos_rank, "doc_id", "full")
        .select("doc_id", "rank_bm", "rank_cos", F.round(rrf, 8).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _hybrid_sql() -> str:
    from pygdf_spark.queries.llm_text import BM25_CTES

    return rf"""
WITH {BM25_CTES},
bm_rank AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank_bm
  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 20)
),
el AS (
  SELECT vec_id AS vid,
         generate_subscripts(embedding, 1) AS pos,
         {_INT.replace('x', 'UNNEST(embedding)')} AS x
  FROM embeddings
),
nrm AS (SELECT vid, CAST(SUM(x * x) AS BIGINT) AS norm2 FROM el GROUP BY vid),
dots AS (
  SELECT v.vid AS doc_id, CAST(SUM(q.x * v.x) AS BIGINT) AS dot
  FROM el q JOIN el v ON q.pos = v.pos AND v.vid <> 0
  WHERE q.vid = 0
  GROUP BY v.vid
),
cosv AS (
  SELECT doc_id, {_COS.format(dot='dot', na='nq.norm2', nb='nv.norm2')} AS cos
  FROM dots JOIN nrm nq ON nq.vid = 0 JOIN nrm nv ON nv.vid = doc_id
),
cos_rank AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS INT) AS rank_cos
  FROM (SELECT * FROM cosv ORDER BY cos DESC, doc_id ASC LIMIT 20)
)
SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id, b.rank_bm, c.rank_cos,
       ROUND(COALESCE(1.0 / (60 + b.rank_bm), 0.0)
           + COALESCE(1.0 / (60 + c.rank_cos), 0.0), 8) AS rrf
FROM bm_rank b FULL JOIN cos_rank c ON b.doc_id = c.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT 10
"""


def sim_quantize_int8(spark, sf_dir):
    """Int8 embedding quantization — the 4× storage compression an
    embedding store applies before indexing at 100 TB: per-vector
    symmetric scale (max |x| / 127), codes = round(x/scale), plus exact
    integer reconstruction-error accounting (µ-unit absolute error sums
    — a double error sum would be fold-order-dependent). Entirely
    in-row; the output is the per-source compression audit."""
    vecs = T(spark, sf_dir, "embeddings")
    # staged selects: interpreted HOF subtrees are not CSE'd by Catalyst
    # (operators/similarity.py staging convention) — compute x, scale,
    # codes once each instead of inlining the chain into every column
    staged = vecs.select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    ).select(
        "vec_id", "x",
        # zero vector → scale 1.0 (codes all 0, zero error) — x/0.0
        # otherwise diverges between engines (Spark non-ANSI NULL,
        # DuckDB NaN)
        F.when(F.array_max(F.transform("x", F.abs)) == 0, F.lit(1.0))
        .otherwise(F.array_max(F.transform("x", F.abs)) / F.lit(127.0))
        .alias("scale"),
    ).select(
        "vec_id", "x", "scale",
        F.transform("x", lambda v: F.round(v / F.col("scale")).cast("int")).alias("codes"),
    )
    # reconstruction error in exact µ-units: |round(1e6*x) - round(1e6*code*scale)|
    err_u = F.zip_with(
        "x", "codes",
        lambda v, c: F.abs(
            F.round(v * 1_000_000).cast("long")
            - F.round(c.cast("double") * F.col("scale") * 1_000_000).cast("long")
        ),
    )
    per_vec = staged.select(
        "vec_id",
        # scale in exact 1e-8 units so the final average is an integer
        # sum + one division (a double AVG is fold-order-dependent)
        F.round(F.col("scale") * 100_000_000).cast("long").alias("scale_u"),
        F.aggregate(err_u, F.lit(0).cast("long"), lambda a, e: a + e).alias("err_u"),
        F.size(F.filter("codes", lambda c: (c > 127) | (c < -127))).alias("n_clipped"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("err_u").alias("total_err_u"),
        F.round(
            F.sum("scale_u") / F.count(F.lit(1)) / 100_000_000.0, 8
        ).alias("avg_scale"),
        F.sum("n_clipped").cast("long").alias("n_clipped"),
    )


SIM_QUANTIZE_SQL = """
WITH x AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS a
  FROM embeddings
),
s AS (
  SELECT vec_id, a,
         CASE WHEN list_max(list_transform(a, v -> abs(v))) = 0 THEN 1.0
              ELSE list_max(list_transform(a, v -> abs(v))) / 127.0 END AS scale
  FROM x
),
pv AS (
  SELECT vec_id, CAST(ROUND(scale * 100000000, 0) AS BIGINT) AS scale_u,
         CAST(list_reduce(
           list_transform(generate_series(1, len(a)),
             i -> abs(CAST(round(a[i] * 1000000, 0) AS BIGINT)
                    - CAST(round(CAST(round(a[i] / scale, 0) AS DOUBLE) * scale * 1000000, 0) AS BIGINT))),
           (p, q) -> p + q) AS BIGINT) AS err_u,
         len(list_filter(list_transform(a, v -> CAST(round(v / scale, 0) AS INT)),
                         c -> c > 127 OR c < -127)) AS n_clipped
  FROM s
)
SELECT COUNT(*) AS n_vecs,
       CAST(SUM(err_u) AS BIGINT) AS total_err_u,
       ROUND(CAST(SUM(scale_u) AS BIGINT) / COUNT(*) / 100000000.0, 8) AS avg_scale,
       CAST(SUM(n_clipped) AS BIGINT) AS n_clipped
FROM pv
"""


QUERIES = {
    "sim_ivf_topk": sim_ivf_topk,
    "dedup_semantic": dedup_semantic,
    "search_hybrid_rrf": search_hybrid_rrf,
    "sim_quantize_int8": sim_quantize_int8,
    "sim_pq_adc": sim_pq_adc,
    "sim_cosine_topk": sim_cosine_topk,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_neardup_pairs": sim_neardup_pairs,
    "sim_kmeans_ivf": sim_kmeans_ivf,
    "sim_knn_join": sim_knn_join,
    "sim_ivf_probe": sim_ivf_probe,
    "sim_doc_pool": sim_doc_pool,
    "sim_ann_recall": sim_ann_recall,
}

ORACLE = {
    "sim_ivf_topk": SIM_IVF_SQL,
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    "search_hybrid_rrf": _hybrid_sql(),
    "sim_quantize_int8": SIM_QUANTIZE_SQL,
    "sim_pq_adc": SIM_PQ_SQL,
    "sim_cosine_topk": SIM_TOPK_SQL,
    "sim_lsh_buckets": SIM_LSH_SQL,
    "sim_neardup_pairs": SIM_NEARDUP_SQL,
    "sim_kmeans_ivf": SIM_KMEANS_SQL,
    "sim_knn_join": SIM_KNN_JOIN_SQL,
    "sim_ivf_probe": SIM_IVF_PROBE_SQL,
    "sim_doc_pool": SIM_DOC_POOL_SQL,
    "sim_ann_recall": SIM_RECALL_SQL,
}

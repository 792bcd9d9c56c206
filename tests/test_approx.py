"""Approximate aggregates — the documented scale path for NUNIQUE /
QUANTILE (SURVEY.md §2.4: countDistinct→approx_count_distinct,
percentile→percentile_approx at 100 TB). Sketches can't hash-match a
DuckDB oracle, so they are pinned by tolerance against the exact
answer instead."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx_close_to_exact(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", 0.5).alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_approx_grouped_deterministic(spark, sf_dir):
    """HLL merge is commutative: two runs over different partitionings
    must agree with each other (determinism, not accuracy)."""
    li = T(spark, sf_dir, "lineitem")
    a = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    b = {
        r["l_returnflag"]: r["n"]
        for r in li.repartition(7, "l_partkey")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    assert a == b


def test_bucketed_topk_explicit_queries_id_collision(spark):
    """Round-2 review fix: with an explicit query set, a corpus match
    whose vec_id equals a query's vec_id must NOT be dropped (the ids
    live in different spaces; the self-filter applies only to
    self-ANN)."""
    from pyspark.sql import functions as F

    from pygdf_spark.operators.similarity import bucketed_topk

    corpus = spark.createDataFrame(
        [(i, [float(i % 3 + 1), 1.0]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    # query id 0 collides with corpus id 0; vector identical to corpus
    # vec 3 so its nearest neighbors are well-defined
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    got = bucketed_topk(corpus, k=12, n_planes=1, queries=queries).collect()
    v_ids = {r["v_id"] for r in got}
    # corpus vec 0 shares the query's bucket and MUST appear
    assert 0 in v_ids, "id-collision match was dropped"
    # self-ANN mode still excludes self-pairs
    self_ann = bucketed_topk(corpus, k=3, n_planes=1).collect()
    assert all(r["q_id"] != r["v_id"] for r in self_ann)


def test_pq_adc_bounds_brute_force(spark, sf_dir):
    """PQ ADC is a lossy quantization (k=4 codebooks leave large cell
    error), so the guarantee tested is better-than-random: the exact
    distance of ADC-selected neighbors must beat the corpus mean, and
    ADC distances are nonnegative."""
    import pyspark.sql.functions as F

    from pygdf_spark.operators import pq
    from pygdf_spark.operators.similarity import _int_vec

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, books = pq.pq_encode(vecs, m=4, sub=16, k=4, iters=1)
    q = pq.query_int_vector(vecs, 0)
    luts = pq.adc_lut(q, books, sub=16)
    top = (
        codes.filter(F.col("vid") != 0)
        .select("vid", F.round(pq.adc_expr(luts), 0).cast("long").alias("d"))
        .orderBy("d", "vid")
        .limit(5)
        .collect()
    )
    assert all(r.d >= 0 for r in top)
    iv = vecs.select(F.col("vec_id").alias("vid"), _int_vec("embedding").alias("a"))
    qv = F.array(*[F.lit(int(x)) for x in q])
    exact_d = {r.vid: r.d for r in (
        iv.filter(F.col("vid") != 0)
        .select(
            "vid",
            F.aggregate(
                F.zip_with("a", qv, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d"),
        )
        .collect()
    )}
    sel_mean = sum(exact_d[r.vid] for r in top) / len(top)
    corpus_mean = sum(exact_d.values()) / len(exact_d)
    assert sel_mean < corpus_mean, (sel_mean, corpus_mean)

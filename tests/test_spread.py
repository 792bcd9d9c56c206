"""_util.spread — the tiny-scan parallelizer (opt r7, guide §2.5).

Contract under test:
- a small single-file parquet scan is repartitioned up to the session
  parallelism (the whole point: heavy per-row pipelines must not
  serialize onto one task);
- an input that already splits into >= parallelism partitions passes
  through UNTOUCHED (at scale the helper is a no-op — no extra
  exchange, no shuffled bytes);
- results are layout-independent: keyed aggregates over the spread
  frame equal the unspread ones exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, spread

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_spread_raises_tiny_scan_parallelism(spark):
    d = T(spark, SF_SMALL, "documents")
    n_before = d.rdd.getNumPartitions()
    out = spread(d)
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    ) > 0
    if n_before < spark.sparkContext.defaultParallelism:
        assert out.rdd.getNumPartitions() > n_before


def test_spread_noop_when_already_parallel(spark):
    d = T(spark, SF_SMALL, "documents")
    # min_parts=1: every scan already carries >= 1 partition, so the
    # helper must return the SAME plan (no Repartition node)
    out = spread(d, min_parts=1)
    assert out is d


def test_spread_results_layout_independent(spark):
    d = T(spark, SF_SMALL, "documents")
    agg = lambda df: sorted(  # noqa: E731
        df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
        ).collect()
    )
    assert agg(spread(d)) == agg(d)


def test_spread_falls_back_without_local_files(spark):
    # a frame with no inputFiles (in-memory) must not crash — the
    # helper falls back to Spark's own partition count
    df = spark.range(10).repartition(2)
    out = spread(df, min_parts=2)
    assert sorted(r["id"] for r in out.collect()) == list(range(10))

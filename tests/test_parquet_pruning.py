"""write_parquet scan-pruning knobs (r6): cluster_by zone maps + bloom
filters. Verified against the PHYSICAL file artifacts (pyarrow footer
stats / file bytes), not just a read-back — the knobs exist to change
what a 100 TB scan can skip, so the test asserts the skippable
structure is actually in the files."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pygdf_spark.sources.io import write_parquet


@pytest.fixture()
def big_df(spark):
    # enough rows + a tiny row-group size to force multiple row groups
    return spark.range(0, 200_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 977).alias("v"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )


def _one_file(path: str) -> str:
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert files
    return files[0]


def test_cluster_by_yields_nonoverlapping_rowgroup_stats(spark, big_df, tmp_path):
    dst = str(tmp_path / "clustered")
    # one scrambled partition in, small row groups out: cluster_by must
    # produce sorted, non-overlapping zone maps across the row groups
    df = big_df.repartition(1).sortWithinPartitions("payload")  # scramble k
    write_parquet(
        df, dst, cluster_by=["k"],
        options={"parquet.block.size": 64 * 1024},
    )
    meta = pq.ParquetFile(_one_file(dst)).metadata
    assert meta.num_row_groups > 1
    col_idx = [meta.schema.column(i).name for i in range(meta.num_columns)].index("k")
    ranges = []
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(col_idx).statistics
        assert st is not None and st.has_min_max
        ranges.append((st.min, st.max))
    # zone maps: sorted and non-overlapping
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2 <= hi2, ranges


def test_bloom_filter_cols_add_bloom_bytes(spark, big_df, tmp_path):
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df = big_df.coalesce(1)
    write_parquet(df, plain)
    write_parquet(df, bloomed, bloom_filter_cols=["payload"])
    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(os.path.join(p, "*.parquet")))  # noqa: E731
    # a bloom filter for a 200k-value high-cardinality column is
    # hundreds of KB — unmistakable in the file size
    assert size(bloomed) > size(plain) + 50_000, (size(plain), size(bloomed))
    # and the data still reads back identically
    a = spark.read.parquet(plain).agg(F.sum("v")).collect()[0][0]
    b = spark.read.parquet(bloomed).agg(F.sum("v")).collect()[0][0]
    assert a == b

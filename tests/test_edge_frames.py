"""Edge-shape regression battery: zero-row frames, all-null keys,
single-row windows. The reference's test suites hammer these shapes
(python/cudf/cudf/tests/test_dataframe.py empty-frame cases,
test_groupby.py null-key cases); at scale they correspond to empty
partitions and degenerate key domains, which every operator must pass
through without raising."""

from __future__ import annotations

import pandas as pd
import pytest

import pygdf_spark as gd


@pytest.fixture(scope="module")
def g_empty(spark):
    pdf = pd.DataFrame({"k": pd.Series([], dtype="object"),
                        "x": pd.Series([], dtype="int64")})
    return gd.from_pandas(pdf, spark=spark)


@pytest.fixture(scope="module")
def g_small(spark):
    return gd.from_pandas(pd.DataFrame({"k": ["a", None, "a"], "x": [1, 2, 3]}),
                          spark=spark)


def test_empty_frame_ops_return_empty(g_empty):
    assert len(g_empty.groupby("k").agg({"x": "sum"})) == 0
    assert len(g_empty.sort_values("x")) == 0
    assert len(g_empty.drop_duplicates(["k"])) == 0
    assert len(g_empty.head(5)) == 0
    assert len(g_empty.value_counts("k")) == 0
    assert len(g_empty.cumsum("x")) == 0
    assert len(g_empty.melt(["k"], ["x"])) == 0
    assert len(g_empty.nlargest(3, "x")) == 0
    assert len(g_empty.rank("x")) == 0
    codes, uniques = g_empty["k"].factorize()
    assert len(uniques) == 0


def test_merge_with_empty_side(g_small, g_empty):
    out = g_small.merge(g_empty, on="k", how="left").to_pandas()
    assert len(out) == 3  # left rows survive, right payload all-null
    inner = g_small.merge(g_empty, on="k", how="inner").to_pandas()
    assert len(inner) == 0


def test_all_null_group_key(spark):
    g = gd.from_pandas(pd.DataFrame({"k": [None, None], "x": [1, 2]}),
                       spark=spark)
    out = g.groupby("k").agg({"x": "sum"}).to_pandas()
    # cuDF/pandas dropna=True default: the all-null key produces no group
    assert len(out) == 0


def test_single_row_window_ops(spark):
    g1 = gd.from_pandas(pd.DataFrame({"x": [5.0]}), spark=spark)
    rolled = g1.rolling(3, min_periods=1).sum("x").to_pandas()
    assert rolled["x_roll_sum"].tolist() == [5.0]
    g2 = gd.from_pandas(pd.DataFrame({"x": [5]}), spark=spark)
    shifted = g2.shift("x").to_pandas()
    assert pd.isna(shifted["x_shift"]).all()


def test_qcut_empty_and_degenerate(spark, g_empty):
    assert len(gd.qcut(g_empty["x"], 2).to_pandas()) == 0
    # constant column: every row lands in bin 0 (all edges equal)
    gc = gd.from_pandas(pd.DataFrame({"x": [7, 7, 7]}), spark=spark)
    assert gd.qcut(gc["x"], 2).to_pandas().tolist() == [0, 0, 0]

"""pandas-oracle tests for the module-level reshape API
(cudf.concat/melt/pivot/get_dummies parity) + the mapInArrow surface."""

from __future__ import annotations

import pandas as pd
import pandas.testing as pdt
import pytest

from pygdf_spark.core import concat, from_spark, get_dummies, melt, pivot, unstack
from pygdf_spark.operators.apply import apply_arrow


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "m": ["x", "y", "x", "y"],
        "v": [1.0, 2.0, 3.0, 4.0],
        "w": [10, 20, 30, 40],
    })


@pytest.fixture(scope="module")
def gdf(spark, pdf):
    return from_spark(spark.createDataFrame(pdf))


def eq(got, exp, sort_by):
    g = got.to_pandas().sort_values(sort_by).reset_index(drop=True)
    e = exp.sort_values(sort_by).reset_index(drop=True)
    pdt.assert_frame_equal(g, e, check_dtype=False)


def test_concat_outer_and_inner(spark, gdf, pdf):
    other_pd = pd.DataFrame({"k": ["c"], "v": [9.0], "z": [99]})
    other = from_spark(spark.createDataFrame(other_pd))
    out = concat([gdf, other], join="outer")
    exp = pd.concat([pdf, other_pd], ignore_index=True)
    eq(out[["k", "v", "z"]], exp[["k", "v", "z"]], ["k", "v"])
    inner = concat([gdf, other], join="inner")
    assert sorted(inner.columns) == ["k", "v"]
    assert inner.shape[0] == 5


def test_melt_matches_pandas(gdf, pdf):
    out = melt(gdf, id_vars=["k", "m"], value_vars=["v", "w"])
    exp = pdf.melt(id_vars=["k", "m"], value_vars=["v", "w"])
    eq(out, exp, ["k", "m", "variable"])


def test_pivot_matches_pandas(gdf, pdf):
    out = pivot(gdf, index="k", columns="m", values="v", column_values=["x", "y"])
    exp = pdf.pivot(index="k", columns="m", values="v").reset_index()
    exp.columns.name = None
    eq(out, exp, ["k"])


def test_get_dummies(gdf, pdf):
    out = get_dummies(gdf, "m", values=["x", "y"])
    exp = pd.concat([pdf, pd.get_dummies(pdf.m, prefix="m").astype(int)], axis=1)
    eq(out[["k", "m", "m_x", "m_y"]], exp[["k", "m", "m_x", "m_y"]], ["k", "m"])


def test_unstack(spark, gdf, pdf):
    out = unstack(gdf, "k", "m", "v", column_values=["x", "y"])
    exp = pdf.set_index(["k", "m"])["v"].unstack().reset_index()
    exp.columns.name = None
    eq(out, exp, ["k"])
    # fill_value plugs ONLY structurally-missing cells: ('b','y') is
    # absent (filled), while ('a','y') exists with a null value and
    # must KEEP the null, exactly as pandas
    sparse_pd = pdf.iloc[[0, 1, 2]].copy()  # ('b','y') missing
    sparse_pd.loc[sparse_pd.index[1], "v"] = None  # ('a','y') present, null
    sparse = from_spark(spark.createDataFrame(sparse_pd))
    out = unstack(sparse, "k", "m", "v", fill_value=0.0, column_values=["x", "y"])
    exp = sparse_pd.set_index(["k", "m"])["v"].unstack(fill_value=0.0).reset_index()
    exp.columns.name = None
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert got.loc[got.k == "b", "y"].iloc[0] == 0.0          # structural hole filled
    assert pd.isna(got.loc[got.k == "a", "y"].iloc[0])        # present null kept
    assert pd.isna(exp.loc[exp.k == "a", "y"].iloc[0])        # pandas agrees


def test_map_in_arrow(spark):
    import pyarrow as pa

    df = spark.createDataFrame([(1, 2.0), (3, 4.0)], "a long, b double")

    def double_a(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [pa.compute.multiply(t.column("a").combine_chunks(), 2)], names=["a2"]
            )

    out = apply_arrow(df, double_a, "a2 long").collect()
    assert sorted(r["a2"] for r in out) == [2, 6]

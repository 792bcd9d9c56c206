"""Boundary-sampling reuse across chained veneer order ops (r4 verdict
task #6): sort_values → diff → cumsum must run at most ONE boundary-
sampling job per key-set — each primitive otherwise re-samples its
ever-growing upstream plan — with results identical to pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def counted_boundaries(monkeypatch):
    """Count calls to the order module's boundary-sampling collect."""
    import pygdf_spark.operators.order as order

    calls = []
    real = order._boundaries

    def spy(keys_df, specs, num_partitions):
        calls.append(tuple(s[0] for s in specs) if specs else ())
        return real(keys_df, specs, num_partitions)

    monkeypatch.setattr(order, "_boundaries", spy)
    return calls


def _pdf(n=500):
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "k": rng.integers(0, 50, n),
        "v": rng.normal(size=n).round(3),
    })


def test_chain_samples_once_per_keyset(spark, counted_boundaries):
    import pygdf_spark as gd

    pdf = _pdf()
    g = gd.from_pandas(pdf, spark)
    out = (
        g.sort_values(["k", "v"])      # lazy re-key: samples sort keys once
        .diff("v")                      # [_RID] sample #1 (cached)
        .cumsum("v")                    # reuse
        .shift("v", 2)                  # reuse
        .to_pandas()
    )
    # one sampling for the sort keys (rekey) + one for the new RID set
    assert len(counted_boundaries) <= 2, counted_boundaries

    exp = pdf.sort_values(["k", "v"], kind="stable").reset_index(drop=True)
    sv = exp["v"]
    assert np.allclose(out["v_diff"].to_numpy(), sv.diff().to_numpy(), equal_nan=True)
    assert np.allclose(out["v_cumsum"].to_numpy(), sv.cumsum().to_numpy(), equal_nan=True)
    assert np.allclose(out["v_shift"].to_numpy(), sv.shift(2).to_numpy(), equal_nan=True)


def test_chain_results_unchanged_without_sort(spark, counted_boundaries):
    import pygdf_spark as gd

    pdf = _pdf(300)
    g = gd.from_pandas(pdf, spark)
    out = g.cumsum("v").diff("v").to_pandas()
    assert len(counted_boundaries) <= 1, counted_boundaries
    assert np.allclose(out["v_cumsum"].to_numpy(), pdf["v"].cumsum().to_numpy())
    assert np.allclose(
        out["v_diff"].to_numpy(), pdf["v"].diff().to_numpy(), equal_nan=True
    )


def test_rekey_invalidates_rid_bounds(spark):
    """A re-sort between chained ops must NOT reuse boundaries from the
    old RID domain (they would funnel the new dense RIDs into one
    bucket) — the cache lives on the frame and a sort_values output is
    a fresh frame with no inherited cache."""
    import pygdf_spark as gd

    pdf = _pdf(200)
    g = gd.from_pandas(pdf, spark)
    a = g.cumsum("v")             # caches bounds for original RIDs
    b = a.sort_values("v").diff("v")   # new RID domain after re-key
    assert getattr(b, "_rid_bounds_cache", None) is not getattr(
        a, "_rid_bounds_cache", None
    ) or getattr(a, "_rid_bounds_cache", None) is None
    exp = pdf.assign(v_cumsum=pdf["v"].cumsum()).sort_values(
        "v", kind="stable").reset_index(drop=True)
    out = b.to_pandas()
    assert np.allclose(
        out["v_diff"].to_numpy(), exp["v"].diff().to_numpy(), equal_nan=True
    )


def test_assign_preserves_bounds_cache(spark, counted_boundaries):
    import pygdf_spark as gd
    from pyspark.sql import functions as F

    pdf = _pdf(300)
    g = gd.from_pandas(pdf, spark)
    out = (
        g.sort_values("v")
        .cumsum("v")
        .assign(w=F.col("v") * 2)
        .diff("w")
        .to_pandas()
    )
    assert len(counted_boundaries) <= 2, counted_boundaries
    exp = pdf.sort_values("v", kind="stable").reset_index(drop=True)
    assert np.allclose(out["v_cumsum"].to_numpy(), exp["v"].cumsum().to_numpy())
    assert np.allclose(out["w_diff"].to_numpy(),
                       (exp["v"] * 2).diff().to_numpy(), equal_nan=True)

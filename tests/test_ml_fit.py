"""Close the distributed-fit loop: solve the normal equations from
ml_gram_suffstats' 1-row output and pin the coefficients against
numpy.linalg.lstsq on the locally-materialized feature matrix.
"""

from __future__ import annotations

import numpy as np


def test_gram_suffstats_solve_matches_lstsq(spark, sf_dir):
    from pygdf_spark.queries.ml_fit import _features, ml_gram_suffstats
    from pygdf_spark.queries._util import T

    row = ml_gram_suffstats(spark, sf_dir).collect()[0].asDict()

    d = 5
    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = row[f"s_{i}{j}"]
    b = np.array([row[f"s_{i}y"] for i in range(d)], dtype=float)
    beta_gram = np.linalg.solve(G, b)

    pdf = _features(T(spark, sf_dir, "documents")).toPandas()
    Xm = pdf[["x0", "x1", "x2", "x3", "x4"]].to_numpy(dtype=float)
    yv = pdf["y"].to_numpy(dtype=float)
    beta_ref = np.linalg.lstsq(Xm, yv, rcond=None)[0]

    assert row["n_rows"] == len(pdf)
    np.testing.assert_allclose(beta_gram, beta_ref, rtol=1e-6, atol=1e-8)

    # the fit is real: residuals beat the intercept-only baseline
    pred = Xm @ beta_gram
    sse = float(((yv - pred) ** 2).sum())
    sst = float(((yv - yv.mean()) ** 2).sum())
    assert sse < sst

"""Close the distributed-fit loop: solve the normal equations from
ml_gram_suffstats' 1-row output and pin the coefficients against
numpy.linalg.lstsq on the locally-materialized feature matrix.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


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


def test_logreg_distributed_matches_scalar_reference(spark, sf_dir):
    """The distributed batch-GD logistic fit equals the scalar
    reference run with the same iteration order (float-sum partition
    order is the only slack -> rtol 1e-6), and the learned filter
    actually separates the labels better than chance."""
    import numpy as np

    from pygdf_spark.operators.linear_model import (
        hashed_ngram_features,
        logreg_fit,
        logreg_fit_reference,
        logreg_score,
    )
    from pygdf_spark.queries._util import T

    D = 64
    docs = T(spark, sf_dir, "documents")
    feats = hashed_ngram_features(docs, d=D)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    model = logreg_fit(spark, feats, labels, d=D, iters=6)

    rows_pd = feats.toPandas()
    lab_pd = labels.toPandas().set_index("doc")["y"].to_dict()
    by_doc: dict = {}
    for r in rows_pd.itertuples():
        by_doc.setdefault(r.doc, {})[int(r.bucket)] = int(r.cnt)
    ref_rows = [(by_doc.get(doc, {}), float(y)) for doc, y in lab_pd.items()]
    ref = logreg_fit_reference(ref_rows, d=D, iters=6)
    np.testing.assert_allclose(model["w"], ref["w"], rtol=1e-6, atol=1e-9)
    assert abs(model["b"] - ref["b"]) < 1e-9

    scored = logreg_score(spark, feats, model).join(labels, "doc")
    pdf = scored.toPandas()
    acc = ((pdf["prob"] > 0.5).astype(int) == pdf["y"]).mean()
    base = max(pdf["y"].mean(), 1 - pdf["y"].mean())
    assert acc >= base, f"classifier no better than majority: {acc} < {base}"


def test_logreg_first_step_is_half_integer(spark, sf_dir):
    """At w=0 the gradient is exactly (1/2)*sum(cnt*(2y-1)) — the
    integer identity the registry oracle relies on."""
    import numpy as np

    from pygdf_spark.operators.linear_model import (
        hashed_ngram_features,
        logreg_fit,
    )
    from pygdf_spark.queries._util import T
    from pygdf_spark.queries.ml_fit import ml_logreg_grad0

    D = 64
    docs = T(spark, sf_dir, "documents")
    feats = hashed_ngram_features(docs, d=D)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    n = labels.count()
    one = logreg_fit(spark, feats, labels, d=D, iters=1, lr=1.0, l2=0.0)
    grad2 = {
        r["bucket"]: r["grad2"] for r in ml_logreg_grad0(spark, sf_dir).collect()
    }
    for j, wj in enumerate(one["w"]):
        expect = 0.5 * grad2.get(j, 0) / n
        assert abs(wj - expect) < 1e-12, (j, wj, expect)

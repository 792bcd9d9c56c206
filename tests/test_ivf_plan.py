"""IVF probe plan + storage-leak regressions (r6).

Two properties the r5/r6 rounds each caught one bug for:
- the lazy probe plan must not duplicate HOF subtrees (the r5 plan-audit
  catch: Catalyst inlined the quantize/distance folds into a Filter and
  both join branches) — checked here on ``materialize=False`` because the
  default eager path returns a LocalTableScan that hides the plan from
  tools/audit_plans.py;
- the default eager path must release the index cache it persists
  (ADVICE r5: every call leaked a cached DataFrame into executor
  storage until someone cleared the whole cache).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _vecs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .select("vec_id", "embedding")


def test_ivf_lazy_plan_has_no_dup_hof(spark, sf_dir):
    from audit_plans import dup_hof_subtrees

    from pygdf_spark.operators.kmeans import ivf_probe_topk

    out = ivf_probe_topk(_vecs(spark, sf_dir), materialize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert dup_hof_subtrees(plan) == 0, plan
    # caller-side cleanup for the lazy path
    spark.catalog.clearCache()


def test_ivf_eager_path_unpersists_index(spark, sf_dir):
    from pygdf_spark.operators.kmeans import ivf_probe_topk

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    res = ivf_probe_topk(_vecs(spark, sf_dir))
    assert res.count() > 0
    after = jsc.getPersistentRDDs().size()
    assert after <= before, f"persisted RDDs leaked: {before} -> {after}"

"""The correctness gate, run locally: every registered query must
hash-match its DuckDB oracle at sf0.001 (fast tier; the driver runs
sf0.01 — run ``python tools/check_oracle.py`` for that)."""

from __future__ import annotations

import pytest

from pygdf_spark.queries import registry
from pygdf_spark.testing import compare_query

QUERIES, ORACLE = registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match(spark, sf_dir, name):
    res = compare_query(spark, name, QUERIES[name], ORACLE.get(name), sf_dir)
    assert res["ok"], res.get("error", res)
    if ORACLE.get(name) is None:
        assert res["rows"] >= 0

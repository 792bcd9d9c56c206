"""Model-based property test for the deltalite schema-evolution/DML
surface: a RANDOM sequence of append / rename_column / drop_column /
delete_where / compact is applied both to a real table and to an
in-memory pandas model; after EVERY step ``read_table`` must equal the
model exactly (rows, logical column names, values incl. nulls).

This is the strongest check the column-mapping design gets: any
translation slip (stale physical name, resurfaced dropped bytes,
mis-keyed DV, lost rename through a rewrite) diverges from the model
within a couple of operations, under operation ORDERINGS no
hand-written test enumerates.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl

# ops are data (not lambdas) so hypothesis shrinks sequences readably:
# (kind, seed) — the interpreter resolves seeds against current state
OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "append_new", "rename", "drop",
                         "delete_dv", "delete_rw", "compact"]),
        st.integers(0, 10 ** 6),
    ),
    min_size=1, max_size=7,
)


def _mk_rows(start: int, n: int, cols: list[str]) -> pd.DataFrame:
    data = {"k": list(range(start, start + n))}
    for c in cols:
        if c == "k":
            continue
        base = sum(map(ord, c))
        data[c] = [base * 1000 + k for k in data["k"]]
    return pd.DataFrame(data)


def _read_model(spark, table) -> pd.DataFrame:
    pdf = dl.read_table(spark, table).toPandas()
    return pdf


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for _, row in pdf.sort_values("k").iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            else:
                vals.append(int(v))
        out.append(tuple(vals))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=OPS)
def test_random_ddl_dml_sequence_matches_model(spark, tmp_path_factory,
                                               ops):
    table = str(tmp_path_factory.mktemp("mm") / "tbl")
    renames = 0
    news = 0
    next_k = 0

    # seed table
    model = _mk_rows(0, 4, ["k", "a", "b"])
    next_k = 4
    sdf = spark.createDataFrame(model)
    dl.append(sdf, table, stat_cols=["k"])

    for kind, seed in ops:
        logical = list(model.columns)
        non_key = [c for c in logical if c != "k"]
        if kind in ("append", "append_new"):
            cols = list(logical)
            if kind == "append_new":
                news += 1
                cols.append(f"c{news}")
            rows = _mk_rows(next_k, 2 + seed % 3, cols)
            next_k += len(rows)
            dl.append(spark.createDataFrame(rows), table, stat_cols=["k"])
            model = pd.concat([model, rows], ignore_index=True)
        elif kind == "rename":
            if not non_key:
                continue
            old = non_key[seed % len(non_key)]
            renames += 1
            new = f"r{renames}"
            dl.rename_column(table, old, new)
            model = model.rename(columns={old: new})
        elif kind == "drop":
            if not non_key:
                continue
            col = non_key[seed % len(non_key)]
            dl.drop_column(table, col)
            model = model.drop(columns=[col])
        elif kind in ("delete_dv", "delete_rw"):
            keys = sorted(model["k"])
            if not keys:
                continue
            victim = keys[seed % len(keys)]
            mode = "dv" if kind == "delete_dv" else "rewrite"
            res = dl.delete_where(spark, table, [("k", "=", int(victim))],
                                  mode=mode, stat_cols=["k"])
            assert res["rows_deleted"] == 1
            model = model[model["k"] != victim]
        elif kind == "compact":
            dl.compact(spark, table, num_files=1, stat_cols=["k"])

        got = _read_model(spark, table)
        assert sorted(got.columns) == sorted(model.columns), (kind, seed)
        assert _normalize(got) == _normalize(model), (kind, seed)

"""Local replica of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark DataFrame and the oracle SQL on
the same parquet tables, normalize (sort columns by name, canonicalize
cells, sort rows), and compare **exactly** — including bit-exact floats.
If this passes, any sane value-hash comparison passes too.

Modeled on the reference's pandas-oracle strategy
(python/cudf/cudf/testing/_utils.py:70 assert_eq — normalize then
compare), with DuckDB playing the role of pandas.
"""

from __future__ import annotations

import math
import os
from typing import Any

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the sf1
            # fixture; single-file tables at the driver tiers) — DuckDB
            # needs the explicit glob
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v: Any) -> Any:
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ("~null",)
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("arr", tuple(_canon_cell(x) for x in v))
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, bool):
        return ("b", v)
    # dtype-strict numeric tags (r6): the driver's value-hash distinguishes
    # int64 from float64 (q12's HUGEINT→float64 oracle hash-failed in r5
    # while the local int→float coercion reported [exact]).  Ints, floats
    # and Decimals therefore canonicalize under DISTINCT tags so the local
    # gate reproduces the driver's hash discipline.
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("n", v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("dec", float(v))
    except ImportError:
        pass
    return (type(v).__name__, str(v))


def canonicalize(df) -> list[tuple]:
    """pandas DataFrame → sorted list of canonical row tuples."""
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows, key=repr)


def compare_query(spark, name: str, query_fn, sql: str | None, sf_dir: str) -> dict:
    """Run one query both ways; return a result dict (ok/rows/error)."""
    out: dict[str, Any] = {"name": name}
    mine = query_fn(spark, sf_dir).toPandas()
    out["rows"] = len(mine)
    if sql is None:
        out["ok"] = True
        out["mode"] = "rows-only"
        return out
    con = duckdb_con(sf_dir)
    theirs = con.sql(sql).df()
    con.close()
    out["oracle_rows"] = len(theirs)
    if sorted(mine.columns) != sorted(theirs.columns):
        out["ok"] = False
        out["error"] = f"columns {sorted(mine.columns)} != {sorted(theirs.columns)}"
        return out
    a, b = canonicalize(mine), canonicalize(theirs)
    if len(a) != len(b):
        out["ok"] = False
        out["error"] = f"row count {len(a)} != {len(b)}"
        return out
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            out["ok"] = False
            out["error"] = f"row {i} differs:\n  spark:  {ra}\n  oracle: {rb}"
            return out
    out["ok"] = True
    out["mode"] = "exact"
    return out


# -- cudf.testing API parity (assert_eq surface) --------------------------


def _host(obj):
    return obj.to_pandas() if hasattr(obj, "to_pandas") else obj


def assert_eq(left, right, check_dtype: bool = False, **kwargs) -> None:
    """cudf.testing.assert_eq parity: order-respecting equality of
    frames/series/scalars (host, small-data — a TEST helper, like the
    reference's `_utils.py:70`)."""
    import pandas as pd
    import pandas.testing as pdt

    l, r = _host(left), _host(right)
    if isinstance(l, pd.DataFrame) or isinstance(r, pd.DataFrame):
        pdt.assert_frame_equal(
            l.reset_index(drop=True), r.reset_index(drop=True),
            check_dtype=check_dtype, **kwargs,
        )
    elif isinstance(l, pd.Series) or isinstance(r, pd.Series):
        pdt.assert_series_equal(
            l.reset_index(drop=True), r.reset_index(drop=True),
            check_dtype=check_dtype, check_names=False, **kwargs,
        )
    else:
        assert l == r, f"{l!r} != {r!r}"


assert_frame_equal = assert_eq
assert_series_equal = assert_eq

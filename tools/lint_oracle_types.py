"""Static oracle-output-type lint (r6, VERDICT r5 Next #1b).

The driver's value-hash is TYPE-SENSITIVE: a DuckDB oracle whose output
binds to HUGEINT / unsigned / uncast DECIMAL converts to float64 (or
Decimal objects) on the pandas side and hash-mismatches a value-identical
Spark BIGINT/DOUBLE answer — exactly how `q12_priority_class` went
driver-red in r5 while the local gate reported [exact].  This lint binds
every registry oracle SQL against the sf0.001 views (LIMIT-0 semantics:
DuckDB relation `.types` binds without executing) and rejects the fatal
output types outright, so the class can never re-enter the registry.

Fatal types: HUGEINT, UHUGEINT, UTINYINT, USMALLINT, UINTEGER, UBIGINT,
and DECIMAL(...) (uncast decimal sums — the reference registry casts all
of these to BIGINT/DOUBLE explicitly).

Usage: python tools/lint_oracle_types.py [sf_dir]
Exit 1 on any flagged oracle.  Called from tools/adversarial_gate.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark.queries import registry  # noqa: E402
from pygdf_spark.testing import duckdb_con  # noqa: E402

FATAL = ("HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
         "UBIGINT", "DECIMAL")


def lint(sf_dir: str = "/root/testdata/sf0.001") -> int:
    _, oracle = registry()
    con = duckdb_con(sf_dir)
    flagged = 0
    for name in sorted(oracle):
        sql = oracle[name]
        if sql is None:
            continue
        try:
            rel = con.sql(sql)
            types = [str(t).upper() for t in rel.types]
            cols = list(rel.columns)
        except Exception as e:
            print(f"ERR  {name}: bind failed: {type(e).__name__}: {e}")
            flagged += 1
            continue
        bad = [f"{c}:{t}" for c, t in zip(cols, types)
               if any(t.startswith(f) for f in FATAL)]
        if bad:
            flagged += 1
            print(f"FLAG {name}: " + ", ".join(bad)
                  + "  (CAST to BIGINT/DOUBLE in the oracle SQL)")
    con.close()
    print(f"oracle-type lint: {flagged} flagged / {len(oracle)} oracles")
    return flagged


if __name__ == "__main__":
    sys.exit(1 if lint(sys.argv[1] if len(sys.argv) > 1 else
                       "/root/testdata/sf0.001") else 0)

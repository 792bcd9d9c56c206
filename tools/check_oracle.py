"""Run the full oracle comparison at a given SF (default sf0.01 — the
driver's tier). Prints one line per query and a summary."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import get_spark
from pygdf_spark.queries import registry
from pygdf_spark.testing import compare_query


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("oracle-check")
    queries, oracle = registry()
    bad = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, name, queries[name], oracle.get(name), sf_dir)
        except Exception as e:
            res = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        dt = time.time() - t0
        status = "OK  " if res["ok"] else "FAIL"
        mode = res.get("mode", "?")
        print(f"{status} {name:32s} {dt:6.2f}s rows={res.get('rows','?'):>6} [{mode}]")
        if not res["ok"]:
            bad += 1
            print(f"     {res.get('error','')[:500]}")
    print(f"\n{'ALL OK' if bad == 0 else f'{bad} FAILURES'} / {len(queries)} queries")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

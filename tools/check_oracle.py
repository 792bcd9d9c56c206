"""Run the full oracle comparison at a given SF (default sf0.01 — the
driver's tier). Prints one line per query and a summary.

--json PATH additionally writes a machine-readable report in the
driver's CORRECTNESS shape (rows/schema/hash per query) covering EVERY
registry entry — the committed complement of the driver's 50-entry
window."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import get_spark
from pygdf_spark.queries import registry
from pygdf_spark.testing import compare_query


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_path = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_path = a.split("=", 1)[1]
        elif a == "--json":
            json_path = "CORRECTNESS_LOCAL.json"
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    # accept both "a,b,c" and "a b c" (the silent-single-name trap:
    # space-separated names used to run only args[1])
    only = (
        {n for a in args[1:] for n in a.split(",") if n} or None
        if len(args) > 1 else None
    )
    spark = get_spark("oracle-check")
    queries, oracle = registry()
    if only:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
    bad = 0
    report = {}
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
        report[name] = {
            "ok": res["ok"], "mode": mode, "rows": res.get("rows"),
            "sec": round(dt, 2), "err": res.get("error"),
        }
        if not res["ok"]:
            bad += 1
            print(f"     {res.get('error','')[:500]}")
    print(f"\n{'ALL OK' if bad == 0 else f'{bad} FAILURES'} / {len(queries)} queries")
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(report),
                       "n_failures": bad, "results": report}, f, indent=1)
        print(f"wrote {json_path}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

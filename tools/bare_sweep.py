"""Run every registry query on a BARE SparkSession — the driver's shape.

The tuned session (pygdf_spark.session.get_spark) masks config
dependencies: Spark 4 defaults ANSI ON (int div/mod-by-zero THROW), the
system zone may not be UTC (shifts hour()/window() VALUES), and
events.parquet needs nanosAsLong. queries._util.pin_session_confs pins
all three at runtime; this sweep proves no query depends on anything
else. Execution-only by default (limit(3).collect()); the value side is
check_oracle.py's job.

Usage: python tools/bare_sweep.py [sf_dir]
       python tools/bare_sweep.py --values [sf_dir]

--values additionally runs the FULL oracle value-compare (the driver's
actual check) for the first 50 registry entries — the driver window —
on the bare session, catching value-shifting (not just crashing)
session dependencies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--values"]
    values = "--values" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from pygdf_spark.queries import registry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    queries, oracle = registry()
    bad = []
    if values:
        from pygdf_spark.testing import compare_query

        for name in list(queries)[:50]:
            try:
                res = compare_query(spark, name, queries[name], oracle.get(name), sf_dir)
            except Exception as e:
                res = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            if not res["ok"]:
                bad.append(name)
                print(f"FAIL {name}: {str(res.get('error'))[:200]}")
        print(f"bare-session VALUE sweep (driver window): {50 - len(bad)}/50 OK")
        sys.exit(1 if bad else 0)
    for name, fn in queries.items():
        try:
            fn(spark, sf_dir).limit(3).collect()
        except Exception as e:
            bad.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:140]}")
    print(f"bare-session sweep: {len(queries) - len(bad)}/{len(queries)} OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""Run every registry query on a BARE SparkSession — the driver's shape.

The tuned session (pygdf_spark.session.get_spark) masks config
dependencies: Spark 4 defaults ANSI ON (int div/mod-by-zero THROW), the
system zone may not be UTC (shifts hour()/window() VALUES), and
events.parquet needs nanosAsLong. queries._util.pin_session_confs pins
all three at runtime; this sweep proves no query depends on anything
else. Execution-only by default (limit(3).collect()); the value side is
check_oracle.py's job.

Usage: python tools/bare_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from pygdf_spark.queries import registry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    queries, _ = registry()
    bad = []
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

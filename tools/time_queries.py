"""Time individual registry queries with the bench's exact protocol
(noop sink, min-of-N, per-attempt cache clear) without running the whole
bench — the optimization-loop inner harness.

Usage: python tools/time_queries.py [-n 5] name1 name2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import get_spark
from pygdf_spark.queries import registry


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("pygdf-spark-timeq")
    queries, _ = registry()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in args.names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}")
            continue
        # one warm-up at sf0.001 (codegen/class-load), matching bench.py
        warm = "/root/testdata/sf0.001"
        if os.path.isdir(warm):
            try:
                force(fn(spark, warm))
            except Exception:
                pass
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.tableType == "TEMPORARY" and t.name.startswith("pygdf_stream_sink"):
                spark.catalog.dropTempView(t.name)
        samples = []
        for _ in range(args.n):
            spark.catalog.clearCache()
            for t in spark.catalog.listTables():
                if t.tableType == "TEMPORARY" and t.name.startswith(
                        "pygdf_stream_sink"):
                    spark.catalog.dropTempView(t.name)
            t0 = time.perf_counter()
            force(fn(spark, args.sf_dir))
            samples.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(samples), 4),
                     "spread": round(max(samples) - min(samples), 4),
                     "samples": [round(s, 3) for s in samples]}
        print(name, out[name])
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()

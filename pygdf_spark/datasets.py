"""cudf.datasets parity: deterministic synthetic data generators,
distributed via spark.range (never a driver-side list)."""

from __future__ import annotations

from pyspark.sql import functions as F


def timeseries(start: str = "2000-01-01", periods: int = 1000,
               freq_seconds: int = 1, seed: int = 1, spark=None):
    """cudf.datasets.timeseries analog: (ts, id, name, x, y) — id/x/y
    are hash-derived from the row index + seed, so the frame is
    deterministic under any partitioning."""
    from pygdf_spark import from_spark, get_spark

    s = spark or get_spark()
    base = s.range(int(periods))
    h = F.hash(F.col("id").cast("string"), F.lit(seed))
    names = F.array(*[F.lit(n) for n in
                      ("Alice", "Bob", "Carol", "Dan", "Edith", "Frank")])
    sdf = base.select(
        (F.lit(start).cast("timestamp")
         + F.expr(f"INTERVAL {freq_seconds} seconds") * F.col("id")).alias("ts"),
        F.pmod(h, F.lit(100)).alias("id"),
        F.element_at(names, (F.pmod(h, F.lit(6)) + 1).cast("int")).alias("name"),
        (F.pmod(h, F.lit(20001)).cast("double") / 10000 - 1).alias("x"),
        (F.pmod(F.hash(F.col("id").cast("string"), F.lit(seed + 1)), F.lit(20001))
         .cast("double") / 10000 - 1).alias("y"),
    )
    return from_spark(sdf)


def randomdata(nrows: int = 10, dtypes: dict | None = None, seed: int = 1, spark=None):
    """cudf.datasets.randomdata analog (hash-deterministic)."""
    from pygdf_spark import from_spark, get_spark

    s = spark or get_spark()
    dtypes = dtypes or {"x": "double", "y": "double"}
    base = s.range(int(nrows))
    cols = []
    for i, (name, t) in enumerate(dtypes.items()):
        h = F.hash(F.col("id").cast("string"), F.lit(seed + i))
        if t in ("double", "float"):
            cols.append((F.pmod(h, F.lit(20001)).cast("double") / 10000 - 1).alias(name))
        elif t in ("int", "bigint", "long"):
            cols.append(F.pmod(h, F.lit(1000)).cast("long").alias(name))
        else:
            cols.append(F.concat(F.lit("s"), F.pmod(h, F.lit(100))).alias(name))
    return from_spark(base.select(*cols))

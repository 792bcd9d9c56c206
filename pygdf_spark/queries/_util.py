"""Shared helpers for the query registry.

Determinism discipline (critical for the DuckDB oracle hash-compare):

- **Floating-point aggregates are order-dependent.** Spark and DuckDB sum
  doubles in different orders, so ``SUM(double)`` can differ in the last
  few ulps and break a value-hash. Every money/quantity aggregate here
  first casts to an exact DECIMAL (the source data has fixed scale), sums
  exactly, and only then casts the *result* to double — both engines then
  produce bit-identical doubles.
- **Statistical moments** (variance/correlation/skew) are computed from
  exact integer/decimal power sums with one final double expression,
  identical in both engines, instead of the built-in order-dependent
  accumulators.
- **Arrays**: anything collected into a list is sorted
  (``sort_array``/``list_sort``) so set-like results are deterministic.
- Column names are aliased identically in Spark and oracle SQL — the
  driver sorts columns by name before hashing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver tables from the sf dir.

    Defensively pins session confs the queries assume on whatever
    session the caller built (the driver's session config is unknown;
    both are runtime-settable, verified):

    - ``nanosAsLong``: events.parquet stores TIMESTAMP(NANOS), which
      Spark rejects at schema conversion otherwise.
    - ``ansi.enabled=false``: Spark 4 defaults ANSI ON, where integer
      div/mod by zero and overflow THROW; the oracle SQL mirrors the
      non-ANSI null-on-edge semantics (round-2 lesson: binary_ops_pack
      failed only on a bare session).
    - ``session.timeZone=UTC``: hour()/window()/timestamp casts are
      session-tz-dependent; the DuckDB oracle reads naive timestamps,
      so a non-UTC driver session would shift VALUES (the bare-session
      sweep only proves execution, not values)."""
    pin_session_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan would carry fewer
    partitions than the session's parallelism (guide §2.5 input skew):
    a small single-row-group parquet input scans as ONE partition, so
    heavy per-row pipelines (tokenize/explode/hash over documents)
    serialize onto one core — measured as a single 2.6s task under
    ml_quality_score_apply at sf0.1. At scale the scan is already
    many-partition/many-file and this is a no-op, so the extra
    exchange never ships big data. The split estimate replicates
    Spark's own math from file sizes (driver metadata — cheaper than
    forcing an RDD conversion for getNumPartitions). Round-robin keeps
    determinism (Spark sorts before repartition); consumers must be
    keyed/ordered operations, so results are layout-independent."""
    sess = df.sparkSession
    n = min_parts or sess.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        mpb = int(sess.conf.get(
            "spark.sql.files.maxPartitionBytes", str(128 << 20)
        ).rstrip("b"))
        est = sum(
            -(-os.path.getsize(f.removeprefix("file:")) // mpb)
            for f in files
        )
    except Exception:
        est = df.rdd.getNumPartitions()  # non-local FS: ask Spark
    if est < n:
        return df.repartition(n)
    return df


def pin_session_confs(spark: SparkSession) -> None:
    """Pin the runtime confs every query's semantics assume (see T's
    docstring) — callable from any entry point that bypasses T, e.g.
    the streaming readers (window starts are session-tz-dependent)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def dec(col, scale: int = 2, precision: int = 12):
    """Cast to an exact decimal so sums are order-independent.

    All driver money/quantity columns are exact at scale 2 (verified);
    tight precision keeps multi-way decimal products inside Spark's
    38-digit cap with zero precision loss.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col, alias: str, scale: int = 2):
    """Order-independent double sum: exact decimal sum, then one cast."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def normalize_ts(df, col: str = "ts"):
    """Normalize the events ``ts`` column to µs TimestampType regardless
    of the on-disk layout. The driver's testdata has shipped both
    TIMESTAMP(NANOS) (read as long via nanosAsLong) and plain
    timestamp[us]/timestamp_ntz — handle all three so a testdata
    regeneration can't break every time-keyed query (round-2 lesson)."""
    t = dict(df.dtypes).get(col)
    if t == "bigint":
        # integer div — double division rounds at ~1e18 ns and shifts 1 µs
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if t == "timestamp_ntz":
        # session tz pinned to UTC, so the cast is value-identity
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_sec(col: str = "ts"):
    """Epoch seconds from a (normalized) TimestampType column — exact
    integer µs div, matching DuckDB ``epoch_ns(ts) // 1e9`` for the
    post-1970 driver data."""
    return F.expr(f"unix_micros({col}) div 1000000")


def events_ts(spark, sf_dir: str):
    """events table with ``ts`` as a real µs TimestampType. Oracle side
    uses CAST(ts AS TIMESTAMP) — DuckDB truncates ns→µs identically."""
    return normalize_ts(T(spark, sf_dir, "events"))


def cents(col):
    """Exact int64 cents of a scale-2 double column — THE determinism
    idiom for money arithmetic (q1 docstring in relational.py: fixture
    money is exact at scale 2, so round(x*100) has no ties and the row
    pipeline stays codegen'd int64 instead of per-row BigDecimal).
    Single source of truth; the oracle-side mirror is sql_cents."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def sql_cents(col: str) -> str:
    """DuckDB fragment mirroring ``cents`` byte-for-byte in semantics:
    CAST(round(col * 100, 0) AS BIGINT). Both engines round scale-2
    doubles half-away-from-zero at *100 — tie-free on this data."""
    return f"CAST(round({col} * 100, 0) AS BIGINT)"

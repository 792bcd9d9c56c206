"""Demo-data generators with the reference's ``datasets`` surface
(reference: python/cudf/cudf/datasets.py:11 ``timeseries``, :60
``randomdata``) — re-expressed Spark-first.

The reference materializes a host numpy ``RandomState`` array and
ingests it; at cluster scale that is a driver-side bottleneck and the
generated frame is bounded by driver memory. Here every row is derived
on executors from ``spark.range`` (which Spark splits across the
cluster) and a counter-based hash RNG:

    u = shiftrightunsigned(xxhash64(seed, tag, row_id), 11) / 2^53

so each (seed, column, row) pair yields one uniform in [0, 1) with no
RNG state, no shuffle, and a value that is reproducible regardless of
partitioning — unlike ``F.rand``, whose per-partition streams change
under repartition. 100 TB of synthetic rows is one ``range`` scan in
whole-stage codegen.

Distribution parity notes (documented deltas, same moments):
- ``int`` columns: the reference draws Poisson(1000); here the normal
  approximation N(1000, sqrt(1000)) via Box-Muller, rounded and
  clamped at 0 — at lambda=1000 the two are statistically
  indistinguishable for demo data.
- ``str``/``category`` columns: same 26-name vocabulary, uniform
  choice. ``category`` yields the same string column flagged for the
  ``.cat`` accessor (dictionary encoding is per-use in this engine).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

__all__ = ["timeseries", "randomdata"]

# Reference vocabulary (datasets.py:103) — public demo names.
_NAMES = [
    "Alice", "Bob", "Charlie", "Dan", "Edith", "Frank", "George",
    "Hannah", "Ingrid", "Jerry", "Kevin", "Laura", "Michael",
    "Norbert", "Oliver", "Patricia", "Quinn", "Ray", "Sarah", "Tim",
    "Ursula", "Victor", "Wendy", "Xavier", "Yvonne", "Zelda",
]

_TWO53 = float(1 << 53)


def _u(seed: int, tag: str, row: Column) -> Column:
    """Counter-based uniform in [0, 1): top 53 bits of xxhash64."""
    h = F.xxhash64(F.lit(int(seed)), F.lit(tag), row)
    return F.shiftrightunsigned(h, 11).cast("double") / F.lit(_TWO53)


def _make_float(seed: int, name: str, row: Column) -> Column:
    # reference make_float: rand(n) * 2 - 1
    return _u(seed, name + "/f", row) * 2.0 - 1.0


def _make_int(seed: int, name: str, row: Column) -> Column:
    # reference make_int: poisson(1000); normal approximation via
    # Box-Muller on two independent hash uniforms (see module doc)
    u1 = _u(seed, name + "/i1", row)
    u2 = _u(seed, name + "/i2", row)
    # guard log(0): u1 == 0 has probability 2^-53 but would yield inf
    z = F.sqrt(-2.0 * F.log(F.greatest(u1, F.lit(1e-300)))) * F.cos(
        2.0 * math.pi * u2
    )
    lam = 1000.0
    return F.greatest(
        F.round(z * math.sqrt(lam) + lam).cast("long"), F.lit(0).cast("long")
    )


def _make_string(seed: int, name: str, row: Column) -> Column:
    idx = F.floor(_u(seed, name + "/s", row) * len(_NAMES)).cast("int")
    vocab = F.array(*[F.lit(n) for n in _NAMES])
    return F.element_at(vocab, idx + 1)


_MAKE = {
    float: _make_float,
    "float": _make_float,
    int: _make_int,
    "int": _make_int,
    str: _make_string,
    "str": _make_string,
    object: _make_string,    # reference maps object -> make_string
    "object": _make_string,
    "category": _make_string,
}


def _columns(dtypes: dict, seed: int, row: Column) -> list:
    cols = []
    for name in sorted(dtypes):  # reference sorts columns by name
        dt = dtypes[name]
        try:
            make = _MAKE[dt]
        except KeyError:
            raise TypeError(
                f"No generator for dtype {dt!r} (column {name!r}); "
                "valid: float, int, str, object, 'category'"
            ) from None
        cols.append(make(seed, name, row).alias(name))
    return cols


#: calendar (non-fixed-duration) pandas offset aliases → months per tick;
#: generated distributed via add_months arithmetic (month-start ticks)
_CALENDAR_MONTHS = {"MS": 1, "ME": 1, "M": 1, "QS": 3, "QE": 3, "Q": 3,
                    "YS": 12, "YE": 12, "Y": 12, "A": 12, "AS": 12}


def timeseries(
    spark: SparkSession | None = None,
    start="2000-01-01",
    end="2000-01-31",
    freq="1s",
    dtypes=None,
    nulls_frequency=0,
    seed=None,
):
    """Timeseries frame with hash-random data (datasets.py:11).

    One row per ``freq`` tick in ``[start, end)``; default columns
    ``{"name": "category", "id": int, "x": float, "y": float}`` plus a
    leading ``timestamp``. ``seed`` selects the deterministic hash
    stream (None -> 0). ``nulls_frequency`` (reference signature)
    nulls each data cell independently with that probability — the
    mask is the same counter-based hash, so it is deterministic and
    partition-invariant too. Fixed-duration ``freq`` strings ride one
    distributed ``range`` scan; calendar aliases (MS/ME/QS/YS, …)
    ride the same scan with ``add_months`` arithmetic (month-START
    ticks — the end-of-month variants tick at starts too, documented
    delta). No driver-side materialization either way.
    """
    import pandas as pd

    from pygdf_spark.core.dataframe import from_spark
    from pygdf_spark.session import get_spark

    if spark is None:  # reference allows session-less calls (datasets.py:11)
        spark = get_spark()
    if dtypes is None:
        dtypes = {"name": "category", "id": int, "x": float, "y": float}
    seed = 0 if seed is None else int(seed)

    start_ts = pd.Timestamp(start)
    end_ts = pd.Timestamp(end)
    row = F.col("__row")

    fr = str(freq)
    alias = fr.lstrip("0123456789 ") or fr
    if alias in _CALENDAR_MONTHS:
        mult = int(fr[: len(fr) - len(alias)] or 1)
        months = _CALENDAR_MONTHS[alias] * mult
        # number of month-steps in [start, end)
        span = (end_ts.year - start_ts.year) * 12 + (end_ts.month - start_ts.month)
        n = max((span + months - 1) // months, 0)
        start_day = F.lit(start_ts.strftime("%Y-%m-%d %H:%M:%S"))
        ts = F.to_timestamp(
            F.concat(
                F.add_months(F.to_date(start_day), row * months).cast("string"),
                F.lit(start_ts.strftime(" %H:%M:%S")),
            )
        ).alias("timestamp")
    else:
        step_us = int(pd.Timedelta(freq).value // 1000)
        if step_us <= 0:
            raise ValueError(f"freq {freq!r} must be a positive interval")
        total_us = int((end_ts - start_ts).value // 1000)
        n = max(total_us // step_us + (1 if total_us % step_us else 0), 0)
        ts = F.timestamp_micros(
            F.lit(int(start_ts.value // 1000)) + row * F.lit(step_us)
        ).alias("timestamp")

    base = spark.range(n).select(F.col("id").alias("__row"))
    cols = _columns(dtypes, seed, row)
    if nulls_frequency:
        p = float(nulls_frequency)
        cols = [
            F.when(_u(seed, f"null/{n_}", row) >= p, c).alias(n_)
            for c, n_ in zip(cols, sorted(dtypes))
        ]
    return from_spark(base.select(ts, *cols))


def randomdata(spark: SparkSession | None = None, nrows=10, dtypes=None, seed=None):
    """Random frame (datasets.py:60): ``nrows`` rows of hash-random
    columns; default ``{"id": int, "x": float, "y": float}``."""
    from pygdf_spark.core.dataframe import from_spark
    from pygdf_spark.session import get_spark

    if spark is None:
        spark = get_spark()
    if dtypes is None:
        dtypes = {"id": int, "x": float, "y": float}
    seed = 0 if seed is None else int(seed)
    row = F.col("__row")
    base = spark.range(int(nrows)).select(F.col("id").alias("__row"))
    return from_spark(base.select(*_columns(dtypes, seed, row)))

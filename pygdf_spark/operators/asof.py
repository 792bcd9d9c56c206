"""As-of (backward) join — a deliberate extension past the reference
(SURVEY.md §2.3: this pygdf generation has NO merge_asof; cuDF grew one
later, and it is table stakes for event/time-series pipelines).

Scale design: the naive formulation — range join + per-left-row argmax —
is quadratic inside hot keys. The implementation here is the standard
distributed as-of: UNION both sides with a side tag, ONE shuffle on the
`by` key, and a single ordered window pass carrying the most recent
right-side payload forward (`last(..., ignorenulls=True)`). Cost is one
shuffle + one sort — the same complexity as a sort-merge join, with no
per-row probing. Right rows sort before left rows at equal timestamps,
giving the inclusive (`ts_left >= ts_right`) match DuckDB's ASOF JOIN
uses, which is how the oracle verifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    payload: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row of
    the same `by` key with ``right.ts <= left.ts`` (nulls if none)."""
    lcols = left.columns
    l = left.select(
        *by, ts, F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in by and c != ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in payload],
    )
    r = right.select(
        *by, ts, F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != ts],
        *[F.col(c).alias(c + suffix) for c in payload],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix + "__c")
            for c in payload
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *by, ts,
        *[F.col(c) for c in lcols if c not in by and c != ts],
        *[F.col(c + suffix + "__c").alias(c + suffix) for c in payload],
    )
    return out

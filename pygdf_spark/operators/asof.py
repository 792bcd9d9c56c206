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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    payload: list[str],
    suffix: str = "_r",
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    right_order: list[str] | None = None,
) -> DataFrame:
    """Generalized distributed as-of join (extension past the reference —
    this pygdf generation has no merge_asof; later cuDF/pandas define the
    `direction`/`tolerance`/`allow_exact_matches` surface mirrored here).

    - direction='backward': latest right row with ts <= left.ts
      (< when allow_exact_matches=False)
    - direction='forward':  earliest right row with ts >= left.ts
    - direction='nearest':  whichever of the two is closer in time;
      ties resolve to the backward match (documented, oracle-pinned)
    - tolerance: max |ts delta| for a match, in the ts column's native
      units (µs for TimestampType via unix_micros; column units for
      numerics). None = unbounded.
    - right_order: payload-column names breaking ties among right rows
      sharing a boundary timestamp — the row with the GREATEST
      right_order tuple wins (in both directions; without it, ties are
      engine-nondeterministic and can't be oracle-pinned).

    Scale shape (same as asof_join_backward): union + ONE shuffle on the
    `by` key + ordered window carry. 'nearest' adds a second window pass
    over the SAME partitioning (one extra intra-partition sort, no extra
    shuffle).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    from pyspark.sql.types import TimestampType

    lcols = left.columns
    is_time = isinstance(left.schema[ts].dataType, TimestampType)

    def _t(c):
        return F.unix_micros(c) if is_time else c

    l = left.select(
        *by, ts, F.lit(1).alias("__side"),
        F.lit(None).cast("long" if is_time else left.schema[ts].dataType.simpleString()).alias("__rts"),
        *[F.col(c) for c in lcols if c not in by and c != ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in payload],
    )
    r = right.select(
        *by, ts, F.lit(0).alias("__side"),
        _t(F.col(ts)).alias("__rts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != ts],
        *[F.col(c).alias(c + suffix) for c in payload],
    )
    unioned = l.unionByName(r)

    # Right rows sort before left rows at equal ts for inclusive matches
    # (so last() at the left row sees them); after, for strict matches.
    side = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()

    # Tiebreak among right rows at the same ts: keep them ascending in
    # scan order so last() resolves to the greatest right_order tuple —
    # identical in both passes (left rows carry nulls there, inert
    # within their own side group).
    tiebreak = [F.col(c + suffix).asc() for c in (right_order or [])]

    def _pass(descending, tag):
        order = F.col(ts).desc() if descending else F.col(ts).asc()
        w = (
            Window.partitionBy(*by)
            .orderBy(order, side, *tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return [
            F.last("__rts", ignorenulls=True).over(w).alias("__mts" + tag),
            *[
                F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix + tag)
                for c in payload
            ],
        ]

    carry = []
    if direction in ("backward", "nearest"):
        carry += _pass(False, "_b")
    if direction in ("forward", "nearest"):
        carry += _pass(True, "_f")
    carried = unioned.select("*", *carry).filter(F.col("__side") == 1)

    lts = _t(F.col(ts))

    def _ok(tag, delta):
        ok = F.col("__mts" + tag).isNotNull()
        if tolerance is not None:
            ok = ok & (delta <= F.lit(tolerance))
        return ok

    if direction == "backward":
        keep = _ok("_b", lts - F.col("__mts_b"))
        pick = {c: F.when(keep, F.col(c + suffix + "_b")) for c in payload}
    elif direction == "forward":
        keep = _ok("_f", F.col("__mts_f") - lts)
        pick = {c: F.when(keep, F.col(c + suffix + "_f")) for c in payload}
    else:  # nearest: closer side wins; tie -> backward
        db, df_ = lts - F.col("__mts_b"), F.col("__mts_f") - lts
        okb, okf = _ok("_b", db), _ok("_f", df_)
        use_b = okb & (~okf | (db <= df_))
        pick = {
            c: F.when(use_b, F.col(c + suffix + "_b")).when(
                okf, F.col(c + suffix + "_f")
            )
            for c in payload
        }

    return carried.select(
        *by, ts,
        *[F.col(c) for c in lcols if c not in by and c != ts],
        *[pick[c].alias(c + suffix) for c in payload],
    )


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

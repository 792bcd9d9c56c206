"""As-of join — a deliberate extension past the reference
(SURVEY.md §2.3: this pygdf generation has NO merge_asof; cuDF grew one
later, and it is table stakes for event/time-series pipelines).

Scale design: the naive formulation — range join + per-left-row argmax —
is quadratic inside hot keys. The implementation here is the standard
distributed as-of: UNION both sides with a side tag, ONE shuffle on the
`by` key, and a single ordered window pass carrying the most recent
right-side row forward. The carried value is ONE STRUCT per right row
(`last(struct, ignorenulls=True)`) — never per-column carries, which
would substitute older rows' values wherever the matched row holds a
NULL and could stitch together fields of different right rows. Right
rows sort before left rows at equal timestamps, giving the inclusive
(`ts_left >= ts_right`) match DuckDB's ASOF JOIN uses, which is how the
oracle verifies it.
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
      sharing a boundary timestamp — pandas-compatible: the LAST such
      row in `right_order` order wins for backward matches, the FIRST
      for forward matches (pandas merge_asof keeps input order and its
      searchsorted picks exactly those). Without it, boundary-ts ties
      are engine-nondeterministic and can't be oracle-pinned.

    Scale shape: union + ONE shuffle on the `by` key + ordered window
    carry. 'nearest' adds a second window pass over the SAME
    partitioning (one extra intra-partition sort, no extra shuffle).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    from pyspark.sql.types import (
        DateType, LongType, StructField, StructType, TimestampNTZType,
        TimestampType,
    )

    lcols = left.columns
    ts_type = left.schema[ts].dataType
    is_time = isinstance(ts_type, (TimestampType, TimestampNTZType, DateType))

    def _t(c):
        # µs integer for every temporal flavor so the tolerance contract
        # (native units = µs) holds: TIMESTAMP via unix_micros; NTZ via
        # tz-free wall-clock arithmetic (a session-timezone cast is
        # non-monotone around DST gaps); DATE via day count
        if isinstance(ts_type, TimestampType):
            return F.unix_micros(c)
        if isinstance(ts_type, TimestampNTZType):
            return (
                F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
                + F.hour(c).cast("long") * F.lit(3_600_000_000)
                + F.minute(c).cast("long") * F.lit(60_000_000)
                + F.round(
                    F.date_part(F.lit("SECOND"), c) * 1_000_000, 0
                ).cast("long")
            )
        if isinstance(ts_type, DateType):
            return F.unix_date(c).cast("long") * F.lit(86_400_000_000)
        return c

    # The matched right row travels as ONE nullable struct: null on left
    # rows, atomically the whole row's payload on right rows — so a
    # NULL inside the matched row's payload stays NULL instead of being
    # backfilled by last(ignorenulls) from an older right row.
    rts_type = LongType() if is_time else left.schema[ts].dataType
    pay_type = StructType(
        [StructField("__rts", rts_type)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )
    l = left.select(
        *by, ts, F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in by and c != ts],
        F.lit(None).cast(pay_type).alias("__pay"),
    )
    r = right.select(
        *by, ts, F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != ts],
        F.struct(
            _t(F.col(ts)).alias("__rts"),
            *[F.col(c).alias(c) for c in payload],
        ).alias("__pay"),
    )
    unioned = l.unionByName(r)

    # Right rows sort before left rows at equal ts for inclusive matches
    # (so last() at the left row sees them); after, for strict matches.
    side = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()

    def _pass(descending, tag):
        order = F.col(ts).desc() if descending else F.col(ts).asc()
        # Tiebreak among right rows at the same ts (left rows hold null
        # there — inert within their own side group). last() takes the
        # final row in scan order, so ascending right_order here makes
        # the GREATEST tuple win in the backward (asc) pass; the
        # forward (desc) pass flips to descending so the SMALLEST
        # right_order wins — the pandas first-at-boundary rule.
        tiebreak = [
            (F.col("__pay").getField(c).desc() if descending
             else F.col("__pay").getField(c).asc())
            for c in (right_order or [])
        ]
        w = (
            Window.partitionBy(*by)
            .orderBy(order, side, *tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("__pay", ignorenulls=True).over(w).alias("__pay" + tag)

    carry = []
    if direction in ("backward", "nearest"):
        carry.append(_pass(False, "_b"))
    if direction in ("forward", "nearest"):
        carry.append(_pass(True, "_f"))
    carried = unioned.select("*", *carry).filter(F.col("__side") == 1)

    lts = _t(F.col(ts))

    def _mts(tag):
        return F.col("__pay" + tag).getField("__rts")

    def _ok(tag, delta):
        # lts.isNotNull(): a NULL left ts must never match (pandas raises on
        # null merge keys; the desc-ordered forward pass sorts nulls last, so
        # without this guard the carry would hand the null row a match)
        ok = lts.isNotNull() & _mts(tag).isNotNull()
        if tolerance is not None:
            ok = ok & (delta <= F.lit(tolerance))
        return ok

    def _val(tag, c):
        return F.col("__pay" + tag).getField(c)

    if direction == "backward":
        keep = _ok("_b", lts - _mts("_b"))
        pick = {c: F.when(keep, _val("_b", c)) for c in payload}
    elif direction == "forward":
        keep = _ok("_f", _mts("_f") - lts)
        pick = {c: F.when(keep, _val("_f", c)) for c in payload}
    else:  # nearest: closer side wins; tie -> backward
        db, df_ = lts - _mts("_b"), _mts("_f") - lts
        okb, okf = _ok("_b", db), _ok("_f", df_)
        use_b = okb & (~okf | (db <= df_))
        pick = {
            c: F.when(use_b, _val("_b", c)).when(okf, _val("_f", c))
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
    the same `by` key with ``right.ts <= left.ts`` (nulls if none).
    Thin alias of :func:`asof_join` with its defaults."""
    return asof_join(left, right, by=by, ts=ts, payload=payload, suffix=suffix)

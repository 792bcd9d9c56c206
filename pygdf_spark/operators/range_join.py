"""Distributed range (interval) join — points-in-interval with NO
equi-key, re-expressed as a bucketized equi-join.

Reference parity: cuDF exposes conditional joins over arbitrary AST
predicates (`cpp/include/cudf/join.hpp` conditional_inner_join;
python `cudf.DataFrame.merge` has no interval path, so users drop to
conditional_join) — single-GPU, it evaluates the predicate over the
full cross product. That shape is a non-starter distributed: Spark
plans a non-equi join as BroadcastNestedLoopJoin (fine only when one
side broadcasts) or a cartesian product (never fine at 100 TB).

Scale design: overlap-bucketing turns the θ-join into an equi-join.
Each interval [s, e) is replicated to every width-W epoch bucket it
covers (`sequence(floor(s/W), floor(e/W))` — a map-side explode whose
fan-out is len/W + 1); each point lands in exactly ONE bucket
(floor(p/W)). Joining on the bucket id + the residual `s <= p < e`
filter yields each matching pair exactly once — no post-join dedup,
because a point's single bucket appears once per covering interval.

- Shuffle keys are buckets: short, dense, and as uniform as the point
  distribution — no interval-length skew, unlike key-by-interval-id.
- Pick W near the median interval length: replication stays O(1) per
  interval while bucket selectivity stays high. A W far too small
  explodes the interval side; far too large degrades to per-bucket
  mini cross products. Both degrade gracefully, not catastrophically.
- When the (exploded) interval side is small, Catalyst/AQE broadcasts
  it and the join is one map-side pass over the points — the plan you
  want when dims are windows (maintenance windows, promo periods).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_bucket(ts: Column, width_sec: int) -> Column:
    """floor(epoch-seconds / W): timestamp → bucket id (long).

    TIMESTAMP_NTZ (what parquet scans yield by default) has no direct
    long cast, so route through timestamp_ltz; the session-TZ offset
    that conversion applies is the SAME constant for points and
    intervals, so bucket containment is unaffected."""
    return F.floor(ts.cast("timestamp_ltz").cast("long") / F.lit(width_sec)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width_sec: int,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= point < end`` (half-open, the standard window
    convention). Columns of both inputs pass through; name collisions
    are the caller's to alias, as with a plain join."""
    if bucket_width_sec < 1:
        raise ValueError(f"bucket_width_sec must be >= 1, got {bucket_width_sec}")
    for side, name in ((points, "points"), (intervals, "intervals")):
        if "__bucket" in side.columns:
            raise ValueError(
                f"range_join: {name} already has a '__bucket' column; "
                "rename it first (it would be silently clobbered)"
            )
    # clamp the per-interval bucket fan-out to the points' observed
    # bucket range: one open-ended SCD sentinel (end = 9999-12-31) would
    # otherwise explode to ~400k+ bucket rows per interval; buckets
    # holding no point cannot produce matches, so the clamp is exact.
    # The bound rides in as a broadcast 1-row aggregate — no driver
    # collect, no extra shuffle of either side.
    bounds = points.agg(
        F.min(_epoch_bucket(F.col(point_col), bucket_width_sec)).alias("__blo"),
        F.max(_epoch_bucket(F.col(point_col), bucket_width_sec)).alias("__bhi"),
    )
    s_b = F.greatest(_epoch_bucket(F.col(start_col), bucket_width_sec), F.col("__blo"))
    # end is exclusive, but a point in end's bucket can still precede
    # it — the residual filter trims.
    e_b = F.least(_epoch_bucket(F.col(end_col), bucket_width_sec), F.col("__bhi"))
    iv = (
        intervals.crossJoin(F.broadcast(bounds))
        # empty points (null bounds) → no interval can match, skip all;
        # otherwise drop intervals entirely outside the point range
        .filter(F.col("__blo").isNotNull() & (s_b <= e_b))
        .withColumn("__bucket", F.explode(F.sequence(s_b, e_b)))
        .drop("__blo", "__bhi")
    )
    pt = points.withColumn("__bucket", _epoch_bucket(F.col(point_col), bucket_width_sec))
    return (
        pt.join(iv, "__bucket")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("__bucket")
    )

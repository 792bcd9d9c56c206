"""Time-series pipeline operators over ``events``: hypertable-style
multi-resolution rollup and SCD-2 dimension-history maintenance —
the continuous-aggregate / merge-upsert shapes a 100 TB event pipeline
runs downstream of ingestion (reference analog: the groupby/window
machinery of SURVEY.md §2.4/§2.5 composed into the two canonical
warehouse maintenance jobs).

Determinism: every bucket is an INTEGER epoch-second (``unix_micros
div`` on the Spark side, ``epoch_us // `` on the oracle side — same
floor-division semantics), coarser-level rollup nulls are coalesced to
-1 in BOTH engines so null-ordering differences can never reach the
hash, and all money sums ride the integer-cents idiom.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import cents, events_ts


def events_multires_rollup(spark, sf_dir):
    """Hypertable continuous-aggregate rollup: day / hour / 15-minute
    resolutions for every event_type in ONE partial-agg pass
    (GROUP BY event_type + ROLLUP over the bucket hierarchy — four
    grouping sets, one shuffle; a per-resolution groupBy+union would
    scan the fact table three times). Output size is CALENDAR-bounded
    (≤ buckets-in-range × |event_type|), not data-bounded — the shape
    holds at any scale factor."""
    e = events_ts(spark, sf_dir)
    sec = F.expr("unix_micros(ts) div 1000000")
    b = e.select(
        "event_type",
        (sec.cast("long") - sec.cast("long") % 86400).alias("b_day"),
        (sec.cast("long") - sec.cast("long") % 3600).alias("b_hour"),
        (sec.cast("long") - sec.cast("long") % 900).alias("b_q15"),
        cents("value").alias("v_c"),
    )
    g = b.groupingSets(
        [
            ["event_type"],
            ["event_type", "b_day"],
            ["event_type", "b_day", "b_hour"],
            ["event_type", "b_day", "b_hour", "b_q15"],
        ],
        "event_type", "b_day", "b_hour", "b_q15",
    ).agg(
        # Spark demands ALL grouping columns as args; event_type is in
        # every set so its MSB is constant 0 and the value equals the
        # oracle's 3-column GROUPING(b_day, b_hour, b_q15)
        F.expr("grouping_id(event_type, b_day, b_hour, b_q15)").alias("lvl"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_c").alias("sum_value_c"),
    )
    return g.select(
        "event_type",
        F.coalesce("b_day", F.lit(-1)).alias("b_day"),
        F.coalesce("b_hour", F.lit(-1)).alias("b_hour"),
        F.coalesce("b_q15", F.lit(-1)).alias("b_q15"),
        "lvl", "n_events", "sum_value_c",
    ).orderBy("event_type", "lvl", "b_day", "b_hour", "b_q15")


EVENTS_MULTIRES_SQL = """
WITH b AS (
  SELECT event_type,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS sec,
         CAST(round(value * 100, 0) AS BIGINT) AS v_c
  FROM events
),
k AS (
  SELECT event_type,
         sec - sec % 86400 AS b_day,
         sec - sec % 3600  AS b_hour,
         sec - sec % 900   AS b_q15,
         v_c
  FROM b
)
SELECT event_type,
       COALESCE(b_day, -1)  AS b_day,
       COALESCE(b_hour, -1) AS b_hour,
       COALESCE(b_q15, -1)  AS b_q15,
       CAST(GROUPING(b_day, b_hour, b_q15) AS BIGINT) AS lvl,
       COUNT(*) AS n_events,
       CAST(SUM(v_c) AS BIGINT) AS sum_value_c
FROM k
GROUP BY event_type, ROLLUP(b_day, b_hour, b_q15)
ORDER BY event_type, lvl, b_day, b_hour, b_q15
"""


def scd2_event_history(spark, sf_dir):
    """SCD-2 (slowly-changing-dimension type 2) history build: per
    user, the change stream of ``event_type`` collapsed to effective
    intervals — consecutive duplicates dropped (gaps-and-islands),
    ``eff_to_s`` = next change (NULL→-1 = current row), version =
    change ordinal. ONE window shuffle keyed by user; the user_id
    predicate pushes to the parquet scan so the history build reads
    only the requested slice of the fact table (at 100 TB this is the
    MERGE-style dimension-maintenance job, partitioned by the dim
    key). Tiebreak on equal timestamps: event_id."""
    e = events_ts(spark, sf_dir).filter(F.col("user_id") < 100)
    sec = F.expr("unix_micros(ts) div 1000000")
    s = e.select("user_id", sec.alias("t_s"), "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    chg = (
        s.withColumn("prev_attr", F.lag("event_type").over(w))
        .filter(
            F.col("prev_attr").isNull()
            | (F.col("prev_attr") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    return (
        chg.select(
            "user_id",
            F.row_number().over(w2).alias("version"),
            F.col("event_type").alias("attr"),
            F.col("t_s").alias("eff_from_s"),
            F.coalesce(F.lead("t_s").over(w2), F.lit(-1)).alias("eff_to_s"),
            F.lead("t_s").over(w2).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


SCD2_EVENT_HISTORY_SQL = """
WITH s AS (
  SELECT user_id,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS t_s,
         event_id, event_type
  FROM events WHERE user_id < 100
),
chg AS (
  SELECT *,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY t_s, event_id) AS prev_attr
  FROM s
),
f AS (
  SELECT user_id, t_s, event_id, event_type
  FROM chg WHERE prev_attr IS NULL OR prev_attr <> event_type
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY t_s, event_id) AS INT) AS version,
       event_type AS attr,
       t_s AS eff_from_s,
       COALESCE(LEAD(t_s) OVER (PARTITION BY user_id
                                ORDER BY t_s, event_id), -1) AS eff_to_s,
       (LEAD(t_s) OVER (PARTITION BY user_id
                        ORDER BY t_s, event_id) IS NULL) AS is_current
FROM f
ORDER BY user_id, version
"""


def events_gapfill_interp(spark, sf_dir):
    """Hypertable gap filling (the TimescaleDB time_bucket_gapfill +
    locf + interpolate trio): per-user HOURLY buckets, the missing
    buckets GENERATED in-row (sequence over each user's [min,max]
    bucket range — grid size is calendar×users bounded, never
    data-bounded), then LOCF carry-forward and exact integer LINEAR
    interpolation between the surrounding observed buckets:
    interp·Δ = prev·(next_b−b) + next·(b−prev_b), all int64, div with
    identical truncation semantics in both engines. Per-user keyed
    windows only — no global window, no driver loop."""
    e = events_ts(spark, sf_dir)
    sec = F.expr("unix_micros(ts) div 1000000")
    obs = (
        e.select(
            "user_id",
            (sec.cast("long") - sec.cast("long") % 3600).alias("b"),
            cents("value").alias("v_c"),
        )
        .groupBy("user_id", "b")
        .agg(F.sum("v_c").alias("v"), F.count(F.lit(1)).alias("n"))
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("b"),
        )
    )
    j = grid.join(obs, ["user_id", "b"], "left")
    w_prev = (
        Window.partitionBy("user_id").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy("b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("v").isNotNull(), F.col("b"))
    f = j.select(
        "user_id", "b", "v", "n",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_b, ignorenulls=True).over(w_prev).alias("pb"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_b, ignorenulls=True).over(w_next).alias("nb"),
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.expr("(pv * (nb - b) + nv * (b - pb)) div (nb - pb)"),
        ).otherwise(F.coalesce("pv", "nv"))
    )
    filled = f.select(
        "user_id",
        F.col("v").isNull().cast("long").alias("missing"),
        F.coalesce("v", "pv", "nv").alias("locf"),
        interp.alias("interp"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("missing").alias("n_filled"),
            F.sum("locf").alias("locf_sum"),
            F.sum("interp").alias("interp_sum"),
        )
        .orderBy("user_id")
    )


EVENTS_GAPFILL_SQL = """
WITH obs AS (
  SELECT user_id,
         s - s % 3600 AS b, SUM(v_c) AS v, COUNT(*) AS n
  FROM (
    SELECT user_id,
           (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS s,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c
    FROM events
  ) GROUP BY user_id, b
),
grid AS (
  SELECT user_id, UNNEST(generate_series(MIN(b), MAX(b), 3600)) AS b
  FROM obs GROUP BY user_id
),
j AS (
  SELECT g.user_id AS user_id, g.b AS b, o.v AS v
  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b
),
f AS (
  SELECT user_id, b, v,
    LAST_VALUE(v IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
    FIRST_VALUE(v IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY b
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY b
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM j
)
SELECT user_id, COUNT(*) AS n_buckets,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(SUM(COALESCE(v, pv, nv)) AS BIGINT) AS locf_sum,
       CAST(SUM(CASE WHEN v IS NOT NULL THEN v
                     WHEN pv IS NOT NULL AND nv IS NOT NULL
                       THEN (pv * (nb - b) + nv * (b - pb)) // (nb - pb)
                     ELSE COALESCE(pv, nv) END) AS BIGINT) AS interp_sum
FROM f GROUP BY user_id ORDER BY user_id
"""


def events_ewma_trend(spark, sf_dir):
    """Holt linear (double-exponential) smoothing per event-type series
    — the trend/forecast primitive of an observability or demand
    pipeline, run as one daily-rollup shuffle plus an applyInPandas
    scan per series (sequential in t by nature, PARALLEL across series
    — the correct axis at 100 TB, where series count ≫ series length).

    EXACT integer µ-unit recurrence (the pagerank_micro discipline —
    float smoothing would sum in engine-specific order), alpha=0.3,
    beta=0.2, both engines truncate integer division toward zero:

        l_0 = x_0·1e6, b_0 = 0
        l_t = (3·x_t·1e6 + 7·(l_{t-1} + b_{t-1})) div 10
        b_t = (2·(l_t − l_{t-1}) + 8·b_{t-1}) div 10

    The oracle replays the same recurrence as a recursive CTE (one row
    per (series, t) — linear, fixpoint-free). Output: the final state +
    one-step forecast per series."""
    import pandas as pd

    e = events_ts(spark, sf_dir)
    sec = F.expr("unix_micros(ts) div 1000000")
    daily = (
        e.select("event_type",
                 (sec.cast("long") - sec.cast("long") % 86400)
                 .alias("b_day"))
        .groupBy("event_type", "b_day")
        .agg(F.count(F.lit(1)).alias("x"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("b_day")
        l = b = None
        for x in pdf["x"].astype(int):
            if l is None:
                l, b = x * 1_000_000, 0
                continue
            l_new = _trunc_div(3 * x * 1_000_000 + 7 * (l + b), 10)
            b = _trunc_div(2 * (l_new - l) + 8 * b, 10)
            l = l_new
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [len(pdf)],
            "level_micro": [l], "trend_micro": [b],
            "forecast_micro": [l + b],
        })

    out = daily.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, n_days long, level_micro long, "
        "trend_micro long, forecast_micro long",
    )
    return out.orderBy("event_type")


def _trunc_div(a: int, d: int) -> int:
    """Integer division truncating toward zero — Spark's BIGINT `div`
    and DuckDB's `//` both do this; Python's // floors, hence the
    helper."""
    q = abs(a) // d
    return q if a >= 0 else -q


EVENTS_EWMA_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type,
         ((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
          - (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) % 86400)
           AS b_day,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b_day)
           AS rn
  FROM daily
),
rec(event_type, rn, l, b) AS (
  SELECT event_type, CAST(1 AS BIGINT),
         CAST(x * 1000000 AS BIGINT), CAST(0 AS BIGINT)
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.rn,
         (3 * s.x * 1000000 + 7 * (r.l + r.b)) // 10,
         (2 * ((3 * s.x * 1000000 + 7 * (r.l + r.b)) // 10 - r.l)
          + 8 * r.b) // 10
  FROM rec r JOIN seq s
    ON s.event_type = r.event_type AND s.rn = r.rn + 1
),
fin AS (
  SELECT event_type, rn, l, b,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY rn DESC)
           AS rk
  FROM rec
)
SELECT event_type, rn AS n_days, l AS level_micro, b AS trend_micro,
       l + b AS forecast_micro
FROM fin WHERE rk = 1 ORDER BY event_type
"""


QUERIES = {
    "events_ewma_trend": events_ewma_trend,
    "events_gapfill_interp": events_gapfill_interp,
    "events_multires_rollup": events_multires_rollup,
    "scd2_event_history": scd2_event_history,
}

ORACLE = {
    "events_ewma_trend": EVENTS_EWMA_SQL,
    "events_gapfill_interp": EVENTS_GAPFILL_SQL,
    "events_multires_rollup": EVENTS_MULTIRES_SQL,
    "scd2_event_history": SCD2_EVENT_HISTORY_SQL,
}

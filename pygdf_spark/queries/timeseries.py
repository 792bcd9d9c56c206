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


QUERIES = {
    "events_multires_rollup": events_multires_rollup,
    "scd2_event_history": scd2_event_history,
}

ORACLE = {
    "events_multires_rollup": EVENTS_MULTIRES_SQL,
    "scd2_event_history": SCD2_EVENT_HISTORY_SQL,
}

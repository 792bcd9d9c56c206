"""As-of join + group fill queries (SURVEY.md §2.3 extension / §2.4
ffill-bfill parity — groupby::replace_nulls groupby.hpp:348).

The oracle uses DuckDB's native ASOF JOIN, so the distributed
union+window implementation is checked against an independent engine's
definition of as-of semantics — not against itself.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.operators.asof import asof_join, asof_join_backward
from pygdf_spark.queries._util import T, dec, events_ts


def asof_join_events(spark, sf_dir):
    """each click gets the latest same-user purchase at-or-before it."""
    e = events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", dec("value").alias("value")
    )
    out = asof_join_backward(
        clicks, buys, by=["user_id"], ts="ts", payload=["event_id", "value"]
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        # output boundary: DECIMAL(12,2) → DOUBLE so the driver hasher sees
        # the same physical type as the oracle (spark-graft-oracle-determinism)
        F.col("value_r").cast("double").alias("purchase_value"),
    ).orderBy("user_id", "click_id")


ASOF_JOIN_SQL = """
SELECT c.user_id AS user_id, c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(CAST(p.value AS DECIMAL(12,2)) AS DOUBLE) AS purchase_value
FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
                FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY user_id, click_id
"""


_TOL_48H_US = 48 * 3600 * 1_000_000


def asof_join_forward(spark, sf_dir):
    """merge_asof(direction='forward', tolerance=48h): each click gets
    the NEXT same-user purchase within 48 hours (nulls past tolerance).
    Boundary-ts ties resolve pandas-style: forward takes the SMALLEST
    purchase event_id (first at the boundary), matching the oracle's
    ORDER BY ... event_id ASC."""
    e = events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", dec("value").alias("value")
    )
    out = asof_join(
        clicks, buys, by=["user_id"], ts="ts", payload=["event_id", "value"],
        direction="forward", tolerance=_TOL_48H_US, right_order=["event_id"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").cast("double").alias("purchase_value"),
    ).orderBy("user_id", "click_id")


ASOF_FORWARD_SQL = """
WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                  CAST(value AS DECIMAL(12,2)) AS value
           FROM events WHERE event_type = 'purchase')
SELECT c.user_id AS user_id, c.event_id AS click_id,
  (SELECT p.event_id FROM p
    WHERE p.user_id = c.user_id AND p.ts >= c.ts
      AND epoch_us(p.ts) - epoch_us(c.ts) <= 172800000000
    ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS purchase_id,
  CAST((SELECT p.value FROM p
    WHERE p.user_id = c.user_id AND p.ts >= c.ts
      AND epoch_us(p.ts) - epoch_us(c.ts) <= 172800000000
    ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS DOUBLE) AS purchase_value
FROM c
ORDER BY user_id, click_id
"""


def asof_join_nearest(spark, sf_dir):
    """merge_asof(direction='nearest'): each click gets the time-closest
    same-user purchase on either side; equidistant → backward wins."""
    e = events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", dec("value").alias("value")
    )
    out = asof_join(
        clicks, buys, by=["user_id"], ts="ts", payload=["event_id", "value"],
        direction="nearest", right_order=["event_id"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").cast("double").alias("purchase_value"),
    ).orderBy("user_id", "click_id")


ASOF_NEAREST_SQL = """
WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                  CAST(value AS DECIMAL(12,2)) AS value
           FROM events WHERE event_type = 'purchase'),
cand AS (
  SELECT c.user_id, c.event_id AS click_id, c.ts,
    (SELECT p.event_id FROM p WHERE p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS b_id,
    (SELECT p.ts FROM p WHERE p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS b_ts,
    (SELECT p.value FROM p WHERE p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS b_val,
    (SELECT p.event_id FROM p WHERE p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS f_id,
    (SELECT p.ts FROM p WHERE p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS f_ts,
    (SELECT p.value FROM p WHERE p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS f_val
  FROM c)
SELECT user_id, click_id,
  CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
            OR epoch_us(ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(ts))
       THEN b_id ELSE f_id END AS purchase_id,
  CAST(CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
            OR epoch_us(ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(ts))
       THEN b_val ELSE f_val END AS DOUBLE) AS purchase_value
FROM cand
ORDER BY user_id, click_id
"""


def events_funnel(spark, sf_dir):
    """Conversion-funnel analysis (match_recognize-style event
    sequencing): view → first same-user click STRICTLY after it within
    1 h → first same-user purchase strictly after that click within
    2 h. Built as TWO chained forward as-of joins — each stage is one
    by-key shuffle + window pass, so the funnel costs 2 shuffles total
    regardless of corpus size (no self-join blowup). Boundary ties use
    the forward rule (smallest event_id)."""
    e = events_ts(spark, sf_dir)
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ts").alias("cts")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    h1, h2 = 3600 * 1_000_000, 2 * 3600 * 1_000_000
    s1 = asof_join(
        views, clicks, by=["user_id"], ts="ts", payload=["event_id", "cts"],
        direction="forward", tolerance=h1, allow_exact_matches=False,
        right_order=["event_id"],
    )
    stage2_in = (
        s1.filter(F.col("event_id_r").isNotNull())
        .select("user_id", F.col("cts_r").alias("ts"), F.col("event_id_r").alias("click_id"))
    )
    s2 = asof_join(
        stage2_in, buys, by=["user_id"], ts="ts", payload=["event_id"],
        direction="forward", tolerance=h2, allow_exact_matches=False,
        right_order=["event_id"],
    )
    vcount = views.agg(F.count(F.lit(1)).alias("n_views"))
    return (
        s2.agg(
            F.count(F.lit(1)).alias("n_clicked"),
            F.sum(F.col("event_id_r").isNotNull().cast("long")).alias("n_purchased"),
        )
        .crossJoin(F.broadcast(vcount))
        .select(
            "n_views", "n_clicked", "n_purchased",
            F.round(F.col("n_clicked") / F.col("n_views").cast("double"), 8).alias("view_click_rate"),
            F.round(F.col("n_purchased") / F.col("n_clicked").cast("double"), 8).alias("click_purchase_rate"),
        )
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events WHERE event_type = 'purchase'),
s1 AS (
  SELECT v.user_id, v.event_id AS view_id,
    (SELECT c.event_id FROM c
      WHERE c.user_id = v.user_id AND c.ts > v.ts
        AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
      ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS click_id,
    (SELECT c.ts FROM c
      WHERE c.user_id = v.user_id AND c.ts > v.ts
        AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
      ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS click_ts
  FROM v
),
s2 AS (
  SELECT s1.*,
    (SELECT p.event_id FROM p
      WHERE p.user_id = s1.user_id AND p.ts > s1.click_ts
        AND epoch_us(p.ts) - epoch_us(s1.click_ts) <= 7200000000
      ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS buy_id
  FROM s1 WHERE s1.click_id IS NOT NULL
)
SELECT (SELECT COUNT(*) FROM v) AS n_views,
       COUNT(*) AS n_clicked,
       CAST(SUM(CASE WHEN buy_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased,
       ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 8) AS view_click_rate,
       ROUND(SUM(CASE WHEN buy_id IS NOT NULL THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 8) AS click_purchase_rate
FROM s2
"""


def events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix — the other classic event-analytics op
    beside the funnel: users cohorted by their first-activity week,
    then per (cohort, week) distinct-active counts and retention rate.
    Two keyed shuffles (per-user first week; per-cohort-week distinct
    count) — no self-joins, scales linearly in events."""
    e = events_ts(spark, sf_dir)
    wk = F.date_trunc("week", F.col("ts"))
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = e.select("user_id", wk.alias("week")).distinct()
    cohort_sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        active.join(first, "user_id")
        .groupBy("cohort", "week")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(cohort_sizes, "cohort")
        .select(
            "cohort", "week", "n_active", "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort").cast("double"), 8).alias("retention"),
        )
        .orderBy("cohort", "week")
    )


EVENTS_COHORT_SQL = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort FROM e GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM e),
sizes AS (SELECT cohort, COUNT(*) AS n_cohort FROM first GROUP BY cohort)
SELECT f.cohort AS cohort, a.week AS week,
       COUNT(DISTINCT a.user_id) AS n_active, MIN(s.n_cohort) AS n_cohort,
       ROUND(COUNT(DISTINCT a.user_id) / CAST(MIN(s.n_cohort) AS DOUBLE), 8) AS retention
FROM active a JOIN first f USING (user_id) JOIN sizes s ON s.cohort = f.cohort
GROUP BY f.cohort, a.week
ORDER BY f.cohort, a.week
"""


def group_fill_bfill(spark, sf_dir):
    """groupby bfill (backfill groupby.py:821): next non-null value
    within the group — F.first(ignorenulls) over the forward frame."""
    e = events_ts(spark, sf_dir).filter(F.col("user_id") < 100)
    v = F.when(F.col("event_type") == "purchase", dec("value"))
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        # DECIMAL(12,2) → DOUBLE at the output boundary (exact at scale 2)
        v.cast("double").alias("v"),
        F.last(v, ignorenulls=True).over(wf).cast("double").alias("v_ffill"),
        F.first(v, ignorenulls=True).over(wb).cast("double").alias("v_bfill"),
    ).orderBy("user_id", "event_id")


GROUP_BFILL_SQL = """
SELECT user_id, event_id, CAST(v AS DOUBLE) AS v,
       CAST(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS v_ffill,
       CAST(FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS v_bfill
FROM (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END AS v
  FROM events WHERE user_id < 100
)
ORDER BY user_id, event_id
"""


def ast_filter_string(spark, sf_dir):
    """DataFrame.query(expr) parity (dataframe.py:4610 →
    queryutils.py:38 query_parser → numba CUDA kernel): the expression
    arrives as a STRING and is parsed/compiled by the engine — Spark's
    SQL parser + codegen replace the reference's Python-AST → CUDA
    pipeline."""
    li = T(spark, sf_dir, "lineitem")
    expr = (
        "l_quantity > 45 and (l_returnflag = 'A' or l_returnflag = 'R') "
        "and l_shipdate >= timestamp'1994-01-01' and not (l_discount < 0.01)"
    )
    return (
        li.filter(expr)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


AST_FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity > 45 AND (l_returnflag = 'A' OR l_returnflag = 'R')
  AND l_shipdate >= TIMESTAMP '1994-01-01' AND NOT (l_discount < 0.01)
ORDER BY l_orderkey, l_linenumber
"""


def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (the batch form of the streaming
    session window — Structured Streaming session_window's semantics
    re-derived over history): per user, a new session starts when the
    gap to the previous event exceeds 30 min. Classic lag→flag→cumsum:
    both windows share ONE partitioning (user_id), so the whole
    operator is a single shuffle + one in-partition pass, then a
    partial-aggregable groupBy on (user, session). Scales: state per
    task is one row of look-back."""
    e = events_ts(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    gap_us = 30 * 60 * 1_000_000
    flagged = e.select(
        "user_id", "event_id", us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("is_new"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("us").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("us") - F.min("us")).alias("dur_us"),
        )
        .orderBy("user_id", "session_seq")
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP))
                   - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
),
sess AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events, CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq
"""


QUERIES = {
    "events_sessionize": events_sessionize,
    "asof_join_events": asof_join_events,
    "asof_join_forward": asof_join_forward,
    "asof_join_nearest": asof_join_nearest,
    "events_funnel": events_funnel,
    "events_cohort_retention": events_cohort_retention,
    "group_fill_bfill": group_fill_bfill,
    "ast_filter_string": ast_filter_string,
}

ORACLE = {
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "asof_join_events": ASOF_JOIN_SQL,
    "asof_join_forward": ASOF_FORWARD_SQL,
    "asof_join_nearest": ASOF_NEAREST_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_cohort_retention": EVENTS_COHORT_SQL,
    "group_fill_bfill": GROUP_BFILL_SQL,
    "ast_filter_string": AST_FILTER_SQL,
}

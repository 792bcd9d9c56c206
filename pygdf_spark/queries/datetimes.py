"""Datetime queries (SURVEY.md §2.9-datetime; cpp/include/cudf/datetime.hpp,
py dt accessors series.py:6080-6397).

Parity notes vs DuckDB oracle:
- Spark dayofweek is 1=Sunday..7=Saturday; DuckDB dayofweek is
  0=Sunday..6 → oracle adds 1.
- weekofyear is ISO in both.
- add_months clamps to month end in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec, epoch_sec, events_ts


def dt_extract_pack(spark, sf_dir):
    """extract_year/month/day/weekday/... (datetime.hpp:45-156),
    last_day (:143), day_of_year (:156), is_leap_year (:205)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    yr = F.year(d)
    return o.select(
        "o_orderkey",
        yr.alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("wk"),
        # DateType → timestamp at the output boundary (date objects vs the
        # oracle's datetime64 hash differently in the driver's compare)
        F.last_day(d).cast("timestamp").alias("month_end"),
        (((yr % 4 == 0) & (yr % 100 != 0)) | (yr % 400 == 0)).alias("is_leap"),
    ).orderBy("o_orderkey")


DT_EXTRACT_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(weekofyear(o_orderdate) AS INT) AS wk,
       CAST(CAST(last_day(o_orderdate) AS DATE) AS TIMESTAMP) AS month_end,
       (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0) OR year(o_orderdate) % 400 = 0 AS is_leap
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
"""


def dt_arith_pack(spark, sf_dir):
    """add_calendrical_months (datetime.hpp:188), day arithmetic,
    datediff, date_trunc, strftime (date_format)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        # date arithmetic in DateType, timestamp at the output boundary
        F.add_months(d.cast("date"), 3).cast("timestamp").alias("plus3mo"),
        F.date_add(d.cast("date"), 45).cast("timestamp").alias("plus45d"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_format(d, "yyyy-MM-dd HH:mm:ss").alias("full_fmt"),
    ).orderBy("o_orderkey")


DT_ARITH_SQL = """
SELECT o_orderkey,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3mo,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS TIMESTAMP) AS plus45d,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
       date_trunc('month', o_orderdate) AS month_start,
       strftime(o_orderdate, '%Y-%m') AS ym,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full_fmt
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
"""


def dt_epoch_pack(spark, sf_dir):
    """epoch conversions (timestamp↔unix seconds) on the nanos events
    table via the engine's ns→µs discipline."""
    e = events_ts(spark, sf_dir)
    ts_sec = epoch_sec("ts")
    back = F.timestamp_seconds(ts_sec)
    return (
        e.select("event_id", ts_sec.alias("ts_sec"), back.alias("ts_floor"))
        .withColumn("hour_of_day", F.hour("ts_floor"))
        .withColumn("minute_of_hour", F.minute("ts_floor"))
        .orderBy("event_id")
    )


DT_EPOCH_SQL = """
-- tz-free reconstruction (to_timestamp returns TIMESTAMPTZ, whose cast
-- to naive depends on the session zone — epoch arithmetic does not)
SELECT event_id, ts_sec,
       TIMESTAMP '1970-01-01' + ts_sec * INTERVAL 1 SECOND AS ts_floor,
       CAST(hour(TIMESTAMP '1970-01-01' + ts_sec * INTERVAL 1 SECOND) AS INT) AS hour_of_day,
       CAST(minute(TIMESTAMP '1970-01-01' + ts_sec * INTERVAL 1 SECOND) AS INT) AS minute_of_hour
FROM (SELECT event_id, epoch_ns(ts) // 1000000000 AS ts_sec FROM events)
ORDER BY event_id
"""


def dt_duration_pack(spark, sf_dir):
    """duration components (timedelta accessors series.py:6563-6694):
    ship lag between order date and ship date in days/hours/seconds."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "inner").filter(F.col("l_orderkey") < 1000)
    lag_sec = F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        (lag_sec / 86400).cast("long").alias("lag_days"),
        (lag_sec / 3600).cast("long").alias("lag_hours"),
        lag_sec.alias("lag_secs"),
    ).orderBy("l_orderkey", "l_linenumber")


DT_DURATION_SQL = """
SELECT l_orderkey, l_linenumber,
       date_diff('second', o_orderdate, l_shipdate) // 86400 AS lag_days,
       date_diff('second', o_orderdate, l_shipdate) // 3600 AS lag_hours,
       date_diff('second', o_orderdate, l_shipdate) AS lag_secs
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber
"""


def dt_window_bucket(spark, sf_dir):
    """tumbling time buckets in batch (the F.window operator that also
    powers §2.10 streaming) — daily order stats."""
    o = T(spark, sf_dir, "orders")
    win = F.window(F.col("o_orderdate"), "7 days")
    return (
        o.groupBy(win.start.alias("week_start"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("o_totalprice")).cast("double").alias("total"))
        .orderBy("week_start")
    )


# Spark 7-day windows align to the unix epoch (1970-01-01); mirror with
# epoch-based integer bucketing.
DT_WINDOW_SQL = """
SELECT (TIMESTAMP '1970-01-01' + (CAST(epoch(o_orderdate) AS BIGINT) // 604800) * 604800 * INTERVAL 1 SECOND) AS week_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY 1 ORDER BY week_start
"""


QUERIES = {
    "dt_extract_pack": dt_extract_pack,
    "dt_arith_pack": dt_arith_pack,
    "dt_epoch_pack": dt_epoch_pack,
    "dt_duration_pack": dt_duration_pack,
    "dt_window_bucket": dt_window_bucket,
}

ORACLE = {
    "dt_extract_pack": DT_EXTRACT_SQL,
    "dt_arith_pack": DT_ARITH_SQL,
    "dt_epoch_pack": DT_EPOCH_SQL,
    "dt_duration_pack": DT_DURATION_SQL,
    "dt_window_bucket": DT_WINDOW_SQL,
}

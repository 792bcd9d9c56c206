"""Streaming-operator semantics, batch-checkable (SURVEY.md §2.10).

The reference's streaming is offset-range Kafka micro-batches
(custreamz/kafka.py:92 read_gdf) with no event-time semantics; our
engine adds Spark Structured Streaming event-time operators. Each
query here runs the *same plan shape* a readStream pipeline uses —
``F.window``/``session_window``/keyed dedup — in batch mode so the
DuckDB oracle can verify the semantics; ``queries/streaming_live.py``
runs the genuinely streaming versions (readStream → availableNow →
memory sink) against the same oracles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec, events_ts


def stream_tumbling_window(spark, sf_dir):
    """5-minute tumbling event-time windows per event_type."""
    e = events_ts(spark, sf_dir)
    win = F.window("ts", "5 minutes")
    return (
        e.groupBy(win.start.alias("w_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).cast("double").alias("sum_val"))
        .orderBy("w_start", "event_type")
    )


STREAM_TUMBLING_SQL = """
SELECT (TIMESTAMP '1970-01-01' + (epoch_ns(ts) // 300000000000) * 300 * INTERVAL 1 SECOND) AS w_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
FROM events GROUP BY 1, 2 ORDER BY w_start, event_type
"""


def stream_sliding_window(spark, sf_dir):
    """10-minute windows sliding every 5 — each event lands in 2
    windows."""
    e = events_ts(spark, sf_dir)
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(win.start.alias("w_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("w_start")
    )


STREAM_SLIDING_SQL = """
SELECT w_start, COUNT(*) AS n FROM (
  SELECT (TIMESTAMP '1970-01-01' + (epoch_ns(ts) // 300000000000) * 300 * INTERVAL 1 SECOND) AS w_start FROM events
  UNION ALL
  SELECT (TIMESTAMP '1970-01-01' + ((epoch_ns(ts) // 300000000000) * 300 - 300) * INTERVAL 1 SECOND) FROM events
) GROUP BY w_start ORDER BY w_start
"""


def stream_session_window(spark, sf_dir):
    """session windows with a 10-minute inactivity gap per user
    (net-new vs reference; Spark session_window in batch mode)."""
    e = events_ts(spark, sf_dir)
    sw = F.session_window("ts", "10 minutes")
    return (
        e.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec("value")).cast("double").alias("sum_val"))
        .select("user_id", F.col("session_window.start").alias("s_start"), "n_events", "sum_val")
        .orderBy("user_id", "s_start")
    )


# gaps-and-islands mirror: a new session starts when the gap since the
# previous event is >= 600s (Spark windows are [start, start+gap)).
STREAM_SESSION_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) >= 600000000
                 OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
            THEN 1 ELSE 0 END AS new_s
  FROM ev
),
islands AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
FROM islands GROUP BY user_id, sid ORDER BY user_id, s_start
"""


def stream_dedup_keys(spark, sf_dir):
    """streaming dropDuplicates semantics (first event per key under
    event order) made deterministic for batch comparison."""
    e = events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event"))
        .orderBy("user_id", "event_type")
    )


STREAM_DEDUP_SQL = """
SELECT user_id, event_type, event_id AS first_event FROM (
  SELECT user_id, event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id, event_type
"""


def stream_late_data_cutoff(spark, sf_dir):
    """watermark semantics, batch-checkable: drop events older than
    (max event time − 1 hour) — the filter a 1h watermark applies."""
    e = events_ts(spark, sf_dir)
    max_ts = e.agg(F.max("ts").alias("m"))
    return (
        e.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("m") - F.expr("INTERVAL 1 HOUR"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_recent"))
        .orderBy("event_type")
    )


STREAM_LATE_SQL = """
SELECT event_type, COUNT(*) AS n_recent
FROM events
WHERE CAST(ts AS TIMESTAMP) >= (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 1 HOUR
GROUP BY event_type ORDER BY event_type
"""


def kafka_avro_payload(spark, sf_dir):
    """Kafka read_gdf with an AVRO payload (custreamz kafka.py:130:
    message_format='avro' hands each message buffer to cudf.read_avro).
    Supplier is encoded into per-nation Avro OCF messages driver-side
    (bounded: one message per nation key, connector raw schema), then
    the REAL consumer path decodes them executor-side via mapInPandas +
    the in-repo OCF codec, trims an offset range, and aggregates. The
    oracle runs the same aggregate on the original parquet, so any
    decode divergence breaks the value hash."""
    import datetime

    from pygdf_spark.sources.avro_lite import encode_avro
    from pygdf_spark.streaming import kafka as K

    sup = (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        # bounded: mock-Kafka FIXTURE BUILDER — this collect constructs
        # the test log itself (at production the log already exists on
        # the broker; only the decode path under test runs distributed)
        .toPandas()
    )
    rows = []
    for off, (nk, grp) in enumerate(sorted(sup.groupby("s_nationkey"))):
        rows.append(
            (
                None,
                bytearray(encode_avro(grp.sort_values("s_suppkey"))),
                "suppliers",
                0,
                off,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=off),
            )
        )
    raw = spark.createDataFrame(rows, K.RAW_SCHEMA_DDL)
    c = K.Consumer(spark, raw_source=lambda topic: raw)
    df = c.read_gdf("suppliers", partition=0, start=2, message_format="avro")
    return (
        df.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s_suppkey").alias("key_sum"),
            F.sum(dec("s_acctbal")).cast("double").alias("bal_sum"),
        )
        .orderBy("s_nationkey")
    )


KAFKA_AVRO_SQL = """
WITH ranked AS (
  SELECT *, DENSE_RANK() OVER (ORDER BY s_nationkey) - 1 AS off FROM supplier
)
SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_sum
FROM ranked WHERE off >= 2
GROUP BY s_nationkey ORDER BY s_nationkey
"""


QUERIES = {
    "stream_tumbling_window": stream_tumbling_window,
    "kafka_avro_payload": kafka_avro_payload,
    "stream_sliding_window": stream_sliding_window,
    "stream_session_window": stream_session_window,
    "stream_dedup_keys": stream_dedup_keys,
    "stream_late_data_cutoff": stream_late_data_cutoff,
}

ORACLE = {
    "stream_tumbling_window": STREAM_TUMBLING_SQL,
    "kafka_avro_payload": KAFKA_AVRO_SQL,
    "stream_sliding_window": STREAM_SLIDING_SQL,
    "stream_session_window": STREAM_SESSION_SQL,
    "stream_dedup_keys": STREAM_DEDUP_SQL,
    "stream_late_data_cutoff": STREAM_LATE_SQL,
}

"""Kafka source parity (SURVEY.md §2.1/§2.10; reference:
python/custreamz/custreamz/kafka.py:73 ``Consumer``, :92 ``read_gdf``).

The reference's streaming ingestion is an offset-range micro-batch:
``read_gdf(topic, partition, start, end, message_format)`` reads Kafka
offsets ``[start, end)`` and decodes them with a cuIO reader. The Spark
mapping is exact:

- offset-bounded BATCH read  → ``spark.read.format("kafka")`` with
  ``startingOffsets``/``endingOffsets`` JSON (this module)
- continuous ingestion       → ``spark.readStream.format("kafka")`` +
  the pipelines in ``streaming/pipelines.py``
- ``message_format=`` decode → ``from_json`` / ``from_csv`` /
  ``from_avro`` on the ``value`` column (schema-on-read, vs the
  reference's cuIO parse)
- ``committed``/``get_watermark_offsets`` (kafka.py:181,:215 — Kafka
  LOG watermarks, not event-time) → Spark manages offsets in its own
  checkpoint; log-watermark introspection stays an admin-client
  concern, deliberately outside the engine.

The spark-sql-kafka connector jar is not bundled in this environment;
calls fail with a clear actionable error instead of a Py4J wall.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KAFKA_HELP = (
    "Kafka support needs the spark-sql-kafka package "
    "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
)


def read_gdf(
    spark: SparkSession,
    topic: str,
    partition: int = 0,
    start: int | None = None,
    end: int | None = None,
    message_format: str = "json",
    schema: str | None = None,
    brokers: str = "localhost:9092",
) -> DataFrame:
    """custreamz ``read_gdf`` (kafka.py:92): offsets [start, end) of one
    topic-partition as a decoded DataFrame."""
    r = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
    )
    if start is not None:
        r = r.option("startingOffsets", json.dumps({topic: {str(partition): start}}))
    if end is not None:
        r = r.option("endingOffsets", json.dumps({topic: {str(partition): end}}))
    try:
        raw = r.load()
    except Exception as e:  # pragma: no cover - jar-dependent
        raise RuntimeError(_KAFKA_HELP) from e
    value = F.col("value").cast("string")
    if message_format == "json":
        if schema is None:
            raise ValueError("json decode needs a schema DDL string")
        parsed = raw.select(
            F.from_json(value, schema).alias("r"), F.col("offset"), F.col("timestamp")
        )
        return parsed.select("r.*", "offset", "timestamp")
    if message_format == "csv":
        if schema is None:
            raise ValueError("csv decode needs a schema DDL string")
        parsed = raw.select(
            F.from_csv(value, schema).alias("r"), F.col("offset"), F.col("timestamp")
        )
        return parsed.select("r.*", "offset", "timestamp")
    if message_format == "raw":
        return raw
    raise ValueError(f"unsupported message_format {message_format!r}")


def read_stream(
    spark: SparkSession,
    topic: str,
    brokers: str = "localhost:9092",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Continuous Kafka ingestion (the capability custreamz approximated
    with polling loops): returns the raw stream; decode + window with
    the pipelines module."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - jar-dependent
        raise RuntimeError(_KAFKA_HELP) from e

"""Kafka source parity (SURVEY.md §2.1/§2.10; reference:
python/custreamz/custreamz/kafka.py:73 ``Consumer``, :92 ``read_gdf``,
:181 ``committed``, :215 ``get_watermark_offsets``, :264 ``commit``).

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
- ``committed``/``get_watermark_offsets``/``commit`` (kafka.py:181,
  215, 264 — Kafka LOG offsets, not event-time watermarks) → the
  ``Consumer`` class below, with a file-backed offset store standing in
  for the broker's __consumer_offsets when running without one.

Everything downstream of the raw load (offset-range trim, partition
filter, decode) is SOURCE-AGNOSTIC: ``Consumer`` takes any provider
returning the connector's raw schema (key/value binary, topic,
partition, offset, timestamp), so the full consumer contract is
testable without a broker, and swapping in the real connector changes
only the provider. The spark-sql-kafka jar is not bundled in this
environment; connector-backed calls fail with a clear actionable error
instead of a Py4J wall.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KAFKA_HELP = (
    "Kafka support needs the spark-sql-kafka package "
    "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
)


def _is_missing_source(e: Exception) -> bool:
    """True only for the missing-connector-jar failure class — other
    connector errors (bad broker, bad option) must surface as-is."""
    s = f"{type(e).__name__}: {e}"
    return any(m in s for m in (
        "Failed to find data source: kafka",
        "DATA_SOURCE_NOT_FOUND",
        "ClassNotFoundException",
        "Failed to find the data source: kafka",
    ))


def _wrap_kafka_error(e: Exception) -> Exception:
    return RuntimeError(_KAFKA_HELP) if _is_missing_source(e) else e

#: the Kafka connector's raw output schema (what any provider must yield)
RAW_SCHEMA_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp"
)


#: payload formats decoded executor-side from the binary value column
#: (custreamz kafka.py:158-165 routes these to cuIO readers; here avro
#: goes to the in-repo OCF codec, parquet/orc to pyarrow — all three
#: inside ONE mapInPandas so decode parallelism == raw partition count)
_BINARY_FORMATS = ("avro", "parquet", "orc")


def _parse_payload(message_format: str, data: bytes):
    """One binary payload blob → pandas frame (executor-side)."""
    import pandas as pd

    if message_format == "avro":
        from pygdf_spark.sources.avro_lite import read_records_buf

        schema, records = read_records_buf(data)
        names = [f["name"] for f in schema["fields"]]
        return pd.DataFrame.from_records(records, columns=names)
    import pyarrow as pa

    if message_format == "parquet":
        import pyarrow.parquet as pq

        return pq.read_table(pa.BufferReader(data)).to_pandas()
    import pyarrow.orc as orc

    return orc.ORCFile(pa.BufferReader(data)).read().to_pandas()


def _infer_payload_schema(raw: DataFrame, message_format: str):
    """Spark StructType of a binary payload, inferred from ONE message
    (driver-side, bounded: limit(1) — the same inference cudf's readers
    do from each buffer's embedded header/footer). Tombstones (null
    values, normal in compacted topics) are skipped."""
    first = raw.select("value").filter(F.col("value").isNotNull()).limit(1).collect()
    if not first:
        raise ValueError(
            f"cannot infer {message_format} payload schema from an empty "
            "topic; pass schema= explicitly"
        )
    data = bytes(first[0]["value"])
    if message_format == "avro":
        from pygdf_spark.sources.avro_lite import _read_header, schema_to_ddl

        import io as _io

        schema, _, _ = _read_header(_io.BytesIO(data))
        return schema_to_ddl(schema)
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow as pa

    if message_format == "parquet":
        import pyarrow.parquet as pq

        arrow = pq.read_schema(pa.BufferReader(data))
    else:
        import pyarrow.orc as orc

        arrow = orc.ORCFile(pa.BufferReader(data)).schema
    return from_arrow_schema(arrow)


def _decode(raw: DataFrame, message_format: str, schema: str | None) -> DataFrame:
    """value-column decode shared by every source (connector or mock):
    the Spark analog of custreamz's cuIO message_format parse
    (kafka.py:158-165: json/csv/avro/orc/parquet)."""
    if message_format == "raw":
        return raw
    if message_format in _BINARY_FORMATS:
        from pyspark.sql.types import StructType

        payload = schema if schema is not None else _infer_payload_schema(
            raw, message_format
        )
        if isinstance(payload, str):
            payload_t = StructType.fromDDL(payload)
        else:
            payload_t = payload
        names = [f.name for f in payload_t.fields]
        # a payload column named partition/offset/timestamp must not be
        # clobbered by the Kafka metadata — metadata gets suffixed
        meta = {
            m: (m + "_kafka" if m in names else m)
            for m in ("partition", "offset", "timestamp")
        }
        meta_t = StructType.fromDDL(
            f"`{meta['partition']}` int, `{meta['offset']}` bigint, "
            f"`{meta['timestamp']}` timestamp"
        )
        out_t = StructType(payload_t.fields + meta_t.fields)
        fmt = message_format

        def decode(batches):
            for pdf in batches:
                for val, part, off, ts in zip(
                    pdf["value"], pdf["partition"], pdf["offset"], pdf["timestamp"]
                ):
                    if val is None:  # tombstone (compacted-topic delete)
                        continue
                    rec = _parse_payload(fmt, bytes(val))[names]
                    rec = rec.assign(**{
                        meta["partition"]: part, meta["offset"]: off,
                        meta["timestamp"]: ts,
                    })
                    yield rec[[f.name for f in out_t.fields]]

        return raw.select("value", "partition", "offset", "timestamp").mapInPandas(
            decode, schema=out_t
        )
    value = F.col("value").cast("string")
    if schema is None:
        raise ValueError(f"{message_format} decode needs a schema DDL string")
    parser = {"json": F.from_json, "csv": F.from_csv}.get(message_format)
    if parser is None:
        raise ValueError(f"unsupported message_format {message_format!r}")
    parsed = raw.select(
        parser(value, schema).alias("r"), F.col("partition"), F.col("offset"),
        F.col("timestamp"),
    )
    payload_names = set(parsed.select("r.*").columns)
    meta_cols = [
        F.col(m).alias(m + "_kafka") if m in payload_names else F.col(m)
        for m in ("partition", "offset", "timestamp")
    ]
    return parsed.select("r.*", *meta_cols)


class Consumer:
    """custreamz ``Consumer`` (kafka.py:73) over a pluggable raw source.

    ``raw_source(topic)`` must return a DataFrame with
    ``RAW_SCHEMA_DDL`` columns. Default: the Spark Kafka connector
    (jar-gated). Group offsets live in a file-backed store under
    ``offset_dir`` (one JSON per group) — the no-broker stand-in for
    __consumer_offsets; with a real broker, Spark's own checkpoints
    are authoritative and this store is bookkeeping parity only.
    """

    def __init__(
        self,
        spark: SparkSession,
        brokers: str = "localhost:9092",
        group: str = "pygdf-spark",
        offset_dir: str | None = None,
        raw_source=None,
    ):
        self._spark = spark
        self._brokers = brokers
        self._group = group
        # SPARK_LOCAL_DIRS is a comma-separated list by Spark convention
        local = os.environ.get("SPARK_LOCAL_DIRS", "/tmp").split(",")[0]
        self._offset_dir = offset_dir or os.path.join(local, "pygdf_spark_offsets")
        self._raw_source = raw_source or self._connector_source

    # -- raw sources ---------------------------------------------------
    def _connector_source(
        self, topic: str, partition: int | None = None,
        start: int | None = None, end: int | None = None,
    ) -> DataFrame:
        """Connector read. With a partition given, binds via ``assign``
        so an offset range names ONLY that TopicPartition (a subscribe-
        mode offsets JSON must list every partition) and the broker
        seeks instead of scan-and-filter."""
        r = self._spark.read.format("kafka").option(
            "kafka.bootstrap.servers", self._brokers
        )
        if partition is None:
            r = (r.option("subscribe", topic)
                 .option("startingOffsets", "earliest")
                 .option("endingOffsets", "latest"))
        else:
            r = r.option("assign", json.dumps({topic: [partition]}))
            so = {topic: {str(partition): start if start is not None else -2}}
            eo = {topic: {str(partition): end if end is not None else -1}}
            r = (r.option("startingOffsets", json.dumps(so))
                 .option("endingOffsets", json.dumps(eo)))
        try:
            return r.load()
        except Exception as e:  # pragma: no cover - jar-dependent
            raise _wrap_kafka_error(e) from e

    # -- custreamz surface --------------------------------------------
    def read_gdf(
        self,
        topic: str,
        partition: int = 0,
        start: int | None = None,
        end: int | None = None,
        message_format: str = "json",
        schema: str | None = None,
    ) -> DataFrame:
        """Offsets ``[start, end)`` of one topic-partition, decoded
        (kafka.py:92). With the connector source the range is pushed to
        the broker (``assign`` + startingOffsets/endingOffsets, so the
        broker seeks); with a pluggable mock source it is a filter. The
        partition/offset filters stay on both paths as an exactness
        guard — on the connector path they are no-ops."""
        if message_format == "json" and schema is None:
            raise ValueError("json decode needs a schema DDL string")
        if self._raw_source == self._connector_source:
            raw = self._connector_source(topic, partition, start, end)
        else:
            raw = self._raw_source(topic)
        raw = raw.filter(F.col("partition") == partition)
        if start is not None:
            raw = raw.filter(F.col("offset") >= start)
        if end is not None:
            raw = raw.filter(F.col("offset") < end)
        return _decode(raw, message_format, schema)

    def get_watermark_offsets(self, topic: str, partition: int = 0) -> tuple[int, int]:
        """(lo, hi) LOG watermarks of a topic-partition (kafka.py:215):
        lowest available offset and next-offset-to-be-written. The batch
        connector has no metadata-only call, so this reads the single
        assigned partition and aggregates — bounded to one partition
        (at ops scale prefer a Kafka AdminClient, which answers from
        broker metadata without reading messages)."""
        src = (
            self._connector_source(topic, partition)
            if self._raw_source == self._connector_source
            else self._raw_source(topic)
        )
        row = (
            src.filter(F.col("partition") == partition)
            .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"))
            .collect()[0]
        )
        if row["lo"] is None:
            return (0, 0)
        return (int(row["lo"]), int(row["hi"]) + 1)

    def _store_path(self) -> str:
        os.makedirs(self._offset_dir, exist_ok=True)
        return os.path.join(self._offset_dir, f"{self._group}.json")

    def commit(self, topic: str, partition: int, offset: int) -> None:
        """Record the group's committed offset (kafka.py:264) — the
        NEXT offset to consume, Kafka convention."""
        path = self._store_path()
        state = {}
        if os.path.exists(path):
            with open(path) as f:
                state = json.load(f)
        state[f"{topic}/{partition}"] = int(offset)
        # atomic replace: a crash mid-write must not leave a truncated
        # store that breaks every later committed(). (Concurrent
        # committers in one group remain last-writer-wins per key-set —
        # with a real broker, Spark's checkpoint is authoritative.)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    def committed(self, topic: str, partition: int = 0) -> int | None:
        """The group's committed offset, or None (kafka.py:181)."""
        path = self._store_path()
        if not os.path.exists(path):
            return None
        with open(path) as f:
            state = json.load(f)
        v = state.get(f"{topic}/{partition}")
        return None if v is None else int(v)

    def list_topics(self, specific_topic: str | None = None) -> dict:
        """Topic → partition-id list (kafka.py:36 list_topics, which
        proxies librdkafka metadata). Without a broker admin API, the
        connector path derives it from the raw frame's partition
        column; the file-backed store contributes topics this group has
        committed against (bookkeeping parity)."""
        topics: dict[str, list[int]] = {}
        path = self._store_path()
        if os.path.exists(path):
            with open(path) as f:
                for key in json.load(f):
                    t, p = key.rsplit("/", 1)
                    topics.setdefault(t, [])
                    if int(p) not in topics[t]:
                        topics[t].append(int(p))
        if specific_topic is not None:
            try:
                parts = (
                    self._raw_source(specific_topic)
                    .select("partition").distinct().collect()
                )
                topics[specific_topic] = sorted(int(r[0]) for r in parts)
            except Exception as e:
                # only the missing-jar class (raw or already wrapped as
                # the _KAFKA_HELP RuntimeError) degrades to
                # committed-store info; real errors (broker down, auth)
                # must surface even when they arrive as RuntimeError
                if not _is_missing_source(e) and str(e) != _KAFKA_HELP:
                    raise
                topics.setdefault(specific_topic, [])
        return {k: sorted(v) for k, v in topics.items()}

    def unsubscribe(self) -> None:
        """Drop the group's stored offsets (kafka.py:53 unsubscribe —
        librdkafka forgets the assignment; here the assignment IS the
        offset store)."""
        path = self._store_path()
        if os.path.exists(path):
            os.remove(path)

    def close(self, timeout: int = 10000) -> None:
        """kafka.py:62 close — no persistent client to tear down (the
        Spark session owns the connector); kept for call-site parity."""
        return None


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
    topic-partition as a decoded DataFrame (connector-backed; the
    offset range rides startingOffsets/endingOffsets so the broker
    seeks instead of scan-and-filter)."""
    if message_format == "json" and schema is None:
        raise ValueError("json decode needs a schema DDL string")
    # assign-mode binds the read to ONE TopicPartition: the offsets JSON
    # then names only that partition (subscribe-mode offset JSON must
    # list every partition of the topic) and no sibling rows leak in
    r = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("assign", json.dumps({topic: [partition]}))
        .option("startingOffsets", json.dumps(
            {topic: {str(partition): start if start is not None else -2}}
        ))
        .option("endingOffsets", json.dumps(
            {topic: {str(partition): end if end is not None else -1}}
        ))
    )
    try:
        raw = r.load()
    except Exception as e:  # pragma: no cover - jar-dependent
        raise _wrap_kafka_error(e) from e
    raw = raw.filter(F.col("partition") == partition)
    if start is not None:
        raw = raw.filter(F.col("offset") >= start)
    if end is not None:
        raw = raw.filter(F.col("offset") < end)
    return _decode(raw, message_format, schema)


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
        raise _wrap_kafka_error(e) from e

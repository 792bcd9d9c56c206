"""Kafka consumer-contract tests (reference custreamz/kafka.py:73-264).

The connector jar is absent here, so the contract is driven through a
file-backed mock raw source with the connector's exact output schema —
the decode, offset-range trim, watermark, and commit plumbing are the
real code paths; only raw-frame acquisition is swapped (the documented
provider seam in streaming/kafka.py).
"""

from __future__ import annotations

import datetime
import json

import pytest

from pygdf_spark.streaming import kafka as K


def _raw_frame(spark, fmt: str = "json"):
    """100 messages over 2 partitions with per-partition offsets 0..49,
    shaped exactly like the Kafka connector's raw output."""
    rows = []
    for p in (0, 1):
        for off in range(50):
            i = p * 50 + off
            payload = (
                json.dumps({"id": i, "v": i * 10}) if fmt == "json" else f"{i},{i * 10}"
            )
            rows.append(
                (
                    None,
                    bytearray(payload.encode()),
                    "t",
                    p,
                    off,
                    datetime.datetime(2024, 1, 1, 0, 0, i % 60),
                )
            )
    return spark.createDataFrame(rows, K.RAW_SCHEMA_DDL)


def test_consumer_read_gdf_offset_roundtrip(spark):
    raw = _raw_frame(spark)
    c = K.Consumer(spark, raw_source=lambda topic: raw)
    df = c.read_gdf("t", partition=0, start=10, end=20,
                    message_format="json", schema="id int, v int")
    got = sorted((r["id"], r["v"], r["offset"]) for r in df.collect())
    assert got == [(i, i * 10, i) for i in range(10, 20)]
    # other partition, open-ended ranges
    assert c.read_gdf("t", partition=1, start=45, message_format="raw").count() == 5
    assert c.read_gdf("t", partition=1, end=5, message_format="raw").count() == 5


def test_consumer_csv_decode(spark):
    raw = _raw_frame(spark, fmt="csv")
    c = K.Consumer(spark, raw_source=lambda topic: raw)
    df = c.read_gdf("t", partition=1, start=0, end=3,
                    message_format="csv", schema="id int, v int")
    assert sorted(r["id"] for r in df.collect()) == [50, 51, 52]


def test_consumer_watermarks_and_commit(spark, tmp_path):
    raw = _raw_frame(spark)
    c = K.Consumer(spark, group="g1", offset_dir=str(tmp_path),
                   raw_source=lambda topic: raw)
    # LOG watermarks: lowest offset, next-to-be-written (kafka.py:215)
    assert c.get_watermark_offsets("t", 0) == (0, 50)
    assert c.get_watermark_offsets("t", 1) == (0, 50)
    # committed: None before any commit, then the stored next-offset
    assert c.committed("t", 0) is None
    c.commit("t", 0, 20)
    assert c.committed("t", 0) == 20
    c.commit("t", 0, 35)
    assert c.committed("t", 0) == 35
    assert c.committed("t", 1) is None
    # groups are isolated
    c2 = K.Consumer(spark, group="g2", offset_dir=str(tmp_path),
                    raw_source=lambda topic: raw)
    assert c2.committed("t", 0) is None
    # resume-from-committed drains exactly the unread tail
    tail = c.read_gdf("t", partition=0, start=c.committed("t", 0),
                      message_format="raw")
    assert tail.count() == 15


def test_read_gdf_requires_schema_for_json(spark):
    with pytest.raises((ValueError, RuntimeError)):
        K.read_gdf(spark, "topic", message_format="json", schema=None)


def test_read_gdf_gated_without_jar(spark):
    try:
        df = K.read_gdf(spark, "topic", start=0, end=10,
                        message_format="raw", brokers="none:1")
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
    else:  # connector present: plan must carry the kafka source
        assert "kafka" in df._jdf.queryExecution().logical().toString().lower()


def test_read_stream_gated_without_jar(spark):
    try:
        sdf = K.read_stream(spark, "topic", brokers="none:1")
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
    else:
        assert sdf.isStreaming


def _binary_raw_frame(spark, fmt: str):
    """6 messages (3 per partition), each payload a multi-row binary
    blob — avro OCF via the in-repo codec, parquet/orc via pyarrow —
    the shape custreamz read_gdf hands to cuIO (kafka.py:158-165)."""
    import io

    import pandas as pd
    import pyarrow as pa

    from pygdf_spark.sources.avro_lite import encode_avro

    def blob(lo: int) -> bytes:
        pdf = pd.DataFrame({
            "id": list(range(lo, lo + 4)),
            "name": [f"row{j}" for j in range(lo, lo + 4)],
            "score": [j * 1.5 for j in range(lo, lo + 4)],
        })
        if fmt == "avro":
            return encode_avro(pdf)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        sink = io.BytesIO()
        if fmt == "parquet":
            import pyarrow.parquet as pq

            pq.write_table(table, sink)
        else:
            import pyarrow.orc as orc

            orc.write_table(table, sink)
        return sink.getvalue()

    rows = []
    for p in (0, 1):
        for off in range(3):
            lo = (p * 3 + off) * 4
            rows.append(
                (None, bytearray(blob(lo)), "t", p, off,
                 datetime.datetime(2024, 1, 1, 0, 0, off))
            )
    return spark.createDataFrame(rows, K.RAW_SCHEMA_DDL)


@pytest.mark.parametrize("fmt", ["avro", "parquet", "orc"])
def test_consumer_binary_payload_decode(spark, fmt):
    """read_gdf message_format avro/parquet/orc: schema inferred from
    the first message, offset trim still applies, values exact."""
    raw = _binary_raw_frame(spark, fmt)
    c = K.Consumer(spark, raw_source=lambda topic: raw)
    df = c.read_gdf("t", partition=0, start=1, end=3, message_format=fmt)
    got = sorted((r["id"], r["name"], r["score"], r["offset"]) for r in df.collect())
    exp = [(i, f"row{i}", i * 1.5, i // 4) for i in range(4, 12)]
    assert got == exp
    # explicit DDL schema path (column subset ordering still honored)
    df2 = c.read_gdf("t", partition=1, message_format=fmt,
                     schema="id bigint, name string, score double")
    assert df2.count() == 12
    assert df2.columns == ["id", "name", "score", "partition", "offset", "timestamp"]
    # decode stays executor-side: one mapInPandas, no Python row loop
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_binary_payload_empty_topic_schema_error(spark):
    raw = spark.createDataFrame([], K.RAW_SCHEMA_DDL)
    c = K.Consumer(spark, raw_source=lambda topic: raw)
    with pytest.raises(ValueError, match="empty"):
        c.read_gdf("t", message_format="avro")


def test_consumer_list_topics_unsubscribe_close(spark, tmp_path):
    """custreamz kafka.py:36/53/62 parity: list_topics from committed
    state + raw source partitions; unsubscribe clears the group store;
    close is a no-op."""
    from pygdf_spark.streaming.kafka import Consumer

    raw = _raw_frame(spark)
    c = Consumer(spark, offset_dir=str(tmp_path), group="g1",
                 raw_source=lambda topic: raw)
    c.commit("t1", 0, 5)
    c.commit("t1", 1, 9)
    c.commit("t2", 0, 1)
    topics = c.list_topics()
    assert topics == {"t1": [0, 1], "t2": [0]}
    t1 = c.list_topics(specific_topic="t1")
    assert 0 in t1["t1"]
    c.close()
    assert c.committed("t1", 0) == 5
    c.unsubscribe()
    assert c.committed("t1", 0) is None
    assert c.list_topics() == {"t1": [0]} or "t1" not in c.list_topics()


def test_binary_decode_skips_tombstones(spark):
    """Compacted-topic tombstones (value=null) must not crash the
    binary decode or schema inference (review r4)."""
    raw = _binary_raw_frame(spark, "parquet")
    tomb = spark.createDataFrame(
        [(None, None, "t", 0, 99, datetime.datetime(2024, 1, 2))],
        K.RAW_SCHEMA_DDL,
    )
    c = K.Consumer(spark, raw_source=lambda topic: tomb.unionByName(raw))
    out = c.read_gdf("t", partition=0, message_format="parquet").toPandas()
    assert len(out) == 12  # 3 messages x 4 rows; tombstone skipped
    assert 99 not in set(out["offset"])


def test_decode_payload_metadata_name_collision(spark):
    """A payload column named 'offset' must survive; Kafka metadata
    gets the _kafka suffix (review r4)."""
    import json as _json

    rows = [
        (None, bytearray(_json.dumps({"id": i, "offset": i * 10}).encode()),
         "t", 0, i, datetime.datetime(2024, 1, 1, 0, 0, i))
        for i in range(3)
    ]
    raw = spark.createDataFrame(rows, K.RAW_SCHEMA_DDL)
    c = K.Consumer(spark, raw_source=lambda topic: raw)
    out = c.read_gdf("t", partition=0, message_format="json",
                     schema="id int, offset bigint").toPandas()
    assert "offset_kafka" in out.columns
    assert sorted(out["offset"].tolist()) == [0, 10, 20]   # payload wins
    assert sorted(out["offset_kafka"].tolist()) == [0, 1, 2]


def test_list_topics_raises_on_real_errors(spark):
    """Only the missing-jar class degrades; real source errors surface
    (review r4)."""
    def boom(topic):
        raise ValueError("broker unreachable")

    c = K.Consumer(spark, raw_source=boom)
    with pytest.raises(ValueError, match="broker unreachable"):
        c.list_topics("t")


def test_offset_dir_takes_first_spark_local_dir(spark, monkeypatch, tmp_path):
    monkeypatch.setenv(
        "SPARK_LOCAL_DIRS", f"{tmp_path}/d1,{tmp_path}/d2"
    )
    c = K.Consumer(spark, raw_source=lambda t: None)
    assert c._offset_dir == f"{tmp_path}/d1/pygdf_spark_offsets"


def test_list_topics_raises_on_runtime_errors(spark):
    """r4 advice: a genuine broker/auth failure surfaced as
    RuntimeError must raise too — only the wrapped missing-jar help
    error degrades to committed-store-only results."""
    def boom(topic):
        raise RuntimeError("SASL authentication failed")

    c = K.Consumer(spark, raw_source=boom)
    with pytest.raises(RuntimeError, match="SASL"):
        c.list_topics("t")

    from pygdf_spark.streaming.kafka import _KAFKA_HELP

    def missing(topic):
        raise RuntimeError(_KAFKA_HELP)

    c2 = K.Consumer(spark, raw_source=missing)
    assert c2.list_topics("t") == {"t": []}   # wrapped help error degrades

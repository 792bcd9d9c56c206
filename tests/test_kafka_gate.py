"""The Kafka surface is jar-gated in this environment — verify the
error contract (and the API shape) without a broker."""

from __future__ import annotations

import pytest

from pygdf_spark.streaming import kafka as K


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

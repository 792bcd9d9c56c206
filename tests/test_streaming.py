

def test_dedup_within_watermark_live(spark, tmp_path):
    """The evictable-state dedup variant (r4 review): exact within the
    single availableNow batch of the fixture."""
    from pygdf_spark.streaming.pipelines import (
        dedup_within_watermark, read_events_stream, run_available_now,
    )

    ev = read_events_stream(spark, "/root/testdata/sf0.001")
    out = run_available_now(dedup_within_watermark(ev), mode="append")
    pdf = out.toPandas()
    assert len(pdf) == len(pdf.drop_duplicates(["user_id", "event_type"]))
    assert len(pdf) > 0


def test_view_purchase_join_large_horizon_watermark(spark):
    """Watermark derives from the horizon (a fixed 3h delay silently
    dropped in-horizon matches for horizon > 3h)."""
    import pytest as _pytest

    from pygdf_spark.streaming.pipelines import read_events_stream, view_purchase_join

    ev = read_events_stream(spark, "/root/testdata/sf0.001")
    j = view_purchase_join(ev, horizon="6 hours")  # plans without error
    assert j.isStreaming
    with _pytest.raises(ValueError, match="whole hours"):
        view_purchase_join(ev, horizon="90 minutes")


def test_run_available_now_parquet_empty_stream(spark, tmp_path):
    """A zero-row stream returns an empty frame instead of a schema-
    inference crash (r4 review)."""
    from pyspark.sql import functions as F

    from pygdf_spark.streaming.pipelines import (
        read_events_stream, run_available_now_parquet,
    )

    ev = read_events_stream(spark, "/root/testdata/sf0.001")
    nothing = ev.filter(F.col("event_type") == "no_such_type")
    out = run_available_now_parquet(
        nothing, path=str(tmp_path / "sink"), checkpoint=str(tmp_path / "ck"),
    )
    assert out.count() == 0

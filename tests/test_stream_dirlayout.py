"""Directory-layout streaming source (sf1-gate regression): an events
table written as a Spark part-file directory must stream identically
to the single-file layout — the r4 sf1 gate found pathGlobFilter
matched zero files inside the directory (every live stream returned an
empty sink)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pygdf_spark.streaming import read_events_stream, run_available_now, tumbling_counts


@pytest.fixture(scope="module")
def dir_layout_sf(spark, tmp_path_factory):
    """A sf-dir clone where events.parquet is a 3-part DIRECTORY."""
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("dirsf"))
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    ev.repartition(3).write.parquet(os.path.join(dst, "events.parquet"))
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def test_directory_events_streams_all_rows(spark, dir_layout_sf):
    ev = read_events_stream(spark, dir_layout_sf)
    out = run_available_now(tumbling_counts(ev), "complete")
    streamed = {
        (r["w_start"], r["event_type"]): (r["n"], r["sum_val"])
        for r in out.collect()
    }
    assert streamed, "directory layout streamed zero rows"
    # batch reference over the same directory
    from pygdf_spark.queries._util import T

    batch = (
        T(spark, dir_layout_sf, "events")
        .groupBy(
            F.window("ts", "5 minutes").start.alias("w_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expect_n = {(r["w_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert {k: v[0] for k, v in streamed.items()} == expect_n


def test_single_file_layout_still_streams(spark):
    ev = read_events_stream(spark, "/root/testdata/sf0.001")
    out = run_available_now(tumbling_counts(ev), "complete")
    assert out.count() > 0

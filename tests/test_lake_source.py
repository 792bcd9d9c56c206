"""deltalite Python DataSource (batch + streaming) protocol tests:
format registration, DV-applied batch parity, version time travel,
exactly-once incremental tailing across checkpointed restarts, and the
non-append safety contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl
from pygdf_spark.streaming.lake_source import register


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, table, lo, hi, tag=0):
    df = spark.range(lo, hi).withColumn("v", F.col("id") * 2 + tag)
    return dl.append(df.repartition(2), table, stat_cols=["id"])


def test_batch_format_matches_read_table(spark, table):
    _mk(spark, table, 0, 500)
    _mk(spark, table, 500, 900)
    dl.delete_where(spark, table, [("id", "<", 100)])
    register(spark)
    via_fmt = spark.read.format("deltalite").option("path", table).load()
    via_api = dl.read_table(spark, table)
    assert sorted(r["id"] for r in via_fmt.collect()) == sorted(
        r["id"] for r in via_api.collect()
    )
    v0 = (
        spark.read.format("deltalite").option("path", table)
        .option("version", 0).load()
    )
    assert v0.count() == 500


def test_stream_incremental_exactly_once(spark, table, tmp_path):
    """Checkpointed restarts must deliver each committed version
    exactly once: run → append more → re-run with the SAME checkpoint
    → the sink grows by exactly the new rows."""
    register(spark)
    _mk(spark, table, 0, 300)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("deltalite").option("path", table).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 300
    _mk(spark, table, 300, 450)
    dl.compact(spark, table, num_files=1)  # metadata only: no re-emit
    _mk(spark, table, 450, 500)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 500  # NOT 800: versions 0-1 never re-emitted
    assert sorted(r["id"] for r in got.select("id").collect()) == list(range(500))


def test_stream_non_append_commit_raises_without_skip(spark, table, tmp_path):
    register(spark)
    _mk(spark, table, 0, 100)
    dl.delete_where(spark, table, [("id", "<", 10)])  # change commit
    q = (
        spark.readStream.format("deltalite").option("path", table).load()
        .writeStream.format("memory").queryName("lake_src_fail")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="non-append|skipChangeCommits"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise Exception(str(q.exception()))


def test_stream_skip_change_commits(spark, table, tmp_path):
    register(spark)
    _mk(spark, table, 0, 100)
    dl.delete_where(spark, table, [("id", "<", 10)])
    _mk(spark, table, 100, 150)
    q = (
        spark.readStream.format("deltalite").option("path", table)
        .option("skipChangeCommits", "true").load()
        .writeStream.format("memory").queryName("lake_src_skip")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # appends only: the dv delete is skipped (documented contract)
    assert spark.table("lake_src_skip").count() == 150


def test_stream_sink_native_exactly_once_replay(spark, table, tmp_path):
    """writeStream.format('deltalite'): a FULL replay (fresh
    checkpoint, same appId) must be swallowed entirely by the txn
    high-water mark — counts identical, no doubled batch."""
    register(spark)
    feed = str(tmp_path / "feed")
    spark.range(0, 400).withColumn("v", F.col("id") * 3).write.json(feed)

    def drain(ckpt):
        q = (
            spark.readStream.schema("id long, v long").json(feed)
            .writeStream.format("deltalite")
            .option("path", table).option("appId", "sink-eo-test")
            .option("statCols", "id")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain("ck_a")
    assert dl.read_table(spark, table).count() == 400
    drain("ck_b")  # fresh checkpoint: every micro-batch replays
    assert dl.read_table(spark, table).count() == 400, (
        "replayed micro-batch must be deduped by the txn mark"
    )
    assert dl.live_files(table)[0].get("stats") is not None


def test_stream_sink_enforces_check_constraints(spark, table, tmp_path):
    """A CHECK constraint blocks bad rows arriving through the native
    streaming sink — the violating micro-batch fails, nothing commits."""
    register(spark)
    dl.append(spark.createDataFrame([(1, 10)], "id long, v long"), table)
    dl.add_check_constraint(spark, table, "v_pos", "v > 0")
    feed = str(tmp_path / "feed2")
    spark.createDataFrame([(2, -5)], "id long, v long").write.json(feed)
    q = (
        spark.readStream.schema("id long, v long").json(feed)
        .writeStream.format("deltalite")
        .option("path", table)
        .option("checkpointLocation", str(tmp_path / "ck_c"))
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="v_pos|CHECK"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise Exception(str(q.exception()))
    assert dl.read_table(spark, table).count() == 1  # nothing landed


def test_stream_range_with_only_metadata_commits(spark, table, tmp_path):
    """A trigger range containing ONLY compact commits plans zero
    input partitions and completes cleanly (no re-emit, no crash)."""
    register(spark)
    _mk(spark, table, 0, 200)
    ckpt = str(tmp_path / "ck_meta")
    out = str(tmp_path / "out_meta")

    def drain():
        q = (
            spark.readStream.format("deltalite").option("path", table).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    dl.compact(spark, table, num_files=1)  # the ONLY new commit
    drain()
    assert spark.read.parquet(out).count() == 200  # nothing re-emitted


def test_sink_constraint_violation_preserves_committed_shards(
    spark, table, tmp_path
):
    """REGRESSION (adversarial review catch): all of a query's batches
    stage shards in one dir — a violating batch's cleanup must unlink
    only ITS files, never rmtree the shared dir holding committed
    shards from earlier batches."""
    register(spark)
    feed = str(tmp_path / "feedr")
    good = os.path.join(feed, "a")
    spark.createDataFrame([(1, 5), (2, 6)], "id long, v long").write.json(good)
    ckpt = str(tmp_path / "ckr")

    def drain():
        q = (
            spark.readStream.schema("id long, v long").json(feed + "/*")
            .writeStream.format("deltalite").option("path", table)
            .option("appId", "shared-stage-test")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return q

    drain()  # batch 0 commits two good rows
    dl.add_check_constraint(spark, table, "v_pos", "v > 0")
    spark.createDataFrame([(3, -1)], "id long, v long").write.json(
        os.path.join(feed, "b")
    )
    try:
        drain()  # batch 1 violates
    except Exception:
        pass
    # the committed batch-0 rows MUST still read back
    assert sorted(r["id"] for r in dl.read_table(spark, table).collect()) == [1, 2]


def test_stream_change_feed_incremental_deletes(spark, table, tmp_path):
    """CDF stream: overlapping DV deletes emit only their increments;
    compact emits nothing; a restore's un-deletes come back as inserts."""
    register(spark)
    df = spark.range(0, 300).withColumn("v", F.col("id") * 2).repartition(2)
    dl.append(df, table)                                   # v0
    dl.delete_where(spark, table, [("id", "<", 50)])       # v1
    dl.delete_where(spark, table, [("id", "<", 80)])       # v2 (+30)
    dl.compact(spark, table, num_files=1)                  # v3 (nothing)
    dl.restore(table, 1)                                   # v4: un-delete 30
    q = (
        spark.readStream.format("deltalite").option("path", table)
        .option("readChangeFeed", "true").load()
        .groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory").queryName("cdf_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in spark.table("cdf_t").collect()
    }
    # v4 restore: back to v1's file set — the compacted file (300-50
    # rows) leaves (coarse delete), v1's original files + dv return
    # (coarse insert of their DV-surviving 250 rows)
    assert got[(0, "insert")] == 300
    assert got[(1, "delete")] == 50
    assert got[(2, "delete")] == 30
    assert (3, "delete") not in got and (3, "insert") not in got
    assert got[(4, "delete")] == 220   # compacted file's pre-image leaves
    assert got[(4, "insert")] == 250   # v1 snapshot returns (coarse diff)


def test_stream_starting_version(spark, table, tmp_path):
    """startingVersion skips history: only commits >= N feed the
    stream (the catch-up-from-checkpoint onboarding path)."""
    register(spark)
    _mk(spark, table, 0, 100)    # v0 (skipped)
    _mk(spark, table, 100, 160)  # v1
    q = (
        spark.readStream.format("deltalite").option("path", table)
        .option("startingVersion", "1").load()
        .writeStream.format("memory").queryName("lake_sv")
        .option("checkpointLocation", str(tmp_path / "ck_sv"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    ids = sorted(r["id"] for r in spark.table("lake_sv").collect())
    assert ids == list(range(100, 160))


def test_stream_constraint_commit_does_not_break_tail(spark, table, tmp_path):
    """ALTER-ADD-CONSTRAINT mid-stream is metadata-only: the tailing
    query must skip it, not raise as a 'change commit'."""
    register(spark)
    _mk(spark, table, 0, 50)
    ckpt = str(tmp_path / "ck_cc")
    out = str(tmp_path / "out_cc")

    def drain():
        q = (
            spark.readStream.format("deltalite").option("path", table).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    dl.add_check_constraint(spark, table, "v_pos", "v >= 0")
    _mk(spark, table, 50, 80)
    drain()
    assert spark.read.parquet(out).count() == 80


def test_batch_change_feed_via_format(spark, table):
    """Batch CDF: read.format('deltalite').option('readChangeFeed') over
    a version range equals the streaming feed's change sets."""
    register(spark)
    df = spark.range(0, 120).withColumn("v", F.col("id")).repartition(2)
    dl.append(df, table)                              # v0
    dl.delete_where(spark, table, [("id", "<", 20)])  # v1
    _mk(spark, table, 1000, 1010)                     # v2
    full = (
        spark.read.format("deltalite").option("path", table)
        .option("readChangeFeed", "true").load()
    )
    got = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in full.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {(0, "insert"): 120, (1, "delete"): 20, (2, "insert"): 10}
    ranged = (
        spark.read.format("deltalite").option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").option("endingVersion", "1").load()
    )
    assert ranged.count() == 20
    assert ranged.select("_change_type").distinct().first()[0] == "delete"

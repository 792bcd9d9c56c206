"""COPY INTO (deltalite.copy_into): idempotent bulk-file ingestion —
per-file exactly-once via log-recorded source paths, growing-directory
re-runs, checkpoint survival, and the double-load race guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


@pytest.fixture()
def landing(spark, tmp_path):
    d = tmp_path / "landing"
    for i in range(3):
        spark.createDataFrame([(i * 10 + j, f"s{i}") for j in range(10)],
                              "id int, src string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(d / f"batch{i}"))
    return d


def _glob(d):
    return str(d / "batch*" / "*.parquet")


def _ids(spark, t):
    return sorted(r["id"] for r in dl.read_table(spark, t)
                  .select("id").collect())


def test_copy_into_loads_once(spark, tmp_path, landing):
    t = str(tmp_path / "tbl")
    r1 = dl.copy_into(spark, t, _glob(landing))
    assert r1["files_loaded"] == 3 and r1["rows_loaded"] == 30
    # re-run: nothing new, no commit
    r2 = dl.copy_into(spark, t, _glob(landing))
    assert r2["files_loaded"] == 0 and r2["files_skipped"] == 3
    assert r2["version"] == r1["version"]
    assert _ids(spark, t) == list(range(30))


def test_growing_directory_incremental(spark, tmp_path, landing):
    t = str(tmp_path / "tbl")
    dl.copy_into(spark, t, _glob(landing))
    spark.createDataFrame([(100 + j, "s9") for j in range(5)],
                          "id int, src string") \
        .coalesce(1).write.parquet(str(landing / "batch9"))
    r = dl.copy_into(spark, t, _glob(landing))
    assert r["files_loaded"] == 1 and r["rows_loaded"] == 5
    assert len(_ids(spark, t)) == 35


def test_copy_sources_survive_checkpoint(spark, tmp_path, landing):
    t = str(tmp_path / "tbl")
    dl.copy_into(spark, t, _glob(landing), checkpoint_every=1)
    for _ in range(3):  # push a checkpoint past the copy commit
        dl.append(spark.createDataFrame([(999, "x")], "id int, src string"),
                  t, checkpoint_every=1)
    r = dl.copy_into(spark, t, _glob(landing), checkpoint_every=1)
    assert r["files_loaded"] == 0 and r["files_skipped"] == 3


def test_racing_copy_cannot_double_load(spark, tmp_path, landing):
    t = str(tmp_path / "tbl")
    base = dl.table_version(t)
    snap_files = sorted(
        os.path.abspath(f) for f in
        __import__("glob").glob(_glob(landing))
    )
    # winner loads normally
    dl.copy_into(spark, t, _glob(landing))
    # loser computed its skip-set against the pre-winner head: its
    # pinned commit must raise, never land a second copy of the files
    df = spark.read.parquet(*snap_files)
    adds = dl._write_data_files(df, t, 99, None, None)
    with pytest.raises(dl.ConcurrentWriteError, match="head moved"):
        dl._commit_retry(t, "copy_into", adds, [], df.schema.json(),
                         base, 10, copy_into=snap_files,
                         expect_head=base)
    assert len(_ids(spark, t)) == 30


def test_sql_copy_into(spark, tmp_path, landing):
    from pygdf_spark.sources.lakehouse_sql import sql

    t = str(tmp_path / "tbl")
    r = sql(spark, f"COPY INTO {t} FROM '{_glob(landing)}'")
    assert r["files_loaded"] == 3
    r = sql(spark, f"COPY INTO {t} FROM '{_glob(landing)}' "
                   f"FILEFORMAT = PARQUET")
    assert r["files_loaded"] == 0


def test_copy_into_respects_partition_spec(spark, tmp_path, landing):
    t = str(tmp_path / "tbl")
    dl.append(spark.createDataFrame([(-1, "s0")], "id int, src string"),
              t, partition_by=["src"])
    dl.copy_into(spark, t, _glob(landing))
    assert all(
        (a.get("partition") or {}).get("src")
        for a in dl.live_files(t)
    )
    assert len(_ids(spark, t)) == 31


def test_no_match_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no files match"):
        dl.copy_into(spark, str(tmp_path / "t"),
                     str(tmp_path / "nope" / "*.parquet"))

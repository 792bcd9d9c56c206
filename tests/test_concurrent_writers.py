"""deltalite multi-writer stress: N threads racing real commits through
one SparkSession (the closest a single process gets to N concurrent
jobs on a shared table).

What must hold (the serializability contract, not just 'no crash'):
- every append lands exactly once — final row count is the exact sum,
  versions are contiguous, no torn/partial commit is ever readable;
- racing REWRITE commits (compact vs compact) never double-apply or
  resurrect rows: losers raise ConcurrentWriteError, the table's
  logical content is invariant;
- a DV delete racing appends deletes exactly its predicate's rows from
  the files it derived from — appended rows all survive.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _frame(spark, writer: int, batch: int, rows: int = 20):
    return spark.range(rows).select(
        (F.lit(writer * 1_000_000 + batch * 1_000) + F.col("id"))
        .alias("k"),
        F.lit(writer).alias("writer"),
    )


def _run_threads(fns):
    errs: list[BaseException] = []

    def wrap(fn):
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 — collected for assert
            errs.append(e)

    ts = [threading.Thread(target=wrap, args=(fn,)) for fn in fns]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return errs


def test_concurrent_appends_all_land_exactly_once(spark, table):
    n_writers, n_batches, rows = 6, 4, 20

    def writer(w):
        def run():
            for b in range(n_batches):
                dl.append(_frame(spark, w, b, rows), table,
                          stat_cols=["k"])
        return run

    errs = _run_threads([writer(w) for w in range(n_writers)])
    assert errs == []  # appends are always-replayable: no writer loses
    assert dl.table_version(table) == n_writers * n_batches - 1
    got = dl.read_table(spark, table)
    assert got.count() == n_writers * n_batches * rows
    # exactly-once: no duplicated keys across retried publishes
    assert got.select("k").distinct().count() == got.count()
    ops = [h["operation"] for h in dl.history(table)]
    assert ops == ["append"] * (n_writers * n_batches)


def test_racing_compacts_one_wins_content_invariant(spark, table):
    for b in range(4):
        dl.append(_frame(spark, 0, b), table)
    before = sorted(r["k"] for r in dl.read_table(spark, table).collect())

    results: list = []

    def compactor():
        try:
            dl.compact(spark, table, num_files=1)
            results.append("ok")
        except dl.ConcurrentWriteError:
            results.append("conflict")

    errs = _run_threads([compactor] * 3)
    assert errs == []
    assert "ok" in results  # at least one rewrite landed
    after = sorted(r["k"] for r in dl.read_table(spark, table).collect())
    assert after == before  # compaction is a pure metadata swap


def test_dv_delete_racing_appends_scopes_exactly(spark, table):
    dl.append(_frame(spark, 0, 0, rows=50), table, stat_cols=["k"])

    deleted = {}

    def deleter():
        deleted["res"] = dl.delete_where(
            spark, table, [("k", "<", 10)], mode="dv"
        )

    def appender():
        for b in range(1, 4):
            dl.append(_frame(spark, 1, b, rows=10), table, stat_cols=["k"])

    errs = _run_threads([deleter, appender])
    assert errs == []
    assert deleted["res"]["rows_deleted"] == 10
    got = dl.read_table(spark, table)
    # the delete touched ONLY its derived-from files; all appends intact
    assert got.filter("writer = 1").count() == 30
    assert got.filter("writer = 0").count() == 40
    assert got.filter("k < 10").count() == 0

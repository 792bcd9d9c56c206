"""Partition evolution (set_partition_spec): Iceberg-style spec changes
as pure metadata commits, mixed-era layouts staying exactly readable,
and the HYBRID metadata/scan DML split over them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _frame(spark, lo, hi):
    return spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], ["x", "y"][i % 2], float(i))
         for i in range(lo, hi)],
        "id int, region string, tier string, v double",
    )


def _ids(spark, table, **kw):
    return sorted(
        r["id"]
        for r in dl.read_table(spark, table, **kw).select("id").collect()
    )


def test_evolve_unpartitioned_to_partitioned(spark, table):
    dl.append(_frame(spark, 0, 12), table)          # era 0: unpartitioned
    v = dl.set_partition_spec(table, ["region"])
    assert dl.table_partition_by(table) == ["region"]
    assert dl.table_partition_by(table, v - 1) is None  # at-version spec
    dl.append(_frame(spark, 12, 24), table)          # era 1: hive layout
    new = [a for a in dl.live_files(table) if "__p_region=" in a["path"]]
    old = [a for a in dl.live_files(table) if "__p_region=" not in a["path"]]
    assert new and old
    assert all(a.get("partition", {}).get("region") for a in new)
    assert _ids(spark, table) == list(range(24))
    # show_partitions: pre-spec files report null partition values
    parts = {r["region"]: r["n_rows"]
             for r in dl.show_partitions(spark, table).collect()}
    assert parts[None] == 12 and parts["a"] + parts["b"] + parts["c"] == 12


def test_hybrid_delete_metadata_plus_scan(spark, table):
    dl.append(_frame(spark, 0, 12), table)
    dl.set_partition_spec(table, ["region"])
    dl.append(_frame(spark, 12, 24), table)
    res = dl.delete_where(spark, table, [("region", "=", "b")], mode="dv")
    # 8 'b' rows total: 4 current-era (whole-file metadata drops) +
    # 4 pre-spec (deletion vectors) — one atomic commit
    assert res["rows_deleted"] == 8
    assert _ids(spark, table) == [i for i in range(24) if i % 3 != 1]
    # the current-era b-files are GONE from the log (metadata drop),
    # the pre-spec files carry DVs
    live = dl.live_files(table)
    assert not any(a.get("partition", {}).get("region") == "b" for a in live)
    assert any(a.get("dv") for a in live)


def test_hybrid_delete_rewrite_mode(spark, table):
    dl.append(_frame(spark, 0, 12), table)
    dl.set_partition_spec(table, ["region"])
    dl.append(_frame(spark, 12, 24), table)
    res = dl.delete_where(spark, table, [("region", "=", "a")],
                          mode="rewrite")
    assert res["rows_deleted"] == 8
    assert _ids(spark, table) == [i for i in range(24) if i % 3 != 0]


def test_delete_on_new_spec_column_across_eras(spark, table):
    # era 0 partitioned by region; evolve to tier; era 1 by tier. A
    # delete on the NEW spec column: era-1 files classify log-only
    # (single-valued tier), era-0 files are undecidable -> DV scan.
    dl.append(_frame(spark, 0, 12), table, partition_by=["region"])
    dl.set_partition_spec(table, ["tier"])
    dl.append(_frame(spark, 12, 24), table)
    res = dl.delete_where(spark, table, [("tier", "=", "x")], mode="dv")
    assert res["rows_deleted"] == 12
    assert _ids(spark, table) == [i for i in range(24) if i % 2 == 1]


def test_evolve_to_unpartitioned(spark, table):
    dl.append(_frame(spark, 0, 6), table, partition_by=["region"])
    dl.set_partition_spec(table, [])
    assert dl.table_partition_by(table) == []
    dl.append(_frame(spark, 6, 12), table)
    newest = max(dl.live_files(table), key=lambda a: a["path"])
    assert "__p_" not in newest["path"]
    assert _ids(spark, table) == list(range(12))


def test_compact_migrates_to_current_spec(spark, table):
    dl.append(_frame(spark, 0, 12), table)
    dl.set_partition_spec(table, ["region"])
    dl.compact(spark, table)
    assert all(
        a.get("partition", {}).get("region")
        for a in dl.live_files(table)
    )
    assert _ids(spark, table) == list(range(12))
    # post-migration, partition DML is pure metadata again
    res = dl.delete_where(spark, table, [("region", "=", "c")])
    assert res["rows_deleted"] == 4


def test_spec_change_guards(spark, table):
    dl.append(_frame(spark, 0, 6), table)
    with pytest.raises(KeyError, match="no such column"):
        dl.set_partition_spec(table, ["nope"])
    with pytest.raises(ValueError, match="not in partition_by"):
        dl.set_partition_spec(table, ["region"], {"other": "id % 2"})
    dl.rename_column(table, "tier", "grade")
    with pytest.raises(ValueError, match="renamed under column mapping"):
        dl.set_partition_spec(table, ["grade"])
    # a never-renamed column still works under an active mapping
    dl.set_partition_spec(table, ["region"])
    # explicit mismatched spec on a write names the evolution API
    with pytest.raises(ValueError, match="set_partition_spec"):
        dl.append(_frame(spark, 6, 8), table, partition_by=["id"])


def test_generated_partition_spec_evolution(spark, table):
    dl.append(_frame(spark, 0, 8), table)
    dl.set_partition_spec(table, ["bucket"], {"bucket": "id % 2"})
    dl.append(_frame(spark, 8, 16), table)
    newest = max(dl.live_files(table), key=lambda a: a["path"])
    assert "__p_bucket=" in newest["path"]
    assert _ids(spark, table) == list(range(16))


def test_time_travel_and_replace_where_across_eras(spark, table):
    dl.append(_frame(spark, 0, 12), table)
    v0 = dl.table_version(table)
    dl.set_partition_spec(table, ["region"])
    dl.append(_frame(spark, 12, 24), table)
    assert _ids(spark, table, version=v0) == list(range(12))
    # replaceWhere on the spec column: hybrid (metadata drop + rewrite)
    repl = _frame(spark, 100, 104).filter(F.col("region") == "b")
    res = dl.overwrite_where(spark, repl, table, [("region", "=", "b")])
    assert res["rows_deleted"] == 8
    got = _ids(spark, table)
    assert got == [i for i in range(24) if i % 3 != 1] + [100, 103]


def test_concurrent_spec_change_loses_loudly(spark, table):
    dl.append(_frame(spark, 0, 6), table)
    base = dl.table_version(table)
    dl.append(_frame(spark, 6, 8), table)  # head moves
    snap = dl._snapshot(table, base)
    with pytest.raises(dl.ConcurrentWriteError, match="head moved"):
        dl._commit_retry(
            table, "set partition spec", [], [], snap["schema"], base,
            10, partition_by=["region"], partition_exprs={},
            expect_head=base,
        )


def test_stale_append_cannot_revert_spec(spark, table):
    """The spec-revert fence: an append whose resolved spec predates a
    concurrent set_partition_spec must raise, not replay its stale
    header (which would silently undo the evolution)."""
    dl.append(_frame(spark, 0, 6), table, partition_by=["region"])
    base = dl.table_version(table)
    snap = dl._snapshot(table, base)
    dl.set_partition_spec(table, ["tier"])  # evolution lands first
    with pytest.raises(dl.ConcurrentWriteError, match="spec changed"):
        # replay a commit carrying the stale pre-evolution spec
        dl._commit_retry(
            table, "append", [], [], snap["schema"], base, 10,
            partition_by=["region"], partition_exprs={},
        )
    assert dl.table_partition_by(table) == ["tier"]


def test_generated_column_recomputed_on_mixed_era_rewrite(spark, table):
    """A compact after evolving to a GENERATED spec reads pre-spec rows
    whose generated column is NULL through the schema union — the
    writer must re-derive it (engine-computed, the Delta generated-
    columns contract), not land them in __HIVE_DEFAULT_PARTITION__."""
    dl.append(_frame(spark, 0, 12), table)
    dl.set_partition_spec(table, ["bucket"], {"bucket": "id % 2"})
    dl.append(_frame(spark, 12, 16), table)
    dl.compact(spark, table)
    vals = {(a.get("partition") or {}).get("bucket")
            for a in dl.live_files(table)}
    assert vals == {"0", "1"}
    assert _ids(spark, table) == list(range(16))
    # and a frame carrying a WRONG pre-filled generated value is
    # corrected by the engine derivation, never trusted
    bad = _frame(spark, 16, 18).withColumn("bucket", F.lit(7))
    dl.append(bad, table)
    assert not any(
        (a.get("partition") or {}).get("bucket") == "7"
        for a in dl.live_files(table)
    )

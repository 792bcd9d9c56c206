"""Partitioned deltalite tables: hive-style layout on duplicated
internal columns (real columns stay in the data files), per-file
partition values + single-valued stats in the log, metadata-only
DELETE / replaceWhere on partition predicates, and the copy-on-write
UPDATE verb."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, table, **kw):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i) * 1.5) for i in range(30)],
        "id int, region string, v double",
    )
    dl.append(df, table, partition_by=["region"], **kw)
    return df


def _ids(spark, table, **kw):
    return sorted(
        r["id"] for r in dl.read_table(spark, table, **kw).select("id").collect()
    )


def test_partitioned_roundtrip_schema_and_content(spark, table):
    df = _mk(spark, table)
    out = dl.read_table(spark, table)
    # no __p_ reconstruction leaks into the read schema
    assert out.columns == df.columns
    assert _ids(spark, table) == list(range(30))
    # hive layout on disk, one value per file, values recorded in log
    adds = dl.live_files(table)
    assert all("__p_region=" in a["path"] for a in adds)
    assert all(a["partition"]["region"] in ("a", "b", "c") for a in adds)
    # partition columns are auto-stats'd and single-valued
    for a in adds:
        s = a["stats"]["region"]
        assert s["min"] == s["max"] == a["partition"]["region"]
    assert dl.table_partition_by(table) == ["region"]


def test_spec_is_immutable_and_inherited(spark, table):
    _mk(spark, table)
    more = spark.createDataFrame([(100, "a", 1.0)], "id int, region string, v double")
    with pytest.raises(ValueError, match="set_partition_spec"):
        dl.append(more, table, partition_by=["id"])
    dl.append(more, table)  # inherits ["region"]
    newest = max(dl.live_files(table), key=lambda a: a["path"])
    assert newest["partition"] == {"region": "a"}
    # spec survives checkpoint replay
    for _ in range(3):
        dl.append(more, table, checkpoint_every=2)
    assert dl.table_partition_by(table) == ["region"]


def test_partition_scoped_delete_is_pure_metadata(spark, table, monkeypatch):
    _mk(spark, table)
    before = {a["path"] for a in dl.live_files(table)}

    def no_scan(*a, **k):  # the whole point: zero data read
        raise AssertionError("metadata-only delete must not scan data")

    monkeypatch.setattr(dl, "_read_adds", no_scan)
    res = dl.delete_where(spark, table, [("region", "=", "b")])
    monkeypatch.undo()
    assert res["rows_deleted"] == 10
    assert res["files_touched"] > 0
    after = {a["path"] for a in dl.live_files(table)}
    assert after < before  # pure removes, no new files
    assert _ids(spark, table) == sorted(
        i for i in range(30) if i % 3 != 1
    )
    # time travel still sees the deleted partition
    assert len(_ids(spark, table, version=0)) == 30


def test_partition_delete_range_and_noop(spark, table, monkeypatch):
    _mk(spark, table)
    monkeypatch.setattr(
        dl, "_read_adds",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scan")),
    )
    assert dl.delete_where(spark, table, [("region", ">", "b")])[
        "rows_deleted"] == 10  # 'c'
    assert dl.delete_where(spark, table, [("region", "=", "zz")])[
        "rows_deleted"] == 0


def test_non_partition_predicate_falls_back_to_scan(spark, table):
    _mk(spark, table)
    res = dl.delete_where(spark, table, [("region", "=", "a"), ("id", "<", 6)])
    assert res["rows_deleted"] == 2  # ids 0, 3
    assert _ids(spark, table) == sorted(set(range(30)) - {0, 3})


def test_partition_scoped_replace_where_is_metadata_plus_new(
    spark, table, monkeypatch
):
    _mk(spark, table)
    incoming = spark.createDataFrame(
        [(1000, "b", 0.5), (1001, "b", 0.6)], "id int, region string, v double"
    )
    real = dl._read_adds
    calls = {"n": 0}

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dl, "_read_adds", counting)
    res = dl.overwrite_where(spark, incoming, table, [("region", "=", "b")])
    assert calls["n"] == 0  # classification came from the log
    assert res["files_rewritten"] == 0  # no boundary files
    assert res["rows_deleted"] == 10
    assert _ids(spark, table) == sorted(
        [i for i in range(30) if i % 3 != 1] + [1000, 1001]
    )
    # the landed files follow the table's partition layout
    newest = [a for a in dl.live_files(table) if "1000" not in a["path"]]
    assert all("__p_region=" in a["path"] for a in dl.live_files(table))


def test_rewrites_preserve_partition_layout(spark, table):
    _mk(spark, table)
    dl.compact(spark, table, num_files=1)
    adds = dl.live_files(table)
    assert all("__p_region=" in a["path"] for a in adds)
    # still single-valued -> metadata fast path still fires post-compact
    res = dl.delete_where(spark, table, [("region", "=", "c")])
    assert res["rows_deleted"] == 10
    assert _ids(spark, table) == sorted(i for i in range(30) if i % 3 != 2)


def test_merge_on_partitioned_table(spark, table):
    _mk(spark, table)
    src = spark.createDataFrame(
        [(3, "a", -1.0), (500, "c", -2.0)], "id int, region string, v double"
    )
    dl.merge_into(spark, table, src, on="id", stat_cols=["id"])
    out = {r["id"]: r["v"] for r in dl.read_table(spark, table).collect()}
    assert out[3] == -1.0 and out[500] == -2.0 and len(out) == 31
    assert all("__p_region=" in a["path"] for a in dl.live_files(table))


def test_null_partition_value(spark, table):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id int, region string"
    )
    dl.append(df, table, partition_by=["region"])
    adds = dl.live_files(table)
    nulls = [a for a in adds if a["partition"]["region"] is None]
    assert nulls and sum(a["rows"] for a in nulls) == 2
    # '=' never matches NULL (SQL semantics): metadata delete of 'a'
    # must not touch the null partition, and a predicate on the null
    # partition's value deletes nothing
    assert dl.delete_where(spark, table, [("region", "=", "zz")])[
        "rows_deleted"] == 0
    res = dl.delete_where(spark, table, [("region", "=", "a")])
    assert res["rows_deleted"] == 1
    assert sorted(r["id"] for r in dl.read_table(spark, table).collect()) == [2, 3]
    # isnull predicate drops the null partition as metadata
    res = dl.delete_where(spark, table, [("region", "isnull", None)])
    assert res["rows_deleted"] == 2
    assert dl.read_table(spark, table).count() == 0


def test_partition_string_values_with_specials(spark, table):
    df = spark.createDataFrame(
        [(1, "us east/1"), (2, "eu=west 2")], "id int, region string"
    )
    dl.append(df, table, partition_by=["region"])
    adds = dl.live_files(table)
    assert sorted(a["partition"]["region"] for a in adds) == [
        "eu=west 2", "us east/1"
    ]
    res = dl.delete_where(spark, table, [("region", "=", "us east/1")])
    assert res["rows_deleted"] == 1
    assert [r["id"] for r in dl.read_table(spark, table).collect()] == [2]


def test_multi_column_partitioning(spark, table):
    df = spark.createDataFrame(
        [(i, i % 2, ["x", "y"][i % 2 == 0], float(i)) for i in range(12)],
        "id int, y int, m string, v double",
    )
    dl.append(df, table, partition_by=["y", "m"])
    adds = dl.live_files(table)
    assert all(set(a["partition"]) == {"y", "m"} for a in adds)
    res = dl.delete_where(spark, table, [("y", "=", 1), ("m", "=", "x")])
    assert res["rows_deleted"] == 6
    assert dl.read_table(spark, table).count() == 6


# ------------------------------------------------------------- UPDATE


def test_update_where_basic(spark, table):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id int, v double"
    )
    dl.append(df, table, stat_cols=["id"])
    res = dl.update_where(
        spark, table, [("id", ">=", 7)], {"v": "v * 10"}, stat_cols=["id"]
    )
    assert res["rows_updated"] == 3
    out = {r["id"]: r["v"] for r in dl.read_table(spark, table).collect()}
    assert out[7] == 70.0 and out[6] == 6.0 and len(out) == 10
    # time travel: pre-update values intact
    old = {r["id"]: r["v"]
           for r in dl.read_table(spark, table, version=0).collect()}
    assert old[7] == 7.0


def test_update_simultaneous_assignment_and_cast(spark, table):
    df = spark.createDataFrame([(1, 10, 20)], "id int, a int, b int")
    dl.append(df, table)
    dl.update_where(spark, table, "id = 1", {"a": "b", "b": "a"})
    row = dl.read_table(spark, table).collect()[0]
    assert (row["a"], row["b"]) == (20, 10)  # swap, not chain
    # SET expr casts back to the column's type (SQL UPDATE semantics)
    dl.update_where(spark, table, "id = 1", {"a": "a * 2.9"})
    row = dl.read_table(spark, table).collect()[0]
    assert row["a"] == 58 and isinstance(row["a"], int)


def test_update_touches_only_matching_files(spark, table):
    df = spark.range(100).withColumn("v", F.col("id").cast("double"))
    dl.append(df.repartitionByRange(4, "id"), table, stat_cols=["id"],
              cluster_by=["id"])
    n_before = len(dl.live_files(table))
    res = dl.update_where(spark, table, [("id", "=", 5)], {"v": "-1.0"},
                          stat_cols=["id"])
    assert res["rows_updated"] == 1
    assert res["files_rewritten"] == 1
    assert res["files_total"] == n_before
    out = dl.read_table(spark, table)
    assert out.filter("v = -1.0").count() == 1
    assert out.count() == 100


def test_update_null_predicate_rows_kept(spark, table):
    df = spark.createDataFrame(
        [(1, None), (2, 5)], "id int, k int"
    )
    dl.append(df, table)
    dl.update_where(spark, table, "k > 0", {"id": "id + 100"})
    out = sorted(r["id"] for r in dl.read_table(spark, table).collect())
    assert out == [1, 102]  # NULL-predicate row untouched


def test_update_rejects_new_columns_and_validates_constraints(spark, table):
    dl.append(spark.createDataFrame([(1,)], "x int"), table)
    with pytest.raises(ValueError, match="not in the table"):
        dl.update_where(spark, table, "x = 1", {"nope": "1"})
    dl.add_check_constraint(spark, table, "pos", "x > 0")
    with pytest.raises(ValueError, match="CHECK"):
        dl.update_where(spark, table, "x = 1", {"x": "-5"})
    assert dl.read_table(spark, table).collect()[0]["x"] == 1


def test_update_cdf_emits_pre_and_post_images(spark, table):
    dl.append(spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, v double"), table)
    v0 = dl.table_version(table)
    dl.update_where(spark, table, "id = 2", {"v": "v + 1"})
    feed = dl.table_changes(spark, table, v0, dl.table_version(table), key="id")
    rows = {(r["_change_type"], r["id"]): r["v"] for r in feed.collect()}
    assert rows[("update_preimage", 2)] == 20.0
    assert rows[("update_postimage", 2)] == 21.0
    assert ("update_preimage", 1) not in rows


def test_vacuum_reclaims_nested_partition_files(spark, table):
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(8)], "id int, region string"
    )
    dl.append(df, table, partition_by=["region"])
    dl.delete_where(spark, table, [("region", "=", "a")])  # metadata drop
    dl.compact(spark, table, num_files=1)
    deleted = dl.vacuum(table, keep_versions=1)
    # the dropped partition's nested files are actually reclaimed
    assert any("__p_region=a" in p for p in deleted)
    for p in deleted:
        assert not os.path.exists(os.path.join(table, p))
    # the live snapshot is untouched
    assert sorted(r["id"] for r in dl.read_table(spark, table).collect()) \
        == [1, 3, 5, 7]
    # emptied partition/commit dirs are pruned
    data_root = os.path.join(table, "data")
    for dirpath, dirs, names in os.walk(data_root):
        assert names or dirs, f"empty dir left behind: {dirpath}"


def test_datasource_reads_partitioned_table_with_dv(spark, table):
    """The Python DataSource batch reader must apply deletion vectors
    on NESTED partitioned paths (the DV sidecar keys positions on the
    log-relative path, which segment counting cannot recover once
    partition dirs nest)."""
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(10)], "id int, region string"
    )
    dl.append(df, table, partition_by=["region"])
    dl.delete_where(spark, table, [("id", "=", 4)], mode="dv")  # non-partition col
    out = spark.read.format("deltalite").option("path", table).load()
    assert sorted(r["id"] for r in out.collect()) == [
        0, 1, 2, 3, 5, 6, 7, 8, 9
    ]


def test_stream_reads_partitioned_appends(spark, table, tmp_path):
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    for lo in (0, 4):
        df = spark.createDataFrame(
            [(i, ["a", "b"][i % 2]) for i in range(lo, lo + 4)],
            "id int, region string",
        )
        dl.append(df, table, partition_by=["region"])
    q = (
        spark.readStream.format("deltalite").option("path", table).load()
        .writeStream.format("memory").queryName("part_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.sql("select * from part_stream").collect())
    assert got == list(range(8))


def test_stream_sink_lands_partitioned(spark, table, tmp_path, monkeypatch):
    """The native streaming sink writes hive-partitioned single-valued
    shards (inheriting the table spec, or creating it via the
    partitionBy option), so partition pruning and metadata-only DELETE
    work on stream-landed data too."""
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(30)],
        "id long, region string",
    ).write.json(feed)
    q = (
        spark.readStream.schema("id long, region string").json(feed)
        .writeStream.format("deltalite")
        .option("path", table).option("appId", "sink-part-test")
        .option("partitionBy", "region")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert dl.read_table(spark, table).count() == 30
    assert dl.table_partition_by(table) == ["region"]
    adds = dl.live_files(table)
    assert all("__p_region=" in a["path"] for a in adds)
    assert all(a["partition"]["region"] in ("a", "b", "c") for a in adds)
    assert all(a["rows"] > 0 for a in adds)
    # partition predicates prune stream-landed files from the log alone
    sel, total = dl.plan_files(table, predicate=[("region", "=", "a")])
    assert len(sel) < total
    # ... and partition DELETE is pure metadata (no scan)
    monkeypatch.setattr(
        dl, "_read_adds",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scan")),
    )
    assert dl.delete_where(spark, table, [("region", "=", "b")])[
        "rows_deleted"] == 10
    monkeypatch.undo()
    assert dl.read_table(spark, table).count() == 20
    # a later batch sink into the same table inherits the spec
    dl.append(spark.createDataFrame([(99, "a")], "id long, region string"),
              table)
    assert dl.table_partition_by(table) == ["region"]


def test_show_partitions_log_only(spark, table, monkeypatch):
    _mk(spark, table)
    monkeypatch.setattr(
        dl, "_read_adds",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scan")),
    )
    parts = {r["region"]: (r["n_files"], r["n_rows"])
             for r in dl.show_partitions(spark, table).collect()}
    monkeypatch.undo()
    assert set(parts) == {"a", "b", "c"}
    assert sum(n for _, n in parts.values()) == 30
    assert all(f >= 1 for f, _ in parts.values())
    with pytest.raises(ValueError, match="not partitioned"):
        dl.show_partitions(spark, str(table) + "_nope")


def test_compact_where_packs_only_the_hot_partition(spark, table):
    # many small files land in partition 'a' (streaming shape); 'b'/'c'
    # files must ride through untouched
    for i in range(4):
        dl.append(
            spark.createDataFrame(
                [(100 * i + j, "a", 1.0) for j in range(3)],
                "id int, region string, v double",
            ), table, partition_by=["region"],
        )
    dl.append(
        spark.createDataFrame(
            [(900, "b", 2.0), (901, "c", 3.0)], "id int, region string, v double"
        ), table,
    )
    untouched = {
        a["path"] for a in dl.live_files(table)
        if a["partition"]["region"] in ("b", "c")
    }
    res = dl.compact_where(spark, table, [("region", "=", "a")])
    assert res["files_compacted"] >= 4
    after = {a["path"] for a in dl.live_files(table)}
    assert untouched <= after  # cold partitions untouched
    a_files = [a for a in dl.live_files(table)
               if a["partition"]["region"] == "a"]
    assert len(a_files) < res["files_compacted"]
    assert dl.read_table(spark, table).count() == 14
    # still single-valued: metadata delete fires post-compact
    assert dl.delete_where(spark, table, [("region", "=", "a")])[
        "rows_deleted"] == 12


# ---------------------------------------- generated partition columns


def test_generated_partition_column(spark, table):
    """partition_exprs derives the partition column at write time for
    frames that lack it (Delta generated-columns partitioning); all
    partition machinery (pruning, metadata DELETE) then applies."""
    df = spark.createDataFrame(
        [(i, f"201{i % 3}-06-01") for i in range(12)],
        "id int, day string",
    ).withColumn("day", F.to_date("day"))
    dl.append(df, table, partition_by=["yr"],
              partition_exprs={"yr": "year(day)"})
    adds = dl.live_files(table)
    assert dl.table_partition_by(table) == ["yr"]
    assert dl.table_partition_exprs(table) == {"yr": "year(day)"}
    assert all(a["partition"]["yr"] in ("2010", "2011", "2012") for a in adds)
    # the derived column is materialized in the data
    assert "yr" in dl.read_table(spark, table).columns
    # later appends derive too (no yr in the incoming frame) ...
    dl.append(
        spark.createDataFrame([(100, "2012-01-01")], "id int, day string")
        .withColumn("day", F.to_date("day")), table,
    )
    assert dl.read_table(spark, table).filter("yr = 2012").count() == 5
    # ... and conflicting expressions are rejected
    with pytest.raises(ValueError, match="immutable"):
        dl.append(df, table, partition_by=["yr"],
                  partition_exprs={"yr": "year(day) + 1"})
    # metadata-only DELETE on the generated dimension
    res = dl.delete_where(spark, table, [("yr", "=", 2011)])
    assert res["rows_deleted"] == 4
    assert dl.read_table(spark, table).count() == 9
    # spec + exprs survive checkpointed replay
    for _ in range(3):
        dl.append(
            spark.createDataFrame([(200, "2010-02-02")], "id int, day string")
            .withColumn("day", F.to_date("day")), table, checkpoint_every=2,
        )
    assert dl.table_partition_exprs(table) == {"yr": "year(day)"}


def test_cdf_surfaces_metadata_partition_delete(spark, table):
    """A partition DELETE commits as remove-only metadata — the change
    feed must still surface the dropped rows as `delete` (the removed
    files' pre-images ARE the change set)."""
    _mk(spark, table)
    v0 = dl.table_version(table)
    dl.delete_where(spark, table, [("region", "=", "b")])
    feed = dl.table_changes(spark, table, v0, dl.table_version(table),
                            key="id")
    rows = feed.collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert sorted(r["id"] for r in rows) == sorted(
        i for i in range(30) if i % 3 == 1
    )


def test_restore_undoes_partition_delete(spark, table):
    _mk(spark, table)
    v0 = dl.table_version(table)
    dl.delete_where(spark, table, [("region", "=", "a")])
    assert dl.read_table(spark, table).count() == 20
    dl.restore(table, v0)
    assert dl.read_table(spark, table).count() == 30
    # spec intact after restore
    assert dl.table_partition_by(table) == ["region"]


def test_update_rederives_generated_partition_column(spark, table):
    """UPDATE on a generated column's SOURCE column re-derives the
    generated value and the row lands in its NEW partition (derived
    always wins; no stale partition values)."""
    df = spark.createDataFrame(
        [(1, "2010-03-01"), (2, "2011-03-01")], "id int, day string"
    ).withColumn("day", F.to_date("day"))
    dl.append(df, table, partition_by=["yr"],
              partition_exprs={"yr": "year(day)"})
    dl.update_where(spark, table, "id = 1", {"day": "date'2012-09-09'"})
    out = {r["id"]: (str(r["day"]), r["yr"])
           for r in dl.read_table(spark, table).collect()}
    assert out[1] == ("2012-09-09", 2012)
    assert out[2] == ("2011-03-01", 2011)
    # the moved row's file is single-valued in the new partition
    moved = [a for a in dl.live_files(table)
             if a["partition"]["yr"] == "2012"]
    assert moved and all(a["rows"] == 1 for a in moved)
    # metadata delete on the new partition finds it
    assert dl.delete_where(spark, table, [("yr", "=", 2012)])[
        "rows_deleted"] == 1


def test_veneer_roundtrip(spark, table):
    """gd.to_deltalite / gd.read_deltalite: the pandas-compat surface
    talks to the lakehouse directly (hidden row-id column stripped)."""
    import pygdf_spark as gd

    df = gd.from_spark(spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(8)], "id int, region string"
    ))
    v = gd.to_deltalite(df, table, partition_by=["region"])
    assert v == 0
    out = gd.read_deltalite(table, predicate=[("region", "=", "a")])
    assert sorted(r["id"] for r in out._sdf.collect()) == [0, 2, 4, 6]
    assert out.columns == ["id", "region"]
    v = gd.to_deltalite(df, table, mode="overwrite")
    assert gd.read_deltalite(table)._sdf.count() == 8
    assert gd.read_deltalite(table, version=0)._sdf.count() == 8

"""deltalite column mapping (metadata-only RENAME/DROP COLUMN) and
SHALLOW CLONE.

The 100 TB contract under test: rename_column / drop_column / clone
move ZERO data bytes (asserted on the file inventory), while every
read, DML, pruning, CDF, and streaming path keeps producing exactly
the right rows under the logical schema.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


def _data_files(table):
    out = []
    root = os.path.join(table, "data")
    for dirpath, _dirs, names in os.walk(root):
        out += [os.path.join(dirpath, n) for n in names
                if n.endswith(".parquet")]
    return sorted(out)


# ------------------------------------------------------------- rename


def test_rename_is_metadata_only_and_reads_translate(spark, sf_dir, table):
    src = _orders(spark, sf_dir)
    dl.append(src, table, stat_cols=["o_orderkey"])
    before = _data_files(table)
    v = dl.rename_column(table, "o_totalprice", "price")
    assert v == 1
    assert _data_files(table) == before  # zero data movement
    got = dl.read_table(spark, table)
    assert "price" in got.columns and "o_totalprice" not in got.columns
    assert (
        got.agg(F.sum("price")).first()[0]
        == src.agg(F.sum("o_totalprice")).first()[0]
    )
    # file bytes still carry the PHYSICAL name
    import pyarrow.parquet as pq

    assert "o_totalprice" in pq.ParquetFile(before[0]).schema_arrow.names


def test_rename_time_travel_and_restore(spark, sf_dir, table):
    src = _orders(spark, sf_dir)
    dl.append(src, table)
    dl.rename_column(table, "o_custkey", "customer")
    # pre-rename version surfaces the OLD logical name
    assert "o_custkey" in dl.read_table(spark, table, version=0).columns
    assert "customer" in dl.read_table(spark, table).columns
    # RESTORE past the rename restores the old name
    dl.restore(table, 0)
    assert "o_custkey" in dl.read_table(spark, table).columns


def test_rename_pruning_and_dml_on_logical_names(spark, sf_dir, table):
    src = _orders(spark, sf_dir)
    dl.append(src.repartition(4), table, stat_cols=["o_orderkey"],
              cluster_by=["o_orderkey"])
    dl.rename_column(table, "o_orderkey", "okey")
    keys = sorted(r[0] for r in src.select("o_orderkey").collect())
    lo = keys[0]
    # stats pruning on the LOGICAL name still bites (stats are physical)
    sel, total = dl.plan_files(table, predicate=[("okey", "=", lo)])
    assert 0 < len(sel) < total
    got = dl.read_table(spark, table, predicate=[("okey", "=", lo)])
    assert [r[0] for r in got.select("okey").collect()] == [lo]
    # DELETE (dv) on the logical name
    res = dl.delete_where(spark, table, [("okey", "=", lo)], mode="dv")
    assert res["rows_deleted"] == 1
    assert dl.read_table(spark, table).count() == len(keys) - 1
    # UPDATE on the logical name
    res = dl.update_where(
        spark, table, [("okey", "=", keys[1])], {"o_totalprice": "0.0"}
    )
    assert res["rows_updated"] == 1
    row = dl.read_table(
        spark, table, predicate=[("okey", "=", keys[1])]
    ).first()
    assert float(row["o_totalprice"]) == 0.0
    # MERGE on the logical key (stats prune path reads physical keys)
    upd = dl.read_table(spark, table).filter(F.col("okey") == keys[2]) \
        .withColumn("o_totalprice", F.lit(123.0))
    dl.merge_into(spark, table, upd, on="okey", stat_cols=["okey"])
    row = dl.read_table(
        spark, table, predicate=[("okey", "=", keys[2])]
    ).first()
    assert float(row["o_totalprice"]) == 123.0


def test_rename_guards(spark, sf_dir, table):
    src = _orders(spark, sf_dir)
    dl.append(src.withColumn("part", F.lit("a")), table,
              partition_by=["part"])
    dl.add_check_constraint(spark, table, "pos", "o_totalprice >= 0")
    with pytest.raises(ValueError, match="partition column"):
        dl.rename_column(table, "part", "p2")
    with pytest.raises(ValueError, match="CHECK constraint"):
        dl.rename_column(table, "o_totalprice", "price")
    with pytest.raises(KeyError):
        dl.rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        dl.rename_column(table, "o_custkey", "o_orderkey")


# --------------------------------------------------------------- drop


def test_drop_is_metadata_only_compact_purges(spark, sf_dir, table):
    import pyarrow.parquet as pq

    src = _orders(spark, sf_dir)
    dl.append(src, table)
    before = _data_files(table)
    dl.drop_column(table, "o_orderstatus")
    assert _data_files(table) == before
    got = dl.read_table(spark, table)
    assert "o_orderstatus" not in got.columns
    assert got.count() == src.count()
    # a rewrite physically purges the retired column (live files only —
    # the pre-compact bytes stay until vacuum)
    dl.compact(spark, table, num_files=1)
    for a in dl.live_files(table):
        f = os.path.join(table, a["path"])
        assert "o_orderstatus" not in pq.ParquetFile(f).schema_arrow.names


def test_dropped_column_never_resurfaces_on_readd(spark, sf_dir, table):
    src = _orders(spark, sf_dir)
    dl.append(src, table)
    dl.drop_column(table, "o_orderstatus")
    # re-add the same logical name with DIFFERENT content
    extra = src.limit(2).withColumn("o_orderstatus", F.lit("ZZ"))
    dl.append(extra, table)
    got = dl.read_table(spark, table)
    vals = {r[0] for r in got.select("o_orderstatus").collect()}
    # old files' dropped bytes must NOT bleed through: only the new
    # commit's value and NULL (for pre-drop rows) are visible
    assert vals == {"ZZ", None}
    # fresh physical name recorded in the mapping
    cm = dl.table_column_mapping(table)
    assert cm["map"]["o_orderstatus"] != "o_orderstatus"
    assert "o_orderstatus" in cm["retired"]


def test_drop_then_rename_interplay_and_cdf_guard(spark, sf_dir, table):
    src = _orders(spark, sf_dir)
    dl.append(src, table)
    v_rename = dl.rename_column(table, "o_orderstatus", "status")
    dl.append(
        src.limit(1).withColumnRenamed("o_orderstatus", "status"), table
    )
    # CDF inside the post-rename range works and carries logical names
    feed = dl.table_changes(spark, table, v_rename, dl.table_version(table))
    assert "status" in feed.columns
    assert feed.filter("_change_type = 'insert'").count() == 1
    # CDF across the rename boundary refuses loudly
    with pytest.raises(ValueError, match="rename_column/drop_column"):
        dl.table_changes(spark, table, -1, dl.table_version(table))


def test_streaming_datasource_reads_logical_names(spark, sf_dir, table):
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    src = _orders(spark, sf_dir)
    dl.append(src, table)
    dl.rename_column(table, "o_totalprice", "price")
    got = spark.read.format("deltalite").option("path", table).load()
    assert "price" in got.columns and "o_totalprice" not in got.columns
    assert got.count() == src.count()
    # post-drop: the batch DataSource projects the retired column away
    dl.drop_column(table, "o_orderstatus")
    got = spark.read.format("deltalite").option("path", table).load()
    assert "o_orderstatus" not in got.columns
    assert got.count() == src.count()


def test_append_with_old_name_after_rename_is_new_column(spark, sf_dir,
                                                         table):
    src = _orders(spark, sf_dir)
    dl.append(src, table)
    dl.rename_column(table, "o_totalprice", "price")
    # a writer still using the OLD name appends a NEW logical column —
    # it must get a fresh physical name, never alias the renamed bytes
    dl.append(src.limit(2).select("o_orderkey", "o_custkey",
                                  "o_orderstatus", "o_totalprice"), table)
    got = dl.read_table(spark, table)
    assert "price" in got.columns and "o_totalprice" in got.columns
    # old rows: price carries the original values, o_totalprice is null
    assert got.filter("price IS NOT NULL").count() == src.count()
    assert got.filter("o_totalprice IS NOT NULL").count() == 2
    cm = dl.table_column_mapping(table)
    assert cm["map"]["o_totalprice"] != "o_totalprice"


def test_stream_sink_stages_physical_names_and_pins_mapping(
    spark, sf_dir, table
):
    import pyarrow.parquet as pq
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from pygdf_spark.streaming.lake_source import DeltaliteStreamWriter

    src = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    dl.append(src, table, stat_cols=["o_orderkey"])
    dl.rename_column(table, "o_totalprice", "price")
    st = StructType([StructField("o_orderkey", LongType()),
                     StructField("price", DoubleType())])
    w = DeltaliteStreamWriter(table, st, "appA", ["o_orderkey"])
    msg = w.write(iter([(900001, 1.5), (900002, 2.5)]))
    w.commit([msg], 0)
    # file bytes carry the PHYSICAL name; reads surface the logical one
    rel = msg.shards[0][0]
    names = pq.ParquetFile(os.path.join(table, rel)).schema_arrow.names
    assert names == ["o_orderkey", "o_totalprice"]
    got = dl.read_table(spark, table)
    assert got.columns == ["o_orderkey", "price"]
    assert got.filter("o_orderkey >= 900000").count() == 2
    # a rename landing mid-stream refuses the batch (restart contract)
    w2 = DeltaliteStreamWriter(table, st, "appA", ["o_orderkey"])
    msg2 = w2.write(iter([(900003, 3.5)]))
    dl.rename_column(table, "price", "price2")
    with pytest.raises(dl.ConcurrentWriteError, match="restart"):
        w2.commit([msg2], 1)


# -------------------------------------------------------------- clone


def test_shallow_clone_zero_copy_and_divergence(spark, sf_dir, tmp_path):
    src_t = str(tmp_path / "src")
    dst_t = str(tmp_path / "dst")
    src = _orders(spark, sf_dir)
    dl.append(src, src_t, stat_cols=["o_orderkey"])
    dl.add_check_constraint(spark, src_t, "pos", "o_totalprice >= 0")
    dl.clone(src_t, dst_t)
    # zero copy: the clone owns NO data files
    assert _data_files(dst_t) == []
    assert dl.read_table(spark, dst_t).count() == src.count()
    assert dl.table_constraints(dst_t) == {"pos": "o_totalprice >= 0"}
    # stats pruning carried over (predicates prune from the cloned log)
    lo = src.agg(F.min("o_orderkey")).first()[0]
    sel, total = dl.plan_files(dst_t, predicate=[("o_orderkey", "=", lo)])
    assert len(sel) <= total
    # divergence: delete on the clone, source intact
    res = dl.delete_where(
        spark, dst_t, [("o_orderkey", "=", lo)], mode="rewrite"
    )
    assert res["rows_deleted"] == 1
    assert dl.read_table(spark, dst_t).count() == src.count() - 1
    assert dl.read_table(spark, src_t).count() == src.count()
    # and the other way: append to source, clone pinned at clone time
    dl.append(src.limit(3), src_t)
    assert dl.read_table(spark, dst_t).count() == src.count() - 1


def test_clone_dv_handling_and_vacuum_safety(spark, sf_dir, tmp_path):
    src_t = str(tmp_path / "src")
    dst_t = str(tmp_path / "dst")
    src = _orders(spark, sf_dir)
    keys = sorted(r[0] for r in src.select("o_orderkey").collect())
    dl.append(src, src_t, stat_cols=["o_orderkey"])
    # DV on the source BEFORE the clone: the clone must respect it
    dl.delete_where(spark, src_t, [("o_orderkey", "=", keys[0])], mode="dv")
    dl.clone(src_t, dst_t)
    assert dl.read_table(spark, dst_t).count() == len(keys) - 1
    # DV on the CLONE: consolidation against the cloned sidecar
    res = dl.delete_where(
        spark, dst_t, [("o_orderkey", "=", keys[1])], mode="dv"
    )
    assert res["rows_deleted"] == 1
    assert dl.read_table(spark, dst_t).count() == len(keys) - 2
    # the first delete's tombstone survived the consolidation
    assert dl.read_table(
        spark, dst_t, predicate=[("o_orderkey", "=", keys[0])]
    ).count() == 0
    # source unaffected by the clone's delete
    assert dl.read_table(spark, src_t).count() == len(keys) - 1
    # vacuum on the clone reclaims nothing of the source's
    n_src_before = len(_data_files(src_t))
    dl.vacuum(dst_t, keep_versions=1)
    assert len(_data_files(src_t)) == n_src_before
    assert dl.read_table(spark, src_t).count() == len(keys) - 1
    assert dl.read_table(spark, dst_t).count() == len(keys) - 2


def test_clone_merge_and_compact_localize(spark, sf_dir, tmp_path):
    src_t = str(tmp_path / "src")
    dst_t = str(tmp_path / "dst")
    src = _orders(spark, sf_dir)
    dl.append(src, src_t, stat_cols=["o_orderkey"], cluster_by=["o_orderkey"])
    dl.clone(src_t, dst_t)
    # MERGE into the clone: touch detection must map lineage → cloned
    # absolute paths (a miss would duplicate the matched keys)
    some = src.limit(4).withColumn("o_totalprice", F.lit(1.5))
    dl.merge_into(spark, dst_t, some, on="o_orderkey",
                  stat_cols=["o_orderkey"])
    got = dl.read_table(spark, dst_t)
    assert got.count() == src.count()  # upsert, no duplicates
    assert got.filter("o_totalprice = 1.5").count() == 4
    # compact localizes all remaining bytes into the clone
    dl.compact(spark, dst_t, num_files=1)
    assert len(_data_files(dst_t)) >= 1
    live = dl.live_files(dst_t)
    assert all(not os.path.isabs(a["path"]) for a in live)
    assert dl.read_table(spark, dst_t).count() == src.count()


def test_clone_datasource_read_applies_dv(spark, sf_dir, tmp_path):
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    src_t = str(tmp_path / "src")
    dst_t = str(tmp_path / "dst")
    src = _orders(spark, sf_dir)
    keys = sorted(r[0] for r in src.select("o_orderkey").collect())
    dl.append(src, src_t, stat_cols=["o_orderkey"])
    dl.delete_where(spark, src_t, [("o_orderkey", "=", keys[0])], mode="dv")
    dl.clone(src_t, dst_t)
    # the registered batch DataSource must apply the cloned DV (a
    # resurrected tombstone here means rel-key mismatch on clones)
    got = spark.read.format("deltalite").option("path", dst_t).load()
    assert got.count() == len(keys) - 1
    assert got.filter(F.col("o_orderkey") == keys[0]).count() == 0


def test_clone_of_clone_and_mapping_carryover(spark, sf_dir, tmp_path):
    a, b, c = (str(tmp_path / x) for x in "abc")
    src = _orders(spark, sf_dir)
    dl.append(src, a)
    dl.rename_column(a, "o_totalprice", "price")
    dl.clone(a, b)
    dl.clone(b, c)  # clone-of-clone still points at a's bytes
    assert _data_files(b) == [] and _data_files(c) == []
    got = dl.read_table(spark, c)
    assert "price" in got.columns
    assert got.count() == src.count()
    with pytest.raises(FileExistsError):
        dl.clone(a, b)


# ------------------------------------------- merge WHEN MATCHED UPDATE


def test_merge_update_set_exprs(spark, sf_dir, tmp_path):
    table = str(tmp_path / "mu")
    src = _orders(spark, sf_dir)
    keys = sorted(r[0] for r in src.select("o_orderkey").collect())
    dl.append(src.repartition(4), table,
              stat_cols=["o_orderkey"], cluster_by=["o_orderkey"])
    # narrow CDC source: key + a delta column, pure UPDATE (no insert)
    delta = spark.createDataFrame(
        [(keys[0], 100.0), (keys[1], 200.0)], "o_orderkey long, dp double"
    )
    res = dl.merge_into(
        spark, table, delta, on="o_orderkey", stat_cols=["o_orderkey"],
        when_matched="update",
        set_exprs={"o_totalprice": "o_totalprice + src_dp"},
        insert_unmatched=False,
    )
    assert 0 < res["files_rewritten"] < res["files_total"]
    got = dl.read_table(spark, table)
    assert got.count() == len(keys)  # no inserts, no duplication
    orig = {r[0]: r[1] for r in
            src.select("o_orderkey", "o_totalprice").collect()}
    now = {r[0]: r[1] for r in
           got.select("o_orderkey", "o_totalprice").collect()}
    assert now[keys[0]] == orig[keys[0]] + 100.0
    assert now[keys[1]] == orig[keys[1]] + 200.0
    assert now[keys[2]] == orig[keys[2]]  # unmatched rode through


def test_merge_update_with_insert_and_guards(spark, sf_dir, tmp_path):
    table = str(tmp_path / "mui")
    src = _orders(spark, sf_dir)
    dl.append(src, table, stat_cols=["o_orderkey"])
    lo = src.agg(F.min("o_orderkey")).first()[0]
    full = src.limit(1).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey", "o_totalprice", "o_orderstatus",
    ).unionByName(src.filter(F.col("o_orderkey") == lo))
    res = dl.merge_into(
        spark, table, full, on="o_orderkey", stat_cols=["o_orderkey"],
        when_matched="update",
        set_exprs={"o_orderstatus": "lower(src_o_orderstatus)"},
    )
    got = dl.read_table(spark, table)
    assert got.count() == src.count() + 1  # one insert
    assert res["files_rewritten"] >= 1
    row = got.filter(F.col("o_orderkey") == lo).first()
    assert row["o_orderstatus"] == row["o_orderstatus"].lower()
    # guards: SET on key, duplicate source keys, missing set_exprs
    with pytest.raises(ValueError, match="key columns"):
        dl.merge_into(spark, table, full, on="o_orderkey",
                      when_matched="update",
                      set_exprs={"o_orderkey": "1"})
    dup = full.unionByName(full)
    with pytest.raises(ValueError, match="unique"):
        dl.merge_into(spark, table, dup, on="o_orderkey",
                      when_matched="update",
                      set_exprs={"o_totalprice": "0.0"})
    with pytest.raises(ValueError, match="requires set_exprs"):
        dl.merge_into(spark, table, full, on="o_orderkey",
                      when_matched="update")


# ------------------------------------------------- protocol gating


def test_protocol_feature_fence(spark, sf_dir, tmp_path):
    table = str(tmp_path / "proto")
    src = _orders(spark, sf_dir)
    dl.append(src, table)
    # declaring features this build knows: everything keeps working
    dl.set_protocol(table, reader_features=["deletionVectors",
                                            "columnMapping"],
                    writer_features=["deletionVectors"])
    assert dl.read_table(spark, table).count() == src.count()
    dl.append(src.limit(1), table)
    assert dl.table_protocol(table)["reader_features"] == [
        "columnMapping", "deletionVectors"]
    # this build refuses to fence itself with unknown names
    with pytest.raises(ValueError, match="unknown to this build"):
        dl.set_protocol(table, reader_features=["futureV9"])
    # a FUTURE writer's commit declaring an unknown WRITER feature:
    # reads keep working, writes refuse
    v = dl.table_version(table) + 1
    dl._publish(table, v, [{"commit": {
        "version": v, "operation": "set_protocol",
        "schema": dl._snapshot(table, v - 1)["schema"],
        "protocol": {"reader_features": [],
                     "writer_features": ["futureWriterX"]},
    }}])
    assert dl.read_table(spark, table).count() == src.count() + 1
    with pytest.raises(RuntimeError, match="futureWriterX"):
        dl.append(src.limit(1), table)
    # an unknown READER feature fences reads too (refusing to mis-read)
    v = dl.table_version(table) + 1
    dl._publish(table, v, [{"commit": {
        "version": v, "operation": "set_protocol",
        "schema": dl._snapshot(table, v - 1)["schema"],
        "protocol": {"reader_features": ["futureReaderY"],
                     "writer_features": []},
    }}])
    with pytest.raises(RuntimeError, match="futureReaderY"):
        dl.read_table(spark, table)
    with pytest.raises(RuntimeError, match="futureReaderY"):
        dl.table_changes(spark, table, 0, dl.table_version(table))

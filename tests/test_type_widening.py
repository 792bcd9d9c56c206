"""deltalite type widening (metadata-only ALTER COLUMN TYPE).

Contract: widening moves zero data; narrow-era files upcast at scan
time under the declared wide schema (Spark's native parquet promotion
on the JVM path, explicit Arrow casts on the DataSource path); a
narrow append after the widen can never regress the declared type;
narrowing and cross-family changes are refused.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _narrow(spark, n=4, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).cast("int").alias("x"),
        (F.col("id") * 1.5).cast("float").alias("f"),
    )


def _wide(spark, n=3, start=100):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 + 3_000_000_000).cast("long").alias("x"),
        (F.col("id") * 2.5).cast("double").alias("f"),
    )


def test_widen_is_metadata_only_and_mixed_eras_read(spark, table):
    dl.append(_narrow(spark), table, stat_cols=["k"])
    files_before = {a["path"] for a in dl.live_files(table)}
    dl.widen_column(table, "x", "long")
    dl.widen_column(table, "f", "double")
    assert {a["path"] for a in dl.live_files(table)} == files_before
    got = dl.read_table(spark, table)
    assert dict(got.dtypes)["x"] == "bigint"
    assert dict(got.dtypes)["f"] == "double"
    assert sorted(r["x"] for r in got.collect()) == [0, 7, 14, 21]
    # wide append: values beyond int range land next to narrow files
    dl.append(_wide(spark), table, stat_cols=["k"])
    got = dl.read_table(spark, table)
    assert got.count() == 7
    assert got.filter(F.col("x") > 2_000_000_000).count() == 3
    # time travel to the pre-widen version surfaces the NARROW type
    assert dict(dl.read_table(spark, table, version=0).dtypes)["x"] == "int"


def test_narrow_append_cannot_regress_declared_type(spark, table):
    dl.append(_narrow(spark), table, stat_cols=["k"])
    dl.widen_column(table, "x", "long")
    dl.append(_narrow(spark, n=2, start=50), table, stat_cols=["k"])
    got = dl.read_table(spark, table)
    assert dict(got.dtypes)["x"] == "bigint"
    assert got.count() == 6


def test_widen_guards(spark, table):
    dl.append(_narrow(spark).withColumn("p", F.lit("a")), table,
              partition_by=["p"])
    with pytest.raises(ValueError, match="not a lossless widening"):
        dl.widen_column(table, "x", "short")  # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        dl.widen_column(table, "x", "double")  # cross-family
    with pytest.raises(ValueError, match="partition column"):
        dl.widen_column(table, "p", "long")
    with pytest.raises(KeyError):
        dl.widen_column(table, "nope", "long")


def test_widen_interops_with_rename_dv_compact_clone(spark, table,
                                                     tmp_path):
    dl.append(_narrow(spark, n=6), table, stat_cols=["k"])
    dl.widen_column(table, "x", "long")
    dl.rename_column(table, "x", "xx")  # widening keyed physical
    got = dl.read_table(spark, table)
    assert dict(got.dtypes)["xx"] == "bigint"
    # DV delete over the widened+renamed table (explicit-schema scan)
    res = dl.delete_where(spark, table, [("k", "=", 2)], mode="dv")
    assert res["rows_deleted"] == 1
    assert dl.read_table(spark, table).count() == 5
    # merge-on-read + rewrite paths under the wide schema
    dl.compact(spark, table, num_files=1, stat_cols=["k"])
    got = dl.read_table(spark, table)
    assert dict(got.dtypes)["xx"] == "bigint"
    assert got.count() == 5
    # clone carries the widening
    clone_t = str(tmp_path / "cl")
    dl.clone(table, clone_t)
    assert dict(dl.read_table(spark, clone_t).dtypes)["xx"] == "bigint"
    # restore past the widen restores the narrow declared type
    dl.restore(table, 0)
    assert dict(dl.read_table(spark, table).dtypes)["x"] == "int"


def test_datasource_batch_read_casts_narrow_eras(spark, table):
    from pygdf_spark.streaming.lake_source import register

    register(spark)
    dl.append(_narrow(spark), table, stat_cols=["k"])
    dl.widen_column(table, "x", "long")
    dl.append(_wide(spark), table, stat_cols=["k"])
    got = spark.read.format("deltalite").option("path", table).load()
    assert dict(got.dtypes)["x"] == "bigint"
    assert got.count() == 7
    assert got.agg(F.max("x")).first()[0] > 2_000_000_000


# ---------------------------------------------------------- maintain()


def test_maintain_policies_fire_and_hold(spark, table):
    # many small files + a heavy DV load → both policies fire
    for b in range(5):
        dl.append(_narrow(spark, n=10, start=b * 10), table,
                  stat_cols=["k"])
    dl.delete_where(spark, table, [("k", "<", 20)], mode="dv")
    res = dl.maintain(spark, table, min_small_files=4,
                      max_dv_fraction=0.2, keep_versions=1,
                      stat_cols=["k"])
    assert res["compacted"] >= 4
    assert res["vacuumed"] > 0
    got = dl.read_table(spark, table)
    assert got.count() == 30
    assert got.filter("k < 20").count() == 0
    # post-maintenance: no DVs outstanding, no small-file pileup
    assert not any(a.get("dv") for a in dl.live_files(table))
    # a healthy table: nothing fires
    res2 = dl.maintain(spark, table, min_small_files=4,
                       max_dv_fraction=0.2, keep_versions=50)
    assert res2 == {"compacted": 0, "purged": 0, "vacuumed": 0}

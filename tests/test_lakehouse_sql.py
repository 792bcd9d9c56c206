"""Delta-style SQL statement surface (sources/lakehouse_sql.py): every
statement dispatches onto the transaction protocol with the same
semantics as the Python API — incl. predicate compilation to
stats-prunable tuples and complex-WHERE fallbacks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl
from pygdf_spark.sources.lakehouse_sql import _parse_where, sql


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i) * 2) for i in range(30)],
        "id int, region string, v double",
    )
    dl.append(df, t, stat_cols=["id"])
    return t


def _ids(spark, t, **kw):
    return sorted(r["id"] for r in dl.read_table(spark, t, **kw)
                  .select("id").collect())


def test_parse_where_tuples_and_fallback():
    assert _parse_where("id = 3 AND region = 'a''b'") == [
        ("id", "=", 3), ("region", "=", "a'b")
    ]
    assert _parse_where("v >= 1.5") == [("v", ">=", 1.5)]
    assert _parse_where("region IS NOT NULL") == [("region", "notnull", None)]
    # complex clauses fall back to the raw expression (full scan)
    assert _parse_where("id = 3 OR id = 4") == "id = 3 OR id = 4"
    assert _parse_where("length(region) > 1") == "length(region) > 1"


def test_select_where_and_projection(spark, table):
    out = sql(spark, f"SELECT id, v FROM {table} WHERE id < 5 AND id >= 2")
    assert out.columns == ["id", "v"]
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]
    # complex WHERE: post-read filter, same rows
    out2 = sql(spark, f"SELECT id FROM {table} WHERE id = 2 OR id = 4")
    assert sorted(r["id"] for r in out2.collect()) == [2, 4]


def test_delete_update_insert_roundtrip(spark, table):
    res = sql(spark, f"DELETE FROM {table} WHERE region = 'b'")
    assert res["rows_deleted"] == 10
    res = sql(spark, f"UPDATE {table} SET v = v + 100 WHERE id < 3")
    assert res["rows_updated"] == 2  # ids 0, 2 survive (1 was 'b')
    got = {r["id"]: r["v"] for r in dl.read_table(spark, table).collect()}
    assert got[0] == 100.0 and got[2] == 104.0 and got[3] == 6.0
    spark.createDataFrame([(100, "z", 1.0)], "id int, region string, v double") \
        .createOrReplaceTempView("new_rows")
    sql(spark, f"INSERT INTO {table} SELECT * FROM new_rows")
    assert 100 in _ids(spark, table)


def test_time_travel_select(spark, table):
    sql(spark, f"DELETE FROM {table} WHERE id >= 10")
    v = dl.table_version(table)
    assert len(_ids(spark, table)) == 10
    old = sql(spark, f"SELECT * FROM {table} VERSION AS OF {v - 1}")
    assert old.count() == 30


def test_optimize_vacuum_history(spark, table):
    sql(spark, f"INSERT INTO {table} SELECT 200 AS id, 'q' AS region, "
               f"9.0 AS v")
    r = sql(spark, f"OPTIMIZE {table}")
    assert r["files_compacted"] >= 2
    hist = sql(spark, f"DESCRIBE HISTORY {table}")
    assert "compact" in [row["operation"] for row in hist.collect()]
    deleted = sql(spark, f"VACUUM {table} RETAIN 1 VERSIONS")
    assert isinstance(deleted, list) and deleted
    assert len(_ids(spark, table)) == 31


def test_optimize_zorder(spark, table):
    v = sql(spark, f"OPTIMIZE {table} ZORDER BY (id, v)")
    assert v == dl.table_version(table)
    assert len(_ids(spark, table)) == 30


def test_alter_table_family(spark, table):
    sql(spark, f"ALTER TABLE {table} RENAME COLUMN v TO amount")
    assert "amount" in dl.read_table(spark, table).columns
    sql(spark, f"ALTER TABLE {table} ALTER COLUMN id TYPE bigint")
    assert dict(dl.read_table(spark, table).dtypes)["id"] == "bigint"
    sql(spark, f"ALTER TABLE {table} ADD CONSTRAINT pos CHECK (amount >= 0)")
    with pytest.raises(ValueError, match="CHECK"):
        dl.append(
            spark.createDataFrame([(7, "x", -1.0)],
                                  "id long, region string, amount double"),
            table,
        )
    sql(spark, f"ALTER TABLE {table} DROP CONSTRAINT pos")
    sql(spark, f"ALTER TABLE {table} DROP COLUMN region")
    assert dl.read_table(spark, table).columns == ["id", "amount"]


def test_partition_spec_show_restore(spark, table):
    sql(spark, f"ALTER TABLE {table} SET PARTITION SPEC (region)")
    sql(spark, f"INSERT INTO {table} SELECT 500 AS id, 'a' AS region, "
               f"1.0 AS v")
    parts = sql(spark, f"SHOW PARTITIONS {table}")
    assert {r["region"] for r in parts.collect()} >= {"a", None}
    v = dl.table_version(table)
    sql(spark, f"DELETE FROM {table} WHERE id >= 0")
    sql(spark, f"RESTORE TABLE {table} TO VERSION AS OF {v}")
    assert len(_ids(spark, table)) == 31


def test_catalog_resolution_and_errors(spark, table):
    out = sql(spark, "SELECT * FROM corpus WHERE id = 1",
              catalog={"corpus": table})
    assert out.count() == 1
    with pytest.raises(ValueError, match="unsupported lakehouse"):
        sql(spark, "TRUNCATE TABLE x")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        sql(spark, f"ALTER TABLE {table} SET TBLPROPERTIES (a=1)")
    with pytest.raises(ValueError, match="simple conjunction"):
        sql(spark, f"OPTIMIZE {table} WHERE id = 1 OR id = 2")


def test_describe_detail(spark, table):
    out = sql(spark, f"DESCRIBE DETAIL {table}")
    row = out.collect()[0]
    assert row["format"] == "deltalite" and row["num_rows"] == 30
    assert row["rows_exact"] is True and row["partition_columns"] == ""

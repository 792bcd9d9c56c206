"""datasets.timeseries / randomdata (reference datasets.py:11,60):
shape, dtypes, determinism, distribution sanity, and the scale
contract (pure expressions over spark.range — no Python UDF, no
driver materialization)."""

import math

import pytest

import pygdf_spark as gd


def _vals(df):
    return df._sdf.select(*df.columns).collect()


def test_randomdata_defaults(spark):
    df = gd.datasets.randomdata(spark, nrows=1000, seed=7)
    assert list(df.columns) == ["id", "x", "y"]
    sdf = df._sdf.select("id", "x", "y")
    assert dict(sdf.dtypes) == {"id": "bigint", "x": "double", "y": "double"}
    rows = sdf.collect()
    assert len(rows) == 1000
    xs = [r["x"] for r in rows]
    ids = [r["id"] for r in rows]
    assert all(-1.0 <= v < 1.0 for v in xs)
    # Poisson(1000)-approx: mean within 5 sigma of 1000
    mean = sum(ids) / len(ids)
    assert abs(mean - 1000.0) < 5 * math.sqrt(1000.0 / len(ids))
    assert all(v >= 0 for v in ids)


def test_randomdata_deterministic_and_seed_sensitive(spark):
    a = _vals(gd.datasets.randomdata(spark, nrows=50, seed=1))
    b = _vals(gd.datasets.randomdata(spark, nrows=50, seed=1))
    c = _vals(gd.datasets.randomdata(spark, nrows=50, seed=2))
    assert a == b
    assert a != c


def test_randomdata_string_and_category(spark):
    df = gd.datasets.randomdata(
        spark, nrows=300, dtypes={"name": "category", "tag": str}, seed=3
    )
    rows = df._sdf.collect()
    from pygdf_spark.datasets import _NAMES

    assert all(r["name"] in _NAMES for r in rows)
    assert all(r["tag"] in _NAMES for r in rows)
    # uniform choice: with 300 draws over 26 names, expect wide support
    assert len({r["name"] for r in rows}) > 15


def test_randomdata_bad_dtype(spark):
    with pytest.raises(TypeError, match="No generator"):
        gd.datasets.randomdata(spark, dtypes={"z": complex})


def test_timeseries_grid(spark):
    df = gd.datasets.timeseries(
        spark, start="2000-01-01", end="2000-01-01 00:01:00", freq="2s", seed=0
    )
    assert list(df.columns) == ["timestamp", "id", "name", "x", "y"]
    rows = sorted(_vals(df), key=lambda r: r["timestamp"])
    # [start, end): 60s / 2s = 30 ticks, end excluded
    assert len(rows) == 30
    assert str(rows[0]["timestamp"]) == "2000-01-01 00:00:00"
    assert str(rows[-1]["timestamp"]) == "2000-01-01 00:00:58"
    deltas = {
        (rows[i + 1]["timestamp"] - rows[i]["timestamp"]).total_seconds()
        for i in range(len(rows) - 1)
    }
    assert deltas == {2.0}


def test_timeseries_nonaligned_end(spark):
    # 7s span at 2s freq -> ticks at 0,2,4,6 (ceil division keeps the
    # partial last interval's tick, end stays exclusive)
    df = gd.datasets.timeseries(
        spark, start="2000-01-01", end="2000-01-01 00:00:07", freq="2s",
        dtypes={"x": float},
    )
    assert df._sdf.count() == 4


def test_timeseries_scale_contract(spark):
    """Plan must be a single range scan in codegen: no Python UDF, no
    exchange — the 100 TB posture for synthetic data generation."""
    df = gd.datasets.timeseries(
        spark, start="2000-01-01", end="2000-01-02", freq="1s", seed=5
    )
    plan = (
        df._sdf.select(*df.columns)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Range" in plan
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


def test_randomdata_object_dtype(spark):
    """reference datasets make map includes object -> make_string."""
    import pygdf_spark.datasets as ds

    out = ds.randomdata(spark, nrows=4, dtypes={"label": object}).to_pandas()
    assert out["label"].map(type).eq(str).all()


def test_timeseries_nulls_frequency_deterministic(spark):
    import pygdf_spark.datasets as ds

    a = ds.timeseries(spark, "2000-01-01", "2000-01-02", freq="1h",
                      nulls_frequency=0.3, seed=7).to_pandas()
    b = ds.timeseries(spark, "2000-01-01", "2000-01-02", freq="1h",
                      nulls_frequency=0.3, seed=7).to_pandas()
    assert a.equals(b)
    assert a["x"].isna().sum() > 0 and a["name"].isna().sum() > 0
    assert a["timestamp"].notna().all()  # ticks never nulled


def test_timeseries_calendar_freq(spark):
    import pygdf_spark.datasets as ds

    out = ds.timeseries(spark, "2000-01-15 06:30:00", "2001-01-15",
                        freq="MS", dtypes={"x": float}).to_pandas()
    assert len(out) == 12
    assert str(out["timestamp"].iloc[1]) == "2000-02-15 06:30:00"
    q = ds.timeseries(spark, "2000-01-01", "2002-01-01", freq="2QS",
                      dtypes={"x": float}).to_pandas()
    assert len(q) == 4


def test_datasets_sessionless_call(spark):
    """r4 advice: reference signature allows calling without a session
    (datasets.timeseries(start=..., end=...)); spark defaults to
    get_spark(). The session fixture already created the singleton, so
    the fallback picks it up instead of building a new one."""
    import pygdf_spark.datasets as ds

    out = ds.timeseries(start="2000-01-01", end="2000-01-01 00:00:05",
                        freq="1s", dtypes={"x": float}).to_pandas()
    assert len(out) == 5
    r = ds.randomdata(nrows=3, seed=1).to_pandas()
    assert len(r) == 3 and set(r.columns) == {"id", "x", "y"}

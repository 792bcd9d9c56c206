"""pandas-oracle tests for the Series veneer + .str/.dt accessors."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pygdf_spark.core import from_spark


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "s": ["Hello World", "spark SQL", None, "  pad  ", "abc123"],
        "x": [1, 2, 3, 4, 5],
        "d": pd.to_datetime([
            "2020-02-29 10:30:00", "2021-07-04 00:00:00", "2022-12-31 23:59:59",
            "2023-01-01 01:02:03", "2024-06-15 12:00:00",
        ]),
    })


@pytest.fixture(scope="module")
def gdf(spark, pdf):
    return from_spark(spark.createDataFrame(pdf))


def test_series_reductions(gdf, pdf):
    assert gdf["x"].sum() == pdf.x.sum()
    assert gdf["x"].mean() == pdf.x.mean()
    assert gdf["x"].min() == pdf.x.min()
    assert gdf["x"].max() == pdf.x.max()
    assert gdf["x"].count() == len(pdf)
    assert gdf["x"].nunique() == pdf.x.nunique()


def test_series_exprs_filter(gdf, pdf):
    got = gdf[gdf["x"] > 3].to_pandas()
    assert list(got.x) == [4, 5]
    got2 = gdf.assign(y=gdf["x"] * 2 + 1).to_pandas()
    assert list(got2.y) == list(pdf.x * 2 + 1)


def test_series_unique_value_counts(gdf, pdf):
    assert gdf["x"].unique() == sorted(pdf.x.unique())
    vc = gdf["s"].value_counts().to_pandas()
    assert vc["count"].tolist() == [1, 1, 1, 1]  # dropna=True default
    assert len(gdf["s"].value_counts(dropna=False).to_pandas()) == 5


def test_series_corr_cov_prod_mode(spark):
    p = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": [2.0, 4.0, 5.0, 9.0],
                      "m": [1, 2, 2, 3]})
    g = from_spark(spark.createDataFrame(p))
    assert abs(g["a"].corr("b") - p.a.corr(p.b)) < 1e-12
    assert abs(g["a"].cov("b") - p.a.cov(p.b)) < 1e-12
    assert g["a"].prod() == p.a.prod()
    assert g["m"].mode() == 2  # pandas mode head


def test_str_accessor(gdf, pdf):
    got = gdf.assign(
        lo=gdf["s"].str.lower(),
        n=gdf["s"].str.len(),
        has=gdf["s"].str.contains("o", regex=False),
        st=gdf["s"].str.strip(),
    ).to_pandas()
    exp_lo = pdf.s.str.lower()
    exp_n = pdf.s.str.len()
    assert list(got.lo) == [v if pd.notna(v) else None for v in exp_lo]
    assert [int(v) for v in got.n if pd.notna(v)] == [int(v) for v in exp_n.dropna()]
    assert list(got.st)[3] == "pad"
    assert bool(got.has[0]) is True and bool(got.has[4]) is False


def test_str_rsplit_family(gdf, pdf):
    """rsplit/rpartition/center/insert/istimestamp/character_tokenize/
    detokenize, pinned against pandas str semantics on the non-null rows."""
    from pyspark.sql import functions as F

    got = gdf.assign(
        last=gdf["s"].str.rsplit(" ", 2).getItem(1),
        rp_tail=gdf["s"].str.rpartition(" ").getField("tail"),
        ctr=gdf["s"].str.center(13, "*"),
        ins=gdf["s"].str.insert(3, "__"),
        n_ch=F.size(gdf["s"].str.character_tokenize()),
    ).to_pandas().set_index("s")
    # "Hello World" → rsplit last piece / rpartition tail = "World"
    assert got.loc["Hello World", "last"] == "World"
    assert got.loc["Hello World", "rp_tail"] == "World"
    # single-token string: rpartition tail is the whole string (pandas)
    assert got.loc["abc123", "rp_tail"] == "abc123"
    assert got.loc["abc123", "ctr"] == "abc123".center(13, "*")
    assert got.loc["spark SQL", "ins"] == "spa__rk SQL"
    assert int(got.loc["Hello World", "n_ch"]) == len("Hello World")


def test_cat_accessor(spark):
    """CategoricalAccessor vs pandas (reference semantics:
    core/column/categorical.py:56, tests/test_categorical.py)."""
    import pandas as pd

    import pygdf_spark as gd

    pdf = pd.DataFrame({"v": ["b", "a", "c", "a", None, "b"]})
    gdf = gd.DataFrame.from_pandas(spark, pdf)
    acc = gdf["v"].cat
    pcat = pdf["v"].astype("category")

    assert acc.categories == list(pcat.cat.categories)
    assert acc.ordered is False and acc.as_ordered().ordered is True
    got = gdf.assign(code=acc.codes).to_pandas()
    assert list(got["code"]) == list(pcat.cat.codes)

    # add/remove/set/reorder dictionary edits
    added = acc.add_categories(["z"])
    assert added.categories == ["a", "b", "c", "z"]
    with pytest.raises(ValueError):
        acc.add_categories(["a"])
    removed = acc.remove_categories(["b"])
    assert removed.categories == ["a", "c"]
    got = gdf.assign(v2=removed.column, code2=removed.codes).to_pandas()
    prem = pcat.cat.remove_categories(["b"])
    assert [v if pd.notna(v) else None for v in prem] == \
        [v if pd.notna(v) else None for v in got["v2"]]
    assert list(got["code2"]) == list(prem.cat.codes)
    with pytest.raises(ValueError):
        acc.remove_categories(["nope"])
    re = acc.reorder_categories(["c", "b", "a"], ordered=True)
    assert re.categories == ["c", "b", "a"] and re.ordered is True
    with pytest.raises(ValueError):
        acc.reorder_categories(["c", "b"])
    got = gdf.assign(code3=acc.set_categories(["b", "c"]).codes).to_pandas()
    pset = pcat.cat.set_categories(["b", "c"])
    assert list(got["code3"]) == list(pset.cat.codes)


def test_astype_category_identity(spark):
    """astype('category') keeps the value column (dictionary-as-
    dim-table convention) instead of raising on a non-Spark type."""
    import pandas as pd

    import pygdf_spark as gd

    pdf = pd.DataFrame({"v": ["b", "a", "b"]})
    gdf = gd.DataFrame.from_pandas(spark, pdf)
    out = gdf.assign(c=gdf["v"].astype("category")).to_pandas()
    assert list(out["c"]) == ["b", "a", "b"]
    assert gdf.astype({"v": "category"}).to_pandas()["v"].tolist() == ["b", "a", "b"]
    # the categorical surface then comes from .cat
    assert gdf["v"].cat.categories == ["a", "b"]


def test_str_split_n_semantics(spark):
    """pandas/cuDF n = max SPLITS (n+1 pieces), not Spark's max-piece
    limit — distinguishable only with ≥2 separators (round-2 advisory)."""
    import pandas as pd

    import pygdf_spark as gd

    pdf = pd.DataFrame({"s": ["a b c", "x y z w", "solo"]})
    gdf = gd.DataFrame.from_pandas(spark, pdf)
    got = gdf.assign(
        sp1=gdf["s"].str.split(" ", 1),
        rs1=gdf["s"].str.rsplit(" ", 1),
        sp_all=gdf["s"].str.split(" "),
        rs0=gdf["s"].str.rsplit(" ", 0),
    ).to_pandas().set_index("s")
    for s in pdf["s"]:
        assert list(got.loc[s, "sp1"]) == s.split(" ", 1)
        assert list(got.loc[s, "rs1"]) == s.rsplit(" ", 1)
        assert list(got.loc[s, "sp_all"]) == s.split(" ")
        # pandas: n=0 means all splits
        assert list(got.loc[s, "rs0"]) == s.rsplit(" ")


def test_str_istimestamp_detokenize(spark):
    from pyspark.sql import functions as F

    import pygdf_spark.functions.strings as S

    df = spark.createDataFrame(
        [("2024-01-31",), ("2024-01-39",), ("not a date",)], ["t"]
    ).select(
        S.istimestamp("t", "%Y-%m-%d").alias("ok"),
        S.detokenize(S.character_tokenize("t"), "").alias("roundtrip"),
        F.col("t"),
    )
    rows = {r["t"]: r for r in df.collect()}
    assert rows["2024-01-31"]["ok"] is True
    assert rows["2024-01-39"]["ok"] is False
    assert rows["not a date"]["ok"] is False
    assert all(r["roundtrip"] == t for t, r in rows.items())


def test_dt_timedelta_components(spark):
    """timedelta component accessors (series.py:6563-6694) over
    micros-encoded durations, pinned against pandas floor semantics."""
    from pygdf_spark.core import from_spark

    micros = [90_061_000_123, -1_000_001, 0]  # 1d1h1m1s123µs, -1.000001s
    g = from_spark(spark.createDataFrame([(m,) for m in micros], "us long"))
    got = g.assign(
        d=g["us"].dt.days,
        s=g["us"].dt.seconds,
        u=g["us"].dt.microseconds,
        t=g["us"].dt.total_seconds(),
    ).to_pandas()
    for i, m in enumerate(micros):
        assert got.d[i] == m // 86_400_000_000  # pandas floor semantics
        assert got.s[i] == (m // 1_000_000) % 86_400
        assert got.u[i] == m % 1_000_000
        assert abs(got.t[i] - m / 1e6) < 1e-9


def test_list_struct_accessors(spark):
    """cuDF .list / .struct accessor surface (core/column/lists.py,
    struct.py) — array expressions checked against literal expectations."""
    from pyspark.sql import functions as F

    from pygdf_spark.core import from_spark

    sdf = spark.createDataFrame(
        [([3, 1, 2, 1], {"a": 10, "b": "x"})],
        "arr array<int>, st struct<a:int,b:string>",
    )
    g = from_spark(sdf)
    got = g.assign(
        first=g["arr"].list.get(0),
        last=g["arr"].list.get(-1),
        has2=g["arr"].list.contains(2),
        n=g["arr"].list.len(),
        took=F.array_join(g["arr"].list.take([1, 0]).cast("array<string>"), ","),
        uniq=F.array_join(g["arr"].list.unique().cast("array<string>"), ","),
        srt=F.array_join(g["arr"].list.sort_values().cast("array<string>"), ","),
        cc=F.size(g["arr"].list.concat(F.array(F.lit(9)))),
        fa=g["st"].struct.field("a"),
        fb=g["st"].struct.field("b"),
    ).to_pandas()
    row = got.iloc[0]
    assert row["first"] == 3 and row["last"] == 1
    assert bool(row["has2"]) and row["n"] == 4
    assert row["took"] == "1,3"
    assert row["uniq"] == "3,1,2"
    assert row["srt"] == "1,1,2,3"
    assert row["cc"] == 5
    assert row["fa"] == 10 and row["fb"] == "x"


def test_dt_accessor(gdf, pdf):
    got = gdf.assign(
        yr=gdf["d"].dt.year,
        mo=gdf["d"].dt.month,
        wd=gdf["d"].dt.weekday,
        leap=gdf["d"].dt.is_leap_year,
        fmt=gdf["d"].dt.strftime("%Y-%m-%d %H:%M"),
    ).to_pandas()
    assert list(got.yr) == list(pdf.d.dt.year)
    assert list(got.mo) == list(pdf.d.dt.month)
    assert list(got.wd) == list(pdf.d.dt.weekday)
    assert list(got.leap) == [y % 4 == 0 and (y % 100 != 0 or y % 400 == 0) for y in pdf.d.dt.year]
    assert list(got.fmt) == list(pdf.d.dt.strftime("%Y-%m-%d %H:%M"))


def test_series_map_dict(gdf, pdf):
    got = gdf.assign(mapped=gdf["x"].map({1: "one", 2: "two"})).to_pandas()
    exp = pdf.x.map({1: "one", 2: "two"})
    assert [v if pd.notna(v) else None for v in exp] == list(got.mapped)


def test_series_null_helpers(gdf):
    assert gdf[gdf["s"].isnull()].shape[0] == 1
    assert gdf[gdf["s"].notnull()].shape[0] == 4
    filled = gdf.assign(f=gdf["s"].fillna("??")).to_pandas()
    assert "??" in list(filled.f)


# -- named-op / unary / metadata batch -----------------------------------


def test_series_named_binops(gdf, pdf):
    x = gdf["x"]
    assert gdf.assign(t=x.add(10)).to_pandas().t.tolist() == (pdf.x + 10).tolist()
    assert gdf.assign(t=x.rsub(100)).to_pandas().t.tolist() == (100 - pdf.x).tolist()
    assert gdf.assign(t=x.mod(3)).to_pandas().t.tolist() == (pdf.x % 3).tolist()
    assert gdf[x.ge(3)].to_pandas().x.tolist() == pdf.x[pdf.x >= 3].tolist()
    assert gdf[x.between(2, 4)].to_pandas().x.tolist() == \
        pdf.x[pdf.x.between(2, 4)].tolist()


def test_series_unary_and_conditional(gdf, pdf):
    import numpy as np

    x = gdf["x"]
    assert gdf.assign(t=x.pow(2)).to_pandas().t.tolist() == (pdf.x ** 2).tolist()
    assert gdf.assign(t=x.clip(2, 4)).to_pandas().t.tolist() == \
        pdf.x.clip(2, 4).tolist()
    assert gdf.assign(t=x.where(x.gt(3), -1)).to_pandas().t.tolist() == \
        pdf.x.where(pdf.x > 3, -1).tolist()
    assert gdf.assign(t=x.mask(x.gt(3), -1)).to_pandas().t.tolist() == \
        pdf.x.mask(pdf.x > 3, -1).tolist()
    bins = [2, 4]
    assert gdf.assign(t=x.digitize(bins)).to_pandas().t.tolist() == \
        list(np.digitize(pdf.x, bins))
    assert gdf.assign(t=x.digitize(bins, right=True)).to_pandas().t.tolist() == \
        list(np.digitize(pdf.x, bins, right=True))


def test_series_delegating_ops(gdf, pdf):
    x = gdf["x"]
    assert x.nlargest(2).to_pandas().x.tolist() == pdf.x.nlargest(2).tolist()
    assert x.sort_values(ascending=False).to_pandas().x.tolist() == \
        pdf.x.sort_values(ascending=False).tolist()
    assert x.head(2).to_pandas().x.tolist() == pdf.x.head(2).tolist()
    assert x.to_frame().columns == ["x"]
    assert x.rename("y").to_pandas().tolist() == pdf.x.tolist()
    assert x.searchsorted([3]) == list(pdf.x.searchsorted([3]))


def test_series_metadata_and_scans(gdf, pdf):
    x, s = gdf["x"], gdf["s"]
    assert x.null_count == 0 and s.null_count == 1
    assert s.has_nulls and not x.has_nulls
    assert x.valid_count == 5 and s.valid_count == 4
    assert x.is_unique and x.is_monotonic_increasing
    assert not x.is_monotonic_decreasing
    assert x.dtype == "bigint" and x.ndim == 1 and x.size == 5
    assert x.sum_of_squares() == (pdf.x ** 2).sum()
    assert x.cummax().to_pandas().tolist() == pdf.x.cummax().tolist()
    assert x.cumprod().to_pandas().tolist() == \
        pdf.x.astype("float64").cumprod().tolist()
    assert x.equals(gdf["x"]) and not x.equals(gdf["s"])


def test_series_applymap_scale(gdf, pdf):
    x = gdf["x"]
    assert gdf.assign(t=x.applymap(lambda v: v * 3.0)).to_pandas().t.tolist() == \
        (pdf.x * 3.0).tolist()
    got = gdf.assign(t=x.scale()).to_pandas().t.tolist()
    exp = ((pdf.x - pdf.x.min()) / (pdf.x.max() - pdf.x.min())).tolist()
    assert got == pytest.approx(exp)


def test_array_ufunc_dispatch(spark):
    """cudf test_array_ufunc.py parity: numpy ufuncs on a Series lower
    to JVM Column expressions (no numpy evaluation, no collect)."""
    import numpy as np
    import pandas as pd

    import pygdf_spark as gd
    from pyspark.sql import Column

    pdf = pd.DataFrame({"x": [0.1, -1.5, 2.0, 4.0], "y": [1.0, 2.0, 0.5, -3.0],
                        "i": [1, 2, 3, 4]})
    g = gd.from_pandas(pdf, spark)

    cases = {
        "sin": np.sin(g["x"]),
        "sqrt_abs": np.sqrt(np.absolute(g["x"])),
        "add": np.add(g["x"], g["y"]),
        "maximum": np.maximum(g["x"], g["y"]),
        "arctan2": np.arctan2(g["x"], g["y"]),
        "floor_div": np.floor_divide(g["x"], g["y"]),
        "trunc": np.trunc(g["y"]),
        "rem": np.remainder(g["i"], 3),
        "shift": np.left_shift(g["i"], 2),
        "logexp": np.logaddexp(g["x"], g["y"]),
        "ge": np.greater_equal(g["x"], g["y"]),
    }
    for c in cases.values():
        assert isinstance(c, Column)
    out = g.assign(**cases).to_pandas()
    exp = {
        "sin": np.sin(pdf["x"]),
        "sqrt_abs": np.sqrt(np.abs(pdf["x"])),
        "add": pdf["x"] + pdf["y"],
        "maximum": np.maximum(pdf["x"], pdf["y"]),
        "arctan2": np.arctan2(pdf["x"], pdf["y"]),
        "floor_div": np.floor_divide(pdf["x"], pdf["y"]),
        "trunc": np.trunc(pdf["y"]),
        "rem": np.remainder(pdf["i"], 3),
        "shift": np.left_shift(pdf["i"], 2),
        "logexp": np.logaddexp(pdf["x"], pdf["y"]),
        "ge": pdf["x"] >= pdf["y"],
    }
    for k, v in exp.items():
        got = out[k].to_numpy()
        want = np.asarray(v)
        if want.dtype == bool:
            assert (got == want).all(), k
        else:
            assert np.allclose(got.astype(float), want.astype(float)), k


def test_str_functions_pandas_semantics(spark):
    """r4 review pins for the string layer: anchored-match alternation,
    no pad truncation, negative slice/get, translate deletions via '',
    wrap without trailing newline, whitespace-mode split, lstrip('')
    no-op, code_points('') empty, istimestamp literal quoting."""
    import pandas as pd

    from pyspark.sql import functions as F

    import pygdf_spark.functions.strings as S

    df = spark.createDataFrame(
        [("hotdog",), ("cat",), ("hello",), (" a b ",), ("",)], "t string"
    )
    row = df.select(
        S.match("t", "cat|dog").alias("m"),
        S.center("t", 3).alias("c3"),
        S.zfill("t", 3).alias("z3"),
        S.get("t", -1).alias("last"),
        S.slice_("t", -3).alias("tail3"),
        S.slice_("t", 1, -1).alias("mid"),
        S.translate("t", {"o": "", "t": "T"}).alias("tr"),
        S.wrap("t", 3).alias("w"),
        S.split("t").alias("sp"),
        S.lstrip("t", "").alias("ls"),
        S.code_points("t").alias("cp"),
    ).collect()
    by = {r_["t"] if False else i: r_ for i, r_ in enumerate(row)}
    vals = {r_["c3"]: r_ for r_ in row}
    pser = pd.Series(["hotdog", "cat", "hello", " a b ", ""])
    # match: anchored whole-pattern
    assert [r_["m"] for r_ in row] == pser.str.match("cat|dog").tolist()
    # center/zfill: no truncation
    assert [r_["c3"] for r_ in row] == pser.str.center(3).tolist()
    assert [r_["z3"] for r_ in row] == pser.str.zfill(3).tolist()
    # negative get/slice
    assert [r_["last"] for r_ in row] == ["g", "t", "o", " ", ""]
    assert [r_["tail3"] for r_ in row] == [s[-3:] for s in pser]
    assert [r_["mid"] for r_ in row] == [s[1:-1] for s in pser]
    # translate: '' deletes, single-char maps
    assert [r_["tr"] for r_ in row] == [s.translate(str.maketrans({"o": None, "t": "T"})) for s in pser]
    # wrap: no trailing newline
    assert all(not r_["w"].endswith("\n") for r_ in row)
    # whitespace-mode split drops edge empties
    assert [list(r_["sp"]) for r_ in row] == [s.split() for s in pser]
    # lstrip('') no-op
    assert [r_["ls"] for r_ in row] == list(pser)
    # code_points('') == []
    assert list(row[4]["cp"]) == []
    # istimestamp: ISO 'T' literal parses instead of crashing
    ts = spark.createDataFrame([("2024-01-02T03:04:05",), ("nope",)], "t string")
    got = [r_["ok"] for r_ in ts.select(
        S.istimestamp("t", "%Y-%m-%dT%H:%M:%S").alias("ok")).collect()]
    assert got == [True, False]


def test_logaddexp_stable_and_scale_constant(spark):
    """r4 advice: logaddexp/logaddexp2 must not overflow for large
    inputs (stable max+log1p form); Series.scale() on a constant
    column returns NaN (cuDF 0/0 float semantics), not all-null."""
    import numpy as np
    import pandas as pd

    import pygdf_spark as gd

    pdf = pd.DataFrame({"a": [1000.0, -2000.0, 1000.0, 0.5],
                        "b": [999.0, -2000.0, 1000.0, 0.25],
                        "c": [7.0, 7.0, 7.0, 7.0]})
    g = gd.from_pandas(pdf, spark)
    out = g.assign(le=np.logaddexp(g["a"], g["b"]),
                   le2=np.logaddexp2(g["a"], g["b"])).to_pandas()
    assert np.allclose(out["le"], np.logaddexp(pdf["a"], pdf["b"]))
    assert np.allclose(out["le2"], np.logaddexp2(pdf["a"], pdf["b"]))
    assert np.isfinite(out["le"]).all() and np.isfinite(out["le2"]).all()

    sc = g.assign(s=g["c"].scale()).to_pandas()["s"]
    assert sc.isna().all()  # NaN, not null-from-division — degenerate input visible


def test_dt_alias_and_timedelta_components(spark):
    """cuDF parity sweep r5: dayofweek/day_of_week/day_of_year aliases,
    and .dt.components matches pandas' floor-division decomposition
    (incl. negative durations flooring toward -inf)."""
    import pandas as pd

    import pygdf_spark as gd

    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-03-01 10:00", "2024-12-31 23:59"]),
        "dur": [90_061_001_500, -1_000_000],
    })
    g = gd.from_pandas(pdf, spark)
    out = g.assign(
        dw=g["ts"].dt.dayofweek, dw2=g["ts"].dt.day_of_week,
        dy=g["ts"].dt.day_of_year, comp=g["dur"].dt.components,
    ).to_pandas()
    assert out["dw"].tolist() == pdf.ts.dt.dayofweek.tolist()
    assert out["dw2"].tolist() == pdf.ts.dt.dayofweek.tolist()
    assert out["dy"].tolist() == pdf.ts.dt.dayofyear.tolist()
    td = pd.to_timedelta(pdf["dur"], unit="us").dt.components
    for i in range(2):
        got = out["comp"].iloc[i]
        assert tuple(got.values()) == tuple(td.iloc[i]), i

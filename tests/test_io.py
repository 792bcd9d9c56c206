"""Round-trip tests for the §2.1 source/sink surface
(pygdf_spark.sources) + scan-level pushdown evidence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T
from pygdf_spark.sources import io as IO


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey", "o_custkey", "o_totalprice").collect()]


def test_csv_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "csv")
    IO.write_csv(sample, path, sep="|", header=True)
    back = IO.read_csv(
        spark, path, sep="|", header=True,
        names=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        dtype={"o_orderkey": "int64", "o_custkey": "int64",
               "o_orderstatus": "str", "o_totalprice": "float64"},
    )
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_csv_usecols_prunes(spark, sample, tmp_path):
    path = str(tmp_path / "csv2")
    IO.write_csv(sample, path)
    back = IO.read_csv(spark, path, usecols=["o_orderkey", "o_totalprice"])
    assert back.columns == ["o_orderkey", "o_totalprice"]
    assert back.count() == sample.count()


def test_parquet_roundtrip_partitioned(spark, sample, tmp_path):
    path = str(tmp_path / "pq")
    IO.write_parquet(sample, path, partition_cols=["o_orderstatus"])
    back = IO.read_parquet(spark, path).select(*sample.columns)
    # partition column comes back typed as read; normalize and compare
    assert sorted(_sorted_rows(back)) == sorted(_sorted_rows(sample))


def test_parquet_filter_pushdown_reaches_scan(spark, sample, tmp_path):
    path = str(tmp_path / "pq2")
    IO.write_parquet(sample, path)
    df = IO.read_parquet(spark, path, columns=["o_orderkey"], filters="o_orderkey < 100")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)" in plan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_orc_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "orc")
    IO.write_orc(sample, path)
    back = IO.read_orc(spark, path, filters="o_orderkey >= 0")
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_json_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "json")
    IO.write_json(sample, path)
    back = IO.read_json(spark, path).select(*sample.columns)
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_avro_gated(spark, sample, tmp_path):
    try:
        IO.read_avro(spark, str(tmp_path / "nope"))
    except RuntimeError as e:
        assert "spark-avro" in str(e)
    except Exception:
        pytest.skip("avro module present; load failed on missing path as expected")


def test_read_hdf_gate(spark, tmp_path):
    """Without PyTables the gate must raise the actionable error (and
    with it, the pandas round-trip path is the same as feather's)."""
    import pytest as _pytest

    from pygdf_spark.sources.io import read_hdf

    try:
        import tables  # noqa: F401
        has_tables = True
    except ImportError:
        has_tables = False
    if not has_tables:
        with _pytest.raises((RuntimeError, FileNotFoundError, ImportError)):
            read_hdf(spark, str(tmp_path / "x.h5"))


def _formatted_plan(df) -> str:
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_shuffle(spark, sample):
    """Same-key same-count bucketed tables must join with no shuffle
    Exchange (the persisted co-location path for 100 TB joins)."""
    from pygdf_spark.sources.io import read_bucketed, write_bucketed

    left = sample.select(F.col("o_orderkey").alias("lk"), "o_totalprice")
    right = sample.select(F.col("o_orderkey").alias("rk"), "o_orderstatus")
    write_bucketed(left, "t_bucket_l", "lk", 4, sort_cols=["lk"])
    write_bucketed(right, "t_bucket_r", "rk", 4, sort_cols=["rk"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed(spark, "t_bucket_l")
        b = read_bucketed(spark, "t_bucket_r")
        j = a.join(b, a.lk == b.rk)
        plan = _formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucket-to-bucket
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_l")
        spark.sql("DROP TABLE IF EXISTS t_bucket_r")


def test_dynamic_partition_pruning(spark, sample, tmp_path):
    """Hive-style partitioned write (partition_cols, io/parquet.py:86)
    + a selective dim join must plan a dynamic-pruning subquery on the
    partitioned scan — the 100 TB path where only matching partitions
    are read at runtime."""
    path = str(tmp_path / "fact_part")
    sample.write.partitionBy("o_orderstatus").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame([("F", 1), ("O", 2)], ["st", "grp"]).filter(F.col("grp") == 1)
    j = fact.join(dim, fact.o_orderstatus == dim.st)
    plan = _formatted_plan(j)
    assert "dynamicpruningexpression" in plan.lower()
    assert j.count() > 0


def test_stream_parquet_sink_roundtrip(spark, tmp_path):
    """Durable streaming sink: availableNow micro-batches -> parquet +
    checkpoint -> read back. Append mode emits only watermark-closed
    windows, so the sink must be a value-exact SUBSET of the batch
    windows (and non-empty) -- the production exactly-once sink shape."""
    from pyspark.sql import functions as F

    from pygdf_spark.queries._util import dec, events_ts
    from pygdf_spark.streaming.pipelines import (
        read_events_stream,
        run_available_now_parquet,
    )

    sf_dir = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    # append mode requires grouping on the WINDOW STRUCT itself —
    # extracting .start before the groupBy severs watermark propagation
    agg = (
        stream.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_val"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_val")
    )
    sink = run_available_now_parquet(
        agg, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    got = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["sum_val"])
        for r in sink.collect()
    }
    assert got, "append sink should emit at least the early closed windows"
    batch = (
        events_ts(spark, sf_dir)
        .groupBy(F.window("ts", "5 minutes").start.alias("w_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).cast("double").alias("sum_val"))
    )
    exp = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["sum_val"])
        for r in batch.collect()
    }
    for k, v in got.items():
        assert exp[k] == v, f"window {k}: sink {v} != batch {exp[k]}"
    # restart on the same checkpoint is a no-op (exactly-once: no dupes)
    sink2 = run_available_now_parquet(
        agg, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    assert sink2.count() == sink.count()


def test_csv_dialect_quoting_and_nulls(spark, tmp_path):
    """CSV dialect depth (csv.hpp option builder): quoted separators,
    embedded quotes, custom quotechar, na sentinel, comment lines, and
    explicit names+dtype schema (cuDF semantics: schema implies no
    header row)."""
    p = tmp_path / "dialect.csv"
    p.write_text(
        "# leading comment\n"
        "1;'a;b';10\n"
        "2;'say ''hi''';NA\n"
        "3;plain;30\n"
    )
    df = IO.read_csv(
        spark, str(p), sep=";", quotechar="'", comment="#",
        names=["id", "s", "v"], dtype={"id": "int64", "s": "str", "v": "int64"},
        na_values="NA", header=False,
    )
    rows = {r.id: (r.s, r.v) for r in df.collect()}
    assert rows == {1: ("a;b", 10), 2: ("say 'hi'", None), 3: ("plain", 30)}


def test_csv_compressed_roundtrip(spark, sample, tmp_path):
    """gzip-compressed CSV write/read (compression member of the cuIO
    option builders; Spark infers the codec from the extension)."""
    path = str(tmp_path / "gz")
    sample.write.option("header", "true").option("compression", "gzip").mode(
        "overwrite"
    ).csv(path)
    back = IO.read_csv(spark, path)
    assert back.count() == sample.count()
    got = {tuple(r) for r in back.select("o_orderkey", "o_orderstatus").collect()}
    exp = {tuple(r) for r in sample.select("o_orderkey", "o_orderstatus").collect()}
    assert got == exp


def test_parquet_codec_matrix(spark, sample, tmp_path):
    """snappy/gzip/zstd parquet round-trips (parquet.hpp compression
    enum) — same rows back under every codec."""
    exp = _sorted_rows(sample)
    for codec in ("snappy", "gzip", "zstd"):
        path = str(tmp_path / codec)
        sample.write.option("compression", codec).mode("overwrite").parquet(path)
        assert _sorted_rows(spark.read.parquet(path)) == exp


def test_orc_filter_pushdown_reaches_scan(spark, sample, tmp_path):
    """ORC predicate pushdown evidence (orc.hpp stripe statistics →
    _filter_stripes io/orc.py:110): the filter must appear in the ORC
    scan's pushed filters, mirroring the parquet assertion."""
    path = str(tmp_path / "orc_pd")
    IO.write_orc(sample, path)
    df = spark.read.orc(path).filter(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:200]


def test_avro_lite_roundtrip(spark, tmp_path):
    """Pure-Python Avro OCF write -> distributed mapInPandas read:
    values, nulls, dtypes, and multi-file parallelism."""
    import datetime

    import numpy as np
    import pandas as pd

    from pygdf_spark.sources.avro_lite import read_avro_lite, write_avro

    pdf = pd.DataFrame({
        "i": pd.array([1, None, 3, -4, 5], dtype="Int64").astype(object),
        "d": [1.5, float("nan"), -2.25, 0.0, 1e18],
        "s": ["alpha", None, "", "quote'and\\slash", "日本語"],
        "b": [True, False, None, True, False],
        "t": [datetime.datetime(2024, 3, 1, 12, 30, 45, 123456), None,
              datetime.datetime(1969, 12, 31, 23, 59, 59), datetime.datetime(1970, 1, 1),
              datetime.datetime(2038, 1, 19, 3, 14, 7)],
    })
    pdf["i"] = pdf["i"].map(lambda v: None if v is pd.NA else int(v))
    # two files -> two decode tasks
    f1, f2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro(pdf.iloc[:3], f1)
    write_avro(pdf.iloc[3:], f2)
    out = read_avro_lite(spark, str(tmp_path)).orderBy("d", "s").toPandas()
    assert len(out) == 5
    got = out.sort_values("s", na_position="first").reset_index(drop=True)
    exp = pdf.sort_values("s", na_position="first").reset_index(drop=True)
    assert list(got["s"].fillna("<null>")) == list(exp["s"].fillna("<null>"))
    assert list(got["i"].fillna(-999).astype(int)) == [
        -999 if pd.isna(v) else int(v) for v in exp["i"]
    ]
    nn = got["t"].notna()
    assert list(got.loc[nn, "t"]) == list(exp.loc[exp["t"].notna(), "t"])
    # NaN float survives as NULL (missing), exact doubles round-trip
    assert np.isclose(got["d"].dropna().sum(), np.nansum(exp["d"]))


def test_read_avro_falls_back_distributed(spark, tmp_path):
    """sources.io.read_avro uses the lite decoder when the spark-avro
    jar is absent (this container) and the plan is Arrow-batched."""
    import pandas as pd

    from pygdf_spark.sources.io import read_avro, write_avro as io_write_avro

    sdf = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    path = str(tmp_path / "t.avro")
    io_write_avro(sdf, path)
    back = read_avro(spark, path)
    assert {(r.k, r.v) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "c")}
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "avro" in plan.lower()


def test_avro_lite_nullable_dtypes_and_nat_string(spark, tmp_path):
    """r3 advice: pandas nullable Int64/boolean columns must map to
    long/boolean (not string), pd.NA must encode as null, and a
    LEGITIMATE string value "NaT" must survive (the old missing test
    stringified every value)."""
    import pandas as pd

    from pygdf_spark.sources.avro_lite import read_avro_lite, write_avro

    pdf = pd.DataFrame({
        "i": pd.array([10, None, -3], dtype="Int64"),
        "f": pd.array([1.5, None, 2.5], dtype="Float64"),
        "b": pd.array([True, None, False], dtype="boolean"),
        "s": ["NaT", None, "x"],
    })
    path = str(tmp_path / "n.avro")
    write_avro(pdf, path)
    out = read_avro_lite(spark, path)
    sch = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert sch == {"i": "bigint", "f": "double", "b": "boolean", "s": "string"}
    rows = {r["i"]: r for r in out.collect()}
    assert rows[10]["b"] is True and rows[10]["s"] == "NaT"
    assert rows[None]["f"] is None and rows[None]["b"] is None and rows[None]["s"] is None
    assert rows[-3]["f"] == 2.5 and rows[-3]["b"] is False and rows[-3]["s"] == "x"


def test_avro_lite_review_fixes(spark):
    """r4 review pins: instants survive (tz-aware UTC decode — naive
    datetimes would shift under non-UTC sessions), tz-aware columns
    encode, non-string labels, uint64 range check, corrupt-file errors."""
    import datetime

    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from pygdf_spark.sources.avro_lite import encode_avro, read_records_buf

    # tz-aware encode + instant-exact decode
    pdf = pd.DataFrame({"t": pd.to_datetime(["2023-11-14 22:13:20"]).tz_localize("UTC")})
    _, recs = read_records_buf(encode_avro(pdf))
    assert recs[0]["t"] == datetime.datetime(
        2023, 11, 14, 22, 13, 20, tzinfo=datetime.timezone.utc
    )
    # non-string column labels
    _, r2 = read_records_buf(encode_avro(pd.DataFrame({0: [1, 2]})))
    assert r2 == [{"0": 1}, {"0": 2}]
    # numpy unsigned dtypes map to int/long; uint64 >= 2**63 rejected
    _, r3 = read_records_buf(
        encode_avro(pd.DataFrame({"u": np.array([2 ** 62], dtype=np.uint64)}))
    )
    assert r3[0]["u"] == 2 ** 62
    with _pytest.raises(ValueError, match="Avro long range"):
        encode_avro(pd.DataFrame({"u": np.array([2 ** 63], dtype=np.uint64)}))
    # corrupt magic is a ValueError (not a strippable assert)
    with _pytest.raises(ValueError, match="magic"):
        read_records_buf(b"nope" + b"\x00" * 40)


def test_avro_lite_multifile_schema_mismatch(spark, tmp_path):
    """Divergent sibling files fail loudly instead of yielding
    silently-null columns."""
    import pandas as pd
    import pytest as _pytest

    from pygdf_spark.sources.avro_lite import read_avro_lite, write_avro

    write_avro(pd.DataFrame({"x": [1], "y": [2]}), str(tmp_path / "a.avro"))
    write_avro(pd.DataFrame({"x": [1], "z": [3]}), str(tmp_path / "b.avro"))
    with _pytest.raises(Exception, match="schema mismatch"):
        read_avro_lite(spark, str(tmp_path)).collect()


# ------------------------- positional CSV options (csv.hpp:40-1115) ----


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    """One plain CSV file with 2 junk preamble lines, a header, 20 data
    rows, and 3 trailer lines that look like data (the skipfooter
    target) — the pandas fixture shape."""
    import pandas as pd

    p = tmp_path_factory.mktemp("csvopt") / "f.csv"
    rows = "\n".join(
        f"{i},{i * 10},name_{i:02d},2024-0{1 + i % 9}-1{i % 10}"
        for i in range(20)
    )
    trailer = "\n".join(f"{900 + i},0,trailer_{i},2030-01-01" for i in range(3))
    p.write_text(
        "# junk line 1\n# junk line 2\n"
        "k,v,name,d\n" + rows + "\n" + trailer + "\n"
    )
    return str(p)


def _pd_read(csv_file, **kw):
    import pandas as pd

    return pd.read_csv(csv_file, engine="python", **kw)


def test_csv_skiprows_matches_pandas(spark, csv_file):
    got = IO.read_csv(spark, csv_file, skiprows=2).toPandas()
    exp = _pd_read(csv_file, skiprows=2)
    assert list(got.columns) == list(exp.columns)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["name"].tolist() == exp["name"].tolist()


def test_csv_nrows_matches_pandas(spark, csv_file):
    got = IO.read_csv(spark, csv_file, skiprows=2, nrows=7).toPandas()
    exp = _pd_read(csv_file, skiprows=2, nrows=7)
    assert got["k"].tolist() == exp["k"].tolist() == list(range(7))


def test_csv_skipfooter_matches_pandas(spark, csv_file):
    got = IO.read_csv(spark, csv_file, skiprows=2, skipfooter=3).toPandas()
    exp = _pd_read(csv_file, skiprows=2, skipfooter=3)
    assert got["k"].tolist() == exp["k"].tolist() == list(range(20))
    assert "trailer_0" not in set(got["name"])


def test_csv_parse_dates(spark, csv_file):
    got = IO.read_csv(
        spark, csv_file, skiprows=2, nrows=5, parse_dates=["d"]
    )
    assert dict(got.dtypes)["d"] == "timestamp"
    exp = _pd_read(csv_file, skiprows=2, nrows=5, parse_dates=["d"])
    assert [t.date().isoformat() for t in got.toPandas()["d"]] == [
        t.date().isoformat() for t in exp["d"]
    ]


def test_csv_byte_range_partitions_exactly(spark, csv_file):
    """Adjacent byte ranges must partition the file's rows exactly
    (each row belongs to the range holding its first byte) — the
    reference's byte_range ownership rule."""
    import os

    names = ["k", "v", "name", "d"]
    size = os.path.getsize(csv_file)
    mid = size // 2
    a = IO.read_csv(spark, csv_file, names=names, byte_range=(0, mid))
    b = IO.read_csv(spark, csv_file, names=names, byte_range=(mid, size - mid))
    full = IO.read_csv(spark, csv_file, names=names, byte_range=(0, size))
    assert a.count() + b.count() == full.count()
    got = sorted(
        r["k"] for r in a.select("k").collect()
    ) + sorted(r["k"] for r in b.select("k").collect())
    assert len(got) == full.count()


def test_csv_byte_range_requires_names(spark, csv_file):
    with pytest.raises(ValueError, match="names"):
        IO.read_csv(spark, csv_file, byte_range=(0, 100))


def test_local_prefix_line_contract(tmp_path, spark, csv_file):
    """The driver-side header fetch (opt r7: zero Spark jobs for local
    files) must return byte-for-byte what the distributed fetch
    returns, including Hadoop's newline rule (one \\r stripped before
    the \\n), and must decline (None → fallback) anything that is not
    one local regular file."""
    # \r\n terminators: Hadoop's LineRecordReader strips one \r
    crlf = tmp_path / "crlf.csv"
    crlf.write_bytes(b"# junk\r\nk,v\r\n1,2\r\n")
    assert IO._local_prefix_line(str(crlf), 0) == "# junk"
    assert IO._local_prefix_line(str(crlf), 1) == "k,v"
    # parity with what the RDD path yields for the same line
    got_rdd = spark.sparkContext.textFile(str(crlf), 1).take(2)
    assert IO._local_prefix_line(str(crlf), 1) == got_rdd[1]
    # file:// scheme resolves; foreign schemes and directories decline
    assert IO._local_prefix_line(f"file://{crlf}", 1) == "k,v"
    assert IO._local_prefix_line("s3a://bucket/x.csv", 0) is None
    assert IO._local_prefix_line(str(tmp_path), 0) is None
    # past-EOF line: None (the distributed fallback raises, as before)
    assert IO._local_prefix_line(str(crlf), 99) is None
    # end-to-end: forcing the fallback reads the same frame
    base = IO.read_csv(spark, csv_file, skiprows=2, nrows=5).toPandas()
    real = IO._local_prefix_line
    IO._local_prefix_line = lambda *a: None
    try:
        fb = IO.read_csv(spark, csv_file, skiprows=2, nrows=5).toPandas()
    finally:
        IO._local_prefix_line = real
    assert base.equals(fb)

"""Inventory-completion queries (SURVEY.md §2): transpose
(transpose.hpp, dataframe.py:4292), GroupBy.describe (groupby.py:621),
Rolling.apply custom window UDFs (rolling.py:249, aggregation.hpp:84),
and the string conversion family (convert_ipv4.hpp:53 ip2int, htoi
string.py:244, code_points string.py:3955, find_multiple
find_multiple.hpp:52).

transpose is documented small-data: cuDF transposes a device table;
the Spark analog is an unpivot(stack)→pivot with an explicit column
value list — a plan over an already-aggregated (tiny) frame, never over
the fact table itself.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec, spread


def transpose_small(spark, sf_dir):
    """.T of a 3×3 aggregate: metrics-by-flag → flag-by-metrics via
    stack (unpivot) + pivot with a declared value list."""
    li = T(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        (F.sum(dec("l_extendedprice")) * 100).cast("long").alias("price_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    long = agg.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'n', n, 'price_cents', price_cents, 'sum_qty', sum_qty) AS (metric, value)"
        ),
    )
    return (
        long.groupBy("metric")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.first("value"))
        .orderBy("metric")
    )


TRANSPOSE_SQL = """
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS price_cents,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT metric,
       MAX(CASE WHEN l_returnflag = 'A' THEN value END) AS A,
       MAX(CASE WHEN l_returnflag = 'N' THEN value END) AS N,
       MAX(CASE WHEN l_returnflag = 'R' THEN value END) AS R
FROM (
  SELECT l_returnflag, 'n' AS metric, n AS value FROM agg
  UNION ALL SELECT l_returnflag, 'price_cents', price_cents FROM agg
  UNION ALL SELECT l_returnflag, 'sum_qty', sum_qty FROM agg
)
GROUP BY metric ORDER BY metric
"""


def groupby_describe(spark, sf_dir):
    """GroupBy.describe (groupby.py:621): count/mean/std/min/quartiles/
    max; std from exact power sums, quartiles exact-interpolated."""
    li = T(spark, sf_dir, "lineitem").withColumn("q", F.col("l_quantity").cast("long"))
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("q").cast("double").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("s2"),
        F.min("q").alias("min_q"),
        F.percentile("q", 0.25).alias("q25"),
        F.percentile("q", 0.5).alias("q50"),
        F.percentile("q", 0.75).alias("q75"),
        F.max("q").alias("max_q"),
    )
    n = F.col("cnt").cast("double")
    mean = F.col("s1") / n
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1))
    return sums.select(
        "l_returnflag",
        "cnt",
        F.round(mean, 10).alias("mean_q"),
        F.round(std, 10).alias("std_q"),
        "min_q", "q25", "q50", "q75", "max_q",
    ).orderBy("l_returnflag")


DESCRIBE_SQL = """
SELECT l_returnflag, COUNT(*) AS cnt,
       ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*), 10) AS mean_q,
       ROUND(SQRT((CAST(SUM(q*q) AS DOUBLE) - CAST(SUM(q) AS DOUBLE)*CAST(SUM(q) AS DOUBLE)/COUNT(*))
                  / (COUNT(*) - 1)), 10) AS std_q,
       MIN(q) AS min_q,
       quantile_cont(q, 0.25) AS q25,
       quantile_cont(q, 0.5) AS q50,
       quantile_cont(q, 0.75) AS q75,
       MAX(q) AS max_q
FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def rolling_apply_fold(spark, sf_dir):
    """Rolling.apply with a custom function (rolling.py:249): an
    arbitrary fold (sum of squares) over a 3-row rolling window —
    collect_list over the frame, then a JVM-side `aggregate` fold (the
    no-Python path for custom window functions)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    cents = (dec("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    vals = F.collect_list(cents).over(w)
    fold = F.aggregate(vals, F.lit(0).cast("long"), lambda a, x: a + x * x)
    return o.select(
        "o_custkey", "o_orderkey",
        F.size(vals).alias("win_n"),
        fold.alias("sumsq_cents"),
    ).orderBy("o_custkey", "o_orderkey")


ROLLING_APPLY_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(COUNT(*) OVER w AS INT) AS win_n,
       CAST(SUM(cents * cents) OVER w AS BIGINT) AS sumsq_cents
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_custkey < 200
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def str_convert_pack(spark, sf_dir):
    """string→number conversions: htoi (string.py:244), ip2int
    (convert_ipv4.hpp:53), code_points (string.py:3955), find_multiple
    (find_multiple.hpp:52)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    k = F.col("p_partkey")
    hex6 = F.substring(F.md5(F.col("p_name")), 1, 6)
    ip = F.concat_ws(
        ".",
        (k % 224 + 1).cast("string"), (k % 256).cast("string"),
        ((k * 7) % 256).cast("string"), ((k * 13) % 256).cast("string"),
    )
    oct_ = F.split(ip, r"\.")
    ip2int = (
        F.element_at(oct_, 1).cast("long") * 16777216
        + F.element_at(oct_, 2).cast("long") * 65536
        + F.element_at(oct_, 3).cast("long") * 256
        + F.element_at(oct_, 4).cast("long")
    )
    return p.select(
        "p_partkey",
        hex6.alias("hex6"),
        F.conv(hex6, 16, 10).cast("long").alias("htoi"),
        ip.alias("ip"),
        ip2int.alias("ip2int"),
        # arrays stringified: the driver canonicalizer sorts columns with
        # pandas, which cannot hash list cells (r3 hash-fail root cause)
        F.array_join(
            F.transform(F.split(F.substring("p_name", 1, 8), ""), F.ascii), ","
        ).alias("code_points"),
        F.array_join(
            F.array(F.instr("p_name", "a"), F.instr("p_name", "ol"), F.instr("p_name", "e")), ","
        ).alias("find_multiple"),
    ).orderBy("p_partkey")


STR_CONVERT_SQL = r"""
SELECT p_partkey,
       substring(md5(p_name), 1, 6) AS hex6,
       list_reduce(list_transform(string_split(substring(md5(p_name), 1, 6), ''),
                                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (a, b) -> a * 16 + b) AS htoi,
       (p_partkey % 224 + 1) || '.' || (p_partkey % 256) || '.' ||
       ((p_partkey * 7) % 256) || '.' || ((p_partkey * 13) % 256) AS ip,
       (p_partkey % 224 + 1) * 16777216 + (p_partkey % 256) * 65536 +
       ((p_partkey * 7) % 256) * 256 + ((p_partkey * 13) % 256) AS ip2int,
       array_to_string(list_transform(string_split(substring(p_name, 1, 8), ''),
                                      c -> CAST(ascii(c) AS INT)), ',') AS code_points,
       array_to_string([CAST(strpos(p_name, 'a') AS INT), CAST(strpos(p_name, 'ol') AS INT),
                        CAST(strpos(p_name, 'e') AS INT)], ',') AS find_multiple
FROM part WHERE p_partkey < 500 ORDER BY p_partkey
"""


def io_avro_roundtrip(spark, sf_dir):
    """read_avro (avro.hpp:212) end-to-end: nation exported to an Avro
    OCF file (pure-Python encoder, deflate codec) and read back through
    the DISTRIBUTED decoder (sources/avro_lite.py mapInPandas — one
    task per file), then aggregated. The oracle runs the same aggregate
    on the original parquet, so a decode divergence anywhere in the
    round-trip breaks the value hash."""
    import os
    import tempfile

    from pygdf_spark.queries._util import T
    from pygdf_spark.sources.avro_lite import write_avro
    from pygdf_spark.sources.io import read_avro

    nation = T(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(tempfile.gettempdir(), f"pygdf_avro_{tag}_nation.avro")
    # bounded: nation is the fixed 25-row TPC-H dimension (schema bound,
    # not SF-proportional) — the avro fixture under test
    write_avro(nation.toPandas(), path)
    back = read_avro(spark, path)
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").alias("key_sum"),
            F.min("n_name").alias("first_name"),
            F.sum(F.length("n_name")).alias("name_chars"),
        )
        .orderBy("n_regionkey")
    )


IO_AVRO_SQL = """
SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name, CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_chars
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


def _rt_path(sf_dir: str, fmt: str, table: str) -> str:
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(tempfile.gettempdir(), f"pygdf_{fmt}_{tag}_{table}")


def io_csv_roundtrip(spark, sf_dir):
    """read_csv/write_csv (csv.hpp:1124,1452) end-to-end through the
    DISTRIBUTED csv writer (part-file directory) and schema-inferring
    reader: supplier exported and read back, then aggregated. Integer/
    string columns only — csv is a text dialect, so the round-trip
    property under test is the quoting/escaping/inference contract, not
    float formatting."""
    from pygdf_spark.queries._util import T
    from pygdf_spark.sources.io import read_csv, write_csv

    sup = T(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    path = _rt_path(sf_dir, "csv", "supplier")
    write_csv(sup, path)
    back = read_csv(spark, path)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s_suppkey").alias("key_sum"),
            F.min("s_name").alias("first_name"),
            F.sum(F.length("s_name")).alias("name_chars"),
        )
        .orderBy("s_nationkey")
    )


IO_CSV_SQL = """
SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
       MIN(s_name) AS first_name, CAST(SUM(LENGTH(s_name)) AS BIGINT) AS name_chars
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
"""


def io_csv_options(spark, sf_dir):
    """The positional read_csv option tail (csv.hpp:40-1115:
    skiprows/nrows/skipfooter/parse_dates): the 500 smallest orders are
    exported to ONE csv file with 2 junk preamble lines, then read back
    twice through the line-indexed distributed path — (a) skiprows=2 +
    nrows=100, (b) skiprows=2 + skipfooter=5 — with o_orderdate
    parse_dates'd. Both reads aggregate into one row, so every option
    is value-checked against the DuckDB oracle."""
    import os

    from pygdf_spark.queries._util import T
    from pygdf_spark.sources.io import read_csv, write_csv

    base = (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(500)
    )
    path = _rt_path(sf_dir, "csvopt", "orders")
    write_csv(base.coalesce(1), path)
    # re-stage as ONE standalone file with 2 junk preamble lines (the
    # skiprows target); a fresh file, not an in-place edit — Spark's
    # writer leaves Hadoop .crc sidecars that an edit would invalidate
    (part,) = [
        os.path.join(path, n) for n in os.listdir(path)
        if n.startswith("part-") and n.endswith(".csv")
    ]
    staged = path + ".file.csv"
    with open(part, encoding="utf-8") as src, \
            open(staged, "w", encoding="utf-8") as dst:
        dst.write("# export v1\n# source: orders\n")
        dst.write(src.read())

    head = read_csv(
        spark, staged, skiprows=2, nrows=100, parse_dates=["o_orderdate"]
    )
    trimmed = read_csv(
        spark, staged, skiprows=2, skipfooter=5, parse_dates=["o_orderdate"]
    )
    a = head.agg(
        F.count(F.lit(1)).alias("n_head"),
        F.sum("o_orderkey").cast("long").alias("key_sum_head"),
        F.max("o_orderkey").cast("long").alias("key_max_head"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_date_head"),
    )
    b = trimmed.agg(
        F.count(F.lit(1)).alias("n_trim"),
        F.sum("o_orderkey").cast("long").alias("key_sum_trim"),
        F.max("o_orderkey").cast("long").alias("key_max_trim"),
        F.min(F.length("o_orderpriority")).cast("int").alias("prio_len_min"),
    )
    return a.crossJoin(b)


IO_CSV_OPTIONS_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
  FROM orders ORDER BY o_orderkey LIMIT 500
),
head AS (SELECT * FROM base ORDER BY o_orderkey LIMIT 100),
trimmed AS (
  SELECT * FROM base ORDER BY o_orderkey
  LIMIT (SELECT COUNT(*) - 5 FROM base)
)
SELECT
  (SELECT COUNT(*) FROM head) AS n_head,
  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM head) AS key_sum_head,
  (SELECT CAST(MAX(o_orderkey) AS BIGINT) FROM head) AS key_max_head,
  (SELECT MIN(o_orderdate) FROM head) AS first_date_head,
  (SELECT COUNT(*) FROM trimmed) AS n_trim,
  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM trimmed) AS key_sum_trim,
  (SELECT CAST(MAX(o_orderkey) AS BIGINT) FROM trimmed) AS key_max_trim,
  (SELECT CAST(MIN(LENGTH(o_orderpriority)) AS INT) FROM trimmed) AS prio_len_min
"""


def io_orc_roundtrip(spark, sf_dir):
    """read_orc/write_orc (orc.hpp:363,579) end-to-end with predicate +
    column pruning applied ON THE ORC READ (the filter reaches stripe
    pruning; reading all columns back for a 3-column aggregate would be
    the wrong plan)."""
    from pygdf_spark.queries._util import T
    from pygdf_spark.sources.io import read_orc, write_orc

    part = T(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_type"
    )
    path = _rt_path(sf_dir, "orc", "part")
    write_orc(part, path)
    back = read_orc(
        spark, path, columns=["p_brand", "p_size", "p_partkey"],
        filters="p_size <= 25",
    )
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p_size").alias("size_sum"),
            F.sum("p_partkey").alias("key_sum"),
        )
        .orderBy("p_brand")
    )


IO_ORC_SQL = """
SELECT p_brand, COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS size_sum,
       CAST(SUM(p_partkey) AS BIGINT) AS key_sum
FROM part WHERE p_size <= 25 GROUP BY p_brand ORDER BY p_brand
"""


def io_json_roundtrip(spark, sf_dir):
    """read_json/write_json (json.hpp:308) end-to-end: JSON-lines
    directory written distributed, read back with schema inference
    (alphabetical column order — the aggregate is order-insensitive)."""
    from pygdf_spark.queries._util import T
    from pygdf_spark.sources.io import read_json, write_json

    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    path = _rt_path(sf_dir, "json", "customer")
    write_json(cust, path)
    back = read_json(spark, path)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").alias("key_sum"),
            F.sum("c_nationkey").alias("nat_sum"),
        )
        .orderBy("c_mktsegment")
    )


IO_JSON_SQL = """
SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       CAST(SUM(c_nationkey) AS BIGINT) AS nat_sum
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def io_feather_roundtrip(spark, sf_dir):
    """read_feather/write_feather (io/feather.py) end-to-end — the
    reference's documented host-interop path (pyarrow round-trip),
    exercised on the fixed-size region dimension."""
    from pygdf_spark.queries._util import T
    from pygdf_spark.sources.io import read_feather, write_feather

    region = T(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = _rt_path(sf_dir, "feather", "region") + ".feather"
    write_feather(region, path)
    back = read_feather(spark, path)
    return back.select(
        "r_regionkey", "r_name", F.length("r_name").alias("name_len")
    ).orderBy("r_regionkey")


IO_FEATHER_SQL = """
SELECT r_regionkey, r_name, CAST(LENGTH(r_name) AS INT) AS name_len
FROM region ORDER BY r_regionkey
"""


def mi_xs_level(spark, sf_dir):
    """MultiIndex cross-section through the pandas-compat veneer
    (reference core/multiindex.py xs; r2-verdict task #6 surface):
    2-key groupby multi-agg → column-xs on the value level → row-xs on
    the leading key. Both xs ops are pure projection/filter on the
    distributed frame (the row-xs filter pushes to the scan) — the
    veneer adds labels, not work."""
    import pygdf_spark as gd

    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_custkey"
    )
    out = gd.from_spark(o).groupby(["o_orderpriority", "o_orderstatus"]).agg(
        {"o_custkey": ["sum", "max"]}
    )
    sl = out.xs("o_custkey", axis=1, level=0)  # keys + sum/max columns
    # level= names the key column explicitly: the 2-level column-xs
    # result is flat, so the grouped-key metadata is gone
    row = sl.xs("1-URGENT", level="o_orderpriority")
    return (
        row.spark.select(
            "o_orderstatus",
            F.col("sum").cast("long").alias("custkey_sum"),
            F.col("max").cast("long").alias("custkey_max"),
        )
        .orderBy("o_orderstatus")
    )


MI_XS_SQL = """
SELECT o_orderstatus, CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum,
       CAST(MAX(o_custkey) AS BIGINT) AS custkey_max
FROM orders WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def mi_row_roundtrip(spark, sf_dir):
    """Row-wise MultiIndex workflow through the pandas-compat veneer
    (reference core/multiindex.py; r6-verdict task #7): set_index over
    two key columns → groupby(level=[0,1]) sum → unstack the status
    level into columns → reset_index back to a flat frame. The index
    levels are hidden ordinary columns, so every step is a plain keyed
    shuffle/pivot — the veneer adds labels, not work."""
    import pygdf_spark as gd

    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_custkey"
    )
    g = gd.from_spark(o).set_index(["o_orderpriority", "o_orderstatus"])
    assert g.index_names == ["o_orderpriority", "o_orderstatus"]
    summed = g.groupby(level=[0, 1]).agg({"o_custkey": "sum"})
    wide = summed.unstack(level="o_orderstatus")
    flat = wide.reset_index()
    return flat.spark.select(
        "o_orderpriority",
        F.col("F").cast("long").alias("sum_f"),
        F.col("O").cast("long").alias("sum_o"),
        F.col("P").cast("long").alias("sum_p"),
    ).orderBy("o_orderpriority")


MI_ROW_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS BIGINT) AS sum_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN o_custkey END) AS BIGINT) AS sum_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN o_custkey END) AS BIGINT) AS sum_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def profile_documents(spark, sf_dir):
    """ONE-PASS column profiler over the documents table — the
    data-QA summary every training-data pipeline runs before touching
    a new corpus drop: per column, row count, null count, EXACT
    distinct count, and (stringified, 32-char-capped) min/max. All
    measures ride a single aggregate over one scan (Spark plans the
    multi-distinct via expand — still one pass over the data, fully
    partial-aggregable), then unpivot driver-free via ``stack``. At
    100 TB this is exactly one shuffle of pre-aggregated partials.
    The oracle is the per-column UNION ALL of the same measures."""
    d = T(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "n_chars", "source", "text"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = d.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, "
        f"substring({c}__min, 1, 32), substring({c}__max, 1, 32)"
        for c in cols
    )
    return row.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stacked}) AS "
        "(col_name, n_nulls, n_distinct, min_s, max_s)",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s"
    ).orderBy("col_name")


def _profile_sql_one(c: str) -> str:
    return f"""
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       substr(CAST(MIN({c}) AS VARCHAR), 1, 32) AS min_s,
       substr(CAST(MAX({c}) AS VARCHAR), 1, 32) AS max_s
FROM documents"""


PROFILE_DOCUMENTS_SQL = (
    "WITH p AS ("
    + " UNION ALL ".join(
        _profile_sql_one(c)
        for c in ["doc_id", "lang", "n_chars", "source", "text"]
    )
    + ") SELECT * FROM p ORDER BY col_name"
)


QUERIES = {
    "mi_xs_level": mi_xs_level,
    "mi_row_roundtrip": mi_row_roundtrip,
    "transpose_small": transpose_small,
    "groupby_describe": groupby_describe,
    "rolling_apply_fold": rolling_apply_fold,
    "str_convert_pack": str_convert_pack,
    "io_avro_roundtrip": io_avro_roundtrip,
    "io_csv_roundtrip": io_csv_roundtrip,
    "io_csv_options": io_csv_options,
    "io_orc_roundtrip": io_orc_roundtrip,
    "io_json_roundtrip": io_json_roundtrip,
    "io_feather_roundtrip": io_feather_roundtrip,
    "profile_documents": profile_documents,
}

ORACLE = {
    "mi_xs_level": MI_XS_SQL,
    "mi_row_roundtrip": MI_ROW_SQL,
    "transpose_small": TRANSPOSE_SQL,
    "groupby_describe": DESCRIBE_SQL,
    "rolling_apply_fold": ROLLING_APPLY_SQL,
    "str_convert_pack": STR_CONVERT_SQL,
    "io_avro_roundtrip": IO_AVRO_SQL,
    "io_csv_roundtrip": IO_CSV_SQL,
    "io_csv_options": IO_CSV_OPTIONS_SQL,
    "io_orc_roundtrip": IO_ORC_SQL,
    "io_json_roundtrip": IO_JSON_SQL,
    "io_feather_roundtrip": IO_FEATHER_SQL,
    "profile_documents": PROFILE_DOCUMENTS_SQL,
}

"""Type-system queries (SURVEY.md §1.2): the cast matrix (unary.hpp:111),
unsigned-integer widening rules (UINT8→Short … UINT64→Decimal(20,0) —
Spark has no unsigned types), decimal32/64 arithmetic semantics
(Decimal64Dtype core/dtypes.py:419 — cuDF caps precision at 18, Spark
extends to 38), and dictionary encode/decode
(dictionary/encode.hpp:57,76) as a code⇄value mapping.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec


def cast_matrix_pack(spark, sf_dir):
    """cast (unary.hpp:111) across the §1.2 mapping: numeric widen/
    narrow, string⇄number, date⇄timestamp, bool⇄int — plus the unsigned
    widening rules (UINT32→Long, UINT64→Decimal(20,0))."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.cast("int").alias("as_i32"),
        k.cast("smallint").alias("as_i16_of_small"),       # values < 2000: lossless
        (k % 100).cast("tinyint").alias("as_i8"),
        k.cast("double").alias("as_f64"),
        k.cast("string").alias("as_str"),
        (k % 2 == 0).cast("int").alias("bool_as_int"),
        # the decimal/date casts are the exercised semantics; the OUTPUT
        # boundary re-casts to double/bigint/timestamp so the driver
        # hasher never sees Decimal/date objects
        F.col("o_totalprice").cast("decimal(18,4)").cast("double").alias("as_dec18_4"),
        # UINT64 widening rule: value reinterpreted into decimal(20,0)
        k.cast("decimal(20,0)").cast("long").alias("u64_as_dec20"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("ts_as_date"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("date_as_ts"),
        F.concat(F.lit("4"), (k % 10).cast("string")).cast("long").alias("str_as_i64"),
    ).orderBy("o_orderkey")


CAST_MATRIX_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey AS INT) AS as_i32,
       CAST(o_orderkey AS SMALLINT) AS as_i16_of_small,
       CAST(o_orderkey % 100 AS TINYINT) AS as_i8,
       CAST(o_orderkey AS DOUBLE) AS as_f64,
       CAST(o_orderkey AS VARCHAR) AS as_str,
       CAST(o_orderkey % 2 = 0 AS INT) AS bool_as_int,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS as_dec18_4,
       CAST(CAST(o_orderkey AS DECIMAL(20,0)) AS BIGINT) AS u64_as_dec20,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS ts_as_date,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS date_as_ts,
       CAST('4' || CAST(o_orderkey % 10 AS VARCHAR) AS BIGINT) AS str_as_i64
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
"""


def decimal_arith_pack(spark, sf_dir):
    """decimal32/64 semantics (core/dtypes.py:311,419): fixed-point
    add/mul/div with explicit precision/scale results; cuDF caps at
    precision 18, we document Spark's 38-cap as the superset and keep
    every result inside 18 for parity."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    p = dec("l_extendedprice")            # decimal(12,2)
    d = F.col("l_discount").cast("decimal(4,3)")
    t = F.col("l_tax").cast("decimal(4,3)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # arithmetic stays in exact fixed-point; one double cast at the
        # output boundary (all results ≤1e13 at scale ≤8: double-exact)
        p.cast("double").alias("price"),
        (p + p).cast("decimal(13,2)").cast("double").alias("dec_add"),
        (p * d).cast("decimal(16,5)").cast("double").alias("dec_mul"),
        (p * (F.lit(1).cast("decimal(2,0)") - d) * (F.lit(1).cast("decimal(2,0)") + t))
        .cast("decimal(18,8)").cast("double").alias("dec_chain"),
        (p / F.lit(4).cast("decimal(2,0)")).cast("decimal(16,6)").cast("double").alias("dec_div"),
        F.round(p * d, 2).cast("decimal(14,2)").cast("double").alias("dec_round"),
    ).orderBy("l_orderkey", "l_linenumber")


DECIMAL_ARITH_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) + CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(13,2)) AS DOUBLE) AS dec_add,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,3)) AS DECIMAL(16,5)) AS DOUBLE) AS dec_mul,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,3)))
            * (1 + CAST(l_tax AS DECIMAL(4,3))) AS DECIMAL(18,8)) AS DOUBLE) AS dec_chain,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) / 4 AS DECIMAL(16,6)) AS DOUBLE) AS dec_div,
       CAST(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,3)), 2) AS DECIMAL(14,2)) AS DOUBLE) AS dec_round
FROM lineitem WHERE l_orderkey < 2000 ORDER BY l_orderkey, l_linenumber
"""


def dict_encode_decode(spark, sf_dir):
    """dictionary encode/decode (dictionary/encode.hpp:57,76): build the
    value→code dictionary (dense ranks over the distinct domain), encode
    the column, then decode back via a broadcast join — the §1.2
    categorical-as-dim-table representation."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    domain = o.select("o_orderpriority").distinct()
    codes = domain.withColumn(
        "code", F.dense_rank().over(Window.orderBy("o_orderpriority")) - 1
    )
    encoded = o.join(F.broadcast(codes), "o_orderpriority")
    decoded = encoded.join(
        F.broadcast(codes.withColumnsRenamed({"o_orderpriority": "decoded", "code": "code2"})),
        F.col("code") == F.col("code2"),
    )
    return (
        decoded.groupBy("code", "o_orderpriority", "decoded")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("roundtrip_ok", F.col("o_orderpriority") == F.col("decoded"))
        .orderBy("code")
    )


DICT_ENCODE_SQL = """
WITH codes AS (
  SELECT o_orderpriority, DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS code
  FROM (SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderkey < 2000)
)
SELECT c.code AS code, o.o_orderpriority, c2.o_orderpriority AS decoded, COUNT(*) AS n,
       o.o_orderpriority = c2.o_orderpriority AS roundtrip_ok
FROM (SELECT * FROM orders WHERE o_orderkey < 2000) o
JOIN codes c ON o.o_orderpriority = c.o_orderpriority
JOIN codes c2 ON c.code = c2.code
GROUP BY 1, 2, 3 ORDER BY c.code
"""


def interval_range_ops(spark, sf_dir):
    """IntervalDtype as struct(left,right) (core/dtypes.py:527) +
    interval_range (core/index.py:2620) + interval membership: the
    boundary table is built with `sequence` and BROADCAST against the
    fact side — a range join whose build side is the (tiny) interval
    list, the shape that scales."""
    o = T(spark, sf_dir, "orders")
    iv = spark.range(1).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(250000), F.lit(50000)),
                lambda lo: F.struct(lo.alias("left"), (lo + 50000).alias("right")),
            )
        ).alias("iv")
    ).select("iv.left", "iv.right")
    price = dec("o_totalprice")
    joined = o.join(
        F.broadcast(iv),
        (price >= F.col("left")) & (price < F.col("right")),
        "inner",
    )
    return (
        joined.groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("first_key"))
        .orderBy("left")
    )


INTERVAL_RANGE_SQL = """
WITH iv AS (
  SELECT lo AS "left", lo + 50000 AS "right"
  FROM (SELECT UNNEST(generate_series(0, 250000, 50000)) AS lo)
)
SELECT iv."left" AS "left", iv."right" AS "right", COUNT(*) AS n, MIN(o_orderkey) AS first_key
FROM orders o JOIN iv
  ON CAST(o.o_totalprice AS DECIMAL(12,2)) >= iv."left"
 AND CAST(o.o_totalprice AS DECIMAL(12,2)) < iv."right"
GROUP BY 1, 2 ORDER BY "left"
"""


def interval_contains(spark, sf_dir):
    """IntervalIndex containment join (core/index.py:2758, core/cut.py:15)
    at scale: 26 weekly 3-day maintenance windows derived from the events
    timeline, joined to the event stream through the BUCKETIZED range
    join (operators/range_join.py) — interval side replicated per
    covering bucket map-side, points bucketed into exactly one bucket,
    equi-join + residual trim; no cartesian/BNLJ anywhere."""
    from pygdf_spark.operators.range_join import range_join
    from pygdf_spark.queries._util import events_ts

    e = events_ts(spark, sf_dir)
    t0 = e.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    iv = (
        t0.select(F.explode(F.sequence(F.lit(0), F.lit(25))).alias("win_id"), "t0")
        .select(
            "win_id",
            F.expr("timestampadd(DAY, 7 * win_id, t0)").alias("w_start"),
            F.expr("timestampadd(DAY, 7 * win_id + 3, t0)").alias("w_end"),
        )
    )
    joined = range_join(
        e.select("event_id", "user_id", "ts"), iv, "ts", "w_start", "w_end",
        bucket_width_sec=3 * 86400,
    )
    return (
        joined.groupBy("win_id", "w_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("first_event"),
        )
        .orderBy("win_id")
    )


INTERVAL_CONTAINS_SQL = """
WITH t0 AS (SELECT date_trunc('day', MIN(CAST(ts AS TIMESTAMP))) AS t0 FROM events),
iv AS (
  SELECT i AS win_id,
         t0 + i * INTERVAL 7 DAY AS w_start,
         t0 + i * INTERVAL 7 DAY + INTERVAL 3 DAY AS w_end
  FROM (SELECT UNNEST(generate_series(0, 25)) AS i), t0
)
SELECT win_id, w_start, COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       MIN(event_id) AS first_event
FROM events e
JOIN iv ON CAST(e.ts AS TIMESTAMP) >= iv.w_start AND CAST(e.ts AS TIMESTAMP) < iv.w_end
GROUP BY 1, 2 ORDER BY win_id
"""


def cat_accessor(spark, sf_dir):
    """CategoricalAccessor (core/column/categorical.py:56,
    core/dtypes.py:29) through the compat veneer: derived sorted
    categories, per-row codes, decode roundtrip, and an add_categories
    dictionary edit — all over the bounded o_orderpriority domain."""
    from pygdf_spark.core.dataframe import from_spark

    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_orderpriority")
    )
    g = from_spark(o)
    acc = g["o_orderpriority"].cat
    cats = acc.categories
    widened = acc.add_categories(["9-UNKNOWN"])
    arr = F.array(*[F.lit(v) for v in cats])
    return (
        g._sdf.select(
            "o_orderkey",
            "o_orderpriority",
            acc.codes.alias("code"),
            F.element_at(arr, acc.codes + 1).alias("decoded"),
            F.lit(len(cats)).cast("int").alias("n_cats"),
            # the widened dictionary shifts no existing codes (append-only)
            widened.codes.alias("code_widened"),
            F.lit(len(widened.categories)).cast("int").alias("n_cats_widened"),
        ).orderBy("o_orderkey")
    )


CAT_ACCESSOR_SQL = """
WITH cats AS (
  SELECT o_orderpriority AS cat,
         ROW_NUMBER() OVER (ORDER BY o_orderpriority) - 1 AS code
  FROM (SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderkey < 2000)
), n AS (SELECT COUNT(*) AS n_cats FROM cats)
SELECT o.o_orderkey, o.o_orderpriority,
       CAST(c.code AS INT) AS code,
       c.cat AS decoded,
       CAST(n.n_cats AS INT) AS n_cats,
       CAST(c.code AS INT) AS code_widened,
       CAST(n.n_cats + 1 AS INT) AS n_cats_widened
FROM orders o JOIN cats c ON o.o_orderpriority = c.cat CROSS JOIN n
WHERE o.o_orderkey < 2000
ORDER BY o.o_orderkey
"""


def byte_cast_pack(spark, sf_dir):
    """byte_cast (reshape.hpp:95): reinterpret fixed-width values as
    their byte lists, big- and little-endian, plus the i32 view — pure
    shift/mask arithmetic, fully inside whole-stage codegen."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")

    def byte_at(col, pos):  # pos-th byte, 0 = most significant of 8
        return F.shiftright(col, 8 * (7 - pos)).bitwiseAND(F.lit(255)).cast("int")

    be = [byte_at(k, i) for i in range(8)]
    i32 = k.cast("int").cast("long")
    be32 = [F.shiftright(i32, 8 * (3 - i)).bitwiseAND(F.lit(255)).cast("int") for i in range(4)]
    # byte lists stringified: the driver canonicalizer sorts with pandas,
    # which cannot hash list cells (r3 hash-fail root cause)
    return o.select(
        "o_orderkey",
        F.array_join(F.array(*be), ",").alias("bytes_be"),
        F.array_join(F.array(*reversed(be)), ",").alias("bytes_le"),
        F.array_join(F.array(*be32), ",").alias("bytes_be_i32"),
        be[7].alias("lo_byte"),
    ).orderBy("o_orderkey")


BYTE_CAST_SQL = """
SELECT o_orderkey,
       array_to_string([CAST((o_orderkey >> 56) & 255 AS INT), CAST((o_orderkey >> 48) & 255 AS INT),
        CAST((o_orderkey >> 40) & 255 AS INT), CAST((o_orderkey >> 32) & 255 AS INT),
        CAST((o_orderkey >> 24) & 255 AS INT), CAST((o_orderkey >> 16) & 255 AS INT),
        CAST((o_orderkey >> 8) & 255 AS INT),  CAST(o_orderkey & 255 AS INT)], ',') AS bytes_be,
       array_to_string([CAST(o_orderkey & 255 AS INT),         CAST((o_orderkey >> 8) & 255 AS INT),
        CAST((o_orderkey >> 16) & 255 AS INT), CAST((o_orderkey >> 24) & 255 AS INT),
        CAST((o_orderkey >> 32) & 255 AS INT), CAST((o_orderkey >> 40) & 255 AS INT),
        CAST((o_orderkey >> 48) & 255 AS INT), CAST((o_orderkey >> 56) & 255 AS INT)], ',') AS bytes_le,
       array_to_string([CAST((o_orderkey >> 24) & 255 AS INT), CAST((o_orderkey >> 16) & 255 AS INT),
        CAST((o_orderkey >> 8) & 255 AS INT),  CAST(o_orderkey & 255 AS INT)], ',') AS bytes_be_i32,
       CAST(o_orderkey & 255 AS INT) AS lo_byte
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
"""


QUERIES = {
    "interval_range_ops": interval_range_ops,
    "cast_matrix_pack": cast_matrix_pack,
    "decimal_arith_pack": decimal_arith_pack,
    "dict_encode_decode": dict_encode_decode,
    "cat_accessor": cat_accessor,
    "interval_contains": interval_contains,
    "byte_cast_pack": byte_cast_pack,
}

ORACLE = {
    "cat_accessor": CAT_ACCESSOR_SQL,
    "interval_contains": INTERVAL_CONTAINS_SQL,
    "interval_range_ops": INTERVAL_RANGE_SQL,
    "cast_matrix_pack": CAST_MATRIX_SQL,
    "decimal_arith_pack": DECIMAL_ARITH_SQL,
    "dict_encode_decode": DICT_ENCODE_SQL,
    "byte_cast_pack": BYTE_CAST_SQL,
}

"""Scalar math queries (SURVEY.md §2.9): the unary-op family
(unary.hpp:30-66), binary-op family (binaryop.hpp:36-70), null/NaN
handling (replace.hpp:50-268), and round-mode semantics (round.hpp:70
HALF_UP / HALF_EVEN).

Determinism notes:
- transcendentals are rounded to 8 dp — Spark (JVM Math) and DuckDB
  (libm) can differ in the final ulp, which the rounding absorbs.
- integer/bitwise/decimal arithmetic is exact on both engines.
- HALF_EVEN (bround) has no DuckDB builtin: the oracle re-derives it
  from exact integer cents, which doubles as an independent check of
  Spark's banker's rounding.
- NaN is injected deterministically (quantity divisible by 7) on both
  sides; NaN-vs-null semantics follow Spark's "NaN is a value, null is
  absence" (SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec


def unary_math_pack(spark, sf_dir):
    """SIN..ARCTANH, EXP/LOG/SQRT/CBRT/CEIL/FLOOR/ABS (unary.hpp:30-66)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    x = F.col("l_discount")                      # 0.00-0.10: safe for atanh
    u = F.col("l_quantity").cast("double") / 50  # 0-1: safe for asin/acos
    p = F.col("l_extendedprice")
    q = F.col("l_quantity").cast("double")
    r8 = lambda c: F.round(c, 8)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r8(F.sin(q)).alias("sin_q"),
        r8(F.cos(q)).alias("cos_q"),
        r8(F.tan(x)).alias("tan_x"),
        r8(F.asin(u)).alias("asin_u"),
        r8(F.acos(u)).alias("acos_u"),
        r8(F.atan(q)).alias("atan_q"),
        r8(F.sinh(x)).alias("sinh_x"),
        r8(F.cosh(x)).alias("cosh_x"),
        r8(F.tanh(x)).alias("tanh_x"),
        r8(F.atanh(x)).alias("atanh_x"),
        # Spark ASINH/ACOSH evaluate log(x+sqrt(x²±1)) — the oracle
        # spells the same formula, so doubles agree bitwise
        r8(F.asinh(q)).alias("asinh_q"),
        r8(F.acosh(q + 1)).alias("acosh_q"),
        r8(F.exp(x)).alias("exp_x"),
        r8(F.log(p)).alias("ln_p"),
        r8(F.sqrt(p)).alias("sqrt_p"),
        r8(F.cbrt(p)).alias("cbrt_p"),
        F.ceil(p).alias("ceil_p"),
        F.floor(p).alias("floor_p"),
        F.abs(q - 25).alias("abs_qc"),
        # RINT: round-half-even to integral double (unary.hpp RINT)
        F.rint(p).alias("rint_p"),
        # BIT_INVERT: two's-complement ~ on int64
        F.bitwise_not(F.col("l_orderkey")).alias("bitnot_ok"),
    ).orderBy("l_orderkey", "l_linenumber")


UNARY_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(sin(CAST(l_quantity AS DOUBLE)), 8) AS sin_q,
       ROUND(cos(CAST(l_quantity AS DOUBLE)), 8) AS cos_q,
       ROUND(tan(l_discount), 8) AS tan_x,
       ROUND(asin(CAST(l_quantity AS DOUBLE) / 50), 8) AS asin_u,
       ROUND(acos(CAST(l_quantity AS DOUBLE) / 50), 8) AS acos_u,
       ROUND(atan(CAST(l_quantity AS DOUBLE)), 8) AS atan_q,
       ROUND((exp(l_discount) - exp(-l_discount)) / 2, 8) AS sinh_x,
       ROUND((exp(l_discount) + exp(-l_discount)) / 2, 8) AS cosh_x,
       ROUND((exp(l_discount) - exp(-l_discount)) / (exp(l_discount) + exp(-l_discount)), 8) AS tanh_x,
       ROUND(0.5 * ln((1 + l_discount) / (1 - l_discount)), 8) AS atanh_x,
       ROUND(ln(CAST(l_quantity AS DOUBLE) + sqrt(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) + 1)), 8) AS asinh_q,
       ROUND(ln((CAST(l_quantity AS DOUBLE) + 1) + sqrt((CAST(l_quantity AS DOUBLE) + 1) * (CAST(l_quantity AS DOUBLE) + 1) - 1)), 8) AS acosh_q,
       ROUND(exp(l_discount), 8) AS exp_x,
       ROUND(ln(l_extendedprice), 8) AS ln_p,
       ROUND(sqrt(l_extendedprice), 8) AS sqrt_p,
       ROUND(cbrt(l_extendedprice), 8) AS cbrt_p,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
       abs(CAST(l_quantity AS DOUBLE) - 25) AS abs_qc,
       -- RINT half-even: exact tie test (x.5 is binary-exact)
       CASE WHEN l_extendedprice - floor(l_extendedprice) = 0.5
            THEN floor(l_extendedprice) + CAST(CAST(floor(l_extendedprice) AS BIGINT) % 2 AS DOUBLE)
            ELSE round(l_extendedprice, 0) END AS rint_p,
       ~l_orderkey AS bitnot_ok
FROM lineitem WHERE l_orderkey < 2000 ORDER BY l_orderkey, l_linenumber
"""


def binary_ops_pack(spark, sf_dir):
    """ADD..POW, MOD/PMOD, shifts, bitwise, NULL_EQUALS, NULL_MAX/MIN
    (binaryop.hpp:36-70)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    a = F.col("l_orderkey")
    b = F.col("l_partkey")
    s = (F.col("l_quantity").cast("int") - 25).alias("s")  # signed
    k = (F.col("l_suppkey") % 5 + 1).cast("int")
    nul = F.when(F.col("l_linenumber") % 3 == 0, F.col("l_linenumber")).cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (a + b).alias("add_ab"),
        (a - b).alias("sub_ab"),
        (a * b).alias("mul_ab"),
        (a.cast("double") / b).alias("truediv_ab"),
        F.floor(a / b).cast("long").alias("floordiv_ab"),
        (s % k).alias("cmod_sk"),
        F.pmod(s, k).alias("pmod_sk"),
        F.pow(F.lit(2.0), k).alias("pow_2k"),
        F.round(F.log(3.0, (b + 1).cast("double")), 8).alias("log3_b"),
        F.shiftleft(k, 2).alias("shl_k2"),
        F.shiftright(b, 3).alias("shr_b3"),
        a.bitwiseAND(b).alias("band_ab"),
        a.bitwiseOR(b).alias("bor_ab"),
        a.bitwiseXOR(b).alias("bxor_ab"),
        nul.eqNullSafe(F.lit(3)).alias("nulleq_3"),
        F.greatest(s, nul).alias("nmax"),
        F.least(s, nul).alias("nmin"),
    ).orderBy("l_orderkey", "l_linenumber")


BINARY_OPS_SQL = """
SELECT l_orderkey, l_linenumber,
       l_orderkey + l_partkey AS add_ab,
       l_orderkey - l_partkey AS sub_ab,
       l_orderkey * l_partkey AS mul_ab,
       CAST(l_orderkey AS DOUBLE) / l_partkey AS truediv_ab,
       CAST(FLOOR(CAST(l_orderkey AS DOUBLE) / l_partkey) AS BIGINT) AS floordiv_ab,
       CAST(s % k AS INT) AS cmod_sk,
       CAST(((s % k) + k) % k AS INT) AS pmod_sk,
       pow(2.0, k) AS pow_2k,
       ROUND(ln(CAST(l_partkey + 1 AS DOUBLE)) / ln(3.0), 8) AS log3_b,
       CAST(k * 4 AS INT) AS shl_k2,
       CAST(l_partkey // 8 AS BIGINT) AS shr_b3,
       l_orderkey & l_partkey AS band_ab,
       l_orderkey | l_partkey AS bor_ab,
       xor(l_orderkey, l_partkey) AS bxor_ab,
       nul IS NOT DISTINCT FROM 3 AS nulleq_3,
       CAST(CASE WHEN nul IS NULL THEN s WHEN s IS NULL THEN nul
                 WHEN s >= nul THEN s ELSE nul END AS INT) AS nmax,
       CAST(CASE WHEN nul IS NULL THEN s WHEN s IS NULL THEN nul
                 WHEN s <= nul THEN s ELSE nul END AS INT) AS nmin
FROM (
  SELECT *,
         CAST(l_quantity AS INT) - 25 AS s,
         CAST(l_suppkey % 5 + 1 AS INT) AS k,
         CASE WHEN l_linenumber % 3 = 0 THEN CAST(l_linenumber AS INT) END AS nul
  FROM lineitem WHERE l_orderkey < 2000
)
ORDER BY l_orderkey, l_linenumber
"""


def null_nan_pack(spark, sf_dir):
    """replace_nulls / replace_nans / nans_to_nulls / isnull family
    (replace.hpp:50-268, frame.py:1193, series.py:2683)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    nanv = F.when(F.col("l_quantity") % 7 == 0, F.lit(float("nan"))).otherwise(
        F.col("l_discount")
    )
    nullv = F.when(F.col("l_linenumber") % 2 == 0, F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.isnan(nanv).alias("is_nan"),
        F.nanvl(nanv, F.lit(-1.0)).alias("nan_replaced"),
        F.when(F.isnan(nanv), None).otherwise(nanv).alias("nan_to_null"),
        nullv.isNull().alias("is_null"),
        nullv.isNotNull().alias("is_valid"),
        F.coalesce(nullv, F.lit(0.99)).alias("filled"),
        F.nullif(F.col("l_linenumber"), F.lit(1)).alias("nullif_1"),
        F.nvl2(nullv, F.lit("present"), F.lit("absent")).alias("nvl2_tag"),
    ).orderBy("l_orderkey", "l_linenumber")


NULL_NAN_SQL = """
SELECT l_orderkey, l_linenumber,
       isnan(nanv) AS is_nan,
       CASE WHEN isnan(nanv) THEN -1.0 ELSE nanv END AS nan_replaced,
       CASE WHEN isnan(nanv) THEN NULL ELSE nanv END AS nan_to_null,
       nullv IS NULL AS is_null,
       nullv IS NOT NULL AS is_valid,
       COALESCE(nullv, 0.99) AS filled,
       nullif(l_linenumber, 1) AS nullif_1,
       CASE WHEN nullv IS NOT NULL THEN 'present' ELSE 'absent' END AS nvl2_tag
FROM (
  SELECT *,
         CASE WHEN l_quantity % 7 = 0 THEN 'NaN'::DOUBLE ELSE l_discount END AS nanv,
         CASE WHEN l_linenumber % 2 = 0 THEN l_tax END AS nullv
  FROM lineitem WHERE l_orderkey < 2000
)
ORDER BY l_orderkey, l_linenumber
"""


def rounding_pack(spark, sf_dir):
    """round HALF_UP vs HALF_EVEN (round.hpp:70) on exact cents; the
    oracle independently re-derives banker's rounding from integer
    cents, so Spark's bround is cross-checked, not mirrored."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    x = dec("l_extendedprice")  # decimal(12,2): exact cents
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # rounding happens in exact decimal; the output boundary is DOUBLE
        # (scale ≤1 values are double-exact) so the driver hasher never
        # sees Decimal objects (spark-graft-oracle-determinism)
        F.round(x, 1).cast("decimal(12,1)").cast("double").alias("round_half_up_1"),
        F.bround(x, 1).cast("decimal(12,1)").cast("double").alias("round_half_even_1"),
        F.round(x, 0).cast("decimal(12,0)").cast("double").alias("round_half_up_0"),
        F.round(x, -2).cast("decimal(12,0)").cast("double").alias("round_hundreds"),
    ).orderBy("l_orderkey", "l_linenumber")


ROUNDING_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(ROUND(x, 1) AS DECIMAL(12,1)) AS DOUBLE) AS round_half_up_1,
       CAST(CAST(CAST(tenths + (CASE WHEN rem > 5 THEN 1 WHEN rem < 5 THEN 0
                                ELSE tenths % 2 END) AS DECIMAL(12,0)) / 10 AS DECIMAL(12,1))
         AS DOUBLE) AS round_half_even_1,
       CAST(CAST(ROUND(x, 0) AS DECIMAL(12,0)) AS DOUBLE) AS round_half_up_0,
       CAST(CAST(ROUND(x, -2) AS DECIMAL(12,0)) AS DOUBLE) AS round_hundreds
FROM (
  SELECT *,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS x,
         CAST(l_extendedprice * 100 AS BIGINT) // 10 AS tenths,
         CAST(l_extendedprice * 100 AS BIGINT) % 10 AS rem
  FROM lineitem WHERE l_orderkey < 2000
)
ORDER BY l_orderkey, l_linenumber
"""


QUERIES = {
    "unary_math_pack": unary_math_pack,
    "binary_ops_pack": binary_ops_pack,
    "null_nan_pack": null_nan_pack,
    "rounding_pack": rounding_pack,
}

ORACLE = {
    "unary_math_pack": UNARY_MATH_SQL,
    "binary_ops_pack": BINARY_OPS_SQL,
    "null_nan_pack": NULL_NAN_SQL,
    "rounding_pack": ROUNDING_SQL,
}

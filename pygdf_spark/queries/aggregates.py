"""Aggregation queries (SURVEY.md §2.4): the cuDF aggregation-kind
inventory (cpp/include/cudf/aggregation.hpp:60-88) re-expressed as
Spark aggregates with partial/final hash aggregation (the same two-phase
shape as dask_cudf/groupby.py:153's partial→tree-reduce→finalize).

Determinism: statistical moments (VARIANCE/STD/M2, skew, kurtosis,
corr/cov) are computed from exact integer/decimal power sums with one
final double formula evaluated identically by Spark and DuckDB, instead
of the order-dependent streaming accumulators.

Reference parity:
- SUM/MIN/MAX/COUNT/MEAN      : aggregation.hpp:60-71; groupby.py:690-747
- VARIANCE/STD/M2             : aggregation.hpp:71-73 (M2 combiner :88)
- ARGMIN/ARGMAX (idxmin/max)  : aggregation.hpp:76-77; group_argmax.cu
- NUNIQUE                     : aggregation.hpp:78; group_nunique.cu
- COLLECT_LIST/SET            : aggregation.hpp:80-81; group_collect.cu
- ANY/ALL                     : aggregation.hpp:66-67
- QUANTILE/MEDIAN             : aggregation.hpp:74-75; group_quantiles.cu
- PRODUCT                     : aggregation.hpp:61
- corr/cov (frame-level)      : series.py:4933 / :4890
- skew/kurtosis               : dataframe.py method list
- cube/rollup                 : net-new Spark surface (SURVEY §2.4 bonus)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec, spread


def agg_basic_stats(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
        .orderBy("l_returnflag")
    )


AGG_BASIC_SQL = """
SELECT l_returnflag, COUNT(*) AS n, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       COUNT(DISTINCT l_partkey) AS n_parts,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_moments(spark, sf_dir):
    """VARIANCE/STD/skew/kurtosis from exact integer power sums
    (M2/M3/M4 decomposition — the distributed-combiner form of
    aggregation.hpp:73/:88, dask_cudf/groupby.py var path)."""
    li = T(spark, sf_dir, "lineitem").withColumn("q", F.col("l_quantity").cast("long"))
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").cast("double").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).cast("double").alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 - s1 * s1 / n  # = sum((x-mean)^2) * 1
    var_samp = m2 / (n - 1)
    std = F.sqrt(var_samp)
    # central moments via raw-sum expansion (identical algebra in oracle)
    c3 = s3 - 3 * mean * s2 + 2 * mean * mean * s1
    c4 = s4 - 4 * mean * s3 + 6 * mean * mean * s2 - 3 * mean * mean * mean * s1
    pop_var = m2 / n
    skew = (c3 / n) / F.pow(pop_var, 1.5)
    kurt = (c4 / n) / (pop_var * pop_var) - 3
    return sums.select(
        "l_returnflag",
        F.round(mean, 10).alias("mean_qty"),
        F.round(var_samp, 10).alias("var_qty"),
        F.round(std, 10).alias("std_qty"),
        F.round(skew, 10).alias("skew_qty"),
        F.round(kurt, 10).alias("kurt_qty"),
    ).orderBy("l_returnflag")


AGG_MOMENTS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(q) AS DOUBLE) AS s1,
         CAST(SUM(q*q) AS DOUBLE) AS s2,
         CAST(SUM(q*q*q) AS DOUBLE) AS s3,
         CAST(SUM(q*q*q*q) AS DOUBLE) AS s4
  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(s1/n, 10) AS mean_qty,
       ROUND((s2 - s1*s1/n) / (n-1), 10) AS var_qty,
       ROUND(SQRT((s2 - s1*s1/n) / (n-1)), 10) AS std_qty,
       ROUND(((s3 - 3*(s1/n)*s2 + 2*(s1/n)*(s1/n)*s1) / n) / POW((s2 - s1*s1/n)/n, 1.5), 10) AS skew_qty,
       ROUND(((s4 - 4*(s1/n)*s3 + 6*(s1/n)*(s1/n)*s2 - 3*(s1/n)*(s1/n)*(s1/n)*s1) / n) / POW((s2 - s1*s1/n)/n, 2) - 3, 10) AS kurt_qty
FROM sums ORDER BY l_returnflag
"""


def agg_quantiles(spark, sf_dir):
    """QUANTILE with linear interpolation (group_quantiles.cu;
    interpolation enum types.hpp) — exact percentile at quarter points
    on integer-valued data is deterministic in both engines."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.median("l_quantity").alias("q50"),
            F.percentile("l_quantity", 0.75).alias("q75"),
        )
        .orderBy("l_linestatus")
    )


AGG_QUANTILES_SQL = """
SELECT l_linestatus,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.50) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


def agg_quantile_interp(spark, sf_dir):
    """QUANTILE with the full interpolation enum (types.hpp
    interpolation: LINEAR/LOWER/HIGHER/NEAREST/MIDPOINT; cuDF
    Series.quantile interpolation=). Spark's percentile is LINEAR-only,
    so the other modes are derived from the sorted group array by
    explicit index arithmetic — the same definition the oracle uses, so
    each mode is pinned independently."""
    li = T(spark, sf_dir, "lineitem")
    q = 0.25
    grouped = li.groupBy("l_linestatus").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("long"))).alias("xs"),
        F.percentile(F.col("l_quantity").cast("long"), q).alias("q_linear"),
    )
    n = F.size("xs")
    # h is the fractional index (0-based): h = (n-1)*q
    h = (n - 1) * F.lit(q)
    lo = F.floor(h).cast("int")
    hi = F.ceil(h).cast("int")
    x_lo = F.element_at("xs", lo + 1).cast("double")
    x_hi = F.element_at("xs", hi + 1).cast("double")
    nearest = F.when(h - lo <= 0.5, x_lo).otherwise(x_hi)
    return grouped.select(
        "l_linestatus",
        F.col("q_linear").cast("double").alias("q_linear"),
        x_lo.alias("q_lower"),
        x_hi.alias("q_higher"),
        nearest.alias("q_nearest"),
        ((x_lo + x_hi) / 2).alias("q_midpoint"),
        n.alias("n"),
    ).orderBy("l_linestatus")


AGG_QUANTILE_INTERP_SQL = """
WITH g AS (
  SELECT l_linestatus,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS xs,
         quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS q_linear,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_linestatus
)
SELECT l_linestatus,
       CAST(q_linear AS DOUBLE) AS q_linear,
       CAST(xs[CAST(FLOOR((n-1) * 0.25) AS INT) + 1] AS DOUBLE) AS q_lower,
       CAST(xs[CAST(CEIL((n-1) * 0.25) AS INT) + 1] AS DOUBLE) AS q_higher,
       CAST(CASE WHEN (n-1) * 0.25 - FLOOR((n-1) * 0.25) <= 0.5
                 THEN xs[CAST(FLOOR((n-1) * 0.25) AS INT) + 1]
                 ELSE xs[CAST(CEIL((n-1) * 0.25) AS INT) + 1] END AS DOUBLE) AS q_nearest,
       (CAST(xs[CAST(FLOOR((n-1) * 0.25) AS INT) + 1] AS DOUBLE)
        + CAST(xs[CAST(CEIL((n-1) * 0.25) AS INT) + 1] AS DOUBLE)) / 2 AS q_midpoint,
       CAST(n AS BIGINT) AS n
FROM g ORDER BY l_linestatus
"""


def agg_replace_values(spark, sf_dir):
    """find_and_replace_all (replace.hpp:151; frame.py:2205 replace):
    dictionary value replacement, JVM-side CASE mapping."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    mapping = {"1-URGENT": "P1", "2-HIGH": "P2", "3-MEDIUM": "P3"}
    repl = F.col("o_orderpriority")
    for old, new in mapping.items():
        repl = F.when(F.col("o_orderpriority") == old, F.lit(new)).otherwise(repl)
    return (
        o.select(repl.alias("prio"))
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prio")
    )


AGG_REPLACE_SQL = """
SELECT CASE o_orderpriority
         WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
         WHEN '3-MEDIUM' THEN 'P3' ELSE o_orderpriority END AS prio,
       COUNT(*) AS n
FROM orders WHERE o_orderkey < 5000 GROUP BY 1 ORDER BY prio
"""


def agg_idxmax(spark, sf_dir):
    """ARGMAX / idxmax (aggregation.hpp:77, group_argmax.cu): key of the
    max value, deterministic tiebreak — window formulation."""
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_orderkey").alias("argmax_order"), F.col("l_extendedprice").alias("max_price"))
        .orderBy("l_returnflag")
    )


AGG_IDXMAX_SQL = """
SELECT l_returnflag, l_orderkey AS argmax_order, l_extendedprice AS max_price
FROM (
  SELECT l_returnflag, l_orderkey, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
  FROM lineitem
) WHERE rn = 1 ORDER BY l_returnflag
"""


def agg_collect_set(spark, sf_dir):
    """COLLECT_SET (aggregation.hpp:81, group_collect.cu) — emitted as a
    sorted joined string so the value is hasher-agnostic."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


AGG_COLLECT_SQL = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def agg_bool_any_all(spark, sf_dir):
    """ANY/ALL (aggregation.hpp:66-67) via bool_or/bool_and."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.bool_or(F.col("value") > 30).alias("any_big"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


AGG_BOOL_SQL = """
SELECT event_type, bool_or(value > 30) AS any_big, bool_and(value >= 0) AS all_nonneg, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def agg_corr_cov(spark, sf_dir):
    """corr (series.py:4933) / cov (series.py:4890) from exact decimal
    power sums — the M2-style decomposition made deterministic."""
    li = T(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return sums.select(
        "l_returnflag",
        F.round(cov, 8).alias("cov_qty_price"),
        F.round(corr, 12).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


AGG_CORR_SQL = """
WITH sums AS (
  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND((sxy - sx*sy/n) / (n-1), 8) AS cov_qty_price,
       ROUND((n*sxy - sx*sy) / (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)), 12) AS corr_qty_price
FROM sums ORDER BY l_returnflag
"""


def agg_rollup(spark, sf_dir):
    """ROLLUP grouping sets — net-new surface vs the reference
    (SURVEY §2.4: 'no grouping sets in reference — Spark free bonus')."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form behind cube/rollup —
    DataFrame.groupingSets, Spark 4+): three hand-picked sets
    ((flag, status), (status), ()) in ONE partial-agg pass instead of
    three separate groupBys + union."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
            F.col("g_flag").asc(),
        )
    )


AGG_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, g_flag ASC
"""


def agg_product(spark, sf_dir):
    """PRODUCT (aggregation.hpp:61). Products of integer-valued doubles
    below 2^53 are exact in fp regardless of order → deterministic."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return (
        li.groupBy("l_orderkey")
        .agg(F.product("l_quantity").alias("qty_product"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("l_orderkey")
    )


AGG_PRODUCT_SQL = """
SELECT l_orderkey, product(l_quantity) AS qty_product, COUNT(*) AS n_items
FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey ORDER BY l_orderkey
"""


def agg_global_reduce(spark, sf_dir):
    """whole-frame reduction (cudf::reduce reduction.hpp:66) — single-row
    multi-agg over lineitem."""
    li = T(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


AGG_GLOBAL_SQL = """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
FROM lineitem
"""


def agg_sketch_approx(spark, sf_dir):
    """Approximate sketches — HLL++ distinct count and quantile sketch
    (approx_count_distinct / percentile_approx; the ~0-shuffle scale
    path for cardinality and quantiles at 100 TB, where the exact
    versions need a full distinct shuffle or sort).

    Oracle discipline for inherently engine-specific sketches: each
    engine computes its own approx AND exact value and emits the EXACT
    count plus booleans asserting the approx landed within 10% — the
    booleans are deterministic per engine (sketches here have <<10%
    error), so the cross-engine value-hash stays exact while the sketch
    path is still exercised end-to-end in BOTH engines. pytest
    (test_approx.py) separately pins the numeric error bands."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_nd"),
        F.approx_count_distinct("o_custkey").alias("__a_nd"),
        F.expr("percentile_approx(o_totalprice, 0.5, 1000)").cast("double").alias("__a_med"),
        F.expr("percentile(o_totalprice, 0.5)").cast("double").alias("__e_med"),
    )
    return g.select(
        "o_orderpriority",
        "exact_nd",
        (F.abs(F.col("__a_nd") - F.col("exact_nd"))
         <= 0.1 * F.col("exact_nd")).alias("nd_within_10pct"),
        (F.abs(F.col("__a_med") - F.col("__e_med"))
         <= 0.1 * F.abs(F.col("__e_med"))).alias("med_within_10pct"),
    ).orderBy("o_orderpriority")


AGG_SKETCH_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_nd,
       abs(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
         <= 0.1 * COUNT(DISTINCT o_custkey) AS nd_within_10pct,
       abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
         <= 0.1 * abs(quantile_cont(o_totalprice, 0.5)) AS med_within_10pct
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def agg_winsorize(spark, sf_dir):
    """Distributed winsorization (clip at per-group p05/p95) — the
    outlier-capping cleanup step between clip (replace.hpp:202) and
    quantile (group_quantiles.cu): quantiles from ONE grouped agg, a
    broadcast join back (group table is tiny), and a map-side clip.
    Exactness: quantiles over integer cents land on halves at worst, so
    20× the clipped value is integral and sums as BIGINT — no
    order-dependent double accumulation."""
    li = T(spark, sf_dir, "lineitem")
    cents = F.round(dec("l_extendedprice") * 100).cast("long")
    q = li.groupBy("l_returnflag").agg(
        F.percentile(cents, 0.05).alias("lo"),
        F.percentile(cents, 0.95).alias("hi"),
    )
    # p05/p95 with linear interpolation over n points sit on 1/20-cent
    # steps, so 20x the clipped value is integral; round() before the
    # BIGINT cast (Spark truncates double->long, DuckDB rounds)
    clipped20 = F.round(
        F.greatest(F.col("lo"), F.least(F.col("hi"), cents.cast("double"))) * 20
    ).cast("long")
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min("lo").alias("p05_cents"),
            F.min("hi").alias("p95_cents"),
            F.sum(F.when(cents.cast("double") < F.col("lo"), 1).otherwise(0))
            .cast("long").alias("n_lo"),
            F.sum(F.when(cents.cast("double") > F.col("hi"), 1).otherwise(0))
            .cast("long").alias("n_hi"),
            (F.sum(clipped20) / F.count(F.lit(1)) / 2000.0).alias("mean_winsorized"),
        )
        .orderBy("l_returnflag")
    )


AGG_WINSORIZE_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 100, 0) AS BIGINT) AS cents
  FROM lineitem
),
q AS (
  SELECT l_returnflag,
         quantile_cont(cents, 0.05) AS lo, quantile_cont(cents, 0.95) AS hi
  FROM c GROUP BY l_returnflag
)
SELECT c.l_returnflag,
       MIN(lo) AS p05_cents, MIN(hi) AS p95_cents,
       CAST(SUM(CASE WHEN CAST(cents AS DOUBLE) < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       CAST(SUM(CASE WHEN CAST(cents AS DOUBLE) > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       SUM(CAST(round(greatest(lo, least(hi, CAST(cents AS DOUBLE))) * 20, 0) AS BIGINT))
         / COUNT(*) / 2000.0 AS mean_winsorized
FROM c JOIN q USING (l_returnflag)
GROUP BY c.l_returnflag ORDER BY c.l_returnflag
"""


def agg_filtered_pack(spark, sf_dir):
    """Conditional / filtered aggregates (SQL FILTER clause; pandas
    masked-agg idiom; reference null-skipping agg semantics
    aggregation.hpp with a boolean mask). count_if, conditional sums,
    and a conditional mean — each is one map-side predicate folded into
    the partial aggregate, so the pack is still a single shuffle on the
    group key with full map-side combine."""
    o = T(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    hi = F.when(cents > 15_000_000, cents)
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count_if(cents > 15_000_000).alias("n_hi"),
            F.sum(hi).alias("sum_hi_cents"),
            F.count_if(urgent).alias("n_urgent"),
            F.sum(F.when(urgent, cents).otherwise(F.lit(0))).alias("sum_urgent_cents"),
            F.floor(
                F.sum(hi) / F.nullif(F.count_if(cents > 15_000_000), F.lit(0))
            ).alias("mean_hi_floor"),
        )
        .orderBy("o_orderstatus")
    )


AGG_FILTERED_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE cents > 15000000) AS n_hi,
       CAST(SUM(cents) FILTER (WHERE cents > 15000000) AS BIGINT) AS sum_hi_cents,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       CAST(COALESCE(SUM(cents) FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT)
         AS sum_urgent_cents,
       CAST(FLOOR(CAST(SUM(cents) FILTER (WHERE cents > 15000000) AS DOUBLE)
                  / NULLIF(COUNT(*) FILTER (WHERE cents > 15000000), 0)) AS BIGINT)
         AS mean_hi_floor
FROM (SELECT o_orderstatus, o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM orders)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES = {
    "agg_filtered_pack": agg_filtered_pack,
    "agg_basic_stats": agg_basic_stats,
    "agg_winsorize": agg_winsorize,
    "agg_sketch_approx": agg_sketch_approx,
    "agg_moments": agg_moments,
    "agg_quantiles": agg_quantiles,
    "agg_quantile_interp": agg_quantile_interp,
    "agg_replace_values": agg_replace_values,
    "agg_idxmax": agg_idxmax,
    "agg_collect_set": agg_collect_set,
    "agg_bool_any_all": agg_bool_any_all,
    "agg_corr_cov": agg_corr_cov,
    "agg_rollup": agg_rollup,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_product": agg_product,
    "agg_global_reduce": agg_global_reduce,
}

ORACLE = {
    "agg_filtered_pack": AGG_FILTERED_SQL,
    "agg_basic_stats": AGG_BASIC_SQL,
    "agg_sketch_approx": AGG_SKETCH_SQL,
    "agg_moments": AGG_MOMENTS_SQL,
    "agg_winsorize": AGG_WINSORIZE_SQL,
    "agg_quantiles": AGG_QUANTILES_SQL,
    "agg_quantile_interp": AGG_QUANTILE_INTERP_SQL,
    "agg_replace_values": AGG_REPLACE_SQL,
    "agg_idxmax": AGG_IDXMAX_SQL,
    "agg_collect_set": AGG_COLLECT_SQL,
    "agg_bool_any_all": AGG_BOOL_SQL,
    "agg_corr_cov": AGG_CORR_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "agg_product": AGG_PRODUCT_SQL,
    "agg_global_reduce": AGG_GLOBAL_SQL,
}

"""Window / rolling / order-dependent queries (SURVEY.md §2.5, §2.8).

The reference's row order is implicit (device arrays); Spark DataFrames
are unordered — every order-dependent op here is rebuilt over an
explicit ordering (the §7 'ordering discipline'): a real key
(linenumber, orderdate, ts) plus a unique tiebreak column, so results
are deterministic and shuffle-partitionable by the window's partition
key at scale.

Reference parity:
- grouped scans cumsum/cummax : groupby.hpp:224 (group_sum_scan.cu)
- shift / diff                : groupby.hpp:278; frame.py:1644; series.py:5652
- LEAD/LAG                    : aggregation.hpp:82-83
- fixed rolling window        : rolling.hpp:57; core/window/rolling.py:17
- grouped rolling             : rolling.hpp:194-257 (RollingGroupby rolling.py:355)
- time-range rolling          : rolling.hpp:350,393,512
- rank (all methods)          : sorting.hpp:178, cpp/src/sort/rank.cu; frame.py:1459
- cumcount / ROW_NUMBER       : aggregation.hpp:79
- nth element                 : aggregation.hpp:78 region, group_nth_element.cu
- ffill via replace_nulls     : groupby.hpp:348
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec, epoch_sec, events_ts


def win_group_cumsum(spark, sf_dir):
    """per-group cumulative sum (groupby::scan groupby.hpp:224) over the
    natural order (linenumber)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("cum_qty"),
        F.max("l_quantity").over(w).alias("cummax_qty"),
        (F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        ) - 1).alias("cumcount"),
    ).orderBy("l_orderkey", "l_linenumber")


WIN_GROUP_CUMSUM_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) AS cum_qty,
       MAX(l_quantity) OVER w AS cummax_qty,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS cumcount
FROM lineitem WHERE l_orderkey < 2000
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY l_orderkey, l_linenumber
"""


def win_shift_diff(spark, sf_dir):
    """shift/lag/lead + diff (copying.hpp:375, series.py:5652)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.lag("l_extendedprice", 1).over(w).alias("prev_price"),
        F.lead("l_extendedprice", 1).over(w).alias("next_price"),
        (F.col("l_extendedprice") - F.lag("l_extendedprice", 1).over(w)).alias("diff_price"),
    ).orderBy("l_orderkey", "l_linenumber")


WIN_SHIFT_SQL = """
SELECT l_orderkey, l_linenumber,
       LAG(l_extendedprice, 1) OVER w AS prev_price,
       LEAD(l_extendedprice, 1) OVER w AS next_price,
       l_extendedprice - LAG(l_extendedprice, 1) OVER w AS diff_price
FROM lineitem WHERE l_orderkey < 2000
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
ORDER BY l_orderkey, l_linenumber
"""


def win_rank_methods(spark, sf_dir):
    """rank methods min/dense/first/pct (cpp/src/sort/rank.cu;
    frame.py:1459): rank ties on the raw key; row_number/ntile over the
    fully tiebroken order."""
    c = T(spark, sf_dir, "customer")
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w_uniq = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w_ties).alias("rank_min"),
        F.dense_rank().over(w_ties).alias("rank_dense"),
        F.percent_rank().over(w_ties).alias("rank_pct"),
        F.row_number().over(w_uniq).alias("rank_first"),
        F.ntile(4).over(w_uniq).alias("quartile"),
    ).orderBy("c_nationkey", "c_custkey")


WIN_RANK_SQL = """
SELECT c_nationkey, c_custkey,
       RANK() OVER wt AS rank_min,
       DENSE_RANK() OVER wt AS rank_dense,
       PERCENT_RANK() OVER wt AS rank_pct,
       ROW_NUMBER() OVER wu AS rank_first,
       NTILE(4) OVER wu AS quartile
FROM customer
WINDOW wt AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC),
       wu AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_nationkey, c_custkey
"""


def win_rolling_rows(spark, sf_dir):
    """grouped fixed rolling window, 3 rows incl. current
    (rolling.hpp:194; Rolling window=3 min_periods=1 rolling.py:24-37)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("roll_avg"),
        F.min("o_totalprice").over(w).alias("roll_min"),
        F.max("o_totalprice").over(w).alias("roll_max"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    ).orderBy("o_custkey", "o_orderkey")


WIN_ROLLING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS roll_avg,
       MIN(o_totalprice) OVER w AS roll_min,
       MAX(o_totalprice) OVER w AS roll_max,
       COUNT(*) OVER w AS roll_n
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def win_rolling_time(spark, sf_dir):
    """time-range rolling (grouped_time_range_rolling_window
    rolling.hpp:350): events per user over a trailing 1-hour range frame
    keyed on integer epoch seconds."""
    e = events_ts(spark, sf_dir).withColumn("ts_sec", epoch_sec("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    return e.select(
        "user_id",
        "event_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_1h"),
    ).orderBy("user_id", "ts_sec", "event_id")


WIN_ROLLING_TIME_SQL = """
SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_sec,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000000000) RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_sec, event_id
"""


def win_ffill(spark, sf_dir):
    """groupwise ffill (groupby::replace_nulls groupby.hpp:348;
    groupby.py:805 pad) = last non-null over preceding frame."""
    e = events_ts(spark, sf_dir).withColumn("v", F.nullif(F.col("value"), F.lit(6.55)))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
    ).orderBy("user_id", "event_id")


WIN_FFILL_SQL = """
SELECT user_id, event_id, LAST_VALUE(NULLIF(value, 6.55) IGNORE NULLS) OVER w AS v_ffill
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def win_nth_value(spark, sf_dir):
    """NTH_ELEMENT (group_nth_element.cu): 3rd order per customer seen so
    far, plus first_value."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_order"),
    ).orderBy("o_custkey", "o_orderkey")


WIN_NTH_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       NTH_VALUE(o_orderkey, 3) OVER w AS third_order
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def win_rolling_center(spark, sf_dir):
    """centered rolling window (Rolling center=True rolling.py:24-37;
    SURVEY §7 hard-parts): frame [-1, +1] around the current row."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-1, 1)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("c_avg"),
        F.count(F.lit(1)).over(w).alias("c_n"),
    ).orderBy("o_custkey", "o_orderkey")


WIN_ROLLING_CENTER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS c_avg,
       COUNT(*) OVER w AS c_n
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def win_rolling_var(spark, sf_dir):
    """variable per-row window sizes (rolling_window with window columns,
    rolling.hpp:557): each row's trailing frame length is its own
    expression (1 + l_linenumber % 3). Spark frames are fixed per
    window, so the plan collects the MAXIMAL frame (3 rows) as an
    in-row array and slices the last w_i elements — array expression
    inside codegen, partitioned window, no UDF."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 4000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(-2, 0)
    wsize = 1 + F.col("l_linenumber") % 3
    arr = F.collect_list(dec("l_quantity")).over(w)  # ordered: trailing frame
    eff = F.least(wsize, F.size(arr))                # rows actually available
    tail = F.slice(arr, F.size(arr) - eff + 1, eff)
    vsum = F.aggregate(
        tail,
        F.lit(0).cast("decimal(14,2)"),
        # decimal + widens precision; fold state must keep the zero's type
        lambda a, x: (a + x).cast("decimal(14,2)"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        wsize.cast("int").alias("w"),
        eff.cast("int").alias("w_eff"),
        vsum.cast("double").alias("var_roll_sum"),
    ).orderBy("l_orderkey", "l_linenumber")


WIN_ROLLING_VAR_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(1 + l_linenumber % 3 AS INT) AS w,
       CAST(least(1 + l_linenumber % 3, len(arr)) AS INT) AS w_eff,
       CAST(list_sum(list_slice(arr, len(arr) - least(1 + l_linenumber % 3, len(arr)) + 1, len(arr)))
            AS DOUBLE) AS var_roll_sum
FROM (
  SELECT l_orderkey, l_linenumber,
         array_agg(CAST(l_quantity AS DECIMAL(12,2)))
           OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS arr
  FROM lineitem WHERE l_orderkey < 4000
)
ORDER BY l_orderkey, l_linenumber
"""


def win_ntile_bucket(spark, sf_dir):
    """NTILE / PERCENT_RANK / CUME_DIST pack (rank variants beyond
    sorting.hpp:178 rank — the distribution family; pandas analogs
    qcut-per-group / rank(pct=True)). Windows are PARTITIONED by
    o_orderpriority, so each group sorts independently — the shuffle
    key is the partition column, no global funnel. Ordering key is
    (cents, o_orderkey): unique, so every function is deterministic.
    percent_rank/cume_dist are exact integer ratios evaluated in
    binary64 — bit-identical across engines."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    cents = (dec("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_orderpriority").orderBy(cents.asc(), F.col("o_orderkey").asc())
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            cents.alias("cents"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


WIN_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), o_orderkey)
ORDER BY o_orderkey
"""


def topk_per_group(spark, sf_dir):
    """Distributed per-group top-k (the grouped form of
    nlargest — reference series.py nlargest + groupby apply):
    top-3 customers by balance per nation via ROW_NUMBER over a
    partitioned window, then filter. One shuffle on the group key; each
    partition keeps a 3-row heap equivalent (Spark's WindowExec is
    streaming per partition) — no global sort, no driver collect."""
    c = T(spark, sf_dir, "customer")
    cents = (dec("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_nationkey").orderBy(
        cents.desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_nationkey", "c_custkey", cents.alias("bal_cents"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
    )


TOPK_PER_GROUP_SQL = """
SELECT c_nationkey, c_custkey,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_cents,
       CAST(rk AS INT) AS rk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) DESC,
                                     c_custkey) AS rk
  FROM customer
) WHERE rk <= 3 ORDER BY c_nationkey, rk
"""


QUERIES = {
    "win_ntile_bucket": win_ntile_bucket,
    "topk_per_group": topk_per_group,
    "win_rolling_var": win_rolling_var,
    "win_rolling_center": win_rolling_center,
    "win_group_cumsum": win_group_cumsum,
    "win_shift_diff": win_shift_diff,
    "win_rank_methods": win_rank_methods,
    "win_rolling_rows": win_rolling_rows,
    "win_rolling_time": win_rolling_time,
    "win_ffill": win_ffill,
    "win_nth_value": win_nth_value,
}

ORACLE = {
    "win_ntile_bucket": WIN_NTILE_SQL,
    "topk_per_group": TOPK_PER_GROUP_SQL,
    "win_rolling_var": WIN_ROLLING_VAR_SQL,
    "win_rolling_center": WIN_ROLLING_CENTER_SQL,
    "win_group_cumsum": WIN_GROUP_CUMSUM_SQL,
    "win_shift_diff": WIN_SHIFT_SQL,
    "win_rank_methods": WIN_RANK_SQL,
    "win_rolling_rows": WIN_ROLLING_SQL,
    "win_rolling_time": WIN_ROLLING_TIME_SQL,
    "win_ffill": WIN_FFILL_SQL,
    "win_nth_value": WIN_NTH_SQL,
}

"""Copy/restructure queries (SURVEY.md §2.8): slice/split/take
(copying.hpp:78-515), reverse (:95), sample (:913), fill/sequence/repeat
(filling.hpp:84-201), merge_sorted (merge.hpp:96), is_sorted
(sorting.hpp:96), searchsorted (search.hpp:69), row hashing
(hashing.hpp:39) and hash_partition (partitioning.hpp:93).

Positional semantics ride on an explicit total order (unique keys), per
the §7 ordering discipline — Spark DataFrames are unordered multisets,
so every "position" is ``row_number()`` over a declared sort, never
physical layout. Sampling is derived from a hash of the key, not an RNG,
so it is reproducible across engines, partitionings, and retries — the
only sampling discipline that survives a 1000-executor re-run.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.functions.hashing import md5_u64
from pygdf_spark.operators.order import global_row_number
from pygdf_spark.queries._util import T, dec, dsum


def take_slice_split(spark, sf_dir):
    """slice rows [50,150) + gather every-7th position over the
    o_orderkey order (copying.hpp:411 slice, :78 gather). Positions come
    from the DISTRIBUTED global row number (operators/order.py), not a
    single-partition window."""
    o = T(spark, sf_dir, "orders")
    ranked = global_row_number(
        o.select("o_orderkey", "o_custkey", dec("o_totalprice").alias("price")),
        ["o_orderkey"],
        rn_col="rn",
    ).withColumn("rn", F.col("rn").cast("int"))
    return (
        ranked.filter(((F.col("rn") > 50) & (F.col("rn") <= 150)) | (F.col("rn") % 700 == 0))
        .select(
            "rn", "o_orderkey", "o_custkey",
            F.when(F.col("rn") % 700 == 0, F.lit("gather")).otherwise(F.lit("slice")).alias("via"),
        )
        .orderBy("rn", "via")
    )


TAKE_SLICE_SQL = """
WITH ranked AS (
  SELECT o_orderkey, o_custkey,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
)
SELECT rn, o_orderkey, o_custkey,
       CASE WHEN rn % 700 = 0 THEN 'gather' ELSE 'slice' END AS via
FROM ranked
WHERE (rn > 50 AND rn <= 150) OR rn % 700 = 0
ORDER BY rn, via
"""


def reverse_tail(spark, sf_dir):
    """tail(10) = reverse (copying.hpp:95) + head over the key order."""
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderkey").desc())
        .limit(10)
        .select("o_orderkey", "o_orderstatus", dec("o_totalprice").cast("double").alias("price"))
        .orderBy("o_orderkey")
    )


REVERSE_TAIL_SQL = """
SELECT o_orderkey, o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM (SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 10)
ORDER BY o_orderkey
"""


def sample_hash(spark, sf_dir):
    """Reproducible ~10% sample (frame.py:1785 analog): keep rows whose
    key-hash lands in bucket 0 of 10; aggregate to prove the sample is
    identical on both engines."""
    o = T(spark, sf_dir, "orders")
    sampled = o.filter(md5_u64(F.col("o_orderkey").cast("string")) % 10 == 0)
    return sampled.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        dsum("o_totalprice", "sum_price"),
    )


SAMPLE_HASH_SQL = """
SELECT COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE md5_number_lower(CAST(o_orderkey AS VARCHAR)) % 10 = 0
"""


def repeat_tile_fill(spark, sf_dir):
    """repeat/tile + sequence fill (filling.hpp:84-201, copying.hpp:333):
    each region row repeated (r_regionkey+1) times with a per-copy
    sequence index."""
    r = T(spark, sf_dir, "region")
    n = (F.col("r_regionkey") + 1).cast("int")
    return (
        r.select("r_regionkey", "r_name", F.posexplode(F.array_repeat(F.lit(1), n)).alias("copy_idx", "_one"))
        .select(
            "r_regionkey", "r_name", "copy_idx",
            F.aggregate(F.sequence(F.lit(1), F.col("copy_idx") + 1), F.lit(0), lambda a, x: a + x).alias("tri_sum"),
        )
        .orderBy("r_regionkey", "copy_idx")
    )


REPEAT_TILE_SQL = """
SELECT r_regionkey, r_name,
       CAST(UNNEST(generate_series(0, r_regionkey)) AS INT) AS copy_idx,
       CAST((UNNEST(generate_series(0, r_regionkey)) + 1)
            * (UNNEST(generate_series(0, r_regionkey)) + 2) / 2 AS INT) AS tri_sum
FROM region
ORDER BY r_regionkey, copy_idx
"""


def merge_sorted_union(spark, sf_dir):
    """merge_sorted (merge.hpp:96, reshape.py:735): k-way merge of two
    pre-sorted order slices = union + global sort (Spark SMJ covers the
    merge; range partitioning keeps it distributed)."""
    o = T(spark, sf_dir, "orders")
    lo = o.filter(F.col("o_orderkey") % 3 == 0)
    hi = o.filter(F.col("o_orderkey") % 3 == 1)
    merged = lo.unionByName(hi)
    return (
        global_row_number(
            merged.select("o_orderkey", "o_orderdate"), ["o_orderkey"], rn_col="pos"
        )
        .withColumn("pos", F.col("pos").cast("int"))
        .filter(F.col("pos") <= 100)
        .orderBy("pos")
    )


MERGE_SORTED_SQL = """
SELECT o_orderkey, o_orderdate,
       CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INT) AS pos
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
QUALIFY pos <= 100
ORDER BY pos
"""


def is_sorted_check(spark, sf_dir):
    """is_sorted (sorting.hpp:96): per-customer, is the order history
    sorted by date when traversed in key order?"""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    ok = F.col("o_orderdate") >= F.lag("o_orderdate").over(w)
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("step_ok", F.coalesce(ok, F.lit(True)))
        .groupBy("o_custkey")
        .agg(F.bool_and("step_ok").alias("is_sorted"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_custkey")
    )


IS_SORTED_SQL = """
SELECT o_custkey, bool_and(step_ok) AS is_sorted, COUNT(*) AS n_orders
FROM (
  SELECT o_custkey,
         COALESCE(o_orderdate >= LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), TRUE) AS step_ok
  FROM orders WHERE o_custkey < 200
)
GROUP BY o_custkey ORDER BY o_custkey
"""


def hash_values_row(spark, sf_dir):
    """row hashing (hashing.hpp:39, series.py:5336): md5 hex digest and
    64-bit numeric hash of the concatenated row."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    rowstr = F.concat_ws("|", F.col("c_custkey").cast("string"), "c_name", "c_mktsegment")
    return c.select(
        "c_custkey",
        F.md5(rowstr).alias("row_md5"),
        # uint64 doesn't fit BIGINT and decimal(20,0) objects break the
        # driver hasher — emit the digits as a string (exact, type-stable)
        md5_u64(rowstr).cast("string").alias("row_hash64"),
    ).orderBy("c_custkey")


HASH_VALUES_SQL = """
SELECT c_custkey,
       md5(CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || c_mktsegment) AS row_md5,
       CAST(CAST(md5_number_lower(CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || c_mktsegment)
            AS DECIMAL(20,0)) AS VARCHAR) AS row_hash64
FROM customer WHERE c_custkey < 500 ORDER BY c_custkey
"""


def hash_partition_hist(spark, sf_dir):
    """hash_partition (partitioning.hpp:93, dataframe.py:4862): the
    32-way key→partition assignment as a histogram (the engine-visible
    contract of a hash partitioner: which keys co-locate)."""
    c = T(spark, sf_dir, "customer")
    part = (md5_u64(F.col("c_custkey").cast("string")) % 32).cast("int")
    return (
        c.select(part.alias("partition"))
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("partition")
    )


HASH_PARTITION_SQL = """
SELECT CAST(md5_number_lower(CAST(c_custkey AS VARCHAR)) % 32 AS INT) AS partition,
       COUNT(*) AS n_rows
FROM customer GROUP BY 1 ORDER BY partition
"""


def searchsorted_bounds(spark, sf_dir):
    """searchsorted / lower_bound (search.hpp:69, frame.py:2518):
    insertion index of each price into a fixed sorted boundary list —
    an array-fold, no join, no shuffle."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    bounds = F.array(*[F.lit(v) for v in [50000, 100000, 150000, 200000, 250000, 300000]])
    price = dec("o_totalprice")
    idx = F.size(F.filter(bounds, lambda b: b.cast("decimal(12,2)") <= price))
    return o.select(
        "o_orderkey", price.cast("double").alias("price"), idx.alias("insert_idx")
    ).orderBy("o_orderkey")


SEARCHSORTED_SQL = """
SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
       CAST(len(list_filter([50000, 100000, 150000, 200000, 250000, 300000],
                            b -> CAST(b AS DECIMAL(12,2)) <= CAST(o_totalprice AS DECIMAL(12,2))))
            AS INT) AS insert_idx
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
"""


QUERIES = {
    "take_slice_split": take_slice_split,
    "reverse_tail": reverse_tail,
    "sample_hash": sample_hash,
    "repeat_tile_fill": repeat_tile_fill,
    "merge_sorted_union": merge_sorted_union,
    "is_sorted_check": is_sorted_check,
    "hash_values_row": hash_values_row,
    "hash_partition_hist": hash_partition_hist,
    "searchsorted_bounds": searchsorted_bounds,
}

ORACLE = {
    "take_slice_split": TAKE_SLICE_SQL,
    "reverse_tail": REVERSE_TAIL_SQL,
    "sample_hash": SAMPLE_HASH_SQL,
    "repeat_tile_fill": REPEAT_TILE_SQL,
    "merge_sorted_union": MERGE_SORTED_SQL,
    "is_sorted_check": IS_SORTED_SQL,
    "hash_values_row": HASH_VALUES_SQL,
    "hash_partition_hist": HASH_PARTITION_SQL,
    "searchsorted_bounds": SEARCHSORTED_SQL,
}

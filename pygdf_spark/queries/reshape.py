"""Restructuring queries (SURVEY.md §2.7/§2.8): melt/pivot/explode/
one-hot/binning/factorize/interleave/sequence.

Reference parity:
- melt            : py core/reshape.py:394 → df.unpivot
- pivot/unstack   : py reshape.py:843,924 → groupBy().pivot()
- explode(+pos)   : lists/explode.hpp:63,107 → F.posexplode
- get_dummies     : reshape.py:566 (one_hot_encoding)
- cut / label_bins: core/cut.py:15; labeling/label_bins.hpp:72
- factorize       : core/algorithms.py:61 → dense_rank over distinct
- sequence/repeat : filling.hpp:84,121,147 → F.sequence + explode
- interleave_cols : reshape.hpp:49 → posexplode(array(...))
- concat axis=0   : core/reshape.py:90 → unionByName
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T, dec


def reshape_melt(spark, sf_dir):
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice").alias("p_retailprice"),
        )
        .unpivot(["p_partkey"], ["p_size", "p_retailprice"], "variable", "value")
        .orderBy("p_partkey", "variable")
    )


RESHAPE_MELT_SQL = """
SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS DOUBLE) AS value FROM part WHERE p_partkey < 500
UNION ALL
SELECT p_partkey, 'p_retailprice' AS variable, p_retailprice AS value FROM part WHERE p_partkey < 500
ORDER BY p_partkey, variable
"""


def reshape_pivot(spark, sf_dir):
    """pivot wide (reshape.py:843): linestatus → columns."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .orderBy("l_returnflag")
    )


RESHAPE_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F",
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O"
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def reshape_pivot_multi(spark, sf_dir):
    """pivot_table with MULTIPLE aggregates per cell (reshape.py:843 +
    pandas pivot_table semantics): each pivot value × agg pair becomes
    a column, one shuffle total."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


RESHAPE_PIVOT_MULTI_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F_sum_price",
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F_n",
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O_sum_price",
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O_n"
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def reshape_get_dummies(spark, sf_dir):
    """one-hot encode o_orderstatus (reshape.py:566), aggregated per
    priority so the result is compact."""
    o = T(spark, sf_dir, "orders")
    dummies = [
        F.when(F.col("o_orderstatus") == v, 1).otherwise(0).alias(f"status_{v}")
        for v in ("F", "O", "P")
    ]
    return (
        o.select("o_orderpriority", *dummies)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("status_F").alias("n_F"),
            F.sum("status_O").alias("n_O"),
            F.sum("status_P").alias("n_P"),
        )
        .orderBy("o_orderpriority")
    )


RESHAPE_DUMMIES_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def reshape_explode(spark, sf_dir):
    """posexplode of a split string (lists/explode.hpp:107)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return (
        p.select("p_partkey", F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"))
        .orderBy("p_partkey", "pos")
    )


RESHAPE_EXPLODE_SQL = """
SELECT p_partkey,
       CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS pos,
       UNNEST(string_split(p_name, ' ')) AS word
FROM part WHERE p_partkey < 200
ORDER BY p_partkey, pos
"""


def reshape_sequence(spark, sf_dir):
    """fill/sequence (filling.hpp:84): explode a generated range."""
    n = T(spark, sf_dir, "nation")
    return (
        n.select("n_nationkey", F.explode(F.sequence(F.lit(1), F.col("n_regionkey") + 2)).alias("i"))
        .orderBy("n_nationkey", "i")
    )


RESHAPE_SEQUENCE_SQL = """
SELECT n_nationkey, CAST(t.i AS INT) AS i
FROM nation, UNNEST(generate_series(1, n_regionkey + 2)) AS t(i)
ORDER BY n_nationkey, i
"""


def reshape_interleave(spark, sf_dir):
    """interleave_columns (reshape.hpp:49): row-wise alternation of two
    columns via posexplode(array(...))."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return (
        c.select(
            "c_custkey",
            F.posexplode(F.array(F.col("c_acctbal"), F.col("c_custkey").cast("double"))).alias("pos", "val"),
        )
        .orderBy("c_custkey", "pos")
    )


RESHAPE_INTERLEAVE_SQL = """
SELECT c_custkey, 0 AS pos, c_acctbal AS val FROM customer WHERE c_custkey < 100
UNION ALL
SELECT c_custkey, 1 AS pos, CAST(c_custkey AS DOUBLE) AS val FROM customer WHERE c_custkey < 100
ORDER BY c_custkey, pos
"""


def reshape_cut_bins(spark, sf_dir):
    """cut / label_bins (core/cut.py:15, label_bins.hpp:72): fixed-width
    binning with identical floor arithmetic in both engines."""
    c = T(spark, sf_dir, "customer")
    bucket = F.floor((F.col("c_acctbal") + 1000.0) / 1100.0).cast("int")
    return (
        c.select(bucket.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


RESHAPE_CUT_SQL = """
SELECT CAST(FLOOR((c_acctbal + 1000.0) / 1100.0) AS INT) AS bin, COUNT(*) AS n
FROM customer GROUP BY 1 ORDER BY bin
"""


def reshape_qcut_bins(spark, sf_dir):
    """qcut — quantile binning (the pandas/cuDF companion to cut):
    quartile boundaries of integer cents from ONE scalar agg, broadcast
    back, bucket assigned map-side as a boundary comparison (b = #
    boundaries strictly below the value — right-closed bins like
    pandas). Exact: boundaries interpolate on quarter steps of integer
    cents, so 4x each is integral and the comparisons are
    bit-deterministic in both engines."""
    c = T(spark, sf_dir, "customer")
    cents = F.round(dec("c_acctbal") * 100).cast("long")
    qs = c.agg(
        *[F.percentile(cents, i / 4).alias(f"q{i}") for i in (1, 2, 3)]
    )
    x = cents.cast("double")
    b = (
        (x > F.col("q1")).cast("int")
        + (x > F.col("q2")).cast("int")
        + (x > F.col("q3")).cast("int")
    )
    return (
        c.crossJoin(F.broadcast(qs))
        .select(b.alias("bin"), cents.alias("cents"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
        .orderBy("bin")
    )


RESHAPE_QCUT_SQL = """
WITH c AS (
  SELECT CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 100, 0) AS BIGINT) AS cents
  FROM customer
),
qs AS (
  SELECT quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.50) AS q2,
         quantile_cont(cents, 0.75) AS q3
  FROM c
)
SELECT (CASE WHEN CAST(cents AS DOUBLE) > q1 THEN 1 ELSE 0 END
      + CASE WHEN CAST(cents AS DOUBLE) > q2 THEN 1 ELSE 0 END
      + CASE WHEN CAST(cents AS DOUBLE) > q3 THEN 1 ELSE 0 END) AS bin,
       COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(cents) AS lo, MAX(cents) AS hi
FROM c CROSS JOIN qs
GROUP BY 1 ORDER BY bin
"""


def reshape_factorize(spark, sf_dir):
    """factorize/label_encoding (core/algorithms.py:61): stable codes via
    dense_rank over the sorted distinct domain."""
    o = T(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderpriority")
    return (
        o.select("o_orderpriority").distinct()
        .withColumn("code", F.dense_rank().over(w) - 1)
        .orderBy("code")
    )


RESHAPE_FACTORIZE_SQL = """
SELECT o_orderpriority, DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS code
FROM (SELECT DISTINCT o_orderpriority FROM orders) ORDER BY code
"""


def reshape_concat_union(spark, sf_dir):
    """concat axis=0 with outer column alignment (core/reshape.py:90) →
    unionByName(allowMissingColumns=True)."""
    a = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"), F.lit("cust").alias("src")
    )
    b = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_acctbal").alias("bal"), F.lit("supp").alias("src"),
        F.col("s_nationkey").alias("nk"),
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("bal")).cast("double").alias("sum_bal"),
            F.count("nk").alias("n_nk"),
        )
        .orderBy("src")
    )


RESHAPE_CONCAT_SQL = """
SELECT src, COUNT(*) AS n, CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal, COUNT(nk) AS n_nk
FROM (
  SELECT c_custkey AS key, c_acctbal AS bal, 'cust' AS src, NULL AS nk FROM customer
  UNION ALL
  SELECT s_suppkey, s_acctbal, 'supp', s_nationkey FROM supplier
) GROUP BY src ORDER BY src
"""


def set_intersect_except(spark, sf_dir):
    """set ops as named surface (§2.7; Spark INTERSECT/EXCEPT — both
    plan as partial-agg'd left-semi/anti hash joins, shuffle on the row
    key): customer nations ∩/∖ supplier nations, plus the multiset
    EXCEPT ALL variant on a skewed projection."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    inter = c.intersect(s).agg(F.count(F.lit(1)).alias("v")).select(
        F.lit("n_intersect").alias("metric"), "v"
    )
    diff = c.distinct().exceptAll(s.distinct()).agg(F.count(F.lit(1)).alias("v")).select(
        F.lit("n_except").alias("metric"), "v"
    )
    # EXCEPT ALL keeps multiplicity: count survivors of the multiset
    # subtraction (one supplier-row cancels one customer-row per key)
    diff_all = c.exceptAll(s).agg(F.count(F.lit(1)).alias("v")).select(
        F.lit("n_except_all").alias("metric"), "v"
    )
    return inter.unionByName(diff).unionByName(diff_all).orderBy("metric")


SET_INTERSECT_SQL = """
SELECT 'n_except' AS metric, COUNT(*) AS v FROM (
  SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'n_except_all', COUNT(*) FROM (
  SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'n_intersect', COUNT(*) FROM (
  SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
ORDER BY metric
"""


def reshape_pivot_table(spark, sf_dir):
    """pivot_table (pandas/cudf module function; reshape veneer):
    orders priority × status → summed integer cents. One shuffle on the
    index key; the pivot domain resolves via Spark's distinct scan."""
    import pygdf_spark as gd

    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus",
        (dec("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = gd.pivot_table(
        gd.from_spark(o), values="cents", index="o_orderpriority",
        columns="o_orderstatus", aggfunc="sum", fill_value=0,
    )
    return out.spark.orderBy("o_orderpriority")


PIVOT_TABLE_SQL = """
SELECT o_orderpriority,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN cents END), 0) AS BIGINT) AS F,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN cents END), 0) AS BIGINT) AS O,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN cents END), 0) AS BIGINT) AS P
FROM (SELECT o_orderpriority, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM orders)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def reshape_crosstab(spark, sf_dir):
    """crosstab (pandas module function): count matrix of customer
    market segment × nation bucket — groupBy+pivot+count, one shuffle."""
    import pygdf_spark as gd

    c = T(spark, sf_dir, "customer").select(
        "c_mktsegment", (F.col("c_nationkey") % 5).alias("nat_bucket")
    )
    out = gd.crosstab(gd.from_spark(c), "c_mktsegment", "nat_bucket")
    return out.spark.orderBy("c_mktsegment")


CROSSTAB_SQL = """
SELECT c_mktsegment,
       CAST(COALESCE(SUM(CASE WHEN nb = 0 THEN 1 END), 0) AS BIGINT) AS "0",
       CAST(COALESCE(SUM(CASE WHEN nb = 1 THEN 1 END), 0) AS BIGINT) AS "1",
       CAST(COALESCE(SUM(CASE WHEN nb = 2 THEN 1 END), 0) AS BIGINT) AS "2",
       CAST(COALESCE(SUM(CASE WHEN nb = 3 THEN 1 END), 0) AS BIGINT) AS "3",
       CAST(COALESCE(SUM(CASE WHEN nb = 4 THEN 1 END), 0) AS BIGINT) AS "4"
FROM (SELECT c_mktsegment, c_nationkey % 5 AS nb FROM customer)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


QUERIES = {
    "reshape_melt": reshape_melt,
    "reshape_pivot": reshape_pivot,
    "reshape_pivot_multi": reshape_pivot_multi,
    "reshape_get_dummies": reshape_get_dummies,
    "reshape_explode": reshape_explode,
    "reshape_sequence": reshape_sequence,
    "reshape_interleave": reshape_interleave,
    "reshape_cut_bins": reshape_cut_bins,
    "reshape_qcut_bins": reshape_qcut_bins,
    "reshape_factorize": reshape_factorize,
    "reshape_concat_union": reshape_concat_union,
    "set_intersect_except": set_intersect_except,
    "reshape_pivot_table": reshape_pivot_table,
    "reshape_crosstab": reshape_crosstab,
}

ORACLE = {
    "reshape_melt": RESHAPE_MELT_SQL,
    "reshape_pivot": RESHAPE_PIVOT_SQL,
    "reshape_pivot_multi": RESHAPE_PIVOT_MULTI_SQL,
    "reshape_get_dummies": RESHAPE_DUMMIES_SQL,
    "reshape_explode": RESHAPE_EXPLODE_SQL,
    "reshape_sequence": RESHAPE_SEQUENCE_SQL,
    "reshape_interleave": RESHAPE_INTERLEAVE_SQL,
    "reshape_cut_bins": RESHAPE_CUT_SQL,
    "reshape_qcut_bins": RESHAPE_QCUT_SQL,
    "reshape_factorize": RESHAPE_FACTORIZE_SQL,
    "reshape_concat_union": RESHAPE_CONCAT_SQL,
    "set_intersect_except": SET_INTERSECT_SQL,
    "reshape_pivot_table": PIVOT_TABLE_SQL,
    "reshape_crosstab": CROSSTAB_SQL,
}

"""Side-by-side migration demo: cuDF call sites → pygdf_spark.

Run: python examples/migration.py [sf_dir]

Each block shows the cuDF idiom (comment) and the engine's equivalent
(executed). The API veneer keeps the call shape; execution is a
distributed Catalyst plan instead of a single GPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygdf_spark import get_spark
from pygdf_spark.core import from_spark, melt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("migration-demo")

    # cuDF: df = cudf.read_parquet(path)
    orders = from_spark(spark.read.parquet(os.path.join(sf_dir, "orders.parquet")))
    customer = from_spark(spark.read.parquet(os.path.join(sf_dir, "customer.parquet")))

    # cuDF: df.query("o_totalprice > 100000")
    big = orders.query("o_totalprice > 100000")

    # cuDF: df.merge(right, on=..., how="left")
    joined = big.merge(
        customer.rename({"c_custkey": "o_custkey"}), on="o_custkey", how="left"
    )

    # cuDF: df.groupby("c_mktsegment").agg({"o_totalprice": ["sum", "mean"]})
    agg = joined.groupby("c_mktsegment").agg({"o_totalprice": ["sum", "mean", "count"]})
    print("groupby.agg:")
    print(agg.sort_values("sum_o_totalprice", ascending=False).to_pandas())

    # cuDF: df.sort_values(...).head(5); series accessors
    top = joined.sort_values("o_totalprice", ascending=False).head(5)
    top = top.assign(
        seg_lower=top["c_mktsegment"].str.lower(),
        order_year=top["o_orderdate"].dt.year,
    )
    print("\ntop-5 with .str/.dt accessors:")
    print(top[["o_orderkey", "o_totalprice", "seg_lower", "order_year"]].to_pandas())

    # cuDF: s.value_counts(); df.drop_duplicates(keep="last")
    print("\nvalue_counts:")
    print(orders["o_orderstatus"].value_counts().to_pandas())
    dedup = orders.drop_duplicates(["o_custkey"], keep="last")
    print(f"\ndrop_duplicates(keep='last'): {dedup.shape[0]} of {orders.shape[0]} rows")

    # cuDF: cudf.melt(df, ...)
    m = melt(big[["o_orderkey", "o_totalprice", "o_custkey"]].astype(
        {"o_totalprice": "double", "o_custkey": "double"}),
        id_vars=["o_orderkey"], value_vars=["o_totalprice", "o_custkey"])
    print(f"\nmelt: {m.shape[0]} rows (2 per order)")

    # cuDF: cudf.read_parquet(path) — module-level readers
    import pygdf_spark as gd

    li = gd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), spark=spark)

    # cuDF: df.describe(); df.rolling(n).mean(); s.quantile(q)
    print("\ndescribe():")
    print(li[["l_quantity", "l_extendedprice"]].describe().to_pandas())
    roll = li.head(20).rolling(4, min_periods=1).mean("l_quantity")
    print(f"rolling mean rows: {roll.shape[0]}")
    print(f"p90 extendedprice: {li['l_extendedprice'].quantile(0.9):.2f}")

    # cuDF: df.groupby(k).shift/ffill — grouped order-sensitive ops
    g = li.head(200).groupby("l_orderkey").cumsum("l_quantity")
    print(f"grouped cumsum rows: {g.shape[0]}")

    spark.stop()


if __name__ == "__main__":
    main()

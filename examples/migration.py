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

    # cuDF: cudf.cut(s, bins, labels); s.label_encoding; df.hash_values
    binned = li.head(50).assign(
        qty_band=gd.cut(F.col("l_quantity").cast("double"), [0, 10, 25, 50],
                        labels=["small", "mid", "large"]),
    ).label_encoding("l_returnflag", ["A", "N", "R"]).hash_values("murmur3")
    print("\ncut + label_encoding + hash_values:")
    print(binned[["l_quantity", "qty_band", "l_returnflag_labels", "hash"]]
          .head(4).to_pandas())

    # cuDF: s.str.rsplit; s.list.get/len — string and list accessors
    part = gd.read_parquet(os.path.join(sf_dir, "part.parquet"), spark=spark)
    words = part.head(10).assign(name_words=F.split(F.col("p_name"), " "))
    w = words.assign(
        first_word=words["name_words"].list.get(0),
        n_words=words["name_words"].list.len(),
        last_word=words["p_name"].str.rsplit(" ", 2).getItem(1),
    )
    print("\n.list accessor + rsplit:")
    print(w[["p_name", "first_word", "n_words", "last_word"]].head(3).to_pandas())

    # cuDF: cudf.date_range(...); timedelta .dt components
    dr = gd.date_range("1995-01-01", periods=3, freq="12 hours", spark=spark)
    lag = li.head(20).assign(
        since_epoch_us=(F.unix_timestamp("l_shipdate")
                        - F.unix_timestamp(F.lit("1995-01-01"), "yyyy-MM-dd"))
        * F.lit(1_000_000)
    )
    lag = lag.assign(ship_days=lag["since_epoch_us"].dt.days)
    print(f"\ndate_range rows: {dr.shape[0]}; "
          f"max days shipped after 1995-01-01: {lag['ship_days'].max()}")

    spark.stop()


if __name__ == "__main__":
    main()

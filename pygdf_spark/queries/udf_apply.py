"""UDF-surface queries (SURVEY.md §2.11): apply_rows / apply_chunks /
GroupBy.apply / grouped-agg UDF, all through Arrow-batched Pandas
execution (pygdf_spark.operators.apply).

Oracle discipline: the Python kernels do either exact integer math or
IEEE double ops in the exact parenthesization the oracle SQL uses —
elementwise float ops are bit-deterministic, so the hash compare stays
exact even through the Python boundary.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pygdf_spark.operators import apply as A
from pygdf_spark.queries._util import T


def udf_apply_rows_charge(spark, sf_dir):
    """apply_rows (dataframe.py:4701): row-wise charge kernel in pandas
    + a scalar pandas_udf discount class on top."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        e, d, t = pdf["l_extendedprice"], pdf["l_discount"], pdf["l_tax"]
        return pd.DataFrame({
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "charge": (e * (1.0 - d)) * (1.0 + t),
            "cents": (e * 100).round().astype("int64"),
            "disc_class": pdf["disc_class"],
        })

    @pandas_udf("string")
    def disc_class(d: pd.Series) -> pd.Series:
        return pd.Series(pd.cut(d, [-1.0, 0.02, 0.06, 1.0], labels=["low", "mid", "high"]).astype(str))

    # scalar pandas_udf column first, then the row-wise kernel carries it
    # through — (l_orderkey, l_linenumber) is NOT unique in the fixture,
    # so a re-join on those keys would cross-multiply rows.
    prepared = li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax",
        disc_class("l_discount").alias("disc_class"),
    )
    return A.apply_rows(
        prepared,
        kernel,
        "l_orderkey long, l_linenumber int, charge double, cents long, disc_class string",
    ).orderBy("l_orderkey", "l_linenumber")


UDF_APPLY_ROWS_SQL = """
SELECT l_orderkey, l_linenumber,
       (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge,
       CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
       CASE WHEN l_discount <= 0.02 THEN 'low'
            WHEN l_discount <= 0.06 THEN 'mid' ELSE 'high' END AS disc_class
FROM lineitem WHERE l_orderkey < 2000 ORDER BY l_orderkey, l_linenumber
"""


def udf_apply_chunks_tokens(spark, sf_dir):
    """apply_chunks (dataframe.py:4779): per-batch Python kernel running
    a real Python tokenizer (re) over document batches."""
    d = T(spark, sf_dir, "documents")
    pat = re.compile(r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        toks = pdf["text"].map(lambda s: pat.findall(s or ""))
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bpe": toks.map(len).astype("int64"),
            "first_tok": toks.map(lambda t: t[0] if t else None),
        })

    return A.apply_chunks(
        d.select("doc_id", "text"), kernel, "doc_id long, n_bpe long, first_tok string"
    ).orderBy("doc_id")


UDF_APPLY_CHUNKS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
       regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]')[1] AS first_tok
FROM documents ORDER BY doc_id
"""


def udf_groupby_apply_top2(spark, sf_dir):
    """GroupBy.apply (groupby.py:384): per (returnflag, linestatus)
    group, a pandas function returns the top-2 rows by price."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
        ).head(2)
        s = s.assign(rank=range(1, len(s) + 1))
        return s[["l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice", "rank"]]

    out = A.groupby_apply(
        li.select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_returnflag", "l_linestatus"],
        top2,
        "l_returnflag string, l_linestatus string, l_orderkey long, l_linenumber int, l_extendedprice double, rank int",
    )
    return out.orderBy("l_returnflag", "l_linestatus", "rank")


UDF_GROUPBY_APPLY_SQL = """
SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
       CAST(rank AS INT) AS rank
FROM (
  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
  FROM lineitem WHERE l_orderkey < 5000
)
WHERE rank <= 2
ORDER BY l_returnflag, l_linestatus, rank
"""


def udf_grouped_agg_cents(spark, sf_dir):
    """UDF aggregation (aggregation.hpp:84-85 PTX/CUDA analog): a
    pandas_udf GROUPED_AGG computing an exact integer cents sum."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)

    @pandas_udf("long")
    def sum_cents(price: pd.Series) -> int:
        return int((price * 100).round().astype("int64").sum())

    @pandas_udf("long")
    def n_rows(price: pd.Series) -> int:
        return int(price.size)

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one Aggregate node — both metrics go through pandas.
    return (
        li.groupBy("l_returnflag")
        .agg(
            sum_cents("l_extendedprice").alias("cents_sum"),
            n_rows("l_extendedprice").alias("n"),
        )
        .orderBy("l_returnflag")
    )


UDF_GROUPED_AGG_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents_sum,
       COUNT(*) AS n
FROM lineitem WHERE l_orderkey < 5000 GROUP BY l_returnflag ORDER BY l_returnflag
"""


def udf_map_in_arrow(spark, sf_dir):
    """Arrow-NATIVE batch kernel via DataFrame.mapInArrow — the parity
    surface for the reference's zero-copy Arrow interop (interop.hpp:113
    to_arrow / :125 from_arrow): RecordBatches flow to Python and back
    with no pandas materialization, and the kernel itself stays columnar
    in pyarrow.compute (vectorized C++, no per-row Python). The cheapest
    Python boundary Spark offers — use it when pandas semantics aren't
    needed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = T(spark, sf_dir, "documents")

    def kernel(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.count_substring_regex(text, r"[^\s]+"),
                    pc.binary_length(text),
                ],
                ["doc_id", "n_tok", "n_bytes"],
            )

    out = d.select("doc_id", "text").mapInArrow(
        kernel, "doc_id long, n_tok int, n_bytes int"
    )
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    ).orderBy("doc_id")


UDF_MAP_IN_ARROW_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[^\s]+')) AS BIGINT) AS n_tok,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents ORDER BY doc_id
"""


def udf_groupby_apply_arrow(spark, sf_dir):
    """GroupBy.apply through the Arrow-NATIVE grouped surface
    (GroupedData.applyInArrow): each group arrives as one pa.Table and
    the kernel reduces it columnar-side (pyarrow.compute) with exact
    integer cents — the zero-pandas analog of apply_grouped
    (groupby.py:458)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)

    def kernel(tbl: pa.Table) -> pa.Table:
        price = tbl.column("l_extendedprice")
        # half_towards_infinity pins Arrow to the same half-away-from-zero
        # rounding as Spark F.round / the DuckDB oracle (pc.round defaults
        # to banker's half_to_even — a latent tie divergence)
        cents = pc.round(
            pc.multiply(price, pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        )
        return pa.table({
            "l_returnflag": [tbl.column("l_returnflag")[0].as_py()],
            "cents_sum": [int(pc.sum(pc.cast(cents, pa.int64())).as_py())],
            "n": [tbl.num_rows],
        })

    prepared = li.select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("l_extendedprice")
    )
    return (
        prepared.groupBy("l_returnflag")
        .applyInArrow(kernel, "l_returnflag string, cents_sum long, n long")
        .orderBy("l_returnflag")
    )


UDF_GROUPBY_ARROW_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0) AS BIGINT)) AS BIGINT) AS cents_sum,
       COUNT(*) AS n
FROM lineitem WHERE l_orderkey < 5000 GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "udf_apply_rows_charge": udf_apply_rows_charge,
    "udf_groupby_apply_arrow": udf_groupby_apply_arrow,
    "udf_apply_chunks_tokens": udf_apply_chunks_tokens,
    "udf_groupby_apply_top2": udf_groupby_apply_top2,
    "udf_grouped_agg_cents": udf_grouped_agg_cents,
    "udf_map_in_arrow": udf_map_in_arrow,
}

ORACLE = {
    "udf_apply_rows_charge": UDF_APPLY_ROWS_SQL,
    "udf_groupby_apply_arrow": UDF_GROUPBY_ARROW_SQL,
    "udf_apply_chunks_tokens": UDF_APPLY_CHUNKS_SQL,
    "udf_groupby_apply_top2": UDF_GROUPBY_APPLY_SQL,
    "udf_grouped_agg_cents": UDF_GROUPED_AGG_SQL,
    "udf_map_in_arrow": UDF_MAP_IN_ARROW_SQL,
}

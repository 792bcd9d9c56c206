"""UDF surface (SURVEY.md §2.11): the cuDF apply family re-expressed on
Spark's Arrow-batched Python execution.

Reference parity:
- ``apply_rows``   : DataFrame.apply_rows  (core/dataframe.py:4701,
  utils/applyutils.py:68) — row-wise kernel over named input columns.
- ``apply_chunks`` : DataFrame.apply_chunks (dataframe.py:4779,
  applyutils.py:84) — per-chunk kernel seeing a whole batch.
- ``groupby_apply``: GroupBy.apply / apply_grouped (groupby.py:384,:458)
  — group → DataFrame function.
- ``grouped_agg``  : PTX/CUDA UDF aggregations (aggregation.hpp:84-85).

Execution model: cuDF JIT-compiles these to CUDA kernels; the Spark
analog is Arrow-batched Pandas execution (pandas_udf / mapInPandas /
applyInPandas), which keeps data columnar across the JVM↔Python
boundary and vectorizes the Python work — the only Python path allowed
in hot loops (row-at-a-time Python UDFs are 10-100× slower and are
deliberately not exposed).

Scale posture: every wrapper is a narrow per-partition (or per-group)
map; parallelism and memory are governed by the input partitioning, so
the operators inherit whatever repartitioning the caller declared.
``groupby_apply`` shuffles once on the group keys (identical shape to
cuDF's group partition extraction, groupby.hpp:310).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def apply_rows(
    df: DataFrame,
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Row-wise kernel (apply_rows, dataframe.py:4701): ``func`` maps a
    pandas batch of the input columns to a pandas batch of output rows
    (1:1 row correspondence is the caller's contract, as in cuDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield func(pdf)

    return df.mapInPandas(run, schema=schema)


def apply_chunks(
    df: DataFrame,
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Chunk-wise kernel (apply_chunks, dataframe.py:4779): ``func``
    sees an entire Arrow batch and may change its row count."""
    return apply_rows(df, func, schema)  # same plumbing; contract differs


def groupby_apply(
    df: DataFrame,
    keys: list[str],
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """GroupBy.apply (groupby.py:384): one shuffle on ``keys``, then
    ``func`` receives each group as a pandas DataFrame."""
    return df.groupBy(*keys).applyInPandas(func, schema=schema)


def apply_arrow(df: DataFrame, func, schema) -> DataFrame:
    """Lowest-overhead batch surface: ``func`` maps an iterator of
    pyarrow RecordBatches (no pandas conversion at all) — the closest
    Spark analog to cuDF's zero-copy device-batch kernels
    (`__cuda_array_interface__`, _lib/column.pyx:53)."""
    return df.mapInArrow(func, schema=schema)

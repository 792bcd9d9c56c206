"""Distributed ordering primitives (SURVEY.md §7 row-order discipline;
§2.6 distributed sort — dask_cudf/sorting.py:207's sample→divisions→
shuffle→local-sort, which is Spark's RangePartitioner natively).

``Window.orderBy(...)`` with no partition key funnels the whole dataset
through ONE task — correct at test SF, fatal at 100 TB. The scalable
global row number here is the classic three-step:

1. ``repartitionByRange(keys)`` — sampled range shuffle; equal keys
   co-locate, partition p holds keys strictly below partition p+1.
2. per-partition ``row_number`` (parallel — window partitioned by the
   physical partition id).
3. add each partition's cumulative row-count offset — a driver-side
   collect of ONE count per partition (bounded metadata, the same
   footprint as Spark's own range-boundary sampling), broadcast back.

Result is bit-identical to ``ROW_NUMBER() OVER (ORDER BY keys)`` when
``keys`` is a total order (callers append a tiebreaker otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, keys: list, rn_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Scalable ``row_number() over (order by *keys)`` (1-based).

    NOTE: the repartitioned intermediate stays persisted for the
    lifetime of the returned plan (required — see below: the offset
    collect and every downstream execution must observe the same
    sampled range boundaries). Callers running many independent
    row-number jobs in one session should materialize the result
    (write/localCheckpoint) and then ``spark.catalog.clearCache()`` or
    unpersist via ``df.sparkSession.catalog`` to release the cached
    partitions; at 100 TB the equivalent step is writing the numbered
    intermediate to storage."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *keys).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    # persisted: the offset collect and the downstream query MUST see
    # the same range boundaries — repartitionByRange samples it
    # boundaries per execution, so an unpersisted plan could renumber
    # between the two jobs. (At 100 TB this materialization is the
    # usual write-intermediate step of a distributed rank.)
    local = parted.withColumn("__lrn", F.row_number().over(w)).persist()

    # one row per partition; cumulative offsets computed driver-side
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    off_expr = F.lit(0)
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(off_expr)

    return (
        local.withColumn(rn_col, (F.col("__lrn") + off_expr).cast("long"))
        .drop("__pid", "__lrn")
    )

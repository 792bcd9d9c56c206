"""Incrementally-maintained materialized aggregate views on deltalite.

The continuous-aggregate pattern (TimescaleDB continuous aggregates,
Materialize, Delta Live Tables): a grouped SUM/COUNT view over a
lakehouse table that refreshes by consuming the table's CHANGE FEED
instead of re-scanning the base — the refresh cost is O(changed rows),
not O(table).

Composition of three existing deltalite primitives, nothing new at the
storage layer:

- ``table_changes`` supplies signed row-level deltas (insert/post → +1,
  delete/pre → −1); sums and counts are abelian, so applying the signed
  contribution per group is exact — no recompute, no approximation.
- ``merge_into`` upserts ONLY the affected groups into the view (itself
  a deltalite table: versioned, time-travelable, skippable).
- the Delta ``txn`` action records the SOURCE VERSION each refresh
  consumed (app id ``mv:<view>``), which makes refresh (a) resumable —
  the next refresh reads the high-water mark from the view's own log —
  and (b) idempotent — a replayed refresh of the same source version
  is dropped inside the commit protocol.

Groups whose count reaches zero are retained as tombstones (n_rows=0)
and filtered by ``read_agg_view`` — the merge path has no delete, and
a zero-count group is semantically an empty group.

100 TB posture: one change-feed scan + one grouped aggregate + one
pruned merge per refresh; every step is the already-audited distributed
plan of its primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygdf_spark.sources import deltalite as dl


def _mv_app(view_table: str) -> str:
    return "mv:" + view_table.rstrip("/").rsplit("/", 1)[-1]


def create_agg_view(
    spark: SparkSession, src_table: str, view_table: str,
    group_col: str, sum_col: str,
) -> int:
    """Materialize ``SELECT group, COUNT(*), SUM(sum_col)`` at the
    source's current version. ``sum_col`` should be an exact-integer
    column (cents discipline) so increments never drift."""
    src_v = dl.table_version(src_table)
    if src_v < 0:
        raise FileNotFoundError(f"source table has no commits: {src_table}")
    snap = dl.read_table(spark, src_table)
    agg = snap.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(sum_col)).cast("long").alias("sum_val"),
    )
    base = dl.table_version(view_table)
    removes = (
        [a["path"] for a in dl.live_files(view_table)] if base >= 0 else []
    )
    adds = dl._write_data_files(
        agg, view_table, base + 1, [group_col], cluster_by=[group_col]
    )
    # overwrite-with-txn: the txn action records which SOURCE version
    # this view state reflects (refresh reads it back as its cursor)
    return dl._commit_retry(
        view_table, "overwrite", adds, removes, agg.schema.json(), base,
        10, txn=(_mv_app(view_table), src_v),
    )


def refresh_agg_view(
    spark: SparkSession, src_table: str, view_table: str,
    group_col: str, sum_col: str, key: str,
) -> dict:
    """Incremental refresh: apply the source's change feed since the
    view's recorded high-water version. Returns
    {"from_version", "to_version", "groups_touched"}."""
    last = dl.last_txn_batch(view_table, _mv_app(view_table))
    if last < 0:
        raise ValueError(
            f"{view_table} is not a materialized view (no mv txn record); "
            "call create_agg_view first"
        )
    cur = dl.table_version(src_table)
    if cur <= last:
        return {"from_version": last, "to_version": cur, "groups_touched": 0}
    changes = dl.table_changes(spark, src_table, last, cur, key=key)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1)).cast("long")
    delta = (
        changes.select(
            F.col(group_col), sign.alias("__s"),
            (sign * F.col(sum_col).cast("long")).alias("__dv"),
        )
        .groupBy(group_col)
        .agg(F.sum("__s").alias("d_n"), F.sum("__dv").alias("d_sum"))
    )
    current = dl.read_table(spark, view_table).select(
        group_col, "n_rows", "sum_val"
    )
    merged = (
        delta.join(current, on=group_col, how="left")
        .select(
            group_col,
            (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_n"))
            .cast("long").alias("n_rows"),
            (F.coalesce(F.col("sum_val"), F.lit(0)) + F.col("d_sum"))
            .cast("long").alias("sum_val"),
        )
    )
    touched = merged.count()  # bounded: |changed groups|
    res = dl.merge_into(
        spark, view_table, merged, on=group_col, stat_cols=[group_col],
        txn=(_mv_app(view_table), cur),
    )
    return {"from_version": last, "to_version": cur,
            "groups_touched": touched, "merge": res}


def read_agg_view(spark: SparkSession, view_table: str) -> DataFrame:
    """View contents, excluding zero-count tombstone groups."""
    return dl.read_table(spark, view_table).filter(F.col("n_rows") > 0)

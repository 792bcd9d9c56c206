"""Token-budget sequence packing — the batching stage between curation
and the data loader (north-star extension; no reference analog).

One canonical implementation of the pack-id assignment (previously
re-derived at three sites — round-2 review finding): documents are
sharded by id-hash, ordered deterministically (hash, id) inside the
shard, and a pack id is the running token total's budget quotient —
greedy packing where an oversized or boundary-straddling document
closes the pack. Windows are SHARD-partitioned (never global), so the
operator scales as width(shards × extra keys).

Determinism notes: the `-1` offset makes the quotient the count of
FULL budgets strictly before this row's total (pack 0 holds totals
1..budget); the division runs in double then truncates, which equals
floor here because totals are ≥ 1 (tokens ≥ 1 per doc: split of a
trimmed empty string still yields one piece) and budget quotients of
magnitude ≤ 2^53 are exact for power-of-two budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygdf_spark.functions.hashing import md5_u64


def with_pack_ids(
    df: DataFrame,
    budget: int,
    n_shards: int,
    extra_keys: tuple = (),
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
) -> DataFrame:
    """Add ``shard`` and ``pack_id`` columns. ``extra_keys`` widens the
    packing domain (e.g. per-language packs)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    # stage the hash ONCE: the shard projection and the window sort key
    # are separate physical operators, so Catalyst does not CSE the
    # md5+conv+decimal chain across them — referencing the staged column
    # halves the dominant per-row cost (the oracle SQL stages h the same
    # way)
    h = md5_u64(F.col(id_col).cast("string"))
    out = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("int")
    )
    w = (
        Window.partitionBy(*extra_keys, "shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return out.withColumn(
        "pack_id", ((F.sum(tok_col).over(w) - 1) / budget).cast("long")
    ).drop("__h")

"""Skew mitigation (SURVEY.md §7 100-TB posture).

AQE's skew-join splitting handles sort-merge joins adaptively; this
module provides the EXPLICIT salting pattern for the cases AQE doesn't
reach (shuffled hash joins planned without runtime stats, aggregation
of heavy-hitter keys feeding `applyInPandas`, pre-4.x clusters):

- ``salted_join``: left rows get a deterministic salt in [0, n) derived
  from a row-unique column's hash; the (small-ish but hot-keyed) right
  side is replicated n× with every salt value. The join key becomes
  (key, salt), fanning one hot key across n reducers. Replication cost
  is |right|·n — use for dimension-sized rights with hot fact keys.
- ``salted_groupby_count``: two-phase agg over (key, salt) then key —
  the manual form of the partial/final combine Spark already applies
  to algebraic aggregates; needed when the per-key work is holistic
  (collect/apply) and a single reducer would own the hot key.

Salts are hash-derived, never random: retries and the DuckDB oracle see
the same assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the hot-key shuffle fanned out n ways.
    ``salt_from`` is any left column making rows (nearly) unique —
    its hash spreads one key's rows uniformly over the salt domain.

    Only left-preserving joins are allowed: the right side is
    replicated n_salt×, so 'right'/'full' would emit every unmatched
    right row n_salt times (duplicates)."""
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated right side "
            f"duplicates unmatched right rows; use one of {sorted(allowed)}"
        )
    if n_salt < 1:
        # pmod(x, 0) is NULL (non-ANSI) → nothing would ever equi-join:
        # silent empty/all-null output instead of an error
        raise ValueError(f"salted_join: n_salt must be >= 1, got {n_salt}")
    for side, name in ((left, "left"), (right, "right")):
        if "__salt" in side.columns:
            # withColumn would silently clobber it on the left;
            # select("*", …) would create an ambiguous duplicate on the
            # right (the range_join '__bucket' guard, applied here)
            raise ValueError(
                f"salted_join: {name} already has a '__salt' column; "
                "rename it first"
            )
    l = left.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt")
    r = right.select("*", salts)
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def salted_groupby_count(
    df: DataFrame, key: str, salt_from: str, n_salt: int = 8
) -> DataFrame:
    """count per key via salted partial + final combine."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt))
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("n"))

"""Distributed Bloom filter — the scale path for semi/anti joins where
the small side is too big to broadcast raw but its BITSET is not.

No reference analog (rapidsai/pygdf has no sketch surface; cf.
`cpp/include/cudf/search.hpp:164` `contains` for the exact form) — this
is the runtime-filter technique every warehouse engine uses: build a
compact bitset over the filter side's keys, broadcast it, and prune the
probe side map-side before any shuffle. Spark's own InjectRuntimeFilter
does this inside Catalyst for equi-joins; the operator here exposes it
for compositions Catalyst can't see through (e.g. probing n-grams held
in-row inside an array column, where the exists() probe avoids an
explode entirely).

Everything is JVM expressions — xxhash64 probes, bit_or bitset
assembly, getbit membership — zero Python in the row path.

Scale bounds (document, don't guess): at the classic ~10 bits/key &
k=7 (<1% FP), 100M keys → a 125 MB broadcast; beyond ~1B keys the
bitset itself stops broadcasting and the right tool is the plain
shuffle semi-join. Build cost is one shuffle of W=m/64 words (bounded
by m, not by the corpus), plus a single-row final assembly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
    n = max(n_keys, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max((m + 63) // 64 * 64, 64)  # whole words
    k = max(int(round(m / n * math.log(2))), 1)
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # k independent probes: xxhash64 re-seeded by a literal salt column.
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(keys: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """ONE-row DataFrame (column ``bits``: array<long>, length m/64)
    holding the Bloom bitset of every value in ``keys[col]``.

    Distributed build: explode each key to its k bit positions map-side,
    ONE groupBy(word) shuffle with bit_or partial aggregation (at most
    m/64 distinct groups regardless of input size), then a single-row
    assembly via map_from_entries + a gap-filling transform.
    """
    n_words = (m_bits + 63) // 64
    spark = keys.sparkSession
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("pos")
    # zero rows for every word keep the domain dense, so the final
    # assembly is just a sorted collect — NOT an element_at(map) per
    # word (Spark maps are linear-scan arrays; a map-lookup assembly is
    # O(W^2) on a single task and dominated an 8x smoke at W=16k)
    zeros = spark.range(n_words).select(
        F.col("id").cast("int").alias("w"), F.lit(0).cast("long").alias("bit")
    )
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            (F.col("pos") % 64).cast("int").alias("b"),
        )
        .select("w", F.expr("shiftleft(1L, b)").alias("bit"))
        .unionByName(zeros)
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda s: s.getField("word"),
        ).alias("bits")
    )


def bloom_might_contain(key: Column, bits: Column, m_bits: int, k: int) -> Column:
    """Boolean membership probe (false ⇒ DEFINITELY absent). Pure
    expression — usable inside exists()/filter() without an explode."""
    test = F.lit(True)
    for pos in _positions(key, m_bits, k):
        word = F.element_at(bits, (pos / 64).cast("int") + 1)
        test = test & (F.getbit(word, pos % 64) == 1)
    return test


def bloom_prefilter_join(
    big: DataFrame,
    key: str,
    small: DataFrame,
    small_key: str,
    how: str = "left_semi",
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """EXACT semi/anti join with a Bloom prefilter: bloom-negative rows
    resolve map-side (semi: dropped, anti: kept — no false negatives),
    and only bloom-positive candidates reach the exact hash join, so the
    shuffle/broadcast carries the |matches| + FP fraction instead of the
    whole probe side.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"bloom_prefilter_join: how={how!r} not semi/anti")
    for reserved in ("__bits", "__hit"):
        if reserved in big.columns:
            # a semi/anti join must preserve the left schema exactly —
            # withColumn/drop below would silently clobber the column
            raise ValueError(
                f"bloom_prefilter_join: input column {reserved!r} collides "
                "with an internal name; rename it first"
            )
    if n_keys is None:
        # sizing tolerates %-level error by construction (the filter is
        # a PREfilter; the downstream join restores exactness) — an
        # exact distinct+count shuffle over the filter side would cost
        # more than the sizing is worth
        n_keys = int(
            small.select(
                F.approx_count_distinct(small_key).alias("n")
            ).first()["n"]
        ) or 1
    m, k = bloom_params(n_keys, fpp)
    bits = bloom_build(small.select(small_key), small_key, m, k)
    probe = bloom_might_contain(F.col(key), F.col("__bits"), m, k)
    candidates = (
        big.crossJoin(F.broadcast(bits.withColumnRenamed("bits", "__bits")))
        .withColumn("__hit", probe)
    )
    if how == "left_semi":
        return (
            candidates.filter(F.col("__hit"))
            .drop("__bits", "__hit")
            .join(small.select(F.col(small_key).alias(key)), key, "left_semi")
        )
    maybe = (
        candidates.filter(F.col("__hit"))
        .drop("__bits", "__hit")
        .join(small.select(F.col(small_key).alias(key)), key, "left_anti")
    )
    certain = candidates.filter(~F.col("__hit")).drop("__bits", "__hit")
    return certain.unionByName(maybe)

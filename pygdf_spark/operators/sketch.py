"""Mergeable frequency sketches: Misra-Gries heavy hitters with an
exact verification pass.

The 100 TB problem: "top-k most frequent tokens" via a plain groupBy
shuffles EVERY distinct token (billions of keys for web-scale text).
The sketch-then-verify shape (same discipline as the Bloom
decontamination prefilter) cuts the shuffle to O(slots × partitions):

1. **Per-partition Misra-Gries summary** (Arrow-batched mapInPandas,
   ``slots`` entries): classic guarantee — per-partition undercount is
   at most N_p/(slots+1), so any item with GLOBAL count >
   N/(slots+1) survives in at least one partition's summary (if it
   died everywhere, summing the per-partition bounds gives
   f ≤ Σ N_p/(slots+1) = N/(slots+1), contradiction). Batch merging
   inside a partition uses the mergeable-summaries reduction
   (Agarwal et al., PODS 2012): add the batch's value_counts, then
   subtract the (slots+1)-th largest weight and drop non-positives.
2. **Exact verify**: the candidate union (≤ slots·P items) broadcasts
   into a semi-join and only candidate tokens are counted exactly —
   one shuffle over candidate rows instead of the full domain.
3. **Certification**: the result is EXACT (not approximate) whenever
   the k-th count exceeds N/(slots+1) — checked, and a loud ValueError
   otherwise (undersized sketch must never silently return a wrong
   top-k).

Reference note: cudf's nvtext has no frequency-sketch surface; this is
a §2.12 net-new vocab/stats component for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    items: DataFrame, col: str, slots: int = 512
) -> DataFrame:
    """One row per surviving candidate item per partition (the union
    over partitions is the exact-top-k candidate superset for any
    threshold above N/(slots+1))."""
    import pandas as pd  # noqa: F401  (executor-side)

    src = items.select(F.col(col).cast("string").alias("item")).filter(
        F.col(col).isNotNull()
    )

    def summarize(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > slots:
                thr = sorted(counts.values(), reverse=True)[slots]
                counts = {k: v - thr for k, v in counts.items() if v > thr}
        yield pd.DataFrame({"item": list(counts.keys())})

    return src.mapInPandas(summarize, "item string")


def heavy_hitters_topk(
    items: DataFrame, col: str, k: int, slots: int = 512
) -> DataFrame:
    """EXACT top-k most frequent values of ``col`` via sketch-prune +
    exact verify; deterministic (count DESC, value ASC) tiebreak.
    Raises ValueError if ``slots`` is too small to certify exactness
    for this k (k-th count must exceed N/(slots+1))."""
    spark = items.sparkSession
    src = items.select(F.col(col).cast("string").alias("item")).filter(
        F.col(col).isNotNull()
    )
    cand = misra_gries_candidates(items, col, slots).distinct()
    exact = (
        src.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item").asc())
        .limit(k)
    )
    rows = exact.collect()  # bounded: k rows
    n_total = src.count()
    floor = n_total / (slots + 1)
    # Soundness: every item with true count > floor IS a candidate, so
    # the result is exact iff no non-candidate (count <= floor) could
    # displace the k-th row: k full rows with the k-th above the floor,
    # or floor < 1 (no decrement ever fired -> candidates = domain).
    certified = (len(rows) == k and rows[-1]["n"] > floor) or floor < 1
    if not certified:
        kth = rows[-1]["n"] if rows else 0
        raise ValueError(
            f"heavy_hitters_topk: cannot certify exact top-{k} — "
            f"{len(rows)} candidate rows, k-th count {kth} vs floor "
            f"N/(slots+1) = {floor:.1f}; increase slots (have {slots})"
        )
    return spark.createDataFrame(
        [(r["item"], r["n"]) for r in rows], f"{col} string, n long"
    )

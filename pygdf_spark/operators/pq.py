"""Product quantization (PQ) — the compression half of an IVF-PQ ANN
index, the standard design for billion-vector search (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
reference has no ANN index — north-star extension).

Scale design:
- the codebooks are m tiny per-subspace k-means runs (k×sub numbers
  each) — the driver holds m·k·sub floats, never rows;
- ENCODING is the per-subspace assignment the k-means pass already
  produces map-side: each vector compresses to m small integer codes
  (m·log2(k) bits), the representation that lets a 100 TB corpus keep
  its index in memory;
- ADC (asymmetric distance computation) for a query is a per-subspace
  LOOKUP TABLE (k entries) folded into one map-side expression — the
  corpus scan does m table lookups + (m-1) adds per row, no vector
  arithmetic, no shuffle until the bounded top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygdf_spark.operators.kmeans import kmeans
from pygdf_spark.operators.similarity import _int_vec


def pq_encode(
    vecs: DataFrame,
    m: int = 4,
    sub: int = 16,
    k: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train per-subspace codebooks and encode every vector.

    Returns ``(codes, codebooks)``: ``codes`` is (vid, c0..c{m-1}) —
    the PQ code words — and ``codebooks[s]`` is the s-th subspace's
    final [(cid, centroid_vector)] list (sorted by cid; an emptied
    cluster's id is absent, so lookups key by cid, never position)."""
    codes = None
    codebooks = []
    for s in range(m):
        sub_df = vecs.select(
            F.col(id_col).alias("vec_id"),
            F.slice(vec_col, s * sub + 1, sub).alias("embedding"),
        )
        assigned, cents = kmeans(sub_df, k=k, iters=iters, return_centroids=True)
        a = assigned.select("vid", F.col("cid").alias(f"c{s}"))
        codes = a if codes is None else codes.join(a, "vid")
        codebooks.append(cents)
    return codes, codebooks


def adc_lut(query_int: list, codebooks, sub: int = 16) -> list:
    """Per-subspace ADC lookup tables for one µ-unit integer query
    vector: lut[s] = [(cid, squared distance from the query's s-th
    subvector to that centroid)]. Driver-side arithmetic over m·k·sub
    numbers, in the exact IEEE order the oracle's list_reduce uses
    (sequential left fold from 0.0 — identical because 0.0+x == x)."""
    luts = []
    for s, cents in enumerate(codebooks):
        qsub = [float(x) for x in query_int[s * sub : (s + 1) * sub]]
        entries = []
        for cid, c in cents:
            dist = 0.0
            for i in range(sub):
                t = qsub[i] - c[i]
                dist = dist + t * t
            entries.append((cid, dist))
        luts.append(entries)
    return luts


def adc_expr(luts) -> Column:
    """The map-side ADC distance: sum over subspaces of the code's LUT
    entry, as one chained-CASE expression per subspace (cid-keyed — an
    array index would break if a cluster emptied), left-assoc adds."""
    total = None
    for s, entries in enumerate(luts):
        e = None
        for cid, dval in entries:
            cond = F.col(f"c{s}") == cid
            e = F.when(cond, F.lit(dval)) if e is None else e.when(cond, F.lit(dval))
        total = e if total is None else total + e
    return total


def query_int_vector(vecs: DataFrame, query_vid: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    """The µ-unit integer vector of one query row (bounded driver
    collect — the ANN query pattern)."""
    row = (
        vecs.filter(F.col(id_col) == query_vid)
        .select(_int_vec(vec_col).alias("q"))
        .first()
    )
    return list(row["q"])

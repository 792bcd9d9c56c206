"""Deterministic row/token hashing (SURVEY.md §2.8 hash_values —
hashing.hpp:39, series.py:5336 — plus the LLM-dedup hash seeds).

``md5_u64`` reproduces DuckDB's ``md5_number_lower`` (little-endian
uint64 of the md5 digest's second half) with pure Spark expressions, so
minhash/simhash arithmetic is oracle-checkable bit-for-bit. At
production scale swap in ``F.xxhash64`` via the ``fast=`` flag — same
pipeline shape, cheaper hash (xxhash64 is what cuDF's hash_partition
uses by default, partitioning.hpp:93).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — modulus for minhash permutation arithmetic;
#: keeps a*x+b inside int64.
MERSENNE_P = 2_147_483_647


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_u64(col) -> Column:
    """Little-endian uint64 of md5 bytes 8..15 (== DuckDB
    md5_number_lower) as decimal(20,0)."""
    h = F.md5(_c(col).cast("string"))
    rev = F.concat(*[F.substring(h, i, 2) for i in (31, 29, 27, 25, 23, 21, 19, 17)])
    return F.conv(rev, 16, 10).cast("decimal(20,0)")


def md5_mod(col, p: int = MERSENNE_P) -> Column:
    """md5_u64 reduced mod p → LongType, in pure int64 arithmetic.

    The u64 splits into 32-bit halves, v = hi·2³² + lo, and
    v mod p = ((hi mod p)·(2³² mod p) + lo mod p) mod p — every
    intermediate ≤ (p−1)² + p < 2⁶³ for p ≤ 2³¹−1, so no decimal
    arithmetic is needed (this is the per-shingle hot path of the
    MinHash pipeline; the decimal(20,0) route costs ~2× per token).
    Identical values to (md5_u64 % p) — the DuckDB oracle mirrors
    md5_number_lower % p exactly as before."""
    assert p <= MERSENNE_P, "split-mod bound needs p <= 2^31-1"
    h = F.md5(_c(col).cast("string"))
    hi = F.conv(
        F.concat(*[F.substring(h, i, 2) for i in (31, 29, 27, 25)]), 16, 10
    ).cast("long")
    lo = F.conv(
        F.concat(*[F.substring(h, i, 2) for i in (23, 21, 19, 17)]), 16, 10
    ).cast("long")
    two32_mod = (1 << 32) % p
    return ((hi % F.lit(p)) * F.lit(two32_mod) + lo % F.lit(p)) % F.lit(p)


def hash_u64(col, fast: bool = False) -> Column:
    """Row-hash surface (hash_values series.py:5336). fast=True uses
    JVM xxhash64 (not oracle-mirrorable; production path)."""
    if fast:
        return F.xxhash64(_c(col))
    return md5_u64(col)


def minhash_perm(x: Column, i: int, p: int = MERSENNE_P) -> Column:
    """i-th universal-hash permutation h_i(x) = (a_i*x + b_i) mod p.
    a_i odd & nonzero, b_i arbitrary — fixed formulas so Spark and the
    SQL oracle generate identical families."""
    a = (37 * i + 11) % p
    b = (101 * i + 7) % p
    return (x * F.lit(a) + F.lit(b)) % F.lit(p)


def minhash_perm_sql(x_sql: str, i: int, p: int = MERSENNE_P) -> str:
    """The oracle-side rendering of :func:`minhash_perm`."""
    a = (37 * i + 11) % p
    b = (101 * i + 7) % p
    return f"(({x_sql}) * {a} + {b}) % {p}"

"""Exact sf1-scale oracle for pipeline_neardup_prune.

The registered DuckDB oracle (queries/llm_dedup.py:_neardup_prune_sql)
expresses connected components as a RECURSIVE walk CTE. That is exact
and fast at the driver's tier (sf0.01/sf0.1), but the walk
materializes every (vertex, reachable-smaller-label) pair — O(C^2) per
component — and at sf1 the loose 0.05 Jaccard threshold produces
components large enough that the walk runs for hours (measured: >30min,
>25 GB RSS, killed). The ENGINE side is immune: label propagation is
O(E log D) (operators/graph.py).

This tool keeps the comparison exact at sf1 by swapping ONLY the
closure step: DuckDB computes the identical shingle/minhash/LSH/verify
chain up to the verified pair list (19 s at sf1 — proven by the
dedup_minhash_lsh oracle which shares every CTE), then a Python
union-find (linear alpha) replaces the recursive CTE, and the final
per-source keep counts are compared value-for-value against the
engine's output.

Usage: python tools/neardup_cc_check.py [SF_DIR]
Exit 0 = exact match.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pygdf_spark import get_spark
from pygdf_spark.functions.hashing import MERSENNE_P, minhash_perm_sql
from pygdf_spark.queries.llm_dedup import _SHINGLE_SQL, pipeline_neardup_prune


def _pairs_sql() -> str:
    p = MERSENNE_P
    perm_rows = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS perm, {minhash_perm_sql('x', i)} AS h FROM hashed"
        for i in range(6)
    )
    return rf"""
WITH {_SHINGLE_SQL},
hashed AS (
  SELECT doc_id, CAST(md5_number_lower(shingle) % {p} AS BIGINT) AS x FROM shingles
),
sigs AS (
  SELECT doc_id, perm, MIN(h) AS minhash FROM ({perm_rows}) GROUP BY doc_id, perm
),
cand AS (
  SELECT DISTINCT m.doc_a, s.doc_id AS doc_b
  FROM sigs s
  JOIN (SELECT perm, minhash, MIN(doc_id) AS doc_a FROM sigs GROUP BY perm, minhash) m
    ON s.perm = m.perm AND s.minhash = m.minhash AND s.doc_id > m.doc_a
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles s1 JOIN shingles s2 ON s1.shingle = s2.shingle
  JOIN cand ON cand.doc_a = s1.doc_id AND cand.doc_b = s2.doc_id
  GROUP BY s1.doc_id, s2.doc_id
)
SELECT doc_a, doc_b FROM inter
JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter) >= 0.05
"""


class _UF:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        p = self.p
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-label as root: matches the engine's min-propagation comp
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pygdf_sf1"
    con = duckdb.connect()
    doc_path = os.path.join(sf_dir, "documents.parquet")
    glob = doc_path if os.path.isfile(doc_path) else os.path.join(doc_path, "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')"
    )
    print("oracle: DuckDB pair chain ...", flush=True)
    pairs = con.execute(_pairs_sql()).fetchall()
    print(f"oracle: {len(pairs)} verified pairs; union-find ...", flush=True)
    uf = _UF()
    for a, b in pairs:
        uf.union(a, b)
    removed = {
        x for x in uf.p if uf.find(x) != x
    }
    src = con.execute(
        "SELECT source, COUNT(*), list(doc_id) FROM documents GROUP BY source"
    ).fetchall()
    expect = {}
    for source, n_total, ids in src:
        n_removed = sum(1 for i in ids if i in removed)
        expect[source] = (n_total, n_total - n_removed, n_removed)

    print("engine: pipeline_neardup_prune ...", flush=True)
    spark = get_spark("neardup-cc-check")
    got_rows = pipeline_neardup_prune(spark, sf_dir).collect()
    got = {
        r["source"]: (r["n_total"], r["n_kept"], r["n_removed"]) for r in got_rows
    }
    ok = got == expect
    if not ok:
        for k in sorted(set(expect) | set(got)):
            if expect.get(k) != got.get(k):
                print(f"MISMATCH {k}: oracle={expect.get(k)} engine={got.get(k)}")
    print(
        f"{'OK' if ok else 'FAIL'} pipeline_neardup_prune "
        f"sources={len(got)} pairs={len(pairs)} removed={len(removed)}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

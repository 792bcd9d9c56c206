"""Physical-plan audit: the ".explain until it's the plan you want"
loop, automated. For every headline query (or --all) it prints the
scale-relevant facts of the executed plan:

- join strategies (broadcast vs shuffle vs nested-loop)
- exchange (shuffle) count
- parquet pushdown evidence (PushedFilters / pruned ReadSchema)
- single-partition windows (empty partition spec — the 100 TB hazard)
- Python eval mode (Arrow-batched good, row-at-a-time BatchEvalPython bad)
- duplicated higher-order-function subtrees inside one plan node: HOF
  lambdas run interpreted (outside whole-stage codegen), so Catalyst
  does NOT common-subexpression-eliminate them — the same transform()
  appearing twice in one Project runs twice per row (the round-2
  shingle_sets regression: 3x the ngram pipeline per document)

Exit code 1 if a hazard appears (row-Python or unexpected global
window), so this can run as a regression gate.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import get_spark
from pygdf_spark.queries import registry
import bench

# global-order windows that are semantically global AND bounded (tiny
# domains or driver-documented positional ops)
GLOBAL_WINDOW_OK = {"reshape_factorize", "take_slice_split", "merge_sorted_union",
                    "sim_pq_adc"}  # rank window runs AFTER limit(5) — 5 rows


_HOF_MARKERS = ("transform(", "zip_with(", "aggregate(", "filter(", "exists(")


def _balanced(line: str, i: int, cap: int = 4000) -> str:
    """The full parenthesized subtree starting at the marker at ``i``
    (up to ``cap`` chars — longer trees compare by prefix, fine for
    dedup counting)."""
    depth = 0
    j = line.find("(", i)
    if j < 0:
        return line[i : i + cap]
    for k in range(j, min(len(line), i + cap)):
        if line[k] == "(":
            depth += 1
        elif line[k] == ")":
            depth -= 1
            if depth == 0:
                return line[i : k + 1]
    return line[i : i + cap]


def dup_hof_subtrees(plan: str) -> int:
    """Count HOF subtrees whose FULL text appears >=2 times within a
    single plan line (one node). Identical repeated HOF subtrees in one
    Project run that many times per row — HOF lambdas are interpreted,
    outside whole-stage codegen's subexpression elimination. Distinct
    lambdas over the same array attribute (e.g. per-plane folds) differ
    in their full text and are NOT flagged."""
    dups = 0
    for line in plan.splitlines():
        # normalize LAMBDA-variable IDs only: duplicated subtrees get
        # fresh lambda vars per occurrence (lambda x_1#7 vs lambda
        # x_1#9), but attribute IDs stay — two same-named attributes
        # from a self-join (vec#12 vs vec#45) are different columns and
        # must not be conflated into a false duplicate
        line = re.sub(r"(lambda\s+\w+?)#\d+", r"\1#", line)
        seen: dict[str, int] = {}
        for m in _HOF_MARKERS:
            start = 0
            while True:
                i = line.find(m, start)
                if i < 0:
                    break
                key = _balanced(line, i)
                seen[key] = seen.get(key, 0) + 1
                start = i + 1
        dups += sum(c - 1 for c in seen.values() if c > 1)
    return dups


def audit(name, df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    facts = {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange "),
        "pushed": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "arrow_py": sum(plan.count(k) for k in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "AggregateInPandas")),
        "row_py": plan.count("BatchEvalPython"),
        "dup_hof": dup_hof_subtrees(plan),
    }
    # Window specs: `Window [exprs], [partition], [order]` — a window
    # whose partition spec is empty funnels data through one task.
    global_windows = len(re.findall(r"Window \[[^\]]*\], \[[^\]]*\]$", plan, re.M))
    facts["global_win"] = sum(
        1 for m in re.finditer(r"Window (?:\[[^\]]*\], ){1}\[\]", plan)
    ) + plan.count("], [], [")  # empty partition spec forms
    hazard = (
        facts["row_py"] > 0
        or (facts["global_win"] > 0 and name not in GLOBAL_WINDOW_OK)
        or facts["dup_hof"] > 0
    )
    return facts, hazard


def main():
    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("plan-audit")
    queries, _ = registry()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if names == ["--all"]:
        names = sorted(queries)
    bad = 0
    print(f"{'query':28s} {'joins(B/S/H/N)':>14s} {'exch':>4s} {'push':>4s} {'pyA':>3s} {'pyR':>3s} {'gWin':>4s} {'dupH':>4s}")
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            facts, hazard = audit(name, fn(spark, sf_dir))
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:60]}")
            bad += 1
            continue
        flag = " <-- HAZARD" if hazard else ""
        bad += int(hazard)
        print(
            f"{name:28s} {facts['bhj']}/{facts['smj']}/{facts['shj']}/{facts['bnlj']:>10} "
            f"{facts['exchanges']:>4d} {str(facts['pushed'])[0]:>4s} "
            f"{facts['arrow_py']:>3d} {facts['row_py']:>3d} {facts['global_win']:>4d} {facts['dup_hof']:>4d}{flag}"
        )
    print(f"\n{'HAZARDS: ' + str(bad) if bad else 'ALL CLEAN'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

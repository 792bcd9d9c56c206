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


def veneer_cases(spark):
    """Order-dependent compat-veneer ops (round-2 verdict 'What's wrong
    #1': these funneled through one-task Window.orderBy(__row_id); now
    routed through operators/order.py). Each yields (name, DataFrame
    plan) for the same global-window hazard scan as queries(). Excluded
    documented small-data ops: transpose/argsort/to_pandas (driver
    materializations guarded by max_driver_rows)."""
    import pandas as pd

    import pygdf_spark as gd

    pdf = pd.DataFrame({
        "a": [3, 1, 2, 1, 3, 2] * 5,
        "b": [1.0, None, 2.5, 4.0, 0.5, 3.0] * 5,
        "l": [[1, 2], [3], [], [4, 5], [6], [7]] * 5,
    })
    df = gd.from_pandas(pdf, spark)
    other = gd.from_pandas(pdf.head(4), spark)
    yield "veneer_sort_values", df.sort_values(["a", "b"])._sdf
    yield "veneer_shift", df.shift("b", 1)._sdf
    yield "veneer_diff", df.diff("b")._sdf
    yield "veneer_cumsum", df.cumsum("b")._sdf
    yield "veneer_cummin", df.cummin("b")._sdf
    yield "veneer_cumprod", df.cumprod("b")._sdf
    yield "veneer_rank", df.rank("b", method="average")._sdf
    yield "veneer_take", df.take([0, 3])._sdf
    yield "veneer_explode", df.explode("l")._sdf
    yield "veneer_interleave", df.interleave_columns(["a", "b"])._sdf
    yield "veneer_melt", df.melt(["a"], ["b"])._sdf
    yield "veneer_reset_index", df.reset_index()._sdf
    yield "veneer_set_index", df.set_index("a")._sdf
    yield "veneer_reverse", df.reverse()._sdf
    yield "veneer_repeat", df.repeat(2)._sdf
    yield "veneer_tile", df.tile(2)._sdf
    yield "veneer_dedup_keep_last", df.drop_duplicates(["a"], keep="last")._sdf
    yield "veneer_factorize", df.factorize("a")[0]._sdf
    yield "veneer_append", df.append(other)._sdf
    yield "veneer_rolling", df.rolling(3, min_periods=1).mean("b")._sdf
    yield "veneer_rolling_count", df.rolling(3).count("b")._sdf
    yield "veneer_pos", gd.core.dataframe.DataFrame(df._pos_sdf())._sdf
    yield "veneer_merge", df.merge(other, on="a", suffixes=("", "_r"))._sdf
    yield "veneer_groupby_cumsum", df.groupby("a").cumsum("b")._sdf
    yield "veneer_series_drop", df["b"].drop([1])._sdf


def lint_topandas() -> int:
    """Source lint (r6, VERDICT r5 Next #2): no full-table ``toPandas()``
    in any registry query. Every ``.toPandas()`` occurrence under
    ``pygdf_spark/queries/`` must carry a ``# bounded:`` annotation (same
    line or the two lines above) stating WHY the collect is bounded —
    unannotated collects are the io_safetensors_roundtrip driver-OOM
    class and exit 1."""
    import glob

    qdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "pygdf_spark", "queries")
    bad = 0
    for path in sorted(glob.glob(os.path.join(qdir, "*.py"))):
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines):
            if ".toPandas()" not in line:
                continue
            ctx = "\n".join(lines[max(0, i - 3): i + 1])
            if "# bounded:" not in ctx:
                bad += 1
                rel = os.path.relpath(path, os.path.join(qdir, "..", ".."))
                print(f"TOPANDAS {rel}:{i+1}: unannotated .toPandas() — "
                      f"add '# bounded: <why>' or fan the write out")
    return bad


def main():
    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("plan-audit")
    queries, _ = registry()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if names == ["--veneer"]:
        bad = 0
        print(f"{'veneer op':28s} {'exch':>4s} {'pyR':>3s} {'gWin':>4s}")
        for name, sdf in veneer_cases(spark):
            facts, hazard = audit(name, sdf)
            flag = " <-- HAZARD" if hazard else ""
            bad += int(hazard)
            print(f"{name:28s} {facts['exchanges']:>4d} {facts['row_py']:>3d} {facts['global_win']:>4d}{flag}")
        print(f"\n{'HAZARDS: ' + str(bad) if bad else 'ALL CLEAN'}")
        sys.exit(1 if bad else 0)
    if names == ["--all"]:
        names = sorted(queries)
        bad0 = lint_topandas()
        if bad0:
            print(f"HAZARDS: {bad0} (unannotated toPandas in queries/)")
            sys.exit(1)
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

"""Suggest the next round's driver-correctness window.

The driver checks the FIRST 50 registry entries (queries/__init__.py
_PRIORITY). This tool unions every CORRECTNESS_r*.json in the repo root
and reports (a) queries with a driver-green row in ANY round, (b) the
ones still unverified, and (c) a suggested next window: all unverified
queries first (cheapest families first is the maintainer's call), topped
up with previously-green family representatives.

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark.queries import registry  # noqa: E402


def main() -> None:
    queries, oracle = registry()
    names = list(queries)
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") or name not in oracle
            ):
                green.add(name)
    unverified = [n for n in names if n not in green]
    print(f"registry: {len(names)}  driver-green (any round): {len(green & set(names))}")
    print(f"unverified: {len(unverified)}")
    for n in unverified:
        print(f"  {n}")
    suggestion = unverified[:50]
    if len(suggestion) < 50:
        suggestion += [n for n in names if n in green][: 50 - len(suggestion)]
    print("\nsuggested _PRIORITY (next round window):")
    print(json.dumps(suggestion, indent=2))


if __name__ == "__main__":
    main()

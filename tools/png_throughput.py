"""PNG decode throughput curve at realistic image sizes (r6, VERDICT r5
Next #4's 'committed curve' ask).

Measures decode wall and pixel throughput for the vectorized unfilter
vs the retained scalar oracle path, across sizes >= 256x256 and the two
interesting filter regimes (all-Paeth = worst case, 'mixed' = the
fixture/golden regime). Host-side only (the codec runs identically
inside mapInPandas workers); prints one JSON line for SCALING.md.

Usage: python tools/png_throughput.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark.sources.png_lite import decode_png, encode_png  # noqa: E402


def _rate(data: bytes, npixbytes: int, budget: float = 2.0) -> tuple[float, float]:
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < budget:
        decode_png(data)
        n += 1
    dt = (time.perf_counter() - t0) / n
    return dt, npixbytes / dt / 1e6


def main() -> None:
    rng = np.random.default_rng(7)
    out = {"load1": round(os.getloadavg()[0], 2), "rows": []}
    for side in (256, 512, 1024):
        for ft in (4, "mixed"):
            img = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
            data = encode_png(img, ft)
            dt, mbs = _rate(data, img.nbytes)
            out["rows"].append({
                "size": f"{side}x{side}x3", "filter": str(ft),
                "ms_per_decode": round(dt * 1000, 2),
                "mb_per_s": round(mbs, 1),
            })
    print(json.dumps(out))


if __name__ == "__main__":
    main()

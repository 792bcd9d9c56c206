"""Partition-invariance gate: the full oracle check under ADVERSARIAL
physical partitioning.

Results must not depend on partition layout — order-tie handling, float
accumulation order, and limit/boundary logic are exactly the bug
classes that only bite when the layout changes (i.e. on a real
cluster). This re-runs tools/check_oracle.py with:

- ``spark.sql.files.maxPartitionBytes=64KB``: every scan splinters into
  many tiny tasks (a 1000-executor cluster's task granularity, not
  local[32]'s);
- ``spark.sql.shuffle.partitions=7`` (prime): every hash distribution
  changes, so any row that lands "in the right place by accident"
  moves;
- ``spark.sql.adaptive.advisoryPartitionSizeInBytes=1KB``: AQE
  coalescing makes different runtime choices.

Usage: python tools/adversarial_gate.py [sf_dir] [only]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygdf_spark import session

session._DEFAULTS.update({
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(1024),
})

from check_oracle import main  # noqa: E402  (same dir)
from lint_oracle_types import lint  # noqa: E402  (same dir)

if __name__ == "__main__":
    # Static oracle-output-type lint first (r6): rejects HUGEINT/UINT/
    # DECIMAL-binding oracle SQLs — the class that hash-fails the driver
    # while the pre-r6 local canonicalizer reported [exact] (q12, r5).
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if lint(sf):
        sys.exit(1)
    main()

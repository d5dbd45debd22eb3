"""Full driver-style oracle sweep at an arbitrary scale factor.

    python scripts/oracle_sweep.py [sf_dir]

Runs EVERY registered contract query against its DuckDB oracle with the
same comparison the local gate uses (row count + columns +
order-insensitive values) and prints one line per failure, a summary
line last. The local pytest gate runs at sf0.001 for speed; the driver
gates a sample at sf0.01 — this script closes the gap by sweeping all
queries at the driver's scale before a round ends.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark.queries import ORACLES, QUERIES  # noqa: E402
from as_etl_storage_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import run_and_compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("oracle-sweep")
    failures = 0
    t0 = time.time()
    for name in sorted(QUERIES):
        try:
            problems = run_and_compare(
                spark, sf_dir, name, QUERIES[name], ORACLES.get(name)
            )
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            problems = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures += 1
            for p in problems:
                print(f"FAIL {p}")
    print(
        f"swept {len(QUERIES)} queries at {sf_dir}: "
        f"{len(QUERIES) - failures} ok, {failures} failed, "
        f"{round(time.time() - t0)}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

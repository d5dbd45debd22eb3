"""Full driver-style oracle sweep at an arbitrary scale factor.

    python scripts/oracle_sweep.py [sf_dir] [out_file]

Runs EVERY registered contract query against its DuckDB oracle with the
same comparison the local gate uses (row count + columns +
order-insensitive values) and prints one line per failure, a summary
line last. The local pytest gate runs at sf0.001 for speed; the driver
gates a sample at sf0.01 — this script closes the gap by sweeping all
queries at the driver's scale before a round ends.

When ``out_file`` is given (convention: ``SWEEP_r{N}.txt`` at the repo
root, committed per round), every query's ok/FAIL status is written
there too, so the evidence for the ~170 queries the driver's 50-query
sample never exercises survives the session as a git artifact instead
of a transient log.
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
    out_file = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("oracle-sweep")
    failures = 0
    lines: list[str] = []
    t0 = time.time()
    for name in sorted(QUERIES):
        q0 = time.time()
        try:
            problems = run_and_compare(
                spark, sf_dir, name, QUERIES[name], ORACLES.get(name)
            )
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            problems = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        oracle_kind = "oracle" if ORACLES.get(name) else "rows-only"
        if problems:
            failures += 1
            for p in problems:
                print(f"FAIL {p}")
            lines.append(f"FAIL {name} [{oracle_kind}] {'; '.join(problems)}")
        else:
            lines.append(
                f"ok   {name} [{oracle_kind}] {time.time() - q0:.2f}s"
            )
    summary = (
        f"swept {len(QUERIES)} queries at {sf_dir}: "
        f"{len(QUERIES) - failures} ok, {failures} failed, "
        f"{round(time.time() - t0)}s"
    )
    print(summary)
    if out_file:
        with open(out_file, "w") as fh:
            fh.write("\n".join(lines + [summary]) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

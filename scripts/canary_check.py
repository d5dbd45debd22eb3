"""Box-health canary PRE-check (VERDICT r14 item 1 / item 7).

Runs the engine-free canary — raw spark.read.parquet(lineitem) ->
parquet write at sf0.1 — N times and prints rows/s per run. This is
the exact workload bench.py reports as etl_copy_rows_per_sec; it
exercises ZERO engine code, so its throughput measures the box, not
the repo. Healthy band (r12/r13 capture days): >= 600k rows/s.

Usage: python scripts/canary_check.py [n_runs]
Exit status 0 iff the MEDIAN run is >= 600k rows/s.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark.session import get_spark  # noqa: E402

HEALTHY_ROWS_PER_SEC = 600_000


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_rows = li.count()
    rates = []
    for i in range(n_runs):
        copy_dir = tempfile.mkdtemp(prefix="canary_copy_")
        t0 = time.perf_counter()
        li.write.mode("overwrite").parquet(os.path.join(copy_dir, "out"))
        dt = time.perf_counter() - t0
        shutil.rmtree(copy_dir, ignore_errors=True)
        rates.append(int(n_rows / dt))
        print(f"run {i + 1}: {dt:.3f}s = {rates[-1]:,} rows/s", file=sys.stderr)
    med = int(statistics.median(rates))
    load1, load5, load15 = os.getloadavg()
    out = {
        "canary_rows_per_sec_median": med,
        "canary_runs": rates,
        "rows": n_rows,
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
        "healthy": med >= HEALTHY_ROWS_PER_SEC,
        "threshold": HEALTHY_ROWS_PER_SEC,
    }
    print(json.dumps(out))
    return 0 if med >= HEALTHY_ROWS_PER_SEC else 1


if __name__ == "__main__":
    raise SystemExit(main())

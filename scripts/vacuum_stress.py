"""Driver-side vacuum listing cost at file-count scale (SCALE.md
'vacuum_listing').

vacuum() lists the table with os.walk and getmtime-checks every
candidate on the DRIVER (writers/versioned.py:vacuum). That is correct
but serial; Delta distributes the listing as a Spark job. This script
measures what the driver-side walk actually costs at 10^4 and 10^5
files so the boundary is documented like every other one: the walk is
pure metadata (no data bytes), so the cost is filesystem stat calls.

The files are synthetic empties — vacuum's walk cost depends only on
the NUMBER of directory entries and stat calls, never file content.

Usage: python scripts/vacuum_stress.py  (prints one JSON row)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(root: str, n_files: int, per_dir: int = 1000) -> None:
    for i in range(n_files):
        d = os.path.join(root, f"k={i // per_dir}")
        if i % per_dir == 0:
            os.makedirs(d, exist_ok=True)
        open(os.path.join(d, f"part-{i:08d}.parquet"), "w").close()


def walk_like_vacuum(root: str) -> int:
    """The exact shape of vacuum's sweep: os.walk + one getmtime per
    parquet candidate (the grace check), keep-set membership skipped
    (empty keep-set = worst case, every file is a candidate)."""
    n = 0
    for r, _dirs, names in os.walk(root):
        for f in names:
            if not f.endswith(".parquet"):
                continue
            try:
                os.path.getmtime(os.path.join(r, f))
                n += 1
            except OSError:
                pass
    return n


def main() -> None:
    out = {"case": "vacuum_listing"}
    for n in (10_000, 100_000):
        root = tempfile.mkdtemp(prefix="vac_stress_")
        try:
            build(root, n)
            t0 = time.perf_counter()
            seen = walk_like_vacuum(root)
            dt = time.perf_counter() - t0
            assert seen == n
            out[f"files_{n}"] = {
                "walk_plus_stat_sec": round(dt, 3),
                "usec_per_file": round(dt / n * 1e6, 1),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


def main_distributed() -> None:
    """End-to-end vacuum through BOTH sweep paths on a real versioned
    table with synthetic orphans (the sweep never reads data bytes, so
    empty orphan files measure the real list/stat/delete cost). On a
    local FS the driver loop is expected to WIN — the distributed path's
    value is the object store, where each stat/delete is a network RTT
    and the fan-out is the point; this measures the local-mode overhead
    so the trade is documented, not guessed."""
    from as_etl_storage_spark.session import get_spark
    from as_etl_storage_spark.writers.versioned import VersionedTable

    spark = get_spark("vacuum-stress")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    out = {"case": "vacuum_distributed", "orphans": n}
    for mode, distributed in (("driver", False), ("spark_job", True)):
        root = tempfile.mkdtemp(prefix="vac_dist_")
        try:
            vt = VersionedTable(spark, root)
            vt.overwrite(spark.range(100).coalesce(2))  # v0
            vt.overwrite(spark.range(100, 200).coalesce(2))  # v1
            build(root, n)  # orphans under k=*/ dirs
            t0 = time.perf_counter()
            removed = vt.vacuum(
                retain_last=1, grace_seconds=0.0, distributed=distributed
            )
            dt = time.perf_counter() - t0
            assert removed >= n, (mode, removed)
            assert vt.read().count() == 100
            out[mode] = {
                "sweep_sec": round(dt, 3),
                "usec_per_file": round(dt / removed * 1e6, 1),
                "removed": removed,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "distributed":
        main_distributed()
    else:
        main()

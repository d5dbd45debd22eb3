"""Incremental-clustering maintenance cost: flat as the table grows?

The r14 shape re-sorted the WHOLE compact scope every round, so
auto-compaction's clustering cost grew with the table. The r15
incremental mode (compact cluster_mode='auto' on a vt.clusterBy table)
sorts only the unclustered tail — files added since the last clustering
commit — so per-round cost should track INGEST, not table size.

This script ingests fixed-size interleaved batches, runs a maintenance
clustering round after each, and prints per-round wall time plus the
fraction of live files each round rewrote, for both modes:

    python scripts/cluster_stress.py [rounds] [rows_per_batch]

Done-criterion readout: incremental per-round time stays ~flat while
full per-round time grows with cumulative rows; the ordering-sensitive
prune stays selective in both modes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from as_etl_storage_spark.session import get_spark  # noqa: E402
from as_etl_storage_spark.writers.versioned import VersionedTable  # noqa: E402


def run(spark, mode: str, rounds: int, rows: int) -> list[dict]:
    root = tempfile.mkdtemp(prefix=f"cluster_stress_{mode}_")
    vt = VersionedTable(spark, os.path.join(root, "t"))
    vt.overwrite(
        spark.range(1).select((F.col("id") - 1).alias("v")).coalesce(1)
    )
    vt.set_properties({"vt.clusterBy": "v"})
    out = []
    base_key = 0
    for r in range(rounds):
        # 4 interleaved files per round: every file spans the batch range
        for b in range(4):
            vt.append(
                spark.range(rows // 4)
                .select((F.col("id") * 4 + b + base_key).alias("v"))
                .coalesce(1)
            )
        pre = set(vt._state(vt.latest_version()))
        t0 = time.perf_counter()
        vt.compact(target_file_bytes=64 * 1024, cluster_mode=mode)
        dt = time.perf_counter() - t0
        post = set(vt._state(vt.latest_version()))
        rewritten = len(post - pre)
        # ordering-sensitive prune must stay selective
        lo = base_key
        sel = vt.read(prune=[("v", ">=", lo), ("v", "<", lo + 100)])
        n_live = len(vt.read().inputFiles())
        out.append(
            {
                "round": r,
                "mode": mode,
                "compact_sec": round(dt, 3),
                "files_rewritten": rewritten,
                "files_live": len(post),
                "prune_scanned": len(sel.inputFiles()),
                "prune_live": n_live,
                "prune_rows": sel.count(),
                "total_rows": vt.count(),
            }
        )
        base_key += rows
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("cluster_stress")
    for mode in ("incremental", "full"):
        rows_out = run(spark, mode, rounds, rows)
        for row in rows_out:
            print(json.dumps(row))
        secs = [r["compact_sec"] for r in rows_out]
        print(
            json.dumps(
                {
                    "mode": mode,
                    "first_round_sec": secs[0],
                    "last_round_sec": secs[-1],
                    "growth": round(secs[-1] / secs[0], 2)
                    if secs[0] > 0
                    else None,
                }
            )
        )


if __name__ == "__main__":
    main()

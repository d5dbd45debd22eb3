"""Evidence that materialized-view refresh cost is ∝ CHANGES, not
∝ table: build two sources an order of magnitude apart, apply the SAME
small DML batch to both, and time the incremental refresh. If the
refresh were table-proportional the big table's refresh would be ~10×
the small one's; the claim is that both sit near the same constant
(feed scan ∝ changed files + merge ∝ matched view files).

Second probe (join form): a CLUSTERED fact enriched by a dim lookup;
the same small dimension patch (20 keys) is applied at both fact
scales and the refresh timed. The phase-B recompute scans the fact
scoped to the affected keys with pushed literal predicates — on a fact
clustered by the join key, row groups outside the touched key ranges
are stats-skipped, so the refresh should track the AFFECTED rows, not
the table (near-flat ratio across the 10× fact sizes).

Run from the repo root: ``python scripts/mv_stress.py [small] [big]``
(default 20_000 and 200_000 rows).
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

from as_etl_storage_spark import get_spark  # noqa: E402
from as_etl_storage_spark.runner import run_job  # noqa: E402
from as_etl_storage_spark.writers.versioned import VersionedTable  # noqa: E402


def one_scale(spark, n_rows: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"mvstress_{n_rows}_")
    try:
        src = VersionedTable(spark, os.path.join(root, "src"))
        src.overwrite(
            spark.range(n_rows).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("g"),
                (F.col("id") * 3).alias("v"),
            ).repartition(8)
        )
        src.enable_row_tracking()
        job = {
            "materialize": {
                "connection": {"url": root, "table": {"name": "src"}},
                "target": os.path.join(root, "view"),
                "select": ["k", "g", "v * 2 AS v2"],
                "where": "v % 5 != 0",
            }
        }
        t0 = time.time()
        run_job(spark, job)
        t_build = time.time() - t0
        # the SAME fixed-size DML batch at every scale: 500 updates,
        # 200 deletes, 300 inserts
        src.update("k >= 1000 AND k < 1500", {"v": "v + 1"})
        src.delete("k >= 2000 AND k < 2200")
        src.append(
            spark.range(n_rows, n_rows + 300).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("g"),
                (F.col("id") * 3).alias("v"),
            )
        )
        t0 = time.time()
        res = run_job(spark, job)
        t_refresh = time.time() - t0
        assert res.mode == "incremental", res.mode
        return {
            "rows": n_rows,
            "build_sec": round(t_build, 3),
            "refresh_sec": round(t_refresh, 3),
            "deletes": res.deletes,
            "upserts": res.upserts,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def join_scale(spark, n_rows: int, n_keys: int = 5_000) -> dict:
    root = tempfile.mkdtemp(prefix=f"mvjstress_{n_rows}_")
    try:
        src = VersionedTable(spark, os.path.join(root, "fact"))
        src.overwrite(
            spark.range(n_rows)
            .select(
                F.col("id").alias("fid"),
                (F.col("id") % n_keys).alias("k"),
                (F.col("id") * 3).cast("double").alias("v"),
            )
            .repartitionByRange(8, "k")
            .sortWithinPartitions("k")
        )
        src.enable_row_tracking()
        dim = VersionedTable(spark, os.path.join(root, "dim"))
        dim.overwrite(
            spark.range(n_keys).select(
                F.col("id").alias("k"),
                (F.col("id") * 1.0).alias("rate"),
            )
        )
        job = {
            "materialize": {
                "connection": {"url": root, "table": {"name": "fact"}},
                "target": os.path.join(root, "view"),
                "join": {
                    "connection": {"table": {"name": "dim"}},
                    "on": ["k"],
                    "how": "left",
                },
                "select": ["fid", "k", "v", "v * rate AS priced"],
            }
        }
        run_job(spark, job)
        # the SAME 20-key dimension patch at every fact scale
        dim.update("k >= 100 AND k < 120", {"rate": "rate * 2"})
        t0 = time.time()
        res = run_job(spark, job)
        t_refresh = time.time() - t0
        assert res.mode == "incremental" and res.recomputed == 20, res
        return {
            "fact_rows": n_rows,
            "refresh_sec": round(t_refresh, 3),
            "affected_keys": res.recomputed,
            "upserts": res.upserts,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("mv-stress")
    a = one_scale(spark, small)
    b = one_scale(spark, big)
    ja = join_scale(spark, small)
    jb = join_scale(spark, big)
    out = {
        "small": a,
        "big": b,
        "table_ratio": round(b["rows"] / a["rows"], 1),
        "build_ratio": round(b["build_sec"] / a["build_sec"], 2),
        "refresh_ratio": round(b["refresh_sec"] / a["refresh_sec"], 2),
        "join_small": ja,
        "join_big": jb,
        "join_refresh_ratio": round(
            jb["refresh_sec"] / ja["refresh_sec"], 2
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

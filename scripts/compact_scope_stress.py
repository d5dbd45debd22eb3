"""Partition-scoped OPTIMIZE cost evidence (SCALE.md 'compact_scope').

compact(where=...) claims rewrite cost proportional to the SCOPE, not
the table: a 10-partition fragmented table is compacted fully vs one
partition only, and the wall-clock plus files-rewritten are reported.
The scoped run must also leave every out-of-scope file untouched
(asserted), with identical row content (asserted).

Usage: python scripts/compact_scope_stress.py  (prints one JSON row)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from as_etl_storage_spark import get_spark
from as_etl_storage_spark.writers.versioned import VersionedTable

ROWS = 500_000
PARTS = 10
APPENDS = 10  # fragments per partition ≈ APPENDS files each


def build(spark, root: str) -> VersionedTable:
    vt = VersionedTable(spark, root)
    per = ROWS // APPENDS
    for i in range(APPENDS):
        batch = spark.range(i * per, (i + 1) * per).select(
            "id",
            (F.col("id") % PARTS).alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        if i == 0:
            vt.overwrite(batch, partition_by=["k"])
        else:
            vt.append(batch)
    return vt


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    spark = get_spark("compact-scope-stress")
    base = tempfile.mkdtemp(prefix="cscope_")
    try:
        # warm the compact path once
        w = VersionedTable(spark, os.path.join(base, "warm"))
        w.overwrite(spark.range(1000).repartition(4))
        w.compact()

        a = build(spark, os.path.join(base, "full"))
        n_before = len(a._state(a.latest_version()))
        t_full, _ = timed(lambda: a.compact())
        full_after = len(a._state(a.latest_version()))

        b = build(spark, os.path.join(base, "scoped"))
        before = b._state(b.latest_version())
        out_scope = [f for f in before if not f.startswith("k=3")]
        t_scoped, v = timed(lambda: b.compact(where=[("k", "=", 3)]))
        st = b._state(v)
        assert [f for f in st if not f.startswith("k=3")] == out_scope, (
            "out-of-scope files must be carried by name"
        )
        assert b.read().count() == ROWS
        rewrote = len([f for f in before if f.startswith("k=3")])
        print(
            json.dumps(
                {
                    "case": "compact_scope",
                    "partitions": PARTS,
                    "files_before": n_before,
                    "rows": ROWS,
                    "full_compact_sec": round(t_full, 2),
                    "full_files_after": full_after,
                    "scoped_compact_sec": round(t_scoped, 2),
                    "scoped_files_rewritten": rewrote,
                    "scoped_files_carried": len(out_scope),
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""File-level OCC cost evidence (SCALE.md 'occ_compact_under_ingest').

Measures the r11 conflict-resolution path: OPTIMIZE running against a
table under CONTINUOUS concurrent ingest. Before r11 this aborted
(starvation under always-on streaming); now compact rebases over the
concurrent pure appends. Reported:

  * compact wall-clock on an idle table vs under ingest (the delta is
    the rebase: manifest walks + dict merges, no data I/O);
  * how many concurrent appends landed mid-compaction and were
    composed into its snapshot (verified by row count).

Usage: python scripts/occ_stress.py  (prints one JSON row)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark import get_spark
from as_etl_storage_spark.writers.versioned import VersionedTable

ROWS = 400_000
FILES = 200


def build(spark, root: str) -> VersionedTable:
    vt = VersionedTable(spark, root)
    vt.overwrite(spark.range(ROWS).repartition(FILES))
    return vt


def main() -> None:
    spark = get_spark("occ-stress")
    base = tempfile.mkdtemp(prefix="occ_stress_")
    try:
        # warmup: first compact in a session pays JIT/codegen, which
        # would bias whichever measured case runs first
        w = VersionedTable(spark, os.path.join(base, "warm"))
        w.overwrite(spark.range(1000).repartition(4))
        w.compact()

        # idle baseline
        a = build(spark, os.path.join(base, "idle"))
        t0 = time.perf_counter()
        a.compact()
        t_idle = time.perf_counter() - t0

        # under ingest: an appender thread commits continuously
        b = build(spark, os.path.join(base, "busy"))
        appender = VersionedTable(spark, os.path.join(base, "busy"))
        stop = threading.Event()
        landed = []

        def ingest():
            lo = 10_000_000
            while not stop.is_set():
                appender.append(spark.range(lo, lo + 1000).coalesce(1))
                landed.append(lo)
                lo += 1000

        th = threading.Thread(target=ingest)
        th.start()
        time.sleep(0.5)
        t0 = time.perf_counter()
        v = b.compact()
        t_busy = time.perf_counter() - t0
        stop.set()
        th.join()
        # appends that pre-dated compact's commit were composed in;
        # later ones are ordinary deltas — total rows must be exact
        assert b.read().count() == ROWS + 1000 * len(landed)
        composed = v - 1 - 0  # versions between overwrite(0) and compact
        print(
            json.dumps(
                {
                    "case": "occ_compact_under_ingest",
                    "files": FILES,
                    "rows": ROWS,
                    "compact_idle_sec": round(t_idle, 2),
                    "compact_under_ingest_sec": round(t_busy, 2),
                    "concurrent_appends_total": len(landed),
                    "appends_composed_into_compact": composed,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def main_replace_where() -> None:
    """r12: replace_where's triple-form OCC under continuous DISJOINT
    ingest — the restate-one-slice op must compose with appends whose
    stats provably cannot match its predicate (never abort, never lose
    a concurrent row, never resurrect a replaced one), the same
    liveness guarantee compact earned in r11."""
    spark = get_spark("occ-stress-rw")
    base = tempfile.mkdtemp(prefix="occ_rw_")
    try:
        from pyspark.sql import functions as F

        vt = VersionedTable(spark, os.path.join(base, "t"))
        vt.overwrite(
            spark.range(ROWS)
            .withColumn("v", F.lit("old"))
            .repartition(FILES)
        )
        appender = VersionedTable(spark, os.path.join(base, "t"))
        stop = threading.Event()
        landed = []

        def ingest():
            lo = 10_000_000  # provably outside the replaced slice
            while not stop.is_set():
                appender.append(
                    spark.range(lo, lo + 1000)
                    .withColumn("v", F.lit("ingest"))
                    .coalesce(1)
                )
                landed.append(lo)
                lo += 1000

        th = threading.Thread(target=ingest)
        th.start()
        time.sleep(0.5)
        new = (
            spark.range(0, 5000)
            .withColumn("v", F.lit("restated"))
        )
        t0 = time.perf_counter()
        vt.replace_where(new, [("id", "<", 5000)])
        t_rw = time.perf_counter() - t0
        stop.set()
        th.join()
        n = vt.read().count()
        assert n == ROWS + 1000 * len(landed), (n, len(landed))
        assert vt.read().where("v = 'restated'").count() == 5000
        assert vt.read().where("v = 'ingest'").count() == 1000 * len(landed)
        print(
            json.dumps(
                {
                    "case": "occ_replace_where_under_ingest",
                    "files": FILES,
                    "rows": ROWS,
                    "replace_where_under_ingest_sec": round(t_rw, 2),
                    "concurrent_appends_total": len(landed),
                    "rows_exact": True,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "replace_where":
        main_replace_where()
    else:
        main()

"""Manifest-pruning evidence at file count (SCALE.md 'prune_1k_files').

Builds a versioned table with ~1,000 small data files whose per-file
min/max bounds partition the key space (repartitionByRange inside each
append gives disjoint ranges per file), then measures a selective
pruned read against the full-snapshot read over the same predicate.

What this demonstrates for the 100 TB case: manifest skipping drops
files from the scan BEFORE Spark ever lists them — the pruned plan's
``inputFiles()`` is the kept set, so the per-file footer read and task
launch (the dominant cost of a selective query over 10^6 small files)
are never paid. Row-group pruning inside the scan cannot do this; it
still opens every footer.

Usage: python scripts/prune_stress.py  (prints one JSON row per case)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from as_etl_storage_spark import get_spark
from as_etl_storage_spark.writers.versioned import VersionedTable

ROWS = 1_000_000
APPENDS = 20
FILES_PER_APPEND = 50  # ~1,000 files total


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    spark = get_spark("prune-stress")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "prune_stress",
    )
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    vt = VersionedTable(spark, os.path.join(scratch, "t"))
    per = ROWS // APPENDS
    for a in range(APPENDS):
        batch = (
            spark.range(a * per, (a + 1) * per)
            .withColumn("payload", F.md5(F.col("id").cast("string")))
            # second dimension, uncorrelated with the file layout: every
            # ingested file spans the whole y space (the zorder case below)
            .withColumn("y", (F.col("id") * 7919) % 1_000_000)
            .repartitionByRange(FILES_PER_APPEND, "id")
        )
        vt.append(batch)
    n_files = len(vt._state(vt.latest_version()))
    # selective predicate: one append's worth of ids -> ~FILES_PER_APPEND
    # of n_files may match
    lo, hi = 3 * per, 4 * per
    pruned_df = vt.read(prune=[("id", ">=", lo), ("id", "<", hi)])
    kept = len(pruned_df.inputFiles())
    assert kept < n_files / 10, (
        f"pruning ineffective: {kept}/{n_files} files survived"
    )
    full_df = vt.read().where((F.col("id") >= lo) & (F.col("id") < hi))
    assert len(full_df.inputFiles()) == n_files  # full read lists everything
    # warm-up both paths untimed (JIT, FS cache), then time
    for df in (pruned_df, full_df):
        df.write.mode("overwrite").format("noop").save()
    t_pruned, n1 = timed(lambda: pruned_df.count())
    t_full, n2 = timed(lambda: full_df.count())
    assert n1 == n2 == hi - lo
    print(
        json.dumps(
            {
                "case": "prune_1k_files",
                "files_total": n_files,
                "files_kept": kept,
                "files_skipped": n_files - kept,
                "rows": n1,
                "sec_pruned": round(t_pruned, 3),
                "sec_full_scan": round(t_full, 3),
                "speedup": round(t_full / t_pruned, 2),
            }
        ),
        flush=True,
    )

    # OPTIMIZE ZORDER: the ingest layout above clusters files by id, so a
    # predicate on the uncorrelated y column prunes (almost) nothing; a
    # z-ordered rewrite on (id, y) must make BOTH dimensions selective
    # from the re-collected per-file stats.
    y_pred = [("y", ">=", 100_000), ("y", "<", 200_000)]  # 10% of rows
    kept_y_before = len(vt.read(prune=y_pred).inputFiles())
    t0 = time.perf_counter()
    vt.compact(target_file_bytes=512 * 1024, zorder=["id", "y"])
    t_zorder = time.perf_counter() - t0
    n_after = len(vt.read().inputFiles())
    kept_y = len(vt.read(prune=y_pred).inputFiles())
    kept_id = len(
        vt.read(prune=[("id", ">=", lo), ("id", "<", hi)]).inputFiles()
    )
    assert kept_y < n_after / 2, f"zorder left y unselective: {kept_y}/{n_after}"
    print(
        json.dumps(
            {
                "case": "zorder_second_column",
                "files_before": n_files,
                "y_kept_before": kept_y_before,
                "sec_zorder_rewrite": round(t_zorder, 3),
                "files_after": n_after,
                "y_kept_after": kept_y,
                "id_kept_after": kept_id,
            }
        ),
        flush=True,
    )
    # RANKED vs WIDTH cells on a POWER-LAW column at 1000-file scale: the
    # width form's equi-width cells collapse a skewed column's dense head
    # into one cell (the interleaved key then carries no information in
    # that dimension and file bounds stay wide); quantile cells are
    # equi-populated by construction, so a dense-head predicate must
    # prune. Same table compacted twice — width first, then ranked — so
    # the comparison differs only in the cell scheme.
    vt2 = VersionedTable(spark, os.path.join(scratch, "skew"))
    for a in range(APPENDS):
        batch = (
            spark.range(a * per, (a + 1) * per)
            # deterministic pseudo-uniform u in [0,1), then a power law
            # spanning 8 decades: median ~1e4, 10% of rows below ~6
            .withColumn(
                "u",
                (F.col("id") * 2654435761 % 2**32) / F.lit(float(2**32)),
            )
            .withColumn(
                "x", F.floor(F.pow(F.lit(10.0), F.col("u") * 8)).cast("long")
            )
            .drop("u")
            .withColumn("y", (F.col("id") * 7919) % 1_000_000)
            .repartitionByRange(FILES_PER_APPEND, "id")
        )
        vt2.append(batch)
    n2 = len(vt2._state(vt2.latest_version()))
    x_pred = [("x", "<", 6)]  # ~10% of rows, all inside the dense head
    kept_x_arrival = len(vt2.read(prune=x_pred).inputFiles())
    vt2.compact(target_file_bytes=512 * 1024, zorder=["x", "y"],
                zorder_cells="width")
    n_width = len(vt2.read().inputFiles())
    kept_x_width = len(vt2.read(prune=x_pred).inputFiles())
    t0 = time.perf_counter()
    vt2.compact(target_file_bytes=512 * 1024, zorder=["x", "y"],
                zorder_cells="ranked")
    t_ranked = time.perf_counter() - t0
    n_ranked = len(vt2.read().inputFiles())
    kept_x_ranked = len(vt2.read(prune=x_pred).inputFiles())
    kept_y_ranked = len(vt2.read(prune=y_pred).inputFiles())
    assert kept_x_ranked < n_ranked / 2, (
        f"ranked cells left the dense head unselective: "
        f"{kept_x_ranked}/{n_ranked}"
    )
    print(
        json.dumps(
            {
                "case": "zorder_ranked_skew",
                "files_arrival": n2,
                "x_kept_arrival": kept_x_arrival,
                "files_width": n_width,
                "x_kept_width_cells": kept_x_width,
                "sec_ranked_rewrite": round(t_ranked, 3),
                "files_ranked": n_ranked,
                "x_kept_ranked_cells": kept_x_ranked,
                "y_kept_ranked_cells": kept_y_ranked,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Log-declared schema vs parquet footer merging at file count
(SCALE.md 'schema_1k_files').

A versioned table records its schema in the transaction log (Delta's
metaData.schemaString). Every scan then DECLARES the schema — Spark
opens zero footers to discover it. The legacy fallback (logs written
before schema recording) infers with mergeSchema=true, which reads and
merges every footer ON THE DRIVER before the first task launches; at
10^6 files on a 100 TB table that inference alone is a distributed job
Spark has to schedule (spark.sql.sources.parallelPartitionDiscovery),
while the declared-schema path is a dict lookup in one manifest.

This measures DataFrame *construction* time (where inference happens —
reader.parquet() resolves the schema eagerly) over the same ~1,000-file
snapshot, declared vs merged.

Usage: python scripts/schema_stress.py  (prints one JSON row per case)
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
    import shutil
    import tempfile

    spark = get_spark("schema-stress")
    root = tempfile.mkdtemp(prefix="schema_stress_")
    try:
        vt = VersionedTable(spark, os.path.join(root, "t"))
        per = ROWS // APPENDS
        for i in range(APPENDS):
            batch = (
                spark.range(i * per, (i + 1) * per)
                .withColumn("v", F.col("id") * 2)
                .withColumn("s", F.format_string("row-%09d", F.col("id")))
                .repartition(FILES_PER_APPEND)
            )
            if i == 0:
                vt.overwrite(batch)
            else:
                vt.append(batch)
        latest = vt.latest_version()
        files = vt._state(latest)
        n_files = len(files)

        # one throwaway construction each: JVM classloading and the
        # first InMemoryFileIndex otherwise land on whichever runs first
        vt.read()
        vt._scan_files(files, None)

        def median3(fn):
            ts = sorted(timed(fn)[0] for _ in range(3))
            return ts[1]

        tracker = spark.sparkContext.statusTracker()

        def jobs_during(fn):
            before = len(tracker.getJobIdsForGroup() or [])
            fn()
            return len(tracker.getJobIdsForGroup() or []) - before

        # declared: schema from ONE manifest read, zero footers, and —
        # the structural point — ZERO Spark jobs before the first real
        # action; mergeSchema schedules a distributed footer-merge job
        # just to ANSWER "what are the columns"
        jobs_declared = jobs_during(lambda: vt.read())
        jobs_merged = jobs_during(lambda: vt._scan_files(files, None))
        t_declared = median3(lambda: vt.read())
        t_merged = median3(lambda: vt._scan_files(files, None))
        assert {f.name for f in vt.read().schema.fields} == {
            f.name for f in vt._scan_files(files, None).schema.fields
        }

        print(
            json.dumps(
                {
                    "case": "schema_1k_files",
                    "files": n_files,
                    "rows": ROWS,
                    "declared_schema_sec": round(t_declared, 3),
                    "merge_schema_sec": round(t_merged, 3),
                    "declared_schema_jobs": jobs_declared,
                    "merge_schema_jobs": jobs_merged,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

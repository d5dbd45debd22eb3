"""Row-tracking overhead and stability at scale (r16).

Row tracking adds ONE range exchange per insert batch (the in-plan
prefix-sum allocator) and one int64 column to rewritten files. This
script measures both halves against a control table without the
feature, at growing batch sizes, and proves id stability through a
full DML cycle at the largest size:

    python scripts/rt_stress.py [batches] [rows_per_batch]

Per batch it appends to (a) a plain table and (b) a row-tracked table,
printing the append wall-time ratio; then runs update → compact →
delete → merge on the tracked table and asserts the id multiset
behaves (update/compact invariant, delete retires, merge keeps target
ids / allocates inserts above the mark).

Done-criterion readout: the tracked/plain append ratio stays a small
constant (the exchange + column cost, NOT growing with table size —
allocation cost is ∝ batch), and the DML cycle ends with zero id
violations.
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
from as_etl_storage_spark.writers.versioned import (  # noqa: E402
    VersionedTable,
)


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("rt-stress")
    root = tempfile.mkdtemp(prefix="rt_stress_")
    try:
        plain = VersionedTable(spark, os.path.join(root, "plain"))
        tracked = VersionedTable(spark, os.path.join(root, "tracked"))

        def batch(i: int):
            return (
                spark.range(rows)
                .select(
                    (F.col("id") * batches + i).alias("k"),
                    (F.col("id") % 997).alias("v"),
                )
                .repartition(8)
            )

        plain.overwrite(batch(0))
        tracked.overwrite(batch(0))
        tracked.enable_row_tracking()
        out: list[dict] = []
        for i in range(1, batches + 1):
            t0 = time.monotonic()
            plain.append(batch(i))
            t_plain = time.monotonic() - t0
            t0 = time.monotonic()
            tracked.append(batch(i))
            t_tracked = time.monotonic() - t0
            out.append(
                {
                    "batch": i,
                    "rows_total": rows * (i + 1),
                    "plain_sec": round(t_plain, 3),
                    "tracked_sec": round(t_tracked, 3),
                    "ratio": round(t_tracked / max(t_plain, 1e-9), 2),
                }
            )
            print(json.dumps(out[-1]))
        # id stability through a full DML cycle at final size
        ids0 = tracked.read(with_row_ids=True).agg(
            F.count("*").alias("n"),
            F.count_distinct("_row_id").alias("d"),
            F.sum("_row_id").alias("s"),
            F.max("_row_id").alias("hi"),
        ).collect()[0]
        assert ids0["n"] == ids0["d"], "duplicate ids after ingest"
        tracked.update("v = 1", {"v": "v + 1000"})
        tracked.compact(target_file_bytes=64 * 1024 * 1024)
        ids1 = tracked.read(with_row_ids=True).agg(
            F.count("*").alias("n"),
            F.count_distinct("_row_id").alias("d"),
            F.sum("_row_id").alias("s"),
        ).collect()[0]
        assert (ids1["n"], ids1["d"], ids1["s"]) == (
            ids0["n"],
            ids0["d"],
            ids0["s"],
        ), "update/compact moved an id"
        tracked.delete("v = 2")
        n_after = tracked.read(with_row_ids=True).agg(
            F.count("*").alias("n"), F.count_distinct("_row_id").alias("d")
        ).collect()[0]
        assert n_after["n"] == n_after["d"], "delete broke id uniqueness"
        # half matches (updates keep target ids), half fresh keys
        # (inserts must allocate ABOVE the pre-cycle mark)
        src = (
            spark.range(1000)
            .select(
                F.when(
                    F.col("id") % 2 == 0, F.col("id") * batches
                )
                .otherwise(-(F.col("id") + 1))
                .alias("k"),
                F.lit(5).cast("long").alias("v"),
            )
        )
        tracked.merge(src, ["k"])
        lo_fresh = (
            tracked.read(with_row_ids=True)
            .where(F.col("_row_id") > ids0["hi"])
            .count()
        )
        assert lo_fresh == 500, f"expected 500 fresh ids, got {lo_fresh}"
        dup = tracked.read(with_row_ids=True).agg(
            (F.count("*") - F.count_distinct("_row_id")).alias("dup")
        ).collect()[0]["dup"]
        assert dup == 0, "merge duplicated an id"
        print(
            json.dumps(
                {
                    "dml_cycle": "ok",
                    "fresh_ids_after_merge": lo_fresh,
                    "final_rows": n_after["n"],
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

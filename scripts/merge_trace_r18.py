"""r18: job-level trace of the w_versioned_dml_composite lifecycle.

Runs each DML step (overwrite/append/delete/merge/read) with a job
description marker and event logging on, then parses the event log into
a per-job timeline: (job id, description, start, duration, gap since the
previous job ended). Driver-side gaps between jobs are the commit
protocol's latency tail — the thing VERDICT r17 asks this round to cut.

Usage:  python scripts/merge_trace_r18.py [sf_dir] [reps]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def get_spark_logged(event_dir: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("merge_trace_r18")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.codegen.maxFields", "300")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.dir", event_dir)
        .getOrCreate()
    )


def run_composite(spark, sf_dir: str, wall: dict) -> None:
    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.queries.common import load_table
    from as_etl_storage_spark.writers.versioned import VersionedTable

    sc = spark.sparkContext
    root = os.path.join(_scratch_dir(), f"wdmlc-{uuid.uuid4().hex[:8]}")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def step(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        out = fn()
        wall[name] = wall.get(name, 0.0) + time.perf_counter() - t0
        return out

    hi = step("00:hi-agg", lambda: orders.agg(F.max("o_orderkey")).collect())[0][0]
    vt = VersionedTable(spark, root)
    step("01:overwrite", lambda: vt.overwrite(
        orders.where(F.col("o_orderkey") <= hi // 2)))
    step("02:append", lambda: vt.append(orders.where(
        (F.col("o_orderkey") > hi // 2) & (F.col("o_orderkey") <= 3 * hi // 4))))
    step("03:delete", lambda: vt.delete("o_orderkey % 10 = 3"))
    step("04:merge", lambda: vt.merge(
        orders.where(F.col("o_orderkey") > hi // 4).withColumn(
            "o_totalprice", -F.col("o_totalprice")), ["o_orderkey"]))
    step("05:read", lambda: vt.read().write.mode("overwrite")
         .format("noop").save())
    sc.setJobDescription(None)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    event_dir = f"/tmp/merge-trace-{uuid.uuid4().hex[:8]}"
    os.makedirs(event_dir, exist_ok=True)
    spark = get_spark_logged(event_dir)

    wall: dict[str, float] = {}
    # warm-up rep (JIT/codegen), then the traced reps
    run_composite(spark, sf_dir, {})
    t0 = time.perf_counter()
    for _ in range(reps):
        run_composite(spark, sf_dir, wall)
    total = time.perf_counter() - t0
    spark.stop()
    for k in sorted(wall):
        print(f"WALL {k}: {wall[k] / reps:.3f}s")
    print(f"WALL total: {total / reps:.3f}s over {reps} reps")

    logs = sorted(
        p
        for p in glob.glob(os.path.join(event_dir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    )
    jobs = []
    for path in logs:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties", {}) or {}
                    infos = ev.get("Stage Infos", []) or []
                    names = " | ".join(
                        si.get("Stage Name", "")[:48] for si in infos[:2]
                    )
                    jobs.append({
                        "id": ev["Job ID"],
                        "desc": props.get("spark.job.description", ""),
                        "names": names,
                        "ntasks": sum(si.get("Number of Tasks", 0) for si in infos),
                        "start": ev["Submission Time"],
                        "end": None,
                    })
                elif ev.get("Event") == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["id"] == ev["Job ID"]:
                            j["end"] = ev["Completion Time"]
    jobs.sort(key=lambda j: j["start"])
    prev_end = None
    print("\njob  desc                          dur_ms  gap_ms")
    for j in jobs:
        if j["end"] is None:
            continue
        gap = (j["start"] - prev_end) if prev_end is not None else 0
        print(
            f"{j['id']:>4} {j['desc'][:14]:<14} {j['end']-j['start']:>6} "
            f"{gap:>6} t{j['ntasks']:<4} {j['names'][:72]}"
        )
        prev_end = j["end"]
    print(f"\nevent log dir: {event_dir}")


if __name__ == "__main__":
    main()

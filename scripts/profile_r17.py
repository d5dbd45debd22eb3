"""r17 optimization-round profiler.

For each headline (and optionally extended) query, measures separately:
  * build_s  — Python driver time to construct the DataFrame (includes
               view registration, any collects the operator does);
  * exec_s   — noop-sink execution time of the returned plan;
and captures .explain('formatted') into plans/r17/<name>_<tag>.txt.

Usage:
    python scripts/profile_r17.py <tag> [query ...]
If no queries given, profiles the full HEADLINE list. Prints one JSON
line per query to stdout and a summary at the end.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark.queries import QUERIES  # noqa: E402
from as_etl_storage_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLAN_DIR = os.path.join(REPO, "plans", "r17")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = get_spark("profile_r17")

    results = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(json.dumps({"name": name, "err": "unknown"}))
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm-up (plan compile + JIT), untimed
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "err": repr(e)[:200]}))
            continue
        spark.catalog.clearCache()
        builds, execs = [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 4))
            execs.append(round(t2 - t1, 4))
            spark.catalog.clearCache()
        # capture the formatted plan once
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        spark.catalog.clearCache()
        import statistics

        rec = {
            "name": name,
            "build_s": round(statistics.median(builds), 4),
            "exec_s": round(statistics.median(execs), 4),
            "total_s": round(
                statistics.median([b + e for b, e in zip(builds, execs)]), 4
            ),
            "builds": builds,
            "execs": execs,
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)

    total = round(sum(r["total_s"] for r in results.values()), 3)
    build_total = round(sum(r["build_s"] for r in results.values()), 3)
    print(
        json.dumps(
            {"summary": True, "tag": tag, "total_s": total,
             "build_total_s": build_total, "n": len(results)}
        )
    )


if __name__ == "__main__":
    main()

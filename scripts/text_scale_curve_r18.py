"""r18: the bm25/tfidf single-pass trade, measured at 1x/3x/10x.

VERDICT r17 carried one demand into this round: the r17 single-pass
rewrites of text.bm25_topk / text.tfidf_similar_pairs were justified on
corpus-pass counts (3->1 / 4->1) but never measured at scale. This
script upsamples the documents fixture (same deterministic vowel-rotate
scheme as scale_stress) and INTERLEAVES the shipped single-pass form
with the pre-r17 multi-pass form at each factor — run-by-run
alternation, so tenancy noise hits both shapes the same way — and
reports medians.

The old implementations are loaded from committed git blobs
(6a68d2c~1 for bm25, 0ce9619~1 for tfidf), so the comparison measures
exactly the code the r16 bench measured.

Usage: python scripts/text_scale_curve_r18.py [sf_dir] [factors]
Writes one JSON line per (factor, operator, form).
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark.operators import text as text_new  # noqa: E402
from as_etl_storage_spark.queries.common import load_table  # noqa: E402
from as_etl_storage_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _module_from_blob(ref: str, name: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:as_etl_storage_spark/operators/text.py"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    path = f"/tmp/{name}.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    factors = tuple(
        int(f) for f in (sys.argv[2] if len(sys.argv) > 2 else "1,3,10").split(",")
    )
    n_runs = int(os.environ.get("CURVE_RUNS", "3"))
    spark = get_spark("text-scale-curve")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scale_stress import upsample_docs

    bm25_old = _module_from_blob("6a68d2c~1", "text_bm25_r16")
    tfidf_old = _module_from_blob("0ce9619~1", "text_tfidf_r16")

    docs0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join(REPO, ".scratch", "text_curve")
    terms = ["spark", "join", "window", "merge"]
    results = []
    for factor in factors:
        ddir = os.path.join(scratch, f"docs_{factor}")
        upsample_docs(docs0, factor).repartition(32).write.mode(
            "overwrite"
        ).parquet(ddir)
        docs = spark.read.parquet(ddir)
        cases = {
            ("bm25", "multi_pass_r16"): lambda: bm25_old.bm25_topk(
                docs, "doc_id", "text", terms, k=20
            ),
            ("bm25", "single_pass"): lambda: text_new.bm25_topk(
                docs, "doc_id", "text", terms, k=20
            ),
            ("tfidf", "multi_pass_r16"): lambda: tfidf_old.tfidf_similar_pairs(
                docs, "doc_id", "text"
            ),
            ("tfidf", "single_pass"): lambda: text_new.tfidf_similar_pairs(
                docs, "doc_id", "text"
            ),
        }
        # warm each form once (codegen/JIT), then alternate timed runs
        for fn in cases.values():
            fn().write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
        times: dict[tuple, list[float]] = {k: [] for k in cases}
        for _ in range(n_runs):
            for key, fn in cases.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                times[key].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        for (op, form), ts in times.items():
            rec = {
                "factor": factor,
                "op": op,
                "form": form,
                "runs": ts,
                "median_sec": round(statistics.median(ts), 3),
                "load_1m": round(os.getloadavg()[0], 2),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    # crossover summary
    for op in ("bm25", "tfidf"):
        for factor in factors:
            old = next(r for r in results if r["op"] == op and r["factor"] == factor and r["form"] == "multi_pass_r16")
            new = next(r for r in results if r["op"] == op and r["factor"] == factor and r["form"] == "single_pass")
            print(json.dumps({
                "summary": op, "factor": factor,
                "multi_pass_sec": old["median_sec"],
                "single_pass_sec": new["median_sec"],
                "single_over_multi": round(new["median_sec"] / old["median_sec"], 3),
            }), flush=True)


if __name__ == "__main__":
    main()

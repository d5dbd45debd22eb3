"""Row-level DML at FILE-COUNT scale (SCALE.md 'dml_1k_files').

Builds the prune_stress table shape — ~1,000 data files with disjoint
key ranges — then measures what the two-phase file-pruned plan actually
buys on a selective DELETE and MERGE:

  * pruned delete: predicate hits ONE file's key range — the rewrite
    must touch ~1 file and carry the other ~999 by name (stats reused,
    no footer re-reads)
  * naive baseline: the same delete expressed as
    overwrite(read().where(NOT pred)) — the full-table rewrite every
    engine without file pruning pays
  * selective merge: a source hitting a handful of key ranges — touched
    files found by semi-join, inserts landed as fresh files

Usage: python scripts/dml_stress.py  (prints one JSON row per case)
"""
from __future__ import annotations

import json
import os
import shutil
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


def build(spark, path: str) -> VersionedTable:
    vt = VersionedTable(spark, path)
    per = ROWS // APPENDS
    for a in range(APPENDS):
        lo = a * per
        df = (
            spark.range(lo, lo + per)
            .withColumn("k", F.col("id"))
            .withColumn("payload", F.md5(F.col("id").cast("string")))
            .repartitionByRange(FILES_PER_APPEND, "k")
        )
        vt.append(df)
    return vt


def main() -> None:
    spark = get_spark("dml-stress")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "dml_stress",
    )
    shutil.rmtree(scratch, ignore_errors=True)

    vt = build(spark, os.path.join(scratch, "pruned"))
    base = vt.latest_version()
    n_files = len(vt._state(base))
    # one file's key range: file 0 of append 0 holds k in [0, ~1000).
    # String predicate: the discovery scan still opens every file's k
    # column (general SQL expressions carry no bounds)
    t_del, v = timed(lambda: vt.delete("k < 800"))
    after = set(vt._state(v))
    rewritten = n_files - len(set(vt._state(base)) & after)
    n_rows = vt.read().count()
    assert n_rows == ROWS - 800

    # triple form: the SAME delete shape read(prune=...) takes —
    # manifest pruning narrows the DISCOVERY scan itself to the files
    # whose bounds can match, so the whole operation is O(hit files)
    base2 = vt.latest_version()
    cand = vt._prune_files(
        vt._state(base2), vt._stats_at(base2), [("k", "<", 1800)]
    )
    t_del3, v3 = timed(lambda: vt.delete([("k", "<", 1800)]))
    after3 = set(vt._state(v3))
    rewritten3 = len(vt._state(base2)) - len(set(vt._state(base2)) & after3)
    assert vt.read().count() == ROWS - 1800

    # naive full-rewrite baseline on an identical table
    vt2 = build(spark, os.path.join(scratch, "naive"))
    t_naive, _ = timed(
        lambda: vt2.overwrite(vt2.read().where(~F.expr("k < 800")))
    )
    assert vt2.read().count() == ROWS - 800

    # selective merge: update 5 scattered key ranges + insert new keys
    src = (
        spark.range(5)
        .select(
            (F.col("id") * 200_000 + 100).alias("k")
        )
        .withColumn("id", F.col("k"))
        .withColumn("payload", F.lit("updated"))
        .select("id", "k", "payload")
        .unionByName(
            spark.range(ROWS + 100, ROWS + 110)
            .withColumn("k", F.col("id"))
            .withColumn("payload", F.lit("inserted"))
        )
    )
    t_merge, vm = timed(lambda: vt.merge(src, ["k"]))
    m = vt._manifest(vm)
    assert vt.read().where("payload = 'inserted'").count() == 10
    assert vt.read().where("payload = 'updated'").count() == 5

    # tight-envelope merge: all source keys inside one file's range —
    # the envelope prune bounds EVERY target-side job (discovery,
    # cardinality check, insert anti-join) to the files whose bounds
    # intersect [min(src.k), max(src.k)]
    tight = (
        spark.range(5)
        .select((F.col("id") + 5_000).alias("k"))
        .withColumn("id", F.col("k"))
        .withColumn("payload", F.lit("tight"))
        .select("id", "k", "payload")
    )
    t_tight, _vt_v = timed(lambda: vt.merge(tight, ["k"]))
    assert vt.read().where("payload = 'tight'").count() == 5

    print(
        json.dumps(
            {
                "case": "dml_1k_files",
                "files": n_files,
                "sec_delete_string_pred": round(t_del, 2),
                "files_rewritten_string_pred": rewritten,
                "sec_delete_triple_pred": round(t_del3, 2),
                "files_scanned_triple_pred": len(cand),
                "files_rewritten_triple_pred": rewritten3,
                "sec_naive_full_rewrite_delete": round(t_naive, 2),
                "sec_merge_scattered_keys": round(t_merge, 2),
                "sec_merge_tight_envelope": round(t_tight, 2),
                "merge_cdc_files": len(m.get("cdc", [])),
            }
        ),
        flush=True,
    )
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


def main_r12() -> None:
    """replace_where + conditional merge at the same 1,000-file shape
    (SCALE.md r12 rows): the predicate-scoped overwrite must cost
    O(touched files) like the DML it is built on, and a matched
    condition must narrow MERGE's touched-file discovery so all-stale
    files are carried by name."""
    spark = get_spark("dml-stress-r12")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "dml_stress_r12",
    )
    shutil.rmtree(scratch, ignore_errors=True)

    vt = build(spark, os.path.join(scratch, "rw"))
    base = vt.latest_version()
    n_files = len(vt._state(base))
    # restate one file's key range [0, 800): triple form manifest-prunes
    # discovery; out-of-scope files carried by name
    new = (
        spark.range(0, 800)
        .withColumn("k", F.col("id"))
        .withColumn("payload", F.lit("restated"))
    )
    t_rw, v = timed(
        lambda: vt.replace_where(new, [("k", "<", 800)])
    )
    carried = len(set(vt._state(base)) & set(vt._state(v)))
    assert vt.read().where("payload = 'restated'").count() == 800
    assert vt.read().count() == ROWS

    # naive equivalent: full-table overwrite of filter ∪ new
    vt2 = build(spark, os.path.join(scratch, "rw_naive"))
    new2 = (
        spark.range(0, 800)
        .withColumn("k", F.col("id"))
        .withColumn("payload", F.lit("restated"))
    )
    t_naive, _ = timed(
        lambda: vt2.overwrite(
            vt2.read().where(~F.expr("k < 800")).unionByName(new2)
        )
    )
    assert vt2.read().count() == ROWS

    # conditional merge discovery: source hits 5 scattered key ranges
    # but the matched condition is FALSE for every pair — zero files
    # may be rewritten (all carried by name)
    base3 = vt.latest_version()
    stale = (
        spark.range(5)
        .select((F.col("id") * 200_000 + 100).alias("k"))
        .withColumn("id", F.col("k"))
        .withColumn("payload", F.lit("stale"))
        .select("id", "k", "payload")
    )
    t_stale, v_stale = timed(
        lambda: vt.merge(
            stale, ["k"],
            when_matched_condition="source.payload < target.payload",
            when_not_matched=None,
        )
    )
    rewritten_stale = (
        0
        if v_stale is None
        else len(vt._state(base3)) - len(
            set(vt._state(base3)) & set(vt._state(v_stale))
        )
    )
    assert vt.read().where("payload = 'stale'").count() == 0

    print(
        json.dumps(
            {
                "case": "dml_1k_files_r12",
                "files": n_files,
                "sec_replace_where_triple": round(t_rw, 2),
                "files_carried_by_name": carried,
                "files_touched": n_files - carried,
                "sec_naive_full_overwrite": round(t_naive, 2),
                "sec_merge_all_stale_condition": round(t_stale, 2),
                "files_rewritten_all_stale": rewritten_stale,
            }
        ),
        flush=True,
    )
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "r12":
        main_r12()
    else:
        main()

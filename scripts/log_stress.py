"""Transaction-log metadata costs at COMMIT-COUNT scale (SCALE.md
'log_1k_versions').

The file-count story (prune_stress.py) measures many files per version;
this measures many VERSIONS: a 1,000-append log — the shape an
always-on streaming sink produces in a day at one commit per ~90 s —
and the driver-side metadata operations every reader pays:

  * latest_version(): one directory listing, O(versions)
  * read() state reconstruction: checkpoint + bounded delta replay
    (<= CHECKPOINT_EVERY manifests), NOT an O(versions) walk
  * changes(lo, hi): manifest walk proportional to the RANGE, not the
    log length — the incremental consumer's steady-state cost is
    O(new versions)
  * CDC stream partitions(-1, latest): full-log walk, the worst case a
    fresh stream with no startingVersion pays exactly once

Usage: python scripts/log_stress.py  (prints one JSON row per case)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark import get_spark
from as_etl_storage_spark.writers.versioned import VersionedTable

VERSIONS = 1_000
ROWS_PER = 100


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    spark = get_spark("log-stress")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "log_stress",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    path = os.path.join(scratch, "t")
    vt = VersionedTable(spark, path)

    # 1,000 appends of one file each; write the parquet once and link it
    # per version so the ingest isn't the bottleneck of the measurement —
    # the LOG is under test, not the writer
    t0 = time.perf_counter()
    first = None
    for v in range(VERSIONS):
        if first is None:
            vt.append(spark.range(v * ROWS_PER, (v + 1) * ROWS_PER).coalesce(1))
            first = vt._state(0)[0]
        else:
            # clone the committed data file under a fresh name and commit
            # it through the real protocol (manifest + stats path intact)
            name = f"part-clone-{v:05d}.parquet"
            os.link(os.path.join(path, first), os.path.join(path, name))
            vt._commit(None, "append", vt.latest_version(), new_files=[name])
    t_ingest = time.perf_counter() - t0

    latest = vt.latest_version()
    assert latest == VERSIONS - 1
    t_latest, _ = timed(vt.latest_version)
    t_state, files = timed(lambda: vt._state(latest))
    assert len(files) == VERSIONS
    # incremental consumer's steady-state: a 10-version range near the tip
    t_changes_10, df10 = timed(lambda: vt.changes(latest - 10, latest))
    # fresh-consumer worst case: the whole log
    t_changes_all, df_all = timed(lambda: vt.changes(-1, latest))
    n_all = df_all.count()
    assert n_all == VERSIONS * ROWS_PER

    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader

    r = VersionedChangesStreamReader({"path": path})
    t_parts_all, parts = timed(
        lambda: r.partitions({"version": -1}, {"version": latest})
    )
    assert len(parts) == VERSIONS
    t_parts_10, tail = timed(
        lambda: r.partitions({"version": latest - 10}, {"version": latest})
    )
    assert len(tail) == 10

    print(
        json.dumps(
            {
                "case": "log_1k_versions",
                "versions": VERSIONS,
                "sec_ingest_total": round(t_ingest, 2),
                "sec_latest_version": round(t_latest, 4),
                "sec_state_reconstruct": round(t_state, 4),
                "sec_changes_10_versions": round(t_changes_10, 4),
                "sec_changes_full_log": round(t_changes_all, 4),
                "sec_cdc_partitions_full_log": round(t_parts_all, 4),
                "sec_cdc_partitions_10_versions": round(t_parts_10, 4),
                "rows_total": n_all,
            }
        ),
        flush=True,
    )
    checkpoint_stress(spark, scratch)
    spark.stop()


def checkpoint_stress(spark, scratch: str) -> None:
    """Checkpoint costs at FILE-COUNT scale (SCALE.md
    'checkpoint_100k_files'): a snapshot of 100,000 add-entries — the
    ~100 TB table shape at ~1 GB/file — written and read back in the
    parquet checkpoint format vs the legacy single-JSON blob.

    What the parquet format buys (and this measures): a property lookup
    (constraints/schema/txns walk) is a FOOTER read, independent of the
    file count; state reconstruction reads the ``path`` column only;
    stats reads skip the dv column and vice versa. The JSON blob pays a
    full O(files) parse for every one of those. The synthetic state
    commits through the real protocol with pre-known stats (the LOG is
    under test; no data bytes are written).

    Since the r14 changes, two more claims are under test here:
    (1) a LARGE full-snapshot commit writes its checkpoint eagerly from
    the in-memory manifest (sec_commit_overwrite includes it; the old
    4.8 s "cold case" — property walks re-parsing the 100k-entry JSON
    manifest — no longer exists on the happy path, and the explicit
    rewrite below shows what it costs when it does run);
    (2) the steady-state cadence checkpoint is INCREMENTAL (rows = the
    adds since the previous checkpoint, base_cp footer pointer), so its
    write cost is O(delta) — independent of table file count, asserted
    by comparing the same 3-append cadence at 100k files vs 1k files."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    n_files = 100_000
    path = os.path.join(scratch, "cp")
    vt = VersionedTable(spark, path)
    names = [f"part-{i:06d}.parquet" for i in range(n_files)]
    stats = {
        n: {"id": [i * 100, (i + 1) * 100 - 1], "#rows": 100, "#bytes": 4096}
        for i, n in enumerate(names)
    }
    os.makedirs(path, exist_ok=True)
    t_commit, _ = timed(
        lambda: vt._commit(names, "overwrite", None, known_stats=stats)
    )
    v = vt.latest_version()
    assert vt._find_checkpoint(v) is not None, (
        "a 100k-file snapshot commit must checkpoint eagerly"
    )

    # explicit full REWRITE at the same version: what the old cold case
    # cost (walks now terminate at the eager checkpoint, not the JSON)
    t_write, _ = timed(lambda: vt._write_checkpoint(v, force_full=True))
    cp = vt._find_checkpoint(v)
    pq_bytes = os.path.getsize(cp)
    t_state, files = timed(lambda: vt._read_checkpoint(cp, "files"))
    assert len(files["files"]) == n_files
    t_meta, _ = timed(lambda: vt._read_checkpoint(cp, "meta"))
    t_stats, st = timed(lambda: vt._read_checkpoint(cp, "stats"))
    assert len(st["stats"]) == n_files

    # STEADY-STATE write (the real cadence: checkpoint every
    # CHECKPOINT_EVERY appends): INCREMENTAL — rows are the 3 adds, not
    # the 100k state, base_cp points at the eager checkpoint above
    def _cadence(table):
        for i in range(3):
            name = f"part-extra-{i}.parquet"
            table._commit(
                None,
                "append",
                table.latest_version(),
                new_files=[name],
                known_stats={name: {"#rows": 1, "#bytes": 64}},
            )
        return table.latest_version()

    v2 = _cadence(vt)
    t_write_steady, _ = timed(lambda: vt._write_checkpoint(v2))
    cp2 = vt._find_checkpoint(v2)
    meta2 = vt._read_checkpoint(cp2, "meta")
    assert meta2.get("base_cp") == v, "steady write must be incremental"
    t_state2, files2 = timed(lambda: vt._read_checkpoint(cp2, "files"))
    assert len(files2["files"]) == n_files + 3  # chain resolves fully

    # file-count independence: the SAME cadence on a 1k-file table
    small = VersionedTable(spark, os.path.join(scratch, "cp-small"))
    os.makedirs(small.path, exist_ok=True)
    small_names = names[:1000]
    small._commit(
        small_names,
        "overwrite",
        None,
        known_stats={n: stats[n] for n in small_names},
    )
    vs2 = _cadence(small)
    t_write_steady_small, _ = timed(
        lambda: small._write_checkpoint(vs2)
    )

    # legacy single-JSON blob: same content, one parse for ANY lookup
    payload = dict(vt._read_checkpoint(cp, "meta"))
    payload["files"] = files["files"]
    payload["stats"] = st["stats"]
    legacy = vt._checkpoint_path(v)
    t_json_write, _ = timed(
        lambda: json.dump(payload, open(legacy, "w"))
    )
    json_bytes = os.path.getsize(legacy)
    t_json_state, lf = timed(lambda: vt._read_checkpoint(legacy, "files"))
    assert len(lf["files"]) == n_files
    t_json_meta, _ = timed(lambda: vt._read_checkpoint(legacy, "meta"))

    print(
        json.dumps(
            {
                "case": "checkpoint_100k_files",
                "files": n_files,
                "sec_commit_overwrite_incl_eager_checkpoint": round(
                    t_commit, 4
                ),
                "sec_parquet_write_full_rewrite": round(t_write, 4),
                "sec_parquet_write_steady_incremental": round(
                    t_write_steady, 4
                ),
                "sec_parquet_write_steady_1k_files": round(
                    t_write_steady_small, 4
                ),
                "sec_chain_state_load": round(t_state2, 4),
                "sec_parquet_state_load": round(t_state, 4),
                "sec_parquet_meta_lookup": round(t_meta, 4),
                "sec_parquet_stats_load": round(t_stats, 4),
                "parquet_bytes": pq_bytes,
                "sec_json_write": round(t_json_write, 4),
                "sec_json_state_load": round(t_json_state, 4),
                "sec_json_meta_lookup": round(t_json_meta, 4),
                "json_bytes": json_bytes,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Declarative maintenance jobs: {"maintenance": {...}} through run_job
(r15 — the reference's declared-job shape, writer/job.go:63-93, extended
to table maintenance the way Delta exposes OPTIMIZE/VACUUM as SQL).
Contract: spec-driven compact honors vt.clusterBy, spec-driven vacuum
honors the retention + grace rules, every step refuses non-versioned
targets, and spec validation fails fast on unusable scopes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from as_etl_storage_spark.runner import run_job
from as_etl_storage_spark.spec import JobSpec, SpecError
from as_etl_storage_spark.writers.versioned import VersionedTable


def _interleaved_table(spark, path, nfiles=4, rows_per=250):
    """Appends whose key ranges interleave: every file spans the whole
    key space, so range pruning is useless until a clustering rewrite."""
    vt = VersionedTable(spark, path)
    vt.overwrite(
        spark.range(1)
        .select((F.col("id") - 10).alias("v"))
        .coalesce(1)
    )
    for b in range(nfiles):
        vt.append(
            spark.range(rows_per)
            .select((F.col("id") * nfiles + b).alias("v"))
            .coalesce(1)
        )
    return vt


def _job(root, name, **steps):
    return {
        "maintenance": {
            "connection": {"url": root, "table": {"name": name}},
            **steps,
        }
    }


def test_spec_compact_honors_cluster_by(spark, tmp_path):
    """A spec-driven compact with NO zorder picks up the table's
    declared vt.clusterBy — the same declarative chain as the Python
    API — and the ordering-sensitive prune goes from keep-everything
    to selective."""
    root, name = str(tmp_path), "t"
    vt = _interleaved_table(spark, os.path.join(root, name))
    vt.set_properties({"vt.clusterBy": "v"})
    spread = vt.read(prune=[("v", ">=", 0), ("v", "<", 100)])
    assert len(spread.inputFiles()) == 4  # premise: nothing prunable
    res = run_job(spark, _job(root, name, compact={"targetFileBytes": 4096}))
    assert res.compact_version == vt.latest_version()
    m = vt._manifest(res.compact_version)
    assert m["op"] == "compact"
    assert m["params"]["zorder"]  # declared keys reached the rewrite
    tight = vt.read(prune=[("v", ">=", 0), ("v", "<", 100)])
    assert len(tight.inputFiles()) < 4
    assert tight.count() == 100
    assert vt.read().count() == 1001


def test_spec_compact_where_scopes_and_refuses_unusable_scope(
    spark, tmp_path
):
    """compact.where must extract prune triples at PARSE time — a scope
    that extracts nothing is refused instead of silently compacting the
    whole table; a usable scope carries out-of-scope files by name."""
    root, name = str(tmp_path), "t"
    vt = VersionedTable(spark, os.path.join(root, name))
    vt.overwrite(
        spark.range(100).select(F.col("id").alias("v")).repartition(4)
    )
    vt.append(
        spark.range(100, 200).select(F.col("id").alias("v")).repartition(4)
    )
    before = set(vt._state(vt.latest_version()))
    run_job(
        spark,
        _job(
            root,
            name,
            compact={"where": "v >= 100", "targetFileBytes": 1 << 30},
        ),
    )
    after = set(vt._state(vt.latest_version()))
    # the low-key files were out of scope: carried by name, untouched
    low = {f for f in before if f in after}
    assert low  # some originals survived
    assert vt.read().count() == 200
    with pytest.raises(SpecError, match="extracts no prune triple"):
        JobSpec.from_json(
            _job(root, name, compact={"where": "v = 1 OR v = 2"})
        )


def test_spec_vacuum_honors_grace_and_dry_run(spark, tmp_path):
    """Grace first: files younger than graceSeconds survive even when
    unreferenced (the in-flight-writer fence). Then dryRun lists the
    victims without deleting; the real sweep with grace 0 removes
    them."""
    root, name = str(tmp_path), "t"
    vt = VersionedTable(spark, os.path.join(root, name))
    vt.overwrite(spark.range(100).coalesce(1))
    vt.overwrite(spark.range(200).coalesce(1))  # v0's file unreferenced
    n_parquet = lambda: sum(  # noqa: E731
        1
        for r, _, fs in os.walk(vt.path)
        if "_log" not in r
        for f in fs
        if f.endswith(".parquet") and "checkpoint" not in f
    )
    files_before = n_parquet()
    # grace 1h: the just-written old file is too young to sweep
    res = run_job(
        spark,
        _job(root, name, vacuum={"retainLast": 1, "graceSeconds": 3600}),
    )
    assert res.vacuum_removed == 0
    assert n_parquet() == files_before
    # dryRun with grace 0: lists the victim, deletes nothing
    res = run_job(
        spark,
        _job(
            root,
            name,
            vacuum={"retainLast": 1, "graceSeconds": 0, "dryRun": True},
        ),
    )
    assert len(res.vacuum_dry_run) >= 1
    assert res.vacuum_removed is None
    assert n_parquet() == files_before
    promised = list(res.vacuum_dry_run)
    # the real sweep removes EXACTLY what the dry run promised (strict
    # parity — nothing more, nothing less) and the promised paths are
    # gone from disk; distributed=True runs it as a Spark job (the
    # object-store shape)
    res = run_job(
        spark,
        _job(
            root,
            name,
            vacuum={
                "retainLast": 1,
                "graceSeconds": 0,
                "distributed": True,
            },
        ),
    )
    assert res.vacuum_removed == len(promised)
    for rel in promised:
        assert not os.path.exists(os.path.join(vt.path, rel)), rel
    assert n_parquet() == files_before - len(promised)
    assert vt.read().count() == 200


def test_maintenance_checkpoint_and_step_order(spark, tmp_path):
    """checkpoint runs AFTER compact (the packed snapshot is what it
    captures): one job with both steps leaves a checkpoint at the
    compaction version."""
    root, name = str(tmp_path), "t"
    vt = _interleaved_table(spark, os.path.join(root, name))
    res = run_job(
        spark,
        _job(
            root,
            name,
            compact={"targetFileBytes": 1 << 30},
            checkpoint=True,
        ),
    )
    assert res.checkpoint_version == res.compact_version
    assert vt._find_checkpoint(res.checkpoint_version) is not None
    assert vt.read().count() == 1001


def test_maintenance_refuses_non_versioned_targets(spark, tmp_path):
    """Plain-parquet targets have no log — no snapshot isolation, no
    retention, nothing maintenance semantics can stand on. Refused for
    every step, before anything is touched."""
    root = str(tmp_path)
    spark.range(10).write.parquet(os.path.join(root, "plain.parquet"))
    for steps in (
        {"compact": {}},
        {"vacuum": {"retainLast": 1}},
        {"checkpoint": True},
    ):
        with pytest.raises(SpecError, match="not a versioned table"):
            run_job(spark, _job(root, "plain", **steps))


def test_cli_runs_maintenance_job(spark, tmp_path):
    """The CLI entry point handles the maintenance result shape (it
    previously assumed every writer-less non-DataFrame result was a
    WriteResult) and prints one JSON step report."""
    import json as _json
    import subprocess
    import sys

    vt = _interleaved_table(spark, str(tmp_path / "t"))
    vt.set_properties({"vt.clusterBy": "v"})
    job = {
        "maintenance": {
            "connection": {"url": str(tmp_path), "table": {"name": "t"}},
            "compact": {"targetFileBytes": 1 << 30},
            "checkpoint": True,
        }
    }
    spec = tmp_path / "maint.json"
    spec.write_text(_json.dumps(job))
    proc = subprocess.run(
        [sys.executable, "-m", "as_etl_storage_spark", str(spec)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=240,
        env={
            **os.environ,
            "SPARK_GRAFT_CPUS": "4",
            "SPARK_DRIVER_MEMORY": "4g",
        },
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["compact_version"] == out["checkpoint_version"]
    assert out["vacuum_removed"] is None
    assert vt.read().count() == 1001  # rows unharmed


def test_maintenance_spec_validation(spark, tmp_path):
    """Fail-fast parse errors: no steps, bad clusterMode, bad numbers,
    maintenance combined with a reader/writer."""
    base = {"connection": {"url": "/x", "table": {"name": "t"}}}
    with pytest.raises(SpecError, match="no step"):
        JobSpec.from_json({"maintenance": dict(base)})
    with pytest.raises(SpecError, match="clusterMode"):
        JobSpec.from_json(
            {"maintenance": {**base, "compact": {"clusterMode": "zzz"}}}
        )
    with pytest.raises(SpecError, match="retainLast"):
        JobSpec.from_json(
            {"maintenance": {**base, "vacuum": {"retainLast": 0}}}
        )
    with pytest.raises(SpecError, match="zorderCells"):
        JobSpec.from_json(
            {"maintenance": {**base, "compact": {"zorderCells": "bogus"}}}
        )
    with pytest.raises(SpecError, match="stands alone"):
        JobSpec.from_json(
            {
                "maintenance": {**base, "checkpoint": True},
                "reader": {"connection": {"url": "/y"}},
            }
        )
    with pytest.raises(SpecError, match="connection.url"):
        JobSpec.from_json(
            {"maintenance": {"checkpoint": True}}
        )


def test_maintenance_convert_restore_clone_row_tracking(spark, tmp_path):
    """r16: the remaining lifecycle operations are spec-reachable —
    convert adopts a plain directory (and refuses an already-versioned
    one), restore rolls content back as a new commit, enableRowTracking
    backfills ids, clone snapshots into an independent table — all from
    JSON, in the documented step order."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    root = str(tmp_path)
    # plain parquet directory to adopt
    spark.range(50).select(F.col("id").alias("v")).coalesce(2).write.parquet(
        os.path.join(root, "t")
    )
    res = run_job(spark, _job(root, "t", convert={}))
    assert res.convert_version == 0
    vt = VersionedTable(spark, os.path.join(root, "t"))
    assert vt.read().count() == 50
    # convert on an already-versioned table is refused up front
    with pytest.raises(SpecError, match="already has a transaction log"):
        run_job(spark, _job(root, "t", convert={}))
    # mutate, then restore + enable row tracking + clone in ONE job
    vt.append(spark.range(50, 80).select(F.col("id").alias("v")))
    res = run_job(
        spark,
        _job(
            root,
            "t",
            restore={"version": 0},
            enableRowTracking=True,
            clone={"target": os.path.join(root, "t_dev")},
        ),
    )
    assert res.restore_version is not None
    assert res.row_tracking_version == res.restore_version + 1
    assert res.clone_path == os.path.join(root, "t_dev")
    assert vt.read().count() == 50  # restored content
    ids = sorted(
        r["_row_id"] for r in vt.read(with_row_ids=True).collect()
    )
    assert ids == list(range(50))  # backfilled dense
    c = VersionedTable(spark, os.path.join(root, "t_dev"))
    assert c.read().count() == 50
    assert sorted(
        r["_row_id"] for r in c.read(with_row_ids=True).collect()
    ) == ids  # the clone carries the ids
    # historical clone via versionAsOf
    run_job(
        spark,
        _job(
            root,
            "t",
            clone={
                "target": os.path.join(root, "t_v0"),
                "versionAsOf": 0,
            },
        ),
    )
    c0 = VersionedTable(spark, os.path.join(root, "t_v0"))
    assert c0.read().count() == 50
    # validation: bad shapes fail at parse, before anything is touched
    with _pytest.raises(SpecError, match="clone.target"):
        JobSpec.from_json(_job(root, "t", clone={}))
    with _pytest.raises(SpecError, match="exactly one"):
        JobSpec.from_json(_job(root, "t", restore={}))
    with _pytest.raises(SpecError, match="not both"):
        JobSpec.from_json(
            _job(
                root,
                "t",
                clone={"target": "/x", "versionAsOf": 1, "timestampAsOf": "2026"},
            )
        )


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_cluster_checkpoint_vacuum_restore_interplay_fuzz(
    spark, tmp_path, seed
):
    """Seeded model fuzz (r16, the r12 merge-fuzz pattern): interleave
    append / clustered-compact / checkpoint / vacuum / restore on a
    vt.clusterBy table and pin the three manifest-params consumers
    (incremental checkpoints, the _cluster_history walk, bloom carry)
    against each other. After EVERY step: the table equals a pure-python
    model, ordering-sensitive pruning returns exactly the model's rows
    in range (conservative correctness — skipping is an optimization,
    never a semantic), and _cluster_history keeps a consistent anchor
    (never ahead of the log, clustered files always live or ignored)."""
    import random

    rng = random.Random(seed)
    root = str(tmp_path)
    vt = VersionedTable(spark, os.path.join(root, "t"))
    # model: version -> sorted list of v values; current content mirror
    vt.overwrite(
        spark.range(40).select((F.col("id") * 7 % 101).alias("v")).coalesce(1)
    )
    vt.set_properties({"vt.clusterBy": "v"})
    history = {vt.latest_version(): sorted((i * 7 % 101) for i in range(40))}
    model = list(history[vt.latest_version()])
    next_lo = 200

    def check():
        assert sorted(r["v"] for r in vt.read().collect()) == sorted(model)
        lo, hi = rng.randrange(0, 300), rng.randrange(0, 300)
        lo, hi = min(lo, hi), max(lo, hi) + 1
        got = vt.read(prune=[("v", ">=", lo), ("v", "<", hi)]).count()
        assert got == sum(1 for x in model if lo <= x < hi)
        anchor, inc_run, clustered, onwrite = vt._cluster_history(
            vt.latest_version()
        )
        assert anchor is None or anchor <= vt.latest_version()
        assert inc_run >= 0
        assert onwrite == set()  # onWrite never set in this fuzz

    for _ in range(14):
        op = rng.choice(
            ["append", "append", "compact", "checkpoint", "vacuum", "restore"]
        )
        if op == "append":
            n = rng.randrange(5, 30)
            vals = [(next_lo + i * 3) % 997 for i in range(n)]
            next_lo += rng.randrange(1, 50)
            vt.append(
                spark.createDataFrame([(x,) for x in vals], "v long")
                .coalesce(1)
            )
            model.extend(vals)
        elif op == "compact":
            vt.compact(
                target_file_bytes=rng.choice([1024, 4096, 1 << 30]),
                cluster_mode=rng.choice(["auto", "incremental", "full"]),
            )
        elif op == "checkpoint":
            vt.checkpoint(force_full=rng.random() < 0.5)
        elif op == "vacuum":
            vt.vacuum(retain_last=rng.randrange(1, 4), grace_seconds=0.0)
        else:  # restore to a retained version whose model we recorded
            retained = [
                v for v in vt._versions() if v in history
            ]
            if retained:
                tgt = rng.choice(retained)
                try:
                    vt.restore(version=tgt)
                    model = list(history[tgt])
                except VersionedTableError:
                    pass  # target's files vacuumed: legal refusal
        history[vt.latest_version()] = list(model)
        check()


def test_vacuum_if_reclaimable_idempotent_schedule(spark, tmp_path):
    """r16 scheduler hook: vacuum.ifReclaimable gates the real sweep on
    a dry-run count — the SAME maintenance spec runs on a cadence: the
    first tick sweeps, the second finds nothing reclaimable, no-ops and
    SAYS SO in the step report (vacuum_skipped + removed=0)."""
    root, name = str(tmp_path), "t"
    vt = VersionedTable(spark, os.path.join(root, name))
    vt.overwrite(spark.range(100).coalesce(1))
    vt.overwrite(spark.range(200).coalesce(1))  # v0's file reclaimable
    job = _job(
        root,
        name,
        vacuum={"retainLast": 1, "graceSeconds": 0, "ifReclaimable": 1},
    )
    res1 = run_job(spark, job)
    assert res1.vacuum_removed >= 1
    assert res1.vacuum_skipped is None
    # tick 2: same spec, nothing left — cheap no-op that says so
    res2 = run_job(spark, job)
    assert res2.vacuum_removed == 0
    assert res2.vacuum_skipped is not None
    assert "ifReclaimable" in res2.vacuum_skipped
    assert vt.read().count() == 200
    # a HIGH threshold holds the sweep back even when something is
    # reclaimable (batch small deletes into one pass)
    vt.overwrite(spark.range(300).coalesce(1))
    res3 = run_job(
        spark,
        _job(
            root,
            name,
            vacuum={
                "retainLast": 1,
                "graceSeconds": 0,
                "ifReclaimable": 50,
            },
        ),
    )
    assert res3.vacuum_removed == 0 and res3.vacuum_skipped is not None
    assert vt.read().count() == 300
    # validation: contradictory / malformed gates fail at parse
    with pytest.raises(SpecError, match="ifReclaimable"):
        JobSpec.from_json(
            _job(root, name, vacuum={"retainLast": 1, "ifReclaimable": 0})
        )
    with pytest.raises(SpecError, match="contradictory"):
        JobSpec.from_json(
            _job(
                root,
                name,
                vacuum={
                    "retainLast": 1,
                    "ifReclaimable": 1,
                    "dryRun": True,
                },
            )
        )


def test_if_reclaimable_probe_honors_distributed(spark, tmp_path):
    """r16 review: the ifReclaimable gate's dry-run probe must run with
    the spec's distributed flag (the 10^6-file shape the flag exists
    for) — and the distributed listing must agree with the serial one."""
    root, name = str(tmp_path), "t"
    vt = VersionedTable(spark, os.path.join(root, name))
    vt.overwrite(spark.range(100).coalesce(2))
    vt.overwrite(spark.range(200).coalesce(2))
    serial = set(vt.vacuum(retain_last=1, grace_seconds=0.0, dry_run=True))
    dist = set(
        vt.vacuum(
            retain_last=1,
            grace_seconds=0.0,
            dry_run=True,
            distributed=True,
        )
    )
    assert serial == dist and serial  # same victims either way
    # the gated spec path with distributed=true still sweeps + no-ops
    job = _job(
        root,
        name,
        vacuum={
            "retainLast": 1,
            "graceSeconds": 0,
            "ifReclaimable": 1,
            "distributed": True,
        },
    )
    res1 = run_job(spark, job)
    assert res1.vacuum_removed == len(serial)
    res2 = run_job(spark, job)
    assert res2.vacuum_removed == 0 and res2.vacuum_skipped
    assert vt.read().count() == 200


def test_clone_then_vacuum_same_job_protects_cloned_snapshot(
    spark, tmp_path
):
    """ADVICE r16 (medium): a single job declaring a HISTORICAL clone
    followed by a real vacuum must not reclaim the files the clone it
    just created references — the cloned version's file set joins the
    vacuum keep set for this job. The protection is per-job (Delta's
    source-vacuum caveat still applies to later jobs)."""
    root, name = str(tmp_path), "t"
    path = os.path.join(root, name)
    vt = VersionedTable(spark, path)
    vt.overwrite(spark.range(100).select(F.col("id").alias("v")).coalesce(1))
    v_hist = vt.latest_version()
    hist_files = set(vt._state(v_hist))
    # two full rewrites so v_hist's files are unreferenced by the head
    vt.overwrite(
        spark.range(100, 300).select(F.col("id").alias("v")).coalesce(1)
    )
    vt.overwrite(
        spark.range(300, 350).select(F.col("id").alias("v")).coalesce(1)
    )
    res = run_job(
        spark,
        _job(
            root,
            name,
            clone={"target": os.path.join(root, "t_dev"), "versionAsOf": v_hist},
            vacuum={"retainLast": 1, "graceSeconds": 0},
        ),
    )
    # the historical files survived the sweep...
    for f in hist_files:
        assert os.path.exists(os.path.join(path, f)), f
    # ...the clone reads its snapshot intact...
    cl = VersionedTable(spark, res.clone_path)
    assert cl.read().count() == 100
    assert [r.v for r in cl.read().orderBy("v").limit(3).collect()] == [0, 1, 2]
    # ...and the sweep still reclaimed the middle version's files
    # (protection is scoped to the cloned snapshot, not a vacuum no-op)
    assert res.vacuum_removed >= 1
    # a LATER vacuum job (no clone step) reclaims them — documented
    # caveat (another commit first: a single-version log is a vacuum
    # no-op by the retain_last floor)
    vt.append(spark.range(5).select(F.col("id").alias("v")).coalesce(1))
    vt.overwrite(spark.range(5).select(F.col("id").alias("v")).coalesce(1))
    removed_later = vt.vacuum(retain_last=1, grace_seconds=0)
    assert removed_later >= 1
    assert any(
        not os.path.exists(os.path.join(path, f)) for f in hist_files
    )


def test_clone_then_dry_vacuum_excludes_cloned_files(spark, tmp_path):
    """The ifReclaimable probe and the dry-run listing honor the same
    clone protection as the real sweep (parity: the audit must predict
    the sweep)."""
    root, name = str(tmp_path), "t"
    path = os.path.join(root, name)
    vt = VersionedTable(spark, path)
    vt.overwrite(spark.range(50).select(F.col("id").alias("v")).coalesce(1))
    v_hist = vt.latest_version()
    hist_files = set(vt._state(v_hist))
    vt.overwrite(spark.range(7).select(F.col("id").alias("v")).coalesce(1))
    res = run_job(
        spark,
        _job(
            root,
            name,
            clone={"target": os.path.join(root, "t_dev"), "versionAsOf": v_hist},
            vacuum={"retainLast": 1, "graceSeconds": 0, "dryRun": True},
        ),
    )
    assert not (set(res.vacuum_dry_run) & hist_files)
    for f in hist_files:
        assert os.path.exists(os.path.join(path, f))

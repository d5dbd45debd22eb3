"""Declarative table maintenance: the job-spec surface for the
versioned layer's lifecycle operations (r15; clone/restore/convert/
enableRowTracking added r16).

The reference exposes its job lifecycle declaratively (writer/job.go:63-93
— preSQL/postSQL hooks around a declared write); a lakehouse scheduler
wants the same shape for layout work, the way Delta exposes
OPTIMIZE/VACUUM/RESTORE/CLONE/CONVERT as SQL statements. A maintenance
job moves no user rows — it adopts, rolls back, re-packs, snapshots,
and reclaims what the table already holds:

    {"maintenance": {
        "connection": {"url": root, "table": {"name": "t"}},
        "convert":  {"partitionBy": ["day"]},
        "restore":  {"version": 41},
        "enableRowTracking": true,
        "compact":  {"where": "day = '2026-08-15'", "zorder": ["k"]},
        "checkpoint": true,
        "clone":    {"target": "/lake/t_dev", "versionAsOf": 41},
        "vacuum":   {"retainHours": 168, "dryRun": true}}}

Steps run in the fixed order convert → restore → enableRowTracking →
compact → checkpoint → clone → vacuum (see MaintenanceSpec for the
rationale). Non-versioned targets are refused up front for every step
EXCEPT convert — whose whole point is adopting a plain directory; with
convert declared, an ALREADY-versioned target is the refusal instead.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from as_etl_storage_spark.spec import (
    MaintenanceSpec,
    SpecError,
    prune_triples_from_where,
)


@dataclass(frozen=True)
class MaintenanceResult:
    """What each declared step did. ``compact_version`` /
    ``checkpoint_version`` are the committed versions (compact returns
    the base version unchanged when the policy found nothing to do —
    same as the Python API). ``vacuum_removed`` counts deleted files;
    a dry run reports the would-be victims in ``vacuum_dry_run`` and
    removes nothing. ``convert_version``/``restore_version``/
    ``row_tracking_version`` are the versions those steps committed
    (None when not declared); ``clone_path`` is the clone's root."""

    table_path: str
    compact_version: int | None = None
    checkpoint_version: int | None = None
    vacuum_removed: int | None = None
    vacuum_dry_run: list[str] = field(default_factory=list)
    convert_version: int | None = None
    restore_version: int | None = None
    row_tracking_version: int | None = None
    clone_path: str | None = None
    #: set when vacuum.ifReclaimable gated the sweep off: the reason,
    #: with the reclaimable count — the scheduler-readable "no-op" signal
    vacuum_skipped: str | None = None
    #: True when a declared restore left a row-tracked table with files
    #: whose rows read ``_row_id`` as NULL (restored across the
    #: enablement boundary) and the job declared NO enableRowTracking
    #: step to repair it — the scheduler-readable "declare
    #: enableRowTracking next run" signal
    row_tracking_stale: bool = False


def run_maintenance(
    spark: SparkSession, spec: MaintenanceSpec
) -> MaintenanceResult:
    """Execute one maintenance job spec. Refuses wrong target types
    (no ``_log`` without convert; an existing ``_log`` with convert)
    before touching anything."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    path = os.path.join(spec.connection.url, spec.connection.table.name)
    has_log = os.path.isdir(os.path.join(path, "_log"))
    if spec.convert is not None and has_log:
        raise SpecError(
            f"maintenance convert targets plain parquet directories, but "
            f"{path} already has a transaction log — drop the convert "
            f"step (or point at the directory to adopt)"
        )
    if spec.convert is None and not has_log:
        raise SpecError(
            f"maintenance target is not a versioned table (no _log): "
            f"{path} — compact/vacuum/checkpoint semantics only exist "
            "on the transaction log"
        )

    convert_version: int | None = None
    if spec.convert is not None:
        vt = VersionedTable.convert(
            spark,
            path,
            partition_by=list(spec.convert.partition_by) or None,
            distributed=spec.convert.distributed,
        )
        convert_version = vt.latest_version()
    else:
        vt = VersionedTable(spark, path)

    restore_version: int | None = None
    rt_stale = False
    if spec.restore is not None:
        restore_version = vt.restore(
            version=spec.restore.version,
            timestamp=spec.restore.timestamp,
        )
        # a restore across the row-tracking enablement boundary leaves
        # NULL-id files; the enableRowTracking step right after this one
        # repairs it (scoped re-backfill) — report staleness only when
        # the job declares no repair
        if not spec.enable_row_tracking:
            rt_stale = vt.row_tracking_stale()

    row_tracking_version: int | None = None
    if spec.enable_row_tracking:
        row_tracking_version = vt.enable_row_tracking()

    compact_version: int | None = None
    if spec.compact is not None:
        c = spec.compact
        # validated at parse: a non-empty where always yields triples
        triples = prune_triples_from_where(c.where) if c.where.strip() else []
        compact_version = vt.compact(
            target_file_bytes=c.target_file_bytes,
            zorder=list(c.zorder) or None,
            zorder_cells=c.zorder_cells,
            where=triples or None,
            cluster_mode=c.cluster_mode,
        )

    checkpoint_version: int | None = None
    if spec.checkpoint:
        checkpoint_version = vt.checkpoint()

    clone_path: str | None = None
    clone_protect: set[str] | None = None
    if spec.clone is not None:
        # resolve the cloned version BEFORE cloning, the same way
        # clone() does, so the vacuum step below can protect exactly
        # the snapshot the clone references
        if spec.clone.timestamp_as_of is not None:
            src_ver = vt.resolve_timestamp(spec.clone.timestamp_as_of)
        elif spec.clone.version_as_of is not None:
            src_ver = spec.clone.version_as_of
        else:
            src_ver = vt.latest_version()
        cl = vt.clone(
            spec.clone.target,
            version=spec.clone.version_as_of,
            timestamp=spec.clone.timestamp_as_of,
        )
        clone_path = cl.path
        # a shallow clone references the SOURCE's files by absolute
        # path — invisible to the source vacuum's retention walk. A
        # historical clone (versionAsOf outside retention) would
        # otherwise be corrupted by the vacuum step of the SAME job
        # that created it: protect the cloned version's data files and
        # deletion vectors for this job's sweep. (A LATER vacuum job
        # can still reclaim them — Delta's documented source-vacuum
        # caveat; compact() the clone to cut the dependency.)
        clone_protect = set(vt._state(src_ver))
        for e in vt._dv_at(src_ver).values():
            clone_protect.update(
                p
                if not os.path.isabs(p)
                else os.path.relpath(p, path)
                for p in e["files"]
            )

    vacuum_removed: int | None = None
    dry: list[str] = []
    vacuum_skipped: str | None = None
    if spec.vacuum is not None:
        v = spec.vacuum
        run_sweep = True
        if v.if_reclaimable is not None:
            # scheduler gate: ONE dry run decides whether the sweep is
            # worth a pass — re-running the same spec after a sweep
            # finds nothing reclaimable and no-ops, saying so
            reclaimable = vt.vacuum(
                retain_last=v.retain_last,
                grace_seconds=v.grace_seconds,
                retain_hours=v.retain_hours,
                # honor the spec's execution shape: on the 10^6-file
                # object-store table the probe must fan out too, or the
                # "cheap tick" is a serial driver walk
                distributed=v.distributed,
                dry_run=True,
                protect_files=clone_protect,
            )
            if len(reclaimable) < v.if_reclaimable:
                run_sweep = False
                vacuum_skipped = (
                    f"ifReclaimable: {len(reclaimable)} reclaimable "
                    f"file(s) < threshold {v.if_reclaimable}; sweep "
                    f"skipped"
                )
                vacuum_removed = 0
        if run_sweep:
            out = vt.vacuum(
                retain_last=v.retain_last,
                grace_seconds=v.grace_seconds,
                retain_hours=v.retain_hours,
                distributed=v.distributed,
                dry_run=v.dry_run,
                protect_files=clone_protect,
            )
            if v.dry_run:
                dry = list(out)  # type: ignore[arg-type]
            else:
                vacuum_removed = int(out)  # type: ignore[arg-type]

    return MaintenanceResult(
        table_path=path,
        compact_version=compact_version,
        checkpoint_version=checkpoint_version,
        vacuum_removed=vacuum_removed,
        vacuum_dry_run=dry,
        convert_version=convert_version,
        restore_version=restore_version,
        row_tracking_version=row_tracking_version,
        clone_path=clone_path,
        vacuum_skipped=vacuum_skipped,
        row_tracking_stale=rt_stale,
    )

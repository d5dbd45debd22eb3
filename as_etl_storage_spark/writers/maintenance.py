"""Declarative table maintenance: the job-spec surface for
compact / checkpoint / vacuum on versioned tables (r15).

The reference exposes its job lifecycle declaratively (writer/job.go:63-93
— preSQL/postSQL hooks around a declared write); a lakehouse scheduler
wants the same shape for layout work, the way Delta exposes
OPTIMIZE/VACUUM as SQL statements. A maintenance job moves no rows — it
re-packs, snapshots, and reclaims what the table already holds:

    {"maintenance": {
        "connection": {"url": root, "table": {"name": "t"}},
        "compact":  {"where": "day = '2026-08-15'", "zorder": ["k"]},
        "checkpoint": true,
        "vacuum":   {"retainHours": 168, "dryRun": true}}}

Steps run compact → checkpoint → vacuum (the packed snapshot is what the
checkpoint should capture and what vacuum's retention math should see).
Non-versioned targets are refused up front: maintenance semantics —
snapshot isolation, retention, data_change:false commits — only exist on
the transaction log.
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
    removes nothing."""

    table_path: str
    compact_version: int | None = None
    checkpoint_version: int | None = None
    vacuum_removed: int | None = None
    vacuum_dry_run: list[str] = field(default_factory=list)


def run_maintenance(
    spark: SparkSession, spec: MaintenanceSpec
) -> MaintenanceResult:
    """Execute one maintenance job spec. Refuses non-versioned targets
    (no ``_log``) before touching anything."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    path = os.path.join(spec.connection.url, spec.connection.table.name)
    if not os.path.isdir(os.path.join(path, "_log")):
        raise SpecError(
            f"maintenance target is not a versioned table (no _log): "
            f"{path} — compact/vacuum/checkpoint semantics only exist "
            "on the transaction log"
        )
    vt = VersionedTable(spark, path)

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

    vacuum_removed: int | None = None
    dry: list[str] = []
    if spec.vacuum is not None:
        v = spec.vacuum
        out = vt.vacuum(
            retain_last=v.retain_last,
            grace_seconds=v.grace_seconds,
            retain_hours=v.retain_hours,
            distributed=v.distributed,
            dry_run=v.dry_run,
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
    )

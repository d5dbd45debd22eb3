"""Row-id-keyed incremental materialized views over the change feed.

The reference's whole job shape is reader → transform → writer run as a
batch (database/dbms/reader/job.go:122 → writer/job.go:63); a lakehouse
wants the same declared pipeline kept CONTINUOUSLY true without
re-running it over the full table. This module restates that job as an
incremental loop over the versioned layer's primitives:

    {"materialize": {
        "connection": {"url": root, "table": {"name": "src"}},
        "target": "/lake/src_view",
        "select": ["o_orderkey", "o_totalprice * 2 AS double_price"],
        "where":  "o_orderstatus = 'O'"}}

The VIEW is itself a versioned table holding the transformed rows plus
``_src_row_id`` — the source's stable row id (row tracking must be ON:
the id survives update/merge/compact rewrites, so the view never has to
re-derive row identity from payload). Each refresh:

  * reads ``change_feed(with_row_ids=True)`` since the last refreshed
    source version — cost ∝ changed rows, never ∝ table;
  * nets the feed to ONE terminal event per row id (a row updated five
    times and deleted applies as one delete);
  * applies it with two id-keyed MERGEs into the view: net-deletes and
    filtered-out rows drop by id, surviving rows upsert by id — the id
    IS the join key, no payload-key derivation, and the merge rewrites
    only the view files holding matched ids (file-pruned discovery);
  * records the refreshed source version in the view's properties.

Refreshes are IDEMPOTENT: both merges key on ``_src_row_id``, so a
crash between the data commits and the version bookmark replays the
same net changes to the same result. A feed range the CDF cannot
serve row-level (overwrite / restore / vacuumed history — the
documented "full re-read required" contract) falls back to one full
rebuild, as does a changed view definition (fingerprint mismatch) and
change rows predating row-tracking enablement (NULL ids are unkeyable).

Scale shape at 100 TB: the steady-state refresh plans two scans over
the range's change files (the CDF contract), one window shuffle ∝ net
changes, and merge rewrites ∝ matched view files. Source row ids
allocate monotonically, so ``_src_row_id`` correlates with view file
order and the manifest bounds keep the merge's touched-file discovery
selective without any explicit clustering. The initial build is the
only table-sized pass — exactly Delta's materialized-view posture.

Supported view definitions are DETERMINISTIC ROW-LEVEL transforms of
one source table — per-row ``select`` expressions plus an optional
``where``. Aggregates / joins / windows / sorts / limits / random
expressions are refused at refresh setup (plan-shape check): their
incremental maintenance needs group-state algebra this job does not
claim (run them as ordinary queries, or stack them on the view).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from as_etl_storage_spark.spec import MaterializeSpec, SpecError

#: the view-side column carrying the SOURCE's stable row id
SRC_ROW_ID = "_src_row_id"

#: plan nodes a row-level view definition must not produce (their
#: incremental maintenance is not id-keyed); checked on the ANALYZED
#: plan of the definition applied to an empty slice of the source
_FORBIDDEN_PLAN = re.compile(
    r"\b(Aggregate|Window|Join|Sort|GlobalLimit|LocalLimit|Distinct|"
    r"Generate|Sample)\b"
)

#: textual guard for non-deterministic expressions the plan-shape check
#: cannot see (they analyze as ordinary projections)
_FORBIDDEN_EXPR = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|"
    r"current_timestamp|current_date|now|unix_timestamp\s*\(\s*\))\b",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class MaterializeResult:
    """What one materialize run did. ``mode``: ``'initial'`` (first
    build), ``'incremental'`` (id-keyed delta apply), ``'full'``
    (rebuild — non-CDF range, changed definition, or ``fullRefresh``),
    ``'noop'`` (source unchanged — zero commits) or ``'bookmark'``
    (only layout-only source versions in range — one metadata commit,
    zero data files touched). ``deletes``/``upserts`` count the net
    id-keyed changes applied (None outside incremental mode)."""

    view_path: str
    mode: str
    source_version: int
    view_version: int | None
    deletes: int | None = None
    upserts: int | None = None


def _fingerprint(source_path: str, select: tuple, where: str) -> str:
    """Content identity of the view DEFINITION: a changed select/where
    (or a re-pointed source) must force a rebuild, never silently apply
    new transforms to old rows."""
    blob = json.dumps(
        {"source": source_path, "select": list(select), "where": where},
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


def _transform(df: DataFrame, spec: MaterializeSpec) -> DataFrame:
    """The view definition applied to source-shaped rows carrying
    ``_row_id``: filter, project, and carry the id out as the view key."""
    if spec.where.strip():
        df = df.where(spec.where)
    cols = (
        [F.expr(e) for e in spec.select]
        if spec.select
        else [F.col(c) for c in df.columns if c != "_row_id"]
    )
    return df.select(*cols, F.col("_row_id").alias(SRC_ROW_ID))


def _check_row_level(src_empty: DataFrame, spec: MaterializeSpec) -> None:
    """Refuse definitions whose maintenance is not id-keyed: the
    analyzed plan of the definition over an EMPTY source-shaped frame
    (a LocalRelation — its own plan contributes no nodes the matcher
    watches) must be pure filter+project (no Aggregate/Window/Join/
    Sort/Limit/...), and no expression may be non-deterministic.
    Zero-row, zero-job — the plan is analyzed, never executed."""
    for text in (*spec.select, spec.where):
        m = _FORBIDDEN_EXPR.search(text or "")
        if m:
            raise SpecError(
                f"materialize definitions must be deterministic; "
                f"{m.group(0)!r} in {text!r} is not — its incremental "
                f"re-evaluation would diverge from the initial build"
            )
    try:
        probe = _transform(src_empty, spec)
        analyzed = probe._jdf.queryExecution().analyzed().toString()
    except SpecError:
        raise
    except Exception as exc:
        # covers plain typos AND aggregate selects Spark itself rejects
        # before our plan check (MISSING_GROUP_BY: sum(v) next to the
        # carried row id)
        raise SpecError(
            f"materialize definition does not analyze against the "
            f"source schema (row-level filter + per-row projections "
            f"only): {exc}"
        ) from None
    m = _FORBIDDEN_PLAN.search(analyzed)
    if m:
        raise SpecError(
            f"materialize supports row-level definitions only "
            f"(filter + per-row projections); the declared select/where "
            f"produces a {m.group(0)} — aggregates, joins, windows, "
            f"sorts, limits and sampling are not id-keyed-maintainable "
            f"by this job"
        )


def _net_changes(feed: DataFrame) -> DataFrame:
    """One TERMINAL event per row id across the range: the latest
    commit wins; within a commit the postimage/insert/delete outranks
    the update preimage. Shuffle ∝ change rows (the feed is already
    ∝ changed files)."""
    ord_col = F.when(
        F.col("_change_type") == "update_preimage", F.lit(0)
    ).otherwise(F.lit(1))
    w = Window.partitionBy("_row_id").orderBy(
        F.col("_commit_version").desc(), F.col("__mv_ord").desc()
    )
    return (
        feed.withColumn("__mv_ord", ord_col)
        .withColumn("__mv_rn", F.row_number().over(w))
        .where(F.col("__mv_rn") == 1)
        .drop("__mv_rn", "__mv_ord")
    )


def run_materialize(
    spark: SparkSession, spec: MaterializeSpec
) -> MaterializeResult:
    """Execute one materialize job: create the view on first run,
    bookmark-only on layout-only source activity, id-keyed incremental
    apply otherwise; full rebuild when the CDF cannot serve the range,
    the definition changed, or the spec forces it."""
    from as_etl_storage_spark.writers.versioned import (
        VersionedTable,
        VersionedTableError,
    )

    src_path = os.path.join(
        spec.connection.url, spec.connection.table.name
    )
    src = VersionedTable(spark, src_path)
    src_v = src.latest_version()
    if src_v is None:
        raise SpecError(
            f"materialize source is not a versioned table (no log): "
            f"{src_path}"
        )
    if not src._row_tracked_at(src_v):
        raise SpecError(
            f"materialize needs row tracking on the source (the view "
            f"keys on the stable row id); run enable_row_tracking() on "
            f"{src_path} first"
        )
    fp = _fingerprint(src_path, spec.select, spec.where)
    _check_row_level(
        spark.createDataFrame(
            [], src.read(version_as_of=src_v, with_row_ids=True).schema
        ),
        spec,
    )
    view = VersionedTable(spark, spec.target, log_store=src._store)
    view_v = view.latest_version()

    def _rebuild(mode: str) -> MaterializeResult:
        # the only table-sized pass: snapshot at src_v, transformed,
        # last-writer-wins into the view, bookmark in a trailing
        # metadata commit (a crash between them leaves no fingerprint
        # match, so the next run rebuilds — idempotent)
        full = _transform(
            src.read(version_as_of=src_v, with_row_ids=True), spec
        )
        view.overwrite(full)
        nv = view.set_properties(
            {
                "vt.mv.source": src_path,
                "vt.mv.sourceVersion": str(src_v),
                "vt.mv.fingerprint": fp,
            }
        )
        return MaterializeResult(
            view_path=spec.target,
            mode=mode,
            source_version=src_v,
            view_version=nv,
        )

    if view_v is None:
        return _rebuild("initial")
    props = view._properties_at(view_v)
    if spec.full_refresh or props.get("vt.mv.fingerprint") != fp:
        return _rebuild("full")
    last = int(props["vt.mv.sourceVersion"])
    if src_v < last:
        # the source was restored/vacuumed below the bookmark — the
        # feed range would be backwards; only a rebuild is sound
        return _rebuild("full")
    if src_v == last:
        return MaterializeResult(
            view_path=spec.target,
            mode="noop",
            source_version=src_v,
            view_version=view_v,
        )
    try:
        feed = src.change_feed(
            from_version=last, to_version=src_v, with_row_ids=True
        )
    except VersionedTableError:
        # the CDF's documented "full re-read required" contract:
        # overwrite/restore in range, or the history was vacuumed
        return _rebuild("full")
    if not feed.where(F.col("_row_id").isNull()).isEmpty():
        # change rows from versions before enablement carry NULL ids —
        # unkeyable; one rebuild re-baselines onto dense ids
        return _rebuild("full")
    net = _net_changes(feed).persist()
    try:
        if net.isEmpty():
            # layout-only versions in range: move the bookmark in ONE
            # metadata commit — zero data files read or written
            nv = view.set_properties(
                {"vt.mv.sourceVersion": str(src_v)}
            )
            return MaterializeResult(
                view_path=spec.target,
                mode="bookmark",
                source_version=src_v,
                view_version=nv,
            )
        survivors = _transform(
            net.where(F.col("_change_type") != "delete").drop(
                "_change_type", "_commit_version"
            ),
            spec,
        ).persist()
        try:
            n_up = survivors.count()
            # ids whose terminal state leaves the view: net deletes,
            # plus updated rows the where-filter now excludes. The
            # merge surface wants a full-width source; a matched-DELETE
            # never reads the payload, so the non-key columns ride as
            # typed NULLs.
            pad = [
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in view.read(version_as_of=view_v).schema.fields
                if f.name != SRC_ROW_ID
            ]
            drops = (
                net.select(F.col("_row_id").alias(SRC_ROW_ID))
                .join(survivors.select(SRC_ROW_ID), SRC_ROW_ID, "left_anti")
                .select(F.col(SRC_ROW_ID), *pad)
                .persist()
            )
            try:
                n_del = drops.count()
                view_version = view_v
                if n_del:
                    v = view.merge(
                        drops,
                        on=[SRC_ROW_ID],
                        when_matched="delete",
                        when_not_matched=None,
                    )
                    view_version = v if v is not None else view_version
                if n_up:
                    v = view.merge(
                        survivors,
                        on=[SRC_ROW_ID],
                        when_matched="update",
                        when_not_matched="insert",
                    )
                    view_version = v if v is not None else view_version
            finally:
                drops.unpersist()
        finally:
            survivors.unpersist()
    finally:
        net.unpersist()
    nv = view.set_properties({"vt.mv.sourceVersion": str(src_v)})
    return MaterializeResult(
        view_path=spec.target,
        mode="incremental",
        source_version=src_v,
        view_version=nv,
        deletes=n_del,
        upserts=n_up,
    )

"""JSON job spec — the reference's de-facto query language.

Mirrors the reader/writer config surface (reference:
database/dbms/reader/config.go:38-46,74-114 and
database/dbms/writer/config.go:42-80,147-175) as a validated Python model.
The runner compiles a JobSpec into DataFrame lineage (sources → transforms →
writer), so this module is pure Python and unit-testable without Spark.

Validation parity:
  * empty ``column`` list is an error (reader/parameter.go:57-59)
  * SELECT statements rejected in preSQL/postSQL (writer/config.go:167-175)
  * split range type must match the probed key type (reader/split.go:84-111)
  * writeMode must be a registered mode (database/db.go:380-396)
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any

from as_etl_storage_spark.types import TIME_ACCURACIES

WRITE_MODES = ("insert", "replace", "overwrite", "ignore", "merge")

#: split.range.type domain (reference split.go:114-119)
SPLIT_RANGE_TYPES = ("bigint", "string", "time")


class SpecError(ValueError):
    """Raised on invalid job configuration."""


@dataclass(frozen=True)
class TableRef:
    """3-level table name ``instance.schema.table``
    (reference database/table.go:30-38,112-114). For path-based sources the
    name is the table file/dir name under the connection url."""

    db: str = ""
    schema: str = ""
    name: str = ""

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "TableRef":
        return TableRef(
            db=obj.get("db", ""), schema=obj.get("schema", ""), name=obj.get("name", "")
        )

    def quoted(self) -> str:
        parts = [p for p in (self.db, self.schema, self.name) if p]
        return ".".join(f"`{p}`" for p in parts)


@dataclass(frozen=True)
class SplitRange:
    """Pre-declared split range (S13; reference split.go:47-61)."""

    type: str = ""
    layout: str = ""
    left: str = ""
    right: str = ""

    def validate(self) -> None:
        if self.type and self.type not in SPLIT_RANGE_TYPES:
            raise SpecError(
                f"split.range.type {self.type!r} not in {SPLIT_RANGE_TYPES}"
            )
        if bool(self.left) != bool(self.right):
            # silently falling back to min/max discovery would run a
            # full-table aggregate with bounds the user didn't declare
            raise SpecError(
                "split.range declares only one of left/right — declare "
                "both (S13 pre-declared bounds) or neither (S12 min/max "
                "discovery)"
            )


@dataclass(frozen=True)
class SplitSpec:
    """Split config (S5/S8-S15; reference reader/config.go:103-114)."""

    key: str = ""
    time_accuracy: str = ""
    range: SplitRange = field(default_factory=SplitRange)

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "SplitSpec":
        rng = obj.get("range", {}) or {}

        def bound(name: str) -> str:
            # JSON null means "not declared" — str(None) would turn it
            # into the truthy literal "None" and take the S13 branch
            v = rng.get(name)
            return "" if v is None else str(v)

        return SplitSpec(
            key=obj.get("key", ""),
            time_accuracy=obj.get("timeAccuracy", ""),
            range=SplitRange(
                type=rng.get("type", ""),
                layout=rng.get("layout", ""),
                left=bound("left"),
                right=bound("right"),
            ),
        )

    def validate(self) -> None:
        self.range.validate()
        if self.time_accuracy and self.time_accuracy not in TIME_ACCURACIES:
            raise SpecError(
                f"split.timeAccuracy {self.time_accuracy!r} not in "
                f"{sorted(TIME_ACCURACIES)}"
            )


@dataclass(frozen=True)
class PoolSpec:
    """Connection-pool limits (C2 parity; reference defaults 4/4,
    database/source.go:11-14, database/config.go:27-65). For JDBC sources
    maxOpenConns bounds numPartitions (each partition holds a connection);
    the parquet path has no connections to pool."""

    max_open_conns: int = 4
    max_idle_conns: int = 4
    conn_max_idle_s: float = 0.0
    conn_max_lifetime_s: float = 0.0

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "PoolSpec":
        return PoolSpec(
            max_open_conns=int(obj.get("maxOpenConns", 4)),
            max_idle_conns=int(obj.get("maxIdleConns", 4)),
            conn_max_idle_s=float(obj.get("connMaxIdleTime", 0.0)),
            conn_max_lifetime_s=float(obj.get("connMaxLifetime", 0.0)),
        )


@dataclass(frozen=True)
class ConnectionSpec:
    """Connection: url + table ref. For the native engine the url is a
    directory of parquet/delta tables; for JDBC it is a JDBC url."""

    url: str = ""
    table: TableRef = field(default_factory=TableRef)
    pool: PoolSpec = field(default_factory=PoolSpec)
    #: pinned version for time-travel reads on versioned tables (S7
    #: transactional-read parity); None = latest committed version
    version_as_of: int | None = None
    #: incremental read on versioned tables: only rows appended AFTER
    #: this version (exclusive) up to the latest. Mutually exclusive
    #: with versionAsOf — a pinned snapshot and a delta are different
    #: questions.
    changes_from: int | None = None
    #: wall-clock time travel on versioned tables: the snapshot current
    #: at this instant (epoch seconds or ISO-8601 string; Delta's
    #: timestampAsOf). Mutually exclusive with both versionAsOf (one
    #: pin per read) and changesFrom.
    timestamp_as_of: float | str | None = None
    #: row-level change feed on versioned tables (Delta's
    #: readChangeFeed + startingVersion): every change AFTER this
    #: version (exclusive) up to changeFeedTo (or latest) — table
    #: columns plus _change_type/_commit_version. Where changesFrom
    #: answers "what rows are NEW?" (append-only increments, any
    #: data-changing rewrite refuses), this answers "what HAPPENED?"
    #: (deletes/updates arrive as delete / update_pre+postimage rows).
    #: Mutually exclusive with the other read pins.
    change_feed_from: int | None = None
    change_feed_to: int | None = None

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "ConnectionSpec":
        v = obj.get("versionAsOf")
        cf = obj.get("changesFrom")
        ts = obj.get("timestampAsOf")
        cff = obj.get("changeFeedFrom")
        cft = obj.get("changeFeedTo")
        if sum(x is not None for x in (v, cf, ts, cff)) > 1:
            raise SpecError(
                "versionAsOf, changesFrom, timestampAsOf and "
                "changeFeedFrom are mutually exclusive: a pinned "
                "snapshot, an incremental delta and a row-level change "
                "feed are different reads"
            )
        if cft is not None and cff is None:
            raise SpecError(
                "changeFeedTo needs changeFeedFrom: a change-feed range "
                "has no meaning without its starting version"
            )
        if ts is not None and not isinstance(ts, (int, float, str)):
            raise SpecError(
                f"timestampAsOf must be epoch seconds or an ISO-8601 "
                f"string, got {type(ts).__name__}"
            )
        return ConnectionSpec(
            url=obj.get("url", ""),
            table=TableRef.from_json(obj.get("table", {}) or {}),
            pool=PoolSpec.from_json(obj.get("pool", {}) or {}),
            version_as_of=int(v) if v is not None else None,
            changes_from=int(cf) if cf is not None else None,
            timestamp_as_of=ts,
            change_feed_from=int(cff) if cff is not None else None,
            change_feed_to=int(cft) if cft is not None else None,
        )


@dataclass(frozen=True)
class ReaderSpec:
    """Reader half of the job (reference reader/config.go:38-46)."""

    dialect: str = "parquet"
    connection: ConnectionSpec = field(default_factory=ConnectionSpec)
    columns: tuple[str, ...] = ()
    where: str = ""
    split: SplitSpec = field(default_factory=SplitSpec)
    query_sql: tuple[str, ...] = ()
    username: str = ""
    password: str = ""
    #: job-level CHAR-trim toggle (BaseConfig.TrimChar, config.go:74) —
    #: consumed by the JDBC dialects' read normalization (P4)
    trim_char: bool = False
    #: column -> declared DB type name (e.g. CHAR, VARCHAR2). The reference
    #: reads these from the live catalog (DatabaseTypeName()); with no
    #: database in the loop the job declares them so the dialect rules
    #: (trim/empty-string) know which columns they govern
    field_types: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "ReaderSpec":
        spec = ReaderSpec(
            dialect=obj.get("dialect", "parquet"),
            connection=ConnectionSpec.from_json(obj.get("connection", {}) or {}),
            columns=tuple(obj.get("column", []) or []),
            where=obj.get("where", ""),
            split=SplitSpec.from_json(obj.get("split", {}) or {}),
            query_sql=tuple(obj.get("querySql", []) or []),
            username=obj.get("username", ""),
            password=obj.get("password", ""),
            trim_char=bool(obj.get("trimChar", False)),
            field_types=dict(obj.get("fieldTypes", {}) or {}),
        )
        spec.validate()
        return spec

    def validate(self) -> None:
        if not self.query_sql:
            if not self.columns:
                # reference errors on an empty select list
                # (reader/parameter.go:57-59); "*" must be explicit
                raise SpecError("reader.column must be non-empty (use ['*'] for all)")
            if not self.connection.table.name:
                raise SpecError("reader.connection.table.name is required")
        self.split.validate()


_FORBIDDEN_HOOK = re.compile(r"^\s*select\b", re.IGNORECASE)


def validate_hook_sql(statements: tuple[str, ...], which: str) -> None:
    """preSQL/postSQL must be non-SELECT (writer/config.go:167-175)."""
    for stmt in statements:
        if _FORBIDDEN_HOOK.match(stmt):
            raise SpecError(f"{which} must not contain SELECT statements: {stmt!r}")


@dataclass(frozen=True)
class RetrySpec:
    """Retry policy (writer/config.go:64-72). At Spark scale per-row retry
    becomes row-level quarantine (SURVEY.md §4 W8)."""

    ignore_one_by_one_error: bool = False
    max_retries: int = 3


@dataclass(frozen=True)
class WriterSpec:
    """Writer half of the job (reference writer/config.go:42-54)."""

    dialect: str = "parquet"
    connection: ConnectionSpec = field(default_factory=ConnectionSpec)
    columns: tuple[str, ...] = ()
    write_mode: str = "insert"
    batch_size: int = 1000  # reference default writer/config.go:21
    batch_timeout_s: float = 1.0  # reference default writer/config.go:22
    pre_sql: tuple[str, ...] = ()
    post_sql: tuple[str, ...] = ()
    merge_keys: tuple[str, ...] = ()  # keys for replace/MERGE (W2)
    retry: RetrySpec = field(default_factory=RetrySpec)
    quarantine_predicate: str = ""  # rows NOT satisfying this go to reject table
    versioned: bool = False  # transaction-log table (snapshot isolation/time travel)
    evolve_schema: bool = False  # allow additive schema changes on append
    partition_by: tuple[str, ...] = ()  # hive-style partition directories
    zorder_by: tuple[str, ...] = ()  # Morton-cluster files on these columns
    #: overwrite replaces ONLY the partitions present in the incoming batch
    #: (Spark dynamic partition overwrite) instead of truncating the table —
    #: the at-scale update path for date/source-partitioned tables
    dynamic_partition_overwrite: bool = False
    #: overwrite replaces ONLY the rows matching this SQL predicate
    #: (Delta's replaceWhere): atomic delete-matching + insert-batch, with
    #: every written row required to satisfy the predicate. Versioned
    #: tables only; finer-grained than dynamicPartitionOverwrite
    replace_where: str = ""
    #: writeMode=merge clause surface (Delta MERGE INTO over the job
    #: spec; versioned tables only): what happens to key-matched target
    #: rows ('update' | 'delete' | None), to unmatched source rows
    #: ('insert' | None), and to target rows no source key matches
    #: (None | 'delete' — the mirror/retention clause)
    when_matched: str | None = "update"
    when_not_matched: str | None = "insert"
    when_not_matched_by_source: str | None = None
    #: per-clause SQL conditions narrowing each clause (Delta's
    #: whenMatchedUpdate(condition=...) family). The matched condition
    #: sees both rows via source.<col>/target.<col> struct aliases
    when_matched_condition: str = ""
    when_not_matched_condition: str = ""
    when_not_matched_by_source_condition: str = ""
    #: column → SQL expression: the partial-update SET map (Delta's
    #: whenMatchedUpdate(set={...})); empty = UpdateAll
    when_matched_set: dict[str, str] = field(default_factory=dict)
    #: CDC-apply batch compression: before merging, keep only the LAST
    #: row per mergeKeys group, ordered by this column descending (the
    #: keep-latest window Delta's own CDC-apply recipe ranks with).
    #: A change-feed batch spanning several commits otherwise carries
    #: several images of one key and MERGE correctly refuses the
    #: ambiguity; this declares which image wins (e.g.
    #: "_commit_version"). Ties are broken arbitrarily — point it at a
    #: monotonic version/timestamp column
    keep_latest_by: str = ""
    #: TBLPROPERTIES to SET on the versioned sink (merged into the
    #: table's map; the vt.* config namespace — bloom-filter indexes,
    #: auto-compaction — is validated by the table at apply time).
    #: Applied BEFORE the write on an existing table (so this write's
    #: filter build / auto-compact see them), after creation otherwise.
    table_properties: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "WriterSpec":
        retry = obj.get("retry", {}) or {}
        spec = WriterSpec(
            dialect=obj.get("dialect", "parquet"),
            connection=ConnectionSpec.from_json(obj.get("connection", {}) or {}),
            columns=tuple(obj.get("column", []) or []),
            write_mode=obj.get("writeMode", "insert"),
            batch_size=int(obj.get("batchSize", 1000)),
            batch_timeout_s=float(obj.get("batchTimeout", 1.0)),
            pre_sql=tuple(obj.get("preSQL", []) or []),
            post_sql=tuple(obj.get("postSQL", []) or []),
            merge_keys=tuple(obj.get("mergeKeys", []) or []),
            retry=RetrySpec(
                ignore_one_by_one_error=bool(retry.get("ignoreOneByOneError", False)),
                max_retries=int(retry.get("maxRetries", 3)),
            ),
            quarantine_predicate=obj.get("quarantinePredicate", ""),
            versioned=bool(obj.get("versioned", False)),
            evolve_schema=bool(obj.get("evolveSchema", False)),
            partition_by=tuple(obj.get("partitionBy", []) or []),
            zorder_by=tuple(obj.get("zorderBy", []) or []),
            dynamic_partition_overwrite=bool(
                obj.get("dynamicPartitionOverwrite", False)
            ),
            replace_where=str(obj.get("replaceWhere", "") or ""),
            # JSON null is a meaningful clause value ("clause off"), so
            # the default only applies when the key is ABSENT
            when_matched=obj.get("whenMatched", "update"),
            when_not_matched=obj.get("whenNotMatched", "insert"),
            when_not_matched_by_source=obj.get(
                "whenNotMatchedBySource", None
            ),
            when_matched_condition=str(
                obj.get("whenMatchedCondition", "") or ""
            ),
            when_not_matched_condition=str(
                obj.get("whenNotMatchedCondition", "") or ""
            ),
            when_not_matched_by_source_condition=str(
                obj.get("whenNotMatchedBySourceCondition", "") or ""
            ),
            when_matched_set=dict(obj.get("whenMatchedSet", {}) or {}),
            keep_latest_by=str(obj.get("keepLatestBy", "") or ""),
            table_properties=dict(obj.get("tableProperties", {}) or {}),
        )
        spec.validate()
        return spec

    def validate(self) -> None:
        if self.write_mode not in WRITE_MODES:
            raise SpecError(
                f"writeMode {self.write_mode!r} not in {WRITE_MODES} "
                "(unknown non-insert mode is an error, db.go:380-396)"
            )
        if self.write_mode == "replace" and not self.merge_keys:
            raise SpecError("writeMode=replace requires mergeKeys (MERGE key set)")
        if self.write_mode == "merge":
            # mirrors replace's key rule; the clause machinery needs the
            # transaction log, so the versioned sink is the only target
            if not self.merge_keys:
                raise SpecError(
                    "writeMode=merge requires mergeKeys (MERGE key set)"
                )
            if not self.versioned:
                raise SpecError(
                    "writeMode=merge requires versioned=true (MERGE's "
                    "clause semantics need the transaction-log sink; "
                    "plain-file upsert is writeMode=replace)"
                )
            if self.when_matched not in ("update", "delete", None):
                raise SpecError(
                    f"whenMatched must be 'update', 'delete' or null, "
                    f"got {self.when_matched!r}"
                )
            if self.when_not_matched not in ("insert", None):
                raise SpecError(
                    f"whenNotMatched must be 'insert' or null, "
                    f"got {self.when_not_matched!r}"
                )
            if self.when_not_matched_by_source not in ("delete", None):
                raise SpecError(
                    f"whenNotMatchedBySource must be 'delete' or null, "
                    f"got {self.when_not_matched_by_source!r}"
                )
            for cname, cval, clause in (
                ("whenMatchedCondition", self.when_matched_condition,
                 self.when_matched),
                ("whenNotMatchedCondition", self.when_not_matched_condition,
                 self.when_not_matched),
                ("whenNotMatchedBySourceCondition",
                 self.when_not_matched_by_source_condition,
                 self.when_not_matched_by_source),
            ):
                if cval and clause is None:
                    raise SpecError(
                        f"{cname} given but its clause is null — a "
                        f"condition narrows a clause, it cannot replace one"
                    )
            if self.when_matched_set and self.when_matched != "update":
                raise SpecError(
                    "whenMatchedSet requires whenMatched='update'"
                )
        else:
            fields_set = [
                n
                for n, v in (
                    ("whenMatchedCondition", self.when_matched_condition),
                    ("whenNotMatchedCondition",
                     self.when_not_matched_condition),
                    ("whenNotMatchedBySourceCondition",
                     self.when_not_matched_by_source_condition),
                    ("whenMatchedSet", self.when_matched_set),
                    ("keepLatestBy", self.keep_latest_by),
                )
                if v
            ]
            if self.when_not_matched_by_source is not None:
                fields_set.append("whenNotMatchedBySource")
            if self.when_matched != "update":
                fields_set.append("whenMatched")
            if self.when_not_matched != "insert":
                fields_set.append("whenNotMatched")
            if fields_set:
                raise SpecError(
                    f"{fields_set} are writeMode=merge options; "
                    f"writeMode is {self.write_mode!r}"
                )
        if self.batch_size <= 0:
            raise SpecError("batchSize must be positive")
        validate_hook_sql(self.pre_sql, "preSQL")
        validate_hook_sql(self.post_sql, "postSQL")
        if not self.connection.table.name:
            raise SpecError("writer.connection.table.name is required")
        if self.versioned and self.zorder_by:
            raise SpecError(
                "zorderBy is a write-time layout for plain parquet; "
                "versioned tables re-cluster via compact(zorder=...) "
                "(OPTIMIZE ZORDER), not per-write"
            )
        if set(self.partition_by) & set(self.zorder_by):
            raise SpecError("a column cannot be both partitionBy and zorderBy")
        if self.dynamic_partition_overwrite and not self.partition_by:
            raise SpecError("dynamicPartitionOverwrite requires partitionBy")
        if (
            self.dynamic_partition_overwrite
            and self.versioned
            and self.write_mode != "overwrite"
        ):
            raise SpecError(
                "dynamicPartitionOverwrite on a versioned table requires "
                "writeMode=overwrite (it scopes the overwrite to the "
                "incoming partitions)"
            )
        if self.replace_where:
            if not self.versioned:
                raise SpecError(
                    "replaceWhere requires versioned=true (the atomic "
                    "delete-matching + insert-batch commit needs the "
                    "transaction log)"
                )
            if self.write_mode != "overwrite":
                raise SpecError(
                    "replaceWhere requires writeMode=overwrite (it scopes "
                    "the overwrite to the predicate)"
                )
            if self.dynamic_partition_overwrite:
                raise SpecError(
                    "replaceWhere and dynamicPartitionOverwrite are "
                    "mutually exclusive overwrite scopes"
                )
        if self.table_properties:
            if not self.versioned:
                raise SpecError(
                    "tableProperties requires versioned=true (TBLPROPERTIES "
                    "live in the transaction log)"
                )
            for k, v in self.table_properties.items():
                if not isinstance(k, str) or not isinstance(v, str):
                    raise SpecError(
                        f"tableProperties are string pairs; got {k!r}={v!r}"
                    )


@dataclass(frozen=True)
class CompactMaintenanceSpec:
    """One OPTIMIZE step of a maintenance job (Delta's OPTIMIZE
    [WHERE] [ZORDER BY], declaratively). ``where`` scopes WHICH files
    are re-packed via prune triples — it must extract at least one
    triple (a scope string that extracts nothing would silently widen
    to the whole table, the operational footgun this validation
    fences). Omitting ``zorder`` leaves clustering to the table's
    declared ``vt.clusterBy``, exactly like the Python API."""

    target_file_bytes: int = 128 * 1024 * 1024
    zorder: tuple[str, ...] = ()
    zorder_cells: str = "auto"
    where: str = ""
    cluster_mode: str = "auto"

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "CompactMaintenanceSpec":
        return CompactMaintenanceSpec(
            target_file_bytes=int(
                obj.get("targetFileBytes", 128 * 1024 * 1024)
            ),
            zorder=tuple(obj.get("zorder", []) or []),
            zorder_cells=obj.get("zorderCells", "auto"),
            where=obj.get("where", "") or "",
            cluster_mode=obj.get("clusterMode", "auto"),
        )

    def validate(self) -> None:
        if self.target_file_bytes < 1:
            raise SpecError(
                f"compact.targetFileBytes must be >= 1, got "
                f"{self.target_file_bytes}"
            )
        if self.cluster_mode not in ("auto", "full", "incremental"):
            raise SpecError(
                "compact.clusterMode must be auto|full|incremental, "
                f"got {self.cluster_mode!r}"
            )
        if self.zorder_cells not in ("auto", "width", "ranked"):
            raise SpecError(
                "compact.zorderCells must be auto|width|ranked, got "
                f"{self.zorder_cells!r}"
            )
        if self.where.strip() and not prune_triples_from_where(self.where):
            raise SpecError(
                f"compact.where {self.where!r} extracts no prune triple "
                "— the scope would silently widen to the whole table; "
                "use simple AND-ed col-op-literal conjuncts (or omit "
                "where for a full-table OPTIMIZE)"
            )


@dataclass(frozen=True)
class VacuumMaintenanceSpec:
    """One VACUUM step of a maintenance job. ``dryRun`` lists what the
    sweep WOULD remove (the audit step before an irreversible delete);
    ``graceSeconds`` keeps an in-flight writer's still-unreferenced
    fresh files safe exactly as the Python API does."""

    retain_last: int = 1
    retain_hours: float | None = None
    grace_seconds: float = 600.0
    dry_run: bool = False
    #: run the data-file sweep as a Spark job (the object-store path
    #: where a serial driver walk IS the cost) — vacuum(distributed=)
    distributed: bool = False
    #: scheduler hook (r16): sweep only when a dry run finds at least
    #: this many reclaimable files; below the threshold the step is a
    #: cheap no-op that SAYS SO in the report — one maintenance spec can
    #: run on a cadence idempotently without paying a sweep per tick
    if_reclaimable: int | None = None

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "VacuumMaintenanceSpec":
        rh = obj.get("retainHours")
        ir = obj.get("ifReclaimable")
        return VacuumMaintenanceSpec(
            retain_last=int(obj.get("retainLast", 1)),
            retain_hours=float(rh) if rh is not None else None,
            grace_seconds=float(obj.get("graceSeconds", 600.0)),
            dry_run=bool(obj.get("dryRun", False)),
            distributed=bool(obj.get("distributed", False)),
            if_reclaimable=int(ir) if ir is not None else None,
        )

    def validate(self) -> None:
        if self.retain_last < 1:
            raise SpecError(
                f"vacuum.retainLast must be >= 1, got {self.retain_last}"
            )
        if self.retain_hours is not None and self.retain_hours < 0:
            raise SpecError(
                f"vacuum.retainHours must be >= 0, got {self.retain_hours}"
            )
        if self.grace_seconds < 0:
            raise SpecError(
                f"vacuum.graceSeconds must be >= 0, got "
                f"{self.grace_seconds}"
            )
        if self.if_reclaimable is not None and self.if_reclaimable < 1:
            raise SpecError(
                f"vacuum.ifReclaimable must be >= 1, got "
                f"{self.if_reclaimable}"
            )
        if self.if_reclaimable is not None and self.dry_run:
            raise SpecError(
                "vacuum.ifReclaimable gates the REAL sweep; combining it "
                "with dryRun is contradictory (a dry run never sweeps)"
            )


@dataclass(frozen=True)
class CloneMaintenanceSpec:
    """One SHALLOW CLONE step (Delta's CREATE TABLE ... SHALLOW CLONE,
    declaratively): snapshot the table — optionally a historical
    version — into a new independent table at ``target``, zero data
    copied. ``target`` is the clone's full path; ``versionAsOf`` /
    ``timestampAsOf`` (exclusive) pin the snapshot."""

    target: str = ""
    version_as_of: int | None = None
    timestamp_as_of: str | None = None

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "CloneMaintenanceSpec":
        v = obj.get("versionAsOf")
        return CloneMaintenanceSpec(
            target=obj.get("target", "") or "",
            version_as_of=int(v) if v is not None else None,
            timestamp_as_of=obj.get("timestampAsOf"),
        )

    def validate(self) -> None:
        if not self.target.strip():
            raise SpecError("clone.target is required (the clone's path)")
        if self.version_as_of is not None and self.timestamp_as_of is not None:
            raise SpecError(
                "clone takes versionAsOf OR timestampAsOf, not both"
            )
        if self.version_as_of is not None and self.version_as_of < 0:
            raise SpecError(
                f"clone.versionAsOf must be >= 0, got {self.version_as_of}"
            )


@dataclass(frozen=True)
class RestoreMaintenanceSpec:
    """One RESTORE step (Delta's RESTORE TABLE ... TO VERSION AS OF):
    roll the table's CONTENT back to a retained snapshot as a NEW
    commit — history is preserved, identity/row-id high-water marks
    never roll back. Exactly one of ``version`` / ``timestamp``."""

    version: int | None = None
    timestamp: str | None = None

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "RestoreMaintenanceSpec":
        v = obj.get("version")
        return RestoreMaintenanceSpec(
            version=int(v) if v is not None else None,
            timestamp=obj.get("timestamp"),
        )

    def validate(self) -> None:
        if (self.version is None) == (self.timestamp is None):
            raise SpecError(
                "restore takes exactly one of version or timestamp"
            )
        if self.version is not None and self.version < 0:
            raise SpecError(
                f"restore.version must be >= 0, got {self.version}"
            )


@dataclass(frozen=True)
class ConvertMaintenanceSpec:
    """One CONVERT step (Delta's CONVERT TO DELTA, declaratively):
    adopt a plain-parquet directory as a versioned table IN PLACE —
    zero bytes rewritten, footer stats + merged schema into v0.
    Hive-partitioned layouts must DECLARE their partition columns;
    ``distributed`` fans the footer pass out as a Spark job (the
    10^6-file object-store shape)."""

    partition_by: tuple[str, ...] = ()
    distributed: bool = False

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "ConvertMaintenanceSpec":
        return ConvertMaintenanceSpec(
            partition_by=tuple(obj.get("partitionBy", []) or []),
            distributed=bool(obj.get("distributed", False)),
        )

    def validate(self) -> None:
        for c in self.partition_by:
            if not isinstance(c, str) or not c.strip():
                raise SpecError(
                    f"convert.partitionBy entries must be column names, "
                    f"got {c!r}"
                )


@dataclass(frozen=True)
class MaterializeSpec:
    """A declarative incremental-materialized-view job (r17): keep a
    derived table continuously equal to a row-level transform of a
    row-tracked versioned source, refreshing from the change feed —
    the reference's reader → transform → writer batch job
    (reader/job.go:122 → writer/job.go:63) restated as an incremental
    loop. See writers/materialize.py for semantics and scale shape.

        {"materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": "/lake/src_view",
            "select": ["k", "v * 2 AS v2"],
            "where": "v > 0",
            "fullRefresh": false}}

    ``select`` (optional, default all columns) lists per-row SQL
    projection expressions; ``where`` (optional) filters. Aggregates /
    joins / windows / non-deterministic expressions are refused at run
    time by a plan-shape check (their maintenance is not id-keyed).
    ``fullRefresh`` forces one rebuild.

    AGGREGATE form (r17): ``groupBy`` + ``aggregates`` instead of
    ``select`` maintains a grouped count/sum view by ±delta — inserts
    and update postimages add, deletes and update preimages subtract —
    so the refresh needs only the change feed, not row tracking:

        {"materialize": {
            "connection": ..., "target": ...,
            "groupBy": ["status"],
            "aggregates": {"n": "count(*)",
                           "qty": "sum(CAST(v AS DECIMAL(18,2)))"},
            "where": "v > 0"}}

    ``check: true`` reports staleness only — ``needs`` (none /
    incremental / rebuild) and ``behind`` (unabsorbed source +
    dimension versions) — with zero commits and zero data reads.

    Maintainable aggregates: ``count(*)``, ``count(<expr>)``
    (non-NULL values), ``sum(<expr>)``,
    ``avg(<expr>)`` (hidden sum/count state columns ride along as
    ``<name>__sum``/``<name>__cnt``), ``min(<expr>)`` and
    ``max(<expr>)`` (folded on inserts; a delete that may invalidate a
    stored extreme recomputes exactly the affected groups from the
    source). ``count(distinct ...)``/percentiles are refused —
    recompute those as ordinary queries.

    JOIN form (r17): ``join`` enriches each source row with a
    dimension lookup before the per-row select/where — the classic
    fact-enrichment pipeline kept incrementally true from BOTH change
    feeds (source changes refresh by row id; dimension changes
    recompute only the source rows holding affected join keys):

        {"materialize": {
            "connection": ..., "target": ...,
            "join": {"connection": {"url": root,
                                    "table": {"name": "dim"}},
                     "on": ["k"], "how": "left",
                     "select": ["k", "name"]},
            "select": ["f_val", "name AS dim_name"]}}

    ``join.connection.url`` defaults to the source's url; ``how`` is
    ``left`` (unmatched rows keep NULL dim columns) or ``inner``
    (unmatched rows leave the view); ``join.select`` projects the
    dimension BEFORE the join (must carry the ``on`` keys; default all
    columns). The dimension must be unique on the join keys. A join
    cannot combine with groupBy/aggregates — stack an aggregate view
    on top of the enriched view instead."""

    connection: ConnectionSpec
    target: str
    select: tuple[str, ...] = ()
    where: str = ""
    full_refresh: bool = False
    group_by: tuple[str, ...] = ()
    aggregates: tuple[tuple[str, str], ...] = ()
    join: "MaterializeJoinSpec | None" = None
    #: report staleness only — what the next refresh WOULD do (none/
    #: incremental/rebuild) and how many versions behind the view is,
    #: without touching any data (metadata + plan analysis only)
    check: bool = False

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "MaterializeSpec":
        sel = obj.get("select", []) or []
        if isinstance(sel, str):
            sel = [sel]
        gby = obj.get("groupBy", []) or []
        if isinstance(gby, str):
            gby = [gby]
        aggs = obj.get("aggregates", {}) or {}
        join = obj.get("join", None)
        spec = MaterializeSpec(
            connection=ConnectionSpec.from_json(
                obj.get("connection", {}) or {}
            ),
            target=str(obj.get("target", "") or ""),
            select=tuple(str(s) for s in sel),
            where=str(obj.get("where", "") or ""),
            full_refresh=bool(obj.get("fullRefresh", False)),
            check=bool(obj.get("check", False)),
            group_by=tuple(str(c) for c in gby),
            aggregates=tuple(
                (str(k), str(v)) for k, v in sorted(aggs.items())
            ),
            join=(
                None
                if join is None
                else MaterializeJoinSpec.from_json(join)
            ),
        )
        spec.validate()
        return spec

    def validate(self) -> None:
        if not self.connection.url or not self.connection.table.name:
            raise SpecError(
                "materialize needs connection.url and connection.table."
                "name (the source table)"
            )
        if not self.target:
            raise SpecError(
                "materialize needs target (the view table's path)"
            )
        for s in self.select:
            if not s.strip():
                raise SpecError(
                    "materialize select entries must be non-empty SQL "
                    "expressions"
                )
        if bool(self.group_by) != bool(self.aggregates):
            raise SpecError(
                "materialize groupBy and aggregates come together "
                "(the aggregate form needs both)"
            )
        if self.group_by and self.select:
            raise SpecError(
                "materialize takes select (row-level view) OR "
                "groupBy+aggregates (aggregate view), not both"
            )
        for c in self.group_by:
            if not c.strip():
                raise SpecError(
                    "materialize groupBy entries must be column names"
                )
        for name, agg in self.aggregates:
            if not name.strip() or not agg.strip():
                raise SpecError(
                    "materialize aggregates map non-empty output names "
                    "to count(*)/sum(expr) specs"
                )
        if self.join is not None and self.group_by:
            raise SpecError(
                "materialize join cannot combine with groupBy/"
                "aggregates — materialize the enriched row-level view, "
                "then stack an aggregate view on top of it"
            )


@dataclass(frozen=True)
class MaterializeJoinSpec:
    """The dimension side of a materialize join (see MaterializeSpec):
    which table, the equi-join keys, the join shape, and an optional
    dimension-side projection applied BEFORE the join."""

    table: str
    url: str = ""
    on: tuple[str, ...] = ()
    how: str = "left"
    select: tuple[str, ...] = ()

    @staticmethod
    def from_json(obj: Any) -> "MaterializeJoinSpec":
        if not isinstance(obj, dict):
            raise SpecError(
                "materialize join must be an object with connection/"
                "on/how/select"
            )
        conn = obj.get("connection", {}) or {}
        table = str(((conn.get("table", {}) or {}).get("name", "")) or "")
        on = obj.get("on", []) or []
        if isinstance(on, str):
            on = [on]
        sel = obj.get("select", []) or []
        if isinstance(sel, str):
            sel = [sel]
        spec = MaterializeJoinSpec(
            table=table,
            url=str(conn.get("url", "") or ""),
            on=tuple(str(c) for c in on),
            how=str(obj.get("how", "left") or "left").lower(),
            select=tuple(str(s) for s in sel),
        )
        if not spec.table:
            raise SpecError(
                "materialize join needs connection.table.name (the "
                "dimension table)"
            )
        if not spec.on or any(not c.strip() for c in spec.on):
            raise SpecError(
                "materialize join needs on: the non-empty equi-join "
                "key column names"
            )
        if spec.how not in ("left", "inner"):
            raise SpecError(
                f"materialize join how must be 'left' or 'inner', "
                f"got {spec.how!r}"
            )
        for s in spec.select:
            if not s.strip():
                raise SpecError(
                    "materialize join select entries must be non-empty "
                    "SQL expressions"
                )
        return spec


@dataclass(frozen=True)
class MaintenanceSpec:
    """A declarative table-maintenance job (r15, extended r16): the
    lakehouse scheduler's surface for the versioned layer's lifecycle
    operations — the reference's job-spec shape (writer/job.go:63-93's
    declared lifecycle hooks) extended to table maintenance, as Delta
    exposes OPTIMIZE/VACUUM/RESTORE/CLONE/CONVERT through SQL. Steps
    run in the fixed documented order

        convert → restore → enableRowTracking → compact → checkpoint
        → clone → vacuum

    : convert first (it CREATES the log a plain directory lacks),
    restore before layout work (compaction should pack the restored
    content), row-tracking enablement before compact (the backfill
    rewrite is itself compactable), checkpoint after compact (capture
    the packed snapshot), clone before vacuum (the clone references
    live files; reclaiming first would race it), vacuum last. The
    ordering alone does NOT make a historical clone vacuum-safe — a
    shallow clone of a version outside retention references files the
    sweep would otherwise reclaim — so the vacuum step additionally
    protects the just-cloned version's file set (run_maintenance
    passes it as the vacuum's ``protect_files``). The protection is
    per-job: a LATER vacuum can still reclaim a shallow clone's
    source files — Delta's documented source-vacuum caveat; compact
    the clone to materialize it fully local."""

    connection: ConnectionSpec
    compact: CompactMaintenanceSpec | None = None
    vacuum: VacuumMaintenanceSpec | None = None
    checkpoint: bool = False
    clone: CloneMaintenanceSpec | None = None
    restore: RestoreMaintenanceSpec | None = None
    convert: ConvertMaintenanceSpec | None = None
    enable_row_tracking: bool = False

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "MaintenanceSpec":
        spec = MaintenanceSpec(
            connection=ConnectionSpec.from_json(
                obj.get("connection", {}) or {}
            ),
            compact=(
                CompactMaintenanceSpec.from_json(obj["compact"])
                if obj.get("compact") is not None
                else None
            ),
            vacuum=(
                VacuumMaintenanceSpec.from_json(obj["vacuum"])
                if obj.get("vacuum") is not None
                else None
            ),
            checkpoint=bool(obj.get("checkpoint", False)),
            clone=(
                CloneMaintenanceSpec.from_json(obj["clone"])
                if obj.get("clone") is not None
                else None
            ),
            restore=(
                RestoreMaintenanceSpec.from_json(obj["restore"])
                if obj.get("restore") is not None
                else None
            ),
            convert=(
                ConvertMaintenanceSpec.from_json(obj["convert"])
                if obj.get("convert") is not None
                else None
            ),
            enable_row_tracking=bool(obj.get("enableRowTracking", False)),
        )
        spec.validate()
        return spec

    def validate(self) -> None:
        if not self.connection.url or not self.connection.table.name:
            raise SpecError(
                "maintenance needs connection.url and connection.table."
                "name (the versioned table to maintain)"
            )
        if (
            self.compact is None
            and self.vacuum is None
            and not self.checkpoint
            and self.clone is None
            and self.restore is None
            and self.convert is None
            and not self.enable_row_tracking
        ):
            raise SpecError(
                "maintenance declares no step: pass at least one of "
                "compact, vacuum, checkpoint, clone, restore, convert, "
                "enableRowTracking"
            )
        if self.compact is not None:
            self.compact.validate()
        if self.vacuum is not None:
            self.vacuum.validate()
        if self.clone is not None:
            self.clone.validate()
        if self.restore is not None:
            self.restore.validate()
        if self.convert is not None:
            self.convert.validate()


@dataclass(frozen=True)
class JobSpec:
    """A full reader→writer job — or a maintenance job."""

    reader: ReaderSpec
    writer: WriterSpec | None = None
    parallelism: int = 4
    maintenance: MaintenanceSpec | None = None
    materialize: MaterializeSpec | None = None
    pipeline: "PipelineSpec | None" = None

    @staticmethod
    def from_json(obj: dict[str, Any] | str) -> "JobSpec":
        if isinstance(obj, str):
            obj = json.loads(obj)
        pipe_obj = obj.get("pipeline")
        if pipe_obj is not None:
            if (
                obj.get("reader")
                or obj.get("writer")
                or obj.get("maintenance")
                or obj.get("materialize")
            ):
                raise SpecError(
                    "a pipeline job stands alone: its steps carry "
                    "their own readers/writers"
                )
            pipe = PipelineSpec.from_json(pipe_obj)
            return JobSpec(
                # placeholder reader, never planned: run_job dispatches
                # on pipeline before plan_read
                reader=pipe.steps[0].reader,
                pipeline=pipe,
            )
        mat_obj = obj.get("materialize")
        if mat_obj is not None:
            if obj.get("reader") or obj.get("writer") or obj.get(
                "maintenance"
            ):
                raise SpecError(
                    "a materialize job stands alone: the view definition "
                    "IS its reader and writer"
                )
            mat = MaterializeSpec.from_json(mat_obj)
            return JobSpec(
                # placeholder reader, never planned: run_job dispatches
                # on materialize before plan_read
                reader=ReaderSpec.from_json(
                    {
                        "column": ["*"],
                        "connection": {
                            "url": mat.connection.url,
                            "table": {"name": mat.connection.table.name},
                        },
                    }
                ),
                materialize=mat,
            )
        maint_obj = obj.get("maintenance")
        if maint_obj is not None:
            if obj.get("reader") or obj.get("writer"):
                raise SpecError(
                    "a maintenance job stands alone: it has no reader "
                    "or writer (layout work moves no rows)"
                )
            maint = MaintenanceSpec.from_json(maint_obj)
            return JobSpec(
                # placeholder reader, never planned: run_job dispatches on
                # maintenance before plan_read
                reader=ReaderSpec.from_json(
                    {
                        "column": ["*"],
                        "connection": {
                            "url": maint.connection.url,
                            "table": {"name": maint.connection.table.name},
                        },
                    }
                ),
                maintenance=maint,
            )
        reader = ReaderSpec.from_json(obj.get("reader", {}) or {})
        writer_obj = obj.get("writer")
        writer = WriterSpec.from_json(writer_obj) if writer_obj else None
        return JobSpec(
            reader=reader,
            writer=writer,
            parallelism=int(obj.get("parallelism", 4)),
        )


@dataclass(frozen=True)
class PipelineSpec:
    """A declarative multi-step job (r17): one spec running ingest →
    view refreshes → maintenance with the view refreshes auto-ordered
    by their data dependencies — the reference's reader → writer job
    chain (reader/job.go:122 → writer/job.go:63) kept as ONE runnable
    document instead of N cron entries whose order the operator must
    get right by hand:

        {"pipeline": [
            {"materialize": {... target: /lake/by_name ...,
                             connection.table: enriched}},
            {"materialize": {... target: /lake/enriched ...}},
            {"maintenance": {... compact/vacuum ...}},
            {"reader": {...}, "writer": {...}}]}

    Execution order is three phases: (1) reader→writer ingest steps in
    declared order, (2) materialize steps in DEPENDENCY order — a view
    reading another step's target refreshes after it, computed by a
    stable topological sort over target → source/dimension edges
    (declared order breaks ties; a cycle is refused by name), (3)
    maintenance steps in declared order. The example above runs the
    enriched view BEFORE by_name even though it is declared after.
    Two steps writing the same view target are refused. Pipelines do
    not nest."""

    steps: tuple[JobSpec, ...]

    @staticmethod
    def from_json(obj: Any) -> "PipelineSpec":
        if not isinstance(obj, (list, tuple)) or not obj:
            raise SpecError(
                "pipeline must be a non-empty list of job objects"
            )
        steps = []
        for i, o in enumerate(obj):
            if not isinstance(o, dict):
                raise SpecError(f"pipeline step {i} must be a job object")
            if o.get("pipeline") is not None:
                raise SpecError("pipelines do not nest")
            st = JobSpec.from_json(o)
            if (
                st.materialize is None
                and st.maintenance is None
                and st.writer is None
            ):
                raise SpecError(
                    f"pipeline step {i} is a reader with no writer — "
                    f"its DataFrame would have no consumer; every step "
                    f"must write, refresh or maintain"
                )
            steps.append(st)
        return PipelineSpec(steps=_pipeline_order(steps))


def _pipeline_order(steps: list["JobSpec"]) -> tuple["JobSpec", ...]:
    """ingest first (declared order), then materialize steps in stable
    topological order over target → source/dim edges, then maintenance
    (declared order). Pure path arithmetic — no Spark, no I/O."""
    ingest = [
        s
        for s in steps
        if s.materialize is None and s.maintenance is None
    ]
    mats = [s for s in steps if s.materialize is not None]
    maints = [s for s in steps if s.maintenance is not None]
    targets: dict[str, "JobSpec"] = {}
    for s in mats:
        t = os.path.normpath(s.materialize.target)
        if t in targets:
            raise SpecError(
                f"pipeline: two materialize steps write the same "
                f"target {t!r}"
            )
        targets[t] = s

    def deps(s: "JobSpec") -> list[str]:
        m = s.materialize
        out = [
            os.path.normpath(
                os.path.join(m.connection.url, m.connection.table.name)
            )
        ]
        if m.join is not None:
            root = m.join.url or m.connection.url
            out.append(os.path.normpath(os.path.join(root, m.join.table)))
        return [d for d in out if d in targets]

    ordered: list["JobSpec"] = []
    placed: set[str] = set()
    remaining = list(mats)
    while remaining:
        progressed = False
        for s in list(remaining):
            if all(d in placed for d in deps(s)):
                ordered.append(s)
                placed.add(os.path.normpath(s.materialize.target))
                remaining.remove(s)
                progressed = True
        if not progressed:
            names = sorted(s.materialize.target for s in remaining)
            raise SpecError(
                f"pipeline: materialize dependency cycle among {names}"
            )
    return tuple(ingest + ordered + maints)


# -- where → prune triples ---------------------------------------------------

#: one regex pass tokenizes the WHERE surface the extractor understands;
#: any character it cannot tokenize makes the whole string unparseable
#: (→ no pruning, full-filter semantics — never a wrong answer)
_WHERE_TOKEN = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<qid>`[^`]+`)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<op><=|>=|<>|!=|==|[=<>])
    | (?P<punct>[(),.+\-])
    """,
    re.VERBOSE,
)

_WHERE_KEYWORDS = frozenset(
    {
        "and", "or", "not", "in", "is", "null", "between",
        "true", "false", "date", "timestamp", "like",
    }
)

#: a < lit mirrored to lit > a (and '==' normalized to '=')
_FLIP_OP = {"=": "=", "==": "=", "<": ">", "<=": ">=", ">": "<", ">=": "<="}


def _tokenize_where(where: str) -> list[tuple[str, str]] | None:
    """(kind, text) tokens, or None when any character fails to lex.
    kinds: str num ident kw op punct."""
    toks: list[tuple[str, str]] = []
    pos = 0
    for m in _WHERE_TOKEN.finditer(where):
        if m.start() != pos:
            return None  # unlexable character — give up on pruning
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if m.lastgroup == "word":
            low = text.lower()
            if low in _WHERE_KEYWORDS:
                toks.append(("kw", low))
            else:
                toks.append(("ident", text))
        elif m.lastgroup == "qid":
            toks.append(("ident", text[1:-1]))
        else:
            toks.append((m.lastgroup, text))
    if pos != len(where):
        return None
    return toks


def _split_conjuncts(
    toks: list[tuple[str, str]],
) -> list[list[tuple[str, str]]] | None:
    """Split on depth-0 ANDs (an AND owed to a depth-0 BETWEEN stays
    inside its conjunct). None on unbalanced parens — or on a depth-0
    OR: AND binds tighter than OR, so ``a=1 OR b=2 AND c=3`` is a
    DISJUNCTION and none of its pieces is implied by the whole
    predicate; extracting any triple there would prune wrongly."""
    out: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    depth = 0
    between_owed = 0
    for t in toks:
        if t == ("punct", "("):
            depth += 1
        elif t == ("punct", ")"):
            depth -= 1
            if depth < 0:
                return None
        elif depth == 0 and t == ("kw", "or"):
            return None
        elif depth == 0 and t == ("kw", "between"):
            between_owed += 1
        elif depth == 0 and t == ("kw", "and"):
            if between_owed:
                between_owed -= 1
            else:
                out.append(cur)
                cur = []
                continue
        cur.append(t)
    if depth != 0:
        return None
    out.append(cur)
    return out


def _strip_wrapping_parens(
    toks: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    while (
        len(toks) >= 2
        and toks[0] == ("punct", "(")
        and toks[-1] == ("punct", ")")
    ):
        depth = 0
        wraps = True
        for i, t in enumerate(toks):
            if t == ("punct", "("):
                depth += 1
            elif t == ("punct", ")"):
                depth -= 1
                if depth == 0 and i != len(toks) - 1:
                    wraps = False  # e.g. (a=1) AND-free "(a=1)or(b=2)"
                    break
        if not wraps:
            return toks
        toks = toks[1:-1]
    return toks


def _parse_literal(
    toks: list[tuple[str, str]], i: int
) -> tuple[object, int] | None:
    """Literal starting at ``i`` → (python value, next index), or None."""
    if i >= len(toks):
        return None
    kind, text = toks[i]
    if kind == "str":
        return text[1:-1].replace("''", "'"), i + 1
    if kind == "num":
        v = float(text) if ("." in text or "e" in text.lower()) else int(text)
        return v, i + 1
    if kind == "kw" and text in ("true", "false"):
        return text == "true", i + 1
    if kind == "kw" and text in ("date", "timestamp"):
        # DATE '2024-01-01' — the ISO string compares correctly against
        # string-typed bounds, and date/timestamp columns carry no
        # manifest bounds anyway (lossy types are never recorded)
        if i + 1 < len(toks) and toks[i + 1][0] == "str":
            return toks[i + 1][1][1:-1].replace("''", "'"), i + 2
        return None
    if kind == "punct" and text in ("-", "+") and i + 1 < len(toks):
        nk, nt = toks[i + 1]
        if nk == "num":
            v = float(nt) if ("." in nt or "e" in nt.lower()) else int(nt)
            return (-v if text == "-" else v), i + 2
    return None


#: one past the last Unicode code point — a prefix ending here has no
#: "next string", so a LIKE range gets no upper bound
_MAX_CODEPOINT = chr(0x10FFFF)


def _like_prefix_triples(
    col: str, pattern: str
) -> list[tuple[str, str, object]]:
    """Triples IMPLIED by ``col LIKE pattern`` (Delta derives the same
    range from its startsWith filters). Every match of ``'abc%...'``
    starts with ``'abc'``, so it sorts in ``['abc', 'abd')`` — code-point
    order, which is also UTF-8 byte order, so Python-side bound math
    agrees with Spark's binary string comparison. Conservative rules:

    * a backslash anywhere disables extraction — engines disagree on the
      default escape (Spark treats ``\\%`` as a literal percent, ANSI
      LIKE has no default escape), and a wrong guess would prune files
      that hold matches;
    * no wildcard at all → plain equality;
    * otherwise the constant prefix before the FIRST wildcard bounds the
      range (chars after a ``_`` still imply the prefix); a leading
      wildcard (``'%foo'``) has no prefix and extracts nothing;
    * no upper triple when the prefix's last char is the maximum code
      point (there is no next string at that position)."""
    if "\\" in pattern:
        return []
    cut = len(pattern)
    for wc in ("%", "_"):
        j = pattern.find(wc)
        if j != -1:
            cut = min(cut, j)
    if cut == len(pattern):
        return [(col, "=", pattern)]
    prefix = pattern[:cut]
    if not prefix:
        return []
    out: list[tuple[str, str, object]] = [(col, ">=", prefix)]
    if prefix[-1] != _MAX_CODEPOINT:
        nxt = ord(prefix[-1]) + 1
        if 0xD800 <= nxt <= 0xDFFF:
            # skip the surrogate block: U+D7FF + 1 would be a lone
            # surrogate, which UTF-8 (and Py4J, should the triple ever
            # reach a Spark literal) cannot encode; U+E000 is the next
            # real code point and the bound stays conservative (wider)
            nxt = 0xE000
        out.append((col, "<", prefix[:-1] + chr(nxt)))
    return out


def _parse_conjunct(
    toks: list[tuple[str, str]],
) -> list[tuple[str, str, object]]:
    """One conjunct → its prune triples ([] when not a simple predicate)."""
    toks = _strip_wrapping_parens(toks)
    if not toks:
        return []
    # col LIKE 'pattern' — constant prefix → range triples. Exactly the
    # three-token shape: NOT LIKE has ("kw","not") at [1] and falls
    # through; an ESCAPE clause leaves trailing tokens and falls through.
    if (
        toks[0][0] == "ident"
        and len(toks) == 3
        and toks[1] == ("kw", "like")
        and toks[2][0] == "str"
    ):
        pat = toks[2][1][1:-1].replace("''", "'")
        return _like_prefix_triples(toks[0][1], pat)
    # col op literal
    if toks[0][0] == "ident" and len(toks) >= 3 and toks[1][0] == "op":
        op = toks[1][1]
        if op in ("<>", "!="):
            return []  # min/max cannot prune ≠
        lit = _parse_literal(toks, 2)
        if lit is not None and lit[1] == len(toks):
            return [(toks[0][1], "=" if op == "==" else op, lit[0])]
    # literal op col  (mirrored)
    lit = _parse_literal(toks, 0)
    if (
        lit is not None
        and lit[1] + 2 == len(toks)
        and toks[lit[1]][0] == "op"
        and toks[lit[1] + 1][0] == "ident"
    ):
        op = toks[lit[1]][1]
        if op in ("<>", "!="):
            return []
        return [(toks[lit[1] + 1][1], _FLIP_OP[op], lit[0])]
    # col IS [NOT] NULL
    if toks[0][0] == "ident" and len(toks) >= 3 and toks[1] == ("kw", "is"):
        rest = toks[2:]
        if rest == [("kw", "null")]:
            return [(toks[0][1], "isnull", None)]
        if rest == [("kw", "not"), ("kw", "null")]:
            return [(toks[0][1], "notnull", None)]
        return []
    # col IN (lit, lit, ...)
    if (
        toks[0][0] == "ident"
        and len(toks) >= 4
        and toks[1] == ("kw", "in")
        and toks[2] == ("punct", "(")
        and toks[-1] == ("punct", ")")
    ):
        vals: list[object] = []
        i = 3
        while True:
            lit = _parse_literal(toks, i)
            if lit is None:
                return []
            vals.append(lit[0])
            i = lit[1]
            if i == len(toks) - 1:
                return [(toks[0][1], "in", vals)]
            if toks[i] != ("punct", ","):
                return []
            i += 1
    # col BETWEEN lit AND lit  →  two range triples
    if (
        toks[0][0] == "ident"
        and len(toks) >= 5
        and toks[1] == ("kw", "between")
    ):
        lo = _parse_literal(toks, 2)
        if lo is None or lo[1] >= len(toks) or toks[lo[1]] != ("kw", "and"):
            return []
        hi = _parse_literal(toks, lo[1] + 1)
        if hi is None or hi[1] != len(toks):
            return []
        return [(toks[0][1], ">=", lo[0]), (toks[0][1], "<=", hi[0])]
    return []


def prune_triples_from_where(
    where: str,
) -> list[tuple[str, str, object]]:
    """Best-effort extraction of manifest-prunable ``(col, op, literal)``
    triples from a SQL WHERE string — what lets a spec-driven job over a
    versioned table skip files from the stats manifest instead of paying
    the full listing (the reference's declarative surface reaching the
    skipping machinery; Delta does the same from its DataFrame filters).

    Only simple top-level conjuncts are extracted: ``col op literal``
    (either side), ``col IS [NOT] NULL``, ``col IN (literals)``,
    ``col BETWEEN a AND b``. Everything else — OR trees, function calls,
    column-to-column comparisons, subqueries — contributes NO triple and
    falls through to the plain filter. A returned triple is always
    IMPLIED by the full predicate (it is one of its AND-conjuncts), so
    skipping with the triples while filtering with the full ``where`` is
    conservative-correct by construction: pruning can only drop files no
    satisfying row can live in."""
    if not where or not where.strip():
        return []
    toks = _tokenize_where(where)
    if toks is None:
        return []
    conjuncts = _split_conjuncts(toks)
    if conjuncts is None:
        return []
    out: list[tuple[str, str, object]] = []
    for c in conjuncts:
        out.extend(_parse_conjunct(c))
    return out

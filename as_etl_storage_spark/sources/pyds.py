"""Spark 4 Python DataSource exposing the reference's range-split reader.

The reference's reader job computes N key ranges and emits one task config
per range (`database/dbms/reader/job.go:122-187`, split arithmetic
`database/dbms/reader/split.go:361-391`); here the SAME ported arithmetic
(plans/split.do_split) drives Spark's official Python DataSource extension
API: ``partitions()`` returns one InputPartition per computed range, and
every executor task scans only its range via a pyarrow predicate — the
reference's split-parallel read expressed as a first-class Spark source
(`spark.read.format("rangesplit")``).

Design choices that keep it scale-honest:
  * min/max split bounds come from parquet ROW-GROUP STATISTICS (footer
    metadata), not a data scan — the S12 min/max discovery at zero read
    cost (the reference must issue `select min(k), max(k)` to the DB).
  * each partition reads with a pyarrow dataset filter, so row groups
    wholly outside the range are skipped by the same footer stats —
    predicate pushdown inside the custom source.
  * `columns` option projects at the scan (reference P1).
Arrow batches flow straight to the JVM (no per-row Python); remaining
cost vs the native reader is the Python worker hop, which is why this is
a parity/extensibility surface, not the default path.
"""

from __future__ import annotations

from as_etl_storage_spark.plans.split import do_split
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

#: comparison filters the scan can evaluate natively via pyarrow dataset
#: expressions (single-column attributes only)
_PUSHABLE = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNull,
    IsNotNull,
)

_PA_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
}


def _json_default(v):
    """json.dumps serializer for Spark column values it cannot handle
    natively: timestamp/date → ISO strings, decimal → string (exact, no
    float rounding), binary → hex. Without this a single timestamp
    column crashes every jsonaudit write task with TypeError. Shared by
    the streaming and batch writers (module-level so the batch class,
    which borrows the stream ``write`` method, resolves it too)."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _data_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def _key_bounds(path: str, key: str) -> tuple[int, int]:
    """Global [min, max] of ``key`` from parquet footer statistics only."""
    import pyarrow.parquet as pq

    lo = hi = None
    for f in _data_files(path):
        md = pq.ParquetFile(f).metadata
        if md.num_row_groups == 0:
            continue
        # row_group(...).column(i) takes the parquet LEAF column index,
        # which diverges from the Arrow top-level field index as soon as
        # any nested/struct column precedes the key — resolve by leaf
        # path instead (path_in_schema equals the column name for the
        # flat key columns this source supports)
        leaf_paths = [
            md.row_group(0).column(i).path_in_schema
            for i in range(md.num_columns)
        ]
        try:
            idx = leaf_paths.index(key)
        except ValueError:
            raise ValueError(
                f"rangesplit: split key {key!r} not found among parquet "
                f"leaf columns {leaf_paths} in {f}"
            ) from None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:  # pragma: no cover
                raise ValueError(f"no row-group stats for {key} in {f}")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:  # pragma: no cover
        raise ValueError(f"no data files under {path}")
    return int(lo), int(hi)


class RangeSplit(InputPartition):
    def __init__(self, lo: int, hi: int, closed: bool):
        self.lo, self.hi, self.closed = lo, hi, closed


class RangeSplitReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.key = options.get("key", "id")
        self.num = int(options.get("num", "8"))
        cols = options.get("columns", "")
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        self.pushed = []

    def pushFilters(self, filters):
        """Predicate pushdown through the official API (reference P2: the
        `where` string rendered into the scan SQL, reader/parameter.go:
        115-118): comparison filters are kept and evaluated inside the
        pyarrow scan — row groups whose footer stats exclude the predicate
        are never read. Anything else is returned for Spark to apply."""
        for flt in filters:
            if isinstance(flt, _PUSHABLE) and len(flt.attribute) == 1:
                self.pushed.append(flt)
            else:
                yield flt

    def _pushed_expr(self):
        import pyarrow.dataset as ds

        expr = None
        for flt in self.pushed:
            f = ds.field(flt.attribute[0])
            if isinstance(flt, EqualTo):
                e = f == flt.value
            elif isinstance(flt, GreaterThan):
                e = f > flt.value
            elif isinstance(flt, GreaterThanOrEqual):
                e = f >= flt.value
            elif isinstance(flt, LessThan):
                e = f < flt.value
            elif isinstance(flt, LessThanOrEqual):
                e = f <= flt.value
            elif isinstance(flt, In):
                e = f.isin(list(flt.value))
            elif isinstance(flt, IsNull):
                e = f.is_null()
            else:  # IsNotNull
                e = ~f.is_null()
            expr = e if expr is None else expr & e
        return expr

    def partitions(self):
        lo, hi = _key_bounds(self.path, self.key)
        pairs = do_split(lo, hi, self.num)
        return [
            RangeSplit(a, b, i == len(pairs) - 1)
            for i, (a, b) in enumerate(pairs)
        ]

    def read(self, partition: RangeSplit):
        import pyarrow.dataset as ds

        f = ds.field(self.key)
        upper = (f <= partition.hi) if partition.closed else (f < partition.hi)
        filt = (f >= partition.lo) & upper
        pushed = self._pushed_expr()
        if pushed is not None:
            filt = filt & pushed
        scanner = ds.dataset(_data_files(self.path)).scanner(
            columns=self.columns, filter=filt
        )
        yield from scanner.to_batches()


class RangeSplitDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rangesplit"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        sch = pq.read_schema(_data_files(self.options["path"])[0])
        cols = self.options.get("columns", "")
        names = [c.strip() for c in cols.split(",") if c.strip()] or sch.names
        fields = []
        for n in names:
            t = str(sch.field(n).type)
            if t not in _PA_TO_DDL:
                raise ValueError(
                    f"rangesplit: unsupported column type {t!r} for {n!r}; "
                    f"project it out via the 'columns' option"
                )
            fields.append(f"{n} {_PA_TO_DDL[t]}")
        return ", ".join(fields)

    def reader(self, schema) -> DataSourceReader:
        return RangeSplitReader(self.options)


class _Replay:
    """Shared row access for the replay stream: the parquet table sorted by
    the key column, loaded lazily once per reader instance."""

    def __init__(self, options):
        self.path = options["path"]
        self.key = options.get("key", "doc_id")
        self.batch_rows = int(options.get("batchrows", "200"))
        self._rows = None

    def rows(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self.path)
            t = t.sort_by(self.key)
            self._rows = list(zip(*(t.column(n).to_pylist() for n in t.column_names)))
        return self._rows


class DocReplayStreamReader(SimpleDataSourceStreamReader, _Replay):
    """Offset-managed replay of a parquet table as a stream, ``batchrows``
    rows per micro-batch in key order. The offset is the absolute row
    position — readBetweenOffsets replays any window exactly, which is
    what gives checkpoint recovery the same rows after a crash (the
    reference's record channel, batch_writer.go:159-261, has no such
    replay: a crashed batch is simply lost upstream)."""

    def __init__(self, options):
        _Replay.__init__(self, options)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        rows = self.rows()
        lo = start["pos"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self.rows()[start["pos"] : end["pos"]])


class DocReplayDataSource(DataSource):
    """``spark.readStream.format("docreplay")`` — a Python streaming
    source with deterministic offsets over a parquet fixture; the
    micro-batch accumulator surface (SURVEY W6) expressed through the
    Spark 4 Python streaming DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "docreplay"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        sch = pq.read_schema(_data_files(self.options["path"])[0])
        fields = []
        for n in sch.names:
            t = str(sch.field(n).type)
            if t not in _PA_TO_DDL:
                # same actionable error as RangeSplitDataSource.schema,
                # not a bare KeyError
                raise ValueError(
                    f"docreplay: unsupported column type {t!r} for {n!r}; "
                    f"materialize a fixture without that column"
                )
            fields.append(f"{n} {_PA_TO_DDL[t]}")
        return ", ".join(fields)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return DocReplayStreamReader(self.options)


class _Committed(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path, self.n = path, n


class JsonAuditStreamWriter(DataSourceStreamWriter):
    """Streaming sink with an explicit two-phase commit: every partition
    task writes its rows to a uniquely-named JSON-lines data file and
    returns a commit message; ``commit()`` atomically appends one
    manifest line per micro-batch listing exactly the committed files,
    ``abort()`` deletes the orphans. Readers resolve the table through
    the manifest ONLY, so uncommitted/aborted files are invisible —
    the transactional batch-write protocol (reference W5: BatchExec*
    with transaction modes, database/db.go:203-236) restated as
    manifest-commit, which is also precisely how the versioned writer
    (writers/versioned.py) and every log-structured table format get
    atomicity out of a non-transactional store."""

    def __init__(self, options):
        self.outdir = options["outdir"]

    def write(self, iterator) -> "_Committed":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        os.makedirs(os.path.join(self.outdir, "data"), exist_ok=True)
        name = f"b-p{part:03d}-{uuid.uuid4().hex[:12]}.jsonl"
        path = os.path.join(self.outdir, "data", name)
        n = 0
        with open(path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(row.asDict(), default=_json_default) + "\n"
                )
                n += 1
        return _Committed(path, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = os.path.join(self.outdir, "manifest.jsonl")
        entry = {
            "batch": batchId,
            "files": [m.path for m in messages if m is not None and m.n > 0],
            "rows": sum(m.n for m in messages if m is not None),
        }
        # atomic append: single write() of one line on a local fs
        with open(manifest, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(entry) + "\n")
        for m in messages:
            if m is not None and m.n == 0:
                os.remove(m.path)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonAuditDataSource(DataSource):
    """``df.writeStream.format("jsonaudit")`` — manifest-committed
    JSON-lines sink (see JsonAuditStreamWriter)."""

    @classmethod
    def name(cls) -> str:
        return "jsonaudit"

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return JsonAuditStreamWriter(self.options)

    def writer(self, schema, overwrite: bool):
        return JsonAuditBatchWriter(self.options, overwrite)


def read_json_audit(spark, outdir: str):
    """Load a jsonaudit table: manifest-listed files only. A batch
    replayed after checkpoint recovery appends a SECOND manifest line for
    the same batch id (commit() is append-only by design); keeping the
    LAST entry per batch id makes the replay invisible to readers — the
    replacement, not the union, is the committed state."""
    import json
    import os

    manifest = os.path.join(outdir, "manifest.jsonl")
    by_batch: dict = {}
    if os.path.exists(manifest):
        with open(manifest, encoding="utf-8") as fh:
            for line in fh:
                entry = json.loads(line)
                by_batch[entry["batch"]] = entry["files"]
    # insertion order, NOT sorted(): stream batches use int ids and batch
    # writes use string tokens — sorting mixed keys is a TypeError
    files = [f for fs in by_batch.values() for f in fs]
    if not files:
        raise ValueError(f"no committed batches under {outdir}")
    return spark.read.json(files)


class JsonAuditBatchWriter(DataSourceWriter):
    """Batch counterpart of JsonAuditStreamWriter — the reference's
    multi-row INSERT (W1, database/table.go:156-214) through the official
    batch write API, with the same two-phase manifest commit: partition
    tasks write uniquely-named data files, commit() appends one atomic
    manifest line (batch id -1 = batch write), abort() removes orphans.
    A failed job therefore leaves data files but never a manifest entry —
    readers see the previous committed state, exactly the writer
    atomicity the reference gets from database transactions."""

    def __init__(self, options, overwrite: bool):
        self.outdir = options["outdir"]
        self.overwrite = overwrite

    # partition-task side is identical to the streaming writer
    write = JsonAuditStreamWriter.write

    def commit(self, messages) -> None:
        import json
        import os
        import uuid

        manifest = os.path.join(self.outdir, "manifest.jsonl")
        entry = {
            # unique token per batch write: a constant id would make the
            # last-entry-per-batch replay dedup in read_json_audit hide
            # every EARLIER append-mode batch (silent data loss); stream
            # batches keep their integer ids so replays still dedupe
            "batch": f"batch-{uuid.uuid4().hex[:12]}",
            "files": [m.path for m in messages if m is not None and m.n > 0],
            "rows": sum(m.n for m in messages if m is not None),
        }
        mode = "w" if self.overwrite else "a"
        with open(manifest, mode, encoding="utf-8") as fh:
            fh.write(json.dumps(entry) + "\n")
        for m in messages:
            if m is not None and m.n == 0:
                os.remove(m.path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def ensure_worker_importable() -> None:
    """Delegates to pickle_safety.ensure_worker_importable (kept here for
    the call sites that register pyds sources explicitly)."""
    from as_etl_storage_spark.pickle_safety import (
        ensure_worker_importable as _ensure,
    )

    _ensure()


# --------------------------------- versioned-table CDC streaming source ---
#: extra arrow->DDL entries the CDC source accepts beyond _PA_TO_DDL (the
#: versioned tables it tails routinely carry event-time columns)
_CDC_PA_TO_DDL = dict(
    _PA_TO_DDL, **{"timestamp[us]": "timestamp", "date32[day]": "date"}
)


#: DDL → arrow target types for the CDC stream's executor-side casts;
#: also the allowlist for log-recorded schemas
_CDC_DDL_TO_PA = {
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "timestamp": "timestamp[us]",
    "timestamp_ntz": "timestamp[us]",
    "date": "date32[day]",
}


def _cdc_arrow_type(ddl: str):
    """Arrow type for a Spark DDL string the CDC stream can deliver:
    the primitive map plus arbitrarily nested ``array<...>`` (embedding
    columns — an add_column("emb", "array<double>") must not brick the
    stream). Returns None for types the executor read path cannot map
    (struct/map/decimal/binary)."""
    import pyarrow as pa

    ddl = ddl.strip()
    if ddl.startswith("array<") and ddl.endswith(">"):
        inner = _cdc_arrow_type(ddl[6:-1])
        return None if inner is None else pa.list_(inner)
    alias = _CDC_DDL_TO_PA.get(ddl)
    return None if alias is None else pa.type_for_alias(alias)


def _versioned_data_columns(path: str) -> list[tuple[str, str, str]]:
    """(logical name, DDL type, PHYSICAL name) triples for the CURRENT
    snapshot's schema. The LOG-RECORDED schema is authoritative when
    present (exact per-table types, survives a restore to a
    pre-evolution snapshot whose newest file lacks evolved columns);
    legacy logs fall back to probing one data-file footer of the latest
    version — metadata only either way, no session and no data I/O.
    Physical names come from the log's column mapping (RENAME COLUMN):
    files always store physical names, so executors read by physical
    and the stream delivers logical."""
    import os

    import pyarrow.parquet as pq

    from as_etl_storage_spark.writers.versioned import VersionedTable

    vt = VersionedTable(None, path)
    latest = vt.latest_version()
    if latest is None:
        raise ValueError(f"versioned_changes: no committed versions at {path}")
    stored = vt._schema_at(latest)
    if stored is not None:
        from pyspark.sql import types as T

        mapping = vt._mapping_at(latest)
        fields = []
        for f in T.StructType.fromJson(stored).fields:
            ddl = f.dataType.simpleString()
            if _cdc_arrow_type(ddl) is None:
                raise ValueError(
                    f"versioned_changes: unsupported column type {ddl!r} "
                    f"for {f.name!r}; evolve the table without that column "
                    f"or extend the type map"
                )
            fields.append((f.name, ddl, mapping.get(f.name, f.name)))
        return fields
    # NEWEST file of the snapshot: under additive schema evolution the
    # most recent append's files carry the superset schema (the first
    # file may predate an added column, which would silently drop it
    # from the stream); older files' missing columns null-fill in read()
    newest = vt._state(latest)[-1]
    sch = pq.read_schema(os.path.join(path, newest))
    fields = []
    for n in sch.names:
        t = str(sch.field(n).type)
        if t not in _CDC_PA_TO_DDL:
            raise ValueError(
                f"versioned_changes: unsupported column type {t!r} for "
                f"{n!r}; evolve the table without that column or extend "
                f"the type map"
            )
        fields.append((n, _CDC_PA_TO_DDL[t], n))
    # hive-partitioned table: the partition columns live in directory
    # names, not footers — append them, typed from the newest file's
    # parsed values (int → bigint, float → double, else string, Spark's
    # own partition-inference order); read() fills them per-partition
    # from the values the driver parsed out of each manifest name
    pvals = VersionedTable._partition_values(newest)
    for col in vt._partition_by_at(latest):
        if any(n == col for n, _, _ in fields):
            continue  # also stored in the file (cdc files do this)
        v = pvals.get(col)
        ddl = (
            "bigint"
            if isinstance(v, int)
            else "double" if isinstance(v, float) else "string"
        )
        fields.append((col, ddl, col))
    return fields


class _ChangeFiles(InputPartition):
    """One committed data file + its delivery metadata. Executors read
    the file; the driver only ever walked the manifest log. ``pvals``
    carries the file's hive partition values (parsed from its manifest
    name on the DRIVER, typed to the stream schema) so executors can
    materialize partition columns that are absent from the footer."""

    def __init__(
        self,
        path: str,
        version: int,
        kind: str,
        columns: tuple,
        pvals: dict | None = None,
        ddl: tuple = (),
        dv_paths: tuple = (),
        phys: tuple = (),
    ):
        self.path, self.version, self.kind = path, version, kind
        self.columns = columns
        # physical (in-file) name per column — differs from ``columns``
        # only for renamed columns (column mapping)
        self.phys = phys or columns
        self.pvals = pvals or {}
        # deletion-vector sidecars naming THIS file's deleted row
        # positions (snapshot recovery of a table with merge-on-read
        # deletes must not resurrect the deleted rows)
        self.dv_paths = dv_paths
        # per-column DDL aligned with ``columns``: executors cast every
        # delivered array to the DECLARED stream type, so a log-recorded
        # int32 partition column or a pre-widening legacy file can't
        # hand Spark a mismatched arrow type
        self.ddl = ddl


class VersionedChangesStreamReader(DataSourceStreamReader):
    """CDC tail of a versioned table (writers/versioned.py), the
    readStream analog of ``VersionedTable.changes`` — Delta's
    ``spark.readStream.format("delta")`` restated over the manifest log.

    Offsets are LOG VERSIONS: ``latestOffset`` lists the log (metadata
    only), ``partitions(start, end)`` walks manifests ``start+1..end``
    and emits one InputPartition per committed data file, and ``read``
    runs on EXECUTORS as pyarrow->Arrow batches — the driver never
    touches data bytes, so a 100 TB table streams with O(new files)
    driver work per trigger and replay of any committed window is exact
    (manifests and data files are immutable until vacuum; retention must
    cover the stream's checkpoint lag, Delta's own rule).

    A COMPACT version inside the range is skipped transparently — its
    manifest carries ``data_change: false`` (Delta's OPTIMIZE flag), the
    rows are unchanged, and the stream stays incremental across nightly
    OPTIMIZE cycles. A DATA-CHANGING rewrite (overwrite/replace) makes
    row-level deltas underivable — the batch consumer's documented
    recovery applies: with ``onrewrite=snapshot`` (default) the batch
    delivers the FULL snapshot at ``end`` with ``_change_type =
    'snapshot'`` (downstream replaces instead of appending — the
    streaming form of the consumer's overwrite path); ``onrewrite=fail``
    raises instead, Delta's default posture for non-append commits;
    ``onrewrite=skip`` ignores the rewrite and keeps tailing appends
    (Delta's ``skipChangeCommits`` — right when downstream only wants
    the append stream and accepts missing rewrite-era corrections).
    Every delivered row carries ``_commit_version`` and ``_change_type``
    ('insert' | 'snapshot'), the CDF-style metadata columns.

    ``readChangeFeed=true`` (Delta CDF streaming): versions committed by
    row-level DML (delete/update/merge) deliver their ``_cdc/`` change
    files — rows tagged delete / update_preimage / update_postimage /
    insert — instead of tripping the rewrite path, so a downstream
    consumer can APPLY deletes and updates incrementally. Only
    overwrite/replace (which record no change files) still follow
    ``onrewrite``."""

    def __init__(self, options):
        self.path = options["path"]
        self.read_change_feed = str(
            options.get("readchangefeed", "false")
        ).lower() in ("true", "1")
        self.on_rewrite = options.get("onrewrite", "snapshot").lower()
        if self.on_rewrite not in ("snapshot", "fail", "skip"):
            raise ValueError(
                f"versioned_changes: onrewrite must be snapshot|fail|skip, "
                f"got {self.on_rewrite!r}"
            )
        sv = options.get("startingversion")
        st = options.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "versioned_changes: startingVersion and startingTimestamp "
                "are mutually exclusive"
            )
        self.starting_version = int(sv) if sv is not None else None
        self.starting_timestamp = st
        fields = _versioned_data_columns(self.path)
        self._columns = tuple(n for n, _, _ in fields)
        self._types = {n: t for n, t, _ in fields}
        self._ddl = tuple(t for _, t, _ in fields)
        self._phys = tuple(p for _, _, p in fields)
        # the version the stream schema was frozen AT: batches ending
        # at/before it (checkpoint replays after a restart) are served
        # under the frozen schema instead of re-checked — see partitions()
        self._frozen_version = self._table().latest_version()
        # declared partition columns: a partitioned CLONE's v0 references
        # absolute external files whose partition values live in the
        # SOURCE's hive path segments — _pvals parses them for exactly
        # these columns (log-walk only, no session)
        self._pb = tuple(self._table().partition_columns())

    def _pvals(self, rel_name: str) -> dict:
        """Partition values for one manifest name, coerced to the stream
        schema's declared types (a later partition directory might parse
        as a different python type than the one the schema probe saw)."""
        import os

        from as_etl_storage_spark.writers.versioned import VersionedTable

        parsed = VersionedTable._partition_values(rel_name)
        if not parsed and os.path.isabs(rel_name) and self._pb:
            # absolute external reference (partitioned SHALLOW CLONE):
            # the source's hive segments carry the values — parse the
            # path as relative and keep only the DECLARED partition
            # columns, so unrelated enclosing directories that happen to
            # contain '=' can never fabricate a column
            parsed = {
                c: v
                for c, v in VersionedTable._partition_values(
                    rel_name.lstrip(os.sep)
                ).items()
                if c in self._pb
            }
        out = {}
        int_ddls = ("bigint", "int", "smallint", "tinyint")
        for col, val in parsed.items():
            ddl = self._types.get(col, "string")
            try:
                out[col] = (
                    int(val)
                    if ddl in int_ddls
                    else (
                        float(val)
                        if ddl in ("double", "float")
                        else str(val)
                    )
                )
            except (TypeError, ValueError):
                out[col] = None  # type clash: deliver NULL, not a crash
        return out

    def _table(self):
        from as_etl_storage_spark.writers.versioned import VersionedTable

        # session-free: only the log-walk methods are used
        return VersionedTable(None, self.path)

    def initialOffset(self) -> dict:
        """First-start offset (ignored on checkpoint resume, as Delta's
        startingVersion/startingTimestamp are): ``startingVersion=v``
        begins delivery AT version v; ``startingTimestamp=t`` at the
        first version committed after the latest snapshot current at t
        (``resolve_timestamp``); default delivers from the first
        version."""
        if self.starting_version is not None:
            return {"version": self.starting_version - 1}
        if self.starting_timestamp is not None:
            from as_etl_storage_spark.writers.versioned import (
                VersionedTableError,
            )

            ts = self.starting_timestamp
            try:
                ts = float(ts)
            except (TypeError, ValueError):
                pass  # ISO-8601 string: resolve_timestamp parses it
            try:
                return {"version": self._table().resolve_timestamp(ts)}
            except VersionedTableError:
                return {"version": -1}  # before the first commit: all
        return {"version": -1}

    def latestOffset(self) -> dict:
        latest = self._table().latest_version()
        return {"version": -1 if latest is None else latest}

    def partitions(self, start: dict, end: dict):
        import os

        from_v, to_v = start["version"], end["version"]
        if to_v <= from_v:
            return []
        from as_etl_storage_spark.writers.versioned import _layout_only

        vt = self._table()
        # protocol fence (same rule as batch _state): a table using a
        # feature this reader does not understand must fail the batch
        # plan with the feature named, not deliver misread bytes
        vt._check_features(to_v)
        # fail fast on mid-stream schema evolution: the stream schema is
        # frozen at reader construction, so a table evolved past it would
        # have read() silently project evolved columns away (dropping
        # their data from the downstream mirror). Delta's stream errors
        # on schema change and asks for a restart — same posture here.
        # The comparison is the FULL (logical name, type, physical name)
        # triple: a rename, a type redefinition, or a mapping reset
        # (overwrite_schema) that happens to preserve the logical name
        # set would otherwise slip through and deliver nulls or crash
        # executors mid-cast instead of raising the actionable message.
        # Enforced ONLY for batches ending PAST the version the schema
        # was frozen at: on checkpoint restart Spark replays the last
        # planned batch with its recorded end offset, and the restarted
        # reader freezes the CURRENT (possibly newer) schema — checking
        # the replayed range against it would raise on every restart and
        # wedge the checkpoint ("restart the stream" could never
        # succeed). A replayed range is served under the frozen schema
        # instead, which is exactly what a fresh start would deliver:
        # old files' missing physical columns null-fill in read(), and
        # physical names are rename-stable.
        stored = vt._schema_at(to_v)
        # explicit None check: a frozen version of 0 is falsy but real
        frozen_v = -1 if self._frozen_version is None else self._frozen_version
        if stored is not None and to_v > frozen_v:
            from pyspark.sql import types as T

            mapping = vt._mapping_at(to_v)
            current = {
                (f.name, f.dataType.simpleString(), mapping.get(f.name, f.name))
                for f in T.StructType.fromJson(stored).fields
            }
            frozen = set(zip(self._columns, self._ddl, self._phys))
            if current != frozen:
                raise RuntimeError(
                    f"versioned_changes: the table schema changed "
                    f"mid-stream (stream started with {sorted(frozen)}, "
                    f"version {to_v} records {sorted(current)}); restart "
                    f"the stream to pick up the new schema"
                )
        appends: list[tuple[int, list[str], str, dict]] = []
        rewrite = None
        for v in range(from_v + 1, to_v + 1):
            try:
                m = vt._manifest(v)
            except FileNotFoundError:
                # vacuum truncated this manifest: the incremental history
                # is gone (a fresh stream with no startingVersion walks
                # from -1 and lands here on any vacuumed log). Snapshot
                # recovery (default) or fail apply as for a rewrite —
                # but onrewrite=skip must NOT swallow it: skip means
                # "ignore rewrite corrections", not "lose vacuumed
                # appends silently" (Delta's skipChangeCommits likewise
                # still errors on truncated history).
                if self.on_rewrite == "skip":
                    raise RuntimeError(
                        f"versioned_changes: version {v} was vacuumed — "
                        f"the appends in the truncated range are "
                        f"unrecoverable incrementally, so onrewrite=skip "
                        f"cannot continue. Restart from a live version "
                        f"(startingVersion) or use onrewrite=snapshot "
                        f"for a full-snapshot recovery"
                    ) from None
                rewrite = (v, "vacuumed")
                continue
            if _layout_only(m):
                # compact (data_change: false): same rows, new packing —
                # the stream continues incrementally straight across an
                # OPTIMIZE, Delta's own behavior; only data-changing
                # rewrites trigger the snapshot/fail path below
                continue
            if m["op"] in ("append", "clone"):
                # version 0 records its files under "files" (it IS the
                # full snapshot); later appends are "add" deltas. A
                # clone's v0 is its exact initial content — Delta
                # streams a cloned table from the initial snapshot too —
                # INCLUDING its deletion vectors: rows deleted before
                # the clone must not resurface in the stream
                appends.append(
                    (
                        v,
                        m.get("add") or m.get("files") or [],
                        "insert",
                        m.get("dv") or {} if m["op"] == "clone" else {},
                    )
                )
            elif self.read_change_feed and "cdc" in m:
                # row-level DML with change files: deliver the recorded
                # change rows (their _change_type travels IN the files)
                appends.append((v, m["cdc"], "cdf", {}))
            else:
                rewrite = (v, m["op"])
        if rewrite is not None and self.on_rewrite != "skip":
            if self.on_rewrite == "fail":
                raise RuntimeError(
                    f"versioned_changes: version {rewrite[0]} is "
                    f"{rewrite[1]!r}, not an append — row-level changes "
                    f"cannot be derived across a table rewrite. Pass "
                    f"onrewrite=snapshot to receive the full snapshot "
                    f"with _change_type='snapshot' instead, or "
                    f"onrewrite=skip to keep tailing appends only"
                )
            dv_map = vt._dv_at(to_v)
            return [
                _ChangeFiles(
                    os.path.join(self.path, f),
                    to_v,
                    "snapshot",
                    self._columns,
                    self._pvals(f),
                    self._ddl,
                    tuple(
                        os.path.join(self.path, p)
                        for p in dv_map.get(f, {}).get("files", [])
                    ),
                    self._phys,
                )
                for f in vt._state(to_v)
            ]
        return [
            _ChangeFiles(
                os.path.join(self.path, f),
                v,
                kind,
                self._columns,
                self._pvals(f),
                self._ddl,
                tuple(
                    os.path.join(self.path, p)
                    for p in dvmap.get(f, {}).get("files", [])
                ),
                phys=self._phys,
            )
            for v, files, kind, dvmap in appends
            for f in files
        ]

    def read(self, partition: _ChangeFiles):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(partition.path)
        if partition.dv_paths:
            import numpy as np
            import pyarrow.compute as pc

            base = os.path.basename(partition.path)
            dv = pq.read_table(list(partition.dv_paths))
            deleted = dv.filter(
                pc.equal(dv.column("__vt_file"), base)
            ).column("__vt_pos")
            if len(deleted):
                # vectorized position subtraction: row index ∉ deleted —
                # pc.is_in over an arange instead of a per-row python
                # keep-list (the loop was O(rows) interpreter time per
                # file; this is two kernel calls)
                idx = pa.array(np.arange(t.num_rows), type=pa.int64())
                keep = pc.invert(
                    pc.is_in(idx, value_set=pc.cast(deleted, pa.int64()))
                )
                t = t.filter(keep)
        n = t.num_rows
        # every array is cast to the DECLARED stream type (cast is a
        # no-op when they already match): a log-recorded int32 partition
        # column must not arrive as python-inferred int64, and a legacy
        # file narrower than the declared type must widen, not crash
        targets = [
            _cdc_arrow_type(d)
            for d in (partition.ddl or ("",) * len(partition.columns))
        ]
        arrays = []
        for name, phys, target in zip(
            partition.columns, partition.phys, targets
        ):
            if phys in t.column_names:
                # files store PHYSICAL names (column mapping): read by
                # physical, deliver under the logical stream column
                arr = t.column(phys).combine_chunks()
                if target is not None and arr.type != target:
                    arr = arr.cast(target)
                arrays.append(arr)
            elif partition.pvals.get(name) is not None:
                # hive partition column: constant per file, parsed from
                # the manifest name on the driver. Build untyped, then
                # CAST: the parsed value is a python int/float/str, and
                # arrow's str→date32/timestamp/bool casts cover the
                # partition types a typed pa.array() would refuse
                arr = pa.array([partition.pvals[name]] * n)
                if target is not None and arr.type != target:
                    arr = arr.cast(target)
                arrays.append(arr)
            else:
                # additive schema evolution: files committed before the
                # column existed deliver NULLs, as mergeSchema does
                arrays.append(
                    pa.nulls(n, type=target) if target is not None else pa.nulls(n)
                )
        arrays.append(pa.array([partition.version] * n, type=pa.int64()))
        if partition.kind == "cdf":
            # change files carry their own row-level _change_type
            # (delete / update_preimage / update_postimage / insert)
            arrays.append(t.column("_change_type").combine_chunks().cast(pa.string()))
        else:
            arrays.append(pa.array([partition.kind] * n, type=pa.string()))
        out = pa.table(
            arrays, names=list(partition.columns) + ["_commit_version", "_change_type"]
        )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the log is immutable


class VersionedChangesDataSource(DataSource):
    """``spark.readStream.format("versioned_changes").option("path", dir)``
    — streaming CDC source over a versioned table; see
    VersionedChangesStreamReader for semantics."""

    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self) -> str:
        fields = [
            f"{n} {t}"
            for n, t, _ in _versioned_data_columns(self.options["path"])
        ]
        fields += ["_commit_version bigint", "_change_type string"]
        return ", ".join(fields)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return VersionedChangesStreamReader(self.options)

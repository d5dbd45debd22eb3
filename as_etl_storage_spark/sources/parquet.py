"""Parquet-native source — the primary storage backend of the rebuild.

Replaces the reference's RDBMS scan surface (S1-S7) with lazy DataFrame
lineage. Schema probe (S3, ``where 1=2`` in the reference,
database/table.go:229-233) is free here: parquet footers carry the schema.
Min/max discovery (S12, reader/parameter.go:203-254) is a single distributed
aggregate; on a real cluster it reads only the split-key column thanks to
parquet column pruning, and row-group statistics make it near-metadata-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from as_etl_storage_spark.spec import ConnectionSpec
from as_etl_storage_spark.types import dedupe_column_names


class SourceError(RuntimeError):
    pass


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns physically stored as parquet INT64 TIMESTAMP(NANOS), which
    Spark 4 cannot read natively — detected from the footer (cheap,
    metadata-only). The check MUST use the parquet physical+logical type,
    not the Arrow schema: pyarrow reports Spark's own default INT96
    timestamps as ``timestamp[ns]`` too, and flagging those would apply
    the int64 ``div 1000`` rewrite to a column Spark reads natively as
    TIMESTAMP — every Spark-written timestamp table would crash with a
    DATATYPE_MISMATCH instead of reading back."""
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            # a directory can MIX encodings (nanos files appended after
            # non-nanos ones or vice versa), so one footer is not enough:
            # sample the first AND last sorted file of each directory
            # (appends sort to one end under part-file naming), bounded
            # at 16 footers total — still metadata-only
            files: list[str] = []
            for root, _dirs, names in sorted(os.walk(path)):
                cand = sorted(n for n in names if n.endswith(".parquet"))
                if cand:
                    files.append(os.path.join(root, cand[0]))
                    if len(cand) > 1:
                        files.append(os.path.join(root, cand[-1]))
                if len(files) >= 16:
                    break
            if not files:
                return []
        else:
            files = [path]
        out: list[str] = []
        for f in files:
            sch = pq.ParquetFile(f).schema
            for i in range(len(sch)):
                col = sch.column(i)
                lt = str(col.logical_type)
                if (
                    col.physical_type == "INT64"
                    and lt.startswith("Timestamp")
                    and "nanoseconds" in lt
                    and col.path not in out
                ):
                    out.append(col.path)
        return out
    except Exception:
        return []


def _table_fingerprint(path: str) -> tuple | None:
    """Metadata fingerprint of a parquet table: (relpath, mtime_ns, size)
    per data file. Any append/delete/rewrite changes it. None (uncacheable)
    for non-local paths this process cannot stat."""
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return (("", st.st_mtime_ns, st.st_size),)
        entries = []
        for root, _dirs, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    st = os.stat(p)
                    entries.append(
                        (os.path.relpath(p, path), st.st_mtime_ns, st.st_size)
                    )
        entries.sort()
        return tuple(entries)
    except OSError:
        return None


#: (session id, path) -> (fingerprint, DataFrame). Plan/metadata cache
#: ONLY — the cached value is an unexecuted lazy plan whose every action
#: re-reads the parquet bytes; no rows are ever memoized. What it skips on
#: a hit is the per-call metadata work: the pyarrow footer probe and
#: Spark's schema inference + file listing (~90 ms/table on the bench
#: fixtures, paid by EVERY query invocation through register_views — the
#: same class of repeated-listing cost guide §6 addresses with
#: filesourcePartitionFileCacheSize). The mtime+size fingerprint
#: invalidates the entry whenever any data file changes, so writers (and
#: tests that rewrite temp tables) always see fresh metadata. Bounded to
#: keep long sessions (oracle sweep: hundreds of scratch tables) from
#: accumulating stale plans.
_PLAN_CACHE: dict[tuple[int, str, str], tuple[tuple, DataFrame]] = {}
_PLAN_CACHE_MAX = 64


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, transparently converting TIMESTAMP(NANOS)
    columns (unsupported by Spark's vectorized reader) to TimestampType by
    reading them as int64 ns and truncating to microseconds — the same
    truncation DuckDB applies, so oracles agree."""
    fp = _table_fingerprint(path)
    # id(spark) alone could collide if a stopped session's wrapper were
    # collected and a new session object reused its address — the
    # applicationId (fresh per SparkContext) pins the entry to the live
    # context, so a plan bound to a stopped context can never be served
    key = (id(spark), spark.sparkContext.applicationId, path)
    if fp is not None:
        hit = _PLAN_CACHE.get(key)
        if hit is not None and hit[0] == fp:
            return hit[1]
    df = _read_parquet_table_uncached(spark, path)
    if fp is not None:
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = (fp, df)
    return df


def _read_parquet_table_uncached(spark: SparkSession, path: str) -> DataFrame:
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # set the legacy flag only around THIS plan's construction and restore
    # it after: leaving it on session-wide would make every later plain
    # spark.read.parquet of a NANOS table silently return bigint
    # nanoseconds (no conversion, no error) instead of failing fast.
    # Restoring is safe for this DataFrame — the parquet relation captures
    # its schema at resolution time, not at execution time.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key)  # effective value ("false" when unset)
    spark.conf.set(key, "true")
    try:
        df = spark.read.parquet(path)
        for c in ns_cols:
            # integer division: float division loses precision at 2^60 ns
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        # force analysis while the flag is on so the relation's schema
        # (ns column as long) is fixed into the plan before we restore
        df.schema
    finally:
        spark.conf.set(key, prior)
    return df


class ParquetSource:
    """Path-based table source: ``url`` is a directory, table ``name`` maps
    to ``<url>/<name>.parquet`` (file or directory)."""

    def __init__(self, spark: SparkSession, connection: ConnectionSpec):
        self.spark = spark
        self.connection = connection

    def table_path(self, name: str | None = None) -> str:
        name = name or self.connection.table.name
        if not name:
            raise SourceError("no table name in connection spec")
        base = self.connection.url
        for cand in (f"{name}.parquet", name):
            p = os.path.join(base, cand)
            if os.path.exists(p):
                return p
        # non-local paths (hdfs://, s3a://) can't be probed here; default
        return os.path.join(base, f"{name}.parquet")

    def ping(self) -> None:
        """Connectivity check (C4; db.go:244-246): the path must resolve."""
        path = self.table_path()
        if path.startswith("/") and not os.path.exists(path):
            raise SourceError(f"table path does not exist: {path}")

    def read(self, name: str | None = None, snapshot: bool = False) -> DataFrame:
        """Read a table. ``snapshot=True`` gives transactional-read parity
        (S7, DB.FetchRecordWithTx + consistent-snapshot TxOptions,
        db.go:164-200): the file list is pinned at plan time, so files
        appended concurrently by another writer never appear in this scan —
        the parquet analog of a consistent snapshot (Delta time travel on a
        real deployment)."""
        path = self.table_path(name)
        if snapshot:
            df = self._read_pinned(path)
        else:
            df = read_parquet_table(self.spark, path)
        cols = df.columns
        deduped = dedupe_column_names(cols)
        if deduped != cols:  # P10 duplicate-name rename (db.go:425-432)
            df = df.toDF(*deduped)
        return df

    def _read_pinned(self, path: str) -> DataFrame:
        if os.path.isdir(path):
            # recursive: a hive-partitioned layout (writer partition_by)
            # keeps its data files under key=value subdirectories — a
            # top-level-only listing would pin ZERO files and reject the
            # exact layouts the writer produces
            files = sorted(
                os.path.join(root, f)
                for root, _dirs, names in os.walk(path)
                for f in names
                if f.endswith(".parquet")
            )
        else:
            files = [path]
        if not files:
            raise SourceError(f"no parquet files to snapshot in {path}")
        reader = self.spark.read
        if os.path.isdir(path):
            # basePath recovers the partition columns from the pinned
            # file paths, matching the unpinned read's schema
            reader = reader.option("basePath", path)
        return reader.parquet(*files)

    def schema(self, name: str | None = None) -> T.StructType:
        """S3 schema probe — zero data read (footer only)."""
        return self.read(name).schema

    def min_max(self, key: str, where: str = "") -> tuple[object, object]:
        """S12 min/max discovery for split bounds, honoring the user
        ``where`` exactly as the reference does (parameter.go:208-213)."""
        df = self.read()
        if where:
            df = df.where(where)
        row = df.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        return row["lo"], row["hi"]

    def list_tables(self) -> list[str]:
        base = self.connection.url
        if not os.path.isdir(base):
            return []
        out = []
        for entry in sorted(os.listdir(base)):
            if entry.endswith(".parquet"):
                out.append(entry[: -len(".parquet")])
        return out

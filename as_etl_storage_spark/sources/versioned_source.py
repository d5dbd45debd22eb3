"""Versioned-table source: reads from the transaction-log tables the
versioned writer produces (writers/versioned.py) with optional time travel.

This closes the S7 loop through the job-spec surface: the reference's
transactional read (DB.FetchRecordWithTx + consistent-snapshot TxOptions,
database/db.go:164-200) maps to reading a pinned manifest version — the
file list is fixed when the manifest is chosen, so concurrent commits
never leak into the scan, and ``versionAsOf`` in the connection spec
selects any retained historical version (Delta ``versionAsOf`` parity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from as_etl_storage_spark.spec import ConnectionSpec
from as_etl_storage_spark.types import dedupe_column_names


class SourceError(RuntimeError):
    pass


class VersionedSource:
    """``url`` is a directory of versioned tables; table ``name`` maps to
    ``<url>/<name>`` (the directory holding ``_log/`` + data files)."""

    def __init__(self, spark: SparkSession, connection: ConnectionSpec):
        self.spark = spark
        self.connection = connection

    def table_path(self, name: str | None = None) -> str:
        name = name or self.connection.table.name
        if not name:
            raise SourceError("no table name in connection spec")
        return os.path.join(self.connection.url, name)

    def ping(self) -> None:
        log_dir = os.path.join(self.table_path(), "_log")
        if not os.path.isdir(log_dir):
            raise SourceError(
                f"not a versioned table (no _log): {self.table_path()}"
            )

    def read(
        self,
        name: str | None = None,
        snapshot: bool = False,
        where: str = "",
    ) -> DataFrame:
        # every versioned read IS a snapshot read — the manifest pins files
        from as_etl_storage_spark.spec import prune_triples_from_where
        from as_etl_storage_spark.writers.versioned import VersionedTable

        vt = VersionedTable(self.spark, self.table_path(name))
        # the spec's ``where`` reaches manifest data skipping here: its
        # simple conjuncts become (col, op, literal) prune triples, so a
        # spec-driven job skips files from the stats manifest exactly
        # like a Python-API read(prune=...) — instead of paying the full
        # file listing. Complex predicates (OR trees, expressions)
        # extract nothing and fall through to filter-only, which remains
        # the semantic either way (the planner applies the full where).
        prune = prune_triples_from_where(where) if where else []
        if self.connection.change_feed_from is not None:
            # row-level change feed (Delta readChangeFeed parity): table
            # columns + _change_type/_commit_version — the job-spec
            # surface of VersionedTable.change_feed, so a job can move
            # CDC rows into any sink
            df = vt.change_feed(
                self.connection.change_feed_from,
                self.connection.change_feed_to,
            )
        elif self.connection.changes_from is not None:
            # incremental read: only rows appended after the cursor
            # version — the job-spec surface of VersionedTable.changes
            df = vt.changes(self.connection.changes_from)
        elif self.connection.timestamp_as_of is not None:
            # wall-clock time travel (Delta timestampAsOf parity)
            df = vt.read(
                timestamp_as_of=self.connection.timestamp_as_of,
                prune=prune or None,
            )
        else:
            df = vt.read(
                version_as_of=self.connection.version_as_of,
                prune=prune or None,
            )
        cols = df.columns
        deduped = dedupe_column_names(cols)
        if deduped != cols:
            df = df.toDF(*deduped)
        return df
